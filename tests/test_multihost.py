"""Multi-host helpers on the single-process virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from sdr_tpu import parallel
from sdr_tpu.parallel import (local_time_span, global_time_sharded,
                              host_block_iterator)


def test_local_time_span_single_process():
    mesh = parallel.time_mesh(8)
    off, length = local_time_span(mesh, 8000)
    # single process owns everything
    assert (off, length) == (0, 8000)


def test_global_time_sharded_roundtrip(rng):
    mesh = parallel.time_mesh(8)
    x = rng.uniform(-1, 1, 4096).astype(np.float32)
    g = global_time_sharded(x, mesh, 4096)
    assert g.sharding.spec == parallel.mesh.P("t")
    np.testing.assert_allclose(np.asarray(g), x)


def test_host_block_iterator(tmp_path, rng):
    mesh = parallel.time_mesh(8)
    x = rng.integers(0, 256, 4096).astype(np.uint8)
    p = tmp_path / "x.iq"
    x.tofile(p)
    blocks = list(host_block_iterator(p, mesh, 1024))
    assert len(blocks) == 4
    np.testing.assert_array_equal(np.concatenate(blocks), x)
