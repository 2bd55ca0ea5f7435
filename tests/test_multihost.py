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


def test_two_process_distributed(tmp_path, rng):
    """The multi-process branch for real: 2 CPU processes (gloo backend),
    4 virtual devices each, one 8-way time mesh.  Each process reads only
    its own half of the recording, assembles the global array with
    make_array_from_process_local_data, runs the time-sharded FM chain,
    and dumps its output shards; reassembled output must equal the
    single-process run (SURVEY §4: 'the sharded run must agree ... which
    IS the multi-node test')."""
    import os
    import socket
    import subprocess
    import sys
    from pathlib import Path

    n_global = 8 * 10240
    raw = rng.integers(0, 256, 2 * n_global).astype(np.uint8)
    iq = tmp_path / "x.iq"
    raw.tofile(iq)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    repo = str(Path(__file__).resolve().parent.parent)
    worker = str(Path(__file__).resolve().parent / "multihost_worker.py")
    env = {**os.environ, "PYTHONPATH": repo}
    outs = [str(tmp_path / f"out{p}.npz") for p in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, worker, str(p), "2", str(port), str(iq), outs[p]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for p in range(2)]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        logs.append(out)
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    # reassemble the two processes' shard dumps
    from sdr_tpu import ops as O
    from sdr_tpu.stream import (IqConvertU8, Fir, FmDemod, Scale, Pipeline)
    rf = O.windowed_sinc(51, 0.1, O.hamming)
    ars = O.windowed_sinc(31, 0.25, O.hamming)
    chain = [IqConvertU8(), Fir.decimator(rf, 8), FmDemod(),
             Fir.resampler(ars, 3, 10), Scale(0.2)]
    n_out = n_global // 2 // 8 * 3 // 10
    for bi in range(2):
        got = np.full(n_out, np.nan, dtype=np.float32)
        for path in outs:
            with np.load(path) as data:
                for key in data.files:
                    b, lo, hi = key[1:].replace("_s", "_").split("_")
                    if int(b) == bi:
                        got[int(lo):int(hi)] = data[key]
        assert not np.isnan(got).any()
        blk = raw[bi * n_global:(bi + 1) * n_global]
        p = Pipeline(chain, block_in=n_global, in_dtype=jnp.uint8)
        _, want = p.process(blk)
        np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4,
                                   atol=1e-4)
