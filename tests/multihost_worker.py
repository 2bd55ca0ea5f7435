"""Worker process for tests/test_multihost.py::test_two_process_distributed.

Runs the REAL multi-process branch of sdr_tpu.parallel.multihost: gloo
CPU backend, 2 processes x 4 virtual devices = one 8-way time mesh; each
process ingests only its own span of the recording (host_block_iterator),
assembles the global sharded array (global_time_sharded via
make_array_from_process_local_data) and runs the time-sharded FM chain.
Each process dumps its addressable output shards (+ global index) to an
npz; the parent test reassembles and compares against the single-process
run.  Not collected by pytest (no test_ prefix).
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    iq_path = sys.argv[4]
    out_path = sys.argv[5]

    from sdr_tpu.parallel.multihost import (init_distributed,
                                            local_time_span,
                                            global_time_sharded,
                                            host_block_iterator)
    init_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 8

    from jax.sharding import Mesh
    from sdr_tpu import ops as O
    from sdr_tpu import parallel
    from sdr_tpu.stream import IqConvertU8, Fir, FmDemod, Scale

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("t",))
    n_global = 8 * 10240
    off, length = local_time_span(mesh, n_global)
    assert (off, length) == (pid * n_global // 2, n_global // 2), (off, length)

    rf = O.windowed_sinc(51, 0.1, O.hamming)
    ars = O.windowed_sinc(31, 0.25, O.hamming)
    chain = [IqConvertU8(), Fir.decimator(rf, 8), FmDemod(),
             Fir.resampler(ars, 3, 10), Scale(0.2)]

    outs = {}
    for bi, local in enumerate(host_block_iterator(iq_path, mesh, n_global)):
        g = global_time_sharded(local, mesh, n_global)
        y = parallel.run_time_sharded(chain, mesh, g)
        for si, sh in enumerate(y.addressable_shards):
            sl = sh.index[-1]
            outs[f"b{bi}_s{sl.start}_{sl.stop}"] = np.asarray(sh.data)
    np.savez(out_path, **outs)
    print(f"p{pid}: OK {len(outs)} shards", flush=True)


if __name__ == "__main__":
    main()
