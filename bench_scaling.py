"""Weak-scaling harness: FM-chain throughput at 1..N devices.

BASELINE.md measurement points: 1 chip, 1 host, N>=2 hosts, with >=90%
weak-scaling efficiency.  On this box only one real chip exists, so the
scaling sweep runs on a virtual CPU mesh (correctness + collective-pattern
validation); on a pod slice the same script measures the real thing —
device count comes from the environment.

Usage:
    python bench_scaling.py             # sweep 1..all devices
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_scaling.py
"""

import json
import os
import sys
import time

import numpy as np
import jax

# sitecustomize imports jax at interpreter boot, so JAX_PLATFORMS in the
# environment is too late on this box — honor it explicitly
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def measure(n_dev: int, chunk_u8: int = 1_638_400, iters: int = 10):
    from sdr_tpu import parallel
    from sdr_tpu.apps.chains import fm_chain

    devs = jax.devices()[:n_dev]
    mesh = parallel.make_mesh((n_dev,), ("t",), devs)
    chain = fm_chain()
    n_global = chunk_u8 * n_dev
    raw = np.random.default_rng(0).integers(0, 256, n_global,
                                            dtype=np.uint8)
    spec = parallel.mesh.P("t")
    x = jax.device_put(
        jnp.asarray(raw),
        jax.sharding.NamedSharding(mesh, spec))
    fn = jax.jit(lambda g: parallel.run_time_sharded(chain, mesh, g))
    y = fn(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(x)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / iters
    return (n_global // 2) / dt  # complex samples/sec aggregate


def main():
    n = len(jax.devices())
    sweep = sorted({1, 2, n // 2, n} - {0})
    results = {}
    for nd in sweep:
        if nd < 1 or nd > n:
            continue
        rate = measure(nd)
        results[nd] = rate
        print(f"devices={nd:3d}  aggregate={rate/1e9:9.3f} GS/s  "
              f"per-device={rate/nd/1e9:7.3f} GS/s", file=sys.stderr)
    base = results.get(1)
    eff = {nd: (r / nd) / base for nd, r in results.items()} if base else {}
    for nd, e in eff.items():
        print(f"weak-scaling efficiency @ {nd}: {e:.2%}", file=sys.stderr)
    backend = jax.default_backend()
    note = ("collective-pattern regression canary only: virtual devices "
            "share host cores, so per-device rates CANNOT scale; the "
            ">=90% target is measurable only on a real pod slice"
            ) if backend == "cpu" else "real device mesh"
    print(json.dumps({
        "metric": "fm_chain_weak_scaling_efficiency",
        "value": round(min(eff.values()), 4) if eff else 0,
        "unit": "fraction",
        "backend": backend,
        "note": note,
        "devices": {str(k): round(v) for k, v in results.items()},
        "efficiency": {str(k): round(v, 4) for k, v in eff.items()},
    }))


if __name__ == "__main__":
    main()
