"""Benchmark driver: FM receive-chain throughput on the attached device.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: complex input samples/sec/chip through the full FM chain
(u8 IQ -> convert -> decimate 8 -> FM demod -> 3/10 resample -> audio FIR
-> scale), matching BASELINE.json's headline.  ``vs_baseline`` compares the
per-chip rate against the north-star target of 10 GS/s aggregate on a
v5e-16, i.e. 625 MS/s per chip.

Extra per-kernel numbers go to stderr (and bench_details.json) so the JSON
contract on stdout stays a single line.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# Compiles through the tunneled TPU runtime cost 1-10 min each regardless of
# program size; the persistent cache turns warm reruns into seconds.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


BASELINE_PER_CHIP = 10e9 / 16  # BASELINE.md: >=10 GS/s aggregate on v5e-16


def _sync(y):
    """Force completion.  block_until_ready is unreliable on tunneled
    runtimes (observed returning before execution); transferring data
    derived from the value is not.  A [1] slice, not a 0-d scalar —
    0-d buffer transfers are another unimplemented corner there."""
    return float(np.asarray(jnp.ravel(y)[:1])[0])


def null_rpc_time(iters: int = 5) -> float:
    """Round-trip cost of dispatch + scalar transfer with ~zero compute."""
    g = jax.jit(lambda v: v + 1.0)
    z = jnp.zeros(8)
    _sync(g(z))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(g(z))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_fn(step, args, iters, warmup=3):
    """Time a jitted (carry, x) -> (carry, y) step, chaining carries.

    The carry chain makes every step a data dependency of the last; the
    final scalar transfer forces real completion.  The measured null RPC
    round-trip is subtracted once.
    """
    null = null_rpc_time()
    c, x = args
    c2, y = step(c, x)
    _sync(y)
    for _ in range(warmup):
        c2, y = step(c2, x)
    _sync(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        c2, y = step(c2, x)
    _sync(y)
    dt = time.perf_counter() - t0 - null
    return max(dt, 1e-9) / iters


def bench_chain_batched(method: str = "conv", front: str = "auto",
                        block: int = 10_485_760, nblocks: int = 32):
    """Offline/recorded-stream throughput: ``nblocks`` blocks processed
    block-PARALLEL in one program (parallel.run_time_batched semantics —
    same samples as the sequential streamed run, proven in
    tests/test_quantized.py).  This is the headline formulation: the chain
    has no sequential dependency beyond bounded halos, so a TPU should
    crunch the whole buffer at once, not dribble carry-chained blocks.
    """
    from sdr_tpu.apps.chains import fm_chain
    from sdr_tpu.parallel.sharded import time_sharded_fn

    ops = fm_chain(method=method, front=front)
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.integers(0, 256, (nblocks, block), dtype=np.uint8))
    fn = time_sharded_fn(ops, axis_name="b")
    g = jax.jit(lambda r: jnp.mean(jax.vmap(fn, axis_name="b")(r))[None])
    _sync(g(xb))
    null = null_rpc_time(3)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(g(xb))
        ts.append(time.perf_counter() - t0 - null)
    return (nblocks * block // 2) / max(min(ts), 1e-9)


def bench_chain(method: str, block: int, iters: int = 12,
                front: str = "auto"):
    """Streaming FM-chain throughput: ``iters`` carry-chained steps.

    Primary form runs the steps INSIDE one program (the same structure as
    Pipeline.scan) — the per-step boundary crossing is where the axon
    runtime breaks, and in-program iteration also amortizes its RPC
    overhead.  Per-step inputs are fresh slices of a longer buffer so no
    step's work can be CSE'd away; the returned audio sum depends on every
    step through the carry chain.
    """
    from sdr_tpu.apps.chains import fm_chain
    from sdr_tpu.stream import Pipeline

    p = Pipeline(fm_chain(method=method, front=front), block_in=block,
                 in_dtype=jnp.uint8)
    rng = np.random.default_rng(0)
    n_src = 4  # distinct source blocks cycled through the loop
    raw = jnp.asarray(rng.integers(0, 256, (n_src, block), dtype=np.uint8))

    def chained(r):
        # python-unrolled loop: the known-good in-program form on the axon
        # runtime (it rejects some scan-wrapped chains)
        c = p.init()
        acc = jnp.float32(0)
        for i in range(iters):
            c, y = p.apply(c, r[i % n_src])
            acc = acc + jnp.mean(y) * 1e-3
        return acc[None]

    try:
        g = jax.jit(chained)
        _sync(g(raw))
        null = null_rpc_time(3)
        t0 = time.perf_counter()
        _sync(g(raw))
        dt = max(time.perf_counter() - t0 - null, 1e-9) / iters
        return (block // 2) / dt
    except Exception as e:  # noqa: BLE001
        print(f"in-program chain bench failed ({str(e)[:80]}); "
              "falling back to per-step dispatch", file=sys.stderr)
    step = p.jit_packed_step(donate=False)
    dt = bench_fn(step, (p.init_packed(), raw[0]), iters)
    return (block // 2) / dt  # complex input samples/sec


def _time_jit(fn, iters=10):
    """Per-iteration device time of ``fn`` with the iteration loop INSIDE
    the compiled program (python-unrolled, summed into one scalar).

    Host-loop timing is useless on tunneled runtimes: per-execution RPC
    overhead (~3 ms here) swamps microsecond kernels.  Unrolled rather
    than lax.scan because the axon runtime rejects some scan-wrapped
    kernels outright (UNIMPLEMENTED).  Each iteration perturbs the input
    (fn receives the iteration index as a traced scalar) so XLA cannot
    CSE the copies, and a scalar of every output folds into the result so
    none can be dead-coded.
    """
    def looped():
        acc = jnp.float32(0)
        for i in range(iters):
            y = fn(jnp.int32(i))
            first = jax.tree.leaves(y)[0]
            red = jnp.mean(jnp.abs(first)) if jnp.iscomplexobj(first) \
                else jnp.mean(first)
            acc = acc + red.astype(jnp.float32) * 1e-6
        return acc[None]

    g = jax.jit(looped)
    _sync(g())
    null = null_rpc_time(3)
    t0 = time.perf_counter()
    _sync(g())
    dt = time.perf_counter() - t0 - null
    return max(dt, 1e-9) / iters


def bench_kernels(block: int = 1 << 20, iters: int = 10, dump: str = None):
    """Per-kernel microbenchmarks — the Criterion variant matrix analog
    (benchmarks/Benchmarks.hs:79-156: {filter, decimate, resample} x
    {real, complex} x implementations + conversion + scale; tap-count
    sweep per BASELINE config #2).  Rates are input samples/sec."""
    from sdr_tpu.ops import fir, convert, scans, fftops
    out = {}
    rng = np.random.default_rng(0)
    from sdr_tpu.utils import from_host
    x0 = jnp.asarray(rng.uniform(-1, 1, block).astype(np.float32))
    # complex test vector assembled ON device (complex h2d transfers are
    # unimplemented on the axon runtime and poison the process)
    xc0 = from_host((rng.uniform(-1, 1, block)
                     + 1j * rng.uniform(-1, 1, block)).astype(np.complex64))
    raw = jnp.asarray(rng.integers(0, 256, block, dtype=np.uint8))

    def perturb(i):  # defeat loop hoisting; numerically negligible
        return x0 + i.astype(jnp.float32) * 1e-30

    def perturbc(i):
        return xc0 + i.astype(jnp.complex64) * 1e-30

    def case(name, fn):
        try:
            out[name] = block / _time_jit(fn, iters)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: {str(e)[:160]}", file=sys.stderr)
        if dump:  # incremental: a later hang/timeout keeps earlier results
            with open(dump, "w") as fh:
                json.dump({k: float(v) for k, v in out.items()}, fh)

    methods = ("conv", "banded", "direct", "pallas")
    for ntaps in (32, 128, 512):
        taps = rng.uniform(-1, 1, ntaps).astype(np.float32)
        for method in methods:
            if method == "direct" and ntaps > 32:
                continue  # [num, K] im2col at this size is pathological
            case(f"filter_r_k{ntaps}_{method}",
                 lambda i, m=method, t=taps, k=ntaps: fir.fir_filter(
                     t, perturb(i), block - k + 1, method=m))
    taps128 = rng.uniform(-1, 1, 128).astype(np.float32)
    for method in ("conv", "banded", "pallas"):
        case(f"decimate_r_k128_{method}",
             lambda i, m=method: fir.fir_decimate(
                 taps128, 4, perturb(i), (block - 128) // 4, method=m))
        case(f"filter_c_k128_{method}",
             lambda i, m=method: fir.fir_decimate(
                 taps128, 1, perturbc(i), block - 127, method=m))
    case("resample_r_3_4",
         lambda i: fir.fir_resample(taps128, 3, 4, perturb(i))[0])
    case("resample_c_3_4",
         lambda i: fir.fir_resample(taps128, 3, 4, perturbc(i))[0])
    # conversion / scale / fft (convert.c, scale.c, FFT.hs analogs)
    case("convert_u8",
         lambda i: jnp.abs(convert.iq_u8_to_cfloat(raw + i.astype(jnp.uint8))))
    case("scale", lambda i: convert.scale(0.3, perturb(i)))
    case("fft_1024_batch",
         lambda i: jnp.abs(fftops.fft(perturbc(i).reshape(-1, 1024))))
    case("dc_blocker", lambda i: scans.dc_blocker(perturb(i))[0])
    # fused int8-MXU front end (convert + decimate-by-8, 51 taps)
    from sdr_tpu.ops.quantized import fir_decimate_u8_planar
    taps51 = rng.uniform(-1, 1, 51).astype(np.float32)
    case("u8_front_k51_d8_int8",
         lambda i: fir_decimate_u8_planar(
             taps51, 8, raw + i.astype(jnp.uint8),
             (block // 2 - 51) // 8 + 1))
    return out


def _chain_subprocess(code: str, tag: str, attempts: int = 3):
    """Run one chain bench snippet in a subprocess with retry + cooldown.

    The tunneled TPU runtime 'poisons' a client (and itself, for minutes)
    on certain failures; isolation + patience gets a number through."""
    import subprocess
    for attempt in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True, timeout=900)
            if r.returncode == 0:
                return float(r.stdout.strip().splitlines()[-1])
            print(f"{tag} attempt {attempt}: "
                  f"{r.stderr[-300:]}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"{tag} attempt {attempt}: {e}",
                  file=sys.stderr)
        if attempt + 1 < attempts:
            time.sleep(240)  # tunnel recovery window
    return None


def main():
    block = 10_485_760  # 10 MiB u8 -> 5.24M complex samples / block
    results = {}
    # headline: block-parallel recorded-stream processing (32 blocks in
    # one program); fallback/secondary: carry-chained streaming steps
    cases = [
        ("fm_chain_batched",
         "import json, bench; "
         "print(json.dumps(bench.bench_chain_batched('conv', 'auto')))"),
        ("fm_chain_stream",
         "import json, bench; "
         f"print(json.dumps(bench.bench_chain('conv', {block})))"),
    ]
    for tag, code in cases:
        rate = _chain_subprocess(code, tag)
        if rate is not None:
            results[tag] = rate
    best = None
    for tag in ("fm_chain_batched", "fm_chain_stream"):
        if tag in results and (best is None or results[tag] > best[1]):
            best = (tag, results[tag])
    if best is None:
        print(json.dumps({"metric": "fm_chain_samples_per_sec_per_chip",
                          "value": 0, "unit": "complex S/s",
                          "vs_baseline": 0.0}))
        return 1

    # headline FIRST (cold compiles below can outlive the caller's budget;
    # stdout contract stays one JSON line either way)
    print(json.dumps({
        "metric": "fm_chain_samples_per_sec_per_chip",
        "value": round(best[1]),
        "unit": "complex S/s",
        "vs_baseline": round(best[1] / BASELINE_PER_CHIP, 3),
    }), flush=True)

    # kernel matrix in a subprocess: a backend bug in one case (the axon
    # runtime "poisons" a client on certain failures) must not take down
    # the headline measurement.
    try:
        import subprocess
        r = subprocess.run(
            [sys.executable, "-c",
             "import bench; "
             "bench.bench_kernels(iters=10, dump='bench_kernels.json')"],
            capture_output=True, text=True, timeout=3600)
        if r.returncode != 0:
            print(f"kernel bench failed: {r.stderr[-500:]}", file=sys.stderr)
        with open("bench_kernels.json") as fh:
            results.update(json.load(fh))  # whatever completed
    except Exception as e:  # noqa: BLE001
        print(f"kernel bench failed: {e}", file=sys.stderr)

    for k, v in sorted(results.items()):
        print(f"{k:28s} {v/1e9:9.3f} GS/s", file=sys.stderr)
    try:
        with open("bench_details.json", "w") as fh:
            json.dump({k: float(v) for k, v in results.items()}, fh,
                      indent=2)
    except OSError:
        pass

    return 0


if __name__ == "__main__":
    sys.exit(main())
