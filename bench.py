"""Benchmark driver: FM receive-chain throughput on the attached device.

Prints ONE JSON line on stdout:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "config": {...}}

Metric: complex input samples/sec/chip through the full FM chain
(u8 IQ -> convert -> decimate 8 -> FM demod -> 3/10 resample -> audio FIR
-> scale), matching BASELINE.json's headline.  ``vs_baseline`` compares the
per-chip rate against the north-star target of 10 GS/s aggregate on a
v5e-16, i.e. 625 MS/s per chip.  ``config`` pins the measurement so the
number is reproducible: front end, FIR method, block count/size, and the
second-run stability check.

Structure (budgeted against BENCH_BUDGET_S, default 1500 s — well inside
the driver window; rounds 1 and 2 both overran it and were killed with
rc 124, so the budget is now deliberately conservative and every section
is deadline-gated):

0. prewarm — compile the headline program pair in a bounded subprocess
   so the persistent cache absorbs the tunnel's 1-10 min remote compiles
   BEFORE any timed run (a cold timing subprocess used to blow its own
   timeout on compiles alone).
1. headline — the CANONICAL configuration, ONE window; the JSON line
   prints as soon as it lands.
2. judged configs (#3 waterfall, #4 AM, #5 channelizer) — immediately
   after the headline, hard per-section caps (r4 never reached them).
3. per-stage breakdown (bench_stages.json) — per-case subprocesses.
4. kernel variant matrix (bench_kernels.json) — the Criterion analog
   (benchmarks/Benchmarks.hs:79-156), per-case subprocesses.
5. comparison rows (second headline window, alt dispatch, sequential
   stream) only with leftover budget.

Everything lands in bench_details.json (seeded from the committed file,
so a deadline-trimmed run refreshes what it measured and keeps the rest);
stderr carries the human table.  A SIGALRM watchdog guarantees the
process prints its JSON line and exits 0 even if a section wedges.
"""

import contextlib
import json
import os
import signal
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

# the ONE canonical headline configuration (recorded in the JSON line)
HEADLINE_CONFIG = {
    "formulation": "run_time_batched (vmap block-parallel, one program)",
    "front": "fused",         # ONE Pallas kernel: u8 IQ convert +
                              # decimate + FM demod (U8FrontDemod,
                              # s8 taps, Q=128, combined band — the r5
                              # sweep winner: 3.08 ms vs 3.55 for s16
                              # per 32x10 MiB; chain-level accuracy vs
                              # the exact front 8.6e-6, the demod
                              # normalizes the quantization — see
                              # fm_chain's docstring)
    "front_precision": "s8",
    "atan2": "poly",          # in-kernel polynomial atan2 (5.8e-7 rad)
    "method": "auto",         # back half: ResampleFirScale — Pallas
                              # band resample + Pallas audio FIR with
                              # the volume folded into its taps (the
                              # r5 measured winner at 1.01 ms; the
                              # single fused two-stage kernel measured
                              # 2.2 ms — negative result recorded in
                              # kernels/backhalf_pallas.py)
    "nblocks": 32,
    "block_u8": 10_485_760,
    "timing": ("calibrated pair: 8- and 16-repetition programs "
               "(chain unrolled inside, perturbed inputs, scalar "
               "fold); per-chain time = (min(t_16) - min(t_8)) / 8 "
               "over a 180 s alternating sampling window — the "
               "difference cancels the tunnel's per-dispatch constant "
               "(measured 20-40 ms in some windows, the same order as "
               "the chain itself) and the window length rides out the "
               "device's minutes-scale bimodality (run-to-run spread "
               "measured 0.3% at 240 s in r2)"),
}

_T0 = time.time()
_BUDGET = float(os.environ.get("BENCH_BUDGET_S", "1500"))


def _remaining() -> float:
    return _BUDGET - (time.time() - _T0)


def _sync(y):
    """Force completion.  block_until_ready is unreliable on tunneled
    runtimes (observed returning before execution); transferring data
    derived from the value is not.  A [1] slice, not a 0-d scalar —
    0-d buffer transfers are another unimplemented corner there."""
    return float(np.asarray(jnp.ravel(y)[:1])[0])


def _pair_mins(g1, g2, operands, runs: int):
    """min wall time of each of a calibrated program pair, alternating."""
    b1 = b2 = None
    for _ in range(runs):
        t0 = time.perf_counter()
        _sync(g1(*operands))
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _sync(g2(*operands))
        d2 = time.perf_counter() - t0
        b1 = d1 if b1 is None else min(b1, d1)
        b2 = d2 if b2 is None else min(b2, d2)
    return b1, b2


def _headline_programs(method: str, front: str, block: int, nblocks: int,
                       iters: int):
    """Build the calibrated headline program pair (g1, g2) and its input.

    Shared by the prewarm step and the timed run so both compile
    byte-identical HLO (the persistent-cache contract)."""
    from sdr_tpu.apps.chains import fm_chain
    from sdr_tpu.parallel.sharded import time_sharded_fn

    ops = fm_chain(method=method, front=front)
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.integers(0, 256, (nblocks, block), dtype=np.uint8))
    fn = time_sharded_fn(ops, axis_name="b")

    def make(n):
        def looped(x):
            # x passed as an ARGUMENT (a closed-over array would be a
            # 335 MB program constant -> HTTP 413 from the tunnel's
            # remote-compile on cache miss); (acc * 0) serializes the
            # iterations so XLA reuses buffers and overlap can't inflate
            # the rate.
            acc = jnp.float32(0)
            for i in range(n):
                y = jax.vmap(fn, axis_name="b")(
                    x + (jnp.uint8(i) + (acc * 0).astype(jnp.uint8)))
                acc = acc + jnp.mean(y) * 1e-3
            return acc[None]
        return jax.jit(looped)

    return make(iters), make(2 * iters), xb


def prewarm_headline(method: str = "conv", front: str = "quantized",
                     block: int = 10_485_760, nblocks: int = 32,
                     iters: int = 8):
    """Compile (only) the headline program pair, populating the
    persistent cache.  Run in its own bounded subprocess before any
    timed section: remote compiles through the tunnel take 1-10 min
    each and used to land inside the timing subprocess's budget."""
    g1, g2, xb = _headline_programs(method, front, block, nblocks, iters)
    # compile the N-rep program first so a timeout still caches one
    _sync(g1(xb))
    _sync(g2(xb))


def bench_chain_batched(method: str = "conv", front: str = "quantized",
                        block: int = 10_485_760, nblocks: int = 32,
                        iters: int = 8, sample_s: float = 180.0,
                        warmup_s: float = 10.0):
    """The canonical headline measurement (HEADLINE_CONFIG).

    ``nblocks`` blocks processed block-PARALLEL
    (parallel.run_time_batched semantics — same output samples as the
    sequential streamed run, proven in tests/test_parallel.py), repeated
    ``iters`` / ``2*iters`` times INSIDE two compiled programs on
    perturbed inputs with every output folded into one scalar; the
    per-chain time is the calibrated difference (see the inline comment
    at the sampling loop).  Returns (rate, sampling summary)."""
    g1, g2, xb = _headline_programs(method, front, block, nblocks, iters)
    _sync(g1(xb))
    _sync(g2(xb))
    # sustained warm-up before timing
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < warmup_s:
        _sync(g2(xb))
    # CALIBRATED-PAIR sampling: per-iteration time is the difference
    # between the 2N- and N-iteration programs, which cancels the
    # tunnel's per-dispatch constant exactly — measured 20-40 ms in some
    # windows, i.e. the same order as the chain itself, so dividing one
    # program's wall time by N understated throughput ~25%.  The device
    # is also BIMODAL on a minutes scale (45% apart across windows,
    # +-3% within one), so both programs are sampled alternately over a
    # ``sample_s``-second continuous window and the rate uses the min of
    # each distribution.
    t1s, t2s = [], []
    end = time.perf_counter() + sample_s
    while time.perf_counter() < end:
        t0 = time.perf_counter()
        _sync(g1(xb))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _sync(g2(xb))
        t2s.append(time.perf_counter() - t0)
    dt = (min(t2s) - min(t1s)) / iters
    if dt <= 0:
        # the two programs' minima landed in different device modes —
        # an impossible (non-positive) difference must fail loudly, not
        # become a near-infinite recorded rate
        raise ValueError(
            f"calibration crossed device modes: min(t_2n)={min(t2s):.4f}"
            f" <= min(t_n)={min(t1s):.4f}; rerun")
    rate = (nblocks * block // 2) / dt
    summary = {"n": len(t1s), "sec_per_chain": dt,
               "min_n": min(t1s), "min_2n": min(t2s),
               "p50_n": sorted(t1s)[len(t1s) // 2],
               "p50_2n": sorted(t2s)[len(t2s) // 2],
               "dispatch_const_est": min(t1s) - iters * dt}
    return rate, summary


def bench_chain_stream(method: str = "conv", front: str = "quantized",
                       block: int = 10_485_760, iters: int = 12):
    """Secondary: sequential carry-chained streaming steps INSIDE one
    program (python-unrolled — the axon runtime rejects some scan-wrapped
    chains).  Fresh input slices per step prevent CSE; the audio fold
    makes every step live."""
    from sdr_tpu.apps.chains import fm_chain
    from sdr_tpu.stream import Pipeline

    p = Pipeline(fm_chain(method=method, front=front), block_in=block,
                 in_dtype=jnp.uint8)
    rng = np.random.default_rng(0)
    n_src = 4
    raw = jnp.asarray(rng.integers(0, 256, (n_src, block), dtype=np.uint8))

    def make(n):
        def chained(r):
            c = p.init()
            acc = jnp.float32(0)
            for i in range(n):
                c, y = p.apply(c, r[i % n_src])
                acc = acc + jnp.mean(y) * 1e-3
            return acc[None]
        return jax.jit(chained)

    # calibrated pair (see bench_chain_batched): the difference cancels
    # the tunnel's per-dispatch constant exactly
    g1, g2 = make(iters), make(2 * iters)
    _sync(g1(raw))
    _sync(g2(raw))
    b1, b2 = _pair_mins(g1, g2, (raw,), runs=6)
    dt = (b2 - b1) / iters
    if dt <= 0:
        raise ValueError("calibration crossed device modes; rerun")
    return (block // 2) / dt


def bench_waterfall(block: int = 10_485_760, nblocks: int = 8,
                    fft_size: int = 1024, hop: int = 512, iters: int = 8):
    """BASELINE config #3: the waterfall spectral pipeline — u8 IQ ->
    complex -> windowed overlapping ``fft_size``-point FFT magnitude rows
    (the reference's fork -> fftw -> plotWaterfall chain,
    examples + Plot.hs:72-78, run batched).  Rate = complex input
    samples/sec (calibrated pair)."""
    from sdr_tpu.apps.chains import waterfall_chain
    from sdr_tpu.parallel.sharded import time_sharded_fn

    ops = waterfall_chain(fft_size, hop)
    fn = time_sharded_fn(ops, axis_name="b")
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, (nblocks, block), dtype=np.uint8))
    dt = _time_jit(
        lambda i, r: jax.vmap(fn, axis_name="b")(r + i.astype(jnp.uint8)),
        iters, operands=(raw,))
    return nblocks * block // 2 / dt


def bench_am(block: int = 10_485_760, nblocks: int = 32, iters: int = 1):
    """BASELINE config #4: the AM/airband chain — u8 IQ -> mix to DC ->
    decimate 16 -> AGC (linear associative scan) -> envelope -> DC block
    -> volume.  Rate = complex input samples/sec (calibrated pair).

    ``iters=1`` (a 1-rep vs 2-rep pair) where the other chains use 8:
    the AM chain carries TWO associative scans (AGC gains, DC blocker)
    and the axon remote compiler's time on it grows superlinearly with
    the unroll — the r5 8/16-rep pair never returned in 30 min (killed,
    three times, complex AND planar), while the chain itself is ~17 ms
    per rep so even the 1-rep program dwarfs the 20-40 ms dispatch
    constant the pair subtracts."""
    from sdr_tpu.apps.chains import am_chain
    from sdr_tpu.parallel.sharded import time_sharded_fn

    ops = am_chain()
    fn = time_sharded_fn(ops, axis_name="b")
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, (nblocks, block), dtype=np.uint8))
    dt = _time_jit(
        lambda i, r: jax.vmap(fn, axis_name="b")(r + i.astype(jnp.uint8)),
        iters, operands=(raw,))
    return nblocks * block // 2 / dt


def bench_channelizer(n_channels: int = 64, n: int = 4_096_000,
                      iters: int = 8):
    """Secondary: the wideband polyphase-channelizer bank (BASELINE
    config #5) — one complex wideband stream split into ``n_channels``
    basebands, each FM-demodulated (the reference's '64 independent FM
    chains' run as one batched program instead of 64 OS threads).
    Rate = wideband complex input samples/sec (calibrated _time_jit)."""
    from sdr_tpu.apps.chains import channelizer_chain
    from sdr_tpu.parallel.sharded import time_sharded_fn
    from sdr_tpu.utils import from_host

    ops = channelizer_chain(n_channels, method="conv", wideband=True)
    fn = time_sharded_fn(ops, axis_name="b")
    rng = np.random.default_rng(0)
    x = from_host((rng.uniform(-1, 1, (2, n))
                   + 1j * rng.uniform(-1, 1, (2, n))).astype(np.complex64))
    dt = _time_jit(
        lambda i, xb: jax.vmap(fn, axis_name="b")(
            xb + i.astype(jnp.complex64) * 1e-30),
        iters, operands=(x,))
    return 2 * n / dt


def bench_live(block: int = 1_310_720, nblocks: int = 192,
               batch_sizes=(0, 1, 8, 32)):
    """The LIVE path (VERDICT r4 #8): end-to-end host-loop throughput of
    apps/fm.py's processing loop — host u8 blocks in, audio as host
    numpy out, streaming carries threaded across group seams.  B=0 is
    the sequential ``Pipeline.run`` loop; B>0 the segmented
    ``run_batched`` grouping apps/fm.py exposes as ``--batched``.
    Returns {"live_run" | "live_batched_B": input complex samples/s};
    the argmax is the measured basis for the app's --batched default.
    Wall-clock timing (not calibrated-pair): the live loop's dispatch
    overhead IS part of what it sustains."""
    from sdr_tpu.apps.chains import fm_chain
    from sdr_tpu.stream import Pipeline
    rng = np.random.default_rng(0)
    pool = [rng.integers(0, 256, block, dtype=np.uint8)
            for _ in range(8)]

    def src(n):
        for i in range(n):
            yield pool[i % len(pool)]

    res = {}
    for B in batch_sizes:
        p = Pipeline(fm_chain(), block_in=block, in_dtype=jnp.uint8)
        tag = "live_run" if B == 0 else f"live_batched_{B}"
        try:
            with _case_alarm(tag, 600):
                run = (lambda n, B=B, p=p: p.run(src(n)) if B == 0
                       else p.run_batched(src(n), B))
                for y in run(2 * max(B, 1)):   # compile warmup
                    np.asarray(y)
                t0 = time.perf_counter()
                for y in run(nblocks):
                    np.asarray(y)
                dt = time.perf_counter() - t0
            res[tag] = nblocks * (block // 2) / dt
            print(f"{tag:18s} {res[tag]/1e9:7.2f} GS/s "
                  f"({nblocks * block / 2 / 1.28e6 / dt:,.0f}x realtime)",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: {str(e)[:160]}", file=sys.stderr)
    return res


class OverheadDominated(ValueError):
    """_time_jit's 2x program was not measurably slower: the region is
    constant-cost-dominated at this repetition count."""


@contextlib.contextmanager
def _case_alarm(name: str, seconds: int = 900):
    """Hard per-case timeout (SIGALRM): a single hung remote compile must
    not stall the whole matrix (observed: one case blocked on a tunnel
    RPC for 90+ minutes with zero CPU).  Main-thread only."""
    def _raise(signum, frame):
        raise TimeoutError(f"{name}: case exceeded {seconds}s")
    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _time_jit(fn, iters=10, operands=(), runs=4, chained=False):
    """Per-iteration device time of ``fn`` with the iteration loop INSIDE
    the compiled program (python-unrolled, summed into one scalar).

    Host-loop timing is useless on tunneled runtimes: per-execution RPC
    overhead (~3 ms here) swamps microsecond kernels.  Unrolled rather
    than lax.scan because the axon runtime rejects some scan-wrapped
    kernels outright (UNIMPLEMENTED).  Each iteration perturbs the input
    (fn receives the iteration index as a traced scalar) so XLA cannot
    CSE the copies, and a scalar of every output folds into the result so
    none can be dead-coded.

    SELF-CALIBRATING: the loop is compiled at ``iters`` AND ``2*iters``
    and the per-iteration time is the DIFFERENCE divided by ``iters``.
    Subtracting the two runs cancels every constant cost — RPC
    round-trip, result transfer, dispatch — exactly, where the old
    null-RPC subtraction both under- and over-corrected (it produced
    physically impossible stage rates for microsecond ops in the round-2
    record).  If the 2x program is not measurably slower the measurement
    is overhead-dominated even at 2x; raise ValueError rather than
    record noise.

    Pass large input arrays via ``operands`` (forwarded to
    ``fn(i, *operands)``) rather than closing over them: a closed-over
    array is embedded in the program as a CONSTANT, and a 335 MB constant
    blows the tunnel's remote-compile request limit (HTTP 413) whenever
    the persistent cache misses.
    """
    def make(n):
        if chained:
            # elementwise/scan ops: XLA fuses any same-shape chain into a
            # single pass (a mean-folded loop of scales measures ONE
            # traversal no matter the count).  Feed each iteration's
            # output to the next through an optimization_barrier so every
            # iteration is a real read+write pass — the honest
            # memory-bound form of a standalone elementwise kernel.
            def looped(x, *rest):
                for i in range(n):
                    x = jax.lax.optimization_barrier(
                        fn(jnp.int32(i), x, *rest))
                # return the WHOLE array: a [:1] slice here lets XLA
                # dead-code the chain down to one element's dataflow
                # (observed — the barrier does not block slice
                # propagation); a program output must materialize, and
                # _sync only transfers one element of it
                return x
            return jax.jit(looped)

        def looped(*ops_):
            acc = jnp.float32(0)
            for i in range(n):
                # (acc * 0) makes iteration i's INPUT depend on i-1's
                # output: XLA must run them serially and can reuse
                # intermediate buffers (independent copies of a 335 MB
                # front-end case otherwise OOM), and overlap can't
                # inflate the rate.
                y = fn(jnp.int32(i) + (acc * 0).astype(jnp.int32), *ops_)
                first = jax.tree.leaves(y)[0]
                red = jnp.mean(jnp.abs(first)) if jnp.iscomplexobj(first) \
                    else jnp.mean(first)
                acc = acc + red.astype(jnp.float32) * 1e-6
            return acc[None]
        return jax.jit(looped)

    g1, g2 = make(iters), make(2 * iters)
    _sync(g1(*operands))
    _sync(g2(*operands))
    best1, best2 = _pair_mins(g1, g2, operands, runs)
    if best2 < best1 * 1.15:
        raise OverheadDominated(
            f"overhead-dominated: {iters} iters {best1*1e3:.2f} ms vs "
            f"{2*iters} iters {best2*1e3:.2f} ms — raise iters")
    return (best2 - best1) / iters


def bench_stages(block: int = 10_485_760, nblocks: int = 32,
                 dump: str = "bench_stages.json", deadline: float = None,
                 only: str = None, collect: bool = False):
    """Per-stage cost of the batched FM chain at its REAL in-pipeline
    shapes (the roofline input: VERDICT r1 weak #5).  Rates are complex
    input samples/sec equivalents so stages are directly comparable to the
    chain headline; seconds-per-dispatch are recorded too.

    Iteration counts are set per stage from the stage's static hardware
    floor (utils/roofline.py) so cheap stages get enough in-program
    repetitions for the calibrated difference in _time_jit to resolve.

    ``only``/``collect``: per-case subprocess isolation hooks (same
    contract as bench_kernels) — the r4 driver lost this whole section
    to one 492 s in-process timeout; each case now runs in its own
    subprocess via bench_stages_robust."""
    from sdr_tpu.apps.chains import fm_taps, fm_chain
    from sdr_tpu.ops import fir, demod
    from sdr_tpu.ops.quantized import fir_decimate_u8_planar
    from sdr_tpu.ops import convert
    from sdr_tpu.utils.roofline import chain_roofline

    rl = chain_roofline(fm_chain(method="conv", front="quantized"),
                        block, batch=nblocks)
    rl_fused = chain_roofline(fm_chain(method="conv", front="fused"),
                              block, batch=nblocks)
    rl_new = chain_roofline(fm_chain(method="conv", front="fused",
                                     fuse_back=True), block,
                            batch=nblocks)

    def iters_for(floor_s: float) -> int:
        return int(min(64, max(8, 0.02 // max(floor_s, 1e-6) + 1)))

    rf, ars, afl = fm_taps()
    rng = np.random.default_rng(0)
    n_c = block // 2                  # complex samples per block
    n_d = n_c // 8                    # after decimate-by-8
    n_r = n_d * 3 // 10               # after 3/10 resample
    names = []
    # operands built LAZILY (cached): a per-case subprocess (the robust
    # path) must only pay the host->device transfer its own case needs
    _cache = {}

    def _lazy(key, build):
        if key not in _cache:
            _cache[key] = build()
        return _cache[key]

    def raw():
        return _lazy("raw", lambda: jnp.asarray(
            np.random.default_rng(0).integers(
                0, 256, (nblocks, block), dtype=np.uint8)))

    def xc():
        return _lazy("xc", lambda: jnp.asarray(
            np.random.default_rng(1).uniform(
                -1, 1, (nblocks, 2, n_c + 64)).astype(np.float32)))

    def xp():
        return _lazy("xp", lambda: jnp.asarray(
            np.random.default_rng(1).uniform(
                -1, 1, (nblocks, 2, n_d + 64)).astype(np.float32)))

    def xd():
        return _lazy("xd", lambda: jnp.asarray(
            np.random.default_rng(1).uniform(
                -1, 1, (nblocks, n_d + 64)).astype(np.float32)))

    def xr():
        return _lazy("xr", lambda: jnp.asarray(
            np.random.default_rng(1).uniform(
                -1, 1, (nblocks, n_r + 64)).astype(np.float32)))

    out = {}
    if not collect:
        try:
            # seed from the committed artifact: a timeout mid-run must not
            # clobber previously recorded rows (each overwrites its own)
            with open(dump) as fh:
                out.update(json.load(fh))
        except (OSError, ValueError):
            pass

    def case(name, make_fn, in_complex_samples, make_operands,
             stage=None, iters=None):
        names.append(name)
        if collect or (only is not None and name != only):
            return
        if deadline is not None and time.time() > deadline:
            print(f"bench_stages: deadline before {name}", file=sys.stderr)
            return
        fl = stage["floor_s"] if stage else 0.02
        try:
            with _case_alarm(name):
                dt = _time_jit(make_fn(), iters or iters_for(fl),
                               operands=make_operands())
            out[name] = {"sec": dt,
                         "gsps_equiv": in_complex_samples / dt / 1e9,
                         "round": "r5"}
            if stage:
                out[name]["floor_sec"] = fl
                out[name]["pct_of_floor"] = 100.0 * fl / dt
                out[name]["bound_by"] = stage["bound_by"]
        except Exception as e:  # noqa: BLE001
            print(f"{name}: {str(e)[:160]}", file=sys.stderr)
            out[name] = {"error": str(e)[:200]}
        with open(dump, "w") as fh:
            json.dump(out, fh, indent=2)

    total = nblocks * n_c
    case("front_int8_fused",
         lambda: lambda i, r: fir_decimate_u8_planar(
             rf, 8, r + i.astype(jnp.uint8), n_d, impl="auto"),
         total, lambda: (raw(),), stage=rl["stages"][0])
    # the r4 headline front: convert + decimate + FM demod in ONE Pallas
    # kernel (its floor is the fused chain's stage-0 roofline)

    def _fused_case(prec):
        def f(i, r):
            from sdr_tpu.kernels.u8_front_demod_pallas import (
                u8_front_demod_pallas)
            return u8_front_demod_pallas(rf, 8, r + i.astype(jnp.uint8),
                                         None, n_d, precision=prec)
        return f

    # the chain-default front (s8, r5) and the s16 comparison row
    case("front_demod_fused", lambda: _fused_case("s8"), total,
         lambda: (raw(),), stage=rl_new["stages"][0])
    case("front_demod_fused_s16", lambda: _fused_case("s16"), total,
         lambda: (raw(),), stage=rl_fused["stages"][0])

    def _backhalf_case():
        from sdr_tpu.stream import ResampleFirScale
        op = ResampleFirScale(ars, 3, 10, afl, 0.2)

        def f(i, x):
            return op._kernel(x + i.astype(jnp.float32) * 1e-30, n_r,
                              op._offset_k)
        return f

    # the r5 chain tail (band resample + gain-folded audio FIR)
    case("backhalf_resample_fir", _backhalf_case, total, lambda: (xd(),),
         stage=rl_new["stages"][1], iters=24)
    case("front_exact_convert",
         lambda: lambda i, r: convert.iq_u8_to_planar(
             r + i.astype(jnp.uint8)),
         total, lambda: (raw(),))
    case("front_exact_decim_conv",
         lambda: lambda i, x: fir.fir_decimate(
             rf, 8, x + i.astype(jnp.float32) * 1e-30,
             (n_c + 64 - 51) // 8 + 1, method="conv"), total,
         lambda: (xc(),))
    case("demod_planar",
         lambda: lambda i, x: demod.fm_demod_planar(
             x + i.astype(jnp.float32) * 1e-30,
             jnp.zeros((nblocks, 2), jnp.float32))[0], total,
         lambda: (xp(),), stage=rl["stages"][1])
    case("demod_planar_poly",
         lambda: lambda i, x: demod.fm_demod_planar(
             x + i.astype(jnp.float32) * 1e-30,
             jnp.zeros((nblocks, 2), jnp.float32), atan2="poly")[0],
         total, (lambda: (xp(),)), stage=rl["stages"][1])
    case("resample_3_10_k31",
         lambda: lambda i, x: fir.fir_resample(
             ars, 3, 10, x + i.astype(jnp.float32) * 1e-30, 0,
             (n_d + 64) * 3 // 10, method="conv")[0], total,
         lambda: (xd(),), stage=rl["stages"][2])
    case("resample_3_10_k31_band",
         lambda: lambda i, x: fir.fir_resample(
             ars, 3, 10, x + i.astype(jnp.float32) * 1e-30, 0,
             (n_d + 64) * 3 // 10, method="band")[0], total,
         lambda: (xd(),), stage=rl["stages"][2])
    case("audio_fir_k64",
         lambda: lambda i, x: fir.fir_filter(
             afl, x + i.astype(jnp.float32) * 1e-30, n_r, method="conv"),
         total, lambda: (xr(),), stage=rl["stages"][3])
    # the dispatched (auto) audio path: the Pallas banded kernel — fast
    # enough that the calibrated difference needs many in-program reps
    case("audio_fir_k64_pallas",
         lambda: lambda i, x: fir.fir_filter(
             afl, x + i.astype(jnp.float32) * 1e-30, n_r,
             method="pallas"),
         total, lambda: (xr(),), stage=rl["stages"][3], iters=128)

    if collect:
        return names
    # the full chain roofline rides along so every recorded stage can be
    # read against its hardware floor
    out["roofline"] = rl
    with open(dump, "w") as fh:
        json.dump(out, fh, indent=2)
    return out


def bench_stages_robust(dump: str = "bench_stages.json",
                        deadline: float = None, per_case_s: float = 600.0):
    """Run every stage case in its OWN subprocess with a parent-enforced
    timeout (the bench_kernels_robust pattern) — the r4 run lost the
    entire stage section to a single in-process 492 s timeout."""
    import subprocess
    names = bench_stages(collect=True)
    for name in names:
        remaining = None if deadline is None else deadline - time.time()
        if remaining is not None and remaining < 120:
            print(f"bench_stages_robust: budget before {name}",
                  file=sys.stderr)
            break
        budget = per_case_s if remaining is None \
            else min(per_case_s, remaining)
        code = (f"import bench; bench.bench_stages(dump={dump!r}, "
                f"only={name!r})")
        try:
            _, _, err = _run_child([sys.executable, "-c", code],
                                   timeout=budget)
            if err:
                sys.stderr.write(err[-400:])
        except subprocess.TimeoutExpired:
            print(f"{name}: killed after {budget:.0f}s (hung compile)",
                  file=sys.stderr)
            time.sleep(120)  # tunnel recovery window after a kill
    try:
        with open(dump) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def bench_kernels(block: int = 1 << 22, iters: int = 24, dump: str = None,
                  deadline: float = None, only: str = None,
                  collect: bool = False):
    """Per-kernel microbenchmarks — the Criterion variant matrix analog
    (benchmarks/Benchmarks.hs:79-156: {filter, decimate, resample} x
    {real, complex} x implementations + conversion + scale; tap-count
    sweep per BASELINE config #2).  Rates are input samples/sec.

    ``only``: compute just that case, seeding the dump file's existing
    rows (per-case subprocess isolation — see bench_kernels_robust).
    ``collect``: return the ordered case-name list without running.
    """
    from sdr_tpu.ops import fir, convert, scans, fftops
    out = {}
    names = []
    if dump and only:
        try:
            with open(dump) as fh:
                out.update(json.load(fh))
        except (OSError, ValueError):
            pass
    rng = np.random.default_rng(0)
    if collect:
        # name enumeration only: placeholder hosts (never touched)
        x0 = np.zeros(block, np.float32)
        xc0 = np.zeros(block, np.complex64)
        raw = np.zeros(4 * block, np.uint8)
    else:
        from sdr_tpu.utils import from_host
        # operands passed as jit ARGUMENTS, never closures (a closed-over
        # array becomes a program constant: bloats the persistent cache
        # and can blow the tunnel's remote-compile request limit)
        x0 = jnp.asarray(rng.uniform(-1, 1, block).astype(np.float32))
        # complex test vector assembled ON device (complex h2d transfers
        # are unimplemented on the axon runtime, poisoning the process)
        xc0 = from_host((rng.uniform(-1, 1, block) + 1j * rng.uniform(
            -1, 1, block)).astype(np.complex64))
        # the u8 front end is far faster per element — give it 4x the
        # bytes so its calibrated difference stays well above jitter
        raw = jnp.asarray(rng.integers(0, 256, 4 * block, dtype=np.uint8))

    def pr(i, x):  # defeat loop hoisting; numerically negligible
        return x + i.astype(x.dtype) * 1e-30

    def case(name, fn, operands, n=block, case_iters=None, chained=False):
        names.append(name)
        if collect or (only is not None and name != only):
            return
        if deadline is not None and time.time() > deadline:
            print(f"bench_kernels: deadline before {name}", file=sys.stderr)
            return
        for attempt_iters in (case_iters or iters,
                              6 * (case_iters or iters)):
            try:
                with _case_alarm(name):
                    dt = _time_jit(fn, attempt_iters, operands=operands,
                                   chained=chained)
                out[name] = n / dt
                break
            except OverheadDominated as e:
                # retry the fast case with 6x the in-program iterations
                # (only this signal retries — a deterministic config
                # ValueError from the op itself would just fail again)
                print(f"{name}: {str(e)[:120]}", file=sys.stderr)
            except Exception as e:  # noqa: BLE001
                print(f"{name}: {str(e)[:160]}", file=sys.stderr)
                break
        if dump:  # incremental: a later hang/timeout keeps earlier results
            with open(dump, "w") as fh:
                json.dump({k: float(v) for k, v in out.items()}, fh)

    # ordered so the formerly-missing rows (resample/convert/scale/fft/
    # dc_blocker/int8 front) land FIRST — a deadline cuts the tap sweep,
    # not the coverage (VERDICT r1 missing #3)
    from sdr_tpu.ops.quantized import fir_decimate_u8_planar
    taps51 = rng.uniform(-1, 1, 51).astype(np.float32)
    taps31 = rng.uniform(-1, 1, 31).astype(np.float32)
    taps128 = rng.uniform(-1, 1, 128).astype(np.float32)
    # all operands BATCHED [32, n/32] — the shape chains actually run;
    # single 1-D ops degenerate on the TPU conv/layout paths (see the
    # FIR-row comment below)
    nb = 4 * block
    rawb = raw.reshape(32, nb // 32)
    xr32 = x0.reshape(32, block // 32)
    xcr32 = xc0.reshape(32, block // 32)
    case("u8_front_k51_d8_int8",
         lambda i, r: fir_decimate_u8_planar(
             taps51, 8, r + i.astype(jnp.uint8),
             (nb // 32 // 2 - 51) // 8 + 1, impl="auto"), (rawb,), n=nb)
    # precision x band-geometry rows (VERDICT r4 #2): the s8/Q sweep
    # that set the chain default (s8 q128 — see fm_chain's docstring)
    for prec, q in (("s8", 128), ("s16", 128), ("s8", 64), ("s16", 64)):
        case(f"u8_front_k51_d8_{prec}_q{q}_pallas",
             lambda i, r, p=prec, qq=q: fir_decimate_u8_planar(
                 taps51, 8, r + i.astype(jnp.uint8),
                 (nb // 32 // 2 - 51) // 8 + 1, impl="pallas",
                 precision=p, q_out=qq), (rawb,), n=nb)
    # channelizer: stencil (TPU path) vs gather (oracle) at the
    # 64-channel production shape (VERDICT r4 #7)
    from sdr_tpu.ops.channelize import polyphase_channelize, \
        channelizer_taps
    ctaps = channelizer_taps(64, 12)
    for cmeth in ("stencil", "gather"):
        case(f"channelize_c64_p12_{cmeth}",
             lambda i, x, m=cmeth: jnp.abs(polyphase_channelize(
                 ctaps, 64, pr(i, x), method=m)), (xcr32,))
    case("resample_r_3_4",
         lambda i, x: fir.fir_resample(taps128, 3, 4, pr(i, x))[0],
         (xr32,))
    case("resample_c_3_4",
         lambda i, x: fir.fir_resample(taps128, 3, 4, pr(i, x))[0],
         (xcr32,))
    case("resample_r_3_10_k31",
         lambda i, x: fir.fir_resample(taps31, 3, 10, pr(i, x))[0],
         (xr32,))
    case("convert_u8",
         lambda i, r: jnp.abs(convert.iq_u8_to_cfloat(
             r + i.astype(jnp.uint8))), (rawb,), n=nb)
    case("convert_u8_planar",
         lambda i, r: convert.iq_u8_to_planar(r + i.astype(jnp.uint8)),
         (rawb,), n=nb)
    # scale: XLA collapses ANY algebraically-composable same-shape chain
    # of it — linear chains, quadratic compositions, flips — straight
    # through optimization_barrier, and UNCHAINED sibling iterations
    # fuse into one traversal of the shared operand (measured 667 GS/s
    # = 2.7 TB/s "read rate", i.e. nothing).  A standalone scale does
    # not exist post-XLA; the row records the one-r+w-pass elementwise
    # rate scale rides, via a chained PIECEWISE-linear step (max chains
    # have exponentially many pieces, no closed composition for the
    # simplifier to take).
    # 64 MiB operand: a block-sized (16 MiB) array fits the ~16 MB VMEM
    # and the whole barrier chain stays resident, measuring the VPU ALU
    # rate (1.4 TS/s recorded once in r5) instead of the HBM pass the
    # row is defined as — 4x block forces every iteration through HBM.
    xr4 = (x0.reshape(1, -1) if collect or only not in (None, "scale")
           else jnp.concatenate([x0] * 4).reshape(32, nb // 32))
    case("scale",
         lambda i, x: convert.scale(1.0000001, jnp.maximum(x, 0.999 * x)),
         (xr4,), n=nb, case_iters=64, chained=True)
    case("fft_1024_batch",
         lambda i, x: jnp.abs(fftops.fft(pr(i, x).reshape(-1, 1024),
                                         method="xla")), (xc0,))
    case("fft_1024_mxu",
         lambda i, x: jnp.abs(fftops.fft_mxu(pr(i, x).reshape(-1, 1024))),
         (xc0,))
    # crossover rows (the measured basis for _MXU_FFT_AUTO_MIN/MAX)
    for nfft in (256, 4096, 16384):
        if fftops._fft_factors(nfft):
            case(f"fft_{nfft}_mxu",
                 lambda i, x, nn=nfft: jnp.abs(fftops.fft_mxu(
                     pr(i, x).reshape(-1, nn))), (xc0,))
        case(f"fft_{nfft}_xla",
             lambda i, x, nn=nfft: jnp.abs(fftops.fft(
                 pr(i, x).reshape(-1, nn), method="xla")), (xc0,))
    # variant matrix: {filter, decimate} x {real, complex} x methods.
    # Operands are BATCHED [32, block/32] — the shape every chain
    # actually runs (XLA's TPU conv parallelizes over batch; a single
    # 1-D conv degenerates ~100x and would poison the dispatch table).
    nb32 = block // 32
    xb32 = x0.reshape(32, nb32)
    xcb32 = xc0.reshape(32, nb32)
    methods = ("conv", "direct", "pallas")
    for ntaps in (32, 128, 512):
        taps = rng.uniform(-1, 1, ntaps).astype(np.float32)
        for method in methods:
            if method == "direct" and ntaps > 32:
                continue  # [num, K] im2col at this size is pathological
            case(f"filter_r_k{ntaps}_{method}",
                 lambda i, x, m=method, t=taps, k=ntaps: fir.fir_filter(
                     t, pr(i, x), nb32 - k + 1, method=m), (xb32,))
    for method in ("conv", "pallas"):
        case(f"decimate_r_k128_{method}",
             lambda i, x, m=method: fir.fir_decimate(
                 taps128, 4, pr(i, x), (nb32 - 128) // 4, method=m),
             (xb32,))
        case(f"filter_c_k128_{method}",
             lambda i, x, m=method: fir.fir_decimate(
                 taps128, 1, pr(i, x), nb32 - 127, method=m), (xcb32,))
        case(f"decimate_r_k51_d8_{method}",
             lambda i, x, m=method: fir.fir_decimate(
                 taps51, 8, pr(i, x), (nb32 - 51) // 8, method=m), (xb32,))
    # the symmetric-kernel question (VERDICT r3 #8): the reference's
    # single biggest hand-optimization folds mirrored inputs to halve
    # multiplies for linear-phase taps (c_sources/common.h:160-260).
    # DESIGN §2 argues the MAC-count identity (a symmetric K-tap filter
    # IS two K/2-tap correlations over the same input) makes folding a
    # wash on MXU hardware; these rows measure it: the full-K banded
    # kernel vs the two-half-K formulation, same symmetric taps.
    tsym_h = rng.uniform(-1, 1, 64).astype(np.float32)
    tsym_f = np.concatenate([tsym_h, tsym_h[::-1]])
    case("filter_r_k128sym_full_pallas",
         lambda i, x: fir.fir_filter(tsym_f, pr(i, x), nb32 - 128 + 1,
                                     method="pallas"), (xb32,))
    case("filter_r_k128sym_full_conv",
         lambda i, x: fir.fir_filter(tsym_f, pr(i, x), nb32 - 128 + 1,
                                     method="conv"), (xb32,))
    case("filter_r_k128sym_twohalf_pallas",
         lambda i, x: (fir.fir_filter(tsym_h, pr(i, x), nb32 - 128 + 1,
                                      method="pallas")
                       + fir.fir_filter(tsym_h[::-1].copy(), pr(i, x),
                                        nb32 - 128 + 1, method="pallas",
                                        start=64)), (xb32,))
    case("filter_r_k128sym_twohalf_conv",
         lambda i, x: (fir.fir_filter(tsym_h, pr(i, x), nb32 - 128 + 1,
                                      method="conv")
                       + fir.fir_filter(tsym_h[::-1].copy(), pr(i, x),
                                        nb32 - 128 + 1, method="conv",
                                        start=64)), (xb32,))
    # dc_blocker LAST and small: its unrolled associative scan has twice
    # hung the tunnel's remote compile in a way no in-process timeout can
    # interrupt (the RPC blocks in C++ and never returns) — if it hangs
    # again, only this row is lost
    case("dc_blocker",
         lambda i, x: scans.dc_blocker(x[: 1 << 20])[0], (x0,),
         case_iters=4, chained=True, n=1 << 20)
    return names if collect else out


def bench_kernels_robust(dump: str = "bench_kernels.json",
                         deadline: float = None,
                         per_case_s: float = 1200.0):
    """Run every matrix case in its OWN subprocess with a parent-enforced
    timeout.  Remote compiles through the tunnel can hang forever with
    zero CPU, uninterruptible by any in-process timeout (SIGALRM never
    fires inside the blocked C++ RPC — observed three times); killing
    the whole subprocess is the only reliable recovery.  Rows merge into
    ``dump`` incrementally; a hung case costs its timeout, not the rest
    of the matrix."""
    import subprocess
    names = bench_kernels(collect=True)
    for name in names:
        remaining = None if deadline is None else deadline - time.time()
        if remaining is not None and remaining < 120:
            print(f"bench_kernels_robust: budget before {name}",
                  file=sys.stderr)
            break
        budget = per_case_s if remaining is None \
            else min(per_case_s, remaining)
        code = (f"import bench; bench.bench_kernels(dump={dump!r}, "
                f"only={name!r})")
        try:
            _, _, err = _run_child([sys.executable, "-c", code],
                                   timeout=budget)
            if err:
                sys.stderr.write(err[-400:])
        except subprocess.TimeoutExpired:
            print(f"{name}: killed after {budget:.0f}s (hung compile)",
                  file=sys.stderr)
            time.sleep(120)  # tunnel recovery window after a kill
    try:
        with open(dump) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


_LIVE_CHILDREN = []  # Popen objects the watchdog must kill before exiting


def _run_child(argv, timeout: float):
    """subprocess.run equivalent that registers the child so the SIGALRM
    watchdog can kill it (os._exit alone would orphan a live TPU
    client)."""
    import subprocess
    p = subprocess.Popen(argv, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
    _LIVE_CHILDREN.append(p)
    try:
        out, err = p.communicate(timeout=timeout)
        return p.returncode, out, err
    except subprocess.TimeoutExpired:
        p.kill()
        p.communicate()
        raise
    finally:
        _LIVE_CHILDREN.remove(p)


def _subproc(code: str, tag: str, timeout: float, attempts: int = 2):
    """Run one bench snippet in a subprocess with retry + cooldown.

    The tunneled TPU runtime 'poisons' a client (and itself, for minutes)
    on certain failures; isolation + patience gets a number through.
    Returns the last stdout line parsed as JSON, or None."""
    for attempt in range(attempts):
        if _remaining() < 60:
            print(f"{tag}: skipped (budget)", file=sys.stderr)
            return None
        try:
            rc, out, err = _run_child(
                [sys.executable, "-c", code],
                timeout=min(timeout, max(_remaining(), 60)))
            if rc == 0 and out.strip():
                return json.loads(out.strip().splitlines()[-1])
            print(f"{tag} attempt {attempt}: {err[-300:]}",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"{tag} attempt {attempt}: {e}", file=sys.stderr)
        if attempt + 1 < attempts and _remaining() > 300:
            time.sleep(240)  # tunnel recovery window
    return None


_PRINTED_HEADLINE = False


def _print_headline(rate: float, cfg: dict, note: str):
    global _PRINTED_HEADLINE
    print(json.dumps({
        "metric": "fm_chain_samples_per_sec_per_chip",
        "value": round(rate),
        "unit": "complex S/s",
        "vs_baseline": round(rate / BASELINE_PER_CHIP, 3),
        "config": dict(cfg, runs_recorded=note),
    }), flush=True)
    _PRINTED_HEADLINE = True


def _save_details(results: dict):
    try:
        with open("bench_details.json", "w") as fh:
            json.dump(results, fh, indent=2, default=float)
    except OSError:
        pass


def main():
    # Watchdog: whatever happens below, this process prints its JSON line
    # and exits 0 before the driver's window closes (rounds 1 and 2 were
    # both killed at rc 124).  subprocess timeouts are parent-enforced so
    # this should never fire — it is the backstop, not the plan.
    def _watchdog(signum, frame):
        for p in list(_LIVE_CHILDREN):  # don't orphan a live TPU client
            try:
                p.kill()
            except OSError:
                pass
        if not _PRINTED_HEADLINE:
            _print_headline(0.0, HEADLINE_CONFIG, "watchdog: budget hit")
        print("bench: watchdog fired — exiting 0", file=sys.stderr)
        os._exit(0)
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(int(_BUDGET + 45))

    # seed the CHAIN-level sections from the committed record so a
    # deadline-trimmed run keeps earlier chain numbers — but only those:
    # kernel rows live solely in bench_kernels.json (round 2 left stale
    # per-kernel copies here that contradicted the fresh matrix file).
    keep = ("fm_chain", "headline", "channelizer", "stages", "waterfall",
            "am_chain", "live_")
    results = {}
    try:
        with open("bench_details.json") as fh:
            results = {k: v for k, v in json.load(fh).items()
                       if k.startswith(keep)}
    except (OSError, ValueError):
        pass
    # mark the seeds: every row still listed in carried_over at the end
    # of the run is a PRIOR-run number a budget trim kept (the r4 judge
    # flagged silently mixed rounds); sections remove their keys as
    # fresh values land.
    carried = set(results)
    results["carried_over"] = sorted(carried)

    def _fresh(*keys):
        carried.difference_update(keys)
        results["carried_over"] = sorted(carried)
    results["run_at_unix"] = int(_T0)
    results["sections_run"] = []
    results["kernel_matrix"] = "see bench_kernels.json (incremental)"
    cfg = HEADLINE_CONFIG

    # 0. prewarm the persistent compile cache (bounded; harmless if warm
    #    — a cache hit makes this a ~60 s no-op)
    if _remaining() > 600:
        _subproc(
            ("import json, bench; bench.prewarm_headline("
             f"{cfg['method']!r}, {cfg['front']!r}, {cfg['block_u8']}, "
             f"{cfg['nblocks']}); print(json.dumps({{}}))"),
            "prewarm", timeout=min(500.0, _remaining() - 420), attempts=1)

    # 1. canonical headline (fresh subprocess).  The JSON line prints as
    #    soon as this lands; everything after is best-effort extras.
    code = ("import json, bench; r, ts = bench.bench_chain_batched("
            f"{cfg['method']!r}, {cfg['front']!r}, {cfg['block_u8']}, "
            f"{cfg['nblocks']}); print(json.dumps({{'rate': r, 'runs': ts}}))")
    first = _subproc(code, "headline_run1",
                     timeout=min(480.0, max(60.0, _remaining() - 90)))
    if first is None:
        _print_headline(0.0, cfg, "headline run failed inside budget; "
                        "see stderr")
        return 0  # exit clean either way; the artifact records the miss
    _fresh("fm_chain_batched", "fm_chain_batched_runs",
           "fm_chain_batched_best")
    results["fm_chain_batched"] = first["rate"]
    results["fm_chain_batched_runs"] = first["runs"]
    results["fm_chain_batched_best"] = first["rate"]
    results["sections_run"].append("headline_run1")
    _print_headline(first["rate"], cfg,
                    "run 1 of up to 2; see bench_details.json")
    _save_details(results)

    # 2. the OTHER judged configs (BASELINE #3 waterfall, #4 AM,
    #    #5 channelizer) run IMMEDIATELY after the first headline window
    #    — r4 burned its whole budget re-proving the headline and never
    #    reached these (VERDICT r4 #1); they are the judged surface, so
    #    they come before every comparison row.  Each gets a hard
    #    per-section cap so no one section can starve the rest.
    for tag, key, code in (
        ("waterfall_1024", "waterfall_1024_hop512",
         "import json, bench; print(json.dumps(bench.bench_waterfall()))"),
        ("am_chain", "am_chain_batched",
         "import json, bench; print(json.dumps(bench.bench_am()))"),
        ("channelizer_64ch", "channelizer_64ch_wideband",
         "import json, bench; print(json.dumps(bench.bench_channelizer()))"),
    ):
        if _remaining() <= 180:
            print(f"bench: budget before {tag}", file=sys.stderr)
            break
        val = _subproc(code, tag, timeout=min(420.0, _remaining() - 60),
                       attempts=1)
        if val is not None:
            _fresh(key)
            results[key] = val
            results["sections_run"].append(tag)
            _save_details(results)

    # 3. per-stage breakdown (roofline input) — one subprocess PER CASE
    #    with a parent-enforced timeout; the r4 run lost this whole
    #    section to a single 492 s in-process timeout.
    deadline = _T0 + _BUDGET - 60
    stage_deadline = min(deadline, time.time() + 600)
    if _remaining() > 180:
        bench_stages_robust("bench_stages.json", deadline=stage_deadline,
                            per_case_s=300.0)
        _fresh("stages")
        results["sections_run"].append("stages")
        results["stages"] = "see bench_stages.json (incremental)"
        _save_details(results)

    # 4. kernel matrix — one subprocess PER CASE (hung remote compiles
    #    are uninterruptible in-process); the dump file accumulates rows
    #    incrementally and is NOT merged here
    if _remaining() > 180:
        ran = bench_kernels_robust("bench_kernels.json", deadline=deadline)
        if ran:
            results["sections_run"].append("kernels")

    # 5. comparison rows, only with leftover budget: a second headline
    #    window (bimodality spread), the other dispatch variant, and the
    #    sequential-stream formulation.
    code2 = ("import json, bench; r, ts = bench.bench_chain_batched("
             f"{cfg['method']!r}, {cfg['front']!r}, {cfg['block_u8']}, "
             f"{cfg['nblocks']}, sample_s=120.0); "
             "print(json.dumps({'rate': r, 'runs': ts}))")
    if _remaining() > 360:
        second = _subproc(code2, "headline_run2",
                          timeout=min(300.0, _remaining() - 60), attempts=1)
        if second is not None:
            _fresh("fm_chain_batched_run2", "fm_chain_batched_run2_runs",
                   "headline_window_spread")
            results["fm_chain_batched_run2"] = second["rate"]
            results["fm_chain_batched_run2_runs"] = second["runs"]
            results["sections_run"].append("headline_run2")
            spread = abs(first["rate"] - second["rate"]) / max(
                first["rate"], second["rate"])
            results["headline_window_spread"] = spread
            results["fm_chain_batched_best"] = max(first["rate"],
                                                   second["rate"])
            print(f"headline windows: {first['rate']/1e9:.1f} / "
                  f"{second['rate']/1e9:.1f} GS/s (spread {spread:.1%})",
                  file=sys.stderr)
            _save_details(results)

    alt = "conv" if cfg["method"] == "auto" else "auto"
    if _remaining() > 300:
        other = _subproc(
            ("import json, bench; r, ts = bench.bench_chain_batched("
             f"{alt!r}, {cfg['front']!r}, {cfg['block_u8']}, "
             f"{cfg['nblocks']}, sample_s=90.0); "
             "print(json.dumps({'rate': r, 'runs': ts}))"),
            f"headline_{alt}", timeout=min(240.0, _remaining() - 60),
            attempts=1)
        if other is not None:
            _fresh(f"fm_chain_batched_{alt}", f"fm_chain_batched_{alt}_runs")
            results[f"fm_chain_batched_{alt}"] = other["rate"]
            results[f"fm_chain_batched_{alt}_runs"] = other["runs"]
            results["sections_run"].append(f"chain_{alt}")
            _save_details(results)

    if _remaining() > 240:
        stream = _subproc(
            "import json, bench; "
            "print(json.dumps(bench.bench_chain_stream()))",
            "fm_chain_stream", timeout=min(240.0, _remaining() - 60),
            attempts=1)
        if stream is not None:
            _fresh("fm_chain_stream")
            results["fm_chain_stream"] = stream
            results["sections_run"].append("stream")
            _save_details(results)

    # 6. the LIVE host-loop path (apps/fm.py --batched basis)
    if _remaining() > 240:
        live = _subproc(
            "import json, bench; print(json.dumps(bench.bench_live()))",
            "live_path", timeout=min(600.0, _remaining() - 60),
            attempts=1)
        if live is not None:
            results.update(live)
            results["sections_run"].append("live")
            _save_details(results)

    for k, v in sorted(results.items()):
        if isinstance(v, (int, float)):
            print(f"{k:28s} {v/1e9:9.3f} GS/s", file=sys.stderr)
    _save_details(results)
    return 0


if __name__ == "__main__":
    sys.exit(main())
