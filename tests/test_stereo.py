"""FM stereo multiplex decoder (stream.StereoDecode).

Synthesizes the standard composite — mono (L+R)/2, 19 kHz pilot,
(L-R)/2 DSB at 38 kHz — decodes it, and checks channel separation plus
the framework's two streaming invariants (blockwise == one-shot,
sharded == streamed).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sdr_tpu.stream import StereoDecode

FS = 160_000.0
F_L, F_R = 1_000.0, 400.0


def make_composite(n, fs=FS):
    t = np.arange(n) / fs
    L = np.sin(2 * np.pi * F_L * t).astype(np.float32)
    R = np.sin(2 * np.pi * F_R * t).astype(np.float32)
    pilot = 0.1 * np.cos(2 * np.pi * 19_000 * t)
    sub = np.cos(2 * np.pi * 38_000 * t)  # = cos(2*theta_pilot)
    comp = 0.5 * (L + R) / 2 + pilot + 0.5 * (L - R) / 2 * sub
    return comp.astype(np.float32), L, R


def tone_power(x, f, fs=FS):
    n = len(x)
    k = int(round(f * n / fs))
    X = np.abs(np.fft.rfft(x * np.hanning(n)))
    return X[max(k - 2, 0): k + 3].max()


def test_stereo_separation():
    n = 1 << 16
    comp, _, _ = make_composite(n)
    op = StereoDecode(FS)
    c = op.init_carry(n, jnp.float32)
    _, y = op.apply(c, jnp.asarray(comp))
    y = np.asarray(y)
    assert y.shape == (2, n)
    Lo, Ro = y[0, 4096:], y[1, 4096:]   # skip warmup
    # the 1 kHz tone lives in L, the 400 Hz tone in R — each must beat
    # its leakage into the other channel by > 20 dB
    assert tone_power(Lo, F_L) > 10 * tone_power(Ro, F_L)
    assert tone_power(Ro, F_R) > 10 * tone_power(Lo, F_R)
    # and each channel keeps its own tone at healthy level vs the other
    assert tone_power(Lo, F_L) > 3 * tone_power(Lo, F_R)
    assert tone_power(Ro, F_R) > 3 * tone_power(Ro, F_L)


def test_stereo_streaming_equals_offline():
    n_blk, blocks = 4096, 6
    comp, _, _ = make_composite(n_blk * blocks)
    op = StereoDecode(FS)
    c = op.init_carry(n_blk, jnp.float32)
    outs = []
    for b in range(blocks):
        c, y = op.apply(c, jnp.asarray(comp[b * n_blk:(b + 1) * n_blk]))
        outs.append(np.asarray(y))
    streamed = np.concatenate(outs, axis=-1)
    c0 = op.init_carry(n_blk * blocks, jnp.float32)
    _, oneshot = op.apply(c0, jnp.asarray(comp))
    np.testing.assert_allclose(streamed, np.asarray(oneshot),
                               atol=1e-5)


def test_stereo_sharded_equals_streamed():
    from sdr_tpu import parallel
    n = 8 * 4096
    comp, _, _ = make_composite(n)
    op = StereoDecode(FS)
    got = parallel.run_time_sharded([op], parallel.time_mesh(8),
                                    jnp.asarray(comp))
    c = op.init_carry(n, jnp.float32)
    _, want = op.apply(c, jnp.asarray(comp))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_stereo_rejects_low_rate():
    with pytest.raises(ValueError, match="too low"):
        StereoDecode(fs=64_000.0)


def test_fm_stereo_end_to_end():
    """Full RF path: FM-modulate a stereo multiplex, demodulate through
    fm_chain(stereo=True), and check L/R separation at 48 kHz."""
    from sdr_tpu.apps.chains import fm_chain
    from sdr_tpu.stream import Pipeline
    fs, n = 1_280_000, 163_840 * 8
    t = np.arange(n) / fs
    L = np.sin(2 * np.pi * F_L * t)
    R = np.sin(2 * np.pi * F_R * t)
    comp = (0.5 * (L + R) / 2 + 0.1 * np.cos(2 * np.pi * 19_000 * t)
            + 0.5 * (L - R) / 2 * np.cos(2 * np.pi * 38_000 * t))
    iq = 0.9 * np.exp(1j * (2 * np.pi * 75e3 * np.cumsum(comp) / fs))
    raw = np.empty(2 * n, np.uint8)
    raw[0::2] = np.clip(np.round(iq.real * 128 + 128), 0, 255)
    raw[1::2] = np.clip(np.round(iq.imag * 128 + 128), 0, 255)
    p = Pipeline(fm_chain(stereo=True), block_in=163_840,
                 in_dtype=jnp.uint8)
    _, y = p.process(raw)
    y = np.asarray(y)
    assert y.shape[0] == 2

    def tp(x, f):
        m = len(x)
        k = int(round(f * m / 48_000))
        X = np.abs(np.fft.rfft(x * np.hanning(m)))
        return X[max(k - 2, 0): k + 3].max()

    Lo, Ro = y[0, 4000:], y[1, 4000:]
    assert tp(Lo, F_L) > 5 * tp(Ro, F_L)
    assert tp(Ro, F_R) > 5 * tp(Lo, F_R)


def test_single_planar_op_sharded_shapes():
    """Regression: an op that ADDS the [2] plane axis must declare it so
    a single-op sharded run assembles [2, N], not [2*shards, n]."""
    from sdr_tpu import parallel
    from sdr_tpu.stream import U8FrontEnd, IqConvertU8
    rng = np.random.default_rng(3)
    raw = jnp.asarray(rng.integers(0, 256, 8 * 4096, dtype=np.uint8))
    taps = rng.uniform(-1, 1, 51).astype(np.float32)
    op = U8FrontEnd(taps, 8)
    got = np.asarray(parallel.run_time_sharded(
        [op], parallel.time_mesh(8), raw))
    c = op.init_carry(8 * 4096, jnp.uint8)
    _, want = op.apply(c, raw)
    np.testing.assert_array_equal(got, np.asarray(want))
    op2 = IqConvertU8(planar=True)
    g2 = np.asarray(parallel.run_time_sharded(
        [op2], parallel.time_mesh(8), raw))
    _, w2 = op2.apply(None, raw)
    np.testing.assert_array_equal(g2, np.asarray(w2))


def make_mono_composite(n, fs=FS, pilot_amp=0.0):
    """Composite with NO stereo content: mono program + optional pilot."""
    t = np.arange(n) / fs
    mono = 0.5 * np.sin(2 * np.pi * F_L * t)
    comp = mono + pilot_amp * np.cos(2 * np.pi * 19_000 * t)
    return comp.astype(np.float32)


def test_pilot_lock_locks_on_pilot():
    """Standard composite (10% pilot) -> locked, stereo decoded."""
    n = 1 << 15
    comp, _, _ = make_composite(n)
    op = StereoDecode(FS)
    (h, lock), y = op.apply(op.init_carry(n, jnp.float32),
                            jnp.asarray(comp))
    assert float(lock) == 1.0
    y = np.asarray(y)
    # stereo: channels differ
    assert np.max(np.abs(y[0, 4096:] - y[1, 4096:])) > 0.01


def test_pilot_lock_mono_fallback_no_pilot():
    """Pilot-free input -> unlocked, difference channel muted (L == R)."""
    n = 1 << 15
    comp = make_mono_composite(n, pilot_amp=0.0)
    op = StereoDecode(FS)
    (h, lock), y = op.apply(op.init_carry(n, jnp.float32),
                            jnp.asarray(comp))
    assert float(lock) == 0.0
    y = np.asarray(y)
    np.testing.assert_array_equal(y[0], y[1])


def test_pilot_lock_weak_pilot_stays_mono():
    """A pilot far below the lock threshold must NOT synthesize a
    confident stereo image (the classic failure mode)."""
    n = 1 << 15
    comp = make_mono_composite(n, pilot_amp=0.005)
    op = StereoDecode(FS)
    (h, lock), y = op.apply(op.init_carry(n, jnp.float32),
                            jnp.asarray(comp))
    assert float(lock) == 0.0
    y = np.asarray(y)
    np.testing.assert_array_equal(y[0], y[1])


def test_pilot_lock_unlock_transition_and_hysteresis():
    """Blockwise: lock on pilot blocks, HOLD through a marginal block
    (hysteresis), unlock on a pilot-free block."""
    nb = 8192
    op = StereoDecode(FS)
    c = op.init_carry(nb, jnp.float32)
    # block 1: strong pilot -> lock
    c, _ = op.apply(c, jnp.asarray(make_composite(nb)[0]))
    assert float(c[1]) == 1.0
    # block 2: marginal pilot (r inside the hysteresis band) -> hold lock
    t = np.arange(nb) / FS
    marginal = (0.5 * np.sin(2 * np.pi * F_L * t)
                + 0.05 * np.cos(2 * np.pi * 19_000 * t)).astype(np.float32)
    r = np.mean((0.05 * np.cos(2 * np.pi * 19_000 * t)) ** 2) / np.mean(
        marginal ** 2)
    assert op.lock_lo < r < op.lock_hi, f"test signal r={r} not marginal"
    c, _ = op.apply(c, jnp.asarray(marginal))
    assert float(c[1]) == 1.0
    # block 3: no pilot -> unlock
    c, y = op.apply(c, jnp.asarray(make_mono_composite(nb)))
    assert float(c[1]) == 0.0
    y = np.asarray(y)
    np.testing.assert_array_equal(y[0], y[1])


def test_pilot_lock_sharded_equals_streamed():
    """The lock recurrence (affine prefix over block decisions) keeps
    sharded == streamed exact across a lock->unlock transition."""
    from sdr_tpu import parallel
    nb, shards = 8192, 8
    comp_a, _, _ = make_composite(nb * 4)
    comp_b = make_mono_composite(nb * 4)
    comp = np.concatenate([comp_a, comp_b])
    op = StereoDecode(FS)
    got = parallel.run_time_sharded([op], parallel.time_mesh(shards),
                                    jnp.asarray(comp))
    c = op.init_carry(nb, jnp.float32)
    outs = []
    for b in range(shards):
        c, y = op.apply(c, jnp.asarray(comp[b * nb:(b + 1) * nb]))
        outs.append(np.asarray(y))
    want = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
