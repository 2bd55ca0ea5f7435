"""Fused back half (ResampleFirScale / kernels/backhalf_pallas.py):
differential equivalence with the three-op tail it replaces, streaming
seams, and sharded==sequential.

The fused op is exact from output Kf-1 of the FIRST block onward: its
first Kf-1 warmup outputs see the true resample of the zero-padded input
where the unfused audio FIR sees literal zero history (see the
ResampleFirScale docstring) — every later block is identical.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from sdr_tpu import parallel
from sdr_tpu.apps.chains import fm_taps
from sdr_tpu.kernels.backhalf_pallas import resample_fir_gain
from sdr_tpu.ops import fir
from sdr_tpu.stream import Fir, Pipeline, ResampleFirScale, Scale


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_kernel_matches_unfused_ops(rng):
    """resample_fir_gain == fir_resample -> fir_filter -> gain at random
    phases and origins (the reference composition resample.c ->
    filter.c -> scale.c)."""
    Kr, I, D, Kf, gain = 31, 3, 10, 64, 0.2
    tr = rng.uniform(-1, 1, Kr).astype(np.float32)
    tf = rng.uniform(-1, 1, Kf).astype(np.float32)
    for n, num, off, start in ((8000, 2000, 0, 0), (6000, 1500, 2, 17),
                               (30000, 8000, 1, 200)):
        x = rng.uniform(-1, 1, n).astype(np.float32)
        y = resample_fir_gain(tr, I, D, tf, gain, x, off, num, start,
                              required=True)
        yr, _ = fir.fir_resample(tr, I, D, x, off, num + Kf - 1,
                                 method="direct", start=start)
        yref = gain * fir.fir_filter(tf, yr, num, method="direct")
        np.testing.assert_allclose(np.asarray(y), np.asarray(yref),
                                   atol=2e-5)


@pytest.mark.parametrize("fused", [False, True])
def test_streaming_matches_three_op_tail(rng, fused):
    """Blockwise ResampleFirScale == [resampler, filter, Scale] pipeline
    (exact from output Kf-1 of block 0; identical on later blocks), in
    both execution modes (unfused winner / fused mega-kernel)."""
    _, ars, afl = fm_taps()
    Kf = afl.shape[0]
    block = 20480                       # *3/10 = 6144 outputs
    x = rng.uniform(-1, 1, (3, block)).astype(np.float32)

    fp = Pipeline([ResampleFirScale(ars, 3, 10, afl, 0.2, fused=fused)],
                  block_in=block, in_dtype=jnp.float32)
    unfused = Pipeline([Fir.resampler(ars, 3, 10), Fir.filter(afl),
                        Scale(0.2)], block_in=block, in_dtype=jnp.float32)
    cf, cu = fp.init(), unfused.init()
    for b in range(3):
        cf, yf = fp.apply(cf, jnp.asarray(x[b]))
        cu, yu = unfused.apply(cu, jnp.asarray(x[b]))
        lo = Kf - 1 if b == 0 else 0
        np.testing.assert_allclose(np.asarray(yf)[lo:],
                                   np.asarray(yu)[lo:], atol=2e-5)


def test_streaming_blockwise_equals_oneshot(rng):
    """Segmented fused runs agree with one big block (seam carry)."""
    _, ars, afl = fm_taps()
    block = 10240
    nblk = 4
    x = rng.uniform(-1, 1, nblk * block).astype(np.float32)
    op = ResampleFirScale(ars, 3, 10, afl, 0.2)

    big = Pipeline([op], block_in=nblk * block, in_dtype=jnp.float32)
    _, y_one = big.process(jnp.asarray(x))
    small = Pipeline([op], block_in=block, in_dtype=jnp.float32)
    c = small.init()
    ys = []
    for b in range(nblk):
        c, y = small.apply(c, jnp.asarray(x[b * block:(b + 1) * block]))
        ys.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(ys), np.asarray(y_one),
                               atol=2e-5)


def test_time_sharded_equals_sequential(rng):
    """8-way time sharding of the fused tail == the sequential run
    (halo = one contiguous input slice, same as Fir)."""
    _, ars, afl = fm_taps()
    mesh8 = parallel.time_mesh(8)
    block = 5120
    x = rng.uniform(-1, 1, (8 * block,)).astype(np.float32)
    chain = [ResampleFirScale(ars, 3, 10, afl, 0.2)]
    ref = Pipeline(chain, block_in=8 * block, in_dtype=jnp.float32)
    _, want = ref.process(jnp.asarray(x))
    got = parallel.run_time_sharded(chain, mesh8, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_fm_chain_fused_tail_matches_unfused(rng):
    """fm_chain(fuse_back=True) == fm_chain(fuse_back=False) from audio
    output Kf-1 on (whole-chain composition, exact front)."""
    from sdr_tpu.apps.chains import fm_chain
    block = 163840
    raw = rng.integers(0, 256, block, dtype=np.uint8)
    pf = Pipeline(fm_chain(method="auto", front="exact", fuse_back=True),
                  block_in=block, in_dtype=jnp.uint8)
    pu = Pipeline(fm_chain(method="auto", front="exact", fuse_back=False),
                  block_in=block, in_dtype=jnp.uint8)
    _, yf = pf.process(jnp.asarray(raw))
    _, yu = pu.process(jnp.asarray(raw))
    np.testing.assert_allclose(np.asarray(yf)[63:], np.asarray(yu)[63:],
                               atol=5e-5)
