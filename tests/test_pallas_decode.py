"""Fused decode kernel vs the portable stages, interpret-mode on CPU.

Split from test_pallas_kernels.py: the decode_fused interpret runs are the
single heaviest block of the fast tier, and the xdist loadfile scheduler
assigns whole files to workers — two files halve the critical path.
Small shapes keep the interpreter tractable; equality must be exact."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ntsc_crt_tpu.ops import filters, fastpath
from ntsc_crt_tpu.models import demodulate as dem
from ntsc_crt_tpu.models.systems import NTSC as cfg

R, T, OUTW = 160, 256, 200


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


@pytest.mark.parametrize("cc,MS,pair,smode",
                         [(4, 37, False, "random"), (5, 37, False, "random"),
                          (4, 700, False, "random"), (4, 700, True, "random"),
                          (5, 300, True, "random"), (4, 700, True, "locked"),
                          (4, 700, True, "split")])
def test_decode_fused_matches_unfused(rng, cc, MS, pair, smode):
    """The kernel consumes UNALIGNED rows + per-row shifts (the in-kernel
    alignment funnel replaces the XLA shift_rows pass); the reference path
    aligns on the host first and runs the portable stages.  MS=37 exercises
    the funnel alone; MS=700 additionally exercises the lane-aligned
    coarse pre-level (max_shift >= 2*COARSE); pair=True feeds the signal
    as two row planes (the decoder's line-l / line-l+1 split) so the
    in-VMEM concatenation + full-depth funnel path is covered.

    smode pins the residual-gated funnel's edges: "locked" = every row at
    the same nonzero shift (the steady-state hsync lock — rmax == 0, every
    gated pass skipped, only the rebase copy runs); "split" = rows jump
    between 0 and MS (max in-block spread — every pass live)."""
    from ntsc_crt_tpu.ops.pallas import decode_fused as df
    ext = rng.randint(-127, 128, (R, T + MS), dtype=np.int8)
    if smode == "locked":
        shifts = np.full(R, MS - 3, np.int32)
    elif smode == "split":
        shifts = np.where(np.arange(R) % 2 == 0, 0, MS).astype(np.int32)
    else:
        shifts = rng.randint(0, MS + 1, R).astype(np.int32)
    sig = jnp.asarray(
        np.stack([ext[r, s:s + T] for r, s in enumerate(shifts)]))
    wave = jnp.asarray(rng.randint(-60000, 60000, (R, cc), dtype=np.int32))
    if cc == 4:
        waveI, waveQ = wave, jnp.roll(wave, -3, axis=-1)
    else:
        waveI = wave
        waveQ = jnp.asarray(
            rng.randint(-60000, 60000, (R, cc), dtype=np.int32))
    bright = jnp.asarray(rng.randint(-20, 20, (R,), dtype=np.int32))
    ct = jnp.full((R,), 180, jnp.int32)
    eqY, eqI, eqQ = dem._eq_coefs(cfg)
    if pair:
        # uneven split: plane A narrower than the funnel extent
        W1 = (T + MS) // 2 + 17
        extA, extB = ext[:, :W1], ext[:, W1:]
    else:
        extA, extB = ext, None
    r8, g8, b8 = df.decode_fused_rows(
        jnp.asarray(extA), jnp.asarray(shifts), waveI, waveQ, bright, ct,
        ext_hi=None if extB is None else jnp.asarray(extB),
        outw=OUTW, av_len=T, max_shift=MS,
        coefs=(tuple(eqY), tuple(eqI), tuple(eqQ)), interpret=True)
    got = (np.asarray(r8).astype(np.int64) << 16) \
        | (np.asarray(g8).astype(np.int64) << 8) | np.asarray(b8)

    sig32 = jnp.asarray(sig, jnp.int32)
    wv_i = fastpath.tile_period(waveI, T, 0)
    wv_q = fastpath.tile_period(waveQ, T, 0) if cc == 5 else \
        fastpath.tile_period(wave, T, 3)
    stacked = jnp.stack([sig32 + bright[:, None], (sig32 * wv_i) >> 9,
                         (sig32 * wv_q) >> 9], axis=1)
    mk = lambda *v: jnp.asarray(v, jnp.int32)[None, :]
    e = filters.eq_threeband(
        stacked, mk(eqY.lf, eqI.lf, eqQ.lf), mk(eqY.hf, eqI.hf, eqQ.hf),
        mk(eqY.g_lo, eqI.g_lo, eqQ.g_lo), mk(eqY.g_mid, eqI.g_mid, eqQ.g_mid),
        mk(eqY.g_hi, eqI.g_hi, eqQ.g_hi))
    oy, oi, oq = e[:, 0] << 4, e[:, 1] >> 3, e[:, 2] >> 3
    yv = np.asarray(fastpath.lerp_resample(oy, OUTW, 2))
    iv = np.asarray(fastpath.lerp_resample(oi, OUTW, 14))
    qv = np.asarray(fastpath.lerp_resample(oq, OUTW, 14))
    r = np.clip((((yv + 3879 * iv + 2556 * qv) >> 12) * 180) >> 8, 0, 255)
    g = np.clip((((yv - 1126 * iv - 2605 * qv) >> 12) * 180) >> 8, 0, 255)
    b = np.clip((((yv - 4530 * iv + 7021 * qv) >> 12) * 180) >> 8, 0, 255)
    np.testing.assert_array_equal(got, (r << 16) | (g << 8) | b)


@pytest.mark.parametrize("taps", [7, 6, 5, 4])
def test_decode_fused_conv_eq_matches_portable(rng, taps):
    """The fused kernel's FIR mode (coefs=("conv", taps)) vs the portable
    eq_convolution path — same alignment, EQ, lerp, pack (VERDICT r3 #5:
    conv-EQ gets the full fused TPU path)."""
    from ntsc_crt_tpu.ops.pallas import decode_fused as df
    MS = 37
    ext = rng.randint(-127, 128, (R, T + MS), dtype=np.int8)
    shifts = rng.randint(0, MS + 1, R).astype(np.int32)
    sig = jnp.asarray(
        np.stack([ext[r, s:s + T] for r, s in enumerate(shifts)]))
    wave = jnp.asarray(rng.randint(-60000, 60000, (R, 4), dtype=np.int32))
    waveI, waveQ = wave, jnp.roll(wave, -3, axis=-1)
    bright = jnp.asarray(rng.randint(-20, 20, (R,), dtype=np.int32))
    ct = jnp.full((R,), 180, jnp.int32)
    r8, g8, b8 = df.decode_fused_rows(
        jnp.asarray(ext), jnp.asarray(shifts), waveI, waveQ, bright, ct,
        outw=OUTW, av_len=T, max_shift=MS,
        coefs=("conv", taps), interpret=True)
    got = (np.asarray(r8).astype(np.int64) << 16) \
        | (np.asarray(g8).astype(np.int64) << 8) | np.asarray(b8)

    sig32 = jnp.asarray(sig, jnp.int32)
    wv_i = fastpath.tile_period(waveI, T, 0)
    wv_q = fastpath.tile_period(wave, T, 3)
    stacked = jnp.stack([sig32 + bright[:, None], (sig32 * wv_i) >> 9,
                         (sig32 * wv_q) >> 9], axis=1)
    e = filters.eq_convolution(stacked, taps)
    oy, oi, oq = e[:, 0] << 4, e[:, 1] >> 3, e[:, 2] >> 3
    yv = np.asarray(fastpath.lerp_resample(oy, OUTW, 2))
    iv = np.asarray(fastpath.lerp_resample(oi, OUTW, 14))
    qv = np.asarray(fastpath.lerp_resample(oq, OUTW, 14))
    r = np.clip((((yv + 3879 * iv + 2556 * qv) >> 12) * 180) >> 8, 0, 255)
    g = np.clip((((yv - 1126 * iv - 2605 * qv) >> 12) * 180) >> 8, 0, 255)
    b = np.clip((((yv - 4530 * iv + 7021 * qv) >> 12) * 180) >> 8, 0, 255)
    np.testing.assert_array_equal(got, (r << 16) | (g << 8) | b)


