"""Optional decode modes: beam-energy bloom (CRT_DO_BLOOM) and the
convolution-EQ builds — behavioral invariants and a scalar-port check of the
line-width chain.  Bit-exact parity against patched-define oracle builds
lives in test_variants_parity.py."""

import numpy as np
import jax
import jax.numpy as jnp

from ntsc_crt_tpu.models.systems import NTSC
from ntsc_crt_tpu.models import pipeline


def _img(seed=0, w=96, h=72):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)


def test_bloom_scalar_chain():
    """prev_e/line_w recurrence vs a direct scalar port."""
    from ntsc_crt_tpu.models import demodulate as dem
    rng = np.random.RandomState(0)
    AV = NTSC.av_len
    sums = rng.randint(-128 * AV, 128 * AV, 240)
    noise = 24
    max_e = (128 + noise // 2) * AV
    prev_e = 16384 // 8
    ref = []
    for s in sums:
        def tdiv(a, b):
            q = abs(a) // abs(b)
            return -q if (a < 0) != (b < 0) else q
        prev_e = tdiv(prev_e * 123, 128) + tdiv(((max_e >> 1) - int(s)) << 10, max_e)
        ref.append(AV * 112 // 128 + (prev_e >> 9))
    del dem
    # run the same chain through the jax ops used in demodulate_core
    from ntsc_crt_tpu.ops.fixedpoint import cdiv
    pe = jnp.full((1,), 16384 // 8, jnp.int32)
    me = jnp.full((1,), max_e, jnp.int32)
    got = []
    for s in sums:
        pe = cdiv(pe * 123, 128) + cdiv(((me >> 1) - int(s)) << 10, me)
        got.append(int(AV * 112 // 128 + (pe[0] >> 9)))
    assert got == ref


def test_bloom_black_borders():
    """Bloom narrows drawn lines: side borders keep the initial (black)
    output, while the non-bloom decode fills the full width."""
    img = np.full((72, 96, 3), 255, np.uint8)
    st0 = pipeline.crt_init(NTSC, 320, 240)
    st_b = pipeline.modulate(NTSC, st0, jnp.asarray(img), field=0, frame=0,
                             do_bloom=True)
    st_b = pipeline.demodulate(NTSC, st_b, noise=0, do_bloom=True)
    out_b = np.asarray(st_b.out)

    st_n = pipeline.step(NTSC, st0, jnp.asarray(img), field=0, frame=0)
    out_n = np.asarray(st_n.out)

    # bloom shrinks the encoded active area (destw 638 vs 753) and the
    # beam-energy stretch samples a narrower centered window: the right
    # edge goes dark while the center stays lit, and the image differs
    # substantially from the non-bloom decode
    assert int(out_b[120, -3].sum()) < 80    # right edge dark
    assert int(out_b[120, 160].sum()) > 600  # center lit
    assert int(out_n[120, 160].sum()) > 600
    assert (out_b != out_n).mean() > 0.02


def test_conv_eq_modes_run():
    img = _img()
    st = pipeline.crt_init(NTSC, 160, 120)
    st = pipeline.modulate(NTSC, st, jnp.asarray(img), field=0, frame=0)
    outs = []
    for mode in ("threeband", "conv7", "conv6", "conv5", "conv4"):
        o = pipeline.demodulate(NTSC, st, noise=0, eq_mode=mode)
        outs.append(np.asarray(o.out))
    # all modes produce a picture; conv modes differ from threeband
    for o in outs:
        assert o.mean() > 5
    assert (outs[0] != outs[1]).mean() > 0.05


def test_nes_border():
    """NES_BORDER (crt_nes.c:138-161): the PPU border region outside the
    256-px active area gets square-wave content; default build leaves the
    skeleton blank there."""
    from ntsc_crt_tpu.models.systems import NES
    rng = np.random.RandomState(0)
    ppu = rng.randint(0, 64, (240, 256), np.uint16)
    st = pipeline.crt_init(NES, 160, 120)
    off = pipeline.modulate(NES, st, jnp.asarray(ppu), hue=0)
    on = pipeline.modulate(NES, st, jnp.asarray(ppu), hue=0,
                           border_color=0x22, draw_border=True)
    a_off = np.asarray(off.analog)
    a_on = np.asarray(on.analog)
    # border columns (right of the active area) differ; active area matches
    xo = (NES.av_beg) & ~3
    assert (a_on[:, 900:909] != a_off[:, 900:909]).any()
    np.testing.assert_array_equal(a_on[16:250, xo:xo + 100],
                                  a_off[16:250, xo:xo + 100])


def _bloom_fused_vs_portable(cfg, outw, outh, monkeypatch, noise=7, seed=3):
    """Fused (decode_fused bloom mode, interpret) == portable bloom path."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (72, 96, 3), np.uint8)
    st0 = pipeline.crt_init(cfg, outw, outh)
    st = pipeline.modulate(cfg, st0, jnp.asarray(img), field=0, frame=0,
                           do_bloom=True)
    monkeypatch.setenv("NTSC_CRT_FORCE_SCAN", "1")
    a = pipeline.demodulate(cfg, st, noise=noise, do_bloom=True)
    monkeypatch.delenv("NTSC_CRT_FORCE_SCAN")
    monkeypatch.setenv("NTSC_CRT_FORCE_PALLAS", "1")
    b = pipeline.demodulate(cfg, st, noise=noise, do_bloom=True)
    monkeypatch.delenv("NTSC_CRT_FORCE_PALLAS")
    np.testing.assert_array_equal(np.asarray(a.out), np.asarray(b.out))
    np.testing.assert_array_equal(np.asarray(a.hsync), np.asarray(b.hsync))
    np.testing.assert_array_equal(np.asarray(a.ccf), np.asarray(b.ccf))


import pytest


@pytest.mark.slow
def test_bloom_fused_matches_portable_ntsc(monkeypatch):
    """The per-row dynamic scan conversion in decode_fused (bloom mode) is
    bit-exact vs the portable take_along_axis path; transitively vs the
    CRT_DO_BLOOM oracle build (test_variants_parity).  (Interpret-mode
    compile of the dynamic pixel loops is minutes — slow tier; the fast
    tier covers the kernel directly in test_bloom_kernel_*.)"""
    _bloom_fused_vs_portable(NTSC, 64, 48, monkeypatch)


@pytest.mark.slow
def test_bloom_fused_matches_portable_pv1k_big(monkeypatch):
    """5-sample system + production-ish geometry through the fused bloom
    kernel (interpret): exercises the K=40 chunking and the wider Lidx
    range of PV1K's 1487-sample lines."""
    from ntsc_crt_tpu.models.systems import PV1K
    _bloom_fused_vs_portable(PV1K, 320, 240, monkeypatch)


def _bloom_kernel_inputs(R=8, E=128, cc=4, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        ext=jnp.asarray(rng.randint(-100, 100, (R, E), np.int8)),
        ehi=jnp.asarray(rng.randint(-100, 100, (R, E), np.int8)),
        sh=jnp.asarray(rng.randint(0, 8, (R,), np.int32)),
        wv=jnp.asarray(rng.randint(-500, 500, (R, cc), np.int32)),
        wq=jnp.asarray(rng.randint(-500, 500, (R, cc), np.int32)),
        br=jnp.asarray(rng.randint(-10, 10, (R,), np.int32)),
        ct=jnp.full((R,), 180, jnp.int32))


_COEFS3 = ((16384, 32768, 65536, 8192, 9175),) * 3


def test_bloom_kernel_uniform_dx_matches_static():
    """decode_fused bloom mode with uniform dx == the static-smap path
    (excluding the last 2 px, which read the reference's never-written
    out[AV-1] slot that bloom forces to zero)."""
    from ntsc_crt_tpu.ops.pallas.decode_fused import decode_fused_rows
    kw = _bloom_kernel_inputs()
    av, outw = 64, 16
    args = (kw["ext"], kw["sh"], kw["wv"], kw["wq"], kw["br"], kw["ct"])
    com = dict(outw=outw, av_len=av, max_shift=15, coefs=_COEFS3,
               interpret=True, ext_hi=kw["ehi"])
    a = decode_fused_rows(*args, **com)
    R = kw["ext"].shape[0]
    b = decode_fused_rows(
        *args, **com,
        bloom_dx=jnp.full((R,), ((av - 1) << 12) // outw, jnp.int32),
        bloom_lidx=jnp.zeros((R,), jnp.int32))
    for pa, pb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(pa)[:, :outw - 2],
                                      np.asarray(pb)[:, :outw - 2])


def test_bloom_kernel_per_row_dx_matches_single_row():
    """Per-row dynamic dx/lidx: each row of a mixed-dx batch equals the
    same row run alone (where the block extrema collapse to its own dx) —
    pins the candidate-range walk against per-row interference."""
    from ntsc_crt_tpu.ops.pallas.decode_fused import decode_fused_rows
    kw = _bloom_kernel_inputs(seed=2)
    av, outw = 64, 16
    rng = np.random.RandomState(5)
    R = kw["ext"].shape[0]
    dx = jnp.asarray(3000 + rng.randint(0, 2600, (R,)), jnp.int32)
    li = jnp.asarray(rng.randint(0, 6, (R,)), jnp.int32)
    com = dict(outw=outw, av_len=av, max_shift=21, coefs=_COEFS3,
               interpret=True)
    full = decode_fused_rows(kw["ext"], kw["sh"] + li, kw["wv"], kw["wq"],
                             kw["br"], kw["ct"], ext_hi=kw["ehi"],
                             bloom_dx=dx, bloom_lidx=li, **com)
    for r in range(R):
        one = decode_fused_rows(
            kw["ext"][r:r + 1], kw["sh"][r:r + 1] + li[r:r + 1],
            kw["wv"][r:r + 1], kw["wq"][r:r + 1], kw["br"][r:r + 1],
            kw["ct"][r:r + 1], ext_hi=kw["ehi"][r:r + 1],
            bloom_dx=dx[r:r + 1], bloom_lidx=li[r:r + 1], **com)
        for pf, po in zip(full, one):
            np.testing.assert_array_equal(np.asarray(pf)[r],
                                          np.asarray(po)[0])
