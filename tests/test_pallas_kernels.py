"""Pallas kernels vs the portable scan/matmul paths, interpret-mode on CPU.
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


def test_eq_kernel_matches_scan(rng):
    from ntsc_crt_tpu.ops.pallas import filters_pallas as fp
    x = jnp.asarray(rng.randint(-30000, 30000, (R, T), dtype=np.int32))
    mk = lambda v: jnp.full((R,), v, jnp.int32)
    ref = filters.eq_threeband(x, 360, 32684, 65536, 8192, 9175)
    got = fp.eq_threeband_rows(x, mk(360), mk(32684), mk(65536), mk(8192),
                               mk(9175), interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_iir_kernel_matches_scan(rng):
    from ntsc_crt_tpu.ops.pallas import filters_pallas as fp
    x = jnp.asarray(rng.randint(-30000, 30000, (R, T), dtype=np.int32))
    ref = filters.iir_lowpass(x, 500)
    got = fp.iir_lowpass_rows(x, jnp.full((R,), 500, jnp.int32),
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_scanconv_kernel_matches_limb_matmul(rng):
    from ntsc_crt_tpu.ops.pallas import scanconv_pallas as sc
    oy = jnp.asarray(rng.randint(-(1 << 14), 1 << 14, (R, T), dtype=np.int32))
    oi = jnp.asarray(rng.randint(-(1 << 12), 1 << 12, (R, T), dtype=np.int32))
    oq = jnp.asarray(rng.randint(-(1 << 12), 1 << 12, (R, T), dtype=np.int32))
    ct = jnp.full((R,), 180, jnp.int32)
    got = np.asarray(sc.scanconv_rows(oy, oi, oq, ct, outw=OUTW,
                                      interpret=True))
    yv = np.asarray(fastpath.lerp_resample(oy, OUTW, 2))
    iv = np.asarray(fastpath.lerp_resample(oi, OUTW, 14))
    qv = np.asarray(fastpath.lerp_resample(oq, OUTW, 14))
    r = np.clip((((yv + 3879 * iv + 2556 * qv) >> 12) * 180) >> 8, 0, 255)
    g = np.clip((((yv - 1126 * iv - 2605 * qv) >> 12) * 180) >> 8, 0, 255)
    b = np.clip((((yv - 4530 * iv + 7021 * qv) >> 12) * 180) >> 8, 0, 255)
    np.testing.assert_array_equal(got, (r << 16) | (g << 8) | b)


@pytest.mark.parametrize("cc", [4, 5])
def test_encode_fused_matches_unfused(rng, cc):
    import os
    os.environ["NTSC_CRT_FORCE_SCAN"] = "1"
    try:
        from ntsc_crt_tpu.ops.pallas import encode_fused as ef
        fy = jnp.asarray(rng.randint(0, 1021, (R, T), dtype=np.int16))
        fi = jnp.asarray(rng.randint(-700, 700, (R, T), dtype=np.int16))
        fq = jnp.asarray(rng.randint(-600, 600, (R, T), dtype=np.int16))
        modI = jnp.asarray(rng.randint(-32, 33, (R, cc), dtype=np.int32))
        modQ = jnp.asarray(rng.randint(-32, 33, (R, cc), dtype=np.int32))
        gain = jnp.full((R,), 100, jnp.int32)
        base = jnp.full((R,), 7, jnp.int32)
        cY = filters.init_iir(cfg.l_freq, cfg.y_freq)
        cI = filters.init_iir(cfg.l_freq, cfg.i_freq)
        cQ = filters.init_iir(cfg.l_freq, cfg.q_freq)
        got = np.asarray(ef.encode_fused_rows(
            fy, fi, fq, modI, modQ, gain, base,
            coefs=(cY, cI, cQ), xo_mod=0, interpret=True))

        yiq = jnp.stack([jnp.asarray(fy, jnp.int32), jnp.asarray(fi, jnp.int32),
                         jnp.asarray(fq, jnp.int32)], axis=1)
        flt = filters.iir_lowpass(yiq, jnp.asarray([cY, cI, cQ])[None, :])
        vy, vi, vq = [np.asarray(v) for v in (flt[:, 0], flt[:, 1], flt[:, 2])]
        xoff = np.arange(T) % cc
        mi = np.asarray(modI)[:, xoff]
        mq = np.asarray(modQ)[:, xoff]
        ire = 7 + ((vy + ((vi * mi) >> 4) + ((vq * mq) >> 4)) * 100 >> 10)
        np.testing.assert_array_equal(got, np.clip(ire, 0, 110).astype(np.int8))
    finally:
        os.environ.pop("NTSC_CRT_FORCE_SCAN", None)


@pytest.mark.parametrize("lock", ["cold", "locked"])
def test_hsync_chase_kernel_matches_scalar(rng, lock):
    """The in-register hsync chase (ops/pallas/hsync_scan.py) vs a direct
    scalar port of crt_core.c:434-450 with the same carried estimate."""
    from ntsc_crt_tpu.ops.pallas import hsync_scan as hsk
    B, L, H = 9, 21, 300
    W, c0, thresh = 8, 20, -100
    HP = 512
    rows2 = rng.randint(-127, 128, (B, L, HP), dtype=np.int8)
    if lock == "locked":
        hsync0 = np.full(B, 137, np.int32)
    else:
        hsync0 = rng.randint(0, H, B).astype(np.int32)
    act = rng.rand(B, L) > 0.2

    ref = np.zeros((B, L), np.int32)
    for b in range(B):
        hs = int(hsync0[b])
        for l in range(L):
            base = hs + c0
            run, j = 0, 2 * W
            for t in range(2 * W):
                run += int(rows2[b, l, base + t])
                if run <= thresh:
                    j = t
                    break
            if act[b, l]:
                hs = (j - W + hs) % H
            ref[b, l] = hs

    got = hsk.hsync_chase(jnp.asarray(rows2), jnp.asarray(act),
                          jnp.asarray(hsync0), W=W, c0=c0, thresh=thresh,
                          H=H, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_vhs_region_b_kernel_matches_scan(rng):
    """The in-register region-B march (ops/pallas/vhs_scan.py) emits the
    exact entry-state sequence of the lax.scan in _inject_noise_vhs."""
    from jax import lax
    from ntsc_crt_tpu.ops.pallas import vhs_scan
    from ntsc_crt_tpu.ops import lcg

    H, B = 910, 5
    nB = 19 * H
    A1, C1 = lcg.RAND_A, lcg.RAND_B
    A2 = (A1 * A1) & 0xFFFFFFFF
    C2 = (A1 * C1 + C1) & 0xFFFFFFFF
    A3 = (A2 * A1) & 0xFFFFFFFF
    C3 = (A1 * C2 + C1) & 0xFFFFFFFF
    st0 = jnp.asarray(rng.randint(0, 2**32, B, dtype=np.uint64)
                      .astype(np.uint32))
    iB = np.arange(nB, dtype=np.int64)
    tkB = jnp.asarray(((19 * H - 1 - iB) // H + 1).astype(np.uint32))

    def stepB(st, tk):
        st2 = st * np.uint32(A2) + np.uint32(C2)
        st3 = st * np.uint32(A3) + np.uint32(C3)
        m1 = (st2 >> 1) % np.uint32(20)
        return jnp.where(m1 >= tk, st3, st2), st

    _, ref = lax.scan(stepB, st0, tkB)
    got = vhs_scan.vhs_region_b_entries(st0, n_steps=nB, H=H, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("cc", [4, 5])
def test_encode_fused_rgb_mode_matches_host_yiq(rng, cc):
    """rgb=True computes RGB->YIQ in-kernel (crt_ntsc.c:307-310) — must
    equal feeding the host-computed YIQ through the int16 mode."""
    from ntsc_crt_tpu.ops.pallas import encode_fused as ef
    from ntsc_crt_tpu.models.modulate import _rgb_to_yiq
    r8 = jnp.asarray(rng.randint(0, 256, (R, T), dtype=np.uint8))
    g8 = jnp.asarray(rng.randint(0, 256, (R, T), dtype=np.uint8))
    b8 = jnp.asarray(rng.randint(0, 256, (R, T), dtype=np.uint8))
    modI = jnp.asarray(rng.randint(-32, 33, (R, cc), dtype=np.int32))
    modQ = jnp.asarray(rng.randint(-32, 33, (R, cc), dtype=np.int32))
    gain = jnp.full((R,), 100, jnp.int32)
    base = jnp.full((R,), 7, jnp.int32)
    cY = filters.init_iir(cfg.l_freq, cfg.y_freq)
    cI = filters.init_iir(cfg.l_freq, cfg.i_freq)
    cQ = filters.init_iir(cfg.l_freq, cfg.q_freq)
    got = np.asarray(ef.encode_fused_rows(
        r8, g8, b8, modI, modQ, gain, base,
        coefs=(cY, cI, cQ), xo_mod=1, rgb=True, interpret=True))

    pix = jnp.stack([r8, g8, b8], axis=-1).astype(jnp.int32)
    fy, fi, fq = _rgb_to_yiq(pix)
    want = np.asarray(ef.encode_fused_rows(
        fy.astype(jnp.int16), fi.astype(jnp.int16), fq.astype(jnp.int16),
        modI, modQ, gain, base,
        coefs=(cY, cI, cQ), xo_mod=1, interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ratio", [1, 2, 3])
@pytest.mark.parametrize("blend", [0, 1])
def test_place_rows_kernel_matches_stacked(rng, ratio, blend):
    """The Pallas placement kernel (interpret) is bit-identical to the XLA
    stacked form of _place_rows_uniform across repeat factors, blend,
    scanline gaps, and mixed field bits (docs/PERF.md 'row placement')."""
    import os
    from ntsc_crt_tpu.ops.pallas import place_rows as pr

    B, L, w = 4, 6, 9
    outh = ratio * L
    fp = ratio // 2
    field_px = jnp.asarray(np.array([0, 1, 0, 1], np.int32) * fp)
    for scanlines in range(ratio):
        rgb = jnp.asarray(
            rng.randint(0, 256, (B, L, w, 3), np.int32))
        old = jnp.asarray(
            rng.randint(0, 256, (B, outh, w, 3), np.uint8))
        os.environ["NTSC_CRT_FORCE_SCAN"] = "1"  # XLA stacked reference
        try:
            ref = dem._place_rows_uniform(cfg, rgb, old, field_px, blend,
                                          scanlines, outh, ratio)
        finally:
            os.environ.pop("NTSC_CRT_FORCE_SCAN", None)
        got = pr.place_rows_uniform(
            jnp.asarray(rgb, jnp.uint8), old, field_px, blend=blend,
            scanlines=scanlines, ratio=ratio, fp=fp, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                      err_msg=f"sl={scanlines}")
        for tl in (0, 2, 3, 6):  # 0 = grid (B,) stacked store; 6 = one tile
            got2 = pr.place_rows_uniform_tiled(
                jnp.asarray(rgb, jnp.uint8), old, field_px, blend=blend,
                scanlines=scanlines, ratio=ratio, fp=fp, tile_rows=tl,
                interpret=True)
            np.testing.assert_array_equal(
                np.asarray(got2), np.asarray(ref),
                err_msg=f"tiled sl={scanlines} tl={tl}")


@pytest.mark.parametrize("VP,CC,m,B,L",
                         [(3, 4, 5, 7, 33),     # NTSC-shaped, odd batch
                          (1, 4, 5, 9, 26),     # VP=1 (NES/PV1K-style)
                          (5, 8, 4, 17, 30),    # wide-CC stress
                          (3, 4, 5, 1, 40)])    # batch-1 (live regime)
def test_ccf_kernel_matches_scan(rng, VP, CC, m, B, L):
    """The in-register ccf EMA chain (ops/pallas/ccf_scan.py) must emit the
    exact per-line ccr sequence and final state of the lax.scan formulation
    in demodulate._line_scan (crt_core.c:452-466 semantics)."""
    from jax import lax
    from ntsc_crt_tpu.ops.pallas import ccf_scan
    from ntsc_crt_tpu.ops.fixedpoint import cdiv

    per = jnp.asarray(rng.randint(-(1 << 20), 1 << 20, (B, L, m, CC),
                                  dtype=np.int32))
    vper = jnp.asarray(rng.randint(0, VP, (B, L), dtype=np.int32))
    act = jnp.asarray(rng.randint(0, 2, (B, L)).astype(bool))
    ccf0 = jnp.asarray(rng.randint(-(1 << 20), 1 << 20, (B, VP, CC),
                                   dtype=np.int32))

    vp_oh_l = vper[..., None] == jnp.arange(VP, dtype=jnp.int32)

    def cstep(ccf, xs):
        pc, row_oh, a = xs
        ccr = jnp.sum(jnp.where(row_oh[:, :, None], ccf, 0), axis=1)
        ccr_new = ccr
        for mm in range(m):
            ccr_new = cdiv(ccr_new * 127, 128) + pc[:, mm]
        ccr = jnp.where(a[:, None], ccr_new, ccr)
        ccf = jnp.where(row_oh[:, :, None], ccr[:, None, :], ccf)
        return ccf, ccr

    f_ref, r_seq = lax.scan(
        cstep, ccf0, (jnp.swapaxes(per, 0, 1), jnp.swapaxes(vp_oh_l, 0, 1),
                      jnp.swapaxes(act, 0, 1)))
    r_ref = jnp.swapaxes(r_seq, 0, 1)
    f_k, r_k = ccf_scan.ccf_ema(per, vper, act, ccf0, interpret=True)
    np.testing.assert_array_equal(np.asarray(f_k), np.asarray(f_ref))
    np.testing.assert_array_equal(np.asarray(r_k), np.asarray(r_ref))


@pytest.mark.parametrize("cc", [4, 5])
@pytest.mark.parametrize("w_in,destw", [(40, 64), (64, 24)])  # up / down
def test_encode_fused_col_map_matches_wide(rng, cc, w_in, destw):
    """The in-kernel nearest-neighbor column resample (col_map static VMEM
    indexing, crt_ntsc.c:296-305) is bit-identical to host-gathering the
    wide planes and running the kernel without a map.  Tiny geometry: the
    col_map kernel python-unrolls all T samples, so interpret-mode cost
    scales with destw (production interpret dispatches keep the wide path —
    modulate._planes_for_kernel)."""
    from ntsc_crt_tpu.ops.pallas import encode_fused as ef
    Rs = 16
    r8 = jnp.asarray(rng.randint(0, 256, (Rs, w_in), dtype=np.uint8))
    g8 = jnp.asarray(rng.randint(0, 256, (Rs, w_in), dtype=np.uint8))
    b8 = jnp.asarray(rng.randint(0, 256, (Rs, w_in), dtype=np.uint8))
    modI = jnp.asarray(rng.randint(-32, 33, (Rs, cc), dtype=np.int32))
    modQ = jnp.asarray(rng.randint(-32, 33, (Rs, cc), dtype=np.int32))
    gain = jnp.full((Rs,), 100, jnp.int32)
    base = jnp.full((Rs,), 7, jnp.int32)
    cY = filters.init_iir(cfg.l_freq, cfg.y_freq)
    cI = filters.init_iir(cfg.l_freq, cfg.i_freq)
    cQ = filters.init_iir(cfg.l_freq, cfg.q_freq)
    cmap = tuple(int(v) for v in
                 (np.arange(destw, dtype=np.int64) * w_in) // destw)
    got = np.asarray(ef.encode_fused_rows(
        r8, g8, b8, modI, modQ, gain, base,
        coefs=(cY, cI, cQ), xo_mod=1, rgb=True, interpret=True,
        col_map=cmap))
    wide = [p[:, np.asarray(cmap)] for p in (r8, g8, b8)]
    want = np.asarray(ef.encode_fused_rows(
        *wide, modI, modQ, gain, base,
        coefs=(cY, cI, cQ), xo_mod=1, rgb=True, interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("B", [9, 128, 256])
def test_hsync_chase_direct_prep_matches_wordpack(rng, B):
    """direct_t=True (the big-batch default: plain transpose off the
    batch-minor rows2 copy + s8 sample-granularity kernel) is bit-identical
    to the word-packed prep across batch paddings (B=9 pads lanes, 128 pads
    sublanes to the s8 multiple-of-4 tile, 256 pads 2->4 sublanes)."""
    from ntsc_crt_tpu.ops.pallas import hsync_scan as hsk
    L, H, HP = 21, 300, 512
    rows2 = jnp.asarray(rng.randint(-127, 128, (B, L, HP), dtype=np.int8))
    act = jnp.asarray(rng.rand(B, L) > 0.2)
    h0 = jnp.asarray(rng.randint(0, H, B).astype(np.int32))
    kw = dict(W=8, c0=20, thresh=-100, H=H, interpret=True)
    a = np.asarray(hsk.hsync_chase(rows2, act, h0, **kw))
    b = np.asarray(hsk.hsync_chase(rows2, act, h0, direct_t=True, **kw))
    np.testing.assert_array_equal(a, b)
