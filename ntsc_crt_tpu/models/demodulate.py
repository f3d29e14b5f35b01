"""Demodulator: sampled analog composite signal -> RGB, like a CRT would.

System-generic, like the reference's crt_demodulate (crt_core.c:291-666).
The TPU-native decomposition replaces the reference's data-dependent control
flow with masked tensor reductions while keeping bit-exact integer results:

1. **Noise injection** — the reference's serial LCG becomes one closed-form
   parallel pass (ops/lcg.py).
2. **VSYNC recovery** — the goto-on-threshold scan (crt_core.c:379-397)
   becomes a cumulative sum over the candidate window plus a
   first-below-threshold argmax, reproducing the same tie-breaking
   (first line, then first sample; fall-through keeps the last candidate and
   j == HRES so the odd-field test still matches).
3. **Per-line sequential state** (hsync estimate chained line to line,
   color-carrier convergence EMA `ccf`) — a cheap `lax.scan` over the ~240
   active lines; each step is a 16-sample window reduction and a 10-step
   integer EMA on cc_samples lanes.  The heavy per-sample work is hoisted out.
4. **YIQ extraction + 3-band EQ** — x-serial, line-parallel (ops/filters.py).
5. **Scan conversion** — fixed-point lerp, YIQ->RGB int matrix, blend and
   scanline duplication as a pure gather/select over output rows ("last
   writer wins" resolves the reference's sequential row writes exactly
   whenever output height >= active lines; see _place_rows).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ntsc_crt_tpu.models.systems import SystemConfig
from ntsc_crt_tpu.ops import fastpath, filters, lcg
from ntsc_crt_tpu.ops.fixedpoint import cdiv, i32, posmod, crem, sincos14


class MonitorParams(NamedTuple):
    """Runtime monitor knobs (struct CRT fields, crt_core.h:82-86)."""
    hue: jax.Array = np.int32(0)
    brightness: jax.Array = np.int32(0)
    contrast: jax.Array = np.int32(180)
    saturation: jax.Array = np.int32(10)
    black_point: jax.Array = np.int32(0)
    white_point: jax.Array = np.int32(100)
    blend: jax.Array = np.int32(0)
    scanlines: jax.Array = np.int32(0)


def _eq_coefs(cfg: SystemConfig):
    """crt_init's per-cc_samples EQ setup (crt_core.c:277-287)."""
    k = cfg.khz2l
    if cfg.cc_samples == 4:
        y = filters.init_eq(k(1500), k(3000), cfg.hres, 65536, 8192, 9175)
    elif cfg.cc_samples == 5:
        y = filters.init_eq(k(1500), k(3000), cfg.hres, 65536, 12192, 7775)
    else:
        raise ValueError("cc_samples must be 4 or 5")
    i = filters.init_eq(k(80), k(1150), cfg.hres, 65536, 65536, 1311)
    q = filters.init_eq(k(80), k(1000), cfg.hres, 65536, 65536, 0)
    return y, i, q


def _inject_noise(cfg: SystemConfig, analog_flat, rn, noise):
    """crt_core.c:346-367 (plain path; VHS tracking noise handled in
    _inject_noise_vhs)."""
    byte, rn_out = lcg.noise_bytes(rn, cfg.input_size)
    s = analog_flat + ((byte * i32(noise)) >> 8)
    return jnp.clip(s, -127, 127), rn_out


def _inject_noise_vhs(cfg: SystemConfig, analog_flat, randstate, noise):
    """VHS tracking-noise variant (crt_core.c:343-366 under CRT_VHS_NOISE):
    a sinusoidal noise band wobbles over the last ~16 lines, driven by the
    spec'd crt_rand (see ops/lcg.py).

    The rand() call count per sample is data-dependent (the band's lower-edge
    rand() only fires when the upper-edge test passes, via C's && short
    circuit).  The band tests can only pass for samples in the last 25 lines,
    so the stream is split: a closed-form parallel prefix (exactly 2 calls
    per sample) covering ~95% of the field, and a short lax.scan tail
    carrying the rand state.  Returns (inp, randstate', rn' = last rand value
    — crt_core.c:359,367 stores the last rand VALUE in v->rn).
    """
    N = cfg.input_size
    H = cfg.hres
    noise = i32(noise)

    # call 0: band center line (crt_core.c:344)
    head, st1 = lcg.crt_rand_stream(randstate, 1)
    band_line = (crem(head[0], 8) - 4) + 14

    n0 = N - 25 * H + 1          # samples 0..n0-1 cannot hit the band test
    # region A: calls 1..2*n0 after the head call; sample i uses calls
    # (2i+1, 2i+2) of the post-head stream
    streamA = lcg.lcg_stream(st1, 2 * n0, lcg.RAND_A, lcg.RAND_B)
    rnA = lcg.crt_rand_out(streamA[0::2])                       # (n0,)
    sA = analog_flat[:n0] + ((((rnA >> 16) & 0xFF) - 0x7F) * noise >> 8)
    stA = jax.lax.bitcast_convert_type(streamA[-1], jnp.int32)

    # region B: sequential scan over the last 25 lines
    idxB = jnp.arange(n0, N, dtype=jnp.int32)

    def stepB(carry, i):
        st = carry
        st = lcg.crt_rand_step(st)
        rn = lcg.crt_rand_out(jax.lax.bitcast_convert_type(st, jnp.uint32))
        st = lcg.crt_rand_step(st)
        rB = lcg.crt_rand_out(jax.lax.bitcast_convert_type(st, jnp.uint32))
        cond1 = i > (N - H * (16 + (crem(rB, 20) - 10)))
        st3 = lcg.crt_rand_step(st)
        rC = lcg.crt_rand_out(jax.lax.bitcast_convert_type(st3, jnp.uint32))
        st = jnp.where(cond1, st3, st)          # short-circuit &&
        cond2 = i < (N - H * (5 + (crem(rC, 8) - 4)))
        in_band = cond1 & cond2
        ln = cdiv(i * band_line, H)
        _, cs = sincos14(cdiv(ln * 8192, 180))
        nn = jnp.where(in_band, cs >> 8, noise)
        s = jnp.take(analog_flat, i) + ((((rn >> 16) & 0xFF) - 0x7F) * nn >> 8)
        return st, (s, rn)

    st_final, (sB, rnB) = jax.lax.scan(stepB, stA, idxB)
    s = jnp.concatenate([sA, sB])
    return jnp.clip(s, -127, 127), st_final, rnB[-1]


def _find_vsync(cfg: SystemConfig, inp, vsync):
    """First (line, sample) where the integrated signal crosses the vsync
    threshold (crt_core.c:369-397).  inp: int32 (VRES, HRES)."""
    W = cfg.vsync_window
    cand = posmod(vsync + jnp.arange(-W, W, dtype=jnp.int32), cfg.vres)
    rows = jnp.take(inp, cand, axis=0)                        # (2W, HRES)
    cum = jnp.cumsum(rows, axis=1)
    hit = cum <= cfg.vsync_thresh * cfg.sync_level
    any_hit = jnp.any(hit, axis=1)
    first_j = jnp.argmax(hit, axis=1)
    row = jnp.argmax(any_hit)                                  # first hitting line
    exists = jnp.any(any_hit)
    line = jnp.where(exists, cand[row], cand[2 * W - 1])
    j = jnp.where(exists, first_j[row], cfg.hres)              # loop fall-through
    field = (j > cfg.hres // 2).astype(jnp.int32)
    return line.astype(jnp.int32), field


def _line_scan(cfg: SystemConfig, inp_flat, hsync0, ccf0, vsync, hue_sn, hue_cs,
               saturation, outh, v_fac, field_px):
    """Sequential per-line pass: hsync chase, ccf EMA, decode-wave derivation.

    Returns per-line (pos, wave/waveIQ, beg, end, active) stacked over the
    active region lines.  crt_core.c:409-536.
    """
    CC = cfg.cc_samples
    lines = jnp.arange(cfg.top, cfg.bot, dtype=jnp.int32)
    n_total = cfg.input_size

    def step(carry, line):
        hsync, ccf = carry
        beg = cdiv((line - cfg.top) * (outh + v_fac), cfg.lines) + field_px
        end = cdiv((line - cfg.top + 1) * (outh + v_fac), cfg.lines) + field_px
        active = beg < outh  # 'continue' guard (crt_core.c:431)

        ln = posmod(line + vsync, cfg.vres) * cfg.hres

        # hsync search over a 2W window (crt_core.c:434-450)
        W = cfg.hsync_window
        widx = ln + hsync + cfg.sync_beg + jnp.arange(-W, W, dtype=jnp.int32)
        wvals = jnp.take(inp_flat, posmod(widx, n_total))
        cum = jnp.cumsum(wvals)
        hit = cum <= cfg.hsync_thresh * cfg.sync_level
        i_break = jnp.where(jnp.any(hit), jnp.argmax(hit) - W, W)
        hsync_new = posmod(i_break + hsync, cfg.hres)
        hsync = jnp.where(active, hsync_new, hsync)

        xpos = posmod(cfg.av_beg + hsync - 3, cfg.hres)        # xnudge=-3
        ypos = posmod(line + vsync + 3, cfg.vres)              # ynudge=+3
        pos = xpos

        # color carrier convergence EMA over the burst (crt_core.c:456-467)
        vper_row = crem(ypos, cfg.cc_vper)  # ypos >= 0 so % == posmod
        ccr = lax.dynamic_slice(ccf, (vper_row, 0), (1, CC))[0]
        if CC == 4:
            base = ln + (hsync & ~3)                           # crt_core.c:458
        else:
            base = ln + (hsync - crem(hsync, CC))
        bidx = base + cfg.cb_beg + jnp.arange(cfg.burst_len, dtype=jnp.int32)
        bvals = jnp.take(inp_flat, posmod(bidx, n_total))
        # arrange burst samples by phase class, preserving order
        m = cfg.burst_len // CC
        resh = bvals.reshape(m, CC)
        cls = jnp.arange(CC, dtype=jnp.int32)
        col_for_cls = posmod(cls - cfg.cb_beg, CC)             # j = m*CC+c -> class (cb_beg+c)%CC
        per_cls = jnp.take(resh, col_for_cls, axis=1)          # (m, CC) in class order
        ccr_new = ccr
        for mm in range(m):
            ccr_new = cdiv(ccr_new * 127, 128) + per_cls[mm]
        ccr = jnp.where(active, ccr_new, ccr)
        ccf = lax.dynamic_update_slice(ccf, ccr[None, :], (vper_row, 0))

        phasealign = posmod(hsync, CC)

        if CC == 4:
            # 4-sample IQ extraction (crt_core.c:471-479)
            dci = jnp.take(ccr, (phasealign + 1) & 3) - jnp.take(ccr, (phasealign + 3) & 3)
            dcq = jnp.take(ccr, (phasealign + 2) & 3) - jnp.take(ccr, (phasealign + 0) & 3)
            w0 = ((dci * hue_cs - dcq * hue_sn) >> 4) * saturation
            w1 = ((dcq * hue_cs + dci * hue_sn) >> 4) * saturation
            wave = jnp.stack([w0, w1, -w0, -w1])
            out_w = (wave,)
        else:
            # 5-sample variant (crt_core.c:480-509)
            off180 = CC // 2
            off90 = CC // 4
            peakA = phasealign + off90
            peakB = phasealign
            dciA = jnp.take(ccr, crem(peakA, CC))
            dciB = cdiv(jnp.take(ccr, crem(peakA + off180, CC)) +
                        jnp.take(ccr, crem(peakA + off180 + 1, CC)), 2)
            dcqA = jnp.take(ccr, crem(peakB + off180, CC))
            dcqB = jnp.take(ccr, crem(peakB, CC))
            dci = dciA - dciB
            dcq = dcqA - dcqB
            # hue rotation into wave tables is line-independent given
            # (dci, dcq); hoisted out of the scan (see demodulate_core)
            out_w = (dci, dcq)
        return (hsync, ccf), (pos, beg, end, active) + out_w

    (hsync_f, ccf_f), outs = lax.scan(step, (hsync0, ccf0), lines, unroll=8)
    return hsync_f, ccf_f, outs


def demodulate_core(
    cfg: SystemConfig,
    analog: jax.Array,       # int8 (VRES, HRES)
    out_prev: jax.Array,     # uint8 (outh, outw, 3) canonical RGB — persists
    hsync: jax.Array,
    vsync: jax.Array,
    ccf: jax.Array,          # int32 (cc_vper, cc_samples)
    rn: jax.Array,
    noise,
    mon: MonitorParams,
    *,
    randstate: jax.Array = None,
    v_fac: int = 0,
) -> tuple[jax.Array, dict]:
    """One decode pass.  Returns (rgb uint8 (outh,outw,3), new state dict
    with keys hsync/vsync/ccf/rn/randstate/inp)."""
    outh, outw = out_prev.shape[0], out_prev.shape[1]
    CC = cfg.cc_samples

    bright = i32(mon.brightness) - (cfg.black_level + i32(mon.black_point))

    hue_ang = (crem(mon.hue, 360) + 33) * 8192
    sn, cs = sincos14(cdiv(hue_ang, 180))
    hue_sn, hue_cs = sn >> 11, cs >> 11                        # crt_core.c:318-320

    analog_flat = jnp.asarray(analog, jnp.int32).reshape(-1)
    if cfg.vhs_noise:
        inp_flat, randstate, rn_new = _inject_noise_vhs(
            cfg, analog_flat, randstate, noise)
    else:
        inp_flat, rn_new = _inject_noise(cfg, analog_flat, rn, noise)
    inp2d = inp_flat.reshape(cfg.vres, cfg.hres)

    vsync_new, field = _find_vsync(cfg, inp2d, vsync)

    ratio = ((outh << 16) // cfg.lines + 32768) >> 16          # static
    field_px = field * (ratio // 2)

    hsync_new, ccf_new, outs = _line_scan(
        cfg, inp_flat, i32(hsync), jnp.asarray(ccf, jnp.int32), vsync_new,
        hue_sn, hue_cs, i32(mon.saturation), outh, v_fac, field_px)

    if CC == 4:
        xpos_l, beg_l, end_l, active_l, wave_l = outs          # (L,), wave (L,4)
    else:
        xpos_l, beg_l, end_l, active_l, dci_l, dcq_l = outs
        # wave tables rotated by hue (crt_core.c:499-509), per line
        kk = jnp.arange(CC, dtype=jnp.int32)
        base_ang = crem(mon.hue, 360) + kk * (360 // CC)       # (CC,)
        snI, csI = sincos14(cdiv(base_ang * 8192, 180))
        snQ, csQ = sincos14(cdiv((base_ang + 90) * 8192, 180))
        sat = i32(mon.saturation)
        waveI_l = ((dci_l[:, None] * csI + dcq_l[:, None] * snI) >> 15) * sat
        waveQ_l = ((dci_l[:, None] * csQ + dcq_l[:, None] * snQ) >> 15) * sat

    L = cfg.lines
    AV = cfg.av_len
    H, V = cfg.hres, cfg.vres

    # Extract each line's active-video window sig[l, i] = inp[pos_l + i]
    # without gathers (ops/fastpath.py): the row component of pos_l is a
    # scalar roll by (vsync + 3), the column component a per-line shift by
    # xpos_l realized as a one-hot bf16 cross-correlation on the MXU.
    # Reads past a row continue into the next row like the reference's flat
    # indexing; reads past the final line wrap to the top (the reference
    # reads out of bounds there — UB — e.g. under VHS aberration).
    inp2d_i8 = inp_flat.astype(jnp.int8).reshape(V, H)
    doubled = jnp.concatenate([inp2d_i8, inp2d_i8], axis=0)     # (2V, H)
    start = posmod(cfg.top + vsync_new + 3, V)
    rolled = lax.dynamic_slice(doubled, (start, 0), (L + 1, H)) # rows ypos_l
    rows_ext = jnp.concatenate([rolled[:L], rolled[1:L + 1]], axis=1)
    sig = fastpath.shift_rows(jnp.asarray(rows_ext, jnp.int32),
                              xpos_l, AV)                       # (L, AV)

    if CC == 4:
        wv_i = fastpath.tile_period(wave_l, AV, 0)              # (L, AV)
        wv_q = fastpath.tile_period(wave_l, AV, 3)
    else:
        wv_i = fastpath.tile_period(waveI_l, AV, 0)
        wv_q = fastpath.tile_period(waveQ_l, AV, 0)

    y_in = sig + bright
    i_in = (sig * wv_i) >> 9
    q_in = (sig * wv_q) >> 9

    eqY, eqI, eqQ = _eq_coefs(cfg)
    stacked = jnp.stack([y_in, i_in, q_in], axis=1)             # (L, 3, AV)
    lf = jnp.asarray([eqY.lf, eqI.lf, eqQ.lf], jnp.int32)[None, :]
    hf = jnp.asarray([eqY.hf, eqI.hf, eqQ.hf], jnp.int32)[None, :]
    g0 = jnp.asarray([eqY.g_lo, eqI.g_lo, eqQ.g_lo], jnp.int32)[None, :]
    g1 = jnp.asarray([eqY.g_mid, eqI.g_mid, eqQ.g_mid], jnp.int32)[None, :]
    g2 = jnp.asarray([eqY.g_hi, eqI.g_hi, eqQ.g_hi], jnp.int32)[None, :]
    eqd = filters.eq_threeband(stacked, lf, hf, g0, g1, g2)
    oy = eqd[:, 0] << 4                                         # crt_core.c:540
    oi = eqd[:, 1] >> 3
    oq = eqd[:, 2] >> 3

    # ---- scan conversion (crt_core.c:555-611) ------------------------------
    # fixed-point lerp as exact int8-limb MXU matmuls (ops/fastpath.py)
    yv = fastpath.lerp_resample(oy, outw, 2)
    iv = fastpath.lerp_resample(oi, outw, 14)
    qv = fastpath.lerp_resample(oq, outw, 14)

    contrast = i32(mon.contrast)
    r = (((yv + 3879 * iv + 2556 * qv) >> 12) * contrast) >> 8
    g = (((yv - 1126 * iv - 2605 * qv) >> 12) * contrast) >> 8
    b = (((yv - 4530 * iv + 7021 * qv) >> 12) * contrast) >> 8
    rgb = jnp.clip(jnp.stack([r, g, b], axis=-1), 0, 255)       # (L, outw, 3)

    out_new = _place_rows(cfg, rgb, out_prev, beg_l, end_l, active_l,
                          i32(mon.blend), i32(mon.scanlines), outh)

    state = dict(hsync=hsync_new, vsync=vsync_new, ccf=ccf_new, rn=rn_new,
                 randstate=randstate,
                 inp=inp_flat.astype(jnp.int8).reshape(cfg.vres, cfg.hres))
    return out_new, state


def _place_rows(cfg, rgb, out_prev, beg_l, end_l, active_l, blend, scanlines,
                outh):
    """Reproduce the reference's sequential row writes (store at `beg`,
    memcpy-duplicate up to `end - scanlines`, blend vs previous contents;
    crt_core.c:552-664) as a pure per-output-row gather.

    Exactness note: resolves overlapping writes by "last line wins", which is
    identical to the C semantics whenever line `beg`s are strictly increasing
    — true iff outh + v_fac >= CRT_LINES (standard usage; e.g. 480 >= 240).
    For smaller outputs with blend enabled the reference would blend against
    rows written earlier in the same call; callers wanting that regime should
    lower blend or use outh >= CRT_LINES.
    """
    L = cfg.lines
    end_c = jnp.minimum(end_l, outh)
    cov_end = jnp.maximum(beg_l + 1, end_c - scanlines)

    rows = jnp.arange(outh, dtype=jnp.int32)[:, None]           # (outh, 1)
    covers = (rows >= beg_l[None, :]) & (rows < cov_end[None, :]) & active_l[None, :]
    lid = jnp.arange(L, dtype=jnp.int32)[None, :]
    last = jnp.max(jnp.where(covers, lid, -1), axis=1)          # (outh,)
    exists = last >= 0
    lsel = jnp.maximum(last, 0)

    old = jnp.asarray(out_prev, jnp.int32)
    beg_sel = jnp.take(beg_l, lsel)                             # source row's beg
    old_at_beg = fastpath.select_rows(out_prev,
                                      jnp.clip(beg_sel, 0, outh - 1))
    new_rows = fastpath.select_rows(jnp.clip(rgb, 0, 255).astype(jnp.uint8),
                                    lsel)                       # (outh, outw, 3)
    blended = (new_rows >> 1) + (old_at_beg >> 1)               # crt_core.c:608
    content = jnp.where(blend != 0, blended, new_rows)
    out = jnp.where(exists[:, None, None], content, old)
    return out.astype(jnp.uint8)
