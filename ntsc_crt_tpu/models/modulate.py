"""Modulator: digital RGB frame -> sampled analog NTSC composite field.

TPU-native reformulation of the reference encoders (crt_ntsc.c:128-330 is the
canonical one).  The reference writes the 262-line field sample-by-sample;
here the field splits into three tensor phases:

1. **Field skeleton** — sync/equalizing/blank structure is a pure function of
   (system, field parity); both parities are built once at trace time as
   constant (VRES, HRES) tensors plus a static write-mask (samples the
   skeleton does NOT write persist from the previous field — load-bearing:
   the active-video region of inactive lines and the last column are stale by
   design in the reference, and NES mode relies on skeleton persistence).
2. **Color burst** — a per-line constant over the burst window, computed from
   the (traced) hue via the vectorized 14-bit sine.
3. **Active video** — nearest-neighbor image gather, RGB->YIQ as int32
   elementwise dot, per-line IIR bandlimit (serial along x, batched across
   lines — see ops/filters.py), quadrature carrier multiply, IRE clamp, and
   one dynamic_update_slice scatter into the analog field.

All integer ops match the C bit-for-bit (truncating div, arithmetic shifts,
int32 wrap).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ntsc_crt_tpu.models.systems import (
    SystemConfig,
    CHROMA_CHECKERED,
)
from ntsc_crt_tpu.ops import fastpath, filters
from ntsc_crt_tpu.ops.fixedpoint import cdiv, crem, i32, posmod, sincos14


# ---------------------------------------------------------------------------
# Field skeleton (crt_ntsc.c:205-252; SNES/template variants via regions)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def build_skeletons(cfg: SystemConfig):
    """(skel_even, skel_odd, write_mask) as numpy constants.

    skel_*: int8 (VRES, HRES) — the sync/blank structure for each field
    parity.  write_mask: bool (VRES, HRES) — True where the skeleton writes;
    everything else keeps the previous analog contents.

    NTSC hard-codes the equalizing/vsync line ranges and percentages
    (crt_ntsc.c:211-228); SNES/TEMPLATE parameterize the line ranges
    (crt_snes.h:135-146) with identical in-line percentages; PV1K places
    vsync near the bottom of the field (crt_pv1k.c:211-222).
    """
    H, V = cfg.hres, cfg.vres
    sync, blank = cfg.sync_level, cfg.blank_level

    def region_line(offs):
        """SYNC until offs[0]%, BLANK until offs[1]%, SYNC until offs[2]%,
        BLANK until offs[3]% — the reference's while-loop quads."""
        row = np.full(H, blank, np.int8)
        bounds = [o * H // 100 for o in offs]
        row[0:bounds[0]] = sync
        row[bounds[0]:bounds[1]] = blank
        row[bounds[1]:bounds[2]] = sync
        row[bounds[2]:bounds[3]] = blank
        return row

    equalizing = region_line([4, 50, 54, 100])          # crt_ntsc.c:211-216
    vsync_even = region_line([46, 50, 96, 100])         # crt_ntsc.c:217-228
    vsync_odd = region_line([4, 50, 96, 100])
    if not cfg.vsync_field_dependent:                   # SNES: crt_snes.c:216-218
        vsync_odd = vsync_even

    video = np.full(H, blank, np.int8)
    video[cfg.sync_beg:cfg.bw_beg] = sync               # crt_ntsc.c:233-235
    # FP before sync_beg and BW+CB+BP after are blank (initialized above)

    skel_even = np.zeros((V, H), np.int8)
    skel_odd = np.zeros((V, H), np.int8)
    mask = np.zeros((V, H), bool)

    equ_rows = list(range(cfg.equ_a[0], cfg.equ_a[1] + 1)) + \
        list(range(cfg.equ_b[0], cfg.equ_b[1] + 1))
    sync_rows = list(range(cfg.sync_region[0], cfg.sync_region[1] + 1))

    for n in range(V):
        if n in equ_rows:
            skel_even[n] = skel_odd[n] = equalizing
            mask[n] = True
        elif n in sync_rows:
            skel_even[n] = vsync_even
            skel_odd[n] = vsync_odd
            mask[n] = True
        else:
            skel_even[n, :cfg.av_beg] = video[:cfg.av_beg]
            skel_odd[n, :cfg.av_beg] = video[:cfg.av_beg]
            mask[n, :cfg.av_beg] = True
            if n < cfg.top:  # fully blanked inactive lines (crt_ntsc.c:236-238)
                skel_even[n, cfg.av_beg:] = blank
                skel_odd[n, cfg.av_beg:] = blank
                mask[n, cfg.av_beg:] = True
    return skel_even, skel_odd, mask


@functools.lru_cache(maxsize=16)
def build_skeleton_nes(cfg: SystemConfig) -> np.ndarray:
    """NES-family skeleton (setup_field, crt_nes.c:81-104 / crt_nesrgb.c:24-47):
    every sample of every line is written (full mask), with a long sync
    separator on the bottom vsync lines 259-261."""
    H, V = cfg.hres, cfg.vres
    sync, blank = cfg.sync_level, cfg.blank_level
    skel = np.full((V, H), blank, np.int8)
    sep_end = 327 * H // 341                            # PPUpx2pos(327)
    for n in range(V):
        if n >= 259:
            skel[n, cfg.sync_beg:sep_end] = sync
        else:
            skel[n, cfg.sync_beg:cfg.bw_beg] = sync
    return skel


def _dest_size(cfg: SystemConfig, raw: bool, img_w: int, img_h: int):
    """destw/desth sizing (crt_ntsc.c:148-173, non-bloom path)."""
    destw, desth = cfg.av_len, (cfg.lines * 64500) >> 16
    if raw:
        destw = min(img_w, cfg.av_len)
        desth = min(img_h, (cfg.lines * 64500) >> 16)
    return destw, desth


# ---------------------------------------------------------------------------
# RGB-family modulator (NTSC; the SNES/VHS/PV1K/NESRGB variants build on it)
# ---------------------------------------------------------------------------


def modulate_rgb(
    cfg: SystemConfig,
    analog: jax.Array,        # int8 (VRES, HRES) — persistent field buffer
    img: jax.Array,           # uint8/int32 (h, w, 3) canonical RGB
    *,
    field,                    # traced int: 0 even, 1 odd
    frame,                    # traced int
    hue,                      # traced int 0-359
    as_color=1,               # traced int: 0 monochrome
    xoffset=0,
    yoffset=0,
    black_point=0,
    white_point=100,
    raw: bool = False,        # static
) -> tuple[jax.Array, jax.Array]:
    """Returns (analog', ccf') — ccf' is the encoder's burst export
    (iccf << 7, crt_ntsc.c:325-329), shape (cc_vper, cc_samples) int32."""
    assert cfg.kind == "rgb" and cfg.cc_samples == 4, "NTSC-family encoder"
    H, V = cfg.hres, cfg.vres
    h, w = img.shape[0], img.shape[1]
    img_u8 = jnp.asarray(img, jnp.uint8)
    field = i32(field) & 1
    frame = i32(frame) & 1
    hue = i32(hue)

    destw, desth = _dest_size(cfg, raw, w, h)
    xo = cfg.av_beg + i32(xoffset) + (cfg.av_len - destw) // 2
    yo = cfg.top + yoffset + (cfg.lines - desth) // 2
    xo = xo & ~3  # align signal (crt_ntsc.c:203)

    inv_phase = (field == frame).astype(jnp.int32)  # crt_ntsc.c:199
    if cfg.chroma_pattern == CHROMA_CHECKERED:
        ph = 1 - 2 * (inv_phase & 1)  # CC_PHASE (crt_ntsc.c:18-23)
    else:
        ph = jnp.ones((), jnp.int32)

    # carrier tables (crt_ntsc.c:174-188)
    k = jnp.arange(cfg.cc_samples, dtype=jnp.int32)
    n_ang = hue + k * (360 // cfg.cc_samples)
    burst_sn, _ = sincos14(cdiv((n_ang + cfg.hue_offset) * 8192, 180))
    modI_sn, _ = sincos14(cdiv(n_ang * 8192, 180))
    modQ_sn, _ = sincos14(cdiv((n_ang + cfg.q_offset) * 8192, 180))
    on = (i32(as_color) != 0)
    ccburst = jnp.where(on, burst_sn >> 10, 0)
    ccmodI = jnp.where(on, modI_sn >> 10, 0)
    ccmodQ = jnp.where(on, modQ_sn >> 10, 0)

    # --- skeleton + burst ---------------------------------------------------
    skel_even, skel_odd, mask = build_skeletons(cfg)
    skel = jnp.where(field == 1, jnp.asarray(skel_odd), jnp.asarray(skel_even))
    analog = jnp.where(jnp.asarray(mask), skel, analog)

    t = jnp.arange(cfg.burst_len, dtype=jnp.int32) + cfg.cb_beg
    if cfg.chroma_pattern == CHROMA_CHECKERED:
        cb_idx = (t + inv_phase * (cfg.cc_samples // 2)) % cfg.cc_samples
    else:
        cb_idx = t % cfg.cc_samples
    burst_vals = (cfg.blank_level +
                  jnp.take(ccburst, cb_idx) * cfg.burst_level) >> 5
    # burst goes on every non-equalizing/non-vsync line (crt_ntsc.c:241-251)
    video_rows = np.ones(V, bool)
    for lo, hi in (cfg.equ_a, cfg.sync_region, cfg.equ_b):
        video_rows[lo:hi + 1] = False
    burst_rows = jnp.asarray(video_rows)[:, None]
    seg = analog[:, cfg.cb_beg:cfg.cb_beg + cfg.burst_len]
    seg = jnp.where(burst_rows, burst_vals[None, :].astype(jnp.int8), seg)
    analog = lax.dynamic_update_slice(analog, seg, (0, cfg.cb_beg))

    # iccf export: last burst write per phase class (crt_ntsc.c:249, 325-329)
    kk = jnp.arange(cfg.cc_samples, dtype=jnp.int32)
    if cfg.chroma_pattern == CHROMA_CHECKERED:
        icc_idx = (kk + inv_phase * (cfg.cc_samples // 2)) % cfg.cc_samples
    else:
        icc_idx = kk
    iccf = (cfg.blank_level + jnp.take(ccburst, icc_idx) * cfg.burst_level) >> 5
    ccf = jnp.broadcast_to(iccf << 7, (cfg.cc_vper, cfg.cc_samples)).astype(jnp.int32)

    # --- active video --------------------------------------------------------
    # vertical resample + interlace field offset (crt_ntsc.c:254-265)
    y_idx = jnp.arange(desth, dtype=jnp.int32)
    field_offset = cdiv(cdiv(field * h + desth, desth), 2)
    sy = (y_idx * h) // desth + field_offset
    # C clamps sy to h, i.e. reads one row PAST the image (UB); we clamp to
    # the last valid row — identical whenever the C read is defined.
    sy = jnp.minimum(sy, h - 1)
    x_idx = np.arange(destw, dtype=np.int32)
    sx = (x_idx * w) // destw

    # nearest-neighbor resample as one-hot MXU matmuls (ops/fastpath.py)
    rows = fastpath.select_rows(img_u8, sy)                   # (desth, w, 3)
    pix = fastpath.select_cols_static(rows.astype(jnp.uint8), sx)
    rA, gA, bA = pix[..., 0], pix[..., 1], pix[..., 2]

    # RGB -> YIQ (crt_ntsc.c:307-310)
    fy = (19595 * rA + 38470 * gA + 7471 * bA) >> 14
    fi = (39059 * rA - 18022 * gA - 21103 * bA) >> 14
    fq = (13894 * rA - 34275 * gA + 20382 * bA) >> 14

    if cfg.do_bandlimiting:
        cY = filters.init_iir(cfg.l_freq, cfg.y_freq)
        cI = filters.init_iir(cfg.l_freq, cfg.i_freq)
        cQ = filters.init_iir(cfg.l_freq, cfg.q_freq)
        yiq = jnp.stack([fy, fi, fq], axis=1)                 # (desth, 3, destw)
        coefs = jnp.asarray([cY, cI, cQ], jnp.int32)[None, :]  # vs state (desth, 3)
        yiq = filters.iir_lowpass(yiq, coefs)
        fy, fi, fq = yiq[:, 0], yiq[:, 1], yiq[:, 2]

    xoff = (x_idx[None, :] + xo) % cfg.cc_samples             # (1, destw) traced
    fi = (fi * ph * jnp.take(ccmodI, xoff)) >> 4              # crt_ntsc.c:316
    fq = (fq * ph * jnp.take(ccmodQ, xoff)) >> 4
    gain = cdiv(cfg.white_level * i32(white_point), 100)
    ire = cfg.black_level + i32(black_point) + \
        (((fy + fi + fq) * gain) >> 10)                        # crt_ntsc.c:318
    ire = jnp.clip(ire, 0, 110).astype(jnp.int8)

    analog = lax.dynamic_update_slice(analog, ire, (yo, xo))
    return analog, ccf


# ---------------------------------------------------------------------------
# VHS wrapper: NTSC modulation + head-switch aberration (crt_ntscvhs.c)
# ---------------------------------------------------------------------------


def modulate_vhs(
    cfg: SystemConfig,
    analog: jax.Array,
    img: jax.Array,
    randstate: jax.Array,     # crt_rand state (shared with decode noise)
    *,
    field, frame, hue, as_color=1, xoffset=0, yoffset=0,
    black_point=0, white_point=100, raw: bool = False,
    do_aberration=0,
):
    """crt_ntscvhs.c:128-337.  Identical to the NTSC path except:
    a random 6-17 line region at the bottom of the frame loses its sync tips
    (head-switching emulation, :234-238), the caller must zero the persistent
    hsync estimate each frame (:258-259, handled by pipeline.modulate), and
    the ccf export is zeroed (:330-335).

    Returns (analog', ccf_zero, randstate')."""
    from ntsc_crt_tpu.ops import lcg as _lcg

    analog, _ = modulate_rgb(
        cfg, analog, img, field=field, frame=frame, hue=hue,
        as_color=as_color, xoffset=xoffset, yoffset=yoffset,
        black_point=black_point, white_point=white_point, raw=raw)

    do_ab = i32(do_aberration) != 0
    rv, rs_next = _lcg.crt_rand_stream(randstate, 1)
    aberration = jnp.where(do_ab, (crem(rv[0], 12) - 8) + 14, 0)
    randstate = jnp.where(do_ab, rs_next, i32(randstate))

    # blank out FP+SYNC of the bottom `aberration` video lines
    V, H = cfg.vres, cfg.hres
    video_rows = np.ones(V, bool)
    for lo, hi in (cfg.equ_a, cfg.sync_region, cfg.equ_b):
        video_rows[lo:hi + 1] = False
    rows = jnp.arange(V, dtype=jnp.int32)[:, None]
    cols = jnp.arange(H, dtype=jnp.int32)[None, :]
    kill = (jnp.asarray(video_rows)[:, None]
            & (rows >= (V - aberration))
            & (cols < cfg.bw_beg))
    analog = jnp.where(kill, jnp.int8(cfg.blank_level), analog)

    ccf = jnp.zeros((cfg.cc_vper, cfg.cc_samples), jnp.int32)
    return analog, ccf, randstate


# ---------------------------------------------------------------------------
# SNES / TEMPLATE / PV1K: per-line vertical chroma phase (2D carrier tables)
# ---------------------------------------------------------------------------


def modulate_vper(
    cfg: SystemConfig,
    analog: jax.Array,
    img: jax.Array,
    *,
    field, frame, hue, as_color=1, xoffset=0, yoffset=0,
    black_point=0, white_point=100, raw: bool = False,
    dot_crawl_offset=0,
) -> tuple[jax.Array, jax.Array]:
    """crt_snes.c:125-327 / crt_template.c:125-337 / crt_pv1k.c:121-321.

    Differences from the NTSC path: carrier/burst tables are 2D
    [cc_vper][cc_samples] with a per-line vertical phase advance
    (dot crawl), burst hue offset `(n - step + hue_offset)`, per-line table
    row `(y + yo) % cc_vper` instead of a CC_PHASE sign flip, and xo aligned
    to cc_samples (not &~3 — same thing for 4, different for PV1K's 5)."""
    assert cfg.kind == "rgb"
    H, V, CC, VP = cfg.hres, cfg.vres, cfg.cc_samples, cfg.cc_vper
    h, w = img.shape[0], img.shape[1]
    img_u8 = jnp.asarray(img, jnp.uint8)
    field = i32(field) & 1
    hue = i32(hue)
    dco = i32(dot_crawl_offset)

    destw, desth = _dest_size(cfg, raw, w, h)
    xo = cfg.av_beg + i32(xoffset) + (cfg.av_len - destw) // 2
    yo = cfg.top + yoffset + (cfg.lines - desth) // 2
    xo = xo - crem(xo, CC)  # align signal (crt_snes.c:201)

    # 2D carrier tables (crt_snes.c:170-188)
    step = 360 // CC
    yv = jnp.arange(VP, dtype=jnp.int32)[:, None]
    xv = jnp.arange(CC, dtype=jnp.int32)[None, :]
    vert = (yv + dco) * cfg.vert_step
    n_ang = vert + hue + xv * step
    b_sn, _ = sincos14(cdiv((n_ang - step + cfg.hue_offset) * 8192, 180))
    i_sn, _ = sincos14(cdiv(n_ang * 8192, 180))
    q_sn, _ = sincos14(cdiv((n_ang + cfg.q_offset) * 8192, 180))
    on = (i32(as_color) != 0)
    ccburst = jnp.where(on, b_sn >> 10, 0)                # (VP, CC)
    ccmodI = jnp.where(on, i_sn >> 10, 0)
    ccmodQ = jnp.where(on, q_sn >> 10, 0)

    # skeleton + per-line-phase burst
    skel_even, skel_odd, mask = build_skeletons(cfg)
    skel = jnp.where(field == 1, jnp.asarray(skel_odd), jnp.asarray(skel_even))
    analog = jnp.where(jnp.asarray(mask), skel, analog)

    video_rows = np.ones(V, bool)
    for lo, hi in (cfg.equ_a, cfg.sync_region, cfg.equ_b):
        video_rows[lo:hi + 1] = False
    t = jnp.arange(cfg.burst_len, dtype=jnp.int32) + cfg.cb_beg
    row_cls = crem(jnp.arange(V, dtype=jnp.int32), VP)    # (V,)
    burst_vals = (cfg.blank_level +
                  ccburst[row_cls][:, crem(t, CC)] * cfg.burst_level) >> 5
    seg = analog[:, cfg.cb_beg:cfg.cb_beg + cfg.burst_len]
    seg = jnp.where(jnp.asarray(video_rows)[:, None],
                    burst_vals.astype(jnp.int8), seg)
    analog = analog.at[:, cfg.cb_beg:cfg.cb_beg + cfg.burst_len].set(seg)

    # iccf export: iccf[(n+3) % VPER][t % CC] written from class n % VPER
    # (crt_snes.c:239); all lines of a class carry identical burst values
    m = jnp.arange(VP, dtype=jnp.int32)
    src_cls = posmod(m - 3, VP)
    iccf = (cfg.blank_level +
            jnp.take(ccburst, src_cls, axis=0) * cfg.burst_level) >> 5
    ccf = (iccf << 7).astype(jnp.int32)

    # active video
    y_idx = jnp.arange(desth, dtype=jnp.int32)
    if cfg.interlace_offset:
        field_offset = cdiv(cdiv(field * h + desth, desth), 2)
    else:
        field_offset = jnp.zeros((), jnp.int32)           # SNES: field unused
    sy = (y_idx * h) // desth + field_offset
    sy = jnp.minimum(sy, h - 1)
    x_idx = np.arange(destw, dtype=np.int32)
    sx = (x_idx * w) // destw

    rows = fastpath.select_rows(img_u8, sy)
    pix = fastpath.select_cols_static(rows.astype(jnp.uint8), sx)
    rA, gA, bA = pix[..., 0], pix[..., 1], pix[..., 2]
    fy = (19595 * rA + 38470 * gA + 7471 * bA) >> 14
    fi = (39059 * rA - 18022 * gA - 21103 * bA) >> 14
    fq = (13894 * rA - 34275 * gA + 20382 * bA) >> 14

    if cfg.do_bandlimiting:
        cY = filters.init_iir(cfg.l_freq, cfg.y_freq)
        cI = filters.init_iir(cfg.l_freq, cfg.i_freq)
        cQ = filters.init_iir(cfg.l_freq, cfg.q_freq)
        yiq = jnp.stack([fy, fi, fq], axis=1)
        coefs = jnp.asarray([cY, cI, cQ], jnp.int32)[None, :]
        yiq = filters.iir_lowpass(yiq, coefs)
        fy, fi, fq = yiq[:, 0], yiq[:, 1], yiq[:, 2]

    # gather per (y, x): ccmod[ph_row[y], xoff[x]]  (crt_snes.c:310-311)
    ph_row = crem(y_idx + yo, VP)                          # (desth,)
    xoff = crem(x_idx[None, :] + xo, CC)                   # (1, destw)
    sel = (jnp.arange(desth)[:, None], jnp.broadcast_to(xoff, (desth, destw)))
    fi = (fi * jnp.take(ccmodI, ph_row, axis=0)[sel]) >> 4
    fq = (fq * jnp.take(ccmodQ, ph_row, axis=0)[sel]) >> 4
    gain = cdiv(cfg.white_level * i32(white_point), 100)
    ire = cfg.black_level + i32(black_point) + (((fy + fi + fq) * gain) >> 10)
    ire = jnp.clip(ire, 0, 110).astype(jnp.int8)

    analog = lax.dynamic_update_slice(analog, ire, (yo, xo))
    return analog, ccf


# ---------------------------------------------------------------------------
# NESRGB: RGB input with NES timing/artifacts, no bandlimiting
# ---------------------------------------------------------------------------


def modulate_nesrgb(
    cfg: SystemConfig,
    analog: jax.Array,
    img: jax.Array,
    *,
    hue, dot_crawl_offset=0, xoffset=0, yoffset=0,
    black_point=0, white_point=100,
) -> tuple[jax.Array, jax.Array]:
    """crt_nesrgb.c:49-170.  NES-style skeleton (reapplied every call —
    idempotent, equivalent to the reference's run-once setup_field since the
    active region is rewritten each frame), burst only on active lines,
    carrier tables exclude hue (burst angle hue+90+n+33), no IIR."""
    H, V, CC, VP = cfg.hres, cfg.vres, cfg.cc_samples, cfg.cc_vper
    h, w = img.shape[0], img.shape[1]
    img_u8 = jnp.asarray(img, jnp.uint8)
    hue = i32(hue)
    dco = i32(dot_crawl_offset)

    destw, desth = cfg.av_len, cfg.lines                  # crt_nesrgb.c:53-54
    xo = (cfg.av_beg + i32(xoffset)) & ~3
    yo = cfg.top + yoffset

    step = 360 // CC
    yv = jnp.arange(VP, dtype=jnp.int32)[:, None]
    xv = jnp.arange(CC, dtype=jnp.int32)[None, :]
    n_ang = (yv + dco) * cfg.vert_step + xv * step        # no hue in mod tables
    b_sn, _ = sincos14(cdiv((hue + 90 + n_ang + 33) * 8192, 180))
    i_sn, _ = sincos14(cdiv(n_ang * 8192, 180))
    q_sn, _ = sincos14(cdiv((n_ang - 90) * 8192, 180))
    ccburst, ccmodI, ccmodQ = b_sn >> 10, i_sn >> 10, q_sn >> 10

    analog = jnp.asarray(build_skeleton_nes(cfg))         # full-field rewrite

    # burst + iccf on active rows only (crt_nesrgb.c:104-109)
    y_idx = jnp.arange(desth, dtype=jnp.int32)
    row_cls = crem(y_idx + yo, VP)                        # (desth,)
    t = jnp.arange(cfg.burst_len, dtype=jnp.int32) + cfg.cb_beg
    burst_vals = (cfg.blank_level +
                  jnp.take(ccburst, row_cls, axis=0)[:, crem(t, CC)]
                  * cfg.burst_level) >> 5                  # (desth, blen)
    analog = lax.dynamic_update_slice(
        analog, burst_vals.astype(jnp.int8), (yo, cfg.cb_beg))

    kk = jnp.arange(CC, dtype=jnp.int32)[None, :]
    iccf = (cfg.blank_level +
            jnp.take(ccburst, crem(jnp.arange(VP, dtype=jnp.int32), VP),
                     axis=0) * cfg.burst_level) >> 5
    ccf = (iccf << 7).astype(jnp.int32)
    del kk

    sy = jnp.clip((y_idx * h) // desth, 0, h - 1)
    x_idx = np.arange(destw, dtype=np.int32)
    sx = (x_idx * w) // destw
    rows = fastpath.select_rows(img_u8, sy)
    pix = fastpath.select_cols_static(rows.astype(jnp.uint8), sx)
    rA, gA, bA = pix[..., 0], pix[..., 1], pix[..., 2]
    fy = (19595 * rA + 38470 * gA + 7471 * bA) >> 14
    fi = (39059 * rA - 18022 * gA - 21103 * bA) >> 14
    fq = (13894 * rA - 34275 * gA + 20382 * bA) >> 14

    xoff = crem(x_idx[None, :] + xo, CC)
    sel = (jnp.arange(desth)[:, None], jnp.broadcast_to(xoff, (desth, destw)))
    fi = (fi * jnp.take(ccmodI, row_cls, axis=0)[sel]) >> 4
    fq = (fq * jnp.take(ccmodQ, row_cls, axis=0)[sel]) >> 4
    gain = cdiv(cfg.white_level * i32(white_point), 100)
    ire = cfg.black_level + i32(black_point) + (((fy + fi + fq) * gain) >> 10)
    ire = jnp.clip(ire, 0, 110).astype(jnp.int8)

    analog = lax.dynamic_update_slice(analog, ire, (yo, xo))
    return analog, ccf


# ---------------------------------------------------------------------------
# NES: square-wave synthesis from PPU pixel indices (crt_nes.c)
# ---------------------------------------------------------------------------

# amplified IRE levels and emphasis masks (crt_nes.c:26-40)
_NES_IRE = np.array(
    [-12042, 0, 34406, 81427,          # 0d 1d 2d 3d
     -17203, -8028, 19497, 57342,      # emphasized
     43581, 75693, 112965, 112965,     # 00 10 20 30
     26951, 52181, 83721, 83721],      # emphasized
    dtype=np.int64)
_NES_ACTIVE = [0o300, 0o100, 0o500, 0o400, 0o600, 0o200]
_NES_PHASETAB = [0, 4, 8]              # 3-line dot crawl (crt_nes.c:116)


@functools.lru_cache(maxsize=1)
def _nes_square_table() -> np.ndarray:
    """square_sample (crt_nes.c:21-61) tabulated over (pixel & 0x1ff, phase
    % 12) — the function only reads bits 0-8 of the pixel and phase mod 12."""
    tab = np.zeros((512, 12), np.int32)
    for p in range(512):
        hue = p & 0x0F
        for phase in range(12):
            if hue >= 0x0E:
                tab[p, phase] = 0
                continue
            v = int(((hue + phase) % 12) < 6)
            e = int(((p & 0o700) & _NES_ACTIVE[(phase >> 1) % 6]) > 0)
            if hue == 0x00:
                l = 1
            elif hue == 0x0D:
                l = 0
            else:
                l = v
            tab[p, phase] = int(_NES_IRE[(l << 3) + (e << 2) + ((p >> 4) & 3)])
    return tab


def _wrap_i8(x: jax.Array) -> jax.Array:
    """C signed-char assignment semantics (wrap mod 256): the NES encoder
    stores unclamped IRE sums (crt_nes.c:190-191)."""
    return (((x + 128) & 255) - 128).astype(jnp.int8)


def modulate_nes(
    cfg: SystemConfig,
    analog: jax.Array,
    ppu: jax.Array,           # uint16 (h, w) NES PPU pixels (6 or 9 bit)
    *,
    hue, dot_crawl_offset=0, xoffset=0, yoffset=0,
    black_point=0, white_point=100,
) -> tuple[jax.Array, jax.Array]:
    """crt_nes.c:106-201 (the optimized path; bit-identical output).

    Square-wave synthesis: each output sample sums 4 table lookups at
    consecutive subcarrier phases, with phase advancing 3 per PPU pixel and a
    3-line dot-crawl phase table."""
    assert cfg.kind == "nes"
    H, V, CC, VP = cfg.hres, cfg.vres, cfg.cc_samples, cfg.cc_vper
    h, w = ppu.shape[0], ppu.shape[1]
    ppu = jnp.asarray(ppu, jnp.int32) & 0x1FF
    hue = i32(hue)
    dco = i32(dot_crawl_offset)

    destw, desth = cfg.av_len, cfg.lines
    xo = (cfg.av_beg + i32(xoffset)) & ~3
    yo = cfg.top + yoffset

    # burst table (crt_nes.c:123-130): note the % 360 before the angle scale
    yv = jnp.arange(VP, dtype=jnp.int32)[:, None]
    xv = jnp.arange(CC, dtype=jnp.int32)[None, :]
    n_ang = crem(hue + xv * (360 // CC) + (yv + dco) * cfg.vert_step + 33, 360)
    b_sn, _ = sincos14(cdiv(n_ang * 8192, 180))
    ccburst = b_sn >> 10

    analog = jnp.asarray(build_skeleton_nes(cfg))

    y_idx = jnp.arange(desth, dtype=jnp.int32)
    row_cls = crem(y_idx + yo, VP)
    t = jnp.arange(cfg.burst_len, dtype=jnp.int32) + cfg.cb_beg
    burst_vals = (cfg.blank_level +
                  jnp.take(ccburst, row_cls, axis=0)[:, crem(t, CC)]
                  * cfg.burst_level) >> 5
    analog = lax.dynamic_update_slice(
        analog, burst_vals.astype(jnp.int8), (yo, cfg.cb_beg))

    iccf = (cfg.blank_level +
            jnp.take(ccburst, crem(jnp.arange(VP, dtype=jnp.int32), VP),
                     axis=0) * cfg.burst_level) >> 5
    ccf = (iccf << 7).astype(jnp.int32)

    # active video: 4 square samples per output pixel, phase += 3 per pixel
    sy = jnp.clip((y_idx * h) // desth, 0, h - 1)
    x_idx = np.arange(destw, dtype=np.int32)
    sx = jnp.asarray((x_idx * w) // destw)
    p = jnp.take(jnp.take(ppu, sy, axis=0), sx, axis=1)   # (desth, destw)

    phasetab = jnp.asarray(_NES_PHASETAB, jnp.int32)
    ph0 = jnp.take(phasetab, crem(y_idx + yo + dco, VP))  # (desth,)
    phx = ph0[:, None] + 3 * jnp.asarray(x_idx)[None, :]  # (desth, destw)

    sq = jnp.asarray(_nes_square_table())                 # (512, 12)
    flat = p * 12                                          # row base into sq
    sqf = sq.reshape(-1)
    ire = jnp.zeros_like(p) + cfg.black_level + i32(black_point)
    for j in range(4):
        ire = ire + jnp.take(sqf, flat + crem(phx + j, 12))
    ire = cdiv(ire * i32(white_point), 100) >> 12          # crt_nes.c:190
    analog = lax.dynamic_update_slice(analog, _wrap_i8(ire), (yo, xo))
    return analog, ccf
