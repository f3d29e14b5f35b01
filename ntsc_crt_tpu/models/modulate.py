"""Modulator: digital RGB frames -> sampled analog NTSC composite fields.

TPU-native reformulation of the reference encoders (crt_ntsc.c:128-330 is the
canonical one).  All functions are **batch-first**: a leading frame-batch dim
is threaded through every tensor instead of vmap, so data movement stays in
its fast forms (static slices, one-hot MXU matmuls, grouped convs, Pallas
row-kernels) rather than decaying into per-element gathers under batching.

Per frame the field splits into three tensor phases:

1. **Field skeleton** — sync/equalizing/blank structure is a pure function of
   (system, field parity); both parities are built once at trace time as
   constant (VRES, HRES) tensors plus a static write-mask (samples the
   skeleton does NOT write persist from the previous field — load-bearing:
   the active-video region of inactive lines and the last column are stale by
   design in the reference, and NES mode relies on skeleton persistence).
2. **Color burst** — per-line constants over the burst window from the
   (traced) hue via the vectorized 14-bit sine.
3. **Active video** — nearest-neighbor resample as one-hot MXU matmuls,
   RGB->YIQ int32 elementwise, per-line IIR bandlimit (serial along x,
   batched across lines — ops/filters.py), quadrature carrier multiply, IRE
   clamp, one static-slice scatter into the analog field.

All integer ops match the C bit-for-bit (truncating div, arithmetic shifts,
int32 wrap).  x/y offsets are static (the reference drivers never vary them
at runtime); everything else may be traced per frame.
"""

from __future__ import annotations

import functools
import os

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
from ntsc_crt_tpu.parallel import spatial


def _b(x, B):
    """Broadcast a scalar-or-(B,) traced parameter to (B,) int32."""
    return jnp.broadcast_to(i32(x), (B,))


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


@functools.lru_cache(maxsize=16)
def video_rows_mask(cfg: SystemConfig) -> np.ndarray:
    rows = np.ones(cfg.vres, bool)
    for lo, hi in (cfg.equ_a, cfg.sync_region, cfg.equ_b):
        rows[lo:hi + 1] = False
    return rows


def _dest_size(cfg: SystemConfig, raw: bool, img_w: int, img_h: int,
               do_bloom: bool = False):
    """destw/desth sizing (crt_ntsc.c:148-173)."""
    if do_bloom:
        destw = (cfg.av_len * 55500) >> 16
        desth = (cfg.lines * 63500) >> 16
        if raw:
            destw = min(img_w, destw)
            desth = min(img_h, desth)
        return destw, desth
    destw, desth = cfg.av_len, (cfg.lines * 64500) >> 16
    if raw:
        destw = min(img_w, cfg.av_len)
        desth = min(img_h, (cfg.lines * 64500) >> 16)
    return destw, desth


def _resample(cfg: SystemConfig, img_u8, sy, destw):
    """Nearest-neighbor image resample via one-hot MXU matmuls.
    img_u8 (B, h, w, 3), sy (B, desth) traced -> int32 (B, desth, destw, 3)."""
    w = img_u8.shape[2]
    sx = (np.arange(destw, dtype=np.int64) * w) // destw
    rows = fastpath.select_rows_batched(img_u8, sy)      # (B, desth, w, 3)
    return fastpath.select_cols_static(rows.astype(jnp.uint8), sx)


def _resample_planes(cfg: SystemConfig, img_u8, sy, destw):
    """Per-channel variant of _resample for the fused encode kernel: three
    (B, desth, destw) uint8 planes, each its own one-hot column matmul, so
    the interleaved (B, desth, destw, 3) tensor and the strided plane-split
    pass over it (~0.9 ms/step at PV1K batch 256) never materialize."""
    w = img_u8.shape[2]
    sx = (np.arange(destw, dtype=np.int64) * w) // destw
    onehot = np.zeros((w, destw), np.float32)
    onehot[sx, np.arange(destw)] = 1
    dt = fastpath._mm_dtype()
    oh = jnp.asarray(onehot, dt)
    rows = fastpath.select_rows_batched(img_u8, sy)       # (B, desth, w, 3)
    rows = rows.astype(jnp.uint8)
    # "plane"/"planeT" pins (utils/layouts.py): the resample convolution
    # emits batch-minor {0,2,1} planes, then XLA copies them row-major for
    # the flat reshape AND transposes them again into encode_fused's
    # sample-major tiling (~1.7 ms/step of copies on PV1K).  "plane" pins
    # row-major at the producer; "planeT" pins sample-major end to end.
    from ntsc_crt_tpu.utils import layouts as _lay
    return tuple(
        _lay.pin(_lay.pin(
            jnp.einsum("bhw,wd->bhd", rows[..., c].astype(dt), oh,
                       preferred_element_type=jnp.float32).astype(jnp.uint8),
            "plane", (0, 1, 2)), "planeT", (2, 0, 1))
        for c in range(3))


def _planes_for_kernel(cfg, img_u8, sy, destw, tag=None):
    """Inputs for the fused encode kernel: (r/g/b planes, col_map).

    Default: the NARROW row-resampled (B, desth, w) planes plus the static
    nearest-neighbor column map (crt_ntsc.c:296-305 `x*w/destw`), resolved
    inside the kernel as static-index VMEM reads (encode_fused col_map) —
    the wide one-hot resample matmuls, their (B, desth, destw) outputs
    (90 MB/plane at PV1K batch 256) and every relayout copy between them
    and the kernel never materialize (~3.5 ms/step on PV1K, docs/PERF.md
    r5).  NTSC_CRT_ENC_RESAMPLE=0 restores the wide-plane matmul path for
    A/B.

    Interpret-mode dispatches (CPU tests) keep the wide-plane path: the
    col_map kernel python-unrolls all T samples (static VMEM indices), and
    interpret mode inlines that unroll into the host XLA graph per grid
    row-block — a compile-time blowup with no coverage benefit (the unroll
    logic has a direct tiny-geometry test in test_pallas_kernels, and the
    device parity gate pins the compiled col_map kernel against the
    portable CPU goldens on the bench chip)."""
    if (os.environ.get("NTSC_CRT_ENC_RESAMPLE", "") == "0"
            or filters._pallas_interpret()):
        planes, cmap = _resample_planes(cfg, img_u8, sy, destw), None
    else:
        w = img_u8.shape[2]
        cmap = tuple(int(v) for v in
                     (np.arange(destw, dtype=np.int64) * w) // destw)
        rows = fastpath.select_rows_batched(img_u8, sy).astype(jnp.uint8)
        planes = tuple(rows[..., c] for c in range(3))
    if tag is not None:
        planes = tuple(spatial.shard_lines(p, 1, tag=tag) for p in planes)
    return planes, cmap


def _rgb_to_yiq(pix):
    """crt_ntsc.c:307-310 — int32 elementwise."""
    rA, gA, bA = pix[..., 0], pix[..., 1], pix[..., 2]
    fy = (19595 * rA + 38470 * gA + 7471 * bA) >> 14
    fi = (39059 * rA - 18022 * gA - 21103 * bA) >> 14
    fq = (13894 * rA - 34275 * gA + 20382 * bA) >> 14
    return fy, fi, fq


def _bandlimit(cfg: SystemConfig, fy, fi, fq):
    """Per-line IIR bandlimit, serial along x (crt_ntsc.c:313-317)."""
    cY = filters.init_iir(cfg.l_freq, cfg.y_freq)
    cI = filters.init_iir(cfg.l_freq, cfg.i_freq)
    cQ = filters.init_iir(cfg.l_freq, cfg.q_freq)
    yiq = jnp.stack([fy, fi, fq], axis=-2)               # (B, desth, 3, destw)
    coefs = jnp.asarray([cY, cI, cQ], jnp.int32)
    yiq = filters.iir_lowpass(yiq, coefs[None, None, :])
    return yiq[..., 0, :], yiq[..., 1, :], yiq[..., 2, :]



def _encode_active_fused(cfg, planes, modI_rows, modQ_rows, gain, base,
                         xo: int, col_map=None):
    """Fused RGB->YIQ + IIR + carrier + IRE kernel dispatch
    (ops/pallas/encode_fused.py).  planes: 3-tuple of uint8 R/G/B planes —
    either (B, desth, destw) from _resample_planes, or the narrow
    (B, desth, w) source rows with `col_map` carrying the static column
    resample (see _planes_for_kernel); fed to the kernel so the s32 YIQ and
    s16 convert intermediates never touch HBM.  modI/Q_rows: int32
    (B, desth, cc) per-row carrier tables (phase sign premultiplied, cc = 4
    or 5); gain/base: int32 (B,).  Returns int8 (B, desth, destw)."""
    from ntsc_crt_tpu.ops.pallas import encode_fused as _ef
    r8, g8, b8 = planes
    B, desth, w_in = r8.shape
    destw = w_in if col_map is None else len(col_map)
    cc = modI_rows.shape[-1]
    if cfg.do_bandlimiting:
        coefs = (filters.init_iir(cfg.l_freq, cfg.y_freq),
                 filters.init_iir(cfg.l_freq, cfg.i_freq),
                 filters.init_iir(cfg.l_freq, cfg.q_freq))
    else:
        coefs = None
    R = B * desth
    interp = filters._pallas_interpret()
    xo_mod = xo % cc
    out = spatial.shard_rows_call(
        lambda r_, g8_, b8_, mi_, mq_, g_, b_: _ef.encode_fused_rows(
            r_, g8_, b8_, mi_, mq_, g_, b_, coefs=coefs, xo_mod=xo_mod,
            rgb=True, interpret=interp, col_map=col_map),
        r8.reshape(R, w_in), g8.reshape(R, w_in), b8.reshape(R, w_in),
        modI_rows.reshape(R, cc), modQ_rows.reshape(R, cc),
        jnp.broadcast_to(gain[:, None], (B, desth)).reshape(R),
        jnp.broadcast_to(base[:, None], (B, desth)).reshape(R))
    return out.reshape(B, desth, destw)


def _store_active(analog, ire, xo: int, yo: int):
    """Scatter the active block at (yo, xo) with the reference's FLAT
    indexing semantics (crt_ntsc.c:322: analog[(x+xo) + (y+yo)*HRES]):
    a row whose xo + destw exceeds HRES spills into the start of the next
    row; writes past the final row (UB in the reference) are clipped."""
    B, desth, destw = ire.shape
    V, H = analog.shape[1], analog.shape[2]
    spill = xo + destw - H
    if spill <= 0:
        # static pad + select instead of dynamic-update-slice: XLA fuses
        # this into one elementwise pass over the field buffer (a DUS on the
        # (B, V, H) buffer forces layout round-trip copies — measured 3x the
        # cost of the store itself on PV1K's 1920-wide field)
        rows = min(desth, V - yo)
        padded = jnp.pad(ire[:, :rows],
                         ((0, 0), (yo, V - yo - rows), (xo, H - xo - destw)))
        mask = np.zeros((V, H), bool)
        mask[yo:yo + rows, xo:xo + destw] = True
        return jnp.where(jnp.asarray(mask)[None], padded, analog)
    main_w = destw - spill
    rows = min(desth, V - yo)
    analog = analog.at[:, yo:yo + rows, xo:].set(ire[:, :rows, :main_w])
    rows2 = min(desth, V - yo - 1)
    analog = analog.at[:, yo + 1:yo + 1 + rows2, :spill].set(
        ire[:, :rows2, main_w:])
    return analog


def _ire_scale(cfg, fy, fi, fq, black_point, white_point):
    gain = cdiv(cfg.white_level * white_point, 100)[:, None, None]
    ire = cfg.black_level + black_point[:, None, None] + \
        (((fy + fi + fq) * gain) >> 10)                  # crt_ntsc.c:318
    return jnp.clip(ire, 0, 110).astype(jnp.int8)


# ---------------------------------------------------------------------------
# NTSC / NTSC-VHS (1D carrier tables + CC_PHASE sign, crt_ntsc.c)
# ---------------------------------------------------------------------------


def modulate_rgb(
    cfg: SystemConfig,
    analog: jax.Array,        # int8 (B, VRES, HRES) — persistent field buffer
    img: jax.Array,           # uint8 (B, h, w, 3) canonical RGB
    *,
    field, frame, hue, as_color=1,
    xoffset: int = 0, yoffset: int = 0,
    black_point=0, white_point=100,
    raw: bool = False, do_bloom: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns (analog', ccf') — ccf' is the encoder's burst export
    (iccf << 7, crt_ntsc.c:325-329), shape (B, cc_vper, cc_samples) int32."""
    assert cfg.kind == "rgb" and cfg.cc_samples == 4, "NTSC-family encoder"
    B = analog.shape[0]
    h, w = img.shape[1], img.shape[2]
    img_u8 = jnp.asarray(img, jnp.uint8)
    field = _b(field, B) & 1
    frame = _b(frame, B) & 1
    hue = _b(hue, B)
    black_point = _b(black_point, B)
    white_point = _b(white_point, B)
    CC = cfg.cc_samples

    destw, desth = _dest_size(cfg, raw, w, h, do_bloom)
    xo = (cfg.av_beg + xoffset + (cfg.av_len - destw) // 2) & ~3  # :203
    yo = cfg.top + yoffset + (cfg.lines - desth) // 2

    inv_phase = (field == frame).astype(jnp.int32)       # crt_ntsc.c:199
    if cfg.chroma_pattern == CHROMA_CHECKERED:
        ph = 1 - 2 * (inv_phase & 1)                     # CC_PHASE
    else:
        ph = jnp.ones((B,), jnp.int32)

    # carrier tables (B, CC) (crt_ntsc.c:174-188)
    k = jnp.arange(CC, dtype=jnp.int32)[None, :]
    n_ang = hue[:, None] + k * (360 // CC)
    burst_sn, _ = sincos14(cdiv((n_ang + cfg.hue_offset) * 8192, 180))
    modI_sn, _ = sincos14(cdiv(n_ang * 8192, 180))
    modQ_sn, _ = sincos14(cdiv((n_ang + cfg.q_offset) * 8192, 180))
    on = (_b(as_color, B) != 0)[:, None]
    ccburst = jnp.where(on, burst_sn >> 10, 0)
    ccmodI = jnp.where(on, modI_sn >> 10, 0)
    ccmodQ = jnp.where(on, modQ_sn >> 10, 0)

    # --- skeleton + burst ---------------------------------------------------
    skel_even, skel_odd, mask = build_skeletons(cfg)
    skel = jnp.where((field == 1)[:, None, None],
                     jnp.asarray(skel_odd), jnp.asarray(skel_even))
    analog = jnp.where(jnp.asarray(mask)[None], skel, analog)

    t = np.arange(cfg.burst_len, dtype=np.int32) + cfg.cb_beg
    if cfg.chroma_pattern == CHROMA_CHECKERED:
        cb_idx = (jnp.asarray(t)[None, :]
                  + inv_phase[:, None] * (CC // 2)) % CC  # (B, blen)
    else:
        cb_idx = jnp.broadcast_to(jnp.asarray(t % CC)[None, :],
                                  (B, cfg.burst_len))
    burst_vals = (cfg.blank_level +
                  fastpath.onehot_pick(ccburst[:, None, :], cb_idx)
                  * cfg.burst_level) >> 5
    vrows = jnp.asarray(video_rows_mask(cfg))[None, :, None]
    seg = analog[:, :, cfg.cb_beg:cfg.cb_beg + cfg.burst_len]
    seg = jnp.where(vrows, burst_vals[:, None, :].astype(jnp.int8), seg)
    analog = analog.at[:, :, cfg.cb_beg:cfg.cb_beg + cfg.burst_len].set(seg)

    # iccf export: last burst write per phase class (crt_ntsc.c:249, 325-329)
    kk = jnp.arange(CC, dtype=jnp.int32)[None, :]
    if cfg.chroma_pattern == CHROMA_CHECKERED:
        icc_idx = (kk + inv_phase[:, None] * (CC // 2)) % CC
    else:
        icc_idx = jnp.broadcast_to(kk, (B, CC))
    iccf = (cfg.blank_level +
            fastpath.onehot_pick(ccburst[:, None, :], icc_idx)
            * cfg.burst_level) >> 5
    ccf = jnp.broadcast_to((iccf << 7)[:, None, :],
                           (B, cfg.cc_vper, CC)).astype(jnp.int32)

    # --- active video --------------------------------------------------------
    y_idx = jnp.arange(desth, dtype=jnp.int32)[None, :]
    field_offset = cdiv(cdiv(field * h + desth, desth), 2)[:, None]
    sy = (y_idx * h) // desth + field_offset             # (B, desth)
    # C clamps sy to h (reads one row past the image, UB); we use last row
    sy = jnp.minimum(sy, h - 1)

    gain = cdiv(cfg.white_level * white_point, 100)
    base = cfg.black_level + black_point
    if filters._use_pallas():
        planes, cmap = _planes_for_kernel(cfg, img_u8, sy, destw,
                                          tag="enc_rgb")
        mi_rows = jnp.broadcast_to((ccmodI * ph[:, None])[:, None, :],
                                   (B, desth, CC))
        mq_rows = jnp.broadcast_to((ccmodQ * ph[:, None])[:, None, :],
                                   (B, desth, CC))
        ire = _encode_active_fused(cfg, planes, mi_rows, mq_rows,
                                   gain, base, xo, col_map=cmap)
    else:
        pix = _resample(cfg, img_u8, sy, destw)
        fy, fi, fq = _rgb_to_yiq(pix)
        fy = spatial.shard_lines(fy, 1, tag="enc_y")
        if cfg.do_bandlimiting:
            fy, fi, fq = _bandlimit(cfg, fy, fi, fq)
        # xoff pattern is static (xo static): periodic with offset xo % CC
        mI = fastpath.tile_period(ccmodI, destw, xo % CC)[:, None, :]
        mQ = fastpath.tile_period(ccmodQ, destw, xo % CC)[:, None, :]
        fi = (fi * ph[:, None, None] * mI) >> 4          # crt_ntsc.c:316
        fq = (fq * ph[:, None, None] * mQ) >> 4
        ire = _ire_scale(cfg, fy, fi, fq, black_point, white_point)
    ire = spatial.shard_lines(ire, 1, tag="enc_ire")
    analog = _store_active(analog, ire, xo, yo)
    return analog, ccf


def modulate_vhs(
    cfg: SystemConfig,
    analog: jax.Array,
    img: jax.Array,
    randstate: jax.Array,     # (B,) crt_rand state (shared with decode noise)
    *,
    field, frame, hue, as_color=1, xoffset: int = 0, yoffset: int = 0,
    black_point=0, white_point=100, raw: bool = False,
    do_aberration=0, do_bloom: bool = False,
):
    """crt_ntscvhs.c:128-337.  Identical to the NTSC path except: a random
    6-17 line region at the bottom loses its sync tips (head switching,
    :234-238), the persistent hsync estimate is zeroed each frame (:258,
    handled by pipeline.modulate), and the ccf export is zeroed (:330-335).
    do_bloom: CRT_DO_BLOOM destination sizing (crt_ntscvhs.c:149-156).

    Returns (analog', ccf_zero, randstate')."""
    from ntsc_crt_tpu.ops import lcg as _lcg

    B = analog.shape[0]
    analog, _ = modulate_rgb(
        cfg, analog, img, field=field, frame=frame, hue=hue,
        as_color=as_color, xoffset=xoffset, yoffset=yoffset,
        black_point=black_point, white_point=white_point, raw=raw,
        do_bloom=do_bloom)

    do_ab = (_b(do_aberration, B) != 0)
    rs = _b(randstate, B)
    rs_next = _lcg.crt_rand_step(rs)
    rv = _lcg.crt_rand_out(lax.bitcast_convert_type(rs_next, jnp.uint32))
    aberration = jnp.where(do_ab, (crem(rv, 12) - 8) + 14, 0)
    randstate = jnp.where(do_ab, rs_next, rs)

    V, H = cfg.vres, cfg.hres
    rows = jnp.arange(V, dtype=jnp.int32)[None, :, None]
    cols = jnp.arange(H, dtype=jnp.int32)[None, None, :]
    kill = (jnp.asarray(video_rows_mask(cfg))[None, :, None]
            & (rows >= (V - aberration[:, None, None]))
            & (cols < cfg.bw_beg))
    analog = jnp.where(kill, jnp.int8(cfg.blank_level), analog)

    ccf = jnp.zeros((B, cfg.cc_vper, cfg.cc_samples), jnp.int32)
    return analog, ccf, randstate


# ---------------------------------------------------------------------------
# SNES / TEMPLATE / PV1K: per-line vertical chroma phase (2D carrier tables)
# ---------------------------------------------------------------------------


def modulate_vper(
    cfg: SystemConfig,
    analog: jax.Array,
    img: jax.Array,
    *,
    field, frame, hue, as_color=1, xoffset: int = 0, yoffset: int = 0,
    black_point=0, white_point=100, raw: bool = False,
    dot_crawl_offset=0, do_bloom: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """crt_snes.c:125-327 / crt_template.c:125-337 / crt_pv1k.c:121-321.

    Differences from the NTSC path: carrier/burst tables are 2D
    [cc_vper][cc_samples] with a per-line vertical phase advance (dot crawl),
    burst hue offset `(n - step + hue_offset)`, per-line table row
    `(y + yo) % cc_vper` instead of a CC_PHASE sign flip, and xo aligned to
    cc_samples (same as &~3 for 4, different for PV1K's 5).  do_bloom
    reproduces the CRT_DO_BLOOM encode-destination sizing, identical in every
    RGB-family encoder (crt_snes.c:144-151, crt_pv1k.c:140-147,
    crt_template.c:144-151)."""
    assert cfg.kind == "rgb"
    B = analog.shape[0]
    H, V, CC, VP = cfg.hres, cfg.vres, cfg.cc_samples, cfg.cc_vper
    h, w = img.shape[1], img.shape[2]
    img_u8 = jnp.asarray(img, jnp.uint8)
    field = _b(field, B) & 1
    hue = _b(hue, B)
    dco = _b(dot_crawl_offset, B)
    black_point = _b(black_point, B)
    white_point = _b(white_point, B)

    destw, desth = _dest_size(cfg, raw, w, h, do_bloom)
    xo = cfg.av_beg + xoffset + (cfg.av_len - destw) // 2
    xo = xo - (xo % CC)                                  # crt_snes.c:201
    yo = cfg.top + yoffset + (cfg.lines - desth) // 2

    # 2D carrier tables (B, VP, CC) (crt_snes.c:170-188)
    step = 360 // CC
    yv = jnp.arange(VP, dtype=jnp.int32)[None, :, None]
    xv = jnp.arange(CC, dtype=jnp.int32)[None, None, :]
    vert = (yv + dco[:, None, None]) * cfg.vert_step
    n_ang = vert + hue[:, None, None] + xv * step
    b_sn, _ = sincos14(cdiv((n_ang - step + cfg.hue_offset) * 8192, 180))
    i_sn, _ = sincos14(cdiv(n_ang * 8192, 180))
    q_sn, _ = sincos14(cdiv((n_ang + cfg.q_offset) * 8192, 180))
    on = (_b(as_color, B) != 0)[:, None, None]
    ccburst = jnp.where(on, b_sn >> 10, 0)
    ccmodI = jnp.where(on, i_sn >> 10, 0)
    ccmodQ = jnp.where(on, q_sn >> 10, 0)

    skel_even, skel_odd, mask = build_skeletons(cfg)
    skel = jnp.where((field == 1)[:, None, None],
                     jnp.asarray(skel_odd), jnp.asarray(skel_even))
    analog = jnp.where(jnp.asarray(mask)[None], skel, analog)

    # burst: row class n % VP, sample class t % CC — both static patterns
    t = np.arange(cfg.burst_len, dtype=np.int64) + cfg.cb_beg
    row_cls = np.arange(V, dtype=np.int64) % VP
    # ccburst[b, row_cls[n], t % CC] via static one-hot einsum
    sel = np.zeros((V, cfg.burst_len, VP, CC), np.float32)
    sel[np.arange(V)[:, None], np.arange(cfg.burst_len)[None, :],
        row_cls[:, None], (t % CC)[None, :]] = 1
    dt = fastpath._mm_dtype()
    burst_cb = jnp.einsum("bvc,ntvc->bnt", ccburst.astype(dt),
                          jnp.asarray(sel, dt),
                          preferred_element_type=jnp.float32).astype(jnp.int32)
    burst_vals = (cfg.blank_level + burst_cb * cfg.burst_level) >> 5  # (B,V,blen)
    vrows = jnp.asarray(video_rows_mask(cfg))[None, :, None]
    seg = analog[:, :, cfg.cb_beg:cfg.cb_beg + cfg.burst_len]
    seg = jnp.where(vrows, burst_vals.astype(jnp.int8), seg)
    analog = analog.at[:, :, cfg.cb_beg:cfg.cb_beg + cfg.burst_len].set(seg)

    # iccf[(n+3) % VP][k] written from class n % VP (crt_snes.c:239)
    src = np.asarray([(m - 3) % VP for m in range(VP)])
    iccf = (cfg.blank_level + ccburst[:, jnp.asarray(src), :]
            * cfg.burst_level) >> 5
    ccf = (iccf << 7).astype(jnp.int32)

    # active video
    y_idx = jnp.arange(desth, dtype=jnp.int32)[None, :]
    if cfg.interlace_offset:
        field_offset = cdiv(cdiv(field * h + desth, desth), 2)[:, None]
    else:
        field_offset = jnp.zeros((B, 1), jnp.int32)      # SNES: field unused
    sy = jnp.minimum((y_idx * h) // desth + field_offset, h - 1)

    if filters._use_pallas():
        planes, cmap = _planes_for_kernel(cfg, img_u8, sy, destw,
                                          tag="enc_rgb")
        # per-row carrier tables selected by the line's vertical phase class
        phr = jnp.asarray((np.arange(desth, dtype=np.int64) + yo) % VP)
        mi_rows = jnp.take(ccmodI, phr, axis=1)          # (B, desth, CC)
        mq_rows = jnp.take(ccmodQ, phr, axis=1)
        gain = cdiv(cfg.white_level * white_point, 100)
        base = cfg.black_level + black_point
        ire = _encode_active_fused(cfg, planes, mi_rows, mq_rows,
                                   gain, base, xo, col_map=cmap)
        analog = _store_active(analog, ire, xo, yo)
        return analog, ccf

    pix = _resample(cfg, img_u8, sy, destw)
    fy, fi, fq = _rgb_to_yiq(pix)
    fy = spatial.shard_lines(fy, 1, tag="enc_y")
    if cfg.do_bandlimiting:
        fy, fi, fq = _bandlimit(cfg, fy, fi, fq)

    # ccmod[ph_row[y], xoff[x]]: ph_row static ((y+yo)%VP), xoff static
    ph_row = (np.arange(desth, dtype=np.int64) + yo) % VP
    xoff = (np.arange(destw, dtype=np.int64) + xo) % CC
    sel2 = np.zeros((desth, destw, VP, CC), np.float32)
    sel2[np.arange(desth)[:, None], np.arange(destw)[None, :],
         ph_row[:, None], xoff[None, :]] = 1
    sel2j = jnp.asarray(sel2, dt)
    mI = jnp.einsum("bvc,ydvc->byd", ccmodI.astype(dt), sel2j,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    mQ = jnp.einsum("bvc,ydvc->byd", ccmodQ.astype(dt), sel2j,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    fi = (fi * mI) >> 4                                  # crt_snes.c:310-311
    fq = (fq * mQ) >> 4
    ire = _ire_scale(cfg, fy, fi, fq, black_point, white_point)
    ire = spatial.shard_lines(ire, 1, tag="enc_ire")
    analog = _store_active(analog, ire, xo, yo)
    return analog, ccf


# ---------------------------------------------------------------------------
# NESRGB: RGB input with NES timing/artifacts, no bandlimiting
# ---------------------------------------------------------------------------


def modulate_nesrgb(
    cfg: SystemConfig,
    analog: jax.Array,
    img: jax.Array,
    *,
    hue, dot_crawl_offset=0, xoffset: int = 0, yoffset: int = 0,
    black_point=0, white_point=100,
) -> tuple[jax.Array, jax.Array]:
    """crt_nesrgb.c:49-170.  NES-style skeleton (reapplied every call —
    idempotent, equivalent to the reference's run-once setup_field since the
    active region is rewritten each frame), burst only on active lines,
    carrier tables exclude hue (burst angle hue+90+n+33), no IIR."""
    B = analog.shape[0]
    H, V, CC, VP = cfg.hres, cfg.vres, cfg.cc_samples, cfg.cc_vper
    h, w = img.shape[1], img.shape[2]
    img_u8 = jnp.asarray(img, jnp.uint8)
    hue = _b(hue, B)
    dco = _b(dot_crawl_offset, B)
    black_point = _b(black_point, B)
    white_point = _b(white_point, B)

    destw, desth = cfg.av_len, cfg.lines                 # crt_nesrgb.c:53-54
    xo = (cfg.av_beg + xoffset) & ~3
    yo = cfg.top + yoffset

    step = 360 // CC
    yv = jnp.arange(VP, dtype=jnp.int32)[None, :, None]
    xv = jnp.arange(CC, dtype=jnp.int32)[None, None, :]
    n_ang = (yv + dco[:, None, None]) * cfg.vert_step + xv * step
    b_sn, _ = sincos14(cdiv((hue[:, None, None] + 90 + n_ang + 33) * 8192, 180))
    i_sn, _ = sincos14(cdiv(n_ang * 8192, 180))
    q_sn, _ = sincos14(cdiv((n_ang - 90) * 8192, 180))
    ccburst, ccmodI, ccmodQ = b_sn >> 10, i_sn >> 10, q_sn >> 10

    analog = jnp.broadcast_to(jnp.asarray(build_skeleton_nes(cfg))[None],
                              (B, V, H))

    # burst + iccf on active rows only (crt_nesrgb.c:104-109)
    dt = fastpath._mm_dtype()
    t = np.arange(cfg.burst_len, dtype=np.int64) + cfg.cb_beg
    row_cls = (np.arange(desth, dtype=np.int64) + yo) % VP
    sel = np.zeros((desth, cfg.burst_len, VP, CC), np.float32)
    sel[np.arange(desth)[:, None], np.arange(cfg.burst_len)[None, :],
        row_cls[:, None], (t % CC)[None, :]] = 1
    burst_cb = jnp.einsum("bvc,ytvc->byt", ccburst.astype(dt),
                          jnp.asarray(sel, dt),
                          preferred_element_type=jnp.float32).astype(jnp.int32)
    burst_vals = ((cfg.blank_level + burst_cb * cfg.burst_level) >> 5)
    analog = analog.at[:, yo:yo + desth,
                       cfg.cb_beg:cfg.cb_beg + cfg.burst_len].set(
        burst_vals.astype(jnp.int8))

    iccf = (cfg.blank_level + ccburst * cfg.burst_level) >> 5  # class m == m
    ccf = (iccf << 7).astype(jnp.int32)

    y_idx = jnp.arange(desth, dtype=jnp.int32)[None, :]
    sy = jnp.clip((y_idx * h) // desth, 0, h - 1)
    sy = jnp.broadcast_to(sy, (B, desth))

    if filters._use_pallas() and CC == 4:
        planes, cmap = _planes_for_kernel(cfg, img_u8, sy, destw)
        phr = jnp.asarray((np.arange(desth, dtype=np.int64) + yo) % VP)
        mi_rows = jnp.take(ccmodI, phr, axis=1)
        mq_rows = jnp.take(ccmodQ, phr, axis=1)
        gain = cdiv(cfg.white_level * white_point, 100)
        base = cfg.black_level + black_point
        ire = _encode_active_fused(cfg, planes, mi_rows, mq_rows,
                                   gain, base, xo, col_map=cmap)
        analog = _store_active(analog, ire, xo, yo)
        return analog, ccf

    pix = _resample(cfg, img_u8, sy, destw)
    fy, fi, fq = _rgb_to_yiq(pix)

    ph_row = (np.arange(desth, dtype=np.int64) + yo) % VP
    xoff = (np.arange(destw, dtype=np.int64) + xo) % CC
    sel2 = np.zeros((desth, destw, VP, CC), np.float32)
    sel2[np.arange(desth)[:, None], np.arange(destw)[None, :],
         ph_row[:, None], xoff[None, :]] = 1
    sel2j = jnp.asarray(sel2, dt)
    mI = jnp.einsum("bvc,ydvc->byd", ccmodI.astype(dt), sel2j,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    mQ = jnp.einsum("bvc,ydvc->byd", ccmodQ.astype(dt), sel2j,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    fi = (fi * mI) >> 4                                  # crt_nesrgb.c:155-156
    fq = (fq * mQ) >> 4
    ire = _ire_scale(cfg, fy, fi, fq, black_point, white_point)
    analog = _store_active(analog, ire, xo, yo)
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
                continue
            v = int(((hue + phase) % 12) < 6)
            e = int(((p & 0o700) & _NES_ACTIVE[(phase >> 1) % 6]) > 0)
            l = 1 if hue == 0x00 else (0 if hue == 0x0D else v)
            tab[p, phase] = int(_NES_IRE[(l << 3) + (e << 2) + ((p >> 4) & 3)])
    return tab


def _wrap_i8(x: jax.Array) -> jax.Array:
    """C signed-char assignment semantics (wrap mod 256): the NES encoder
    stores unclamped IRE sums (crt_nes.c:190-191)."""
    return (((x + 128) & 255) - 128).astype(jnp.int8)


# IRE table as [l][e][lum] for the bilinear decomposition below
_NES_T = _NES_IRE.reshape(2, 2, 4).astype(np.int64)
_NES_D10 = _NES_T[1, 0] - _NES_T[0, 0]
_NES_D01 = _NES_T[0, 1] - _NES_T[0, 0]
_NES_D11 = _NES_T[1, 1] - _NES_T[1, 0] - _NES_T[0, 1] + _NES_T[0, 0]


def _nes_square_sum4(p, phase0):
    """sum_{j<4} square_sample(p, phase0 + j) (crt_nes.c:21-61), exact.

    square_sample is IRE[(l<<3) + (e<<2) + lum], bilinear in the bits
    (l, e) for fixed lum, so the 4-phase sum collapses to

        S = 4*T00[lum] + L*(T10-T00)[lum] + E*(T01-T00)[lum]
            + LE*(T11-T10-T01+T00)[lum]

    with L = sum l_j, E = sum e_j, LE = sum l_j*e_j over the 4 phases.
    Each lum table is itself bilinear in lum's two bits, and the active
    emphasis masks {0300,0100,0500,0400,0600,0200} (crt_nes.c:26-30) reduce
    to three comparisons on k = (phase>>1) % 6: bit6 <=> k<=2,
    bit7 <=> k==0 or k>=4, bit8 <=> 2<=k<=4.  The whole sum is ~35 cheap
    elementwise int32 ops — no wide one-hot table picks.

    p, phase0: broadcastable non-negative int32 arrays.  No clamp: the C
    accumulates the raw sum (|S| <= 4*112965, wrap-free in int32)."""
    hue_p = p & 0x0F
    lum0 = (p >> 4) & 1
    lum1 = (p >> 5) & 1
    lum01 = lum0 & lum1
    e6 = (p >> 6) & 1
    e7 = (p >> 7) & 1
    e8 = (p >> 8) & 1
    is0 = (hue_p == 0x00).astype(jnp.int32)
    not13 = (hue_p != 0x0D).astype(jnp.int32)

    def blin(t):  # exact bilinear-in-lum-bits evaluation of a 4-entry table
        c0, c1, c2, c3 = (int(t[0]), int(t[1] - t[0]), int(t[2] - t[0]),
                          int(t[3] - t[2] - t[1] + t[0]))
        return c0 + c1 * lum0 + c2 * lum1 + c3 * lum01

    t00 = blin(_NES_T[0, 0])
    d10 = blin(_NES_D10)
    d01 = blin(_NES_D01)
    d11 = blin(_NES_D11)

    u = crem(phase0, 12)                      # phase >= 0 in every caller
    z = hue_p + u                             # <= 26: two range reductions
    z = z - jnp.where(z >= 12, 12, 0)
    z = z - jnp.where(z >= 12, 12, 0)

    L = E = LE = jnp.zeros((), jnp.int32)
    for j in range(4):
        mj = u + j
        mj = mj - jnp.where(mj >= 12, 12, 0)
        k = mj >> 1                           # (phase>>1) % 6
        zj = z + j
        v = ((zj - jnp.where(zj >= 12, 12, 0)) < 6).astype(jnp.int32)
        a6 = (k <= 2).astype(jnp.int32)
        a7 = ((k == 0) | (k >= 4)).astype(jnp.int32)
        a8 = ((k >= 2) & (k <= 4)).astype(jnp.int32)
        e = (e6 & a6) | (e7 & a7) | (e8 & a8)
        l = is0 | (v & not13)
        L = L + l
        E = E + e
        LE = LE + (l & e)

    total = (t00 << 2) + L * d10 + E * d01 + LE * d11
    return jnp.where(hue_p >= 0x0E, 0, total)  # black columns


def modulate_nes(
    cfg: SystemConfig,
    analog: jax.Array,
    ppu: jax.Array,           # uint16 (B, h, w) NES PPU pixels (6 or 9 bit)
    *,
    hue, dot_crawl_offset=0, xoffset: int = 0, yoffset: int = 0,
    black_point=0, white_point=100,
    border_color=0, draw_border: bool = False,
    optimized: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """crt_nes.c:106-201 (the optimized path; bit-identical output).

    Square-wave synthesis, gather-free: PPU indices resampled via one-hot
    f32 matmuls, square_sample evaluated arithmetically.  draw_border
    renders the PPU border region (NES_BORDER, crt_nes.c:138-161).
    optimized=False reproduces the NES_OPTIMIZED=0 build instead
    (crt_nes.c:204-308), whose only output difference is that the color
    burst is written on EVERY non-vsync line (0..258), not just the active
    rows — the optimized build's cached skeleton leaves blanking-line burst
    regions blank."""
    assert cfg.kind == "nes"
    B = analog.shape[0]
    H, V, CC, VP = cfg.hres, cfg.vres, cfg.cc_samples, cfg.cc_vper
    h, w = ppu.shape[1], ppu.shape[2]
    ppu = jnp.asarray(ppu, jnp.int32) & 0x1FF
    hue = _b(hue, B)
    dco = _b(dot_crawl_offset, B)
    black_point = _b(black_point, B)
    white_point = _b(white_point, B)

    destw, desth = cfg.av_len, cfg.lines
    xo = (cfg.av_beg + xoffset) & ~3
    yo = cfg.top + yoffset

    # burst table (crt_nes.c:123-130): note the % 360 before the angle scale
    yv = jnp.arange(VP, dtype=jnp.int32)[None, :, None]
    xv = jnp.arange(CC, dtype=jnp.int32)[None, None, :]
    n_ang = crem(hue[:, None, None] + xv * (360 // CC)
                 + (yv + dco[:, None, None]) * cfg.vert_step + 33, 360)
    b_sn, _ = sincos14(cdiv(n_ang * 8192, 180))
    ccburst = b_sn >> 10

    analog = jnp.broadcast_to(jnp.asarray(build_skeleton_nes(cfg))[None],
                              (B, V, H))

    dt = fastpath._mm_dtype()
    t = np.arange(cfg.burst_len, dtype=np.int64) + cfg.cb_beg
    if optimized:
        brow0, brows = yo, desth           # active rows only (crt_nes.c:174)
    else:
        brow0, brows = 0, 259              # every non-vsync line (:249-253)
    row_cls = (np.arange(brows, dtype=np.int64) + brow0) % VP
    sel = np.zeros((brows, cfg.burst_len, VP, CC), np.float32)
    sel[np.arange(brows)[:, None], np.arange(cfg.burst_len)[None, :],
        row_cls[:, None], (t % CC)[None, :]] = 1
    burst_cb = jnp.einsum("bvc,ytvc->byt", ccburst.astype(dt),
                          jnp.asarray(sel, dt),
                          preferred_element_type=jnp.float32).astype(jnp.int32)
    burst_vals = (cfg.blank_level + burst_cb * cfg.burst_level) >> 5
    analog = analog.at[:, brow0:brow0 + brows,
                       cfg.cb_beg:cfg.cb_beg + cfg.burst_len].set(
        burst_vals.astype(jnp.int8))

    iccf = (cfg.blank_level + ccburst * cfg.burst_level) >> 5
    ccf = (iccf << 7).astype(jnp.int32)

    # active video: nearest-neighbor resample of PPU indices via one-hot
    # f32 matmuls (indices < 512 are f32-exact), then square_sample
    # (crt_nes.c:21-61) evaluated arithmetically — elementwise ops and
    # small masked reductions only, no table gathers.
    y_idx = np.arange(desth, dtype=np.int64)
    sy = np.minimum((y_idx * h) // desth, h - 1)         # static (progressive)
    sx = (np.arange(destw, dtype=np.int64) * w) // destw
    rsel = np.zeros((desth, h), np.float32)
    rsel[np.arange(desth), sy] = 1
    csel = np.zeros((w, destw), np.float32)
    csel[sx, np.arange(destw)] = 1
    row_identity = desth == h and np.array_equal(sy, np.arange(h))
    dt = fastpath._mm_dtype()
    if dt == jnp.bfloat16:
        # PPU indices reach 511 > bf16's exact integer range (256); split
        # into (low byte, high bit) limb planes so each one-hot matmul is
        # bf16-exact — 2 full-rate MXU passes instead of a 6-pass f32 dot
        limbs = jnp.stack([ppu & 0xFF, ppu >> 8], axis=-1).astype(dt)
        if not row_identity:
            limbs = jnp.einsum("yh,bhwk->bywk", jnp.asarray(rsel, dt), limbs,
                               preferred_element_type=jnp.float32).astype(dt)
        r = jnp.einsum("bywk,wd->bydk", limbs, jnp.asarray(csel, dt),
                       preferred_element_type=jnp.float32).astype(jnp.int32)
        p = r[..., 0] + (r[..., 1] << 8)
    else:
        # CPU: a single f32 dot is exact for indices <= 2^24
        x = ppu.astype(jnp.float32)
        if not row_identity:
            x = jnp.einsum("yh,bhw->byw", jnp.asarray(rsel), x,
                           preferred_element_type=jnp.float32)
        p = jnp.einsum("byw,wd->byd", x, jnp.asarray(csel),
                       preferred_element_type=jnp.float32).astype(jnp.int32)

    phasetab = jnp.asarray(_NES_PHASETAB, jnp.int32)

    if draw_border:
        # PPU border (NES_BORDER, crt_nes.c:138-161): rows TOP..BOT+2,
        # columns LAV_BEG..HRES, drawn BEFORE the active video overwrites
        # the middle; the first border column carries pixel 0xf0.
        nb0, nb1 = cfg.top, cfg.bot + 3                  # inclusive..exclusive
        bw = H - cfg.lav_beg
        nrows = nb1 - nb0
        phb = fastpath.onehot_pick(
            jnp.broadcast_to(phasetab[None, None, :], (B, nrows, VP)),
            crem(jnp.arange(nb0, nb1, dtype=jnp.int32)[None, :]
                 + dco[:, None], VP)) + 6                # (B, nrows)
        tb = jnp.asarray(np.arange(bw, dtype=np.int64), jnp.int32)
        pb = jnp.where(tb[None, None, :] == 0, 0xF0,
                       _b(border_color, B)[:, None, None] & 0x1FF)
        ireb = _nes_square_sum4(pb, phb[..., None] + 3 * tb[None, None, :])
        ireb = cfg.black_level + black_point[:, None, None] + ireb
        ireb = cdiv(ireb * white_point[:, None, None], 100) >> 12
        analog = analog.at[:, nb0:nb1, cfg.lav_beg:].set(_wrap_i8(ireb))

    ph0 = fastpath.onehot_pick(
        jnp.broadcast_to(phasetab[None, None, :], (B, desth, VP)),
        crem(jnp.arange(desth, dtype=jnp.int32)[None, :] + yo
             + dco[:, None], VP))                        # (B, desth)
    xphase = 3 * jnp.asarray(np.arange(destw, dtype=np.int64) % 4,
                             jnp.int32)[None, None, :]
    ire = _nes_square_sum4(p, ph0[..., None] + xphase)
    ire = cfg.black_level + black_point[:, None, None] + ire
    ire = cdiv(ire * white_point[:, None, None], 100) >> 12  # crt_nes.c:190
    analog = _store_active(analog, _wrap_i8(ire), xo, yo)
    return analog, ccf
