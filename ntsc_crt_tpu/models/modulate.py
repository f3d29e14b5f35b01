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
from ntsc_crt_tpu.ops import filters
from ntsc_crt_tpu.ops.fixedpoint import cdiv, crem, i32, sincos14


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
    img = jnp.asarray(img, jnp.int32)
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
    sx = jnp.asarray((x_idx * w) // destw)

    rows = jnp.take(img, sy, axis=0)                          # (desth, w, 3)
    pix = jnp.take(rows, sx, axis=1)                          # (desth, destw, 3)
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
