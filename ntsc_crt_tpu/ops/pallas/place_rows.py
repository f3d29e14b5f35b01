"""Pallas TPU kernel for uniform row placement (scan-conversion store).

The reference writes each decoded line into the output at `beg`, memcpy-
duplicates it up to `end - scanlines`, optionally 50/50-blending against the
previous frame's contents (crt_core.c:552-664).  The XLA formulation
(models/demodulate.py::_place_rows_uniform, stacked branch) is bit-exact but
XLA materializes it as three ~full-output elementwise passes (two slot
selects + the stacked interleave; docs/PERF.md "row placement"), ~1.8 ms/step
at batch 256 — pure HBM traffic.

This kernel emits the final interleaved output in ONE HBM pass: grid (B,) —
each step loads one batch element's decoded lines (L, w3) and previous output
viewed as (L, ratio, w3), computes every slot plane with the same static
select/blend logic as the XLA form, and stores them through strided VMEM
writes into the whole-group output block, which DMAs back contiguous.  Total
traffic is the lower bound: rgb + old read, out write — nothing else.

STATUS: OPT-IN ONLY (NTSC_CRT_PLACE_KERNEL=1).  On-device A/B at 640x480
batch 256 measured a 25% end-to-end regression vs the stacked XLA form
(PV1K 7,574 vs 10,044 fps/chip): the lower-bound HBM traffic does not pay
for losing XLA's cross-op fusion around the (B,)-grid's per-step strided
slot stores.  See docs/PERF.md r3 negative results.

The whole line dim L rides one block, so the odd-field row shift
(line k reads line k-1 for slots j < fp, crt_core.c:404-407 via the
field_px offset) is a VMEM-local concat — no halo, which is also why this
kernel is gated off under spatial line-sharding (the XLA form handles that
regime; parallel/spatial.py:16-18).

Bit-exactness: identical select/blend arithmetic to _place_rows_uniform
(values stay < 256; the 50/50 blend is (c>>1)+(o>>1) <= 254), asserted
exhaustively against it in interpret mode over ratio/blend/scanlines/field
combinations (tests/test_pallas_kernels.py) and on-device by the bench
tpu_parity goldens.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(fld_ref, rgb_ref, old_ref, out_ref, *,
            blend: int, scanlines: int, ratio: int, fp: int, L: int):
    fb = fld_ref[pl.program_id(0)] > 0       # this element's field bit

    rgb = rgb_ref[0]                         # (L, w3) uint8
    if fp:
        rgbm1 = jnp.concatenate([rgb[:1], rgb[:-1]], axis=0)
    if blend:
        ob0 = old_ref[0, :, 0, :]            # slot-0 beg rows (even field)
        if fp:
            obf = old_ref[0, :, fp, :]       # slot-fp beg rows (odd field)
            obfm1 = jnp.concatenate([obf[:1], obf[:-1]], axis=0)

    kidx = lax.broadcasted_iota(jnp.int32, (L, 1), 0)
    for j in range(ratio):
        shift_j = fp > 0 and j < fp          # slot reads line k-1 (odd field)
        src = jnp.where(fb, rgbm1, rgb) if shift_j else rgb
        if blend:
            if fp:
                old_beg = jnp.where(fb, obfm1 if shift_j else obf, ob0)
            else:
                old_beg = ob0
            # Mosaic has no 8-bit vector add: widen in-register (the VMEM
            # traffic stays u8); (c>>1)+(o>>1) <= 254 so the u8 store is
            # exact.  int16, not int32: the widened (L, w3) temporaries are
            # the kernel's scoped-vmem stack, and at 640x480 shapes
            # (w3=1920, L=240) the int32 form blew the 16 MB scoped limit
            # (21.93M requested) in the driver's compile environment.
            src = ((src.astype(jnp.int16) >> 1) +
                   (old_beg.astype(jnp.int16) >> 1)).astype(jnp.uint8)
        # scanline-gap mask: the slot keeps the previous contents when its
        # row index relative to the (possibly field-shifted) group start
        # falls in the last `scanlines` rows of the group (crt_core.c:661-664)
        ks = jnp.where(fb, ((j - fp) % ratio) >= ratio - scanlines,
                       j >= ratio - scanlines)
        keep = jnp.broadcast_to(ks, (L, 1))
        if fp > 0 and j < fp:
            # rows with rel < 0 under the odd-field shift keep old (group 0)
            keep = keep | ((kidx == 0) & fb)
        if fp > 0 and j > fp and j >= ratio - scanlines:
            # bottom clip (crt_core.c:432): the last group's duplicate slots
            # stay untouched under the odd-field shift
            keep = keep | ((kidx == L - 1) & fb)
        out_ref[0, :, j, :] = jnp.where(keep, old_ref[0, :, j, :], src)


def _slot_planes(fb, rgb_t, rgbm1_t, ob0, obf, obfm1, old_tile, kidx, *,
                 blend: int, scanlines: int, ratio: int, fp: int, L: int):
    """Shared slot-plane math for the stacked-store variants: returns the
    (rows, ratio, w3) block as ONE jnp.stack (single contiguous store) —
    the r3 kernel's per-slot strided sublane stores are the prime suspect
    for its 25% regression.  Inputs are the (rows, w3) tile views; kidx is
    the (rows, 1) GLOBAL row index."""
    slots = []
    for j in range(ratio):
        shift_j = fp > 0 and j < fp          # slot reads line k-1 (odd field)
        src = jnp.where(fb, rgbm1_t, rgb_t) if shift_j else rgb_t
        if blend:
            if fp:
                old_beg = jnp.where(fb, obfm1 if shift_j else obf, ob0)
            else:
                old_beg = ob0
            src = ((src.astype(jnp.int16) >> 1) +
                   (old_beg.astype(jnp.int16) >> 1)).astype(jnp.uint8)
        ks = jnp.where(fb, ((j - fp) % ratio) >= ratio - scanlines,
                       j >= ratio - scanlines)
        keep = jnp.broadcast_to(ks, kidx.shape)
        if fp > 0 and j < fp:
            keep = keep | ((kidx == 0) & fb)
        if fp > 0 and j > fp and j >= ratio - scanlines:
            keep = keep | ((kidx == L - 1) & fb)
        slots.append(jnp.where(keep, old_tile[:, j, :], src))
    return jnp.stack(slots, axis=1)          # (rows, ratio, w3)


def _kernel_stacked(fld_ref, rgb_ref, old_ref, out_ref, *,
                    blend: int, scanlines: int, ratio: int, fp: int, L: int):
    """Grid (B,) like the r3 kernel, but the whole (L, ratio, w3) block is
    emitted in ONE store; all loads/stores static (Mosaic cannot lower
    dynamic-start sublane loads on int8 blocks, so the row-tiled variant
    below precomputes its halo planes in XLA instead of slicing here)."""
    fb = fld_ref[pl.program_id(0)] > 0       # this element's field bit
    rgb = rgb_ref[0]                         # (L, w3) uint8
    rgbm1 = jnp.concatenate([rgb[:1], rgb[:-1]], axis=0) if fp else None
    ob0 = obf = obfm1 = None
    if blend:
        ob0 = old_ref[0, :, 0, :]
        if fp:
            obf = old_ref[0, :, fp, :]
            obfm1 = jnp.concatenate([obf[:1], obf[:-1]], axis=0)
    kidx = lax.broadcasted_iota(jnp.int32, (L, 1), 0)
    out_ref[0] = _slot_planes(fb, rgb, rgbm1, ob0, obf, obfm1, old_ref[0],
                              kidx, blend=blend, scanlines=scanlines,
                              ratio=ratio, fp=fp, L=L)


def _kernel_rowtiled(fld_ref, rgb_ref, rgbm1_ref, ob0_ref, obf_ref,
                     obfm1_ref, old_ref, out_ref, *,
                     blend: int, scanlines: int, ratio: int, fp: int,
                     L: int, TL: int):
    """Multi-row grid (B, T): every ref is a (1, TL, ...) block at row tile
    t, so DMA in/out pipelines across the t axis with no dynamic slicing;
    the odd-field k-1 halo planes (rgbm1/obfm1) arrive precomputed."""
    fb = fld_ref[pl.program_id(0)] > 0
    t = pl.program_id(1)
    kidx = t * TL + lax.broadcasted_iota(jnp.int32, (TL, 1), 0)
    out_ref[0] = _slot_planes(
        fb, rgb_ref[0], rgbm1_ref[0] if fp else None,
        ob0_ref[0] if blend else None,
        obf_ref[0] if (blend and fp) else None,
        obfm1_ref[0] if (blend and fp) else None,
        old_ref[0], kidx, blend=blend, scanlines=scanlines,
        ratio=ratio, fp=fp, L=L)


@functools.partial(jax.jit, static_argnames=("blend", "scanlines", "ratio",
                                             "fp", "tile_rows", "interpret"))
def place_rows_uniform_tiled(rgb8, old, field_px, *, blend: int,
                             scanlines: int, ratio: int, fp: int,
                             tile_rows: int = 0, interpret: bool = False):
    """Stacked-store forms of place_rows_uniform (NTSC_CRT_PLACE_KERNEL=2).
    Same contract and bit-exactness obligations.  tile_rows=0: grid (B,),
    whole-L blocks, one store (pure store-pathology fix vs the r3 kernel).
    tile_rows>0: grid (B, T) with `tile_rows` output rows per step (snapped
    down to a divisor of L) and XLA-precomputed halo planes."""
    B, L, w, _ = rgb8.shape
    w3 = w * 3
    rgb = rgb8.reshape(B, L, w3)
    old4 = old.reshape(B, L, ratio, w3)
    vmem = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

    if not tile_rows:
        kern = functools.partial(_kernel_stacked, blend=int(blend),
                                 scanlines=int(scanlines), ratio=int(ratio),
                                 fp=int(fp), L=L)
        grp = pl.BlockSpec((1, L, ratio, w3), lambda b: (b, 0, 0, 0))
        out = pl.pallas_call(
            kern,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, L, w3), lambda b: (b, 0, 0)),
                grp,
            ],
            out_specs=grp,
            out_shape=jax.ShapeDtypeStruct((B, L, ratio, w3), jnp.uint8),
            compiler_params=vmem,
            interpret=interpret,
        )(field_px.astype(jnp.int32), rgb, old4)
        return out.reshape(B, ratio * L, w, 3)

    TL = max(d for d in range(1, min(tile_rows, L) + 1) if L % d == 0)
    # halo planes, one XLA concat each (fused into the producers; ~1 extra
    # read+write of a (B, L, w3) u8 plane per enabled halo)
    zero = jnp.zeros((B, 1, w3), jnp.uint8)
    rgbm1 = (jnp.concatenate([rgb[:, :1], rgb[:, :-1]], axis=1)
             if fp else zero)
    if blend:
        ob0 = old4[:, :, 0, :]
        obf = old4[:, :, fp, :] if fp else zero
        obfm1 = (jnp.concatenate([obf[:, :1], obf[:, :-1]], axis=1)
                 if fp else zero)
    else:
        ob0 = obf = obfm1 = zero
    row = pl.BlockSpec((1, TL, w3), lambda b, t: (b, t, 0))
    nul = pl.BlockSpec((1, 1, w3), lambda b, t: (b, 0, 0))
    grp = pl.BlockSpec((1, TL, ratio, w3), lambda b, t: (b, t, 0, 0))
    kern = functools.partial(_kernel_rowtiled, blend=int(blend),
                             scanlines=int(scanlines), ratio=int(ratio),
                             fp=int(fp), L=L, TL=TL)
    out = pl.pallas_call(
        kern,
        grid=(B, L // TL),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row,
            row if fp else nul,
            row if blend else nul,
            row if (blend and fp) else nul,
            row if (blend and fp) else nul,
            grp,
        ],
        out_specs=grp,
        out_shape=jax.ShapeDtypeStruct((B, L, ratio, w3), jnp.uint8),
        compiler_params=vmem,
        interpret=interpret,
    )(field_px.astype(jnp.int32), rgb, rgbm1, ob0, obf, obfm1, old4)
    return out.reshape(B, ratio * L, w, 3)


@functools.partial(jax.jit, static_argnames=("blend", "scanlines", "ratio",
                                             "fp", "interpret"))
def place_rows_uniform(rgb8, old, field_px, *, blend: int, scanlines: int,
                       ratio: int, fp: int, interpret: bool = False):
    """rgb8: (B, L, w, 3) uint8 decoded lines; old: (B, ratio*L, w, 3) uint8
    previous output; field_px: (B,) int32 (>0 = odd field).  Returns the new
    (B, ratio*L, w, 3) uint8 output.  blend/scanlines/ratio/fp static, as
    guaranteed by the uniform gate (demodulate.py::_place_rows)."""
    B, L, w, _ = rgb8.shape
    w3 = w * 3
    rgb = rgb8.reshape(B, L, w3)
    old4 = old.reshape(B, L, ratio, w3)

    kern = functools.partial(_kernel, blend=int(blend),
                             scanlines=int(scanlines), ratio=int(ratio),
                             fp=int(fp), L=L)
    grp = pl.BlockSpec((1, L, ratio, w3), lambda b: (b, 0, 0, 0))
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole (B,) field vector
            pl.BlockSpec((1, L, w3), lambda b: (b, 0, 0)),
            grp,
        ],
        out_specs=grp,
        out_shape=jax.ShapeDtypeStruct((B, L, ratio, w3), jnp.uint8),
        # headroom for the widened blend temporaries at large (L, ratio, w3)
        # blocks — the default 16 MB scoped limit is too tight at 640x480+
        # geometries (v5e VMEM is 128 MB; the blocks themselves are ~5 MB)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(field_px.astype(jnp.int32), rgb, old4)
    return out.reshape(B, ratio * L, w, 3)
