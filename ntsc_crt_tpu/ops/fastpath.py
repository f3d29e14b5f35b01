"""Gather-free TPU formulations of the demodulator's hot data movements.

TPU gathers execute at ~100 elements/us — catastrophic for the decoder's
per-line shifted reads and resampling.  Every routine here replaces a gather
with MXU work or static slicing, *bit-exactly*:

* per-row circular shift  -> depthwise cross-correlation with a one-hot
  kernel in bfloat16 (signal values |v| <= 127 and one-hot weights are both
  exact in bf16; each output sums exactly one nonzero product).
* batched row selection   -> one-hot bf16 matmul (uint8 pixel values <= 255
  are bf16-exact).
* periodic wave indexing  -> tiling, no indexing at all.

These run on any backend (they are plain XLA ops), so CPU parity tests cover
them directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _mm_dtype():
    """bf16 feeds the MXU at full rate on TPU; CPU's dot thunk needs f32.
    Both are exact here: every product has a {0,1} factor and |values| fit
    the 8-bit bf16 mantissa (<= 256) where bf16 is used."""
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def shift_rows(ext: jax.Array, shifts: jax.Array, out_len: int,
               max_shift: int | None = None) -> jax.Array:
    """out[r, i] = ext[r, shifts[r] + i] for i < out_len, without a gather.

    ext: int32/int8 (R, W) with W >= max(shifts) + out_len, values int8-range.
    shifts: int32 (R,) in [0, max_shift] (default W - out_len; pass a tighter
    bound when the caller knows one — it shrinks the coarse level).

    Mixed-radix decomposition into masked adds of STATICALLY shifted slices —
    pure elementwise VPU work, no gathers, no convs (the grouped-conv
    formulation miscompiles on the tunneled-TPU backend when fused into
    larger programs).  Levels run COARSE -> FINE (radix 4): each level's
    read width is (stride - 1 + out_len), so the many-option fine levels
    operate at nearly out_len width while the wide reads happen at the
    2-3-option coarse level — ~3x less memory traffic than fine-first.
    """
    R, W = ext.shape
    if max_shift is None:
        max_shift = W - out_len
    x = jnp.asarray(ext, jnp.int8)
    if max_shift <= 0:
        return x[:, :out_len].astype(jnp.int32)

    radix = 4
    strides = [1]
    while strides[-1] * radix <= max_shift:
        strides.append(strides[-1] * radix)
    strides = strides[::-1]              # coarse first

    d_top = strides[0]
    n_top = max_shift // d_top + 1
    w_top = (d_top - 1) + out_len        # width after the coarse level
    need = d_top * (n_top - 1) + w_top   # furthest read of the coarse level
    if need > W:
        x = jnp.pad(x, ((0, 0), (0, need - W)))

    rem = jnp.asarray(shifts, jnp.int32)
    for li, d in enumerate(strides):
        n = n_top if li == 0 else radix
        w_out = (d - 1) + out_len
        q = rem // d
        rem = rem - q * d
        acc = jnp.zeros((R, w_out), jnp.int8)
        for v in range(n):
            acc = acc + jnp.where((q == v)[:, None],
                                  x[:, d * v:d * v + w_out], jnp.int8(0))
        x = acc
    return x.astype(jnp.int32)


def select_rows(data: jax.Array, idx: jax.Array) -> jax.Array:
    """data[idx] for uint8/small-int data (N, ...) and traced idx (M,),
    as a one-hot bf16 matmul (exact for values <= 255)."""
    N = data.shape[0]
    dt = _mm_dtype()
    flat = data.reshape(N, -1).astype(dt)
    onehot = (idx[:, None] == jnp.arange(N, dtype=jnp.int32)[None, :])
    out = jnp.dot(onehot.astype(dt), flat,
                  preferred_element_type=jnp.float32)
    return out.astype(jnp.int32).reshape((idx.shape[0],) + data.shape[1:])


def tile_period(vals: jax.Array, n: int, offset: int = 0) -> jax.Array:
    """out[..., i] = vals[..., (i + offset) % P] for i < n via tiling —
    replaces jnp.take with a periodic constant index."""
    P = vals.shape[-1]
    reps = -(-(n + offset) // P)
    tiled = jnp.tile(vals, (1,) * (vals.ndim - 1) + (reps,))
    return tiled[..., offset:offset + n]


def lerp_resample_weights(av_len: int, outw: int):
    """Static scan-conversion maps (crt_core.c:528-532, 555-570):
    pixel p reads source samples s=pos>>12 and s+1 with 12-bit weights
    L=0xfff-R, R=pos&0xfff, pos=p*dx, dx=((av_len-1)<<12)//outw."""
    import numpy as np
    dx = ((av_len - 1) << 12) // outw
    pos = np.arange(outw, dtype=np.int64) * dx
    s = (pos >> 12).astype(np.int32)
    R = (pos & 0xFFF).astype(np.int32)
    L = 0xFFF - R
    return s, L, R


def lerp_resample(vals: jax.Array, outw: int, shift: int,
                  wide: bool | None = None) -> jax.Array:
    """Exact ((a*L)>>sh) + ((b*R)>>sh) resampling as int8-limb MXU matmuls.

    vals: int32 (..., av_len).  The products a*L wrap in int32 exactly like
    the reference's (yiqA->y * L) (crt_core.c:568-570).  Each value splits
    into 7-bit limbs; one-hot weight matrices fold the (gather at s / s+1)
    x (multiply by L/R) into a single int8 matmul per limb batch — gathers
    never happen.

    wide=False: 3 limbs, exact for |vals| < 2^21.  wide=True: 5 limbs,
    exact mod 2^32 for ANY int32 input.  wide=None (default) reads
    NTSC_CRT_LERP_WIDE.  Callers that know their input envelope at trace
    time (demodulate_core derives it from concrete monitor knobs) pass the
    flag explicitly so the exactness guarantee never depends on an env var.
    """
    import numpy as np
    av_len = vals.shape[-1]
    s, L, R = lerp_resample_weights(av_len, outw)

    WA = np.zeros((av_len, outw), np.int64)
    WB = np.zeros((av_len, outw), np.int64)
    WA[s, np.arange(outw)] = L
    WB[np.minimum(s + 1, av_len - 1), np.arange(outw)] += R
    W = np.concatenate([WA, WB], axis=1)              # (av, 2*outw)
    # split 12-bit weights into two 6-bit limbs (int8-exact)
    W_lo = (W & 0x3F).astype(np.int8)
    W_hi = (W >> 6).astype(np.int8)

    lead = vals.shape[:-1]
    x = vals.reshape(-1, av_len)
    # Split values into 7-bit limbs (sign carried by the top limb).  Three
    # limbs represent any |v| < 2^21 exactly — the decoded YIQ samples stay
    # well under 2^16 for all sane monitor settings (the reference itself
    # wraps int32 far earlier than 2^21-scaled inputs could).  The 5-limb
    # path is exact mod 2^32 for ANY int32 input (matching the reference's
    # -fwrapv product wrap).
    import os
    if wide is None:
        wide = bool(os.environ.get("NTSC_CRT_LERP_WIDE"))
    n_limbs = 5 if wide else 3
    parts = [(x & 0x7F).astype(jnp.int8), ((x >> 7) & 0x7F).astype(jnp.int8)]
    if n_limbs == 3:
        parts.append((x >> 14).astype(jnp.int8))      # signed top limb
    else:
        parts.append(((x >> 14) & 0x7F).astype(jnp.int8))
        parts.append(((x >> 21) & 0x7F).astype(jnp.int8))
        parts.append((x >> 28).astype(jnp.int8))      # signed top limb
    limbs = jnp.concatenate(parts, axis=0)            # (n*Rc, av)
    Rc = x.shape[0]

    # The weight matrix is banded (pixel p only reads rows s(p), s(p)+1 with
    # s monotone), so a dense (av, 4*outw) matmul wastes ~av/2 of its MACs.
    # Split the source axis into 128-wide blocks: each block feeds only the
    # contiguous pixel range whose s falls inside it — ~6x fewer MACs.
    SB = 128
    acc_parts = []
    for b0 in range(0, av_len, SB):
        b1 = min(b0 + SB, av_len)
        cols = np.where((s >= b0) & (s < b1))[0]      # pixels fed by block
        if len(cols) == 0:
            continue
        blk_hi = min(b1 + 1, av_len)                  # s+1 may spill one row
        Wb = np.concatenate([W_lo[b0:blk_hi][:, cols],
                             W_lo[b0:blk_hi][:, outw + cols],
                             W_hi[b0:blk_hi][:, cols],
                             W_hi[b0:blk_hi][:, outw + cols]], axis=1)
        prod = jax.lax.dot_general(
            limbs[:, b0:blk_hi], jnp.asarray(Wb), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)         # (n*Rc, 4*len(cols))
        p = prod.reshape(n_limbs, Rc, 4, len(cols))
        acc = jnp.zeros((Rc, 2, len(cols)), jnp.int32)
        for k in range(n_limbs):
            lo = p[k, :, 0:2]
            hi = p[k, :, 2:4]
            acc = acc + ((lo + (hi << 6)) << (7 * k))
        acc_parts.append((acc[:, 0] >> shift) + (acc[:, 1] >> shift))
    out = jnp.concatenate(acc_parts, axis=1)          # pixel ranges are
    return out.reshape(lead + (outw,))                # contiguous & ordered


def select_cols_static(data: jax.Array, idx) -> jax.Array:
    """data[..., idx, :] along axis -2 for a STATIC numpy index vector and
    uint8-range values, as a one-hot bf16 matmul (values <= 255 exact)."""
    import numpy as np
    W = data.shape[-2]
    onehot = np.zeros((W, len(idx)), np.float32)
    onehot[np.asarray(idx), np.arange(len(idx))] = 1
    dt = _mm_dtype()
    oh = jnp.asarray(onehot, dt)
    x = jnp.asarray(data, dt)
    out = jnp.einsum("...wc,wd->...dc", x, oh,
                     preferred_element_type=jnp.float32)
    return out.astype(jnp.int32)


def select_rows_batched(data: jax.Array, idx: jax.Array) -> jax.Array:
    """data[b, idx[b, m]] for uint8-range data (B, N, ...) and traced idx
    (B, M) — batched one-hot matmul, no gather."""
    B, N = data.shape[0], data.shape[1]
    dt = _mm_dtype()
    flat = data.reshape(B, N, -1).astype(dt)
    oh = (idx[..., None] == jnp.arange(N, dtype=jnp.int32)).astype(dt)
    out = jnp.einsum("bmn,bnk->bmk", oh, flat,
                     preferred_element_type=jnp.float32)
    return out.astype(jnp.int32).reshape(idx.shape + data.shape[2:])


def onehot_pick(vals: jax.Array, idx: jax.Array) -> jax.Array:
    """out[...] = vals[..., idx[...]] for a small last dim P (<= ~8), as a
    sum of P masked broadcasts — no gather.  vals: (..., P) broadcastable
    against idx's shape."""
    P = vals.shape[-1]
    out = jnp.zeros(jnp.broadcast_shapes(idx.shape, vals.shape[:-1]), jnp.int32)
    for k in range(P):
        out = out + jnp.where(idx == k, vals[..., k], 0)
    return out
