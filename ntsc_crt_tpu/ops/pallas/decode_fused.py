"""Fully-fused decode kernel: per-line hsync alignment + YIQ input prep +
3-band EQ + scan conversion + YIQ->RGB + contrast + clamp + packing, one
VMEM residency per line.

Replaces three HBM round trips (stacked YIQ inputs, EQ outputs, lerp inputs —
~0.5 GB each at batch 256) with: int8 signal in, packed RGB out.  Per
(sublane x lane) row-block the kernel

0. aligns each row to its hsync estimate: aligned[t] = ext[t + shift_row]
   (the reference's per-line `sig[pos + i]` read, crt_core.c:538-543).  In
   this kernel's tiling the sample axis is the MAJOR block dim (rows live on
   sublane x lane), so per-row sample shifts are plain major-dim slices — no
   lane rotates, no misaligned lane-slice relayouts (the cost that bounds
   every XLA formulation of `shift_rows`, docs/PERF.md).  A binary funnel
   over the shift bits (descending, extent shrinking toward av_len) resolves
   all 1024 rows' distinct shifts in ~log2(max_shift) masked-select passes;
1. marches x serially in K-sample chunks computing the three EQ chains with
   *compile-time constant* coefficients (the per-channel gains/cutoffs are
   static config — crt_core.c:277-287), staging oy/oi/oq rows in VMEM;
2. runs the static scan-conversion pixel loop (source indices are fixed by
   (av_len, outw), crt_core.c:528-532) straight out of that VMEM staging.

The carrier wave factors have period cc_samples along x, so with K a
multiple of the period the in-chunk phase is static — the (i & 3) / (i+3 & 3)
indexing (crt_core.c:541-542) costs nothing.  The caller passes the I and Q
wave tables separately (for 4-sample systems Q is the I table rotated by 3,
crt_core.c:541-542; 5-sample systems have distinct tables,
crt_core.c:546-548), so 4- and 5-sample systems share the kernel.

CRT_DO_BLOOM mode (crt_core.c:512-532): the beam-energy emulation gives every
line its own pixel step `dx` and EQ start `scanL`, so the scan-conversion
source index s(r, p) = (p * dx_r) >> 12 is per-ROW dynamic — the one decode
stage whose static smap no longer applies.  Passing `bloom_dx`/`bloom_lidx`
switches stage 2 to a dynamic walk: per output pixel the kernel derives the
candidate source range from the BLOCK's dx extrema (two reductions per block,
scalar math per pixel) and resolves each row's (s, s+1) pair with a
dynamic-trip fori_loop of masked single-row reads — in a locked block the dx
spread is tiny, so the loop runs ~3 iterations.  The per-line EQ start folds
into the alignment shift (caller passes shifts + scanL>>12) and the carrier
phase offset folds into the wave tables (caller pre-rotates by scanL>>12 mod
cc), so stages 0-1 are untouched.  The reference's never-written out[AV-1]
slot (the EQ loop stops at i < AV-1, crt_core.c:525-543) reads as zero via a
per-row forced-zero index; pixels past scanR (crt_core.c:555 loop bound)
are masked by the caller's `valid` plane in row placement.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ntsc_crt_tpu.ops.pallas.tiling import shrink_sub

from ntsc_crt_tpu.ops.filters import EQ_P, EQ_R, _CONV_EQ_KERNELS
from ntsc_crt_tpu.ops.fastpath import lerp_resample_weights

LANE = 128
SUB = 8   # full-VPU tiles; VMEM fits via the three uint8 output planes
#         (sub=16 measured identical kernel time on PV1K shapes — the EQ
#         chain is issue-bound, not latency-bound; docs/PERF.md r3)


def _chunk(cc: int) -> int:
    """Serial unroll; must be a multiple of the chroma period (the in-chunk
    carrier phase is static).  32 for the 4-sample systems (measured best),
    40 for 5-sample."""
    return 32 if cc == 4 else 40


def _fir_chain(hist, x, weights, shift):
    """Causal FIR step (the USE_CONVOLUTION eqf, crt_core.c:96-147):
    out_i = (sum_k w_k * s_{i-k}) >> shift with zero history at line start.
    hist: tuple of the previous len(weights)-1 inputs, oldest first."""
    acc = weights[0] * x
    for k in range(1, len(weights)):
        acc = acc + weights[k] * hist[-k]
    return hist[1:] + (x,), acc >> shift


def _eq_chain(state, sx, lf, hf, g0, g1, g2):
    fL0, fL1, fL2, fL3, fH0, fH1, fH2, fH3, h0, h1, h2 = state
    fL0 = fL0 + ((lf * (sx - fL0) + EQ_R) >> EQ_P)
    fH0 = fH0 + ((hf * (sx - fH0) + EQ_R) >> EQ_P)
    fL1 = fL1 + ((lf * (fL0 - fL1) + EQ_R) >> EQ_P)
    fH1 = fH1 + ((hf * (fH0 - fH1) + EQ_R) >> EQ_P)
    fL2 = fL2 + ((lf * (fL1 - fL2) + EQ_R) >> EQ_P)
    fH2 = fH2 + ((hf * (fH1 - fH2) + EQ_R) >> EQ_P)
    fL3 = fL3 + ((lf * (fL2 - fL3) + EQ_R) >> EQ_P)
    fH3 = fH3 + ((hf * (fH2 - fH3) + EQ_R) >> EQ_P)
    out = (((fL3 * g0) >> EQ_P) + (((fH3 - fL3) * g1) >> EQ_P)
           + (((h2 - fH3) * g2) >> EQ_P))
    return (fL0, fL1, fL2, fL3, fH0, fH1, fH2, fH3, sx, h0, h1), out


FUNNEL_CHUNK = 256  # funnel pass tile along the sample (major) dim


def _make_kernel(T, av, outw, coefs, smap, cc, bits, pair=None, bloom=False):
    # coefs: 3x (lf, hf, g0, g1, g2) python ints for the 3-band EQ, or
    # ("conv", taps) for the USE_CONVOLUTION FIR build (crt_core.c:96-147)
    conv = coefs[0] == "conv"
    if conv:
        fir_w, fir_shift = _CONV_EQ_KERNELS[coefs[1]]
        n_hist = len(fir_w) - 1
    else:
        cy, ci, cq = coefs  # per-channel (lf, hf, g0, g1, g2) python ints
    K = _chunk(cc)
    C = FUNNEL_CHUNK

    def kernel(sig_ref, sh_ref, wvi_ref, wvq_ref, br_ref, ct_ref, r_ref,
               g_ref, b_ref, al_s, oy_s, oi_s, oq_s, sigB_ref=None,
               dx_ref=None, lidx_ref=None):
        # --- stage 0: per-row alignment funnel ----------------------------
        # Descending bit order: after applying bit kb, only positions
        # [0, T + 2^kb - 1) remain live for the next pass, so the extent
        # shrinks geometrically toward T.  Ascending-chunk in-place passes
        # are safe: chunk j writes [jC, jC+C) and every later read is at
        # position >= (j+1)C.  Chunk rounding reads a tail of stale scratch
        # rows; those only pollute outputs at positions >= T + 2^kb - 1,
        # which no later pass or EQ read consumes.
        sh = sh_ref[0]                                    # (sub, 128) int32
        if pair is not None:
            # two row planes (this line / next line): pre-fill the scratch
            # with their logical concatenation, then run the funnel fully
            # in-place.  In-place is safe for any offset: each chunk loads
            # both its slices before storing, and chunk j+1 only reads
            # positions >= (j+1)C, which this pass has not written yet.
            W1, W2, S = pair
            al_s[pl.ds(0, min(W1, S))] = sig_ref[pl.ds(0, min(W1, S))]
            if W2 > 0:
                al_s[pl.ds(W1, W2)] = sigB_ref[pl.ds(0, W2)]
            if S > W1 + W2:
                al_s[pl.ds(W1 + W2, S - W1 - W2)] = jnp.zeros(
                    (S - W1 - W2,) + sh.shape, jnp.int8)
        # Block rebase + residual-gated funnel.  In steady state the hsync
        # chase is locked, so all rows of a block share their high shift
        # bits; one copy pass at the block-min shift (dynamic major-dim
        # offset — free in this tiling) plus funnel passes over the
        # RESIDUAL sh - smin leaves only ~log2(jitter) live passes.  Each
        # pass is gated on the residual max actually needing that bit, so
        # acquisition frames simply run more passes — bit-exact always.
        smin = jnp.min(sh)
        r = sh - smin
        rmax = jnp.max(r)
        src0 = al_s if pair is not None else sig_ref
        n_live = (T + rmax + C - 1) // C    # reads <= T+max_shift+C-1 < S

        def rpass(c, z):
            t0 = c * C
            al_s[pl.ds(t0, C)] = src0[pl.ds(t0 + smin, C)]
            return z

        lax.fori_loop(0, n_live, rpass, 0)
        for kb in range(bits - 1, -1, -1):
            off = 1 << kb
            n_cap = -(-(T + off - 1) // C)
            m = ((r >> kb) & 1) == 1                      # (sub, 128) bool
            n_dyn = jnp.where(rmax >= off,
                              jnp.minimum(n_cap, n_live), 0)

            def fpass(c, z, off=off, m=m):
                t0 = c * C
                a = al_s[pl.ds(t0 + off, C)]
                b = al_s[pl.ds(t0, C)]
                al_s[pl.ds(t0, C)] = jnp.where(m[None], a, b)
                return z

            lax.fori_loop(0, n_dyn, fpass, 0)
        if T > av:
            # the pre-aligned formulation zero-padded av -> T; match it
            al_s[pl.ds(av, T - av)] = jnp.zeros((T - av,) + sh.shape,
                                                jnp.int8)

        bright = br_ref[0]
        zero = jnp.zeros_like(bright)

        def chunk(tb, carry):
            sy, si, sq = carry
            raw = al_s[pl.ds(tb * K, K)]                  # (K, S, 128) int8
            oys, ois, oqs = [], [], []
            for j in range(K):
                sx = raw[j].astype(jnp.int32)
                # wave phase is static within the chunk (K % cc == 0)
                wv_i = wvi_ref[j % cc]
                wv_q = wvq_ref[j % cc]
                if conv:
                    sy, oy = _fir_chain(sy, sx + bright, fir_w, fir_shift)
                    si, oi = _fir_chain(si, (sx * wv_i) >> 9, fir_w,
                                        fir_shift)
                    sq, oq = _fir_chain(sq, (sx * wv_q) >> 9, fir_w,
                                        fir_shift)
                else:
                    sy, oy = _eq_chain(sy, sx + bright, *cy)
                    si, oi = _eq_chain(si, (sx * wv_i) >> 9, *ci)
                    sq, oq = _eq_chain(sq, (sx * wv_q) >> 9, *cq)
                oys.append(oy << 4)                        # crt_core.c:540
                ois.append(oi >> 3)
                oqs.append(oq >> 3)
            oy_s[pl.ds(tb * K, K)] = jnp.stack(oys)
            oi_s[pl.ds(tb * K, K)] = jnp.stack(ois)
            oq_s[pl.ds(tb * K, K)] = jnp.stack(oqs)
            return sy, si, sq

        n_state = n_hist if conv else 11
        init = ((zero,) * n_state, (zero,) * n_state, (zero,) * n_state)
        lax.fori_loop(0, T // K, chunk, init)

        contrast = ct_ref[0]

        def emit(p, y, i, q):
            r = (((y + 3879 * i + 2556 * q) >> 12) * contrast) >> 8
            g = (((y - 1126 * i - 2605 * q) >> 12) * contrast) >> 8
            b = (((y - 4530 * i + 7021 * q) >> 12) * contrast) >> 8
            r_ref[p] = jnp.clip(r, 0, 255).astype(jnp.uint8)
            g_ref[p] = jnp.clip(g, 0, 255).astype(jnp.uint8)
            b_ref[p] = jnp.clip(b, 0, 255).astype(jnp.uint8)

        if not bloom:
            for p, (s, Lw, Rw) in enumerate(smap):
                y = ((oy_s[s] * Lw) >> 2) + ((oy_s[s + 1] * Rw) >> 2)
                i = ((oi_s[s] * Lw) >> 14) + ((oi_s[s + 1] * Rw) >> 14)
                q = ((oq_s[s] * Lw) >> 14) + ((oq_s[s + 1] * Rw) >> 14)
                emit(p, y, i, q)
            return

        # --- bloom scan conversion (crt_core.c:512-532, 555-570) ----------
        # per-row source s(r, p) = (p*dx_r) >> 12; candidate range per pixel
        # from the block's dx extrema; the (s, s+1) pair resolves by masked
        # single-row reads over that range (dynamic trip count — in a locked
        # block all rows share ~one dx, so ~3 iterations live).  out[av-1]
        # is never written by the reference's EQ loop (i < AV_LEN-1,
        # crt_core.c:525-543) and reads as static zero -> force it per row.
        dxv = dx_ref[0]                                   # (sub, 128) int32
        zb = (av - 1) - lidx_ref[0]                       # forced-zero index
        dmin = jnp.min(dxv)
        dmax = jnp.max(dxv)
        for p in range(outw):
            rel = p * dxv
            t = rel >> 12
            Rw = rel & 0xFFF
            Lw = 0xFFF - Rw
            m0 = (p * dmin) >> 12                         # scalar
            cnt = ((p * dmax + 0xFFF) >> 12) + 2 - m0     # covers t and t+1

            def pick(k, acc, t=t, m0=m0, zb=zb):
                ay, ai, aq, by, bi, bq = acc
                idx = m0 + k
                idc = jnp.minimum(idx, T - 1)             # stay in staging
                wy, wi, wq = oy_s[idc], oi_s[idc], oq_s[idc]
                ha = t == idx
                hb = (t + 1 == idx) & (idx != zb)
                return (jnp.where(ha, wy, ay), jnp.where(ha, wi, ai),
                        jnp.where(ha, wq, aq), jnp.where(hb, wy, by),
                        jnp.where(hb, wi, bi), jnp.where(hb, wq, bq))

            z6 = (jnp.zeros_like(dxv),) * 6
            ay, ai, aq, by, bi, bq = lax.fori_loop(0, cnt, pick, z6)
            y = ((ay * Lw) >> 2) + ((by * Rw) >> 2)
            i = ((ai * Lw) >> 14) + ((bi * Rw) >> 14)
            q = ((aq * Lw) >> 14) + ((bq * Rw) >> 14)
            emit(p, y, i, q)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("outw", "av_len", "max_shift", "coefs",
                                    "interpret"))
def decode_fused_rows(ext, shifts, waveI, waveQ, bright, contrast, *,
                      outw: int, av_len: int = None, max_shift: int = 0,
                      coefs=None, interpret: bool = False, ext_hi=None,
                      bloom_dx=None, bloom_lidx=None):
    """ext: int8 (R, E) unaligned row signal; row r's active video starts at
    sample shifts[r] (int32 (R,), 0 <= shift <= max_shift) and spans av_len
    samples — i.e. the kernel consumes ext[r, shifts[r] + t] exactly like
    the reference's `sig[pos + i]` reads (crt_core.c:538-543).  Pass
    max_shift=0 with av_len == E for pre-aligned input.  waveI/waveQ: int32
    (R, cc) with cc = 4 or 5; bright/contrast: int32 (R,).  coefs:
    ((lf,hf,g0,g1,g2) x 3) python ints.  Returns clamped uint8 planes
    (r, g, b), each (R, outw).

    ext_hi (int8 (R, E2), optional): continuation plane — the logical row
    signal is concat(ext[r], ext_hi[r]).  In the decoder ext is line l's
    field row and ext_hi is line l+1's (reads past a row spill into the
    next, crt_core.c:538-543 flat indexing), so the caller never has to
    materialize the (R, E+E2) concat or any XLA-side coarse pre-shift: the
    whole alignment (all shift bits) runs as in-VMEM funnel passes.

    bloom_dx / bloom_lidx (int32 (R,), optional, together): CRT_DO_BLOOM
    mode — per-row pixel step dx (crt_core.c:521) and EQ start scanL>>12
    (crt_core.c:522).  The caller must fold scanL>>12 into `shifts` and
    pre-rotate the wave tables by (scanL>>12) mod cc; the kernel then runs
    the per-row dynamic scan conversion (module docstring)."""
    R, E = ext.shape
    T = E if av_len is None else av_len
    cc = waveI.shape[-1]
    K = _chunk(cc)
    Tp = -(-T // K) * K
    bloom = bloom_dx is not None
    if bloom:
        smap = None
    else:
        s, L, Rw = lerp_resample_weights(T, outw)
        smap = [(int(s[p]), int(L[p]), int(Rw[p])) for p in range(outw)]

    pair = None
    if ext_hi is not None:
        bits = int(max_shift).bit_length()
        S = Tp + (1 << bits) + FUNNEL_CHUNK
        W2 = max(0, min(ext_hi.shape[1], S - E))
        if W2 == 0:
            ext_hi = None          # funnel extent fits in the first plane
        else:
            pair = (E, W2, S)

    if ext_hi is None:
        # Wide shift ranges (the hsync estimate spans [0, H)) first resolve
        # the high shift bits OUTSIDE the kernel with one masked-select level
        # of stride COARSE = 2*LANE: every slice offset is lane-aligned, so
        # unlike a general XLA shift stack the level costs no misaligned-lane
        # relayout passes — and it halves the kernel's input extent and
        # funnel depth.  (The pair path above avoids even this: all bits
        # resolve in VMEM.)
        COARSE = 2 * LANE
        if max_shift >= 2 * COARSE:
            nq = max_shift // COARSE + 1
            S2 = Tp + COARSE + FUNNEL_CHUNK
            need = COARSE * (nq - 1) + S2
            extp = ext if E >= need else jnp.pad(ext, ((0, 0), (0, need - E)))
            sh32 = shifts.astype(jnp.int32)
            q = sh32 // COARSE
            acc = jnp.zeros((R, S2), jnp.int8)
            for v in range(nq):
                acc = acc + jnp.where((q == v)[:, None],
                                      extp[:, COARSE * v:COARSE * v + S2],
                                      jnp.int8(0))
            ext, E = acc, S2
            shifts = sh32 - q * COARSE
            max_shift = COARSE - 1

        bits = int(max_shift).bit_length()
        # input/scratch extent: pass kb touches up to Tp + 2^(kb+1) + C - 3
        S = Tp + (1 << bits) + FUNNEL_CHUNK

    # small-batch (live/60 Hz) runs pad R=240 rows up to a full 1024-row
    # block otherwise — shrink the block height to the rows that exist
    sub = shrink_sub(R, SUB, LANE)
    rows_blk = sub * LANE
    Rp = -(-R // rows_blk) * rows_blk
    RB = Rp // rows_blk

    def rowsT(x, w_in, w_out):
        xp = jnp.zeros((Rp, w_out), jnp.int8).at[:R, :w_in].set(x[:, :w_in])
        return xp.T.reshape(w_out, RB, sub, LANE).swapaxes(0, 1)

    if pair is None:
        sig_ins = [rowsT(ext, min(E, S), S)]
        sig_specs = [S]
    else:
        W1c = min(E, S)
        sig_ins = [rowsT(ext, W1c, W1c), rowsT(ext_hi, pair[1], pair[1])]
        sig_specs = [W1c, pair[1]]
        pair = (W1c, pair[1], S)

    def vec(x, n, dt=jnp.int32):
        xp = jnp.zeros((Rp, n), dt).at[:R].set(x.reshape(R, n))
        return xp.T.reshape(n, RB, sub, LANE).swapaxes(0, 1)

    shv = vec(shifts.astype(jnp.int32), 1)
    wvi = vec(waveI, cc)
    wvq = vec(waveQ, cc)
    br = vec(bright, 1)
    ct = vec(contrast, 1)
    tail_ins = []
    if bloom:
        # pad dx with a REAL row's value, not zero: the kernel derives the
        # per-pixel candidate range from the block's dx extrema, and a zero
        # in the padding rows would drag dmin to 0 and blow the dynamic
        # trip count up to the full band
        def vec_fill(x):
            xp = jnp.broadcast_to(x.reshape(R, 1)[:1], (Rp, 1)).at[:R].set(
                x.reshape(R, 1))
            return xp.T.reshape(1, RB, sub, LANE).swapaxes(0, 1)

        tail_ins = [vec_fill(bloom_dx.astype(jnp.int32)),
                    vec(bloom_lidx.astype(jnp.int32), 1)]

    kern = _make_kernel(Tp, T, outw, coefs, smap, cc, bits, pair=pair,
                        bloom=bloom)
    n_sig = 1 if pair is None else 2

    def body(*refs):
        sig_rs = refs[:n_sig]
        (sh_r, wvi_r, wvq_r, br_r, ct_r) = refs[n_sig:n_sig + 5]
        k = n_sig + 5
        bkw = {}
        if bloom:
            bkw = dict(dx_ref=refs[k].at[0], lidx_ref=refs[k + 1].at[0])
            k += 2
        (r_r, g_r, b_r, al_s, oys, ois, oqs) = refs[k:k + 7]
        if pair is not None:
            bkw["sigB_ref"] = sig_rs[1].at[0]
        kern(sig_rs[0].at[0], sh_r.at[0], wvi_r.at[0], wvq_r.at[0],
             br_r.at[0], ct_r.at[0], r_r.at[0], g_r.at[0], b_r.at[0],
             al_s, oys, ois, oqs, **bkw)

    ospec = pl.BlockSpec((1, outw, sub, LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    spec = lambda n: pl.BlockSpec((1, n, sub, LANE), lambda i: (i, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
    r8, g8, b8 = pl.pallas_call(
        body,
        grid=(RB,),
        in_specs=[spec(n) for n in sig_specs] +
                 [spec(1), spec(cc), spec(cc), spec(1), spec(1)] +
                 [spec(1)] * len(tail_ins),
        out_specs=(ospec, ospec, ospec),
        out_shape=tuple(jax.ShapeDtypeStruct((RB, outw, sub, LANE), jnp.uint8)
                        for _ in range(3)),
        scratch_shapes=[pltpu.VMEM((S, sub, LANE), jnp.int8)] +
                       [pltpu.VMEM((Tp + 1, sub, LANE), jnp.int32)] * 3,
        compiler_params=pltpu.CompilerParams(
            # PV1K's 1520-wide int32 staging needs ~19 MB + the ~3.8 MB
            # ext/alignment int8 buffers; narrower systems keep the
            # measured-best default headroom (bloom's wider funnel scratch
            # rides the same budgets)
            vmem_limit_bytes=(44 if Tp > 1024 else 28) * 1024 * 1024),
        interpret=interpret,
    )(*sig_ins, shv, wvi, wvq, br, ct, *tail_ins)

    def back(x):
        return x.swapaxes(0, 1).reshape(outw, Rp).T[:R]

    return back(r8), back(g8), back(b8)
