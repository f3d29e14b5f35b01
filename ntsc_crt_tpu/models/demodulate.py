"""Demodulator: sampled analog composite signals -> RGB, like a CRT would.

System-generic, like the reference's crt_demodulate (crt_core.c:291-666),
and **batch-first**: every tensor carries a leading frame-batch dim (no
vmap), so the hot data movements keep their fast shapes — see
ops/fastpath.py.  The TPU-native decomposition replaces the reference's
data-dependent control flow with masked tensor reductions while keeping
bit-exact integer results:

1. **Noise injection** — the serial LCG becomes one closed-form parallel
   pass (ops/lcg.py), carried as int8.
2. **VSYNC recovery** — the goto-on-threshold scan (crt_core.c:379-397)
   becomes running sums over the candidate rows (a one-hot matmul row
   select; the integration itself is a triangular-ones MXU matmul at
   throughput batch sizes, a cumsum at latency ones) plus a
   first-below-threshold argmax with the reference's tie-breaking (first
   line, then first sample; fall-through keeps the last candidate and
   j == HRES so the odd-field test still matches).
3. **Per-line sequential state** (hsync chained line to line, color-carrier
   EMA `ccf`) — a lax.scan over the active lines, vectorized across the
   batch inside each step; the hsync window is probed on demand with
   gather-free block-pair selects.
4. **Line extraction** — ONE shared row-roll (a batched one-hot matmul)
   serves the hsync scan and the extraction rows; the per-line sample
   alignment happens inside the fused decode kernel, where the sample axis
   is the major block dim (ops/pallas/decode_fused.py).  The portable
   path uses mixed-radix masked shifts (ops/fastpath.shift_rows).
5. **YIQ + 3-band EQ + scan conversion** — one fused x-serial,
   row-parallel Pallas kernel (decode_fused); standalone kernels and an
   exact int8-limb matmul lerp back the portable/bloom paths.
6. **Row placement** — blend and scanline duplication resolve as
   elementwise selects in a stacked (line, repeat) view of the output
   (see _place_rows).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ntsc_crt_tpu.models.systems import SystemConfig
from ntsc_crt_tpu.ops import fastpath, filters, lcg
from ntsc_crt_tpu.ops.fixedpoint import (cdiv, i32, posmod, crem, sincos14,
                                         np_sincos14)
from ntsc_crt_tpu.parallel import spatial


# hsync recovery strategy: on-demand window probes inside the line scan
# (default) vs the all-candidates first-hit table.  Both are bit-exact; the
# table is kept selectable for A/B measurement (NTSC_CRT_HSYNC_TABLE=1).
_HSYNC_SCAN = os.environ.get("NTSC_CRT_HSYNC_TABLE", "") != "1"

# batch threshold between the latency-bound formulations (small B: fewer,
# simpler ops win) and the throughput-bound ones (big B: MXU passes win) —
# used by the vsync integration and the hsync probe window test.  Both
# sides are pinned equal by tests/test_fastpath.py::test_batch_regime_paths.
_BIG_BATCH = int(os.environ.get("NTSC_CRT_BIG_BATCH", "16"))
# Jacobi sweeps before the hsync fixpoint gives up and pays the serial
# chain (see _line_scan): locked steady state certifies at sweep 2; each
# extra sweep extends the exact prefix by >= 1 line, so 4 covers small
# jitter without approaching the serial chain's cost.
_FIXPOINT_SWEEPS = int(os.environ.get("NTSC_CRT_FIXPOINT_SWEEPS", "4"))


class MonitorParams(NamedTuple):
    """Runtime monitor knobs (struct CRT fields, crt_core.h:82-86).
    Each field may be a scalar or a (B,) vector."""
    hue: jax.Array = np.int32(0)
    brightness: jax.Array = np.int32(0)
    contrast: jax.Array = np.int32(180)
    saturation: jax.Array = np.int32(10)
    black_point: jax.Array = np.int32(0)
    white_point: jax.Array = np.int32(100)
    blend: jax.Array = np.int32(0)
    scanlines: jax.Array = np.int32(0)


def _b(x, B):
    return jnp.broadcast_to(i32(x), (B,))


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


# ---------------------------------------------------------------------------
# Noise injection
# ---------------------------------------------------------------------------


def _row_major(x):
    """Experimental (NTSC_CRT_LAYOUT_OPT=1): pin a (B, V, H) intermediate to
    row-major physical layout.  XLA's layout assignment stores the analog
    signal batch-minor ({0,1,2}) to suit the elementwise noise/skeleton
    passes, then pays a ~244 MB relayout copy per step when the decode
    path's blocks views need row-major (docs/PERF.md encode/decode layout
    copies).

    Needs jax >= 0.9 (`jax.experimental.layout.Layout` — the API was renamed
    from DeviceLocalLayout); degrades to identity on older/newer versions
    that moved it again, and is skipped under spatial sharding (the bare
    Layout constraint carries no sharding)."""
    if x.ndim == 3 and os.environ.get("NTSC_CRT_LAYOUT_OPT") \
            and not spatial.active():
        try:
            from jax.experimental.layout import Layout, with_layout_constraint
            return with_layout_constraint(x, Layout(major_to_minor=(0, 1, 2)))
        except (ImportError, TypeError):  # renamed-again upstream: no-op
            return x
    return x


def _inject_noise(cfg: SystemConfig, analog2d, rn, noise):
    """crt_core.c:346-367, batched: analog2d (B, V, H) int8, rn (B,).

    Stays in field shape end to end (the LCG constant tables are reshaped to
    (V, H) at trace time instead) — flattening the signal here forced a
    244 MB int32 transpose-copy per batch-256 call."""
    n = cfg.input_size
    V, H = cfg.vres, cfg.hres
    apow, csum = lcg._lcg_tables(n, lcg.LCG_A, lcg.LCG_B)
    rn0 = lax.bitcast_convert_type(i32(rn), jnp.uint32)[:, None, None]
    stream = jnp.asarray(apow.reshape(V, H))[None] * rn0 \
        + jnp.asarray(csum.reshape(V, H))[None]
    byte = ((stream >> 16) & 0xFF).astype(jnp.int32) - 0x7F
    # final state computed separately so `stream` has a single consumer and
    # the whole injection fuses into one elementwise pass
    rn_out = lax.bitcast_convert_type(
        jnp.asarray(apow[-1]) * rn0[:, 0, 0] + jnp.asarray(csum[-1]),
        jnp.int32)
    s = analog2d + ((byte * noise[:, None, None]) >> 8)
    return _row_major(jnp.clip(s, -127, 127).astype(jnp.int8)), rn_out


def _inject_noise_vhs(cfg: SystemConfig, analog_flat, randstate, noise):
    """VHS tracking-noise variant (crt_core.c:343-366 under CRT_VHS_NOISE):
    a sinusoidal noise band wobbles over the last ~16 lines, driven by the
    spec'd crt_rand (see ops/lcg.py).  Batched over frames.

    The rand() call count per sample is data-dependent (the band's lower
    edge rand() only fires when the upper-edge test passes, via C's &&
    short circuit), which makes the rand stream sequential.  The exact
    consumption structure splits the field three ways:

      A  i <= N-25H          cond1 `i > N - H*(6 + rand()%20)` can never
                             pass -> exactly 2 calls/sample, closed form.
      B  N-25H < i <= N-6H   cond1 probabilistic -> the ONLY sequential
                             part: a lean scan carrying just the uint32
                             state (6 vector ops/step, everything else
                             hoisted), emitting per-sample entry states.
      C  i > N-6H            cond1 always passes (threshold < 0) ->
                             exactly 3 calls/sample, closed form again.

    All per-sample values (noise bytes, band tests, the band sinusoid) are
    then computed fully in parallel from the entry states.  Returns
    (inp int8, randstate', rn' = last rand VALUE — crt_core.c:359,367)."""
    N = cfg.input_size
    H = cfg.hres
    A1, C1 = lcg.RAND_A, lcg.RAND_B
    A2 = (A1 * A1) & 0xFFFFFFFF                          # 2-call composition
    C2 = (A1 * C1 + C1) & 0xFFFFFFFF

    head_st = lcg.crt_rand_step(i32(randstate))          # call 0: band line
    head = lcg.crt_rand_out(lax.bitcast_convert_type(head_st, jnp.uint32))
    band_line = (crem(head, 8) - 4) + 14                 # (B,)

    n0 = N - 25 * H + 1                                  # |region A|
    nB = 19 * H                                          # |region B|
    nC = N - n0 - nB                                     # |region C| = 6H-1

    # --- region A: closed-form stream, first call of each sample -----------
    # (tables sliced in numpy so the device constants are exactly the used
    # arrays — an on-device stride of the 2x table defeats constant caching)
    apow, csum = lcg._lcg_tables(2 * n0, lcg.RAND_A, lcg.RAND_B)
    st0u = lax.bitcast_convert_type(head_st, jnp.uint32)
    streamA = jnp.asarray(apow[::2])[None] * st0u[:, None] \
        + jnp.asarray(csum[::2])[None]
    rnA = (streamA >> 1).astype(jnp.int32)               # crt_rand_out
    sA = analog_flat[:, :n0] + \
        ((((rnA >> 16) & 0xFF) - 0x7F) * noise[:, None] >> 8)
    stA = jnp.asarray(apow[-1]) * st0u + jnp.asarray(csum[-1])  # uint32 (B,)

    # --- region B: minimal sequential recurrence ---------------------------
    # cond1  <=>  H*(rand()%20) > N - 6H - i  <=>  m1 >= (N-6H-i)//H + 1
    # (threshold precomputed per step, killing the per-step multiply); st3
    # derives straight from st via the 3-call composition so both candidate
    # states leave the critical path's multiply in parallel
    iB = np.arange(n0, n0 + nB, dtype=np.int64)
    tkB = jnp.asarray(((N - 6 * H - iB) // H + 1).astype(np.uint32))
    A3 = (A2 * A1) & 0xFFFFFFFF
    C3 = (A1 * C2 + C1) & 0xFFFFFFFF

    def stepB(st, tk):
        st2 = st * np.uint32(A2) + np.uint32(C2)
        st3 = st * np.uint32(A3) + np.uint32(C3)
        m1 = (st2 >> 1) % np.uint32(20)
        return jnp.where(m1 >= tk, st3, st2), st         # emit ENTRY state

    if filters._use_pallas():
        # in-register Pallas march: the XLA scan is dispatch-overhead-bound
        # at ~33 ns/vector-op x ~6 ops x 19H steps (docs/PERF.md); the
        # kernel runs the same uint32 recurrence with zero per-step overhead
        from ntsc_crt_tpu.ops.pallas import vhs_scan as _vs
        interp = filters._pallas_interpret()
        entB = spatial.shard_batch_entries_call(
            lambda s_: _vs.vhs_region_b_entries(
                s_, n_steps=nB, H=H, interpret=interp), stA)
        # region-C entry state = one more composed step from the last entry
        stC0, _ = stepB(entB[-1], tkB[-1])
    else:
        stC0, entB = lax.scan(stepB, stA, tkB, unroll=16)

    # --- region C: exactly 3 calls/sample, closed form ---------------------
    apow3, csum3 = lcg._lcg_tables(3 * nC, lcg.RAND_A, lcg.RAND_B)
    a3 = np.concatenate([np.ones(1, np.uint32), apow3[2::3]])[:nC]  # A^{3k}
    c3 = np.concatenate([np.zeros(1, np.uint32), csum3[2::3]])[:nC]
    entC = jnp.asarray(a3)[None] * stC0[:, None] + jnp.asarray(c3)[None]
    st_final = jnp.asarray(apow3[-1]) * stC0 + jnp.asarray(csum3[-1])

    # --- regions B+C: everything else in parallel from the entry states ----
    ent = jnp.concatenate([entB.T, entC], axis=1)        # (B, nB+nC) uint32
    iBC = np.arange(n0, N, dtype=np.int64)
    r1 = ((ent * np.uint32(A1) + np.uint32(C1)) >> 1).astype(jnp.int32)
    st2 = ent * np.uint32(A2) + np.uint32(C2)
    m1 = ((st2 >> 1) % np.uint32(20)).astype(jnp.int32)
    cond1 = m1 * H > jnp.asarray((N - 6 * H - iBC).astype(np.int32))[None]
    rC = (st2 * np.uint32(A1) + np.uint32(C1)) >> 1      # call 3 (if cond1)
    m2 = (rC % np.uint32(8)).astype(jnp.int32)
    cond2 = H * (1 + m2) < jnp.asarray((N - iBC).astype(np.int32))[None]
    # band sinusoid `cs >> 8` (crt_core.c:353-356): band_line has only 8
    # possible values (10..17), so the whole table is a trace-time constant
    # (np_sincos14, exact) selected per batch slot — no on-device gathers
    cs_tab = np.stack([np_sincos14(iBC * bl // H * 8192 // 180)[1] >> 8
                       for bl in range(10, 18)], axis=-1)  # (nBC, 8)
    csb = fastpath.onehot_pick(jnp.asarray(cs_tab)[None],
                               (band_line - 10)[:, None])
    nn = jnp.where(cond1 & cond2, csb, noise[:, None])
    sBC = analog_flat[:, n0:] + ((((r1 >> 16) & 0xFF) - 0x7F) * nn >> 8)

    s = jnp.concatenate([sA, sBC], axis=1)
    randstate_out = lax.bitcast_convert_type(st_final, jnp.int32)
    return (jnp.clip(s, -127, 127).astype(jnp.int8), randstate_out,
            r1[:, -1])


# ---------------------------------------------------------------------------
# Sync recovery
# ---------------------------------------------------------------------------


def _find_vsync(cfg: SystemConfig, inp2d, vsync):
    """First (line, sample) crossing the vsync threshold (crt_core.c:369-397).
    inp2d: int8 (B, VRES, HRES); vsync: (B,)."""
    W = cfg.vsync_window
    B = inp2d.shape[0]
    cand = posmod(vsync[:, None] + jnp.arange(-W, W, dtype=jnp.int32)[None, :],
                  cfg.vres)                              # (B, 2W)
    rows = fastpath.select_rows_batched(inp2d, cand)     # (B, 2W, H) int32
    if B >= _BIG_BATCH:
        # running integration as a triangular-ones matmul: jnp.cumsum along
        # the lane dim of (B, 2W, H) int32 lowers to ~log2(H) misaligned
        # shifted adds (~1 ms/step at NTSC batch 256); one MXU pass is
        # exact here (|samples| <= 127 is bf16-exact and the f32
        # accumulation of <= H products stays under 2^24) and ~10x cheaper.
        # At small batch the work is latency-bound and the constant-matrix
        # load dominates — cumsum wins there (batch-1: 2.7 vs 2.9 ms).
        H_ = rows.shape[2]
        dt = fastpath._mm_dtype()
        triu = jnp.asarray(np.triu(np.ones((H_, H_), np.float32)), dt)
        cum = jnp.einsum("bwh,hj->bwj", rows.astype(dt), triu,
                         preferred_element_type=jnp.float32
                         ).astype(jnp.int32)
    else:
        cum = jnp.cumsum(rows, axis=2)
    hit = cum <= cfg.vsync_thresh * cfg.sync_level
    any_hit = jnp.any(hit, axis=2)                       # (B, 2W)
    first_j = jnp.argmax(hit, axis=2)
    row = jnp.argmax(any_hit, axis=1)                    # first hitting line
    exists = jnp.any(any_hit, axis=1)
    pick = fastpath.onehot_pick(cand, row[:, None])[:, 0]
    line = jnp.where(exists, pick, cand[:, 2 * W - 1])
    jsel = jnp.take_along_axis(first_j, row[:, None], axis=1)[:, 0]
    j = jnp.where(exists, jsel, cfg.hres)                # loop fall-through
    field = (j > cfg.hres // 2).astype(jnp.int32)
    return line.astype(jnp.int32), field


def _line_scan(cfg: SystemConfig, inp2d, hsync0, ccf0, vsync, hue_sn, hue_cs,
               saturation, outh, v_fac, field_px, do_hsync: bool = True):
    """Per-line sequential pass: hsync chase, ccf EMA, decode-wave derivation
    (crt_core.c:409-536).  Batched: inp2d (B, V, H) int8, carries (B, ...).

    TPU reformulation: the hsync search result is *tabulated for every
    possible hsync value at once* (16 fused shifted adds over padded line
    rows), so the serial chain over lines degenerates to one tiny table
    lookup per step.  With the hsync sequence known, the burst windows for
    all lines extract in one batched two-stage shift, and the ccf EMA scan
    runs entirely on (B, cc) vectors — the line loop touches no signal
    memory at all."""
    CC = cfg.cc_samples
    B = inp2d.shape[0]
    L = cfg.lines
    H, V = cfg.hres, cfg.vres
    W = cfg.hsync_window
    lines = np.arange(cfg.top, cfg.bot, dtype=np.int64)

    # beg/end/active are data-independent given field_px (crt_core.c:428-431)
    lrel = jnp.asarray(lines - cfg.top, jnp.int32)[None, :]
    beg_l = (lrel * (outh + v_fac)) // cfg.lines + field_px[:, None]
    end_l = ((lrel + 1) * (outh + v_fac)) // cfg.lines + field_px[:, None]
    active_l = beg_l < outh                               # (B, L)

    # padded per-line rows: row l = inp row (l + vsync) mod V, plus spill
    # into the following row (flat-indexing semantics; wraps at the bottom
    # where the reference reads OOB — UB)
    # spill must cover the furthest read: burst window at the max hsync
    # (cb_beg + burst_len) and the hsync search window (sync_beg + 2W)
    PAD = max(cfg.cb_beg + cfg.burst_len, cfg.sync_beg + 2 * W) + 2 * W
    PAD += (-(H + PAD)) % 128      # lane-align H+PAD so the hsync scan can
    #                                view rows as (nblk, 128) blocks for free
    # ONE roll serves both this scan and the caller's line extraction: the
    # extraction rows are the same lines nudged by ynudge=+3
    # (crt_core.c:428), i.e. static row slices of a (L+4)-row roll — one
    # fewer full-signal one-hot select pass per step
    row_idx4 = posmod(cfg.top
                      + jnp.arange(L + 4, dtype=jnp.int32)[None, :]
                      + vsync[:, None], V)
    rolled4 = fastpath.select_rows_batched(
        inp2d, row_idx4).astype(jnp.int8)                 # (B, L+4, H)
    rolled = rolled4[:, :L + 1]
    rows2 = jnp.concatenate([rolled[:, :L],
                             rolled[:, 1:, :PAD]], axis=2)  # (B, L, H+PAD)
    # Layout pins (utils/layouts.py, opt-in): the hsync scan's while-loop
    # wants rows2 L-major ({HP, B, L} minor-to-major) while the concat
    # producer emits row-major — XLA bridges with two full relayout copies
    # (~1.24 ms/step on PV1K).  "rows2" pins the scan's layout at the
    # producer; "rows2b" the burst-select's B-minor alternative.
    from ntsc_crt_tpu.utils import layouts as _lay
    rows2 = _lay.pin(rows2, "rows2", (1, 0, 2))
    rows2 = _lay.pin(rows2, "rows2b", (1, 2, 0))

    # The in-register Pallas chase executes in ~0.22 ms (vs ~1.75 ms for the
    # XLA scan) but needs the rows in a (line, sample, batch) layout, and at
    # large batch the int8->int32 word-pack + relayout XLA emits for that
    # costs ~3.7 ms/step (283 MB u32 blowup, T(4,128) copies — r4 kernel
    # trace) — a net loss.  At small batch the prep is trivial (<300 KB)
    # while the scan still pays the full 240-line serial chain, so the
    # kernel is gated to the latency regime.  NTSC_CRT_HSYNC_KERNEL=1/0
    # forces it on/off for A/B runs.
    _hsk_env = os.environ.get("NTSC_CRT_HSYNC_KERNEL", "")
    # NTSC_CRT_HSYNC_EINSUM: "1"/"i8", "bf16" or "i32" — the MXU transpose
    # output dtype the chase kernel reads (see hsync_scan.hsync_chase)
    _hsk_edt = os.environ.get("NTSC_CRT_HSYNC_EINSUM", "")
    _hsk_edt = {"1": "i8"}.get(_hsk_edt, _hsk_edt)
    _hsk_einsum = _hsk_edt in ("i8", "bf16", "i32")
    # direct-transpose prep (r5): at big batch the burst extraction already
    # forces a batch-minor ({0,2,1}) materialization of rows2, so the
    # (L, HP, B) view the sample-granularity chase kernel wants is a free
    # layout bitcast — the 240-line XLA scan (~1.75 ms/step) and its
    # {3,2,0,1} relayout copy (~0.6 ms/step) collapse into the ~0.2 ms
    # chase.  NTSC_CRT_HSYNC_DIRECT=0 restores the XLA scan for A/B.
    _hsk_direct = (B >= _BIG_BATCH and not _hsk_einsum
                   and _hsk_env != "0"
                   and os.environ.get("NTSC_CRT_HSYNC_DIRECT", "") != "0")
    _use_hsk = (do_hsync and _HSYNC_SCAN and filters._use_pallas()
                and not spatial.active()
                and (_hsk_env == "1" or _hsk_einsum or _hsk_direct
                     or (_hsk_env != "0" and B < _BIG_BATCH)))
    if _use_hsk:
        # --- in-register hsync chase (ops/pallas/hsync_scan.py) ------------
        # The XLA scan branch below is dispatch-overhead-bound (~20 small
        # ops x 240 lines ~ 1.75 ms/step, docs/PERF.md); the kernel carries
        # the estimate in VMEM scratch across a sequential line grid and
        # pulls each window with a rebase + residual-gated funnel.
        thresh = cfg.hsync_thresh * cfg.sync_level
        c0 = cfg.sync_beg - W
        HP = rows2.shape[2]
        assert c0 >= 0, \
            f"{cfg.name}: sync_beg ({cfg.sync_beg}) < hsync window ({W})"
        assert H - 1 + c0 + 2 * W <= HP, f"{cfg.name}: PAD too small"
        from ntsc_crt_tpu.ops.pallas import hsync_scan as _hsk
        hseq_bl = _hsk.hsync_chase(
            rows2, active_l, i32(hsync0), W=W, c0=c0, thresh=thresh,
            H=H, interpret=filters._pallas_interpret(),
            einsum_prep=_hsk_einsum and B >= _BIG_BATCH,
            prep_dtype=_hsk_edt if _hsk_einsum else "i8",
            direct_t=_hsk_direct)
        hsync_l = lax.optimization_barrier(hseq_bl)       # (B, L)
        hsync_f = hsync_l[:, L - 1]
    elif do_hsync and _HSYNC_SCAN:
        # --- hsync search on demand inside the line scan -------------------
        # The reference probes ONE 16-sample window per line, at the running
        # hsync estimate (crt_core.c:434-450).  Tabulating the first-hit for
        # every candidate column (the previous formulation) costs 2W full
        # passes over the (B, L, H) table — measured as the single largest
        # kernel in every system's step (~17% of NTSC, ~16% of PV1K), bound
        # by the per-pass misaligned lane-slice relayouts.  Instead, pull
        # the window out per line with two one-hot stages (gather-free):
        # 128-wide block pair select, then an in-pair one-hot correlation.
        thresh = cfg.hsync_thresh * cfg.sync_level
        c0 = cfg.sync_beg - W
        tW = 2 * W
        HP = rows2.shape[2]
        nblk = HP // 128                                  # PAD lane-aligns
        # The 128-block pair select below silently reads ZEROS (wrong window
        # sums -> corrupted hsync chase) if base = hsync + c0 goes negative
        # or the straddling block q+1 reaches nblk.  All shipped configs are
        # safe, but NTSC sits exactly at the boundary — fail loudly at trace
        # time for any future SystemConfig that violates the margins
        # (ADVICE.md r2 #1).
        assert c0 >= 0, \
            f"{cfg.name}: sync_beg ({cfg.sync_beg}) < hsync window ({W})"
        assert ((H - 1 + c0) >> 7) + 1 < nblk, \
            (f"{cfg.name}: hsync probe block q+1 can reach nblk={nblk} "
             f"(H={H}, c0={c0}) — bump PAD")
        blocks = rows2.reshape(B, L, nblk, 128)
        dt = fastpath._mm_dtype()
        iota_n = jnp.arange(nblk, dtype=jnp.int32)

        iota_2 = jnp.arange(2, dtype=jnp.int32)
        iota_3 = jnp.arange(3, dtype=jnp.int32)
        iota_g = jnp.arange(16, dtype=jnp.int32)
        iota_48 = jnp.arange(48, dtype=jnp.int32)

        def hstep(hsync, i):
            blk = lax.dynamic_index_in_dim(blocks, i, axis=1, keepdims=False)
            act = lax.dynamic_index_in_dim(active_l, i, axis=1,
                                           keepdims=False)
            base = hsync + c0                             # (B,) in [c0, H+c0)
            q, r = base >> 7, base & 127
            bl = blk.astype(dt)                           # (B, nblk, 128)
            # 128-block pair [q, q+1] in one 2-hot select
            oh2 = (iota_n[None, None] ==
                   (q[:, None] + iota_2[None])[..., None]).astype(dt)
            bp = jnp.einsum("bkn,bnm->bkm", oh2, bl,
                            preferred_element_type=jnp.float32)
            bp = bp.reshape(B, 16, 16).astype(dt)         # (B, 256) as 16x16
            q2, r2 = r >> 4, r & 15
            if B >= _BIG_BATCH:
                # 3-granule window [q2, q2+2] covers samples
                # [16*q2, 16*q2+48), which contains the probe window
                # [base, base+tW) for any r2 = base & 15 (r2 + tW <= 47).
                # Threshold test on prefix sums directly in granule coords
                # — no per-row window extraction (the 32-slice one-hot
                # correlation below was the scan body's largest fusion at
                # big batch): run(t) = S[r2+t] - S_exc[r2], first t with
                # run <= thresh wins, fall-through keeps j = tW.
                oh3 = (iota_g[None, None] ==
                       (q2[:, None] + iota_3[None])[..., None]).astype(dt)
                pair = jnp.einsum("bkg,bgm->bkm", oh3, bp,
                                  preferred_element_type=jnp.float32)
                pair = pair.reshape(B, 48).astype(jnp.int32)
                S = jnp.cumsum(pair, axis=1)              # (B, 48) inclusive
                Sexc = jnp.pad(S, ((0, 0), (1, 0)))[:, :16]   # S_exc[p<16]
                S0 = fastpath.onehot_pick(Sexc, r2)       # (B,)
                hitp = ((S - S0[:, None] <= thresh)
                        & (iota_48[None] >= r2[:, None])
                        & (iota_48[None] < (r2 + tW)[:, None]))
                p_star = jnp.argmax(hitp, axis=1).astype(jnp.int32)
                j = jnp.where(jnp.any(hitp, axis=1), p_star - r2, tW)
            else:
                # latency-bound small batch: 16-granule pair + one-hot
                # window correlation (fewer, simpler fusions per line)
                oh3 = (iota_g[None, None] ==
                       (q2[:, None] + iota_2[None])[..., None]).astype(dt)
                pair = jnp.einsum("bkg,bgm->bkm", oh3, bp,
                                  preferred_element_type=jnp.float32)
                pair = pair.reshape(B, 32).astype(dt)
                # win[b, t] = pair[b, r2_b + t]
                F = jnp.pad((jnp.arange(32, dtype=jnp.int32)[None]
                             == r2[:, None]).astype(dt), ((0, 0), (tW, 0)))
                Fs = jnp.stack([F[:, tW - t:tW - t + 32] for t in range(tW)],
                               axis=2)                    # (B, 32, tW)
                win = jnp.einsum("bm,bmt->bt", pair, Fs,
                                 preferred_element_type=jnp.float32)
                run = jnp.cumsum(win.astype(jnp.int32), axis=1)
                hit = run <= thresh                       # first j wins
                j = jnp.where(jnp.any(hit, axis=1),
                              jnp.argmax(hit, axis=1).astype(jnp.int32), tW)
            nxt = posmod(j - W + hsync, H)
            hsync = jnp.where(act, nxt, hsync)
            return hsync, hsync

        def _serial_chain():
            # unroll trades while-loop trip count against body size for the
            # 240-line dispatch-bound chain; 8 measured best (r5 sweep
            # 8/16/32 — larger bodies stopped paying at 16)
            _unr = int(os.environ.get("NTSC_CRT_SCAN_UNROLL", "8"))
            _, hseq = lax.scan(hstep, i32(hsync0),
                               jnp.arange(L, dtype=jnp.int32), unroll=_unr)
            return jnp.swapaxes(hseq, 0, 1)                # (B, L)

        # --- Jacobi/fixpoint sweep (big-batch steady state) ----------------
        # The chain h_{l+1} = f_l(h_l) is serial, but when the chase is
        # LOCKED f_l is locally CONSTANT in h: if the sync edge sits at
        # absolute column a_l, the probe offset compensates the guess —
        # f_l(h) = a_l - c0 - W for any h whose window [h+c0, h+c0+2W)
        # still captures the edge.  So probing ALL lines in parallel at the
        # carried estimate and re-chaining converges in exactly 2 sweeps in
        # steady state (sweep 1 computes the a_l-anchored values, sweep 2
        # verifies the shifted chain is a fixpoint).  Each sweep is one
        # fused masked-select pass over the SAME (B, L, nblk, 128) blocks
        # view the burst extraction reads — no per-line dispatches, and no
        # while-carry relayout of the padded rows.  Prefix-exactness grows
        # by >= 1 line per sweep, so an unconverged frame (startup, heavy
        # noise) falls back to the serial scan after K sweeps under
        # lax.cond — the result is bit-exact in EVERY regime by
        # construction.
        #
        # STATUS: opt-in (NTSC_CRT_HSYNC_FIXPOINT=1), measured r4 NEGATIVE
        # at batch 256 — NTSC 10.5-10.6k vs 13.5-14.0k fps/chip with the
        # serial scan, PV1K 7.9-8.1k vs 9.9-10.0k (rotated A/B, 5 runs
        # each).  The convergence math holds (parity-pinned incl. the
        # fallback branch, test_hsync_fixpoint_matches_scan), but each
        # probe_all sweep re-reads the whole (B, L, nblk, 128) blocks view
        # and re-runs the einsum window build L-batched — ~4 sweeps of
        # that dwarf the 240-step scan's dispatch overhead, and the
        # while_loop walls off fusion with the neighbouring stages.  See
        # docs/PERF.md r4 negatives — don't redo.
        _fix_env = os.environ.get("NTSC_CRT_HSYNC_FIXPOINT", "")
        _use_fix = _fix_env == "1"
        if _use_fix:
            h0 = i32(hsync0)
            iota_bl48 = iota_48[None, None]                # (1, 1, 48)
            # probe_all formulation: the 2-hot pair select per (b, l) can be
            # nblk-1 masked accumulator passes over `blocks` ("select") or a
            # single batched one-hot MXU contraction ("einsum", the same
            # shape math as hstep's big-batch branch, L batched — one read
            # of blocks per sweep instead of nblk-1 accumulator rewrites).
            _fix_form = os.environ.get("NTSC_CRT_FIXPOINT_FORM", "einsum")

            def probe_all(G):
                """f_l(G[:, l]) for every line at once — identical window
                math to hstep's big-batch branch, L batched."""
                baseA = G + c0                             # (B, L)
                qA, rA = baseA >> 7, baseA & 127
                q2A, r2A = rA >> 4, rA & 15
                if _fix_form == "einsum":
                    oh2A = (iota_n[None, None, None] ==
                            (qA[..., None] + iota_2[None, None])[..., None]
                            ).astype(dt)                   # (B, L, 2, nblk)
                    pairA = jnp.einsum(
                        "blkn,blnm->blkm", oh2A, blocks.astype(dt),
                        preferred_element_type=jnp.float32)
                    pairA = pairA.reshape(B, L, 16, 16).astype(dt)
                    oh3A = (iota_g[None, None, None] ==
                            (q2A[..., None] + iota_3[None, None])[..., None]
                            ).astype(dt)                   # (B, L, 3, 16)
                    winA = jnp.einsum(
                        "blkg,blgm->blkm", oh3A, pairA,
                        preferred_element_type=jnp.float32)
                    winA = winA.reshape(B, L, 48).astype(jnp.int32)
                else:
                    z8 = jnp.int8(0)
                    pairA = jnp.zeros((B, L, 2, 128), jnp.int8)
                    for v in range(nblk - 1):
                        pairA = pairA + jnp.where(
                            (qA == v)[..., None, None],
                            blocks[:, :, v:v + 2], z8)
                    pairA = pairA.reshape(B, L, 256)
                    # 3-granule window [q2, q2+2] = samples [16q2, 16q2+48):
                    # contains [base, base+tW) for any r2 (r2 + tW <= 47);
                    # q2 <= 7 so the 48-slice stays inside the 256 pair
                    winA = jnp.zeros((B, L, 48), jnp.int8)
                    for v in range(8):
                        winA = winA + jnp.where(
                            (q2A == v)[..., None],
                            pairA[:, :, 16 * v:16 * v + 48], z8)
                    winA = winA.astype(jnp.int32)
                S = jnp.cumsum(winA, axis=-1)
                Sexc = jnp.pad(S, ((0, 0), (0, 0), (1, 0)))[:, :, :16]
                S0 = fastpath.onehot_pick(Sexc, r2A)       # (B, L)
                hitp = ((S - S0[..., None] <= thresh)
                        & (iota_bl48 >= r2A[..., None])
                        & (iota_bl48 < (r2A + tW)[..., None]))
                p_star = jnp.argmax(hitp, axis=-1).astype(jnp.int32)
                j = jnp.where(jnp.any(hitp, axis=-1), p_star - r2A, tW)
                nxt = posmod(j - W + G, H)
                return jnp.where(active_l, nxt, G)

            def sweep_body(c):
                G, _, _, it = c
                Y = probe_all(G)
                Gn = jnp.concatenate([h0[:, None], Y[:, :-1]], axis=1)
                return Gn, Y, jnp.all(Gn == G), it + 1

            def sweep_cond(c):
                _, _, done, it = c
                return jnp.logical_and(~done, it < _FIXPOINT_SWEEPS)

            G0 = jnp.broadcast_to(h0[:, None], (B, L))
            _, Yf, done, _ = lax.while_loop(
                sweep_cond, sweep_body,
                (G0, G0, jnp.asarray(False), jnp.asarray(0, jnp.int32)))
            # done=True certifies Yf: Yf was probed from a G equal to its
            # own shifted chain, so Yf[l] = f_l(Yf[l-1]) for every line —
            # exactly the scan's outputs.  Otherwise pay the serial chain.
            hsync_l = lax.cond(done, lambda: Yf, _serial_chain)
        else:
            hsync_l = _serial_chain()
        hsync_l = lax.optimization_barrier(hsync_l)        # (B, L)
        hsync_f = hsync_l[:, L - 1]
    elif do_hsync:
        # --- hsync transition table (crt_core.c:434-450, all h at once) ----
        # window at candidate h starts at column h + sync_beg - W; running
        # sum over 16 samples, first <= thresh wins; fall-through keeps i==W
        thresh = cfg.hsync_thresh * cfg.sync_level
        c0 = cfg.sync_beg - W
        # int16 running sums: |sum of <= 16 int8 samples| < 2^12
        run = jnp.zeros((B, L, H), jnp.int16)
        ib = jnp.full((B, L, H), W, jnp.int8)
        found = jnp.zeros((B, L, H), bool)
        for j in range(2 * W):
            run = run + rows2[:, :, c0 + j:c0 + j + H].astype(jnp.int16)
            hit = (run <= thresh) & ~found
            ib = jnp.where(hit, jnp.int8(j - W), ib)
            found = found | hit
        # (XLA fuses this whole chain into one pass over the padded rows.)
        ib = lax.optimization_barrier(ib)

        # --- serial hsync chain: one (B,) table lookup per line ------------
        def hstep(hsync, xs):
            ib_l, act = xs                                # (B, H) int8, (B,)
            d = jnp.take_along_axis(ib_l, hsync[:, None], axis=1)[:, 0]
            nxt = posmod(d.astype(jnp.int32) + hsync, H)
            hsync = jnp.where(act, nxt, hsync)
            return hsync, hsync

        hsync_f, hseq = lax.scan(
            hstep, i32(hsync0),
            (jnp.swapaxes(ib, 0, 1), jnp.swapaxes(active_l, 0, 1)), unroll=16)
        hsync_l = lax.optimization_barrier(jnp.swapaxes(hseq, 0, 1))  # (B, L)
    else:
        # CRT_DO_HSYNC=0 (crt_core.c:446-448): the search result is
        # discarded — every processed line pins v->hsync = 0
        ever = jnp.cumsum(active_l.astype(jnp.int32), axis=1) > 0
        hsync_l = jnp.where(ever, 0, i32(hsync0)[:, None])
        hsync_f = jnp.where(jnp.any(active_l, axis=1), 0, i32(hsync0))

    xpos_l = posmod(cfg.av_beg + hsync_l - 3, H)          # xnudge=-3
    ypos_l = posmod(jnp.asarray(lines, jnp.int32)[None, :]
                    + vsync[:, None] + 3, V)              # ynudge=+3
    vper_l = crem(ypos_l, cfg.cc_vper)                    # (B, L)

    # --- burst windows for every line: gather-free block-pair select -------
    # (was a wide shift_rows over (B*L, H+PAD) rows — the masked radix stack
    # plus its batch-minor relayout copies cost ~1 ms/step at batch 256; the
    # burst base is known for every line once the chase ran, so three
    # masked-select stages — 128-block pair, 16-granule, in-granule —
    # pull the burst_len samples over the SAME blocks view the hsync scan
    # reads, with no extra layout of the padded rows)
    if CC == 4:
        bbase = (hsync_l & ~3) + cfg.cb_beg               # crt_core.c:458
    else:
        bbase = (hsync_l - crem(hsync_l, CC)) + cfg.cb_beg
    HPb = rows2.shape[2]
    nblkb = HPb // 128
    assert ((cfg.cb_beg + H - 1) >> 7) + 1 < nblkb, \
        (f"{cfg.name}: burst block q+1 can reach nblk={nblkb} "
         f"(H={H}, cb_beg={cfg.cb_beg}) — bump PAD")
    qb, rb = bbase >> 7, bbase & 127
    # stage 1 — 128-block pair at lane-ALIGNED offsets (128v): the masked
    # adds fuse over rows2 in its native layout (aligned lane slices cost
    # no relayout, unlike the general shift stack).  The two fine stages
    # then run on small (B, L, 256 / 15+burst) intermediates, int8 until
    # the final widen.  (A batched one-hot einsum formulation lowered to a
    # convolution + a second 106 MB blocks relayout — measured ~1.4 ms/step
    # SLOWER than this; don't redo.)
    z8 = jnp.int8(0)
    blocksb = rows2.reshape(B, L, nblkb, 128)   # same view the hsync scan
    pair4 = jnp.zeros((B, L, 2, 128), jnp.int8)  # reads — shared layout
    for v in range(nblkb - 1):
        pair4 = pair4 + jnp.where((qb == v)[..., None, None],
                                  blocksb[:, :, v:v + 2], z8)
    pair = pair4.reshape(B, L, 256)
    w1 = 15 + cfg.burst_len
    gb = rb >> 4                                          # [0, 8)
    buf = jnp.zeros((B, L, w1), jnp.int8)
    for v in range(8):
        buf = buf + jnp.where((gb == v)[..., None],
                              pair[:, :, 16 * v:16 * v + w1], z8)
    r3b = rb & 15
    bvals = jnp.zeros((B, L, cfg.burst_len), jnp.int32)
    for v in range(16):                  # bvals[k] = rows2[bbase+k] exactly
        bvals = bvals + jnp.where(
            (r3b == v)[..., None],
            buf[:, :, v:v + cfg.burst_len].astype(jnp.int32), 0)
    m = cfg.burst_len // CC
    col_for_cls = np.asarray([(k - cfg.cb_beg) % CC for k in range(CC)])
    per_cls = bvals.reshape(B, L, m, CC)[:, :, :, jnp.asarray(col_for_cls)]

    # --- ccf EMA chain: serial across lines, tiny per-line compute ---------
    # NTSC_CRT_CCF_KERNEL=1 opts into the in-register Pallas chain
    # (ops/pallas/ccf_scan.py).  Measured r4: NTSC 14.1k vs 14.6k fps/chip
    # with the XLA scan — a ~3% END-TO-END REGRESSION (flat on PV1K); the
    # (L, ..., sub, LANE) prep transposes plus the 240-step serial grid
    # cost more than the scan's loop overhead saves (the unroll=16 scan
    # fuses its tiny per-line selects well).  Kept opt-in + parity-tested
    # like place_rows; the scan is the measured default.
    _cck_env = os.environ.get("NTSC_CRT_CCF_KERNEL", "")
    if (_cck_env == "1" and filters._use_pallas() and not spatial.active()):
        from ntsc_crt_tpu.ops.pallas import ccf_scan as _cck
        ccf_f, ccr_l = _cck.ccf_ema(
            per_cls, vper_l, active_l, jnp.asarray(ccf0, jnp.int32),
            interpret=filters._pallas_interpret())
    else:
        vp_oh_l = (vper_l[..., None] ==
                   jnp.arange(cfg.cc_vper, dtype=jnp.int32))  # (B, L, VP)

        def cstep(ccf, xs):
            pc, row_oh, act = xs      # (B, m, CC), (B, VP), (B,)
            ccr = jnp.sum(jnp.where(row_oh[:, :, None], ccf, 0), axis=1)
            ccr_new = ccr
            for mm in range(m):
                ccr_new = cdiv(ccr_new * 127, 128) + pc[:, mm]
            ccr = jnp.where(act[:, None], ccr_new, ccr)
            ccf = jnp.where(row_oh[:, :, None], ccr[:, None, :], ccf)
            return ccf, ccr

        ccf_f, ccr_seq = lax.scan(
            cstep, jnp.asarray(ccf0, jnp.int32),
            (jnp.swapaxes(per_cls, 0, 1), jnp.swapaxes(vp_oh_l, 0, 1),
             jnp.swapaxes(active_l, 0, 1)), unroll=16)
        ccr_l = jnp.swapaxes(ccr_seq, 0, 1)               # (B, L, CC)

    # --- decode waves, vectorized over lines --------------------------------
    phasealign = posmod(hsync_l, CC)                      # (B, L)

    def pick(off):
        return fastpath.onehot_pick(ccr_l, crem(phasealign + off, CC))

    if CC == 4:
        # 4-sample IQ extraction (crt_core.c:471-479)
        dci = pick(1) - pick(3)
        dcq = pick(2) - pick(0)
        hs = hue_sn[:, None]
        hc = hue_cs[:, None]
        w0 = ((dci * hc - dcq * hs) >> 4) * saturation[:, None]
        w1 = ((dcq * hc + dci * hs) >> 4) * saturation[:, None]
        wave_l = jnp.stack([w0, w1, -w0, -w1], axis=2)    # (B, L, 4)
        outs = (xpos_l, beg_l, end_l, active_l, wave_l)
    else:
        # 5-sample variant (crt_core.c:480-509)
        off180 = CC // 2
        off90 = CC // 4
        dciA = pick(off90)
        dciB = cdiv(pick(off90 + off180) + pick(off90 + off180 + 1), 2)
        dcqA = pick(off180)
        dcqB = pick(0)
        outs = (xpos_l, beg_l, end_l, active_l, dciA - dciB, dcqA - dcqB)
    return hsync_f, ccf_f, outs, rolled4


# ---------------------------------------------------------------------------
# Core decode
# ---------------------------------------------------------------------------


def demodulate_core(
    cfg: SystemConfig,
    analog: jax.Array,       # int8 (B, VRES, HRES)
    out_prev: jax.Array,     # uint8 (B, outh, outw, 3) canonical RGB
    hsync: jax.Array,        # (B,)
    vsync: jax.Array,        # (B,)
    ccf: jax.Array,          # int32 (B, cc_vper, cc_samples)
    rn: jax.Array,           # (B,)
    noise,
    mon: MonitorParams,
    *,
    randstate: jax.Array = None,
    v_fac: int = 0,
    eq_mode: str = "threeband",
    do_bloom: bool = False,
    do_vsync: bool = True,
    do_hsync: bool = True,
) -> tuple[jax.Array, dict]:
    """One decode pass.  Returns (rgb uint8 (B,outh,outw,3), new state dict
    with keys hsync/vsync/ccf/rn/randstate/inp)."""
    B, outh, outw = out_prev.shape[0], out_prev.shape[1], out_prev.shape[2]
    CC = cfg.cc_samples
    L = cfg.lines
    AV = cfg.av_len
    H, V = cfg.hres, cfg.vres
    noise = _b(noise, B)

    bright = _b(mon.brightness, B) - (cfg.black_level + _b(mon.black_point, B))

    hue_ang = (crem(_b(mon.hue, B), 360) + 33) * 8192
    sn, cs = sincos14(cdiv(hue_ang, 180))
    hue_sn, hue_cs = sn >> 11, cs >> 11                  # crt_core.c:318-320
    saturation = _b(mon.saturation, B)

    analog8 = jnp.asarray(analog, jnp.int8)
    if cfg.vhs_noise:
        inp_flat, randstate, rn_new = _inject_noise_vhs(
            cfg, analog8.reshape(B, -1), _b(randstate, B), noise)
        inp2d_pre = _row_major(inp_flat.reshape(B, V, H))
    else:
        inp2d_pre, rn_new = _inject_noise(cfg, analog8, _b(rn, B), noise)

    # Phase fences: the tunneled-TPU XLA pipeline has been observed to
    # miscompile fusions that span the sync-recovery scans and the grouped
    # convs (zeros out conv outputs / corrupts table lookups).  Barriers at
    # the natural phase seams keep each phase its own fusion island at
    # negligible cost (the phases are separated by big materializations
    # anyway).
    inp2d = lax.optimization_barrier(inp2d_pre)
    if do_vsync:
        vsync_new, field = _find_vsync(cfg, inp2d, _b(vsync, B))
    else:
        # CRT_DO_VSYNC=0 (crt_core.c:323-341): the field parity is recovered
        # from the CLEAN signal (pre-noise) and the vsync position is pinned
        # to -3 instead of searched
        _, field = _find_vsync(cfg, analog8, _b(vsync, B))
        vsync_new = jnp.full((B,), -3, jnp.int32)

    ratio = ((outh << 16) // cfg.lines + 32768) >> 16    # static
    field_px = field * (ratio // 2)                      # (B,)

    vsync_new, field_px = lax.optimization_barrier((vsync_new, field_px))
    hsync_new, ccf_new, outs, rolled4 = _line_scan(
        cfg, inp2d, _b(hsync, B), jnp.asarray(ccf, jnp.int32), vsync_new,
        hue_sn, hue_cs, saturation, outh, v_fac, field_px, do_hsync=do_hsync)
    outs = lax.optimization_barrier(outs)

    if CC == 4:
        xpos_l, beg_l, end_l, active_l, wave_l = outs    # (B,L,...), wave (B,L,4)
    else:
        xpos_l, beg_l, end_l, active_l, dci_l, dcq_l = outs
        # wave tables rotated by hue (crt_core.c:499-509)
        kk = jnp.arange(CC, dtype=jnp.int32)[None, :]
        base_ang = crem(_b(mon.hue, B), 360)[:, None] + kk * (360 // CC)
        snI, csI = sincos14(cdiv(base_ang * 8192, 180))
        snQ, csQ = sincos14(cdiv((base_ang + 90) * 8192, 180))
        sat = saturation[:, None, None]
        waveI_l = ((dci_l[..., None] * csI[:, None, :]
                    + dcq_l[..., None] * snI[:, None, :]) >> 15) * sat
        waveQ_l = ((dci_l[..., None] * csQ[:, None, :]
                    + dcq_l[..., None] * snQ[:, None, :]) >> 15) * sat

    # --- line extraction: sig[b, l, i] = inp[b, pos + i] -------------------
    # row component: scalar roll by (vsync + 3); column: per-line shift by
    # xpos_l as a grouped one-hot conv over flattened rows.  Reads past a
    # row continue into the next; past the last line wrap to the top (the
    # reference reads OOB there — UB — e.g. under VHS aberration).
    rolled = rolled4[:, 3:]    # rows l+3: one shared roll with _line_scan

    if do_bloom:
        # beam-energy bloom (crt_core.c:512-526): a per-line EMA of scanline
        # energy modulates the drawn line width.  The line sum is computed
        # gather-free from the two row planes (the [xpos, xpos+AV) window
        # spills into the next row) so neither path needs an aligned-sig
        # materialization just for the sums.
        max_e = (128 + cdiv(noise, 2)) * AV              # scalar/(B,)
        iota_h = jnp.arange(H, dtype=jnp.int32)
        xa = xpos_l[..., None]                           # (B, L, 1)
        in_w = (iota_h >= xa) & (iota_h < xa + AV)
        in_spill = iota_h < (xa + AV - H)
        s_sum = (jnp.sum(jnp.where(in_w, rolled[:, :L].astype(jnp.int32), 0),
                         axis=2)
                 + jnp.sum(jnp.where(in_spill,
                                     rolled[:, 1:].astype(jnp.int32), 0),
                           axis=2))                      # (B, L)

        def bloom_step(prev_e, s_l):
            prev_e = cdiv(prev_e * 123, 128) + \
                cdiv(((max_e >> 1) - s_l) << 10, max_e)
            return prev_e, prev_e

        init_e = jnp.full((B,), 16384 // 8, jnp.int32)
        _, prev_e = lax.scan(bloom_step, init_e, s_sum.T, unroll=16)
        prev_e = prev_e.T                                # (B, L)
        line_w = (AV * 112 // 128) + (prev_e >> 9)
        dx_l = (line_w << 12) // outw
        scanL_l = ((AV // 2) - (line_w >> 1) + 8) << 12
        Lidx = scanL_l >> 12                             # per-line EQ start

    # --- fused fast path: per-line alignment + EQ + scan conversion in one
    # Pallas kernel (the per-line shift happens in-kernel where the sample
    # axis is the major block dim — see ops/pallas/decode_fused.py).  Bloom
    # rides the same kernel with a per-row dynamic scan conversion; its
    # serial prev_e chain crosses line shards, so it stays portable under
    # spatial sharding.
    fused_ok = (filters._use_pallas()
                and (eq_mode == "threeband"
                     or (eq_mode.startswith("conv") and CC == 4))
                and not (do_bloom and spatial.active()))
    if fused_ok:
        from ntsc_crt_tpu.ops.pallas import decode_fused as _df
        ctr = jnp.broadcast_to(_b(mon.contrast, B)[:, None], (B, L))
        brr = jnp.broadcast_to(bright[:, None], (B, L))
        if CC == 4:
            # Q wave is the I table rotated by 3 (crt_core.c:541-542)
            wvI_l, wvQ_l = wave_l, jnp.roll(wave_l, -3, axis=-1)
        else:
            wvI_l, wvQ_l = waveI_l, waveQ_l
        interp = filters._pallas_interpret()
        if eq_mode == "threeband":
            eqY, eqI, eqQ = _eq_coefs(cfg)
            coefs3 = (tuple(eqY), tuple(eqI), tuple(eqQ))
        else:  # USE_CONVOLUTION FIR build, fused (crt_core.c:96-147)
            coefs3 = ("conv", int(eq_mode.removeprefix("conv")))
        valid = None
        sh_rows = xpos_l
        max_sh = H - 1
        extra = ()
        if do_bloom:
            # static bound on the per-line EQ start: |prev_e| is capped by
            # its EMA fixpoint 1536*128/5 (|s| <= 128*AV <= max_e, so the
            # per-step increment is <= 1536) -> prev_e>>9 in [-77, 76]
            lw_min = AV * 112 // 128 - 77
            max_sh = H - 1 + (AV // 2 - lw_min // 2 + 8)
            sh_rows = xpos_l + Lidx            # EQ starts at scanL>>12
            rot = Lidx % CC                    # carrier phase at the start

            def _rot_tab(w):                   # w: (B, L, CC)
                out = w
                for v in range(1, CC):
                    out = jnp.where((rot == v)[..., None],
                                    jnp.roll(w, -v, axis=-1), out)
                return out

            wvI_l, wvQ_l = _rot_tab(wvI_l), _rot_tab(wvQ_l)
            # pixels past scanR keep the previous frame's output
            # (crt_core.c:555 loop bound) — masked in row placement
            valid = (scanL_l[..., None]
                     + jnp.arange(outw, dtype=jnp.int32)
                     * dx_l[..., None]) < ((AV - 1) << 12)
            extra = (dx_l.reshape(B * L), Lidx.reshape(B * L))

        def _fused_call(e_, eh_, sh_, wi_, wq_, br_, ct_, *bl_):
            bkw = (dict(bloom_dx=bl_[0], bloom_lidx=bl_[1]) if bl_ else {})
            return _df.decode_fused_rows(
                e_, sh_, wi_, wq_, br_, ct_, ext_hi=eh_, outw=outw,
                av_len=AV, max_shift=max_sh, coefs=coefs3, interpret=interp,
                **bkw)

        # the two row planes (line l / line l+1) go in separately — the
        # kernel concatenates them in VMEM, so neither the (B, L, 2H)
        # concat nor any XLA-side coarse pre-shift ever hits HBM
        extA = spatial.shard_lines(rolled[:, :L], 1, tag="rows_ext")
        extB = spatial.shard_lines(rolled[:, 1:], 1, tag="rows_ext_hi")
        # "extflat" pin: decode_fused consumes the planes sample-major
        # (rowsT tiling); pinning the flat (R, H) form column-major lets the
        # plane-split fusion write the kernel's orientation directly instead
        # of a row-major materialization + a second transpose copy
        # (~0.97 ms/step on PV1K — docs/PERF.md "pair transposes").
        from ntsc_crt_tpu.utils import layouts as _lay
        extAf = _lay.pin(extA.astype(jnp.int8).reshape(B * L, H),
                         "extflat", (1, 0))
        extBf = _lay.pin(extB.astype(jnp.int8).reshape(B * L, H),
                         "extflat", (1, 0))
        r8, g8, b8 = spatial.shard_rows_call(
            _fused_call,
            extAf,
            extBf,
            sh_rows.reshape(B * L),
            wvI_l.reshape(B * L, CC), wvQ_l.reshape(B * L, CC),
            brr.reshape(B * L), ctr.reshape(B * L), *extra)
        rgb = jnp.stack([r8, g8, b8], axis=-1).reshape(B, L, outw, 3)
        out_new = _place_rows(cfg, rgb, out_prev, beg_l, end_l, active_l,
                              mon.blend, mon.scanlines, outh,
                              valid=valid, field_px=field_px, v_fac=v_fac)
        state = dict(hsync=hsync_new, vsync=vsync_new, ccf=ccf_new,
                     rn=rn_new, randstate=randstate, inp=inp2d)
        return out_new, state

    rows_ext = jnp.concatenate([rolled[:, :L], rolled[:, 1:]], axis=2)
    rows_ext = spatial.shard_lines(rows_ext, 1, tag="rows_ext")
    sig = fastpath.shift_rows(rows_ext.reshape(B * L, 2 * H),
                              xpos_l.reshape(B * L), AV,
                              max_shift=H - 1).reshape(B, L, AV)
    sig = spatial.shard_lines(sig, 1, tag="sig")

    if CC == 4:
        wv_i = fastpath.tile_period(wave_l, AV, 0)       # (B, L, AV)
        wv_q = fastpath.tile_period(wave_l, AV, 3)
    else:
        wv_i = fastpath.tile_period(waveI_l, AV, 0)
        wv_q = fastpath.tile_period(waveQ_l, AV, 0)

    if do_bloom:
        # per-line dx/scanL/Lidx computed above (shared with the fused path)
        # shift each line so the EQ recurrence starts at its scanL
        pad = jnp.pad(sig, ((0, 0), (0, 0), (0, AV)))
        sig = fastpath.shift_rows(pad.reshape(B * L, 2 * AV),
                                  jnp.clip(Lidx, 0, AV).reshape(B * L),
                                  AV).reshape(B, L, AV)
        wv_i = fastpath.onehot_pick(
            wave_l[:, :, None, :] if CC == 4 else waveI_l[:, :, None, :],
            crem(jnp.arange(AV, dtype=jnp.int32)[None, None, :]
                 + Lidx[..., None], CC))
        wv_q = fastpath.onehot_pick(
            wave_l[:, :, None, :] if CC == 4 else waveQ_l[:, :, None, :],
            crem(jnp.arange(AV, dtype=jnp.int32)[None, None, :]
                 + Lidx[..., None] + (3 if CC == 4 else 0), CC))

    y_in = sig + bright[:, None, None]
    i_in = (sig * wv_i) >> 9
    q_in = (sig * wv_q) >> 9

    stacked = jnp.stack([y_in, i_in, q_in], axis=2)      # (B, L, 3, AV)
    stacked = spatial.shard_lines(stacked, 1, tag="yiq")
    if eq_mode == "threeband":
        eqY, eqI, eqQ = _eq_coefs(cfg)
        mk = lambda *v: jnp.asarray(v, jnp.int32)[None, None, :]
        eqd = filters.eq_threeband(
            stacked,
            mk(eqY.lf, eqI.lf, eqQ.lf), mk(eqY.hf, eqI.hf, eqQ.hf),
            mk(eqY.g_lo, eqI.g_lo, eqQ.g_lo),
            mk(eqY.g_mid, eqI.g_mid, eqQ.g_mid),
            mk(eqY.g_hi, eqI.g_hi, eqQ.g_hi))
    else:
        # the reference's USE_CONVOLUTION build (crt_core.c:96-147)
        assert CC == 4, "convolution EQ requires 4-sample chroma (crt_core.c:90)"
        eqd = filters.eq_convolution(stacked, int(eq_mode.removeprefix("conv")))
    oy = eqd[:, :, 0] << 4                               # crt_core.c:540
    oi = eqd[:, :, 1] >> 3
    oq = eqd[:, :, 2] >> 3

    # ---- scan conversion (crt_core.c:555-611) ------------------------------
    if do_bloom:
        # variable line width (crt_core.c:512-532): pos = scanL + p*dx with
        # per-line dx; since scanL's low 12 bits are zero and the EQ output
        # was shifted to start at scanL, sample index = (p*dx) >> 12.
        p_ = jnp.arange(outw, dtype=jnp.int32)[None, None, :]
        rel = p_ * dx_l[..., None]                        # (B, L, outw)
        valid = (scanL_l[..., None] + rel) < ((AV - 1) << 12)
        s_rel = jnp.clip(rel >> 12, 0, AV - 2)
        Rw = rel & 0xFFF
        Lw = 0xFFF - Rw

        def lerp_dyn(v, sh):
            a = jnp.take_along_axis(v, s_rel, axis=2)
            bb = jnp.take_along_axis(v, s_rel + 1, axis=2)
            # the reference's bloom EQ loop runs i < R = AV_LEN-1, so
            # out[AV_LEN-1] is never written and reads as static zero
            # (crt_core.c:525-543, 565-566); our shifted buffer holds an
            # EQ-of-padding value there instead — force it to zero
            bb = jnp.where(s_rel + 1 == (AV - 1) - Lidx[..., None], 0, bb)
            return ((a * Lw) >> sh) + ((bb * Rw) >> sh)

        yv = lerp_dyn(oy, 2)
        iv = lerp_dyn(oi, 14)
        qv = lerp_dyn(oq, 14)
    elif filters._use_pallas():
        # fused Pallas kernel: lerp + YIQ->RGB + contrast + clamp + pack
        from ntsc_crt_tpu.ops.pallas import scanconv_pallas as _sc
        valid = None
        ctr = jnp.broadcast_to(_b(mon.contrast, B)[:, None], (B, L))
        interp = filters._pallas_interpret()
        packed = spatial.shard_rows_call(
            lambda y_, i_, q_, c_: _sc.scanconv_rows(
                y_, i_, q_, c_, outw=outw, interpret=interp),
            oy.reshape(B * L, AV), oi.reshape(B * L, AV),
            oq.reshape(B * L, AV), ctr.reshape(B * L)).reshape(B, L, outw)
        rgb = jnp.stack([(packed >> 16) & 0xFF, (packed >> 8) & 0xFF,
                         packed & 0xFF], axis=-1)
    else:
        valid = None
        wide = _lerp_wide_needed(saturation, bright)
        yv = fastpath.lerp_resample(oy, outw, 2, wide=wide)
        iv = fastpath.lerp_resample(oi, outw, 14, wide=wide)
        qv = fastpath.lerp_resample(oq, outw, 14, wide=wide)

    if valid is not None or not filters._use_pallas():
        contrast = _b(mon.contrast, B)[:, None, None]
        r = (((yv + 3879 * iv + 2556 * qv) >> 12) * contrast) >> 8
        g = (((yv - 1126 * iv - 2605 * qv) >> 12) * contrast) >> 8
        b = (((yv - 4530 * iv + 7021 * qv) >> 12) * contrast) >> 8
        rgb = jnp.clip(jnp.stack([r, g, b], axis=-1), 0, 255)  # (B, L, outw, 3)

    rgb = spatial.shard_lines(rgb, 1, tag="rgb")
    out_new = _place_rows(cfg, rgb, out_prev, beg_l, end_l, active_l,
                          _b(mon.blend, B), _b(mon.scanlines, B), outh,
                          valid=valid, field_px=field_px, v_fac=v_fac)
    out_new = spatial.shard_lines(out_new, 1, tag="out")

    state = dict(hsync=hsync_new, vsync=vsync_new, ccf=ccf_new, rn=rn_new,
                 randstate=randstate, inp=inp2d)
    return out_new, state


def _concrete_int(x):
    """Python int if x is a trace-time constant, else None."""
    if isinstance(x, jax.core.Tracer):
        return None
    arr = np.asarray(x)
    if arr.ndim == 0 or (arr == arr.ravel()[0]).all():
        return int(arr.ravel()[0])
    return None


def _concrete_max_abs(x):
    """max |x| if x is a trace-time constant (any shape), else None."""
    if isinstance(x, jax.core.Tracer):
        return None
    return int(np.max(np.abs(np.asarray(x))))


def _lerp_wide_needed(saturation, bright) -> bool:
    """Trace-time selection of the scan-conversion limb width (VERDICT r3
    weak #4): the 3-limb MXU lerp is exact for |YIQ| < 2^21, and the decoded
    magnitudes are bounded by the monitor knobs —

      |sig| <= 127 (clipped int8), |ccr| <= 127*128 (EMA geometric bound,
      crt_core.c:462-466), so |wave| <= ((2*16256*16) >> 4)*|sat| and
      |i_in| = |(sig*wave) >> 9| <= ~2^14*|sat|; the 3-band/conv EQ
      amplifies < 3x (unity-capped band gains, crt_core.c:277-287), so
      |oi|,|oq| <= ~6200*|sat| and |oy| <= 48*(127 + |bright|).

    |sat| <= 127 and |bright| <= 16384 therefore keep every lerp input
    under 2^21 with >2x margin.  When the knobs are trace-time constants
    inside those bounds the fast 3-limb form is provably exact; any traced
    or out-of-bounds knob auto-selects the 5-limb mod-2^32 form — no knob
    combination can silently leave the exactness envelope.
    NTSC_CRT_LERP_WIDE=1/0 force-overrides for A/B measurement."""
    env = os.environ.get("NTSC_CRT_LERP_WIDE")
    if env == "1":
        return True
    if env == "0":
        return False
    sat_c = _concrete_max_abs(saturation)
    br_c = _concrete_max_abs(bright)
    return (sat_c is None or sat_c > 127
            or br_c is None or br_c > 16384)


def _place_rows_uniform(cfg, rgb, out_prev, field_px, blend: int,
                        scanlines: int, outh, ratio: int):
    """Fast row placement for the uniform case outh == ratio * CRT_LINES:
    line l covers rows [ratio*l + f, ratio*(l+1) + f), the first written,
    the next ratio-1-scanlines duplicated — a static jnp.repeat plus strided
    slices instead of one-hot matmuls.  Bit-identical to _place_rows."""
    B, L = rgb.shape[0], rgb.shape[1]
    # all-uint8 data path: values stay < 256 throughout (the 50/50 blend is
    # (c>>1)+(o>>1) <= 254), quartering the HBM traffic vs int32
    rgb8 = jnp.asarray(rgb, jnp.uint8)
    old = jnp.asarray(out_prev, jnp.uint8)
    rows = jnp.arange(outh, dtype=jnp.int32)

    # the odd-field shift is the reference's `field * (ratio/2)` where ratio
    # is round(outh / CRT_LINES) — NOT the uniform repeat factor, which
    # differs when v_fac > 0 (crt_core.c:404-407)
    fp = ((((outh << 16) // L) + 32768) >> 16) // 2

    if outh == ratio * L:
        _pk = os.environ.get("NTSC_CRT_PLACE_KERNEL", "")
        if filters._use_pallas() and not spatial.active() and _pk:
            # single-pass Pallas store kernels (ops/pallas/place_rows.py):
            # emit the final interleaved output directly.  OPT-IN ONLY —
            # =1 (grid (B,), per-slot strided stores) measured a 25%
            # end-to-end REGRESSION vs the stacked XLA form on v5e (PV1K
            # 7,574 vs 10,044 fps/chip, r3); =2 is the multi-row grid
            # (one stacked store per TL-row tile) — see docs/PERF.md for
            # its measured A/B.  Bit-exactness asserted in interpret mode
            # (tests/test_pallas_kernels.py).
            from ntsc_crt_tpu.ops.pallas import place_rows as _pr
            if _pk == "2":
                return _pr.place_rows_uniform_tiled(
                    rgb8, old, field_px, blend=blend, scanlines=scanlines,
                    ratio=ratio, fp=fp,
                    tile_rows=int(os.environ.get("NTSC_CRT_PLACE_TL", "0")),
                    interpret=filters._pallas_interpret())
            return _pr.place_rows_uniform(
                rgb8, old, field_px, blend=blend, scanlines=scanlines,
                ratio=ratio, fp=fp, interpret=filters._pallas_interpret())
        # stacked single-pass form: view the output as (L, ratio) row
        # groups.  Output row r = ratio*k + j reads rgb[k - (j < f)] (f the
        # per-slot field shift), blends against old[beg = f + ratio*(that
        # k)], and the scanline-gap mask is constant per (slot, j) — every
        # select is elementwise in the stacked view and the final reshape
        # is a relayout-free bitcast.  (Concat/slice row-shift forms break
        # XLA fusion and cost 2x the passes.)
        w = rgb.shape[2]
        old_stk = old.reshape(B, L, ratio, w, 3)
        fb = field_px > 0                                  # (B,)
        fb4 = fb[:, None, None, None]
        if fp:
            rgbm1 = jnp.concatenate([rgb8[:, :1], rgb8[:, :-1]], axis=1)
        k0 = (jnp.arange(L, dtype=jnp.int32) == 0)[None, :]
        kL = (jnp.arange(L, dtype=jnp.int32) == L - 1)[None, :]
        planes = []
        for j in range(ratio):
            shiftj = fp > 0 and j < fp                     # row k reads k-1
            src = jnp.where(fb4, rgbm1, rgb8) if shiftj else rgb8
            if blend:
                ob0 = old_stk[:, :, 0]                     # f = 0 beg rows
                if fp:
                    obf = old_stk[:, :, fp]
                    if shiftj:
                        obf = jnp.concatenate([obf[:, :1], obf[:, :-1]],
                                              axis=1)
                    old_beg = jnp.where(fb4, obf, ob0)
                else:
                    old_beg = ob0
                src = (src >> 1) + (old_beg >> 1)          # crt_core.c:608
            ks = jnp.where(fb, ((j - fp) % ratio) >= ratio - scanlines,
                           j >= ratio - scanlines)         # (B,)
            keep = ks[:, None]
            if fp > 0 and j < fp:
                keep = keep | (k0 & fb[:, None])           # rel < 0 rows
            if fp > 0 and j > fp and j >= ratio - scanlines:
                # bottom clip (crt_core.c:432): under the odd-field shift the
                # last group's end is clipped to outh, so its duplicate range
                # is [beg+1, outh - scanlines) — slots j >= ratio - scanlines
                # of group L-1 keep old even though mid-frame groups write
                keep = keep | (kL & fb[:, None])
            planes.append(jnp.where(keep[:, :, None, None],
                                    old_stk[:, :, j], src))
        return jnp.stack(planes, axis=2).reshape(B, outh, w, 3)

    content = jnp.repeat(rgb8, ratio, axis=1)

    def variant(f: int):
        if blend:
            # blend against the previous contents of each line's beg row,
            # for the beg row and all its duplicates (crt_core.c:552-664)
            beg_rows = old[:, f::ratio][:, :L]
            if beg_rows.shape[1] < L:  # outh < ratio*L (v_fac > 0): pad —
                beg_rows = jnp.pad(    # the excess rows are sliced off below
                    beg_rows,
                    ((0, 0), (0, L - beg_rows.shape[1]), (0, 0), (0, 0)))
            old_beg = jnp.repeat(beg_rows, ratio, axis=1)
            cnt = (content >> 1) + (old_beg >> 1)
        else:
            cnt = content
        # shift down by f rows; rows < f and scanline gaps keep old contents
        if f:
            cnt = jnp.concatenate([old[:, :f], cnt[:, :outh - f]], axis=1)
        else:
            cnt = cnt[:, :outh]
        rel = rows - f
        keep_old = ((rel % ratio) >= (ratio - scanlines)) & (rel >= 0)             | (rel < 0)
        return jnp.where(keep_old[None, :, None, None], old, cnt)

    base = variant(0)
    if fp == 0:
        return base
    shifted = variant(fp)
    return jnp.where((field_px > 0)[:, None, None, None], shifted, base)


def _place_rows(cfg, rgb, out_prev, beg_l, end_l, active_l, blend, scanlines,
                outh, valid=None, field_px=None, v_fac=0):
    """Reproduce the reference's sequential row writes (store at `beg`,
    memcpy-duplicate up to `end - scanlines`, blend vs previous contents;
    crt_core.c:552-664) as a pure per-output-row one-hot select.

    Exactness note: resolves overlapping writes by "last line wins", which is
    identical to the C semantics whenever line `beg`s are strictly increasing
    — true iff outh + v_fac >= CRT_LINES (standard usage; e.g. 480 >= 240).
    For smaller outputs with blend enabled the reference would blend against
    rows written earlier in the same call; callers wanting that regime should
    lower blend or use outh >= CRT_LINES.
    """
    B, L = rgb.shape[0], rgb.shape[1]
    bl_c = _concrete_int(blend)
    sl_c = _concrete_int(scanlines)
    if (valid is None and field_px is not None and bl_c is not None
            and sl_c is not None and (outh + v_fac) % L == 0
            and 0 <= sl_c < (outh + v_fac) // L):
        return _place_rows_uniform(cfg, rgb, out_prev, field_px, bl_c, sl_c,
                                   outh, (outh + v_fac) // L)
    # general path indexes blend/scanlines per batch slot — lift scalars.
    # (Do this AFTER the uniform gate: wrapping them at the call site was
    # measured to cost ~15% NTSC throughput via XLA fusion-heuristic drift.)
    blend = _b(blend, B)
    scanlines = _b(scanlines, B)
    end_c = jnp.minimum(end_l, outh)
    cov_end = jnp.maximum(beg_l + 1, end_c - scanlines[:, None])

    rows = jnp.arange(outh, dtype=jnp.int32)[None, :, None]   # (1, outh, 1)
    covers = ((rows >= beg_l[:, None, :]) & (rows < cov_end[:, None, :])
              & active_l[:, None, :])
    lid = jnp.arange(L, dtype=jnp.int32)[None, None, :]
    last = jnp.max(jnp.where(covers, lid, -1), axis=2)        # (B, outh)
    exists = last >= 0
    lsel = jnp.maximum(last, 0)

    # statically-off blend (the common video case) skips the previous-frame
    # row matmul entirely
    blend_off = not isinstance(blend, jax.core.Tracer) and \
        not np.asarray(blend).any()

    old = jnp.asarray(out_prev, jnp.int32)
    beg_sel = jnp.take_along_axis(beg_l, lsel, axis=1)        # (B, outh)
    new_rows = fastpath.select_rows_batched(
        rgb.astype(jnp.uint8), lsel)                          # (B, outh, outw, 3)
    if blend_off and valid is None:
        old_at_beg = None
        content = new_rows
    else:
        old_at_beg = fastpath.select_rows_batched(
            out_prev, jnp.clip(beg_sel, 0, outh - 1))
        blended = (new_rows >> 1) + (old_at_beg >> 1)         # crt_core.c:608
        content = jnp.where((blend != 0)[:, None, None, None],
                            blended, new_rows)
    if valid is not None:
        # bloom: pixels beyond the (narrower) drawn line keep the previous
        # contents of the source row — black borders (crt_core.c:555)
        vsel = fastpath.select_rows_batched(
            valid.astype(jnp.uint8), lsel).astype(bool)       # (B, outh, outw)
        content = jnp.where(vsel[..., None], content, old_at_beg)
    out = jnp.where(exists[..., None, None], content, old)
    return out.astype(jnp.uint8)
