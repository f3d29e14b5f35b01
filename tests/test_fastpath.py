"""Direct unit tests for the gather-free data-movement primitives.

These are indirectly exercised by every oracle parity test; the direct
tests here pin their contracts (exactness over random shifts/values) so a
regression is attributed to the primitive, not a downstream frame diff.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ntsc_crt_tpu.ops import fastpath
from ntsc_crt_tpu.models import modulate


@pytest.mark.parametrize("R,W,out_len", [
    (37, 3840, 1487),   # PV1K line extraction shape
    (64, 2210, 40),     # PV1K burst window shape
    (16, 1820, 753),    # NTSC line extraction shape
    (8, 100, 100),      # max_shift == 0 fast path
    (5, 753, 753),
])
def test_shift_rows_exact(R, W, out_len):
    rng = np.random.RandomState(R * W)
    ms = W - out_len
    ext = rng.randint(-127, 128, (R, W)).astype(np.int8)
    sh = rng.randint(0, ms + 1, R).astype(np.int32)
    # make sure the extremes are covered
    sh[0], sh[-1] = 0, ms
    want = np.stack([ext[r, sh[r]:sh[r] + out_len] for r in range(R)])
    got = np.asarray(jax.jit(
        lambda e, s: fastpath.shift_rows(e, s, out_len))(ext, sh))
    np.testing.assert_array_equal(want.astype(np.int32), got)


def test_shift_rows_tight_max_shift():
    """Callers may pass a tighter shift bound (shrinks the coarse level)."""
    rng = np.random.RandomState(0)
    R, W, out_len, ms = 23, 3840, 1487, 1919   # xpos < CRT_HRES for PV1K
    ext = rng.randint(-127, 128, (R, W)).astype(np.int8)
    sh = rng.randint(0, ms + 1, R).astype(np.int32)
    sh[0], sh[-1] = 0, ms
    want = np.stack([ext[r, sh[r]:sh[r] + out_len] for r in range(R)])
    got = np.asarray(jax.jit(lambda e, s: fastpath.shift_rows(
        e, s, out_len, max_shift=ms))(ext, sh))
    np.testing.assert_array_equal(want.astype(np.int32), got)


@pytest.mark.parametrize("R,W,out_len,ms", [
    (16, 257, 129, 127),   # W not a multiple of 4
    (32, 64, 40, 3),       # tiny max_shift (single fine level)
    (32, 203, 40, 101),    # odd W and odd max_shift
    (9, 45, 40, 5),        # need > W: coarse level reads past the buffer
])
def test_shift_rows_word_edges(R, W, out_len, ms):
    """Edge geometries any shift_rows implementation must get right:
    odd widths, shifts below one radix granule, and coarse levels whose
    furthest static slice pads past the buffer."""
    rng = np.random.RandomState(R + W)
    ext = rng.randint(-127, 128, (R, W)).astype(np.int8)
    sh = rng.randint(0, ms + 1, R).astype(np.int32)
    sh[0], sh[-1] = 0, ms
    got = np.asarray(jax.jit(lambda e, s: fastpath.shift_rows(
        e, s, out_len, max_shift=ms))(ext, sh))
    for r in range(R):   # reads past W (caller contract violation) are 0-pad
        n = min(out_len, W - sh[r])
        np.testing.assert_array_equal(
            ext[r, sh[r]:sh[r] + n].astype(np.int32), got[r, :n])


def test_nes_square_sum4_exhaustive():
    """The bilinear decomposition of sum_j square_sample(p, ph+j) matches the
    direct tabulation of square_sample (crt_nes.c:21-61) for EVERY (pixel,
    phase) combination — 512 x 24 inputs."""
    tab = modulate._nes_square_table()            # (512, 12), scalar port
    p = np.repeat(np.arange(512), 24).astype(np.int32)
    ph = np.tile(np.arange(24), 512).astype(np.int32)
    want = sum(tab[p, (ph + j) % 12] for j in range(4))
    got = np.asarray(jax.jit(modulate._nes_square_sum4)(
        jnp.asarray(p), jnp.asarray(ph)))
    np.testing.assert_array_equal(want, got)


@pytest.mark.parametrize("ratio", [1, 2, 3])
@pytest.mark.parametrize("blend,scanlines", [(0, 0), (0, 1), (1, 0), (1, 1)])
def test_place_rows_uniform_matches_general(blend, scanlines, ratio):
    """The stacked fast-path placement is bit-identical to the general
    one-hot-select placement for the uniform geometry (outh == ratio*L) —
    across repeat factors, covering the j<fp / j>=fp slot split at ratio>=3
    and the degenerate single-slot ratio=1 (ADVICE.md r2 #2)."""
    from ntsc_crt_tpu.models import demodulate as dem
    from ntsc_crt_tpu.models.systems import SYSTEMS

    cfg = SYSTEMS["NTSC"]
    if scanlines >= ratio:
        pytest.skip("outside the uniform gate (demodulate.py: sl < ratio)")
    rng = np.random.RandomState(blend * 2 + scanlines + 7 * ratio)
    B, L, w = 5, cfg.lines, 64
    outh = ratio * L
    rgb = rng.randint(0, 256, (B, L, w, 3)).astype(np.uint8)
    old = rng.randint(0, 256, (B, outh, w, 3)).astype(np.uint8)
    # product contract (demodulate.py:516): field_px = field * (ratio // 2)
    field_px = jnp.asarray(np.array([0, 1, 0, 1, 1], np.int32) * (ratio // 2))

    # general-path inputs: per-line begs exactly ratio*l + field_px
    lrel = jnp.arange(L, dtype=jnp.int32)[None, :]
    beg = lrel * ratio + field_px[:, None]
    end = (lrel + 1) * ratio + field_px[:, None]
    active = beg < outh

    fast = dem._place_rows_uniform(cfg, jnp.asarray(rgb), jnp.asarray(old),
                                   field_px, blend, scanlines, outh, ratio)
    slow = dem._place_rows(cfg, jnp.asarray(rgb, jnp.int32),
                           jnp.asarray(old), beg, end, active,
                           jnp.full((B,), blend, jnp.int32),
                           jnp.full((B,), scanlines, jnp.int32), outh)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


def test_kernel_breakdown_aggregation(tmp_path):
    """profiling.kernel_breakdown sums device kernel durations from a
    jax.profiler trace file, skipping dispatch-level entries."""
    import gzip
    import json
    from ntsc_crt_tpu.utils import profiling

    d = tmp_path / "plugins" / "profile" / "run"
    d.mkdir(parents=True)
    ev = [
        {"ph": "X", "name": "fusion.1", "dur": 1500,
         "args": {"long_name": "%fusion.1 = f32[8]{0} fusion(...)"}},
        {"ph": "X", "name": "fusion.1", "dur": 500},
        {"ph": "X", "name": "copy.2", "dur": 1000},
        {"ph": "X", "name": "jit_step", "dur": 99999},   # dispatch: skipped
        {"ph": "M", "name": "fusion.9"},                 # metadata: skipped
    ]
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": ev}, f)

    total_ms, rows = profiling.kernel_breakdown(str(tmp_path), top=5)
    assert total_ms == pytest.approx(3.0)
    assert rows[0][0] == "fusion.1" and rows[0][1] == pytest.approx(2.0)
    assert "f32[8]" in rows[0][2]
    assert rows[1][0] == "copy.2"


def test_profile_stages_smoke():
    """profile_stages runs the three timers end-to-end and returns sane
    positive ms/frame numbers (API guard for the profiling module)."""
    from ntsc_crt_tpu.utils import profiling

    res = profiling.profile_stages("NTSC", batch=2, outw=160, outh=120,
                                   iters=1)
    assert set(res) == {"modulate", "demodulate", "step"}
    assert all(v > 0 for v in res.values())


def test_batch_regime_paths(monkeypatch):
    """The vsync integration and the hsync probe pick their formulation by
    batch size (_BIG_BATCH: MXU/prefix-sum forms for throughput, simpler
    fusions for latency).  Force BOTH regimes at the same batch and assert
    the full decode step is bit-identical."""
    from ntsc_crt_tpu.models import demodulate as dem
    from ntsc_crt_tpu.models import pipeline
    from ntsc_crt_tpu.models.systems import NTSC
    from ntsc_crt_tpu.parallel import mesh as pmesh

    B = 4
    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.randint(0, 256, (B, 96, 128, 3), np.uint8))
    fields = jnp.asarray(np.arange(B) % 2, jnp.int32)
    z = jnp.zeros((B,), jnp.int32)

    outs = {}
    for name, thresh in (("small", 999), ("big", 1)):
        monkeypatch.setattr(dem, "_BIG_BATCH", thresh)
        states = pmesh.init_batch(NTSC, B, 160, 120)
        step = pmesh.make_batched_step(NTSC, noise=11, donate=False)
        s = step(states, imgs, fields, z, z)
        s = step(s, imgs, fields ^ 1, z, z)      # second frame: carried state
        outs[name] = jax.tree.leaves(s)

    for a, b in zip(outs["small"], outs["big"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
