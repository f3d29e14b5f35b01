"""Cross-equivalence of the two hsync recovery strategies.

`demodulate._HSYNC_SCAN` selects between on-demand window probes inside the
line scan (default, faster on TPU) and the all-candidates first-hit table.
Both implement crt_core.c:434-450; the oracle suites exercise whichever is
default, so this test pins the other one to it bit-for-bit — including the
hsync state carried across frames and decodes that start from a cold
(nonzero-drift) sync estimate under noise.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ntsc_crt_tpu.models import demodulate as dem
from ntsc_crt_tpu.models import modulate
from ntsc_crt_tpu.models.systems import SYSTEMS


@pytest.mark.parametrize("system", ["NTSC", "PV1K"])  # 4- and 5-sample CC
def test_hsync_scan_matches_table(system):
    cfg = SYSTEMS[system]
    B, outw, outh = 2, 320, 240
    rng = np.random.RandomState(7)
    img = jnp.asarray(rng.randint(0, 256, (B, 120, 160, 3), np.uint8))

    analog = jnp.zeros((B, cfg.vres, cfg.hres), jnp.int8)
    if cfg.cc_samples == 4:
        analog, _ = modulate.modulate_rgb(
            cfg, analog, img, field=jnp.zeros((B,), jnp.int32),
            frame=jnp.zeros((B,), jnp.int32), hue=jnp.zeros((B,), jnp.int32))
    else:
        analog, _ = modulate.modulate_vper(
            cfg, analog, img, field=jnp.zeros((B,), jnp.int32),
            frame=jnp.zeros((B,), jnp.int32), hue=jnp.zeros((B,), jnp.int32))

    def run():
        import jax

        # fresh lambda per run(): its own jit cache, so flipping the module
        # flag between runs really retraces the other implementation
        jfn = jax.jit(lambda an, op, h, v, c, r, rs: dem.demodulate_core(
            cfg, an, op, h, v, c, r, 24, dem.MonitorParams(), randstate=rs))
        out_prev = jnp.zeros((B, outh, outw, 3), jnp.uint8)
        # cold, drifted sync estimates + noise: forces real window chasing
        hs = jnp.asarray([3, cfg.hres - 5], jnp.int32)
        vs = jnp.asarray([0, 4], jnp.int32)
        ccf = jnp.zeros((B, cfg.cc_vper, cfg.cc_samples), jnp.int32)
        rn = jnp.asarray([194, 12345], jnp.int32)
        outs = []
        for _ in range(3):   # carried hsync state across frames
            rgb, st = jfn(analog, out_prev, hs, vs, ccf, rn,
                          jnp.asarray([1, 2], jnp.int32))
            hs, vs, ccf, rn = st["hsync"], st["vsync"], st["ccf"], st["rn"]
            outs.append((np.asarray(rgb), np.asarray(hs), np.asarray(vs)))
        return outs

    saved = dem._HSYNC_SCAN
    try:
        dem._HSYNC_SCAN = True
        a = run()
        dem._HSYNC_SCAN = False
        b = run()
    finally:
        dem._HSYNC_SCAN = saved

    for n, ((ra, ha, va), (rb, hb, vb)) in enumerate(zip(a, b)):
        np.testing.assert_array_equal(ha, hb, err_msg=f"hsync frame {n}")
        np.testing.assert_array_equal(va, vb, err_msg=f"vsync frame {n}")
        np.testing.assert_array_equal(ra, rb, err_msg=f"rgb frame {n}")


@pytest.mark.parametrize("sweeps", [4, 1])  # 1 forces the serial fallback
@pytest.mark.parametrize("system", [
    "NTSC",
    pytest.param("PV1K", marks=pytest.mark.slow),  # 5-sample window math
])
def test_hsync_fixpoint_matches_scan(monkeypatch, system, sweeps):
    """The Jacobi/fixpoint hsync sweep (NTSC_CRT_HSYNC_FIXPOINT=1) must be
    bit-identical to the serial scan in every regime: cold drifted sync
    under noise (unconverged -> lax.cond serial fallback), then locked
    steady state (certified at sweep 2).  sweeps=1 pins the fallback branch
    itself by making certification impossible on chased frames."""
    cfg = SYSTEMS[system]
    B, outw, outh = 2, 320, 240
    rng = np.random.RandomState(7)
    img = jnp.asarray(rng.randint(0, 256, (B, 120, 160, 3), np.uint8))

    analog = jnp.zeros((B, cfg.vres, cfg.hres), jnp.int8)
    mod = modulate.modulate_rgb if cfg.cc_samples == 4 else \
        modulate.modulate_vper
    analog, _ = mod(cfg, analog, img, field=jnp.zeros((B,), jnp.int32),
                    frame=jnp.zeros((B,), jnp.int32),
                    hue=jnp.zeros((B,), jnp.int32))

    def run():
        import jax
        jfn = jax.jit(lambda an, op, h, v, c, r, rs: dem.demodulate_core(
            cfg, an, op, h, v, c, r, 24, dem.MonitorParams(), randstate=rs))
        out_prev = jnp.zeros((B, outh, outw, 3), jnp.uint8)
        hs = jnp.asarray([3, cfg.hres - 5], jnp.int32)
        vs = jnp.asarray([0, 4], jnp.int32)
        ccf = jnp.zeros((B, cfg.cc_vper, cfg.cc_samples), jnp.int32)
        rn = jnp.asarray([194, 12345], jnp.int32)
        outs = []
        for _ in range(4):   # cold chase -> locked steady state
            rgb, st = jfn(analog, out_prev, hs, vs, ccf, rn,
                          jnp.asarray([1, 2], jnp.int32))
            hs, vs, ccf, rn = st["hsync"], st["vsync"], st["ccf"], st["rn"]
            outs.append((np.asarray(rgb), np.asarray(hs), np.asarray(vs)))
        return outs

    monkeypatch.setenv("NTSC_CRT_HSYNC_FIXPOINT", "0")
    a = run()
    monkeypatch.setenv("NTSC_CRT_HSYNC_FIXPOINT", "1")
    monkeypatch.setattr(dem, "_FIXPOINT_SWEEPS", sweeps)
    b = run()

    for n, ((ra, ha, va), (rb, hb, vb)) in enumerate(zip(a, b)):
        np.testing.assert_array_equal(ha, hb, err_msg=f"hsync frame {n}")
        np.testing.assert_array_equal(va, vb, err_msg=f"vsync frame {n}")
        np.testing.assert_array_equal(ra, rb, err_msg=f"rgb frame {n}")


@pytest.mark.parametrize("system", ["NTSC", "PV1K"])
def test_forced_kernels_unsharded_step_matches_portable(monkeypatch, system):
    """Full forced-Pallas (interpret) step — fused decode + in-register
    hsync chase (ops/pallas/hsync_scan.py, active only when unsharded) —
    vs the portable XLA step, carried state across frames under noise."""
    from ntsc_crt_tpu.models import pipeline

    cfg = SYSTEMS[system]
    rng = np.random.RandomState(11)
    img = jnp.asarray(rng.randint(0, 256, (120, 160, 3), np.uint8))

    def run():
        st = pipeline.crt_init(cfg, 320, 240)
        outs = []
        for n in range(3):
            st = pipeline.step(cfg, st, img, field=n & 1, frame=0, noise=24)
            outs.append((np.asarray(st.out), int(st.hsync), int(st.vsync)))
        return outs

    monkeypatch.delenv("NTSC_CRT_FORCE_PALLAS", raising=False)
    a = run()
    monkeypatch.setenv("NTSC_CRT_FORCE_PALLAS", "1")
    b = run()
    for n, ((ra, ha, va), (rb, hb, vb)) in enumerate(zip(a, b)):
        assert (ha, va) == (hb, vb), f"sync state frame {n}"
        np.testing.assert_array_equal(ra, rb, err_msg=f"rgb frame {n}")
