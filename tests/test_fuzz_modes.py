"""Mode-axis fuzz (VERDICT r4 #6): seeded randomized sweep over the
reference's COMPILE-TIME build variants — do_bloom (CRT_DO_BLOOM), eq_mode
(USE_CONVOLUTION + kernel size), do_vsync/do_hsync (CRT_DO_VSYNC/HSYNC),
v_fac, NES draw_border/optimized (NES_BORDER/NES_OPTIMIZED) and VHS
do_aberration — crossed with the monitor knobs, hue, noise and geometry the
knob fuzz (test_fuzz_parity.py) already draws.

These axes are exactly where the r4 fused-kernel paths forked (fused bloom
decode, fused conv-EQ decode, fixed-sync modes); the targeted variant tests
pin single points of each axis, this sweep samples the cross-product.  Every
case compiles the matching patched-define oracle (cached in .oracle_build/)
and runs two carried-state frames.

Slow tier: ~44 cases x (oracle build + 2 frames).  Coverage of every axis is
asserted by test_mode_axes_all_covered (fast tier), so the draw set cannot
silently rot away from an axis.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ntsc_crt_tpu.models.systems import SYSTEMS
from ntsc_crt_tpu.models import pipeline
from ntsc_crt_tpu.models.demodulate import MonitorParams
from oracle import Oracle
from oracle.parity import assert_parity_outside_ub

_SYS = ["NTSC", "SNES", "TEMPLATE", "PV1K", "NESRGB", "NTSCVHS"]
_GEOM = [(160, 120), (320, 240), (531, 377), (640, 480)]
_CONV_DEFS = {
    "conv7": {"USE_CONVOLUTION": 1},
    "conv6": {"USE_CONVOLUTION": 1, "USE_7_SAMPLE_KERNEL": 0,
              "USE_6_SAMPLE_KERNEL": 1},
    "conv5": {"USE_CONVOLUTION": 1, "USE_7_SAMPLE_KERNEL": 0,
              "USE_5_SAMPLE_KERNEL": 1},
    "conv4": {"USE_CONVOLUTION": 1, "USE_7_SAMPLE_KERNEL": 0},
}


def _draw_common(rng, cc_samples):
    """Mode axes shared by the RGB-family and NES draws."""
    d = dict(
        do_bloom=bool(rng.rand() < 0.30),
        eq_mode="threeband",
        do_vsync=bool(rng.rand() >= 0.20),
        do_hsync=bool(rng.rand() >= 0.20),
        v_fac=int([0, 0, 0, 60, 240][rng.randint(5)]),
        noise=int(rng.randint(0, 41)),
        mon=dict(hue=int(rng.randint(-359, 360)),
                 brightness=int(rng.randint(-50, 51)),
                 contrast=int(rng.randint(0, 256)),
                 saturation=int(rng.randint(0, 26)),
                 black_point=int(rng.randint(-20, 21)),
                 white_point=int(rng.randint(80, 121)),
                 blend=int(rng.randint(0, 2)),
                 scanlines=int(rng.randint(0, 2))),
        outw_outh=_GEOM[rng.randint(len(_GEOM))],
        img_seed=int(rng.randint(0, 1000)),
    )
    if cc_samples == 4 and rng.rand() < 0.40:
        d["eq_mode"] = list(_CONV_DEFS)[rng.randint(4)]
    # documented divergence regime (docs/PARITY.md #2): blend against
    # outputs whose line begs are not strictly increasing — needs
    # outh + v_fac >= CRT_LINES
    if d["mon"]["blend"] and d["outw_outh"][1] + d["v_fac"] < 240:
        d["outw_outh"] = (d["outw_outh"][0], 480)
    return d


def _defines(case):
    defs = {}
    if case["do_bloom"]:
        defs["CRT_DO_BLOOM"] = 1
    if case["eq_mode"] != "threeband":
        defs.update(_CONV_DEFS[case["eq_mode"]])
    if not case["do_vsync"]:
        defs["CRT_DO_VSYNC"] = 0
    if not case["do_hsync"]:
        defs["CRT_DO_HSYNC"] = 0
    return defs


def _mode_cases(n=36, seed=20250820):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        system = _SYS[rng.randint(len(_SYS))]
        cfg = SYSTEMS[system]
        case = _draw_common(rng, cfg.cc_samples)
        case["system"] = system
        case["enc_hue"] = int(rng.randint(0, 360))
        if system in ("SNES", "PV1K", "TEMPLATE", "NESRGB"):
            case["dot_crawl_offset"] = int(rng.randint(0, 3))
        if system == "NTSCVHS":
            case["do_aberration"] = int(rng.randint(0, 2))
            case["rand_seed"] = int(rng.randint(1, 2**31 - 1))
        out.append(case)
    return out


def _nes_mode_cases(n=8, seed=777):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        case = _draw_common(rng, 4)
        case["draw_border"] = bool(rng.rand() < 0.5)
        case["border_color"] = int(rng.randint(0, 64))
        case["optimized"] = bool(rng.rand() < 0.7)
        case["dco"] = int(rng.randint(0, 3))
        out.append(case)
    return out


def _mode_id(c):
    bits = [c.get("system", "NES"), f"{c['outw_outh'][0]}x{c['outw_outh'][1]}"]
    if c["do_bloom"]:
        bits.append("bloom")
    if c["eq_mode"] != "threeband":
        bits.append(c["eq_mode"])
    if not c["do_vsync"]:
        bits.append("novs")
    if not c["do_hsync"]:
        bits.append("nohs")
    if c["v_fac"]:
        bits.append(f"vf{c['v_fac']}")
    if c.get("do_aberration"):
        bits.append("aberr")
    if c.get("draw_border"):
        bits.append("border")
    if not c.get("optimized", True):
        bits.append("unopt")
    return "-".join(bits)


def test_mode_axes_all_covered():
    """The draw set must exercise every oracle-supported mode axis at least
    once (VERDICT r4 #6 'done' criterion) — fails if a reseed ever drops an
    axis instead of silently shrinking coverage."""
    cases = _mode_cases()
    nes = _nes_mode_cases()
    both = cases + nes
    assert len(both) >= 40
    assert any(c["do_bloom"] for c in both)
    for m in _CONV_DEFS:
        assert any(c["eq_mode"] == m for c in both), m
    assert any(not c["do_vsync"] for c in both)
    assert any(not c["do_hsync"] for c in both)
    assert any(c["v_fac"] > 0 for c in both)
    assert any(c["mon"]["blend"] for c in both)
    assert any(c["mon"]["scanlines"] for c in both)
    assert any(c.get("do_aberration") for c in cases)
    assert any(c.get("draw_border") for c in nes)
    assert any(not c.get("optimized", True) for c in nes)
    # the bloom x conv-EQ corner (both r4 fused-kernel forks at once)
    assert any(c["do_bloom"] and c["eq_mode"] != "threeband" for c in both)
    # every RGB-family system drawn
    assert {c["system"] for c in cases} == set(_SYS)


@pytest.mark.slow
@pytest.mark.parametrize("case", _mode_cases(), ids=_mode_id)
def test_fuzz_mode_roundtrip_parity(case):
    cfg = SYSTEMS[case["system"]]
    outw, outh = case["outw_outh"]
    vhs = case["system"] == "NTSCVHS"
    orc = Oracle(case["system"], outw=outw, outh=outh,
                 defines=_defines(case) or None)
    for k, v in case["mon"].items():
        setattr(orc.crt, k, v)
    orc.crt.v_fac = case["v_fac"]
    if vhs:
        orc.srand(case["rand_seed"])
    rng = np.random.RandomState(case["img_seed"])
    img = rng.randint(0, 256, size=(240, 320, 3), dtype=np.uint8)

    mon = MonitorParams(**{k: jnp.int32(v) for k, v in case["mon"].items()})
    st = pipeline.crt_init(cfg, outw, outh,
                           rand_seed=case.get("rand_seed", 1))
    modkw = {}
    if "dot_crawl_offset" in case:
        modkw["dot_crawl_offset"] = case["dot_crawl_offset"]
    if vhs:
        modkw["do_aberration"] = case["do_aberration"]
    fn = jax.jit(lambda s, im, fi, fr: pipeline.step(
        cfg, s, im, field=fi, frame=fr, hue=case["enc_hue"],
        noise=case["noise"], mon=mon, v_fac=case["v_fac"],
        do_bloom=case["do_bloom"], eq_mode=case["eq_mode"],
        do_vsync=case["do_vsync"], do_hsync=case["do_hsync"], **modkw))

    field = frame = 0
    for n in range(2):
        orc.modulate(img, field=field, frame=frame, hue=case["enc_hue"],
                     **({"do_aberration": case["do_aberration"]} if vhs
                        else {}),
                     **({"dot_crawl_offset": case["dot_crawl_offset"]}
                        if "dot_crawl_offset" in case else {}))
        ref = orc.demodulate(noise=case["noise"])
        st = fn(st, jnp.asarray(img), jnp.int32(field), jnp.int32(frame))
        got = np.asarray(st.out)
        if vhs:
            # rows sourced from the final analog line read OOB in the
            # reference (UB) — the shared exclusion helper (oracle/parity.py)
            assert_parity_outside_ub(got, ref, cfg, orc.crt.vsync,
                                     err_msg=f"{_mode_id(case)} frame {n}")
        else:
            np.testing.assert_array_equal(
                got, ref, err_msg=f"{_mode_id(case)} frame {n}")
        assert int(st.hsync) == orc.crt.hsync, f"{_mode_id(case)} frame {n}"
        assert int(st.vsync) == orc.crt.vsync, f"{_mode_id(case)} frame {n}"
        np.testing.assert_array_equal(np.asarray(st.ccf), orc.ccf)
        if not cfg.progressive:
            field ^= 1


@pytest.mark.slow
@pytest.mark.parametrize("case", _nes_mode_cases(), ids=_mode_id)
def test_fuzz_nes_mode_roundtrip_parity(case):
    cfg = SYSTEMS["NES"]
    outw, outh = case["outw_outh"]
    defs = _defines(case)
    if case["draw_border"]:
        defs["NES_BORDER"] = 1
    if not case["optimized"]:
        defs["NES_OPTIMIZED"] = 0
    orc = Oracle("NES", outw=outw, outh=outh, defines=defs or None)
    for k, v in case["mon"].items():
        setattr(orc.crt, k, v)
    orc.crt.v_fac = case["v_fac"]
    rng = np.random.RandomState(case["img_seed"])
    ppu = rng.randint(0, 512, size=(240, 256), dtype=np.uint16)

    mon = MonitorParams(**{k: jnp.int32(v) for k, v in case["mon"].items()})
    st = pipeline.crt_init(cfg, outw, outh)
    fn = jax.jit(lambda s, im, dc: pipeline.step(
        cfg, s, im, field=0, frame=0, noise=case["noise"], mon=mon,
        dot_crawl_offset=dc, v_fac=case["v_fac"],
        do_bloom=case["do_bloom"], eq_mode=case["eq_mode"],
        do_vsync=case["do_vsync"], do_hsync=case["do_hsync"],
        border_color=case["border_color"],
        draw_border=case["draw_border"], optimized=case["optimized"]))

    for n in range(2):
        dc = (case["dco"] + n) % 3
        orc.modulate(ppu, dot_crawl_offset=dc,
                     border_color=case["border_color"])
        ref = orc.demodulate(noise=case["noise"])
        st = fn(st, jnp.asarray(ppu), jnp.int32(dc))
        np.testing.assert_array_equal(
            np.asarray(st.out), ref, err_msg=f"{_mode_id(case)} frame {n}")
        assert int(st.hsync) == orc.crt.hsync
        assert int(st.vsync) == orc.crt.vsync
        np.testing.assert_array_equal(np.asarray(st.ccf), orc.ccf)
