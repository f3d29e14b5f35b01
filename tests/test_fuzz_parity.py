"""Seeded randomized parity sweep: random (system, monitor knobs, encoder
hue, noise, output geometry) combinations vs the compiled reference.

The targeted parity suites pin specific knob combinations; this sweep adds
breadth across the whole knob space with a FIXED seed (reproducible, no
flakes).  Every case runs two carried-state frames so sync estimates, the
ccf EMA and the noise PRNG all cross a frame boundary under the random
knobs.

One documented divergence regime is excluded: blend=1 with
outh < CRT_LINES (docs/PARITY.md #2 — the reference blends against rows
written earlier in the same call; the parallel placement resolves "last
writer wins").  That regime has its own pinned golden fixture
(test_edge_modes); here blend=1 draws are bumped to a full-height
geometry.  The fuzzer itself caught this on its first NES run — working
as intended.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ntsc_crt_tpu.models.systems import SYSTEMS
from ntsc_crt_tpu.models import pipeline
from ntsc_crt_tpu.models.demodulate import MonitorParams
from oracle import Oracle
from helpers import run_step

_SYS = ["NTSC", "SNES", "TEMPLATE", "PV1K", "NESRGB", "NTSCVHS"]
_GEOM = [(160, 120), (320, 240), (531, 377), (640, 480)]


def _cases(n=6, seed=42):
    rng = np.random.RandomState(seed)
    out = []
    for k in range(n):
        out.append(dict(
            system=_SYS[rng.randint(len(_SYS))],
            outw_outh=_GEOM[rng.randint(len(_GEOM))],
            enc_hue=int(rng.randint(0, 360)),
            mon=dict(hue=int(rng.randint(-359, 360)),
                     brightness=int(rng.randint(-50, 51)),
                     contrast=int(rng.randint(0, 256)),
                     saturation=int(rng.randint(0, 26)),
                     black_point=int(rng.randint(-20, 21)),
                     white_point=int(rng.randint(80, 121)),
                     blend=int(rng.randint(0, 2)),
                     scanlines=int(rng.randint(0, 2))),
            noise=int(rng.randint(0, 61)),
            img_seed=int(rng.randint(0, 1000)),
        ))
        if out[-1]["mon"]["blend"] and out[-1]["outw_outh"][1] < 240:
            # documented divergence regime (docs/PARITY.md #2): blend
            # against sub-CRT_LINES output heights — see module docstring
            out[-1]["outw_outh"] = (out[-1]["outw_outh"][0], 480)
    return out


@pytest.mark.parametrize("case", _cases(),
                         ids=lambda c: f"{c['system']}-{c['outw_outh'][0]}x"
                                       f"{c['outw_outh'][1]}-n{c['noise']}")
def test_fuzz_roundtrip_parity(case):
    cfg = SYSTEMS[case["system"]]
    outw, outh = case["outw_outh"]
    orc = Oracle(case["system"], outw=outw, outh=outh)
    for k, v in case["mon"].items():
        setattr(orc.crt, k, v)
    rng = np.random.RandomState(case["img_seed"])
    img = rng.randint(0, 256, size=(240, 320, 3), dtype=np.uint8)

    mon = MonitorParams(**{k: jnp.int32(v) for k, v in case["mon"].items()})
    st = pipeline.crt_init(cfg, outw, outh)

    field = frame = 0
    for n in range(2):
        orc.modulate(img, field=field, frame=frame, hue=case["enc_hue"])
        ref = orc.demodulate(noise=case["noise"])
        st = run_step(cfg, st, img, field=field, frame=frame,
                      hue=case["enc_hue"], noise=case["noise"], mon=mon)
        np.testing.assert_array_equal(
            np.asarray(st.out), ref,
            err_msg=f"{case} frame {n}")
        assert int(st.hsync) == orc.crt.hsync, f"{case} frame {n} hsync"
        assert int(st.vsync) == orc.crt.vsync, f"{case} frame {n} vsync"
        np.testing.assert_array_equal(np.asarray(st.ccf), orc.ccf)
        if not cfg.progressive:
            field ^= 1


def _nes_cases(n=3, seed=7):
    rng = np.random.RandomState(seed)
    out = []
    for k in range(n):
        out.append(dict(
            outw_outh=_GEOM[rng.randint(len(_GEOM))],
            dco=int(rng.randint(0, 3)),
            mon=dict(hue=int(rng.randint(-359, 360)),
                     brightness=int(rng.randint(-50, 51)),
                     contrast=int(rng.randint(0, 256)),
                     saturation=int(rng.randint(0, 26)),
                     black_point=int(rng.randint(-20, 21)),
                     white_point=int(rng.randint(80, 121)),
                     blend=int(rng.randint(0, 2)),
                     scanlines=int(rng.randint(0, 2))),
            noise=int(rng.randint(0, 61)),
            img_seed=int(rng.randint(0, 1000)),
        ))
        if out[-1]["mon"]["blend"] and out[-1]["outw_outh"][1] < 240:
            # documented divergence regime (docs/PARITY.md #2): blend
            # against sub-CRT_LINES output heights — see module docstring
            out[-1]["outw_outh"] = (out[-1]["outw_outh"][0], 480)
    return out


@pytest.mark.parametrize("case", _nes_cases(),
                         ids=lambda c: f"{c['outw_outh'][0]}x"
                                       f"{c['outw_outh'][1]}-dc{c['dco']}"
                                       f"-n{c['noise']}")
def test_fuzz_nes_roundtrip_parity(case):
    """NES variant: PPU-index input (full 9-bit range incl. emphasis bits)
    + dot-crawl stepping under random monitor knobs."""
    cfg = SYSTEMS["NES"]
    outw, outh = case["outw_outh"]
    orc = Oracle("NES", outw=outw, outh=outh)
    for k, v in case["mon"].items():
        setattr(orc.crt, k, v)
    rng = np.random.RandomState(case["img_seed"])
    ppu = rng.randint(0, 512, size=(240, 256), dtype=np.uint16)

    mon = MonitorParams(**{k: jnp.int32(v) for k, v in case["mon"].items()})
    st = pipeline.crt_init(cfg, outw, outh)

    for n in range(2):
        dc = (case["dco"] + n) % 3
        orc.modulate(ppu, field=0, frame=0, dot_crawl_offset=dc)
        ref = orc.demodulate(noise=case["noise"])
        st = run_step(cfg, st, ppu, noise=case["noise"], mon=mon,
                      dot_crawl_offset=dc)
        np.testing.assert_array_equal(
            np.asarray(st.out), ref, err_msg=f"{case} frame {n}")
        np.testing.assert_array_equal(np.asarray(st.ccf), orc.ccf)
