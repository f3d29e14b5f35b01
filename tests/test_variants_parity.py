"""Bit-exact parity for the reference's pinned compile-time variants, each
against an oracle built from a PATCHED COPY of the sources (the defines live
in-file, so plain -D can't override them — oracle.build_oracle(defines=...)):

  CRT_DO_BLOOM=1         beam-energy bloom    (crt_core.c:399-526, crt_ntsc.c:148)
  USE_CONVOLUTION=1      conv-EQ, 7/6/5/4 tap (crt_core.c:85-147)
  NES_BORDER=1           NES border rendering (crt_nes.c:69, 138-161)
  NES_OPTIMIZED=0        NES reference path   (crt_nes.c:204-308)
  CRT_CHROMA_PATTERN=0   rainbow chroma       (crt_ntsc.h:25-33)
  VHS_MODE=VHS_LP/EP     VHS long/extended    (crt_ntscvhs.h:102-124)
  CRT_DO_BANDLIMITING=1  SNES IIR bandlimit   (crt_snes.h:101)
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ntsc_crt_tpu.models.systems import SYSTEMS, NTSC, NES, SNES
from ntsc_crt_tpu.models import pipeline
from oracle import Oracle
from oracle.parity import assert_parity_outside_ub
from helpers import run_modulate, run_demodulate


def _img(seed, w=320, h=240):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)


def _roundtrip_frames(cfg, orc, img, n_frames=2, noise=0, modkw=None,
                      demkw=None, check_analog=True):
    """Run n interlaced frames through both paths, asserting full parity."""
    modkw = modkw or {}
    demkw = demkw or {}
    st = pipeline.crt_init(cfg, orc.outw, orc.outh)
    field = frame = 0
    for n in range(n_frames):
        orc.modulate(img, field=field, frame=frame, **modkw)
        ref = orc.demodulate(noise=noise)
        st = run_modulate(cfg, st, img, field=field, frame=frame, **modkw)
        if check_analog:
            np.testing.assert_array_equal(np.asarray(st.analog), orc.analog,
                                          err_msg=f"frame {n} analog")
        st = run_demodulate(cfg, st, noise=noise, **demkw)
        np.testing.assert_array_equal(np.asarray(st.out), ref,
                                      err_msg=f"frame {n} out")
        assert int(st.hsync) == orc.crt.hsync
        assert int(st.vsync) == orc.crt.vsync
        np.testing.assert_array_equal(np.asarray(st.ccf), orc.ccf)
        if not cfg.progressive:
            field ^= 1
            if n % 2 == 1:
                frame ^= 1
    return st


@pytest.mark.parametrize("noise", [0, 24])
def test_bloom_parity(noise):
    """CRT_DO_BLOOM=1: narrower encode dest + beam-energy line width."""
    orc = Oracle("NTSC", outw=320, outh=240, defines={"CRT_DO_BLOOM": 1})
    st = pipeline.crt_init(NTSC, 320, 240)
    img = _img(10)
    field = frame = 0
    for n in range(3):
        orc.modulate(img, field=field, frame=frame)
        ref = orc.demodulate(noise=noise)
        st = run_modulate(NTSC, st, img, field=field, frame=frame,
                          do_bloom=True)
        np.testing.assert_array_equal(np.asarray(st.analog), orc.analog,
                                      err_msg=f"bloom frame {n} analog")
        st = run_demodulate(NTSC, st, noise=noise, do_bloom=True)
        np.testing.assert_array_equal(np.asarray(st.out), ref,
                                      err_msg=f"bloom frame {n} out")
        assert int(st.hsync) == orc.crt.hsync
        np.testing.assert_array_equal(np.asarray(st.ccf), orc.ccf)
        field ^= 1
        if n == 1:
            frame ^= 1


@pytest.mark.parametrize("system", ["SNES", "PV1K", "TEMPLATE"])
def test_bloom_parity_vper(system):
    """CRT_DO_BLOOM=1 through the per-line-vertical-phase encoders: the
    sizing guard is identical in crt_snes.c:144-151, crt_pv1k.c:140-147,
    crt_template.c:144-151; PV1K additionally exercises the 5-sample bloom
    decode (crt_core.c:480-509 + 512-532)."""
    cfg = SYSTEMS[system]
    orc = Oracle(system, outw=320, outh=240, defines={"CRT_DO_BLOOM": 1})
    st = pipeline.crt_init(cfg, 320, 240)
    img = _img(20)
    field = frame = 0
    for n in range(2):
        orc.modulate(img, field=field, frame=frame, dot_crawl_offset=n)
        ref = orc.demodulate(noise=0)
        st = run_modulate(cfg, st, img, field=field, frame=frame,
                          dot_crawl_offset=n, do_bloom=True)
        np.testing.assert_array_equal(np.asarray(st.analog), orc.analog,
                                      err_msg=f"{system} bloom frame {n} analog")
        st = run_demodulate(cfg, st, noise=0, do_bloom=True)
        np.testing.assert_array_equal(np.asarray(st.out), ref,
                                      err_msg=f"{system} bloom frame {n} out")
        assert int(st.hsync) == orc.crt.hsync
        np.testing.assert_array_equal(np.asarray(st.ccf), orc.ccf)
        if not cfg.progressive:
            field ^= 1
            if n % 2 == 1:
                frame ^= 1


def test_bloom_parity_vhs():
    """CRT_DO_BLOOM=1 for NTSCVHS (crt_ntscvhs.c:149-156), with the spec'd
    rand stream and VHS tracking noise live."""
    cfg = SYSTEMS["NTSCVHS"]
    seed = 13579
    orc = Oracle("NTSCVHS", outw=320, outh=240, defines={"CRT_DO_BLOOM": 1})
    orc.srand(seed)
    st = pipeline.crt_init(cfg, 320, 240, rand_seed=seed)
    img = _img(21)
    field = 0
    for n in range(2):
        orc.modulate(img, field=field, frame=0, do_aberration=0)
        ref = orc.demodulate(noise=8)
        st = run_modulate(cfg, st, img, field=field, frame=0,
                          do_aberration=0, do_bloom=True)
        np.testing.assert_array_equal(np.asarray(st.analog), orc.analog,
                                      err_msg=f"vhs bloom frame {n} analog")
        st = run_demodulate(cfg, st, noise=8, do_bloom=True)
        assert_parity_outside_ub(np.asarray(st.out), ref, cfg,
                                 orc.crt.vsync, err_msg=f"vhs bloom frame {n}")
        assert int(st.rn) == orc.crt.rn
        field ^= 1


_CONV_DEFS = {
    "conv7": {"USE_CONVOLUTION": 1},
    "conv6": {"USE_CONVOLUTION": 1, "USE_7_SAMPLE_KERNEL": 0,
              "USE_6_SAMPLE_KERNEL": 1},
    "conv5": {"USE_CONVOLUTION": 1, "USE_7_SAMPLE_KERNEL": 0,
              "USE_5_SAMPLE_KERNEL": 1},
    "conv4": {"USE_CONVOLUTION": 1, "USE_7_SAMPLE_KERNEL": 0},
}


@pytest.mark.parametrize("mode", ["conv7", "conv6", "conv5", "conv4"])
def test_conv_eq_parity(mode):
    """USE_CONVOLUTION builds: FIR EQ replaces the 3-band EQ in decode."""
    orc = Oracle("NTSC", outw=320, outh=240, defines=_CONV_DEFS[mode])
    _roundtrip_frames(NTSC, orc, _img(11), n_frames=2, noise=16,
                      demkw=dict(eq_mode=mode))


def test_nes_border_parity():
    """NES_BORDER=1: border square waves outside the active area."""
    orc = Oracle("NES", outw=320, outh=240, defines={"NES_BORDER": 1})
    ppu = np.random.RandomState(12).randint(0, 512, (240, 256), np.uint16)
    st = pipeline.crt_init(NES, 320, 240)
    for n, (bc, dc) in enumerate([(0x22, 0), (0x16, 1), (0x3F, 2)]):
        orc.modulate(ppu, border_color=bc, dot_crawl_offset=dc)
        ref = orc.demodulate(noise=0)
        st = run_modulate(NES, st, ppu, border_color=bc,
                          dot_crawl_offset=dc, draw_border=True)
        np.testing.assert_array_equal(np.asarray(st.analog), orc.analog,
                                      err_msg=f"border frame {n} analog")
        st = run_demodulate(NES, st, noise=0)
        np.testing.assert_array_equal(np.asarray(st.out), ref,
                                      err_msg=f"border frame {n} out")


def test_nes_unoptimized_build_matches():
    """NES_OPTIMIZED=0 (reference path, crt_nes.c:204-308): differs from the
    optimized build by writing the color burst on every non-vsync line —
    modulate(optimized=False) reproduces it, and the roundtrip decodes
    bit-exact."""
    orc = Oracle("NES", outw=320, outh=240, defines={"NES_OPTIMIZED": 0})
    ppu = np.random.RandomState(13).randint(0, 512, (240, 256), np.uint16)
    st = pipeline.crt_init(NES, 320, 240)
    for dc in (0, 1):
        orc.modulate(ppu, dot_crawl_offset=dc)
        ref = orc.demodulate(noise=0)
        st = run_modulate(NES, st, ppu, dot_crawl_offset=dc,
                          optimized=False)
        np.testing.assert_array_equal(np.asarray(st.analog), orc.analog,
                                      err_msg=f"dc={dc} analog")
        st = run_demodulate(NES, st, noise=0)
        np.testing.assert_array_equal(np.asarray(st.out), ref,
                                      err_msg=f"dc={dc} out")


@pytest.mark.parametrize("noise", [0, 24])
def test_rainbow_chroma_parity(noise):
    """CRT_CHROMA_PATTERN=0: the 'rainbow' vertical chroma pattern."""
    cfg = SYSTEMS["NTSC_RAINBOW"]
    orc = Oracle("NTSC", outw=320, outh=240,
                 defines={"CRT_CHROMA_PATTERN": 0}, cfg=cfg)
    _roundtrip_frames(cfg, orc, _img(14), n_frames=3, noise=noise)


@pytest.mark.parametrize("mode", ["LP", "EP"])
def test_vhs_lp_ep_parity(mode):
    """VHS_MODE=VHS_LP/EP: narrower Y/IQ bandwidths (crt_ntscvhs.h:102-124)."""
    cfg = SYSTEMS[f"NTSCVHS_{mode}"]
    seed = 24680
    orc = Oracle("NTSCVHS", outw=320, outh=240,
                 defines={"VHS_MODE": f"VHS_{mode}"})
    orc.srand(seed)
    st = pipeline.crt_init(cfg, 320, 240, rand_seed=seed)
    img = _img(15)
    field = frame = 0
    for n in range(2):
        orc.modulate(img, field=field, frame=frame, do_aberration=0)
        ref = orc.demodulate(noise=12)
        st = run_modulate(cfg, st, img, field=field, frame=frame,
                          do_aberration=0)
        np.testing.assert_array_equal(np.asarray(st.analog), orc.analog,
                                      err_msg=f"{mode} frame {n} analog")
        st = run_demodulate(cfg, st, noise=12)
        assert_parity_outside_ub(np.asarray(st.out), ref, cfg,
                                 orc.crt.vsync, err_msg=f"{mode} frame {n}")
        assert int(st.rn) == orc.crt.rn
        field ^= 1


@pytest.mark.parametrize("dov,doh", [(0, 1), (1, 0), (0, 0)])
def test_fixed_sync_modes_parity(dov, doh):
    """CRT_DO_VSYNC/CRT_DO_HSYNC=0 (crt_core.h:71-72): fixed sync positions
    instead of searching — vsync pinned to -3 with field recovered from the
    clean signal (crt_core.c:323-341), hsync pinned to 0 (crt_core.c:446-448).
    Run under heavy noise, where the searched and fixed modes diverge most."""
    defines = {}
    if not dov:
        defines["CRT_DO_VSYNC"] = 0
    if not doh:
        defines["CRT_DO_HSYNC"] = 0
    orc = Oracle("NTSC", outw=320, outh=240, defines=defines)
    st = pipeline.crt_init(NTSC, 320, 240)
    img = _img(17)
    field = frame = 0
    for n in range(3):
        orc.modulate(img, field=field, frame=frame)
        ref = orc.demodulate(noise=40)
        st = run_modulate(NTSC, st, img, field=field, frame=frame)
        st = run_demodulate(NTSC, st, noise=40,
                            do_vsync=bool(dov), do_hsync=bool(doh))
        np.testing.assert_array_equal(np.asarray(st.out), ref,
                                      err_msg=f"v{dov}h{doh} frame {n} out")
        assert int(st.hsync) == orc.crt.hsync, f"frame {n} hsync"
        assert int(st.vsync) == orc.crt.vsync, f"frame {n} vsync"
        np.testing.assert_array_equal(np.asarray(st.ccf), orc.ccf)
        field ^= 1
        if n == 1:
            frame ^= 1


def test_fixed_sync_pv1k_parity():
    """Fixed-sync modes through the 5-sample decode branch (PV1K)."""
    from ntsc_crt_tpu.models.systems import PV1K
    orc = Oracle("PV1K", outw=320, outh=240,
                 defines={"CRT_DO_VSYNC": 0, "CRT_DO_HSYNC": 0})
    st = pipeline.crt_init(PV1K, 320, 240)
    img = _img(18)
    for n in range(2):
        orc.modulate(img, field=0, frame=0, dot_crawl_offset=n)
        ref = orc.demodulate(noise=20)
        st = run_modulate(PV1K, st, img, field=0, frame=0,
                          dot_crawl_offset=n)
        st = run_demodulate(PV1K, st, noise=20,
                            do_vsync=False, do_hsync=False)
        np.testing.assert_array_equal(np.asarray(st.out), ref,
                                      err_msg=f"pv1k frame {n}")
        assert int(st.vsync) == orc.crt.vsync


def test_snes_bandlimiting_parity():
    """CRT_DO_BANDLIMITING=1 for SNES: the IIR path the default build skips."""
    cfg = dataclasses.replace(SNES, do_bandlimiting=True)
    orc = Oracle("SNES", outw=320, outh=240,
                 defines={"CRT_DO_BANDLIMITING": 1})
    _roundtrip_frames(cfg, orc, _img(16), n_frames=2, noise=0,
                      modkw=dict(dot_crawl_offset=0))
