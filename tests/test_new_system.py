"""Porting-path demonstration: NOVEL systems that ship in no preset.

The reference's central extensibility promise is template-driven porting
(crt_template.h:24-39: pick CC_LINE / CB_FREQ / CC_SAMPLES / CC_VPER /
phase offsets -> new system).  The framework's equivalent is constructing a
`SystemConfig` outside the ten shipped presets — no new kernels, the shared
encoder/decoder families specialize at trace time.

These tests build two never-shipped geometries, compile the reference
template with the matching patched macros (oracle defines machinery), and
assert full round-trip parity — exercising the trace-time guards
(demodulate PAD/margin asserts, xo alignment for cc_samples != 4) on novel
shapes.  The walkthrough lives in docs/NEW_SYSTEM.md.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from ntsc_crt_tpu.models.systems import (
    SystemConfig, CHROMA_VERTICAL, _ns_timing)
from ntsc_crt_tpu.models import pipeline
from oracle import Oracle

# Novel system A: 230.0 cc/line, 5-sample chroma at CB_FREQ=5 (1150-wide
# line — between NTSC's 910 and PV1K's 1920), 5-line artifact period,
# PV1K-sign Q offset, nonzero burst hue.  Exercises the 5-sample decode
# branch (crt_core.c:480-509) on a geometry it has never seen.
PENTA = SystemConfig(
    name="PENTA230", kind="rgb",
    cc_line=2300, cb_freq=5, hres=2300 * 5 // 10, vres=262, top=21, bot=261,
    cc_samples=5, cc_vper=5,
    hsync_window=8, vsync_window=8, hsync_thresh=4, vsync_thresh=94,
    **_ns_timing(1150, 1500, 4700, 600, 2500, 1600, 52600),
    cb_cycles=10,
    l_freq=1431818, y_freq=420000, i_freq=150000, q_freq=55000,
    do_bandlimiting=True,
    white_level=100, burst_level=20, black_level=7, blank_level=0,
    sync_level=-40,
    chroma_pattern=CHROMA_VERTICAL, hue_offset=50, q_offset=90,
    progressive=False,
    vert_step=360 // 5,           # template phase advance (crt_template.c:172)
    equ_a=(0, 2), sync_region=(3, 6), equ_b=(7, 9),
)
PENTA_DEFINES = {
    "CRT_CC_LINE": 2300, "CRT_CB_FREQ": 5,
    "CRT_CC_SAMPLES": 5, "CRT_CC_VPER": 5,
    "Q_OFFSET": 90, "HUE_OFFSET": 50,
}

# Novel system B: 230.4 cc/line, 4-sample chroma, 4-line vertical period
# (no shipped system has VPER=4), 921-wide line (odd width, not a preset).
QUAD = SystemConfig(
    name="QUAD2304", kind="rgb",
    cc_line=2304, cb_freq=4, hres=2304 * 4 // 10, vres=262, top=21, bot=261,
    cc_samples=4, cc_vper=4,
    hsync_window=8, vsync_window=8, hsync_thresh=4, vsync_thresh=94,
    **_ns_timing(2304 * 4 // 10, 1500, 4700, 600, 2500, 1600, 52600),
    cb_cycles=10,
    l_freq=1431818, y_freq=420000, i_freq=150000, q_freq=55000,
    do_bandlimiting=True,
    white_level=100, burst_level=20, black_level=7, blank_level=0,
    sync_level=-40,
    chroma_pattern=CHROMA_VERTICAL, hue_offset=15, q_offset=-90,
    progressive=False,
    vert_step=360 // 4,
    equ_a=(0, 2), sync_region=(3, 6), equ_b=(7, 9),
)
QUAD_DEFINES = {
    "CRT_CC_LINE": 2304, "CRT_CC_VPER": 4, "HUE_OFFSET": 15,
}

_CASES = {"PENTA230": (PENTA, PENTA_DEFINES), "QUAD2304": (QUAD, QUAD_DEFINES)}


@pytest.mark.parametrize("name", list(_CASES))
def test_novel_system_roundtrip_parity(name):
    cfg, defines = _CASES[name]
    orc = Oracle("TEMPLATE", outw=320, outh=240, defines=defines, cfg=cfg)
    st = pipeline.crt_init(cfg, 320, 240)
    img = np.random.RandomState(77).randint(0, 256, (240, 320, 3), np.uint8)
    field = frame = 0
    for n in range(2):
        orc.modulate(img, field=field, frame=frame, dot_crawl_offset=n)
        ref = orc.demodulate(noise=10)
        st = pipeline.modulate(cfg, st, jnp.asarray(img), field=field,
                               frame=frame, black_point=0, white_point=100,
                               dot_crawl_offset=n)
        np.testing.assert_array_equal(np.asarray(st.analog), orc.analog,
                                      err_msg=f"{name} frame {n} analog")
        st = pipeline.demodulate(cfg, st, noise=10)
        np.testing.assert_array_equal(np.asarray(st.out), ref,
                                      err_msg=f"{name} frame {n} out")
        assert int(st.hsync) == orc.crt.hsync, f"{name} frame {n} hsync"
        assert int(st.vsync) == orc.crt.vsync, f"{name} frame {n} vsync"
        np.testing.assert_array_equal(np.asarray(st.ccf), orc.ccf)
        field ^= 1


def test_novel_system_bloom_parity():
    """The CRT_DO_BLOOM build variant also holds on a novel geometry —
    the bloom dest sizing + per-row dynamic scan conversion are generic."""
    cfg, defines = _CASES["PENTA230"]
    orc = Oracle("TEMPLATE", outw=256, outh=192,
                 defines={**defines, "CRT_DO_BLOOM": 1}, cfg=cfg)
    st = pipeline.crt_init(cfg, 256, 192)
    img = np.random.RandomState(78).randint(0, 256, (200, 300, 3), np.uint8)
    orc.modulate(img, field=0, frame=0, dot_crawl_offset=1)
    ref = orc.demodulate(noise=0)
    st = pipeline.modulate(cfg, st, jnp.asarray(img), field=0, frame=0,
                           black_point=0, white_point=100,
                           dot_crawl_offset=1, do_bloom=True)
    np.testing.assert_array_equal(np.asarray(st.analog), orc.analog)
    st = pipeline.demodulate(cfg, st, noise=0, do_bloom=True)
    np.testing.assert_array_equal(np.asarray(st.out), ref)
