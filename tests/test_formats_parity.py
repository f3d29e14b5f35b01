"""Encode-side input pixel-format parity vs the compiled reference.

The reference encoders read the input image in any of the six byte layouts
via an in-loop format switch (crt_ntsc.c:278-305; NESRGB carries the same
`format` settings field, crt_nesrgb.c:49-170).  The framework's redesign
converts at the API boundary (utils/formats.py::to_rgb) and keeps the
compute cores canonical-RGB.  These tests close the equivalence obligation
(VERDICT r4 missing #1): for every input format F,

    reference modulate(s->format=F, raw_bytes)
 ==  repo      modulate(to_rgb(raw_bytes, F))

bit-exactly on the analog field AND on the decoded frame, for both an RGB
encoder (NTSC) and the NESRGB encoder.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from ntsc_crt_tpu.models.systems import SYSTEMS, NTSC
from ntsc_crt_tpu.models import pipeline
from ntsc_crt_tpu.utils import formats
from oracle import Oracle
from helpers import run_modulate, run_demodulate

_ALL_FMTS = [
    ("RGB", formats.RGB), ("BGR", formats.BGR), ("ARGB", formats.ARGB),
    ("RGBA", formats.RGBA), ("ABGR", formats.ABGR), ("BGRA", formats.BGRA),
]


def _raw_input(fmt: int, seed: int, w=320, h=240) -> np.ndarray:
    """Random raw bytes in layout `fmt` — including random alpha bytes on
    4-byte formats, which the reference never reads (crt_ntsc.c:281-299
    shifts only R/G/B lanes out of the packed word) and to_rgb must drop."""
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (h, w, formats.bpp(fmt)), np.uint8)


@pytest.mark.parametrize("name,fmt", _ALL_FMTS)
def test_ntsc_input_format_parity(name, fmt):
    raw = _raw_input(fmt, seed=100 + fmt)
    orc = Oracle("NTSC", outw=320, outh=240)
    st = pipeline.crt_init(NTSC, 320, 240)
    rgb = jnp.asarray(formats.to_rgb(raw, fmt))
    field = frame = 0
    for n in range(2):
        orc.modulate(raw, field=field, frame=frame, fmt=fmt)
        ref = orc.demodulate(noise=9)
        st = run_modulate(NTSC, st, rgb, field=field, frame=frame)
        np.testing.assert_array_equal(
            np.asarray(st.analog), orc.analog,
            err_msg=f"{name} frame {n} analog")
        st = run_demodulate(NTSC, st, noise=9)
        np.testing.assert_array_equal(np.asarray(st.out), ref,
                                      err_msg=f"{name} frame {n} out")
        field ^= 1


@pytest.mark.parametrize("name,fmt", _ALL_FMTS)
def test_nesrgb_input_format_parity(name, fmt):
    """NESRGB reads `format` through its own pixel fetch (crt_nesrgb.c's
    format switch) and is the other encoder family with an RGB input."""
    cfg = SYSTEMS["NESRGB"]
    raw = _raw_input(fmt, seed=200 + fmt, w=256, h=240)
    orc = Oracle("NESRGB", outw=320, outh=240)
    st = pipeline.crt_init(cfg, 320, 240)
    rgb = jnp.asarray(formats.to_rgb(raw, fmt))
    for n in range(2):
        orc.modulate(raw, fmt=fmt, dot_crawl_offset=n % 3)
        ref = orc.demodulate(noise=0)
        st = run_modulate(cfg, st, rgb, dc=n % 3)
        np.testing.assert_array_equal(
            np.asarray(st.analog), orc.analog,
            err_msg=f"{name} frame {n} analog")
        st = run_demodulate(cfg, st, noise=0)
        np.testing.assert_array_equal(np.asarray(st.out), ref,
                                      err_msg=f"{name} frame {n} out")
