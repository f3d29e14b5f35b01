"""Bit-exact parity of the NTSC modulator vs the compiled reference:
full analog field buffer + exported ccf, across field/frame parities,
mono mode, hue shifts, and buffer persistence across calls."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ntsc_crt_tpu.models.systems import NTSC
from ntsc_crt_tpu.models.modulate import modulate_rgb
from oracle import Oracle


def _img(seed, w=320, h=240):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.fixture()
def orc():
    return Oracle("NTSC", outw=640, outh=480)


def _run_ours(analog, img, **kw):
    fn = jax.jit(lambda a, im: modulate_rgb(NTSC, a, im, **kw))
    analog2, ccf = fn(analog[None], jnp.asarray(img)[None])
    return analog2[0], ccf[0]


def test_modulate_field0(orc):
    img = _img(0)
    orc.modulate(img, field=0, frame=0, hue=0)
    analog, ccf = _run_ours(jnp.zeros((262, 910), jnp.int8), img,
                            field=0, frame=0, hue=0)
    np.testing.assert_array_equal(np.asarray(analog), orc.analog)
    np.testing.assert_array_equal(np.asarray(ccf), orc.ccf)


def test_modulate_sequence_parity_and_persistence(orc):
    analog = jnp.zeros((262, 910), jnp.int8)
    for idx, (field, frame, hue) in enumerate(
            [(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0), (0, 0, 113)]):
        img = _img(idx)
        orc.modulate(img, field=field, frame=frame, hue=hue)
        analog, ccf = _run_ours(analog, img, field=field, frame=frame, hue=hue)
        np.testing.assert_array_equal(np.asarray(analog), orc.analog,
                                      err_msg=f"step {idx}")
        np.testing.assert_array_equal(np.asarray(ccf), orc.ccf)


def test_modulate_monochrome(orc):
    img = _img(7)
    orc.modulate(img, field=0, frame=0, hue=0, as_color=0)
    analog, ccf = _run_ours(jnp.zeros((262, 910), jnp.int8), img,
                            field=0, frame=0, hue=0, as_color=0)
    np.testing.assert_array_equal(np.asarray(analog), orc.analog)
    np.testing.assert_array_equal(np.asarray(ccf), orc.ccf)
