"""Video pipeline: exact scan-over-frames parity vs a sequential oracle run
(interlace parity chain, cross-frame sync/ccf/noise state), strided mode
shape/consistency, phosphor fade, checkpoint/resume of the state pytree."""

import numpy as np
import jax
import jax.numpy as jnp

from ntsc_crt_tpu.models.systems import NTSC
from ntsc_crt_tpu.models import pipeline, video
from oracle import Oracle


def _frames(n, seed=0, w=96, h=72):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (n, h, w, 3), np.uint8)


def test_video_exact_matches_oracle_sequence():
    T = 6
    frames = _frames(T)
    st = pipeline.crt_init(NTSC, 160, 120)
    fn = jax.jit(lambda s, f: video.video_exact(NTSC, s, f, noise=10))
    st, outs = fn(st, jnp.asarray(frames))
    outs = np.asarray(outs)

    orc = Oracle("NTSC", outw=160, outh=120)
    field = frame = 0
    for i in range(T):
        orc.modulate(frames[i], field=field, frame=frame)
        ref = orc.demodulate(noise=10)
        np.testing.assert_array_equal(outs[i], ref, err_msg=f"frame {i}")
        field ^= 1
        if (i & 1) == 0:
            frame ^= 1
    assert int(st.hsync) == orc.crt.hsync
    assert int(st.rn) == orc.crt.rn


def test_video_strided_shapes_and_slot_exactness():
    """Each stride slot must behave exactly like an independent CRT decoding
    its sub-video."""
    B, k = 4, 3
    T = B * k
    frames = _frames(T, seed=1)
    states = pipeline.crt_init(NTSC, 160, 120, batch=B)
    fn = jax.jit(lambda s, f: video.video_strided(NTSC, s, f, noise=7))
    states, outs = fn(states, jnp.asarray(frames))
    assert outs.shape == (T, 120, 160, 3)

    # slot 0 sees frames 0, B, 2B — replay them through a single-state scan
    st0 = pipeline.crt_init(NTSC, 160, 120)
    sub = jnp.asarray(frames[0::B])
    _, ref = jax.jit(lambda s, f: video.video_exact(NTSC, s, f, noise=7))(st0, sub)
    for j in range(k):
        np.testing.assert_array_equal(np.asarray(outs[j * B]),
                                      np.asarray(ref[j]), err_msg=f"chunk {j}")


def test_fade_phosphors():
    out = np.asarray([[[255, 128, 16]]], np.uint8)
    got = np.asarray(video.fade_phosphors(jnp.asarray(out)))
    # c>>1 + c>>2 + c>>3 + c>>4 (crt_main.c:446-451)
    want = np.asarray([[[127 + 63 + 31 + 15, 64 + 32 + 16 + 8, 8 + 4 + 2 + 1]]])
    np.testing.assert_array_equal(got, want.astype(np.uint8))


def test_checkpoint_resume():
    """The CRT state pytree serializes and resumes bit-exactly — the
    checkpoint/resume story for long video jobs (SURVEY.md §5)."""
    frames = _frames(4, seed=2)
    st = pipeline.crt_init(NTSC, 160, 120)
    fn = jax.jit(lambda s, f: video.video_exact(NTSC, s, f, noise=9))
    st_mid, outs_a = fn(st, jnp.asarray(frames[:2]))

    # serialize / restore
    flat, treedef = jax.tree.flatten(st_mid)
    blobs = [np.asarray(x) for x in flat]
    restored = jax.tree.unflatten(treedef, [jnp.asarray(b) for b in blobs])

    # NOTE: video_exact restarts its parity sequence; emulate continuation by
    # running the remaining frames with the correct parities via steps
    def run_rest(state, start):
        outs = []
        field, frame = start
        for i in range(2, 4):
            state = pipeline.step(NTSC, state, jnp.asarray(frames[i]),
                                  field=field, frame=frame, noise=9)
            outs.append(np.asarray(state.out))
            field ^= 1
            if (i & 1) == 0:
                frame ^= 1
        return outs

    a = run_rest(st_mid, (0, 1))
    b = run_rest(restored, (0, 1))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_orbax_checkpoint_resume(tmp_path):
    """Orbax round trip of CRTState + video cursor: restored state continues
    the frame sequence bit-exactly (utils/checkpoint.py)."""
    from ntsc_crt_tpu.utils import checkpoint as ckpt

    frames = _frames(4, seed=5)
    st = pipeline.crt_init(NTSC, 160, 120)
    fn = jax.jit(lambda s, f: video.video_exact(NTSC, s, f, noise=9))
    st_mid, _ = fn(st, jnp.asarray(frames[:2]))

    ckpt.save_checkpoint(str(tmp_path / "ck"), st_mid,
                         frame_index=2, field=0, frame=1)
    restored, meta = ckpt.load_checkpoint(str(tmp_path / "ck"))
    assert meta == {"frame_index": 2, "field": 0, "frame": 1}
    for a, b in zip(jax.tree.leaves(st_mid), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def run_rest(state):
        outs = []
        field, frame = meta["field"], meta["frame"]
        for i in range(meta["frame_index"], 4):
            state = pipeline.step(NTSC, state, jnp.asarray(frames[i]),
                                  field=field, frame=frame, noise=9)
            outs.append(np.asarray(state.out))
            field ^= 1
            if (i & 1) == 0:
                frame ^= 1
        return outs

    for x, y in zip(run_rest(st_mid), run_rest(restored)):
        np.testing.assert_array_equal(x, y)
