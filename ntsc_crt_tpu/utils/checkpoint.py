"""Orbax-backed checkpoint/resume for CRT pipelines.

The reference has no persistence at all — its entire runtime state is two
plain structs, so "checkpointing" is an implicit memcpy (SURVEY.md §5).
Here the state is already an explicit pytree (`models/pipeline.CRTState`:
analog field, blend buffer, sync estimates, ccf EMA, PRNG streams), so any
JAX checkpointing library applies directly; this module wires the
ecosystem-standard `orbax.checkpoint` for long video jobs — atomic
directory swaps, cross-process restore, no pickle.

Alongside the state we persist the video cursor (next frame index and the
field/frame parity values) so a resumed job continues the reference's exact
interlace sequence (extra/video_convert.c:261-267: field toggles every
frame, frame parity every second frame).
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ntsc_crt_tpu.models import pipeline


def save_checkpoint(path: str, state: pipeline.CRTState, *,
                    frame_index: int = 0, field: int = 0,
                    frame: int = 0, overwrite: bool = True) -> None:
    """Write `state` + video cursor to an orbax checkpoint directory."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    payload = {
        "state": {k: np.asarray(v) for k, v in state._asdict().items()},
        "meta": {"frame_index": np.int64(frame_index),
                 "field": np.int64(field), "frame": np.int64(frame)},
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=overwrite)


def load_checkpoint(path: str):
    """Returns (CRTState, meta) where meta has frame_index/field/frame
    ints.  Bit-exact round trip (tests/test_video.py)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    raw = ckptr.restore(path)
    st = pipeline.CRTState(
        **{k: jnp.asarray(v) for k, v in raw["state"].items()})
    meta = {k: int(v) for k, v in raw["meta"].items()}
    return st, meta
