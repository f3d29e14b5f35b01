"""Per-stage wall-clock profiling + jax.profiler tracing.

The reference has no tracing/profiling subsystem at all (SURVEY.md §5 —
"printf progress" only, crt_main.c:238).  On TPU the equivalent first-class
tooling is (a) steady-state per-stage timers that isolate the modulate and
demodulate phases of the frame step, and (b) `jax.profiler` traces viewable
in TensorBoard/Perfetto for per-kernel HLO timing.

Timing on the tunneled axon TPU platform needs care: `block_until_ready`
does not drain the execution queue, so every timer synchronizes by fetching
a tiny on-device reduction of the stage output (same trick as bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp


def _checksum(tree) -> None:
    """Force completion of everything `tree` depends on by fetching a scalar
    reduction of its leaves (queue-draining sync on tunneled platforms)."""
    leaves = jax.tree.leaves(tree)
    total = np.int64(0)
    for leaf in leaves[:1]:  # one leaf suffices: stages are sequenced on it
        total += np.asarray(leaf.ravel()[0].astype(jnp.int32)).item()
    return total


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2, **kwargs):
    """Steady-state seconds per call of an (ideally jitted) `fn`."""
    out = None
    for _ in range(max(1, warmup)):
        out = fn(*args, **kwargs)
    _checksum(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    _checksum(out)
    return (time.perf_counter() - t0) / iters


def profile_stages(system: str = "NTSC", batch: int = 64,
                   outw: int = 640, outh: int = 480, noise: int = 12,
                   iters: int = 10) -> Dict[str, float]:
    """ms/frame for each stage of the composite path, plus the fused step.

    Stages:
      modulate    encoder only (RGB/PPU -> analog field)
      demodulate  decoder only (noise + sync + YIQ + scan conversion)
      step        the fused modulate+demodulate jit (what bench.py runs);
                  usually < modulate+demodulate because XLA overlaps and
                  dead-code-eliminates across the phase boundary.
    """
    from ntsc_crt_tpu.models.systems import SYSTEMS
    from ntsc_crt_tpu.models import pipeline
    from ntsc_crt_tpu.parallel import mesh as pmesh

    cfg = SYSTEMS[system]
    states = pmesh.init_batch(cfg, batch, outw, outh)
    rng = np.random.RandomState(0)
    if cfg.kind == "nes":
        imgs = jnp.asarray(rng.randint(0, 512, (batch, 240, 256), np.uint16))
    else:
        imgs = jnp.asarray(rng.randint(0, 256, (batch, 240, 320, 3), np.uint8))
    fields = jnp.zeros((batch,), jnp.int32)
    frames = jnp.zeros((batch,), jnp.int32)
    dcos = jnp.zeros((batch,), jnp.int32)

    mod = jax.jit(lambda s, i, f, fr, d: pipeline.modulate(
        cfg, s, i, field=f, frame=fr, dot_crawl_offset=d))
    dem = jax.jit(lambda s: pipeline.demodulate(cfg, s, noise=noise))
    step = pmesh.make_batched_step(cfg, noise=noise, donate=False)

    res = {}
    res["modulate"] = time_fn(mod, states, imgs, fields, frames, dcos,
                              iters=iters) / batch * 1e3
    states_m = mod(states, imgs, fields, frames, dcos)
    res["demodulate"] = time_fn(dem, states_m, iters=iters) / batch * 1e3
    res["step"] = time_fn(step, states, imgs, fields, frames, dcos,
                          iters=iters) / batch * 1e3
    return res


@contextlib.contextmanager
def trace(logdir: str = "/tmp/ntsc_trace"):
    """Capture a jax.profiler device trace around a code block.

    View with `tensorboard --logdir <logdir>` (Profile tab) or load the
    .trace.json.gz into Perfetto.  Example:

        with profiling.trace("/tmp/tr"):
            step(states, imgs, fields, frames, dcos)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
