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
    reduction of its leaves (queue-draining sync on tunneled platforms).
    Fetches the SMALLEST leaf directly: all outputs of one executable
    materialize together, so any output transfer waits for the whole step.
    (Feeding Layout.AUTO buffers — the donated step state — into a fresh
    jit forces a relayout that the tunneled platform rejects for some
    auto-chosen layouts; a plain host fetch always works.)"""
    leaves = jax.tree.leaves(tree)
    leaf = min(leaves, key=lambda x: getattr(x, "size", 1 << 62))
    return int(np.asarray(leaf).sum())


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


def kernel_breakdown(logdir: str, top: int = 16):
    """Aggregate per-kernel device time from the newest jax.profiler trace
    under `logdir`.

    Returns (total_ms, rows) where rows are (name, ms, hlo_long_name) sorted
    by total duration — the on-device complement to `profile_stages` (which
    only sees wall-clock per phase).  Compile-generated fusion names change
    across runs; the long_name column carries the HLO signature that
    identifies what each fusion computes.
    """
    import collections
    import glob
    import gzip
    import json

    files = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    if not files:
        raise FileNotFoundError(f"no .trace.json.gz under {logdir}")
    events = json.load(gzip.open(files[-1]))["traceEvents"]
    agg = collections.Counter()
    names = {}
    total = 0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        n = e.get("name", "?")
        if n.startswith(("$", "jit_", "Pjit", "np.")):
            continue
        agg[n] += e["dur"]
        total += e["dur"]
        ln = e.get("args", {}).get("long_name")
        if ln:
            names[n] = ln
    rows = [(n, d / 1e3, names.get(n, "")) for n, d in agg.most_common(top)]
    return total / 1e3, rows


def profile_kernels(system: str = "NTSC", batch: int = 256,
                    noise: int = 12, steps: int = 3,
                    logdir: str = "/tmp/ntsc_trace", top: int = 16):
    """Run `steps` batched steps under a device trace and aggregate the
    per-kernel breakdown (see kernel_breakdown)."""
    from ntsc_crt_tpu.models.systems import SYSTEMS
    from ntsc_crt_tpu.parallel import mesh as pmesh

    cfg = SYSTEMS[system]
    states = pmesh.init_batch(cfg, batch, 640, 480)
    step = pmesh.make_batched_step(cfg, noise=noise)
    rng = np.random.RandomState(0)
    if cfg.kind == "nes":
        imgs = jnp.asarray(rng.randint(0, 512, (batch, 240, 256), np.uint16))
    else:
        imgs = jnp.asarray(rng.randint(0, 256, (batch, 240, 320, 3),
                                       np.uint8))
    z = jnp.zeros((batch,), jnp.int32)
    states = step(states, imgs, z, z, z)          # compile + warm
    _checksum(states)
    with trace(logdir):
        for _ in range(steps):
            states = step(states, imgs, z, z, z)
        _checksum(states)
    return kernel_breakdown(logdir, top=top)


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
