"""A/B harness for env-gated variants on the real chip (not shipped in the
package; driver contract untouched).  Usage:
    python .bench_ab.py SYSTEM ENVVAR [batch] [iters]
Rotates A(on)/B(off)/A(on) to defeat first-loop warmup skew (PERF.md)."""
import os
import sys
import time

import numpy as np


def run(system, batch, iters, env, val):
    import jax.numpy as jnp
    from ntsc_crt_tpu.models.systems import SYSTEMS
    from ntsc_crt_tpu.parallel import mesh as pmesh

    if val is None:
        os.environ.pop(env, None)
    else:
        os.environ[env] = val
    cfg = SYSTEMS[system]
    states = pmesh.init_batch(cfg, batch, 640, 480)
    step = pmesh.make_batched_step(cfg, noise=12)
    rng = np.random.RandomState(0)
    if cfg.kind == "nes":
        img = rng.randint(0, 512, (batch, 240, 256), np.uint16)
    else:
        img = rng.randint(0, 256, (batch, 240, 320, 3), np.uint8)
    imgs = jnp.asarray(img)
    z = jnp.zeros((batch,), jnp.int32)
    checksum = lambda s: int(np.asarray(s.hsync).sum())
    states = step(states, imgs, z, z, z)
    checksum(states)
    t0 = time.perf_counter()
    for _ in range(iters):
        states = step(states, imgs, z, z, z)
    checksum(states)
    dt = time.perf_counter() - t0
    return batch * iters / dt


if __name__ == "__main__":
    system = sys.argv[1] if len(sys.argv) > 1 else "NTSC"
    env = sys.argv[2] if len(sys.argv) > 2 else "NTSC_CRT_HSYNC_KERNEL"
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    # A/B values: argv[5] = "a,b" (use "unset" for removed); default
    # suits default-on kernels gated by =0
    vals = (sys.argv[5] if len(sys.argv) > 5 else "unset,0").split(",")
    a, b = [None if v == "unset" else v for v in vals[:2]]
    for tag, val in [("A#1", a), ("B#1", b), ("A#2", a), ("B#2", b)]:
        fps = run(system, batch, iters, env, val)
        print(f"{system} {env}={val} [{tag}]: {fps:.0f} fps", flush=True)
