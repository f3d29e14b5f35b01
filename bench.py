"""Throughput benchmark: full NTSC encode+decode frames/sec/chip at 640x480.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 5000 frames/sec/chip (BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from ntsc_crt_tpu.models.systems import NTSC
    from ntsc_crt_tpu.parallel import mesh as pmesh

    batch = int(__import__("os").environ.get("BENCH_BATCH", "256"))
    iters = int(__import__("os").environ.get("BENCH_ITERS", "10"))

    states = pmesh.init_batch(NTSC, batch, 640, 480)
    step = pmesh.make_batched_step(NTSC, noise=12)

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 256, (batch, 240, 320, 3), dtype=np.uint8))
    fields = jnp.zeros((batch,), jnp.int32)
    frames = jnp.zeros((batch,), jnp.int32)
    dcos = jnp.zeros((batch,), jnp.int32)

    # warmup / compile.  NOTE: sync via an on-device reduction fetch —
    # block_until_ready alone does not drain the execution queue on the
    # tunneled TPU platform this runs under.
    checksum = jax.jit(lambda s: s.out.astype(jnp.int32).sum())
    states = step(states, imgs, fields, frames, dcos)
    checksum(states).item()

    t0 = time.perf_counter()
    for _ in range(iters):
        states = step(states, imgs, fields, frames, dcos)
    checksum(states).item()
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    print(json.dumps({
        "metric": "ntsc_encode_decode_640x480",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 5000.0, 3),
    }))


if __name__ == "__main__":
    main()
