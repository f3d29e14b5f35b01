"""Throughput benchmark: full encode+decode frames/sec/chip at 640x480.

Driver contract (default, no args): prints ONE JSON line
{"metric", "value", "unit", "vs_baseline"} for the flagship NTSC path.
Baseline target: 5000 frames/sec/chip (BASELINE.md).

Extended modes:
    python bench.py --system PV1K         one system
    python bench.py --all                 every system + batch-1 latency,
                                          also written to BENCH_FULL.json
    python bench.py --latency             batch-1 latency only (live/60 Hz)
    python bench.py --stages [--system S] per-stage ms/frame breakdown
                                          (modulate / demodulate / fused step)
    python bench.py --kernels [--system S] on-device per-kernel time table
                                          (jax.profiler trace aggregation)
Env: BENCH_BATCH (default 256), BENCH_ITERS (default 10).
"""

import argparse
import json
import os
import time

import numpy as np

TARGET_FPS = 5000.0          # BASELINE.json north star
TARGET_LAT_MS = 16.7         # 60 Hz live loop (crt_main.c:513-516)


def _inputs(system, cfg, batch, w=320, h=240):
    rng = np.random.RandomState(0)
    if cfg.kind == "nes":
        img = rng.randint(0, 512, (batch, 240, 256), np.uint16)
    else:
        img = rng.randint(0, 256, (batch, h, w, 3), np.uint8)
    return img


def bench_system(system: str, batch: int, iters: int, outw=640, outh=480):
    """Steady-state encode+decode throughput for one system preset."""
    import jax
    import jax.numpy as jnp
    from ntsc_crt_tpu.models.systems import SYSTEMS
    from ntsc_crt_tpu.parallel import mesh as pmesh

    if system not in SYSTEMS:
        raise SystemExit(
            f"unknown system {system!r}; choose from {sorted(SYSTEMS)}")
    cfg = SYSTEMS[system]
    states = pmesh.init_batch(cfg, batch, outw, outh)
    step = pmesh.make_batched_step(cfg, noise=12)

    imgs = jnp.asarray(_inputs(system, cfg, batch))
    fields = jnp.zeros((batch,), jnp.int32)
    frames = jnp.zeros((batch,), jnp.int32)
    dcos = jnp.zeros((batch,), jnp.int32)

    # warmup / compile.  NOTE: sync via a host fetch of a small state leaf —
    # block_until_ready alone does not drain the execution queue on the
    # tunneled TPU platform, and feeding the Layout.AUTO state into a fresh
    # reduction jit forces a relayout the platform rejects for some layouts.
    import numpy as _np
    checksum = lambda s: int(_np.asarray(s.hsync).sum())
    states = step(states, imgs, fields, frames, dcos)
    checksum(states)

    t0 = time.perf_counter()
    for _ in range(iters):
        states = step(states, imgs, fields, frames, dcos)
    checksum(states)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def bench_latency(system: str = "NTSC", outw=832, outh=624, iters=60):
    """Batch-1 per-frame latency — the live/60 Hz use case
    (crt_main.c:284-557 runs an 832x624 window at 60 Hz)."""
    import jax
    import jax.numpy as jnp
    from ntsc_crt_tpu.models.systems import SYSTEMS
    from ntsc_crt_tpu.models import pipeline

    cfg = SYSTEMS[system]
    state = pipeline.crt_init(cfg, outw, outh)

    def fn(state, img, field, frame):
        return pipeline.step(cfg, state, img, field=field, frame=frame,
                             noise=12)

    step = jax.jit(fn, donate_argnums=(0,))
    img = jnp.asarray(_inputs(system, cfg, 1)[0])
    checksum = jax.jit(lambda s: s.out.astype(jnp.int32).sum())

    state = step(state, img, jnp.int32(0), jnp.int32(0))
    checksum(state).item()

    t0 = time.perf_counter()
    f = 0
    for _ in range(iters):
        state = step(state, img, jnp.int32(f), jnp.int32(0))
        f ^= 1
    checksum(state).item()
    dt = time.perf_counter() - t0
    return dt / iters * 1e3  # ms/frame


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--system", "-s", default="NTSC")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--latency", action="store_true")
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--kernels", action="store_true")
    args = ap.parse_args()

    batch = int(os.environ.get("BENCH_BATCH", "256"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))

    if args.stages:
        from ntsc_crt_tpu.utils import profiling
        res = profiling.profile_stages(args.system, batch=min(batch, 64),
                                       iters=iters)
        for stage, ms in res.items():
            print(json.dumps({
                "metric": f"{args.system.lower()}_{stage}_ms_per_frame",
                "value": round(ms, 4), "unit": "ms/frame",
                "vs_baseline": round((1e3 / ms) / TARGET_FPS, 3)}))
        return

    if args.kernels:
        from ntsc_crt_tpu.utils import profiling
        total_ms, rows = profiling.profile_kernels(args.system,
                                                   batch=batch)
        print(f"device total {total_ms:.1f} ms, top kernels:")
        for name, ms, long_name in rows:
            print(f"{ms:9.2f} ms  {name[:60]}")
            if long_name:
                print(f"           -> {long_name[:160]}")
        return

    if args.all:
        systems = ["NTSC", "NTSCVHS", "SNES", "TEMPLATE", "NESRGB", "NES",
                   "PV1K"]
        results = []
        for s in systems:
            fps = bench_system(s, batch, iters)
            rec = {"metric": f"{s.lower()}_encode_decode_640x480",
                   "value": round(fps, 1), "unit": "frames/sec/chip",
                   "vs_baseline": round(fps / TARGET_FPS, 3)}
            print(json.dumps(rec), flush=True)
            results.append(rec)
        lat = bench_latency()
        rec = {"metric": "ntsc_batch1_latency_832x624",
               "value": round(lat, 3), "unit": "ms/frame",
               "vs_baseline": round(TARGET_LAT_MS / lat, 3)}
        print(json.dumps(rec), flush=True)
        results.append(rec)
        with open("BENCH_FULL.json", "w") as f:
            json.dump(results, f, indent=1)
        return

    if args.latency:
        lat = bench_latency()
        print(json.dumps({"metric": "ntsc_batch1_latency_832x624",
                          "value": round(lat, 3), "unit": "ms/frame",
                          "vs_baseline": round(TARGET_LAT_MS / lat, 3)}))
        return

    fps = bench_system(args.system, batch, iters)
    print(json.dumps({
        "metric": f"{args.system.lower()}_encode_decode_640x480",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / TARGET_FPS, 3),
    }))


if __name__ == "__main__":
    main()
