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
Env: BENCH_BATCH (default 512), BENCH_ITERS (default 10).
Batch 512 is the measured-best throughput configuration (r5): the s8
(sub, lane) tiling of the direct-transpose hsync-chase prep is pad-free
at multiples of 512 rows — PV1K +7% over batch 256, every other system
>= its batch-256 number.  The video-pipeline lines keep batch 256 so the
T=1024-frame streams stay >= 4 frames deep per slot.
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


def bench_system(system: str, batch: int, iters: int, outw=640, outh=480,
                 **step_kw):
    """Steady-state encode+decode throughput for one system preset.
    step_kw (do_bloom=True, eq_mode="conv7", ...) benches the reference's
    compile-time build-variant modes."""
    import jax
    import jax.numpy as jnp
    from ntsc_crt_tpu.models.systems import SYSTEMS
    from ntsc_crt_tpu.parallel import mesh as pmesh

    if system not in SYSTEMS:
        raise SystemExit(
            f"unknown system {system!r}; choose from {sorted(SYSTEMS)}")
    cfg = SYSTEMS[system]
    states = pmesh.init_batch(cfg, batch, outw, outh)
    step = pmesh.make_batched_step(cfg, noise=12, **step_kw)

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


def bench_video(system: str, T: int, batch: int, iters: int,
                outw=640, outh=480, mode="strided"):
    """Throughput of the VIDEO pipeline — the reference's actual batch
    workload (extra/video_convert.c:246-277).  `strided` is the throughput
    claim (B interleaved sub-videos, each an exact CRT emulation);
    `exact` is the latency-honesty number (strict sequential frame chain,
    bit-identical to the C driver's state flow)."""
    import jax
    import jax.numpy as jnp
    from ntsc_crt_tpu.models.systems import SYSTEMS
    from ntsc_crt_tpu.models import pipeline, video
    from ntsc_crt_tpu.parallel import mesh as pmesh

    cfg = SYSTEMS[system]
    frames = jnp.asarray(_inputs(system, cfg, T))
    checksum = lambda s: int(np.asarray(s.hsync).sum())

    # per-frame checksum fold INSIDE the scan body: the driver would stream
    # each frame to disk, so the bench must not stack T full frames in HBM
    # (T=1024 at 640x480 RGB is ~0.9 GB — enough to wedge the tunneled
    # allocator; the r5 --all run died exactly here)
    fold = lambda out: out.astype(jnp.uint32).sum()

    if mode == "strided":
        states = pmesh.init_batch(cfg, batch, outw, outh)

        def fn(states, frames):
            st, outs = video.video_strided(cfg, states, frames, noise=12,
                                           out_transform=fold)
            return st, outs.sum()

        run = jax.jit(fn, donate_argnums=(0,))
        states, _ = run(states, frames)
        checksum(states)
        t0 = time.perf_counter()
        for _ in range(iters):
            states, _ = run(states, frames)
        checksum(states)
        return T * iters / (time.perf_counter() - t0)

    state = pipeline.crt_init(cfg, outw, outh)

    def fn(state, frames):
        st, outs = video.video_exact(cfg, state, frames, noise=12,
                                     out_transform=fold)
        return st, outs.sum()

    run = jax.jit(fn, donate_argnums=(0,))
    state, _ = run(state, frames)
    checksum(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _ = run(state, frames)
    checksum(state)
    return T * iters / (time.perf_counter() - t0)


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


GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tests", "fixtures", "device_parity_goldens.npz")
# tag -> (system preset, pipeline.step mode kwargs, batch).  The bloom and
# conv7 tags pin the r4 fused decode variants (CRT_DO_BLOOM /
# USE_CONVOLUTION) on the bench device, not just the base three-band path.
# The batch-16 tags (VERDICT r4 #1) replay the THROUGHPUT regime: every
# shipped fps number runs batch >= _BIG_BATCH, which takes different code —
# the triangular-ones vsync matmul (demodulate.py _vsync_big_batch), the
# big-batch hsync probe branch, and for NTSCVHS the TPU-only region-B
# Pallas march (ops/pallas/vhs_scan.py) — none of which run at batch 1.
# SNES/NESRGB cover the remaining encoder families on-device.
PARITY_RUNS = {
    "NTSC": ("NTSC", {}, 1),
    "PV1K": ("PV1K", {}, 1),
    "NES": ("NES", {}, 1),
    "SNES": ("SNES", {}, 1),
    "NESRGB": ("NESRGB", {}, 1),
    "NTSCVHS": ("NTSCVHS", {}, 1),
    "NTSC_bloom": ("NTSC", {"do_bloom": True}, 1),
    "NTSC_conv7": ("NTSC", {"eq_mode": "conv7"}, 1),
    "NTSC_b16": ("NTSC", {}, 16),
    "PV1K_b16": ("PV1K", {}, 16),
    "NTSCVHS_b16": ("NTSCVHS", {}, 16),
}


def _parity_run(tag: str):
    """Two small frames (state carried, field toggled) on the DEFAULT
    backend; returns the final state leaves.  Shapes are tiny so this adds
    ~seconds to the bench but exercises encoder+decoder+Pallas/bf16 paths —
    in BOTH batch regimes — on whatever hardware the driver runs bench.py
    on.  Batched runs go through the exact bench path (init_batch +
    make_batched_step with donated Layout.AUTO state)."""
    import jax
    import jax.numpy as jnp
    from ntsc_crt_tpu.models.systems import SYSTEMS
    from ntsc_crt_tpu.models import pipeline

    system, mode_kw, batch = PARITY_RUNS[tag]
    cfg = SYSTEMS[system]
    if batch > 1:
        from ntsc_crt_tpu.parallel import mesh as pmesh
        states = pmesh.init_batch(cfg, batch, 128, 96)
        step = pmesh.make_batched_step(cfg, noise=7, **mode_kw)
        imgs = jnp.asarray(_inputs(system, cfg, batch, w=80, h=60))
        zeros = jnp.zeros((batch,), jnp.int32)
        # second step toggles field/frame per slot so both parities appear
        alt = jnp.arange(batch, dtype=jnp.int32) % 2
        states = step(states, imgs, zeros, zeros, zeros)
        states = step(states, imgs, alt, alt, zeros)
        return {f"{tag}/{k}": np.asarray(v)
                for k, v in states._asdict().items()}
    state = pipeline.crt_init(cfg, 128, 96)
    img = jnp.asarray(_inputs(system, cfg, 1)[0])

    def fn(state, field, frame):
        return pipeline.step(cfg, state, img, field=field, frame=frame,
                             noise=7, **mode_kw)

    step = jax.jit(fn)
    state = step(state, jnp.int32(0), jnp.int32(0))
    state = step(state, jnp.int32(1), jnp.int32(1))
    return {f"{tag}/{k}": np.asarray(v)
            for k, v in state._asdict().items()}


def make_goldens():
    """Regenerate the committed CPU-golden fixture (run under JAX_PLATFORMS=
    cpu).  bench.py's default mode replays the same frames on the bench
    device and asserts bit-equality — driver-visible TPU correctness
    (VERDICT.md r2, next-round #2)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")  # beats axon sitecustomize
    assert jax.default_backend() == "cpu", \
        "goldens must be generated on CPU (set JAX_PLATFORMS=cpu)"
    arrs = {}
    for s in PARITY_RUNS:
        arrs.update(_parity_run(s))
    np.savez_compressed(GOLDENS, **arrs)
    print(f"wrote {GOLDENS}: {sorted(arrs)}")


def check_device_parity() -> int:
    """1 if the bench device reproduces the committed CPU goldens bit-exactly
    (the <=1 LSB obligation is met at 0 LSB), else 0."""
    if not os.path.exists(GOLDENS):
        return 0
    ref = np.load(GOLDENS)
    ok = 1
    for s in PARITY_RUNS:
        if not any(k.startswith(s + "/") for k in ref.files):
            print(f"# parity MISSING goldens for {s} — regenerate", flush=True)
            ok = 0
            continue
        got = _parity_run(s)
        for k, v in got.items():
            if not np.array_equal(ref[k], v):
                n = int((np.asarray(ref[k]) != v).sum())
                print(f"# parity FAIL {k}: {n} mismatched elements",
                      flush=True)
                ok = 0
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--system", "-s", default="NTSC")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--latency", action="store_true")
    ap.add_argument("--video", choices=["strided", "exact"],
                    help="bench the video pipeline (models/video.py)")
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--kernels", action="store_true")
    ap.add_argument("--make-goldens", action="store_true")
    ap.add_argument("--parity", action="store_true")
    args = ap.parse_args()

    if args.make_goldens:
        make_goldens()
        return
    if args.parity:
        print(json.dumps({"metric": "tpu_parity",
                          "value": check_device_parity(),
                          "unit": "bitexact_vs_cpu_goldens",
                          "vs_baseline": 1.0}))
        return

    batch = int(os.environ.get("BENCH_BATCH", "512"))
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
        # seven base systems + the variant presets (NTSC_RAINBOW's 912-wide
        # line exercises different padding/tiling; LP/EP different
        # bandwidth coefs) + the bloom / conv-EQ decode build modes
        systems = ["NTSC", "NTSCVHS", "SNES", "TEMPLATE", "NESRGB", "NES",
                   "PV1K", "NTSC_RAINBOW", "NTSCVHS_LP", "NTSCVHS_EP"]
        modes = [("ntsc_bloom", "NTSC", dict(do_bloom=True)),
                 ("ntsc_conv7", "NTSC", dict(eq_mode="conv7"))]
        results = [{"metric": "tpu_parity", "value": check_device_parity(),
                    "unit": "bitexact_vs_cpu_goldens", "vs_baseline": 1.0}]
        print(json.dumps(results[0]), flush=True)

        def save(rec):  # incremental: a crash keeps the lines already run
            print(json.dumps(rec), flush=True)
            results.append(rec)
            with open("BENCH_FULL.json", "w") as f:
                json.dump(results, f, indent=1)

        for s in systems:
            fps = bench_system(s, batch, iters)
            save({"metric": f"{s.lower()}_encode_decode_640x480",
                  "value": round(fps, 1), "unit": "frames/sec/chip",
                  "vs_baseline": round(fps / TARGET_FPS, 3)})
        for name, s, kw in modes:
            fps = bench_system(s, batch, iters, **kw)
            save({"metric": f"{name}_encode_decode_640x480",
                  "value": round(fps, 1), "unit": "frames/sec/chip",
                  "vs_baseline": round(fps / TARGET_FPS, 3)})
        # the reference's actual throughput workload: the video pipeline
        # (extra/video_convert.c:246-277) in both execution modes
        vb = min(batch, 256)
        vids = [("video_strided_ntsc", "NTSC", "strided", 1024, vb),
                ("video_strided_ntscvhs", "NTSCVHS", "strided", 1024, vb),
                ("video_exact_ntsc", "NTSC", "exact", 64, 1),
                ("video_exact_ntscvhs", "NTSCVHS", "exact", 64, 1)]
        for name, s, mode, T, b in vids:
            fps = bench_video(s, T=T, batch=b, iters=max(2, iters // 3),
                              mode=mode)
            save({"metric": f"{name}_640x480",
                  "value": round(fps, 1), "unit": "frames/sec/chip",
                  "vs_baseline": round(fps / TARGET_FPS, 3)})
        lat = bench_latency()
        save({"metric": "ntsc_batch1_latency_832x624",
              "value": round(lat, 3), "unit": "ms/frame",
              "vs_baseline": round(TARGET_LAT_MS / lat, 3)})
        return

    if args.video:
        T = 1024 if args.video == "strided" else 64
        b = min(batch, 256) if args.video == "strided" else 1
        fps = bench_video(args.system, T=T, batch=b,
                          iters=max(2, iters // 3), mode=args.video)
        print(json.dumps({
            "metric": f"video_{args.video}_{args.system.lower()}_640x480",
            "value": round(fps, 1), "unit": "frames/sec/chip",
            "vs_baseline": round(fps / TARGET_FPS, 3)}))
        return

    if args.latency:
        lat = bench_latency()
        print(json.dumps({"metric": "ntsc_batch1_latency_832x624",
                          "value": round(lat, 3), "unit": "ms/frame",
                          "vs_baseline": round(TARGET_LAT_MS / lat, 3)}))
        return

    # Driver-visible device correctness (VERDICT.md r2 #2): replay the
    # committed CPU goldens on the bench device FIRST, then print the
    # headline throughput line LAST (the driver parses the final line).
    try:
        parity = check_device_parity()
    except Exception as e:  # a parity crash must not hide the perf number
        print(f"# parity check crashed: {e!r}", flush=True)
        parity = 0
    print(json.dumps({"metric": "tpu_parity", "value": parity,
                      "unit": "bitexact_vs_cpu_goldens",
                      "vs_baseline": 1.0}), flush=True)

    fps = bench_system(args.system, batch, iters)
    print(json.dumps({
        "metric": f"{args.system.lower()}_encode_decode_640x480",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / TARGET_FPS, 3),
    }))


if __name__ == "__main__":
    main()
