"""Device-mesh parallelism for frame pipelines.

The reference is single-threaded C (SURVEY.md §2: no parallel components
exist); the TPU-native scaling story is new design:

* **data axis** — frames are embarrassingly parallel apart from the small
  cross-frame state pytree (sync estimates, ccf EMA, PRNG streams, blend
  buffer).  We batch a CRTState per frame-slot and shard the batch over the
  `data` mesh axis; collectives are never needed inside a step.
* **spatial axis** — within one frame the heavy phases (per-line EQ scans,
  scan conversion) are independent across scanlines; sharding constraints on
  the line dimension let XLA split them over the `spatial` axis, with any
  halo exchange (sync-window gathers) inserted automatically as ICI
  collectives.

State-handling modes for video (SURVEY.md §5):
  - `independent` (default): each batch slot carries its own CRTState — the
    per-slot streams are exact CRT emulations of interleaved sub-videos.
  - `pipelined`: lax.scan over frames within a slot preserves the reference's
    strict frame-to-frame semantics (see models/video.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ntsc_crt_tpu.models import pipeline
from ntsc_crt_tpu.models.demodulate import MonitorParams
from ntsc_crt_tpu.models.systems import SystemConfig

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(n_data: Optional[int] = None, n_spatial: int = 1,
              devices=None) -> Mesh:
    """Mesh over (data, spatial).  Defaults to all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_spatial
    assert n_data * n_spatial == len(devices), \
        f"{n_data}x{n_spatial} != {len(devices)} devices"
    auto = (jax.sharding.AxisType.Auto,) * 2
    return jax.make_mesh((n_data, n_spatial), (DATA_AXIS, SPATIAL_AXIS),
                         devices=devices, axis_types=auto)


def init_batch(cfg: SystemConfig, batch: int, outw: int, outh: int,
               mesh: Optional[Mesh] = None) -> pipeline.CRTState:
    """A batch of per-slot CRT states, optionally sharded over `data`."""
    states = pipeline.crt_init(cfg, outw, outh, batch=batch)
    # decorrelate noise streams across slots (each slot is its own CRT)
    states = states._replace(
        rn=jnp.arange(194, 194 + batch, dtype=jnp.int32),
        randstate=jnp.arange(1, 1 + batch, dtype=jnp.int32))
    if mesh is not None:
        states = jax.tree.map(lambda x: jax.device_put(
            x, NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))),
            states)
    return states


def make_batched_step(cfg: SystemConfig, *, noise=0,
                      mon: Optional[MonitorParams] = None,
                      donate: bool = True, **step_kw):
    """The full modulate+demodulate step over a frame batch (the cores are
    natively batch-first — no vmap).

    Returns jitted fn(states, imgs, fields, frames, dcos) -> states.
    imgs: uint8 (B, h, w, 3) or uint16 (B, h, w) for NES.  Extra keyword
    args (do_bloom, eq_mode, ...) forward to pipeline.step.

    With donate=True the carried state rides compiler-chosen (Layout.AUTO)
    buffer layouts.  Read results via direct host fetches (np.asarray) —
    feeding the state into a *separate* jit can force a relayout that some
    TPU platforms reject for auto-chosen layouts; pass donate=False if the
    state must interoperate with other jitted consumers on device.
    """
    mon = mon or MonitorParams()

    def fn(states, imgs, fields, frames, dcos):
        return pipeline.step(cfg, states, imgs, field=fields, frame=frames,
                             noise=noise, mon=mon, dot_crawl_offset=dcos,
                             **step_kw)

    if donate:
        # AUTO layouts on the donated state: XLA picks matching input/output
        # layouts for the carried pytree, so the per-step canonicalizing
        # copies of the big buffers (out, analog) disappear — the state only
        # ever lives in the compute-natural layout.  (First call relays out
        # the caller's buffers once.)
        from jax.experimental.layout import Format, Layout
        auto = Format(Layout.AUTO)
        return jax.jit(fn, donate_argnums=(0,),
                       in_shardings=(auto, None, None, None, None),
                       out_shardings=auto)
    return jax.jit(fn)


def make_sharded_step(cfg: SystemConfig, mesh: Mesh, *, noise=0,
                      mon: Optional[MonitorParams] = None):
    """Batched step with explicit data-axis sharding over the mesh.

    Frames (and their states) are sharded over `data`; each device runs its
    sub-batch locally.  With a non-trivial `spatial` axis, the compute cores
    additionally constrain the LINE dimension of their heavy per-line stages
    onto it (parallel/spatial.py): GSPMD partitions the scanline-parallel
    work and inserts the collectives at the serial seams (sync scans) itself.
    """
    from ntsc_crt_tpu.parallel import spatial

    mon = mon or MonitorParams()

    def batch_spec(x):
        return NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))

    def sharded(states, imgs, fields, frames, dcos):
        with spatial.line_sharding(mesh):  # trace-time: tags line dims
            states = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, batch_spec(x)),
                states)
            imgs = jax.lax.with_sharding_constraint(imgs, batch_spec(imgs))
            out = pipeline.step(cfg, states, imgs, field=fields, frame=frames,
                                noise=noise, mon=mon, dot_crawl_offset=dcos)
            return jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, batch_spec(x)),
                out)

    return jax.jit(sharded, donate_argnums=(0,))
