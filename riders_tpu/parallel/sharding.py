"""Device mesh and sharding layout.

The reference's only parallelism is single-host torch DataParallel
(rcnet_model.py:259-265; SURVEY.md 2.10b documents the absence of TP/PP/SP/
EP).  The TPU-native design makes parallelism a compile-time sharding over a
`jax.sharding.Mesh` instead of a runtime replicate-scatter-gather cycle:

* ``data``   - the frame batch axis.  SML batches, RC-Net frame batches and
               fused-inference streams shard here; gradient reduction is an
               XLA all-reduce over ICI inserted automatically by jit.
* ``points`` - the per-frame radar-point patch axis (B x K patches,
               SURVEY.md 2.10b calls this the domain-specific second
               parallel axis).  RC-Net's patch decode work shards here,
               scaling K without touching the frame axis.

Parameters and optimizer state are replicated (the models are ~16M params -
far below HBM; sharding them would only add collective latency).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
POINTS_AXIS = "points"


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Join a multi-host JAX job (DCN).  The reference has no multi-node
    path at all (SURVEY.md 2.10b); here multi-host is one call - after it,
    `make_mesh()` spans every chip in the job and the same jit-sharded
    train steps scale out (data parallelism over DCN, everything else over
    ICI).  No-op when env-based auto-detection applies (TPU pods).

    On the CPU backend (the multi-host CI analog, tests/test_multihost.py)
    cross-process collectives need an explicit implementation - without it
    the CPU client silently comes up single-process."""
    import os

    import jax

    # The platform may be selected via env OR jax.config; checking only
    # the env var would silently come up single-process for config-based
    # CPU runs.  (jax.default_backend() can't be probed here - it would
    # initialize the backend before distributed.initialize.)
    platforms = (os.environ.get("JAX_PLATFORMS", "")
                 or (getattr(jax.config, "jax_platforms", None) or ""))
    if platforms.split(",")[0].strip() == "cpu":
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if coordinator_address is None and num_processes is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        # Fail loudly if the client still came up single-process (e.g. a
        # CPU backend picked a collectives impl without cross-process
        # support) - the silent failure mode this function exists to
        # prevent.
        if jax.process_count() != num_processes:
            raise RuntimeError(
                f"jax.distributed.initialize joined "
                f"{jax.process_count()} process(es), expected "
                f"{num_processes}; multi-process collectives are not "
                "wired up on this backend")


def make_mesh(n_data: int = -1, n_points: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, points) mesh.  n_data=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_points < 1:
        raise ValueError(f"n_points must be >= 1, got {n_points}")
    if n_data == -1:
        n_data = len(devices) // n_points
    if n_data < 1:
        raise ValueError(
            f"mesh wants n_points={n_points} but only {len(devices)} "
            f"device(s) are available")
    if n_data * n_points > len(devices):
        raise ValueError(
            f"mesh wants {n_data * n_points} devices "
            f"({n_data} data x {n_points} points), have {len(devices)}")
    used = devices[: n_data * n_points]
    arr = np.asarray(used).reshape(n_data, n_points)
    return Mesh(arr, (DATA_AXIS, POINTS_AXIS))


def mesh_from_config(mesh_cfg,
                     devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build the (data, points) mesh from a core.config.MeshConfig."""
    return make_mesh(mesh_cfg.data_parallel, mesh_cfg.points_parallel,
                     devices)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over `data`."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def frame_points_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard (B, K, ...) arrays over (data, points)."""
    return NamedSharding(mesh, P(DATA_AXIS, POINTS_AXIS,
                                 *([None] * (ndim - 2))))


def shard_batch(mesh: Mesh, batch: Dict[str, jax.Array],
                point_keys: Sequence[str] = ("points", "point_mask",
                                             "boxes")) -> Dict[str, jax.Array]:
    """Device-put a host batch with per-key shardings: frame-indexed arrays
    over `data`, point-bucket arrays over (data, points)."""
    out = {}
    for k, v in batch.items():
        if k in point_keys and v.ndim >= 2:
            out[k] = jax.device_put(v, frame_points_sharding(mesh, v.ndim))
        else:
            out[k] = jax.device_put(v, batch_sharding(mesh, v.ndim))
    return out


def with_data_sharding(mesh: Mesh, fn, donate_state: bool = False):
    """Wrap a (state, batch) -> (state, aux) step with explicit shardings:
    state replicated, batch sharded on `data` (and `points` where shaped
    (B, K, ...)).  XLA inserts the gradient all-reduce over ICI."""
    rep = replicated(mesh)

    def sharded(state, batch):
        state = jax.device_put(state, rep)
        batch = shard_batch(mesh, batch)
        return fn(state, batch)

    return sharded
