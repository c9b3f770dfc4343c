"""Device mesh construction and sharding helpers.

The reference is single-device (utils/device.py:10 selects cuda-or-cpu and
that is the entirety of its distribution story).  Here parallelism is a
first-class subsystem: a 2-D ``jax.sharding.Mesh`` with axes ``("data",
"model")``.  Batches shard over ``data`` (DP over ICI), and the large vocab
projection / 2048-wide matmuls may shard over ``model`` (TP).  XLA inserts the
psum/all-gather collectives; nothing here issues comms by hand.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(mesh_shape: Optional[Tuple[int, int]] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh.

    mesh_shape=None uses all visible devices on the data axis — the right
    default for this workload (models are ~30-90M params; DP is the win,
    TP is optional for the 38k-vocab COCO-ID head).
    """
    devices = list(devices if devices is not None else jax.devices())
    if mesh_shape is None:
        mesh_shape = (len(devices), 1)
    d, m = mesh_shape
    if d * m > len(devices):
        raise ValueError(
            f"mesh_shape {mesh_shape} needs {d*m} devices, got {len(devices)}")
    arr = np.asarray(devices[:d * m]).reshape(d, m)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard leading (batch) dim over the data axis, replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with batch-dim sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch)


def local_mesh_for_testing(n: int = 8) -> Mesh:
    """n-device mesh regardless of platform (for CPU fake-device tests)."""
    devs = jax.devices()
    if len(devs) < n:
        raise RuntimeError(
            f"need {n} devices; set XLA_FLAGS=--xla_force_host_platform_device_count={n}")
    return make_mesh((n, 1), devs[:n])


def get_shard_map():
    """(shard_map callable, name of its replication-check kwarg).

    jax >= 0.8 exports jax.shard_map (check_vma); older versions only have
    jax.experimental.shard_map.shard_map (check_rep)."""
    import inspect
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map
    flag = ("check_vma" if "check_vma"
            in inspect.signature(shard_map).parameters else "check_rep")
    return shard_map, flag


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host bring-up: ``jax.distributed.initialize`` with env-var
    defaults.  Single-process (the common case, and all this machine can
    exercise) is a no-op.  After init, ``make_mesh`` over
    ``jax.devices()`` spans all hosts; data loading should shard per
    process via ``jax.process_index()``.
    """
    import os
    if num_processes is None:
        num_processes = int(os.environ.get("IIC_TPU_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    try:
        # CPU multi-process (the CI topology) needs the gloo transport for
        # cross-process collectives; TPU backends ignore this knob.
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # older jax: option absent, gloo is the default
        pass
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def replicate_for_host_fetch(tree, mesh: Mesh):
    """Make every leaf of ``tree`` fully replicated so each process can
    ``np.asarray`` it (multi-host: per-process shards of a global array are
    not host-fetchable; a jitted identity with replicated out-shardings
    inserts the all-gather over ICI).  Single-process: identity."""
    if jax.process_count() == 1:
        return tree
    return jax.jit(lambda t: t,
                   out_shardings=NamedSharding(mesh, P()))(tree)
