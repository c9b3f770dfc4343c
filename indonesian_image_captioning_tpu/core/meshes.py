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
              devices: Optional[Sequence[jax.Device]] = None,
              order: str = "rowmajor") -> Mesh:
    """Build a (data, model) mesh.

    mesh_shape=None uses all visible devices on the data axis — the right
    default for this workload (models are ~30-90M params; DP is the win,
    TP is optional for the 38k-vocab COCO-ID head).

    order controls which axis is adjacent in device enumeration order:
    "rowmajor" (default) makes the MODEL axis contiguous — on a pod
    slice, TP groups stay within a host's local devices and ride the
    fastest ICI hops, while DP gradient psums cross hosts (they are
    per-step, bandwidth-tolerant).  "colmajor" transposes that: the
    model axis STRIDES across hosts (device (d, m) = devices[m*D + d]) —
    the layout to exercise cross-process TP collectives explicitly
    (tests/test_distributed.py does, per SURVEY.md §5 P3).
    """
    devices = list(devices if devices is not None else jax.devices())
    if mesh_shape is None:
        mesh_shape = (len(devices), 1)
    d, m = mesh_shape
    if d * m > len(devices):
        raise ValueError(
            f"mesh_shape {mesh_shape} needs {d*m} devices, got {len(devices)}")
    if order == "colmajor":
        arr = np.asarray(devices[:d * m]).reshape(m, d).T
    elif order == "rowmajor":
        arr = np.asarray(devices[:d * m]).reshape(d, m)
    else:
        raise ValueError(f"unknown mesh order {order!r}")
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


def process_data_slice(mesh: Mesh) -> Tuple[int, int]:
    """(block_index, n_blocks) of the DATA-axis rows this process must
    supply to ``jax.make_array_from_process_local_data``.

    With the default rowmajor layout each process owns a contiguous block
    of data rows (block_index = its position, n_blocks = process count
    along data).  With colmajor TP-across-hosts layouts a process can own
    a model-column of EVERY data row — then its local slice is the whole
    batch (n_blocks = 1).  Deriving the slice from the mesh itself keeps
    the loaders correct under any (data, model) device assignment.
    """
    me = jax.process_index()
    dev = mesh.devices  # (D, M) ndarray of Devices
    rows = [i for i in range(dev.shape[0])
            if any(d.process_index == me for d in dev[i])]
    if not rows:
        raise ValueError("process owns no devices on the data axis")
    lo, hi = rows[0], rows[-1]
    if rows != list(range(lo, hi + 1)):
        raise ValueError(
            f"process {me}'s data rows {rows} are not contiguous; "
            f"reorder the mesh (make_mesh order=...) so per-process "
            f"input slices are well-defined")
    span = hi - lo + 1
    if dev.shape[0] % span:
        raise ValueError(f"data axis {dev.shape[0]} not divisible by "
                         f"per-process span {span}")
    return lo // span, dev.shape[0] // span


def replicate_for_host_fetch(tree, mesh: Mesh):
    """Make every leaf of ``tree`` fully replicated so each process can
    ``np.asarray`` it (multi-host: per-process shards of a global array are
    not host-fetchable; a jitted identity with replicated out-shardings
    inserts the all-gather over ICI).  Single-process: identity."""
    if jax.process_count() == 1:
        return tree
    return jax.jit(lambda t: t,
                   out_shardings=NamedSharding(mesh, P()))(tree)
