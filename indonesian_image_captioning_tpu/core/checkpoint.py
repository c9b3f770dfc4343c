"""Checkpointing: one canonical pytree format + best-copy semantics.

The reference keeps two incompatible formats (SURVEY.md §5): pickled whole
modules for training resume (utils/checkpoint.py:4-31) and state_dicts for
serving.  Here there is ONE canonical format — an orbax directory checkpoint
of a plain pytree:

    {"params": ..., "opt_state": ..., "epoch": int,
     "epochs_since_improvement": int, "metric": float, "extra": {...}}

Naming parity with the reference file scheme (checkpoint.py:28-31):
``checkpoint_{model}_{data}`` and a ``BEST_checkpoint_{model}_{data}`` copy
when the validation metric improves.  Torch serve-format import/export lives
in models/convert.py.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def _ckpt_name(model_name: str, data_name: str) -> str:
    return f"checkpoint_{model_name}_{data_name}"


def save_checkpoint(directory: str, model_name: str, data_name: str,
                    state: Dict[str, Any], is_best: bool) -> str:
    """Save ``state`` under the reference naming scheme; copy to BEST_* on
    improvement (utils/checkpoint.py:4-31 semantics)."""
    name = _ckpt_name(model_name, data_name)
    path = os.path.abspath(os.path.join(directory, name))
    save_pytree(path, state)
    if is_best:
        best = os.path.abspath(os.path.join(directory, "BEST_" + name))
        if jax.process_index() == 0:      # multi-host: one writer
            if os.path.exists(best):
                shutil.rmtree(best)
            shutil.copytree(path, best)
        _multihost_barrier(f"save_checkpoint:best:{best}")
        return best
    return path


class AsyncSaver:
    """Epoch checkpoints written off-thread: the trainer keeps stepping
    while device→host fetch + orbax serialisation run in the background.

    The reference (and a naive port) blocks the train loop for the whole
    save (utils/checkpoint.py:4-31 is synchronous torch.save).  Here
    ``submit`` snapshots the state with an ON-DEVICE copy (cheap — one
    dispatched copy op per leaf) and returns immediately; a single worker
    thread then fetches and writes.  The device copy is what makes this
    safe next to donated train steps: the next step donates the ORIGINAL
    state buffers, never the snapshot.  Saves execute in submission order
    (one worker), so the last submitted state is what ends up on disk.

    Call ``wait()`` before reading checkpoints back or returning from the
    trainer; worker exceptions re-raise there (and on the next submit).
    """

    def __init__(self):
        import queue
        import threading
        self._q = queue.Queue()
        self._err = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                args, kwargs = item
                save_checkpoint(*args, **kwargs)
            except BaseException as e:  # surfaced on wait()/next submit
                self._err = e
            finally:
                self._q.task_done()

    @staticmethod
    def _snapshot(tree):
        import jax.numpy as jnp

        def copy_leaf(x):
            if isinstance(x, jax.Array):
                return jnp.copy(x)
            return x

        return jax.tree.map(copy_leaf, tree)

    def submit(self, directory: str, model_name: str, data_name: str,
               state: Dict[str, Any], is_best: bool) -> None:
        self._raise_pending()
        self._q.put(((directory, model_name, data_name,
                      self._snapshot(state), is_best), {}))

    def wait(self) -> None:
        """Block until every submitted save has been written."""
        self._q.join()
        self._raise_pending()

    def close(self) -> None:
        self._q.put(None)

    def _raise_pending(self):
        if self._err is not None:
            err, self._err = self._err, None
            raise err


def load_checkpoint(directory: str, model_name: str, data_name: str,
                    best: bool = False,
                    template: Optional[Dict[str, Any]] = None):
    name = _ckpt_name(model_name, data_name)
    if best:
        name = "BEST_" + name
    return load_pytree(os.path.abspath(os.path.join(directory, name)),
                       template)


def _multihost_barrier(tag: str) -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)


def save_pytree(path: str, tree) -> None:
    """Write ``tree`` to ``path``.

    Multi-host: replicated leaves (the DP case) fetch directly; leaves
    SHARDED across processes (multi-host TP: vocab-sharded fc/embedding/
    Adam moments) are all-gathered first with
    ``multihost_utils.process_allgather`` so every process materialises
    the same global value.  Process 0 writes alone and everyone barriers —
    both before rmtree (no process may still be reading the old version)
    and after the write (no process may read a half-written checkpoint).
    """
    def fetch(x):
        # NOTE (scale): this materialises the FULL global value of every
        # TP-sharded leaf on every host before the save — host-RAM and
        # interconnect cost grows with vocab*width*processes.  Fine at
        # this model family's scale (the largest sharded leaf is the
        # COCO fc/embedding, ~80 MB); if sharded state ever grows past
        # host RAM, switch to orbax's global-jax.Array serialisation
        # (ocp writes shards directly, no per-leaf allgather).
        if (isinstance(x, jax.Array) and not x.is_fully_addressable
                and not x.sharding.is_fully_replicated):
            from jax.experimental import multihost_utils
            return np.asarray(
                multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(jax.device_get(x))

    tree = jax.tree.map(fetch, tree)
    if jax.process_index() == 0 and os.path.exists(path):
        shutil.rmtree(path)
    # no process may enter the write before the old version is cleared
    _multihost_barrier(f"save_pytree:cleared:{path}")
    if _HAVE_ORBAX:
        # orbax checkpointers are themselves multihost-collective (they
        # sync_global_processes internally): EVERY process calls save;
        # orbax writes host-replicated arrays from the primary only
        ocp.PyTreeCheckpointer().save(path, tree)
    else:  # pragma: no cover - orbax is in the image
        if jax.process_index() == 0:
            os.makedirs(path, exist_ok=True)
            np.save(os.path.join(path, "tree.npy"),
                    np.asarray([tree], dtype=object), allow_pickle=True)
        _multihost_barrier(f"save_pytree:post:{path}")


def load_pytree(path: str, template=None):
    if _HAVE_ORBAX:
        if template is not None:
            # restore with the template's tree structure (tuples/NamedTuples
            # such as optax states do not round-trip without a target)
            item = jax.tree.map(np.asarray, jax.device_get(template))
            return ocp.PyTreeCheckpointer().restore(path, item=item)
        return ocp.PyTreeCheckpointer().restore(path)
    restored = np.load(os.path.join(path, "tree.npy"),  # pragma: no cover
                       allow_pickle=True)[0]
    return restored
