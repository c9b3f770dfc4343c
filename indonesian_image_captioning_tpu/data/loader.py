"""Batch iteration with host-side gather overlap and device prefetch.

Replaces the reference's torch DataLoader (pinned single h5py worker,
trains/attention_scn.py:49,123-130 — its #1 input bottleneck per SURVEY.md
§7).  Design:

  * deterministic per-epoch shuffling from a seeded numpy Generator;
  * fixed batch shapes for jit: the final partial batch is padded and a
    per-row ``valid`` mask is attached (losses/metrics ignore padded rows);
  * a background thread gathers and ``jax.device_put``s the next batches
    while the device computes (double buffering over PCIe);
  * images travel as uint8 (4x less host->device traffic than float32);
    normalisation runs on device in the train step.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator

import jax
import numpy as np


def batch_indices(n: int, batch_size: int, *, shuffle: bool, seed: int,
                  epoch: int, drop_last: bool = False):
    """Yield (idx array, valid count) per batch with fixed batch_size."""
    idx = np.arange(n)
    if shuffle:
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
        rng.shuffle(idx)
    for start in range(0, n, batch_size):
        chunk = idx[start:start + batch_size]
        valid = len(chunk)
        if valid < batch_size:
            if drop_last:
                return
            pad = np.zeros(batch_size - valid, np.int64)
            chunk = np.concatenate([chunk, pad])
        yield chunk, valid


def iterate(dataset, batch_size: int, *, shuffle: bool = False, seed: int = 0,
            epoch: int = 0, drop_last: bool = False,
            process_index: int = 0, process_count: int = 1,
            with_index: bool = False
            ) -> Iterator[Dict[str, np.ndarray]]:
    """Host-side batch iterator over a dataset with .gather(idx).

    Multi-host (SURVEY.md §5 dist backend): with process_count > 1 each
    process gathers only its contiguous 1/process_count slice of every
    GLOBAL batch — the slice matching its devices' portion of a batch
    sharded over the mesh "data" axis.  The shuffle order, padding and
    validity masks are computed globally (identical on every process), so
    the union of all processes' slices is exactly the single-process batch.
    """
    if batch_size % process_count:
        raise ValueError(f"batch_size {batch_size} must be divisible by "
                         f"process_count {process_count}")
    local = batch_size // process_count
    lo, hi = process_index * local, (process_index + 1) * local
    for chunk, valid in batch_indices(len(dataset), batch_size,
                                      shuffle=shuffle, seed=seed, epoch=epoch,
                                      drop_last=drop_last):
        batch = dataset.gather(chunk[lo:hi])
        if with_index:
            # dataset indices of each row (padding rows repeat index 0 and
            # are masked by valid/caplens downstream) — lets device-resident
            # caches gather per-row data by a jitted lookup
            batch["index"] = chunk[lo:hi].astype(np.int32)
        mask = np.zeros(batch_size, np.float32)
        mask[:valid] = 1.0
        batch["valid"] = mask[lo:hi]
        if valid < hi:
            # zero caplens on padding rows -> zero token mask downstream
            if "caplens" in batch:
                batch["caplens"] = batch["caplens"].copy()
                batch["caplens"][max(valid - lo, 0):] = 0
        yield batch


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Wrap a host batch iterator with a background device_put pipeline."""
    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()
    err: list = []

    def put(batch):
        if sharding is not None:
            if jax.process_count() > 1:
                # each process holds its local slice of the global batch;
                # assemble the global sharded jax.Array from local shards
                return jax.tree.map(
                    lambda x: jax.make_array_from_process_local_data(
                        sharding(np.ndim(x)), x), batch)
            return jax.tree.map(
                lambda x: jax.device_put(x, sharding(np.ndim(x))), batch)
        return jax.tree.map(jax.device_put, batch)

    def worker():
        try:
            for batch in iterator:
                q.put(put(batch))
        except Exception as e:  # propagate into the consumer thread
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item


def num_batches(n: int, batch_size: int, drop_last: bool = False) -> int:
    return n // batch_size if drop_last else -(-n // batch_size)
