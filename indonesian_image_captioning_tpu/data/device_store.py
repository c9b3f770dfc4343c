"""Device-resident uint8 image store: HBM replaces per-step host transfer.

The reference re-uploads every batch's pixels to the accelerator each step
(``.to(device)`` per batch, trains/attention_scn.py:208-210); this
framework's loader does the same through a prefetch thread.  On hosts with
slow interconnect the per-step host->device copy can exceed the train step
itself — measured on this rig: the b128 tagger step is 207 ms but the
25 MB uint8 batch takes 300-800 ms through the device relay
(tools/profile_loader.py), so pixel-feeding training is input-bound.

TPU-native fix: the flagship flickr10k TRAIN split is ~2 GB of uint8
(10k images x 3x256x256) — it simply FITS in a v5e's 16 GB HBM next to
the model.  Upload the whole split ONCE, then gather each batch's rows by
a jitted integer lookup: per-step input traffic drops to a (B,) int32
index array.  The same pattern the frozen-feature cache uses for encoder
outputs (train/feature_cache.py), applied one level earlier so it also
serves recipes that consume raw pixels every step (tagger training,
uncached caption training, fine_tune_encoder).

Exactness: the store returns the same uint8 rows the host gather would
have produced — training is bit-identical either way
(tests/test_device_store.py).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class DeviceImageStore:
    """All unique images of one split, resident in HBM as uint8."""

    def __init__(self, images, mesh=None, batch_shard=None):
        import jax
        if mesh is not None:
            # replicated table: every chip can gather any row of a globally
            # shuffled batch (sharding the table by rows would need an
            # all-to-all per step for no memory need at this scale)
            from ..parallel import sharding as sh
            self.images = jax.device_put(images, sh.replicated(mesh))
        else:
            self.images = jax.device_put(images)
        self.nbytes = int(self.images.nbytes)
        self._lookup = None
        self._batch_shard = batch_shard

    def lookup(self, idx, cpi: int = 1):
        """(B,) dataset indices (device) -> (B, 3, S, S) uint8 rows.

        ``cpi``: captions-per-image divisor for CAPTION indices (the store
        holds unique images; caption row i uses image i // cpi,
        reference datasets/caption.py:46).
        """
        import jax
        if self._lookup is None:
            kwargs = {}
            if self._batch_shard is not None:
                kwargs["out_shardings"] = self._batch_shard(4)

            @jax.jit
            def gather(images, idx, c):
                rows = images[idx // c]
                if "out_shardings" in kwargs:
                    rows = jax.lax.with_sharding_constraint(
                        rows, kwargs["out_shardings"])
                return rows

            self._lookup = gather
        return self._lookup(self.images, idx, cpi)


def estimate_bytes(dataset) -> int:
    n = getattr(dataset, "num_images", len(dataset))
    images = dataset._images
    per_img = int(np.prod(images.shape[1:]))  # uint8
    return n * per_img


def build(dataset, *, budget_bytes: int, mesh=None, batch_shard=None,
          log=print, split: str = "") -> Optional[DeviceImageStore]:
    """Upload ``dataset``'s unique images to HBM if they fit the budget.

    Returns None (caller keeps the host loader path) when the split
    exceeds ``budget_bytes`` or the images are not host-resident (the
    windowed-HDF5 fallback only triggers above 8 GB — past any HBM
    budget anyway, datasets.py IN_MEMORY_LIMIT).
    """
    images = dataset._images
    if not isinstance(images, np.ndarray):
        log(f"device image store [{split or 'split'}]: images are windowed "
            f"HDF5 (> host RAM limit) — staying on the host loader path")
        return None
    if images.nbytes > budget_bytes:
        log(f"device image store [{split or 'split'}]: "
            f"{images.nbytes / (1 << 30):.2f} GiB exceeds the "
            f"{budget_bytes / (1 << 30):.2f} GiB device budget — staying "
            f"on the host loader path")
        return None
    store = DeviceImageStore(images, mesh=mesh, batch_shard=batch_shard)
    log(f"device image store [{split or 'split'}]: "
        f"{images.shape[0]} images, {store.nbytes / (1 << 20):.0f} MiB "
        f"uint8 resident in HBM — per-step input traffic is now a (B,) "
        f"index array")
    return store


def build_pair(tcfg, train_ds, val_ds, mesh=None, batch_shard=None,
               log=print):
    """TRAIN + VAL stores per ``TrainConfig.device_images``
    ("auto" | "on" | "off"), sharing ``device_images_budget_gb``.

    Marks each stored dataset ``load_images = False`` so the loader stops
    gathering pixels; callers must then iterate ``with_index=True`` and
    substitute ``store.lookup(batch["index"])``.
    """
    mode = getattr(tcfg, "device_images", "off")
    if mode == "off":
        return None, None
    import jax
    if jax.process_count() > 1:
        # the store device_puts whole splits from one host — a single-
        # process HBM-residency optimisation; multi-host input stays on
        # the per-process sliced loader path (data/loader.py)
        if mode == "on":
            raise ValueError("device_images='on' is single-process only")
        log("device image store disabled (multi-process run)")
        return None, None
    budget = int(getattr(tcfg, "device_images_budget_gb", 4.0) * (1 << 30))
    train_store = build(train_ds, budget_bytes=budget, mesh=mesh,
                        batch_shard=batch_shard, log=log, split="TRAIN")
    if mode == "on" and train_store is None:
        raise ValueError(
            "device_images='on' but the TRAIN split does not fit "
            "device_images_budget_gb (or is windowed HDF5)")
    val_store = None
    if train_store is not None:
        train_ds.load_images = False
        val_store = build(val_ds, budget_bytes=budget - train_store.nbytes,
                          mesh=mesh, batch_shard=batch_shard, log=log,
                          split="VAL")
        if val_store is not None:
            val_ds.load_images = False
    return train_store, val_store
