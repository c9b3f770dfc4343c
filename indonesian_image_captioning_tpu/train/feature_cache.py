"""Frozen-encoder feature cache: run the two ResNet-152s once per image.

The caption recipe freezes both the caption encoder and the tagger
(trains/attention_scn.py:56,81 in the reference), and this framework runs
frozen encoders in eval mode (deterministic BatchNorm) — so their outputs
are a pure function of the image.  The reference still recomputes both
forwards for EVERY caption row of EVERY epoch: with captions_per_image=5
that is 5 x epochs ResNet-152 x2 forwards per image.  This cache computes
them once, after which steady-state epochs are pure decoder work (the
encoders were ~63% of the measured train step at batch 1024, BASELINE.md).

Placement:
  * device (HBM) when the cache fits ``TrainConfig.cache_device_budget_gb``
    — per-step rows are gathered by a jitted index lookup, zero host
    traffic;
  * host RAM otherwise — a dataset view serves feature rows through the
    existing loader, so the prefetch thread overlaps the host->device copy
    with compute (and applies the mesh batch sharding, multi-host included).

Exactness: with the default ``cache_dtype="float32"`` the cached rows ARE
the ``make_encoders_fn`` outputs, so cached training is bit-identical to
uncached (tests/test_feature_cache.py); "bfloat16" halves the memory at
one rounding of the features.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

from ..core.config import ModelConfig, TrainConfig
from . import steps


class FeatureCache:
    """Per-unique-image encoder features + tagger semantics.

    ``lookup(index)`` maps device-resident CAPTION indices to f32
    (features, tags) rows; ``host_view(ds)`` wraps a dataset for the
    host-RAM path instead.
    """

    def __init__(self, feats, tags, cpi: int, on_device: bool):
        self.feats = feats
        self.tags = tags
        self.cpi = int(cpi)
        self.on_device = on_device
        self._lookup = None

    @property
    def nbytes(self) -> int:
        return self.feats.nbytes + self.tags.nbytes

    def lookup(self, cap_index):
        """(B,) caption indices (device) -> (features, tags) in f32."""
        import jax
        import jax.numpy as jnp
        assert self.on_device, "host caches serve batches via host_view()"
        if self._lookup is None:
            cpi = self.cpi

            @jax.jit
            def gather(feats, tags, idx):
                img = idx // cpi
                return (feats[img].astype(jnp.float32),
                        tags[img].astype(jnp.float32))

            self._lookup = gather
        return self._lookup(self.feats, self.tags, cap_index)

    def host_view(self, dataset) -> "HostFeatureView":
        assert not self.on_device
        return HostFeatureView(dataset, self.feats, self.tags)


class HostFeatureView:
    """Dataset view adding host-cached feature/tag rows to every batch
    (and dropping image pixels — the decoder never sees them)."""

    def __init__(self, ds, feats: np.ndarray, tags: np.ndarray):
        self._ds = ds
        self._feats = feats
        self._tags = tags
        ds.load_images = False

    def __len__(self) -> int:
        return len(self._ds)

    @property
    def cpi(self) -> int:
        return self._ds.cpi

    def gather(self, idx: np.ndarray):
        batch = self._ds.gather(idx)
        img = idx // self._ds.cpi
        batch["features"] = self._feats[img]
        batch["ftags"] = self._tags[img]
        return batch


def estimate_bytes(n_images: int, cfg: ModelConfig, dtype) -> int:
    import jax.numpy as jnp
    itemsize = jnp.dtype(dtype).itemsize
    per_img = (cfg.enc_image_size * cfg.enc_image_size * cfg.encoder_dim
               + cfg.semantic_dim) * itemsize
    return n_images * per_img


def build(state, cfg: ModelConfig, tcfg: TrainConfig, dataset, *,
          log=print, split: str = "", force_host: bool = False,
          batch_size: Optional[int] = None) -> FeatureCache:
    """Run the frozen encoders over every unique image of ``dataset``.

    Uses the same jitted programs as uncached training
    (``steps.make_encoders_fn`` with ``tcfg.encoder_dtype``), batched at
    ``batch_size`` (default: the training batch size, padded to a fixed
    shape so one program compiles).
    """
    import jax
    import jax.numpy as jnp

    dtype = jnp.dtype(tcfg.cache_dtype)
    n = dataset.num_images
    budget = int(tcfg.cache_device_budget_gb * (1 << 30))
    on_device = (not force_host
                 and estimate_bytes(n, cfg, dtype) <= budget)
    bs = batch_size or tcfg.batch_size
    encode = steps.make_encoders_fn(cfg, tcfg.encoder_dtype)
    P, E, S = cfg.enc_image_size, cfg.encoder_dim, cfg.semantic_dim

    if on_device:
        feats = jnp.zeros((n, P, P, E), dtype)
        tags = jnp.zeros((n, S), dtype)

        # donation keeps the update in place — without it every write
        # copies the whole (n, P, P, E) buffer
        @partial(jax.jit, donate_argnums=(0, 1))
        def write(feats, tags, f_rows, t_rows, start):
            return (jax.lax.dynamic_update_slice(
                        feats, f_rows.astype(dtype), (start, 0, 0, 0)),
                    jax.lax.dynamic_update_slice(
                        tags, t_rows.astype(dtype), (start, 0)))
    else:
        feats = np.zeros((n, P, P, E), dtype)
        tags = np.zeros((n, S), dtype)

    if n <= bs:
        starts = [0]
    else:
        # fixed-shape batches; the tail batch overlaps the previous one
        # (re-encoding a few rows beats padding + partial writes)
        starts = list(range(0, n - bs + 1, bs))
        if starts[-1] + bs < n:
            starts.append(n - bs)
    for s in starts:
        idx = np.arange(s, min(s + bs, n))
        imgs = dataset.gather_images(idx)
        if len(idx) < bs:  # only possible when n < bs
            pad = np.zeros((bs - len(idx),) + imgs.shape[1:], imgs.dtype)
            imgs = np.concatenate([imgs, pad])
        f_rows, t_rows = encode(state, {"images": jax.device_put(imgs)})
        if on_device:
            f_rows, t_rows = f_rows[:len(idx)], t_rows[:len(idx)]
            feats, tags = write(feats, tags, f_rows, t_rows, s)
        else:
            feats[idx] = np.asarray(f_rows[:len(idx)].astype(dtype))
            tags[idx] = np.asarray(t_rows[:len(idx)].astype(dtype))

    cache = FeatureCache(feats, tags, dataset.cpi, on_device)
    log(f"feature cache [{split or 'split'}]: {n} images, "
        f"{cache.nbytes / (1 << 20):.0f} MiB {tcfg.cache_dtype} "
        f"({'HBM' if on_device else 'host RAM'})")
    return cache
