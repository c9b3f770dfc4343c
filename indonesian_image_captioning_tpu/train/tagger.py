"""Image-tagger trainer (reference trains/tagger.py).

Recipe: 10 epochs, batch 32, Adam 1e-4, dropout 0.15, BCE on sigmoid
scores, binary-accuracy-gated best checkpoint, grad clamp +-5, LR x0.8
every 8 stale epochs, early stop at 20 stale (trains/tagger.py:35-43,
111-129).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from ..core import checkpoint as ckpt_lib
from ..core.config import DataConfig, TaggerConfig, TrainConfig
from ..core.prng import per_step, root_key, stream
from ..data import loader as loader_lib
from ..data.datasets import TagDataset
from ..models import encoders
from . import steps
from .loop import EpochPrinter, fit

MODEL_NAME = "tagger"


def init_state(key, tcfg: TrainConfig, tagger_cfg: TaggerConfig,
               optimizer, encoder_init: Optional[str] = None):
    params, stats = encoders.init_encoder_tagger(
        key, tagger_cfg, arch=tagger_cfg.encoder_arch)
    if encoder_init:
        import torch
        sd = torch.load(encoder_init, map_location="cpu")
        from ..models import convert
        params_r, stats_r = convert.encoder_tagger_from_torch(
            sd.get("model_state_dict", sd))
        params, stats = params_r, stats_r
    return {"params": params, "stats": stats,
            "opt_state": optimizer.init(params)}


def main(data_cfg: DataConfig = DataConfig(),
         tcfg: Optional[TrainConfig] = None,
         tagger_cfg: TaggerConfig = TaggerConfig(),
         encoder_init: Optional[str] = None,
         resume: bool = False,
         log=print):
    from ..core.config import tagger_train_config
    tcfg = tcfg or tagger_train_config()

    train_ds = TagDataset(data_cfg.data_folder, data_cfg.data_name, "TRAIN")
    val_ds = TagDataset(data_cfg.data_folder, data_cfg.data_name, "VAL")
    if train_ds.tags.shape[1] != tagger_cfg.semantic_size:
        import dataclasses
        tagger_cfg = dataclasses.replace(
            tagger_cfg, semantic_size=int(train_ds.tags.shape[1]))
        log(f"semantic_size set to {tagger_cfg.semantic_size} from data")

    optimizer = steps.make_optimizer(tcfg.decoder_lr, tcfg.grad_clip)
    key = root_key(tcfg.seed)
    state = init_state(stream(key, "tagger_init"), tcfg, tagger_cfg,
                       optimizer, encoder_init)
    start_epoch, stale, best = 0, 0, 0.0
    if resume:
        restored = ckpt_lib.load_checkpoint(
            tcfg.checkpoint_dir, MODEL_NAME, data_cfg.data_name,
            template={"state": state, "epoch": 0,
                      "epochs_since_improvement": 0, "metric": 0.0})
        state = restored["state"]
        start_epoch = int(restored["epoch"]) + 1
        stale = int(restored["epochs_since_improvement"])
        best = float(restored["metric"])

    # -- parallelism: shard batches over the mesh "data" axis (DP) ---------
    mesh, batch_shard = None, None
    if tuple(tcfg.mesh_shape) != (1, 1):
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..core.meshes import DATA_AXIS, make_mesh
        from ..parallel import sharding as sh
        from ..parallel.train_step import make_parallel_tagger_train_step
        mesh = make_mesh(tuple(tcfg.mesh_shape), order=tcfg.mesh_order)
        if tcfg.batch_size % tcfg.mesh_shape[0]:
            raise ValueError(
                f"batch_size {tcfg.batch_size} must be divisible by the "
                f"data axis {tcfg.mesh_shape[0]} of mesh {tcfg.mesh_shape}")

        def batch_shard(ndim):
            return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))

        state = jax.device_put(
            state, jax.tree.map(lambda _: sh.replicated(mesh), state))
        B = tcfg.batch_size
        batch_template = {
            "images": np.zeros((B, 3, data_cfg.image_size,
                                data_cfg.image_size), np.uint8),
            "tags": np.zeros((B, tagger_cfg.semantic_size), np.float32),
            "valid": np.zeros((B,), np.float32),
        }
        train_step = make_parallel_tagger_train_step(
            tcfg, optimizer, mesh, state, batch_template,
            dropout_rate=tagger_cfg.dropout, arch=tagger_cfg.encoder_arch)
    else:
        train_step = steps.make_tagger_train_step(
            tcfg, optimizer, tagger_cfg.dropout, arch=tagger_cfg.encoder_arch)
    eval_step = steps.make_tagger_eval_step(
        arch=tagger_cfg.encoder_arch,
        compute_dtype=getattr(tcfg, "tagger_dtype", "float32"))
    # per-process input sharding (multi-host; single process == identity;
    # the slice derives from the mesh — see core/meshes.process_data_slice)
    if mesh is not None and jax.process_count() > 1:
        from ..core.meshes import process_data_slice
        blk, nblk = process_data_slice(mesh)
        proc = dict(process_index=blk, process_count=nblk)
    else:
        proc = {}
    drop_key = stream(key, "tagger_dropout")
    n_train = loader_lib.num_batches(len(train_ds), tcfg.batch_size)
    n_val = loader_lib.num_batches(len(val_ds), tcfg.batch_size)

    # -- device image store: pixels resident in HBM, batches carry indices -
    # (data/device_store.py; bit-identical rows, removes the per-step
    # host->device pixel copy — the tagger recipe consumes raw pixels every
    # step, so it benefits the most)
    from ..data import device_store
    train_store, val_store = device_store.build_pair(
        tcfg, train_ds, val_ds, mesh, batch_shard, log)

    state_box = {"state": state}

    def train_epoch(epoch: int):
        printer = EpochPrinter("Epoch", epoch, n_train, tcfg.print_freq, log)
        it = loader_lib.prefetch_to_device(loader_lib.iterate(
            train_ds, tcfg.batch_size, shuffle=True, seed=tcfg.seed,
            epoch=epoch, with_index=train_store is not None, **proc),
            sharding=batch_shard)
        pending = []

        def flush():
            import jax as _jax
            for j, hm in zip([j for j, _ in pending],
                             _jax.device_get([m for _, m in pending])):
                printer.update(j, Loss=float(hm["loss"]),
                               Accuracy=float(hm["acc"]))
            pending.clear()

        for i, batch in enumerate(it):
            printer.data_loaded()
            if train_store is not None:
                # the step's sharding template has no "index" leaf — it is
                # consumed entirely by the lookup
                images = train_store.lookup(batch["index"])
                batch = {k: v for k, v in batch.items() if k != "index"}
                batch["images"] = images
            rng = per_step(drop_key, epoch * n_train + i)
            state_box["state"], m = train_step(state_box["state"], batch, rng)
            pending.append((i, m))
            if i % tcfg.print_freq == 0:
                flush()
        flush()
        return {"loss": printer.avg("Loss")}

    def validate(epoch: int) -> float:
        printer = EpochPrinter("Validation", epoch, n_val, tcfg.print_freq, log)
        it = loader_lib.prefetch_to_device(loader_lib.iterate(
            val_ds, tcfg.batch_size, with_index=val_store is not None,
            **proc), sharding=batch_shard)
        for i, batch in enumerate(it):
            printer.data_loaded()
            if val_store is not None:
                images = val_store.lookup(batch["index"])
                batch = {k: v for k, v in batch.items() if k != "index"}
                batch["images"] = images
            m = eval_step(state_box["state"]["params"],
                          state_box["state"]["stats"], batch)
            printer.update(i, Loss=float(m["loss"]), Accuracy=float(m["acc"]))
        acc = printer.avg("Accuracy")
        log(f"\n * ACCURACY - {acc:.3f}\n")
        return acc

    def decay(factor: float):
        state_box["state"]["opt_state"] = steps.decay_learning_rate(
            state_box["state"]["opt_state"], factor)
        log(f"DECAYING learning rate; new LR "
            f"{steps.current_learning_rate(state_box['state']['opt_state']):.6f}")

    saver = ckpt_lib.AsyncSaver() if tcfg.async_checkpoint else None

    def save(epoch: int, stale_now: int, metric: float, is_best: bool):
        payload = {"state": state_box["state"], "epoch": epoch,
                   "epochs_since_improvement": stale_now, "metric": metric}
        if saver is not None:
            saver.submit(tcfg.checkpoint_dir, MODEL_NAME, data_cfg.data_name,
                         payload, is_best)
        else:
            ckpt_lib.save_checkpoint(tcfg.checkpoint_dir, MODEL_NAME,
                                     data_cfg.data_name, payload, is_best)

    try:
        summary = fit(tcfg, train_epoch=train_epoch, validate=validate,
                      decay_lr=decay, save=save, start_epoch=start_epoch,
                      epochs_since_improvement=stale, best_metric=best,
                      log=log)
        if saver is not None:
            saver.wait()
    finally:
        if saver is not None:
            saver.close()
    return state_box["state"], summary
