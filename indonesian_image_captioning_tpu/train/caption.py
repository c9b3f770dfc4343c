"""Caption model trainers: pure_scn / pure_attention / attention_scn.

Recipe parity (trains/attention_scn.py:25-61 and twins): 12 epochs, batch
32, Adam 4e-4 on the decoder, frozen ResNet encoder, frozen tagger supplying
the 1000-d semantic vector (SCN models), masked CE + alpha_c doubly
stochastic regularisation (attention models), grad clamp +-5, LR x0.8 per 8
stale epochs, early stop at 20 stale, BLEU-4-gated best checkpoint computed
from teacher-forced argmax hypotheses (trains/attention_scn.py:366-377).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from ..core import checkpoint as ckpt_lib
from ..core.config import DataConfig, ModelConfig, TrainConfig
from ..core.prng import per_step, root_key, stream
from ..core.tokens import PAD_ID, START_TOKEN
from ..data import loader as loader_lib
from ..data import vocab as vocab_lib
from ..data.datasets import CaptionDataset
from ..models import decoders, encoders
from . import steps
from .loop import EpochPrinter, fit


def load_word_map(data_cfg: DataConfig) -> Dict[str, int]:
    return vocab_lib.load_json(vocab_lib.wordmap_path(
        data_cfg.data_folder, data_cfg.data_name))


def init_state(key, cfg: ModelConfig, optimizer, *,
               tagger_checkpoint: Optional[str] = None,
               encoder_init: Optional[str] = None,
               data_name: str = ""):
    """Build the full (decoder + frozen encoder/tagger) train state."""
    import jax
    k_dec, k_enc, k_tag = jax.random.split(key, 3)
    params = decoders.init_decoder(k_dec, cfg)
    enc_params, enc_stats = encoders.init_encoder_caption(
        k_enc, arch=cfg.encoder_arch)
    if encoder_init:
        import torch
        from ..models import convert
        sd = torch.load(encoder_init, map_location="cpu")
        enc_params, enc_stats = convert.encoder_caption_from_torch(
            sd.get("encoder_model_state_dict", sd), arch=cfg.encoder_arch)
    from ..core.config import TaggerConfig
    tag_params, tag_stats = encoders.init_encoder_tagger(
        k_tag, TaggerConfig(semantic_size=cfg.semantic_dim,
                            feature_dim=cfg.encoder_dim,
                            encoder_arch=cfg.encoder_arch),
        arch=cfg.encoder_arch)
    if tagger_checkpoint:
        restored = ckpt_lib.load_pytree(tagger_checkpoint)
        tag_params = restored["state"]["params"]
        tag_stats = restored["state"]["stats"]
    return {
        "params": params,
        "opt_state": optimizer.init(params),
        "encoder": enc_params, "encoder_stats": enc_stats,
        "tagger": tag_params, "tagger_stats": tag_stats,
    }


def bleu4_from_batches(references, hypotheses) -> float:
    """Corpus BLEU-4 exactly as the reference validate() computes it
    (nltk corpus_bleu with default weights, trains/attention_scn.py:377)."""
    from nltk.translate.bleu_score import corpus_bleu
    return float(corpus_bleu(references, hypotheses))


def main(model_type: str,
         data_cfg: DataConfig = DataConfig(),
         tcfg: TrainConfig = TrainConfig(),
         model_cfg: Optional[ModelConfig] = None,
         tagger_checkpoint: Optional[str] = None,
         encoder_init: Optional[str] = None,
         resume: bool = False,
         model_overrides: Optional[Dict] = None,
         log=print):
    word_map = load_word_map(data_cfg)
    train_ds = CaptionDataset(data_cfg.data_folder, data_cfg.data_name, "TRAIN")
    val_ds = CaptionDataset(data_cfg.data_folder, data_cfg.data_name, "VAL")
    if model_cfg is None:
        cfg = ModelConfig(model_type=model_type, vocab_size=len(word_map))
        if (train_ds.tags is not None
                and train_ds.tags.shape[1] != cfg.semantic_dim):
            import dataclasses
            cfg = dataclasses.replace(
                cfg, semantic_dim=int(train_ds.tags.shape[1]))
            log(f"semantic_dim set to {cfg.semantic_dim} from data")
    else:
        cfg = model_cfg
    if model_overrides:
        import dataclasses
        cfg = dataclasses.replace(cfg, **model_overrides)
    if cfg.vocab_size != len(word_map):
        raise ValueError("model_cfg.vocab_size != wordmap size")
    start_id = word_map[START_TOKEN]

    # -- parallelism: a (data, model) mesh when mesh_shape != (1, 1) --------
    # Batches shard over "data" (DP); the vocab projection/embedding shard
    # over "model" (TP) when the model axis is >1.  XLA inserts the psum /
    # all-gather collectives over ICI; see parallel/sharding.py.
    mesh, shard_vocab, batch_shard = None, False, None
    if tuple(tcfg.mesh_shape) != (1, 1):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..core.meshes import DATA_AXIS, make_mesh
        from ..parallel import sharding as sh
        mesh = make_mesh(tuple(tcfg.mesh_shape), order=tcfg.mesh_order)
        data_par = tcfg.mesh_shape[0]
        shard_vocab = tcfg.mesh_shape[1] > 1
        if tcfg.batch_size % data_par:
            raise ValueError(
                f"batch_size {tcfg.batch_size} must be divisible by the "
                f"data axis {data_par} of mesh {tcfg.mesh_shape}")

        def batch_shard(ndim):
            return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))

    # per-process input sharding (multi-host: each process gathers its
    # slice of the global batch; single process == identity)
    import jax as _jax
    if mesh is not None and _jax.process_count() > 1:
        # derive the per-process batch slice from the mesh itself: with
        # colmajor TP-across-hosts layouts a process owns a model column
        # of every data row and must supply the whole batch
        from ..core.meshes import process_data_slice
        blk, nblk = process_data_slice(mesh)
        proc = dict(process_index=blk, process_count=nblk)
    else:
        proc = {}

    optimizer = steps.make_optimizer(tcfg.decoder_lr, tcfg.grad_clip)
    key = root_key(tcfg.seed)
    state = init_state(stream(key, f"{model_type}_init"), cfg, optimizer,
                       tagger_checkpoint=tagger_checkpoint,
                       encoder_init=encoder_init,
                       data_name=data_cfg.data_name)
    if tcfg.calibrate_encoder_stats > 0:
        import jax

        @jax.jit
        def _calib(enc_params, enc_stats, images_u8):
            # "calibrate" mode: returns the BIASED batch statistics — an
            # eval-mode forward with them reproduces the train-mode
            # normalisation (models/resnet.py _bn docstring)
            x = steps.prep_images(images_u8)
            return encoders.apply_encoder_caption(
                enc_params, enc_stats, x, train="calibrate",
                enc_image_size=cfg.enc_image_size, arch=cfg.encoder_arch)[1]

        done, acc = 0, None
        while done < tcfg.calibrate_encoder_stats:
            # drop_last only when the dataset has at least one full batch
            # (padded zero rows would bias the batch statistics)
            # distinct non-negative epoch stream disjoint from training
            # epochs (numpy SeedSequence rejects negative entropy)
            for batch in loader_lib.iterate(
                    train_ds, tcfg.batch_size, shuffle=True, seed=tcfg.seed,
                    epoch=10**9 + done,
                    drop_last=len(train_ds) >= tcfg.batch_size):
                bstats = _calib(state["encoder"], state["encoder_stats"],
                                batch["images"])
                acc = bstats if acc is None else jax.tree.map(
                    lambda a, b, d=done: (a * d + b) / (d + 1), acc, bstats)
                done += 1
                if done >= tcfg.calibrate_encoder_stats:
                    break
        state["encoder_stats"] = acc
        log(f"calibrated frozen-encoder BN stats over {done} batches")

    if tcfg.fine_tune_encoder:
        # enc_opt_state joins the state BEFORE resume so the checkpoint
        # template includes it — otherwise resuming a fine-tune run would
        # silently reset the encoder's Adam moments and decayed LR.
        enc_optimizer = steps.make_optimizer(tcfg.encoder_lr, tcfg.grad_clip)
        state["enc_opt_state"] = enc_optimizer.init(state["encoder"])
    start_epoch, stale, best = 0, 0, 0.0
    if resume:
        restored = ckpt_lib.load_checkpoint(
            tcfg.checkpoint_dir, model_type, data_cfg.data_name,
            template={"state": state, "epoch": 0,
                      "epochs_since_improvement": 0, "metric": 0.0})
        state = restored["state"]
        start_epoch = int(restored["epoch"]) + 1
        stale = int(restored["epochs_since_improvement"])
        best = float(restored["metric"])

    if mesh is not None:
        # place params/opt (vocab-sharded when model axis > 1) and the frozen
        # encoder/tagger (replicated) onto the mesh, then build the SPMD step
        state = sh.place_state(mesh, state, shard_vocab=shard_vocab)
        if tcfg.fine_tune_encoder:
            # joint decoder + ResNet fine-tuning over the mesh: encoder
            # params/moments replicated, grads psum'd by the partitioner,
            # BatchNorm batch statistics reduced over the GLOBAL batch
            from ..parallel.train_step import (
                make_parallel_caption_finetune_step)
            ft_keys = ("params", "opt_state", "encoder", "encoder_stats",
                       "enc_opt_state")
            tagger_fn, finetune_step = make_parallel_caption_finetune_step(
                cfg, tcfg, optimizer, enc_optimizer, mesh,
                {k: state[k] for k in ft_keys}, shard_vocab=shard_vocab)
        else:
            from ..parallel.train_step import make_parallel_caption_train_step
            encode_fn = steps.make_encoders_fn(cfg, tcfg.encoder_dtype)
            train_step = make_parallel_caption_train_step(
                cfg, tcfg, optimizer, mesh,
                {"params": state["params"], "opt_state": state["opt_state"]},
                shard_vocab=shard_vocab)
    elif tcfg.fine_tune_encoder:
        tagger_fn, finetune_step = steps.make_caption_finetune_train_step(
            cfg, tcfg, optimizer, enc_optimizer)
    else:
        encode_fn, train_step = steps.make_caption_train_step(
            cfg, tcfg, optimizer)
    eval_encode_fn, eval_step = steps.make_caption_eval_step(cfg, tcfg)
    drop_key = stream(key, "caption_dropout")
    n_train = loader_lib.num_batches(len(train_ds), tcfg.batch_size)
    n_val = loader_lib.num_batches(len(val_ds), tcfg.batch_size)
    state_box = {"state": state}

    # -- frozen-feature cache: encoders run once per unique image ----------
    # (train/feature_cache.py; exact at cache_dtype="float32").  With a
    # mesh the cache stays on host — rows join the batch in the dataset
    # view and ride the loader's sharded prefetch like any other leaf.
    train_cache = val_cache = None
    train_it_ds, val_it_ds = train_ds, val_ds
    if tcfg.cache_features:
        if tcfg.fine_tune_encoder:
            raise ValueError("cache_features requires a frozen encoder "
                             "(fine_tune_encoder=False)")
        from . import feature_cache
        force_host = mesh is not None
        train_cache = feature_cache.build(state, cfg, tcfg, train_ds,
                                          log=log, split="TRAIN",
                                          force_host=force_host)
        val_cache = feature_cache.build(state, cfg, tcfg, val_ds,
                                        log=log, split="VAL",
                                        force_host=force_host)
        if train_cache.on_device:
            train_ds.load_images = False
            val_ds.load_images = False
        else:
            train_it_ds = train_cache.host_view(train_ds)
            val_it_ds = val_cache.host_view(val_ds)

        import jax as __jax
        import jax.numpy as __jnp
        _to_f32 = __jax.jit(lambda f, t: (f.astype(__jnp.float32),
                                          t.astype(__jnp.float32)))

        def cached_encode(cache, batch):
            if cache.on_device:
                return cache.lookup(batch["index"])
            return _to_f32(batch["features"], batch["ftags"])

    # -- device image store: raw pixels resident in HBM ---------------------
    # Only the paths that consume pixels every step (uncached training,
    # fine_tune_encoder) need it; with cache_features the batches carry no
    # pixels at all (data/device_store.py; bit-identical rows).
    train_store = val_store = None
    if not tcfg.cache_features:
        from ..data import device_store
        train_store, val_store = device_store.build_pair(
            tcfg, train_ds, val_ds, mesh, batch_shard, log)
    cpi = train_ds.cpi

    def with_pixels(store, batch):
        if store is None:
            return batch
        return {**batch, "images": store.lookup(batch["index"], cpi)}

    def train_epoch(epoch: int):
        printer = EpochPrinter("Epoch", epoch, n_train, tcfg.print_freq, log)
        it = loader_lib.prefetch_to_device(loader_lib.iterate(
            train_it_ds, tcfg.batch_size, shuffle=True, seed=tcfg.seed,
            epoch=epoch, with_index=(train_cache is not None
                                     or train_store is not None), **proc),
            sharding=batch_shard)
        # metrics stay on device between print boundaries: a per-step sync
        # serializes the remote dispatch pipeline (~2x step time)
        pending = []

        def flush():
            import jax as _jax
            for j, hm in zip([j for j, _ in pending],
                             _jax.device_get([m for _, m in pending])):
                n_tok = int(hm["n_tokens"])
                printer.update(j, weights={"Loss": n_tok, "Top5": n_tok},
                               Loss=float(hm["loss"]), Top5=float(hm["top5"]))
            pending.clear()

        for i, batch in enumerate(it):
            printer.data_loaded()
            batch = with_pixels(train_store, batch)
            rng = per_step(drop_key, epoch * n_train + i)
            st = state_box["state"]
            if tcfg.fine_tune_encoder:
                tags = tagger_fn(st, batch)
                sub = {k: st[k] for k in ("params", "opt_state", "encoder",
                                          "encoder_stats", "enc_opt_state")}
                sub, m = finetune_step(sub, batch["images"], tags,
                                       batch["captions"], batch["caplens"],
                                       rng)
                state_box["state"] = {**st, **sub}
            else:
                if train_cache is not None:
                    enc_out, tags = cached_encode(train_cache, batch)
                else:
                    enc_out, tags = encode_fn(st, batch)
                sub, m = train_step({"params": st["params"],
                                     "opt_state": st["opt_state"]},
                                    enc_out, tags, batch["captions"],
                                    batch["caplens"], rng)
                state_box["state"] = {**st, **sub}
            pending.append((i, m))
            if i % tcfg.print_freq == 0:
                flush()
        flush()
        return {"loss": printer.avg("Loss")}

    def validate(epoch: int) -> float:
        printer = EpochPrinter("Validation", epoch, n_val, tcfg.print_freq, log)
        references, hypotheses = [], []
        it = loader_lib.prefetch_to_device(loader_lib.iterate(
            val_it_ds, tcfg.batch_size,
            with_index=(val_cache is not None or val_store is not None),
            **proc), sharding=batch_shard)
        for i, batch in enumerate(it):
            printer.data_loaded()
            batch = with_pixels(val_store, batch)
            st = state_box["state"]
            if val_cache is not None:
                enc_out, tags = cached_encode(val_cache, batch)
            else:
                enc_out, tags = eval_encode_fn(st, batch)
            m = eval_step(st["params"], enc_out, tags, batch["captions"],
                          batch["caplens"])
            n_tok = int(m["n_tokens"])
            printer.update(i, weights={"Loss": n_tok, "Top5": n_tok},
                           Loss=float(m["loss"]), Top5=float(m["top5"]))
            # multi-host: preds/batch rows are sharded across processes;
            # all-gather them so every process assembles the full
            # hypothesis set (and computes the identical BLEU gate)
            fetch = {"preds": m["preds"], "caplens": batch["caplens"],
                     "allcaps": batch["allcaps"], "valid": batch["valid"]}
            if mesh is not None:
                from ..core.meshes import replicate_for_host_fetch
                fetch = replicate_for_host_fetch(fetch, mesh)
            preds = np.asarray(fetch["preds"])
            caplens = np.asarray(fetch["caplens"])
            allcaps = np.asarray(fetch["allcaps"])
            valid = np.asarray(fetch["valid"]) > 0
            for b in range(preds.shape[0]):
                if not valid[b]:
                    continue
                # references: all captions minus <start>/<pad>
                # (trains/attention_scn.py:357-363)
                refs = [[w for w in cap.tolist()
                         if w not in (start_id, PAD_ID)]
                        for cap in allcaps[b]]
                references.append(refs)
                hypotheses.append(preds[b][:max(int(caplens[b]) - 1, 0)]
                                  .tolist())
        bleu4 = bleu4_from_batches(references, hypotheses)
        log(f"\n * LOSS - {printer.avg('Loss'):.3f}, TOP-5 ACCURACY - "
            f"{printer.avg('Top5'):.3f}, BLEU-4 - {bleu4}\n")
        return bleu4

    def decay(factor: float):
        state_box["state"]["opt_state"] = steps.decay_learning_rate(
            state_box["state"]["opt_state"], factor)
        if tcfg.fine_tune_encoder:  # reference decays both (attention_scn.py:140-142)
            state_box["state"]["enc_opt_state"] = steps.decay_learning_rate(
                state_box["state"]["enc_opt_state"], factor)
        log(f"DECAYING learning rate; new LR "
            f"{steps.current_learning_rate(state_box['state']['opt_state']):.6f}")

    # multi-host saves are synchronous: save_pytree barriers all processes,
    # and issuing those collectives from the saver thread while the main
    # thread runs train-step collectives could interleave differently per
    # process (deadlock); single-process keeps the async overlap
    import jax as _jx
    saver = (ckpt_lib.AsyncSaver()
             if tcfg.async_checkpoint and _jx.process_count() == 1 else None)

    def save(epoch: int, stale_now: int, metric: float, is_best: bool):
        payload = {"state": state_box["state"], "epoch": epoch,
                   "epochs_since_improvement": stale_now, "metric": metric}
        if saver is not None:
            saver.submit(tcfg.checkpoint_dir, model_type, data_cfg.data_name,
                         payload, is_best)
        else:
            ckpt_lib.save_checkpoint(tcfg.checkpoint_dir, model_type,
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
