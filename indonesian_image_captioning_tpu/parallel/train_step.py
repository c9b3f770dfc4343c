"""Mesh-parallel train step builders.

Wraps the single-device step logic from train/steps.py in jax.jit with
explicit in/out shardings over a (data, model) mesh.  The SPMD partitioner
turns replicated-params + sharded-batch into per-chip compute with psum
gradient reduction over ICI (DP), and column-parallel vocab matmuls with
logits left sharded over "model" (TP) when shard_vocab is on.

The frozen encoders need no special handling: their jitted programs follow
the sharding of their inputs (batch over "data", weights replicated), so
``steps.make_encoders_fn`` works unchanged on a mesh once inputs are placed
with ``sharding.place_batch``.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import ModelConfig, TrainConfig
from ..core.meshes import DATA_AXIS
from ..train import steps as steps_lib
from . import sharding as sh


def _substate_sharding(mesh: Mesh, substate, shard_vocab: bool):
    full = sh.state_sharding(mesh, substate, shard_vocab)
    return {"params": full["params"], "opt_state": full["opt_state"]}


def make_parallel_caption_train_step(cfg: ModelConfig, tcfg: TrainConfig,
                                     optimizer, mesh: Mesh,
                                     substate_template,
                                     shard_vocab: bool = True):
    """Returns jitted step(substate, enc_out, tags, captions, caplens, rng)
    with DP batch sharding and optional TP vocab sharding."""
    import dataclasses

    tp_mesh = None
    if shard_vocab:
        # The fused training-scan kernel pair (ops/train_pallas.py) has
        # no GSPMD partitioning rules, and under TP the embedding table
        # is vocab-sharded — the decoder keeps the XLA scan, which the
        # partitioner handles.  The chunked CE head runs vocab-parallel
        # through its own shard_map island (steps.make_chunked_head_island)
        # when the step resolves head_impl="chunked".
        # vocab-sharded embedding table: keep the GSPMD-partitionable
        # one-hot contraction for its gradient (the scatter kernel has
        # no partitioning rules)
        cfg = dataclasses.replace(cfg, train_scan_impl="xla",
                                  embed_grad_impl="onehot")
        spmd_mesh = None
        tp_mesh = mesh
    else:
        # Pure DP: the fused kernel runs PER SHARD through a shard_map
        # island inside the partitioned step (models/decoders.py
        # teacher_forcing) — each chip scans its local batch rows with
        # replicated weights, and the island's autodiff psums the
        # weight cotangents over the data axis.
        spmd_mesh = mesh
    _, base = steps_lib.make_caption_train_step(cfg, tcfg, optimizer,
                                                donate=False,
                                                spmd_mesh=spmd_mesh,
                                                tp_mesh=tp_mesh)
    substate_sh = _substate_sharding(mesh, substate_template, shard_vocab)
    # P(DATA_AXIS) shards the leading (batch) dim regardless of rank
    data = lambda _ndim: NamedSharding(mesh, P(DATA_AXIS))
    metric_sh = NamedSharding(mesh, P())
    metric_tree = {"loss": metric_sh, "top5": metric_sh,
                   "n_tokens": metric_sh, "ce": metric_sh,
                   "alpha_penalty": metric_sh}

    return jax.jit(
        base.__wrapped__,
        in_shardings=(substate_sh, data(4), data(2), data(2), data(1), None),
        out_shardings=(substate_sh, metric_tree),
        donate_argnums=(0,))


def make_parallel_caption_finetune_step(cfg: ModelConfig, tcfg: TrainConfig,
                                        dec_optimizer, enc_optimizer,
                                        mesh: Mesh, state_template,
                                        shard_vocab: bool = True):
    """Joint decoder + ResNet fine-tuning over a (data, model) mesh.

    Returns (tagger_fn, step) with the same protocol as
    ``steps.make_caption_finetune_train_step``:
      step(state, images_u8, tags, captions, caplens, rng)
    where state = {"params", "opt_state", "encoder", "encoder_stats",
    "enc_opt_state"} — decoder params/moments optionally vocab-sharded over
    "model", encoder params/moments replicated, batch over "data".

    Train-mode BatchNorm under DP: the batch-statistic reductions span the
    GLOBAL batch (the partitioner inserts the cross-chip psums), i.e.
    synchronized BN — same numerics as the single-device step up to FP
    reduction order, NOT per-shard statistics.
    """
    tagger_fn, base = steps_lib.make_caption_finetune_train_step(
        cfg, tcfg, dec_optimizer, enc_optimizer, donate=False)
    # the fine-tune loss differentiates through enc_out, so the decoder
    # already keeps the XLA scan (no fused-kernel GSPMD gap to work around)
    state_sh = sh.state_sharding(mesh, state_template, shard_vocab)
    data = lambda _ndim: NamedSharding(mesh, P(DATA_AXIS))
    metric_sh = NamedSharding(mesh, P())
    metric_tree = {"loss": metric_sh, "top5": metric_sh,
                   "n_tokens": metric_sh, "ce": metric_sh,
                   "alpha_penalty": metric_sh}
    step = jax.jit(
        base.__wrapped__,
        in_shardings=(state_sh, data(4), data(2), data(2), data(1), None),
        out_shardings=(state_sh, metric_tree),
        donate_argnums=(0,))
    return tagger_fn, step


def make_parallel_tagger_train_step(tcfg: TrainConfig, optimizer, mesh: Mesh,
                                    state_template, batch_template,
                                    dropout_rate: float = 0.15,
                                    arch: str = "resnet152"):
    base = steps_lib.make_tagger_train_step(tcfg, optimizer, dropout_rate,
                                            arch=arch, donate=False)
    state_sh = jax.tree.map(lambda _: sh.replicated(mesh), state_template)
    batch_sh = sh.batch_sharding_tree(mesh, batch_template)
    metric_sh = NamedSharding(mesh, P())

    return jax.jit(
        base.__wrapped__,
        in_shardings=(state_sh, batch_sh, None),
        out_shardings=(state_sh, {"loss": metric_sh, "acc": metric_sh}),
        donate_argnums=(0,))
