"""Mesh-parallel train/eval/decode step builders.

Wraps the single-device step functions from train/steps.py in jax.jit with
explicit in/out shardings over a (data, model) mesh.  The SPMD partitioner
turns the replicated-params + sharded-batch spec into per-chip compute with
psum gradient reduction over ICI (DP), and column-parallel vocab matmuls
with the logits left sharded over "model" (TP) when shard_vocab is on.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import ModelConfig, TrainConfig
from ..core.meshes import DATA_AXIS
from ..train import steps as steps_lib
from . import sharding as sh


def make_parallel_caption_train_step(cfg: ModelConfig, tcfg: TrainConfig,
                                     optimizer, mesh: Mesh, state_template,
                                     batch_template,
                                     shard_vocab: bool = True):
    """jitted step(state, batch, rng) with mesh shardings baked in.

    state/batch templates provide tree structure for the sharding trees
    (abstract shapes are fine).
    """
    base = steps_lib.make_caption_train_step(cfg, tcfg, optimizer,
                                             donate=False)
    # unwrap: rebuild un-jitted step to control jit ourselves
    state_sh = sh.state_sharding(mesh, state_template, shard_vocab)
    batch_sh = sh.batch_sharding_tree(mesh, batch_template)
    metric_sh = NamedSharding(mesh, P())

    def step(state, batch, rng):
        return base.__wrapped__(state, batch, rng)

    return jax.jit(
        step,
        in_shardings=(state_sh, batch_sh, None),
        out_shardings=(state_sh, jax.tree.map(lambda _: metric_sh,
                                              {"loss": 0, "top5": 0,
                                               "n_tokens": 0, "ce": 0,
                                               "alpha_penalty": 0})),
        donate_argnums=(0,))


def make_parallel_tagger_train_step(tcfg: TrainConfig, optimizer, mesh: Mesh,
                                    state_template, batch_template,
                                    arch: str = "resnet152"):
    base = steps_lib.make_tagger_train_step(tcfg, optimizer, arch=arch,
                                            donate=False)
    state_sh = jax.tree.map(lambda _: sh.replicated(mesh), state_template)
    batch_sh = sh.batch_sharding_tree(mesh, batch_template)
    metric_sh = NamedSharding(mesh, P())

    def step(state, batch, rng):
        return base.__wrapped__(state, batch, rng)

    return jax.jit(
        step,
        in_shardings=(state_sh, batch_sh, None),
        out_shardings=(state_sh, {"loss": metric_sh, "acc": metric_sh}),
        donate_argnums=(0,))
