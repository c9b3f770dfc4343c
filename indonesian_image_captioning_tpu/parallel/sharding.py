"""Sharding rules for data/model parallel training and serving.

The reference has NO distribution story (single cuda-or-cpu device,
utils/device.py:10).  Here:

  * **DP** (P1 in SURVEY.md §2): the batch shards over the mesh "data"
    axis; parameters are replicated.  Gradients are reduced by the XLA SPMD
    partitioner (psum over ICI) — no hand-written collectives.
  * **TP** (P2): the two big vocab-facing matrices — the decoder's
    fc (decoder_dim, V) and the embedding table (V, E) — may shard their
    vocab dimension over the "model" axis.  For COCO-ID (V=38,732) this
    splits the dominant matmul and its gradient across chips.  The fc
    output column-shard makes the (B, T, V) logits land sharded over
    "model" as well, so the softmax/CE runs on V/m-wide shards.

Everything is expressed as NamedSharding trees handed to jax.jit; XLA
inserts all communication.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.meshes import DATA_AXIS, MODEL_AXIS

Pytree = Any


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding for any-rank arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def batch_sharding_tree(mesh: Mesh, batch: Pytree) -> Pytree:
    return jax.tree.map(
        lambda x: NamedSharding(
            mesh, P(DATA_AXIS, *([None] * (jax.numpy.ndim(x) - 1)))), batch)


def decoder_param_sharding(mesh: Mesh, params: Pytree,
                           shard_vocab: bool = True) -> Pytree:
    """Sharding tree for decoder params: replicate all, optionally shard
    the vocab dimension of fc (out) and embedding (rows) over "model"."""
    tree = jax.tree.map(lambda _: replicated(mesh), params)
    if not shard_vocab or mesh.shape[MODEL_AXIS] == 1:
        return tree
    tree["fc"] = {
        "w": NamedSharding(mesh, P(None, MODEL_AXIS)),
        "b": NamedSharding(mesh, P(MODEL_AXIS)),
    }
    tree["embedding"] = NamedSharding(mesh, P(MODEL_AXIS, None))
    return tree


def state_sharding(mesh: Mesh, state: Pytree,
                   shard_vocab: bool = True) -> Pytree:
    """Sharding tree for a full caption train state."""
    tree = jax.tree.map(lambda _: replicated(mesh), state)
    tree["params"] = decoder_param_sharding(mesh, state["params"], shard_vocab)
    if "opt_state" in state:
        # optimizer moments mirror the param shardings
        def opt_shard(s):
            return jax.tree.map(
                lambda _: replicated(mesh), s)
        tree["opt_state"] = jax.tree.map(lambda _: replicated(mesh),
                                         state["opt_state"])
        if shard_vocab and mesh.shape[MODEL_AXIS] > 1:
            p_shard = tree["params"]

            def map_moment(moment):
                return jax.tree.map(lambda _, sh: sh, moment, p_shard)

            # optax chain state: (clamp EmptyState, InjectHyperparamsState)
            # inner adam holds mu/nu with param structure
            from ..train.steps import is_inject_state
            new_opt = []
            for s in state["opt_state"]:
                if is_inject_state(s):
                    inner = s.inner_state
                    mapped = []
                    for st in inner:
                        if hasattr(st, "mu"):
                            mapped.append(st._replace(
                                count=replicated(mesh),
                                mu=map_moment(st.mu),
                                nu=map_moment(st.nu)))
                        else:
                            mapped.append(jax.tree.map(
                                lambda _: replicated(mesh), st))
                    new_opt.append(s._replace(
                        count=replicated(mesh),
                        hyperparams=jax.tree.map(
                            lambda _: replicated(mesh), s.hyperparams),
                        hyperparams_states=jax.tree.map(
                            lambda _: replicated(mesh),
                            s.hyperparams_states),
                        inner_state=tuple(mapped) if isinstance(inner, tuple)
                        else mapped))
                else:
                    new_opt.append(jax.tree.map(lambda _: replicated(mesh), s))
            tree["opt_state"] = tuple(new_opt)
    return tree


def place_state(mesh: Mesh, state: Pytree, shard_vocab: bool = True) -> Pytree:
    """device_put a host state onto the mesh with the sharding tree."""
    return jax.device_put(state, state_sharding(mesh, state, shard_vocab))


def place_batch(mesh: Mesh, batch: Pytree) -> Pytree:
    return jax.device_put(batch, batch_sharding_tree(mesh, batch))
