"""Fast exact per-row top-k for the beam's vocab head.

``jax.lax.top_k`` dominates the decode-step vocab head on TPU: at
(R, V) = (5120, 6763) its lowering costs ~1.9 ms of the 2.36 ms XLA head
(tools/profile_decode.py) — it is bound by its sort-style lowering, not by
the 26 MB of logit traffic.  The beam needs only k = beam_size (<= 8)
winners per row (reference flat top-k, models/decoders/attention_scn.py:
246-252), so an extract-max loop beats a sort asymptotically AND in
practice.  Two interchangeable exact backends:

* :func:`row_topk_pallas` — single HBM pass.  Grid = (row tiles, vocab
  tiles); each program folds its logits tile into running (k) sorted
  registers per row (same merge as ops/fc_topk_pallas.py, minus the
  matmul).  Reads x exactly once.
* :func:`row_topk_iterative` — pure XLA: k rounds of (max, argmax, mask).
  k passes over x, but each is a cheap VPU reduce + select that XLA fuses;
  no sort lowering anywhere.

Both reproduce ``jax.lax.top_k`` BITWISE, ties included: within a tile
``jnp.argmax`` takes the first occurrence; across tiles the insertion
position ``count(tv >= v)`` keeps earlier (lower-index) entries ahead of
equal later ones — lax.top_k's first-occurrence order.  Values are
compared in float32 (exact supersets of bf16/f16 orderings).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(k: int, v_tile: int, v_actual: int):
    def kernel(x_ref, topv_ref, topi_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            topv_ref[:] = jnp.full_like(topv_ref, NEG)
            topi_ref[:] = jnp.zeros_like(topi_ref)

        work = x_ref[:].astype(jnp.float32)                  # (Rt, Vt)
        R, Vt = work.shape
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, Vt), 1)
        kcols = jax.lax.broadcasted_iota(jnp.int32, (R, k), 1)
        base = j * v_tile
        # V need not divide the tile: out-of-range lanes of the (padded)
        # final block carry unspecified values — mask them out here rather
        # than jnp.pad-ing the input (the pad would materialise a copy of
        # the full candidate table every decode step).
        work = jnp.where(base + col_ids < v_actual, work, NEG)
        tv = topv_ref[:]
        ti = topi_ref[:]
        for _ in range(k):
            v = jnp.max(work, axis=1, keepdims=True)         # (R, 1)
            amax = jnp.argmax(work, axis=1)                  # (R,) first occ.
            gidx = (base + amax)[:, None]
            # stable insertion position: after equal-valued earlier entries
            pos = jnp.sum((tv >= v).astype(jnp.int32), axis=1,
                          keepdims=True)
            tv_shift = pltpu.roll(tv, 1, axis=1)
            ti_shift = pltpu.roll(ti, 1, axis=1)
            tv = jnp.where(kcols < pos, tv,
                           jnp.where(kcols == pos, v, tv_shift))
            ti = jnp.where(kcols < pos, ti,
                           jnp.where(kcols == pos, gidx, ti_shift))
            work = jnp.where(col_ids == amax[:, None], NEG, work)
        topv_ref[:] = tv
        topi_ref[:] = ti

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("k", "interpret", "r_tile", "v_tile"))
def row_topk_pallas(x, k: int, *, interpret=None, r_tile: int = 256,
                    v_tile: int = 2048):
    """Exact per-row top-k: x (R, V) -> (vals (R, k) in x.dtype, idx (R, k)
    int32), bitwise equal to ``jax.lax.top_k(x, k)``.  One HBM pass."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    R, V = x.shape
    Rp = _round_up(max(R, 8), 8)
    Rt = min(r_tile, Rp)
    Rp = _round_up(Rp, Rt)
    Vt = min(v_tile, _round_up(V, 128))

    # rows must tile exactly (outputs are row-indexed); the vocab axis is
    # allowed to be ragged — the kernel masks the final partial block.
    xp = jnp.pad(x, ((0, Rp - R), (0, 0))) if Rp != R else x

    kernel = _make_kernel(k, Vt, V)
    topv, topi = pl.pallas_call(
        kernel,
        grid=(Rp // Rt, _round_up(V, Vt) // Vt),
        in_specs=[pl.BlockSpec((Rt, Vt), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((Rt, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rt, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((Rp, k), jnp.float32),
                   jax.ShapeDtypeStruct((Rp, k), jnp.int32)),
        interpret=interpret,
    )(xp)
    return topv[:R].astype(x.dtype), topi[:R]


def row_topk(x, k: int, backend: str = "pallas"):
    """Dispatch per-row top-k by backend name (ModelConfig.topk_backend).

    All backends are bitwise-identical (tests/test_topk.py).  On CPU —
    where Pallas would run in slow interpret mode — "pallas" silently uses
    lax.top_k; results cannot differ.  "iterative" is plain XLA and runs
    everywhere, so CPU tests exercise the production default for real.
    """
    if backend == "lax":
        return jax.lax.top_k(x, k)
    if backend == "pallas":
        if jax.default_backend() == "cpu":
            return jax.lax.top_k(x, k)
        return row_topk_pallas(x, k)
    if backend == "iterative":
        return row_topk_iterative(x, k)
    raise ValueError(f"unknown topk backend: {backend!r}")


def row_topk_iterative(x, k: int):
    """Exact per-row top-k via k rounds of (max, argmax, mask) — pure XLA,
    no sort lowering.  Bitwise equal to ``jax.lax.top_k(x, k)``."""
    R, V = x.shape
    work = x.astype(jnp.float32)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, V), 1)
    vals, idxs = [], []
    for _ in range(k):
        v = jnp.max(work, axis=1)
        i = jnp.argmax(work, axis=1)
        vals.append(v)
        idxs.append(i)
        work = jnp.where(col_ids == i[:, None], NEG, work)
    return (jnp.stack(vals, axis=1).astype(x.dtype),
            jnp.stack(idxs, axis=1))
