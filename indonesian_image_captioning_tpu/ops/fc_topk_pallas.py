"""Pallas TPU kernel: fused vocab projection + online softmax-stats + top-k.

Decode profiling (BASELINE.md, bench ablations) shows the per-step vocab
head is a large share of beam-search time in XLA: the (R, V) logits tensor
(R = batch x beam rows) is written to HBM by the fc matmul, re-read by
log_softmax, and re-read again by ``lax.top_k`` (~1 ms/step at R=1280,
V=6763 — top_k alone is lowering-bound, not bandwidth-bound).

This kernel never materialises logits in HBM.  Grid = (row tiles, vocab
tiles); each program computes a logits tile on the MXU and folds it into
running per-row state held in VMEM/outputs across the vocab tiles:

  * online logsumexp (max + scaled sum, flash-attention style);
  * exact per-row top-k via k rounds of (rowmax, insert-into-sorted-
    registers, mask) — k is the beam width (<= 8), so the merge is a few
    VPU passes per tile.

Outputs per row: top-k raw-logit values + their vocab indices + the
logsumexp.  The caller turns these into exact flat beam candidates:
per-lane top-k of logits == per-lane top-k of logprobs (the logsumexp is a
per-row monotone shift), and at most k flat winners can come from one lane,
so candidates = lane_score + top_v - lse over K*k entries reproduce the
dense flat top-k exactly.

That sparse-candidate beam mode EXISTS: ``ModelConfig.sparse_head`` routes
``decode/beam.py`` through per-lane candidates (see its module docstring
for the exactness argument).  Its production backend is XLA per-row
``lax.top_k`` rather than this kernel, per measurement.

Tie-break note: insertion uses count(tv >= v) so equal values keep the
earlier (lower vocab index / earlier lane) entry first — matching
``lax.top_k``'s first-occurrence order.

Measured (v5e, B=1024, K=k=5, bf16, on-device fori_loop): per decode step
at V=6,763 the XLA dense head (fc+log_softmax+flat top_k) takes 2.36 ms,
the XLA per-row-top_k sparse head 1.77 ms, and this kernel + sparse merge
4.10 ms — the k sequential rowmax/insert rounds per vocab tile cost more
VPU passes than the avoided logits round-trip saves.  Inside the full
51-step beam while_loop even the XLA sparse head loses to dense
(348 vs 294 ms/batch) because the flat top_k fuses better there, so the
dense head is the default at flickr vocab; this kernel remains the exact,
TPU-verified building block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _make_kernel(k: int, v_tile: int, n_vtiles: int):
    def kernel(h_ref, w_ref, b_ref, topv_ref, topi_ref, lse_ref,
               m_ref, s_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            topv_ref[:] = jnp.full_like(topv_ref, NEG)
            topi_ref[:] = jnp.zeros_like(topi_ref)
            m_ref[:] = jnp.full_like(m_ref, NEG)
            s_ref[:] = jnp.zeros_like(s_ref)

        logits = jnp.dot(h_ref[:], w_ref[:],
                         preferred_element_type=jnp.float32) + b_ref[:]
        R, Vt = logits.shape

        # online logsumexp
        tile_max = jnp.max(logits, axis=1, keepdims=True)        # (R, 1)
        m_old = m_ref[:, :1]
        m_new = jnp.maximum(m_old, tile_max)
        s_ref[:, :1] = (s_ref[:, :1] * jnp.exp(m_old - m_new)
                        + jnp.sum(jnp.exp(logits - m_new), axis=1,
                                  keepdims=True))
        m_ref[:, :1] = m_new

        # exact top-k merge: k rounds of extract-max + sorted insert
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, Vt), 1)
        kcols = jax.lax.broadcasted_iota(jnp.int32, (R, k), 1)
        base = j * v_tile
        work = logits
        tv = topv_ref[:]
        ti = topi_ref[:]
        for _ in range(k):
            v = jnp.max(work, axis=1, keepdims=True)             # (R, 1)
            amax = jnp.argmax(work, axis=1)                      # (R,)
            gidx = (base + amax)[:, None]                        # (R, 1)
            # stable insertion position: after equal-valued entries
            pos = jnp.sum((tv >= v).astype(jnp.int32), axis=1,
                          keepdims=True)                         # (R, 1)
            tv_shift = pltpu.roll(tv, 1, axis=1)
            ti_shift = pltpu.roll(ti, 1, axis=1)
            tv = jnp.where(kcols < pos, tv,
                           jnp.where(kcols == pos, v, tv_shift))
            ti = jnp.where(kcols < pos, ti,
                           jnp.where(kcols == pos, gidx, ti_shift))
            work = jnp.where(col_ids == amax[:, None], NEG, work)
        topv_ref[:] = tv
        topi_ref[:] = ti

        @pl.when(j == n_vtiles - 1)
        def _():
            lse_ref[:, :1] = m_ref[:, :1] + jnp.log(s_ref[:, :1])

    return kernel


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit,
                   static_argnames=("k", "interpret", "r_tile", "v_tile"))
def fc_topk(h, w, b, k: int, *, interpret=None, r_tile: int = 256,
            v_tile: int = 512):
    """h (R, D) @ w (D, V) + b -> per-row (top_vals (R, k) raw logits,
    top_idx (R, k) int32, lse (R,) logsumexp).  Exact."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    R, D = h.shape
    V = w.shape[1]
    Rp = _round_up(max(R, 8), 8)
    Rt = min(r_tile, Rp)
    Rp = _round_up(Rp, Rt)
    Vp = _round_up(V, v_tile)
    n_vtiles = Vp // v_tile

    hp = jnp.pad(h.astype(jnp.float32), ((0, Rp - R), (0, 0)))
    wp = jnp.pad(w.astype(jnp.float32), ((0, 0), (0, Vp - V)))
    bp = jnp.pad(b.astype(jnp.float32), (0, Vp - V),
                 constant_values=NEG).reshape(1, Vp)

    kernel = _make_kernel(k, v_tile, n_vtiles)
    topv, topi, lse = pl.pallas_call(
        kernel,
        grid=(Rp // Rt, n_vtiles),
        in_specs=[
            pl.BlockSpec((Rt, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, v_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Rt, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rt, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rt, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((Rp, k), jnp.float32),
                   jax.ShapeDtypeStruct((Rp, k), jnp.int32),
                   jax.ShapeDtypeStruct((Rp, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((Rt, 128), jnp.float32),
                        pltpu.VMEM((Rt, 128), jnp.float32)],
        interpret=interpret,
    )(hp, wp, bp)
    return topv[:R], topi[:R], lse[:R, 0]
