"""Pallas TPU kernel: fused SCN decode step.

The decode hot loop (SURVEY.md §3.5, N1) runs the SCN recurrence once per
token per beam lane.  The XLA version (models/scn_cell.py) already fuses
the reference's 24 matmuls into 4 and — measured on v5e — runs the step at
the HBM roofline (~25 us for the 27 MB weight stream at 512 dims), so this
kernel exists as the hand-scheduled alternative: it tiles the recurrence
over a (gate, row-block) grid, keeps every intermediate in VMEM, and
streams each weight slab exactly once per row-block.

Schedule: grid = (4 gates, R/BR row blocks).  Program (g, r) computes the
pre-activation of gate g for row block r:

    pre[g, r] = (x[r] @ w_x[:, g]) * sem_x[r, g] @ w_xp[g]
              + (h[r] @ w_h[:, g]) * sem_h[r, g] @ w_hp[g] + b[g]

The cheap elementwise LSTM epilogue (sigmoid/tanh/cell update) runs in XLA
where it fuses into the surrounding program for free.  Splitting by gate
keeps VMEM well under the 16 MB budget even at the attention_scn input
width (In = embed + 2048 = 2560).

Measured (v5e, B=1024, K=5, bf16, on-device fori_loop): XLA step 1.2-1.3
ms vs this kernel 1.7-2.4 ms — XLA stays default (ModelConfig.fused_cell).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gate_kernel(x_ref, sem_x_ref, h_ref, sem_h_ref,
                 w_x_ref, w_h_ref, w_xp_ref, w_hp_ref, b_ref, out_ref):
    """pre-activation of one gate for one row block; all refs in VMEM.

    x: (BR, In); sem_x/sem_h: (BR, F); h: (BR, H)
    w_x: (In, F); w_h: (H, F); w_xp/w_hp: (F, H); b: (1, H)
    out: (BR, H)
    """
    tx = jnp.dot(x_ref[:], w_x_ref[0],
                 preferred_element_type=jnp.float32) * sem_x_ref[0]
    th = jnp.dot(h_ref[:], w_h_ref[0],
                 preferred_element_type=jnp.float32) * sem_h_ref[0]
    out_ref[0] = (jnp.dot(tx, w_xp_ref[0], preferred_element_type=jnp.float32)
                  + jnp.dot(th, w_hp_ref[0],
                            preferred_element_type=jnp.float32)
                  + b_ref[0]).astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def scn_step_fused(params, x, sem_x, sem_h, h, c, *, interpret=None,
                   block_rows: int = 128):
    """Fused SCN decode step; drop-in for scn_cell.scn_step on any leading
    shape (flattened to rows internally and padded to the row block).

    params: canonical scn_cell dict; x: (..., In); sem_x/sem_h: (..., 4, F)
    (from scn_cell.semantic_projections); h/c: (..., H).
    interpret=None auto-selects interpreter mode off-TPU (CPU tests).
    """
    if interpret is None:
        # interpreter mode off-TPU (the axon TPU platform reports "axon")
        interpret = jax.default_backend() == "cpu"
    lead = h.shape[:-1]
    In = x.shape[-1]
    H = h.shape[-1]
    F = params["w_xp"].shape[1]
    rows = 1
    for d in lead:
        rows *= d
    BR = min(block_rows, max(_round_up(rows, 8), 8))
    R = _round_up(max(rows, BR), BR)

    def flat(a, width):
        a = a.reshape(rows, width)
        if R != rows:
            a = jnp.pad(a, ((0, R - rows), (0, 0)))
        return a

    x2 = flat(x, In)
    h2 = flat(h, H)
    # (R, 4, F) -> (4, R, F) so each gate's slab is contiguous per program
    sx = jnp.moveaxis(flat(sem_x.reshape(*lead, 4 * F), 4 * F)
                      .reshape(R, 4, F), 1, 0)
    sh = jnp.moveaxis(flat(sem_h.reshape(*lead, 4 * F), 4 * F)
                      .reshape(R, 4, F), 1, 0)
    # gate-major weight slabs: (4, In, F) so each program's block has full
    # trailing (In, F) dims (Pallas tiling constraint)
    w_x4 = jnp.moveaxis(params["w_x"].reshape(In, 4, F), 1, 0)
    w_h4 = jnp.moveaxis(params["w_h"].reshape(H, 4, F), 1, 0)
    b = (params["b_x"] + params["b_h"]).reshape(4, 1, H)

    n_row_blocks = R // BR
    grid = (4, n_row_blocks)
    pre = pl.pallas_call(
        _gate_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BR, In), lambda g, r: (r, 0),
                         memory_space=pltpu.VMEM),            # x
            pl.BlockSpec((1, BR, F), lambda g, r: (g, r, 0),
                         memory_space=pltpu.VMEM),            # sem_x
            pl.BlockSpec((BR, H), lambda g, r: (r, 0),
                         memory_space=pltpu.VMEM),            # h
            pl.BlockSpec((1, BR, F), lambda g, r: (g, r, 0),
                         memory_space=pltpu.VMEM),            # sem_h
            pl.BlockSpec((1, In, F), lambda g, r: (g, 0, 0),
                         memory_space=pltpu.VMEM),            # w_x slab
            pl.BlockSpec((1, H, F), lambda g, r: (g, 0, 0),
                         memory_space=pltpu.VMEM),            # w_h slab
            pl.BlockSpec((1, F, H), lambda g, r: (g, 0, 0),
                         memory_space=pltpu.VMEM),            # w_xp[g]
            pl.BlockSpec((1, F, H), lambda g, r: (g, 0, 0),
                         memory_space=pltpu.VMEM),            # w_hp[g]
            pl.BlockSpec((1, 1, H), lambda g, r: (g, 0, 0),
                         memory_space=pltpu.VMEM),            # b[g]
        ],
        out_specs=pl.BlockSpec((1, BR, H), lambda g, r: (g, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, R, H), jnp.float32),
        interpret=interpret,
    )(x2, sx, h2, sh, w_x4, w_h4, params["w_xp"], params["w_hp"], b)

    i = jax.nn.sigmoid(pre[0, :rows])
    f = jax.nn.sigmoid(pre[1, :rows])
    o = jax.nn.sigmoid(pre[2, :rows])
    g_ = jnp.tanh(pre[3, :rows])
    c2 = flat(c, H)[:rows]
    c_new = f * c2 + i * g_
    h_new = o * jnp.tanh(c_new)
    return (h_new.reshape(*lead, H).astype(h.dtype),
            c_new.reshape(*lead, H).astype(c.dtype))
