"""Pallas TPU kernel: fused SCN decode step.

The decode hot loop (SURVEY.md §3.5, N1) runs the SCN recurrence once per
token per beam lane.  The XLA version (models/scn_cell.py) already fuses
the reference's 24 matmuls into 4; this kernel fuses the WHOLE step —
both gate matmul chains, the semantic modulation, the per-gate output
projections and the LSTM nonlinearities — into one VMEM-resident program,
removing every intermediate HBM round trip.  At decode batch sizes
(B*K ~ 5..320 rows) the step is bandwidth-bound on weight streaming, so
keeping activations in VMEM and streaming each weight slab exactly once is
the speed-of-light schedule.

Layout: rows = B*K flattened lanes padded to a multiple of 8 (fp32
sublane).  Weights arrive in the canonical scn_cell layout:
    w_x (In, 4F), w_h (H, 4F), w_xp/w_hp (4, F, H), b (4, H)
with the semantic factors sem_x/sem_h (rows, 4F) precomputed outside the
loop (they are loop invariants — see scn_cell.semantic_projections).

Grid: single program (decode shapes fit VMEM comfortably:
rows<=512, In<=2560, F=H=512 -> ~13 MB weights + activations in fp32
streamed in 4F-column tiles of one gate each).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scn_step_kernel(x_ref, sem_x_ref, sem_h_ref, h_ref, c_ref,
                     w_x_ref, w_h_ref, w_xp_ref, w_hp_ref, b_ref,
                     h_out_ref, c_out_ref):
    """One fused SCN step.  All refs in VMEM.

    x:     (R, In)    concatenated input (embedding [+ gated awe])
    sem_*: (R, 4F)    semantic factors
    h, c:  (R, H)
    w_x:   (In, 4F);  w_h: (H, 4F);  w_xp/w_hp: (4, F, H);  b: (4, H)
    """
    x = x_ref[:]
    h = h_ref[:]
    F = w_xp_ref.shape[1]
    H = w_xp_ref.shape[2]

    # Gate factor activations: one fused matmul per path (MXU), then the
    # semantic Hadamard modulation (VPU) while still in VMEM.
    tx = jnp.dot(x, w_x_ref[:], preferred_element_type=jnp.float32)
    tx = tx * sem_x_ref[:]
    th = jnp.dot(h, w_h_ref[:], preferred_element_type=jnp.float32)
    th = th * sem_h_ref[:]

    # Per-gate output projections + bias + nonlinearities, gate by gate —
    # each gate's (R, F) slab hits the MXU against (F, H).
    def gate(g):
        pre = (jnp.dot(tx[:, g * F:(g + 1) * F], w_xp_ref[g],
                       preferred_element_type=jnp.float32)
               + jnp.dot(th[:, g * F:(g + 1) * F], w_hp_ref[g],
                         preferred_element_type=jnp.float32)
               + b_ref[g])
        return pre

    i = jax.nn.sigmoid(gate(0))
    f = jax.nn.sigmoid(gate(1))
    o = jax.nn.sigmoid(gate(2))
    g_ = jnp.tanh(gate(3))
    c_new = f * c_ref[:] + i * g_
    h_out_ref[:] = (o * jnp.tanh(c_new)).astype(h_out_ref.dtype)
    c_out_ref[:] = c_new.astype(c_out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def scn_step_fused(params, x, sem_x, sem_h, h, c, *, interpret: bool = False):
    """Fused SCN decode step; drop-in for scn_cell.scn_step on 2-D inputs.

    params: canonical scn_cell dict; x: (..., In); sem_x/sem_h: (..., 4, F)
    (as produced by semantic_projections — reshaped internally); h/c:
    (..., H).  Leading dims are flattened to rows and padded to the fp32
    sublane multiple.
    """
    lead = h.shape[:-1]
    In = x.shape[-1]
    H = h.shape[-1]
    F = params["w_xp"].shape[1]
    rows = 1
    for d in lead:
        rows *= d
    R = max(_round_up(rows, 8), 8)

    def flat(a, width):
        a = a.reshape(rows, width)
        if R != rows:
            a = jnp.pad(a, ((0, R - rows), (0, 0)))
        return a

    x2 = flat(x, In)
    sx = flat(sem_x.reshape(*lead, 4 * F), 4 * F)
    sh = flat(sem_h.reshape(*lead, 4 * F), 4 * F)
    h2 = flat(h, H)
    c2 = flat(c, H)
    b = jnp.stack([params["b_x"][g] + params["b_h"][g] for g in range(4)])

    h_new, c_new = pl.pallas_call(
        _scn_step_kernel,
        out_shape=(jax.ShapeDtypeStruct((R, H), h.dtype),
                   jax.ShapeDtypeStruct((R, H), c.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(x2, sx, sh, h2, c2, params["w_x"], params["w_h"], params["w_xp"],
      params["w_hp"], b)

    h_new = h_new[:rows].reshape(*lead, H)
    c_new = c_new[:rows].reshape(*lead, H)
    return h_new, c_new
