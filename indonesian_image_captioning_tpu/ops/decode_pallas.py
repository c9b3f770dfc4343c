"""Fused full-decode Pallas kernel: ALL beam-search steps on-chip.

The step-loop decode (decode/beam.py driving models/decoders.make_beam_step)
re-reads the loop-invariant encoder tensors from HBM every step: at bench
dims (B=1024, K=5, Pp=208, E=2048, A=512, bf16) that is ~1.09 GB per step,
~55 GB per 51-step decode — the attention step's ~1.4 ms/step HBM floor.
This kernel instead grids over CHUNKS of G images, keeps each chunk's
``enc`` / ``enc_att`` resident in VMEM for the whole decode, and runs the
entire per-step computation — embedding lookup, additive attention
(reference models/attention.py:6-44), f_beta gating, the SCN recurrence
(models/scn_cell.py:52-154), the vocab head and the beam's flat top-k
selection (models/decoders/attention_scn.py:217-290) — inside one
``fori_loop``.  Encoder state is read from HBM exactly ONCE per decode.

The kernel emits only per-step selection records (next words, parent
lanes, cumulative scores — 3 x (B, T, K)); sequence assembly, completion
pools, freezing and final best-pick run afterwards through the exact same
bookkeeping code as the live engine (decode/replay.py).

Mosaic-shaped design notes:

  * All per-row state lives in (G*K, d) 2D rows (G*K must be a multiple of
    the 8-sublane tile — the wrapper picks G accordingly).  The few
    (G*K, k) <-> (G, K*K) layout moves that beam selection needs are NOT
    expressible as Mosaic shape casts; they are done as exact one-hot
    matmuls instead (token ids < 2^24, so f32 accumulation is exact).
  * The beam-parent state reorder is a block-diagonal one-hot permutation
    matmul — an exact gather on the MXU, no dynamic indexing.
  * Embedding lookup is a one-hot contraction against the VMEM-resident
    table: R dense MXU rows per step versus R serialized scalar loads for
    a dynamic gather.

Numerics: matmuls accumulate f32 on the MXU and round to the compute dtype
exactly like the XLA step path; softmax/log-softmax/score accumulation run
in f32.  The beam-search scores use f32 log-softmax of the (dtype) logits,
whereas the XLA sparse-head path computes log-softmax in the logits dtype —
at bf16 the two paths can therefore pick different-but-equal-quality words
in near-ties; at f32 they agree exactly (tests/test_decode_fused.py).
Tie-breaking replicates lax.top_k's first-occurrence order via the same
argmax+mask rounds as ops/topk_pallas.py.

Scope: attention_scn (the flagship serving model).  pure_scn/pure_attention
keep the step-loop engine (their decode has no per-step HBM re-read of
comparable size — no attention, or no 2048-wide enc gather).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention_pallas import _compiler_params, pad_pixels

NEG = -1e30  # matches decode/beam.py NEG_INF


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pick_img_tile(B: int, K: int, max_tile: int = 16):
    """Largest image tile G <= max_tile with B % G == 0 and (G*K) % 8 == 0
    (the Mosaic sublane rule for the (G*K, d) row blocks), or None if no
    such tile exists — callers then fall back to the step-loop engine."""
    for G in range(min(max_tile, B), 0, -1):
        if B % G == 0 and (G * K) % 8 == 0:
            return G
    return None


def _make_kernel(*, G, K, Pp, P, E, A, D, Emb, F, H, Vp, T, m,
                 start_id, end_id, dt, L_emb=1):
    R = G * K
    F4 = 4 * F

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def xdot(a, b):
        # EXACT one-hot contraction: the default TPU f32 matmul precision
        # is a single bf16 pass, which bf16-rounds the payload — vocab
        # ids >= 256 corrupt and carried f32 scores lose 16 mantissa bits
        # (discovered on-chip via ops/span_pallas.py, same layout moves;
        # toy-vocab tests never see it because ids < 256 are bf16-exact).
        # HIGHEST uses 3 bf16 limbs per f32, so value*1.0 + zeros is
        # bit-exact; layout matmuls are tiny next to the step compute.
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

    # Mosaic (jax 0.9.0) miscompiles lax.logistic/tanh on bf16 vectors
    # (f32 scalar broadcast into a bf16 vector fails verification).  The
    # hardware evaluates transcendentals in f32 regardless, so computing in
    # f32 and rounding to the compute dtype matches the XLA lowering.
    def sig(x):
        return jax.nn.sigmoid(x.astype(jnp.float32)).astype(dt)

    def tnh(x):
        return jnp.tanh(x.astype(jnp.float32)).astype(dt)

    def kernel(enc_ref, ea_ref, semx_ref, semh_ref, h0_ref, c0_ref,
               emb_ref, wda_ref, bda_ref, wf_ref, wfb_ref, bfb_ref,
               wxe_ref, wxa_ref, wh_ref, wxp_ref, whp_ref, bx_ref, bh_ref,
               fcw_ref, fcb_ref,
               words_ref, par_ref, vals_ref,
               h_scr, c_scr, sc_scr, pw_scr, al_scr, bd_scr, dec_scr,
               awe_scr):
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]
        rows_r = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        sc_scr[:] = jnp.where(rows_r % K == 0, 0.0, NEG).astype(jnp.float32)
        pw_scr[:] = jnp.full((R, 1), start_id, jnp.int32)
        al_scr[:] = jnp.full((G, 1), K, jnp.int32)

        wf = wf_ref[:].astype(dt)
        lane = jax.lax.broadcasted_iota(jnp.int32, (G, K), 1)
        # Layout-move one-hots (see module docstring):
        #   img_of (R, G): row r -> image r // K
        #   lane_of (R, K): row r -> lane r % K
        #   sel[k] (G, R): image g -> row g*K + k
        img_of = (jax.lax.broadcasted_iota(jnp.int32, (R, G), 1)
                  == rows_r // K).astype(jnp.float32)
        lane_of = (jax.lax.broadcasted_iota(jnp.int32, (R, K), 1)
                   == rows_r % K).astype(jnp.float32)
        colsR_g = jax.lax.broadcasted_iota(jnp.int32, (G, R), 1)
        rowsG = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
        sel = [(colsR_g == rowsG * K + k).astype(jnp.float32)
               for k in range(K)]

        def gk_to_rows(M):
            """(G, K) f32 -> (R, 1): value of the row's (image, lane)."""
            per_row = xdot(img_of, M)                      # (R, K)
            return jnp.sum(per_row * lane_of, axis=1, keepdims=True)

        def rows_to_gkk(M):
            """(R, k) f32 -> (G, K*k): lane-major flatten per image."""
            return jnp.concatenate([xdot(s, M) for s in sel], axis=1)

        # one-hot selections of dt-valued rows (embedding lookup, parent
        # reorder) are exact at the bf16 default when dt is bf16; f32
        # payloads need the exact path
        edot = xdot if dt == jnp.float32 else dot

        def step(t, carry):
            any_alive = jnp.max(al_scr[:]) > 0

            @pl.when(any_alive)
            def _():
                h = h_scr[:]
                c = c_scr[:]
                # ---- embedding lookup (one-hot contraction) ----
                cols_v = jax.lax.broadcasted_iota(jnp.int32, (R, Vp), 1)
                # exact bf16 limb tables (step_pallas.embedding_limbs)
                oh = (cols_v == pw_scr[:]).astype(jnp.bfloat16)
                emb_f = dot(oh, emb_ref[0])
                for li in range(1, L_emb):
                    emb_f = emb_f + dot(oh, emb_ref[li])
                emb = emb_f.astype(dt)                     # (R, Emb)

                # ---- attention (same schedule as attend_fused_v3) ----
                dec_scr[:] = (dot(h, wda_ref[:]).astype(dt)
                              + bda_ref[:].astype(dt))     # (R, A)
                for base in range(0, G, m):
                    bd_scr[:] = jnp.zeros_like(bd_scr)
                    for j in range(m):
                        g = base + j
                        ea = ea_ref[g]                     # (Pp, A)
                        dk = dec_scr[g * K:(g + 1) * K, :]
                        cols = []
                        for k in range(K):
                            e = jnp.maximum(ea + dk[k:k + 1, :], 0)
                            cols.append(jnp.sum(e * wf, axis=1,
                                                keepdims=True))
                        att = jnp.concatenate(cols, axis=1).astype(
                            jnp.float32)                   # (Pp, K)
                        if P < Pp:
                            rows = jax.lax.broadcasted_iota(
                                jnp.int32, (Pp, K), 0)
                            att = jnp.where(rows < P, att, float("-inf"))
                        mx = jnp.max(att, axis=0, keepdims=True)
                        ex = jnp.exp(att - mx)
                        s = jnp.sum(ex, axis=0, keepdims=True)
                        alpha = ex / s                     # (Pp, K) f32
                        bd_scr[j * Pp:(j + 1) * Pp, j * K:(j + 1) * K] = \
                            alpha.astype(bd_scr.dtype)
                    enc_grp = enc_ref[base:base + m].reshape(m * Pp, E)
                    awe_scr[base * K:(base + m) * K, :] = jax.lax.dot_general(
                        bd_scr[:], enc_grp, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32).astype(dt)
                gate = sig(dot(h, wfb_ref[:]).astype(dt)
                           + bfb_ref[:].astype(dt))
                awe = gate * awe_scr[:]                    # (R, E)

                # ---- SCN recurrence (mirrors models/scn_cell.scn_step) ----
                xfac = (dot(emb, wxe_ref[:]).astype(dt)
                        + dot(awe, wxa_ref[:]).astype(dt)) * semx_ref[:]
                hfac = dot(h, wh_ref[:]).astype(dt) * semh_ref[:]
                pre = []
                for g4 in range(4):
                    sl = slice(g4 * F, (g4 + 1) * F)
                    slh = slice(g4 * H, (g4 + 1) * H)
                    xg = dot(xfac[:, sl], wxp_ref[sl, :]) \
                        + bx_ref[:, slh].astype(jnp.float32)
                    hg = dot(hfac[:, sl], whp_ref[sl, :]) \
                        + bh_ref[:, slh].astype(jnp.float32)
                    pre.append((xg + hg).astype(dt))       # (R, H)
                i_g = sig(pre[0])
                f_g = sig(pre[1])
                o_g = sig(pre[2])
                c_t = tnh(pre[3])
                c_new = f_g * c + i_g * c_t
                h_new = o_g * tnh(c_new)

                # ---- vocab head + per-lane top-K (f32 scores) ----
                logits = (dot(h_new, fcw_ref[:]).astype(dt)
                          + fcb_ref[:].astype(dt))         # (R, Vp)
                lg = logits.astype(jnp.float32)
                mrow = jnp.max(lg, axis=1, keepdims=True)
                lse = jnp.log(jnp.sum(jnp.exp(lg - mrow), axis=1,
                                      keepdims=True)) + mrow
                work = lg
                tvs, tis = [], []
                for _ in range(K):
                    v = jnp.max(work, axis=1, keepdims=True)
                    a = jnp.argmax(work, axis=1)[:, None]  # first occurrence
                    tvs.append(v)
                    tis.append(a)
                    work = jnp.where(cols_v == a, NEG, work)
                topv = jnp.concatenate(tvs, axis=1) - lse  # (R, K) logprobs
                topi = jnp.concatenate(tis, axis=1)        # (R, K) i32

                # ---- flat merge over K*K candidates per image ----
                sc_r = sc_scr[:]                           # (R, 1)
                cand = jnp.maximum(sc_r + topv, NEG)
                cand = jnp.where(sc_r <= NEG, NEG, cand)
                cand_g = rows_to_gkk(cand)                 # (G, K*K)
                ids_g = rows_to_gkk(topi.astype(jnp.float32))
                kk = jax.lax.broadcasted_iota(jnp.int32, (G, K * K), 1)
                workg = cand_g
                svs, sis, sws = [], [], []
                for _ in range(K):
                    v = jnp.max(workg, axis=1, keepdims=True)
                    a = jnp.argmax(workg, axis=1)[:, None]
                    w = jnp.sum(jnp.where(kk == a, ids_g, 0.0), axis=1,
                                keepdims=True)
                    svs.append(v)
                    sis.append(a)
                    sws.append(w)
                    workg = jnp.where(kk == a, NEG, workg)
                top_vals = jnp.concatenate(svs, axis=1)    # (G, K) f32
                flat_idx = jnp.concatenate(sis, axis=1)    # (G, K) i32
                next_word = jnp.concatenate(sws, axis=1).astype(jnp.int32)
                prev_lane = flat_idx // K

                # ---- records (selection only; replay rebuilds the rest) --
                words_ref[:, pl.ds(t - 1, 1), :] = next_word[:, None, :]
                par_ref[:, pl.ds(t - 1, 1), :] = prev_lane[:, None, :]
                vals_ref[:, pl.ds(t - 1, 1), :] = top_vals[:, None, :]

                # ---- bookkeeping (mirrors beam._apply_selection) ----
                alive = al_scr[:]                          # (G, 1)
                active_g = alive > 0
                valid = (lane < alive) & (top_vals > NEG) & active_g
                is_end = valid & (next_word == end_id)
                cont = valid & ~is_end
                n_done = jnp.sum(is_end.astype(jnp.int32), axis=1,
                                 keepdims=True)
                al_scr[:] = jnp.where(active_g, alive - n_done, alive)
                new_sc = jnp.where(cont, top_vals, NEG)    # (G, K)
                act_r = dot(img_of, active_g.astype(jnp.float32)) > 0.5
                sc_scr[:] = jnp.where(act_r, gk_to_rows(new_sc), sc_scr[:])
                pw_scr[:] = jnp.where(
                    act_r,
                    gk_to_rows(next_word.astype(jnp.float32)).astype(
                        jnp.int32),
                    pw_scr[:])

                # ---- state reorder by parent lane (block-diag one-hot
                # permutation: exact gather on the MXU) + row freeze ----
                pl_r = gk_to_rows(prev_lane.astype(jnp.float32)).astype(
                    jnp.int32)                             # (R, 1)
                tgt = (rows_r // K) * K + pl_r
                colsR = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
                perm = (colsR == tgt).astype(dt)
                h_sel = edot(perm, h_new).astype(dt)
                c_sel = edot(perm, c_new).astype(dt)
                h_scr[:] = jnp.where(act_r, h_sel, h)
                c_scr[:] = jnp.where(act_r, c_sel, c)

            return carry

        jax.lax.fori_loop(1, T + 1, step, 0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("cfg", "beam_size", "start_id", "end_id",
                              "max_steps", "img_tile", "group", "interpret"))
def beam_decode_records(params, cfg, enc_flat, tags, *, beam_size: int,
                        start_id: int, end_id: int, max_steps: int = 51,
                        img_tile: int = 0, group: int = 8, interpret=None):
    """Run the fused decode; returns selection records for decode/replay.

    enc_flat: (B, P, E) encoder output;  tags: (B, S).
    Returns {"words": (B, T, K) i32, "parents": (B, T, K) i32,
             "vals": (B, T, K) f32}.

    Requires B divisible by an image tile G with G*K a multiple of 8
    (the wrapper shrinks G to fit; B=8,16,... always works for K=5).
    """
    from ..models import attention as attn
    from ..models import decoders, scn_cell

    if cfg.model_type != "attention_scn":
        raise NotImplementedError("fused decode supports attention_scn")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    cell = params["decode_step"]
    K = beam_size
    T = max_steps
    B, P, E = enc_flat.shape
    A, D = cfg.attention_dim, cfg.decoder_dim
    Emb, F, H = cfg.embed_dim, cfg.factored_dim, cfg.decoder_dim
    V = cfg.vocab_size
    Vp = _round_up(V, 128)
    dt = enc_flat.dtype

    enc_p = pad_pixels(enc_flat)                           # (B, Pp, E)
    enc_att_p = pad_pixels(attn.precompute(params["attention"], enc_flat))
    Pp = enc_p.shape[1]

    if img_tile <= 0:
        img_tile = pick_img_tile(B, K, 16 if not interpret else 8)
        if img_tile is None:
            raise ValueError(
                f"no image tile G divides B={B} with G*{K} % 8 == 0")
    G = img_tile
    if B % G or (G * K) % 8:
        raise ValueError(f"img_tile={G} invalid for B={B}, K={K}")
    m = min(group, G)
    while G % m:
        m -= 1
    R = G * K

    sx, sh = scn_cell.semantic_projections(cell, tags)     # (B, 4, F)
    tile_k = lambda x: jnp.repeat(x, K, axis=0)            # (B, d)->(B*K, d)
    semx = tile_k(sx.reshape(B, 4 * F)).astype(dt)
    semh = tile_k(sh.reshape(B, 4 * F)).astype(dt)
    h0, c0 = decoders.init_hidden_state(params, enc_flat)  # (B, D)
    h0 = tile_k(h0).astype(dt)
    c0 = tile_k(c0).astype(dt)

    from .step_pallas import embedding_limbs
    emb_tab = embedding_limbs(
        jnp.pad(params["embedding"], ((0, Vp - V), (0, 0))), dt)
    att = params["attention"]
    wda = att["decoder_att"]["w"].astype(dt)
    bda = att["decoder_att"]["b"].reshape(1, A).astype(dt)
    wf = att["full_att"]["w"].astype(jnp.float32).reshape(1, A)
    wfb = params["f_beta"]["w"].astype(dt)
    bfb = params["f_beta"]["b"].reshape(1, E).astype(dt)
    wxe = cell["w_x"][:Emb].astype(dt)                     # (Emb, 4F)
    wxa = cell["w_x"][Emb:].astype(dt)                     # (E, 4F)
    wh = cell["w_h"].astype(dt)
    wxp = cell["w_xp"].reshape(4 * F, H).astype(dt)
    whp = cell["w_hp"].reshape(4 * F, H).astype(dt)
    bx = cell["b_x"].reshape(1, 4 * H).astype(dt)
    bh = cell["b_h"].reshape(1, 4 * H).astype(dt)
    fcw = jnp.pad(params["fc"]["w"].astype(dt), ((0, 0), (0, Vp - V)))
    fcb = jnp.pad(params["fc"]["b"].astype(jnp.float32), (0, Vp - V),
                  constant_values=NEG).reshape(1, Vp).astype(dt)

    kernel = _make_kernel(G=G, K=K, Pp=Pp, P=P, E=E, A=A, D=D, Emb=Emb,
                          F=F, H=H, Vp=Vp, T=T, m=m,
                          start_id=start_id, end_id=end_id, dt=dt,
                          L_emb=emb_tab.shape[0])

    const = lambda *shape: pl.BlockSpec(
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)
    chunk3 = lambda d1, d2: pl.BlockSpec(
        (G, d1, d2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    rows2 = lambda d: pl.BlockSpec(
        (R, d), lambda b: (b, 0), memory_space=pltpu.VMEM)

    words, parents, vals = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[
            chunk3(Pp, E), chunk3(Pp, A),
            rows2(4 * F), rows2(4 * F), rows2(D), rows2(D),
            const(*emb_tab.shape),
            const(D, A), const(1, A), const(1, A),
            const(D, E), const(1, E),
            const(Emb, 4 * F), const(E, 4 * F), const(D, 4 * F),
            const(4 * F, H), const(4 * F, H),
            const(1, 4 * H), const(1, 4 * H),
            const(D, Vp), const(1, Vp),
        ],
        out_specs=(
            pl.BlockSpec((G, T, K), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, T, K), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, T, K), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, K), jnp.int32),
            jax.ShapeDtypeStruct((B, T, K), jnp.int32),
            jax.ShapeDtypeStruct((B, T, K), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, D), dt), pltpu.VMEM((R, D), dt),
            pltpu.VMEM((R, 1), jnp.float32), pltpu.VMEM((R, 1), jnp.int32),
            pltpu.VMEM((G, 1), jnp.int32),
            pltpu.VMEM((m * Pp, m * K), dt),
            pltpu.VMEM((R, A), dt), pltpu.VMEM((R, E), dt),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(enc_p, enc_att_p, semx, semh, h0, c0, emb_tab, wda, bda, wf,
      wfb, bfb, wxe, wxa, wh, wxp, whp, bx, bh, fcw, fcb)
    return {"words": words, "parents": parents, "vals": vals}
