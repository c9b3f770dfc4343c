"""Fused SPAN decode kernel: S consecutive beam steps per window fetch.

The middle point between the two existing decode kernels:

* ``ops/step_pallas.py`` (the production default) fuses ONE beam step and
  streams each chunk's enc/enc_att windows from HBM per step — so every
  decode step pays the full ~1.09 GB (bench dims) encoder-state DMA, and
  the step can at best reach max(DMA, compute).
* ``ops/decode_pallas.py`` (the megakernel) runs ALL T steps per chunk with
  the windows VMEM-resident — near-zero DMA, but measured 4.2x slower: one
  grid iteration per chunk for the whole decode leaves Mosaic nothing to
  pipeline, and the in-kernel selection runs at tiny-chunk utilisation.

This kernel runs S consecutive steps (S static, default 4) per chunk while
STREAMING the windows like the step kernel: per decode step the encoder
DMA is divided by S, while chunks stay big enough for MXU-friendly row
blocks and the grid pipeline still overlaps chunk i+1's window DMA with
chunk i's S-step compute.  If the fused step kernel is DMA-bound (see
BASELINE.md "Where the decode ceiling actually is"), the span kernel's
per-step floor is max(DMA/S, compute).

Within a span the next word is only known in-kernel, so the kernel carries
the beam bookkeeping across its S steps exactly like the megakernel:

* embedding lookup as an exact one-hot MXU contraction against the
  VMEM-resident table (token ids < 2^24 are exact in f32);
* per-image flat top-K selection over the K*K sparse candidates with
  lax.top_k's first-occurrence tie order (argmax+mask rounds);
* score/alive/prev-word evolution mirroring decode/beam.py
  ``_apply_selection`` (retired lanes' scores pinned to NEG so dead rows
  emit only no-op records);
* the (h, c) parent reorder as a block-diagonal one-hot permutation
  matmul.

State (h, c, scores, prev words, alive counts) rides in and out of every
call; the kernel emits per-step selection records and the driver
(decode/api.py impl="fused_span") replays them through the engine's own
bookkeeping (decode/replay.py) — identical semantics to the live engine by
construction, exact at f32 (tests/test_span_fused.py).

Compute-stage math (attention grouping, f32 transcendentals, max-shifted
head with the -inf mask over padded vocab columns, both cell families)
is copied from the step kernel; reference call sites are the same as
there (models/attention.py:6-44, models/scn_cell.py:52-154,
models/decoders/attention_scn.py:217-290, pure_attention.py:228-266).
attention_scn (SCN cell) and pure_attention (torch-order LSTM) — pure_scn
has no per-step enc re-read for a span to amortise and keeps the fused
step kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention_pallas import _compiler_params, _round_up

NEG = -1e30  # matches decode/beam.py NEG_INF

_VMEM_BUDGET = 112 * 1024 * 1024


VOCAB_TILE = 4096  # head-tile width for head_mode="tiled" (lane multiple)


def _estimate_vmem(G, K, S, *, Pp, E, A, D, Emb, F4, Vp, isz, group=4,
                   win_single=False, tiled_head=False):
    """Estimated scoped-VMEM bytes for a (G, group, S) schedule: double-
    buffered windows and row inputs, constant weight + embedding blocks,
    state outputs, selection records, the f32 logits/top-k work arrays
    (+ the one-hot embedding temp), and the attention/selection scratch.

    tiled_head: the big-vocab schedule — the fc/embedding tables stay
    VMEM-resident (hoisted once per kernel call; they fit at COCO-ID
    Vp=38,784 in bf16), but the head dot runs in VOCAB_TILE column slices
    whose results land in the FULL-WIDTH (R, Vp) f32 work array, so the
    (R, Vp)-sized SSA logit generations of the resident head never
    materialise.  max/log-sum-exp/top-K then run full-width —
    bit-identical to the resident head."""
    R = G * K
    m = min(group, G)
    while G % m:
        m -= 1
    # enc + enc_att windows: Mosaic streaming double-buffers them;
    # win_single copies into one manual buffer each (half the VMEM)
    win = (1 if win_single else 2) * G * Pp * (E + A) * isz
    rows_in = 2 * (R * (2 * D + 2 * F4) * isz + R * 8)   # h/c/semx/semh+sc/pw
    state_out = 2 * (R * 2 * D * isz + R * 8 + G * 4)
    records = 2 * 3 * G * S * K * 4
    weights = (D * A + 2 * A + D * E + E + (Emb + E + D) * F4
               + 2 * F4 * D + 8 * D + D * Vp + Vp) * isz
    emb_tab = Vp * Emb * (6 if isz == 4 else 2)      # exact bf16 limb tables
    if tiled_head:
        Vt = min(VOCAB_TILE, Vp)
        # full-width work + extraction iota + one exp/spill generation
        # (Mosaic measures 126.7 MB at COCO G=8 single — calibrated),
        # plus the (R, Vt) lg/one-hot tile temps
        logits = 3 * R * Vp * 4 + 3 * R * Vt * 4 + R * Vt * 2
    else:
        logits = 3 * R * Vp * 4 + R * Vp * 2         # lg+work+spill + one-hot
    scratch = (m * Pp * m * K + R * A + R * E) * isz
    select = R * (G + R + 2 * K) * 4                 # img_of/perm/lane moves
    # f32 mode: the HIGHEST-precision parent-reorder dots materialise
    # 3-limb copies of perm (R, R) and h/c (R, D)
    limbs = (3 * 2 * (R * R + 2 * R * D)) if isz == 4 else 0
    return (win + rows_in + state_out + records + weights + emb_tab
            + logits + scratch + select + limbs)


def pick_span_tile(B: int, K: int, S: int, img_tile: int = 32, *,
                   dims=None, win_single: bool = False,
                   tiled_head: bool = False):
    """Largest image tile G <= img_tile with B % G == 0 and (G*K) % 8 == 0
    whose estimated scoped VMEM fits the chip, or None (callers fall back
    to the step engine)."""
    # the tiled-head pallas_call lifts Mosaic's scoped-VMEM limit to
    # 127 MB (the v5e has 128), so its gate gets matching headroom
    budget = (126 * 1024 * 1024) if tiled_head else _VMEM_BUDGET
    for G in range(min(img_tile, B), 0, -1):
        if B % G == 0 and (G * K) % 8 == 0:
            if dims is not None and \
                    _estimate_vmem(G, K, S, win_single=win_single,
                                   tiled_head=tiled_head,
                                   **dims) > budget:
                continue
            return G
    return None


def pick_span_plan(B: int, K: int, S: int, img_tile: int = 32, *, dims,
                   include_tiled: bool = False):
    """Resolve (G, window_mode, head_mode) for this shape, or None.

    Plans are tried best-first: streamed double-buffered windows with the
    full-width head (the measured small-vocab winner), then the
    single-buffered window copy (half the window VMEM).

    include_tiled additionally offers the tiled big-vocab head — VMEM-
    feasible up to COCO-ID V=38,732 and exact, but OFF the auto ladder:
    measured 2,411 captions/s vs fused_step's 3,012 at COCO b1024 bf16
    (2026-08-20).  At that vocab the head matmul + top-K extraction +
    one-hot embedding dominate every step, so the span's per-step window
    amortisation no longer covers its in-kernel merge overhead; the
    per-step engine reads the tables once per step for the WHOLE batch,
    which is already the optimal table traffic.  (Two other schedules
    measured worse: an HBM fc table re-DMA'd per image chunk per step,
    991 c/s; an online per-tile log-sum-exp merge, rejected — its
    per-lane reduction-order ULPs are a gratuitous divergence source
    between engines.)  See BASELINE.md."""
    plans = [(False, False), (True, False)]
    if include_tiled:
        plans += [(False, True), (True, True)]
    for win_single, tiled in plans:
        G = pick_span_tile(B, K, S, img_tile, dims=dims,
                           win_single=win_single, tiled_head=tiled)
        if G is not None:
            return (G, "single" if win_single else "stream",
                    "tiled" if tiled else "resident")
    return None


def _make_kernel(*, names, G, K, S, Pp, P, E, A, D, Emb, F, H, Vp, V,
                 m, R, dt, end_id, cell="scn", L_emb=1, win_single=False,
                 tiled_head=False, ablate=None):
    """Span kernel body.  names: ordered ref names matching the
    pallas_call layout in :func:`fused_decode_span`.
    cell: "scn" (factored semantic gates, order i,f,o,c — scn_cell.py) or
    "lstm" (torch nn.LSTMCell, order i,f,g,o — lstm_cell.py).
    tiled_head: big-vocab schedule — the resident fc table is consumed in
    VOCAB_TILE column slices into the full-width (R, Vp) f32 work array,
    and the embedding one-hot is tiled over the resident limb tables.
    Every logit value, the max/log-sum-exp reductions (full-width, same
    shapes) and the top-K extraction are BIT-IDENTICAL to the resident
    head — an earlier online-merge variant accumulated log-sum-exp per
    tile, whose per-lane reduction-order ULPs are a gratuitous extra
    divergence source between engines under bf16 near-ties."""
    if ablate not in (None, "noextract", "nomerge", "norecords", "nobook",
                      "noreorder"):
        # a typoed probe token must not silently measure the un-ablated
        # kernel and report it as an ablation result
        raise ValueError(f"unknown span ablate token {ablate!r}")

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def xdot(a, b):
        # EXACT one-hot contraction.  The TPU's default f32 matmul
        # precision is a single bf16 pass, which bf16-ROUNDS the payload:
        # vocab ids >= 256 come back as the nearest bf16 integer and
        # carried f32 beam scores lose 16 mantissa bits (found on-chip:
        # compiled decodes scored +13 vs the engine while all CPU tests
        # passed, tools/exp_span_scores.py).  HIGHEST splits each f32
        # into 3 bf16 limbs, so value*1.0 + zeros is bit-exact; these
        # matmuls are (R,G)/(G,R)/(R,R)-sized — negligible next to the
        # head/cell compute, which keeps the serving-precision default.
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

    def sig(x):  # f32 transcendentals: Mosaic bf16 logistic bug workaround
        return jax.nn.sigmoid(x.astype(jnp.float32)).astype(dt)

    def tnh(x):
        return jnp.tanh(x.astype(jnp.float32)).astype(dt)

    def kernel(*refs):
        r = dict(zip(names, refs))
        h = r["h_in"][:]
        c = r["c_in"][:]
        sc = r["sc_in"][:]                                 # (R, 1) f32
        pw = r["pw_in"][:]                                 # (R, 1) i32
        alive = r["alive_in"][:]                           # (G, 1) i32
        wf = r["wf"][:].astype(dt)
        bd_scr, dec_scr, awe_scr = r["bd"], r["dec"], r["awe"]

        rows_r = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        Vt = min(VOCAB_TILE, Vp) if tiled_head else Vp
        cols_v = jax.lax.broadcasted_iota(jnp.int32, (R, Vp), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (G, K), 1)
        kk = jax.lax.broadcasted_iota(jnp.int32, (G, K * K), 1)
        # Layout-move one-hots (ops/decode_pallas.py module docstring):
        img_of = (jax.lax.broadcasted_iota(jnp.int32, (R, G), 1)
                  == rows_r // K).astype(jnp.float32)
        lane_of = (jax.lax.broadcasted_iota(jnp.int32, (R, K), 1)
                   == rows_r % K).astype(jnp.float32)
        colsR_g = jax.lax.broadcasted_iota(jnp.int32, (G, R), 1)
        rowsG = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
        sel = [(colsR_g == rowsG * K + k).astype(jnp.float32)
               for k in range(K)]
        colsR = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)

        def gk_to_rows(M):
            """(G, K) f32 -> (R, 1): value of the row's (image, lane)."""
            per_row = xdot(img_of, M)                      # (R, K)
            return jnp.sum(per_row * lane_of, axis=1, keepdims=True)

        def rows_to_gkk(M):
            """(R, k) f32 -> (G, K*k): lane-major flatten per image."""
            return jnp.concatenate([xdot(s, M) for s in sel], axis=1)

        # one-hot selection of dt-valued rows (parent reorder) is exact at
        # the bf16 default when dt is bf16 (x*1.0 of a bf16 value), but
        # needs the exact path when dt is f32
        edot = xdot if dt == jnp.float32 else dot

        if win_single:
            # SINGLE-buffered manual window DMA: enc/ea stay in HBM
            # (memory_space=ANY) and the kernel copies chunk i's windows
            # into ONE VMEM buffer each — half the window VMEM of
            # Mosaic's double-buffered streaming, which is what lets
            # G=32 tiles fit.  The copy is NOT overlapped with compute,
            # but the span kernel's window DMA is already amortised over
            # S steps (~0.06 ms vs ~1.8 ms compute per chunk at G=32).
            i = pl.program_id(0)
            enc_buf, ea_buf, sem = r["enc_buf"], r["ea_buf"], r["sem"]
            copies = (
                pltpu.make_async_copy(r["enc"].at[pl.ds(i * G, G)],
                                      enc_buf, sem.at[0]),
                pltpu.make_async_copy(r["ea"].at[pl.ds(i * G, G)],
                                      ea_buf, sem.at[1]),
            )
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()

            def ea_at(g):
                return ea_buf[g]

            def enc_group(base, mm):
                return enc_buf[pl.ds(base, mm)]
        else:
            def ea_at(g):
                return r["ea"][g]

            def enc_group(base, mm):
                return r["enc"][pl.ds(base, mm)]

        for s in range(S):
            # ---- embedding lookup (one-hot MXU contraction against the
            # exact bf16 limb tables; see step_pallas.embedding_limbs) ----
            if tiled_head:
                # tile the one-hot over vocab slices of the resident
                # table: each row's id lands in exactly one slice, every
                # other slice contributes an exact 0.0 — bit-identical to
                # the full-width contraction, without the (R, Vp) one-hot
                emb_f = jnp.zeros((R, Emb), jnp.float32)
                for base in range(0, Vp, Vt):
                    w = min(Vt, Vp - base)
                    cols_t = base + jax.lax.broadcasted_iota(
                        jnp.int32, (R, w), 1)
                    oh_t = (cols_t == pw).astype(jnp.bfloat16)
                    for li in range(L_emb):
                        emb_f = emb_f + dot(
                            oh_t, r["emb_tab"][li, base:base + w, :])
            else:
                oh = (cols_v == pw).astype(jnp.bfloat16)
                emb_f = dot(oh, r["emb_tab"][0])
                for li in range(1, L_emb):
                    emb_f = emb_f + dot(oh, r["emb_tab"][li])
            emb = emb_f.astype(dt)                         # (R, Emb)

            # ---- attention (step-kernel schedule) ----
            dec_scr[:] = (dot(h, r["wda"][:]).astype(dt)
                          + r["bda"][:].astype(dt))        # (R, A)
            for base in range(0, G, m):
                bd_scr[:] = jnp.zeros_like(bd_scr)
                for j in range(m):
                    g = base + j
                    ea = ea_at(g)                          # (Pp, A)
                    dk = dec_scr[g * K:(g + 1) * K, :]
                    cols = []
                    for k in range(K):
                        e = jnp.maximum(ea + dk[k:k + 1, :], 0)
                        cols.append(jnp.sum(e * wf, axis=1, keepdims=True))
                    att = jnp.concatenate(cols, axis=1).astype(jnp.float32)
                    if P < Pp:
                        prow = jax.lax.broadcasted_iota(jnp.int32, (Pp, K), 0)
                        att = jnp.where(prow < P, att, float("-inf"))
                    mx = jnp.max(att, axis=0, keepdims=True)
                    ex = jnp.exp(att - mx)
                    ssum = jnp.sum(ex, axis=0, keepdims=True)
                    alpha = ex / ssum                      # (Pp, K) f32
                    bd_scr[j * Pp:(j + 1) * Pp, j * K:(j + 1) * K] = \
                        alpha.astype(bd_scr.dtype)
                enc_grp = enc_group(base, m).reshape(m * Pp, E)
                awe_scr[base * K:(base + m) * K, :] = jax.lax.dot_general(
                    bd_scr[:], enc_grp, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dt)
            gate = sig(dot(h, r["wfb"][:]).astype(dt)
                       + r["bfb"][:].astype(dt))
            awe = gate * awe_scr[:]                        # (R, E)

            if cell == "scn":
                # ---- SCN recurrence (models/scn_cell.scn_step) ----
                xfac = (dot(emb, r["wxe"][:]).astype(dt)
                        + dot(awe, r["wxa"][:]).astype(dt)) * r["semx"][:]
                hfac = dot(h, r["wh"][:]).astype(dt) * r["semh"][:]
                pre = []
                for g4 in range(4):
                    sl = slice(g4 * F, (g4 + 1) * F)
                    slh = slice(g4 * H, (g4 + 1) * H)
                    xg = dot(xfac[:, sl], r["wxp"][sl, :]) \
                        + r["bx"][:, slh].astype(jnp.float32)
                    hg = dot(hfac[:, sl], r["whp"][sl, :]) \
                        + r["bh"][:, slh].astype(jnp.float32)
                    pre.append((xg + hg).astype(dt))       # (R, H)
                i_g = sig(pre[0])
                f_g = sig(pre[1])
                o_g = sig(pre[2])
                c_t = tnh(pre[3])
            else:
                # ---- LSTM recurrence (models/lstm_cell.lstm_step, torch
                # gate order i, f, g, o; same concat-matmul association
                # as the step kernel so f32 is bit-exact with it) ----
                xcat = jnp.concatenate([emb, awe], axis=1)
                pre_f = (dot(xcat, r["wih"][:])
                         + r["bx"][:].astype(jnp.float32)
                         + dot(h, r["wh"][:])
                         + r["bh"][:].astype(jnp.float32))  # (R, 4H) f32
                pre = [pre_f[:, g4 * H:(g4 + 1) * H].astype(dt)
                       for g4 in range(4)]
                i_g = sig(pre[0])
                f_g = sig(pre[1])
                c_t = tnh(pre[2])
                o_g = sig(pre[3])
            c_new = f_g * c + i_g * c_t
            h_new = o_g * tnh(c_new)

            # ---- vocab head + per-lane top-K (f32 logprobs) ----
            work_scr = r["work"]                           # (R, Vp) f32
            if tiled_head:
                # Big-vocab schedule: the resident fc table is consumed in
                # (D, Vt) column slices whose logit tiles land straight in
                # the full-width work array — the (R, Vp) f32 SSA logit
                # generations of the resident head (3 live copies at once,
                # ~19 MB each at COCO) never materialise, which is what
                # lets the table itself stay VMEM-resident (hoisted ONCE
                # per kernel call; an HBM+DMA variant re-streamed the
                # 40 MB table per image chunk per step and lost 3x).
                # Each slice contracts the full D per column, so every
                # logit is bit-identical to the resident single-dot head.
                for base in range(0, Vp, Vt):
                    w = min(Vt, Vp - base)
                    lg_t = (dot(h_new, r["fcw"][:, base:base + w])
                            .astype(dt)
                            + r["fcb"][:, base:base + w].astype(dt)
                            ).astype(jnp.float32)
                    if V < base + w:
                        cols_w = jax.lax.broadcasted_iota(
                            jnp.int32, (R, w), 1)
                        lg_t = jnp.where(base + cols_w < V, lg_t,
                                         float("-inf"))
                    work_scr[:, base:base + w] = lg_t
                # full-width max / shift / log-sum-exp / extraction: the
                # same shapes and reduction trees as the resident head
                # (an online per-tile log-sum-exp is NOT equivalent: logs
                # is per-lane, and its reduction-order ULPs would flip
                # cross-lane beam near-ties at bf16)
                mrow = jnp.max(work_scr[:], axis=1, keepdims=True)
                work_scr[:] = work_scr[:] - mrow
            else:
                logits = (dot(h_new, r["fcw"][:]).astype(dt)
                          + r["fcb"][:].astype(dt))        # (R, Vp)
                # Work array lives in an explicit scratch ref (in-place
                # masking rounds) instead of loop-carried SSA values so the
                # compiler doesn't keep two (R, Vp) f32 generations live at
                # once — the VMEM saving is what lets larger image tiles
                # fit.
                lg = logits.astype(jnp.float32)
                if V < Vp:
                    lg = jnp.where(cols_v < V, lg, float("-inf"))
                mrow = jnp.max(lg, axis=1, keepdims=True)
                work_scr[:] = lg - mrow
            logs = jnp.log(jnp.sum(jnp.exp(work_scr[:]), axis=1,
                                   keepdims=True))
            if ablate == "noextract":
                # probe: ONE max round instead of the 5 max/argmax/mask
                # rounds (values wrong; exp_topk_floor's in-situ twin)
                topv = jnp.broadcast_to(
                    jnp.max(work_scr[:], axis=1, keepdims=True),
                    (R, K)) - logs
                topi = jax.lax.broadcasted_iota(jnp.int32, (R, K), 1)
            else:
                tvs, tis = [], []
                for _ in range(K):
                    v = jnp.max(work_scr[:], axis=1, keepdims=True)
                    a = jnp.argmax(work_scr[:], axis=1)[:, None]  # 1st occ
                    tvs.append(v)
                    tis.append(a)
                    work_scr[:] = jnp.where(cols_v == a, NEG, work_scr[:])
                topv = jnp.concatenate(tvs, axis=1) - logs  # (R, K) logpr
                topi = jnp.concatenate(tis, axis=1)         # (R, K) i32

            # ---- flat merge over K*K candidates per image (engine
            # candidate math: beam.py sparse-head branch) ----
            cand = jnp.maximum(sc + topv, NEG)
            cand = jnp.where(sc <= NEG, NEG, cand)
            cand_g = rows_to_gkk(cand)                     # (G, K*K)
            ids_g = rows_to_gkk(topi.astype(jnp.float32))
            if ablate == "nomerge":
                # probe: one max round instead of the K-round K*K merge
                top_vals = jnp.broadcast_to(
                    jnp.max(cand_g, axis=1, keepdims=True), (G, K))
                flat_idx = jax.lax.broadcasted_iota(jnp.int32, (G, K), 1)
                next_word = jnp.broadcast_to(
                    jnp.max(ids_g, axis=1, keepdims=True),
                    (G, K)).astype(jnp.int32)
            else:
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

            # ---- records (replay rebuilds sequences/pools from these) ----
            if ablate != "norecords" or s == S - 1:
                r["words"][:, s:s + 1, :] = next_word[:, None, :]
                r["parents"][:, s:s + 1, :] = prev_lane[:, None, :]
                r["vals"][:, s:s + 1, :] = top_vals[:, None, :]

            # ---- bookkeeping (mirrors beam._apply_selection; dead images
            # need no masking: their lanes' scores are already NEG, so
            # their candidates stay NEG and replay treats them as no-ops,
            # while `lane < alive` keeps retired lanes of LIVE images from
            # being counted again) ----
            if ablate == "nobook":
                # probe: skip the retire/alive masks and the two one-hot
                # (G,K)->(R,1) layout moves (sc/pw go stale)
                pass
            else:
                valid = (lane < alive) & (top_vals > NEG)
                is_end = valid & (next_word == end_id)
                cont = valid & ~is_end
                alive = alive - jnp.sum(is_end.astype(jnp.int32), axis=1,
                                        keepdims=True)
                sc = gk_to_rows(jnp.where(cont, top_vals, NEG))
                pw = gk_to_rows(next_word.astype(jnp.float32)) \
                    .astype(jnp.int32)

            # ---- (h, c) parent reorder: block-diag one-hot permutation ----
            if ablate == "noreorder":
                h = h_new
                c = c_new
            else:
                pl_r = gk_to_rows(prev_lane.astype(jnp.float32)) \
                    .astype(jnp.int32)
                tgt = (rows_r // K) * K + pl_r
                perm = (colsR == tgt).astype(dt)
                h = edot(perm, h_new).astype(dt)
                c = edot(perm, c_new).astype(dt)

        r["h_out"][:] = h
        r["c_out"][:] = c
        r["sc_out"][:] = sc
        r["pw_out"][:] = pw
        r["alive_out"][:] = alive

    return kernel


@functools.partial(
    jax.jit, static_argnames=("span", "num_pixels", "end_id", "img_tile",
                              "group", "interpret", "vocab_size", "cell",
                              "window_mode", "head_mode", "ablate"))
def fused_decode_span(weights, emb_tab, enc_p, enc_att_p, semx, semh,
                      h, c, sc, pw, alive, *, span: int, num_pixels: int,
                      end_id: int, img_tile: int = 32, group: int = 4,
                      interpret=None, vocab_size=None, cell: str = "scn",
                      window_mode: str = "auto", head_mode: str = "auto",
                      ablate=None):
    """Run ``span`` consecutive beam steps over (B, K) lanes.

    weights: dict from ops/step_pallas.pack_step_weights (attention_scn
    with cell="scn", pure_attention with cell="lstm" — semx/semh None);
    emb_tab: (Vp, Emb) vocab-padded embedding table.
    enc_p/enc_att_p: (B, Pp, E|A) pre-padded loop invariants.
    h/c: (B*K, D); sc: (B*K, 1) f32 cumulative scores (NEG on dead lanes);
    pw: (B*K, 1) i32 previous words; alive: (B, 1) i32 live-lane counts.
    window_mode: "auto" (pick_span_plan), "stream" (Mosaic double-buffered
    window pipeline) or "single" (manual single-buffered DMA — half the
    window VMEM, so bigger image tiles fit; bit-identical compute body).
    head_mode: "auto" (pick_span_plan), "resident" (one full-width head
    dot) or "tiled" (big-vocab/COCO-ID schedule: the resident fc table
    consumed in VOCAB_TILE column slices into the full-width work array —
    bit-identical logits, reductions and tie order, without the resident
    head's full-width SSA logit generations).
    Returns (words, parents (B, span, K) i32, vals (B, span, K) f32,
    h', c', sc', pw', alive').
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, Pp, E = enc_p.shape
    A = enc_att_p.shape[-1]
    R_total, D = h.shape
    K = R_total // B
    Emb = emb_tab.shape[-1]
    F4 = semx.shape[-1] if semx is not None else 4 * D
    F = F4 // 4
    H = D
    Vp = weights["fcw"].shape[-1]
    V = vocab_size if vocab_size is not None else Vp
    dt = h.dtype
    S = span

    dims = dict(Pp=Pp, E=E, A=A, D=D, Emb=Emb, F4=F4, Vp=Vp,
                isz=jnp.dtype(dt).itemsize, group=group)
    if window_mode == "auto" or head_mode == "auto":
        plan = pick_span_plan(B, K, S, img_tile, dims=dims,
                              include_tiled=head_mode == "tiled")
        if plan is None:
            raise ValueError(f"no VMEM-feasible span plan divides B={B} "
                             f"with G*{K}%8==0")
        _, plan_win, plan_head = plan
        if window_mode == "auto":
            window_mode = plan_win
        if head_mode == "auto":
            head_mode = plan_head
    win_single = window_mode == "single"
    tiled_head = head_mode == "tiled"
    G = pick_span_tile(B, K, S, img_tile, dims=dims,
                       win_single=win_single, tiled_head=tiled_head)
    if G is None:
        raise ValueError(f"no VMEM-feasible span tile G divides B={B} "
                         f"with G*{K}%8==0")
    m = min(group, G)
    while G % m:
        m -= 1
    R = G * K

    const = lambda *shape: pl.BlockSpec(
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)
    chunk3 = lambda d1, d2: pl.BlockSpec(
        (G, d1, d2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    rows2 = lambda d: pl.BlockSpec(
        (R, d), lambda b: (b, 0), memory_space=pltpu.VMEM)
    imgs2 = pl.BlockSpec((G, 1), lambda b: (b, 0), memory_space=pltpu.VMEM)
    rec3 = pl.BlockSpec((G, S, K), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)

    from .step_pallas import _weight_names, embedding_limbs

    emb_limbs = embedding_limbs(emb_tab, dt)       # (L, Vp, Emb) bf16 exact
    L_emb = emb_limbs.shape[0]

    in_names = ["enc", "ea"]
    if win_single:
        in_specs = [pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY)]
    else:
        in_specs = [chunk3(Pp, E), chunk3(Pp, A)]
    inputs = [enc_p, enc_att_p]
    if cell == "scn":
        in_names += ["semx", "semh"]
        in_specs += [rows2(F4), rows2(F4)]
        inputs += [semx, semh]
    in_names += ["h_in", "c_in", "sc_in", "pw_in", "alive_in", "emb_tab"]
    in_specs += [rows2(D), rows2(D), rows2(1), rows2(1), imgs2,
                 const(*emb_limbs.shape)]
    inputs += [h, c, sc, pw, alive, emb_limbs]
    for nm in _weight_names(cell=cell, attention=True):
        arr = weights[nm]
        in_names.append(nm)
        in_specs.append(const(*arr.shape))
        inputs.append(arr)

    out_names = ["words", "parents", "vals", "h_out", "c_out", "sc_out",
                 "pw_out", "alive_out"]
    Vt = min(VOCAB_TILE, Vp)
    scratch_names = ["bd", "dec", "awe", "work"]
    scratch_shapes = [pltpu.VMEM((m * Pp, m * K), dt),
                      pltpu.VMEM((R, A), dt), pltpu.VMEM((R, E), dt),
                      pltpu.VMEM((R, Vp), jnp.float32)]
    if win_single:
        scratch_names += ["enc_buf", "ea_buf", "sem"]
        scratch_shapes += [pltpu.VMEM((G, Pp, E), dt),
                           pltpu.VMEM((G, Pp, A), dt),
                           pltpu.SemaphoreType.DMA((2,))]
    kernel = _make_kernel(
        ablate=ablate,
        names=tuple(in_names + out_names + scratch_names),
        G=G, K=K, S=S, Pp=Pp, P=num_pixels, E=E, A=A, D=D, Emb=Emb,
        F=F, H=H, Vp=Vp, V=V, m=m, R=R, dt=dt, end_id=end_id, cell=cell,
        L_emb=L_emb, win_single=win_single, tiled_head=tiled_head)

    outs = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=(rec3, rec3, rec3, rows2(D), rows2(D), rows2(1),
                   rows2(1), imgs2),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, K), jnp.int32),
            jax.ShapeDtypeStruct((B, S, K), jnp.int32),
            jax.ShapeDtypeStruct((B, S, K), jnp.float32),
            jax.ShapeDtypeStruct((R_total, D), dt),
            jax.ShapeDtypeStruct((R_total, D), dt),
            jax.ShapeDtypeStruct((R_total, 1), jnp.float32),
            jax.ShapeDtypeStruct((R_total, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=None if interpret else (
            # big-vocab schedule: both tables resident (~79 MB) + the
            # full-width work array exceed Mosaic's default 114 MB scoped
            # budget; the v5e has 128 MB of VMEM, so lift the limit to
            # what the tiled head measures on-chip (126.7 MB at G=8)
            pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                                 vmem_limit_bytes=127 * 1024 * 1024)
            if tiled_head else _compiler_params()),
    )(*inputs)
    return outs


@functools.partial(
    jax.jit, static_argnames=("cfg", "beam_size", "start_id", "end_id",
                              "max_steps", "span", "img_tile", "group",
                              "interpret", "window_mode", "head_mode"))
def beam_decode_span_records(params, cfg, enc_flat, tags, *,
                             beam_size: int, start_id: int, end_id: int,
                             max_steps: int = 51, span: int = 4,
                             img_tile: int = 32, group: int = 4,
                             interpret=None, window_mode: str = "auto",
                             head_mode: str = "auto"):
    """Drive the span kernel over ceil(T/span) calls with early exit.

    Returns {"words"/"parents": (B, T, K) i32, "vals": (B, T, K) f32} for
    decode/replay.py — records beyond the early-exit point are inert
    (vals=NEG) and replay treats them as no-ops.
    """
    from ..models import attention as attn
    from ..models import decoders, scn_cell
    from .attention_pallas import pad_pixels
    from .step_pallas import pack_step_weights

    if cfg.model_type not in ("attention_scn", "pure_attention"):
        raise NotImplementedError(
            "fused_span needs an attention stage to amortise "
            f"(got {cfg.model_type})")
    cell = "scn" if cfg.model_type == "attention_scn" else "lstm"

    K, T, S = beam_size, max_steps, span
    B, P, E = enc_flat.shape
    F4 = 4 * cfg.factored_dim
    V, Vp = cfg.vocab_size, _round_up(cfg.vocab_size, 128)
    dt = enc_flat.dtype
    n_spans = -(-T // S)

    enc_p = pad_pixels(enc_flat)
    ea_p = pad_pixels(attn.precompute(params["attention"], enc_flat))
    weights = pack_step_weights(params, cfg, dt)
    emb_tab = jnp.pad(params["embedding"].astype(dt),
                      ((0, Vp - V), (0, 0)))
    tile_k = lambda x: jnp.repeat(x, K, axis=0)
    if cell == "scn":
        sx, sh = scn_cell.semantic_projections(params["decode_step"], tags)
        semx = tile_k(sx.reshape(B, F4)).astype(dt)
        semh = tile_k(sh.reshape(B, F4)).astype(dt)
    else:
        semx = semh = None
    h0, c0 = decoders.init_hidden_state(params, enc_flat)
    R = B * K

    # beam.init_carry state: lane 0 holds <start>, other lanes dead
    rows_r = jnp.arange(R)[:, None]
    carry = dict(
        i=jnp.asarray(0, jnp.int32),
        h=tile_k(h0).astype(dt), c=tile_k(c0).astype(dt),
        sc=jnp.where(rows_r % K == 0, 0.0, NEG).astype(jnp.float32),
        pw=jnp.full((R, 1), start_id, jnp.int32),
        alive=jnp.full((B, 1), K, jnp.int32),
        words=jnp.zeros((B, n_spans * S, K), jnp.int32),
        parents=jnp.zeros((B, n_spans * S, K), jnp.int32),
        vals=jnp.full((B, n_spans * S, K), NEG, jnp.float32),
    )

    def cond(c):
        return jnp.logical_and(c["i"] < n_spans, jnp.any(c["alive"] > 0))

    def body(c):
        w, p, v, h, cc, sc, pw, alive = fused_decode_span(
            weights, emb_tab, enc_p, ea_p, semx, semh,
            c["h"], c["c"], c["sc"], c["pw"], c["alive"],
            span=S, num_pixels=P, end_id=end_id, img_tile=img_tile,
            group=group, interpret=interpret, vocab_size=V, cell=cell,
            window_mode=window_mode, head_mode=head_mode)
        at = (jnp.zeros((), jnp.int32), c["i"] * S, jnp.zeros((), jnp.int32))
        return dict(
            i=c["i"] + 1, h=h, c=cc, sc=sc, pw=pw, alive=alive,
            words=jax.lax.dynamic_update_slice(c["words"], w, at),
            parents=jax.lax.dynamic_update_slice(c["parents"], p, at),
            vals=jax.lax.dynamic_update_slice(c["vals"], v, at),
        )

    out = jax.lax.while_loop(cond, body, carry)
    return {"words": out["words"][:, :T], "parents": out["parents"][:, :T],
            "vals": out["vals"][:, :T]}
