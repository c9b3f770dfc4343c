"""Chunked (fused) vocab cross-entropy head: CE + top-k without ever
materializing the (B, T, V) logit tensor.

Why this exists (VERDICT r4 "weak" #1): the dense head computes
``logits = h @ fc_w + fc_b`` for the whole batch and then pays for the
(B, T, V) tensor several times — the log_softmax re-reads it twice and
writes a full (B, T, V) f32 log-prob tensor, and the top-5 metric reads it
three more times (core/metrics.topk_hit).  At flagship dims
(B=1024, T=51, V=6763) that is ~8-10 GB of HBM traffic for a head whose
matmul is worth ~2 ms; at COCO vocab (V=38,732) the bf16 logits alone are
4.1 GB and training OOMs at b1024 on a 16 GiB chip.

The chunked head streams ``fc`` in vocab tiles through an online
logsumexp accumulator (the standard large-vocab fused-CE technique — same
shape as flash attention's streaming softmax):

  forward   per tile c: logits_c = h2 @ w[:, c] + b[c]    (MXU, f32 accum)
            m, s   <- online max / scaled exp-sum          (logsumexp)
            gt, tie <- rank counts of the target logit      (top-k metric)
  backward  per tile c: recompute logits_c, p = exp(logits_c - lse),
            dl = (p - onehot) * mask * g / n_tokens,
            d_h += dl @ w[:, c]^T;  d_w[:, c] = h2^T @ dl;  d_b[c] = Σ dl

Only the (N, tile) work tile is ever live; HBM traffic drops to roughly
the matmul operands.  Numerics mirror the dense path: the tile logits are
rounded to the compute dtype (bf16 under mixed precision — exactly what
``linear`` produced) before the f32 reductions, so CE matches dense to
float-reassociation (tests/test_vocab_head.py pins <=2e-3 rel on values
AND gradients, f32 and bf16).

The target logit is extracted IN-TILE with a onehot-multiply reduction
(``(logits * (col == target)).sum``) — bitwise the tile value, so CE and
the rank counts are self-consistent and the counts reproduce
core/metrics.topk_hit exactly.  (A fc row/column gather here measured
43-69 ms for 3k rows on this backend — TPU gathers of matrix slices
lower catastrophically; the masked reduce is ~free on the tile the MXU
just produced.)  The counts need the FINAL target logit, so they run as
a second tile sweep — one extra head-matmul of FLOPs, still far below
the dense path's log-prob materialisation traffic.

Reference anchor: the CE + top-5 accuracy of the reference train loop,
/root/reference/trains/attention_scn.py:219-235 and :255 — semantics are
identical (mean over valid tokens); only the evaluation order changes.

``shard_axis`` (Phase-C TP): inside a ``shard_map`` block whose vocab
dimension is sharded over a mesh axis, pass that axis name — each shard
scans its local columns with its global column offset and the partial
(max, scaled-sum, counts, target-logit) accumulators are merged with
pmax/psum, which is the Megatron-style vocab-parallel CE.  The sharded
(B, T, V/m) logits never exist either.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _num_tiles(v: int, tile: int) -> int:
    return -(-v // tile)


def _pad_cols(w, b, tile: int):
    """Pad fc to a tile multiple (zeros; padded columns are masked to
    NEG_INF before any reduction and produce exactly-zero gradients)."""
    V = w.shape[1]
    Vp = _num_tiles(V, tile) * tile
    if Vp == V:
        return w, b
    return (jnp.pad(w, ((0, 0), (0, Vp - V))),
            jnp.pad(b, ((0, Vp - V),)))


def _dot_f32(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _tile_logits(h2, wp, bp, i, tile: int, V: int, col0: int, cdt):
    """One (N, tile) logit tile, rounded to the compute dtype then lifted
    to f32 (mirrors dense ``linear`` + f32 cast), invalid columns NEG_INF.

    col0 is the shard's global column offset (0 without TP); V is the
    shard's LOCAL valid width.  Returns (logits_f32, global_col_idx)."""
    w_t = jax.lax.dynamic_slice(wp, (0, i * tile), (wp.shape[0], tile))
    b_t = jax.lax.dynamic_slice(bp, (i * tile,), (tile,))
    logits = _dot_f32(h2, w_t, ((1,), (0,))) + b_t.astype(jnp.float32)
    logits = logits.astype(cdt).astype(jnp.float32)
    local_col = i * tile + jax.lax.iota(jnp.int32, tile)
    valid = local_col < V
    logits = jnp.where(valid[None, :], logits, NEG_INF)
    # CAUTION: padded columns' GLOBAL indices (col0 + local) alias the
    # next shard's real columns under TP — every target match must be
    # guarded with `valid`, not just the column index.
    return logits, col0 + local_col, valid, w_t


def _lse_scan(h2, wp, bp, tgt_ids_global, *, tile: int, V: int, col0, cdt):
    """Online pass 1 over vocab tiles: running (m, s) logsumexp state plus
    the target logit, extracted IN-TILE with a onehot-multiply VPU
    reduction — a row/column gather of fc here measured 43-69 ms for 3k
    rows on this backend (gathers lower catastrophically), while the
    masked reduce rides the tile that the MXU just produced.  The
    extracted value is bitwise THE tile logit, so the CE and the pass-2
    rank counts are self-consistent by construction."""
    N = h2.shape[0]
    nt = wp.shape[1] // tile

    def body(i, carry):
        m, s, tgt = carry
        logits, col, valid, _ = _tile_logits(h2, wp, bp, i, tile, V, col0,
                                             cdt)
        tmax = logits.max(axis=-1)
        new_m = jnp.maximum(m, tmax)
        s = s * jnp.exp(m - new_m) + jnp.exp(
            logits - new_m[:, None]).sum(axis=-1)
        is_t = (col[None, :] == tgt_ids_global[:, None]) & valid[None, :]
        tgt = tgt + jnp.where(is_t, logits, 0.0).sum(axis=-1)
        return new_m, s, tgt

    init = (jnp.full((N,), NEG_INF, jnp.float32),
            jnp.zeros((N,), jnp.float32),
            jnp.zeros((N,), jnp.float32))
    return jax.lax.fori_loop(0, nt, body, init)


def _count_scan(h2, wp, bp, tgt_ids_global, tgt_logit, *, tile: int,
                V: int, col0, cdt):
    """Pass 2: top-k rank counts of the target logit — strictly-greater
    plus equal-at-lower-global-index (exactly lax.top_k's first-occurrence
    tie order, mirroring core/metrics.topk_hit).  Needs the final target
    logit, hence a second tile sweep (one extra head-matmul of FLOPs —
    cheaper than any gather on this backend, see _lse_scan)."""
    N = h2.shape[0]
    nt = wp.shape[1] // tile

    def body(i, carry):
        gt, tie = carry
        logits, col, valid, _ = _tile_logits(h2, wp, bp, i, tile, V, col0,
                                             cdt)
        t = tgt_ids_global[:, None]
        tl = tgt_logit[:, None]
        gt = gt + (logits > tl).sum(axis=-1)
        tie = tie + ((logits == tl) & (col[None, :] < t)
                     & valid[None, :]).sum(-1)
        return gt, tie

    init = (jnp.zeros((N,), jnp.int32), jnp.zeros((N,), jnp.int32))
    return jax.lax.fori_loop(0, nt, body, init)


def nll_topk_fwd_block(w, b, h2, tgt_ids, col0, *, k: int, tile: int,
                       shard_axis: str | None = None):
    """Forward internals on (possibly per-shard) operands: returns
    (nll (N,), hit (N,) f32, lse (N,)).  Under TP, call inside shard_map
    with shard_axis = the vocab ("model") axis; the target-logit /
    logsumexp / rank-count partials merge with pmax/psum here."""
    cdt = h2.dtype
    V = w.shape[1]                       # local (per-shard) padded-free width
    wp, bp = _pad_cols(w, b, tile)
    m, s, tgt_logit = _lse_scan(h2, wp, bp, tgt_ids,
                                tile=tile, V=V, col0=col0, cdt=cdt)
    if shard_axis is not None:
        # each row's target lives in exactly one vocab shard; the others
        # contributed 0 — the psum assembles the global target logit
        tgt_logit = jax.lax.psum(tgt_logit, shard_axis)
        m_g = jax.lax.pmax(m, shard_axis)
        s = jax.lax.psum(s * jnp.exp(m - m_g), shard_axis)
        m = m_g
    gt, tie = _count_scan(h2, wp, bp, tgt_ids, tgt_logit,
                          tile=tile, V=V, col0=col0, cdt=cdt)
    if shard_axis is not None:
        gt = jax.lax.psum(gt, shard_axis)
        tie = jax.lax.psum(tie, shard_axis)
    lse = m + jnp.log(s)
    nll = lse - tgt_logit
    hit = ((gt + tie) < k).astype(jnp.float32)
    return nll, hit, lse


def nll_bwd_block(w, b, h2, tgt_ids, lse, coeff, col0, *, tile: int,
                  shard_axis: str | None = None,
                  batch_axis: str | None = None):
    """Backward internals: returns (d_w (D, V_local), d_b (V_local,),
    d_h (N, D)) with ALL cross-shard reductions explicit — d_h psums
    over the vocab shard_axis (every shard's columns contribute to every
    row's hidden gradient), d_w/d_b psum over batch_axis (the fc shard
    is replicated across the data axis, so its gradient sums each data
    shard's rows).  Explicit because shard_map's automatic transpose of
    replicated inputs is only correct with replication checking ON,
    which the fori_loop carries here do not annotate; the TP island
    therefore routes custom_vjp AROUND shard_map and calls this block
    directly (train/steps.make_chunked_head_island)."""
    cdt = h2.dtype
    V = w.shape[1]
    wp, bp = _pad_cols(w, b, tile)
    nt = wp.shape[1] // tile
    N, D = h2.shape
    coeff = coeff.astype(jnp.float32)    # (N,)

    def body(i, carry):
        d_h, d_w, d_b = carry
        logits, col, valid, w_t = _tile_logits(h2, wp, bp, i, tile, V,
                                               col0, cdt)
        p = jnp.exp(logits - lse[:, None])          # padded cols -> 0
        is_t = ((col[None, :] == tgt_ids[:, None])
                & valid[None, :]).astype(jnp.float32)
        dl = (p - is_t) * coeff[:, None]            # (N, tile) f32
        dlc = dl.astype(cdt)                        # mirror dense bwd dtype
        d_h = d_h + _dot_f32(dlc, w_t, ((1,), (1,)))
        d_w_t = _dot_f32(h2, dlc, ((0,), (0,)))     # (D, tile)
        d_b_t = dl.sum(axis=0)
        d_w = jax.lax.dynamic_update_slice(d_w, d_w_t, (0, i * tile))
        d_b = jax.lax.dynamic_update_slice(d_b, d_b_t, (i * tile,))
        return d_h, d_w, d_b

    init = (jnp.zeros((N, D), jnp.float32),
            jnp.zeros((D, nt * tile), jnp.float32),
            jnp.zeros((nt * tile,), jnp.float32))
    d_h, d_w, d_b = jax.lax.fori_loop(0, nt, body, init)
    if shard_axis is not None:
        # each shard holds only its fc columns but every shard's columns
        # contribute to d_h — the Megatron-style vocab-parallel reduction
        d_h = jax.lax.psum(d_h, shard_axis)
    d_w = d_w[:, :V]
    d_b = d_b[:V]
    if batch_axis is not None:
        d_w = jax.lax.psum(d_w, batch_axis)
        d_b = jax.lax.psum(d_b, batch_axis)
    return (d_w.astype(w.dtype), d_b.astype(b.dtype),
            d_h.astype(h2.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _nll_head(k, tile, w, b, h2, tgt_ids):
    out, _ = _nll_head_fwd(k, tile, w, b, h2, tgt_ids)
    return out


def _nll_head_fwd(k, tile, w, b, h2, tgt_ids):
    zero = jnp.int32(0)
    nll, hit, lse = nll_topk_fwd_block(w, b, h2, tgt_ids, zero, k=k,
                                       tile=tile)
    return (nll, hit), (w, b, h2, tgt_ids, lse)


def _nll_head_bwd(k, tile, res, cts):
    w, b, h2, tgt_ids, lse = res
    d_w, d_b, d_h = nll_bwd_block(w, b, h2, tgt_ids, lse, cts[0],
                                  jnp.int32(0), tile=tile)
    return d_w, d_b, d_h, None


_nll_head.defvjp(_nll_head_fwd, _nll_head_bwd)


def chunked_nll_topk(fc, hidden, targets, *, k: int = 5, tile: int = 2048):
    """Per-token (nll, hit) (each (B, T) f32), logit-tensor-free.

    fc: {"w": (D, V), "b": (V,)}; nll is differentiable in fc and hidden,
    hit is a metric.  The mean-reduction lives in the caller so it stays
    plain differentiable JAX.  (TP path: steps.make_chunked_head_island
    wraps the fwd/bwd blocks in its own shard_maps instead.)"""
    B, T, D = hidden.shape
    h2 = hidden.reshape(B * T, D)
    tgt = targets.reshape(-1).astype(jnp.int32)
    nll, hit = _nll_head(k, tile, fc["w"], fc["b"], h2, tgt)
    return nll.reshape(B, T), hit.reshape(B, T)


def chunked_ce_topk(fc, hidden, targets, mask, *, k: int = 5,
                    tile: int = 2048):
    """Masked mean CE + top-k accuracy (%) + token count, logit-tensor-free.

    fc: {"w": (D, V), "b": (V,)}; hidden: (B, T, D) post-dropout hidden
    states; targets: (B, T) int; mask: (B, T) validity.  Returns
    (ce, topk_pct, n_tokens), all f32 scalars, differentiable in fc and
    hidden only.
    """
    nll, hit = chunked_nll_topk(fc, hidden, targets, k=k, tile=tile)
    maskf = mask.astype(jnp.float32)
    denom = jnp.maximum(maskf.sum(), 1.0)
    ce = (nll * maskf).sum() / denom
    topk = (hit * maskf).sum() / denom * 100.0
    return ce, topk, maskf.sum()


def chunked_eval_head(fc, hidden, targets, mask, *, k: int = 5,
                      tile: int = 2048):
    """Eval-mode head: (ce, topk_pct, n_tokens, argmax_preds) in one tile
    pass, no autodiff.  argmax ties resolve to the first (lowest) column,
    matching ``jnp.argmax`` over the dense logits."""
    B, T, D = hidden.shape
    cdt = hidden.dtype
    h2 = hidden.reshape(B * T, D)
    tgt = targets.reshape(-1).astype(jnp.int32)
    maskf = mask.reshape(-1).astype(jnp.float32)
    V = fc["w"].shape[1]
    wp, bp = _pad_cols(fc["w"], fc["b"], tile)
    nt = wp.shape[1] // tile
    N = h2.shape[0]
    zero = jnp.int32(0)

    def body(i, carry):
        m, s, tl, bv, bi = carry
        logits, col, valid, _ = _tile_logits(h2, wp, bp, i, tile, V, zero,
                                             cdt)
        tmax = logits.max(axis=-1)
        targ = col[logits.argmax(axis=-1)]
        upd = tmax > bv                   # strict: first occurrence wins
        bv = jnp.where(upd, tmax, bv)
        bi = jnp.where(upd, targ, bi)
        new_m = jnp.maximum(m, tmax)
        s = s * jnp.exp(m - new_m) + jnp.exp(
            logits - new_m[:, None]).sum(axis=-1)
        is_t = (col[None, :] == tgt[:, None]) & valid[None, :]
        tl = tl + jnp.where(is_t, logits, 0.0).sum(axis=-1)
        return new_m, s, tl, bv, bi

    init = (jnp.full((N,), NEG_INF, jnp.float32),
            jnp.zeros((N,), jnp.float32),
            jnp.zeros((N,), jnp.float32),
            jnp.full((N,), NEG_INF, jnp.float32),
            jnp.zeros((N,), jnp.int32))
    m, s, tgt_logit, _, best_idx = jax.lax.fori_loop(0, nt, body, init)
    gt, tie = _count_scan(h2, wp, bp, tgt, tgt_logit,
                          tile=tile, V=V, col0=zero, cdt=cdt)
    lse = m + jnp.log(s)
    denom = jnp.maximum(maskf.sum(), 1.0)
    ce = ((lse - tgt_logit) * maskf).sum() / denom
    hit = ((gt + tie) < k).astype(jnp.float32)
    topk = (hit * maskf).sum() / denom * 100.0
    return ce, topk, maskf.sum(), best_idx.reshape(B, T)
