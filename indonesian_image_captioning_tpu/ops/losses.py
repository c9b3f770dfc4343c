"""Masked losses for fixed-shape caption training.

Reproduces the reference loss semantics exactly, without dynamic shapes:
  * CE over packed valid tokens with mean reduction
    (pack_padded_sequence + nn.CrossEntropyLoss, trains/attention_scn.py:219-232)
    == sum(ce * mask) / sum(mask).
  * Doubly-stochastic attention regulariser
    alpha_c * mean((1 - sum_t alpha_t)^2) over (batch, pixels)
    (trains/attention_scn.py:235); padded steps contribute zero alpha in the
    reference because its alphas tensor is only written for active rows, so
    the masked sum here is identical.
  * BCE for the tagger (trains/tagger.py BCELoss on sigmoid scores).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_cross_entropy(logits, targets, mask):
    """Mean CE over valid tokens.

    logits: (B, T, V); targets: (B, T) int; mask: (B, T) in {0, 1}.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(mask.sum(), 1.0)
    return (nll * mask).sum() / denom


def doubly_stochastic_penalty(alphas, mask, alpha_c: float):
    """alpha_c * mean((1 - sum_t alpha)^2); alphas (B, T, P), mask (B, T).

    Averaged over VALID rows only: the reference never sees padded rows
    (its shrinking batch drops them, trains/attention_scn.py:143), whereas
    our fixed-shape batches carry padding rows with an all-zero mask whose
    alpha total is 0 — without the row weighting each would contribute a
    constant (1-0)^2 = 1 and bias the loss on final partial batches.
    """
    if alphas is None or alpha_c == 0.0:
        return jnp.asarray(0.0, jnp.float32)
    total = (alphas * mask[..., None]).sum(axis=1)        # (B, P)
    row_valid = (mask.sum(axis=1) > 0).astype(total.dtype)  # (B,)
    per_row = ((1.0 - total) ** 2).mean(axis=1)           # (B,)
    denom = jnp.maximum(row_valid.sum(), 1.0)
    return alpha_c * (per_row * row_valid).sum() / denom


def caption_loss(outputs, caps, alpha_c: float = 0.0):
    """Full caption training loss from a teacher_forcing() output dict.

    Targets are caps shifted by one (<start> dropped, attention_scn.py:219).
    Returns (loss, aux) with aux = dict(ce, alpha_penalty, n_tokens).
    """
    logits = outputs["predictions"]
    mask = outputs["mask"]
    targets = caps[:, 1:1 + logits.shape[1]]
    ce = masked_cross_entropy(logits, targets, mask)
    pen = doubly_stochastic_penalty(outputs["alphas"], mask, alpha_c)
    return ce + pen, {
        "ce": ce,
        "alpha_penalty": pen,
        "n_tokens": mask.sum(),
    }


def caption_loss_chunked(fc, outputs, caps, alpha_c: float = 0.0,
                         k: int = 5, tile: int = 2048):
    """Caption loss + top-k from a teacher_forcing(return_hidden=True)
    output dict, via the chunked vocab head (ops/vocab_head.py) — the
    (B, T, V) logit tensor is never materialised.  Same semantics as
    caption_loss + masked_topk_accuracy; returns (loss, aux) with
    aux = dict(ce, alpha_penalty, n_tokens, topk)."""
    from .vocab_head import chunked_ce_topk
    hidden = outputs["hidden"]
    mask = outputs["mask"]
    targets = caps[:, 1:1 + hidden.shape[1]]
    ce, topk, n_tokens = chunked_ce_topk(
        fc, hidden, targets, mask, k=k, tile=tile)
    pen = doubly_stochastic_penalty(outputs["alphas"], mask, alpha_c)
    return ce + pen, {
        "ce": ce,
        "alpha_penalty": pen,
        "n_tokens": n_tokens,
        "topk": topk,
    }


def bce_loss(probs, targets, eps: float = 1e-7, row_valid=None):
    """Binary cross-entropy on probabilities (tagger outputs sigmoid scores,
    reference trains/tagger.py uses nn.BCELoss with mean reduction).

    row_valid (B,) masks out padded batch rows the fixed-shape loader adds
    on the final partial batch — the reference never sees such rows.
    """
    p = jnp.clip(probs, eps, 1.0 - eps)
    elem = -(targets * jnp.log(p) + (1.0 - targets) * jnp.log1p(-p))
    if row_valid is None:
        return jnp.mean(elem)
    w = row_valid.astype(elem.dtype)
    denom = jnp.maximum(w.sum() * elem.shape[1], 1.0)
    return (elem * w[:, None]).sum() / denom


def masked_topk_accuracy(logits, targets, mask, k: int = 5):
    """Top-k accuracy (%) over valid tokens, matching the reference's
    accuracy() over packed scores (trains/attention_scn.py:255).

    Uses the rank-membership formulation (core/metrics.topk_hit) — a
    lax.top_k here would stable-SORT the whole (B, T, V) logit tensor on
    TPU, which profiled at 242 ms/step at batch 1024 (48% of the caption
    train step)."""
    from ..core.metrics import topk_hit
    correct = topk_hit(logits, targets, k)
    denom = jnp.maximum(mask.sum(), 1.0)
    return (correct * mask).sum() / denom * 100.0
