#!/usr/bin/env python
"""Parity check: fused training-scan kernel pair vs the XLA scan.

CPU (interpret mode) by default; on TPU run with JAX_PLATFORMS unset.
Checks forward (h_all, alphas) and gradients w.r.t. every decoder
parameter against jax.grad of an equivalent XLA composition.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "--tpu" not in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"   # the ambient env pins axon

import jax
import jax.numpy as jnp
import numpy as np

from indonesian_image_captioning_tpu.core.config import ModelConfig
from indonesian_image_captioning_tpu.models import attention as attn
from indonesian_image_captioning_tpu.models import decoders, scn_cell
from indonesian_image_captioning_tpu.ops import train_pallas


def xla_scan(params, cfg, enc_flat, tags, emb):
    """The decoders.teacher_forcing scan, returning (h_all, alphas)."""
    from indonesian_image_captioning_tpu.models import lstm_cell

    cell = params["decode_step"]
    T = emb.shape[1]
    h, c = decoders.init_hidden_state(params, enc_flat)
    is_scn = cfg.model_type in decoders.SCN_BASED_MODELS
    if is_scn:
        sem_x, sem_h = scn_cell.semantic_projections(cell, tags)
        w_x_emb = cell["w_x"][: cfg.embed_dim]
        w_x_awe = cell["w_x"][cfg.embed_dim:]
        emb_fac = (emb @ w_x_emb).reshape(*emb.shape[:2], 4, -1)
    enc_att = attn.precompute(params["attention"], enc_flat)

    def step(carry, xs):
        h, c = carry
        (t,) = xs
        awe, alpha = attn.attend(params["attention"], enc_flat, enc_att, h)
        gate = jax.nn.sigmoid(
            h @ params["f_beta"]["w"] + params["f_beta"]["b"])
        awe = gate * awe
        if is_scn:
            x_fac = emb_fac[:, t] + (awe @ w_x_awe).reshape(
                awe.shape[0], 4, -1)
            h, c = scn_cell.scn_step(cell, x_fac, sem_x, sem_h, h, c)
        else:
            x = jnp.concatenate([emb[:, t], awe], axis=-1)
            h, c = lstm_cell.lstm_step(cell, x, h, c)
        return (h, c), (h, alpha)

    (_, _), (h_all, alphas) = jax.lax.scan(step, (h, c),
                                           (jnp.arange(T),))
    return jnp.swapaxes(h_all, 0, 1), jnp.swapaxes(alphas, 0, 1)


def main():
    model = "attention_scn"
    if "--model" in sys.argv:
        model = sys.argv[sys.argv.index("--model") + 1]
    if "--flagship" in sys.argv:
        # production dims (small B, tiny vocab — the head sits outside
        # the kernels, so V does not exercise them)
        B, P, T = 64, 196, 51
        span = 4
        cfg = ModelConfig(model_type=model, vocab_size=512,
                          max_caption_len=T + 1)
    else:
        B, P, T = 16, 9, 7
        span = 4
        cfg = ModelConfig(model_type=model, vocab_size=50,
                          embed_dim=24, attention_dim=40, decoder_dim=32,
                          factored_dim=16, semantic_dim=10, encoder_dim=48,
                          max_caption_len=T + 1)
    key = jax.random.key(0)
    params = decoders.init_decoder(key, cfg)
    ks = jax.random.split(jax.random.key(1), 6)
    enc = jax.random.normal(ks[0], (B, P, cfg.encoder_dim)) * 0.3
    tags = jax.random.uniform(ks[1], (B, cfg.semantic_dim))
    emb = jax.random.normal(ks[2], (B, T, cfg.embed_dim)) * 0.2
    w1 = jax.random.normal(ks[3], (cfg.decoder_dim,))
    w2 = jax.random.normal(ks[4], (P,))

    h_ref, al_ref = xla_scan(params, cfg, enc, tags, emb)
    h_fus, al_fus = train_pallas.fused_teacher_forcing_scan(
        params, cfg, enc, tags, emb, span=span)
    print("fwd  h_all  max|d|", float(jnp.abs(h_ref - h_fus).max()))
    print("fwd  alphas max|d|", float(jnp.abs(al_ref - al_fus).max()))

    def loss(params, impl):
        fn = xla_scan if impl == "xla" else (
            lambda *a: train_pallas.fused_teacher_forcing_scan(
                *a, span=span))
        h_all, alphas = fn(params, cfg, enc, tags, emb)
        return (jnp.sum(jnp.tanh(h_all) * w1) * 0.1
                + jnp.sum((1.0 - alphas.sum(axis=1)) ** 2) * 0.05
                + jnp.sum(h_all[:, -1] ** 2) * 0.02)

    l_ref, g_ref = jax.value_and_grad(loss)(params, "xla")
    l_fus, g_fus = jax.value_and_grad(loss)(params, "fused")
    print("loss ref/fused", float(l_ref), float(l_fus))
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_f = jax.tree.leaves(g_fus)
    # Global gradient scale: leaves whose TRUE gradient is ~zero (e.g.
    # full_att.b — softmax shift invariance) would otherwise divide
    # roundoff by roundoff and report rel~1.
    gscale = max(float(jnp.abs(g).max()) for g in jax.tree.leaves(g_ref))
    flagship = "--flagship" in sys.argv
    rel_tol = 2e-3 if flagship else 2e-4   # 51-step recurrence amplifies
    worst = 0.0
    for (path, gr), gf in zip(flat_r, flat_f):
        scale = max(float(jnp.abs(gr).max()), 1e-4 * gscale)
        d = float(jnp.abs(gr - gf).max())
        rel = d / scale
        worst = max(worst, rel)
        flag = "  <-- BAD" if rel > rel_tol else ""
        print(f"  grad {jax.tree_util.keystr(path):40s} "
              f"max|d|={d:.3e} rel={rel:.3e}{flag}")
    print("worst rel:", worst)

    # Self-consistency: each impl's gradient vs a central finite
    # difference of ITS OWN loss along a random direction — separates
    # "backward inconsistent with forward" (a bug) from "forward values
    # differ by reassociation" (expected).  Small dims only: at flagship
    # f32 scale (loss ~474) the FD cancellation noise dwarfs the
    # directional derivative — XLA's own gradient "fails" it by 2.2.
    if flagship:
        print("PASS" if worst < 5e-3 else "FAIL")
        return
    u = jax.tree.map(
        lambda p: jax.random.normal(jax.random.key(7), p.shape, p.dtype),
        params)
    norm = jnp.sqrt(sum(jnp.sum(x * x) for x in jax.tree.leaves(u)))
    u = jax.tree.map(lambda x: x / norm, u)
    eps = 1e-3
    for impl, g in (("xla", g_ref), ("fused", g_fus)):
        lp = loss(jax.tree.map(lambda p, d: p + eps * d, params, u), impl)
        lm = loss(jax.tree.map(lambda p, d: p - eps * d, params, u), impl)
        fd = (lp - lm) / (2 * eps)
        ip = sum(jnp.sum(a * b) for a, b in
                 zip(jax.tree.leaves(g), jax.tree.leaves(u)))
        print(f"  {impl:5s} directional: grad.u={float(ip):+.8f} "
              f"fd={float(fd):+.8f} |d|={abs(float(ip - fd)):.2e}")
    print("PASS" if worst < 5e-3 else "FAIL")


if __name__ == "__main__":
    main()
