#!/usr/bin/env python
"""Component-level decode profiling on the real chip at bench dims.

Times, per decode step at (B, K) = (1024, 5) bf16 flagship dims:
  * the full beam-search batch decode (flags off/on),
  * the isolated attention step: XLA attend vs Pallas attend_fused,
  * the isolated vocab head: XLA fc+log_softmax+top_k vs fused fc_topk.

Guides kernel work — run before and after touching ops/*_pallas.py.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


LOOP_ITERS = 50


def loop_timeit(make_body, carry, consts, n=3):
    """Time one op iterated LOOP_ITERS times INSIDE one jitted fori_loop —
    per-call dispatch through the axon relay costs tens of ms and would
    otherwise dominate; each iteration feeds the next so nothing hoists.

    consts: dict of device arrays the body needs — passed as jit ARGUMENTS
    (closure capture would embed them in the HLO as constants and stall the
    remote compile for minutes at these sizes)."""
    import jax

    @jax.jit
    def run(carry, consts):
        return jax.lax.fori_loop(
            0, LOOP_ITERS, lambda i, c: make_body(i, c, consts), carry)

    r = run(carry, consts)
    jax.device_get(jax.tree.leaves(r)[0])  # hard sync
    t0 = time.time()
    for _ in range(n):
        r = run(carry, consts)
    jax.device_get(jax.tree.leaves(r)[0])
    return (time.time() - t0) / (n * LOOP_ITERS)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--vocab", type=int, default=6763)
    ap.add_argument("--full", action="store_true",
                    help="also run full 51-step beam decodes")
    ap.add_argument("--section", default="all",
                    choices=("all", "attend", "head", "cell"))
    args = ap.parse_args()

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from indonesian_image_captioning_tpu.core.config import (
        BeamConfig, ModelConfig)
    from indonesian_image_captioning_tpu.models import attention as attn
    from indonesian_image_captioning_tpu.models import decoders
    from indonesian_image_captioning_tpu.models.layers import linear

    dt = jnp.dtype(args.dtype)
    B, K, V = args.batch, args.beam, args.vocab
    cfg = ModelConfig(model_type="attention_scn", vocab_size=V,
                      dtype=args.dtype)
    params = decoders.init_decoder(jax.random.key(0), cfg)
    params = decoders.cast_params(params, dt)
    P, E, A, D = cfg.num_pixels, cfg.encoder_dim, cfg.attention_dim, \
        cfg.decoder_dim

    enc = (jax.random.normal(jax.random.key(1), (B, P, E)) * 0.1).astype(dt)
    enc_att = attn.precompute(params["attention"], enc)
    h = (jax.random.normal(jax.random.key(2), (B, K, D)) * 0.1).astype(dt)
    print(f"dims: B={B} K={K} P={P} E={E} A={A} D={D} V={V} dtype={dt}")

    # ---- attention step ----------------------------------------------------
    def feed(h, awe):
        """Data-dependence so the loop body can't be hoisted."""
        return (h * 0.999 + awe[..., :h.shape[-1]] * 1e-3).astype(h.dtype)

    attend_consts = {"att": params["attention"], "enc": enc,
                     "enc_att": enc_att}
    run_attend = args.section in ("all", "attend")
    run_head = args.section in ("all", "head")
    run_cell = args.section in ("all", "cell")

    def xla_attend_body(_, h, cs):
        awe, alpha = attn.attend(cs["att"], cs["enc"][:, None],
                                 cs["enc_att"][:, None], h)
        return feed(h, awe)

    if run_attend:
        t = loop_timeit(xla_attend_body, h, attend_consts)
        print(f"attend XLA:            {t*1e3:8.3f} ms/step")

    from indonesian_image_captioning_tpu.ops.attention_pallas import (
        attend_fused)

    def pallas_attend_body(_, h, cs):
        awe, alpha = attend_fused(cs["att"], cs["enc"][:, None],
                                  cs["enc_att"][:, None], h)
        return feed(h, awe)

    if run_attend:
        from indonesian_image_captioning_tpu.ops.attention_pallas import (
            pad_pixels)
        padded_consts = {**attend_consts,
                         "enc_p": pad_pixels(enc),
                         "enc_att_p": pad_pixels(enc_att)}
        for gtile in (4, 32):
            def body(_, h, cs, gtile=gtile):
                awe, alpha = attend_fused(cs["att"], cs["enc_p"][:, None],
                                          cs["enc_att_p"][:, None], h,
                                          p_actual=P, img_tile=gtile)
                return feed(h, awe)
            try:
                t = loop_timeit(body, h, padded_consts)
                print(f"attend Pallas prepad G={gtile}: "
                      f"{t*1e3:8.3f} ms/step")
            except Exception as e:
                print(f"attend Pallas prepad G={gtile} FAILED: "
                      f"{type(e).__name__}: {e}")

    if run_attend:
        from indonesian_image_captioning_tpu.ops.attention_pallas import (
            attend_fused_q, attend_fused_v3, quantize_pixels)
        qconsts = {**attend_consts}
        (qconsts["enc_q"], qconsts["enc_s"]) = quantize_pixels(enc)
        (qconsts["ea_q"], qconsts["ea_s"]) = quantize_pixels(enc_att)

        def quant_body(_, h, cs):
            awe, alpha = attend_fused_q(cs["att"], cs["enc_q"], cs["enc_s"],
                                        cs["ea_q"], cs["ea_s"], h,
                                        p_actual=P, with_alpha=False)
            return feed(h, awe)

        try:
            t = loop_timeit(quant_body, h, qconsts)
            print(f"attend Pallas int8 (noalpha): {t*1e3:8.3f} ms/step")
        except Exception as e:
            print(f"attend Pallas int8 FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}")

        def v3_body(_, h, cs):
            awe, alpha = attend_fused_v3(
                cs["att"], cs["enc_p"][:, None], cs["enc_att_p"][:, None],
                h, p_actual=P, img_tile=32, group=8, with_alpha=False)
            return feed(h, awe)

        try:
            t = loop_timeit(v3_body, h, padded_consts)
            print(f"attend Pallas v3 G32 (noalpha): {t*1e3:8.3f} ms/step")
        except Exception as e:
            print(f"attend Pallas v3 FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}")

    from indonesian_image_captioning_tpu.ops.attention_pallas import (
        attend_fused_t, precompute_transposed)

    def pallas_attend_t_body(_, h, cs):
        awe, alpha = attend_fused_t(cs["att"], cs["enc"][:, None],
                                    cs["enc_att_t"], h)
        return feed(h, awe)

    if run_attend:
        attend_t_consts = {**attend_consts,
                           "enc_att_t": precompute_transposed(
                               params["attention"], enc)}
        try:
            t = loop_timeit(pallas_attend_t_body, h, attend_t_consts)
            print(f"attend Pallas transposed: {t*1e3:8.3f} ms/step")
        except Exception as e:
            print(f"attend Pallas transposed FAILED: {type(e).__name__}: {e}")

    # ---- vocab head --------------------------------------------------------
    hf = h.reshape(B * K, D)
    head_consts = {"fc": params["fc"]}

    def xla_head_body(_, hf, cs):
        logits = linear(cs["fc"], hf)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        vals, idx = jax.lax.top_k(logprobs.reshape(B, K * V), K)
        return (hf * 0.999
                + jnp.repeat(vals, K, 0)[:, :1] * 1e-6).astype(hf.dtype)

    if run_head:
        t = loop_timeit(xla_head_body, hf, head_consts)
        print(f"vocab head XLA (dense flat top-k): {t*1e3:8.3f} ms/step")

    from indonesian_image_captioning_tpu.ops.fc_topk_pallas import fc_topk

    def pallas_head_body(_, hf, cs):
        topv, topi, lse = fc_topk(hf.astype(jnp.float32),
                                  cs["fc"]["w"].astype(jnp.float32),
                                  cs["fc"]["b"].astype(jnp.float32), K)
        cand = (topv - lse[:, None]).reshape(B, K * K)
        vals, idx = jax.lax.top_k(cand, K)
        return (hf * 0.999
                + jnp.repeat(vals, K, 0)[:, :1] * 1e-6).astype(hf.dtype)

    if run_head:
        try:
            t = loop_timeit(pallas_head_body, hf, head_consts)
            print(f"vocab head Pallas fc_topk+sparse:  {t*1e3:8.3f} ms/step")
        except Exception as e:
            print(f"vocab head Pallas FAILED: {type(e).__name__}: {e}")

    # XLA variants to locate the head's floor
    def per_row_head_body(_, hf, cs):
        """per-lane top-k of LOGITS (exact: lse shift is monotone per row),
        then flat merge over K*k — all XLA."""
        logits = linear(cs["fc"], hf)                     # (R, V)
        lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
        topv, topi = jax.lax.top_k(logits, K)             # (R, k)
        cand = (topv.astype(jnp.float32) - lse[:, None]).reshape(B, K * K)
        vals, idx = jax.lax.top_k(cand, K)
        return (hf * 0.999
                + jnp.repeat(vals, K, 0)[:, :1].astype(hf.dtype) * 1e-6)

    if run_head:
        t = loop_timeit(per_row_head_body, hf, head_consts)
        print(f"vocab head XLA per-row topk+sparse: {t*1e3:8.3f} ms/step")

    VT = 512
    Vp = -(-V // VT) * VT
    T_tiles = Vp // VT

    def tilemax_head_body(_, hf, cs):
        """hierarchical: per-row tile maxima -> top-k tiles -> gather ->
        exact top-k over k*VT candidates."""
        w = jnp.pad(cs["fc"]["w"], ((0, 0), (0, Vp - V)),
                    constant_values=0)
        b = jnp.pad(cs["fc"]["b"], (0, Vp - V), constant_values=-1e30)
        logits = (hf @ w + b)                             # (R, Vp)
        lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
        tiles = logits.reshape(-1, T_tiles, VT)
        tmax = tiles.max(axis=-1)                         # (R, T)
        _, tids = jax.lax.top_k(tmax, K)                  # (R, k)
        gathered = jnp.take_along_axis(tiles, tids[:, :, None],
                                       axis=1).reshape(-1, K * VT)
        topv, local = jax.lax.top_k(gathered, K)          # (R, k)
        gidx = (jnp.take_along_axis(tids, local // VT, axis=1) * VT
                + local % VT)                             # global vocab ids
        cand = (topv.astype(jnp.float32) - lse[:, None]).reshape(B, K * K)
        vals, idx = jax.lax.top_k(cand, K)
        return (hf * 0.999
                + (jnp.repeat(vals, K, 0)[:, :1]
                   + jnp.repeat(gidx, 1, 0)[:, :1] * 0.0
                   ).astype(hf.dtype) * 1e-6)

    if run_head:
        t = loop_timeit(tilemax_head_body, hf, head_consts)
        print(f"vocab head XLA tilemax+sparse:      {t*1e3:8.3f} ms/step")

    def argmax5_head_body(_, hf, cs):
        """k rounds of argmax+mask over (R, V) — linear scans, no sort."""
        logits = linear(cs["fc"], hf).astype(jnp.float32)
        lse = jax.nn.logsumexp(logits, axis=-1)
        work = logits
        vs, js = [], []
        col = jax.lax.broadcasted_iota(jnp.int32, work.shape, 1)
        for _k in range(K):
            j = jnp.argmax(work, axis=-1)
            v = jnp.take_along_axis(work, j[:, None], axis=-1)
            vs.append(v)
            js.append(j[:, None])
            work = jnp.where(col == j[:, None], -1e30, work)
        topv = jnp.concatenate(vs, axis=1)
        cand = (topv - lse[:, None]).reshape(B, K * K)
        vals, idx = jax.lax.top_k(cand, K)
        return (hf * 0.999
                + jnp.repeat(vals, K, 0)[:, :1].astype(hf.dtype) * 1e-6)

    if run_head:
        t = loop_timeit(argmax5_head_body, hf, head_consts)
        print(f"vocab head XLA 5-round argmax:      {t*1e3:8.3f} ms/step")

    def approx_head_body(_, hf, cs):
        """dense flat merge via approx_max_k(recall_target=1.0) — exact,
        PartialReduce lowering instead of a full sort."""
        logits = linear(cs["fc"], hf)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        vals, idx = jax.lax.approx_max_k(
            logprobs.reshape(B, K * V), K, recall_target=1.0)
        return (hf * 0.999
                + jnp.repeat(vals, K, 0)[:, :1].astype(hf.dtype) * 1e-6)

    if run_head:
        try:
            t = loop_timeit(approx_head_body, hf, head_consts)
            print(f"vocab head XLA approx_max_k(1.0):   {t*1e3:8.3f} ms/step")
        except Exception as e:
            print(f"vocab head approx FAILED: {type(e).__name__}: {e}")

    def approx_perrow_head_body(_, hf, cs):
        logits = linear(cs["fc"], hf)
        lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
        topv, topi = jax.lax.approx_max_k(logits, K, recall_target=1.0)
        cand = (topv.astype(jnp.float32) - lse[:, None]).reshape(B, K * K)
        vals, idx = jax.lax.top_k(cand, K)
        return (hf * 0.999
                + jnp.repeat(vals, K, 0)[:, :1].astype(hf.dtype) * 1e-6)

    if run_head:
        try:
            t = loop_timeit(approx_perrow_head_body, hf, head_consts)
            print(f"vocab head XLA approx per-row:      {t*1e3:8.3f} ms/step")
        except Exception as e:
            print(f"vocab head approx per-row FAILED: {type(e).__name__}: {e}")

    # ---- SCN cell ----------------------------------------------------------
    from indonesian_image_captioning_tpu.models import scn_cell
    cell = params["decode_step"]
    tags = jax.random.uniform(jax.random.key(3), (B, cfg.semantic_dim)
                              ).astype(dt)
    sx, sh = scn_cell.semantic_projections(cell, tags)
    awe = (jax.random.normal(jax.random.key(4), (B, K, E)) * 0.1).astype(dt)
    emb = (jax.random.normal(jax.random.key(5), (B, K, cfg.embed_dim))
           * 0.1).astype(dt)
    w_x_emb, w_x_awe = decoders._split_wx(params, cfg)

    cell_consts = {"cell": cell, "sx": sx, "sh": sh, "emb": emb, "awe": awe,
                   "w_x_emb": w_x_emb, "w_x_awe": w_x_awe}

    def xla_cell_body(_, carry, cs):
        h, c = carry
        x_fac = (decoders._gate_factor(cs["emb"] @ cs["w_x_emb"])
                 + decoders._gate_factor(cs["awe"] @ cs["w_x_awe"]))
        return scn_cell.scn_step(cs["cell"], x_fac, cs["sx"][:, None],
                                 cs["sh"][:, None], h, c)

    if run_cell:
        t = loop_timeit(xla_cell_body, (h, h), cell_consts)
        print(f"scn cell XLA:          {t*1e3:8.3f} ms/step")

    from indonesian_image_captioning_tpu.ops.scn_pallas import scn_step_fused

    def pallas_cell_body(_, carry, cs):
        h, c = carry
        x = jnp.concatenate([cs["emb"], cs["awe"]], axis=-1)
        return scn_step_fused(cs["cell"], x, cs["sx"][:, None]
                              + jnp.zeros((B, K, 4, cs["sx"].shape[-1]),
                                          cs["sx"].dtype),
                              cs["sh"][:, None]
                              + jnp.zeros((B, K, 4, cs["sh"].shape[-1]),
                                          cs["sh"].dtype), h, c)

    if run_cell:
        try:
            t = loop_timeit(pallas_cell_body, (h, h), cell_consts)
            print(f"scn cell Pallas fused: {t*1e3:8.3f} ms/step")
        except Exception as e:
            print(f"scn cell Pallas FAILED: {type(e).__name__}: {e}")

    # ---- full decodes ------------------------------------------------------
    if args.full:
        from indonesian_image_captioning_tpu.decode.api import (
            caption_beam_search)
        import dataclasses
        tags_b = jax.random.uniform(
            jax.random.key(6), (B, cfg.semantic_dim)).astype(dt)
        enc4 = enc.reshape(B, cfg.enc_image_size, cfg.enc_image_size, E)
        for variant in ({"sparse_head": False}, {"sparse_head": True},
                        {"sparse_head": True, "attention_impl": "pallas"}):
            c = dataclasses.replace(cfg, **variant)

            def run():
                out = caption_beam_search(
                    params, c, enc4, tags_b, start_id=V - 2, end_id=V - 1,
                    beam_cfg=BeamConfig(beam_size=K))
                return jax.device_get(out["lengths"])

            try:
                run()
                t0 = time.time()
                for _ in range(3):
                    run()
                dtp = (time.time() - t0) / 3
                print(f"full decode {variant}: "
                      f"{dtp*1e3:8.1f} ms/batch = {B/dtp:8.1f} captions/s")
            except Exception as e:
                print(f"full decode {variant} FAILED: "
                      f"{type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
