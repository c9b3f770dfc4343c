#!/usr/bin/env python
"""Measure the beam vocab-head top-k backends on the real chip.

Isolated per-op timings (inside a jitted fori_loop, see
tools/profile_decode.py for why) plus FULL 51-step beam decodes through the
production engine for each (head, backend) combination.  Run before
changing ModelConfig.topk_backend / sparse_head defaults.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LOOP_ITERS = 50


def loop_timeit(make_body, carry, consts, n=3):
    import jax

    @jax.jit
    def run(carry, consts):
        return jax.lax.fori_loop(
            0, LOOP_ITERS, lambda i, c: make_body(i, c, consts), carry)

    r = run(carry, consts)
    jax.device_get(jax.tree.leaves(r)[0])
    t0 = time.time()
    for _ in range(n):
        r = run(carry, consts)
    jax.device_get(jax.tree.leaves(r)[0])
    return (time.time() - t0) / (n * LOOP_ITERS)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--vocab", type=int, default=6763)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--full", action="store_true",
                    help="also run full 51-step beam decodes per config")
    ap.add_argument("--section", default="all",
                    choices=("all", "isolated", "head", "decode"))
    args = ap.parse_args()

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import dataclasses
    import jax
    import jax.numpy as jnp
    from indonesian_image_captioning_tpu.core.config import (
        BeamConfig, ModelConfig)
    from indonesian_image_captioning_tpu.models import decoders
    from indonesian_image_captioning_tpu.models.layers import linear
    from indonesian_image_captioning_tpu.ops.topk_pallas import (
        row_topk_iterative, row_topk_pallas)

    dt = jnp.dtype(args.dtype)
    B, K, V = args.batch, args.beam, args.vocab
    cfg = ModelConfig(model_type="attention_scn", vocab_size=V,
                      dtype=args.dtype)
    params = decoders.init_decoder(jax.random.key(0), cfg)
    params = decoders.cast_params(params, dt)
    D = cfg.decoder_dim
    hf = (jax.random.normal(jax.random.key(2), (B * K, D)) * 0.1).astype(dt)
    scores = jax.random.normal(jax.random.key(3), (B, K)).astype(jnp.float32)
    consts = {"fc": params["fc"], "scores": scores}
    print(f"dims: B={B} K={K} D={D} V={V} dtype={dt}")

    # ---- isolated: top-k backends over a fixed logprob table -------------
    logits0 = linear(params["fc"], hf)
    flat_lp = jax.nn.log_softmax(logits0, axis=-1)          # (B*K, V) dt
    cand0 = (scores[:, :, None]
             + flat_lp.reshape(B, K, V)).reshape(B, K * V)  # (B, K*V) f32

    def feed(x, vals):
        return (x * 0.99999 + vals[:1, :1] * 1e-9).astype(x.dtype)

    backends_iso = (("lax.top_k", lambda x: jax.lax.top_k(x, K)),
                    ("pallas", lambda x: row_topk_pallas(x, K)),
                    ("iterative", lambda x: row_topk_iterative(x, K)))
    if args.section not in ("all", "isolated"):
        backends_iso = ()
    for name, fn in backends_iso:
        def body(_, x, cs, fn=fn):
            v, i = fn(x)
            return feed(x, v.astype(jnp.float32))
        t = loop_timeit(body, flat_lp, {})
        print(f"per-row  (R={B*K}, V={V})  {name:10s}: {t*1e3:7.3f} ms")
        t = loop_timeit(body, cand0, {})
        print(f"flat     (R={B}, V={K*V}) {name:10s}: {t*1e3:7.3f} ms")

    # ---- full head step in-loop ------------------------------------------
    def dense_head(hf, cs, backend):
        logits = linear(cs["fc"], hf.reshape(B, K, D))      # (B, K, V)
        lp = jax.nn.log_softmax(logits, axis=-1)
        cand = cs["scores"][:, :, None] + lp
        if backend == "lax":
            v, i = jax.lax.top_k(cand.reshape(B, K * V), K)
        elif backend == "pallas":
            v, i = row_topk_pallas(cand.reshape(B, K * V), K)
        else:
            v, i = row_topk_iterative(cand.reshape(B, K * V), K)
        return v

    def sparse_head(hf, cs, backend):
        logits = linear(cs["fc"], hf)                       # (B*K, V)
        lp = jax.nn.log_softmax(logits, axis=-1)
        if backend == "lax":
            tv, ti = jax.lax.top_k(lp, K)
        elif backend == "pallas":
            tv, ti = row_topk_pallas(lp, K)
        else:
            tv, ti = row_topk_iterative(lp, K)
        cand = cs["scores"][:, :, None] + tv.reshape(B, K, K)
        v, i = jax.lax.top_k(cand.reshape(B, K * K), K)
        return v

    head_combos = (("dense", dense_head), ("sparse", sparse_head)) \
        if args.section in ("all", "head") else ()
    for head, hfn in head_combos:
        for backend in ("lax", "pallas", "iterative"):
            def body(_, hf, cs, hfn=hfn, backend=backend):
                v = hfn(hf, cs, backend)
                return (hf * 0.999
                        + v[:1, :1].astype(hf.dtype) * 1e-6).astype(hf.dtype)
            t = loop_timeit(body, hf, consts)
            print(f"head {head:6s} {backend:10s}: {t*1e3:7.3f} ms/step")

    # ---- full decode -------------------------------------------------------
    if args.full or args.section == "decode":
        from indonesian_image_captioning_tpu.decode.api import (
            caption_beam_search)
        enc = (jax.random.normal(
            jax.random.key(1), (B, cfg.enc_image_size, cfg.enc_image_size,
                                cfg.encoder_dim)) * 0.1).astype(dt)
        tags = jax.random.uniform(jax.random.key(4),
                                  (B, cfg.semantic_dim)).astype(dt)
        for sparse in (False, True):
            for backend in ("lax", "pallas", "iterative"):
                c = dataclasses.replace(cfg, sparse_head=sparse,
                                        topk_backend=backend)
                def run():
                    out = caption_beam_search(
                        params, c, enc, tags, start_id=V - 2, end_id=V - 1,
                        beam_cfg=BeamConfig(beam_size=K))
                    return jax.device_get(out["lengths"])
                run()
                t0 = time.time()
                for _ in range(3):
                    run()
                dtm = (time.time() - t0) / 3
                print(f"full decode sparse={sparse!s:5s} {backend:10s}: "
                      f"{dtm*1e3:7.1f} ms/batch "
                      f"({B/dtm:7.1f} captions/s)")


if __name__ == "__main__":
    main()
