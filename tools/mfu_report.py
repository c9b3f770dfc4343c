#!/usr/bin/env python
"""MFU / roofline-fraction report for the two hot loops (VERDICT r2 #5):

* the cached-epoch caption TRAIN step (decoder fwd/bwd + Adam, the fused
  training-scan path), and
* the beam-5 span DECODE (the serving path).

Analytic model FLOPs (matmuls only — elementwise/reduction work is
bandwidth, not MXU) divided by the measured step wall time, over the
chip's peak.  "captions/s alone can't show remaining headroom" — this
prints the fraction of peak each loop actually sustains.

Peak defaults to TPU v5e: 197 TFLOP/s bf16 / 98.5 f32 (halved again for
f32 inputs on the MXU's bf16 passes is NOT applied — f32 uses the
documented 98.5).  Override with --peak-tflops.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def decoder_step_flops(cfg, *, vocab_padded=None):
    """Matmul FLOPs for ONE decode timestep of ONE row (lane/image):
    attention + cell + vocab head (2*M*N*K convention, M=1 row)."""
    P = cfg.enc_image_size * cfg.enc_image_size
    E, A, D = cfg.encoder_dim, cfg.attention_dim, cfg.decoder_dim
    Emb, F4 = cfg.embed_dim, 4 * cfg.factored_dim
    V = vocab_padded or cfg.vocab_size
    att = 2 * (D * A          # dec projection
               + P * A        # score reduction vs relu(ea+dec)
               + P * E        # alpha-weighted encoding
               + D * E)       # f_beta gate
    if cfg.model_type == "attention_scn":
        cell = 2 * ((Emb + E) * F4     # x factor
                    + D * F4           # h factor
                    + 2 * F4 * D)      # gate projections (x and h)
    else:                              # pure_attention torch LSTM
        cell = 2 * (Emb + E + D) * 4 * D
    head = 2 * D * V
    return att, cell, head


def train_flops_per_image(cfg, T):
    """Matmul FLOPs per image for the teacher-forced train step: hoisted
    per-image projections + T scan steps, fwd + 2x for backward."""
    P = cfg.enc_image_size * cfg.enc_image_size
    E, A = cfg.encoder_dim, cfg.attention_dim
    S, F4 = cfg.semantic_dim, 4 * cfg.factored_dim
    att, cell, head = decoder_step_flops(cfg)
    hoisted = 2 * (P * E * A       # enc_att precompute
                   + 2 * S * F4    # semantic x/h projections
                   + E * cfg.decoder_dim * 2)  # init h/c from mean enc
    fwd = hoisted + T * (att + cell + head)
    return 3 * fwd                 # bwd of a matmul chain ~ 2x fwd


def decode_flops_per_image(cfg, T, K, vocab_padded):
    """Matmul FLOPs per image for a T-step, K-lane beam decode, incl. the
    exact one-hot embedding contraction the kernels use."""
    P = cfg.enc_image_size * cfg.enc_image_size
    att, cell, head = decoder_step_flops(cfg, vocab_padded=vocab_padded)
    emb_onehot = 2 * vocab_padded * cfg.embed_dim
    hoisted = 2 * (P * cfg.encoder_dim * cfg.attention_dim
                   + 2 * cfg.semantic_dim * 4 * cfg.factored_dim)
    return hoisted + T * K * (att + cell + head + emb_onehot)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("train", "decode", "tagger", "both",
                                       "all"),
                    default="both")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--vocab", type=int, default=6763)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--peak-tflops", type=float, default=None,
                    help="chip peak for the dtype; default 197 bf16 / "
                         "98.5 f32 (v5e)")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from indonesian_image_captioning_tpu.core.config import (
        BeamConfig, ModelConfig)

    peak = args.peak_tflops or (197.0 if args.dtype == "bfloat16" else 98.5)
    B, V = args.batch, args.vocab

    if args.mode in ("train", "both", "all"):
        from indonesian_image_captioning_tpu.core.config import TrainConfig
        from indonesian_image_captioning_tpu.core.prng import root_key
        from indonesian_image_captioning_tpu.train import caption as ct
        from indonesian_image_captioning_tpu.train import steps as steps_lib

        cfg = ModelConfig(model_type="attention_scn", vocab_size=V)
        opt = steps_lib.make_optimizer(4e-4, 5.0)
        state = jax.device_put(ct.init_state(root_key(0), cfg, opt))
        tcfg = TrainConfig(batch_size=B, decoder_dtype=args.dtype)
        _, train_step = steps_lib.make_caption_train_step(cfg, tcfg, opt,
                                                          donate=False)
        sub = {"params": state["params"], "opt_state": state["opt_state"]}
        rng = np.random.default_rng(0)
        enc_f = jax.device_put((rng.standard_normal(
            (B, 14, 14, 2048)) * 0.1).astype(np.float32))
        ftags = jax.device_put(rng.random((B, 1000)).astype(np.float32))
        caps = jax.device_put(rng.integers(1, V, (B, 52)).astype(np.int32))
        caplens = jax.device_put(np.full((B,), 30, np.int32))
        key = root_key(1)

        def run():
            _, metrics = train_step(sub, enc_f, ftags, caps, caplens, key)
            return metrics["loss"]

        jax.device_get(run())
        t0 = time.time()
        for _ in range(args.iters):
            out = run()
        jax.device_get(out)
        dt = (time.time() - t0) / args.iters
        fl = train_flops_per_image(cfg, T=51) * B
        tf = fl / dt / 1e12
        print(f"TRAIN  b{B} {args.dtype}: {dt*1e3:.1f} ms/step = "
              f"{B/dt:.0f} imgs/s | model {fl/1e9:.1f} GFLOP/step -> "
              f"{tf:.1f} TFLOP/s = {100*tf/peak:.1f}% of {peak:.0f} peak",
              flush=True)

    if args.mode in ("tagger", "all"):
        # tagger-TRAIN MFU (VERDICT r3 #7): the reference recipe trains
        # the ResNet-152 itself (trains/tagger.py:132-192) — fwd + bwd +
        # BCE + masked Adam, train-mode BN, b128 bf16 with encoder_remat
        # (required at 256px b>=128).  Model FLOPs: the 30.3 GFLOP/img
        # analytic conv stack (He et al., scaled to 256px) x3 for the
        # backward-through-everything chain; remat recompute is NOT
        # counted (it is overhead, not model work).
        from indonesian_image_captioning_tpu.core.config import (
            TaggerConfig, TrainConfig)
        from indonesian_image_captioning_tpu.core.prng import root_key
        from indonesian_image_captioning_tpu.train import steps as steps_lib
        from indonesian_image_captioning_tpu.train import tagger as tt

        Bt = 128
        tcfg = TrainConfig(batch_size=Bt, tagger_dtype=args.dtype,
                           encoder_remat="blocks")
        tagger_cfg = TaggerConfig()
        opt = steps_lib.make_optimizer(1e-4, 5.0)
        tstate = jax.device_put(tt.init_state(
            root_key(0), tcfg, tagger_cfg, opt))
        tstep = steps_lib.make_tagger_train_step(
            tcfg, opt, tagger_cfg.dropout, arch=tagger_cfg.encoder_arch,
            donate=False)
        rng = np.random.default_rng(0)
        imgs = jax.device_put(rng.integers(
            0, 256, (Bt, 3, 256, 256), np.uint8))
        tgt = jax.device_put((rng.random((Bt, 1000)) < 0.01)
                             .astype(np.float32))

        batch_t = {"images": imgs, "tags": tgt}
        kdrop = root_key(7)

        def run_t():
            _, m = tstep(tstate, batch_t, kdrop)
            return m["loss"]

        jax.device_get(run_t())
        t0 = time.time()
        for _ in range(max(args.iters, 5)):
            out = run_t()
        jax.device_get(out)
        dt = (time.time() - t0) / max(args.iters, 5)
        fl = 3 * 30.3e9 * Bt
        tf = fl / dt / 1e12
        print(f"TAGGER-TRAIN b{Bt} {args.dtype} remat=blocks: "
              f"{dt*1e3:.1f} ms/step = {Bt/dt:.0f} imgs/s | model "
              f"{fl/1e9:.0f} GFLOP/step -> {tf:.1f} TFLOP/s = "
              f"{100*tf/peak:.1f}% of {peak:.0f} peak", flush=True)

    if args.mode in ("decode", "both", "all"):
        from indonesian_image_captioning_tpu.decode.api import (
            caption_beam_search)
        from indonesian_image_captioning_tpu.models import decoders
        from indonesian_image_captioning_tpu.ops.attention_pallas import (
            _round_up)

        cfg = ModelConfig(model_type="attention_scn", vocab_size=V,
                          dtype=args.dtype)
        params = decoders.init_decoder(jax.random.key(0), cfg)
        if args.dtype == "bfloat16":
            params = decoders.cast_params(params, jnp.bfloat16)
        enc = (jax.random.normal(
            jax.random.key(1), (B, 14, 14, cfg.encoder_dim)) * 0.1)
        tags = jax.random.uniform(jax.random.key(2), (B, cfg.semantic_dim))
        if args.dtype == "bfloat16":
            enc, tags = enc.astype(jnp.bfloat16), tags.astype(jnp.bfloat16)
        beam_cfg = BeamConfig(beam_size=5)

        def run():
            out = caption_beam_search(params, cfg, enc, tags,
                                      start_id=V - 2, end_id=V - 1,
                                      beam_cfg=beam_cfg)
            return jax.device_get(out["lengths"])

        lens = run()
        T = int(lens.max())            # random weights: full-length decode
        t0 = time.time()
        for _ in range(args.iters):
            run()
        dt = (time.time() - t0) / args.iters
        fl = decode_flops_per_image(cfg, T=T, K=5,
                                    vocab_padded=_round_up(V, 128)) * B
        tf = fl / dt / 1e12
        print(f"DECODE b{B} beam5 {args.dtype} V={V}: {dt*1e3:.1f} ms = "
              f"{B/dt:.0f} captions/s | model {fl/1e9:.1f} GFLOP/batch -> "
              f"{tf:.1f} TFLOP/s = {100*tf/peak:.1f}% of {peak:.0f} peak",
              flush=True)


if __name__ == "__main__":
    main()
