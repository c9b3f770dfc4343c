#!/usr/bin/env python
"""Headline benchmark: batched beam-5 caption decode throughput.

The FIRST JSON line keeps the round-1 schema:
  {"metric": "captions_per_sec_beam5", "value": N, "unit": "captions/s",
   "vs_baseline": N / <reference CPU captions/s>}
The default mode then also prints a cached-epoch train-throughput line and
an end-to-end serving line (VERDICT r3 #8: round-over-round progress on
training and serving must be driver-visible, not just decode).

Baseline (BASELINE.md): the unmodified PyTorch reference AttentionSCN
``sample()`` at identical dims (512/512/512/512, semantic 1000, V=6763,
beam 5, 51 decode steps, precomputed encoder features) measured on this
machine's CPU (8 torch threads): 16.07 s/caption = 0.0622 captions/s.

Apples-to-apples: this bench also decodes from precomputed encoder
features with a randomly initialised model (random weights never emit
<end>, so both sides pay the full 51 steps — worst case for us, since a
trained model finishes in ~10-20 steps).  Our side decodes a BATCH of
images through the jitted fixed-shape beam engine; the reference can only
do one image at a time.
"""

import argparse
import json
import time

REFERENCE_CPU_CAPTIONS_PER_SEC = 0.0622  # measured, see BASELINE.md
V5E_PEAK_BF16_FLOPS = 197e12             # TPU v5e peak bf16 FLOP/s


def _median_rounds(round_fn, rounds: int = 5):
    """Time ``round_fn`` (which must sync the device) ``rounds`` times and
    return (median, min, max) seconds.  VERDICT r4 #6: single-window means
    cannot separate real changes from the rig's documented machine-window
    drift; the median plus the reported spread lets a BENCH_r0N reader tell
    a ±5%% code change from noise."""
    times = []
    for _ in range(rounds):
        t0 = time.time()
        round_fn()
        times.append(time.time() - t0)
    ts = sorted(times)
    return ts[len(ts) // 2], ts[0], ts[-1]


def _spread_fields(med, lo, hi, per: float = 1.0):
    """Schema-additive spread keys; ``per`` divides to a per-item time."""
    return {
        "t_median_ms": round(med / per * 1e3, 2),
        "t_min_ms": round(lo / per * 1e3, 2),
        "t_max_ms": round(hi / per * 1e3, 2),
        "spread_pct": round((hi - lo) / med * 100.0, 1),
    }


def _compiled_flops(jitted, *args):
    """XLA's own FLOP count for a compiled program (None if unavailable)."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def e2e_main(batch: int = 64):
    """End-to-end serving: uint8 images -> ResNet-152 encode + tag ->
    batched beam-5 decode.  Reports images/s/chip and encoder MFU."""
    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from indonesian_image_captioning_tpu.core.config import (
        BeamConfig, ModelConfig)
    from indonesian_image_captioning_tpu.core.prng import root_key
    from indonesian_image_captioning_tpu.decode.api import caption_beam_search
    from indonesian_image_captioning_tpu.models import encoders
    from indonesian_image_captioning_tpu.train import caption as caption_train
    from indonesian_image_captioning_tpu.train import steps
    from indonesian_image_captioning_tpu.train.steps import prep_images

    V = 6763
    cfg = ModelConfig(model_type="attention_scn", vocab_size=V,
                      dtype="bfloat16")
    opt = steps.make_optimizer(4e-4, 5.0)
    state = caption_train.init_state(root_key(0), cfg, opt)
    bf = jnp.bfloat16
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(bf)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
    state = jax.device_put(cast(state))

    B = batch
    # device-resident input: through the axon relay a host->device copy of
    # the uint8 batch costs ~1 s/call and would swamp the chip time; real
    # deployments feed over local PCIe (and data/loader.py prefetches)
    images = jax.device_put(np.random.default_rng(0).integers(
        0, 256, (B, 3, 256, 256), np.uint8))

    @jax.jit
    def encode(st, images_u8):
        x = prep_images(images_u8).astype(bf)
        return encoders.apply_encoder_caption(
            st["encoder"], st["encoder_stats"], x, train=False,
            enc_image_size=cfg.enc_image_size, arch=cfg.encoder_arch)[0]

    @jax.jit
    def tag(st, images_u8):
        x = prep_images(images_u8).astype(bf)
        return encoders.apply_encoder_tagger(
            st["tagger"], st["tagger_stats"], x, train=False,
            arch=cfg.encoder_arch)[0]

    @jax.jit
    def decode(st, enc_out, tags):
        # serving precision: the adaptive-pool matmuls accumulate (and
        # return) f32 — cast the encoder state back to bf16 so the decode
        # runs at the same precision as the headline bench (f32 state
        # also forces the fused step kernel onto a smaller image tile)
        out = caption_beam_search(st["params"], cfg, enc_out.astype(bf),
                                  tags.astype(bf),
                                  start_id=V - 2, end_id=V - 1,
                                  beam_cfg=BeamConfig(beam_size=5))
        return out["sequences"], out["lengths"]

    def serve_async(images_u8):
        # async dispatch of the chunk's three programs; no host sync —
        # the caller keeps the next chunk's dispatch in flight while the
        # device works (VERDICT r2 #4: sustained serving must not idle
        # the chip on the host round-trip between chunks)
        enc_out = encode(state, images_u8)
        tags = tag(state, images_u8)
        return decode(state, enc_out, tags)[1]

    jax.device_get(serve_async(images))  # compile + warm
    per_round = 2

    def round_fn():
        pending = [serve_async(images) for _ in range(per_round)]
        jax.device_get(pending)          # one sync for the round's stream
    med, lo, hi = _median_rounds(round_fn, rounds=5)
    dt = med / per_round
    imgs_per_s = B / dt

    # encoder-only throughput + MFU (sync on a SCALAR probe — pulling the
    # 51 MB feature map through the relay would dominate the measurement)
    @jax.jit
    def encode_sum(st, images_u8):
        return jnp.sum(encode(st, images_u8).astype(jnp.float32))

    jax.device_get(encode_sum(state, images))
    t0 = time.time()
    for _ in range(10):
        s = encode_sum(state, images)
    jax.device_get(s)
    enc_dt = (time.time() - t0) / 10
    enc_imgs_per_s = B / enc_dt
    flops = _compiled_flops(encode, state, images)
    # analytic cross-check: ResNet-152 conv+fc ~= 11.6 GMACs at 224px
    # (He et al. 2015) -> x(256/224)^2 x2 FLOPs/MAC at 256px
    analytic_flops_per_img = 11.6e9 * (256 / 224) ** 2 * 2
    xla_flops_per_img = flops / B if flops else analytic_flops_per_img
    enc_mfu = (analytic_flops_per_img * enc_imgs_per_s) / V5E_PEAK_BF16_FLOPS

    print(json.dumps({
        "metric": "e2e_images_per_sec_beam5",
        "value": round(imgs_per_s, 3), "unit": "images/s",
        "encoder_images_per_sec": round(enc_imgs_per_s, 1),
        "encoder_gflops_per_image_xla": round(xla_flops_per_img / 1e9, 1),
        "encoder_gflops_per_image_analytic": round(
            analytic_flops_per_img / 1e9, 1),
        "encoder_mfu": round(enc_mfu, 4),
        "batch": B,
        **_spread_fields(med, lo, hi, per=per_round),
    }))


def latency_main(batch: int = 1):
    """Single-request serving LATENCY: one uint8 image -> ResNet-152
    encode + tag -> beam-5 caption, end to end on one chip.  Reports
    median / p90 wall ms over repeated single calls (throughput mode
    above amortises over a batch; this is the interactive-inference cost
    a reference user pays per `python inference.py -i img`,
    /root/reference/inference.py:52-165)."""
    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from indonesian_image_captioning_tpu.core.config import (
        BeamConfig, ModelConfig)
    from indonesian_image_captioning_tpu.core.prng import root_key
    from indonesian_image_captioning_tpu.decode.api import caption_beam_search
    from indonesian_image_captioning_tpu.models import encoders
    from indonesian_image_captioning_tpu.train import caption as caption_train
    from indonesian_image_captioning_tpu.train import steps
    from indonesian_image_captioning_tpu.train.steps import prep_images

    V = 6763
    cfg = ModelConfig(model_type="attention_scn", vocab_size=V,
                      dtype="bfloat16")
    opt = steps.make_optimizer(4e-4, 5.0)
    state = caption_train.init_state(root_key(0), cfg, opt)
    bf = jnp.bfloat16
    state = jax.device_put(jax.tree.map(
        lambda x: x.astype(bf)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, state))
    B = batch
    images = jax.device_put(np.random.default_rng(0).integers(
        0, 256, (B, 3, 256, 256), np.uint8))

    @jax.jit
    def serve(st, images_u8):
        x = prep_images(images_u8).astype(bf)
        enc_out = encoders.apply_encoder_caption(
            st["encoder"], st["encoder_stats"], x, train=False,
            enc_image_size=cfg.enc_image_size, arch=cfg.encoder_arch)[0]
        tags = encoders.apply_encoder_tagger(
            st["tagger"], st["tagger_stats"], x, train=False,
            arch=cfg.encoder_arch)[0]
        out = caption_beam_search(st["params"], cfg, enc_out.astype(bf),
                                  tags.astype(bf), start_id=V - 2,
                                  end_id=V - 1,
                                  beam_cfg=BeamConfig(beam_size=5))
        return out["sequences"], out["lengths"]

    jax.device_get(serve(state, images))  # compile + warm
    times = []
    for _ in range(30):
        t0 = time.time()
        jax.device_get(serve(state, images)[1])
        times.append((time.time() - t0) * 1e3)
    times.sort()
    p50 = times[len(times) // 2]
    p90 = times[int(len(times) * 0.9)]
    print(json.dumps({
        "metric": "serve_latency_ms_beam5",
        "value": round(p50, 2), "unit": "ms (p50, full 51-step worst case)",
        "p90_ms": round(p90, 2), "batch": B,
        "vs_baseline": round((16070 / B) / p50, 1),
    }))


def train_main(batch: int = 1024, decoder_dtype: str = "bfloat16"):
    """Cached-epoch caption train throughput (the production fused
    training-scan kernel pair, b1024 bf16): one full jitted train step —
    fused fwd+bwd scan kernels, vocab head, masked CE + alpha reg, clip,
    Adam — on precomputed encoder features.  vs_baseline is conservative:
    the reference CPU managed 32 imgs / 15.97 s = 2.0 imgs/s for the
    teacher-forced FORWARD alone (BASELINE.md), before loss/backward/Adam.
    """
    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import numpy as np
    from indonesian_image_captioning_tpu.core.config import (
        ModelConfig, TrainConfig)
    from indonesian_image_captioning_tpu.core.prng import root_key
    from indonesian_image_captioning_tpu.train import caption as caption_train
    from indonesian_image_captioning_tpu.train import steps

    V = 6763
    B = batch
    cfg = ModelConfig(model_type="attention_scn", vocab_size=V)
    opt = steps.make_optimizer(4e-4, 5.0)
    state = jax.device_put(caption_train.init_state(root_key(0), cfg, opt))
    tcfg = TrainConfig(batch_size=B, decoder_dtype=decoder_dtype)
    _, step = steps.make_caption_train_step(cfg, tcfg, opt, donate=False)

    rng = np.random.default_rng(0)
    enc = jax.device_put((rng.standard_normal(
        (B, cfg.enc_image_size, cfg.enc_image_size, cfg.encoder_dim)) * 0.1
        ).astype(np.float32))
    tags = jax.device_put(rng.random((B, 1000)).astype(np.float32))
    caps = jax.device_put(rng.integers(
        1, V, (B, cfg.max_caption_len)).astype(np.int32))
    caplens = jax.device_put(np.full((B,), 30, np.int32))
    key = jax.random.key(1)
    sub = {"params": state["params"], "opt_state": state["opt_state"]}

    def dispatch():
        return step(sub, enc, tags, caps, caplens, key)[1]["loss"]

    # compile + warm; sync on the SCALAR loss (fetching arrays through the
    # axon relay inflates the measurement; see BASELINE.md)
    loss = float(jax.device_get(dispatch()))
    assert np.isfinite(loss)

    steps_per_round = 3

    def round_fn():
        # async dispatch of the round's steps, one scalar sync at the end
        for _ in range(steps_per_round):
            out = dispatch()
        float(jax.device_get(out))

    med, lo, hi = _median_rounds(round_fn, rounds=5)
    dt = med / steps_per_round
    imgs_per_s = B / dt
    print(json.dumps({
        "metric": "train_images_per_sec_cached",
        "value": round(imgs_per_s, 1), "unit": "images/s",
        "step_ms": round(dt * 1e3, 1), "batch": B,
        "decoder_dtype": decoder_dtype,
        "vs_baseline": round(imgs_per_s / 2.004, 1),
        **_spread_fields(med, lo, hi, per=steps_per_round),
    }))


def load_main(rates=None, duration_s: float = 12.0):
    """Sustained OPEN-LOOP serving-under-load bench (VERDICT r4 #7): the
    micro-batching CaptionEngine (serve/engine.py) under Poisson arrivals
    at several offered rates.  Open-loop = arrivals do not wait for
    completions, so queueing delay shows up honestly in the latency tail.
    One JSON line per rate: achieved throughput, p50/p90/p99 latency, and
    the engine's batch-bucket histogram.  Reference counterpart: one
    blocking image per process (/root/reference/inference.py:52-165)."""
    import threading

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import numpy as np
    from indonesian_image_captioning_tpu.core.config import ModelConfig
    from indonesian_image_captioning_tpu.core.prng import root_key
    from indonesian_image_captioning_tpu.serve.engine import (CaptionEngine,
                                                              ServeConfig)
    from indonesian_image_captioning_tpu.train import caption as caption_train
    from indonesian_image_captioning_tpu.train import steps

    V = 6763
    cfg = ModelConfig(model_type="attention_scn", vocab_size=V,
                      dtype="bfloat16")
    opt = steps.make_optimizer(4e-4, 5.0)
    state = caption_train.init_state(root_key(0), cfg, opt)
    bf = jax.numpy.bfloat16
    state = jax.tree.map(
        lambda x: x.astype(bf)
        if jax.numpy.issubdtype(x.dtype, jax.numpy.floating) else x, state)
    wm = {f"w{i}": i for i in range(V - 3)}
    wm.update({"<unk>": V - 3, "<start>": V - 2, "<end>": V - 1,
               "<pad>": 0})
    engine = CaptionEngine(state, cfg, wm,
                           ServeConfig(batch_buckets=(1, 8, 32, 128),
                                       max_wait_ms=3.0, max_inflight=2))
    engine.warmup()

    pool = [np.random.default_rng(i).integers(0, 256, (3, 256, 256),
                                              np.uint8) for i in range(32)]
    if rates is None:
        rates = (50, 200, 600, 1200)
    for rate in rates:
        engine.stats.batches.clear()
        engine.start()
        results = []          # (t_submit, future)
        stop_flag = []

        lats = []
        lat_lock = threading.Lock()

        def submit_one(img):
            t_sub = time.monotonic()
            fut = engine.submit(img)

            def cb(_fut):
                # completion timestamp, not poll time: the callback runs
                # on the engine's resolution thread the moment the
                # request's batch lands
                with lat_lock:
                    lats.append((time.monotonic() - t_sub) * 1e3)

            fut.add_done_callback(cb)
            results.append((t_sub, fut))

        def submitter():
            rng = np.random.default_rng(7)
            t_end = time.monotonic() + duration_s
            i = 0
            while time.monotonic() < t_end and not stop_flag:
                submit_one(pool[i % len(pool)])
                i += 1
                time.sleep(rng.exponential(1.0 / rate))

        th = threading.Thread(target=submitter)
        t0 = time.monotonic()
        th.start()
        th.join(timeout=duration_s + 30)
        for _, fut in results:
            fut.result(timeout=120)
        t_total = time.monotonic() - t0
        engine.stop()
        lats.sort()
        n = len(lats)
        hist = {}
        for b in engine.stats.batches:
            hist[b] = hist.get(b, 0) + 1
        print(json.dumps({
            "metric": "serve_load_open_loop",
            "offered_rate_rps": rate,
            "value": round(n / t_total, 1), "unit": "req/s achieved",
            "n_requests": n,
            "p50_ms": round(lats[n // 2], 1),
            "p90_ms": round(lats[int(n * 0.9)], 1),
            "p99_ms": round(lats[min(int(n * 0.99), n - 1)], 1),
            "batch_hist": {str(k): v for k, v in sorted(hist.items())},
        }), flush=True)


def main(batch: int = 1024, model: str = "attention_scn"):
    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from indonesian_image_captioning_tpu.core.config import (
        BeamConfig, ModelConfig)
    from indonesian_image_captioning_tpu.decode.api import caption_beam_search
    from indonesian_image_captioning_tpu.models import decoders

    V = 6763  # flickr8k-id vocab (reference corpus_score.py:110-118)
    # bf16 params/activations (TPU-native serving precision)
    cfg = ModelConfig(model_type=model, vocab_size=V,
                      dtype="bfloat16")
    params = decoders.init_decoder(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    B = batch
    enc = (jax.random.normal(
        jax.random.key(1),
        (B, cfg.enc_image_size, cfg.enc_image_size, cfg.encoder_dim))
        * 0.1).astype(jnp.bfloat16)
    tags = jax.random.uniform(jax.random.key(2),
                              (B, cfg.semantic_dim)).astype(jnp.bfloat16)
    beam_cfg = BeamConfig(beam_size=5)

    def run():
        out = caption_beam_search(params, cfg, enc, tags, start_id=V - 2,
                                  end_id=V - 1, beam_cfg=beam_cfg)
        # hard sync: device_get (block_until_ready alone can return early
        # through the axon relay)
        return jax.device_get(out["lengths"])

    lens = run()  # compile + warm
    # sanity: worst case decode ran the full window
    assert int(lens[0]) == beam_cfg.max_steps + 1, (
        "expected full-length decode with random weights")

    med, lo, hi = _median_rounds(run, rounds=5)  # run() syncs via device_get
    cps = B / med

    line = {
        "metric": "captions_per_sec_beam5",
        "value": round(cps, 3),
        "unit": "captions/s",
        "vs_baseline": round(cps / REFERENCE_CPU_CAPTIONS_PER_SEC, 1),
        **_spread_fields(med, lo, hi),
    }
    if model != "attention_scn":
        line["model"] = model      # family benches (driver reads the default)
    print(json.dumps(line))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("all", "decode", "train", "e2e",
                                       "latency", "load"),
                    default="all",
                    help="all = decode headline line FIRST (schema "
                         "unchanged), then train + e2e lines (driver "
                         "default); decode = headline captions/s only; "
                         "train = cached-epoch train imgs/s; "
                         "e2e = uint8 image -> caption serving + MFU; "
                         "latency = single-request image -> caption ms")
    # saturation with the fused per-step kernel (decode_impl auto ->
    # "fused_step", 2026-08-17): 1024 -> 5243, 2048 -> 5799, 4096 -> 5691
    # captions/s.  2048 is the sweep optimum and compiles in ~1 min cold
    # (the 4096 program sporadically takes >15 min through the
    # remote-compile tunnel); warm runs via the persistent XLA cache
    # (~/.cache/iic_tpu_xla, core/runtime.py) complete in ~40 s.
    ap.add_argument("--batch", type=int, default=None,
                    help="default: 2048 for decode, 256 for e2e")
    # measured family throughput at b2048 bf16 (2026-08-17): attention_scn
    # 5799 - pure_attention 5906 - pure_scn 12280 captions/s
    ap.add_argument("--model", default="attention_scn",
                    choices=("attention_scn", "pure_attention", "pure_scn"),
                    help="decoder family for decode mode")
    args = ap.parse_args()
    if args.mode == "load":
        load_main()
    elif args.mode == "e2e":
        e2e_main(args.batch or 256)
    elif args.mode == "latency":
        latency_main(args.batch or 1)
    elif args.mode == "train":
        train_main(args.batch or 1024)
    elif args.mode == "decode":
        main(args.batch or 2048, args.model)
    else:  # all: headline decode line first, then train + e2e
        main(args.batch or 2048, args.model)
        train_main(1024)
        e2e_main(256)
