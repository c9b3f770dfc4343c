"""Multi-chip dry run: the PUBLIC mesh training path on tiny shapes.

Runs ``train.caption.main`` — the exact code ``python train.py -t
attention_scn --mesh d,m`` runs — over an (data, model) device mesh with a
synthetic corpus: real preprocessing artifacts, real loader with sharded
device_put, real SPMD train step with DP batch sharding + TP vocab sharding,
real validation/checkpointing.  Nothing here is dryrun-private parallel
logic.

Intended for N virtual CPU devices
(``XLA_FLAGS=--xla_force_host_platform_device_count=N``); the driver
validates the multi-chip sharding this way without N real TPU chips.
"""

from __future__ import annotations

import math
import os
import tempfile


def force_cpu_devices(n_devices: int) -> None:
    """Force an n-device CPU platform.  Must run before JAX initialises a
    backend; raises if one is already live with too few devices."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    # wins over sitecustomize-pinned platforms as long as no backend is up
    jax.config.update("jax_platforms", "cpu")
    # reuse compiled executables across dryrun invocations (same program +
    # topology + jaxlib -> same key); must be config.update, not env vars
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    n = len(jax.devices())
    if n < n_devices:
        raise RuntimeError(
            f"CPU platform has {n} devices, need {n_devices}; a backend was "
            f"initialised before force_cpu_devices() — run in a fresh "
            f"process (see __graft_entry__.dryrun_multichip)")


def run(n_devices: int, model_par: int | None = None) -> float:
    """All three public surfaces on an (n_devices/model_par, model_par)
    mesh: one epoch of DP+TP caption training, mesh-sharded TEST-split
    eval (``eval_caption.py --mesh``), and a serve-engine smoke on the
    trained state.  Returns the train loss."""
    import jax
    import numpy as np

    from ..core.config import BeamConfig, ModelConfig, TrainConfig
    from ..data.synthetic import make_synthetic_corpus
    from ..data import vocab as vocab_lib
    from ..train import caption as caption_train

    if model_par is None:
        model_par = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    mesh_shape = (n_devices // model_par, model_par)

    with tempfile.TemporaryDirectory() as tmp:
        data_cfg = make_synthetic_corpus(
            os.path.join(tmp, "corpus"), os.path.join(tmp, "scn_data"),
            n_images=2 * n_devices, n_train=max(n_devices, 4),
            image_size=32)
        wm = vocab_lib.load_json(vocab_lib.wordmap_path(
            data_cfg.data_folder, data_cfg.data_name))
        assert len(wm) % model_par == 0, (len(wm), model_par)
        cfg = ModelConfig(model_type="attention_scn", vocab_size=len(wm),
                          embed_dim=32, attention_dim=32, decoder_dim=32,
                          factored_dim=16, semantic_dim=2, enc_image_size=2,
                          max_caption_len=12, encoder_arch="resnet50")
        tcfg = TrainConfig(epochs=1, batch_size=max(n_devices, 4),
                           print_freq=1, mesh_shape=mesh_shape,
                           checkpoint_dir=os.path.join(tmp, "ckpt"))
        os.makedirs(tcfg.checkpoint_dir, exist_ok=True)
        state, summary = caption_train.main("attention_scn", data_cfg, tcfg,
                                            model_cfg=cfg)
        loss = float(summary["train_loss"])
        if not math.isfinite(loss):
            raise RuntimeError(f"non-finite train loss {loss}")

        # -- surface 2: mesh-sharded TEST eval (cli/eval_caption --mesh) --
        from ..evaluation import eval_caption
        beam_cfg = BeamConfig(beam_size=3, max_steps=cfg.max_caption_len)
        scores = eval_caption.evaluate(
            state, cfg, data_cfg, wm, beam_cfg=beam_cfg,
            batch_size=n_devices, output_root=None, mesh_shape=mesh_shape,
            log=lambda *_: None)
        bleu4 = float(scores["Bleu_4"])
        if not math.isfinite(bleu4):
            raise RuntimeError(f"non-finite eval BLEU-4 {bleu4}")

        # -- surface 3: serve-engine smoke on the trained state (the mesh
        # state gathers to host; the engine runs its own jitted pipeline) --
        from ..serve.engine import CaptionEngine, ServeConfig
        host_state = jax.tree.map(
            np.asarray, {k: state[k] for k in (
                "params", "encoder", "encoder_stats", "tagger",
                "tagger_stats")})
        engine = CaptionEngine(
            host_state, cfg, wm,
            ServeConfig(batch_buckets=(2, 4), beam_size=3,
                        max_steps=cfg.max_caption_len, max_wait_ms=5))
        engine.start()
        try:
            rng = np.random.default_rng(0)
            futs = [engine.submit(
                rng.integers(0, 255, (3, 32, 32), np.uint8).astype(np.uint8))
                for _ in range(5)]
            served = [f.result(timeout=300) for f in futs]
        finally:
            engine.stop()
        if len(served) != 5 or any(s is None for s in served):
            raise RuntimeError(f"serve smoke failed: {served}")

    print(f"dryrun_multichip(n={n_devices}): "
          f"mesh={{'data': {mesh_shape[0]}, 'model': {mesh_shape[1]}}} "
          f"devices={len(jax.devices())} loss={loss:.4f} "
          f"eval_bleu4={bleu4:.4f} served={len(served)} OK")
    return loss
