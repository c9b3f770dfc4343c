"""End-to-end smoke training on synthetic data (SURVEY.md §4c).

Tiny corpus -> preprocess -> trainer main() for the tagger and a caption
model; asserts the loss moves, checkpoints land on disk with reference
naming, and resume restores state.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

import indonesian_image_captioning_tpu.core.config as config
from indonesian_image_captioning_tpu.core.config import (
    DataConfig, ModelConfig, TaggerConfig, TrainConfig, tagger_train_config)
from indonesian_image_captioning_tpu.data import preprocess


@pytest.fixture(scope="module")
def data_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    img_dir = root / "imgs"
    img_dir.mkdir()
    out = tmp_path_factory.mktemp("scn_data")
    rng = np.random.default_rng(0)
    words = ["anjing", "kucing", "bermain", "di", "taman", "bola", "anak"]

    filenames, captions, tags = [], [], []
    for i in range(8):
        name = f"{i:04d}.jpg"
        Image.fromarray(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
                        ).save(img_dir / name)
        filenames.append(name)
        captions.append([" ".join(rng.choice(words, 4).tolist())
                         for _ in range(2)])
        tags.append([rng.choice(["anjing", "kucing"])])
    (root / "filenames.json").write_text(json.dumps(filenames))
    (root / "captions.json").write_text(json.dumps(captions))
    (root / "tags.json").write_text(json.dumps(tags))
    (root / "train.txt").write_text("\n".join(f"{i:04d}" for i in range(6)))
    (root / "val.txt").write_text("\n".join(f"{i:04d}" for i in range(6, 8)))
    (root / "test.txt").write_text("")
    (root / "all_tags.txt").write_text("anjing\nkucing")

    preprocess.create_input_files(
        "flickr10k", str(root), str(img_dir), captions_per_image=2,
        min_word_freq=0, output_folder=str(out), tag_size=2, max_len=10,
        image_size=32)
    return DataConfig(data_folder=str(out),
                      data_name="flickr10k_2_cap_per_img_0_min_word_freq",
                      captions_per_image=2, image_size=32, tag_size=2)


def test_tagger_trainer_end_to_end(data_env, tmp_path):
    from indonesian_image_captioning_tpu.train import tagger as tagger_train

    tcfg = tagger_train_config(epochs=2, batch_size=4, print_freq=1,
                               checkpoint_dir=str(tmp_path))
    tagger_cfg = TaggerConfig(semantic_size=2, encoder_arch="resnet50")
    logs = []
    state, summary = tagger_train.main(data_env, tcfg, tagger_cfg,
                                       log=logs.append)
    name = f"checkpoint_tagger_{data_env.data_name}"
    assert os.path.isdir(tmp_path / name)
    # BEST_* only lands on strict improvement over 0.0 (reference
    # trains/tagger.py:116-129 semantics) — tiny random data may never improve
    if summary["best_metric"] > 0.0:
        assert os.path.isdir(tmp_path / ("BEST_" + name))
    assert 0.0 <= summary["best_metric"] <= 100.0

    # resume continues from epoch 2 (i.e. does nothing more at epochs=2)
    state2, summary2 = tagger_train.main(data_env, tcfg, tagger_cfg,
                                         resume=True, log=logs.append)
    assert summary2["best_metric"] >= 0.0


@pytest.mark.parametrize("model_type", ["pure_scn", "attention_scn",
                                        "pure_attention"])
def test_caption_trainer_end_to_end(data_env, tmp_path, model_type):
    from indonesian_image_captioning_tpu.data import vocab as vocab_lib
    from indonesian_image_captioning_tpu.train import caption as caption_train

    wm = vocab_lib.load_json(vocab_lib.wordmap_path(
        data_env.data_folder, data_env.data_name))
    cfg = ModelConfig(model_type=model_type, vocab_size=len(wm),
                      embed_dim=16, attention_dim=16, decoder_dim=16,
                      factored_dim=12, semantic_dim=2, enc_image_size=2,
                      max_caption_len=12, encoder_arch="resnet50")
    tcfg = TrainConfig(epochs=1, batch_size=4, print_freq=1,
                       checkpoint_dir=str(tmp_path / model_type))
    logs = []
    state, summary = caption_train.main(
        model_type, data_env, tcfg, model_cfg=cfg, log=logs.append)
    name = f"checkpoint_{model_type}_{data_env.data_name}"
    assert os.path.isdir(tmp_path / model_type / name)
    # loss was finite and training ran
    assert any("Epoch: [0]" in l for l in logs)
    assert any("BLEU-4" in l for l in logs)


def test_caption_loss_decreases(data_env):
    """Several steps on one batch must reduce the loss (learning sanity)."""
    import jax
    from indonesian_image_captioning_tpu.core.prng import root_key
    from indonesian_image_captioning_tpu.data import vocab as vocab_lib
    from indonesian_image_captioning_tpu.data.datasets import CaptionDataset
    from indonesian_image_captioning_tpu.data import loader as loader_lib
    from indonesian_image_captioning_tpu.train import caption as caption_train
    from indonesian_image_captioning_tpu.train import steps

    wm = vocab_lib.load_json(vocab_lib.wordmap_path(
        data_env.data_folder, data_env.data_name))
    cfg = ModelConfig(model_type="pure_scn", vocab_size=len(wm),
                      embed_dim=16, decoder_dim=16, factored_dim=12,
                      semantic_dim=2, enc_image_size=2, max_caption_len=12,
                      encoder_arch="resnet50")
    tcfg = TrainConfig(batch_size=4, decoder_lr=1e-2)
    optimizer = steps.make_optimizer(tcfg.decoder_lr, tcfg.grad_clip)
    state = caption_train.init_state(root_key(0), cfg, optimizer)
    ds = CaptionDataset(data_env.data_folder, data_env.data_name, "TRAIN")
    batch = next(iter(loader_lib.iterate(ds, 4)))
    encode_fn, step = steps.make_caption_train_step(cfg, tcfg, optimizer,
                                                    donate=False)
    enc_out, tags = encode_fn(state, batch)
    sub = {"params": state["params"], "opt_state": state["opt_state"]}
    losses = []
    for i in range(8):
        sub, m = step(sub, enc_out, tags, batch["captions"],
                      batch["caplens"], jax.random.key(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses


def test_caption_loss_decreases_mixed_precision(data_env):
    """decoder_dtype="bfloat16" (bf16 compute, f32 master weights): the
    step must still learn, params/grads stay f32, and the first-step loss
    must be close to the f32 path's."""
    import jax
    import jax.numpy as jnp
    from indonesian_image_captioning_tpu.core.prng import root_key
    from indonesian_image_captioning_tpu.data import vocab as vocab_lib
    from indonesian_image_captioning_tpu.data.datasets import CaptionDataset
    from indonesian_image_captioning_tpu.data import loader as loader_lib
    from indonesian_image_captioning_tpu.train import caption as caption_train
    from indonesian_image_captioning_tpu.train import steps

    wm = vocab_lib.load_json(vocab_lib.wordmap_path(
        data_env.data_folder, data_env.data_name))
    cfg = ModelConfig(model_type="attention_scn", vocab_size=len(wm),
                      embed_dim=16, decoder_dim=16, factored_dim=12,
                      attention_dim=8, semantic_dim=2, enc_image_size=2,
                      max_caption_len=12, encoder_arch="resnet50")
    optimizer = steps.make_optimizer(1e-2, 5.0)
    state = caption_train.init_state(root_key(0), cfg, optimizer)
    ds = CaptionDataset(data_env.data_folder, data_env.data_name, "TRAIN")
    batch = next(iter(loader_lib.iterate(ds, 4)))

    first = {}
    for dtype in ("float32", "bfloat16"):
        tcfg = TrainConfig(batch_size=4, decoder_lr=1e-2,
                           decoder_dtype=dtype)
        encode_fn, step = steps.make_caption_train_step(
            cfg, tcfg, optimizer, donate=False)
        enc_out, tags = encode_fn(state, batch)
        sub = {"params": jax.tree.map(lambda x: x, state["params"]),
               "opt_state": state["opt_state"]}
        hist = []
        for i in range(8):
            sub, m = step(sub, enc_out, tags, batch["captions"],
                          batch["caplens"], jax.random.key(i))
            hist.append(float(m["loss"]))
        first[dtype] = hist[0]
        assert hist[-1] < hist[0] * 0.9, (dtype, hist)
        assert all(jnp.issubdtype(x.dtype, jnp.floating) is False
                   or x.dtype == jnp.float32
                   for x in jax.tree.leaves(sub["params"])), \
            "master params must stay f32"
    # bf16 compute rounds activations but the loss must be in the same
    # ballpark as f32 on the first step
    assert abs(first["bfloat16"] - first["float32"]) \
        < 0.05 * abs(first["float32"]) + 0.05, first


def test_tagger_loss_decreases_mixed_precision(data_env):
    """tagger_dtype="bfloat16" (bf16 ResNet fwd/bwd, f32 master weights):
    the tagger step must still learn, master params AND BatchNorm running
    stats stay f32, and the first-step loss must be close to the f32
    path's (the tagger trains the encoder itself, so this is the
    trained-model analogue of decoder_dtype)."""
    import jax
    import jax.numpy as jnp
    from indonesian_image_captioning_tpu.core.prng import root_key
    from indonesian_image_captioning_tpu.data.datasets import TagDataset
    from indonesian_image_captioning_tpu.data import loader as loader_lib
    from indonesian_image_captioning_tpu.train import tagger as tagger_train
    from indonesian_image_captioning_tpu.train import steps

    tagger_cfg = TaggerConfig(semantic_size=2, encoder_arch="resnet50")
    optimizer = steps.make_optimizer(1e-3, 5.0)
    ds = TagDataset(data_env.data_folder, data_env.data_name, "TRAIN")
    batch = next(iter(loader_lib.iterate(ds, 4)))

    first = {}
    for dtype in ("float32", "bfloat16"):
        tcfg = TrainConfig(batch_size=4, decoder_lr=1e-3, tagger_dtype=dtype)
        state = tagger_train.init_state(root_key(0), tcfg, tagger_cfg,
                                        optimizer)
        step = steps.make_tagger_train_step(tcfg, optimizer,
                                            dropout_rate=0.0,
                                            arch="resnet50", donate=False)
        hist = []
        for i in range(8):
            state, m = step(state, batch, jax.random.key(i))
            hist.append(float(m["loss"]))
        first[dtype] = hist[0]
        assert hist[-1] < hist[0], (dtype, hist)
        for x in jax.tree.leaves(state["params"]):
            if jnp.issubdtype(x.dtype, jnp.floating):
                assert x.dtype == jnp.float32, "master params must stay f32"
        for x in jax.tree.leaves(state["stats"]):
            assert x.dtype == jnp.float32, \
                "BN running stats are f32 master state"
    # bf16 rounds the conv stack's activations but train-mode BN keeps the
    # scale controlled: same-ballpark first-step BCE as the f32 path
    assert abs(first["bfloat16"] - first["float32"]) \
        < 0.05 * abs(first["float32"]) + 0.05, first


def test_tagger_encoder_remat_matches(data_env):
    """encoder_remat=True (rematerialised bottleneck backward) must be a
    pure memory/scheduling change: same loss and same updated params as
    the default path."""
    import jax
    import numpy as np
    from indonesian_image_captioning_tpu.core.prng import root_key
    from indonesian_image_captioning_tpu.data.datasets import TagDataset
    from indonesian_image_captioning_tpu.data import loader as loader_lib
    from indonesian_image_captioning_tpu.train import tagger as tagger_train
    from indonesian_image_captioning_tpu.train import steps

    tagger_cfg = TaggerConfig(semantic_size=2, encoder_arch="resnet50")
    optimizer = steps.make_optimizer(1e-3, 5.0)
    ds = TagDataset(data_env.data_folder, data_env.data_name, "TRAIN")
    batch = next(iter(loader_lib.iterate(ds, 4)))

    import jax.numpy as jnp
    from indonesian_image_captioning_tpu.models import encoders
    from indonesian_image_captioning_tpu.ops import losses as losses_lib

    tcfg = TrainConfig(batch_size=4)
    state = tagger_train.init_state(root_key(0), tcfg, tagger_cfg, optimizer)
    images = steps.prep_images(batch["images"])

    def loss_fn(params, remat):
        probs, _ = encoders.apply_encoder_tagger(
            params, state["stats"], images, train=True,
            dropout_rng=jax.random.key(3), dropout_rate=0.15,
            arch="resnet50", remat=remat)
        return losses_lib.bce_loss(probs, batch["tags"])

    results = {remat: jax.value_and_grad(loss_fn)(state["params"], remat)
               for remat in (False, True, "convs")}
    for remat in (True, "convs"):
        assert abs(float(results[remat][0] - results[False][0])) < 1e-6
        # gradients agree up to float reassociation of the recomputed
        # backward
        for (path, a), b in zip(
                jax.tree_util.tree_leaves_with_path(results[False][1]),
                jax.tree.leaves(results[remat][1])):
            scale = float(jnp.abs(a).max())
            if scale == 0.0:
                assert float(jnp.abs(b).max()) == 0.0
                continue
            rel = float(jnp.abs(a - b).max()) / scale
            assert rel < 1e-3, f"{remat} {jax.tree_util.keystr(path)}: " \
                               f"rel={rel}"


def _adam_count(opt_state) -> int:
    """Step count inside the (clamp, inject(adam)) optax chain state."""
    from indonesian_image_captioning_tpu.train.steps import is_inject_state
    for s in opt_state:
        if is_inject_state(s):
            return int(s.inner_state[0].count)
    raise AssertionError("no inject state found")


def test_finetune_resume_preserves_encoder_opt_state(data_env, tmp_path):
    """Resuming a fine_tune_encoder run must restore the encoder's Adam
    moments/step count instead of silently re-initialising them
    (round-1 VERDICT weak #6)."""
    from indonesian_image_captioning_tpu.data import vocab as vocab_lib
    from indonesian_image_captioning_tpu.train import caption as caption_train

    wm = vocab_lib.load_json(vocab_lib.wordmap_path(
        data_env.data_folder, data_env.data_name))
    cfg = ModelConfig(model_type="pure_scn", vocab_size=len(wm),
                      embed_dim=16, decoder_dim=16, factored_dim=12,
                      semantic_dim=2, enc_image_size=2, max_caption_len=12,
                      encoder_arch="resnet50")
    tcfg = TrainConfig(epochs=1, batch_size=4, print_freq=1,
                       fine_tune_encoder=True, checkpoint_dir=str(tmp_path))
    state1, _ = caption_train.main("pure_scn", data_env, tcfg, model_cfg=cfg)
    n_train_steps = _adam_count(state1["enc_opt_state"])
    assert n_train_steps > 0

    tcfg2 = dataclasses_replace(tcfg, epochs=2)
    state2, _ = caption_train.main("pure_scn", data_env, tcfg2,
                                   model_cfg=cfg, resume=True)
    # epoch 1 ran on top of the restored epoch-0 state: counts accumulate
    assert _adam_count(state2["enc_opt_state"]) == 2 * n_train_steps
    assert _adam_count(state2["opt_state"]) == 2 * n_train_steps


def dataclasses_replace(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)


def test_encoder_bn_calibration_converges_eval_to_train(data_env):
    """At random init, eval-mode BN running stats (0, 1) make the frozen
    encoder's eval output wildly different from its train-mode output (for
    ResNet-152 depth, exponentially exploded — TrainConfig.
    calibrate_encoder_stats docstring).  EMA calibration passes must drive
    the eval-mode output to the train-mode (batch-stat) output."""
    import jax
    import jax.numpy as jnp
    from indonesian_image_captioning_tpu.core.prng import root_key
    from indonesian_image_captioning_tpu.data.datasets import CaptionDataset
    from indonesian_image_captioning_tpu.data import loader as loader_lib
    from indonesian_image_captioning_tpu.models import encoders
    from indonesian_image_captioning_tpu.train.steps import prep_images

    params, stats = encoders.init_encoder_caption(root_key(7),
                                                  arch="resnet50")
    ds = CaptionDataset(data_env.data_folder, data_env.data_name, "TRAIN")
    # DISTINCT images: calibration needs batch diversity — duplicated rows
    # drive deep-layer batch variances to ~1e-8 where the post-BN gain
    # (capped at rsqrt(eps) ~ 316 per layer) amplifies trace-level float
    # reassociation between the train and eval programs without bound
    x = prep_images(np.stack([ds.image(i) for i in range(4)]))

    apply = jax.jit(lambda s, train: encoders.apply_encoder_caption(
        params, s, x, train=train, enc_image_size=2, arch="resnet50"),
        static_argnums=1)
    train_out = np.asarray(apply(stats, True)[0])

    def eval_err(s):
        out = np.asarray(apply(s, False)[0])
        return float(np.linalg.norm(out - train_out)
                     / np.linalg.norm(train_out))

    before = eval_err(stats)
    # ONE calibrate pass assigns the biased batch stats: eval-mode on the
    # same batch then reproduces the train-mode normalisation
    calibrated = apply(stats, "calibrate")[1]
    after = eval_err(calibrated)
    assert before > 0.5, before           # uncalibrated eval is way off
    assert after < 0.05, (before, after)  # calibrated eval ~= train output
