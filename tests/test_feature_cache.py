"""Frozen-feature cache (train/feature_cache.py).

The cache must be EXACT at cache_dtype="float32": cached rows are the
make_encoders_fn outputs, so cached training reproduces uncached training
bit-for-bit.  The reference has no such mode (it re-runs both ResNets for
every caption row of every epoch, trains/attention_scn.py:213-214) — this
is a framework addition gated on the frozen-encoder recipe.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from indonesian_image_captioning_tpu.core.config import (
    DataConfig, ModelConfig, TrainConfig)
from indonesian_image_captioning_tpu.data import preprocess


@pytest.fixture(scope="module")
def data_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    img_dir = root / "imgs"
    img_dir.mkdir()
    out = tmp_path_factory.mktemp("scn_data")
    rng = np.random.default_rng(3)
    words = ["kuda", "burung", "terbang", "di", "atas", "air"]

    filenames, captions, tags = [], [], []
    for i in range(7):  # odd count: exercises the overlapped tail batch
        name = f"{i:04d}.jpg"
        Image.fromarray(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
                        ).save(img_dir / name)
        filenames.append(name)
        captions.append([" ".join(rng.choice(words, 4).tolist())
                         for _ in range(2)])
        tags.append([rng.choice(["kuda", "burung"])])
    (root / "filenames.json").write_text(json.dumps(filenames))
    (root / "captions.json").write_text(json.dumps(captions))
    (root / "tags.json").write_text(json.dumps(tags))
    (root / "train.txt").write_text("\n".join(f"{i:04d}" for i in range(5)))
    (root / "val.txt").write_text("\n".join(f"{i:04d}" for i in range(5, 7)))
    (root / "test.txt").write_text("")
    (root / "all_tags.txt").write_text("kuda\nburung")

    preprocess.create_input_files(
        "flickr10k", str(root), str(img_dir), captions_per_image=2,
        min_word_freq=0, output_folder=str(out), tag_size=2, max_len=10,
        image_size=32)
    return DataConfig(data_folder=str(out),
                      data_name="flickr10k_2_cap_per_img_0_min_word_freq",
                      captions_per_image=2, image_size=32, tag_size=2)


def _setup(data_env, model_type="attention_scn"):
    from indonesian_image_captioning_tpu.core.prng import root_key
    from indonesian_image_captioning_tpu.data import vocab as vocab_lib
    from indonesian_image_captioning_tpu.train import caption as caption_train
    from indonesian_image_captioning_tpu.train import steps

    wm = vocab_lib.load_json(vocab_lib.wordmap_path(
        data_env.data_folder, data_env.data_name))
    cfg = ModelConfig(model_type=model_type, vocab_size=len(wm),
                      embed_dim=16, attention_dim=8, decoder_dim=16,
                      factored_dim=12, semantic_dim=2, enc_image_size=2,
                      max_caption_len=12, encoder_arch="resnet50")
    tcfg = TrainConfig(batch_size=4, cache_features=True)
    optimizer = steps.make_optimizer(tcfg.decoder_lr, tcfg.grad_clip)
    state = caption_train.init_state(root_key(0), cfg, optimizer)
    return cfg, tcfg, optimizer, state


def test_device_cache_rows_match_encoders_exactly(data_env):
    """cache.lookup(index) == make_encoders_fn output, bit for bit."""
    from indonesian_image_captioning_tpu.data import loader as loader_lib
    from indonesian_image_captioning_tpu.data.datasets import CaptionDataset
    from indonesian_image_captioning_tpu.train import feature_cache, steps

    cfg, tcfg, _, state = _setup(data_env)
    ds = CaptionDataset(data_env.data_folder, data_env.data_name, "TRAIN")
    cache = feature_cache.build(state, cfg, tcfg, ds, log=lambda *_: None)
    assert cache.on_device

    encode_fn = steps.make_encoders_fn(cfg, tcfg.encoder_dtype)
    for batch in loader_lib.iterate(ds, 4, shuffle=True, seed=1,
                                    with_index=True):
        want_f, want_t = encode_fn(state, batch)
        got_f, got_t = cache.lookup(batch["index"])
        np.testing.assert_array_equal(np.asarray(want_f), np.asarray(got_f))
        np.testing.assert_array_equal(np.asarray(want_t), np.asarray(got_t))


def test_host_cache_rows_match_encoders_exactly(data_env):
    """Budget exceeded -> host RAM cache; rows still exact, images dropped
    from the view's batches."""
    import dataclasses

    from indonesian_image_captioning_tpu.data import loader as loader_lib
    from indonesian_image_captioning_tpu.data.datasets import CaptionDataset
    from indonesian_image_captioning_tpu.train import feature_cache, steps

    cfg, tcfg, _, state = _setup(data_env)
    tcfg = dataclasses.replace(tcfg, cache_device_budget_gb=0.0)
    ds = CaptionDataset(data_env.data_folder, data_env.data_name, "TRAIN")
    cache = feature_cache.build(state, cfg, tcfg, ds, log=lambda *_: None)
    assert not cache.on_device
    view = cache.host_view(ds)

    # reference rows from a pristine dataset (the view disabled images)
    ds2 = CaptionDataset(data_env.data_folder, data_env.data_name, "TRAIN")
    encode_fn = steps.make_encoders_fn(cfg, tcfg.encoder_dtype)
    it_ref = loader_lib.iterate(ds2, 4, shuffle=True, seed=1)
    for batch in loader_lib.iterate(view, 4, shuffle=True, seed=1):
        assert "images" not in batch
        ref = next(it_ref)
        want_f, want_t = encode_fn(state, ref)
        np.testing.assert_array_equal(np.asarray(want_f),
                                      batch["features"])
        np.testing.assert_array_equal(np.asarray(want_t), batch["ftags"])


def test_cached_training_is_bit_identical(data_env):
    """A train step fed from the cache produces the identical loss/params
    trajectory as the uncached step."""
    import jax

    from indonesian_image_captioning_tpu.data import loader as loader_lib
    from indonesian_image_captioning_tpu.data.datasets import CaptionDataset
    from indonesian_image_captioning_tpu.train import feature_cache, steps

    cfg, tcfg, optimizer, state = _setup(data_env)
    ds = CaptionDataset(data_env.data_folder, data_env.data_name, "TRAIN")
    cache = feature_cache.build(state, cfg, tcfg, ds, log=lambda *_: None)
    encode_fn, step = steps.make_caption_train_step(cfg, tcfg, optimizer,
                                                    donate=False)

    losses = {}
    for mode in ("direct", "cached"):
        sub = {"params": jax.tree.map(lambda x: x, state["params"]),
               "opt_state": optimizer.init(state["params"])}
        hist = []
        for i, batch in enumerate(loader_lib.iterate(
                ds, 4, shuffle=True, seed=2, with_index=True)):
            if mode == "cached":
                enc_out, tags = cache.lookup(batch["index"])
            else:
                enc_out, tags = encode_fn(state, batch)
            sub, m = step(sub, enc_out, tags, batch["captions"],
                          batch["caplens"], jax.random.key(i))
            hist.append(float(m["loss"]))
        losses[mode] = hist
    assert losses["direct"] == losses["cached"], losses


def test_bf16_cache_close(data_env):
    """bfloat16 cache rounds once; losses stay close to f32."""
    import dataclasses

    import jax

    from indonesian_image_captioning_tpu.data import loader as loader_lib
    from indonesian_image_captioning_tpu.data.datasets import CaptionDataset
    from indonesian_image_captioning_tpu.train import feature_cache, steps

    cfg, tcfg, optimizer, state = _setup(data_env)
    tcfg16 = dataclasses.replace(tcfg, cache_dtype="bfloat16")
    ds = CaptionDataset(data_env.data_folder, data_env.data_name, "TRAIN")
    cache = feature_cache.build(state, cfg, tcfg16, ds, log=lambda *_: None)
    encode_fn, step = steps.make_caption_train_step(cfg, tcfg, optimizer,
                                                    donate=False)
    batch = next(iter(loader_lib.iterate(ds, 4, with_index=True)))
    enc_a, tags_a = encode_fn(state, batch)
    enc_b, tags_b = cache.lookup(batch["index"])
    assert enc_b.dtype == enc_a.dtype  # lookup returns f32 regardless
    sub = {"params": state["params"],
           "opt_state": optimizer.init(state["params"])}
    _, ma = step(sub, enc_a, tags_a, batch["captions"], batch["caplens"],
                 jax.random.key(0))
    _, mb = step(sub, enc_b, tags_b, batch["captions"], batch["caplens"],
                 jax.random.key(0))
    la, lb = float(ma["loss"]), float(mb["loss"])
    assert abs(la - lb) < 0.02 * abs(la) + 0.02, (la, lb)


def test_trainer_main_with_cache(data_env, tmp_path):
    """End-to-end trainer run with cache_features=True (device path):
    trains, validates and checkpoints normally."""
    import dataclasses

    from indonesian_image_captioning_tpu.train import caption as caption_train

    cfg, tcfg, _, _ = _setup(data_env)
    tcfg = dataclasses.replace(tcfg, epochs=1, print_freq=1,
                               checkpoint_dir=str(tmp_path))
    logs = []
    state, summary = caption_train.main("attention_scn", data_env, tcfg,
                                        model_cfg=cfg, log=logs.append)
    assert any("feature cache [TRAIN]" in l for l in logs)
    assert any("feature cache [VAL]" in l for l in logs)
    assert any("BLEU-4" in l for l in logs)
    name = f"checkpoint_attention_scn_{data_env.data_name}"
    assert os.path.isdir(tmp_path / name)


def test_trainer_main_cache_host_fallback(data_env, tmp_path):
    """Budget 0 -> host view path through the same trainer."""
    import dataclasses

    from indonesian_image_captioning_tpu.train import caption as caption_train

    cfg, tcfg, _, _ = _setup(data_env)
    tcfg = dataclasses.replace(tcfg, epochs=1, print_freq=1,
                               cache_device_budget_gb=0.0,
                               checkpoint_dir=str(tmp_path))
    logs = []
    caption_train.main("attention_scn", data_env, tcfg, model_cfg=cfg,
                       log=logs.append)
    assert any("host RAM" in l for l in logs)
    assert any("BLEU-4" in l for l in logs)


def test_cache_rejects_fine_tune(data_env):
    import dataclasses

    import pytest as _pytest

    from indonesian_image_captioning_tpu.train import caption as caption_train

    cfg, tcfg, _, _ = _setup(data_env)
    tcfg = dataclasses.replace(tcfg, fine_tune_encoder=True, epochs=1)
    with _pytest.raises(ValueError, match="frozen encoder"):
        caption_train.main("attention_scn", data_env, tcfg, model_cfg=cfg,
                           log=lambda *_: None)


def test_cli_flag_parses():
    from indonesian_image_captioning_tpu.cli.train import (
        _override, build_parser)

    args = build_parser().parse_args(
        ["-t", "attention_scn", "--cache_features",
         "--cache_dtype", "bfloat16"])
    tcfg = _override(TrainConfig(), args)
    assert tcfg.cache_features and tcfg.cache_dtype == "bfloat16"
    args = build_parser().parse_args(["-t", "attention_scn"])
    tcfg = _override(TrainConfig(), args)
    assert not tcfg.cache_features
