"""Smoke tests for the examples/ scripts (the reference's notebook
equivalents — notebooks/tagger.ipynb, viz_attention_scn.ipynb etc.) so the
manual-QA surface runs under pytest instead of hand-only verification.

Flagship dims with random weights over the REAL CLI paths: checkpoints are
canonical orbax dirs, the image is a generated PNG, and the attention
example must write the attention-grid PNG artifact.
"""

import importlib.util
import json
import os
import sys

import jax
import numpy as np
import pytest

from indonesian_image_captioning_tpu.core import checkpoint as ckpt_lib
from indonesian_image_captioning_tpu.core.config import ModelConfig, TaggerConfig
from indonesian_image_captioning_tpu.models import decoders, encoders

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_example(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "examples", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def example_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("examples")
    from PIL import Image
    rng = np.random.default_rng(7)
    img_path = str(root / "image.png")
    Image.fromarray(rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
                    ).save(img_path)

    words = [f"w{i}" for i in range(46)] + ["<start>", "<end>", "<unk>",
                                            "<pad>"]
    word_map = {w: i + 1 for i, w in enumerate(words) if w != "<pad>"}
    word_map["<pad>"] = 0
    wm_path = str(root / "WORDMAP.json")
    json.dump(word_map, open(wm_path, "w"))

    cfg = ModelConfig(model_type="attention_scn", vocab_size=len(word_map))
    tag_map = {f"tag{i}": i for i in range(cfg.semantic_dim)}
    tm_path = str(root / "TAGMAP.json")
    json.dump(tag_map, open(tm_path, "w"))

    key = jax.random.key(0)
    tp, ts = encoders.init_encoder_tagger(
        key, TaggerConfig(semantic_size=cfg.semantic_dim),
        arch=cfg.encoder_arch)
    tagger_dir = str(root / "tagger_ckpt")
    ckpt_lib.save_pytree(tagger_dir, {"state": {"tagger": tp,
                                                "tagger_stats": ts}})

    ep, es = encoders.init_encoder_caption(key, arch=cfg.encoder_arch)
    params = decoders.init_decoder(key, cfg)
    caption_dir = str(root / "caption_ckpt")
    ckpt_lib.save_pytree(caption_dir, {"state": {
        "params": params, "encoder": ep, "encoder_stats": es,
        "tagger": tp, "tagger_stats": ts}})

    return dict(img=img_path, word_map=wm_path, tag_map=tm_path,
                tagger=tagger_dir, caption=caption_dir)


def test_tagger_topk_example(example_env, capsys):
    mod = _load_example("tagger_topk")
    mod.main(["--img", example_env["img"],
              "--model_tagger", example_env["tagger"],
              "--tag_map", example_env["tag_map"], "--topk", "5"])
    out = capsys.readouterr().out
    assert "tag" in out


def test_caption_and_visualize_example(example_env, capsys, tmp_path):
    viz_out = str(tmp_path / "att.png")
    mod = _load_example("caption_and_visualize")
    mod.main(["-t", "attention_scn", "-i", example_env["img"],
              "-mc", example_env["caption"],
              "-mt", example_env["tagger"],
              "-tm", example_env["tag_map"],
              "-wm", example_env["word_map"], "-b", "2",
              "--viz_out", viz_out])
    out = capsys.readouterr().out
    assert "Caption:" in out
    assert os.path.exists(viz_out)   # the attention grid PNG artifact
