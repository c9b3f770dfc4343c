"""Device-resident image store (data/device_store.py): HBM-resident uint8
images gathered by index replace the per-step host->device pixel copy.
Must be bit-identical to the host loader path."""

import json

import numpy as np
import pytest
from PIL import Image

from indonesian_image_captioning_tpu.core.config import (
    DataConfig, ModelConfig, TaggerConfig, TrainConfig, tagger_train_config)
from indonesian_image_captioning_tpu.data import device_store, preprocess
from indonesian_image_captioning_tpu.data.datasets import TagDataset


class _FakeDs:
    def __init__(self, images):
        self._images = images
        self.num_images = images.shape[0]
        self.load_images = True


def test_lookup_matches_host_gather():
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (7, 3, 8, 8), np.uint8)
    store = device_store.DeviceImageStore(images)
    idx = np.array([6, 0, 3, 3, 1])
    np.testing.assert_array_equal(np.asarray(store.lookup(idx)), images[idx])
    # caption indices: row i uses image i // cpi
    cap_idx = np.array([0, 5, 13, 9])
    np.testing.assert_array_equal(
        np.asarray(store.lookup(cap_idx, cpi=2)), images[cap_idx // 2])


def test_build_budget_fallback_and_required():
    images = np.zeros((4, 3, 16, 16), np.uint8)
    logs = []
    assert device_store.build(_FakeDs(images), budget_bytes=10,
                              log=logs.append) is None
    assert "exceeds" in logs[-1]
    store = device_store.build(_FakeDs(images), budget_bytes=1 << 20,
                               log=logs.append)
    assert store is not None and store.nbytes == images.nbytes

    tcfg = TrainConfig(device_images="on", device_images_budget_gb=1e-9)
    with pytest.raises(ValueError):
        device_store.build_pair(tcfg, _FakeDs(images), _FakeDs(images))

    tcfg = TrainConfig(device_images="off")
    assert device_store.build_pair(tcfg, _FakeDs(images),
                                   _FakeDs(images)) == (None, None)


@pytest.fixture(scope="module")
def data_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    img_dir = root / "imgs"
    img_dir.mkdir()
    out = tmp_path_factory.mktemp("scn_data")
    rng = np.random.default_rng(1)
    words = ["merah", "biru", "kotak", "bulat", "besar"]
    filenames, captions, tags = [], [], []
    for i in range(6):
        name = f"{i:04d}.jpg"
        Image.fromarray(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
                        ).save(img_dir / name)
        filenames.append(name)
        captions.append([" ".join(rng.choice(words, 3).tolist())
                         for _ in range(2)])
        tags.append([rng.choice(["merah", "biru"])])
    (root / "filenames.json").write_text(json.dumps(filenames))
    (root / "captions.json").write_text(json.dumps(captions))
    (root / "tags.json").write_text(json.dumps(tags))
    (root / "train.txt").write_text("\n".join(f"{i:04d}" for i in range(4)))
    (root / "val.txt").write_text("\n".join(f"{i:04d}" for i in range(4, 6)))
    (root / "test.txt").write_text("")
    (root / "all_tags.txt").write_text("merah\nbiru")
    preprocess.create_input_files(
        "flickr10k", str(root), str(img_dir), captions_per_image=2,
        min_word_freq=0, output_folder=str(out), tag_size=2, max_len=10,
        image_size=32)
    return DataConfig(data_folder=str(out),
                      data_name="flickr10k_2_cap_per_img_0_min_word_freq",
                      captions_per_image=2, image_size=32, tag_size=2)


def _tagger_losses(data_env, tmp_path, mode, mesh=(1, 1), batch=4):
    from indonesian_image_captioning_tpu.train import tagger as tagger_train
    tcfg = tagger_train_config(epochs=1, batch_size=batch, print_freq=1,
                               checkpoint_dir=str(tmp_path),
                               device_images=mode, mesh_shape=mesh)
    logs = []
    _, summary = tagger_train.main(
        data_env, tcfg, TaggerConfig(semantic_size=2,
                                     encoder_arch="resnet50"),
        log=logs.append)
    return summary, logs


def test_tagger_training_bit_identical_with_store(data_env, tmp_path):
    s_off, _ = _tagger_losses(data_env, tmp_path / "off", "off")
    s_on, logs = _tagger_losses(data_env, tmp_path / "on", "on")
    assert any("resident in HBM" in ln for ln in logs)
    assert s_on["train_loss"] == s_off["train_loss"]
    assert s_on["best_metric"] == s_off["best_metric"]


def test_tagger_training_store_on_mesh(data_env, tmp_path):
    s_off, _ = _tagger_losses(data_env, tmp_path / "moff", "off", (8, 1),
                              batch=8)
    s_on, logs = _tagger_losses(data_env, tmp_path / "mon", "on", (8, 1),
                                batch=8)
    assert any("resident in HBM" in ln for ln in logs)
    np.testing.assert_allclose(s_on["train_loss"], s_off["train_loss"],
                               rtol=1e-6)


def test_caption_training_bit_identical_with_store(data_env, tmp_path):
    from indonesian_image_captioning_tpu.data import vocab as vocab_lib
    from indonesian_image_captioning_tpu.train import caption as caption_train
    wm = vocab_lib.load_json(vocab_lib.wordmap_path(
        data_env.data_folder, data_env.data_name))
    cfg = ModelConfig(model_type="attention_scn", vocab_size=len(wm),
                      embed_dim=16, attention_dim=16, decoder_dim=16,
                      factored_dim=12, semantic_dim=2, enc_image_size=2,
                      max_caption_len=12, encoder_arch="resnet50")
    results = {}
    for mode in ("off", "on"):
        tcfg = TrainConfig(epochs=1, batch_size=4, print_freq=1,
                           checkpoint_dir=str(tmp_path / mode),
                           device_images=mode)
        logs = []
        _, summary = caption_train.main("attention_scn", data_env, tcfg,
                                        model_cfg=cfg, log=logs.append)
        results[mode] = (summary, logs)
    assert any("resident in HBM" in ln for ln in results["on"][1])
    assert (results["on"][0]["train_loss"]
            == results["off"][0]["train_loss"])


def test_tag_dataset_load_images_flag(data_env):
    ds = TagDataset(data_env.data_folder, data_env.data_name, "TRAIN")
    assert ds.num_images == 4
    b = ds.gather(np.array([1, 0]))
    assert "images" in b
    np.testing.assert_array_equal(b["images"][1], ds.image(0))
    np.testing.assert_array_equal(ds.gather_images(np.array([2, 2])),
                                  np.stack([ds.image(2)] * 2))
    ds.load_images = False
    b2 = ds.gather(np.array([1, 0]))
    assert "images" not in b2 and "tags" in b2
