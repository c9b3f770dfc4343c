"""Data layer: preprocessing golden invariants, datasets, loader."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from indonesian_image_captioning_tpu.core.tokens import (
    END_TOKEN, PAD_ID, PADDING_TOKEN, START_TOKEN, UNKNOWN_TOKEN)
from indonesian_image_captioning_tpu.data import loader as loader_lib
from indonesian_image_captioning_tpu.data import preprocess, vocab
from indonesian_image_captioning_tpu.data.datasets import CaptionDataset, TagDataset


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory):
    """A 6-image flickr10k-format corpus with tags and 1-3 captions each."""
    root = tmp_path_factory.mktemp("flickr10k")
    img_dir = root / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)

    filenames, captions, tags = [], [], []
    words = ["anjing", "kucing", "bermain", "di", "taman", "bola",
             "anak", "laki", "perempuan", "rumput"]
    for i in range(6):
        name = f"{i:04d}.jpg"
        arr = rng.integers(0, 256, size=(20 + i, 30, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / name)
        filenames.append(name)
        caps = []
        for j in range(1 + (i % 3)):
            n = 3 + (i + j) % 4
            caps.append(" ".join(rng.choice(words, n).tolist()))
        captions.append(caps)
        tags.append(list(rng.choice(["anjing", "kucing", "bola", "taman"],
                                    2, replace=False)))

    (root / "filenames.json").write_text(json.dumps(filenames))
    (root / "captions.json").write_text(json.dumps(captions))
    (root / "tags.json").write_text(json.dumps(tags))
    (root / "train.txt").write_text("\n".join(f"{i:04d}" for i in range(4)))
    (root / "val.txt").write_text("0004")
    (root / "test.txt").write_text("0005")
    (root / "all_tags.txt").write_text(
        "\n".join(["anjing", "kucing", "bola", "taman"]))
    return root, img_dir


@pytest.fixture(scope="module")
def artifacts(tiny_corpus, tmp_path_factory):
    root, img_dir = tiny_corpus
    out = tmp_path_factory.mktemp("scn_data")
    outputs = preprocess.create_input_files(
        dataset="flickr10k", split_path=str(root), image_folder=str(img_dir),
        captions_per_image=5, min_word_freq=0, output_folder=str(out),
        tag_size=4, max_len=50)
    return out, outputs


def test_artifact_names_match_reference_scheme(artifacts):
    out, outputs = artifacts
    base = "flickr10k_5_cap_per_img_0_min_word_freq"
    for split in ("TRAIN", "VAL", "TEST"):
        for kind, ext in (("IMAGES", "hdf5"), ("TAGS", "hdf5"),
                          ("CAPTIONS", "json"), ("CAPLENS", "json"),
                          ("RAWTAGS", "json")):
            assert os.path.exists(out / f"{split}_{kind}_{base}.{ext}")
    assert os.path.exists(out / f"WORDMAP_{base}.json")
    assert os.path.exists(out / f"TAGMAP_{base}.json")


def test_wordmap_structure(artifacts):
    out, outputs = artifacts
    wm = vocab.load_json(outputs["wordmap"])
    assert wm[PADDING_TOKEN] == PAD_ID
    # <unk>, <start>, <end> are the three largest ids, in that order
    n = len(wm)
    assert wm[UNKNOWN_TOKEN] == n - 3
    assert wm[START_TOKEN] == n - 2
    assert wm[END_TOKEN] == n - 1
    assert sorted(wm.values()) == list(range(n))


def test_hdf5_shapes_and_caption_encoding(artifacts):
    import h5py
    out, outputs = artifacts
    with h5py.File(outputs["TRAIN_images"]) as h:
        assert h["images"].shape == (4, 3, 256, 256)
        assert h["images"].dtype == np.uint8
        assert h.attrs["captions_per_image"] == 5
    with h5py.File(outputs["TRAIN_tags"]) as t:
        assert t["tags"].shape == (4, 4)
        assert set(np.unique(t["tags"][...])) <= {0.0, 1.0}
        assert (t["tags"][...].sum(1) == 2).all()  # 2 tags per image
    caps = vocab.load_json(outputs["TRAIN_captions"])
    lens = vocab.load_json(outputs["TRAIN_caplens"])
    assert len(caps) == 20 and len(lens) == 20  # 4 images x 5 cpi
    wm = vocab.load_json(outputs["wordmap"])
    for ids, n in zip(caps, lens):
        assert len(ids) == 52
        assert ids[0] == wm[START_TOKEN]
        assert ids[n - 1] == wm[END_TOKEN]
        assert all(x == PAD_ID for x in ids[n:])


def test_preprocess_deterministic(tiny_corpus, tmp_path):
    root, img_dir = tiny_corpus
    o1, o2 = tmp_path / "a", tmp_path / "b"
    r1 = preprocess.create_input_files("flickr10k", str(root), str(img_dir),
                                       5, 0, str(o1), tag_size=4, max_len=50)
    r2 = preprocess.create_input_files("flickr10k", str(root), str(img_dir),
                                       5, 0, str(o2), tag_size=4, max_len=50)
    assert vocab.load_json(r1["TRAIN_captions"]) == vocab.load_json(
        r2["TRAIN_captions"])


def test_preprocess_workers_identical(tiny_corpus, tmp_path):
    """Concurrent image decoding must not change ANY artifact byte:
    images row-for-row, captions (the seeded rng sequence), tags."""
    import h5py

    root, img_dir = tiny_corpus
    o1, o2 = tmp_path / "serial", tmp_path / "threaded"
    r1 = preprocess.create_input_files("flickr10k", str(root), str(img_dir),
                                       5, 0, str(o1), tag_size=4, max_len=50,
                                       workers=1)
    r2 = preprocess.create_input_files("flickr10k", str(root), str(img_dir),
                                       5, 0, str(o2), tag_size=4, max_len=50,
                                       workers=8)
    for split in ("TRAIN", "VAL", "TEST"):
        with h5py.File(r1[f"{split}_images"]) as a, \
                h5py.File(r2[f"{split}_images"]) as b:
            assert (a["images"][...] == b["images"][...]).all()
        assert vocab.load_json(r1[f"{split}_captions"]) == vocab.load_json(
            r2[f"{split}_captions"])
        assert vocab.load_json(r1[f"{split}_caplens"]) == vocab.load_json(
            r2[f"{split}_caplens"])


def test_caption_dataset_and_loader(artifacts):
    out, outputs = artifacts
    base = "flickr10k_5_cap_per_img_0_min_word_freq"
    ds = CaptionDataset(str(out), base, "TRAIN")
    assert len(ds) == 20 and ds.cpi == 5
    batch = ds.gather(np.array([0, 7, 19]))
    assert batch["images"].shape == (3, 3, 256, 256)
    assert batch["captions"].shape == (3, 52)
    assert batch["tags"].shape == (3, 4)
    # image for caption 7 is image 1
    np.testing.assert_array_equal(batch["images"][1], ds.image(1))

    val = CaptionDataset(str(out), base, "VAL")
    vb = val.gather(np.array([2]))
    assert vb["allcaps"].shape == (1, 5, 52)
    np.testing.assert_array_equal(vb["allcaps"][0, 2], vb["captions"][0])

    # fixed-shape padded final batch
    batches = list(loader_lib.iterate(ds, batch_size=8, shuffle=True, seed=1))
    assert len(batches) == 3
    assert batches[-1]["images"].shape == (8, 3, 256, 256)
    assert batches[-1]["valid"].sum() == 4
    assert (batches[-1]["caplens"][4:] == 0).all()
    # shuffling differs across epochs, stable within (seed, epoch)
    b0 = next(iter(loader_lib.iterate(ds, 8, shuffle=True, seed=1, epoch=0)))
    b1 = next(iter(loader_lib.iterate(ds, 8, shuffle=True, seed=1, epoch=1)))
    assert not np.array_equal(b0["captions"], b1["captions"])
    b0b = next(iter(loader_lib.iterate(ds, 8, shuffle=True, seed=1, epoch=0)))
    np.testing.assert_array_equal(b0["captions"], b0b["captions"])


def test_windowed_hdf5_matches_in_memory(artifacts):
    """in_memory=False keeps images on disk: h5py fancy indexing requires
    sorted unique indices, so _fancy_index must reconstruct arbitrary
    (repeated, unsorted) gathers exactly (datasets.py:34-43)."""
    out, _ = artifacts
    base = "flickr10k_5_cap_per_img_0_min_word_freq"
    mem = CaptionDataset(str(out), base, "TRAIN", in_memory=True)
    win = CaptionDataset(str(out), base, "TRAIN", in_memory=False)
    idx = np.array([19, 0, 7, 7, 0, 12])  # unsorted + duplicates
    bm, bw = mem.gather(idx), win.gather(idx)
    for k in bm:
        np.testing.assert_array_equal(bm[k], bw[k])
    np.testing.assert_array_equal(mem.gather_images(np.array([3, 1, 1])),
                                  win.gather_images(np.array([3, 1, 1])))

    tmem = TagDataset(str(out), base, "TRAIN", in_memory=True)
    twin = TagDataset(str(out), base, "TRAIN", in_memory=False)
    tb_m, tb_w = tmem.gather(np.array([3, 0, 3])), twin.gather(
        np.array([3, 0, 3]))
    for k in tb_m:
        np.testing.assert_array_equal(tb_m[k], tb_w[k])


def test_tag_dataset(artifacts):
    out, _ = artifacts
    base = "flickr10k_5_cap_per_img_0_min_word_freq"
    ds = TagDataset(str(out), base, "TRAIN")
    assert len(ds) == 4
    b = ds.gather(np.array([1, 3]))
    assert b["images"].shape == (2, 3, 256, 256)
    assert b["tags"].shape == (2, 4)


def test_prefetch_to_device(artifacts):
    out, _ = artifacts
    base = "flickr10k_5_cap_per_img_0_min_word_freq"
    ds = TagDataset(str(out), base, "TRAIN")
    got = list(loader_lib.prefetch_to_device(
        loader_lib.iterate(ds, batch_size=2)))
    assert len(got) == 2
    assert got[0]["images"].shape == (2, 3, 256, 256)


def test_iterate_process_slices_partition_global_batch(tmp_path):
    """Multi-host input sharding: the union of every process's slices must
    be exactly the single-process batch (same shuffle order, same padding,
    same masks), per data/loader.py."""
    from indonesian_image_captioning_tpu.data import loader as loader_lib

    class FakeDS:
        def __init__(self, n):
            self.n = n
            self.data = np.arange(n * 3, dtype=np.int32).reshape(n, 3)

        def __len__(self):
            return self.n

        def gather(self, idx):
            return {"images": self.data[idx],
                    "caplens": np.full(len(idx), 7, np.int32)}

    ds = FakeDS(10)  # 10 rows, batch 8 -> one full + one padded batch
    single = list(loader_lib.iterate(ds, 8, shuffle=True, seed=3, epoch=1))
    for pc in (2, 4):
        per_proc = [list(loader_lib.iterate(
            ds, 8, shuffle=True, seed=3, epoch=1,
            process_index=pi, process_count=pc)) for pi in range(pc)]
        for b, ref in enumerate(single):
            for key in ref:
                glued = np.concatenate([per_proc[pi][b][key]
                                        for pi in range(pc)])
                np.testing.assert_array_equal(glued, ref[key], err_msg=key)


def test_iterate_process_count_divisibility():
    from indonesian_image_captioning_tpu.data import loader as loader_lib
    import pytest as _pytest

    class FakeDS:
        def __len__(self):
            return 4

        def gather(self, idx):
            return {"images": np.zeros((len(idx), 2))}

    with _pytest.raises(ValueError):
        list(loader_lib.iterate(FakeDS(), 6, process_count=4))
