#!/usr/bin/env python
"""End-to-end learnability check: the full pipeline must LEARN.

Builds a synthetic corpus whose captions are predictable from image content
(dominant colour + shape words), runs the real preprocessing -> tagger
training -> attention_scn training pipeline at small dims, and reports the
validation BLEU-4 trajectory.  A frozen random ResNet still separates
colours, so the decoder must learn colour-conditioned captions — loss down
+ BLEU-4 up is evidence the whole learning loop (data, masking, optimizer,
metric gating) is wired correctly, beyond unit parity.

Run on TPU:  python tools/learnability_check.py
"""

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image


def build_corpus(root, img_dir, n_per_class=24, image_size=64):
    rng = np.random.default_rng(0)
    classes = {
        "merah": (200, 30, 30),
        "hijau": (30, 180, 40),
        "biru": (30, 60, 200),
    }
    templates = [
        "bola {c} di atas meja",
        "sebuah bola {c} besar",
        "bola {c} di taman",
    ]
    filenames, captions, tags = [], [], []
    i = 0
    for cname, rgb in classes.items():
        for _ in range(n_per_class):
            name = f"{i:04d}.jpg"
            img = np.full((image_size, image_size, 3), rgb, np.uint8)
            img = np.clip(img.astype(np.int16)
                          + rng.integers(-25, 25, img.shape), 0, 255)
            Image.fromarray(img.astype(np.uint8)).save(img_dir / name)
            filenames.append(name)
            captions.append([t.format(c=cname) for t in
                             rng.choice(templates, 2, replace=False)])
            tags.append([cname])
            i += 1
    order = rng.permutation(i)
    n_train = int(i * 0.75)
    n_val = int(i * 0.15)
    (root / "filenames.json").write_text(json.dumps(filenames))
    (root / "captions.json").write_text(json.dumps(captions))
    (root / "tags.json").write_text(json.dumps(tags))
    (root / "train.txt").write_text("\n".join(
        f"{j:04d}" for j in order[:n_train]))
    (root / "val.txt").write_text("\n".join(
        f"{j:04d}" for j in order[n_train:n_train + n_val]))
    (root / "test.txt").write_text("\n".join(
        f"{j:04d}" for j in order[n_train + n_val:]))
    (root / "all_tags.txt").write_text("\n".join(classes))


def main():
    import argparse
    from pathlib import Path
    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    from indonesian_image_captioning_tpu.core.config import (
        DataConfig, ModelConfig, TrainConfig, tagger_train_config,
        TaggerConfig)
    from indonesian_image_captioning_tpu.data import preprocess, vocab
    from indonesian_image_captioning_tpu.train import caption, tagger

    ap = argparse.ArgumentParser()
    ap.add_argument("--lr", type=float, default=None,
                    help="caption decoder LR override")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--flagship", action="store_true",
                    help="run at the REFERENCE flagship config: 256px "
                         "images, ResNet-152 encoders, 14x14x2048 features, "
                         "emb/att/dec/factor = 512, semantic width 1000, "
                         "max caption length 52 (recipe "
                         "trains/attention_scn.py:31-51)")
    args = ap.parse_args()
    fl = args.flagship

    tmp = Path(tempfile.mkdtemp(prefix="learnability_"))
    root = tmp / "corpus"
    img_dir = root / "imgs"
    img_dir.mkdir(parents=True)
    out = tmp / "scn_data"
    image_size = 256 if fl else 64
    tag_size = 1000 if fl else 3    # flagship: full 1000-concept vector
    build_corpus(root, img_dir, n_per_class=48 if fl else 24,
                 image_size=image_size)
    preprocess.create_input_files(
        "flickr10k", str(root), str(img_dir), captions_per_image=2,
        min_word_freq=0, output_folder=str(out), tag_size=tag_size,
        max_len=50 if fl else 10, image_size=image_size)
    data_cfg = DataConfig(data_folder=str(out),
                          data_name="flickr10k_2_cap_per_img_0_min_word_freq")
    wm = vocab.load_json(vocab.wordmap_path(str(out), data_cfg.data_name))

    arch = "resnet152" if fl else "resnet50"
    # 1) tagger: should reach high accuracy (colour is linearly separable)
    tag_tcfg = tagger_train_config(epochs=4, batch_size=8, print_freq=100,
                                   checkpoint_dir=str(tmp / "ck"),
                                   decoder_lr=1e-3)
    _, tag_summary = tagger.main(
        data_cfg, tag_tcfg,
        TaggerConfig(semantic_size=tag_size, encoder_arch=arch),
        log=lambda s: None)
    print(f"tagger best accuracy: {tag_summary['best_metric']:.2f}%")

    # 2) attention_scn captioning
    if fl:
        cfg = ModelConfig(model_type="attention_scn", vocab_size=len(wm),
                          semantic_dim=tag_size)   # all other dims = recipe
    else:
        cfg = ModelConfig(model_type="attention_scn", vocab_size=len(wm),
                          embed_dim=64, attention_dim=64, decoder_dim=64,
                          factored_dim=32, semantic_dim=3, enc_image_size=2,
                          max_caption_len=12, encoder_arch="resnet50")
    bleus = []

    def log(s):
        if "BLEU-4" in s:
            bleus.append(float(s.rsplit("BLEU-4 - ", 1)[1]))
            print(s.strip())
        elif fl and ("epoch time" in s or "Epoch: " in s.split("\t")[0]):
            print(s.strip())

    tcfg = TrainConfig(
        epochs=args.epochs or (25 if fl else 10),
        batch_size=32 if fl else 8,
        print_freq=1000,
        checkpoint_dir=str(tmp / "ck2"),
        decoder_lr=args.lr or (3e-3 if not fl else 3e-3),
        # at random init a deep frozen encoder's eval-mode BN explodes
        # (see TrainConfig.calibrate_encoder_stats) — calibrate for the
        # flagship ResNet-152; the reference sidesteps this with ImageNet
        # weights which aren't available offline
        calibrate_encoder_stats=50 if fl else 0)
    (tmp / "ck2").mkdir()
    _, summary = caption.main(
        "attention_scn", data_cfg, tcfg, model_cfg=cfg,
        tagger_checkpoint=str(
            tmp / "ck" / f"BEST_checkpoint_tagger_{data_cfg.data_name}")
        if (tmp / "ck" / f"BEST_checkpoint_tagger_{data_cfg.data_name}"
            ).exists() else None,
        log=log)
    print("BLEU-4 trajectory:", [round(b, 3) for b in bleus])
    best = summary["best_metric"]
    print(f"best (checkpoint-gated) BLEU-4: {best:.3f}")
    # the BEST_ checkpoint keeps the peak epoch, like the reference recipe;
    # with 2 caption templates per image the teacher-forced argmax can blend
    # templates on later epochs, so gate on the best, not the last
    ok = best >= 0.2 and max(bleus) > bleus[0]
    print("LEARNABILITY:", "PASS" if ok else "FAIL")
    shutil.rmtree(tmp, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
