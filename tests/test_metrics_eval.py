"""Metric implementations vs nltk and hand-checked values."""

import numpy as np
import pytest

from indonesian_image_captioning_tpu.evaluation import metrics as M


def corpora(seed, n=20, vmax=30):
    rng = np.random.default_rng(seed)
    refs, hyps = [], []
    for _ in range(n):
        k = int(rng.integers(1, 4))
        refs.append([[f"w{int(x)}" for x in
                      rng.integers(0, vmax, rng.integers(3, 12))]
                     for _ in range(k)])
        hyps.append([f"w{int(x)}" for x in
                     rng.integers(0, vmax, rng.integers(3, 12))])
    # make some hypotheses partially copy a reference so n-grams overlap
    for i in range(0, n, 3):
        hyps[i] = refs[i][0][:max(2, len(refs[i][0]) - 1)]
    return refs, hyps


@pytest.mark.parametrize("seed", range(5))
def test_nltk_style_bleu_matches_nltk(seed):
    from nltk.translate.bleu_score import corpus_bleu
    refs, hyps = corpora(seed)
    ours = M.corpus_bleu_nltk_style(refs, hyps)
    try:
        theirs = corpus_bleu(refs, hyps)
    except ZeroDivisionError:
        theirs = 0.0
    assert abs(ours - theirs) < 1e-9, (ours, theirs)


def test_bleu_perfect_match_is_one():
    refs = [[["a", "b", "c", "d", "e"]]] * 3
    hyps = [["a", "b", "c", "d", "e"]] * 3
    bleus = M.corpus_bleu_coco(refs, hyps)
    for b in bleus:
        assert abs(b - 1.0) < 1e-6


def test_bleu_monotone_in_n():
    refs, hyps = corpora(1)
    bleus = M.corpus_bleu_coco(refs, hyps)
    assert all(bleus[i] >= bleus[i + 1] - 1e-12 for i in range(3))
    assert all(0.0 <= b <= 1.0 for b in bleus)


def test_brevity_penalty():
    refs = [[["a", "b", "c", "d", "e", "f"]]]
    short = [["a", "b", "c"]]
    bleu_short = M.corpus_bleu_coco(refs, short)[0]
    # precision 1.0 but bp = exp(1 - 6/3)
    assert abs(bleu_short - np.exp(1 - 2.0)) < 1e-9


def test_rouge_l_hand_value():
    refs = [[["the", "cat", "sat", "on", "the", "mat"]]]
    hyps = [["the", "cat", "on", "mat"]]
    # LCS = 4; p = 4/4 = 1, r = 4/6; F(beta=1.2) = (1+b2)pr / (r + b2 p)
    b2 = 1.2 ** 2
    p, r = 1.0, 4 / 6
    expect = (1 + b2) * p * r / (r + b2 * p)
    assert abs(M.rouge_l_coco(refs, hyps) - expect) < 1e-9


def test_rouge_l_perfect():
    refs = [[["x", "y", "z"]]]
    assert abs(M.rouge_l_coco(refs, [["x", "y", "z"]]) - 1.0) < 1e-9


def test_cider_identical_corpus_positive():
    refs, _ = corpora(2)
    hyps = [r[0] for r in refs]
    score = M.cider_d(refs, hyps)
    assert score > 0.0
    # mismatched corpus scores strictly less
    shuffled = hyps[1:] + hyps[:1]
    assert M.cider_d(refs, shuffled) < score


def test_compute_metrics_keys():
    """scores.json key layout matches nlg-eval's compute_metrics naming
    (reference eval_caption.py:149-163)."""
    refs, hyps = corpora(3)
    out = M.compute_metrics(refs, hyps, include_cider=True)
    assert set(out) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR",
                        "ROUGE_L", "CIDEr"}
    assert all(0.0 <= v <= 10.0 for v in out.values())


def test_meteor_sanity():
    refs = [[["the", "cat", "sat", "on", "the", "mat"]],
            [["a", "dog", "runs"]]]
    perfect = [["the", "cat", "sat", "on", "the", "mat"], ["a", "dog", "runs"]]
    assert M.meteor(refs, perfect) > 0.95
    worse = [["the", "mat", "sat", "on", "the", "cat"], ["a", "dog", "runs"]]
    assert M.meteor(refs, worse) < M.meteor(refs, perfect)
    assert M.meteor([], []) == 0.0


def test_eval_tagger_and_caption_end_to_end(tmp_path):
    """Tiny end-to-end eval over synthetic artifacts with random models."""
    import json
    from PIL import Image
    import jax
    from indonesian_image_captioning_tpu.core.config import (
        BeamConfig, DataConfig, ModelConfig)
    from indonesian_image_captioning_tpu.core.prng import root_key
    from indonesian_image_captioning_tpu.data import preprocess, vocab
    from indonesian_image_captioning_tpu.evaluation import (
        eval_caption, eval_tagger)
    from indonesian_image_captioning_tpu.train import caption as ct
    from indonesian_image_captioning_tpu.train import steps

    root = tmp_path / "corpus"
    img_dir = root / "imgs"
    img_dir.mkdir(parents=True)
    out = tmp_path / "scn"
    rng = np.random.default_rng(0)
    filenames, captions, tags = [], [], []
    for i in range(4):
        name = f"{i:04d}.jpg"
        Image.fromarray(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
                        ).save(img_dir / name)
        filenames.append(name)
        captions.append(["kucing bermain bola", "anjing di taman"])
        tags.append(["kucing"])
    (root / "filenames.json").write_text(json.dumps(filenames))
    (root / "captions.json").write_text(json.dumps(captions))
    (root / "tags.json").write_text(json.dumps(tags))
    (root / "train.txt").write_text("0000\n0001")
    (root / "val.txt").write_text("0002")
    (root / "test.txt").write_text("0003")
    (root / "all_tags.txt").write_text("kucing\nanjing")
    preprocess.create_input_files("flickr10k", str(root), str(img_dir), 2, 0,
                                  str(out), tag_size=2, max_len=10,
                                  image_size=32)
    data_cfg = DataConfig(data_folder=str(out),
                          data_name="flickr10k_2_cap_per_img_0_min_word_freq")
    wm = vocab.load_json(vocab.wordmap_path(str(out), data_cfg.data_name))

    cfg = ModelConfig(model_type="attention_scn", vocab_size=len(wm),
                      embed_dim=16, attention_dim=16, decoder_dim=16,
                      factored_dim=12, semantic_dim=2, enc_image_size=2,
                      max_caption_len=12, encoder_arch="resnet50")
    opt = steps.make_optimizer(4e-4, 5.0)
    state = ct.init_state(root_key(0), cfg, opt)

    scores = eval_caption.evaluate(
        state, cfg, data_cfg, wm,
        beam_cfg=BeamConfig(beam_size=3, max_steps=11),
        batch_size=2, output_root=str(tmp_path / "evalout"), log=lambda s: None)
    assert 0.0 <= scores["Bleu_4"] <= 1.0
    dumps = list((tmp_path / "evalout").iterdir())
    assert len(dumps) == 1
    # filename parity with the reference dumps (eval_caption.py:151-163)
    assert {p.name for p in dumps[0].iterdir()} == {
        "attention_scn_beam_3_references.json",
        "attention_scn_beam_3_hypotheses.json",
        "attention_scn_beam_3_scores.json"}

    acc = eval_tagger.evaluate(state["tagger"], state["tagger_stats"],
                               data_cfg, batch_size=2, arch="resnet50",
                               log=lambda s: None)
    assert 0.0 <= acc <= 100.0
