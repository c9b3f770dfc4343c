"""Corpus scorer CLI (reference corpus_score.py:9-45, 110-118 equivalent)."""

import json
import math

from indonesian_image_captioning_tpu.cli import corpus_score as cs


def test_unigram_and_perplexity_hand_case():
    corpus = [["a", "b", "a"], ["a", "c"]]
    counts = cs.unigram(corpus)
    assert counts == {"a": 3, "b": 1, "c": 1}
    # P(w) = count/5; logp of corpus = 3*log(3/5) + 2*log(1/5)
    logp = 3 * math.log(3 / 5) + 2 * math.log(1 / 5)
    expected = math.exp(-logp / 5)
    assert abs(cs.perplexity(corpus, counts) - expected) < 1e-12


def test_prob_sentence_oov_is_neg_inf():
    counts = cs.unigram([["a"]])
    assert cs.prob_sentence(["zzz"], counts) == float("-inf")


def test_cli_end_to_end(tmp_path, capsys):
    caps = ["anjing bermain bola", ["kucing", "di", "taman"],
            "anjing di taman"]
    f = tmp_path / "caps.json"
    f.write_text(json.dumps(caps))
    cs.main(["--captions", str(f), "--min_word_freq", "1"])
    out = capsys.readouterr().out
    assert "sentences: 3" in out
    assert "tokens: 9" in out
    assert "vocab: 6" in out          # anjing bermain bola kucing di taman
    assert "vocab (freq > 1): 3" in out   # anjing(2) di(2) taman(2)
    assert "unigram perplexity:" in out
