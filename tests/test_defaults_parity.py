"""Defaults-parity tests against the reference flag/recipe tables.

Sources: /root/reference/create_input_files.py:16-21 (CLI flag defaults),
trains/attention_scn.py:31-57 (training recipe globals),
inference.py:66-67 (beam), utils/loader.py:12-17 (model dims).
Library defaults must match the CLI defaults so programmatic callers get
the same artifacts as the shell surface.
"""

import inspect

from indonesian_image_captioning_tpu.core.config import (
    BeamConfig, ModelConfig, TaggerConfig, TrainConfig, tagger_train_config)
from indonesian_image_captioning_tpu.data import preprocess


def test_preprocess_library_defaults_match_reference_cli():
    sig = inspect.signature(preprocess.create_input_files)
    assert sig.parameters["max_len"].default == 50        # create_input_files.py:20
    assert sig.parameters["tag_size"].default == 1000
    assert sig.parameters["image_size"].default == 256


def test_preprocess_cli_defaults_match_reference():
    from indonesian_image_captioning_tpu.cli.create_input_files import (
        build_parser)
    p = build_parser()
    d = {a.dest: a.default for a in p._actions}
    assert d["captions_per_image"] == 5                   # :18
    assert d["min_word_freq"] == 5                        # :19
    assert d["max_len"] == 50                             # :20


def test_train_recipe_defaults_match_reference():
    t = TrainConfig()
    assert t.epochs == 12                                 # attention_scn.py:42
    assert t.batch_size == 32                             # :48
    assert t.decoder_lr == 4e-4                           # :51
    assert t.encoder_lr == 1e-4                           # :50
    assert t.grad_clip == 5.0                             # :52
    assert t.alpha_c == 1.0                               # :53
    assert t.lr_decay_factor == 0.8                       # :139
    assert t.lr_decay_every_stale == 8                    # :137
    assert t.early_stop_stale == 20                       # :134
    assert t.fine_tune_encoder is False                   # :56

    tg = tagger_train_config()
    assert tg.epochs == 10                                # trains/tagger.py:35
    assert tg.decoder_lr == 1e-4                          # :41


def test_model_dims_match_reference_loader():
    m = ModelConfig()
    # utils/loader.py:12-17 "must be same as training params!"
    assert (m.embed_dim, m.attention_dim, m.decoder_dim, m.factored_dim) == \
        (512, 512, 512, 512)
    assert m.semantic_dim == 1000
    assert m.dropout == 0.5
    assert m.enc_image_size == 14 and m.encoder_dim == 2048
    assert m.max_caption_len == 52  # <start> + max_len 50 + <end>
    assert TaggerConfig().dropout == 0.15                 # encoders/tagger.py


def test_beam_defaults_match_reference():
    b = BeamConfig()
    assert b.beam_size == 5                               # inference.py:66
    assert b.max_steps == 51                              # attention_scn.py:288
    assert b.length_penalty == 0.0
