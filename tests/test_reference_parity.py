"""Parity against the ACTUAL reference implementation (SURVEY.md §4d).

Loads the reference PyTorch modules read-only from /root/reference as an
oracle (never copied): our decoder params are exported through the torch
serve-format converter, loaded into the reference nn.Modules with
``load_state_dict``, and both implementations run on identical inputs —
teacher-forced forward logit parity and bit-for-beam ``sample()`` parity.

Skipped when the reference checkout is not present.
"""

import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def reference_modules():
    import os
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    import torch
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    # the reference imports torchvision at module scope without using it in
    # these files; stub it rather than installing it
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    # modern torch: LongTensor / int is true division; the reference beam
    # relies on old floor semantics (SURVEY.md §5 bugs) — patch for the
    # oracle run only
    orig = torch.Tensor.__truediv__

    def patched(self, other):
        if not torch.is_floating_point(self) and isinstance(other, int):
            return torch.div(self, other, rounding_mode="floor")
        return orig(self, other)

    torch.Tensor.__truediv__ = patched
    from models.decoders.attention_scn import AttentionSCN
    from models.decoders.pure_attention import PureAttention
    from models.decoders.pure_scn import PureSCN
    yield {"attention_scn": AttentionSCN, "pure_attention": PureAttention,
           "pure_scn": PureSCN}
    torch.Tensor.__truediv__ = orig


def build_pair(reference_modules, model_type, vocab=60):
    """Our params + the reference module loaded with the SAME weights."""
    import jax
    import torch
    from indonesian_image_captioning_tpu.core.config import ModelConfig
    from indonesian_image_captioning_tpu.models import convert, decoders

    cfg = ModelConfig(model_type=model_type, vocab_size=vocab, embed_dim=24,
                      attention_dim=20, decoder_dim=28, factored_dim=16,
                      semantic_dim=10, encoder_dim=32, enc_image_size=3,
                      max_caption_len=12)
    params = decoders.init_decoder(jax.random.key(3), cfg)

    cls = reference_modules[model_type]
    if model_type == "pure_scn":
        ref = cls(embed_dim=24, decoder_dim=28, factored_dim=16,
                  semantic_dim=10, vocab_size=vocab, encoder_dim=32)
    elif model_type == "pure_attention":
        ref = cls(attention_dim=20, embed_dim=24, decoder_dim=28,
                  vocab_size=vocab, encoder_dim=32)
    else:
        ref = cls(attention_dim=20, embed_dim=24, decoder_dim=28,
                  factored_dim=16, semantic_dim=10, vocab_size=vocab,
                  encoder_dim=32)
    sd = {k: torch.tensor(np.asarray(v))
          for k, v in convert.decoder_to_torch(params, cfg).items()}
    ref.load_state_dict(sd)
    ref.eval()
    return cfg, params, ref


@pytest.mark.parametrize("model_type", ["pure_scn", "pure_attention",
                                        "attention_scn"])
def test_teacher_forcing_matches_reference(reference_modules, model_type, rng):
    import jax.numpy as jnp
    import torch
    from indonesian_image_captioning_tpu.models import decoders

    cfg, params, ref = build_pair(reference_modules, model_type)
    B, L = 4, cfg.max_caption_len
    enc = rng.normal(size=(B, 3, 3, 32)).astype(np.float32) * 0.3
    tags = rng.uniform(size=(B, 10)).astype(np.float32)
    caps = rng.integers(1, cfg.vocab_size, (B, L)).astype(np.int64)
    # NB: lengths pre-sorted descending.  The reference forward sorts
    # encoder_out/captions by length but NOT semantic_input
    # (pure_scn.py:109-112), silently misaligning tags for unsorted
    # batches — a latent reference bug this framework fixes (tags stay
    # row-aligned).  Parity is only well-defined on sorted batches.
    caplens = np.array([12, 9, 7, 4], np.int64)

    with torch.no_grad():
        if model_type == "pure_attention":
            out = ref(torch.tensor(enc), torch.tensor(caps),
                      torch.tensor(caplens[:, None]))
            preds_ref, caps_sorted, dls, alphas_ref, sort_ind = out
        else:
            out = ref(torch.tensor(enc), torch.tensor(tags),
                      torch.tensor(caps), torch.tensor(caplens[:, None]))
            if model_type == "attention_scn":
                preds_ref, caps_sorted, dls, alphas_ref, sort_ind = out
            else:
                preds_ref, caps_sorted, dls, sort_ind = out
                alphas_ref = None
    preds_ref = preds_ref.numpy()
    sort_ind = sort_ind.numpy()

    ours = decoders.teacher_forcing(params, cfg, jnp.array(enc),
                                    jnp.array(tags), jnp.array(caps),
                                    jnp.array(caplens), train=False)
    preds = np.asarray(ours["predictions"])

    for i, orig in enumerate(sort_ind):       # ref row i = our row orig
        dl = int(caplens[orig]) - 1
        np.testing.assert_allclose(preds[orig, :dl], preds_ref[i, :dl],
                                   rtol=2e-4, atol=2e-4)
        if alphas_ref is not None:
            np.testing.assert_allclose(np.asarray(ours["alphas"])[orig, :dl],
                                       alphas_ref.numpy()[i, :dl],
                                       rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("model_type", ["pure_scn", "pure_attention",
                                        "attention_scn"])
@pytest.mark.parametrize("seed", [0, 1])
def test_beam_sample_bit_for_beam(reference_modules, model_type, seed):
    """Our batched fixed-shape beam returns the reference sample()'s exact
    sequence and score for the same weights and image."""
    import jax
    import jax.numpy as jnp
    import torch
    from indonesian_image_captioning_tpu.core.config import BeamConfig
    from indonesian_image_captioning_tpu.decode.api import caption_beam_search

    rng = np.random.default_rng(seed)
    cfg, params, ref = build_pair(reference_modules, model_type)
    V = cfg.vocab_size
    start_id, end_id = V - 2, V - 1
    word_map = {f"w{i}": i for i in range(V - 2)}
    word_map["<start>"] = start_id
    word_map["<end>"] = end_id

    # nudge the vocab head toward <end> so the reference completes (it
    # crashes when nothing completes — SURVEY.md §5)
    params = jax.tree.map(lambda x: x, params)
    params["fc"]["b"] = params["fc"]["b"].at[end_id].set(2.5)
    sd = ref.state_dict()
    sd["fc.bias"][end_id] = 2.5
    ref.load_state_dict(sd)

    enc = rng.normal(size=(1, 3, 3, 32)).astype(np.float32) * 0.3
    tags = rng.uniform(size=(1, 10)).astype(np.float32)

    with torch.no_grad():
        if model_type == "pure_attention":
            ref_out = ref.sample(5, word_map, torch.tensor(enc))
        else:
            ref_out = ref.sample(5, word_map, torch.tensor(enc),
                                 torch.tensor(tags))
    ref_seq = ref_out[0] if isinstance(ref_out, tuple) else ref_out

    out = caption_beam_search(params, cfg, jnp.array(enc), jnp.array(tags),
                              start_id=start_id, end_id=end_id,
                              beam_cfg=BeamConfig(beam_size=5))
    n = int(out["lengths"][0])
    got = np.asarray(out["sequences"][0][:n]).tolist()
    assert got == list(map(int, ref_seq)), (got, ref_seq)
