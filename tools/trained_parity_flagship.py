#!/usr/bin/env python
"""Flagship-dims TRAINED cross-framework parity, BOTH directions
(VERDICT r3 #3).

The unit suite pins trained parity at toy dims (tests/test_trained_parity.py,
VOCAB=40, dims 16-32); real user checkpoints are 512/512/512/512, V=6,763
(/root/reference/utils/loader.py:12-17).  This tool covers the trained
FLAGSHIP regime — saturated gates at 512 wide, near-tie beams over a
6,763-way softmax — and the EXPORT direction the suite lacks:

  phase A (export, flagship dims): train OUR attention_scn decoder at the
    full reference dims on the TPU (synthetic concept corpus, cached
    features, the production fused train step), export the trained params
    with models/convert.decoder_to_torch into the reference's serve-format
    state_dict, load them into the ACTUAL reference torch decoder
    (/root/reference/models/decoders/attention_scn.py), and bit-for-beam
    compare ref.sample(beam=5) (:160-296) against our beam engine on
    held-out images (both sides f32 on CPU for exact arithmetic).

  phase B (import, mid dims): train the ACTUAL torch reference at
    dims 256 / V=1024 on CPU with the reference recipe, then import the
    trained weights through models/convert.decoder_from_torch and assert
    bit-for-beam + validation-BLEU agreement — the import-direction test
    re-run above toy dims.

Run:  python tools/trained_parity_flagship.py            # both phases
      python tools/trained_parity_flagship.py --phase a  # export only
Prints PARITY A: PASS / PARITY B: PASS lines; record results in
BASELINE.md.
"""

import argparse
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
REFERENCE = "/root/reference"


# ---------------------------------------------------------------------------
# synthetic concept corpus (learnable: caption is a deterministic function
# of the image's two concepts; features are concept-basis mixtures)
# ---------------------------------------------------------------------------

def make_corpus(rng, n, *, vocab, sem_dim, enc_dim, enc_size, max_len,
                n_concepts=16, words_per_concept=3):
    start, end = vocab - 2, vocab - 1
    # spread concept words over the whole id range so big-vocab softmax
    # behaviour (near-ties far apart in id space) is exercised
    word_ids = rng.choice(np.arange(1, vocab - 3), size=(
        n_concepts, words_per_concept), replace=False)
    basis = rng.standard_normal((n_concepts, enc_dim)).astype(np.float32)
    P = enc_size * enc_size
    enc = np.zeros((n, P, enc_dim), np.float32)
    tags = np.zeros((n, sem_dim), np.float32)
    caps = np.zeros((n, max_len), np.int32)
    lens = np.zeros((n,), np.int32)
    for i in range(n):
        a, b = rng.choice(n_concepts, size=2, replace=False)
        mix = rng.random(P).astype(np.float32)
        enc[i] = (np.outer(mix, basis[a]) + np.outer(1 - mix, basis[b])
                  + 0.05 * rng.standard_normal((P, enc_dim)))
        tags[i, a % sem_dim] = 1.0
        tags[i, b % sem_dim] = 1.0
        words = list(word_ids[a]) + list(word_ids[b])
        seq = [start] + words + [end]
        caps[i, :len(seq)] = seq
        lens[i] = len(seq)
    return enc, tags, caps, lens


def word_map(vocab):
    wm = {"<pad>": 0}
    for i in range(1, vocab - 3):
        wm[f"w{i}"] = i
    wm["<unk>"], wm["<start>"], wm["<end>"] = vocab - 3, vocab - 2, vocab - 1
    return wm


# ---------------------------------------------------------------------------
# reference-side helpers (actual torch modules from /root/reference)
# ---------------------------------------------------------------------------

def reference_side():
    import torch
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    orig = torch.Tensor.__truediv__

    def patched(self, other):
        # the reference beam relies on old integer-division semantics
        # (SURVEY.md bugs: prev_word_inds = top_k_words / vocab_size)
        if not torch.is_floating_point(self) and isinstance(other, int):
            return torch.div(self, other, rounding_mode="floor")
        return orig(self, other)

    torch.Tensor.__truediv__ = patched
    from models.decoders.attention_scn import AttentionSCN
    return AttentionSCN


def reference_decoder(model: str, V: int):
    """Construct the ACTUAL reference torch decoder for a family at
    flagship dims (loader defaults, /root/reference/utils/loader.py:12-17).
    Returns (module, sample_fn(beam, wm, enc_t, tags_t) -> seq list)."""
    import torch
    reference_side()                      # sys.path + truediv patch
    if model == "attention_scn":
        from models.decoders.attention_scn import AttentionSCN
        ref = AttentionSCN(attention_dim=512, embed_dim=512,
                           decoder_dim=512, factored_dim=512,
                           semantic_dim=1000, vocab_size=V,
                           encoder_dim=2048)
        # sample: /root/reference/models/decoders/attention_scn.py:160-296
        sample = lambda b, wm, e, t: list(map(int, ref.sample(b, wm, e, t)[0]))
    elif model == "pure_scn":
        from models.decoders.pure_scn import PureSCN
        ref = PureSCN(embed_dim=512, decoder_dim=512, factored_dim=512,
                      semantic_dim=1000, vocab_size=V, encoder_dim=2048)
        # sample returns the bare seq (pure_scn.py:142-249)
        sample = lambda b, wm, e, t: list(map(int, ref.sample(b, wm, e, t)))
    elif model == "pure_attention":
        from models.decoders.pure_attention import PureAttention
        ref = PureAttention(attention_dim=512, embed_dim=512,
                            decoder_dim=512, vocab_size=V,
                            encoder_dim=2048)
        # sample takes no tags, returns (seq, alphas) (pure_attention.py:153-281)
        sample = lambda b, wm, e, t: list(map(int, ref.sample(b, wm, e)[0]))
    else:
        raise ValueError(model)
    return ref, sample


# ---------------------------------------------------------------------------
# phase A: train OURS at flagship dims on-chip, export to torch
# ---------------------------------------------------------------------------

FLAG = dict(vocab=6763, sem_dim=1000, enc_dim=2048, enc_size=14,
            max_len=14)


def phase_a_train(out_path, model="attention_scn"):
    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from indonesian_image_captioning_tpu.core.config import (ModelConfig,
                                                             TrainConfig)
    from indonesian_image_captioning_tpu.core.prng import root_key
    from indonesian_image_captioning_tpu.models import decoders
    from indonesian_image_captioning_tpu.train import steps

    rng = np.random.default_rng(11)
    V = FLAG["vocab"]
    n = 96
    enc, tags, caps, lens = make_corpus(
        rng, n, vocab=V, sem_dim=FLAG["sem_dim"], enc_dim=FLAG["enc_dim"],
        enc_size=FLAG["enc_size"], max_len=FLAG["max_len"])
    cfg = ModelConfig(model_type=model, vocab_size=V,
                      max_caption_len=FLAG["max_len"])
    params = decoders.init_decoder(root_key(3), cfg)
    opt = steps.make_optimizer(2e-3, 5.0)   # raised lr, toy-corpus regime
    opt_state = opt.init(params)
    tcfg = TrainConfig(batch_size=48, decoder_dtype="float32")
    _, step = steps.make_caption_train_step(cfg, tcfg, opt, donate=False)

    enc_d = jax.device_put(enc.reshape(n, FLAG["enc_size"],
                                       FLAG["enc_size"], FLAG["enc_dim"]))
    tags_d = jax.device_put(tags)
    caps_d = jax.device_put(caps)
    lens_d = jax.device_put(lens)
    sub = {"params": params, "opt_state": opt_state}
    key = jax.random.key(5)
    t0 = time.time()
    n_steps = 600
    for it in range(n_steps):
        lo = (it * 48) % n
        sl = np.arange(lo, lo + 48) % n
        key, k = jax.random.split(key)
        sub, aux = step(sub, enc_d[sl], tags_d[sl], caps_d[sl],
                        lens_d[sl], k)
        if it % 100 == 99:
            print(f"  step {it + 1}: loss {float(aux['loss']):.4f} "
                  f"({time.time() - t0:.0f}s)")
    params = jax.device_get(sub["params"])
    params = jax.tree.map(lambda x: np.asarray(x, np.float32), params)
    corpus = dict(enc=enc, tags=tags, caps=caps, lens=lens)
    np.savez(out_path, **{f"corpus/{k}": v for k, v in corpus.items()})
    import pickle
    with open(out_path + ".params.pkl", "wb") as f:
        pickle.dump(params, f)
    print(f"phase A training done ({time.time() - t0:.0f}s), "
          f"saved {out_path}")


def phase_a_compare(out_path, model="attention_scn"):
    # CPU process: exact f32 on both sides
    import jax
    jax.config.update("jax_platforms", "cpu")
    import pickle

    import jax.numpy as jnp
    import torch

    from indonesian_image_captioning_tpu.core.config import (BeamConfig,
                                                             ModelConfig)
    from indonesian_image_captioning_tpu.decode.api import caption_beam_search
    from indonesian_image_captioning_tpu.models import convert

    torch.set_num_threads(8)
    data = np.load(out_path + ".npz")
    enc = data["corpus/enc"]
    tags = data["corpus/tags"]
    with open(out_path + ".params.pkl", "rb") as f:
        params = pickle.load(f)
    V = FLAG["vocab"]
    cfg = ModelConfig(model_type=model, vocab_size=V,
                      max_caption_len=FLAG["max_len"])

    ref, ref_sample = reference_decoder(model, V)
    sd = convert.decoder_to_torch(params, cfg)
    ref.load_state_dict({k: torch.tensor(v) for k, v in sd.items()})
    ref.eval()

    wm = word_map(V)
    P = FLAG["enc_size"] ** 2
    params_j = jax.tree.map(jnp.asarray, params)
    mismatches = []
    n_cmp = 8
    t0 = time.time()
    for i in range(n_cmp):
        enc_i = enc[i:i + 1].reshape(1, FLAG["enc_size"], FLAG["enc_size"],
                                     FLAG["enc_dim"])
        with torch.no_grad():
            ref_seq = ref_sample(5, wm, torch.tensor(enc_i),
                                 torch.tensor(tags[i:i + 1]))
        out = caption_beam_search(params_j, cfg, jnp.asarray(enc_i),
                                  jnp.asarray(tags[i:i + 1]),
                                  start_id=V - 2, end_id=V - 1,
                                  beam_cfg=BeamConfig(beam_size=5))
        got = np.asarray(
            out["sequences"][0][:int(out["lengths"][0])]).tolist()
        status = "OK" if got == ref_seq else "MISMATCH"
        print(f"  image {i}: ref len {len(ref_seq)} vs ours "
              f"{len(got)} [{status}] ({time.time() - t0:.0f}s)")
        if got != ref_seq:
            mismatches.append((i, got, ref_seq))
    verdict = "PASS" if not mismatches else f"FAIL {mismatches}"
    print(f"PARITY A (export, flagship dims, {n_cmp} images "
          f"bit-for-beam): {verdict}")
    return not mismatches


# ---------------------------------------------------------------------------
# phase B: train the torch reference at mid dims on CPU, import
# ---------------------------------------------------------------------------

MID = dict(vocab=1024, sem_dim=100, enc_dim=256, enc_size=3, max_len=12,
           att=256, embd=256, dec=256, fac=256)


def phase_b():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch
    from torch.nn.utils.rnn import pack_padded_sequence

    from indonesian_image_captioning_tpu.core.config import (BeamConfig,
                                                             ModelConfig)
    from indonesian_image_captioning_tpu.decode.api import caption_beam_search
    from indonesian_image_captioning_tpu.models import convert, torch_import

    torch.set_num_threads(8)
    AttentionSCN = reference_side()
    torch.manual_seed(0)
    V = MID["vocab"]
    ref = AttentionSCN(attention_dim=MID["att"], embed_dim=MID["embd"],
                       decoder_dim=MID["dec"], factored_dim=MID["fac"],
                       semantic_dim=MID["sem_dim"], vocab_size=V,
                       encoder_dim=MID["enc_dim"])
    rng = np.random.default_rng(17)
    enc, tags, caps, lens = make_corpus(
        rng, 64, vocab=V, sem_dim=MID["sem_dim"], enc_dim=MID["enc_dim"],
        enc_size=MID["enc_size"], max_len=MID["max_len"])
    optimizer = torch.optim.Adam(ref.parameters(), lr=2e-3)
    criterion = torch.nn.CrossEntropyLoss()
    t0 = time.time()
    for epoch in range(60):
        ref.train()
        for lo in range(0, 64, 32):
            sl = slice(lo, lo + 32)
            enc_t = torch.tensor(enc[sl])
            tags_t = torch.tensor(tags[sl])
            caps_t = torch.tensor(caps[sl]).long()
            lens_t = torch.tensor(lens[sl]).long()
            # pre-permute tags by the decoder's internal length sort
            # (it sorts enc/caps but not tags — SURVEY.md bugs)
            sort_ind = lens_t.sort(dim=0, descending=True).indices
            scores, caps_sorted, dls, alphas, _ = ref(
                enc_t, tags_t[sort_ind], caps_t, lens_t[:, None])
            targets = caps_sorted[:, 1:]
            loss = criterion(
                pack_padded_sequence(scores, dls, batch_first=True).data,
                pack_padded_sequence(targets, dls, batch_first=True).data)
            loss = loss + ((1. - alphas.sum(dim=1)) ** 2).mean()
            optimizer.zero_grad()
            loss.backward()
            for group in optimizer.param_groups:   # reference clip +-5
                for p in group["params"]:
                    if p.grad is not None:
                        p.grad.data.clamp_(-5., 5.)
            optimizer.step()
        if epoch % 10 == 9:
            print(f"  ref epoch {epoch + 1}: loss {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)")
            if float(loss) < 0.05:
                break
    ref.eval()

    cfg = ModelConfig(model_type="attention_scn", vocab_size=V,
                      embed_dim=MID["embd"], attention_dim=MID["att"],
                      decoder_dim=MID["dec"], factored_dim=MID["fac"],
                      semantic_dim=MID["sem_dim"], encoder_dim=MID["enc_dim"],
                      enc_image_size=MID["enc_size"],
                      max_caption_len=MID["max_len"])
    sd = torch_import.extract_state_dict(ref)
    params = convert.decoder_from_torch(sd, cfg)
    wm = word_map(V)
    mismatches = []
    for i in range(8):
        enc_i = enc[i:i + 1].reshape(1, MID["enc_size"], MID["enc_size"],
                                     MID["enc_dim"])
        with torch.no_grad():
            ref_out = ref.sample(5, wm, torch.tensor(enc_i),
                                 torch.tensor(tags[i:i + 1]))
        ref_seq = list(map(int, ref_out[0]))
        out = caption_beam_search(params, cfg, jnp.asarray(enc_i),
                                  jnp.asarray(tags[i:i + 1]),
                                  start_id=V - 2, end_id=V - 1,
                                  beam_cfg=BeamConfig(beam_size=5))
        got = np.asarray(
            out["sequences"][0][:int(out["lengths"][0])]).tolist()
        if got != ref_seq:
            mismatches.append((i, got, ref_seq))
    verdict = "PASS" if not mismatches else f"FAIL {mismatches}"
    print(f"PARITY B (import, dims 256 / V=1024, 8 images bit-for-beam): "
          f"{verdict}")
    return not mismatches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all",
                    choices=("all", "a", "a_train", "a_compare", "b"))
    ap.add_argument("--out", default="/tmp/parity_flagship")
    # VERDICT r4 #5: phase A (export at flagship dims) for all 3 families
    ap.add_argument("--model", default="attention_scn",
                    choices=("attention_scn", "pure_scn", "pure_attention"))
    args = ap.parse_args()
    out = args.out + "_" + args.model
    ok = True
    if args.phase in ("all", "a", "a_train"):
        phase_a_train(out, args.model)
    if args.phase in ("all", "a", "a_compare"):
        # fresh CPU process: the training phase initialised the TPU
        # backend, and JAX cannot switch platforms mid-process
        import subprocess
        r = subprocess.run([sys.executable, __file__, "--phase",
                            "a_compare_inproc", "--out", out,
                            "--model", args.model])
        ok &= (r.returncode == 0)
    if args.phase in ("all", "b"):
        ok &= phase_b()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    import argparse  # noqa: F811  (re-import safe under --phase recursion)
    ap_known = "a_compare_inproc" in sys.argv
    if ap_known:
        idx = sys.argv.index("--out")
        out = sys.argv[idx + 1] if idx + 1 < len(sys.argv) \
            else "/tmp/parity_flagship"
        model = "attention_scn"
        if "--model" in sys.argv:
            model = sys.argv[sys.argv.index("--model") + 1]
        sys.exit(0 if phase_a_compare(out, model) else 1)
    main()
