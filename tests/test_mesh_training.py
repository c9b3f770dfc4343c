"""DP/TP training through the PUBLIC surface (round-1 VERDICT task 2).

``python train.py -t attention_scn --mesh 8,1`` (and 4,2 with vocab-sharded
TP) must train end-to-end on the 8-device CPU mesh — mesh construction,
state placement, loader sharding hook and SPMD step all reached from the
CLI, not from test-private wiring.
"""

import json
import os

import numpy as np
import pytest

from indonesian_image_captioning_tpu.data.synthetic import (
    make_synthetic_corpus)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("mesh_corpus")
    out = tmp_path_factory.mktemp("mesh_scn_data")
    return make_synthetic_corpus(str(root), str(out), n_images=16,
                                 n_train=12, image_size=32)


TINY = {"embed_dim": 16, "attention_dim": 16, "decoder_dim": 16,
        "factored_dim": 12, "enc_image_size": 2, "max_caption_len": 12,
        "encoder_arch": "resnet50"}


@pytest.mark.parametrize("mesh", ["8,1", "4,2"])
def test_cli_caption_training_on_mesh(corpus, tmp_path, mesh):
    from indonesian_image_captioning_tpu.cli import train as cli_train

    ckpt = tmp_path / mesh.replace(",", "x")
    ckpt.mkdir()
    state, summary = cli_train.main([
        "-t", "attention_scn",
        "--data_folder", corpus.data_folder,
        "--data_name", corpus.data_name,
        "--mesh", mesh,
        "--epochs", "1", "--batch_size", "8",
        "--checkpoint_dir", str(ckpt),
        "--model_json", json.dumps(TINY),
    ])
    assert np.isfinite(summary["train_loss"])
    name = f"checkpoint_attention_scn_{corpus.data_name}"
    assert os.path.isdir(ckpt / name)
    # params came back usable (vocab-sharded for 4,2): finite and fetchable
    fc_w = np.asarray(state["params"]["fc"]["w"])
    assert np.isfinite(fc_w).all()


def test_cli_tagger_training_on_mesh(corpus, tmp_path):
    from indonesian_image_captioning_tpu.cli import train as cli_train

    state, summary = cli_train.main([
        "-t", "image_tagger",
        "--data_folder", corpus.data_folder,
        "--data_name", corpus.data_name,
        "--mesh", "8,1",
        "--epochs", "1", "--batch_size", "8",
        "--checkpoint_dir", str(tmp_path),
        "--model_json", json.dumps({"encoder_arch": "resnet50"}),
    ])
    assert np.isfinite(summary["train_loss"])
    assert os.path.isdir(tmp_path / f"checkpoint_tagger_{corpus.data_name}")


def test_mesh_dp_matches_single_device(corpus, tmp_path):
    """One DP epoch == one single-device epoch, numerically (same seed,
    same batches; psum gradient reduction must be a no-op semantically)."""
    from indonesian_image_captioning_tpu.core.config import (
        ModelConfig, TrainConfig)
    from indonesian_image_captioning_tpu.data import vocab as vocab_lib
    from indonesian_image_captioning_tpu.train import caption as caption_train

    wm = vocab_lib.load_json(vocab_lib.wordmap_path(
        corpus.data_folder, corpus.data_name))
    cfg = ModelConfig(model_type="pure_scn", vocab_size=len(wm),
                      semantic_dim=2, **{k: v for k, v in TINY.items()
                                         if k != "attention_dim"},
                      attention_dim=16)

    def run(mesh_shape, subdir):
        # f32 encoders: the check is DP *semantics* (psum == no-op), and
        # bf16 convolutions round differently under SPMD batch partitioning
        # — an epoch of Adam then amplifies the epsilon.  f32 is bit-stable
        # across shardings.
        tcfg = TrainConfig(epochs=1, batch_size=8, print_freq=1,
                           mesh_shape=mesh_shape,
                           encoder_dtype="float32",
                           checkpoint_dir=str(tmp_path / subdir))
        os.makedirs(tcfg.checkpoint_dir, exist_ok=True)
        state, _ = caption_train.main("pure_scn", corpus, tcfg,
                                      model_cfg=cfg)
        return state

    s_single = run((1, 1), "single")
    s_mesh = run((8, 1), "mesh")
    a = np.asarray(s_single["params"]["fc"]["w"])
    b = np.asarray(s_mesh["params"]["fc"]["w"])
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_mesh_dp_fused_island_matches_single_device():
    """Pure-DP mesh training runs the fused training-scan kernel PER SHARD
    through a shard_map island inside the GSPMD step (the kernel has no
    partitioning rules of its own).  One step on an (8,1) mesh must match
    one single-device step bit-for-semantics: per-row scan math is
    batch-independent, the losses/Adam run globally outside the island,
    and the island's autodiff psums the weight cotangents."""
    import jax
    import numpy as np

    from indonesian_image_captioning_tpu.core.config import (
        ModelConfig, TrainConfig)
    from indonesian_image_captioning_tpu.core.meshes import make_mesh
    from indonesian_image_captioning_tpu.models import decoders
    from indonesian_image_captioning_tpu.parallel.train_step import (
        make_parallel_caption_train_step)
    from indonesian_image_captioning_tpu.train import steps

    B = 8
    # train_scan_impl="fused" explicitly: "auto" resolves to xla on the
    # CPU test platform, but the kernel pair runs in interpret mode here
    cfg = ModelConfig(model_type="attention_scn", vocab_size=50,
                      embed_dim=24, attention_dim=40, decoder_dim=32,
                      factored_dim=16, semantic_dim=10, encoder_dim=48,
                      max_caption_len=8, train_span=4,
                      train_scan_impl="fused")
    tcfg = TrainConfig(batch_size=B, decoder_lr=1e-3)
    opt = steps.make_optimizer(tcfg.decoder_lr, tcfg.grad_clip)
    # host copies: the parallel step DONATES its substate argument, so
    # each run gets fresh device uploads and the init stays comparable
    params = jax.tree.map(np.asarray,
                          decoders.init_decoder(jax.random.key(0), cfg))
    ks = jax.random.split(jax.random.key(1), 4)
    enc = np.asarray(jax.random.normal(ks[0], (B, 9, cfg.encoder_dim))) * 0.3
    tags = np.asarray(jax.random.uniform(ks[1], (B, cfg.semantic_dim)))
    caps = np.asarray(jax.random.randint(
        ks[2], (B, cfg.max_caption_len), 1, cfg.vocab_size))
    caplens = np.asarray(jax.random.randint(
        ks[3], (B,), 2, cfg.max_caption_len + 1))
    rng = jax.random.key(9)

    def sub():
        return {"params": params, "opt_state": opt.init(params)}

    _, step1 = steps.make_caption_train_step(cfg, tcfg, opt, donate=False)
    s1, m1 = step1(sub(), enc, tags, caps, caplens, rng)

    mesh = make_mesh((8, 1))
    stepm = make_parallel_caption_train_step(cfg, tcfg, opt, mesh, sub(),
                                             shard_vocab=False)
    sm, mm = stepm(sub(), enc, tags, caps, caplens, rng)

    assert abs(float(m1["loss"]) - float(mm["loss"])) < 1e-5
    for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(s1["params"]),
            jax.tree.leaves(sm["params"])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path))
    # the step actually trained (params moved off init)
    moved = sum(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                for a, b in zip(jax.tree.leaves(params),
                                jax.tree.leaves(sm["params"])))
    assert moved > 0.0


def test_eval_caption_on_mesh_matches_single_device(corpus, tmp_path):
    """Mesh-sharded TEST-split evaluation must produce the same scores as
    the single-device run (deterministic beam over identical batches)."""
    import dataclasses

    from indonesian_image_captioning_tpu.core.config import (
        BeamConfig, ModelConfig)
    from indonesian_image_captioning_tpu.core.prng import root_key
    from indonesian_image_captioning_tpu.data import vocab as vocab_lib
    from indonesian_image_captioning_tpu.evaluation import eval_caption
    from indonesian_image_captioning_tpu.train import caption as caption_train
    from indonesian_image_captioning_tpu.train import steps

    wm = vocab_lib.load_json(vocab_lib.wordmap_path(
        corpus.data_folder, corpus.data_name))
    cfg = ModelConfig(model_type="attention_scn", vocab_size=len(wm),
                      semantic_dim=2, **TINY)
    opt = steps.make_optimizer(4e-4, 5.0)
    state = caption_train.init_state(root_key(0), cfg, opt)
    kw = dict(beam_cfg=BeamConfig(beam_size=3, max_steps=11), batch_size=8,
              log=lambda s: None)
    s1 = eval_caption.evaluate(state, cfg, corpus, wm, output_root=None,
                               **kw)
    s8 = eval_caption.evaluate(state, cfg, corpus, wm,
                               output_root=str(tmp_path / "out"),
                               mesh_shape=(8, 1), **kw)
    for k in s1:
        assert abs(s1[k] - s8[k]) < 1e-9, (k, s1[k], s8[k])


def test_mesh_finetune_step_matches_single_device(corpus):
    """fine_tune_encoder on a DP mesh: one joint decoder+ResNet step on an
    (8,1) mesh must match the single-device step (replicated encoder
    params, psum'd grads, BatchNorm batch stats reduced over the GLOBAL
    batch — synchronized BN, not per-shard stats).

    The parity half uses SGD so updates are lr*grad — a direct elementwise
    check of the psum'd GRADIENTS.  (Under Adam the first step is
    sign(g)-scaled, so the ~0.2% of the 23.5M ResNet gradient elements
    that sit at reduction-order noise flip sign and swamp any elementwise
    comparison; Adam-on-mesh is covered by the epoch-level DP test above
    and the fine-tune CLI test below.)"""
    import jax
    import optax

    from indonesian_image_captioning_tpu.core.config import (
        ModelConfig, TrainConfig)
    from indonesian_image_captioning_tpu.core.meshes import make_mesh
    from indonesian_image_captioning_tpu.core.prng import root_key
    from indonesian_image_captioning_tpu.parallel.train_step import (
        make_parallel_caption_finetune_step)
    from indonesian_image_captioning_tpu.train import caption as ct
    from indonesian_image_captioning_tpu.train import steps

    rng = np.random.default_rng(3)
    cfg = ModelConfig(model_type="attention_scn", vocab_size=30,
                      embed_dim=16, attention_dim=16, decoder_dim=16,
                      factored_dim=8, semantic_dim=4, enc_image_size=2,
                      max_caption_len=8, encoder_arch="resnet50")
    tcfg = TrainConfig(batch_size=8, fine_tune_encoder=True)
    dec_opt = optax.sgd(tcfg.decoder_lr)
    enc_opt = optax.sgd(tcfg.encoder_lr)
    base = ct.init_state(root_key(0), cfg, dec_opt)
    base["enc_opt_state"] = enc_opt.init(base["encoder"])
    keys = ("params", "opt_state", "encoder", "encoder_stats",
            "enc_opt_state")
    # host copies: both steps donate their state argument
    host = jax.tree.map(np.asarray, {k: base[k] for k in keys})

    images = rng.integers(0, 256, (8, 3, 32, 32)).astype(np.uint8)
    tags = rng.random((8, cfg.semantic_dim)).astype(np.float32)
    caps = rng.integers(1, 30, (8, 8)).astype(np.int32)
    caplens = rng.integers(3, 9, (8,)).astype(np.int32)
    key = jax.random.key(7)

    def fresh():
        return jax.tree.map(np.copy, host)

    _, step1 = steps.make_caption_finetune_train_step(
        cfg, tcfg, dec_opt, enc_opt, donate=False)
    s1, m1 = step1(fresh(), images, tags, caps, caplens, key)
    _, m1b = step1(s1, images, tags, caps, caplens, key)

    mesh = make_mesh((8, 1))
    _, stepm = make_parallel_caption_finetune_step(
        cfg, tcfg, dec_opt, enc_opt, mesh, fresh(), shard_vocab=False)
    sm, mm = stepm(fresh(), images, tags, caps, caplens, key)
    _, mmb = stepm(jax.tree.map(np.asarray, sm), images, tags, caps,
                   caplens, key)

    assert abs(float(m1["loss"]) - float(mm["loss"])) < 1e-5
    # second-step loss: compounds any structural error (missing psum,
    # per-shard BN stats) through the first update
    assert abs(float(m1b["loss"]) - float(mmb["loss"])) < 1e-4, (
        float(m1b["loss"]), float(mmb["loss"]))
    for part in ("params", "encoder", "encoder_stats"):
        for (path, a), b in zip(
                jax.tree_util.tree_leaves_with_path(s1[part]),
                jax.tree.leaves(sm[part])):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
                err_msg=f"{part}{jax.tree_util.keystr(path)}")
    # the encoder actually trained (layer4 moved off init)
    moved = sum(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                for a, b in zip(
                    jax.tree.leaves(host["encoder"]["resnet"]["layer4"]),
                    jax.tree.leaves(sm["encoder"]["resnet"]["layer4"])))
    assert moved > 0.0


def test_cli_caption_finetune_on_mesh(corpus, tmp_path):
    """--fine_tune_encoder --mesh 8,1 trains end-to-end from the CLI
    (round-1 VERDICT: this path used to raise NotImplementedError)."""
    from indonesian_image_captioning_tpu.cli import train as cli_train

    state, summary = cli_train.main([
        "-t", "attention_scn",
        "--data_folder", corpus.data_folder,
        "--data_name", corpus.data_name,
        "--mesh", "8,1", "--fine_tune_encoder",
        "--epochs", "1", "--batch_size", "8",
        "--checkpoint_dir", str(tmp_path),
        "--model_json", json.dumps(TINY),
    ])
    assert np.isfinite(summary["train_loss"])
    assert "enc_opt_state" in state


def test_tp_coco_vocab_sharded_train_step():
    """TP at the REAL COCO-ID vocab (V=38,732, reference
    corpus_score.py:110-118) on the 8-device CPU mesh (VERDICT r4 #3):
    builds the vocab-sharded train step on mesh (4,2), asserts the
    fc/embedding/Adam-moment shards are actually V/m per device, runs a
    step through the vocab-parallel chunked CE island
    (steps.make_chunked_head_island — the sharded logits never exist),
    and matches the single-device dense-head step's loss and metrics."""
    import jax

    from indonesian_image_captioning_tpu.core.config import (
        ModelConfig, TrainConfig)
    from indonesian_image_captioning_tpu.core.meshes import make_mesh
    from indonesian_image_captioning_tpu.models import decoders
    from indonesian_image_captioning_tpu.parallel import sharding as sh
    from indonesian_image_captioning_tpu.parallel.train_step import (
        make_parallel_caption_train_step)
    from indonesian_image_captioning_tpu.train import steps

    V = 38_732
    B = 8
    cfg = ModelConfig(model_type="attention_scn", vocab_size=V,
                      embed_dim=16, attention_dim=16, decoder_dim=16,
                      factored_dim=12, semantic_dim=10, encoder_dim=24,
                      max_caption_len=12, dropout=0.0)
    rng = np.random.default_rng(11)
    enc = np.asarray(rng.standard_normal((B, 9, cfg.encoder_dim)),
                     np.float32) * 0.3
    tags = rng.random((B, cfg.semantic_dim)).astype(np.float32)
    caps = rng.integers(1, V, (B, cfg.max_caption_len)).astype(np.int32)
    caplens = rng.integers(3, 13, (B,)).astype(np.int32)
    key = jax.random.key(5)
    params = jax.tree.map(np.asarray,
                          decoders.init_decoder(jax.random.key(0), cfg))

    # --- single-device reference step (dense head) ---
    tcfg_d = TrainConfig(batch_size=B, head_impl="dense")
    opt = steps.make_optimizer(4e-4, 5.0)
    _, step1 = steps.make_caption_train_step(cfg, tcfg_d, opt, donate=False)
    sub1 = {"params": params, "opt_state": opt.init(params)}
    s1, m1 = step1(sub1, enc, tags, caps, caplens, key)

    # --- (4,2) mesh, vocab-sharded TP, chunked vocab-parallel head ---
    tcfg = TrainConfig(batch_size=B, mesh_shape=(4, 2),
                       head_impl="chunked", head_tile=2048)
    mesh = make_mesh((4, 2))
    sub = {"params": params, "opt_state": opt.init(params)}
    placed = sh.place_state(mesh, sub, shard_vocab=True)

    half = V // 2
    fc_shard = placed["params"]["fc"]["w"].addressable_shards[0].data.shape
    emb_shard = placed["params"]["embedding"].addressable_shards[0].data.shape
    assert fc_shard == (cfg.decoder_dim, half), fc_shard
    assert emb_shard == (half, cfg.embed_dim), emb_shard
    # Adam moments mirror the param sharding
    mus = [s.inner_state[0].mu for s in placed["opt_state"]
           if hasattr(s, "inner_state")]
    assert mus and mus[0]["fc"]["w"].addressable_shards[0].data.shape == \
        (cfg.decoder_dim, half)

    stepm = make_parallel_caption_train_step(cfg, tcfg, opt, mesh, sub,
                                             shard_vocab=True)
    sm, mm = stepm(placed, enc, tags, caps, caplens, key)

    assert np.isfinite(float(mm["loss"]))
    assert abs(float(m1["loss"]) - float(mm["loss"])) < 1e-4, (
        float(m1["loss"]), float(mm["loss"]))
    assert abs(float(m1["top5"]) - float(mm["top5"])) < 1e-3
    assert abs(float(m1["n_tokens"]) - float(mm["n_tokens"])) < 0.5

    # updated fc stays vocab-sharded and matches the single-device update
    new_fc = sm["params"]["fc"]["w"]
    assert new_fc.addressable_shards[0].data.shape == \
        (cfg.decoder_dim, half)
    np.testing.assert_allclose(np.asarray(new_fc),
                               np.asarray(s1["params"]["fc"]["w"]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sm["params"]["embedding"]),
                               np.asarray(s1["params"]["embedding"]),
                               rtol=2e-4, atol=2e-5)
