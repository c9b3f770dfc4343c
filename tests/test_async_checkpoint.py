"""AsyncSaver (core/checkpoint.py): background-thread epoch checkpoints.

Must write the SAME bytes a synchronous save would, stay correct next to
donated train steps (the snapshot is an on-device copy, so donating the
original buffers can't corrupt it), keep submission order, and surface
worker errors on wait().
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indonesian_image_captioning_tpu.core import checkpoint as ckpt_lib


def _state(seed: int):
    k = jax.random.key(seed)
    return {"state": {"params": {"w": jax.random.normal(k, (16, 8)),
                                 "b": jnp.arange(8, dtype=jnp.float32)}},
            "epoch": seed, "epochs_since_improvement": 0,
            "metric": 0.5 + seed}


def test_async_matches_sync(tmp_path):
    state = _state(0)
    ckpt_lib.save_checkpoint(str(tmp_path / "sync"), "m", "d", state, True)
    saver = ckpt_lib.AsyncSaver()
    try:
        saver.submit(str(tmp_path / "async"), "m", "d", state, True)
        saver.wait()
    finally:
        saver.close()
    for best in (False, True):
        a = ckpt_lib.load_checkpoint(str(tmp_path / "sync"), "m", "d",
                                     best=best, template=state)
        b = ckpt_lib.load_checkpoint(str(tmp_path / "async"), "m", "d",
                                     best=best, template=state)
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_snapshot_survives_donation(tmp_path):
    """The critical property: train steps DONATE their state buffers, so
    the saver must not read the originals after submit."""
    state = _state(1)
    want = np.asarray(state["state"]["params"]["w"])

    donating_step = jax.jit(lambda w: w * 0.0 + 7.0, donate_argnums=(0,))
    saver = ckpt_lib.AsyncSaver()
    try:
        saver.submit(str(tmp_path), "m", "d", state, False)
        # immediately clobber + donate the original buffer
        _ = donating_step(state["state"]["params"]["w"])
        saver.wait()
    finally:
        saver.close()
    got = ckpt_lib.load_checkpoint(str(tmp_path), "m", "d", template=state)
    np.testing.assert_array_equal(
        np.asarray(got["state"]["params"]["w"]), want)


def test_last_submit_wins(tmp_path):
    saver = ckpt_lib.AsyncSaver()
    try:
        for seed in range(3):
            saver.submit(str(tmp_path), "m", "d", _state(seed), False)
        saver.wait()
    finally:
        saver.close()
    got = ckpt_lib.load_checkpoint(str(tmp_path), "m", "d",
                                   template=_state(0))
    assert int(got["epoch"]) == 2


def test_worker_error_raises_on_wait(tmp_path):
    bad = tmp_path / "file_not_dir"
    bad.write_text("x")
    saver = ckpt_lib.AsyncSaver()
    try:
        saver.submit(str(bad / "sub"), "m", "d", _state(0), False)
        with pytest.raises(Exception):
            saver.wait()
        # saver is usable again after the error surfaced
        saver.submit(str(tmp_path), "m", "d", _state(5), False)
        saver.wait()
    finally:
        saver.close()
    got = ckpt_lib.load_checkpoint(str(tmp_path), "m", "d",
                                   template=_state(0))
    assert int(got["epoch"]) == 5


def test_trainer_roundtrip_with_async(tmp_path):
    """Tagger trainer end-to-end with async_checkpoint on: the written
    checkpoint resumes and matches the in-memory final state."""
    from indonesian_image_captioning_tpu.core.config import (
        TaggerConfig, tagger_train_config)
    from indonesian_image_captioning_tpu.data.synthetic import (
        make_synthetic_corpus)
    from indonesian_image_captioning_tpu.train import tagger as tagger_train

    data_cfg = make_synthetic_corpus(
        str(tmp_path / "corpus"), str(tmp_path / "scn_data"),
        n_images=6, n_train=4, image_size=32)
    tcfg = tagger_train_config(epochs=2, batch_size=4, print_freq=1,
                               checkpoint_dir=str(tmp_path),
                               async_checkpoint=True)
    state, summary = tagger_train.main(
        data_cfg, tcfg, TaggerConfig(semantic_size=data_cfg.tag_size,
                                     encoder_arch="resnet50"),
        log=lambda s: None)
    name = f"checkpoint_tagger_{data_cfg.data_name}"
    assert os.path.isdir(tmp_path / name)
    restored = ckpt_lib.load_checkpoint(
        str(tmp_path), "tagger", data_cfg.data_name,
        template={"state": state, "epoch": 0,
                  "epochs_since_improvement": 0, "metric": 0.0})
    assert int(restored["epoch"]) == 1
    for a, b in zip(jax.tree.leaves(restored["state"]["params"]),
                    jax.tree.leaves(state["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
