"""Subprocess entry for the multi-process distributed tests.

Runs the PUBLIC ``train.py --mesh`` paths as one process of a multi-process
JAX job (the TPU-pod-slice topology, SURVEY.md §5 P3) on the CPU backend
with gloo collectives.  Invoked by test_distributed.py with a JSON config
argv; must force the CPU platform itself (no conftest here, and the
machine's sitecustomize pins a TPU backend).  The pod-shaped config runs
N processes x L local devices (XLA_FLAGS device count, set by the test)
with an optional colmajor mesh so TP collectives cross the process
boundary, the fine-tune recipe, checkpoint resume, and a mesh-sharded
eval_caption — all through the public CLI surfaces.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = json.loads(sys.argv[1])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from indonesian_image_captioning_tpu.core.meshes import (
        initialize_distributed)
    initialize_distributed(
        coordinator_address=f"127.0.0.1:{args['port']}",
        num_processes=args["num_processes"],
        process_id=args["process_id"])
    assert jax.process_count() == args["num_processes"]
    local = args.get("local_devices", 1)
    assert jax.local_device_count() == local, jax.local_device_count()
    assert jax.device_count() == args["num_processes"] * local

    mesh = args.get("mesh") or f"{jax.device_count()},1"
    from indonesian_image_captioning_tpu.cli import train as cli_train
    argv = [
        "-t", args["model_type"],
        "--data_folder", args["data_folder"],
        "--data_name", args["data_name"],
        "--mesh", mesh,
        "--encoder_dtype", "float32",   # bit-stable across device topologies
        "--epochs", str(args.get("epochs", 1)),
        "--batch_size", str(args["batch_size"]),
        "--checkpoint_dir", args["checkpoint_dir"],
        "--model_json", json.dumps(args["model_json"]),
    ]
    if args.get("mesh_order"):
        argv += ["--mesh_order", args["mesh_order"]]
    if args.get("fine_tune"):
        argv += ["--fine_tune_encoder"]
    if args.get("tagger_checkpoint"):
        argv += ["--tagger_checkpoint", args["tagger_checkpoint"]]
    if args.get("resume"):
        argv += ["--resume"]
    state, summary = cli_train.main(argv)

    import numpy as np
    fc = state["params"]["fc"]["w"]
    if (isinstance(fc, jax.Array) and not fc.is_fully_addressable
            and not fc.sharding.is_fully_replicated):
        # multi-host TP: the vocab-sharded fc spans both processes
        from jax.experimental import multihost_utils
        fc = multihost_utils.process_allgather(fc, tiled=True)
    fc_w = np.asarray(fc)
    np.save(args["out"] + ".fc.npy", fc_w)
    result = {"process_index": jax.process_index(),
              "train_loss": float(summary["train_loss"]),
              "best_metric": float(summary["best_metric"]),
              "epoch": int(summary.get("epoch", 0))}

    if args.get("eval"):
        # mesh-sharded eval_caption under the same process group: the
        # public evaluation path with per-process input slices and
        # all-gathered hypotheses, on the just-trained state
        from indonesian_image_captioning_tpu.core.config import (
            BeamConfig, DataConfig, ModelConfig)
        from indonesian_image_captioning_tpu.data import vocab as vocab_lib
        from indonesian_image_captioning_tpu.evaluation import eval_caption
        wm = vocab_lib.load_json(vocab_lib.wordmap_path(
            args["data_folder"], args["data_name"]))
        cfg = ModelConfig(model_type=args["model_type"],
                          vocab_size=len(wm), **args["model_json"])
        scores = eval_caption.evaluate(
            state, cfg,
            DataConfig(data_folder=args["data_folder"],
                       data_name=args["data_name"]),
            wm, beam_cfg=BeamConfig(beam_size=3),
            batch_size=args["batch_size"],
            # eval shards over data only, across ALL global devices so
            # both processes hold addressable rows
            mesh_shape=(jax.device_count(), 1),
            output_root=None, log=lambda *a: None)
        result["eval_bleu4"] = float(scores.get("Bleu_4", -1))

    with open(args["out"], "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
