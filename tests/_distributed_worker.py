"""Subprocess entry for the 2-process distributed test.

Runs the PUBLIC ``train.py --mesh`` caption path as one process of a
multi-process JAX job (the TPU-pod-slice topology, SURVEY.md §5 P3) on the
CPU backend with gloo collectives.  Invoked by test_distributed.py with a
JSON config argv; must force the CPU platform itself (no conftest here, and
the machine's sitecustomize pins a TPU backend).
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
    assert jax.device_count() == args["num_processes"]  # 1 CPU device each

    from indonesian_image_captioning_tpu.cli import train as cli_train
    state, summary = cli_train.main([
        "-t", args["model_type"],
        "--data_folder", args["data_folder"],
        "--data_name", args["data_name"],
        "--mesh", f"{jax.device_count()},1",
        "--encoder_dtype", "float32",   # bit-stable across device topologies
        "--epochs", "1", "--batch_size", str(args["batch_size"]),
        "--checkpoint_dir", args["checkpoint_dir"],
        "--model_json", json.dumps(args["model_json"]),
    ])

    import numpy as np
    fc_w = np.asarray(state["params"]["fc"]["w"])
    np.save(args["out"] + ".fc.npy", fc_w)
    with open(args["out"], "w") as f:
        json.dump({"process_index": jax.process_index(),
                   "train_loss": float(summary["train_loss"]),
                   "best_metric": float(summary["best_metric"])}, f)


if __name__ == "__main__":
    main()
