"""TEST-split caption evaluation with batched beam search + metric dumps.

Reference behaviour (eval_caption.py:30-165): beam-decode every TEST image,
build references from the image's 5 ground-truth captions (special tokens
stripped), run the nlg-eval metric suite, and dump
``evaluation/<timestamp>/{references,hypotheses,scores}.json``.

TPU redesign: the reference decodes ONE caption-entry at a time (bs=1
DataLoader over the caption-expanded dataset — each image is decoded 5x).
Here each image is decoded ONCE and images decode in batches through the
jitted fixed-shape beam engine — the dominant serving-throughput win.
"""

from __future__ import annotations

import datetime
import json
import os
from typing import Dict, Optional

import jax
import numpy as np

from ..core.config import BeamConfig, DataConfig, ModelConfig
from ..core.tokens import END_TOKEN, PAD_ID, START_TOKEN
from ..data import vocab as vocab_lib
from ..data.datasets import CaptionDataset
from ..decode.api import caption_beam_search
from ..models import encoders
from ..train.steps import prep_images
from . import metrics as metrics_lib


def evaluate(state: Dict, cfg: ModelConfig, data_cfg: DataConfig,
             word_map: Dict[str, int],
             beam_cfg: BeamConfig = BeamConfig(),
             batch_size: int = 16,
             output_root: Optional[str] = "evaluation",
             include_cider: bool = False,
             mesh_shape=None,
             log=print) -> Dict[str, float]:
    """state: {"params", "encoder", "encoder_stats", "tagger",
    "tagger_stats"} (tagger entries unused for pure_attention).

    mesh_shape (d, m): shard each eval batch over the mesh "data" axis —
    serving scale-out; the SPMD programs produce identical sequences to the
    single-device run (deterministic beam).
    """
    ds = CaptionDataset(data_cfg.data_folder, data_cfg.data_name, "TEST")
    rev_word_map = vocab_lib.invert(word_map)
    start_id, end_id = word_map[START_TOKEN], word_map[END_TOKEN]
    skip = {start_id, end_id, PAD_ID}

    # Three SEPARATE jitted programs, with model state as jit ARGUMENTS:
    #  * closure capture would bake ~0.5 GB of weights into the HLO as
    #    constants (catastrophic for the remote compile path);
    #  * two ResNet-152s in ONE XLA program blows compile time up ~40x on
    #    this backend, while intermediates between jits stay on device.
    @jax.jit
    def run_encoder(st, images_u8):
        images = prep_images(images_u8)
        return encoders.apply_encoder_caption(
            st["encoder"], st["encoder_stats"], images, train=False,
            enc_image_size=cfg.enc_image_size, arch=cfg.encoder_arch)[0]

    @jax.jit
    def run_tagger(st, images_u8):
        images = prep_images(images_u8)
        return encoders.apply_encoder_tagger(
            st["tagger"], st["tagger_stats"], images, train=False,
            arch=cfg.encoder_arch)[0]

    def _beam(st, enc_out, tags):
        out = caption_beam_search(st["params"], cfg, enc_out, tags,
                                  start_id=start_id, end_id=end_id,
                                  beam_cfg=beam_cfg)
        return out["sequences"], out["lengths"]

    run_beam = jax.jit(_beam)

    def encode_and_decode(st, images_u8):
        enc_out = run_encoder(st, images_u8)
        if cfg.uses_tags:
            tags = run_tagger(st, images_u8)
        else:
            tags = jax.numpy.zeros((images_u8.shape[0], cfg.semantic_dim),
                                   jax.numpy.float32)
        return run_beam(st, enc_out, tags)

    mesh, place_images = None, jax.device_put
    if mesh_shape is not None and tuple(mesh_shape) != (1, 1):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..core.meshes import DATA_AXIS, make_mesh
        mesh = make_mesh(tuple(mesh_shape))
        if batch_size % mesh_shape[0]:
            raise ValueError(f"batch_size {batch_size} must be divisible "
                             f"by the data axis {mesh_shape[0]}")
        state = jax.device_put(
            state, jax.tree.map(lambda _: NamedSharding(mesh, P()), state))

        # shard_map the decode over the data axis: each shard beam-decodes
        # its local batch independently (per-image decode needs no
        # collectives), so the Pallas fused-step kernel runs PER SHARD
        # instead of hitting the SPMD partitioner as an opaque custom call
        # (which would replicate the batch).  The fused-vs-steps gate
        # evaluates on the LOCAL batch inside the shard.
        # the decode is collective-free, so disable the varying-manual-
        # axes check (the while_loop carry starts from replicated
        # constants, which the checker rejects); kwarg name differs
        # across jax versions.
        from ..core.meshes import get_shard_map
        shard_map, flag = get_shard_map()
        run_beam = jax.jit(shard_map(
            _beam, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS), P(DATA_AXIS)), **{flag: False}))

        def place_images(x):
            shd = NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))
            if jax.process_count() > 1:
                # multi-host: every process feeds its mesh-derived slice
                # of the global batch (SURVEY.md §5 P3)
                from ..core.meshes import process_data_slice
                blk, nblk = process_data_slice(mesh)
                local = x.shape[0] // nblk
                return jax.make_array_from_process_local_data(
                    shd, x[blk * local:(blk + 1) * local])
            return jax.device_put(x, shd)
    else:
        state = jax.device_put(state)

    references, hypotheses = [], []
    n_images = ds.num_images
    for b0 in range(0, n_images, batch_size):
        idx = np.arange(b0, min(b0 + batch_size, n_images))
        pad = batch_size - len(idx)
        img_idx = np.concatenate([idx, np.zeros(pad, np.int64)]) if pad else idx
        images = place_images(np.stack([ds.image(int(i)) for i in img_idx]))
        out = encode_and_decode(state, images)
        if mesh is not None and jax.process_count() > 1:
            # all-gather the data-sharded outputs so every process scores
            # the full hypothesis set identically
            from ..core.meshes import replicate_for_host_fetch
            out = replicate_for_host_fetch(out, mesh)
        seqs, lens = jax.device_get(out)
        for row, i in enumerate(idx):
            seq = seqs[row][:int(lens[row])]
            hypotheses.append([rev_word_map[int(w)] for w in seq
                               if int(w) not in skip])
            cap_rows = ds.captions[i * ds.cpi:(i + 1) * ds.cpi]
            references.append([
                [rev_word_map[int(w)] for w in cap if int(w) not in skip]
                for cap in cap_rows])
        if (b0 // batch_size) % 10 == 0:
            log(f"EVALUATING AT BEAM SIZE {beam_cfg.beam_size}: "
                f"{b0 + len(idx)}/{n_images}")

    scores = metrics_lib.compute_metrics(references, hypotheses,
                                         include_cider=include_cider)
    log(str(scores))

    if output_root and jax.process_index() == 0:
        # process 0 writes artifacts (every process computed identical
        # scores from the all-gathered hypotheses)
        # artifact layout parity: eval_caption.py:146-163 — per-run dir with
        # `{type}_beam_{k}_{references,hypotheses,scores}.json` files
        stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
        out_dir = os.path.join(output_root, stamp)
        os.makedirs(out_dir, exist_ok=True)
        base = f"{cfg.model_type}_beam_{beam_cfg.beam_size}"
        ref_strs = [[" ".join(r) for r in refs] for refs in references]
        transposed = [[refs[i] for refs in ref_strs]
                      for i in range(ds.cpi)]
        with open(os.path.join(out_dir, f"{base}_references.json"),
                  "w") as f:
            json.dump(transposed, f)
        with open(os.path.join(out_dir, f"{base}_hypotheses.json"),
                  "w") as f:
            json.dump([" ".join(h) for h in hypotheses], f)
        with open(os.path.join(out_dir, f"{base}_scores.json"), "w") as f:
            json.dump(scores, f)
    return scores
