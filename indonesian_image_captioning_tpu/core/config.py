"""Typed configuration for models, data and training.

Replaces the reference's two-tier config (argparse flags on CLI scripts plus
hard-coded module-level globals in trains/*.py, e.g. trains/attention_scn.py:25-61)
with dataclasses.  Every default below reproduces the reference recipe so that
`TrainConfig()` trains exactly what `python train.py -t attention_scn` trained.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple, Union


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Dimensions of the caption models.

    Defaults mirror trains/attention_scn.py:31-36 and utils/loader.py:12-17
    in the reference (emb/attention/decoder/factor dims all 512, 1000 semantic
    concepts, dropout 0.5, ResNet feature dim 2048, 14x14 feature map).
    """

    model_type: str = "attention_scn"  # pure_scn | pure_attention | attention_scn
    vocab_size: int = 0                # filled in from the wordmap
    embed_dim: int = 512
    attention_dim: int = 512
    decoder_dim: int = 512
    factored_dim: int = 512
    semantic_dim: int = 1000
    encoder_dim: int = 2048
    enc_image_size: int = 14
    dropout: float = 0.5
    max_caption_len: int = 52          # <start> + 50 words + <end>
    # Compute dtype for the decoder scan / beam search.  Params stay fp32.
    dtype: str = "float32"
    # ResNet variant backing the caption/tagger encoders (resnet152 parity
    # default; smaller variants for tests/smoke runs).
    encoder_arch: str = "resnet152"
    # Use the fused Pallas SCN decode-step kernel (ops/scn_pallas.py) in
    # beam search instead of the XLA step.  Measured SLOWER than XLA at
    # flagship dims (1.7-2.4 vs 1.2-1.3 ms/step, B=1024/bf16/v5e) — XLA's
    # fusion of the 4 fused matmuls is already near its roofline.  Opt-in.
    fused_cell: bool = False
    # Attention-step implementation for beam search (all exact,
    # tests/test_attention_pallas.py):
    #   "auto"       — "pallas_mxu" on TPU, "xla" on CPU (where Pallas
    #                  would run in slow interpret mode); resolved once in
    #                  decoders.make_beam_step
    #   "xla"        — attend, (B, K, P, A) relu layout (round-1 default)
    #   "xla_pk"     — attend_pk, (B, P, K, A) layout: beams innermost so
    #                  the fused consumer re-reads enc_att rows from
    #                  registers instead of HBM
    #   "pallas"     — ops/attention_pallas.attend_fused (VPU lane-reduce)
    #   "pallas_mxu" — attend_fused_mxu (full_att contraction on the MXU)
    # Full-decode ground truth (v5e, sparse+iterative head, bf16,
    # 2026-08-16): B=1024 — xla 270.1 ms, xla_pk 248.5, pallas 249.1,
    # pallas_mxu 248.1;  B=2048 — xla_pk 523.2 ms (3914 captions/s),
    # pallas 510.2 (4014), pallas_mxu 510.6 (4011).  The round-1 verdict
    # ("XLA attend wins, 2.4 vs 5.7 ms") inverted once the head stopped
    # dominating the loop: both Pallas attention kernels now beat XLA
    # in-loop, so the MXU-contraction kernel is the TPU default.
    attention_impl: str = "auto"
    # Sparse beam head: per-lane top-k of the logprobs feeds the beam's flat
    # merge K*k candidates instead of the K*V dense table (decode/beam.py
    # module docstring proves exactness, ties included).  With the
    # lax.top_k backend it lost to dense in-loop (round 1: 348 vs 294
    # ms/batch), but with the extract-max backends below it wins — see the
    # measurement table under topk_backend.  Default ON.
    sparse_head: bool = True
    # Backend for the per-row top-k feeding the head (and the beam's flat
    # merge).  The beam needs only k <= 8 winners per row, so extract-max
    # backends beat lax.top_k's sort-style lowering; all three are exact
    # and bitwise-identical, ties included (ops/topk_pallas.py,
    # tests/test_topk.py):
    #   "iterative" — k rounds of XLA max/argmax/mask (default),
    #   "pallas"    — single-HBM-pass Pallas kernel,
    #   "lax"       — jax.lax.top_k.
    # Full-decode measurements (v5e, B=1024, K=5, V=6763, bf16,
    # tools/profile_topk.py --section decode, 2026-08-16):
    #   dense+lax 303.5 ms (the old default) · dense+iterative 303.8 ·
    #   dense+pallas 329.4 · sparse+lax 355.1 · sparse+pallas 289.2 ·
    #   sparse+iterative 271.1 ms  →  sparse_head=True +
    #   topk_backend="iterative" is the production default (+12%
    #   captions/s over round 1).
    topk_backend: str = "iterative"
    # Beam-decode implementation:
    #   "steps" — the step-loop engine (decode/beam.py): a lax.while_loop
    #             whose body runs one decode step; re-reads enc/enc_att
    #             from HBM every step.
    #   "fused" — the full-decode Pallas megakernel (ops/decode_pallas.py):
    #             every beam step runs on-chip with the encoder state
    #             VMEM-resident; selection records replay through the same
    #             bookkeeping (decode/replay.py).  attention_scn only, no
    #             alpha recording.  Semantically validated
    #             (tests/test_decode_fused.py) but measured 4.2x SLOWER
    #             than the step engine at bench dims (1049 vs 248 ms/batch,
    #             B=1024 bf16 v5e, 2026-08-17): with only G*K = 80 rows
    #             per chunk the per-step weight matmuls and the full-width
    #             vocab top-k lose more to poor utilisation than the
    #             eliminated 1.09 GB/step enc re-read saves.  Kept opt-in
    #             as the base for future single-pass head/attention work.
    #   "fused_step" — ONE Pallas kernel per decode step (ops/
    #             step_pallas.py): attention + f_beta + SCN cell + vocab
    #             head + per-lane top-K, gridded over image chunks
    #             (VMEM-budgeted tile, G=32 at bf16 flagship dims) so the
    #             next chunk's encoder DMA overlaps the current chunk's
    #             MXU/VPU work (the step approaches max(DMA, compute)
    #             instead of their sum).  All three decoder families
    #             (attention_scn, pure_attention LSTM, pure_scn without
    #             the attention stage); no alpha recording; composes
    #             with enc_quant="int8" (quantized state inside the
    #             kernel).  Measured vs "steps" (v5e, K=5, 2026-08-17):
    #             attention_scn bf16 B=1024 5218 vs 4085 captions/s
    #             (+27%); f32 B=256 2736 vs 2047 (+34%); COCO V=38,732
    #             bf16 B=1024 3131 vs 1501 (+109%); pure_attention bf16
    #             B=2048 5906 vs 4199 (+41%); pure_scn 12280 vs 7052
    #             (+74%).
    #             Candidate scores replicate log_softmax's exact float
    #             association (max-shifted logits − log-sum): at f32 it
    #             is bit-for-beam with the step engine under the SAME
    #             attention backend (tests/test_step_fused.py, XLA
    #             attention).  The TPU step engine's pallas_mxu
    #             attention has its own FP ordering, and at bf16 the
    #             steps path rounds log-softmax to bf16 — in both cases
    #             near-ties can resolve differently between the two
    #             exact paths (the standard serving-precision contract).
    #   "fused_span" — S consecutive steps per kernel call (ops/
    #             span_pallas.py): the step kernel's streamed windows
    #             plus the megakernel's in-kernel selection, so the
    #             per-step encoder DMA is divided by S=decode_span while
    #             chunks stay MXU-sized and the grid pipeline keeps
    #             overlapping.  attention_scn + pure_attention; no alpha
    #             recording, no int8 state; exact vs the engine at f32
    #             (tests/test_span_fused.py; on-chip compiled records
    #             match interpret bit-for-bit, tools/exp_span_compiled.py,
    #             after the one-hot payload-precision fix).  Measured vs
    #             fused_step (v5e, K=5, S=4, 2026-08-18): bf16 B=1024
    #             5655 vs 5228 captions/s (+8.2%); bf16 B=2048 6106 vs
    #             5760 (+6.0%); f32 B=256 3218 vs 2914 (+10.4%);
    #             pure_attention bf16 B=2048 6429 vs 5943 (+8.2%).  S sweep
    #             at B=1024: S=2 +2.7%, S=4 +8.2%, S=8 +5.3% (and a 10-min
    #             Mosaic compile) — S=4 is the optimum.  Ineligible
    #             shapes (pure_scn, alphas, int8 state, COCO-scale vocab
    #             where the embedding+fc tables blow VMEM) fall back to
    #             fused_step.
    #   "auto"  — best eligible rung on TPU: "fused_span", else
    #             "fused_step", else "steps" (always "steps" on CPU).
    decode_impl: str = "auto"
    # Steps per span-kernel call for decode_impl="fused_span".
    decode_span: int = 4
    # Window pipelining inside the fused step kernel (attention models,
    # unquantized state only; ignored elsewhere).  "auto": Mosaic's block
    # pipeline streams the per-chunk enc/enc_att windows.  "manual": those
    # two inputs stay in HBM and the kernel double-buffers them itself
    # with explicit make_async_copy DMA — one contiguous copy per window
    # per chunk, issued a chunk ahead.  Both modes run the same compute
    # body and are bit-identical (tests/test_step_fused.py); this is
    # purely a perf knob (measured in BASELINE.md).
    step_pipeline: str = "auto"           # "auto" | "manual"
    # Encoder-state precision for beam decode (serving knob).  The
    # attention step is ~89% HBM DMA of the loop-invariant enc/enc_att
    # (tools/exp_attend_parts.py); "int8" stores both quantized with
    # per-(image, pixel) symmetric scales — half the bytes, ~0.4% relative
    # activation error (ops/attention_pallas.attend_fused_q; inside the
    # fused step kernel via ops/step_pallas.fused_decode_step_q).  Lossy:
    # beam picks can differ from the bf16 path in near-ties.  Default off
    # and measured SLOWER than bf16 everywhere (2026-08-17, B=2048 v5e:
    # int8+fused_step 5233 vs bf16+fused_step 5660 captions/s — the
    # fused kernel already overlaps the DMA with compute, so halving the
    # bytes buys nothing while the dequant VPU passes add cost; int8 on
    # the steps engine 4089).  Kept for HBM-capacity-constrained serving
    # (half-size encoder state); eval paths keep full precision.
    enc_quant: str = "none"               # "none" | "int8"
    # Teacher-forcing scan implementation for training/eval forwards:
    #   "xla"   — masked lax.scan with jax.checkpoint(checkpoint_dots)
    #             rematerialisation (models/decoders.teacher_forcing).
    #   "fused" — the fused training-scan kernel pair (ops/train_pallas.py,
    #             a jax.custom_vjp): grid (image chunks, time spans) with
    #             spans innermost, so the enc/enc_att windows stay
    #             VMEM-resident across the WHOLE scan of a chunk — the
    #             forward and backward each read the ~1 GB encoder state
    #             once per chunk instead of once per step (the measured
    #             DMA floor of the XLA scan); weight gradients leave the
    #             kernel as row-factor streams and become full-batch MXU
    #             matmuls.  Cached-epoch train step at b1024 bf16:
    #             147 ms vs 258 XLA (+75%, 6,962 imgs/s).  attention_scn
    #             only; gradients match XLA within float reassociation
    #             (tests/test_train_fused.py); no d_enc cotangent, so the
    #             fine-tune-encoder path (teacher_forcing(enc_grad=True))
    #             always keeps XLA.
    #   "auto"  — "fused" on TPU where eligible, else "xla".  Default:
    #             the kernel pair wins at both training dtypes (f32:
    #             360 vs 599 ms, +66%) and matches XLA's losses.
    train_scan_impl: str = "auto"
    # Steps per time-span block of the fused training scan.
    train_span: int = 4
    # Embedding-table GRADIENT implementation for teacher-forced training:
    #   "onehot" — one_hot(ids)^T @ g MXU contraction (vocab-tiled above
    #              2^30 one-hot elements) — the production default.
    #   "pallas" — VMEM-accumulator one-hot-tile kernel
    #              (ops/embed_grad_pallas.py).  Honest negative: in-step
    #              A/B at b1024 flagship bf16 measured onehot 141.5 vs
    #              pallas 142.7 ms — XLA fuses the one-hot contraction
    #              in step context, so the kernel buys nothing (its 33 ms
    #              standalone "cost" was a fusion-context artifact; the
    #              kernel itself runs 43 ms standalone).  Kept opt-in as
    #              the base for a future fused scan-bwd + embed-grad
    #              pass; single-device programs only.
    #   "auto"   — "onehot".
    embed_grad_impl: str = "auto"

    @property
    def num_pixels(self) -> int:
        return self.enc_image_size * self.enc_image_size

    @property
    def uses_tags(self) -> bool:
        return self.model_type in ("pure_scn", "attention_scn")

    @property
    def uses_attention(self) -> bool:
        return self.model_type in ("pure_attention", "attention_scn")


@dataclasses.dataclass(frozen=True)
class TaggerConfig:
    """EncoderTagger dims (reference models/encoders/tagger.py:14-30)."""

    semantic_size: int = 1000
    dropout: float = 0.15
    feature_dim: int = 2048
    encoder_arch: str = "resnet152"


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset artifact locations (reference trains/attention_scn.py:26-28)."""

    data_folder: str = "./scn_data"
    data_name: str = "flickr10k_5_cap_per_img_5_min_word_freq"
    captions_per_image: int = 5
    image_size: int = 256
    tag_size: int = 1000


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training recipe.  Defaults per reference trains/attention_scn.py:42-57
    (caption models) — the tagger recipe overrides epochs=10, lr=1e-4
    (trains/tagger.py:35-42)."""

    epochs: int = 12
    batch_size: int = 32
    encoder_lr: float = 1e-4
    decoder_lr: float = 4e-4
    grad_clip: float = 5.0
    alpha_c: float = 1.0               # doubly-stochastic attention regulariser
    lr_decay_factor: float = 0.8       # x0.8 every 8 stale epochs
    lr_decay_every_stale: int = 8
    early_stop_stale: int = 20
    print_freq: int = 100
    fine_tune_encoder: bool = False
    seed: int = 0
    checkpoint_dir: str = "."
    resume: Optional[str] = None
    # Parallelism: data-parallel axis size (1 = single chip).  The mesh is
    # (data, model); model-axis sharding is applied to the vocab projection.
    mesh_shape: Tuple[int, int] = (1, 1)
    # device enumeration order of the mesh: "rowmajor" keeps TP groups on
    # host-local devices; "colmajor" strides the model axis across hosts
    # (core/meshes.make_mesh)
    mesh_order: str = "rowmajor"
    # Compute dtype for the FROZEN encoder/tagger forwards during caption
    # training (they take ~85% of the step in f32; bf16 is 1.85x faster on
    # v5e).  The differentiated decoder stays f32.  Set "float32" for
    # bit-exact parity with the reference's f32 encoder.
    encoder_dtype: str = "bfloat16"
    # Mixed-precision decoder training: "bfloat16" runs the differentiated
    # decoder scan (embedding, attention, cell, vocab head) in bf16 with
    # f32 master params/Adam moments — params are cast inside the loss so
    # gradients come back f32; the CE/alpha losses compute in f32 on the
    # cast-back predictions.  Measured (v5e, 2026-08-17): B=256 decoder
    # step 218 -> 175 ms (-20%), full batch 725 -> 823 imgs/s; B=128
    # within noise (the 51-step scan is latency-bound there).  Default
    # f32: bit-parity with the reference's training numerics (the
    # serving decode is bf16 regardless).
    decoder_dtype: str = "float32"
    # Mixed-precision TAGGER training (the tagger recipe trains the
    # ResNet-152 itself, so this is the trained-model analogue of
    # decoder_dtype): "bfloat16" runs the differentiated encoder fwd/bwd
    # in bf16 with f32 master params/Adam moments and f32 BatchNorm
    # statistics (batch stats reduce in f32 regardless of compute dtype,
    # models/resnet.py:_bn); the BCE/accuracy compute in f32 on cast-back
    # probabilities.  Default f32 = reference training numerics.
    tagger_dtype: str = "float32"
    # Rematerialise ResNet bottlenecks in the DIFFERENTIATED encoder
    # passes (tagger training and fine_tune_encoder), models/resnet.py
    # _remat_block.  True or "blocks": autodiff keeps only each block's
    # input and recomputes the in-block convs/BNs backward (~one extra
    # encoder forward of FLOPs per step, smallest memory).  "convs":
    # additionally saves the four in-block conv outputs and recomputes
    # only the cheap BN/relu elementwise work (~2.5x the activation
    # memory of "blocks", near-zero recompute FLOPs).  Either removes the
    # per-block activation residency that OOMs HBM at 256px batch >= 128.
    # No numeric effect.  Off by default: the reference recipe's batch 32
    # fits without it.
    encoder_remat: Union[bool, str] = False
    # Precompute the FROZEN encoder/tagger outputs once per unique image
    # and reuse them every epoch (train/feature_cache.py).  Both ResNets
    # run in eval mode when frozen, so their outputs are deterministic per
    # image — the reference recomputes them for every caption row of every
    # epoch (trains/attention_scn.py:213-214, and 5x per image per epoch
    # since each image carries captions_per_image rows).  With the cache,
    # steady-state epochs are pure decoder work.  Exact: at the default
    # cache_dtype="float32" the cached values ARE the encode_fn outputs,
    # so losses match the uncached path bit-for-bit
    # (tests/test_feature_cache.py).  The cache lives in HBM when it fits
    # the budget below (gathered by a jitted index lookup, zero host
    # traffic per step) and falls back to host RAM otherwise (gathered by
    # the loader's prefetch thread).  Requires fine_tune_encoder=False.
    cache_features: bool = False
    # Storage dtype for the cache: "float32" (exact, 1.6 MB/image at
    # flagship dims) or "bfloat16" (half the memory; features round once).
    cache_dtype: str = "float32"
    # HBM budget for the device-resident cache, in GiB; larger caches fall
    # back to host RAM.  v5e has 16 GiB — 6 leaves room for the decoder
    # step at large batch.
    cache_device_budget_gb: float = 6.0
    # Keep each split's raw uint8 images RESIDENT IN HBM and gather batch
    # rows by a jitted index lookup (data/device_store.py), instead of
    # copying every batch's pixels host->device each step (the reference's
    # per-batch .to(device), trains/attention_scn.py:208-210).  Serves the
    # recipes that consume pixels every step: tagger training, uncached
    # caption training, fine_tune_encoder.  The flagship flickr10k TRAIN
    # split is ~2 GiB uint8 — it fits next to the model.  Bit-identical to
    # the host path (same uint8 rows).  "auto" = on when the split fits
    # device_images_budget_gb; "on" = required (raise if it cannot);
    # "off" = always host loader.
    device_images: str = "auto"
    # HBM budget for the device image store(s), in GiB (TRAIN + VAL
    # together).
    device_images_budget_gb: float = 4.0
    # Write epoch checkpoints from a background thread (core/checkpoint.py
    # AsyncSaver): the train loop submits an on-device snapshot and keeps
    # stepping while device->host fetch + orbax serialisation run
    # off-thread.  Identical bytes on disk; the trainer joins before
    # returning.  False = the reference's blocking save semantics.
    async_checkpoint: bool = True
    # Vocab-head implementation for the caption train/eval steps:
    #   "dense"   — materialise (B, T, V) logits, f32 log_softmax + the
    #               sort-free topk_hit (the reference-shaped path; exact
    #               parity numerics).
    #   "chunked" — the fused CE head (ops/vocab_head.py): fc streams in
    #               vocab tiles through an online logsumexp under
    #               custom_vjp; the logit tensor never exists.  Removes
    #               the 4.1 GB COCO-vocab OOM at b1024 and most of the
    #               head's HBM traffic; CE/grads match dense to float
    #               reassociation (tests/test_vocab_head.py).
    #   "auto"    — "chunked" on TPU when the logit tensor would be big
    #               enough to matter (B*T*V >= 2^27 elements), else
    #               "dense" (train/steps.resolve_head_impl).
    head_impl: str = "auto"
    # Vocab-tile width for the chunked head.
    head_tile: int = 2048
    # Calibrate the FROZEN caption encoder's BatchNorm running stats with
    # this many train-mode EMA passes over training batches before epoch 0.
    # Needed when the encoder is NOT pretrained: at random init the running
    # stats are (0, 1) while the residual stack doubles activation variance
    # per block, so eval-mode features explode (~1e10 norms for ResNet-152)
    # and saturate the decoder.  The reference never hits this because it
    # always loads ImageNet weights.  0 = off (parity default).
    calibrate_encoder_stats: int = 0


@dataclasses.dataclass(frozen=True)
class BeamConfig:
    """Decode configuration (reference inference.py:66-67, step cap at 50:
    models/decoders/attention_scn.py:288)."""

    beam_size: int = 5
    max_steps: int = 51                # reference runs steps 1..51 before the cap
    length_penalty: float = 0.0        # 0 = reference behaviour (raw sum logprob)


def tagger_train_config(**overrides) -> TrainConfig:
    """The tagger recipe: 10 epochs, Adam 1e-4 (trains/tagger.py:35-42)."""
    base = dict(epochs=10, decoder_lr=1e-4, encoder_lr=1e-4, alpha_c=0.0)
    base.update(overrides)
    return TrainConfig(**base)


def to_json(cfg) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2, sort_keys=True)


def replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)
