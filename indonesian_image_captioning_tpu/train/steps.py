"""Jitted train/eval steps for the tagger and the three caption models.

Reference semantics (trains/attention_scn.py:178-271, trains/tagger.py):
per-batch forward -> loss -> elementwise grad clamp +-5 -> Adam.  Here each
whole step (normalize -> encoders -> masked scan decoder -> loss -> clipped
Adam update) is ONE jitted XLA program; images arrive as uint8 NHW C-order
bytes and are normalised on device.

Parallelism: steps are built against an optional mesh.  With a mesh, the
batch is sharded over the "data" axis and parameters are replicated (or
model-sharded for the vocab head, see parallel/sharding.py); XLA inserts the
gradient psum — there is no hand-written collective here.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..core.config import ModelConfig, TrainConfig
from ..models import decoders, encoders
from ..ops import losses

Pytree = Any


def make_optimizer(lr: float, grad_clip: float) -> optax.GradientTransformation:
    """Elementwise grad clamp (reference utils/optimizer.py:1-11 clamps the
    gradient values, not the norm) followed by Adam; the LR is injected so
    the x0.8 stale-epoch decay can update it in-place."""
    tx = [] if grad_clip is None else [_clamp(grad_clip)]
    tx.append(optax.inject_hyperparams(optax.adam)(learning_rate=lr))
    return optax.chain(*tx)


def _clamp(limit: float) -> optax.GradientTransformation:
    def update(updates, state, params=None):
        return jax.tree.map(lambda g: jnp.clip(g, -limit, limit), updates), state
    return optax.GradientTransformation(lambda _: optax.EmptyState(), update)


def is_inject_state(s) -> bool:
    """Matches optax's InjectHyperparamsState / InjectStatefulHyperparamsState
    (the class name differs across optax versions)."""
    return hasattr(s, "hyperparams") and hasattr(s, "_replace") \
        and "learning_rate" in getattr(s, "hyperparams", {})


def decay_learning_rate(opt_state, factor: float):
    """Multiply the injected Adam LR by ``factor`` (utils/optimizer.py:14-24).
    The optimizer state is the chain tuple (clamp state, inject state)."""
    return tuple(
        s._replace(hyperparams={**s.hyperparams,
                                "learning_rate": s.hyperparams["learning_rate"] * factor})
        if is_inject_state(s) else s
        for s in opt_state)


def current_learning_rate(opt_state) -> float:
    for s in opt_state:
        if is_inject_state(s):
            return float(s.hyperparams["learning_rate"])
    return float("nan")


def prep_images(images_u8_chw):
    """uint8 (B, 3, S, S) artifact layout -> normalized NHWC float."""
    x = jnp.transpose(images_u8_chw, (0, 2, 3, 1))
    return encoders.normalize_images(x)


# ---------------------------------------------------------------------------
# Caption models
# ---------------------------------------------------------------------------

def resolve_head_impl(tcfg: TrainConfig, cfg: ModelConfig,
                      batch: int) -> str:
    """Resolve tcfg.head_impl ("auto" -> "chunked" on TPU when the dense
    (B, T, V) logit tensor would be >= 2^27 elements — flagship b1024 and
    any COCO-vocab batch — else "dense", the exact-parity path).  Called
    at trace time, so the policy sees the real batch."""
    impl = getattr(tcfg, "head_impl", "auto")
    if impl != "auto":
        return impl
    if jax.default_backend() == "cpu":
        return "dense"
    n_logits = batch * (cfg.max_caption_len - 1) * cfg.vocab_size
    return "chunked" if n_logits >= (1 << 27) else "dense"


def make_encoders_fn(cfg: ModelConfig, compute_dtype: str = "float32"):
    """Frozen encoder/tagger forwards as SEPARATE jitted programs.

    Two ResNet-152s in one XLA program (or fused with the decoder backward)
    multiplies compile time on this backend; splitting keeps each program
    small and the intermediates on device.  state is a jit ARGUMENT —
    closure capture would bake the weights into the HLO as constants.

    compute_dtype="bfloat16" runs the frozen forwards in bf16 (1.85x on
    v5e); outputs are returned in f32 for the decoder.
    """
    dt = jnp.dtype(compute_dtype)

    def cast(tree):
        return jax.tree.map(
            lambda x: x.astype(dt)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    @jax.jit
    def run_encoder(state, images_u8):
        images = prep_images(images_u8).astype(dt)
        out = encoders.apply_encoder_caption(
            cast(state["encoder"]), cast(state["encoder_stats"]), images,
            train=False, enc_image_size=cfg.enc_image_size,
            arch=cfg.encoder_arch)[0]
        return out.astype(jnp.float32)

    @jax.jit
    def run_tagger(state, images_u8):
        images = prep_images(images_u8).astype(dt)
        out = encoders.apply_encoder_tagger(
            cast(state["tagger"]), cast(state["tagger_stats"]), images,
            train=False, arch=cfg.encoder_arch)[0]
        return out.astype(jnp.float32)

    def encode(state, batch):
        enc_out = run_encoder(state, batch["images"])
        if cfg.uses_tags:
            tags = run_tagger(state, batch["images"])
        else:
            tags = jnp.zeros((batch["images"].shape[0], cfg.semantic_dim),
                             enc_out.dtype)
        return jax.lax.stop_gradient(enc_out), jax.lax.stop_gradient(tags)

    return encode


def make_chunked_head_island(tp_mesh, tile: int, k: int = 5):
    """shard_map island running the chunked CE head vocab-parallel over
    the mesh "model" axis (Megatron-style vocab-parallel cross entropy):
    each shard scans its LOCAL fc columns with its global column offset;
    the (max, scaled-sum, target-logit, rank-count) partials merge with
    pmax/psum inside ops/vocab_head, and the d_hidden cotangent psums
    over "model" in the custom_vjp backward.  The sharded (B, T, V/m)
    logits never exist — this is what turns sharding.py's "the sharded
    loss divides the logits" from an inference into a computation.

    Returns island(fc, hidden, targets, maskf) -> (ce, topk_pct,
    n_tokens) as GLOBAL (replicated) scalars — the data-axis reduction
    happens here too, so callers treat it exactly like
    losses.caption_loss_chunked."""
    from jax.sharding import PartitionSpec as P

    from ..core.meshes import DATA_AXIS, MODEL_AXIS, get_shard_map
    from ..ops import vocab_head

    shard_map, flag = get_shard_map()

    # custom_vjp sits ABOVE the shard_maps: the forward and backward are
    # each their own explicitly-spec'd island with EXPLICIT collective
    # reductions (vocab_head.nll_bwd_block), so no shard_map transpose
    # ever runs.  (With replication checking off — required because the
    # fori_loop carries carry no vma annotations — shard_map's automatic
    # transpose of the data-replicated fc input returned exactly x1/model
    # of the true d_fc; tests/test_vocab_head.py pins the parity.)
    def fwd_block(w, bb, h2, tgt):
        col0 = jax.lax.axis_index(MODEL_AXIS) * w.shape[1]
        return vocab_head.nll_topk_fwd_block(
            w, bb, h2, tgt, col0, k=k, tile=tile, shard_axis=MODEL_AXIS)

    def bwd_block(w, bb, h2, tgt, lse, coeff):
        col0 = jax.lax.axis_index(MODEL_AXIS) * w.shape[1]
        return vocab_head.nll_bwd_block(
            w, bb, h2, tgt, lse, coeff, col0, tile=tile,
            shard_axis=MODEL_AXIS, batch_axis=DATA_AXIS)

    w_sp, b_sp, n_sp = P(None, MODEL_AXIS), P(MODEL_AXIS), P(DATA_AXIS)
    fwd_sm = shard_map(fwd_block, mesh=tp_mesh,
                       in_specs=(w_sp, b_sp, n_sp, n_sp),
                       out_specs=(n_sp, n_sp, n_sp), **{flag: False})
    bwd_sm = shard_map(bwd_block, mesh=tp_mesh,
                       in_specs=(w_sp, b_sp, n_sp, n_sp, n_sp, n_sp),
                       out_specs=(w_sp, b_sp, n_sp), **{flag: False})

    @jax.custom_vjp
    def island_nll(w, bb, h2, tgt):
        return fwd_sm(w, bb, h2, tgt)[:2]

    def island_fwd(w, bb, h2, tgt):
        nll, hit, lse = fwd_sm(w, bb, h2, tgt)
        return (nll, hit), (w, bb, h2, tgt, lse)

    def island_bwd(res, cts):
        w, bb, h2, tgt, lse = res
        d_w, d_b, d_h = bwd_sm(w, bb, h2, tgt, lse, cts[0])
        return d_w, d_b, d_h, None

    island_nll.defvjp(island_fwd, island_bwd)

    def island(fc, hidden, targets, mask):
        B, T, D = hidden.shape
        h2 = hidden.reshape(B * T, D)
        tgt = targets.reshape(-1).astype(jnp.int32)
        nll, hit = island_nll(fc["w"], fc["b"], h2, tgt)
        maskf = mask.reshape(-1).astype(jnp.float32)
        denom = jnp.maximum(maskf.sum(), 1.0)
        ce = (nll * maskf).sum() / denom
        topk = (hit * maskf).sum() / denom * 100.0
        return ce, topk, maskf.sum()

    return island


def make_caption_train_step(cfg: ModelConfig, tcfg: TrainConfig,
                            optimizer: optax.GradientTransformation,
                            donate: bool = True, spmd_mesh=None,
                            tp_mesh=None):
    """Returns (encode_fn, step) where step is the jitted decoder update:

        step({"params", "opt_state"}, enc_out, tags, captions, caplens, rng)
            -> (new_substate, metrics)

    The frozen encoder/tagger (fine_tune_encoder=False default,
    trains/attention_scn.py:56; tagger always frozen, :81) run via
    encode_fn as separate programs; the differentiated program contains
    only the decoder scan.  The frozen tagger runs in eval mode
    (deterministic) — deliberately NOT replicating the reference's
    dropout-at-train-time bug (SURVEY.md §5).
    """
    encode_fn = make_encoders_fn(cfg, tcfg.encoder_dtype)
    mixed = jnp.dtype(tcfg.decoder_dtype) != jnp.float32
    cdt = jnp.dtype(tcfg.decoder_dtype)
    from ..core.meshes import MODEL_AXIS
    tp_model = tp_mesh.shape[MODEL_AXIS] if tp_mesh is not None else 1
    use_island = (tp_model > 1 and cfg.vocab_size % tp_model == 0)
    head_island = (make_chunked_head_island(
        tp_mesh, getattr(tcfg, "head_tile", 2048)) if use_island else None)

    def step(substate, enc_out, tags, captions, caplens, rng):
        head = resolve_head_impl(tcfg, cfg, enc_out.shape[0])
        hidden = head == "chunked"

        def loss_fn(params):
            if mixed:
                # bf16 compute, f32 master weights: cast inside the loss
                # so grads return f32 for the clamp/Adam chain; losses
                # compute in f32 on the cast-back predictions (dense) /
                # inside the chunked head's f32 accumulators.
                p = jax.tree.map(
                    lambda x: x.astype(cdt)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
                out = decoders.teacher_forcing(
                    p, cfg, enc_out.astype(cdt), tags.astype(cdt),
                    captions, caplens, dropout_rng=rng, train=True,
                    spmd_mesh=spmd_mesh, return_hidden=hidden)
                out = {**out,
                       "alphas": (out["alphas"].astype(jnp.float32)
                                  if out.get("alphas") is not None
                                  else out.get("alphas"))}
                if not hidden:
                    out["predictions"] = \
                        out["predictions"].astype(jnp.float32)
            else:
                p = params
                out = decoders.teacher_forcing(
                    params, cfg, enc_out, tags, captions, caplens,
                    dropout_rng=rng, train=True, spmd_mesh=spmd_mesh,
                    return_hidden=hidden)
            if hidden:
                if head_island is not None:
                    targets = captions[:, 1:1 + out["hidden"].shape[1]]
                    ce, topk, n_tokens = head_island(
                        p["fc"], out["hidden"], targets, out["mask"])
                    pen = losses.doubly_stochastic_penalty(
                        out["alphas"], out["mask"], tcfg.alpha_c)
                    return ce + pen, {"ce": ce, "alpha_penalty": pen,
                                      "n_tokens": n_tokens, "top5": topk}
                loss, aux = losses.caption_loss_chunked(
                    p["fc"], out, captions, tcfg.alpha_c, k=5,
                    tile=getattr(tcfg, "head_tile", 2048))
                return loss, {**aux, "top5": aux["topk"]}
            loss, aux = losses.caption_loss(out, captions, tcfg.alpha_c)
            top5 = losses.masked_topk_accuracy(
                out["predictions"],
                captions[:, 1:1 + out["predictions"].shape[1]],
                out["mask"], 5)
            return loss, {**aux, "top5": top5}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            substate["params"])
        updates, opt_state = optimizer.update(grads, substate["opt_state"],
                                              substate["params"])
        params = optax.apply_updates(substate["params"], updates)
        metrics = {"loss": loss, "top5": aux["top5"],
                   "n_tokens": aux["n_tokens"], "ce": aux["ce"],
                   "alpha_penalty": aux["alpha_penalty"]}
        return {"params": params, "opt_state": opt_state}, metrics

    return encode_fn, jax.jit(step, donate_argnums=(0,) if donate else ())


def make_caption_eval_step(cfg: ModelConfig, tcfg: TrainConfig):
    """Returns (encode_fn, step): jitted validation metrics + teacher-forced
    argmax preds (the reference's validate() scores argmax hypotheses with
    corpus BLEU, trains/attention_scn.py:366-377)."""
    encode_fn = make_encoders_fn(cfg, tcfg.encoder_dtype)

    @jax.jit
    def step(params, enc_out, tags, captions, caplens):
        head = resolve_head_impl(tcfg, cfg, enc_out.shape[0])
        if head == "chunked":
            from ..ops.vocab_head import chunked_eval_head
            out = decoders.teacher_forcing(
                params, cfg, enc_out, tags, captions, caplens, train=False,
                return_hidden=True)
            targets = captions[:, 1:1 + out["hidden"].shape[1]]
            ce, top5, n_tokens, preds = chunked_eval_head(
                params["fc"], out["hidden"], targets, out["mask"], k=5,
                tile=getattr(tcfg, "head_tile", 2048))
            pen = losses.doubly_stochastic_penalty(
                out["alphas"], out["mask"], tcfg.alpha_c)
            return {"loss": ce + pen, "top5": top5, "n_tokens": n_tokens,
                    "preds": preds, "mask": out["mask"]}
        out = decoders.teacher_forcing(
            params, cfg, enc_out, tags, captions, caplens, train=False)
        loss, aux = losses.caption_loss(out, captions, tcfg.alpha_c)
        top5 = losses.masked_topk_accuracy(
            out["predictions"],
                captions[:, 1:1 + out["predictions"].shape[1]],
                out["mask"], 5)
        preds = jnp.argmax(out["predictions"], axis=-1)      # (B, T)
        return {"loss": loss, "top5": top5, "n_tokens": aux["n_tokens"],
                "preds": preds, "mask": out["mask"]}

    return encode_fn, step


def make_caption_finetune_train_step(
        cfg: ModelConfig, tcfg: TrainConfig,
        dec_optimizer: optax.GradientTransformation,
        enc_optimizer: optax.GradientTransformation,
        fine_tune_embeddings: bool = True,
        donate: bool = True):
    """Joint decoder + encoder fine-tuning step (fine_tune_encoder=True path,
    trains/attention_scn.py:93-96,141-142: separate Adam on the encoder's
    stages 2-4 at encoder_lr).

    Returns (tagger_fn, step) where
      tagger_fn(state, batch) -> tags          (frozen tagger, own program)
      step(state, images_u8, tags, captions, caplens, rng)
          -> (new_state, metrics)
    with state = {"params", "opt_state", "encoder", "encoder_stats",
    "enc_opt_state"}.  The encoder runs train-mode BatchNorm (batch stats +
    running-stat updates) like the reference's encoder.train().  NB: this
    program differentiates through ResNet-152 — first compile is expensive
    on this backend; the default frozen-encoder path avoids it.
    """
    from ..models.encoders import caption_encoder_trainable_mask

    @jax.jit
    def tagger_fn(state, batch):
        images = prep_images(batch["images"])
        if not cfg.uses_tags:
            return jnp.zeros((images.shape[0], cfg.semantic_dim),
                             images.dtype)
        return jax.lax.stop_gradient(encoders.apply_encoder_tagger(
            state["tagger"], state["tagger_stats"], images, train=False,
            arch=cfg.encoder_arch)[0])

    def step(state, images_u8, tags, captions, caplens, rng):
        images = prep_images(images_u8)

        def loss_fn(dec_params, enc_params):
            enc_out, new_enc_stats = encoders.apply_encoder_caption(
                enc_params, state["encoder_stats"], images, train=True,
                enc_image_size=cfg.enc_image_size, arch=cfg.encoder_arch,
                remat=getattr(tcfg, "encoder_remat", False))
            # enc_grad: this loss differentiates THROUGH enc_out into the
            # encoder — the fused training scan emits no d_enc cotangent,
            # so the fine-tune path must keep the XLA scan.
            out = decoders.teacher_forcing(
                dec_params, cfg, enc_out, tags, captions, caplens,
                dropout_rng=rng, train=True, enc_grad=True)
            loss, aux = losses.caption_loss(out, captions, tcfg.alpha_c)
            top5 = losses.masked_topk_accuracy(
                out["predictions"],
                captions[:, 1:1 + out["predictions"].shape[1]],
                out["mask"], 5)
            return loss, ({**aux, "top5": top5}, new_enc_stats)

        (loss, (aux, new_enc_stats)), (dgrads, egrads) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
            state["params"], state["encoder"])

        dmask = decoders.trainable_mask(state["params"], fine_tune_embeddings)
        dgrads = jax.tree.map(lambda g, m: g if m else jnp.zeros_like(g),
                              dgrads, dmask)
        dupd, dopt = dec_optimizer.update(dgrads, state["opt_state"],
                                          state["params"])
        params = optax.apply_updates(state["params"], dupd)

        emask = caption_encoder_trainable_mask(state["encoder"])
        egrads = jax.tree.map(lambda g, m: g if m else jnp.zeros_like(g),
                              egrads, emask)
        eupd, eopt = enc_optimizer.update(egrads, state["enc_opt_state"],
                                          state["encoder"])
        enc_params = optax.apply_updates(state["encoder"], eupd)

        metrics = {"loss": loss, "top5": aux["top5"],
                   "n_tokens": aux["n_tokens"], "ce": aux["ce"],
                   "alpha_penalty": aux["alpha_penalty"]}
        return ({**state, "params": params, "opt_state": dopt,
                 "encoder": enc_params, "encoder_stats": new_enc_stats,
                 "enc_opt_state": eopt}, metrics)

    return tagger_fn, jax.jit(step, donate_argnums=(0,) if donate else ())


# ---------------------------------------------------------------------------
# Tagger
# ---------------------------------------------------------------------------

def tagger_trainable_mask(params) -> Pytree:
    """True for trainable leaves: the linear head + resnet layer2..layer4
    (reference fine_tune: children()[5:], encoders/tagger.py:49-60)."""
    def mask_resnet(tree):
        return {k: jax.tree.map(lambda _: k in ("layer2", "layer3", "layer4"),
                                v) for k, v in tree.items()}
    return {"resnet": mask_resnet(params["resnet"]),
            "linear": jax.tree.map(lambda _: True, params["linear"])}


def make_tagger_train_step(tcfg: TrainConfig,
                           optimizer: optax.GradientTransformation,
                           dropout_rate: float = 0.15,
                           arch: str = "resnet152",
                           donate: bool = True):
    """state = {"params", "stats", "opt_state"}; BCE on sigmoid scores with
    binary accuracy (trains/tagger.py:132-192).  BatchNorm runs in train
    mode with running-stat updates, like the reference's encoder.train().

    tcfg.tagger_dtype="bfloat16": bf16 fwd/bwd with f32 master params —
    params are cast inside the loss so grads return f32 for the
    clamp/Adam chain; BN batch stats reduce in f32 (resnet._bn) so the
    running-stat EMA stays full precision; probs are cast back to f32
    before the BCE clip (1 - 1e-7 is a no-op in bf16).

    tcfg.encoder_remat=True rematerialises the ResNet bottlenecks in the
    backward (needed at 256px batch >= 128, see resnet._stage)."""
    cdt = jnp.dtype(getattr(tcfg, "tagger_dtype", "float32"))
    mixed = cdt != jnp.float32
    remat = getattr(tcfg, "encoder_remat", False)

    def step(state, batch, rng):
        images = prep_images(batch["images"])
        valid = batch.get("valid")

        def loss_fn(params):
            if mixed:
                params = jax.tree.map(
                    lambda x: x.astype(cdt)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
                images_c = images.astype(cdt)
            else:
                images_c = images
            probs, new_stats = encoders.apply_encoder_tagger(
                params, state["stats"], images_c, train=True, dropout_rng=rng,
                dropout_rate=dropout_rate, arch=arch, remat=remat)
            probs = probs.astype(jnp.float32)
            loss = losses.bce_loss(probs, batch["tags"], row_valid=valid)
            acc = _binary_accuracy(probs, batch["tags"], row_valid=valid)
            return loss, (acc, new_stats)

        (loss, (acc, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        mask = tagger_trainable_mask(state["params"])
        grads = jax.tree.map(lambda g, m: g if m else jnp.zeros_like(g),
                             grads, mask)
        updates, opt_state = optimizer.update(grads, state["opt_state"],
                                              state["params"])
        params = optax.apply_updates(state["params"], updates)
        return ({"params": params, "stats": new_stats,
                 "opt_state": opt_state},
                {"loss": loss, "acc": acc})

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_tagger_eval_step(arch: str = "resnet152",
                          compute_dtype: str = "float32"):
    cdt = jnp.dtype(compute_dtype)

    def step(params, stats, batch):
        images = prep_images(batch["images"])
        if cdt != jnp.float32:
            cast = lambda t: jax.tree.map(
                lambda x: x.astype(cdt)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
            params, stats, images = cast(params), cast(stats), images.astype(cdt)
        probs, _ = encoders.apply_encoder_tagger(params, stats, images,
                                                 train=False, arch=arch)
        probs = probs.astype(jnp.float32)
        valid = batch.get("valid")
        return {"loss": losses.bce_loss(probs, batch["tags"],
                                        row_valid=valid),
                "acc": _binary_accuracy(probs, batch["tags"],
                                        row_valid=valid)}
    return jax.jit(step)


def _binary_accuracy(probs, targets, row_valid=None):
    """Mean elementwise binary accuracy (%), over valid rows only — padded
    loader rows (all-zero images/tags) must not inflate the metric."""
    correct = ((probs >= 0.5) == (targets >= 0.5)).astype(jnp.float32)
    if row_valid is None:
        return jnp.mean(correct) * 100.0
    w = row_valid.astype(jnp.float32)
    denom = jnp.maximum(w.sum() * correct.shape[1], 1.0)
    return (correct * w[:, None]).sum() / denom * 100.0
