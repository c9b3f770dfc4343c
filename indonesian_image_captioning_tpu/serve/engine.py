"""Micro-batching caption server over the production decode path.

TPU-first design notes:
  * One jitted program per batch BUCKET (static shapes): an incoming
    batch of B requests is padded to the smallest bucket >= B, so after
    warmup no request ever triggers a compile.
  * The whole pipeline (uint8 -> normalize -> tagger -> encoder -> beam)
    is ONE jit call per bucket; the beam engine inside picks its own
    fused kernels per shape (decode/api.resolve_decode_impl).
  * The async front is a plain queue + worker thread: requests are
    coalesced up to the largest bucket or until ``max_wait_ms`` passes
    since the oldest queued request (classic continuous micro-batching).
    Submission order is preserved.

Reference counterpart: inference.py:52-165 (single image per process).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from ..core.config import BeamConfig, ModelConfig
from ..core.tokens import PAD_ID
from ..data import vocab as vocab_lib
from ..models import encoders


@dataclass(frozen=True)
class ServeConfig:
    """Engine knobs.  Buckets must be ascending; requests above the
    largest bucket are split across calls."""

    batch_buckets: tuple = (1, 8, 32, 128)
    max_wait_ms: float = 2.0
    beam_size: int = 5
    # None -> BeamConfig's default (51), which matches the reference cap
    # (attention_scn.py:288 runs steps 1..51) and the cli/inference + eval
    # paths, so serve decode is bit-identical to single-image inference.
    max_steps: Optional[int] = None
    # Async-front pipeline depth: batches dispatched to the device before
    # the oldest one's results are fetched.  Depth 2 keeps the chip busy
    # while the host coalesces/pads the next bucket and pays the
    # host<->device round-trip; 1 = fetch-per-batch.
    max_inflight: int = 2


@dataclass
class ServeStats:
    """Batch-size histogram for observability/tests."""

    batches: List[int] = field(default_factory=list)

    def record(self, n: int) -> None:
        self.batches.append(n)


class CaptionEngine:
    """Batched image -> caption serving engine.

    state: the inference-state dict used by cli/inference.py
        (keys params / encoder / encoder_stats and, for tag-using
        models, tagger / tagger_stats).
    word_map: token -> id dict (WORDMAP artifact).
    """

    def __init__(self, state: Dict, cfg: ModelConfig, word_map: Dict[str, int],
                 serve_cfg: ServeConfig = ServeConfig()):
        if list(serve_cfg.batch_buckets) != sorted(set(serve_cfg.batch_buckets)):
            raise ValueError("batch_buckets must be ascending and unique")
        self.cfg = cfg
        self.serve_cfg = serve_cfg
        self.word_map = word_map
        self.rev_word_map = vocab_lib.invert(word_map)
        self.start_id = word_map["<start>"]
        self.end_id = word_map["<end>"]
        self.state = jax.device_put(state)
        self.stats = ServeStats()
        self._queue: "queue.Queue" = queue.Queue()
        self._worker: Optional[threading.Thread] = None
        self._stop = threading.Event()

        if serve_cfg.max_steps is None:
            beam_cfg = BeamConfig(beam_size=serve_cfg.beam_size)
        else:
            beam_cfg = BeamConfig(beam_size=serve_cfg.beam_size,
                                  max_steps=serve_cfg.max_steps)
        self.beam_cfg = beam_cfg

        def _pipeline(st, images_u8):
            from ..train.steps import prep_images
            x = prep_images(images_u8)
            if cfg.dtype == "bfloat16":
                x = x.astype("bfloat16")
            if cfg.uses_tags:
                tags = encoders.apply_encoder_tagger(
                    st["tagger"], st["tagger_stats"], x, train=False,
                    arch=cfg.encoder_arch)[0]
            else:
                tags = jax.numpy.zeros((x.shape[0], cfg.semantic_dim),
                                       x.dtype)
            enc = encoders.apply_encoder_caption(
                st["encoder"], st["encoder_stats"], x, train=False,
                enc_image_size=cfg.enc_image_size, arch=cfg.encoder_arch)[0]
            from ..decode.api import caption_beam_search
            out = caption_beam_search(
                st["params"], cfg, enc.astype(x.dtype),
                tags.astype(x.dtype), start_id=self.start_id,
                end_id=self.end_id, beam_cfg=beam_cfg)
            return out["sequences"], out["lengths"], tags

        self._pipeline = jax.jit(_pipeline)

    # ------------------------------------------------------------------
    # synchronous path
    # ------------------------------------------------------------------

    def _bucket_for(self, n: int) -> int:
        for b in self.serve_cfg.batch_buckets:
            if n <= b:
                return b
        return self.serve_cfg.batch_buckets[-1]

    def _detokenize(self, seq: Sequence[int]) -> str:
        skip = (self.start_id, self.end_id, PAD_ID)
        return " ".join(self.rev_word_map[int(w)] for w in seq
                        if int(w) not in skip)

    def caption_batch(self, images_u8: np.ndarray) -> List[str]:
        """(B, 3, H, W) uint8 -> B caption strings (any B >= 1)."""
        images_u8 = np.asarray(images_u8)
        if images_u8.ndim != 4:
            raise ValueError("expected (B, 3, H, W) uint8 batch")
        captions: List[str] = []
        max_b = self.serve_cfg.batch_buckets[-1]
        for lo in range(0, images_u8.shape[0], max_b):
            chunk = images_u8[lo:lo + max_b]
            bucket = self._bucket_for(chunk.shape[0])
            if chunk.shape[0] < bucket:
                pad = np.zeros((bucket - chunk.shape[0],) + chunk.shape[1:],
                               chunk.dtype)
                padded = np.concatenate([chunk, pad], 0)
            else:
                padded = chunk
            seqs, lens, _ = self._pipeline(self.state, padded)
            seqs, lens = np.asarray(seqs), np.asarray(lens)
            self.stats.record(int(chunk.shape[0]))
            for i in range(chunk.shape[0]):
                captions.append(self._detokenize(seqs[i][:lens[i]]))
        return captions

    def warmup(self, image_size: int = 256) -> None:
        """Compile every bucket (at the deployment's image size) so
        serving never pays a compile."""
        for b in self.serve_cfg.batch_buckets:
            self.caption_batch(
                np.zeros((b, 3, image_size, image_size), np.uint8))
        self.stats.batches.clear()

    # ------------------------------------------------------------------
    # async micro-batching front
    # ------------------------------------------------------------------

    def start(self) -> None:
        if self._worker is not None:
            return
        self._stop.clear()
        self._worker = threading.Thread(target=self._serve_loop, daemon=True)
        self._worker.start()

    def stop(self) -> None:
        if self._worker is None:
            return
        self._stop.set()
        self._worker.join()
        self._worker = None
        # Drain anything still queued (including requests submitted during
        # shutdown) so no caller blocks forever on fut.result().
        while True:
            try:
                _, fut = self._queue.get_nowait()
            except queue.Empty:
                break
            if fut.set_running_or_notify_cancel():
                fut.set_exception(RuntimeError("engine stopped"))

    def submit(self, image_u8: np.ndarray) -> "Future[str]":
        """Enqueue one (3, H, W) uint8 image; resolves to its caption."""
        if self._worker is None:
            raise RuntimeError("engine not started (call start())")
        image_u8 = np.asarray(image_u8)
        if image_u8.ndim != 3 or image_u8.shape[0] != 3:
            raise ValueError(
                f"expected a (3, H, W) image, got shape {image_u8.shape}")
        fut: "Future[str]" = Future()
        self._queue.put((image_u8, fut))
        return fut

    def _dispatch(self, images: np.ndarray):
        """Pad to a bucket and dispatch the jitted pipeline WITHOUT
        fetching: returns (n_valid, seqs, lens) device handles.  The
        coalescing loop bounds batches to the largest bucket."""
        bucket = self._bucket_for(images.shape[0])
        if images.shape[0] < bucket:
            pad = np.zeros((bucket - images.shape[0],) + images.shape[1:],
                           images.dtype)
            images = np.concatenate([images, pad], 0)
        seqs, lens, _ = self._pipeline(self.state, images)
        return seqs, lens

    def _serve_loop(self) -> None:
        """Pipelined micro-batching: dispatch batch i+1 while the device
        decodes batch i.  JAX dispatch is asynchronous, so keeping up to
        ``max_inflight`` batches in flight hides the host-side coalescing
        + padding and the host<->device round-trip behind device compute —
        the chip never idles between buckets."""
        import collections
        max_b = self.serve_cfg.batch_buckets[-1]
        wait_s = self.serve_cfg.max_wait_ms / 1e3
        depth = max(int(self.serve_cfg.max_inflight), 1)
        inflight: "collections.deque" = collections.deque()

        def resolve_oldest():
            live, seqs, lens = inflight.popleft()
            try:
                seqs, lens = np.asarray(seqs), np.asarray(lens)
            except Exception as e:
                for _, fut in live:
                    fut.set_exception(e)
                return
            for i, (_, fut) in enumerate(live):
                fut.set_result(self._detokenize(seqs[i][:lens[i]]))

        while not self._stop.is_set():
            try:
                # with work in flight, poll briefly so the oldest batch's
                # results are fetched as soon as the queue goes quiet
                first = self._queue.get(timeout=0.002 if inflight else 0.05)
            except queue.Empty:
                if inflight:
                    resolve_oldest()
                continue
            batch = [first]
            deadline = time.monotonic() + wait_s
            # coalesce whatever arrives before the deadline, up to a bucket
            while len(batch) < max_b:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    try:            # drain anything already queued
                        batch.append(self._queue.get_nowait())
                        continue
                    except queue.Empty:
                        break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            # Skip requests the caller cancelled while they were queued;
            # marking the rest running also makes set_result/set_exception
            # below legal even if a caller races cancel() from here on.
            live = [(img, fut) for img, fut in batch
                    if fut.set_running_or_notify_cancel()]
            if not live:
                continue
            try:
                # np.stack stays inside the try: one mismatched image shape
                # fails that batch's futures instead of killing the loop.
                images = np.stack([img for img, _ in live])
                seqs, lens = self._dispatch(images)
            except Exception as e:   # fail every request in the batch
                for _, fut in live:
                    fut.set_exception(e)
                continue
            self.stats.record(len(live))
            inflight.append((live, seqs, lens))
            while len(inflight) >= depth:
                resolve_oldest()
        while inflight:              # stop(): land everything in flight
            resolve_oldest()
