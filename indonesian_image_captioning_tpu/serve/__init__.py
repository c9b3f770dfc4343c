"""Production serving: fixed-bucket micro-batching caption engine.

The reference serves one image per process invocation
(/root/reference/inference.py:52-165).  On a TPU the economics invert:
the 51-step beam decode costs nearly the same for 1 image as for a
batch (BASELINE.md latency section — device-side decode is ~1.6 ms per
EXTRA request), so a server should coalesce concurrent requests into
one fixed-shape batch.  ``CaptionEngine`` does exactly that with
XLA-friendly static batch buckets (no recompiles after warmup).
"""

from .engine import CaptionEngine, ServeConfig

__all__ = ["CaptionEngine", "ServeConfig"]
