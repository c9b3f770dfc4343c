"""Process-level runtime setup for CLI entry points.

Enables JAX's persistent compilation cache so the big programs (ResNet-152
train step, beam search) compile once per machine rather than once per
process — the reference's cudnn.benchmark=True analogue for XLA.
"""

from __future__ import annotations

import os


def setup(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "IIC_TPU_XLA_CACHE",
        os.path.expanduser("~/.cache/iic_tpu_xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimisation; never fail startup over it
