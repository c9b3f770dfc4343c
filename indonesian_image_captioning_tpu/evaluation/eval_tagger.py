"""TEST-split tagger evaluation: mean binary accuracy.

Reference eval_tagger.py:34-62: batch the TEST TagDataset, score sigmoid
outputs against multi-hot ground truth with 0.5 thresholds on both sides,
report the mean.  Here the forward + accuracy runs as one jitted program
per batch.
"""

from __future__ import annotations

import jax
import numpy as np

from ..core.config import DataConfig
from ..data import loader as loader_lib
from ..data.datasets import TagDataset
from ..models import encoders
from ..train.steps import prep_images


def evaluate(params, stats, data_cfg: DataConfig, batch_size: int = 32,
             arch: str = "resnet152", log=print) -> float:
    ds = TagDataset(data_cfg.data_folder, data_cfg.data_name, "TEST")

    # params/stats are jit ARGUMENTS (closure capture would bake the
    # ResNet weights into the HLO as constants).
    @jax.jit
    def step(p, s, batch):
        images = prep_images(batch["images"])
        probs, _ = encoders.apply_encoder_tagger(p, s, images,
                                                 train=False, arch=arch)
        agree = ((probs >= 0.5) == (batch["tags"] >= 0.5))
        return agree.astype(jax.numpy.float32).mean(axis=-1)  # (B,)

    params, stats = jax.device_put((params, stats))
    accs = []
    for batch in loader_lib.iterate(ds, batch_size):
        per_row = np.asarray(step(params, stats, batch))
        valid = np.asarray(batch["valid"]) > 0
        accs.extend((per_row[valid] * 100.0).tolist())
    acc = float(np.mean(accs)) if accs else 0.0
    log(f"Mean accuracy of tagger is {acc:.4f}")
    return acc
