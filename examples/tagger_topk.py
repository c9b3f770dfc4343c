#!/usr/bin/env python
"""Top-k tag table for one image (equivalent of the reference's
notebooks/tagger.ipynb manual-QA notebook).

Usage:
    python examples/tagger_topk.py --img x.jpg --model_tagger <ckpt> \
        --tag_map TAGMAP.json [--topk 20]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from indonesian_image_captioning_tpu.cli.common import load_tagger_state
from indonesian_image_captioning_tpu.core import runtime
from indonesian_image_captioning_tpu.data import vocab as vocab_lib
from indonesian_image_captioning_tpu.data.preprocess import read_image
from indonesian_image_captioning_tpu.models import encoders
from indonesian_image_captioning_tpu.train.steps import prep_images


def main(argv=None):
    runtime.setup()
    p = argparse.ArgumentParser()
    p.add_argument("--img", "-i", required=True)
    p.add_argument("--model_tagger", "-mt", required=True)
    p.add_argument("--tag_map", "-tm", required=True)
    p.add_argument("--topk", type=int, default=20)
    args = p.parse_args(argv)

    params, stats = load_tagger_state(args.model_tagger)
    rev_tag_map = vocab_lib.invert(vocab_lib.load_json(args.tag_map))
    image = read_image(args.img)[None]

    @jax.jit
    def run(p_, s_, imgs):
        return encoders.apply_encoder_tagger(p_, s_, prep_images(imgs),
                                             train=False)[0]

    probs = np.asarray(run(params, stats, image)[0])
    top = np.argsort(-probs)[: args.topk]
    width = max(len(rev_tag_map[int(i)]) for i in top)
    print(f"{'tag':<{width}}  prob")
    for i in top:
        print(f"{rev_tag_map[int(i)]:<{width}}  {probs[i]:.4f}")


if __name__ == "__main__":
    main()
