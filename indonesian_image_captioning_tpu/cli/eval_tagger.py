"""Tagger evaluation CLI.

The reference eval_tagger.py has no argparse (module constants,
eval_tagger.py:13-21); this exposes the same knobs as flags with the same
defaults.
"""

from __future__ import annotations

import argparse

from ..core.config import DataConfig
from ..evaluation import eval_tagger as eval_lib
from .common import load_tagger_state


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Eval Image Tagger (TPU)")
    p.add_argument("--model_tagger", "-mt",
                   default="BEST_checkpoint_tagger_flickr10k_5_cap_per_img_5_min_word_freq",
                   help="path to tagger checkpoint")
    p.add_argument("--data_folder", "-df", default="./scn_data")
    p.add_argument("--data_name", "-dn",
                   default="flickr10k_5_cap_per_img_5_min_word_freq")
    p.add_argument("--batch_size", "-bs", default=32, type=int)
    return p


def main(argv=None):
    from ..core import runtime
    runtime.setup()
    args = build_parser().parse_args(argv)
    params, stats = load_tagger_state(args.model_tagger)
    data_cfg = DataConfig(data_folder=args.data_folder,
                          data_name=args.data_name)
    return eval_lib.evaluate(params, stats, data_cfg,
                             batch_size=args.batch_size)


if __name__ == "__main__":
    main()
