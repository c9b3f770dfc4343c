"""Train CLI (reference train.py:5-21 surface: ``--type/-t`` dispatch;
anything unrecognised trains the image tagger, as the reference does).

Extra optional flags expose what the reference hard-codes as module globals
(trains/*.py:25-61): data folder/name, epochs, batch size, LRs, checkpoint
dir, resume, tagger checkpoint.
"""

from __future__ import annotations

import argparse
import dataclasses

from ..core.config import DataConfig, TrainConfig, tagger_train_config


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="[(S)how (A)ttend (T)ell - (S)emantic (C)ompositional "
                    "(N)etworks] - Train Script (TPU)")
    p.add_argument("--type", "-t", help="train model type")
    p.add_argument("--data_folder", "-df", default="./scn_data")
    p.add_argument("--data_name", "-dn",
                   default="flickr10k_5_cap_per_img_5_min_word_freq")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", "-bs", type=int, default=None)
    p.add_argument("--decoder_lr", type=float, default=None)
    p.add_argument("--checkpoint_dir", default=".")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--tagger_checkpoint", "-mt", default=None,
                   help="tagger checkpoint for SCN models")
    p.add_argument("--encoder_init", default=None,
                   help="torch resnet152 state_dict to init the encoder")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fine_tune_encoder", action="store_true",
                   help="jointly fine-tune ResNet stages 2-4 (reference "
                        "fine_tune_encoder flag)")
    return p


def main(argv=None):
    from ..core import runtime
    runtime.setup()
    args = build_parser().parse_args(argv)
    data_cfg = DataConfig(data_folder=args.data_folder,
                          data_name=args.data_name)

    if args.type in ("pure_scn", "attention_scn", "pure_attention"):
        tcfg = TrainConfig(checkpoint_dir=args.checkpoint_dir,
                           seed=args.seed,
                           fine_tune_encoder=args.fine_tune_encoder)
        tcfg = _override(tcfg, args)
        from ..train import caption
        return caption.main(args.type, data_cfg, tcfg,
                            tagger_checkpoint=args.tagger_checkpoint,
                            encoder_init=args.encoder_init,
                            resume=args.resume)
    # reference falls through to the tagger for any other --type
    tcfg = tagger_train_config(checkpoint_dir=args.checkpoint_dir,
                               seed=args.seed)
    tcfg = _override(tcfg, args)
    from ..train import tagger
    return tagger.main(data_cfg, tcfg, encoder_init=args.encoder_init,
                       resume=args.resume)


def _override(tcfg: TrainConfig, args) -> TrainConfig:
    kw = {}
    if args.epochs is not None:
        kw["epochs"] = args.epochs
    if args.batch_size is not None:
        kw["batch_size"] = args.batch_size
    if args.decoder_lr is not None:
        kw["decoder_lr"] = args.decoder_lr
    return dataclasses.replace(tcfg, **kw) if kw else tcfg


if __name__ == "__main__":
    main()
