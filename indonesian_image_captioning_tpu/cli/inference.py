"""Single-image inference CLI: caption + top-k tags + attention viz.

Reference surface (inference.py:52-165): ``--type --img --model_caption
--model_tagger --tag_map --tag_out_count --word_map --beam_size
--dont_smooth``; accepts a local path or URL; prints the top-20 tags and the
caption, then renders the per-word attention overlay.  Headless default
here: the overlay is written to ``--viz_out`` (PNG) instead of a GUI window.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from ..core.config import BeamConfig, ModelConfig
from ..core.tokens import END_TOKEN, PAD_ID, START_TOKEN
from ..data import vocab as vocab_lib
from ..data.preprocess import read_image
from ..decode.api import caption_beam_search
from ..models import encoders
from ..train.steps import prep_images
from ..utils.url import download_file, is_absolute_path
from .common import load_caption_state


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="[(S)emantic (C)ompositional (N)ets + Attention] - "
                    "Generate Caption (TPU)")
    p.add_argument("--type", "-t", help="model type")
    p.add_argument("--img", "-i", help="path to image (or URL)")
    p.add_argument("--model_caption", "-mc",
                   help="path to pretrained caption model")
    p.add_argument("--model_tagger", "-mt", default=None,
                   help="path to pretrained tagger model")
    p.add_argument("--tag_map", "-tm", help="path to tag map JSON")
    p.add_argument("--tag_out_count", "-toc", type=int, default=20)
    p.add_argument("--word_map", "-wm", help="path to word map JSON")
    p.add_argument("--beam_size", "-b", default=5, type=int)
    p.add_argument("--dont_smooth", dest="smooth", action="store_false",
                   help="do not smooth alpha overlay")
    p.add_argument("--viz_out", default=None,
                   help="write the attention grid PNG here (default: "
                        "<img>.att.png for attention models)")
    return p


def run(args) -> dict:
    img_path = args.img
    if is_absolute_path(img_path):
        img_path = download_file(img_path)
    image = read_image(img_path)[None]          # (1, 3, 256, 256) u8

    word_map = vocab_lib.load_json(args.word_map)
    rev_word_map = vocab_lib.invert(word_map)
    cfg = ModelConfig(model_type=args.type, vocab_size=len(word_map))
    state = load_caption_state(args.model_caption, cfg, args.model_tagger)
    start_id, end_id = word_map[START_TOKEN], word_map[END_TOKEN]

    state = jax.device_put(state)
    images = prep_images(jax.numpy.asarray(image))
    result = {"image_path": img_path}

    # state is a jit argument (closure capture would bake the weights into
    # the compiled program as constants)
    @jax.jit
    def run_tagger(st, imgs):
        return encoders.apply_encoder_tagger(
            st["tagger"], st["tagger_stats"], imgs, train=False,
            arch=cfg.encoder_arch)[0]

    @jax.jit
    def run_encoder(st, imgs):
        return encoders.apply_encoder_caption(
            st["encoder"], st["encoder_stats"], imgs, train=False,
            enc_image_size=cfg.enc_image_size, arch=cfg.encoder_arch)[0]

    if cfg.uses_tags:
        tags = run_tagger(state, images)
        if args.tag_map:
            tag_map = vocab_lib.load_json(args.tag_map)
            rev_tag_map = vocab_lib.invert(tag_map)
            probs = np.asarray(tags[0])
            top = np.argsort(-probs)[:args.tag_out_count]
            result["tags"] = [(rev_tag_map[int(i)], float(probs[i]))
                              for i in top]
            print("Predicted tags")
            for name, pv in result["tags"]:
                print(f"  {name}: {pv:.4f}")
    else:
        tags = jax.numpy.zeros((1, cfg.semantic_dim), images.dtype)

    enc_out = run_encoder(state, images)
    out = caption_beam_search(
        state["params"], cfg, enc_out, tags, start_id=start_id,
        end_id=end_id, beam_cfg=BeamConfig(beam_size=args.beam_size),
        record_alphas=cfg.uses_attention)
    n = int(out["lengths"][0])
    seq = [int(w) for w in np.asarray(out["sequences"][0][:n])]
    words = [rev_word_map[w] for w in seq
             if w not in (start_id, end_id, PAD_ID)]
    result["caption"] = " ".join(words)
    print("Caption:", result["caption"])

    if cfg.uses_attention:
        from ..utils.visualize import visualize_att
        viz_out = args.viz_out or (img_path + ".att.png")
        alphas = np.asarray(out["alpha"][0][:n])
        result["viz"] = visualize_att(
            img_path, seq, alphas, rev_word_map, smooth=args.smooth,
            enc_image_size=cfg.enc_image_size, save_path=viz_out)
        print("Attention visualization written to", result["viz"])
    return result


def main(argv=None):
    from ..core import runtime
    runtime.setup()
    return run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
