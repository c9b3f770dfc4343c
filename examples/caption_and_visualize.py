#!/usr/bin/env python
"""Caption one image with any model and render the attention grid.

Equivalent of the reference's viz_scn / viz_attention / viz_attention_scn
notebooks (manual QA), driven by ``--type``.  Thin wrapper over the
inference CLI so the decode path is exactly the production one.

Usage:
    python examples/caption_and_visualize.py -t attention_scn -i x.jpg \
        -mc <ckpt> -wm WORDMAP.json [-tm TAGMAP.json] [-b 5]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from indonesian_image_captioning_tpu.cli import inference


def main(argv=None):
    result = inference.main(argv)
    print("\nresult:", {k: v for k, v in result.items() if k != "tags"})


if __name__ == "__main__":
    main()
