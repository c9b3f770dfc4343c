#!/usr/bin/env python
"""Root entry point: `python eval_caption.py ...` — same command surface as the
reference repo's eval_caption.py; implementation in
indonesian_image_captioning_tpu/cli/eval_caption.py."""

from indonesian_image_captioning_tpu.cli.eval_caption import main

if __name__ == "__main__":
    main()
