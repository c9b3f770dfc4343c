#!/usr/bin/env python
"""Root entry point: `python train.py ...` — same command surface as the
reference repo's train.py; implementation in
indonesian_image_captioning_tpu/cli/train.py."""

from indonesian_image_captioning_tpu.cli.train import main

if __name__ == "__main__":
    main()
