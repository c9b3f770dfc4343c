#!/usr/bin/env python
"""Root entry point: `python inference.py ...` — same command surface as the
reference repo's inference.py; implementation in
indonesian_image_captioning_tpu/cli/inference.py."""

from indonesian_image_captioning_tpu.cli.inference import main

if __name__ == "__main__":
    main()
