#!/usr/bin/env python
"""Root entry point: `python create_input_files.py ...` — same command surface as the
reference repo's create_input_files.py; implementation in
indonesian_image_captioning_tpu/cli/create_input_files.py."""

from indonesian_image_captioning_tpu.cli.create_input_files import main

if __name__ == "__main__":
    main()
