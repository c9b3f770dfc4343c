#!/usr/bin/env python
"""Root entry point: `python eval_tagger.py ...` — same command surface as the
reference repo's eval_tagger.py; implementation in
indonesian_image_captioning_tpu/cli/eval_tagger.py."""

from indonesian_image_captioning_tpu.cli.eval_tagger import main

if __name__ == "__main__":
    main()
