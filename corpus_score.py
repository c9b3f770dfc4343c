#!/usr/bin/env python
"""Root entry point: `python corpus_score.py ...` — same command surface as the
reference repo's corpus_score.py; implementation in
indonesian_image_captioning_tpu/cli/corpus_score.py."""

from indonesian_image_captioning_tpu.cli.corpus_score import main

if __name__ == "__main__":
    main()
