"""Open-ended audio question answering (reference: examples/aqa.py family)."""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from examples.common import AUDIO1, AUDIO2, build_wrapper, run

if __name__ == "__main__":
    wrapper = build_wrapper("v0", "v0")
    run(wrapper, [
        [AUDIO1, AUDIO1, "what is the main sound source in the audio?"],
        [AUDIO2, AUDIO2, "where might this audio have been recorded?"],
    ], max_len=100)
