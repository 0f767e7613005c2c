"""Audio captioning (reference: examples/captioning.py task family)."""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from examples.common import AUDIO1, AUDIO2, build_wrapper, run

if __name__ == "__main__":
    wrapper = build_wrapper("v0", "v0")
    run(wrapper, [
        [AUDIO1, AUDIO1, "caption the audio."],
        [AUDIO2, AUDIO2, "describe the sounds in detail."],
    ], max_len=300)
