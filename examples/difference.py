"""Two-audio difference explanation, long decode
(reference: examples/difference.py; BASELINE.json config 5)."""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from examples.common import AUDIO1, AUDIO2, build_wrapper, run

if __name__ == "__main__":
    wrapper = build_wrapper("v0", "v0")
    run(wrapper, [
        [AUDIO1, AUDIO2, "explain the difference between the two audios."],
        [AUDIO2, AUDIO1, "what changed from the first to the second clip?"],
    ], max_len=300)
