"""Yes/no audio QA — 1-2 token decode (reference: examples/binary_aqa.py;
BASELINE.json config 2)."""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from examples.common import AUDIO1, AUDIO2, build_wrapper, run

if __name__ == "__main__":
    wrapper = build_wrapper("v0", "v0")
    run(wrapper, [
        [AUDIO1, AUDIO1, "is there a siren in the audio? answer yes or no."],
        [AUDIO2, AUDIO2, "is music playing? answer yes or no."],
    ], max_len=5)
