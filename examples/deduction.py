"""Audio entailment / deduction on the v0_s scaled checkpoint
(reference: examples/deduction.py; BASELINE.json config 4)."""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from examples.common import AUDIO1, AUDIO2, build_wrapper, run

if __name__ == "__main__":
    wrapper = build_wrapper("v0", "v0_s")
    run(wrapper, [
        [AUDIO1, AUDIO2,
         "premise: the first audio contains street noise. hypothesis: the "
         "recording was made outdoors. does the audio entail the hypothesis? "
         "answer entailment, neutral, or contradiction."],
    ], max_len=20)
