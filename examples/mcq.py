"""Multiple-choice QA over one clip pair with batched prompts
(reference: examples/mcq.py; BASELINE.json config 3)."""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from examples.common import AUDIO1, AUDIO2, build_wrapper, run

PROMPTS = [
    "what can you infer about the surrounding? (a) construction site "
    "(b) rural area (c) shopping mall (d) city street",
    "what is the dominant sound? (a) speech (b) traffic (c) birdsong (d) rain",
    "what time of day does this suggest? (a) morning (b) noon (c) evening (d) night",
    "how busy is the scene? (a) empty (b) quiet (c) moderate (d) crowded",
]

if __name__ == "__main__":
    wrapper = build_wrapper("v0", "v0")
    run(wrapper, [[AUDIO1, AUDIO2, p] for p in PROMPTS], max_len=50)
