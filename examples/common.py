"""Shared example scaffolding.

The reference ships 7 example scripts, 6 of which crash against its own
wrapper API (they pass config='conf.yaml', model='v0.ckpt', rejected at
mellow/wrapper.py:36-39; see SURVEY.md section 2.1). These examples all run.

Weights: the real checkpoints live on the HF hub. Offline, set
MELLOW_TPU_PARAMS=/path/to/converted.npz (see tools/convert_ckpt.py) or
MELLOW_TPU_CKPT=/path/to/v0.ckpt. With neither set, the examples fall back
to random weights + the byte tokenizer so the pipeline is still runnable
end-to-end (outputs are gibberish, timings are real).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

AUDIO1 = "/root/reference/resource/1.wav"
AUDIO2 = "/root/reference/resource/2.wav"


def build_wrapper(config: str = "v0", model: str = "v0"):
    # Shared with the eval runner / console scripts: mellow_tpu.cli.
    from mellow_tpu.cli import build_wrapper as _build

    return _build(config, model)


def run(wrapper, examples, max_len=300, top_p=0.8, temperature=1.0):
    from mellow_tpu.utils.metrics import GLOBAL as metrics

    preds = wrapper.generate(
        examples, max_len=max_len, top_p=top_p, temperature=temperature
    )
    for (a1, a2, prompt), pred in zip(examples, preds):
        print(f"prompt: {prompt!r}\n  -> {pred!r}")
    metrics.dump()
    return preds
