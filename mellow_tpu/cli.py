"""Shared CLI / example scaffolding: checkpoint-resolving wrapper builder.

Weights resolve the same way everywhere (examples, eval runner, server):
MELLOW_TPU_PARAMS=/path/to/converted.npz (see mellow_tpu.tools.convert_ckpt)
or MELLOW_TPU_CKPT=/path/to/v0.ckpt. With neither reachable, falls back to
random weights + the byte tokenizer so pipelines stay runnable end-to-end
offline (outputs are gibberish, timings are real). The reference resolves
weights by downloading from the HF hub inside the constructor
(mellow/wrapper.py:41-42); offline that raises, hence this fallback tier.
"""

from __future__ import annotations

import sys


def build_wrapper(config: str = "v0", model: str = "v0", **kw):
    """MellowWrapper with the standard weight-resolution chain and an
    explicit random-weights fallback when no checkpoint is reachable."""
    from mellow_tpu.wrapper import MellowWrapper

    try:
        return MellowWrapper(config, model, 0, **kw)
    except RuntimeError as e:
        if "No weights available" not in str(e):
            raise
        print(
            "[mellow_tpu] no checkpoint reachable — using RANDOM weights and "
            "the byte tokenizer (pipeline demo only; set MELLOW_TPU_PARAMS "
            "for real outputs)",
            file=sys.stderr,
        )
        import jax

        from mellow_tpu.config import get_config
        from mellow_tpu.io.tokenizer import ByteTokenizer
        from mellow_tpu.models import mellow as mellow_model

        params = mellow_model.init_params(jax.random.PRNGKey(0), get_config(config))
        return MellowWrapper(
            config, model, 0, params=params, tokenizer=ByteTokenizer(), **kw
        )
