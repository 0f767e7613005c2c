"""FULL-SIZE fp32 end-to-end token parity (VERDICT r4 item 7).

test_e2e.py proves the pipeline with a reduced decoder and test_llama.py
proves the full SmolLM2 decoder shape in isolation; this test runs the
EXACT combined graph real checkpoints will flow through — full HTSAT
(defaults) + full 30L/576/9:3/49152 SmolLM2 + the 389-token prefix
(reference call stack: mellow/wrapper.py:74-82 -> decoder.py:36-55 ->
the wrapper.py:197-249 decode loop) — at B=1 for a few greedy tokens,
fp32 highest-precision, vs the composed torch oracle.

Runtime: ~4-6 minutes on one CPU core (a ~160M-param torch reference
decode plus the full-size fp32 XLA compile), so it is skipped unless
MELLOW_RUN_FULLSIZE_E2E=1 — run it directly with:

    MELLOW_RUN_FULLSIZE_E2E=1 python -m pytest \
        tests/test_e2e_fullsize.py -q -p no:cacheprovider

Keeping it out of the default suite also keeps the per-process XLA
CPU-compile count under the segfault threshold pytest.ini documents.
"""

import os
import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from mellow_tpu.config import get_config
from mellow_tpu.models import mellow as jmellow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.convert_ckpt import convert_encoder_bundle, convert_llama  # noqa: E402
from tests.oracles import torch_htsat as enc_oracle  # noqa: E402
from tests.oracles.hf_llama import build_hf_model, reference_greedy_decode  # noqa: E402
from tests.test_e2e import _load_fixture_waves  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.environ.get("MELLOW_RUN_FULLSIZE_E2E"),
    reason="full-size e2e parity is opt-in (MELLOW_RUN_FULLSIZE_E2E=1; "
    "~4-6 min on one CPU core)",
)


def test_fullsize_e2e_token_parity():
    cfg = get_config("v0")  # full production config, prefix 389
    assert cfg.decoder.num_layers == 30 and cfg.decoder.hidden_size == 576

    torch.manual_seed(0)
    audio_side = enc_oracle.OracleWrapper()  # full-size defaults
    with torch.no_grad():
        bn = audio_side.htsat.bn0
        bn.running_mean.copy_(torch.randn(64))
        bn.running_var.copy_(torch.rand(64) * 2 + 0.5)
    audio_side.eval()
    hf = build_hf_model(cfg.decoder, seed=1)

    sd = {}
    for k, v in audio_side.state_dict().items():
        if k.startswith("htsat.") or k.startswith("c2l."):
            sd["audio_encoder.base." + k] = v
        else:
            sd["audio_encoder.projection." + k] = v
    params = convert_encoder_bundle(sd)
    params["decoder"] = convert_llama(hf.state_dict(), cfg.decoder.num_layers)
    params = jax.tree.map(jnp.asarray, params)

    wave = _load_fixture_waves(2)
    wave1, wave2 = wave[:1], wave[1:2]
    rng = np.random.RandomState(0)
    text_ids = rng.randint(
        2, cfg.decoder.vocab_size, size=(1, cfg.text_tokenization_len)
    ).astype(np.int32)
    max_len = 4

    # Torch reference pipeline at full size (same stages as
    # tests/test_e2e._torch_reference_pipeline, inlined to use cfg).
    from mellow_tpu.ops import frontend as fe

    mel_fb = fe.mel_filterbank(32000, 1024, 64, 50.0, 14000.0)
    with torch.no_grad():
        outs = []
        for w in (wave1, wave2):
            img = enc_oracle.oracle_frontend_image(w, audio_side.htsat.bn0, mel_fb)
            outs.append(audio_side(img)["projected"])
        import torch.nn.functional as F

        def downsample(x):  # decoder.py:14-18
            return torch.cat([x[:, :1], F.avg_pool2d(x[:, 1:], (8, 1))], dim=1)

        a1, a2 = downsample(outs[0]), downsample(outs[1])
        emb = hf.model.embed_tokens
        dtext = emb(torch.from_numpy(text_ids).long())
        sep = emb(torch.tensor([cfg.sep_token_id])).unsqueeze(0)
        prefix = torch.cat([a1, sep, a2, sep, dtext], dim=1)
        assert prefix.shape[1] == cfg.prefix_length == 389
        ref_tokens = reference_greedy_decode(
            hf, prefix, max_len, cfg.stop_token_id
        ).numpy()

    res = jmellow.generate_tokens(
        params, cfg, jnp.asarray(wave1), jnp.asarray(wave2),
        jnp.asarray(text_ids), max_len=max_len,
    )
    n = int(res.num_steps)
    assert n == ref_tokens.shape[1], (n, ref_tokens.shape)
    np.testing.assert_array_equal(np.asarray(res.tokens)[:, :n], ref_tokens)
