"""End-to-end token parity: full audio path (real wav fixtures) + prefix
assembly + greedy decode vs a composed torch oracle that replicates the
reference pipeline stage by stage (SURVEY.md section 3.2).

Uses the full-size HTSAT encoder with a reduced decoder (hidden 64) so the
torch full-recompute reference loop stays tractable on CPU; the full
SmolLM2 decoder shape is covered in test_llama.py."""

import dataclasses

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from mellow_tpu.config import HTSATConfig, LlamaConfig, MellowConfig
from mellow_tpu.models import mellow as jmellow
from mellow_tpu.ops import frontend as fe

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.convert_ckpt import convert_encoder_bundle, convert_llama  # noqa: E402
from tests.oracles import torch_htsat as enc_oracle  # noqa: E402
from tests.oracles.hf_llama import build_hf_model, reference_greedy_decode  # noqa: E402

DEC = LlamaConfig(
    vocab_size=512, hidden_size=64, intermediate_size=128, num_layers=4,
    num_heads=4, num_kv_heads=2, head_dim=16,
)
# Reduced encoder width (full-size parity covered by test_htsat.py).
ENC = HTSATConfig(embed_dim=24, out_emb=192)
CFG = MellowConfig(
    encoder=ENC, decoder=DEC, d_proj=64, text_tokenization_len=8,
    prefix_length=268,
).validate()


def _build_pair(seed=0):
    torch.manual_seed(seed)
    audio_side = enc_oracle.OracleWrapper(d_proj=CFG.d_proj, embed_dim=ENC.embed_dim)
    with torch.no_grad():
        bn = audio_side.htsat.bn0
        bn.running_mean.copy_(torch.randn(64))
        bn.running_var.copy_(torch.rand(64) * 2 + 0.5)
    audio_side.eval()
    hf = build_hf_model(DEC, seed=seed + 1)

    sd = {}
    for k, v in audio_side.state_dict().items():
        if k.startswith("htsat.") or k.startswith("c2l."):
            sd["audio_encoder.base." + k] = v
        else:
            sd["audio_encoder.projection." + k] = v
    params = convert_encoder_bundle(sd)
    params["decoder"] = convert_llama(hf.state_dict(), DEC.num_layers)
    return audio_side, hf, jax.tree.map(jnp.asarray, params)


def _torch_reference_pipeline(audio_side, hf, wave1, wave2, text_ids, max_len):
    """The reference generate() call stack in torch (SURVEY.md section 3.2):
    encode both audios, downsample, sep-embed prefix, greedy full-recompute
    decode."""
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
        sep = emb(torch.tensor([CFG.sep_token_id])).unsqueeze(0).repeat(a1.shape[0], 1, 1)
        prefix = torch.cat([a1, sep, a2, sep, dtext], dim=1)  # decoder.py:54
        assert prefix.shape[1] == CFG.prefix_length
        return reference_greedy_decode(hf, prefix, max_len, CFG.stop_token_id)


@pytest.fixture(scope="module")
def setup():
    return _build_pair()


def _load_fixture_waves(b=2):
    """Deterministic 10 s segments from the bundled reference wavs."""
    from mellow_tpu.io.resample import resample
    from mellow_tpu.io.wav import read_wav

    waves = []
    for p in ("/root/reference/resource/1.wav", "/root/reference/resource/2.wav"):
        x, sr = read_wav(p)
        x = resample(x.reshape(-1), sr, 32000)
        need = 320000
        if len(x) < need:
            x = np.tile(x, -(-need // len(x)))
        waves.append(x[:need].astype(np.float32))
    return np.stack(waves[:b], axis=0)


def test_e2e_token_parity(setup):
    audio_side, hf, params = setup
    wave1 = _load_fixture_waves(2)
    wave2 = wave1[::-1].copy()
    rng = np.random.RandomState(0)
    text_ids = rng.randint(2, 500, size=(2, CFG.text_tokenization_len)).astype(np.int32)
    max_len = 12

    ref_tokens = _torch_reference_pipeline(
        audio_side, hf, wave1, wave2, text_ids, max_len
    ).numpy()

    res = jmellow.generate_tokens(
        params, CFG, jnp.asarray(wave1), jnp.asarray(wave2), jnp.asarray(text_ids),
        max_len=max_len,
    )
    n = int(res.num_steps)
    assert n == ref_tokens.shape[1], (n, ref_tokens.shape)
    np.testing.assert_array_equal(np.asarray(res.tokens)[:, :n], ref_tokens)


def test_train_forward_runs_and_grads(setup):
    _, _, params = setup
    wave = _load_fixture_waves(2)
    rng = np.random.RandomState(1)
    text_ids = rng.randint(2, 500, size=(2, 8)).astype(np.int32)
    ans = rng.randint(2, 500, size=(2, 6)).astype(np.int32)
    mask = np.ones((2, 6), np.float32)
    mask[1, 4:] = 0.0

    def loss_fn(p):
        loss, metrics = jmellow.forward_train(
            p, CFG, jnp.asarray(wave), jnp.asarray(wave), jnp.asarray(text_ids),
            jnp.asarray(ans), jnp.asarray(mask),
        )
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    gnorm = jax.tree.reduce(
        lambda a, x: a + float(jnp.sum(jnp.square(x))), grads, 0.0
    )
    assert gnorm > 0.0
    assert 0.0 <= float(metrics["accuracy"]) <= 1.0
