"""HTSAT encoder parity vs the torch oracle (tests/oracles/torch_htsat.py,
which restates mellow/model/htsat.py with reference-compatible state_dict
keys so the checkpoint converter is exercised on every run)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from mellow_tpu.config import FrontendConfig, HTSATConfig
from mellow_tpu.models import htsat as jhtsat
from mellow_tpu.ops import frontend as fe

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.convert_ckpt import convert_encoder_bundle  # noqa: E402
from tests.oracles import torch_htsat as oracle  # noqa: E402

CFG = HTSATConfig()
FE = FrontendConfig()


def _to_ref_layout(wrapper: "oracle.OracleWrapper") -> dict:
    """Rename oracle keys to the reference checkpoint layout
    (audio_encoder.base.htsat.*, audio_encoder.base.c2l.*,
    audio_encoder.projection.*; SURVEY.md section 5.4)."""
    sd = {}
    for k, v in wrapper.state_dict().items():
        if k.startswith("htsat.") or k.startswith("c2l."):
            sd["audio_encoder.base." + k] = v
        else:  # linear1 / linear2 / layer_norm
            sd["audio_encoder.projection." + k] = v
    return sd


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    wrapper = oracle.OracleWrapper()
    # Give bn0 non-trivial running stats.
    with torch.no_grad():
        bn = wrapper.htsat.bn0
        bn.running_mean.copy_(torch.randn(64) * 2)
        bn.running_var.copy_(torch.rand(64) * 3 + 0.5)
        bn.weight.copy_(torch.randn(64) * 0.5 + 1)
        bn.bias.copy_(torch.randn(64) * 0.1)
    wrapper.eval()
    params = jax.tree.map(jnp.asarray, convert_encoder_bundle(_to_ref_layout(wrapper)))
    return wrapper, params


def test_window_attention_parity():
    torch.manual_seed(1)
    dim, ws, heads = 96, 8, 4
    mod = oracle.WindowAttention(dim, ws, heads).eval()
    x = torch.randn(6, ws * ws, dim)
    with torch.no_grad():
        ref = mod(x).numpy()
    p = {
        "qkv": {"kernel": jnp.asarray(mod.qkv.weight.detach().numpy().T),
                "bias": jnp.asarray(mod.qkv.bias.detach().numpy())},
        "proj": {"kernel": jnp.asarray(mod.proj.weight.detach().numpy().T),
                 "bias": jnp.asarray(mod.proj.bias.detach().numpy())},
        "rel_bias_table": jnp.asarray(mod.relative_position_bias_table.detach().numpy()),
    }
    ours = np.asarray(
        jhtsat.window_attention(jnp.asarray(x.numpy()), p, heads, ws, None)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


def test_shifted_window_mask_matches_oracle():
    blk = oracle.SwinBlock(32, 16, 2, 8, 4)
    ref = blk.attn_mask.numpy()
    ours = jhtsat.shifted_window_mask(16, 8, 4)
    np.testing.assert_array_equal(ours, ref)


def test_full_encoder_parity_on_image(pair):
    """Swin trunk + TSCAM + c2l + projection on a random spec image."""
    wrapper, params = pair
    rng = np.random.RandomState(0)
    img = rng.randn(2, 1, 256, 256).astype(np.float32)
    with torch.no_grad():
        ref = wrapper(torch.from_numpy(img))

    tokens = jhtsat.swin_features(jnp.asarray(img[:, 0]), params["encoder"], CFG)
    out = jhtsat.tscam_head(tokens, params["encoder"], CFG)
    oframe = out["framewise_output"] @ params["c2l"]["kernel"] + params["c2l"]["bias"]
    emb = jnp.concatenate([out["latent_output"][:, None], oframe], axis=1)
    proj = jhtsat.projection(emb, params["projection"])

    np.testing.assert_allclose(
        np.asarray(out["latent_output"]), ref["latent_output"].numpy(), atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["framewise_output"]), ref["framewise_output"].numpy(), atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["clipwise_output"]), ref["clipwise_output"].numpy(), atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(emb), ref["embedding"].numpy(), atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(proj), ref["projected"].numpy(), atol=2e-4, rtol=1e-3
    )


def test_wave_to_projection_parity(pair):
    """Whole audio path: waveform -> projected (B, 1025, 576), with the
    oracle front-end composed from validated torch pieces."""
    wrapper, params = pair
    rng = np.random.RandomState(1)
    wave = (rng.randn(1, FE.num_samples) * 0.1).astype(np.float32)

    mel_fb = fe.mel_filterbank(FE.sample_rate, FE.n_fft, FE.n_mels, FE.fmin, FE.fmax)
    with torch.no_grad():
        img = oracle.oracle_frontend_image(wave, wrapper.htsat.bn0, mel_fb)
        ref = wrapper(img)

    proj = jhtsat.encode_audio(jnp.asarray(wave), params, FE, CFG)
    np.testing.assert_allclose(
        np.asarray(proj), ref["projected"].numpy(), atol=5e-4, rtol=5e-3
    )


def test_compact_path_equals_full_path(pair):
    """ADVICE r4: pin the compact 33-unique-row rewrite independently of
    the torch-oracle tolerance. The FULL path (htsat_embedding ->
    projection, never routed through the compact core) must equal the
    expanded compact path ROW-EXACTLY (every op between the 32 unique
    fpx rows and the prefix pool is row-wise), and downsample_tokens of
    the expansion must equal downsample_tokens_compact of the compact
    form (each pooled group of 8 lies inside one 32-repeat block)."""
    wrapper, params = pair
    rng = np.random.RandomState(7)
    wave = jnp.asarray((rng.randn(1, FE.num_samples) * 0.1), jnp.float32)

    full_emb = jhtsat.htsat_embedding(wave, params, FE, CFG)["embedding"]
    full = jhtsat.projection(full_emb, params["projection"])  # (B, 1025, D)
    compact = jhtsat.encode_audio_compact(wave, params, FE, CFG)  # (B, 33, D)
    expanded = jnp.concatenate(
        [compact[:, :1], jnp.repeat(compact[:, 1:], 32, axis=1)], axis=1
    )
    # Row-exact up to matmul tiling: XLA blocks the (1024, 527) and
    # (32, 527) c2l matmuls differently, so identical rows differ by
    # accumulate-order ulps (measured max 2.5e-6 on O(1) post-LayerNorm
    # values) — a repeat/alignment bug would be O(1), orders above this.
    np.testing.assert_allclose(
        np.asarray(expanded), np.asarray(full), atol=1e-5, rtol=0
    )
    # encode_audio's eval route IS the expansion (bitwise).
    np.testing.assert_array_equal(
        np.asarray(jhtsat.encode_audio(wave, params, FE, CFG)),
        np.asarray(expanded),
    )
    # Pooled prefix tokens: repeat factor 4 vs mean-of-8-identical-rows
    # (same ulp bound; the mean of 8 equal values is exact).
    np.testing.assert_allclose(
        np.asarray(jhtsat.downsample_tokens(full)),
        np.asarray(jhtsat.downsample_tokens_compact(compact)),
        atol=1e-5, rtol=0,
    )


def test_downsample_matches_torch_avgpool(pair):
    import torch.nn.functional as F

    rng = np.random.RandomState(2)
    x = rng.randn(2, 1025, 576).astype(np.float32)
    t = torch.from_numpy(x)
    ref = torch.cat(
        [t[:, :1], F.avg_pool2d(t[:, 1:], kernel_size=(8, 1))], dim=1
    ).numpy()  # decoder.py:14-18
    ours = np.asarray(jhtsat.downsample_tokens(jnp.asarray(x)))
    assert ours.shape == (2, 129, 576)
    np.testing.assert_allclose(ours, ref, atol=1e-6, rtol=1e-5)


def test_long_audio_sliding_window(pair):
    """Long-audio path: batched-crops result must equal a per-crop loop
    (the reference's Python loop, htsat.py:908-936) over the same trunk."""
    wrapper, params = pair
    rng = np.random.RandomState(3)
    wave = jnp.asarray((rng.randn(1, 480000) * 0.1).astype(np.float32))  # 15 s

    out = jhtsat.htsat_embedding_long(wave, params, FE, CFG)
    assert out["embedding"].shape == (1, 1025, 768)
    assert np.isfinite(np.asarray(out["embedding"])).all()

    # Oracle: explicit loop over the same crops.
    x = fe.log_mel_auto(wave, FE)
    x = fe.batchnorm_mel(x, params["encoder"]["bn0"])
    T = x.shape[1]
    starts = list(range(0, T - 689 - 1, 344))
    outs = []
    for s in starts:
        crop = fe.resize_time_bicubic(x[:, s : s + 689], CFG.target_frames)
        img = fe.fold_time_to_freq(crop, CFG.freq_ratio)
        tokens = jhtsat.swin_features(img, params["encoder"], CFG)
        outs.append(jhtsat.tscam_head(tokens, params["encoder"], CFG))
    lat = np.mean([np.asarray(o["latent_output"]) for o in outs], axis=0)
    np.testing.assert_allclose(
        np.asarray(out["latent_output"]), lat, atol=1e-5, rtol=1e-5
    )


def test_infer_mode_repeat_path(pair):
    _, params = pair
    rng = np.random.RandomState(4)
    wave = jnp.asarray((rng.randn(1, 96000) * 0.1).astype(np.float32))  # 3 s
    out = jhtsat.htsat_embedding_infer_mode(wave, params, FE, CFG)
    assert out["embedding"].shape == (1, 1025, 768)
    assert np.isfinite(np.asarray(out["embedding"])).all()


def test_attention_map_surface():
    """Opt-in eval attention maps (VERDICT r4 missing #3): the
    reference's WindowAttention returns its probabilities and BasicLayer
    mean-stacks them per stage at eval (reference htsat.py:332, 560-567).
    swin_features_with_attn must (a) leave the token output bit-identical
    to swin_features, (b) return one map per stage shaped
    (num_windows*B, H, N, N) with softmax rows summing to 1."""
    from mellow_tpu.config import HTSATConfig as HC, MellowConfig, LlamaConfig
    from mellow_tpu.models import mellow as jmellow

    enc = HC(embed_dim=8, out_emb=64)
    cfg = MellowConfig(
        encoder=enc,
        decoder=LlamaConfig(
            vocab_size=64, hidden_size=16, intermediate_size=32,
            num_layers=1, num_heads=2, num_kv_heads=1, head_dim=8,
        ),
        d_proj=16, text_tokenization_len=4, prefix_length=264,
    ).validate()
    params = jmellow.init_params(jax.random.PRNGKey(0), cfg)["encoder"]
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, enc.spec_size, enc.spec_size), jnp.float32)

    tokens_plain = jhtsat.swin_features(img, params, enc)
    tokens, attns = jhtsat.swin_features_with_attn(img, params, enc)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(tokens_plain))

    assert len(attns) == len(enc.depths)
    res = enc.grid_size
    N = enc.window_size ** 2
    for si, a in enumerate(attns):
        ws = min(enc.window_size, res)
        n_tok = ws * ws
        n_win = (res // ws) ** 2 if res >= ws else 1
        assert a.shape == (n_win * 2, enc.num_heads[si], n_tok, n_tok), si
        sums = np.asarray(jnp.sum(a, axis=-1))
        np.testing.assert_allclose(sums, 1.0, atol=1e-5)
        if si < len(enc.depths) - 1:
            res //= 2
