"""Fused Swin window-attention kernel vs the einsum formulation
(interpret mode on CPU). Reference semantics: mellow/model/htsat.py:301-332."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mellow_tpu.models.htsat import relative_position_index, shifted_window_mask
from mellow_tpu.ops.pallas_window_attention import window_attention_fused


def _oracle(qkv, bias_h, mask, H, N):
    Bn, _, C3 = qkv.shape
    C = C3 // 3
    hd = C // H
    q, k, v = [a.reshape(Bn, N, H, hd) for a in jnp.split(qkv, 3, axis=-1)]
    attn = jnp.einsum("bqhd,bkhd->bhqk", q * hd**-0.5, k).astype(jnp.float32)
    attn = attn + bias_h[None]
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(Bn // nW, nW, H, N, N) + jnp.asarray(
            mask, jnp.float32
        )[None, :, None]
        attn = attn.reshape(Bn, H, N, N)
    p = jax.nn.softmax(attn, axis=-1).astype(qkv.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(Bn, N, C)


@pytest.mark.parametrize("shifted", [False, True])
@pytest.mark.parametrize(
    "Bn,ws,H,C",
    [
        (8, 4, 4, 32),   # small smoke shape
        (16, 8, 4, 96),  # stage-1 geometry (reduced Bn)
    ],
)
def test_matches_einsum(Bn, ws, H, C, shifted):
    N = ws * ws
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(Bn, N, 3 * C) * 0.3, jnp.float32)
    table = rng.randn((2 * ws - 1) ** 2, H) * 0.1
    idx = relative_position_index(ws)
    bias_h = jnp.asarray(
        table[idx.reshape(-1)].reshape(N, N, H).transpose(2, 0, 1), jnp.float32
    )
    if shifted:
        # 4 distinct window masks over a 2x2 window grid
        mask = shifted_window_mask(2 * ws, ws, ws // 2)
        assert Bn % mask.shape[0] == 0
    else:
        mask = None
    out = window_attention_fused(
        qkv, bias_h.reshape(H * N, N), mask,
        num_heads=H, window_size=ws, interpret=True,
    )
    ref = _oracle(qkv, bias_h, mask, H, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-6)


def test_chunk_divisor_fallback():
    """Bn not divisible by the auto chunk must still work."""
    ws, H, C, Bn = 4, 2, 16, 6
    N = ws * ws
    rng = np.random.RandomState(1)
    qkv = jnp.asarray(rng.randn(Bn, N, 3 * C) * 0.3, jnp.float32)
    bias = jnp.zeros((H * N, N), jnp.float32)
    out = window_attention_fused(
        qkv, bias, None, num_heads=H, window_size=ws, interpret=True, chunk=4
    )
    ref = _oracle(qkv, bias.reshape(H, N, N) * 0, None, H, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-6)
