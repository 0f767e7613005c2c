"""Training-time augmentations (reference: torchlibrosa SpecAugmentation at
htsat.py:655-656,871-872 and do_mixup at htsat.py:30-41,873-874).

All fixed-shape, jit-friendly: stripe positions/widths are drawn with
jax.random and applied as boolean masks (no dynamic shapes)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _drop_stripes(
    x: jax.Array, rng: jax.Array, axis: int, drop_width: int, stripes_num: int
) -> jax.Array:
    """Zero ``stripes_num`` random stripes of width U[0, drop_width) along
    ``axis``, independently per batch row (torchlibrosa DropStripes
    semantics)."""
    B = x.shape[0]
    dim = x.shape[axis]
    idx = jnp.arange(dim)
    mask = jnp.ones((B, dim), bool)
    for s in range(stripes_num):
        k1, k2, rng = jax.random.split(rng, 3)
        width = jax.random.randint(k1, (B, 1), 0, drop_width)
        start = jax.random.randint(k2, (B, 1), 0, jnp.maximum(dim - width, 1))
        stripe = (idx[None, :] >= start) & (idx[None, :] < start + width)
        mask = mask & ~stripe
    shape = [1] * x.ndim
    shape[0] = B
    shape[axis] = dim
    return x * mask.reshape(shape).astype(x.dtype)


def spec_augment(
    x: jax.Array,  # (B, T, F) log-mel
    rng: jax.Array,
    time_drop_width: int = 64,
    time_stripes_num: int = 2,
    freq_drop_width: int = 8,
    freq_stripes_num: int = 2,
) -> jax.Array:
    """Reference config: SpecAugmentation(64, 2, 8, 2) (htsat.py:655-656)."""
    k1, k2 = jax.random.split(rng)
    x = _drop_stripes(x, k1, axis=1, drop_width=time_drop_width, stripes_num=time_stripes_num)
    x = _drop_stripes(x, k2, axis=2, drop_width=freq_drop_width, stripes_num=freq_stripes_num)
    return x


def mixup(x: jax.Array, lam: jax.Array) -> jax.Array:
    """Mix even-indexed rows with odd-indexed rows (htsat.py:30-41):
    out[i] = x[2i] * lam[2i] + x[2i+1] * lam[2i+1]; halves the batch."""
    even = x[0::2]
    odd = x[1::2]
    shape = (-1,) + (1,) * (x.ndim - 1)
    return even * lam[0::2].reshape(shape) + odd * lam[1::2].reshape(shape)


def sample_mixup_lambda(rng: jax.Array, batch: int, alpha: float = 1.0) -> jax.Array:
    """Beta(alpha, alpha) pairs: lam for even rows, 1-lam for their odd
    partners."""
    lam = jax.random.beta(rng, alpha, alpha, (batch // 2,))
    out = jnp.zeros((batch,))
    out = out.at[0::2].set(lam)
    out = out.at[1::2].set(1.0 - lam)
    return out
