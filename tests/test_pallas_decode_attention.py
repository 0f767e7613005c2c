"""Packed-cache fused decode attention (ops/pallas_decode_attention.py)
and its integration (llama.PackedKVCache / decode_step_packed /
flush_packed / generate fused_decode). All kernel invocations run in
interpret mode on the CPU backend (tests/conftest.py); real-chip perf is
measured by benchmarks/exp_decode_attn.py.

Reference behavior covered: the decode attention inside the reference's
loop (mellow/wrapper.py:217) as restated by llama.decode_step — the
packed path must be math-equivalent to the einsum path (exactly at fp32,
up to the documented extra int8 rounding otherwise)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mellow_tpu.config import LlamaConfig
from mellow_tpu.models import generate as gen
from mellow_tpu.models import llama
from mellow_tpu.ops.pallas_decode_attention import (
    HEAD_PAD,
    build_q_tiled,
    extract_o_tiled,
    flash_gqa_decode,
    flash_gqa_decode_tiled,
    lane_pad,
    reference_packed_decode,
    tiled_supported,
    vmem_bytes,
)

SMALL = LlamaConfig(
    vocab_size=512,
    hidden_size=64,
    intermediate_size=128,
    num_layers=4,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    rope_theta=100000.0,
)

# v0 GQA geometry (9 q heads / 3 KV heads / hd=64) at a small hidden size:
# exercises the group-TILED int8 kernel (tiled_supported == True).
SMALL_V0GEOM = LlamaConfig(
    vocab_size=512,
    hidden_size=64,
    intermediate_size=128,
    num_layers=2,
    num_heads=9,
    num_kv_heads=3,
    head_dim=64,
    rope_theta=100000.0,
)


def _group_layout_inputs(seed, B=8, L=3, S8=40, KV=3, hd=64, n_extra=3, EP=8):
    """Random kernel inputs honoring the flat [K | V] packed layout."""
    P2 = 2 * KV * hd
    r = np.random.RandomState(seed)
    q = np.zeros((B, HEAD_PAD, P2), np.float32)
    H = KV * 3
    for g in range(KV):
        for rr in range(3):
            q[:, g * 3 + rr, g * hd: (g + 1) * hd] = r.randn(B, hd) * 0.3
    ex = np.zeros((B, EP, P2), np.float32)
    ex[:, :n_extra] = r.randn(B, n_extra, P2) * 0.3
    vmask = np.zeros(P2, bool)
    vmask[KV * hd:] = True  # the V half holds the outputs
    return q, ex, vmask, H, P2, r


def test_kernel_matches_oracle_bf16():
    B, L, S8, KV, hd, n_extra = 8, 3, 40, 3, 64, 3
    q, ex, vmask, H, P2, r = _group_layout_inputs(0, B, L, S8, KV, hd, n_extra)
    kv = jnp.asarray(r.randn(L, B, S8, P2) * 0.3, jnp.bfloat16)
    qb = jnp.asarray(q, jnp.bfloat16)
    exb = jnp.asarray(ex, jnp.bfloat16)
    flushed = 33
    o = flash_gqa_decode(
        qb, kv, None, exb, jnp.int32(1), jnp.int32(flushed),
        jnp.int32(n_extra), head_dim=hd, interpret=True,
    )
    ref = reference_packed_decode(
        qb, kv[1], None, None, exb, flushed, n_extra, head_dim=hd
    )
    ov = np.asarray(o, np.float32)[:, :H][..., vmask]
    rv = np.asarray(ref, np.float32)[:, :H][..., vmask]
    rel = np.abs(ov - rv) / (np.abs(rv) + 1e-2)
    assert np.median(rel) < 5e-3, np.median(rel)
    assert rel.max() < 0.2, rel.max()  # bf16 rounding noise


def test_kernel_matches_oracle_int8():
    B, L, S8, KV, hd, n_extra = 8, 3, 40, 3, 64, 2
    q, ex, vmask, H, P2, r = _group_layout_inputs(1, B, L, S8, KV, hd, n_extra)
    SP = lane_pad(S8)
    kv = jnp.asarray(r.randint(-127, 128, (L, B, S8, P2)), jnp.int8)
    ksc = r.rand(L, B, S8).astype(np.float32) * 0.01 + 0.001
    vsc = r.rand(L, B, S8).astype(np.float32) * 0.01 + 0.001
    sc = np.zeros((L, B, 2 * SP), np.float32)
    sc[:, :, :S8] = ksc
    sc[:, :, SP: SP + S8] = vsc
    qb = jnp.asarray(q, jnp.bfloat16)
    exb = jnp.asarray(ex, jnp.bfloat16)
    flushed = 33
    o = flash_gqa_decode(
        qb, kv, jnp.asarray(sc), exb, jnp.int32(2), jnp.int32(flushed),
        jnp.int32(n_extra), head_dim=hd, interpret=True,
    )
    ref = reference_packed_decode(
        qb, kv[2], jnp.asarray(ksc[2]), jnp.asarray(vsc[2]), exb,
        flushed, n_extra, head_dim=hd,
    )
    ov = np.asarray(o, np.float32)[:, :H][..., vmask]
    rv = np.asarray(ref, np.float32)[:, :H][..., vmask]
    scale = np.abs(rv).mean()
    # The kernel's extra int8 q/w rounding is ~0.4% relative each (module
    # docstring); bound against the output's own magnitude so near-zero
    # entries don't blow up the ratio.
    assert np.abs(ov - rv).mean() < 0.03 * scale
    assert np.abs(ov - rv).max() < 0.3 * scale


def test_tiled_kernel_matches_full_width_int8():
    """The group-tiled kernel computes the SAME math as the full-width
    kernel (identical per-row q/w int8 quantization — each head row's 64
    nonzero lanes set the same qmax), just with 2.4x fewer hardware MACs;
    per-head outputs must match the full-width kernel's V-half blocks."""
    assert tiled_supported(9, 3, 64)
    assert not tiled_supported(4, 2, 16)
    B, L, S8, KV, hd, n_extra = 8, 2, 40, 3, 64, 3
    rep = 3
    H = KV * rep
    KL = KV * hd
    P2 = 2 * KL
    SP = lane_pad(S8)
    r = np.random.RandomState(11)
    qg = jnp.asarray(r.randn(B, KV, rep, hd) * 0.3, jnp.bfloat16)
    ex = np.zeros((B, 8, P2), np.float32)
    ex[:, :n_extra] = r.randn(B, n_extra, P2) * 0.3
    exb = jnp.asarray(ex, jnp.bfloat16)
    kv = jnp.asarray(r.randint(-127, 128, (L, B, S8, P2)), jnp.int8)
    sc = np.zeros((L, B, 2 * SP), np.float32)
    sc[:, :, :S8] = r.rand(L, B, S8) * 0.01 + 0.001
    sc[:, :, SP: SP + S8] = r.rand(L, B, S8) * 0.01 + 0.001
    scj = jnp.asarray(sc)
    flushed = 33

    # Full-width layout for the same queries.
    eye = jnp.eye(KV, dtype=qg.dtype)
    q_dense = jnp.einsum("bgrd,gk->bgrkd", qg, eye).reshape(B, H, KL)
    q_dense = jnp.pad(q_dense, ((0, 0), (0, HEAD_PAD - H), (0, KL)))
    o_full = flash_gqa_decode(
        q_dense, kv, scj, exb, jnp.int32(1), jnp.int32(flushed),
        jnp.int32(n_extra), head_dim=hd, interpret=True,
    )
    o_full = np.asarray(o_full, np.float32)
    o_full_heads = np.stack(
        [o_full[:, g * rep + rr, KL + g * hd: KL + (g + 1) * hd]
         for g in range(KV) for rr in range(rep)], axis=1,
    ).reshape(B, 1, H * hd)

    out = flash_gqa_decode_tiled(
        build_q_tiled(qg), kv, scj, exb, jnp.int32(1), jnp.int32(flushed),
        jnp.int32(n_extra), head_dim=hd, interpret=True,
    )
    o_tiled = np.asarray(extract_o_tiled(out, jnp.float32))
    scale = np.abs(o_full_heads).mean()
    assert np.abs(o_tiled - o_full_heads).max() < 1e-2 * scale, (
        np.abs(o_tiled - o_full_heads).max(), scale)


def test_decode_step_packed_tiled_int8_vs_einsum():
    """decode_step_packed dispatches to the tiled kernel for int8 caches
    at the v0 geometry; hidden states must match the einsum int8 path up
    to the kernel's documented in-kernel q/w requantization (~0.4%/layer
    relative each)."""
    cfg = SMALL_V0GEOM
    r = np.random.RandomState(12)
    params = llama.init_params(jax.random.PRNGKey(4), cfg, jnp.float32)
    B, P, W = 2, 7, 3
    S_max = P + W
    prefix = jnp.asarray(r.randn(B, P, cfg.hidden_size) * 0.1, jnp.float32)

    cache_e = llama.KVCache.create(cfg, B, S_max, jnp.int8)
    x_e, cache_e = llama.prefill(params, cfg, prefix, cache_e)
    cache_p = llama.PackedKVCache.create(cfg, B, S_max, jnp.int8)
    x_p, cache_p = llama.prefill(params, cfg, prefix, cache_p)
    np.testing.assert_allclose(
        np.asarray(x_p), np.asarray(x_e), rtol=2e-5, atol=2e-5)

    cos_np, sin_np = llama.rope_tables(cfg, cache_p.kv.shape[2], jnp.float32)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)
    P2 = llama.PackedKVCache.packed_dim(cfg)
    extras = jnp.zeros((cfg.num_layers, B, W, P2), jnp.float32)
    pending = ()
    for i in range(W):
        tok = jnp.asarray(r.randn(B, cfg.hidden_size) * 0.1, jnp.float32)
        h_e, _, pending = llama.decode_step(
            params, cfg, tok, cache_e, cos, sin, pending)
        h_p, extras = llama.decode_step_packed(
            params, cfg, tok, cache_p, cos, sin, extras, i, interpret=True)
        he, hp = np.asarray(h_e), np.asarray(h_p)
        rel = np.abs(hp - he).mean() / (np.abs(he).mean() + 1e-9)
        assert rel < 0.05, (i, rel)


def test_generate_fused_decode_int8_tiled(monkeypatch):
    """End-to-end generate with an int8 cache takes the tiled-kernel
    packed path (v0 geometry); greedy tokens must agree with the einsum
    int8 path on nearly every step (the only divergence source is the
    kernel's extra in-kernel q/w rounding)."""
    monkeypatch.setenv("MELLOW_TPU_FORCE_FUSED_DECODE", "interpret")
    cfg = SMALL_V0GEOM
    r = np.random.RandomState(13)
    params = llama.init_params(jax.random.PRNGKey(5), cfg, jnp.float32)
    B, P, max_len = 2, 6, 16
    prefix = jnp.asarray(r.randn(B, P, cfg.hidden_size) * 0.2, jnp.float32)
    kw = dict(max_len=max_len, stop_token_id=-1, greedy=True,
              cache_dtype="int8")
    out_p = gen.generate(params, cfg, prefix, fused_decode=True, **kw)
    out_e = gen.generate(params, cfg, prefix, fused_decode=False, **kw)
    agree = float(
        (np.asarray(out_p.tokens) == np.asarray(out_e.tokens)).mean()
    )
    assert agree >= 0.9, agree


def test_kernel_ignores_masked_cache_and_extras():
    """Values beyond `flushed` / `n_extra` must not leak into the output."""
    B, L, S8, KV, hd, n_extra = 8, 2, 24, 3, 64, 2
    q, ex, vmask, H, P2, r = _group_layout_inputs(2, B, L, S8, KV, hd, n_extra)
    kv = r.randn(L, B, S8, P2).astype(np.float32) * 0.3
    flushed = 17
    kv2 = kv.copy()
    kv2[:, :, flushed:] = 77.0  # garbage beyond the flushed count
    ex2 = ex.copy()
    ex2[:, n_extra:] = -55.0
    args = dict(head_dim=hd, interpret=True)
    qb = jnp.asarray(q, jnp.bfloat16)
    o1 = flash_gqa_decode(
        qb, jnp.asarray(kv, jnp.bfloat16), None,
        jnp.asarray(ex, jnp.bfloat16), jnp.int32(0), jnp.int32(flushed),
        jnp.int32(n_extra), **args,
    )
    o2 = flash_gqa_decode(
        qb, jnp.asarray(kv2, jnp.bfloat16), None,
        jnp.asarray(ex2, jnp.bfloat16), jnp.int32(0), jnp.int32(flushed),
        jnp.int32(n_extra), **args,
    )
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_packed_cache_commit_and_flush_roundtrip():
    """prefill's packed commit + flush_packed must store exactly what
    quantize_kv produces, at the right positions, in the flat [K | V]
    layout."""
    cfg = SMALL
    B, S_max, P = 4, 24, 9
    KV, hd = cfg.num_kv_heads, cfg.head_dim
    r = np.random.RandomState(3)
    cache = llama.PackedKVCache.create(cfg, B, S_max, jnp.int8)
    ks = jnp.asarray(r.randn(cfg.num_layers, B, P, KV * hd), jnp.float32)
    vs = jnp.asarray(r.randn(cfg.num_layers, B, P, KV * hd), jnp.float32)
    cache = llama._write_packed(cfg, cache, ks, vs, jnp.int32(0))
    assert int(cache.length) == P

    k8, ksc = llama.quantize_kv(ks)
    v8, vsc = llama.quantize_kv(vs)
    KL = KV * hd
    kv = np.asarray(cache.kv)
    np.testing.assert_array_equal(kv[:, :, :P, :KL], np.asarray(k8))
    np.testing.assert_array_equal(kv[:, :, :P, KL:], np.asarray(v8))
    SP = cache.scale.shape[-1] // 2
    np.testing.assert_allclose(
        np.asarray(cache.scale)[:, :, :P], np.asarray(ksc), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(cache.scale)[:, :, SP: SP + P], np.asarray(vsc), rtol=1e-6)

    # flush a 2-row window of packed extras on top
    W = 2
    ek = r.randn(cfg.num_layers, B, W, KV * hd).astype(np.float32)
    ev = r.randn(cfg.num_layers, B, W, KV * hd).astype(np.float32)
    extras = llama._pack_kv_rows(
        jnp.asarray(ek), jnp.asarray(ev), KV, hd
    )
    cache2 = llama.flush_packed(cfg, cache, extras, W)
    assert int(cache2.length) == P + W
    ek8, eksc = llama.quantize_kv(jnp.asarray(ek))
    kv2 = np.asarray(cache2.kv)
    np.testing.assert_array_equal(
        kv2[:, :, P: P + W, :KL], np.asarray(ek8))
    np.testing.assert_allclose(
        np.asarray(cache2.scale)[:, :, P: P + W], np.asarray(eksc), rtol=1e-6)


def test_decode_step_packed_matches_einsum_fp32():
    """At fp32 the packed path's math is the einsum path's math (the int8
    re-quantization only exists for int8 caches) — outputs must agree to
    fp32 tolerance across a full flush window."""
    cfg = SMALL
    r = np.random.RandomState(4)
    params = llama.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    B, P, W = 2, 7, 4
    S_max = P + W
    prefix = jnp.asarray(r.randn(B, P, cfg.hidden_size) * 0.1, jnp.float32)

    cache_e = llama.KVCache.create(cfg, B, S_max, jnp.float32)
    x_e, cache_e = llama.prefill(params, cfg, prefix, cache_e)
    cache_p = llama.PackedKVCache.create(cfg, B, S_max, jnp.float32)
    x_p, cache_p = llama.prefill(params, cfg, prefix, cache_p)
    np.testing.assert_allclose(
        np.asarray(x_p), np.asarray(x_e), rtol=2e-5, atol=2e-5)

    cos_np, sin_np = llama.rope_tables(cfg, cache_p.kv.shape[2], jnp.float32)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)
    P2 = llama.PackedKVCache.packed_dim(cfg)
    extras = jnp.zeros((cfg.num_layers, B, W, P2), jnp.float32)
    pending = ()
    h_e, h_p = x_e, x_p
    for i in range(W):
        tok = jnp.asarray(r.randn(B, cfg.hidden_size) * 0.1, jnp.float32)
        h_e, _, pending = llama.decode_step(
            params, cfg, tok, cache_e, cos, sin, pending)
        h_p, extras = llama.decode_step_packed(
            params, cfg, tok, cache_p, cos, sin, extras, i, interpret=True)
        np.testing.assert_allclose(
            np.asarray(h_p), np.asarray(h_e), rtol=2e-4, atol=2e-4,
            err_msg=f"sub-step {i}",
        )
    # Flushing both and decoding once more exercises flush_packed's writes.
    cache_e = llama.flush_pending(cfg, cache_e, pending)
    cache_p = llama.flush_packed(cfg, cache_p, extras, W)
    assert int(cache_p.length) == int(cache_e.length) == P + W


def test_generate_fused_decode_token_parity(monkeypatch):
    """generate(fused_decode) end-to-end (prefill + windowed loop + flush)
    must emit the same greedy tokens as the einsum path at fp32."""
    monkeypatch.setenv("MELLOW_TPU_FORCE_FUSED_DECODE", "interpret")
    cfg = SMALL
    r = np.random.RandomState(5)
    params = llama.init_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    # Distinct shapes from other tests: the env gate is read at trace
    # time, so a cached trace from another shape would bypass it.
    B, P, max_len = 3, 6, 24
    prefix = jnp.asarray(r.randn(B, P, cfg.hidden_size) * 0.2, jnp.float32)
    kw = dict(
        max_len=max_len, stop_token_id=-1, greedy=True,
        cache_dtype="float32",
    )
    out_p = gen.generate(params, cfg, prefix, fused_decode=True, **kw)
    out_e = gen.generate(params, cfg, prefix, fused_decode=False, **kw)
    np.testing.assert_array_equal(
        np.asarray(out_p.tokens), np.asarray(out_e.tokens))


def test_vmem_gate_arithmetic():
    # Headline shape comfortably inside the ~16 MB VMEM budget; absurd
    # shapes rejected.
    assert vmem_bytes(256, 536, 384, 8, 1) < 14 * 1024 * 1024
    assert vmem_bytes(2048, 4096, 384, 8, 2) > 14 * 1024 * 1024


def test_generate_fused_decode_sampling_parity(monkeypatch):
    """Sampling (W=2, EP<8 kernel pad path): identical filtered logits =>
    identical categorical draws vs the einsum path at fp32."""
    monkeypatch.setenv("MELLOW_TPU_FORCE_FUSED_DECODE", "interpret")
    cfg = SMALL
    r = np.random.RandomState(6)
    params = llama.init_params(jax.random.PRNGKey(2), cfg, jnp.float32)
    B, P, max_len = 2, 5, 10
    prefix = jnp.asarray(r.randn(B, P, cfg.hidden_size) * 0.2, jnp.float32)
    kw = dict(
        max_len=max_len, stop_token_id=-1, greedy=False, top_p=0.9,
        temperature=1.3, top_k=7, cache_dtype="float32",
        rng=jax.random.PRNGKey(7),
    )
    out_p = gen.generate(params, cfg, prefix, fused_decode=True, **kw)
    out_e = gen.generate(params, cfg, prefix, fused_decode=False, **kw)
    np.testing.assert_array_equal(
        np.asarray(out_p.tokens), np.asarray(out_e.tokens))


def test_cascade_compaction_through_packed_cache(monkeypatch):
    """generate_cascade's _compact_state must gather the PackedKVCache's
    kv/scale fields; trimmed rows match the static packed path."""
    monkeypatch.setenv("MELLOW_TPU_FORCE_FUSED_DECODE", "interpret")
    cfg = SMALL
    r = np.random.RandomState(8)
    params = llama.init_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    B, P, max_len = 4, 5, 16
    prefix = jnp.asarray(r.randn(B, P, cfg.hidden_size) * 0.2, jnp.float32)
    # Find a token some rows emit early: run static first, use its most
    # common first token as the stop id so the cascade compacts.
    probe = gen.generate(params, cfg, prefix, max_len=max_len,
                         stop_token_id=-1, greedy=True,
                         cache_dtype="float32", fused_decode=True)
    stop_id = int(np.asarray(probe.tokens)[0, 2])
    kw = dict(max_len=max_len, stop_token_id=stop_id, greedy=True,
              cache_dtype="float32")
    static = gen.generate(params, cfg, prefix, fused_decode=True, **kw)
    casc = gen.generate_cascade(params, cfg, prefix, fused_decode=True,
                                min_batch=1, **kw)
    st, ct = np.asarray(static.tokens), np.asarray(casc.tokens)
    for b in range(B):
        row_s, row_c = st[b], ct[b]
        idx = np.nonzero(row_s == stop_id)[0]
        n = idx[0] if len(idx) else len(row_s)
        np.testing.assert_array_equal(row_c[:n], row_s[:n], err_msg=f"row {b}")
