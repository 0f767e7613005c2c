"""Fused Pallas log-mel kernel vs the jnp reference implementation.
Runs in interpreter mode on the CPU test backend (the compiled kernel is
exercised on real TPU by bench.py and the wrapper's auto-dispatch)."""

import numpy as np
import jax.numpy as jnp

from mellow_tpu.config import FrontendConfig
from mellow_tpu.ops import frontend as fe
from mellow_tpu.ops.pallas_melspec import log_mel_spectrogram_pallas

CFG = FrontendConfig()


def test_kernel_matches_jnp_reference_interpret():
    rng = np.random.RandomState(0)
    wave = jnp.asarray((rng.randn(2, CFG.num_samples) * 0.1).astype(np.float32))
    ref = np.asarray(fe.log_mel_spectrogram(wave, CFG))
    out = np.asarray(log_mel_spectrogram_pallas(wave, CFG, interpret=True))
    assert out.shape == ref.shape == (2, 1001, 64)
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-4)


def test_auto_dispatch_on_cpu_uses_reference():
    rng = np.random.RandomState(1)
    wave = jnp.asarray((rng.randn(1, CFG.num_samples) * 0.1).astype(np.float32))
    auto = np.asarray(fe.log_mel_auto(wave, CFG))
    ref = np.asarray(fe.log_mel_spectrogram(wave, CFG))
    np.testing.assert_array_equal(auto, ref)
