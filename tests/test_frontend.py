"""Front-end golden tests vs torch oracles (torchlibrosa semantics:
hann/center/reflect power STFT + slaney mel + 10*log10; reference
mellow/model/htsat.py:647-653, 830-845, 868-870)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from mellow_tpu.config import FrontendConfig
from mellow_tpu.ops import frontend as fe

CFG = FrontendConfig()


def _rand_wave(b=2, n=None, seed=0):
    rng = np.random.RandomState(seed)
    n = n or CFG.num_samples
    return (rng.randn(b, n) * 0.1).astype(np.float32)


def torch_power_stft(wave: np.ndarray) -> np.ndarray:
    """Oracle: torch.stft with torchlibrosa's exact settings (periodic hann,
    center=True, reflect pad, onesided, power)."""
    win = torch.hann_window(CFG.win_length, periodic=True, dtype=torch.float64)
    spec = torch.stft(
        torch.from_numpy(wave).double(),
        n_fft=CFG.n_fft,
        hop_length=CFG.hop_length,
        win_length=CFG.win_length,
        window=win,
        center=True,
        pad_mode="reflect",
        onesided=True,
        return_complex=True,
    )
    return (spec.abs() ** 2).transpose(1, 2).numpy()  # (B, frames, bins)


def test_power_spectrogram_matches_torch_stft():
    wave = _rand_wave()
    ref = torch_power_stft(wave)
    ours = np.asarray(fe.power_spectrogram(jnp.asarray(wave), CFG))
    assert ours.shape == (2, CFG.num_frames, CFG.num_bins) == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


def test_logmel_shape_and_range():
    wave = _rand_wave()
    out = np.asarray(fe.log_mel_spectrogram(jnp.asarray(wave), CFG))
    assert out.shape == (2, 1001, 64)
    # amin=1e-10 -> floor at -100 dB
    assert out.min() >= -100.0 - 1e-5
    assert np.isfinite(out).all()


def test_mel_filterbank_properties():
    """Without librosa available, validate the slaney filterbank against its
    defining properties plus the documented mel-scale breakpoints."""
    fb = fe.mel_filterbank(CFG.sample_rate, CFG.n_fft, CFG.n_mels, CFG.fmin, CFG.fmax)
    assert fb.shape == (513, 64)
    assert (fb >= 0).all()
    # Each filter is nonempty and unimodal (triangular).
    for m in range(64):
        col = fb[:, m]
        assert col.max() > 0
        peak = col.argmax()
        assert (np.diff(col[: peak + 1]) >= -1e-9).all()
        assert (np.diff(col[peak:]) <= 1e-9).all()
    # Slaney scale: exactly linear below 1 kHz (mel = hz * 3/200).
    np.testing.assert_allclose(fe.hz_to_mel(500.0), 7.5, rtol=1e-12)
    np.testing.assert_allclose(fe.hz_to_mel(1000.0), 15.0, rtol=1e-12)
    # Round trip.
    hz = np.linspace(CFG.fmin, CFG.fmax, 100)
    np.testing.assert_allclose(fe.mel_to_hz(fe.hz_to_mel(hz)), hz, rtol=1e-9)
    # No filter energy outside [fmin, fmax].
    freqs = np.linspace(0, CFG.sample_rate / 2, 513)
    outside = (freqs < CFG.fmin - 40) | (freqs > CFG.fmax + 40)
    assert fb[outside].sum() == 0


def test_bicubic_matches_torch_interpolate():
    """The 1001 -> 1024 align_corners=True resize must reproduce torch's
    kernel exactly (SURVEY.md section 7.3 item 1)."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 1001, 64).astype(np.float32)
    # Reference path: interpolate (B, C=1, T, F) bicubic on the T axis only
    # (F already at target), align_corners=True (htsat.py:837).
    ref = (
        F.interpolate(
            torch.from_numpy(x)[:, None],
            (1024, 64),
            mode="bicubic",
            align_corners=True,
        )[:, 0]
        .numpy()
    )
    ours = np.asarray(fe.resize_time_bicubic(jnp.asarray(x), 1024))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_batchnorm_mel_matches_torch_eval_bn():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 100, 64).astype(np.float32)
    bn = torch.nn.BatchNorm2d(64)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(rng.randn(64).astype(np.float32)))
        bn.bias.copy_(torch.from_numpy(rng.randn(64).astype(np.float32)))
        bn.running_mean.copy_(torch.from_numpy(rng.randn(64).astype(np.float32)))
        bn.running_var.copy_(torch.from_numpy(np.abs(rng.randn(64)).astype(np.float32) + 0.5))
    bn.eval()
    with torch.no_grad():
        # reference applies bn with mel as channel dim via transpose
        # (htsat.py:868-870): (B,1,T,F) -> (B,F,T,1) -> bn -> back
        xt = torch.from_numpy(x)[:, None]  # (B,1,T,F)
        ref = bn(xt.transpose(1, 3)).transpose(1, 3)[:, 0].numpy()
    params = {
        "scale": bn.weight.detach().numpy(),
        "bias": bn.bias.detach().numpy(),
        "mean": bn.running_mean.numpy(),
        "var": bn.running_var.numpy(),
    }
    ours = np.asarray(fe.batchnorm_mel(jnp.asarray(x), params))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_fold_matches_torch_reshape():
    """fold_time_to_freq must equal the reference permute/reshape dance
    (htsat.py:840-845)."""
    rng = np.random.RandomState(2)
    x = rng.randn(2, 1024, 64).astype(np.float32)
    t = torch.from_numpy(x)[:, None]  # (B,1,T,F)
    t = t.permute(0, 1, 3, 2).contiguous()  # (B,1,F,T)
    t = t.reshape(2, 1, 64, 4, 256)
    t = t.permute(0, 1, 3, 2, 4).contiguous()
    ref = t.reshape(2, 1, 256, 256)[:, 0].numpy()
    ours = np.asarray(fe.fold_time_to_freq(jnp.asarray(x), 4))
    np.testing.assert_array_equal(ours, ref)


def test_frontend_image_end_to_end_shapes():
    wave = _rand_wave()
    bn0 = {
        "scale": jnp.ones(64), "bias": jnp.zeros(64),
        "mean": jnp.zeros(64), "var": jnp.ones(64),
    }
    img = fe.frontend_image(jnp.asarray(wave), CFG, bn0, 4, 1024)
    assert img.shape == (2, 256, 256)
    assert np.isfinite(np.asarray(img)).all()
