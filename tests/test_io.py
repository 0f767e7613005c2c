"""Audio IO tests: RIFF reader vs stdlib-written fixtures and the bundled
reference wavs; resampler property tests (no torchaudio in this env, so the
oracle is signal-level: tone fidelity, DC gain, length contract)."""

import io
import math
import struct
import wave as stdwave

import numpy as np
import pytest

from mellow_tpu.io.resample import resample
from mellow_tpu.io.wav import read_wav
from tests.oracles.torch_resample import resample_oracle

REF_WAV1 = "/root/reference/resource/1.wav"
REF_WAV2 = "/root/reference/resource/2.wav"


def _write_pcm16(path, data_f32, sr, channels=1):
    ints = np.clip(data_f32 * 32768.0, -32768, 32767).astype("<i2")
    with stdwave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(ints.tobytes())


def test_read_pcm16_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    data = (rng.randn(1000) * 0.3).clip(-1, 1).astype(np.float32)
    p = tmp_path / "t.wav"
    _write_pcm16(p, data, 16000)
    out, sr = read_wav(str(p))
    assert sr == 16000 and out.shape == (1, 1000)
    np.testing.assert_allclose(
        out[0], np.clip(data * 32768, -32768, 32767).astype(np.int16) / 32768.0, atol=0
    )


def test_read_stereo_interleave(tmp_path):
    left = np.linspace(-0.5, 0.5, 64).astype(np.float32)
    right = -left
    inter = np.empty(128, np.float32)
    inter[0::2], inter[1::2] = left, right
    p = tmp_path / "s.wav"
    _write_pcm16(p, inter, 8000, channels=2)
    out, sr = read_wav(str(p))
    assert out.shape == (2, 64)
    q = np.round(inter * 32768).clip(-32768, 32767) / 32768.0
    np.testing.assert_allclose(out[0], q[0::2], atol=1.0 / 32768)
    np.testing.assert_allclose(out[1], q[1::2], atol=1.0 / 32768)


def test_read_float32_wav(tmp_path):
    data = np.sin(np.linspace(0, 20, 500)).astype(np.float32)
    hdr = struct.pack("<4sI4s", b"RIFF", 36 + data.nbytes, b"WAVE")
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 3, 1, 22050, 22050 * 4, 4, 32)
    dat = struct.pack("<4sI", b"data", data.nbytes) + data.tobytes()
    p = tmp_path / "f.wav"
    p.write_bytes(hdr + fmt + dat)
    out, sr = read_wav(str(p))
    assert sr == 22050
    np.testing.assert_array_equal(out[0], data)


def test_read_reference_assets():
    """Bundled wavs: 44.1 kHz mono with known lengths (SURVEY.md section 2.1)."""
    a1, sr1 = read_wav(REF_WAV1)
    a2, sr2 = read_wav(REF_WAV2)
    assert sr1 == sr2 == 44100
    assert a1.shape == (1, 403604)
    assert a2.shape == (1, 445940)
    assert np.abs(a1).max() <= 1.0 and np.abs(a2).max() <= 1.0


def test_resample_length_contract():
    """torchaudio contract: output length == ceil(new * T / orig)."""
    for T in (44100, 403604, 12345):
        out = resample(np.zeros(T, np.float32), 44100, 32000)
        assert out.shape[0] == math.ceil(32000 * T / 44100)


def test_resample_tone_fidelity():
    """A 1 kHz tone at 44.1k must stay a 1 kHz tone at 32k."""
    sr_in, sr_out, f0 = 44100, 32000, 1000.0
    t_in = np.arange(sr_in, dtype=np.float64) / sr_in
    x = np.sin(2 * np.pi * f0 * t_in).astype(np.float32)
    y = resample(x, sr_in, sr_out)
    t_out = np.arange(len(y), dtype=np.float64) / sr_out
    ref = np.sin(2 * np.pi * f0 * t_out)
    # ignore filter-width edges
    w = 200
    err = np.abs(y[w:-w] - ref[w:-w])
    assert err.max() < 5e-3, err.max()


def test_resample_dc_gain():
    x = np.ones(32000, np.float32) * 0.7
    y = resample(x, 44100, 32000)
    mid = y[500:-500]
    np.testing.assert_allclose(mid, 0.7, atol=2e-3)


def test_resample_noop_same_rate():
    x = np.random.RandomState(0).randn(100).astype(np.float32)
    assert resample(x, 32000, 32000) is x


@pytest.mark.parametrize(
    "orig,new", [(44100, 32000), (48000, 32000), (22050, 32000), (32000, 16000)]
)
def test_resample_matches_torch_conv_oracle(orig, new):
    """torchaudio's algorithm realized as a torch strided conv1d
    (tests/oracles/torch_resample.py) — a structurally different
    implementation; agreement pins the filter design + polyphase indexing.
    (Real torchaudio golden vectors remain uncapturable offline; this is
    the strongest available cross-check.)"""
    import torch

    rng = np.random.RandomState(7)
    x = (rng.randn(3001) * 0.4).astype(np.float32)
    ours = resample(x, orig, new)
    ref = resample_oracle(torch.from_numpy(x), orig, new).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-6)

    # and on real audio, through the reference asset
    wav = read_wav(REF_WAV1)[0][0][:50000]
    ours = resample(wav, orig, new)
    ref = resample_oracle(torch.from_numpy(wav), orig, new).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_resample_matches_torchaudio_golden():
    """TRUE torchaudio golden vectors, captured one-time on a networked
    machine per docs/OFFLINE_GAPS.md item 2 (this environment cannot
    install torchaudio). Skips until tests/golden/torchaudio_resample.npz
    exists; once captured, this discharges the common-mode-error risk the
    conv1d oracle above carries (reference mellow/wrapper.py:146-148)."""
    import os

    path = os.path.join(
        os.path.dirname(__file__), "golden", "torchaudio_resample.npz"
    )
    if not os.path.exists(path):
        pytest.skip("golden vectors not captured yet (docs/OFFLINE_GAPS.md)")
    data = np.load(path)
    sr_in = int(data["sr_in"]) if "sr_in" in data else 44100
    sr_out = int(data["sr_out"]) if "sr_out" in data else 32000
    for row_x, row_y in zip(data["x"], data["y"]):
        ours = resample(row_x.astype(np.float32), sr_in, sr_out)
        np.testing.assert_allclose(ours, row_y, atol=1e-5)
