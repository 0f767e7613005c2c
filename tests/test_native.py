"""Native (C++) audio runtime vs the pure-Python reference implementations.
The Python paths in mellow_tpu/io are the correctness oracle; the native lib
must agree bit-for-bit on decode and to fp32 rounding on resample."""

import numpy as np
import pytest

from mellow_tpu.io.resample import resample as py_resample
from mellow_tpu.io.wav import read_wav as py_read_wav
from mellow_tpu.native import binding as nb

pytestmark = pytest.mark.skipif(
    not nb.available(), reason="native lib not built and no toolchain"
)

REF1 = "/root/reference/resource/1.wav"
REF2 = "/root/reference/resource/2.wav"


def test_wav_decode_bit_exact():
    for path in (REF1, REF2):
        a_n, sr_n = nb.read_wav(path)
        a_p, sr_p = py_read_wav(path)
        assert sr_n == sr_p
        np.testing.assert_array_equal(a_n, a_p)


def test_resample_matches_python():
    x = py_read_wav(REF1)[0].reshape(-1)
    r_n = nb.resample(x, 44100, 32000)
    r_p = py_resample(x, 44100, 32000)
    assert r_n.shape == r_p.shape
    np.testing.assert_allclose(r_n, r_p, atol=1e-6)


def test_load_segment_repeat_pad():
    seg, full_len, needs_crop = nb.load_segment(REF1, 32000, 320000)
    assert not needs_crop
    assert full_len == 292865  # ceil(32000 * 403604 / 44100)
    # tile-repeat semantics (reference wrapper.py:154-160)
    np.testing.assert_array_equal(seg[full_len:], seg[: 320000 - full_len])


def test_load_segment_crop():
    seg0, full_len, needs = nb.load_segment(REF2, 32000, 320000, crop_start=-1)
    assert needs and full_len > 320000
    seg, _, n2 = nb.load_segment(REF2, 32000, 320000, crop_start=17)
    assert not n2
    ref = nb.resample(py_read_wav(REF2)[0].reshape(-1), 44100, 32000)
    np.testing.assert_allclose(seg, ref[17 : 17 + 320000], atol=1e-6)


def test_load_segment_stereo_per_channel_resample(tmp_path):
    """Multi-channel semantics: resample EACH channel, THEN concat
    (reference wrapper.py:146-149 order). Guards against resampling the
    channel concatenation, which smears the filter across the seam."""
    import wave as stdwave

    sr_in, sr_out, T = 44100, 32000, 44100  # 1 s stereo
    t = np.arange(T) / sr_in
    left = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    right = (0.25 * np.sin(2 * np.pi * 660 * t + 0.3)).astype(np.float32)
    inter = np.empty(2 * T, np.float32)
    inter[0::2], inter[1::2] = left, right
    ints = np.clip(inter * 32768.0, -32768, 32767).astype("<i2")
    p = tmp_path / "stereo.wav"
    with stdwave.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr_in)
        w.writeframes(ints.tobytes())

    data, sr = py_read_wav(str(p))
    assert sr == sr_in and data.shape == (2, T)
    expect = np.concatenate(
        [py_resample(data[0], sr_in, sr_out), py_resample(data[1], sr_in, sr_out)]
    )

    seg, full_len, needs_crop = nb.load_segment(str(p), sr_out, 70000)
    assert not needs_crop  # 2 ch x 32000 = 64000 <= 70000 -> repeat-pad
    assert full_len == expect.shape[0] == 2 * 32000
    np.testing.assert_allclose(seg[:64000], expect, atol=1e-6)

    # short segment inside the flattened signal at a pinned crop
    seg, _, rc = nb.load_segment(str(p), sr_out, 1000, crop_start=31500)
    assert not rc
    # window straddles the channel seam: only per-channel resample matches
    np.testing.assert_allclose(seg, expect[31500:32500], atol=1e-6)


def test_wrapper_paths_agree():
    """Wrapper with native on vs off must produce near-identical segments."""
    import jax

    from mellow_tpu.io.tokenizer import ByteTokenizer
    from mellow_tpu.models import mellow as jm
    from mellow_tpu.wrapper import MellowWrapper
    from tests.test_wrapper import SMALL

    params = jm.init_params(jax.random.PRNGKey(0), SMALL)
    w_native = MellowWrapper("test_small", "v0", 0, params=params,
                             tokenizer=ByteTokenizer(), use_native_audio=True)
    w_py = MellowWrapper("test_small", "v0", 0, params=params,
                         tokenizer=ByteTokenizer(), use_native_audio=False)
    a = w_native.load_audio_into_array(REF1, 10)
    b = w_py.load_audio_into_array(REF1, 10)
    np.testing.assert_allclose(a, b, atol=1e-6)
    c = w_native.load_audio_into_array(REF2, 10, crop_start=1234)
    d = w_py.load_audio_into_array(REF2, 10, crop_start=1234)
    np.testing.assert_allclose(c, d, atol=1e-6)
