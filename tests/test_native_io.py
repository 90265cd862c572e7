"""C++ native IO parity vs the numpy reference implementations."""
import numpy as np
import pytest

from msla_tpu.data import native
from msla_tpu.data.resample import resample as np_resample
from msla_tpu.data.wavio import read_wav as np_read_wav, write_wav

lib = native.get_lib()
pytestmark = pytest.mark.skipif(lib is None, reason="native toolchain unavailable")


def test_native_wav_decode_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.9, 0.9, (2, 5000)).astype(np.float32)
    write_wav(tmp_path / "a.wav", x, 22000)
    a, sr_a = native.read_wav(tmp_path / "a.wav")
    b, sr_b = np_read_wav(tmp_path / "a.wav")
    assert sr_a == sr_b == 22000
    np.testing.assert_array_equal(a, b)

    write_wav(tmp_path / "f.wav", x, 8000, dtype="float32")
    a2, _ = native.read_wav(tmp_path / "f.wav")
    np.testing.assert_array_equal(a2, x)


def test_native_resample_matches_scipy():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(44100).astype(np.float32)
    got = native.resample(x, 44100, 22000)
    want = np_resample(x, 44100, 22000)
    assert got.shape == want.shape
    # same filter family (kaiser 5.0 windowed sinc, half_len 10*max_rate)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_native_resample_tone_preserved():
    sr_in, sr_out, f0 = 44100, 22000, 440.0
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    y = native.resample(x, sr_in, sr_out)
    spec = np.abs(np.fft.rfft(y))
    peak_hz = np.argmax(spec) * sr_out / y.shape[-1]
    assert abs(peak_hz - f0) < 2.0


def test_native_frame_index_matches_python():
    rng = np.random.default_rng(2)
    sr, dur = 1000, 2
    stems = rng.standard_normal((4, 10 * sr)).astype(np.float32) + 0.01
    stems[:, 3 * sr: 5 * sr] = 0.0  # a silent window
    got = native.frame_index(stems, sr, dur * sr, max_duration=20)
    want = []
    for sub in range(20):
        start, end = sub * sr, sub * sr + dur * sr
        if end > stems.shape[1]:
            continue
        if int(stems[:, start:end].sum()) == 0:
            continue
        want.append(start)
    np.testing.assert_array_equal(got, np.asarray(want))
