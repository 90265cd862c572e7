"""STFT/iSTFT/mel parity vs torch.stft/istft (torchaudio's underlying ops)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from msla_tpu.ops.stft import amplitude_to_db, hann_window, istft, mel_spectrogram, stft


def test_stft_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 4000)).astype(np.float32)
    want = torch.stft(torch.from_numpy(x), n_fft=400, hop_length=200,
                      window=torch.hann_window(400), center=True,
                      pad_mode="reflect", return_complex=True).numpy()
    got = np.asarray(stft(jnp.asarray(x), n_fft=400, hop_length=200))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_istft_roundtrip_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    spec_t = torch.stft(torch.from_numpy(x), n_fft=400, hop_length=200,
                        window=torch.hann_window(400), center=True,
                        pad_mode="reflect", return_complex=True)
    want = torch.istft(spec_t, n_fft=400, hop_length=200,
                       window=torch.hann_window(400), center=True).numpy()
    got = np.asarray(istft(jnp.asarray(spec_t.numpy()), n_fft=400, hop_length=200))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    # and it actually reconstructs the signal
    np.testing.assert_allclose(got, x[:, :got.shape[-1]], rtol=1e-3, atol=1e-3)


def test_istft_of_power_spectrum_runs():
    """The reference's ToComplex hack feeds a real power spectrum to istft —
    deliberately lossy but must execute (dataset.py:44-49)."""
    x = np.sin(np.linspace(0, 100, 4000)).astype(np.float32)[None]
    power = np.abs(np.asarray(stft(jnp.asarray(x)))) ** 2
    out = istft(jnp.asarray(power, np.complex64), length=4000)
    assert out.shape == (1, 4000)
    assert np.isfinite(np.asarray(out)).all()


def test_mel_spectrogram_shape_and_db():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 22000)), jnp.float32)
    mel = mel_spectrogram(x, sample_rate=22000, n_fft=400, hop_length=160, n_mels=128)
    assert mel.shape[1] == 128
    db = amplitude_to_db(mel)
    assert float(db.max()) - float(db.min()) <= 80.0 + 1e-3


def test_hann_window_matches_torch():
    np.testing.assert_allclose(np.asarray(hann_window(400)),
                               torch.hann_window(400).numpy(), atol=1e-6)
