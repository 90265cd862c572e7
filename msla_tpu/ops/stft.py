"""STFT / inverse-STFT / mel spectrogram in jnp.

Matches torch.stft/istft and torchaudio's Spectrogram/InverseSpectrogram/
MelSpectrogram defaults used by the reference (dataset.py:44-49 masking
pipeline, plotting.py:88-93, perceptual_loss.py:23-27): hann window,
center=True with reflect padding, onesided. Verified against torch.stft in
tests/test_stft.py. Runs on-device inside jit (the reference runs these
per-item on the CPU in DataLoader workers).
"""
from __future__ import annotations


import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int) -> jnp.ndarray:
    """Periodic hann window (torch.hann_window default)."""
    n = jnp.arange(win_length)
    return 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * n / win_length))


def _frame(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(..., T) → (..., frames, n_fft) with static shapes.

    For the 50%-overlap case (hop*2 == n_fft, the torch default) framing is
    two reshaped views concatenated — no gather, so XLA emits pure layout
    ops. General hops fall back to an index gather.
    """
    t = x.shape[-1]
    n_frames = 1 + (t - n_fft) // hop
    if hop * 2 == n_fft and t % hop == 0:
        seg = x.reshape(x.shape[:-1] + (t // hop, hop))       # (..., S, hop)
        return jnp.concatenate([seg[..., :-1, :], seg[..., 1:, :]], axis=-1)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[..., idx]


def stft(x: jnp.ndarray, n_fft: int = 400, hop_length: int | None = None,
         win_length: int | None = None, center: bool = True,
         window: jnp.ndarray | None = None) -> jnp.ndarray:
    """Complex STFT, (..., T) → (..., F, frames), F = n_fft//2 + 1."""
    win_length = win_length or n_fft
    hop_length = hop_length or win_length // 2
    if window is None:
        window = hann_window(win_length)
    if win_length < n_fft:  # torch pads the window symmetrically to n_fft
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = _frame(x, n_fft, hop_length) * window
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.swapaxes(spec, -1, -2)


def spectrogram(x: jnp.ndarray, n_fft: int = 400, hop_length: int | None = None,
                power: float = 2.0) -> jnp.ndarray:
    """torchaudio.transforms.Spectrogram default surface (power spectrum)."""
    spec = stft(x, n_fft=n_fft, hop_length=hop_length)
    if power is None:
        return spec
    return jnp.abs(spec) ** power


def istft(spec: jnp.ndarray, n_fft: int = 400, hop_length: int | None = None,
          win_length: int | None = None, center: bool = True,
          length: int | None = None) -> jnp.ndarray:
    """Inverse STFT with hann-window overlap-add, (..., F, frames) → (..., T).

    Output length defaults to (frames - 1) * hop (torch.istft, center=True).
    """
    win_length = win_length or n_fft
    hop_length = hop_length or win_length // 2
    window = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))

    spec = jnp.swapaxes(spec, -1, -2)  # (..., frames, F)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window  # (..., frames, n_fft)

    n_frames = frames.shape[-2]
    total = n_fft + hop_length * (n_frames - 1)
    lead_shape = frames.shape[:-2]

    if hop_length * 2 == n_fft:
        # 50%-overlap fast path: OLA = shifted halves added — no scatter.
        # out segment k = frames[k][:hop] + frames[k-1][hop:]
        first = frames[..., :, :hop_length]
        second = frames[..., :, hop_length:]
        zeros = jnp.zeros(lead_shape + (1, hop_length), frames.dtype)
        segs = (jnp.concatenate([first, zeros], axis=-2)
                + jnp.concatenate([zeros, second], axis=-2))  # (..., S+1, hop)
        out = segs.reshape(lead_shape + (total,))

        w2 = (window ** 2).reshape(2, hop_length)
        wseg = jnp.concatenate([w2[:1], jnp.broadcast_to(w2.sum(0), (n_frames - 1, hop_length)),
                                w2[1:]], axis=0)
        wsq = wseg.reshape(-1)
    else:
        # general hop: scatter-add overlap-add
        idx = (np.arange(n_frames)[:, None] * hop_length
               + np.arange(n_fft)[None, :]).reshape(-1)
        flat = frames.reshape(lead_shape + (-1,))
        out = jnp.zeros(lead_shape + (total,), frames.dtype).at[..., idx].add(flat)
        wsq = jnp.zeros((total,), window.dtype).at[idx].add(
            jnp.broadcast_to(window ** 2, (n_frames, n_fft)).reshape(-1))
    out = out / jnp.where(wsq > 1e-11, wsq, 1.0)

    if center:
        pad = n_fft // 2
        out = out[..., pad: total - pad]
    if length is not None:
        t = out.shape[-1]
        if length > t:
            out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, length - t)])
        else:
            out = out[..., :length]
    return out


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int,
                   f_min: float = 0.0, f_max: float | None = None) -> np.ndarray:
    """(F, n_mels) triangular mel filterbank (torchaudio melscale_fbanks, htk)."""
    f_max = f_max or sample_rate / 2.0
    all_freqs = np.linspace(0, sample_rate // 2, n_fft // 2 + 1)
    m_pts = np.linspace(_hz_to_mel(np.asarray(f_min)), _hz_to_mel(np.asarray(f_max)), n_mels + 2)
    f_pts = _mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def mel_spectrogram(x: jnp.ndarray, sample_rate: int, n_fft: int = 400,
                    hop_length: int = 160, n_mels: int = 128) -> jnp.ndarray:
    """torchaudio MelSpectrogram surface (reference: plotting.py:88-93)."""
    spec = spectrogram(x, n_fft=n_fft, hop_length=hop_length, power=2.0)
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels))
    return jnp.einsum("...ft,fm->...mt", spec, fb)


def amplitude_to_db(x: jnp.ndarray, top_db: float = 80.0) -> jnp.ndarray:
    """torchaudio AmplitudeToDB (power) with top_db clamping."""
    db = 10.0 * jnp.log10(jnp.maximum(x, 1e-10))
    return jnp.maximum(db, db.max() - top_db)
