"""Spectrogram masking augmentation, batched on-device
(reference: src/data/dataset.py:42-49).

Reference pipeline per item on the CPU:
Spectrogram(power=2) → TimeMasking(20, iid) → FrequencyMasking(80, iid)
→ ToComplex → InverseSpectrogram.

Here the whole chain runs inside the jitted train step on the full batch.
Faithful details:
* the spectrogram is a POWER spectrum; ToComplex casts it to complex with
  zero phase, so the istft round-trip is deliberately lossy — that's the
  reference's committed behavior;
* masks are drawn like torchaudio.functional.mask_along_axis: width
  ~ U[0, param), start ~ U[0, size - width), one mask shared across the 4
  stems of an item (3-D input → single mask), different masks per batch item.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from msla_tpu.ops.stft import istft, stft

TIME_MASK_PARAM = 20
FREQ_MASK_PARAM = 80


def _axis_mask(rng: jax.Array, batch: int, size: int, mask_param: int) -> jnp.ndarray:
    """(B, size) boolean keep-mask with one random zero-span per item."""
    r_width, r_start = jax.random.split(rng)
    width = jnp.floor(jax.random.uniform(r_width, (batch,)) * mask_param)
    start = jnp.floor(jax.random.uniform(r_start, (batch,)) * (size - width))
    pos = jnp.arange(size)[None, :]
    return ~((pos >= start[:, None]) & (pos < (start + width)[:, None]))


@partial(jax.jit, static_argnames=("time_mask_param", "freq_mask_param"))
def masking_augment(batch: jax.Array, rng: jax.Array,
                    time_mask_param: int = TIME_MASK_PARAM,
                    freq_mask_param: int = FREQ_MASK_PARAM) -> jax.Array:
    """(B, 4, T) stems → masked lossy-reconstructed stems, same shape."""
    b, c, t = batch.shape
    spec = jnp.abs(stft(batch)) ** 2.0  # (B, 4, F, frames)
    f_bins, n_frames = spec.shape[-2], spec.shape[-1]

    r_time, r_freq = jax.random.split(rng)
    time_keep = _axis_mask(r_time, b, n_frames, time_mask_param)   # (B, frames)
    freq_keep = _axis_mask(r_freq, b, f_bins, freq_mask_param)     # (B, F)
    spec = spec * time_keep[:, None, None, :] * freq_keep[:, None, :, None]

    out = istft(spec.astype(jnp.complex64), length=t)
    return out.astype(batch.dtype)
