"""Audio metrics (reference: torchmetrics SI-SDR + torch.nn.functional l1/mse,
as used in src/model/vqvae.py:95-166, transformer.py:84-141, bert.py:107-167).

Pure jnp implementations, verified against torchmetrics' definitions in
tests/test_metrics.py.
"""
from __future__ import annotations

import jax.numpy as jnp


def l1_loss(preds: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(preds - target))


def mse_loss(preds: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((preds - target) ** 2)


def si_sdr(preds: jnp.ndarray, target: jnp.ndarray, zero_mean: bool = False) -> jnp.ndarray:
    """Scale-invariant signal-to-distortion ratio, per example over the last axis.

    Matches torchmetrics.functional.audio.scale_invariant_signal_distortion_ratio
    (default zero_mean=False), including its eps regularization.
    """
    eps = jnp.finfo(preds.dtype).eps
    if zero_mean:
        preds = preds - jnp.mean(preds, axis=-1, keepdims=True)
        target = target - jnp.mean(target, axis=-1, keepdims=True)
    alpha = (jnp.sum(preds * target, axis=-1, keepdims=True) + eps) / (
        jnp.sum(target ** 2, axis=-1, keepdims=True) + eps)
    target_scaled = alpha * target
    noise = target_scaled - preds
    val = (jnp.sum(target_scaled ** 2, axis=-1) + eps) / (jnp.sum(noise ** 2, axis=-1) + eps)
    return 10.0 * jnp.log10(val)


def si_sdr_mean(preds: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Batch mean SI-SDR — the reference always logs `.mean()`."""
    return jnp.mean(si_sdr(preds, target))
