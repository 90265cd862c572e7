"""Perceptual loss (reference: src/model/components/perceptual_loss.py:12-39).

MSE between VGG16 feature maps of mel spectrograms (n_fft=400, hop=160,
n_mels=64), the spectrogram replicated to 3 channels. NOTE: like the
reference (where this module is instantiated nowhere — SURVEY.md §2 #18),
this is an optional capability, not part of any default training loss. It is
fully functional here: plug it into a task's loss via the `perceptual_weight`
hook if desired.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from msla_tpu.nn.vgg import VGG16Features
from msla_tpu.ops.stft import mel_spectrogram


class PerceptualLoss:
    def __init__(self, sample_rate: int, params: dict | None = None,
                 rng: jax.Array | None = None):
        self.sample_rate = int(sample_rate)
        self.net = VGG16Features()
        if params is None:
            # random features still induce a useful perceptual metric; for
            # torchvision-pretrained weights run tools/convert_vgg16.py
            dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
            if rng is None:
                rng = jax.random.PRNGKey(0)
            params = self.net.init(rng, dummy)["params"]
        self.params = jax.tree_util.tree_map(jax.lax.stop_gradient, params)

    def _features(self, waveform: jax.Array) -> jax.Array:
        mel = mel_spectrogram(waveform, sample_rate=self.sample_rate,
                              n_fft=400, hop_length=160, n_mels=64)  # (..., 64, T')
        img = mel[..., None].repeat(3, axis=-1)  # replicate to 3 channels (NHWC)
        if img.ndim == 3:
            img = img[None]
        return self.net.apply({"params": self.params}, img)

    def __call__(self, x: jax.Array, target: jax.Array) -> jax.Array:
        """MSE over VGG16 features of both mel spectrograms (no_grad in the
        reference — gradients are stopped through the feature net params)."""
        fx = self._features(x)
        ft = self._features(target)
        return jnp.mean((fx - ft) ** 2)
