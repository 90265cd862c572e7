"""VGG16 feature extractor (torchvision layout) in flax.

Backs the PerceptualLoss capability (reference:
src/model/components/perceptual_loss.py:12-39 — dead code in the reference's
training path, but part of its component surface). Weight layout matches
torchvision's ``vgg16().features`` so pretrained weights can be converted
offline (utils.torch_compat.vgg16_params_from_torch); without them the module
runs randomly initialized.
"""
from __future__ import annotations

import jax

from flax import linen as nn

from msla_tpu.nn.layers import torch_bias_init, torch_kernel_init

# torchvision vgg16.features: conv channel plan, 'M' = 2x2 maxpool
VGG16_PLAN = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M")


class VGG16Features(nn.Module):
    """NHWC feature stack equivalent to torchvision vgg16().features."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        conv_idx = 0
        for spec in VGG16_PLAN:
            if spec == "M":
                x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
                continue
            x = nn.Conv(int(spec), kernel_size=(3, 3), padding=[(1, 1), (1, 1)],
                        kernel_init=torch_kernel_init,
                        bias_init=torch_bias_init(x.shape[-1] * 9),
                        name=f"conv{conv_idx}")(x)
            x = jax.nn.relu(x)
            conv_idx += 1
        return x
