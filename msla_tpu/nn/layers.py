"""Shared layer helpers: torch-compatible initializers and conv wrappers.

All convs operate in NWC layout (batch, width, channels) — channels map to
TPU lanes, widths to sublanes, so XLA tiles the implicit matmuls onto the MXU
without relayout. The reference works in BCW (PyTorch Conv1d); model entry
points transpose once at the boundary.

Initializers replicate PyTorch Conv1d/Linear defaults (kaiming_uniform with
a=sqrt(5) → U(±1/sqrt(fan_in)), bias U(±1/sqrt(fan_in))) so fresh models start
from the same distribution family as the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.nn.initializers import variance_scaling

# limit = sqrt(3 * scale / fan_in) == 1/sqrt(fan_in)  for scale = 1/3
torch_kernel_init = variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — PyTorch's conv/linear bias default."""
    limit = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -limit, limit)

    return init


class Conv1d(nn.Module):
    """NWC 1-D convolution matching torch.nn.Conv1d(k, s, p) semantics.

    ``dtype`` sets the compute dtype (params stay fp32): bfloat16 halves the
    activation HBM traffic on TPU.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    fan_in: int | None = None  # in_channels * kernel_size, for bias init
    dtype: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = self.fan_in if self.fan_in is not None else x.shape[-1] * self.kernel_size
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            name="conv",
        )(x)


class _RawConvParams(nn.Module):
    """Declares a conv's kernel/bias without binding them to nn.Conv — used by
    fused-kernel call sites that consume the weights directly."""

    shape: tuple
    fan_in: int
    bias_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_kernel_init, self.shape)
        bias = self.param("bias", torch_bias_init(self.fan_in),
                          (self.bias_features,))
        return kernel, bias


class ConvParams(nn.Module):
    """Param-tree twin of Conv1d: produces the exact same
    `<name>/conv/{kernel,bias}` structure and initializer values, but returns
    the raw weights for fused Pallas kernels instead of applying nn.Conv."""

    shape: tuple  # (k, in, out)

    @nn.compact
    def __call__(self):
        k, cin, cout = self.shape
        return _RawConvParams(self.shape, cin * k, cout, name="conv")()


class ConvTransposeParams(nn.Module):
    """Param-tree twin of ConvTranspose1d for fused kernels: same
    `<name>/conv/{kernel,bias}` structure and initializer values; kernel in
    the transpose_kernel=True layout (k, out, in)."""

    shape: tuple  # (k, out, in)

    @nn.compact
    def __call__(self):
        k, cout, _ = self.shape
        return _RawConvParams(self.shape, cout * k, cout, name="conv")()


class ConvTranspose1d(nn.Module):
    """NWC transposed 1-D convolution matching torch.nn.ConvTranspose1d(k, s, p).

    Output width = (W - 1) * stride - 2 * padding + kernel_size. Weight
    conversion from torch is handled in msla_tpu.utils.torch_compat.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # torch fan_in on the (in, out, k) weight is out_channels * k
        fan_in = self.features * self.kernel_size
        # lax.conv_transpose pads the stride-dilated input like a forward
        # conv; torch's `padding=p` corresponds to (k - 1 - p) per side:
        # out = (W-1)*s + 1 + 2*(k-1-p) - (k-1) = (W-1)*s - 2p + k.
        pad = self.kernel_size - 1 - self.padding
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=[(pad, pad)],
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            transpose_kernel=True,
            name="conv",
        )(x)


class Linear(nn.Module):
    """Dense layer with torch.nn.Linear default init."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Dense(
            features=self.features,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(x.shape[-1]),
            name="dense",
        )(x)
