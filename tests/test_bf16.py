"""bf16 compute-dtype path: numerics stay close to fp32, params stay fp32."""
import jax
import jax.numpy as jnp
import numpy as np

from msla_tpu.nn.vqvae_net import VQVAENet


def test_bf16_compute_close_to_fp32():
    kwargs = dict(num_hidden=32, num_residual_layer=1, num_residual_hidden=16,
                  num_embedding=32, embedding_dim=16, commitment_cost=0.25,
                  use_pallas=False)
    net32 = VQVAENet(**kwargs)
    net16 = VQVAENet(**kwargs, compute_dtype="bfloat16")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 1024)) * 0.3,
                    jnp.float32)
    params = net32.init(jax.random.PRNGKey(0), x)["params"]

    out32 = net32.apply({"params": params}, x)
    out16 = net16.apply({"params": params}, x)  # same fp32 params

    # params untouched, outputs fp32, values within bf16 error accumulation
    assert out16.output.dtype == jnp.float32
    err = np.abs(np.asarray(out16.output) - np.asarray(out32.output))
    scale = np.abs(np.asarray(out32.output)).max()
    assert err.max() <= 0.08 * max(scale, 1e-3), f"bf16 drift too large: {err.max()}"
    # VQ indices computed in fp32 latents: overwhelmingly identical
    q32 = net32.apply({"params": params}, x, method=VQVAENet.get_quantized)
    q16 = net16.apply({"params": params}, x, method=VQVAENet.get_quantized)
    agreement = (np.asarray(q32.encoding_indices) == np.asarray(q16.encoding_indices)).mean()
    assert agreement > 0.95
