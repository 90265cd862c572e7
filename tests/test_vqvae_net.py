"""Integration tests for the VQVAENet (shapes, losses, quantize/decode paths)."""
import jax
import jax.numpy as jnp
import numpy as np

from msla_tpu.nn.vqvae_net import VQVAENet


def make_net():
    return VQVAENet(num_hidden=32, num_residual_layer=2, num_residual_hidden=8,
                    num_embedding=16, embedding_dim=8, commitment_cost=0.25,
                    use_pallas=False)


def test_forward_shapes_and_losses():
    net = make_net()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 256)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.output.shape == (2, 4, 256)
    assert np.isfinite(float(out.embedding_loss))
    assert np.isfinite(float(out.commitment_loss))
    assert 1.0 <= float(out.perplexity) <= 16.0


def test_get_quantized_layout_and_decode_roundtrip():
    net = make_net()
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 4, 256)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)

    q = net.apply(params, x, method=VQVAENet.get_quantized)
    assert q.quantized.shape == (2, 8, 64)       # (B, embedding_dim, T/4) BCW parity
    assert q.encoding_indices.shape == (2, 64)   # (B, W)
    assert q.encoding_indices.dtype == jnp.int32

    # decode(quantized) == full forward's decoder output
    full = net.apply(params, x)
    dec = net.apply(params, q.quantized, method=VQVAENet.decode)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(full.output), rtol=1e-5, atol=1e-6)

    # decode_indices(ids) == decode(codebook[ids]) — the generation path
    dec_idx = net.apply(params, q.encoding_indices, method=VQVAENet.decode_indices)
    np.testing.assert_allclose(np.asarray(dec_idx), np.asarray(dec), rtol=1e-5, atol=1e-6)


def test_train_step_gradients_flow():
    net = make_net()
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 4, 256)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)

    def loss_fn(params):
        out = net.apply({"params": params}, x)
        recon = jnp.mean(jnp.abs(out.output - x))
        return out.embedding_loss + out.commitment_loss + recon

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # encoder, decoder AND codebook all receive gradient
    assert float(jnp.abs(grads["vector_quantizer"]["codebook"]).sum()) > 0
    assert float(jnp.abs(grads["encoder"]["conv1"]["conv"]["kernel"]).sum()) > 0
    assert float(jnp.abs(grads["decoder"]["conv2_transpose"]["conv"]["kernel"]).sum()) > 0
