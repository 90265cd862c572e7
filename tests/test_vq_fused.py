"""Fully-fused VQ (ops/vq_fused.py + the custom-vjp path in ops/vq.py):
interpret-mode parity with the jnp path for every VQResult field AND for the
gradients (STE, commitment→x, embedding→codebook, quantized→codebook)."""
import jax
import jax.numpy as jnp
import numpy as np

from msla_tpu.ops import vq_fused
from msla_tpu.ops.vq import _vector_quantize_fused, vector_quantize

vq_fused.INTERPRET = True  # run the Pallas kernels interpreted on CPU

BETA = 0.25


def _inputs(n=100, d=8, k=16, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((4, n // 4, d)), jnp.float32)
    cb = jnp.asarray(rng.standard_normal((k, d)), jnp.float32)
    return x, cb


def test_fused_forward_matches_jnp():
    x, cb = _inputs()
    want = vector_quantize(x, cb, BETA, use_pallas=False)
    got = _vector_quantize_fused(x, cb, BETA)
    np.testing.assert_array_equal(np.asarray(got.encoding_indices),
                                  np.asarray(want.encoding_indices))
    np.testing.assert_allclose(np.asarray(got.quantized_ste),
                               np.asarray(want.quantized_ste), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.quantized),
                               np.asarray(want.quantized), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(got.embedding_loss), float(want.embedding_loss),
                               rtol=1e-5)
    np.testing.assert_allclose(float(got.commitment_loss), float(want.commitment_loss),
                               rtol=1e-5)
    np.testing.assert_allclose(float(got.perplexity), float(want.perplexity),
                               rtol=1e-5)


def test_fused_forward_unpadded_tile_and_masking():
    """N not a multiple of the tile: padded rows must not pollute counts/loss."""
    x, cb = _inputs(n=52, d=8, k=16, seed=1)  # 52 rows, tile rounds to 56
    want = vector_quantize(x, cb, BETA, use_pallas=False)
    got = _vector_quantize_fused(x, cb, BETA)
    np.testing.assert_allclose(float(got.perplexity), float(want.perplexity),
                               rtol=1e-5)
    np.testing.assert_allclose(float(got.embedding_loss), float(want.embedding_loss),
                               rtol=1e-5)


def test_fused_gradients_match_jnp_autodiff():
    """Composite loss touching every grad path: decoder-style use of the STE
    output + both VQ losses + the raw quantized tensor."""
    x, cb = _inputs(n=64, d=8, k=16, seed=2)
    w = jnp.asarray(np.random.default_rng(3).standard_normal((8,)), jnp.float32)

    def loss(fn):
        def inner(x, cb):
            r = fn(x, cb, BETA)
            return (jnp.sum(r.quantized_ste * w) * 0.7
                    + r.embedding_loss + r.commitment_loss
                    + 0.3 * jnp.sum(r.quantized ** 2))
        return inner

    want_dx, want_dcb = jax.grad(
        loss(lambda x, cb, b: vector_quantize(x, cb, b, use_pallas=False)),
        argnums=(0, 1))(x, cb)
    got_dx, got_dcb = jax.grad(loss(_vector_quantize_fused), argnums=(0, 1))(x, cb)
    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(want_dx),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_dcb), np.asarray(want_dcb),
                               rtol=1e-5, atol=1e-6)


def test_fused_path_through_public_jit_wrapper():
    """Regression: `vector_quantize` is itself jitted, so commitment_cost
    arrives at the fused path as a TRACER — the custom_vjp must not route it
    through nondiff_argnums (that raised UnexpectedTracerError and broke the
    whole TPU training default; caught by an end-to-end CLI drive)."""
    x, cb = _inputs(n=64, d=8, k=16, seed=5)
    want = vector_quantize(x, cb, BETA, use_pallas=False)
    got = vector_quantize(x, cb, BETA, use_pallas=True)  # through the jit
    np.testing.assert_array_equal(np.asarray(got.encoding_indices),
                                  np.asarray(want.encoding_indices))
    np.testing.assert_allclose(float(got.commitment_loss),
                               float(want.commitment_loss), rtol=1e-5)

    # and under an outer jit + grad, as the Trainer uses it
    @jax.jit
    def step(x, cb):
        def inner(x, cb):
            r = vector_quantize(x, cb, BETA, use_pallas=True)
            return r.embedding_loss + r.commitment_loss
        return jax.grad(inner, argnums=(0, 1))(x, cb)

    dx, dcb = step(x, cb)
    want_dx, want_dcb = jax.grad(
        lambda x, cb: (lambda r: r.embedding_loss + r.commitment_loss)(
            vector_quantize(x, cb, BETA, use_pallas=False)), argnums=(0, 1))(x, cb)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(want_dx),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dcb), np.asarray(want_dcb),
                               rtol=1e-5, atol=1e-6)


def test_codebook_grad_kernel_matches_segment_sum():
    rng = np.random.default_rng(4)
    g = jnp.asarray(rng.standard_normal((70, 8)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 16, (70,)), jnp.int32)
    got = vq_fused.vq_codebook_grad_pallas(g, idx, 16, tile=32)
    want = jax.ops.segment_sum(g, idx, num_segments=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
