"""Vector-quantization core ops (reference: src/model/components/vector_quantizer.py:23-54).

Functional JAX implementation of Sonnet-style VQ: L2 nearest-codebook lookup,
straight-through estimator, codebook ("embedding") and commitment losses, and
code-usage perplexity. The reference's one-hot scatter + matmul is replaced by
an equivalent argmin + gather — exact same result, but the gather avoids
materializing the (N, K) one-hot and its gradient is the same scatter-add XLA
emits for the one-hot matmul.

A fused Pallas kernel for the distance+argmin lookup lives in
msla_tpu.ops.vq_pallas; `nearest_codes` dispatches to it on TPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from typing import NamedTuple


class VQResult(NamedTuple):
    quantized_ste: jax.Array      # inputs + sg(quantized - inputs), same shape as inputs
    quantized: jax.Array          # raw codebook rows (grads flow to the codebook)
    embedding_loss: jax.Array     # mse(quantized, sg(inputs)) — reference's (swapped) name
    commitment_loss: jax.Array    # beta * mse(sg(quantized), inputs)
    perplexity: jax.Array         # exp(entropy of code usage)
    encoding_indices: jax.Array   # (..., ) int32 code ids


def nearest_codes(flat_x: jax.Array, codebook: jax.Array, *, use_pallas: bool | None = None) -> jax.Array:
    """Index of the L2-nearest codebook row for each input row.

    distances = |x|^2 + |e|^2 - 2 x·e  (reference: vector_quantizer.py:32-33);
    the |x|^2 term is constant per row and dropped — it cannot change the argmin.
    """
    if use_pallas is None:
        # XLA's fusion of dot+argmin measures faster than the hand-written
        # kernel on v5e (see ops/vq_pallas.py docstring) — default to it;
        # pass use_pallas=True to select the Pallas kernel explicitly.
        use_pallas = False
    if use_pallas:
        try:
            from msla_tpu.ops.vq_pallas import nearest_codes_pallas

            return nearest_codes_pallas(flat_x, codebook)
        except Exception:  # pragma: no cover - fall back if kernel unsupported
            pass
    dots = jax.lax.dot_general(
        flat_x, codebook,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dist = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=-1) - 2.0 * dots
    return jnp.argmin(dist, axis=-1).astype(jnp.int32)


def code_usage_perplexity(indices: jax.Array, num_embedding: int) -> jax.Array:
    """exp(-Σ p log(p + 1e-10)) over the empirical code distribution
    (reference: vector_quantizer.py:49-50)."""
    counts = jnp.zeros((num_embedding,), jnp.float32).at[indices.reshape(-1)].add(1.0)
    avg_probs = counts / indices.size
    return jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))


def _vector_quantize_jnp(x: jax.Array, codebook: jax.Array,
                         commitment_cost: float) -> VQResult:
    input_shape = x.shape
    flat = x.reshape(-1, input_shape[-1])
    indices = nearest_codes(flat, codebook, use_pallas=False)
    quantized = jnp.take(codebook, indices, axis=0).reshape(input_shape)

    commitment_loss = commitment_cost * jnp.mean(
        (jax.lax.stop_gradient(quantized) - x) ** 2)
    embedding_loss = jnp.mean((quantized - jax.lax.stop_gradient(x)) ** 2)

    quantized_ste = x + jax.lax.stop_gradient(quantized - x)
    perplexity = code_usage_perplexity(indices, codebook.shape[0])
    return VQResult(quantized_ste, quantized, embedding_loss, commitment_loss,
                    perplexity, indices.reshape(input_shape[:-1]))


@jax.custom_vjp
def _vector_quantize_fused_raw(x: jax.Array, codebook: jax.Array) -> VQResult:
    """Fused VQ with UNSCALED commitment loss (== embedding loss in value).

    The β (commitment_cost) scaling happens OUTSIDE the custom_vjp — β may be
    a traced scalar (vector_quantize is itself jitted), and custom_vjp
    nondiff_argnums cannot carry tracers; scaling the returned loss lets
    autodiff fold β into the commitment cotangent instead.
    """
    out, _ = _vq_fused_fwd(x, codebook)
    return out


def _vq_fused_fwd(x, codebook):
    from msla_tpu.ops.vq_fused import vq_fused_fwd_pallas

    input_shape = x.shape
    flat = x.reshape(-1, input_shape[-1]).astype(jnp.float32)
    q_flat, idx, counts, sq = vq_fused_fwd_pallas(flat, codebook)
    mse = sq / flat.size  # embedding/commitment are VALUE-equal ‖q−x‖²/N·D
    probs = counts / flat.shape[0]
    perplexity = jnp.exp(-jnp.sum(probs * jnp.log(probs + 1e-10)))
    q = q_flat.reshape(input_shape)
    out = VQResult(q, q, mse, mse, perplexity, idx.reshape(input_shape[:-1]))
    return out, (flat, q_flat, idx, codebook)


def _vq_fused_bwd(res, g: VQResult):
    from msla_tpu.ops.vq_fused import vq_codebook_grad_pallas

    flat, q_flat, idx, codebook = res
    coef = 2.0 / flat.size
    g_ste = g.quantized_ste.reshape(flat.shape)
    g_q = g.quantized.reshape(flat.shape)
    # dx: STE identity + commitment 2/(N·D)·(x−q) — β already folded into the
    # commitment cotangent by the external scaling; embedding sg's x out
    dx = g_ste + (coef * g.commitment_loss) * (flat - q_flat)
    # dcb: gather-transpose of (quantized cotangent + embedding term), as an
    # in-VMEM one-hotᵀ@g matmul instead of XLA's serialized scatter
    g_eff = g_q + (coef * g.embedding_loss) * (q_flat - flat)
    dcb = vq_codebook_grad_pallas(g_eff, idx, int(codebook.shape[0]))
    return dx.reshape(g.quantized_ste.shape), dcb.astype(codebook.dtype)


_vector_quantize_fused_raw.defvjp(_vq_fused_fwd, _vq_fused_bwd)


def _vector_quantize_fused(x: jax.Array, codebook: jax.Array,
                           commitment_cost) -> VQResult:
    out = _vector_quantize_fused_raw(x, codebook)
    return out._replace(commitment_loss=commitment_cost * out.commitment_loss)


@partial(jax.jit, static_argnames=("use_pallas",))
def vector_quantize(x: jax.Array, codebook: jax.Array, commitment_cost: float,
                    use_pallas: bool | None = None) -> VQResult:
    """Quantize (..., D) activations against a (K, D) codebook.

    Loss names follow the reference verbatim (reference quirk: the formulas
    are conventional but the names are swapped vs. VQ-VAE literature —
    SURVEY.md §2 quirk 3). Metric-name parity requires keeping them.

    use_pallas: None → the fully-fused Pallas path on TPU (ops/vq_fused.py —
    the perplexity histogram and codebook gradient become in-VMEM
    accumulations instead of XLA scatters), jnp elsewhere; True/False force.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas:
        return _vector_quantize_fused(x, codebook, commitment_cost)
    return _vector_quantize_jnp(x, codebook, commitment_cost)


def one_hot_encodings(indices: jax.Array, num_embedding: int) -> jax.Array:
    """(N, K) one-hot matrix as the reference's `encodings` return
    (reference: vector_quantizer.py:38-39)."""
    return jax.nn.one_hot(indices.reshape(-1), num_embedding, dtype=jnp.float32)
