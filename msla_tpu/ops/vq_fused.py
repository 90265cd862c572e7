"""Fully-fused vector quantization: distance + argmin + one-hot-matmul
quantize + loss sum + code counts in ONE Pallas pass, with a custom VJP whose
codebook gradient is an in-VMEM matmul accumulation instead of XLA's scatter.

Why (measured on v5e-1, batch 64 × W 11000 = 704k positions, 512×64 codebook,
see PERFORMANCE.md): the jnp VQ path spends its time in two XLA *scatters* —
the code-usage histogram behind perplexity (~8.9 ms: 704k serialized
`.at[idx].add(1)` updates) and the codebook gradient of the gather (~7.1 ms)
— plus separate HBM passes for the gather and the loss reductions. This
kernel keeps each (TILE, 512) distance block in VMEM, quantizes via the
reference's own one-hot matmul (MXU), and accumulates the squared-error sum
and the per-code counts in VMEM scratch across the grid. The backward kernel
recovers the codebook gradient as `one_hotᵀ @ g` (MXU) accumulated the same
way. No scatter ever reaches HBM.

Loss values: the reference's embedding_loss = mse(q, sg·x) and
commitment_loss = β·mse(sg·q, x) (vector_quantizer.py:45-46) are VALUE-equal
(both ‖q−x‖²/N·D); only their gradients differ — handled analytically in the
custom VJP:
  dx  = g_ste + g_commit · β·2/(N·D) · (x − q)
  dcb = Σ_i 1[idx_i=k] · (g_q_i + g_emb · 2/(N·D) · (q_i − x_i))
The straight-through estimator (x + sg(q−x)) is value-equal to q, so the
kernel's quantized output serves both VQResult fields.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 2048

#: set True (before first trace) to run the kernels in interpret mode — used
#: by the CPU test suite to exercise the fused custom-vjp path end-to-end
INTERPRET = False


def _fwd_kernel(n_valid, tile, x_ref, cb_ref, e2_ref, q_ref, idx_ref,
                counts_ref, sq_ref, counts_acc, sq_acc):
    i = pl.program_id(0)
    x = x_ref[:]                              # (TILE, D) fp32
    cb = cb_ref[:]                            # (K, D) fp32
    dots = lax.dot_general(x, cb, (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32)
    dist = e2_ref[:] - 2.0 * dots             # (TILE, K); ‖x‖² dropped (argmin-inv)
    m = jnp.min(dist, axis=1, keepdims=True)
    lane = lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    idx = jnp.min(jnp.where(dist <= m, lane, dist.shape[1]), axis=1, keepdims=True)

    # padded rows (global row ≥ n_valid) must not contribute to counts/loss
    row = i * tile + lax.broadcasted_iota(jnp.int32, idx.shape, 0)
    valid = (row < n_valid).astype(jnp.float32)          # (TILE, 1)

    onehot = (lane == idx).astype(jnp.float32)           # (TILE, K) exact pick
    quantized = lax.dot_general(onehot, cb, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    q_ref[:] = quantized
    idx_ref[:] = idx

    diff = quantized - x
    sq = jnp.sum(diff * diff * valid, keepdims=True)[:1, :1]  # (1, 1)

    @pl.when(i == 0)
    def _init():
        counts_acc[:] = jnp.zeros_like(counts_acc)
        sq_acc[:] = jnp.zeros_like(sq_acc)  # Mosaic: no scalar VMEM stores

    counts_acc[:] = counts_acc[:] + jnp.sum(onehot * valid, axis=0, keepdims=True)
    sq_acc[:] = sq_acc[:] + sq

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        counts_ref[:] = counts_acc[:]
        sq_ref[:] = sq_acc[:]


def _bwd_kernel(k, g_ref, idx_ref, dcb_ref, acc):
    i = pl.program_id(0)
    lane = lax.broadcasted_iota(jnp.int32, (g_ref.shape[0], k), 1)
    onehot = (lane == idx_ref[:]).astype(jnp.float32)    # (TILE, K)
    # padded rows carry g = 0 (host zero-pads), so no masking needed here
    contrib = lax.dot_general(onehot, g_ref[:], (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (K, D)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    acc[:] = acc[:] + contrib

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        dcb_ref[:] = acc[:]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def vq_fused_fwd_pallas(flat_x: jax.Array, codebook: jax.Array,
                        tile: int = DEFAULT_TILE, interpret: bool | None = None):
    """(N, D) × (K, D) → quantized (N, D) f32, idx (N, 1) i32, counts (K,) f32,
    sq_sum () f32 (Σ‖q−x‖² over valid rows)."""
    if interpret is None:
        interpret = INTERPRET
    n, d = flat_x.shape
    k = codebook.shape[0]
    if n < tile:
        tile = max(8, -(-n // 8) * 8)
    n_tiles = pl.cdiv(n, tile)
    n_pad = n_tiles * tile
    x = flat_x.astype(jnp.float32)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    cb = codebook.astype(jnp.float32)
    e2 = jnp.sum(cb * cb, axis=1)[None, :]

    q, idx, counts, sq = pl.pallas_call(
        functools.partial(_fwd_kernel, n, tile),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, k), jnp.float32),
                        pltpu.VMEM((1, 1), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * k * d, transcendentals=0,
            bytes_accessed=(2 * n_pad * d + k * d + n_pad) * 4),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x, cb, e2)
    return q[:n], idx[:n, 0], counts[0], sq[0, 0]


@functools.partial(jax.jit, static_argnames=("k", "tile", "interpret"))
def vq_codebook_grad_pallas(g_eff: jax.Array, idx: jax.Array, k: int,
                            tile: int = DEFAULT_TILE, interpret: bool | None = None):
    """Σ_i onehot(idx_i)ᵀ · g_eff_i as an in-VMEM matmul accumulation —
    the scatter-add XLA would emit for the gather's transpose, MXU-ified."""
    if interpret is None:
        interpret = INTERPRET
    n, d = g_eff.shape
    if n < tile:
        tile = max(8, -(-n // 8) * 8)
    n_tiles = pl.cdiv(n, tile)
    n_pad = n_tiles * tile
    g = g_eff.astype(jnp.float32)
    idx2 = idx.reshape(n, 1)
    if n_pad != n:
        g = jnp.pad(g, ((0, n_pad - n), (0, 0)))     # zero grads: no masking
        idx2 = jnp.pad(idx2, ((0, n_pad - n), (0, 0)))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, k),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * k * d, transcendentals=0,
            bytes_accessed=(n_pad * d + n_pad + k * d) * 4),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(g, idx2)
