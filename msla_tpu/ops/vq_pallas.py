"""Fused Pallas TPU kernel for nearest-codebook lookup.

The VQ hot op (reference math: src/model/components/vector_quantizer.py:32-37)
computes, for every latent position, the L2-nearest of K codebook rows. At
reference scale each train step quantizes N = B·W = 64·11000 = 704k positions
against a 512×64 codebook: the naive jnp path materializes an (N, K) distance
matrix (~1.4 GB) in HBM before the argmin. This kernel tiles N, keeps each
(TILE_N, K) distance block in VMEM, and writes only the int32 indices back —
the distance matrix never touches HBM, and the dot product runs on the MXU.

The surrounding ``vector_quantize`` (msla_tpu.ops.vq) uses the kernel for the
lookup only; quantized values come from a differentiable gather outside so
codebook gradients (embedding loss) flow normally.

Measured on v5e-1 at reference scale (N=704k, K=512, D=64): this kernel runs
1.2 ms of MXU work + ~9 µs/tile of cross-lane argmin on the VPU → 6.1 ms
total; XLA's own fusion of the jnp dot+argmin achieves 1.54 ms (the distance
matrix provably never reaches HBM — 1.4 GB in 1.54 ms would exceed chip
bandwidth 2×). The jnp path is therefore the production default
(msla_tpu.ops.vq.nearest_codes); this kernel stays as the hand-scheduled
alternative (use_pallas=True) and the target for future argmin-layout work
(a sublane-major variant fails Mosaic shape-cast inference; switching the
argmin to min + masked-iota-min already cut the kernel to 3.2 ms).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid step; indices are emitted as an (8, ROWS/8) int32 block so
# both output dims satisfy the TPU (8, 128) tiling rule
DEFAULT_TILE_ROWS = 2048
_OUT_SUBLANES = 8


def _nearest_codes_kernel(x_ref, cb_ref, e2_ref, idx_ref):
    x = x_ref[:]                    # (ROWS, D) fp32
    cb = cb_ref[:]                  # (K, D) fp32
    # ‖x‖² is constant per row — dropped, cannot change the argmin
    dots = jax.lax.dot_general(x, cb, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (ROWS, K) on MXU
    dist = e2_ref[:] - 2.0 * dots   # (ROWS, K), stays in VMEM
    # min + masked-iota-min lowers ~2x faster on the VPU than a plain argmin
    # while keeping argmin's first-match tie-break (iota-min over the tied set)
    m = jnp.min(dist, axis=1, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    idx = jnp.min(jnp.where(dist <= m, iota, dist.shape[1]), axis=1)
    idx_ref[:] = idx.astype(jnp.int32).reshape(idx_ref.shape)


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def nearest_codes_pallas(flat_x: jax.Array, codebook: jax.Array,
                         tile_rows: int = DEFAULT_TILE_ROWS,
                         interpret: bool = False) -> jax.Array:
    """(N, D) fp32 × (K, D) fp32 → (N,) int32 nearest-codebook indices."""
    n, d = flat_x.shape
    k = codebook.shape[0]
    if n < tile_rows:  # shrink the tile for small inputs (sublane-aligned)
        tile_rows = max(_OUT_SUBLANES,
                        -(-n // _OUT_SUBLANES) * _OUT_SUBLANES)
    num_tiles = pl.cdiv(n, tile_rows)
    n_pad = num_tiles * tile_rows
    lanes = tile_rows // _OUT_SUBLANES

    x = flat_x.astype(jnp.float32)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    cb = codebook.astype(jnp.float32)
    e2 = jnp.sum(cb * cb, axis=1)[None, :]  # (1, K)

    out = pl.pallas_call(
        _nearest_codes_kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((tile_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_OUT_SUBLANES, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_tiles * _OUT_SUBLANES, lanes), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * k * d,
            bytes_accessed=n_pad * d * 4 + k * d * 4 + n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, cb, e2)
    return out.reshape(-1)[:n]
