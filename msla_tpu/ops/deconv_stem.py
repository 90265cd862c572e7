"""Fused Pallas kernel for the VQ-VAE decoder stem: two k4/s2/p1
ConvTranspose1Ds (ReLU between them) in ONE pass over HBM
(reference layers: src/model/components/decoder.py:20-29).

A stride-2 transposed conv splits exactly into two phase convs:
  out[2m]   = x[m]·W[t=1] + x[m-1]·W[t=3]
  out[2m+1] = x[m]·W[t=2] + x[m+1]·W[t=0]
so both upsampling layers become unit-stride sliced matmuls, the intermediate
h (B, 2·W, C1) stays in VMEM, and the output is written 4-samples-packed
(B, W, 4·C_out) — a free row-major reshape away from (B, 4·W, C_out). The
phase/tap structure lives in host-prepared weight matrices (zero blocks
select lane groups), so the kernel has no lane-dim slicing or concatenation.

Training: `deconv_stem` is a custom_vjp — forward also emits h's phases
(host-interleaved) for the backward, which runs exact conv-transpose adjoints
via jax.linear_transpose (no forward recompute). Kernel layout follows flax
ConvTranspose(transpose_kernel=True): (k, out, in), torch (in, out, k)
transposed — see utils/torch_compat.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msla_tpu.ops.conv_stem import _pick_tile

_LEFT_PAD = 2  # q[-1], q[-2] zeros: halo for the first tile


def _deconv_kernel(save_hidden, q_ref, halo_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   out_ref, *hidden_refs):
    j = pl.program_id(1)
    z = jnp.concatenate([q_ref[0], halo_ref[0][:4]], axis=0)  # (TILE+4, C)
    tile = z.shape[0] - 4

    def mm(a, w):
        return lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    s1, s2 = z[1:tile + 2], z[2:tile + 3]      # q[m-1]/q[m] and q[m]/q[m+1]
    # first convT phases: he[m] = h[2m], ho[m] = h[2m+1] (w1_ref stacks the
    # four (C, C1) tap operands: [he·s1, he·s2, ho·s1, ho·s2])
    he = jnp.maximum(mm(s1, w1_ref[0]) + mm(s2, w1_ref[1]) + b1_ref[:], 0.0)
    ho = jnp.maximum(mm(s1, w1_ref[2]) + mm(s2, w1_ref[3]) + b1_ref[:], 0.0)

    # h has width exactly 2·W: h[-1] (first tile) and h[2W] (last tile) are
    # out of range for the second convT → zero
    row = lax.broadcasted_iota(jnp.int32, ho.shape, 0)
    ho = jnp.where((j == 0) & (row == 0), 0.0, ho)
    he = jnp.where((j == pl.num_programs(1) - 1) & (row == tile), 0.0, he)

    # packed output row [out[4m] | out[4m+1] | out[4m+2] | out[4m+3]]:
    # lane-group structure is in the zero-padded (C1, 4·C_out) weights
    dt = w2_ref.dtype
    acc = (mm(he[:-1].astype(dt), w2_ref[0]) + mm(ho[:-1].astype(dt), w2_ref[1])
           + mm(ho[1:].astype(dt), w2_ref[2]) + mm(he[1:].astype(dt), w2_ref[3]))
    out_ref[0] = (acc + b2_ref[:]).astype(out_ref.dtype)  # final layer: no relu

    if save_hidden:
        hidden_refs[0][0] = he[:-1].astype(hidden_refs[0].dtype)
        hidden_refs[1][0] = ho[1:].astype(hidden_refs[1].dtype)


def _phase_weights_1(k1):
    """(4, C1, C) transpose_kernel layout → (4, C, C1) stacked phase operands
    [he←q[m-1], he←q[m], ho←q[m], ho←q[m+1]] = taps [3, 1, 2, 0] transposed."""
    return jnp.stack([k1[3].T, k1[1].T, k1[2].T, k1[0].T])


def _phase_weights_2(k2):
    """(4, C_out, C1) → (4, C1, 4·C_out) stacked operands for rows
    [HE[l], HO[l], HO[l+1], HE[l+1]] and lane groups [4m, 4m+1, 4m+2, 4m+3]."""
    c_out, c1 = k2.shape[1], k2.shape[2]
    zero = jnp.zeros((c1, c_out), k2.dtype)
    t = lambda i: k2[i].T
    rows = [
        [t(1), t(2), t(3), zero],   # HE[l]   (= he[m])
        [t(3), zero, zero, zero],   # HO[l]   (= ho[m-1])
        [zero, t(0), t(1), t(2)],   # HO[l+1] (= ho[m])
        [zero, zero, zero, t(0)],   # HE[l+1] (= he[m+1])
    ]
    return jnp.stack([jnp.concatenate(r, axis=1) for r in rows])


@functools.partial(jax.jit,
                   static_argnames=("save_hidden", "tile_w", "interpret"))
def deconv_stem_pallas(q: jax.Array, k1: jax.Array, b1: jax.Array,
                       k2: jax.Array, b2: jax.Array, *,
                       save_hidden: bool = False, tile_w: int | None = None,
                       interpret: bool = False):
    """q (B, W, C); k1 (4, C1, C), k2 (4, C_out, C1) in flax
    ConvTranspose(transpose_kernel=True) layout. Both layers k4 s2 p1;
    ReLU after the first only. Returns out (B, 4W, C_out)[, h (B, 2W, C1)]."""
    b, w, c = q.shape
    c1, c_out = k1.shape[1], k2.shape[1]
    tile = tile_w or _pick_tile(w)
    n_tiles = w // tile
    rows = n_tiles * tile + 8
    qp = jnp.pad(q, ((0, 0), (_LEFT_PAD, rows - w - _LEFT_PAD), (0, 0)))

    w1 = _phase_weights_1(k1)
    w2 = _phase_weights_2(k2)
    b1r = b1.reshape(1, c1).astype(jnp.float32)
    b2r = jnp.tile(b2.reshape(1, c_out).astype(jnp.float32), (1, 4))

    whole = lambda shape: pl.BlockSpec(shape, lambda i, j: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, c), lambda i, j: (i, (j + 1) * (tile // 8), 0),
                     memory_space=pltpu.VMEM),
        whole(w1.shape), whole((1, c1)), whole(w2.shape), whole((1, 4 * c_out)),
    ]
    out_spec = pl.BlockSpec((1, tile, 4 * c_out), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, w, 4 * c_out), q.dtype)
    itemsize = q.dtype.itemsize
    cost = pl.CostEstimate(
        flops=2 * b * w * (4 * c * c1 + 4 * c1 * 4 * c_out),
        transcendentals=0,
        bytes_accessed=b * rows * c * itemsize + b * w * 4 * c_out * itemsize)

    if save_hidden:
        hspec = pl.BlockSpec((1, tile, c1), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
        hshape = jax.ShapeDtypeStruct((b, w, c1), q.dtype)
        out, he, ho = pl.pallas_call(
            functools.partial(_deconv_kernel, True),
            grid=(b, n_tiles), in_specs=in_specs,
            out_specs=[out_spec, hspec, hspec],
            out_shape=[out_shape, hshape, hshape],
            cost_estimate=cost, interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
        )(qp, qp, w1, b1r, w2, b2r)
        h = jnp.stack([he, ho], axis=2).reshape(b, 2 * w, c1)
        return out.reshape(b, 4 * w, c_out), h

    out = pl.pallas_call(
        functools.partial(_deconv_kernel, False),
        grid=(b, n_tiles), in_specs=in_specs, out_specs=out_spec,
        out_shape=out_shape, cost_estimate=cost, interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
    )(qp, qp, w1, b1r, w2, b2r)
    return out.reshape(b, 4 * w, c_out)


# ---- reference XLA path + custom-vjp wrapper -----------------------------------

def _convt_nwc(x, kernel):
    """lax conv_transpose matching layers.ConvTranspose1d (k4 s2 p1)."""
    return lax.conv_transpose(x, kernel, (2,), [(2, 2)],
                              dimension_numbers=("NWC", "WIO", "NWC"),
                              transpose_kernel=True)


def deconv_stem_ref(q, k1, b1, k2, b2):
    """Plain-XLA stem (the exact ops Decoder uses) — CPU path and vjp oracle."""
    h = jax.nn.relu(_convt_nwc(q, k1) + b1.astype(q.dtype))
    out = _convt_nwc(h, k2) + b2.astype(q.dtype)
    return out, h


@jax.custom_vjp
def _deconv_stem_fused(q, k1, b1, k2, b2):
    return deconv_stem_pallas(q, k1, b1, k2, b2, save_hidden=False)


def _fused_fwd(q, k1, b1, k2, b2):
    out, h = deconv_stem_pallas(q, k1, b1, k2, b2, save_hidden=True)
    return out, (q, h, k1, k2)


def _fused_bwd(res, g):
    q, h, k1, k2 = res
    g = g.astype(h.dtype)
    db2 = jnp.sum(g, axis=(0, 1), dtype=jnp.float32)
    (dh,) = jax.linear_transpose(lambda x: _convt_nwc(x, k2), h)(g)
    (dk2,) = jax.linear_transpose(lambda w: _convt_nwc(h, w), k2)(g)
    dh = jnp.where(h > 0, dh, 0).astype(h.dtype)
    db1 = jnp.sum(dh, axis=(0, 1), dtype=jnp.float32)
    (dq,) = jax.linear_transpose(lambda x: _convt_nwc(x, k1), q)(dh)
    (dk1,) = jax.linear_transpose(lambda w: _convt_nwc(q, w), k1)(dh)
    return dq, dk1, db1, dk2, db2  # biases stay fp32 (never cast by callers)


_deconv_stem_fused.defvjp(_fused_fwd, _fused_bwd)


def deconv_stem(q, k1, b1, k2, b2, *, use_pallas: bool | None = None):
    """Differentiable decoder stem.

    Measured on v5e-1 at reference scale (bf16): XLA 5.46 ms fwd / 6.72
    fwd+bwd vs this kernel's 5.58 / 7.80 — XLA's conv_transpose lowering
    wins; default is the XLA path, use_pallas=True opts into the kernel
    (see PERFORMANCE.md).
    """
    if use_pallas is None:
        use_pallas = False
    if use_pallas:
        try:
            _pick_tile(q.shape[1])
        except ValueError:
            use_pallas = False
    if use_pallas:
        return _deconv_stem_fused(q, k1, b1, k2, b2)
    return deconv_stem_ref(q, k1, b1, k2, b2)[0]
