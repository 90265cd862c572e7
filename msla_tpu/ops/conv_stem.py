"""Fused Pallas kernel for the VQ-VAE encoder stem: two k4/s2/p1 Conv1Ds with
ReLUs in ONE pass over HBM (reference layers: src/model/components/encoder.py:13-18).

Why: XLA lowers each conv separately — conv1's (B, T/2, C1) activation (360 MB
fp32 at reference scale) round-trips through HBM between the layers, and
conv1's contraction dim (k·C0 = 16) leaves the MXU ~12% utilized (measured
1.2 TF/s, PERFORMANCE.md). This kernel reads the waveform once, computes both
convs tile-by-tile entirely in VMEM, and writes only conv2's output (plus,
for training, the intermediate h1 needed by the backward pass).

The layout trick that makes a strided conv unit-stride on TPU: pack the
padded waveform as (rows, 4·C0) — each row holds 4 consecutive samples, one
conv2-output step. Then conv1's even/odd output phases and conv2's 4 taps all
become unit-stride row slices feeding MXU matmuls; the tap/phase structure
lives in host-prepared weight matrices (zero-padded where a phase reads only
half a row), so the kernel contains NO lane-dim slicing or concatenation
(Mosaic cannot relayout lane-offset slices for concat).

Training: `conv_stem` is a custom_vjp. Forward runs this kernel (also
emitting h1's even/odd phases, interleaved on the host into (B, T/2, C1));
backward is exact conv adjoints via jax.linear_transpose on the saved
h1/out2 — no forward recompute.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LEFT_PAD = 5  # odd ⇒ tile starts land on 4-sample row boundaries


def _pick_tile(w2: int, max_tile: int = 2200) -> int:
    """Largest divisor of the conv2 output width that is a multiple of 8."""
    best = 0
    for d in range(8, min(w2, max_tile) + 1, 8):
        if w2 % d == 0:
            best = d
    if best == 0:
        raise ValueError(f"width {w2} has no multiple-of-8 divisor")
    return best


def _stem_kernel(save_hidden, zz_ref, halo_ref, w1e_ref, w1oa_ref, w1ob_ref,
                 b1_ref, w2_ref, b2_ref, out_ref, *hidden_refs):
    j = pl.program_id(1)
    zz = jnp.concatenate([zz_ref[0], halo_ref[0][:2]], axis=0)  # (TILE+2, 4·C0)
    tile = zz.shape[0] - 2

    def mm(a, w):
        return lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    # conv1 even/odd phases: h1e[q] = out1[2(j0+q)], h1o[q] = out1[2(j0+q)-1].
    # The odd phase straddles two packed rows; the straddle is encoded in the
    # zero-padded weights w1oa/w1ob instead of lane slicing.
    h1e = jnp.maximum(mm(zz[1:], w1e_ref[:]) + b1_ref[:], 0.0)        # (TILE+1, C1)
    h1o = jnp.maximum(mm(zz[:-1], w1oa_ref[:]) + mm(zz[1:], w1ob_ref[:])
                      + b1_ref[:], 0.0)

    # conv2's p=1 zero padding is on ITS input (relu(conv1)), not on the
    # waveform: out1[-1] (first tile) and out1[2·W2] (last tile) are pad rows
    row = lax.broadcasted_iota(jnp.int32, h1o.shape, 0)
    h1o = jnp.where((j == 0) & (row == 0), 0.0, h1o)
    h1e = jnp.where((j == pl.num_programs(1) - 1) & (row == tile), 0.0, h1e)

    # out2[q] = Σ_t out1[2q-1+t]·W2[t] — four phase matmuls, summed
    dt = w2_ref.dtype
    acc = (mm(h1o[:-1].astype(dt), w2_ref[0]) + mm(h1e[:-1].astype(dt), w2_ref[1])
           + mm(h1o[1:].astype(dt), w2_ref[2]) + mm(h1e[1:].astype(dt), w2_ref[3]))
    out_ref[0] = jnp.maximum(acc + b2_ref[:], 0.0).astype(out_ref.dtype)

    if save_hidden:
        # h1 phases; the host interleaves them into (B, T/2, C1)
        hidden_refs[0][0] = h1e[:-1].astype(hidden_refs[0].dtype)
        hidden_refs[1][0] = h1o[1:].astype(hidden_refs[1].dtype)


@functools.partial(jax.jit,
                   static_argnames=("save_hidden", "tile_w", "interpret"))
def conv_stem_pallas(x: jax.Array, w1: jax.Array, b1: jax.Array,
                     w2: jax.Array, b2: jax.Array, *, save_hidden: bool = False,
                     tile_w: int | None = None, interpret: bool = False):
    """x (B, T, C0) NWC; w1 (4, C0, C1); w2 (4, C1, C2); both convs k4 s2 p1
    with fused ReLU. Returns out2 (B, T/4, C2)[, h1 (B, T/2, C1)]."""
    b, t, c0 = x.shape
    assert t % 4 == 0, f"waveform length {t} not divisible by 4"
    w2_out = t // 4
    c1, c2 = w1.shape[-1], w2.shape[-1]
    tile = tile_w or _pick_tile(w2_out)
    n_tiles = w2_out // tile
    p = 4 * c0
    rows = n_tiles * tile + 8  # + one 8-row halo block beyond the last tile
    xp = jnp.pad(x, ((0, 0), (_LEFT_PAD, 4 * rows - t - _LEFT_PAD), (0, 0)))
    xp = xp.reshape(b, rows, p)

    w1r = w1.reshape(4 * c0, c1)  # tap-major rows match the packed lanes
    half = p // 2
    zeros = jnp.zeros((half, c1), w1.dtype)
    w1oa = jnp.concatenate([zeros, w1r[:half]], axis=0)   # odd: zz[:-1] lanes 2C0:
    w1ob = jnp.concatenate([w1r[half:], zeros], axis=0)   # odd: zz[1:] lanes :2C0
    b1r = b1.reshape(1, c1).astype(jnp.float32)
    b2r = b2.reshape(1, c2).astype(jnp.float32)

    whole = lambda shape: pl.BlockSpec(shape, lambda i, j: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, tile, p), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, p), lambda i, j: (i, (j + 1) * (tile // 8), 0),
                     memory_space=pltpu.VMEM),
        whole((4 * c0, c1)), whole((4 * c0, c1)), whole((4 * c0, c1)),
        whole((1, c1)), whole((4, c1, c2)), whole((1, c2)),
    ]
    out_spec = pl.BlockSpec((1, tile, c2), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, w2_out, c2), x.dtype)
    flops = 2 * b * (3 * w2_out * 4 * c0 * c1 + w2_out * 4 * c1 * c2)
    itemsize = x.dtype.itemsize
    cost = pl.CostEstimate(
        flops=flops, transcendentals=0,
        bytes_accessed=b * rows * p * itemsize
        + b * w2_out * c2 * itemsize * (1 + (2 * c1) // c2 * int(save_hidden)))

    if save_hidden:
        hspec = pl.BlockSpec((1, tile, c1), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
        hshape = jax.ShapeDtypeStruct((b, w2_out, c1), x.dtype)
        out2, h1e, h1o = pl.pallas_call(
            functools.partial(_stem_kernel, True),
            grid=(b, n_tiles), in_specs=in_specs,
            out_specs=[out_spec, hspec, hspec],
            out_shape=[out_shape, hshape, hshape],
            cost_estimate=cost, interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
        )(xp, xp, w1r, w1oa, w1ob, b1r, w2, b2r)
        h1 = jnp.stack([h1e, h1o], axis=2).reshape(b, 2 * w2_out, c1)
        return out2, h1

    return pl.pallas_call(
        functools.partial(_stem_kernel, False),
        grid=(b, n_tiles), in_specs=in_specs, out_specs=out_spec,
        out_shape=out_shape, cost_estimate=cost, interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
    )(xp, xp, w1r, w1oa, w1ob, b1r, w2, b2r)


# ---- reference XLA path + custom-vjp wrapper -----------------------------------

def _conv_nwc(x, w, stride):
    return lax.conv_general_dilated(x, w, (stride,), [(1, 1)],
                                    dimension_numbers=("NWC", "WIO", "NWC"))


def conv_stem_ref(x, w1, b1, w2, b2):
    """Plain-XLA stem (the exact ops Encoder uses) — CPU path and vjp oracle."""
    h1 = jax.nn.relu(_conv_nwc(x, w1, 2) + b1.astype(x.dtype))
    out = jax.nn.relu(_conv_nwc(h1, w2, 2) + b2.astype(x.dtype))
    return out, h1


@jax.custom_vjp
def _conv_stem_fused(x, w1, b1, w2, b2):
    return conv_stem_pallas(x, w1, b1, w2, b2, save_hidden=False)


def _fused_fwd(x, w1, b1, w2, b2):
    out2, h1 = conv_stem_pallas(x, w1, b1, w2, b2, save_hidden=True)
    return out2, (x, h1, out2, w1, w2)


def _fused_bwd(res, g):
    """Exact conv adjoints on the saved activations — no forward recompute.
    jax.linear_transpose gives the transpose of each (linear) conv without
    re-evaluating the primal."""
    x, h1, out2, w1, w2 = res
    g2 = jnp.where(out2 > 0, g, 0).astype(h1.dtype)
    db2 = jnp.sum(g2, axis=(0, 1), dtype=jnp.float32)
    (dh1,) = jax.linear_transpose(lambda h: _conv_nwc(h, w2, 2), h1)(g2)
    (dw2,) = jax.linear_transpose(lambda w: _conv_nwc(h1, w, 2), w2)(g2)
    dh1 = jnp.where(h1 > 0, dh1, 0).astype(h1.dtype)
    db1 = jnp.sum(dh1, axis=(0, 1), dtype=jnp.float32)
    (dx,) = jax.linear_transpose(lambda xx: _conv_nwc(xx, w1, 2), x)(dh1)
    (dw1,) = jax.linear_transpose(lambda w: _conv_nwc(x, w, 2), w1)(dh1)
    return dx, dw1, db1, dw2, db2  # biases stay fp32 (never cast by callers)


_conv_stem_fused.defvjp(_fused_fwd, _fused_bwd)


def conv_stem(x, w1, b1, w2, b2, *, use_pallas: bool | None = None):
    """Differentiable encoder stem.

    Measured on v5e-1 at reference scale (B=64, T=44k, bf16): XLA's own
    fusion of conv+relu+conv+relu runs 3.29 ms fwd / 4.76 ms fwd+bwd vs this
    kernel's 4.30 / 7.38 — the kernel pays narrow-lane (16/64-lane) VPU
    relayouts and per-grid-step overhead that the saved HBM round-trip does
    not buy back (see PERFORMANCE.md). Default is therefore the XLA path;
    use_pallas=True opts into the hand-scheduled kernel.
    """
    if use_pallas is None:
        use_pallas = False
    if use_pallas and x.shape[1] % 4 == 0:
        try:
            _pick_tile(x.shape[1] // 4)
        except ValueError:
            use_pallas = False
    else:
        use_pallas = False
    if use_pallas:
        return _conv_stem_fused(x, w1, b1, w2, b2)
    return conv_stem_ref(x, w1, b1, w2, b2)[0]
