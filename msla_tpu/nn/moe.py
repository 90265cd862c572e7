"""Mixture-of-Experts FFN with expert parallelism (beyond-reference scaling).

The reference's decoder FFN is dense (src/model/transformer.py:17-29 via
torch.nn.TransformerDecoderLayer). This module adds an opt-in GShard-style
sparse alternative: per-token top-k routing into E expert FFNs, expressed as
one-hot dispatch/combine einsums over a capacity-bounded expert buffer — the
canonical TPU formulation (static shapes, every FLOP an MXU matmul, no
scatter). Expert parallelism falls out of sharding the stacked expert weights'
leading E dim over the mesh `model` axis (`parallel.mesh.tp_param_spec`):
XLA partitions the dispatch/combine einsums with all_to_all collectives —
no hand-written communication.

Semantics notes:
- groups = batch rows; capacity C = ceil(k * S / E * capacity_factor) per
  expert per group. Overflow tokens are dropped from the FFN (they ride the
  residual connection only) — standard Switch/GShard behavior.
- top-k gates renormalize over the selected experts.
- aux load-balance loss (Switch eq. 4): E * sum_e f_e * P_e, where f_e is the
  top-1 token fraction and P_e the mean router prob of expert e; exposed via
  a flax "losses" collection so TransformerTask can weight it into the loss.
- with num_experts=1, top-1 routing and capacity_factor >= 1 this computes
  exactly the dense ReLU FFN (gate == 1, no overflow) — pinned by
  tests/test_moe.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from msla_tpu.nn.layers import torch_bias_init, torch_kernel_init


def _expert_kernel_init(key, shape, dtype=jnp.float32):
    """Per-expert torch-Linear default U(±1/sqrt(fan_in)) for stacked (E, in,
    out) kernels — variance_scaling would count the leading E dim into fan_in
    and start every expert sqrt(E)× smaller than the dense FFN it replaces."""
    limit = 1.0 / (shape[-2] ** 0.5)
    return jax.random.uniform(key, shape, dtype, -limit, limit)


class MoEFFN(nn.Module):
    """Top-k routed mixture of ReLU FFN experts (dispatch-einsum form)."""

    d_model: int
    d_ff: int
    num_experts: int
    num_selected: int = 2
    capacity_factor: float = 1.25
    dropout: float = 0.0
    dtype: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        g, s, m = x.shape
        e, f, k = self.num_experts, self.d_ff, min(self.num_selected, self.num_experts)
        c = max(1, int(-(-k * s * self.capacity_factor // e)))
        cdt = x.dtype if self.dtype is None else self.dtype

        router = self.param("router", torch_kernel_init, (m, e))
        w1 = self.param("w1", _expert_kernel_init, (e, m, f))
        b1 = self.param("b1", torch_bias_init(m), (e, f))
        w2 = self.param("w2", _expert_kernel_init, (e, f, m))
        b2 = self.param("b2", torch_bias_init(f), (e, m))

        # routing runs in fp32 — tiny FLOPs, and argmax ties/softmax accuracy
        # matter more than MXU throughput here
        logits = jnp.einsum("gsm,me->gse", x.astype(jnp.float32), router)
        probs = jax.nn.softmax(logits, axis=-1)

        # iterative top-k: argmax, mask, renormalize the selected gates
        gates, p = [], probs
        for _ in range(k):
            idx = jnp.argmax(p, axis=-1)                        # (g, s)
            oh = jax.nn.one_hot(idx, e, dtype=probs.dtype)      # (g, s, e)
            gates.append((jnp.sum(p * oh, axis=-1), oh))
            p = p * (1.0 - oh)
        denom = sum(gate for gate, _ in gates) + 1e-9
        gates = [(gate / denom, oh) for gate, oh in gates]

        # capacity-bounded positions: k=0 tokens get priority, then k=1, ...
        counts = jnp.zeros((g, 1, e), probs.dtype)
        dispatch = jnp.zeros((g, s, e, c), probs.dtype)
        combine = jnp.zeros((g, s, e, c), probs.dtype)
        for gate, oh in gates:
            pos = counts + jnp.cumsum(oh, axis=1) - oh           # (g, s, e)
            counts = counts + jnp.sum(oh, axis=1, keepdims=True)
            pos_tok = jnp.sum(pos * oh, axis=-1).astype(jnp.int32)  # (g, s)
            oh = oh * (pos_tok < c)[..., None]
            slot = oh[..., None] * jax.nn.one_hot(pos_tok, c, dtype=probs.dtype)[:, :, None, :]
            dispatch = dispatch + slot
            combine = combine + gate[..., None, None] * slot

        # expert compute: (E, G, C, M) buffers — E shards over `model`, the
        # dispatch/combine einsums lower to all_to_all under pjit
        xin = jnp.einsum("gsec,gsm->egcm", dispatch.astype(cdt), x.astype(cdt))
        h = jax.nn.relu(jnp.einsum("egcm,emf->egcf", xin, w1.astype(cdt))
                        + b1[:, None, None, :].astype(cdt))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        out = jnp.einsum("egcf,efm->egcm", h, w2.astype(cdt)) \
            + b2[:, None, None, :].astype(cdt)
        y = jnp.einsum("gsec,egcm->gsm", combine.astype(cdt), out)

        # Switch load-balance aux: E * sum_e (top-1 fraction)·(mean prob)
        frac = jnp.mean(gates[0][1], axis=(0, 1))
        mean_prob = jnp.mean(probs, axis=(0, 1))
        self.sow("losses", "moe_aux", e * jnp.sum(frac * mean_prob))
        return y.astype(jnp.float32)
