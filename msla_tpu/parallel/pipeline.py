"""GPipe-style SPMD pipeline parallelism over the mesh `model` axis.

The reference distributes only via Lightning DDP data parallelism
(reference: configs/trainer/default.yaml:10 `devices: -1`; SURVEY.md §2
parallelism table) — pipeline parallelism is a beyond-parity scaling feature
of this framework. Design is TPU-native rather than a torch translation:

- the homogeneous layer stack (transformer decoder layers, BERT encoder
  layers) is STACKED on a leading axis and sharded ``P(pipe_axis)``, so each
  device slice holds exactly its stage's layer parameters;
- microbatches stream through stages inside one ``jax.shard_map`` body where
  activations rotate stage→stage+1 via ``lax.ppermute`` each tick (the
  classic shard_map pipelining recipe from the JAX scaling-book material);
- the schedule is a statically-unrolled loop of ``n_micro + pp - 1`` ticks
  (fill + steady state + drain), so XLA sees straight-line code and fuses
  each stage body;
- the backward pipeline comes from autodiff: the transpose of ``ppermute``
  is the reverse rotation, so ``jax.grad`` through the forward schedule IS
  the reverse bubble schedule — no hand-written backward pass.

Composable with data parallelism: the microbatch dimension is sharded over
the mesh `data` axis, giving dp × pp on one 2-D mesh with XLA inserting the
gradient all-reduce over `data` as usual.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
from jax.sharding import Mesh, PartitionSpec as P

from msla_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def stack_layer_params(params, layer_names):
    """Stack per-layer parameter subtrees (identical structure) on a new
    leading axis: ``stacked[leaf][i] == params[layer_names[i]][leaf]``."""
    trees = [params[name] for name in layer_names]
    return jtu.tree_map(lambda *leaves: jnp.stack(leaves), *trees)


def unstack_layer_params(stacked, layer_names):
    """Inverse of :func:`stack_layer_params` (host-side convenience)."""
    return {name: jtu.tree_map(lambda a, i=i: a[i], stacked)
            for i, name in enumerate(layer_names)}


def spmd_pipeline(layer_apply, stacked, x, mesh: Mesh, *, n_micro: int,
                  aux=None, rng=None, data_axis: str = DATA_AXIS,
                  pipe_axis: str = MODEL_AXIS):
    """Run ``x`` through the stacked layers, pipelined over ``pipe_axis``.

    Args:
      layer_apply: ``(one_layer_params, h, *extras) -> h`` applying a single
        layer; ``extras`` receives the microbatch's aux slice when ``aux`` is
        given, then a per-(layer, microbatch) PRNG key when ``rng`` is given.
      stacked: pytree from :func:`stack_layer_params`, leading axis =
        total layer count L (must divide by the pipe axis size).
      x: activations ``(B, ...)``; B must divide by ``n_micro`` and the
        resulting microbatch by the data axis size.
      mesh: 2-D ``(data, model)`` mesh; ``model`` carries the stages.
      n_micro: number of microbatches streamed through the pipeline.
      aux: optional per-example constant ``(B, ...)`` (e.g. an attention
        mask) that travels alongside each microbatch through the stages.
      rng: optional PRNG key; folded with the global layer index and the
        microbatch id into a distinct key per layer application (stochastic
        layers — dropout — under pipelining; a different stream than the
        sequential forward, equally valid masks).

    Returns ``(B, ...)`` activations after all L layers, bit-comparable to
    the sequential application (same layer order, same per-layer math;
    with ``rng``, same math under per-application dropout draws).
    """
    pp = mesh.shape[pipe_axis]
    n_layers = jtu.tree_leaves(stacked)[0].shape[0]
    if n_layers % pp != 0:
        raise ValueError(f"{n_layers} layers not divisible by {pp} stages")
    per_stage = n_layers // pp
    b = x.shape[0]
    if b % n_micro != 0:
        raise ValueError(f"batch {b} not divisible by n_micro={n_micro}")
    mb = b // n_micro
    if mb % mesh.shape[data_axis] != 0:
        raise ValueError(f"microbatch {mb} not divisible by the "
                         f"{data_axis}={mesh.shape[data_axis]} mesh axis")
    xm = x.reshape(n_micro, mb, *x.shape[1:])
    auxm = (aux.reshape(n_micro, mb, *aux.shape[1:]) if aux is not None
            else jnp.zeros((n_micro, mb, 1), x.dtype))  # placeholder, unread

    def body(stacked_local, xloc, auxloc):
        stage = jax.lax.axis_index(pipe_axis)

        def stage_apply(h, a, tick):
            # the microbatch this stage processes at `tick` (bubble ticks
            # compute on discarded zeros; clamp keeps fold_in well-defined)
            micro = jnp.clip(tick - stage, 0, n_micro - 1)
            for j in range(per_stage):
                p = jtu.tree_map(lambda t, j=j: t[j], stacked_local)
                extras = () if aux is None else (a,)
                if rng is not None:
                    g = stage * per_stage + j  # global layer index
                    extras += (jax.random.fold_in(jax.random.fold_in(rng, g),
                                                  micro),)
                h = layer_apply(p, h, *extras)
            return h

        state = jnp.zeros_like(xloc[0])
        astate = jnp.zeros_like(auxloc[0])
        out = jnp.zeros_like(xloc)
        perm = [(i, (i + 1) % pp) for i in range(pp)]
        for tick in range(n_micro + pp - 1):
            if tick < n_micro:  # stage 0 injects the next microbatch
                state = jnp.where(stage == 0, xloc[tick], state)
                astate = jnp.where(stage == 0, auxloc[tick], astate)
            state = stage_apply(state, astate, tick)
            if tick >= pp - 1:  # last stage drains a finished microbatch
                k = tick - (pp - 1)
                out = out.at[k].set(jnp.where(stage == pp - 1, state, out[k]))
            if pp > 1:
                state = jax.lax.ppermute(state, pipe_axis, perm)
                if aux is not None:
                    astate = jax.lax.ppermute(astate, pipe_axis, perm)
        return out[None]  # (1, n_micro, mb_local, ...) → global (pp, ...)

    act_tail = (None,) * (x.ndim - 1)
    aux_tail = (None,) * (auxm.ndim - 2)
    y = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(pipe_axis), P(None, data_axis, *act_tail),
                  P(None, data_axis, *aux_tail)),
        out_specs=P(pipe_axis, None, data_axis, *act_tail),
        check_vma=False,  # stage-gated writes are deliberately device-varying
    )(stacked, xm, auxm)
    return y[-1].reshape(b, *x.shape[1:])


def pipelined_transformer_apply(net, params, quantized, mesh: Mesh, *,
                                n_micro: int, dropout_rng=None,
                                data_axis: str = DATA_AXIS,
                                pipe_axis: str = MODEL_AXIS):
    """TransformerQuantizerNet forward with the decoder-layer stack pipelined
    over the mesh `model` axis.

    Mirrors ``TransformerQuantizerNet.__call__`` (nn/transformer_net.py)
    exactly — embed → positional encoding → L pipelined decoder layers →
    stem reshape → output projection — and is asserted equal to the
    unpipelined ``net.apply`` in tests/test_pipeline.py (the equality test is
    the drift guard for this hand-mirrored forward). With ``dropout_rng`` the
    decoder layers train with live dropout (per-layer/per-microbatch keys —
    a different, equally valid stream than the sequential path's).
    """
    from flax import linen as nn

    from msla_tpu.nn.attention import causal_mask
    from msla_tpu.nn.positional import PositionalEncoding
    from msla_tpu.nn.transformer_net import DecoderLayer

    b, s, _ = quantized.shape
    x = nn.Dense(net.hidden_dim, dtype=net.compute_dtype, name="embedding").apply(
        {"params": params["embedding"]}, quantized).astype(jnp.float32)
    x = PositionalEncoding(net.hidden_dim, mode=net.positional_mode).apply(
        {"params": {}}, x)
    mask = causal_mask(s, x.dtype)

    layer = DecoderLayer(net.hidden_dim, net.num_heads, dropout=net.dropout,
                         zero_memory=net.zero_memory, dtype=net.compute_dtype)
    layer_apply = partial(_apply_decoder_layer, layer, mask,
                          dropout_rng is not None)
    stacked = stack_layer_params(params, [f"layer{i}" for i in range(net.num_layers)])
    x = spmd_pipeline(layer_apply, stacked, x, mesh, n_micro=n_micro,
                      rng=dropout_rng, data_axis=data_axis, pipe_axis=pipe_axis)

    x = x.reshape(b, 4, (s * net.hidden_dim) // 4)
    out = nn.Dense(net.output_dim, dtype=net.compute_dtype, name="fc").apply(
        {"params": params["fc"]}, x)
    return out.astype(jnp.float32)


def _apply_decoder_layer(layer, mask, stochastic, layer_params, h, key=None):
    if stochastic:
        return layer.apply({"params": layer_params}, h, None, mask,
                           deterministic=False, rngs={"dropout": key})
    return layer.apply({"params": layer_params}, h, None, mask,
                       deterministic=True)


def pipelined_bert_apply(bert, params, input_ids, mesh: Mesh, *,
                         n_micro: int, attention_mask=None,
                         return_mlm_hidden: bool = False,
                         data_axis: str = DATA_AXIS,
                         pipe_axis: str = MODEL_AXIS):
    """Deterministic BertForMaskedLM forward with the 12-layer encoder stack
    pipelined over the mesh `model` axis (per-example attention masks ride
    along as pipeline aux state).

    Mirrors ``BertForMaskedLM.__call__`` (nn/bert.py:105-138) — embeddings →
    L pipelined encoder layers → MLM transform/norm [→ tied decoder] — and is
    asserted equal to the unpipelined ``bert.apply`` in
    tests/test_pipeline.py. This is the stage where pipeline parallelism
    pays: the Audio-BERT state is the framework's largest (PERFORMANCE.md
    checkpoint section). Per-device ACTIVATION residency divides by the stage
    count; dividing PARAMETER residency too requires holding the layer stack
    in the stacked ``P(model)`` layout persistently (pass ``params`` whose
    layer subtrees were restacked/sharded by the caller) — when the stack is
    built in-step from replicated params, XLA slices locally but the
    replicated copy still resides on every device.
    """
    from flax import linen as nn

    from msla_tpu.nn.bert import BertEmbeddings, BertLayer

    c = bert.config
    if attention_mask is None:
        attention_mask = jnp.ones_like(input_ids)
    attention_mask = attention_mask.astype(jnp.float32)

    x = BertEmbeddings(c).apply({"params": params["embeddings"]}, input_ids,
                                deterministic=True)
    layer = BertLayer(c)
    stacked = stack_layer_params(params,
                                 [f"layer{i}" for i in range(c.num_hidden_layers)])
    x = spmd_pipeline(partial(_apply_bert_layer, layer), stacked, x, mesh,
                      n_micro=n_micro, aux=attention_mask,
                      data_axis=data_axis, pipe_axis=pipe_axis)

    h = nn.Dense(c.hidden_size).apply({"params": params["mlm_transform"]}, x)
    h = jax.nn.gelu(h, approximate=False)
    h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.compute_dtype).apply(
        {"params": params["mlm_norm"]}, h)
    if return_mlm_hidden:
        return h
    word_embeddings = params["embeddings"]["word_embeddings"]["embedding"]
    logits = jax.lax.dot_general(h, word_embeddings, (((2,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    return logits + params["mlm_bias"]


def _apply_bert_layer(layer, layer_params, h, mask):
    return layer.apply({"params": layer_params}, h, mask, deterministic=True)
