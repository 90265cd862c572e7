"""Pipeline parallelism (parallel/pipeline.py): GPipe-style microbatch
pipelining over the mesh `model` axis must be a pure execution-layout choice
— same math, same gradients as the sequential stack.

The reference has no pipeline parallelism (DDP only); these tests cover the
beyond-parity scaling feature on the virtual 8-device CPU mesh.
"""
import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest
from jax.sharding import Mesh

from msla_tpu.parallel.pipeline import (pipelined_transformer_apply,
                                        spmd_pipeline, stack_layer_params,
                                        unstack_layer_params)


def _mesh(dp: int, pp: int) -> Mesh:
    devs = np.asarray(jax.devices()[: dp * pp]).reshape(dp, pp)
    return Mesh(devs, ("data", "model"))


def _toy_layers(n_layers: int, d: int, rng: np.random.Generator):
    """Per-layer params for h -> tanh(h @ w + b)."""
    return {f"layer{i}": {"w": jnp.asarray(rng.standard_normal((d, d)) * 0.3,
                                           jnp.float32),
                          "b": jnp.asarray(rng.standard_normal(d) * 0.1,
                                           jnp.float32)}
            for i in range(n_layers)}


def _toy_apply(p, h):
    return jnp.tanh(h @ p["w"] + p["b"])


@pytest.mark.parametrize("dp,pp,n_micro", [(2, 4, 4), (4, 2, 2), (8, 1, 2)])
def test_spmd_pipeline_matches_sequential(dp, pp, n_micro):
    rng = np.random.default_rng(0)
    n_layers, d, b = 4, 8, 16
    params = _toy_layers(n_layers, d, rng)
    names = list(params)
    x = jnp.asarray(rng.standard_normal((b, 3, d)), jnp.float32)

    seq = x
    for name in names:
        seq = _toy_apply(params[name], seq)

    stacked = stack_layer_params(params, names)
    mesh = _mesh(dp, pp)
    piped = jax.jit(lambda s, xx: spmd_pipeline(
        _toy_apply, s, xx, mesh, n_micro=n_micro))(stacked, x)
    np.testing.assert_allclose(np.asarray(piped), np.asarray(seq),
                               rtol=1e-6, atol=1e-6)


def test_stack_roundtrip():
    rng = np.random.default_rng(1)
    params = _toy_layers(3, 4, rng)
    names = list(params)
    back = unstack_layer_params(stack_layer_params(params, names), names)
    jtu.tree_map(lambda a, c: np.testing.assert_array_equal(np.asarray(a),
                                                            np.asarray(c)),
                 params, back)


def _small_net():
    from msla_tpu.nn.transformer_net import TransformerQuantizerNet

    return TransformerQuantizerNet(input_dim=32, output_dim=128, hidden_dim=16,
                                   num_layers=4, num_heads=2, dropout=0.0)


@pytest.mark.parametrize("dp,pp,n_micro", [(2, 4, 4), (4, 2, 4)])
def test_pipelined_transformer_matches_net(dp, pp, n_micro):
    rng = np.random.default_rng(2)
    net = _small_net()
    quantized = jnp.asarray(rng.standard_normal((16, 8, 32)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), quantized, deterministic=True)["params"]

    ref = net.apply({"params": params}, quantized, deterministic=True)
    mesh = _mesh(dp, pp)
    piped = jax.jit(lambda p, q: pipelined_transformer_apply(
        net, p, q, mesh, n_micro=n_micro))(params, quantized)
    np.testing.assert_allclose(np.asarray(piped), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_gradients_match_sequential():
    """Backward through the ppermute schedule == backward through the stack."""
    rng = np.random.default_rng(3)
    net = _small_net()
    quantized = jnp.asarray(rng.standard_normal((16, 8, 32)), jnp.float32)
    target = jnp.asarray(rng.standard_normal((16, 4, 128)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), quantized, deterministic=True)["params"]
    mesh = _mesh(2, 4)

    def loss_seq(p):
        out = net.apply({"params": p}, quantized, deterministic=True)
        return jnp.mean((out - target) ** 2)

    def loss_pp(p):
        out = pipelined_transformer_apply(net, p, quantized, mesh, n_micro=4)
        return jnp.mean((out - target) ** 2)

    l_seq, g_seq = jax.value_and_grad(loss_seq)(params)
    l_pp, g_pp = jax.jit(jax.value_and_grad(loss_pp))(params)
    np.testing.assert_allclose(float(l_pp), float(l_seq), rtol=1e-6)
    jtu.tree_map(lambda a, c: np.testing.assert_allclose(
        np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-5), g_pp, g_seq)


def test_pipelined_dropout_is_live_and_reproducible():
    """With dropout_rng the pipelined layers actually drop (output differs
    from deterministic), draws are reproducible under the same key, and
    distinct keys give distinct masks."""
    from msla_tpu.nn.transformer_net import TransformerQuantizerNet

    net = TransformerQuantizerNet(input_dim=32, output_dim=128, hidden_dim=16,
                                  num_layers=4, num_heads=2, dropout=0.5)
    rng = np.random.default_rng(6)
    quantized = jnp.asarray(rng.standard_normal((16, 8, 32)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), quantized, deterministic=True)["params"]
    mesh = _mesh(2, 4)

    det = pipelined_transformer_apply(net, params, quantized, mesh, n_micro=4)
    d1 = pipelined_transformer_apply(net, params, quantized, mesh, n_micro=4,
                                     dropout_rng=jax.random.PRNGKey(1))
    d1b = pipelined_transformer_apply(net, params, quantized, mesh, n_micro=4,
                                      dropout_rng=jax.random.PRNGKey(1))
    d2 = pipelined_transformer_apply(net, params, quantized, mesh, n_micro=4,
                                     dropout_rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(det), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d1b))
    assert not np.allclose(np.asarray(d1), np.asarray(d2))


def test_pipelined_bert_matches_net():
    """BERT encoder pipelining with per-example attention masks riding the
    pipeline as aux state — must match the plain forward exactly."""
    from msla_tpu.nn.bert import BertConfig, BertForMaskedLM
    from msla_tpu.parallel.pipeline import pipelined_bert_apply

    rng = np.random.default_rng(5)
    config = BertConfig(vocab_size=64, hidden_size=16, num_hidden_layers=4,
                        num_attention_heads=2, intermediate_size=32,
                        max_position_embeddings=64)
    bert = BertForMaskedLM(config)
    input_ids = jnp.asarray(rng.integers(0, 64, (16, 12)), jnp.int32)
    # ragged padding: sample i keeps 6 + i % 7 real tokens
    lengths = 6 + np.arange(16) % 7
    mask = jnp.asarray((np.arange(12)[None, :] < lengths[:, None]), jnp.int32)
    params = bert.init(jax.random.PRNGKey(0), input_ids,
                       deterministic=True)["params"]

    ref = bert.apply({"params": params}, input_ids, attention_mask=mask,
                     deterministic=True)
    mesh = _mesh(2, 4)
    piped = jax.jit(lambda p, ids, m: pipelined_bert_apply(
        bert, p, ids, mesh, n_micro=4, attention_mask=m))(params, input_ids, mask)
    np.testing.assert_allclose(np.asarray(piped), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    ref_h = bert.apply({"params": params}, input_ids, attention_mask=mask,
                       deterministic=True, return_mlm_hidden=True)
    piped_h = pipelined_bert_apply(bert, params, input_ids, mesh, n_micro=2,
                                   attention_mask=mask, return_mlm_hidden=True)
    np.testing.assert_allclose(np.asarray(piped_h), np.asarray(ref_h),
                               rtol=2e-5, atol=2e-5)


def test_audiobert_pipeline_loss_matches_standard():
    """AudioBertTask.pipeline_loss_fn (Trainer pipeline_parallel path for the
    BERT stage) == loss_fn exactly: the frozen BERT forward is deterministic,
    so staging it over the mesh must not move the loss."""
    from msla_tpu.models.bert import AudioBertTask
    from msla_tpu.nn.bert import BertConfig, BertForMaskedLM

    task = AudioBertTask(learning_rate=2e-4, checkpoint_dir="/tmp/ppb",
                         codebook="/tmp/ppb_missing.csv", sample_rate=1024,
                         frame_length=2, num_embedding=16)
    task.config = BertConfig(vocab_size=64, hidden_size=16, num_hidden_layers=4,
                             num_attention_heads=2, intermediate_size=32,
                             max_position_embeddings=512)
    task.bert = BertForMaskedLM(task.config)

    b, t = 16, 2048  # W = 512 → one chunk per example
    rng = np.random.default_rng(9)
    indices = jnp.asarray(rng.integers(0, 16, (b, t // 4)), jnp.int32)
    instruments = jnp.asarray(rng.standard_normal((b, 4, t)), jnp.float32)
    params = task.init_variables(jax.random.PRNGKey(0),
                                 (indices, instruments))["params"]

    key = jax.random.PRNGKey(3)
    loss, _ = task.loss_fn(params, (indices, instruments), key)
    mesh = _mesh(2, 4)
    loss_pp, _ = jax.jit(lambda p: task.pipeline_loss_fn(
        p, (indices, instruments), key, mesh, 2))(params)
    np.testing.assert_allclose(float(loss_pp), float(loss), rtol=1e-5)


def test_weight_sharded_pipeline_training():
    """The memory-saving layout from docs/PARALLELISM.md: the layer stack is
    held PERSISTENTLY in the stacked P('model') representation (each device
    stores only its stage's weights + Adam state) and trained directly —
    grads and optimizer state inherit the stage sharding, and the trajectory
    matches replicated sequential training."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(10)
    n_layers, d, b, steps = 4, 8, 16, 3
    params = _toy_layers(n_layers, d, rng)
    names = list(params)
    mesh = _mesh(2, 4)
    stacked = stack_layer_params(params, names)
    stage_sh = jax.tree.map(
        lambda a: NamedSharding(mesh, P("model", *(None,) * (a.ndim - 1))), stacked)
    stacked = jax.device_put(stacked, stage_sh)
    tx = optax.adam(1e-2)
    opt = tx.init(stacked)  # zeros_like inherits the stage sharding

    x = jnp.asarray(rng.standard_normal((b, 3, d)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((b, 3, d)), jnp.float32)

    @jax.jit
    def step(stacked, opt):
        def loss_fn(s):
            out = spmd_pipeline(_toy_apply, s, x, mesh, n_micro=4)
            return jnp.mean((out - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(stacked)
        updates, opt = tx.update(grads, opt, stacked)
        return optax.apply_updates(stacked, updates), opt, loss

    losses = []
    for _ in range(steps):
        stacked, opt, loss = step(stacked, opt)
        losses.append(float(loss))
    # every weight + Adam leaf stays stage-sharded across updates
    for leaf in jtu.tree_leaves(stacked):
        assert leaf.sharding.spec[0] == "model"
    for leaf in jtu.tree_leaves(opt):
        if hasattr(leaf, "sharding") and getattr(leaf, "ndim", 0) > 0 \
                and leaf.shape[:1] == (n_layers,):
            assert leaf.sharding.spec[0] == "model", leaf.sharding

    # trajectory equality vs replicated sequential training
    seq_stacked = stack_layer_params(params, names)
    seq_opt = tx.init(seq_stacked)

    @jax.jit
    def seq_step(s, o):
        def loss_fn(st):
            h = x
            for i in range(n_layers):
                h = _toy_apply(jtu.tree_map(lambda a, i=i: a[i], st), h)
            return jnp.mean((h - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(s)
        updates, o = tx.update(grads, o, s)
        return optax.apply_updates(s, updates), o, loss

    seq_losses = []
    for _ in range(steps):
        seq_stacked, seq_opt, l = seq_step(seq_stacked, seq_opt)
        seq_losses.append(float(l))
    np.testing.assert_allclose(losses, seq_losses, rtol=1e-5, atol=1e-7)
    jtu.tree_map(lambda a, c: np.testing.assert_allclose(
        np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-6), stacked, seq_stacked)


def test_pipeline_rejects_indivisible():
    rng = np.random.default_rng(4)
    params = _toy_layers(3, 4, rng)  # 3 layers, 2 stages → error
    stacked = stack_layer_params(params, list(params))
    x = jnp.ones((8, 4), jnp.float32)
    mesh = _mesh(4, 2)
    with pytest.raises(ValueError, match="layers"):
        spmd_pipeline(_toy_apply, stacked, x, mesh, n_micro=2)
    params4 = _toy_layers(4, 4, rng)
    stacked4 = stack_layer_params(params4, list(params4))
    with pytest.raises(ValueError, match="n_micro"):
        spmd_pipeline(_toy_apply, stacked4, x, mesh, n_micro=3)
