"""MoE FFN + expert parallelism (nn/moe.py — beyond-reference scaling).

The dense-FFN equivalence pins the dispatch/combine einsum algebra; the
Trainer test pins expert parallelism (stacked expert weights sharded over the
mesh `model` axis) as a pure layout choice — identical training to the
replicated run."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from msla_tpu.nn.moe import MoEFFN

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def test_moe_single_expert_equals_dense_ffn():
    """E=1, top-1, capacity_factor=1 → every token routes to the one expert
    with gate 1 and no overflow: exactly the dense ReLU FFN."""
    moe = MoEFFN(d_model=16, d_ff=32, num_experts=1, num_selected=1,
                 capacity_factor=1.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16))
    variables = moe.init(jax.random.PRNGKey(1), x)
    y = moe.apply(variables, x)
    p = variables["params"]
    dense = jnp.maximum(x @ p["w1"][0] + p["b1"][0], 0.0) @ p["w2"][0] + p["b2"][0]
    np.testing.assert_allclose(np.asarray(y), np.asarray(dense), rtol=1e-5,
                               atol=1e-6)


def test_moe_expert_init_matches_dense_scale():
    """Stacked expert kernels must start at the per-expert torch-Linear scale
    U(±1/sqrt(fan_in)) — variance_scaling over the stacked (E, in, out) shape
    would fold E into fan_in and start every expert sqrt(E)× too small."""
    moe = MoEFFN(d_model=64, d_ff=128, num_experts=8)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 64))
    p = moe.init(jax.random.PRNGKey(5), x)["params"]
    w1_lim = float(jnp.max(jnp.abs(p["w1"])))
    assert 0.8 / 8.0 < w1_lim <= 1 / 8.0          # 1/sqrt(64) = 0.125
    w2_lim = float(jnp.max(jnp.abs(p["w2"])))
    assert 0.8 / 128 ** 0.5 < w2_lim <= 1 / 128 ** 0.5


def test_moe_capacity_bounds_and_aux_loss():
    """Overflow tokens are dropped (zero FFN output — they ride the residual)
    and the Switch aux loss is sown into the `losses` collection."""
    moe = MoEFFN(d_model=8, d_ff=16, num_experts=2, num_selected=1,
                 capacity_factor=0.25)  # c = ceil(16*0.25/2) = 2 slots/expert
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 8))
    variables = moe.init(jax.random.PRNGKey(3), x)
    y, aux = moe.apply({"params": variables["params"]}, x, mutable=["losses"])
    nonzero_rows = int(jnp.sum(jnp.any(y[0] != 0.0, axis=-1)))
    assert nonzero_rows <= 2 * 2          # ≤ experts × capacity
    assert nonzero_rows >= 1
    (aux_val,) = jax.tree_util.tree_leaves(aux["losses"])
    # balanced routing gives exactly 1.0; near-uniform fresh-init routers sit
    # close to it — only a pathological router could drive it below ~0.5
    assert np.isfinite(float(aux_val)) and float(aux_val) >= 0.5


def test_moe_transformer_loss_and_grads():
    """TransformerTask(moe_experts=4): finite loss, aux metric present, grads
    flow into every expert."""
    from msla_tpu.models.transformer import TransformerTask

    task = TransformerTask(sample_rate=64, frame_length=2, learning_rate=1e-3,
                           checkpoint_dir="/tmp/moe", num_layers=2, num_heads=2,
                           hidden_dim=16, dropout=0.0, moe_experts=4)
    rng = np.random.default_rng(5)
    data = jnp.asarray(rng.standard_normal((4, 4, 128)).astype(np.float32))
    quantized = data[:, :2, :].reshape(4, 8, 32)
    batch = (quantized, data)
    params = task.init_variables(jax.random.PRNGKey(0), batch)["params"]
    (loss, metrics), grads = jax.value_and_grad(
        lambda p: task.loss_fn(p, batch, jax.random.PRNGKey(1)),
        has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert "train/moe_aux" in metrics
    g_w1 = grads["layer0"]["moe"]["w1"]
    assert g_w1.shape[0] == 4
    # top-2 routing across 8*4=32 tokens touches every expert with high prob
    assert float(jnp.sum(jnp.abs(g_w1))) > 0


def test_moe_transformer_converges():
    """A few Adam steps on a fixed batch reduce the MoE transformer's loss —
    gradients reach the experts through the dispatch/combine einsums and the
    routed path trains, not just runs."""
    import optax

    from msla_tpu.models.transformer import TransformerTask

    task = TransformerTask(sample_rate=64, frame_length=2, learning_rate=1e-3,
                           checkpoint_dir="/tmp/moe_c", num_layers=2,
                           num_heads=2, hidden_dim=16, dropout=0.0,
                           moe_experts=4, moe_selected=2)
    rng = np.random.default_rng(13)
    data = jnp.asarray(rng.standard_normal((8, 4, 128)).astype(np.float32) * 0.3)
    batch = (data[:, :2, :].reshape(8, 8, 32), data)
    params = task.init_variables(jax.random.PRNGKey(0), batch)["params"]
    tx = task.configure_optimizer()
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, m), grads = jax.value_and_grad(
            lambda p: task.loss_fn(p, batch, jax.random.PRNGKey(1)),
            has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, m["train/loss"]

    losses = []
    for _ in range(8):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_trainer_moe_expert_parallel_matches_replicated(tmp_path):
    """Trainer(model_parallel=2) shards the expert stacks over `model`
    (tp_param_spec MoE rule → all_to_all dispatch) and must train identically
    to the replicated run."""
    from msla_tpu.models.transformer import TransformerTask
    from msla_tpu.train.trainer import Trainer

    class _QuantizedDM:
        def __init__(self, data, batch_size):
            self.batches = [data[i:i + batch_size]
                            for i in range(0, len(data) - batch_size + 1, batch_size)]

        def train_dataloader(self):
            return list(self.batches)

        def val_dataloader(self):
            return list(self.batches)

        def on_after_batch_transfer(self, batch):
            b = batch.shape[0]
            return batch[:, :2, :].reshape(b, 8, 32), batch

    rng = np.random.default_rng(9)
    data = rng.standard_normal((16, 4, 128)).astype(np.float32)

    def fit(model_parallel):
        task = TransformerTask(sample_rate=64, frame_length=2, learning_rate=1e-3,
                               checkpoint_dir=str(tmp_path), num_layers=2,
                               num_heads=2, hidden_dim=16, dropout=0.0,
                               moe_experts=4, moe_selected=2)
        dm = _QuantizedDM(data, batch_size=8)
        trainer = Trainer(default_root_dir=str(tmp_path), max_epochs=2,
                          accelerator="cpu", enable_progress_bar=False,
                          log_every_n_steps=0, model_parallel=model_parallel)
        trainer.fit(task, dm)
        return trainer

    t_dp = fit(1)
    t_ep = fit(2)

    w1 = t_ep.state.params["layer0"]["moe"]["w1"]
    assert w1.sharding.spec in (P("model"), P("model", None, None))
    assert t_ep.state.params["layer0"]["moe"]["router"].sharding.spec == P()

    for a, b in zip(jax.tree_util.tree_leaves(t_dp.state.params),
                    jax.tree_util.tree_leaves(t_ep.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4)
    np.testing.assert_allclose(t_dp.callback_metrics["validation/loss"],
                               t_ep.callback_metrics["validation/loss"],
                               rtol=1e-4)
