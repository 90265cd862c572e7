"""Multi-device sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4:
replaces the reference's absent multi-node testing — assert sharded runs are
numerically identical to single-device runs)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msla_tpu.models.vqvae import VQVAETask
from msla_tpu.parallel.mesh import batch_sharding, make_mesh, replicated, shard_batch

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def make_task():
    return VQVAETask(num_hidden=16, num_residual_layer=1, num_residual_hidden=8,
                     num_embedding=16, embedding_dim=8, commitment_cost=0.25,
                     learning_rate=1e-3, sample_rate=4000, checkpoint_dir="/tmp/p",
                     codebook_file="/tmp/p/cb.csv", use_pallas=False)


def mixture(batch):
    mix = jnp.sum(batch, axis=1, keepdims=True)
    return jnp.broadcast_to(mix, batch.shape), batch


def test_mesh_construction_and_helpers():
    mesh = make_mesh(jax.devices()[:8], model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh1 = make_mesh(jax.devices()[:8])
    assert mesh1.shape == {"data": 8, "model": 1}
    arr = shard_batch(mesh1, np.ones((16, 4, 64), np.float32))
    assert arr.sharding.spec == P("data")


def test_data_parallel_step_matches_single_device():
    """Gradient step on an 8-way sharded batch == single-device step."""
    task = make_task()
    raw = np.random.default_rng(0).standard_normal((16, 4, 1024)).astype(np.float32)
    batch = mixture(jnp.asarray(raw))
    params = task.init_variables(jax.random.PRNGKey(0), batch)["params"]
    tx = task.configure_optimizer()
    opt_state = tx.init(params)

    def step(params, opt_state, raw):
        b = mixture(raw)
        (loss, _), grads = jax.value_and_grad(
            lambda p: task.loss_fn(p, b, jax.random.PRNGKey(1)), has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), loss

    # single device
    p1, loss1 = jax.jit(step)(params, opt_state, jnp.asarray(raw))

    # 8-way data parallel
    mesh = make_mesh(jax.devices()[:8])
    sharded = shard_batch(mesh, raw)
    params_r = jax.device_put(params, replicated(mesh))
    opt_r = jax.device_put(opt_state, replicated(mesh))
    p8, loss8 = jax.jit(step)(params_r, opt_r, sharded)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_sequence_parallel_step_matches_single_device():
    """Sequence parallelism (time axis sharded over `model`, XLA conv halo
    exchange) is a pure layout choice: step == single-device step."""
    task = make_task()
    raw = np.random.default_rng(4).standard_normal((8, 4, 1024)).astype(np.float32)
    batch = mixture(jnp.asarray(raw))
    params = task.init_variables(jax.random.PRNGKey(0), batch)["params"]
    tx = task.configure_optimizer()
    opt_state = tx.init(params)

    def step(params, opt_state, raw):
        b = mixture(raw)
        (loss, _), grads = jax.value_and_grad(
            lambda p: task.loss_fn(p, b, jax.random.PRNGKey(1)), has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), loss

    p1, loss1 = jax.jit(step)(params, opt_state, jnp.asarray(raw))

    mesh = make_mesh(jax.devices()[:8], model_parallel=4)  # data=2 × seq=4
    seq_sh = NamedSharding(mesh, P("data", None, "model"))
    p_sp, loss_sp = jax.jit(step)(jax.device_put(params, replicated(mesh)),
                                  jax.device_put(opt_state, replicated(mesh)),
                                  jax.device_put(raw, seq_sh))
    np.testing.assert_allclose(float(loss1), float(loss_sp), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p_sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_model_parallel_codebook_sharding():
    """VQ forward with the codebook sharded over the model axis matches
    the replicated result (XLA inserts the gather/collectives)."""
    from msla_tpu.ops.vq import vector_quantize

    mesh = make_mesh(jax.devices()[:8], model_parallel=2)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((256, 8)), jnp.float32)
    cb = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)

    want = vector_quantize(x, cb, 0.25, use_pallas=False)

    cb_sharded = jax.device_put(cb, NamedSharding(mesh, P("model", None)))
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    got = jax.jit(lambda a, c: vector_quantize(a, c, 0.25, use_pallas=False))(
        x_sharded, cb_sharded)

    np.testing.assert_array_equal(np.asarray(got.encoding_indices),
                                  np.asarray(want.encoding_indices))
    np.testing.assert_allclose(np.asarray(got.quantized_ste),
                               np.asarray(want.quantized_ste), rtol=1e-5, atol=1e-6)


class _ArrayDataModule:
    """Minimal datamodule over an in-memory (N, 4, T) stem array."""

    def __init__(self, data: np.ndarray, batch_size: int):
        self.batches = [data[i:i + batch_size]
                        for i in range(0, len(data) - batch_size + 1, batch_size)]

    def train_dataloader(self):
        return list(self.batches)

    def val_dataloader(self):
        return list(self.batches)

    def on_after_batch_transfer(self, batch):
        return mixture(batch)


def test_trainer_model_parallel_matches_replicated(tmp_path):
    """Trainer(model_parallel=2) must shard the codebook/wide kernels over the
    model axis AND produce numerically identical training to the replicated
    dp-only run (VERDICT round-1 item 4)."""
    from msla_tpu.train.trainer import Trainer

    rng = np.random.default_rng(2)
    data = rng.standard_normal((16, 4, 512)).astype(np.float32)

    def fit(model_parallel):
        task = make_task()
        dm = _ArrayDataModule(data, batch_size=8)
        trainer = Trainer(default_root_dir=str(tmp_path), max_epochs=2,
                          accelerator="cpu", enable_progress_bar=False,
                          log_every_n_steps=0, model_parallel=model_parallel)
        trainer.fit(task, dm)
        return trainer

    t_dp = fit(1)
    t_tp = fit(2)

    # the tp run actually sharded: codebook rows over `model`
    cb = t_tp.state.params["vector_quantizer"]["codebook"]
    assert cb.sharding.spec in (P("model"), P("model", None))
    # conv kernels with >=64 output channels would shard too; this tiny net
    # has none, so also check the opt state mirrors the param sharding
    mu_cb = t_tp.state.opt_state[0].mu["vector_quantizer"]["codebook"]
    assert mu_cb.sharding.spec in (P("model"), P("model", None))

    for a, b in zip(jax.tree_util.tree_leaves(t_dp.state.params),
                    jax.tree_util.tree_leaves(t_tp.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(t_dp.callback_metrics["validation/loss"],
                               t_tp.callback_metrics["validation/loss"], rtol=1e-4)


def test_trainer_zero1_matches_replicated(tmp_path):
    """Trainer(zero1=True) shards the Adam moments over the `data` axis
    (ZeRO-1) and must train identically to the replicated-state run —
    optimizer-state placement is a pure layout choice; XLA handles the
    reduce-scatter / all-gather the constraint implies."""
    from msla_tpu.train.trainer import Trainer

    rng = np.random.default_rng(11)
    data = rng.standard_normal((16, 4, 512)).astype(np.float32)

    def fit(zero1):
        task = make_task()
        dm = _ArrayDataModule(data, batch_size=8)
        trainer = Trainer(default_root_dir=str(tmp_path), max_epochs=2,
                          accelerator="cpu", enable_progress_bar=False,
                          log_every_n_steps=0, zero1=zero1)
        trainer.fit(task, dm)
        return trainer

    t_repl = fit(False)
    t_z1 = fit(True)

    # the moments actually sharded over `data` (codebook: 16x8, dim0 % 8 == 0)
    mu_cb = t_z1.state.opt_state[0].mu["vector_quantizer"]["codebook"]
    assert mu_cb.sharding.spec == P("data", None)
    # params stay replicated — zero1 touches only the optimizer state
    cb = t_z1.state.params["vector_quantizer"]["codebook"]
    assert cb.sharding.spec == P()

    for a, b in zip(jax.tree_util.tree_leaves(t_repl.state.params),
                    jax.tree_util.tree_leaves(t_z1.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(t_repl.state.opt_state),
                    jax.tree_util.tree_leaves(t_z1.state.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-6)
    np.testing.assert_allclose(t_repl.callback_metrics["validation/loss"],
                               t_z1.callback_metrics["validation/loss"],
                               rtol=1e-4)


def test_trainer_fsdp_matches_replicated(tmp_path):
    """Trainer(fsdp=True) shards the PARAMETERS (and, mirrored, the Adam
    moments) over the `data` axis (ZeRO-3 / fully-sharded data parallel) and
    must train identically to the replicated run — parameter placement is a
    pure layout choice; XLA inserts the per-use all-gather and the gradient
    reduce-scatter the sharding implies."""
    from msla_tpu.train.trainer import Trainer

    rng = np.random.default_rng(13)
    data = rng.standard_normal((16, 4, 512)).astype(np.float32)

    def fit(fsdp):
        task = make_task()
        dm = _ArrayDataModule(data, batch_size=8)
        trainer = Trainer(default_root_dir=str(tmp_path), max_epochs=2,
                          accelerator="cpu", enable_progress_bar=False,
                          log_every_n_steps=0, fsdp=fsdp)
        trainer.fit(task, dm)
        return trainer

    t_repl = fit(False)
    t_fsdp = fit(True)

    # params actually sharded over `data` (codebook: 16x8, dim0 % 8 == 0) …
    cb = t_fsdp.state.params["vector_quantizer"]["codebook"]
    assert cb.sharding.spec == P("data", None)
    # … and the moments mirror the param sharding (ZeRO-3, not just ZeRO-1)
    mu_cb = t_fsdp.state.opt_state[0].mu["vector_quantizer"]["codebook"]
    assert mu_cb.sharding.spec == P("data", None)

    for a, b in zip(jax.tree_util.tree_leaves(t_repl.state.params),
                    jax.tree_util.tree_leaves(t_fsdp.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-6)
    np.testing.assert_allclose(t_repl.callback_metrics["validation/loss"],
                               t_fsdp.callback_metrics["validation/loss"],
                               rtol=1e-4)


def test_fsdp_checkpoint_roundtrip(tmp_path):
    """A checkpoint written from fsdp-sharded state restores bit-identically
    (save gathers host-side; restore re-commits to the fsdp layout)."""
    from msla_tpu.train.trainer import Trainer

    rng = np.random.default_rng(14)
    data = rng.standard_normal((8, 4, 512)).astype(np.float32)
    task = make_task()
    trainer = Trainer(default_root_dir=str(tmp_path), max_epochs=1,
                      accelerator="cpu", enable_progress_bar=False,
                      log_every_n_steps=0, fsdp=True)
    trainer.fit(task, _ArrayDataModule(data, batch_size=8))
    ckpt = tmp_path / "fsdp.ckpt"
    trainer.save_checkpoint(ckpt)
    saved = jax.tree_util.tree_leaves(trainer.state.params)

    trainer2 = Trainer(default_root_dir=str(tmp_path), max_epochs=1,
                       accelerator="cpu", enable_progress_bar=False,
                       log_every_n_steps=0, fsdp=True)
    task2 = make_task()
    trainer2._build_state(task2, _ArrayDataModule(data, batch_size=8),
                          data[:8], ckpt_path=str(ckpt))
    cb = trainer2.state.params["vector_quantizer"]["codebook"]
    assert cb.sharding.spec == P("data", None)
    for a, b in zip(saved, jax.tree_util.tree_leaves(trainer2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_grad_accumulation_matches_big_batch(tmp_path):
    """accumulate_grad_batches=2 at batch 8 must train like batch 16: the
    in-jit scan averages the microbatch gradients before one optimizer
    update, which for mean-reduced losses is exactly the big-batch gradient
    (Lightning's accumulate_grad_batches semantics)."""
    from msla_tpu.train.trainer import Trainer

    rng = np.random.default_rng(17)
    data = rng.standard_normal((16, 4, 512)).astype(np.float32)

    def fit(batch_size, accumulate):
        task = make_task()
        dm = _ArrayDataModule(data, batch_size=batch_size)
        trainer = Trainer(default_root_dir=str(tmp_path), max_epochs=2,
                          accelerator="cpu", enable_progress_bar=False,
                          log_every_n_steps=0,
                          accumulate_grad_batches=accumulate)
        trainer.fit(task, dm)
        return trainer

    t_big = fit(16, 1)
    t_acc = fit(8, 2)
    # one optimizer step per epoch either way
    assert t_acc.global_step == t_big.global_step
    for a, b in zip(jax.tree_util.tree_leaves(t_big.state.params),
                    jax.tree_util.tree_leaves(t_acc.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-6)
    np.testing.assert_allclose(t_big.callback_metrics["validation/loss"],
                               t_acc.callback_metrics["validation/loss"],
                               rtol=1e-4)
    np.testing.assert_allclose(t_big.callback_metrics["train/loss"],
                               t_acc.callback_metrics["train/loss"],
                               rtol=1e-4)


def test_grad_accumulation_ragged_tail_steps_every_example(tmp_path):
    """A batch count not divisible by k still consumes every example: the
    short tail group flushes as a smaller stack and takes its own optimizer
    step (Lightning end-of-epoch semantics)."""
    from msla_tpu.train.trainer import Trainer

    rng = np.random.default_rng(18)
    data = rng.standard_normal((24, 4, 512)).astype(np.float32)  # 3 batches of 8
    task = make_task()
    dm = _ArrayDataModule(data, batch_size=8)
    trainer = Trainer(default_root_dir=str(tmp_path), max_epochs=1,
                      accelerator="cpu", enable_progress_bar=False,
                      log_every_n_steps=0, accumulate_grad_batches=2)
    trainer.fit(task, dm)
    assert trainer.global_step == 2  # (2-batch stack, 1-batch tail)
    assert np.isfinite(trainer.callback_metrics["train/loss"])


def test_trainer_fsdp_composes_with_tp_fit(tmp_path):
    """fsdp=True together with model_parallel=2: the codebook keeps its tp
    split AND gains the data split (P('model', 'data')) — and the composed
    run still trains identically to the replicated one."""
    from msla_tpu.train.trainer import Trainer

    rng = np.random.default_rng(16)
    data = rng.standard_normal((16, 4, 512)).astype(np.float32)

    def fit(**kw):
        task = make_task()
        dm = _ArrayDataModule(data, batch_size=8)
        trainer = Trainer(default_root_dir=str(tmp_path), max_epochs=2,
                          accelerator="cpu", enable_progress_bar=False,
                          log_every_n_steps=0, **kw)
        trainer.fit(task, dm)
        return trainer

    t_repl = fit()
    t_both = fit(fsdp=True, model_parallel=2)
    cb = t_both.state.params["vector_quantizer"]["codebook"]
    assert cb.sharding.spec == P("model", "data")
    for a, b in zip(jax.tree_util.tree_leaves(t_repl.state.params),
                    jax.tree_util.tree_leaves(t_both.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-6)
    np.testing.assert_allclose(t_repl.callback_metrics["validation/loss"],
                               t_both.callback_metrics["validation/loss"],
                               rtol=1e-4)


def test_trainer_remat_matches_plain(tmp_path):
    """Trainer(remat=True) rematerializes the forward during backward
    (jax.checkpoint) — an HBM/activation-residency choice that must leave the
    training trajectory bit-for-bit unchanged."""
    from msla_tpu.train.trainer import Trainer

    rng = np.random.default_rng(15)
    data = rng.standard_normal((16, 4, 512)).astype(np.float32)

    def fit(remat):
        task = make_task()
        dm = _ArrayDataModule(data, batch_size=8)
        trainer = Trainer(default_root_dir=str(tmp_path), max_epochs=2,
                          accelerator="cpu", enable_progress_bar=False,
                          log_every_n_steps=0, remat=remat)
        trainer.fit(task, dm)
        return trainer

    t_plain = fit(False)
    t_remat = fit(True)
    for a, b in zip(jax.tree_util.tree_leaves(t_plain.state.params),
                    jax.tree_util.tree_leaves(t_remat.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(t_plain.callback_metrics["validation/loss"],
                               t_remat.callback_metrics["validation/loss"],
                               rtol=1e-6)


def test_fsdp_composes_with_tensor_parallel_spec():
    """fsdp params INHERIT the tp spec and split a free dim over `data`
    (P('model', None) → P('model', 'data')); the mirrored moments pass
    through make_opt_shardings(zero1=True) UNCHANGED — no double-split of
    the `data` axis."""
    import optax

    from msla_tpu.parallel.mesh import make_opt_shardings, make_param_shardings

    mesh = make_mesh(jax.devices()[:8], model_parallel=2)  # data=4 x model=2
    params = {"vector_quantizer": {"codebook": jnp.zeros((16, 8))},
              "bias": jnp.zeros((3,)),  # 3 % 4 != 0 → stays replicated
              "scalar": jnp.zeros(())}
    p_sh = make_param_shardings(mesh, params, fsdp=True)
    assert p_sh["vector_quantizer"]["codebook"].spec == P("model", "data")
    assert p_sh["bias"].spec == P()
    assert p_sh["scalar"].spec == P()
    tx = optax.adam(1e-3)
    o_sh = make_opt_shardings(mesh, tx, params, p_sh, zero1=True)
    assert o_sh[0].mu["vector_quantizer"]["codebook"].spec == P("model", "data")
    assert o_sh[0].mu["bias"].spec == P()


def test_zero1_composes_with_tensor_parallel_spec():
    """zero1 moments INHERIT the tp spec and split a free dim over `data`:
    a tp-sharded codebook P('model', None) gets moments P('model', 'data')."""
    import optax

    from msla_tpu.parallel.mesh import make_opt_shardings, make_param_shardings

    mesh = make_mesh(jax.devices()[:8], model_parallel=2)  # data=4 x model=2
    params = {"vector_quantizer": {"codebook": jnp.zeros((16, 8))},
              "scalar": jnp.zeros(())}
    tx = optax.adam(1e-3)
    p_sh = make_param_shardings(mesh, params)
    assert p_sh["vector_quantizer"]["codebook"].spec == P("model", None)
    o_sh = make_opt_shardings(mesh, tx, params, p_sh, zero1=True)
    assert o_sh[0].mu["vector_quantizer"]["codebook"].spec == P("model", "data")
    # indivisible / scalar leaves keep their (replicated) spec
    assert o_sh[0].mu["scalar"].spec == P()


class _TransformerDataModule:
    """Minimal (quantized, instruments) datamodule over in-memory stems."""

    def __init__(self, data: np.ndarray, batch_size: int):
        self.batches = [data[i:i + batch_size]
                        for i in range(0, len(data) - batch_size + 1, batch_size)]

    def train_dataloader(self):
        return list(self.batches)

    def val_dataloader(self):
        return list(self.batches)

    def on_after_batch_transfer(self, batch):
        b = batch.shape[0]
        quantized = batch[:, :2, :].reshape(b, 8, 32)
        return quantized, batch


def test_trainer_pipeline_parallel_matches_sequential(tmp_path):
    """Trainer(pipeline_parallel=2) trains the transformer through the
    shard_map+ppermute microbatch pipeline and must match the plain dp run
    exactly (dropout=0.0 so the deterministic pipelined forward and the
    standard loss_fn compute the same function)."""
    from msla_tpu.models.transformer import TransformerTask
    from msla_tpu.train.trainer import Trainer

    rng = np.random.default_rng(7)
    data = rng.standard_normal((16, 4, 128)).astype(np.float32)

    def fit(pipeline_parallel):
        task = TransformerTask(sample_rate=64, frame_length=2, learning_rate=1e-3,
                               checkpoint_dir=str(tmp_path), num_layers=2,
                               num_heads=2, hidden_dim=16, dropout=0.0)
        dm = _TransformerDataModule(data, batch_size=8)
        trainer = Trainer(default_root_dir=str(tmp_path), max_epochs=2,
                          accelerator="cpu", enable_progress_bar=False,
                          log_every_n_steps=0,
                          pipeline_parallel=pipeline_parallel,
                          pipeline_microbatches=2)
        trainer.fit(task, dm)
        return trainer

    t_dp = fit(1)
    t_pp = fit(2)
    assert t_pp.mesh.shape == {"data": 4, "model": 2}
    # fp32 reduction-order noise amplified through 4 Adam steps (measured
    # max-abs 5e-5 on this config) — losses still agree to 7 digits below
    for a, b in zip(jax.tree_util.tree_leaves(t_dp.state.params),
                    jax.tree_util.tree_leaves(t_pp.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4)
    np.testing.assert_allclose(t_dp.callback_metrics["validation/loss"],
                               t_pp.callback_metrics["validation/loss"],
                               rtol=1e-4)


def test_trainer_pipeline_parallel_rejects_unsupported(tmp_path):
    """pp on a task without a pipeline path fails loudly, and tp+pp on one
    mesh is rejected at construction."""
    from msla_tpu.train.trainer import Trainer

    with pytest.raises(ValueError, match="model.*axis"):
        Trainer(accelerator="cpu", model_parallel=2, pipeline_parallel=2)
    with pytest.raises(ValueError, match="fsdp"):
        Trainer(accelerator="cpu", fsdp=True, pipeline_parallel=2)

    task = make_task()  # VQVAETask: supports_pipeline is False
    rng = np.random.default_rng(8)
    data = rng.standard_normal((8, 4, 512)).astype(np.float32)
    trainer = Trainer(default_root_dir=str(tmp_path), max_epochs=1,
                      accelerator="cpu", enable_progress_bar=False,
                      log_every_n_steps=0, pipeline_parallel=2)
    with pytest.raises(ValueError, match="pipeline"):
        trainer.fit(task, _ArrayDataModule(data, batch_size=8))


def test_ragged_batch_eval_is_exact():
    """Non-drop_last loaders: ragged final batches are fed replicated (no
    padding) and epoch metrics are example-weighted — zero padded-row bias
    (VERDICT round-1 item 9)."""
    from msla_tpu.train.trainer import Trainer

    mesh = make_mesh(jax.devices()[:8])
    ragged = np.arange(3 * 4 * 8, dtype=np.float32).reshape(3, 4, 8)
    arr = shard_batch(mesh, ragged)  # 3 % 8 != 0 → replicated, unpadded
    assert arr.shape == (3, 4, 8)
    assert arr.sharding.spec == P()

    trainer = Trainer(accelerator="cpu", enable_progress_bar=False,
                      log_every_n_steps=0)
    b1 = np.full((8, 4, 8), 1.0, np.float32)
    b2 = np.full((3, 4, 8), 12.0, np.float32)

    class FakeModel:
        def on_validation_batch_end(self, *a):
            pass

    def eval_fn(params, batch):
        return {"m": jnp.mean(batch)}

    trainer._state = type("S", (), {"params": {}})()
    out = trainer._run_eval(FakeModel(), None, [b1, b2], eval_fn, "test", 1.0)
    np.testing.assert_allclose(out["m"], (8 * 1.0 + 3 * 12.0) / 11.0, rtol=1e-6)


def test_graft_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_resolve_devices_multiprocess_local_semantics(monkeypatch):
    """Under multi-process, trainer.devices counts PER-PROCESS local devices
    (Lightning per-node semantics) and the resolved list stays GLOBAL and
    rank-identical — slicing the global list handed non-rank-0 processes a
    mesh with zero addressable devices (the debug=default `devices: 1`
    2-process crash: StopIteration from empty addressable_shards)."""
    from types import SimpleNamespace

    from msla_tpu.parallel.mesh import resolve_devices

    fake = [SimpleNamespace(id=i, process_index=i // 4) for i in range(8)]
    monkeypatch.setattr(jax, "devices", lambda *a: fake)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    got = resolve_devices("tpu", devices=1)
    assert [(d.process_index, d.id) for d in got] == [(0, 0), (1, 4)]
    got = resolve_devices("tpu", devices=3)
    assert [(d.process_index, d.id) for d in got] == [
        (0, 0), (0, 1), (0, 2), (1, 4), (1, 5), (1, 6)]
    assert len(resolve_devices("tpu", devices=-1)) == 8  # -1 = all, unchanged
