"""Training-quality smoke: a short VQ-VAE run on synthetic stems must learn.

The reference has no tests at all (SURVEY.md §4); this guards the whole
train-step composition (batch transform + fwd/bwd + Adam) against silent
wiring bugs that finiteness checks would miss.

Parametrized over compute_dtype because bfloat16 is the BENCH HEADLINE
configuration (BASELINE.md "Precision of the headline"): the bf16 conv-stack
path must not merely stay finite (test_bf16 pins forward drift) but actually
CONVERGE with the same bounds as fp32, and land at a comparable final loss.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from msla_tpu.models.vqvae import VQVAETask


def _train(tmp_path, compute_dtype):
    task = VQVAETask(num_hidden=32, num_residual_layer=1, num_residual_hidden=16,
                     num_embedding=32, embedding_dim=16, commitment_cost=0.25,
                     learning_rate=3e-3, sample_rate=1000,
                     checkpoint_dir=str(tmp_path), codebook_file=str(tmp_path / "cb.csv"),
                     use_pallas=False, compute_dtype=compute_dtype)
    rng = np.random.default_rng(0)
    t = np.arange(1024) / 1000.0
    stems = np.stack([
        0.5 * np.sin(2 * np.pi * (55 * 2 ** i) * t) for i in range(4)
    ]).astype(np.float32)
    batch_np = np.stack([stems] * 8)  # (8, 4, 1024) — one fixed batch, fit it

    def transfer(raw):
        mix = jnp.sum(raw, axis=1, keepdims=True)
        return jnp.broadcast_to(mix, raw.shape), raw

    batch = transfer(jnp.asarray(batch_np))
    params = task.init_variables(jax.random.PRNGKey(0), batch)["params"]
    tx = task.configure_optimizer()
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: task.loss_fn(p, batch, jax.random.PRNGKey(1)), has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    losses = []
    for _ in range(200):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    return task, params, batch, losses


def test_vqvae_short_training_reduces_loss(tmp_path):
    """Both precisions converge AND land at comparable final losses — one
    test (not parametrized) so the cross-dtype comparison always runs,
    regardless of test selection or parallel scheduling."""
    final_losses = {}
    for compute_dtype in (None, "bfloat16"):
        task, params, batch, losses = _train(tmp_path, compute_dtype)
        assert np.isfinite(losses).all(), compute_dtype
        # VQ training spikes early while the codebook churns, then converges
        assert losses[-1] < 0.6 * losses[0], (
            f"no learning ({compute_dtype}): {losses[0]:.4f} -> {losses[-1]:.4f}")
        assert losses[-1] < 0.5 * losses[60], compute_dtype

        final = task.eval_metrics(params, batch, "validation")
        assert float(final["validation/loss"]) < losses[0]
        final_losses[compute_dtype] = losses[-1]

    # bf16 vs fp32 final-loss agreement: the reduced-precision conv stacks
    # must not change where training lands (identical data/seeds/steps)
    fp32, bf16 = final_losses[None], final_losses["bfloat16"]
    assert abs(fp32 - bf16) < 0.25 * max(fp32, bf16), (fp32, bf16)
