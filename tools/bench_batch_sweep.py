#!/usr/bin/env python
"""Batch-size throughput curve for the full VQ-VAE train step (bf16) —
locates the chip's samples/sec ceiling (PERFORMANCE.md).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_batch_sweep.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

T = 44000
ITERS = 10


def measure(batch: int) -> float:
    from msla_tpu.models.vqvae import VQVAETask

    task = VQVAETask(num_hidden=128, num_residual_layer=2, num_residual_hidden=32,
                     num_embedding=512, embedding_dim=64, commitment_cost=0.25,
                     learning_rate=1e-4, sample_rate=22000, checkpoint_dir="/tmp/bs",
                     codebook_file="/tmp/bs/cb.csv", compute_dtype="bfloat16")
    rng = np.random.default_rng(0)
    stems = jnp.asarray(rng.standard_normal((batch, 4, T)), jnp.float32)
    mixture = jnp.broadcast_to(stems.sum(axis=1, keepdims=True), stems.shape)
    params = task.init_variables(jax.random.PRNGKey(0), (mixture, stems))["params"]
    tx = task.configure_optimizer()
    opt_state = tx.init(params)

    @jax.jit
    def loop(params, opt_state, raw):
        def step(i, carry):
            p, o, acc = carry
            batch_t = (jnp.broadcast_to((raw + acc * 1e-12).sum(axis=1, keepdims=True),
                                        raw.shape), raw)
            (loss, _), grads = jax.value_and_grad(
                lambda q: task.loss_fn(q, batch_t, jax.random.PRNGKey(1)),
                has_aux=True)(p)
            updates, o2 = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o2, acc + loss * 1e-12
        _, _, acc = jax.lax.fori_loop(0, ITERS, step,
                                      (params, opt_state, jnp.float32(0.0)))
        return acc

    float(loop(params, opt_state, stems))
    t0 = time.perf_counter()
    float(loop(params, opt_state, stems))
    dt = (time.perf_counter() - t0) / ITERS
    return batch * T / dt


if __name__ == "__main__":
    for b in (16, 32, 64, 128):
        sps = measure(b)
        print(f"batch {b:4d}: {sps/1e6:8.2f} M samples/s  "
              f"({b * T / sps * 1e3:.2f} ms/step)", flush=True)
