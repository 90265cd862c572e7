#!/usr/bin/env python
"""Do the Trainer's memory levers buy throughput on the chip? Measures the
bf16 VQ-VAE train step (reference scale, T=44000) at large batch under:

  plain      — the standard fused step (the PERFORMANCE.md curve anchor)
  accum kx   — the gradient-accumulation form (scan over k stacked
               microbatches, grads averaged, ONE Adam update — exactly what
               Trainer(accumulate_grad_batches=k) jits)
  remat      — jax.checkpoint around the loss (Trainer(remat=True))

The train-step throughput curve still rises at batch 128 (+25% over 64,
PERFORMANCE.md); this tool answers whether the levers extend it further or
whether the curve's knee is compute, not memory.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_memory_levers.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

# Same persistent compile cache as bench.py — without it every eager op in
# init_variables compiles remotely from scratch through the tunnel (~10 min
# before the first case even starts).
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_msla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T = 44000
ITERS = 10


def _task():
    from msla_tpu.models.vqvae import VQVAETask

    return VQVAETask(num_hidden=128, num_residual_layer=2, num_residual_hidden=32,
                     num_embedding=512, embedding_dim=64, commitment_cost=0.25,
                     learning_rate=1e-4, sample_rate=22000, checkpoint_dir="/tmp/ml",
                     codebook_file="/tmp/ml/cb.csv", compute_dtype="bfloat16")


def _state(task, batch):
    rng = np.random.default_rng(0)
    stems = jnp.asarray(rng.standard_normal((batch, 4, T)), jnp.float32)
    mixture = jnp.broadcast_to(stems.sum(axis=1, keepdims=True), stems.shape)
    params = task.init_variables(jax.random.PRNGKey(0), (mixture, stems))["params"]
    tx = task.configure_optimizer()
    return params, tx, tx.init(params), stems


def measure(batch: int, accum: int = 1, remat: bool = False) -> float:
    """samples/s for one optimizer step over `batch` examples (split into
    `accum` microbatches when accum > 1)."""
    task = _task()
    params, tx, opt_state, stems = _state(task, batch)
    micro = batch // accum
    raw0 = stems.reshape(accum, micro, 4, T) if accum > 1 else stems

    def loss_of(p, raw):
        b = (jnp.broadcast_to(raw.sum(axis=1, keepdims=True), raw.shape), raw)
        lf = lambda q: task.loss_fn(q, b, jax.random.PRNGKey(1))
        if remat:
            lf = jax.checkpoint(lf)
        return lf(p)

    @jax.jit
    def loop(params, opt_state, raw):
        def step(i, carry):
            p, o, acc = carry
            perturbed = raw + acc * 1e-12  # loop-carried data dependency
            if accum > 1:
                (loss, _), grads = jax.value_and_grad(
                    loss_of, has_aux=True)(p, perturbed[0])

                def body(c, r):
                    g_sum, l_sum = c
                    (l, _), g = jax.value_and_grad(loss_of, has_aux=True)(p, r)
                    return (jax.tree.map(jnp.add, g_sum, g), l_sum + l), None

                (grads, loss), _ = jax.lax.scan(body, (grads, loss), perturbed[1:])
                grads = jax.tree.map(lambda g: g / accum, grads)
                loss = loss / accum
            else:
                (loss, _), grads = jax.value_and_grad(
                    loss_of, has_aux=True)(p, perturbed)
            updates, o2 = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o2, acc + loss * 1e-12

        _, _, acc = jax.lax.fori_loop(0, ITERS, step,
                                      (params, opt_state, jnp.float32(0.0)))
        return acc

    float(loop(params, opt_state, raw0))
    t0 = time.perf_counter()
    float(loop(params, opt_state, raw0))
    dt = (time.perf_counter() - t0) / ITERS
    return batch * T / dt


if __name__ == "__main__":
    import sys

    cases = [
        ("plain  b=128", dict(batch=128)),
        ("plain  b=256", dict(batch=256)),
        ("accum  b=256 (2x128)", dict(batch=256, accum=2)),
        ("remat  b=256", dict(batch=256, remat=True)),
        ("plain  b=512", dict(batch=512)),
        ("remat  b=512", dict(batch=512, remat=True)),
        ("accum  b=512 (4x128)", dict(batch=512, accum=4)),
    ]
    if len(sys.argv) > 1:  # run a subset: indices into the case list
        cases = [cases[int(i)] for i in sys.argv[1:]]
    for name, kw in cases:
        try:
            sps = measure(**kw)
            ms = kw["batch"] * T / sps * 1e3
            print(f"{name:24s}: {sps / 1e6:8.2f} M samples/s  ({ms:.2f} ms/step)",
                  flush=True)
        except Exception as e:  # OOM at these shapes is itself the datapoint
            print(f"{name:24s}: FAILED — {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
