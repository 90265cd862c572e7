#!/usr/bin/env python
"""Full Audio-BERT train step (batch 16, 22-chunk scan): flash attention vs
the XLA chain. Same methodology as bench.py's measure_bert_codes."""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import optax

from msla_tpu.models.bert import AudioBertTask

T = 44000
BERT_BATCH = 16
NUM_EMBEDDING = 512
ITERS = 5


def measure(use_flash, chunk_fold=None, compute_dtype="bfloat16"):
    w = T // 4
    task = AudioBertTask(learning_rate=2e-4, checkpoint_dir="/tmp/bench_b",
                         codebook="/tmp/does_not_exist.csv", sample_rate=22000,
                         frame_length=2, num_embedding=NUM_EMBEDDING,
                         compute_dtype=compute_dtype, use_flash=use_flash,
                         chunk_fold=chunk_fold)
    rng = np.random.default_rng(0)
    indices = jnp.asarray(rng.integers(0, NUM_EMBEDDING, (BERT_BATCH, w)), jnp.int32)
    instruments = jnp.asarray(rng.standard_normal((BERT_BATCH, 4, T)), jnp.float32)
    params = task.init_variables(jax.random.PRNGKey(0), (indices, instruments))["params"]
    tx = task.configure_optimizer()
    opt_state = tx.init(params)

    @jax.jit
    def loop(params, opt_state, idx, ins):
        def step(i, carry):
            p, o, acc = carry
            (loss, _), grads = jax.value_and_grad(
                lambda q: task.loss_fn(q, (idx, ins + acc * 1e-12),
                                       jax.random.PRNGKey(1)), has_aux=True)(p)
            updates, o2 = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o2, acc + loss * 1e-12
        _, _, acc = jax.lax.fori_loop(0, ITERS, step, (params, opt_state,
                                                       jnp.float32(0.0)))
        return acc

    float(loop(params, opt_state, indices, instruments))
    t0 = time.perf_counter()
    float(loop(params, opt_state, indices, instruments))
    dt = (time.perf_counter() - t0) / ITERS
    return dt * 1e3, BERT_BATCH * w / dt


def main():
    print("backend:", jax.default_backend())
    for use_flash, fold in ((True, None), (True, 1), (False, None), (False, 1)):
        ms, cps = measure(use_flash, fold)
        print(f"use_flash={use_flash} fold={fold or 'auto'}: "
              f"{ms:7.1f} ms/step, {cps/1e6:.3f} M codes/s")


if __name__ == "__main__":
    main()
