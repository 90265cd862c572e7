#!/usr/bin/env python
"""Batch-size throughput curve for SEPARATION INFERENCE (the serving path).

Train-side batch headroom is documented (tools/bench_batch_sweep.py: +25% at
128); this measures the same curve for the serving composite — mixture
encode → VQ → per-stem decode, losses DCE'd (reference vqvae.py:81-86 under
no_grad; inference.SourceSeparator._separate) — in the fp32 parity config
and the bf16 `experiment=fast_serving` config.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_separation_batch.py
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

T = 44000
ITERS = 20


def measure(batch: int, compute_dtype) -> float:
    from msla_tpu.models.vqvae import VQVAETask

    task = VQVAETask(num_hidden=128, num_residual_layer=2, num_residual_hidden=32,
                     num_embedding=512, embedding_dim=64, commitment_cost=0.25,
                     learning_rate=1e-4, sample_rate=22000, checkpoint_dir="/tmp/bs",
                     codebook_file="/tmp/bs/cb.csv", compute_dtype=compute_dtype)
    net, net_cls = task.net, type(task.net)
    rng = np.random.default_rng(0)
    stems = jnp.asarray(rng.standard_normal((batch, 4, T)), jnp.float32)
    mixture = jnp.broadcast_to(stems.sum(axis=1, keepdims=True), stems.shape)
    params = net.init(jax.random.PRNGKey(0), mixture)["params"]

    def body(carry, params, x):
        q = net.apply({"params": params}, x + carry * 1e-12,
                      method=net_cls.get_quantized).quantized
        out = net.apply({"params": params}, q, method=net_cls.decode)
        return out[0, 0, 0] * 1e-12

    @jax.jit
    def loop(params, x):
        def step(i, carry):
            return carry + body(carry, params, x)
        return jax.lax.fori_loop(0, ITERS, step, jnp.float32(0.0))

    float(loop(params, mixture))
    t0 = time.perf_counter()
    float(loop(params, mixture))
    dt = (time.perf_counter() - t0) / ITERS
    return batch * T / dt


def main():
    print(f"separation inference throughput (T={T}, {ITERS} on-device iters)")
    print("| batch | fp32 M samples/s | bf16 M samples/s |")
    print("|---|---|---|")
    for batch in (32, 64, 128, 256):
        row = []
        for dtype in (None, "bfloat16"):
            try:
                row.append(f"{measure(batch, dtype) / 1e6:.1f}")
            except Exception as err:
                row.append(f"FAILED {type(err).__name__}")
        print(f"| {batch} | {row[0]} | {row[1]} |")


if __name__ == "__main__":
    main()
