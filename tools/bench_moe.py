#!/usr/bin/env python
"""MoE vs dense transformer train step on the TPU (PERFORMANCE.md).

Same composite as bench.py's measure_transformer_train (reference:
src/model/transformer.py:40-54 + :206-209), with the dense ReLU FFN swapped
for the top-2 routed 8-expert MoE (nn/moe.py). Single-chip: the expert stacks
stay resident (no ep sharding); this measures the dispatch/combine einsum +
routing overhead against the dense baseline at iso hidden/d_ff.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_moe.py
"""
import time

import numpy as np

T = 44000
BATCH = 16
EMBEDDING_DIM = 64
ITERS = 10


def measure(moe_experts: int) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from msla_tpu.models.transformer import TransformerTask

    task = TransformerTask(sample_rate=22000, frame_length=2, learning_rate=1e-4,
                           checkpoint_dir="/tmp/bench_moe",
                           moe_experts=moe_experts)
    w = T // 4
    rng = np.random.default_rng(0)
    quantized = jnp.asarray(rng.standard_normal((BATCH, EMBEDDING_DIM, w)), jnp.float32)
    instruments = jnp.asarray(rng.standard_normal((BATCH, 4, T)), jnp.float32)
    params = task.init_variables(jax.random.PRNGKey(0), (quantized, instruments))["params"]
    tx = task.configure_optimizer()
    opt_state = tx.init(params)

    @jax.jit
    def loop(params, opt_state, q, ins):
        def step(i, carry):
            p, o, acc = carry
            (loss, _), grads = jax.value_and_grad(
                lambda pp: task.loss_fn(pp, (q + acc * 1e-12, ins),
                                        jax.random.PRNGKey(1)), has_aux=True)(p)
            updates, o2 = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o2, acc + loss * 1e-12
        _, _, acc = jax.lax.fori_loop(0, ITERS, step, (params, opt_state,
                                                       jnp.float32(0.0)))
        return acc

    float(loop(params, opt_state, quantized, instruments))
    t0 = time.perf_counter()
    float(loop(params, opt_state, quantized, instruments))
    dt = (time.perf_counter() - t0) / ITERS
    return BATCH * (T // 4) / dt


if __name__ == "__main__":
    for e in (0, 8):
        cps = measure(e)
        label = "dense FFN " if e == 0 else f"MoE E={e} k=2"
        print(f"{label}: {cps / 1e6:8.2f} M codes/s "
              f"({BATCH * (T // 4) / cps * 1e3:.1f} ms/step)",
              flush=True)
