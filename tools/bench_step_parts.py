#!/usr/bin/env python
"""TPU bisection of the full VQ-VAE train step (batch 64, T=44000, bf16).

Times each stage fwd and fwd+bwd in isolation to find where the 43.9 ms
(round-1) goes. Run:
PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_step_parts.py [fp32]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

B, T = 64, 44000
ITERS = 10


def loop_time(body, *args):
    @jax.jit
    def loop(*a):
        def step(i, carry):
            return carry + body(carry, *a)
        return jax.lax.fori_loop(0, ITERS, step, jnp.float32(0.0))

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / ITERS


def main():
    dtype = None if "fp32" in sys.argv else "bfloat16"
    from msla_tpu.models.vqvae import VQVAETask
    from msla_tpu.ops.vq import vector_quantize

    task = VQVAETask(num_hidden=128, num_residual_layer=2, num_residual_hidden=32,
                     num_embedding=512, embedding_dim=64, commitment_cost=0.25,
                     learning_rate=1e-4, sample_rate=22000, checkpoint_dir="/tmp/sp",
                     codebook_file="/tmp/sp/cb.csv", compute_dtype=dtype)
    net = task.net
    rng = np.random.default_rng(0)
    stems = jnp.asarray(rng.standard_normal((B, 4, T)), jnp.float32)
    mixed = jnp.broadcast_to(stems.sum(axis=1, keepdims=True), stems.shape)
    params = net.init(jax.random.PRNGKey(0), mixed)["params"]
    tx = task.configure_optimizer()
    opt_state = tx.init(params)

    z = net.apply({"params": params}, mixed, method=type(net).encode)  # (B, W, D)
    w = z.shape[1]
    quantized = jnp.asarray(rng.standard_normal((B, w, 64)), jnp.float32)

    def dep(c, x):
        return x + c * 1e-12

    rows = []

    def row(name, t):
        rows.append((name, t))
        print(f"{name:<28s}: {t*1e3:7.2f} ms", flush=True)

    # full loss fwd
    row("loss fwd", loop_time(
        lambda c, p, m, s: task.loss_fn(p, (dep(c, m), s), jax.random.PRNGKey(1))[0] * 1e-9,
        params, mixed, stems))

    # full fwd+bwd (no optimizer)
    g = jax.grad(lambda p, m, s: task.loss_fn(p, (m, s), jax.random.PRNGKey(1))[0])
    row("loss fwd+bwd", loop_time(
        lambda c, p, m, s: g(p, dep(c, m), s)["vector_quantizer"]["codebook"][0, 0] * 1e-9,
        params, mixed, stems))

    # optimizer update alone
    grads = jax.jit(g)(params, mixed, stems)
    def opt_body(c, gr, o, p):
        up, o2 = tx.update(jax.tree_util.tree_map(lambda x: x + c * 1e-12, gr), o, p)
        p2 = optax.apply_updates(p, up)
        return p2["vector_quantizer"]["codebook"][0, 0] * 1e-9
    row("adam update", loop_time(opt_body, grads, opt_state, params))

    # encoder fwd / fwd+bwd
    row("encode fwd", loop_time(
        lambda c, p, m: net.apply({"params": p}, dep(c, m),
                                  method=type(net).encode)[0, 0, 0] * 1e-9,
        params, mixed))
    ge = jax.grad(lambda p, m: net.apply({"params": p}, m,
                                         method=type(net).encode).astype(jnp.float32).sum())
    row("encode fwd+bwd", loop_time(
        lambda c, p, m: ge(p, dep(c, m))["encoder"]["conv1"]["conv"]["kernel"][0, 0, 0] * 1e-9,
        params, mixed))

    # VQ fwd / fwd+bwd
    cb = params["vector_quantizer"]["codebook"]
    row("vq fwd", loop_time(
        lambda c, zz, cbk: vector_quantize(dep(c, zz), cbk, 0.25).embedding_loss * 1e-9,
        z, cb))

    def vq_loss(zz, cbk):
        r = vector_quantize(zz, cbk, 0.25)
        return r.embedding_loss + r.commitment_loss + r.quantized_ste.astype(jnp.float32).sum() * 1e-9

    gv = jax.grad(vq_loss, argnums=(0, 1))
    row("vq fwd+bwd", loop_time(
        lambda c, zz, cbk: gv(dep(c, zz), cbk)[1][0, 0] * 1e-9, z, cb))

    # decoder fwd / fwd+bwd (decode takes BCW (B, D, W))
    q_bcw = jnp.swapaxes(quantized, -1, -2)

    def dec_fwd(p, q):
        return net.apply({"params": p}, q, method=type(net).decode)
    row("decoder fwd", loop_time(
        lambda c, p, q: dec_fwd(p, dep(c, q))[0, 0, 0] * 1e-9, params, q_bcw))
    gd = jax.grad(lambda p, q: dec_fwd(p, q).astype(jnp.float32).sum())
    row("decoder fwd+bwd", loop_time(
        lambda c, p, q: gd(p, dep(c, q))["decoder"]["conv1"]["conv"]["kernel"][0, 0, 0] * 1e-9,
        params, q_bcw))

    # ---- VQ sub-components ----
    from msla_tpu.ops.vq import code_usage_perplexity, nearest_codes

    flat = z.reshape(-1, z.shape[-1])
    row("vq nearest_codes", loop_time(
        lambda c, f, cbk: nearest_codes(dep(c, f), cbk).astype(jnp.float32)[0] * 1e-9,
        flat, cb))
    idx = jax.jit(nearest_codes)(flat, cb)
    row("vq perplexity (scatter)", loop_time(
        lambda c, ii: code_usage_perplexity(
            ii + (c * 1e-12).astype(jnp.int32), 512) * 1e-9, idx))
    row("vq take+losses", loop_time(
        lambda c, ii, zz, cbk: (lambda qq: (
            0.25 * jnp.mean((jax.lax.stop_gradient(qq) - zz) ** 2)
            + jnp.mean((qq - jax.lax.stop_gradient(zz)) ** 2)))(
            jnp.take(cbk, ii + (c * 1e-12).astype(jnp.int32), axis=0
                     ).reshape(zz.shape)) * 1e-9,
        idx, z, cb))

    def cb_grad_loss(cbk, ii):
        return jnp.take(cbk, ii, axis=0).astype(jnp.float32).sum()

    gcb = jax.grad(cb_grad_loss)
    row("vq codebook-grad scatter", loop_time(
        lambda c, cbk, ii: gcb(cbk, ii + (c * 1e-12).astype(jnp.int32))[0, 0] * 1e-9,
        cb, idx))

    total = dict(rows)
    print(f"\nsum(enc+vq+dec fwd+bwd) = "
          f"{(total['encode fwd+bwd'] + total['vq fwd+bwd'] + total['decoder fwd+bwd'])*1e3:.2f} ms "
          f"vs loss fwd+bwd {total['loss fwd+bwd']*1e3:.2f} ms")


if __name__ == "__main__":
    main()
