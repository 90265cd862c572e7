#!/usr/bin/env python
"""One-off TPU measurement: where does the AudioBert train step spend time?

Times (lax.fori_loop on-device, one scalar fetched — see CLAUDE.md):
  encoder  — 22-chunk scan of the BERT encoder WITHOUT the MLM head
  mlm      — MLM transform + vocab logits matmul + argmax, per chunk scan
  full     — the real loss_fn fwd+bwd+AdamW step
Run: PYTHONPATH=/root/repo python tools/bench_bert_breakdown.py [bf16]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 16
W = 11000
ITERS = 5


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(np.asarray(out))
    return (time.perf_counter() - t0) / ITERS


def main():
    dtype = "bfloat16" if "bf16" in sys.argv else None
    from msla_tpu.models.bert import MAX_HIDDEN_SIZE, AudioBertTask

    task = AudioBertTask(learning_rate=2e-4, checkpoint_dir="/tmp/bb",
                         codebook="/tmp/none.csv", sample_rate=22000, frame_length=2,
                         num_embedding=512, compute_dtype=dtype)
    rng = np.random.default_rng(0)
    indices = jnp.asarray(rng.integers(0, 512, (BATCH, W)), jnp.int32)
    instruments = jnp.asarray(rng.standard_normal((BATCH, 4, 44000)), jnp.float32)
    params = task.init_variables(jax.random.PRNGKey(0), (indices, instruments))["params"]

    n_chunks = -(-W // MAX_HIDDEN_SIZE)
    padded = n_chunks * MAX_HIDDEN_SIZE
    tokens = jnp.pad(indices, ((0, 0), (0, padded - W)))
    attn = jnp.pad(jnp.ones((BATCH, W), jnp.float32), ((0, 0), (0, padded - W)))
    tokens = tokens.reshape(BATCH, n_chunks, MAX_HIDDEN_SIZE).swapaxes(0, 1)
    attn = attn.reshape(BATCH, n_chunks, MAX_HIDDEN_SIZE).swapaxes(0, 1)

    # --- encoder only (hidden states, no MLM head) ---
    from msla_tpu.nn.bert import BertEmbeddings, BertLayer

    c = task.config

    def encoder_only(p, tok, am):
        def apply_enc(t, a):
            # BertLayer takes a (B, S) key-padding mask (1.0 attend / 0.0 pad)
            x = BertEmbeddings(c, name="embeddings").apply(
                {"params": p["embeddings"]}, t)
            for i in range(c.num_hidden_layers):
                x = BertLayer(c, name=f"layer{i}").apply(
                    {"params": p[f"layer{i}"]}, x, a)
            return x

        def step(_, ta):
            t, a = ta
            return None, jnp.sum(apply_enc(t, a))

        _, s = jax.lax.scan(step, None, (tok, am))
        return jnp.sum(s)

    @jax.jit
    def enc_loop(p, tok, am):
        def body(i, carry):
            return carry + encoder_only(p, tok, am)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    t_enc = timed(enc_loop, params["bert"], tokens, attn)
    print(f"encoder-only scan: {t_enc*1e3:.1f} ms")

    # --- full bert forward (logits) + argmax, scan ---
    def mlm_chunked(p, tok, am):
        def step(_, ta):
            t, a = ta
            logits = task.bert.apply({"params": p}, t, a, deterministic=True)
            return None, jnp.argmax(logits, axis=-1).astype(jnp.int32)
        _, ids = jax.lax.scan(step, None, (tok, am))
        return jnp.sum(ids)

    @jax.jit
    def mlm_loop(p, tok, am):
        def body(i, carry):
            return carry + mlm_chunked(p, tok, am)
        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    t_mlm = timed(mlm_loop, params["bert"], tokens, attn)
    print(f"encoder+mlm+argmax scan: {t_mlm*1e3:.1f} ms (mlm head ≈ {(t_mlm-t_enc)*1e3:.1f} ms)")

    # --- full train step ---
    import optax

    tx = task.configure_optimizer()
    opt_state = tx.init(params)

    def train_step(p, o, idx, ins):
        (loss, _), grads = jax.value_and_grad(
            lambda q: task.loss_fn(q, (idx, ins), jax.random.PRNGKey(1)),
            has_aux=True)(p)
        updates, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o2, loss

    @jax.jit
    def full_loop(p, o, idx, ins):
        def body(i, carry):
            p, o, acc = carry
            p, o, loss = train_step(p, o, idx, ins)
            return p, o, acc + loss
        p, o, acc = jax.lax.fori_loop(0, ITERS, body, (p, o, jnp.float32(0.0)))
        return acc

    t_full = timed(full_loop, params, opt_state, indices, instruments)
    print(f"full train step: {t_full*1e3:.1f} ms  "
          f"({BATCH * W / t_full / 1e6:.2f} M codes/s)")


if __name__ == "__main__":
    main()
