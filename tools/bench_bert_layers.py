#!/usr/bin/env python
"""Per-chunk BERT cost bisection with REAL loop-carried data dependencies.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_bert_layers.py [bf16]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B, S = 16, 512
ITERS = 10


def loop_time(body, *args):
    """body(carry, *args) -> scalar float; must consume carry. args are real
    jit operands (closures would bake 440 MB of params into the HLO and blow
    the remote-compile request limit)."""
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
    dtype = "bfloat16" if "bf16" in sys.argv else None
    from msla_tpu.nn.bert import BertConfig, BertForMaskedLM, BertEmbeddings, BertLayer

    c = BertConfig(compute_dtype=dtype)
    bert = BertForMaskedLM(c)
    rng = np.random.default_rng(0)
    tok = jnp.asarray(rng.integers(0, 512, (B, S)), jnp.int32)
    am = jnp.ones((B, S), jnp.float32)
    params = bert.init(jax.random.PRNGKey(0), tok)["params"]
    x0 = jnp.asarray(rng.standard_normal((B, S, c.hidden_size)), jnp.float32)
    mask0 = jnp.ones((B, S), jnp.float32)  # BertLayer key-padding mask: all-attend

    # one full chunk: ids out
    t = loop_time(lambda carry, p, tk, a: bert.apply(
        {"params": p}, tk + (carry * 1e-12).astype(jnp.int32), a,
        deterministic=True).sum() * 1e-12, params, tok, am)
    print(f"full chunk logits  : {t*1e3:7.2f} ms  (x22 = {t*22e3:6.0f} ms)")

    t = loop_time(lambda carry, p, tk, a: bert.apply(
        {"params": p}, tk + (carry * 1e-12).astype(jnp.int32), a,
        deterministic=True, return_mlm_hidden=True).sum() * 1e-12, params, tok, am)
    print(f"chunk mlm-hidden   : {t*1e3:7.2f} ms")

    # single encoder layer
    layer = BertLayer(c, name="layer0")
    t = loop_time(lambda carry, p, x, mask: layer.apply(
        {"params": p}, x + carry * 1e-12, mask,
        deterministic=True).sum() * 1e-12,
        params["layer0"], x0, mask0)
    print(f"one encoder layer  : {t*1e3:7.2f} ms  (x12x22 = {t*264e3:6.0f} ms)")

    # embeddings
    emb = BertEmbeddings(c, name="embeddings")
    t = loop_time(lambda carry, p, tk: emb.apply(
        {"params": p}, tk + (carry * 1e-12).astype(jnp.int32),
        deterministic=True).sum() * 1e-12, params["embeddings"], tok)
    print(f"embeddings         : {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
