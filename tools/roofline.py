"""MFU / roofline accounting for every bench composite (VERDICT r2 next #8).

For each composite in bench.py's catalog, builds the SAME single-step graph at
the SAME shapes, compiles it, and reads XLA's cost analysis for the algorithmic
FLOP count. Combined with the measured TPU step time (PERFORMANCE.md,
bench.py on v5e-1) this yields achieved TF/s and %-of-peak — turning the
remaining headroom into a number instead of a guess.

Methodology notes:
  - FLOPs come from `jit(fn).lower(args).compile().cost_analysis()["flops"]`
    on the CPU backend: the count is algorithmic (matmul/conv/elementwise
    FLOPs of the optimized HLO), not hardware-specific; CPU vs TPU fusion
    differences perturb only the elementwise tail.
  - Peak = 197 TF/s (v5e bf16 MXU). The fp32 rows use the same peak: both
    XLA on TPU and Mosaic lower f32 dots/convs in the bf16-class 'medium'
    precision envelope (the same envelope the torch reference opts into via
    torch.set_float32_matmul_precision('medium'), src/main.py:23).
  - Low MFU on the conv stacks is an HBM-bandwidth statement, not waste:
    4→128-channel width-44k conv chains at batch 64 move far more bytes per
    FLOP than the MXU's compute:bandwidth balance point (v5e: 197 TF/s vs
    0.82 TB/s → ~240 flops/byte). The byte column is counted on the UNFUSED
    CPU HLO, so it is an upper bound on traffic — measured times BELOW the
    bytes/bandwidth line quantify XLA's TPU fusion wins, they do not break
    physics.

Usage: JAX_PLATFORMS=cpu python tools/roofline.py   (prints a markdown table)
"""
from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

import bench

PEAK_TFLOPS = 197.0  # v5e bf16 MXU
HBM_TBPS = 0.82      # v5e HBM bandwidth

# Measured step times on v5e-1 (PERFORMANCE.md round-2/3 tables; bench.py
# methodology: ITERS on-device iterations inside one jit).
MEASURED_MS = {
    "train step bf16": 45.9,
    "train step fp32": 62.9,
    "separation inference": 19.8,
    "encode+VQ forward": 9.35,
    "transformer forward": 6.12,
    # 22.7 M codes/s (PERFORMANCE.md) → 64·11000 / 22.7e6 = 31.0 ms
    "transformer train step": 31.0,
}


def _cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):  # older jax returns one dict per computation
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def train_step(compute_dtype=None):
    task = bench._make_vqvae_task(compute_dtype)
    rng = np.random.default_rng(0)
    stems = jnp.asarray(rng.standard_normal((bench.BATCH, 4, bench.T)), jnp.float32)
    mixture = jnp.broadcast_to(stems.sum(axis=1, keepdims=True), stems.shape)
    params = task.init_variables(jax.random.PRNGKey(0), (mixture, stems))["params"]
    tx = task.configure_optimizer()
    opt_state = tx.init(params)

    def step(params, opt_state, raw):
        batch = (jnp.broadcast_to(raw.sum(axis=1, keepdims=True), raw.shape), raw)
        (loss, _), grads = jax.value_and_grad(
            lambda q: task.loss_fn(q, batch, jax.random.PRNGKey(1)),
            has_aux=True)(params)
        updates, o2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), o2, loss

    return _cost(step, params, opt_state, stems)


def separation():
    task = bench._make_vqvae_task()
    net, net_cls = task.net, type(task.net)
    rng = np.random.default_rng(0)
    stems = jnp.asarray(rng.standard_normal((bench.BATCH, 4, bench.T)), jnp.float32)
    mixture = jnp.broadcast_to(stems.sum(axis=1, keepdims=True), stems.shape)
    params = net.init(jax.random.PRNGKey(0), mixture)["params"]

    def fwd(params, x):
        q = net.apply({"params": params}, x, method=net_cls.get_quantized).quantized
        return net.apply({"params": params}, q, method=net_cls.decode)

    return _cost(fwd, params, mixture)


def encode_vq():
    from msla_tpu.ops.vq import vector_quantize

    task = bench._make_vqvae_task()
    net = task.net
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((bench.BATCH, 4, bench.T)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)["params"]

    def fwd(params, x):
        z = net.apply({"params": params}, x, method=type(net).encode)
        res = vector_quantize(z, params["vector_quantizer"]["codebook"], 0.25,
                              use_pallas=False)
        return res.encoding_indices

    return _cost(fwd, params, x)


def transformer_fwd():
    from msla_tpu.models.transformer import TransformerTask

    task = TransformerTask(sample_rate=22000, frame_length=2, learning_rate=1e-4,
                           checkpoint_dir="/tmp/bench_t")
    w = bench.T // 4
    rng = np.random.default_rng(0)
    quantized = jnp.asarray(rng.standard_normal((bench.BATCH, bench.EMBEDDING_DIM, w)),
                            jnp.float32)
    params = task.net.init(jax.random.PRNGKey(0), quantized)["params"]

    def fwd(params, q):
        return task.net.apply({"params": params}, q, deterministic=True)

    return _cost(fwd, params, quantized)


def transformer_train():
    from msla_tpu.models.transformer import TransformerTask

    task = TransformerTask(sample_rate=22000, frame_length=2, learning_rate=1e-4,
                           checkpoint_dir="/tmp/bench_t")
    w = bench.T // 4
    rng = np.random.default_rng(0)
    quantized = jnp.asarray(rng.standard_normal((bench.BATCH, bench.EMBEDDING_DIM, w)),
                            jnp.float32)
    instruments = jnp.asarray(rng.standard_normal((bench.BATCH, 4, bench.T)),
                              jnp.float32)
    params = task.init_variables(jax.random.PRNGKey(0),
                                 (quantized, instruments))["params"]
    tx = task.configure_optimizer()
    opt_state = tx.init(params)

    def step(params, opt_state, q, ins):
        (loss, _), grads = jax.value_and_grad(
            lambda p: task.loss_fn(p, (q, ins), jax.random.PRNGKey(1)),
            has_aux=True)(params)
        updates, o2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), o2, loss

    return _cost(step, params, opt_state, quantized, instruments)


def main():
    rows = [
        ("train step bf16", train_step("bfloat16")),
        ("train step fp32", train_step(None)),
        ("separation inference", separation()),
        ("encode+VQ forward", encode_vq()),
        ("transformer forward", transformer_fwd()),
        ("transformer train step", transformer_train()),
    ]
    print("| composite | GFLOPs | GB moved | measured ms | achieved TF/s | "
          "MFU (197 TF/s) | no-fusion byte bound ms |")
    print("|---|---|---|---|---|---|---|")
    for name, (flops, bbytes) in rows:
        ms = MEASURED_MS[name]
        tfs = flops / (ms / 1e3) / 1e12
        mfu = 100.0 * tfs / PEAK_TFLOPS
        bw_ms = bbytes / (HBM_TBPS * 1e12) * 1e3
        print(f"| {name} | {flops/1e9:.1f} | {bbytes/1e9:.2f} | {ms:.1f} | "
              f"{tfs:.1f} | {mfu:.1f}% | {bw_ms:.1f} |")
    print()
    print("(BERT train step: 22-chunk fold, measured 240.7 ms vs ~215 ms "
          "bf16-FLOP floor ≈ 90% MXU — PERFORMANCE.md 'BERT step' section.)")


if __name__ == "__main__":
    main()
