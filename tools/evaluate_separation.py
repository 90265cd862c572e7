#!/usr/bin/env python
"""Standalone source-separation evaluation from a trained checkpoint.

BASELINE.json config: "source separation eval: mixture encode → per-stem
decode, SI-SDR on Slakh test". Runs the full reference metric catalog
(SI-SDR/L1/L2 per stem + full audio) over a test directory without composing
a training run.

Usage:
    python tools/evaluate_separation.py --ckpt logs/best_checkpoint/best_vqvae.ckpt \
        --data-dir /path/to/slakh2100/test --sample-rate 22000 --batch-size 16
"""
from __future__ import annotations

import argparse
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--sample-rate", type=int, default=22000)
    parser.add_argument("--frame-duration", type=int, default=2)
    parser.add_argument("--max-duration", type=int, default=120)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--limit-batches", type=int, default=0, help="0 = all")
    parser.add_argument("--num-hidden", type=int, default=128)
    parser.add_argument("--num-residual-layer", type=int, default=2)
    parser.add_argument("--num-residual-hidden", type=int, default=32)
    parser.add_argument("--num-embedding", type=int, default=512)
    parser.add_argument("--embedding-dim", type=int, default=64)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from msla_tpu.data.dataset import SlakhDataset
    from msla_tpu.data.loader import DataLoader
    from msla_tpu.models.vqvae import VQVAETask
    from msla_tpu.train.checkpoint import restore_params

    task = VQVAETask(num_hidden=args.num_hidden,
                     num_residual_layer=args.num_residual_layer,
                     num_residual_hidden=args.num_residual_hidden,
                     num_embedding=args.num_embedding,
                     embedding_dim=args.embedding_dim,
                     commitment_cost=0.25, learning_rate=1e-4,
                     sample_rate=args.sample_rate, checkpoint_dir="/tmp/eval",
                     codebook_file="/tmp/eval_cb.csv")
    params = restore_params(args.ckpt)

    dataset = SlakhDataset(args.data_dir,
                           target_sample_duration=args.frame_duration,
                           target_sample_rate=args.sample_rate,
                           max_duration=args.max_duration,
                           maximum_dataset_size=150000)
    loader = DataLoader(dataset, batch_size=args.batch_size, drop_last=True)

    @jax.jit
    def eval_step(params, raw):
        mixture = jnp.sum(raw, axis=1, keepdims=True)
        batch = (jnp.broadcast_to(mixture, raw.shape), raw)
        return task.eval_metrics(params, batch, "test")

    sums: dict = defaultdict(float)
    count = 0
    for batch_idx, raw in enumerate(loader):
        if args.limit_batches and batch_idx >= args.limit_batches:
            break
        metrics = eval_step(params, jnp.asarray(raw))
        for key, value in metrics.items():
            sums[key] += float(value)
        count += 1

    report = {k: v / max(count, 1) for k, v in sorted(sums.items())}
    report["num_batches"] = count
    report["num_frames"] = count * args.batch_size
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
