#!/usr/bin/env python
"""Convert a reference PyTorch-Lightning VQVAE checkpoint to our .ckpt format.

The reference distributes pretrained checkpoints via an external link
(reference: logs/best_checkpoint/link-to-pretrained-models.txt). Given such a
.ckpt (torch.save dict with 'state_dict'), this writes an equivalent
msla_tpu checkpoint whose params load into VQVAETask — enabling cross-stage
training and inference from reference-trained weights.

Usage:
    python tools/convert_reference_ckpt.py --src best_vqvae.ckpt \
        --out logs/best_checkpoint/best_vqvae.ckpt --num-residual-layer 2
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--num-residual-layer", type=int, default=2)
    args = parser.parse_args()

    import torch

    from msla_tpu.train.checkpoint import save_checkpoint
    from msla_tpu.utils.torch_compat import vqvae_params_from_torch

    payload = torch.load(args.src, map_location="cpu", weights_only=False)
    sd = payload.get("state_dict", payload)
    params = vqvae_params_from_torch(sd, num_residual_layer=args.num_residual_layer)
    save_checkpoint(args.out, params=params,
                    epoch=int(payload.get("epoch", 0)),
                    global_step=int(payload.get("global_step", 0)),
                    hparams=dict(payload.get("hyper_parameters", {}) or {}))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
