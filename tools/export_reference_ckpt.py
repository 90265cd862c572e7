#!/usr/bin/env python
"""Export an msla_tpu checkpoint to a reference-loadable torch .ckpt.

The reverse of tools/convert_reference_ckpt.py: takes one of our msgpack
checkpoints (train/checkpoint.py) and writes a torch.save payload whose
'state_dict' loads directly into the reference's modules
(reference: src/main.py:65-66 `torch.load(...)['state_dict']` →
`vqvae.load_state_dict(...)`), so models trained here migrate back.

Usage:
    python tools/export_reference_ckpt.py --src logs/.../best_vqvae.ckpt \
        --out ref_vqvae.ckpt --family vqvae --num-residual-layer 2
    python tools/export_reference_ckpt.py --src logs/.../best_transformer.ckpt \
        --out ref_transformer.ckpt --family transformer --num-layers 4
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
    parser.add_argument("--family", choices=("vqvae", "transformer"),
                        default="vqvae")
    parser.add_argument("--num-residual-layer", type=int, default=2)
    parser.add_argument("--num-layers", type=int, default=4)
    args = parser.parse_args()

    import torch

    from msla_tpu.train.checkpoint import load_checkpoint
    from msla_tpu.utils.torch_compat import (transformer_params_to_torch,
                                             vqvae_params_to_torch)

    payload = load_checkpoint(args.src)
    params = payload["state_dict"]
    if args.family == "vqvae":
        sd = vqvae_params_to_torch(params, args.num_residual_layer)
    else:
        sd = transformer_params_to_torch(params, args.num_layers)
    # copy: msgpack_restore yields read-only arrays torch would alias
    torch.save({"state_dict": {k: torch.from_numpy(v.copy()) for k, v in sd.items()},
                "epoch": payload.get("epoch", 0),
                "global_step": payload.get("global_step", 0),
                "hyper_parameters": payload.get("hparams", {})}, args.out)
    print(f"wrote {args.out} ({len(sd)} tensors)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
