#!/usr/bin/env python
"""Offline torchvision VGG16 → flax weight conversion for PerceptualLoss.

Usage:
    python tools/convert_vgg16.py --src /path/to/vgg16-*.pth \
        --out logs/pretrained/vgg16_features.msgpack
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", required=True,
                        help="torchvision vgg16 state_dict .pth (or 'torchvision' "
                             "to pull from a local torchvision cache)")
    parser.add_argument("--out", default="logs/pretrained/vgg16_features.msgpack")
    args = parser.parse_args()

    import torch
    from flax import serialization

    from msla_tpu.utils.torch_compat import vgg16_params_from_torch

    if args.src == "torchvision":
        from torchvision.models import vgg16

        sd = vgg16(weights="DEFAULT").state_dict()
    else:
        sd = torch.load(args.src, map_location="cpu")
    params = vgg16_params_from_torch(sd)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(serialization.msgpack_serialize(params))
    print(f"wrote {out} ({out.stat().st_size / 1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
