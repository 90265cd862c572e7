#!/usr/bin/env python
"""One-time offline HF → flax BERT weight conversion.

The reference downloads bert-base-uncased at model construction
(reference: src/model/bert.py:33). This environment has no network, so the
pretrained load is a separate, explicitly-run step: point this script at a
local HF checkpoint (a directory with pytorch_model.bin/safetensors + config,
or anything transformers can load offline) and it writes the msgpack params
file AudioBertTask reads (configs/model/bert.yaml: pretrained_weights).

Usage:
    python tools/convert_hf_bert.py --src bert-base-uncased \
        --out logs/pretrained/bert-base-uncased.msgpack
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", default="bert-base-uncased",
                        help="HF model id or local checkpoint path")
    parser.add_argument("--out", default="logs/pretrained/bert-base-uncased.msgpack")
    parser.add_argument("--num-layers", type=int, default=12)
    args = parser.parse_args()

    from flax import serialization
    from transformers import BertForMaskedLM

    from msla_tpu.utils.torch_compat import bert_params_from_hf

    model = BertForMaskedLM.from_pretrained(args.src)
    params = bert_params_from_hf(model.state_dict(), num_layers=args.num_layers)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(serialization.msgpack_serialize(params))
    print(f"wrote {out} ({out.stat().st_size / 1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
