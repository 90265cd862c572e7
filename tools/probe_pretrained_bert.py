#!/usr/bin/env python
"""Evidence probe: can THIS image produce pretrained bert-base-uncased weights?

The reference fine-tunes a *pretrained* HF MLM (reference src/model/bert.py:33
`BertForMaskedLM.from_pretrained("bert-base-uncased")`). Our converter
(tools/convert_hf_bert.py) maps those weights into the flax AudioBert; this
probe documents whether any source of the weights exists here, so the
random-init caveat in PARITY.md is backed by a committed artifact instead of
an unverified claim (round-2 VERDICT missing #2).

Checks, in order:
1. filesystem scan of every plausible offline location (HF caches, site-
   packages bundles, /opt //usr/share mirrors) for bert-base-uncased weight
   files;
2. `from_pretrained(..., local_files_only=True)` — the canonical offline path;
3. `from_pretrained("bert-base-uncased")` online, bounded by a socket timeout
   — documents the zero-egress failure mode.

Run:  python tools/probe_pretrained_bert.py | tee examples/pretrained_bert_probe.log
"""
from __future__ import annotations

import os
import socket
import sys
import time
from pathlib import Path

WEIGHT_NAMES = ("pytorch_model.bin", "model.safetensors", "flax_model.msgpack",
                "tf_model.h5")
CANDIDATE_ROOTS = [
    os.environ.get("HF_HOME", ""),
    os.environ.get("TRANSFORMERS_CACHE", ""),
    "~/.cache/huggingface", "/root/.cache/huggingface",
    "/opt", "/usr/share", "/usr/local/share", "/srv", "/data",
    "/root/.axon_site",
]


def scan_filesystem() -> list[str]:
    hits = []
    for root in CANDIDATE_ROOTS:
        if not root:
            continue
        base = Path(root).expanduser()
        if not base.exists():
            print(f"  [scan] {base}: does not exist")
            continue
        found = False
        for dirpath, dirnames, filenames in os.walk(base):
            if base in (Path("/opt"), Path("/usr/share"), Path("/usr/local/share")):
                # bound the walk: skip giant unrelated trees
                dirnames[:] = [d for d in dirnames
                               if "bert" in d.lower() or "hugg" in d.lower()
                               or "model" in d.lower() or "cache" in d.lower()
                               or Path(dirpath) == base]
            for fn in filenames:
                if fn in WEIGHT_NAMES or ("bert" in fn.lower() and
                                          fn.endswith((".bin", ".safetensors",
                                                       ".msgpack", ".h5"))):
                    hits.append(str(Path(dirpath) / fn))
                    found = True
        print(f"  [scan] {base}: {'HIT' if found else 'no bert weights'}")
    return hits


def try_local_files_only() -> str:
    try:
        from transformers import BertForMaskedLM

        t0 = time.perf_counter()
        BertForMaskedLM.from_pretrained("bert-base-uncased", local_files_only=True)
        return f"SUCCESS in {time.perf_counter() - t0:.1f}s"
    except Exception as err:
        return f"{type(err).__name__}: {str(err)[:400]}"


def try_online(timeout_s: float = 20.0) -> str:
    socket.setdefaulttimeout(timeout_s)
    try:
        from transformers import BertForMaskedLM

        t0 = time.perf_counter()
        BertForMaskedLM.from_pretrained("bert-base-uncased")
        return f"SUCCESS in {time.perf_counter() - t0:.1f}s"
    except Exception as err:
        return f"{type(err).__name__}: {str(err)[:400]}"


def main() -> int:
    print("pretrained bert-base-uncased availability probe")
    print(f"date: {time.strftime('%Y-%m-%d %H:%M:%S')}")
    print(f"HF_HOME={os.environ.get('HF_HOME')!r} "
          f"TRANSFORMERS_CACHE={os.environ.get('TRANSFORMERS_CACHE')!r} "
          f"HF_HUB_OFFLINE={os.environ.get('HF_HUB_OFFLINE')!r}")

    print("\n1. filesystem scan for weight files:")
    hits = scan_filesystem()
    for h in hits:
        print(f"  FOUND: {h}")
    if not hits:
        print("  → no bert-base-uncased weight file anywhere on this image")

    print("\n2. from_pretrained(local_files_only=True):")
    print(f"  {try_local_files_only()}")

    print("\n3. from_pretrained online (20 s socket timeout):")
    print(f"  {try_online()}")

    print("\nverdict:", "weights available — run tools/convert_hf_bert.py"
          if hits else
          "NO pretrained weights obtainable in this environment; every BERT "
          "run in this repo uses random init (documented in PARITY.md). The "
          "converter tools/convert_hf_bert.py is ready for an environment "
          "that has the weights.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
