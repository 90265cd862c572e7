"""Measure the per-epoch checkpoint stall for an Audio-BERT-shaped state.

The inter-epoch stall is the SYNCHRONOUS part of a background
`save_checkpoint`: the on-device encode (wire compression, if any) plus the
device→host fetch. This tool builds a train state with the Audio-BERT
byte layout (VERDICT r3 weak #5 / PERFORMANCE.md "Checkpoint-write overlap"):
a ~110 M-param frozen encoder subtree and a ~242 M-param trainable head with
Adam mu/nu — then times `save_checkpoint` under each profile:

  exact        everything fp32, no dedup (round-3 baseline behavior)
  frozen       frozen-subtree dedup only (sidecar written once per run)
  frozen+bf16  dedup + wire='bf16' (params+moments bf16 on the wire)
  frozen+q8    dedup + wire='q8'  (params bf16, moments block-int8)
  weights_only dedup + no optimizer state (Lightning save_weights_only)

Each profile saves TWICE into its own directory; the FIRST save pays the
sidecar, the SECOND is the steady-state per-epoch cost — that second save's
sync time is the number PERFORMANCE.md quotes. Run on the TPU host:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_ckpt_stall.py

CPU smoke (scaled down 100x):  JAX_PLATFORMS=cpu ... --scale 0.01
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _build_state(scale: float):
    import jax
    import jax.numpy as jnp

    # Audio-BERT byte layout (reference src/model/bert.py:33,40-41): frozen
    # bert-base encoder ~110 M params; trainable Conv1d(64->4,k4) +
    # Linear(T/8 -> T) = 5500*44000 head; Adam carries mu/nu for the head.
    def mat(r, c, key):
        return jax.random.normal(jax.random.PRNGKey(key),
                                 (max(1, int(r * scale)), c), jnp.float32)

    frozen = {f"layer_{i}": mat(9_200_000 // 768, 768, i) for i in range(12)}
    head = {"conv": mat(4 * 64 * 4, 1, 100),
            "linear": mat(5500, 44000, 101)}  # mat scales the row dim
    params = {"bert": frozen, "head": head}
    mu = {"head": {k: v * 0.1 for k, v in head.items()}}
    nu = {"head": {k: jnp.abs(v) * 0.01 for k, v in head.items()}}
    opt_state = {"mu": mu, "nu": nu, "count": jnp.array(3, jnp.int32)}
    jax.block_until_ready((params, opt_state))
    n_frozen = sum(x.size for x in jax.tree_util.tree_leaves(frozen))
    n_train = sum(x.size for x in jax.tree_util.tree_leaves((head, mu, nu)))
    print(f"state built: frozen {n_frozen/1e6:.0f}M params, "
          f"trainable+moments {n_train/1e6:.0f}M floats "
          f"({(n_frozen + n_train) * 4 / 1e9:.2f} GB fp32)", flush=True)
    return params, opt_state


PROFILES = (
    ("exact", dict(frozen_keys=(), wire=None)),
    ("frozen", dict(frozen_keys=("bert",), wire=None)),
    ("frozen+bf16", dict(frozen_keys=("bert",), wire="bf16")),
    ("frozen+q8", dict(frozen_keys=("bert",), wire="q8")),
    ("weights_only", dict(frozen_keys=("bert",), wire=None, weights_only=True)),
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0,
                    help="row-dim scale for CPU smokes (0.01 ~ 33 MB state)")
    ap.add_argument("--out", default=None, help="report path (default stdout only)")
    args = ap.parse_args()

    import jax

    # the axon sitecustomize overrides JAX_PLATFORMS=cpu; honor an explicit
    # cpu request BEFORE any backend init or this smoke claims the tunnel
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        jax.config.update("jax_platforms", "cpu")

    # eager device fills + the encode jits recompile remotely without the
    # persistent cache (CLAUDE.md trap: ~10 min before the first result)
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_msla")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from msla_tpu.train.checkpoint import save_checkpoint, wait_for_pending

    params, opt_state = _build_state(args.scale)
    root = Path(tempfile.mkdtemp(prefix="ckpt_stall_"))
    refresh = jax.jit(lambda x: x + 0, donate_argnums=0)
    rows = []
    for name, kw in PROFILES:
        kw = dict(kw)
        weights_only = kw.pop("weights_only", False)
        d = root / name.replace("+", "_")
        times = []
        for epoch in range(2):
            # Refresh every device leaf before each save. jax.Array caches its
            # host copy after the first device_get, so saving the SAME arrays
            # twice makes the second fetch free — a steady-state lie: the
            # trainer jits with donate_argnums=0 (train/trainer.py:417), so
            # real training emits fresh buffers every step and pays the
            # device→host fetch every save. `x + 0` makes a new buffer with
            # IDENTICAL content (ms of HBM bandwidth): the fetch accounting
            # becomes honest while the content-addressed frozen sidecar stays
            # write-once, exactly as in a real run where frozen values never
            # change but their buffers are re-donated. Donating the input
            # keeps peak HBM flat (no transient 2x of the 3.35 GB state —
            # measured ResourceExhausted through the tunnel without it); the
            # returned Array is a NEW object, so its host-copy cache is empty
            # either way.
            params, opt_state = jax.tree_util.tree_map(
                lambda x: refresh(x) if isinstance(x, jax.Array) else x,
                (params, opt_state))
            jax.block_until_ready((params, opt_state))
            t0 = time.perf_counter()
            save_checkpoint(d / "last.ckpt", params=params,
                            opt_state=None if weights_only else opt_state,
                            epoch=epoch, background=True, **kw)
            t_sync = time.perf_counter() - t0
            wait_for_pending()
            t_total = time.perf_counter() - t0
            times.append((t_sync, t_total))
        size = (d / "last.ckpt").stat().st_size
        sidecars = list(d.glob("frozen-*.ckpt"))
        side = sum(s.stat().st_size for s in sidecars)
        rows.append({"profile": name, "first_sync_s": round(times[0][0], 2),
                     "epoch_sync_s": round(times[1][0], 2),
                     "epoch_total_s": round(times[1][1], 2),
                     "ckpt_mb": round(size / 1e6, 1),
                     "sidecar_mb": round(side / 1e6, 1)})
        print(f"{name:>13}: per-epoch sync {times[1][0]:7.2f}s  "
              f"total {times[1][1]:7.2f}s  file {size/1e6:8.1f} MB"
              + (f"  (+sidecar {side/1e6:.1f} MB once)" if side else ""),
              flush=True)
    report = {"backend": jax.default_backend(), "scale": args.scale,
              "rows": rows}
    print(json.dumps(report))
    if args.out:
        Path(args.out).write_text(json.dumps(report, indent=1) + "\n")
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
