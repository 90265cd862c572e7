"""Single-file checkpoints (.ckpt) via flax msgpack serialization.

Mirrors the reference's Lightning checkpoint surface (reference:
src/main.py:63-66 loads `best_vqvae.ckpt['state_dict']`): each checkpoint is
one file holding a dict with `state_dict` (params), optimizer state, epoch,
global step and hparams, so cross-stage handoff paths
(best_vqvae.ckpt → transformer/bert training) map 1:1.
"""
from __future__ import annotations

import json
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from pathlib import Path
from typing import Any

import jax
import numpy as np
from flax import serialization

# Background checkpoint writes: the device→host fetch is always synchronous
# (the next donated train step mutates the buffers), but msgpack-serializing
# and writing a multi-GB Audio-BERT checkpoint takes minutes on a small host —
# `background=True` overlaps that part with the next epoch. One worker thread
# keeps writes ordered; per-path futures let readers/rewriters join first.
_executor: ThreadPoolExecutor | None = None
_pending: dict[str, Future] = {}
_lock = threading.Lock()


def _path_key(path: str | Path) -> str:
    # normalize so relative/absolute spellings of one file share a key
    return str(Path(path).expanduser().resolve())


def _submit(key: str, fn) -> Future:
    global _executor
    with _lock:
        if _executor is None:
            _executor = ThreadPoolExecutor(max_workers=1,
                                           thread_name_prefix="ckpt-write")
        fut = _executor.submit(fn)
        _pending[key] = fut
    return fut


def wait_for_pending(path: str | Path | None = None) -> None:
    """Block until the background write for `path` (or all writes) lands.

    A failed write re-raises its error here ONCE — the future is always
    dropped from the registry first, so a later save to the same path can
    retry instead of replaying a stale exception forever."""
    with _lock:
        if path is not None:
            key = _path_key(path)
            items = [(key, _pending.pop(key))] if key in _pending else []
        else:
            items = list(_pending.items())
            _pending.clear()
    errors = []
    for _, f in items:
        try:
            f.result()
        except Exception as err:  # surface once, after draining the rest
            errors.append(err)
    if errors:
        raise errors[0]


def _to_numpy_tree(tree: Any) -> Any:
    # to_state_dict flattens NamedTuple/dataclass pytrees (e.g. optax states)
    # into nested dicts msgpack can serialize. device_get (not per-leaf
    # np.asarray) starts every device→host copy async BEFORE blocking on the
    # first — through the axon tunnel a leaf-by-leaf fetch of BERT's ~200
    # params pays a relay round-trip each, minutes per checkpoint save.
    tree = serialization.to_state_dict(tree)
    return jax.tree_util.tree_map(np.asarray, jax.device_get(tree))


def save_checkpoint(path: str | Path, *, params: Any, opt_state: Any = None,
                    epoch: int = 0, global_step: int = 0,
                    hparams: dict | None = None,
                    callback_metrics: dict | None = None,
                    callbacks_state: list | None = None,
                    background: bool = False) -> None:
    # join any in-flight write to this file FIRST — both to keep writes
    # ordered and so at most one multi-GB host payload is resident at a time
    path = Path(path)
    wait_for_pending(path)
    payload = {
        "state_dict": _to_numpy_tree(params),
        "opt_state": _to_numpy_tree(opt_state) if opt_state is not None else {},
        "epoch": epoch,
        "global_step": global_step,
        "hparams": json.dumps(hparams or {}, default=str),
        "callback_metrics": {k: float(v) for k, v in (callback_metrics or {}).items()},
        # Lightning parity: callback state (early-stop patience, top-k heap)
        # rides in the checkpoint so resume doesn't reset it
        "callbacks": json.dumps(callbacks_state or [], default=str),
    }

    def _write():
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(path.suffix + ".tmp")
        tmp.write_bytes(serialization.msgpack_serialize(payload))
        tmp.replace(path)  # atomic on POSIX — a crash never corrupts the file

    if background:
        _submit(_path_key(path), _write)
    else:
        _write()


def load_checkpoint(path: str | Path) -> dict:
    wait_for_pending(path)  # an in-flight background write to this file
    payload = serialization.msgpack_restore(Path(path).read_bytes())
    payload["hparams"] = json.loads(payload.get("hparams") or "{}")
    payload["callbacks"] = json.loads(payload.get("callbacks") or "[]")
    return payload


def restore_params(path: str | Path, like: Any | None = None) -> Any:
    """Load `state_dict` params, optionally coerced to the structure of `like`."""
    params = load_checkpoint(path)["state_dict"]
    if like is not None:
        params = serialization.from_state_dict(like, params)
    return params
