"""Device mesh construction and sharding helpers.

The reference's only distribution strategy is Lightning DDP data-parallel
(configs/trainer/default.yaml:10 `devices: -1`; SURVEY.md §2 parallelism
table). The TPU-native equivalent: one `jax.sharding.Mesh` with a `data` axis
over ICI; the jitted train step shards batches on `data` and replicates
params, and XLA inserts the gradient all-reduce. A `model` axis is provisioned
for tensor-parallel sharding of the second-stage LMs (used by the multichip
dry-run and available to large configs).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def resolve_devices(accelerator: str = "auto", devices: int = -1) -> list:
    """Map the reference trainer's accelerator/devices knobs to jax devices.

    accelerator="cpu" pins the process to the CPU platform BEFORE any backend
    initializes: merely asking for cpu devices would otherwise initialize the
    TPU client too, and the axon TPU tunnel is single-client — a debug run
    would steal (or deadlock on) the chip.
    """
    if accelerator == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass  # backends already initialized; fall through to device query
        try:
            devs = jax.devices("cpu")
        except RuntimeError:
            devs = jax.devices()
    else:
        devs = jax.devices()
    if devices is None or devices == -1:
        return devs
    return devs[: max(1, int(devices))]


def make_mesh(devices: list | None = None, model_parallel: int = 1) -> Mesh:
    """1-D data mesh (optionally folded into a (data, model) 2-D mesh)."""
    devs = devices if devices is not None else jax.devices()
    n = len(devs)
    mp = max(1, int(model_parallel))
    if n % mp != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={mp}")
    arr = np.asarray(devs).reshape(n // mp, mp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


_warned_pad = False


def shard_batch(mesh: Mesh, batch) -> jax.Array:
    """Host numpy batch → device array sharded over the data axis.

    Pads the batch to a multiple of the data-axis size if needed (only
    happens on non-drop_last loaders) by repeating the last example; batch-
    mean metrics over a padded batch are slightly biased toward it, so a
    one-time warning is emitted.
    """
    global _warned_pad
    arr = np.asarray(batch)
    n_data = mesh.shape[DATA_AXIS]
    if arr.shape[0] % n_data != 0:
        pad = n_data - arr.shape[0] % n_data
        arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)], axis=0)
        if not _warned_pad:
            _warned_pad = True
            import logging

            logging.getLogger(__name__).warning(
                "batch of %d padded to %d for the %d-way data mesh — "
                "batch-mean metrics include the duplicated tail example",
                arr.shape[0] - pad, arr.shape[0], n_data)
    return jax.device_put(arr, batch_sharding(mesh))


def is_main_process() -> bool:
    return jax.process_index() == 0
