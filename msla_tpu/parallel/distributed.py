"""Multi-host (DCN) runtime initialization.

The reference's multi-node story is Lightning DDP config (`num_nodes`,
`devices: -1` — configs/hparams_search/optuna.yaml:13-15) with the NCCL
backend implicit. The JAX-native equivalent is the standard distributed
runtime: every host calls `jax.distributed.initialize`, after which
`jax.devices()` spans the whole slice and the same pjit programs scale —
gradients reduce over ICI within a host's chips and over DCN across hosts,
with XLA choosing the collective routing.

Call `setup_distributed()` before any backend initialization (e.g. first
thing in main()) when launching under a multi-host scheduler; on a single
host it is a no-op.
"""
from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)


def setup_distributed(coordinator_address: str | None = None,
                      num_processes: int | None = None,
                      process_id: int | None = None) -> bool:
    """Initialize the multi-host JAX runtime; returns True if distributed.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) or scheduler auto-detection (TPU pods
    populate these automatically).
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")

    if num_processes in (None, 1) and coordinator_address is None:
        return False

    import jax

    # The platform must be chosen BEFORE the runtime initializes (the first
    # backend query below claims it): a CPU-backend multi-process run on a
    # host that also exposes a single-client TPU tunnel (this build image)
    # would otherwise have every worker claim the chip and deadlock. The
    # launcher's --platform flag sets MSLA_PLATFORM; trainer.accelerator
    # resolves too late (after config compose) for this decision.
    platform = os.environ.get("MSLA_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    from msla_tpu.parallel.mesh import record_process_rank

    record_process_rank()  # rank known via public API from here on
    log.info("Distributed runtime up: process %d/%d, %d local / %d global devices",
             jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())
    return True


def _int_env(name: str) -> int | None:
    value = os.environ.get(name)
    return int(value) if value else None
