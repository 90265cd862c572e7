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


def detect_pod_env(env=None) -> dict | None:
    """Recognize a multi-host launch from the environment; returns the kwargs
    for `jax.distributed.initialize`, or None for a single-host run.

    Pure function over an env mapping so pod detection is unit-testable with
    stubbed env vars (no backend touched). Recognized, in priority order:

    1. Explicit JAX_* vars (our launcher, torchrun-style schedulers):
       JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID →
       explicit kwargs.
    2. Cloud TPU pod slices: the TPU runtime populates TPU_WORKER_HOSTNAMES
       (comma-separated) + TPU_WORKER_ID on every worker — more than one
       hostname means a pod, and `initialize()` with NO arguments lets JAX's
       first-party cluster detection fill in the coordinator (reference
       equivalent: Lightning's `num_nodes` DDP config,
       configs/hparams_search/optuna.yaml:13-15).
    3. GKE TPU workloads: MEGASCALE_COORDINATOR_ADDRESS → auto-detect ({}).
    """
    env = os.environ if env is None else env
    coordinator = env.get("JAX_COORDINATOR_ADDRESS")
    num = env.get("JAX_NUM_PROCESSES")
    pid = env.get("JAX_PROCESS_ID")
    if coordinator or (num and int(num) > 1):
        return {"coordinator_address": coordinator,
                "num_processes": int(num) if num else None,
                "process_id": int(pid) if pid is not None and pid != "" else None}
    hostnames = [h for h in env.get("TPU_WORKER_HOSTNAMES", "").split(",") if h]
    if len(hostnames) > 1:
        return {}  # TPU pod: JAX auto-detects coordinator/rank from the runtime
    if env.get("MEGASCALE_COORDINATOR_ADDRESS"):
        return {}
    return None


def setup_distributed(coordinator_address: str | None = None,
                      num_processes: int | None = None,
                      process_id: int | None = None) -> bool:
    """Initialize the multi-host JAX runtime; returns True if distributed.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) or scheduler auto-detection — TPU
    pods are recognized from the runtime's own env (see detect_pod_env).
    """
    if coordinator_address or (num_processes and num_processes > 1):
        kwargs = {"coordinator_address": coordinator_address,
                  "num_processes": num_processes, "process_id": process_id}
    else:
        detected = detect_pod_env()
        if detected is None:
            return False
        kwargs = detected

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

    jax.distributed.initialize(**kwargs)
    from msla_tpu.parallel.mesh import record_process_rank

    record_process_rank()  # rank known via public API from here on
    log.info("Distributed runtime up: process %d/%d, %d local / %d global devices",
             jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())
    return True
