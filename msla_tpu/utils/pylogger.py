"""Rank-aware console logger (reference: src/utils/pylogger.py:9-51).

Same surface as the reference's RankedLogger, with the process rank taken
from jax.process_index() instead of Lightning's rank_zero plumbing.
"""
from __future__ import annotations

import logging
from typing import Mapping, Optional


def _current_rank() -> int:
    """Process rank WITHOUT initializing jax backends.

    jax.process_index() would initialize the default (TPU) backend as a side
    effect — on the single-client axon tunnel that claims the chip for a mere
    log line (and deadlocks when another process holds it). Only consult jax
    when a backend already exists.
    """
    try:
        from jax._src import xla_bridge

        if getattr(xla_bridge, "_backends", None):
            import jax

            return jax.process_index()
    except Exception:
        pass
    import os

    return int(os.environ.get("JAX_PROCESS_INDEX", 0))


class RankedLogger(logging.LoggerAdapter):
    """A multi-process-friendly command line logger: prefixes messages with
    the process rank and can restrict logging to rank zero or one rank."""

    def __init__(self, name: str = __name__, rank_zero_only: bool = False,
                 extra: Optional[Mapping[str, object]] = None) -> None:
        super().__init__(logger=logging.getLogger(name), extra=extra)
        self.rank_zero_only = rank_zero_only

    def log(self, level: int, msg: str, rank: Optional[int] = None, *args, **kwargs) -> None:
        if not self.isEnabledFor(level):
            return
        msg, kwargs = self.process(msg, kwargs)
        current_rank = _current_rank()
        msg = f"[rank: {current_rank}] {msg}"
        if self.rank_zero_only:
            if current_rank == 0:
                self.logger.log(level, msg, *args, **kwargs)
        elif rank is None or current_rank == rank:
            self.logger.log(level, msg, *args, **kwargs)
