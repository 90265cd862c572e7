"""Multi-process launcher: the torchrun/Lightning-DDP-spawn equivalent.

The reference gets process launching for free from Lightning's DDP strategy
(configs/hparams_search/optuna.yaml:13-15 `num_nodes`/`devices: -1`; Lightning
spawns one rank per device and wires NCCL). The JAX runtime has no bundled
single-host launcher, so this module provides one:

    python -m msla_tpu.parallel.launch --nproc 2 -- main.py train_vqvae=True

spawns `nproc` copies of the target script with `JAX_COORDINATOR_ADDRESS`,
`JAX_NUM_PROCESSES` and `JAX_PROCESS_ID` set, which
`msla_tpu.parallel.distributed.setup_distributed` (called by main.py before
any backend init) picks up to form the global device mesh. Output from every
rank is streamed with a `[rank N]` prefix; the launcher's exit code is the
first non-zero worker exit code.

On a multi-HOST deployment this launcher runs once per host with
`--node-rank`/`--nnodes` (process ids are offset by node_rank*nproc) and a
shared `--coordinator host:port` pointing at node 0 — the same contract as
torchrun's `--node_rank`/`--master_addr`.

Verified end-to-end by tools/smoke_distributed.py (direct setup_distributed
path) and tests/test_launch.py (this launcher driving a 2-process script).
"""
from __future__ import annotations

import argparse
import os
import signal
import socket
import subprocess
import sys
import threading


def _free_port() -> int:
    # TOCTOU caveat (shared with torchrun's rendezvous-port pattern): the
    # port is released before rank 0's coordinator binds it, so a concurrent
    # service could steal it; pass an explicit --coordinator to avoid.
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _stream(proc: subprocess.Popen, rank: int) -> None:
    for line in proc.stdout:  # type: ignore[union-attr]
        sys.stdout.write(f"[rank {rank}] {line}")
        sys.stdout.flush()


def launch(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="msla_tpu.parallel.launch",
        description="Spawn N coordinated jax.distributed processes")
    parser.add_argument("--nproc", type=int, default=1,
                        help="processes to launch on this host")
    parser.add_argument("--nnodes", type=int, default=1,
                        help="total hosts in the job")
    parser.add_argument("--node-rank", type=int, default=0,
                        help="this host's index in [0, nnodes)")
    parser.add_argument("--coordinator", default=None,
                        help="host:port of process 0 (default: localhost:<free port>)")
    parser.add_argument("--platform", default=None,
                        help="jax platform every worker pins BEFORE runtime "
                             "init (e.g. cpu). Required for CPU multi-process "
                             "runs on hosts that also expose a single-client "
                             "TPU: the workers would otherwise all claim the "
                             "chip during jax.distributed.initialize")
    parser.add_argument("cmd", nargs=argparse.REMAINDER,
                        help="-- script.py [args...]")
    args = parser.parse_args(argv)

    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        parser.error("no command given (usage: ... --nproc 2 -- main.py [overrides])")
    if args.node_rank == 0 and args.coordinator is None:
        args.coordinator = f"localhost:{_free_port()}"
    elif args.coordinator is None:
        parser.error("--coordinator is required when --node-rank > 0")

    num_processes = args.nproc * args.nnodes
    procs: list[subprocess.Popen] = []
    threads: list[threading.Thread] = []
    for local_rank in range(args.nproc):
        rank = args.node_rank * args.nproc + local_rank
        env = dict(os.environ)
        env["JAX_COORDINATOR_ADDRESS"] = args.coordinator
        env["JAX_NUM_PROCESSES"] = str(num_processes)
        env["JAX_PROCESS_ID"] = str(rank)
        if args.platform:
            env["MSLA_PLATFORM"] = args.platform
        p = subprocess.Popen([sys.executable, *cmd], env=env,
                             stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                             text=True)
        procs.append(p)
        t = threading.Thread(target=_stream, args=(p, rank), daemon=True)
        t.start()
        threads.append(t)

    rc = 0
    try:
        for p in procs:
            p.wait()
            if rc == 0 and p.returncode != 0:
                rc = p.returncode
    except KeyboardInterrupt:  # pragma: no cover - interactive path
        for p in procs:
            p.send_signal(signal.SIGTERM)
        rc = 130
    for t in threads:
        t.join(timeout=5)
    return rc


if __name__ == "__main__":
    sys.exit(launch())
