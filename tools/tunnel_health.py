"""Bounded axon-tunnel health probe.

The axon TPU tunnel is single-client and fails by HANGING, not erroring:
a process that calls ``jax.devices()`` while the tunnel is down blocks in
backend init forever, and killing it leaves a stale claim that wedges the
tunnel further (CLAUDE.md "Environment traps"). That makes naive probes
dangerous — this tool isolates the claim in a child process, enforces a
hard deadline from the parent, and reports one of three states:

    UP      backend init + a tiny device op completed within the deadline
    DOWN    the child hung (killed at the deadline) or init raised
    CPU     no axon plugin registered in this interpreter (nothing probed)

Exit codes: 0=UP, 3=DOWN, 4=CPU-only. One JSON line on stdout so callers
(shell loops, the bench pre-flight) can branch without parsing prose.

Usage:  python tools/tunnel_health.py [--deadline 180]

The child runs the smallest graph that proves the tunnel end-to-end
(backend init -> compile -> execute -> fetch a scalar); a warm tunnel
answers in a few seconds, so the default deadline is generous without
being the 550 s+ hang a dead tunnel produces.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_CHILD = r"""
import json, time, sys
t0 = time.time()
import jax, jax.numpy as jnp
print(f"child: jax imported t+{time.time()-t0:.1f}s", file=sys.stderr, flush=True)
dev = jax.devices()
print(f"child: devices={dev} t+{time.time()-t0:.1f}s", file=sys.stderr, flush=True)
x = jnp.ones((128, 128), jnp.bfloat16)
val = float((x @ x).sum())
print(f"child: op ok ({val}) t+{time.time()-t0:.1f}s", file=sys.stderr, flush=True)
print(json.dumps({"platform": dev[0].platform, "n": len(dev),
                  "init_s": round(time.time() - t0, 2)}))
"""


def probe(deadline: float, verbose: bool = True) -> dict:
    """Run the child probe; never blocks past ``deadline`` seconds."""
    env = dict(os.environ)
    # The probe must exercise the DEFAULT backend the driver/bench would get,
    # so do not pin a platform here. PYTHONPATH must keep /root/.axon_site or
    # the plugin never registers and we'd report CPU on a healthy tunnel.
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD], env=env, timeout=deadline,
            capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired as exc:
        stderr = (exc.stderr or b"")
        if isinstance(stderr, bytes):
            stderr = stderr.decode(errors="replace")
        return {"state": "DOWN", "why": f"probe hung past {deadline:.0f}s "
                                        "(tunnel wedged or unreachable)",
                "elapsed_s": round(time.time() - t0, 1),
                "trail": stderr.strip().splitlines()[-3:]}
    trail = proc.stderr.strip().splitlines()[-4:]
    if proc.returncode != 0:
        return {"state": "DOWN", "why": f"probe exited rc={proc.returncode}",
                "elapsed_s": round(time.time() - t0, 1), "trail": trail}
    info = json.loads(proc.stdout.strip().splitlines()[-1])
    state = "CPU" if info["platform"] == "cpu" else "UP"
    return {"state": state, **info,
            "elapsed_s": round(time.time() - t0, 1), "trail": trail}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--deadline", type=float, default=180.0,
                    help="seconds before the probe child is killed (DOWN)")
    args = ap.parse_args()
    result = probe(args.deadline)
    print(json.dumps(result), flush=True)
    return {"UP": 0, "DOWN": 3, "CPU": 4}[result["state"]]


if __name__ == "__main__":
    raise SystemExit(main())
