"""The multi-process launcher forms a working global runtime end-to-end.

`msla_tpu.parallel.launch` is the torchrun-equivalent the reference gets from
Lightning DDP: it only sets env vars and spawns processes — the target script
opts in by calling `setup_distributed()` (as main.py does). This drives a real
2-process launch and checks both ranks saw the 8-device global runtime.
"""
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = textwrap.dedent("""
    # NO manual platform pin here: the launcher's --platform cpu must reach
    # setup_distributed (via MSLA_PLATFORM) and keep all ranks off the
    # single-client axon tunnel — exactly what a `launch -- main.py` run needs.
    import jax
    from msla_tpu.parallel.distributed import setup_distributed
    from msla_tpu.parallel.mesh import is_main_process
    assert setup_distributed(), "env vars from the launcher not picked up"
    assert jax.default_backend() == "cpu", jax.default_backend()
    print(f"rank={jax.process_index()} global={jax.device_count()} "
          f"main={is_main_process()}")
""")


def test_launcher_two_process(tmp_path):
    script = tmp_path / "probe.py"
    script.write_text(SCRIPT)
    kept = [f for f in os.environ.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f]
    env = {**os.environ, "PYTHONPATH": f"{REPO}:/root/.axon_site",
           "XLA_FLAGS": " ".join(
               kept + ["--xla_force_host_platform_device_count=4"])}
    proc = subprocess.run(
        [sys.executable, "-m", "msla_tpu.parallel.launch", "--nproc", "2",
         "--platform", "cpu", "--", str(script)],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "[rank 0] rank=0 global=8 main=True" in proc.stdout
    assert "[rank 1] rank=1 global=8 main=False" in proc.stdout


def test_launcher_two_nodes(tmp_path):
    """The multi-HOST contract: one launcher invocation per node with
    --nnodes/--node-rank and a shared --coordinator (the torchrun
    --node_rank/--master_addr shape). Two single-process 'nodes' on localhost
    must form one global runtime with correct rank offsets."""
    import socket

    script = tmp_path / "probe.py"
    script.write_text(SCRIPT)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    kept = [f for f in os.environ.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f]
    env = {**os.environ, "PYTHONPATH": f"{REPO}:/root/.axon_site",
           "XLA_FLAGS": " ".join(
               kept + ["--xla_force_host_platform_device_count=4"])}

    def node(rank):
        return subprocess.Popen(
            [sys.executable, "-m", "msla_tpu.parallel.launch",
             "--nproc", "1", "--nnodes", "2", "--node-rank", str(rank),
             "--coordinator", f"localhost:{port}", "--platform", "cpu",
             "--", str(script)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO)

    nodes = [node(0), node(1)]
    outs = [p.communicate(timeout=300)[0] for p in nodes]
    assert all(p.returncode == 0 for p in nodes), "\n".join(outs)
    assert "[rank 0] rank=0 global=8 main=True" in outs[0]
    assert "[rank 1] rank=1 global=8 main=False" in outs[1]
