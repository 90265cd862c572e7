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


FOUR_RANK_SCRIPT = textwrap.dedent("""
    import os
    import sys

    import jax

    from msla_tpu.parallel.distributed import setup_distributed
    from msla_tpu.parallel.mesh import is_main_process, make_mesh, process_info, shard_batch

    assert setup_distributed(), "env vars from the launcher not picked up"
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.process_count() == 4 and jax.device_count() == 4

    import numpy as np

    from msla_tpu.data.loader import DataLoader

    class _IdxDs:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return np.array([i], dtype=np.int64)

    r, c = process_info()
    fed = np.concatenate([b[:, 0] for b in DataLoader(
        _IdxDs(), batch_size=2, shuffle=True, seed=11,
        process_index=r, process_count=c)])
    print(f"FED rank={r} idx={sorted(int(i) for i in fed)}", flush=True)

    # one dp train step over the 4-device GLOBAL mesh, each rank feeding its
    # quarter of the global batch
    import jax.numpy as jnp
    import optax

    from msla_tpu.models.vqvae import VQVAETask

    mesh = make_mesh(list(jax.devices()), model_parallel=1)
    task = VQVAETask(num_hidden=16, num_residual_layer=1, num_residual_hidden=8,
                     num_embedding=16, embedding_dim=8, commitment_cost=0.25,
                     learning_rate=1e-3, sample_rate=1000,
                     checkpoint_dir="/tmp/l4", codebook_file="/tmp/l4/cb.csv",
                     use_pallas=False)
    rng = np.random.default_rng(7)  # same global batch on every rank...
    instruments = (rng.standard_normal((16, 4, 256)) * 0.3).astype(np.float32)
    local = instruments[r * 4:(r + 1) * 4]  # ...each feeds only ITS quarter
    mixed = np.broadcast_to(local.sum(axis=1, keepdims=True), local.shape).copy()
    g_mixed, g_instr = shard_batch(mesh, mixed), shard_batch(mesh, local)
    assert g_mixed.shape[0] == 16, g_mixed.shape

    params = task.init_variables(jax.random.PRNGKey(0), (g_mixed, g_instr))["params"]
    tx = task.configure_optimizer()
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, batch):
        (loss, _), grads = jax.value_and_grad(
            lambda p: task.loss_fn(p, batch, jax.random.PRNGKey(1)),
            has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    with mesh:
        _, _, loss = step(params, opt, (g_mixed, g_instr))
    print(f"LOSS rank={r} main={is_main_process()} loss={float(loss)!r}",
          flush=True)
""")


def test_launcher_four_process_loss_and_interleave(tmp_path):
    """VERDICT r3 next #5: >2-rank coverage. A REAL 4-process launch (1 virtual
    device each) must (a) produce bit-identical dp losses on every rank and
    (b) feed each rank a disjoint quarter of the dataset that unions to full
    coverage."""
    import re

    script = tmp_path / "probe4.py"
    script.write_text(FOUR_RANK_SCRIPT)
    kept = [f for f in os.environ.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f]
    env = {**os.environ, "PYTHONPATH": f"{REPO}:/root/.axon_site",
           "XLA_FLAGS": " ".join(
               kept + ["--xla_force_host_platform_device_count=1"])}
    proc = subprocess.run(
        [sys.executable, "-m", "msla_tpu.parallel.launch", "--nproc", "4",
         "--platform", "cpu", "--", str(script)],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stdout + proc.stderr

    losses = dict(re.findall(r"LOSS rank=(\d) main=\w+ loss=(\S+)", proc.stdout))
    assert sorted(losses) == ["0", "1", "2", "3"], proc.stdout
    assert len(set(losses.values())) == 1, losses  # bit-identical across ranks
    mains = dict(re.findall(r"LOSS rank=(\d) main=(\w+)", proc.stdout))
    assert mains == {"0": "True", "1": "False", "2": "False", "3": "False"}

    fed = {r: eval(idx) for r, idx in
           re.findall(r"FED rank=(\d) idx=(\[[^\]]*\])", proc.stdout)}
    assert sorted(fed) == ["0", "1", "2", "3"], proc.stdout
    all_fed = [i for idx in fed.values() for i in idx]
    assert len(all_fed) == 16 and set(all_fed) == set(range(16))  # disjoint + full
