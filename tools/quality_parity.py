"""In-env quality-parity proxy (round-2 VERDICT missing #3, second half).

The north star claims reconstruction-MSE / SI-SDR parity with the reference
on Slakh test. Slakh does not exist in this environment, so this is the
strongest in-env proxy: train the reference's own torch VQ-VAE pipeline and
our flax one from IDENTICAL converted weights on the SAME synthetic-stem
dataset for N Adam steps (the reference's exact training loss,
src/model/vqvae.py:55-66, and optimizer, :168-171), then score BOTH with the
reference's validation metric catalog (vqvae.py:108-165) on the same held-out
batch — metrics computed by ONE shared implementation (ours, ops/metrics.py,
itself pinned analytically in tests/test_metrics.py) over each framework's
outputs, so any delta is model-trajectory, not metric-code.

Writes examples/quality_parity.log. Usage: python tools/quality_parity.py
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, "/root/reference")

import jax

jax.config.update("jax_platforms", "cpu")  # keep off the axon tunnel

import jax.numpy as jnp
import numpy as np
import optax
import torch

from src.model.components.decoder import Decoder as TorchDecoder
from src.model.components.encoder import Encoder as TorchEncoder
from src.model.components.vector_quantizer import VectorQuantizer as TorchVQ

from msla_tpu.models.vqvae import VQVAETask
from msla_tpu.ops.metrics import l1_loss, mse_loss, si_sdr_mean
from msla_tpu.utils.torch_compat import vqvae_params_from_torch

STEPS = 60
LR = 1e-4  # the reference's default (configs/model/vqvae.yaml): stable trajectory
HP = dict(num_hidden=32, num_residual_layer=2, num_residual_hidden=16,
          num_embedding=64, embedding_dim=16, commitment_cost=0.25)
BATCH, T_LEN, SR = 8, 2048, 2000
INSTRUMENTS = ("bass", "drums", "guitar", "piano")


class TorchVQVAE(torch.nn.Module):
    """The reference's composition (vqvae.py:38-53) from its OWN components."""

    def __init__(self):
        super().__init__()
        self.encoder = TorchEncoder(in_channel=4, num_hidden=HP["num_hidden"],
                                    num_residual_layer=HP["num_residual_layer"],
                                    num_residual_hidden=HP["num_residual_hidden"])
        self.conv = torch.nn.Conv1d(HP["num_hidden"], HP["embedding_dim"], 1, 1)
        self.vector_quantizer = TorchVQ(num_embedding=HP["num_embedding"],
                                        embedding_dim=HP["embedding_dim"],
                                        commitment_cost=HP["commitment_cost"])
        self.decoder = TorchDecoder(in_channel=HP["embedding_dim"],
                                    num_hidden=HP["num_hidden"],
                                    num_residual_layer=HP["num_residual_layer"],
                                    num_residual_hidden=HP["num_residual_hidden"])

    def forward(self, mixed):
        z = self.conv(self.encoder(mixed))
        emb, com, quantized, _, _, _ = self.vector_quantizer(z)
        return self.decoder(quantized), emb, com


def synth_batch(rng):
    """Synthetic 4-stem 'songs': per-stem sine mixes (tests/conftest.py style)."""
    t = np.arange(T_LEN) / SR
    stems = []
    for b in range(BATCH):
        song = []
        for i in range(4):
            f0 = 55.0 * (2 ** i) * (1 + 0.02 * rng.standard_normal())
            w = (0.4 * np.sin(2 * np.pi * f0 * t + rng.uniform(0, 6.28))
                 + 0.1 * np.sin(2 * np.pi * 2 * f0 * t))
            song.append(w)
        stems.append(song)
    instruments = np.asarray(stems, np.float32)
    mixed = np.broadcast_to(instruments.sum(1, keepdims=True), instruments.shape).copy()
    return mixed, instruments


def catalog(output_np: np.ndarray, instruments_np: np.ndarray) -> dict:
    """The reference's validation metric catalog over given outputs —
    ONE implementation for both frameworks (ops/metrics.py)."""
    out = jnp.asarray(output_np)
    ins = jnp.asarray(instruments_np)
    m = {}
    for i, name in enumerate(INSTRUMENTS):
        m[f"l1_{name}"] = float(l1_loss(out[:, i], ins[:, i]))
        m[f"l2_{name}"] = float(mse_loss(out[:, i], ins[:, i]))
        m[f"si_sdr_{name}"] = float(si_sdr_mean(out[:, i], ins[:, i]))
    mixed_out, mixed_ref = out.sum(1), ins.sum(1)
    m["l1_full"] = float(l1_loss(mixed_out, mixed_ref))
    m["l2_full"] = float(mse_loss(mixed_out, mixed_ref))
    m["si_sdr_full"] = float(si_sdr_mean(mixed_out, mixed_ref))
    return m


def main() -> int:
    torch.manual_seed(0)
    tmod = TorchVQVAE()
    topt = torch.optim.Adam(tmod.parameters(), lr=LR, amsgrad=False)

    task = VQVAETask(**HP, learning_rate=LR, sample_rate=SR,
                     checkpoint_dir="/tmp/qp", codebook_file="/tmp/qp/cb.csv",
                     use_pallas=False)
    params = vqvae_params_from_torch(tmod.state_dict(),
                                     num_residual_layer=HP["num_residual_layer"])
    params = jax.tree.map(lambda t: jnp.array(np.array(t, copy=True)), params)
    tx = task.configure_optimizer()
    opt = tx.init(params)

    @jax.jit
    def jstep(params, opt, mixed, instruments):
        (loss, _), grads = jax.value_and_grad(
            lambda p: task.loss_fn(p, (mixed, instruments), jax.random.PRNGKey(0)),
            has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    rng = np.random.default_rng(123)
    t_losses, j_losses = [], []
    for step in range(STEPS):
        mixed, instruments = synth_batch(rng)
        topt.zero_grad()
        out, emb, com = tmod(torch.from_numpy(mixed.copy()))
        loss = emb + com
        for i in range(4):
            loss = loss + torch.nn.functional.l1_loss(
                out[:, i, :], torch.from_numpy(instruments[:, i, :].copy()))
        loss.backward()
        topt.step()
        t_losses.append(float(loss.detach()))

        params, opt, jl = jstep(params, opt, jnp.asarray(mixed),
                                jnp.asarray(instruments))
        j_losses.append(float(jl))

    # held-out batch, scored by the shared metric catalog
    mixed, instruments = synth_batch(np.random.default_rng(999))
    with torch.no_grad():
        t_out = tmod(torch.from_numpy(mixed.copy()))[0].numpy()
    j_out = np.asarray(task.net.apply({"params": params}, jnp.asarray(mixed)).output)

    t_cat, j_cat = catalog(t_out, instruments), catalog(j_out, instruments)

    rel = [abs(a - b) / max(abs(a), abs(b), 1e-9) for a, b in zip(t_losses, j_losses)]
    lines = [
        "quality-parity proxy: torch reference pipeline vs msla_tpu, identical",
        f"init, {STEPS} lockstep Adam steps on the same synthetic-stem stream",
        f"date: {time.strftime('%Y-%m-%d %H:%M:%S')}",
        f"model: {HP} | batch {BATCH} x T {T_LEN} @ {SR} Hz | lr {LR}",
        "",
        f"train loss, step 1:  torch {t_losses[0]:.6f}  jax {j_losses[0]:.6f}",
        f"train loss, step {STEPS}: torch {t_losses[-1]:.6f}  jax {j_losses[-1]:.6f}",
        f"max relative per-step loss divergence over {STEPS} steps: {max(rel):.2e}",
        "",
        "held-out validation catalog (reference vqvae.py:108-165; shared metric",
        "implementation ops/metrics.py — deltas are model, not metric):",
        f"{'metric':<16}{'torch':>12}{'jax':>12}{'delta':>12}",
    ]
    worst = 0.0
    for k in t_cat:
        d = abs(t_cat[k] - j_cat[k])
        scale = max(abs(t_cat[k]), abs(j_cat[k]), 1e-9)
        worst = max(worst, d / scale)
        lines.append(f"{k:<16}{t_cat[k]:>12.6f}{j_cat[k]:>12.6f}{d:>12.2e}")
    ok = max(rel) < 5e-3 and worst < 5e-2
    lines += ["",
              f"worst relative catalog delta: {worst:.2e}",
              f"verdict: {'PASS' if ok else 'FAIL'} (loss divergence < 5e-3, "
              "catalog delta < 5e-2)"]
    report = "\n".join(lines) + "\n"
    sys.stdout.write(report)
    log_path = os.environ.get("MSLA_QP_LOG", REPO / "examples" / "quality_parity.log")
    with open(log_path, "w") as fh:
        fh.write(report)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
