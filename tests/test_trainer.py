"""Trainer harness end-to-end tests on synthetic fixtures (debug=default
equivalent, SURVEY.md §4) plus callback/checkpoint unit tests."""
import numpy as np
import pytest

from msla_tpu.data.datamodule import SlakhDataModule
from msla_tpu.data.dataset import make_fixture_dataset
from msla_tpu.models.vqvae import VQVAETask
from msla_tpu.train.callbacks import EarlyStopping, ModelCheckpoint
from msla_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from msla_tpu.train.loggers import CSVLogger, WandbLogger
from msla_tpu.train.trainer import Trainer

SR = 4000


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("slakh")
    for split, n in [("train", 2), ("validation", 1), ("test", 1)]:
        make_fixture_dataset(root / split, n_tracks=n, seconds=26, sr=SR)
    return root


def make_dm(root, batch_size=2, **kw):
    return SlakhDataModule(train_dir=str(root / "train"), val_dir=str(root / "validation"),
                           test_dir=str(root / "test"), target_sample_rate=SR,
                           target_sample_duration=2, max_duration=120,
                           maximum_dataset_size=150000, batch_size=batch_size,
                           num_workers=0, **kw)


def make_task(tmp_path):
    return VQVAETask(num_hidden=16, num_residual_layer=1, num_residual_hidden=8,
                     num_embedding=16, embedding_dim=8, commitment_cost=0.25,
                     learning_rate=1e-3, sample_rate=SR,
                     checkpoint_dir=str(tmp_path / "ckpt"),
                     codebook_file=str(tmp_path / "codebook.csv"),
                     use_pallas=False)


def test_fit_decreases_loss_and_writes_artifacts(fixture_root, tmp_path):
    task = make_task(tmp_path)
    dm = make_dm(fixture_root)
    ckpt_cb = ModelCheckpoint(dirpath=str(tmp_path / "best"), filename="best_vqvae",
                              monitor="validation/loss", save_top_k=2, save_last=True)
    es_cb = EarlyStopping(monitor="validation/loss", patience=5)
    trainer = Trainer(default_root_dir=str(tmp_path), max_epochs=2, accelerator="cpu",
                      log_every_n_steps=0, enable_progress_bar=False,
                      callbacks=[ckpt_cb, es_cb],
                      logger=[CSVLogger(save_dir=str(tmp_path / "csv")),
                              WandbLogger(save_dir=str(tmp_path / "wandb"))])
    trainer.fit(task, dm)

    cm = trainer.callback_metrics
    assert "train/loss" in cm and "validation/loss" in cm
    assert np.isfinite(cm["validation/loss"])
    # the reference's full metric catalog is logged
    for name in ["validation/embedding_loss", "validation/commitment_loss",
                 "validation/perplexity", "validation/l1_bass_loss",
                 "validation/l2_piano_loss", "validation/si_sdr_drums_measure",
                 "validation/si_sdr_full_audio_measure", "validation/l1_full_audio_loss"]:
        assert name in cm, name

    # artifacts: best + last checkpoints, codebook CSV, csv metrics, demo wavs
    assert (tmp_path / "best" / "best_vqvae.ckpt").exists()
    assert (tmp_path / "best" / "last.ckpt").exists()
    codebook = np.loadtxt(tmp_path / "codebook.csv", delimiter=",", skiprows=1)
    assert codebook.shape == (16, 8)
    assert (tmp_path / "csv" / "metrics.csv").exists()
    assert (tmp_path / "ckpt" / "original_bass.wav").exists()
    assert (tmp_path / "ckpt" / "generated_full_song.wav").exists()

    # test split runs with the test/ metric prefix
    test_metrics = trainer.test(task, dm)
    assert "test/loss" in test_metrics


def test_fast_dev_run_single_batch(fixture_root, tmp_path):
    task = make_task(tmp_path)
    dm = make_dm(fixture_root)
    trainer = Trainer(max_epochs=5, accelerator="cpu", fast_dev_run=True,
                      enable_progress_bar=False, log_every_n_steps=0)
    trainer.fit(task, dm)
    assert trainer.global_step == 1
    assert trainer.current_epoch == 1


def test_resume_from_checkpoint(fixture_root, tmp_path):
    task = make_task(tmp_path)
    dm = make_dm(fixture_root)
    trainer = Trainer(max_epochs=1, accelerator="cpu", enable_progress_bar=False,
                      log_every_n_steps=0)
    trainer.fit(task, dm)
    trainer.save_checkpoint(tmp_path / "resume.ckpt")
    step_before = trainer.global_step

    task2 = make_task(tmp_path)
    trainer2 = Trainer(max_epochs=2, accelerator="cpu", enable_progress_bar=False,
                       log_every_n_steps=0)
    trainer2.fit(task2, dm, ckpt_path=str(tmp_path / "resume.ckpt"))
    assert trainer2.global_step > step_before  # continued, not restarted
    payload = load_checkpoint(tmp_path / "resume.ckpt")
    assert payload["epoch"] == 1


def test_resume_restores_callback_state(tmp_path):
    """EarlyStopping patience and the ModelCheckpoint top-k heap survive a
    save/restore round-trip (Lightning semantics behind reference main.py:48)."""
    class FakeTrainer:
        current_epoch = 1
        global_step = 7
        callback_metrics = {}
        _model = type("M", (), {"hparams": {}})()

        def __init__(self, callbacks):
            self.callbacks = callbacks
            self._state = type("S", (), {"params": {"w": np.zeros(1)},
                                         "opt_state": {}})()

        save_checkpoint = Trainer.save_checkpoint

    es = EarlyStopping(monitor="m", patience=3)
    mc = ModelCheckpoint(dirpath=str(tmp_path), filename="best", monitor="m",
                         save_top_k=2)
    t = FakeTrainer([mc, es])
    for score in [1.0, 0.8, 0.9, 0.85]:  # best 0.8, then 2 waits
        es.on_validation_end(t, {"m": score})
        mc.on_validation_end(t, {"m": score})
    assert es._wait == 2 and es._best == 0.8 and len(mc._best) == 2

    t.save_checkpoint(tmp_path / "state.ckpt")

    # fresh callbacks restore their state from the checkpoint payload —
    # exactly what Trainer._restore dispatches (guarded by class name)
    payload = load_checkpoint(tmp_path / "state.ckpt")
    es2 = EarlyStopping(monitor="m", patience=3)
    mc2 = ModelCheckpoint(dirpath=str(tmp_path), filename="best", monitor="m",
                          save_top_k=2)
    for cb, entry in zip([mc2, es2], payload["callbacks"]):
        assert type(cb).__name__ == entry["class"]
        cb.load_state_dict(entry["state"])
    assert es2._wait == 2 and es2._best == 0.8
    assert len(mc2._best) == 2 and mc2._version == mc._version
    assert mc2.best_model_score == 0.8
    # one more bad epoch trips the restored patience counter exactly
    es2.on_validation_end(t, {"m": 0.9})
    assert es2._wait == 3 and es2.stop_training


def test_validate_and_ckpt_best(fixture_root, tmp_path):
    task = make_task(tmp_path)
    dm = make_dm(fixture_root)
    ckpt_cb = ModelCheckpoint(dirpath=str(tmp_path / "best"), filename="best_vqvae",
                              monitor="validation/loss")
    trainer = Trainer(max_epochs=1, accelerator="cpu", enable_progress_bar=False,
                      log_every_n_steps=0, callbacks=[ckpt_cb])
    trainer.fit(task, dm)
    metrics = trainer.validate(task, dm)
    assert "validation/loss" in metrics
    # Lightning-style ckpt_path="best" resolves through the callback
    test_metrics = trainer.test(task, dm, ckpt_path="best")
    assert "test/loss" in test_metrics
    with pytest.raises(RuntimeError):
        Trainer(accelerator="cpu")._resolve_ckpt_path("best")


def test_fit_with_masking_augment_in_step(fixture_root, tmp_path):
    """masking=True routes the STFT augmentation through the jitted train step."""
    task = make_task(tmp_path)
    dm = make_dm(fixture_root, masking=True)
    trainer = Trainer(max_epochs=1, accelerator="cpu", enable_progress_bar=False,
                      log_every_n_steps=0, limit_train_batches=2, limit_val_batches=1)
    trainer.fit(task, dm)
    assert np.isfinite(trainer.callback_metrics["train/loss"])
    assert np.isfinite(trainer.callback_metrics["validation/loss"])


def test_trainer_predict(fixture_root, tmp_path):
    task = make_task(tmp_path)
    dm = make_dm(fixture_root)
    trainer = Trainer(max_epochs=1, accelerator="cpu", enable_progress_bar=False,
                      log_every_n_steps=0, fast_dev_run=True)
    trainer.fit(task, dm)
    outputs = trainer.predict(task, dm)
    assert len(outputs) == len(dm.predict_dataloader())
    assert outputs[0].shape[1:] == (4, 2 * SR)  # (B=1, 4, T)

    # ragged final batch: predict pads it to the bucket size (static shapes,
    # no recompile) and slices back — results equal the unpadded forward
    loader = dm.predict_dataloader()
    raws = [np.asarray(r) for _, r in zip(range(len(loader)), loader)]
    if raws and any(r.shape[0] != raws[0].shape[0] for r in raws):
        import jax.numpy as jnp

        last_raw = raws[-1]
        direct = task.predict_step(
            trainer.state.params,
            dm.on_after_batch_transfer(jnp.asarray(last_raw)))
        np.testing.assert_allclose(np.asarray(outputs[-1]), np.asarray(direct),
                                   rtol=1e-5, atol=1e-6)
    assert all(o.shape[0] == r.shape[0] for o, r in zip(outputs, raws))


def test_predict_pads_ragged_final_batch(fixture_root, tmp_path):
    """A ragged final predict batch is padded to the bucket size (one jit
    graph, static shapes) by repeating a real row and sliced back — outputs
    equal the unpadded forward per batch."""
    import jax.numpy as jnp

    task = make_task(tmp_path)
    dm = make_dm(fixture_root)

    class RaggedPredictDM:
        """Stock datamodule with a batch-3 non-drop_last predict loader (the
        stock one is batch_size=1 — never ragged)."""

        def __init__(self, inner):
            self._inner = inner
            self.on_after_batch_transfer = inner.on_after_batch_transfer

        def __getattr__(self, name):
            return getattr(self._inner, name)

        def predict_dataloader(self):
            from msla_tpu.data.loader import DataLoader

            return DataLoader(self._inner.create_dataset(self._inner.test_dir),
                              batch_size=3, shuffle=False, drop_last=False,
                              num_workers=0, seed=0)

    rdm = RaggedPredictDM(dm)
    trainer = Trainer(max_epochs=1, accelerator="cpu", enable_progress_bar=False,
                      log_every_n_steps=0, fast_dev_run=True)
    trainer.fit(task, dm)
    outputs = trainer.predict(task, rdm)

    loader = rdm.predict_dataloader()
    raws = [np.asarray(r) for r in loader]
    assert raws[-1].shape[0] < raws[0].shape[0], "fixture no longer ragged"
    assert [o.shape[0] for o in outputs] == [r.shape[0] for r in raws]
    direct = task.predict_step(trainer.state.params,
                               dm.on_after_batch_transfer(jnp.asarray(raws[-1])))
    np.testing.assert_allclose(np.asarray(outputs[-1]), np.asarray(direct),
                               rtol=1e-5, atol=1e-6)


def test_early_stopping_semantics():
    class FakeTrainer:
        def save_checkpoint(self, path, **kw):
            save_checkpoint(path, params={"w": np.zeros(1)})

    es = EarlyStopping(monitor="validation/loss", patience=2, min_delta=0.0)
    t = FakeTrainer()
    for loss in [1.0, 0.9, 0.95, 0.95]:
        es.on_validation_end(t, {"validation/loss": loss})
    assert es.stop_training  # 2 checks without improvement

    es2 = EarlyStopping(monitor="validation/loss", patience=5, check_finite=True)
    es2.on_validation_end(t, {"validation/loss": float("nan")})
    assert es2.stop_training

    es3 = EarlyStopping(monitor="missing", strict=True)
    with pytest.raises(RuntimeError):
        es3.on_validation_end(t, {"validation/loss": 1.0})


def test_model_checkpoint_topk(tmp_path):
    class FakeTrainer:
        def __init__(self):
            self.n = 0

        def save_checkpoint(self, path, **kw):
            save_checkpoint(path, params={"w": np.full(1, self.n)})
            self.n += 1

    t = FakeTrainer()
    cb = ModelCheckpoint(dirpath=str(tmp_path), filename="best", monitor="m",
                         save_top_k=2, save_last=True, mode="min")
    for score in [3.0, 1.0, 2.0, 0.5]:
        cb.on_validation_end(t, {"m": score})
    files = sorted(p.name for p in tmp_path.glob("*.ckpt"))
    # top-2 of [3,1,2,0.5] = {0.5, 1.0} → 2 versioned + canonical + last
    assert "best.ckpt" in files and "last.ckpt" in files
    assert cb.best_model_score == 0.5
    # canonical file holds the best payload (saved 4th → n=... last.ckpt saves interleave)
    best = load_checkpoint(tmp_path / "best.ckpt")
    v_best = load_checkpoint(cb._best[0][1])
    assert float(best["state_dict"]["w"][0]) == float(v_best["state_dict"]["w"][0])


def test_model_checkpoint_non_main_rank_skips_fs(tmp_path, monkeypatch):
    """Multi-host: non-main ranks keep identical top-k bookkeeping but never
    touch the filesystem (trainer.save_checkpoint is rank-gated too, so
    os.link on a never-written best path would crash — round-2 review fix)."""
    import msla_tpu.train.callbacks as cbs

    monkeypatch.setattr(cbs, "is_main_process", lambda: False)

    class FakeTrainer:  # save_checkpoint rank-gates to a no-op, like Trainer
        def save_checkpoint(self, path, **kw):
            pass

    cb = ModelCheckpoint(dirpath=str(tmp_path / "sub"), filename="best",
                         monitor="m", save_top_k=1, save_last=True, mode="min")
    for score in [3.0, 1.0, 2.0]:
        cb.on_validation_end(FakeTrainer(), {"m": score})
    assert not (tmp_path / "sub").exists()  # no mkdir, no link, no remove
    assert cb.best_model_score == 1.0      # bookkeeping matches rank 0


def test_save_weights_only_skips_opt_state(tmp_path):
    """ModelCheckpoint(save_weights_only=True) drops the optimizer state from
    every save (Lightning semantics) — for Audio-BERT that halves a 3.3 GB
    checkpoint — and the weights-only ckpt still restores (opt state keeps
    its fresh value, as in Lightning)."""
    class FakeTrainer:
        current_epoch = 0
        global_step = 3
        callback_metrics = {}
        callbacks = []
        _model = type("M", (), {"hparams": {}})()

        def __init__(self):
            self._state = type("S", (), {"params": {"w": np.ones(4)},
                                         "opt_state": {"mu": np.ones(4)}})()

        save_checkpoint = Trainer.save_checkpoint

    t = FakeTrainer()
    cb = ModelCheckpoint(dirpath=str(tmp_path), filename="best", monitor="m",
                         save_top_k=1, save_last=True, save_weights_only=True)
    cb.on_validation_end(t, {"m": 1.0})
    for name in ["best.ckpt", "last.ckpt"]:
        payload = load_checkpoint(tmp_path / name)
        assert payload["state_dict"]["w"].shape == (4,)
        assert payload["opt_state"] == {}, name
    # full save for comparison keeps it
    t.save_checkpoint(tmp_path / "full.ckpt")
    assert load_checkpoint(tmp_path / "full.ckpt")["opt_state"]["mu"].shape == (4,)


def test_background_save_snapshots_before_donation(tmp_path, monkeypatch):
    """With MSLA_CKPT_SNAPSHOT=1, background=True snapshots device arrays
    BEFORE returning, so a donated train step can clobber the original
    buffers while the worker is still fetching/serializing — the checkpoint
    must hold the pre-step values."""
    import jax
    import jax.numpy as jnp
    from msla_tpu.train.checkpoint import wait_for_pending

    monkeypatch.setenv("MSLA_CKPT_SNAPSHOT", "1")
    x = jnp.arange(8, dtype=jnp.float32)
    save_checkpoint(tmp_path / "snap.ckpt", params={"w": x}, background=True)
    # donate the original buffer immediately (aliases/invalidates it where
    # the backend supports donation)
    x2 = jax.jit(lambda a: a * 0 - 1.0, donate_argnums=0)(x)
    wait_for_pending()
    payload = load_checkpoint(tmp_path / "snap.ckpt")
    np.testing.assert_array_equal(payload["state_dict"]["w"],
                                  np.arange(8, dtype=np.float32))
    assert float(x2[0]) == -1.0


def test_background_write_failure_surfaces_once_then_retries(tmp_path):
    """A failed background write re-raises ONCE at the next join, is dropped
    from the registry (no stale-error replay), and a later save to the same
    path retries and succeeds."""
    import pytest
    from msla_tpu.train.checkpoint import wait_for_pending

    blocker = tmp_path / "dir"
    blocker.write_text("")  # a FILE where the ckpt dir should be: mkdir fails
    target = blocker / "c.ckpt"
    save_checkpoint(target, params={"w": np.zeros(2)}, background=True)
    with pytest.raises((FileExistsError, NotADirectoryError)):
        wait_for_pending()
    wait_for_pending()  # stale error must NOT replay
    blocker.unlink()
    save_checkpoint(target, params={"w": np.ones(2)}, background=True)
    wait_for_pending()
    assert float(load_checkpoint(target)["state_dict"]["w"][0]) == 1.0


def test_background_checkpoint_write_and_join(tmp_path):
    """background=True defers the serialize+write to a worker thread;
    load_checkpoint and wait_for_pending join it, and a second save to the
    same path never overlaps the first."""
    from msla_tpu.train.checkpoint import wait_for_pending

    for i in range(3):  # repeated saves to one path stay ordered
        save_checkpoint(tmp_path / "bg.ckpt", params={"w": np.full(8, i)},
                        global_step=i, background=True)
    payload = load_checkpoint(tmp_path / "bg.ckpt")  # joins the last write
    assert payload["global_step"] == 2
    assert float(payload["state_dict"]["w"][0]) == 2.0
    wait_for_pending()  # idempotent with nothing in flight


def test_link_after_pending_orders_behind_write(tmp_path, monkeypatch):
    """The canonical best-link queued behind an in-flight versioned write
    must land only AFTER that file is complete — never a half-written (or
    absent) link target — and a link with nothing pending runs inline."""
    import os
    import time

    from flax import serialization as ser

    from msla_tpu.train import checkpoint as ckpt_mod

    orig = ser.msgpack_serialize
    monkeypatch.setattr(ckpt_mod.serialization, "msgpack_serialize",
                        lambda payload: (time.sleep(1.0), orig(payload))[1])
    src, dst = tmp_path / "best-v0.ckpt", tmp_path / "best.ckpt"
    save_checkpoint(src, params={"w": np.arange(4.0)}, background=True)
    ckpt_mod.link_after_pending(src, dst)  # write still sleeping in worker
    assert not dst.exists()  # link is queued, not taken early
    ckpt_mod.wait_for_pending()
    assert os.path.samefile(src, dst)
    np.testing.assert_array_equal(
        load_checkpoint(dst)["state_dict"]["w"], np.arange(4.0))

    # nothing pending → the (re)link happens inline, replacing the old dst
    src2 = tmp_path / "best-v1.ckpt"
    save_checkpoint(src2, params={"w": np.arange(4.0) * 2})
    ckpt_mod.link_after_pending(src2, dst)
    assert os.path.samefile(src2, dst) and not os.path.samefile(src, dst)


def test_is_main_process_without_backend(monkeypatch):
    """is_main_process must not initialize a jax backend (single-client axon
    tunnel trap); with no backend it answers from the environment."""
    from msla_tpu.parallel import mesh as mesh_mod

    consulted = []

    class JaxSentinel:  # records (rather than crashes on) a backend consult,
        def process_index(self):  # so the broad except can't hide a regression
            consulted.append(True)
            return 0

    monkeypatch.setattr(mesh_mod, "jax", JaxSentinel())
    monkeypatch.setattr(mesh_mod, "_recorded_rank", None)  # no Trainer yet
    import jax._src.xla_bridge as xb

    monkeypatch.setattr(xb, "backends_are_initialized", lambda: False,
                        raising=False)
    monkeypatch.setattr(xb, "_backends", {}, raising=False)
    monkeypatch.setenv("JAX_PROCESS_INDEX", "1")
    assert mesh_mod.is_main_process() is False
    monkeypatch.setenv("JAX_PROCESS_INDEX", "0")
    assert mesh_mod.is_main_process() is True
    monkeypatch.delenv("JAX_PROCESS_INDEX")
    monkeypatch.setenv("JAX_PROCESS_ID", "1")  # jax.distributed's env spelling
    assert mesh_mod.is_main_process() is False
    monkeypatch.delenv("JAX_PROCESS_ID")
    # multi-host hints without any rank info = a broken launch: an
    # every-rank-is-main answer would race artifact writes, so it raises
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    with pytest.raises(RuntimeError, match="JAX_PROCESS_ID"):
        mesh_mod.is_main_process()
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS")
    assert mesh_mod.is_main_process() is True  # no hints → single-process
    assert not consulted  # jax.process_index() never touched without a backend


def test_is_main_process_recorded_rank(monkeypatch):
    """Once record_process_rank ran (Trainer init / setup_distributed), the
    guard answers from the record — no private backend-state probing."""
    from msla_tpu.parallel import mesh as mesh_mod

    monkeypatch.setattr(mesh_mod, "_recorded_rank", None)
    assert mesh_mod.record_process_rank(3) == 3
    assert mesh_mod.is_main_process() is False
    mesh_mod.record_process_rank(0)
    assert mesh_mod.is_main_process() is True
    monkeypatch.setattr(mesh_mod, "_recorded_rank", None)  # restore

    # Trainer construction records the rank (public-API path)
    from msla_tpu.train.trainer import Trainer

    Trainer(accelerator="cpu", devices=1, max_epochs=1)
    assert mesh_mod._recorded_rank == 0


def test_frozen_param_dedup_sidecar(tmp_path):
    """frozen_keys dedup (VERDICT r3 weak #5): frozen subtrees go to ONE
    content-addressed frozen-<fp>.ckpt sidecar per directory, written once
    per content; per-epoch files store only the trainable remainder;
    load_checkpoint reassembles transparently; a missing sidecar fails
    loudly."""
    from flax import serialization

    from msla_tpu.train import checkpoint as ckpt_mod

    params = {"bert": {"w": np.full((64, 64), 2.0)},
              "codebook": np.arange(8.0),
              "head": {"k": np.ones(3)}}
    p1 = tmp_path / "best-v0.ckpt"
    save_checkpoint(p1, params=params, frozen_keys=("bert", "codebook"))
    # the per-epoch file holds ONLY the trainable remainder + a sidecar name
    raw = serialization.msgpack_restore(p1.read_bytes())
    assert set(raw["state_dict"]) == {"head"}
    assert raw["frozen_file"].startswith("frozen-")
    sidecar = tmp_path / raw["frozen_file"]
    assert sidecar.exists()
    # reassembly is transparent and exact
    loaded = load_checkpoint(p1)["state_dict"]
    np.testing.assert_array_equal(loaded["bert"]["w"], params["bert"]["w"])
    np.testing.assert_array_equal(loaded["codebook"], params["codebook"])
    np.testing.assert_array_equal(loaded["head"]["k"], params["head"]["k"])

    # second save in the same process: sidecar NOT rewritten (dedup)
    before = sidecar.stat().st_mtime_ns
    save_checkpoint(tmp_path / "last.ckpt", params=params,
                    frozen_keys=("bert", "codebook"))
    assert sidecar.stat().st_mtime_ns == before
    assert load_checkpoint(tmp_path / "last.ckpt")["state_dict"]["bert"][
        "w"].shape == (64, 64)

    # frozen keys absent from params are ignored (e.g. VQ-VAE task: none)
    save_checkpoint(tmp_path / "plain.ckpt", params={"head": {"k": np.ones(3)}},
                    frozen_keys=("bert",))
    plain = serialization.msgpack_restore((tmp_path / "plain.ckpt").read_bytes())
    assert "frozen_file" not in plain

    # a checkpoint copied WITHOUT its sidecar fails with a pointed error
    orphan_dir = tmp_path / "orphan"
    orphan_dir.mkdir()
    (orphan_dir / "best.ckpt").write_bytes(p1.read_bytes())
    with pytest.raises(FileNotFoundError, match="frozen-"):
        load_checkpoint(orphan_dir / "best.ckpt")

    # a fresh process (cleared marker) REUSES the content-addressed sidecar
    # instead of rewriting it — the name proves the content matches
    ckpt_mod._frozen_saved.clear()
    save_checkpoint(tmp_path / "resume.ckpt", params=params,
                    frozen_keys=("bert", "codebook"))
    assert sidecar.stat().st_mtime_ns == before
    assert load_checkpoint(tmp_path / "resume.ckpt")["state_dict"][
        "codebook"].shape == (8,)


def test_frozen_sidecar_survives_cross_run_content_change(tmp_path):
    """Regression: the canonical checkpoint dir is shared across runs. A new
    run (fresh process) whose frozen subtree DIFFERS — different seed/init —
    must not overwrite the sidecar that earlier best_*-v*.ckpt files in the
    same directory reassemble from. Content-addressed names keep both."""
    from msla_tpu.train import checkpoint as ckpt_mod

    w_run1 = np.full((64, 64), 2.0)
    w_run2 = np.full((64, 64), 5.0)

    save_checkpoint(tmp_path / "best_bert-v0.ckpt",
                    params={"bert": {"w": w_run1}, "head": {"k": np.ones(3)}},
                    frozen_keys=("bert",))
    ckpt_mod._frozen_saved.clear()  # simulate a new process sharing the dir
    save_checkpoint(tmp_path / "best_bert-v1.ckpt",
                    params={"bert": {"w": w_run2}, "head": {"k": np.ones(3)}},
                    frozen_keys=("bert",))

    assert len(list(tmp_path.glob("frozen-*.ckpt"))) == 2
    np.testing.assert_array_equal(
        load_checkpoint(tmp_path / "best_bert-v0.ckpt")["state_dict"]["bert"]["w"],
        w_run1)
    np.testing.assert_array_equal(
        load_checkpoint(tmp_path / "best_bert-v1.ckpt")["state_dict"]["bert"]["w"],
        w_run2)

    # permuted-but-equal-sum content must fingerprint differently too
    a = np.array([1.0, 4.0, 2.0, 3.0], np.float32).reshape(2, 2)
    b = np.array([4.0, 1.0, 3.0, 2.0], np.float32).reshape(2, 2)
    fp_a = ckpt_mod._frozen_fingerprint({"w": a})
    fp_b = ckpt_mod._frozen_fingerprint({"w": b})
    assert fp_a != fp_b


def test_frozen_dedup_through_trainer_fit(tmp_path):
    """A task exposing frozen_param_keys (Audio-BERT) checkpoints through the
    Trainer: versioned + last files share the sidecar, restore_params sees the
    reassembled params bit-exactly, and resume from the deduped file works."""
    import jax

    from flax import serialization as ser

    from msla_tpu.models.bert import AudioBertTask
    from msla_tpu.nn.bert import BertConfig, BertForMaskedLM
    from msla_tpu.train.checkpoint import restore_params

    cb_file = tmp_path / "cb.csv"
    cb = np.random.default_rng(0).standard_normal((16, 4))
    np.savetxt(cb_file, cb, delimiter=",", header=",".join(map(str, range(4))))
    task = AudioBertTask(learning_rate=2e-4, checkpoint_dir=str(tmp_path),
                         codebook=str(cb_file), sample_rate=64, frame_length=2,
                         num_embedding=16)
    task.config = BertConfig(vocab_size=64, hidden_size=16, num_hidden_layers=2,
                             num_attention_heads=2, intermediate_size=32,
                             max_position_embeddings=512)
    task.bert = BertForMaskedLM(task.config)
    assert task.frozen_param_keys == ("bert", "codebook")

    class _IndexDM:  # (indices, instruments) batches, T=128 → W=32, 1 chunk
        def __init__(self):
            rng = np.random.default_rng(7)
            self.idx = rng.integers(0, 16, (4, 32)).astype(np.int32)
            self.ins = rng.standard_normal((4, 4, 128)).astype(np.float32)

        def train_dataloader(self):
            return [self.ins]

        def val_dataloader(self):
            return [self.ins]

        def on_after_batch_transfer(self, batch):
            return self.idx, batch

    ckdir = tmp_path / "ck"
    ckpt_cb = ModelCheckpoint(dirpath=str(ckdir), filename="best_bert",
                              monitor="validation/loss", save_top_k=1)
    trainer = Trainer(max_epochs=1, accelerator="cpu",
                      enable_progress_bar=False, log_every_n_steps=0,
                      callbacks=[ckpt_cb], default_root_dir=str(tmp_path))
    trainer.fit(task, _IndexDM())
    assert len(list(ckdir.glob("frozen-*.ckpt"))) == 1
    raw = ser.msgpack_restore((ckdir / "best_bert.ckpt").read_bytes())
    assert "bert" not in raw["state_dict"] and "head" in raw["state_dict"]
    # reassembled restore matches the live training state bit-exactly
    full = restore_params(str(ckdir / "best_bert.ckpt"))
    live = jax.device_get(trainer.state.params)
    np.testing.assert_array_equal(
        full["bert"]["embeddings"]["word_embeddings"]["embedding"],
        live["bert"]["embeddings"]["word_embeddings"]["embedding"])
    np.testing.assert_array_equal(full["codebook"], live["codebook"])
    # resume from the deduped checkpoint trains on
    trainer2 = Trainer(max_epochs=2, accelerator="cpu",
                       enable_progress_bar=False, log_every_n_steps=0,
                       default_root_dir=str(tmp_path))
    trainer2.fit(task, _IndexDM(), ckpt_path=str(ckdir / "best_bert.ckpt"))
    assert trainer2.global_step > trainer.global_step


def test_checkpoint_wire_codecs():
    """Wire compression codecs: spec parsing, q8 per-block error bound,
    bf16 exact-downcast equivalence, small/int leaf passthrough."""
    import jax.numpy as jnp

    from msla_tpu.train import checkpoint as ckpt_mod

    assert ckpt_mod._parse_wire(None) == (None, None)
    assert ckpt_mod._parse_wire("bf16") == ("bf16", "bf16")
    assert ckpt_mod._parse_wire("q8") == ("bf16", "q8")
    assert ckpt_mod._parse_wire("params=q8,opt=off") == ("q8", None)
    with pytest.raises(ValueError):
        ckpt_mod._parse_wire("zstd")
    with pytest.raises(ValueError):
        ckpt_mod._parse_wire("params=fp4")

    rng = np.random.default_rng(0)
    # wide per-block dynamic range — the per-1024-block scales must adapt
    x = (rng.standard_normal((32, 2048)).astype(np.float32)
         * np.exp(rng.uniform(-6, 6, (32, 1))).astype(np.float32))

    enc = ckpt_mod._wire_encode_leaf(jnp.asarray(x), "q8")
    assert enc[ckpt_mod.WIRE_KEY] == "q8"
    dec = ckpt_mod._wire_decode_leaf(
        {k: (np.asarray(v) if hasattr(v, "dtype") else v)
         for k, v in enc.items()})
    assert dec.dtype == np.float32 and dec.shape == x.shape
    blocks = x.ravel().reshape(-1, ckpt_mod._Q8_BLOCK)
    bound = np.abs(blocks).max(axis=1) / 254.0 + 1e-12  # scale/2 per element
    err = np.abs((dec.ravel() - x.ravel()).reshape(blocks.shape))
    assert (err <= bound[:, None] * (1 + 1e-6)).all()

    enc16 = ckpt_mod._wire_encode_leaf(jnp.asarray(x), "bf16")
    dec16 = ckpt_mod._wire_decode_leaf(
        {k: (np.asarray(v) if hasattr(v, "dtype") else v)
         for k, v in enc16.items()})
    np.testing.assert_array_equal(
        dec16, np.asarray(x).astype(jnp.bfloat16).astype(np.float32))

    # ints, bools and sub-threshold leaves ride exact
    small = np.ones(8, np.float32)
    assert ckpt_mod._wire_encode_leaf(small, "q8") is small
    ints = np.arange(100000, dtype=np.int32)
    assert ckpt_mod._wire_encode_leaf(ints, "q8") is ints


def test_checkpoint_wire_save_load(tmp_path, monkeypatch):
    """save_checkpoint(wire=...) stores the compressed representation on
    disk (and over the device→host wire), load_checkpoint re-expands it
    transparently; the frozen sidecar stays bitwise-exact."""
    from flax import serialization as ser

    from msla_tpu.train import checkpoint as ckpt_mod

    monkeypatch.setattr(ckpt_mod, "_WIRE_MIN_ELEMS", 16)
    rng = np.random.default_rng(1)
    w = rng.standard_normal((64, 64)).astype(np.float32)
    params = {"frozen_enc": {"w": w * 3}, "head": {"w": w},
              "step_like": np.array(7, np.int32)}
    opt = {"mu": {"head": {"w": w * 0.1}}, "nu": {"head": {"w": np.abs(w)}},
           "count": np.array(3, np.int32)}

    exact, wired = tmp_path / "exact.ckpt", tmp_path / "wired.ckpt"
    save_checkpoint(exact, params=params, opt_state=opt)
    save_checkpoint(wired, params=params, opt_state=opt, wire="q8",
                    frozen_keys=("frozen_enc",))

    raw = ser.msgpack_restore(wired.read_bytes())
    assert raw["wire"] == "q8"
    # params ride bf16, moments ride q8 under the 'q8' production combo
    assert raw["state_dict"]["head"]["w"][ckpt_mod.WIRE_KEY] == "bf16"
    assert raw["opt_state"]["mu"]["head"]["w"][ckpt_mod.WIRE_KEY] == "q8"
    assert raw["opt_state"]["mu"]["head"]["w"]["q"].dtype == np.int8

    loaded = load_checkpoint(wired)
    lp, lo = loaded["state_dict"], loaded["opt_state"]
    # frozen sidecar is exact even under wire
    np.testing.assert_array_equal(lp["frozen_enc"]["w"], w * 3)
    # wired leaves restore original dtype/shape within codec tolerance
    assert lp["head"]["w"].dtype == np.float32
    np.testing.assert_allclose(lp["head"]["w"], w, atol=0, rtol=8e-3)
    np.testing.assert_allclose(lo["nu"]["head"]["w"], np.abs(w), atol=2e-2)
    # int leaves exact
    assert int(lp["step_like"]) == 7 and int(lo["count"]) == 3

    # the point of the exercise: fewer bytes on the wire and on disk
    assert wired.stat().st_size < 0.45 * exact.stat().st_size

    # MSLA_CKPT_WIRE env is the blunt global opt-in when no wire kwarg given
    monkeypatch.setenv("MSLA_CKPT_WIRE", "bf16")
    envp = tmp_path / "env.ckpt"
    save_checkpoint(envp, params={"head": {"w": w}})
    raw_env = ser.msgpack_restore(envp.read_bytes())
    assert raw_env["wire"] == "bf16"
    assert raw_env["state_dict"]["head"]["w"][ckpt_mod.WIRE_KEY] == "bf16"


def test_checkpoint_wire_trainer_resume(fixture_root, tmp_path, monkeypatch):
    """End-to-end: ModelCheckpoint(wire='q8') wires last.ckpt only (best
    stays exact for cross-stage handoff); resume from the wired last.ckpt
    trains on with finite loss."""
    from flax import serialization as ser

    from msla_tpu.train import checkpoint as ckpt_mod

    monkeypatch.setattr(ckpt_mod, "_WIRE_MIN_ELEMS", 1)
    task = make_task(tmp_path)
    dm = make_dm(fixture_root)
    cb = ModelCheckpoint(dirpath=str(tmp_path / "best"), filename="best_vqvae",
                         monitor="validation/loss", save_top_k=1, wire="q8")
    trainer = Trainer(max_epochs=1, accelerator="cpu", enable_progress_bar=False,
                      log_every_n_steps=0, callbacks=[cb],
                      default_root_dir=str(tmp_path))
    trainer.fit(task, dm)
    ckpt_mod.wait_for_pending()

    raw_last = ser.msgpack_restore((tmp_path / "best" / "last.ckpt").read_bytes())
    assert raw_last.get("wire") == "q8"
    raw_best = ser.msgpack_restore(
        (tmp_path / "best" / "best_vqvae.ckpt").read_bytes())
    assert "wire" not in raw_best

    task2 = make_task(tmp_path)
    trainer2 = Trainer(max_epochs=2, accelerator="cpu", enable_progress_bar=False,
                       log_every_n_steps=0, default_root_dir=str(tmp_path))
    trainer2.fit(task2, dm, ckpt_path=str(tmp_path / "best" / "last.ckpt"))
    assert trainer2.global_step > trainer.global_step
    assert np.isfinite(trainer2.callback_metrics["validation/loss"])


def test_checkpoint_wire_env_keeps_best_exact(fixture_root, tmp_path,
                                              monkeypatch):
    """The blunt MSLA_CKPT_WIRE env opt-in wires last.ckpt but must NOT leak
    into the best/versioned saves cross-stage handoff relies on staying
    bitwise-exact — ModelCheckpoint pins them with wire='off'."""
    from flax import serialization as ser

    from msla_tpu.train import checkpoint as ckpt_mod

    monkeypatch.setattr(ckpt_mod, "_WIRE_MIN_ELEMS", 1)
    monkeypatch.setenv("MSLA_CKPT_WIRE", "q8")
    task = make_task(tmp_path)
    dm = make_dm(fixture_root)
    cb = ModelCheckpoint(dirpath=str(tmp_path / "best"), filename="best_vqvae",
                         monitor="validation/loss", save_top_k=1)
    trainer = Trainer(max_epochs=1, accelerator="cpu", enable_progress_bar=False,
                      log_every_n_steps=0, callbacks=[cb],
                      default_root_dir=str(tmp_path))
    trainer.fit(task, dm)
    ckpt_mod.wait_for_pending()

    raw_last = ser.msgpack_restore((tmp_path / "best" / "last.ckpt").read_bytes())
    assert raw_last.get("wire") == "q8"
    raw_best = ser.msgpack_restore(
        (tmp_path / "best" / "best_vqvae.ckpt").read_bytes())
    assert "wire" not in raw_best
    # and the exact best round-trips bit-identically to the live params
    import jax
    from flax import serialization

    best = ckpt_mod.load_checkpoint(tmp_path / "best" / "best_vqvae.ckpt")
    live = serialization.to_state_dict(jax.device_get(trainer._state.params))
    flat_live = {jax.tree_util.keystr(k): v for k, v
                 in jax.tree_util.tree_flatten_with_path(live)[0]}
    flat_best = {jax.tree_util.keystr(k): v for k, v
                 in jax.tree_util.tree_flatten_with_path(best["state_dict"])[0]}
    assert flat_live.keys() == flat_best.keys()
    for k, a in flat_live.items():
        np.testing.assert_array_equal(np.asarray(a), np.asarray(flat_best[k]))
