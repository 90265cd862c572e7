"""Data pipeline tests on synthetic WAV fixtures (SURVEY.md §4)."""
import json

import numpy as np
import pytest

from msla_tpu.data.dataset import STEM_NAMES, SlakhDataset, make_fixture_dataset
from msla_tpu.data.datamodule import SlakhDataModule
from msla_tpu.data.loader import DataLoader
from msla_tpu.data.resample import resample
from msla_tpu.data.wavio import read_wav, write_wav

SR = 4000  # small rate keeps fixtures fast; semantics are rate-independent


def test_wav_roundtrip_int16(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.uniform(-0.9, 0.9, (2, 1000))).astype(np.float32)
    write_wav(tmp_path / "x.wav", x, 22000)
    y, sr = read_wav(tmp_path / "x.wav")
    assert sr == 22000 and y.shape == (2, 1000)
    np.testing.assert_allclose(y, x, atol=2.0 / 32768)  # write x32767, read /32768


def test_wav_roundtrip_float32(tmp_path):
    x = np.linspace(-1, 1, 500, dtype=np.float32)[None]
    write_wav(tmp_path / "x.wav", x, 8000, dtype="float32")
    y, sr = read_wav(tmp_path / "x.wav")
    np.testing.assert_array_equal(y, x)


def test_resample_preserves_tone():
    sr_in, sr_out, f0 = 44100, 22000, 440.0
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    y = resample(x, sr_in, sr_out)
    assert abs(y.shape[-1] - sr_out) <= 1
    # dominant FFT bin still at 440 Hz
    spec = np.abs(np.fft.rfft(y))
    peak_hz = np.argmax(spec) * sr_out / y.shape[-1]
    assert abs(peak_hz - f0) < 2.0


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("slakh")
    make_fixture_dataset(root / "train", n_tracks=3, seconds=26, sr=SR)
    make_fixture_dataset(root / "validation", n_tracks=2, seconds=26, sr=SR)
    make_fixture_dataset(root / "test", n_tracks=2, seconds=26, sr=SR)
    return root


def make_ds(path, **kw):
    defaults = dict(target_sample_duration=2, target_sample_rate=SR, max_duration=120,
                    maximum_dataset_size=150000)
    defaults.update(kw)
    return SlakhDataset(str(path), **defaults)


def test_dataset_cleaning_and_frames(fixture_root):
    ds = make_ds(fixture_root / "train")
    # 26 s - 2*10 s trim = 6 s -> floored to 6 s -> frames with 1 s hop,
    # 2 s window: starts 0..4 -> 5 frames per track, 3 tracks
    assert len(ds) == 15
    frame = ds[0]
    assert frame.shape == (4, 2 * SR)
    assert frame.dtype == np.float32
    # cache artifacts exist (same names/keys as the reference)
    assert (fixture_root / "train" / "dataset_dict.json").exists()
    index = json.loads((fixture_root / "train" / "dataset_dict.json").read_text())
    assert {"file_path_idx", "frame_start", "frame_end"} == set(index[0])


def test_dataset_cache_reuse(fixture_root):
    ds2 = make_ds(fixture_root / "train")  # second build loads the JSON cache
    assert len(ds2) == 15


def test_skips_single_instrument_and_silent_tracks(tmp_path):
    from msla_tpu.data.wavio import write_wav
    # track with only bass
    solo = tmp_path / "Track00000"
    solo.mkdir()
    t = np.arange(26 * SR) / SR
    write_wav(solo / "bass.wav", 0.4 * np.sin(2 * np.pi * 110 * t).astype(np.float32), SR)
    # all-silent track (4 stems of zeros)
    silent = tmp_path / "Track00001"
    silent.mkdir()
    for name in STEM_NAMES:
        write_wav(silent / f"{name}.wav", np.zeros(26 * SR, np.float32), SR)
    # one good track
    make_fixture_dataset(tmp_path, n_tracks=1, seconds=26, sr=SR, seed=3)
    # (make_fixture_dataset reuses Track00000 — rebuild under distinct name)
    good = tmp_path / "Track00099"
    good.mkdir(exist_ok=True)
    rng = np.random.default_rng(4)
    for j, name in enumerate(STEM_NAMES):
        wave = 0.4 * np.sin(2 * np.pi * 110 * (2 ** j) * t) + 0.05 * rng.standard_normal(t.shape)
        write_wav(good / f"{name}.wav", wave.astype(np.float32), SR)

    ds = make_ds(tmp_path)
    used_tracks = {e["file_path_idx"] for e in ds.data_list}
    dirs = sorted(p.name for p in tmp_path.iterdir() if p.is_dir())
    # Track00000 (solo, also overwritten by fixture) may be kept; the silent
    # track must never contribute frames
    silent_idx = dirs.index("Track00001")
    assert silent_idx not in used_tracks
    assert len(ds) > 0


def test_max_duration_cap(tmp_path):
    make_fixture_dataset(tmp_path, n_tracks=1, seconds=40, sr=SR)
    ds = make_ds(tmp_path, max_duration=15)
    # 40 - 20 trim = 20 s, capped at 15 s -> starts 0..13 -> 14 frames
    assert len(ds) == 14


def test_loader_drop_last_and_shuffle(fixture_root):
    ds = make_ds(fixture_root / "train")
    loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=1)
    batches = list(loader)
    assert len(batches) == 3  # 15 // 4
    assert all(b.shape == (4, 4, 2 * SR) for b in batches)
    loader2 = DataLoader(ds, batch_size=4, shuffle=False, drop_last=False)
    assert len(list(loader2)) == 4  # ceil(15/4)
    # background-thread path yields identical batches
    loader3 = DataLoader(ds, batch_size=4, shuffle=False, drop_last=False, num_workers=1)
    for a, b in zip(loader2, loader3):
        np.testing.assert_array_equal(a, b)


def test_loader_abandoned_iterator_stops_producer(fixture_root):
    """Breaking out of a background-thread loader must not leak the producer
    (regression: it used to block forever on the full queue)."""
    import threading
    import time

    ds = make_ds(fixture_root / "train")
    baseline = threading.active_count()
    for _ in range(4):
        loader = DataLoader(ds, batch_size=2, num_workers=1)
        it = iter(loader)
        next(it)   # consume one batch, abandon the rest
        del it
    deadline = time.time() + 10
    while threading.active_count() > baseline and time.time() < deadline:
        time.sleep(0.1)
    assert threading.active_count() <= baseline + 1  # producers exited


def test_datamodule_mixture_transform(fixture_root):
    import jax.numpy as jnp
    dm = SlakhDataModule(train_dir=str(fixture_root / "train"),
                         val_dir=str(fixture_root / "validation"),
                         test_dir=str(fixture_root / "test"),
                         target_sample_rate=SR, target_sample_duration=2,
                         max_duration=120, maximum_dataset_size=150000,
                         batch_size=4, num_workers=0)
    batch = next(iter(dm.train_dataloader()))
    model_in, target = dm.on_after_batch_transfer(jnp.asarray(batch))
    assert model_in.shape == target.shape == batch.shape
    # every channel of the input is the stem sum
    np.testing.assert_allclose(np.asarray(model_in[:, 0]), batch.sum(axis=1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(model_in[:, 3]), batch.sum(axis=1), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(target), batch)


def test_datamodule_quantizer_modes(fixture_root):
    import jax
    import jax.numpy as jnp
    from msla_tpu.data.transform import Quantize
    from msla_tpu.nn.vqvae_net import VQVAENet

    net = VQVAENet(num_hidden=16, num_residual_layer=1, num_residual_hidden=8,
                   num_embedding=8, embedding_dim=4, commitment_cost=0.25,
                   use_pallas=False)
    x0 = jnp.zeros((1, 4, 2 * SR))
    variables = net.init(jax.random.PRNGKey(0), x0)
    q = Quantize(net, variables)

    dm = SlakhDataModule(train_dir=str(fixture_root / "train"),
                         val_dir=str(fixture_root / "validation"),
                         test_dir=str(fixture_root / "test"),
                         target_sample_rate=SR, target_sample_duration=2,
                         max_duration=120, maximum_dataset_size=150000,
                         batch_size=2, num_workers=0, quantizer=q)
    batch = jnp.asarray(next(iter(dm.val_dataloader())))
    idx, target = dm.on_after_batch_transfer(batch)
    assert idx.shape == (2, 2 * SR // 4) and idx.dtype == jnp.int32

    dm.quantized_latents = True
    lat, _ = dm.on_after_batch_transfer(batch)
    assert lat.shape == (2, 4, 2 * SR // 4)  # (B, embedding_dim, W)


class _IdxDataset:
    """Rows that identify themselves, so interleave tests can read off which
    dataset indices each rank was fed."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.array([i], dtype=np.int64)


def _fed(loader):
    return np.concatenate([b[:, 0] for b in loader])


def test_loader_distributed_interleave_disjoint_and_lockstep():
    """Multi-host role (torch DistributedSampler equivalent): ranks draw
    disjoint strides of ONE shared permutation, wrap-padded so every rank
    yields the same number of equally-sized batches."""
    n, world = 10, 3
    loaders = [DataLoader(_IdxDataset(n), batch_size=2, shuffle=True, seed=7,
                          process_index=r, process_count=world)
               for r in range(world)]
    assert all(len(ld) == len(loaders[0]) for ld in loaders)  # lockstep
    per_rank = [_fed(ld) for ld in loaders]
    assert all(len(p) == -(-n // world) for p in per_rank)  # ceil(10/3) each
    flat = np.concatenate(per_rank)
    assert set(flat.tolist()) == set(range(n))  # full coverage
    # exactly the wrap-pad duplicates, nothing more
    assert len(flat) - len(set(flat.tolist())) == world * -(-n // world) - n


def test_loader_distributed_shared_permutation_across_epochs():
    """Same seed on every rank → the union of rank shards per epoch is one
    permutation; successive epochs reshuffle identically on all ranks."""
    world = 2
    loaders = [DataLoader(_IdxDataset(8), batch_size=2, shuffle=True, seed=3,
                          process_index=r, process_count=world)
               for r in range(world)]
    epoch1 = [_fed(ld) for ld in loaders]
    epoch2 = [_fed(ld) for ld in loaders]
    for ep in (epoch1, epoch2):
        assert sorted(np.concatenate(ep).tolist()) == list(range(8))
    assert not all(np.array_equal(a, b) for a, b in zip(epoch1, epoch2))
    # interleave of one permutation: rank r holds positions r::world
    merged = np.empty(8, dtype=np.int64)
    merged[0::world], merged[1::world] = epoch1[0], epoch1[1]
    solo = DataLoader(_IdxDataset(8), batch_size=8, shuffle=True, seed=3)
    np.testing.assert_array_equal(merged, _fed(solo))


def test_loader_distributed_drop_last_equal_batches():
    ld = DataLoader(_IdxDataset(11), batch_size=2, drop_last=True,
                    process_index=1, process_count=2)
    batches = list(ld)
    assert len(batches) == len(ld) == 3  # ceil(11/2)=6 local, 6//2 batches
    assert all(b.shape == (2, 1) for b in batches)
    with pytest.raises(ValueError):
        DataLoader(_IdxDataset(4), batch_size=2, process_index=2, process_count=2)


def test_datamodule_wires_process_info(fixture_root, monkeypatch):
    """The datamodule resolves the recorded rank/count into every loader —
    without touching a jax backend (the axon claim trap)."""
    from msla_tpu.parallel import mesh

    monkeypatch.setattr(mesh, "_recorded_rank", 1)
    monkeypatch.setattr(mesh, "_recorded_count", 2)
    dm = SlakhDataModule(train_dir=str(fixture_root / "train"),
                         val_dir=str(fixture_root / "validation"),
                         test_dir=str(fixture_root / "test"),
                         target_sample_rate=SR, target_sample_duration=2,
                         max_duration=120, maximum_dataset_size=150000,
                         batch_size=4, num_workers=0)
    for ld in (dm.train_dataloader(), dm.val_dataloader(),
               dm.test_dataloader(), dm.predict_dataloader()):
        assert (ld.process_index, ld.process_count) == (1, 2)
    assert len(dm.train_dataloader()) == 2  # 15 examples -> 8 local -> 2 full


def test_loader_distributed_tiny_dataset_keeps_lockstep():
    """A dataset SMALLER than the process count must still give every rank
    the same number of batches (wrap-pad tiles, it doesn't slice once) — a
    starved rank would never enter the collective the fed ranks block in."""
    for n, world in ((1, 3), (3, 8), (2, 5)):
        loaders = [DataLoader(_IdxDataset(n), batch_size=1, shuffle=True,
                              seed=5, process_index=r, process_count=world)
                   for r in range(world)]
        per_rank = [_fed(ld) for ld in loaders]
        assert all(len(p) == len(per_rank[0]) == len(loaders[0])
                   for p in per_rank)
        assert set(np.concatenate(per_rank).tolist()) == set(range(n))
