"""Plotting suite (reference: src/utils/plotting.py:17-107).

Host-side matplotlib/seaborn, same four outputs: codebook UMAP+KMeans scatter,
per-instrument used-code overlay, waveform plot, mel-spectrogram plot — all
saved as SVG under paths.plot_dir. The umap package is not baked into this
image; when missing, the 2-D projection falls back to cosine-metric PCA
(sklearn), keeping the plots and their file names intact.
"""
from __future__ import annotations

from pathlib import Path
from typing import Tuple

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from msla_tpu.utils.pylogger import RankedLogger

log = RankedLogger(__name__, rank_zero_only=True)

INSTRUMENTS = ("bass", "drums", "guitar", "piano")


def _project_2d(values: np.ndarray, random_state: int = 14) -> np.ndarray:
    """UMAP(n_neighbors=3, cosine) when available; cosine-PCA fallback."""
    try:
        import umap

        return umap.UMAP(n_neighbors=3, min_dist=0.1, metric="cosine",
                         random_state=random_state).fit_transform(values)
    except Exception:
        # normalize rows (cosine geometry), then PCA to 2-D
        norms = np.linalg.norm(values, axis=1, keepdims=True)
        unit = values / np.maximum(norms, 1e-12)
        from sklearn.decomposition import PCA

        return PCA(n_components=2, random_state=random_state).fit_transform(unit)


def _load_codebook_csv(path: str) -> np.ndarray:
    arr = np.genfromtxt(path, delimiter=",", skip_header=1)
    return np.atleast_2d(arr)


def _scatter(proj: np.ndarray, clusters: np.ndarray, title: str, out_path: Path,
             overlay: np.ndarray | None = None) -> None:
    try:
        import seaborn as sns

        sns.set(style="whitegrid")
    except Exception:
        pass
    plt.figure(figsize=(8, 6))
    try:
        import seaborn as sns

        sns.scatterplot(x=proj[:, 0], y=proj[:, 1], hue=clusters, legend="full")
        if overlay is not None and len(overlay):
            sns.scatterplot(x=overlay[:, 0], y=overlay[:, 1], alpha=0.5, color="yellow")
    except Exception:
        plt.scatter(proj[:, 0], proj[:, 1], c=clusters)
        if overlay is not None and len(overlay):
            plt.scatter(overlay[:, 0], overlay[:, 1], alpha=0.5, color="yellow")
    plt.title(title)
    plt.legend(title="Clusters")
    plt.tight_layout()
    out_path.parent.mkdir(parents=True, exist_ok=True)
    plt.savefig(out_path)
    plt.close()


def plot_codebook(cfg) -> None:
    """Codebook in 2-D with KMeans(k=4) clusters (reference: plotting.py:17-30)."""
    from sklearn.cluster import KMeans

    codebook = _load_codebook_csv(str(cfg.paths.codebook_file))
    proj = _project_2d(codebook)
    clusters = KMeans(n_clusters=4, random_state=14, n_init=10).fit_predict(proj)
    _scatter(proj, clusters, "Codebook Embeddings - KMeans Clustering (k=4)",
             Path(str(cfg.paths.plot_dir)) / "codebook.svg")


def plot_embeddings_from_quantized(cfg, batch: Tuple, params=None, task=None) -> None:
    """Per-instrument used-code overlay on the projected codebook
    (reference: plotting.py:33-64). Loads best_vqvae.ckpt when params/task
    are not supplied."""
    import jax.numpy as jnp
    from sklearn.cluster import KMeans

    from msla_tpu.config import instantiate
    from msla_tpu.train.checkpoint import restore_params

    codebook = _load_codebook_csv(str(cfg.paths.codebook_file))
    proj = _project_2d(codebook)
    clusters = KMeans(n_clusters=4, random_state=14, n_init=10).fit_predict(proj)

    if task is None or params is None:
        task = instantiate(cfg.model.vqvae)
        params = restore_params(f"{cfg.paths.best_checkpoint_dir}/best_vqvae.ckpt")

    _, instruments = batch
    instruments = np.asarray(instruments)
    for idx in range(instruments.shape[1]):
        stem = instruments[:, idx, :].squeeze()
        one_instrument = jnp.asarray(np.stack([stem] * 4)[None])  # (1, 4, T)
        q = task.get_quantized(params, one_instrument)
        used = np.unique(np.asarray(q.encoding_indices))
        overlay = proj[used[used < len(proj)]]
        name = INSTRUMENTS[idx]
        _scatter(proj, clusters, f"{name.upper()} Embeddings",
                 Path(str(cfg.paths.plot_dir)) / f"{name}_embeddings_quantized_representation.svg",
                 overlay=overlay)


def plot_waveform(waveform, plot_dir: str, sample_rate: int = 22050, title: str = None) -> None:
    """Waveform plot (reference: plotting.py:67-82)."""
    waveform = np.asarray(waveform)
    if waveform.ndim == 1:
        waveform = waveform[None]
    time_axis = np.arange(waveform.shape[-1]) / sample_rate
    plt.figure(figsize=(10, 4))
    plt.plot(time_axis, waveform.T)
    plt.xlabel("Time (s)")
    plt.ylabel("Amplitude")
    plt.title(f"{title} Waveform")
    plt.grid(True)
    plt.tight_layout()
    Path(plot_dir).mkdir(parents=True, exist_ok=True)
    plt.savefig(f"{plot_dir}/{title}_waveform.svg")
    plt.close()


def plot_spectrogram(waveform, plot_dir: str, sample_rate: int = 22050, title: str = None) -> None:
    """Mel-spectrogram plot, n_mels=128, dB scale (reference: plotting.py:85-106)."""
    import jax.numpy as jnp

    from msla_tpu.ops.stft import amplitude_to_db, mel_spectrogram

    waveform = np.asarray(waveform)
    if waveform.ndim == 1:
        waveform = waveform[None]
    mel = mel_spectrogram(jnp.asarray(waveform), sample_rate=sample_rate,
                          n_fft=400, hop_length=160, n_mels=128)
    mel_db = np.asarray(amplitude_to_db(mel))
    plt.figure(figsize=(10, 4))
    plt.imshow(mel_db[0], aspect="auto", origin="lower", cmap="viridis")
    plt.xlabel("Time")
    plt.ylabel("Mel Filterbanks")
    plt.title(f"{title} Spectrogram")
    plt.colorbar(format="%+2.0f dB")
    plt.tight_layout()
    Path(plot_dir).mkdir(parents=True, exist_ok=True)
    plt.savefig(f"{plot_dir}/{title}_spectrogram.svg")
    plt.close()
