"""Jitted inference paths (BASELINE.json north star: "mixture-encode →
per-stem-decode separation and autoregressive code sampling → decode
generation run as jitted inference paths").

The reference only ever separates fixed 2-second frames inside its eval loops;
this module packages the same models behind production-shaped APIs:

* SourceSeparator — full-song mixture → 4 stems: frames the waveform into the
  training window size, runs one jitted batched encode/VQ/decode, and stitches
  the frames back (static shapes; one compile per (window, batch) bucket).
* AudioGenerator — the reference's BERT generation path (main.py:184-211) plus
  a direct code-indices → waveform decode.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from msla_tpu.nn.vqvae_net import VQVAENet


class SourceSeparator:
    """Mixture waveform → per-stem waveforms through the trained VQ-VAE."""

    def __init__(self, task, params, frame_samples: int, batch_size: int = 16):
        self.task = task
        self.params = params
        self.frame_samples = int(frame_samples)
        self.batch_size = int(batch_size)

        net: VQVAENet = task.net

        @jax.jit
        def _separate(params, frames):  # frames: (B, 4, F)
            # inference composite: encode → VQ (inference=True → the jnp
            # path, so XLA DCEs the loss/perplexity outputs) → decode; the
            # waveform equals net(frames).output, which would route VQ
            # through the all-outputs fused TRAINING kernel instead
            q = net.apply({"params": params}, frames,
                          method=VQVAENet.get_quantized).quantized
            return net.apply({"params": params}, q, method=VQVAENet.decode)

        self._separate = _separate

    def separate(self, mixture: np.ndarray, overlap: bool = False) -> np.ndarray:
        """(T,) mixture → (4, T) stems. T is padded up to whole frames.

        overlap=True separates 50%-overlapped frames and cross-fades them
        with a triangular window — removes frame-boundary discontinuities at
        2× the compute (production-quality mode; the reference has no
        full-song path at all).
        """
        mixture = np.asarray(mixture, np.float32).reshape(-1)
        t = mixture.shape[0]
        f = self.frame_samples
        hop = f // 2 if overlap else f
        n_frames = max(1, -(-max(t - f, 0) // hop) + 1)
        total = (n_frames - 1) * hop + f
        padded_sig = np.pad(mixture, (0, total - t))
        frames = np.stack([padded_sig[i * hop: i * hop + f] for i in range(n_frames)])

        out_frames = []
        for start in range(0, n_frames, self.batch_size):
            chunk = frames[start:start + self.batch_size]
            # fixed batch bucket → one compile; mask out padding rows
            rows = chunk.shape[0]
            if rows < self.batch_size:
                chunk = np.pad(chunk, ((0, self.batch_size - rows), (0, 0)))
            model_in = jnp.asarray(chunk)[:, None, :].repeat(4, axis=1)  # (B,4,F)
            stems = np.asarray(self._separate(self.params, model_in))
            out_frames.append(stems[:rows])
        sep = np.concatenate(out_frames, axis=0)  # (n_frames, 4, F)

        if not overlap:
            stems = sep.transpose(1, 0, 2).reshape(4, n_frames * f)
            return stems[:, :t]

        # triangular cross-fade overlap-add with weight normalization
        window = np.bartlett(f).astype(np.float32) + 1e-3
        out = np.zeros((4, total), np.float32)
        weight = np.zeros(total, np.float32)
        for i in range(n_frames):
            sl = slice(i * hop, i * hop + f)
            out[:, sl] += sep[i] * window
            weight[sl] += window
        return (out / weight).astype(np.float32)[:, :t]

    def encode_codes(self, mixture: np.ndarray) -> np.ndarray:
        """(T,) mixture → (n_frames, W) codebook indices (for LM pipelines)."""
        mixture = np.asarray(mixture, np.float32).reshape(-1)
        f = self.frame_samples
        n_frames = -(-mixture.shape[0] // f)
        padded = np.pad(mixture, (0, n_frames * f - mixture.shape[0])).reshape(n_frames, f)
        model_in = jnp.asarray(padded)[:, None, :].repeat(4, axis=1)
        q = self.task.get_quantized(self.params, model_in)
        return np.asarray(q.encoding_indices)


class AudioGenerator:
    """BERT-driven reconstruction/generation over codebook indices."""

    def __init__(self, bert_task, bert_params, vqvae_task, vqvae_params):
        self.bert_task = bert_task
        self.bert_params = bert_params
        self.vqvae_task = vqvae_task
        self.vqvae_params = vqvae_params

    def corrupt_and_generate(self, stems: np.ndarray, corrupt_stem: int,
                             rng: np.random.Generator | None = None) -> np.ndarray:
        """The reference generate() semantics (main.py:200-203): replace one
        stem with noise, quantize through the frozen VQ-VAE, reconstruct
        through BERT. stems: (B, 4, T) → (B, 4, T)."""
        rng = rng or np.random.default_rng()
        stems = np.asarray(stems, np.float32).copy()
        stems[:, corrupt_stem, :] = rng.random(stems.shape[-1], dtype=np.float32)
        q = self.vqvae_task.get_quantized(self.vqvae_params, jnp.asarray(stems))
        out = self.bert_task.predict_step(self.bert_params,
                                          (q.encoding_indices, jnp.asarray(stems)))
        return np.asarray(out)

    def decode_codes(self, indices: np.ndarray) -> np.ndarray:
        """(B, W) code indices → (B, 4, T) stems straight through the VQ-VAE
        decoder (autoregressive-sampling consumers plug in here)."""
        net: VQVAENet = self.vqvae_task.net
        out = net.apply({"params": self.vqvae_params}, jnp.asarray(indices, jnp.int32),
                        method=VQVAENet.decode_indices)
        return np.asarray(out)

    def sample_codes(self, width: int, batch: int = 1, rounds: int = 4,
                     seed: int = 0, prompt: np.ndarray | None = None) -> np.ndarray:
        """Iterative masked code sampling (BASELINE north star's
        "code sampling → decode" generation path).

        MaskGIT-style refinement over the masked-LM: start from all-[MASK]
        (or a partial `prompt` with -1 at unknown positions), repeatedly run
        the Audio-BERT forward mapping, keep the most-confident fraction of
        positions each round and re-mask the rest. Returns (B, width) codebook
        indices; feed to decode_codes for waveforms.
        """
        import jax

        cfg = self.bert_task.config
        rng = np.random.default_rng(seed)
        codes = np.full((batch, width), -1, np.int64)
        if prompt is not None:
            codes[:, :] = prompt

        params = self.bert_params
        if isinstance(params, dict) and "params" in params:
            params = params["params"]

        for r in range(rounds):
            unknown = codes < 0
            tokens = np.where(unknown, cfg.mask_token_id, codes)
            proposal = np.asarray(self.bert_task.code_proposals(
                params, jnp.asarray(tokens, jnp.int32)))
            codes_new, confidence = proposal[..., 0].astype(np.int64), proposal[..., 1]
            if r == rounds - 1:
                codes = np.where(unknown, codes_new, codes)
                break
            # keep the most confident fraction of the still-unknown positions
            keep_frac = (r + 1) / rounds
            for b in range(batch):
                unk_idx = np.flatnonzero(unknown[b])
                if unk_idx.size == 0:
                    continue
                order = np.argsort(-confidence[b, unk_idx]
                                   + 1e-6 * rng.standard_normal(unk_idx.size))
                n_keep = max(1, int(keep_frac * unk_idx.size))
                chosen = unk_idx[order[:n_keep]]
                codes[b, chosen] = codes_new[b, chosen]
        return codes.astype(np.int64)

    def generate_waveform(self, width: int, batch: int = 1, rounds: int = 4,
                          seed: int = 0) -> np.ndarray:
        """Sample codes and decode them to (B, 4, T) stems."""
        codes = self.sample_codes(width, batch=batch, rounds=rounds, seed=seed)
        return self.decode_codes(codes)
