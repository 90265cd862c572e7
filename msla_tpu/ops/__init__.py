"""Compute ops: VQ core (+ Pallas kernel), STFT/mel, audio metrics."""
from msla_tpu.ops.metrics import l1_loss, mse_loss, si_sdr, si_sdr_mean
from msla_tpu.ops.stft import (amplitude_to_db, hann_window, istft, mel_filterbank,
                               mel_spectrogram, spectrogram, stft)
from msla_tpu.ops.vq import VQResult, nearest_codes, one_hot_encodings, vector_quantize

__all__ = [
    "VQResult", "amplitude_to_db", "hann_window", "istft", "l1_loss",
    "mel_filterbank", "mel_spectrogram", "mse_loss", "nearest_codes",
    "one_hot_encodings", "si_sdr", "si_sdr_mean", "spectrogram", "stft",
    "vector_quantize",
]
