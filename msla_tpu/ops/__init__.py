"""Compute ops: VQ core (+ fused Pallas kernels), fused conv stems, MLM
argmax, flash attention, STFT/mel, audio metrics."""
from msla_tpu.ops.conv_stem import conv_stem
from msla_tpu.ops.deconv_stem import deconv_stem
from msla_tpu.ops.flash_attn import scaled_attention
from msla_tpu.ops.metrics import l1_loss, mse_loss, si_sdr, si_sdr_mean
from msla_tpu.ops.mlm_argmax import mlm_argmax
from msla_tpu.ops.stft import (amplitude_to_db, hann_window, istft, mel_filterbank,
                               mel_spectrogram, spectrogram, stft)
from msla_tpu.ops.vq import VQResult, nearest_codes, one_hot_encodings, vector_quantize

__all__ = [
    "VQResult", "amplitude_to_db", "conv_stem", "deconv_stem", "hann_window",
    "istft", "l1_loss", "mel_filterbank", "mel_spectrogram", "mlm_argmax",
    "mse_loss", "nearest_codes", "one_hot_encodings", "scaled_attention",
    "si_sdr", "si_sdr_mean", "spectrogram", "stft", "vector_quantize",
]
