"""Task modules (Lightning-hook-equivalent): VQ-VAE, Transformer, Audio-BERT."""
from msla_tpu.models.bert import AudioBertTask
from msla_tpu.models.module import TaskModule
from msla_tpu.models.transformer import TransformerTask
from msla_tpu.models.vqvae import VQVAETask

__all__ = ["AudioBertTask", "TaskModule", "TransformerTask", "VQVAETask"]
