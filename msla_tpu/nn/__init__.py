"""Neural network modules (flax) — the L2 component layer (SURVEY.md §1)."""
from msla_tpu.nn.attention import MultiHeadAttention, causal_mask
from msla_tpu.nn.bert import BertConfig, BertForMaskedLM
from msla_tpu.nn.decoder import Decoder
from msla_tpu.nn.encoder import Encoder
from msla_tpu.nn.layers import Conv1d, ConvTranspose1d, Linear
from msla_tpu.nn.perceptual_loss import PerceptualLoss
from msla_tpu.nn.positional import PositionalEncoding
from msla_tpu.nn.residual_stack import ResidualStack
from msla_tpu.nn.transformer_net import DecoderLayer, TransformerQuantizerNet
from msla_tpu.nn.vector_quantizer import VectorQuantizer
from msla_tpu.nn.vgg import VGG16Features
from msla_tpu.nn.vqvae_net import VQVAENet

__all__ = [
    "BertConfig", "BertForMaskedLM", "Conv1d", "ConvTranspose1d", "Decoder",
    "DecoderLayer", "Encoder", "Linear", "MultiHeadAttention", "PerceptualLoss",
    "PositionalEncoding", "ResidualStack", "TransformerQuantizerNet",
    "VGG16Features", "VQVAENet", "VectorQuantizer", "causal_mask",
]
