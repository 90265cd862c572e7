"""Torch-checkpoint ↔ flax-params conversion.

Converts a reference-style PyTorch ``state_dict`` (reference: src/main.py:65-66
loads ``best_vqvae.ckpt['state_dict']``) into the flax param tree of
msla_tpu.nn.vqvae_net.VQVAENet, so pretrained reference checkpoints and parity
tests map 1:1. Weight layout conventions:

* torch Conv1d weight (out, in, k)          → flax Conv kernel (k, in, out)
* torch ConvTranspose1d weight (in, out, k) → flax ConvTranspose
  (transpose_kernel=True) kernel (k, out, in)
* torch Linear weight (out, in)             → flax Dense kernel (in, out)
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def conv_kernel(w: Any) -> np.ndarray:
    return _np(w).transpose(2, 1, 0)  # (out,in,k) -> (k,in,out)


def conv_transpose_kernel(w: Any) -> np.ndarray:
    return _np(w).transpose(2, 1, 0)  # (in,out,k) -> (k,out,in)


def linear_kernel(w: Any) -> np.ndarray:
    return _np(w).transpose(1, 0)  # (out,in) -> (in,out)


def _residual_stack(sd: Mapping[str, Any], prefix: str, num_layers: int) -> dict:
    out = {}
    for i in range(num_layers):
        # reference Sequential: [ReLU, Conv k3, ReLU, Conv k1] → indices 1 and 3
        out[f"block{i}_conv3"] = {"conv": {"kernel": conv_kernel(
            sd[f"{prefix}.residual_layers.{i}.1.weight"])}}
        out[f"block{i}_conv1"] = {"conv": {"kernel": conv_kernel(
            sd[f"{prefix}.residual_layers.{i}.3.weight"])}}
    return out


def _conv(sd: Mapping[str, Any], key: str) -> dict:
    entry = {"kernel": conv_kernel(sd[f"{key}.weight"])}
    if f"{key}.bias" in sd:
        entry["bias"] = _np(sd[f"{key}.bias"])
    return {"conv": entry}


def _conv_t(sd: Mapping[str, Any], key: str) -> dict:
    entry = {"kernel": conv_transpose_kernel(sd[f"{key}.weight"])}
    if f"{key}.bias" in sd:
        entry["bias"] = _np(sd[f"{key}.bias"])
    return {"conv": entry}


def mha_params_from_torch(sd: Mapping[str, Any], prefix: str) -> dict:
    """torch nn.MultiheadAttention (packed in_proj) → our MultiHeadAttention."""
    w = _np(sd[f"{prefix}.in_proj_weight"])  # (3E, E)
    b = _np(sd[f"{prefix}.in_proj_bias"])    # (3E,)
    e = w.shape[1]
    return {
        "q_proj": {"kernel": w[:e].T, "bias": b[:e]},
        "k_proj": {"kernel": w[e:2 * e].T, "bias": b[e:2 * e]},
        "v_proj": {"kernel": w[2 * e:].T, "bias": b[2 * e:]},
        "out_proj": {"kernel": linear_kernel(sd[f"{prefix}.out_proj.weight"]),
                     "bias": _np(sd[f"{prefix}.out_proj.bias"])},
    }


def _layernorm(sd: Mapping[str, Any], key: str) -> dict:
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def _linear(sd: Mapping[str, Any], key: str) -> dict:
    return {"kernel": linear_kernel(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def decoder_layer_params_from_torch(sd: Mapping[str, Any], prefix: str,
                                    zero_memory: bool = True) -> dict:
    """torch nn.TransformerDecoderLayer → our DecoderLayer."""
    params = {
        "self_attn": mha_params_from_torch(sd, f"{prefix}.self_attn"),
        "linear1": _linear(sd, f"{prefix}.linear1"),
        "linear2": _linear(sd, f"{prefix}.linear2"),
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
        "norm3": _layernorm(sd, f"{prefix}.norm3"),
    }
    if zero_memory:
        # zero-memory cross-attention reduces to the out-proj bias
        params["cross_attn_out_bias"] = _np(sd[f"{prefix}.multihead_attn.out_proj.bias"])
    else:
        params["cross_attn"] = mha_params_from_torch(sd, f"{prefix}.multihead_attn")
    return params


def transformer_params_from_torch(sd: Mapping[str, Any], num_layers: int,
                                  zero_memory: bool = True) -> dict:
    """Reference TransformerQuantizerDecoder state_dict → TransformerQuantizerNet."""
    params = {
        "embedding": _linear(sd, "embedding"),
        "fc": _linear(sd, "fc"),
    }
    for i in range(num_layers):
        params[f"layer{i}"] = decoder_layer_params_from_torch(
            sd, f"transformer_decoder.layers.{i}", zero_memory)
    return params


def vgg16_params_from_torch(sd: Mapping[str, Any]) -> dict:
    """torchvision vgg16().features state_dict → VGG16Features params.

    torch Conv2d weight (out, in, kh, kw) → flax Conv kernel (kh, kw, in, out).
    """
    params: dict = {}
    conv_idx = 0
    layer_idx = 0
    from msla_tpu.nn.vgg import VGG16_PLAN

    for spec in VGG16_PLAN:
        if spec == "M":
            layer_idx += 1
            continue
        w = _np(sd[f"features.{layer_idx}.weight"]).transpose(2, 3, 1, 0)
        b = _np(sd[f"features.{layer_idx}.bias"])
        params[f"conv{conv_idx}"] = {"kernel": w, "bias": b}
        conv_idx += 1
        layer_idx += 2  # conv + relu
    return params


def bert_params_from_hf(sd: Mapping[str, Any], num_layers: int = 12) -> dict:
    """HF BertForMaskedLM state_dict → msla_tpu.nn.bert.BertForMaskedLM params."""
    params: dict = {
        "embeddings": {
            "word_embeddings": {"embedding": _np(sd["bert.embeddings.word_embeddings.weight"])},
            "position_embeddings": {"embedding": _np(sd["bert.embeddings.position_embeddings.weight"])},
            "token_type_embeddings": {"embedding": _np(sd["bert.embeddings.token_type_embeddings.weight"])},
            "layer_norm": {"scale": _np(sd["bert.embeddings.LayerNorm.weight"]),
                           "bias": _np(sd["bert.embeddings.LayerNorm.bias"])},
        },
        "mlm_transform": _linear(sd, "cls.predictions.transform.dense"),
        "mlm_norm": {"scale": _np(sd["cls.predictions.transform.LayerNorm.weight"]),
                     "bias": _np(sd["cls.predictions.transform.LayerNorm.bias"])},
        "mlm_bias": _np(sd["cls.predictions.bias"]),
    }
    for i in range(num_layers):
        p = f"bert.encoder.layer.{i}"
        params[f"layer{i}"] = {
            "attention": {
                "q_proj": _linear(sd, f"{p}.attention.self.query"),
                "k_proj": _linear(sd, f"{p}.attention.self.key"),
                "v_proj": _linear(sd, f"{p}.attention.self.value"),
                "out_proj": _linear(sd, f"{p}.attention.output.dense"),
            },
            "attention_norm": _layernorm(sd, f"{p}.attention.output.LayerNorm"),
            "intermediate": _linear(sd, f"{p}.intermediate.dense"),
            "output": _linear(sd, f"{p}.output.dense"),
            "output_norm": _layernorm(sd, f"{p}.output.LayerNorm"),
        }
    return params


def vqvae_params_from_torch(sd: Mapping[str, Any], num_residual_layer: int) -> dict:
    """Reference VQVAE state_dict → VQVAENet params tree."""
    return {
        "encoder": {
            "conv1": _conv(sd, "encoder.conv1"),
            "conv2": _conv(sd, "encoder.conv2"),
            "conv3": _conv(sd, "encoder.conv3"),
            "residual_stack": _residual_stack(sd, "encoder.residual_stack", num_residual_layer),
        },
        "pre_vq_conv": _conv(sd, "conv"),
        "vector_quantizer": {"codebook": _np(sd["vector_quantizer.codebook.weight"])},
        "decoder": {
            "conv1": _conv(sd, "decoder.conv1"),
            "residual_stack": _residual_stack(sd, "decoder.residual_stack", num_residual_layer),
            "conv1_transpose": _conv_t(sd, "decoder.conv1_transpose"),
            "conv2_transpose": _conv_t(sd, "decoder.conv2_transpose"),
        },
    }
