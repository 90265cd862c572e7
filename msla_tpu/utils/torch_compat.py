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
        # zero-memory cross-attention reduces to a constant: with memory = 0
        # every value row equals the v in-proj bias bv, the softmax average of
        # identical rows is bv, and the out projection maps it to
        # Wout @ bv + bout. bv is zero at torch init (MultiheadAttention
        # constant-zeros in_proj_bias) but NONZERO in trained reference
        # checkpoints — gradients flow into bv through the zero-memory path
        # (reference: src/model/transformer.py:72-74 trains exactly this way).
        wout = _np(sd[f"{prefix}.multihead_attn.out_proj.weight"])  # (E, E)
        bout = _np(sd[f"{prefix}.multihead_attn.out_proj.bias"])
        in_bias = _np(sd[f"{prefix}.multihead_attn.in_proj_bias"])
        bv = in_bias[2 * (in_bias.shape[0] // 3):]
        params["cross_attn_out_bias"] = wout @ bv + bout
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


# ---- export: flax params → reference torch state_dicts ------------------------
#
# Exact inverses of the importers above, so users can migrate BACK: train in
# msla_tpu, export, and `load_state_dict` into the reference's torch modules
# (reference: src/main.py:65-66 consumes exactly these key layouts).

def _p(tree: Mapping[str, Any], *path: str) -> np.ndarray:
    leaf: Any = tree
    for k in path:
        leaf = leaf[k]
    return np.asarray(leaf, dtype=np.float32)


def _linear_to(sd: dict, key: str, p: Mapping[str, Any]) -> None:
    sd[f"{key}.weight"] = _p(p, "kernel").T          # (in,out) -> (out,in)
    sd[f"{key}.bias"] = _p(p, "bias")


def _conv_to(sd: dict, key: str, p: Mapping[str, Any]) -> None:
    sd[f"{key}.weight"] = _p(p, "conv", "kernel").transpose(2, 1, 0)
    if "bias" in p["conv"]:
        sd[f"{key}.bias"] = _p(p, "conv", "bias")


# reversing the axes is the right map for BOTH conv layouts: flax Conv
# (k,in,out)→torch (out,in,k) and flax ConvTranspose transpose_kernel
# (k,out,in)→torch (in,out,k)
_conv_t_to = _conv_to


def _layernorm_to(sd: dict, key: str, p: Mapping[str, Any]) -> None:
    sd[f"{key}.weight"] = _p(p, "scale")
    sd[f"{key}.bias"] = _p(p, "bias")


def _residual_stack_to(sd: dict, prefix: str, p: Mapping[str, Any],
                       num_layers: int) -> None:
    for i in range(num_layers):
        sd[f"{prefix}.residual_layers.{i}.1.weight"] = \
            _p(p, f"block{i}_conv3", "conv", "kernel").transpose(2, 1, 0)
        sd[f"{prefix}.residual_layers.{i}.3.weight"] = \
            _p(p, f"block{i}_conv1", "conv", "kernel").transpose(2, 1, 0)


def mha_params_to_torch(sd: dict, prefix: str, p: Mapping[str, Any]) -> None:
    """Our MultiHeadAttention → torch nn.MultiheadAttention (packed in_proj)."""
    qw, kw, vw = (_p(p, n, "kernel").T for n in ("q_proj", "k_proj", "v_proj"))
    qb, kb, vb = (_p(p, n, "bias") for n in ("q_proj", "k_proj", "v_proj"))
    sd[f"{prefix}.in_proj_weight"] = np.concatenate([qw, kw, vw], axis=0)
    sd[f"{prefix}.in_proj_bias"] = np.concatenate([qb, kb, vb], axis=0)
    sd[f"{prefix}.out_proj.weight"] = _p(p, "out_proj", "kernel").T
    sd[f"{prefix}.out_proj.bias"] = _p(p, "out_proj", "bias")


def decoder_layer_params_to_torch(sd: dict, prefix: str, p: Mapping[str, Any],
                                  zero_memory: bool = True) -> None:
    """Our DecoderLayer → torch nn.TransformerDecoderLayer state entries."""
    mha_params_to_torch(sd, f"{prefix}.self_attn", p["self_attn"])
    _linear_to(sd, f"{prefix}.linear1", p["linear1"])
    _linear_to(sd, f"{prefix}.linear2", p["linear2"])
    for n in ("norm1", "norm2", "norm3"):
        _layernorm_to(sd, f"{prefix}.{n}", p[n])
    if zero_memory:
        # our zero-memory layer carries only the effective constant; emit a
        # cross-attention whose in/out projections are zero and whose out-proj
        # bias is that constant — torch then computes softmax(0)·(V=0) → 0,
        # plus the bias: numerically identical for any memory the reference
        # feeds (it always feeds zeros, src/model/transformer.py:72-74)
        e = _p(p, "cross_attn_out_bias").shape[0]
        sd[f"{prefix}.multihead_attn.in_proj_weight"] = np.zeros((3 * e, e), np.float32)
        sd[f"{prefix}.multihead_attn.in_proj_bias"] = np.zeros(3 * e, np.float32)
        sd[f"{prefix}.multihead_attn.out_proj.weight"] = np.zeros((e, e), np.float32)
        sd[f"{prefix}.multihead_attn.out_proj.bias"] = _p(p, "cross_attn_out_bias")
    else:
        mha_params_to_torch(sd, f"{prefix}.multihead_attn", p["cross_attn"])


def transformer_params_to_torch(params: Mapping[str, Any], num_layers: int,
                                zero_memory: bool = True,
                                max_len: int = 10000) -> dict:
    """TransformerQuantizerNet params → reference TransformerQuantizerDecoder
    state_dict, STRICT-loadable: includes the deterministic sinusoidal
    `positional_encoding.pe` buffer the reference registers
    (src/model/transformer.py:212-222, shape (1, max_len, d_model))."""
    sd: dict = {}
    _linear_to(sd, "embedding", params["embedding"])
    _linear_to(sd, "fc", params["fc"])
    for i in range(num_layers):
        decoder_layer_params_to_torch(sd, f"transformer_decoder.layers.{i}",
                                      params[f"layer{i}"], zero_memory)
    from msla_tpu.nn.positional import sinusoidal_table

    d_model = _p(params["embedding"], "kernel").shape[1]
    sd["positional_encoding.pe"] = sinusoidal_table(max_len, d_model)[None]
    return sd


def vqvae_params_to_torch(params: Mapping[str, Any], num_residual_layer: int) -> dict:
    """VQVAENet params → reference VQVAE state_dict (src/model/components)."""
    sd: dict = {}
    enc = params["encoder"]
    for k in ("conv1", "conv2", "conv3"):
        _conv_to(sd, f"encoder.{k}", enc[k])
    _residual_stack_to(sd, "encoder.residual_stack", enc["residual_stack"],
                       num_residual_layer)
    _conv_to(sd, "conv", params["pre_vq_conv"])
    sd["vector_quantizer.codebook.weight"] = _p(params, "vector_quantizer",
                                                "codebook")
    dec = params["decoder"]
    _conv_to(sd, "decoder.conv1", dec["conv1"])
    _residual_stack_to(sd, "decoder.residual_stack", dec["residual_stack"],
                       num_residual_layer)
    _conv_t_to(sd, "decoder.conv1_transpose", dec["conv1_transpose"])
    _conv_t_to(sd, "decoder.conv2_transpose", dec["conv2_transpose"])
    return sd


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
