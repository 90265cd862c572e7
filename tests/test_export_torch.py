"""Reverse migration: flax params → reference torch state_dicts.

Pins the exporters in utils/torch_compat.py (vqvae_params_to_torch,
transformer_params_to_torch) two ways: exact roundtrip through the
parity-pinned importers, and a real torch `load_state_dict` + forward
equality against the reference's own modules (imported read-only from
/root/reference, as in tests/test_parity_torch.py)."""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

try:
    from src.model.components.decoder import Decoder as TorchDecoder
    from src.model.components.encoder import Encoder as TorchEncoder
    from src.model.components.vector_quantizer import VectorQuantizer as TorchVQ
    HAVE_REF = True
except Exception:  # pragma: no cover - reference not mounted
    HAVE_REF = False

import jax
import jax.numpy as jnp

from msla_tpu.nn.transformer_net import DecoderLayer
from msla_tpu.nn.vqvae_net import VQVAENet
from msla_tpu.utils.torch_compat import (decoder_layer_params_from_torch,
                                         decoder_layer_params_to_torch,
                                         transformer_params_to_torch,
                                         vqvae_params_from_torch,
                                         vqvae_params_to_torch)

TOL = dict(rtol=1e-4, atol=1e-5)


def _init_vqvae_params():
    net = VQVAENet(num_hidden=16, num_residual_layer=2, num_residual_hidden=8,
                   num_embedding=32, embedding_dim=8, commitment_cost=0.25)
    x = jnp.zeros((2, 4, 256))
    return net, net.init(jax.random.PRNGKey(0), x)["params"]


def test_vqvae_export_roundtrips_exactly():
    """to_torch → from_torch is the identity on every trainable leaf."""
    _, params = _init_vqvae_params()
    sd = vqvae_params_to_torch(params, num_residual_layer=2)
    back = vqvae_params_from_torch(sd, num_residual_layer=2)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf), flat_b[path],
                                      err_msg=str(path))


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not available")
def test_vqvae_export_loads_into_reference_modules():
    """strict load_state_dict into the reference's Encoder/VQ/Decoder and
    forward equality over the full encode→quantize→decode chain
    (reference composite: src/model/vqvae.py:41-53)."""
    net, params = _init_vqvae_params()
    sd = {k: torch.from_numpy(v) for k, v in
          vqvae_params_to_torch(params, num_residual_layer=2).items()}

    tenc = TorchEncoder(in_channel=4, num_hidden=16, num_residual_layer=2,
                        num_residual_hidden=8).eval()
    tconv = torch.nn.Conv1d(16, 8, kernel_size=1, stride=1)
    tvq = TorchVQ(num_embedding=32, embedding_dim=8, commitment_cost=0.25).eval()
    tdec = TorchDecoder(in_channel=8, num_hidden=16, num_residual_layer=2,
                        num_residual_hidden=8).eval()

    def sub(prefix):
        return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    tenc.load_state_dict(sub("encoder."), strict=True)
    tconv.load_state_dict(sub("conv."), strict=True)
    tvq.load_state_dict(sub("vector_quantizer."), strict=True)
    tdec.load_state_dict(sub("decoder."), strict=True)

    x_bcw = np.random.default_rng(3).standard_normal((2, 4, 256)).astype(np.float32)
    with torch.no_grad():
        z = tconv(tenc(torch.from_numpy(x_bcw)))
        _, _, quantized, *_ = tvq(z)
        want = tdec(quantized).numpy()

    out = net.apply({"params": params}, jnp.asarray(x_bcw))
    np.testing.assert_allclose(np.asarray(out.output), want, **TOL)


def test_transformer_export_loads_into_torch_layer():
    """strict load into torch.nn.TransformerDecoderLayer; forward equality
    with the zero memory the reference always feeds
    (reference: src/model/transformer.py:72-74)."""
    e, h, b, s = 32, 4, 2, 8
    layer = DecoderLayer(e, h, zero_memory=True)
    x = np.random.default_rng(5).standard_normal((b, s, e)).astype(np.float32)
    params = layer.init(jax.random.PRNGKey(1), jnp.asarray(x), None,
                        jnp.zeros((s, s)), deterministic=True)["params"]

    sd: dict = {}
    decoder_layer_params_to_torch(sd, "l", params, zero_memory=True)
    tlayer = torch.nn.TransformerDecoderLayer(d_model=e, nhead=h).eval()
    tlayer.load_state_dict({k[2:]: torch.from_numpy(v) for k, v in sd.items()},
                           strict=True)

    from msla_tpu.nn.attention import causal_mask
    tmask = torch.nn.Transformer.generate_square_subsequent_mask(s)
    with torch.no_grad():
        want = tlayer(torch.from_numpy(x).permute(1, 0, 2), torch.zeros(s, b, e),
                      tgt_mask=tmask).permute(1, 0, 2).numpy()
    got = layer.apply({"params": params}, jnp.asarray(x), None,
                      causal_mask(s), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)

    # full-net export strict-loads into a module with the reference's exact
    # attribute layout (src/model/transformer.py:31-43: embedding,
    # positional_encoding w/ pe buffer, transformer_decoder, fc) — the
    # reference class itself needs lightning/torchmetrics/wandb, absent here
    class RefShape(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.embedding = torch.nn.Linear(4, e)
            self.positional_encoding = torch.nn.Module()
            self.positional_encoding.register_buffer(
                "pe", torch.zeros(1, 10000, e))
            self.transformer_decoder = torch.nn.TransformerDecoder(
                torch.nn.TransformerDecoderLayer(d_model=e, nhead=h),
                num_layers=1)
            self.fc = torch.nn.Linear(e, 6)

    full = transformer_params_to_torch({"embedding": {"kernel": np.zeros((4, e), np.float32),
                                                      "bias": np.zeros(e, np.float32)},
                                        "fc": {"kernel": np.zeros((e, 6), np.float32),
                                               "bias": np.zeros(6, np.float32)},
                                        "layer0": params}, num_layers=1)
    RefShape().load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                                for k, v in full.items()}, strict=True)


def test_zero_memory_import_handles_trained_value_bias():
    """A trained reference checkpoint has a NONZERO cross-attn value bias
    (gradients flow into in_proj_bias through the zero-memory path); the
    importer must fold Wout @ bv + bout into the effective constant, not just
    bout."""
    e, h, b, s = 32, 4, 2, 8
    tlayer = torch.nn.TransformerDecoderLayer(d_model=e, nhead=h).eval()
    with torch.no_grad():  # simulate training drift on the value bias
        tlayer.multihead_attn.in_proj_bias[2 * e:] += \
            torch.linspace(-0.5, 0.5, e)
    sd = {f"l.{k}": v for k, v in tlayer.state_dict().items()}
    params = decoder_layer_params_from_torch(sd, "l", zero_memory=True)

    x = np.random.default_rng(7).standard_normal((b, s, e)).astype(np.float32)
    from msla_tpu.nn.attention import causal_mask
    tmask = torch.nn.Transformer.generate_square_subsequent_mask(s)
    with torch.no_grad():
        want = tlayer(torch.from_numpy(x).permute(1, 0, 2), torch.zeros(s, b, e),
                      tgt_mask=tmask).permute(1, 0, 2).numpy()
    got = DecoderLayer(e, h, zero_memory=True).apply(
        {"params": params}, jnp.asarray(x), None, causal_mask(s),
        deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)
