"""Numerical parity vs. the reference's torch components.

The reference repository is mounted read-only at /root/reference; its nn
components (src/model/components/*) import only torch, so we can instantiate
them, copy weights into our flax modules, and assert outputs match at fp32
tolerance (BASELINE.json north star: code indices and reconstructions match
at fp32 tolerance). This is behavioral equivalence testing — no reference
code is copied into this repo.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

try:
    from src.model.components.encoder import Encoder as TorchEncoder
    from src.model.components.decoder import Decoder as TorchDecoder
    from src.model.components.residual_stack import ResidualStack as TorchResidualStack
    from src.model.components.vector_quantizer import VectorQuantizer as TorchVQ
    HAVE_REF = True
except Exception:  # pragma: no cover - reference not mounted
    HAVE_REF = False

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference repo not available")

import jax
import jax.numpy as jnp

from msla_tpu.nn.decoder import Decoder
from msla_tpu.nn.encoder import Encoder
from msla_tpu.nn.residual_stack import ResidualStack
from msla_tpu.ops.vq import one_hot_encodings, vector_quantize
from msla_tpu.utils.torch_compat import (_conv, _conv_t, _residual_stack, _np)

TOL = dict(rtol=1e-4, atol=1e-5)


def to_nwc(x_bcw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(x_bcw.transpose(0, 2, 1))


def from_nwc(y: jnp.ndarray) -> np.ndarray:
    return np.asarray(y).transpose(0, 2, 1)


@pytest.fixture(scope="module")
def x_bcw():
    rng = np.random.default_rng(7)
    return rng.standard_normal((2, 4, 256)).astype(np.float32)


def test_residual_stack_parity():
    tmod = TorchResidualStack(in_channel=16, num_hidden=16, num_residual_layer=2,
                              num_residual_hidden=8).eval()
    sd = {f"residual_stack.{k}": v for k, v in tmod.state_dict().items()}
    params = _residual_stack(sd, "residual_stack", 2)

    x = np.random.default_rng(1).standard_normal((2, 16, 64)).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(x.copy())).numpy()

    mod = ResidualStack(num_hidden=16, num_residual_layer=2, num_residual_hidden=8)
    got = from_nwc(mod.apply({"params": params}, to_nwc(x)))
    np.testing.assert_allclose(got, want, **TOL)


def test_encoder_parity(x_bcw):
    tmod = TorchEncoder(in_channel=4, num_hidden=32, num_residual_layer=2,
                        num_residual_hidden=8).eval()
    sd = tmod.state_dict()
    params = {
        "conv1": _conv(sd, "conv1"),
        "conv2": _conv(sd, "conv2"),
        "conv3": _conv(sd, "conv3"),
        "residual_stack": _residual_stack(sd, "residual_stack", 2),
    }
    with torch.no_grad():
        want = tmod(torch.from_numpy(x_bcw.copy())).numpy()
    mod = Encoder(num_hidden=32, num_residual_layer=2, num_residual_hidden=8)
    got = from_nwc(mod.apply({"params": params}, to_nwc(x_bcw)))
    assert got.shape == want.shape  # (2, 32, 64) BCW vs ours transposed
    np.testing.assert_allclose(got, want, **TOL)


def test_decoder_parity():
    tmod = TorchDecoder(in_channel=8, num_hidden=32, num_residual_layer=2,
                        num_residual_hidden=8).eval()
    sd = tmod.state_dict()
    params = {
        "conv1": _conv(sd, "conv1"),
        "residual_stack": _residual_stack(sd, "residual_stack", 2),
        "conv1_transpose": _conv_t(sd, "conv1_transpose"),
        "conv2_transpose": _conv_t(sd, "conv2_transpose"),
    }
    x = np.random.default_rng(3).standard_normal((2, 8, 64)).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(x.copy())).numpy()
    mod = Decoder(num_hidden=32, num_residual_layer=2, num_residual_hidden=8)
    got = from_nwc(mod.apply({"params": params}, to_nwc(x)))
    assert got.shape == want.shape == (2, 4, 256)  # 4x upsample
    np.testing.assert_allclose(got, want, **TOL)


def test_vector_quantizer_parity():
    tmod = TorchVQ(num_embedding=32, embedding_dim=8, commitment_cost=0.25).eval()
    codebook = _np(tmod.codebook.weight)

    x = np.random.default_rng(5).standard_normal((2, 8, 64)).astype(np.float32) * 0.05
    with torch.no_grad():
        t_emb, t_com, t_q, t_perp, t_enc, t_idx = tmod(torch.from_numpy(x.copy()))

    res = vector_quantize(to_nwc(x), jnp.asarray(codebook), 0.25, use_pallas=False)

    np.testing.assert_array_equal(np.asarray(res.encoding_indices).reshape(-1),
                                  t_idx.numpy().reshape(-1))
    np.testing.assert_allclose(from_nwc(res.quantized_ste), t_q.numpy(), **TOL)
    np.testing.assert_allclose(float(res.embedding_loss), float(t_emb), **TOL)
    np.testing.assert_allclose(float(res.commitment_loss), float(t_com), **TOL)
    np.testing.assert_allclose(float(res.perplexity), float(t_perp), **TOL)
    np.testing.assert_array_equal(
        np.asarray(one_hot_encodings(res.encoding_indices, 32)), t_enc.numpy())


def test_full_vqvae_forward_parity():
    """Complete mixture→stems pipeline (encoder → 1×1 conv → VQ → decoder)
    matches the reference's forward composition (vqvae.py:81-86) end to end,
    including code indices — the BASELINE north-star parity claim."""
    tenc = TorchEncoder(in_channel=4, num_hidden=32, num_residual_layer=2,
                        num_residual_hidden=8).eval()
    tconv = torch.nn.Conv1d(32, 8, kernel_size=1, stride=1).eval()
    tvq = TorchVQ(num_embedding=32, embedding_dim=8, commitment_cost=0.25).eval()
    tdec = TorchDecoder(in_channel=8, num_hidden=32, num_residual_layer=2,
                        num_residual_hidden=8).eval()

    x = (np.random.default_rng(21).standard_normal((2, 4, 512)) * 0.3).astype(np.float32)
    with torch.no_grad():
        z = tconv(tenc(torch.from_numpy(x.copy())))
        t_emb, t_com, t_q, t_perp, _, t_idx = tvq(z)
        want = tdec(t_q).numpy()

    from msla_tpu.nn.vqvae_net import VQVAENet
    from msla_tpu.utils.torch_compat import vqvae_params_from_torch

    sd = {}
    sd.update({f"encoder.{k}": v for k, v in tenc.state_dict().items()})
    sd.update({f"conv.{k}": v for k, v in tconv.state_dict().items()})
    sd.update({f"vector_quantizer.codebook.weight": tvq.codebook.weight})
    sd.update({f"decoder.{k}": v for k, v in tdec.state_dict().items()})
    params = vqvae_params_from_torch(sd, num_residual_layer=2)

    net = VQVAENet(num_hidden=32, num_residual_layer=2, num_residual_hidden=8,
                   num_embedding=32, embedding_dim=8, commitment_cost=0.25,
                   use_pallas=False)
    out = net.apply({"params": params}, jnp.asarray(x))
    q = net.apply({"params": params}, jnp.asarray(x),
                  method=VQVAENet.get_quantized)

    np.testing.assert_array_equal(np.asarray(q.encoding_indices).reshape(-1),
                                  t_idx.numpy().reshape(-1))
    np.testing.assert_allclose(np.asarray(out.output), want, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(float(out.embedding_loss), float(t_emb), **TOL)
    np.testing.assert_allclose(float(out.commitment_loss), float(t_com), **TOL)
    np.testing.assert_allclose(float(out.perplexity), float(t_perp), **TOL)


def test_vq_ste_gradient_is_identity():
    """d loss/d x through the STE equals the gradient w.r.t. quantized output."""
    codebook = jnp.asarray(np.random.default_rng(9).standard_normal((16, 4)), jnp.float32)
    x = jnp.asarray(np.random.default_rng(10).standard_normal((8, 4)), jnp.float32)

    def loss(x):
        res = vector_quantize(x, codebook, 0.25, use_pallas=False)
        return jnp.sum(res.quantized_ste * 2.0)

    g = jax.grad(loss)(x)
    np.testing.assert_allclose(np.asarray(g), np.full_like(x, 2.0), rtol=1e-6)


def test_vq_codebook_gradient_matches_torch():
    """Codebook grads via gather match the reference's one-hot matmul path."""
    tmod = TorchVQ(num_embedding=16, embedding_dim=4, commitment_cost=0.25)
    codebook = _np(tmod.codebook.weight)
    x_np = np.random.default_rng(11).standard_normal((2, 4, 32)).astype(np.float32) * 0.1

    xt = torch.from_numpy(x_np.copy()).requires_grad_(True)
    emb, com, q, _, _, _ = tmod(xt)
    (emb + com).backward()
    want_cb = tmod.codebook.weight.grad.numpy()
    want_x = xt.grad.numpy()

    def loss(cb, x):
        res = vector_quantize(x, cb, 0.25, use_pallas=False)
        return res.embedding_loss + res.commitment_loss

    g_cb, g_x = jax.grad(loss, argnums=(0, 1))(jnp.asarray(codebook), to_nwc(x_np))
    np.testing.assert_allclose(np.asarray(g_cb), want_cb, **TOL)
    np.testing.assert_allclose(from_nwc(np.asarray(g_x)[None])[0] if g_x.ndim == 2
                               else np.asarray(g_x).transpose(0, 2, 1), want_x, **TOL)
