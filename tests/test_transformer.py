"""Transformer stack parity vs torch.nn.TransformerDecoder + task tests."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from msla_tpu.nn.attention import MultiHeadAttention, causal_mask
from msla_tpu.nn.positional import PositionalEncoding, sinusoidal_table
from msla_tpu.nn.transformer_net import DecoderLayer, TransformerQuantizerNet
from msla_tpu.utils.torch_compat import (decoder_layer_params_from_torch,
                                         mha_params_from_torch)

TOL = dict(rtol=2e-4, atol=2e-5)


def test_mha_parity():
    e, h, b, s = 32, 4, 2, 8
    tmha = torch.nn.MultiheadAttention(e, h, batch_first=True).eval()
    sd = {f"mha.{k}": v for k, v in tmha.state_dict().items()}
    params = mha_params_from_torch(sd, "mha")
    x = np.random.default_rng(0).standard_normal((b, s, e)).astype(np.float32)
    with torch.no_grad():
        want, _ = tmha(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x))
    mod = MultiHeadAttention(e, h)
    got = mod.apply({"params": params}, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), **TOL)


def test_mha_causal_mask_parity():
    e, h, b, s = 32, 4, 2, 8
    tmha = torch.nn.MultiheadAttention(e, h, batch_first=True).eval()
    sd = {f"mha.{k}": v for k, v in tmha.state_dict().items()}
    params = mha_params_from_torch(sd, "mha")
    x = np.random.default_rng(1).standard_normal((b, s, e)).astype(np.float32)
    tmask = torch.nn.Transformer.generate_square_subsequent_mask(s)
    with torch.no_grad():
        want, _ = tmha(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x),
                       attn_mask=tmask)
    got = MultiHeadAttention(e, h).apply({"params": params}, jnp.asarray(x),
                                         jnp.asarray(x), jnp.asarray(x),
                                         mask=causal_mask(s))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), **TOL)


def test_decoder_layer_zero_memory_parity():
    e, h, b, s = 32, 4, 2, 8
    tlayer = torch.nn.TransformerDecoderLayer(d_model=e, nhead=h).eval()
    sd = {f"layers.0.{k}": v for k, v in tlayer.state_dict().items()}
    params = decoder_layer_params_from_torch(sd, "layers.0", zero_memory=True)

    x = np.random.default_rng(2).standard_normal((b, s, e)).astype(np.float32)
    mem = torch.zeros(s, b, e)
    tmask = torch.nn.Transformer.generate_square_subsequent_mask(s)
    with torch.no_grad():
        # torch layer is seq-first by default
        want = tlayer(torch.from_numpy(x).permute(1, 0, 2), mem,
                      tgt_mask=tmask).permute(1, 0, 2).numpy()
    got = DecoderLayer(e, h, zero_memory=True).apply(
        {"params": params}, jnp.asarray(x), None, causal_mask(s), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_full_reference_pipeline_parity():
    """Embed → PE (batch-indexed quirk) → 2-layer decoder → reshape → fc,
    composed in torch exactly as the reference's forward executes it."""
    input_dim, s, e, h, out_dim, b = 16, 8, 32, 4, 64, 2

    t_embed = torch.nn.Linear(input_dim, e)
    t_dec = torch.nn.TransformerDecoder(
        torch.nn.TransformerDecoderLayer(d_model=e, nhead=h), num_layers=2).eval()
    t_fc = torch.nn.Linear((e * s) // 4 * 4 // 4, out_dim)  # (e*s)//4

    x = np.random.default_rng(3).standard_normal((b, s, input_dim)).astype(np.float32)
    pe = sinusoidal_table(10000, e)

    with torch.no_grad():
        xt = torch.from_numpy(x).permute(1, 0, 2)          # (S,B,in)
        xt = t_embed(xt)                                    # (S,B,e)
        xt = xt + torch.from_numpy(pe[None, :b])            # reference PE quirk
        tmask = torch.nn.Transformer.generate_square_subsequent_mask(s)
        mem = torch.zeros(s, b, e)
        xt = t_dec(xt, mem, tgt_mask=tmask)
        xt = xt.permute(1, 0, 2).reshape(b, 4, -1)
        want = t_fc(xt).numpy()

    sd = {}
    sd.update({f"embedding.{k}": v for k, v in t_embed.state_dict().items()})
    sd.update({f"fc.{k}": v for k, v in t_fc.state_dict().items()})
    sd.update({f"transformer_decoder.{k}": v for k, v in t_dec.state_dict().items()})
    from msla_tpu.utils.torch_compat import transformer_params_from_torch

    params = transformer_params_from_torch(sd, num_layers=2)
    net = TransformerQuantizerNet(input_dim=input_dim, output_dim=out_dim, hidden_dim=e,
                                  num_layers=2, num_heads=h)
    got = net.apply({"params": params}, jnp.asarray(x), deterministic=True)
    assert got.shape == want.shape == (b, 4, out_dim)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_positional_modes():
    pe = PositionalEncoding(8, mode="reference")
    x = jnp.zeros((3, 5, 8))
    y = pe.apply({}, x)
    # reference mode: constant across positions, varies across batch
    assert np.allclose(np.asarray(y[:, 0]), np.asarray(y[:, 4]))
    assert not np.allclose(np.asarray(y[0, 0]), np.asarray(y[1, 0]))
    y2 = PositionalEncoding(8, mode="standard").apply({}, x)
    assert not np.allclose(np.asarray(y2[0, 0]), np.asarray(y2[0, 1]))
    assert np.allclose(np.asarray(y2[0]), np.asarray(y2[2]))


def test_transformer_task_train_and_eval():
    from msla_tpu.models.transformer import TransformerTask

    task = TransformerTask(sample_rate=64, frame_length=2, learning_rate=1e-3,
                           checkpoint_dir="/tmp/ttask", num_layers=2, num_heads=4,
                           hidden_dim=32)
    # input_dim = 128//4 = 32; latent channels S=8 (stand-in)
    quantized = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 32)), jnp.float32)
    instruments = jnp.asarray(np.random.default_rng(1).standard_normal((2, 4, 128)), jnp.float32)
    batch = (quantized, instruments)
    variables = task.init_variables(jax.random.PRNGKey(0), batch)
    params = variables["params"]

    loss, metrics = task.loss_fn(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)) and "train/loss" in metrics

    g = jax.grad(lambda p: task.loss_fn(p, batch, jax.random.PRNGKey(1))[0])(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))

    em = task.eval_metrics(params, batch, "testing")
    assert "testing/loss" in em and "testing/si_sdr_full_audio_measure" in em
