"""Fused encoder-stem kernel (ops/conv_stem.py): interpret-mode parity with
the plain-XLA reference stem, hidden-state output, edge padding semantics,
and the custom-vjp backward math."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msla_tpu.nn.layers import Conv1d
from msla_tpu.ops.conv_stem import (_fused_bwd, conv_stem, conv_stem_pallas,
                                    conv_stem_ref)


def _inputs(b=2, t=256, c0=4, c1=8, c2=16, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, t, c0)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((4, c0, c1)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((c1,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((4, c1, c2)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((c2,)) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


def test_ref_matches_flax_conv_layers():
    """conv_stem_ref is numerically the Encoder's conv1+relu+conv2+relu."""
    x, w1, b1, w2, b2 = _inputs()
    want = x
    for w, b in [(w1, b1), (w2, b2)]:
        conv = Conv1d(w.shape[-1], kernel_size=4, stride=2, padding=1)
        want = jax.nn.relu(conv.apply(
            {"params": {"conv": {"kernel": w, "bias": b}}}, want))
    got, h1 = conv_stem_ref(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("t,tile", [(64, 8), (256, 16), (256, 64), (192, 48)])
def test_pallas_fwd_matches_ref(t, tile):
    x, w1, b1, w2, b2 = _inputs(t=t)
    want, want_h1 = conv_stem_ref(x, w1, b1, w2, b2)
    got = conv_stem_pallas(x, w1, b1, w2, b2, tile_w=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    got2, got_h1 = conv_stem_pallas(x, w1, b1, w2, b2, tile_w=tile,
                                    save_hidden=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_h1), np.asarray(want_h1),
                               rtol=1e-5, atol=1e-5)


def test_pallas_single_tile_edges():
    """One tile = both edge masks active in the same kernel invocation."""
    x, w1, b1, w2, b2 = _inputs(t=64, seed=3)
    want, _ = conv_stem_ref(x, w1, b1, w2, b2)
    got = conv_stem_pallas(x, w1, b1, w2, b2, tile_w=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_custom_vjp_backward_matches_autodiff():
    """_fused_bwd (saved-activation conv transposes) == jax.grad of the ref."""
    x, w1, b1, w2, b2 = _inputs(t=128, seed=4)
    g = jnp.asarray(np.random.default_rng(5).standard_normal((2, 32, 16)),
                    jnp.float32)

    def loss(x, w1, b1, w2, b2):
        out, _ = conv_stem_ref(x, w1, b1, w2, b2)
        return jnp.sum(out * g)

    want = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    out2, h1 = conv_stem_ref(x, w1, b1, w2, b2)
    got = _fused_bwd((x, h1, out2, w1, w2), g)
    for name, a, b in zip(["dx", "dw1", "db1", "dw2", "db2"], got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_dispatcher_cpu_path():
    x, w1, b1, w2, b2 = _inputs(t=64, seed=6)
    out = conv_stem(x, w1, b1, w2, b2)  # CPU → ref path
    want, _ = conv_stem_ref(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6)
