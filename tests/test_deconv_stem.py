"""Fused decoder-stem kernel (ops/deconv_stem.py): interpret-mode parity with
the plain-XLA transposed convs, hidden output, and custom-vjp backward."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msla_tpu.nn.layers import ConvTranspose1d
from msla_tpu.ops.deconv_stem import (_fused_bwd, deconv_stem,
                                      deconv_stem_pallas, deconv_stem_ref)


def _inputs(b=2, w=64, c=16, c1=8, c_out=4, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, w, c)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((4, c1, c)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((c1,)) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((4, c_out, c1)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((c_out,)) * 0.1, jnp.float32)
    return q, k1, b1, k2, b2


def test_ref_matches_flax_convtranspose_layers():
    """deconv_stem_ref == Decoder's convT+relu+convT (same modules)."""
    q, k1, b1, k2, b2 = _inputs()
    x = q
    for i, (k, bb) in enumerate([(k1, b1), (k2, b2)]):
        conv = ConvTranspose1d(k.shape[1], kernel_size=4, stride=2, padding=1)
        x = conv.apply({"params": {"conv": {"kernel": k, "bias": bb}}}, x)
        if i == 0:
            x = jax.nn.relu(x)
    got, h = deconv_stem_ref(q, k1, b1, k2, b2)
    assert got.shape == (2, 4 * 64, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("w,tile", [(64, 8), (64, 16), (256, 64), (48, 24)])
def test_pallas_fwd_matches_ref(w, tile):
    q, k1, b1, k2, b2 = _inputs(w=w, seed=1)
    want, want_h = deconv_stem_ref(q, k1, b1, k2, b2)
    got = deconv_stem_pallas(q, k1, b1, k2, b2, tile_w=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    got2, got_h = deconv_stem_pallas(q, k1, b1, k2, b2, tile_w=tile,
                                     save_hidden=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=1e-5, atol=1e-5)


def test_custom_vjp_backward_matches_autodiff():
    q, k1, b1, k2, b2 = _inputs(w=32, seed=2)
    g = jnp.asarray(np.random.default_rng(3).standard_normal((2, 128, 4)),
                    jnp.float32)

    def loss(q, k1, b1, k2, b2):
        out, _ = deconv_stem_ref(q, k1, b1, k2, b2)
        return jnp.sum(out * g)

    want = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(q, k1, b1, k2, b2)
    out, h = deconv_stem_ref(q, k1, b1, k2, b2)
    got = _fused_bwd((q, h, k1, k2), g)
    for name, a, b in zip(["dq", "dk1", "db1", "dk2", "db2"], got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_dispatcher_cpu_path():
    q, k1, b1, k2, b2 = _inputs(w=32, seed=4)
    out = deconv_stem(q, k1, b1, k2, b2)  # CPU → ref
    want, _ = deconv_stem_ref(q, k1, b1, k2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6)
