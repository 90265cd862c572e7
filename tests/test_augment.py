"""Masking augmentation tests."""
import jax
import jax.numpy as jnp
import numpy as np

from msla_tpu.data.augment import masking_augment


def test_masking_augment_shape_and_determinism():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 4000)), jnp.float32)
    rng = jax.random.PRNGKey(3)
    a = masking_augment(x, rng)
    b = masking_augment(x, rng)
    assert a.shape == x.shape
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # same rng → same masks
    c = masking_augment(x, jax.random.PRNGKey(4))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0  # different rng → different


def test_masking_is_lossy_but_finite():
    t = np.arange(4000) / 4000
    x = jnp.asarray(np.sin(2 * np.pi * 100 * t).astype(np.float32))[None, None].repeat(4, 1)
    out = masking_augment(x, jax.random.PRNGKey(0))
    arr = np.asarray(out)
    assert np.isfinite(arr).all()
    # power-spectrum round trip discards phase: output differs from input
    assert np.abs(arr - np.asarray(x)).max() > 1e-3
