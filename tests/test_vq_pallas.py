"""Pallas VQ kernel parity vs the jnp path (interpret mode on CPU; the same
kernel compiles natively on TPU — exercised by bench.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from msla_tpu.ops.vq import nearest_codes
from msla_tpu.ops.vq_pallas import nearest_codes_pallas


@pytest.mark.parametrize("n,d,k", [(1024, 64, 512), (1000, 64, 512), (64, 8, 16),
                                   (7, 64, 512)])
def test_pallas_matches_jnp(n, d, k):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    cb = jnp.asarray(rng.standard_normal((k, d)), jnp.float32)
    want = np.asarray(nearest_codes(x, cb, use_pallas=False))
    got = np.asarray(nearest_codes_pallas(x, cb, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_handles_duplicate_codes_ties():
    """argmin tie-break must pick the first index, like torch/jnp."""
    cb = jnp.asarray(np.tile(np.ones((1, 8), np.float32), (4, 1)))  # all identical
    x = jnp.asarray(np.ones((16, 8), np.float32))
    got = np.asarray(nearest_codes_pallas(x, cb, interpret=True))
    assert (got == 0).all()
