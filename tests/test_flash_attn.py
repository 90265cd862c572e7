"""Flash-attention wrapper (ops.flash_attn): kernel parity in interpret mode,
CPU dispatch, and MultiHeadAttention kv_mask equivalence.

The Audio-BERT encoder masks KEYS only (HF semantics, reference
src/model/bert.py:53-69 builds attention masks over the padded tail); under
the flash kernel padded QUERY rows attend pad keys instead — callers discard
them — so parity is asserted over real query rows.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from msla_tpu.ops.flash_attn import _flash, _xla_attention, scaled_attention

B, H, S, D = 2, 2, 128, 64
REAL = 100  # real (unpadded) query/key prefix


def _qkv(dtype):
    rng = np.random.default_rng(0)
    return tuple(jnp.asarray(rng.standard_normal((B, H, S, D)), dtype)
                 for _ in range(3))


def _mask():
    am = np.ones((B, S), np.float32)
    am[:, REAL:] = 0.0
    return jnp.asarray(am)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-6), (jnp.bfloat16, 2e-2)])
def test_flash_kernel_matches_xla_on_real_rows(dtype, tol):
    q, k, v = _qkv(dtype)
    am = _mask()
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(_flash(q, k, v, am, 0.125))
    ref = np.asarray(_xla_attention(q, k, v, am, 0.125))
    np.testing.assert_allclose(out[:, :, :REAL], ref[:, :, :REAL], atol=tol)


def test_flash_kernel_unmasked(atol=1e-6):
    q, k, v = _qkv(jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(_flash(q, k, v, None, 0.125))
    ref = np.asarray(_xla_attention(q, k, v, None, 0.125))
    np.testing.assert_allclose(out, ref, atol=atol)


def test_wrapper_dispatches_to_xla_on_cpu():
    q, k, v = _qkv(jnp.float32)
    am = _mask()
    out = scaled_attention(q, k, v, kv_mask=am, sm_scale=0.125)  # auto
    ref = _xla_attention(q, k, v, am, 0.125)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_mha_kv_mask_equals_additive_bias():
    """MultiHeadAttention(kv_mask=...) on CPU == the round-1 additive-bias
    formulation (the BERT encoder's pre-flash math)."""
    from msla_tpu.nn.attention import MultiHeadAttention

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, S, 64)), jnp.float32)
    am = _mask()
    mha = MultiHeadAttention(64, 4)
    params = mha.init(jax.random.PRNGKey(0), x, x, x)
    got = mha.apply(params, x, x, x, kv_mask=am)
    bias = (1.0 - am[:, None, None, :]) * -1e9
    want = mha.apply(params, x, x, x, mask=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
