"""SI-SDR / loss metric tests.

torchmetrics is not installed here, so SI-SDR is validated against a direct
numpy transcription of torchmetrics' documented formula
(scale_invariant_signal_distortion_ratio, zero_mean=False), plus known
analytic cases.
"""
import numpy as np
import jax.numpy as jnp

from msla_tpu.ops.metrics import l1_loss, mse_loss, si_sdr, si_sdr_mean


def np_si_sdr(preds, target):
    eps = np.finfo(np.float32).eps
    alpha = ((preds * target).sum(-1, keepdims=True) + eps) / ((target ** 2).sum(-1, keepdims=True) + eps)
    ts = alpha * target
    noise = ts - preds
    return 10 * np.log10(((ts ** 2).sum(-1) + eps) / ((noise ** 2).sum(-1) + eps))


def test_si_sdr_matches_formula():
    rng = np.random.default_rng(0)
    preds = rng.standard_normal((4, 1000)).astype(np.float32)
    target = rng.standard_normal((4, 1000)).astype(np.float32)
    got = np.asarray(si_sdr(jnp.asarray(preds), jnp.asarray(target)))
    np.testing.assert_allclose(got, np_si_sdr(preds, target), rtol=1e-4)


def test_si_sdr_scale_invariance():
    rng = np.random.default_rng(1)
    target = rng.standard_normal((2, 500)).astype(np.float32)
    preds = target + 0.01 * rng.standard_normal((2, 500)).astype(np.float32)
    a = np.asarray(si_sdr(jnp.asarray(preds), jnp.asarray(target)))
    b = np.asarray(si_sdr(jnp.asarray(preds), jnp.asarray(3.7 * target)))
    np.testing.assert_allclose(a, b, rtol=1e-3)


def test_si_sdr_perfect_reconstruction_is_large():
    target = np.sin(np.linspace(0, 20, 2000)).astype(np.float32)[None]
    val = float(si_sdr_mean(jnp.asarray(target), jnp.asarray(target)))
    assert val > 60  # eps-regularized, not inf


def test_si_sdr_analytic_orthogonal_decomposition():
    """Independent (non-transcription) validation: for est = a·t + n with
    n ⊥ t, the projection of est onto t is exactly a·t and the residual is n,
    so SI-SDR(est, t) = 10·log10(a²‖t‖² / ‖n‖²) in closed form."""
    rng = np.random.default_rng(7)
    t = rng.standard_normal(4096).astype(np.float64)
    n = rng.standard_normal(4096).astype(np.float64)
    n -= (n @ t) / (t @ t) * t                 # exact orthogonalization
    assert abs(n @ t) < 1e-9 * np.linalg.norm(n) * np.linalg.norm(t)
    for a, scale in [(1.0, 1.0), (0.3, 1.0), (2.5, 0.01)]:
        noise = scale * n
        est = a * t + noise
        expected = 10 * np.log10((a ** 2) * (t @ t) / (noise @ noise))
        got = float(si_sdr(jnp.asarray(est[None], jnp.float32),
                           jnp.asarray(t[None], jnp.float32))[0])
        np.testing.assert_allclose(got, expected, rtol=1e-3)


def test_l1_mse():
    a = jnp.asarray([[1.0, 2.0]])
    b = jnp.asarray([[0.0, 4.0]])
    assert float(l1_loss(a, b)) == 1.5
    assert float(mse_loss(a, b)) == 2.5
