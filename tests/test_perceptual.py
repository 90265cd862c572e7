"""PerceptualLoss / VGG16 tests (incl. torchvision parity when available)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msla_tpu.nn.perceptual_loss import PerceptualLoss
from msla_tpu.nn.vgg import VGG16Features


def test_perceptual_loss_basic():
    pl_loss = PerceptualLoss(sample_rate=4000, rng=jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 8000)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, 8000)), jnp.float32)
    same = float(pl_loss(x, x))
    diff = float(pl_loss(x, y))
    assert same < 1e-10
    assert diff > same
    assert np.isfinite(diff)


def test_vgg16_parity_with_torchvision_architecture():
    """Random torch vgg16 features vs ours with converted weights."""
    torch = pytest.importorskip("torch")
    try:
        from torchvision.models import vgg16
    except Exception:
        pytest.skip("torchvision unavailable")

    tmod = vgg16(weights=None).eval()
    from msla_tpu.utils.torch_compat import vgg16_params_from_torch

    params = vgg16_params_from_torch(tmod.state_dict())
    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tmod.features(torch.from_numpy(x)).numpy()  # NCHW
    got = VGG16Features().apply({"params": params},
                                jnp.asarray(x.transpose(0, 2, 3, 1)))  # NHWC
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-3, atol=1e-4)
