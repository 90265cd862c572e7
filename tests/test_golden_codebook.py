"""Golden-value tests against the reference's committed trained codebook
(reference artifact: logs/best_checkpoint/codebook.csv, 512×64 — SURVEY.md §4
recommends quantization round-trips against it without training)."""
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

GOLDEN = Path("/root/reference/logs/best_checkpoint/codebook.csv")

pytestmark = pytest.mark.skipif(not GOLDEN.exists(),
                                reason="reference codebook artifact not mounted")


@pytest.fixture(scope="module")
def codebook():
    arr = np.genfromtxt(GOLDEN, delimiter=",", skip_header=1).astype(np.float32)
    return arr


def test_golden_codebook_shape(codebook):
    assert codebook.shape == (512, 64)
    assert np.isfinite(codebook).all()


def test_quantization_roundtrip_is_idempotent(codebook):
    """Quantizing codebook rows returns those exact rows and indices."""
    from msla_tpu.ops.vq import vector_quantize

    cb = jnp.asarray(codebook)
    res = vector_quantize(cb, cb, 0.25, use_pallas=False)
    got_idx = np.asarray(res.encoding_indices)
    # with a trained codebook rows are distinct: each row maps to itself
    assert (got_idx == np.arange(512)).mean() > 0.99
    np.testing.assert_allclose(np.asarray(res.quantized_ste), codebook, rtol=1e-5)
    assert float(res.embedding_loss) < 1e-10


def test_quantization_matches_torch_on_golden(codebook):
    """Code assignments on random latents match the reference VQ bit-for-bit."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "/root/reference")
    from src.model.components.vector_quantizer import VectorQuantizer as TorchVQ

    from msla_tpu.ops.vq import vector_quantize

    tmod = TorchVQ(num_embedding=512, embedding_dim=64, commitment_cost=0.25).eval()
    with torch.no_grad():
        tmod.codebook.weight.copy_(torch.from_numpy(codebook))

    rng = np.random.default_rng(0)
    x = (rng.standard_normal((1, 64, 500)) * 0.05).astype(np.float32)
    with torch.no_grad():
        _, _, _, _, _, t_idx = tmod(torch.from_numpy(x))

    res = vector_quantize(jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(codebook),
                          0.25, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(res.encoding_indices).reshape(-1),
                                  t_idx.numpy().reshape(-1))


def test_bert_head_consumes_golden_codebook(tmp_path, codebook):
    """AudioBertTask loads the golden CSV and maps indices through it."""
    from msla_tpu.models.bert import AudioBertTask

    task = AudioBertTask(learning_rate=2e-4, checkpoint_dir=str(tmp_path),
                         codebook=str(GOLDEN), sample_rate=4000, frame_length=2,
                         num_embedding=512)
    assert task.codebook_np.shape == (512, 64)
    np.testing.assert_allclose(task.codebook_np, codebook)
