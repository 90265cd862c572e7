"""Inference API tests: full-song separation stitching + generation paths."""
import jax
import jax.numpy as jnp
import numpy as np

from msla_tpu.inference import AudioGenerator, SourceSeparator
from msla_tpu.models.vqvae import VQVAETask


def make_vqvae(tmp_path):
    task = VQVAETask(num_hidden=16, num_residual_layer=1, num_residual_hidden=8,
                     num_embedding=16, embedding_dim=8, commitment_cost=0.25,
                     learning_rate=1e-3, sample_rate=1000,
                     checkpoint_dir=str(tmp_path), codebook_file=str(tmp_path / "cb.csv"),
                     use_pallas=False)
    x0 = jnp.zeros((1, 4, 2000))
    params = task.net.init(jax.random.PRNGKey(0), x0)["params"]
    return task, params


def test_separator_full_song(tmp_path):
    task, params = make_vqvae(tmp_path)
    sep = SourceSeparator(task, params, frame_samples=2000, batch_size=4)
    song = np.random.default_rng(0).standard_normal(9500).astype(np.float32)  # 4.75 frames
    stems = sep.separate(song)
    assert stems.shape == (4, 9500)
    assert np.isfinite(stems).all()
    # stitching consistency: separating a 2-frame song equals 2 single frames
    two = np.random.default_rng(1).standard_normal(4000).astype(np.float32)
    joint = sep.separate(two)
    a = sep.separate(two[:2000])
    b = sep.separate(two[2000:])
    np.testing.assert_allclose(joint[:, :2000], a, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(joint[:, 2000:], b, rtol=1e-5, atol=1e-6)


def test_separator_matches_training_forward(tmp_path):
    """The separator's inference composite (get_quantized → decode, jnp VQ
    with losses DCE'd) must produce EXACTLY the training forward's waveform:
    decoder(quantized_ste) where quantized_ste is value-equal to the gathered
    codebook rows (round-2 review: the old net() route pulled the all-outputs
    fused training kernel into inference)."""
    task, params = make_vqvae(tmp_path)
    sep = SourceSeparator(task, params, frame_samples=2000, batch_size=2)
    rng = np.random.default_rng(9)
    frames = jnp.asarray(rng.standard_normal((2, 4, 2000)), jnp.float32)
    via_inference = np.asarray(sep._separate(params, frames))
    via_training = np.asarray(task.net.apply({"params": params}, frames).output)
    np.testing.assert_array_equal(via_inference, via_training)


def test_separator_overlap_mode(tmp_path):
    task, params = make_vqvae(tmp_path)
    sep = SourceSeparator(task, params, frame_samples=2000, batch_size=4)
    song = np.random.default_rng(3).standard_normal(7000).astype(np.float32)
    stems = sep.separate(song, overlap=True)
    assert stems.shape == (4, 7000)
    assert np.isfinite(stems).all()
    # overlap mode stays close to disjoint mode away from frame boundaries
    plain = sep.separate(song)
    mid = slice(500, 1500)  # interior of frame 0
    corr = np.corrcoef(stems[0, mid], plain[0, mid])[0, 1]
    assert corr > 0.5


def test_separator_encode_codes(tmp_path):
    task, params = make_vqvae(tmp_path)
    sep = SourceSeparator(task, params, frame_samples=2000)
    codes = sep.encode_codes(np.zeros(6000, np.float32))
    assert codes.shape == (3, 500)  # W = frame/4
    assert codes.dtype == np.int32


def test_generator_decode_codes(tmp_path):
    task, params = make_vqvae(tmp_path)
    gen = AudioGenerator(None, None, task, params)
    codes = np.random.default_rng(2).integers(0, 16, (2, 500))
    out = gen.decode_codes(codes)
    assert out.shape == (2, 4, 2000)
    assert np.isfinite(out).all()
