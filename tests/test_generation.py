"""Code-sampling generation path tests (sample_codes → decode_codes)."""
import jax
import jax.numpy as jnp
import numpy as np

from msla_tpu.inference import AudioGenerator
from msla_tpu.models.bert import AudioBertTask
from msla_tpu.models.vqvae import VQVAETask
from msla_tpu.nn.bert import BertConfig, BertForMaskedLM


def make_pair(tmp_path, num_embedding=16, embed_dim=8, sr=1000):
    vq = VQVAETask(16, 1, 8, num_embedding, embed_dim, 0.25, 1e-3, sr,
                   str(tmp_path), str(tmp_path / "cb.csv"), use_pallas=False)
    vq_params = vq.net.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 2000)))["params"]
    codebook = np.asarray(vq_params["vector_quantizer"]["codebook"])
    np.savetxt(tmp_path / "cb.csv", codebook, delimiter=",",
               header=",".join(map(str, range(embed_dim))), comments="")

    bert = AudioBertTask(2e-4, str(tmp_path), str(tmp_path / "cb.csv"), sr, 2,
                         num_embedding)
    bert.config = BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=1,
                             num_attention_heads=2, intermediate_size=64)
    bert.bert = BertForMaskedLM(bert.config)
    indices = jnp.zeros((1, 500), jnp.int32)
    bert_params = bert.init_variables(jax.random.PRNGKey(1),
                                      (indices, jnp.zeros((1, 4, 2000))))["params"]
    return AudioGenerator(bert, bert_params, vq, vq_params), num_embedding


def test_sample_codes_shapes_and_range(tmp_path):
    gen, k = make_pair(tmp_path)
    codes = gen.sample_codes(width=500, batch=2, rounds=3, seed=0)
    assert codes.shape == (2, 500)
    assert codes.min() >= 0 and codes.max() < k


def test_sample_respects_prompt(tmp_path):
    gen, k = make_pair(tmp_path)
    prompt = np.full((1, 500), -1, np.int64)
    prompt[0, :100] = 7  # fixed prefix
    codes = gen.sample_codes(width=500, batch=1, rounds=2, seed=1, prompt=prompt)
    np.testing.assert_array_equal(codes[0, :100], np.full(100, 7))
    assert (codes[0, 100:] >= 0).all()


def test_generate_waveform_end_to_end(tmp_path):
    gen, _ = make_pair(tmp_path)
    stems = gen.generate_waveform(width=500, batch=1, rounds=2, seed=2)
    assert stems.shape == (1, 4, 2000)
    assert np.isfinite(stems).all()
