"""Fused MLM argmax kernel (ops/mlm_argmax.py): Pallas interpret mode must
match the plain jnp dot+argmax exactly, including first-occurrence
tie-breaking, vocab padding, and the online-softmax confidence."""
import jax
import jax.numpy as jnp
import numpy as np

from msla_tpu.ops.mlm_argmax import _mlm_argmax_jnp, mlm_argmax, mlm_argmax_pallas


def _rand(m, k, v, seed=0):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((v, k)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((v,)), jnp.float32)
    return h, emb, bias


def test_pallas_matches_jnp_argmax():
    # v=300 is NOT a multiple of tile_v → exercises the -inf vocab padding;
    # m=50 is NOT a multiple of 8 → exercises the row padding
    h, emb, bias = _rand(50, 16, 300)
    want = _mlm_argmax_jnp(h, emb, bias, with_conf=False)
    got = mlm_argmax_pallas(h, emb, bias, tile_m=16, tile_v=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_confidence_matches_softmax():
    h, emb, bias = _rand(24, 8, 130, seed=1)
    want_ids, want_conf = _mlm_argmax_jnp(h, emb, bias, with_conf=True)
    got_ids, got_conf = mlm_argmax_pallas(h, emb, bias, with_conf=True,
                                          tile_m=8, tile_v=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(want_ids))
    np.testing.assert_allclose(np.asarray(got_conf), np.asarray(want_conf),
                               rtol=1e-5, atol=1e-6)


def test_tie_break_first_occurrence():
    """jnp.argmax picks the FIRST maximum — ties within and across vocab
    blocks must resolve identically."""
    k = 4
    h = jnp.ones((8, k), jnp.float32)
    emb = jnp.zeros((96, k), jnp.float32)
    # identical rows 7, 40 and 85 (different tile_v=32 blocks) all maximal
    emb = emb.at[7].set(1.0).at[40].set(1.0).at[85].set(1.0)
    bias = jnp.zeros((96,), jnp.float32)
    want = _mlm_argmax_jnp(h, emb, bias, with_conf=False)
    got = mlm_argmax_pallas(h, emb, bias, tile_m=8, tile_v=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert int(got[0]) == 7


def test_dispatcher_shapes_and_cpu_path():
    """mlm_argmax reshapes (B, S, K) → (B, S) and uses jnp on CPU."""
    h, emb, bias = _rand(6 * 5, 8, 40, seed=2)
    h3 = h.reshape(6, 5, 8)
    ids = mlm_argmax(h3, emb, bias)
    assert ids.shape == (6, 5) and ids.dtype == jnp.int32
    ids2, conf = mlm_argmax(h3, emb, bias, with_conf=True)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))
    assert conf.shape == (6, 5)
    assert np.all((np.asarray(conf) > 0) & (np.asarray(conf) <= 1.0))


def test_bert_forward_unchanged_by_fused_path():
    """AudioBertTask.forward with the (CPU) fused dispatcher still produces
    the exact logits-argmax result — guard against the return_mlm_hidden
    refactor changing behavior."""
    from msla_tpu.models.bert import AudioBertTask

    task = AudioBertTask(learning_rate=2e-4, checkpoint_dir="/tmp/mlm_t",
                         codebook="/tmp/does_not_exist.csv", sample_rate=512,
                         frame_length=2, num_embedding=16)
    rng = np.random.default_rng(3)
    indices = jnp.asarray(rng.integers(0, 16, (2, 1024)), jnp.int32)
    instruments = jnp.asarray(rng.standard_normal((2, 4, 1024)), jnp.float32)
    params = task.init_variables(jax.random.PRNGKey(0),
                                 (indices, instruments))["params"]

    # reference semantics: full logits then argmax
    tokens = indices[:, :512]
    logits = task.bert.apply({"params": params["bert"]}, tokens,
                             jnp.ones_like(tokens, jnp.float32),
                             deterministic=True)
    want_ids = jnp.argmax(logits, axis=-1)
    h = task.bert.apply({"params": params["bert"]}, tokens,
                        jnp.ones_like(tokens, jnp.float32),
                        deterministic=True, return_mlm_hidden=True)
    emb, mlm_bias = task._decoder_weights(params["bert"])
    got_ids = mlm_argmax(h, emb, mlm_bias)
    np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(want_ids))

    out = task.forward(params, indices, train=False)
    assert out.shape == (2, 4, 1024)
    assert np.all(np.isfinite(np.asarray(out)))
