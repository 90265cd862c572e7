"""BERT parity vs HF transformers (torch) + AudioBert task behavior."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from msla_tpu.nn.bert import BertConfig, BertForMaskedLM
from msla_tpu.utils.torch_compat import bert_params_from_hf

TOL = dict(rtol=2e-4, atol=2e-5)


@pytest.fixture(scope="module")
def small_pair():
    from transformers import BertConfig as HFConfig, BertForMaskedLM as HFBert

    hf_cfg = HFConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=64,
                      max_position_embeddings=64, type_vocab_size=2)
    hf = HFBert(hf_cfg).eval()
    cfg = BertConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64)
    params = bert_params_from_hf(hf.state_dict(), num_layers=2)
    return hf, BertForMaskedLM(cfg), params


def test_bert_mlm_parity_with_attention_mask(small_pair):
    hf, net, params = small_pair
    ids = np.random.default_rng(0).integers(0, 100, (2, 16))
    mask = np.ones((2, 16), dtype=np.float32)
    mask[1, 10:] = 0
    with torch.no_grad():
        want = hf(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)).logits.numpy()
    got = np.asarray(net.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask)))
    # compare on attended positions (HF's -10000 vs our -1e9 padding bias
    # only affects what padded positions see)
    np.testing.assert_allclose(got[mask.astype(bool)], want[mask.astype(bool)], **TOL)


def make_task(tmp_path, sr=64, frame=2, num_embedding=16):
    from msla_tpu.models.bert import AudioBertTask

    codebook = np.random.default_rng(0).standard_normal((num_embedding, 8)).astype(np.float32)
    path = tmp_path / "codebook.csv"
    header = ",".join(str(i) for i in range(8))
    np.savetxt(path, codebook, delimiter=",", header=header, comments="")
    task = AudioBertTask(learning_rate=2e-4, checkpoint_dir=str(tmp_path / "ckpt"),
                         codebook=str(path), sample_rate=sr, frame_length=frame,
                         num_embedding=num_embedding)
    # shrink BERT for test speed
    from msla_tpu.nn.bert import BertConfig, BertForMaskedLM

    task.config = BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                             num_attention_heads=4, intermediate_size=64,
                             max_position_embeddings=512)
    task.bert = BertForMaskedLM(task.config)
    return task


def test_audio_bert_forward_and_loss(tmp_path):
    task = make_task(tmp_path)
    # T = 128, W = 32 → 1 chunk with padding
    indices = jnp.asarray(np.random.default_rng(1).integers(0, 16, (2, 32)), jnp.int32)
    instruments = jnp.asarray(np.random.default_rng(2).standard_normal((2, 4, 128)),
                              jnp.float32)
    batch = (indices, instruments)
    variables = task.init_variables(jax.random.PRNGKey(0), batch)
    params = variables["params"]
    assert set(params) == {"bert", "head", "codebook"}

    out = task.forward(params, indices, train=False)
    assert out.shape == (2, 4, 128)
    loss, metrics = task.loss_fn(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    em = task.eval_metrics(params, batch, "test")
    assert "test/loss" in em and "test/si_sdr_piano_measure" in em


def test_audio_bert_only_head_trains(tmp_path):
    import optax

    task = make_task(tmp_path)
    indices = jnp.asarray(np.random.default_rng(1).integers(0, 16, (2, 32)), jnp.int32)
    instruments = jnp.asarray(np.random.default_rng(2).standard_normal((2, 4, 128)),
                              jnp.float32)
    batch = (indices, instruments)
    params = task.init_variables(jax.random.PRNGKey(0), batch)["params"]
    tx = task.configure_optimizer()
    opt_state = tx.init(params)

    grads = jax.grad(lambda p: task.loss_fn(p, batch, jax.random.PRNGKey(1))[0])(params)
    # BERT + codebook receive zero gradient (argmax barrier)
    assert all(float(jnp.abs(g).sum()) == 0.0
               for g in jax.tree_util.tree_leaves(grads["bert"]))
    assert float(jnp.abs(grads["codebook"]).sum()) == 0.0
    assert any(float(jnp.abs(g).sum()) > 0
               for g in jax.tree_util.tree_leaves(grads["head"]))

    updates, _ = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    # frozen groups unchanged bitwise, head moved
    for a, b in zip(jax.tree_util.tree_leaves(params["bert"]),
                    jax.tree_util.tree_leaves(new_params["bert"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    moved = [np.abs(np.asarray(a) - np.asarray(b)).max()
             for a, b in zip(jax.tree_util.tree_leaves(params["head"]),
                             jax.tree_util.tree_leaves(new_params["head"]))]
    assert max(moved) > 0


def test_audio_bert_multi_chunk_scan(tmp_path):
    """W spanning several 512 windows exercises the chunk scan."""
    task = make_task(tmp_path, sr=2560, frame=2)  # T=5120, W=1280 → 3 chunks
    indices = jnp.asarray(np.random.default_rng(3).integers(0, 16, (1, 1280)), jnp.int32)
    instruments = jnp.asarray(np.zeros((1, 4, 5120)), jnp.float32)
    params = task.init_variables(jax.random.PRNGKey(0), (indices, instruments))["params"]
    out = task.forward(params, indices, train=False)
    assert out.shape == (1, 4, 5120)
    assert np.isfinite(np.asarray(out)).all()


def test_audio_bert_chunk_fold_invariant(tmp_path):
    """Folding chunks into the batch of one BERT call (the TPU default) must
    be bit-identical to the chunk-by-chunk scan (CPU default) — including a
    non-dividing fold that adds whole [PAD] chunks."""
    task = make_task(tmp_path, sr=2560, frame=2)  # W=1280 → 3 chunks of 512
    indices = jnp.asarray(np.random.default_rng(6).integers(0, 16, (2, 1280)), jnp.int32)
    instruments = jnp.asarray(np.zeros((2, 4, 5120)), jnp.float32)
    params = task.init_variables(jax.random.PRNGKey(0), (indices, instruments))["params"]

    ids_scan = task._chunked_argmax(params["bert"], indices, with_conf=False)
    assert task._fold_for(2, 3) == 1  # CPU auto: chunk-by-chunk
    for fold in (2, 3):  # 2 → 2 groups with one pad chunk; 3 → single call
        task.chunk_fold = fold
        ids_f, conf_f = task._chunked_argmax(params["bert"], indices, with_conf=True)
        np.testing.assert_array_equal(np.asarray(ids_scan), np.asarray(ids_f))
        assert conf_f.shape == ids_f.shape
    task.chunk_fold = None


def test_audio_bert_masking_changes_training_path(tmp_path):
    task = make_task(tmp_path)
    indices = jnp.asarray(np.random.default_rng(4).integers(0, 16, (2, 32)), jnp.int32)
    instruments = jnp.asarray(np.random.default_rng(5).standard_normal((2, 4, 128)),
                              jnp.float32)
    params = task.init_variables(jax.random.PRNGKey(0), (indices, instruments))["params"]
    a = task.forward(params, indices, jax.random.PRNGKey(1), train=True)
    b = task.forward(params, indices, train=False)
    # with random init the masked path usually differs; at minimum it's finite
    assert np.isfinite(np.asarray(a)).all() and np.isfinite(np.asarray(b)).all()
