"""Audio-BERT task module (reference: src/model/bert.py:19-236).

BERT masked-LM over VQ codebook indices: train-time random masking (p=0.15,
[MASK]=103), the input split into 512-token windows, argmax token ids rescaled
into codebook range, mapped through the frozen codebook, then a
Conv1d(64→4, k4, s2, p1) + Linear(T/8 → T) head reconstructs the 4 stems.
L1 training loss per stem; AdamW.

TPU redesign of the hot path: the reference runs ⌈11000/512⌉ = 22 BERT
forwards SERIALLY per batch in a Python while-loop (bert.py:53-69). Here the
W axis is padded to a whole number of 512-token chunks which are folded into
the batch dimension, `chunk_fold` chunks per BERT call (auto: all 22 at once
on TPU, capped at 512 folded sequences; chunk-by-chunk scan on CPU where the
jnp argmax fallback would materialize logits). Only the ARGMAX of the MLM
logits is consumed (bert.py:67), so the tied decoder matmul + argmax run as
one fused Pallas kernel (ops.mlm_argmax) that never materializes the
(B, 512, 30522) logits tensor in HBM, and attention runs as the Pallas flash
kernel (ops.flash_attn) instead of materializing (B, H, 512, 512) scores.

Faithful quirks:
* argmax (non-differentiable) between BERT and the head means BERT itself
  receives no gradient — only the conv/linear head trains (true of the
  reference too); we make that explicit with stop_gradient so XLA skips the
  BERT backward pass entirely.
* index rescale `round(ids / max(ids) * 511)` (bert.py:67-73), with a guard
  for an all-zero argmax (the reference would emit NaN there).
"""
from __future__ import annotations

import logging
import random
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from msla_tpu.models.module import TaskModule
from msla_tpu.nn.bert import BertConfig, BertForMaskedLM
from msla_tpu.nn.layers import Conv1d, Linear
from msla_tpu.ops.metrics import l1_loss, mse_loss, si_sdr_mean
from msla_tpu.ops.mlm_argmax import mlm_argmax
from flax import linen as nn

log = logging.getLogger(__name__)

INSTRUMENTS = ("bass", "drums", "guitar", "piano")
MAX_HIDDEN_SIZE = 512  # BERT window (reference: bert.py:29)


class AudioBertHead(nn.Module):
    """Conv1d(64→4, k4, s2, p1) + Linear(T/8 → T) (reference: bert.py:40-41)."""

    output_dim: int

    @nn.compact
    def __call__(self, quantized_bcw: jax.Array) -> jax.Array:
        x = jnp.swapaxes(quantized_bcw, -1, -2)  # NWC
        x = Conv1d(4, kernel_size=4, stride=2, padding=1, name="conv")(x)
        x = jnp.swapaxes(x, -1, -2)              # (B, 4, T/8)
        return Linear(self.output_dim, name="linear")(x)


class AudioBertTask(TaskModule):
    # the argmax between BERT and the head detaches the encoder (reference
    # bert.py:67-73) and the codebook is a buffer (bert.py:32) — neither ever
    # changes, so per-epoch checkpoints dedup them to one content-addressed frozen-<fp>.ckpt sidecar
    # per directory (train/checkpoint.py) instead of re-fetching/serializing
    # ~440 MB twice per epoch through the TPU tunnel
    frozen_param_keys = ("bert", "codebook")

    def __init__(self,
                 learning_rate: float,
                 checkpoint_dir: str,
                 codebook: str,
                 sample_rate: int,
                 frame_length: int,
                 num_embedding: int,
                 pretrained_weights: str | None = None,
                 mask_prob: float = 0.15,
                 compute_dtype: str | None = None,
                 use_pallas: bool | None = None,
                 use_flash: bool | None = None,
                 chunk_fold: int | None = None):
        self.hparams = dict(learning_rate=learning_rate, checkpoint_dir=str(checkpoint_dir),
                            codebook=str(codebook), sample_rate=sample_rate,
                            frame_length=frame_length, num_embedding=num_embedding,
                            mask_prob=mask_prob, compute_dtype=compute_dtype,
                            chunk_fold=chunk_fold)
        self.use_pallas = use_pallas  # None → fused argmax kernel on TPU
        # None → Pallas flash attention on TPU (measured 1.8×/layer vs the
        # XLA chain at the 512-token chunk shape; tools/bench_flash_attn.py)
        self.config = BertConfig(compute_dtype=compute_dtype, use_flash=use_flash)
        self.bert = BertForMaskedLM(self.config)
        self.head = AudioBertHead(output_dim=sample_rate * frame_length)
        self.mask_prob = float(mask_prob)
        self.chunk_fold = chunk_fold  # None → auto (see _fold_for)
        self.codebook_np = self._load_codebook(codebook, num_embedding)
        self.pretrained_weights = pretrained_weights

    def _fold_for(self, batch: int, n_chunks: int) -> int:
        """Chunks per BERT call. With the fused argmax there are no logits to
        bound, so on TPU fold everything (capped at 512 folded sequences —
        ~1.6 GB of bf16 FFN intermediates); on CPU the jnp argmax fallback
        materializes (fold·B, 512, 30522) logits, so stay chunk-by-chunk.
        With flash attention explicitly disabled the XLA chain materializes
        (fold·B, 12, 512, 512) fp32 scores — 4.1 GB per layer at full fold,
        a measured HBM OOM — so stay chunk-by-chunk there too."""
        if self.chunk_fold is not None:
            return max(1, int(self.chunk_fold))
        if jax.default_backend() == "cpu" or self.config.use_flash is False:
            return 1
        return max(1, min(n_chunks, 512 // max(batch, 1)))

    def _decoder_weights(self, bert_params):
        """Tied MLM decoder operands for the fused argmax: the word-embedding
        matrix (cast to the compute dtype when set) and the vocab bias."""
        emb = bert_params["embeddings"]["word_embeddings"]["embedding"]
        if self.config.compute_dtype:
            emb = emb.astype(self.config.compute_dtype)
        return emb, bert_params["mlm_bias"]

    @staticmethod
    def _load_codebook(path: str, num_embedding: int) -> np.ndarray:
        """Frozen codebook from CSV (reference: bert.py:32, header row present)."""
        p = Path(path)
        if p.exists():
            arr = np.genfromtxt(p, delimiter=",", skip_header=1).astype(np.float32)
            return np.atleast_2d(arr)
        log.warning("codebook file %s missing — using zeros (train the VQ-VAE first)", path)
        return np.zeros((num_embedding, 64), dtype=np.float32)

    # ---- init / optimizer ------------------------------------------------------
    def init_variables(self, rng, batch):
        indices, instruments = batch
        r1, r2 = jax.random.split(rng)
        ids = jnp.zeros((1, MAX_HIDDEN_SIZE), jnp.int32)
        bert_params = self.bert.init(r1, ids)["params"]
        bert_params = self._maybe_load_pretrained(bert_params)
        w = indices.reshape(indices.shape[0], -1).shape[-1]
        dummy_q = jnp.zeros((1, self.codebook_np.shape[1], w), jnp.float32)
        head_params = self.head.init(r2, dummy_q)["params"]
        return {"params": {"bert": bert_params, "head": head_params,
                           "codebook": jnp.asarray(self.codebook_np)}}

    def _maybe_load_pretrained(self, random_params):
        if not self.pretrained_weights:
            return random_params
        path = Path(self.pretrained_weights)
        if not path.exists():
            log.warning("pretrained BERT weights %s not found — using random init "
                        "(run tools/convert_hf_bert.py to convert an offline HF "
                        "checkpoint)", path)
            return random_params
        from flax import serialization

        restored = serialization.msgpack_restore(path.read_bytes())
        return serialization.from_state_dict(random_params, restored)

    def configure_optimizer(self):
        # torch.optim.AdamW defaults: betas (0.9, 0.999), eps 1e-8, wd 0.01
        # (reference: bert.py:234-236). In the reference, the argmax between
        # BERT and the head leaves BERT's grads as None, so torch's AdamW
        # skips them entirely (no update, no weight decay) — only the
        # conv/linear head actually trains. The codebook is a frozen buffer.
        adamw = optax.adamw(self.hparams["learning_rate"], b1=0.9, b2=0.999,
                            eps=1e-8, weight_decay=0.01)

        def label_fn(params):
            return {k: ("train" if k == "head" else "freeze") for k in params}

        return optax.multi_transform(
            {"train": adamw, "freeze": optax.set_to_zero()}, param_labels=label_fn)

    # ---- forward ---------------------------------------------------------------
    def _chunked_argmax(self, bert_params, x: jax.Array, *, with_conf: bool,
                        pipeline=None):
        """(B, W) token ids → (B, W) argmax vocab ids [+ (B, W) confidence].

        Pads W to whole 512-token windows (the reference pads with [PAD] and
        builds attention masks, bert.py:53-69), folds `_fold_for` chunks into
        the batch of each BERT call, and scans over the remaining groups.
        """
        b, w = x.shape
        s = MAX_HIDDEN_SIZE
        n_chunks = -(-w // s)
        fold = self._fold_for(b, n_chunks)
        n_groups = -(-n_chunks // fold)
        padded = n_groups * fold * s
        tokens = jnp.pad(x, ((0, 0), (0, padded - w)),
                         constant_values=self.config.pad_token_id)
        attn = jnp.pad(jnp.ones((b, w), jnp.float32), ((0, 0), (0, padded - w)))
        # (B, padded) → (n_groups, fold·B, 512); within a group row = f·B + i
        tokens = tokens.reshape(b, n_groups, fold, s).transpose(1, 2, 0, 3) \
                       .reshape(n_groups, fold * b, s)
        attn = attn.reshape(b, n_groups, fold, s).transpose(1, 2, 0, 3) \
                   .reshape(n_groups, fold * b, s)
        emb, mlm_bias = self._decoder_weights(bert_params)

        def group_call(tok, am):
            if pipeline is not None:  # encoder stack staged over `model`
                from msla_tpu.parallel.pipeline import pipelined_bert_apply

                pp_mesh, n_micro = pipeline
                h = pipelined_bert_apply(self.bert, bert_params, tok, pp_mesh,
                                         n_micro=n_micro, attention_mask=am,
                                         return_mlm_hidden=True)
            else:
                h = self.bert.apply({"params": bert_params}, tok, am,
                                    deterministic=True, return_mlm_hidden=True)
            # fused tied-decoder matmul + argmax (+ online-softmax confidence)
            return mlm_argmax(h.astype(emb.dtype), emb, mlm_bias,
                              with_conf=with_conf, use_pallas=self.use_pallas)

        if n_groups == 1:  # the TPU default: one fully-folded BERT call
            out = group_call(tokens[0], attn[0])
            outs = jax.tree.map(lambda o: o[None], out)
        else:
            _, outs = jax.lax.scan(lambda _, ta: (None, group_call(*ta)),
                                   None, (tokens, attn))

        def unfold(o):  # (n_groups, fold·B, 512) → (B, w)
            o = o.reshape(n_groups, fold, b, s).transpose(2, 0, 1, 3)
            return o.reshape(b, padded)[:, :w]

        return jax.tree.map(unfold, outs)

    def forward(self, params, indices: jax.Array, rng: jax.Array | None = None,
                train: bool = False, pipeline=None) -> jax.Array:
        """(B, W) code indices → (B, 4, T) stems (reference: bert.py:43-82)."""
        b = indices.shape[0]
        x = indices.reshape(b, -1).astype(jnp.int32)
        w = x.shape[1]

        if train and rng is not None:
            # random masking p=0.15 (reference: bert.py:46-48)
            mask = jax.random.uniform(rng, x.shape) < self.mask_prob
            x = jnp.where(mask, self.config.mask_token_id, x)

        # argmax is non-differentiable: no gradient reaches BERT — faithful
        # to the reference, where BERT's grads are None; stop_gradient makes
        # XLA skip the BERT backward pass entirely.
        bert_params = jax.lax.stop_gradient(params["bert"])
        ids = self._chunked_argmax(bert_params, x, with_conf=False,
                                   pipeline=pipeline)

        # rescale vocab ids into codebook range (reference: bert.py:67-73);
        # the reference flattens across the whole batch before taking max
        flat = ids.reshape(-1).astype(jnp.float32)
        denom = jnp.maximum(flat.max(), 1.0)  # reference NaNs on all-zero argmax
        # the reference scales by max_hidden_size-1 = 511, which only
        # coincidentally equals num_embedding-1 at default config (and would
        # crash its scatter for smaller codebooks) — scale by the actual
        # codebook range instead (SURVEY §2 quirk 4, built-to-intent)
        code_ids = jnp.round(flat / denom * (params["codebook"].shape[0] - 1)).astype(jnp.int32)

        # the codebook is a buffer, not a parameter (reference: bert.py:32
        # builds it with requires_grad=False) — no gradient flows into it
        codebook = jax.lax.stop_gradient(params["codebook"])
        quantized = jnp.take(codebook, code_ids, axis=0)  # (B*W, 64)
        quantized = quantized.reshape(b, w, -1)
        quantized_bcw = jnp.swapaxes(quantized, -1, -2)  # (B, 64, W)
        return self.head.apply({"params": params["head"]}, quantized_bcw)

    def code_proposals(self, params, tokens: jax.Array) -> jax.Array:
        """(B, W) token ids → (B, W, 2) [code_id, confidence] per position.

        Backs the iterative code-sampling generation path
        (msla_tpu.inference.AudioGenerator.sample_codes): the same chunked
        BERT forward and argmax→rescale code mapping as `forward`, plus the
        softmax confidence of each argmax pick.
        """
        b, w = tokens.shape
        ids, conf = self._chunked_argmax(params["bert"], tokens.astype(jnp.int32),
                                         with_conf=True)

        flat = ids.reshape(-1).astype(jnp.float32)
        denom = jnp.maximum(flat.max(), 1.0)  # same rescale mapping as forward
        # the reference scales by max_hidden_size-1 = 511, which only
        # coincidentally equals num_embedding-1 at default config (and would
        # crash its scatter for smaller codebooks) — scale by the actual
        # codebook range instead (SURVEY §2 quirk 4, built-to-intent)
        code_ids = jnp.round(flat / denom * (params["codebook"].shape[0] - 1)).astype(jnp.int32)
        return jnp.stack([code_ids.reshape(b, w).astype(jnp.float32), conf], axis=-1)

    # ---- steps -------------------------------------------------------------------
    def loss_fn(self, params, batch, rng):
        indices, instruments = batch
        output = self.forward(params, indices, rng, train=True)
        loss = jnp.asarray(0.0)
        for i in range(4):
            loss = loss + l1_loss(output[:, i, :], instruments[:, i, :])
        return loss, {"train/loss": loss}

    supports_pipeline = True

    def pipeline_loss_fn(self, params, batch, rng, mesh, n_micro: int):
        """loss_fn with the (frozen) BERT encoder stack pipelined over the
        mesh `model` axis — the Trainer `pipeline_parallel` knob for the BERT
        stage. The BERT forward is deterministic in loss_fn too, so pp and dp
        losses are identical (asserted in tests/test_pipeline.py); the argmax
        still blocks gradients, so no backward pipeline runs. Requires the
        folded group batch (chunk_fold·B) divisible by n_micro and the
        microbatch by the `data` axis."""
        indices, instruments = batch
        output = self.forward(params, indices, rng, train=True,
                              pipeline=(mesh, n_micro))
        loss = jnp.asarray(0.0)
        for i in range(4):
            loss = loss + l1_loss(output[:, i, :], instruments[:, i, :])
        return loss, {"train/loss": loss}

    def eval_metrics(self, params, batch, mode: str):
        """Metric catalog (reference: bert.py:107-167)."""
        indices, instruments = batch
        output = self.forward(params, indices, train=False)
        mixed_output = jnp.sum(output, axis=1)
        mixed = jnp.sum(instruments, axis=1)
        metrics = {}
        loss = jnp.asarray(0.0)
        for i, name in enumerate(INSTRUMENTS):
            pred, target = output[:, i, :], instruments[:, i, :]
            loss = loss + l1_loss(pred, target)
            metrics[f"{mode}/l2_{name}_loss"] = mse_loss(pred, target)
            metrics[f"{mode}/l1_{name}_loss"] = l1_loss(pred, target)
            metrics[f"{mode}/si_sdr_{name}_measure"] = si_sdr_mean(pred, target)
        metrics[f"{mode}/si_sdr_full_audio_measure"] = si_sdr_mean(mixed_output, mixed)
        metrics[f"{mode}/l2_full_audio_loss"] = mse_loss(mixed_output, mixed)
        metrics[f"{mode}/l1_full_audio_loss"] = l1_loss(mixed_output, mixed)
        metrics[f"{mode}/loss"] = loss
        return metrics

    def predict_step(self, params, batch):
        """Generation path (reference: bert.py:84-87)."""
        indices, instruments = batch
        if isinstance(params, dict) and "params" in params:
            params = params["params"]
        return self.forward(params, indices, train=False)

    def on_validation_batch_end(self, trainer, params, batch, batch_idx: int) -> None:
        """Audio demo table (reference: bert.py:169-232)."""
        if batch_idx != 0 or not trainer.loggers:
            return
        from msla_tpu.models.demo import log_audio_demo

        stems = np.asarray(batch)
        index = random.randint(0, stems.shape[0] - 1)
        datamodule = getattr(trainer, "datamodule", None)
        if datamodule is None or datamodule.quantize is None:
            return
        if not hasattr(self, "_demo_fwd"):  # jit once (incl. the teacher)
            self._demo_fwd = jax.jit(lambda p, raw: self.forward(
                p, datamodule.on_after_batch_transfer(raw)[0], train=False))
        decode = lambda: np.asarray(self._demo_fwd(
            params, jnp.asarray(stems[index:index + 1]))[0])
        log_audio_demo(trainer, self.hparams["checkpoint_dir"],
                       int(self.hparams["sample_rate"]), stems[index], decode, "bert")
