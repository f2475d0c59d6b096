"""Flax BERT encoder + sequence-classification head.

Used by MIF stage 2: the question-aware frame scorer loads an
``AutoModelForSequenceClassification`` BERT
(reference: src/preprocessing/gen_sample.py:113,159-160, default
``iarfmoose/bert-base-cased-qa-evaluator``) and scores
(question, caption) pairs with ``logits[:, 0]`` (gen_sample.py:83-85).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from sasvqa_tpu.models.layers import PostLNBlock
from sasvqa_tpu.ops.attention import padding_bias


@dataclasses.dataclass(frozen=True)
class BERTConfig:
    vocab_size: int = 28996          # bert-base-cased
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"
    dropout: float = 0.1
    num_labels: int = 2


class BERTForSequenceClassification(nn.Module):
    config: BERTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array,
                 token_type_ids: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        cfg = self.config
        b, l = input_ids.shape
        # trace-time guard (see models/clip.py): JAX clamps OOB
        # embedding gathers under jit instead of erroring like HF
        assert l <= cfg.max_position_embeddings, (
            f"text length {l} exceeds max_position_embeddings "
            f"{cfg.max_position_embeddings} — lower --score_max_length")
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = (nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                      name="word_embeddings")(input_ids)
             + nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                        dtype=self.dtype, name="position_embeddings")(
                 jnp.arange(l)[None, :])
             + nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                        dtype=self.dtype, name="token_type_embeddings")(
                 token_type_ids))
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="emb_ln")(x)
        x = nn.Dropout(cfg.dropout, deterministic=deterministic)(x)
        bias = padding_bias(attention_mask, dtype=self.dtype)
        for i in range(cfg.num_layers):
            x = PostLNBlock(cfg.num_heads, cfg.intermediate_size,
                            cfg.hidden_act, cfg.layer_norm_eps, cfg.dropout,
                            dtype=self.dtype, name=f"layers_{i}")(
                x, bias=bias, deterministic=deterministic)
        pooled = nn.tanh(nn.Dense(cfg.hidden_size, dtype=self.dtype,
                                  name="pooler")(x[:, 0]))
        pooled = nn.Dropout(cfg.dropout, deterministic=deterministic)(pooled)
        return nn.Dense(cfg.num_labels, dtype=self.dtype,
                        name="classifier")(pooled).astype(jnp.float32)


def convert_bert_classifier(sd: Dict[str, Any],
                            num_layers: int) -> Dict[str, Any]:
    """HF BertForSequenceClassification state_dict -> params."""
    from sasvqa_tpu.models.convert import _bert_attention, _emb, _lin, _ln
    params = {
        "word_embeddings": _emb(sd, "bert.embeddings.word_embeddings"),
        "position_embeddings": _emb(
            sd, "bert.embeddings.position_embeddings"),
        "token_type_embeddings": _emb(
            sd, "bert.embeddings.token_type_embeddings"),
        "emb_ln": _ln(sd, "bert.embeddings.LayerNorm"),
        "pooler": _lin(sd, "bert.pooler.dense"),
        "classifier": _lin(sd, "classifier"),
    }
    for i in range(num_layers):
        p = f"bert.encoder.layer.{i}"
        params[f"layers_{i}"] = {
            "attention": _bert_attention(sd, f"{p}.attention"),
            "ffn": {
                "intermediate": _lin(sd, f"{p}.intermediate.dense"),
                "output": _lin(sd, f"{p}.output.dense"),
                "ln": _ln(sd, f"{p}.output.LayerNorm"),
            },
        }
    return params
