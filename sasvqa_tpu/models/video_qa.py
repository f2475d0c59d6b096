"""Top-level video-QA task models.

Equivalent of the reference's ``CLIPModelforFinetune`` wrapper +
``CLIPForSeqClassification`` dispatch (src/modeling/clip_model.py:9-82,
src/modeling/modeling.py:393-448), with loss selection (ce / bce / mse)
matching ``calc_loss`` (clip_model.py:62-82).

All models take a fixed-shape frame tensor (B, T, H, W, C) — the ragged
``video_start_end`` bookkeeping of the reference collapses to a static
frame axis, which is both what the live collators actually produce and
what jit wants.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from sasvqa_tpu.models.blip import (BLIPTextConfig, BLIPTextEncoder,
                                    BLIPVisionConfig, BLIPVisionEncoder)
from sasvqa_tpu.models.clip import (CLIPTextConfig, CLIPTextEncoder,
                                    CLIPVisionConfig, CLIPVisionEncoder)
from sasvqa_tpu.core.pixels import maybe_dequantize
from sasvqa_tpu.models.fusion import AnswerClassifier


def classification_loss(logits: jax.Array, labels: jax.Array,
                        loss_type: str = "ce") -> jax.Array:
    """ce (ignore -100) / bce / mse, reference clip_model.py:62-82."""
    if loss_type == "ce":
        valid = labels != -100
        safe = jnp.where(valid, labels, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
        return (nll * valid).sum() / jnp.maximum(valid.sum(), 1)
    if loss_type == "bce":
        # instance_bce_with_logits: mean * num_labels (modeling.py:336-342)
        per = -(labels * jax.nn.log_sigmoid(logits)
                + (1 - labels) * jax.nn.log_sigmoid(-logits))
        return per.mean() * logits.shape[1]
    if loss_type == "mse":
        return jnp.mean((logits.reshape(-1) - labels.reshape(-1)) ** 2)
    raise ValueError(f"unknown loss_type {loss_type}")


@dataclasses.dataclass(frozen=True)
class ClassifierHeadConfig:
    num_labels: int = 1000
    loss_type: str = "ce"
    classifier: str = "linear"
    cls_hidden_scale: int = 2
    hidden_dropout_prob: float = 0.1
    attn_type: str = "dec-only"  # reference variants: enc-dec, dec-cas


class CLIPVideoQA(nn.Module):
    """CLIP dual encoder + cross-attention fusion + answer classifier."""

    text_config: CLIPTextConfig
    vision_config: CLIPVisionConfig
    head: ClassifierHeadConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.txt_model = CLIPTextEncoder(self.text_config, dtype=self.dtype)
        self.vis_model = CLIPVisionEncoder(self.vision_config,
                                           dtype=self.dtype,
                                           with_projection=True)
        self.answer_head = AnswerClassifier(
            num_labels=self.head.num_labels,
            dropout_rate=self.head.hidden_dropout_prob,
            classifier=self.head.classifier,
            cls_hidden_scale=self.head.cls_hidden_scale,
            attn_type=self.head.attn_type,
            dtype=self.dtype)
        self.mc_head = AnswerClassifier(
            num_labels=1, dropout_rate=self.head.hidden_dropout_prob,
            dtype=self.dtype)

    def encode_video(self, pixel_values: jax.Array) -> jax.Array:
        """(B, T, H, W, C) -> per-frame embeddings (B, T, proj).

        Accepts u8-staged pixels (core/pixels wire format) — the
        dequant affine fuses into the patch-embedding conv input."""
        pixel_values = maybe_dequantize(pixel_values, self.dtype)
        b, t = pixel_values.shape[:2]
        flat = pixel_values.reshape((b * t,) + pixel_values.shape[2:])
        _, _, image_embeds = self.vis_model(flat)        # (B*T, proj)
        return image_embeds.reshape(b, t, -1)

    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array,
                 pixel_values: jax.Array,
                 labels: Optional[jax.Array] = None,
                 deterministic: bool = True) -> Dict[str, jax.Array]:
        """input_ids (B, L); pixel_values (Bv, T, H, W, C) with B a
        multiple of Bv (grouped examples share a video; the per-frame
        embeddings repeat post-encoder so the ViT runs once per video —
        reference repeat_counts semantics, modeling.py:439-441)."""
        txt_hidden, _ = self.txt_model(input_ids, attention_mask)
        vis = self.encode_video(pixel_values)
        if vis.shape[0] != input_ids.shape[0]:
            vis = jnp.repeat(vis, input_ids.shape[0] // vis.shape[0],
                             axis=0)
        logits = self.answer_head(txt_hidden, attention_mask, vis,
                                  deterministic=deterministic)
        out = {"logits": logits}
        if labels is not None:
            out["loss"] = classification_loss(logits, labels,
                                              self.head.loss_type)
        return out

    def multiple_choice(self, input_ids: jax.Array,
                        attention_mask: jax.Array,
                        pixel_values: jax.Array, n_options: int,
                        labels: Optional[jax.Array] = None,
                        deterministic: bool = True) -> Dict[str, jax.Array]:
        """TGIF-QA action/transition MC scoring.

        input_ids (B*O, L) question+option rows; pixel_values (B, T, ...).
        The video encodes ONCE; per-frame embeddings repeat across the O
        option rows in embedding space (the reference instead repeats
        raw mean-pooled features per row via repeat_counts,
        modeling.py:439-441, and its MC loss shape never matched — this
        is the standard per-option-scalar formulation instead).
        Returns logits (B, O); labels (B,) option indices.
        """
        txt_hidden, _ = self.txt_model(input_ids, attention_mask)
        vis = self.encode_video(pixel_values)            # (B, T, proj)
        vis = jnp.repeat(vis, n_options, axis=0)         # (B*O, T, proj)
        scores = self.mc_head(txt_hidden, attention_mask, vis,
                              deterministic=deterministic)  # (B*O, 1)
        logits = scores.reshape(-1, n_options)
        out = {"logits": logits}
        if labels is not None:
            out["loss"] = classification_loss(logits, labels, "ce")
        return out


class BLIPVideoQA(nn.Module):
    """BLIP vision + multimodal text encoder + fusion classifier.

    The text encoder cross-attends to the flattened (B, T*P, D) frame
    tokens — a fixed-shape generalisation of the reference BLIP path
    (which only supported T=1; dataset_video_qa.py:280 "FIXME: only impl
    single here").
    """

    text_config: BLIPTextConfig
    vision_config: BLIPVisionConfig
    head: ClassifierHeadConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.txt_model = BLIPTextEncoder(self.text_config, dtype=self.dtype)
        self.vis_model = BLIPVisionEncoder(self.vision_config,
                                           dtype=self.dtype)
        self.answer_head = AnswerClassifier(
            num_labels=self.head.num_labels,
            dropout_rate=self.head.hidden_dropout_prob,
            classifier=self.head.classifier,
            cls_hidden_scale=self.head.cls_hidden_scale,
            attn_type=self.head.attn_type,
            dtype=self.dtype)
        self.mc_head = AnswerClassifier(
            num_labels=1, dropout_rate=self.head.hidden_dropout_prob,
            dtype=self.dtype)

    def _encode(self, pixel_values, input_ids, attention_mask,
                deterministic, repeat: int = 1):
        pixel_values = maybe_dequantize(pixel_values, self.dtype)
        b, t = pixel_values.shape[:2]
        flat = pixel_values.reshape((b * t,) + pixel_values.shape[2:])
        vis_hidden, vis_pooled = self.vis_model(flat)    # (B*T, P, D)
        p, d = vis_hidden.shape[-2:]
        enc_hidden = vis_hidden.reshape(b, t * p, d)
        if repeat > 1:
            enc_hidden = jnp.repeat(enc_hidden, repeat, axis=0)
        txt_hidden, _ = self.txt_model(input_ids, attention_mask,
                                       encoder_hidden=enc_hidden,
                                       deterministic=deterministic)
        vis = vis_pooled.reshape(b, t, -1)
        if repeat > 1:
            vis = jnp.repeat(vis, repeat, axis=0)
        return txt_hidden, vis

    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array,
                 pixel_values: jax.Array,
                 labels: Optional[jax.Array] = None,
                 deterministic: bool = True) -> Dict[str, jax.Array]:
        repeat = input_ids.shape[0] // pixel_values.shape[0]
        txt_hidden, vis = self._encode(pixel_values, input_ids,
                                       attention_mask, deterministic,
                                       repeat=repeat)
        logits = self.answer_head(txt_hidden, attention_mask, vis,
                                  deterministic=deterministic)
        out = {"logits": logits}
        if labels is not None:
            out["loss"] = classification_loss(logits, labels,
                                              self.head.loss_type)
        return out

    def multiple_choice(self, input_ids: jax.Array,
                        attention_mask: jax.Array,
                        pixel_values: jax.Array, n_options: int,
                        labels: Optional[jax.Array] = None,
                        deterministic: bool = True) -> Dict[str, jax.Array]:
        """See CLIPVideoQA.multiple_choice — same formulation."""
        txt_hidden, vis = self._encode(pixel_values, input_ids,
                                       attention_mask, deterministic,
                                       repeat=n_options)
        scores = self.mc_head(txt_hidden, attention_mask, vis,
                              deterministic=deterministic)
        logits = scores.reshape(-1, n_options)
        out = {"logits": logits}
        if labels is not None:
            out["loss"] = classification_loss(logits, labels, "ce")
        return out


def model_family(pretrained_model: str) -> str:
    """Dispatch on the checkpoint name substring, matching the reference
    (tasks/run_video_qa.py:159-180, clip_model.py:19-47)."""
    name = pretrained_model.lower()
    if "clip" in name and "blip" not in name:
        return "clip"
    if "blip" in name:
        return "blip"
    if "git" in name:
        return "git"
    raise ValueError(f"cannot infer model family from {pretrained_model!r}")
