"""HF PyTorch -> Flax parameter converters for CLIP / GIT / BLIP.

The reference loads pretrained encoders straight from the HF hub
(src/modeling/modeling.py:286-287,303-304,321).  Here the torch state
dict (from a local HF checkpoint directory or an in-memory model) is
mechanically renamed into the Flax param tree of our modules.  Parity is
asserted by tests/test_hf_parity.py on tiny randomly-initialised HF
models — no network needed.

Conventions:
- torch ``Linear.weight`` (out, in) -> flax ``kernel`` (in, out): transpose
- torch ``LayerNorm.weight/bias``   -> flax ``scale``/``bias``
- torch ``Embedding.weight``        -> flax ``embedding``
- patch conv kernel (D, C, p, p)    -> unfold Dense kernel (p*p*C, D)
  via ``transpose(2, 3, 1, 0).reshape(p*p*C, D)`` (matches the
  (ph, pw, c) flatten order of models/layers.py PatchEmbed)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def _lin(sd, prefix):
    return {"kernel": _np(sd[f"{prefix}.weight"]).T,
            "bias": _np(sd[f"{prefix}.bias"])}


def _lin_nobias(sd, prefix):
    return {"kernel": _np(sd[f"{prefix}.weight"]).T}


def _ln(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def _emb(sd, prefix):
    return {"embedding": _np(sd[f"{prefix}.weight"])}


def _patch_embed(sd, prefix, use_bias=False):
    w = _np(sd[f"{prefix}.weight"])            # (D, C, p, p)
    d = w.shape[0]
    kernel = w.transpose(2, 3, 1, 0).reshape(-1, d)
    out = {"proj": {"kernel": kernel}}
    if use_bias:
        out["proj"]["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _preln_block(sd, p):
    """CLIP-style encoder layer -> fused-QKV layout (models/layers.py
    FusedSelfAttention): HF's separate q/k/v kernels concatenate on the
    output axis in q,k,v order."""
    qw = _np(sd[f"{p}.self_attn.q_proj.weight"]).T
    kw = _np(sd[f"{p}.self_attn.k_proj.weight"]).T
    vw = _np(sd[f"{p}.self_attn.v_proj.weight"]).T
    qb = _np(sd[f"{p}.self_attn.q_proj.bias"])
    kb = _np(sd[f"{p}.self_attn.k_proj.bias"])
    vb = _np(sd[f"{p}.self_attn.v_proj.bias"])
    return {
        "self_attn": {
            "qkv": {"kernel": np.concatenate([qw, kw, vw], axis=1),
                    "bias": np.concatenate([qb, kb, vb])},
            "out_proj": _lin(sd, f"{p}.self_attn.out_proj"),
        },
        "layer_norm1": _ln(sd, f"{p}.layer_norm1"),
        "layer_norm2": _ln(sd, f"{p}.layer_norm2"),
        "mlp": {"fc1": _lin(sd, f"{p}.mlp.fc1"),
                "fc2": _lin(sd, f"{p}.mlp.fc2")},
    }


def _blip_vision_block(sd, p):
    """BLIP vision layer: HF stores QKV already fused as (3D, D)."""
    return {
        "self_attn": {
            "qkv": {"kernel": _np(sd[f"{p}.self_attn.qkv.weight"]).T,
                    "bias": _np(sd[f"{p}.self_attn.qkv.bias"])},
            "out_proj": _lin(sd, f"{p}.self_attn.projection"),
        },
        "layer_norm1": _ln(sd, f"{p}.layer_norm1"),
        "layer_norm2": _ln(sd, f"{p}.layer_norm2"),
        "mlp": {"fc1": _lin(sd, f"{p}.mlp.fc1"),
                "fc2": _lin(sd, f"{p}.mlp.fc2")},
    }


def _bert_attention(sd, p):
    """BERT attention: {p}.self.{query,key,value} + {p}.output.{dense,LayerNorm}."""
    return {
        "query": _lin(sd, f"{p}.self.query"),
        "key": _lin(sd, f"{p}.self.key"),
        "value": _lin(sd, f"{p}.self.value"),
        "out_dense": _lin(sd, f"{p}.output.dense"),
        "out_ln": _ln(sd, f"{p}.output.LayerNorm"),
    }


def _bert_attention_fused(sd, p):
    """BERT attention -> fused QKV layout (GitAttention)."""
    qw = _np(sd[f"{p}.self.query.weight"]).T
    kw = _np(sd[f"{p}.self.key.weight"]).T
    vw = _np(sd[f"{p}.self.value.weight"]).T
    qb = _np(sd[f"{p}.self.query.bias"])
    kb = _np(sd[f"{p}.self.key.bias"])
    vb = _np(sd[f"{p}.self.value.bias"])
    return {
        "qkv": {"kernel": np.concatenate([qw, kw, vw], axis=1),
                "bias": np.concatenate([qb, kb, vb])},
        "out_dense": _lin(sd, f"{p}.output.dense"),
        "out_ln": _ln(sd, f"{p}.output.LayerNorm"),
    }


# --------------------------------------------------------------------------
# CLIP


def convert_clip_text(sd: Dict[str, Any], num_layers: int,
                      prefix: str = "text_model") -> Dict[str, Any]:
    """HF CLIPTextModel state_dict -> CLIPTextEncoder params.  Picks up
    ``text_projection`` when present (full-CLIPModel checkpoints)."""
    params = {
        "token_embedding": _emb(sd, f"{prefix}.embeddings.token_embedding"),
        "position_embedding": _emb(
            sd, f"{prefix}.embeddings.position_embedding"),
        "final_layer_norm": _ln(sd, f"{prefix}.final_layer_norm"),
    }
    if "text_projection.weight" in sd:
        params["text_projection"] = _lin_nobias(sd, "text_projection")
    for i in range(num_layers):
        params[f"layers_{i}"] = _preln_block(
            sd, f"{prefix}.encoder.layers.{i}")
    return params


def convert_clip_vision(sd: Dict[str, Any], num_layers: int,
                        prefix: str = "vision_model",
                        projection_key: str = "visual_projection",
                        ) -> Dict[str, Any]:
    """HF CLIPVisionModel(WithProjection) state_dict -> CLIPVisionEncoder."""
    params = {
        "class_embedding": _np(sd[f"{prefix}.embeddings.class_embedding"]),
        "patch_embedding": _patch_embed(
            sd, f"{prefix}.embeddings.patch_embedding", use_bias=False),
        "position_embedding": _emb(
            sd, f"{prefix}.embeddings.position_embedding"),
        "pre_layrnorm": _ln(sd, f"{prefix}.pre_layrnorm"),
        "post_layernorm": _ln(sd, f"{prefix}.post_layernorm"),
    }
    for i in range(num_layers):
        params[f"layers_{i}"] = _preln_block(
            sd, f"{prefix}.encoder.layers.{i}")
    if projection_key and f"{projection_key}.weight" in sd:
        params["visual_projection"] = _lin_nobias(sd, projection_key)
    return params


# --------------------------------------------------------------------------
# GIT


def convert_git(sd: Dict[str, Any], num_layers: int,
                num_vision_layers: int) -> Dict[str, Any]:
    """HF GitForCausalLM state_dict -> GITForCausalLM params.

    Note: ``git.img_temporal_embedding`` params (created when
    num_image_with_embedding is set) are intentionally dropped — the
    reference fork disables their use (modeling.py:86) so they stay
    zero-initialised and contribute nothing.
    """
    params = {
        "image_encoder": convert_clip_vision(
            sd, num_vision_layers,
            prefix="git.image_encoder.vision_model", projection_key=""),
        "visual_projection": _lin(
            sd, "git.visual_projection.visual_projection.0"),
        "visual_projection_ln": _ln(
            sd, "git.visual_projection.visual_projection.1"),
        "word_embeddings": _emb(sd, "git.embeddings.word_embeddings"),
        "position_embeddings": _emb(sd, "git.embeddings.position_embeddings"),
        "emb_ln": _ln(sd, "git.embeddings.LayerNorm"),
        "output": _lin(sd, "output"),
    }
    for i in range(num_layers):
        p = f"git.encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": _bert_attention_fused(sd, f"{p}.attention"),
            "ffn": {
                "intermediate": _lin(sd, f"{p}.intermediate.dense"),
                "output": _lin(sd, f"{p}.output.dense"),
                "ln": _ln(sd, f"{p}.output.LayerNorm"),
            },
        }
    return params


# --------------------------------------------------------------------------
# BLIP


def convert_blip_vision(sd: Dict[str, Any], num_layers: int,
                        prefix: str = "") -> Dict[str, Any]:
    """Standalone ``BlipVisionModel`` state dicts carry no prefix; pass
    ``prefix='vision_model'`` when converting from a full BlipModel."""
    pre = f"{prefix}." if prefix else ""
    params = {
        "class_embedding": _np(
            sd[f"{pre}embeddings.class_embedding"]),
        "patch_embedding": _patch_embed(
            sd, f"{pre}embeddings.patch_embedding", use_bias=True),
        "position_embedding": _np(
            sd[f"{pre}embeddings.position_embedding"]),
        "post_layernorm": _ln(sd, f"{pre}post_layernorm"),
    }
    for i in range(num_layers):
        params[f"layers_{i}"] = _blip_vision_block(
            sd, f"{pre}encoder.layers.{i}")
    return params


def convert_blip_text(sd: Dict[str, Any], num_layers: int,
                      prefix: str = "",
                      cross_attention: bool = True) -> Dict[str, Any]:
    pre = f"{prefix}." if prefix else ""
    params = {
        "word_embeddings": _emb(sd, f"{pre}embeddings.word_embeddings"),
        "position_embeddings": _emb(
            sd, f"{pre}embeddings.position_embeddings"),
        "emb_ln": _ln(sd, f"{pre}embeddings.LayerNorm"),
        "pooler": _lin(sd, f"{pre}pooler.dense"),
    }
    for i in range(num_layers):
        p = f"{pre}encoder.layer.{i}"
        layer = {
            "attention": _bert_attention(sd, f"{p}.attention"),
            "ffn": {
                "intermediate": _lin(sd, f"{p}.intermediate.dense"),
                "output": _lin(sd, f"{p}.output.dense"),
                "ln": _ln(sd, f"{p}.output.LayerNorm"),
            },
        }
        if cross_attention and f"{p}.crossattention.self.query.weight" in sd:
            layer["crossattention"] = _bert_attention(sd, f"{p}.crossattention")
        params[f"layers_{i}"] = layer
    return params


# --------------------------------------------------------------------------
# torch.nn fusion-head layers (the reference's CrossAttentionLayer is
# built from torch.nn.TransformerDecoder, modeling.py:366-374)


def _torch_mha(sd, prefix):
    """torch.nn.MultiheadAttention (packed in_proj) -> our
    MultiHeadAttention {q,k,v,out}_proj params."""
    w = _np(sd[f"{prefix}.in_proj_weight"])    # (3D, D)
    b = _np(sd[f"{prefix}.in_proj_bias"])
    d = w.shape[1]

    def part(i):
        return {"kernel": w[i * d:(i + 1) * d].T,
                "bias": b[i * d:(i + 1) * d]}

    return {"q_proj": part(0), "k_proj": part(1), "v_proj": part(2),
            "out_proj": _lin(sd, f"{prefix}.out_proj")}


def _torch_decoder_layer(sd, p):
    """torch.nn.TransformerDecoderLayer -> fusion.TransformerDecoderLayer."""
    return {
        "self_attn": _torch_mha(sd, f"{p}.self_attn"),
        "cross_attn": _torch_mha(sd, f"{p}.multihead_attn"),
        "linear1": _lin(sd, f"{p}.linear1"),
        "linear2": _lin(sd, f"{p}.linear2"),
        "norm1": _ln(sd, f"{p}.norm1"),
        "norm2": _ln(sd, f"{p}.norm2"),
        "norm3": _ln(sd, f"{p}.norm3"),
    }


# --------------------------------------------------------------------------
# top-level assembly


def convert_clip_classifier(sd: Dict[str, Any], num_text_layers: int,
                            num_vision_layers: int,
                            n_fusion_layers: int = 1) -> Dict[str, Any]:
    """Reference ``CLIPForSeqClassification`` state dict
    (src/modeling/modeling.py:393-448) -> ``CLIPVideoQA`` params — the
    WHOLE trained model, not just the encoders: CLIP text+vision towers,
    the dec-only CrossAttentionLayer (a torch TransformerDecoder) and
    the linear answer classifier.  Lets a reference-finetuned classifier
    checkpoint load directly.  ``CLIPModelforFinetune`` dicts (the
    ``VLModel.`` wrapper prefix, clip_model.py:9-13) are accepted too.
    """
    if any(k.startswith("VLModel.") for k in sd):
        sd = {k[len("VLModel."):]: v for k, v in sd.items()
              if k.startswith("VLModel.")}
    return {
        "txt_model": convert_clip_text(
            sd, num_text_layers, prefix="vlm.txt_model.text_model"),
        "vis_model": convert_clip_vision(
            sd, num_vision_layers, prefix="vlm.vis_model.vision_model",
            projection_key="vlm.vis_model.visual_projection"),
        "answer_head": {
            "attention": {
                f"layers_{i}": _torch_decoder_layer(
                    sd, f"attention.attention.layers.{i}")
                for i in range(n_fusion_layers)},
            "classifier": _lin(sd, "classifier"),
        },
    }


def convert_blip_classifier(sd: Dict[str, Any], num_text_layers: int,
                            num_vision_layers: int,
                            n_fusion_layers: int = 1) -> Dict[str, Any]:
    """Reference BLIP-family ``CLIPForSeqClassification`` state dict
    (src/modeling/modeling.py:393-411 with ``BLIPBaseModel``,
    :299-315) -> ``BLIPVideoQA`` params — the whole trained model:
    BLIP vision tower, cross-attending BLIP text encoder, the dec-only
    CrossAttentionLayer and the linear answer classifier.
    ``CLIPModelforFinetune`` dicts (``VLModel.`` prefix) accepted too.
    """
    if any(k.startswith("VLModel.") for k in sd):
        sd = {k[len("VLModel."):]: v for k, v in sd.items()
              if k.startswith("VLModel.")}
    return {
        "txt_model": convert_blip_text(
            sd, num_text_layers, prefix="vlm.txt_model"),
        "vis_model": convert_blip_vision(
            sd, num_vision_layers, prefix="vlm.vis_model"),
        "answer_head": {
            "attention": {
                f"layers_{i}": _torch_decoder_layer(
                    sd, f"attention.attention.layers.{i}")
                for i in range(n_fusion_layers)},
            "classifier": _lin(sd, "classifier"),
        },
    }


def convert_clip_video_qa(sd: Dict[str, Any], num_text_layers: int,
                          num_vision_layers: int) -> Dict[str, Any]:
    """Full CLIPModel (text+vision+projections) -> CLIPVideoQA encoder
    params (fusion head + classifier stay randomly initialised, as in the
    reference which trains them from scratch)."""
    return {
        "txt_model": convert_clip_text(sd, num_text_layers),
        "vis_model": convert_clip_vision(sd, num_vision_layers),
    }


def merge_pretrained(init_params: Dict[str, Any],
                     converted: Dict[str, Any],
                     ) -> Tuple[Dict[str, Any], Dict[str, list]]:
    """Overlay converted weights onto an init param tree, keeping any
    missing leaves (e.g. classifier head) from init.

    Shape-mismatch-tolerant like the reference's
    ``load_state_dict_with_mismatch`` (src/utils/load_save.py:65-94):
    mismatched leaves keep their initialised values and are reported.
    """
    import jax.numpy as jnp

    report = {"loaded": [], "mismatched": [], "missing_in_ckpt": []}

    def _merge(dst, src, path):
        out = {}
        for k, v in dst.items():
            kpath = f"{path}/{k}"
            if k not in src:
                report["missing_in_ckpt"].append(kpath)
                out[k] = v
            elif isinstance(v, dict):
                out[k] = _merge(v, src[k], kpath)
            else:
                sv = jnp.asarray(src[k])
                if sv.shape != v.shape:
                    report["mismatched"].append(
                        f"{kpath}: ckpt {sv.shape} vs model {v.shape}")
                    out[k] = v
                else:
                    report["loaded"].append(kpath)
                    out[k] = sv.astype(v.dtype)
        return out

    merged = _merge(init_params, converted, "")
    return merged, report
