"""Model presets + construction from task config.

Maps the reference's ``cfg.model.pretrained_model`` checkpoint names
(msvd/msrvtt config JSONs, e.g. "openai/clip-vit-base-patch16",
"microsoft/git-base-msrvtt-qa") to our config dataclasses, plus tiny
presets for tests/synthetic runs.  Weight loading from a *local* HF
checkpoint dir is in load_pretrained_params (no hub egress here).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from sasvqa_tpu.core.logging import LOGGER
from sasvqa_tpu.models.blip import BLIPTextConfig, BLIPVisionConfig
from sasvqa_tpu.models.clip import (CLIP_VIT_B16, CLIP_VIT_B32, CLIP_VIT_L14,
                                    CLIPTextConfig, CLIPVisionConfig)
from sasvqa_tpu.models.git import GIT_BASE, GITConfig
from sasvqa_tpu.models.video_qa import (BLIPVideoQA, CLIPVideoQA,
                                        ClassifierHeadConfig, model_family)

TINY_VISION = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                               num_layers=2, num_heads=4, image_size=32,
                               patch_size=16, projection_dim=32)
TINY_TEXT = CLIPTextConfig(vocab_size=512, hidden_size=32,
                           intermediate_size=64, num_layers=2, num_heads=4,
                           max_position_embeddings=32, eos_token_id=511)


def _clip_configs(name: str) -> Tuple[CLIPTextConfig, CLIPVisionConfig]:
    if "tiny" in name:
        return TINY_TEXT, TINY_VISION
    if "large-patch14" in name or "l14" in name:
        return CLIP_VIT_L14
    if "patch16" in name or "b16" in name:
        return CLIP_VIT_B16
    return CLIP_VIT_B32


def _git_config(name: str) -> GITConfig:
    if "tiny" in name:
        return GITConfig(
            vocab_size=512, hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64, max_position_embeddings=128,
            vision=TINY_VISION)
    if "large" in name:
        return dataclasses.replace(
            GIT_BASE,
            hidden_size=768, num_layers=6,
            vision=CLIP_VIT_L14[1])  # GIT-large uses ViT-L/14 vision
    return GIT_BASE


def _blip_configs(name: str) -> Tuple[BLIPTextConfig, BLIPVisionConfig]:
    if "tiny" in name:
        return (BLIPTextConfig(vocab_size=512, hidden_size=32,
                               intermediate_size=64, num_layers=2,
                               num_heads=4, max_position_embeddings=64,
                               encoder_width=32),
                BLIPVisionConfig(hidden_size=32, intermediate_size=64,
                                 num_layers=2, num_heads=4, image_size=32,
                                 patch_size=16))
    if "large" in name:
        # encoder_width records the VISION width the text stack
        # cross-attends over (blip-large's towers are asymmetric:
        # vision 1024, text 768)
        return (BLIPTextConfig(encoder_width=1024),
                BLIPVisionConfig(hidden_size=1024, intermediate_size=4096,
                                 num_layers=24, num_heads=16))
    return BLIPTextConfig(), BLIPVisionConfig()


def build_model(cfg, dtype=jnp.float32):
    """Construct the task model from cfg.model (run_video_qa.py:239-266).

    Returns (family, model).  cfg.model.pretrained_model selects the
    family by substring exactly like the reference dispatch.
    Overrides: cfg.model may carry vocab_size / img_size adjustments for
    synthetic runs.
    """
    name = cfg.model.pretrained_model.lower()
    family = model_family(name)
    head = ClassifierHeadConfig(
        num_labels=cfg.get("num_labels", cfg.model.get("num_labels", 1000)),
        loss_type=cfg.get("loss_type", "ce"),
        classifier=cfg.get("classifier", "linear"),
        cls_hidden_scale=cfg.get("cls_hidden_scale", 2),
        hidden_dropout_prob=cfg.model.get("hidden_dropout_prob", 0.1),
        attn_type=cfg.model.get("attn_type", "dec-only"))

    img_size = cfg.get("img_size")
    vocab_override = cfg.model.get("vocab_size")

    if family == "clip":
        tc, vc = _clip_configs(name)
        if vocab_override:
            tc = dataclasses.replace(tc, vocab_size=vocab_override,
                                     eos_token_id=vocab_override - 1)
        if img_size and img_size != vc.image_size:
            vc = dataclasses.replace(vc, image_size=img_size)
        return family, CLIPVideoQA(tc, vc, head, dtype=dtype)
    if family == "blip":
        tc, vc = _blip_configs(name)
        if vocab_override:
            tc = dataclasses.replace(tc, vocab_size=vocab_override)
        if img_size and img_size != vc.image_size:
            vc = dataclasses.replace(vc, image_size=img_size)
        return family, BLIPVideoQA(tc, vc, head, dtype=dtype)
    if family == "git":
        from sasvqa_tpu.models.git import GITForCausalLM
        gc = _git_config(name)
        if vocab_override:
            gc = dataclasses.replace(gc, vocab_size=vocab_override)
        # HF GitConfig knob names accepted for both dropouts
        hd = cfg.model.get("hidden_dropout_prob")
        if hd is not None:
            gc = dataclasses.replace(gc, dropout=float(hd))
        ad = cfg.model.get("attention_probs_dropout_prob")
        if ad is not None:
            gc = dataclasses.replace(gc, attention_dropout=float(ad))
        if img_size and img_size != gc.vision.image_size:
            gc = dataclasses.replace(
                gc, vision=dataclasses.replace(gc.vision,
                                               image_size=img_size))
        remat = bool(cfg.model.get("remat", cfg.get("remat", False)))
        # optional jax.checkpoint_policies name (saves selected
        # intermediates instead of full-block recompute; see
        # CLIPVisionEncoder.remat_policy + BASELINE.md vitl16 sweep)
        remat_policy = cfg.model.get("remat_policy",
                                     cfg.get("remat_policy", None)) or None
        return family, GITForCausalLM(gc, dtype=dtype, remat=remat,
                                      remat_policy=remat_policy)
    raise ValueError(family)


def _load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a local HF checkpoint dir / file into a numpy state dict."""
    import numpy as np
    if os.path.isdir(path):
        for fname in ("model.safetensors", "pytorch_model.bin"):
            cand = os.path.join(path, fname)
            if os.path.exists(cand):
                path = cand
                break
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return load_file(path)
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def load_pretrained_params(family: str, model, init_params,
                           weights_path: str):
    """Overlay converted HF weights onto init params, shape-tolerantly.

    Reference equivalent: ``*.from_pretrained`` at modeling.py:286-321 +
    ``load_state_dict_with_mismatch`` (load_save.py:65-94).
    """
    from sasvqa_tpu.models import convert as cv
    sd = _load_torch_state_dict(weights_path)
    if family == "clip":
        tcfg, vcfg = model.text_config, model.vision_config
        converted = {"txt_model": cv.convert_clip_text(sd, tcfg.num_layers),
                     "vis_model": cv.convert_clip_vision(sd, vcfg.num_layers)}
    elif family == "blip":
        tcfg, vcfg = model.text_config, model.vision_config
        converted = {
            "txt_model": cv.convert_blip_text(sd, tcfg.num_layers,
                                              prefix="text_model"),
            "vis_model": cv.convert_blip_vision(sd, vcfg.num_layers,
                                                prefix="vision_model")}
    elif family == "git":
        converted = cv.convert_git(sd, model.config.num_layers,
                                   model.config.vision.num_layers)
    else:
        raise ValueError(family)
    merged, report = cv.merge_pretrained(init_params["params"], converted)
    LOGGER.info(
        f"loaded {len(report['loaded'])} tensors from {weights_path}; "
        f"{len(report['missing_in_ckpt'])} kept from init; "
        f"{len(report['mismatched'])} shape mismatches")
    for line in report["mismatched"]:
        LOGGER.warning(f"  mismatch: {line}")
    return {"params": merged}
