"""Video-text retrieval evaluation (CLIP dual-encoder).

Capability preserved from the reference's vestigial retrieval stack
(src/tasks/run_video_retrieval.py — dead code with broken imports, but
its Recall@K/MedR/MeanR evaluator :519-543 and multi-clip aggregation
:404-418 are the behaviors worth keeping, SURVEY.md §2.3):

    python -m sasvqa_tpu.tasks.run_retrieval --config cfg.json

Encodes every (caption, video) pair with the CLIP towers — video
embedding = score_agg_func-pooled per-frame image embeds — and reports
text->video R@1/5/10, MedR, MeanR.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from sasvqa_tpu.core.logging import LOGGER
from sasvqa_tpu.train.retrieval import (aggregate_clip_scores,
                                        retrieval_metrics,
                                        similarity_matrix)


def encode_corpus(model, params, tokenizer, captions: List[str],
                  frames: np.ndarray, cfg) -> Dict[str, np.ndarray]:
    """captions: N strings; frames: (N, T, H, W, C).

    Returns normalized text (N, D) and video (N, D) embeddings; video =
    mean/max/lse pooled per-frame CLIP image embeds.
    """
    from sasvqa_tpu.models.clip import CLIPTextEncoder, CLIPVisionEncoder

    enc = tokenizer(captions, max_length=cfg.get("max_txt_len", 20))
    ids = jnp.asarray(enc["input_ids"])
    mask = jnp.asarray(enc["attention_mask"])
    # standalone towers over the task model's param subtrees (setup-bound
    # submodules are only reachable inside apply)
    txt_tower = CLIPTextEncoder(model.text_config, dtype=model.dtype)
    vis_tower = CLIPVisionEncoder(model.vision_config, dtype=model.dtype,
                                  with_projection=True)

    @jax.jit
    def encode(params, ids, mask, frames):
        _, txt_pooled = txt_tower.apply(
            {"params": params["params"]["txt_model"]}, ids, mask)
        b, t = frames.shape[:2]
        flat = frames.reshape((b * t,) + frames.shape[2:])
        _, _, image_embeds = vis_tower.apply(
            {"params": params["params"]["vis_model"]}, flat)
        vis = image_embeds.reshape(b, t, -1)
        vid = aggregate_clip_scores(vis, cfg.get("score_agg_func", "mean"),
                                    axis=1)
        return txt_pooled, vid

    txt, vid = encode(params, ids, mask, jnp.asarray(frames))
    return {"text": np.asarray(txt), "video": np.asarray(vid)}


def evaluate_retrieval(model, params, tokenizer, captions, frames,
                       cfg) -> Dict[str, float]:
    embeds = encode_corpus(model, params, tokenizer, captions, frames, cfg)
    sim = np.asarray(similarity_matrix(jnp.asarray(embeds["text"]),
                                       jnp.asarray(embeds["video"])))
    metrics = retrieval_metrics(sim)
    LOGGER.info(f"retrieval: {metrics}")
    return metrics


def main(argv: Optional[List[str]] = None) -> Dict[str, float]:
    import argparse
    from sasvqa_tpu.core.config import load_config
    from sasvqa_tpu.data.annotations import load_datalist
    from sasvqa_tpu.data.frame_store import (FrameStoreReader,
                                             load_vidmapping)
    from sasvqa_tpu.models.presets import build_model, load_pretrained_params
    from sasvqa_tpu.tasks.run_video_qa import build_tokenizer

    p = argparse.ArgumentParser(description="video-text retrieval eval")
    p.add_argument("--config", required=True)
    args = p.parse_args(argv)
    cfg = load_config(args.config)

    family, model = build_model(cfg, dtype=jnp.bfloat16)
    assert family == "clip", "retrieval eval uses the CLIP dual encoder"
    tokenizer = build_tokenizer(cfg, family)

    datalist = load_datalist(cfg.task, cfg.val_datasets[0].txt)
    store = FrameStoreReader(cfg.val_datasets[0].img)
    vid2id = load_vidmapping(cfg.vid_mapping)
    # one caption per unique video (first question acts as the query in
    # QA-style annotations; retrieval datasets provide real captions)
    seen = {}
    for d in datalist:
        seen.setdefault(d["video_id"], d["question"])
    video_ids = list(seen)
    captions = [seen[v] for v in video_ids]
    t = cfg.get("nframe", 4)
    frames = np.stack([store.read_nhwc(vid2id[v])[:t] for v in video_ids])

    ids0 = jnp.asarray(tokenizer([captions[0]],
                                 max_length=cfg.get("max_txt_len", 20))
                       ["input_ids"])
    params = jax.jit(model.init)(jax.random.key(0), ids0,
                                 jnp.ones_like(ids0),
                                 jnp.asarray(frames[:1]))
    weights = cfg.model.get("pretrained_weights")
    if weights:
        params = load_pretrained_params(family, model, params, weights)
    metrics = evaluate_retrieval(model, params, tokenizer, captions,
                                 frames, cfg)
    print(metrics)
    return metrics


if __name__ == "__main__":
    main()
