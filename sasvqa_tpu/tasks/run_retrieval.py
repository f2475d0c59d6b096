"""Video-text retrieval evaluation (CLIP dual-encoder).

Capability preserved from the reference's vestigial retrieval stack
(src/tasks/run_video_retrieval.py — dead code with broken imports, but
its Recall@K/MedR/MeanR evaluator :519-543 and multi-clip aggregation
:404-418 are the behaviors worth keeping, SURVEY.md §2.3):

    python -m sasvqa_tpu.tasks.run_retrieval --config cfg.json

Encodes every (caption, video) pair with the projected CLIP towers —
text via text_projection, video = score_agg_func-pooled per-frame image
embeds — in val_batch_size chunks, and reports text->video R@1/5/10,
MedR, MeanR.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from sasvqa_tpu.core.logging import LOGGER
from sasvqa_tpu.train.retrieval import (aggregate_clip_scores,
                                        retrieval_metrics)


def build_towers(cfg, dtype=jnp.bfloat16):
    """Standalone projected CLIP towers (both ends land in the shared
    embedding space — the task model's text tower is unprojected)."""
    import dataclasses
    from sasvqa_tpu.models.clip import CLIPTextEncoder, CLIPVisionEncoder
    from sasvqa_tpu.models.presets import _clip_configs

    name = cfg.model.pretrained_model.lower()
    tc, vc = _clip_configs(name)
    if cfg.model.get("vocab_size"):
        tc = dataclasses.replace(tc, vocab_size=cfg.model.vocab_size,
                                 eos_token_id=cfg.model.vocab_size - 1)
    if cfg.get("img_size") and cfg.img_size != vc.image_size:
        vc = dataclasses.replace(vc, image_size=cfg.img_size)
    txt_tower = CLIPTextEncoder(tc, dtype=dtype, with_projection=True,
                                projection_dim=vc.projection_dim)
    vis_tower = CLIPVisionEncoder(vc, dtype=dtype, with_projection=True)
    return txt_tower, vis_tower


def encode_corpus(txt_tower, vis_tower, txt_params, vis_params, tokenizer,
                  captions: List[str], frames: np.ndarray, cfg,
                  batch_size: int = 64) -> Dict[str, np.ndarray]:
    """captions: N strings; frames: (N, T, H, W, C), chunked encode.

    Returns text (N, D) and PER-FRAME video (N, T, D) embeddings in the
    shared CLIP space.  score_agg_func pooling happens over per-clip
    similarity SCORES in evaluate_retrieval — pooling the embeddings
    themselves (the r3 original) computed a coordinate-wise logsumexp
    of signed embedding components under 'lse', nothing like the
    reference's LSE over clip scores (run_video_retrieval.py:404-418;
    r3 review finding)."""
    enc = tokenizer(captions, max_length=cfg.get("max_txt_len", 20))

    # params cross the jit boundary as ARGUMENTS: closure capture bakes
    # both CLIP towers (~150M params) into the HLO as constants — the
    # remote-compile-size hazard documented at extract_frames.MDFEncoder
    @jax.jit
    def _encode(tp, vp, ids, mask, frames):
        _, txt = txt_tower.apply(tp, ids, mask)
        b, t = frames.shape[:2]
        flat = frames.reshape((b * t,) + frames.shape[2:])
        _, _, image_embeds = vis_tower.apply(vp, flat)
        vid = image_embeds.reshape(b, t, -1)
        return txt, vid

    encode = lambda ids, mask, frames: _encode(txt_params, vis_params,
                                               ids, mask, frames)

    n = len(captions)
    bs = min(batch_size, n)
    txt_out, vid_out = [], []
    for s in range(0, n, bs):
        e = min(s + bs, n)
        ids = enc["input_ids"][s:e]
        mask = enc["attention_mask"][s:e]
        chunk = frames[s:e]
        if e - s < bs:  # pad the final chunk to the compiled shape
            pad = bs - (e - s)
            ids = np.pad(ids, ((0, pad), (0, 0)))
            mask = np.pad(mask, ((0, pad), (0, 0)))
            chunk = np.pad(chunk, ((0, pad),) + ((0, 0),) * 4)
        txt, vid = encode(jnp.asarray(ids), jnp.asarray(mask),
                          jnp.asarray(chunk))
        txt_out.append(np.asarray(txt)[:e - s])
        vid_out.append(np.asarray(vid)[:e - s])
    return {"text": np.concatenate(txt_out),
            "video": np.concatenate(vid_out)}


def evaluate_retrieval(txt_tower, vis_tower, txt_params, vis_params,
                       tokenizer, captions, frames, cfg,
                       batch_size: int = 64) -> Dict[str, float]:
    embeds = encode_corpus(txt_tower, vis_tower, txt_params, vis_params,
                           tokenizer, captions, frames, cfg, batch_size)
    # per-frame cosine similarities (Nt, Nv, T), then score_agg_func
    # pools the SCORES over clips — reference semantics
    # (run_video_retrieval.py:404-418)
    txt = jnp.asarray(embeds["text"], jnp.float32)
    vid = jnp.asarray(embeds["video"], jnp.float32)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    vid = vid / jnp.linalg.norm(vid, axis=-1, keepdims=True)
    sim_frames = jnp.einsum("td,vfd->tvf", txt, vid)
    # default 'mean' matches the shared parser and the reference default
    # (reference config.py:99); shipped configs set 'lse' explicitly
    sim = np.asarray(aggregate_clip_scores(
        sim_frames, cfg.get("score_agg_func", "mean"), axis=-1))
    metrics = retrieval_metrics(sim)
    LOGGER.info(f"retrieval: {metrics}")
    return metrics


def main(argv: Optional[List[str]] = None) -> Dict[str, float]:
    import argparse
    from sasvqa_tpu.core.config import load_config
    from sasvqa_tpu.data.annotations import load_datalist
    from sasvqa_tpu.data.frame_store import (FrameStoreReader,
                                             load_vidmapping)
    from sasvqa_tpu.models.convert import (convert_clip_text,
                                           convert_clip_vision,
                                           merge_pretrained)
    from sasvqa_tpu.tasks.run_video_qa import build_tokenizer
    from sasvqa_tpu.tools.extract_frames import _uniform_centers

    p = argparse.ArgumentParser(description="video-text retrieval eval")
    p.add_argument("--config", required=True)
    args = p.parse_args(argv)
    cfg = load_config(args.config)

    txt_tower, vis_tower = build_towers(cfg)
    tokenizer = build_tokenizer(cfg, "clip")

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
    # uniform centers per video (stores may hold ragged K frames)
    stacks = []
    for v in video_ids:
        fr = store.read_nhwc(vid2id[v])
        stacks.append(fr[_uniform_centers(len(fr), t)])
    frames = np.stack(stacks)

    enc0 = tokenizer([captions[0]], max_length=cfg.get("max_txt_len", 20))
    ids0 = jnp.asarray(enc0["input_ids"])
    txt_params = jax.jit(txt_tower.init)(jax.random.key(0), ids0,
                                         jnp.ones_like(ids0))
    vis_params = jax.jit(vis_tower.init)(jax.random.key(1),
                                         jnp.asarray(frames[:1, 0]))
    weights = cfg.model.get("pretrained_weights")
    if weights:
        from sasvqa_tpu.models.presets import _load_torch_state_dict
        sd = _load_torch_state_dict(weights)
        tcfg, vcfg = txt_tower.config, vis_tower.config
        merged_t, _ = merge_pretrained(
            txt_params["params"], convert_clip_text(sd, tcfg.num_layers))
        merged_v, _ = merge_pretrained(
            vis_params["params"], convert_clip_vision(sd, vcfg.num_layers))
        txt_params = {"params": merged_t}
        vis_params = {"params": merged_v}

    metrics = evaluate_retrieval(
        txt_tower, vis_tower, txt_params, vis_params, tokenizer, captions,
        frames, cfg, batch_size=cfg.get("val_batch_size", 64))
    print(metrics)
    return metrics


if __name__ == "__main__":
    main()
