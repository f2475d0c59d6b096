"""MIF — most-informative-frame sampling (offline stage B).

Rebuild of src/preprocessing/gen_sample.py:

- stage 1 (:20-45): caption every stored frame with a GIT captioner,
  ``[CLS]`` prompt, greedy max_length=30 -> ``frame_captions.json``
  {row_index: [K captions]};
- stage 2 (:50-94): for each QA pair, score (question, caption_k) pairs
  with a BERT sequence classifier, take ``logits[:, 0]``, optionally
  downsample by ``ds_rate``, top-K (importance-ordered, unsorted),
  multiply back by ds_rate -> ``sampled_inds`` written into
  ``qa_winds_{split}.json``.

TPU-first: frames caption in (rows x K) batches through the jitted
cached-decode path; scoring batches all K captions of a question in one
fixed-shape forward.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def topk_downsampled(scores: np.ndarray, k: int, ds_rate: int = 1,
                     ) -> List[int]:
    """scores (K,) -> importance-ordered indices, reference
    gen_sample.py:87-89: ``scores[::ds_rate].topk(K)[1] * ds_rate``."""
    sub = scores[::ds_rate]
    k_eff = min(k, len(sub))
    order = np.argsort(-sub, kind="stable")[:k_eff]
    return [int(i) * ds_rate for i in order]


def caption_frames(generate_fn: Callable[[jax.Array], np.ndarray],
                   frames_iter, decode_fn: Callable[[Sequence[int]], str],
                   ) -> Dict[int, List[str]]:
    """Stage 1 driver.

    generate_fn: (B, 1, H, W, C) frames -> (B, L) generated token ids
    (the '[CLS]'-prompted jitted GIT decode); frames_iter yields
    (row_index, (K, H, W, C)) stored-frame stacks; decode_fn maps token
    ids -> caption text.
    """
    captions: Dict[int, List[str]] = {}
    for row, frames in frames_iter:
        k = frames.shape[0]
        ids = generate_fn(jnp.asarray(frames)[:, None])  # frames as T=1
        captions[row] = [decode_fn(np.asarray(ids[i])) for i in range(k)]
    return captions


def score_question_captions(score_fn: Callable[..., jax.Array],
                            tokenizer, question: str,
                            captions: Sequence[str],
                            max_length: int = 64) -> np.ndarray:
    """Stage 2 scoring for one question: -> (K,) float scores.

    score_fn: jitted BERT classifier apply -> logits (B, num_labels);
    score = logits[:, 0] (gen_sample.py:83-85).
    """
    k = len(captions)
    enc = tokenizer([question] * k, max_length=max_length,
                    text_pairs=list(captions))
    # token_type_ids matter: the reference feeds segment ids to the
    # qa-evaluator (gen_sample.py:80 tokenizes with text_pair, HF
    # returns token_type_ids=1 for the caption segment) and its logits
    # depend on the segment embeddings (r3 review finding)
    logits = score_fn(jnp.asarray(enc["input_ids"]),
                      jnp.asarray(enc["attention_mask"]),
                      jnp.asarray(enc["token_type_ids"]))
    return np.asarray(logits[:, 0])


def generate_inds_for_split(score_fn, tokenizer,
                            qa_list: List[dict],
                            all_captions: Dict[str, List[str]],
                            caption_key_fn: Callable[[dict], str],
                            k: int, ds_rate: int = 1,
                            max_length: int = 64) -> List[dict]:
    """Full stage-2 pass over one split (gen_sample.py:67-94).

    ``caption_key_fn(sample)`` maps a QA sample to its key in
    ``all_captions`` (the tools key captions by h5 row via vidmapping).
    """
    out = []
    for sample in qa_list:
        captions = all_captions[caption_key_fn(sample)]
        scores = score_question_captions(
            score_fn, tokenizer, sample["question"], captions, max_length)
        sample = dict(sample)
        sample["sampled_inds"] = topk_downsampled(scores, k, ds_rate)
        out.append(sample)
    return out
