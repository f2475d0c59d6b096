"""VideoQADataset + per-family batch collators.

Rebuild of the reference dataset/collators
(src/datasets/dataset_video_qa.py:17-406) with fixed-shape, jit-friendly
outputs:

- text padded to a fixed ``max_txt_len`` bucket (the reference pads
  per-batch, which would recompile XLA per length — SURVEY.md §7.4#6);
- frames re-sampled on the host by sampling/policies.py, producing a
  static (B_videos, T, H, W, C) tensor;
- groups with >1 example keep ONE copy of the video; the models repeat
  the per-frame *embeddings* post-encoder (inferred from the
  text/video batch ratio), replacing the reference's ragged
  ``repeat_counts`` device logic (modeling.py:431-441) without
  re-encoding duplicated frames.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import ml_dtypes

from sasvqa_tpu.data.annotations import IGNORE_INDEX
from sasvqa_tpu.data.frame_store import FrameStoreReader
from sasvqa_tpu.sampling import policies

# Host->device pixel staging dtype.  bf16 halves the staged bytes of
# the dominant batch leaf (flagship: ~77 MB/step f32 -> ~39 MB) with no
# numeric cost when activations compute in bf16 — the model's first
# conv casts its input to bf16 either way.  "u8" halves them AGAIN by
# inverting the store's normalize affine back to the uint8 grid the
# frames came from (core/pixels.py: lossless for stage-A stores,
# <= half-a-u8-step error off-grid); the model wrappers dequantize
# in-jit.  This is the reference's own wire format — uint8 staging +
# on-GPU ImageNorm (src/datasets/dataloader.py:131-139).
PIXEL_DTYPES = {"bf16": ml_dtypes.bfloat16, "f32": np.float32,
                "u8": np.uint8}


class VideoQADataset:
    """Grouped datalist + frame store (dataset_video_qa.py:17-100)."""

    def __init__(self, task_type: str,
                 grouped_datalist: List[Tuple[str, List[Dict[str, Any]]]],
                 frame_store: FrameStoreReader,
                 vid2id: Dict[str, int],
                 ans2label: Dict[str, int],
                 return_label: bool = True,
                 is_train: bool = True,
                 lazy_frames: bool = True):
        self.task_type = task_type
        self.datalist = grouped_datalist
        self.store = frame_store
        self.vid2id = vid2id
        self.ans2label = ans2label
        self.return_label = return_label
        self.is_train = is_train
        # lazy_frames: hand collators a LazyVideoFrames handle so only
        # the policy-selected frames are read from the store (the
        # reference eagerly reads all K, dataset_base.py:104 — up to
        # K/nframe x the IO).  The row is bounds-checked HERE so the
        # substitution/fail-fast semantics below keep their trigger
        # point; an OSError on the deferred read (corrupt row bytes, as
        # opposed to a missing/misaligned store, which shape-checking
        # catches eagerly) surfaces at collate time instead.
        self.lazy_frames = lazy_frames
        self.open_ended = task_type in ("frameqa", "msrvtt_qa", "msvd_qa")
        self.qid2data = {d["question_id"]: d
                         for _, group in grouped_datalist for d in group}

    def __len__(self) -> int:
        return len(self.datalist)

    def get_group(self, index: int, _retries: int = 3) -> Dict[str, Any]:
        """Corrupted/missing-video handling: substitute a random other
        group after logging (reference dataset_video_qa.py:58-81 — its
        retry loop with num_retries=1 effectively raised; here the
        resample actually happens, bounded by ``_retries``)."""
        vid, examples = self.datalist[index]
        try:
            row = self.vid2id[vid]
            if self.lazy_frames:
                from sasvqa_tpu.data.frame_store import LazyVideoFrames
                if not 0 <= int(row) < self.store.shape[0]:
                    raise IndexError(
                        f"vidmapping row {row} outside store "
                        f"{self.store.shape}")
                frames = LazyVideoFrames(self.store, row)
            else:
                frames = self.store.read_nhwc(row)  # (K, H, W, 3)
        except (KeyError, IndexError, OSError) as e:
            # IndexError: h5py's out-of-range row error for a stale
            # vidmapping pointing past the store (r3 review finding)
            # substitution is a TRAIN-only recovery: the eval loop
            # attributes predictions by batch-plan position (multi-host
            # hosts can't see each other's substitutions), so a silent
            # swap would score the substitute's answer against the
            # original question's ground truth.  Eval fails fast instead.
            if _retries <= 0 or not self.is_train:
                raise RuntimeError(
                    f"failed to fetch video {vid!r}"
                    + ("" if self.is_train else
                       " (eval never substitutes — fix the store)")) from e
            from sasvqa_tpu.core.logging import LOGGER
            import random as _random
            LOGGER.warning(f"failed to load video {vid!r} ({e}); "
                           f"substituting a random group")
            return self.get_group(_random.randrange(len(self)),
                                  _retries=_retries - 1)
        exs = [self._single_example(e) for e in examples]
        # GROUP-level sampled_inds = the FIRST example's ranking, exactly
        # as the reference (dataset_video_qa.py:74 pops examples[0]'s) —
        # with max_n_example_per_group > 1 other questions in the group
        # share frame ranks computed for question 0.  MIF configs run
        # group size 1 in practice, where this is exact.
        return dict(vid=frames, examples=exs, n_examples=len(exs),
                    sampled_inds=exs[0].get("sampled_inds"))

    def _single_example(self, data: Dict[str, Any]) -> Dict[str, Any]:
        ex = dict(q_str=data["question"], question_id=data["question_id"],
                  label=data["answer"])
        if data.get("sampled_inds") is not None:
            ex["sampled_inds"] = data["sampled_inds"]
        if self.task_type in ("action", "transition"):
            ex["options_str_list"] = data["options"]
        elif self.open_ended and self.return_label:
            ex["str_label"] = ex["label"]
            ex["label"] = self.ans2label.get(ex["label"], IGNORE_INDEX)
        if not self.return_label:
            ex["label"] = None
        return ex


def _resample_frames(items: List[Dict[str, Any]], policy: str, nframe: int,
                     rng: Optional[np.random.Generator],
                     out_dtype=np.float32) -> np.ndarray:
    """(B_groups stored frames) -> (B_groups, T_out, H, W, C).

    Host-pipeline hot path: selects indices FIRST, then copies only the
    selected frames once, casting into the staging dtype as they land in
    a preallocated output.  (The obvious stack-everything-then-gather-
    then-cast form copies all K stored frames plus two full extra passes
    — measured 2-8x slower per collate on the small-nframe configs,
    which is the difference between feeding a chip and starving it on a
    pod host; bench_suite.py `host` row.)"""
    b = len(items)
    k = items[0]["vid"].shape[0]
    sampled_inds = None
    if policy == "question-caption":
        missing = [i for i, d in enumerate(items)
                   if d.get("sampled_inds") is None]
        if missing:
            raise ValueError(
                "samp_policy='question-caption' (MIF) needs per-question "
                f"'sampled_inds' but {len(missing)} of {len(items)} "
                "groups lack them — run tools/gen_sample (gen_cap + "
                "gen_inds) first, or pick another samp_policy")
        sampled_inds = np.stack(
            [np.asarray(d["sampled_inds"]) for d in items])
    inds = policies.sample_indices(policy, k, nframe, rng=rng,
                                   sampled_inds=sampled_inds, batch_size=b)
    frame_shape = items[0]["vid"].shape[1:]
    out = np.empty((b, inds.shape[1]) + frame_shape, dtype=out_dtype)
    if out_dtype == np.uint8:
        # u8 wire format: invert the store's normalize affine per
        # selected frame (core/pixels.quantize_u8) — a plain cast-assign
        # would truncate floats
        from sasvqa_tpu.core.pixels import quantize_u8
        for i, d in enumerate(items):
            out[i] = quantize_u8(d["vid"][inds[i]])
    else:
        for i, d in enumerate(items):
            # fancy-index gather + dtype cast fused into the assignment
            out[i] = d["vid"][inds[i]]
    return out


def _flatten_examples(items: List[Dict[str, Any]]):
    examples = [e for d in items for e in d["examples"]]
    n_examples = [d["n_examples"] for d in items]
    return examples, n_examples


def _check_uniform_groups(n_examples: Sequence[int]) -> None:
    """Groups must be uniformly sized (chunk_list pads the last chunk,
    annotations.py) so the model can infer the video->example repeat
    factor from shapes and repeat *embeddings* post-encoder instead of
    re-encoding duplicated frames."""
    if len(set(n_examples)) > 1:
        raise ValueError(
            f"non-uniform group sizes {sorted(set(n_examples))}; "
            "mk_input_group with pad_to_divisible produces uniform groups")


class ClassifierCollator:
    """CLIP / BLIP classification batches
    (VideoQACollator dataset_video_qa.py:173-238, BLIP :240-311).

    tokenizer: any data/tokenization.py tokenizer (fixed-length padding).
    """

    def __init__(self, tokenizer, max_txt_len: int = 20,
                 task_type: str = "msvd_qa", n_options: int = 5,
                 nframe: int = 4, samp_policy: str = "random",
                 pixel_dtype: str = "f32"):
        self.tokenizer = tokenizer
        self.max_txt_len = max_txt_len
        self.task_type = task_type
        self.n_options = n_options
        self.nframe = nframe
        self.samp_policy = samp_policy
        self.pixel_dtype = PIXEL_DTYPES[pixel_dtype]

    def __call__(self, items: List[Dict[str, Any]],
                 rng: Optional[np.random.Generator] = None,
                 ) -> Dict[str, Any]:
        visual = _resample_frames(items, self.samp_policy, self.nframe,
                                  rng, out_dtype=self.pixel_dtype)
        examples, n_examples = _flatten_examples(items)
        _check_uniform_groups(n_examples)

        if self.task_type in ("action", "transition"):
            texts = [f"{d['q_str']} {d['options_str_list'][i]}"
                     for d in examples for i in range(self.n_options)]
        else:
            texts = [d["q_str"] for d in examples]
        enc = self.tokenizer(texts, max_length=self.max_txt_len)

        labels = None
        if examples[0]["label"] is not None:
            labels = np.asarray([int(d["label"]) for d in examples],
                                dtype=np.int32)
        return dict(
            visual_inputs=visual,
            text_input_ids=enc["input_ids"],
            text_attention_mask=enc["attention_mask"],
            labels=labels,
            question_ids=[d["question_id"] for d in examples],
            n_examples_list=n_examples,
        )


class GITCollator:
    """GIT generative batches (GITVideoQACollator
    dataset_video_qa.py:313-406).

    Train (add_ans=True): input = [CLS] q + answer + [SEP], labels mask
    the question prefix to -100 (the reference leaves padding positions
    *supervised* — replicated by default, fix behind
    ``mask_pad_labels=True``; see collate_batch :383-392).
    Eval: prompt = [CLS] q (no trailing SEP), right-padded with
    per-example lengths (deliberate fix of the reference's left-pad
    position bug, SURVEY.md §7.4#7).
    """

    def __init__(self, tokenizer, max_txt_len: int = 20,
                 max_seq_len: int = 32, task_type: str = "msvd_qa",
                 nframe: int = 4, samp_policy: str = "random",
                 add_ans: bool = True, mask_pad_labels: bool = False,
                 pixel_dtype: str = "f32"):
        self.tokenizer = tokenizer
        self.max_txt_len = max_txt_len
        self.max_seq_len = max_seq_len
        self.task_type = task_type
        self.nframe = nframe
        self.samp_policy = samp_policy
        self.add_ans = add_ans
        self.mask_pad_labels = mask_pad_labels
        self.pixel_dtype = PIXEL_DTYPES[pixel_dtype]
        # truncation accounting (per-process when pool workers collate):
        # the reference's dynamic padding=True never clipped the answer
        # off; our fixed max_seq_len bucket can — count it and warn so
        # supervision loss is never silent (VERDICT r2 weak #7)
        self.n_truncated = 0
        self.n_answer_lost = 0

    def __call__(self, items: List[Dict[str, Any]],
                 rng: Optional[np.random.Generator] = None,
                 ) -> Dict[str, Any]:
        visual = _resample_frames(items, self.samp_policy, self.nframe,
                                  rng, out_dtype=self.pixel_dtype)
        examples, n_examples = _flatten_examples(items)
        _check_uniform_groups(n_examples)
        tok = self.tokenizer
        b = len(examples)

        if self.add_ans:  # training: [CLS] q ans [SEP]
            l = self.max_seq_len
            ids = np.full((b, l), tok.pad_token_id, dtype=np.int32)
            mask = np.zeros((b, l), dtype=np.int32)
            labels = np.full((b, l), tok.pad_token_id, dtype=np.int32)
            for i, d in enumerate(examples):
                q_ids = [tok.cls_token_id] + tok.encode(
                    d["q_str"], add_special_tokens=False)
                a_ids = tok.encode(str(d["str_label"]),
                                   add_special_tokens=False)
                full = q_ids + a_ids + [tok.sep_token_id]
                seq = full[:l]
                if len(full) > l:
                    self.n_truncated += 1
                    # positions < len(q_ids) are label-masked, so when
                    # the question alone fills the bucket the example
                    # contributes ZERO answer supervision (at
                    # len(q_ids) == l-1 the first answer token still
                    # lands supervised at position l-1)
                    if len(q_ids) >= l:
                        self.n_answer_lost += 1
                    if self.n_truncated in (1, 10, 100) \
                            or self.n_truncated % 1000 == 0:
                        from sasvqa_tpu.core.logging import LOGGER
                        LOGGER.warning(
                            f"GIT collator truncated {self.n_truncated} "
                            f"train sequences to max_seq_len={l} "
                            f"({self.n_answer_lost} lost ALL answer "
                            f"supervision) — raise --max_seq_len")
                ids[i, :len(seq)] = seq
                mask[i, :len(seq)] = 1
                lab = np.array(ids[i])
                # question prefix -> -100 (positions < len(q_ids))
                lab[:min(len(q_ids), l)] = IGNORE_INDEX
                if self.mask_pad_labels:
                    lab[len(seq):] = IGNORE_INDEX
                labels[i] = lab
            return dict(
                visual_inputs=visual,
                text_input_ids=ids, text_attention_mask=mask,
                labels=labels,
                question_ids=[d["question_id"] for d in examples],
                n_examples_list=n_examples,
            )

        # eval: [CLS] q, right-padded + explicit lengths
        l = self.max_txt_len
        ids = np.full((b, l), tok.pad_token_id, dtype=np.int32)
        prompt_len = np.zeros((b,), dtype=np.int32)
        for i, d in enumerate(examples):
            seq = ([tok.cls_token_id]
                   + tok.encode(d["q_str"], add_special_tokens=False))[:l]
            ids[i, :len(seq)] = seq
            prompt_len[i] = len(seq)
        return dict(
            visual_inputs=visual,
            text_input_ids=ids, prompt_len=prompt_len,
            labels=None,
            question_ids=[d["question_id"] for d in examples],
            n_examples_list=n_examples,
        )


def pixel_dtype_for(cfg) -> str:
    """'u8' when --stage_pixels_u8 (opt-in: quarter of f32's staged
    bytes, lossless on stage-A stores — core/pixels.py); else 'bf16'
    when activations compute in bf16 and --stage_pixels_bf16 (default
    on): pixels cross host->device at half the bytes; the model's first
    conv would cast them to bf16 anyway."""
    if cfg.get("stage_pixels_u8", 0):
        return "u8"
    if cfg.get("bf16", True) and cfg.get("stage_pixels_bf16", 1):
        return "bf16"
    return "f32"


def make_collator(family: str, tokenizer, cfg) -> Any:
    """Family dispatch, mirroring run_video_qa.py:159-180."""
    if family in ("clip", "blip"):
        return ClassifierCollator(
            tokenizer, max_txt_len=cfg.max_txt_len, task_type=cfg.task,
            nframe=cfg.nframe, samp_policy=cfg.samp_policy,
            pixel_dtype=pixel_dtype_for(cfg))
    if family == "git":
        return GITCollator(
            tokenizer, max_txt_len=cfg.max_txt_len,
            max_seq_len=cfg.get("max_seq_len", cfg.max_txt_len + 12),
            task_type=cfg.task, nframe=cfg.nframe,
            samp_policy=cfg.samp_policy, add_ans=True,
            pixel_dtype=pixel_dtype_for(cfg))
    raise ValueError(family)
