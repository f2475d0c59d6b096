"""Offline stage B: MIF caption generation + question-aware frame scoring.

Rebuild of src/preprocessing/gen_sample.py (CLI parity):

    python -m sasvqa_tpu.tools.gen_sample --task gen_cap  --dataset msvd_qa ...
    python -m sasvqa_tpu.tools.gen_sample --task gen_inds --dataset msvd_qa ...

- gen_cap (:27-45): every stored frame of every video -> GIT caption
  ('[CLS] ' prompt, greedy max_length=30) -> frame_captions.json.
  TPU-first: all K frames of a video decode as ONE batch through the
  jitted image-KV-cached greedy decoder (the reference loops rows and
  runs HF generate per row).
- gen_inds (:50-94): per QA pair, score (question, caption_k) with a
  BERT sequence classifier, logits[:, 0], downsample ::ds_rate, top-K
  importance-ordered indices * ds_rate -> qa_winds_{split}.json.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List

import numpy as np

from sasvqa_tpu.core.logging import LOGGER
from sasvqa_tpu.data.frame_store import FrameStoreReader
from sasvqa_tpu.data.tokenization import (WordPieceTokenizer,
                                          make_test_wordpiece)
from sasvqa_tpu.sampling.mif import generate_inds_for_split
from sasvqa_tpu.tools.extract_frames import _shard_suffix, parse_shard
from sasvqa_tpu.utils.basic import load_json, save_json


def _tokenizer(args) -> WordPieceTokenizer:
    if args.tokenizer_dir:
        return WordPieceTokenizer.from_vocab_file(
            os.path.join(args.tokenizer_dir, "vocab.txt"))
    LOGGER.warning("no --tokenizer_dir; using built-in test vocab")
    return make_test_wordpiece()


def run_gen_cap(args) -> Dict[str, List[str]]:
    """Caption every stored frame; write frame_captions.json."""
    import jax
    import jax.numpy as jnp
    from sasvqa_tpu.models.git import GITForCausalLM, greedy_generate
    from sasvqa_tpu.models.presets import (_git_config,
                                           load_pretrained_params)

    tok = _tokenizer(args)
    cfg = _git_config(args.vlm_model.lower())
    model = GITForCausalLM(cfg, dtype=jnp.bfloat16)

    store = FrameStoreReader(args.h5_file)
    num_videos, k, _ = store.shape
    sample = store.read_nhwc(0)
    hw = sample.shape[1]

    # --shard i/N: caption only this stride slice of the h5 rows (each
    # shard can run on its own host/chip; merge with --task merge)
    shard = parse_shard(args.shard)
    all_rows = (list(range(num_videos)) if shard is None
                else list(range(shard[0], num_videos, shard[1])))

    # batch several videos' frames through one decode call (batch_rows*K
    # frames per jit invocation; the reference generates row by row)
    rows_per = max(int(args.batch_rows), 1)
    bsz = rows_per * k
    ids0 = jnp.full((bsz, 1), tok.cls_token_id, jnp.int32)
    plen = jnp.ones((bsz,), jnp.int32)
    params = jax.jit(model.init)(jax.random.key(args.seed), ids0,
                                 jnp.ones_like(ids0),
                                 jnp.zeros((bsz, 1, hw, hw, 3)))
    if args.weights:
        params = load_pretrained_params("git", model, params, args.weights)

    @jax.jit
    def gen(params, frames):
        return greedy_generate(model, params, ids0, plen, frames,
                               max_text_len=args.max_length,
                               max_new_tokens=args.max_length - 1)

    captions: Dict[str, List[str]] = {}
    for start in range(0, len(all_rows), rows_per):
        rows = all_rows[start:start + rows_per]
        frames = np.concatenate(
            [store.read_nhwc(r) for r in rows])         # (n*K, H, W, 3)
        if frames.shape[0] < bsz:                       # pad final chunk
            pad = np.zeros((bsz - frames.shape[0],) + frames.shape[1:],
                           frames.dtype)
            frames = np.concatenate([frames, pad])
        out = np.asarray(gen(params, jnp.asarray(frames[:, None])))
        for j, r in enumerate(rows):
            captions[str(r)] = [tok.decode(out[j * k + i])
                                for i in range(k)]
        done = start + len(rows)
        if done >= 50 and done % 50 < rows_per:
            LOGGER.info(f"captioned {done}/{len(all_rows)}")

    out_file = os.path.join(
        args.anno_dir, f"frame_captions{_shard_suffix(shard)}.json")
    save_json(captions, out_file)
    LOGGER.info(f"wrote {out_file}")
    return captions


def run_gen_inds(args) -> None:
    """Score question/caption pairs; write qa_winds_{split}.json."""
    import jax
    import jax.numpy as jnp
    from sasvqa_tpu.models.bert import (BERTConfig,
                                        BERTForSequenceClassification,
                                        convert_bert_classifier)

    if "bert" not in args.sim_model.lower():
        # the rebuilt scorer is a fixed BERT-base architecture; reject
        # a non-BERT --sim_model loudly instead of silently loading
        # --weights into the wrong shape (r3 review finding)
        raise ValueError(
            f"--sim_model {args.sim_model!r}: only BERT-base-class "
            "scorers are supported (the reference default "
            "iarfmoose/bert-base-cased-qa-evaluator is one)")
    tok = _tokenizer(args)
    vocab_size = max(tok.vocab.values()) + 1
    cfg = BERTConfig(vocab_size=vocab_size) if not args.tiny else \
        BERTConfig(vocab_size=vocab_size, hidden_size=32, num_layers=2,
                   num_heads=4, intermediate_size=64,
                   max_position_embeddings=128)
    model = BERTForSequenceClassification(cfg)
    dummy = jnp.zeros((1, 8), jnp.int32)
    params = jax.jit(model.init)(jax.random.key(args.seed), dummy,
                                 jnp.ones((1, 8), jnp.int32))
    if args.weights:
        from sasvqa_tpu.models.convert import merge_pretrained
        from sasvqa_tpu.models.presets import _load_torch_state_dict
        sd = _load_torch_state_dict(args.weights)
        conv = convert_bert_classifier(sd, cfg.num_layers)
        merged, report = merge_pretrained(params["params"], conv)
        params = {"params": merged}
        LOGGER.info(f"scorer: loaded {len(report['loaded'])} tensors")

    cap_file = os.path.join(args.anno_dir, "frame_captions.json")
    all_captions = load_json(cap_file)

    if args.dataset == "msvd_qa":
        vid_name = "video"          # '<id>.avi'
    elif args.dataset == "msrvtt_qa":
        vid_name = "video_id"       # int <id>, stored file 'video<id>.*'
    else:
        raise ValueError("supported datasets: msvd_qa, msrvtt_qa")

    # captions are keyed by h5 row (run_gen_cap); translate annotation
    # video ids through vidmapping (video-id -> row).  The mapping is
    # REQUIRED: silently falling back to the raw annotation id either
    # KeyErrors mid-split or — for numeric video ids — collides with an
    # unrelated h5 row and scores every QA pair against the wrong
    # video's captions (r3 review finding)
    if not (args.vid_mapping and os.path.exists(args.vid_mapping)):
        raise FileNotFoundError(
            f"vidmapping not found at {args.vid_mapping!r} — run "
            "tools/extract_frames (stage A) first; gen_inds keys "
            "captions by h5 row through it")
    vid2row = load_json(args.vid_mapping)

    def caption_key(sample):
        raw = sample[vid_name]
        vid_id = (str(raw).split(".")[0] if args.dataset == "msvd_qa"
                  else f"video{raw}")
        if vid_id not in vid2row:
            raise KeyError(
                f"video id {vid_id!r} missing from vidmapping "
                f"({args.vid_mapping}) — the annotation references a "
                "video stage A never extracted")
        return str(vid2row[vid_id])

    # params go through the jit boundary as an ARGUMENT: closure capture
    # would bake the ~110M-param BERT tree into the HLO as constants and
    # blow the remote-compile request limit on tunneled runtimes (same
    # hazard documented at extract_frames.MDFEncoder)
    _scorer = jax.jit(lambda p, ids, mask, types:
                      model.apply(p, ids, mask, types))
    score = lambda ids, mask, types: _scorer(params, ids, mask, types)
    # --shard i/N: score only this stride slice of each split's QA
    # samples; --task merge re-interleaves the per-shard outputs into
    # the original sample order
    shard = parse_shard(args.shard)
    for split in ("train", "val", "test"):
        read_file = os.path.join(args.anno_dir, f"qa_{split}.json")
        if not os.path.exists(read_file):
            continue
        samples = load_json(read_file)
        if shard is not None:
            samples = samples[shard[0]::shard[1]]
        new_ds = generate_inds_for_split(
            score, tok, samples, all_captions, caption_key,
            k=args.K, ds_rate=args.ds_rate,
            max_length=args.score_max_length)
        out_file = os.path.join(
            args.anno_dir, f"qa_winds_{split}{_shard_suffix(shard)}.json")
        save_json(new_ds, out_file)
        LOGGER.info(f"wrote {out_file} ({len(new_ds)} samples)")


def run_merge(args) -> None:
    """Merge ``--shard`` outputs back into the single-run files.

    frame_captions shards are a dict union re-ordered by h5 row;
    qa_winds shards re-interleave by stride (shard i held samples
    [i::N]) so the merged list matches a 1-shot run's sample order
    exactly (tests/test_shard_tools.py)."""
    from sasvqa_tpu.tools.extract_frames import collect_shard_set

    def shard_set(prefix: str):
        return collect_shard_set(args.anno_dir, prefix, suffix=".json")

    merged_any = False
    caps = shard_set("frame_captions")
    if caps:
        union: Dict[str, List[str]] = {}
        for p in caps:
            union.update(load_json(p))
        out = {str(r): union[str(r)] for r in sorted(map(int, union))}
        out_file = os.path.join(args.anno_dir, "frame_captions.json")
        save_json(out, out_file)
        LOGGER.info(f"merged {len(caps)} caption shards -> {out_file} "
                    f"({len(out)} videos)")
        merged_any = True
    for split in ("train", "val", "test"):
        shards = shard_set(f"qa_winds_{split}")
        if not shards:
            continue
        lists = [load_json(p) for p in shards]
        n = len(lists)
        total = sum(len(l) for l in lists)
        merged = [lists[j % n][j // n] for j in range(total)]
        out_file = os.path.join(args.anno_dir, f"qa_winds_{split}.json")
        save_json(merged, out_file)
        LOGGER.info(f"merged {n} winds shards -> {out_file} "
                    f"({total} samples)")
        merged_any = True
    if not merged_any:
        raise FileNotFoundError(
            f"no .shard*of*.json outputs under {args.anno_dir} — run "
            "gen_cap/gen_inds with --shard i/N first")


def build_argparser():
    p = argparse.ArgumentParser(description="stage B MIF caption/score")
    p.add_argument("--dataset", default="msvd_qa",
                   choices=["msvd_qa", "msrvtt_qa"])
    p.add_argument("--dataset_root", default="./dataset")
    p.add_argument("--anno_path", default="annotations")
    p.add_argument("--h5_path", default="processed")
    p.add_argument("--task", choices=["gen_cap", "gen_inds", "merge"],
                   default="gen_cap")
    p.add_argument("--vlm_model", default="microsoft/git-base-coco")
    p.add_argument("--sim_model",
                   default="iarfmoose/bert-base-cased-qa-evaluator",
                   help="stage-2 scorer name (reference gen_sample.py:"
                        "113). NOTE: the rebuilt scorer architecture is "
                        "fixed to BERT-base dims — this flag only "
                        "documents which checkpoint --weights should "
                        "point at; a non-BERT-base name is rejected")
    p.add_argument("--weights", default=None,
                   help="local HF checkpoint for the captioner/scorer")
    p.add_argument("--tokenizer_dir", default=None)
    p.add_argument("--K", type=int, default=32)
    p.add_argument("--ds_rate", type=int, default=1)
    p.add_argument("--max_length", type=int, default=30,
                   help="gen_cap caption budget (reference generate "
                        "max_length=30, gen_sample.py:23)")
    p.add_argument("--score_max_length", type=int, default=64,
                   help="gen_inds question+caption tokenization budget "
                        "(the stage-2 scorer's own length, NOT the "
                        "caption budget — 30 would truncate most pairs)")
    p.add_argument("--batch_rows", type=int, default=4,
                   help="videos captioned per decode call (frames batch "
                        "as batch_rows*K)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model dims (tests/synthetic)")
    p.add_argument("--seed", type=int, default=666)
    p.add_argument("--shard", default=None,
                   help="'i/N': process only the i-th stride slice "
                        "(gen_cap: h5 rows; gen_inds: QA samples per "
                        "split); 'auto' = this jax process's index/"
                        "count. Merge afterwards with --task merge.")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    droot = os.path.join(args.dataset_root, args.dataset)
    args.anno_dir = os.path.join(droot, args.anno_path)
    h5_dir = os.path.join(droot, args.h5_path)
    args.h5_file = os.path.join(h5_dir, f"{args.dataset}_video_feat.h5")
    args.vid_mapping = os.path.join(h5_dir, "vidmapping.json")
    if args.task == "gen_cap":
        if "git" not in args.vlm_model.lower():
            raise ValueError("captioning model must be a GIT variant")
        run_gen_cap(args)
    elif args.task == "merge":
        run_merge(args)
    else:
        run_gen_inds(args)


if __name__ == "__main__":
    main()
