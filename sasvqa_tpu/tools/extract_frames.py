"""Offline stage A: video decode -> frame sampling -> HDF5 frame store.

Rebuild of src/preprocessing/extract_features.py (CLI parity):

    python -m sasvqa_tpu.tools.extract_frames \
        --dataset msvd_qa --dataset_root ./dataset \
        --sampling_strategy repr --K 16 --W 8

Pipeline redesign (reference: a 2-thread queue zoo feeding per-video
GPU encodes, prefetch_loader.py:50-115 + extract_features.py:41-111):

- decode through the native C++ shim (data/video_decode.py), one
  background decode thread with a bounded queue for backpressure;
- MDF ('repr') feature encoding batches frames through the jitted
  vision tower with **length bucketing** (pad N to the next bucket so
  XLA compiles once per bucket, not per video);
- the MDF banded-similarity + suppression-top-K selection runs on
  device (sampling/mdf.py), replacing the host heap;
- 'uni' / 'git6' strategies are pure index math on the host.

Outputs match the reference store format exactly: ``sampled_frames``
(num_videos, K, 3*H*W) float32 CHW-flattened + ``vidmapping.json``
(extract_features.py:25-30,77-97).
"""

from __future__ import annotations

import argparse
import os
import queue
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from sasvqa_tpu.core.logging import LOGGER
from sasvqa_tpu.data.frame_store import FrameStoreWriter
from sasvqa_tpu.data.video_decode import VideoDecoder
from sasvqa_tpu.utils.basic import load_json, save_json

# CLIP-style normalization constants used by the HF processors the
# reference runs frames through (AutoProcessor for git-base/clip).
# Single-sourced in core/pixels.py (the u8 staging wire format must
# invert exactly this affine).
from sasvqa_tpu.core.pixels import CLIP_MEAN, CLIP_STD  # noqa: E402

BUCKETS = (64, 128, 256, 512, 1024, 2048)


def _hf_resize_dims(h: int, w: int, size: int) -> Tuple[int, int]:
    """Shortest-edge target dims, HF get_resize_output_image_size
    semantics (default_to_square=False): short edge -> size, long edge
    scaled by the same ratio and truncated toward zero."""
    short, long = (h, w) if h <= w else (w, h)
    new_short, new_long = size, int(size * long / short)
    return (new_short, new_long) if h <= w else (new_long, new_short)


def preprocess_frames(frames_u8: np.ndarray, img_size: int) -> np.ndarray:
    """(N, H, W, 3) uint8 RGB -> (N, S, S, 3) float32 normalized.

    HF image-processor-exact: shortest-edge bicubic resize to img_size,
    center crop img_size², rescale 1/255, CLIP mean/std normalize —
    the CLIPImageProcessor pipeline the reference pushes decoded frames
    through (prefetch_loader.py:57-67; processor defaults size=
    {'shortest_edge': 224}, crop 224², resample=BICUBIC).  The resize
    goes through PIL like the HF processor does (transformers converts
    numpy inputs to PIL for resampling), so outputs are bit-identical —
    tested against a locally constructed CLIPImageProcessor on
    non-square inputs (tests/test_tools.py)."""
    return normalize_frames(geometry_frames(frames_u8, img_size))


def geometry_frames(frames_u8: np.ndarray, img_size: int) -> np.ndarray:
    """(N, H, W, 3) uint8 -> (N, S, S, 3) uint8: the resize+crop stage.

    Split out so the decode worker can run the (expensive, PIL) geometry
    in the background thread and queue compact uint8 frames; the HF
    processor's resize stage also round-trips through uint8 (PIL), so
    the split is bit-exact."""
    from PIL import Image
    n, h, w = frames_u8.shape[:3]
    if (h, w) == (img_size, img_size):
        # already target-square (e.g. synthetic fixtures): resize would
        # be the identity bicubic and the crop a no-op — skip both
        return frames_u8
    nh, nw = _hf_resize_dims(h, w, img_size)
    top = (nh - img_size) // 2
    left = (nw - img_size) // 2
    out = np.empty((n, img_size, img_size, 3), np.uint8)
    for i in range(n):
        f = np.asarray(Image.fromarray(frames_u8[i]).resize(
            (nw, nh), Image.Resampling.BICUBIC))
        out[i] = f[top:top + img_size, left:left + img_size]
    return out


def normalize_frames(frames_u8: np.ndarray) -> np.ndarray:
    """uint8 -> float32, rescale 1/255 + CLIP mean/std normalize."""
    out = frames_u8.astype(np.float32) / 255.0
    return (out - CLIP_MEAN) / CLIP_STD


def git6_indices(num_frames: int, clip_len: int, frame_sample_rate: int,
                 rng: np.random.Generator) -> np.ndarray:
    """GIT-VideoQA style sampling (extract_features.py:32-39): random
    end index, linspace of clip_len frames.

    Videos shorter than clip_len*rate: the reference's np.random.randint
    raises outright; here indices clamp to the real frame range
    (deliberate fix — short videos sample with repeats instead of
    aborting the whole extraction run)."""
    converted_len = int(clip_len * frame_sample_rate)
    end_idx = int(rng.integers(converted_len, max(num_frames, converted_len + 1)))
    start_idx = end_idx - converted_len
    idx = np.linspace(start_idx, end_idx, num=clip_len)
    idx = np.clip(idx, start_idx, end_idx - 1).astype(np.int64)
    return np.clip(idx, 0, num_frames - 1)


def bucket_for(n: int) -> int:
    for b in BUCKETS:
        if n <= b:
            return b
    return BUCKETS[-1]


class MDFEncoder:
    """Jitted frozen vision encoder + on-device MDF selection, compiled
    once per (bucket, K, W) shape."""

    def __init__(self, k: int, window: int, interval: int = 20,
                 weights_path: Optional[str] = None, img_size: int = 224):
        import jax
        import jax.numpy as jnp
        from sasvqa_tpu.models.clip import CLIPVisionEncoder
        from sasvqa_tpu.models.git import GIT_BASE

        self.k, self.window, self.interval = k, window, interval
        vision_cfg = GIT_BASE.vision
        if img_size != vision_cfg.image_size:
            import dataclasses
            vision_cfg = dataclasses.replace(vision_cfg, image_size=img_size)
        tower = CLIPVisionEncoder(vision_cfg, dtype=jnp.bfloat16,
                                  post_ln_all_tokens=True,
                                  with_projection=False)
        rng = jax.random.key(0)
        dummy = jnp.zeros((1, img_size, img_size, 3))
        params = jax.jit(tower.init)(rng, dummy)
        if weights_path:
            from sasvqa_tpu.models.convert import (convert_clip_vision,
                                                   merge_pretrained)
            from sasvqa_tpu.models.presets import _load_torch_state_dict
            sd = _load_torch_state_dict(weights_path)
            prefix = ("git.image_encoder.vision_model"
                      if any(k.startswith("git.") for k in sd)
                      else "vision_model")
            conv = convert_clip_vision(sd, vision_cfg.num_layers,
                                       prefix=prefix, projection_key="")
            merged, report = merge_pretrained(params["params"], conv)
            params = {"params": merged}
            LOGGER.info(f"MDF encoder: loaded {len(report['loaded'])} "
                        f"tensors from {weights_path}")
        self._params = params
        self._tower = tower
        self._select = {}  # (bucket, W) -> jitted fn
        self._jax = jax

    def _fn_for(self, bucket: int, w: int):
        key = (bucket, w)
        if key not in self._select:
            import jax.numpy as jnp
            from sasvqa_tpu.sampling.mdf import mdf_select_padded
            tower, k, interval = self._tower, self.k, self.interval

            # params are an argument, NOT a closure capture: captured
            # arrays are baked into the HLO as constants (an 86M-param
            # tower blows the remote-compile request limit on tunneled
            # runtimes, and re-embeds the weights per shape bucket)
            @self._jax.jit
            def fn(params, frames_padded, n_valid):
                _, pooled, _ = tower.apply(params, frames_padded)
                feats = pooled.astype(jnp.float32)
                return mdf_select_padded(feats, n_valid, k, w, interval)

            self._select[key] = fn
        return self._select[key]

    def __call__(self, frames: np.ndarray) -> Tuple[np.ndarray, bool]:
        """frames (N, S, S, 3) float32 -> ((K,) selected indices, flag).

        Pads N up to a length bucket (one XLA compile per bucket x W);
        the adaptive window W = N//interval resolves on the true N
        before padding, so selection matches the reference exactly.
        """
        n = frames.shape[0]
        if n == 0:
            return np.zeros((self.k,), np.int64), True
        if n > BUCKETS[-1]:
            # decode_video's default max_frames (4096) exceeds the
            # largest compile bucket; without this clamp padded[:n]
            # raised a broadcast ValueError and killed the run (r3
            # review finding).  MDF over the first 2048 decoded frames
            # still sees ~70s of video at intv=1 — log, don't crash.
            LOGGER.warning(
                f"MDF: clamping {n} decoded frames to the largest "
                f"compile bucket ({BUCKETS[-1]}); increase --intv to "
                "cover longer videos at full span")
            frames = frames[:BUCKETS[-1]]
            n = frames.shape[0]
        w = max(n // self.interval, 1) if self.window == -1 else self.window
        b = bucket_for(n)
        padded = np.zeros((b,) + frames.shape[1:], frames.dtype)
        padded[:n] = frames
        inds, exhausted = self._fn_for(b, w)(self._params, padded, n)
        return np.asarray(inds), bool(exhausted)


def load_video_paths(dataset: str, dataset_root: str,
                     anno_path: str = "annotations") -> List[str]:
    """Scan annotation splits for unique video ids -> paths
    (reference: preprocessing/datautils/msvd_qa.py:10-22,
    msrvtt_qa.py:11-23)."""
    droot = os.path.join(dataset_root, dataset)
    video_dir = os.path.join(droot, "video")
    seen, paths = set(), []
    for split in ("train", "val", "test"):
        anno = os.path.join(droot, anno_path, f"qa_{split}.json")
        if not os.path.exists(anno):
            continue
        for qa in load_json(anno):
            name = qa.get("video") or f"video{qa.get('video_id')}.mp4"
            if name not in seen:
                seen.add(name)
                paths.append(os.path.join(video_dir, name))
    return paths


def parse_shard(spec: Optional[str]) -> Optional[Tuple[int, int]]:
    """'i/N' -> (i, N); 'auto' -> (jax.process_index(), process_count()).

    'auto' is the pod form: each host of a jax.distributed job claims
    its stride slice without any external launcher bookkeeping (the
    TPU-native equivalent of the reference's 4-GPU nn.DataParallel
    extraction, extract_features.py:45-48 — sharding whole videos
    across hosts/chips instead of splitting one model's batch)."""
    if not spec:
        return None
    if spec == "auto":
        import jax
        return jax.process_index(), jax.process_count()
    i, n = spec.split("/")
    i, n = int(i), int(n)
    if not 0 <= i < n:
        raise ValueError(f"--shard {spec!r}: need 0 <= i < N")
    return i, n


def _shard_suffix(shard: Optional[Tuple[int, int]]) -> str:
    return f".shard{shard[0]}of{shard[1]}" if shard else ""


def collect_shard_set(dirname: str, prefix: str,
                      suffix: str = "") -> Optional[List[str]]:
    """Discover a complete ``{prefix}.shard{i}of{N}{suffix}`` set.

    Returns the N paths ordered by shard index, or None when no shard
    files match; raises FileNotFoundError on an incomplete or
    mixed-N set.  Shared by the extract-frames h5 merge and the
    gen_sample caption/winds merges — one validation implementation."""
    import glob
    import re
    spec = re.compile(r"\.shard(\d+)of(\d+)" + re.escape(suffix) + "$")
    found = {}
    for p in glob.glob(os.path.join(dirname,
                                    f"{prefix}.shard*of*{suffix}")):
        m = spec.search(p)
        if m:
            found[int(m.group(1))] = (p, int(m.group(2)))
    if not found:
        return None
    n = next(iter(found.values()))[1]
    missing = sorted(set(range(n)) - set(found))
    if missing or any(total != n for _, total in found.values()):
        raise FileNotFoundError(
            f"incomplete shard set for {prefix} under {dirname}: have "
            f"{sorted(found)}, expected 0..{n - 1} of {n} "
            f"(missing {missing})")
    return [found[i][0] for i in range(n)]


def extract(video_paths: List[str], out_dir: str, args,
            shard: Optional[Tuple[int, int]] = None,
            global_rows: Optional[List[int]] = None) -> Dict[str, int]:
    """Main extraction loop: decode (background thread) -> sample -> h5.

    ``shard``/``global_rows``: this invocation handles only its stride
    slice of the full shuffled video list; outputs get a
    ``.shard{i}of{N}`` suffix and the vidmapping records each video's
    GLOBAL row so merge_extracted_shards can reassemble a store
    identical to a 1-shot run (tests/test_shard_tools.py)."""
    os.makedirs(out_dir, exist_ok=True)
    sfx = _shard_suffix(shard)
    h5_out = os.path.join(out_dir,
                          f"{args.dataset}_video_feat.h5{sfx}")
    map_out = os.path.join(out_dir, f"vidmapping{sfx}.json"
                           if shard else "vidmapping.json")
    # reference-exact id derivation (extract_features.py:28:
    # path.split('/')[-1].split('.')[0]) — NOTE this truncates at the
    # FIRST dot, so 'clip.v2.mp4' maps as 'clip'; kept because the
    # annotation side strips ids the same way (run_video_qa.py:69)
    video_ids = [os.path.basename(p).split(".")[0] for p in video_paths]
    if global_rows is None:
        global_rows = list(range(len(video_paths)))
    save_json({vid: row for vid, row in zip(video_ids, global_rows)},
              map_out)
    if shard:
        # explicit per-h5-row global rows: the {vid: row} mapping above
        # DEDUPS ids that truncate to the same stem ('clip.mp4' and
        # 'clip.v2.mp4' both map as 'clip'), so its values can't be used
        # to place shard h5 rows — one dup would shift every later row
        save_json(list(global_rows),
                  os.path.join(out_dir, f"vidrows{sfx}.json"))

    mdf = None
    if args.sampling_strategy == "repr":
        mdf = MDFEncoder(args.K, args.W, weights_path=args.vision_weights,
                         img_size=args.img_size)

    debug_counter = {"Failure": 0, "Zeros": 0}
    q: "queue.Queue" = queue.Queue(maxsize=4)

    def decode_worker():
        # decode at NATIVE resolution in bounded chunks, then HF-exact
        # shortest-edge resize + center crop per chunk (the reference
        # pushes native-res cv2 frames through AutoProcessor,
        # prefetch_loader.py:57-67 — an out_size=(S,S) decode would
        # squash the aspect ratio and change every stored frame)
        for i, path in enumerate(video_paths):
            try:
                with VideoDecoder(path) as dec:
                    chunks = [geometry_frames(c, args.img_size)
                              for c in dec.iter_frames(interval=args.intv)]
                frames = (np.concatenate(chunks) if chunks else
                          np.zeros((0, args.img_size, args.img_size, 3),
                                   np.uint8))
            except Exception as e:
                LOGGER.warning(f"decode failed for {path}: {e}")
                frames = np.zeros((0, args.img_size, args.img_size, 3),
                                  np.uint8)
            q.put((i, frames))
        q.put(None)

    t = threading.Thread(target=decode_worker, daemon=True)
    t.start()

    with FrameStoreWriter(h5_out, len(video_paths), args.K,
                          args.img_size) as writer:
        while True:
            item = q.get()
            if item is None:
                break
            i, frames_u8 = item  # already resized+cropped to (S, S)
            frames = normalize_frames(frames_u8) \
                if len(frames_u8) else np.zeros(
                    (0, args.img_size, args.img_size, 3), np.float32)
            n = frames.shape[0]
            if n == 0:
                debug_counter["Zeros"] += 1
                sel = np.zeros((args.K, args.img_size, args.img_size, 3),
                               np.float32)
            elif args.sampling_strategy == "repr":
                inds, exhausted = mdf(frames)
                if exhausted:
                    debug_counter["Failure"] += 1
                sel = frames[inds]
            elif args.sampling_strategy == "uni":
                if n < args.K:  # repeat-pad short videos then sample
                    reps = int(np.ceil(args.K / n))
                    frames = np.repeat(frames, reps, axis=0)
                    n = frames.shape[0]
                inds = _uniform_centers(n, args.K)
                sel = frames[inds]
            elif args.sampling_strategy == "git6":
                # per-video seeded rng (NOT one sequential stream): the
                # draw depends only on (seed, global row), so a sharded
                # extraction samples the exact frames a 1-shot run does
                inds = git6_indices(
                    n, args.K, 4,
                    np.random.default_rng((args.seed, global_rows[i])))
                sel = frames[inds]
            else:
                raise ValueError(args.sampling_strategy)
            writer.write(i, sel.transpose(0, 3, 1, 2))
            if (i + 1) % 50 == 0:
                LOGGER.info(f"extracted {i + 1}/{len(video_paths)}")

    LOGGER.info(f"Total Failure:{debug_counter['Failure']} "
                f"Zeros:{debug_counter['Zeros']}")
    return debug_counter


def merge_extracted_shards(out_dir: str, args) -> Dict[str, int]:
    """Reassemble per-shard stores into the single-run layout.

    Each shard's ``vidrows`` sidecar lists the GLOBAL row of every h5
    row in order, so the merge needs no knowledge of the stride rule —
    and stays correct when two videos truncate to the same id (the
    {vid: row} vidmapping dedups those, so its values can't place h5
    rows).  The result — both the HDF5 frame content and the merged
    vidmapping.json (duplicate ids resolve to their LAST row, matching
    a 1-shot run's dict build order) — is identical to a 1-shot
    extraction over the same list (asserted by
    tests/test_shard_tools.py)."""
    import h5py
    from sasvqa_tpu.data.frame_store import DATASET_NAME

    shard_h5s = collect_shard_set(out_dir, f"{args.dataset}_video_feat.h5")
    if shard_h5s is None:
        raise FileNotFoundError(
            f"no shard stores under {out_dir} — run extract with "
            "--shard i/N first")
    n = len(shard_h5s)

    mappings = [load_json(os.path.join(
        out_dir, f"vidmapping.shard{i}of{n}.json")) for i in range(n)]
    row_lists = [load_json(os.path.join(
        out_dir, f"vidrows.shard{i}of{n}.json")) for i in range(n)]
    total_rows = sum(len(r) for r in row_lists)
    seen_rows = [row for rows in row_lists for row in rows]
    assert len(set(seen_rows)) == total_rows, (
        "overlapping global rows across shards — shards must partition "
        "one video list")
    # duplicate ids ACROSS shards resolve like a 1-shot dict build:
    # the occurrence at the higher global row (later list position) wins
    rows_by_id: Dict[str, int] = {}
    for m in mappings:
        for vid, row in m.items():
            rows_by_id[vid] = max(int(row), rows_by_id.get(vid, -1))

    h5_out = os.path.join(out_dir, f"{args.dataset}_video_feat.h5")
    with h5py.File(shard_h5s[0], "r") as f0:
        _, k, d = f0[DATASET_NAME].shape
    hw = int(round((d // 3) ** 0.5))
    with FrameStoreWriter(h5_out, total_rows, k, hw) as writer:
        for i in range(n):
            with h5py.File(shard_h5s[i], "r") as f:
                ds = f[DATASET_NAME]
                for local, grow in enumerate(row_lists[i]):
                    writer.write(int(grow), np.asarray(ds[local]))
    save_json(rows_by_id, os.path.join(out_dir, "vidmapping.json"))
    LOGGER.info(f"merged {n} shards -> {h5_out} ({total_rows} videos)")
    return {"shards": n, "videos": total_rows}


def _uniform_centers(n: int, k: int) -> np.ndarray:
    """K frames at interval centers (utils.py:96-109 semantics)."""
    intv = n / k
    idx = [int(intv // 2 + i * intv) for i in range(k)]
    return np.clip(np.asarray(idx), 0, n - 1)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="stage A frame extraction")
    p.add_argument("--dataset", default="msvd_qa",
                   choices=["msvd_qa", "msrvtt_qa", "svqa"])
    p.add_argument("--dataset_root", default="./dataset")
    p.add_argument("--anno_path", default="annotations")
    p.add_argument("--img_size", type=int, default=224)
    p.add_argument("--intv", type=int, default=1,
                   help="decode keeps every intv-th frame")
    p.add_argument("--sampling_strategy", default="uni",
                   choices=["uni", "repr", "git6"])
    p.add_argument("--K", type=int, default=16)
    p.add_argument("--W", type=int, default=8,
                   help="MDF suppression window; -1 = adaptive N//20")
    p.add_argument("--h5_fname", default="processed")
    p.add_argument("--vision_weights", default=None,
                   help="local HF checkpoint for the MDF vision encoder")
    p.add_argument("--seed", type=int, default=666)
    p.add_argument("--shard", default=None,
                   help="'i/N': extract only the i-th stride slice of "
                        "the video list (outputs suffixed .shard{i}of"
                        "{N}); 'auto' = this jax process's index/count. "
                        "Run --merge_shards afterwards.")
    p.add_argument("--merge_shards", action="store_true",
                   help="merge .shard*of* stores in the output dir into "
                        "the final h5 + vidmapping.json")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    out_dir = os.path.join(args.dataset_root, args.dataset, args.h5_fname)
    if args.merge_shards:
        return merge_extracted_shards(out_dir, args)
    paths = load_video_paths(args.dataset, args.dataset_root,
                             args.anno_path)
    rng = np.random.default_rng(args.seed)
    rng.shuffle(paths)
    shard = parse_shard(args.shard)
    if shard is None:
        return extract(paths, out_dir, args)
    si, sn = shard
    rows = list(range(si, len(paths), sn))
    return extract([paths[r] for r in rows], out_dir, args,
                   shard=shard, global_rows=rows)


if __name__ == "__main__":
    main()
