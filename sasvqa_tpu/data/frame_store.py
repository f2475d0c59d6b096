"""HDF5 frame store + vidmapping.

File-compatible with the reference store: one dataset
``"sampled_frames"`` of shape (num_videos, K, 3*H*W) float32 holding
flattened CHW frames, plus ``vidmapping.json`` {video_id: row}
(reference: src/preprocessing/extract_features.py:77-97,
src/datasets/dataset_base.py:104, dataset_video_qa.py:53-56).

The reader converts CHW -> HWC once on the host because the TPU compute
path is NHWC end-to-end.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import h5py
import numpy as np

from sasvqa_tpu.utils.basic import load_json, save_json

DATASET_NAME = "sampled_frames"


class FrameStoreWriter:
    def __init__(self, h5_path: str, num_videos: int, num_frames: int,
                 img_hw: int):
        os.makedirs(os.path.dirname(os.path.abspath(h5_path)), exist_ok=True)
        self._f = h5py.File(h5_path, "w")
        self._ds = self._f.create_dataset(
            DATASET_NAME, (num_videos, num_frames, 3 * img_hw * img_hw),
            dtype="float32")
        self.img_hw = img_hw
        self.num_frames = num_frames

    def write(self, row: int, frames_chw: np.ndarray) -> None:
        """frames_chw: (K, 3, H, W) or (K, 3*H*W) float32."""
        self._ds[row] = frames_chw.reshape(self.num_frames, -1)

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class FrameStoreReader:
    """Lazy per-row reads; safe to use from multiple loader threads via
    one handle per thread (h5py is not thread-safe on a shared handle).

    Fork-safe: a handle opened in the parent is never reused in a forked
    worker (HDF5 handles shared across fork corrupt reads) — the reader
    tracks the opening pid and reopens per process."""

    def __init__(self, h5_path: str):
        self._path = h5_path
        self._f: Optional[h5py.File] = None
        self._pid: Optional[int] = None

    def _ds(self):
        if self._f is None or self._pid != os.getpid():
            self._f = h5py.File(self._path, "r")
            self._pid = os.getpid()
        return self._f[DATASET_NAME]

    def __getstate__(self):
        # picklable for spawn-started pool workers: the handle never
        # crosses a process boundary, workers reopen lazily via _ds()
        return {"_path": self._path, "_f": None, "_pid": None}

    def __setstate__(self, state):
        self.__dict__.update(state)

    @property
    def shape(self):
        return self._ds().shape

    def read_chw(self, row: int) -> np.ndarray:
        """-> (K, 3, H, W) float32."""
        flat = np.asarray(self._ds()[row])
        k, d = flat.shape
        hw = int(round((d // 3) ** 0.5))
        return flat.reshape(k, 3, hw, hw)

    def read_nhwc(self, row: int) -> np.ndarray:
        """-> (K, H, W, 3) float32, TPU-native layout."""
        return np.ascontiguousarray(
            self.read_chw(row).transpose(0, 2, 3, 1))

    def read_rows_nhwc(self, rows: Sequence[int]) -> np.ndarray:
        """-> (B, K, H, W, 3); h5py wants sorted unique fancy indices, so
        gather manually."""
        return np.stack([self.read_nhwc(r) for r in rows])

    def read_frames_nhwc(self, row: int, frame_inds) -> np.ndarray:
        """Selected frames of one video -> (T, H, W, 3) float32.

        Reads ONLY the requested frames from the file (each stored
        frame is a contiguous 3*H*W slice, so this is a strided partial
        read, not a full-row read).  At the reference's K=32/224²
        layout a full row is ~19 MB while a 'single'-policy collate
        uses one frame — measured 0.06x -> >1x host margin on the
        msvd_base3 row (bench_suite hostdisk).  ``frame_inds`` may be
        unsorted and contain duplicates (MIF importance order, repeat
        padding); h5py fancy selection wants increasing unique indices,
        so read unique-sorted and re-gather."""
        inds = np.asarray(frame_inds, dtype=np.int64).reshape(-1)
        ds = self._ds()
        k, d = ds.shape[1], ds.shape[2]
        u, inv = np.unique(inds, return_inverse=True)
        flat = np.asarray(ds[row] if len(u) == k else ds[row, u])
        hw = int(round((d // 3) ** 0.5))
        frames = np.ascontiguousarray(
            flat.reshape(len(u), 3, hw, hw).transpose(0, 2, 3, 1))
        return frames[inv]

    def close(self):
        if self._f is not None:
            self._f.close()
            self._f = None


class LazyVideoFrames:
    """A frame-store row that gathers lazily.

    Indexes like the eager ``(K, H, W, 3)`` array collators gather
    from (``vid[inds] -> (T, H, W, 3)`` float32), but only the selected
    frames are ever read from the HDF5 file — the sampling policies
    pick indices from metadata (sampled_inds / rng / stride math), so
    reading all K stored frames first, as the reference's dataset does
    (dataset_base.py:104), pays up to K/nframe x the IO.
    """

    __slots__ = ("store", "row", "shape")

    ndim = 4

    def __init__(self, store: FrameStoreReader, row: int):
        _, k, d = store.shape
        hw = int(round((d // 3) ** 0.5))
        self.store = store
        self.row = int(row)
        self.shape = (k, hw, hw, 3)

    def __getitem__(self, frame_inds) -> np.ndarray:
        return self.store.read_frames_nhwc(self.row, frame_inds)


def save_vidmapping(video_ids: List[str], path: str) -> Dict[str, int]:
    mapping = {vid: i for i, vid in enumerate(video_ids)}
    save_json(mapping, path)
    return mapping


def load_vidmapping(path: str) -> Dict[str, int]:
    return load_json(path)
