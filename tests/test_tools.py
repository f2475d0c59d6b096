"""Offline tools: stage A extraction + stage B MIF on a synthetic dataset."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from sasvqa_tpu.data.frame_store import FrameStoreReader
from sasvqa_tpu.utils.basic import load_json, save_json


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    """dataset_root/msvd_qa/{video/*.avi, annotations/qa_*.json}"""
    root = tmp_path_factory.mktemp("dsroot")
    droot = root / "msvd_qa"
    vdir = droot / "video"
    adir = droot / "annotations"
    vdir.mkdir(parents=True)
    adir.mkdir(parents=True)

    w = h = 40
    names = []
    for v in range(3):
        name = f"clip{v}.avi"
        names.append(name)
        writer = cv2.VideoWriter(str(vdir / name),
                                 cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                                 (w, h))
        rng = np.random.default_rng(v)
        # three visually distinct scenes per video
        for scene in range(3):
            base = rng.integers(0, 255, size=3)
            for _ in range(10):
                frame = np.full((h, w, 3), base, np.uint8)
                frame += rng.integers(0, 10, size=(h, w, 3)).astype(np.uint8)
                writer.write(frame)
        writer.release()

    for split in ("train", "val", "test"):
        annos = []
        for v, name in enumerate(names):
            annos.append(dict(question=f"what is the dog doing in video {v}?",
                              answer="running", video=name,
                              answer_type="what"))
        save_json(annos, str(adir / f"qa_{split}.json"))
    return str(root)


def test_extract_uniform(dataset_root):
    from sasvqa_tpu.tools.extract_frames import main
    main(["--dataset", "msvd_qa", "--dataset_root", dataset_root,
          "--sampling_strategy", "uni", "--K", "4", "--img_size", "32",
          "--h5_fname", "proc_uni"])
    out = os.path.join(dataset_root, "msvd_qa", "proc_uni")
    reader = FrameStoreReader(os.path.join(out, "msvd_qa_video_feat.h5"))
    assert reader.shape == (3, 4, 3 * 32 * 32)
    frames = reader.read_nhwc(0)
    assert np.isfinite(frames).all()
    mapping = load_json(os.path.join(out, "vidmapping.json"))
    assert len(mapping) == 3


def test_extract_mdf(dataset_root):
    from sasvqa_tpu.tools.extract_frames import main
    counters = main(["--dataset", "msvd_qa", "--dataset_root", dataset_root,
                     "--sampling_strategy", "repr", "--K", "3", "--W", "4",
                     "--img_size", "32", "--h5_fname", "proc_repr"])
    out = os.path.join(dataset_root, "msvd_qa", "proc_repr")
    reader = FrameStoreReader(os.path.join(out, "msvd_qa_video_feat.h5"))
    assert reader.shape == (3, 3, 3 * 32 * 32)
    assert counters["Zeros"] == 0


def test_git6_indices():
    from sasvqa_tpu.tools.extract_frames import git6_indices
    rng = np.random.default_rng(0)
    inds = git6_indices(60, 6, 4, rng)
    assert len(inds) == 6
    assert (np.diff(inds) >= 0).all()
    assert inds.max() < 60


@pytest.mark.slow
def test_mif_pipeline(dataset_root):
    """gen_cap then gen_inds with tiny models over the extracted store."""
    from sasvqa_tpu.tools.gen_sample import main
    # stage A store: build our own rather than depending on
    # test_extract_uniform having run first (ordering-independent)
    if not os.path.exists(os.path.join(dataset_root, "msvd_qa",
                                       "proc_uni")):
        from sasvqa_tpu.tools.extract_frames import main as extract_main
        extract_main(["--dataset", "msvd_qa", "--dataset_root",
                      dataset_root, "--sampling_strategy", "uni",
                      "--K", "4", "--img_size", "32",
                      "--h5_fname", "proc_uni"])
    # stage 1: captions (tiny git, test vocab)
    main(["--task", "gen_cap", "--dataset", "msvd_qa",
          "--dataset_root", dataset_root, "--h5_path", "proc_uni",
          "--vlm_model", "tiny-git", "--max_length", "8"])
    cap_file = os.path.join(dataset_root, "msvd_qa", "annotations",
                            "frame_captions.json")
    caps = load_json(cap_file)
    assert len(caps) == 3
    assert all(len(v) == 4 for v in caps.values())

    # stage 2: question-aware scoring -> sampled_inds
    main(["--task", "gen_inds", "--dataset", "msvd_qa",
          "--dataset_root", dataset_root, "--h5_path", "proc_uni",
          "--K", "4", "--tiny"])
    winds = load_json(os.path.join(dataset_root, "msvd_qa", "annotations",
                                   "qa_winds_train.json"))
    assert len(winds) == 3
    for s in winds:
        assert len(s["sampled_inds"]) == 4
        assert all(0 <= i < 4 for i in s["sampled_inds"])


def test_mif_topk_downsample_semantics():
    from sasvqa_tpu.sampling.mif import topk_downsampled
    scores = np.array([0.1, 0.9, 0.3, 0.8, 0.05, 0.7])
    # no downsample: importance order
    assert topk_downsampled(scores, 3) == [1, 3, 5]
    # ds_rate=2: score positions 0,2,4 -> topk of [0.1,0.3,0.05] * 2
    assert topk_downsampled(scores, 2, ds_rate=2) == [2, 0]


def test_preprocess_frames_matches_hf_processor():
    """Stage-A preprocessing == a locally constructed CLIPImageProcessor
    (shortest-edge bicubic + center crop + rescale + normalize) on
    NON-SQUARE inputs — the reference pushes native-resolution frames
    through AutoProcessor (prefetch_loader.py:57-67); r3 verdict item 2.
    """
    from transformers import CLIPImageProcessor
    from sasvqa_tpu.tools.extract_frames import preprocess_frames

    s = 32
    proc = CLIPImageProcessor(size={"shortest_edge": s},
                              crop_size={"height": s, "width": s})
    rng = np.random.default_rng(0)
    for h, w in [(48, 64), (64, 48), (37, 53), (33, 97), (s, s)]:
        frames = rng.integers(0, 256, size=(3, h, w, 3), dtype=np.uint8)
        ours = preprocess_frames(frames, s)            # (N, S, S, 3)
        theirs = proc(images=list(frames),
                      return_tensors="np")["pixel_values"]  # (N, 3, S, S)
        np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), theirs,
                                   atol=1e-5,
                                   err_msg=f"input {h}x{w}")


def test_hf_resize_dims_matches_hf():
    from transformers.image_processing_utils import (
        get_size_dict)
    from transformers.image_transforms import (
        get_resize_output_image_size)
    from sasvqa_tpu.tools.extract_frames import _hf_resize_dims
    for h, w in [(48, 64), (64, 48), (37, 53), (224, 224), (9, 1000),
                 (99, 100), (100, 99)]:
        img = np.zeros((h, w, 3), np.uint8)
        want = get_resize_output_image_size(img, size=17,
                                            default_to_square=False)
        assert _hf_resize_dims(h, w, 17) == tuple(want), (h, w)
