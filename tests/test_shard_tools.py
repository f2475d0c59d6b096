"""Sharded offline extraction/MIF: N stride shards merge to the 1-shot
output (VERDICT r3 item 4 — the TPU-native replacement for the
reference's 4-GPU nn.DataParallel extraction,
/root/reference/src/preprocessing/extract_features.py:45-48: whole
videos / QA samples shard across hosts, each shard runs independently,
a merge step reassembles the single-run files)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from sasvqa_tpu.data.frame_store import FrameStoreReader
from sasvqa_tpu.utils.basic import load_json, save_json


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    """dataset_root/msvd_qa/{video/*.avi, annotations/qa_*.json} — 5
    NON-SQUARE videos so 2-shard stride splits are uneven (3 + 2)."""
    root = tmp_path_factory.mktemp("shardds")
    droot = root / "msvd_qa"
    vdir = droot / "video"
    adir = droot / "annotations"
    vdir.mkdir(parents=True)
    adir.mkdir(parents=True)

    w, h = 48, 36
    names = []
    for v in range(5):
        name = f"clip{v}.avi"
        names.append(name)
        writer = cv2.VideoWriter(str(vdir / name),
                                 cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                                 (w, h))
        rng = np.random.default_rng(v)
        for _ in range(12):
            writer.write(rng.integers(0, 256, (h, w, 3),
                                      dtype=np.uint8))
        writer.release()

    for split in ("train", "val"):
        annos = [dict(question=f"what is in video {v} ({split})?",
                      answer="cat", video=name, answer_type="what")
                 for v, name in enumerate(names)]
        save_json(annos, str(adir / f"qa_{split}.json"))
    return str(root)


def _store(dataset_root, fname):
    out = os.path.join(dataset_root, "msvd_qa", fname)
    reader = FrameStoreReader(os.path.join(out, "msvd_qa_video_feat.h5"))
    data = np.stack([reader.read_chw(r) for r in range(reader.shape[0])])
    reader.close()
    mapping = load_json(os.path.join(out, "vidmapping.json"))
    return data, mapping


@pytest.mark.parametrize("strategy", ["uni", "git6"])
def test_extract_two_shards_merge_equals_one_shot(dataset_root, strategy):
    """2-shard extraction + merge == 1-shot run: identical frame
    content, row assignment, and vidmapping (git6 exercises the
    per-(seed, global-row) rng that makes the draw shard-invariant)."""
    from sasvqa_tpu.tools.extract_frames import main
    base = ["--dataset", "msvd_qa", "--dataset_root", dataset_root,
            "--sampling_strategy", strategy, "--K", "3",
            "--img_size", "32"]
    main(base + ["--h5_fname", f"oneshot_{strategy}"])
    for i in (0, 1):
        main(base + ["--h5_fname", f"sharded_{strategy}",
                     "--shard", f"{i}/2"])
    main(base + ["--h5_fname", f"sharded_{strategy}", "--merge_shards"])

    data_1, map_1 = _store(dataset_root, f"oneshot_{strategy}")
    data_m, map_m = _store(dataset_root, f"sharded_{strategy}")
    assert map_m == map_1
    np.testing.assert_array_equal(data_m, data_1)
    # shard vidmappings carry GLOBAL rows and partition the full list
    out = os.path.join(dataset_root, "msvd_qa", f"sharded_{strategy}")
    s0 = load_json(os.path.join(out, "vidmapping.shard0of2.json"))
    s1 = load_json(os.path.join(out, "vidmapping.shard1of2.json"))
    assert len(s0) == 3 and len(s1) == 2
    assert sorted(list(s0.values()) + list(s1.values())) == list(range(5))


def test_shard_merge_with_duplicate_video_ids(tmp_path):
    """Two videos whose names truncate to the same id ('dup.avi' and
    'dup.v2.avi' both map as 'dup' — the reference's first-dot stem,
    extract_features.py:28) must still merge row-exactly: the {vid: row}
    vidmapping dedups them, so merge places h5 rows via the explicit
    vidrows sidecar, and the merged mapping keeps the LAST row like a
    1-shot dict build."""
    from sasvqa_tpu.tools.extract_frames import main
    droot = tmp_path / "msvd_qa"
    vdir = droot / "video"
    adir = droot / "annotations"
    vdir.mkdir(parents=True)
    adir.mkdir(parents=True)
    w, h = 48, 36
    for name in ("clip0.avi", "clip1.avi", "dup.avi", "dup.v2.avi"):
        writer = cv2.VideoWriter(str(vdir / name),
                                 cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                                 (w, h))
        rng = np.random.default_rng(abs(hash(name)) % 1000)
        for _ in range(8):
            writer.write(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
        writer.release()
    save_json([dict(question=f"what in {name}?", answer="cat",
                    video=name, answer_type="what")
               for name in ("clip0.avi", "clip1.avi", "dup.avi",
                            "dup.v2.avi")],
              str(adir / "qa_train.json"))

    base = ["--dataset", "msvd_qa", "--dataset_root", str(tmp_path),
            "--sampling_strategy", "uni", "--K", "2", "--img_size", "32"]
    main(base + ["--h5_fname", "oneshot"])
    for i in (0, 1):
        main(base + ["--h5_fname", "sharded", "--shard", f"{i}/2"])
    main(base + ["--h5_fname", "sharded", "--merge_shards"])

    data_1, map_1 = _store(str(tmp_path), "oneshot")
    data_m, map_m = _store(str(tmp_path), "sharded")
    assert len(data_1) == 4 and len(map_1) == 3  # mapping dedups 'dup'
    assert map_m == map_1
    np.testing.assert_array_equal(data_m, data_1)


def test_merge_refuses_incomplete_shard_set(dataset_root):
    from sasvqa_tpu.tools.extract_frames import main
    base = ["--dataset", "msvd_qa", "--dataset_root", dataset_root,
            "--sampling_strategy", "uni", "--K", "3", "--img_size", "32",
            "--h5_fname", "partial"]
    main(base + ["--shard", "0/3"])
    with pytest.raises(FileNotFoundError, match="missing"):
        main(base + ["--merge_shards"])


def test_parse_shard():
    from sasvqa_tpu.tools.extract_frames import parse_shard
    assert parse_shard(None) is None
    assert parse_shard("0/4") == (0, 4)
    assert parse_shard("3/4") == (3, 4)
    with pytest.raises(ValueError):
        parse_shard("4/4")
    # 'auto' reads this process's jax identity (single process here)
    assert parse_shard("auto") == (0, 1)


@pytest.mark.slow
def test_mif_two_shards_merge_equals_one_shot(dataset_root):
    """gen_cap/gen_inds sharded + merged == 1-shot outputs (tiny
    models; captions per h5 row, winds per QA sample)."""
    from sasvqa_tpu.tools.extract_frames import main as extract_main
    from sasvqa_tpu.tools.gen_sample import main
    extract_main(["--dataset", "msvd_qa", "--dataset_root", dataset_root,
                  "--sampling_strategy", "uni", "--K", "2",
                  "--img_size", "32", "--h5_fname", "proc_mif"])
    adir = os.path.join(dataset_root, "msvd_qa", "annotations")
    base = ["--dataset", "msvd_qa", "--dataset_root", dataset_root,
            "--h5_path", "proc_mif"]

    # 1-shot reference outputs
    main(base + ["--task", "gen_cap", "--vlm_model", "tiny-git",
                 "--max_length", "6"])
    main(base + ["--task", "gen_inds", "--K", "2", "--tiny"])
    caps_1 = load_json(os.path.join(adir, "frame_captions.json"))
    winds_1 = {s: load_json(os.path.join(adir, f"qa_winds_{s}.json"))
               for s in ("train", "val")}

    # sharded: captions first (gen_inds reads the MERGED captions)
    for i in (0, 1):
        main(base + ["--task", "gen_cap", "--vlm_model", "tiny-git",
                     "--max_length", "6", "--shard", f"{i}/2"])
    os.remove(os.path.join(adir, "frame_captions.json"))
    main(base + ["--task", "merge"])
    caps_m = load_json(os.path.join(adir, "frame_captions.json"))
    assert caps_m == caps_1

    for i in (0, 1):
        main(base + ["--task", "gen_inds", "--K", "2", "--tiny",
                     "--shard", f"{i}/2"])
    for s in ("train", "val"):
        os.remove(os.path.join(adir, f"qa_winds_{s}.json"))
    main(base + ["--task", "merge"])
    for s in ("train", "val"):
        winds_m = load_json(os.path.join(adir, f"qa_winds_{s}.json"))
        assert winds_m == winds_1[s]
