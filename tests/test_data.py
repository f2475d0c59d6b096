"""Data layer: annotations, grouping, frame store, collators, tokenizers."""

import numpy as np
import pytest

from sasvqa_tpu.data.annotations import (build_common_answer_dict,
                                         evaluate_qa, group_datalist,
                                         load_datalist, mk_input_group)
from sasvqa_tpu.data.dataset import (ClassifierCollator, GITCollator,
                                     VideoQADataset)
from sasvqa_tpu.data.frame_store import FrameStoreReader, load_vidmapping
from sasvqa_tpu.data.synthetic import make_synthetic_dataset
from sasvqa_tpu.data.tokenization import make_test_wordpiece


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    return make_synthetic_dataset(str(root), num_videos=4, stored_frames=8,
                                  img_hw=16, questions_per_video=2)


def test_load_msvd_datalist(synth):
    dl = load_datalist("msvd_qa", synth["train"])
    assert len(dl) == 8
    d = dl[0]
    assert set(d) >= {"question", "answer", "video_id", "answer_type",
                      "question_id", "sampled_inds"}
    assert not d["video_id"].endswith(".avi")  # suffix stripped


def test_data_ratio_tgif_only_reference_quirk(synth, tmp_path):
    """--data_ratio subsets ONLY the tgif-qa (jsonl) branch, exactly as
    the reference does (run_video_qa.py:98-101 lives in its else branch;
    msvd/msrvtt loaders never consult cfg.data_ratio)."""
    import random
    from sasvqa_tpu.data.synthetic import make_synthetic_frameqa_dataset

    paths = make_synthetic_frameqa_dataset(str(tmp_path), num_videos=4)
    full = load_datalist("frameqa", paths["train"])
    half = load_datalist("frameqa", paths["train"], data_ratio=0.5,
                         rng=random.Random(0))
    assert len(half) == len(full) // 2
    # question_ids are re-assigned post-subset (reference qid counter)
    assert [d["question_id"] for d in half] == list(range(len(half)))
    # subset comes FROM the full set (compare by content, not qid)
    keys = {(d["question"], d["video_id"], str(d["answer"])) for d in full}
    assert all((d["question"], d["video_id"], str(d["answer"])) in keys
               for d in half)

    # msvd: ratio accepted but IGNORED (parity pin)
    msvd_full = load_datalist("msvd_qa", synth["train"])
    msvd_half = load_datalist("msvd_qa", synth["train"], data_ratio=0.5)
    assert len(msvd_half) == len(msvd_full)


def test_answer_dict_topk(synth):
    ans2label = build_common_answer_dict([synth["train"]], k=3)
    assert len(ans2label) == 3
    assert sorted(ans2label.values()) == [0, 1, 2]


def test_group_and_chunk(synth):
    dl = load_datalist("msvd_qa", synth["train"])
    groups = group_datalist(dl, max_n_example_per_group=2, is_train=True)
    for vid, exs in groups:
        assert 1 <= len(exs) <= 2
        assert all(e["video_id"] == vid for e in exs)
    # eval: force 1 per group
    groups_eval = group_datalist(dl, max_n_example_per_group=2,
                                 is_train=False)
    assert all(len(exs) == 1 for _, exs in groups_eval)


def test_stale_vidmapping_substitutes_in_train(synth):
    """A vidmapping row beyond the store raises h5py IndexError — train
    must substitute (like KeyError/OSError), eval must fail fast with
    the clear message (r3 review finding)."""
    from sasvqa_tpu.data.annotations import load_datalist as _ld
    vid2id = load_vidmapping(synth["vidmapping"])
    first_vid = _ld("msvd_qa", synth["train"])[0]["video_id"]
    stale = dict(vid2id)
    stale[first_vid] = 5000  # way past the 4-row store
    ds = _make_dataset(synth, vid2id=stale, is_train=True)
    g = ds.get_group(0)      # substituted, not crashed
    assert g["n_examples"] >= 1
    ds_eval = _make_dataset(synth, vid2id=stale, is_train=False)
    with pytest.raises(RuntimeError, match="eval never substitutes"):
        ds_eval.get_group(0)


def test_mif_policy_missing_sampled_inds_clear_error(synth):
    """question-caption without precomputed sampled_inds must raise a
    pointed error at the collator, not a cryptic failure deep in index
    math (r3 review finding)."""
    from sasvqa_tpu.data.tokenization import make_test_wordpiece
    ds = _make_dataset(synth, with_sampled_inds=False)
    coll = ClassifierCollator(make_test_wordpiece(), max_txt_len=12,
                              nframe=2, samp_policy="question-caption")
    with pytest.raises(ValueError, match="sampled_inds"):
        coll([ds.get_group(0)], rng=np.random.default_rng(0))


def test_frame_store_roundtrip(synth):
    reader = FrameStoreReader(synth["h5"])
    assert reader.shape == (4, 8, 3 * 16 * 16)
    frames = reader.read_nhwc(0)
    assert frames.shape == (8, 16, 16, 3)
    chw = reader.read_chw(0)
    np.testing.assert_allclose(frames, chw.transpose(0, 2, 3, 1))


def test_frame_store_partial_reads_match_eager(synth):
    """read_frames_nhwc reads only the selected frames; unsorted and
    duplicate indices (MIF importance order, repeat padding) must
    gather exactly like fancy-indexing the eager row."""
    reader = FrameStoreReader(synth["h5"])
    eager = reader.read_nhwc(1)
    for inds in ([3], [7, 0, 4], [2, 2, 5, 2], list(range(8)),
                 [6, 1, 6, 1]):
        np.testing.assert_array_equal(
            reader.read_frames_nhwc(1, np.asarray(inds)), eager[inds])


def test_lazy_frames_collate_matches_eager(synth):
    """lazy_frames=True (default) must produce bitwise-identical batches
    to an eager dataset under every sampling policy — only the IO
    changes (policy-selected frames instead of all K,
    dataset_base.py:104)."""
    from sasvqa_tpu.data.frame_store import LazyVideoFrames
    tok = make_test_wordpiece()
    lazy = _make_dataset(synth)
    eager = _make_dataset(synth, lazy_frames=False)
    g = lazy.get_group(0)
    assert isinstance(g["vid"], LazyVideoFrames)
    assert g["vid"].shape == (8, 16, 16, 3)
    for policy, nframe in (("uniform", 2), ("random", 3), ("single", 1),
                           ("question-caption", 2), ("importance", 2)):
        col = ClassifierCollator(tok, max_txt_len=12, nframe=nframe,
                                 samp_policy=policy)
        bl = col([lazy.get_group(i) for i in range(3)],
                 rng=np.random.default_rng(7))
        be = col([eager.get_group(i) for i in range(3)],
                 rng=np.random.default_rng(7))
        for k in bl:
            if isinstance(bl[k], np.ndarray):
                np.testing.assert_array_equal(bl[k], be[k], err_msg=k)


def test_frame_store_reader_picklable_with_open_handle(synth):
    """Spawn-started CollatorPool workers receive the dataset by pickle;
    the reader must survive pickling even after its handle is open."""
    import pickle
    reader = FrameStoreReader(synth["h5"])
    before = reader.read_nhwc(1)          # opens the handle
    clone = pickle.loads(pickle.dumps(reader))
    np.testing.assert_array_equal(clone.read_nhwc(1), before)


def _make_dataset(synth, is_train=True, vid2id=None,
                  with_sampled_inds=True, lazy_frames=True):
    dl = load_datalist("msvd_qa", synth["train"])
    if not with_sampled_inds:
        for d in dl:
            d.pop("sampled_inds", None)
    groups = group_datalist(dl, 1, is_train=is_train)
    ans2label = build_common_answer_dict([synth["train"]], 1000)
    if vid2id is None:
        vid2id = load_vidmapping(synth["vidmapping"])
    return VideoQADataset("msvd_qa", groups, FrameStoreReader(synth["h5"]),
                          vid2id, ans2label, is_train=is_train,
                          lazy_frames=lazy_frames)


def test_classifier_collator_shapes(synth):
    ds = _make_dataset(synth)
    tok = make_test_wordpiece()
    col = ClassifierCollator(tok, max_txt_len=12, nframe=2,
                             samp_policy="random")
    rng = np.random.default_rng(0)
    items = [ds.get_group(i) for i in range(3)]
    batch = col(items, rng=rng)
    assert batch["visual_inputs"].shape == (3, 2, 16, 16, 3)
    assert batch["text_input_ids"].shape == (3, 12)
    assert batch["labels"].shape == (3,)
    assert len(batch["question_ids"]) == 3


def test_git_collator_train_labels(synth):
    ds = _make_dataset(synth)
    tok = make_test_wordpiece()
    col = GITCollator(tok, max_txt_len=12, max_seq_len=20, nframe=2,
                      samp_policy="question-caption", add_ans=True)
    rng = np.random.default_rng(0)
    batch = col([ds.get_group(0)], rng=rng)
    ids, labels = batch["text_input_ids"][0], batch["labels"][0]
    # question prefix masked to -100, answer+SEP supervised
    assert labels[0] == -100  # [CLS]
    sep_pos = np.where(ids == tok.sep_token_id)[0]
    assert len(sep_pos) == 1
    assert labels[sep_pos[0]] == tok.sep_token_id
    # reference quirk: padding positions stay supervised as pad id
    assert labels[-1] == tok.pad_token_id


def test_git_collator_truncation_counted(synth, caplog):
    """Over-long [CLS] q + ans + [SEP] sequences are clipped to the
    max_seq_len bucket but COUNTED and warned — never silent answer-
    supervision loss (VERDICT r2 weak #7; the reference's dynamic
    padding never truncated the answer off)."""
    import logging
    ds = _make_dataset(synth)
    tok = make_test_wordpiece()
    col = GITCollator(tok, max_txt_len=12, max_seq_len=3, nframe=2,
                      samp_policy="uniform", add_ans=True)
    with caplog.at_level(logging.WARNING):
        batch = col([ds.get_group(0)], rng=np.random.default_rng(0))
    assert col.n_truncated >= 1
    assert col.n_answer_lost >= 1          # 3-token bucket: [CLS] q q
    assert any("truncated" in r.message for r in caplog.records)
    assert batch["text_input_ids"].shape[1] == 3

    # a roomy bucket never counts
    col2 = GITCollator(tok, max_txt_len=12, max_seq_len=64, nframe=2,
                       samp_policy="uniform", add_ans=True)
    col2([ds.get_group(0)], rng=np.random.default_rng(0))
    assert col2.n_truncated == 0 and col2.n_answer_lost == 0


def test_git_collator_eval_prompts(synth):
    ds = _make_dataset(synth, is_train=False)
    tok = make_test_wordpiece()
    col = GITCollator(tok, max_txt_len=12, nframe=2, samp_policy="uniform",
                      add_ans=False)
    batch = col([ds.get_group(0)], rng=np.random.default_rng(0))
    ids = batch["text_input_ids"][0]
    plen = batch["prompt_len"][0]
    assert ids[0] == tok.cls_token_id
    assert (ids[plen:] == tok.pad_token_id).all()
    assert tok.sep_token_id not in ids[:plen]  # no trailing SEP on prompt


def test_wordpiece_roundtrip():
    tok = make_test_wordpiece()
    enc = tok(["what is the dog doing?"], max_length=12)
    text = tok.decode(enc["input_ids"][0])
    assert "what is the dog doing" in text
    # pair encoding for MIF scoring
    enc2 = tok(["what color"], max_length=16,
               text_pairs=["a red ball"])
    row = enc2["input_ids"][0]
    assert (row == tok.sep_token_id).sum() == 2


def test_evaluate_qa_per_type():
    qid2data = {
        0: {"answer": "red", "answer_type": "what"},
        1: {"answer": "dog", "answer_type": "who"},
        2: {"answer": "blue", "answer_type": "what"},
    }
    ans2label = {"red": 0, "dog": 1, "blue": 2}
    results = [
        {"question_id": 0, "answer": 0},   # correct
        {"question_id": 1, "answer": 0},   # wrong
        {"question_id": 2, "answer": 2},   # correct
    ]
    m = evaluate_qa(results, qid2data, ans2label, "msvd_qa")
    assert abs(m["overall_acc"] - 2 / 3) < 1e-9
    assert m["what_acc"] == 1.0
    assert m["who_acc"] == 0.0
    assert "ratios" in m


def test_evaluate_qa_ignores_oov_gt():
    qid2data = {0: {"answer": "zebra", "answer_type": "what"},
                1: {"answer": "red", "answer_type": "what"}}
    ans2label = {"red": 0}
    results = [{"question_id": 0, "answer": -1},
               {"question_id": 1, "answer": 0}]
    m = evaluate_qa(results, qid2data, ans2label, "msvd_qa")
    # denominator counts only in-vocab gts (reference :141-144)
    assert m["overall_acc"] == 1.0


def test_pixel_staging_dtype(synth):
    """--stage_pixels_bf16: collators emit bf16 pixel batches (half the
    host->device bytes) when activations are bf16; f32 otherwise."""
    import ml_dtypes
    from sasvqa_tpu.core.config import ConfigDict
    from sasvqa_tpu.data.dataset import make_collator, pixel_dtype_for
    ds = _make_dataset(synth)
    tok = make_test_wordpiece()
    cfg = ConfigDict(max_txt_len=12, task="msvd_qa", nframe=2,
                     samp_policy="uniform", bf16=True, stage_pixels_bf16=1)
    assert pixel_dtype_for(cfg) == "bf16"
    col = make_collator("clip", tok, cfg)
    batch = col([ds.get_group(0)], rng=np.random.default_rng(0))
    assert batch["visual_inputs"].dtype == ml_dtypes.bfloat16

    cfg2 = ConfigDict(max_txt_len=12, task="msvd_qa", nframe=2,
                      samp_policy="uniform", bf16=False)
    assert pixel_dtype_for(cfg2) == "f32"
    col2 = make_collator("git", tok, cfg2)
    batch2 = col2([ds.get_group(0)], rng=np.random.default_rng(0))
    assert batch2["visual_inputs"].dtype == np.float32
