"""Tokenizer parity vs HF implementations on generated vocab files."""

import json
import os

import numpy as np
import pytest

from sasvqa_tpu.data.tokenization import (CLIPBPETokenizer,
                                          WordPieceTokenizer,
                                          basic_tokenize)

SENTENCES = [
    "What is the man doing?",
    "A dog runs, jumps & plays!!",
    "who is playing the red ball",
    "HELLO World...",
]


@pytest.fixture(scope="module")
def wp_vocab_file(tmp_path_factory):
    words = ("[PAD] [UNK] [CLS] [SEP] [MASK] what is the man doing a dog "
             "runs jumps plays who playing red ball hello world run "
             "##s ##ing ##ning ? ! , . & h e l o w r d").split()
    path = tmp_path_factory.mktemp("tok") / "vocab.txt"
    path.write_text("\n".join(words) + "\n")
    return str(path)


def test_wordpiece_matches_hf_bert(wp_vocab_file):
    from transformers import BertTokenizer
    hf = BertTokenizer(wp_vocab_file, do_lower_case=True)
    ours = WordPieceTokenizer.from_vocab_file(wp_vocab_file)
    for s in SENTENCES:
        assert ours.tokenize(s) == hf.tokenize(s), s
        assert ours.encode(s) == hf.encode(s), s
    # pair encoding (MIF scoring path)
    e_ours = ours.encode(SENTENCES[0], text_pair=SENTENCES[2])
    e_hf = hf.encode(SENTENCES[0], SENTENCES[2])
    assert e_ours == e_hf


def test_wordpiece_decode_roundtrip(wp_vocab_file):
    ours = WordPieceTokenizer.from_vocab_file(wp_vocab_file)
    enc = ours(["what is the man doing?"], max_length=16)
    assert ours.decode(enc["input_ids"][0]) == "what is the man doing ?"


@pytest.fixture(scope="module")
def clip_files(tmp_path_factory):
    """Tiny but real BPE vocab: characters + some merges."""
    chars = list("abcdefghijklmnopqrstuvwxyz?!.,&0123456789")
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
        vocab[c + "</w>"] = len(vocab)
    merges = ["t h", "th e</w>", "i s</w>", "w h", "wh a", "wha t</w>",
              "d o", "do g</w>", "a n", "an d</w>", "m a", "ma n</w>",
              "i n", "in g</w>", "n n", "r u", "ru nn", "runn ing</w>"]
    for m in merges:
        tok = m.replace(" ", "")
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    d = tmp_path_factory.mktemp("cliptok")
    vpath, mpath = d / "vocab.json", d / "merges.txt"
    vpath.write_text(json.dumps(vocab))
    mpath.write_text("#version: 0.2\n" + "\n".join(merges) + "\n")
    return str(vpath), str(mpath)


def test_clip_bpe_matches_hf(clip_files):
    from transformers import CLIPTokenizer
    vpath, mpath = clip_files
    hf = CLIPTokenizer(vpath, mpath)
    ours = CLIPBPETokenizer.from_files(vpath, mpath)
    for s in ["the man is running", "what dog", "a and the", "man?!"]:
        ref = hf.encode(s)
        got = ([ours.bos_token_id] + ours.tokenize_ids(s)
               + [ours.eos_token_id])
        assert got == ref, (s, got, ref)


def test_clip_bpe_padding_and_mask(clip_files):
    ours = CLIPBPETokenizer.from_files(*clip_files)
    out = ours(["the dog", "a"], max_length=8)
    assert out["input_ids"].shape == (2, 8)
    assert out["attention_mask"][0].sum() >= out["attention_mask"][1].sum()
    assert out["input_ids"][0, 0] == ours.bos_token_id


def test_basic_tokenize_strips_accents():
    assert basic_tokenize("Héllo, WORLD") == ["hello", ",", "world"]


def test_wordpiece_pair_without_special_tokens(wp_vocab_file):
    """encode(text, pair, add_special_tokens=False) must concatenate
    both sequences like HF — the early return used to drop the pair
    silently (r3 review finding)."""
    from transformers import BertTokenizer
    hf = BertTokenizer(wp_vocab_file, do_lower_case=True)
    ours = WordPieceTokenizer.from_vocab_file(wp_vocab_file)
    got = ours.encode(SENTENCES[0], text_pair=SENTENCES[2],
                      add_special_tokens=False)
    ref = hf.encode(SENTENCES[0], SENTENCES[2], add_special_tokens=False)
    assert got == ref


def test_clip_bpe_hash_merge_rules_kept(tmp_path):
    """merges.txt lines whose first symbol is the literal '#' character
    are real BPE rules, not comments — only the single '#version'
    header line is skipped (HF CLIPTokenizer semantics; the old
    startswith('#') filter dropped them, r3 review finding)."""
    from transformers import CLIPTokenizer
    chars = list("abc#")
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
        vocab[c + "</w>"] = len(vocab)
    merges = ["# #</w>", "a b"]
    for m in merges:
        tok = m.replace(" ", "")
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    vpath, mpath = tmp_path / "vocab.json", tmp_path / "merges.txt"
    vpath.write_text(json.dumps(vocab))
    mpath.write_text("#version: 0.2\n" + "\n".join(merges) + "\n")

    ours = CLIPBPETokenizer.from_files(str(vpath), str(mpath))
    assert ("#", "#</w>") in ours.bpe_ranks  # the rule survived loading
    hf = CLIPTokenizer(str(vpath), str(mpath))
    for s in ["##", "ab ##", "#"]:
        got = ([ours.bos_token_id] + ours.tokenize_ids(s)
               + [ours.eos_token_id])
        assert got == hf.encode(s), (s, got, hf.encode(s))


def test_clip_bpe_pretokenizer_number_categories():
    """With the `regex` module (a transformers dependency) the
    pre-tokenizer uses HF's exact \\p{L}/\\p{N} pattern: No/Nl number
    characters stand alone instead of gluing into letter runs."""
    pytest.importorskip("regex")
    got = CLIPBPETokenizer._PAT.findall("½cup of tea xii")
    assert got[:2] == ["½", "cup"], got


def test_wordpiece_pair_token_type_ids_match_hf(wp_vocab_file):
    """Pair encodings carry HF's segment ids ([CLS] q [SEP] -> 0,
    caption [SEP] -> 1) — the MIF qa-evaluator's logits depend on the
    segment embeddings (r3 review finding)."""
    from transformers import BertTokenizer
    hf = BertTokenizer(wp_vocab_file, do_lower_case=True)
    ours = WordPieceTokenizer.from_vocab_file(wp_vocab_file)
    for q, c in [(SENTENCES[0], SENTENCES[2]),
                 ("who is playing", "a dog runs and jumps and plays")]:
        for ml in (32, 12, 8):   # incl. truncating budgets
            ref = hf(q, c, max_length=ml, truncation="longest_first")
            got = ours([q], max_length=ml, text_pairs=[c])
            n = len(ref["input_ids"])
            assert got["input_ids"][0, :n].tolist() == ref["input_ids"]
            assert (got["token_type_ids"][0, :n].tolist()
                    == ref["token_type_ids"]), (q, c, ml)
            # padding stays segment 0 (HF pad_token_type_id)
            assert got["token_type_ids"][0, n:].sum() == 0
