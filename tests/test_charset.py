"""Tokenizer/decode parity tests (reference tuatara.cpp:25-117, 495-505)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tuatara_spark import charset as cs


def test_charset_length_and_duplicates():
    assert len(cs.CHARSET) == 95
    assert len(cs.ITOS) == 98
    # '\' occurs twice in the charset (C++ unescaping of tuatara.cpp:32-34)
    assert cs.CHARSET.count("\\") == 2
    assert cs.ITOS.count("]") == 2  # slots 0 and 88
    assert cs.ITOS.count("[") == 2  # slots 86 and 96
    assert cs.ITOS.count("P") == 2  # slots 52 and 97
    assert cs.ITOS[0] == "]"
    assert cs.ITOS[96] == "["
    assert cs.ITOS[97] == "P"


def test_quirk_q1_special_ids():
    # stoi forward-built with overwrites (tuatara.cpp:41-47)
    assert cs.EOS_ID == 88
    assert cs.BOS_ID == 96
    assert cs.PAD_ID == 97
    assert cs.ITOS[88] == "]"
    assert cs.ITOS[87] == "\\" and cs.ITOS[69] == "\\"


def _probs_from_ids(ids, L=None, C=cs.NUM_CLASSES):
    ids = np.asarray(ids)
    n, length = ids.shape
    p = np.full((n, length, C), 0.001, dtype=np.float32)
    for r in range(n):
        for j in range(length):
            p[r, j, ids[r, j]] = 0.9
    return p


def test_decode_basic():
    # "Hi0" then true-EOS then padding garbage
    ids = [[cs.char_to_class("H"), cs.char_to_class("i"), cs.char_to_class("0"),
            0, 5, 7]]
    assert cs.decode_probs(_probs_from_ids(ids)) == ["Hi0"]


def test_decode_class88_dropped_midsequence():
    # class 88 (charset ']') is filtered, NOT a terminator
    ids = [[cs.char_to_class("a"), 88, cs.char_to_class("b"), 0, 3, 3]]
    assert cs.decode_probs(_probs_from_ids(ids)) == ["ab"]


def test_decode_class0_truncates():
    ids = [[cs.char_to_class("x"), 0, cs.char_to_class("y"), 2, 2, 2]]
    assert cs.decode_probs(_probs_from_ids(ids)) == ["x"]


def test_decode_bos_pad_literal():
    # BOS(96)->'[' and PAD(97)->'P' are not filtered (quirk Q1)
    ids = [[96, 97, cs.char_to_class("z"), 0, 0, 0]]
    assert cs.decode_probs(_probs_from_ids(ids)) == ["[Pz"]


def test_decode_all_88_empty():
    ids = [[88] * 6]
    assert cs.decode_probs(_probs_from_ids(ids)) == [""]


def test_decode_no_eos_full_length():
    ids = [[cs.char_to_class(c) for c in "abcdef"]]
    assert cs.decode_probs(_probs_from_ids(ids)) == ["abcdef"]


def test_decode_88_before_eos():
    # 88 dropped even when a true EOS follows later
    ids = [[88, 88, cs.char_to_class("q"), 88, 0, 88]]
    assert cs.decode_probs(_probs_from_ids(ids)) == ["q"]


def test_decode_raw_keeps_everything():
    ids = [[0, 88, 96, 97, cs.char_to_class("a"), 0]]
    assert cs.decode_raw(_probs_from_ids(ids)) == ["]][Pa]"]


def test_ctc_greedy_collapse():
    # collapse repeats then drop blanks
    a = cs.char_to_class("a")
    b = cs.char_to_class("b")
    ids = [[a, a, 0, a, b, b, 0, 0, b]]
    assert cs.ctc_greedy_decode(_probs_from_ids(ids)) == ["aabb"]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, cs.NUM_CLASSES - 1), min_size=1, max_size=26))
def test_decode_invariants(id_row):
    ids = np.asarray([id_row])
    out = cs.decode_ids(ids)[0]
    # Output alphabet never contains ']' (truncation removes the only source)
    assert "]" not in out
    # Truncation is idempotent: decoding should equal its own pre-']' cut
    assert out == out.partition("]")[0]
    # Length bounded by positions that are neither class 88 nor post-EOS
    assert len(out) <= len(id_row)


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 2**32 - 1))
def test_decode_probs_matches_decode_ids(seed):
    rng = np.random.default_rng(seed)
    probs = rng.random((3, 26, cs.NUM_CLASSES)).astype(np.float32)
    assert cs.decode_probs(probs) == cs.decode_ids(np.argmax(probs, -1))


def test_softmax_preserves_argmax():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 26, cs.NUM_CLASSES)).astype(np.float32)
    s = cs.softmax(x)
    assert np.allclose(s.sum(-1), 1.0, atol=1e-5)
    assert (np.argmax(s, -1) == np.argmax(x, -1)).all()
