"""Token vocabulary + greedy decode (reference parity).

Transcribes the reference ``Tokenizer`` (tuatara.cpp:25-117) and the
EOS-truncation loop of ``image_to_data`` (tuatara.cpp:495-505).

The charset is the 95-char PARSEQ charset as it exists AFTER C++ string
unescaping of tuatara.cpp:32-34 — note ``\\`` occurs TWICE (positions 68 and
86 of the charset). ``itos`` is built by prepending EOS ``]`` and appending
BOS ``[`` and PAD ``P`` (tuatara.cpp:36-39), so it has length 98 with
duplicate characters. ``stoi`` is a forward-built map with overwrites
(tuatara.cpp:41-47), which yields the load-bearing quirk Q1:

    eos_id = stoi[']'] = 88   (the charset ']', NOT the prepended slot 0)
    bos_id = stoi['['] = 96
    pad_id = stoi['P'] = 97

Net decode rule (tuatara.cpp:61-78 + 495-505):
  1. argmax over the 98 classes per sequence position;
  2. drop positions whose id == 88 (``filter``, tuatara.cpp:108-116);
  3. map remaining ids through ``itos`` (id 0 renders as ``]``);
  4. truncate the decoded string at the first ``]`` (only id 0 can produce
     one after step 2) — tuatara.cpp:497-500;
  5. BOS (96) and PAD (97) are NOT filtered and decode to literal ``[``/``P``.
"""

from __future__ import annotations

import numpy as np

# Charset after C++ unescaping of tuatara.cpp:32-34.  95 chars; '\\' twice.
CHARSET: str = (
    "0123456789"
    "abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    '!"#$%&'
    "\\'()*+,-./:;<=>?@[\\]^_`{|}~"
)

EOS_CHAR = "]"  # tuatara.cpp:28
BOS_CHAR = "["  # tuatara.cpp:27
PAD_CHAR = "P"  # tuatara.cpp:29

# itos: EOS prepended, BOS & PAD appended (tuatara.cpp:36-39). len == 98.
ITOS: str = EOS_CHAR + CHARSET + BOS_CHAR + PAD_CHAR
NUM_CLASSES: int = len(ITOS)  # 98

# stoi: forward-built with overwrites (tuatara.cpp:41-47).
STOI: dict[str, int] = {}
for _i, _c in enumerate(ITOS):
    STOI[_c] = _i

EOS_ID: int = STOI[EOS_CHAR]  # 88  (quirk Q1 — NOT 0)
BOS_ID: int = STOI[BOS_CHAR]  # 96
PAD_ID: int = STOI[PAD_CHAR]  # 97

# uint8 lookup table for vectorized id->char mapping (all chars are ASCII).
_ITOS_U8: np.ndarray = np.frombuffer(ITOS.encode("ascii"), dtype=np.uint8)


def char_to_class(c: str) -> int:
    """Class id whose ``itos`` rendering is ``c`` via the *first* charset
    occurrence (id = 1 + charset.index(c)); this is the id a recognition
    model trained on the charset emits for character ``c``."""
    return 1 + CHARSET.index(c)


def decode_ids(ids: np.ndarray) -> list[str]:
    """Reference greedy decode of argmax'd ids.

    ids: (N, L) integer array of per-position argmax class ids.
    Returns N strings, applying filter (drop id==88), itos mapping, and
    EOS truncation (cut at first ']' — producible only by id 0 after the
    filter), exactly as tuatara.cpp:61-78 + 495-505.
    """
    ids = np.asarray(ids)
    if ids.ndim != 2:
        raise ValueError("ids must be (N, L)")
    # Position is dropped if it is the charset-']' class (filter step) or at
    # or after the first true-EOS (class 0) position (truncation step).
    # Ordering note: the reference filters FIRST, then truncates at the first
    # remaining ']' — after filtering, only class 0 renders ']', so
    # truncation == "drop everything from the first class-0 position on".
    eos_seen = np.cumsum(ids == 0, axis=1) > 0  # True at and after first 0
    keep = (~eos_seen) & (ids != EOS_ID)
    out: list[str] = []
    for r in range(ids.shape[0]):
        kept = ids[r][keep[r]]
        out.append(bytes(_ITOS_U8[kept]).decode("ascii"))
    return out


def decode_probs(probs: np.ndarray) -> list[str]:
    """Greedy decode of softmax (or logit — argmax-equivalent) tensors.

    probs: (N, L, C=98). Mirrors Tokenizer::decode(token_dists, raw=false)
    (tuatara.cpp:61-78) composed with the caller's EOS truncation
    (tuatara.cpp:495-505).
    """
    probs = np.asarray(probs)
    if probs.ndim != 3 or probs.shape[-1] != NUM_CLASSES:
        raise ValueError(f"probs must be (N, L, {NUM_CLASSES})")
    return decode_ids(np.argmax(probs, axis=-1))


def decode_raw(probs: np.ndarray) -> list[str]:
    """raw=true decode path (tuatara.cpp:69,74): no filter, no truncation —
    every position mapped through itos."""
    probs = np.asarray(probs)
    ids = np.argmax(probs, axis=-1)
    return ["".join(ITOS[i] for i in row) for row in ids]


def ctc_greedy_decode(probs: np.ndarray, blank_id: int = 0) -> list[str]:
    """CTC-style greedy decode with blank-collapse rules.

    NOT the reference's decode (the reference is argmax+filter+truncate; see
    module docstring) — provided additionally because the build brief's
    north_star names "greedy CTC decoding with blank-collapse rules". Rule:
    collapse consecutive repeats, then drop blanks (class ``blank_id``);
    remaining ids map through ``itos``.
    """
    probs = np.asarray(probs)
    ids = np.argmax(probs, axis=-1)  # (N, L)
    out: list[str] = []
    for row in ids:
        prev = -1
        chars: list[str] = []
        for i in row:
            i = int(i)
            if i != prev and i != blank_id:
                chars.append(ITOS[i])
            prev = i
        out.append("".join(chars))
    return out


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    """Numerically-stable softmax (tuatara.cpp:486 torch::softmax)."""
    x = x - np.max(x, axis=axis, keepdims=True)
    e = np.exp(x)
    return e / np.sum(e, axis=axis, keepdims=True)
