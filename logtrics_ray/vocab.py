"""Deterministic token_id -> piece vocabulary + vectorized detokenization.

The input table is pre-tokenized (BASELINE.json input_hint: ``tokens:
array<int32>``).  The reference matches RE2 regexes over raw log lines
(/root/reference/parser.go:40-57); to preserve those semantics over
token sequences we define a fixed, seeded vocabulary that makes every
sequence detokenizable, and run the regexes over the detokenized text.
The ``tokens`` column itself is never modified (per-row token-array
equality invariant vs the reference).

Layout (VOCAB_SIZE = 50257, mirroring a GPT-2-sized id space):
  * ids in SPECIAL: literal pattern pieces (rule anchors, quotes, '=')
  * ids 50..59:     the digit pieces "0".."9" (numeric values in text)
  * ids 100..139:   name pieces  (alnum words — gauge series dimension)
  * ids 140..149:   endpoint pieces (lowercase words — counter dimension)
  * everything else: filler " <lowercase word>" — contains no digits,
    quotes or '=', so fillers can never complete a rule pattern.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

VOCAB_SIZE = 50257
VOCAB_SEED = 20260101

# Literal pattern pieces (anchor text for the fixture rules in rules.py).
SPECIAL: dict[int, str] = {
    0: " ",
    1: ' hello "',
    2: '"',
    3: " latency_ms=",
    4: " status=",
    5: " bytes=",
    6: " GET /api/",
    7: " POST /api/",
}

DIGIT_BASE = 50          # ids 50..59 -> "0".."9"
NAME_BASE = 100          # ids 100..139 -> name pieces
N_NAMES = 40
EP_BASE = 140            # ids 140..149 -> endpoint pieces
N_EPS = 10
FILLER_BASE = 200

_NAME_WORDS = [
    "alice", "bob", "carol", "dave", "erin", "frank", "grace", "heidi",
    "ivan", "judy", "karl", "lena", "mallory", "nina", "oscar", "peggy",
    "quinn", "rita", "sybil", "trent",
]
_EP_WORDS = ["users", "orders", "items", "search", "login", "logout",
             "health", "admin", "files", "stats"]

_ALPHA = np.array(list("abcdefghijklmnopqrstuvwxyz"))


def build_vocab() -> np.ndarray:
    """Deterministic piece table, dtype=object, length VOCAB_SIZE."""
    rng = np.random.default_rng(VOCAB_SEED)
    lens = rng.integers(2, 9, size=VOCAB_SIZE)
    # One flat draw of letters, sliced per word: deterministic and fast.
    flat = _ALPHA[rng.integers(0, 26, size=int(lens.sum()))]
    offs = np.concatenate([[0], np.cumsum(lens)])
    vocab = np.empty(VOCAB_SIZE, dtype=object)
    for i in range(VOCAB_SIZE):
        vocab[i] = " " + "".join(flat[offs[i]:offs[i + 1]])
    for i, piece in SPECIAL.items():
        vocab[i] = piece
    for d in range(10):
        vocab[DIGIT_BASE + d] = str(d)
    for i in range(N_NAMES):
        vocab[NAME_BASE + i] = _NAME_WORDS[i % len(_NAME_WORDS)] + str(i)
    for i in range(N_EPS):
        vocab[EP_BASE + i] = _EP_WORDS[i]
    return vocab


def vocab_as_arrow(vocab: np.ndarray | None = None) -> pa.Array:
    return pa.array(list(vocab if vocab is not None else build_vocab()), type=pa.string())


def detokenize(tokens: pa.ChunkedArray | pa.ListArray, vocab_pa: pa.Array) -> pa.Array:
    """Vectorized detokenize: list<int32> -> string, zero Python-per-row.

    take(vocab, flat ids) -> rebuild list array on the same offsets ->
    binary_join with "" separator.
    """
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    flat = tokens.values
    pieces = pc.take(vocab_pa, flat)
    piece_lists = pa.ListArray.from_arrays(tokens.offsets, pieces)
    return pc.binary_join(piece_lists, pa.scalar("", type=pa.string()))


def encode_number(n: int) -> list[int]:
    """Token ids whose pieces spell the decimal digits of ``n``."""
    return [DIGIT_BASE + int(c) for c in str(int(n))]
