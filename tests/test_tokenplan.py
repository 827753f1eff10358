"""Parity tests for the token-domain regex pushdown (stages/tokenplan.py).

Contract under test: for every row, (plan match + per-row text fallback)
must equal the pure text path (detokenize -> re.search) STRING-EXACTLY —
same set of matching rows, same capture values.  The text path is the
semantics definition (it is what pc.extract_regex runs in the extractor,
and Arrow's regex engine is RE2, same as /root/reference/parser.go:40-57).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pytest

from logtrics_ray import vocab as V
from logtrics_ray.stages import tokenplan as TP


# ------------------------------------------------------------ harness --

def plan_result(expression: str, rows: list[list[int]],
                pieces: np.ndarray) -> list[str | None] | None:
    """Per-row capture via the plan (+ text fallback for flagged rows);
    None if the rule does not compile (caller skips)."""
    TP._VOCAB_INDEX.clear()
    plan = TP.compile_rule(expression, "t", pieces)
    if plan is None:
        return None
    pieces_pa = pa.array(list(pieces), type=pa.string())
    ps = TP.PlanSet([plan], pieces_pa)
    offsets = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum([len(r) for r in rows], out=offsets[1:])
    flat = np.asarray([t for r in rows for t in r], dtype=np.int64)
    hit_rows, caps, fb = ps.match(flat, offsets, len(rows))[0]
    out: list[str | None] = [None] * len(rows)
    for r, c in zip(hit_rows, caps.to_pylist()):
        out[r] = c
    rx = re.compile(expression)
    for i in np.flatnonzero(fb):
        text = "".join(pieces[t] for t in rows[i])
        m = rx.search(text)
        out[i] = m.group(1) if m else None
    return out


def text_result(expression: str, rows: list[list[int]],
                pieces: np.ndarray) -> list[str | None]:
    rx = re.compile(expression)
    out = []
    for r in rows:
        m = rx.search("".join(pieces[t] for t in r))
        out.append(m.group(1) if m else None)
    return out


def assert_parity(expression: str, rows: list[list[int]], pieces) -> None:
    pieces = np.asarray(pieces, dtype=object)
    got = plan_result(expression, rows, pieces)
    assert got is not None, f"rule declined to compile: {expression}"
    want = text_result(expression, rows, pieces)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, (
            f"row {i}: plan={g!r} text={w!r} tokens={rows[i]} "
            f"text={''.join(pieces[t] for t in rows[i])!r}")


# ------------------------------------------------------- crafted vocabs --

def test_single_piece_anchor_boundary():
    pieces = ["k=", "1", "2", " x"]
    rows = [[0, 1, 2], [0, 1], [3, 0, 2, 1], [3], [1, 2], [0, 3]]
    assert_parity(r"k=(?P<v>\d+)", rows, pieces)


def test_suffix_overlap_start():
    # anchor 'k=' only spellable as the tail of ' k='
    pieces = [" k=", "1", "2", " x"]
    rows = [[0, 1], [0, 1, 2], [3, 0, 2], [1, 0, 1], [3, 3]]
    assert_parity(r"k=(?P<v>\d+)", rows, pieces)


def test_multi_token_anchor():
    # anchor 'ab=' spelled as 'a'+'b='
    pieces = ["a", "b=", "1", " ", "ab", "="]
    rows = [[0, 1, 2], [4, 5, 2], [0, 1], [4, 5], [2, 0, 1, 2], [3, 0, 1, 2, 3]]
    assert_parity(r"ab=(?P<v>\d+)", rows, pieces)


def test_multi_alignment_piece():
    # piece 'aa' starts anchor 'aa' at (2,0) AND (1,1): both must work
    pieces = ["aa", "a=", "1", "=", " "]
    # 'aa'+'a=' -> "aaa=" contains "aa=" at 1  (suffix-overlap alignment)
    # 'aa'+'='  -> "aa="  contains "aa=" at 0  (exact alignment)
    rows = [[0, 1, 2], [0, 3, 2], [0, 0, 3, 2], [4, 0, 1, 2], [1, 2]]
    assert_parity(r"aa=(?P<v>\d+)", rows, pieces)


def test_inside_piece_anchor_danger_falls_back():
    # 'xk=9y' contains the whole match mid-piece -> must fall back, still exact
    pieces = ["xk=9y", "k=", "1", " "]
    rows = [[0], [1, 2], [3, 0, 3], [0, 1, 2]]
    assert_parity(r"k=(?P<v>\d+)", rows, pieces)


def test_prefix_overlap_end_danger():
    # '=1x' continues past the anchor end inside one piece
    pieces = ["k", "=1x", "k=", "1", " "]
    rows = [[0, 1], [2, 3], [4, 0, 1, 4], [2, 1]]
    assert_parity(r"k=(?P<v>\d+)", rows, pieces)


def test_extension_run_into_partial_piece():
    # run extends into a piece whose PREFIX is in-class ('12ab')
    pieces = ["k=", "1", "12ab", " z", "ab"]
    rows = [[0, 1, 2], [0, 2], [0, 1, 1, 3], [0, 2, 1], [3, 0, 2, 3]]
    assert_parity(r"k=(?P<v>\d+)", rows, pieces)


def test_run_stops_at_row_end():
    pieces = ["k=", "1", "2"]
    rows = [[0], [0, 1], [1, 0], [0, 1, 2]]
    assert_parity(r"k=(?P<v>\d+)", rows, pieces)


def test_run_never_crosses_rows():
    pieces = ["k=", "1"]
    # row1 ends with anchor, row2 starts with digits: no cross-row capture
    rows = [[0], [1, 1]]
    got = plan_result(r"k=(?P<v>\d+)", rows, np.asarray(pieces, dtype=object))
    assert got == [None, None]


def test_suffix_literal():
    pieces = ['h "', "ab1", '"', "ab", '"x', " "]
    rows = [[0, 1, 2], [0, 1], [0, 3, 2], [0, 1, 4],  # '"x' startswith suffix
            [5, 0, 1, 2, 5], [0, 2]]
    assert_parity(r'h "(?P<v>[a-z0-9]+)"', rows, pieces)


def test_suffix_midpiece_danger():
    # 'ab"c': class run then quote inside one piece -> fallback, still exact
    pieces = ['h "', 'ab"c', "ab", '"']
    rows = [[0, 1], [0, 2, 3], [0, 2, 1]]
    assert_parity(r'h "(?P<v>[a-z0-9]+)"', rows, pieces)


def test_suffix_multichar_and_continuation():
    # suffix 'ms' + a piece 'm' that is a proper prefix of the suffix
    pieces = ["t=", "1", "ms", "m", "s", " "]
    rows = [[0, 1, 2], [0, 1, 3, 4], [0, 1, 3], [0, 1], [5, 0, 1, 2, 5]]
    assert_parity(r"t=(?P<v>\d+)ms", rows, pieces)


def test_bounded_quantifier():
    pieces = ["s=", "1", "2", "3", "4", " "]
    rows = [[0, 1, 2, 3], [0, 1, 2], [0, 1, 2, 3, 4], [0, 1], [5, 0, 2, 3, 4, 5]]
    assert_parity(r"s=(?P<v>\d{3})", rows, pieces)


def test_bounded_range_quantifier():
    pieces = ["s=", "1", "2", "3", "4", "56789", " "]
    rows = [[0, 1], [0, 1, 2], [0, 1, 2, 3, 4], [0, 5], [0, 1, 5]]
    assert_parity(r"s=(?P<v>\d{2,4})", rows, pieces)


def test_qmin_filter_and_leftmost_valid():
    # first anchor occurrence has too few digits; regex matches the second
    pieces = ["s=", "1", "23", " x"]
    rows = [[0, 3, 0, 1, 2], [0, 0, 1, 2], [0, 3]]
    assert_parity(r"s=(?P<v>\d{3})", rows, pieces)


def test_leftmost_first_occurrence_wins():
    pieces = ["k=", "1", "2", " "]
    rows = [[0, 1, 3, 0, 2]]   # two full matches; leftmost capture "1"
    assert_parity(r"k=(?P<v>\d+)", rows, pieces)


def test_impossible_rule():
    pieces = ["abc", "1", " "]
    plan = TP.compile_rule(r"zz=(?P<v>\d+)", "t", np.asarray(pieces, dtype=object))
    TP._VOCAB_INDEX.clear()
    assert plan is not None and plan.impossible


def test_fallback_only_plan():
    # anchor only occurs mid-piece -> zero paths, nonzero danger:
    # danger rows fall back, clean rows provably no-match at zero cost
    pieces = ["xk=1y", "ab", " "]
    np_pieces = np.asarray(pieces, dtype=object)
    plan = TP.compile_rule(r"k=(?P<v>\d+)", "t", np_pieces)
    TP._VOCAB_INDEX.clear()
    assert plan is not None and not plan.impossible and not plan.path_tabs
    assert plan.danger_tab[0] and not plan.danger_tab[1]
    assert_parity(r"k=(?P<v>\d+)", [[0], [1, 2], [1, 0, 1]], pieces)


def test_unsupported_shapes_decline():
    pieces = np.asarray(["k=", "1"], dtype=object)
    for expr in [
        r"(?P<a>\d+)(?P<b>\d+)",     # two groups
        r"k=(\d+)",                   # unnamed group
        r"k=(?P<v>\d+?)",             # lazy quant
        r"k=(?P<v>[^0-9]+)",          # negated class
        r"k=(?P<v>\d*)",              # qmin 0
        r"(?P<v>\d+)",                # empty prefix
        r"k=(?P<v>\d+)1",             # suffix char in class
        r"k=(?P<v>\d{2})x",           # bounded + suffix
        r"(?i)k=(?P<v>\d+)",          # ignorecase
        r"k=(?P<v>(ab)+)",            # non-class body
    ]:
        assert TP.parse_rule_shape(expr) is None, expr
    TP._VOCAB_INDEX.clear()


# ---------------------------------------------------- real-vocab parity --

@pytest.fixture(scope="module")
def real_vocab():
    return V.build_vocab()


def test_flagship_rules_compile(real_vocab):
    from logtrics_ray.rules import default_rules
    TP._VOCAB_INDEX.clear()
    plans = {r.name: TP.compile_rule(r.expression, r.name, real_vocab)
             for r in default_rules()}
    assert all(p is not None for p in plans.values())
    assert plans["never-matches"].impossible
    assert sum(len(p.path_tabs) for p in plans.values()) == 5
    TP._VOCAB_INDEX.clear()


def test_flagship_rules_random_rows_parity(real_vocab):
    """Randomized adversarial rows over the REAL vocab: special pieces,
    digits, names, endpoints, fillers interleaved every which way."""
    from logtrics_ray.rules import default_rules
    rng = np.random.default_rng(7)
    interesting = np.array(
        list(range(8)) + list(range(50, 60)) + list(range(100, 110))
        + list(range(140, 146)) + [200, 201, 5000], dtype=np.int64)
    rows = []
    for _ in range(400):
        n = int(rng.integers(0, 12))
        rows.append(list(rng.choice(interesting, size=n)))
    rows.extend([[], [1], [2], [1, 2], [1, 100, 2], [3, 50, 51],
                 [3, 50, 51, 0], [6, 140], [7, 140], [4, 50, 51, 52, 53],
                 [5, 50], [1, 200, 2], [50, 51, 52]])
    for r in default_rules():
        assert_parity(r.expression, rows, real_vocab)
    TP._VOCAB_INDEX.clear()


def test_random_small_vocab_parity():
    """Property-style sweep: random tiny vocabs with heavy piece overlap
    (prefixes/suffixes of the anchor as pieces), random rows, several
    rule shapes.  Declined rules are skipped; compiled rules must agree
    with the text path on every row."""
    rng = np.random.default_rng(11)
    exprs = [r"ab=(?P<v>\d+)", r"ab=(?P<v>\d{2})", r"ab=(?P<v>[a-z]+)x",
             r"a(?P<v>\d+)", r"ab=(?P<v>\d{1,3})"]
    alphabet = ["a", "b", "=", "1", "2", "x", "ab", "b=", "ab=", "=1",
                "b=1", "ab=1x", "xab", "aab", "1x", "x", " ", "a=", "ba"]
    checked = 0
    for trial in range(30):
        k = int(rng.integers(4, len(alphabet)))
        pieces = list(rng.choice(alphabet, size=k, replace=False))
        rows = []
        for _ in range(60):
            n = int(rng.integers(0, 7))
            rows.append(list(rng.integers(0, k, size=n)))
        for expr in exprs:
            got = plan_result(expr, rows, np.asarray(pieces, dtype=object))
            if got is None:
                continue
            checked += 1
            want = text_result(expr, rows, np.asarray(pieces, dtype=object))
            assert got == want, (pieces, expr,
                                 [(i, g, w) for i, (g, w) in
                                  enumerate(zip(got, want)) if g != w][:5])
    assert checked >= 40  # the sweep must actually exercise compiled plans
