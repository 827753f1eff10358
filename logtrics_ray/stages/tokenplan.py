"""Token-domain rule compilation — regex predicate pushdown onto token ids.

The extraction hot path is ``detokenize(tokens) -> RE2 per rule``; at
100 TB detokenization + regex scanning IS the pipeline's compute
(SCALE.md: ~30 µs/row × 10¹² rows).  But a rule like
``latency_ms=(?P<ms>\\d+)`` does not need the text: if the vocabulary
can spell the literal anchor only as one specific token-id sequence,
matching is integer equality over the ``tokens`` column and the capture
is a run of class-member token ids — pure numpy over the flat id
buffer, no string materialization at all.

This module compiles a rule into that form WHEN IT CAN PROVE the
token-domain match is equivalent to the text-domain RE2 match, and
falls back otherwise (unsupported regex shape, ambiguous vocabulary) —
the text path remains the semantics definition and the parity is pinned
by tests (plan output == ``pc.extract_regex`` output, string-exact).

Supported rule shape (v1):  ``lit (?P<g>CLASS-quant) lit?``
  * one named capture group of a character class (``\\d``, ``[a-z]``,
    ``[a-zA-Z0-9]``, any IN/CATEGORY class without negation),
  * quantifier ``+`` / ``{m}`` / ``{m,n}`` with m >= 1 (bounded forms
    only with an empty suffix literal),
  * non-empty literal prefix; optional literal suffix whose first char
    is outside the class (so the greedy run cannot backtrack past it).

Soundness machinery (all vocab-level, computed once per process):
  * the anchor literal is decomposed over the vocabulary — every way a
    concatenation of pieces can CONTAIN the literal (piece-aligned,
    suffix-overlapped start, prefix-overlapped end, fully inside one
    piece) is enumerated by a DP over consumed-char states;
  * decompositions the runtime matcher does not handle become DANGER
    piece sets: a row containing any such piece is re-checked on the
    text path (per-row fallback, still exact);
  * if the DP finds NO decomposition, the rule provably cannot match
    any token stream over this vocabulary and costs zero per batch;
  * class runs account for pieces that are entirely in-class AND for a
    trailing piece whose PREFIX is in-class (the text run extends into
    it); a piece whose remainder-after-prefix matters for a suffix
    check is either handled exactly or dangers the row.

Reference provenance: the rules themselves mirror
/root/reference/parser.go:40-57 (RE2 + named groups); this compilation
layer has no reference counterpart — it exists because this engine's
input is pre-tokenized sequences (BASELINE input_hint), where
text-domain matching would pay a 1000:1 decode amplification first.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAX_PATHS = 16          # anchor decomposition paths before giving up
_MAXREP = 4294967295    # sre MAXREPEAT


# --------------------------------------------------------------- parsing --

@dataclass(frozen=True)
class RuleShape:
    prefix: str
    group: str
    char_pred: frozenset          # set of chars (explicit; classes expand)
    qmin: int
    qmax: int                      # _MAXREP = unbounded
    suffix: str


_DIGITS = frozenset("0123456789")
_WORDCHARS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_")


def _class_chars(items) -> frozenset | None:
    """sre IN items -> explicit char set (ASCII expansion), None if the
    class can't be expanded exactly (negation, unicode categories...)."""
    from re._constants import CATEGORY, LITERAL, NEGATE, RANGE
    from re import _constants as C
    out: set[str] = set()
    for op, arg in items:
        if op is LITERAL:
            out.add(chr(arg))
        elif op is RANGE:
            lo, hi = arg
            if hi - lo > 512:
                return None
            out.update(chr(c) for c in range(lo, hi + 1))
        elif op is CATEGORY:
            if arg == C.CATEGORY_DIGIT:
                out.update(_DIGITS)
            elif arg == C.CATEGORY_WORD:
                out.update(_WORDCHARS)
            else:
                return None
        elif op is NEGATE:
            return None
        else:
            return None
    return frozenset(out)


def parse_rule_shape(expression: str) -> RuleShape | None:
    """Parse ``expression`` into the supported shape, else None."""
    import re
    try:
        import re._parser as sre_parse
        from re._constants import IN, LITERAL, MAX_REPEAT, SUBPATTERN
        tree = sre_parse.parse(expression)
        if tree.state.flags & re.IGNORECASE:
            return None
        group_names = {v: k for k, v in tree.state.groupdict.items()}
    except Exception:
        return None
    prefix, suffix = [], []
    cap = None
    for op, arg in tree:
        if op is LITERAL:
            (suffix if cap is not None else prefix).append(chr(arg))
        elif op is SUBPATTERN:
            gid, add_flags, del_flags, sub = arg
            if cap is not None or add_flags or del_flags:
                return None          # two groups / inline flags
            if gid not in group_names:
                return None          # unnamed group
            # group body must be CLASS-quant
            if len(sub) != 1:
                return None
            sop, sarg = sub[0]
            if sop is not MAX_REPEAT:
                return None
            qmin, qmax, body = sarg
            if qmin < 1 or len(body) != 1:
                return None
            bop, barg = body[0]
            if bop is IN:
                chars = _class_chars(barg)
            elif bop is LITERAL:
                chars = frozenset(chr(barg))
            else:
                return None
            if chars is None or not chars:
                return None
            cap = (group_names[gid], chars, qmin, qmax)
        else:
            return None
    if cap is None or not prefix:
        return None
    name, chars, qmin, qmax = cap
    sfx = "".join(suffix)
    if sfx and sfx[0] in chars:
        return None                  # greedy run could backtrack into it
    if qmax != _MAXREP and sfx:
        return None                  # bounded quant + suffix: unsupported
    return RuleShape("".join(prefix), name, chars, qmin, qmax, sfx)


# --------------------------------------------------- vocab piece indexes --

class VocabIndex:
    """Per-vocabulary substring indexes, built once per process:
    piece string -> ids, every proper piece-prefix -> ids, every proper
    piece-suffix -> ids (piece lengths are small, so this is O(total
    piece chars))."""

    def __init__(self, pieces: np.ndarray):
        self.pieces = pieces
        self.n = len(pieces)
        self.lens = np.fromiter((len(p) for p in pieces), dtype=np.int64,
                                count=self.n)
        self.exact: dict[str, list[int]] = {}
        self.prefixes: dict[str, list[int]] = {}
        self.suffixes: dict[str, list[int]] = {}
        for i, p in enumerate(pieces):
            self.exact.setdefault(p, []).append(i)
            for j in range(1, len(p)):
                self.prefixes.setdefault(p[:j], []).append(i)
                self.suffixes.setdefault(p[j:], []).append(i)

    def containing(self, s: str) -> list[int]:
        """Pieces strictly longer than ``s`` that contain it."""
        return [i for i in range(self.n)
                if self.lens[i] > len(s) and s in self.pieces[i]]


_VOCAB_INDEX: dict[int, VocabIndex] = {}


def vocab_index(pieces: np.ndarray) -> VocabIndex:
    key = id(pieces)
    vi = _VOCAB_INDEX.get(key)
    if vi is None or vi.pieces is not pieces:
        _VOCAB_INDEX.clear()
        vi = _VOCAB_INDEX[key] = VocabIndex(pieces)
    return vi


# ------------------------------------------------------ anchor DP paths --

@dataclass
class Path:
    """One way the anchor can occur: token t matches first_set, tokens
    t+1.. match mid_sets in order, the LAST set's pieces end exactly at
    the anchor's last char (boundary terminal — the only handled
    terminal; others go to the danger set).  start_off = char offset of
    the anchor start inside the first piece (uniform across the set)."""
    sets: list[np.ndarray]
    start_off: int


@dataclass
class Decomposition:
    paths: list[Path]
    danger: np.ndarray            # piece ids that enable unhandled modes
    impossible: bool = False


def decompose_literal(A: str, vi: VocabIndex) -> Decomposition | None:
    """All ways piece concatenations can contain ``A``.  Returns None if
    the enumeration exceeds MAX_PATHS (caller falls back entirely)."""
    danger: set[int] = set()
    la = len(A)

    # Occurrences of A inside a single longer piece: the occurrence that
    # ends EXACTLY at the piece end is the handled suffix-overlap start
    # (enumerated below); any other in-piece occurrence (chars after A in
    # the same piece — the capture run would begin mid-piece relative to
    # the anchor) is an unhandled mode -> danger.
    for pid in vi.containing(A):
        p = vi.pieces[pid]
        i = p.find(A)
        while i != -1:
            if i + la != len(p):
                danger.add(pid)
                break
            i = p.find(A, i + 1)

    # starts: (consumed_chars, start_off) -> ids. start_off>0 = the piece
    # has foreign chars before A.  One piece may start the anchor at
    # SEVERAL alignments (e.g. piece "aa", anchor "aa...": exact at
    # (2,0) and suffix-overlap at (1,1)) — each is a distinct occurrence
    # shape, enumerated as its own path; the runtime's leftmost-valid
    # candidate selection arbitrates between them exactly like RE2's
    # leftmost-match search order.
    grouped: dict[tuple[int, int], list[int]] = {}
    for c in range(1, la + 1):
        seg = A[:c]
        ids_exact = vi.exact.get(seg, [])
        if ids_exact:
            grouped.setdefault((c, 0), []).extend(ids_exact)
        for pid in vi.suffixes.get(seg, []):
            off = int(vi.lens[pid]) - c
            grouped.setdefault((c, off), []).append(pid)

    # mid transitions: state s -> s+len(piece) for pieces == A[s:t]
    # terminal: piece == A[s:] (boundary, handled) or piece startswith
    # A[s:] with extra chars (inside terminal -> danger).
    paths: list[Path] = []

    def extend(state: int, sets: list[np.ndarray], start_off: int) -> bool:
        if len(paths) > MAX_PATHS:
            return False
        if state == la:
            paths.append(Path(sets, start_off))
            return True
        rest = A[state:]
        for pid in vi.prefixes.get(rest, []):
            danger.add(pid)          # inside terminal
        for t in range(state + 1, la + 1):
            seg = A[state:t]
            ids = vi.exact.get(seg, [])
            if not ids:
                continue
            if not extend(t, sets + [np.asarray(ids, dtype=np.int64)],
                          start_off):
                return False
        return True

    for (c, off), ids in sorted(grouped.items()):
        if not extend(c, [np.asarray(sorted(set(ids)), dtype=np.int64)], off):
            return None
    if len(paths) > MAX_PATHS:
        return None
    return Decomposition(paths=paths,
                         danger=np.asarray(sorted(danger), dtype=np.int64),
                         impossible=(not paths and not danger))


# ------------------------------------------------------------ class info --

class ClassInfo:
    """Vocab-level tables for one character class: full membership,
    leading-prefix length per piece, and piece char lengths."""

    def __init__(self, chars: frozenset, vi: VocabIndex):
        n = vi.n
        self.full = np.zeros(n, dtype=bool)
        self.prefix_len = np.zeros(n, dtype=np.int64)
        for i, p in enumerate(vi.pieces):
            k = 0
            for ch in p:
                if ch in chars:
                    k += 1
                else:
                    break
            self.prefix_len[i] = k
            self.full[i] = (k == len(p) and k > 0)
        self.piece_chars = vi.lens


# ------------------------------------------------------------- the plan --

@dataclass
class TokenPlan:
    """Compile-time output for one rule.  Runtime matching happens in
    PlanSet, which fuses every rule's anchor/danger lookup into one coded
    gather over the batch's flat token buffer."""
    rule_name: str
    group: str
    shape: RuleShape
    path_tabs: list[tuple[list[np.ndarray], int]]  # ([bool-tab per pos], off)
    danger_tab: np.ndarray        # bool[VOCAB]: row fallback trigger
    cls: ClassInfo
    suffix_tab: np.ndarray | None  # bool[VOCAB]: token satisfies suffix
    impossible: bool = False

    @property
    def piece_chars(self) -> np.ndarray:
        return self.cls.piece_chars


class PlanSet:
    """Fused runtime matcher for a set of compiled TokenPlans.

    Per-batch cost is ONE uint64 gather over the flat token buffer plus
    one flatnonzero (all rules' anchor-start and danger pieces share one
    bit-coded table); everything after that is candidate-sized — run
    extension walks tokens iteratively over the shrinking candidate set,
    row membership comes from searchsorted on the offsets, and ordering
    uses token indexes (char offsets are monotone in them), so no
    full-length rowid/cumsum/stop materializations exist at all.

    Builds only if every rule's bits fit one 64-bit code word; the
    caller keeps the text path otherwise.
    """

    def __init__(self, plans: list[TokenPlan], pieces_pa: pa.Array):
        self.plans = plans
        self.pieces_pa = pieces_pa
        self.piece_chars = plans[0].piece_chars if plans else None
        nvocab = len(pieces_pa)
        code = np.zeros(nvocab, dtype=np.uint64)
        bit = 0
        self.rt = []   # per rule: (danger_bit, [(first_bit, tabs, start_off)])
        for p in plans:
            danger_bit = 0
            if p.danger_tab.any():
                if bit > 63:
                    raise OverflowError("PlanSet bit budget exceeded")
                danger_bit = 1 << bit
                code[p.danger_tab] |= np.uint64(danger_bit)
                bit += 1
            paths = []
            for tabs, soff in p.path_tabs:
                if bit > 63:
                    raise OverflowError("PlanSet bit budget exceeded")
                b = 1 << bit
                code[tabs[0]] |= np.uint64(b)
                bit += 1
                paths.append((b, tabs, soff))
            self.rt.append((danger_bit, paths))
        # Narrowest dtype that holds every bit: the per-batch coded
        # gather is bandwidth-bound, so a uint8 table moves 8x less than
        # uint64 for the common few-rules case.
        for dt in (np.uint8, np.uint16, np.uint32, np.uint64):
            if bit <= np.dtype(dt).itemsize * 8:
                code = code.astype(dt)
                break
        self.code = code
        self.nbits = bit

    def match(self, flat: np.ndarray, offsets: np.ndarray, n_rows: int):
        """Match every rule over one batch.

        Returns a list aligned to ``plans``: (rows, caps, fb_mask) where
        ``rows`` are the batch row indexes matched by the plan (ascending,
        fallback rows already excluded), ``caps`` the capture strings
        aligned to ``rows``, and ``fb_mask`` a bool[n_rows] of rows whose
        result must come from the text path instead.
        """
        empty_rows = np.empty(0, dtype=np.int64)
        empty_caps = pa.array([], type=pa.string())
        if flat.size == 0:
            return [(empty_rows, empty_caps, np.zeros(n_rows, dtype=bool))
                    for _ in self.plans]
        codes = self.code[flat]
        nz = np.flatnonzero(codes)
        cnz = codes[nz]

        def row_of(pos):
            return np.searchsorted(offsets, pos, side="right") - 1

        out = []
        for plan, (danger_bit, paths) in zip(self.plans, self.rt):
            fb_mask = np.zeros(n_rows, dtype=bool)
            if danger_bit:
                dpos = nz[(cnz & danger_bit) != 0]
                if dpos.size:
                    fb_mask[row_of(dpos)] = True
            if plan.impossible or not paths:
                out.append((empty_rows, empty_caps, fb_mask))
                continue

            # candidate anchors: first token from the coded scan, the
            # remaining anchor tokens verified candidate-wise.
            firsts, lasts, soffs = [], [], []
            for b, tabs, soff in paths:
                p = nz[(cnz & b) != 0]
                L = len(tabs)
                if L > 1 and p.size:
                    p = p[p + (L - 1) < flat.size]
                    ok = np.ones(p.size, dtype=bool)
                    for k in range(1, L):
                        ok &= tabs[k][flat[p + k]]
                    p = p[ok]
                    # whole anchor inside one row
                    p = p[p + (L - 1) < offsets[row_of(p) + 1]]
                if p.size:
                    firsts.append(p)
                    lasts.append(p + (L - 1))
                    soffs.append(np.full(p.size, soff, dtype=np.int64))
            if not firsts:
                out.append((empty_rows, empty_caps, fb_mask))
                continue
            first = np.concatenate(firsts)
            last = np.concatenate(lasts)
            soff = np.concatenate(soffs)
            row = row_of(first)
            if fb_mask.any():
                keep = ~fb_mask[row]
                first, last, soff, row = (first[keep], last[keep],
                                          soff[keep], row[keep])
            if first.size == 0:
                out.append((empty_rows, empty_caps, fb_mask))
                continue
            row_end = offsets[row + 1]
            cap0 = last + 1

            # capture run: iterative extension over the shrinking active
            # set — total work is sum of run lengths, not flat length.
            run_end = cap0.copy()
            run_chars = np.zeros(first.size, dtype=np.int64)
            active = np.flatnonzero(run_end < row_end)
            full = plan.cls.full
            pch = self.piece_chars
            while active.size:
                toks = flat[run_end[active]]
                ok = full[toks]
                good = active[ok]
                if good.size:
                    run_chars[good] += pch[toks[ok]]
                    run_end[good] += 1
                    active = good[run_end[good] < row_end[good]]
                else:
                    break

            ext_ok = run_end < row_end
            safe = np.minimum(run_end, flat.size - 1)
            ext_len = np.where(ext_ok, plan.cls.prefix_len[flat[safe]], 0)
            valid = (run_chars + ext_len) >= plan.shape.qmin
            if plan.suffix_tab is not None:
                valid &= (ext_len == 0) & ext_ok & plan.suffix_tab[flat[safe]]
            if not valid.any():
                out.append((empty_rows, empty_caps, fb_mask))
                continue

            # leftmost-first per row among valid candidates (RE2 search
            # order): char offsets are monotone in (token index, start
            # offset), so no char accounting is needed.
            vfirst, vsoff, vrow = first[valid], soff[valid], row[valid]
            vcap0, vrun_end, vext = cap0[valid], run_end[valid], ext_len[valid]
            order = np.lexsort((vsoff, vfirst, vrow))
            row_s = vrow[order]
            lead = np.flatnonzero(np.diff(row_s, prepend=row_s[0] - 1))
            sel = order[lead]
            caps = self._compose(flat, vcap0[sel], vrun_end[sel], vext[sel])
            if plan.shape.qmax != _MAXREP:
                caps = pc.utf8_slice_codeunits(caps, 0, plan.shape.qmax)
            out.append((vrow[sel], caps, fb_mask))
        return out

    def _compose(self, flat: np.ndarray, c0: np.ndarray, c1: np.ndarray,
                 el: np.ndarray) -> pa.Array:
        """Compose capture strings — run pieces plus an optional in-class
        prefix of the extension piece — via ONE take on an augmented
        dictionary (vocab pieces ++ unique prefix strings) + binary_join.
        Fully vectorized; Python loops only over UNIQUE (piece, cut)
        extension keys."""
        pieces_pa = self.pieces_pa
        npieces = len(pieces_pa)
        lens = (c1 - c0).astype(np.int64)
        has_ext = el > 0
        seg_lens = lens + has_ext
        off = np.zeros(seg_lens.size + 1, dtype=np.int64)
        np.cumsum(seg_lens, out=off[1:])
        flat_idx = np.empty(int(off[-1]), dtype=np.int64)
        run_total = int(lens.sum())
        if run_total:
            run_off = np.zeros(lens.size + 1, dtype=np.int64)
            np.cumsum(lens, out=run_off[1:])
            intra = np.arange(run_total, dtype=np.int64) \
                - np.repeat(run_off[:-1], lens)
            flat_idx[np.repeat(off[:-1], lens) + intra] = \
                flat[np.repeat(c0, lens) + intra]
        ext_rows = np.flatnonzero(has_ext)
        aug: list[str] = []
        if ext_rows.size:
            pids = flat[c1[ext_rows]].astype(np.int64)
            cuts = el[ext_rows].astype(np.int64)
            pack = pids * 4096 + cuts          # piece chars << 4096 always
            uniq, inv = np.unique(pack, return_inverse=True)
            for key in uniq:
                pid, cut = int(key) // 4096, int(key) % 4096
                aug.append(pieces_pa[pid].as_py()[:cut])
            flat_idx[off[1:][ext_rows] - 1] = npieces + inv
        dictionary = pieces_pa if not aug else pa.concat_arrays(
            [pieces_pa, pa.array(aug, type=pa.string())])
        taken = pc.take(dictionary, pa.array(flat_idx, type=pa.int64()))
        return pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(off.astype(np.int32), type=pa.int32()), taken),
            pa.scalar("", type=pa.string()))


def compile_rule(expression: str, rule_name: str,
                 pieces: np.ndarray) -> TokenPlan | None:
    """Compile ``expression`` into a TokenPlan over ``pieces``; None if
    the rule can't be compiled soundly (caller uses the text path)."""
    shape = parse_rule_shape(expression)
    if shape is None:
        return None
    vi = vocab_index(pieces)
    dec = decompose_literal(shape.prefix, vi)
    if dec is None:
        return None
    cls = ClassInfo(shape.char_pred, vi)

    danger = np.zeros(vi.n, dtype=bool)
    danger[dec.danger] = True

    if dec.impossible:
        # the anchor cannot occur in ANY token stream over this vocab —
        # no match is possible regardless of suffix; zero per-batch cost.
        return TokenPlan(rule_name, shape.group, shape, [], danger, cls,
                         None, impossible=True)

    suffix_tab = None
    if shape.suffix:
        # a token satisfies the suffix iff its piece STARTS WITH the full
        # suffix string; pieces that begin a multi-token continuation of
        # the suffix (proper prefix of the suffix) are dangered, as are
        # pieces whose class-prefix is followed by a suffix start inside
        # the same piece (mid-piece suffix after an extended run).
        suffix_tab = np.zeros(vi.n, dtype=bool)
        for i, p in enumerate(vi.pieces):
            if p.startswith(shape.suffix):
                suffix_tab[i] = True
            elif shape.suffix.startswith(p):
                danger[i] = True
        for i, p in enumerate(vi.pieces):
            k = int(cls.prefix_len[i])
            if 0 < k < len(p) and p[k:].startswith(shape.suffix[:1]):
                danger[i] = True

    # dec.paths may be empty with a nonzero danger set: only exotic
    # occurrence modes are possible over this vocab, so every row
    # containing a danger piece falls back and EVERY OTHER row provably
    # cannot match — the plan still eliminates the text path for the
    # overwhelming majority of rows.
    path_tabs = []
    for path in dec.paths:
        tabs = []
        for ids in path.sets:
            tab = np.zeros(vi.n, dtype=bool)
            tab[ids] = True
            tabs.append(tab)
        path_tabs.append((tabs, path.start_off))
    return TokenPlan(rule_name, shape.group, shape, path_tabs, danger, cls,
                     suffix_tab)
