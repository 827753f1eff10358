"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline components (graded alongside the
rollup engine): language ID, quality scoring, token counting, document
fingerprinting.  All are stateless-per-row and vectorized (pandas .str
or compiled regex per batch); heavier variants (compiled patterns,
stopword tables) live in actor-pool callables so setup happens once per
actor — the same pattern as stages/extract.py.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

# A BPE-ish pre-tokenizer: words / numbers / single punctuation, the
# public GPT-2 style split (simplified, ASCII-safe).
TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
WORD_RE = re.compile(r"\S+")

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as by at "
    "from not but have has had they you we he she i".split())

_POLY_P = np.uint64(1099511628211)
_POW_CACHE: list[np.ndarray] = []


def _poly_powers(n: int) -> np.ndarray:
    """[P^0, P^1, ... P^(n-1)] mod 2^64 (uint64 wraparound), cached."""
    if not _POW_CACHE or _POW_CACHE[0].size < n:
        m = max(n, 4096)
        with np.errstate(over="ignore"):
            p = np.concatenate([
                np.ones(1, dtype=np.uint64),
                np.multiply.accumulate(np.full(m - 1, _POLY_P, dtype=np.uint64))])
        _POW_CACHE[:] = [p]
    return _POW_CACHE[0][:n]


# ------------------------------------------------ byte-level fast path --
# All counting regexes above are ASCII-class (\S, \s, [A-Za-z], [0-9],
# [^\w\s]), so on pure-ASCII text every count is computable straight off
# the Arrow string value buffer with numpy masks — no per-row regex.
# Non-ASCII batches (where Python's \s also matches unicode whitespace)
# fall back to the regex path; byte-identity of the two paths is pinned
# in tests/test_functions.py.

_WS_LUT = np.zeros(256, dtype=bool)
_WS_LUT[[9, 10, 11, 12, 13, 32]] = True          # \t \n \v \f \r ' '


def _stop_keys() -> np.ndarray:
    """Stopwords packed as (len << 32 | first-4-lowercase-bytes) int64
    keys — every stopword is <= 4 chars, so membership is one np.isin."""
    ks = []
    for w in STOPWORDS:
        b = w.encode()
        assert len(b) <= 4
        k = len(b) << 32
        for j, c in enumerate(b):
            k |= c << (24 - 8 * j)
        ks.append(k)
    return np.array(sorted(ks), dtype=np.int64)


_STOP_KEYS = _stop_keys()


def ascii_text_counts(col: pa.Array) -> dict | None:
    """Vectorized per-doc counts over the flat UTF-8 buffer of an Arrow
    string array: n_chars, n_words (\\S+ runs), n_tokens (alpha runs +
    digit runs + other non-ws chars), n_stop (lowercased word in
    STOPWORDS), n_punct ([^\\w\\s]), n_ws (\\s).  Returns None when any
    byte >= 0x80 (caller falls back to the regex path)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    odt = np.int64 if pa.types.is_large_string(col.type) else np.int32
    bufs = col.buffers()
    off = np.frombuffer(bufs[1], dtype=odt)[
        col.offset: col.offset + n + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, np.uint8)
    flat = data[off[0]:off[-1]]
    if flat.size and int(flat.max()) >= 128:
        return None
    rel = off - off[0]
    lens = np.diff(rel)
    zeros = np.zeros(n, dtype=np.int64)
    if flat.size == 0:
        return {"n_chars": lens.astype(np.int64), "n_words": zeros,
                "n_tokens": zeros, "n_stop": zeros, "n_punct": zeros,
                "n_ws": zeros}
    doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)

    ws = _WS_LUT[flat]
    nonws = ~ws
    upper = (flat >= 65) & (flat <= 90)
    lower_b = np.where(upper, flat + 32, flat)
    alpha = (lower_b >= 97) & (lower_b <= 122)
    digit = (flat >= 48) & (flat <= 57)
    other = nonws & ~alpha & ~digit

    # run starts, reset at every doc boundary (docs are adjacent in flat)
    def starts(mask):
        prev = np.concatenate(([False], mask[:-1]))
        b = rel[:-1]                 # doc starts; trailing empty docs
        prev[b[b < mask.size]] = False   # have boundary == flat end
        return mask & ~prev

    word_start = starts(nonws)

    def cnt(mask):
        return np.bincount(doc_of[mask], minlength=n).astype(np.int64)

    n_words = cnt(word_start)
    n_tokens = cnt(starts(alpha)) + cnt(starts(digit)) + cnt(other)
    n_ws = cnt(ws)
    n_punct = cnt(other & (flat != 95))          # '_' is \w, not punct

    # stopwords: word run ends pair with starts in order; length <= 4
    # candidates pack (len, 4 lowercased bytes) into one int64 key
    nxt = np.concatenate((nonws[1:], [False]))
    ends_at = rel[1:] - 1
    nxt[ends_at[ends_at >= 0]] = False
    word_end = nonws & ~nxt
    ws_pos = np.flatnonzero(word_start)
    wl = np.flatnonzero(word_end) - ws_pos + 1
    cand = wl <= 4
    pos, L = ws_pos[cand], wl[cand]
    key = L.astype(np.int64) << 32
    for j in range(4):
        idx = np.minimum(pos + j, max(flat.size - 1, 0))
        byte = lower_b[idx] if flat.size else np.zeros(0, np.uint8)
        key = key | np.where(j < L, byte.astype(np.int64) << (24 - 8 * j), 0)
    match = np.isin(key, _STOP_KEYS)
    n_stop = np.bincount(doc_of[pos[match]], minlength=n).astype(np.int64)

    return {"n_chars": lens.astype(np.int64), "n_words": n_words,
            "n_tokens": n_tokens, "n_stop": n_stop, "n_punct": n_punct,
            "n_ws": n_ws}


class TextStats:
    """Actor-pool callable: per-doc counts + quality score.

    Emits (doc_id, n_chars, n_words, n_tokens, stopword_ratio, punct_ratio,
    mean_word_len, quality).  ``quality`` is a deterministic [0,1] heuristic:
    rewards mid-length docs, normal word lengths, presence of stopwords
    (prose-ness), penalizes punctuation soup.

    ASCII batches take the byte-level vectorized path
    (``ascii_text_counts``); batches with non-ASCII text fall back to the
    per-row regex path (identical results on ASCII, pinned in tests).
    """

    def __init__(self):
        self.token_re = TOKEN_RE
        self.word_re = WORD_RE
        self.stop = STOPWORDS

    def _regex_counts(self, text: pd.Series) -> dict:
        n_chars = text.str.len().to_numpy(np.int64)
        words = text.map(self.word_re.findall)
        n_words = words.map(len).to_numpy(np.int64)
        n_tokens = text.map(self.token_re.findall).map(len).to_numpy(np.int64)

        def stop_count(ws):
            return sum(1 for w in ws if w.lower() in self.stop)

        n_stop = words.map(stop_count).to_numpy(np.int64)
        n_punct = text.str.count(r"[^\w\s]").to_numpy(np.int64)
        n_ws = text.str.count(r"\s").to_numpy(np.int64)
        return {"n_chars": n_chars, "n_words": n_words,
                "n_tokens": n_tokens, "n_stop": n_stop,
                "n_punct": n_punct, "n_ws": n_ws}

    def _columns(self, text_arr: pa.Array) -> dict:
        """Stat columns (numpy) from an Arrow string column — the ASCII
        byte-level fast path reads the value buffer ZERO-COPY; only a
        non-ASCII batch pays a pandas conversion for the regex fallback."""
        c = ascii_text_counts(text_arr)
        if c is None:
            if isinstance(text_arr, pa.ChunkedArray):
                text_arr = text_arr.combine_chunks()
            c = self._regex_counts(text_arr.to_pandas().astype(str))
        n_chars, n_words = c["n_chars"], c["n_words"]
        n_tokens = c["n_tokens"]
        sratio = np.where(n_words > 0,
                          c["n_stop"] / np.maximum(n_words, 1), 0.0)
        pratio = np.where(n_chars > 0,
                          c["n_punct"] / np.maximum(n_chars, 1), 0.0)
        mwl = np.where(n_words > 0,
                       (n_chars - c["n_ws"]) / np.maximum(n_words, 1), 0.0)
        len_score = np.clip(np.log1p(n_words) / np.log(201.0), 0.0, 1.0)
        wl_score = np.exp(-0.5 * ((mwl - 5.0) / 3.0) ** 2)
        quality = np.clip(0.35 * len_score + 0.25 * np.minimum(sratio / 0.4, 1.0)
                          + 0.25 * wl_score + 0.15 * (1.0 - np.minimum(pratio / 0.3, 1.0)),
                          0.0, 1.0)
        return {"n_chars": n_chars, "n_words": n_words, "n_tokens": n_tokens,
                "stopword_ratio": sratio, "punct_ratio": pratio,
                "mean_word_len": mwl, "quality": quality}

    def table(self, batch: pa.Table) -> pa.Table:
        """Arrow-native entry (zero-copy on ASCII corpora)."""
        cols = self._columns(batch["text"])
        return pa.table({"doc_id": batch["doc_id"], **cols})

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].astype(str)
        cols = self._columns(pa.array(text, pa.string()))
        return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(), **cols})


# Character-trigram profiles for a tiny deterministic language-ID
# heuristic.  Not a model download — just indicative function words.
_LANG_MARKERS = {
    "en": (" the ", " and ", " of ", " is ", " to ", " in "),
    "de": (" der ", " und ", " die ", " ist ", " das ", " nicht "),
    "fr": (" le ", " la ", " et ", " les ", " des ", " est "),
    "es": (" el ", " de ", " la ", " que ", " los ", " una "),
}


class LangId:
    """Actor-pool callable: n-gram-marker language ID with 'und' fallback."""

    def __init__(self):
        self.markers = {k: v for k, v in _LANG_MARKERS.items()}

    def _pred(self, text) -> np.ndarray:
        """Marker-count argmax over an Arrow string array.  Literal
        ``count_substring`` matches the former pandas ``str.count`` on
        escaped patterns (both count non-overlapping, left-to-right)."""
        import pyarrow.compute as pc
        # last arg of binary_join_element_wise is the SEPARATOR:
        # ["", lower, ""] joined by " " -> " <lower> "
        padded = pc.binary_join_element_wise(
            "", pc.utf8_lower(text), "", " ")
        scores = []
        for marks in self.markers.values():
            s = np.zeros(len(padded), dtype=np.int64)
            for m in marks:
                s += pc.count_substring(padded, pattern=m).to_numpy(
                    zero_copy_only=False).astype(np.int64)
            scores.append(s)
        mat = np.stack(scores, axis=1)
        langs = np.array(list(self.markers))
        return np.where(mat.max(axis=1) > 0, langs[mat.argmax(axis=1)], "und")

    def table(self, batch: pa.Table) -> pa.Table:
        """Arrow-native entry."""
        return pa.table({"doc_id": batch["doc_id"],
                         "lang_pred": pa.array(self._pred(batch["text"]),
                                               pa.string())})

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        pred = self._pred(pa.array(batch["text"].astype(str), pa.string()))
        return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(),
                             "lang_pred": pred})


# ------------------------------------------- intra-doc repetition stats --

def _segment_distinct(keys: np.ndarray, doc_of: np.ndarray,
                      counts: np.ndarray) -> np.ndarray:
    """Per-doc distinct-count over a flat (key, doc) layout: one lexsort,
    then total minus equal-adjacent-within-doc."""
    n = counts.size
    if keys.size == 0:
        return np.zeros(n, np.int64)
    order = np.lexsort((keys, doc_of))
    ks, ds_ = keys[order], doc_of[order]
    same = np.zeros(keys.size, bool)
    same[1:] = (ks[1:] == ks[:-1]) & (ds_[1:] == ds_[:-1])
    return counts - np.bincount(ds_[same], minlength=n).astype(np.int64)


def repetition_stats(ds, text_col: str = "text"):
    """Gopher/MassiveText-style intra-document repetition signals (public
    quality-filter heuristics): per doc —

      n_lines, n_words,
      dup_line_frac   = (lines - distinct lines) / lines,
      dup_word_frac   = (words - distinct words) / words,
      top_bigram_frac = occurrences of the most frequent word bigram
                        / total bigrams (0 when the doc has < 2 words).

    Words are the whitespace split of the lowercased text (empties
    dropped — exactly ``word_hashes``); lines are the '\\n' split of the
    raw text (empties KEPT, matching SQL string_split).  Everything is
    flat-buffer vectorized: one lexsort per signal over 64-bit hashes,
    run-length maxima via ``np.maximum.at`` — no per-doc Python.  Ratios
    are exact-int divisions rounded half-away at 6dp on BOTH sides so
    the SQL replay is hash-exact."""
    import pyarrow.compute as pc

    from logtrics_ray.functions.dedup import word_hashes
    from logtrics_ray.hashing import id_hash64_array
    from logtrics_ray.pipelines.table_rollup import _round6

    C1 = np.uint64(0x9E3779B97F4A7C15)
    C2 = np.uint64(0xC2B2AE3D27D4EB4F)

    def fn(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(texts)
        ids = t["doc_id"]

        # words
        wh, wc = word_hashes(texts)
        doc_w = np.repeat(np.arange(n, dtype=np.int64), wc)
        distinct_w = _segment_distinct(wh, doc_w, wc)
        dup_word_frac = np.where(
            wc > 0, (wc - distinct_w) / np.maximum(wc, 1), 0.0)

        # word bigrams: flat hashes are in doc order, pairs must not
        # straddle docs
        top = np.zeros(n, np.int64)
        nbg = np.zeros(n, np.int64)
        if wh.size >= 2:
            valid = doc_w[1:] == doc_w[:-1]
            with np.errstate(over="ignore"):
                bk = wh[:-1][valid] * C1 + wh[1:][valid] * C2
            bd = doc_w[:-1][valid]
            nbg = np.bincount(bd, minlength=n).astype(np.int64)
            if bk.size:
                order = np.lexsort((bk, bd))
                bks, bds = bk[order], bd[order]
                new_run = np.ones(bk.size, bool)
                new_run[1:] = (bks[1:] != bks[:-1]) | (bds[1:] != bds[:-1])
                starts = np.flatnonzero(new_run)
                lens = np.diff(np.append(starts, bk.size))
                np.maximum.at(top, bds[starts], lens)
        top_bigram_frac = np.where(nbg > 0, top / np.maximum(nbg, 1), 0.0)

        # lines (raw text, empties kept)
        lines = pc.split_pattern(texts, pattern="\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        lc = pc.list_value_length(lines).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lh = id_hash64_array(pc.list_flatten(lines))
        doc_l = np.repeat(np.arange(n, dtype=np.int64), lc)
        distinct_l = _segment_distinct(lh, doc_l, lc)
        dup_line_frac = np.where(
            lc > 0, (lc - distinct_l) / np.maximum(lc, 1), 0.0)

        return pa.table({
            "doc_id": ids,
            "n_lines": pa.array(lc, pa.int64()),
            "n_words": pa.array(wc, pa.int64()),
            "dup_line_frac": pa.array(_round6(dup_line_frac), pa.float64()),
            "dup_word_frac": pa.array(_round6(dup_word_frac), pa.float64()),
            "top_bigram_frac": pa.array(_round6(top_bigram_frac),
                                        pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


# --------------------------------------------------- PII scrubbing --
# Redaction rules applied IN ORDER (each counts matches on the text as
# it stands after the previous rule, then replaces them).  Both Arrow's
# replace_substring_regex and DuckDB's regexp_replace are RE2, so the
# oracle replays the identical patterns with 'g' — no dialect gap.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}", "<PHONE>"),
]


def scrub_pii(ds, text_col: str = "text"):
    """Redact emails / IPv4 addresses / international phone numbers from
    ``text_col`` and count the redactions per category.  Stateless
    vectorized map — RE2 kernels over the whole Arrow column, no shuffle,
    no per-row Python; the 100 TB cost is exactly one pass of regex CPU.
    Emits the scrubbed ``text_col`` plus ``n_email/n_ip/n_phone``."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        s = t[text_col]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        counts = []
        for name, pat, repl in PII_RULES:
            counts.append((f"n_{name}",
                           pc.count_substring_regex(s, pattern=pat)
                           .cast(pa.int64())))
            s = pc.replace_substring_regex(s, pattern=pat, replacement=repl)
        out = t.set_column(t.schema.get_field_index(text_col), text_col, s)
        for nm, arr in counts:
            out = out.append_column(nm, arr)
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Polynomial rolling-hash document fingerprint:
    h(doc) = Σ byte_i · P^(n-1-i)  mod 2^64, vectorized across the WHOLE
    batch: the Arrow string column's value buffer is viewed flat (the
    UTF-8 bytes, zero-copy), per-byte exponents come from the offsets
    (exp = doc_end-1 - flat_pos), and per-doc sums are one
    ``np.add.reduceat`` — mod-2^64 addition is associative, so the result
    is bit-identical to the per-doc dot product.  No per-doc Python loop;
    transient cost is 8 bytes per text byte (the uint64 upcast)."""
    col = batch["text"]
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    odt = np.int64 if pa.types.is_large_string(col.type) else np.int32
    bufs = col.buffers()
    off = np.frombuffer(bufs[1], dtype=odt)[
        col.offset: col.offset + len(col) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, np.uint8)
    flat = data[off[0]:off[-1]].astype(np.uint64)
    lens = np.diff(off)
    out = np.zeros(len(col), dtype=np.uint64)
    if flat.size:
        rel = off - off[0]
        with np.errstate(over="ignore"):
            exps = np.repeat(rel[:-1] + lens - 1, lens) - np.arange(flat.size)
            prod = flat * _poly_powers(int(lens.max()))[exps]
            nz = np.flatnonzero(lens)
            out[nz] = np.add.reduceat(prod, rel[:-1][nz])
    return pa.Table.from_arrays(
        [batch["doc_id"].combine_chunks() if isinstance(batch["doc_id"], pa.ChunkedArray)
         else batch["doc_id"],
         pa.array(out, pa.uint64())],
        names=["doc_id", "fingerprint"])


def _len_hist_partial(t: pa.Table) -> pa.Table:
    """One block -> its distinct (source, n_chars) counts (packed-key
    np.unique — the sparse-histogram partial every percentile consumer
    shares)."""
    from logtrics_ray.stages.seriesscan import dict_codes
    empty = pa.table({"source": pa.array([], pa.string()),
                      "n_chars": pa.array([], pa.int64()),
                      "cnt": pa.array([], pa.int64())})
    if t.num_rows == 0:
        return empty
    t = t.combine_chunks()
    codes, labels = dict_codes(t["source"])
    nc = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    if (nc < 0).any() or (nc >= 1 << 32).any():
        raise ValueError("length histogram: n_chars outside [0, 2^32) "
                         "breaks the packed histogram key")
    key = codes.astype(np.int64) * (1 << 32) + nc
    uk, cnt = np.unique(key, return_counts=True)
    return pa.table({
        "source": pa.array(labels[uk >> 32], pa.string()),
        "n_chars": pa.array(uk & 0xFFFFFFFF, pa.int64()),
        "cnt": pa.array(cnt, pa.int64())})


def source_length_bands(doc_path: str, q_lo: float = 0.05,
                        q_hi: float = 0.95) -> dict:
    """Per-source exact [q_lo, q_hi] n_chars quantile band from the
    distributed sparse histogram (no sort).  Quantile = DuckDB's
    quantile_disc convention, 0-based sorted index ceil(q*n)-1,
    evaluated with the identical float multiply — bit-compatible with
    the SQL replays.  Returns {source: (lo, hi)}."""
    from logtrics_ray.sources.parquet import read_parquet_clean

    hist = (read_parquet_clean(doc_path, columns=["source", "n_chars"])
            .map_batches(_len_hist_partial, batch_format="pyarrow")
            .groupby(["source", "n_chars"]).sum("cnt"))
    # the histogram is length-domain-bounded (distinct lengths x
    # sources), independent of corpus size — safe to pull
    h = hist.to_pandas().sort_values(["source", "n_chars"])
    band: dict[str, tuple[int, int]] = {}
    for src, g in h.groupby("source", sort=False):
        c = g["sum(cnt)"].to_numpy(np.int64)
        v = g["n_chars"].to_numpy(np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])
        lo_i = max(int(np.ceil(q_lo * n)) - 1, 0)  # same float multiply
        hi_i = max(int(np.ceil(q_hi * n)) - 1, 0)  # as the SQL replay
        band[str(src)] = (
            int(v[np.searchsorted(cum, lo_i, side="right")]),
            int(v[np.searchsorted(cum, hi_i, side="right")]))
    return band


def doc_len_band_filter_frame(doc_path: str, q_lo: float = 0.05,
                              q_hi: float = 0.95):
    """Per-source DOC-LENGTH BAND FILTER: keep documents whose n_chars
    falls inside the source's [q_lo, q_hi] discrete quantile band — the
    outlier-trim every web-corpus pipeline runs before training (drop
    truncated fragments and boilerplate mega-pages per source, not
    globally, because length distributions differ by source).

    Exact distributed percentiles WITHOUT sorting the data: stage 1
    collapses the corpus to a (source, n_chars) -> count histogram
    (per-batch np.unique partials over dict-coded packed keys, one tiny
    groupby — distinct lengths per source are bounded by the length
    domain, not the corpus size); the driver computes the discrete
    quantile from the histogram's cumulative counts and broadcasts the
    band; stage 2 is a stateless filter + per-batch stats partials.

    The quantile is DuckDB's quantile_disc convention — 0-based sorted
    index ceil(q * n) - 1, evaluated with the identical float multiply
    — so the SQL replay is bit-identical.

    Output: (source, lo, hi, n_kept, n_dropped, sum_chars_kept).
    """
    from logtrics_ray.sources.parquet import read_parquet_clean
    from logtrics_ray.stages.seriesscan import dict_codes

    band = source_length_bands(doc_path, q_lo, q_hi)

    def stats_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"source": pa.array([], pa.string()),
                          "n_kept": pa.array([], pa.int64()),
                          "n_dropped": pa.array([], pa.int64()),
                          "sum_chars_kept": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.combine_chunks()
        codes, labels = dict_codes(t["source"])
        nc = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.array([band[str(s)][0] for s in labels], np.int64)[codes]
        hi = np.array([band[str(s)][1] for s in labels], np.int64)[codes]
        keep = (nc >= lo) & (nc <= hi)
        nsrc = len(labels)
        kept = np.bincount(codes[keep], minlength=nsrc)
        drop = np.bincount(codes[~keep], minlength=nsrc)
        schars = np.zeros(nsrc, np.int64)
        np.add.at(schars, codes[keep], nc[keep])
        return pa.table({
            "source": pa.array(labels, pa.string()),
            "n_kept": pa.array(kept, pa.int64()),
            "n_dropped": pa.array(drop, pa.int64()),
            "sum_chars_kept": pa.array(schars, pa.int64())})

    agg = (read_parquet_clean(doc_path, columns=["source", "n_chars"])
           .map_batches(stats_partial, batch_format="pyarrow")
           .groupby("source")
           .sum(["n_kept", "n_dropped", "sum_chars_kept"]))
    out = agg.to_pandas()
    out = out.rename(columns={"sum(n_kept)": "n_kept",
                              "sum(n_dropped)": "n_dropped",
                              "sum(sum_chars_kept)": "sum_chars_kept"})
    out["lo"] = [band[str(s)][0] for s in out["source"]]
    out["hi"] = [band[str(s)][1] for s in out["source"]]
    return out[["source", "lo", "hi", "n_kept", "n_dropped",
                "sum_chars_kept"]]


def doc_len_band_filter_oracle_sql(q_lo: float = 0.05,
                                   q_hi: float = 0.95) -> str:
    """DuckDB replay: quantile_disc band + filtered aggregates."""
    return f"""
    WITH d AS (SELECT source, n_chars FROM documents),
    q AS (
      SELECT source,
             quantile_disc(n_chars, {q_lo!r}) AS lo,
             quantile_disc(n_chars, {q_hi!r}) AS hi
      FROM d GROUP BY 1)
    SELECT d.source, q.lo, q.hi,
           count(*) FILTER (WHERE n_chars BETWEEN lo AND hi)::BIGINT
             AS n_kept,
           count(*) FILTER (WHERE n_chars < lo OR n_chars > hi)::BIGINT
             AS n_dropped,
           COALESCE(sum(n_chars) FILTER (
             WHERE n_chars BETWEEN lo AND hi), 0)::BIGINT
             AS sum_chars_kept
    FROM d JOIN q USING (source) GROUP BY 1, 2, 3"""
