"""Reference-semantics oracle: single-process, row-at-a-time (SURVEY.md §5).

Deliberately structured like the reference's event loop
(/root/reference/logtrics.go:176-202): iterate rows one at a time,
regex-match each rule (Python ``re`` — an INDEPENDENT engine from the
pyarrow/RE2 kernel the engine uses), update dict-of-accumulator state
keyed by metric name, snapshot per window.  The distributed engine's
output must equal this oracle **bit-for-bit**.

Shared definitions (imported, not reimplemented — they ARE the spec):
  * hash64 / ts synthesis / salt buckets   (logtrics_ray.hashing)
  * the deterministic t-digest             (logtrics_ray.state.tdigest)
  * float window-sum semantics: ``np.add.reduceat`` over the
    (ts, tiebreak, value)-sorted segment; partial merges over salts /
    child windows in ascending order.  (``reduceat`` over a segment is
    invariant to how the segment is embedded in a larger array —
    verified property — so the oracle computes each window
    independently while the engine computes them segmented.)
"""

from __future__ import annotations

import math
import re
from collections import defaultdict

import numpy as np
import pyarrow.parquet as pq

from logtrics_ray.config import TIERS, EngineConfig
from logtrics_ray.hashing import id_hash64
from logtrics_ray.rules import RuleSpec
from logtrics_ray.stages.rollup import PCTL_QS
from logtrics_ray.state.tdigest import TDigest
from logtrics_ray import vocab as V


def _reduce_sum(values: list[float]) -> float:
    return float(np.add.reduceat(np.asarray(values, dtype=np.float64), [0])[0])


# ------------------------------------------------------------- extraction --

def oracle_points(parquet_dir_or_table, rules: tuple[RuleSpec, ...], cfg: EngineConfig,
                  text_column: str | None = None) -> list[tuple]:
    """Row-at-a-time extraction -> list of (series, mtype, ts_ms, value, tiebreak)."""
    if isinstance(parquet_dir_or_table, str):
        import pyarrow.dataset as pads
        table = pads.dataset(parquet_dir_or_table, format="parquet").to_table()
    else:
        table = parquet_dir_or_table
    vocab = V.build_vocab() if text_column is None else None
    compiled = [(r, re.compile(r.expression)) for r in rules]

    points = []
    cols = table.to_pydict()
    n = table.num_rows
    for i in range(n):
        if text_column is None:
            line = "".join(vocab[t] for t in cols["tokens"][i])
        else:
            line = cols[text_column][i]
        doc_id = cols["doc_id"][i]
        tb = id_hash64(doc_id)
        ts = cfg.epoch0_ms + tb % cfg.horizon_ms
        src = cols.get("source", [None] * n)[i]
        for rule, cre in compiled:
            m = cre.search(line)
            if m is None:
                continue  # non-match drop (logtrics.go:184-188)
            fields = m.groupdict()
            if src is not None:
                fields["_source"] = src
            for emit in rule.emits:
                series = emit.series.format(**fields)
                kind, arg = emit.value
                if kind == "const":
                    value = arg
                elif kind == "len":
                    value = float(len(fields[arg]))
                else:
                    value = float(fields[arg])
                points.append((series, emit.metric_type, ts, value, tb))
    return points


# ----------------------------------------------------------------- rollup --

def oracle_core_rollup(points: list[tuple], width_ms: int, cfg: EngineConfig) -> dict:
    """points -> {(series, mtype): {window: core-row dict}} — per-salt
    partials merged in salt order, mirroring rollup.py's definition."""
    groups: dict = defaultdict(lambda: defaultdict(lambda: defaultdict(list)))
    for series, mtype, ts, value, tb in points:
        w = ts - ts % width_ms
        salt = tb % cfg.salt_buckets
        groups[(series, mtype)][w][salt].append((ts, tb, value))

    out: dict = {}
    for key, windows in groups.items():
        mtype = key[1]
        rows = {}
        for w, salts in windows.items():
            partials = []
            for salt in sorted(salts):
                pts = sorted(salts[salt])  # (ts, tb, value) ascending
                vals = [p[2] for p in pts]
                partials.append(dict(
                    salt=salt, count=len(vals), sum=_reduce_sum(vals),
                    vmin=min(vals), vmax=max(vals),
                    last=pts[-1][2], last_ts=pts[-1][0], last_tb=pts[-1][1],
                    digest=(TDigest.from_values(np.array(vals)) if mtype == "timer" else None),
                ))
            count = int(np.add.reduceat(np.array([p["count"] for p in partials], dtype=np.int64), [0])[0])
            vsum = _reduce_sum([p["sum"] for p in partials])
            vmin = min(p["vmin"] for p in partials)
            vmax = max(p["vmax"] for p in partials)
            best = max(partials, key=lambda p: (p["last_ts"], p["last_tb"]))
            digest = (TDigest.merge_all([p["digest"] for p in partials])
                      if mtype == "timer" else None)
            rows[w] = dict(count=count, sum=vsum, vmin=vmin, vmax=vmax,
                           mean=vsum / count, last=best["last"],
                           last_ts=best["last_ts"], last_tb=best["last_tb"],
                           digest=digest,
                           pctls=(digest.quantiles(PCTL_QS) if digest else
                                  np.full(len(PCTL_QS), np.nan)))
        out[key] = rows
    return out


def oracle_cascade(child: dict, parent_width_ms: int) -> dict:
    """Child core rows -> parent core rows; children merge in window order."""
    out: dict = {}
    for key, rows in child.items():
        mtype = key[1]
        parents: dict = defaultdict(list)
        for w in sorted(rows):
            parents[w - w % parent_width_ms].append(rows[w])
        prows = {}
        for pw, kids in parents.items():
            count = int(np.add.reduceat(np.array([k["count"] for k in kids], dtype=np.int64), [0])[0])
            vsum = _reduce_sum([k["sum"] for k in kids])
            vmin = min(k["vmin"] for k in kids)
            vmax = max(k["vmax"] for k in kids)
            best = max(kids, key=lambda k: (k["last_ts"], k["last_tb"]))
            digest = (TDigest.merge_all([k["digest"] for k in kids])
                      if mtype == "timer" else None)
            prows[pw] = dict(count=count, sum=vsum, vmin=vmin, vmax=vmax,
                             mean=vsum / count, last=best["last"],
                             last_ts=best["last_ts"], last_tb=best["last_tb"],
                             digest=digest,
                             pctls=(digest.quantiles(PCTL_QS) if digest else
                                    np.full(len(PCTL_QS), np.nan)))
        out[key] = prows
    return out


# ------------------------------------------------------------------- scan --

def oracle_finalize(core: dict, width_ms: int, cfg: EngineConfig,
                    global_max_w: int | None = None) -> dict:
    """Core rows -> {(series, mtype): {window: final-row dict}} with dense
    windows, gap-fill, cumulative, rate, EWMA — same recurrences as
    stages/seriesscan.py, written row-at-a-time."""
    out: dict = {}
    width_s = width_ms / 1000.0
    for key, rows in core.items():
        mtype = key[1]
        ws = sorted(rows)
        first = ws[0]
        last_w = ws[-1] if global_max_w is None else global_max_w
        dense = list(range(first, last_w + width_ms, width_ms))
        present = {w for w in ws}

        # gauge-style gap fill on `last`
        present_w = np.array(ws, dtype=np.float64)
        present_v = np.array([rows[w]["last"] for w in ws])
        if cfg.gap_fill == "linear":
            filled = np.interp(np.array(dense, dtype=np.float64), present_w, present_v)
            last_fill = {w: float(filled[i]) for i, w in enumerate(dense)}
        elif cfg.gap_fill == "locf":
            last_fill, cur = {}, float("nan")
            for w in dense:
                if w in present:
                    cur = rows[w]["last"]
                last_fill[w] = cur
        else:
            last_fill = {w: (rows[w]["last"] if w in present else float("nan")) for w in dense}

        frows = {}
        cum = 0.0
        rates = []
        for w in dense:
            r = rows.get(w)
            count = r["count"] if r else 0
            vsum = r["sum"] if r else 0.0
            if mtype in ("counter", "meter"):
                cum += vsum
                cumulative = cum
            elif mtype == "timer":
                cum += count
                cumulative = float(cum)
            else:
                cumulative = float("nan")
            if mtype == "meter":
                rate = vsum / width_s
            elif mtype == "timer":
                rate = count / width_s
            else:
                rate = float("nan")
            rates.append(rate)
            frows[w] = dict(
                count=count, sum=vsum,
                vmin=r["vmin"] if r else float("nan"),
                vmax=r["vmax"] if r else float("nan"),
                mean=r["mean"] if r else float("nan"),
                last=last_fill[w],
                pctls=(r["pctls"] if r else np.full(len(PCTL_QS), np.nan)),
                cumulative=cumulative, rate=rate, gap_filled=w not in present)
        if mtype in ("meter", "timer"):
            for tau in cfg.ewma_taus_s:
                alpha = 1.0 - math.exp(-width_s / tau)
                e = rates[0]
                for i, w in enumerate(dense):
                    if i == 0:
                        e = rates[0]
                    else:
                        e = e + alpha * (rates[i] - e)
                    frows[w][f"ewma_{tau}s"] = e
        else:
            for w in dense:
                for tau in cfg.ewma_taus_s:
                    frows[w][f"ewma_{tau}s"] = float("nan")
        out[key] = frows
    return out


def oracle_tiers(source, rules, cfg: EngineConfig, text_column: str | None = None):
    """End-to-end oracle: {tier: finalized dict}; 1h/1d via cascade like the engine."""
    points = oracle_points(source, rules, cfg, text_column=text_column)
    tiers = {}
    core_prev = None
    for tier in cfg.tiers:
        core = (oracle_core_rollup(points, TIERS[tier], cfg) if core_prev is None
                else oracle_cascade(core_prev, TIERS[tier]))
        tiers[tier] = oracle_finalize(core, TIERS[tier], cfg)
        core_prev = core
    return tiers
