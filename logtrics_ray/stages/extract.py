"""RuleExtractor — the stateful actor-pool extraction stage.

Reimagines the reference's per-event spine (match -> extract -> handler
-> emit metric points, /root/reference/logtrics.go:176-202) as ONE
vectorized pass over a zero-copy Arrow batch:

  * rule compilation happens once per actor in ``__init__`` — the
    reference compiles each rule's RE2 once at script load
    (/root/reference/parser.go:28-32); here that state is amortized
    across every batch the actor processes.
  * matching + named-group extraction is ``pyarrow.compute.extract_regex``
    (Arrow's regex engine IS RE2 — the same engine as the reference's
    ``regexp`` package), one kernel call per rule per batch.  Non-matching
    rows are silently dropped per rule, mirroring
    /root/reference/logtrics.go:184-188 (debug-log only).
  * only NAMED capture groups survive (/root/reference/parser.go:51-53);
    ``_source`` is carried through like the reserved event key
    (/root/reference/logtrics.go:191).
  * every rule sees every row (fan-out across rules,
    /root/reference/app.go:80-82, script.go:58-62).

Output is the engine's narrow waist — the points table:
  (series_key: string, metric_type: string, ts_ms: int64,
   value: float64, tiebreak: uint64)
Wide columns (``tokens``) never leave this stage, so downstream shuffles
move only ~40 bytes/point.

Per-row invariant vs the reference: token-array equality.  The stage
never rewrites ``tokens``; it additionally *asserts* the row invariant
``n_tok == list_value_length(tokens)`` per batch and counts (does not
throw on) per-row extraction errors — log-and-continue semantics like
/root/reference/script.go:58-61.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from logtrics_ray import vocab as V
from logtrics_ray.config import EngineConfig
from logtrics_ray.hashing import id_hash64_array
from logtrics_ray.rules import RuleSpec, EmitSpec

POINTS_SCHEMA = pa.schema([
    ("series_key", pa.string()),
    ("metric_type", pa.string()),
    ("ts_ms", pa.int64()),
    ("value", pa.float64()),
    ("tiebreak", pa.uint64()),
])

_TEMPLATE_SPLIT = re.compile(r"\{(\w+)\}")


def required_chars(expression: str) -> set[frozenset[str]] | None:
    """Required-character alternatives of ``expression``, or None.

    Literal-factoring prefilter support (same idea as RE2's required
    prefix / Hyperscan literal factoring): walk the regex parse tree and
    collect LITERAL chars that occur unconditionally (top-level sequence,
    capture groups, and repeats with min >= 1).  Branches / classes /
    optional parts contribute nothing — conservative by construction.

    Each element is an *alternative set*: every match must contain at
    least one char from each set.  Case-sensitive literals yield a
    singleton {c}; literals under re.IGNORECASE (global flag or inline
    (?i), where the sre tree still stores the original-case char) yield
    {c.lower(), c.upper()} so case-insensitive rules are never
    over-pruned.
    """
    try:
        import re._parser as sre_parse
        from re._constants import (BRANCH, LITERAL, MAX_REPEAT, MIN_REPEAT,
                                   SUBPATTERN)
        tree = sre_parse.parse(expression)
        global_ci = bool(tree.state.flags & re.IGNORECASE)
    except Exception:
        return None
    chars: set[frozenset[str]] = set()

    def walk(seq, ci: bool):
        for op, arg in seq:
            if op is LITERAL:
                c = chr(arg)
                if ci:
                    chars.add(frozenset({c.lower(), c.upper()}))
                else:
                    chars.add(frozenset({c}))
            elif op is SUBPATTERN:
                _group, add_flags, del_flags, sub = arg
                sub_ci = (ci or bool(add_flags & re.IGNORECASE)) and not bool(
                    del_flags & re.IGNORECASE)
                walk(sub, sub_ci)
            elif op in (MAX_REPEAT, MIN_REPEAT):
                lo, _hi, sub = arg
                if lo >= 1:
                    walk(sub, ci)
            elif op is BRANCH:
                pass  # a char required in EVERY branch would qualify; skip

    walk(tree, global_ci)
    return chars or None


def per_rule_anchor_ids(rules, vocab_pieces) -> list[np.ndarray] | None:
    """Per rule: token ids that can supply the rule's required char.  A
    single char cannot span token pieces, so a row none of whose pieces
    contains rule j's required char cannot match rule j.  Returns None
    (prefilter disabled) unless EVERY rule has a required char.

    NOTE: per-rule regex subsetting was measured SLOWER than running
    every rule's RE2 on the full batch (string take() copies outweigh
    RE2's own internal literal prefiltering), so only the UNION
    (build_anchor_ids) is used, to skip detokenization entirely for
    rows no rule can match."""
    out = []
    for r in rules:
        req = required_chars(r.expression)
        if not req:
            return None
        # the rarest alternative-set (fewest vocab pieces contain any of
        # its chars) prunes best; a row matches an alt-set if any piece
        # contains any char of the set.
        counts = {alt: sum(1 for p in vocab_pieces if any(c in p for c in alt))
                  for alt in req}
        best = min(counts, key=counts.get)
        out.append(np.asarray(
            [i for i, p in enumerate(vocab_pieces) if any(c in p for c in best)],
            dtype=np.int64))
    return out


def build_anchor_ids(rules, vocab_pieces) -> np.ndarray | None:
    """Union of the per-rule anchor sets (the any-rule prefilter)."""
    per_rule = per_rule_anchor_ids(rules, vocab_pieces)
    if per_rule is None:
        return None
    return np.unique(np.concatenate(per_rule)) if per_rule else None


def _render_series(template: str, fields: dict[str, pa.Array], n: int) -> pa.Array:
    """Vectorized series-template rendering: literal/field interleave via
    binary_join_element_wise (no Python per row)."""
    parts = _TEMPLATE_SPLIT.split(template)  # [lit, field, lit, field, ..., lit]
    if len(parts) == 1:
        return pa.array([template] * n, type=pa.string())
    cols = []
    for i, p in enumerate(parts):
        if i % 2 == 0:
            if p:
                cols.append(pa.array([p] * n, type=pa.string()))
        else:
            cols.append(fields[p])
    return pc.binary_join_element_wise(*cols, "")


def _emit_value(spec: EmitSpec, fields: dict[str, pa.Array], n: int) -> pa.Array:
    kind, arg = spec.value
    if kind == "const":
        return pa.array(np.full(n, arg), type=pa.float64())
    if kind == "len":
        return pc.cast(pc.utf8_length(fields[arg]), pa.float64())
    if kind == "cast":
        return pc.cast(fields[arg], pa.float64())
    raise AssertionError(kind)


class RuleExtractor:
    """Callable class for ``map_batches(RuleExtractor, fn_constructor_kwargs=...,
    batch_format="pyarrow", concurrency=N)`` — one actor per replica, state
    built once in ``__init__``."""

    def __init__(self, rules: tuple[RuleSpec, ...], cfg: EngineConfig,
                 text_column: str | None = None,
                 passthrough: tuple[str, ...] = (),
                 tag_rule: bool = False):
        self.rules = rules
        self.cfg = cfg
        self.text_column = text_column
        # tag_rule: append the owning rule's name to every point (the
        # per-rule window-width path needs rule identity downstream).
        # Token-domain plans don't carry rule identity through the fused
        # scan, so tagging forces the classic per-rule text path.
        self.tag_rule = bool(tag_rule)
        # Input columns copied onto every emitted point (row-aligned), e.g.
        # the `_shard` provenance column of the incremental-append path.
        self.passthrough = tuple(passthrough)
        # Detokenization vocab — built once per actor (not per batch).
        self.anchor_table = None
        # Token-domain plans (stages/tokenplan.py): when EVERY rule
        # compiles soundly, matching runs on token ids and detokenize+RE2
        # is paid only for plan-flagged fallback rows.  All-or-nothing so
        # the text leg (needed for any uncompiled rule anyway) isn't
        # duplicated work.
        self.planset = None
        if text_column:
            self.vocab_pa = None
        else:
            pieces = V.build_vocab()
            self.vocab_pa = V.vocab_as_arrow(pieces)
            if (cfg.token_plans and rules and not tag_rule
                    and all(r.handler is None for r in rules)):
                from logtrics_ray.stages import tokenplan as TP
                plans = [TP.compile_rule(r.expression, r.name, pieces)
                         for r in rules]
                if all(p is not None for p in plans):
                    try:
                        self.planset = TP.PlanSet(plans, self.vocab_pa)
                    except OverflowError:
                        self.planset = None  # >64 code bits: text path
            # Literal-factoring prefilter: rows whose pieces can't contain
            # any rule's required char skip detokenize+regex entirely.
            # (Text-path only — plans subsume it exactly.)
            if self.planset is None:
                aid = build_anchor_ids(rules, pieces)
                if aid is not None:
                    self.anchor_table = np.zeros(len(pieces), dtype=bool)
                    self.anchor_table[aid] = True
        # Validate all regexes compile up-front (parser.go:28-31: compile
        # errors are fatal at load, not at match time).
        for r in rules:
            re.compile(r.expression)
        self.rows_in = 0
        self.points_out = 0
        self.row_errors = 0
        # Per-rule error attribution + per-rule tagged logger for handler
        # UDFs (≙ the reference's script:[name] log bindings,
        # /root/reference/logtrics.go:162-173).
        self.rule_errors: dict[str, int] = {r.name: 0 for r in rules}
        from logtrics_ray.rules import RuleLogger
        import inspect
        self._loggers = {
            r.name: RuleLogger(r.name,
                               level=dict(r.logging_conf).get("level"))
            for r in rules}
        self._handler_wants_log = {
            r.name: (r.handler is not None
                     and len(inspect.signature(r.handler).parameters) >= 2)
            for r in rules}

    def _text(self, batch: pa.Table) -> pa.Array:
        if self.text_column:
            col = batch[self.text_column]
            return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return V.detokenize(batch["tokens"], self.vocab_pa)

    def _empty(self, batch: pa.Table) -> pa.Table:
        fields = list(POINTS_SCHEMA)
        if self.tag_rule:
            fields.append(pa.field("rule", pa.string()))
        if not self.passthrough and not self.tag_rule:
            return POINTS_SCHEMA.empty_table()
        fields += [batch.schema.field(c) for c in self.passthrough]
        return pa.schema(fields).empty_table()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        self.rows_in += n
        if n == 0:
            return self._empty(batch)

        if "n_tok" in batch.column_names and "tokens" in batch.column_names:
            # Token-array equality invariant (BASELINE.json input_hint).
            ok = pc.equal(pc.list_value_length(batch["tokens"]),
                          pc.cast(batch["n_tok"], pa.int32()))
            bad = n - pc.sum(pc.cast(ok, pa.int64())).as_py()
            if bad:
                # log-and-continue (script.go:58-61): count, drop nothing —
                # the tokens themselves are still the ground truth.
                self.row_errors += bad

        if self.vocab_pa is not None and "tokens" in batch.column_names:
            def _geom(t):
                """(flat ids, 0-based offsets) — zero-copy int32 view,
                normalized for a possibly-sliced list array."""
                o = t.offsets.to_numpy().astype(np.int64)
                return (t.values.to_numpy(zero_copy_only=False)
                        [o[0]:o[-1]], o - o[0])
            tok = batch["tokens"]
            if isinstance(tok, pa.ChunkedArray):
                tok = tok.combine_chunks()
            flat, offsets = _geom(tok)
            nv = len(self.vocab_pa)
            if flat.size and (int(flat.min()) < 0 or int(flat.max()) >= nv):
                # Malformed rows (ids outside the vocab) would crash the
                # detokenize take(); drop + count them — log-and-continue
                # per-row error policy (script.go:58-61).
                inb = (flat >= 0) & (flat < nv)
                rowid = np.repeat(np.arange(n), np.diff(offsets))
                badrow = np.bincount(rowid[~inb], minlength=n) > 0
                self.row_errors += int(badrow.sum())
                batch = batch.filter(pa.array(~badrow))
                n = batch.num_rows
                if n == 0:
                    return self._empty(batch)
                tok = batch["tokens"].combine_chunks() if isinstance(
                    batch["tokens"], pa.ChunkedArray) else batch["tokens"]
                flat, offsets = _geom(tok)
            if self.planset is not None:
                return self._plan_call(batch, tok, flat, offsets)
            if self.anchor_table is not None:
                rowid = np.repeat(np.arange(n), np.diff(offsets))
                keep = np.bincount(rowid[self.anchor_table[flat]],
                                   minlength=n) > 0
                if not keep.all():
                    batch = batch.filter(pa.array(keep))
                    n = batch.num_rows
                    if n == 0:
                        return self._empty(batch)

        text = self._text(batch)
        doc_ids = batch["doc_id"]
        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        tiebreak_all = id_hash64_array(doc_ids)
        ts_all = (np.int64(self.cfg.epoch0_ms)
                  + (tiebreak_all % np.uint64(self.cfg.horizon_ms)).astype(np.int64))
        source = batch["source"] if "source" in batch.column_names else None
        if isinstance(source, pa.ChunkedArray):
            source = source.combine_chunks()
        pass_cols = {}
        for c in self.passthrough:
            col = batch[c]
            pass_cols[c] = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

        out: list[pa.Table] = []
        for rule in self.rules:
            m = pc.extract_regex(text, rule.expression)
            mask = m.is_valid()
            nv = pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
            if nv == 0:
                continue  # non-match drop path (logtrics.go:184-188)
            mv = m.filter(mask)
            fields = {name: mv.field(name) for name in rule.group_names}
            if source is not None:
                fields["_source"] = source.filter(mask)
            ts = pa.array(ts_all[np.asarray(mask)], type=pa.int64())
            tb = pa.array(tiebreak_all[np.asarray(mask)], type=pa.uint64())
            pfiltered = [(c, col.filter(mask)) for c, col in pass_cols.items()]
            for emit in rule.emits:
                series = _render_series(emit.series, fields, nv)
                value = _emit_value(emit, fields, nv)
                mt = pa.array([emit.metric_type] * nv, type=pa.string())
                t = pa.Table.from_arrays([series, mt, ts, value, tb],
                                         schema=POINTS_SCHEMA)
                if self.tag_rule:
                    t = t.append_column(
                        "rule", pa.array([rule.name] * nv, pa.string()))
                for c, col in pfiltered:
                    t = t.append_column(c, col)
                out.append(t)
            if rule.handler is not None:
                out.append(self._run_handler(rule, fields, ts, tb, nv, pfiltered))

        self.points_out += sum(t.num_rows for t in out)
        if not out:
            return self._empty(batch)
        return pa.concat_tables(out)

    def _plan_call(self, batch: pa.Table, tok: pa.ListArray,
                   flat: np.ndarray, offsets: np.ndarray) -> pa.Table:
        """Token-domain extraction: every rule matches via the fused
        PlanSet scan; detokenize+RE2 runs ONLY for rows some plan flagged
        for text fallback.  Output is bit- and order-identical to the
        text path (per-rule rows in batch order) — asserted by
        tests/test_tokenplan_wiring.py."""
        n = batch.num_rows
        res = self.planset.match(flat, offsets, n)
        fb_union = np.zeros(n, dtype=bool)
        for _rows, _caps, fb in res:
            fb_union |= fb
        fb_idx = np.flatnonzero(fb_union)
        text_sub = None
        if fb_idx.size:
            text_sub = V.detokenize(
                tok.take(pa.array(fb_idx, type=pa.int64())), self.vocab_pa)

        doc_ids = batch["doc_id"]
        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        tiebreak_all = id_hash64_array(doc_ids)
        ts_all = (np.int64(self.cfg.epoch0_ms)
                  + (tiebreak_all % np.uint64(self.cfg.horizon_ms)).astype(np.int64))
        source = batch["source"] if "source" in batch.column_names else None
        if isinstance(source, pa.ChunkedArray):
            source = source.combine_chunks()
        pass_cols = {}
        for c in self.passthrough:
            col = batch[c]
            pass_cols[c] = col.combine_chunks() if isinstance(
                col, pa.ChunkedArray) else col

        out: list[pa.Table] = []
        for rule, plan, (plan_rows, plan_caps, fb) in zip(
                self.rules, self.planset.plans, res):
            if fb.any():
                fbj = np.flatnonzero(fb)
                sel = np.searchsorted(fb_idx, fbj)
                ext = pc.extract_regex(
                    text_sub.take(pa.array(sel, type=pa.int64())),
                    rule.expression)
                tvalid = ext.is_valid()
                trows = fbj[tvalid.to_numpy(zero_copy_only=False)]
                tcaps = ext.filter(tvalid).field(plan.group)
                rows = np.concatenate([plan_rows, trows])
                caps_all = pa.concat_arrays(
                    [plan_caps, tcaps.combine_chunks() if isinstance(
                        tcaps, pa.ChunkedArray) else tcaps])
                order = np.argsort(rows, kind="stable")
                rows = rows[order]
                caps_all = caps_all.take(pa.array(order, type=pa.int64()))
            else:
                rows, caps_all = plan_rows, plan_caps
            nv = rows.size
            if nv == 0:
                continue  # non-match drop path (logtrics.go:184-188)
            idx_pa = pa.array(rows, type=pa.int64())
            fields = {plan.group: caps_all}
            if source is not None:
                fields["_source"] = source.take(idx_pa)
            ts = pa.array(ts_all[rows], type=pa.int64())
            tb = pa.array(tiebreak_all[rows], type=pa.uint64())
            pfiltered = [(c, col.take(idx_pa)) for c, col in pass_cols.items()]
            for emit in rule.emits:
                series = _render_series(emit.series, fields, nv)
                value = _emit_value(emit, fields, nv)
                mt = pa.array([emit.metric_type] * nv, type=pa.string())
                t = pa.Table.from_arrays([series, mt, ts, value, tb],
                                         schema=POINTS_SCHEMA)
                for c, col in pfiltered:
                    t = t.append_column(c, col)
                out.append(t)

        self.points_out += sum(t.num_rows for t in out)
        if not out:
            return self._empty(batch)
        return pa.concat_tables(out)

    def _run_handler(self, rule: RuleSpec, fields: dict[str, pa.Array],
                     ts: pa.Array, tb: pa.Array, nv: int,
                     pfiltered: list = ()) -> pa.Table:
        """Slow-path escape hatch ≙ the Lua handler (logtrics.go:176-202):
        per-row Python callable returning [(metric_type, series, value), ...].
        Documented slow path — per-row Python, use emits when possible."""
        names = list(fields)
        cols = [fields[k].to_pylist() for k in names]
        ts_l, tb_l = ts.to_pylist(), tb.to_pylist()
        s_out, m_out, t_out, v_out, b_out, i_out = [], [], [], [], [], []
        log = self._loggers[rule.name]
        wants_log = self._handler_wants_log[rule.name]
        for i in range(nv):
            event = {k: c[i] for k, c in zip(names, cols)}
            try:
                emitted = (rule.handler(event, log) if wants_log
                           else rule.handler(event)) or []
                for mt, series, value in emitted:
                    s_out.append(series); m_out.append(mt)
                    t_out.append(ts_l[i]); v_out.append(float(value)); b_out.append(tb_l[i])
                    i_out.append(i)
            except Exception:
                # swallow like script.go:58-61, attributed per rule
                self.row_errors += 1
                self.rule_errors[rule.name] += 1
        t = pa.Table.from_arrays(
            [pa.array(s_out, pa.string()), pa.array(m_out, pa.string()),
             pa.array(t_out, pa.int64()), pa.array(v_out, pa.float64()),
             pa.array(b_out, pa.uint64())], schema=POINTS_SCHEMA)
        if self.tag_rule:
            t = t.append_column(
                "rule", pa.array([rule.name] * len(s_out), pa.string()))
        idx = pa.array(i_out, pa.int64())
        for c, col in pfiltered:
            t = t.append_column(c, col.take(idx))
        return t


# Per-worker-process extractor cache for the task-based path: Ray reuses
# worker processes across tasks, so the compiled-rules + vocab state is
# built once per process — the same amortization as an actor's __init__,
# without paying a fresh pool spawn per pipeline execution.
_PROCESS_EXTRACTORS: dict = {}


def _cached_extractor(rules: tuple[RuleSpec, ...], cfg: EngineConfig,
                      text_column: str | None,
                      passthrough: tuple[str, ...] = (),
                      tag_rule: bool = False) -> RuleExtractor:
    key = (rules, cfg, text_column, passthrough, tag_rule)
    ex = _PROCESS_EXTRACTORS.get(key)
    if ex is None:
        ex = _PROCESS_EXTRACTORS[key] = RuleExtractor(rules, cfg, text_column,
                                                      passthrough=passthrough,
                                                      tag_rule=tag_rule)
    return ex


def extract_points(ds, rules: tuple[RuleSpec, ...], cfg: EngineConfig,
                   text_column: str | None = None, use_actors: bool = False,
                   passthrough: tuple[str, ...] = (), tag_rule: bool = False):
    """token/text Dataset -> points Dataset.

    Two physical modes with identical semantics:
      * tasks (default): stateless map tasks + per-process extractor cache.
        Elastic, no pool-spawn latency — fastest on a local cluster where
        worker processes are already warm.
      * actor pool (use_actors=True): the classic stateful-stage shape
        (state in __init__, work in __call__).  On a long-lived multi-node
        cluster the pool amortizes spawn cost over hours of batches; use
        it when extraction state becomes heavy (big vocab, models).
    """
    if use_actors:
        return ds.map_batches(
            RuleExtractor,
            fn_constructor_kwargs=dict(rules=rules, cfg=cfg, text_column=text_column,
                                       passthrough=passthrough,
                                       tag_rule=tag_rule),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=cfg.extract_concurrency,
            num_cpus=1,
        )

    def fn(batch: pa.Table) -> pa.Table:
        return _cached_extractor(rules, cfg, text_column, passthrough,
                                 tag_rule)(batch)

    # batch_size=None: an explicit batch_size on the FIRST map after a
    # read blocks Ray's Read->Map operator fusion (verified empirically:
    # ReadParquet and MapBatches(fn) stay separate operators and the
    # decoded tokens column — the fattest intermediate of the pipeline,
    # ~3.3 GB at sf0.1 vs a ~280 MB exchange — round-trips through the
    # object store between them).  With None, extraction fuses into the
    # read task and consumes each read block zero-copy in-process.
    # Per-task working set stays bounded by the read block planner
    # (~1 block per CPU, <=256 MB on disk per block — sources/parquet.py),
    # not by batch_size; extraction is vectorized and batch-size-invariant
    # (output bits pinned block-layout-invariant in tests).
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
