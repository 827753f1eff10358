"""End-to-end CORPUS CURATION pipeline — the chain a real
pretraining-data run executes over raw documents, composed from the
engine's own operators:

    quality score >= q_min                 (heuristic filter, stateless)
    -> per-source length band [p5, p95]    (histogram percentiles)
    -> exact dedup (keep-first)            ((hash, id) exchange)
    -> minhash-LSH near-dedup (keep-earliest)
    -> benchmark decontamination           (broadcast gram membership)

Each stage consumes the previous stage's survivor set; the output is a
per-source funnel — how many documents survive each stage — which is
what a curation run actually reports (the curated id set itself is the
final survivor Dataset, exposed for writing).

Scale shape: every decision set that crosses stages is NARROW (doc_id
[+ source] only, materialized); document TEXT is re-read from storage
(pruned columns, streaming) by the stages that need it rather than
materialized between stages — at 100 TB the text never lives in the
object store longer than one stage's window.  The dedup stages inherit
their operators' shuffle shapes (see SCALE.md).

Oracle story: every stage is individually SQL-replayable, so the WHOLE
funnel is one composed DuckDB WITH-chain (`curation_oracle_sql`) —
quality formula, quantile band, keep-first rules (minhash via the
signature side table the gate already writes), and gram recompute,
stage by stage.  The quality filter compares the 6dp-ROUNDED score on
both sides so libm-vs-DuckDB ULP noise in exp/ln can never flip a keep
decision.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

Q_MIN = 0.65          # rounded-quality keep threshold (shared with SQL)
BAND = (0.05, 0.95)   # per-source length band quantiles
BENCH_MOD = 37        # benchmark docs: doc_id % BENCH_MOD == BENCH_RES
BENCH_RES = 5         # (the decontaminate_8gram fixture rule)


def _docs(sf_dir_or_path: str, columns):
    import os

    from logtrics_ray.sources.parquet import read_parquet_clean
    p = sf_dir_or_path
    if os.path.isdir(p) and os.path.exists(
            os.path.join(p, "documents.parquet")):
        p = os.path.join(p, "documents.parquet")
    return p, read_parquet_clean(p, columns=columns)


def curate(sf_dir: str, q_min: float = Q_MIN,
           band: tuple[float, float] = BAND):
    """Run the curation funnel; returns (per-stage narrow id Datasets,
    stats DataFrame).  See module docstring for the stage chain."""
    from logtrics_ray.functions.dedup import (decontaminate, exact_dedup,
                                              minhash_dedup_survivors)
    from logtrics_ray.functions.textstats import (TextStats,
                                                  source_length_bands)
    from logtrics_ray.functions.dedup import process_cached
    from logtrics_ray.pipelines.table_rollup import _round6

    doc_path, ds0 = _docs(sf_dir, ["doc_id", "text", "source", "n_chars"])
    bands = source_length_bands(doc_path, *band)

    # --- stage 1+2: stateless quality + band flags (one pass) ---------
    def flags(t: pa.Table) -> pa.Table:
        from logtrics_ray.stages.seriesscan import dict_codes
        st = process_cached(TextStats).table(t.select(["doc_id", "text"]))
        q = _round6(st["quality"].to_numpy())
        # per-LABEL band lookup + codes gather: O(distinct sources)
        # Python work per batch, never O(rows)
        codes, labels = dict_codes(t["source"])
        lo = np.array([bands[s][0] for s in labels], np.int64)[codes]
        hi = np.array([bands[s][1] for s in labels], np.int64)[codes]
        nc = t["n_chars"].to_numpy()
        return pa.table({
            "doc_id": t["doc_id"],
            "source": t["source"],
            "q_ok": pa.array(q >= q_min, pa.bool_()),
            "band_ok": pa.array((nc >= lo) & (nc <= hi), pa.bool_()),
        })

    fl = ds0.map_batches(flags, batch_format="pyarrow").materialize()

    def _ids(ds):
        return ds.select_columns(["doc_id"])

    def _mask(col):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            m = t[col[0]]
            for c in col[1:]:
                m = pc.and_(m, t[c])
            return t.filter(m)
        return fn

    w_quality = fl.map_batches(_mask(["q_ok"]),
                               batch_format="pyarrow").materialize()
    w_band = fl.map_batches(_mask(["q_ok", "band_ok"]),
                            batch_format="pyarrow").materialize()

    # --- stage 3: exact dedup within the band survivors ---------------
    _, text_ds = _docs(sf_dir, ["doc_id", "text"])
    from logtrics_ray.functions.dedup import (_default_join_partitions,
                                              _schema_stable)
    P = _default_join_partitions()

    def _join_text(ids_ds):
        # id sets are aggregation-bounded; _schema_stable compacts away
        # empty blocks (Ray 2.49 join schema-broadcast race)
        stable, _ = _schema_stable(ids_ds.select_columns(["doc_id"]), P)
        return text_ds.join(stable, join_type="inner", num_partitions=P,
                            on=("doc_id",), right_on=("doc_id",))

    w_exact = exact_dedup(_join_text(w_band)).materialize()

    # --- stage 4: minhash near-dedup within the exact survivors -------
    w_minhash = minhash_dedup_survivors(_join_text(w_exact)).materialize()

    # --- stage 5: decontamination (benchmark from the FULL corpus) ----
    # The benchmark slice is carved out of the corpus itself, so its
    # gram set is built DISTRIBUTED (per-batch distinct gram hashes ->
    # driver union -> one ray.put broadcast): the driver pull is
    # gram-set-bounded, never corpus-bounded.
    from logtrics_ray.functions.dedup import benchmark_gram_hashes_ds

    def _bench_filter(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()          # no modulo kernel in Arrow 16
        return t.filter(pa.array(ids % BENCH_MOD == BENCH_RES))

    _, bench_src = _docs(sf_dir, ["doc_id", "text"])    # pruned re-read
    bench_ds = bench_src.map_batches(_bench_filter, batch_format="pyarrow")
    bench_grams = benchmark_gram_hashes_ds(bench_ds, n=8)
    flagged = decontaminate(_join_text(w_minhash), n=8,
                            benchmark_grams=bench_grams)

    def not_contam(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.invert(t["contaminated"])).select(["doc_id"])

    w_clean = (flagged.map_batches(not_contam, batch_format="pyarrow")
               .materialize())

    stages = {"input": _ids(fl), "quality": _ids(w_quality),
              "band": _ids(w_band), "exact": w_exact,
              "minhash": w_minhash, "clean": w_clean}
    return stages, curation_stats_frame(fl, stages)


def curation_stats_frame(fl, stages) -> pd.DataFrame:
    """Per-source funnel counts: each stage's NARROW id set joins back
    to the (doc_id, source) flag frame and aggregates distributed — the
    driver only ever sees per-source counts (sources-bounded)."""
    from logtrics_ray.functions.dedup import _default_join_partitions
    P = _default_join_partitions()
    src = fl.select_columns(["doc_id", "source"])

    def counts(ids_ds) -> dict:
        from logtrics_ray.functions.dedup import _schema_stable
        stable, n = _schema_stable(ids_ds.select_columns(["doc_id"]), P)
        if n == 0:
            return {}
        j = src.join(stable, join_type="inner", num_partitions=P,
                     on=("doc_id",), right_on=("doc_id",))
        return {r["source"]: r["count()"]
                for r in j.groupby("source").count().take_all()}

    base = {r["source"]: r["count()"]
            for r in src.groupby("source").count().take_all()}
    out = pd.DataFrame({"source": sorted(base)})
    out["n_input"] = out["source"].map(base).astype(np.int64)
    for name in ("quality", "band", "exact", "minhash", "clean"):
        m = counts(stages[name])
        out[f"n_{name}"] = (out["source"].map(m).fillna(0)
                            .astype(np.int64))
    return out.reset_index(drop=True)


def curation_oracle_sql(sig_dir: str, q_min: float = Q_MIN,
                        band: tuple[float, float] = BAND) -> str:
    """One composed DuckDB WITH-chain replaying the WHOLE funnel:
    quality (same formula as the text_quality oracle, 6dp-rounded
    before the threshold), quantile_disc band, keep-first by text,
    minhash keep-earliest from the signature side table restricted to
    the working set, gram-recompute decontamination.  The funnel counts
    per source must match the engine's stage-by-stage survivors
    exactly."""
    q_lo, q_hi = band
    return rf"""
    WITH s AS (
      SELECT doc_id,
             length(text) AS n_chars_t,
             len(regexp_extract_all(text, '\S+')) AS n_words,
             len(list_filter(regexp_extract_all(text, '\S+'),
                 w -> list_contains(['the','a','an','and','or','of',
                   'to','in','is','are','was','were','be','been','it',
                   'this','that','for','on','with','as','by','at',
                   'from','not','but','have','has','had','they','you',
                   'we','he','she','i'], lower(w)))) AS n_stop,
             len(regexp_extract_all(text, '[^A-Za-z0-9_\s]')) AS n_punct,
             len(regexp_extract_all(text, '\s')) AS n_ws
      FROM documents),
    d AS (
      SELECT doc_id,
             CASE WHEN n_words > 0
                  THEN n_stop / CAST(n_words AS DOUBLE) ELSE 0.0
             END AS stopword_ratio,
             CASE WHEN n_chars_t > 0
                  THEN n_punct / CAST(greatest(n_chars_t, 1) AS DOUBLE)
                  ELSE 0.0 END AS punct_ratio,
             CASE WHEN n_words > 0
                  THEN (n_chars_t - n_ws)
                       / CAST(greatest(n_words, 1) AS DOUBLE)
                  ELSE 0.0 END AS mean_word_len,
             n_words
      FROM s),
    q AS (
      SELECT doc_id,
             round(least(greatest(
               0.35 * least(greatest(ln(1.0 + n_words) / ln(201.0),
                                     0.0), 1.0)
               + 0.25 * least(stopword_ratio / 0.4, 1.0)
               + 0.25 * exp(-0.5 * ((mean_word_len - 5.0) / 3.0)
                                  * ((mean_word_len - 5.0) / 3.0))
               + 0.15 * (1.0 - least(punct_ratio / 0.3, 1.0)),
               0.0), 1.0), 6) AS quality
      FROM d),
    qpass AS (
      SELECT doc_id FROM q WHERE quality >= {q_min!r}),
    bandq AS (
      SELECT source, quantile_disc(n_chars, {q_lo!r}) AS lo,
             quantile_disc(n_chars, {q_hi!r}) AS hi
      FROM documents GROUP BY 1),
    bpass AS (
      SELECT d.doc_id FROM documents d
      JOIN qpass USING (doc_id)
      JOIN bandq b USING (source)
      WHERE d.n_chars BETWEEN b.lo AND b.hi),
    epass AS (
      SELECT doc_id FROM (
        SELECT d.doc_id, d.text FROM documents d JOIN bpass USING (doc_id))
      QUALIFY doc_id = min(doc_id) OVER (PARTITION BY text)),
    bands AS (
      SELECT s.* FROM read_parquet('{sig_dir}/minhash_bands.parquet') s
      JOIN epass USING (doc_id)),
    bmins AS (SELECT band_id, band_hash, min(doc_id) AS bm
              FROM bands GROUP BY 1, 2),
    pd AS (SELECT b.doc_id, min(m.bm) AS mn
           FROM bands b JOIN bmins m USING (band_id, band_hash)
           GROUP BY 1),
    mpass AS (SELECT doc_id FROM pd WHERE doc_id = mn),
    w AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                         x -> x <> '') AS ws
      FROM documents),
    g AS (
      SELECT doc_id,
             CASE WHEN len(ws) = 0 THEN []
                  WHEN len(ws) < 8 THEN [array_to_string(ws, ' ')]
                  ELSE [array_to_string(ws[i:i+7], ' ')
                        FOR i IN generate_series(1, len(ws) - 7)]
             END AS gs
      FROM w),
    gu AS (SELECT DISTINCT doc_id, unnest(gs) AS gram FROM g),
    bench AS (SELECT DISTINCT gram FROM gu
              WHERE doc_id % {BENCH_MOD} = {BENCH_RES}),
    hits AS (SELECT gu.doc_id, count(*) AS n_hits
             FROM gu JOIN bench USING (gram) GROUP BY 1),
    cpass AS (
      SELECT m.doc_id FROM mpass m LEFT JOIN hits h USING (doc_id)
      WHERE COALESCE(h.n_hits, 0) = 0)
    SELECT d.source,
           count(*)::BIGINT AS n_input,
           count(qp.doc_id)::BIGINT AS n_quality,
           count(bp.doc_id)::BIGINT AS n_band,
           count(ep.doc_id)::BIGINT AS n_exact,
           count(mp.doc_id)::BIGINT AS n_minhash,
           count(cp.doc_id)::BIGINT AS n_clean
    FROM documents d
    LEFT JOIN qpass qp USING (doc_id)
    LEFT JOIN bpass bp USING (doc_id)
    LEFT JOIN epass ep USING (doc_id)
    LEFT JOIN mpass mp USING (doc_id)
    LEFT JOIN cpass cp USING (doc_id)
    GROUP BY 1"""
