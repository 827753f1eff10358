"""Tests for the training-data operators (SURVEY.md §2.10 T2-T13).

Each non-SQL-checkable operator gets its pytest oracle here: brute-force
python equivalence for the dedup family, recall bounds for approximate
similarity, determinism + formula checks for text analysis, and
plumbing/stub contracts for multimodal.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


def _doc_table() -> tuple[pa.Table, dict[int, str]]:
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest to hide from every hunter")
    alt = ("completely different text about distributed rollup engines and "
           "columnar arrow batches streaming through a ray data pipeline")
    docs = {
        0: base,
        1: base,                                   # exact dup of 0
        2: base + " tonight",                      # near-dup of 0
        3: alt,
        4: alt.replace("columnar", "chunked"),     # near-dup of 3
        5: "zebra quartz violin nebula marble obsidian harp",
    }
    t = pa.Table.from_arrays(
        [pa.array(list(docs), pa.int64()),
         pa.array([docs[k] for k in docs], pa.string())],
        names=["doc_id", "text"])
    return t, docs


def test_minhash_dedup_drops_near_dups():
    from logtrics_ray.functions.dedup import minhash_dedup_survivors
    t, _ = _doc_table()
    got = sorted(r["doc_id"] for r in minhash_dedup_survivors(rd.from_arrow(t)).take_all())
    assert 0 in got and 3 in got and 5 in got
    assert 1 not in got            # exact dup always caught
    assert 2 not in got            # near-dup: one-word suffix


def test_simhash_dedup_buckets_exact_dups():
    from logtrics_ray.functions.dedup import simhash_dedup
    t, _ = _doc_table()
    got = sorted(r["doc_id"] for r in simhash_dedup(rd.from_arrow(t), mask_bits=4).take_all())
    assert 0 in got and 1 not in got     # identical text -> identical simhash
    assert 3 in got and 5 in got


def test_text_quality_deterministic_and_ordered():
    from logtrics_ray.functions.textstats import TextStats
    t, docs = _doc_table()
    soup = pa.Table.from_arrays(
        [pa.array([90], pa.int64()), pa.array(["!!! ## $$ %% ^^ && ** (( ))"])],
        names=["doc_id", "text"])
    full = pa.concat_tables([t, soup])
    a = rd.from_arrow(full).map_batches(TextStats, batch_format="pandas",
                                        concurrency=2).to_pandas().set_index("doc_id")
    b = rd.from_arrow(full).map_batches(TextStats, batch_format="pandas",
                                        concurrency=2).to_pandas().set_index("doc_id")
    assert (a.sort_index() == b.sort_index()).all().all()       # deterministic
    assert ((a["quality"] >= 0) & (a["quality"] <= 1)).all()
    assert a.loc[0, "quality"] > a.loc[90, "quality"]           # prose > punct soup
    assert a.loc[0, "stopword_ratio"] > a.loc[5, "stopword_ratio"]
    assert a.loc[90, "punct_ratio"] > a.loc[0, "punct_ratio"]


def test_lang_id_markers():
    from logtrics_ray.functions.textstats import LangId
    rows = {
        10: ("en", "the cat and the dog sat in the garden and looked to the sky"),
        11: ("de", "der hund und die katze sind nicht im garten das ist gut"),
        12: ("fr", "le chien et la maison les arbres des fleurs est grand"),
        13: ("es", "el perro de la casa que corre los campos una mesa"),
        14: ("und", "zxq wvplk mnbft aaa bbb ccc"),
    }
    t = pa.Table.from_arrays(
        [pa.array(list(rows), pa.int64()),
         pa.array([v[1] for v in rows.values()], pa.string())],
        names=["doc_id", "text"])
    got = rd.from_arrow(t).map_batches(LangId, batch_format="pandas",
                                       concurrency=2).to_pandas().set_index("doc_id")
    for did, (lang, _) in rows.items():
        assert got.loc[did, "lang_pred"] == lang


def test_fingerprint_matches_formula_and_is_stable():
    from logtrics_ray.functions.textstats import _POLY_P, fingerprint_batch
    t, docs = _doc_table()
    out = fingerprint_batch(t).to_pandas().set_index("doc_id")["fingerprint"]
    # direct (slow) recomputation of h(doc) = sum byte_i * P^(n-1-i) mod 2^64
    for did, text in docs.items():
        h = np.uint64(0)
        with np.errstate(over="ignore"):
            for byte in text.encode():
                h = h * _POLY_P + np.uint64(byte)
        assert np.uint64(out[did]) == h
    assert out[0] == out[1]          # identical text, identical fingerprint
    assert out[0] != out[3]


def test_knn_ivf_recall_vs_bruteforce():
    from logtrics_ray.functions.similarity import knn_bruteforce, knn_ivf
    rng = np.random.default_rng(3)
    # clustered corpus: IVF probes should capture most true neighbors
    centers = rng.normal(size=(8, 16))
    vecs = np.concatenate([c + 0.1 * rng.normal(size=(64, 16)) for c in centers])
    ids = np.arange(vecs.shape[0])
    t = pa.Table.from_arrays(
        [pa.array(ids, pa.int64()),
         pa.array(list(vecs.astype(np.float32)), pa.list_(pa.float32()))],
        names=["vec_id", "embedding"])
    ds = rd.from_arrow(t)
    q = [0, 100, 300]
    exact = knn_bruteforce(ds, q, k=5)
    approx = knn_ivf(ds, q, k=5, n_centroids=8, nprobe=3)
    recalls = []
    for qid in q:
        e = set(exact.loc[exact.query_id == qid, "neighbor_id"])
        a = set(approx.loc[approx.query_id == qid, "neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.8


def _embedding_corpus(n=400, dim=12, dup_rate=0.15, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, dim))
    # plant near-dups: scaled + tiny-noise copies of earlier rows
    n_dup = int(n * dup_rate)
    src = rng.integers(0, n - n_dup, size=n_dup)
    base[n - n_dup:] = base[src] * 1.7 + 0.01 * rng.normal(size=(n_dup, dim))
    t = pa.Table.from_arrays(
        [pa.array(np.arange(n), pa.int64()),
         pa.array(list(base.astype(np.float32)), pa.list_(pa.float32()))],
        names=["vec_id", "embedding"])
    return t, base


def test_embedding_dedup_exact_matches_bruteforce():
    from logtrics_ray.functions.similarity import (_norm_rows,
                                                   embedding_dedup_survivors)
    t, base = _embedding_corpus()
    thr = 0.98
    # repartition forces MULTIPLE blocks -> exercises cross-block pairs
    ds = rd.from_arrow(t).repartition(6)
    got = sorted(r["vec_id"] for r in
                 embedding_dedup_survivors(ds, threshold=thr).take_all())
    m = _norm_rows(np.asarray(
        t["embedding"].combine_chunks().values.to_numpy().reshape(len(t), -1),
        dtype=np.float64))
    s = m @ m.T
    expect = [v for v in range(len(t))
              if not any(s[u, v] >= thr for u in range(v))]
    assert got == expect
    assert len(got) < len(t)        # planted dups actually dropped


def test_embedding_dedup_lsh_recall():
    """LSH variant: identical survivors on the planted high-cosine dups
    (recall >= 0.9 against the exact kernel at threshold 0.98)."""
    from logtrics_ray.functions.similarity import (embedding_dedup_lsh,
                                                   embedding_dedup_survivors)
    t, _ = _embedding_corpus()
    ds = rd.from_arrow(t)
    exact = set(r["vec_id"] for r in
                embedding_dedup_survivors(ds, threshold=0.98).take_all())
    lsh = set(r["vec_id"] for r in
              embedding_dedup_lsh(ds, threshold=0.98, n_planes=10).take_all())
    dropped_exact = set(range(len(t))) - exact
    dropped_lsh = set(range(len(t))) - lsh
    assert dropped_lsh <= dropped_exact          # LSH never over-drops
    recall = (len(dropped_lsh & dropped_exact) / len(dropped_exact)
              if dropped_exact else 1.0)
    assert recall >= 0.9


def test_pairwise_dropped_chunked_matches_dense():
    """The block-pair in-bucket verify (hot-bucket defense) is bit-equal
    to the dense score-matrix rule at every block size."""
    from logtrics_ray.functions.similarity import _norm_rows, _pairwise_dropped
    rng = np.random.default_rng(3)
    n, dim, thr = 500, 6, 0.9
    m = rng.normal(size=(n, dim))
    m[250:] = m[rng.integers(0, 250, size=250)] + 0.02 * rng.normal(size=(250, dim))
    m = _norm_rows(m)
    ids = rng.permutation(n).astype(np.int64)
    s = m @ m.T
    dense = ((s >= thr) & np.less.outer(ids, ids)).any(axis=0)
    for block in (7, 64, 500, 4096):
        got = _pairwise_dropped(ids, m, thr, block=block)
        assert (got == dense).all(), block


def test_embedding_dedup_lsh_hot_bucket_bounded():
    """Degenerate corpus: 30k near-identical vectors all landing in ONE
    LSH bucket.  A dense in-bucket verify would allocate a 30k x 30k
    score matrix (7.2 GB); the block-pair path completes under a bounded
    heap and keeps (essentially) only the earliest id."""
    from logtrics_ray.functions.similarity import embedding_dedup_lsh
    rng = np.random.default_rng(11)
    n, dim = 30_000, 8
    base = rng.normal(size=dim)
    m = base + 1e-4 * rng.normal(size=(n, dim))
    t = pa.Table.from_arrays(
        [pa.array(np.arange(n), pa.int64()),
         pa.array(list(m.astype(np.float32)), pa.list_(pa.float32()))],
        names=["vec_id", "embedding"])
    kept = embedding_dedup_lsh(rd.from_arrow(t), threshold=0.98,
                               n_planes=10, verify_block=1024).take_all()
    kept_ids = sorted(r["vec_id"] for r in kept)
    assert kept_ids[0] == 0            # earliest always survives
    assert len(kept_ids) < 50          # hot bucket actually deduped


def test_multimodal_real_codecs_roundtrip_and_features():
    """PPM and WAV codec paths are REAL: byte-exact round-trip and
    features recomputed independently from the raw planes."""
    from logtrics_ray.functions.multimodal import (MediaDecoder, decode_ppm,
                                                   decode_media_features,
                                                   decode_wav_pcm16,
                                                   encode_ppm,
                                                   encode_wav_pcm16,
                                                   resize_media,
                                                   resize_nearest,
                                                   synth_real_media_table)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    small = resize_nearest(img, 8, 5)
    assert small.shape == (5, 8, 3)
    assert small[0, 0].tolist() == img[0, 0].tolist()   # corner preserved

    sig = 0.4 * np.sin(2 * np.pi * 440 * np.arange(1600) / 8000)
    x, rate = decode_wav_pcm16(encode_wav_pcm16(sig, 8000))
    assert rate == 8000 and x.size == 1600
    assert np.abs(x - sig).max() < 1e-3                # 16-bit quantization

    t = synth_real_media_table(40)
    feats = decode_media_features(rd.from_arrow(t)).to_pandas() \
        .set_index("media_id")
    assert feats["decoded"].all()
    # independent recomputation for one image and one audio row
    dec = MediaDecoder()
    for i in (0, 1, 2):    # PNG, WAV, PPM rows
        row = t.slice(i, 1)
        exp = dec._features(row["media_type"][0].as_py(),
                            row["payload"][0].as_py())
        got = np.asarray(feats.loc[f"med-{i:08d}", "feature"], dtype=np.float64)
        assert np.allclose(got, exp.astype(np.float32))
    img2 = decode_ppm(t["payload"][2].as_py())
    f2 = np.asarray(feats.loc["med-00000002", "feature"], dtype=np.float64)
    assert f2[0] == img2.shape[1] and f2[1] == img2.shape[0]
    assert abs(f2[2] - img2[..., 0].mean()) < 1e-3

    # real resize -> re-decode: every image (PPM and PNG) now 24x24,
    # audio untouched
    resized = decode_media_features(
        resize_media(rd.from_arrow(t), 24, 24)).to_pandas().set_index("media_id")
    img_rows = resized["media_type"].isin(
        ["image/x-portable-pixmap", "image/png"])
    assert img_rows.sum() == 20
    w = np.stack(resized.loc[img_rows, "feature"])[:, :2]
    assert (w == 24).all()
    # unknown media type raises loudly in strict mode
    with pytest.raises(NotImplementedError):
        dec._features("image/jpeg", b"\xff\xd8\xff")


def test_png_codec_roundtrip_all_filters():
    """The stdlib PNG codec is REAL: byte-exact round-trip under every
    scanline filter, CRC verification, and interop of the filter paths
    (an image encoded with Paeth decodes identically to one encoded with
    None)."""
    from logtrics_ray.functions.multimodal import decode_png, encode_png
    rng = np.random.default_rng(3)
    for shape in ((1, 1, 3), (7, 5, 3), (33, 48, 3)):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for ft in range(5):
            assert (decode_png(encode_png(img, filter_type=ft)) == img).all(), \
                (shape, ft)
    # gradient image (the synth corpus shape) survives too
    grad = np.linspace(0, 255, 40, dtype=np.float64)[None, :, None]
    img = (grad + rng.integers(0, 64, size=(24, 40, 3))).clip(0, 255) \
        .astype(np.uint8)
    assert (decode_png(encode_png(img)) == img).all()
    # corrupting a payload byte breaks the CRC loudly
    p = bytearray(encode_png(img))
    p[60] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|IDAT|IHDR"):
        decode_png(bytes(p))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"P6\n1 1\n255\nxxx")


def test_multimodal_stub_contracts():
    from logtrics_ray.functions.multimodal import (ImageDecodeStub, ResizeStub,
                                                   decode_features,
                                                   synth_media_table)
    t = synth_media_table(50)
    feats = decode_features(rd.from_arrow(t), fake=True).to_pandas()
    assert len(feats) == 50
    assert all(len(f) == ImageDecodeStub.FEATURE_DIM for f in feats["feature"])
    feats2 = decode_features(rd.from_arrow(t), fake=True).to_pandas()
    assert (feats.sort_values("media_id")["feature"].map(tuple).to_numpy()
            == feats2.sort_values("media_id")["feature"].map(tuple).to_numpy()).all()
    # real codec path is a clearly-marked stub
    with pytest.raises(NotImplementedError):
        ImageDecodeStub(fake=False)._decode_one(b"px")
    resized = rd.from_arrow(t).map_batches(
        ResizeStub, fn_constructor_kwargs=dict(fake=True, target=128),
        batch_format="pyarrow", batch_size=16, concurrency=2).to_pandas()
    assert (resized["meta_width"] == 128).all()
    assert resized["payload"].map(len).max() <= 128


def test_broadcast_enrich_and_retention():
    from logtrics_ray.stages.enrich import apply_retention, broadcast_enrich
    t = pa.Table.from_arrays([
        pa.array(["a", "b", "c", "a"], pa.string()),
        pa.array([100, 200, 300, 400], pa.int64()),
    ], names=["series_key", "window_start"])
    ds = rd.from_arrow(t)
    dim = {"a": {"policy": "hot"}, "b": {"policy": "cold"}}
    got = broadcast_enrich(ds, dim).to_pandas().sort_values(
        ["series_key", "window_start"]).reset_index(drop=True)
    assert list(got["policy"]) == ["hot", "hot", "cold", None]

    # retention: horizon_end=500; a keeps 150ms (>=350), b keeps 400 (>=100),
    # c unlisted with default 250 (>=250)
    kept = apply_retention(rd.from_arrow(t), {"a": 150, "b": 400}, 500,
                           default_ms=250).to_pandas()
    kept_pairs = sorted(zip(kept["series_key"], kept["window_start"]))
    assert kept_pairs == [("a", 400), ("b", 200), ("c", 300)]

    # no default: unlisted series keep everything
    kept2 = apply_retention(rd.from_arrow(t), {"a": 150}, 500).to_pandas()
    assert len(kept2) == 3 and ("a", 100) not in set(
        zip(kept2["series_key"], kept2["window_start"]))


def test_y4m_codec_roundtrip_and_frame_sample(ray_session):
    """Real video path: Y4M encode/decode is byte-exact; frame-sampling
    keeps exactly indices 0, step, 2*step, ...; features of the sampled
    clip recomputed independently from the generator's raw planes."""
    import numpy as np
    import ray.data as rd

    from logtrics_ray.functions.multimodal import (MediaDecoder, decode_y4m,
                                                   decode_media_features,
                                                   encode_y4m, sample_frames,
                                                   synth_video_arrays,
                                                   synth_video_table)

    clips = dict(synth_video_arrays(12))
    # codec round-trip: frames and fps survive encode -> decode exactly
    for mid, clip in clips.items():
        rt, fps = decode_y4m(encode_y4m(clip, fps=30))
        assert fps == 30 and rt.shape == clip.shape
        assert (rt == clip).all()

    t = synth_video_table(12)
    sampled = sample_frames(rd.from_arrow(t), step=4).take_all()
    for row in sampled:
        frames, fps = decode_y4m(row["payload"])
        truth = clips[row["media_id"]][::4]
        assert frames.shape == truth.shape and (frames == truth).all()

    feats = {r["media_id"]: np.asarray(r["feature"])
             for r in decode_media_features(
                 sample_frames(rd.from_arrow(t), step=4)).take_all()}
    for mid, clip in clips.items():
        sub = clip[::4].astype(np.float64)
        exp = [sub.shape[0], sub.shape[2], sub.shape[1],
               sub[..., 0].mean(), sub[..., 0].std(),
               sub[..., 1].mean(), sub[..., 2].mean(), 25.0]
        np.testing.assert_allclose(feats[mid], exp, rtol=0, atol=0)


def test_pack_sequences_matches_scalar_reference(ray_session, t1_dir):
    """Distributed packing == the obvious single-process loop: sort all
    docs by (h, doc_id), concatenate, chunk — EXACT token content per
    bin, not just stats.  bucket_bits=8 makes most buckets smaller than
    seq_len, so bins span 3+ buckets and the fragment merge is exercised
    hard; bucket_bits=3 exercises the mostly-complete-bins path."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    from logtrics_ray.functions.packing import pack_sequences
    from logtrics_ray.hashing import id_hash64_array

    t = pq.read_table(sorted(glob.glob(f"{t1_dir}/*.parquet")),
                      columns=["doc_id", "tokens"])
    doc_ids = t["doc_id"].to_pylist()
    h = id_hash64_array(t["doc_id"])
    order = sorted(range(len(doc_ids)), key=lambda i: (h[i], doc_ids[i]))
    toks = t["tokens"].to_pylist()
    stream = np.concatenate([np.asarray(toks[i], dtype=np.int32)
                             for i in order])
    L = 512
    want = {b: stream[b * L:(b + 1) * L].tolist()
            for b in range(-(-len(stream) // L))}

    for bits in (8, 3):
        got = pack_sequences(t1_dir, seq_len=L, bucket_bits=bits).to_pandas()
        assert len(got) == len(want)
        assert got.bin_id.is_unique
        for b, row_toks in zip(got.bin_id, got.tokens):
            assert list(row_toks) == want[int(b)], f"bin {b} (bits={bits})"
        # n_docs: docs overlapping each bin, from the same scalar stream
        bounds = np.cumsum([len(toks[i]) for i in order])
        starts = np.concatenate(([0], bounds[:-1]))
        nd = {int(b): 0 for b in want}
        for s, e in zip(starts, bounds):
            if e > s:
                for b in range(s // L, (e - 1) // L + 1):
                    nd[b] += 1
        got_nd = dict(zip(got.bin_id.astype(int), got.n_docs.astype(int)))
        assert got_nd == nd


def test_sample_mix_deterministic_and_rate_correct(ray_session, t1_dir):
    """Hash sampling: the kept set equals a per-doc scalar recompute of
    the threshold rule, reruns are identical, unknown sources drop, and
    the empirical rate lands near the nominal one."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    from logtrics_ray.functions.packing import (SAMPLE_BITS, _sample_key,
                                                sample_mix,
                                                sample_thresholds)

    rates = {"web": 0.5, "books": 1.0, "wiki": 0.0}   # code absent -> drop
    got = sample_mix(t1_dir, rates).to_pandas()
    got2 = sample_mix(t1_dir, rates).to_pandas()
    assert sorted(got.doc_id) == sorted(got2.doc_id)

    t = pq.read_table(sorted(glob.glob(f"{t1_dir}/*.parquet")),
                      columns=["doc_id", "source"])
    key = _sample_key(t["doc_id"])
    thr = sample_thresholds(rates)
    src = np.asarray(t["source"].to_pylist())
    lim = np.array([thr.get(s, 0) for s in src], dtype=np.int64)
    want = set(np.asarray(t["doc_id"].to_pylist())[key < lim])
    assert set(got.doc_id) == want

    books = src == "books"
    assert (key[books] < thr["books"]).all()          # rate 1.0 keeps all
    assert not set(got[got.source == "wiki"].doc_id)  # rate 0.0 drops all
    assert "code" not in set(got.source)
    web_total = int((src == "web").sum())
    web_kept = int((got.source == "web").sum())
    assert abs(web_kept / web_total - 0.5) < 0.05
    assert got.skey.max() < (1 << SAMPLE_BITS)


def test_pack_sequences_zero_length_docs(ray_session, tmp_path):
    """Zero-length documents occupy no tokens and no bins (and must not
    crash the bucket packer even when a whole bucket is empty docs)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from logtrics_ray.functions.packing import (pack_sequences,
                                                pack_stats_frame)

    rng = np.random.default_rng(3)
    docs = []
    for i in range(200):
        n = 0 if i % 3 == 0 else int(rng.integers(1, 40))
        docs.append((f"d{i:04d}", rng.integers(0, 100, n).astype(np.int32)))
    t = pa.table({
        "doc_id": [d for d, _ in docs],
        "tokens": pa.array([list(v) for _, v in docs], pa.list_(pa.int32())),
        "n_tok": pa.array([len(v) for _, v in docs], pa.int32()),
        "source": ["web"] * len(docs),
    })
    d = tmp_path / "zl"
    d.mkdir()
    pq.write_table(t, str(d / "part-00000.parquet"))
    # high bucket_bits: many buckets; some will hold only empty docs
    packed = pack_sequences(str(d), seq_len=64, bucket_bits=8)
    stats = pack_stats_frame(packed).to_pandas()
    total = sum(len(v) for _, v in docs)
    assert stats.n_tok.sum() == total
    assert len(stats) == -(-total // 64)
    assert stats.bin_id.is_unique


def test_ascii_text_counts_matches_regex_path():
    """Byte-level vectorized text counts == the per-row regex path on
    nasty ASCII corpora (the fast path the quality/stats operators take);
    non-ASCII input returns None (fallback trigger)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from logtrics_ray.functions.textstats import (TextStats,
                                                  ascii_text_counts)

    texts = [
        "", " ", "a", "The the THE tHe!", "  leading and trailing  ",
        "punct... soup!!! ###", "under_score is one word_",
        "digits 123 mixed12words 45x", "tabs\tand\nnewlines\r\nhere",
        "a.b,c;d:e", "I i bE Been been at AT At", "x" * 500,
        "word " * 300, "!@#$%^&*()_+", "this is a test of the system",
    ]
    ts = TextStats()
    fast = ascii_text_counts(pa.array(texts, pa.string()))
    slow = ts._regex_counts(pd.Series(texts))
    assert fast is not None
    for k in slow:
        np.testing.assert_array_equal(fast[k], slow[k], err_msg=k)

    # non-ASCII triggers the fallback
    assert ascii_text_counts(pa.array(["héllo"], pa.string())) is None
    # and the full operator still runs through it
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["héllo wörld", "plain"]})
    out = ts(df)
    assert list(out.n_words) == [2, 1]


def test_multiwidth_rollup_per_rule_windows(ray_session):
    """Two rules with different graphite.interval overrides bucket their
    points at their OWN widths in one pass (reference per-rule config
    merge, logtrics.go:86-97): same input rows, rule A at 1h windows,
    rule B at 1m — verified against a brute-force per-rule replay."""
    import ray.data as rd

    from logtrics_ray.config import EngineConfig
    from logtrics_ray.hashing import id_hash64
    from logtrics_ray.pipelines.table_rollup import multiwidth_rollup_frame
    from logtrics_ray.rules import load_rules

    rules = load_rules([
        {"name": "a-counter", "expression": r"ev=(?P<k>[a-z]+)",
         "emit": [{"metric_type": "counter", "series": "a.{k}", "value": 1}],
         "graphite": {"interval": 3600}},
        {"name": "b-gauge", "expression": r"g=(?P<v>\d+)",
         "emit": [{"metric_type": "gauge", "series": "b.all",
                   "value": "float(v)"}]},
    ])
    assert rules[0].window_ms == 3_600_000 and rules[1].window_ms is None
    docs = [(f"d{i}", f"ev=x g={i} pad") for i in range(50)]
    t = pa.table({"doc_id": pa.array([d for d, _ in docs]),
                  "text": pa.array([s for _, s in docs]),
                  "source": pa.array(["s"] * len(docs))})
    cfg = EngineConfig()
    out = multiwidth_rollup_frame(rd.from_arrow(t), rules, cfg,
                                  default_width_ms=60_000).to_pandas()
    # brute force: both rules match every row; per-row ts from the shared
    # id-hash synthesis, floored at the rule's own width
    from collections import Counter, defaultdict
    cnt, ssum = Counter(), defaultdict(float)
    for i, (d, _) in enumerate(docs):
        ts = cfg.epoch0_ms + id_hash64(d) % cfg.horizon_ms
        wa = ts - ts % 3_600_000
        cnt[("a.x", "counter", 3_600_000, wa)] += 1
        ssum[("a.x", "counter", 3_600_000, wa)] += 1.0
        wb = ts - ts % 60_000
        cnt[("b.all", "gauge", 60_000, wb)] += 1
        ssum[("b.all", "gauge", 60_000, wb)] += float(i)
    got = {(r.series_key, r.metric_type, r.width_ms, r.window_start):
           (r.n, r.sum_value) for r in out.itertuples()}
    assert len(got) == len(cnt)
    for k, n in cnt.items():
        assert got[k] == (n, round(ssum[k], 6)), k
    # every a.* row is 1h-wide, every b.* row 1m-wide
    assert (out.loc[out.series_key.str.startswith("a."), "width_ms"]
            == 3_600_000).all()
    assert (out.loc[out.series_key.str.startswith("b."), "width_ms"]
            == 60_000).all()


def test_word_hashes_matches_python_split():
    """The vectorized Arrow word split/hash must produce byte-identical
    (hashes, counts) to the per-doc Python reference split it replaced —
    including unicode case/whitespace, empties, and edge spaces (the
    minhash/simhash signature side tables depend on this)."""
    import re

    import numpy as np
    import pyarrow as pa

    from logtrics_ray.functions.dedup import word_hashes
    from logtrics_ray.hashing import id_hash64_array

    _ws = re.compile(r"\s+")
    texts = ["  Hello  WORLD ", "", "   ", "a", "x\ty\nz  w",
             "Foö  BAR ß", " \xa0nb sp ", "one",
             "Tabs\t\tand\nnewlines\r\nmixed "]
    W, wc = word_hashes(pa.array(texts, pa.string()))

    ref_words = [[w for w in _ws.split(t.strip().lower()) if w]
                 for t in texts]
    ref_wc = np.array([len(ws) for ws in ref_words], dtype=np.int64)
    flat = [w for ws in ref_words for w in ws]
    ref_W = id_hash64_array(flat) if flat else np.empty(0, np.uint64)
    assert (wc == ref_wc).all()
    assert W.dtype == ref_W.dtype and (W == ref_W).all()


def test_gram_hash_flat_matches_ngram_set():
    """The batch-vectorized gram kernel (Arrow split -> windowed take ->
    binary_join -> one hash64_array) must reproduce the per-doc
    ``ngram_set`` reference exactly after per-doc unique: same hash
    sets, same doc attribution — for n around/below/above doc lengths,
    unicode, duplicates, and empty/whitespace-only docs (the n-gram
    Jaccard + decontamination operators depend on this)."""
    import numpy as np
    import pyarrow as pa

    from logtrics_ray.functions.dedup import (gram_hash_flat, ngram_set,
                                              unique_grams_per_doc)
    from logtrics_ray.hashing import hash64_array

    texts = ["Hello   world foo Bar", "one", "", "  ", "a b",
             "x y z w v u t", "dup dup dup dup dup",
             "Tab\tsep\nnew  line", "único café naïve ÆØÅ test"]
    for n in (1, 2, 3, 8):
        ref = [np.unique(hash64_array(sorted(ngram_set(s, n))))
               if s.strip() else np.empty(0, np.uint64) for s in texts]
        h, g_doc, n_docs = gram_hash_flat(pa.array(texts, pa.string()), n)
        uh, cnt = unique_grams_per_doc(h, g_doc, n_docs)
        off = np.concatenate([[0], np.cumsum(cnt)])
        assert n_docs == len(texts)
        for i, r in enumerate(ref):
            assert np.array_equal(uh[off[i]:off[i + 1]], r), (n, i)


def test_pack_adaptive_bits_hot_source(ray_session, tmp_path):
    """Skewed corpus (one source = ~60% of all tokens): with a tiny
    per-bucket token budget the exchange width adapts upward instead of
    raising, every bucket respects the budget, and the packed output is
    IDENTICAL to the default-budget run (width-invariance)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from logtrics_ray.functions.packing import (FINE_BITS, _adapt_bits,
                                                _bucket_token_totals,
                                                pack_sequences,
                                                pack_stats_frame)

    rng = np.random.default_rng(11)
    docs = []
    for i in range(300):
        # every third doc is a "hot" long one
        n = int(rng.integers(200, 400)) if i % 3 == 0 \
            else int(rng.integers(5, 40))
        docs.append((f"h{i:04d}", rng.integers(0, 97, n).astype(np.int32)))
    t = pa.table({
        "doc_id": [d for d, _ in docs],
        "tokens": pa.array([list(v) for _, v in docs], pa.list_(pa.int32())),
        "n_tok": pa.array([len(v) for _, v in docs], pa.int32()),
        "source": ["hot" if i % 3 == 0 else "web"
                   for i in range(len(docs))],
    })
    d = tmp_path / "hot"
    d.mkdir()
    pq.write_table(t, str(d / "part-00000.parquet"))

    fine = _bucket_token_totals(str(d), FINE_BITS)
    # budget must exceed the largest single doc (docs are atomic) but sit
    # below the default 6-bit max bucket so adaptation has to kick in
    budget = int(fine.max()) + 50
    bits, coarse = _adapt_bits(fine, FINE_BITS, 6, budget)
    assert bits > 6 and int(coarse.max()) <= budget
    assert coarse.sum() == fine.sum() == sum(len(v) for _, v in docs)

    def canon(**kw):
        df = pack_stats_frame(
            pack_sequences(str(d), seq_len=128, **kw)).to_pandas()
        return df.sort_values("bin_id").reset_index(drop=True)

    import pandas as pd
    pd.testing.assert_frame_equal(
        canon(max_bucket_tokens=budget), canon(), check_exact=True)


def test_sample_mix_epochs_upsamples_deterministically(ray_session, t1_dir):
    """Upsampling mix: every doc of a rate-r source appears exactly
    floor(r) or ceil(r) times (fraction decided by the shared hash key),
    epoch tags are dense 0..copies-1, and reruns emit the same multiset."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    from logtrics_ray.functions.packing import (_sample_key,
                                                sample_mix_epochs,
                                                upsample_plan)

    rates = {"web": 0.5, "books": 1.5, "code": 2.25, "wiki": 1.0}
    got = sample_mix_epochs(t1_dir, rates).to_pandas()
    got2 = sample_mix_epochs(t1_dir, rates).to_pandas()
    assert sorted(got.doc_id) == sorted(got2.doc_id)

    t = pq.read_table(sorted(glob.glob(f"{t1_dir}/*.parquet")),
                      columns=["doc_id", "source"])
    key = _sample_key(t["doc_id"])
    plan = upsample_plan(rates)
    ids = np.asarray(t["doc_id"].to_pylist())
    src = np.asarray(t["source"].to_pylist())
    counts = got.groupby("base_doc_id").size()
    for i, (d, s) in enumerate(zip(ids, src)):
        base, frac = plan.get(s, (0, 0))
        want = base + (1 if key[i] < frac else 0)
        assert counts.get(d, 0) == want, (d, s, want)
    # epoch tags dense per base doc, doc_id carries the tag
    for d, g in got.groupby("base_doc_id"):
        assert sorted(g.epoch) == list(range(len(g)))
        assert set(g.doc_id) == {f"{d}#e{k}" for k in g.epoch}
    # wiki at exactly 1.0 emits exactly once, epoch 0
    wiki = got[got.source == "wiki"]
    assert len(wiki) == int((src == "wiki").sum())
    assert (wiki.epoch == 0).all()
    # code at 2.25 averages >= 2 copies per doc
    n_code = int((src == "code").sum())
    assert len(got[got.source == "code"]) >= 2 * n_code


def test_pack_stats_run_twice_byte_identical(ray_session, t1_dir):
    """The driver hashes pack output across runs: two full
    pack_sequences -> pack_stats_frame executions in one session must
    canonicalize (sorted rows/columns) to byte-identical frames,
    dtypes included — catches run-to-run nondeterminism that a single
    oracle comparison cannot."""
    import pandas as pd

    from logtrics_ray.functions.packing import (pack_sequences,
                                                pack_stats_frame)

    def canon():
        df = pack_stats_frame(pack_sequences(t1_dir, seq_len=256)).to_pandas()
        cols = sorted(df.columns)
        return (df[cols].sort_values(cols, kind="mergesort")
                .reset_index(drop=True))

    a, b = canon(), canon()
    pd.testing.assert_frame_equal(a, b, check_exact=True, check_dtype=True)


def test_pack_hash_and_sort_exchange_identical(ray_session, t1_dir):
    """The token exchange under HASH_SHUFFLE (key repartition +
    per-group apply) and under the sort-based grouped map canonicalize
    to byte-identical stats frames — both group fns impose their own
    internal total order, so the exchange strategy never reaches the
    output bits."""
    import pandas as pd

    from logtrics_ray.functions.packing import (pack_sequences,
                                                pack_stats_frame)

    def canon(impl):
        df = pack_stats_frame(
            pack_sequences(t1_dir, seq_len=256, shuffle_impl=impl)
        ).to_pandas()
        cols = sorted(df.columns)
        return (df[cols].sort_values(cols, kind="mergesort")
                .reset_index(drop=True))

    pd.testing.assert_frame_equal(canon("hash"), canon("sort"),
                                  check_exact=True, check_dtype=True)


def test_vocab_topk_matches_counter(ray_session, t1_dir):
    """Top-k vocabulary stats == a plain Counter over all tokens (count
    AND document frequency), including the (n desc, token asc) tie rule."""
    import collections
    import glob

    import pyarrow.parquet as pq

    from logtrics_ray.functions.packing import vocab_topk_frame

    t = pq.read_table(sorted(glob.glob(f"{t1_dir}/*.parquet")),
                      columns=["tokens"])
    cnt = collections.Counter()
    df = collections.Counter()
    for row in t["tokens"].to_pylist():
        cnt.update(row)
        df.update(set(row))
    want = sorted(cnt, key=lambda tok: (-cnt[tok], tok))[:50]
    got = vocab_topk_frame(t1_dir, k=50)
    assert list(got.token) == want
    assert list(got.n) == [cnt[tok] for tok in want]
    assert list(got.n_docs) == [df[tok] for tok in want]
    assert list(got["rank"]) == list(range(1, 51))


def test_repetition_stats_matches_bruteforce(ray_session):
    """Flat-buffer repetition signals == a per-doc Python recompute on
    crafted docs: duplicate lines, repeated words, a dominant bigram,
    single-word and empty docs."""
    import collections

    import ray.data as rd

    from logtrics_ray.functions.textstats import repetition_stats

    docs = [
        "a b a b a b c",                      # dominant bigram (a,b)
        "x\ny\nx\ny\nz",                      # duplicate lines
        "Hello HELLO hello world",            # case-folded dup words
        "one",                                # single word: no bigrams
        "",                                   # empty doc
        "line\n\nline\n\n",                   # empty lines are lines too
    ]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    got = repetition_stats(rd.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    for i, s in enumerate(docs):
        lines = s.split("\n")
        words = [w for w in s.lower().split() if w]
        bgs = collections.Counter(zip(words, words[1:]))
        assert got.n_lines[i] == len(lines)
        assert got.n_words[i] == len(words)
        assert got.dup_line_frac[i] == round(
            (len(lines) - len(set(lines))) / len(lines), 6)
        wf = (len(words) - len(set(words))) / len(words) if words else 0.0
        assert got.dup_word_frac[i] == round(wf, 6)
        bf = max(bgs.values()) / sum(bgs.values()) if bgs else 0.0
        assert abs(got.top_bigram_frac[i] - bf) < 1e-6  # engine rounds 6dp


def test_connected_components_label_propagation(ray_session):
    """Hash-min label prop == brute-force union-find on a graph with a
    chain (needs several propagation rounds), a separate 2-node
    component, and isolated nodes."""
    import ray.data as rd

    from logtrics_ray.functions.dedup import connected_components

    # chain 9-7-5-3-1 (worst case for min-propagation: min at one end),
    # pair (2, 8), isolated 0, 4, 6
    edges = [(9, 7), (7, 5), (5, 3), (3, 1), (2, 8)]
    pairs = rd.from_arrow(pa.table({
        "a": pa.array([e[0] for e in edges], pa.int64()),
        "b": pa.array([e[1] for e in edges], pa.int64())}))
    ids = rd.from_arrow(pa.table({"doc_id": pa.array(range(10), pa.int64())}))
    got = connected_components(pairs, ids).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = {0: 0, 1: 1, 2: 2, 3: 1, 4: 4, 5: 1, 6: 6, 7: 1, 8: 2, 9: 1}
    assert dict(zip(got.doc_id, got.cluster_id)) == want


def test_connected_components_paths_agree(ray_session, monkeypatch):
    """The broadcast small-graph path (driver union-find + searchsorted
    relabel) and the distributed label-propagation path must emit
    identical (doc_id, cluster_id) rows."""
    import ray.data as rd

    from logtrics_ray.functions import dedup as D

    edges = [(9, 7), (7, 5), (5, 3), (3, 1), (2, 8), (11, 2)]

    def run():
        pairs = rd.from_arrow(pa.table({
            "a": pa.array([e[0] for e in edges], pa.int64()),
            "b": pa.array([e[1] for e in edges], pa.int64())}))
        ids = rd.from_arrow(pa.table(
            {"doc_id": pa.array(range(12), pa.int64())}))
        got = D.connected_components(pairs, ids).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        return dict(zip(got.doc_id, got.cluster_id))

    broadcast = run()                      # default limit: broadcast path
    monkeypatch.setattr(D, "CC_BROADCAST_EDGE_LIMIT", -1)
    assert run() == broadcast == {0: 0, 1: 1, 2: 2, 3: 1, 4: 4, 5: 1,
                                  6: 6, 7: 1, 8: 2, 9: 1, 10: 10, 11: 2}


def test_connected_components_no_edges(ray_session):
    import ray.data as rd

    from logtrics_ray.functions.dedup import connected_components

    pairs = rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                    "b": pa.array([], pa.int64())}))
    ids = rd.from_arrow(pa.table({"doc_id": pa.array([3, 1, 2], pa.int64())}))
    got = connected_components(pairs, ids).to_pandas()
    assert dict(zip(got.doc_id, got.cluster_id)) == {1: 1, 2: 2, 3: 3}


def test_cluster_representatives_pick_rule(ray_session):
    """Keep-best dedup: longest doc wins its cluster, ties to smallest
    id; singletons represent themselves with size 1."""
    import ray.data as rd

    from logtrics_ray.exchange import hash_shuffle_ctx
    from logtrics_ray.functions.dedup import cluster_representatives

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = {
        0: base,                      # near-dup cluster {0,1,2}
        1: base + " x",               # longest -> representative
        2: base + " y",               # same length as 1: id 1 wins
        7: "a completely different document about ray data pipelines",
    }
    t = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                  "text": pa.array(list(docs.values()), pa.string())})
    with hash_shuffle_ctx():
        got = cluster_representatives(rd.from_arrow(t)).to_pandas()
    rows = {r.cluster_id: (r.doc_id, r.n_chars, r.cluster_size)
            for r in got.itertuples()}
    assert rows[0] == (1, len(base) + 2, 3)
    assert rows[7] == (7, len(docs[7]), 1)


def test_scrub_pii_redacts_and_counts(ray_session):
    """Sequential redaction semantics: emails first, then IPs, then
    phones — counts taken on the text as the previous rule left it;
    non-PII text passes through byte-identical."""
    import ray.data as rd

    from logtrics_ray.functions.textstats import scrub_pii

    rows = [
        ("mail bob.smith+x@sub.example.co.uk now", "mail <EMAIL> now", 1, 0, 0),
        ("from 192.168.0.1 to 10.0.0.255 end", "from <IP> to <IP> end", 0, 2, 0),
        ("call +441234567890 or +14155550101", "call <PHONE> or <PHONE>", 0, 0, 2),
        ("a@b.io at 1.2.3.4 via +12345678", "<EMAIL> at <IP> via <PHONE>", 1, 1, 1),
        ("plain text, no pii at all", "plain text, no pii at all", 0, 0, 0),
        ("", "", 0, 0, 0),
    ]
    t = pa.table({"doc_id": pa.array(range(len(rows)), pa.int64()),
                  "text": pa.array([r[0] for r in rows], pa.string())})
    got = scrub_pii(rd.from_arrow(t)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert list(got.text) == [r[1] for r in rows]
    assert list(got.n_email) == [r[2] for r in rows]
    assert list(got.n_ip) == [r[3] for r in rows]
    assert list(got.n_phone) == [r[4] for r in rows]


def test_bigram_topk_matches_counter(ray_session, t1_dir):
    """Top-k bigram stats == a plain Counter over within-doc consecutive
    pairs (count AND document frequency), incl. the tie rule."""
    import collections
    import glob

    import pyarrow.parquet as pq

    from logtrics_ray.functions.packing import bigram_topk_frame

    t = pq.read_table(sorted(glob.glob(f"{t1_dir}/*.parquet")),
                      columns=["tokens"])
    cnt = collections.Counter()
    df = collections.Counter()
    for row in t["tokens"].to_pylist():
        pairs = list(zip(row, row[1:]))
        cnt.update(pairs)
        df.update(set(pairs))
    want = sorted(cnt, key=lambda p: (-cnt[p], p))[:50]
    got = bigram_topk_frame(t1_dir, k=50)
    assert list(zip(got.token_a, got.token_b)) == want
    assert list(got.n) == [cnt[p] for p in want]
    assert list(got.n_docs) == [df[p] for p in want]
    assert list(got["rank"]) == list(range(1, len(want) + 1))


def test_bigram_boundary_and_degenerate_docs(ray_session, tmp_path):
    """Pairs never straddle documents; empty and single-token docs are
    pair-free (incl. an empty FIRST and LAST doc — the boundary-mask
    edge cases)."""
    import pyarrow.parquet as pq

    from logtrics_ray.functions.packing import bigram_topk_frame

    docs = [[], [7], [1, 2, 1, 2], [2, 1], [], [3], [1, 2], []]
    t = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "source": pa.array(["s"] * len(docs), pa.string()),
        "tokens": pa.array(docs, pa.list_(pa.int32())),
    })
    d = tmp_path / "bg"
    d.mkdir()
    pq.write_table(t, d / "part-0.parquet")
    got = bigram_topk_frame(str(d), k=10)
    rows = {(a, b): (n, nd) for a, b, n, nd in
            zip(got.token_a, got.token_b, got.n, got.n_docs)}
    # (1,2): twice in doc 2, once in doc 6 -> n=3, n_docs=2
    assert rows == {(1, 2): (3, 2), (2, 1): (2, 2)}
    assert list(got["rank"]) == [1, 2]


def test_decontaminate_matches_bruteforce(ray_session):
    """Engine flags == a plain-Python gram-set membership check, hit
    counts included; docs sharing no gram stay clean, the benchmark
    docs self-flag, and a short doc (< n words) matches via its
    whole-text gram."""
    import ray.data as rd

    from logtrics_ray.functions.dedup import decontaminate, ngram_set

    docs = {
        0: "the quick brown fox jumps over the lazy dog tonight",
        1: "a completely different document about ray data pipelines",
        2: "the quick brown fox jumps over the lazy dog tonight again",
        3: "short doc",
        4: "unrelated words entirely here nothing shared with anyone",
    }
    bench = [docs[0], "short doc"]
    t = pa.Table.from_arrays(
        [pa.array(list(docs), pa.int64()),
         pa.array([docs[k] for k in docs], pa.string())],
        names=["doc_id", "text"])

    got = (decontaminate(rd.from_arrow(t), bench, n=8)
           .to_pandas().set_index("doc_id").sort_index())

    bench_grams = set().union(*(ngram_set(s, 8) for s in bench))
    for i, s in docs.items():
        hits = len(ngram_set(s, 8) & bench_grams)
        assert got.loc[i, "n_hits"] == hits, (i, s)
        assert bool(got.loc[i, "contaminated"]) == (hits > 0)
    assert got.loc[0, "contaminated"]          # benchmark doc self-flags
    assert got.loc[2, "contaminated"]          # shares 8-gram window
    assert got.loc[3, "contaminated"]          # whole-short-doc gram
    assert not got.loc[1, "contaminated"] and not got.loc[4, "contaminated"]
    assert got["n_hits"].dtype == "int64"


def test_tfidf_topk_matches_counter(ray_session, t1_dir):
    """Top-k TF-IDF == a Counter-based recompute with math.log: score,
    df, ordering by unrounded score with token-asc tiebreak."""
    import collections
    import glob
    import math

    import pyarrow.parquet as pq

    from logtrics_ray.functions.packing import tfidf_topk_frame

    t = pq.read_table(sorted(glob.glob(f"{t1_dir}/*.parquet")),
                      columns=["tokens"])
    rows = t["tokens"].to_pylist()
    cnt = collections.Counter()
    df = collections.Counter()
    for row in rows:
        cnt.update(row)
        df.update(set(row))
    N = len(rows)
    score = {tok: cnt[tok] * math.log(N / (df[tok] * 1.0)) for tok in cnt}
    want = sorted(cnt, key=lambda tok: (-score[tok], tok))[:50]
    got = tfidf_topk_frame(t1_dir, k=50)
    assert list(got.token) == want
    assert list(got.n) == [cnt[tok] for tok in want]
    assert list(got.n_docs) == [df[tok] for tok in want]
    assert np.allclose(got.tfidf, [round(score[tok], 6) for tok in want],
                       atol=1e-9)
    assert list(got["rank"]) == list(range(1, 51))


def test_doc_len_band_filter_matches_bruteforce(ray_session, tmp_path):
    """Histogram-derived per-source percentile band + filter stats == a
    plain sorted-array recompute with DuckDB's quantile_disc index
    convention (ceil(q*n) - 1), including a single-doc source."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from logtrics_ray.functions.textstats import doc_len_band_filter_frame

    rng = np.random.default_rng(23)
    srcs, lens = [], []
    for s, n in (("a", 500), ("b", 40), ("solo", 1)):
        srcs += [s] * n
        lens += rng.integers(10, 5000, n).tolist()
    p = tmp_path / "docs.parquet"
    pq.write_table(pa.table({"source": srcs,
                             "n_chars": pa.array(lens, pa.int64())}), p)
    got = (doc_len_band_filter_frame(str(p))
           .sort_values("source").reset_index(drop=True))
    import pandas as pd
    df = pd.DataFrame({"source": srcs, "n_chars": lens})
    for _, row in got.iterrows():
        v = np.sort(df[df.source == row.source].n_chars.to_numpy())
        n = len(v)
        lo = v[max(int(np.ceil(0.05 * n)) - 1, 0)]
        hi = v[max(int(np.ceil(0.95 * n)) - 1, 0)]
        keep = (v >= lo) & (v <= hi)
        assert (row.lo, row.hi) == (lo, hi)
        assert row.n_kept == int(keep.sum())
        assert row.n_dropped == int((~keep).sum())
        assert row.sum_chars_kept == int(v[keep].sum())
    # the solo source keeps its only doc (band collapses to the value)
    solo = got[got.source == "solo"].iloc[0]
    assert solo.n_kept == 1 and solo.n_dropped == 0


def test_paragraph_dedup_pages_matches_bruteforce(ray_session, tmp_path):
    """Distributed keep-first paragraph dedup + page reassembly == a
    plain dict-based recompute, with heavy crafted duplication (one
    page losing EVERY paragraph) and a tail page shorter than
    paras_per_page."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from logtrics_ray.functions.dedup import paragraph_dedup_pages

    texts = ["alpha", "beta", "gamma", "delta",      # page 0: all first
             "alpha", "beta", "gamma", "delta",      # page 1: all dupes
             "epsilon", "alpha", "zeta", "beta",     # page 2: half dupes
             "eta", "theta"]                         # page 3: short tail
    p = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}), p)
    got = (paragraph_dedup_pages(str(p), paras_per_page=4,
                                 inject_boiler=False)
           .to_pandas().sort_values("page_id").reset_index(drop=True))

    seen: set[str] = set()
    keep = []
    for t in texts:
        keep.append(t not in seen)
        seen.add(t)
    want = {}
    for i, t in enumerate(texts):
        pg = i // 4
        want.setdefault(pg, [0, 0, []])
        want[pg][0] += 1
        if keep[i]:
            want[pg][1] += 1
            want[pg][2].append(t)
    assert list(got.page_id) == sorted(want)
    for _, row in got.iterrows():
        np_, nk, paras = want[int(row.page_id)]
        assert (row.n_paras, row.n_kept) == (np_, nk)
        assert row.text == "\n\n".join(paras)
    assert got[got.page_id == 1].iloc[0].text == ""


def test_paragraph_dedup_paths_agree(ray_session, tmp_path, monkeypatch):
    """The broadcast keep-flag path and the minima hash-join path emit
    identical pages."""
    import pyarrow.parquet as pq

    from logtrics_ray.functions import dedup as D

    texts = ["alpha", "beta", "alpha", "gamma", "beta", "delta"]
    p = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}), p)

    def run():
        return (D.paragraph_dedup_pages(str(p), paras_per_page=3,
                                        inject_boiler=False)
                .to_pandas().sort_values("page_id")
                .reset_index(drop=True))

    bcast = run()                          # default: broadcast path
    monkeypatch.setattr(D, "CC_BROADCAST_EDGE_LIMIT", -1)
    joined = run()
    assert bcast.equals(joined)
    assert list(bcast.text) == ["alpha\n\nbeta", "gamma\n\ndelta"]


def test_chunk_stats_matches_bruteforce(ray_session, t1_dir):
    """Sliding-window chunk stats == a per-doc Python recompute of the
    chunking rule, including short docs (one chunk), exact-multiple
    lengths, and empty docs (no chunks)."""
    import glob

    import pyarrow.parquet as pq

    from logtrics_ray.functions.packing import chunk_stats_frame

    CL, S = 64, 48
    t = pq.read_table(sorted(glob.glob(f"{t1_dir}/*.parquet")),
                      columns=["tokens", "source"])
    want = {}
    for toks, src in zip(t["tokens"].to_pylist(), t["source"].to_pylist()):
        w = want.setdefault(src, [0, 0, 0, 0])
        w[0] += 1
        n = len(toks)
        if n == 0:
            continue
        k = 0
        while True:
            st, en = k * S, min(k * S + CL, n)
            w[1] += 1
            w[2] += en - st
            w[3] += toks[st]
            if en >= n:
                break
            k += 1
    got = chunk_stats_frame(t1_dir, chunk_len=CL, stride=S)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        nd, nc, sl, sf = want[r.source]
        assert (r.n_docs, r.n_chunks, r.sum_chunk_tokens,
                r.sum_first_tokens) == (nd, nc, sl, sf)


def test_label_centroids_matches_float_mean(ray_session, tmp_path):
    """Quantized-exact centroids == the plain float mean within the
    documented 2^-20 quantization bound, with exact counts; a batch
    split can never change the result (integer aggregation is
    order-free) — checked by comparing 1-shard vs 4-shard inputs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from logtrics_ray.functions.similarity import label_centroids_frame

    rng = np.random.default_rng(41)
    n, D = 600, 16
    emb = rng.normal(scale=0.3, size=(n, D)).astype(np.float32)
    lab = rng.integers(0, 5, n).astype(np.int32)
    t = pa.table({
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.ravel(), pa.float32()), D).cast(
                pa.list_(pa.float32())),
        "label": pa.array(lab, pa.int32())})
    p1 = tmp_path / "one.parquet"
    pq.write_table(t, p1)
    d4 = tmp_path / "four"
    d4.mkdir()
    step = n // 4
    for i in range(4):
        pq.write_table(t.slice(i * step, step),
                       d4 / f"part-{i}.parquet")
    got1 = (label_centroids_frame(str(p1)).to_pandas()
            .sort_values(["label", "dim"]).reset_index(drop=True))
    got4 = (label_centroids_frame(str(d4)).to_pandas()
            .sort_values(["label", "dim"]).reset_index(drop=True))
    assert got1.equals(got4)
    for lb in np.unique(lab):
        m = emb[lab == lb].astype(np.float64).mean(axis=0)
        g = got1[got1.label == lb].sort_values("dim")
        assert (g.n == int((lab == lb).sum())).all()
        assert np.abs(g.centroid.to_numpy() - m).max() < 2.0 / (1 << 20)


def test_curation_funnel_matches_bruteforce(ray_session, tmp_path):
    """The five-stage curation funnel == a sequential Python recompute
    on a crafted corpus exercising EVERY stage: a low-quality doc, a
    length outlier, an exact duplicate, a near duplicate, and a
    benchmark-contaminated doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from logtrics_ray.pipelines.curation import BENCH_MOD, BENCH_RES, curate

    # distinct docs: per-doc deterministic content words interleaved
    # with stopwords (high quality, low cross-doc Jaccard)
    pool = ("fox mill river shade tree stone cloud valley bridge road "
            "meadow lantern harbor forest ember cliff marsh dune grove "
            "spire canyon delta ridge hollow brook summit glade fen "
            "tarn knoll bluff basin heath moor scree talus verge "
            "copse swale vale").split()
    rng = np.random.default_rng(97)
    docs = {}
    for i in range(40):
        words = []
        for w in rng.choice(pool, 60, replace=True):
            words += ["the", str(w) + str(rng.integers(100)), "of",
                      str(rng.choice(pool))]
        docs[i] = " ".join(words)
    docs[3] = "zz qq xx"                      # low quality (tiny, no stops)
    docs[7] = docs[7] * 30                    # length outlier (p95 cut)
    docs[11] = docs[10]                       # exact duplicate of 10
    docs[13] = docs[12] + " tiny difference"  # near duplicate of 12
    # doc BENCH_RES is the benchmark doc; doc 21 copies one of its
    # 8-grams mid-text -> contaminated
    bench_words = docs[BENCH_RES].split()[:8]
    docs[21] = docs[21] + " " + " ".join(bench_words)
    ids = sorted(docs)
    p = tmp_path / "documents.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([docs[i] for i in ids], pa.string()),
        "source": pa.array(["web" if i % 2 else "wiki" for i in ids]),
        "n_chars": pa.array([len(docs[i]) for i in ids], pa.int64()),
    }), p)
    assert BENCH_RES in ids and BENCH_RES % BENCH_MOD == BENCH_RES

    stages, stats = curate(str(p))
    get = lambda name: {r["doc_id"] for r in stages[name].take_all()}
    q, b, e, m, c = (get(n) for n in
                     ("quality", "band", "exact", "minhash", "clean"))
    assert 3 not in q                  # quality drop
    assert 7 in q and 7 not in b      # length outlier dropped by band
    assert 10 in e and 11 not in e    # exact keep-first
    assert 12 in m and 13 not in m    # near-dup keep-earliest
    assert 21 in m and 21 not in c    # contaminated dropped last
    assert BENCH_RES not in c          # the benchmark doc itself overlaps
    assert c < m < e <= b < q          # strictly shrinking funnel
    # stats frame equals the sets
    tot = stats[["n_quality", "n_band", "n_exact", "n_minhash",
                 "n_clean"]].sum()
    assert (tot.n_quality, tot.n_band, tot.n_exact, tot.n_minhash,
            tot.n_clean) == (len(q), len(b), len(e), len(m), len(c))


def test_cms_estimates_bound_exact_counts(ray_session, tmp_path):
    """CMS matrix == a Counter-built matrix (exact int merges), and
    every estimate respects the one-sided guarantee est >= exact, tight
    for keys without collisions."""
    import collections

    import pyarrow as pa
    import pyarrow.parquet as pq

    from logtrics_ray.state.cms import cms_columns, cms_probe_frame

    rng = np.random.default_rng(43)
    # skewed keys: one hot key + a long tail
    keys = np.concatenate([np.full(500, 7, np.int64),
                           rng.integers(0, 10_000, 3000)]).astype(np.int64)
    p = tmp_path / "events.parquet"
    pq.write_table(pa.table({"user_id": pa.array(keys, pa.int64())}), p)
    d, log2_w = 4, 12
    frame, m = cms_probe_frame(str(p), d=d, log2_w=log2_w, probe_mod=7)
    # matrix == brute force
    want = np.zeros((d, 1 << log2_w), np.int64)
    cols = cms_columns(keys, d, log2_w)
    for j in range(d):
        np.add.at(want[j], cols[j], 1)
    assert np.array_equal(m, want)
    # probe rows: exact counts + one-sided bound
    cnt = collections.Counter(keys.tolist())
    for _, r in frame.iterrows():
        assert r.user_id % 7 == 0
        assert r.exact_n == cnt[r.user_id]
        assert r.est_n >= r.exact_n and r.overcount >= 0
    # the hot key estimate is near-exact at this load factor
    hot = frame[frame.user_id == 7].iloc[0]
    assert hot.exact_n >= 500 and hot.est_n <= hot.exact_n + 10


def test_split_words_immune_to_kernel_poisoning():
    """pyarrow 16.1's utf8_split_whitespace has a PROCESS-STATEFUL bug:
    after lowercasing certain inputs (U+0130 'İ' in the trigger batch),
    later split calls on byte-identical arrays merge trailing whitespace
    into the last word.  The engine's split_words does the whitespace
    scan in numpy over the value buffer, so its output must be identical
    before and after the poisoning trigger — the determinism every
    signature kernel rests on."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from logtrics_ray.functions.dedup import split_words

    victim = [' İ𑣅𝧩\x81𑣅 ', 'a b ', '\xa0x\xa0']
    before_k, before_c = split_words(pa.array(victim, pa.string()))
    before = before_k.to_pylist()
    # the poisoning trigger observed in the wild (lower over 'İ' & mixed
    # unicode, then splits) — poisons pc.utf8_split_whitespace for the
    # REST OF THE PROCESS in pyarrow 16.1
    trigger = ['🌐ć𑣅Ꮚ🌐ać\x81Ꮚ', 'ß\x8a\t𝌹İß\ty𝧩ß𑣅%\x8a',
               'Ꮚ\tć0ća\xa0İ\x85🌐🌐Ꮚ \x8a\x8a𑣅', '0\x90𝌹𝌹\x81Ꮚ𑣅']
    pc.utf8_split_whitespace(pc.utf8_lower(pa.array(trigger, pa.string())))
    after_k, after_c = split_words(pa.array(victim, pa.string()))
    assert before == after_k.to_pylist()
    assert np.array_equal(before_c, after_c)
    # and the split itself is correct: no word carries whitespace bytes
    assert before == ['i𑣅𝧩\x81𑣅', 'a', 'b', 'x']
    assert before_c.tolist() == [1, 2, 1]


def test_split_words_whitespace_class_is_isspace():
    """The splitter's whitespace class must be utf8proc/CPython
    ``isspace`` — Unicode White_Space=yes PLUS the bidi-B/S control
    separators U+001C..001F — matching Arrow's utf8_split_whitespace
    and Python ``str.split()``, the semantics the oracle side tables
    were built with (regression pin: the first numpy-LUT rewrite
    dropped 1C-1F and silently kept '\\x1f' as a word)."""
    import numpy as np
    import pyarrow as pa

    from logtrics_ray.functions.dedup import split_words

    docs = ['a\x1cb', 'a\x1db', 'a\x1eb', 'a\x1fb', '\x1f', 'a\x85b',
            'a\xa0b', 'a b', 'a᠎b']  # 180E is NOT whitespace
    kept, wc = split_words(pa.array(docs, pa.string()))
    ref_words, ref_wc = [], []
    for d in docs:
        w = d.lower().split()
        ref_words += w
        ref_wc.append(len(w))
    assert kept.to_pylist() == ref_words
    assert wc.tolist() == ref_wc == [2, 2, 2, 2, 0, 2, 2, 2, 1]
