"""Multimodal columns: opaque binary payloads + typed metadata, with
REAL dependency-free codecs for three formats and declared stubs beyond.

Image/audio/video payloads are treated as opaque ``binary`` columns with
typed metadata columns alongside (media_type, width/height).  Three codec
paths are fully real (stdlib/numpy only, no external image/audio libs):

  * ``image/x-portable-pixmap`` (PPM P6): header parse + zero-copy
    ``np.frombuffer`` decode, nearest-neighbor resize, channel-stat
    features — a genuine decode->transform->featurize pipeline.
  * ``image/png`` (non-interlaced 8-bit RGB): stdlib ``zlib``
    inflate/deflate + numpy scanline (un)filtering, all five PNG filters,
    CRC-verified chunks.
  * ``audio/wav`` (PCM16): stdlib ``wave`` decode, duration/RMS/
    zero-crossing features.

Formats that need external libraries (JPEG/...) remain clearly
marked stubs: NotImplementedError unless ``fake=True`` selects the
deterministic fake used by plumbing tests.  The Ray-side shape is the
same either way and is what matters at 100 TB:

  * stateful stage (decoder state built once per actor/process),
  * ``batch_format="pyarrow"`` end to end (binary columns must NOT pass
    through pandas object dtype),
  * small ``batch_size`` for wide binary rows (payload bytes × batch ×
    concurrency must fit the worker heap),
  * schema in/out contracts.
"""

from __future__ import annotations

import hashlib
import io
import wave

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("media_type", pa.string()),     # "image/png", "audio/wav", ...
    ("payload", pa.binary()),
    ("meta_width", pa.int32()),
    ("meta_height", pa.int32()),
])


def synth_media_table(n: int, payload_bytes: int = 4096, seed: int = 5) -> pa.Table:
    """Deterministic fake media corpus (binary noise payloads)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes()
                for _ in range(n)]
    return pa.Table.from_arrays([
        pa.array([f"img-{i:08d}" for i in range(n)], pa.string()),
        pa.array(["image/png"] * n, pa.string()),
        pa.array(payloads, pa.binary()),
        pa.array(rng.integers(64, 1024, size=n, dtype=np.int32), pa.int32()),
        pa.array(rng.integers(64, 1024, size=n, dtype=np.int32), pa.int32()),
    ], schema=MEDIA_SCHEMA)


# ------------------------------------------------------- real codecs ------

def encode_ppm(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> PPM P6 bytes (pure stdlib)."""
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """PPM P6 bytes -> (h, w, 3) uint8 via np.frombuffer (no copy of the
    pixel plane beyond the reshape view)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a PPM P6 payload")
    # header: magic, width, height, maxval — whitespace separated
    parts, idx = [], 2
    while len(parts) < 3:
        while idx < len(payload) and payload[idx : idx + 1].isspace():
            idx += 1
        if payload[idx : idx + 1] == b"#":           # comment line
            idx = payload.index(b"\n", idx) + 1
            continue
        end = idx
        while end < len(payload) and not payload[end : end + 1].isspace():
            end += 1
        parts.append(int(payload[idx:end]))
        idx = end
    idx += 1                                          # single ws after maxval
    w, h, maxval = parts
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    return np.frombuffer(payload, dtype=np.uint8, count=h * w * 3,
                         offset=idx).reshape(h, w, 3)


def resize_nearest(rgb: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy integer gather."""
    h, w, _ = rgb.shape
    yi = (np.arange(out_h) * h // out_h).astype(np.int64)
    xi = (np.arange(out_w) * w // out_w).astype(np.int64)
    return rgb[yi[:, None], xi[None, :], :]


def encode_wav_pcm16(samples: np.ndarray, rate: int = 8000) -> bytes:
    """float samples in [-1, 1] -> mono PCM16 WAV bytes (stdlib wave)."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float64 samples in [-1, 1], sample rate)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2 or f.getnchannels() != 1:
            raise ValueError("only mono PCM16 WAV supported")
        rate = f.getframerate()
        raw = f.readframes(f.getnframes())
    return np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32767.0, rate


PPM_TYPE = "image/x-portable-pixmap"
WAV_TYPE = "audio/wav"
PNG_TYPE = "image/png"
Y4M_TYPE = "video/x-yuv4mpeg"


# ------------------------------------- real Y4M video codec (pure numpy) --
# YUV4MPEG2 with C444 planar frames: a REAL, dependency-free video
# container (mjpegtools/ffmpeg interchange format) — plain-text stream
# header, then "FRAME\n" + planar Y/Cb/Cr per frame.  Frames are stored
# as (n, h, w, 3) uint8 YCbCr; no colorspace conversion happens in the
# codec, so round-trips are byte-exact.

def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """(n, h, w, 3) uint8 YCbCr -> YUV4MPEG2 C444 bytes."""
    n, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C444\n" % (w, h, fps)]
    for i in range(n):
        # planar: full Y plane, then Cb, then Cr
        out.append(b"FRAME\n")
        out.append(np.ascontiguousarray(
            frames[i].transpose(2, 0, 1)).tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[np.ndarray, int]:
    """YUV4MPEG2 C444 bytes -> ((n, h, w, 3) uint8 YCbCr, fps)."""
    nl = payload.index(b"\n")
    header = payload[:nl].decode("ascii")
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = fps = None
    for tok in header.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            fps = int(tok[1:].split(":")[0])
        elif tok[0] == "C" and tok[1:] not in ("444",):
            raise ValueError(f"only C444 supported, got {tok}")
    if not w or not h:
        raise ValueError("missing W/H in Y4M header")
    plane = w * h
    frames, idx = [], nl + 1
    marker = b"FRAME"
    while idx < len(payload):
        if payload[idx:idx + 5] != marker:
            raise ValueError("bad FRAME marker")
        idx = payload.index(b"\n", idx) + 1     # frame params ignored
        buf = np.frombuffer(payload, dtype=np.uint8, count=3 * plane,
                            offset=idx).reshape(3, h, w)
        frames.append(buf.transpose(1, 2, 0))
        idx += 3 * plane
    return (np.stack(frames) if frames
            else np.empty((0, h, w, 3), np.uint8)), fps or 25


def sample_frames(ds, step: int = 4, batch_size: int = 16):
    """Video frame-sampling stage: decode Y4M -> keep every ``step``-th
    frame (indices 0, step, 2*step, ...) -> re-encode.  The multimodal
    sampling primitive for training-data pipelines (dataset curation
    keeps a frame subset, not whole clips).  Non-video rows pass through
    unchanged.  Small batch_size: video payloads are the widest rows."""
    from logtrics_ray.functions.dedup import process_cached

    def fn(t: pa.Table) -> pa.Table:
        return process_cached(FrameSampler, step=step)(t)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


class FrameSampler:
    """Stateful per-batch frame sampler (real Y4M kernels)."""

    def __init__(self, step: int = 4):
        self.step = max(1, int(step))

    def __call__(self, t: pa.Table) -> pa.Table:
        types = t["media_type"].to_pylist()
        payloads = t["payload"].to_pylist()
        out = []
        for mt, p in zip(types, payloads):
            if mt == Y4M_TYPE:
                frames, fps = decode_y4m(p)
                out.append(encode_y4m(frames[::self.step], fps))
            else:
                out.append(p)
        return pa.Table.from_arrays([
            t["media_id"].combine_chunks() if isinstance(
                t["media_id"], pa.ChunkedArray) else t["media_id"],
            t["media_type"].combine_chunks() if isinstance(
                t["media_type"], pa.ChunkedArray) else t["media_type"],
            pa.array(out, pa.binary()),
            t["meta_width"].combine_chunks() if isinstance(
                t["meta_width"], pa.ChunkedArray) else t["meta_width"],
            t["meta_height"].combine_chunks() if isinstance(
                t["meta_height"], pa.ChunkedArray) else t["meta_height"],
        ], schema=MEDIA_SCHEMA)


def synth_video_arrays(n: int, seed: int = 21, max_frames: int = 24):
    """Yield (media_id, frames (f, h, w, 3) uint8 YCbCr) — deterministic
    moving-gradient clips; the raw-plane source of truth shared by
    ``synth_video_table`` (encodes) and the video oracle side-table
    writer (dumps sampled-frame planes)."""
    rng = np.random.default_rng(seed)
    for i in range(n):
        f = int(rng.integers(4, max_frames + 1))
        w, h = int(rng.integers(16, 33)), int(rng.integers(16, 33))
        base = np.linspace(0, 255, w, dtype=np.float64)[None, :]
        clip = np.empty((f, h, w, 3), np.uint8)
        for k in range(f):
            y = (base + 7 * k + rng.integers(0, 16, size=(h, w))) % 256
            cb = (base * 0.5 + 3 * k) % 256
            cr = (255 - base + 5 * k) % 256
            clip[k] = np.stack([y, np.broadcast_to(cb, (h, w)),
                                np.broadcast_to(cr, (h, w))],
                               axis=-1).astype(np.uint8)
        yield (f"vid-{i:08d}", clip)


def synth_video_table(n: int, seed: int = 21) -> pa.Table:
    ids, payloads, ws, hs = [], [], [], []
    for mid, clip in synth_video_arrays(n, seed):
        ids.append(mid)
        payloads.append(encode_y4m(clip))
        ws.append(clip.shape[2]); hs.append(clip.shape[1])
    return pa.Table.from_arrays([
        pa.array(ids, pa.string()),
        pa.array([Y4M_TYPE] * n, pa.string()),
        pa.array(payloads, pa.binary()),
        pa.array(np.asarray(ws, dtype=np.int32), pa.int32()),
        pa.array(np.asarray(hs, dtype=np.int32), pa.int32()),
    ], schema=MEDIA_SCHEMA)


def write_video_truth_side_tables(n: int, out_dir: str, seed: int = 21,
                                  step: int = 4) -> str:
    """Ground truth for the frame-sample oracle, from the GENERATOR's raw
    planes (the codec never touches them): per video, the planes of the
    frames a step-``step`` sample keeps.

        vmeta.parquet   (media_id, w, h, n_frames, n_sampled)
        vplanes.parquet (media_id, y, cb, cr)  one row per sampled pixel

    The sampling rule (indices 0, step, 2*step, ...) is replicated here
    as plain slicing; features are recomputed by SQL aggregates."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    mp_ = os.path.join(out_dir, "vmeta.parquet")
    pp = os.path.join(out_dir, "vplanes.parquet")
    import logtrics_ray.functions.multimodal as _self
    from logtrics_ray import hashing as H
    fresh, mark = H.fixture_cache(
        [mp_, pp], f"{H.source_version(_self)}:{n}:{seed}:{step}")
    if fresh:
        return out_dir
    m_id, m_w, m_h, m_n, m_s = [], [], [], [], []
    p_id, p_pl = [], []
    for mid, clip in synth_video_arrays(n, seed):
        sub = clip[::step]
        px = sub.reshape(-1, 3).astype(np.int64)
        p_id.append(np.full(px.shape[0], mid, dtype=object))
        p_pl.append(px)
        m_id.append(mid); m_w.append(clip.shape[2]); m_h.append(clip.shape[1])
        m_n.append(clip.shape[0]); m_s.append(sub.shape[0])
    pq.write_table(pa.table({
        "media_id": pa.array(m_id, pa.string()),
        "w": np.asarray(m_w, dtype=np.int64),
        "h": np.asarray(m_h, dtype=np.int64),
        "n_frames": np.asarray(m_n, dtype=np.int64),
        "n_sampled": np.asarray(m_s, dtype=np.int64)}), mp_)
    pl = (np.concatenate(p_pl) if p_pl else np.empty((0, 3), np.int64))
    pq.write_table(pa.table({
        "media_id": pa.array(np.concatenate(p_id) if p_id else [], pa.string()),
        "y": pl[:, 0], "cb": pl[:, 1], "cr": pl[:, 2]}), pp)
    mark()
    return out_dir

# ------------------------------------------ real PNG codec (stdlib zlib) --
# Non-interlaced 8-bit RGB (color type 2) only — the common training-data
# shape.  Pure stdlib: zlib inflate/deflate + numpy (un)filtering; no image
# library.  All five scanline filters (None/Sub/Up/Average/Paeth) are
# implemented on both sides so foreign encoders' output decodes too.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (int16 inputs, uint8-range values)."""
    p = a.astype(np.int16) + b - c
    pa_, pb, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa_ <= pb) & (pa_ <= pc_), a,
                    np.where(pb <= pc_, b, c)).astype(np.uint8)


def encode_png(rgb: np.ndarray, filter_type: int = 4) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes (color type 2, bit depth 8,
    non-interlaced).  ``filter_type`` 0-4 is applied to every scanline
    (filtering references ORIGINAL bytes, so it vectorizes row-wise)."""
    import struct
    import zlib
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8 and 0 <= filter_type <= 4
    rows = np.ascontiguousarray(rgb).reshape(h, w * 3)
    prior = np.vstack([np.zeros((1, w * 3), np.uint8), rows[:-1]])
    left = np.zeros_like(rows)
    left[:, 3:] = rows[:, :-3]
    ul = np.zeros_like(rows)
    ul[1:, 3:] = rows[:-1, :-3]
    if filter_type == 0:
        filt = rows
    elif filter_type == 1:
        filt = rows - left
    elif filter_type == 2:
        filt = rows - prior
    elif filter_type == 3:
        filt = rows - ((left.astype(np.uint16) + prior) >> 1).astype(np.uint8)
    else:
        filt = rows - _paeth_vec(left, prior, ul)
    raw = np.empty((h, w * 3 + 1), np.uint8)
    raw[:, 0] = filter_type
    raw[:, 1:] = filt
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8.  Supports non-interlaced 8-bit RGB
    (color type 2) with any per-scanline filter; CRCs are verified.

    Filters None/Sub/Up vectorize fully (Sub is a per-channel cumsum mod
    256); Average/Paeth reconstruct left-to-right per pixel — fine for the
    thumbnail-sized payloads this dependency-free path targets."""
    import struct
    import zlib
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos, idat, ihdr = len(_PNG_SIG), [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4: pos + 8]
        data = payload[pos + 8: pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError(
            "only non-interlaced 8-bit RGB PNG supported "
            f"(depth={depth} color={color} interlace={interlace})")
    stride = w * 3
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    raw = raw.reshape(h, stride + 1)
    out = np.empty((h, stride), np.uint8)
    zero_row = np.zeros(stride, np.uint8)
    for y in range(h):
        ft, row = int(raw[y, 0]), raw[y, 1:]
        prior = out[y - 1] if y else zero_row
        if ft == 0:
            out[y] = row
        elif ft == 1:      # Sub: per-channel cumsum mod 256
            out[y] = np.cumsum(
                row.reshape(w, 3).astype(np.uint64), axis=0).astype(np.uint8) \
                .reshape(stride)
        elif ft == 2:
            out[y] = row + prior
        elif ft in (3, 4):  # Average/Paeth need reconstructed left pixel
            rec = out[y]
            left = np.zeros(3, np.uint16)
            pr = prior.reshape(w, 3).astype(np.uint16)
            rw = row.reshape(w, 3).astype(np.uint16)
            for x in range(w):
                if ft == 3:
                    pred = (left + pr[x]) >> 1
                else:
                    pred = _paeth_vec(left.astype(np.int16),
                                      pr[x].astype(np.int16),
                                      (pr[x - 1] if x else np.zeros(3)).astype(np.int16))
                left = (rw[x] + pred) & 0xFF
                rec[x * 3:(x + 1) * 3] = left.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter {ft}")
    return out.reshape(h, w, 3)


def synth_media_arrays(n: int, seed: int = 9):
    """Yield (media_id, media_type, raw, w, h) where ``raw`` is the
    PRE-ENCODE uint8 (h, w, 3) image or float sample signal — the single
    source of truth shared by ``synth_real_media_table`` (which encodes
    through the codecs) and ``write_media_truth_side_tables`` (which
    dumps the raw planes for the DuckDB replay oracle).  The oracle thus
    checks encode -> decode -> featurize against the never-encoded
    values."""
    rng = np.random.default_rng(seed)
    for i in range(n):
        if i % 2 == 0:
            w, h = int(rng.integers(16, 48)), int(rng.integers(16, 48))
            grad = np.linspace(0, 255, w, dtype=np.float64)[None, :, None]
            img = (grad + rng.integers(0, 64, size=(h, w, 3))).clip(0, 255)
            yield (f"med-{i:08d}", PNG_TYPE if i % 4 == 0 else PPM_TYPE,
                   img.astype(np.uint8), w, h)
        else:
            rate = 8000
            t = np.arange(int(rng.integers(800, 2400))) / rate
            f0 = float(rng.integers(100, 900))
            sig = (0.5 * np.sin(2 * np.pi * f0 * t)
                   + 0.1 * rng.normal(size=t.size))
            yield (f"med-{i:08d}", WAV_TYPE, sig, 0, 0)


def synth_real_media_table(n: int, seed: int = 9) -> pa.Table:
    """Deterministic corpus of REAL decodable payloads: PPM images
    (gradient + seeded noise), WAV clips (tone + noise), and PNG images
    (every 4th row; Paeth-filtered, stdlib zlib) — three real codecs."""
    ids, types, payloads, ws, hs = [], [], [], [], []
    for mid, mt, raw, w, h in synth_media_arrays(n, seed):
        if mt == PNG_TYPE:
            payloads.append(encode_png(raw))
        elif mt == PPM_TYPE:
            payloads.append(encode_ppm(raw))
        else:
            payloads.append(encode_wav_pcm16(raw, 8000))
        ids.append(mid); types.append(mt); ws.append(w); hs.append(h)
    return pa.Table.from_arrays([
        pa.array(ids, pa.string()), pa.array(types, pa.string()),
        pa.array(payloads, pa.binary()),
        pa.array(np.asarray(ws, dtype=np.int32), pa.int32()),
        pa.array(np.asarray(hs, dtype=np.int32), pa.int32()),
    ], schema=MEDIA_SCHEMA)


def write_media_truth_side_tables(n: int, out_dir: str, seed: int = 9,
                                  resize_to: tuple[int, int] | None = None
                                  ) -> str:
    """Ground-truth side tables for the multimodal DuckDB replay oracles.

    Writes, from the GENERATOR's raw arrays (the codecs under test are
    never called here):

        meta.parquet    (media_id, media_type, w, h)
        pixels.parquet  (media_id, r, g, b)      one row per pixel
        samples.parquet (media_id, idx, v)       one row per audio sample

    The feature math (channel means, luma std, RMS, zero-cross rate) is
    replayed by SQL aggregates over these rows, independently of the
    engine's numpy kernels.  Two contracts are replicated inline rather
    than imported, so the side table stays independent of the code under
    test: PCM16 quantization (clip -> *32767 -> C-cast to int16 ->
    /32767) and, when ``resize_to`` is given, the nearest-neighbor index
    formula ``src = arange(out) * in // out``."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    mp = os.path.join(out_dir, "meta.parquet")
    pp = os.path.join(out_dir, "pixels.parquet")
    sp = os.path.join(out_dir, "samples.parquet")
    import logtrics_ray.functions.multimodal as _self
    from logtrics_ray import hashing as H
    fresh, mark = H.fixture_cache(
        [mp, pp, sp], f"{H.source_version(_self)}:{n}:{seed}:{resize_to}")
    if fresh:
        return out_dir
    m_id, m_ty, m_w, m_h = [], [], [], []
    p_id, p_rgb = [], []
    s_id, s_idx, s_v = [], [], []
    for mid, mt, raw, w, h in synth_media_arrays(n, seed):
        if mt == WAV_TYPE:
            q = (np.clip(raw, -1.0, 1.0) * 32767.0).astype(np.int16)
            v = q.astype(np.float64) / 32767.0
            s_id.append(np.full(v.size, mid, dtype=object))
            s_idx.append(np.arange(v.size, dtype=np.int64))
            s_v.append(v)
        else:
            if resize_to is not None:
                tw, th = resize_to
                yi = (np.arange(th) * h // th).astype(np.int64)
                xi = (np.arange(tw) * w // tw).astype(np.int64)
                raw, w, h = raw[yi[:, None], xi[None, :], :], tw, th
            px = raw.reshape(-1, 3).astype(np.int64)
            p_id.append(np.full(px.shape[0], mid, dtype=object))
            p_rgb.append(px)
        m_id.append(mid); m_ty.append(mt); m_w.append(w); m_h.append(h)
    pq.write_table(pa.table({
        "media_id": pa.array(m_id, pa.string()),
        "media_type": pa.array(m_ty, pa.string()),
        "w": np.asarray(m_w, dtype=np.int64),
        "h": np.asarray(m_h, dtype=np.int64)}), mp)
    rgb = (np.concatenate(p_rgb) if p_rgb else np.empty((0, 3), np.int64))
    pq.write_table(pa.table({
        "media_id": pa.array(np.concatenate(p_id) if p_id else [], pa.string()),
        "r": rgb[:, 0], "g": rgb[:, 1], "b": rgb[:, 2]}), pp)
    pq.write_table(pa.table({
        "media_id": pa.array(np.concatenate(s_id) if s_id else [], pa.string()),
        "idx": (np.concatenate(s_idx) if s_idx else np.empty(0, np.int64)),
        "v": (np.concatenate(s_v) if s_v else np.empty(0, np.float64))}), sp)
    mark()
    return out_dir


class MediaDecoder:
    """Stateful per-batch decode+featurize stage (real kernels).

    Per media_type:
      PPM  -> [width, height, mean_r, mean_g, mean_b, std_luma, 0, 0]
      WAV  -> [duration_s, rate, rms, zero_cross_rate, mean, std, 0, 0]
    Unknown types raise (strict=True) or emit a null feature row
    (strict=False, log-and-continue counted in ``self.errors``)."""

    FEATURE_DIM = 8

    def __init__(self, strict: bool = True):
        self.strict = strict
        self.errors = 0

    def _features(self, media_type: str, payload: bytes) -> np.ndarray:
        f = np.zeros(self.FEATURE_DIM, dtype=np.float64)
        if media_type in (PPM_TYPE, PNG_TYPE):
            decode = decode_ppm if media_type == PPM_TYPE else decode_png
            img = decode(payload).astype(np.float64)
            luma = img @ np.array([0.2126, 0.7152, 0.0722])
            f[:6] = [img.shape[1], img.shape[0],
                     img[..., 0].mean(), img[..., 1].mean(),
                     img[..., 2].mean(), luma.std()]
        elif media_type == WAV_TYPE:
            x, rate = decode_wav_pcm16(payload)
            zc = float(np.mean(np.signbit(x[:-1]) != np.signbit(x[1:]))) \
                if x.size > 1 else 0.0
            f[:6] = [x.size / rate, rate, float(np.sqrt(np.mean(x * x))),
                     zc, float(x.mean()), float(x.std())]
        elif media_type == Y4M_TYPE:
            frames, fps = decode_y4m(payload)
            pl = frames.astype(np.float64)
            f[:8] = [frames.shape[0], frames.shape[2], frames.shape[1],
                     pl[..., 0].mean(), pl[..., 0].std(),
                     pl[..., 1].mean(), pl[..., 2].mean(), fps]
        else:
            raise NotImplementedError(
                f"no dependency-free decoder for {media_type!r}; JPEG etc. "
                "need an image library absent from this environment")
        return f

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["media_id"].combine_chunks() if isinstance(
            t["media_id"], pa.ChunkedArray) else t["media_id"]
        types = t["media_type"].to_pylist()
        payloads = t["payload"].to_pylist()
        feats = np.full((len(types), self.FEATURE_DIM), np.nan)
        ok = np.ones(len(types), dtype=bool)
        for i, (mt, p) in enumerate(zip(types, payloads)):
            try:
                feats[i] = self._features(mt, p)
            except (NotImplementedError, ValueError):
                if self.strict:
                    raise
                ok[i] = False
                self.errors += 1
        return pa.Table.from_arrays([
            ids,
            t["media_type"].combine_chunks() if isinstance(
                t["media_type"], pa.ChunkedArray) else t["media_type"],
            pa.array(list(feats), pa.list_(pa.float64())),
            pa.array(ok, pa.bool_()),
        ], names=["media_id", "media_type", "feature", "decoded"])


class PpmResize:
    """Real resize stage for PPM and PNG payloads: decode ->
    nearest-neighbor -> re-encode (same container the row arrived in).
    Other rows pass through unchanged (resize is a no-op for them; a
    JPEG resize would need an external library)."""

    def __init__(self, target_w: int = 32, target_h: int = 32):
        self.tw, self.th = target_w, target_h

    def __call__(self, t: pa.Table) -> pa.Table:
        types = t["media_type"].to_pylist()
        payloads = t["payload"].to_pylist()
        out_p, out_w, out_h = [], [], []
        ws = t["meta_width"].to_pylist()
        hs = t["meta_height"].to_pylist()
        for mt, p, w, h in zip(types, payloads, ws, hs):
            if mt in (PPM_TYPE, PNG_TYPE):
                dec, enc = ((decode_ppm, encode_ppm) if mt == PPM_TYPE
                            else (decode_png, encode_png))
                out_p.append(enc(resize_nearest(dec(p), self.tw, self.th)))
                out_w.append(self.tw); out_h.append(self.th)
            else:
                out_p.append(p); out_w.append(w); out_h.append(h)
        return pa.Table.from_arrays([
            t["media_id"].combine_chunks() if isinstance(
                t["media_id"], pa.ChunkedArray) else t["media_id"],
            t["media_type"].combine_chunks() if isinstance(
                t["media_type"], pa.ChunkedArray) else t["media_type"],
            pa.array(out_p, pa.binary()),
            pa.array(np.asarray(out_w, dtype=np.int32), pa.int32()),
            pa.array(np.asarray(out_h, dtype=np.int32), pa.int32()),
        ], schema=MEDIA_SCHEMA)


def decode_media_features(ds, batch_size: int = 64):
    """Media Dataset -> real decoded features (task mode, process-cached
    decoder; small batch_size because binary rows are wide)."""
    from logtrics_ray.functions.dedup import process_cached

    def fn(t: pa.Table) -> pa.Table:
        return process_cached(MediaDecoder, strict=True)(t)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def resize_media(ds, target_w: int = 32, target_h: int = 32,
                 batch_size: int = 64):
    from logtrics_ray.functions.dedup import process_cached

    def fn(t: pa.Table) -> pa.Table:
        return process_cached(PpmResize, target_w=target_w,
                              target_h=target_h)(t)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


# --------------------------------------------- declared stubs (non-PPM) ---

class ImageDecodeStub:
    """Actor-pool decode stage.  Real codec absent -> fake=True produces a
    deterministic feature (blake2b of payload -> 8 float32 'embedding'),
    fake=False raises NotImplementedError (clearly-marked stub)."""

    FEATURE_DIM = 8

    def __init__(self, fake: bool = False):
        self.fake = fake

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires an image library not present in this "
                "environment; run with fake=True for the deterministic stub")
        h = hashlib.blake2b(payload, digest_size=4 * self.FEATURE_DIM).digest()
        return (np.frombuffer(h, dtype=np.uint32).astype(np.float32)
                / np.float32(2**32))

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        feats = np.stack([self._decode_one(p) for p in payloads]) if payloads else \
            np.empty((0, self.FEATURE_DIM), dtype=np.float32)
        return pa.Table.from_arrays([
            t["media_id"].combine_chunks() if isinstance(t["media_id"], pa.ChunkedArray)
            else t["media_id"],
            pa.array(list(feats), pa.list_(pa.float32())),
            pa.array(np.asarray([len(p) for p in payloads], dtype=np.int64), pa.int64()),
        ], names=["media_id", "feature", "payload_bytes"])


class ResizeStub(ImageDecodeStub):
    """Resize stage contract: payload in, payload out + new dims.  The fake
    'resize' truncates the payload deterministically (plumbing test only)."""

    def __init__(self, target: int = 256, fake: bool = False):
        super().__init__(fake=fake)
        self.target = target

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("resize requires an image library; use fake=True")
        payloads = [p[: self.target] for p in t["payload"].to_pylist()]
        n = t.num_rows
        return pa.Table.from_arrays([
            t["media_id"].combine_chunks() if isinstance(t["media_id"], pa.ChunkedArray)
            else t["media_id"],
            t["media_type"].combine_chunks() if isinstance(t["media_type"], pa.ChunkedArray)
            else t["media_type"],
            pa.array(payloads, pa.binary()),
            pa.array(np.full(n, self.target, dtype=np.int32), pa.int32()),
            pa.array(np.full(n, self.target, dtype=np.int32), pa.int32()),
        ], schema=MEDIA_SCHEMA)


def decode_features(ds, fake: bool = True, batch_size: int = 64,
                    concurrency=(1, 2)):
    """Media Dataset -> feature Dataset via the actor-pool stub.  Small
    batch_size on purpose: binary payload rows are wide."""
    return ds.map_batches(ImageDecodeStub, fn_constructor_kwargs=dict(fake=fake),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)
