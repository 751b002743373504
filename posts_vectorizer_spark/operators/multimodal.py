"""Multimodal columns (Tier C, BASELINE.json): opaque binary payloads with
typed metadata, plus feature-extraction plumbing over ``mapInPandas``.

Design (SURVEY.md §2.12-4): media rows are
``(doc_id, media_type, payload: binary, meta: struct)``. The engine treats
payloads as opaque bytes end-to-end — schema, partitioning, Arrow batch
shapes, and UDF signatures are real and tested. COMPRESSED codecs
(JPEG/MP4/...) are stubbed behind a clearly-marked NotImplementedError
(``use_real_codecs=True``) because no image/audio libraries exist in this
container, with a deterministic byte-level fake as the default. Since r8
the UNCOMPRESSED containers decode for REAL with zero dependencies:
WAV/PCM16 (stdlib writer + RIFF chunk walker), 24-bit BMP (bottom-up/BGR/
padded-row parser + nearest-neighbor resize), and uncompressed AVI
(hdrl/movi tree walk + DIB frame sampling) — each hash-checked end to end
against a formula oracle (`multimodal_{wav,bmp}_ingest`,
`multimodal_avi_frame_sample`).

At 100 TB: payload columns dominate bytes — keep them OUT of shuffles
(extract features first, then join features; never groupBy a payload), and
read real assets via ``spark.read.format("binaryFile")`` or manifest tables
of object-store URLs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, FloatType, LongType, StructField,
    StructType,
)

from ..sources import spread

N_FAKE_FEATURES = 8

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def attach_payload(documents: DataFrame) -> DataFrame:
    """Wrap each document as a media row: utf-8 payload bytes + typed meta.
    Pure built-ins (encode/length/struct) — no UDF at the storage boundary."""
    payload = F.encode(F.col("text"), "utf-8")
    return documents.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for image/audio decode: mean of each of
    N_FAKE_FEATURES equal byte-slices, scaled to [0, 1]."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(N_FAKE_FEATURES, dtype=np.float32)
    chunks = np.array_split(arr.astype(np.float64), N_FAKE_FEATURES)
    return np.array(
        [c.mean() / 255.0 if c.size else 0.0 for c in chunks], dtype=np.float32
    )


def extract_features(media: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """(doc_id, n_bytes, features) via mapInPandas — the UD1 pattern: any
    expensive per-worker init (a model, a decoder) belongs in the iterator
    prologue, paid once per partition, not per row
    (/root/reference/worker.py:18 spaCy-load analog)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if use_real_codecs:
            # Real decode would init PIL/libav HERE (once per partition).
            raise NotImplementedError(
                "real media codecs are not available in this image; "
                "run with use_real_codecs=False for the deterministic fake"
            )
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": pdf["payload"].map(
                        lambda b: _fake_decode(b).tolist()
                    ),
                }
            )

    return spread(media.select("doc_id", "payload")).mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)


def resize_media(
    media: DataFrame, target_bytes: int = 64, use_real_codecs: bool = False
) -> DataFrame:
    """Resize plumbing (image-thumbnail analog): each payload is re-sampled
    to exactly ``target_bytes`` by deterministic index interpolation — the
    byte-level stand-in for PIL's resize; the real codec would decode,
    resize pixels, and re-encode inside the same iterator. One row in, one
    smaller row out: at scale this runs BEFORE any shuffle so downstream
    stages move thumbnails, not originals."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if use_real_codecs:
            raise NotImplementedError(
                "real image resize needs PIL; not available in this image"
            )
        for pdf in batches:
            def shrink(b: bytes) -> bytes:
                arr = np.frombuffer(b, dtype=np.uint8)
                if arr.size == 0:
                    return bytes(target_bytes)
                idx = np.linspace(0, arr.size - 1, target_bytes).astype(np.int64)
                return arr[idx].tobytes()

            out = pdf["payload"].map(shrink)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "n_bytes": out.map(len).astype("int64"),
                }
            )

    return spread(media.select("doc_id", "payload")).mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_id", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame, n_frames: int = 4, use_real_codecs: bool = False
) -> DataFrame:
    """Frame-sampling plumbing (video analog): each payload fans out to
    ``n_frames`` evenly-spaced byte windows, one output row per frame —
    the 1->N mapInPandas shape real frame extraction uses (libav would
    seek+decode keyframes in the same loop). Fan-out happens map-side;
    only sampled frames ever reach a shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if use_real_codecs:
            raise NotImplementedError(
                "real frame extraction needs libav/ffmpeg; not in this image"
            )
        for pdf in batches:
            ids, fids, frames = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(b, dtype=np.uint8)
                window = max(1, arr.size // max(n_frames, 1))
                for k in range(n_frames):
                    start = k * window
                    ids.append(doc_id)
                    fids.append(k)
                    frames.append(arr[start:start + window].tobytes())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_id": fids, "frame": frames}
            )

    return spread(media.select("doc_id", "payload")).mapInPandas(run, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# oracle-checkable feature slices (the [Q] twin of extract_features)
# ---------------------------------------------------------------------------

SLICE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("slice", LongType()),
        StructField("mean_scaled", DoubleType()),
    ]
)


def extract_feature_slices(
    media: DataFrame, n_slices: int = N_FAKE_FEATURES
) -> DataFrame:
    """Long-form fake-codec features at FULL double precision over the
    payload's decoded CODEPOINTS — the same Arrow mapInPandas plumbing as
    :func:`extract_features`, but with every arithmetic step chosen to be
    re-statable in SQL (codepoints not bytes, float64 not float32,
    half-away round-6 inside the kernel): the [Q] twin that lets the
    driver hash-verify the multimodal UDF pipeline end-to-end.
    np.array_split slicing = first (n % k) slices one longer, mirrored
    exactly by the oracle's start/length arithmetic."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_bytes": [], "slice": [], "mean_scaled": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                cps = np.fromiter(
                    (ord(c) for c in bytes(payload).decode("utf-8")),
                    dtype=np.float64,
                )
                for i, chunk in enumerate(np.array_split(cps, n_slices)):
                    m = (chunk.sum() / chunk.size) / 255.0 if chunk.size else 0.0
                    out["doc_id"].append(doc_id)
                    out["n_bytes"].append(len(payload))
                    out["slice"].append(i)
                    out["mean_scaled"].append(
                        np.floor(m * 1e6 + 0.5) / 1e6  # half-away round-6
                    )
            yield pd.DataFrame(out)

    return spread(media.select("doc_id", "payload")).mapInPandas(run, SLICE_SCHEMA)


def feature_slices_sql(n_slices: int = N_FAKE_FEATURES) -> str:
    """The identical computation in DuckDB over documents.text."""
    return f"""
WITH chars AS (
  SELECT doc_id,
         list_transform(split(text, ''), mm_c -> ord(mm_c)) AS cps,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents
),
sliced AS (
  SELECT doc_id, n_bytes, CAST(t.i AS BIGINT) AS slice,
         len(cps) // {n_slices} + CASE WHEN t.i < len(cps) % {n_slices}
                                       THEN 1 ELSE 0 END AS slice_len,
         t.i * (len(cps) // {n_slices})
           + least(t.i, len(cps) % {n_slices}) AS slice_start
  FROM chars, unnest(generate_series(0, {n_slices - 1})) AS t(i)
)
SELECT s.doc_id, s.n_bytes, s.slice,
       CAST(round(CASE WHEN s.slice_len > 0
                  THEN (list_sum(c.cps[s.slice_start + 1 :
                                       s.slice_start + s.slice_len])
                        / s.slice_len) / 255.0
                  ELSE 0.0 END, 6) AS DOUBLE) AS mean_scaled
FROM sliced s JOIN chars c USING (doc_id)
"""


# ---------------------------------------------------------------------------
# REAL audio codec path: WAV/PCM16 (built r8, staged r9)
# ---------------------------------------------------------------------------
# The compressed-format codecs above stay env-gated (no PIL/libav in this
# image), but WAV is a container this repo CAN decode for real with zero
# dependencies: the writer is the stdlib `wave` module, the reader a
# hand-rolled RIFF chunk walker (it must skip unknown chunks — the part
# naive offset-44 "parsers" get wrong). Synthesis uses an integer sample
# formula both engines can state, so the end-to-end encode -> REAL decode
# -> feature pipeline is hash-checked against a DuckDB oracle computing
# the same features straight from the formula: any header/layout/parse
# bug changes the decoded samples and fails the hash.

def synth_samples(doc_id: int, n: int) -> np.ndarray:
    """Deterministic int16 test signal: s_i = ((doc_id*31 + i*17) % 65536)
    - 32768 — pure nonnegative-integer arithmetic, statable in SQL."""
    i = np.arange(n, dtype=np.int64)
    return (((doc_id * 31 + i * 17) % 65536) - 32768).astype(np.int16)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """PCM16 mono WAV via the stdlib encoder (a REAL container writer,
    not a fake): RIFF/WAVE + fmt + data chunks."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(raw: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 samples) from WAV bytes — a real RIFF parser:
    verifies the RIFF/WAVE magic, WALKS chunks (skipping unknown ones,
    honoring the odd-size pad byte) to find fmt/data, and checks the
    format is uncompressed PCM16 mono before interpreting the payload."""
    import struct

    if len(raw) < 12 or raw[0:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(raw):
        cid, size = raw[pos : pos + 4], struct.unpack(
            "<I", raw[pos + 4 : pos + 8]
        )[0]
        body = raw[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _byterate, _align, bits = fmt
    if (audio_format, channels, bits) != (1, 1, 16):
        raise ValueError(f"unsupported format: {fmt}")
    return rate, np.frombuffer(data, dtype="<i2")


WAV_FEATURE_SCHEMA = (
    "doc_id long, sample_rate int, n_samples int, peak_abs int,"
    " sum_sq long, zero_crossings int, rms double"
)


def wav_ingest_features(base: DataFrame) -> DataFrame:
    """(doc_id, n, rate) -> synthesize -> ENCODE to real WAV bytes ->
    DECODE with the RIFF parser -> integer-exact audio features. The
    encode and decode happen back-to-back per Arrow batch (the storage
    boundary pattern of vectors.encode_f32/decode_f32): n_samples and
    sample_rate in the OUTPUT come from the PARSED container, so a
    header bug cannot hide; sum_sq/peak/zero-crossings are exact
    integers over the decoded samples and rms is one double from them.

    At 100 TB: payloads never shuffle — features extract in the scan
    stage and only the 7-column profile moves (the multimodal rule
    above)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, n, rate in zip(
                pdf["doc_id"], pdf["n"], pdf["rate"]
            ):
                raw = encode_wav(synth_samples(int(doc_id), int(n)), int(rate))
                prate, s = decode_wav(raw)
                s64 = s.astype(np.int64)
                sum_sq = int((s64 * s64).sum())
                zc = int(((s64[:-1] < 0) != (s64[1:] < 0)).sum()) if len(s64) > 1 else 0
                peak = int(np.abs(s64).max()) if len(s64) else 0
                # half-away-from-zero at 6dp (Spark/DuckDB ROUND), not Python's
                # banker's round — rms >= 0 so floor(x*1e6+0.5)
                rms = (
                    float(np.floor(np.sqrt(sum_sq / len(s64)) * 1e6 + 0.5) / 1e6)
                    if len(s64) else 0.0
                )
                out.append(
                    (int(doc_id), prate, len(s64), peak, sum_sq, zc, rms)
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "sample_rate", "n_samples", "peak_abs",
                    "sum_sq", "zero_crossings", "rms",
                ],
            )

    return spread(base).mapInPandas(run, WAV_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL image codec path: BMP 24-bit (built r8, staged r9)
# ---------------------------------------------------------------------------
# Same posture as the WAV path: compressed image formats stay env-gated,
# but uncompressed 24-bit BMP decodes for real with zero dependencies —
# and it carries two genuine parsing subtleties a fake codec never
# exercises: rows are stored BOTTOM-UP, and every row pads to a 4-byte
# boundary (any width not divisible by 4 breaks a naive reshape).

def synth_pixels(doc_id: int, w: int, h: int) -> np.ndarray:
    """(h, w, 3) uint8 RGB test image from an integer formula both
    engines can state: r=(doc_id+3x+7y)%256, g=(2x+5y+doc_id)%256,
    b=(x*y+doc_id*11)%256 (x = column, y = TOP-DOWN row index)."""
    y, x = np.mgrid[0:h, 0:w]
    d = int(doc_id)
    return np.stack(
        [
            (d + 3 * x + 7 * y) % 256,
            (2 * x + 5 * y + d) % 256,
            (x * y + d * 11) % 256,
        ],
        axis=2,
    ).astype(np.uint8)


def encode_bmp(rgb: np.ndarray) -> bytes:
    """24-bit uncompressed BMP (BITMAPFILEHEADER + BITMAPINFOHEADER):
    BGR byte order, rows bottom-up, 4-byte row padding."""
    import struct

    h, w, _ = rgb.shape
    pad = (4 - (3 * w) % 4) % 4
    row_bytes = 3 * w + pad
    data_size = row_bytes * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += rgb[y, :, ::-1].tobytes()  # RGB -> BGR
        body += b"\x00" * pad
    return header + bytes(body)


def decode_bmp(raw: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from 24-bit BMP bytes — verifies the magic,
    reads the pixel-data offset from the file header (not assumed 54),
    requires BI_RGB 24bpp, and undoes bottom-up order, BGR, and row
    padding."""
    import struct

    if len(raw) < 54 or raw[0:2] != b"BM":
        raise ValueError("not a BMP file")
    data_off = struct.unpack("<I", raw[10:14])[0]
    hdr_size, w, h = struct.unpack("<Iii", raw[14:26])
    planes, bpp = struct.unpack("<HH", raw[26:30])
    compression = struct.unpack("<I", raw[30:34])[0]
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: hdr={hdr_size} bpp={bpp}")
    if h <= 0 or w <= 0:
        raise ValueError("top-down or degenerate BMP not supported")
    pad = (4 - (3 * w) % 4) % 4
    row_bytes = 3 * w + pad
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        start = data_off + i * row_bytes
        row = np.frombuffer(raw[start : start + 3 * w], dtype=np.uint8)
        out[h - 1 - i] = row.reshape(w, 3)[:, ::-1]  # BGR -> RGB, bottom-up
    return out


def resize_nearest(rgb: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize with the floor sampling grid
    (sy = j*h // out_h, sx = i*w // out_w) — integer arithmetic only,
    statable in SQL."""
    h, w, _ = rgb.shape
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return rgb[ys[:, None], xs[None, :]]


BMP_FEATURE_SCHEMA = (
    "doc_id long, width int, height int,"
    " sum_r long, sum_g long, sum_b long,"
    " rsum_r long, rsum_g long, rsum_b long"
)

_BMP_THUMB = 8  # thumbnail side for the resize stage


def bmp_ingest_features(base: DataFrame) -> DataFrame:
    """(doc_id, w, h) -> synthesize -> ENCODE to real BMP bytes ->
    DECODE with the header-driven parser -> features: parsed
    dimensions, exact per-channel sums over the FULL decoded image
    (proves decode incl. padding/bottom-up/BGR), and per-channel sums
    over the 8x8 nearest-neighbor thumbnail (proves the resize sampling
    grid). All integers; payloads never shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, w, h in zip(pdf["doc_id"], pdf["w"], pdf["h"]):
                raw = encode_bmp(synth_pixels(int(doc_id), int(w), int(h)))
                img = decode_bmp(raw)
                th = resize_nearest(img, _BMP_THUMB, _BMP_THUMB)
                s = img.astype(np.int64).sum(axis=(0, 1))
                rs = th.astype(np.int64).sum(axis=(0, 1))
                out.append(
                    (
                        int(doc_id), img.shape[1], img.shape[0],
                        int(s[0]), int(s[1]), int(s[2]),
                        int(rs[0]), int(rs[1]), int(rs[2]),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "width", "height",
                    "sum_r", "sum_g", "sum_b",
                    "rsum_r", "rsum_g", "rsum_b",
                ],
            )

    return spread(base).mapInPandas(run, BMP_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL video container path: uncompressed AVI (DIB frames) (built r8,
# staged r9)
# ---------------------------------------------------------------------------
# Completes the audio/image/video triple: AVI is RIFF (the same chunk
# grammar as WAV) with a LIST hierarchy — hdrl(avih, strl(strh, strf))
# then movi(00db raw DIB frames). Frames are bottom-up BGR padded rows
# (the BMP pixel layout without the file header). Built to the published
# spec; unlike WAV there is no stdlib second reader in this image, so
# the cross-checks are the formula oracle (any layout bug changes the
# sampled-frame sums) plus spec-pinned header tests.

def synth_frame(doc_id: int, t: int, w: int, h: int) -> np.ndarray:
    """Frame t of the synthetic clip: the BMP formula with the frame
    index folded into the doc term (statable in SQL)."""
    return synth_pixels(int(doc_id) + 1000 * int(t), w, h)


def _dib_body(rgb: np.ndarray) -> bytes:
    h, w, _ = rgb.shape
    pad = (4 - (3 * w) % 4) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):
        body += rgb[y, :, ::-1].tobytes()
        body += b"\x00" * pad
    return bytes(body)


def _chunk(cid: bytes, body: bytes) -> bytes:
    import struct

    return cid + struct.pack("<I", len(body)) + body + (
        b"\x00" if len(body) % 2 else b""
    )


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi(frames: list[np.ndarray], fps: int) -> bytes:
    """Minimal spec-correct uncompressed AVI: RIFF('AVI ') containing
    LIST hdrl (avih + LIST strl(strh vids/DIB, strf BITMAPINFOHEADER))
    and LIST movi with one 00db DIB chunk per frame."""
    import struct

    h, w, _ = frames[0].shape
    pad = (4 - (3 * w) % 4) % 4
    frame_bytes = (3 * w + pad) * h
    n = len(frames)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, frame_bytes * fps, 0, 0x10, n, 0, 1,
        frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n,
        frame_bytes, 0, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00db", _dib_body(f)) for f in frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(raw: bytes) -> tuple[int, list[np.ndarray]]:
    """(fps, frames RGB) — walks the RIFF tree: verifies 'AVI ', reads
    w/h/bpp from strf, rate/scale from strh, then every 00db chunk in
    LIST movi becomes a bottom-up BGR padded DIB frame."""
    import struct

    if len(raw) < 12 or raw[0:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")

    def walk(buf, pos, end):
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
            yield cid, pos + 8, size
            pos += 8 + size + (size % 2)

    w = h = bpp = None
    rate = scale = None
    in_vids = False  # most recent strh in this strl declared 'vids'
    frames: list[np.ndarray] = []

    def handle(cid, off, size, depth):
        nonlocal w, h, bpp, rate, scale, in_vids
        if cid == b"LIST":
            for c2, o2, s2 in walk(raw, off + 4, off + size):
                handle(c2, o2, s2, depth + 1)
        elif cid == b"strh":
            body = raw[off : off + size]
            in_vids = body[0:4] == b"vids"
            if in_vids:
                scale, rate = struct.unpack("<II", body[20:28])
        elif cid == b"strf" and w is None and in_vids:
            # only the vids stream's format chunk describes frames — a
            # foreign AVI listing an audio strl first must not bind w/h
            _hs, w, h, _planes, bpp = struct.unpack(
                "<IiiHH", raw[off : off + 16]
            )
        elif cid == b"00db":
            frames.append((off, size))

    for cid, off, size in walk(raw, 12, len(raw)):
        handle(cid, off, size, 0)
    if w is None or bpp != 24 or h is None or h <= 0:
        raise ValueError("unsupported AVI (need 24bpp bottom-up DIB)")
    if not rate or not scale:
        raise ValueError("missing vids stream header")
    pad = (4 - (3 * w) % 4) % 4
    row_bytes = 3 * w + pad
    out = []
    for off, size in frames:
        if size != row_bytes * h:
            raise ValueError(
                f"frame chunk size {size} != {row_bytes * h} for {w}x{h}"
            )
        img = np.empty((h, w, 3), dtype=np.uint8)
        for i in range(h):
            start = off + i * row_bytes
            row = np.frombuffer(raw[start : start + 3 * w], dtype=np.uint8)
            img[h - 1 - i] = row.reshape(w, 3)[:, ::-1]
        out.append(img)
    return rate // scale, out


AVI_SAMPLE_SCHEMA = (
    "doc_id long, fps int, n_frames int, n_sampled int,"
    " frame_t int, fsum_r long, fsum_g long, fsum_b long"
)


def avi_frame_sample_features(
    base: DataFrame, stride: int
) -> DataFrame:
    """(doc_id, n_frames, w, h, fps) -> synthesize frames -> ENCODE a
    real AVI -> DECODE it -> sample every ``stride``-th frame -> one
    output row per SAMPLED frame with its exact per-channel sums. fps
    and frame count in the output come from the PARSED container."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, nf, w, h, fps in zip(
                pdf["doc_id"], pdf["nf"], pdf["w"], pdf["h"], pdf["fps"]
            ):
                frames = [
                    synth_frame(int(doc_id), t, int(w), int(h))
                    for t in range(int(nf))
                ]
                raw = encode_avi(frames, int(fps))
                pfps, decoded = decode_avi(raw)
                sampled = list(range(0, len(decoded), stride))
                for t in sampled:
                    s = decoded[t].astype(np.int64).sum(axis=(0, 1))
                    out.append(
                        (
                            int(doc_id), pfps, len(decoded), len(sampled),
                            t, int(s[0]), int(s[1]), int(s[2]),
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "fps", "n_frames", "n_sampled",
                    "frame_t", "fsum_r", "fsum_g", "fsum_b",
                ],
            )

    return spread(base).mapInPandas(run, AVI_SAMPLE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL compressed-image codec path: PNG truecolor (built r8, staged r9)
# ---------------------------------------------------------------------------
# The compressed-format gate was "no codec libraries in this image" — but
# PNG's compression is DEFLATE, and zlib is the Python STANDARD LIBRARY.
# This is a real PNG codec with no external dependencies: chunk framing
# with verified CRC32s, IHDR validation, IDAT concatenation + inflate,
# and full scanline-filter reconstruction (None/Sub/Up/Average/Paeth —
# the part that distinguishes a PNG decoder from a zlib call). The
# encoder VARIES the filter per row (y % 5) so every filter type is
# exercised on every image, not just stored.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray) -> bytes:
    """Truecolor 8-bit PNG; row y uses filter y % 5, so a decoder that
    mishandles ANY filter type fails the roundtrip."""
    import struct
    import zlib

    h, w, _ = rgb.shape
    bpp = 3
    raw = rgb.astype(np.int16)
    prev = np.zeros((w, 3), dtype=np.int16)
    out = bytearray()
    for y in range(h):
        row = raw[y]
        f = y % 5
        left = np.vstack([np.zeros((1, 3), np.int16), row[:-1]])
        upleft = np.vstack([np.zeros((1, 3), np.int16), prev[:-1]])
        if f == 0:
            filt = row
        elif f == 1:
            filt = row - left
        elif f == 2:
            filt = row - prev
        elif f == 3:
            filt = row - (left + prev) // 2
        else:
            # encoder Paeth vectorizes: predictors read RAW neighbors
            # (left/up/up-left), no recursion — unlike the decoder side
            p = left + prev - upleft
            pa = np.abs(p - left)
            pb = np.abs(p - prev)
            pc = np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc),
                left,
                np.where(pb <= pc, prev, upleft),
            )
            filt = row - pred
        out.append(f)
        out += (filt % 256).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(raw: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from truecolor PNG bytes: signature + CRC
    verification, IHDR validation (8-bit, color type 2, no interlace),
    IDAT concatenation, inflate, and per-scanline unfiltering."""
    import struct
    import zlib

    if raw[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG file")
    pos = len(_PNG_SIG)
    w = h = None
    idat = bytearray()
    while pos + 8 <= len(raw):
        ln = struct.unpack(">I", raw[pos : pos + 4])[0]
        ctype = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + ln]
        crc = struct.unpack(">I", raw[pos + 8 + ln : pos + 12 + ln])[0]
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, inter = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, color, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise ValueError(
                    f"unsupported PNG: depth={depth} color={color}"
                    f" interlace={inter}"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    plain = zlib.decompress(bytes(idat))
    stride = 1 + 3 * w
    if len(plain) != stride * h:
        raise ValueError("scanline payload size mismatch")
    # Unfilter in the FLAT BYTE domain: Sub/Average/Paeth are sequential
    # in x by spec (each byte's predictor reads the reconstructed left
    # neighbor), so the recurrence can't vectorize — but a bytearray DP
    # with plain int arithmetic beats per-element numpy indexing ~20x
    # (numpy scalar reads dominated the r8 profile; SCALE.md r9 note).
    n = 3 * w
    bpp = 3
    recon = bytearray(n * h)
    prev = bytes(n)  # zero row above the image
    for y in range(h):
        f = plain[y * stride]
        rec = bytearray(plain[y * stride + 1 : (y + 1) * stride])
        if f == 0:
            pass
        elif f == 1:  # Sub: pred = reconstructed left
            for i in range(bpp, n):
                rec[i] = (rec[i] + rec[i - bpp]) & 0xFF
        elif f == 2:  # Up: pred = reconstructed above
            for i in range(n):
                rec[i] = (rec[i] + prev[i]) & 0xFF
        elif f == 3:  # Average: pred = (left + up) // 2
            for i in range(bpp):
                rec[i] = (rec[i] + (prev[i] >> 1)) & 0xFF
            for i in range(bpp, n):
                rec[i] = (rec[i] + ((rec[i - bpp] + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth; first pixel reduces to pred = up
            for i in range(bpp):
                rec[i] = (rec[i] + prev[i]) & 0xFF
            for i in range(bpp, n):
                a = rec[i - bpp]
                b = prev[i]
                c = prev[i - bpp]
                # pa = |p-a| = |b-c|, pb = |p-b| = |a-c|, pc = |a+b-2c|
                pa = abs(b - c)
                pb = abs(a - c)
                pc = abs(a + b - 2 * c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                rec[i] = (rec[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown filter {f}")
        recon[y * n : (y + 1) * n] = rec
        prev = rec
    return np.frombuffer(bytes(recon), dtype=np.uint8).reshape(h, w, 3)


PNG_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, sum_r long, sum_g long, sum_b long"
)


def png_ingest_features(base: DataFrame) -> DataFrame:
    """(doc_id, w, h) -> formula pixels -> ENCODE real PNG (every filter
    type in rotation) -> DECODE (CRC check, inflate, unfilter) ->
    integer-exact per-channel sums over the decoded image. Dimensions
    come from the PARSED IHDR."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, w, h in zip(pdf["doc_id"], pdf["w"], pdf["h"]):
                img = decode_png(
                    encode_png(synth_pixels(int(doc_id), int(w), int(h)))
                )
                s = img.astype(np.int64).sum(axis=(0, 1))
                out.append(
                    (
                        int(doc_id), img.shape[1], img.shape[0],
                        int(s[0]), int(s[1]), int(s[2]),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "sum_r", "sum_g", "sum_b"],
            )

    return spread(base).mapInPandas(run, PNG_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL LZW-compressed image codec path: GIF87a (built r9, staged r10)
# ---------------------------------------------------------------------------
# PNG proved DEFLATE; GIF's compression is LZW — a genuinely different
# algorithm (adaptive dictionary, variable-width codes, 12-bit cap with
# mid-stream CLEAR resets, LSB-first bit packing, 255-byte sub-block
# framing) implemented here from the published GIF87a spec with zero
# dependencies. The decoder follows the standard width rule (grow when
# next_code reaches 1<<width; stop adding at 4096 — deferred-clear
# tolerant), so it reads spec-conforming foreign GIFs, not just its own.

_GIF_SIG = b"GIF87a"
_GIF_MCS = 8  # 8-bit indexed pixels -> min LZW code size 8


def _lzw_encode(data: bytes, mcs: int) -> bytes:
    """GIF-variant LZW: emitted code widths exactly track what a
    spec-standard decoder expects (encoder threshold next_code-1 for
    string codes — the decoder's table lags one entry — and next_code
    for END; derivation in the r9 notes). CLEAR+reset at table cap."""
    clear = 1 << mcs
    end = clear + 1
    first = end + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def w_for(v: int) -> int:
        return max(mcs + 1, min(12, v.bit_length()))

    # dictionary keyed by (prefix_code << 8) | next_byte: every table
    # string is some existing code plus one byte, so the int pair is a
    # complete key — no per-step bytes concatenation/hashing (2-3x
    # faster than a bytes-keyed dict; literals 0..clear-1 are their own
    # codes and never need entries)
    table: dict[int, int] = {}
    next_code = first
    put(clear, mcs + 1)
    cur = -1  # current prefix CODE; -1 = empty
    for ch in data:
        if cur < 0:
            cur = ch
            continue
        key = (cur << 8) | ch
        nxt = table.get(key)
        if nxt is not None:
            cur = nxt
            continue
        put(cur, w_for(next_code - 1))
        if next_code < 4096:
            table[key] = next_code
            next_code += 1
        else:
            put(clear, w_for(next_code))  # 12 bits
            table = {}
            next_code = first
        cur = ch
    if cur >= 0:
        put(cur, w_for(next_code - 1))
    put(end, w_for(next_code))
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int, n_expected: int) -> bytes:
    """Standard GIF LZW decoder: width = bits(next_code) before every
    read (clamped to 12), KwKwK case, entry adds stop at 4096 until a
    CLEAR (deferred-clear tolerant)."""
    clear = 1 << mcs
    end = clear + 1
    first = end + 1
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0

    def get(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    def w_for(v: int) -> int:
        return max(mcs + 1, min(12, v.bit_length()))

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    next_code = first
    prev: bytes | None = None
    while True:
        code = get(w_for(next_code if prev is not None else end))
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            next_code = first
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("first LZW code not a literal")
            entry = table[code]
        elif code < next_code:
            entry = table[code]
        elif code == next_code and next_code < 4096:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"LZW code {code} out of range")
        out += entry
        if prev is not None and next_code < 4096:
            table.append(prev + entry[:1])
            next_code += 1
        prev = entry
        if len(out) > n_expected:
            raise ValueError("LZW output exceeds pixel count")
    if len(out) != n_expected:
        raise ValueError("LZW output short of pixel count")
    return bytes(out)


def synth_palette() -> np.ndarray:
    """(256, 3) uint8 formula palette both engines can state:
    r=(7i+3)%256, g=(11i+5)%256, b=(13i+7)%256."""
    i = np.arange(256)
    return np.stack(
        [(7 * i + 3) % 256, (11 * i + 5) % 256, (13 * i + 7) % 256], axis=1
    ).astype(np.uint8)


def synth_indices(doc_id: int, w: int, h: int) -> np.ndarray:
    """(h, w) uint8 palette indices: idx=(3*doc_id + 5x + 11y) % 256."""
    y, x = np.mgrid[0:h, 0:w]
    return ((3 * int(doc_id) + 5 * x + 11 * y) % 256).astype(np.uint8)


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """GIF87a, single image, 256-color global color table, real LZW."""
    import struct

    h, w = indices.shape
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    # packed: GCT flag(1) | color-res 7 | sort 0 | GCT size 7 (2^8 colors)
    lsd = struct.pack("<HHBBB", w, h, 0b1_111_0_111, 0, 0)
    img_desc = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    lzw = _lzw_encode(indices.tobytes(), _GIF_MCS)
    blocks = bytearray([_GIF_MCS])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)  # block terminator
    return (
        _GIF_SIG + lsd + pal.tobytes() + img_desc + bytes(blocks) + b"\x3b"
    )


def decode_gif(raw: bytes) -> tuple[np.ndarray, np.ndarray]:
    """(palette (n,3) uint8, indices (h,w) uint8) — the single-image
    view over :func:`decode_gif_frames` (ONE container walk in this
    file, not two drifting copies — r9 review finding)."""
    palette, _delay, frames = decode_gif_frames(raw)
    return palette, frames[0]


GIF_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, n_colors int,"
    " sum_r long, sum_g long, sum_b long"
)


def gif_ingest_features(base: DataFrame) -> DataFrame:
    """(doc_id, w, h) -> formula indices + palette -> ENCODE real GIF
    (real LZW) -> DECODE (header walk, sub-block reassembly, LZW) ->
    palette-mapped integer channel sums + distinct-color count over the
    DECODED image, dimensions from the PARSED screen descriptor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pal_master = synth_palette()
        for pdf in batches:
            out = []
            for doc_id, w, h in zip(pdf["doc_id"], pdf["w"], pdf["h"]):
                raw = encode_gif(
                    synth_indices(int(doc_id), int(w), int(h)), pal_master
                )
                pal, idx = decode_gif(raw)
                rgb = pal[idx]  # palette mapping via the PARSED table
                s = rgb.astype(np.int64).sum(axis=(0, 1))
                out.append(
                    (
                        int(doc_id), idx.shape[1], idx.shape[0],
                        int(np.unique(idx).size),
                        int(s[0]), int(s[1]), int(s[2]),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "width", "height", "n_colors",
                    "sum_r", "sum_g", "sum_b",
                ],
            )

    return spread(base).mapInPandas(run, GIF_FEATURE_SCHEMA)


def encode_gif_anim(
    frames: list[np.ndarray], palette: np.ndarray, delay_cs: int = 10
) -> bytes:
    """Animated GIF89a: NETSCAPE2.0 looping extension, then per frame a
    graphic-control extension (delay in centiseconds) + image descriptor
    + real-LZW data. Same LZW core as the single-image path."""
    import struct

    h, w = frames[0].shape
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    lsd = struct.pack("<HHBBB", w, h, 0b1_111_0_111, 0, 0)
    out = bytearray(b"GIF89a" + lsd + pal.tobytes())
    # NETSCAPE looping application extension (loop forever)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("animated GIF frames must share dimensions")
        # graphic control: disposal none, no transparency, delay
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        lzw = _lzw_encode(fr.tobytes(), _GIF_MCS)
        out.append(_GIF_MCS)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def decode_gif_frames(
    raw: bytes,
) -> tuple[np.ndarray, int, list[np.ndarray]]:
    """(palette, delay_cs, frames) from an animated (or single-image)
    GIF: walks every block; graphic-control extensions supply the delay
    (last one wins, matching the per-frame layout this encoder writes);
    other extensions are skipped; every image descriptor decodes through
    the shared LZW core."""
    import struct

    if len(raw) < 13 or (raw[:6] not in (b"GIF87a", b"GIF89a")):
        raise ValueError("not a GIF file")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", raw[6:13])
    if not packed & 0x80:
        raise ValueError("missing global color table")
    n_colors = 2 << (packed & 0x07)
    pos = 13
    if len(raw) < pos + 3 * n_colors:
        raise ValueError("truncated GIF (inside color table)")
    palette = np.frombuffer(
        raw[pos : pos + 3 * n_colors], dtype=np.uint8
    ).reshape(n_colors, 3)
    pos += 3 * n_colors

    # every read below bounds-checks so any truncation offset raises the
    # SAME loud ValueError, never a stray IndexError or a silently-short
    # slice (r9 review finding)
    def need(end: int) -> None:
        if end > len(raw):
            raise ValueError("truncated GIF")

    def sub_blocks(p: int) -> tuple[bytes, int]:
        out = bytearray()
        while True:
            need(p + 1)
            ln = raw[p]
            if ln == 0:
                return bytes(out), p + 1
            need(p + 1 + ln)
            out += raw[p + 1 : p + 1 + ln]
            p += 1 + ln

    frames: list[np.ndarray] = []
    delay_cs = 0
    while pos < len(raw):
        b = raw[pos]
        if b == 0x21:
            need(pos + 2)
            label = raw[pos + 1]
            body, pos = sub_blocks(pos + 2)
            if label == 0xF9 and len(body) >= 3:
                delay_cs = struct.unpack("<H", body[1:3])[0]
        elif b == 0x2C:
            need(pos + 11)
            left, top, w, h, ipacked = struct.unpack(
                "<HHHHB", raw[pos + 1 : pos + 10]
            )
            if ipacked & 0xC0:
                raise ValueError("interlace/local color table unsupported")
            if (left, top, w, h) != (0, 0, sw, sh):
                raise ValueError("sub-rectangle frame unsupported")
            mcs = raw[pos + 10]
            lzw, pos = sub_blocks(pos + 11)
            idx = np.frombuffer(
                _lzw_decode(lzw, mcs, w * h), dtype=np.uint8
            ).reshape(h, w)
            if idx.max(initial=0) >= n_colors:
                raise ValueError("pixel index outside color table")
            frames.append(idx)
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("no image data in GIF")
    return palette, delay_cs, frames


GIF_SAMPLE_SCHEMA = (
    "doc_id long, n_frames int, delay_cs int, frame_t int,"
    " fsum_r long, fsum_g long, fsum_b long"
)


def gif_frame_sample_features(base: DataFrame, stride: int) -> DataFrame:
    """(doc_id, nf, w, h) -> synthesize index frames -> ENCODE an
    animated GIF (real LZW per frame) -> DECODE -> sample every
    ``stride``-th frame -> one row per sampled frame with its exact
    palette-mapped channel sums; frame count and delay from the PARSED
    container."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pal_master = synth_palette()
        for pdf in batches:
            out = []
            for doc_id, nf, w, h in zip(
                pdf["doc_id"], pdf["nf"], pdf["w"], pdf["h"]
            ):
                src = [
                    synth_indices(int(doc_id) + 1000 * t, int(w), int(h))
                    for t in range(int(nf))
                ]
                raw = encode_gif_anim(src, pal_master, delay_cs=7)
                pal, delay, frames = decode_gif_frames(raw)
                for t in range(0, len(frames), stride):
                    rgb = pal[frames[t]]
                    s = rgb.astype(np.int64).sum(axis=(0, 1))
                    out.append(
                        (
                            int(doc_id), len(frames), int(delay), t,
                            int(s[0]), int(s[1]), int(s[2]),
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_frames", "delay_cs", "frame_t",
                    "fsum_r", "fsum_g", "fsum_b",
                ],
            )

    return spread(base).mapInPandas(run, GIF_SAMPLE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL QOI codec (built r9, staged r10) — the "Quite OK Image" format
# (qoiformat.org, public spec). A genuinely different compression family
# from DEFLATE (PNG) and LZW (GIF): a single-pass byte-oriented scheme
# with a 64-slot running color index, biased wraparound channel deltas
# (DIFF/LUMA), and run-length packing. Zero dependencies; every op type
# the 3-channel spec can emit (RUN / INDEX / DIFF / LUMA / RGB) is
# exercised by the synthesis formula and asserted present by test.
# ---------------------------------------------------------------------------

_QOI_MAGIC = b"qoif"
_QOI_END = b"\x00" * 7 + b"\x01"


def _qoi_hash(px: tuple[int, int, int, int]) -> int:
    return (px[0] * 3 + px[1] * 5 + px[2] * 7 + px[3] * 11) % 64


def encode_qoi(rgb: np.ndarray) -> bytes:
    """Spec-conforming greedy QOI encoder for (h, w, 3) uint8 RGB
    (channels=3, linear colorspace): run-length first, then index hit,
    then 2-bit DIFF, then LUMA, else a literal RGB op. Deltas wrap mod
    256 into [-128, 127] exactly as the reference implementation's
    signed-char arithmetic does, so a 255->4 step is still a +5 delta."""
    h, w, _ = rgb.shape
    out = bytearray(_QOI_MAGIC)
    out += w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([3, 0])
    index: list[tuple[int, int, int, int]] = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    flat = rgb.reshape(-1, 3)
    for r, g, b in flat.tolist():
        cur = (r, g, b, 255)
        if cur == prev:
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        ih = _qoi_hash(cur)
        if index[ih] == cur:
            out.append(ih)
        else:
            index[ih] = cur
            dr = ((r - prev[0] + 128) % 256) - 128
            dg = ((g - prev[1] + 128) % 256) - 128
            db = ((b - prev[2] + 128) % 256) - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            else:
                dr_dg = dr - dg
                db_dg = db - dg
                if -32 <= dg <= 31 and -8 <= dr_dg <= 7 and -8 <= db_dg <= 7:
                    out.append(0x80 | (dg + 32))
                    out.append(((dr_dg + 8) << 4) | (db_dg + 8))
                else:
                    out += bytes((0xFE, r, g, b))
        prev = cur
    if run:
        out.append(0xC0 | (run - 1))
    out += _QOI_END
    return bytes(out)


def decode_qoi(raw: bytes) -> np.ndarray:
    """Decode a 3-channel QOI stream with the loud-reject posture the
    other codecs pin: bad magic / channels / colorspace, a missing end
    marker, a truncated chunk, a run overshooting w*h, or trailing ops
    after the last pixel all raise ValueError (never IndexError)."""
    if len(raw) < 14 + len(_QOI_END) or raw[:4] != _QOI_MAGIC:
        raise ValueError("not a QOI stream")
    w = int.from_bytes(raw[4:8], "big")
    h = int.from_bytes(raw[8:12], "big")
    channels, colorspace = raw[12], raw[13]
    if channels != 3 or colorspace != 0:
        raise ValueError(f"unsupported QOI layout {channels}/{colorspace}")
    if raw[-8:] != _QOI_END:
        raise ValueError("missing QOI end marker")
    data = raw[14:-8]
    n_px = w * h
    out: list[tuple[int, int, int, int]] = []
    index: list[tuple[int, int, int, int]] = [(0, 0, 0, 0)] * 64
    px = (0, 0, 0, 255)
    i = 0
    end = len(data)
    while i < end:
        if len(out) >= n_px:
            raise ValueError("ops continue past the last pixel")
        b0 = data[i]
        i += 1
        if b0 == 0xFE:  # QOI_OP_RGB
            if i + 3 > end:
                raise ValueError("truncated RGB op")
            px = (data[i], data[i + 1], data[i + 2], px[3])
            i += 3
        elif b0 == 0xFF:  # QOI_OP_RGBA (valid in foreign streams)
            if i + 4 > end:
                raise ValueError("truncated RGBA op")
            px = (data[i], data[i + 1], data[i + 2], data[i + 3])
            i += 4
        else:
            tag = b0 >> 6
            if tag == 0:  # QOI_OP_INDEX
                px = index[b0 & 0x3F]
            elif tag == 1:  # QOI_OP_DIFF
                px = (
                    (px[0] + ((b0 >> 4) & 3) - 2) % 256,
                    (px[1] + ((b0 >> 2) & 3) - 2) % 256,
                    (px[2] + (b0 & 3) - 2) % 256,
                    px[3],
                )
            elif tag == 2:  # QOI_OP_LUMA
                if i >= end:
                    raise ValueError("truncated LUMA op")
                dg = (b0 & 0x3F) - 32
                b1 = data[i]
                i += 1
                px = (
                    (px[0] + dg + (b1 >> 4) - 8) % 256,
                    (px[1] + dg) % 256,
                    (px[2] + dg + (b1 & 0x0F) - 8) % 256,
                    px[3],
                )
            else:  # QOI_OP_RUN
                run = (b0 & 0x3F) + 1
                if len(out) + run > n_px:
                    raise ValueError("run overshoots the pixel count")
                out.extend([px] * run)
                continue
        index[_qoi_hash(px)] = px
        out.append(px)
    if len(out) != n_px:
        raise ValueError(f"decoded {len(out)} pixels, header says {n_px}")
    return np.array(out, dtype=np.uint8)[:, :3].reshape(h, w, 3)


def qoi_op_histogram(raw: bytes) -> dict[str, int]:
    """Walk a QOI stream counting op kinds (test support: the synthesis
    corpus must exercise RUN, INDEX, DIFF, LUMA and RGB)."""
    if raw[:4] != _QOI_MAGIC or raw[-8:] != _QOI_END:
        raise ValueError("not a QOI stream")
    data = raw[14:-8]
    hist = {"rgb": 0, "rgba": 0, "index": 0, "diff": 0, "luma": 0, "run": 0}
    i = 0
    while i < len(data):
        b0 = data[i]
        i += 1
        if b0 == 0xFE:
            hist["rgb"] += 1
            i += 3
        elif b0 == 0xFF:
            hist["rgba"] += 1
            i += 4
        else:
            tag = b0 >> 6
            if tag == 0:
                hist["index"] += 1
            elif tag == 1:
                hist["diff"] += 1
            elif tag == 2:
                hist["luma"] += 1
                i += 1
            else:
                hist["run"] += 1
    return hist


def synth_pixels_qoi(doc_id: int, w: int, h: int) -> np.ndarray:
    """(h, w, 3) uint8 RGB from an integer formula both engines can
    state, shaped so a greedy QOI encoder emits every 3-channel op:
    row class y%4==0 plateaus x in threes (RUN), y%4==1 alternates two
    colors (INDEX), y%4==2 steps by 5 (LUMA), y%4==3 steps by 1 (DIFF);
    row starts jump (RGB). xq = CASE above; yb = y%6;
    r=(doc_id+xq+2yb)%256, g=(2*doc_id+xq+3yb)%256, b=(3*doc_id+xq+yb)%256."""
    y, x = np.mgrid[0:h, 0:w]
    xq = np.where(
        y % 4 == 0,
        x - (x % 3),
        np.where(y % 4 == 1, x % 2, np.where(y % 4 == 2, 5 * x, x)),
    )
    d = int(doc_id)
    yb = y % 6
    return np.stack(
        [
            (d + xq + 2 * yb) % 256,
            (2 * d + xq + 3 * yb) % 256,
            (3 * d + xq + yb) % 256,
        ],
        axis=2,
    ).astype(np.uint8)


QOI_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, sum_r long, sum_g long, sum_b long"
)


def qoi_ingest_features(base: DataFrame) -> DataFrame:
    """(doc_id, w, h) -> formula pixels -> ENCODE real QOI -> DECODE
    (magic/layout/end-marker checks, index/diff/luma/run reconstruction)
    -> integer-exact per-channel sums over the decoded image, dimensions
    from the PARSED header. Scale shape: per-row scan-stage codec work;
    only the 6-column profile leaves the stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, w, h in zip(pdf["doc_id"], pdf["w"], pdf["h"]):
                img = decode_qoi(
                    encode_qoi(synth_pixels_qoi(int(doc_id), int(w), int(h)))
                )
                s = img.astype(np.int64).sum(axis=(0, 1))
                out.append(
                    (
                        int(doc_id), img.shape[1], img.shape[0],
                        int(s[0]), int(s[1]), int(s[2]),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "sum_r", "sum_g", "sum_b"],
            )

    return spread(base).mapInPandas(run, QOI_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL G.711 mu-law telephony codec (built r9, staged r10) — the ITU-T
# logarithmic companding standard: 16-bit linear PCM -> 8-bit mu-law
# (segment/mantissa format, bias 132, clip 32635) and back, carried in a
# hand-written RIFF/WAVE container with format tag 7 (WAVE_FORMAT_MULAW —
# the stdlib `wave` module cannot write it, so the container writer here
# is real byte-level code too). Encode/decode are fully vectorized
# integer numpy; the whole transform is statable in SQL, so the oracle
# re-derives the decoded samples end-to-end from the synthesis formula.
# ---------------------------------------------------------------------------

_ULAW_BIAS = 132
_ULAW_CLIP = 32635


def ulaw_compress(samples: np.ndarray) -> np.ndarray:
    """int16 linear PCM -> uint8 mu-law, vectorized: sign + clipped
    biased magnitude, segment = #{thresholds 256*2^k, k=0..6 passed},
    4-bit mantissa, ones-complement per the G.711 wire format."""
    s = samples.astype(np.int32)
    sign = np.where(s < 0, 0x80, 0)
    mag = np.minimum(np.abs(s), _ULAW_CLIP) + _ULAW_BIAS
    exponent = np.zeros_like(mag)
    for k in range(7):
        exponent += (mag >= (256 << k)).astype(np.int32)
    mantissa = (mag >> (exponent + 3)) & 0x0F
    return (~(sign | (exponent << 4) | mantissa) & 0xFF).astype(np.uint8)


def ulaw_expand(codes: np.ndarray) -> np.ndarray:
    """uint8 mu-law -> int16 linear PCM (the exact integer inverse the
    spec defines — segment-midpoint reconstruction)."""
    u = (~codes.astype(np.int32)) & 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    mag = (((mantissa << 3) + _ULAW_BIAS) << exponent) - _ULAW_BIAS
    return np.where(sign != 0, -mag, mag).astype(np.int16)


def encode_ulaw_wav(samples: np.ndarray, rate: int) -> bytes:
    """mu-law WAV: RIFF/WAVE + fmt (tag 7, mono, 8-bit) + data chunk,
    written by hand — format tag 7 is outside the stdlib wave module."""
    import struct

    payload = ulaw_compress(samples).tobytes()
    fmt = struct.pack("<HHIIHH", 7, 1, rate, rate, 1, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_ulaw_wav(raw: bytes) -> tuple[int, np.ndarray]:
    """(rate, int16 samples) from a mu-law WAV: RIFF walk (word-aligned,
    unknown chunks skipped), format tag MUST be 7/mono/8-bit — loud
    reject otherwise — then vectorized mu-law expansion."""
    import struct

    if len(raw) < 12 or raw[0:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        size = struct.unpack("<I", raw[pos + 4 : pos + 8])[0]
        body = raw[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _byterate, _align, bits = fmt
    if (audio_format, channels, bits) != (7, 1, 8):
        raise ValueError(f"not mono 8-bit mu-law: {fmt}")
    return rate, ulaw_expand(np.frombuffer(data, dtype=np.uint8))


def synth_samples_ulaw(doc_id: int, n: int) -> np.ndarray:
    """Deterministic int16 test signal with constants distinct from the
    PCM16 WAV query's: s_i = ((doc_id*37 + i*23) % 65536) - 32768."""
    i = np.arange(n, dtype=np.int64)
    return (((doc_id * 37 + i * 23) % 65536) - 32768).astype(np.int16)


ULAW_FEATURE_SCHEMA = (
    "doc_id long, n_samples long, sum_pcm long, sum_abs_pcm long,"
    " max_quant_err long"
)


def ulaw_ingest_features(base: DataFrame) -> DataFrame:
    """(doc_id, n) -> formula PCM16 -> ENCODE real mu-law WAV (tag-7
    container) -> DECODE (RIFF walk + format check + expansion) ->
    integer-exact sums over the DECODED samples plus the max
    quantization error vs the original signal. The oracle states the
    same numbers from the companding algebra in SQL, so a segment
    threshold, mantissa shift, bias, or container bug hash-mismatches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, n in zip(pdf["doc_id"], pdf["n"]):
                orig = synth_samples_ulaw(int(doc_id), int(n))
                _rate, dec = decode_ulaw_wav(encode_ulaw_wav(orig, 8000))
                d = dec.astype(np.int64)
                err = np.abs(orig.astype(np.int64) - d)
                out.append(
                    (
                        int(doc_id), int(d.size), int(d.sum()),
                        int(np.abs(d).sum()), int(err.max()) if d.size else 0,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_samples", "sum_pcm", "sum_abs_pcm",
                    "max_quant_err",
                ],
            )

    return spread(base).mapInPandas(run, ULAW_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL IMA ADPCM codec (built r9, staged r10) — the adaptive DIFFERENTIAL
# compression family next to DEFLATE (PNG), LZW (GIF), byte-wise
# index/delta/run (QOI), and logarithmic companding (mu-law): 16-bit PCM
# -> 4-bit nibbles via an 89-entry adaptive step-size table, carried in a
# hand-written RIFF/WAVE container with format tag 0x11 (canonical block
# layout: 4-byte block header stores the first sample + step index, the
# nibble stream encodes the rest, low nibble first). The predictor
# recursion is inherently sequential, so the DuckDB oracle states it as
# a RECURSIVE CTE over the same integer algebra.
# ---------------------------------------------------------------------------

_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
_IMA_INDEX_ADJ = (-1, -1, -1, -1, 2, 4, 6, 8)


def _ima_step(pred: int, idx: int, s: int) -> tuple[int, int, int]:
    """One canonical IMA quantize+reconstruct step: returns (nibble,
    new predictor, new step index). The encoder tracks the DECODER's
    reconstruction, so both sides walk the same state sequence."""
    st = _IMA_STEP_TABLE[idx]
    diff = s - pred
    nib = 0
    if diff < 0:
        nib = 8
        diff = -diff
    if diff >= st:
        nib |= 4
        diff -= st
    if diff >= st >> 1:
        nib |= 2
        diff -= st >> 1
    if diff >= st >> 2:
        nib |= 1
    delta = st >> 3
    if nib & 4:
        delta += st
    if nib & 2:
        delta += st >> 1
    if nib & 1:
        delta += st >> 2
    pred = pred - delta if nib & 8 else pred + delta
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX_ADJ[nib & 7]))
    return nib, pred, idx


def encode_adpcm_wav(samples: np.ndarray, rate: int) -> bytes:
    """IMA ADPCM WAV (format tag 0x11), single canonical block: the
    4-byte block header stores sample 0 verbatim (int16) + the initial
    step index + a zero reserved byte; samples 1..n-1 become 4-bit
    nibbles, LOW nibble first per the IMA WAV spec. A fact chunk
    records the true sample count (required for compressed WAVE)."""
    import struct

    s = [int(v) for v in samples]
    if not s:
        raise ValueError("empty signal")
    pred, idx = s[0], 0
    nibs = []
    for v in s[1:]:
        nib, pred, idx = _ima_step(pred, idx, v)
        nibs.append(nib)
    if len(nibs) % 2:
        nibs.append(0)
    payload = struct.pack("<hBB", s[0], 0, 0) + bytes(
        nibs[i] | (nibs[i + 1] << 4) for i in range(0, len(nibs), 2)
    )
    block_align = len(payload)
    # cbSize=2 extension carries samples-per-block, as the spec requires
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, rate, rate // 2, block_align, 4, 2, len(s)
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, len(s))
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_adpcm_wav(raw: bytes) -> tuple[int, np.ndarray]:
    """(rate, int16 samples) from an IMA ADPCM WAV: RIFF walk (unknown
    chunks skipped, truncation loud-rejected), format tag MUST be
    0x11/mono/4-bit, fact chunk mandatory, block header validated
    (step index <= 88, reserved byte zero), then the nibble-driven
    predictor recursion."""
    import struct

    if len(raw) < 12 or raw[0:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data, nsamp = 12, None, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        size = struct.unpack("<I", raw[pos + 4 : pos + 8])[0]
        body = raw[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"fact":
            if size < 4:
                raise ValueError("short fact chunk")
            nsamp = struct.unpack("<I", body[:4])[0]
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if fmt is None or data is None or nsamp is None:
        raise ValueError("missing fmt/fact/data chunk")
    audio_format, channels, rate, _byterate, _align, bits = fmt
    if (audio_format, channels, bits) != (0x11, 1, 4):
        raise ValueError(f"not mono 4-bit IMA ADPCM: {fmt}")
    if len(data) < 4:
        raise ValueError("truncated block header")
    pred, idx, reserved = struct.unpack("<hBB", data[:4])
    if idx > 88 or reserved != 0:
        raise ValueError(f"bad block header: index={idx} reserved={reserved}")
    need = (nsamp - 1 + 1) // 2
    if len(data) - 4 < need:
        raise ValueError("data chunk shorter than fact sample count")
    out = [pred]
    st_t, adj_t = _IMA_STEP_TABLE, _IMA_INDEX_ADJ
    for k in range(nsamp - 1):
        byte = data[4 + (k >> 1)]
        nib = (byte >> 4) & 0x0F if k & 1 else byte & 0x0F
        st = st_t[idx]
        delta = st >> 3
        if nib & 4:
            delta += st
        if nib & 2:
            delta += st >> 1
        if nib & 1:
            delta += st >> 2
        pred = pred - delta if nib & 8 else pred + delta
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + adj_t[nib & 7]))
        out.append(pred)
    return rate, np.asarray(out, dtype=np.int16), idx


def synth_samples_adpcm(doc_id: int, n: int) -> np.ndarray:
    """Deterministic int16 test signal, constants distinct from both
    WAV queries': s_i = ((doc_id*29 + i*140) % 65536) - 32768 — a
    140/sample ramp the adaptive step tracker locks onto, with modulo
    wraps that force re-adaptation."""
    i = np.arange(n, dtype=np.int64)
    return (((doc_id * 29 + i * 140) % 65536) - 32768).astype(np.int16)


ADPCM_FEATURE_SCHEMA = (
    "doc_id long, n_samples long, sum_pcm long, sum_abs_pcm long,"
    " max_quant_err long, end_index long"
)


def adpcm_ingest_features(base: DataFrame) -> DataFrame:
    """(doc_id, n) -> formula PCM16 -> ENCODE real IMA ADPCM WAV
    (tag-0x11 canonical block) -> DECODE (RIFF walk + header checks +
    nibble-driven predictor recursion) -> integer-exact sums over the
    DECODED samples, max quantization error vs the original, and the
    final adaptive step index (pins the whole adaptation trajectory).
    The oracle restates the recursion as a DuckDB RECURSIVE CTE, so a
    step-table, index-clamp, nibble-packing, or container bug
    hash-mismatches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, n in zip(pdf["doc_id"], pdf["n"]):
                orig = synth_samples_adpcm(int(doc_id), int(n))
                _rate, dec, end_idx = decode_adpcm_wav(
                    encode_adpcm_wav(orig, 8000)
                )
                d = dec.astype(np.int64)
                err = np.abs(orig.astype(np.int64) - d)
                out.append(
                    (
                        int(doc_id), int(d.size), int(d.sum()),
                        int(np.abs(d).sum()),
                        int(err.max()) if d.size else 0, int(end_idx),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_samples", "sum_pcm", "sum_abs_pcm",
                    "max_quant_err", "end_index",
                ],
            )

    return spread(base).mapInPandas(run, ADPCM_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL G.711 A-law telephony codec (built r10, staged r11) — the European
# companion to mu-law above and the second half of the ITU-T G.711
# standard: 16-bit linear PCM -> 13-bit -> 8-bit A-law (segment/mantissa
# with the 0x55 even-bit inversion that gives A-law its long runs of
# alternating bits on silence) and back, carried in a hand-written
# RIFF/WAVE container with format tag 6 (WAVE_FORMAT_ALAW). Same
# verification contract as mu-law: vectorized integer numpy both ways,
# exhaustively checked against a per-sample scalar reference over all
# 65536 int16 inputs, and an oracle that re-derives the full
# compand/expand algebra in SQL.
# ---------------------------------------------------------------------------

_ALAW_SEG_END = (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)


def alaw_compress(samples: np.ndarray) -> np.ndarray:
    """int16 linear PCM -> uint8 A-law, vectorized (G.711 / classic
    reference implementation): arithmetic >>3 to 13-bit, negatives map
    to ones-complement magnitude (-p-1 — A-law has no negative zero on
    the wire), 8 segment thresholds, 4-bit mantissa (segments 0-1 share
    the >>1 shift), XOR mask 0xD5 (positive) / 0x55 (negative)."""
    p = samples.astype(np.int32) >> 3
    neg = p < 0
    x = np.where(neg, -p - 1, p)
    seg = np.zeros_like(x)
    for end in _ALAW_SEG_END:
        seg += (x > end).astype(np.int32)
    shift = np.maximum(np.minimum(seg, 7), 1)
    mant = np.where(seg >= 8, 15, (x >> shift) & 0x0F)
    aval = (np.minimum(seg, 7) << 4) | mant
    mask = np.where(neg, 0x55, 0xD5)
    return (aval ^ mask).astype(np.uint8)


def alaw_expand(codes: np.ndarray) -> np.ndarray:
    """uint8 A-law -> int16 linear PCM (segment-midpoint reconstruction:
    +8 bias in segment 0, +0x108 then << (seg-1) above)."""
    a = codes.astype(np.int32) ^ 0x55
    pos = (a & 0x80) != 0
    mant = a & 0x0F
    seg = (a >> 4) & 0x07
    t = mant << 4
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where(pos, t, -t).astype(np.int16)


def encode_alaw_wav(samples: np.ndarray, rate: int) -> bytes:
    """A-law WAV: RIFF/WAVE + fmt (tag 6, mono, 8-bit) + data chunk —
    hand-written, same as the mu-law container but WAVE_FORMAT_ALAW."""
    import struct

    payload = alaw_compress(samples).tobytes()
    fmt = struct.pack("<HHIIHH", 6, 1, rate, rate, 1, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_alaw_wav(raw: bytes) -> tuple[int, np.ndarray]:
    """(rate, int16 samples) from an A-law WAV: RIFF walk (word-aligned,
    unknown chunks skipped), format tag MUST be 6/mono/8-bit — loud
    reject otherwise — then vectorized A-law expansion."""
    import struct

    if len(raw) < 12 or raw[0:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        size = struct.unpack("<I", raw[pos + 4 : pos + 8])[0]
        body = raw[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _byterate, _align, bits = fmt
    if (audio_format, channels, bits) != (6, 1, 8):
        raise ValueError(f"not mono 8-bit A-law: {fmt}")
    return rate, alaw_expand(np.frombuffer(data, dtype=np.uint8))


def synth_samples_alaw(doc_id: int, n: int) -> np.ndarray:
    """Deterministic int16 test signal, constants distinct from both the
    PCM16 and mu-law queries': s_i = ((doc_id*41 + i*19) % 65536) - 32768."""
    i = np.arange(n, dtype=np.int64)
    return (((doc_id * 41 + i * 19) % 65536) - 32768).astype(np.int16)


ALAW_FEATURE_SCHEMA = (
    "doc_id long, n_samples long, sum_pcm long, sum_abs_pcm long,"
    " max_quant_err long"
)


def alaw_ingest_features(base: DataFrame) -> DataFrame:
    """(doc_id, n) -> formula PCM16 -> ENCODE real A-law WAV (tag-6
    container) -> DECODE (RIFF walk + format check + expansion) ->
    integer-exact sums over the DECODED samples plus the max
    quantization error vs the original signal — the mu-law contract
    applied to the A-law algebra, so any segment/mantissa/mask bug
    hash-mismatches against the SQL restatement."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, n in zip(pdf["doc_id"], pdf["n"]):
                orig = synth_samples_alaw(int(doc_id), int(n))
                _rate, dec = decode_alaw_wav(encode_alaw_wav(orig, 8000))
                d = dec.astype(np.int64)
                err = np.abs(orig.astype(np.int64) - d)
                out.append(
                    (
                        int(doc_id), int(d.size), int(d.sum()),
                        int(np.abs(d).sum()), int(err.max()) if d.size else 0,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_samples", "sum_pcm", "sum_abs_pcm",
                    "max_quant_err",
                ],
            )

    return spread(base).mapInPandas(run, ALAW_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL TGA (Targa) type-10 RLE codec (built r10, staged r11) — the
# scanline run-length family in its classic 1984 format: 18-byte
# little-endian header, BGR 24-bit pixels, and per-scanline RLE packets
# (high bit set -> repeat packet: one pixel replicated count times; high
# bit clear -> raw packet: count literal pixels; count = (b & 0x7F) + 1,
# max 128, packets never cross scanlines). Both origins are handled on
# decode (descriptor bit 5: top-down vs the default bottom-up), our
# encoder writes top-down. Zero dependencies; loud-reject decoder.
# ---------------------------------------------------------------------------


def encode_tga(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> type-10 (RLE true-color) TGA bytes.
    Greedy scanline RLE: maximal equal-pixel runs become repeat packets
    (chunked at 128), everything else accumulates into raw packets
    (chunked at 128). Top-down origin (descriptor 0x20)."""
    import struct

    h, w, _ = rgb.shape
    header = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, 10, 0, 0, 0, 0, 0, w, h, 24, 0x20
    )
    out = bytearray(header)
    for y in range(h):
        row = rgb[y]
        # maximal equal runs, boundaries found vectorized (a per-pixel
        # Python comparison loop measured 10x the whole query's wall)
        if w > 1:
            change = np.nonzero(np.any(row[1:] != row[:-1], axis=1))[0] + 1
        else:
            change = np.empty(0, dtype=np.int64)
        starts = np.concatenate(([0], change))
        lengths = np.diff(np.concatenate((starts, [w])))
        runs = list(zip(starts.tolist(), lengths.tolist()))
        raw_buf: list[int] = []

        def flush_raw() -> None:
            i = 0
            while i < len(raw_buf):
                chunk = raw_buf[i : i + 128]
                out.append(len(chunk) - 1)
                for xx in chunk:
                    r, g, b = row[xx]
                    out.extend((int(b), int(g), int(r)))
                i += 128

        for start, length in runs:
            if length >= 2:
                flush_raw()
                raw_buf = []
                left = length
                pos = start
                while left > 0:
                    n = min(left, 128)
                    out.append(0x80 | (n - 1))
                    r, g, b = row[pos]
                    out.extend((int(b), int(g), int(r)))
                    left -= n
            else:
                raw_buf.append(start)
        flush_raw()
    return bytes(out)


def decode_tga(raw: bytes) -> np.ndarray:
    """type-10 24-bit TGA bytes -> (h, w, 3) uint8 RGB. Walks the RLE
    packet stream scanline-aligned (a packet crossing a scanline is a
    spec violation -> loud reject), honors BOTH origins (bottom-up rows
    are flipped to top-down on return), rejects non-RLE-true-color
    types, palettes, and non-24-bit depths."""
    import struct

    if len(raw) < 18:
        raise ValueError("short TGA header")
    (idlen, cmap_type, img_type, _cm_first, _cm_len, _cm_bits,
     _x0, _y0, w, h, bpp, desc) = struct.unpack("<BBBHHBHHHHBB", raw[:18])
    if img_type != 10:
        raise ValueError(f"not RLE true-color (type {img_type})")
    if cmap_type != 0:
        raise ValueError("paletted TGA not supported here")
    if bpp != 24:
        raise ValueError(f"not 24-bit ({bpp})")
    pos = 18 + idlen
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        x = 0
        while x < w:
            if pos >= len(raw):
                raise ValueError("truncated packet stream")
            pkt = raw[pos]
            pos += 1
            n = (pkt & 0x7F) + 1
            if x + n > w:
                raise ValueError("RLE packet crosses scanline")
            if pkt & 0x80:
                if pos + 3 > len(raw):
                    raise ValueError("truncated repeat pixel")
                b, g, r = raw[pos : pos + 3]
                pos += 3
                img[y, x : x + n] = (r, g, b)
            else:
                if pos + 3 * n > len(raw):
                    raise ValueError("truncated raw packet")
                px = np.frombuffer(
                    raw[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
                img[y, x : x + n] = px[:, ::-1]
            x += n
    if not (desc & 0x20):  # bottom-up origin
        img = img[::-1]
    return img


def synth_pixels_tga(doc_id: int, w: int, h: int) -> np.ndarray:
    """(h, w, 3) uint8 RGB from an integer formula both engines can
    state, shaped to force every packet regime: y%3==0 rows are
    CONSTANT (one maximal run -> the 128-count cap splits it at
    w >= 129), y%3==1 rows plateau x in fours (short repeat packets),
    y%3==2 rows are all-distinct (raw packets). xq = CASE;
    r=(doc_id+xq+5y)%256, g=(2*doc_id+3*xq+y)%256,
    b=(3*doc_id+2*xq+4y)%256."""
    y, x = np.mgrid[0:h, 0:w]
    xq = np.where(y % 3 == 0, 0, np.where(y % 3 == 1, x - (x % 4), x))
    d = int(doc_id)
    return np.stack(
        [
            (d + xq + 5 * y) % 256,
            (2 * d + 3 * xq + y) % 256,
            (3 * d + 2 * xq + 4 * y) % 256,
        ],
        axis=2,
    ).astype(np.uint8)


TGA_FEATURE_SCHEMA = (
    "doc_id long, width int, height int,"
    " sum_r long, sum_g long, sum_b long"
)


def tga_ingest_features(base: DataFrame) -> DataFrame:
    """(doc_id, w, h) -> formula RGB -> ENCODE real type-10 RLE TGA ->
    DECODE (header parse + packet walk + origin handling) ->
    integer-exact per-channel sums over the DECODED image with
    dimensions from the PARSED header. The oracle states the sums from
    the synthesis formula, so any packet-count, BGR-order, origin, or
    chunking bug hash-mismatches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, w, h in zip(pdf["doc_id"], pdf["w"], pdf["h"]):
                img = decode_tga(
                    encode_tga(synth_pixels_tga(int(doc_id), int(w), int(h)))
                )
                s = img.astype(np.int64).sum(axis=(0, 1))
                out.append(
                    (
                        int(doc_id), img.shape[1], img.shape[0],
                        int(s[0]), int(s[1]), int(s[2]),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "sum_r", "sum_g", "sum_b"],
            )

    return spread(base).mapInPandas(run, TGA_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL ZIP container codec (built r10, staged r11) — the archive-container
# family: hand-written local file headers, central directory, and
# end-of-central-directory record (PKZIP APPNOTE layout), STORED and
# DEFLATE members (raw deflate via the stdlib zlib, the PNG query's
# precedent — the hand-written part is the container: header/central
# consistency, EOCD discovery, CRC32 + size verification per member).
# The decoder cross-reads foreign archives (stdlib zipfile) and vice
# versa — pinned by tests.
# ---------------------------------------------------------------------------

_ZIP_LOCAL_SIG = 0x04034B50
_ZIP_CENTRAL_SIG = 0x02014B50
_ZIP_EOCD_SIG = 0x06054B50


def encode_zip(entries: list[tuple[str, bytes, bool]]) -> bytes:
    """[(name, data, deflate?)] -> ZIP archive bytes (hand-written
    structures; raw-deflate members via zlib with a -15 window)."""
    import struct
    import zlib

    out = bytearray()
    central = bytearray()
    for name, data, deflate in entries:
        nameb = name.encode("ascii")
        crc = zlib.crc32(data) & 0xFFFFFFFF
        if deflate:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = co.compress(data) + co.flush()
            method = 8
        else:
            payload, method = data, 0
        offset = len(out)
        out += struct.pack(
            "<IHHHHHIIIHH",
            _ZIP_LOCAL_SIG, 20, 0, method, 0, 0x21,
            crc, len(payload), len(data), len(nameb), 0,
        )
        out += nameb + payload
        central += struct.pack(
            "<IHHHHHHIIIHHHHHII",
            _ZIP_CENTRAL_SIG, 20, 20, 0, method, 0, 0x21,
            crc, len(payload), len(data), len(nameb), 0, 0, 0, 0, 0,
            offset,
        )
        central += nameb
    cd_offset = len(out)
    out += central
    out += struct.pack(
        "<IHHHHIIH",
        _ZIP_EOCD_SIG, 0, 0, len(entries), len(entries),
        len(central), cd_offset, 0,
    )
    return bytes(out)


def _zip_name(b: bytes, flags: int) -> str:
    """Member-name decode per APPNOTE: UTF-8 when the EFS flag (general
    purpose bit 11) is set, else CP437 — matching stdlib zipfile, so
    foreign archives with non-ASCII names decode instead of raising
    (r10 ADVICE: .decode('ascii') leaked UnicodeDecodeError past the
    documented loud-reject ValueError contract)."""
    return b.decode("utf-8" if flags & 0x800 else "cp437")


def decode_zip(raw: bytes) -> list[tuple[str, bytes]]:
    """ZIP bytes -> [(name, verified data)]. Walks EOCD -> central
    directory -> local headers; every member's local header must agree
    with its central entry (name + method), and the extracted data must
    match BOTH the recorded CRC32 and the recorded uncompressed size —
    loud reject (always ValueError) on any inconsistency, unknown
    method, or truncation. Names decode per the EFS flag (UTF-8 / CP437
    like stdlib zipfile)."""
    import struct
    import zlib

    tail = raw[-(65536 + 22):] if len(raw) > 65536 + 22 else raw
    eocd_rel = tail.rfind(struct.pack("<I", _ZIP_EOCD_SIG))
    if eocd_rel < 0:
        raise ValueError("no end-of-central-directory record")
    eocd = len(raw) - len(tail) + eocd_rel
    if eocd + 22 > len(raw):
        raise ValueError("truncated end-of-central-directory record")
    (_sig, _disk, _cddisk, _n_this, n_total, _cd_size,
     cd_offset, _clen) = struct.unpack("<IHHHHIIH", raw[eocd : eocd + 22])
    pos = cd_offset
    entries: list[tuple[str, bytes]] = []
    for _ in range(n_total):
        if raw[pos : pos + 4] != struct.pack("<I", _ZIP_CENTRAL_SIG):
            raise ValueError("bad central directory signature")
        if pos + 46 > len(raw):
            raise ValueError("truncated central directory entry")
        (_sig, _vmade, _vneed, flags, method, _t, _d, crc, csize, usize,
         fnlen, extralen, clen, _disk, _iattr, _eattr, loffset
         ) = struct.unpack("<IHHHHHHIIIHHHHHII", raw[pos : pos + 46])
        name = _zip_name(raw[pos + 46 : pos + 46 + fnlen], flags)
        pos += 46 + fnlen + extralen + clen
        if loffset + 30 > len(raw):
            raise ValueError(f"truncated local header for {name!r}")
        (lsig, _lv, lflags, lmethod, _lt, _ld, _lcrc, _lcsize, _lusize,
         lfnlen, lextralen) = struct.unpack(
            "<IHHHHHIIIHH", raw[loffset : loffset + 30]
        )
        if lsig != _ZIP_LOCAL_SIG:
            raise ValueError(f"bad local header signature for {name!r}")
        lname = _zip_name(
            raw[loffset + 30 : loffset + 30 + lfnlen], lflags
        )
        if lname != name or lmethod != method:
            raise ValueError(f"local/central mismatch for {name!r}")
        dstart = loffset + 30 + lfnlen + lextralen
        payload = raw[dstart : dstart + csize]
        if len(payload) != csize:
            raise ValueError(f"truncated member {name!r}")
        if method == 0:
            data = payload
        elif method == 8:
            try:
                data = zlib.decompressobj(-15).decompress(payload)
            except zlib.error as e:  # keep the ValueError contract
                raise ValueError(f"bad deflate stream for {name!r}: {e}")
        else:
            raise ValueError(f"unsupported method {method} for {name!r}")
        if len(data) != usize:
            raise ValueError(f"size mismatch for {name!r}")
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch for {name!r}")
        entries.append((name, data))
    return entries


def synth_zip_entries(doc_id: int) -> list[tuple[str, bytes, bool]]:
    """Deterministic archive contents both engines can state: entry j of
    n = 2 + doc_id%3 has length L = 40 + (doc_id*7 + j*13) % 60 and
    bytes b_i = 32 + (doc_id*3 + j*5 + i*7) % 95; entries alternate
    STORED / DEFLATE by (doc_id + j) % 2."""
    d = int(doc_id)
    out = []
    for j in range(2 + d % 3):
        ln = 40 + (d * 7 + j * 13) % 60
        data = bytes(32 + (d * 3 + j * 5 + i * 7) % 95 for i in range(ln))
        out.append((f"e{j}.txt", data, (d + j) % 2 == 1))
    return out


ZIP_FEATURE_SCHEMA = (
    "doc_id long, n_entries int, n_deflated int,"
    " total_uncompressed long, sum_bytes long"
)


def zip_ingest_features(base: DataFrame) -> DataFrame:
    """(doc_id) -> synth entries -> ENCODE hand-written ZIP -> DECODE
    (EOCD walk + central/local consistency + per-member CRC32/size
    verify) -> integer-exact profile over the VERIFIED extracted data.
    The oracle states the profile from the synthesis formula, so any
    container-layout, method, or checksum bug hash-mismatches. The
    compressed size is deliberately NOT an oracle column (it is the
    compressor's dictionary behavior — asserted bounded by a named
    test instead, the text_compression_ratio convention)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                spec = synth_zip_entries(int(doc_id))
                got = decode_zip(encode_zip(spec))
                assert [n for n, _ in got] == [n for n, _, _ in spec]
                total = sum(len(b) for _, b in got)
                sb = sum(int(x) for _, b in got for x in b)
                out.append(
                    (
                        int(doc_id), len(got),
                        sum(1 for _, _, z in spec if z), total, sb,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_entries", "n_deflated",
                    "total_uncompressed", "sum_bytes",
                ],
            )

    return spread(base).mapInPandas(run, ZIP_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL TIFF + PackBits codec (built r10, staged r11) — the tag-directory
# container plus Apple's classic byte-RLE: little-endian TIFF header,
# a real IFD walk (12-byte tag entries, inline-vs-offset values, typed
# SHORT/LONG reads), multi-strip layout (RowsPerStrip 4) with per-strip
# offset/bytecount ARRAYS stored out-of-line, and PackBits packets
# (signed count byte: 0..127 literal n+1, -1..-127 repeat 1-n, -128
# noop — our encoder emits a leading noop per strip so decoders must
# really implement it). Grayscale 8-bit, photometric BlackIsZero.
# ---------------------------------------------------------------------------

_TIFF_ROWS_PER_STRIP = 4


def packbits_encode(row: bytes) -> bytes:
    """One row -> PackBits packets (runs >= 2 become repeats, chunked
    at 128; literals chunked at 128). Per TIFF spec rows pack
    independently."""
    out = bytearray()
    i, n = 0, len(row)
    lit_start = 0

    def flush_lit(end: int) -> None:
        j = lit_start
        while j < end:
            k = min(end - j, 128)
            out.append(k - 1)
            out.extend(row[j : j + k])
            j += k

    while i < n:
        j = i
        while j + 1 < n and row[j + 1] == row[i]:
            j += 1
        run = j - i + 1
        if run >= 2:
            flush_lit(i)
            left, val = run, row[i]
            while left > 0:
                k = min(left, 128)
                out.append((257 - k) & 0xFF)  # -(k-1) two's complement
                out.append(val)
                left -= k
            i = j + 1
            lit_start = i
        else:
            i += 1
    flush_lit(n)
    return bytes(out)


def packbits_decode(data: bytes, expect: int) -> bytes:
    """PackBits packets -> exactly ``expect`` bytes (noop 0x80 skipped;
    loud reject on truncation or overrun)."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        h = data[pos]
        pos += 1
        if h == 0x80:  # noop
            continue
        if h < 0x80:  # literal h+1
            k = h + 1
            if pos + k > len(data):
                raise ValueError("truncated literal packet")
            out += data[pos : pos + k]
            pos += k
        else:  # repeat 257-h
            if pos >= len(data):
                raise ValueError("truncated repeat packet")
            out += bytes([data[pos]]) * (257 - h)
            pos += 1
        if len(out) > expect:
            raise ValueError("PackBits output overruns strip size")
    if len(out) != expect:
        raise ValueError(f"strip decoded {len(out)} of {expect} bytes")
    return bytes(out)


def encode_tiff_packbits(gray: np.ndarray) -> bytes:
    """(h, w) uint8 grayscale -> single-IFD TIFF, PackBits compression,
    RowsPerStrip {rps}, per-strip offset/bytecount LONG arrays stored
    out-of-line, a leading noop byte per strip."""
    import struct

    h, w = gray.shape
    rps = _TIFF_ROWS_PER_STRIP
    strips = []
    for y0 in range(0, h, rps):
        block = gray[y0 : y0 + rps]
        payload = b"\x80" + b"".join(
            packbits_encode(bytes(block[r])) for r in range(block.shape[0])
        )
        strips.append(payload)
    out = bytearray(b"II*\x00\x00\x00\x00\x00")  # IFD offset patched below
    offsets, counts = [], []
    for sdata in strips:
        offsets.append(len(out))
        counts.append(len(sdata))
        out += sdata
    # out-of-line LONG arrays (inline only when a single strip fits).
    # TIFF6 requires all field values and the IFD to begin on a WORD
    # boundary; strip payloads have arbitrary length, so pad to even
    # before recording any offset (r10 ADVICE: strict readers like
    # libtiff may reject odd-aligned directories).
    def put_longs(vals: list[int]) -> int:
        if len(out) % 2:
            out.append(0)
        off = len(out)
        for v in vals:
            out.extend(struct.pack("<I", v))
        return off

    n_strips = len(strips)
    if n_strips == 1:
        so_val, sc_val = offsets[0], counts[0]
    else:
        so_val = put_longs(offsets)
        sc_val = put_longs(counts)
    if len(out) % 2:
        out.append(0)
    ifd_off = len(out)
    tags = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 8),
        (259, 3, 1, 32773), (262, 3, 1, 1),
        (273, 4, n_strips, so_val), (277, 3, 1, 1),
        (278, 4, 1, rps), (279, 4, n_strips, sc_val),
    ]
    out += struct.pack("<H", len(tags))
    for tag, typ, cnt, val in tags:
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)  # no next IFD
    struct.pack_into("<I", out, 4, ifd_off)
    return bytes(out)


def decode_tiff_packbits(raw: bytes) -> np.ndarray:
    """TIFF bytes -> (h, w) uint8. Real IFD walk: typed tag reads
    (SHORT/LONG), inline-vs-offset array resolution, multi-strip
    PackBits unpack with RowsPerStrip accounting; loud reject on wrong
    byte order, magic, compression, bit depth, or strip geometry."""
    import struct

    if raw[:4] != b"II*\x00":
        raise ValueError("not a little-endian TIFF")
    (ifd_off,) = struct.unpack_from("<I", raw, 4)
    (n_tags,) = struct.unpack_from("<H", raw, ifd_off)
    tags: dict[int, tuple[int, int, int]] = {}
    for t in range(n_tags):
        tag, typ, cnt, val = struct.unpack_from(
            "<HHII", raw, ifd_off + 2 + 12 * t
        )
        tags[tag] = (typ, cnt, val)

    def longs(tag: int) -> list[int]:
        typ, cnt, val = tags[tag]
        if typ not in (3, 4):
            raise ValueError(f"tag {tag}: unsupported type {typ}")
        size = 2 if typ == 3 else 4
        if cnt * size <= 4:
            if typ == 3:
                return [val & 0xFFFF, (val >> 16) & 0xFFFF][:cnt]
            return [val]
        fmt = "<" + ("H" if typ == 3 else "I") * cnt
        return list(struct.unpack_from(fmt, raw, val))

    def one(tag: int) -> int:
        v = longs(tag)
        if len(v) != 1:
            raise ValueError(f"tag {tag}: expected scalar")
        return v[0]

    if one(259) != 32773:
        raise ValueError("not PackBits-compressed")
    if one(258) != 8 or one(277) != 1:
        raise ValueError("not 8-bit grayscale")
    w, h, rps = one(256), one(257), one(278)
    offs, cnts = longs(273), longs(279)
    if len(offs) != len(cnts) or len(offs) != -(-h // rps):
        raise ValueError("strip geometry mismatch")
    img = np.zeros((h, w), dtype=np.uint8)
    for si, (off, cnt) in enumerate(zip(offs, cnts)):
        rows = min(rps, h - si * rps)
        plain = packbits_decode(raw[off : off + cnt], rows * w)
        img[si * rps : si * rps + rows] = np.frombuffer(
            plain, dtype=np.uint8
        ).reshape(rows, w)
    return img


def synth_pixels_tiff(doc_id: int, w: int, h: int) -> np.ndarray:
    """(h, w) uint8 grayscale, the TGA row-class shape in one channel:
    y%3==0 constant rows (long runs), y%3==1 plateau-of-4, y%3==2
    all-distinct; v = (doc_id + xq + 5*y) % 256."""
    y, x = np.mgrid[0:h, 0:w]
    xq = np.where(y % 3 == 0, 0, np.where(y % 3 == 1, x - (x % 4), x))
    return ((int(doc_id) + xq + 5 * y) % 256).astype(np.uint8)


TIFF_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, n_strips int, sum_px long"
)


def tiff_ingest_features(base: DataFrame) -> DataFrame:
    """(doc_id, w, h) -> formula grayscale -> ENCODE real multi-strip
    PackBits TIFF -> DECODE (IFD walk + strip unpack) -> integer-exact
    pixel sum with geometry from the PARSED directory. Oracle states
    the profile from the formula."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, w, h in zip(pdf["doc_id"], pdf["w"], pdf["h"]):
                img = decode_tiff_packbits(
                    encode_tiff_packbits(
                        synth_pixels_tiff(int(doc_id), int(w), int(h))
                    )
                )
                out.append(
                    (
                        int(doc_id), img.shape[1], img.shape[0],
                        -(-img.shape[0] // _TIFF_ROWS_PER_STRIP),
                        int(img.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "n_strips", "sum_px"],
            )

    return spread(base).mapInPandas(run, TIFF_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL TAR (ustar) container (built r11, staged r12) — the block-oriented
# archive format every data-delivery pipeline meets: 512-byte headers
# with OCTAL-text numeric fields, the spec's header checksum (sum of
# header bytes with the chksum field read as spaces), POSIX "ustar"
# magic, 512-padded member data, and the two-zero-block terminator.
# Interop pinned BOTH directions against stdlib tarfile. Loud-reject
# (ValueError) on bad magic / checksum / truncation — the zip codec's
# contract.
# ---------------------------------------------------------------------------

_TAR_BLOCK = 512


def _tar_octal(v: int, width: int) -> bytes:
    """Zero-padded octal text field, NUL-terminated (GNU/pax style)."""
    s = format(v, "o").rjust(width - 1, "0")
    if len(s) >= width:
        raise ValueError(f"value {v} overflows a {width}-byte octal field")
    return s.encode("ascii") + b"\x00"


def encode_tar(entries: list[tuple[str, bytes]]) -> bytes:
    """[(name, data)] -> ustar TAR bytes. Deterministic: mtime 0,
    mode 0644, uid/gid 0, no uname/gname."""
    import struct  # noqa: F401  (parallel with the sibling codecs)

    out = bytearray()
    for name, data in entries:
        nameb = name.encode("utf-8")
        if len(nameb) > 100:
            raise ValueError(f"name too long for the 100-byte field: {name!r}")
        hdr = bytearray(_TAR_BLOCK)
        hdr[0:len(nameb)] = nameb
        hdr[100:108] = _tar_octal(0o644, 8)      # mode
        hdr[108:116] = _tar_octal(0, 8)          # uid
        hdr[116:124] = _tar_octal(0, 8)          # gid
        hdr[124:136] = _tar_octal(len(data), 12)  # size
        hdr[136:148] = _tar_octal(0, 12)         # mtime
        hdr[148:156] = b" " * 8                  # chksum placeholder
        hdr[156] = ord("0")                      # typeflag: regular file
        hdr[257:263] = b"ustar\x00"              # magic
        hdr[263:265] = b"00"                     # version
        chksum = sum(hdr)
        hdr[148:155] = format(chksum, "o").rjust(6, "0").encode() + b"\x00"
        hdr[155] = ord(" ")
        out += hdr
        out += data
        pad = -len(data) % _TAR_BLOCK
        out += bytes(pad)
    out += bytes(2 * _TAR_BLOCK)  # end-of-archive marker
    return bytes(out)


def decode_tar(raw: bytes) -> list[tuple[str, bytes]]:
    """TAR bytes -> [(name, data)] for regular-file members. Verifies
    the ustar magic and the spec header checksum on every header and
    the 512 blocking on every member; loud reject (ValueError) on any
    inconsistency or truncation. Directory/link members are walked
    over (their data size still advances the cursor) but not
    returned — stdlib-tarfile-compatible behavior for the archives
    this engine profiles."""
    pos = 0
    entries: list[tuple[str, bytes]] = []
    while True:
        if pos + _TAR_BLOCK > len(raw):
            raise ValueError("truncated archive: no end-of-archive marker")
        hdr = raw[pos : pos + _TAR_BLOCK]
        if hdr == bytes(_TAR_BLOCK):  # first zero block ends the walk
            if raw[pos + _TAR_BLOCK : pos + 2 * _TAR_BLOCK] != bytes(
                _TAR_BLOCK
            ):
                raise ValueError("single zero block: bad terminator")
            return entries
        if hdr[257:262] != b"ustar":
            raise ValueError("bad magic: not a ustar header")
        recorded = hdr[148:156]
        try:
            want = int(recorded.rstrip(b"\x00 ").decode("ascii"), 8)
        except ValueError:
            raise ValueError("malformed checksum field")
        got = sum(hdr) - sum(recorded) + 8 * ord(" ")
        if got != want:
            raise ValueError(f"header checksum mismatch at offset {pos}")
        name = hdr[0:100].split(b"\x00", 1)[0].decode("utf-8")
        try:
            size = int(hdr[124:136].rstrip(b"\x00 ").decode("ascii"), 8)
        except ValueError:
            raise ValueError(f"malformed size field for {name!r}")
        dstart = pos + _TAR_BLOCK
        if dstart + size > len(raw):
            raise ValueError(f"truncated member {name!r}")
        if hdr[156] in (0, ord("0")):  # regular file
            entries.append((name, raw[dstart : dstart + size]))
        pos = dstart + size + (-size % _TAR_BLOCK)


def synth_tar_entries(doc_id: int) -> list[tuple[str, bytes]]:
    """Deterministic archive contents both engines can state: member j
    of n = 2 + doc_id%4 has length L = 30 + (doc_id*11 + j*17) % 70 and
    bytes b_i = 32 + (doc_id*5 + j*3 + i*11) % 95."""
    d = int(doc_id)
    return [
        (
            f"m{j}.dat",
            bytes(
                32 + (d * 5 + j * 3 + i * 11) % 95
                for i in range(30 + (d * 11 + j * 17) % 70)
            ),
        )
        for j in range(2 + d % 4)
    ]


TAR_FEATURE_SCHEMA = (
    "doc_id long, n_members int, total_size long,"
    " archive_blocks int, sum_bytes long"
)


def tar_ingest_features(base: DataFrame) -> DataFrame:
    """(doc_id) -> synth members -> ENCODE hand-written ustar TAR ->
    DECODE (magic + header-checksum verify + 512-block walk) ->
    integer-exact profile over the extracted data. archive_blocks is
    the on-wire block count ((header + padded data) per member + the
    2-block terminator) — stated exactly by the oracle from the size
    formula, so a padding or terminator bug hash-mismatches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                spec = synth_tar_entries(int(doc_id))
                raw = encode_tar(spec)
                got = decode_tar(raw)
                assert got == spec
                total = sum(len(b) for _, b in got)
                sb = sum(int(x) for _, b in got for x in b)
                assert len(raw) % _TAR_BLOCK == 0
                out.append(
                    (
                        int(doc_id), len(got), total,
                        len(raw) // _TAR_BLOCK, sb,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_members", "total_size",
                    "archive_blocks", "sum_bytes",
                ],
            )

    return spread(base).mapInPandas(run, TAR_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL GZIP member codec (built r11, staged r12) — RFC 1952: magic
# 1f 8b, CM=deflate, the FLG optional-field grammar (FEXTRA / FNAME /
# FCOMMENT / FHCRC all handled on decode), raw-deflate body, and the
# CRC32 + ISIZE trailer both VERIFIED. Encoder is deterministic
# (MTIME=0, XFL=0, OS=255). Interop pinned BOTH directions against
# stdlib gzip. Loud-reject (ValueError) on bad magic / method /
# trailer / truncation.
# ---------------------------------------------------------------------------


def encode_gzip(data: bytes, name: str | None = None) -> bytes:
    """bytes -> one deterministic gzip member (raw deflate level 9)."""
    import struct
    import zlib

    flg = 0x08 if name else 0
    out = bytearray(struct.pack("<BBBBIBB", 0x1F, 0x8B, 8, flg, 0, 0, 255))
    if name:
        out += name.encode("latin-1") + b"\x00"
    comp = zlib.compressobj(9, zlib.DEFLATED, -15)
    out += comp.compress(data) + comp.flush()
    out += struct.pack(
        "<II", zlib.crc32(data) & 0xFFFFFFFF, len(data) % 2**32
    )
    return bytes(out)


def decode_gzip(raw: bytes) -> tuple[str | None, bytes]:
    """gzip bytes -> (member name or None, verified data). Walks the
    full FLG grammar, inflates the raw-deflate body, and verifies BOTH
    trailer fields (CRC32 and ISIZE mod 2^32); loud reject (ValueError)
    on any inconsistency — the zip codec's contract."""
    import struct
    import zlib

    if len(raw) < 18:
        raise ValueError("truncated gzip member")
    magic1, magic2, cm, flg, _mtime, _xfl, _os = struct.unpack(
        "<BBBBIBB", raw[:10]
    )
    if (magic1, magic2) != (0x1F, 0x8B):
        raise ValueError("bad gzip magic")
    if cm != 8:
        raise ValueError(f"unsupported compression method {cm}")
    if flg & 0xE0:
        raise ValueError(f"reserved FLG bits set: {flg:#x}")
    pos = 10
    if flg & 0x04:  # FEXTRA
        if pos + 2 > len(raw):
            raise ValueError("truncated FEXTRA length")
        (xlen,) = struct.unpack_from("<H", raw, pos)
        pos += 2 + xlen
    name = None
    if flg & 0x08:  # FNAME
        end = raw.find(b"\x00", pos)
        if end < 0:
            raise ValueError("unterminated FNAME")
        name = raw[pos:end].decode("latin-1")
        pos = end + 1
    if flg & 0x10:  # FCOMMENT
        end = raw.find(b"\x00", pos)
        if end < 0:
            raise ValueError("unterminated FCOMMENT")
        pos = end + 1
    if flg & 0x02:  # FHCRC
        pos += 2
    if pos + 8 > len(raw):
        raise ValueError("truncated gzip body")
    d = zlib.decompressobj(-15)
    try:
        data = d.decompress(raw[pos:-8]) + d.flush()
    except zlib.error as e:
        raise ValueError(f"bad deflate stream: {e}")
    # unused_data holds bytes past the deflate end-of-stream marker
    # (unconsumed_tail is only fed by max_length calls and is always
    # empty here — r11 ADVICE: the old check was dead code, so garbage
    # injected between body and trailer decoded silently)
    if d.unused_data:
        raise ValueError("trailing garbage inside deflate body")
    crc, isize = struct.unpack("<II", raw[-8:])
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError("CRC32 mismatch")
    if len(data) % 2**32 != isize:
        raise ValueError("ISIZE mismatch")
    return name, data


def synth_gzip_payload(doc_id: int) -> bytes:
    """Deterministic member payload both engines can state: length
    L = 120 + (doc_id*13) % 200, bytes b_i = 32 + (doc_id*7 + i*3) % 95
    — repetitive enough that deflate genuinely compresses it."""
    d = int(doc_id)
    return bytes(
        32 + (d * 7 + i * 3) % 95 for i in range(120 + (d * 13) % 200)
    )


GZIP_FEATURE_SCHEMA = (
    "doc_id long, name_len int, isize long, sum_bytes long"
)


def gzip_ingest_features(base: DataFrame) -> DataFrame:
    """(doc_id) -> synth payload -> ENCODE deterministic gzip member
    (FNAME set) -> DECODE (full FLG grammar + CRC32/ISIZE trailer
    verify) -> integer-exact profile of the VERIFIED data. The
    compressed size is deliberately NOT an oracle column (compressor
    behavior — bounded by a named test, the zip convention)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                payload = synth_gzip_payload(int(doc_id))
                nm = f"doc{int(doc_id)}.txt"
                name, data = decode_gzip(encode_gzip(payload, nm))
                assert name == nm and data == payload
                out.append(
                    (
                        int(doc_id), len(name), len(data),
                        sum(int(x) for x in data),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "name_len", "isize", "sum_bytes"],
            )

    return spread(base).mapInPandas(run, GZIP_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL ICO container (built r11, staged r12) — the Windows icon
# directory wrapping MULTIPLE embedded images: ICONDIR + 16-byte
# ICONDIRENTRY table (sizes, bit depth, byte counts, image offsets),
# each image a BITMAPINFOHEADER DIB with the ICO quirks — biHeight
# doubled (XOR pixel data + 1-bpp AND transparency mask) and NO
# BITMAPFILEHEADER. The first container-of-codecs composition: the
# 24-bit bottom-up padded-row pixel layout is the BMP codec's, the
# directory walk is the container's own.
# ---------------------------------------------------------------------------


def encode_ico(images: list[np.ndarray]) -> bytes:
    """[(h, w, 3) uint8 RGB] -> ICO bytes (24-bit DIBs, opaque AND
    masks). Deterministic layout: entries in input order, images
    packed back-to-back after the directory."""
    import struct

    if not images or len(images) > 255:
        raise ValueError("ICO needs 1..255 images")
    dibs = []
    for rgb in images:
        h, w, _ = rgb.shape
        if w > 255 or h > 255:
            raise ValueError("ICO images are at most 255x255")
        xor_pad = (4 - (3 * w) % 4) % 4
        and_row = ((w + 31) // 32) * 4  # 1bpp rows pad to 32 bits
        xor_size = (3 * w + xor_pad) * h
        body = bytearray(
            struct.pack(
                "<IiiHHIIiiII",
                40, w, 2 * h, 1, 24, 0, xor_size + and_row * h,
                0, 0, 0, 0,
            )
        )
        for y in range(h - 1, -1, -1):  # bottom-up BGR, padded rows
            body += rgb[y, :, ::-1].tobytes()
            body += b"\x00" * xor_pad
        body += b"\x00" * (and_row * h)  # all-opaque AND mask
        dibs.append((w, h, bytes(body)))
    out = bytearray(struct.pack("<HHH", 0, 1, len(dibs)))
    offset = 6 + 16 * len(dibs)
    for w, h, body in dibs:
        out += struct.pack(
            "<BBBBHHII",
            w % 256, h % 256, 0, 0, 1, 24, len(body), offset,
        )
        offset += len(body)
    for _, _, body in dibs:
        out += body
    return bytes(out)


def decode_ico(raw: bytes) -> list[np.ndarray]:
    """ICO bytes -> [(h, w, 3) uint8 RGB]. Walks the directory,
    verifies the reserved/type header, each entry's recorded byte
    count and offset, the doubled biHeight, 24bpp BI_RGB, and that
    the declared entry size matches the directory width/height; loud
    reject (ValueError) on any inconsistency — the container-family
    contract."""
    import struct

    if len(raw) < 6:
        raise ValueError("truncated ICO header")
    rsv, typ, cnt = struct.unpack("<HHH", raw[:6])
    if rsv != 0 or typ != 1:
        raise ValueError("not an ICO file")
    images = []
    for e in range(cnt):
        off = 6 + 16 * e
        if off + 16 > len(raw):
            raise ValueError("truncated ICONDIRENTRY table")
        ew, eh, _cols, ersv, _planes, bpp, size, img_off = struct.unpack(
            "<BBBBHHII", raw[off : off + 16]
        )
        if ersv != 0:
            raise ValueError(f"entry {e}: bad reserved byte")
        if img_off + size > len(raw):
            raise ValueError(f"entry {e}: image exceeds file")
        if size < 40:  # a full BITMAPINFOHEADER is assumed below
            raise ValueError(f"entry {e}: DIB too small")
        dib = raw[img_off : img_off + size]
        (hsz, w, h2, _pl, dbpp, comp) = struct.unpack(
            "<IiiHHI", dib[:20]
        )
        if hsz != 40 or comp != 0 or dbpp != 24:
            raise ValueError(f"entry {e}: unsupported DIB")
        if h2 % 2 != 0:
            raise ValueError(f"entry {e}: biHeight not doubled")
        h = h2 // 2
        if (ew % 256, eh % 256) != (w % 256, h % 256):
            raise ValueError(f"entry {e}: directory/DIB size mismatch")
        xor_pad = (4 - (3 * w) % 4) % 4
        row_bytes = 3 * w + xor_pad
        and_row = ((w + 31) // 32) * 4
        if 40 + row_bytes * h + and_row * h != size:
            raise ValueError(f"entry {e}: recorded size mismatch")
        img = np.empty((h, w, 3), dtype=np.uint8)
        for i in range(h):
            start = 40 + i * row_bytes
            row = np.frombuffer(
                dib[start : start + 3 * w], dtype=np.uint8
            )
            img[h - 1 - i] = row.reshape(w, 3)[:, ::-1]
        images.append(img)
    return images


def synth_ico_images(doc_id: int) -> list[np.ndarray]:
    """Deterministic icon set both engines can state: icon j of
    n = 1 + doc_id%3 is w=4+(doc_id+3j)%13 by h=3+(doc_id+5j)%11 with
    r = (doc_id + x + 2y + 7j) % 256, g = (r+85)%256, b = (r+170)%256."""
    d = int(doc_id)
    out = []
    for j in range(1 + d % 3):
        w = 4 + (d + 3 * j) % 13
        h = 3 + (d + 5 * j) % 11
        y, x = np.mgrid[0:h, 0:w]
        r = (d + x + 2 * y + 7 * j) % 256
        img = np.stack(
            [r, (r + 85) % 256, (r + 170) % 256], axis=-1
        ).astype(np.uint8)
        out.append(img)
    return out


ICO_FEATURE_SCHEMA = (
    "doc_id long, n_icons int, sum_w long, sum_h long, sum_px long"
)


def ico_ingest_features(base: DataFrame) -> DataFrame:
    """(doc_id) -> synth icons -> ENCODE hand-written ICO -> DECODE
    (directory walk + entry/DIB consistency verify + BMP-layout pixel
    unpack) -> integer-exact profile over the DECODED pixels. The
    oracle states the profile from the synthesis formula, so any
    directory, offset, mask-accounting, or pixel-layout bug
    hash-mismatches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                spec = synth_ico_images(int(doc_id))
                got = decode_ico(encode_ico(spec))
                assert len(got) == len(spec)
                for a, b in zip(got, spec):
                    assert (a == b).all()
                out.append(
                    (
                        int(doc_id), len(got),
                        sum(i.shape[1] for i in got),
                        sum(i.shape[0] for i in got),
                        sum(int(i.sum()) for i in got),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_icons", "sum_w", "sum_h", "sum_px",
                ],
            )

    return spread(base).mapInPandas(run, ICO_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL Standard MIDI File codec (built r12, staged r13) — the
# variable-length-quantity format family: big-endian chunk framing
# (MThd/MTrk with recorded lengths), VLQ delta times (7-bit groups,
# MSB continuation, <=4 bytes), channel messages with status-family
# data widths, RUNNING STATUS on decode (a data-first byte reuses the
# previous channel status — the real SMF compression mechanism, which
# the deterministic encoder also emits for consecutive same-status
# events), meta events (type + VLQ length), and the mandatory
# end-of-track meta. Loud reject (ValueError) on bad magic / header
# length / overlong VLQ / data byte >= 0x80 / running status with no
# prior status / track-length mismatch / missing end-of-track /
# truncation — the container-family contract. No stdlib MIDI module
# exists, so interop is pinned by hand-computed on-wire bytes (the
# TGA/QOI convention).
# ---------------------------------------------------------------------------

_MIDI_DIVISION = 480


def _vlq(v: int) -> bytes:
    """Variable-length quantity: 7 bits per byte, high bit = continue."""
    if not 0 <= v <= 0x0FFFFFFF:
        raise ValueError(f"VLQ out of range: {v}")
    groups = [v & 0x7F]
    v >>= 7
    while v:
        groups.append(0x80 | (v & 0x7F))
        v >>= 7
    return bytes(reversed(groups))


def _read_vlq(raw: bytes, pos: int) -> tuple[int, int]:
    """(value, next_pos); rejects >4-byte and truncated quantities."""
    v = 0
    for i in range(4):
        if pos >= len(raw):
            raise ValueError("truncated VLQ")
        b = raw[pos]
        pos += 1
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            return v, pos
    raise ValueError("overlong VLQ (more than 4 bytes)")


# data-byte widths per channel-message status family (high nibble)
_MIDI_WIDTHS = {0x8: 2, 0x9: 2, 0xA: 2, 0xB: 2, 0xC: 1, 0xD: 1, 0xE: 2}


def encode_midi(tracks: list[list[tuple[int, bytes]]]) -> bytes:
    """[[(delta_ticks, event_bytes)]] -> format-1 SMF bytes. Events are
    complete messages (status + data, or 0xFF meta with type + VLQ
    length + data). Deterministic; emits running status whenever a
    channel event repeats the previous status byte."""
    import struct

    out = bytearray(
        struct.pack(">4sIHHH", b"MThd", 6, 1, len(tracks), _MIDI_DIVISION)
    )
    for trk in tracks:
        body = bytearray()
        running = None
        for delta, ev in trk:
            body += _vlq(delta)
            if ev[0] >= 0xF0 or ev[0] >> 4 not in _MIDI_WIDTHS:
                if ev[0] != 0xFF:
                    raise ValueError(f"unsupported event {ev[0]:#x}")
                body += ev
                running = None
            elif running == ev[0]:
                body += ev[1:]
            else:
                body += ev
                running = ev[0]
        out += struct.pack(">4sI", b"MTrk", len(body)) + body
    return bytes(out)


def decode_midi(raw: bytes) -> list[dict]:
    """SMF bytes -> per-track dicts {n_events, total_ticks, sum_pitch}.
    n_events counts channel + meta + sysex events (end-of-track
    included); total_ticks sums the track's deltas; sum_pitch sums the
    first data byte of note-on events (status 0x9n)."""
    import struct

    if len(raw) < 14:
        raise ValueError("truncated MThd")
    magic, hlen, fmt, ntrks, division = struct.unpack(">4sIHHH", raw[:14])
    if magic != b"MThd":
        raise ValueError("bad magic: not an SMF file")
    if hlen != 6:
        raise ValueError(f"bad MThd length {hlen}")
    if fmt not in (0, 1, 2):
        raise ValueError(f"unknown SMF format {fmt}")
    if division & 0x8000:
        raise ValueError("SMPTE division not supported")
    pos = 14
    tracks = []
    for t in range(ntrks):
        if pos + 8 > len(raw):
            raise ValueError(f"truncated MTrk header for track {t}")
        tmagic, tlen = struct.unpack(">4sI", raw[pos : pos + 8])
        if tmagic != b"MTrk":
            raise ValueError(f"bad track magic at offset {pos}")
        pos += 8
        end = pos + tlen
        if end > len(raw):
            raise ValueError(f"truncated track {t}")
        n_events = total = pitch = 0
        running = None
        ended = False
        while pos < end:
            if ended:
                raise ValueError(f"events after end-of-track in track {t}")
            delta, pos = _read_vlq(raw, pos)
            total += delta
            if pos >= end:
                raise ValueError(f"truncated event in track {t}")
            b = raw[pos]
            if b == 0xFF:  # meta
                if pos + 2 > end:
                    raise ValueError(f"truncated meta in track {t}")
                mtype = raw[pos + 1]
                mlen, pos = _read_vlq(raw, pos + 2)
                if pos + mlen > end:
                    raise ValueError(f"truncated meta data in track {t}")
                pos += mlen
                running = None
                if mtype == 0x2F:
                    ended = True
            elif b in (0xF0, 0xF7):  # sysex
                slen, pos = _read_vlq(raw, pos + 1)
                if pos + slen > end:
                    raise ValueError(f"truncated sysex in track {t}")
                pos += slen
                running = None
            else:
                if b & 0x80:
                    status = b
                    pos += 1
                    running = status
                elif running is None:
                    raise ValueError(
                        f"running status with no prior status in track {t}"
                    )
                else:
                    status = running
                width = _MIDI_WIDTHS.get(status >> 4)
                if width is None:
                    raise ValueError(f"bad status byte {status:#x}")
                if pos + width > end:
                    raise ValueError(f"truncated channel event in track {t}")
                data = raw[pos : pos + width]
                if any(d & 0x80 for d in data):
                    raise ValueError(f"data byte >= 0x80 in track {t}")
                if status >> 4 == 0x9:
                    pitch += data[0]
                pos += width
            n_events += 1
        if pos != end:
            raise ValueError(f"track {t} length field mismatch")
        if not ended:
            raise ValueError(f"track {t} missing end-of-track meta")
        tracks.append(
            {"n_events": n_events, "total_ticks": total, "sum_pitch": pitch}
        )
    if pos != len(raw):
        raise ValueError("trailing garbage after the last track")
    return tracks


def synth_midi_tracks(doc_id: int) -> list[list[tuple[int, bytes]]]:
    """Deterministic two-track song both engines can state: a tempo
    track (set-tempo meta + EOT), and a note track with
    n = 3 + doc_id%5 note-on/off pairs on channel 0 — note-on deltas
    exercise 2-byte VLQs (128 + (doc_id*13 + j*29) % 16000), note-off
    deltas 1-byte (24 + (doc_id*7 + j*11) % 96), pitches
    60 + (doc_id*5 + j*7) % 24, fixed velocity 64/0 (the 0-velocity
    off is ALSO status 0x90, so the encoder's running status engages
    for the whole note stream)."""
    d = int(doc_id)
    tempo = [
        (0, bytes([0xFF, 0x51, 0x03, 0x07, 0xA1, 0x20])),
        (0, bytes([0xFF, 0x2F, 0x00])),
    ]
    notes = []
    for j in range(3 + d % 5):
        on = 128 + (d * 13 + j * 29) % 16000
        off = 24 + (d * 7 + j * 11) % 96
        p = 60 + (d * 5 + j * 7) % 24
        notes.append((on, bytes([0x90, p, 64])))
        notes.append((off, bytes([0x90, p, 0])))
    notes.append((0, bytes([0xFF, 0x2F, 0x00])))
    return [tempo, notes]


MIDI_FEATURE_SCHEMA = (
    "doc_id long, n_tracks int, n_events long, total_ticks long,"
    " sum_pitch long"
)


def midi_ingest_features(base: DataFrame) -> DataFrame:
    """(doc_id) -> synth tracks -> ENCODE format-1 SMF (VLQ deltas +
    running status) -> DECODE (chunk framing, VLQ walk, running-status
    resolution, track-length and EOT verification) -> integer-exact
    profile. The oracle states every column from the synthesis
    formula, so a VLQ, framing, or running-status bug
    hash-mismatches. NOTE sum_pitch counts note-ON statuses, which
    includes the 0-velocity offs by design (they are 0x90 events on
    the wire — the running-status device)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                raw = encode_midi(synth_midi_tracks(int(doc_id)))
                got = decode_midi(raw)
                out.append(
                    (
                        int(doc_id),
                        len(got),
                        sum(t["n_events"] for t in got),
                        sum(t["total_ticks"] for t in got),
                        sum(t["sum_pitch"] for t in got),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_tracks", "n_events", "total_ticks",
                    "sum_pitch",
                ],
            )

    return spread(base).mapInPandas(run, MIDI_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL UTF-8 validation audit (built r12, staged r13) — the
# training-data hygiene scanner: a byte-level DFA classifying every
# position of a binary payload as a decoded codepoint (by encoded
# width) or as one of five malformation classes (overlong form,
# surrogate half, out-of-range / invalid lead, bad continuation,
# truncated at EOF). Recovery contract (documented, deterministic):
# on a lead whose CLASS is known from the lead byte itself (C0/C1
# overlong, F5-FF out-of-range) or whose second byte proves an
# overlong/surrogate/out-of-range form (E0 80-9F, ED A0-BF, F0 80-8F,
# F4 90-BF), the scanner consumes the lead plus subsequent GENERIC
# continuation bytes (80-BF) up to the nominal sequence width — one
# error per planted subpart; a continuation byte that is simply not
# 80-BF consumes only the bytes before it (the failing byte rescans
# as its own unit); a stray continuation consumes one byte. Matches
# Python's strict decoder on the accept side (pinned by test);
# the class taxonomy is the audit's added value.
# ---------------------------------------------------------------------------


def utf8_scan(raw: bytes) -> dict:
    """bytes -> {'cp1','cp2','cp3','cp4','overlong','surrogate',
    'range','continuation','stray','truncated'} counts."""
    c = dict.fromkeys(
        ("cp1", "cp2", "cp3", "cp4", "overlong", "surrogate", "range",
         "continuation", "stray", "truncated"), 0
    )
    n, i = len(raw), 0

    def eat_generic(pos: int, upto: int) -> int:
        while upto and pos < n and 0x80 <= raw[pos] <= 0xBF:
            pos += 1
            upto -= 1
        return pos

    while i < n:
        b = raw[i]
        if b < 0x80:
            c["cp1"] += 1
            i += 1
            continue
        if 0x80 <= b <= 0xBF:
            c["stray"] += 1
            i += 1
            continue
        if b in (0xC0, 0xC1):
            c["overlong"] += 1
            i = eat_generic(i + 1, 1)
            continue
        if b >= 0xF5:
            c["range"] += 1
            i = eat_generic(i + 1, 3)
            continue
        width = 2 if b < 0xE0 else 3 if b < 0xF0 else 4
        if i + width > n:
            tail_ok = all(
                0x80 <= raw[j] <= 0xBF for j in range(i + 1, n)
            )
            if tail_ok:
                c["truncated"] += 1
                i = n
                continue
            # a non-continuation inside the tail: fall through to the
            # per-byte checks below, which will classify it
        # second-byte form checks (class known at byte 2)
        if width >= 3 and i + 1 < n and 0x80 <= raw[i + 1] <= 0xBF:
            b1 = raw[i + 1]
            bad = None
            if b == 0xE0 and b1 < 0xA0:
                bad = "overlong"
            elif b == 0xED and b1 > 0x9F:
                bad = "surrogate"
            elif b == 0xF0 and b1 < 0x90:
                bad = "overlong"
            elif b == 0xF4 and b1 > 0x8F:
                bad = "range"
            if bad:
                c[bad] += 1
                i = eat_generic(i + 1, width - 1)
                continue
        j = i + 1
        ok = True
        while j < min(i + width, n):
            if not 0x80 <= raw[j] <= 0xBF:
                ok = False
                break
            j += 1
        if not ok:
            c["continuation"] += 1
            i = j  # resume AT the failing byte
            continue
        if j < i + width:  # clean but short tail at EOF
            c["truncated"] += 1
            i = n
            continue
        c[f"cp{width}"] += 1
        i += width
    return c


def synth_utf8_payload(doc_id: int) -> bytes:
    """Deterministic payload with closed-form class counts: a ASCII
    bytes, t 2-byte (C3 A9), h 3-byte (E2 82 AC), f 4-byte
    (F0 9F 98 80) codepoints, then planted malformations — ov
    overlong (C0 AF), su surrogate (ED A0 80), rg out-of-range
    (F5 80 80 80), bc bad continuation (C3 then 'A' — the 'A' rescans
    as ASCII), and tr = one truncated 3-byte lead (E2 82) at EOF."""
    d = int(doc_id)
    a, t, h, f = 5 + d % 7, 2 + d % 3, 1 + d % 4, 1 + d % 2
    ov, su = d % 2, 1 if d % 3 == 0 else 0
    rg, bc = (1 if d % 5 == 0 else 0), (1 if d % 4 == 0 else 0)
    tr = 1 if d % 7 == 0 else 0
    out = bytearray()
    out += bytes(65 + (d + i) % 26 for i in range(a))
    out += b"\xc3\xa9" * t
    out += b"\xe2\x82\xac" * h
    out += b"\xf0\x9f\x98\x80" * f
    out += b"\xc0\xaf" * ov
    out += b"\xed\xa0\x80" * su
    out += b"\xf5\x80\x80\x80" * rg
    out += b"\xc3A" * bc
    out += b"\xe2\x82" * tr
    return bytes(out)


UTF8_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, cp_ascii long, cp_2b long, cp_3b long,"
    " cp_4b long, err_overlong long, err_surrogate long, err_range long,"
    " err_continuation long, err_truncated long"
)


def utf8_audit_features(base: DataFrame) -> DataFrame:
    """(doc_id) -> synth payload -> REAL DFA scan -> per-doc validity
    profile. The oracle states every count from the synthesis formula
    (a bad-continuation plant contributes one error AND one rescanned
    ASCII codepoint), so any DFA boundary bug — a surrogate accepted,
    an overlong counted as two errors, a truncation misclassified —
    hash-mismatches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                raw = synth_utf8_payload(int(doc_id))
                s = utf8_scan(raw)
                assert s["stray"] == 0  # synth plants none
                out.append(
                    (
                        int(doc_id), len(raw), s["cp1"], s["cp2"],
                        s["cp3"], s["cp4"], s["overlong"], s["surrogate"],
                        s["range"], s["continuation"], s["truncated"],
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_bytes", "cp_ascii", "cp_2b", "cp_3b",
                    "cp_4b", "err_overlong", "err_surrogate", "err_range",
                    "err_continuation", "err_truncated",
                ],
            )

    return spread(base).mapInPandas(run, UTF8_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL protobuf wire-format codec (built r12, staged r13) — the
# little-endian varint family beside MIDI's big-endian VLQ: ULEB128
# varints (7-bit groups, LSB-first, 10-byte cap), zigzag signed
# mapping ((v << 1) ^ (v >> 63)), field keys (field_number << 3 |
# wire_type), and the four classic wire types — 0 varint, 1 fixed64,
# 2 length-delimited, 5 fixed32. The decoder is a schema-less wire
# WALK (exactly what `protoc --decode_raw` does): it needs no .proto
# and no protobuf library, so it is NOT gated the way the
# transformWithState protobuf dependency is. Loud reject (ValueError)
# on overlong/truncated varints, unknown wire types, field number 0,
# and length overruns — the container-family contract.
# ---------------------------------------------------------------------------


def _uvarint(v: int) -> bytes:
    if not 0 <= v < 1 << 64:
        raise ValueError(f"varint out of range: {v}")
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(0x80 | b)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(raw: bytes, pos: int) -> tuple[int, int]:
    v = 0
    for i in range(10):
        if pos >= len(raw):
            raise ValueError("truncated varint")
        b = raw[pos]
        pos += 1
        v |= (b & 0x7F) << (7 * i)
        if not b & 0x80:
            if i == 9 and b > 1:
                raise ValueError("varint exceeds 64 bits")
            return v, pos
    raise ValueError("overlong varint (more than 10 bytes)")


def _zigzag(v: int) -> int:
    return ((v << 1) ^ (v >> 63)) & ((1 << 64) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def encode_protowire(fields: list[tuple[int, int, object]]) -> bytes:
    """[(field_number, wire_type, value)] -> wire bytes. wire_type 0
    takes a ZIGZAG-signed int, 1/5 take ints packed little-endian,
    2 takes bytes."""
    import struct

    out = bytearray()
    for fn, wt, val in fields:
        if fn < 1:
            raise ValueError(f"bad field number {fn}")
        out += _uvarint((fn << 3) | wt)
        if wt == 0:
            out += _uvarint(_zigzag(int(val)))
        elif wt == 1:
            out += struct.pack("<Q", int(val) & ((1 << 64) - 1))
        elif wt == 2:
            out += _uvarint(len(val)) + bytes(val)
        elif wt == 5:
            out += struct.pack("<I", int(val) & ((1 << 32) - 1))
        else:
            raise ValueError(f"unknown wire type {wt}")
    return bytes(out)


def decode_protowire(raw: bytes) -> dict:
    """Schema-less wire walk -> {'n_fields', 'max_field', 'sum_varints'
    (zigzag-decoded), 'len_bytes' (total length-delimited payload),
    'sum_fixed' (fixed32+fixed64 values)}. Loud ValueError on any
    malformation."""
    import struct

    pos, n = 0, len(raw)
    nf = maxf = sv = lb = sf = 0
    while pos < n:
        key, pos = _read_uvarint(raw, pos)
        fn, wt = key >> 3, key & 7
        if fn < 1:
            raise ValueError(f"field number 0 at offset {pos}")
        if wt == 0:
            u, pos = _read_uvarint(raw, pos)
            sv += _unzigzag(u)
        elif wt == 1:
            if pos + 8 > n:
                raise ValueError("truncated fixed64")
            sf += struct.unpack_from("<Q", raw, pos)[0]
            pos += 8
        elif wt == 2:
            ln, pos = _read_uvarint(raw, pos)
            if pos + ln > n:
                raise ValueError("length-delimited field overruns buffer")
            lb += ln
            pos += ln
        elif wt == 5:
            if pos + 4 > n:
                raise ValueError("truncated fixed32")
            sf += struct.unpack_from("<I", raw, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unknown wire type {wt}")
        nf += 1
        maxf = max(maxf, fn)
    return {
        "n_fields": nf, "max_field": maxf, "sum_varints": sv,
        "len_bytes": lb, "sum_fixed": sf,
    }


def synth_protowire_fields(doc_id: int) -> list[tuple[int, int, object]]:
    """Deterministic message both engines can state: m = 2 + d%4
    zigzag varints (alternating sign, 2-byte-varint magnitudes),
    one fixed32, one fixed64, and one length-delimited blob of
    L = 10 + d%20 bytes."""
    d = int(doc_id)
    fields: list[tuple[int, int, object]] = []
    for j in range(2 + d % 4):
        mag = 200 + (d * 17 + j * 31) % 8000
        fields.append((j + 1, 0, mag if j % 2 == 0 else -mag))
    fields.append((9, 5, (d * 7) % 100000))
    fields.append((10, 1, (d * 13) % 10**9))
    fields.append((11, 2, bytes((d + i) % 256 for i in range(10 + d % 20))))
    return fields


PROTOWIRE_FEATURE_SCHEMA = (
    "doc_id long, n_fields int, max_field int, sum_varints long,"
    " len_bytes long, sum_fixed long"
)


def protowire_ingest_features(base: DataFrame) -> DataFrame:
    """(doc_id) -> synth fields -> ENCODE wire bytes (ULEB128 +
    zigzag + fixed + length-delimited) -> schema-less DECODE walk ->
    integer-exact profile. The oracle states every column from the
    synthesis formula (the zigzag sum telescopes to the alternating
    magnitude sum), so a varint-width, zigzag-sign, or framing bug
    hash-mismatches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                spec = synth_protowire_fields(int(doc_id))
                prof = decode_protowire(encode_protowire(spec))
                out.append(
                    (
                        int(doc_id), prof["n_fields"], prof["max_field"],
                        prof["sum_varints"], prof["len_bytes"],
                        prof["sum_fixed"],
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_fields", "max_field", "sum_varints",
                    "len_bytes", "sum_fixed",
                ],
            )

    return spread(base).mapInPandas(run, PROTOWIRE_FEATURE_SCHEMA)


UTF8_METRICS = (
    "docs", "bytes", "cp1", "cp2", "cp3", "cp4", "overlong",
    "surrogate", "range", "continuation", "truncated",
)


def utf8_corpus_readout(counts: DataFrame) -> DataFrame:
    """Corpus encoding-health rollup as a pure function of the
    (metric, c) long table — the ADDITIVE sufficient statistic of the
    UTF-8 audit (11 fixed keys), shared by the batch corpus query and
    the streaming drain."""
    agg = [
        F.sum(F.when(F.col("metric") == m, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias(a)
        for m, a in zip(
            UTF8_METRICS,
            (
                "n_docs", "n_bytes", "cp_ascii", "cp_2b", "cp_3b",
                "cp_4b", "err_overlong", "err_surrogate", "err_range",
                "err_continuation", "err_truncated",
            ),
        )
    ]
    return counts.agg(*agg).where(F.col("n_docs") > 0)


def utf8_metric_counts(docs: DataFrame) -> DataFrame:
    """(metric, c): the audit's per-doc profile melted to additive
    per-metric deltas — the worker stream's batch contribution."""
    feats = utf8_audit_features(docs.select("doc_id"))
    pairs = ", ".join(
        f"'{m}', CAST({c} AS BIGINT)"
        for m, c in zip(
            UTF8_METRICS,
            (
                "1", "n_bytes", "cp_ascii", "cp_2b", "cp_3b", "cp_4b",
                "err_overlong", "err_surrogate", "err_range",
                "err_continuation", "err_truncated",
            ),
        )
    )
    return (
        feats.selectExpr(
            f"stack({len(UTF8_METRICS)}, {pairs}) AS (metric, v)"
        )
        .groupBy("metric")
        .agg(F.sum("v").alias("c"))
    )


# ---------------------------------------------------------------------------
# REAL parquet footer codec (built r12, staged r13) — a from-scratch
# Thrift COMPACT-protocol walker (the protocol under every parquet
# footer): PAR1 magic at both ends, the little-endian footer length,
# then a schema-less compact-struct walk of FileMetaData extracting
# num_rows (field 3, zigzag i64), the row-group count (field 4, list
# of structs), and the schema leaf count (field 2, list of
# SchemaElement — a flattened tree where num_children (field 5)
# distinguishes group nodes from leaf columns). Unknown fields of any
# type skip generically (field-id deltas, varint/zigzag ints, binary,
# nested lists/maps/structs, list-of-bool one-byte elements), so the
# walker reads footers written by ANY writer version. Loud reject
# (ValueError) on bad magic, truncated footer, or malformed compact
# framing. The protowire codec covers proto3's wire grammar; this
# covers Thrift's — the two varint container grammars of the data
# lake, both schema-less.
# ---------------------------------------------------------------------------


def _tc_varint(raw: bytes, pos: int) -> tuple[int, int]:
    v = shift = 0
    while True:
        if pos >= len(raw):
            raise ValueError("truncated compact varint")
        b = raw[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7
        if shift > 70:
            raise ValueError("overlong compact varint")


def _tc_zigzag(raw: bytes, pos: int) -> tuple[int, int]:
    u, pos = _tc_varint(raw, pos)
    return (u >> 1) ^ -(u & 1), pos


def _tc_skip(raw: bytes, pos: int, typ: int) -> int:
    """Skip one compact-protocol value of the given element type."""
    if typ in (1, 2):      # bool as LIST element: one byte
        return pos + 1
    if typ == 3:           # byte
        return pos + 1
    if typ in (4, 5, 6):   # i16/i32/i64 zigzag varint
        _, pos = _tc_zigzag(raw, pos)
        return pos
    if typ == 7:           # double
        return pos + 8
    if typ == 8:           # binary/string
        ln, pos = _tc_varint(raw, pos)
        if pos + ln > len(raw):
            raise ValueError("binary field overruns footer")
        return pos + ln
    if typ in (9, 10):     # list/set
        hdr = raw[pos]
        pos += 1
        size, etype = hdr >> 4, hdr & 0x0F
        if size == 15:
            size, pos = _tc_varint(raw, pos)
        for _ in range(size):
            pos = _tc_skip(raw, pos, etype)
        return pos
    if typ == 11:          # map
        size, pos = _tc_varint(raw, pos)
        if size:
            kv = raw[pos]
            pos += 1
            for _ in range(size):
                pos = _tc_skip(raw, pos, kv >> 4)
                pos = _tc_skip(raw, pos, kv & 0x0F)
        return pos
    if typ == 12:          # struct
        _, pos = _tc_walk_struct(raw, pos)
        return pos
    raise ValueError(f"unknown compact type {typ}")


def _tc_walk_struct(
    raw: bytes, pos: int, want: dict | None = None
) -> tuple[dict, int]:
    """Walk one compact struct. ``want`` maps field_id -> handler
    called as handler(raw, pos, typ) -> (value, new_pos); unknown
    fields skip generically. Returns ({field_id: value}, end_pos)."""
    out: dict = {}
    fid = 0
    while True:
        if pos >= len(raw):
            raise ValueError("unterminated compact struct")
        b = raw[pos]
        pos += 1
        if b == 0:
            return out, pos
        delta, typ = b >> 4, b & 0x0F
        if delta == 0:
            fid, pos = _tc_zigzag(raw, pos)
        else:
            fid += delta
        if want and fid in want:
            out[fid], pos = want[fid](raw, pos, typ)
        elif typ in (1, 2):  # bool VALUE is encoded in the type nibble
            pass
        else:
            pos = _tc_skip(raw, pos, typ)


def _tc_bool_field(raw, pos, typ):
    return typ == 1, pos


def _tc_i_field(raw, pos, typ):
    if typ not in (4, 5, 6):
        raise ValueError(f"expected int field, got type {typ}")
    return _tc_zigzag(raw, pos)


def _tc_count_struct_list(raw, pos, typ):
    if typ not in (9, 10):
        raise ValueError(f"expected list field, got type {typ}")
    hdr = raw[pos]
    pos += 1
    size, etype = hdr >> 4, hdr & 0x0F
    if size == 15:
        size, pos = _tc_varint(raw, pos)
    if etype != 12:
        raise ValueError(f"expected struct elements, got type {etype}")
    for _ in range(size):
        _, pos = _tc_walk_struct(raw, pos)
    return size, pos


def _tc_schema_leaves(raw, pos, typ):
    """field 2 of FileMetaData: list<SchemaElement>; a leaf is an
    element with no/zero num_children (field 5)."""
    if typ not in (9, 10):
        raise ValueError(f"expected schema list, got type {typ}")
    hdr = raw[pos]
    pos += 1
    size, etype = hdr >> 4, hdr & 0x0F
    if size == 15:
        size, pos = _tc_varint(raw, pos)
    if etype != 12:
        raise ValueError(f"expected SchemaElement structs, got {etype}")
    leaves = 0
    for _ in range(size):
        el, pos = _tc_walk_struct(raw, pos, {5: _tc_i_field})
        if el.get(5, 0) == 0:
            leaves += 1
    return (size, leaves), pos


def decode_parquet_footer(raw: bytes) -> dict:
    """parquet file bytes -> {'num_rows', 'n_row_groups',
    'n_schema_elements', 'n_leaf_columns'} parsed from the Thrift
    compact footer by the generic walker above."""
    import struct

    if len(raw) < 12 or raw[:4] != b"PAR1" or raw[-4:] != b"PAR1":
        raise ValueError("bad parquet magic")
    (flen,) = struct.unpack("<I", raw[-8:-4])
    if flen + 8 > len(raw):
        raise ValueError("footer length exceeds file")
    meta = raw[len(raw) - 8 - flen : len(raw) - 8]
    fields, end = _tc_walk_struct(
        meta,
        0,
        {
            2: _tc_schema_leaves,
            3: _tc_i_field,
            4: _tc_count_struct_list,
        },
    )
    if 3 not in fields or 4 not in fields or 2 not in fields:
        raise ValueError("FileMetaData missing required fields")
    n_elem, n_leaves = fields[2]
    return {
        "num_rows": fields[3],
        "n_row_groups": fields[4],
        "n_schema_elements": n_elem,
        "n_leaf_columns": n_leaves,
    }


PARQUET_FOOTER_SCHEMA = (
    "table_name string, num_rows long, n_row_groups int,"
    " n_leaf_columns int"
)


def parquet_footer_features(files: DataFrame) -> DataFrame:
    """(path, content) binary rows -> per-file footer profile; the
    table name is the file stem."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                prof = decode_parquet_footer(bytes(content))
                name = path.rsplit("/", 1)[-1]
                if name.endswith(".parquet"):
                    name = name[: -len(".parquet")]
                out.append(
                    (
                        name, prof["num_rows"], prof["n_row_groups"],
                        prof["n_leaf_columns"],
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "table_name", "num_rows", "n_row_groups",
                    "n_leaf_columns",
                ],
            )

    return spread(files.select("path", "content")).mapInPandas(
        run, PARQUET_FOOTER_SCHEMA
    )


# ---------------------------------------------------------------------------
# REAL Bencode codec (built r12, staged r13) — the BitTorrent metainfo
# encoding: i<int>e integers (canonical — no leading zeros, no -0),
# <len>:<bytes> byte strings (no leading zeros in the length), l...e
# lists, d...e dicts whose byte-string keys MUST appear in raw-byte
# sorted order without duplicates (the canonical-form rule that makes
# infohashes well defined). The decoder enforces the FULL canonical
# grammar with loud rejects (ValueError) — the container-family
# contract — and the encoder emits canonical form by construction
# (sorted keys), so encode->decode is the identity on canonical data.
# ---------------------------------------------------------------------------


def encode_bencode(obj) -> bytes:
    """int / bytes / list / dict-with-bytes-keys -> canonical bencode."""
    if isinstance(obj, bool):
        raise ValueError("bencode has no boolean type")
    if isinstance(obj, int):
        return b"i%de" % obj
    if isinstance(obj, bytes):
        return b"%d:%s" % (len(obj), obj)
    if isinstance(obj, list):
        return b"l" + b"".join(encode_bencode(x) for x in obj) + b"e"
    if isinstance(obj, dict):
        keys = list(obj)
        if any(not isinstance(k, bytes) for k in keys):
            raise ValueError("bencode dict keys must be bytes")
        if len(set(keys)) != len(keys):
            raise ValueError("duplicate dict key")
        out = b"d"
        for k in sorted(keys):
            out += encode_bencode(k) + encode_bencode(obj[k])
        return out + b"e"
    raise ValueError(f"unencodable type {type(obj).__name__}")


def decode_bencode(raw: bytes) -> dict:
    """Canonical-grammar walk -> profile {'n_ints', 'sum_ints',
    'n_strs', 'str_bytes', 'n_keys', 'max_depth'}. Dict KEYS count in
    n_keys (not n_strs/str_bytes); value strings count in both. Loud
    ValueError on: truncation, trailing garbage, i03e / i-0e /
    empty-integer forms, string lengths with leading zeros, non-string
    dict keys, unsorted or duplicate dict keys, unknown type bytes."""
    prof = {
        "n_ints": 0, "sum_ints": 0, "n_strs": 0, "str_bytes": 0,
        "n_keys": 0, "max_depth": 0,
    }

    def need(pos: int, k: int = 1) -> None:
        if pos + k > len(raw):
            raise ValueError(f"truncated at offset {pos}")

    def read_int_digits(pos: int, term: int) -> tuple[int, int]:
        start = pos
        neg = False
        if raw[pos:pos + 1] == b"-":
            neg = True
            pos += 1
        ds = pos
        while pos < len(raw) and raw[pos] != term:
            if not 0x30 <= raw[pos] <= 0x39:
                raise ValueError(f"bad integer byte at offset {pos}")
            pos += 1
        need(pos)  # the terminator itself
        if pos == ds:
            raise ValueError(f"empty integer at offset {start}")
        if raw[ds] == 0x30 and pos - ds > 1:
            raise ValueError(f"leading zero at offset {ds}")
        v = int(raw[ds:pos])
        if neg:
            if v == 0:
                raise ValueError(f"negative zero at offset {start}")
            v = -v
        return v, pos + 1

    def walk(pos: int, depth: int):
        prof["max_depth"] = max(prof["max_depth"], depth)
        need(pos)
        b = raw[pos]
        if b == 0x69:  # i
            v, pos = read_int_digits(pos + 1, 0x65)
            prof["n_ints"] += 1
            prof["sum_ints"] += v
            return ("i", v), pos
        if 0x30 <= b <= 0x39:  # string
            ln, pos = read_int_digits(pos, 0x3A)
            if ln < 0:
                raise ValueError("negative string length")
            need(pos, ln)
            s = raw[pos:pos + ln]
            return ("s", s), pos + ln
        if b == 0x6C:  # l
            pos += 1
            while True:
                need(pos)
                if raw[pos] == 0x65:
                    return ("l", None), pos + 1
                item, pos = walk(pos, depth + 1)
                if item[0] == "s":
                    prof["n_strs"] += 1
                    prof["str_bytes"] += len(item[1])
        if b == 0x64:  # d
            pos += 1
            prev = None
            while True:
                need(pos)
                if raw[pos] == 0x65:
                    return ("d", None), pos + 1
                key, pos = walk(pos, depth + 1)
                if key[0] != "s":
                    raise ValueError("non-string dict key")
                if prev is not None and key[1] <= prev:
                    raise ValueError(
                        f"unsorted or duplicate dict key {key[1]!r}"
                    )
                prev = key[1]
                prof["n_keys"] += 1
                val, pos = walk(pos, depth + 1)
                if val[0] == "s":
                    prof["n_strs"] += 1
                    prof["str_bytes"] += len(val[1])
        raise ValueError(f"unknown type byte {b:#x} at offset {pos}")

    top, pos = walk(0, 1)
    if pos != len(raw):
        raise ValueError(f"trailing garbage after offset {pos}")
    if top[0] == "s":
        prof["n_strs"] += 1
        prof["str_bytes"] += len(top[1])
    return prof


def synth_bencode_obj(doc_id: int) -> dict:
    """Deterministic torrent-like metainfo both engines can state:
    m = 1 + d%3 alternating-sign extra int fields, announce of
    10 + d%7 bytes, a 4-key info dict (length / name / piece length /
    pieces) with name of 5 + d%11 bytes and pieces of 20*(1 + d%3)
    bytes."""
    d = int(doc_id)
    m = 1 + d % 3
    obj: dict = {
        b"announce": bytes(97 + (d + i) % 26 for i in range(10 + d % 7)),
        b"info": {
            b"length": (d * 331) % 100000,
            b"name": bytes(97 + (d * 3 + i) % 26 for i in range(5 + d % 11)),
            b"piece length": 16384,
            b"pieces": bytes((d + i) % 256 for i in range(20 * (1 + d % 3))),
        },
    }
    for j in range(m):
        v = 100 + (d * 19 + j * 7) % 5000
        obj[b"x%d" % j] = v if j % 2 == 0 else -v
    return obj


BENCODE_FEATURE_SCHEMA = (
    "doc_id long, n_ints int, sum_ints long, n_strs int,"
    " str_bytes long, n_keys int, max_depth int"
)


def bencode_ingest_features(base: DataFrame) -> DataFrame:
    """(doc_id) -> synth metainfo -> ENCODE canonical bencode ->
    DECODE (full canonical-grammar walk with sorted-key enforcement)
    -> integer-exact profile. The oracle states every column from the
    synthesis formula, so an integer-grammar, length-prefix, or
    key-ordering bug hash-mismatches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                prof = decode_bencode(
                    encode_bencode(synth_bencode_obj(int(doc_id)))
                )
                out.append(
                    (
                        int(doc_id), prof["n_ints"], prof["sum_ints"],
                        prof["n_strs"], prof["str_bytes"], prof["n_keys"],
                        prof["max_depth"],
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_ints", "sum_ints", "n_strs",
                    "str_bytes", "n_keys", "max_depth",
                ],
            )

    return spread(base).mapInPandas(run, BENCODE_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL Avro Object Container File codec (built r12, staged r13) — the
# big-data-native sibling of the parquet-footer walker: magic
# Obj\x01, the file-metadata MAP (avro.schema JSON + avro.codec) in
# Avro map wire form (block count, key/value strings, terminator),
# a 16-byte sync marker, then data blocks of (record count varint,
# byte size varint, serialized records, sync repeat). Record body
# wire form for the fixture schema {id: long, n: int, name: string}:
# zigzag varints (Avro ints/longs are ALWAYS zigzag — unlike
# protobuf where it is opt-in) and length-prefixed UTF-8. Decoder
# verifies the magic, parses the metadata map, REJECTS unknown
# codecs, walks every block checking the byte-size field against the
# actual record walk AND the sync marker after every block — loud
# ValueError on any inconsistency (the container-family contract).
# ---------------------------------------------------------------------------

_AVRO_MAGIC = b"Obj\x01"
_AVRO_SCHEMA = (
    b'{"type":"record","name":"doc","fields":['
    b'{"name":"id","type":"long"},{"name":"n","type":"int"},'
    b'{"name":"name","type":"string"}]}'
)


def _avro_zz(v: int) -> bytes:
    return _uvarint(((v << 1) ^ (v >> 63)) & ((1 << 64) - 1))


def _avro_read_zz(raw: bytes, pos: int) -> tuple[int, int]:
    u, pos = _read_uvarint(raw, pos)
    return (u >> 1) ^ -(u & 1), pos


def _avro_str(s: bytes) -> bytes:
    return _avro_zz(len(s)) + s


def encode_avro_ocf(doc_id: int) -> bytes:
    """Deterministic single-file OCF: metadata map (schema + null
    codec), sync derived from doc_id, b = 1 + d%3 data blocks of
    r_j = 1 + (d+j)%4 records each; record k of block j is
    (id = d*1000 + j*10 + k, n = alternating-sign (d+j+k),
    name = 'n' * (1 + (d+k)%5))."""
    d = int(doc_id)
    sync = bytes((d * 31 + i * 7) % 256 for i in range(16))
    out = bytearray(_AVRO_MAGIC)
    # metadata map: one block of 2 entries, then the 0 terminator
    out += _avro_zz(2)
    out += _avro_str(b"avro.schema") + _avro_str(_AVRO_SCHEMA)
    out += _avro_str(b"avro.codec") + _avro_str(b"null")
    out += _avro_zz(0)
    out += sync
    for j in range(1 + d % 3):
        recs = bytearray()
        for k in range(1 + (d + j) % 4):
            rid = d * 1000 + j * 10 + k
            n = (d + j + k) if k % 2 == 0 else -(d + j + k)
            name = b"n" * (1 + (d + k) % 5)
            recs += _avro_zz(rid) + _avro_zz(n) + _avro_str(name)
        out += _avro_zz(1 + (d + j) % 4) + _avro_zz(len(recs))
        out += recs + sync
    return bytes(out)


def decode_avro_ocf(raw: bytes) -> dict:
    """OCF walk -> profile {'n_blocks', 'n_records', 'sum_ids',
    'sum_ints', 'name_bytes', 'schema_len'}. Verifies magic, metadata
    map form, null codec, per-block byte sizes, and every sync
    marker; loud ValueError on any malformation."""
    if raw[:4] != _AVRO_MAGIC:
        raise ValueError("bad OCF magic")
    pos = 4
    meta = {}
    while True:
        cnt, pos = _avro_read_zz(raw, pos)
        if cnt == 0:
            break
        if cnt < 0:  # negative count form: abs count + byte size
            raise ValueError("negative metadata block count unsupported")
        for _ in range(cnt):
            klen, pos = _avro_read_zz(raw, pos)
            key = raw[pos:pos + klen]
            pos += klen
            vlen, pos = _avro_read_zz(raw, pos)
            meta[bytes(key)] = raw[pos:pos + vlen]
            pos += vlen
    if meta.get(b"avro.codec", b"null") != b"null":
        raise ValueError(f"unsupported codec {meta.get(b'avro.codec')!r}")
    if b"avro.schema" not in meta:
        raise ValueError("missing avro.schema")
    if pos + 16 > len(raw):
        raise ValueError("truncated sync marker")
    sync = raw[pos:pos + 16]
    pos += 16
    nb = nr = sids = sints = nmb = 0
    while pos < len(raw):
        cnt, pos = _avro_read_zz(raw, pos)
        size, pos = _avro_read_zz(raw, pos)
        if cnt <= 0 or size < 0:
            raise ValueError(f"bad block header at offset {pos}")
        if pos + size + 16 > len(raw):
            raise ValueError("block overruns file")
        end = pos + size
        for _ in range(cnt):
            rid, pos = _avro_read_zz(raw, pos)
            n, pos = _avro_read_zz(raw, pos)
            ln, pos = _avro_read_zz(raw, pos)
            if ln < 0 or pos + ln > end:
                raise ValueError("record overruns block")
            nmb += ln
            pos += ln
            nr += 1
            sids += rid
            sints += n
        if pos != end:
            raise ValueError(
                f"block size mismatch: header {size}, walked {pos - end + size}"
            )
        if raw[pos:pos + 16] != sync:
            raise ValueError("sync marker mismatch")
        pos += 16
        nb += 1
    return {
        "n_blocks": nb, "n_records": nr, "sum_ids": sids,
        "sum_ints": sints, "name_bytes": nmb,
        "schema_len": len(meta[b"avro.schema"]),
    }


AVRO_FEATURE_SCHEMA = (
    "doc_id long, n_blocks int, n_records int, sum_ids long,"
    " sum_ints long, name_bytes long, schema_len int"
)


def avro_ingest_features(base: DataFrame) -> DataFrame:
    """(doc_id) -> synth OCF -> full container walk (magic, metadata
    map, codec gate, per-block size + sync verification) ->
    integer-exact profile stated by the oracle from the synthesis
    formula."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                p = decode_avro_ocf(encode_avro_ocf(int(doc_id)))
                out.append(
                    (
                        int(doc_id), p["n_blocks"], p["n_records"],
                        p["sum_ids"], p["sum_ints"], p["name_bytes"],
                        p["schema_len"],
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_blocks", "n_records", "sum_ids",
                    "sum_ints", "name_bytes", "schema_len",
                ],
            )

    return spread(base).mapInPandas(run, AVRO_FEATURE_SCHEMA)
