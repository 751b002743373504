"""Multimodal plumbing ([R]): binary payload schema, Arrow batch flow
through mapInPandas, deterministic fake features, stubbed real codecs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from posts_vectorizer_spark.operators import multimodal
from posts_vectorizer_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_payload_schema_and_meta(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    media = multimodal.attach_payload(docs)
    assert [f.name for f in media.schema.fields] == [
        "doc_id", "media_type", "payload", "meta",
    ]
    assert media.schema["payload"].dataType.simpleString() == "binary"
    row = media.where(F.col("doc_id") == 0).collect()[0]
    assert row.media_type == "text/plain"
    assert row.meta.n_bytes == len(row.payload)


def test_feature_extraction_fake_decode(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    media = multimodal.attach_payload(docs)
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 50
    by_id = {r.doc_id: r for r in feats}
    raw = {r.doc_id: r for r in media.collect()}
    for doc_id, r in by_id.items():
        assert len(r.features) == multimodal.N_FAKE_FEATURES
        assert r.n_bytes == len(raw[doc_id].payload)
        expected = multimodal._fake_decode(bytes(raw[doc_id].payload))
        assert np.allclose(r.features, expected, atol=1e-6)


def test_real_codecs_are_stubbed(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(5)
    media = multimodal.attach_payload(docs)
    with pytest.raises(Exception) as exc_info:
        multimodal.extract_features(media, use_real_codecs=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_codec_roundtrip(spark):
    """F8/F9 storage-boundary codecs: array<float> -> binary -> array."""
    from posts_vectorizer_spark.functions.vectors import decode_f32, encode_f32

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(10)
    round_tripped = (
        emb.select("vec_id", decode_f32(encode_f32("embedding")).alias("back"),
                   "embedding")
        .select(
            "vec_id",
            F.zip_with(
                "embedding", "back", lambda a, b: F.abs(a - b)
            ).alias("diffs"),
        )
        .select("vec_id", F.array_max("diffs").alias("max_diff"))
        .collect()
    )
    assert all(r.max_diff == 0.0 for r in round_tripped)


def test_resize_media_exact_target_and_deterministic(spark):
    from posts_vectorizer_spark.operators import multimodal
    from posts_vectorizer_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    media = multimodal.attach_payload(docs)
    out1 = {r["doc_id"]: r["payload"] for r in multimodal.resize_media(media, 32).collect()}
    out2 = {r["doc_id"]: r["payload"] for r in multimodal.resize_media(media, 32).collect()}
    assert out1 == out2  # deterministic fake codec
    assert all(len(p) == 32 for p in out1.values())


def test_sample_frames_fanout_and_coverage(spark):
    from posts_vectorizer_spark.operators import multimodal
    from posts_vectorizer_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(10)
    media = multimodal.attach_payload(docs)
    rows = multimodal.sample_frames(media, n_frames=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(rows) == 10 * 4  # exact 1 -> n_frames fan-out
    for doc, rs in by_doc.items():
        assert sorted(r["frame_id"] for r in rs) == [0, 1, 2, 3]
        assert all(len(r["frame"]) > 0 for r in rs)


def test_frame_sample_query_runs(spark):
    import __spark_entry__ as E
    from tests.conftest import SF_SMOKE

    df = E.queries()["multimodal_frame_sample"](spark, SF_SMOKE)
    rows = df.collect()
    assert rows and all(r["n_bytes"] == 16 for r in rows)


def test_wav_codec_roundtrip_and_chunk_walk():
    """The REAL WAV path (staged r9): stdlib-written files parse back
    bit-exact; the RIFF walker survives an injected unknown chunk AND an
    odd-sized chunk's pad byte; garbage and non-PCM16-mono formats are
    rejected loudly, never misread."""
    import io
    import struct
    import wave

    import numpy as np
    import pytest

    from posts_vectorizer_spark.operators import multimodal as M

    s = M.synth_samples(123, 257)
    raw = M.encode_wav(s, 11000)
    # cross-validate our writer against the stdlib READER too
    with wave.open(io.BytesIO(raw), "rb") as w:
        assert (w.getframerate(), w.getnchannels(), w.getsampwidth()) == (
            11000, 1, 2,
        )
        assert np.frombuffer(w.readframes(w.getnframes()), "<i2").tolist() \
            == s.tolist()
    rate, back = M.decode_wav(raw)
    assert rate == 11000 and (back == s).all()

    # unknown chunk with an ODD size (pad byte) injected before data
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOX" + b"\x00"
    patched = raw[:12] + extra + raw[12:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    r2, b2 = M.decode_wav(patched)
    assert r2 == 11000 and (b2 == s).all()

    with pytest.raises(ValueError):
        M.decode_wav(b"not a wav at all, definitely")
    # stereo file must be rejected, not silently de-interleaved wrong
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x01" * 8)
    with pytest.raises(ValueError):
        M.decode_wav(buf.getvalue())


def test_wav_ingest_features_hand_computed(spark, tmp_path):
    """multimodal_wav_ingest's feature math on the synthesis formula for
    one doc, recomputed by hand in Python over the DECODED samples —
    rate comes from the PARSED header, energy/crossings/peak are exact
    integers, rms is half-away-rounded."""
    import numpy as np

    from posts_vectorizer_spark.operators import multimodal as M
    from posts_vectorizer_spark.plans.registry import resolve_query

    d = tmp_path / "wav"
    d.mkdir()
    spark.createDataFrame(
        [(7, "x", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(d / "documents.parquet"))
    [row] = resolve_query("multimodal_wav_ingest")(spark, str(d)).collect()

    n, rate = 200 + 7 % 100, 8000 + 1000 * (7 % 3)
    s = M.synth_samples(7, n).astype(np.int64)
    assert row["sample_rate"] == rate and row["n_samples"] == n
    assert row["sum_sq"] == int((s * s).sum())
    assert row["peak_abs"] == int(np.abs(s).max())
    assert row["zero_crossings"] == int(((s[:-1] < 0) != (s[1:] < 0)).sum())
    assert row["rms"] == float(
        np.floor(np.sqrt(int((s * s).sum()) / n) * 1e6 + 0.5) / 1e6
    )


def test_bmp_codec_roundtrip_padding_and_rejects():
    """The REAL BMP path (staged r9): encode->decode is pixel-exact for
    every row-padding phase (widths 16..19 cover pads 0..3 in some
    order); the parser honors a nonstandard pixel-data offset read from
    the header; garbage, 8-bit, and top-down files are rejected."""
    import struct

    import numpy as np
    import pytest

    from posts_vectorizer_spark.operators import multimodal as M

    for w in (16, 17, 18, 19):
        img = M.synth_pixels(3, w, 5)
        assert (M.decode_bmp(M.encode_bmp(img)) == img).all(), w

    # nonstandard data offset: inject 8 junk bytes between headers and
    # pixels and fix up the offset field — a header-driven parser reads
    # it, a hardcoded offset-54 parser breaks
    img = M.synth_pixels(9, 6, 4)
    raw = bytearray(M.encode_bmp(img))
    off = struct.unpack("<I", raw[10:14])[0]
    raw2 = raw[:off] + b"JUNKJUNK" + raw[off:]
    raw2[10:14] = struct.pack("<I", off + 8)
    assert (M.decode_bmp(bytes(raw2)) == img).all()

    with pytest.raises(ValueError):
        M.decode_bmp(b"PNG-ish garbage here")
    bad_bpp = bytearray(M.encode_bmp(img))
    bad_bpp[28:30] = struct.pack("<H", 8)
    with pytest.raises(ValueError):
        M.decode_bmp(bytes(bad_bpp))
    topdown = bytearray(M.encode_bmp(img))
    topdown[22:26] = struct.pack("<i", -4)
    with pytest.raises(ValueError):
        M.decode_bmp(bytes(topdown))


def test_bmp_ingest_features_hand_computed(spark, tmp_path):
    """multimodal_bmp_ingest's features for one doc recomputed by hand
    over the synthesized pixels and the floor sampling grid."""
    import numpy as np

    from posts_vectorizer_spark.operators import multimodal as M
    from posts_vectorizer_spark.plans.registry import resolve_query

    d = tmp_path / "bmp"
    d.mkdir()
    spark.createDataFrame(
        [(11, "x", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(d / "documents.parquet"))
    [row] = resolve_query("multimodal_bmp_ingest")(spark, str(d)).collect()

    w, h = 16 + 11 % 9, 12 + 11 % 7
    img = M.synth_pixels(11, w, h).astype(np.int64)
    th = M.resize_nearest(img.astype(np.uint8), 8, 8).astype(np.int64)
    assert (row["width"], row["height"]) == (w, h)
    assert [row["sum_r"], row["sum_g"], row["sum_b"]] == list(
        img.sum(axis=(0, 1))
    )
    assert [row["rsum_r"], row["rsum_g"], row["rsum_b"]] == list(
        th.sum(axis=(0, 1))
    )


def test_avi_container_roundtrip_and_headers():
    """The REAL AVI path (staged r9): encode->decode reproduces every
    frame pixel-exact across padding phases; fps survives the
    rate/scale header pair; an unknown chunk inserted between hdrl and
    movi is skipped; truncated/garbage input and non-24bpp streams are
    rejected. Header fields are pinned to the published layout (avih 56
    bytes, strh 56, strf 40) so the writer can't drift from spec."""
    import struct

    import numpy as np
    import pytest

    from posts_vectorizer_spark.operators import multimodal as M

    for w in (16, 17, 18, 19):
        frames = [M.synth_frame(2, t, w, 6) for t in range(5)]
        raw = M.encode_avi(frames, 15)
        fps, back = M.decode_avi(raw)
        assert fps == 15 and len(back) == 5
        for a, b in zip(frames, back):
            assert (a == b).all(), w

    # spec-pinned header sizes and magics
    assert raw[0:4] == b"RIFF" and raw[8:12] == b"AVI "
    assert raw[12:16] == b"LIST" and raw[20:24] == b"hdrl"
    assert raw[24:28] == b"avih"
    assert struct.unpack("<I", raw[28:32])[0] == 56

    # inject an unknown top-level chunk before movi (after hdrl list)
    hdrl_size = struct.unpack("<I", raw[16:20])[0]
    cut = 20 + hdrl_size  # end of LIST hdrl
    junk = b"JUNK" + struct.pack("<I", 6) + b"abcdef"
    patched = raw[:cut] + junk + raw[cut:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    fps2, back2 = M.decode_avi(patched)
    assert fps2 == 15 and len(back2) == 5 and (back2[0] == frames[0]).all()

    with pytest.raises(ValueError):
        M.decode_avi(b"RIFFxxxxWAVE")  # RIFF but not AVI
    bad = bytearray(raw)
    # strf bpp lives inside LIST strl; flip it to 8 and expect rejection
    i = raw.index(b"strf")
    bad[i + 8 + 14 : i + 8 + 16] = struct.pack("<H", 8)
    with pytest.raises(ValueError):
        M.decode_avi(bytes(bad))

    # a foreign AVI whose FIRST strl is an audio stream: its strf must
    # not bind w/h (r8 advice) — splice an auds strl with a bogus
    # 16-byte strf ahead of the vids strl and expect identical decode
    def _chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (
            b"\0" if len(body) % 2 else b""
        )

    auds_strh = b"auds" + bytes(52)
    auds_strf = struct.pack("<IiiHH", 16, 999, 999, 1, 16)
    auds_strl = _chunk(
        b"strh", auds_strh
    ) + _chunk(b"strf", auds_strf)
    auds_list = b"LIST" + struct.pack(
        "<I", 4 + len(auds_strl)
    ) + b"strl" + auds_strl
    j = raw.index(b"LIST", 12, 40)  # start of LIST hdrl
    hsz = struct.unpack("<I", raw[j + 4 : j + 8])[0]
    spliced = (
        raw[: j + 12]  # through 'hdrl' + the avih comes next
        + raw[j + 12 : j + 12 + 64]  # avih chunk (8 + 56)
        + auds_list
        + raw[j + 12 + 64 : ]
    )
    spliced = (
        spliced[: j + 4]
        + struct.pack("<I", hsz + len(auds_list))
        + spliced[j + 8 :]
    )
    spliced = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8
    ) + spliced[8:]
    fps3, back3 = M.decode_avi(spliced)
    assert fps3 == 15 and len(back3) == 5 and (back3[0] == frames[0]).all()

    # an undersized frame chunk must be rejected loudly, not misread
    k = raw.index(b"00db")
    shrunk = bytearray(raw)
    shrunk[k + 4 : k + 8] = struct.pack(
        "<I", struct.unpack("<I", raw[k + 4 : k + 8])[0] - 4
    )
    with pytest.raises(ValueError, match="frame chunk size"):
        M.decode_avi(bytes(shrunk))


def test_avi_frame_sample_hand_computed(spark, tmp_path):
    """multimodal_avi_frame_sample for one clip-bearing doc: parsed fps,
    frame count, stride-2 sampled frame ids, and the per-frame channel
    sums recomputed by hand from the synthesis formula."""
    import numpy as np

    from posts_vectorizer_spark.operators import multimodal as M
    from posts_vectorizer_spark.plans.registry import resolve_query

    d = tmp_path / "avi"
    d.mkdir()
    spark.createDataFrame(
        [(20, "x", "en", "s", 0), (21, "no clip on this one", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(d / "documents.parquet"))
    rows = resolve_query("multimodal_avi_frame_sample")(
        spark, str(d)
    ).collect()
    assert {r["doc_id"] for r in rows} == {20}, "only doc_id % 10 == 0"

    nf, w, h, fps = 4 + 20 % 5, 16 + 20 % 9, 12 + 20 % 7, 10 + (20 % 4) * 5
    want_ts = list(range(0, nf, 2))
    by_t = {r["frame_t"]: r for r in rows}
    assert sorted(by_t) == want_ts
    for t, r in by_t.items():
        assert (r["fps"], r["n_frames"], r["n_sampled"]) == (
            fps, nf, len(want_ts),
        )
        s = M.synth_frame(20, t, w, h).astype(np.int64).sum(axis=(0, 1))
        assert [r["fsum_r"], r["fsum_g"], r["fsum_b"]] == list(s)


def test_png_codec_filters_crc_and_rejects():
    """The REAL PNG path (staged r9): roundtrip is pixel-exact for
    shapes that exercise every filter type incl. 1-wide/1-tall edge
    cases (x=0 has no left neighbor — the classic Paeth/Sub bug); a
    flipped payload byte is caught by the CRC check, not silently
    decoded; bad signature and unsupported color types are rejected."""
    import struct

    import numpy as np
    import pytest

    from posts_vectorizer_spark.operators import multimodal as M

    for w, h in ((16, 12), (17, 13), (1, 7), (6, 1), (2, 9)):
        img = M.synth_pixels(13, w, h)
        assert (M.decode_png(M.encode_png(img)) == img).all(), (w, h)

    raw = bytearray(M.encode_png(M.synth_pixels(13, 9, 9)))
    # flip one byte inside IDAT's payload
    i = bytes(raw).index(b"IDAT") + 10
    raw[i] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        M.decode_png(bytes(raw))

    with pytest.raises(ValueError):
        M.decode_png(b"BM not a png")
    # grayscale color type must be rejected, not misread as RGB
    good = bytearray(M.encode_png(M.synth_pixels(1, 4, 4)))
    j = bytes(good).index(b"IHDR") + 4 + 9  # color-type byte
    good[j] = 0
    # re-fix the IHDR CRC so ONLY the color type is the problem
    import zlib

    ihdr_start = bytes(good).index(b"IHDR")
    data = bytes(good[ihdr_start : ihdr_start + 17])
    good[ihdr_start + 17 : ihdr_start + 21] = struct.pack(
        ">I", zlib.crc32(data) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="unsupported"):
        M.decode_png(bytes(good))


def test_png_ingest_features_hand_computed(spark, tmp_path):
    """multimodal_png_ingest features for one doc, recomputed over the
    synthesized pixels — the DEFLATE+filter pipeline must be lossless."""
    import numpy as np

    from posts_vectorizer_spark.operators import multimodal as M
    from posts_vectorizer_spark.plans.registry import resolve_query

    d = tmp_path / "png"
    d.mkdir()
    spark.createDataFrame(
        [(14, "x", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(d / "documents.parquet"))
    [row] = resolve_query("multimodal_png_ingest")(spark, str(d)).collect()
    w, h = 16 + 14 % 9, 12 + 14 % 7
    img = M.synth_pixels(14, w, h).astype(np.int64)
    assert (row["width"], row["height"]) == (w, h)
    assert [row["sum_r"], row["sum_g"], row["sum_b"]] == list(
        img.sum(axis=(0, 1))
    )


def test_gif_lzw_roundtrip_and_structure():
    """The REAL GIF/LZW path (built r9, staged r10): encode->decode is
    index- and palette-exact across widths; a noisy image big enough to
    fill the 4096-entry LZW table exercises the mid-stream CLEAR reset;
    an extension block is skipped; a deferred-clear stream (table full,
    no reset) still decodes; malformed inputs are rejected loudly."""
    import struct

    import numpy as np
    import pytest

    from posts_vectorizer_spark.operators import multimodal as M

    pal = M.synth_palette()
    for d in range(8):
        idx = M.synth_indices(d, 20 + d % 11, 14 + d % 9)
        p2, i2 = M.decode_gif(M.encode_gif(idx, pal))
        assert (i2 == idx).all() and (p2 == pal).all(), d

    # table-full CLEAR reset path: noisy 300x200 needs >4096 codes
    rng = np.random.default_rng(11)
    big = rng.integers(0, 256, size=(200, 300), dtype=np.uint8)
    raw_big = M.encode_gif(big, pal)
    assert (M.decode_gif(raw_big)[1] == big).all()
    # the encoder genuinely resets: a CLEAR code costs table entries, so
    # the stream must contain >1 clear for this size (sanity on the path)
    n_px = big.size
    assert n_px > 4096 * 2

    # extension block (e.g. a GIF89a comment) between GCT and image is
    # skipped; header version byte is accepted for 89a
    idx = M.synth_indices(3, 21, 15)
    raw = M.encode_gif(idx, pal)
    gct_end = 13 + 768
    ext = b"\x21\xfe\x05hello\x00"  # comment extension, one sub-block
    patched = (
        b"GIF89a" + raw[6:gct_end] + ext + raw[gct_end:]
    )
    p2, i2 = M.decode_gif(patched)
    assert (i2 == idx).all()

    # deferred clear: strip trailing CLEARs? simpler — truncated stream
    with pytest.raises(ValueError):
        M.decode_gif(raw[: len(raw) // 2])
    with pytest.raises(ValueError):
        M.decode_gif(b"FIG87a" + raw[6:])
    # local color table flag on the image descriptor -> reject
    bad = bytearray(raw)
    img_at = raw.index(b"\x2c", gct_end)
    bad[img_at + 9] |= 0x80
    with pytest.raises(ValueError, match="local color table"):
        M.decode_gif(bytes(bad))
    # interlace flag -> reject
    bad = bytearray(raw)
    bad[img_at + 9] = 0x40
    with pytest.raises(ValueError, match="interlace"):
        M.decode_gif(bytes(bad))


def test_gif_ingest_hand_computed(spark, tmp_path):
    """multimodal_gif_ingest for two docs: width/height from the parsed
    screen descriptor and the palette-mapped channel sums + distinct
    color count must equal the hand-evaluated synthesis formulas."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    d = tmp_path / "gif"
    d.mkdir()
    spark.createDataFrame(
        [(3, "x", "en", "s", 1), (7, "y", "de", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).write.parquet(str(d / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in resolve_query("multimodal_gif_ingest")(
            spark, str(d)
        ).collect()
    }
    for doc in (3, 7):
        w, h = 20 + doc % 11, 14 + doc % 9
        idxs = [
            (3 * doc + 5 * x + 11 * y) % 256
            for y in range(h)
            for x in range(w)
        ]
        r = rows[doc]
        assert (r["width"], r["height"]) == (w, h)
        assert r["n_colors"] == len(set(idxs))
        assert r["sum_r"] == sum((7 * i + 3) % 256 for i in idxs)
        assert r["sum_g"] == sum((11 * i + 5) % 256 for i in idxs)
        assert r["sum_b"] == sum((13 * i + 7) % 256 for i in idxs)


def test_gif_anim_frame_sample_hand_computed(spark, tmp_path):
    """multimodal_gif_frame_sample (staged r10): frame count and delay
    from the parsed container, stride-2 sampled frame ids, and each
    sampled frame's palette-mapped channel sums recomputed by hand."""
    from posts_vectorizer_spark.operators import multimodal as M
    from posts_vectorizer_spark.plans.registry import resolve_query

    d = tmp_path / "gifa"
    d.mkdir()
    spark.createDataFrame(
        [(6, "x", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).write.parquet(str(d / "documents.parquet"))
    rows = sorted(
        resolve_query("multimodal_gif_frame_sample")(
            spark, str(d)
        ).collect(),
        key=lambda r: r["frame_t"],
    )
    nf, w, h = 4 + 6 % 5, 14 + 6 % 7, 10 + 6 % 5
    assert [r["frame_t"] for r in rows] == list(range(0, nf, 2))
    pal = M.synth_palette()
    for r in rows:
        assert r["n_frames"] == nf and r["delay_cs"] == 7
        idx = M.synth_indices(6 + 1000 * r["frame_t"], w, h)
        rgb = pal[idx].astype("int64").sum(axis=(0, 1))
        assert (r["fsum_r"], r["fsum_g"], r["fsum_b"]) == tuple(
            int(x) for x in rgb
        )


def test_codec_roundtrip_properties():
    """Hypothesis sweep: RANDOM images roundtrip bit-exact through both
    real compressed codecs (PNG/DEFLATE with the per-row filter
    rotation; GIF/LZW with variable-width codes) — beyond the formula
    images the queries use, any uint8 content must survive."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from posts_vectorizer_spark.operators import multimodal as M

    pal = M.synth_palette()

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 30),
        seed=st.integers(0, 2**31 - 1),
    )
    def png_case(w, h, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (M.decode_png(M.encode_png(img)) == img).all()

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 30),
        seed=st.integers(0, 2**31 - 1),
    )
    def gif_case(w, h, seed):
        rng = np.random.default_rng(seed)
        idx = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        p2, i2 = M.decode_gif(M.encode_gif(idx, pal))
        assert (i2 == idx).all() and (p2 == pal).all()

    png_case()
    gif_case()


def test_gif_lzw_deferred_clear_foreign_stream():
    """Foreign-encoder compatibility: some real GIF writers never emit a
    CLEAR when the LZW table fills — they freeze the dictionary and keep
    coding (the 'deferred clear' the spec allows). Our encoder resets
    instead, so build a frozen-table stream by hand and require the
    decoder (which stops adding entries at 4096 and keeps reading
    12-bit codes) to reproduce the pixels exactly."""
    import numpy as np

    from posts_vectorizer_spark.operators import multimodal as M

    rng = np.random.default_rng(5)
    data = bytes(rng.integers(0, 256, size=12000, dtype=np.uint8))
    mcs = 8
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = nbits = 0

    def put(code, width):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def w_for(v):
        return max(mcs + 1, min(12, v.bit_length()))

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    put(clear, mcs + 1)
    s = b""
    for ch in data:
        sc = s + bytes([ch])
        if sc in table:
            s = sc
            continue
        put(table[s], w_for(next_code - 1))
        if next_code < 4096:
            table[sc] = next_code
            next_code += 1
        # else: FROZEN — no reset, no new entries (the deferred path)
        s = bytes([ch])
    if s:
        put(table[s], w_for(next_code - 1))
    put(end, w_for(next_code))
    if nbits:
        out.append(acc & 0xFF)

    assert next_code == 4096  # the freeze genuinely engaged
    got = M._lzw_decode(bytes(out), mcs, len(data))
    assert got == data


def test_gif_truncation_always_valueerror():
    """r9 review finding: every truncation offset of a valid animated
    GIF must raise the loud ValueError — never IndexError, never a
    silent short read."""
    import numpy as np
    import pytest

    from posts_vectorizer_spark.operators import multimodal as M

    pal = M.synth_palette()
    frames = [M.synth_indices(4 + 1000 * t, 15, 11) for t in range(3)]
    raw = M.encode_gif_anim(frames, pal, delay_cs=7)
    for cut in range(1, len(raw)):
        try:
            p, d, fr = M.decode_gif_frames(raw[:cut])
            # a prefix may parse only if it ends exactly after a full
            # frame (missing trailer is tolerated by the walk loop)
            assert fr and all(f.shape == (11, 15) for f in fr)
        except ValueError:
            pass  # the only acceptable failure mode
    # and the untruncated container still decodes exactly
    p, d, fr = M.decode_gif_frames(raw)
    assert d == 7 and len(fr) == 3
    for a, b in zip(frames, fr):
        assert (a == b).all()


def test_qoi_codec_roundtrip_op_coverage_and_rejects():
    """The REAL QOI path (built r9, staged r10): encode->decode is the
    identity over the synthesis corpus, the corpus exercises every
    3-channel op kind (RUN/INDEX/DIFF/LUMA/RGB — RGBA impossible at
    channels=3), and malformed streams reject loudly."""
    import numpy as np
    import pytest

    from posts_vectorizer_spark.operators import multimodal as M

    totals = {"rgb": 0, "rgba": 0, "index": 0, "diff": 0, "luma": 0, "run": 0}
    for doc in range(24):
        w, h = 18 + doc % 7, 12 + doc % 6
        img = M.synth_pixels_qoi(doc, w, h)
        raw = M.encode_qoi(img)
        assert (M.decode_qoi(raw) == img).all()
        for k, v in M.qoi_op_histogram(raw).items():
            totals[k] += v
    for op in ("rgb", "index", "diff", "luma", "run"):
        assert totals[op] > 0, f"corpus never emitted {op}"
    assert totals["rgba"] == 0  # channels=3 can't change alpha

    raw = M.encode_qoi(M.synth_pixels_qoi(5, 20, 14))
    with pytest.raises(ValueError):
        M.decode_qoi(b"QOIF" + raw[4:])  # bad magic (case-sensitive)
    with pytest.raises(ValueError):
        M.decode_qoi(raw[:12] + bytes([4, 0]) + raw[14:])  # RGBA layout
    with pytest.raises(ValueError):
        M.decode_qoi(raw[:-1] + b"\x02")  # corrupted end marker
    # a run op pushed past w*h must reject, not silently truncate
    body = raw[14:-8] + bytes([0xC0 | 5])
    with pytest.raises(ValueError):
        M.decode_qoi(raw[:14] + body + M._QOI_END)
    # every truncation offset: ValueError is the only acceptable failure
    for cut in range(1, len(raw)):
        with pytest.raises(ValueError):
            M.decode_qoi(raw[:cut])


def test_qoi_foreign_stream_hand_built():
    """Decoder vs a BY-HAND byte stream (not our encoder's output): a
    2x3 image written op-by-op from the published spec, including an
    RGBA op (legal in a channels=3 stream's op vocabulary — it just
    carries alpha our profile ignores) and an INDEX hit on a slot the
    hand stream seeded earlier."""
    import numpy as np

    from posts_vectorizer_spark.operators import multimodal as M

    # pixels: p0=(10,20,30) RGB op; p1=p0+(1,1,1) DIFF; p2 run of 1 from
    # p1... spec run covers repeats: use RUN(2) for p2,p3; p4=(10,20,30)
    # INDEX hit (hash slot seeded by p0); p5 = LUMA dg=+4,dr_dg=0,db_dg=1
    p0 = (10, 20, 30)
    p1 = (11, 21, 31)
    p4 = p0
    p5 = ((p4[0] + 4) % 256, (p4[1] + 4) % 256, (p4[2] + 5) % 256)
    slot = (10 * 3 + 20 * 5 + 30 * 7 + 255 * 11) % 64
    stream = bytes(
        [
            0xFE, 10, 20, 30,                    # RGB p0
            0x40 | (3 << 4) | (3 << 2) | 3,      # DIFF +1,+1,+1 -> p1
            0xC0 | 1,                            # RUN 2 -> p2,p3
            slot,                                # INDEX -> p4 == p0
            0x80 | (4 + 32), ((0 + 8) << 4) | (1 + 8),  # LUMA -> p5
        ]
    )
    raw = (
        M._QOI_MAGIC
        + (3).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([3, 0])
        + stream + M._QOI_END
    )
    img = M.decode_qoi(raw)
    expect = np.array([[p0, p1, p1], [p1, p4, p5]], dtype=np.uint8)
    assert (img == expect).all()


def test_qoi_random_roundtrip_property():
    """Hypothesis sweep: RANDOM uint8 images roundtrip bit-exact through
    the QOI encoder/decoder — beyond the formula corpus."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from posts_vectorizer_spark.operators import multimodal as M

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 30),
        seed=st.integers(0, 2**31 - 1),
    )
    def qoi_case(w, h, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (M.decode_qoi(M.encode_qoi(img)) == img).all()

    qoi_case()


def test_qoi_ingest_features_hand_computed(spark, tmp_path):
    """multimodal_qoi_ingest for two docs: width/height from the parsed
    header and channel sums equal the hand-evaluated formulas."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    d = tmp_path / "qoi"
    d.mkdir()
    spark.createDataFrame(
        [(4, "x", "en", "s", 1), (9, "y", "de", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).write.parquet(str(d / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in resolve_query("multimodal_qoi_ingest")(
            spark, str(d)
        ).collect()
    }
    for doc in (4, 9):
        w, h = 18 + doc % 7, 12 + doc % 6
        sr = sg = sb = 0
        for y in range(h):
            for x in range(w):
                if y % 4 == 0:
                    xq = x - (x % 3)
                elif y % 4 == 1:
                    xq = x % 2
                elif y % 4 == 2:
                    xq = 5 * x
                else:
                    xq = x
                yb = y % 6
                sr += (doc + xq + 2 * yb) % 256
                sg += (2 * doc + xq + 3 * yb) % 256
                sb += (3 * doc + xq + yb) % 256
        r = rows[doc]
        assert (r["width"], r["height"]) == (w, h)
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == (sr, sg, sb)


def test_ulaw_codec_exhaustive_and_container():
    """G.711 mu-law (built r9, staged r10): the vectorized compress is
    checked against a per-sample reference over ALL 65536 int16 values;
    expansion is value-idempotent; the hand-written tag-7 RIFF
    container roundtrips and rejects loudly."""
    import numpy as np
    import pytest

    from posts_vectorizer_spark.operators import multimodal as M

    def ref_enc(s: int) -> int:
        sign = 0x80 if s < 0 else 0
        m = min(abs(s), 32635) + 132
        e = 0
        while m >= (256 << e) and e < 7:
            e += 1
        return (~(sign | (e << 4) | ((m >> (e + 3)) & 15))) & 0xFF

    allv = np.arange(-32768, 32768, dtype=np.int16)
    enc = M.ulaw_compress(allv)
    assert (enc == np.array([ref_enc(int(v)) for v in allv])).all()
    dec = M.ulaw_expand(enc)
    err = np.abs(allv.astype(np.int64) - dec.astype(np.int64))
    # error bound: half of 2^(e+3) rounding + the clip region's 644
    assert err.max() == 644
    nonclip = np.abs(allv.astype(np.int32)) <= 32635
    assert err[nonclip].max() < 1024  # < the widest segment step
    # companding is idempotent on DECODED values (not on wire bytes:
    # +0/-0 share a decoded value but differ in the sign bit)
    assert (M.ulaw_expand(M.ulaw_compress(dec)) == dec).all()

    s = M.synth_samples_ulaw(7, 301)  # odd payload -> pad byte path
    raw = M.encode_ulaw_wav(s, 8000)
    rate, d = M.decode_ulaw_wav(raw)
    assert rate == 8000 and (d == M.ulaw_expand(M.ulaw_compress(s))).all()
    with pytest.raises(ValueError):
        M.decode_ulaw_wav(b"RIFX" + raw[4:])
    with pytest.raises(ValueError):
        # a PCM16 (tag 1) container must not expand as mu-law
        M.decode_ulaw_wav(M.encode_wav(s, 8000))
    with pytest.raises(ValueError):
        M.decode_ulaw_wav(raw[:20])  # truncated before fmt/data


def test_ulaw_ingest_features_hand_computed(spark, tmp_path):
    """multimodal_ulaw_ingest for two docs equals the hand-evaluated
    compand/expand algebra."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    d = tmp_path / "ulaw"
    d.mkdir()
    spark.createDataFrame(
        [(4, "x", "en", "s", 1), (11, "y", "de", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).write.parquet(str(d / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in resolve_query("multimodal_ulaw_ingest")(
            spark, str(d)
        ).collect()
    }

    def compand(s: int) -> int:
        neg = s < 0
        m = min(abs(s), 32635) + 132
        e = 0
        while m >= (256 << e) and e < 7:
            e += 1
        dm = ((((m >> (e + 3)) & 15) << 3) + 132 << e) - 132
        return -dm if neg else dm

    for doc in (4, 11):
        n = 256 + doc % 100
        orig = [((doc * 37 + i * 23) % 65536) - 32768 for i in range(n)]
        dec = [compand(s) for s in orig]
        r = rows[doc]
        assert r["n_samples"] == n
        assert r["sum_pcm"] == sum(dec)
        assert r["sum_abs_pcm"] == sum(abs(v) for v in dec)
        assert r["max_quant_err"] == max(
            abs(a - b) for a, b in zip(orig, dec)
        )


def test_adpcm_codec_roundtrip_and_rejects():
    """IMA ADPCM (built r9, staged r10): the wire-format decoder must
    reproduce the encoder's tracked predictor sequence exactly; the
    tag-0x11 container rejects loudly on foreign tags, bad block
    headers, and truncation at EVERY offset."""
    import numpy as np
    import pytest

    from posts_vectorizer_spark.operators import multimodal as M

    s = M.synth_samples_adpcm(7, 97)  # odd nibble count -> pad path
    raw = M.encode_adpcm_wav(s, 8000)
    rate, dec, end_idx = M.decode_adpcm_wav(raw)
    assert rate == 8000 and dec.size == 97 and 0 <= end_idx <= 88
    # decoded sample 0 is the header-stored sample, bit-exact
    assert int(dec[0]) == int(s[0])
    # an independent pure-Python state walk must agree sample-for-sample
    pred, idx = int(s[0]), 0
    expect = [pred]
    for v in [int(x) for x in s[1:]]:
        _nib, pred, idx = M._ima_step(pred, idx, v)
        expect.append(pred)
    assert [int(x) for x in dec] == expect and end_idx == idx
    # quantization error is bounded once the step tracker locks on: the
    # 140/sample ramp sits inside step-table range within a few samples
    err = np.abs(s.astype(np.int64) - dec.astype(np.int64))
    assert err[20:].max() < 4096

    with pytest.raises(ValueError):
        M.decode_adpcm_wav(b"RIFX" + raw[4:])
    with pytest.raises(ValueError):
        M.decode_adpcm_wav(M.encode_wav(s, 8000))       # PCM16 tag 1
    with pytest.raises(ValueError):
        M.decode_adpcm_wav(M.encode_ulaw_wav(s, 8000))  # mu-law tag 7
    with pytest.raises(ValueError):
        M.encode_adpcm_wav(np.array([], dtype=np.int16), 8000)
    # bad block header: step index 89 and nonzero reserved byte
    di = raw.index(b"data") + 8
    for patch in (
        raw[:di + 2] + bytes([89]) + raw[di + 3 :],
        raw[:di + 3] + bytes([1]) + raw[di + 4 :],
    ):
        with pytest.raises(ValueError):
            M.decode_adpcm_wav(patch)
    # truncation at EVERY offset must raise, never mis-decode
    for cut in range(len(raw)):
        with pytest.raises(ValueError):
            M.decode_adpcm_wav(raw[:cut])


def test_adpcm_random_roundtrip_property():
    """Hypothesis: arbitrary int16 content (white noise — the codec's
    worst case) still decodes to the encoder's tracked predictor
    sequence; determinism of the wire bytes."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from posts_vectorizer_spark.operators import multimodal as M

    @given(
        st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=1, max_size=200,
        )
    )
    @settings(max_examples=40, deadline=None)
    def check(vals):
        s = np.asarray(vals, dtype=np.int16)
        raw = M.encode_adpcm_wav(s, 8000)
        assert raw == M.encode_adpcm_wav(s, 8000)
        _rate, dec, idx = M.decode_adpcm_wav(raw)
        pred, i = int(s[0]), 0
        expect = [pred]
        for v in [int(x) for x in s[1:]]:
            _n, pred, i = M._ima_step(pred, i, v)
            expect.append(pred)
        assert [int(x) for x in dec] == expect and idx == i

    check()


def test_adpcm_ingest_features_hand_computed(spark, tmp_path):
    """multimodal_adpcm_ingest for two docs equals the hand-walked
    encode/decode recursion."""
    from posts_vectorizer_spark.operators import multimodal as M
    from posts_vectorizer_spark.plans.registry import resolve_query

    d = tmp_path / "adpcm"
    d.mkdir()
    spark.createDataFrame(
        [(5, "x", "en", "s", 1), (18, "y", "de", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).write.parquet(str(d / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in resolve_query("multimodal_adpcm_ingest")(
            spark, str(d)
        ).collect()
    }
    for doc in (5, 18):
        n = 96 + doc % 32
        orig = [((doc * 29 + i * 140) % 65536) - 32768 for i in range(n)]
        pred, idx = orig[0], 0
        dec = [pred]
        for v in orig[1:]:
            _nib, pred, idx = M._ima_step(pred, idx, v)
            dec.append(pred)
        r = rows[doc]
        assert r["n_samples"] == n
        assert r["sum_pcm"] == sum(dec)
        assert r["sum_abs_pcm"] == sum(abs(v) for v in dec)
        assert r["max_quant_err"] == max(
            abs(a - b) for a, b in zip(orig, dec)
        )
        assert r["end_index"] == idx


def test_alaw_codec_exhaustive_and_container():
    """G.711 A-law (built r10, staged r11): the vectorized compress is
    checked against a per-sample scalar reference over ALL 65536 int16
    values; expansion is value-idempotent; the hand-written tag-6 RIFF
    container roundtrips and rejects loudly (incl. against its mu-law
    sibling — the two G.711 halves must not decode each other)."""
    import numpy as np
    import pytest

    from posts_vectorizer_spark.operators import multimodal as M

    SEG_END = (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)

    def ref_enc(v: int) -> int:
        p = v >> 3
        if p >= 0:
            mask, x = 0xD5, p
        else:
            mask, x = 0x55, -p - 1
        seg = 0
        while seg < 8 and x > SEG_END[seg]:
            seg += 1
        if seg >= 8:
            return 0x7F ^ mask
        aval = seg << 4
        aval |= (x >> 1) & 15 if seg < 2 else (x >> seg) & 15
        return aval ^ mask

    allv = np.arange(-32768, 32768, dtype=np.int16)
    enc = M.alaw_compress(allv)
    assert (enc == np.array([ref_enc(int(v)) for v in allv])).all()
    dec = M.alaw_expand(enc)
    err = np.abs(allv.astype(np.int64) - dec.astype(np.int64))
    # widest segment: step 2^(7-1+3+1)=1024 -> midpoint error <= 512,
    # plus the >>3 truncation; A-law does not clip asymmetrically like
    # mu-law's 644
    assert err.max() == 512
    # companding is idempotent on DECODED values
    assert (M.alaw_expand(M.alaw_compress(dec)) == dec).all()

    s = M.synth_samples_alaw(5, 257)  # odd payload -> pad byte path
    raw = M.encode_alaw_wav(s, 8000)
    rate, d = M.decode_alaw_wav(raw)
    assert rate == 8000 and (d == M.alaw_expand(M.alaw_compress(s))).all()
    with pytest.raises(ValueError):
        M.decode_alaw_wav(b"RIFX" + raw[4:])
    with pytest.raises(ValueError):
        # mu-law (tag 7) container must not expand as A-law
        M.decode_alaw_wav(M.encode_ulaw_wav(s, 8000))
    with pytest.raises(ValueError):
        # and vice versa: the A-law container must reject in the
        # mu-law decoder
        M.decode_ulaw_wav(raw)
    with pytest.raises(ValueError):
        M.decode_alaw_wav(raw[:20])  # truncated before fmt/data


def test_alaw_ingest_features_hand_computed(spark, tmp_path):
    """multimodal_alaw_ingest for two docs equals the hand-evaluated
    compand/expand algebra (scalar reference, independent of numpy)."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    SEG_END = (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)

    def compand(v: int) -> int:
        p = v >> 3
        neg = p < 0
        x = -p - 1 if neg else p
        seg = 0
        while seg < 8 and x > SEG_END[seg]:
            seg += 1
        if seg >= 8:
            segw, mant = 7, 15
        else:
            segw = seg
            mant = (x >> 1) & 15 if seg < 2 else (x >> seg) & 15
        t = mant << 4
        t = t + 8 if segw == 0 else (t + 0x108) << max(segw - 1, 0)
        return -t if neg else t

    d = tmp_path / "alaw"
    d.mkdir()
    spark.createDataFrame(
        [(3, "x", "en", "s", 1), (10, "y", "de", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).write.parquet(str(d / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in resolve_query("multimodal_alaw_ingest")(
            spark, str(d)
        ).collect()
    }
    for doc in (3, 10):
        n = 256 + doc % 96
        orig = [((doc * 41 + i * 19) % 65536) - 32768 for i in range(n)]
        dec = [compand(s) for s in orig]
        r = rows[doc]
        assert r["n_samples"] == n
        assert r["sum_pcm"] == sum(dec)
        assert r["sum_abs_pcm"] == sum(abs(v) for v in dec)
        assert r["max_quant_err"] == max(
            abs(a - b) for a, b in zip(orig, dec)
        )


def test_tga_codec_roundtrip_cap_origins_rejects():
    """TGA type-10 RLE (built r10, staged r11): lossless roundtrip
    across every packet regime incl. the 128-count cap (constant rows
    at width > 128 split into multiple repeat packets), bottom-up
    foreign streams decode flipped, and malformed streams reject
    loudly."""
    import numpy as np
    import pytest

    from posts_vectorizer_spark.operators import multimodal as M

    for doc, w, h in [(0, 140, 7), (3, 129, 6), (9, 20, 9), (5, 1, 1)]:
        img = M.synth_pixels_tga(doc, w, h)
        raw = M.encode_tga(img)
        assert (M.decode_tga(raw) == img).all()

    # the cap really is exercised: a constant 140-wide row cannot fit
    # one packet, so the stream must contain >= 2 repeat packets for it
    img = M.synth_pixels_tga(0, 140, 1)  # y=0 -> constant row
    raw = M.encode_tga(img)
    body = raw[18:]
    assert body[0] == 0x80 | 127 and body[4] == 0x80 | (140 - 128 - 1)

    # bottom-up origin: same pixels, flipped rows, descriptor bit 5 clear
    img = M.synth_pixels_tga(2, 10, 4)
    ba = bytearray(M.encode_tga(img[::-1]))
    ba[17] = 0x00
    assert (M.decode_tga(bytes(ba)) == img).all()

    with pytest.raises(ValueError):
        M.decode_tga(b"\x00" * 10)  # short header
    with pytest.raises(ValueError):
        bad = bytearray(M.encode_tga(img)); bad[2] = 2  # uncompressed type
        M.decode_tga(bytes(bad))
    with pytest.raises(ValueError):
        bad = bytearray(M.encode_tga(img)); bad[16] = 32  # 32-bit depth
        M.decode_tga(bytes(bad))
    with pytest.raises(ValueError):
        M.decode_tga(M.encode_tga(img)[:-4])  # truncated stream


def test_tga_ingest_features_hand_computed(spark, tmp_path):
    """multimodal_tga_ingest equals per-pixel formula sums computed
    independently in Python for two docs."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    d = tmp_path / "tga"
    d.mkdir()
    spark.createDataFrame(
        [(2, "x", "en", "s", 1), (13, "y", "de", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).write.parquet(str(d / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in resolve_query("multimodal_tga_ingest")(
            spark, str(d)
        ).collect()
    }
    for doc in (2, 13):
        w, h = 126 + doc % 8, 6 + doc % 5
        sr = sg = sb = 0
        for y in range(h):
            for x in range(w):
                xq = 0 if y % 3 == 0 else (x - x % 4 if y % 3 == 1 else x)
                sr += (doc + xq + 5 * y) % 256
                sg += (2 * doc + 3 * xq + y) % 256
                sb += (3 * doc + 2 * xq + 4 * y) % 256
        r = rows[doc]
        assert (r["width"], r["height"]) == (w, h)
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == (sr, sg, sb)


def test_zip_container_cross_tool_and_rejects():
    """multimodal_zip_manifest's codec: our archives open in stdlib
    zipfile and vice versa; corrupted CRC / size / method / signature
    reject loudly; the compressed payload for the repetitive entries is
    genuinely smaller (the non-oracle-statable claim, pinned here)."""
    import io
    import struct
    import zipfile

    import pytest

    from posts_vectorizer_spark.operators import multimodal as M

    for doc in (0, 1, 5, 11):
        spec = M.synth_zip_entries(doc)
        raw = M.encode_zip(spec)
        got = M.decode_zip(raw)
        assert [(n, d) for n, d, _ in spec] == got
        zf = zipfile.ZipFile(io.BytesIO(raw))
        assert [(i.filename, zf.read(i)) for i in zf.infolist()] == got

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("a.txt", b"hello world" * 30)
        z.writestr("b.bin", bytes(range(256)))
    got = M.decode_zip(buf.getvalue())
    assert got[0] == ("a.txt", b"hello world" * 30)
    assert got[1] == ("b.bin", bytes(range(256)))

    # deflate actually compresses a repetitive member
    rep = b"spark " * 500
    raw = M.encode_zip([("r.txt", rep, True)])
    assert len(raw) < len(rep)

    base = M.encode_zip(M.synth_zip_entries(3))
    with pytest.raises(ValueError):
        M.decode_zip(base[:-8])  # EOCD gone
    # flip a CRC byte in the central directory
    sig = struct.pack("<I", 0x02014B50)
    cpos = base.rfind(sig)
    bad = bytearray(base)
    bad[cpos + 16] ^= 0xFF
    with pytest.raises(ValueError):
        M.decode_zip(bytes(bad))
    # unknown method in central entry
    bad = bytearray(base)
    bad[cpos + 10] = 99
    with pytest.raises(ValueError):
        M.decode_zip(bytes(bad))


def test_zip_foreign_names_and_error_classes():
    """r10 ADVICE fix: foreign archives with non-ASCII member names
    decode per the EFS flag (UTF-8) / CP437 like stdlib zipfile, and
    every reject path raises ValueError — never a bare struct.error or
    zlib.error escaping the documented loud-reject contract."""
    import io
    import struct
    import zipfile

    import pytest

    from posts_vectorizer_spark.operators import multimodal as M

    # stdlib writes non-ASCII names with the EFS (utf-8) flag set
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("héllo_ünïcode.txt", b"data1")
        z.writestr("plain.txt", b"data2")
    got = M.decode_zip(buf.getvalue())
    assert got == [("héllo_ünïcode.txt", b"data1"), ("plain.txt", b"data2")]

    base = M.encode_zip(M.synth_zip_entries(3))
    # truncated local header: central entry points past the buffer
    sig = struct.pack("<I", 0x02014B50)
    cpos = base.rfind(sig)
    bad = bytearray(base)
    struct.pack_into("<I", bad, cpos + 42, len(base) - 4)  # loffset
    with pytest.raises(ValueError):
        M.decode_zip(bytes(bad))
    # corrupt deflate payload -> ValueError, not zlib.error
    raw = bytearray(M.encode_zip([("r.txt", b"spark " * 500, True)]))
    lend = 30 + len("r.txt")
    raw[lend] ^= 0xFF  # first deflate byte
    # re-sync central CRC check is downstream of inflate; inflate fails
    with pytest.raises(ValueError):
        M.decode_zip(bytes(raw))
    # a flags=0 archive with a high-byte (cp437) name decodes, not raises
    spec_raw = bytearray(M.encode_zip([("e0.txt", b"x" * 10, False)]))
    lname_at = 30  # first local header is 30 bytes, name follows
    cname_at = spec_raw.rfind(sig) + 46
    spec_raw[lname_at] = 0x82  # cp437 'é'
    spec_raw[cname_at] = 0x82
    (name, data), = M.decode_zip(bytes(spec_raw))
    assert name == "é0.txt" and data == b"x" * 10


def test_zip_manifest_hand_computed(spark, tmp_path):
    """multimodal_zip_manifest equals the synthesis formula evaluated
    independently for two docs."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    d = tmp_path / "zip"
    d.mkdir()
    spark.createDataFrame(
        [(4, "x", "en", "s", 1), (7, "y", "de", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).write.parquet(str(d / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in resolve_query("multimodal_zip_manifest")(
            spark, str(d)
        ).collect()
    }
    for doc in (4, 7):
        n = 2 + doc % 3
        tot = sb = nd = 0
        for j in range(n):
            ln = 40 + (doc * 7 + j * 13) % 60
            tot += ln
            nd += (doc + j) % 2
            sb += sum(32 + (doc * 3 + j * 5 + i * 7) % 95 for i in range(ln))
        r = rows[doc]
        assert (r["n_entries"], r["n_deflated"]) == (n, nd)
        assert (r["total_uncompressed"], r["sum_bytes"]) == (tot, sb)


def test_tiff_packbits_roundtrip_noop_rejects(spark, tmp_path):
    """multimodal_tiff_packbits_ingest's codec: multi-strip roundtrip,
    the -128 noop rule, signed-count packets, and loud rejects; query
    output equals the formula for two docs."""
    import numpy as np
    import pytest

    from posts_vectorizer_spark.operators import multimodal as M
    from posts_vectorizer_spark.plans.registry import resolve_query

    img = M.synth_pixels_tiff(3, 131, 7)  # 2 strips, >128 runs
    raw = M.encode_tiff_packbits(img)
    assert (M.decode_tiff_packbits(raw) == img).all()
    # r10 ADVICE fix: TIFF word alignment — the IFD and the out-of-line
    # LONG arrays must sit on even offsets whatever the strip payload
    # lengths (strict readers like libtiff reject odd-aligned dirs).
    import struct as _s
    for seed, w_, h_ in ((3, 131, 7), (4, 129, 9), (5, 127, 11)):
        r2 = M.encode_tiff_packbits(M.synth_pixels_tiff(seed, w_, h_))
        (ifd,) = _s.unpack_from("<I", r2, 4)
        assert ifd % 2 == 0
        (ntag,) = _s.unpack_from("<H", r2, ifd)
        for t in range(ntag):
            tag, typ, cnt, val = _s.unpack_from("<HHII", r2, ifd + 2 + 12 * t)
            if typ == 4 and cnt > 1:  # out-of-line LONG array
                assert val % 2 == 0
        assert (
            M.decode_tiff_packbits(r2)
            == M.synth_pixels_tiff(seed, w_, h_)
        ).all()
    # every strip leads with the noop our encoder plants
    assert M.packbits_decode(b"\x80\xfeA", 3) == b"AAA"
    with pytest.raises(ValueError):
        M.decode_tiff_packbits(b"MM\x00*" + raw[4:])  # big-endian reject
    with pytest.raises(ValueError):
        M.packbits_decode(b"\x05ab", 6)  # truncated literal
    with pytest.raises(ValueError):
        M.packbits_decode(b"\xfe", 3)  # truncated repeat
    with pytest.raises(ValueError):
        M.packbits_decode(b"\x00A", 5)  # short strip

    d = tmp_path / "tif"
    d.mkdir()
    spark.createDataFrame(
        [(1, "x", "en", "s", 1), (8, "y", "de", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).write.parquet(str(d / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in resolve_query("multimodal_tiff_packbits_ingest")(
            spark, str(d)
        ).collect()
    }
    for doc in (1, 8):
        w, h = 122 + doc % 12, 5 + doc % 7
        s = 0
        for y in range(h):
            for x in range(w):
                xq = 0 if y % 3 == 0 else (x - x % 4 if y % 3 == 1 else x)
                s += (doc + xq + 5 * y) % 256
        r = rows[doc]
        assert (r["width"], r["height"]) == (w, h)
        assert r["n_strips"] == -(-h // 4)
        assert r["sum_px"] == s


def test_tar_container_cross_tool_and_rejects():
    """multimodal_tar_manifest's codec: our archives open in stdlib
    tarfile and vice versa (incl. stdlib's PAX-format output, whose
    'x' extended headers our walk must skip); corrupted checksum /
    magic / truncation reject loudly with ValueError."""
    import io
    import tarfile

    import pytest

    from posts_vectorizer_spark.operators import multimodal as M

    for doc in (0, 1, 5, 7):
        spec = M.synth_tar_entries(doc)
        raw = M.encode_tar(spec)
        assert M.decode_tar(raw) == spec
        with tarfile.open(fileobj=io.BytesIO(raw)) as tf:
            got = [
                (m.name, tf.extractfile(m).read())
                for m in tf.getmembers()
                if m.isfile()
            ]
        assert got == spec

    # stdlib-written archives (both classic GNU and PAX formats)
    for fmt in (tarfile.GNU_FORMAT, tarfile.PAX_FORMAT):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=fmt) as tf:
            for nm, data in (("a.txt", b"hello" * 20), ("b.bin", bytes(range(100)))):
                info = tarfile.TarInfo(nm)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
        got = M.decode_tar(buf.getvalue())
        assert got == [("a.txt", b"hello" * 20), ("b.bin", bytes(range(100)))]

    base = M.encode_tar(M.synth_tar_entries(3))
    with pytest.raises(ValueError):
        M.decode_tar(base[: len(base) - 512])  # half a terminator
    bad = bytearray(base)
    bad[148] ^= 0x01  # corrupt the checksum field
    with pytest.raises(ValueError):
        M.decode_tar(bytes(bad))
    bad = bytearray(base)
    bad[257] = ord("X")  # break the magic
    with pytest.raises(ValueError):
        M.decode_tar(bytes(bad))
    bad = bytearray(base)
    bad[522] ^= 0xFF  # flip byte 10 of member 0's data (not padding):
    # the header walk still succeeds, but content differs from spec —
    # member data is not checksummed in tar (that's the format, not
    # a codec gap; the ZIP/GZIP codecs carry the CRC story)
    got = M.decode_tar(bytes(bad))
    assert got != M.synth_tar_entries(3)


def test_gzip_member_cross_tool_and_rejects():
    """multimodal_gzip_ingest's codec: stdlib gzip reads ours, we read
    stdlib's (incl. FNAME walks); every trailer/magic/flag corruption
    rejects with ValueError; deflate genuinely compresses the
    repetitive synthetic payload."""
    import gzip as _gz
    import struct

    import pytest

    from posts_vectorizer_spark.operators import multimodal as M

    for doc in (0, 2, 9):
        payload = M.synth_gzip_payload(doc)
        raw = M.encode_gzip(payload, f"doc{doc}.txt")
        assert _gz.decompress(raw) == payload
        name, data = M.decode_gzip(raw)
        assert (name, data) == (f"doc{doc}.txt", payload)

    # stdlib-written member (no FNAME; mtime nonzero)
    body = b"abc" * 500
    name, data = M.decode_gzip(_gz.compress(body, compresslevel=6))
    assert name is None and data == body

    # compression is real on the repetitive payload
    p = M.synth_gzip_payload(4)
    assert len(M.encode_gzip(p)) < len(p)

    base = M.encode_gzip(M.synth_gzip_payload(1), "x.txt")
    with pytest.raises(ValueError):
        M.decode_gzip(b"\x1f\x8c" + base[2:])  # bad magic
    with pytest.raises(ValueError):
        M.decode_gzip(base[:-1])  # truncated trailer
    bad = bytearray(base)
    bad[-8] ^= 0xFF  # CRC32 byte
    with pytest.raises(ValueError):
        M.decode_gzip(bytes(bad))
    bad = bytearray(base)
    struct.pack_into("<I", bad, len(bad) - 4, 1)  # wrong ISIZE
    with pytest.raises(ValueError):
        M.decode_gzip(bytes(bad))
    bad = bytearray(base)
    bad[3] |= 0xE0  # reserved FLG bits
    with pytest.raises(ValueError):
        M.decode_gzip(bytes(bad))
    # tamper: garbage BETWEEN deflate end-of-stream and the trailer —
    # CRC32/ISIZE still verify against the clean payload, so only the
    # unused_data check can catch it (r11 ADVICE: the unconsumed_tail
    # check was dead code and this decoded silently)
    tampered = base[:-8] + b"\xde\xad\xbe\xef" + base[-8:]
    with pytest.raises(ValueError, match="trailing garbage"):
        M.decode_gzip(tampered)


def test_tar_manifest_hand_computed(spark, tmp_path):
    """multimodal_tar_manifest equals the synthesis formula evaluated
    independently, including the on-wire block count."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    d = tmp_path / "tar"
    d.mkdir()
    spark.createDataFrame(
        [(3, "x", "en", "s", 1), (6, "y", "de", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).write.parquet(str(d / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in resolve_query("multimodal_tar_manifest")(
            spark, str(d)
        ).collect()
    }
    for doc in (3, 6):
        n = 2 + doc % 4
        tot = sb = blocks = 0
        for j in range(n):
            ln = 30 + (doc * 11 + j * 17) % 70
            tot += ln
            blocks += 1 + (ln + 511) // 512
            sb += sum(32 + (doc * 5 + j * 3 + i * 11) % 95 for i in range(ln))
        r = rows[doc]
        assert (r["n_members"], r["total_size"]) == (n, tot)
        assert (r["archive_blocks"], r["sum_bytes"]) == (blocks + 2, sb)


def test_gzip_ingest_hand_computed(spark, tmp_path):
    """multimodal_gzip_ingest equals the synthesis formula evaluated
    independently for two docs."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    d = tmp_path / "gz"
    d.mkdir()
    spark.createDataFrame(
        [(2, "x", "en", "s", 1), (15, "y", "de", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).write.parquet(str(d / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in resolve_query("multimodal_gzip_ingest")(
            spark, str(d)
        ).collect()
    }
    for doc in (2, 15):
        ln = 120 + (doc * 13) % 200
        sb = sum(32 + (doc * 7 + i * 3) % 95 for i in range(ln))
        r = rows[doc]
        assert r["name_len"] == len(f"doc{doc}.txt")
        assert (r["isize"], r["sum_bytes"]) == (ln, sb)


def test_ico_container_rejects_and_hand_computed(spark, tmp_path):
    """multimodal_ico_ingest's codec: multi-image roundtrip, the
    doubled-biHeight and AND-mask byte accounting, loud rejects on
    directory/DIB inconsistencies; query output equals the synthesis
    formula for two docs."""
    import struct

    import numpy as np
    import pytest

    from posts_vectorizer_spark.operators import multimodal as M
    from posts_vectorizer_spark.plans.registry import resolve_query

    imgs = M.synth_ico_images(5)  # 3 icons
    raw = M.encode_ico(imgs)
    got = M.decode_ico(raw)
    assert len(got) == 3
    for a, b in zip(got, imgs):
        assert (a == b).all()
    # structural: doubled biHeight inside the first DIB
    (img_off,) = struct.unpack_from("<I", raw, 6 + 12)
    _, w, h2 = struct.unpack_from("<Iii", raw, img_off)
    assert h2 == 2 * imgs[0].shape[0]

    with pytest.raises(ValueError):
        M.decode_ico(b"\x01" + raw[1:])  # reserved != 0
    bad = bytearray(raw)
    struct.pack_into("<I", bad, 6 + 12, len(raw))  # offset past EOF
    with pytest.raises(ValueError):
        M.decode_ico(bytes(bad))
    bad = bytearray(raw)
    bad[6] ^= 0xFF  # directory width != DIB width
    with pytest.raises(ValueError):
        M.decode_ico(bytes(bad))
    bad = bytearray(raw)
    struct.pack_into("<i", bad, img_off + 8, h2 + 1)  # odd biHeight
    with pytest.raises(ValueError):
        M.decode_ico(bytes(bad))
    # entry records a DIB smaller than a BITMAPINFOHEADER: must be the
    # contract ValueError, not struct.error (r11 ADVICE — size < 20
    # previously hit struct.unpack on a short slice)
    bad = bytearray(raw)
    struct.pack_into("<I", bad, 6 + 8, 12)  # entry 0 size := 12 < 40
    with pytest.raises(ValueError, match="DIB too small"):
        M.decode_ico(bytes(bad))
    with pytest.raises(ValueError):
        M.encode_ico([np.zeros((300, 4, 3), dtype=np.uint8)])  # >255

    d = tmp_path / "ico"
    d.mkdir()
    spark.createDataFrame(
        [(2, "x", "en", "s", 1), (7, "y", "de", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).write.parquet(str(d / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in resolve_query("multimodal_ico_ingest")(
            spark, str(d)
        ).collect()
    }
    for doc in (2, 7):
        spec = M.synth_ico_images(doc)
        r = rows[doc]
        assert r["n_icons"] == len(spec)
        assert r["sum_w"] == sum(i.shape[1] for i in spec)
        assert r["sum_h"] == sum(i.shape[0] for i in spec)
        assert r["sum_px"] == sum(int(i.sum()) for i in spec)


def test_midi_on_wire_bytes_and_rejects():
    """multimodal_midi_manifest's codec: hand-computed on-wire bytes
    (chunk framing, a 2-byte VLQ, running status engaged), round-trip
    over the synthesis range, and the loud-reject contract."""
    import struct

    import pytest

    from posts_vectorizer_spark.operators import multimodal as M

    # hand-built: one track, delta 200 (2-byte VLQ 0x81 0x48), note-on
    # C4, then delta 0 note-off via RUNNING STATUS (0x90 vel 0)
    trk = [
        (200, bytes([0x90, 60, 64])),
        (0, bytes([0x90, 60, 0])),
        (0, bytes([0xFF, 0x2F, 0x00])),
    ]
    raw = M.encode_midi([trk])
    body = bytes(
        [0x81, 0x48, 0x90, 60, 64,   # VLQ 200 + explicit status
         0x00, 60, 0,                # running status: no 0x90 byte
         0x00, 0xFF, 0x2F, 0x00]
    )
    assert raw == struct.pack(">4sIHHH", b"MThd", 6, 1, 1, 480) \
        + struct.pack(">4sI", b"MTrk", len(body)) + body
    got = M.decode_midi(raw)
    assert got == [{"n_events": 3, "total_ticks": 200, "sum_pitch": 120}]

    # VLQ boundaries round-trip
    for v in (0, 127, 128, 16383, 16384, 0x0FFFFFFF):
        val, pos = M._read_vlq(M._vlq(v), 0)
        assert (val, pos) == (v, len(M._vlq(v)))
    with pytest.raises(ValueError):
        M._vlq(0x10000000)
    with pytest.raises(ValueError, match="overlong"):
        M._read_vlq(b"\x80\x80\x80\x80\x00", 0)

    # synthesis round-trip across the residue classes
    for d in range(10):
        got = M.decode_midi(M.encode_midi(M.synth_midi_tracks(d)))
        n = 3 + d % 5
        assert got[1]["n_events"] == 2 * n + 1

    # rejects: bad magic, truncation, track-length mismatch, data>=0x80,
    # running status without prior status, missing EOT
    with pytest.raises(ValueError, match="magic"):
        M.decode_midi(b"XThd" + raw[4:])
    with pytest.raises(ValueError):
        M.decode_midi(raw[:-1])
    bad = bytearray(raw)
    bad[18] += 1  # MTrk recorded length off by one
    with pytest.raises(ValueError):
        M.decode_midi(bytes(bad))
    bad = bytearray(raw)
    bad[25] = 0x80  # velocity with the high bit set
    with pytest.raises(ValueError, match="data byte"):
        M.decode_midi(bytes(bad))
    orphan = struct.pack(">4sIHHH", b"MThd", 6, 1, 1, 480) \
        + struct.pack(">4sI", b"MTrk", 4) + bytes([0x00, 60, 64, 0x00])
    with pytest.raises(ValueError, match="running status"):
        M.decode_midi(orphan)
    noend = struct.pack(">4sIHHH", b"MThd", 6, 1, 1, 480) \
        + struct.pack(">4sI", b"MTrk", 4) + bytes([0x00, 0x90, 60, 64])
    with pytest.raises(ValueError, match="end-of-track"):
        M.decode_midi(noend)


def test_utf8_scan_classes_and_python_parity():
    """multimodal_utf8_audit's DFA: accept-side parity with Python's
    strict decoder (valid text decodes with matching codepoint count
    and zero errors; every lone non-ASCII byte errors), the synthesis
    formula across all residue classes, and one instance of each
    planted malformation classified exactly once."""
    from posts_vectorizer_spark.operators import multimodal as M

    valid = "Hello, wörld — \U0001f600€ žluťoučký".encode()
    s = M.utf8_scan(valid)
    errs = ("overlong", "surrogate", "range", "continuation",
            "stray", "truncated")
    assert all(s[e] == 0 for e in errs)
    assert s["cp1"] + s["cp2"] + s["cp3"] + s["cp4"] == len(valid.decode())

    for b in range(0x80, 0x100):
        s = M.utf8_scan(bytes([b]))
        assert sum(s[e] for e in errs) == 1, b

    cases = {
        b"\xc0\xaf": "overlong",          # 2-byte overlong '/'
        b"\xe0\x80\x80": "overlong",      # 3-byte overlong
        b"\xf0\x80\x80\x80": "overlong",  # 4-byte overlong
        b"\xed\xa0\x80": "surrogate",     # U+D800 half
        b"\xf4\x90\x80\x80": "range",     # > U+10FFFF
        b"\xf5\x80\x80\x80": "range",     # invalid lead
        b"\xc3A": "continuation",         # lead then ASCII
        b"\xe2\x82": "truncated",         # clean short tail at EOF
        b"\x80": "stray",                 # lone continuation
    }
    for raw, cls in cases.items():
        s = M.utf8_scan(raw)
        assert s[cls] >= 1 and sum(s[e] for e in errs) == s[cls], (raw, s)
        try:
            raw.decode()
            assert False, f"python accepted {raw!r}"
        except UnicodeDecodeError:
            pass

    for d in range(60):
        s = M.utf8_scan(M.synth_utf8_payload(d))
        a, bc = 5 + d % 7, (1 if d % 4 == 0 else 0)
        assert s["cp1"] == a + bc
        assert s["cp2"] == 2 + d % 3
        assert s["overlong"] == d % 2
        assert s["surrogate"] == (1 if d % 3 == 0 else 0)
        assert s["range"] == (1 if d % 5 == 0 else 0)
        assert s["continuation"] == bc
        assert s["truncated"] == (1 if d % 7 == 0 else 0)


def test_protowire_on_wire_bytes_and_rejects():
    """multimodal_protowire_manifest's codec: hand-computed wire bytes
    (key packing, 2-byte ULEB128, zigzag sign mapping, fixed-width and
    length-delimited framing), varint boundary round-trips, and the
    loud-reject contract."""
    import struct

    import pytest

    from posts_vectorizer_spark.operators import multimodal as M

    # field 1 varint -3 (zigzag 5), field 2 varint 300 (zigzag 600 =
    # 0xD8 0x04), field 9 fixed32 7, field 11 bytes 'hi'
    raw = M.encode_protowire(
        [(1, 0, -3), (2, 0, 300), (9, 5, 7), (11, 2, b"hi")]
    )
    assert raw == bytes(
        [0x08, 0x05,                   # key(1,0), zigzag(-3)=5
         0x10, 0xD8, 0x04]             # key(2,0), zigzag(300)=600
    ) + bytes([0x4D]) + struct.pack("<I", 7) \
        + bytes([0x5A, 0x02]) + b"hi"
    prof = M.decode_protowire(raw)
    assert prof == {
        "n_fields": 4, "max_field": 11, "sum_varints": 297,
        "len_bytes": 2, "sum_fixed": 7,
    }

    # ULEB128 boundaries round-trip (incl. the 64-bit ceiling)
    for v in (0, 127, 128, 16383, 16384, 2**32, 2**64 - 1):
        got, pos = M._read_uvarint(M._uvarint(v), 0)
        assert (got, pos) == (v, len(M._uvarint(v)))
    with pytest.raises(ValueError):
        M._uvarint(2**64)
    with pytest.raises(ValueError, match="overlong"):
        M._read_uvarint(b"\x80" * 10 + b"\x01", 0)
    with pytest.raises(ValueError, match="64 bits"):
        M._read_uvarint(b"\xff" * 9 + b"\x7f", 0)
    # zigzag is a bijection on the signed 64-bit range
    for v in (0, -1, 1, -2**62, 2**62, -(2**63), 2**63 - 1):
        assert M._unzigzag(M._zigzag(v)) == v

    with pytest.raises(ValueError):
        M.decode_protowire(raw[:-1])      # truncated blob
    with pytest.raises(ValueError, match="wire type"):
        M.decode_protowire(raw + b"\x0f")  # wire type 7
    with pytest.raises(ValueError, match="field number 0"):
        M.decode_protowire(b"\x00\x00")
    with pytest.raises(ValueError, match="truncated fixed64"):
        M.decode_protowire(bytes([0x09]) + b"\x01\x02")


def test_parquet_footer_walker_vs_pyarrow_and_rejects(tmp_path):
    """decode_parquet_footer: the compact-Thrift walk agrees with
    pyarrow's own metadata on files pyarrow writes here (multiple row
    groups, nested lists, many columns — writer-independent generic
    skipping), and loud-rejects malformed framing."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from posts_vectorizer_spark.operators import multimodal as M

    t = pa.table(
        {
            "a": list(range(1000)),
            "b": [str(i) for i in range(1000)],
            "c": [[float(i), float(i + 1)] for i in range(1000)],
            "d": [i % 2 == 0 for i in range(1000)],
        }
    )
    p = tmp_path / "t.parquet"
    pq.write_table(t, p, row_group_size=300)  # 4 row groups
    raw = p.read_bytes()
    prof = M.decode_parquet_footer(raw)
    md = pq.ParquetFile(p).metadata
    assert prof["num_rows"] == md.num_rows == 1000
    assert prof["n_row_groups"] == md.num_row_groups == 4
    assert prof["n_leaf_columns"] == md.num_columns == 4

    with pytest.raises(ValueError, match="magic"):
        M.decode_parquet_footer(b"XXXX" + raw[4:])
    with pytest.raises(ValueError, match="magic"):
        M.decode_parquet_footer(raw[:-1])
    bad = bytearray(raw)
    import struct
    struct.pack_into("<I", bad, len(bad) - 8, len(bad))  # footer > file
    with pytest.raises(ValueError, match="footer length"):
        M.decode_parquet_footer(bytes(bad))


def test_bencode_canonical_grammar_and_rejects():
    """Bencode codec (staged r13): canonical wire form pinned to
    hand-written bytes (dict keys sorted on encode), the full
    loud-reject battery (integer grammar, length-prefix grammar,
    key ordering, truncation, trailing garbage), and the synth
    profile replica."""
    import pytest

    from posts_vectorizer_spark.operators.multimodal import (
        decode_bencode,
        encode_bencode,
        synth_bencode_obj,
    )

    # canonical form by construction: keys emitted sorted
    assert encode_bencode({b"b": 2, b"a": 1}) == b"d1:ai1e1:bi2ee"
    assert encode_bencode([b"ab", -3, []]) == b"l2:abi-3elee"
    assert encode_bencode(0) == b"i0e"
    assert encode_bencode(b"") == b"0:"

    # decode profile of a hand-built metainfo
    p = decode_bencode(b"d4:infod3:leni5e4:name2:hhe2:xxi-7ee")
    assert p["n_ints"] == 2 and p["sum_ints"] == -2
    assert p["n_strs"] == 1 and p["str_bytes"] == 2   # value "hh" only
    assert p["n_keys"] == 4 and p["max_depth"] == 3

    for bad in (
        b"i03e", b"i-0e", b"ie", b"i12",          # integer grammar
        b"5:abc", b"01:a",                        # length-prefix grammar
        b"d3:bbbi1e3:aaai2ee",                    # unsorted keys
        b"d3:aaai1e3:aaai2ee",                    # duplicate key
        b"di1ei2ee",                              # non-string key
        b"x", b"i1ei2e", b"l", b"d3:aaai1e",      # type/trailing/trunc
    ):
        with pytest.raises(ValueError):
            decode_bencode(bad)

    # encode->decode identity on the synth metainfo, profile replica
    for d in (0, 1, 5, 12, 99):
        prof = decode_bencode(encode_bencode(synth_bencode_obj(d)))
        m = 1 + d % 3
        want_sum = sum(
            (1 if j % 2 == 0 else -1) * (100 + (d * 19 + j * 7) % 5000)
            for j in range(m)
        ) + (d * 331) % 100000 + 16384
        assert prof["n_ints"] == m + 2
        assert prof["sum_ints"] == want_sum
        assert prof["n_strs"] == 3
        assert prof["str_bytes"] == (
            (10 + d % 7) + (5 + d % 11) + 20 * (1 + d % 3)
        )
        assert prof["n_keys"] == 6 + m and prof["max_depth"] == 3


def test_avro_ocf_container_walk_and_rejects():
    """Avro OCF codec (staged r13): magic/metadata/codec/sync/framing
    verification with a loud-reject battery, hand-decoded wire bytes
    for one tiny file, and the synth profile replica."""
    import pytest

    from posts_vectorizer_spark.operators.multimodal import (
        _AVRO_SCHEMA,
        decode_avro_ocf,
        encode_avro_ocf,
    )

    # hand-check the d=0 layout: 1 block, 1 record
    # record: id=0 -> zigzag 0x00; n=0 -> 0x00; name 'n' -> len 1 + b'n'
    raw = encode_avro_ocf(0)
    assert raw[:4] == b"Obj\x01"
    sync = bytes((0 * 31 + i * 7) % 256 for i in range(16))
    body = b"\x00\x00\x02n"
    tail = b"\x02" + bytes([len(body) * 2]) + body + sync
    assert raw.endswith(sync + tail)  # header sync, then the block
    p = decode_avro_ocf(raw)
    assert p == {
        "n_blocks": 1, "n_records": 1, "sum_ids": 0, "sum_ints": 0,
        "name_bytes": 1, "schema_len": len(_AVRO_SCHEMA),
    }

    for d in (1, 2, 3, 7, 42, 999):
        q = decode_avro_ocf(encode_avro_ocf(d))
        nb = 1 + d % 3
        assert q["n_blocks"] == nb
        assert q["n_records"] == sum(1 + (d + j) % 4 for j in range(nb))
        assert q["sum_ints"] == sum(
            (d + j + k) if k % 2 == 0 else -(d + j + k)
            for j in range(nb) for k in range(1 + (d + j) % 4)
        )

    raw7 = encode_avro_ocf(7)
    with pytest.raises(ValueError):
        decode_avro_ocf(b"Obj\x02" + raw7[4:])       # bad magic
    with pytest.raises(ValueError):
        decode_avro_ocf(raw7[:-1])                    # truncated sync
    mut = bytearray(raw7)
    mut[-1] ^= 0xFF
    with pytest.raises(ValueError):
        decode_avro_ocf(bytes(mut))                   # sync mismatch
    with pytest.raises(ValueError):                   # unsupported codec
        decode_avro_ocf(raw7.replace(b"\x08null", b"\x0edeflate"))
    # corrupt a block's declared byte size: framing must loud-reject
    sync7 = bytes((7 * 31 + i * 7) % 256 for i in range(16))
    head_end = raw7.index(sync7) + 16
    mut = bytearray(raw7)
    mut[head_end + 1] += 2                            # size varint bump
    with pytest.raises(ValueError):
        decode_avro_ocf(bytes(mut))
