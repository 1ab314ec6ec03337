"""Real image-container decode (PGM/PPM/BMP) — pure codec units plus
the Spark mapInPandas path.

The reference has no multimodal surface; this is the engine's
LLM-pipeline extension (SURVEY.md §2.7). The codecs are real byte
parsers: the cross-container test proves the SAME pixels survive a
round trip through all three layouts (incl. BMP's padded bottom-up
rows), and the malformed-input tests prove failures are loud.
"""

import numpy as np
import pytest

from lasdb_spark.operators.multimodal import (
    _encode_bmp,
    _encode_pnm,
    _parse_bmp,
    _parse_pnm,
    _test_pattern,
)


def test_pnm_header_with_comments():
    buf = b"P5\n# made by hand\n4 2\n# another\n255\n" + bytes(range(8))
    w, h, g = _parse_pnm(buf)
    assert (w, h) == (4, 2)
    assert list(g) == list(range(8))


def test_bmp_known_fixture():
    # 3x2 image, gray values 0..5; BMP stride for w=3 is 12 bytes
    gray = np.arange(6, dtype=np.uint8)
    buf = _encode_bmp(gray, 3, 2)
    assert buf[:2] == b"BM"
    # rows are bottom-up: the first raster row holds pixels 3,4,5
    data_off = int.from_bytes(buf[10:14], "little")
    assert buf[data_off : data_off + 3] == bytes([3, 3, 3])
    w, h, g = _parse_bmp(buf)
    assert (w, h) == (3, 2)
    assert list(g) == [0, 1, 2, 3, 4, 5]


@pytest.mark.parametrize("shape", [(8, 8), (13, 9), (71, 71), (9, 50)])
def test_cross_container_pixel_parity(shape):
    w, h = shape
    gray = _test_pattern(99, w * h)
    stats = set()
    for buf, parser in [
        (_encode_pnm(gray, w, h, False), _parse_pnm),
        (_encode_pnm(gray, w, h, True), _parse_pnm),
        (_encode_bmp(gray, w, h), _parse_bmp),
    ]:
        pw, ph, g = parser(buf)
        stats.add((pw, ph, int(g.sum()), int(g.min()), int(g.max())))
    assert len(stats) == 1  # identical decoded statistics


def test_malformed_inputs_raise():
    with pytest.raises(ValueError):
        _parse_bmp(b"XX not a bmp")
    with pytest.raises(ValueError):
        _parse_bmp(_encode_pnm(np.zeros(4, np.uint8), 2, 2, False))
    with pytest.raises(ValueError):
        _parse_pnm(b"P5\n2 2\n65535\n" + bytes(8))  # 16-bit unsupported


@pytest.mark.spark
def test_spark_decode_matches_bytes(spark):
    """End-to-end through mapInPandas: encode real containers, decode
    features, and check against numpy ground truth computed directly
    from the same deterministic pattern."""
    from lasdb_spark.operators.multimodal import (
        decode_image_features,
        make_image_corpus,
        resize_images,
    )

    docs = spark.createDataFrame(
        [(i, "x" * (10 + 13 * i), 10 + 13 * i) for i in range(6)],
        "doc_id long, text string, n_chars long",
    )
    for container in ("pgm", "ppm", "bmp"):
        rows = {
            r.doc_id: r
            for r in decode_image_features(
                make_image_corpus(docs, container)
            ).collect()
        }
        for i in range(6):
            n_chars = 10 + 13 * i
            w, h = n_chars % 64 + 8, (n_chars * 7) % 64 + 8
            gray = _test_pattern(i, w * h).astype(np.int64)
            r = rows[i]
            assert (r.width, r.height, r.n_px) == (w, h, w * h)
            assert r.sum_px == gray.sum()
            assert (r.min_px, r.max_px) == (gray.min(), gray.max())
            assert r.format == container
    # resize: exact nearest-neighbor sum
    rs = {
        r.doc_id: r
        for r in resize_images(make_image_corpus(docs), 32, 32).collect()
    }
    for i in range(6):
        n_chars = 10 + 13 * i
        w, h = n_chars % 64 + 8, (n_chars * 7) % 64 + 8
        img = _test_pattern(i, w * h).astype(np.int64).reshape(h, w)
        rr = (np.arange(32) * h) // 32
        cc = (np.arange(32) * w) // 32
        assert rs[i].sum_resized == img[rr][:, cc].sum()
        assert rs[i].scale_x == round(32 / w, 6)


# ---------------------------------------------------------------------------
# REAL audio (RIFF/WAVE PCM16) decode
# ---------------------------------------------------------------------------
def test_wav_roundtrip_and_chunk_walk():
    from lasdb_spark.operators.multimodal import (
        _encode_wav,
        _parse_wav,
        _test_waveform,
    )

    s = _test_waveform(7, 100)
    buf = _encode_wav(s, 16000, 2)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"
    # the LIST chunk sits before data, so a fixed-44-byte-offset reader
    # would land inside INFO — the parser must chunk-walk
    assert buf.index(b"LIST") < buf.index(b"data")
    rate, ch, decoded = _parse_wav(buf)
    assert (rate, ch) == (16000, 2)
    assert list(decoded) == list(s)


def test_wav_odd_data_length_word_aligned():
    from lasdb_spark.operators.multimodal import _encode_wav, _parse_wav

    s = np.array([1, -2, 3], dtype=np.int64)  # 6 bytes: even, add junk
    buf = _encode_wav(s, 8000, 1)
    # declared RIFF size must cover everything after the 8-byte header
    declared = int.from_bytes(buf[4:8], "little")
    assert declared == len(buf) - 8
    rate, ch, decoded = _parse_wav(buf)
    assert list(decoded) == [1, -2, 3]


def test_wav_malformed_raises():
    from lasdb_spark.operators.multimodal import _encode_wav, _parse_wav

    with pytest.raises(ValueError):
        _parse_wav(b"RIFFxxxxAIFF")  # not WAVE
    buf = bytearray(_encode_wav(np.zeros(4, np.int64), 8000, 1))
    buf[20] = 3  # audio_format = IEEE float
    with pytest.raises(ValueError):
        _parse_wav(bytes(buf))


@pytest.mark.spark
def test_spark_audio_decode_matches_bytes(spark):
    from lasdb_spark.operators.multimodal import (
        _test_waveform,
        decode_audio_features,
        make_audio_corpus,
    )

    docs = spark.createDataFrame(
        [(i, "x", 10 + 13 * i) for i in range(6)],
        "doc_id long, text string, n_chars long",
    )
    rows = {
        r.doc_id: r
        for r in decode_audio_features(make_audio_corpus(docs)).collect()
    }
    for i in range(6):
        ch = i % 2 + 1
        n_frames = (10 + 13 * i) % 1000 + 250
        s = _test_waveform(i, n_frames * ch)
        r = rows[i]
        assert (r.sample_rate, r.channels) == (8000 + (i % 4) * 4000, ch)
        assert r.n_frames == n_frames
        assert r.duration_ms == n_frames * 1000 // r.sample_rate
        assert (r.sum_amp, r.sum_sq) == (s.sum(), (s * s).sum())
        assert (r.min_amp, r.max_amp) == (s.min(), s.max())
        nonneg = s >= 0
        assert r.zero_cross == int((nonneg[1:] != nonneg[:-1]).sum())


# ---------------------------------------------------------------------------
# REAL video (concatenated-PGM) frame sampling
# ---------------------------------------------------------------------------
@pytest.mark.spark
def test_spark_frame_sample_matches_bytes(spark):
    from lasdb_spark.operators.multimodal import (
        make_video_corpus,
        sample_frames,
    )

    docs = spark.createDataFrame(
        [(i, "x", 10 + 13 * i) for i in range(6)],
        "doc_id long, text string, n_chars long",
    )
    rows = sample_frames(make_video_corpus(docs), stride=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i in range(6):
        n_frames = i % 24 + 4
        n_chars = 10 + 13 * i
        w, h = n_chars % 24 + 8, (n_chars * 3) % 24 + 8
        sampled = sorted(by_doc[i], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in sampled] == list(range(0, n_frames, 4))
        px = np.arange(w * h, dtype=np.int64)
        for r in sampled:
            gray = (i * 31 + r.frame_idx * 97 + px * 7) % 256
            assert (r.width, r.height) == (w, h)
            assert r.sum_px == gray.sum()
            assert (r.min_px, r.max_px) == (gray.min(), gray.max())


@pytest.mark.spark
def test_frame_stream_malformed_raises(spark):
    from lasdb_spark.operators.multimodal import (
        make_video_corpus,
        sample_frames,
    )

    docs = spark.createDataFrame(
        [(1, "x", 20)], "doc_id long, text string, n_chars long"
    )
    corrupted = make_video_corpus(docs).selectExpr(
        "doc_id",
        # flip the first frame's magic: P5 -> Q5
        "concat(cast('Q' as binary), substring(payload, 2)) as payload",
        "meta",
    )
    with pytest.raises(Exception, match="bad frame header"):
        sample_frames(corrupted).collect()


@pytest.mark.spark
def test_png_corpus_roundtrip(spark, sf_dir):
    """PNG encode -> zlib decode -> features equal the PGM path's
    (identical pixels, different container), and the resize path
    accepts PNG payloads."""
    from lasdb_spark.operators.multimodal import (
        decode_image_features,
        make_image_corpus,
        resize_images,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    png = decode_image_features(
        make_image_corpus(docs, container="png")
    ).collect()
    pgm = decode_image_features(
        make_image_corpus(docs, container="pgm")
    ).collect()
    key = lambda rows: sorted(
        (r.doc_id, r.width, r.height, r.n_px, r.sum_px, r.min_px, r.max_px)
        for r in rows
    )
    assert key(png) == key(pgm) and png
    assert all(r.format == "png" for r in png)

    rz = resize_images(make_image_corpus(docs, container="png")).collect()
    assert len(rz) == len(png)


def test_png_filter_reconstruction():
    """Decoder reconstructs all five PNG filter types (a hand-filtered
    stream, not just the encoder's filter-0 fast path)."""
    import struct
    import zlib

    import numpy as np

    from lasdb_spark.operators.multimodal import (
        _PNG_SIG,
        _parse_png,
        _png_chunk,
    )

    rng = np.random.RandomState(7)
    w, h = 9, 5
    img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
    raw = bytearray()
    prior = np.zeros(w, dtype=np.int64)
    for y, ft in enumerate([1, 2, 3, 4, 0]):
        line = img[y].astype(np.int64)
        enc = line.copy()
        if ft == 1:
            for i in range(w - 1, 0, -1):
                enc[i] = (enc[i] - line[i - 1]) % 256
        elif ft == 2:
            enc = (line - prior) % 256
        elif ft == 3:
            for i in range(w):
                left = line[i - 1] if i else 0
                enc[i] = (line[i] - (left + prior[i]) // 2) % 256
        elif ft == 4:
            for i in range(w):
                a = line[i - 1] if i else 0
                b, c = prior[i], (prior[i - 1] if i else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = (
                    a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                )
                enc[i] = (line[i] - pred) % 256
        raw.append(ft)
        raw.extend(enc.astype(np.uint8).tobytes())
        prior = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    buf = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    w2, h2, out = _parse_png(buf)
    assert (w2, h2) == (w, h)
    assert (out.reshape(h, w) == img.astype(np.int64)).all()


def test_png_rejects_unsupported():
    import struct

    import pytest as _pytest

    from lasdb_spark.operators.multimodal import (
        _PNG_SIG,
        _parse_png,
        _png_chunk,
    )

    with _pytest.raises(ValueError):
        _parse_png(b"not a png")
    ihdr16 = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    with _pytest.raises(ValueError):
        _parse_png(_PNG_SIG + _png_chunk(b"IHDR", ihdr16))


def test_png_filter_roundtrip_property():
    """Property: any image encoded with ANY per-row filter choice
    decodes back exactly (pure-python, no Spark)."""
    import struct
    import zlib

    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lasdb_spark.operators.multimodal import (
        _PNG_SIG,
        _parse_png,
        _png_chunk,
    )

    def encode(img, ftypes):
        h, w = img.shape
        raw = bytearray()
        prior = np.zeros(w, dtype=np.int64)
        for y, ft in enumerate(ftypes):
            line = img[y].astype(np.int64)
            enc = line.copy()
            if ft == 1:
                for i in range(w - 1, 0, -1):
                    enc[i] = (enc[i] - line[i - 1]) % 256
            elif ft == 2:
                enc = (line - prior) % 256
            elif ft == 3:
                for i in range(w):
                    left = line[i - 1] if i else 0
                    enc[i] = (line[i] - (left + prior[i]) // 2) % 256
            elif ft == 4:
                for i in range(w):
                    a = line[i - 1] if i else 0
                    b, c = prior[i], (prior[i - 1] if i else 0)
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a
                        if (pa <= pb and pa <= pc)
                        else (b if pb <= pc else c)
                    )
                    enc[i] = (line[i] - pred) % 256
            raw.append(ft)
            raw.extend(enc.astype(np.uint8).tobytes())
            prior = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b"")
        )

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(2, 12),
        st.integers(2, 8),
        st.integers(0, 2**32 - 1),
        st.lists(st.integers(0, 4), min_size=8, max_size=8),
    )
    def prop(w, h, seed, ftypes):
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        buf = encode(img, (ftypes * ((h // 8) + 1))[:h])
        w2, h2, out = _parse_png(buf)
        assert (w2, h2) == (w, h)
        assert (out.reshape(h, w) == img.astype(np.int64)).all()

    prop()


@pytest.mark.spark
def test_metadata_audit_flags_mismatches(spark, sf_dir):
    """Consistent corpus audits clean; a corrupted metadata struct is
    flagged (decode wins over declaration)."""
    from pyspark.sql import functions as F

    from lasdb_spark.operators.multimodal import (
        audit_image_metadata,
        make_image_corpus,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    corpus = make_image_corpus(docs, container="bmp")
    clean = audit_image_metadata(corpus).collect()
    assert clean and all(r.consistent for r in clean)

    lied = corpus.withColumn(
        "meta",
        F.struct(
            F.col("meta.format").alias("format"),
            (F.col("meta.declared_w") + 1).alias("declared_w"),
            F.col("meta.declared_h").alias("declared_h"),
        ),
    )
    bad = audit_image_metadata(lied).collect()
    assert all(not r.consistent for r in bad)
    assert all(r.width == r.declared_w - 1 for r in bad)


@pytest.mark.spark
def test_scene_cuts_real_bytes_match_formula(spark, sf_dir):
    """The byte-walk SAD equals a numpy recompute from the generative
    formula for a spot-checked doc, every consecutive pair appears
    exactly once, and the cut gate is mean_abs_diff > threshold."""
    import numpy as np

    from lasdb_spark.operators.multimodal import (
        SCENE_CUT_THRESHOLD,
        detect_scene_cuts,
        make_video_corpus,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    out = detect_scene_cuts(make_video_corpus(docs)).collect()
    meta = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in by_doc.items():
        n_frames = doc_id % 24 + 4
        assert sorted(r.frame_idx for r in rows) == list(
            range(1, n_frames)
        )
        n_chars = meta[doc_id]
        w = n_chars % 24 + 8
        h = (n_chars * 3) % 24 + 8
        i = np.arange(w * h, dtype=np.int64)
        for r in rows[:3]:
            a = (doc_id * 31 + (r.frame_idx - 1) * 97 + i * 7) % 256
            b = (doc_id * 31 + r.frame_idx * 97 + i * 7) % 256
            assert r.sad == int(np.abs(a - b).sum())
            assert r.is_cut == (r.mean_abs_diff > SCENE_CUT_THRESHOLD)


def test_jpeg_flat_block_roundtrip_exact():
    """r7: constant 8x8 blocks have DC-only spectra, so the lossy
    baseline codec round-trips them EXACTLY - the property the oracle
    relies on, swept over doc ids and block-grid shapes."""
    from lasdb_spark.operators.multimodal import (
        _encode_jpeg,
        _parse_jpeg,
        _test_pattern_blocks,
    )

    for doc_id in (0, 1, 999, 54321):
        for bw, bh in ((1, 1), (8, 1), (3, 7), (8, 8)):
            g = _test_pattern_blocks(doc_id, bw, bh)
            w2, h2, dec = _parse_jpeg(_encode_jpeg(g.reshape(-1), 8 * bw, 8 * bh))
            assert (w2, h2) == (8 * bw, 8 * bh)
            assert np.array_equal(dec, g.reshape(-1).astype(np.int64))


def test_jpeg_lossy_error_bounded():
    """Arbitrary (non-flat) pixels: the codec is lossy but the error
    must be bounded by the quantization step - <=1 gray level at the
    all-ones table (float DCT rounding only), and still small at a
    coarse table. Also: coarser quantization must actually compress."""
    from lasdb_spark.operators.multimodal import (
        _encode_jpeg,
        _parse_jpeg,
        _test_pattern,
    )

    g = _test_pattern(12345, 64 * 40)
    buf1 = _encode_jpeg(g, 64, 40)
    _, _, dec1 = _parse_jpeg(buf1)
    assert np.abs(dec1 - g.astype(np.int64)).max() <= 1
    q = np.full(64, 4, dtype=np.int64)
    q[0] = 1
    buf4 = _encode_jpeg(g, 64, 40, quant=q)
    _, _, dec4 = _parse_jpeg(buf4)
    assert np.abs(dec4 - g.astype(np.int64)).max() <= 8
    assert len(buf4) < len(buf1)


def test_jpeg_rejects_malformed():
    from lasdb_spark.operators.multimodal import (
        _encode_jpeg,
        _parse_jpeg,
        _test_pattern_blocks,
    )

    g = _test_pattern_blocks(7, 2, 2)
    buf = _encode_jpeg(g.reshape(-1), 16, 16)
    with pytest.raises(ValueError):
        _parse_jpeg(buf[:40])  # truncated header
    with pytest.raises(ValueError):
        _parse_jpeg(buf[:-10])  # truncated entropy stream
    with pytest.raises(ValueError):
        _parse_jpeg(b"\x89PNGnot-a-jpeg")
    # progressive (SOF2) streams are out of baseline scope: fail loudly
    bad = bytearray(buf)
    sof = buf.index(b"\xff\xc0")
    bad[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        _parse_jpeg(bytes(bad))


@pytest.mark.spark
def test_jpeg_corpus_roundtrip(spark, sf_dir):
    """End-to-end through mapInPandas: encode every doc as a real JPEG,
    decode via the sniffing feature extractor, check the stats against
    the block formula."""
    from lasdb_spark.operators.multimodal import (
        decode_image_features,
        make_image_corpus,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    out = decode_image_features(
        make_image_corpus(docs, container="jpeg")
    ).collect()
    meta = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
    assert len(out) == len(meta)
    for r in out:
        n_chars = meta[r.doc_id]
        bw, bh = n_chars % 8 + 1, (n_chars * 7) % 8 + 1
        assert (r.format, r.width, r.height) == ("jpeg", 8 * bw, 8 * bh)
        b = np.arange(bw * bh, dtype=np.int64)
        g = (r.doc_id * 31 + b * 7) % 256
        assert r.n_px == 64 * bw * bh
        assert r.sum_px == 64 * int(g.sum())
        assert (r.min_px, r.max_px) == (int(g.min()), int(g.max()))


@pytest.mark.spark
def test_silence_segments_match_gapped_structure(spark):
    """The gapped corpus zeroes every 3rd 100-frame block, so every
    reported segment must be block-aligned, >= the min length, and the
    noise regions must never produce a segment."""
    from lasdb_spark.operators.multimodal import (
        SIL_BLOCK,
        SIL_PERIOD,
        detect_silence_segments,
        make_audio_corpus_gapped,
    )

    docs = spark.createDataFrame(
        [(i, "x", "en", "web", 300 + i * 37) for i in range(6)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    segs = detect_silence_segments(
        make_audio_corpus_gapped(docs)
    ).collect()
    assert segs, "gapped corpus must produce silence segments"
    for r in segs:
        # silent blocks start at multiples of SIL_BLOCK*SIL_PERIOD
        assert r.start_frame % (SIL_BLOCK * SIL_PERIOD) == 0
        # a full interior block is exactly SIL_BLOCK frames; the final
        # block may be truncated by the asset end but never extended
        assert r.n_frames <= SIL_BLOCK
        assert r.end_frame - r.start_frame == r.n_frames
    # every doc has at least its first block silent (frames 0..100)
    firsts = {r.doc_id for r in segs if r.start_frame == 0}
    assert firsts == set(range(6))


@pytest.mark.spark
def test_phash_family_structure(spark):
    """Family members (one perturbed pixel apart) hash within the
    Hamming threshold; the hash survives the real PGM encode/decode
    round trip bit-for-bit."""
    import numpy as np
    from lasdb_spark.operators.multimodal import (
        PHASH_MAX_HAMMING,
        _dct_rows,
        _phash_image,
        make_phash_corpus,
        phash_hashes,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(20)], "doc_id long"
    )
    got = {
        r.doc_id: r.phash
        for r in phash_hashes(make_phash_corpus(docs)).collect()
    }
    assert set(got) == set(range(20))

    # bit-for-bit vs the direct numpy computation (no container)
    T = np.array(_dct_rows(), dtype=np.int64)
    for d in range(20):
        img = _phash_image(d).reshape(32, 32)
        coeff = (T @ img @ T.T).reshape(-1)[1:]
        med = int(np.sort(coeff)[(len(coeff) - 1) // 2])
        expect = 0
        for i, v in enumerate(coeff):
            if v > med:
                expect |= 1 << i
        assert got[d] == expect, d

    # family closeness: members of family 0 (docs 0..4) within thresh
    for d in range(1, 5):
        ham = bin(got[0] ^ got[d]).count("1")
        assert ham <= PHASH_MAX_HAMMING, (d, ham)


@pytest.mark.spark
def test_phash_banding_guarantee(spark):
    """Pigeonhole: any pair within Hamming 3 shares at least one of
    the four 16-bit bands, so the banded join NEVER misses it."""
    from lasdb_spark.operators.multimodal import phash_dup_pairs

    base = 0x123456789ABCDEF
    flipped3 = base ^ (1 << 2) ^ (1 << 20) ^ (1 << 40)  # 3 bands touched
    far = base ^ ((1 << 60) - 1)  # scrambles every band
    hashes = spark.createDataFrame(
        [(1, base), (2, flipped3), (3, far)], "doc_id long, phash long"
    )
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in phash_dup_pairs(hashes, max_hamming=10).collect()
    }
    assert pairs == {(1, 2): 3}


@pytest.mark.spark
def test_phash_rejects_malformed_payload(spark):
    """A corrupted container fails loudly, never fabricates a hash."""
    from lasdb_spark.operators.multimodal import phash_hashes

    corpus = spark.createDataFrame(
        [(1, bytearray(b"NOTANIMAGE"), {"format": "pgm",
                                        "declared_w": 32,
                                        "declared_h": 32})],
        "doc_id long, payload binary, "
        "meta struct<format: string, declared_w: int, declared_h: int>",
    )
    with pytest.raises(Exception):
        phash_hashes(corpus).collect()


@pytest.mark.spark
def test_audio_fingerprint_family_structure(spark):
    """Fingerprints survive the real WAV encode/decode byte walk
    bit-for-bit, and one-frame perturbations stay within the
    threshold."""
    import numpy as np
    from lasdb_spark.operators.multimodal import (
        AFP_FRAME_LEN,
        AFP_FRAMES,
        PHASH_MAX_HAMMING,
        _afp_waveform,
        audio_fingerprints,
        make_audio_dup_corpus,
    )

    docs = spark.createDataFrame([(i,) for i in range(15)], "doc_id long")
    got = {
        r.doc_id: r.phash
        for r in audio_fingerprints(make_audio_dup_corpus(docs)).collect()
    }
    for d in range(15):
        s = _afp_waveform(d)
        e = np.abs(s).reshape(-1, AFP_FRAME_LEN).sum(axis=1)[1:AFP_FRAMES]
        med = int(np.sort(e)[(len(e) - 1) // 2])
        expect = 0
        for i, v in enumerate(e):
            if v > med:
                expect |= 1 << i
        assert got[d] == expect, d
    for d in range(1, 5):
        assert bin(got[0] ^ got[d]).count("1") <= PHASH_MAX_HAMMING
