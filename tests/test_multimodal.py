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
