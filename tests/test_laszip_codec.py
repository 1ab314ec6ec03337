"""Round-trip gates for the pure-python LASzip codec — every layer
(range coder, integer corrector, per-item models, chunked container)
plus the las.py read-path integration. No Spark needed."""

import random
import struct

import numpy as np
import pytest

from lasdb_spark.sources import las
from lasdb_spark.sources.laszip_codec import (
    ArithmeticDecoder,
    ArithmeticEncoder,
    ArithmeticModel,
    GpsTime11V2,
    IntegerCompressor,
    Point10,
    Point10V2,
    Rgb12V2,
    compress_points_to_laz,
    decompress_laz_points,
)


def test_coder_roundtrip_mixed_ops():
    rng = random.Random(42)
    enc = ArithmeticEncoder()
    m = ArithmeticModel(33, True)
    ops = []
    for _ in range(3000):
        if rng.random() < 0.5:
            s = rng.randrange(33)
            ops.append(("sym", s))
            enc.encode_symbol(m, s)
        else:
            v = rng.randrange(1 << 32)
            ops.append(("int", v))
            enc.write_int(v)
    buf = enc.done()
    dec = ArithmeticDecoder(buf)
    md = ArithmeticModel(33, False)
    for kind, want in ops:
        got = dec.decode_symbol(md) if kind == "sym" else dec.read_int()
        assert got == want


def test_integer_compressor_wrapping_32bit():
    """32-bit correctors must emulate C's wrapping I32 arithmetic —
    differences past 2^31 (the GPS-time full-resync path) included."""
    rng = random.Random(1)
    vals = [0, (1 << 31) - 1, -(1 << 31), 123]
    vals += [rng.randrange(-(1 << 31), 1 << 31) for _ in range(2000)]
    enc = ArithmeticEncoder()
    ic = IntegerCompressor(enc, 32, 2)
    prev = 0
    for v in vals:
        ic.compress(prev & 0xFFFFFFFF, v & 0xFFFFFFFF, 1)
        prev = v
    buf = enc.done()
    dec = ArithmeticDecoder(buf)
    icd = IntegerCompressor(dec, 32, 2)
    prev = 0
    for v in vals:
        got = icd.decompress(prev & 0xFFFFFFFF, 1)
        assert (got - v) % (1 << 32) == 0, (v, got)
        prev = v


def _random_points(rng, n):
    pts = []
    x, y, z = 10_000_000, 20_000_000, 50_000
    for _ in range(n):
        x += int(rng.gauss(0, 50))
        y += int(rng.gauss(0, 50))
        z += int(rng.gauss(0, 20))
        nr = rng.randrange(1, 6)
        r = rng.randrange(1, nr + 1)
        flags = (
            r | (nr << 3) | (rng.randrange(2) << 6)
            | (rng.randrange(2) << 7)
        )
        pts.append(
            Point10(
                x, y, z, rng.randrange(3000), flags, rng.randrange(32),
                rng.randrange(-90, 91), rng.randrange(256),
                rng.randrange(100),
            )
        )
    return pts


def test_point10_v2_roundtrip():
    pts = _random_points(random.Random(5), 2000)
    enc = ArithmeticEncoder()
    c = Point10V2(enc)
    c.init(pts[0])
    for p in pts[1:]:
        c.write(p)
    buf = enc.done()
    dec = ArithmeticDecoder(buf)
    d = Point10V2(dec)
    d.init(pts[0])
    for want in pts[1:]:
        assert d.read().pack() == want.pack()
    # and it actually compresses structured data
    assert len(buf) < 20 * len(pts)


def test_gpstime11_v2_roundtrip_with_resyncs():
    rng = random.Random(7)

    def f2u(f):
        return struct.unpack("<Q", struct.pack("<d", f))[0]

    ts, t = [], 300000.0
    for _ in range(3000):
        r = rng.random()
        if r < 0.01:
            t += rng.uniform(100, 10000)  # flight-line break
        elif r < 0.1:
            pass  # same pulse
        else:
            t += 5e-6 * rng.choice([1, 1, 2, 700])
        ts.append(f2u(t))
    # adversarial: arbitrary doubles force the 64-bit full path
    ts += [f2u(rng.uniform(-1e12, 1e12)) for _ in range(500)]
    enc = ArithmeticEncoder()
    g = GpsTime11V2(enc)
    g.init(ts[0])
    for v in ts[1:]:
        g.write(v)
    dec = ArithmeticDecoder(enc.done())
    gd = GpsTime11V2(dec)
    gd.init(ts[0])
    for want in ts[1:]:
        assert gd.read() == want


def test_rgb12_v2_roundtrip():
    rng = random.Random(9)
    rgbs = [(0, 0, 0)]
    for _ in range(2000):
        if rng.random() < 0.3:
            v = rng.randrange(65536)
            rgbs.append((v, v, v))  # grayscale branch (sym bit 6 off)
        else:
            r0, g0, b0 = rgbs[-1]
            rgbs.append(tuple(
                max(0, min(65535, c + rng.randrange(-300, 300)))
                for c in (r0, g0, b0)
            ))
    enc = ArithmeticEncoder()
    c = Rgb12V2(enc)
    c.init(rgbs[0])
    for v in rgbs[1:]:
        c.write(v)
    dec = ArithmeticDecoder(enc.done())
    d = Rgb12V2(dec)
    d.init(rgbs[0])
    for want in rgbs[1:]:
        assert d.read() == want


def _cloud_struct(fmt, n, seed=3):
    rng = np.random.default_rng(seed)
    dt = las.point_dtype(fmt)
    pts = np.zeros(n, dtype=dt)
    pts["X"] = np.cumsum(rng.integers(-80, 80, n)) + 10_000_000
    pts["Y"] = np.cumsum(rng.integers(-80, 80, n)) + 20_000_000
    pts["Z"] = np.cumsum(rng.integers(-20, 20, n)) + 50_000
    pts["intensity"] = rng.integers(0, 4000, n)
    nret = rng.integers(1, 6, n)
    rnum = (rng.random(n) * nret).astype(int) + 1
    pts["flags"] = (
        rnum | (nret << 3) | (rng.integers(0, 2, n) << 6)
        | (rng.integers(0, 2, n) << 7)
    ).astype(np.uint8)
    pts["classification"] = rng.integers(0, 20, n)
    pts["scan_angle"] = rng.integers(-30, 31, n)
    pts["user_data"] = rng.integers(0, 5, n)
    pts["point_source_id"] = rng.integers(0, 8, n)
    if fmt in (1, 3, 4, 5):
        pts["gps_time"] = 300000.0 + np.cumsum(rng.random(n) * 1e-5)
    if fmt in (2, 3, 5):
        v = rng.integers(0, 65536, n)
        pts["red"] = v
        pts["green"] = np.clip(
            v + rng.integers(-200, 200, n), 0, 65535
        )
        pts["blue"] = v
    if fmt in (4, 5):
        # exercise all four WAVEPACKET13 offset-diff shapes: unchanged
        # / follows-last (off+size) / repeated-32-bit-delta / raw-u64
        pts["wp_descriptor"] = rng.integers(0, 4, n)
        sizes = rng.integers(64, 512, n).astype(np.uint64)
        pts["wp_size"] = sizes
        off = np.zeros(n, dtype=np.uint64)
        cur = 5_000_000
        for i in range(n):
            shape = i % 4
            if shape == 1:
                cur = cur + int(sizes[i - 1])
            elif shape == 2:
                cur = cur + 8192
            elif shape == 3:
                cur = int(rng.integers(0, 2**63, dtype=np.int64))
            off[i] = cur
        pts["wp_offset"] = off
        pts["wp_return_point"] = rng.random(n, dtype=np.float32) * 5
        pts["wp_dx"] = rng.random(n, dtype=np.float32) - 0.5
        pts["wp_dy"] = rng.random(n, dtype=np.float32) - 0.5
        pts["wp_dz"] = rng.random(n, dtype=np.float32) - 0.5
    return pts


@pytest.mark.parametrize("fmt", [0, 1, 2, 3, 4, 5])
def test_laz_file_roundtrip_all_formats(fmt):
    # chunk_size 1000 with 2500 points crosses chunk boundaries (the
    # chunk-table repositioning path) without a 50k-point test cost
    pts = _cloud_struct(fmt, 2500)
    laz = compress_points_to_laz(pts, fmt, chunk_size=1000)
    hdr = las.parse_las_header(laz)
    assert hdr["compressed"] and hdr["point_format"] == fmt
    assert hdr["point_count"] == len(pts)
    got = decompress_laz_points(laz, hdr)
    for f in pts.dtype.names:
        assert np.array_equal(got[f], pts[f]), (fmt, f)


def test_read_las_bytes_decodes_laz_without_laspy():
    """The reader integration: a real chunked LAZ stream yields the
    same scaled xyz as the uncompressed write of the same cloud."""
    if las.laz_backend_available():  # pragma: no cover
        pytest.skip("laspy backend present; fallback not exercised")
    pts = _cloud_struct(3, 1500)
    laz = compress_points_to_laz(
        pts, 3, scales=(0.01, 0.01, 0.01), offsets=(1000.0, 2000.0, 0.0)
    )
    xyz = las.read_las_bytes(laz)
    assert xyz.shape == (1500, 3)
    assert np.allclose(xyz[:, 0], pts["X"] * 0.01 + 1000.0)
    assert np.allclose(xyz[:, 1], pts["Y"] * 0.01 + 2000.0)
    assert np.allclose(xyz[:, 2], pts["Z"] * 0.01)


def test_read_las_bytes_laz_without_vlr_still_guides():
    """A compression-bit file with no laszip VLR (the old fake-LAZ
    shape) must keep raising the actionable guidance error."""
    if las.laz_backend_available():  # pragma: no cover
        pytest.skip("laspy backend present")
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.las")
        las.write_las(np.zeros((5, 3)), p)
        buf = bytearray(open(p, "rb").read())
    # set the compression bit on the point format byte
    fmt_off = struct.calcsize("<4sHHIHH8sBB32s32sHHHII")
    buf[fmt_off] |= 0x80
    with pytest.raises(las.LazUnsupportedError, match="laspy"):
        las.read_las_bytes(bytes(buf))


@pytest.mark.spark
def test_las_to_df_mixed_las_and_laz_dir(spark, tmp_path):
    """Distributed read over a directory with one .las and one .laz
    tile (the real AHN shape): both decode, union is exact."""
    if las.laz_backend_available():  # pragma: no cover
        pytest.skip("laspy path would shadow the in-repo codec")
    import os

    pts = _cloud_struct(1, 800)
    laz = compress_points_to_laz(
        pts, 1, scales=(0.01, 0.01, 0.01), offsets=(0.0, 0.0, 0.0)
    )
    with open(tmp_path / "a.laz", "wb") as f:
        f.write(laz)
    xyz_b = np.stack(
        [pts["X"] * 0.01 + 5.0, pts["Y"] * 0.01, pts["Z"] * 0.01], axis=1
    )
    las.write_las(
        xyz_b, str(tmp_path / "b.las"), scales=(0.01, 0.01, 0.01)
    )
    df = las.las_to_df(spark, os.path.join(str(tmp_path), "*"))
    got = sorted(
        (round(r.x, 2), round(r.y, 2), round(r.z, 2))
        for r in df.collect()
    )
    want = sorted(
        [
            (round(x * 0.01, 2), round(y * 0.01, 2), round(z * 0.01, 2))
            for x, y, z in zip(pts["X"], pts["Y"], pts["Z"])
        ]
        + [(round(x, 2), round(y, 2), round(z, 2)) for x, y, z in xyz_b]
    )
    assert got == want


@pytest.mark.spark
def test_df_to_las_laz_export_roundtrip(spark, tmp_path):
    """S10 compressed export: a query-result DataFrame written as .laz
    reads back point-exact at grid precision."""
    rows = [(100.0 + i * 0.5, 200.0 + i * 0.3, 10.0 + (i % 7))
            for i in range(300)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    p = str(tmp_path / "out.laz")
    n = las.df_to_las(df, p, scales=(0.01, 0.01, 0.01))
    assert n == 300
    hdr = las.read_las_header_file(p)
    assert hdr["compressed"] and hdr["point_count"] == 300
    xyz = las.read_las_bytes(open(p, "rb").read())
    got = sorted(map(tuple, np.round(xyz, 2)))
    assert got == sorted(rows)


@pytest.mark.spark
def test_partitioned_laz_export_roundtrip(spark, tmp_path):
    """Distributed compressed export: per-partition .laz files read
    back to the same point set."""
    if las.laz_backend_available():  # pragma: no cover
        pytest.skip("laspy path would shadow the in-repo codec")
    import os

    rows = [(float(i), float(2 * i), float(i % 50)) for i in range(900)]
    df = spark.createDataFrame(rows, "x double, y double, z double").repartition(3)
    out = str(tmp_path / "parts")
    files = las.df_to_las_partitioned(
        df, out, scales=(0.01, 0.01, 0.01), compress=True
    ).collect()
    assert sum(f.n_points for f in files) == 900
    assert all(f.path.endswith(".laz") for f in files)
    back = las.las_to_df(spark, os.path.join(out, "*"))
    got = sorted((round(r.x, 2), round(r.y, 2), round(r.z, 2)) for r in back.collect())
    assert got == sorted(rows)


@pytest.mark.spark
def test_cli_import_real_laz_succeeds(spark, tmp_path, capsys):
    """run_import over a REAL chunked LAZ tile now succeeds through
    the in-repo codec (the graceful-failure path is reserved for
    VLR-less / unsupported streams)."""
    if las.laz_backend_available():  # pragma: no cover
        pytest.skip("laspy path would shadow the in-repo codec")
    import json

    from lasdb_spark.cli import runner
    from lasdb_spark.operators.ingest import load_dataset

    pts = _cloud_struct(0, 600)
    with open(tmp_path / "tile.laz", "wb") as f:
        f.write(compress_points_to_laz(
            pts, 0, scales=(0.01, 0.01, 0.01)
        ))
    imp = {
        "config": {"base_path": str(tmp_path / "store")},
        "imports": {
            "ahn_tile": {"mode": "file", "path": str(tmp_path / "tile.laz")}
        },
    }
    (tmp_path / "imp.json").write_text(json.dumps(imp))
    runner.run_import(str(tmp_path / "imp.json"), spark)
    df, meta, layout = load_dataset(spark, str(tmp_path / "store"), "ahn_tile")
    assert meta.point_count == 600
    assert df.count() == 600


def test_malformed_input_fails_cleanly():
    """Fuzz gate: arbitrary byte soup — with or without a LASF
    signature or the compression bit — must fail with ValueError (or
    parse), never leak struct.error/OverflowError/IndexError from the
    internals."""
    rng = random.Random(20)
    for _ in range(800):
        n = rng.choice([0, 3, 100, 226, 227, 230, 300, 400])
        buf = bytearray(rng.randrange(256) for _ in range(n))
        r = rng.random()
        if r < 0.6 and n >= 4:
            buf[:4] = b"LASF"
        if r < 0.3 and n >= 106:
            buf[104] |= 0x80
        for fn in (las.parse_las_header, las.read_las_bytes):
            try:
                fn(bytes(buf))
            except ValueError:
                pass


def test_read_las_bytes_decodes_waveform_laz():
    """Compressed LAZ 4/5 (pointwise waveform, r5 verdict stretch
    item): the generic reader routes them through the v2 codec and
    yields scaled xyz; the 29-byte wavepacket tail round-trips in the
    structured decode."""
    if las.laz_backend_available():  # pragma: no cover
        pytest.skip("laspy backend present; fallback not exercised")
    for fmt in (4, 5):
        pts = _cloud_struct(fmt, 1200, seed=fmt)
        laz = compress_points_to_laz(
            pts, fmt, scales=(0.01, 0.01, 0.01), chunk_size=500
        )
        hdr = las.parse_las_header(laz)
        assert hdr["version"] == (1, 3) and hdr["header_size"] == 235
        xyz = las.read_las_bytes(laz)
        assert xyz.shape == (1200, 3)
        assert np.allclose(xyz[:, 0], pts["X"] * 0.01)
        got = decompress_laz_points(laz, hdr)
        for f in ("wp_descriptor", "wp_offset", "wp_size",
                  "wp_return_point", "wp_dx", "wp_dy", "wp_dz"):
            assert np.array_equal(got[f], pts[f]), (fmt, f)
