"""COPC (Cloud-Optimized Point Cloud) reader/writer.

COPC (public spec, copc.io) is the modern exchange shape for massive
LiDAR: a LAS 1.4 / layered-LAZ (compressor 3, formats 6-8) file whose
chunks correspond to octree nodes, plus a hierarchy index (voxel key →
chunk offset/size/count) stored in an EVLR and an info VLR carrying
the octree cube. The payoff is FILE-LEVEL spatial pruning: a bbox
query decodes only the chunks whose octree cubes intersect the
window, without scanning the file — exactly the skip-irrelevant-IO
property this engine's Morton layout provides for its own store,
applied to a third-party format.

This module builds on the in-repo layered codec
(``laszip_v3.decompress_chunk14`` — COPC chunks are ordinary layered
chunks): ``read_copc_info``/``copc_nodes`` parse the index,
``copc_query_bbox`` decodes only intersecting nodes, ``copc_to_df``
runs the same per-file decode distributed (binaryFile + mapInPandas,
bbox pushed into every task). The writer produces spec-shaped
fixtures (octree split by a max-node-point budget, one hierarchy
page); as with the other codec modules, external-tool interop is not
validatable in this container — the tested contract is structural
fidelity + exact round-trips + pruning behavior.

Scale: one COPC tile decodes node-parallel (chunks are independent
after their raw seed), and a 100 TB collection of tiles decodes
file-parallel via binaryFile partitioning with the bbox cutting both
across files (header-only rejects) and within files (hierarchy
pruning).
"""

from __future__ import annotations

import struct

import numpy as np

COPC_USER_ID = b"copc".ljust(16, b"\x00")
COPC_INFO_RECORD = 1
COPC_HIER_RECORD = 1000
_VLR_HDR = struct.Struct("<H16sHH32s")
_EVLR_HDR = struct.Struct("<H16sHQ32s")
#: copc info layout (spec): center xyz, halfsize, spacing,
#: root_hier_offset, root_hier_size, gpstime min/max, 11 reserved
_INFO = struct.Struct("<5d 2q 2d 11q")  # 160 bytes
_ENTRY = struct.Struct("<iiii q i i")  # 32 bytes
assert _INFO.size == 160 and _ENTRY.size == 32


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------


def read_copc_info(buf: bytes) -> dict | None:
    """The copc info VLR (None when the file is not COPC): octree cube
    center/halfsize, point spacing, root hierarchy page location."""
    from .las import parse_las_header

    hdr = parse_las_header(buf)
    pos = hdr["header_size"]
    limit = min(hdr["offset_to_points"], len(buf))
    while pos + _VLR_HDR.size <= limit:
        _, user_id, record_id, rec_len, _ = _VLR_HDR.unpack(
            buf[pos:pos + _VLR_HDR.size]
        )
        pos += _VLR_HDR.size
        if user_id == COPC_USER_ID and record_id == COPC_INFO_RECORD:
            f = _INFO.unpack(buf[pos:pos + 160])
            return {
                "center": (f[0], f[1], f[2]),
                "halfsize": f[3],
                "spacing": f[4],
                "root_hier_offset": f[5],
                "root_hier_size": f[6],
                "header": hdr,
            }
        pos += rec_len
    return None


def _read_page(buf: bytes, offset: int, size: int) -> list[dict]:
    if offset + size > len(buf):
        raise ValueError("copc hierarchy page out of range")
    n = size // _ENTRY.size
    out = []
    for i in range(n):
        lvl, x, y, z, off, nbytes, cnt = _ENTRY.unpack(
            buf[offset + 32 * i:offset + 32 * (i + 1)]
        )
        out.append(
            {
                "key": (lvl, x, y, z),
                "offset": off,
                "byte_size": nbytes,
                "point_count": cnt,
            }
        )
    return out


def copc_nodes(buf: bytes, info: dict | None = None) -> list[dict]:
    """Every octree DATA node (hierarchy sub-pages resolved), each
    with its world-space cube attached."""
    if info is None:
        info = read_copc_info(buf)
    if info is None:
        raise ValueError("not a COPC file (no copc info VLR)")
    nodes: list[dict] = []
    pages = [(info["root_hier_offset"], info["root_hier_size"])]
    seen = set()
    while pages:
        off, size = pages.pop()
        if (off, size) in seen:
            raise ValueError("copc hierarchy page cycle")
        seen.add((off, size))
        for e in _read_page(buf, int(off), int(size)):
            if e["point_count"] == -1:
                pages.append((e["offset"], e["byte_size"]))
            elif e["point_count"] > 0:
                e["cube"] = node_cube(info, e["key"])
                nodes.append(e)
    return nodes


def node_cube(info: dict, key) -> tuple:
    """(xmin, ymin, zmin, xmax, ymax, zmax) of an octree node."""
    lvl, x, y, z = key
    cx, cy, cz = info["center"]
    hs = info["halfsize"]
    size = (2.0 * hs) / (1 << lvl)
    x0, y0, z0 = cx - hs, cy - hs, cz - hs
    return (
        x0 + size * x, y0 + size * y, z0 + size * z,
        x0 + size * (x + 1), y0 + size * (y + 1), z0 + size * (z + 1),
    )


def _decode_nodes(buf: bytes, hdr: dict, nodes: list[dict]) -> np.ndarray:
    from .laszip_v3 import decompress_chunk14, rows14_to_struct

    fmt = hdr["point_format"]
    rows: list = []
    for e in sorted(nodes, key=lambda e: e["offset"]):
        decompress_chunk14(buf, int(e["offset"]), e["point_count"], fmt, rows)
    return rows14_to_struct(rows, fmt)


def copc_read_all(buf: bytes) -> np.ndarray:
    """Decode every node (full-tile read)."""
    info = read_copc_info(buf)
    if info is None:
        raise ValueError("not a COPC file (no copc info VLR)")
    return _decode_nodes(buf, info["header"], copc_nodes(buf, info))


def copc_query_bbox(buf: bytes, bbox, return_stats: bool = False):
    """Points inside [xmin, xmax, ymin, ymax] (world coords) — the
    hierarchy prunes non-intersecting octree nodes BEFORE any chunk
    decodes, then the exact per-point refine runs on the survivors.
    ``return_stats`` adds (nodes_total, nodes_decoded) so callers/
    tests can observe the pruning."""
    xmin, xmax, ymin, ymax = bbox
    info = read_copc_info(buf)
    if info is None:
        raise ValueError("not a COPC file (no copc info VLR)")
    nodes = copc_nodes(buf, info)
    hit = [
        e
        for e in nodes
        if not (
            e["cube"][3] < xmin or e["cube"][0] > xmax
            or e["cube"][4] < ymin or e["cube"][1] > ymax
        )
    ]
    hdr = info["header"]
    pts = _decode_nodes(buf, hdr, hit)
    sx, sy, _ = hdr["scales"]
    ox, oy, _ = hdr["offsets"]
    gx = pts["X"] * sx + ox
    gy = pts["Y"] * sy + oy
    mask = (gx >= xmin) & (gx <= xmax) & (gy >= ymin) & (gy <= ymax)
    out = pts[mask]
    if return_stats:
        return out, (len(nodes), len(hit))
    return out


def _local_path(uri: str) -> str:
    """binaryFile path URI → local filesystem path. (In this container
    all testdata is file:-scheme; on a real cluster the ranged reads
    below would go through pyarrow.fs / the Hadoop FileSystem API
    instead of ``open`` — the task split and byte ranges are
    identical.)"""
    if uri.startswith("file:"):
        from urllib.parse import unquote, urlparse

        return unquote(urlparse(uri).path)
    return uri


def copc_file_nodes(path: str):
    """(header, info, data-nodes) via RANGED reads of *path* — the LAS
    header, the VLR region, and the hierarchy pages only (KBs), never
    the point data. The planning half of the node-distributed read: a
    100 GB tile costs each planner task a few seeks, not a full scan."""
    from .las import parse_las_header

    with open(path, "rb") as f:
        hdr = parse_las_header(f.read(512))
        f.seek(hdr["header_size"])
        vlr_buf = f.read(
            max(0, hdr["offset_to_points"] - hdr["header_size"])
        )
        info = None
        pos = 0
        while pos + _VLR_HDR.size <= len(vlr_buf):
            _, user_id, record_id, rec_len, _ = _VLR_HDR.unpack(
                vlr_buf[pos:pos + _VLR_HDR.size]
            )
            pos += _VLR_HDR.size
            if user_id == COPC_USER_ID and record_id == COPC_INFO_RECORD:
                fields = _INFO.unpack(vlr_buf[pos:pos + 160])
                info = {
                    "center": (fields[0], fields[1], fields[2]),
                    "halfsize": fields[3],
                    "spacing": fields[4],
                    "root_hier_offset": fields[5],
                    "root_hier_size": fields[6],
                    "header": hdr,
                }
                break
            pos += rec_len
        if info is None:
            raise ValueError(f"not a COPC file (no copc info VLR): {path}")
        nodes: list[dict] = []
        pages = [(info["root_hier_offset"], info["root_hier_size"])]
        seen = set()
        while pages:
            off, size = pages.pop()
            if (off, size) in seen:
                raise ValueError("copc hierarchy page cycle")
            seen.add((off, size))
            f.seek(int(off))
            page = f.read(int(size))
            for e in _read_page(page, 0, int(size)):
                if e["point_count"] == -1:
                    pages.append((e["offset"], e["byte_size"]))
                elif e["point_count"] > 0:
                    e["cube"] = node_cube(info, e["key"])
                    nodes.append(e)
        return hdr, info, nodes


def copc_nodes_df(spark, path_or_glob: str, bbox=None):
    """One row per (file, octree node) that survives bbox pruning —
    the distributable work-list behind ``copc_to_df(distribute=
    'nodes')``. Planning is itself distributed (a task per file
    group); only headers/hierarchy bytes are read."""
    import pandas as pd

    paths = spark.read.format("binaryFile").load(path_or_glob).select(
        "path"
    )

    def _plan(batches):
        for pdf in batches:
            rows = []
            for uri in pdf["path"]:
                p = _local_path(uri)
                hdr, info, nodes = copc_file_nodes(p)
                if bbox is not None:
                    fxmin, fxmax, fymin, fymax = hdr["bbox"][:4]
                    if (
                        fxmax < bbox[0] or fxmin > bbox[1]
                        or fymax < bbox[2] or fymin > bbox[3]
                    ):
                        continue
                    nodes = [
                        e
                        for e in nodes
                        if not (
                            e["cube"][3] < bbox[0]
                            or e["cube"][0] > bbox[1]
                            or e["cube"][4] < bbox[2]
                            or e["cube"][1] > bbox[3]
                        )
                    ]
                sx, sy, sz = hdr["scales"]
                ox, oy, oz = hdr["offsets"]
                for e in nodes:
                    rows.append(
                        (
                            p, int(e["offset"]), int(e["byte_size"]),
                            int(e["point_count"]), hdr["point_format"],
                            sx, sy, sz, ox, oy, oz,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "offset", "byte_size", "point_count", "fmt",
                    "sx", "sy", "sz", "ox", "oy", "oz",
                ],
            )

    schema = (
        "path string, offset long, byte_size long, point_count long,"
        " fmt int, sx double, sy double, sz double,"
        " ox double, oy double, oz double"
    )
    return paths.mapInPandas(_plan, schema=schema)


#: attribute columns `copc_to_df(attrs=...)` can surface next to xyz
#: (name → (struct field, spark type)); the reference's S2 attribute
#: reads applied to the COPC source
COPC_ATTRS = {
    "intensity": ("intensity", "int"),
    "classification": ("classification", "int"),
    "returns": ("returns", "int"),
    "flags": ("flags", "int"),
    "user_data": ("user_data", "int"),
    "scan_angle": ("scan_angle", "int"),
    "point_source_id": ("point_source_id", "int"),
    "gps_time": ("gps_time", "double"),
}


def _attr_schema(attrs) -> str:
    base = "x double, y double, z double"
    if not attrs:
        return base
    for a in attrs:
        if a not in COPC_ATTRS:
            raise ValueError(
                f"unknown COPC attribute {a!r} (supported: "
                f"{sorted(COPC_ATTRS)})"
            )
    return base + ", " + ", ".join(
        f"{a} {COPC_ATTRS[a][1]}" for a in attrs
    )


def _attr_frame(pts, gx, gy, gz, attrs, mask=None):
    import pandas as pd

    data = {"x": gx, "y": gy, "z": gz}
    for a in attrs or ():
        field, typ = COPC_ATTRS[a]
        col = pts[field] if mask is None else pts[field][mask]
        data[a] = col.astype("float64" if typ == "double" else "int64")
    return pd.DataFrame(data)


def copc_to_df(spark, path_or_glob: str, bbox=None,
               distribute: str = "files", target_tasks: int | None = None,
               attrs: tuple = ()):
    """Distributed COPC read. ``attrs`` appends attribute columns
    (``COPC_ATTRS``) to the (x, y, z) output — intensity,
    classification, returns, gps_time, … — decoded from the same
    chunks at no extra IO.

    ``distribute='files'`` (default): binaryFile rows → per-file
    hierarchy-pruned decode in mapInPandas; ``bbox`` pushes the window
    into every task (and rejects whole files by their header bbox
    before touching the hierarchy). Right when tiles are many and
    modest.

    ``distribute='nodes'``: two-stage — a planning pass emits one row
    per intersecting (file, octree-node) byte range (ranged reads,
    headers + hierarchy only), the rows repartition across
    ``target_tasks`` (default: the session's default parallelism),
    and each decode task seeks straight to its chunks. COPC chunks
    are self-contained after their raw seed record, so nodes decode
    independently — this is the shape a single 100 GB tile needs,
    where file-parallelism gives exactly one task."""
    import pandas as pd

    if distribute == "nodes":
        node_rows = copc_nodes_df(spark, path_or_glob, bbox=bbox)
        n_tasks = target_tasks or spark.sparkContext.defaultParallelism
        node_rows = node_rows.repartition(n_tasks)

        def _decode(batches):
            from .laszip_v3 import decompress_chunk14, rows14_to_struct

            for pdf in batches:
                for path, grp in pdf.groupby("path", sort=False):
                    with open(path, "rb") as f:
                        for r in grp.itertuples(index=False):
                            f.seek(int(r.offset))
                            chunk = f.read(int(r.byte_size))
                            rows: list = []
                            decompress_chunk14(
                                chunk, 0, int(r.point_count),
                                int(r.fmt), rows,
                            )
                            pts = rows14_to_struct(rows, int(r.fmt))
                            gx = pts["X"] * r.sx + r.ox
                            gy = pts["Y"] * r.sy + r.oy
                            gz = pts["Z"] * r.sz + r.oz
                            m = None
                            if bbox is not None:
                                m = (
                                    (gx >= bbox[0]) & (gx <= bbox[1])
                                    & (gy >= bbox[2]) & (gy <= bbox[3])
                                )
                                gx, gy, gz = gx[m], gy[m], gz[m]
                            yield _attr_frame(pts, gx, gy, gz, attrs, m)

        return node_rows.mapInPandas(_decode, schema=_attr_schema(attrs))
    if distribute != "files":
        raise ValueError(
            f"distribute must be 'files' or 'nodes', got {distribute!r}"
        )

    df = spark.read.format("binaryFile").load(path_or_glob)

    def _parse(batches):
        from .las import parse_las_header

        for pdf in batches:
            for content in pdf["content"]:
                buf = bytes(content)
                if bbox is not None:
                    h = parse_las_header(buf)
                    fxmin, fxmax, fymin, fymax = h["bbox"][:4]
                    if (
                        fxmax < bbox[0] or fxmin > bbox[1]
                        or fymax < bbox[2] or fymin > bbox[3]
                    ):
                        continue
                    pts = copc_query_bbox(buf, bbox)
                    h2 = h
                else:
                    pts = copc_read_all(buf)
                    h2 = parse_las_header(buf)
                sx, sy, sz = h2["scales"]
                ox, oy, oz = h2["offsets"]
                yield _attr_frame(
                    pts,
                    pts["X"] * sx + ox,
                    pts["Y"] * sy + oy,
                    pts["Z"] * sz + oz,
                    attrs,
                )

    return df.select("content").mapInPandas(
        _parse, schema=_attr_schema(attrs)
    )


# ---------------------------------------------------------------------------
# writer (octree build + hierarchy page) — fixture/export scale
# ---------------------------------------------------------------------------


def _build_octree(
    idx: np.ndarray,
    gx: np.ndarray,
    gy: np.ndarray,
    gz: np.ndarray,
    key,
    cube,
    max_node_points: int,
    out: dict,
) -> None:
    """Recursive split: a node holding more than the budget pushes ALL
    its points down to its 8 children (internal nodes stay empty —
    valid COPC; real producers keep a thinned sample per level)."""
    if len(idx) <= max_node_points:
        out[key] = idx
        return
    x0, y0, z0, x1, y1, z1 = cube
    mx, my, mz = (x0 + x1) / 2, (y0 + y1) / 2, (z0 + z1) / 2
    out[key] = idx[:0]
    lvl, kx, ky, kz = key
    for b in range(8):
        bx, by, bz = b & 1, (b >> 1) & 1, (b >> 2) & 1
        m = (
            ((gx[idx] >= mx) == bool(bx))
            & ((gy[idx] >= my) == bool(by))
            & ((gz[idx] >= mz) == bool(bz))
        )
        sub = idx[m]
        if len(sub) == 0:
            continue
        child_cube = (
            x0 if bx == 0 else mx, y0 if by == 0 else my,
            z0 if bz == 0 else mz,
            mx if bx == 0 else x1, my if by == 0 else y1,
            mz if bz == 0 else z1,
        )
        _build_octree(
            sub, gx, gy, gz,
            (lvl + 1, 2 * kx + bx, 2 * ky + by, 2 * kz + bz),
            child_cube, max_node_points, out,
        )


def write_copc(
    pts: np.ndarray,
    point_format: int = 6,
    scales=(0.001, 0.001, 0.001),
    offsets=(0.0, 0.0, 0.0),
    max_node_points: int = 2000,
) -> bytes:
    """Full COPC file from a ``las.point_dtype(fmt)`` structured array:
    octree-chunked layered LAZ + copc info VLR + one hierarchy EVLR.
    Driver-side octree build (numpy) — export/fixture scale; a
    distributed writer would shuffle by voxel key first."""
    from .las import _HEADER14_SIZE, _HEADER14_TAIL_FMT, _HEADER_FMT
    from .laszip_v3 import (
        FORMAT14_ITEMS,
        Point14,
        build_laszip_vlr14,
        compress_chunk14,
    )

    if point_format not in FORMAT14_ITEMS:
        raise ValueError(f"COPC needs formats 6-8, got {point_format}")
    n = len(pts)
    if n == 0:
        raise ValueError("COPC write needs at least one point")
    gx = pts["X"] * scales[0] + offsets[0]
    gy = pts["Y"] * scales[1] + offsets[1]
    gz = pts["Z"] * scales[2] + offsets[2]
    mins = (gx.min(), gy.min(), gz.min())
    maxs = (gx.max(), gy.max(), gz.max())
    # the COPC cube is the CUBE (equal halfsize) around the extent
    center = tuple((a + b) / 2 for a, b in zip(mins, maxs))
    halfsize = max(b - a for a, b in zip(mins, maxs)) / 2 or 1.0
    halfsize *= 1.0 + 1e-9  # open upper edge: max coords stay inside
    cube = (
        center[0] - halfsize, center[1] - halfsize, center[2] - halfsize,
        center[0] + halfsize, center[1] + halfsize, center[2] + halfsize,
    )
    tree: dict = {}
    _build_octree(
        np.arange(n), gx, gy, gz, (0, 0, 0, 0), cube,
        max_node_points, tree,
    )

    gps_u64 = pts["gps_time"].view(np.uint64)

    def _rows(idx):
        return [
            Point14(
                int(pts["X"][i]), int(pts["Y"][i]), int(pts["Z"][i]),
                int(pts["intensity"][i]), int(pts["returns"][i]) or 0x11,
                int(pts["flags"][i]), int(pts["classification"][i]),
                int(pts["user_data"][i]), int(pts["scan_angle"][i]),
                int(pts["point_source_id"][i]), int(gps_u64[i]),
            )
            for i in idx
        ]

    chunks: list[tuple] = []  # (key, n_points, bytes)
    for key in sorted(tree):
        idx = tree[key]
        if len(idx) == 0:
            continue
        rg = nr = None
        if point_format in (7, 8):
            rg = [
                (int(pts["red"][i]), int(pts["green"][i]),
                 int(pts["blue"][i]))
                for i in idx
            ]
        if point_format == 8:
            nr = [int(pts["nir"][i]) for i in idx]
        chunks.append(
            (key, len(idx), compress_chunk14(_rows(idx), point_format, rg, nr))
        )

    record_len = sum(sz for _, sz, _ in FORMAT14_ITEMS[point_format])
    laszip_vlr = build_laszip_vlr14(point_format, chunk_size=0x7FFFFFFF)
    copc_vlr_hdr = _VLR_HDR.pack(
        0, COPC_USER_ID, COPC_INFO_RECORD, 160,
        b"copc info".ljust(32, b"\x00"),
    )
    offset_to_points = (
        _HEADER14_SIZE + len(copc_vlr_hdr) + 160 + len(laszip_vlr)
    )
    pos = offset_to_points + 8  # skip the chunk-table-offset slot
    entries = []
    chunk_blob = bytearray()
    for key, cnt, blob in chunks:
        entries.append((key, pos, len(blob), cnt))
        chunk_blob += blob
        pos += len(blob)
    chunk_table_offset = pos
    # minimal chunk table (the hierarchy is the real index; decoders
    # here never read this, but the slot layout stays LAZ-shaped)
    from .laszip_codec import _write_chunk_table

    table = _write_chunk_table([len(b) for _, _, b in chunks])
    evlr_start = chunk_table_offset + len(table)
    hier_payload = b"".join(
        _ENTRY.pack(*key, off, nbytes, cnt)
        for key, off, nbytes, cnt in entries
    )
    evlr = _EVLR_HDR.pack(
        0, COPC_USER_ID, COPC_HIER_RECORD, len(hier_payload),
        b"copc hierarchy".ljust(32, b"\x00"),
    ) + hier_payload
    root_hier_offset = evlr_start + _EVLR_HDR.size
    info = _INFO.pack(
        center[0], center[1], center[2], halfsize,
        0.0,  # spacing (not tracked by this writer)
        root_hier_offset, len(hier_payload),
        0.0, 0.0,  # gpstime min/max (not tracked)
        *([0] * 11),
    )
    header = struct.pack(
        _HEADER_FMT,
        b"LASF", 0, 0b10000, 0, 0, 0, b"\x00" * 8,  # GE bit4: wkt-ish
        1, 4,
        b"lasdb_spark".ljust(32, b"\x00"),
        b"lasdb_spark copc".ljust(32, b"\x00"),
        1, 2026,
        _HEADER14_SIZE,
        offset_to_points,
        2,  # copc info + laszip
        point_format | 0x80,
        record_len,
        0,
        0, 0, 0, 0, 0,
        float(scales[0]), float(scales[1]), float(scales[2]),
        float(offsets[0]), float(offsets[1]), float(offsets[2]),
        float(maxs[0]), float(mins[0]),
        float(maxs[1]), float(mins[1]),
        float(maxs[2]), float(mins[2]),
    ) + struct.pack(_HEADER14_TAIL_FMT, 0, evlr_start, 1, n, *([0] * 15))
    return b"".join(
        [
            header, copc_vlr_hdr, info, laszip_vlr,
            struct.pack("<q", chunk_table_offset), bytes(chunk_blob),
            table, evlr,
        ]
    )


def df_to_copc_tiles(
    df,
    out_dir: str,
    tile_size: float = 500.0,
    scales=(0.001, 0.001, 0.001),
    max_node_points: int = 2000,
):
    """Distributed COPC EXPORT: shuffle points to spatial tiles
    (floor(x / tile_size), floor(y / tile_size)) and let each task
    build one complete COPC file — octree, hierarchy page and layered
    chunks included — for its tile. Returns a manifest DataFrame
    (path, n_points, tx, ty). The write side of the source: a 100 TB
    cloud exports as one shuffle + embarrassingly-parallel per-tile
    compression, and the resulting tileset answers bbox queries with
    file-level pruning (header rejects) before any hierarchy walk.

    Tasks write through the local filesystem path ``out_dir`` — in
    this container that's the story; on a real cluster the same task
    body would target a shared/object store via pyarrow.fs."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    from .las import point_dtype

    os.makedirs(out_dir, exist_ok=True)
    keyed = df.select(
        F.floor(F.col("x") / tile_size).cast("long").alias("tx"),
        F.floor(F.col("y") / tile_size).cast("long").alias("ty"),
        "x",
        "y",
        "z",
    )

    def _write(key, pdf):
        tx, ty = int(key[0]), int(key[1])
        arr = np.zeros(len(pdf), dtype=point_dtype(6))
        arr["X"] = np.round(pdf["x"].to_numpy() / scales[0]).astype(np.int64)
        arr["Y"] = np.round(pdf["y"].to_numpy() / scales[1]).astype(np.int64)
        arr["Z"] = np.round(pdf["z"].to_numpy() / scales[2]).astype(np.int64)
        arr["returns"] = 0x11
        arr["gps_time"] = np.arange(len(pdf), dtype=np.float64)
        path = os.path.join(out_dir, f"tile_{tx}_{ty}.copc.laz")
        with open(path, "wb") as f:
            f.write(
                write_copc(arr, 6, scales, max_node_points=max_node_points)
            )
        return pd.DataFrame(
            [(path, len(pdf), tx, ty)],
            columns=["path", "n_points", "tx", "ty"],
        )

    return keyed.groupBy("tx", "ty").applyInPandas(
        _write, schema="path string, n_points long, tx long, ty long"
    )
