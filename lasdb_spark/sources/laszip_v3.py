"""Pure-python layered LASzip (compressor 3) for LAS 1.4 formats 6-8.

Modern AHN4+ tiles ship LAS 1.4 point format 6 inside the LAYERED
chunked LAZ encoding (laszip item version 3) — the first real-world
input a user hits that the legacy pointwise codec
(``laszip_codec.py``, formats 0-3) cannot read. The reference reads
such tiles through laspy (pipeline/import_data.py:27-29); this module
is the dependency-free fallback, exactly like the v2 codec is for
legacy LAZ.

Layered layout (public LASzip 3.x format description, laszip.org):

- the laszip VLR carries compressor=3 (chunked LAYERED) and items
  with version 3: POINT14 (type 10, 30 bytes), RGB14 (11, 6),
  RGBNIR14 (12, 8);
- each chunk stores the FIRST point raw (the seed), then one u32 byte
  count per layer, then the concatenated per-layer arithmetic-coded
  byte streams — each field family (XY, Z, classification, flags,
  intensity, scan angle, user data, point source, GPS time, RGB, NIR)
  is its own independently-decodable stream;
- the codec keeps FOUR model contexts selected by the scanner
  channel; a channel switch is signalled in the changed-values symbol
  and the new context resumes (or is seeded from the previous
  context's last point on first use).

Within each layer this implementation reuses the same public building
blocks as the v2 codec (Said's range coder, the k-bit
IntegerCompressor, streaming median-of-5 XY prediction, the
multi-sequence GPS-time predictor) wired per the v3 design: the
changed-values bit layout, per-context model banks, and
written-only-when-changed scan-angle/point-source/GPS layers. Exact
bit-level interop with external laszip binaries is NOT validated in
this container (none exists here — same caveat as the v2 module
docstring): the tested contract is structural fidelity plus exact
round-trips, with laspy[lazrs] remaining the authoritative fast path
when installed.

Performance: sequential model-adaptive python — the fallback, not the
scale path. Parallelism at 100 TB comes from Spark file-per-task
partitioning (sources/las.py mapInPandas), and layered chunks decode
independently after the seed point, so a chunk-parallel variant is
possible if ever needed.
"""

from __future__ import annotations

import struct

import numpy as np

from .laszip_codec import (
    ArithmeticDecoder,
    ArithmeticEncoder,
    ArithmeticModel,
    GpsTime11V2,
    IntegerCompressor,
    NUMBER_RETURN_LEVEL,
    NUMBER_RETURN_MAP,
    Rgb12V2,
    StreamingMedian5,
    _i32,
)

ITEM_POINT14, ITEM_RGB14, ITEM_RGBNIR14 = 10, 11, 12
ITEM_WAVEPACKET14 = 13
COMPRESSOR_LAYERED_CHUNKED = 3

#: laszip item lists per LAS 1.4 point format (item version 3);
#: waveform formats 9/10 append WAVEPACKET14 (type 13, 29 bytes) —
#: pf10 carries RGB+NIR per the LAS 1.4 spec (pf9 + RGB + NIR)
FORMAT14_ITEMS = {
    6: [(ITEM_POINT14, 30, 3)],
    7: [(ITEM_POINT14, 30, 3), (ITEM_RGB14, 6, 3)],
    8: [(ITEM_POINT14, 30, 3), (ITEM_RGBNIR14, 8, 3)],
    9: [(ITEM_POINT14, 30, 3), (ITEM_WAVEPACKET14, 29, 3)],
    10: [
        (ITEM_POINT14, 30, 3),
        (ITEM_RGBNIR14, 8, 3),
        (ITEM_WAVEPACKET14, 29, 3),
    ],
}

#: POINT14 layer order (fixed; one u32 size + one byte stream each)
P14_LAYERS = (
    "xy", "z", "classification", "flags", "intensity",
    "scan_angle", "user_data", "point_source", "gps_time",
)


class Point14:
    """One POINT14 record as mutable plain fields (gps as raw u64)."""

    __slots__ = (
        "x", "y", "z", "intensity", "returns", "flags",
        "classification", "user_data", "scan_angle",
        "point_source_id", "gps_u64",
    )

    FMT = struct.Struct("<iiiHBBBBhHQ")

    def __init__(self, x=0, y=0, z=0, intensity=0, returns=0x11,
                 flags=0, classification=0, user_data=0, scan_angle=0,
                 point_source_id=0, gps_u64=0):
        self.x = x
        self.y = y
        self.z = z
        self.intensity = intensity
        self.returns = returns
        self.flags = flags
        self.classification = classification
        self.user_data = user_data
        self.scan_angle = scan_angle
        self.point_source_id = point_source_id
        self.gps_u64 = gps_u64

    def pack(self) -> bytes:
        return self.FMT.pack(
            self.x, self.y, self.z, self.intensity, self.returns,
            self.flags, self.classification, self.user_data,
            self.scan_angle, self.point_source_id, self.gps_u64,
        )

    @classmethod
    def unpack(cls, raw: bytes) -> "Point14":
        return cls(*cls.FMT.unpack(raw))

    def copy(self) -> "Point14":
        return Point14(
            self.x, self.y, self.z, self.intensity, self.returns,
            self.flags, self.classification, self.user_data,
            self.scan_angle, self.point_source_id, self.gps_u64,
        )

    @property
    def scanner_channel(self) -> int:
        return (self.flags >> 4) & 3


class _P14Context:
    """Model bank for one scanner channel (created on first use)."""

    def __init__(self, coders: dict, compress: bool, seed: Point14):
        c = coders
        self.compress = compress
        self.m_changed_values = [
            ArithmeticModel(128, compress) for _ in range(8)
        ]
        self.m_scanner_channel = ArithmeticModel(3, compress)
        self.m_number_of_returns = [None] * 16
        self.m_return_number = [None] * 16
        self.ic_dx = IntegerCompressor(c["xy"], 32, 2)
        self.ic_dy = IntegerCompressor(c["xy"], 32, 22)
        self.ic_z = IntegerCompressor(c["z"], 32, 20)
        self.m_classification = [None] * 256
        self.m_flags = [None] * 64
        self.m_user_data = [None] * 256
        self.ic_intensity = IntegerCompressor(c["intensity"], 16, 4)
        self.ic_scan_angle = IntegerCompressor(c["scan_angle"], 16, 2)
        self.ic_point_source = IntegerCompressor(c["point_source"], 16)
        self.gps = GpsTime11V2(c["gps_time"])
        self.gps.init(seed.gps_u64)
        self.last_x_diff_median5 = [StreamingMedian5() for _ in range(16)]
        self.last_y_diff_median5 = [StreamingMedian5() for _ in range(16)]
        self.last_intensity = [seed.intensity] * 4
        self.last_height = [seed.z] * 8
        self.last = seed.copy()
        self.last_gps_changed = False

    def model(self, bank, idx, size=256):
        if bank[idx] is None:
            bank[idx] = ArithmeticModel(size, self.compress)
        return bank[idx]


class Point14V3:
    """POINT14 item, version 3 layered codec.

    Encode: construct with no blobs, ``init(seed)``, ``write(pt)``
    per point, then ``layer_bytes()``. Decode: construct with the
    chunk's layer blobs, ``init(seed)``, ``read()`` per point.
    """

    def __init__(self, layer_blobs: list[bytes] | None = None):
        self.compress = layer_blobs is None
        if self.compress:
            self.coders = {name: ArithmeticEncoder() for name in P14_LAYERS}
        else:
            self.coders = {
                name: ArithmeticDecoder(blob)
                for name, blob in zip(P14_LAYERS, layer_blobs)
            }
        self.ctxs: list[_P14Context | None] = [None, None, None, None]
        self.cur = 0

    def init(self, seed: Point14):
        self.cur = seed.scanner_channel
        self.ctxs[self.cur] = _P14Context(
            self.coders, self.compress, seed
        )

    def layer_bytes(self) -> list[bytes]:
        return [self.coders[name].done() for name in P14_LAYERS]

    def _switch(self, new_c: int, seed: Point14):
        if self.ctxs[new_c] is None:
            self.ctxs[new_c] = _P14Context(
                self.coders, self.compress, seed
            )
        self.cur = new_c

    # --- encode ------------------------------------------------------
    def write(self, pt: Point14):
        ctx = self.ctxs[self.cur]
        c = self.coders
        last = ctx.last
        # lpr context comes from the PRE-switch context's last point —
        # the decoder reads changed_values before it can switch
        last_r, last_n = last.returns & 0xF, (last.returns >> 4) & 0xF
        lpr = (
            (1 if last_r == 1 else 0)
            | (2 if last_r >= last_n else 0)
            | (4 if ctx.last_gps_changed else 0)
        )
        sc = pt.scanner_channel
        switch = sc != self.cur
        # all delta bits are computed against the POST-switch last:
        # the target context's own last point when it already exists,
        # else the current last that will seed it
        if switch and self.ctxs[sc] is not None:
            eff_last = self.ctxs[sc].last
        else:
            eff_last = last
        eff_r = eff_last.returns & 0xF
        eff_n = (eff_last.returns >> 4) & 0xF
        r, n = pt.returns & 0xF, (pt.returns >> 4) & 0xF
        gps_changed = pt.gps_u64 != eff_last.gps_u64
        if r == eff_r:
            rcode = 0
        elif r == ((eff_r + 1) & 15):
            rcode = 1
        elif r == ((eff_r - 1) & 15):
            rcode = 2
        else:
            rcode = 3
        changed = (
            rcode
            | ((n != eff_n) << 2)
            | ((pt.scan_angle != eff_last.scan_angle) << 3)
            | (gps_changed << 4)
            | ((pt.point_source_id != eff_last.point_source_id) << 5)
            | (switch << 6)
        )
        c["xy"].encode_symbol(ctx.m_changed_values[lpr], changed)
        if switch:
            c["xy"].encode_symbol(
                ctx.m_scanner_channel, ((sc - self.cur) & 3) - 1
            )
            self._switch(sc, last)
            ctx = self.ctxs[self.cur]
            last = ctx.last
            last_r, last_n = eff_r, eff_n
        if changed & 4:
            c["xy"].encode_symbol(
                ctx.model(ctx.m_number_of_returns, last_n, 16), n
            )
        if rcode == 3:
            c["xy"].encode_symbol(
                ctx.model(ctx.m_return_number, last_r, 16), r
            )
        m = NUMBER_RETURN_MAP[min(n, 7)][min(r, 7)]
        lvl = NUMBER_RETURN_LEVEL[min(n, 7)][min(r, 7)]
        # XY layer: median-predicted deltas (same machinery as v2)
        median = ctx.last_x_diff_median5[m].get()
        diff = _i32(pt.x - last.x)
        ctx.ic_dx.compress(median, diff, 1 if n == 1 else 0)
        ctx.last_x_diff_median5[m].add(diff)
        k_bits = ctx.ic_dx.k
        median = ctx.last_y_diff_median5[m].get()
        diff = _i32(pt.y - last.y)
        ydx = (1 if n == 1 else 0) + (
            (k_bits & 0xFE) if k_bits < 20 else 20
        )
        ctx.ic_dy.compress(median, diff, ydx)
        ctx.last_y_diff_median5[m].add(diff)
        # Z layer: predicted from the last height at this return level
        k_bits = (ctx.ic_dx.k + ctx.ic_dy.k) // 2
        zdx = (k_bits & 0xFE) if k_bits < 18 else 18
        ctx.ic_z.compress(ctx.last_height[lvl], pt.z, zdx)
        ctx.last_height[lvl] = pt.z
        # classification / flags / user_data layers (every point)
        c["classification"].encode_symbol(
            ctx.model(ctx.m_classification, last.classification),
            pt.classification,
        )
        # 6-bit flags-without-channel: bits 0-3 classification flags,
        # bits 4-5 scan direction + edge (channel rides in
        # changed_values)
        fl6 = (pt.flags & 0x0F) | ((pt.flags >> 2) & 0x30)
        fl6_last = (last.flags & 0x0F) | ((last.flags >> 2) & 0x30)
        c["flags"].encode_symbol(
            ctx.model(ctx.m_flags, fl6_last, 64), fl6
        )
        c["user_data"].encode_symbol(
            ctx.model(ctx.m_user_data, last.user_data), pt.user_data
        )
        # intensity layer, context = return-position class
        cpr = (1 if r == 1 else 0) + (2 if r >= n else 0)
        ctx.ic_intensity.compress(
            ctx.last_intensity[cpr], pt.intensity, cpr
        )
        ctx.last_intensity[cpr] = pt.intensity
        # conditional layers
        if changed & 8:
            ctx.ic_scan_angle.compress(
                last.scan_angle & 0xFFFF,
                pt.scan_angle & 0xFFFF,
                1 if gps_changed else 0,
            )
        if changed & 32:
            ctx.ic_point_source.compress(
                last.point_source_id, pt.point_source_id
            )
        if gps_changed:
            ctx.gps.write(pt.gps_u64)
        ctx.last_gps_changed = gps_changed
        ctx.last = pt.copy()

    # --- decode ------------------------------------------------------
    def read(self) -> Point14:
        ctx = self.ctxs[self.cur]
        c = self.coders
        last = ctx.last
        last_r, last_n = last.returns & 0xF, (last.returns >> 4) & 0xF
        lpr = (
            (1 if last_r == 1 else 0)
            | (2 if last_r >= last_n else 0)
            | (4 if ctx.last_gps_changed else 0)
        )
        changed = c["xy"].decode_symbol(ctx.m_changed_values[lpr])
        if changed & 64:
            diff = c["xy"].decode_symbol(ctx.m_scanner_channel)
            sc = (self.cur + diff + 1) & 3
            self._switch(sc, last)
            ctx = self.ctxs[self.cur]
            last = ctx.last
            last_r, last_n = last.returns & 0xF, (last.returns >> 4) & 0xF
        else:
            sc = self.cur
        if changed & 4:
            n = c["xy"].decode_symbol(
                ctx.model(ctx.m_number_of_returns, last_n, 16)
            )
        else:
            n = last_n
        rcode = changed & 3
        if rcode == 0:
            r = last_r
        elif rcode == 1:
            r = (last_r + 1) & 15
        elif rcode == 2:
            r = (last_r - 1) & 15
        else:
            r = c["xy"].decode_symbol(
                ctx.model(ctx.m_return_number, last_r, 16)
            )
        m = NUMBER_RETURN_MAP[min(n, 7)][min(r, 7)]
        lvl = NUMBER_RETURN_LEVEL[min(n, 7)][min(r, 7)]
        pt = last.copy()
        pt.returns = r | (n << 4)
        median = ctx.last_x_diff_median5[m].get()
        diff = _i32(ctx.ic_dx.decompress(median, 1 if n == 1 else 0))
        pt.x = _i32(last.x + diff)
        ctx.last_x_diff_median5[m].add(diff)
        k_bits = ctx.ic_dx.k
        median = ctx.last_y_diff_median5[m].get()
        ydx = (1 if n == 1 else 0) + (
            (k_bits & 0xFE) if k_bits < 20 else 20
        )
        diff = _i32(ctx.ic_dy.decompress(median, ydx))
        pt.y = _i32(last.y + diff)
        ctx.last_y_diff_median5[m].add(diff)
        k_bits = (ctx.ic_dx.k + ctx.ic_dy.k) // 2
        zdx = (k_bits & 0xFE) if k_bits < 18 else 18
        pt.z = _i32(ctx.ic_z.decompress(ctx.last_height[lvl], zdx))
        ctx.last_height[lvl] = pt.z
        pt.classification = c["classification"].decode_symbol(
            ctx.model(ctx.m_classification, last.classification)
        )
        fl6_last = (last.flags & 0x0F) | ((last.flags >> 2) & 0x30)
        fl6 = c["flags"].decode_symbol(
            ctx.model(ctx.m_flags, fl6_last, 64)
        )
        pt.flags = (fl6 & 0x0F) | ((fl6 & 0x30) << 2) | (sc << 4)
        pt.user_data = c["user_data"].decode_symbol(
            ctx.model(ctx.m_user_data, last.user_data)
        )
        cpr = (1 if r == 1 else 0) + (2 if r >= n else 0)
        pt.intensity = ctx.ic_intensity.decompress(
            ctx.last_intensity[cpr], cpr
        )
        ctx.last_intensity[cpr] = pt.intensity
        gps_changed = bool(changed & 16)
        if changed & 8:
            v = ctx.ic_scan_angle.decompress(
                last.scan_angle & 0xFFFF, 1 if gps_changed else 0
            )
            pt.scan_angle = v - 65536 if v >= 32768 else v
        if changed & 32:
            pt.point_source_id = ctx.ic_point_source.decompress(
                last.point_source_id
            )
        if gps_changed:
            pt.gps_u64 = ctx.gps.read()
        ctx.last_gps_changed = gps_changed
        ctx.last = pt.copy()
        return pt.copy()


# ---------------------------------------------------------------------------
# RGB14 / RGBNIR14 (item version 3): RGB layer + optional NIR layer
# ---------------------------------------------------------------------------

RGB_LAYERS = ("rgb",)
RGBNIR_LAYERS = ("rgb", "nir")


class Rgb14V3:
    """RGB14 v3: the v2 RGB channel model in its own layer stream;
    RGBNIR14 adds a second layer with a 16-bit corrector for NIR."""

    def __init__(self, with_nir: bool,
                 layer_blobs: list[bytes] | None = None):
        self.with_nir = with_nir
        names = RGBNIR_LAYERS if with_nir else RGB_LAYERS
        self.compress = layer_blobs is None
        if self.compress:
            self.coders = {n: ArithmeticEncoder() for n in names}
        else:
            self.coders = {
                n: ArithmeticDecoder(b) for n, b in zip(names, layer_blobs)
            }
        self.names = names
        self.rgb = Rgb12V2(self.coders["rgb"])
        if with_nir:
            self.ic_nir = IntegerCompressor(self.coders["nir"], 16)
        self.last_nir = 0

    def init(self, rgb, nir: int | None):
        self.rgb.init(tuple(rgb))
        if self.with_nir:
            self.last_nir = int(nir)

    def layer_bytes(self) -> list[bytes]:
        return [self.coders[n].done() for n in self.names]

    def write(self, rgb, nir: int | None):
        self.rgb.write(tuple(rgb))
        if self.with_nir:
            self.ic_nir.compress(self.last_nir, int(nir))
            self.last_nir = int(nir)

    def read(self):
        rgb = self.rgb.read()
        nir = None
        if self.with_nir:
            nir = self.ic_nir.decompress(self.last_nir)
            self.last_nir = nir
        return rgb, nir


# ---------------------------------------------------------------------------
# WAVEPACKET14 (item version 3): waveform packet pointers, own layer
# ---------------------------------------------------------------------------

WAVE_LAYERS = ("wavepacket",)

#: raw-bytes layout of one wavepacket record (29 bytes): descriptor
#: index u1, byte offset u8, packet size u4, return-point f4, dx/dy/dz
#: f4. In-memory the floats ride as their u32 bit patterns so the
#: integer correctors round-trip them bit-exactly.
_WP_FMT = struct.Struct("<BQI4I")
_U32 = 0xFFFFFFFF
_U64 = 0xFFFFFFFFFFFFFFFF


class Wavepacket14V3:
    """WAVEPACKET14 v3: the public LASzip wavepacket design in its own
    layer stream — a per-previous-shape symbol model over the four
    byte-offset delta shapes (0 unchanged, 1 follows last packet,
    2 repeatable 32-bit delta, 3 arbitrary raw u64) plus 32-bit
    correctors for packet size and the float bit patterns
    (return-point, dx, dy, dz with per-axis contexts)."""

    def __init__(self, layer_blobs: list[bytes] | None = None):
        self.compress = layer_blobs is None
        if self.compress:
            self.coder = ArithmeticEncoder()
        else:
            self.coder = ArithmeticDecoder(layer_blobs[0])
        c = self.coder
        self.m_packet_index = ArithmeticModel(256, self.compress)
        self.m_offset_diff = [
            ArithmeticModel(4, self.compress) for _ in range(4)
        ]
        self.ic_offset_diff = IntegerCompressor(c, 32)
        self.ic_packet_size = IntegerCompressor(c, 32)
        self.ic_return_point = IntegerCompressor(c, 32)
        self.ic_xyz = IntegerCompressor(c, 32, 3)
        self.last: tuple | None = None
        self.last_diff_32 = 0
        self.sym_last_offset_diff = 0

    def init(self, wp: tuple):
        self.last = tuple(wp)
        self.last_diff_32 = 0
        self.sym_last_offset_diff = 0

    def layer_bytes(self) -> list[bytes]:
        return [self.coder.done()]

    def write(self, wp: tuple):
        desc, off, size, rp, dx, dy, dz = wp
        _ld, loff, lsize, lrp, ldx, ldy, ldz = self.last
        c = self.coder
        c.encode_symbol(self.m_packet_index, desc)
        diff64 = off - loff
        if diff64 == 0:
            sym = 0
        elif diff64 == lsize:
            sym = 1
        elif -(1 << 31) <= diff64 < (1 << 31):
            sym = 2
        else:
            sym = 3
        c.encode_symbol(
            self.m_offset_diff[self.sym_last_offset_diff], sym
        )
        self.sym_last_offset_diff = sym
        if sym == 2:
            self.ic_offset_diff.compress(self.last_diff_32, diff64)
            self.last_diff_32 = diff64
        elif sym == 3:
            c.write_int(off & _U32)
            c.write_int((off >> 32) & _U32)
        self.ic_packet_size.compress(_i32(lsize), _i32(size))
        self.ic_return_point.compress(_i32(lrp), _i32(rp))
        self.ic_xyz.compress(_i32(ldx), _i32(dx), 0)
        self.ic_xyz.compress(_i32(ldy), _i32(dy), 1)
        self.ic_xyz.compress(_i32(ldz), _i32(dz), 2)
        self.last = tuple(wp)

    def read(self) -> tuple:
        _ld, loff, lsize, lrp, ldx, ldy, ldz = self.last
        c = self.coder
        desc = c.decode_symbol(self.m_packet_index)
        sym = c.decode_symbol(
            self.m_offset_diff[self.sym_last_offset_diff]
        )
        self.sym_last_offset_diff = sym
        if sym == 0:
            off = loff
        elif sym == 1:
            off = (loff + lsize) & _U64
        elif sym == 2:
            d = _i32(self.ic_offset_diff.decompress(self.last_diff_32))
            self.last_diff_32 = d
            off = (loff + d) & _U64
        else:
            lo = c.read_int()
            off = ((c.read_int() << 32) | lo) & _U64
        size = self.ic_packet_size.decompress(_i32(lsize)) & _U32
        rp = self.ic_return_point.decompress(_i32(lrp)) & _U32
        dx = self.ic_xyz.decompress(_i32(ldx), 0) & _U32
        dy = self.ic_xyz.decompress(_i32(ldy), 1) & _U32
        dz = self.ic_xyz.decompress(_i32(ldz), 2) & _U32
        wp = (desc, off, size, rp, dx, dy, dz)
        self.last = wp
        return wp


# ---------------------------------------------------------------------------
# layered chunk framing + whole-file compress/decompress
# ---------------------------------------------------------------------------


#: which side-items each point format carries
def _has_rgb(point_format: int) -> bool:
    return point_format in (7, 8, 10)


def _has_nir(point_format: int) -> bool:
    return point_format in (8, 10)


def _has_wave(point_format: int) -> bool:
    return point_format in (9, 10)


def _layer_names(point_format: int) -> list[str]:
    names = list(P14_LAYERS)
    if _has_nir(point_format):
        names += RGBNIR_LAYERS
    elif _has_rgb(point_format):
        names += RGB_LAYERS
    if _has_wave(point_format):
        names += WAVE_LAYERS
    return names


def compress_chunk14(rows: list[Point14], point_format: int,
                     rgbs=None, nirs=None, waves=None) -> bytes:
    """One layered chunk: raw seed record, u32 per-layer sizes, then
    the layer byte streams."""
    seed = rows[0]
    out = bytearray(seed.pack()[:30])
    if _has_rgb(point_format):
        out += struct.pack("<HHH", *rgbs[0])
    if _has_nir(point_format):
        out += struct.pack("<H", nirs[0])
    if _has_wave(point_format):
        out += _WP_FMT.pack(*waves[0])
    p14 = Point14V3()
    p14.init(seed)
    rgb = None
    if _has_rgb(point_format):
        rgb = Rgb14V3(_has_nir(point_format))
        rgb.init(rgbs[0], nirs[0] if _has_nir(point_format) else None)
    wave = None
    if _has_wave(point_format):
        wave = Wavepacket14V3()
        wave.init(waves[0])
    for i in range(1, len(rows)):
        p14.write(rows[i])
        if rgb is not None:
            rgb.write(rgbs[i], nirs[i] if _has_nir(point_format) else None)
        if wave is not None:
            wave.write(waves[i])
    blobs = p14.layer_bytes()
    if rgb is not None:
        blobs += rgb.layer_bytes()
    if wave is not None:
        blobs += wave.layer_bytes()
    out += struct.pack(f"<{len(blobs)}I", *(len(b) for b in blobs))
    for b in blobs:
        out += b
    return bytes(out)


def decompress_chunk14(buf: bytes, start: int, n_points: int,
                       point_format: int, out_rows: list) -> None:
    """Decode one layered chunk into (Point14, rgb|None, nir|None,
    wavepacket|None) tuples."""
    pos = start
    seed = Point14.unpack(buf[pos:pos + 30])
    pos += 30
    rgb0 = nir0 = wp0 = None
    if _has_rgb(point_format):
        rgb0 = struct.unpack("<HHH", buf[pos:pos + 6])
        pos += 6
    if _has_nir(point_format):
        (nir0,) = struct.unpack("<H", buf[pos:pos + 2])
        pos += 2
    if _has_wave(point_format):
        wp0 = _WP_FMT.unpack(buf[pos:pos + _WP_FMT.size])
        pos += _WP_FMT.size
    out_rows.append((seed.copy(), rgb0, nir0, wp0))
    if n_points == 1:
        return
    names = _layer_names(point_format)
    sizes = struct.unpack(
        f"<{len(names)}I", buf[pos:pos + 4 * len(names)]
    )
    pos += 4 * len(names)
    blobs = []
    for sz in sizes:
        blobs.append(buf[pos:pos + sz])
        pos += sz
    n_p14 = len(P14_LAYERS)
    p14 = Point14V3(blobs[:n_p14])
    p14.init(seed)
    used = n_p14
    rgb = None
    if _has_rgb(point_format):
        n_rgb = 2 if _has_nir(point_format) else 1
        rgb = Rgb14V3(_has_nir(point_format), blobs[used:used + n_rgb])
        rgb.init(rgb0, nir0)
        used += n_rgb
    wave = None
    if _has_wave(point_format):
        wave = Wavepacket14V3(blobs[used:used + 1])
        wave.init(wp0)
    for _ in range(n_points - 1):
        pt = p14.read()
        r = nr = wp = None
        if rgb is not None:
            r, nr = rgb.read()
        if wave is not None:
            wp = wave.read()
        out_rows.append((pt, r, nr, wp))


def build_laszip_vlr14(point_format: int, chunk_size: int) -> bytes:
    """laszip VLR advertising the layered compressor + v3 items."""
    from .laszip_codec import LASZIP_RECORD_ID, LASZIP_USER_ID, _VLR_HDR

    items = FORMAT14_ITEMS[point_format]
    payload = struct.pack(
        "<HHBBHIIqqH",
        COMPRESSOR_LAYERED_CHUNKED,
        0,
        3, 4, 3,  # laszip version the stream layout follows
        0,
        chunk_size,
        -1, -1,
        len(items),
    ) + b"".join(struct.pack("<HHH", *it) for it in items)
    return _VLR_HDR.pack(
        0, LASZIP_USER_ID, LASZIP_RECORD_ID, len(payload),
        b"lasdb_spark laszip".ljust(32, b"\x00"),
    ) + payload


def compress_points_to_laz14(
    pts: np.ndarray,
    point_format: int = 6,
    scales=(0.001, 0.001, 0.001),
    offsets=(0.0, 0.0, 0.0),
    chunk_size: int = 50000,
) -> bytes:
    """Full LAS 1.4 LAZ file (375-byte header, layered chunks, chunk
    table) from a ``las.point_dtype(fmt)`` structured array."""
    from .las import _HEADER14_SIZE, _HEADER14_TAIL_FMT, _HEADER_FMT

    if point_format not in FORMAT14_ITEMS:
        raise ValueError(
            f"layered LAZ write supports formats 6-10, got {point_format}"
        )
    n = len(pts)
    gps_u64 = pts["gps_time"].view(np.uint64)
    rows = [
        Point14(
            int(p["X"]), int(p["Y"]), int(p["Z"]), int(p["intensity"]),
            int(p["returns"]), int(p["flags"]),
            int(p["classification"]), int(p["user_data"]),
            int(p["scan_angle"]), int(p["point_source_id"]),
            int(gps_u64[i]),
        )
        for i, p in enumerate(pts)
    ]
    rgbs = nirs = waves = None
    if _has_rgb(point_format):
        rgbs = [
            (int(p["red"]), int(p["green"]), int(p["blue"])) for p in pts
        ]
    if _has_nir(point_format):
        nirs = [int(p["nir"]) for p in pts]
    if _has_wave(point_format):
        # f4 wp fields travel through the codec as raw u32 bit patterns
        rp_v = pts["wp_return_point"].view(np.uint32)
        dx_v = pts["wp_dx"].view(np.uint32)
        dy_v = pts["wp_dy"].view(np.uint32)
        dz_v = pts["wp_dz"].view(np.uint32)
        waves = [
            (
                int(p["wp_descriptor"]), int(p["wp_offset"]),
                int(p["wp_size"]), int(rp_v[i]),
                int(dx_v[i]), int(dy_v[i]), int(dz_v[i]),
            )
            for i, p in enumerate(pts)
        ]
    chunks = []
    for i in range(0, n, chunk_size):
        chunks.append(
            compress_chunk14(
                rows[i:i + chunk_size], point_format,
                rgbs[i:i + chunk_size] if rgbs else None,
                nirs[i:i + chunk_size] if nirs else None,
                waves[i:i + chunk_size] if waves else None,
            )
        )
    record_len = sum(sz for _, sz, _ in FORMAT14_ITEMS[point_format])
    vlr = build_laszip_vlr14(point_format, chunk_size)
    offset_to_points = _HEADER14_SIZE + len(vlr)
    if n:
        gx = pts["X"] * scales[0] + offsets[0]
        gy = pts["Y"] * scales[1] + offsets[1]
        gz = pts["Z"] * scales[2] + offsets[2]
        mins = (gx.min(), gy.min(), gz.min())
        maxs = (gx.max(), gy.max(), gz.max())
    else:
        mins = maxs = (0.0, 0.0, 0.0)
    header = struct.pack(
        _HEADER_FMT,
        b"LASF", 0, 0, 0, 0, 0, b"\x00" * 8,
        1, 4,
        b"lasdb_spark".ljust(32, b"\x00"),
        b"lasdb_spark laszip".ljust(32, b"\x00"),
        1, 2026,
        _HEADER14_SIZE,
        offset_to_points,
        1,
        point_format | 0x80,  # compression bit
        record_len,
        0,  # legacy count MUST be 0 for formats >= 6
        0, 0, 0, 0, 0,
        float(scales[0]), float(scales[1]), float(scales[2]),
        float(offsets[0]), float(offsets[1]), float(offsets[2]),
        float(maxs[0]), float(mins[0]),
        float(maxs[1]), float(mins[1]),
        float(maxs[2]), float(mins[2]),
    ) + struct.pack(_HEADER14_TAIL_FMT, 0, 0, 0, n, *([0] * 15))
    from .laszip_codec import _write_chunk_table

    chunk_table_offset = offset_to_points + 8 + sum(
        len(c) for c in chunks
    )
    return b"".join([
        header, vlr, struct.pack("<q", chunk_table_offset), *chunks,
        _write_chunk_table([len(c) for c in chunks]),
    ])


def decompress_laz14_points(buf: bytes, hdr: dict, vlr: dict) -> np.ndarray:
    """Decode a layered-chunked LAZ payload to the
    ``las.point_dtype(fmt)`` structured array."""
    from .las import point_dtype
    from .laszip_codec import _read_chunk_table

    fmt = hdr["point_format"]
    if fmt not in FORMAT14_ITEMS:
        raise ValueError(
            f"layered LAZ decode supports formats 6-10, got {fmt}"
        )
    for typ, _sz, ver in vlr["items"]:
        if (typ, ver) not in {(10, 3), (11, 3), (12, 3), (13, 3)}:
            raise ValueError(
                f"laszip item (type {typ}, version {ver}) not supported"
            )
    n = hdr["point_count"]
    chunk_size = vlr["chunk_size"]
    if chunk_size <= 0:
        raise ValueError(f"laszip chunk_size {chunk_size} invalid")
    pos = hdr["offset_to_points"]
    (table_off,) = struct.unpack("<q", buf[pos:pos + 8])
    pos += 8
    n_chunks = (n + chunk_size - 1) // chunk_size if n else 0
    if table_off <= 0 or table_off > len(buf) - 8:
        raise ValueError("laszip chunk table offset out of range")
    lens = _read_chunk_table(buf, table_off, n_chunks)
    rows: list = []
    remaining = n
    for ln in lens:
        take = min(chunk_size, remaining)
        decompress_chunk14(buf, pos, take, fmt, rows)
        pos += ln
        remaining -= take
    return rows14_to_struct(rows, fmt)


def rows14_to_struct(rows: list, point_format: int) -> np.ndarray:
    """(Point14, rgb|None, nir|None, wavepacket|None) tuples →
    ``las.point_dtype(fmt)`` structured array (shared by the LAZ file
    decoder and the COPC node decoder)."""
    from .las import point_dtype

    out = np.zeros(len(rows), dtype=point_dtype(point_format))
    gps_view = out["gps_time"].view(np.uint64)
    has_wave = _has_wave(point_format)
    if has_wave:
        # wp float fields are carried as raw u32 bit patterns
        rp_v = out["wp_return_point"].view(np.uint32)
        dx_v = out["wp_dx"].view(np.uint32)
        dy_v = out["wp_dy"].view(np.uint32)
        dz_v = out["wp_dz"].view(np.uint32)
    for i, (p, rgb, nir, wp) in enumerate(rows):
        o = out[i]
        o["X"], o["Y"], o["Z"] = p.x, p.y, p.z
        o["intensity"] = p.intensity
        o["returns"] = p.returns
        o["flags"] = p.flags
        o["classification"] = p.classification
        o["user_data"] = p.user_data
        o["scan_angle"] = p.scan_angle
        o["point_source_id"] = p.point_source_id
        gps_view[i] = p.gps_u64
        if rgb is not None:
            o["red"], o["green"], o["blue"] = rgb
        if nir is not None:
            o["nir"] = nir
        if has_wave and wp is not None:
            o["wp_descriptor"] = wp[0]
            o["wp_offset"] = wp[1]
            o["wp_size"] = wp[2]
            rp_v[i], dx_v[i], dy_v[i], dz_v[i] = wp[3], wp[4], wp[5], wp[6]
    return out
