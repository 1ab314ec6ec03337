"""Pure-Python 2D Morton (Z-order) space-filling-curve arithmetic.

Driver-side planning math: the same bit-interleaving semantics as the
reference's numba kernels (reference: pcsfc/encoder.py:8-48,
pcsfc/decoder.py:4-80, pcsfc/point_processor.py:11-21), re-derived from
the standard public magic-mask interleave. These functions run on the
driver only (query planning, metadata); the executor-side equivalents
are native Column expressions in :mod:`lasdb_spark.pcsfc.columns` and
SQL strings in :mod:`lasdb_spark.pcsfc.sqlgen`, generated from the SAME
mask tables below so all three stay consistent.
"""

from __future__ import annotations

# Magic masks for spreading a 32-bit integer onto the even bit positions
# of a 64-bit integer (and back). Public-domain bit-twiddling idiom.
# Each step is: n = (n | (n << shift)) & mask   (expand)
#               n = (n | (n >> shift)) & mask   (compact, reversed order)
EXPAND_STEPS: tuple[tuple[int, int], ...] = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)

COMPACT_STEPS: tuple[tuple[int, int], ...] = (
    (1, 0x3333333333333333),
    (2, 0x0F0F0F0F0F0F0F0F),
    (4, 0x00FF00FF00FF00FF),
    (8, 0x0000FFFF0000FFFF),
    (16, 0x00000000FFFFFFFF),
)

#: Mask selecting the even (x) bit positions of an interleaved key.
EVEN_BITS = 0x5555555555555555

MAX_COORD_BITS = 31  # inputs must fit in 31 bits (reference precondition)


def expand2d(n: int) -> int:
    """Spread the low 31 bits of ``n`` onto even bit positions.

    Raises ``ValueError`` on negative input — the grid must live in the
    positive quadrant (reference: pcsfc/encoder.py:24-25).
    """
    if n < 0:
        raise ValueError(f"expand2d requires non-negative input, got {n}")
    if n >> MAX_COORD_BITS:
        raise ValueError(f"expand2d input {n} exceeds {MAX_COORD_BITS} bits")
    for shift, mask in EXPAND_STEPS:
        n = (n | (n << shift)) & mask
    return n


def compact2d(m: int) -> int:
    """Inverse of :func:`expand2d`: gather even bit positions into an int."""
    m &= EVEN_BITS
    for shift, mask in COMPACT_STEPS:
        m = (m | (m >> shift)) & mask
    return m


def encode_morton_2d(x: int, y: int) -> int:
    """Interleave x (even bits) and y (odd bits) into one 62-bit key.

    Same layout as the reference (pcsfc/encoder.py:35-48):
    ``expand(x) | (expand(y) << 1)``.
    """
    return expand2d(x) | (expand2d(y) << 1)


def decode_morton_2d(m: int) -> tuple[int, int]:
    """Inverse of :func:`encode_morton_2d` → (x, y).

    Reference: pcsfc/decoder.py:39-50.
    """
    return compact2d(m), compact2d(m >> 1)


def split_key(mkey: int, tail_len: int) -> tuple[int, int]:
    """Split a Morton key into (head, tail).

    Reference: pcsfc/point_processor.py:53-54.
    """
    head = mkey >> tail_len
    return head, mkey - (head << tail_len)


def merge_key(head: int, tail: int, tail_len: int) -> int:
    """Inverse of :func:`split_key` (reference: pipeline/retrieve_data.py:131)."""
    return (head << tail_len) | tail


def compute_split_length(x_max: int, y_max: int, ratio: float) -> tuple[int, int]:
    """Choose (head_len, tail_len) from the scaled max corner of the bbox.

    Morton-encode the max corner, take its bit length, put ``ratio`` of
    the bits in the head, rounded DOWN to an even number so head cells
    are square (reference: pcsfc/point_processor.py:11-21).
    """
    if not 0.0 < ratio <= 1.0:
        raise ValueError(f"ratio must be in (0, 1], got {ratio}")
    mkey = encode_morton_2d(int(x_max), int(y_max))
    bit_len = mkey.bit_length()
    head_len = int(bit_len * ratio)
    if head_len % 2 == 1:
        head_len -= 1
    head_len = max(head_len, 0)
    return head_len, bit_len - head_len


def quantize(v: float, scale: float, offset: float) -> int:
    """Driver-side quantization mirror: round((v - offset) / scale).

    Implements floor(q + 0.5) — round-half-up toward +inf. This equals
    Spark/DuckDB HALF_UP (halves away from zero) only for q >= 0, which
    the engine guarantees: grids must live in the positive quadrant
    (expand2d raises on negatives; compute_metadata validates offsets).
    NOT Python banker's rounding — the executor math is the source of
    truth (reference semantics: pcsfc/point_processor.py:45-47).
    """
    import math

    q = (v - offset) / scale
    return math.floor(q + 0.5)
