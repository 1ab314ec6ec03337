"""Executor-side Morton/SFC arithmetic as native Spark Column expressions.

Everything here compiles to JVM bitwise ops inside whole-stage codegen —
NO Python UDFs on the hot path (the reference needed numba JIT for the
same job: pcsfc/encoder.py:8, pcsfc/decoder.py:4; Spark's codegen makes
that free). Mask constants are shared with the driver-side planner
(:mod:`lasdb_spark.pcsfc.morton`) and the DuckDB-oracle SQL generator
(:mod:`lasdb_spark.pcsfc.sqlgen`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .morton import compact2d, expand2d


def _balanced_bitor(terms: list[Column]) -> Column:
    """OR-combine disjoint-bit terms as a balanced tree (nesting depth
    log n, not n — deep left-recursive trees stress Janino's recursive
    compiler)."""
    if len(terms) == 1:
        return terms[0]
    mid = len(terms) // 2
    return _balanced_bitor(terms[:mid]).bitwiseOR(_balanced_bitor(terms[mid:]))


# The driver-side planner (morton.py) uses the classic magic-mask chain:
# n = (n | (n << s)) & mask. As a Column tree that chain references its
# input TWICE per step, so the expression DOUBLES each step — 2^5 = 32
# inlined copies of the input — and whole-stage codegen emits code for
# every copy. Fused with a filter + aggregate (block unpack, on-the-fly
# encode), that overflows Janino's 64 KB per-method limit and the whole
# stage silently drops to interpreted execution.
#
# Here instead: byte-at-a-time lookup tables. The 256-entry tables are
# literal arrays — constant-folded by Catalyst into a single ArrayData
# object referenced from the generated class, NOT rebuilt per row — so
# an expand is 4 lookups and a compact is 8, each referencing the input
# once. Values are generated from the morton.py reference functions, so
# Column/driver parity holds by construction (property-tested too).

# expand2d of one input byte → 16-bit spread (x lane)
_EXPAND_TABLE = [expand2d(b) for b in range(256)]
# compact of one key byte's even bit positions → 4 bits
_COMPACT_TABLE = [compact2d(b & 0x55) for b in range(256)]


def _byte_lut(c: Column, table: list[int], nbytes: int, out_shift: int) -> Column:
    # F.lit(list) builds the literal lazily per call — it needs a live
    # SparkSession, so it cannot be a module-level constant.
    lut = F.lit(table)
    return _balanced_bitor(
        [
            # cast("long") is load-bearing: lit() infers array<int>, and
            # shiftleft on INT wraps the shift amount mod 32.
            F.shiftleft(
                F.get(
                    lut, F.shiftright(c, 8 * j).bitwiseAND(F.lit(255)).cast("int")
                ).cast("long"),
                out_shift * j,
            )
            for j in range(nbytes)
        ]
    )


def expand2d_col(c: Column) -> Column:
    """Spread bits of a non-negative long onto even positions (F1)."""
    return _byte_lut(c, _EXPAND_TABLE, nbytes=4, out_shift=16)


def compact2d_col(c: Column) -> Column:
    """Gather even bit positions back into a compact long (F3)."""
    return _byte_lut(c, _COMPACT_TABLE, nbytes=8, out_shift=4)


def morton_encode_col(x: Column, y: Column) -> Column:
    """Morton key = expand(x) | expand(y) << 1 (F2; encoder.py:35-48)."""
    return expand2d_col(x).bitwiseOR(F.shiftleft(expand2d_col(y), 1))


def morton_decode_x_col(m: Column) -> Column:
    """x coordinate of a Morton key (F4)."""
    return compact2d_col(m)


def morton_decode_y_col(m: Column) -> Column:
    """y coordinate of a Morton key (F4)."""
    return compact2d_col(F.shiftright(m, 1))


def quantize_col(v: Column, scale: float, offset: float) -> Column:
    """round((v - offset) / scale) as long (F5; point_processor.py:45-47).

    ``F.round`` is HALF_UP — documented engine semantics (we do not
    replicate Python banker's rounding; see SURVEY §7.2).
    """
    return F.round((v - F.lit(float(offset))) / F.lit(float(scale)), 0).cast("long")


def split_head_col(mkey: Column, tail_len: int) -> Column:
    """head = mkey >> tail_len (F6)."""
    return F.shiftright(mkey, tail_len)


def split_tail_col(mkey: Column, tail_len: int) -> Column:
    """tail = mkey & ((1 << tail_len) - 1) (F6)."""
    return mkey.bitwiseAND(F.lit((1 << tail_len) - 1))


def merge_key_col(head: Column, tail: Column, tail_len: int) -> Column:
    """mkey = head << tail_len | tail (F7; retrieve_data.py:131)."""
    return F.shiftleft(head, tail_len).bitwiseOR(tail)
