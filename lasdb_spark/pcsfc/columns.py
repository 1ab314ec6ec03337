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

from .morton import COMPACT_STEPS, EVEN_BITS, EXPAND_STEPS


def expand2d_col(c: Column) -> Column:
    """Spread bits of a non-negative long onto even positions (F1)."""
    for shift, mask in EXPAND_STEPS:
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def compact2d_col(c: Column) -> Column:
    """Gather even bit positions back into a compact long (F3)."""
    c = c.bitwiseAND(F.lit(EVEN_BITS))
    for shift, mask in COMPACT_STEPS:
        c = c.bitwiseOR(F.shiftright(c, shift)).bitwiseAND(F.lit(mask))
    return c


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
