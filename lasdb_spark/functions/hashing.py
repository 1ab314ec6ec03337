"""Deterministic cross-engine hashing primitives.

Spark's xxhash64 and DuckDB's hash() disagree, so every hash the oracle
must reproduce is built on standard MD5: take the first 15 hex digits
(60 bits, always positive in a BIGINT) and parse as an integer.

- Spark: ``conv(substring(md5(s), 1, 15), 16, 10) :: long``
- DuckDB: no hex-string cast, so a generated 15-term polynomial over
  ``instr('0123456789abcdef', ...)``.

Both sides therefore hash any string to the identical 60-bit integer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = 15  # 60 bits < 2^63, sign-safe
MERSENNE31 = 2_147_483_647  # prime modulus for permutation hashing


def md5_int60_col(s: Column) -> Column:
    """60-bit integer hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(s), 1, HEX_DIGITS), 16, 10).cast("long")


def md5_int60_sql(expr: str) -> str:
    """Same 60-bit hash in DuckDB SQL: polynomial over hex digits.

    NOTE: duplicates ``expr`` textually 15×; feed a simple column ref."""
    h = f"substr(md5({expr}), 1, {HEX_DIGITS})"
    terms = [
        f"(instr('0123456789abcdef', substr({h}, {k + 1}, 1)) - 1) * {16 ** (HEX_DIGITS - 1 - k)}"
        for k in range(HEX_DIGITS)
    ]
    return "(" + " + ".join(terms) + ")"


def minhash_perm_coeffs(n_perms: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for universal hashing mod 2^31-1."""
    coeffs = []
    for j in range(n_perms):
        a = (j * 2_654_435_761 + 1) % MERSENNE31
        b = (j * 40_503 + 17) % MERSENNE31
        if a == 0:
            a = 1
        coeffs.append((a, b))
    return coeffs


def fold_product_sql(a_expr: str, b_expr: str, n: int) -> str:
    """Left-associated Σ a[i]·b[i] over 1-based list columns in DOUBLE.

    Parenthesized left fold — the same FP addition order as Spark's
    ``F.aggregate`` sequential fold, so results are bit-identical."""
    acc = "0.0"
    for i in range(1, n + 1):
        term = f"CAST(({a_expr})[{i}] AS DOUBLE) * CAST(({b_expr})[{i}] AS DOUBLE)"
        acc = f"({acc} + {term})"
    return acc


def fold_dot_col(a: Column, b: Column, n: int | None = None) -> Column:
    """Spark twin of :func:`fold_product_sql`: sequential left fold.

    Default is the zip_with/aggregate higher-order form. It is
    CodegenFallback (interpreted per row), but MEASURED faster
    end-to-end on the benchmark corpus than unrolling: a 64-term
    unrolled tree costs seconds of Catalyst planning + Janino
    compilation per stage, which dwarfs its per-row win until row
    counts reach the hundreds of millions. Pass a static ``n`` to
    unroll into a native left-associated sum of element products for
    genuinely huge inputs — identical FP addition order either way
    (bit-identical results, same as the SQL twin).
    """
    if n is None:
        prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
        return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)
    acc = F.lit(0.0)
    for i in range(n):
        acc = acc + F.get(a, i).cast("double") * F.get(b, i).cast("double")
    return acc


def fold_l2_col(a: Column, b: Column) -> Column:
    """Left-folded squared-L2 distance Σ (a[i]-b[i])² over two array
    columns (sequential fold — same FP addition order as
    :func:`fold_l2_sql`, so results are bit-identical)."""
    diffs = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def fold_l2_sql(
    a_expr: str, b_expr: str, n: int, a_off: str = "0", b_off: str = "0"
) -> str:
    """DuckDB twin of :func:`fold_l2_col` with optional element-offset
    expressions (1-based lists: element i reads ``[off + i]``), so the
    oracle can index a subvector of a stored embedding without
    materializing the slice.

    NOTE: duplicates every expr textually 2n×; feed simple refs."""
    acc = "0.0"
    for i in range(1, n + 1):
        d = (
            f"(CAST(({a_expr})[({a_off}) + {i}] AS DOUBLE) - "
            f"CAST(({b_expr})[({b_off}) + {i}] AS DOUBLE))"
        )
        acc = f"({acc} + {d} * {d})"
    return acc
