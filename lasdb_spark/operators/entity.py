"""Entity resolution / record linkage: blocked candidate generation +
edit-distance verification.

The classic data-integration operator the dedup family doesn't cover:
near-duplicate RECORDS (names with typos), not near-duplicate
documents. The pipeline is the standard two-phase shape — cheap
BLOCKING keys cut the N² candidate space to same-block pairs, then an
exact Levenshtein verify keeps true matches — expressed as one
explode + one self-join + one native `levenshtein()` filter (both
Spark and DuckDB implement the same classic DP edit distance, so the
verify is engine-exact).

Scale: candidate volume is Σ|block|² over blocking-key buckets, the
same bound (and the same skew hazard) as MinHash banding — the
docstrings call out key selectivity as the knob. Everything after
the map-side key explode moves only (key, entity_id, name) rows.

Fixture: `make_entity_corpus` plants 5-record families — one
canonical name + four single-typo variants (drop / swap / duplicate /
replace at fixed positions), generated with substring surgery that
the DuckDB oracle replays verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ENT_FAMILY = 5
ENT_MAX_LEV = 4

#: embedded word lists (shared with the oracle SQL verbatim)
ENT_FIRST = (
    "james", "mary", "robert", "patricia", "michael", "jennifer",
    "william", "linda", "david", "elizabeth", "richard", "barbara",
    "joseph", "susan", "thomas", "jessica",
)
ENT_LAST = (
    "smith", "johnson", "williams", "brown", "jones", "garcia",
    "miller", "davis", "rodriguez", "martinez", "hernandez", "lopez",
    "gonzalez", "wilson", "anderson", "taylor",
)


def _base_name_sql() -> str:
    """Canonical family name for doc_id, as a DuckDB expression."""
    first = "[" + ", ".join(f"'{w}'" for w in ENT_FIRST) + "]"
    last = "[" + ", ".join(f"'{w}'" for w in ENT_LAST) + "]"
    g = f"(doc_id // {ENT_FAMILY})"
    return (
        f"({first})[1 + {g} % 16] || ' ' || "
        f"({last})[1 + ({g} // 16) % 16] || ' ' || CAST({g} AS VARCHAR)"
    )


def _typo_sql(b: str = "b") -> str:
    """Member-r typo surgery over base name ``b`` (positions 2-4 sit
    inside the first word, whose shortest entry is 4 chars)."""
    r = f"(doc_id % {ENT_FAMILY})"
    return f"""CASE {r}
      WHEN 0 THEN {b}
      WHEN 1 THEN substring({b}, 1, 2) || substring({b}, 4)
      WHEN 2 THEN substring({b}, 1, 1) || substring({b}, 3, 1)
                  || substring({b}, 2, 1) || substring({b}, 4)
      WHEN 3 THEN substring({b}, 1, 3) || substring({b}, 3)
      ELSE substring({b}, 1, 1) || 'x' || substring({b}, 3)
    END"""


def make_entity_corpus(docs: DataFrame) -> DataFrame:
    """(entity_id, name) — 5-record near-duplicate families: every
    :data:`ENT_FAMILY` consecutive ids share a canonical
    'first last <g>' name; members 1-4 carry one deterministic typo
    (drop / adjacent swap / duplicate / replace, all at positions
    2-4). Pure native column expressions — zero UDFs; the numeric
    suffix keeps families distinct, and typos never touch it."""
    g = (F.col("doc_id") / ENT_FAMILY).cast("long")
    base = F.concat_ws(
        " ",
        F.element_at(
            F.array(*[F.lit(w) for w in ENT_FIRST]), (g % 16 + 1).cast("int")
        ),
        F.element_at(
            F.array(*[F.lit(w) for w in ENT_LAST]),
            ((g / 16).cast("long") % 16 + 1).cast("int"),
        ),
        g.cast("string"),
    )
    # the typo surgery uses the SQL expression form: Spark's
    # substring() builtin needs an explicit length for open-ended
    # tails, while substring(b, 4) in SQL means "to the end" in both
    # engines — one shared spelling, zero drift
    return (
        docs.select(F.col("doc_id").alias("entity_id"), base.alias("b"))
        .select(
            "entity_id",
            F.expr(
                f"""CASE entity_id % {ENT_FAMILY}
                  WHEN 0 THEN b
                  WHEN 1 THEN substring(b, 1, 2) || substring(b, 4)
                  WHEN 2 THEN substring(b, 1, 1) || substring(b, 3, 1)
                              || substring(b, 2, 1) || substring(b, 4)
                  WHEN 3 THEN substring(b, 1, 3) || substring(b, 3)
                  ELSE substring(b, 1, 1) || 'x' || substring(b, 3)
                END"""
            ).alias("name"),
        )
    )


def entity_match_pairs(
    entities: DataFrame, max_lev: int = ENT_MAX_LEV
) -> DataFrame:
    """(entity_a, entity_b, lev) — record-linkage candidate pairs
    that survive the edit-distance verify: two blocking keys per
    record (prefix-2 + name length; suffix-4), candidates share any
    key, Levenshtein ≤ ``max_lev`` keeps true matches.

    The two keys cover complementary typo classes: length-changing
    edits (drop/duplicate) keep the suffix key; prefix-preserving
    edits keep the prefix key — every single-edit variant of a name
    shares at least one key with its canonical form unless the edit
    hits both the first two chars AND the last four (impossible for
    one edit at position 2-4 of a ≥ 8-char name). Blocking-key
    selectivity is the scale knob: candidate volume is Σ|block|²."""
    keyed = entities.select(
        "entity_id",
        "name",
        F.explode(
            F.array(
                F.concat(
                    F.lit("p:"),
                    F.substring(F.col("name"), 1, 2),
                    F.lit("|"),
                    F.length("name").cast("string"),
                ),
                F.concat(
                    F.lit("s:"),
                    F.substring(F.col("name"), -4, 4),
                ),
            )
        ).alias("bkey"),
    )
    a = keyed.select(
        F.col("bkey").alias("bkey"),
        F.col("entity_id").alias("entity_a"),
        F.col("name").alias("name_a"),
    )
    b = keyed.select(
        F.col("bkey").alias("bkey"),
        F.col("entity_id").alias("entity_b"),
        F.col("name").alias("name_b"),
    )
    return (
        a.join(b, "bkey")
        .where(F.col("entity_a") < F.col("entity_b"))
        .select(
            "entity_a",
            "entity_b",
            F.levenshtein("name_a", "name_b").alias("lev"),
        )
        .where(F.col("lev") <= max_lev)
        .distinct()
    )


def entity_match_pairs_sql(max_lev: int = ENT_MAX_LEV) -> str:
    """Oracle twin of make_entity_corpus ∘ entity_match_pairs."""
    return f"""
WITH ents AS (
  SELECT doc_id AS entity_id, {_typo_sql(f"({_base_name_sql()})")} AS name
  FROM documents),
keyed AS (
  SELECT entity_id, name,
         'p:' || substring(name, 1, 2) || '|' ||
           CAST(length(name) AS VARCHAR) AS bkey
  FROM ents
  UNION ALL
  SELECT entity_id, name,
         's:' || substring(name, length(name) - 3, 4)
  FROM ents)
SELECT DISTINCT a.entity_id AS entity_a, b.entity_id AS entity_b,
       CAST(levenshtein(a.name, b.name) AS INT) AS lev
FROM keyed a JOIN keyed b
  ON a.bkey = b.bkey AND a.entity_id < b.entity_id
WHERE levenshtein(a.name, b.name) <= {max_lev}
""".strip()
