"""Global physical-plan policy over the ENTIRE driver query surface.

Every `__spark_entry__.queries()` entry is planned (not executed) and
screened for the anti-patterns that break at 100 TB:

- CartesianProduct — unbounded O(n·m) pair blowup;
- BatchEvalPython / ArrowEvalPython — per-row Python in the hot path
  (the multimodal stub is exempt by design: its mapInPandas IS the
  documented Arrow plumbing under test);
- partition-less windows — a global window funnels every row through
  one task. EXEMPT where the window's input is structurally bounded:
  rank attachment AFTER `.orderBy().limit(k)` (TakeOrderedAndProject
  reduces to k rows first — the house top-k idiom, VERDICT r2) and
  lag/momentum over an already-aggregated handful of month rows.

New queries are screened automatically; an unexplained flag fails the
suite until either the plan is fixed or the exemption is argued here.
"""

import re

import pytest

#: global-window exemptions: window input is bounded by construction
BOUNDED_GLOBAL_WINDOW = {
    "text_top_tokens",  # rank over the k rows left by TakeOrdered
    "text_bm25",  # same — rank after limit(k)
    "ann_topk",
    "ann_lsh_topk",
    "ann_lsh_multiprobe",
    "ann_ivf_topk",
    "ann_ivf_trained",
    # rank after limit(k) + codebook numbering over the n_codes-row
    # seed table (16 rows by construction)
    "ann_pq_topk",
    # same two bounded shapes as ann_pq_topk (the trained path's
    # windows all partition by (vec_id, m) except seed numbering)
    "ann_pq_trained",
    # rank after limit(k) + seed numbering (16 rows) + probe ranking
    # over the query-row × n_cells frame (8 rows by construction)
    "ann_ivfpq",
    "ann_ivfpq_trained",  # same bounded shapes with trained tables
    # union of six bounded top-k plans (each exempt above) + the
    # brute-force rank-after-limit(k)
    "ann_recall_report",
    # r7 stored index: rank after limit(k) only — the training windows
    # ran at BUILD time; the query plan is scan ⋈ broadcast ADC → agg
    "ann_ivfpq_stored",
    # r8 incremental-append index: identical query plan to the stored
    # index (rank after limit(k)); only the build path differs
    "ann_index_append",
    # r10 compacted index: same stored-query plan again (rank after
    # limit(k)); compaction only rewrote the codes file layout
    "ann_index_compact",
    # rank over the top_k rows left by TakeOrdered (20 by default)
    "text_bpe_pairs",
    "ann_sq8_topk",  # rank over the k rows left by the exact re-rank cut
    "rel_month_momentum",  # lag over per-month aggregates (≤ months)
    # r7: rank attachment over the top_k rows left by TakeOrdered
    # (key_skew_report: .orderBy().limit(k) happens FIRST)
    "rel_key_skew",
    # r9: all five are the same house idiom — rank attachment AFTER
    # .orderBy().limit(k) (TakeOrderedAndProject reduces to k rows
    # before the window sees anything)
    "doc_search_hybrid",   # fusion of two k_cand-row arms, then top-k
    "rel_late_suppliers",  # rank over the Q21 top-20
    "rel_important_parts",  # rank over the Q11 top-25
    "rel_part_variety",    # rank over the Q16 top-20
    "corpus_weighted_sample",  # rank over the k sampled rows
    "rel_rules",  # rank over the top-25 rules left by TakeOrdered
    # r11 stored text index: the SAME rank-after-limit(k) idiom as
    # their inline siblings text_bm25 / doc_search_hybrid above —
    # the stored plan only swaps the tokenize+explode front for a
    # partition-pruned postings scan; the window still sees k rows
    "doc_search_bm25_stored",
    "doc_search_hybrid_stored",
    # r12: serving through a committed append segment — the identical
    # stored-BM25 plan (rank after limit(k)) over base ∪ segment scans
    "doc_search_bm25_appended",
}

#: Python-eval exemptions: multimodal decode — mm_features/mm_resize/
#: mm_frame_sample/mm_audio parse REAL containers (PGM/PPM/BMP images,
#: concatenated-PGM frame streams, RIFF/WAVE PCM16) with numpy inside
#: mapInPandas; Arrow batches are the designed decode path (bytes in,
#: records out), not a hot-path scalar UDF
PYTHON_EVAL_OK = {
    "mm_features", "mm_resize", "mm_frame_sample", "mm_audio",
    # r6: same designed Arrow decode path (consecutive-frame SAD over
    # the real byte walk)
    "mm_scene_cuts",
    # r7: maximal silent-run walk inside the WAV decode batches
    "mm_silence",
}


def _global_window(plan: str) -> bool:
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        first = m.group(1).split(",")[0]
        if "ASC" in first or "DESC" in first:
            return True
    return False


@pytest.mark.spark
def test_every_query_plan_passes_policy(spark, sf_dir):
    import __spark_entry__ as e

    violations = {}
    for name, fn in e.queries().items():
        plan = (
            fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        bad = []
        if "CartesianProduct" in plan:
            bad.append("CartesianProduct")
        if name not in PYTHON_EVAL_OK and (
            "BatchEvalPython" in plan or "ArrowEvalPython" in plan
        ):
            bad.append("python-eval")
        if name not in BOUNDED_GLOBAL_WINDOW and _global_window(plan):
            bad.append("global-window")
        if bad:
            violations[name] = bad
    assert not violations, violations
