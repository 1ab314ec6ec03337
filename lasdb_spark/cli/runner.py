"""JSON-script-driven import / query / export runners.

Drop-in workflow parity with the reference CLIs (importer.py:9-26,
query.py:9-33, exporter.py:9-36): the same JSON script shapes drive the
Spark engine. The ``config`` block replaces the PostgreSQL connection
with a ``base_path`` (where datasets live as Parquet); unknown config
keys (dbname/user/…) are ignored so the reference's own scripts parse.

Import script:  {"config": {"base_path": …}, "imports": {name:
  {mode: file|dir, srid, path, scales, offsets, ratio}}}
Query script:   {"config": …, "queries": {name: {source_dataset, mode,
  geometry, [maxz], [minz], [k]}}}  — results written to
  ``base_path/results/<query_name>`` as Parquet.
Export: for each query name, read the result table → ``<name>.las``.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import SparkSession


def build_session(app: str, cpus: int | None = None) -> SparkSession:
    cores = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    s = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("WARN")
    return s


def _load_script(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _find_laz_error(exc: BaseException) -> str | None:
    """Spark wraps executor exceptions; recognize a LazUnsupportedError
    by its guidance text anywhere in the cause chain / message."""
    seen = 0
    cur: BaseException | None = exc
    while cur is not None and seen < 10:
        if "LAZ-compressed input" in str(cur):
            msg = str(cur)
            start = msg.find("LAZ-compressed input")
            return msg[start:].splitlines()[0]
        cur = cur.__cause__ or cur.__context__
        seen += 1
    return None


def run_import(script_path: str, spark: SparkSession | None = None) -> None:
    """Mirror of reference importer.py: per-dataset LAS → encoded store.

    LAZ tiles decompress inline when a laspy LAZ backend is installed;
    without one the dataset fails with a one-line actionable message
    (install laspy[lazrs] or decompress first) instead of an executor
    stack trace, and the run exits nonzero after trying every
    dataset."""
    from ..sources.las import las_to_df

    cfg = _load_script(script_path)
    base = cfg["config"].get("base_path", os.environ.get("LASDB_BASE", "/tmp/lasdb"))
    spark = spark or build_session("lasdb_import")
    failed: list[str] = []
    for name, imp in cfg["imports"].items():
        t0 = time.time()
        path = imp["path"]
        if imp.get("mode", "file") == "dir":
            # Hadoop glob: match .las AND .laz tiles (real AHN
            # distributions ship LAZ; the reader decompresses when a
            # laspy LAZ backend is installed)
            path = os.path.join(path, "*.la[sz]")
        pts = las_to_df(spark, path)
        try:
            meta = _run_one_import(pts, name, base, imp)
        except Exception as exc:
            laz = _find_laz_error(exc)
            if laz is None:
                raise
            # graceful, actionable CLI behavior instead of an executor
            # stack trace: say what to install / how to decompress
            print(f"[import] {name}: FAILED — {laz}")
            failed.append(name)
            continue
        print(
            f"[import] {name}: {meta.point_count} pts, "
            f"head/tail={meta.head_length}/{meta.tail_length}, "
            f"{time.time() - t0:.2f}s"
        )
    if failed:
        raise SystemExit(
            f"import failed for {', '.join(failed)}: LAZ input needs a "
            "decompression backend (see messages above)"
        )


def _run_one_import(pts, name: str, base: str, imp: dict):
    from ..operators.ingest import ingest_points

    return ingest_points(
        pts,
        name,
        base,
        srid=imp.get("srid", 28992),
        scales=tuple(imp.get("scales", (1.0, 1.0, 1.0))),
        offsets=tuple(imp.get("offsets", (0.0, 0.0, 0.0))),
        ratio=imp.get("ratio", 0.7),
        # reference importer emits histogram_<nblocks>.csv at ingest
        # (pcsfc/point_processor.py:74-79) — our import CLI matches,
        # as histogram_<name>/ Parquet next to the store
        write_histogram=imp.get("histogram", True),
    )


def run_query(script_path: str, spark: SparkSession | None = None) -> None:
    """Mirror of reference query.py: named window queries → result tables."""
    from ..operators.ingest import load_dataset
    from ..operators.window_query import WindowQuerier

    cfg = _load_script(script_path)
    base = cfg["config"].get("base_path", os.environ.get("LASDB_BASE", "/tmp/lasdb"))
    spark = spark or build_session("lasdb_query")
    queriers: dict[str, WindowQuerier] = {}
    for name, q in cfg["queries"].items():
        t0 = time.time()
        ds = q.get("source_dataset") or q.get("source")
        if ds not in queriers:
            df, meta, layout = load_dataset(spark, base, ds)
            queriers[ds] = WindowQuerier(df, meta, layout)
        res = queriers[ds].query(
            q["mode"], q["geometry"], q.get("minz"), q.get("maxz"), q.get("k")
        )
        out = os.path.join(base, "results", name)
        res.write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
        print(f"[query] {name}: {n} pts, {time.time() - t0:.2f}s")


def run_export(script_path: str, out_dir: str | None = None, spark: SparkSession | None = None) -> None:
    """Mirror of reference exporter.py: result tables → LAS files."""
    from ..sources.las import df_to_las

    cfg = _load_script(script_path)
    base = cfg["config"].get("base_path", os.environ.get("LASDB_BASE", "/tmp/lasdb"))
    out_dir = out_dir or base
    spark = spark or build_session("lasdb_export")
    for name in cfg["queries"]:
        t0 = time.time()
        res = spark.read.parquet(os.path.join(base, "results", name))
        if not {"x", "y", "z"} <= set(res.columns):
            # batch modes (multi_bbox/zonal) produce aggregate tables,
            # not point sets — they stay parquet, LAS has no shape for
            # them (mirrors the reference, which only exports points)
            print(f"[export] {name}: aggregate result, kept as parquet")
            continue
        ext = "laz" if cfg["config"].get("format") == "laz" else "las"
        n = df_to_las(res, os.path.join(out_dir, f"{name}.{ext}"))
        print(
            f"[export] {name}: {n} pts → {name}.{ext}, "
            f"{time.time() - t0:.2f}s"
        )


def main() -> None:
    ap = argparse.ArgumentParser(description="lasdb_spark JSON-script runner")
    ap.add_argument("command", choices=["import", "query", "export"])
    ap.add_argument("--input", required=True, help="JSON script path")
    ap.add_argument("--out", default=None, help="export output dir")
    args = ap.parse_args()
    if args.command == "import":
        run_import(args.input)
    elif args.command == "query":
        run_query(args.input)
    else:
        run_export(args.input, args.out)


if __name__ == "__main__":
    main()
