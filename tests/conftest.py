import os

import pytest

SF_DIR = os.environ.get("LASDB_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[8]")
        .appName("lasdb_spark_tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Strict codegen: a whole-stage method that fails to compile
        # (e.g. >64 KB from an exploding expression tree) FAILS the test
        # instead of silently running interpreted — guards the Morton
        # byte-LUT fix and any future expression blowup.
        .config("spark.sql.codegen.fallback", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    # free knn_join_ivf's session-scoped persisted assignment (its
    # documented teardown contract) before the session dies
    from lasdb_spark.operators.similarity import release_knn_join_cache

    release_knn_join_cache()
    # likewise the r13 slotted persisted intermediates
    from lasdb_spark.operators._matcache import release_slot

    release_slot()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
