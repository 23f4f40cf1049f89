"""asof_join helper unit tests: directions, tolerance, same-name keys
(the probe-found ambiguity case), inner-drop semantics."""

from pyspark.sql import functions as F

from gcp_cloudsql_to_bigquery_spark.operators.joins import asof_join


def _fixtures(spark):
    left = spark.createDataFrame([(1, 10), (1, 50), (2, 5)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 20, "a"), (1, 40, "b"), (2, 3, "c")], "k int, rt int, val string"
    )
    return left, right


def test_backward(spark):
    left, right = _fixtures(spark)
    rows = {(r.k, r.t): (r.asof_rt, r.asof_val)
            for r in asof_join(left, right, "k", "k", "t", "rt").collect()}
    # t=10 has no rt<=10 for k=1 → dropped; t=50 picks rt=40
    assert rows == {(1, 50): (40, "b"), (2, 5): (3, "c")}


def test_forward(spark):
    left, right = _fixtures(spark)
    rows = {(r.k, r.t): (r.asof_rt, r.asof_val)
            for r in asof_join(left, right, "k", "k", "t", "rt",
                               direction="forward").collect()}
    assert rows == {(1, 10): (20, "a")}


def test_tolerance_bounds_gap(spark):
    left, right = _fixtures(spark)
    rows = {(r.k, r.t) for r in asof_join(
        left, right, "k", "k", "t", "rt", tolerance=F.lit(5)).collect()}
    # backward: (1,50)→rt40 gap 10 > 5 dropped; (2,5)→rt3 gap 2 kept
    assert rows == {(2, 5)}


def test_pandas_merge_asof_agreement(spark):
    """Cross-check against pandas merge_asof on a bigger deterministic set."""
    import pandas as pd

    lpd = pd.DataFrame({"k": [1] * 20 + [2] * 20, "t": list(range(0, 100, 5)) * 2})
    rpd = pd.DataFrame({"k": [1] * 7 + [2] * 7, "rt": [3, 17, 31, 45, 59, 73, 87] * 2})
    rpd["val"] = rpd["rt"] * 10
    want = pd.merge_asof(
        lpd.sort_values("t"), rpd.sort_values("rt"),
        left_on="t", right_on="rt", by="k", direction="backward",
    ).dropna()
    got = asof_join(
        spark.createDataFrame(lpd), spark.createDataFrame(rpd), "k", "k", "t", "rt"
    ).collect()
    want_set = {(int(r.k), int(r.t), int(r.rt), int(r.val)) for r in want.itertuples()}
    got_set = {(r.k, r.t, r.asof_rt, r.asof_val) for r in got}
    assert got_set == want_set
