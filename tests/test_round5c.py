"""Brute-force cross-checks for the round-5 statistical kernels: the
oracle proves Spark==DuckDB; these prove both equal a from-first-principles
Python computation on the same inputs."""

import math

from pyspark.sql import functions as F

from gcp_cloudsql_to_bigquery_spark.catalog import load
from gcp_cloudsql_to_bigquery_spark.workload import queries

SF = "/root/testdata/sf0.001"


def _cents(v):
    return math.floor(v * 100 + 0.5)


def test_ks_statistic_matches_bruteforce(spark):
    rows = load(spark, SF, "documents").select("source", "n_chars").collect()
    g1 = sorted(r["n_chars"] for r in rows if int(r["source"][3:]) < 10)
    g2 = sorted(r["n_chars"] for r in rows if int(r["source"][3:]) >= 10)
    values = sorted(set(g1) | set(g2))
    import bisect

    d = max(
        abs(
            bisect.bisect_right(g1, v) * len(g2)
            - bisect.bisect_right(g2, v) * len(g1)
        )
        for v in values
    )
    got = queries()["agg_ks_two_sample"](spark, SF).collect()[0]
    assert got["n1"] == len(g1) and got["n2"] == len(g2)
    assert got["d_num"] == d
    assert got["ks_x1e6"] == math.floor(d / (len(g1) * len(g2)) * 1e6 + 0.5)


def test_gini_matches_bruteforce(spark):
    by_cust = {}
    for r in load(spark, SF, "orders").select("o_custkey", "o_totalprice").collect():
        by_cust[r["o_custkey"]] = by_cust.get(r["o_custkey"], 0) + _cents(
            r["o_totalprice"]
        )
    xs = [c for _, c in sorted(by_cust.items(), key=lambda kv: (kv[1], kv[0]))]
    n, s = len(xs), sum(xs)
    ws = sum((2 * (i + 1) - 1) * x for i, x in enumerate(xs))
    expect = math.floor((ws / (n * float(s)) - 1.0) * 1e6 + 0.5)
    got = queries()["analytics_gini_coefficient"](spark, SF).collect()[0]
    assert got["n"] == n and got["total_cents"] == s
    assert got["gini_x1e6"] == expect
    assert 0 <= got["gini_x1e6"] <= 1_000_000


def test_cusum_equals_reset_recurrence(spark):
    """The windowed identity cumsum - running_min must equal Page's
    explicit reset recurrence S_t = max(0, S_{t-1} + dev_t)."""
    import statistics

    ev = (
        load(spark, SF, "events")
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    by_type = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(r)
    got = {r["event_type"]: r for r in queries()["ts_cusum_changepoint"](spark, SF).collect()}
    for etype, rows in by_type.items():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        cents = [_cents(r["value"]) for r in rows]
        med2 = round(2 * statistics.median(cents))
        s = 0
        peak = 0
        alarms = 0
        for c in cents:
            s = max(0, s + 2 * c - med2)
            peak = max(peak, s)
            if s > 2000000:
                alarms += 1
        assert got[etype]["max_cusum2"] == peak, etype
        assert got[etype]["n_alarms"] == alarms, etype


def test_moving_median_matches_bruteforce(spark):
    import statistics

    hourly = {}
    for r in load(spark, SF, "events").select("event_type", "ts", "value").collect():
        h = r["ts"].replace(minute=0, second=0, microsecond=0)
        k = (r["event_type"], h)
        hourly[k] = hourly.get(k, 0) + _cents(r["value"])
    series = {}
    for (etype, h), c in hourly.items():
        series.setdefault(etype, []).append((h, c))
    got = {
        (r["event_type"], r["h"]): r["med2"]
        for r in queries()["ts_moving_median"](spark, SF).collect()
    }
    n_checked = 0
    for etype, pts in series.items():
        pts.sort()
        vals = [c for _, c in pts]
        for i in range(12, len(pts) - 12):
            window = sorted(vals[i - 12 : i + 13])
            med2 = window[12] + window[12]  # 25 elements -> middle twice
            assert got[(etype, pts[i][0])] == med2
            n_checked += 1
    assert n_checked > 0
