"""Oracle-independent double checks for the round-6 statistics keys:
each test recomputes the statistic BRUTE-FORCE in plain Python/pandas
from the same fixture and compares against the distributed grid/lane
formulation — so correctness does not rest solely on the DuckDB oracle
mirroring the same algebra (a shared-bug failure mode the hash check
cannot see)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from dags_spark.registry import all_specs

from .conftest import SF_DIR


def _run(spark, key):
    return all_specs()[key].fn(spark, SF_DIR).toPandas()


def test_norm_p2_matches_reference_values(spark):
    # A&S 7.1.26 has |eps| < 7.5e-8 on Phi; pin the classic quantiles.
    from dags_spark.queries.aggregates import _norm_p2
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1.959963984540054,), (2.5758293035489004,), (0.0,), (-1.6448536269514722,)],
        "z DOUBLE",
    )
    got = [r["p"] for r in df.select(_norm_p2(F.col("z")).alias("p")).collect()]
    for p, expected in zip(got, [0.05, 0.01, 1.0, 0.10]):
        assert abs(p - expected) < 5e-7, (p, expected)


def test_mann_whitney_matches_bruteforce(spark, duck):
    got = _run(spark, "stats_mann_whitney_u").iloc[0]
    rows = duck.execute(
        "SELECT l_quantity, l_returnflag FROM lineitem"
        " WHERE l_returnflag IN ('R','A')"
    ).df()
    # brute force: average ranks over the pooled sample
    rows["rank"] = rows["l_quantity"].rank(method="average")
    r1 = rows.loc[rows["l_returnflag"] == "R", "rank"].sum()
    n1 = int((rows["l_returnflag"] == "R").sum())
    n2 = int((rows["l_returnflag"] == "A").sum())
    u1 = r1 - n1 * (n1 + 1) / 2.0
    assert int(got["n1"]) == n1 and int(got["n2"]) == n2
    assert abs(float(got["u1"]) - u1) < 1e-6
    # tie-corrected z
    n = n1 + n2
    ties = rows.groupby("l_quantity").size()
    tie_sum = float((ties**3 - ties).sum())
    var = n1 * n2 / 12.0 * ((n + 1) - tie_sum / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var)
    assert abs(float(got["z_stat"]) - round(z, 6)) < 2e-6


def test_ks_2sample_matches_bruteforce(spark, duck):
    got = _run(spark, "stats_ks_2sample").iloc[0]
    rows = duck.execute(
        "SELECT value, event_type FROM events"
        " WHERE event_type IN ('purchase','click')"
    ).df()
    a = sorted(rows.loc[rows["event_type"] == "purchase", "value"])
    b = sorted(rows.loc[rows["event_type"] == "click", "value"])
    grid = sorted(set(a) | set(b))
    import bisect

    d = max(
        abs(
            bisect.bisect_right(a, v) / len(a)
            - bisect.bisect_right(b, v) / len(b)
        )
        for v in grid
    )
    assert int(got["n1"]) == len(a) and int(got["n2"]) == len(b)
    assert abs(float(got["d_stat"]) - round(d, 6)) < 2e-6


def test_cohens_d_matches_bruteforce(spark, duck):
    got = _run(spark, "stats_cohens_d").set_index("region")
    rows = duck.execute(
        """SELECT r.r_name AS region, c.c_mktsegment AS seg,
                  ROUND(c.c_acctbal * 100) AS bal_c
           FROM customer c
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           JOIN region r ON n.n_regionkey = r.r_regionkey
           WHERE c.c_mktsegment IN ('AUTOMOBILE','BUILDING')"""
    ).df()
    for region, grp in rows.groupby("region"):
        a = grp.loc[grp["seg"] == "AUTOMOBILE", "bal_c"]
        b = grp.loc[grp["seg"] == "BUILDING", "bal_c"]
        if len(a) < 2 or len(b) < 2:
            assert region not in got.index
            continue
        pooled = ((a.var(ddof=1) * (len(a) - 1)) + (b.var(ddof=1) * (len(b) - 1))) / (
            len(a) + len(b) - 2
        )
        d = (a.mean() - b.mean()) / math.sqrt(pooled)
        assert abs(float(got.loc[region, "cohens_d"]) - round(d, 6)) < 2e-6


def test_mann_kendall_matches_bruteforce(spark, duck):
    got = _run(spark, "stats_mann_kendall_trend").iloc[0]
    xs = duck.execute(
        """SELECT CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
           FROM orders GROUP BY date_trunc('month', o_orderdate)
           ORDER BY date_trunc('month', o_orderdate)"""
    ).fetchall()
    xs = [r[0] for r in xs]
    n = len(xs)
    s = sum(
        (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    assert int(got["n"]) == n and int(got["s_stat"]) == s
    ties = pd.Series(xs).value_counts()
    tie_term = float(sum(t * (t - 1) * (2 * t + 5) for t in ties if t > 1))
    var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    num = (s - 1) if s > 0 else (s + 1) if s < 0 else 0
    assert abs(float(got["z_stat"]) - round(num / math.sqrt(var), 6)) < 2e-6


def test_bh_fdr_is_valid_step_up(spark):
    out = _run(spark, "stats_bh_fdr").sort_values(["p_q", "brand"]).reset_index(
        drop=True
    )
    m = len(out)
    p = out["p_q"].astype(float) / 1e12
    # brute-force BH adjusted p
    raw = [p[i] * m / (i + 1) for i in range(m)]
    adj = [min(min(raw[i:]), 1.0) for i in range(m)]
    for i in range(m):
        assert abs(float(out.loc[i, "p_adj"]) - round(adj[i], 9)) < 2e-9
        assert bool(out.loc[i, "reject"]) == (adj[i] <= 0.05)
    # adjusted p is monotone in p — the defining step-up property
    assert all(adj[i] <= adj[i + 1] + 1e-12 for i in range(m - 1))


def test_tost_agrees_with_cohens_population(spark):
    tost = _run(spark, "stats_tost_equivalence").set_index("region")
    coh = _run(spark, "stats_cohens_d").set_index("region")
    # same lanes -> same populations and mean-diff sign per region
    assert set(tost.index) == set(coh.index)
    for region in tost.index:
        assert int(tost.loc[region, "n1"]) == int(coh.loc[region, "n1"])
        assert int(tost.loc[region, "n2"]) == int(coh.loc[region, "n2"])
        if abs(float(tost.loc[region, "mean_diff"])) > 1e-9:
            assert (float(tost.loc[region, "mean_diff"]) > 0) == (
                float(coh.loc[region, "cohens_d"]) > 0
            )


def test_bollinger_flags_match_bruteforce(spark, duck):
    got = _run(spark, "win_bollinger_breakout")
    daily = duck.execute(
        """SELECT date_trunc('day', o_orderdate) AS day,
                  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
                    AS rev_c
           FROM orders GROUP BY day ORDER BY day"""
    ).df()
    rev = daily["rev_c"].astype(float).tolist()
    expected = {}
    for i in range(6, len(rev)):
        w = rev[i - 6 : i + 1]
        mean = sum(w) / 7.0
        sd = math.sqrt(sum((x - mean) ** 2 for x in w) / 6.0)
        expected[daily["day"][i]] = (rev[i] > mean + 2 * sd) or (
            rev[i] < mean - 2 * sd
        )
    assert len(got) == len(expected)
    got = got.set_index("day")
    mismatches = [
        d for d, e in expected.items() if bool(got.loc[d, "is_breakout"]) != e
    ]
    assert not mismatches, mismatches[:5]


def test_sen_slope_matches_bruteforce(spark, duck):
    got = _run(spark, "stats_sen_slope").iloc[0]
    xs = duck.execute(
        """SELECT (date_part('year', o_orderdate) - 1995) * 12
                    + date_part('month', o_orderdate) - 1 AS m,
                  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
           FROM orders GROUP BY m ORDER BY m"""
    ).fetchall()
    import statistics

    slopes = [
        round((xj - xi) * 1e6 / (j - i))
        for (i, xi) in xs
        for (j, xj) in xs
        if i < j
    ]
    assert int(got["n_months"]) == len(xs)
    assert int(got["n_pairs"]) == len(slopes)
    med = statistics.median(slopes)  # interpolated for even counts
    assert abs(float(got["sen_slope"]) - round(med / 1e6 / 100.0, 6)) < 2e-6


def test_cuped_matches_bruteforce(spark, duck):
    got = _run(spark, "stats_cuped_adjustment").iloc[0]
    rows = duck.execute(
        """SELECT user_id,
                  SUM(CASE WHEN date_part('day', ts) <= 15
                      THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS x,
                  SUM(CASE WHEN date_part('day', ts) > 15
                      THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS y
           FROM events GROUP BY user_id"""
    ).df()
    x = rows["x"].astype(float)
    y = rows["y"].astype(float)
    n = len(rows)
    cov = (x * y).sum() - x.sum() * y.sum() / n
    varx = (x * x).sum() - x.sum() ** 2 / n
    vary = (y * y).sum() - y.sum() ** 2 / n
    theta = cov / varx
    ratio = 1.0 - cov * cov / (varx * vary)
    assert int(got["n"]) == n
    assert abs(float(got["theta"]) - theta) < 1e-4
    assert abs(float(got["adjusted_variance_ratio"]) - ratio) < 1e-4
    # CUPED must actually help on this fixture: rho^2 > 0
    assert float(got["adjusted_variance_ratio"]) < 1.0


def test_peak_concurrency_matches_bruteforce(spark, duck):
    got = _run(spark, "win_peak_concurrency").set_index("day")[
        "peak_concurrency"
    ]
    rows = duck.execute(
        "SELECT user_id, ts FROM events ORDER BY user_id, ts"
    ).df()
    # brute-force sessionize (30-min gap), then sweep
    sessions = []
    for _, grp in rows.groupby("user_id"):
        ts = list(grp["ts"])
        start = prev = ts[0]
        for t in ts[1:]:
            if (t - prev).total_seconds() > 1800:
                sessions.append((start, prev))
                start = t
            prev = t
        sessions.append((start, prev))
    bounds = [(s, 1) for s, _ in sessions] + [(e, -1) for _, e in sessions]
    bounds.sort(key=lambda p: (p[0], p[1]))
    live = 0
    peaks: dict = {}
    for t, d in bounds:
        live += d
        day = t.normalize() if hasattr(t, "normalize") else t
        peaks[day] = max(peaks.get(day, 0), live)
    assert len(got) == len(peaks)
    for day, peak in peaks.items():
        assert int(got.loc[day]) == peak, day
