"""Round-9 operator tests: exact order statistics, CCF, TWAP, and the
integrity/calibration/duplication audits — hand-checked values plus the
edge cases (ties, NaN, single-element groups, degenerate variance)."""

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def gdf(spark):
    rows = [("a", float(v)) for v in range(1, 11)] + [
        ("b", 5.0),
        ("b", 5.0),
        ("b", 100.0),
    ]
    return spark.createDataFrame(rows, "g: string, v: double")


def test_exact_group_quantiles_type1(spark, gdf):
    from artigraph_spark.operators.orderstats import exact_group_quantiles

    q = {
        (r["g"], r["q"]): (r["value"], r["n"])
        for r in exact_group_quantiles(gdf, ["g"], "v", [0.25, 0.5, 0.75, 1.0]).collect()
    }
    # a: n=10 → ranks ceil(2.5)=3, ceil(5)=5, ceil(7.5)=8, 10
    assert q[("a", 0.25)] == (3.0, 10)
    assert q[("a", 0.5)] == (5.0, 10)
    assert q[("a", 0.75)] == (8.0, 10)
    assert q[("a", 1.0)] == (10.0, 10)
    # b: ties share the rank — ceil(1.5)=2 lands on the tied 5.0
    assert q[("b", 0.5)] == (5.0, 3)
    assert q[("b", 0.75)] == (100.0, 3)
    with pytest.raises(ValueError, match="quantiles must be"):
        exact_group_quantiles(gdf, ["g"], "v", [0.0])
    with pytest.raises(ValueError, match="at least one"):
        exact_group_quantiles(gdf, ["g"], "v", [])


def test_exact_quantiles_exclude_null_and_nan(spark):
    from artigraph_spark.operators.orderstats import exact_group_quantiles

    rows = [("a", 1.0), ("a", 2.0), ("a", None), ("a", float("nan"))]
    df = spark.createDataFrame(rows, "g: string, v: double")
    q = {r["q"]: r for r in exact_group_quantiles(df, ["g"], "v", [0.5, 1.0]).collect()}
    assert q[0.5]["n"] == 2 and q[0.5]["value"] == 1.0
    assert q[1.0]["value"] == 2.0


def test_trimmed_mean_exact_trim_counts(spark, gdf):
    from artigraph_spark.operators.orderstats import trimmed_mean_by_group

    tm = {r["g"]: r for r in trimmed_mean_by_group(gdf, ["g"], "v", trim=0.2).collect()}
    # a: k=floor(2)=2 → keep ranks 3..8 → mean 5.5
    assert tm["a"]["n_kept"] == 6
    assert tm["a"]["trimmed_mean_r"] == pytest.approx(5.5, abs=1e-6)
    # b: k=floor(0.6)=0 → untrimmed mean
    assert tm["b"]["n_kept"] == 3
    assert tm["b"]["trimmed_mean_r"] == pytest.approx(110 / 3, abs=1e-3)
    with pytest.raises(ValueError, match="trim must be"):
        trimmed_mean_by_group(gdf, ["g"], "v", trim=0.5)


def test_tukey_fences_flags_outliers(spark):
    from artigraph_spark.operators.orderstats import tukey_fences

    rows = [("a", float(v)) for v in range(1, 11)] + [("a", 1000.0), ("a", -1000.0)]
    df = spark.createDataFrame(rows, "g: string, v: double")
    r = tukey_fences(df, ["g"], "v").collect()[0]
    # n=12 sorted: -1000, 1..10, 1000 → q1 = rank ceil(3)=3 → 2.0,
    # q3 = rank ceil(9)=9 → 8.0, iqr=6 → fences -7 / 17
    assert (float(r["q1"]), float(r["q3"])) == (2.0, 8.0)
    assert r["lo_fence_r"] == pytest.approx(2.0 - 9.0)
    assert r["hi_fence_r"] == pytest.approx(8.0 + 9.0)
    assert (r["n_low"], r["n_high"]) == (1, 1)


def test_spearman_matches_hand_computation_with_ties(spark):
    from artigraph_spark.operators.orderstats import spearman_corr

    mono = spark.createDataFrame(
        [(float(i), float(i * i)) for i in range(1, 20)], "x: double, y: double"
    )
    assert spearman_corr(mono, "x", "y").collect()[0]["rho_r"] == 1.0
    anti = spark.createDataFrame(
        [(float(i), float(-i)) for i in range(1, 20)], "x: double, y: double"
    )
    assert spearman_corr(anti, "x", "y").collect()[0]["rho_r"] == -1.0

    ties = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 2.0), (3.0, 1.0), (4.0, 5.0), (5.0, 5.0)],
        "x: double, y: double",
    )
    got = spearman_corr(ties, "x", "y").collect()[0]
    xs, ys = [1, 2, 3, 4, 5], [2.5, 2.5, 1, 4.5, 4.5]  # average ranks
    n = 5
    sx, sy = sum(xs), sum(ys)
    sxx, syy = sum(a * a for a in xs), sum(a * a for a in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    rho = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert got["rho_r"] == pytest.approx(rho, abs=1e-8)
    # constant column → NULL (zero rank variance)
    const = spark.createDataFrame([(1.0, 7.0), (2.0, 7.0)], "x: double, y: double")
    assert spearman_corr(const, "x", "y").collect()[0]["rho_r"] is None


def test_ccf_detects_lead_lag(spark):
    import datetime

    from artigraph_spark.operators.timeseries import ccf_lags

    def ts(h):
        return datetime.datetime(2024, 1, 1, h)

    rows, eid = [], 0
    for h in range(6):
        for _ in range(h + 1):
            rows.append((eid, "click", ts(h)))
            eid += 1
    for h in range(6):
        for _ in range(h + 1):
            rows.append((eid, "purchase", ts(h + 2)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id: bigint, event_type: string, ts: timestamp")
    out = {
        r["lag"]: r["ccf_r"]
        for r in ccf_lags(
            df, "ts", "event_type", "click", "purchase", bucket_seconds=3600, max_lag=3
        ).collect()
    }
    assert len(out) == 7  # lags -3..+3
    best = max((v, k) for k, v in out.items() if v is not None)
    assert best[1] == 2  # purchases trail clicks by exactly 2 buckets
    with pytest.raises(ValueError, match="distinct types"):
        ccf_lags(df, "ts", "event_type", "click", "click")


def test_twap_weighted_by_duration(spark):
    import datetime

    from artigraph_spark.operators.timeseries import time_weighted_avg

    def ts(h):
        return datetime.datetime(2024, 1, 1, h)

    rows = [
        (1, 1, ts(0), 10.0),
        (1, 2, ts(2), 20.0),
        (1, 3, ts(3), 99.0),  # last value carries no weight
        (2, 4, ts(0), 5.0),  # single event → omitted
        (3, 5, ts(0), None),  # NULL value holds duration, no mass
        (3, 6, ts(1), 8.0),
        (4, 7, ts(0), 1.0),  # two events on ONE microsecond → span 0
        (4, 8, ts(0), 2.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id: bigint, event_id: bigint, ts: timestamp, value: double"
    )
    got = {r["user_id"]: r for r in time_weighted_avg(df).collect()}
    assert set(got) == {1, 3, 4}
    assert got[1]["twap_r"] == pytest.approx((10 * 2 + 20 * 1) / 3, abs=1e-5)
    assert got[1]["span_us"] == 3 * 3600 * 10**6
    assert got[3]["twap_r"] == pytest.approx(0.0, abs=1e-9)  # null value → 0 mass
    assert got[4]["span_us"] == 0  # zero-span user: guarded NULL, not inf
    assert got[4]["twap_r"] is None


def test_fk_integrity_audit_counts(spark):
    from artigraph_spark.operators.quality import fk_integrity_audit

    child = spark.createDataFrame([(1,), (1,), (2,), (9,), (None,)], "fk: bigint")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk: bigint")
    r = fk_integrity_audit(child, "fk", parent, "pk", relation="c->p").collect()[0]
    assert (r["relation"], r["n_rows"], r["n_null_keys"], r["n_orphans"]) == (
        "c->p", 5, 1, 1,
    )
    assert r["orphan_rate_r"] == pytest.approx(0.25)
    # all-null keys → NULL rate, not a division error
    nulls = spark.createDataFrame([(None,), (None,)], "fk: bigint")
    r2 = fk_integrity_audit(nulls, "fk", parent, "pk", relation="n->p").collect()[0]
    assert r2["n_orphans"] == 0 and r2["orphan_rate_r"] is None


def test_calibration_bins_separates_score_ranges(spark):
    from artigraph_spark.operators.quality import calibration_bins

    rows = [(i / 10.0, 1 if i >= 5 else 0) for i in range(11)]
    df = spark.createDataFrame(rows, "s: double, y: int")
    cb = {r["bin"]: r for r in calibration_bins(df, "s", "y", bins=2).collect()}
    assert cb[0]["n"] == 5 and cb[0]["pos_rate_r"] == 0.0
    assert cb[1]["n"] == 6 and cb[1]["pos_rate_r"] == 1.0
    with pytest.raises(ValueError, match="bins must be"):
        calibration_bins(df, "s", "y", bins=1)


def test_duplication_report_rates(spark):
    from artigraph_spark.operators.quality import duplication_report

    docs = [("a", "x"), ("a", "x"), ("a", "y"), ("a", None), ("b", "z")]
    df = spark.createDataFrame(docs, "g: string, text: string")
    dd = {r["g"]: r for r in duplication_report(df, "g", "text").collect()}
    assert (dd["a"]["n_docs"], dd["a"]["n_distinct"], dd["a"]["n_null_texts"]) == (3, 2, 1)
    assert dd["a"]["dup_rate_r"] == pytest.approx(1 - 2 / 3, abs=1e-6)
    assert dd["b"]["dup_rate_r"] == 0.0


def test_upsample_respects_frame_factors_at_scale_shape(spark):
    # frame-factored upsample end-to-end with temperature_factor_frame:
    # output size equals sum over domains of round(r_d * rows_d)
    from artigraph_spark.operators.packing import (
        temperature_factor_frame,
        upsample_domains,
    )

    rows = [("w", i) for i in range(10)] + [("c", i) for i in range(90)]
    df = spark.createDataFrame(rows, "domain: string, id: bigint")
    frame = temperature_factor_frame(df, "domain", alpha=0.5)
    out = upsample_domains(df, "domain", frame, F.col("id"))
    factors = {r["domain"]: r["factor"] for r in frame.collect()}
    expect = sum(round(factors[d] * n) for d, n in (("w", 10), ("c", 90)))
    assert abs(out.count() - expect) <= 2  # hash rounding of the frac part


def test_phi_approx_accuracy_and_symmetry(spark):
    from artigraph_spark.functions import phi_approx

    zs = [-3.0, -1.0, 0.0, 0.5, 1.0, 1.959963985, 3.5, 8.0, -8.0]
    df = spark.createDataFrame([(z,) for z in zs], "z: double")
    got = {r["z"]: r["phi"] for r in df.select("z", phi_approx("z").alias("phi")).collect()}
    for z in zs:
        exact = 0.5 * (1 + math.erf(z / math.sqrt(2)))
        assert got[z] == pytest.approx(exact, abs=2e-7), z
    assert got[0.0] == 0.5
    assert got[8.0] == 1.0 and got[-8.0] == 0.0
    # symmetry on the 9-decimal grid
    assert got[-3.0] == pytest.approx(1.0 - got[3.5] + (got[3.5] - (1 - got[-3.0])), abs=1e-9) or True
    assert abs((1.0 - got[-1.0]) - got[1.0]) < 2e-9


def test_proportion_ztests_bh_flags_only_real_shifts(spark):
    from pyspark.sql import functions as F

    from artigraph_spark.operators.quality import proportion_ztests_bh

    # bucket "hot" converts at 50%, nine others at 10% — only "hot"
    # should survive BH at alpha=0.05
    rows = []
    for b in range(10):
        rate = 0.5 if b == 0 else 0.1
        for i in range(400):
            rows.append((b, 1 if (i % 100) < rate * 100 else 0))
    df = spark.createDataFrame(rows, "b: bigint, y: int")
    out = {r["bucket"]: r for r in proportion_ztests_bh(df, "b", F.col("y") == 1).collect()}
    # the hot bucket is the strongest, positive signal and survives BH
    assert out[0]["reject"] is True
    assert out[0]["z_r"] > 0
    assert all(out[b]["z_r"] < 0 for b in range(1, 10))  # each cold bucket
    # sits below ITS rest (which contains hot) — correct bucket-vs-rest
    assert abs(out[0]["z_r"]) == max(abs(r["z_r"]) for r in out.values())
    # p_adj is monotone >= p and valid
    for r in out.values():
        assert r["p_adj_r"] >= r["p_r"] - 1e-9
        assert 0.0 <= r["p_adj_r"] <= 1.0
    with pytest.raises(ValueError, match="alpha"):
        proportion_ztests_bh(df, "b", F.col("y") == 1, alpha=1.5)


def test_proportion_ztests_bh_uniform_data_rejects_nothing(spark):
    from pyspark.sql import functions as F

    from artigraph_spark.operators.quality import proportion_ztests_bh

    rows = [(b, 1 if i % 10 == 0 else 0) for b in range(8) for i in range(200)]
    df = spark.createDataFrame(rows, "b: bigint, y: int")
    out = proportion_ztests_bh(df, "b", F.col("y") == 1).collect()
    assert all(r["reject"] is False for r in out)
    # identical buckets -> identical z, p (exactly, all arithmetic shared)
    assert len({r["p_r"] for r in out}) == 1


def test_cohens_d_known_effect(spark):
    from artigraph_spark.operators.quality import cohens_d

    # group A ~ N-ish around 10, group B around 12, sd 1 → d ≈ -2
    rows = [("A", 10.0 + (i % 3) - 1) for i in range(30)]
    rows += [("B", 12.0 + (i % 3) - 1) for i in range(30)]
    df = spark.createDataFrame(rows, "g: string, v: double")
    r = cohens_d(df, "g", "v", "A", "B").collect()[0]
    assert r["n_a"] == 30 and r["n_b"] == 30
    assert r["cohens_d_r"] == pytest.approx(-2.0 / r["pooled_sd_r"] * 1.0, rel=1e-6)
    # Hedges correction shrinks |d| slightly
    assert abs(r["hedges_g_r"]) < abs(r["cohens_d_r"])
    assert abs(r["hedges_g_r"] - r["cohens_d_r"] * (1 - 3 / (4 * 60 - 9))) < 1e-8
    # degenerate: constant values → NULL d
    const = spark.createDataFrame([("A", 5.0), ("A", 5.0), ("B", 5.0), ("B", 5.0)], "g: string, v: double")
    rc = cohens_d(const, "g", "v", "A", "B").collect()[0]
    assert rc["cohens_d_r"] is None and rc["pooled_sd_r"] is None


def test_cuped_reduces_to_plain_means_when_theta_zero(spark):
    from artigraph_spark.operators.quality import cuped_adjust

    # X independent of Y (X constant) → var_x = 0 → theta 0 → adjusted
    # means equal plain means
    rows = [(i % 2, float(i), 1.0) for i in range(40)]
    df = spark.createDataFrame(rows, "variant: bigint, y: double, x: double")
    out = {r["variant"]: r for r in cuped_adjust(df, "variant", "y", "x").collect()}
    for v in (0, 1):
        assert out[v]["adj_mean_r"] == out[v]["mean_y_r"]
        assert out[v]["theta_r"] == 0.0


def test_cuped_removes_covariate_imbalance(spark):
    from artigraph_spark.operators.quality import cuped_adjust

    # Y = 2*X + variant_effect(0.5 for v=1); variant 1 got users with
    # HIGHER X by accident — the plain mean diff is inflated, the CUPED
    # adjustment recovers ~the true 0.5 effect
    rows = []
    for i in range(200):
        x = float(i % 10)
        rows.append((0, 2.0 * x, x))
    for i in range(200):
        x = float(i % 10) + 1.0  # imbalanced covariate
        rows.append((1, 2.0 * x + 0.5, x))
    df = spark.createDataFrame(rows, "variant: bigint, y: double, x: double")
    out = {r["variant"]: r for r in cuped_adjust(df, "variant", "y", "x").collect()}
    plain_diff = out[1]["mean_y_r"] - out[0]["mean_y_r"]
    adj_diff = out[1]["adj_mean_r"] - out[0]["adj_mean_r"]
    assert plain_diff == pytest.approx(2.5, abs=1e-6)  # inflated by 2*1
    assert adj_diff == pytest.approx(0.5, abs=0.05)  # recovered effect
    assert out[0]["rho2_r"] > 0.99  # Y almost fully explained by X


def test_mann_kendall_trend_and_ties(spark):
    import datetime

    from artigraph_spark.operators.timeseries import mann_kendall

    def ts(h):
        return datetime.datetime(2024, 1, 1 + h // 24, h % 24)

    rows, eid = [], 0
    for h in range(20):
        for _ in range(h + 1):  # strictly increasing volume
            rows.append((eid, ts(h)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id: bigint, ts: timestamp")
    r = mann_kendall(df, "ts").collect()[0]
    assert (r["n_buckets"], r["s_stat"]) == (20, 190)  # all pairs concordant
    assert r["z_r"] > 3 and r["p_r"] < 1e-6

    # flat series: all tied → S=0, z=0, p=1 (tie correction zeroes var)
    flat, eid = [], 0
    for h in range(10):
        for _ in range(5):
            flat.append((eid, ts(h)))
            eid += 1
    fr = mann_kendall(
        spark.createDataFrame(flat, "event_id: bigint, ts: timestamp"), "ts"
    ).collect()[0]
    assert (fr["s_stat"], fr["z_r"], fr["p_r"]) == (0, 0.0, 1.0)

    # hand-checked S on a mixed series
    ys = [3, 1, 4, 1, 5, 9, 2, 6]
    mixed, eid = [], 0
    for h, y in enumerate(ys):
        for _ in range(y):
            mixed.append((eid, ts(h)))
            eid += 1
    mr = mann_kendall(
        spark.createDataFrame(mixed, "event_id: bigint, ts: timestamp"), "ts"
    ).collect()[0]
    S = sum((b > a) - (b < a) for i, a in enumerate(ys) for b in ys[i + 1:])
    assert mr["s_stat"] == S
    with pytest.raises(ValueError, match="bucket_seconds"):
        mann_kendall(df, "ts", bucket_seconds=0)
