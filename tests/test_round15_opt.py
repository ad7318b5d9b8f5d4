"""Round-15 optimization internals: reliable-checkpoint routing for the
scale-adaptive reuse cut (``SPARK_GRAFT_REUSE_DIR``), hardened env
parsing, the typed bare-leaf guard, and re-entrant/unset-restoring
``pinned_parallelism`` — results must be identical on every path."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

_FLAG = "spark.sql.adaptive.enabled"


def _fixture(spark):
    rows = [(g, v) for g in ("a", "b") for v in (1.0, 2.0, 2.0, 5.0, -3.0)]
    return spark.createDataFrame(rows, "g: string, v: double")


def test_reuse_dir_routes_to_reliable_checkpoint(spark, monkeypatch, tmp_path):
    from artigraph_spark.operators._adaptive import reuse_frame_cut

    ck = tmp_path / "reuse_ck"
    monkeypatch.setenv("SPARK_GRAFT_REUSE_MIN_BYTES", "0")
    monkeypatch.setenv("SPARK_GRAFT_REUSE_DIR", str(ck))
    df = _fixture(spark).groupBy("g").count()
    expected = sorted(map(tuple, df.collect()))
    cut, fired = reuse_frame_cut(df)
    assert fired and cut is not df
    assert sorted(map(tuple, cut.collect())) == expected
    # the cut went through the RELIABLE checkpoint dir, not executor blocks
    files = [p for p, _, fs in os.walk(ck) for _ in fs]
    assert files, "reliable checkpoint wrote nothing under SPARK_GRAFT_REUSE_DIR"


def test_reuse_dir_unset_keeps_local_path(spark, monkeypatch, tmp_path):
    from artigraph_spark.operators._adaptive import reuse_frame_cut

    monkeypatch.setenv("SPARK_GRAFT_REUSE_MIN_BYTES", "0")
    monkeypatch.delenv("SPARK_GRAFT_REUSE_DIR", raising=False)
    df = _fixture(spark).groupBy("g").count()
    cut, fired = reuse_frame_cut(df)
    assert fired
    assert "ExistingRDD" in cut._jdf.queryExecution().executedPlan().toString()


def test_malformed_threshold_env_falls_back(spark, monkeypatch):
    from artigraph_spark.operators._adaptive import reuse_frame

    monkeypatch.setenv("SPARK_GRAFT_REUSE_MIN_BYTES", "not-a-number")
    df = _fixture(spark).groupBy("g").count()
    out = reuse_frame(df)  # must not raise; default threshold -> no-op here
    assert out is df


def test_bare_scan_leaf_reports_no_cut(spark, monkeypatch, tmp_path):
    """A raw file-scan leaf above threshold is NOT silently counted as
    materialized: the guard reports cut=False (each consumer's pruned
    re-scan beats one full-width cache copy) and leaves the plan alone."""
    from artigraph_spark.operators._adaptive import reuse_frame_cut

    path = str(tmp_path / "scan.parquet")
    _fixture(spark).write.parquet(path)
    monkeypatch.setenv("SPARK_GRAFT_REUSE_MIN_BYTES", "0")
    monkeypatch.delenv("SPARK_GRAFT_REUSE_DIR", raising=False)
    scan = spark.read.parquet(path)
    out, fired = reuse_frame_cut(scan)
    assert out is scan and not fired


def test_already_cut_leaf_reports_cut_without_recut(spark, monkeypatch):
    from artigraph_spark.operators._adaptive import reuse_frame_cut

    monkeypatch.setenv("SPARK_GRAFT_REUSE_MIN_BYTES", "0")
    monkeypatch.delenv("SPARK_GRAFT_REUSE_DIR", raising=False)
    pre = _fixture(spark).groupBy("g").count().localCheckpoint(eager=True)
    out, fired = reuse_frame_cut(pre)
    # eagerly materialized LogicalRDD with real stats: no second copy
    assert fired and out is pre


def test_pinned_parallelism_nested_scopes(spark):
    from artigraph_spark.operators._adaptive import pinned_parallelism

    spark.conf.set(_FLAG, "true")
    try:
        with pinned_parallelism(spark):
            assert spark.conf.get(_FLAG) == "false"
            with pinned_parallelism(spark):  # re-entrant: no deadlock
                assert spark.conf.get(_FLAG) == "false"
            # inner exit must NOT restore early
            assert spark.conf.get(_FLAG) == "false"
        assert spark.conf.get(_FLAG) == "true"
    finally:
        spark.conf.unset(_FLAG)


def test_pinned_parallelism_restores_by_unset(spark):
    """A session that never explicitly set AQE gets its conf key back to
    UNSET (session default), never forced to a literal 'true'."""
    from artigraph_spark.operators._adaptive import pinned_parallelism

    spark.conf.unset(_FLAG)
    assert spark.conf.get(_FLAG, None) is None
    with pinned_parallelism(spark):
        assert spark.conf.get(_FLAG) == "false"
    assert spark.conf.get(_FLAG, None) is None


def test_pinned_parallelism_restores_explicit_value(spark):
    from artigraph_spark.operators._adaptive import pinned_parallelism

    spark.conf.set(_FLAG, "false")
    try:
        with pinned_parallelism(spark):
            assert spark.conf.get(_FLAG) == "false"
        assert spark.conf.get(_FLAG, None) == "false"
    finally:
        spark.conf.unset(_FLAG)


# --- r15 structural fusions: results identical on every code path ---
# (the spearman marginal-fusion experiment was REVERTED on end-to-end
# measurement — see OPTIMIZATION_r15.md; no fused path remains to test)


def test_winsorize_extreme_quantiles_do_not_clip(spark):
    """lo_q=0 / hi_q=1: the fused conditional aggregation must yield the
    group min/max (every cum >= ceil(0*n)=0; only the last value has
    cum = n), i.e. no row is clipped."""
    from artigraph_spark.operators.quality import winsorize

    df = _fixture(spark)
    out = winsorize(df, "g", "v", lo_q=0.0, hi_q=1.0).collect()
    assert all(r.value_clipped == r.v for r in out)


def test_markov_cut_path_matches_window_path(spark, monkeypatch):
    """The broadcast-total path (reuse cut fired) and the window path
    (below threshold) must produce identical stationary vectors."""
    from artigraph_spark.operators.timeseries import markov_stationary

    rows = []
    seq = ["a", "b", "a", "c", "b", "b", "a", "c", "c", "a", "b", "a"]
    for u in range(4):
        for i, s in enumerate(seq):
            rows.append((f"u{u}", float(1000 + i), s, i))
    df = spark.createDataFrame(rows, "user: string, ts: double, ev: string, eid: int")
    monkeypatch.setenv("SPARK_GRAFT_REUSE_MIN_BYTES", str(1 << 60))
    window_path = sorted(
        map(tuple, markov_stationary(df, "user", "ts", "ev", "eid", iterations=6).collect())
    )
    monkeypatch.setenv("SPARK_GRAFT_REUSE_MIN_BYTES", "0")
    cut_path = sorted(
        map(tuple, markov_stationary(df, "user", "ts", "ev", "eid", iterations=6).collect())
    )
    assert window_path == cut_path and len(window_path) == 3


def test_seasonal_reuse_output_parity(spark, monkeypatch):
    """reuse_output=True under a forced cut returns the identical frame
    content as the default lazy shape."""
    import datetime

    from artigraph_spark.operators.timeseries import seasonal_decompose

    rows = [
        (datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d, hours=h),)
        for d in range(21)
        for h in range(d % 5 + 1)
    ]
    df = spark.createDataFrame(rows, "ts: timestamp")
    base = sorted(map(tuple, seasonal_decompose(df, "ts", period=7).collect()))
    monkeypatch.setenv("SPARK_GRAFT_REUSE_MIN_BYTES", "0")
    fused = sorted(
        map(tuple, seasonal_decompose(df, "ts", period=7, reuse_output=True).collect())
    )
    assert base == fused and len(base) > 0


def test_pinned_parallelism_scale_adaptive(spark, monkeypatch, tmp_path):
    """The AQE pin fires only while the loop's estimated input is below
    SPARK_GRAFT_PIN_MAX_BYTES; data-bound loops keep the session's AQE
    (the r15 x30 measurement); LOOP_AQE=0/1 force either mode."""
    from artigraph_spark.operators._adaptive import pinned_parallelism

    # parquet-backed: the estimate comes from real file-length stats (a
    # driver-local relation counts as zero by design)
    path = str(tmp_path / "pin.parquet")
    _fixture(spark).write.parquet(path)
    df = spark.read.parquet(path)
    spark.conf.set(_FLAG, "true")
    try:
        monkeypatch.delenv("SPARK_GRAFT_LOOP_AQE", raising=False)
        # below threshold (default 256 MB): pinned
        with pinned_parallelism(spark, frame=df):
            assert spark.conf.get(_FLAG) == "false"
        # above threshold (forced to 1 byte): NOT pinned
        monkeypatch.setenv("SPARK_GRAFT_PIN_MAX_BYTES", "1")
        with pinned_parallelism(spark, frame=df):
            assert spark.conf.get(_FLAG) == "true"
        # LOOP_AQE=0 pins at any scale
        monkeypatch.setenv("SPARK_GRAFT_LOOP_AQE", "0")
        with pinned_parallelism(spark, frame=df):
            assert spark.conf.get(_FLAG) == "false"
        # LOOP_AQE=1 never pins
        monkeypatch.setenv("SPARK_GRAFT_LOOP_AQE", "1")
        monkeypatch.delenv("SPARK_GRAFT_PIN_MAX_BYTES", raising=False)
        with pinned_parallelism(spark, frame=df):
            assert spark.conf.get(_FLAG) == "true"
        # no frame: always pinned (caller opted out of the estimate)
        monkeypatch.delenv("SPARK_GRAFT_LOOP_AQE", raising=False)
        with pinned_parallelism(spark):
            assert spark.conf.get(_FLAG) == "false"
        assert spark.conf.get(_FLAG) == "true"
    finally:
        spark.conf.unset(_FLAG)
