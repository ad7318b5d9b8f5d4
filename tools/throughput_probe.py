"""Single-node throughput comparison on the Q1-shaped pricing summary at a
given SF: (a) reference-style execution (driver-local Python over
list[dict] rows — how artigraph's shipped JSON/pickle views compute,
/root/reference/src/arti/io/json_localfile_python.py), (b) this engine
(Spark DataFrame), (c) DuckDB (the oracle engine) as the in-process
columnar yardstick.

Usage: python tools/throughput_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from artigraph_spark.queries import queries
from artigraph_spark.session import get_spark


def python_rows_q1(rows: list[dict]) -> dict:
    """The computation a reference user writes inside build() over the
    list[dict] view (single thread, row-at-a-time) — same 7 aggregates as
    the Spark/DuckDB sides (avg_qty/avg_disc derive from sums + count)."""
    acc: dict = defaultdict(lambda: [0.0, 0.0, 0.0, 0.0, 0.0, 0])
    cutoff = "1998-09-02"
    for r in rows:
        if str(r["l_shipdate"])[:10] <= cutoff:
            k = (r["l_returnflag"], r["l_linestatus"])
            a = acc[k]
            disc_price = r["l_extendedprice"] * (1 - r["l_discount"])
            a[0] += r["l_quantity"]
            a[1] += r["l_extendedprice"]
            a[2] += disc_price
            a[3] += disc_price * (1 + r["l_tax"])
            a[4] += r["l_discount"]
            a[5] += 1
    return dict(acc)


def python_rows_tumbling(rows: list[dict]) -> dict:
    """Hourly tumbling-window counts/sums as a reference user writes them:
    single-thread dict loop over list[dict] event rows."""
    acc: dict = defaultdict(lambda: [0, 0.0])
    for r in rows:
        bucket = str(r["ts"])[:13]  # YYYY-mm-dd HH
        a = acc[(bucket, r["event_type"])]
        a[0] += 1
        a[1] += r["value"]
    return dict(acc)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    def pq(name: str) -> str:
        # Single-file fixtures and directory (multi-file) scale copies.
        path = f"{sf_dir}/{name}.parquet"
        return f"{path}/*.parquet" if os.path.isdir(path) else path

    con = duckdb.connect()
    rel = con.sql(f"SELECT * FROM '{pq('lineitem')}'")
    cols = rel.columns
    dict_rows = [dict(zip(cols, r)) for r in rel.fetchall()]
    n_rows = len(dict_rows)

    t0 = time.perf_counter()
    python_rows_q1(dict_rows)
    t_python = time.perf_counter() - t0
    # Free the multi-GB python row copies before timing the other engines —
    # resident garbage perturbs exactly what we're measuring.
    del dict_rows

    t0 = time.perf_counter()
    con.sql(
        f"""SELECT l_returnflag, l_linestatus, sum(l_quantity), sum(l_extendedprice),
            sum(l_extendedprice*(1-l_discount)), sum(l_extendedprice*(1-l_discount)*(1+l_tax)),
            avg(l_quantity), avg(l_discount), count(*)
            FROM '{pq('lineitem')}'
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus"""
    ).fetchall()
    t_duckdb = time.perf_counter() - t0

    spark = get_spark("throughput_probe")
    q = queries()["agg_pricing_summary"]
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    t_spark = time.perf_counter() - t0

    # Second workload: hourly tumbling-window analytics over events (the
    # time-series shape of a reference producer body).
    ev = con.sql(f"SELECT * FROM '{pq('events')}'")
    ev_rows = [dict(zip(ev.columns, r)) for r in ev.fetchall()]
    n_events = len(ev_rows)
    t0 = time.perf_counter()
    python_rows_tumbling(ev_rows)
    t_python_tumbling = time.perf_counter() - t0
    del ev_rows

    t0 = time.perf_counter()
    con.sql(
        f"""SELECT time_bucket(INTERVAL '1 hour', ts) AS b, event_type,
            count(*), sum(value)
            FROM '{pq('events')}' GROUP BY 1, 2"""
    ).fetchall()
    t_duckdb_tumbling = time.perf_counter() - t0

    qt = queries()["window_tumbling"]
    qt(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    qt(spark, sf_dir).write.format("noop").mode("overwrite").save()
    t_spark_tumbling = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "rows": n_rows,
                "reference_style_python_sec": round(t_python, 3),
                "spark_engine_sec": round(t_spark, 3),
                "duckdb_sec": round(t_duckdb, 3),
                "speedup_vs_reference_style": round(t_python / t_spark, 1),
                "tumbling": {
                    "rows": n_events,
                    "reference_style_python_sec": round(t_python_tumbling, 3),
                    "spark_engine_sec": round(t_spark_tumbling, 3),
                    "duckdb_sec": round(t_duckdb_tumbling, 3),
                    "speedup_vs_reference_style": round(
                        t_python_tumbling / t_spark_tumbling, 1
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
