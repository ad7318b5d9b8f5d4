"""Local replica of the driver's t2 correctness gate.

Runs every query in artigraph_spark.queries against its DuckDB oracle at a
given SF dir and reports row-count / column / value-hash comparisons, with
first-diff details on mismatch.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from artigraph_spark.queries import REGISTRY, queries  # noqa: E402
from artigraph_spark.session import get_spark  # noqa: E402
from artigraph_spark.sources import TABLES  # noqa: E402


def canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # + 0.0 folds -0.0 (and tiny negatives rounded to it) into 0.0 —
        # '-0.000000000' vs '0.000000000' is a spurious mismatch.
        return f"{round(v, 9) + 0.0:.9f}"
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return f"{round(float(v), 9) + 0.0:.9f}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(",".join(canon_value(r[i]) for i in order) for r in rows)
    return out


def run(sf_dir: str, only: list[str]) -> int:
    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = queries()
    names = only or sorted(qs)
    n_fail = 0
    for name in names:
        qd = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            n_fail += 1
            continue
        if qd.oracle is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            ores = con.sql(qd.oracle)
            bad = [
                (c, str(t))
                for c, t in zip(ores.columns, ores.types)
                if str(t) in ("HUGEINT", "UHUGEINT")
            ]
            if bad:
                # DuckDB SUM over BIGINT yields HUGEINT (int128); fetched
                # through arrow (the driver's path) it renders as
                # Decimal/float where Spark emits int — guaranteed hash
                # mismatch.  Oracles must CAST(SUM(...) AS BIGINT).
                print(f"FAIL {name}: oracle schema has HUGEINT column(s) {bad}")
                n_fail += 1
                continue
            # Fetch through arrow, the same path the driver uses, so
            # type-rendering artifacts (Decimal, float widening) surface
            # locally instead of only in the driver window.
            otbl = ores.fetch_arrow_table()
            ocols = otbl.column_names
            orows = [
                tuple(rec[c] for c in ocols) for rec in otbl.to_pylist()
            ]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        ok = True
        if len(srows) != len(orows):
            print(f"FAIL {name}: row count spark={len(srows)} duckdb={len(orows)}")
            ok = False
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duckdb={sorted(ocols)}")
            ok = False
        if ok:
            sc = canon_rows(scols, [tuple(r) for r in srows])
            oc = canon_rows(ocols, orows)
            if sc != oc:
                ok = False
                h1 = hashlib.sha256("\n".join(sc).encode()).hexdigest()[:10]
                h2 = hashlib.sha256("\n".join(oc).encode()).hexdigest()[:10]
                print(f"FAIL {name}: value hash spark={h1} duckdb={h2}")
                diffs = [(a, b) for a, b in zip(sc, oc) if a != b]
                for a, b in diffs[:3]:
                    print(f"   spark : {a[:200]}")
                    print(f"   duckdb: {b[:200]}")
                if len(sc) != len(oc):
                    print(f"   (row canon lens {len(sc)} vs {len(oc)})")
        if ok:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")
        else:
            n_fail += 1
    print(f"\n{len(names) - n_fail}/{len(names)} passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]
    sys.exit(run(sf_dir, only))
