"""Oracle/engine type-contract tests (round-6, per r5 verdict item 5).

The r5 driver window recorded five ``hash_match: false`` rows whose values
were verified correct — the divergence was purely *type-system*: DuckDB's
``SUM`` over BIGINT yields HUGEINT (int128), which the driver's arrow fetch
renders as ``Decimal``/float while Spark emits a plain int.  Value tests
can't catch that class of bug, so these tests pin the schema contract:

1. no registered oracle may plan a HUGEINT/UHUGEINT output column, and
2. every oracle's DuckDB result schema must map 1:1 (by column name) onto
   the Spark query's result schema under the driver's canon — int↔int,
   double↔double, no silent widenings.

Both sides are checked *lazily* (DuckDB binder types + Spark analyzed
schema), so the whole 150-oracle registry is swept in seconds with no
query execution.
"""

from __future__ import annotations

import duckdb
import pytest

from artigraph_spark.queries import REGISTRY, _load_modules
from artigraph_spark.sources import TABLES

SF_DIR = "/root/testdata/sf0.001"

# DuckDB type string (prefix) -> compatible Spark simpleString prefixes.
# The driver canonicalizes values before hashing, so types need not be
# identical — they must render identically: any int width matches any int
# width, float32 matches float64, VARCHAR matches string, etc.  HUGEINT is
# deliberately absent: it renders as Decimal through arrow and is always a
# contract violation.
_COMPAT: dict[str, tuple[str, ...]] = {
    "TINYINT": ("tinyint", "smallint", "int", "bigint"),
    "SMALLINT": ("tinyint", "smallint", "int", "bigint"),
    "INTEGER": ("tinyint", "smallint", "int", "bigint"),
    "BIGINT": ("tinyint", "smallint", "int", "bigint"),
    "UTINYINT": ("tinyint", "smallint", "int", "bigint"),
    "USMALLINT": ("tinyint", "smallint", "int", "bigint"),
    "UINTEGER": ("int", "bigint"),
    "UBIGINT": ("bigint",),
    "FLOAT": ("float", "double"),
    "DOUBLE": ("float", "double"),
    "DECIMAL": ("decimal", "double", "float"),
    "VARCHAR": ("string",),
    "BOOLEAN": ("boolean",),
    "DATE": ("date",),
    "TIMESTAMP": ("timestamp",),
    "BLOB": ("binary",),
}


def _load_oracle_defs():
    _load_modules()
    return sorted(
        (name, qd) for name, qd in REGISTRY.items() if qd.oracle is not None
    )


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def test_no_hugeint_in_any_oracle(duck):
    """DuckDB SUM(BIGINT) → HUGEINT is the exact bug class behind the five
    r5 driver fails; every oracle aggregate must CAST back to BIGINT."""
    offenders = []
    for name, qd in _load_oracle_defs():
        rel = duck.sql(qd.oracle)
        for col, typ in zip(rel.columns, rel.types):
            if str(typ) in ("HUGEINT", "UHUGEINT"):
                offenders.append((name, col))
    assert offenders == [], (
        "oracles with HUGEINT output columns (wrap the aggregate in "
        f"CAST(... AS BIGINT)): {offenders}"
    )


@pytest.mark.slow
def test_oracle_schema_maps_onto_spark_schema(spark, duck):
    """Name-by-name type compatibility between each oracle's DuckDB plan
    and the Spark query's analyzed schema.  Lazy on both sides — Spark
    ``df.schema`` resolves without executing the job."""
    mismatches = []
    for name, qd in _load_oracle_defs():
        rel = duck.sql(qd.oracle)
        duck_types = dict(zip(rel.columns, (str(t) for t in rel.types)))
        try:
            sdf = qd.fn(spark, SF_DIR)
        except Exception as e:  # pragma: no cover - construction failure
            mismatches.append((name, f"spark build error: {e}"))
            continue
        spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema}
        if sorted(duck_types) != sorted(spark_types):
            mismatches.append(
                (name, f"columns {sorted(duck_types)} vs {sorted(spark_types)}")
            )
            continue
        for col, dt in duck_types.items():
            st = spark_types[col]
            base = dt.split("(")[0]
            allowed = _COMPAT.get(base)
            if allowed is None:
                mismatches.append((name, f"{col}: unmapped duckdb type {dt}"))
            elif not st.startswith(allowed):
                mismatches.append(
                    (name, f"{col}: duckdb {dt} vs spark {st}")
                )
    assert mismatches == [], mismatches
