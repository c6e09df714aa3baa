"""DuckDB-oracle comparison harness mirroring the driver's correctness gate:
row-count + schema-shape + order-insensitive value comparison between a
Spark DataFrame and a DuckDB SQL result over the same parquet tables."""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def duck_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_value(v):
    # Type-faithful and exact: the driver gate compares arrow-typed values,
    # so an int64 vs decimal128 (DuckDB HUGEINT from SUM(int)) or a
    # last-ulp float difference must FAIL here too, not be masked.
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "b:t" if v else "b:f"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_canon_value(r[i]) for i in order) for r in rows
    )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    """Raise AssertionError with a useful diff on any mismatch.

    Set JCS_DEBUG_COMPARE=1 to add transient-result diagnostics (double
    re-collect + plan dump) on failure — off by default so a mismatch
    fails fast with the original traceback.
    """
    import os

    try:
        _compare_once(spark_df, con, sql)
    except AssertionError as e:
        if not os.environ.get("JCS_DEBUG_COMPARE"):
            raise
        # diagnostic: is the Spark result transient (recompute differs)?
        n1 = len(spark_df.collect())
        n2 = len(spark_df.collect())
        try:
            plan = spark_df._jdf.queryExecution().toString()
            open("/tmp/failing_plan.txt", "w").write(plan)
        except Exception:
            pass
        raise AssertionError(
            f"{e}; recollects={n1},{n2} "
            f"(transient miss if these differ from the failing count)"
        ) from e


def _compare_once(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = [c.lower() for c in rel.columns]
    # Fetch through arrow, not fetchall(): fetchall() coerces HUGEINT to a
    # plain Python int, hiding exactly the type mismatch the driver detects.
    d_tbl = rel.arrow()
    d_rows = list(zip(*(c.to_pylist() for c in d_tbl.columns)))
    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    )
    a = _canon_rows(s_cols, s_rows)
    b = _canon_rows(d_cols, d_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(
            f"value mismatch; first diffs (spark vs duck): {diffs}"
        )
