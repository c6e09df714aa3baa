"""Every queries() entry must match its oracle_sql() on DuckDB at sf0.001 —
the same gate the driver runs at sf0.01 (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare, duck_conn

SF_DIR = "/root/testdata/sf0.001"


def _entry_maps():
    import __spark_entry__ as entry

    return entry.queries(), entry.oracle_sql()


QUERIES, ORACLES = _entry_maps()


@pytest.fixture(scope="module")
def con():
    c = duck_conn(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, con, name):
    df = QUERIES[name](spark, SF_DIR)
    compare(df, con, ORACLES[name])


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_gate_order_is_least_recently_green_first():
    """The driver samples a prefix-biased subset of queries() per round, so
    insertion order decides freshness of gate evidence. The order must be
    non-decreasing in last-green round (never-green entries first), derived
    from the committed CORRECTNESS_r*.json artifacts — self-rotating, no
    hand-maintained list to rot (r03 ADVICE)."""
    import __spark_entry__ as entry

    last = entry._last_green_rounds()
    rounds = [last.get(name, 0) for name in QUERIES]
    assert rounds == sorted(rounds), rounds
    # Sanity: artifacts exist and name real queries (renames would orphan
    # their history and re-prioritize the new name — loud here, not silent).
    assert last, "no CORRECTNESS_r*.json parsed — gate ordering is blind"
    known = set(last) & set(QUERIES)
    assert len(known) >= len(last) * 0.9, sorted(set(last) - set(QUERIES))


def test_outputs_are_driver_hashable(spark):
    """The external gate's canonicalizer sorts a pandas frame of the result;
    array/struct/map columns make that die with `unhashable type: 'list'`
    (the one red r02 row). Every gated query must emit atomic columns only.
    No result materialization — though the iterative/eagerly-checkpointed
    queries (the two CC ones and emb_ivf_topk's centroid training) do run
    Spark jobs at DataFrame-construction time."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = []
    for name in sorted(QUERIES):
        df = QUERIES[name](spark, SF_DIR)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, f"non-scalar output columns (driver cannot hash): {bad}"


def test_rows_only_queries_run(spark):
    """Entries without an oracle still must execute and return a DataFrame."""
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name
