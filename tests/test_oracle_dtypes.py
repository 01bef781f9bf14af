"""Oracle dtype gate: no DuckDB oracle twin may emit HUGEINT columns.

DuckDB SUM()/integer-division over integers returns HUGEINT (int128);
the driver's pandas-side canonicalization materializes that as
float/object and hash-mismatches Spark's BIGINT even when values are
identical (round-1 tpch_q12). ORACLE_QUERIES post-processing wraps the
affected output columns with CAST(... AS BIGINT); this test pins the
whole class at zero so it can't regress as queries are added.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from clickhouse_forecasting_spark.queries import ORACLE_QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
BAD = ("HUGEINT", "UHUGEINT", "INT128", "UINT128")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_profile_oracle_columns_match_fixture_schema(con):
    """q_profile_orders_columns iterates the live orders schema while its
    oracle hardcodes the column list; pin them together so a fixture
    schema change can't silently drop oracle rows."""
    from clickhouse_forecasting_spark.queries import _profile_sql

    fixture_cols = [
        r[0] for r in con.execute("DESCRIBE SELECT * FROM orders").fetchall()
    ]
    oracle_cols = [
        r[0] for r in con.execute(
            f"SELECT DISTINCT column_name FROM ({_profile_sql()})"
        ).fetchall()
    ]
    assert sorted(oracle_cols) == sorted(fixture_cols)


def test_embedding_dim_matches_fixture(con):
    """The hyperplane constants baked into the LSH oracle SQL are generated
    for _EMB_DIM dimensions; pin that to the parquet fixture."""
    from clickhouse_forecasting_spark.queries import _EMB_DIM

    dims = con.execute(
        "SELECT DISTINCT len(embedding) FROM embeddings"
    ).fetchall()
    assert dims == [(_EMB_DIM,)]


def test_documents_text_is_ascii_and_nonempty(con):
    """multimodal_frames_audit's oracle slices text by CHARS while the
    Spark sampler slices the utf-8 payload by BYTES; they coincide only
    for pure-ASCII fixtures, so pin that (and non-emptiness, which the
    sampler's corrupt-payload path assumes)."""
    bad = con.execute(
        "SELECT COUNT(*) FROM documents "
        "WHERE text IS NULL OR strlen(text) <> length(text) OR length(text) = 0"
    ).fetchone()[0]
    assert bad == 0  # NULL text would also desync md5(str(text)) twins
    # multimodal_features' oracle assumes the STUB decode path for every
    # doc; a text starting with the BMP magic would be sniffed by the
    # real decoder (raise -> NULL features) and diverge from the twin.
    bm = con.execute(
        "SELECT COUNT(*) FROM documents WHERE text LIKE 'BM%'"
    ).fetchone()[0]
    assert bm == 0


def test_no_hugeint_oracle_columns(con):
    offenders = {}
    for name, sql in ORACLE_QUERIES.items():
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
        bad = [(r[0], str(r[1])) for r in desc
               if any(b in str(r[1]).upper() for b in BAD)]
        if bad:
            offenders[name] = bad
    assert not offenders, f"oracle twins emitting HUGEINT: {offenders}"
