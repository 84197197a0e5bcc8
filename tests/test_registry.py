"""Driver-contract surface: registry shape + a sampled oracle replay.

The full gate is tools/oracle_check.py (all queries, sf0.01); this
keeps a fast representative slice inside pytest.
"""

import duckdb
import pytest

import __spark_entry__ as entrypoint

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

SAMPLE = ["session_stats", "inference_cadence", "dedup_exact", "asof_join"]


def test_contract_shape():
    qs = entrypoint.queries()
    osql = entrypoint.oracle_sql()
    assert len(qs) >= 30
    assert set(osql) <= set(qs)
    # every oracle-less query is a deliberate rows-only registration
    assert set(qs) - set(osql) == {"approx_distinct_users", "video_scan"}


def test_entry_returns_rows(spark):
    df = entrypoint.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, sf_dir, name):
    qs, osql = entrypoint.queries(), entrypoint.oracle_sql()
    sdf = qs[name](spark, sf_dir).toPandas()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    odf = con.execute(osql[name]).df()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    key = sorted(sdf.columns)
    a = sdf.reindex(key, axis=1).sort_values(key).reset_index(drop=True)
    b = odf.reindex(key, axis=1).sort_values(key).reset_index(drop=True)
    b = b.astype(a.dtypes.to_dict())
    assert a.equals(b)
