"""Catalog smoke + oracle cross-check at sf0.001 (fast tier of the
driver's t2 gate; tools/selfcheck.py is the full replica).
"""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from nexus_event_stream_spark.plans.catalog import CATALOG
from nexus_event_stream_spark.schemas import TABLE_NAMES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def norm(v):
    import datetime
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return str(v)


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_catalog_query_matches_oracle(spark, duck, name):
    spec = CATALOG[name]
    sdf = spec.build(spark, SF_DIR)
    srows = sdf.collect()
    if spec.oracle is None:
        assert srows is not None  # rows-only: runs and is collectable
        return
    rel = duck.sql(spec.oracle)
    drows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert len(srows) == len(drows)
    order = sorted(sdf.columns)
    sidx = [sdf.columns.index(c) for c in order]
    didx = [rel.columns.index(c) for c in order]
    ms = Counter("|".join(norm(r[i]) for i in sidx) for r in srows)
    md = Counter("|".join(norm(r[i]) for i in didx) for r in drows)
    assert ms == md
