"""The extra registry (single-operator variants folded out of the
50-entry driver registry) must keep full oracle parity — same
count/columns/values contract the driver gate applies, run here at
sf0.001 so the whole suite stays fast."""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

_spec = importlib.util.spec_from_file_location(
    "check_gate",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "check_gate.py",
    ),
)
_cg = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_cg)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in _cg.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(E.extra_queries()))
def test_extra_query_matches_oracle(spark, duck, name):
    fn = E.extra_queries()[name]
    sdf = fn(spark, SF_DIR)
    scols = sdf.columns
    stypes = {
        f.name: _cg.canon_type(f.dataType.simpleString())
        for f in sdf.schema.fields
    }
    srows = [tuple(r) for r in sdf.collect()]

    if name not in E.extra_oracle_sql():
        # Genuinely non-SQL-expressible op (iterative global argmax —
        # recursive CTEs cannot aggregate over the recursive term), the
        # same rows-only contract the driver applies. Value-level parity
        # for these is pinned in the op's own test module (test_bpe.py:
        # driver loop == distributed loop == naive reference).
        assert len(srows) > 0, f"{name}: rows-only entry returned 0 rows"
        return

    rel = duck.sql(E.extra_oracle_sql()[name])
    dcols = list(rel.columns)
    dtypes = {c: _cg.canon_type(str(t)) for c, t in zip(rel.columns, rel.types)}
    drows = rel.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert stypes == dtypes, f"{name}: result types drift"
    assert len(srows) == len(drows), f"{name}: row counts differ"
    assert _cg.norm_rows(scols, srows) == _cg.norm_rows(dcols, drows), (
        f"{name}: values differ"
    )
