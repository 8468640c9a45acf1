"""Curation + dataset release: keep-table parity with the gate's
curation_pipeline composition, manifest determinism, and the commit
contract of write_release."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.curation import curate, write_release

SF = "/root/testdata/sf0.001"
WEIGHTS = {"train": 0.9, "val": 0.05, "test": 0.05}


@pytest.fixture(scope="module")
def docs(spark):
    import __spark_entry__ as E

    return E._messy_urls(spark, SF)


def test_curate_matches_gate_composition(spark, docs):
    """curate() with the gate's thresholds must reproduce the
    curation_pipeline driver query exactly (same keep set, same splits)."""
    import __spark_entry__ as E

    got = sorted(
        (r["doc_id"], r["split"])
        for r in curate(
            docs, WEIGHTS,
            q_min=E.CURATION_Q_MIN, rep_max=E.CURATION_REP_MAX,
        ).collect()
    )
    want = sorted(
        (r["doc_id"], r["split"])
        for r in E.q_curation_pipeline(spark, SF).collect()
    )
    assert got == want and len(got) > 0


def test_curate_optional_stages_shrink_keepset(spark, docs):
    import __spark_entry__ as E

    base = curate(
        docs, WEIGHTS,
        q_min=E.CURATION_Q_MIN, rep_max=E.CURATION_REP_MAX,
    )
    capped = curate(
        docs, WEIGHTS,
        q_min=E.CURATION_Q_MIN, rep_max=E.CURATION_REP_MAX,
        domain_cap_n=5,
    )
    weighted = curate(
        docs, WEIGHTS,
        q_min=E.CURATION_Q_MIN, rep_max=E.CURATION_REP_MAX,
        weight_col=F.lit(0.5),
    )
    base_ids = {r["doc_id"] for r in base.collect()}
    cap_ids = {r["doc_id"] for r in capped.collect()}
    w_ids = {r["doc_id"] for r in weighted.collect()}
    assert cap_ids < base_ids  # quota genuinely drops same-domain docs
    assert w_ids < base_ids  # downsampling drops ~half
    assert 0 < len(w_ids) < len(base_ids)


def test_write_release_manifest_matches_data(spark, docs, tmp_path):
    import __spark_entry__ as E

    keep = curate(
        docs, WEIGHTS,
        q_min=E.CURATION_Q_MIN, rep_max=E.CURATION_REP_MAX,
    )
    out = str(tmp_path / "rel")
    manifest = write_release(docs, keep, out)
    # commit marker present and identical to the returned dict
    with open(os.path.join(out, "_MANIFEST.json")) as fh:
        assert json.load(fh) == {
            s: dict(m) for s, m in manifest.items()
        }
    back = spark.read.parquet(os.path.join(out, "data"))
    for split, m in manifest.items():
        part = back.filter(F.col("split") == split)
        assert part.count() == m["n_docs"]
        assert part.agg(F.sum(F.length("text"))).collect()[0][0] == m["n_chars"]
    assert back.count() == keep.count()
    # released rows carry the full attribute schema + split
    assert set(back.columns) >= {"doc_id", "text", "lang", "split"}


def test_write_release_checksum_is_layout_independent(spark, docs, tmp_path):
    import __spark_entry__ as E

    keep = curate(
        docs, WEIGHTS,
        q_min=E.CURATION_Q_MIN, rep_max=E.CURATION_REP_MAX,
    )
    m1 = write_release(docs, keep, str(tmp_path / "a"))
    m2 = write_release(
        docs.repartition(13), keep.repartition(7), str(tmp_path / "b")
    )
    assert m1 == m2  # partitioning/write order must not change the release
