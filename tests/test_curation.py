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


# ---------------------------------------------------------------------------
# C4 line-level cleaning (Raffel et al. 2020 §2.2; operators/curation.py)
# ---------------------------------------------------------------------------


def test_c4_clean_line_and_doc_rules(spark):
    from search_engine_spark.operators.curation import c4_clean

    good = "\n".join(
        f"This is a complete factual sentence number {i}." for i in range(6)
    )
    rows = [
        (0, good),
        (1, good + "\nHome | About | Contact"),       # nav line dropped
        (2, good + "\nPlease enable JavaScript now."),  # javascript line
        (3, good + "\nShort one."),                    # <3 words dropped
        (4, "Lorem ipsum dolor sit amet.\n" + good),   # doc: lorem
        (5, good.replace("number 3", "number {3}")),   # doc: brace
        (6, "Only two real sentences here. And the second one."),  # <5 sent
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["docid"]: r.asDict() for r in c4_clean(df).collect()}
    assert got[0]["kept"] and got[0]["drop_reason"] == ""
    assert got[0]["clean_text"] == good and got[0]["n_sentences"] == 6
    assert got[1]["kept"] and got[1]["n_kept_lines"] == 6  # nav line gone
    assert got[2]["kept"] and "JavaScript" not in got[2]["clean_text"]
    assert got[3]["kept"] and got[3]["n_kept_lines"] == 6
    assert not got[4]["kept"] and got[4]["drop_reason"] == "lorem"
    assert not got[5]["kept"] and got[5]["drop_reason"] == "brace"
    assert not got[6]["kept"] and got[6]["drop_reason"] == "sentences"


def test_c4_clean_duckdb_mirror(spark):
    import duckdb
    import pandas as pd

    from search_engine_spark.operators.curation import c4_clean, c4_clean_sql

    rows = [
        (0, "A good long sentence ends here.\nmenu item\nAnother one lands"
            " fine!\nAnd more of them keep coming through now."
            "\nFour sentences might not be enough yet?\nFinal full stop."),
        (1, "all lines lack punctuation\nso nothing survives"),
        (2, 'Quoted line ends well."\nThis braceless doc still needs '
            "sentences. One. Two. Three. Four."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in c4_clean(df).collect())
    con = duckdb.connect()
    con.register("cdocs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(
        tuple(r) for r in con.execute(c4_clean_sql(table="cdocs")).fetchall()
    )
    assert got == want
