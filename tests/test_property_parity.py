"""Hypothesis property tests for CROSS-ENGINE parity of the text-curation
operators: the same randomized documents run through the Spark operator
(Java regex / JVM expressions) and the DuckDB oracle SQL (RE2 regex /
native SQL), and must agree exactly. The per-query gate checks one fixed
corpus; these tests walk the input space (adversarial spacing, punctuation
runs, PII-lookalike fragments, degenerate token streams) where regex
dialect or arithmetic drift would hide.

Each hypothesis example batches a LIST of documents into ONE Spark job so
the suite stays fast (a per-string Spark roundtrip would be ~0.3 s each).
The alphabet is printable ASCII — the corpus contract (TESTDATA.md docs
are ASCII); unicode case-folding is out of contract and differs across
engines by design.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

import search_engine_spark.operators.sampling as SMP
import search_engine_spark.operators.textstats as TS

# text that stresses the tokenizer/PII regexes: words, digit runs,
# separators, PII punctuation, and pathological repeats
_CHUNKS = st.one_of(
    st.text(
        alphabet=st.characters(
            codec="ascii", min_codepoint=32, max_codepoint=126,
            exclude_characters="'\\",
        ),
        max_size=12,
    ),
    st.sampled_from(
        [
            "a@b.co",
            "x.y+z@mail-host.org",
            "10.0.255.3",
            "999.999.999.999",
            "1.2.3",
            "555-123-4567",
            "+1 555 123 4567",
            "version 1.2 at 3pm",
            "a b a b a b",
            "  .. ..  ",
            "the the the",
        ]
    ),
)

docs_strategy = st.lists(
    st.builds(lambda parts: " ".join(parts), st.lists(_CHUNKS, max_size=8)),
    min_size=1,
    max_size=24,
)


def _duck_rows(sql: str, docs: list[str]):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(docs)))
        + ") AS t(doc_id, text)",
        docs,
    )
    return sorted(tuple(r) for r in con.sql(sql).fetchall())


def _spark_df(spark, docs: list[str]):
    return spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )


TOKS_CTE = (
    "toks AS (SELECT doc_id AS docid, "
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
    "x -> x <> '') AS toks FROM documents)"
)


@settings(max_examples=12, deadline=None)
@given(docs_strategy)
def test_term_frequencies_cross_engine(spark, docs):
    """Java-regex tokenize+count in Spark == RE2 string_split_regex in
    DuckDB for arbitrary printable-ASCII documents — the substrate every
    index build and text statistic rests on."""
    import search_engine_spark.operators.text_ops as T

    got = sorted(
        tuple(r)
        for r in T.term_frequencies(_spark_df(spark, docs)).collect()
    )
    want = _duck_rows(
        f"WITH {TOKS_CTE}, "
        "flat AS (SELECT docid, t.term FROM toks, "
        "unnest(toks.toks) AS t(term)) "
        "SELECT docid, term, count(*)::BIGINT AS tf "
        "FROM flat GROUP BY docid, term",
        docs,
    )
    assert got == want


@settings(max_examples=12, deadline=None)
@given(docs_strategy)
def test_pii_scrub_cross_engine(spark, docs):
    """Email/IPv4/phone redaction and counts agree between Java regex and
    RE2 on adversarial text (PII look-alikes, boundary punctuation)."""
    got = sorted(
        tuple(r) for r in TS.pii_scrub(_spark_df(spark, docs)).collect()
    )
    want = _duck_rows(
        f"""
SELECT doc_id AS docid,
       regexp_replace(regexp_replace(regexp_replace(
         text, '{TS.PII_EMAIL_RE}', '<EMAIL>', 'g'),
         '{TS.PII_IPV4_RE}', '<IP>', 'g'),
         '{TS.PII_PHONE_RE}', '\\1<PHONE>', 'g') AS clean_text,
       len(regexp_extract_all(text, '{TS.PII_EMAIL_RE}'))::BIGINT AS n_emails,
       len(regexp_extract_all(text, '{TS.PII_IPV4_RE}'))::BIGINT AS n_ips,
       len(regexp_extract_all(text, '{TS.PII_PHONE_RE}'))::BIGINT AS n_phones
FROM documents
""",
        docs,
    )
    assert got == want


@settings(max_examples=12, deadline=None)
@given(docs_strategy)
def test_repetition_stats_matches_python_reference(spark, docs):
    """repetition_stats (one-explode Spark plan) == a direct per-document
    Python computation of the Gopher repetition signals."""
    import re

    got = {
        r["docid"]: r.asDict()
        for r in TS.repetition_stats(_spark_df(spark, docs)).collect()
    }
    import math

    def quant(x):
        return math.floor(x * 1e6) / 1e6

    for i, text in enumerate(docs):
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        if len(toks) < 2:
            assert i not in got
            continue
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        tgs = [f"{a} {b} {c}" for a, b, c in zip(toks, toks[1:], toks[2:])]
        from collections import Counter

        bc = Counter(bgs)
        r = got[i]
        assert r["n_tokens"] == len(toks)
        assert r["n_bigrams"] == len(bgs)
        assert r["n_distinct_bigrams"] == len(bc)
        assert r["top_bigram_count"] == max(bc.values())
        assert r["dup_bigram_frac"] == pytest.approx(
            quant(1.0 - len(bc) / len(bgs)), abs=1e-12
        )
        assert r["top_bigram_frac"] == pytest.approx(
            quant(2.0 * max(bc.values()) / len(toks)), abs=1e-12
        )
        if len(toks) >= 3:
            assert r["dup_trigram_frac"] == pytest.approx(
                quant(1.0 - len(set(tgs)) / len(tgs)), abs=1e-12
            )
        else:
            assert r["dup_trigram_frac"] is None


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
             max_size=200, unique=True),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=8),
)
def test_split_assign_cross_engine(spark, ids, w1, w2):
    """Hash split assignment agrees row-for-row with its DuckDB SQL mirror
    for arbitrary keys and weight mixes, and is exhaustive (every row gets
    a split from the weight table)."""
    total = w1 + w2 + 2
    weights = {
        "train": w1 / total,
        "val": w2 / total,
        "test": 2 / total,
    }
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = sorted(
        (r["doc_id"], r["split"])
        for r in SMP.split_assign(df, "doc_id", weights).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ks AS SELECT * FROM (VALUES "
        + ", ".join(f"({i})" for i in ids)
        + ") AS t(doc_id)"
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            f"SELECT doc_id, {SMP.split_assign_sql('doc_id', weights)} "
            "AS split FROM ks"
        ).fetchall()
    )
    assert got == want
    assert {s for _, s in got} <= {"train", "val", "test"}


# ---------------------------------------------------------------------------
# Crawl-frontier href resolution: Java regex vs RE2 on adversarial refs
# ---------------------------------------------------------------------------

_URL_SEG = st.text(
    alphabet=st.characters(
        codec="ascii", min_codepoint=33, max_codepoint=126,
        exclude_characters="'\\\"#?/<>%",
    ),
    min_size=1,
    max_size=6,
)
_URL_PATH = st.lists(_URL_SEG, max_size=4).map(
    lambda s: ("/" + "/".join(s)) if s else ""
)
_ABS_URL = st.builds(
    lambda scheme, host, port, path, q: f"{scheme}://{host}{port}{path}{q}",
    st.sampled_from(["http", "HTTPS", "https"]),
    st.sampled_from(["Example.com", "a.b.co", "x-y.example", "localhost"]),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    _URL_PATH,
    st.sampled_from(["", "?q=1", "?to=/"]),
)
_HREF = st.one_of(
    _ABS_URL,
    st.builds(lambda h, p: f"//{h}{p}", st.sampled_from(["cdn.io", "M.N.org"]), _URL_PATH),
    _URL_PATH.filter(lambda p: p != ""),
    st.builds(
        lambda ups, segs: "../" * ups + "/".join(segs),
        st.integers(0, 4),
        st.lists(_URL_SEG, min_size=1, max_size=3),
    ),
    st.sampled_from(["mailto:u@h.io", "ftp://f.example/x", "a:b/c", "x/", "./y"]),
)

pairs_strategy = st.lists(
    st.tuples(_ABS_URL, _HREF), min_size=1, max_size=24
)


@settings(max_examples=16, deadline=None)
@given(pairs_strategy)
def test_resolve_href_cross_engine(spark, pairs):
    """resolve_href + canonical_url (Java regex chain) == the DuckDB SQL
    mirror (RE2 chain) over adversarial (base, href) pairs — every
    resolution branch, port/case/slash canonicalization, and the bounded
    ``..`` collapse."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators import frontier as FR
    from search_engine_spark.operators.urls import canonical_url, canonical_url_sql

    df = spark.createDataFrame(pairs, "base string, href string")
    got = sorted(
        r["url"]
        for r in df.select(
            canonical_url(
                FR.resolve_href(F.col("base"), F.col("href"))
            ).alias("url")
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pairs AS SELECT * FROM (VALUES "
        + ", ".join("(?, ?)" for _ in pairs)
        + ") AS t(base, href)",
        [x for p in pairs for x in p],
    )
    want = sorted(
        r[0]
        for r in con.sql(
            f"SELECT {canonical_url_sql(FR.resolve_href_sql('base', 'href'))}"
            " AS url FROM pairs"
        ).fetchall()
    )
    assert got == want


_URL_PATH = st.text(
    alphabet=st.characters(codec="ascii", min_codepoint=33,
                           max_codepoint=126,
                           exclude_characters="'\\\"<>#?"),
    max_size=10,
)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(_URL_PATH, min_size=1, max_size=12),
    st.lists(
        st.lists(st.one_of(_URL_PATH, st.just("*")), max_size=4)
        .map("".join),
        min_size=1, max_size=4,
    ),
)
def test_blacklist_glob_three_way_parity(spark, paths, patterns):
    """blacklist_regex glob semantics agree across Java regex (Spark
    rlike), RE2 (DuckDB regexp_matches), and a pure-Python full-match
    reference where ONLY '*' is special — for arbitrary pattern content
    including regex metacharacters that must stay literal."""
    import re as _re

    from search_engine_spark.operators.frontier import blacklist_regex

    urls = [f"https://h.example/{p}" for p in paths]
    pats = [f"https://h.example/{p}" for p in patterns]
    rx = blacklist_regex(pats)

    def py_ref(u):
        return any(
            _re.fullmatch(
                ".*".join(_re.escape(seg) for seg in p.split("*")), u
            )
            for p in pats
        )

    want = sorted(u for u in set(urls) if not py_ref(u))
    df = spark.createDataFrame([(u,) for u in set(urls)], "url string")
    got = sorted(
        r["url"]
        for r in df.filter(~df["url"].rlike(rx)).collect()
    )
    assert got == want
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE urls AS SELECT * FROM (VALUES "
        + ", ".join("(?)" for _ in set(urls)) + ") AS t(url)",
        list(set(urls)),
    )
    duck = sorted(
        r[0]
        for r in con.execute(
            "SELECT url FROM urls WHERE NOT regexp_matches(url, ?)", [rx]
        ).fetchall()
    )
    assert duck == want


_WORD = st.text(
    alphabet=st.characters(codec="ascii", min_codepoint=97,
                           max_codepoint=122),
    min_size=1, max_size=8,
)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.tuples(_WORD, st.integers(1, 500)), min_size=1, max_size=30),
    st.lists(_WORD, min_size=1, max_size=3),
)
def test_spell_suggest_cross_engine(spark, vocab_rows, qwords):
    """Levenshtein ranking parity: Spark's JVM levenshtein + window and
    DuckDB's levenshtein + row_number agree on arbitrary vocabularies and
    query tokens (ties broken (dist, df desc, term))."""
    vocab = {}
    for w, df_ in vocab_rows:
        vocab[w] = max(vocab.get(w, 0), df_)
    rows = sorted(vocab.items())
    vdf = spark.createDataFrame(rows, "term string, df long")
    query = " ".join(qwords)
    got = sorted(
        (r["qterm"], r["suggestion"], r["dist"], r["df"])
        for r in TS.spell_suggest(vdf, query, k=4).collect()
    )
    import duckdb

    terms_sql = ("SELECT * FROM (VALUES "
                 + ", ".join(f"('{w}', {d})" for w, d in rows)
                 + ") AS v(term, df)")
    sql = TS.spell_suggest_sql(query, k=4, terms_sql=terms_sql)
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want


_PARA_POOL = ["alpha beta", "shared boiler", "gamma delta", "x", "metric row"]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(_PARA_POOL), max_size=5),
        min_size=1, max_size=10,
    )
)
def test_paragraph_dedup_cross_engine(spark, doc_paras):
    """paragraph_dedup == its DuckDB mirror on random paragraph multisets
    (heavy cross-doc repetition by construction, empty docs included)."""
    docs = [(i, "\n\n".join(ps)) for i, ps in enumerate(doc_paras)]
    import search_engine_spark.operators.dedup as D

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(tuple(r) for r in D.paragraph_dedup(sdf).collect())
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(docs)))
        + ") AS t(doc_id, text)",
        [t for _i, t in docs],
    )
    want = sorted(tuple(r) for r in con.sql(D.paragraph_dedup_sql()).fetchall())
    assert got == want
