"""Deterministic synthetic Common-Crawl-style `pages` corpus (FIXTURES.md §1).

Every page is a pure function of (SEED, docid, n_docs) — content derives from
a splitmix64 hash chain, NOT a sequential RNG — so generation is
embarrassingly parallel: `spark.range(n).mapInPandas(...)` scales to any
cluster size with zero coordination (the reference's sequential global
docId counter, jobs/IndexerProject.java:210-235, is the anti-pattern this
replaces).

Properties (FIXTURES.md):
- urls `http://site{s:04d}.example:80/p/{d:06d}.html`, hosts Zipf over 100 sites
- Zipf(α=1.1) vocabulary of 10k terms with a 30-term stopword head → term skew
- body length 200–3000 tokens (some docs past the 1500-token indexing cap)
- ~1% exact-duplicate bodies (docid N*100+99 duplicates N*100+98)
- ~1% lang="de" rows (excluded from indexing; exercises the filter path)
- sprinkled 5-digit zip-code tokens in [00501, 99950]
- planted low-df phrases from the reference's embedded query set
  (jobs/IndexerProjectVersion1.java:813,833)
- html constrained to the subset where the pinned extractor oracle is exact
"""

from __future__ import annotations

import datetime
import string

import numpy as np
import pandas as pd

from search_engine_spark.oracle.text import STOPWORDS, extract_text

SEED = 42
N_SITES = 100
VOCAB_SIZE = 10_000
ZIPF_ALPHA = 1.1
EPOCH = datetime.datetime(2023, 4, 14, 0, 0, 0, tzinfo=datetime.timezone.utc)

PLANTED_PHRASES = [
    "demosthenes prince andrew",
    "bruenn bloodthirsty",
    "prince andrew",
    "after their hard marches",
    "solemn affair",
    "gentlemen",
    "bloodthirsty soldier",
    "historic event",
    "commerce handicraft gardening",
    "christ preached on the cross",
]

_MASK = (1 << 64) - 1


def splitmix64(x: int) -> int:
    """Public-domain splitmix64 mix function (Steele et al., 2014)."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


def _h(*parts: int) -> int:
    x = SEED
    for p in parts:
        x = splitmix64((x ^ p) & _MASK)
    return x


def _u(*parts: int) -> float:
    """Uniform [0,1) from a hash."""
    return _h(*parts) / 2.0**64


def _build_vocab() -> list[str]:
    """10k-term vocabulary: stopword head + planted-phrase words + pseudo-words.
    Deterministic (hash-indexed syllables, no RNG state)."""
    head = sorted(STOPWORDS)  # 24 words
    head += ["this", "they", "their", "have", "you", "not"]  # → 30-term head
    planted = []
    for ph in PLANTED_PHRASES:
        for w in ph.split():
            if w not in head and w not in planted:
                planted.append(w)
    syll = [
        c + v + t
        for c in "bcdfglmnprstvz"
        for v in "aeiou"
        for t in ["", "n", "r", "s", "l", "k"]
    ]
    vocab = list(head) + planted
    seen = set(vocab)
    i = 0
    while len(vocab) < VOCAB_SIZE:
        n_syl = 2 + _h(1000, i) % 3
        w = "".join(syll[_h(1001, i, j) % len(syll)] for j in range(n_syl))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
        i += 1
    return vocab


VOCAB = _build_vocab()

# Zipf CDF over vocabulary ranks (fixed float64 arithmetic → deterministic)
_weights = 1.0 / np.power(np.arange(1, VOCAB_SIZE + 1, dtype=np.float64), ZIPF_ALPHA)
ZIPF_CDF = np.cumsum(_weights / _weights.sum())

# site popularity: Zipf over 100 sites
_sw = 1.0 / np.power(np.arange(1, N_SITES + 1, dtype=np.float64), 1.0)
SITE_CDF = np.cumsum(_sw / _sw.sum())

_DE_WORDS = (
    "der die das und ist nicht ein eine mit von auf für den dem des sich "
    "auch als wird sind einen einem zur zum über unter wieder immer doch"
).split()


def _splitmix64_vec(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over uint64 (numpy wraps mod 2^64)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _h_vec(prefix: int, docid: int, slots: np.ndarray) -> np.ndarray:
    """Vector equivalent of [_h(prefix, docid, s) for s in slots]."""
    base = splitmix64(splitmix64(SEED ^ prefix) ^ docid)
    return _splitmix64_vec(np.uint64(base) ^ slots.astype(np.uint64))


def _sample_word(docid: int, slot: int) -> str:
    u = _u(2, docid, slot)
    rank = int(np.searchsorted(ZIPF_CDF, u, side="right"))
    return VOCAB[min(rank, VOCAB_SIZE - 1)]


_VOCAB_ARR = None  # lazily built numpy object array for vectorized lookup


def _sample_words_vec(docid: int, slots: np.ndarray) -> list[str]:
    """Vectorized _sample_word over many slots (identical values)."""
    global _VOCAB_ARR
    if _VOCAB_ARR is None:
        _VOCAB_ARR = np.array(VOCAB, dtype=object)
    u = _h_vec(2, docid, slots).astype(np.float64) / 2.0**64
    ranks = np.minimum(
        np.searchsorted(ZIPF_CDF, u, side="right"), VOCAB_SIZE - 1
    )
    return list(_VOCAB_ARR[ranks])


def _body_tokens(docid: int) -> list[str]:
    """Deterministic body token list for a docid (before dedup aliasing)."""
    n = 200 + _h(3, docid) % 2801  # 200..3000
    toks = _sample_words_vec(docid, np.arange(n, dtype=np.uint64))
    # plant a phrase in ~1/8 of docs at a deterministic offset
    if _h(4, docid) % 8 == 0:
        ph = PLANTED_PHRASES[_h(5, docid) % len(PLANTED_PHRASES)].split()
        off = _h(6, docid) % max(1, n - len(ph))
        toks[off : off + len(ph)] = ph
    # sprinkle a zip code in ~2% of docs
    if _h(7, docid) % 50 == 0:
        z = 501 + _h(8, docid) % (99950 - 501 + 1)
        toks[_h(9, docid) % n] = f"{z:05d}"
    return toks


def _content_docid(docid: int) -> int:
    """~1% exact duplicates: docid ≡ 99 (mod 100) reuses the previous doc's
    content (content-dedup path, reference jobs/Crawler.java:519-525)."""
    if docid % 100 == 99 and docid > 0:
        return docid - 1
    return docid


def _lang(docid: int) -> str:
    return "de" if _h(10, _content_docid(docid)) % 100 == 0 else "en"


def _title_tokens(docid: int) -> list[str]:
    k = 3 + _h(11, docid) % 6
    return [_sample_word(docid, 100_000 + i) for i in range(k)]


def page_record(docid: int) -> dict:
    """The pure content function: docid → page row."""
    cid = _content_docid(docid)
    lang = _lang(docid)
    title = _title_tokens(cid)
    if lang == "de":
        body = [_DE_WORDS[_h(12, cid, i) % len(_DE_WORDS)] for i in range(300)]
    else:
        body = _body_tokens(cid)
    # paragraphs of ~60 tokens, with light oracle-safe markup noise
    paras = []
    for p0 in range(0, len(body), 60):
        chunk = " ".join(body[p0 : p0 + 60])
        cls = string.ascii_lowercase[_h(13, cid, p0) % 26]
        paras.append(f'<p class="{cls}">{chunk}</p>')
    # one in-corpus link per ~3 paragraphs
    tgt = _h(14, cid) % max(cid, 1) if cid else 0
    anchor = _sample_word(cid, 200_000)
    link = (
        f'<a href="http://site{tgt % N_SITES:04d}.example:80/p/{tgt:06d}.html">'
        f"{anchor}</a>"
    )
    ent = "fish &amp; chips" if _h(15, cid) % 4 == 0 else "salt &lt;pepper&gt;"
    html = (
        "<html><head><title>" + " ".join(title) + "</title>"
        '<style>body { color: red; }</style>'
        "<script>var x = 1;</script></head><body>"
        f"<h1>{' '.join(title)}</h1>" + "".join(paras) + link
        + f"<div>{ent}</div>"
        "</body></html>"
    )
    site = int(np.searchsorted(SITE_CDF, _u(16, docid), side="right"))
    url = f"http://site{site:04d}.example:80/p/{docid:06d}.html"
    return {
        "url": url,
        "warc_ts": EPOCH + datetime.timedelta(seconds=docid),
        "html": html.encode("utf-8"),
        "text": extract_text(html.encode("utf-8")),
        "lang": lang,
    }


def gen_pages_pandas(n_docs: int, start: int = 0, end: int | None = None) -> pd.DataFrame:
    """Generate rows [start, end) of an n_docs corpus as a pandas DataFrame."""
    end = n_docs if end is None else min(end, n_docs)
    rows = [page_record(d) for d in range(start, end)]
    return pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def gen_pages_df(spark, n_docs: int, partitions: int | None = None):
    """Distributed generation: spark.range(n) → mapInPandas(page_record).

    Scale path: each partition generates its slice independently; no driver
    bottleneck, no shared RNG state.
    """
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = [page_record(int(d)) for d in ids]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return (
        spark.range(0, n_docs, numPartitions=parts)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )
