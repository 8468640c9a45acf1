"""Pinned text semantics: HTML→text extraction and tokenization.

These two functions ARE the contract. The Spark engine's pandas UDFs call
exactly these functions, and the pytest parity suite requires the `text`
column of the pages table to be byte-identical per url to `extract_text`.

Extraction mirrors the reference pipeline
(/root/reference/src/cis5550/jobs/IndexerProject.java:262-276):
  page[:30000] → HTML text extraction → non-ASCII → space, '#' → space,
  control chars → space — re-expressed as a deterministic pure-Python
  function (the reference used Jsoup; we pin our own equivalent for the
  well-formed-HTML subset the corpus generator emits).

Tokenization mirrors /root/reference/src/cis5550/jobs/IndexerProject.java:349-400:
  strip tags, punctuation→space, lowercase, split on whitespace, validWord
  filter, Porter stem with DUAL indexing (original + stem when they differ,
  same position), positions are 1-based indexes over valid tokens, capped at
  MAX_TOKENS_PER_DOC tokens per document.
"""

from __future__ import annotations

import re
from functools import lru_cache

from search_engine_spark.oracle.porter import porter_stem

MAX_HTML_CHARS = 30_000   # reference: IndexerProject.java:264-265
MAX_TOKENS_PER_DOC = 1_500  # reference: IndexerProject.java:411-413

# reference stopword set (frontend/Master.java:30-32) — a standard small
# English stopword list
STOPWORDS = frozenset(
    "a an and are as at be by for from has he in is it its of on that the "
    "to was were will with".split()
)

_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")
_NON_ASCII_OR_CTRL_RE = re.compile(r"[^\x20-\x7e]|#")

_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&amp;", "&")]  # &amp; last


def extract_text(html: bytes | str) -> str:
    """Pinned HTML→text extraction oracle.

    Steps (order matters, all deterministic):
      1. decode utf-8 (replace errors), truncate to MAX_HTML_CHARS chars
      2. drop <script>/<style> blocks, strip all tags → space
      3. unescape the limited entity set &lt; &gt; &amp;
      4. non-printable-ASCII and '#' → space
      5. collapse whitespace runs to single spaces, strip ends
    """
    if isinstance(html, (bytes, bytearray)):
        s = bytes(html).decode("utf-8", errors="replace")
    else:
        s = html
    s = s[:MAX_HTML_CHARS]
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    s = _NON_ASCII_OR_CTRL_RE.sub(" ", s)
    return _WS_RE.sub(" ", s).strip()


# Tokenizer: lowercase, keep [a-z0-9$%] word chars, everything else → space.
# ('#' was already removed by extraction; the reference's validWord also
# admits '#'-initial tokens but its extractor, like ours, erased '#' first.)
_TOKEN_SPLIT_RE = re.compile(r"[^a-z0-9$%]+")
_ONLY_SPECIALS_RE = re.compile(r"^[$%#]+$")


@lru_cache(maxsize=1 << 16)
def valid_word(tok: str) -> bool:
    """Keep tokens whose first char is alphanumeric or one of $ % (and that
    are not made purely of special chars).
    Reference: IndexerProject.java:176-189.
    Memoized: token frequencies are zipfian, so the regex+isalnum test hits
    the cache for almost every occurrence (pure function of the token)."""
    if not tok:
        return False
    c0 = tok[0]
    if not (c0.isalnum() or c0 in "$%#"):
        return False
    return _ONLY_SPECIALS_RE.match(tok) is None


def simple_tokens(text: str) -> list[str]:
    """The SQL-expressible token stream: lowercase, [^a-z0-9]+ → split.

    Used by the DuckDB-checkable gate queries; equivalent to
    ``regexp_replace(lower(text),'[^a-z0-9]+',' ') → split``.
    """
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


# Per-token decision cache: token → (valid, stem-if-different-else-None).
# One plain-dict probe per occurrence replaces two lru_cache-wrapped calls
# in the indexer's hottest loop; the vocabulary is zipfian so hit rate ≈ 1.
# Bounded: cleared if a pathological corpus grows it past the cap (an
# executor-lifetime cache, like Lucene's term dictionaries).
_TOKEN_INFO: dict[str, tuple[bool, str | None]] = {}
_TOKEN_INFO_CAP = 2_000_000


def _token_info(tok: str) -> tuple[bool, str | None]:
    if not valid_word(tok):
        return (False, None)
    st = porter_stem(tok)
    return (True, st if st != tok else None)


def tokenize(text: str, stem: bool = True, cap: int | None = MAX_TOKENS_PER_DOC):
    """Full reference-parity token stream.

    Returns list of (term, position) with 1-based positions over valid
    tokens; when `stem` and the Porter stem differs from the original, BOTH
    are emitted at the same position (dual indexing,
    reference IndexerProject.java:378-400). Token cap applies to the number
    of valid positions, not the number of emitted (term, pos) pairs.
    """
    cache = _TOKEN_INFO
    out: list[tuple[str, int]] = []
    pos = 0
    for tok in _TOKEN_SPLIT_RE.split(text.lower()):
        info = cache.get(tok)
        if info is None:
            if len(cache) >= _TOKEN_INFO_CAP:
                cache.clear()
            info = cache[tok] = _token_info(tok)
        if not info[0]:
            continue
        pos += 1
        if cap is not None and pos > cap:
            break
        out.append((tok, pos))
        if stem and info[1] is not None:
            out.append((info[1], pos))
    return out


def doc_postings(text: str, stem: bool = True, cap: int | None = MAX_TOKENS_PER_DOC):
    """Fused per-document postings: {term: [positions]} plus dl.

    Semantically identical to grouping ``tokenize(text, stem, cap)`` by
    term (tested for equality) — one pass, no intermediate pair list; this
    is the indexer UDF's hot path.
    """
    cache = _TOKEN_INFO
    per_term: dict[str, list[int]] = {}
    pos = 0
    for tok in _TOKEN_SPLIT_RE.split(text.lower()):
        info = cache.get(tok)
        if info is None:
            if len(cache) >= _TOKEN_INFO_CAP:
                cache.clear()
            info = cache[tok] = _token_info(tok)
        if not info[0]:
            continue
        pos += 1
        if cap is not None and pos > cap:
            pos -= 1
            break
        lst = per_term.get(tok)
        if lst is None:
            per_term[tok] = [pos]
        else:
            lst.append(pos)
        if stem:
            st = info[1]
            if st is not None:
                lst2 = per_term.get(st)
                if lst2 is None:
                    per_term[st] = [pos]
                else:
                    lst2.append(pos)
    return per_term, pos
