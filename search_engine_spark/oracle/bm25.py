"""Pure-Python BM25 oracle engine.

Builds an exhaustive in-memory inverted index and answers top-k queries with
textbook BM25 (Robertson et al.; Lucene-style non-negative idf). This is the
golden contract: the Spark engine must be rank-identical (docids) with scores
equal to 1e-9.

Constants (pinned, see FIXTURES.md §5):
    k1 = 1.2, b = 0.75
    idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)
    score(q, d) = Σ_t idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    tie-break: (score desc, docid asc)

Replaces the reference's sampled tf-idf + url-substring boosts
(/root/reference/src/cis5550/frontend/Master.java:356-601) per the north
star: pure BM25, exact (no posting-list sampling).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from dataclasses import dataclass, field

from search_engine_spark.oracle.text import STOPWORDS, tokenize

K1 = 1.2
B = 0.75


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def bm25_term_score(tf: int, dl: int, avgdl: float, idf: float) -> float:
    return idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


@dataclass
class OracleIndex:
    """Exhaustive in-memory inverted index over (docid → text)."""

    # term → {docid: (tf, positions)}
    postings: dict[str, dict[int, tuple[int, list[int]]]] = field(
        default_factory=lambda: defaultdict(dict)
    )
    doclen: dict[int, int] = field(default_factory=dict)

    @property
    def n_docs(self) -> int:
        return len(self.doclen)

    @property
    def avgdl(self) -> float:
        if not self.doclen:
            return 0.0
        return sum(self.doclen.values()) / len(self.doclen)

    def add_document(self, docid: int, text: str, stem: bool = True) -> None:
        pairs = tokenize(text, stem=stem)
        per_term_pos: dict[str, list[int]] = defaultdict(list)
        max_pos = 0
        for term, pos in pairs:
            per_term_pos[term].append(pos)
            max_pos = max(max_pos, pos)
        # dl = number of valid (capped) token positions; dual-indexed stems do
        # not inflate document length
        self.doclen[docid] = max_pos
        for term, positions in per_term_pos.items():
            self.postings[term][docid] = (len(positions), positions)

    @classmethod
    def build(cls, docs: dict[int, str], stem: bool = True) -> "OracleIndex":
        idx = cls()
        for docid in sorted(docs):
            idx.add_document(docid, docs[docid], stem=stem)
        return idx

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def query_terms(self, query: str, stem: bool = True) -> list[str]:
        """Tokenize a query the same way documents are tokenized, drop
        stopwords (reference frontend/Master.java:283-296), dedup preserving
        order. Stemmed variants participate because the index dual-indexes."""
        seen: list[str] = []
        for term, _pos in tokenize(query, stem=stem, cap=None):
            if term in STOPWORDS:
                continue
            if term not in seen:
                seen.append(term)
        return seen

    def topk(self, query: str, k: int = 100, stem: bool = True):
        """Exhaustive BM25 top-k: [(docid, score)] with pinned tie-break."""
        terms = self.query_terms(query, stem=stem)
        n, avgdl = self.n_docs, self.avgdl
        scores: Counter = Counter()
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            idf = bm25_idf(n, len(plist))
            for docid, (tf, _pos) in plist.items():
                scores[docid] += bm25_term_score(tf, self.doclen[docid], avgdl, idf)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def phrase_docs(self, phrase: str, stem: bool = False) -> list[int]:
        """Docids containing the exact token phrase (adjacent positions).
        Two-pointer position intersection, reference
        jobs/IndexerProjectPhraseSearch.java:328-475."""
        terms = [t for t, _ in tokenize(phrase, stem=False, cap=None)]
        if not terms:
            return []
        # order candidate check by df ascending (reference :407-413)
        if any(t not in self.postings for t in terms):
            return []
        cands = set(self.postings[terms[0]].keys())
        for t in terms[1:]:
            cands &= set(self.postings[t].keys())
        out = []
        for d in sorted(cands):
            pos_sets = [set(self.postings[t][d][1]) for t in terms]
            first = sorted(pos_sets[0])
            for p in first:
                if all((p + i) in pos_sets[i] for i in range(1, len(terms))):
                    out.append(d)
                    break
        return out
