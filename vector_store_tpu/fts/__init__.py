"""BM25 full-text search engine (host-side).

The reference embeds tantivy (fts_index/tantivy.rs); this is a compact
inverted-index equivalent with the same analysis chain — simple tokenizer
(split on non-alphanumeric), lowercasing, English stopword removal
(tantivy.rs:162-169) — BM25 scoring (k1=1.2, b=0.75, tantivy defaults),
and the same commit discipline: documents become searchable only at commit,
batched every COMMIT_INTERVAL seconds or COMMIT_DOCS uncommitted docs
(tantivy.rs:128-130); uncommitted docs delay SERVING.
"""

from __future__ import annotations

import math
import re
from collections import defaultdict

K1 = 1.2
B = 0.75
COMMIT_INTERVAL = 3.0
COMMIT_DOCS = 10_000

# Lucene/tantivy English stopword list
STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)

_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)


def analyze(text: str) -> list[str]:
    return [t for t in (m.group(0).lower() for m in _TOKEN_RE.finditer(text)) if t not in STOPWORDS]


class InvertedIndex:
    """Term -> {doc_id: term_frequency} postings with BM25 ranking."""

    def __init__(self) -> None:
        self.postings: dict[str, dict[int, int]] = defaultdict(dict)
        self.doc_len: dict[int, int] = {}
        self._total_len = 0
        # staged (uncommitted) state
        self._pending_add: dict[int, str] = {}
        self._pending_del: set[int] = set()

    # -- writes (visible after commit) ----------------------------------------

    def add_document(self, doc_id: int, body: str) -> None:
        self._pending_del.discard(doc_id)
        self._pending_add[doc_id] = body

    def delete_document(self, doc_id: int) -> None:
        self._pending_add.pop(doc_id, None)
        self._pending_del.add(doc_id)

    @property
    def uncommitted(self) -> int:
        return len(self._pending_add) + len(self._pending_del)

    def commit(self) -> int:
        n = self.uncommitted
        for doc_id in self._pending_del:
            self._remove(doc_id)
        for doc_id, body in self._pending_add.items():
            self._remove(doc_id)  # replace semantics
            tokens = analyze(body)
            tf: dict[str, int] = defaultdict(int)
            for t in tokens:
                tf[t] += 1
            for term, count in tf.items():
                self.postings[term][doc_id] = count
            self.doc_len[doc_id] = len(tokens)
            self._total_len += len(tokens)
        self._pending_add.clear()
        self._pending_del.clear()
        return n

    def _remove(self, doc_id: int) -> None:
        if doc_id not in self.doc_len:
            return
        self._total_len -= self.doc_len.pop(doc_id)
        for term in list(self.postings):
            plist = self.postings[term]
            if doc_id in plist:
                del plist[doc_id]
                if not plist:
                    del self.postings[term]

    # -- reads ------------------------------------------------------------------

    @property
    def num_docs(self) -> int:
        return len(self.doc_len)

    def search(self, query: str, limit: int) -> list[tuple[int, float]]:
        """Top-`limit` (doc_id, bm25_score), disjunctive (OR) over query
        terms like tantivy's default QueryParser."""
        n = self.num_docs
        if n == 0:
            return []
        avg_len = (self._total_len / n) if n else 0.0
        scores: dict[int, float] = defaultdict(float)
        for term in analyze(query):
            plist = self.postings.get(term)
            if not plist:
                continue
            df = len(plist)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for doc_id, tf in plist.items():
                dl = self.doc_len[doc_id]
                denom = tf + K1 * (1 - B + B * dl / avg_len) if avg_len else tf + K1
                scores[doc_id] += idf * (tf * (K1 + 1)) / denom
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:limit]

    def size_bytes(self) -> int:
        """Rough memory footprint for the fts_index_size_bytes gauge."""
        total = 0
        for term, plist in self.postings.items():
            total += len(term) + 16 * len(plist) + 48
        total += 16 * len(self.doc_len)
        return total
