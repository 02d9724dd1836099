"""FTS engine tests: analysis chain, BM25 ranking, commits — both python
and native (C++) implementations must agree."""

import pytest

from vector_store_tpu.fts import InvertedIndex, analyze
from vector_store_tpu.fts.native import make_inverted_index, native_available


class TestAnalyzer:
    def test_tokenize_lower_stopwords(self):
        assert analyze("The Quick brown FOX!") == ["quick", "brown", "fox"]
        assert analyze("this is a test") == ["test"]
        assert analyze("") == []
        assert analyze("punctuation, everywhere... really?") == [
            "punctuation", "everywhere", "really",
        ]


def fill(idx):
    idx.add_document(1, "the quick brown fox jumps over the lazy dog")
    idx.add_document(2, "a lazy dog sleeps all day long")
    idx.add_document(3, "quick quick quick foxes everywhere")
    idx.commit()


@pytest.mark.parametrize(
    "factory",
    [InvertedIndex]
    + ([make_inverted_index] if native_available() else []),
    ids=["python"] + (["native"] if native_available() else []),
)
class TestInvertedIndex:
    def test_search_ranking(self, factory):
        idx = factory()
        fill(idx)
        results = idx.search("quick fox", 3)
        # doc 1 matches both terms (BM25 favors term coverage over raw tf)
        assert results[0][0] == 1
        ids = [doc for doc, _ in results]
        assert 3 in ids  # matches 'quick' heavily
        assert 2 not in ids

    def test_commit_visibility(self, factory):
        idx = factory()
        idx.add_document(1, "hello world")
        assert idx.num_docs == 0  # staged until commit
        assert idx.uncommitted == 1
        idx.commit()
        assert idx.num_docs == 1
        assert idx.search("hello", 5)[0][0] == 1

    def test_delete(self, factory):
        idx = factory()
        fill(idx)
        idx.delete_document(3)
        idx.commit()
        assert idx.num_docs == 2
        assert all(doc != 3 for doc, _ in idx.search("quick", 5))

    def test_replace(self, factory):
        idx = factory()
        fill(idx)
        idx.add_document(1, "completely different words now")
        idx.commit()
        assert idx.num_docs == 3
        assert all(doc != 1 for doc, _ in idx.search("fox", 5))
        assert idx.search("different", 5)[0][0] == 1

    def test_size_bytes(self, factory):
        idx = factory()
        fill(idx)
        assert idx.size_bytes() > 0


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_python_native_agree():
    py = InvertedIndex()
    nat = make_inverted_index()
    docs = {
        10: "alpha beta gamma delta",
        20: "beta beta gamma",
        30: "unrelated content entirely",
        40: "alpha alpha alpha",
    }
    for idx in (py, nat):
        for d, body in docs.items():
            idx.add_document(d, body)
        idx.commit()
    for q in ("alpha", "beta gamma", "content", "alpha beta gamma"):
        got_py = py.search(q, 10)
        got_nat = nat.search(q, 10)
        assert [d for d, _ in got_py] == [d for d, _ in got_nat], q
        for (_, s1), (_, s2) in zip(got_py, got_nat):
            assert abs(s1 - s2) < 1e-5


class TestQueryParser:
    def test_clauses(self):
        from vector_store_tpu.fts import parse_query

        assert parse_query("quick fox") == [
            (0, ["quick"], False),
            (0, ["fox"], False),
        ]
        assert parse_query('+quick -dog "brown fox"') == [
            (1, ["quick"], False),
            (-1, ["dog"], False),
            (0, ["brown", "fox"], True),
        ]
        # stopwords vanish from clauses; all-stopword fragments drop whole
        assert parse_query('+the -"the a"') == []
        # unterminated quote runs to end of string
        assert parse_query('"lazy dog') == [(0, ["lazy", "dog"], True)]
        # multi-token bare fragment expands per token (Lucene default)
        assert parse_query("foo-bar") == [
            (0, ["foo"], False),
            (0, ["bar"], False),
        ]


@pytest.mark.parametrize(
    "factory",
    [InvertedIndex]
    + ([make_inverted_index] if native_available() else []),
    ids=["python"] + (["native"] if native_available() else []),
)
class TestBooleanAndPhrase:
    """tantivy-QueryParser semantics the reference exposes by feeding raw
    query strings into tantivy (tantivy.rs:258-301)."""

    def test_must_excludes_nonmatching(self, factory):
        idx = factory()
        fill(idx)
        ids = [d for d, _ in idx.search("+fox lazy", 5)]
        assert ids == [1]  # doc 2 has 'lazy' but lacks the required 'fox'

    def test_must_not(self, factory):
        idx = factory()
        fill(idx)
        ids = [d for d, _ in idx.search("lazy -fox", 5)]
        assert ids == [2]

    def test_phrase_requires_adjacency_in_order(self, factory):
        idx = factory()
        idx.add_document(1, "the quick brown fox")
        idx.add_document(2, "brown and quick fox")   # wrong order
        idx.add_document(3, "quick reddish brown fox")  # gap
        idx.commit()
        ids = [d for d, _ in idx.search('"quick brown fox"', 5)]
        assert ids == [1]

    def test_phrase_positions_skip_stopwords(self, factory):
        # positions are post-stopword indices at BOTH index and query time,
        # so "jumps over the lazy" matches "jumps ... lazy" consistently
        idx = factory()
        fill(idx)
        ids = [d for d, _ in idx.search('"jumps over the lazy dog"', 5)]
        assert ids == [1]

    def test_negated_phrase(self, factory):
        idx = factory()
        fill(idx)
        ids = [d for d, _ in idx.search('dog -"lazy dog sleeps"', 5)]
        assert ids == [1]

    def test_plain_or_unchanged(self, factory):
        idx = factory()
        fill(idx)
        assert idx.search("quick fox", 3) == idx.search("quick fox", 3)
        assert [d for d, _ in idx.search("quick fox", 3)][0] == 1


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_python_native_agree_boolean_phrase():
    py = InvertedIndex()
    nat = make_inverted_index()
    docs = {
        10: "alpha beta gamma delta",
        20: "beta beta gamma alpha beta gamma",
        30: "unrelated content entirely",
        40: "alpha alpha alpha beta",
    }
    for idx in (py, nat):
        for d, body in docs.items():
            idx.add_document(d, body)
        idx.commit()
    for q in (
        '+alpha beta',
        'alpha -beta',
        '"beta gamma"',
        '+"alpha beta" gamma',
        'gamma -"beta beta"',
        '"gamma alpha beta"',
    ):
        got_py = py.search(q, 10)
        got_nat = nat.search(q, 10)
        assert [d for d, _ in got_py] == [d for d, _ in got_nat], q
        for (_, s1), (_, s2) in zip(got_py, got_nat):
            assert abs(s1 - s2) < 1e-5
