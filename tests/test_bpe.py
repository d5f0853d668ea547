from __future__ import annotations

from my_crawler_spark.operators.bpe import (
    bpe_apply_word,
    bpe_tokenize,
    bpe_train,
    word_dict,
)


def test_bpe_learns_textbook_merges(spark):
    """The classic Sennrich corpus (low x5, lower x2, newest x6, widest x3):
    first merges are es, est, lo, low, ew — max pair frequency with ties to
    the lexicographically smallest pair."""
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    m = bpe_train(docs, n_merges=5)
    assert [(r, l, rr, f) for r, l, rr, f in m] == [
        (0, "e", "s", 9),
        (1, "es", "t", 9),
        (2, "l", "o", 7),
        (3, "lo", "w", 7),
        (4, "e", "w", 6),
    ]


def test_bpe_tokenize_lowest_rank_first(spark):
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    m = bpe_train(docs, n_merges=5)
    out = bpe_tokenize(
        spark.createDataFrame(
            [(2, "low lower newest widest")], "doc_id long, text string"
        ),
        m,
    ).collect()[0]
    assert out.bpe_tokens == [
        "low", "low", "e", "r", "n", "ew", "est", "w", "i", "d", "est",
    ]


def test_bpe_apply_word_greedy_nonoverlapping():
    # 'aaaa' with merge (a,a) at rank 0 then (aa,aa) at rank 1
    assert bpe_apply_word("aaaa", {("a", "a"): 0, ("aa", "aa"): 1}) == ["aaaa"]
    assert bpe_apply_word("aaa", {("a", "a"): 0}) == ["aa", "a"]
    assert bpe_apply_word("x", {("a", "a"): 0}) == ["x"]


def test_bpe_train_early_stops_on_unique_pairs(spark):
    """Every pair unique (freq 1) -> zero merges learned."""
    docs = spark.createDataFrame([(1, "abc def ghi")], "doc_id long, text string")
    assert bpe_train(docs, n_merges=5) == []


def test_word_dict_counts(spark):
    docs = spark.createDataFrame(
        [(1, "the cat the dog"), (2, "the bird")], "doc_id long, text string"
    )
    wc = {r.word: r.cnt for r in word_dict(docs).collect()}
    assert wc == {"the": 3, "cat": 1, "dog": 1, "bird": 1}


def test_bpe_apply_lossless_property():
    """Property: applying ANY merge table to ANY word is lossless —
    concatenating the output tokens reproduces the word exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.text(alphabet="abcde", min_size=1, max_size=24)
    pairs = st.lists(
        st.tuples(
            st.text(alphabet="abcde", min_size=1, max_size=3),
            st.text(alphabet="abcde", min_size=1, max_size=3),
        ),
        max_size=8,
        unique=True,
    )

    @settings(max_examples=300, deadline=None)
    @given(words, pairs)
    def check(word, merge_pairs):
        ranks = {p: i for i, p in enumerate(merge_pairs)}
        out = bpe_apply_word(word, ranks)
        assert "".join(out) == word

    check()
