"""Distributed BPE tokenizer training vs an exact pure-Python reference.

The learned merge sequence has no SQL oracle (iterative argmax), but it IS
fully deterministic — integer pair counts with a (count desc, left, right)
tie-break — so a straightforward single-process BPE must reproduce it
token-for-token, and the corpus-side token counts must match the reference
tokenizer exactly.
"""

from __future__ import annotations

from collections import Counter

from end_to_end_data_engineering_and_ml_system_spark.operators.bpe import (
    END_OF_WORD,
    bpe_token_lengths,
    learn_bpe_merges,
    word_frequency_table,
)
from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import (
    load_table,
)

from .conftest import SF_SMOKE


def _ref_word_counts(texts: list[str]) -> Counter:
    c: Counter = Counter()
    for t in texts:
        c.update(w for w in t.split() if w)
    return c


def _ref_merge_word(syms: list, left: str, right: str) -> list:
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_learn(texts: list[str], n_merges: int, min_pair_count: int = 2):
    words = {
        w: (list(w) + [END_OF_WORD], c)
        for w, c in _ref_word_counts(texts).items()
    }
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for syms, c in words.values():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        # count desc, then (left, right) lexicographic — the exact
        # tie-break the distributed argmax uses
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((left, right, cnt))
        words = {
            w: (_ref_merge_word(syms, left, right), c)
            for w, (syms, c) in words.items()
        }
    return merges


def _ref_tokenize(word: str, merges) -> list:
    syms = list(word) + [END_OF_WORD]
    for left, right, _ in merges:
        syms = _ref_merge_word(syms, left, right)
    return syms


def test_word_frequency_table_matches_reference(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    got = {
        r["word"]: r["wcount"]
        for r in word_frequency_table(docs).collect()
    }
    assert got == dict(_ref_word_counts(texts))


def test_learned_merges_match_reference_exactly(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    got = learn_bpe_merges(docs, n_merges=16).merges
    want = _ref_learn(texts, n_merges=16)
    assert got == want
    assert len(got) == 16, "smoke corpus must sustain 16 real merges"
    # counts are non-increasing is NOT guaranteed by BPE in general, but
    # every count must be >= min_pair_count and ranks unique
    assert all(c >= 2 for _, _, c in got)


def test_bpe_token_lengths_match_reference(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    rows = docs.select("doc_id", "text").collect()
    merges = learn_bpe_merges(docs, n_merges=12).merges
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_lengths(docs, merges).collect()
    }
    want = {}
    for r in rows:
        ws = [w for w in r["text"].split() if w]
        if ws:
            want[r["doc_id"]] = (
                len(ws),
                sum(len(_ref_tokenize(w, merges)) for w in ws),
            )
    assert got == want


def test_local_and_distributed_paths_agree(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    local = learn_bpe_merges(docs, n_merges=10).merges  # auto -> local
    dist = learn_bpe_merges(
        docs, n_merges=10, local_vocab_threshold=0
    ).merges
    assert local == dist


def test_merges_deterministic_across_partitioning(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    a = learn_bpe_merges(docs.repartition(1), n_merges=8).merges
    b = learn_bpe_merges(docs.repartition(7), n_merges=8).merges
    assert a == b


def test_learn_matches_reference_on_random_corpora(spark):
    # property check over adversarial tiny corpora: repeated words, unicode,
    # single-char words, high-dup shapes — distributed learn (forced) must
    # equal the pure-Python reference exactly on every one
    corpora = [
        ["aa ab aa ab aa", "ab aa ab"],
        ["x", "x", "x y", "y x", ""],
        ["的的 的 是的 的是", "是 的 是是"],
        ["abcabc abcabc abc", "bcab cabc abca"],
        ["w1 w2 w1w2 w2w1 w1 w2 w1"],
    ]
    for texts in corpora:
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = learn_bpe_merges(
            df, n_merges=6, local_vocab_threshold=0
        ).merges
        want = _ref_learn(texts, n_merges=6)
        assert got == want, (texts, got, want)


def test_per_group_learn_matches_filtered_single_corpus(spark):
    from end_to_end_data_engineering_and_ml_system_spark.operators.bpe import (
        learn_bpe_merges_by_group,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    by_lang = learn_bpe_merges_by_group(docs, "lang", n_merges=8)
    langs = sorted(
        r["lang"] for r in docs.select("lang").distinct().collect()
    )
    assert sorted(by_lang) == langs
    for lang in ("en", "zh"):
        direct = learn_bpe_merges(
            docs.filter(docs.lang == lang), n_merges=8
        ).merges
        assert by_lang[lang] == direct, lang


def test_bpe_token_lengths_default_has_no_forced_broadcast(spark, sf_dir):
    """The vocab table can be 10^8-10^9 rows at web scale — the DEFAULT
    must not carry a forced broadcast hint (AQE decides); True/False pin
    the strategy explicitly."""
    from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents").limit(30)
    merges = learn_bpe_merges(docs, n_merges=4).merges
    plan_default = (
        bpe_token_lengths(docs, merges)
        ._jdf.queryExecution().analyzed().toString()
    )
    assert "Hint" not in plan_default
    plan_pinned = (
        bpe_token_lengths(docs, merges, broadcast_vocab=True)
        ._jdf.queryExecution().analyzed().toString()
    )
    assert "ResolvedHint" in plan_pinned
