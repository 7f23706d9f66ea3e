"""Distributed BPE tokenizer training — the tokenizer-learning step of an
LLM data pipeline, Spark-first.

The classic trap is iterating over the CORPUS: every merge would rewrite
100 TB. The standard fix (Sennrich et al. 2016's own formulation) is that
BPE statistics only depend on the WORD FREQUENCY TABLE — so the corpus is
reduced once (tokenize → explode → groupBy word → count: one shuffle whose
output is vocab-bounded, millions of rows at worst), and all ``n_merges``
iterations run on that small table.  Per iteration:

- adjacent-pair counts: a ``zip_with`` projection + explode + one grouped
  sum, weighted by word count — map-side combined, vocab-sized shuffle;
- argmax with a DETERMINISTIC tie-break (count desc, then pair lexicographic)
  so the learned merge sequence is bit-reproducible on any engine/partitioning
  (exact integer counts, string ordering — no floats anywhere);
- merge application to the symbol arrays via an Arrow-batched pandas UDF —
  the documented slow-path exception: within-word greedy left-to-right
  merging is inherently sequential per word, and the table it runs over is
  vocab-bounded, NOT corpus-bounded, so Python cost is O(vocab · word_len)
  per iteration regardless of corpus size.

Only the 1-row argmax crosses to the driver per iteration (the same
parameter-server exception as ml/training.py).  Lineage is cut every
``checkpoint_every`` iterations (reliable checkpoint when the session has a
checkpoint dir, localCheckpoint otherwise — same policy as
operators/graph.py), so the plan doesn't grow O(iterations²).

Corpus-side tokenization with the learned merges (``bpe_token_lengths``)
again never rewrites the corpus per merge: the distinct-word table is
tokenized once (all merges applied in learned order), then joined back —
broadcast when the vocab is small, shuffle-join otherwise.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

END_OF_WORD = "▁"  # ▁ — marks end-of-word, never appears in fixtures

_SYM_SCHEMA = "word string, wcount long, symbols array<string>"


def word_frequency_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """tokenize → explode → count: the ONE corpus-scale pass of BPE
    training.  Map-side combine collapses within-partition duplicates, so
    the shuffle moves distinct words per partition, not corpus tokens."""
    return (
        # explode_outer + isNotNull: see dedup.exploded_shingles (the
        # inferred explode guard re-expands the tokenize; token elements
        # are never NULL)
        docs.select(F.explode_outer(tokens(text_col)).alias("word"))
        .filter(F.col("word").isNotNull())
        .groupBy("word")
        .agg(F.count("*").alias("wcount"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    return words.select(
        "word",
        "wcount",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD))
        ).alias("symbols"),
    )


def _pair_counts(symbols: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency.  zip_with over a
    shifted slice gives the pairs as a projection; the only shuffle is the
    vocab-sized grouped sum."""
    pairs = symbols.select(
        "wcount",
        # explode_outer + isNotNull: see dedup.exploded_shingles (guard
        # device; zip_with struct elements are never NULL)
        F.explode_outer(
            F.zip_with(
                F.slice(
                    F.col("symbols"),
                    1,
                    F.greatest(F.size("symbols") - 1, F.lit(0)),
                ),
                F.slice(
                    F.col("symbols"),
                    2,
                    F.greatest(F.size("symbols") - 1, F.lit(0)),
                ),
                lambda a, b: F.struct(a.alias("left"), b.alias("right")),
            )
        ).alias("pair"),
    )
    return (
        pairs.filter(F.col("pair").isNotNull())
        .groupBy("pair.left", "pair.right")
        .agg(F.sum("wcount").alias("pair_count"))
    )


def _merge_apply_fn(left: str, right: str):
    """Greedy left-to-right single-merge application — sequential within a
    word by definition, so Python per row; the frame is vocab-bounded."""

    def fn(batches):
        for pdf in batches:
            if len(pdf):
                pdf = pdf.copy()
                pdf["symbols"] = [
                    _merge_word(list(s), left, right)
                    for s in pdf["symbols"]
                ]
            yield pdf

    return fn


def _merge_word(syms: list, left: str, right: str) -> list:
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i < n - 1 and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _cut_lineage(df: DataFrame) -> DataFrame:
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint()
    return df.localCheckpoint()


@dataclass
class BpeResult:
    #: (left, right, pair_count) in learned order
    merges: list[tuple[str, str, int]]


#: below this many distinct words the iteration runs on the driver — the
#: broadcast-join-threshold analog: the corpus-scale reduction (one shuffle)
#: already happened, and scheduling n_merges distributed jobs over a table
#: that fits in kilobytes is pure overhead.  Natural-language vocabularies
#: follow Heaps' law, so even large corpora often land under this.
LOCAL_VOCAB_THRESHOLD = 100_000


def _learn_local(
    word_counts: list[tuple[str, int]], n_merges: int, min_pair_count: int
) -> list[tuple[str, str, int]]:
    """Driver-side iteration over a collected word table — EXACTLY the
    same counts and tie-break as the distributed path (asserted equal in
    tests/test_bpe.py)."""
    words = {w: (list(w) + [END_OF_WORD], c) for w, c in word_counts}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for syms, c in words.values():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((left, right, cnt))
        words = {
            w: (_merge_word(syms, left, right), c)
            for w, (syms, c) in words.items()
        }
    return merges


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int = 32,
    text_col: str = "text",
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
    local_vocab_threshold: int = LOCAL_VOCAB_THRESHOLD,
) -> BpeResult:
    """Learn ``n_merges`` BPE merges from a corpus.  Deterministic: integer
    counts with (count desc, left, right) tie-break.  Stops early when the
    best pair drops below ``min_pair_count`` (merging singletons is
    overfitting by definition).

    Adaptive execution: the corpus always reduces to the word-frequency
    table distributed (one shuffle); if the resulting vocab is under
    ``local_vocab_threshold`` the merge iterations run on the driver over
    the collected table (identical counts/tie-break — same result,
    without ``n_merges`` rounds of job-scheduling overhead), else they
    stay distributed.  Pass ``local_vocab_threshold=0`` to force the
    distributed path."""
    words = word_frequency_table(docs, text_col)
    if local_vocab_threshold > 0:
        head = words.limit(local_vocab_threshold + 1).collect()
        if len(head) <= local_vocab_threshold:
            return BpeResult(
                merges=_learn_local(
                    [(r["word"], r["wcount"]) for r in head],
                    n_merges,
                    min_pair_count,
                )
            )
    return BpeResult(
        merges=_learn_distributed(
            _initial_symbols(words),
            n_merges,
            min_pair_count,
            checkpoint_every=checkpoint_every,
        )
    )


def learn_bpe_merges_by_group(
    docs: DataFrame,
    group_col: str,
    n_merges: int = 16,
    text_col: str = "text",
    min_pair_count: int = 2,
    local_vocab_threshold: int = LOCAL_VOCAB_THRESHOLD,
) -> dict[str, list[tuple[str, str, int]]]:
    """Per-group (typically per-language) BPE training — the multilingual
    tokenizer path.  The corpus is scanned ONCE into a (group, word,
    count) table; each group's merge iterations then run independently.
    Groups whose vocab fits under ``local_vocab_threshold`` solve on the
    driver from the collected slice (the common case: per-language vocabs
    are Heaps-law small); larger groups fall back to the distributed
    iteration over their filtered slice.  Returns {group: merges}."""
    grouped = (
        # explode_outer + isNotNull: see dedup.exploded_shingles
        docs.select(
            F.col(group_col).alias("__grp"),
            F.explode_outer(tokens(text_col)).alias("word"),
        )
        .filter(F.col("word").isNotNull())
        .groupBy("__grp", "word")
        .agg(F.count("*").alias("wcount"))
        .persist()
    )
    try:
        sizes = {
            r["__grp"]: r["n"]
            for r in grouped.groupBy("__grp")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        out: dict[str, list[tuple[str, str, int]]] = {}
        for grp in sorted(sizes):
            slice_df = grouped.filter(F.col("__grp") == grp)
            if 0 < local_vocab_threshold and sizes[grp] <= local_vocab_threshold:
                rows = slice_df.select("word", "wcount").collect()
                out[grp] = _learn_local(
                    [(r["word"], r["wcount"]) for r in rows],
                    n_merges,
                    min_pair_count,
                )
            else:
                symbols = _initial_symbols(
                    slice_df.select("word", "wcount")
                )
                out[grp] = _learn_distributed(
                    symbols, n_merges, min_pair_count
                )
        return out
    finally:
        grouped.unpersist()


def _learn_distributed(
    symbols: DataFrame,
    n_merges: int,
    min_pair_count: int,
    checkpoint_every: int = 8,
) -> list[tuple[str, str, int]]:
    """The distributed merge loop over an already-built symbols table.

    ONE job per merge round: the round's best-pair TakeOrdered action is
    also what populates the previous round's persisted symbols cache (a
    full scan — limit(1) over an orderBy reads every partition), so the
    old explicit ``nxt.count()`` materialization job was a second full
    pass per round for nothing (guide §2.4 — the observe()/fold
    discipline; 2 jobs/round → 1). The retired frame is unpersisted only
    AFTER the action that materialized its successor — unpersisting
    before would force the successor's job to recompute the whole merge
    chain."""
    merges: list[tuple[str, str, int]] = []
    prev = symbols.persist()
    retired = None  # the frame `prev` was derived from, freed post-action
    for it in range(n_merges):
        best = (
            _pair_counts(prev)
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if retired is not None:
            retired.unpersist()
            retired = None
        if not best or best[0]["pair_count"] < min_pair_count:
            break
        left, right, cnt = (
            best[0]["left"],
            best[0]["right"],
            int(best[0]["pair_count"]),
        )
        merges.append((left, right, cnt))
        nxt = prev.mapInPandas(_merge_apply_fn(left, right), _SYM_SCHEMA)
        if (it + 1) % checkpoint_every == 0:
            # eager cut: materializes nxt itself, so prev retires here
            nxt = _cut_lineage(nxt)
        nxt = nxt.persist()
        retired = prev
        prev = nxt
    if retired is not None:
        retired.unpersist()
    prev.unpersist()
    return merges


def _tokenize_word_fn(merges: list[tuple[str, str, int]]):
    """Apply the full learned merge sequence, in order, to each distinct
    word (Sennrich-style sequential application)."""

    def fn(batches):
        for pdf in batches:
            if len(pdf):
                pdf = pdf.copy()
                out = []
                for s in pdf["symbols"]:
                    syms = list(s)
                    for left, right, _ in merges:
                        syms = _merge_word(syms, left, right)
                    out.append(syms)
                pdf["symbols"] = out
            yield pdf

    return fn


def bpe_token_lengths(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool | None = None,
) -> DataFrame:
    """Per-document token count under the learned BPE: tokenize the
    DISTINCT-WORD table once (all merges applied), then join token lengths
    back onto the corpus.  ``broadcast_vocab=None`` (default) lets AQE pick
    the join: the vocab table is usually tiny (Heaps' law) and broadcasts,
    but a web-scale corpus can hold 10^8-10^9 distinct 'words' — a FORCED
    broadcast default would be a hard ~8 GB failure there (the same class
    as the tf-idf idf-table fix).  Pass True/False to pin the strategy
    when the vocab size is known.  The corpus is scanned exactly twice
    (word table + final join) no matter how many merges were learned."""
    words = word_frequency_table(docs, text_col)
    tokenized = _initial_symbols(words).mapInPandas(
        _tokenize_word_fn(merges), _SYM_SCHEMA
    )
    lengths = tokenized.select(
        "word", F.size("symbols").alias("word_bpe_len")
    )
    if broadcast_vocab:
        lengths = F.broadcast(lengths)
    # explode_outer + isNotNull: see dedup.exploded_shingles
    per_tok = docs.select(
        F.col(id_col), F.explode_outer(tokens(text_col)).alias("word")
    ).filter(F.col("word").isNotNull())
    return (
        per_tok.join(lengths, "word")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("word_bpe_len").cast("bigint").alias("n_bpe_tokens"),
        )
    )
