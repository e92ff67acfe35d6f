"""Distributed BPE tokenizer training — the iterative merge loop.

The reference pipeline tokenizes nothing (its 15 rows/day carry no text
corpus), but a training-data engine must train tokenizers ON the corpus:
byte-pair encoding (Sennrich et al., ACL'16) is `x87`'s pair-count step
run in a loop — each round picks the globally most frequent adjacent
symbol pair and rewrites the vocabulary with that pair merged.

Scale shape (the reason this is corpus-affordable at 100 TB):

- The corpus is touched ONCE, by the word-frequency pass the caller
  provides (vocab-keyed shuffle with map-side partial aggregation).
  Every merge round after that operates on the DISTINCT-word table,
  Zipf-bounded at ≪ corpus size, weighted by word frequency.
- Per round: one alphabet²-bounded pair aggregation, one global top-1
  (compiles to TakeOrderedAndProject — no total sort), and one
  map-side rewrite of the vocabulary. The best-pair frame is 1 row and
  rides into the rewrite as a broadcast; nothing shuffles the vocab
  except the pair aggregation.
- The rewritten vocabulary is checkpointed each round: the loop is
  inherently sequential (round n's counts depend on round n-1's
  symbols — this is the data dependency of the algorithm, not an
  implementation choice), and checkpointing keeps lineage depth and
  re-execution constant per round instead of exponential across the
  result union's branches.

Determinism: the arg-max pair is tie-broken (count DESC, left ASC,
right ASC) and the merge rewrite is a left-to-right greedy fold with
an explicit string-encoded accumulator, so the whole training
trajectory — which pair wins each round and how every word re-segments
— replays bit-identically in the DuckDB oracle's chained CTEs
(`list_reduce` with the same fold; see `__spark_entry__.oracle_sql`,
key ``x97_bpe_merge_train``).

Symbols are encoded as a single string per word, delimited by the
unit separator ``chr(31)`` (never present in whitespace-split words),
so the fold's accumulator is a plain string both engines support in
higher-order lambdas; symbols themselves are arbitrary-length after
the first merge.
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

US = "\x1f"  # unit separator: symbol delimiter inside a word

# left-to-right greedy application of ONE merge rule (l, r) -> m to a
# US-delimited symbol string: fold symbols into a string accumulator;
# when the accumulator's LAST symbol is `l` and the next symbol is `r`,
# replace the tail with `m` — a just-created merge becomes the new last
# symbol and is never itself half of the same rule (m = l || r is
# strictly longer than l), exactly Sennrich's non-overlapping rewrite.
_APPLY_MERGE = """
aggregate(
  split(s, char(31)), '',
  (acc, x) -> CASE
    WHEN acc = '' THEN x
    WHEN (acc = l OR endswith(acc, char(31) || l)) AND x = r
      THEN left(acc, length(acc) - length(l)) || m
    ELSE acc || char(31) || x
  END)
"""

# adjacent symbol pairs of a US-delimited symbol string, as structs
_PAIRS = """
transform(
  sequence(1, size(split(s, char(31))) - 1),
  i -> struct(element_at(split(s, char(31)), i) AS l,
              element_at(split(s, char(31)), i + 1) AS r))
"""


def symbolize(words: DataFrame, word_col: str = "w") -> DataFrame:
    """Add the initial symbol string ``s`` (one character per symbol,
    US-delimited) alongside the existing columns. The regexp appends a
    trailing delimiter; substr drops it — same shape as the oracle CTE."""
    rr = F.regexp_replace(F.col(word_col), "(.)", "$1" + US)
    return words.withColumn("s", rr.substr(F.lit(1), F.length(rr) - F.lit(1)))


def _apply_one_merge(s, left: str, right: str, merged: str):
    """Column expression applying ONE merge rule to symbol string ``s``
    — the same left-to-right greedy fold as ``_APPLY_MERGE``, built
    with ``F.lit`` so arbitrary corpus symbols (quotes included) are
    safe, and gated on a cheap contains() prefilter (false positives
    across symbol boundaries just run the fold, which is the decider)."""
    arr = F.split(s, US)

    def step(acc, x):
        match = (
            (acc == F.lit(left))
            | acc.endswith(F.concat(F.lit(US), F.lit(left)))
        ) & (x == F.lit(right))
        keep = acc.substr(F.lit(1), F.length(acc) - F.lit(len(left)))
        return (
            F.when(acc == F.lit(""), x)
            .when(match, F.concat(keep, F.lit(merged)))
            .otherwise(F.concat(acc, F.lit(US), x))
        )

    folded = F.aggregate(arr, F.lit(""), step)
    return F.when(
        s.contains(F.concat(F.lit(left), F.lit(US), F.lit(right))), folded
    ).otherwise(s)


def bpe_apply(
    df: DataFrame, merges: DataFrame, sym_col: str = "s"
) -> DataFrame:
    """Re-segment symbol strings with a TRAINED rule table — the
    tokenizer-apply path: rules fold into one chained map expression
    (no joins, no shuffles; the corpus pays a single narrow pass
    however many rules there are). The rule table is index state, not
    data — bounded by ``bpe_train``'s n_merges guard — so collecting
    it driver-side is the broadcast-a-model pattern, same as the
    Lloyd codebooks. Rules MUST apply in training order (round n's
    rule consumes symbols round n-1 created)."""
    rules = [
        (r["left_sym"], r["right_sym"], r["merged"])
        for r in merges.orderBy("merge_round").collect()
    ]
    if len(rules) > 1000:
        raise ValueError(f"merge table too large to inline: {len(rules)}")
    col = F.col(sym_col)
    for left, right, merged in rules:
        col = _apply_one_merge(col, left, right, merged)
    return df.withColumn(sym_col, col)


def bpe_train(
    words: DataFrame,
    n_merges: int,
    word_col: str = "w",
    freq_col: str = "wf",
) -> DataFrame:
    """Train ``n_merges`` BPE merge rules over a word-frequency table.

    ``words`` is the corpus' distinct-word table (one row per distinct
    word with its count) — the single corpus-sized pass happens in the
    caller, everything here is vocabulary-sized. Returns one row per
    learned rule: (merge_round, left_sym, right_sym, merged,
    pair_count), merge_round 1-based in training order.

    ``n_merges`` Spark jobs run sequentially (the algorithm's own data
    dependency); production trainers run thousands of rounds at this
    same per-round cost. Guarded to a sane interactive bound so a
    miskeyed caller fails loudly instead of scheduling 10⁵ jobs.
    """
    if not 1 <= n_merges <= 1000:
        raise ValueError(f"n_merges must be in [1, 1000], got {n_merges}")

    vocab = (
        symbolize(words, word_col)
        .select("s", F.col(freq_col).cast("bigint").alias("wf"))
        .localCheckpoint(eager=True)
    )

    merges: list[DataFrame] = []
    for rnd in range(1, n_merges + 1):
        pairs = (
            vocab.filter(F.expr("size(split(s, char(31))) >= 2"))
            .select(F.explode(F.expr(_PAIRS)).alias("p"), "wf")
            .select("p.l", "p.r", "wf")
        )
        best = (
            pairs.groupBy("l", "r")
            .agg(F.sum("wf").cast("bigint").alias("pair_count"))
            .orderBy(
                F.col("pair_count").desc(), F.col("l").asc(), F.col("r").asc()
            )
            .limit(1)
            .select(
                F.lit(rnd).alias("merge_round"),
                "l",
                "r",
                F.concat("l", "r").alias("m"),
                "pair_count",
            )
            .localCheckpoint(eager=True)  # 1 row: ends the round's lineage
        )
        merges.append(best)
        # rewrite the vocabulary with the winning rule; the contains()
        # prefilter is a pure optimization (false positives across
        # symbol boundaries just run the fold, which is the decider)
        vocab = (
            vocab.crossJoin(F.broadcast(best.select("l", "r", "m")))
            .select(
                F.when(
                    F.expr("contains(s, l || char(31) || r)"),
                    F.expr(_APPLY_MERGE),
                )
                .otherwise(F.col("s"))
                .alias("s"),
                "wf",
            )
            .localCheckpoint(eager=True)
        )

    out = reduce(DataFrame.unionByName, merges)
    return out.select(
        "merge_round",
        F.col("l").alias("left_sym"),
        F.col("r").alias("right_sym"),
        F.col("m").alias("merged"),
        "pair_count",
    ).orderBy("merge_round")
