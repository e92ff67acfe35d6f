"""Document chunking + sequence packing for LLM training pipelines.

Two pre-training preprocessing steps the reference's 15-row weather ETL
never needed but a 100 TB corpus pipeline runs on every document:

- **Chunking** (:func:`chunk_documents`): split each document into
  fixed-size overlapping token windows (the "context window" cut).
  Implemented as a narrow per-row ``transform`` over a token index
  sequence followed by ``posexplode`` — NO shuffle, NO Python; at
  cluster scale this is a pure map stage that codegens.

- **Sequence packing** (:func:`pack_sequences`): assign documents to
  fixed-token-budget packs (so short docs share one training sequence
  instead of wasting pad tokens). Uses the deterministic
  cumulative-sum bucketing form: within each partition key, order docs
  by a stable key, take the running token total, and bucket by
  ``floor(cum_before / budget)``. This is the shuffle-friendly
  approximation of greedy first-fit (one window per key, not a global
  sort), and it is a pure function of (key order, token counts), so
  the DuckDB oracle reproduces the exact assignment.

At 100 TB: chunking is embarrassingly parallel; packing shuffles once
on the partition key — pick a key with bounded cardinality per
partition (lang, source shard) so each window's state is a running
long, not a buffered partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 50,
    overlap: int = 10,
) -> DataFrame:
    """Fixed-size overlapping token windows per document.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_size)`` with
    ``stride = chunk_size - overlap``; the final chunk may be short.
    Output: (id_col, chunk_id, chunk_text, n_tokens) — one row per
    chunk, chunk_id 0-based.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}")
    stride = chunk_size - overlap
    toks = tokens(F.col(text_col))
    # let-bind the token array through a 1-element transform so the
    # tokenizer regex runs once per row, not once per chunk expression
    bound = F.transform(F.array(F.lit(1)), lambda _: toks)[0]
    n = F.size(bound)
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(float(stride))).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(bound, i * stride + 1, chunk_size), " "),
    )
    exploded = df.select(
        F.col(id_col),
        n.alias("_n"),
        F.posexplode(chunks).alias("chunk_id", "chunk_text"),
    )
    return exploded.select(
        id_col,
        "chunk_id",
        "chunk_text",
        F.least(
            F.lit(chunk_size), F.col("_n") - F.col("chunk_id") * stride
        ).alias("n_tokens"),
    )


def chunk_documents_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 50,
    overlap: int = 10,
) -> str:
    """DuckDB twin of :func:`chunk_documents` (same stride math)."""
    stride = chunk_size - overlap
    toks = (
        f"list_filter(regexp_split_to_array({text_col}, '\\s+'), t -> t <> '')"
    )
    return f"""
WITH base AS (
  SELECT {id_col}, {toks} AS t FROM {table}
), sized AS (
  SELECT {id_col}, t, len(t) AS n,
         greatest(1, CAST(ceil((len(t) - {overlap}) / {float(stride)}) AS INT)) AS n_chunks
  FROM base
)
SELECT {id_col},
       CAST(u.i AS INT) AS chunk_id,
       array_to_string(t[u.i*{stride}+1 : u.i*{stride}+{chunk_size}], ' ') AS chunk_text,
       CAST(least({chunk_size}, n - u.i*{stride}) AS INT) AS n_tokens
FROM sized, LATERAL unnest(range(0, n_chunks)) AS u(i)
"""


def pack_sequences(
    df: DataFrame,
    n_tokens: Column,
    budget: int,
    partition_col: str = "lang",
    order_col: str | list[str] = "doc_id",
) -> DataFrame:
    """Assign each row a ``pack_id`` so packs hold ~``budget`` tokens.

    Deterministic cumulative bucketing: pack boundary falls wherever the
    running token total (ordered by ``order_col`` within
    ``partition_col``) crosses a multiple of ``budget``. Documents
    larger than ``budget`` get a pack of their own (the bucket index
    still advances past them).
    """
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = (
        Window.partitionBy(partition_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # project n_tokens FIRST, then window over the column — reusing the
    # raw expression inside the window frame would evaluate the (possibly
    # expensive) token count twice per row
    sized = df.select(partition_col, *order_cols, n_tokens.alias("n_tokens"))
    cum = F.sum("n_tokens").over(w)
    return sized.select(
        partition_col,
        *order_cols,
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / F.lit(budget)).cast("int").alias("pack_id"),
    )


def pack_sequences_sql(
    table: str,
    n_tokens_sql: str,
    budget: int,
    partition_col: str = "lang",
    order_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`pack_sequences`."""
    return f"""
WITH sized AS (
  SELECT {partition_col}, {order_col}, {n_tokens_sql} AS n_tokens FROM {table}
)
SELECT {partition_col}, {order_col}, CAST(n_tokens AS INT) AS n_tokens,
       CAST(floor((sum(n_tokens) OVER (
              PARTITION BY {partition_col} ORDER BY {order_col}
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) - n_tokens) / {budget}) AS INT) AS pack_id
FROM sized
"""
