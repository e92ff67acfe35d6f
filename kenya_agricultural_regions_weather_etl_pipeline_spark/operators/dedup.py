"""Deduplication operators: exact, keep-first/keep-latest keyed, and
near-dup families (MinHash-LSH, SimHash, n-gram Jaccard).

Reference parity: ``drop_duplicates(subset=['region','data_timestamp'])``
(/root/reference/daily_weather_etl_kenya.py:303-306) keeps the first
row pandas saw — an ORDER-DEPENDENT semantics. In a distributed engine
"first" must be made explicit, so :func:`dedup_keep_first` takes a
tiebreak ordering and uses a row_number window. The LLM-pipeline
extensions go far beyond the reference (BASELINE.json north star).

Scale notes (100 TB):
- exact dedup and keyed dedup are one hash-shuffle on the key — Spark
  does partial map-side aggregation for the groupBy forms.
- MinHash-LSH turns the O(n²) pair space into per-band hash-bucket
  joins: candidates only form within identical (band, bucket) pairs,
  so the shuffle is keyed by the band hash — linear-ish in practice.
- All signature computation is JVM-side (xxhash64 + array transforms),
  no Python in the executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalized, shingles


def dedup_exact(df: DataFrame, *cols: str) -> DataFrame:
    """Exact dedup on a column subset (or all columns if none given).

    ``dropDuplicates`` = hash shuffle on the subset + first-agg; fine
    when any surviving row is acceptable.
    """
    return df.dropDuplicates(list(cols) if cols else None)


def dedup_keep_first(
    df: DataFrame, keys: list[str], order_by: list[Column]
) -> DataFrame:
    """Keyed dedup with deterministic 'keep first' under ``order_by``.

    The distributed-correct version of pandas drop_duplicates-keep-first
    (/root/reference/daily_weather_etl_kenya.py:304): one shuffle on
    ``keys``, rank within group, keep rank 1.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_keep_latest(df: DataFrame, keys: list[str], ts_col: str) -> DataFrame:
    """Keep the row with the greatest ``ts_col`` per key (last-write-wins)."""
    return dedup_keep_first(df, keys, [F.col(ts_col).desc(), *[F.col(k) for k in keys]])


# ---------------------------------------------------------------------------
# Near-duplicate detection
# ---------------------------------------------------------------------------

def _minhash_signature(sh: Column, num_hashes: int) -> Column:
    """num_hashes-wide MinHash signature of a shingle array.

    hᵢ(S) = min over shingles of xxhash64(shingle, seed=i). xxhash64 is
    a JVM built-in → the whole signature is one codegen'd expression.
    """
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """MinHash + banded LSH near-dup candidate pairs with estimated Jaccard.

    Pipeline: shingle → minhash signature → split into ``bands`` bands →
    explode (band_id, band_hash) → self-join on equal band keys (bucket
    join, NOT a cross join) → estimate Jaccard as signature agreement →
    filter by threshold. Returns (id_a, id_b, est_jaccard), id_a < id_b.
    """
    rows = num_hashes // bands
    sigs = df.select(
        F.col(id_col).alias("id"),
        _minhash_signature(shingles(F.col(text_col), k_shingle), num_hashes).alias("sig"),
    )
    banded = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.array_join(
                                F.transform(
                                    F.slice("sig", b * rows + 1, rows),
                                    lambda x: x.cast("string"),
                                ),
                                ",",
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bucket")

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    return (
        cand.withColumn("est_jaccard", agree / F.lit(float(num_hashes)))
        .filter(F.col("est_jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    threshold: float = 0.5,
    block_on_prefix: int | None = None,
) -> DataFrame:
    """EXACT n-gram Jaccard similarity pairs via shingle inverted index.

    Explode distinct shingles → self-join on shingle (inverted-index
    join: pairs only form when they share ≥1 shingle) → |A∩B| = count
    of shared shingles → Jaccard = inter / (|A|+|B|−inter).
    SQL-expressible (DuckDB oracle twin in __spark_entry__).

    At 100 TB, add ``block_on_prefix`` (join also on a source/lang/prefix
    blocking key) to bound the inverted-index fanout of stop-shingles.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles(F.col(text_col), k_shingle))).alias("sh"),
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(text: Column, bits: int = 64) -> Column:
    """64-bit SimHash of the whitespace tokens of the normalized text.

    Per token: h = xxhash64(token); for each bit, +1 if set else −1;
    fingerprint bit i = 1 iff the sum is > 0. Implemented as a JVM-side
    fold over bit positions (no UDF).
    """
    toks = F.filter(F.split(normalized(text), " "), lambda t: t != "")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def bit_sum(i: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << i) if i < 63 else F.lit(-(2**63))) != 0, 1).otherwise(-1),
        )

    out = F.lit(0).cast("long")
    for i in range(bits):
        bit_val = F.lit(1 << i) if i < 63 else F.lit(-(2**63))
        out = out + F.when(bit_sum(i) > 0, bit_val).otherwise(F.lit(0))
    return out


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    n_blocks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs under a Hamming-distance bound.

    Pigeonhole blocking: split the 64-bit fingerprint into ``n_blocks``
    16-bit blocks; any pair within ``max_hamming`` (< n_blocks·1) must
    agree on ≥1 block → join per block key, then exact Hamming filter
    via bit_count(xor). Avoids the O(n²) cross join.
    """
    fp = df.select(F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("fp"))
    width = 64 // n_blocks
    blocked = fp.select(
        "id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned("fp", i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("bk"),
    ).select("id", "fp", "bk.blk", "bk.key")
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_cosine_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_bits: int = 8,
) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold, sign-LSH blocked.

    Random-hyperplane sign sketch (deterministic pseudo-planes from
    xxhash64 of (dim, bit)) buckets vectors; near-identical vectors
    almost surely share the bucket; exact cosine verifies.
    """
    from .similarity import sign_bucket
    from ..functions.vectors import cosine, to_double_array

    v = df.select(
        F.col(id_col).alias("id"),
        to_double_array(F.col(vec_col)).alias("vec"),
    ).withColumn("bucket", sign_bucket(F.col("vec"), n_bits))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.vec"), F.col("b.vec")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
