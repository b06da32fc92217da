"""Document deduplication operators.

- exact_dedup: hash-groupBy keep-min-id (one shuffle on the content
  fingerprint, never on the full text).
- latest_by_key: the reference library's signature accumulate +
  dedupe-by-natural-key semantic — row_number()=1 over the key
  ordered by recency.
- minhash_near_dup_pairs: MinHash+LSH near-duplicate candidate pairs
  over character shingles (spark.ml MinHashLSH: banding keeps the
  candidate set ~linear instead of O(n²) — the 100 TB scale path).

All shingling happens JVM-side via SQL higher-order functions; the
only Python involvement is plan construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep the minimum-id row per identical content value.

    Aggregating min(id) over md5(content) shuffles only (hash, id)
    pairs — at 100 TB the text column never crosses the wire.
    """
    fp = F.md5(F.col(content_col)).alias("content_md5")
    return df.select(fp, F.col(id_col)).groupBy("content_md5").agg(
        F.min(id_col).alias(id_col)
    )


def latest_by_key(
    df: DataFrame, keys: list[str], order_by: list, keep: int = 1
) -> DataFrame:
    """Latest row per natural key — `unique_on` + recency semantics."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= keep)
        .drop("__rn")
    )


def shingles(text_col: str, k: int = 5) -> F.Column:
    """Character k-shingles as a distinct array (JVM-side lambda)."""
    return F.array_distinct(
        F.expr(f"transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)), "
               f"i -> substring({text_col}, i, {k}))")
    )


def minhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    jaccard_threshold: float = 0.6,
    num_hash_tables: int = 8,
    num_features: int = 1 << 18,
) -> DataFrame:
    """Near-duplicate pairs (estimated Jaccard >= threshold) via
    HashingTF(binary) -> MinHashLSH.approxSimilarityJoin.

    LSH banding bounds candidate generation: each of the
    ``num_hash_tables`` hash values buckets the corpus, and only
    same-bucket pairs are compared — linear-ish in corpus size vs the
    quadratic exact self-join. Returns (id_a, id_b, jaccard_est) with
    id_a < id_b.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = docs.select(id_col, shingles(text_col, k).alias("sh")).filter(
        F.size("sh") > 0
    )
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=num_features, binary=True)
    feats = tf.transform(sh)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, 1.0 - jaccard_threshold, distCol="dist"
    )
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round(1.0 - F.col("dist"), 6).alias("jaccard_est"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
