"""Round-10 chunk-pair split of blocked_pairs: the chunked kernel must
be output-equivalent to the unchunked one at the consumer level, and
the masked-diagonal cut must never resurrect self-pairs (the -inf
k-th edge when a tile holds fewer than k real pairs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dags_spark.operators.similarity import blocked_pairs


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _topk(df, k=100):
    return (
        df.orderBy(F.col("sim").desc(), "id_a", "id_b")
        .limit(k)
        .toPandas()
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("m", [2, 5])
def test_chunked_topk_equals_unchunked(emb, m):
    base = _topk(blocked_pairs(emb, per_block_topk=100))
    chunked = _topk(blocked_pairs(emb, per_block_topk=100, n_chunks=m))
    assert base.equals(chunked)


def test_chunked_min_sim_identical_pair_set(emb):
    base = (
        blocked_pairs(emb, min_sim=0.4)
        .filter(F.col("sim") >= 0.4)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    chunked = (
        blocked_pairs(emb, min_sim=0.4, n_chunks=3)
        .filter(F.col("sim") >= 0.4)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert base.equals(chunked)


def test_no_self_pairs_when_tiles_smaller_than_k(spark):
    """Chunked tiny blocks: every (c,c) tile holds far fewer than k
    pairs, so the per-tile k-th cut lands on a -inf mask cell — the
    regression this pins is those cells surviving the cut and coming
    back from the exact recompute as sim=1.0 self-pairs."""
    rows = [(i, "x", [float((i * 7 + j) % 5) for j in range(8)]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    out = blocked_pairs(
        df, per_block_topk=100, n_chunks=4
    ).toPandas()
    assert (out["id_a"] != out["id_b"]).all()
    # 12 vectors -> 66 unordered pairs, all emitted (k > pairs)
    assert len(out.drop_duplicates(["id_a", "id_b"])) == 66


def test_adaptive_chunks_gate(spark, emb):
    """Round 11: the chunk split is gated on corpus size. Small corpora
    (sf0.1's 2k vectors) must stay one-task-per-block (m=1 — the r10
    unconditional split was the round's only code-linked bench
    regression); corpora past ~64k estimated rows chunk at
    isqrt(defaultParallelism)."""
    import math

    from dags_spark.operators.similarity import adaptive_chunks

    # sf0.1 embeddings: ~0.8 MB -> ~3k estimated rows -> no chunking
    assert adaptive_chunks(emb) == 1
    # a scan whose optimizer stats exceed the gate must chunk: union
    # the scan until est rows (sizeInBytes/256) clears 8*8192
    big = emb
    for _ in range(7):  # 2^7 = 128x -> ~100 MB stats
        big = big.union(big)
    expected = max(1, math.isqrt(spark.sparkContext.defaultParallelism))
    assert adaptive_chunks(big) == expected
