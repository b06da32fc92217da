"""Vector similarity operators over ArrayType(FloatType) embeddings.

Exact cosine via JVM-side higher-order functions: elements are cast
to double BEFORE any arithmetic (float math then widening would drift
vs the DuckDB oracle), dot products run through ``zip_with`` +
``aggregate`` (sequential, whole-stage-codegen'd — no Python
boundary), and similarities are rounded to 6dp for cross-engine
hashing.

Scale path: the label column is the blocking key — candidate pairs
are generated per label block (an equi-join, shuffle on label), never
all-pairs. For 100 TB you swap `label` for an IVF/LSH bucket id
produced upstream (see operators.dedup for the LSH machinery) and
this same pairing code applies; norms are precomputed once per vector
so each pair costs one fused dot product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def with_norm(df: DataFrame, vec_col: str, out_vec: str = "vec_d", out_norm: str = "vnorm") -> DataFrame:
    """Precompute the double-cast vector and its L2 norm once per row."""
    d = as_double(F.col(vec_col))
    return df.withColumn(out_vec, d).withColumn(out_norm, norm(F.col(out_vec)))


def blocked_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    symmetric: bool = False,
) -> DataFrame:
    """Candidate pairs within a block with exact cosine similarity
    (rounded 6dp) — columns: id_a, id_b, <block_col>, sim.

    symmetric=False -> unordered pairs (id_a < id_b);
    symmetric=True  -> both directions (for per-query kNN).
    """
    base = with_norm(emb.select(id_col, block_col, vec_col), vec_col)
    a = base.select(
        F.col(id_col).alias("id_a"),
        F.col(block_col).alias("_blk"),
        F.col("vec_d").alias("_va"),
        F.col("vnorm").alias("_na"),
    )
    b = base.select(
        F.col(id_col).alias("id_b"),
        F.col(block_col).alias("_blk_b"),
        F.col("vec_d").alias("_vb"),
        F.col("vnorm").alias("_nb"),
    )
    cond = (a._blk == b._blk_b) & (
        (a.id_a != b.id_b) if symmetric else (a.id_a < b.id_b)
    )
    return (
        a.join(b, cond)
        .select(
            "id_a",
            "id_b",
            F.col("_blk").alias(block_col),
            F.round(dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 6).alias(
                "sim"
            ),
        )
    )


# DuckDB oracle fragments mirroring the exact same arithmetic.
SQL_VEC_D = "list_transform({v}, x -> CAST(x AS DOUBLE))"
SQL_DOT = (
    "list_sum(list_transform(generate_series(1, len({a})), i -> {a}[i] * {b}[i]))"
)
SQL_NORM = "sqrt(list_sum(list_transform({a}, x -> x * x)))"
