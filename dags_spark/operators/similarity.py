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

import numpy as np
import pandas as pd

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
    max_block_rows: int = 8192,
) -> DataFrame:
    """Candidate pairs within a block with exact cosine similarity
    (rounded 6dp) — columns: id_a, id_b, <block_col>, sim.

    symmetric=False -> unordered pairs (id_a < id_b);
    symmetric=True  -> both directions (for per-query kNN).

    Execution: Arrow-batched ``applyInPandas`` per block — one numpy
    kernel per label group instead of a JVM join that materializes a
    64-double array copy per pair (~30x faster at 2k vectors). The
    kernel loops over DIMENSIONS and vectorizes over PAIRS, so every
    dot/norm is accumulated in the exact left-to-right order of
    ``F.aggregate``/DuckDB ``list_sum`` — each float32*float32
    product is exact in float64 and the fold order matches, making
    the raw doubles bit-identical to the SQL oracle. Rounding to 6dp
    stays JVM-side (``F.round`` HALF_UP == DuckDB ROUND; numpy's
    scaled round can misround the last ulp).

    Scale: one shuffle on the block key; each block must fit one
    task (fine for label/IVF-bucket blocking — cap block sizes
    upstream by splitting hot buckets, e.g. sub-bucket on an LSH
    band as in ann_lsh_topk).

    Hot-block guard: the kernel is O(block^2) BY DESIGN, so a skewed
    block key (one label holding 10^6 rows at 100 TB) would silently
    turn the operator quadratic and OOM one task. Any block larger
    than ``max_block_rows`` raises with the sub-bucketing advice
    instead — loud task failure over a silent 10^12-pair kernel.
    """
    id_type = emb.schema[id_col].dataType.simpleString()
    blk_type = emb.schema[block_col].dataType.simpleString()
    out_schema = (
        f"id_a {id_type}, id_b {id_type}, {block_col} {blk_type}, sim double"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        if n > max_block_rows:
            raise ValueError(
                f"blocked_pairs: block {pdf[block_col].iloc[0]!r} has {n} rows "
                f"(> max_block_rows={max_block_rows}); the within-block kernel "
                f"is O(n^2) — split hot blocks upstream (sub-bucket on an LSH "
                f"band / finer IVF cells) or raise max_block_rows explicitly."
            )
        empty = pd.DataFrame({"id_a": [], "id_b": [], block_col: [], "sim": []})
        if n < 2:
            return empty
        m = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        dim = m.shape[1]
        norm2 = np.zeros(n)
        for i in range(dim):  # sequential fold == F.aggregate order
            norm2 = norm2 + m[:, i] * m[:, i]
        norms = np.sqrt(norm2)
        ia, ib = np.triu_indices(n, 1)
        acc = np.zeros(len(ia))
        for i in range(dim):
            acc = acc + m[ia, i] * m[ib, i]
        sim = acc / (norms[ia] * norms[ib])
        ids = pdf[id_col].to_numpy()
        out = pd.DataFrame(
            {
                "id_a": ids[ia],
                "id_b": ids[ib],
                block_col: pdf[block_col].iloc[0],
                "sim": sim,
            }
        )
        if symmetric:
            rev = out.rename(columns={"id_a": "id_b", "id_b": "id_a"})
            out = pd.concat([out, rev[out.columns]], ignore_index=True)
        return out

    pairs = emb.select(id_col, block_col, vec_col).groupBy(block_col).applyInPandas(
        kernel, schema=out_schema
    )
    return pairs.select(
        "id_a", "id_b", block_col, F.round("sim", 6).alias("sim")
    )


def ann_lsh_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_tables: int = 16,
    n_bits: int = 8,
    k: int = 10,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate k-NN via random-hyperplane (sign-LSH) bucketing —
    the scale path when label blocks (or any exact partitioner) are
    unavailable.

    1. ``n_tables`` independent ``n_bits``-bit sign-LSH codes per
       vector, computed in ONE Arrow-batched pandas UDF (a numpy
       matmul against fixed seeded hyperplanes — the realistic way to
       run projections at scale; 64 JVM-side literal dot products per
       row would bloat codegen instead).
    2. candidate pairs = query probes ⋈ index codes on (table,
       bucket) — an equi-join, ~linear in corpus size. With
       ``multiprobe`` the query side also probes each bucket's
       radius-1 Hamming neighbors (bit flips, JVM-side XOR), lifting
       per-table collision odds from p^b to ~p^b + b·p^(b-1)(1-p)
       without extra tables — the standard multi-probe LSH
       memory/recall trade.
    3. exact cosine on candidates (JVM-side), row_number top-k per
       query. Approximate by design -> rows check + recall property
       test vs exact kNN.

    Tuning for scale: recall is set by (n_tables, n_bits, multiprobe)
    against the corpus' similarity profile; bucket count (2^n_bits)
    should grow with corpus size so candidate sets stay ~constant —
    16-20 bits at 10^8-10^9 vectors, the defaults suit 10^3-10^6.
    """
    import random as _random

    from pyspark.sql.types import ArrayType, LongType

    rng = _random.Random(42)
    planes = np.array(
        [[rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_tables * n_bits)]
    )  # (tables*bits, dim), fixed seed -> deterministic
    weights = (1 << np.arange(n_bits)).astype("int64")

    @F.pandas_udf(ArrayType(LongType()))
    def bucket_codes(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (m @ planes.T) > 0  # (batch, tables*bits)
        bits = bits.reshape(len(m), n_tables, n_bits)
        codes = (bits * weights).sum(axis=2)  # (batch, tables)
        return pd.Series(list(codes))

    base = with_norm(emb.select(id_col, vec_col), vec_col)
    coded = base.withColumn("codes", bucket_codes(as_double(F.col(vec_col))))
    buckets = coded.select(
        id_col, "vec_d", "vnorm", F.posexplode("codes").alias("tbl", "bucket")
    )
    if multiprobe:
        probes = F.array(
            F.col("bucket"), *[F.expr(f"bucket ^ {1 << j}") for j in range(n_bits)]
        )
        a_src = buckets.select(
            id_col, "vec_d", "vnorm", "tbl", F.explode(probes).alias("bucket")
        )
    else:
        a_src = buckets
    a = a_src.select(
        F.col(id_col).alias("id_a"), F.col("vec_d").alias("_va"),
        F.col("vnorm").alias("_na"), "tbl", "bucket",
    )
    b = buckets.select(
        F.col(id_col).alias("id_b"), F.col("vec_d").alias("_vb"),
        F.col("vnorm").alias("_nb"), "tbl", "bucket",
    )
    cand = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 6).alias("sim"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id_a").orderBy(F.col("sim").desc(), F.col("id_b"))
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(F.col("id_a").alias("query_id"), F.col("id_b").alias("neighbor_id"), "sim", "rnk")
    )


# DuckDB oracle fragments mirroring the exact same arithmetic.
SQL_VEC_D = "list_transform({v}, x -> CAST(x AS DOUBLE))"
SQL_DOT = (
    "list_sum(list_transform(generate_series(1, len({a})), i -> {a}[i] * {b}[i]))"
)
SQL_NORM = "sqrt(list_sum(list_transform({a}, x -> x * x)))"


def _lloyd_refine(
    emb: DataFrame,
    cents: "np.ndarray",
    vec_col: str,
    iters: int,
) -> "np.ndarray":
    """Fixed-iteration spherical k-means refinement of IVF centroids,
    computed DISTRIBUTIVELY and DETERMINISTICALLY:

    - assignment: one numpy matmul per Arrow batch against the current
      centroids (same kernel as query probing);
    - update: per-(cell, dim) means via posexplode + hash-agg, with
      components quantized FLOOR(x*1e8) to BIGINT so the partial sums
      are exact under any shuffle/aggregation order (float addition is
      non-associative; quantized integer addition is not) — the same
      trick the exact vector-centroid keys use;
    - only the (n_cells × dim) aggregate ever reaches the driver,
      the same constant-size footprint as the fitted centroids
      themselves. Empty cells keep their previous centroid.
    """
    from pyspark.sql.types import IntegerType

    def make_nearest_cell(cur: "np.ndarray"):
        @F.pandas_udf(IntegerType())
        def nearest_cell(vecs: pd.Series) -> pd.Series:
            m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
            m = m / np.sqrt((m * m).sum(axis=1, keepdims=True))
            sims = m @ cur.T
            return pd.Series(np.argmax(sims, axis=1).astype("int32"))

        return nearest_cell

    for _ in range(iters):
        nearest_cell = make_nearest_cell(cents)

        stats = (
            with_norm(emb, vec_col)
            .select(
                nearest_cell(F.col(vec_col)).alias("cell"),
                F.posexplode(
                    F.transform("vec_d", lambda x: x / F.col("vnorm"))
                ).alias("pos", "v"),
            )
            .groupBy("cell", "pos")
            .agg(
                F.sum(F.floor(F.col("v") * 1e8).cast("long")).alias("qs"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new = cents.copy()
        by_cell: dict[int, list] = {}
        for r in stats:
            by_cell.setdefault(r["cell"], []).append(r)
        for cell, rows in by_cell.items():
            vec = np.zeros(cents.shape[1])
            for r in rows:
                vec[r["pos"]] = (r["qs"] / 1e8) / r["n"]
            norm = np.sqrt((vec * vec).sum())
            if norm > 0:
                new[cell] = vec / norm
        cents = new
    return cents


def ann_ivf_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 10,
    k: int = 10,
    lloyd_iters: int = 2,
) -> DataFrame:
    """Approximate kNN via IVF-flat: a data-adaptive coarse quantizer
    (vs ann_lsh_topk's data-oblivious hyperplanes).

    1. initial centroids = the ``n_cells`` vectors with smallest
       ``md5(vec_id)`` — a deterministic uniform sample — then
       ``lloyd_iters`` fixed spherical-k-means refinement passes
       (_lloyd_refine: distributed assignment + exact quantized
       per-cell means, deterministic by construction). Centroids are
       collected to the driver and broadcast — constant-size
       (cells × dim), the one legitimate collect in this module, same
       pattern as shipping a fitted ML model.
    2. every vector is assigned to its nearest centroid by cosine
       (one numpy matmul per Arrow batch); queries additionally probe
       their ``n_probe`` nearest cells.
    3. candidates = probe-cell equi-join, exact cosine re-rank
       (same sequential-fold arithmetic as blocked_pairs), top-k per
       query.

    Scale: n_cells should grow ~sqrt(corpus) so cells stay bounded;
    recall/latency trades via n_probe; Lloyd refinement balances the
    cells. Measured exact-top-10 recall on the fixture's RANDOM
    64-dim vectors (the hardest case — no cluster structure): sampled
    centroids @8 probes 0.73; +2 Lloyd iters 0.79; +2 Lloyd iters
    @10 probes 0.87 (the defaults). On real clustered embeddings the
    same refinement reaches that recall at a much smaller probe
    fraction. Approximate by design -> rows check + recall property
    test (threshold 0.85).
    """
    from pyspark.sql.types import ArrayType, IntegerType

    cent_rows = (
        emb.select(id_col, vec_col)
        .withColumn("__h", F.md5(F.col(id_col).cast("string")))
        .orderBy("__h", id_col)
        .limit(n_cells)
        .collect()
    )
    cents = np.array([np.asarray(r[vec_col], dtype=np.float64) for r in cent_rows])
    cents = cents / np.sqrt((cents * cents).sum(axis=1, keepdims=True))
    if lloyd_iters > 0:
        cents = _lloyd_refine(
            emb.select(id_col, vec_col), cents, vec_col, lloyd_iters
        )

    @F.pandas_udf(ArrayType(IntegerType()))
    def probe_cells(vecs: pd.Series) -> pd.Series:
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        m = m / np.sqrt((m * m).sum(axis=1, keepdims=True))
        sims = m @ cents.T  # (batch, n_cells)
        order = np.argsort(-sims, axis=1, kind="stable")
        return pd.Series(list(order[:, :n_probe].astype("int32")))

    coded = with_norm(emb.select(id_col, vec_col), vec_col).withColumn(
        "cells", probe_cells(F.col(vec_col))
    )
    index_side = coded.select(
        F.col(id_col).alias("id_b"), F.col("vec_d").alias("_vb"),
        F.col("vnorm").alias("_nb"), F.element_at("cells", 1).alias("cell"),
    )
    query_side = coded.select(
        F.col(id_col).alias("id_a"), F.col("vec_d").alias("_va"),
        F.col("vnorm").alias("_na"), F.explode("cells").alias("cell"),
    )
    cand = (
        query_side.join(index_side, "cell")
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 6
            ).alias("sim"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id_a").orderBy(F.col("sim").desc(), F.col("id_b"))
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("id_a").alias("query_id"), F.col("id_b").alias("neighbor_id"),
            "sim", "rnk",
        )
    )
