"""SimHash document fingerprints, cross-engine deterministic.

SimHash: each token votes ±1 on every bit of its hash; the document
fingerprint takes the sign of each bit's vote sum. Near-duplicate
documents (mostly-shared token multisets) land within a small Hamming
distance.

Cross-engine trick: the per-token hash is derived from md5 hex
*nibbles* — ``instr('0123456789abcdef', substr(md5(tok), p, 1)) - 1``
— pure string+integer arithmetic that evaluates identically in Spark
and DuckDB, so the 32-bit fingerprint is hash-checkable against an
oracle (engine-native hash functions like xxhash64 differ across
engines and would not be).

Scale: one explode + one groupBy per corpus — the vote sums are 32
plain SUM aggregates with map-side partial aggregation; pairing uses
16-bit band blocking (same-band equality join), never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BITS = 32


def _bit_expr(j: int, md5_col: str = "h", div_op: str = "DIV") -> str:
    """SQL for bit j of the md5-nibble hash.

    Same arithmetic in both engines; only the integer-division spelling
    differs (Spark ``DIV``, DuckDB ``//``)."""
    p = j // 4 + 1
    div = 1 << (j % 4)
    nib = f"(instr('0123456789abcdef', substr({md5_col}, {p}, 1)) - 1)"
    return f"(({nib} {div_op} {div}) % 2)" if div > 1 else f"({nib} % 2)"


def simhash_sql_fragments(div_op: str = "DIV") -> tuple[list[str], str]:
    """(vote_exprs, fold_expr) SQL fragments shared with the oracle."""
    votes = [
        f"SUM(2 * {_bit_expr(j, div_op=div_op)} - 1) AS s{j}" for j in range(BITS)
    ]
    fold = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(BITS)
    )
    return votes, f"CAST({fold} AS BIGINT)"


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash32) per document over whitespace tokens."""
    votes, fold = simhash_sql_fragments()
    tok = docs.select(
        F.col(id_col), F.explode(F.split(text_col, " ")).alias("token")
    ).withColumn("h", F.md5("token"))
    agg = tok.groupBy(id_col).agg(*[F.expr(e) for e in votes])
    return agg.select(F.col(id_col), F.expr(fold).alias("simhash32"))


def simhash_band_pairs(
    sig: DataFrame, id_col: str = "doc_id", max_hamming: int = 6
) -> DataFrame:
    """Candidate pairs sharing either 16-bit half (LSH banding), kept
    when Hamming distance <= max_hamming.

    Banding is the scale path: a pair is compared only if one band
    matches exactly, so the join is equi on (band_id, band_value).
    Pairs whose differing bits straddle both bands are (by design)
    not candidates — the oracle encodes the same band condition.
    """
    bands = sig.select(
        id_col,
        "simhash32",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band_id"), (F.col("simhash32") % 65536).alias("bv")),
                F.struct(F.lit(1).alias("band_id"), F.expr("simhash32 DIV 65536").alias("bv")),
            )
        ).alias("b"),
    ).select(id_col, "simhash32", "b.band_id", "b.bv")
    a = bands.select(
        F.col(id_col).alias("id_a"), F.col("simhash32").alias("sh_a"), "band_id", "bv"
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), F.col("simhash32").alias("sh_b"), "band_id", "bv"
    )
    return (
        a.join(b, ["band_id", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.expr("sh_a ^ sh_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
