"""Round-10: the packed-accumulator quality counts must be value-
identical to the legacy three-pass form on every input, including the
giant-document guard branch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dags_spark.operators.textops import (
    ALNUM_SPACE,
    STOPWORDS,
    quality_expr,
    quality_score,
)

ADVERSARIAL = [
    "",
    " ",
    "  ",
    "a",
    "an",
    "and",
    "the of to in is a an and",
    "a  b",
    " leading",
    "trailing ",
    "ab",
    "abc",
    "ab\n",
    "a\nb c",
    "x" * 5000,
    ("word " * 200).strip(),
    "café ñoño 文字 😀",
    "the\tand",
    "a   b",
    "anand",
    "theand the",
    "is\n",
    "\n",
    "\nthe x",
    "a.b,c;d",
    # guard branch: > 2^21-1 chars forces the legacy three-pass path
    ("ab " * ((1 << 21) // 3 + 10)),
]


def legacy_quality(text_col: str = "text") -> F.Column:
    """The pre-round-10 formula, verbatim: 3x split, 2 HOF filters."""
    toks = F.split(text_col, " ")
    n_tok = F.size(toks).cast("double")
    arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_ratio = (
        F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("double")
        / n_tok
    )
    short_ratio = (
        F.size(F.filter(toks, lambda t: F.length(t) <= 2)).cast("double") / n_tok
    )
    punct_ratio = (
        F.length(F.translate(text_col, ALNUM_SPACE, "")).cast("double")
        / F.greatest(F.length(text_col), F.lit(1)).cast("double")
    )
    return F.round(
        F.lit(1.0)
        - F.lit(0.5) * stop_ratio
        - F.lit(0.3) * short_ratio
        - F.lit(0.2) * punct_ratio,
        6,
    )


@pytest.fixture(scope="module")
def adv_df(spark):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(ADVERSARIAL)], "doc_id long, text string"
    )


def test_quality_expr_matches_legacy_adversarial(spark, adv_df):
    bad = adv_df.select(
        "doc_id",
        legacy_quality("text").alias("q0"),
        quality_expr("text").alias("q1"),
    ).filter(~F.col("q0").eqNullSafe(F.col("q1")))
    assert bad.count() == 0, bad.limit(5).collect()


def test_quality_expr_matches_legacy_fixture(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bad = docs.select(
        "doc_id",
        legacy_quality("text").alias("q0"),
        quality_expr("text").alias("q1"),
    ).filter(~F.col("q0").eqNullSafe(F.col("q1")))
    assert bad.count() == 0, bad.limit(5).collect()


def test_quality_score_ratios_match_legacy(spark, adv_df):
    """quality_score's individual ratio columns share the fold; pin
    them against independently-computed legacy ratios."""
    toks = F.split("text", " ")
    arr = F.array(*[F.lit(s) for s in STOPWORDS])
    legacy = adv_df.select(
        "doc_id",
        F.round(
            F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("double")
            / F.size(toks).cast("double"),
            6,
        ).alias("stop_ratio"),
        F.round(
            F.size(F.filter(toks, lambda t: F.length(t) <= 2)).cast("double")
            / F.size(toks).cast("double"),
            6,
        ).alias("short_ratio"),
    )
    got = quality_score(adv_df).select("doc_id", "stop_ratio", "short_ratio")
    j = got.alias("g").join(legacy.alias("l"), "doc_id")
    bad = j.filter(
        ~F.col("g.stop_ratio").eqNullSafe(F.col("l.stop_ratio"))
        | ~F.col("g.short_ratio").eqNullSafe(F.col("l.short_ratio"))
    )
    assert bad.count() == 0, bad.limit(5).collect()
