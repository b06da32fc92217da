"""Text-analysis operators for training-data pipelines.

Language-ID, quality scoring, token counting, and rolling-hash
fingerprinting over a document table — the text-side companions to
dedup (operators/dedup.py, operators/simhash.py) and similarity
(operators/similarity.py).

Every operator is pure DataFrame built-ins (JVM-side, whole-stage
codegen, no Python UDFs) and every score is either integer arithmetic
or a single fixed-order float expression rounded to 6dp, so results
hash-match a DuckDB oracle exactly.

Scale notes (100 TB design point):
  - token explodes feed map-side partial aggregation; the per-language
    profile table is vocab-sized (tiny) and broadcast back, so
    language-ID is one shuffle of doc term-frequencies, never N×L rows.
  - quality / token-count / fingerprint are narrow per-row projections:
    no shuffle at all, scan-bound, fully pushdown/prune friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# BPE-ish tokenizer: letter runs, digit runs, single non-alnum marks.
# Kept POSIX-simple so Java regex (Spark) and RE2 (DuckDB) agree.
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

# Tiny stopword list present in any English-ish corpus; the quality
# formula only needs *a* deterministic stopword set.
STOPWORDS = ("a", "an", "the", "of", "to", "in", "and", "is")

ROLLING_BASE = 31
ROLLING_MOD = 1_000_000_007

# The 63 characters the punct-ratio treats as "clean"; punct count =
# length(text) - length(translate(text, ALNUM_SPACE, "")) is
# char-table work (~8x faster than the regex [^A-Za-z0-9 ] at sf1 —
# the q10 profile in BENCH_SF1.md) and code-point-identical to it in
# both engines (verified row-exact at sf1).
ALNUM_SPACE = (
    "0123456789"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "abcdefghijklmnopqrstuvwxyz "
)


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc token accounting: whitespace tokens, BPE-ish regex
    tokens, and character length — the unit a token-budget pipeline
    bills by. Narrow projection, no shuffle."""
    ws = F.split(text_col, " ")
    re_toks = F.regexp_extract_all(text_col, F.lit(TOKEN_RE), 0)
    return docs.select(
        F.col(id_col),
        F.size(ws).cast("long").alias("ws_tokens"),
        F.size(re_toks).cast("long").alias("re_tokens"),
        F.length(text_col).cast("long").alias("n_chars_measured"),
    )


def _stopword_hits(tokens: Column) -> Column:
    arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def _quality_raw(text_col: str) -> Column:
    """The UNROUNDED quality double in one array pass.

    The naive form — ``size(split)`` plus two ``size(filter(split))``
    — evaluates ``split`` three times per row and materializes two
    filtered string arrays, all interpreted (higher-order functions
    sit outside whole-stage codegen). Round 10 folds all three counts
    into ONE ``aggregate`` over ONE ``split``, packed into a single
    BIGINT accumulator (21 bits per count, no per-step struct
    allocation), and computes the final double inside the aggregate's
    ``finish`` lambda so the accumulator is bound exactly once — NOT
    via three columns referencing the fold, which re-evaluates it per
    reference (interpreted mode only eliminates common subexpressions
    outside conditional branches; the first cut of this change sat
    the fold under a ``when()`` and measured 0.84 -> 1.38 s, i.e.
    3x-evaluated. The committed shape measures 0.84 -> 0.72 s on the
    sf10-tier filter stage, interleaved min-of-5).

    The ratio arithmetic is the exact expression order of the legacy
    form over the same integer counts, so the rounded result is
    bit-identical (pinned on fixture + adversarial strings by
    tests/test_textops_quality.py).

    Texts of >= 2^21-1 chars (whose token count could overflow a
    21-bit lane) take the legacy three-pass form via a per-row
    guard — same values, only slower, and only for multi-megabyte
    single documents.
    """
    c = F.col(text_col)
    toks = F.split(text_col, " ")
    arr = F.array(*[F.lit(s) for s in STOPWORDS])
    lane = F.lit((1 << 21) - 1)
    # greatest(len, 1): an empty document has 0 chars; without the
    # clamp the 0/0 punct ratio raises DIVIDE_BY_ZERO under ANSI
    # (pinned by tests/test_edge_fixtures.py). 0 punct / 1 == 0.0.
    punct_ratio = (
        F.length(F.translate(text_col, ALNUM_SPACE, "")).cast("double")
        / F.greatest(F.length(text_col), F.lit(1)).cast("double")
    )

    def finish(acc: Column) -> Column:
        n_tok = F.shiftright(acc, 42).cast("double")
        n_stop = F.shiftright(acc, 21).bitwiseAND(lane).cast("double")
        n_short = acc.bitwiseAND(lane).cast("double")
        return (
            F.lit(1.0)
            - F.lit(0.5) * (n_stop / n_tok)
            - F.lit(0.3) * (n_short / n_tok)
            - F.lit(0.2) * punct_ratio
        )

    folded = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda a, t: a
        + F.lit(1 << 42)
        + F.when(F.array_contains(arr, t), F.lit(1 << 21)).otherwise(F.lit(0))
        + F.when(F.length(t) <= 2, F.lit(1)).otherwise(F.lit(0)),
        finish,
    )

    n_tok_l = F.size(toks).cast("double")
    legacy = (
        F.lit(1.0)
        - F.lit(0.5) * (_stopword_hits(toks).cast("double") / n_tok_l)
        - F.lit(0.3)
        * (F.size(F.filter(toks, lambda t: F.length(t) <= 2)).cast("double") / n_tok_l)
        - F.lit(0.2) * punct_ratio
    )
    return F.when(F.length(c) < F.lit((1 << 21) - 1), folded).otherwise(legacy)


def quality_expr(text_col: str = "text") -> F.Column:
    """The pinned quality formula as a single column expression —
    usable inline (``docs.withColumn(..., quality_expr())``) so
    pipelines can filter on quality without joining the corpus back
    to its own scored projection. One array pass per row via
    ``_quality_raw`` (see its docstring for the round-10 fold)."""
    return F.round(_quality_raw(text_col), 6)


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic document quality in [~0, 1].

    Pinned formula [D] (linear so float evaluation order is fixed and
    identical across engines; rounded 6dp):

        stop_ratio  = stopword_tokens / tokens
        short_ratio = tokens with length <= 2 / tokens
        punct_ratio = non-alnum-non-space chars / chars
        quality     = round(1 - 0.5*stop_ratio - 0.3*short_ratio
                              - 0.2*punct_ratio, 6)

    Keeps the legacy three-pass count form: this operator EMITS every
    ratio, so the packed-fold trick in ``_quality_raw`` (whose whole
    point is binding the accumulator once inside a single finish
    lambda) would be re-evaluated per emitted column here —
    interpreted mode has no cross-column subexpression elimination
    under conditionals, the exact trap _quality_raw documents.
    """
    toks = F.split(text_col, " ")
    n_tok = F.size(toks).cast("double")
    stop_ratio = _stopword_hits(toks).cast("double") / n_tok
    short_ratio = (
        F.size(F.filter(toks, lambda t: F.length(t) <= 2)).cast("double") / n_tok
    )
    # greatest(len, 1): an empty document has 0 chars; without the
    # clamp the 0/0 punct ratio raises DIVIDE_BY_ZERO under ANSI
    # (pinned by tests/test_edge_fixtures.py). 0 punct / 1 == 0.0.
    punct_ratio = (
        F.length(F.translate(text_col, ALNUM_SPACE, "")).cast("double")
        / F.greatest(F.length(text_col), F.lit(1)).cast("double")
    )
    return docs.select(
        F.col(id_col),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(short_ratio, 6).alias("short_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(
            F.lit(1.0)
            - F.lit(0.5) * stop_ratio
            - F.lit(0.3) * short_ratio
            - F.lit(0.2) * punct_ratio,
            6,
        ).alias("quality"),
    )


def langid_predict(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", lang_col: str = "lang"
) -> DataFrame:
    """Corpus-trained token-profile language-ID (Cavnar–Trenkle
    shape: score a document against each language's term-frequency
    profile, predict the argmax).

    score(d, L) = Σ_t  tf_doc(d, t) · tf_corpus(L, t)  — pure BIGINT
    arithmetic, so the argmax (ties broken by lang name) hash-matches
    the oracle exactly. On the synthetic fixture every language shares
    one vocabulary, so accuracy is chance — the *mechanism* is what
    ships; on real multilingual data the same plan separates languages.

    Plan shape: one explode + two partial-agg shuffles; the per-lang
    profile is vocab×langs rows (tiny) and re-joined via broadcast.
    """
    tok = docs.select(
        F.col(id_col), F.col(lang_col), F.explode(F.split(text_col, " ")).alias("token")
    )
    doc_tf = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("n_d"))
    lang_tf = tok.groupBy(F.col(lang_col).alias("cand_lang"), F.col("token")).agg(
        F.count(F.lit(1)).alias("n_l")
    )
    scores = (
        doc_tf.join(F.broadcast(lang_tf), "token")
        .groupBy(id_col, "cand_lang")
        .agg(F.sum(F.col("n_d") * F.col("n_l")).alias("score"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("cand_lang"))
    pred = (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col(id_col), F.col("cand_lang").alias("pred_lang"), "score")
    )
    return docs.select(id_col, lang_col).join(pred, id_col)


def rolling_fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Polynomial rolling-hash document fingerprint:

        h = fold(chars, 0, (acc, c) -> (acc*31 + ascii(c)) mod 1e9+7)

    Modding every step keeps acc < 2^35 (no int64 overflow), and the
    fold is a JVM-side higher-order `aggregate` — per-row, no shuffle,
    identical arithmetic to the DuckDB `list_reduce` oracle."""
    rh = F.aggregate(
        F.split(text_col, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(ROLLING_BASE) + F.ascii(c)) % F.lit(ROLLING_MOD),
    )
    return docs.select(F.col(id_col), rh.alias("fingerprint"))


def normalize_text(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Canonical text normalization for training corpora: lowercase,
    strip non-alphanumerics to spaces, collapse space runs, trim.
    Narrow per-row projection — scan-bound, no shuffle; the standard
    pre-pass before exact dedup so near-identical casings collapse."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return docs.select(
        F.col(id_col),
        norm.alias("norm_text"),
        F.size(F.split(norm, " ")).cast("long").alias("n_tokens_norm"),
    )


def repetition_ratios(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Repetition quality signals: duplicate-token fraction and
    duplicate-n-gram fraction per doc (the classic 'repetitious
    document' filter in LLM data pipelines — boilerplate and generated
    spam repeat n-grams far more than natural text).

        tok_rep  = 1 - |distinct tokens| / |tokens|
        gram_rep = 1 - |distinct n-grams| / |n-grams|   (0 when < n)

    All JVM higher-order functions on one row — no explode, no
    shuffle; at 100 TB this is a pure scan-stage filter column."""
    toks = F.split(text_col, " ")
    tok_rep = F.round(
        F.lit(1.0)
        - F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double"),
        6,
    )
    gram = " || ' ' || ".join(f"__t[i + {j}]" for j in range(-1, n - 1))
    n_gram = F.size(F.col("__grams"))
    gram_rep = F.when(n_gram <= 0, F.lit(0.0)).otherwise(
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct("__grams")).cast("double")
            / n_gram.cast("double"),
            6,
        )
    )
    return (
        docs.select(F.col(id_col), tok_rep.alias("tok_rep"), toks.alias("__t"))
        .withColumn(
            "__grams",
            # explicit short-doc branch: Spark's sequence(1, 0) yields a
            # DESCENDING [1, 0] (DuckDB's generate_series is empty), and
            # the out-of-range element access would throw under ANSI.
            F.expr(
                f"case when size(__t) < {n} then array() "
                f"else transform(sequence(1, size(__t) - {n - 1}), i -> {gram}) end"
            ),
        )
        .select(id_col, "tok_rep", gram_rep.alias("gram_rep"))
    )


def strip_stopwords(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stopword removal accounting: tokens before/after dropping the
    pinned stopword set, plus the kept ratio. Per-row lambda filter —
    no shuffle, no explode."""
    toks = F.split(text_col, " ")
    arr = F.array(*[F.lit(s) for s in STOPWORDS])
    kept = F.filter(toks, lambda t: ~F.array_contains(arr, t))
    return docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(kept).cast("long").alias("n_kept"),
        F.round(F.size(kept).cast("double") / F.size(toks).cast("double"), 6).alias(
            "kept_ratio"
        ),
    )


# --- DuckDB oracle fragments (same arithmetic, DuckDB spelling) ------

SQL_TOKEN_RE = TOKEN_RE
SQL_STOPWORDS = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
SQL_ROLLING = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(regexp_extract_all({t}, '.'), c -> CAST(ascii(c) AS BIGINT))), "
    f"(acc, x) -> (acc * {ROLLING_BASE} + x) % {ROLLING_MOD})"
)
