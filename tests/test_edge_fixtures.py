"""Degenerate-input micro-fixtures: empty documents and empty string
keys, run through the SAME registered (spark fn, oracle SQL) pairs the
driver checks — pinning the 0/0 and empty-string fix class so it
cannot regress (the shipped sf fixtures contain no empty rows, so the
driver's own gate never exercises these branches).
"""

from __future__ import annotations

import os
from pathlib import Path

import duckdb
import pytest

from dags_spark.registry import all_specs
from dags_spark.testing import TABLES, compare

SRC = Path(os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001"))


@pytest.fixture(scope="module")
def edge_sf(tmp_path_factory) -> str:
    """An sf dir whose documents/customer tables carry genuinely
    degenerate rows (empty text, equal 40-char prefixes, empty
    segment keys); every other table symlinks the shipped fixture so
    any registered key can run against the directory."""
    out = tmp_path_factory.mktemp("edge_sf")
    for t in TABLES:
        os.symlink(SRC / f"{t}.parquet", out / f"{t}.parquet")
    con = duckdb.connect()
    # two truly-empty docs (empty-prefix block, levenshtein 0/0),
    # two docs sharing a 40-char prefix with different tails, one
    # normal doc, one single-char doc paired against an empty one.
    os.unlink(out / "documents.parquet")
    con.execute(
        f"""
        COPY (
          SELECT * FROM (VALUES
            (1, '', 'en', 'web', 0),
            (2, '', 'en', 'web', 0),
            (3, repeat('prefix-forty-chars-0123456789abcdefghij', 1) || ' tail one', 'en', 'web', 49),
            (4, repeat('prefix-forty-chars-0123456789abcdefghij', 1) || ' tail 2!!', 'en', 'crawl', 49),
            (5, 'a perfectly ordinary document body', 'en', 'books', 34)
          ) AS t(doc_id, text, lang, source, n_chars)
        ) TO '{out / "documents.parquet"}' (FORMAT PARQUET)
        """
    )
    # customers with empty-string segments on both key parities, so
    # the collation group key '' exists alongside cased groups.
    os.unlink(out / "customer.parquet")
    con.execute(
        f"""
        COPY (
          SELECT * FROM (VALUES
            (1, 'c1', 0, 10.0, ''),
            (2, 'c2', 0, 11.0, ''),
            (3, 'c3', 1, 12.0, 'AUTOMOBILE'),
            (4, 'c4', 1, 13.0, 'automobile')
          ) AS t(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
        ) TO '{out / "customer.parquet"}' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(out)


def _run_pair(spark, edge_sf, key):
    spec = all_specs()[key]
    spark_pdf = spec.fn(spark, edge_sf).toPandas()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{edge_sf}/{t}.parquet')"
        )
    duck_pdf = con.execute(spec.oracle).df()
    con.close()
    assert compare(spark_pdf, duck_pdf) == [], key
    return spark_pdf


def test_levenshtein_verify_empty_pair(spark, edge_sf):
    pdf = _run_pair(spark, edge_sf, "dedup_levenshtein_verify")
    # the two empty docs share the empty-prefix block: distance 0 and
    # sim_ratio exactly 1.0 (the greatest(...,1) clamp), never NaN.
    row = pdf[(pdf.id_a == 1) & (pdf.id_b == 2)]
    assert len(row) == 1
    assert row.edit_dist.iloc[0] == 0
    assert row.sim_ratio.iloc[0] == 1.0
    assert not pdf.sim_ratio.isna().any()
    # the shared-40-char-prefix pair is blocked together and scored
    pair34 = pdf[(pdf.id_a == 3) & (pdf.id_b == 4)]
    assert len(pair34) == 1 and 0 < pair34.sim_ratio.iloc[0] < 1


def test_collate_group_empty_segment(spark, edge_sf):
    pdf = _run_pair(spark, edge_sf, "fn_collate_group")
    empty = pdf[pdf.seg_ci == ""]
    assert len(empty) == 1 and empty.n_rows.iloc[0] == 2
    # '' has exactly one casing image; upper('')=='' counts as upper
    assert empty.n_casings.iloc[0] == 1
    auto = pdf[pdf.seg_ci == "automobile"]
    assert len(auto) == 1 and auto.n_rows.iloc[0] == 2


@pytest.mark.parametrize(
    "key",
    [
        # the wider empty-text family: every key that divides by a
        # length/count derived from text must stay oracle-equal (and
        # NaN-free) when genuinely empty rows exist.
        "text_quality_score",
        "text_token_count",
        "text_stats",
        "dedup_exact",
        "dedup_normalized_exact",
        "text_fingerprint",
    ],
)
def test_empty_doc_family_oracle_equal(spark, edge_sf, key):
    _run_pair(spark, edge_sf, key)
