"""Public operator facade — the curated surface a pipeline author
imports, re-exported from the implementing modules. Everything takes
and returns plain DataFrames, so these compose with arbitrary user
transformations under one Catalyst plan.

    from dags_spark.api import asof_join, exact_dedup, Graph, ...

Session-conf contract: ``table``/``load_tables``/``register_views``
pin ``spark.sql.session.timeZone`` to UTC (with a warning if that
changes an explicit non-UTC zone) the first time the ``events`` table
is read — its NTZ->LTZ timestamp normalization is only
value-preserving under UTC. They also enable
``spark.sql.legacy.parquet.nanosAsLong`` for the same scan; any
external TIMESTAMP(NANOS) parquet read in the same session must set
that conf itself (see io.py for why it cannot be scoped/restored:
the lazily-cached scan plan re-resolves under the live conf).
"""

from __future__ import annotations

from .graph.core import Graph, NodeSpec, schema_implements
from .graph.schemas import SchemaDoc, load_schema_file, load_schemas
from .io import load_tables, register_views, table
from .operators.asof import asof_join
from .operators.iterative import (
    bounded_bfs,
    pagerank_fixed,
    resample_interp_daily,
)
from .operators.dedup import (
    connected_components,
    exact_dedup,
    latest_by_key,
    minhash_banded_pairs,
    minhash_near_dup_pairs,
    token_ngram_jaccard_pairs,
)
from .operators.dq import OK_EVENT_TYPES, event_reject_reason
from .operators.hypertable import hierarchical_rollup
from .operators.multimodal import attach_binary, decode_features
from .operators.rangejoin import binned_band_join
from .operators.scale import (
    bucketed_join,
    global_rank,
    salted_join,
    write_bucketed,
)
from .operators.similarity import (
    ann_ivf_topk,
    ann_lsh_topk,
    ann_pq_topk,
    blocked_pairs,
)
from .operators.simhash import simhash, simhash_band_pairs
from .operators.textops import (
    langid_predict,
    normalize_text,
    quality_score,
    rolling_fingerprint,
    strip_stopwords,
    token_counts,
)
from .operators.trainprep import (
    assign_split,
    contaminated_docs,
    global_cumsum,
    hash_byte,
    pack_sequences,
)
from .session import get_spark, tune

__all__ = [
    "Graph",
    "NodeSpec",
    "schema_implements",
    "SchemaDoc",
    "load_schemas",
    "load_schema_file",
    "get_spark",
    "tune",
    "table",
    "load_tables",
    "register_views",
    "asof_join",
    "bounded_bfs",
    "pagerank_fixed",
    "resample_interp_daily",
    "exact_dedup",
    "latest_by_key",
    "minhash_near_dup_pairs",
    "minhash_banded_pairs",
    "token_ngram_jaccard_pairs",
    "connected_components",
    "blocked_pairs",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_pq_topk",
    "simhash",
    "simhash_band_pairs",
    "binned_band_join",
    "event_reject_reason",
    "OK_EVENT_TYPES",
    "hierarchical_rollup",
    "salted_join",
    "bucketed_join",
    "write_bucketed",
    "global_rank",
    "global_cumsum",
    "pack_sequences",
    "contaminated_docs",
    "assign_split",
    "hash_byte",
    "attach_binary",
    "decode_features",
    "token_counts",
    "quality_score",
    "langid_predict",
    "normalize_text",
    "strip_stopwords",
    "rolling_fingerprint",
]
