"""SURVEY §2.15 — the graph/orchestration layer as a checked query.

The reference library's identity is the declared DAG of pipes
(Python functions and SQL templates over upstream nodes) executed in
topological order. `graph_pipeline_revenue` runs a real 4-node graph
— two Python source/filter pipes, a SQL join+aggregate pipe over
their temp views, and a Python post-processing pipe — through
``dags_spark.graph.Graph`` and hash-checks the final node against a
single equivalent SQL statement.

Because non-materialized nodes stay lazy, the whole 4-node graph
compiles to ONE Catalyst plan: the shipdate filter from node 1 is
pushed into the parquet scan of the final job, proving inter-node
optimization (the main scale advantage over materialize-per-node
orchestrators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import SQL_CENTS, SQL_DEC_SUM, table
from ..graph.core import Graph
from ..registry import register

_CUTOFF = "1998-01-01"


@register(
    "graph_pipeline_revenue",
    oracle=f"""
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       {SQL_DEC_SUM('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{_CUTOFF}'
GROUP BY o_orderpriority
""",
)
def graph_pipeline_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-node DAG: python filter pipes -> SQL join/agg pipe -> python
    projection pipe; the Graph layer wires temp views and topo-order,
    Catalyst fuses all nodes into one optimized plan."""
    g = Graph("revenue_pipeline")

    @g.node(name="recent_items")
    def recent_items(spark: SparkSession, deps) -> DataFrame:
        return table(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate") >= F.lit(_CUTOFF).cast("timestamp")
        )

    @g.node(name="orders_src")
    def orders_src(spark: SparkSession, deps) -> DataFrame:
        return table(spark, sf_dir, "orders")

    g.sql_node(
        name="revenue_raw",
        upstream=["recent_items", "orders_src"],
        sql=f"""
            SELECT o_orderpriority,
                   COUNT(*) AS n_items,
                   SUM({SQL_CENTS('l_extendedprice * (1 - l_discount)', 4)}) AS rev_cents
            FROM recent_items JOIN orders_src ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
    )

    @g.node(name="revenue_by_priority", upstream=["revenue_raw"])
    def revenue_by_priority(spark: SparkSession, deps) -> DataFrame:
        return deps["revenue_raw"].select(
            "o_orderpriority",
            "n_items",
            (F.col("rev_cents").cast("double") / F.lit(10_000.0)).alias("revenue"),
        )

    return g.run(spark)["revenue_by_priority"]


@register(
    "graph_incremental_upsert",
    oracle="""
SELECT user_id, event_type, event_id, value
FROM (
  SELECT user_id, event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def graph_incremental_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The graph layer's full incremental lifecycle under the hash
    check: events arrive in two batches (even event_ids, then odd),
    each run consumes only unseen files (ledger), and the materialized
    node accumulates + dedupes to the latest row per (user_id,
    event_type) ACROSS runs. The final snapshot must equal a plain
    latest-per-key query over all events — machinery (ledger, staged
    files, cross-run upsert rewrite) checked against semantics (one
    window)."""
    import os
    import tempfile

    work = tempfile.mkdtemp(prefix="dags_graph_upsert_q_")
    src = os.path.join(work, "src")
    out = os.path.join(work, "out")
    os.makedirs(src)
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )

    def build() -> Graph:
        g = Graph("incr_upsert")
        g.source(
            "ev",
            src,
            schema="event_id BIGINT, user_id BIGINT, event_type STRING, ts TIMESTAMP, value DOUBLE",
        )
        g.sql_node(
            "acc",
            "SELECT event_id, user_id, event_type, ts, value FROM ev",
            upstream=["ev"],
            materialize=True,
            unique_on=("user_id", "event_type"),
            order_by=("ts", "event_id"),
        )
        return g

    for stage, pred in (("even", "event_id % 2 = 0"), ("odd", "event_id % 2 = 1")):
        staged = os.path.join(work, stage)
        ev.filter(pred).write.parquet(staged)
        for f in os.listdir(staged):
            if f.endswith(".parquet"):
                os.link(os.path.join(staged, f), os.path.join(src, f"{stage}_{f}"))
        build().run(spark, output_dir=out, incremental=True)

    snap = spark.read.parquet(os.path.join(out, "acc"))
    return snap.select("user_id", "event_type", "event_id", "value")


@register(
    "graph_fanout_diamond",
    oracle=f"""
WITH p AS (
  SELECT user_id,
         CAST(SUM({SQL_CENTS('value')}) AS BIGINT) AS spend_cents,
         COUNT(*) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
er AS (
  SELECT user_id, COUNT(*) AS n_errors
  FROM events WHERE event_type = 'error' GROUP BY user_id
)
SELECT p.user_id, p.spend_cents, p.n_purchases, er.n_errors
FROM p JOIN er ON p.user_id = er.user_id
""",
)
def graph_fanout_diamond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diamond DAG: ONE source node fans out to two aggregation
    branches (purchase spend, error counts) that re-join at the sink —
    the multi-consumer topology the reference's block reuse exists
    for. Both branches stay lazy plans over the same scan; Catalyst
    compiles the diamond into one job and both branch aggs shuffle on
    the shared user_id key, so the final join is co-partitioned. No
    node materializes anything."""
    g = Graph("fanout_diamond")

    @g.node(name="events_src")
    def events_src(spark: SparkSession, deps) -> DataFrame:
        return table(spark, sf_dir, "events")

    g.sql_node(
        name="spend_by_user",
        upstream=["events_src"],
        sql=f"""
            SELECT user_id,
                   SUM({SQL_CENTS('value')}) AS spend_cents,
                   COUNT(*) AS n_purchases
            FROM events_src WHERE event_type = 'purchase' GROUP BY user_id
        """,
    )
    g.sql_node(
        name="errors_by_user",
        upstream=["events_src"],
        sql="""
            SELECT user_id, COUNT(*) AS n_errors
            FROM events_src WHERE event_type = 'error' GROUP BY user_id
        """,
    )

    @g.node(name="user_health", upstream=["spend_by_user", "errors_by_user"])
    def user_health(spark: SparkSession, deps) -> DataFrame:
        return deps["spend_by_user"].join(deps["errors_by_user"], "user_id")

    return g.run(spark)["user_health"]


_YAML_LATEST = """
name: latest_user_state
unique_on: [user_id, event_type]
order_by: [ts, event_id]
implements: user_state_iface
fields:
  - {name: user_id, type: bigint, nullable: false}
  - {name: event_type, type: string, nullable: false}
  - {name: ts, type: timestamp}
  - {name: event_id, type: bigint}
  - {name: value, type: double}
---
name: user_state_iface
fields:
  - {name: user_id, type: bigint}
  - {name: event_type, type: string}
  - {name: value, type: double}
"""


@register(
    "graph_yaml_node",
    oracle="""
WITH ranked AS (
  SELECT user_id, event_type, ts, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_type, ts, event_id, value
FROM ranked WHERE rn = 1
""",
)
def graph_yaml_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The YAML schema front door driven END-TO-END under the hash
    check (round 4): a declarative document (graph/schemas.py)
    declares the node's fields, NOT NULL constraints, unique_on +
    order_by recency, and an `implements` interface it must
    widen-satisfy; `SchemaDoc.node_kwargs()` feeds the Graph node,
    whose run then validates the output schema and collapses to
    latest-per-(user, type) exactly as the document says. The oracle
    recomputes the collapse with a plain window, so the whole
    YAML -> StructType -> NodeSpec -> dedupe chain must be right —
    the reference's declarative-schema identity on Spark
    primitives."""
    from ..graph.schemas import load_schemas

    doc = load_schemas(_YAML_LATEST)["latest_user_state"]
    g = Graph("yaml_front_door")

    @g.node(name="events_src")
    def events_src(spark: SparkSession, deps) -> DataFrame:
        return table(spark, sf_dir, "events").select(
            "user_id", "event_type", "ts", "event_id", "value"
        )

    g.sql_node(
        name="latest_user_state",
        upstream=["events_src"],
        sql="SELECT * FROM events_src",
        **doc.node_kwargs(),
    )
    return g.run(spark)["latest_user_state"]


@register(
    "graph_backfill_days",
    oracle=f"""
SELECT date_trunc('day', ts) AS day,
       COUNT(*) AS n_events,
       CAST(SUM({SQL_CENTS('value')}) AS BIGINT) AS value_cents,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-06'
GROUP BY day
""",
)
def graph_backfill_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-aligned BACKFILL through the graph layer: a daily
    rollup node is first backfilled for days 1-3, then a second,
    OVERLAPPING submission covers days 2-5 — the everyday
    orchestration scenario (re-running a date range after late
    upstream data). The file ledger makes the overlap idempotent:
    days 2-3 are recognized as already consumed and only days 4-5
    process in run two; unique_on=(day,) is the belt-and-braces
    guard. The accumulated materialized node must equal one plain
    GROUP BY over the whole range — machinery (per-day staging,
    two ledgered runs, overlap) checked against semantics.

    The contract this key pins is day-level alignment: a backfill
    unit is a COMPLETE day of files, so each day's aggregate is
    computed exactly once and accumulation is a disjoint union —
    the same invariant a 100 TB partitioned warehouse backfill
    relies on (process whole partitions, never split one across
    runs)."""
    import os
    import tempfile

    work = tempfile.mkdtemp(prefix="dags_graph_backfill_q_")
    src = os.path.join(work, "src")
    out = os.path.join(work, "out")
    os.makedirs(src)

    ev = (
        table(spark, sf_dir, "events")
        .filter(
            (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-06").cast("timestamp"))
        )
        .select(
            F.date_trunc("DAY", "ts").alias("day"),
            "event_id",
            "user_id",
            "value",
        )
    )
    day_dirs = []
    for i in range(1, 6):
        staged = os.path.join(work, f"day{i}")
        ev.filter(
            F.col("day") == F.lit(f"2024-01-0{i}").cast("timestamp")
        ).coalesce(1).write.parquet(staged)
        day_dirs.append((i, staged))

    def link_days(lo: int, hi: int) -> None:
        for i, staged in day_dirs:
            if not (lo <= i <= hi):
                continue
            for f in os.listdir(staged):
                if f.endswith(".parquet"):
                    dst = os.path.join(src, f"day{i}_{f}")
                    if not os.path.exists(dst):
                        os.link(os.path.join(staged, f), dst)

    def build() -> Graph:
        g = Graph("backfill")
        g.source(
            "ev",
            src,
            schema="day TIMESTAMP, event_id BIGINT, user_id BIGINT, value DOUBLE",
        )
        g.sql_node(
            "daily",
            f"""SELECT day, COUNT(*) AS n_events,
                       CAST(SUM({SQL_CENTS('value')}) AS BIGINT) AS value_cents,
                       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
                FROM ev GROUP BY day""",
            upstream=["ev"],
            materialize=True,
            unique_on=("day",),
            order_by=("n_events",),
        )
        return g

    link_days(1, 3)
    build().run(spark, output_dir=out, incremental=True)
    link_days(2, 5)  # overlapping re-submission
    build().run(spark, output_dir=out, incremental=True)

    return spark.read.parquet(os.path.join(out, "daily")).select(
        "day", "n_events", "value_cents", "n_users"
    )


@register(
    "graph_param_pipe",
    oracle=f"""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       {SQL_DEC_SUM('o_totalprice')} AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '1999-01-01'
  AND o_totalprice > 1000.0
GROUP BY o_orderpriority
""",
)
def graph_param_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARAMETERIZED SQL pipe — the reference's templated-pipe
    identity, done the Spark-native way: the node declares ``:name``
    markers and ``Graph.run(params=...)`` binds them through
    parameterized ``spark.sql(sql, args=...)``, so values are typed
    literals substituted at the analyzer (injection-safe, plan-cache
    friendly) rather than string-formatted SQL. One declared pipe
    serves any (cutoff, floor) configuration; this run binds
    cutoff='1999-01-01', floor=1000.0 and must equal the plain SQL
    with those literals inlined."""
    g = Graph("param_pipe")

    @g.node(name="orders_src")
    def _orders(spark: SparkSession, deps: dict) -> DataFrame:
        return table(spark, sf_dir, "orders")

    g.sql_node(
        "pri_rev",
        f"""SELECT o_orderpriority,
                   COUNT(*) AS n_orders,
                   {SQL_DEC_SUM('o_totalprice')} AS revenue
            FROM orders_src
            WHERE o_orderdate >= CAST(:cutoff AS TIMESTAMP)
              AND o_totalprice > :floor
            GROUP BY o_orderpriority""",
        upstream=["orders_src"],
    )
    return g.run(spark, params={"cutoff": "1999-01-01", "floor": 1000.0})[
        "pri_rev"
    ]


@register(
    "graph_quarantine_split",
    oracle="""
WITH raw AS (
  SELECT event_id, user_id, event_type, value FROM events
  WHERE event_id % 20 = 0
  UNION ALL
  SELECT * FROM (VALUES
    (9000001, 77, 'purchase', CAST(NULL AS DOUBLE)),
    (9000002, 78, 'bogus_kind', 10.0),
    (9000003, NULL, 'view', 5.0),
    (9000004, 79, 'purchase', -99999.0)
  ) AS bad(event_id, user_id, event_type, value)
),
validated AS (
  SELECT *,
         CASE
           WHEN user_id IS NULL THEN 'null_user'
           WHEN value IS NULL THEN 'null_value'
           WHEN value < -1000 OR value > 1000000 THEN 'value_range'
           WHEN event_type NOT IN ('view', 'purchase', 'error', 'click',
                                   'signup')
             THEN 'unknown_type'
         END AS reject_reason
  FROM raw
),
clean AS (
  SELECT 'clean' AS bucket_kind, event_type AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM validated WHERE reject_reason IS NULL GROUP BY event_type
),
quarantine AS (
  SELECT 'quarantine' AS bucket_kind, reject_reason AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM validated WHERE reject_reason IS NOT NULL GROUP BY reject_reason
)
SELECT * FROM clean UNION ALL SELECT * FROM quarantine
""",
    tags=("graph", "dq"),
)
def graph_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validation-QUARANTINE topology in the graph layer — the
    error-routing pattern a production ingest DAG needs (the
    row-level sibling of source_csv_permissive's file-level capture):
    one validate node stamps each record with its FIRST failing rule
    (null keys, null/range measures, enum membership), then a
    clean branch and a quarantine branch consume the same validated
    node — bad rows are never dropped silently and never kill the
    job; they land in an inspectable side table with a reason. The
    fan-out diamond keeps ONE scan: both branches are lazy over the
    validated plan (Catalyst reuses the exchange), and the final
    report unions clean per-type counts with per-reason quarantine
    counts. Deterministic bad rows are injected in-query (the
    fixture is clean by construction). At 100 TB the quarantine
    branch writes its own partitioned sink; counts here stand in for
    that write."""
    g = Graph("quarantine_split")

    @g.node(name="raw_events")
    def raw_events(spark: SparkSession, deps) -> DataFrame:
        ev = table(spark, sf_dir, "events").filter(
            F.col("event_id") % 20 == 0
        ).select("event_id", "user_id", "event_type", "value")
        bad = spark.createDataFrame(
            [
                (9000001, 77, "purchase", None),
                (9000002, 78, "bogus_kind", 10.0),
                (9000003, None, "view", 5.0),
                (9000004, 79, "purchase", -99999.0),
            ],
            "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE",
        )
        return ev.unionByName(bad)

    @g.node(name="validated", upstream=["raw_events"])
    def validated(spark: SparkSession, deps) -> DataFrame:
        from ..operators.dq import event_reject_reason

        return deps["raw_events"].withColumn(
            "reject_reason",
            event_reject_reason(value_lo=-1000.0, check_user=True),
        )

    g.sql_node(
        name="clean_counts",
        upstream=["validated"],
        sql="""
            SELECT 'clean' AS bucket_kind, event_type AS bucket,
                   COUNT(*) AS n
            FROM validated WHERE reject_reason IS NULL GROUP BY event_type
        """,
    )
    g.sql_node(
        name="quarantine_counts",
        upstream=["validated"],
        sql="""
            SELECT 'quarantine' AS bucket_kind, reject_reason AS bucket,
                   COUNT(*) AS n
            FROM validated WHERE reject_reason IS NOT NULL
            GROUP BY reject_reason
        """,
    )

    @g.node(name="report", upstream=["clean_counts", "quarantine_counts"])
    def report(spark: SparkSession, deps) -> DataFrame:
        return deps["clean_counts"].unionByName(deps["quarantine_counts"])

    return g.run(spark)["report"]


@register(
    "graph_observed_run",
    oracle="""
SELECT node, metric, value FROM (
  SELECT 'purchases' AS node, 'n_rows' AS metric,
         CAST(COUNT(*) AS BIGINT) AS value
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT 'purchases', 'sum_cents',
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT 'daily', 'n_rows', CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
  FROM events WHERE event_type = 'purchase'
)
""",
    tags=("graph", "observability"),
)
def graph_observed_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUN OBSERVABILITY lifted into the orchestration layer: each
    node declares `observe=` aggregate metrics and Graph.run computes
    them via df.observe() ON THE TASK STREAM of the node's own
    materialize action — per-node row counts and quality sums with
    ZERO extra scans (an AggregatingAccumulator rides the write job;
    obs_pipeline_metrics generalized from one query to the DAG). The
    returned table IS the run's metric ledger — (node, metric, value)
    — and hash-checking it against first-principles SQL proves the
    observed numbers equal what a full re-aggregation would compute.
    `min_rows=1` on each node also exercises the built-in quality
    gate (a failing gate aborts the run before any ledger commit);
    tests/test_graph.py covers the gate-failure and retry paths."""
    import tempfile

    from . import cents

    work = tempfile.mkdtemp(prefix="dags_graph_observed_q_")
    g = Graph("observed")

    @g.node(
        name="purchases",
        materialize=True,
        min_rows=1,
        observe=(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(cents("value")).alias("sum_cents"),
        ),
    )
    def purchases(spark: SparkSession, deps) -> DataFrame:
        return (
            table(spark, sf_dir, "events")
            .filter(F.col("event_type") == "purchase")
            .select("event_id", "ts", "user_id", "value")
        )

    @g.node(
        name="daily",
        upstream=["purchases"],
        materialize=True,
        min_rows=1,
        observe=(F.count(F.lit(1)).alias("n_rows"),),
    )
    def daily(spark: SparkSession, deps) -> DataFrame:
        return (
            deps["purchases"]
            .groupBy(F.to_date("ts").alias("day"))
            .agg(F.count(F.lit(1)).alias("n_purchases"))
        )

    g.run(spark, output_dir=work)
    rows = []
    for node in ("purchases", "daily"):
        for metric, value in sorted(g.metrics(node).items()):
            if metric == "_graph_rows":
                continue  # internal gate metric, not part of the ledger
            rows.append((node, metric, int(value)))
    return spark.createDataFrame(rows, "node STRING, metric STRING, value BIGINT")


@register(
    "graph_schema_evolution",
    oracle=f"""
WITH b1 AS (
  SELECT event_id, user_id, event_type, ts, value,
         CAST(1 AS BIGINT) AS feed_ver, CAST(NULL AS VARCHAR) AS channel
  FROM events WHERE event_id % 2 = 0
),
b2 AS (
  SELECT event_id, user_id, event_type, ts, value,
         CAST(2 AS BIGINT) AS feed_ver, 'feed-v2' AS channel
  FROM events WHERE event_id % 2 = 1
),
u AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id, event_type
    ORDER BY ts DESC, event_id DESC) AS rn
  FROM u
)
SELECT user_id, event_type, event_id,
       {SQL_CENTS('value')} AS value_cents, feed_ver,
       COALESCE(channel, '<pre-evolution>') AS channel
FROM r WHERE rn = 1
""",
)
def graph_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA EVOLUTION inside Graph.run's incremental upsert — the
    declared-schema identity meeting the incremental identity: run 1
    materializes an upsert node (unique_on user/event_type) whose
    pipe emits feed_ver INT; run 2's pipe EVOLVED — feed_ver widened
    to BIGINT and a new `channel` column added. The upsert path
    verifies the batch schema IMPLEMENTS the snapshot schema
    (graph/core.py schema_implements: add/widen ok, drop/narrow is a
    GraphError — pinned by test_graph), conforms existing rows UP
    (NULL-backfill + value-preserving casts), and keeps one row per
    key by (ts, event_id) recency across both schema generations —
    so a v1 winner legitimately survives with a '<pre-evolution>'
    channel. The oracle replays both batches through one global
    latest-per-key window (two-run upsert == global latest, because
    latest() is associative). Same one-exchange shuffle as the
    evolution-free upsert."""
    import os
    import tempfile

    work = tempfile.mkdtemp(prefix="dags_graph_evo_q_")
    src = os.path.join(work, "src")
    out = os.path.join(work, "out")
    os.makedirs(src)
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )

    def build(evolved: bool) -> Graph:
        g = Graph("schema_evo")
        g.source(
            "ev",
            src,
            schema="event_id BIGINT, user_id BIGINT, event_type STRING,"
            " ts TIMESTAMP, value DOUBLE",
        )
        sql = (
            "SELECT event_id, user_id, event_type, ts, value,"
            " CAST(2 AS BIGINT) AS feed_ver, 'feed-v2' AS channel FROM ev"
            if evolved
            else "SELECT event_id, user_id, event_type, ts, value,"
            " CAST(1 AS INT) AS feed_ver FROM ev"
        )
        g.sql_node(
            "acc",
            sql,
            upstream=["ev"],
            materialize=True,
            unique_on=("user_id", "event_type"),
            order_by=("ts", "event_id"),
        )
        return g

    for stage, pred, evolved in (
        ("even", "event_id % 2 = 0", False),
        ("odd", "event_id % 2 = 1", True),
    ):
        staged = os.path.join(work, stage)
        ev.filter(pred).write.parquet(staged)
        for f in os.listdir(staged):
            if f.endswith(".parquet"):
                os.link(os.path.join(staged, f), os.path.join(src, f"{stage}_{f}"))
        build(evolved).run(spark, output_dir=out, incremental=True)

    snap = spark.read.parquet(os.path.join(out, "acc"))
    from . import cents

    return snap.select(
        "user_id",
        "event_type",
        "event_id",
        cents("value").alias("value_cents"),
        F.col("feed_ver").cast("bigint").alias("feed_ver"),
        F.coalesce("channel", F.lit("<pre-evolution>")).alias("channel"),
    )
