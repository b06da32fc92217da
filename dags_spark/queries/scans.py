"""SURVEY §2.1 — scans / sources / sinks.

`source_jdbc` runs against Spark's bundled embedded Derby (zero
network, zero extra jars) — see its docstring for the scale shape of
a real warehouse read (partitionColumn bounds, pushdown).

Scale notes: writes here go to per-run temp dirs; at 100 TB the same
code writes partitioned parquet to object storage and partition
pruning (static + dynamic) applies on read-back — `sink_parquet
_partitioned` exercises exactly that layout.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import SQL_CENTS, SQL_DEC_SUM, cents, dec_sum, table
from ..io import register_python_datasource
from ..registry import register


def _tmpdir(tag: str) -> str:
    return tempfile.mkdtemp(prefix=f"dags_spark_{tag}_")


@register(
    "scan_parquet",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
FROM lineitem
""",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parquet scan with column projection — ReadSchema prunes to
    the 5 referenced columns (verify via explain: no other columns in
    the scan node)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"
    )


@register(
    "scan_parquet_pushdown",
    oracle="""
SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
""",
)
def scan_parquet_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range filter pushed to the parquet reader (PushedFilters:
    [GreaterThanOrEqual(l_shipdate,...), LessThan(...)]) — row groups
    outside the range are skipped via min/max stats."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")


@register("source_csv_roundtrip", oracle="SELECT * FROM region")
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write region to CSV, read it back with an explicit schema
    (schema inference between nodes is banned — SURVEY §1.2)."""
    out = os.path.join(_tmpdir("csv"), "region_csv")
    table(spark, sf_dir, "region").write.mode("overwrite").csv(out)
    return spark.read.schema("r_regionkey INT, r_name STRING").csv(out)


@register(
    "source_json_lines",
    oracle="""
SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k
FROM events
""",
)
def source_json_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON-string props column (semi-structured source)."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@register(
    "sink_parquet_partitioned",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       COUNT(*) AS n_orders,
       {SQL_DEC_SUM('o_totalprice')} AS year_value
FROM orders
WHERE year(o_orderdate) >= 1995
GROUP BY 1
""",
)
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders partitioned by year (hive layout), read back with
    a partition-column predicate, and aggregate per partition. The
    predicate PROVES directory pruning — the read-back plan carries
    `PartitionFilters: [(o_year >= 1995)]` and never opens the
    earlier years' files (asserted by the plan linter's
    unpruned-partition-scan code and tests/test_plans.py); an
    unfiltered read-back of a partitioned layout is exactly the
    100 TB accident the standard hive sink layout exists to
    prevent."""
    out = os.path.join(_tmpdir("sink"), "orders_by_year")
    o = table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    o.write.mode("overwrite").partitionBy("o_year").parquet(out)
    back = spark.read.parquet(out).filter(F.col("o_year") >= 1995)
    return back.groupBy(F.col("o_year").cast("int").alias("o_year")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum("o_totalprice").alias("year_value"),
    )


_INMEM_ROWS = [
    (1, "alpha", 1.5),
    (2, "beta", -2.25),
    (3, "gamma", 0.0),
    (4, "delta", 10.75),
]


@register(
    "source_inmemory",
    oracle="""
SELECT CAST(id AS BIGINT) AS id, name, CAST(score AS DOUBLE) AS score
FROM (VALUES (1, 'alpha', 1.5), (2, 'beta', -2.25), (3, 'gamma', 0.0), (4, 'delta', 10.75))
     AS t(id, name, score)
""",
)
def source_inmemory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-memory rows -> DataFrame (the reference's import-records edge)."""
    return spark.createDataFrame(_INMEM_ROWS, "id BIGINT, name STRING, score DOUBLE")


@register("sink_json_roundtrip", oracle="SELECT * FROM nation")
def sink_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write nation to JSON-lines, read back with an explicit schema
    (ints/strings only — float text round-trips are a separate
    concern and parquet/ORC cover binary-exact numerics)."""
    out = os.path.join(_tmpdir("json"), "nation_json")
    table(spark, sf_dir, "nation").write.mode("overwrite").json(out)
    return spark.read.schema(
        "n_nationkey INT, n_name STRING, n_regionkey INT"
    ).json(out)


@register("sink_orc_roundtrip", oracle="SELECT * FROM customer")
def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write customer to ORC and read it back — second columnar
    format; doubles round-trip binary-exact."""
    out = os.path.join(_tmpdir("orc"), "customer_orc")
    table(spark, sf_dir, "customer").write.mode("overwrite").orc(out)
    return spark.read.orc(out)


@register("sink_text_roundtrip", oracle="SELECT n_name AS value FROM nation")
def sink_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write one column as raw text lines and read it back with the
    text source (the log-file / one-doc-per-line ingestion format)."""
    out = os.path.join(_tmpdir("text"), "nation_txt")
    table(spark, sf_dir, "nation").select("n_name").write.mode("overwrite").text(out)
    return spark.read.text(out)


@register(
    "source_binaryfile",
    oracle="""
SELECT CAST(length(string_agg(n_name, chr(10) ORDER BY n_nationkey)) + 1 AS BIGINT)
         AS n_bytes,
       md5(string_agg(n_name, chr(10) ORDER BY n_nationkey) || chr(10))
         AS content_md5
FROM nation
""",
)
def source_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-file binary ingestion via the binaryFile source — the
    entry point for multimodal (image/audio/video) corpora: each file
    arrives as one row of (path, length, content BINARY) feeding the
    decode_features plumbing (operators/multimodal.py).

    Exercised deterministically: write nation names as ONE ordered
    text file, read it back as a binary blob, emit (byte length, md5)
    — both reproducible from SQL on the source table, so the key stays
    hash-checked without the oracle touching the filesystem."""
    out = os.path.join(_tmpdir("binfile"), "nation_blob")
    (
        table(spark, sf_dir, "nation")
        .orderBy("n_nationkey")
        .select("n_name")
        .coalesce(1)
        .write.mode("overwrite")
        .text(out)
    )
    bf = spark.read.format("binaryFile").option("pathGlobFilter", "part-*").load(out)
    return bf.select(
        F.col("length").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    )


@register(
    "sink_sized_files",
    oracle=f"""
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT l_orderkey) AS n_orderkeys,
       {SQL_DEC_SUM('l_extendedprice')} AS sum_price
FROM lineitem
""",
)
def sink_sized_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-size-governed sink: range-repartition lineitem on its key
    into a fixed file count before writing (plus maxRecordsPerFile as
    the hard cap), then read back and verify content. This is the
    small-files/large-files control every 100 TB sink needs — without
    it, a 32k-task job writes 32k files per partition and the next
    scan pays per-file open cost; range partitioning (vs round-robin
    coalesce) additionally clusters the sort key so min/max row-group
    stats stay selective."""
    out = os.path.join(_tmpdir("sink"), "lineitem_sized")
    li = table(spark, sf_dir, "lineitem")
    (
        li.repartitionByRange(4, "l_orderkey", "l_linenumber")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 500_000)
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orderkeys"),
        dec_sum("l_extendedprice").alias("sum_price"),
    )


@register(
    "obs_pipeline_metrics",
    oracle=f"""
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
       {SQL_DEC_SUM('o_totalprice')} AS sum_price
FROM orders
""",
)
def obs_pipeline_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via df.observe(): named metrics
    accumulate ON the task stream during a normal action — zero extra
    scans, unlike a separate COUNT query. The observed values are
    surfaced as a 1-row DataFrame so the driver can hash-check them
    against the oracle computing the same aggregates the slow way.
    At 100 TB this is how row-count/quality gates ride along with the
    real write instead of doubling the IO bill."""
    from pyspark.sql import Observation

    o = table(spark, sf_dir, "orders")
    obs = Observation("metrics")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).alias("n_urgent"),
        dec_sum("o_totalprice").alias("sum_price"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["n_urgent"], float(m["sum_price"]))],
        "n_rows BIGINT, n_urgent BIGINT, sum_price DOUBLE",
    )


_CSV_MESSY = (
    "id,name,score\n"
    "1,alpha,1.5\n"
    "2,beta,notanumber\n"      # score fails DoubleType -> corrupt
    "3,gamma\n"                # missing column -> corrupt
    "4,delta,10.75\n"
    "5,\"epsi,lon\",0.25\n"    # quoted delimiter -> valid
)


@register(
    "source_csv_permissive",
    oracle="""
SELECT CAST(id AS BIGINT) AS id, name, CAST(score AS DOUBLE) AS score,
       is_corrupt
FROM (VALUES
  (1, 'alpha',     1.5,  false),
  (2, 'beta',      NULL, true),
  (3, 'gamma',     NULL, true),
  (4, 'delta',     10.75, false),
  (5, 'epsi,lon',  0.25, false)
) AS t(id, name, score, is_corrupt)
""",
)
def source_csv_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant CSV ingestion (PERMISSIVE mode + corrupt-record
    capture): malformed rows survive the scan as nulls with the raw
    line preserved in _corrupt_record instead of failing the job —
    the contract a 100 TB ingest needs, where a handful of bad lines
    must quarantine, not kill, the pipeline. The messy fixture is
    written in-query (type error, missing column, quoted delimiter);
    the output flags corrupt rows as a scalar boolean so the result
    stays driver-hashable. DROPMALFORMED/FAILFAST are the same
    reader's stricter modes."""
    out = os.path.join(_tmpdir("csvperm"), "messy.csv")
    with open(out, "w") as fh:
        fh.write(_CSV_MESSY)
    df = (
        spark.read.schema(
            "id BIGINT, name STRING, score DOUBLE, _corrupt_record STRING"
        )
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(out)
    )
    return df.select(
        "id",
        "name",
        "score",
        F.col("_corrupt_record").isNotNull().alias("is_corrupt"),
    )


@register(
    "source_python_datasource",
    oracle="""
SELECT CAST(n AS BIGINT) AS n, CAST(n * n AS BIGINT) AS n_sq,
       CAST(n % 7 AS BIGINT) AS bucket
FROM (SELECT unnest(generate_series(0, 199)) AS n)
""",
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom PYTHON data source (Spark 4 DataSource API): a
    deterministic generator source registered with
    ``spark.dataSource.register`` and read via ``spark.read.format``,
    partitioned 4 ways so the rows are produced IN PARALLEL on
    executors — the extension point for bespoke feeds (internal APIs,
    tape formats) when no JVM connector exists. Each partition emits
    its own disjoint range, so the output is engine-deterministic
    regardless of partition scheduling."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _RangePartition(InputPartition):
        def __init__(self, start: int, end: int) -> None:
            self.start, self.end = start, end

    class _GenReader(DataSourceReader):
        def __init__(self, n_rows: int, n_parts: int) -> None:
            self._n, self._p = n_rows, n_parts

        def partitions(self):
            step = self._n // self._p
            return [
                _RangePartition(i * step, self._n if i == self._p - 1 else (i + 1) * step)
                for i in range(self._p)
            ]

        def read(self, partition):
            for n in range(partition.start, partition.end):
                yield (n, n * n, n % 7)

    class GenSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "dags_gen"

        def schema(self) -> str:
            return "n BIGINT, n_sq BIGINT, bucket BIGINT"

        def reader(self, schema):
            return _GenReader(
                int(self.options.get("rows", 200)),
                int(self.options.get("partitions", 4)),
            )

    register_python_datasource(spark, GenSource)
    return spark.read.format("dags_gen").option("rows", 200).load()


_DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@register(
    "source_jdbc",
    oracle="""
SELECT r_regionkey, r_name, n_nations
FROM (
  SELECT r.r_regionkey, r.r_name,
         CAST(COUNT(n.n_nationkey) AS INTEGER) AS n_nations
  FROM region r LEFT JOIN nation n ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_regionkey, r.r_name
)
""",
)
def source_jdbc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC source/sink round-trip against Spark's bundled embedded
    Derby (no network, no extra jars — derby*.jar ship in
    /opt/spark/jars). region and nation are written with
    ``df.write.jdbc`` then read back with ``spark.read.jdbc`` using
    ``partitionColumn/lowerBound/upperBound/numPartitions``, so the
    read is issued as one range-bounded SQL query PER PARTITION — the
    exact mechanism that parallelizes a warehouse extract across
    executors at scale (against Postgres/MySQL only the url/driver
    change). The join + aggregate runs in Spark after the parallel
    read; Catalyst pushes column pruning into the generated JDBC SQL.

    Derby is single-process, so at 100 TB the same code points at a
    real server and numPartitions controls extract parallelism;
    embedded mode here keeps the key hermetic and hash-checkable."""
    home = _tmpdir("derby_home")
    spark.sparkContext._jvm.java.lang.System.setProperty(
        "derby.system.home", home
    )  # keep derby.log out of the repo cwd
    db = os.path.join(_tmpdir("derby_db"), "db")
    url = f"jdbc:derby:{db};create=true"

    def _write(name: str) -> None:
        (
            table(spark, sf_dir, name)
            .write.format("jdbc")
            .option("url", url)
            .option("dbtable", name)
            .option("driver", _DERBY_DRIVER)
            .mode("overwrite")
            .save()
        )

    def _read(name: str, part_col: str, ub: int) -> DataFrame:
        return (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", name)
            .option("driver", _DERBY_DRIVER)
            .option("partitionColumn", part_col)
            .option("lowerBound", "0")
            .option("upperBound", str(ub))
            .option("numPartitions", "2")
            .load()
        )

    _write("region")
    _write("nation")
    r = _read("region", "r_regionkey", 5)
    n = _read("nation", "n_nationkey", 25)
    return (
        r.join(n, n["n_regionkey"] == r["r_regionkey"], "left")
        .groupBy("r_regionkey", "r_name")
        .agg(F.count("n_nationkey").cast("int").alias("n_nations"))
    )


@register(
    "scan_file_metadata",
    oracle="""
SELECT 'documents.parquet' AS file_name, COUNT(*) AS n_rows,
       CAST(MIN(doc_id) AS BIGINT) AS min_id, CAST(MAX(doc_id) AS BIGINT) AS max_id
FROM documents
""",
)
def scan_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden file-metadata columns on the parquet scan
    (`_metadata.file_name`, Spark 3.4+) — the zero-cost lineage hook:
    per-file row counts and key ranges without any path bookkeeping
    in user code. At 100 TB this is how a pipeline attributes bad
    rows back to their source object without a filename ETL column.
    The fixture is one file per table, so the oracle pins the
    basename literally."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.col("_metadata.file_name").alias("file_name"))
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("doc_id").cast("long").alias("min_id"),
            F.max("doc_id").cast("long").alias("max_id"),
        )
    )


@register(
    "source_xml",
    oracle="""
SELECT n_nationkey AS nk, n_name AS nname, n_regionkey AS rk
FROM nation
""",
)
def source_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion via from_xml (round 4): each nation row is
    serialized to an XML fragment in-query, then parsed back through
    Spark's native XML reader expression with an explicit schema (the
    third semi-structured format after JSON and variant). The oracle
    reads the source table directly, so any parse/serialize asymmetry
    (escaping, type coercion) hash-fails. At scale this is
    `spark.read.format('xml')` over document dumps; the expression
    form shown here is what a mixed pipeline uses for an XML column
    inside an existing table."""
    n = table(spark, sf_dir, "nation")
    xml = F.concat(
        F.lit("<nation><nk>"), F.col("n_nationkey").cast("string"),
        F.lit("</nk><nname>"), F.col("n_name"),
        F.lit("</nname><rk>"), F.col("n_regionkey").cast("string"),
        F.lit("</rk></nation>"),
    )
    parsed = n.select(
        F.from_xml(xml, "nk INT, nname STRING, rk INT").alias("v")
    )
    return parsed.select("v.nk", "v.nname", "v.rk")


@register(
    "source_python_datasource_stream",
    oracle="""
SELECT r AS n, r * r AS n_sq FROM range(0, 200) t(r)
""",
)
def source_python_datasource_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING custom Python data source (Spark 4
    SimpleDataSourceStreamReader): a resumable-cursor feed — each
    micro-batch pulls the next 50-row chunk and commits its offset to
    the checkpoint, and a NEW query instance on the same checkpoint
    resumes from the committed cursor, never re-emitting rows. The
    extension point for paginated internal APIs / queues when no JVM
    connector exists.

    The Python micro-batch stream does not support AvailableNow
    (Spark falls back to single-batch execution), so the drive loop
    restarts the query until the cursor stops advancing — four runs
    of 50 here, each a genuine cold restart; exactly-once lands in
    the parquet sink via the batch-id-partitioned foreachBatch
    writer. readBetweenOffsets serves replay of an uncommitted
    batch after a crash."""
    import tempfile

    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    from ..streaming.runner import run_foreach_batch_parquet

    class _CursorReader(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"pos": 0}

        def read(self, start):
            pos = start["pos"]
            if pos >= 200:
                return iter([]), {"pos": pos}
            end = min(pos + 50, 200)
            return iter([(n, n * n) for n in range(pos, end)]), {"pos": end}

        def readBetweenOffsets(self, start, end):
            return iter(
                [(n, n * n) for n in range(start["pos"], end["pos"])]
            )

    class GenStreamSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "dags_gen_stream"

        def schema(self) -> str:
            return "n BIGINT, n_sq BIGINT"

        def simpleStreamReader(self, schema):
            return _CursorReader()

    register_python_datasource(spark, GenStreamSource)

    work = tempfile.mkdtemp(prefix="dags_spark_pyds_stream_")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    for _ in range(6):  # cursor cap 200 -> 4 advancing runs, 2 no-ops
        sdf = spark.readStream.format("dags_gen_stream").load()
        run_foreach_batch_parquet(sdf, out_dir, ckpt=ckpt)
        got = spark.read.parquet(out_dir)
        if got.count() >= 200:
            break
    return spark.read.parquet(out_dir).select("n", "n_sq")


@register(
    "source_python_bus_partitioned",
    oracle="""
SELECT CAST(p AS INTEGER) AS bus_partition,
       o AS bus_offset,
       'k' || CAST((o * 7 + p) % 10 AS VARCHAR) AS msg_key,
       p * 1000 + o AS payload
FROM range(0, 4) t1(p), range(0, 120) t2(o)
""",
    tags=("source", "streaming"),
)
def source_python_bus_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-SHAPED partitioned message bus as a custom Python
    STREAMING source — the resumable-bus contract this sandbox cannot
    install a Kafka connector jar for (probe re-recorded round 9: no
    spark-sql-kafka jar, no network), expressed against the same
    public DataSourceStreamReader API a real connector binds:

    - 4 TOPIC-PARTITIONS, each a totally-ordered offset log; the
      planner emits ONE InputPartition per advancing topic-partition
      per micro-batch (the Kafka task-assignment contract), so
      partition reads run as parallel tasks, per-partition order is
      preserved, and cross-partition order is (correctly) undefined —
      a restart re-plans the assignment, which is the rebalance.
    - PER-PARTITION OFFSETS: start/end are dicts keyed by partition
      id, checkpoint-committed; a NEW query on the same checkpoint
      resumes EVERY partition from its own cursor (never re-emits)
      even though partitions advance at different rates (40/30/60/20
      msgs per broker epoch, capped at 120).
    - BROKER GROWTH BETWEEN RESTARTS: the drive loop bumps an epoch
      file before each run — standing in for the external producers —
      and latestOffset() polls it exactly as a Kafka reader polls
      broker end offsets; the slowest partition needs 6 restarts to
      drain, so resumption is exercised per-partition, not just
      globally.
    - COMMIT HOOK: commit(end) persists a consumer-group-style
      offsets file. The engine calls it when the NEXT batch is
      planned, so — exactly like Kafka auto-commit — the hook's
      cursor trails the processed position by at most one batch; the
      key asserts the full per-partition map fired and trails by
      less than one epoch's rate, while the CHECKPOINT (the real
      exactly-once cursor) is proven by the sink holding exactly one
      copy of every message across all the restarts.

    Exactly-once lands in the parquet sink via the batch-id-
    partitioned foreachBatch writer (same recipe as
    source_python_datasource_stream)."""
    import json

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    from ..streaming.runner import run_foreach_batch_parquet

    n_parts, cap = 4, 120
    rates = {0: 40, 1: 30, 2: 60, 3: 20}

    class _BusPartition(InputPartition):
        def __init__(self, pid: int, start: int, end: int):
            self.pid, self.start, self.end = pid, start, end

    class _BusReader(DataSourceStreamReader):
        def __init__(self, options):
            self._epoch_path = options["epoch_path"]
            self._commit_path = options["commit_path"]

        def initialOffset(self):
            return {str(p): 0 for p in range(n_parts)}

        def latestOffset(self):
            with open(self._epoch_path) as fh:
                epoch = int(fh.read().strip())
            return {str(p): min(epoch * rates[p], cap) for p in range(n_parts)}

        def partitions(self, start, end):
            parts = [
                _BusPartition(p, start[str(p)], end[str(p)])
                for p in range(n_parts)
                if end[str(p)] > start[str(p)]
            ]
            # a no-advance batch still needs one (empty) split
            return parts or [_BusPartition(0, 0, 0)]

        def read(self, partition):
            p = partition.pid
            for o in range(partition.start, partition.end):
                yield (p, o, f"k{(o * 7 + p) % 10}", p * 1000 + o)

        def commit(self, end):
            with open(self._commit_path, "w") as fh:
                json.dump(end, fh)

    class BusSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "dags_bus"

        def schema(self) -> str:
            return (
                "bus_partition INT, bus_offset BIGINT, "
                "msg_key STRING, payload BIGINT"
            )

        def streamReader(self, schema):
            return _BusReader(self.options)

    register_python_datasource(spark, BusSource)

    work = tempfile.mkdtemp(prefix="dags_spark_bus_")
    epoch_path = os.path.join(work, "broker_epoch.txt")
    commit_path = os.path.join(work, "consumer_offsets.json")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    for epoch in range(1, 8):  # slowest partition drains at epoch 6
        with open(epoch_path, "w") as fh:
            fh.write(str(epoch))
        sdf = (
            spark.readStream.format("dags_bus")
            .option("epoch_path", epoch_path)
            .option("commit_path", commit_path)
            .load()
        )
        run_foreach_batch_parquet(sdf, out_dir, ckpt=ckpt)
        if spark.read.parquet(out_dir).count() >= n_parts * cap:
            break
    with open(commit_path) as fh:
        committed = json.load(fh)
    lagging = {
        p: committed.get(str(p))
        for p in range(n_parts)
        if committed.get(str(p), -1) < cap - rates[p]
    }
    if lagging:
        raise AssertionError(
            f"bus commit hook trails by more than one batch: {lagging} "
            f"(full map: {committed})"
        )
    sink = spark.read.parquet(out_dir)
    n_rows = sink.count()
    n_distinct = sink.select("bus_partition", "bus_offset").distinct().count()
    if not (n_rows == n_distinct == n_parts * cap):
        raise AssertionError(
            f"exactly-once violated across restarts: {n_rows} rows, "
            f"{n_distinct} distinct of {n_parts * cap} expected"
        )
    return spark.read.parquet(out_dir).select(
        "bus_partition", "bus_offset", "msg_key", "payload"
    )


@register(
    "sink_python_datasource",
    oracle="""
SELECT s_suppkey, s_name FROM supplier
""",
)
def sink_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom PYTHON batch SINK (Spark 4 DataSourceWriter): each task
    streams its partition's rows through Python into a uniquely-named
    staging file and returns a commit message listing what it wrote;
    the driver-side commit() publishes a manifest naming exactly the
    committed files — the two-phase protocol that makes bespoke sinks
    (internal APIs, tape formats) exactly-once under task retries
    (an aborted attempt's file is never manifested). Read-back goes
    through the manifest only, so orphaned staging files from failed
    attempts are invisible.

    The write path is the supplier table round-tripped through the
    sink as tab-separated lines; the returned DataFrame re-parses the
    manifested files and must equal the source relation."""
    import glob as _glob
    import json as _json
    import tempfile
    import uuid as _uuid

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    out_root = tempfile.mkdtemp(prefix="dags_spark_pysink_")

    class _Msg(WriterCommitMessage):
        def __init__(self, path: str, n: int) -> None:
            self.path, self.n = path, n

    class _TsvWriter(DataSourceWriter):
        def __init__(self, options) -> None:
            self._dir = options["path"]

        def write(self, iterator):
            path = os.path.join(self._dir, f"part-{_uuid.uuid4().hex}.tsv")
            n = 0
            with open(path, "w") as fh:
                for row in iterator:
                    fh.write(f"{row['s_suppkey']}\t{row['s_name']}\n")
                    n += 1
            return _Msg(path, n)

        def commit(self, messages):
            manifest = [
                {"path": m.path, "rows": m.n} for m in messages if m is not None
            ]
            with open(os.path.join(self._dir, "_manifest.json"), "w") as fh:
                _json.dump(manifest, fh)

        def abort(self, messages):
            for m in messages:
                if m is not None and os.path.exists(m.path):
                    os.remove(m.path)

    class TsvSink(DataSource):
        @classmethod
        def name(cls) -> str:
            return "dags_tsv_sink"

        def writer(self, schema, overwrite):
            return _TsvWriter(self.options)

    register_python_datasource(spark, TsvSink)

    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    supp.write.format("dags_tsv_sink").option("path", out_root).mode(
        "append"
    ).save()

    with open(os.path.join(out_root, "_manifest.json")) as fh:
        manifest = _json.load(fh)
    files = [m["path"] for m in manifest]
    assert files, "python sink committed no files"
    parsed = (
        spark.read.text(files)
        .select(F.split("value", "\t").alias("p"))
        .select(
            F.col("p")[0].cast("bigint").alias("s_suppkey"),
            F.col("p")[1].alias("s_name"),
        )
    )
    return parsed


@register(
    "source_python_pushdown",
    oracle="""
SELECT CAST(n AS BIGINT) AS n, CAST(n * n AS BIGINT) AS n_sq,
       CAST(n % 7 AS BIGINT) AS bucket,
       CAST(50 + ((n - 50) // 25) * 25 AS BIGINT) AS part_lo
FROM (SELECT unnest(generate_series(0, 199)) AS n)
WHERE n >= 50 AND n < 150 AND n % 7 <> 3
""",
)
def source_python_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER PUSHDOWN through a custom Python data source (Spark 4
    ``pushFilters`` API): the reader receives Catalyst's filters at
    planning time, absorbs the n-range predicates (>= 50, < 150) by
    CLIPPING its partition grid to the requested range, and hands the
    non-range predicate (bucket <> 3) back as unsupported so Spark
    evaluates it above. The pushdown is PROVEN by the hash, not just
    the plan: each row carries its generator partition's start
    offset (part_lo), and the oracle's closed form (50 + ((n-50) div
    25)*25) is only reproduced when the grid really was re-derived
    from the pushed bounds — an unpushed read would emit the 0-based
    grid and hash-fail. This is the scan-reduction contract that
    makes bespoke feeds viable at 100 TB: the source transfers only
    the requested key range, exactly like parquet row-group pruning.
    Requires spark.sql.python.filterPushdown.enabled (a session
    default in session.tune())."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        GreaterThanOrEqual,
        InputPartition,
        LessThan,
    )

    class _ClippedPartition(InputPartition):
        def __init__(self, start: int, end: int) -> None:
            self.start, self.end = start, end

    class _PushdownReader(DataSourceReader):
        def __init__(self, n_rows: int, n_parts: int) -> None:
            self._lo, self._hi, self._p = 0, n_rows, n_parts

        def pushFilters(self, filters):
            for f in filters:
                if (
                    isinstance(f, GreaterThanOrEqual)
                    and tuple(f.attribute) == ("n",)
                ):
                    self._lo = max(self._lo, int(f.value))
                elif isinstance(f, LessThan) and tuple(f.attribute) == ("n",):
                    self._hi = min(self._hi, int(f.value))
                else:
                    yield f  # unsupported -> Spark evaluates it above

        def partitions(self):
            lo, hi = self._lo, max(self._hi, self._lo)
            step = max((hi - lo) // self._p, 1)
            parts = []
            for i in range(self._p):
                s = lo + i * step
                e = hi if i == self._p - 1 else min(lo + (i + 1) * step, hi)
                if s < hi:
                    parts.append(_ClippedPartition(s, e))
            return parts or [_ClippedPartition(lo, lo)]

        def read(self, partition):
            for n in range(partition.start, partition.end):
                yield (n, n * n, n % 7, partition.start)

    class PushdownSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "dags_gen_pd"

        def schema(self) -> str:
            return "n BIGINT, n_sq BIGINT, bucket BIGINT, part_lo BIGINT"

        def reader(self, schema):
            return _PushdownReader(
                int(self.options.get("rows", 200)),
                int(self.options.get("partitions", 4)),
            )

    # spark.sql.python.filterPushdown.enabled is a session default
    # set by tune() — configured there, not here, so other keys'
    # plans never depend on whether this key ran first.
    register_python_datasource(spark, PushdownSource)
    return (
        spark.read.format("dags_gen_pd")
        .option("rows", 200)
        .load()
        .filter(
            (F.col("n") >= 50) & (F.col("n") < 150) & (F.col("bucket") != 3)
        )
    )


@register(
    "sink_atomic_swap",
    oracle=f"""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       {{SQL_DEC_SUM}} AS total_value
FROM orders
WHERE o_orderstatus <> 'F'
GROUP BY o_orderpriority
""".format(SQL_DEC_SUM=SQL_DEC_SUM("o_totalprice")),
)
def sink_atomic_swap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atomic snapshot PUBLISH without a table format: writers stage
    each snapshot under an immutable versioned directory (v1, v2, …)
    and flip a tiny CURRENT pointer file as the last step — readers
    resolve the pointer, then read a directory that is never mutated
    in place, so they see the old version or the new one, never a
    half-written mix (the pointer write is one small atomic rename;
    this is the poor-man's Iceberg/Delta commit, and exactly how the
    graph layer's ledgered snapshots publish). The key stages v1
    (all orders) then v2 (non-finalized orders only), swaps the
    pointer, and returns the read-through-pointer aggregate — which
    must equal the v2 content, proving the swap took effect and the
    v1 data stayed isolated."""
    root = _tmpdir("swap")
    o = table(spark, sf_dir, "orders")
    v1 = os.path.join(root, "v1")
    v2 = os.path.join(root, "v2")
    o.write.mode("overwrite").parquet(v1)
    _publish_pointer(root, "v1")
    o.filter(F.col("o_orderstatus") != "F").write.mode("overwrite").parquet(v2)
    _publish_pointer(root, "v2")  # atomic flip: rename over CURRENT
    with open(os.path.join(root, "CURRENT")) as fh:
        current = os.path.join(root, fh.read().strip())
    return (
        spark.read.parquet(current)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum("o_totalprice").alias("total_value"),
        )
    )


def _publish_pointer(root: str, version: str) -> None:
    """Write CURRENT via temp-file + os.replace (atomic on POSIX)."""
    tmp = os.path.join(root, f".CURRENT.{version}.tmp")
    with open(tmp, "w") as fh:
        fh.write(version)
    os.replace(tmp, os.path.join(root, "CURRENT"))


@register(
    "source_csv_inferschema",
    oracle="""
SELECT r_regionkey, r_name,
       'r_regionkey:int,r_name:string,has_i:boolean,weight:double'
         AS inferred_schema
FROM region
""",
)
def source_csv_inferschema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema INFERENCE at the ingestion edge — the one place the
    engine's schema-from-data mode is allowed (§1.2 contract:
    declared schemas everywhere else). Region plus two derived typed
    columns round-trips through headered CSV with inferSchema=true;
    the emitted `inferred_schema` string is built from the actual
    read-back StructType, so the hash pins WHAT the sampler inferred
    (small ints -> INT, 'true'/'false' -> BOOLEAN, decimals ->
    DOUBLE),
    not just the values. Inference costs one extra pass over the
    files — acceptable at an ingestion edge, never between nodes
    (FIXTURES.md documents the declared-DDL path for that)."""
    out = os.path.join(_tmpdir("infer"), "region_csv")
    r = table(spark, sf_dir, "region").select(
        "r_regionkey",
        "r_name",
        (F.col("r_regionkey") % 2 == 0).alias("has_i"),
        (F.col("r_regionkey") * 1.5).alias("weight"),
    )
    r.write.mode("overwrite").option("header", True).csv(out)
    back = (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .csv(out)
    )
    schema_str = ",".join(
        f"{f.name}:{f.dataType.simpleString()}" for f in back.schema.fields
    )
    return back.select(
        F.col("r_regionkey").cast("bigint").alias("r_regionkey"),
        "r_name",
        F.lit(schema_str).alias("inferred_schema"),
    )


@register(
    "source_parquet_mergeschema",
    oracle="""
SELECT n_nationkey, n_name,
       CAST(NULL AS VARCHAR) AS region_name, 1 AS batch
FROM nation WHERE n_nationkey < 10
UNION ALL
SELECT n.n_nationkey, n.n_name, r.r_name AS region_name, 2 AS batch
FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE n.n_nationkey >= 10
""",
)
def source_parquet_mergeschema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet SCHEMA EVOLUTION on read (`mergeSchema=true`): an old
    batch written without a column and a new batch written with it
    land in one directory; the merged read surfaces the union schema
    with NULLs where the old files have no column — the
    append-only-ingest reality (producers add fields mid-stream) that
    a fixed-schema read would either drop or crash on. mergeSchema
    costs a footer read per file at planning (why it is off by
    default); at 100 TB you pay it once per new-schema rollout or
    pin the superset schema explicitly — both paths surface the same
    rows, which is what this key checks. The batch column proves
    which file each row came from (partition-style evolution
    evidence)."""
    out = os.path.join(_tmpdir("evolve"), "nations")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    old = n.filter(F.col("n_nationkey") < 10).select(
        "n_nationkey", "n_name", F.lit(1).alias("batch")
    )
    new = (
        n.filter(F.col("n_nationkey") >= 10)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select(
            "n_nationkey",
            "n_name",
            F.col("r_name").alias("region_name"),
            F.lit(2).alias("batch"),
        )
    )
    old.write.mode("overwrite").parquet(os.path.join(out, "b1"))
    new.write.mode("overwrite").parquet(os.path.join(out, "b2"))
    merged = spark.read.option("mergeSchema", True).parquet(
        os.path.join(out, "b1"), os.path.join(out, "b2")
    )
    return merged.select("n_nationkey", "n_name", "region_name", "batch")


@register(
    "sink_parquet_codecs",
    oracle="""
SELECT codec,
       CAST((SELECT COUNT(*) FROM supplier) AS BIGINT) AS n_rows,
       (SELECT md5(string_agg(s_name, '|' ORDER BY s_suppkey))
        FROM supplier) AS content_md5,
       TRUE AS extension_matches
FROM (VALUES ('gzip'), ('snappy'), ('zstd')) AS t(codec)
""",
)
def sink_parquet_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet COMPRESSION CODECS round-trip (snappy / gzip / zstd):
    the same table written under each codec must read back
    value-identical (codec is a storage knob, never a semantic one —
    this key pins that), and the data files must actually carry the
    codec (extension check: .gz.parquet / .snappy.parquet /
    .zstd.parquet), so a silently-ignored compression option fails
    loudly rather than shipping 3x the bytes. At 100 TB the choice
    is the classic CPU-vs-IO trade (zstd ~ gzip-ratio at
    snappy-ish speed and is the modern default for cold data;
    snappy for hot paths) — the content hash proves switching is
    free, semantically. One row per codec: rows, ordered content
    md5, extension flag."""
    import glob as _glob

    sup = table(spark, sf_dir, "supplier")
    root = _tmpdir("codec")
    out_rows = []
    for codec in ["gzip", "snappy", "zstd"]:
        out = os.path.join(root, codec)
        sup.write.mode("overwrite").option("compression", codec).parquet(out)
        back = spark.read.parquet(out)
        ext = {"gzip": ".gz.parquet", "snappy": ".snappy.parquet", "zstd": ".zstd.parquet"}[codec]
        files = [
            f
            for f in _glob.glob(os.path.join(out, "part-*"))
            if not f.endswith(".crc")
        ]
        ext_ok = bool(files) and all(f.endswith(ext) for f in files)
        # content md5 from THIS codec's read-back. Order is pinned IN
        # THE PLAN (collect structs, sort_array on the key, join the
        # names) — the house order-stable fold; relying on
        # sortWithinPartitions surviving below an agg is not a
        # documented Spark contract.
        m = (
            back.agg(
                F.md5(
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(
                                    F.struct("s_suppkey", "s_name")
                                )
                            ),
                            lambda e: e.s_name,
                        ),
                        "|",
                    )
                ).alias("m"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()[0]
        )
        out_rows.append((codec, m["n"], m["m"], ext_ok))
    return spark.createDataFrame(
        out_rows,
        "codec STRING, n_rows BIGINT, content_md5 STRING, extension_matches BOOLEAN",
    )


@register(
    "source_manifest_snapshot",
    oracle=f"""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {SQL_DEC_SUM('o_totalprice')} AS total_value
FROM orders WHERE o_orderkey % 10 <> 0
GROUP BY o_orderstatus
""",
)
def source_manifest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANIFEST-PINNED snapshot read — the poor-man's table-format
    time travel (the mechanism under Iceberg/Delta snapshots): a
    writer lands snapshot v1, records its exact file list in a
    manifest, then appends more files to the SAME directory; a
    reader that loads the manifest's files sees v1 exactly, immune
    to concurrent appends. The key proves isolation end-to-end: the
    directory contains BOTH generations when the read runs, and the
    aggregate still equals v1 alone (oracle: the v1 predicate).
    Listing comes from one manifest read (no directory race), and
    at 100 TB this is why readers scale: a snapshot is a constant
    metadata file, not an eventually-consistent listing."""
    import json as _json

    work = _tmpdir("manifest_snap")
    out = os.path.join(work, "orders_tbl")
    o = table(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 10 != 0)
    v1.repartition(4).write.mode("overwrite").parquet(out)
    v1_files = sorted(
        os.path.join(out, f)
        for f in os.listdir(out)
        if f.endswith(".parquet")
    )
    manifest = os.path.join(work, "manifest.json")
    with open(manifest, "w") as fh:
        _json.dump({"snapshot": 1, "files": v1_files}, fh)
    # concurrent append lands AFTER the manifest was committed
    o.filter(F.col("o_orderkey") % 10 == 0).write.mode("append").parquet(out)

    with open(manifest) as fh:
        pinned = _json.load(fh)["files"]
    back = spark.read.parquet(*pinned)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum("o_totalprice").alias("total_value"),
    )


@register(
    "table_format_time_travel",
    oracle=f"""
WITH v1 AS (
  SELECT * FROM orders WHERE o_orderkey % 3 = 0
),
v2_add AS (
  SELECT * FROM orders WHERE o_orderkey % 3 = 1
),
v3 AS (
  SELECT * FROM orders WHERE o_orderkey % 3 = 2
)
SELECT 1 AS version, 'overwrite' AS mode,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       {SQL_DEC_SUM('o_totalprice')} AS total_value
FROM v1
UNION ALL
SELECT 2, 'append', CAST(COUNT(*) AS BIGINT), {SQL_DEC_SUM('o_totalprice')}
FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2_add)
UNION ALL
SELECT 3, 'overwrite', CAST(COUNT(*) AS BIGINT), {SQL_DEC_SUM('o_totalprice')}
FROM v3
""",
)
def table_format_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL over the log-structured table format
    (dags_spark/tablelog.py — the transactional lakehouse skeleton
    on parquet + atomic renames): three commits land (overwrite,
    append, overwrite), then every HISTORICAL version is read back
    through its committed file list and aggregated — v1 must still
    show exactly the pre-append rows AFTER two further commits, and
    v2 must show the union, because committed data files are
    immutable and a snapshot is a metadata file, not a directory
    listing. The oracle recomputes each version's aggregate from the
    defining predicates. Commit atomicity + optimistic concurrency
    (two writers racing one version — one CommitConflict) are pinned
    by tests/test_tablelog.py; this key pins the read contract."""
    from ..tablelog import tmp_table

    o = table(spark, sf_dir, "orders")
    t = tmp_table()
    t.write(o.filter(F.col("o_orderkey") % 3 == 0), mode="overwrite")
    t.write(o.filter(F.col("o_orderkey") % 3 == 1), mode="append")
    t.write(o.filter(F.col("o_orderkey") % 3 == 2), mode="overwrite")

    outs = []
    for v, mode in ((1, "overwrite"), (2, "append"), (3, "overwrite")):
        df = t.read(spark, version=v)
        outs.append(
            df.agg(
                F.lit(v).alias("version"),
                F.lit(mode).alias("mode"),
                F.count(F.lit(1)).alias("n_rows"),
                dec_sum("o_totalprice").alias("total_value"),
            )
        )
    out = outs[0]
    for x in outs[1:]:
        out = out.unionByName(x)
    return out


@register(
    "table_format_delta_export",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders
WHERE o_orderkey % 3 < 2
""",
    tags=("sink", "table"),
)
def table_format_delta_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTERNAL lakehouse interop (VERDICT r7 directive #6): the
    tablelog table is exported as a Delta-Lake-protocol ``_delta_log``
    (public delta.io PROTOCOL.md: protocol/metaData actions at v0,
    add/remove file actions per commit, newline-delimited JSON) so a
    third-party Delta reader can consume the table without knowing
    tablelog exists. The table exercises all three action shapes: an
    overwrite commit (initial adds), an append commit (adds on top),
    and a compaction (removes + adds swapping the file layout with
    identical content). Read-back goes through
    ``tablelog.replay_delta_log`` — a from-spec state reconstruction
    that never consults tablelog's own ``_log`` — and the recovered
    file set must byte-equal the tablelog snapshot before Spark scans
    it; the oracle certifies the row content. No third-party Delta
    engine is installable in this sandbox (duckdb ``INSTALL delta``
    needs the network; delta-rs/delta-spark absent — probe recorded
    in CHECKLOG_r08), so spec-conformance is additionally pinned
    action-by-action in tests/test_tablelog.py."""
    from ..tablelog import replay_delta_log, tmp_table

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    t = tmp_table()
    t.write(o.filter(F.col("o_orderkey") % 3 == 0), mode="overwrite")
    t.write(o.filter(F.col("o_orderkey") % 3 == 1), mode="append")
    t.compact(spark, target_files=2)
    t.export_delta_log(t.read(spark).schema.json())
    files = replay_delta_log(t.path)
    want = {os.path.join(t.path, f) for f in t.snapshot()["files"]}
    assert set(files) == want, "delta replay diverged from tablelog snapshot"
    return spark.read.parquet(*files)


@register(
    "table_format_iceberg_export",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders
WHERE o_orderkey % 3 > 0
""",
    tags=("sink", "table"),
)
def table_format_iceberg_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTERNAL lakehouse interop, Iceberg half (VERDICT r7 missing
    item #2): the tablelog version chain published as Iceberg v2
    metadata — metadata.json with field-id'd schema + snapshot list,
    one Avro manifest LIST per snapshot, one Avro manifest per
    snapshot with per-file row counts and ADDED/EXISTING statuses
    (operators/icebergmeta.py; Avro via the JVM-certified
    operators/avroio.py codec, field-id annotations per Iceberg's
    Avro convention). The same three commit shapes as the Delta key
    (overwrite, append, compact) exercise added/existing/removed
    bookkeeping. Read-back is ``replay_iceberg`` — the spec's scan
    planning walk over ONLY the emitted metadata tree — and the
    planned file set must equal the tablelog snapshot before Spark
    scans it; per-file record counts come from parquet footers
    (pyarrow, driver-side metadata scale: one footer per file). No
    Iceberg engine is installable here (pyiceberg absent, duckdb
    iceberg ext needs network — probe in CHECKLOG_r08), so spec
    conformance is pinned field-by-field in tests/test_tablelog.py."""
    import pyarrow.parquet as pq  # noqa: PLC0415

    from ..operators.icebergmeta import export_iceberg, replay_iceberg
    from ..tablelog import tmp_table

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    t = tmp_table()
    t.write(o.filter(F.col("o_orderkey") % 3 == 1), mode="overwrite")
    t.write(o.filter(F.col("o_orderkey") % 3 == 2), mode="append")
    t.compact(spark, target_files=2)
    all_files = {
        f
        for v in range(1, t.latest_version() + 1)
        for f in t.snapshot(v)["files"]
    }
    counts = {
        f: pq.ParquetFile(os.path.join(t.path, f)).metadata.num_rows
        for f in all_files
    }
    fields = [
        {"id": 1, "name": "o_orderkey", "required": False, "type": "long"},
        {"id": 2, "name": "o_custkey", "required": False, "type": "long"},
        {"id": 3, "name": "o_orderstatus", "required": False, "type": "string"},
        {"id": 4, "name": "o_totalprice", "required": False, "type": "double"},
    ]
    export_iceberg(t, fields, counts)
    files = replay_iceberg(t.path)
    want = sorted(os.path.join(t.path, f) for f in t.snapshot()["files"])
    assert files == want, "iceberg scan plan diverged from tablelog snapshot"
    return spark.read.parquet(*files)


@register(
    "source_csv_multiline_quoted",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(1 + length(note) - length(replace(note, chr(10), ''))
            AS BIGINT) AS n_lines,
       md5(note) AS note_md5
FROM (
  SELECT 1 AS doc_id,
         'first line' || chr(10) || 'second line' AS note
  UNION ALL
  SELECT 2, 'no newline here'
  UNION ALL
  SELECT 3, 'a,comma and a' || chr(10) || 'break, "quoted" too'
)
""",
)
def source_csv_multiline_quoted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTILINE CSV ingestion — fields containing embedded NEWLINES
    (and commas, and quotes): the classic silent corrupter, because
    default line-splitting CSV readers shear a quoted record at the
    embedded newline and produce plausible-looking garbage rows.
    The fixture is written BY the CSV writer (quoting applied per
    RFC 4180) and read back with multiLine=true + escaped quotes;
    the hash pins the reconstructed field bytes (md5) and the
    embedded line count per record. Scale note: multiLine forces
    whole-file parsing (a file is no longer splittable at newlines)
    — the reason pipelines convert such feeds to parquet at the
    edge; this key documents the cost with the correctness."""
    rows = [
        (1, "first line\nsecond line"),
        (2, "no newline here"),
        (3, 'a,comma and a\nbreak, "quoted" too'),
    ]
    src = spark.createDataFrame(rows, "doc_id INT, note STRING")
    out = os.path.join(_tmpdir("csv_ml"), "notes_csv")
    # escape='"' on BOTH sides = RFC 4180 quote doubling; Spark's
    # default backslash escaping would round-trip with itself but
    # not with standard CSV consumers.
    src.coalesce(1).write.mode("overwrite").option("quoteAll", True).option(
        "escape", '"'
    ).csv(out)
    back = (
        spark.read.schema("doc_id INT, note STRING")
        .option("multiLine", True)
        .option("escape", '"')
        .csv(out)
    )
    return back.select(
        F.col("doc_id").cast("bigint"),
        (
            1
            + F.length("note")
            - F.length(F.regexp_replace("note", "\n", ""))
        ).cast("bigint").alias("n_lines"),
        F.md5("note").alias("note_md5"),
    )


@register(
    "table_format_merge",
    oracle=f"""
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 3 = 0
),
batch AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice
  FROM orders WHERE o_orderkey % 6 = 0
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 3 = 1
),
merged AS (
  SELECT * FROM batch
  UNION ALL
  SELECT * FROM base
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM batch)
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       {SQL_DEC_SUM('o_totalprice')} AS total_value
FROM merged GROUP BY o_orderstatus
""",
)
def table_format_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE (upsert) through the log-structured table format
    (tablelog.py): base snapshot = every 3rd order; the merge batch
    UPDATES every 6th order (price doubled — the matched half of the
    base) and INSERTS the %3==1 orders (unmatched). TableLog.merge
    unions base+batch with a provenance flag, keeps one row per key
    preferring the batch via a keyed row_number, and commits the
    rewritten snapshot as mode="merge" under optimistic concurrency
    — a racing writer gets CommitConflict and recomputes (pinned by
    tests/test_tablelog.py's deterministic race). The oracle is the
    plain SQL MERGE result (batch ∪ base-minus-matched). Version 1
    still time-travels to the pre-merge rows. At scale the rewrite
    would prune to key-overlapping files via file stats; the commit
    protocol (file-list transactions) is what makes that safe."""
    from ..tablelog import tmp_table

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t = tmp_table()
    t.write(o.filter(F.col("o_orderkey") % 3 == 0), mode="overwrite")
    batch = (
        o.filter(F.col("o_orderkey") % 6 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .unionByName(o.filter(F.col("o_orderkey") % 3 == 1))
    )
    v = t.merge(spark, batch, keys=["o_orderkey"])
    assert v == 2
    return (
        t.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dec_sum("o_totalprice").alias("total_value"),
        )
    )


@register(
    "table_format_snapshot_diff",
    oracle=f"""
WITH v1 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 3 = 0
),
v2 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice
  FROM orders WHERE o_orderkey % 6 = 0
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 3 = 1
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey % 6 <> 0
),
diff AS (
  SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
         CASE WHEN a.o_orderkey IS NULL THEN 'added'
              WHEN b.o_orderkey IS NULL THEN 'removed'
              WHEN {SQL_CENTS('a.o_totalprice')} <> {SQL_CENTS('b.o_totalprice')}
                OR a.o_orderstatus <> b.o_orderstatus THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM v1 a FULL OUTER JOIN v2 b USING (o_orderkey)
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
FROM diff GROUP BY status
""",
)
def table_format_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT DIFF across table-format versions — the data-diff /
    audit operator every lakehouse needs ('what did yesterday's merge
    actually do?'): time-travel reads of version 1 (pre-merge) and
    version 2 (post-merge) from the SAME tablelog, full-outer-joined
    on the key, each row classified added / removed / changed /
    unchanged (change = any non-key column differs, compared in
    exact cents), rolled up to a per-status report with key ranges.
    Runs on the MERGE fixture of table_format_merge, so the diff's
    'added' set is exactly the merge's inserts and 'changed' is its
    updates — cross-checking two operators against one oracle
    algebra. One co-partitioned shuffle on the key; at 100 TB both
    snapshot reads prune to their committed file lists (no directory
    listing), and file-level min/max key stats would skip unchanged
    files entirely — the protocol (file-list commits) is what makes
    that pruning sound."""
    from ..tablelog import tmp_table

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t = tmp_table()
    t.write(o.filter(F.col("o_orderkey") % 3 == 0), mode="overwrite")
    batch = (
        o.filter(F.col("o_orderkey") % 6 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .unionByName(o.filter(F.col("o_orderkey") % 3 == 1))
    )
    t.merge(spark, batch, keys=["o_orderkey"])
    a = t.read(spark, version=1).alias("a")
    b = t.read(spark, version=2).alias("b")
    diff = a.join(b, on="o_orderkey", how="full_outer").select(
        "o_orderkey",
        F.when(F.col("a.o_orderstatus").isNull(), "added")
        .when(F.col("b.o_orderstatus").isNull(), "removed")
        .when(
            (cents(F.col("a.o_totalprice")) != cents(F.col("b.o_totalprice")))
            | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus")),
            "changed",
        )
        .otherwise("unchanged")
        .alias("status"),
    )
    return diff.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_orderkey").cast("bigint").alias("min_key"),
        F.max("o_orderkey").cast("bigint").alias("max_key"),
    )


@register(
    "table_format_delete",
    oracle=f"""
WITH v2 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice
  FROM orders WHERE o_orderkey % 6 = 0
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 3 = 1
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey % 6 <> 0
),
v3 AS (SELECT * FROM v2 WHERE o_orderkey % 9 <> 0),
diff AS (
  SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
         CASE WHEN b.o_orderkey IS NULL THEN 'removed'
              ELSE 'unchanged' END AS status
  FROM v2 a FULL OUTER JOIN v3 b USING (o_orderkey)
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n_rows,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM v3) AS rows_after,
       (SELECT {SQL_DEC_SUM('o_totalprice')} FROM v3) AS value_after
FROM diff GROUP BY status
""",
)
def table_format_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE through the table-format commit log — the
    copy-on-write half of deletion vectors: an anti-join rewrite
    removes every key in the delete set, committed as one
    mode="delete" version under the same optimistic concurrency as
    merge. Runs on the MERGE fixture (v1 base, v2 merged), deletes
    the %9==0 keys -> v3, and the checked output is the v2-vs-v3
    snapshot diff (exercising snapshot-diff's 'removed' branch,
    which the merge-only fixture never produces) next to v3's
    row count and exact-cents total — while v2 still time-travels
    to the deleted rows (deletion is a metadata event; VACUUM is
    the erasure). At 100 TB the rewrite would prune to files whose
    key-range stats overlap the delete set — or stamp DV sidecars
    and rewrite nothing; the file-list commit makes either safe."""
    from ..tablelog import tmp_table

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t = tmp_table()
    t.write(o.filter(F.col("o_orderkey") % 3 == 0), mode="overwrite")
    batch = (
        o.filter(F.col("o_orderkey") % 6 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .unionByName(o.filter(F.col("o_orderkey") % 3 == 1))
    )
    t.merge(spark, batch, keys=["o_orderkey"])  # v2
    doomed = t.read(spark, version=2).filter(
        F.col("o_orderkey") % 9 == 0
    ).select("o_orderkey")
    v = t.delete(spark, doomed, keys=["o_orderkey"])
    assert v == 3
    v2 = t.read(spark, version=2).alias("a")
    v3 = t.read(spark, version=3).alias("b")
    after = v3.agg(
        F.count(F.lit(1)).alias("rows_after"),
        dec_sum("o_totalprice").alias("value_after"),
    )
    diff = v2.join(v3, on="o_orderkey", how="full_outer").select(
        F.when(F.col("b.o_orderstatus").isNull(), "removed")
        .otherwise("unchanged")
        .alias("status"),
    )
    return (
        diff.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .crossJoin(F.broadcast(after))
    )


@register(
    "sink_partition_overwrite_dynamic",
    oracle=f"""
WITH full_load AS (
  SELECT o_orderkey, o_totalprice, CAST(year(o_orderdate) AS BIGINT) AS o_year
  FROM orders
),
restated AS (
  SELECT o_orderkey, o_totalprice * 2 AS o_totalprice, o_year
  FROM full_load WHERE o_year = 1997 AND o_orderkey % 2 = 0
),
final AS (
  SELECT * FROM full_load WHERE o_year <> 1997
  UNION ALL
  SELECT * FROM restated
)
SELECT o_year, CAST(COUNT(*) AS BIGINT) AS n_rows,
       {SQL_DEC_SUM('o_totalprice')} AS total_value
FROM final GROUP BY o_year
""",
)
def sink_partition_overwrite_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition overwrite (partitionOverwriteMode=dynamic) —
    the idempotent-backfill write mode: a restatement batch touching
    ONLY year=1997 replaces exactly that partition directory and
    leaves every other year's files untouched (static mode would
    truncate the whole table first — the classic way a backfill
    silently deletes five years of data). The restated 1997 keeps
    only even keys at doubled value, so the checked read-back proves
    both the replacement (1997 shrank and repriced) and the
    preservation (all other years bit-identical). At 100 TB this is
    THE partition-grain idempotent write: reruns converge, and the
    blast radius of a bad batch is one partition, bounded by the
    write's own output set."""
    out = os.path.join(_tmpdir("dynpart"), "orders_by_year")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.year("o_orderdate").cast("bigint").alias("o_year"),
    )
    o.write.mode("overwrite").partitionBy("o_year").parquet(out)
    restated = (
        o.filter((F.col("o_year") == 1997) & (F.col("o_orderkey") % 2 == 0))
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        restated.write.mode("overwrite").partitionBy("o_year").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    back = spark.read.parquet(out)
    return back.groupBy("o_year").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dec_sum("o_totalprice").alias("total_value"),
    )


@register(
    "source_json_mixed_schema",
    oracle="""
WITH j AS (
  SELECT 1 AS id, 'alpha' AS name, CAST(NULL AS BIGINT) AS score,
         CAST(NULL AS VARCHAR) AS tag
  UNION ALL SELECT 2, 'beta', NULL, NULL
  UNION ALL SELECT 3, NULL, 77, 'x'
  UNION ALL SELECT 4, NULL, 88, 'y'
  UNION ALL SELECT 5, 'gamma', 99, NULL
)
SELECT CAST(id AS BIGINT) AS id, name,
       CAST(score AS BIGINT) AS score, tag,
       (name IS NOT NULL) AS has_name, (score IS NOT NULL) AS has_score
FROM j
""",
)
def source_json_mixed_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA-DRIFTED JSON ingestion — the real shape of a landing
    zone: three JSONL files written by three producer generations
    (v1: id+name, v2: id+score+tag, v3: id+name+score), read in ONE
    pass with spark.read.json inferring the UNION schema and
    NULL-backfilling every absent field — no producer coordination,
    no failed batch, no silent column drop (the three bad outcomes
    of rigid-schema ingestion). The checked output pins the union
    schema, the per-row backfill pattern, and presence flags. At
    100 TB inference runs on a SAMPLE (samplingRatio) or is replaced
    by an explicit evolving schema registry — the union semantics
    under test are identical; Graph.run's upsert consumes exactly
    this drift via schema_implements (graph_schema_evolution)."""
    d = _tmpdir("json_mixed")
    import json as _json

    files = {
        "v1.json": [{"id": 1, "name": "alpha"}, {"id": 2, "name": "beta"}],
        "v2.json": [
            {"id": 3, "score": 77, "tag": "x"},
            {"id": 4, "score": 88, "tag": "y"},
        ],
        "v3.json": [{"id": 5, "name": "gamma", "score": 99}],
    }
    for fname, rows in files.items():
        with open(os.path.join(d, fname), "w") as fh:
            for r in rows:
                fh.write(_json.dumps(r) + "\n")
    back = spark.read.json(d)
    return back.select(
        F.col("id").cast("bigint"),
        "name",
        F.col("score").cast("bigint"),
        "tag",
        F.col("name").isNotNull().alias("has_name"),
        F.col("score").isNotNull().alias("has_score"),
    )


@register(
    "table_format_schema_evolution",
    oracle="""
WITH unioned AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         CAST(NULL AS VARCHAR) AS o_orderpriority
  FROM orders WHERE o_orderkey % 3 = 0
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 3 = 1
)
SELECT o_orderstatus,
       COALESCE(o_orderpriority, '<pre-evolution>') AS pri,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
         / 100.0 AS total_value
FROM unioned
GROUP BY o_orderstatus, pri
""",
)
def table_format_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADDITIVE SCHEMA EVOLUTION through the log-structured table
    format: commit 1 writes 3 columns, commit 2 appends a batch
    carrying a NEW column, and a merged-schema snapshot read returns
    the widened table with nulls backfilled on pre-evolution rows —
    no rewrite of old files, the lakehouse contract. The log keeps
    both commits' files in one snapshot; `read(merge_schema=True)`
    (tablelog.py) unions the parquet schemas. The oracle is the
    plain UNION with a typed NULL. Time travel to v1 still reads
    the narrow schema — evolution is additive, never destructive."""
    from ..tablelog import tmp_table

    o = table(spark, sf_dir, "orders")
    t = tmp_table()
    t.write(
        o.filter(F.col("o_orderkey") % 3 == 0).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        ),
        mode="overwrite",
    )
    t.write(
        o.filter(F.col("o_orderkey") % 3 == 1).select(
            "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
        ),
        mode="append",
    )
    evolved = t.read(spark, merge_schema=True)
    assert "o_orderpriority" in evolved.columns
    narrow = t.read(spark, version=1)
    assert "o_orderpriority" not in narrow.columns
    return evolved.groupBy(
        "o_orderstatus",
        F.coalesce("o_orderpriority", F.lit("<pre-evolution>")).alias("pri"),
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        dec_sum("o_totalprice").alias("total_value"),
    )


@register(
    "scan_file_skipping_stats",
    oracle="""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
         / 100.0 AS revenue,
       CAST(2 AS BIGINT) AS n_files_read,
       CAST(7 AS BIGINT) AS n_files_total
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY yr
""",
)
def scan_file_skipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILE SKIPPING VIA A STATS MANIFEST — the Iceberg/Delta scan
    path, distinct from Hive-style partition pruning: the table is
    laid out as date-clustered files, a manifest records each file's
    (min, max) orderdate FROM THE DATA (directory names are never
    consulted), and the date-range query prunes the file list by
    interval overlap against the manifest BEFORE any parquet footer
    is opened. Here 1995-2001 cluster into 7 files; the 1996-1997
    predicate keeps exactly 2, and the result provably equals the
    full-scan filter (the oracle) with the pruned counts pinned as
    columns. The manifest lives as a METADATA TABLE (a DataFrame,
    one row per file) and the interval-overlap predicate is applied
    to it RELATIONALLY — only the surviving file names reach the
    driver, which is exactly what a table format's scan planner
    materializes to build the task list (Iceberg manifests are
    themselves scanned and filtered this way). At 100 TB this is the
    scan primitive that makes every other operator start from 2% of
    the files."""
    import os as _os
    import tempfile as _tempfile

    o = table(spark, sf_dir, "orders")
    base = _tempfile.mkdtemp(prefix="dags_spark_fskip_")
    data_dir = _os.path.join(base, "t")
    (
        o.withColumn("yr_bucket", F.year("o_orderdate"))
        .repartition("yr_bucket")
        .write.mode("overwrite")
        .partitionBy("yr_bucket")
        .parquet(data_dir)
    )
    full = spark.read.parquet(data_dir)
    manifest = full.groupBy(F.input_file_name().alias("file")).agg(
        F.min("o_orderdate").alias("min_d"), F.max("o_orderdate").alias("max_d")
    )
    lo, hi = "1996-01-01", "1998-01-01"
    n_total = manifest.count()
    keep = [
        r["file"]
        for r in manifest.filter(
            (F.col("max_d") >= F.lit(lo).cast("timestamp"))
            & (F.col("min_d") < F.lit(hi).cast("timestamp"))
        )
        .select("file")
        .collect()
    ]
    pruned = spark.read.parquet(*keep)
    return (
        pruned.filter(
            (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
        )
        .groupBy(F.year("o_orderdate").cast("bigint").alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum("o_totalprice").alias("revenue"),
        )
        .withColumn("n_files_read", F.lit(len(keep)).cast("bigint"))
        .withColumn("n_files_total", F.lit(n_total).cast("bigint"))
    )


@register(
    "sink_csv_gzip_roundtrip",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
         / 100.0 AS total
FROM orders
GROUP BY o_orderstatus
""",
)
def sink_csv_gzip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPRESSED TEXT round-trip — CSV written with codec=gzip and
    read back through the decompressing reader with an explicit
    schema (inference on compressed text would double-scan). The
    practical scan caveat this key documents is a real 100 TB
    constraint: .csv.gz files are NOT SPLITTABLE — each file is one
    task no matter its size — so the writer controls read
    parallelism by the number of files it emits (here the upstream
    partitioning; at scale, a repartition(N) before the sink IS the
    reader's degree of parallelism). The aggregate oracle proves
    the values survived compression byte-exactly."""
    import tempfile as _tf

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    out = _tf.mkdtemp(prefix="dags_spark_csvgz_") + "/t"
    o.write.mode("overwrite").option("compression", "gzip").option(
        "header", "true"
    ).csv(out)
    back = (
        spark.read.option("header", "true")
        .schema("o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")
        .csv(out)
    )
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("o_totalprice").alias("total"),
    )


@register(
    "table_format_vacuum",
    oracle=f"""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       {{SQL_DEC_SUM}} AS total_value,
       TRUE AS orphans_removed,
       TRUE AS expired_read_fails,
       TRUE AS retained_logs_only
FROM orders WHERE o_orderkey % 3 <> 0
GROUP BY o_orderstatus
""".replace("{SQL_DEC_SUM}", SQL_DEC_SUM("o_totalprice")),
)
def table_format_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM on the log-structured table format — the storage-
    reclaim companion to compact(): v1 overwrite (keys %3=0),
    v2 overwrite (%3=1, orphaning v1's files), v3 append (%3=2),
    then OPTIMIZE to v4 (rewriting v2+v3's files), then
    vacuum(retain_last=1). The invariants pinned here are the ones
    a lakehouse must not get wrong: (a) the retained snapshot is
    BYTE-INTACT after physical deletion (the aggregate below is the
    proof), (b) every unreferenced data file is actually gone from
    the directory (storage is reclaimed, not leaked), (c) reads of
    expired versions fail LOUDLY on the missing log entry — never a
    silent partial read, because resolution goes through the version
    file before any data path. The oracle recomputes the retained
    content (%3 in {{1,2}}) straight from the defining predicates.
    At 100 TB vacuum is a metadata diff (retained file lists vs a
    listing) + bulk deletes — no data is read at all."""
    from ..tablelog import tmp_table

    o = table(spark, sf_dir, "orders")
    t = tmp_table()
    t.write(o.filter(F.col("o_orderkey") % 3 == 0), mode="overwrite")
    t.write(o.filter(F.col("o_orderkey") % 3 == 1), mode="overwrite")
    t.write(o.filter(F.col("o_orderkey") % 3 == 2), mode="append")
    t.compact(spark, target_files=2)
    stats = t.vacuum(retain_last=1)

    kept = set(t.snapshot()["files"])
    on_disk = {f for f in os.listdir(t.path) if f.endswith(".parquet")}
    orphans_removed = on_disk == kept and stats["removed_data_files"] > 0
    try:
        t.read(spark, version=1)
        expired_fails = False
    except FileNotFoundError:
        expired_fails = True
    retained_logs_only = (
        t.latest_version() == 4 and stats["removed_log_entries"] == 3
    )
    back = t.read(spark)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        dec_sum("o_totalprice").alias("total_value"),
        F.lit(bool(orphans_removed)).alias("orphans_removed"),
        F.lit(bool(expired_fails)).alias("expired_read_fails"),
        F.lit(bool(retained_logs_only)).alias("retained_logs_only"),
    )


@register(
    "source_orc_pushdown",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
         / 100.0 AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-01-01'
GROUP BY o_orderstatus
""",
)
def source_orc_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC PREDICATE PUSHDOWN — the ORC twin of
    scan_parquet_pushdown: orders are landed as ORC (the other
    columnar format a lake actually serves; sink_orc_roundtrip pins
    the byte fidelity, THIS key pins the scan efficiency) and read
    back with a date filter + 3-column projection. The filter must
    reach the ORC reader as a search argument and the ReadSchema
    must shrink to the projected columns — asserted IN-QUERY
    against the formatted physical plan (PushedFilters on
    o_orderdate, no full-schema read), so a Spark upgrade that
    silently drops ORC SARGs fails the hash, not just a lint. At
    100 TB stripe-level SARG skipping is the difference between
    reading a year and reading a week."""
    import tempfile as _tf

    o = table(spark, sf_dir, "orders")
    out = _tf.mkdtemp(prefix="dags_spark_orcpush_") + "/t"
    o.write.mode("overwrite").orc(out)
    back = (
        spark.read.orc(out)
        .filter(F.col("o_orderdate") >= "1998-01-01")
        .select("o_orderstatus", "o_totalprice", "o_orderdate")
    )
    plan = back._jdf.queryExecution().explainString(
        back._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    ok = (
        "PushedFilters: [" in plan
        and "o_orderdate" in plan.split("PushedFilters: [", 1)[1].split("]")[0]
    )
    if not ok:
        raise AssertionError("ORC scan lost the o_orderdate pushdown:\n" + plan)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        (F.sum(cents("o_totalprice")).cast("double") / 100.0).alias("revenue"),
    )


@register(
    "table_format_deletion_vectors",
    oracle="""
WITH combined AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 4 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 4 = 1
),
alive AS (SELECT * FROM combined WHERE o_orderkey % 9 <> 0)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_c,
       CAST((SELECT COUNT(*) FROM combined WHERE o_orderkey % 9 = 0)
         AS BIGINT) AS n_deleted,
       CAST(4 AS BIGINT) AS n_data_files,
       TRUE AS data_files_untouched,
       CAST(1 AS BIGINT) AS n_dv_files,
       TRUE AS compact_materializes_dvs
FROM alive
""",
    tags=("table-format", "sink"),
)
def table_format_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETION VECTORS (merge-on-read) — the lakehouse delete
    strategy table_format_delete's copy-on-write contrasts against,
    now implemented for real in the tablelog format: two appends
    (2 files each), then delete_mor() stamps the matched keys as ONE
    DV sidecar parquet while the four data files stay byte-for-byte
    in place (the commit is O(deleted keys), the read pays an
    anti-join), and a final compact() MATERIALIZES the DVs — it
    rewrites from the DV-applied read and drops the sidecars. The
    key asserts the whole lifecycle in its output row: row count
    and cent sum after the MOR delete, that the delete commit kept
    the exact base file list, the DV count, and that post-compact
    the DVs are gone with values unchanged. Oracle recomputes the
    surviving set relationally."""
    import os

    from ..tablelog import tmp_table

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    t = tmp_table("dags_dv_")
    t.write(o.filter(F.col("o_orderkey") % 4 == 0).repartition(2), "append")
    t.write(o.filter(F.col("o_orderkey") % 4 == 1).repartition(2), "append")
    before = t.snapshot()["files"]
    keys = (
        t.read(spark)
        .filter(F.col("o_orderkey") % 9 == 0)
        .select("o_orderkey")
    )
    n_deleted = keys.count()
    t.delete_mor(spark, keys, ["o_orderkey"])
    snap = t.snapshot()
    after = snap["files"]
    got = t.read(spark).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(cents("o_totalprice")).cast("bigint").alias("total_c"),
    )
    row = got.collect()[0]
    # compact() must materialize the deletes and drop the sidecars
    t.compact(spark, target_files=1)
    final = t.snapshot()
    compacted_ok = (
        not final.get("dvs")
        and t.read(spark).count() == row["n_rows"]
    )
    # DV sidecars from the pre-compact commit still exist on disk for
    # time travel until vacuum
    return spark.createDataFrame(
        [
            (
                row["n_rows"],
                row["total_c"],
                n_deleted,
                len(after),
                before == after,
                len(snap.get("dvs", [])),
                bool(compacted_ok),
            )
        ],
        "n_rows bigint, total_c bigint, n_deleted bigint,"
        " n_data_files bigint, data_files_untouched boolean,"
        " n_dv_files bigint, compact_materializes_dvs boolean",
    )


@register(
    "source_fixed_width",
    oracle="""
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_c
FROM orders WHERE o_orderkey % 10 = 3
GROUP BY status
""",
    tags=("source",),
)
def source_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIXED-WIDTH TEXT SOURCE — the mainframe/legacy interchange
    format (COBOL copybooks, bank clearing files) that has no
    delimiter to split on: a 34-byte record layout (orderkey 12,
    status 1, zero-padded cents 15, priority-digit 1, filler 5) is
    WRITTEN as spark.write.text and read back by POSITION —
    substr() against the copybook offsets, the only correct parse
    (splitting on whitespace corrupts zero-padded amounts and blank
    fillers). Round-trips a 10% order sample and re-aggregates; the
    oracle computes the same rollup relationally, so the hash
    certifies the byte-offset arithmetic. At 100 TB: text scan +
    projection — pushdown-free by nature of the format, which is
    exactly why these files get converted to parquet on landing."""
    import tempfile

    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 3)
    rec = F.concat(
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
        F.col("o_orderstatus"),
        F.lpad(cents("o_totalprice").cast("string"), 15, "0"),
        F.substring("o_orderpriority", 1, 1),
        F.lit("     "),
    )
    path = tempfile.mkdtemp(prefix="dags_fixedwidth_") + "/data"
    o.select(rec.alias("value")).write.mode("overwrite").text(path)
    raw = spark.read.text(path)
    parsed = raw.select(
        F.substring("value", 13, 1).alias("status"),
        F.substring("value", 14, 15).cast("bigint").alias("cents"),
    )
    return parsed.groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("total_c"),
    )


@register(
    "source_json_multiline",
    oracle="""
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_c
FROM orders WHERE o_orderkey % 25 = 4
GROUP BY status
""",
    tags=("source",),
)
def source_json_multiline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTILINE JSON SOURCE — a single pretty-printed JSON ARRAY
    per file (the shape REST exports and config dumps actually
    arrive in), which line-oriented JSONL readers silently mangle:
    Spark needs multiLine=true, which switches the reader from
    line-splittable to WHOLE-FILE parsing — the key's docstring
    point at 100 TB is that this mode makes each file one
    unsplittable task, so landing pipelines should explode arrays
    to JSONL early (source_json_lines is the splittable cousin).
    The fixture is staged DISTRIBUTIVELY (no driver collect): each
    task wraps its partition's to_json records in array punctuation
    via a mapInPandas iterator kernel — the one shape a built-in
    cannot express, because only the iterator sees partition
    start/end — and writes ONE valid JSON array per part file
    (newline-separated elements, comma lines between: legal JSON
    whitespace). Read back through the multiLine path and
    re-aggregated; the oracle computes the rollup relationally."""
    import tempfile

    import pandas as pd  # noqa: PLC0415

    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 25 == 4)
    jdf = o.select(
        F.to_json(
            F.struct(
                "o_orderkey",
                "o_orderstatus",
                cents("o_totalprice").alias("cents"),
            )
        ).alias("j")
    )

    def to_array_lines(batches):
        # iterator-form kernel: sees the whole partition, so it can
        # emit "[" before the first record and "]" after the last —
        # each part file becomes one self-contained JSON array.
        first = True
        for pdf in batches:
            lines = []
            for j in pdf["j"]:
                lines.append("[" if first else ",")
                first = False
                lines.append(j)
            if lines:
                yield pd.DataFrame({"value": lines})
        if not first:
            yield pd.DataFrame({"value": ["]"]})

    d = tempfile.mkdtemp(prefix="dags_mljson_")
    jdf.mapInPandas(to_array_lines, schema="value string").write.mode(
        "overwrite"
    ).text(d)
    parsed = spark.read.option("multiLine", "true").json(d)
    return parsed.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("total_c"),
    )


_AVRO_ORDERS_SCHEMA = {
    "type": "record",
    "name": "orders",
    "fields": [
        {"name": "o_orderkey", "type": "long"},
        {"name": "o_custkey", "type": "long"},
        {"name": "o_orderstatus", "type": ["null", "string"], "default": None},
        {"name": "o_totalprice", "type": ["null", "double"], "default": None},
        {
            "name": "o_orderdate",
            "type": ["null", {"type": "long", "logicalType": "timestamp-micros"}],
            "default": None,
        },
        {"name": "o_orderpriority", "type": ["null", "string"], "default": None},
    ],
}

_AVRO_ORDERS_DDL = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _avro_write_partitions(
    df: DataFrame, schema: dict, out_dir: str, ts_cols: tuple[str, ...]
) -> list[str]:
    """Write each partition of ``df`` as one Avro object-container
    file under ``out_dir`` and COMMIT via a manifest: only the file
    paths Spark's successful task attempts returned are published to
    ``_manifest.json``, so an orphan left by a retried or speculative
    attempt is never read back (same two-phase contract as the
    dags_tsv_sink).  The only driver-side data is the committed file
    list (file-count cardinality — what any scan planner holds).
    Returns the committed paths."""
    import json as _json  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    from ..operators.avroio import write_container  # noqa: PLC0415

    cols = [f["name"] for f in schema["fields"]]

    def _write(batches):
        import uuid as _uuid  # noqa: PLC0415

        recs: list[dict] = []
        for pdf in batches:
            pdf = pdf[cols].copy()
            for c in ts_cols:
                # Map per-value so nulls stay None instead of the NaT
                # int64 sentinel landing on the non-null union branch.
                pdf[c] = pdf[c].map(
                    lambda v: None if pd.isna(v) else pd.Timestamp(v).value // 1000
                )
            pdf = pdf.astype(object).where(pdf.notna(), None)
            recs.extend(pdf.to_dict("records"))
        if not recs:
            return
        path = os.path.join(out_dir, f"part-{_uuid.uuid4().hex}.avro")
        with open(path, "wb") as fh:
            fh.write(write_container(recs, schema))
        yield pd.DataFrame({"path": [path], "n": [len(recs)]})

    manifest = df.mapInPandas(_write, "path string, n bigint")
    files = [r["path"] for r in manifest.select("path").collect()]
    with open(os.path.join(out_dir, "_manifest.json"), "w") as fh:
        _json.dump(files, fh)
    return files


def _avro_read_files(
    spark: SparkSession,
    files: list[str],
    ddl: str,
    ts_cols: tuple[str, ...],
    reader_schema: dict | None = None,
) -> DataFrame:
    """Scan exactly the manifest-committed Avro container files
    distributively: binaryFile source (one file per task) -> Arrow
    decode kernel.  Taking an explicit file list (not a dir glob)
    keeps uncommitted attempt files invisible."""

    def _read(batches):
        import pandas as pd  # noqa: PLC0415

        from ..operators.avroio import read_container  # noqa: PLC0415

        for pdf in batches:
            for content in pdf["content"]:
                _, recs = read_container(bytes(content), reader_schema=reader_schema)
                if not recs:
                    continue
                rpdf = pd.DataFrame(recs)
                for c in ts_cols:
                    rpdf[c] = pd.to_datetime(rpdf[c], unit="us")
                yield rpdf

    bf = spark.read.format("binaryFile").load(files)
    return bf.select("content").mapInPandas(_read, ddl)


@register(
    "sink_avro_roundtrip",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority
FROM orders
""",
    tags=("sink",),
)
def sink_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro object-container sink + source, spec-level: no spark-avro
    datasource jar ships in this sandbox, so the container format is
    implemented byte-level in operators/avroio.py (deflate codec,
    nullable unions, timestamp-micros logical type) and certified
    against the JVM Apache Avro library both directions in
    tests/test_operators.py. orders is written one container file per
    partition from an Arrow kernel (executor-side; the only driver
    action is the file-count manifest), then scanned back via the
    binaryFile source — one file per task, the same parallelism story
    as any splittable-by-file format at 100 TB. Doubles and
    timestamps round-trip binary-exact (IEEE-754 LE / long micros)."""
    out = _tmpdir("avro")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    )
    files = _avro_write_partitions(
        orders.repartition(4), _AVRO_ORDERS_SCHEMA, out, ("o_orderdate",)
    )
    assert files, "avro sink committed no files"
    return _avro_read_files(spark, files, _AVRO_ORDERS_DDL, ("o_orderdate",))


@register(
    "source_avro_evolution",
    oracle="""
SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       o_totalprice, 'unknown' AS o_channel
FROM orders
WHERE o_orderkey % 4 = 0
""",
    tags=("source",),
)
def source_avro_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro schema RESOLUTION (reader schema != writer schema): files
    are written with a v1 schema carrying (o_orderkey long, o_year
    int, o_totalprice double, o_orderpriority string) and scanned
    with a v2 reader schema that drops o_orderpriority, promotes
    o_year int->long, and adds o_channel with a default — the three
    migrations a long-lived 100 TB corpus actually accumulates, and
    the reason Avro corpora don't need rewrites when the producer
    schema moves. Resolution happens per-record in the decode kernel
    (operators/avroio.py spec rules: name match, writer-only skip,
    reader default, numeric promotion)."""
    writer_schema = {
        "type": "record",
        "name": "orders",
        "fields": [
            {"name": "o_orderkey", "type": "long"},
            {"name": "o_year", "type": "int"},
            {"name": "o_totalprice", "type": ["null", "double"], "default": None},
            {"name": "o_orderpriority", "type": ["null", "string"], "default": None},
        ],
    }
    reader_schema = {
        "type": "record",
        "name": "orders",
        "fields": [
            {"name": "o_orderkey", "type": "long"},
            {"name": "o_year", "type": "long"},
            {"name": "o_totalprice", "type": ["null", "double"], "default": None},
            {"name": "o_channel", "type": "string", "default": "unknown"},
        ],
    }
    out = _tmpdir("avro_evo")
    v1 = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 4 == 0)
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("int").alias("o_year"),
            "o_totalprice",
            "o_orderpriority",
        )
    )
    files = _avro_write_partitions(v1.repartition(2), writer_schema, out, ())
    assert files, "avro evolution sink committed no files"
    return _avro_read_files(
        spark,
        files,
        "o_orderkey bigint, o_year bigint, o_totalprice double, o_channel string",
        (),
        reader_schema=reader_schema,
    )


@register(
    "source_warc_records",
    oracle="""
WITH html AS (
  SELECT doc_id,
         '<html><head><title>doc ' || CAST(doc_id AS VARCHAR)
           || '</title></head><body><p>'
           || replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'),
                      '>', '&gt;')
           || '</p></body></html>' AS h
  FROM documents
)
SELECT doc_id, 200 AS http_status,
       CAST(octet_length(encode(h)) AS BIGINT) AS n_bytes,
       TRUE AS digest_ok, md5(h) AS html_md5
FROM html
""",
    tags=("source",),
)
def source_warc_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC/1.0 crawl-archive source (ISO 28500 — the Common Crawl
    container, THE raw input format of LLM training pipelines),
    implemented spec-level in operators/warc.py since no WARC lib
    ships here. documents are wrapped as HTTP response records (one
    .warc file per partition, written executor-side), scanned back
    via binaryFile — one archive per task, the same file-granular
    parallelism real crawl processing uses — and parsed byte-level:
    WARC headers, HTTP status line, Content-Length payload slicing,
    and the sha1 WARC-Payload-Digest recomputed per record
    (digest_ok must hold for every row; the oracle pins it TRUE).
    The html md5 certifies the payload byte-exactly end-to-end."""
    import pandas as pd  # noqa: PLC0415

    from ..operators.warc import build_response_record, parse_warc  # noqa: PLC0415

    out = _tmpdir("warc")
    html = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.concat(
                F.lit("<html><head><title>doc "),
                F.col("doc_id").cast("string"),
                F.lit("</title></head><body><p>"),
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace("text", "&", "&amp;"), "<", "&lt;"
                    ),
                    ">",
                    "&gt;",
                ),
                F.lit("</p></body></html>"),
            ).alias("h"),
        )
    )

    def _write(batches):
        import uuid as _uuid  # noqa: PLC0415

        chunks: list[bytes] = []
        n = 0
        for pdf in batches:
            for doc_id, h in zip(pdf["doc_id"], pdf["h"]):
                chunks.append(
                    build_response_record(
                        uri=f"http://corpus.example/doc/{doc_id}",
                        record_id=f"urn:example:{doc_id}",
                        date="2026-01-01T00:00:00Z",
                        html=h,
                    )
                )
                n += 1
        if not n:
            return
        path = os.path.join(out, f"part-{_uuid.uuid4().hex}.warc")
        with open(path, "wb") as fh:
            fh.write(b"".join(chunks))
        yield pd.DataFrame({"path": [path], "n": [n]})

    # Manifest commit: only paths returned by successful attempts are
    # read back, so retried/speculative attempts' orphans are invisible.
    warc_files = [
        r["path"]
        for r in html.repartition(4)
        .mapInPandas(_write, "path string, n bigint")
        .select("path")
        .collect()
    ]
    assert warc_files, "warc sink committed no files"

    def _read(batches):
        from hashlib import md5 as _md5  # noqa: PLC0415

        for pdf in batches:
            for content in pdf["content"]:
                recs = [
                    r
                    for r in parse_warc(bytes(content))
                    if r.get("warc-type") == "response"
                ]
                if not recs:
                    continue
                yield pd.DataFrame(
                    {
                        "doc_id": [
                            int(r["warc-target-uri"].rsplit("/", 1)[1])
                            for r in recs
                        ],
                        "http_status": [r["http_status"] for r in recs],
                        "n_bytes": [len(r["body"]) for r in recs],
                        "digest_ok": [bool(r["digest_ok"]) for r in recs],
                        "html_md5": [
                            _md5(r["body"]).hexdigest() for r in recs
                        ],
                    }
                )

    bf = spark.read.format("binaryFile").load(warc_files)
    return bf.select("content").mapInPandas(
        _read,
        "doc_id bigint, http_status int, n_bytes bigint,"
        " digest_ok boolean, html_md5 string",
    )


@register(
    "source_protobuf_delimited",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) - 20000000 AS bal_c,
       CAST(datediff('day', DATE '1970-01-01',
                     CAST(o_orderdate AS DATE)) AS BIGINT) AS order_day
FROM orders
""",
    tags=("source",),
)
def source_protobuf_delimited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Protocol Buffers length-delimited stream source, wire format
    implemented FROM THE PUBLIC SPEC (operators/protowire.py) — the
    round-8 conversion of the standing `google.protobuf is absent`
    probe into coverage, the same move the Avro/JPEG/GIF codecs made
    in round 7. orders rows are encoded executor-side as proto
    messages (varint, zigzag-sint64 for the mixed-sign balance,
    length-delimited strings) with a v2 WRITER schema carrying an
    extra field the reader never learns about; the READER schema
    skips it by wire type — protobuf's entire schema-evolution
    contract, certified here end-to-end on real relation data and in
    tests/test_protowire.py against the spec's own golden byte
    vectors. One stream file per partition, manifest-committed
    (retried attempts' orphans invisible), scanned back via
    binaryFile — one file per task, the standard splittable-by-file
    parallelism for delimited proto shards at 100 TB."""
    import pandas as pd  # noqa: PLC0415

    from ..operators.protowire import read_delimited, write_delimited  # noqa: PLC0415

    writer_schema = {
        1: ("o_orderkey", "int64"),
        2: ("o_custkey", "int64"),
        3: ("o_orderstatus", "string"),
        4: ("bal_c", "sint64"),
        5: ("order_day", "int64"),
        6: ("o_orderpriority", "string"),  # v2-only: reader must skip
    }
    reader_schema = {k: v for k, v in writer_schema.items() if k != 6}

    out = _tmpdir("proto")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (cents("o_totalprice") - F.lit(20000000)).alias("bal_c"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("order_day"),
        "o_orderpriority",
    )

    def _write(batches):
        import uuid as _uuid  # noqa: PLC0415

        recs: list[dict] = []
        for pdf in batches:
            recs.extend(pdf.to_dict("records"))
        if not recs:
            return
        path = os.path.join(out, f"part-{_uuid.uuid4().hex}.pb")
        with open(path, "wb") as fh:
            fh.write(write_delimited(recs, writer_schema))
        yield pd.DataFrame({"path": [path], "n": [len(recs)]})

    files = [
        r["path"]
        for r in o.repartition(4)
        .mapInPandas(_write, "path string, n bigint")
        .select("path")
        .collect()
    ]
    assert files, "proto sink committed no files"

    def _read(batches):
        for pdf in batches:
            for content in pdf["content"]:
                recs = read_delimited(bytes(content), reader_schema)
                if recs:
                    yield pd.DataFrame(recs)

    bf = spark.read.format("binaryFile").load(files)
    return bf.select("content").mapInPandas(
        _read,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "bal_c bigint, order_day bigint",
    )


@register(
    "source_cbor_records",
    oracle="""
SELECT s_suppkey AS id, CAST(s_nationkey AS BIGINT) AS nation,
       s_name AS name,
       CAST(ROUND(s_acctbal * 100, 0) AS BIGINT) AS bal_c,
       CAST(s_suppkey % 3 + s_suppkey * 1000 AS BIGINT) AS tag_sum,
       CAST(length(s_name) + 1 + s_suppkey % 40 AS BIGINT) AS comment_len
FROM supplier
""",
    tags=("source",),
)
def source_cbor_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CBOR (RFC 8949) record-sequence source, wire format
    implemented FROM THE PUBLIC SPEC (operators/cborio.py) — the
    third varint family in the codebase after protobuf's LSB-first
    LEB128 and SMF's MSB-first VLQ: CBOR heads carry 5 bits of
    'additional info' that either IS the value (< 24) or selects a
    1/2/4-byte big-endian argument. supplier rows are encoded
    executor-side as one CBOR map per record (unsigned + NEGATIVE
    ints for the mixed-sign balance, UTF-8 text, a nested tag
    array), laid end-to-end as an RFC 8742 CBOR Sequence — one shard
    file per partition, scanned back via binaryFile, one shard per
    task. The fixture data spans all three multi-byte head forms
    (comment lengths > 23, balances > 255, tag values > 65535), so a
    decoder that only handles the immediate form cannot hash-match;
    truncation raises typed ValueError
    (tests/test_operators.py::test_cbor_roundtrip_and_truncation)."""
    import pandas as pd  # noqa: PLC0415

    from ..operators.cborio import decode_sequence, encode_item  # noqa: PLC0415

    out = _tmpdir("cbor")
    sup = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_nationkey",
        "s_name",
        cents("s_acctbal").alias("bal_c"),
        # text long enough to cross the 23-byte immediate-form
        # ceiling (the fixture supplier table has no comment column)
        F.concat_ws(
            " ", "s_name", F.expr("repeat('y', s_suppkey % 40)")
        ).alias("s_comment"),
    )

    def _write(batches):
        import uuid as _uuid  # noqa: PLC0415

        blob = bytearray()
        n = 0
        for pdf in batches:
            for r in pdf.to_dict("records"):
                blob += encode_item(
                    {
                        "id": int(r["s_suppkey"]),
                        "nation": int(r["s_nationkey"]),
                        "name": r["s_name"],
                        "bal": int(r["bal_c"]),
                        "tags": [
                            int(r["s_suppkey"]) % 3,
                            int(r["s_suppkey"]) * 1000,
                        ],
                        "comment": r["s_comment"],
                    }
                )
                n += 1
        if not n:
            return
        path = os.path.join(out, f"part-{_uuid.uuid4().hex}.cbor")
        with open(path, "wb") as fh:
            fh.write(bytes(blob))
        yield pd.DataFrame({"path": [path], "n": [n]})

    files = [
        r["path"]
        for r in sup.repartition(4)
        .mapInPandas(_write, "path string, n bigint")
        .select("path")
        .collect()
    ]
    assert files, "cbor sink committed no files"

    def _read(batches):
        for pdf in batches:
            for content in pdf["content"]:
                recs = decode_sequence(bytes(content))
                if recs:
                    yield pd.DataFrame(
                        {
                            "id": [r["id"] for r in recs],
                            "nation": [r["nation"] for r in recs],
                            "name": [r["name"] for r in recs],
                            "bal_c": [r["bal"] for r in recs],
                            "tag_sum": [sum(r["tags"]) for r in recs],
                            "comment_len": [len(r["comment"]) for r in recs],
                        }
                    )

    bf = spark.read.format("binaryFile").load(files)
    return bf.select("content").mapInPandas(
        _read,
        "id bigint, nation bigint, name string, bal_c bigint, "
        "tag_sum bigint, comment_len bigint",
    )


@register(
    "source_gzip_multistream",
    oracle="""
SELECT CAST(r AS BIGINT) AS n, 'line-' || CAST(r AS VARCHAR) AS line,
       CAST(r // 100 AS BIGINT) AS member
FROM range(0, 300) t(r)
""",
    tags=("source",),
)
def source_gzip_multistream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenated-member gzip source: RFC 1952 §2.2 explicitly
    allows a .gz file to be a SEQUENCE of independently-compressed
    members, and appending-producer pipelines (log shippers, `cat
    a.gz b.gz > all.gz` compaction) emit exactly that. Many naive
    decoders stop at the first member's end-of-stream and silently
    drop the rest — the classic truncation-without-an-error bug.
    This key writes THREE members (100 lines each) into one .gz and
    asserts the text scan surfaces all 300 lines: Spark's Hadoop
    GzipCodec must keep inflating across member boundaries, and the
    relational oracle pins every line, so a first-member-only read
    cannot pass. Single non-splittable file by design — the 100 TB
    layout note is that multistream .gz still gates parallelism at
    FILE granularity (one task per file), which is why the engine's
    preferred text layouts are many-file bz2/zstd or parquet; this
    key certifies correctness on the format users actually ship."""
    import gzip as _gzip  # noqa: PLC0415

    work = _tmpdir("gzms")
    path = os.path.join(work, "multi.gz")
    with open(path, "wb") as raw:
        for member in range(3):
            # each member independently compressed, then concatenated
            raw.write(
                _gzip.compress(
                    "".join(
                        f"line-{n}\n"
                        for n in range(member * 100, (member + 1) * 100)
                    ).encode()
                )
            )
    lines = spark.read.text(path)
    n = F.split(F.col("value"), "-").getItem(1).cast("bigint")
    return lines.select(
        n.alias("n"),
        F.col("value").alias("line"),
        (n / 100).cast("bigint").alias("member"),
    )


@register(
    "source_tar_shards",
    oracle="""
SELECT doc_id, lang, source,
       CAST(length(text) AS BIGINT) AS n_chars_decoded,
       md5(text) AS text_md5
FROM documents
""",
    tags=("source",),
)
def source_tar_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style tar-shard source: the de-facto layout for
    large multimodal training corpora is plain POSIX tar shards whose
    members group into samples by basename stem ({key}.txt holds the
    payload, {key}.json the metadata) — readable with nothing but the
    tar spec, streamable, and splittable at SHARD granularity, which
    is exactly how a 1000-executor job consumes them: one shard per
    task, sequential reads inside. documents are packed into one tar
    shard per partition executor-side (stdlib tarfile, USTAR format,
    all timestamps/uids zeroed so shard bytes are deterministic),
    manifest-committed, then scanned back via binaryFile with a
    kernel that re-groups members by stem and re-joins payload with
    metadata. The md5 pins the text byte-exact through the tar
    round-trip; lang/source prove the sidecar JSON survives."""
    import json as _json  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    out = _tmpdir("tarshard")
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )

    def _write(batches):
        import io as _io  # noqa: PLC0415
        import tarfile as _tarfile  # noqa: PLC0415
        import uuid as _uuid  # noqa: PLC0415

        buf = _io.BytesIO()
        n = 0
        with _tarfile.open(
            fileobj=buf, mode="w", format=_tarfile.USTAR_FORMAT
        ) as tf:
            for pdf in batches:
                for doc_id, text, lang, source in zip(
                    pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"]
                ):
                    for ext, payload in (
                        ("txt", str(text).encode("utf-8")),
                        (
                            "json",
                            _json.dumps(
                                {"lang": str(lang), "source": str(source)},
                                sort_keys=True,
                            ).encode("utf-8"),
                        ),
                    ):
                        info = _tarfile.TarInfo(name=f"{int(doc_id):012d}.{ext}")
                        info.size = len(payload)
                        info.mtime = 0
                        info.uid = info.gid = 0
                        info.uname = info.gname = ""
                        info.mode = 0o644
                        tf.addfile(info, _io.BytesIO(payload))
                    n += 1
        if not n:
            return
        path = os.path.join(out, f"shard-{_uuid.uuid4().hex}.tar")
        with open(path, "wb") as fh:
            fh.write(buf.getvalue())
        yield pd.DataFrame({"path": [path], "n": [n]})

    files = [
        r["path"]
        for r in docs.repartition(4)
        .mapInPandas(_write, "path string, n bigint")
        .select("path")
        .collect()
    ]
    assert files, "tar sink committed no files"

    def _read(batches):
        import io as _io  # noqa: PLC0415
        import tarfile as _tarfile  # noqa: PLC0415
        from hashlib import md5 as _md5  # noqa: PLC0415

        for pdf in batches:
            for content in pdf["content"]:
                samples: dict[str, dict] = {}
                with _tarfile.open(fileobj=_io.BytesIO(bytes(content))) as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        stem, ext = m.name.rsplit(".", 1)
                        samples.setdefault(stem, {})[ext] = tf.extractfile(
                            m
                        ).read()
                rows = []
                for stem in sorted(samples):
                    s = samples[stem]
                    meta = _json.loads(s["json"].decode("utf-8"))
                    text = s["txt"].decode("utf-8")
                    rows.append(
                        {
                            "doc_id": int(stem),
                            "lang": meta["lang"],
                            "source": meta["source"],
                            "n_chars_decoded": len(text),
                            "text_md5": _md5(s["txt"]).hexdigest(),
                        }
                    )
                if rows:
                    yield pd.DataFrame(rows)

    bf = spark.read.format("binaryFile").load(files)
    return bf.select("content").mapInPandas(
        _read,
        "doc_id bigint, lang string, source string, "
        "n_chars_decoded bigint, text_md5 string",
    )


@register(
    "source_zip_archive",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS total_c
FROM orders WHERE o_orderkey % 11 = 3
""",
    tags=("source",),
)
def source_zip_archive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIP archive source (APPNOTE.TXT format, stdlib zipfile): the
    shape vendor data drops actually arrive in — an archive of CSV
    members. One zip per partition is built executor-side with fixed
    DOS timestamps (deterministic bytes), manifest-committed, scanned
    back via binaryFile, and each task walks the archive's CENTRAL
    DIRECTORY (the trailing index that makes zip members seekable
    without scanning the stream — the property that lets a reader
    fan member extraction out across threads at scale) and parses
    the CSV members. Deflate round-trips the payload; the values
    hash-check against the relational oracle."""
    import pandas as pd  # noqa: PLC0415

    out = _tmpdir("ziparc")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 11 == 3)
        .select(
            "o_orderkey", "o_custkey", cents("o_totalprice").alias("total_c")
        )
    )

    def _write(batches):
        import io as _io  # noqa: PLC0415
        import uuid as _uuid  # noqa: PLC0415
        import zipfile as _zipfile  # noqa: PLC0415

        buf = _io.BytesIO()
        n = 0
        with _zipfile.ZipFile(buf, "w", _zipfile.ZIP_DEFLATED) as zf:
            for i, pdf in enumerate(batches):
                if pdf.empty:
                    continue
                lines = [
                    f"{k},{c},{t}"
                    for k, c, t in zip(
                        pdf["o_orderkey"], pdf["o_custkey"], pdf["total_c"]
                    )
                ]
                info = _zipfile.ZipInfo(
                    f"chunk-{i:04d}.csv", date_time=(1980, 1, 1, 0, 0, 0)
                )
                zf.writestr(info, "\n".join(lines))
                n += len(lines)
        if not n:
            return
        path = os.path.join(out, f"arc-{_uuid.uuid4().hex}.zip")
        with open(path, "wb") as fh:
            fh.write(buf.getvalue())
        yield pd.DataFrame({"path": [path], "n": [n]})

    files = [
        r["path"]
        for r in o.repartition(4)
        .mapInPandas(_write, "path string, n bigint")
        .select("path")
        .collect()
    ]
    assert files, "zip sink committed no files"

    def _read(batches):
        import io as _io  # noqa: PLC0415
        import zipfile as _zipfile  # noqa: PLC0415

        for pdf in batches:
            for content in pdf["content"]:
                rows = {"o_orderkey": [], "o_custkey": [], "total_c": []}
                with _zipfile.ZipFile(_io.BytesIO(bytes(content))) as zf:
                    for name in zf.namelist():
                        for line in zf.read(name).decode("utf-8").splitlines():
                            k, c, t = line.split(",")
                            rows["o_orderkey"].append(int(k))
                            rows["o_custkey"].append(int(c))
                            rows["total_c"].append(int(t))
                if rows["o_orderkey"]:
                    yield pd.DataFrame(rows)

    bf = spark.read.format("binaryFile").load(files)
    return bf.select("content").mapInPandas(
        _read, "o_orderkey bigint, o_custkey bigint, total_c bigint"
    )


@register(
    "source_text_bz2",
    oracle="""
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_c
FROM orders
GROUP BY status
""",
    tags=("source",),
)
def source_text_bz2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bzip2-compressed text round-trip through Spark's Hadoop codec
    path. The scale point is WHY bz2 and not gzip for landing text:
    bzip2 is a BLOCK-oriented stream (900 KB blocks with a
    48-bit block magic), so Hadoop's BZip2Codec is SPLITTABLE — a
    single 10 GB .bz2 file fans out across tasks, where the same
    file gzipped is one unsplittable task and one straggler. (The
    splittable cousin of source_json_multiline's whole-file
    anti-pattern.) orders are written as pipe-delimited lines with
    compression=bzip2, read back through the same codec, parsed with
    split(), and re-aggregated; the rollup hash-checks against the
    relational oracle."""
    out = os.path.join(_tmpdir("bz2"), "orders_txt")
    o = table(spark, sf_dir, "orders").select(
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_orderstatus"),
            cents("o_totalprice").cast("string"),
        ).alias("value")
    )
    o.write.mode("overwrite").option("compression", "bzip2").text(out)
    parsed = spark.read.text(out).select(
        F.split(F.col("value"), r"\|").alias("p")
    )
    return (
        parsed.select(
            F.col("p").getItem(1).alias("status"),
            F.col("p").getItem(2).cast("bigint").alias("c"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("c").cast("bigint").alias("total_c"),
        )
    )


@register(
    "table_format_delta_checkpoint",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders
WHERE o_orderkey % 4 < 3
""",
    tags=("sink", "table"),
)
def table_format_delta_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-protocol CHECKPOINT round-trip (PROTOCOL.md
    "Checkpoints" — the depth increment on table_format_delta_export):
    a five-commit table (overwrite, two appends, a compaction, one
    more append) exports its ``_delta_log``, then a checkpoint
    parquet + ``_last_checkpoint`` pointer are written AT THE
    SECOND-TO-LAST version, and read-back goes through
    ``replay_delta_from_checkpoint`` — the spec's reader walk that
    loads state from the checkpoint file and applies ONLY the one
    JSON commit after it, never touching the commits the checkpoint
    summarizes. The recovered file set must equal both the full-log
    replay and the tablelog snapshot before Spark scans it. At
    100 TB checkpoints are why a reader's planning cost is
    O(commits since checkpoint), not O(table history) — thousands of
    commits collapse into one parquet read. (No third-party Delta
    engine ships in this sandbox — probe recorded in CHECKLOG_r08 —
    so conformance is pinned by the independent replay paths plus
    tests/test_tablelog.py.)"""
    from ..tablelog import (
        replay_delta_from_checkpoint,
        replay_delta_log,
        tmp_table,
    )

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    t = tmp_table()
    t.write(o.filter(F.col("o_orderkey") % 4 == 0), mode="overwrite")
    t.write(o.filter(F.col("o_orderkey") % 4 == 1), mode="append")
    t.write(o.filter(F.col("o_orderkey") % 4 == 2), mode="append")
    t.compact(spark, target_files=2)
    t.write(
        o.filter(F.col("o_orderkey") % 4 == 2).limit(0), mode="append"
    )  # an empty tail commit the checkpoint must NOT include
    t.export_delta_log(t.read(spark).schema.json())
    # checkpoint at second-to-last delta version; the last JSON commit
    # is applied on top by the checkpoint-aware reader
    t.export_delta_checkpoint(t.latest_version() - 2)
    files = replay_delta_from_checkpoint(t.path)
    assert files == replay_delta_log(t.path), (
        "checkpoint replay diverged from full-log replay"
    )
    want = {os.path.join(t.path, f) for f in t.snapshot()["files"]}
    assert set(files) == want, "checkpoint replay diverged from snapshot"
    return spark.read.parquet(*files)


@register(
    "source_sequencefile",
    oracle="""
SELECT o_orderkey, o_orderstatus AS status,
       CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS total_c
FROM orders WHERE o_orderkey % 13 = 5
""",
    tags=("source",),
)
def source_sequencefile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hadoop SequenceFile round-trip — the original Hadoop K/V
    container (block-compressed, splittable via sync markers) that
    two decades of MapReduce pipelines left on every data lake; an
    engine claiming to replace those pipelines must still read their
    outputs. This is the repo's ONE deliberate RDD-API key: Spark
    exposes SequenceFile only at the RDD layer (saveAsSequenceFile /
    sequenceFile with Writable<->Python conversion via the bundled
    Pyrolite converters), there is no DataFrame source without a
    third-party package, and the format IS a K/V record stream — so
    the RDD hop is the honest surface, immediately lifted back into
    a DataFrame for the relational tail. Keys are the order key
    (LongWritable), values a pipe-packed payload (Text); read-back
    splits per file-block task, the same parallelism story as any
    sync-marked container at 100 TB."""
    out = os.path.join(_tmpdir("seqfile"), "orders_seq")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 13 == 5)
        .select(
            "o_orderkey",
            F.concat_ws(
                "|", F.col("o_orderstatus"), cents("o_totalprice").cast("string")
            ).alias("payload"),
        )
    )
    o.rdd.map(lambda r: (r.o_orderkey, r.payload)).saveAsSequenceFile(out)
    back = spark.sparkContext.sequenceFile(out)
    df = back.toDF(["o_orderkey", "payload"])
    return df.select(
        F.col("o_orderkey").cast("bigint"),
        F.split_part(F.col("payload"), F.lit("|"), F.lit(1)).alias("status"),
        F.split_part(F.col("payload"), F.lit("|"), F.lit(2))
        .cast("bigint")
        .alias("total_c"),
    )


# ---------------------------------------------------------- round 9

@register(
    "source_arrow_ipc_stream",
    oracle="""
SELECT s_suppkey AS id, s_name AS name,
       CAST(s_nationkey AS BIGINT) AS nation,
       CAST(ROUND(s_acctbal * 100, 0) AS BIGINT) AS bal_c
FROM supplier
""",
    tags=("source",),
)
def source_arrow_ipc_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow IPC STREAM format source (the Arrow columnar wire
    protocol: schema message + record-batch messages, also the
    payload of Flight and the body of Feather v2) — the interchange
    format a 100 TB feature platform actually speaks between
    engines. Shards are written executor-side with pyarrow's stream
    writer (one .arrows file per partition, multiple record batches
    per file to exercise batch iteration), scanned back via
    binaryFile + open_stream — one shard per task, so the read
    parallelizes at file grain exactly like the tar/zip/sequencefile
    sources. The supplier roundtrip (int64 + utf8 + exact cents
    lane) is pinned by the relational oracle."""
    import pandas as pd  # noqa: PLC0415
    import pyarrow as pa  # noqa: PLC0415
    import pyarrow.ipc  # noqa: PLC0415

    out = _tmpdir("arrowipc")
    sup = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"),
        F.col("s_name").alias("name"),
        F.col("s_nationkey").cast("bigint").alias("nation"),
        cents("s_acctbal").alias("bal_c"),
    )

    def _write(batches):
        import uuid as _uuid  # noqa: PLC0415

        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        tbl = pa.Table.from_pandas(
            pd.concat(pdfs, ignore_index=True), preserve_index=False
        )
        path = os.path.join(out, f"part-{_uuid.uuid4().hex}.arrows")
        with pa.ipc.new_stream(path, tbl.schema) as w:
            # several small batches per shard: a reader that only
            # consumes the first batch cannot hash-match
            for chunk in tbl.to_batches(max_chunksize=7):
                w.write_batch(chunk)
        yield pd.DataFrame({"path": [path]})

    files = [
        r["path"]
        for r in sup.repartition(4)
        .mapInPandas(_write, "path string")
        .collect()
    ]
    assert files, "arrow ipc sink committed no files"

    def _read(batches):
        for pdf in batches:
            for content in pdf["content"]:
                with pa.ipc.open_stream(pa.BufferReader(bytes(content))) as r:
                    yield r.read_all().to_pandas()

    bf = spark.read.format("binaryFile").load(files)
    return bf.select("content").mapInPandas(
        _read, "id bigint, name string, nation bigint, bal_c bigint"
    )


@register(
    "source_pcap_packets",
    oracle="""
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec,
       CAST(16 + event_id % 48 AS BIGINT) AS pkt_len,
       CAST(event_id % 2 = 1 AS BOOLEAN) AS from_bigendian
FROM events
""",
    tags=("source",),
)
def source_pcap_packets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pcap capture-file source, wire format implemented FROM THE
    PUBLIC SPEC (operators/pcapio.py — the libpcap/tcpdump format):
    24-byte global header whose MAGIC doubles as a byte-order mark,
    16-byte per-packet record headers (ts_sec/ts_usec/incl_len/
    orig_len), raw payload bytes. Events become packets (payload =
    8-byte big-endian event_id + deterministic filler to
    16 + id%48 bytes); odd-id packets are written into BIG-ENDIAN
    captures and even-id into little-endian ones, so a reader that
    ignores the 0xd4c3b2a1 swapped magic produces garbage ts/len on
    half the corpus and cannot hash-match. One capture file per
    (partition, endianness) — scanned back via binaryFile, one
    capture per task. Truncation raises typed ValueError
    (tests/test_operators.py::test_pcap_roundtrip_and_truncation)."""
    import pandas as pd  # noqa: PLC0415

    from ..operators.pcapio import read_pcap, write_pcap  # noqa: PLC0415

    out = _tmpdir("pcap")
    ev = table(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("long").alias("ts_sec")
    )

    def _write(batches):
        import uuid as _uuid  # noqa: PLC0415

        by_endian: dict[bool, list] = {False: [], True: []}
        for pdf in batches:
            for r in pdf.to_dict("records"):
                eid = int(r["event_id"])
                n = 16 + eid % 48
                payload = eid.to_bytes(8, "big") + bytes(
                    (eid + i) % 256 for i in range(n - 8)
                )
                by_endian[eid % 2 == 1].append(
                    (int(r["ts_sec"]), 0, payload)
                )
        rows = []
        for be, pkts in by_endian.items():
            if not pkts:
                continue
            path = os.path.join(
                out, f"cap-{'be' if be else 'le'}-{_uuid.uuid4().hex}.pcap"
            )
            with open(path, "wb") as fh:
                fh.write(write_pcap(pkts, big_endian=be))
            rows.append(path)
        if rows:
            yield pd.DataFrame({"path": rows})

    files = [
        r["path"]
        for r in ev.repartition(4).mapInPandas(_write, "path string").collect()
    ]
    assert files, "pcap sink committed no files"

    def _read(batches):
        for pdf in batches:
            for content in pdf["content"]:
                cap = read_pcap(bytes(content))
                recs = [
                    {
                        "event_id": int.from_bytes(data[:8], "big"),
                        "ts_sec": ts_sec,
                        "pkt_len": orig,
                        "from_bigendian": cap["big_endian"],
                    }
                    for ts_sec, _us, orig, data in cap["packets"]
                ]
                if recs:
                    yield pd.DataFrame(recs)

    bf = spark.read.format("binaryFile").load(files)
    return bf.select("content").mapInPandas(
        _read,
        "event_id bigint, ts_sec bigint, pkt_len bigint,"
        " from_bigendian boolean",
    )


@register(
    "source_mbox_messages",
    oracle="""
SELECT doc_id, 'doc-' || CAST(doc_id AS VARCHAR) || '@example.test' AS msg_id,
       lang AS subject_lang,
       CAST(length('From the start: ') + length(lang) + 1 + length(text)
            AS BIGINT) AS body_chars,
       CAST(1 + CASE WHEN text LIKE 'From %' THEN 1 ELSE 0 END AS BIGINT)
         AS from_lines
FROM documents
""",
    tags=("source",),
)
def source_mbox_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mbox mailbox source (RFC 4155 framing + mboxrd quoting),
    implemented from the public spec (operators/mboxio.py). Each
    document becomes a message whose BODY deliberately starts with
    'From the start: ...' — a line the writer must quote ('>From')
    or every downstream reader splits the message in half (the
    format's classic defect). The reader strips exactly one quoting
    level (mboxrd, the reversible convention; mboxo would corrupt a
    genuine '>From' line), folds RFC 5322 header continuations, and
    the oracle pins per-message body length INCLUDING the unquoted
    From-line, so lossy quoting or bad framing cannot hash-match.
    One mbox shard per partition via binaryFile — file-grain
    parallel like every archive source here."""
    import pandas as pd  # noqa: PLC0415

    from ..operators.mboxio import read_mbox, write_mbox  # noqa: PLC0415

    out = _tmpdir("mbox")
    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "lang")

    def _write(batches):
        import uuid as _uuid  # noqa: PLC0415

        msgs = []
        for pdf in batches:
            for r in pdf.to_dict("records"):
                body = f"From the start: {r['lang']}\n{r['text']}"
                msgs.append(
                    (
                        f"doc-{int(r['doc_id'])}@example.test",
                        [
                            ("Message-ID", f"doc-{int(r['doc_id'])}@example.test"),
                            ("Subject", f"lang {r['lang']}"),
                            ("X-Doc-Id", str(int(r["doc_id"]))),
                        ],
                        body,
                    )
                )
        if not msgs:
            return
        path = os.path.join(out, f"shard-{_uuid.uuid4().hex}.mbox")
        with open(path, "wb") as fh:
            fh.write(write_mbox(msgs))
        yield pd.DataFrame({"path": [path]})

    files = [
        r["path"]
        for r in docs.repartition(4).mapInPandas(_write, "path string").collect()
    ]
    assert files, "mbox sink committed no files"

    def _read(batches):
        for pdf in batches:
            for content in pdf["content"]:
                recs = []
                for m in read_mbox(bytes(content)):
                    hdr = dict(m["headers"])
                    recs.append(
                        {
                            "doc_id": int(hdr["X-Doc-Id"]),
                            "msg_id": hdr["Message-ID"],
                            "subject_lang": hdr["Subject"].split()[-1],
                            "body_chars": len(m["body"]),
                            "from_lines": sum(
                                1
                                for ln in m["body"].split("\n")
                                if ln.startswith("From ")
                            ),
                        }
                    )
                if recs:
                    yield pd.DataFrame(recs)

    bf = spark.read.format("binaryFile").load(files)
    return bf.select("content").mapInPandas(
        _read,
        "doc_id bigint, msg_id string, subject_lang string,"
        " body_chars bigint, from_lines bigint",
    )


@register(
    "source_syslog_rfc5424",
    oracle="""
WITH src AS (
  SELECT (o_custkey % 24) * 8 + o_orderkey % 8 AS pri,
         'app' || CAST(o_orderkey % 4 AS BIGINT) AS app,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
         o_orderkey
  FROM orders WHERE o_orderkey % 8 = 1
)
SELECT CAST(pri // 8 AS BIGINT) AS facility,
       CAST(pri % 8 AS BIGINT) AS severity,
       app,
       CAST(COUNT(*) AS BIGINT) AS n_msgs,
       CAST(SUM(cents) AS BIGINT) AS total_c,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
FROM src GROUP BY facility, severity, app
""",
    tags=("source",),
)
def source_syslog_rfc5424(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SYSLOG SOURCE (RFC 5424) — the structured syslog wire format
    every ops/observability lake ingests: '<PRI>VERSION TIMESTAMP
    HOSTNAME APP-NAME PROCID MSGID [SD-ID k="v" ...] MSG', where
    PRI packs facility*8+severity into one integer (the decode rule
    §6.2.1 — div/mod, not two fields) and the STRUCTURED-DATA
    block carries typed key=value pairs that naive space-splitting
    destroys (values contain spaces; the [..] element must be
    regex-extracted as a unit). Lines are synthesized from orders,
    written as a real text file, read back via spark.read.text and
    parsed with anchored regexp_extract — PRI decode, app-name
    field, SD param values (status, exact cents), trailing message
    key — then rolled up per (facility, severity, app). The oracle
    computes the rollup relationally, so the hash certifies every
    extraction offset. At 100 TB: line-splittable text scan,
    per-row regex in codegen, one aggregate exchange on the tiny
    (facility, severity, app) grain."""
    import tempfile

    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 8 == 1)
    pri = ((F.col("o_custkey") % 24) * 8 + F.col("o_orderkey") % 8).cast(
        "bigint"
    )
    line = F.concat(
        F.lit("<"),
        pri.cast("string"),
        F.lit(">1 2024-03-01T12:00:00.000Z host"),
        (F.col("o_custkey") % 10).cast("string"),
        F.lit(" app"),
        (F.col("o_orderkey") % 4).cast("string"),
        F.lit(" "),
        (1000 + F.col("o_orderkey") % 9000).cast("string"),
        F.lit(" MSG"),
        (F.col("o_orderkey") % 100).cast("string"),
        F.lit(' [order@32473 status="'),
        F.col("o_orderstatus"),
        F.lit('" cents="'),
        cents("o_totalprice").cast("string"),
        F.lit('"] completed order '),
        F.col("o_orderkey").cast("string"),
    )
    path = tempfile.mkdtemp(prefix="dags_syslog_") + "/data"
    o.select(line.alias("value")).write.mode("overwrite").text(path)
    raw = spark.read.text(path)
    v = F.col("value")
    parsed = raw.select(
        F.regexp_extract(v, r"^<([0-9]+)>", 1).cast("bigint").alias("pri"),
        F.regexp_extract(
            v, r"^<[0-9]+>1 \S+ \S+ (\S+) ", 1
        ).alias("app"),
        F.regexp_extract(v, r'cents="([0-9]+)"', 1)
        .cast("bigint")
        .alias("cents"),
        F.regexp_extract(v, r"completed order ([0-9]+)$", 1)
        .cast("bigint")
        .alias("okey"),
    )
    return parsed.groupBy(
        (F.col("pri") / 8).cast("bigint").alias("facility"),
        (F.col("pri") % 8).cast("bigint").alias("severity"),
        "app",
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_msgs"),
        F.sum("cents").cast("bigint").alias("total_c"),
        F.sum("okey").cast("bigint").alias("key_sum"),
    )


@register(
    "source_clf_accesslog",
    oracle="""
WITH src AS (
  SELECT CASE o_orderkey % 4 WHEN 0 THEN 'GET' WHEN 1 THEN 'POST'
              WHEN 2 THEN 'PUT' ELSE 'DELETE' END AS method,
         CASE o_orderkey % 5 WHEN 0 THEN 200 WHEN 1 THEN 200
              WHEN 2 THEN 304 WHEN 3 THEN 404 ELSE 500 END AS status,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS bytes,
         o_orderkey
  FROM orders WHERE o_orderkey % 6 = 2
)
SELECT method, CAST(status AS BIGINT) AS status,
       CAST(COUNT(*) AS BIGINT) AS n_req,
       CAST(SUM(bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
FROM src GROUP BY method, status
""",
    tags=("source",),
)
def source_clf_accesslog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMBINED-LOG-FORMAT SOURCE — the Apache/Nginx access-log line
    ('ip - user [timestamp] "METHOD path HTTP/1.1" status bytes
    "referer" "user-agent"') that web-scale training corpora and
    every traffic pipeline ingest. The parse traps are QUOTING: the
    request line and referer/UA live in double quotes and contain
    spaces (naive split corrupts them), the timestamp bracket
    contains a space before the timezone, and '-' means null for
    bytes/user. Lines are synthesized from orders (method/status
    classes, exact byte counts, the order key smuggled into the
    path), written as a real text file, read back with
    spark.read.text and parsed by ONE anchored regex that respects
    the quote structure; rolled up per (method, status) with byte
    totals. The oracle recomputes relationally: the hash certifies
    every capture group. At 100 TB: splittable text scan, codegen
    regex, tiny aggregate exchange."""
    import tempfile

    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 6 == 2)
    method = (
        F.when(F.col("o_orderkey") % 4 == 0, "GET")
        .when(F.col("o_orderkey") % 4 == 1, "POST")
        .when(F.col("o_orderkey") % 4 == 2, "PUT")
        .otherwise("DELETE")
    )
    status = (
        F.when(F.col("o_orderkey") % 5 == 0, 200)
        .when(F.col("o_orderkey") % 5 == 1, 200)
        .when(F.col("o_orderkey") % 5 == 2, 304)
        .when(F.col("o_orderkey") % 5 == 3, 404)
        .otherwise(500)
    )
    line = F.concat(
        F.lit("10.0."),
        (F.col("o_custkey") % 256).cast("string"),
        F.lit("."),
        (F.col("o_orderkey") % 256).cast("string"),
        F.lit(" - user"),
        (F.col("o_custkey") % 100).cast("string"),
        F.lit(' [10/Oct/2024:13:55:36 -0700] "'),
        method,
        F.lit(" /order/"),
        F.col("o_orderkey").cast("string"),
        F.lit('?src=a b HTTP/1.1" '),
        status.cast("string"),
        F.lit(" "),
        cents("o_totalprice").cast("string"),
        F.lit(' "https://ref.example/with space" "Mozilla/5.0 (X11; Linux)"'),
    )
    path = tempfile.mkdtemp(prefix="dags_clf_") + "/data"
    o.select(line.alias("value")).write.mode("overwrite").text(path)
    raw = spark.read.text(path)
    v = F.col("value")
    rx = (
        r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (.*?) (\S+)" '
        r'([0-9]{3}) ([0-9]+|-) "([^"]*)" "([^"]*)"$'
    )
    parsed = raw.select(
        F.regexp_extract(v, rx, 5).alias("method"),
        F.regexp_extract(v, rx, 8).cast("bigint").alias("status"),
        F.regexp_extract(v, rx, 9).cast("bigint").alias("bytes"),
        F.regexp_extract(
            F.regexp_extract(v, rx, 6), r"^/order/([0-9]+)", 1
        )
        .cast("bigint")
        .alias("okey"),
    )
    return parsed.groupBy("method", "status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_req"),
        F.sum("bytes").cast("bigint").alias("total_bytes"),
        F.sum("okey").cast("bigint").alias("key_sum"),
    )


@register(
    "source_ics_calendar",
    oracle="""
WITH src AS (
  SELECT o_orderkey,
         'prio-' || trim(o_orderpriority) AS cal,
         strftime(CAST(o_orderdate AS DATE), '%Y%m%d') AS dstart,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 11 = 3
)
SELECT cal,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS total_c,
       CAST(SUM(o_orderkey) AS BIGINT) AS uid_sum,
       CAST(MIN(dstart) AS VARCHAR) AS first_day,
       CAST(MAX(dstart) AS VARCHAR) AS last_day
FROM src GROUP BY cal
""",
    tags=("source",),
)
def source_ics_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """iCALENDAR SOURCE (RFC 5545) — the VEVENT interchange format
    with the parse trap every naive reader hits: LINE FOLDING
    (§3.1) — content lines longer than 75 octets are split with
    CRLF + single space, so 'SUMMARY:Order re' / ' view meeting' is
    ONE logical line. The unfold is the spec's own rule run in
    reverse — delete every CRLF-followed-by-space — done here as a
    single regexp_replace over WHOLE-FILE text (wholetext read:
    fold pairs must never straddle a split, the same
    unsplittable-task trade json multiline documents), then the
    VEVENT blocks explode line-wise and UID/DTSTART/SUMMARY/
    X-CENTS properties regex-extract per event. Events are
    synthesized from orders with every SUMMARY deliberately folded;
    per-calendar rollups (count, exact cents, uid sum, date span)
    are certified by the relational oracle. At 100 TB: one task per
    .ics file — shard the calendar export, not the parser."""
    import tempfile

    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 3)
    ev = F.concat(
        F.lit("BEGIN:VEVENT\r\nUID:"),
        F.col("o_orderkey").cast("string"),
        F.lit("@example.com\r\nDTSTART;VALUE=DATE:"),
        F.date_format(F.col("o_orderdate").cast("date"), "yyyyMMdd"),
        F.lit("\r\nSUMMARY:Order review for key "),
        F.col("o_orderkey").cast("string"),
        F.lit(" in bucket\r\n  "),
        F.lit("prio-"),
        F.trim(F.col("o_orderpriority")),
        F.lit("\r\nX-CENTS:"),
        cents("o_totalprice").cast("string"),
        F.lit("\r\nEND:VEVENT"),
    )
    path = tempfile.mkdtemp(prefix="dags_ics_") + "/data"
    o.select(ev.alias("value")).write.mode("overwrite").text(path)
    whole = spark.read.format("text").option("wholetext", True).load(path)
    # RFC 5545 §3.1 unfold: CRLF (or bare LF from the text sink)
    # followed by one space/tab is a continuation — delete the pair.
    unfolded = whole.select(
        F.regexp_replace("value", r"\r?\n[ \t]", "").alias("txt")
    )
    lines = unfolded.select(
        F.posexplode(F.split("txt", r"\r?\n")).alias("pos", "line")
    )
    props = lines.filter(F.col("line").rlike("^(UID|DTSTART|SUMMARY|X-CENTS)"))
    parsed = props.select(
        F.when(
            F.col("line").startswith("UID:"),
            F.regexp_extract("line", r"^UID:([0-9]+)@", 1),
        ).alias("uid"),
        F.when(
            F.col("line").startswith("DTSTART"),
            F.regexp_extract("line", r":([0-9]{8})$", 1),
        ).alias("dstart"),
        F.when(
            F.col("line").startswith("SUMMARY:"),
            F.regexp_extract("line", r"in bucket (prio-.+)$", 1),
        ).alias("cal"),
        F.when(
            F.col("line").startswith("X-CENTS:"),
            F.regexp_extract("line", r"^X-CENTS:([0-9]+)$", 1),
        ).alias("cents"),
        (F.monotonically_increasing_id() / 4).cast("bigint").alias("ev"),
    )
    # Each VEVENT contributes exactly 4 property lines in fixed
    # order (UID, DTSTART, SUMMARY, X-CENTS) within its file, so
    # integer-dividing the per-partition running line ordinal by 4
    # groups the properties back into their event.
    event = parsed.groupBy("ev").agg(
        F.max("uid").cast("bigint").alias("uid"),
        F.max("dstart").alias("dstart"),
        F.max("cal").alias("cal"),
        F.max("cents").cast("bigint").alias("cents"),
    )
    return event.groupBy("cal").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("cents").cast("bigint").alias("total_c"),
        F.sum("uid").cast("bigint").alias("uid_sum"),
        F.min("dstart").alias("first_day"),
        F.max("dstart").alias("last_day"),
    )


@register(
    "source_pem_asn1",
    oracle="""
WITH src AS (
  SELECT o_orderkey,
         'CN=cust' || CAST(o_custkey % 7 AS BIGINT) AS subject,
         CAST(10 + o_orderkey % 50 AS BIGINT) AS payload_len
  FROM orders WHERE o_orderkey % 13 = 5
)
SELECT subject,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(SUM(o_orderkey) AS BIGINT) AS serial_sum,
       CAST(SUM(payload_len) AS BIGINT) AS payload_bytes
FROM src GROUP BY subject
""",
    tags=("source",),
)
def source_pem_asn1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEM / ASN.1 DER SOURCE — the certificate-and-key interchange
    stack (RFC 7468 armor over X.690 DER) that a fleet-wide cert
    inventory or key-rotation audit must parse at scale: records
    are DER-encoded EXECUTOR-SIDE (SEQUENCE { INTEGER serial,
    UTF8String subject, OCTET STRING payload } via the from-spec
    encoder in operators/asn1.py — the pipeline's records are all
    short-form (payload <= 59 B, whole record < 0x80); long-form
    lengths and the 0x80 boundary are exercised by the encoder's
    unit tests, not by this fixture), wrapped
    in base64 PEM armor with 64-column folding, written as a text
    source, and read back: whole-file text -> regex block split ->
    armor strip -> Spark unbase64 to real BINARY -> the bounds-
    checked TLV walker (ValueError on any truncation, never
    IndexError) in an Arrow-batched UDF. Rollups per subject are
    certified relationally — the hash covers encoder, armor,
    de-armor and walker in one loop. At 100 TB: one task per PEM
    bundle file; shard the bundle, not the parser."""
    import tempfile

    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    @pandas_udf("string")
    def to_pem(okey: pd.Series, subj: pd.Series) -> pd.Series:
        import base64

        from ..operators.asn1 import (
            der_integer,
            der_octets,
            der_sequence,
            der_utf8,
        )

        def one(k, s):
            der = der_sequence(
                der_integer(int(k)),
                der_utf8(s),
                der_octets(b"\xab" * (10 + int(k) % 50)),
            )
            b64 = base64.b64encode(der).decode("ascii")
            folded = "\n".join(
                b64[i : i + 64] for i in range(0, len(b64), 64)
            )
            return (
                "-----BEGIN DAGS RECORD-----\n"
                + folded
                + "\n-----END DAGS RECORD-----"
            )

        return pd.Series([one(k, s) for k, s in zip(okey, subj)])

    @pandas_udf(
        "struct<serial: bigint, subject: string, payload_len: bigint>"
    )
    def parse_der(b: pd.Series) -> pd.DataFrame:
        from ..operators.asn1 import parse_record

        rows = []
        for buf in b:
            r = parse_record(bytes(buf))
            rows.append(
                (int(r["serial"]), r["subject"], int(r["payload_len"]))
            )
        return pd.DataFrame(
            rows, columns=["serial", "subject", "payload_len"]
        )

    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 13 == 5)
    subj = F.concat(F.lit("CN=cust"), (F.col("o_custkey") % 7).cast("string"))
    pem = o.select(to_pem("o_orderkey", subj.alias("s")).alias("value"))
    path = tempfile.mkdtemp(prefix="dags_pem_") + "/data"
    pem.write.mode("overwrite").text(path)
    whole = spark.read.format("text").option("wholetext", True).load(path)
    blocks = whole.select(
        F.explode(
            F.regexp_extract_all(
                "value",
                F.lit(
                    r"(?s)-----BEGIN DAGS RECORD-----\n(.*?)"
                    r"\n-----END DAGS RECORD-----"
                ),
                1,
            )
        ).alias("b64")
    )
    der = blocks.select(
        F.unbase64(F.regexp_replace("b64", r"\n", "")).alias("der")
    )
    rec = der.select(parse_der("der").alias("r")).select("r.*")
    return rec.groupBy("subject").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_records"),
        F.sum("serial").cast("bigint").alias("serial_sum"),
        F.sum("payload_len").cast("bigint").alias("payload_bytes"),
    )


@register(
    "source_dot_graph",
    oracle="""
WITH nodes AS (SELECT c_custkey AS id FROM customer),
nn AS (SELECT COUNT(*) AS n FROM nodes),
edges AS (
  SELECT id AS src, dst, 1 + (id % 9) AS w FROM (
    SELECT id, id + 1 + (id * 7 + 11) % 40 AS dst FROM nodes
    UNION ALL
    SELECT id, id + 1 + (id * 13 + 5) % 37 AS dst FROM nodes
  ) WHERE dst < (SELECT n FROM nn)
)
SELECT CAST(src % 50 AS BIGINT) AS src_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(w) AS BIGINT) AS weight_sum,
       CAST(COUNT(DISTINCT dst) AS BIGINT) AS n_targets,
       CAST(MAX(dst) AS BIGINT) AS max_dst
FROM edges GROUP BY src_bucket
""",
    tags=("source", "graph"),
)
def source_dot_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRAPHVIZ DOT SOURCE — the de-facto interchange format for
    dependency graphs (build systems, service meshes, lineage
    exports dump .dot): a digraph whose edge statements
    'n<src> -> n<dst> [weight=<w>];' carry attributes in the
    bracket block that naive '->' splitting concatenates into the
    target id. The same synthetic forward-edge DAG the iter_*
    keys walk is SERIALIZED to real DOT text (header, indented
    edge lines, closing brace — interleaved non-edge lines are
    part of the format), written as a text source, read back and
    parsed with one anchored regex per line (non-edge lines
    filtered by match failure, the robust way), then rolled up per
    source-bucket with weight sums and distinct-target counts
    certified relationally. At 100 TB: splittable line-oriented
    scan — each edge parses independently, the graph structure
    only re-forms at the aggregate."""
    import tempfile

    cust = table(spark, sf_dir, "customer")
    nn = cust.agg(F.count(F.lit(1)).alias("n"))
    nodes = cust.select(F.col("c_custkey").alias("id"))
    e1 = nodes.select(
        F.col("id").alias("src"),
        (F.col("id") + 1 + (F.col("id") * 7 + 11) % 40).alias("dst"),
    )
    e2 = nodes.select(
        F.col("id").alias("src"),
        (F.col("id") + 1 + (F.col("id") * 13 + 5) % 37).alias("dst"),
    )
    edges = (
        e1.unionAll(e2)
        .crossJoin(F.broadcast(nn))
        .filter(F.col("dst") < F.col("n"))
        .select("src", "dst", (1 + F.col("src") % 9).alias("w"))
    )
    line = F.concat(
        F.lit("  n"),
        F.col("src").cast("string"),
        F.lit(" -> n"),
        F.col("dst").cast("string"),
        F.lit(" [weight="),
        F.col("w").cast("string"),
        F.lit("];"),
    )
    hdr = edges.sparkSession.createDataFrame(
        [("digraph dags {",), ("  rankdir=LR;",), ("}",)], "value string"
    )
    path = tempfile.mkdtemp(prefix="dags_dot_") + "/data"
    edges.select(line.alias("value")).unionAll(hdr).write.mode(
        "overwrite"
    ).text(path)
    raw = spark.read.text(path)
    rx = r"^\s*n([0-9]+) -> n([0-9]+) \[weight=([0-9]+)\];$"
    parsed = raw.select(
        F.regexp_extract("value", rx, 1).alias("src_s"),
        F.regexp_extract("value", rx, 2).alias("dst_s"),
        F.regexp_extract("value", rx, 3).alias("w_s"),
    ).filter(F.col("src_s") != "")
    p = parsed.select(
        F.col("src_s").cast("bigint").alias("src"),
        F.col("dst_s").cast("bigint").alias("dst"),
        F.col("w_s").cast("bigint").alias("w"),
    )
    return p.groupBy((F.col("src") % 50).cast("bigint").alias("src_bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        F.sum("w").cast("bigint").alias("weight_sum"),
        F.countDistinct("dst").cast("bigint").alias("n_targets"),
        F.max("dst").cast("bigint").alias("max_dst"),
    )
