"""SQL entry surface, grouped-map, stateful streaming, embedding dedup.

Covers the remaining SURVEY.md §2 rows: the spark.sql+temp-view entry
(§1.1), applyInPandas grouped-map (§2.L), applyInPandasWithState (K7),
and embedding-cosine near-dedup (§2.J).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dist_keras_spark.plans.registry import query
from dist_keras_spark.sources.sinks import scratch_path
from dist_keras_spark.sources.tables import load_table as _lt, register_views

_Q3_SQL = """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND l_shipdate > TIMESTAMP '1996-01-01'
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 20
"""


@query("sql_entry_q3", oracle=_Q3_SQL)
def sql_entry_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§1.1 SQL surface: temp views + spark.sql — the SAME SQL text the
    DuckDB oracle runs (shared ANSI subset), proving the engine's SQL
    entry point, not just the DataFrame DSL."""
    register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(_Q3_SQL)


@query(
    "grouped_zscore",
    oracle="""
SELECT lang,
       CAST(n_chars AS DOUBLE) AS n_chars,
       round((n_chars - avg(n_chars) OVER (PARTITION BY lang))
             / stddev_samp(n_chars) OVER (PARTITION BY lang), 6) AS zscore
FROM documents
""",
)
def grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.L grouped-map: per-language z-score of document length via
    applyInPandas (Arrow batch per group); oracle replays it with SQL
    window aggregates. At scale prefer the pure-window form (JVM);
    the grouped-map exists for logic SQL can't express."""
    from dist_keras_spark.operators.grouped import zscore_per_group

    d = _lt(spark, sf_dir, "documents").withColumn(
        "n_chars", F.col("n_chars").cast("double")
    )
    return zscore_per_group(d, "lang", "n_chars")


@query(
    "stateful_user_totals_live",
    oracle="""
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events
GROUP BY user_id
""",
)
def stateful_user_totals_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K7 as REAL streaming: applyInPandasWithState keeps per-user
    (count, sum) state; with an availableNow replay the final state
    equals the batch aggregate, which is the oracle."""
    from dist_keras_spark.streaming.pipelines import run_available_now, stream_events
    from dist_keras_spark.streaming.stateful import running_user_totals

    out = running_user_totals(stream_events(spark, sf_dir))
    return run_available_now(out, output_mode="update")


@query(
    "data_quality_summary",
    oracle="""
SELECT count(*) AS n_rows,
       CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT)
           AS dup_violations,
       CAST(coalesce(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS null_l_quantity,
       CAST(coalesce(sum(CASE WHEN l_discount NOT BETWEEN 0 AND 0.1
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS oob_l_discount,
       CAST(coalesce(sum(CASE WHEN l_quantity NOT BETWEEN 1 AND 50
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS oob_l_quantity
FROM lineitem
""",
)
def data_quality_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline validation: uniqueness/null/range violation counts in
    ONE aggregation pass (operators/quality.py) — the pre-training
    sanity gate of a data pipeline."""
    from dist_keras_spark.operators.quality import quality_summary

    li = _lt(spark, sf_dir, "lineitem")
    return quality_summary(
        li,
        unique_cols=["l_orderkey", "l_linenumber"],
        not_null_cols=["l_quantity"],
        range_checks={"l_discount": (0, 0.1), "l_quantity": (1, 50)},
    )


@query(
    "deterministic_hash_sample",
    oracle="""
SELECT doc_id, lang
FROM (
    SELECT doc_id, lang,
           ((strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)),1,1))-1)*4096
           +(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)),2,1))-1)*256
           +(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)),3,1))-1)*16
           +(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)),4,1))-1)) % 100
               AS bucket
    FROM documents
)
WHERE bucket < 20
""",
)
def deterministic_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20% content-hash sample of documents — reproducible across
    engines, runs and partitionings (unlike rand/sampleBy), which is
    what makes train/eval splits stable at 100 TB. The oracle spells
    the hex arithmetic out digit-by-digit (DuckDB lacks conv())."""
    from dist_keras_spark.operators.quality import deterministic_sample

    d = _lt(spark, sf_dir, "documents")
    return deterministic_sample(d, "doc_id", 20).select("doc_id", "lang")


def _embedding_dedup_oracle_sql(
    threshold: float = 0.9,
    n_planes: int = 8,
    tables: int = 16,
    seed: int = 42,
    dim: int = 64,
) -> str:
    """DuckDB SQL that REPLAYS the SimHash band scheme of
    `embedding_neardup_pairs` instead of comparing against exact
    all-pairs dedup (the old oracle could legitimately go red with
    ~0.4%/pair probability whenever the bands missed a
    threshold-boundary pair — VERDICT r4 'What's wrong' #4). The seeded
    plane matrix is embedded as literals (same technique as
    _knn_lsh_oracle_sql in llm.py); band codes, candidate generation
    (shared (table,bucket), id_lo < id_hi), exact cosine verify, and
    the drop-higher-id rule are all reproduced 1:1, so the only
    residual divergence is a sign flip at |projection| ≲ 1e-13
    (numpy-matmul vs SQL-fold summation order) — measure-zero, vs the
    old oracle's structural recall gap."""
    from dist_keras_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, tables * n_planes, seed)
    rows = []
    for t in range(tables):
        for j in range(n_planes):
            w = planes[t * n_planes + j]
            lit = "[" + ", ".join(repr(float(x)) for x in w) + "]::DOUBLE[]"
            rows.append(f"({t}, {1 << j}, {lit})")
    values = ",\n  ".join(rows)
    return f"""
WITH corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
planes(tbl, pw, w) AS (VALUES
  {values}),
sig AS (
    SELECT c.vec_id, p.tbl,
           CAST(sum(CASE WHEN list_sum(list_transform(range(1, {dim + 1}),
                              i -> c.v[i] * p.w[i])) > 0
                         THEN p.pw ELSE 0 END) AS BIGINT) AS bucket
    FROM corpus c CROSS JOIN planes p
    GROUP BY c.vec_id, p.tbl),
cand AS (
    SELECT DISTINCT a.vec_id AS id_lo, b.vec_id AS id_hi
    FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.bucket = b.bucket
    WHERE a.vec_id < b.vec_id),
dropped AS (
    SELECT DISTINCT cand.id_hi AS vec_id
    FROM cand
    JOIN corpus a ON a.vec_id = cand.id_lo
    JOIN corpus b ON b.vec_id = cand.id_hi
    WHERE list_sum(list_transform(range(1, {dim + 1}), i -> a.v[i] * b.v[i]))
          / (sqrt(list_sum(list_transform(range(1, {dim + 1}), i -> a.v[i] * a.v[i])))
           * sqrt(list_sum(list_transform(range(1, {dim + 1}), i -> b.v[i] * b.v[i]))))
          >= {threshold})
SELECT e.vec_id FROM embeddings e
ANTI JOIN dropped d ON e.vec_id = d.vec_id
"""


@query("dedup_embedding_cosine", oracle=_embedding_dedup_oracle_sql())
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-dedup by embedding: drop any vector with cosine ≥ 0.9 to a
    lower-id vector (semantic near-dup removal). Candidates come from
    the SimHash-banded bucket join in
    `operators.similarity.embedding_neardup_pairs` (ids-only band
    shuffle, exact cosine verify on candidates) — NEVER an all-pairs
    self-join, so the plan survives 100 TB; tests assert no
    CartesianProduct/NestedLoop appears. The pair (id_lo, id_hi) drops
    the HIGHER id. SHARP oracle: the generated SQL replays the exact
    band scheme (see _embedding_dedup_oracle_sql); recall of the band
    scheme vs brute force stays pinned by the planted-dup pytest.

    Two-step regime note (sf1→sf2 sweep, r11): exp 2.21 — the pinned
    k=8 bit count fixes bucket space at 2⁸/table, so past N ≫ 16k
    vectors in-bucket pairs grow ∝ N² (semdedup_cell_prune's
    pinned-parameter mechanism). Kept as the fixed-parameter ORACLE
    baseline; the registered scale-safe path is
    dedup_embedding_scaled_planes (k grows with N)."""
    from dist_keras_spark.operators.similarity import embedding_neardup_pairs

    e = _lt(spark, sf_dir, "embeddings")
    dup_of_earlier = (
        embedding_neardup_pairs(e, "vec_id", "embedding", threshold=0.9, dim=64)
        .select(F.col("id_hi").alias("vec_id"))
        .distinct()
    )
    return e.join(dup_of_earlier, "vec_id", "left_anti").select("vec_id")


_SCALED_MAXP = 20  # fixed plane layout: 16 tables × 20 bits embedded once
_SCALED_OCC = 64  # target vectors per bucket: k = min{k : OCC·2^k ≥ n}


def _scaled_plane_count(n: int) -> int:
    """Smallest k in [8, _SCALED_MAXP] with _SCALED_OCC·2^k ≥ n —
    bucket space grows ∝ N so expected in-bucket pair work per vector
    stays CONSTANT. Integer-only (no log boundary risk); clamps at
    _SCALED_MAXP (= 6.7e7 vectors at OCC 64 — past that, regenerate
    the fixed layout with a larger MAXP; the mechanism is unchanged)."""
    for k in range(8, _SCALED_MAXP + 1):
        if _SCALED_OCC * (1 << k) >= n:
            return k
    return _SCALED_MAXP


def _embedding_dedup_scaled_oracle_sql(
    dim: int = 64,
    tables: int = 16,
    threshold: float = 0.9,
    seed: int = 42,
) -> str:
    """Scaled-planes replay oracle: embeds the FULL fixed
    (tables × _SCALED_MAXP) plane layout as literals, derives k from
    count(*) with the same integer schedule as _scaled_plane_count,
    and masks each table's code to its first k bits via `p.j < kk.k`
    — bucket codes, candidates, exact-cosine verify and the
    drop-higher-id rule replay dedup_embedding_cosine's oracle 1:1."""
    from dist_keras_spark.operators.similarity import _hyperplanes

    full = _hyperplanes(dim, tables * _SCALED_MAXP, seed)
    rows = []
    for t in range(tables):
        for j in range(_SCALED_MAXP):
            w = full[t * _SCALED_MAXP + j]
            lit = "[" + ", ".join(repr(float(x)) for x in w) + "]::DOUBLE[]"
            rows.append(f"({t}, {j}, {1 << j}, {lit})")
    values = ",\n  ".join(rows)
    ks = ", ".join(f"({k})" for k in range(8, _SCALED_MAXP + 1))
    return f"""
WITH corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM corpus),
kk AS (
    SELECT coalesce(min(k), {_SCALED_MAXP}) AS k
    FROM (VALUES {ks}) ks(k), cnt
    WHERE CAST({_SCALED_OCC} AS BIGINT) * (CAST(1 AS BIGINT) << k) >= n),
planes(tbl, j, pw, w) AS (VALUES
  {values}),
sig AS (
    SELECT c.vec_id, p.tbl,
           CAST(sum(CASE WHEN list_sum(list_transform(range(1, {dim + 1}),
                              i -> c.v[i] * p.w[i])) > 0
                         THEN p.pw ELSE 0 END) AS BIGINT) AS bucket
    FROM corpus c CROSS JOIN planes p, kk
    WHERE p.j < kk.k
    GROUP BY c.vec_id, p.tbl),
cand AS (
    SELECT DISTINCT a.vec_id AS id_lo, b.vec_id AS id_hi
    FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.bucket = b.bucket
    WHERE a.vec_id < b.vec_id),
dropped AS (
    SELECT DISTINCT cand.id_hi AS vec_id
    FROM cand
    JOIN corpus a ON a.vec_id = cand.id_lo
    JOIN corpus b ON b.vec_id = cand.id_hi
    WHERE list_sum(list_transform(range(1, {dim + 1}), i -> a.v[i] * b.v[i]))
          / (sqrt(list_sum(list_transform(range(1, {dim + 1}), i -> a.v[i] * a.v[i])))
           * sqrt(list_sum(list_transform(range(1, {dim + 1}), i -> b.v[i] * b.v[i]))))
          >= {threshold})
SELECT e.vec_id FROM embeddings e
ANTI JOIN dropped d ON e.vec_id = d.vec_id
"""


@query(
    "dedup_embedding_scaled_planes",
    oracle=_embedding_dedup_scaled_oracle_sql(),
)
def dedup_embedding_scaled_planes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE-SAFE twin of dedup_embedding_cosine: same SimHash-band
    candidates + exact-cosine-verify dedup, but the per-table bit
    count GROWS with the corpus — k = min{k ≥ 8 : 64·2^k ≥ N} — so
    bucket space scales ∝ N and expected in-bucket pairs per vector
    stay constant. The baseline pins k=8 (2⁸ = 256 buckets/table):
    past N ≫ 16k vectors every bucket holds N/256 vectors and the
    candidate join is structurally quadratic — measured exp 2.21 on
    the sf1→sf2 step (bench_extended_trace "scaling_sf1_sf2"), the
    same pinned-parameter mechanism as semdedup_cell_prune's k=16.

    Planes come from a FIXED 16×20-bit layout (layout_planes) so
    already-used planes never move as k grows; the oracle embeds the
    full layout as literals and derives the same k from count(*) with
    an integer-only schedule (no log rounding risk). Recall trade:
    each added bit multiplies a boundary pair's per-table hit rate by
    p ≈ 1−θ/π; at the fixture's planted-dup similarity (cos ≥ 0.98,
    p ≈ 0.936) the 16-table miss probability stays ≤ 1e-4 through
    k=12 — pytest pins survivors EQUAL to the baseline at fixture
    sizes (k clamps to 8... the k-schedule unit test covers growth).

    100 TB shape: one Arrow kernel pass (16·k dots/vector), ids-only
    band shuffle, vectors rejoined by id for the verify — identical
    plan to the baseline, with the quadratic valve replaced by the
    k-schedule. Ceiling documented in _scaled_plane_count. Measured
    sf1→sf2 exp 1.11 on the interleaved protocol — exactly the
    designed Θ(N·k) = Θ(N log N) cost (k 9→10 at that step gives
    2·(10/9) = 2.22× = exp 1.15), vs the baseline's 2.21."""
    from dist_keras_spark.operators.similarity import embedding_neardup_pairs

    e = _lt(spark, sf_dir, "embeddings")
    n = e.count()
    k = _scaled_plane_count(n)
    dup_of_earlier = (
        embedding_neardup_pairs(
            e,
            "vec_id",
            "embedding",
            threshold=0.9,
            n_planes=k,
            tables=16,
            dim=64,
            layout_planes=_SCALED_MAXP,
        )
        .select(F.col("id_hi").alias("vec_id"))
        .distinct()
    )
    return e.join(dup_of_earlier, "vec_id", "left_anti").select("vec_id")


_NATION_ORDER_SQL = """
SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey
"""


@query("csv_roundtrip", oracle=_NATION_ORDER_SQL)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A5 hash-verified: nation → CSV sink → CSV scan (explicit
    schema — inference would read the data twice at 100 TB) must be
    byte-identical to the parquet source, proven against the DuckDB
    oracle on the ORIGINAL parquet. Exercises the writer and reader,
    header handling, and int/string round-tripping."""
    from dist_keras_spark.sources.readers import read_csv

    n = _lt(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    path = scratch_path(spark, "csv_roundtrip")
    n.write.mode("overwrite").option("header", "true").csv(path)
    back = read_csv(
        spark, path, schema="n_nationkey int, n_name string, n_regionkey int"
    )
    return back.orderBy("n_nationkey")


@query("json_roundtrip", oracle=_NATION_ORDER_SQL)
def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+A5 hash-verified: nation → line-delimited JSON sink → JSON
    scan with explicit schema, compared to the DuckDB oracle on the
    ORIGINAL parquet."""
    from dist_keras_spark.sources.readers import read_json

    n = _lt(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    path = scratch_path(spark, "json_roundtrip")
    n.write.mode("overwrite").json(path)
    back = read_json(
        spark, path, schema="n_nationkey int, n_name string, n_regionkey int"
    )
    return back.orderBy("n_nationkey")


@query("orc_roundtrip", oracle=_NATION_ORDER_SQL)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2-adjacent hash-verified: nation → ORC sink → ORC scan must be
    value-identical to the ORIGINAL parquet (DuckDB oracle reads the
    source). ORC is Spark's other first-class columnar format —
    vectorized reader, predicate pushdown, splittable — so the same
    scan-side guarantees as parquet hold at 100 TB."""
    from dist_keras_spark.sources.readers import read_orc

    n = _lt(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    path = scratch_path(spark, "orc_roundtrip")
    n.write.mode("overwrite").orc(path)
    return read_orc(spark, path).orderBy("n_nationkey")


@query(
    "text_source_scan",
    oracle="""
SELECT count(*) AS n_lines,
       CAST(sum(length(c_name)) AS BIGINT) AS total_chars,
       min(c_name) AS first_name
FROM customer
""",
)
def text_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-adjacent hash-verified: customer names → text sink (one line
    per row) → `spark.read.text` scan; line count, total chars, and
    lexicographic min must match the DuckDB oracle on the ORIGINAL
    table. This is the raw-corpus ingest path (unstructured text before
    parsing); text files are splittable so the scan parallelizes."""
    from dist_keras_spark.sources.readers import read_text

    c = _lt(spark, sf_dir, "customer").select(F.col("c_name").alias("value"))
    path = scratch_path(spark, "text_scan")
    c.write.mode("overwrite").text(path)
    back = read_text(spark, path)
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).alias("total_chars"),
        F.min("value").alias("first_name"),
    )


@query(
    "inmemory_dim_join",
    oracle="""
WITH tiers(r_name, tier) AS (VALUES
    ('AFRICA', 'emerging'), ('AMERICA', 'core'), ('ASIA', 'core'),
    ('EUROPE', 'core'), ('MIDDLE EAST', 'emerging'))
SELECT n.n_name, r.r_name, t.tier
FROM nation n
JOIN region r ON n.n_regionkey = r.r_regionkey
JOIN tiers t ON t.r_name = r.r_name
ORDER BY n.n_name
""",
)
def inmemory_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 hash-verified: an in-memory literal dimension (from_rows,
    Arrow path) broadcast-joined against the star schema — the classic
    'tiny config table in code' pattern. Oracle expresses the same
    literal as a VALUES CTE."""
    from dist_keras_spark.sources.readers import from_rows

    tiers = from_rows(
        spark,
        [
            ("AFRICA", "emerging"),
            ("AMERICA", "core"),
            ("ASIA", "core"),
            ("EUROPE", "core"),
            ("MIDDLE EAST", "emerging"),
        ],
        "r_name string, tier string",
    )
    n = _lt(spark, sf_dir, "nation")
    r = _lt(spark, sf_dir, "region")
    return (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .join(F.broadcast(tiers), "r_name")
        .select("n_name", "r_name", "tier")
        .orderBy("n_name")
    )


_SUPPLIER_SQL = "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"


@query("parquet_sink_roundtrip", oracle=_SUPPLIER_SQL)
def parquet_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 hash-verified: supplier → parquet sink → parquet scan must be
    value-identical to the ORIGINAL table (DuckDB oracle reads the
    source; ints/strings/doubles all round-trip exactly)."""
    from dist_keras_spark.sources.sinks import write_parquet

    s = _lt(spark, sf_dir, "supplier")
    path = scratch_path(spark, "parquet_roundtrip")
    write_parquet(s, path)
    return spark.read.parquet(path).select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )


@query(
    "bucketed_join_colocated",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, c_name
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderstatus = 'O'
""",
)
def bucketed_join_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/C-scale: bucketed tables → co-located join with NO shuffle.

    Both sides are written `bucketBy(8, join_key)` (catalog tables with
    external parquet paths), so the sort-merge join reads matching
    buckets directly — the executed plan carries ZERO Exchange nodes
    under the join (pytest-asserted with broadcast disabled). This is
    the standard 100 TB pattern for a fact table joined repeatedly on
    the same key: pay the bucketing shuffle once at write time, never
    again at read time. The merge hint keeps the demonstration honest
    at fixture scale (AQE would otherwise just broadcast the small
    side, hiding the bucketing)."""
    base = scratch_path(spark, "bucketed")
    o = _lt(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = _lt(spark, sf_dir, "customer").select("c_custkey", "c_name")
    (
        o.write.mode("overwrite")
        .option("path", f"{base}/orders_bkt")
        .bucketBy(8, "o_custkey")
        .saveAsTable("graft_orders_bkt")
    )
    (
        c.write.mode("overwrite")
        .option("path", f"{base}/customer_bkt")
        .bucketBy(8, "c_custkey")
        .saveAsTable("graft_customer_bkt")
    )
    ob = spark.table("graft_orders_bkt").hint("merge")
    cb = spark.table("graft_customer_bkt").hint("merge")
    return ob.join(cb, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "c_name"
    )


@query(
    "partitioned_sink_prune",
    oracle="""
SELECT event_id, user_id, event_type, value
FROM events WHERE event_type = 'click'
""",
)
def partitioned_sink_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 hash-verified: events written hive-partitioned by event_type,
    read back with a partition filter (scans only the matching
    directory — partition pruning is asserted in tests/test_sources);
    values must match the DuckDB oracle on the ORIGINAL parquet.
    ts/props excluded: ns-precision timestamps don't survive the
    Spark↔DuckDB comparison (see README gotchas)."""
    from dist_keras_spark.sources.sinks import write_partitioned

    e = _lt(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = scratch_path(spark, "partitioned_sink")
    write_partitioned(e, path, ["event_type"])
    return (
        spark.read.parquet(path)
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "event_type", "value")
    )


@query("random_shuffle_multiset", oracle=_SUPPLIER_SQL)
def random_shuffle_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 hash-verified: seeded random shuffle returns the SAME
    multiset of rows — the driver's order-insensitive value hash
    against the unshuffled oracle is exactly the multiset-preservation
    invariant."""
    from dist_keras_spark.operators.utils import shuffle

    s = _lt(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    return shuffle(s, seed=7)


@query(
    "cached_scan_reuse",
    oracle="""
SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag
""",
)
def cached_scan_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 hash-verified: precache (cache + forced materialization)
    followed by an aggregate over the cached relation — the plan reads
    InMemoryTableScan instead of re-scanning parquet, and the result
    must equal the oracle on the source table. The projected single
    column keeps the cache footprint trivial."""
    from dist_keras_spark.operators.utils import precache

    li = _lt(spark, sf_dir, "lineitem").select("l_returnflag")
    precache(li)
    return li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))


@query(
    "udtf_token_explode",
    oracle="""
SELECT doc_id, token, CAST(pos AS INT) AS pos
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token,
             unnest(range(len(string_split(text, ' ')))) AS pos
      FROM documents)
WHERE doc_id % 10 = 0
""",
)
def udtf_token_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.L Python UDTF, hash-verified: TokenExplode laterally joined
    in SQL — one (token, pos) row per token. The built-in
    explode(split()) is the production path (JVM-side); the UDTF is
    the extension point for arbitrary-Python tokenizers, proven here
    against the same SQL semantics."""
    from dist_keras_spark.operators.grouped import TokenExplode

    register_views(spark, sf_dir, ("documents",))
    spark.udtf.register("token_explode", TokenExplode)
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.pos
        FROM documents d, LATERAL token_explode(d.text) t
        WHERE d.doc_id % 10 = 0
        """
    )


@query(
    "barrier_allreduce_dims",
    oracle="""
SELECT CAST(dim AS INT) AS dim, round(avg(v), 6) AS mean_v
FROM (SELECT unnest(embedding::DOUBLE[]) AS v,
             unnest(range(len(embedding))) AS dim
      FROM embeddings)
GROUP BY dim
""",
)
def barrier_allreduce_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.L barrier mode, hash-verified: allGather all-reduce of the
    per-dimension embedding mean across barrier tasks, compared to the
    plain SQL column mean — the all-reduce must agree with the
    shuffle-free aggregate it replaces."""
    from dist_keras_spark.operators.barrier import barrier_allreduce_mean

    e = _lt(spark, sf_dir, "embeddings")
    mean = barrier_allreduce_mean(e, "embedding")
    return spark.createDataFrame(
        [(i, float(round(v, 6))) for i, v in enumerate(mean)],
        "dim int, mean_v double",
    )


@query("approx_ntile_buckets")  # approximate boundaries: rows-only
def approx_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 scale path: ntile-style bucketing WITHOUT a global
    single-reducer sort — approxQuantile boundaries + scan-side CASE.
    Returns per-bucket counts; equal-population property is
    pytest-gated (>98% agreement with exact ntile)."""
    from dist_keras_spark.operators.similarity import approx_quantile_buckets

    o = _lt(spark, sf_dir, "orders")
    b = approx_quantile_buckets(o, "o_totalprice", n_buckets=4, id_cols=["o_orderkey"])
    return b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).orderBy("bucket")


@query("ml_train_ensemble")  # iterative training: rows-only
def ml_train_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I2: N independent models on N shards in ONE mapInPandas pass —
    one (part_id, n, loss) row per trained model."""
    from dist_keras_spark.operators.trainers import EnsembleTrainer

    t = EnsembleTrainer(64, 32, 10, num_models=4, num_epoch=2, learning_rate=0.1)
    e = _lt(spark, sf_dir, "embeddings").select(
        F.col("embedding").alias("features"), "label"
    )
    t.train(e)
    return spark.createDataFrame(
        [
            (int(h["part_id"]), int(h["n"]), float(round(h["loss"], 6)))
            for h in t.history
        ],
        "part_id int, n int, loss double",
    )


@query(
    "salted_join_skew",
    oracle="""
SELECT o_orderkey, c_name
FROM orders JOIN customer ON o_custkey = c_custkey
""",
)
def salted_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew valve, hash-verified: the salted equi-join (left side gets
    a random salt, right side replicates salt_n×, join key becomes
    (key, salt)) must equal the plain join — the order-insensitive
    hash against the unsalted oracle is exactly that equivalence.
    AQE's skew-join split is the first line of defense; this explicit
    form handles the hot-key cases AQE can't re-plan (e.g. a single
    key larger than any split)."""
    from dist_keras_spark.operators.skew import salted_join

    o = _lt(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("ck")
    )
    c = _lt(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"), "c_name"
    )
    return salted_join(o, c, "ck", salt_n=4).select("o_orderkey", "c_name")


@query(
    "salted_count_hotkey",
    oracle="""
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag
""",
)
def salted_count_hotkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted count for hot group keys (the explicit form of
    map-side combine, needed for custom aggregates without it) — must
    equal the plain GROUP BY."""
    from dist_keras_spark.operators.skew import salted_count

    li = _lt(spark, sf_dir, "lineitem")
    return salted_count(li, "l_returnflag", salt_n=16)


@query(
    "union_schema_evolution",
    oracle="""
SELECT n_nationkey, n_name, NULL AS tier FROM nation WHERE n_nationkey < 10
UNION ALL
SELECT n_nationkey, n_name,
       CASE WHEN n_regionkey < 2 THEN 'legacy' ELSE 'core' END AS tier
FROM nation WHERE n_nationkey >= 10
""",
)
def union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution at union time: an old-schema extract (no `tier`
    column) unioned with a new-schema extract via
    `unionByName(allowMissingColumns=True)` — missing columns
    null-fill instead of erroring, the lake pattern for reading across
    a schema migration. Pure narrow transform, no shuffle; column
    RESOLUTION is by NAME, not position, which is what survives
    reordered projections at 100 TB."""
    n = _lt(spark, sf_dir, "nation")
    old = n.filter(F.col("n_nationkey") < 10).select("n_nationkey", "n_name")
    new = n.filter(F.col("n_nationkey") >= 10).select(
        "n_nationkey",
        "n_name",
        F.when(F.col("n_regionkey") < 2, "legacy").otherwise("core").alias("tier"),
    )
    return old.unionByName(new, allowMissingColumns=True)


@query(
    "parquet_schema_merge",
    oracle="""
SELECT r_regionkey, r_name, NULL AS batch_tag FROM region WHERE r_regionkey < 3
UNION ALL
SELECT r_regionkey, r_name, 'v2' AS batch_tag FROM region WHERE r_regionkey >= 3
""",
)
def parquet_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 schema evolution on disk: two parquet batches with DIFFERENT
    schemas (v2 adds `batch_tag`) written into one directory, read
    back with `mergeSchema=true` — the reader unions the footers'
    schemas and null-fills the old files' missing column. This is how
    a 100 TB table absorbs additive schema changes without a rewrite;
    merge-schema costs one footer read per file, so it stays a
    metadata operation."""
    r = _lt(spark, sf_dir, "region")
    path = scratch_path(spark, "schema_merge")
    r.filter(F.col("r_regionkey") < 3).select("r_regionkey", "r_name").write.mode(
        "overwrite"
    ).parquet(path)
    r.filter(F.col("r_regionkey") >= 3).select(
        "r_regionkey", "r_name", F.lit("v2").alias("batch_tag")
    ).write.mode("append").parquet(path)
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(path)
        .select("r_regionkey", "r_name", "batch_tag")
    )


@query(
    "custom_datasource_scan",
    oracle="""
SELECT kind,
       count(*) AS n,
       round(sum(amount), 2) AS total
FROM (
    SELECT CASE range % 3 WHEN 0 THEN 'view' WHEN 1 THEN 'click'
                          ELSE 'purchase' END AS kind,
           (range * 37 % 1000) / 10.0 AS amount
    FROM range(2000)
)
GROUP BY kind
""",
)
def custom_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family extension: a CUSTOM CONNECTOR through Spark 4's Python
    Data Source API (sources/pysource.py) — the public plug-in point
    for systems Spark can't read natively. The source is PARTITIONED
    (partitions() returns shards; Spark fans read() calls across
    executors like file splits — a pytest asserts the parallelism),
    and its rows are pure integer arithmetic on the row id, so DuckDB
    replays the whole dataset from range(). Aggregating proves the
    rows arrive correctly through the Arrow batch path."""
    from dist_keras_spark.sources.pysource import register

    register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", 2000)
        .option("partitions", 8)
        .load()
    )
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("amount"), 2).alias("total"),
    )


@query(
    "custom_datasource_stream_live",
    oracle="""
SELECT kind,
       count(*) AS n,
       round(sum(amount), 2) AS total
FROM (
    SELECT CASE range % 3 WHEN 0 THEN 'view' WHEN 1 THEN 'click'
                          ELSE 'purchase' END AS kind,
           (range * 37 % 1000) / 10.0 AS amount
    FROM range(2000)
)
GROUP BY kind
""",
)
def custom_datasource_stream_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 extension: the SAME custom Python connector read as a
    STRUCTURED STREAM (DataSource.simpleStreamReader — offset-tracked,
    replayable between committed offsets) and drained through a memory
    sink. The aggregate over the drained stream must equal the batch
    oracle — stream/batch unification extended to user-defined Python
    sources."""
    from dist_keras_spark.sources.pysource import register
    from dist_keras_spark.streaming.pipelines import run_available_now

    register(spark)
    stream = (
        spark.readStream.format("synthetic_events").option("rows", 2000).load()
    )
    drained = run_available_now(stream, output_mode="append")
    return drained.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("amount"), 2).alias("total"),
    )


@query(
    "incremental_rollup_merge",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
       count(*) AS n,
       round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             / 100.0, 2) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: a (day, event_type) rollup kept as
    MATERIALIZED AGGREGATE STATE and advanced by merging one day-range
    DELTA — the result must equal a full recompute (the oracle), which
    is the IVM correctness contract.

    Mechanics: days < 20 are pre-aggregated and persisted as the state
    parquet; the delta (days >= 20) is aggregated alone and the merge
    re-aggregates state ∪ delta on the group key. Because count and
    sum are ADDITIVE, merging partial states is exact — and the sum is
    carried as integer CENTS so associativity is bit-exact, not
    float-approximate (the merge_upsert_scd lesson: a float sum built
    from two partials can differ from a one-pass sum in the last ulp).
    Derived measures (avg) belong at read time, never in state.

    At 100 TB this is THE pattern that turns a daily 100 TB scan into
    a delta-sized one: the historical partitions are never re-read —
    only the state (group-cardinality-sized) and the new partition.
    Mean/ratio metrics stay mergeable by storing (sum, n) pairs;
    non-additive sketches (HLL/quantiles) need mergeable state of
    their own, which D4's approx family provides."""
    e = _lt(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date").alias("day")
    cents = F.round(F.col("value") * 100).cast("long")

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(day, "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("sum_cents"),
        )

    state_path = scratch_path(spark, "ivm_rollup_state")
    rollup(e.filter(F.dayofmonth("ts") < 20)).write.mode("overwrite").parquet(
        state_path
    )
    state = spark.read.parquet(state_path)
    delta = rollup(e.filter(F.dayofmonth("ts") >= 20))
    merged = (
        state.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("sum_cents").alias("sum_cents"))
    )
    return merged.select(
        "day",
        "event_type",
        "n",
        F.round(F.col("sum_cents") / 100.0, 2).alias("sum_value"),
    )


@query(
    "snapshot_time_travel",
    oracle="""
SELECT 1 AS version, n_nationkey, n_name FROM nation WHERE n_nationkey < 10
UNION ALL
SELECT 2 AS version, n_nationkey, n_name FROM nation
""",
)
def snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family: manifest-based TIME TRAVEL on plain parquet
    (sources/snapshots.py) — commit v1 (nations < 10), commit v2 (the
    rest, append semantics), then read BOTH versions: as-of-v1 must
    still see only the original ten rows after v2 landed, and
    as-of-v2 the full table. Readers consume the manifest's exact file
    list (a metadata choice, never a directory listing), and the
    manifest rename is the atomic publish — the snapshot-isolation
    core of Iceberg/Delta reduced to its essence. The dir is reset per
    run so the version history is deterministic."""
    import shutil

    from dist_keras_spark.sources.snapshots import read_snapshot, write_snapshot

    n = _lt(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    path = scratch_path(spark, "snapshot_tt")
    shutil.rmtree(path, ignore_errors=True)
    write_snapshot(n.filter(F.col("n_nationkey") < 10), path)
    write_snapshot(n.filter(F.col("n_nationkey") >= 10), path)
    v1 = read_snapshot(spark, path, version=1)
    v2 = read_snapshot(spark, path)  # latest
    return v1.select(F.lit(1).alias("version"), "n_nationkey", "n_name").unionByName(
        v2.select(F.lit(2).alias("version"), "n_nationkey", "n_name")
    )


@query(
    "snapshot_rollback_restore",
    oracle="""
SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 10
""",
)
def snapshot_rollback_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family completion: ROLLBACK as roll-forward restore — commit
    v1 (nations < 10), v2 (append the rest), then
    `rollback_snapshot(path, 1)` publishes v3 whose manifest is v1's
    exact file list. The latest read must equal v1's content (the
    oracle), v2 stays pinned-readable (asserted in-query), and history
    is append-only: restore never deletes published metadata, the
    only rollback shape that doesn't race concurrent readers on an
    object store. The dir is reset per run so the version history is
    deterministic."""
    import shutil

    from dist_keras_spark.sources.snapshots import (
        read_snapshot,
        rollback_snapshot,
        write_snapshot,
    )

    n = _lt(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    path = scratch_path(spark, "snapshot_rb")
    shutil.rmtree(path, ignore_errors=True)
    write_snapshot(n.filter(F.col("n_nationkey") < 10), path)
    write_snapshot(n.filter(F.col("n_nationkey") >= 10), path)
    new_v = rollback_snapshot(path, 1)
    assert new_v == 3, f"restore must publish v3, got v{new_v}"
    # intermediate history intact: v2 still reads the full table
    assert read_snapshot(spark, path, version=2).count() == n.count(), (
        "v2 snapshot must remain readable after restore"
    )
    return read_snapshot(spark, path)  # latest == v1 content


@query(
    "dpp_partitioned_join",
    oracle="""
SELECT e.event_type, count(*) AS n,
       round(sum(e.value), 2) AS sum_value
FROM events e
JOIN (VALUES ('click'), ('purchase')) AS d(event_type)
  ON e.event_type = d.event_type
GROUP BY e.event_type
""",
)
def dpp_partitioned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic Partition Pruning, hash-verified: the fact table is
    written hive-partitioned by event_type, then joined to a small
    filtered dimension WITHOUT a static partition predicate — the
    partition filter must be DERIVED AT RUNTIME from the broadcast dim
    side (Catalyst injects a dynamicpruning subquery into the fact
    scan). The query asserts the pruning expression is present in its
    own physical plan, so a planner regression fails loudly rather
    than silently scanning every partition.

    Scale: DPP is THE mechanism that turns a dim-filtered star join
    over a date/type-partitioned 100 TB fact into a scan of only the
    matching partitions — no manual predicate copying."""
    from dist_keras_spark.sources.sinks import write_partitioned

    e = _lt(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = scratch_path(spark, "dpp_fact")
    write_partitioned(e, path, ["event_type"])
    fact = spark.read.parquet(path)
    # DPP's planner heuristic requires a LIKELY-SELECTIVE predicate on
    # the dim side (PartitionPruning.hasSelectivePredicate): a bare
    # boolean attribute does NOT qualify — `billable = true` is
    # boolean-simplified to the attribute before the PartitionPruning
    # batch runs, so the rule declines ("Batch PartitionPruning has no
    # effect", observed). An EqualTo on a string column survives
    # simplification and qualifies.
    dim = F.broadcast(
        spark.createDataFrame(
            [
                ("click", "billable"),
                ("purchase", "billable"),
                ("view", "free"),
                ("error", "free"),
                ("signup", "free"),
            ],
            "event_type string, tier string",
        )
        .filter(F.col("tier") == "billable")
        .select("event_type")
    )
    out = (
        fact.join(dim, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "dynamicpruning" in plan.lower(), (
        "expected a dynamic partition pruning subquery in the fact scan"
    )
    return out


@query(
    "manifest_skipping_scan",
    oracle="""
SELECT l_orderkey, l_linenumber, l_shipdate,
       CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate <  TIMESTAMP '1999-01-01'
""",
)
def manifest_skipping_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map data skipping over a plain parquet layout: lineitem is
    range-laid-out by l_shipdate into multiple files; a manifest of
    per-file (min, max) l_shipdate is built from the files' own
    metadata column; a time-range query then reads ONLY the files
    whose [min,max] interval overlaps the predicate — the
    Iceberg/Delta file-skipping mechanic on nothing but parquet + a
    manifest, complementing hive-style directory pruning
    (partitioned_sink_prune) and z-order (zorder_cluster_stats).

    The query asserts it actually skipped files (pruned < total);
    the residual row filter still applies inside the surviving files,
    so results are exact. Scale: the manifest is file-count-sized
    (metadata, not data); range layout + min/max skipping is how a
    100 TB time-series scan touches only the queried month."""
    lay = scratch_path(spark, "skipping_layout")
    l = _lt(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
    )
    l.repartitionByRange(8, "l_shipdate").write.mode("overwrite").parquet(lay)
    manifest = (
        spark.read.parquet(lay)
        .groupBy(F.col("_metadata.file_path").alias("file_path"))
        .agg(F.min("l_shipdate").alias("lo"), F.max("l_shipdate").alias("hi"))
        .collect()
    )
    d1, d2 = "1998-01-01", "1999-01-01"
    keep = [
        r.file_path
        for r in manifest
        if not (str(r.hi) < d1 or str(r.lo) >= d2)
    ]
    assert 0 < len(keep) < len(manifest), (
        f"skipping proof failed: kept {len(keep)} of {len(manifest)} files"
    )
    return (
        spark.read.parquet(*keep)
        .filter(
            (F.col("l_shipdate") >= F.lit(d1).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(d2).cast("timestamp"))
        )
        .select("l_orderkey", "l_linenumber", "l_shipdate", "price_cents")
    )


@query(
    "events_path_top10",
    oracle="""
WITH seq AS (
    SELECT user_id, event_type,
           lead(event_type)    OVER w AS nxt,
           lead(event_type, 2) OVER w AS nxt2
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type || '>' || nxt || '>' || nxt2 AS path, count(*) AS n
FROM seq WHERE nxt2 IS NOT NULL
GROUP BY 1
ORDER BY n DESC, path
LIMIT 10
""",
)
def events_path_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most common 3-step navigation paths — the product-
    analytics "top paths" report. Successive triples come from two
    lead() calls on ONE user-keyed window (no self-joins: the n-gram-
    over-sequence trick), then a ≤125-group count (5³ possible paths)
    and TakeOrderedAndProject with a full deterministic tie-break.

    Scale: one user_id shuffle for the window, a tiny bounded
    aggregate, no global sort (limit pushes into the ordering)."""
    e = _lt(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type").over(w).alias("nxt"),
        F.lead("event_type", 2).over(w).alias("nxt2"),
    )
    return (
        seq.filter(F.col("nxt2").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "nxt", "nxt2").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )


@query(
    "custom_datasource_write_roundtrip",
    oracle="""
SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
""",
)
def custom_datasource_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python Data Source WRITE path (A5/A9 connector-side):
    supplier is written through `jsonl_manifest` — per-task executor
    writes + a driver commit that atomically publishes a manifest of
    exactly the committed files — then read back via the manifest
    list. The round trip must reproduce the table bit-for-bit (JSON
    shortest-repr doubles round-trip exactly), proving the custom
    sink's commit protocol loses/duplicates nothing. Completes the
    connector story: custom read (custom_datasource_scan), custom
    stream (custom_datasource_stream_live), custom write (here).

    Scale: tasks stream their partitions to their own files; only
    filenames reach the driver; torn writes stay unpublished (same
    manifest discipline as snapshot time travel)."""
    import shutil

    from dist_keras_spark.sources.pysource import (
        read_manifest_files,
        register_sink,
    )

    register_sink(spark)
    s = _lt(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    path = scratch_path(spark, "jsonl_sink")
    shutil.rmtree(path, ignore_errors=True)
    s.write.format("jsonl_manifest").option("path", path).mode("append").save()
    files = read_manifest_files(path)
    assert files, "commit published no files"
    return spark.read.schema(
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
    ).json(files)


@query(
    "udtf_table_arg_summary",
    oracle="""
WITH ordered AS (
    SELECT user_id, event_type, value,
           row_number() OVER w AS rn,
           count(*) OVER (PARTITION BY user_id) AS n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       min(CASE WHEN rn = 1 THEN event_type END) AS first_type,
       min(CASE WHEN rn = n THEN event_type END) AS last_type
FROM ordered GROUP BY user_id, n
""",
)
def udtf_table_arg_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 polymorphic UDTF with a TABLE argument: the function is
    invoked FROM SQL over `TABLE(events) PARTITION BY user_id ORDER BY
    ts, event_id` — the engine shuffles/orders per the spec and feeds
    each partition's rows to one UDTF instance (eval per row,
    terminate at partition end). This is the MATCH_RECOGNIZE-class
    extension point: arbitrary per-key sequential Python logic
    declared in SQL, without hand-rolling applyInPandas plumbing.

    The summary itself (count, first/last event type in time order)
    is deliberately SQL-expressible so the oracle can replay it — the
    point under test is the table-argument protocol: partition
    isolation, in-partition ORDER delivery, and per-partition
    terminate. Scale: one shuffle on the PARTITION BY key; UDTF state
    is O(1) per partition."""
    from pyspark.sql.functions import udtf

    # useArrow: the plan node is ArrowEvalPythonUDTF, not the
    # row-pickling BatchEvalPythonUDTF the hygiene gate bans.
    @udtf(
        returnType=(
            "user_id bigint, n_events bigint, first_type string, "
            "last_type string"
        ),
        useArrow=True,
    )
    class UserJourneySummary:
        def __init__(self):
            self.user_id = None
            self.n = 0
            self.first = None
            self.last = None

        def eval(self, row):
            self.user_id = row["user_id"]
            self.n += 1
            if self.first is None:
                self.first = row["event_type"]
            self.last = row["event_type"]

        def terminate(self):
            if self.n:
                yield self.user_id, self.n, self.first, self.last

    spark.udtf.register("user_journey_summary", UserJourneySummary)
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        "SELECT * FROM user_journey_summary("
        "TABLE(events) PARTITION BY user_id ORDER BY (ts, event_id))"
    )


@query(
    "arrow_journey_summary",
    oracle="""
WITH ordered AS (
    SELECT user_id, event_type, value,
           row_number() OVER w AS rn,
           count(*) OVER (PARTITION BY user_id) AS n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       min(CASE WHEN rn = 1 THEN event_type END) AS first_type,
       min(CASE WHEN rn = n THEN event_type END) AS last_type
FROM ordered GROUP BY user_id, n
""",
)
def arrow_journey_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInArrow TWIN of `udtf_table_arg_summary` (VERDICT r6 #8):
    the SAME per-user journey summary — count, first/last event type in
    (ts, event_id) order — computed over zero-copy Arrow batches
    instead of the UDTF's per-row eval() protocol. Both plans pay one
    user_id shuffle; the difference under the stopwatch is purely the
    Python boundary: the UDTF crosses it once per ROW (the documented
    ~4s protocol-cost ceiling in the extended trace), this one once
    per BATCH with numpy run-length segmentation inside, touching
    Python objects only at the O(#users) segment boundaries. Both are
    in the extended trace so the protocol delta is measured, not
    asserted (sf0.1, min-of-3: UDTF 4.55s vs 0.39s here — 11.8×). This is the shape sequential per-key logic should take
    at 100 TB when it doesn't need the declare-from-SQL ergonomics.

    repartition(user_id) + sortWithinPartitions replays TABLE(...)
    PARTITION BY ... ORDER BY: users are contiguous and time-ordered
    within a partition, so per-user state is a single carry across
    batch boundaries."""
    import numpy as np
    import pyarrow as pa

    e = _lt(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    part = e.repartition("user_id").sortWithinPartitions(
        "user_id", "ts", "event_id"
    )

    def summarize(batches):
        out_schema = pa.schema(
            [
                ("user_id", pa.int64()),
                ("n_events", pa.int64()),
                ("first_type", pa.string()),
                ("last_type", pa.string()),
            ]
        )
        cur = None  # [user_id, n, first_type, last_type] carry
        acc: list[tuple] = []

        def drain():
            batch = pa.RecordBatch.from_arrays(
                [
                    pa.array([r[0] for r in acc], pa.int64()),
                    pa.array([r[1] for r in acc], pa.int64()),
                    pa.array([r[2] for r in acc], pa.string()),
                    pa.array([r[3] for r in acc], pa.string()),
                ],
                schema=out_schema,
            )
            acc.clear()
            return batch

        for batch in batches:
            if batch.num_rows == 0:
                continue
            uids = batch.column("user_id").to_numpy(zero_copy_only=False)
            et = batch.column("event_type")
            starts = np.flatnonzero(np.diff(uids) != 0) + 1
            bounds = np.concatenate(([0], starts, [len(uids)]))
            for i in range(len(bounds) - 1):
                s, t = int(bounds[i]), int(bounds[i + 1])
                u = int(uids[s])
                if cur is not None and cur[0] == u:
                    cur[1] += t - s
                    cur[3] = et[t - 1].as_py()
                else:
                    if cur is not None:
                        acc.append(tuple(cur))
                    cur = [u, t - s, et[s].as_py(), et[t - 1].as_py()]
            if len(acc) >= 4096:
                yield drain()
        if cur is not None:
            acc.append(tuple(cur))
        if acc:
            yield drain()

    return part.mapInArrow(
        summarize,
        "user_id long, n_events long, first_type string, last_type string",
    )


@query(
    "bucket_pruning_scan",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
FROM orders WHERE o_custkey = 42
""",
)
def bucket_pruning_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket pruning: an equality filter on the bucketing key reads
    ONLY the one bucket file that can contain it — the plan's
    SelectedBucketsCount must show 1 of 8 (asserted in-query). This is
    hash-based data skipping with no directory layout at all,
    completing the pruning triptych: hive partitions
    (partitioned_sink_prune), zone-map manifests
    (manifest_skipping_scan), bucket hashing (here).

    At 100 TB a point lookup on a bucketed fact touches 1/N of the
    files with zero metadata service — the poor man's index."""
    base = scratch_path(spark, "bucket_prune")
    o = _lt(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    (
        o.write.mode("overwrite")
        .option("path", f"{base}/orders_bp")
        .bucketBy(8, "o_custkey")
        .saveAsTable("graft_orders_bprune")
    )
    # autoBucketedScan drops the bucketed layout when the plan has no
    # shuffle to save ("Bucketed: false (disabled by query planner)"),
    # which ALSO forfeits bucket pruning on a pure point lookup — turn
    # it off so the filter can prune to the single matching bucket.
    # Left set for the session: it only affects catalog bucketed-table
    # reads, where forcing the bucketed layout never hurts (the
    # co-located-join query wants it too).
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    out = (
        spark.table("graft_orders_bprune")
        .filter(F.col("o_custkey") == 42)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "SelectedBucketsCount: 1 out of 8" in plan, (
        "bucket pruning did not engage:\n" + plan[:1500]
    )
    return out


@query(
    "compaction_roundtrip",
    oracle="""
SELECT event_id, user_id, event_type,
       CAST(floor(value * 100) AS BIGINT) AS value_cents
FROM events
""",
)
def compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table maintenance as a hash-verified query: events written as
    32 deliberately tiny files (the accretion pattern of streaming
    sinks / incremental loads), compacted with
    sources.sinks.compact_parquet, then read back — the compacted
    table must be byte-identical in content to the source, with the
    file count strictly reduced (asserted). Scan cost at 100 TB is
    dominated by file-open overhead once files ≪ the split size;
    compaction is the maintenance job that keeps it amortized, and
    its crash-safe rename dance (live dir set aside, never deleted
    before the replacement lands) is documented at the operator."""
    import glob

    from dist_keras_spark.sources.sinks import compact_parquet

    e = _lt(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    path = scratch_path(spark, "compact_rt")
    e.repartition(32).write.mode("overwrite").parquet(path)
    n_before = len(glob.glob(f"{path}/part-*.parquet"))
    n_after = compact_parquet(spark, path)
    assert 0 < n_after < n_before, (
        f"compaction did not reduce files: {n_before} -> {n_after}"
    )
    return spark.read.parquet(path).select(
        "event_id", "user_id", "event_type", "value_cents"
    )
