"""Round-11 second wave: six training-data-curation primitives at the
SUB-DOCUMENT grain the registry still lacked —

  chunk dedup     : per-doc duplicated-16-word-window fraction (the
                    RefinedWeb/C4 line-dedup shape re-expressed over
                    fixed token windows, since the fixture corpus has
                    no newlines), duplicate-cluster size/mass
                    histogram, and cross-source duplicate leakage
                    (train/val contamination at chunk grain);
  text quality    : Simpson collision diversity (frequency-mass
                    sibling of the distinct-count TTR/hapax ops);
  embeddings      : defect scan — exact quantized-norm audit catching
                    zero/near-zero and off-unit vectors before they
                    poison ANN indexes;
  packing         : document fragmentation rate across 512-token
                    context-bin boundaries (the cost side of
                    pack_docs_into_contexts' layout).

dist-keras has no analogue for any of these — "beyond the reference"
training-data-pipeline surface (brief: dedup / similarity / text
analysis are first-class), mapped in COVERAGE.md.

House rules (see analytics5/9/10.py): md5 is the engine-portable
fingerprint; integer micro units via exact `div`; floats only in
final scalar expressions written CHARACTER-IDENTICAL on both sides
over exact integer inputs; int64 headroom documented per query;
deliberate small-key windows follow the pack_docs_into_contexts
precedent (per-lang running sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dist_keras_spark.plans.registry import query
from dist_keras_spark.sources.tables import load_table as _lt

# Chunk grain: non-overlapping windows of 16 whitespace tokens. Only
# FULL windows participate in duplicate counting — a 2-token tail
# colliding with another tail is not evidence of copied text, while a
# full 16-gram collision at the fixture's ~40-word vocabulary is
# already ~40^-16 likely by chance.
_CHUNK_W = 16

# Simpson collision index threshold (e6 fixed point): fixture
# distribution at sf0.01 is min 0 / p50 32941 / p90 40935 / max
# 133333, so 50000 flags the genuinely repetitive tail (~p95+).
_SIMPSON_LOW_E6 = 50000

# Embedding norm audit thresholds over norm2_milli = Σ round(x·1e3)²
# (unit vector ≈ 1e6). near-zero: < 250000 (norm < 0.5 — a broken
# encoder output); off-unit: |norm² − 1e6| > 1000 (fixture tail
# reaches ±1700, so the flag is live even on healthy data).
_NEARZERO_Q = 250_000
_OFFUNIT_TOL = 1000


def _chunks_spark(d: DataFrame) -> DataFrame:
    """(doc_id, source, chunk_md5, chunk_chars) for every full 16-token
    window. Scan-side explode of ⌈n/16⌉ starts per doc (the
    shingle_postings codegen path: sequence+explode, slice/array_join
    as row expressions) — no shuffle introduced here."""
    t = F.split("text", " ")
    return (
        d.select("doc_id", "source", t.alias("t"))
        .where(F.size("t") >= _CHUNK_W)
        .select(
            "doc_id",
            "source",
            "t",
            F.explode(
                F.sequence(
                    F.lit(1),
                    (F.size("t").cast("long") / _CHUNK_W).cast("long")
                    * _CHUNK_W
                    - (_CHUNK_W - 1),
                    F.lit(_CHUNK_W),
                )
            ).alias("i"),
        )
        .select(
            "doc_id",
            "source",
            F.md5(F.expr(f"array_join(slice(t, i, {_CHUNK_W}), ' ')")).alias(
                "h"
            ),
            F.expr(
                f"CAST(length(array_join(slice(t, i, {_CHUNK_W}), ' ')) AS BIGINT)"
            ).alias("chunk_chars"),
        )
    )


# Shared oracle CTE: full 16-token chunks via group-by-window-id (the
# DuckDB-idiomatic formulation; HAVING count(*)=16 keeps full windows
# only — same set as the Spark slice()).
_CHUNK_CTE = f"""
toks AS (
    SELECT doc_id, source, generate_subscripts(a, 1) AS idx,
           a[generate_subscripts(a, 1)] AS tok
    FROM (SELECT doc_id, source, string_split(text, ' ') AS a
          FROM documents) t
), chunks AS (
    SELECT doc_id, source,
           md5(string_agg(tok, ' ' ORDER BY idx)) AS h,
           CAST(length(string_agg(tok, ' ' ORDER BY idx)) AS BIGINT)
               AS chunk_chars
    FROM toks GROUP BY doc_id, source, (idx - 1) // {_CHUNK_W}
    HAVING count(*) = {_CHUNK_W}
)"""


# --------------------------------------------------------------------------
# Per-document duplicated-chunk fraction (RefinedWeb/C4 line dedup shape)
# --------------------------------------------------------------------------


@query(
    "chunk_dedup_16word",
    oracle=f"""
WITH {_CHUNK_CTE}, freq AS (
    SELECT h, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM chunks GROUP BY h
)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_chunks,
       CAST(1000000 * sum(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END)
            // greatest(count(*), 1) AS BIGINT) AS dup_e6,
       CAST(CASE WHEN 1000000 * sum(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END)
                      // greatest(count(*), 1) >= 300000
                 THEN 1 ELSE 0 END AS BIGINT) AS dup_heavy
FROM chunks c JOIN freq f USING (h)
GROUP BY c.doc_id
""",
)
def chunk_dedup_16word(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup at 16-token-window grain — the
    RefinedWeb/C4 "duplicated lines" quality signal (Penedo et al.
    2023 §4.2, public) re-expressed over fixed token windows: per
    document, the fraction of full 16-word chunks whose md5 also
    appears in ANOTHER document, in e6 fixed point, plus the ≥30%
    rejection flag production pipelines apply. Within-doc repetition
    is deliberately excluded (count DISTINCT doc_id per chunk) — that
    signal is quality_repetition_ratio's.

    Int64 headroom: counts only; 1e6·n_chunks ≤ 1e6·(tokens/16) —
    exact through ~9e12 chunks.

    100 TB shape: chunk explode is scan-side (sequence+slice row
    expressions, ~n/16 rows out per doc); ONE groupBy on the chunk
    md5 (map-side combined, data-scaling key), one hash-join back on
    the same key, one groupBy doc_id. All three exchanges are on
    uniformly-distributed keys (md5 / doc_id) — no skew, no
    broadcast-sized state, nothing data-sized on the driver."""
    chunks = _chunks_spark(_lt(spark, sf_dir, "documents"))
    freq = chunks.groupBy("h").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    dup = F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
    per_doc = (
        chunks.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            dup.cast("long").alias("n_dup_chunks"),
            F.expr(
                "CAST(1000000 * sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END)"
                " div greatest(count(1), 1) AS BIGINT)"
            ).alias("dup_e6"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_chunks",
        "n_dup_chunks",
        "dup_e6",
        F.when(F.col("dup_e6") >= 300000, 1)
        .otherwise(0)
        .cast("long")
        .alias("dup_heavy"),
    )


# --------------------------------------------------------------------------
# Duplicate-cluster size/mass histogram ("how much of the corpus is copies")
# --------------------------------------------------------------------------


@query(
    "dup_chunk_cluster_mass",
    oracle=f"""
WITH {_CHUNK_CTE}, clusters AS (
    SELECT h, CAST(count(*) AS BIGINT) AS k,
           CAST(sum(chunk_chars) AS BIGINT) AS chars
    FROM chunks GROUP BY h
)
SELECT k AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(k * count(*) AS BIGINT) AS n_instances,
       CAST(sum(chars) AS BIGINT) AS chars_mass
FROM clusters GROUP BY k
""",
)
def dup_chunk_cluster_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram with byte mass — the "dup-mass
    curve" a dedup rollout is sized by (how many bytes sit in clusters
    of size k, i.e. what exact dedup would reclaim at each k): per
    chunk-cluster size, the number of clusters, total instances, and
    total characters. Exact integers throughout.

    Int64 headroom: chars_mass ≤ total corpus bytes — exact to 9e18.

    100 TB shape: one groupBy on chunk md5 (map-side combined), then a
    second aggregate over the cluster-size key whose cardinality is
    ≤ max cluster size (a few thousand at worst) — the
    frequency-of-frequencies reduction chao1_vocab_richness also
    rides; nothing data-sized survives the first exchange."""
    chunks = _chunks_spark(_lt(spark, sf_dir, "documents"))
    clusters = chunks.groupBy("h").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("chunk_chars").cast("long").alias("chars"),
    )
    return clusters.groupBy(F.col("k").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        (F.first("k") * F.count(F.lit(1))).cast("long").alias("n_instances"),
        F.sum("chars").cast("long").alias("chars_mass"),
    )


# --------------------------------------------------------------------------
# Cross-source duplicate leakage (train/val contamination at chunk grain)
# --------------------------------------------------------------------------


@query(
    "cross_source_dup_chunks",
    oracle=f"""
WITH {_CHUNK_CTE}, sh AS (
    SELECT DISTINCT h, source FROM chunks
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(DISTINCT a.h) AS BIGINT) AS n_shared_chunks
FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
GROUP BY a.source, b.source
""",
)
def cross_source_dup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate leakage: for every ordered source pair,
    the number of distinct 16-token chunks both contain — the
    contamination matrix checked before one source becomes eval/val
    while another trains (decontaminate_vs_benchmark is the targeted
    single-benchmark form; this is the all-pairs census at chunk
    grain).

    Int64 headroom: counts only.

    100 TB shape: the self-join is on the chunk md5 AFTER a distinct
    that collapses each (chunk, source) to one row — join input is
    bounded by distinct-chunk count × sources-per-chunk (≈ distinct
    chunks, since duplication across many sources is precisely what's
    rare), and the equi-join key is uniform md5. Output is
    ≤ |sources|² rows — dim-sized. No broadcast needed: both sides
    shuffle on the same key, and AQE picks SMJ/SHJ by measured size."""
    chunks = _chunks_spark(_lt(spark, sf_dir, "documents"))
    sh = chunks.select("h", "source").distinct()
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count_distinct(F.col("a.h")).alias("n_shared_chunks"))
    )


# --------------------------------------------------------------------------
# Simpson collision diversity (frequency-mass sibling of TTR/hapax)
# --------------------------------------------------------------------------


@query(
    "simpson_word_diversity",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, source, a[generate_subscripts(a, 1)] AS tok
    FROM (SELECT doc_id, source, string_split(text, ' ') AS a
          FROM documents) t
), wc AS (
    SELECT doc_id, source, tok, CAST(count(*) AS BIGINT) AS c
    FROM toks GROUP BY 1, 2, 3
), per_doc AS (
    SELECT doc_id, source,
           CAST(sum(c) AS BIGINT) AS n,
           CAST(sum(c * (c - 1)) AS BIGINT) AS coll,
           CAST(1000000 * sum(c * (c - 1))
                // greatest(sum(c) * (sum(c) - 1), 1) AS BIGINT) AS e6
    FROM wc GROUP BY 1, 2
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       CAST(sum(coll) AS BIGINT) AS collision_pairs,
       CAST(sum(e6) // count(*) AS BIGINT) AS avg_simpson_e6,
       CAST(sum(CASE WHEN e6 >= {_SIMPSON_LOW_E6} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_low_diversity
FROM per_doc GROUP BY source
""",
)
def simpson_word_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson collision index per document, aggregated per source:
    Σc(c−1) / n(n−1) — the probability two random tokens from the doc
    are the SAME word (Simpson 1949, public). TTR/hapax
    (quality_ttr_hapax) measure richness by distinct COUNTS; Simpson
    weights by frequency MASS, so a doc that repeats one word half the
    time scores degenerate even when its distinct count looks healthy.
    All integers (pair counts, e6 fixed point via exact div); flags
    docs ≥ {_SIMPSON_LOW_E6}/1e6 (~p95 of the fixture distribution).

    Int64 headroom: per-doc c ≤ n ≤ ~1e5 tokens → c(c−1) ≤ 1e10;
    corpus sums exact through ~9e8 such docs. 1e6·Σe6 fine.

    100 TB shape: one groupBy on (doc_id, word) — map-side combined,
    data-scaling composite key — one groupBy doc_id, one dim-sized
    groupBy source. No joins, no windows, nothing driver-sized."""
    toks = (
        _lt(spark, sf_dir, "documents")
        .select(
            "doc_id", "source", F.explode(F.split("text", " ")).alias("tok")
        )
    )
    wc = toks.groupBy("doc_id", "source", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_doc = wc.groupBy("doc_id", "source").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("coll"),
        F.expr(
            "CAST(1000000 * sum(c * (c - 1))"
            " div greatest(sum(c) * (sum(c) - 1), 1) AS BIGINT)"
        ).alias("e6"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n").cast("long").alias("n_tokens"),
        F.sum("coll").cast("long").alias("collision_pairs"),
        F.expr("CAST(sum(e6) div count(1) AS BIGINT)").alias(
            "avg_simpson_e6"
        ),
        F.sum(
            F.when(F.col("e6") >= _SIMPSON_LOW_E6, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_low_diversity"),
    )


# --------------------------------------------------------------------------
# Embedding defect scan (quantized-norm audit before ANN indexing)
# --------------------------------------------------------------------------

_NORM2Q = (
    "aggregate(embedding, 0L, (acc, x) -> acc"
    " + CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)"
    " * CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"
)


@query(
    "embedding_defect_scan",
    oracle=f"""
WITH nq AS (
    SELECT label,
           list_sum(list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)
                    * CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)))
               AS norm2q
    FROM embeddings
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(min(norm2q) AS BIGINT) AS min_norm2q,
       CAST(max(norm2q) AS BIGINT) AS max_norm2q,
       CAST(sum(norm2q) // count(*) AS BIGINT) AS avg_norm2q,
       CAST(sum(CASE WHEN norm2q < {_NEARZERO_Q} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_near_zero,
       CAST(sum(CASE WHEN abs(norm2q - 1000000) > {_OFFUNIT_TOL}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_off_unit
FROM nq GROUP BY label
""",
)
def embedding_defect_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding data-quality audit: per label, exact quantized squared
    norms (components rounded to milli units, so Σq² is an exact
    integer identical across engines — the knn_int8 quantization
    discipline) with min/max/avg plus two defect counters: near-zero
    vectors (norm < 0.5 — dead encoder outputs that collapse cosine
    similarity) and off-unit vectors (|‖v‖²−1| > {_OFFUNIT_TOL}e-6 —
    normalization drift that silently reweights ANN scores). Run
    before any index build (knn_ivf / minhash families assume sane
    norms).

    Int64 headroom: per-component q ≤ ~2e3 at unit scale → q² ≤ 4e6,
    64-dim norm2q ≤ ~3e8; sums exact through ~3e10 vectors per label.

    100 TB shape: zero-shuffle scan — the norm is a scan-side
    `aggregate` HOF over the array column (no explode: one row stays
    one row), then one dim-sized groupBy label with map-side
    combine."""
    e = _lt(spark, sf_dir, "embeddings").select(
        "label", F.expr(_NORM2Q).alias("norm2q")
    )
    return e.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.min("norm2q").cast("long").alias("min_norm2q"),
        F.max("norm2q").cast("long").alias("max_norm2q"),
        F.expr("CAST(sum(norm2q) div count(1) AS BIGINT)").alias(
            "avg_norm2q"
        ),
        F.sum(F.when(F.col("norm2q") < _NEARZERO_Q, 1).otherwise(0))
        .cast("long")
        .alias("n_near_zero"),
        F.sum(
            F.when(
                F.abs(F.col("norm2q") - 1000000) > _OFFUNIT_TOL, 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_off_unit"),
    )


# --------------------------------------------------------------------------
# Packing fragmentation rate (the cost side of contiguous packing)
# --------------------------------------------------------------------------


@query(
    "packing_fragmentation_rate",
    oracle="""
WITH sized AS (
    SELECT doc_id, lang,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
), packed AS (
    SELECT lang, n_tokens,
           sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
    FROM sized
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST((max(cum) - 1) // 512 + 1 AS BIGINT) AS n_bins,
       CAST(sum(CASE WHEN (cum - n_tokens) // 512 <> (cum - 1) // 512
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_fragmented,
       CAST(1000000 * sum(CASE WHEN (cum - n_tokens) // 512
                                    <> (cum - 1) // 512
                               THEN 1 ELSE 0 END)
            // count(*) AS BIGINT) AS frag_e6
FROM packed GROUP BY lang
""",
)
def packing_fragmentation_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fragmentation cost of contiguous 512-token packing: per lang,
    how many documents straddle a context-bin boundary (first token's
    bin ≠ last token's bin under pack_docs_into_contexts' exact
    layout — same per-lang doc_id-ordered running sum), the bin count,
    and the fragmentation rate in e6 fixed point. The metric that
    decides between concat-and-split packing (zero padding waste, this
    fraction of docs split) and best-fit packing (no splits, padding
    waste) for a pretraining corpus.

    Int64 headroom: cum ≤ corpus tokens — exact to 9e18.

    100 TB shape: ONE shuffle on lang with an in-partition running
    sum — the pack_docs_into_contexts convention (packing layouts are
    per-shard sequential BY DEFINITION; production shards by
    (lang, shard_id) to bound partition size, and this plan's window
    key is that sharding key's prefix)."""
    sized = _lt(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = sized.select(
        "lang", "n_tokens", F.sum("n_tokens").over(w).alias("cum")
    )
    frag = F.sum(
        F.when(
            F.expr("(cum - n_tokens) div 512") != F.expr("(cum - 1) div 512"),
            1,
        ).otherwise(0)
    )
    return packed.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.expr("CAST((max(cum) - 1) div 512 + 1 AS BIGINT)").alias("n_bins"),
        frag.cast("long").alias("n_fragmented"),
        F.expr(
            "CAST(1000000 * sum(CASE WHEN (cum - n_tokens) div 512"
            " <> (cum - 1) div 512 THEN 1 ELSE 0 END)"
            " div count(1) AS BIGINT)"
        ).alias("frag_e6"),
    )
