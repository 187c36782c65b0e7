"""ML training / inference / evaluation queries (SURVEY.md §2.I).

Float trainers return their round-by-round history as a DataFrame
(rows-only driver check — float SGD isn't SQL); the linear scorer and
the FIXED-POINT replays (two-step GD/DynSGD/EAMSGD/Adam, and the
ten-step mini-batch SGD whose whole 30-row history is hash-checked)
carry sharp oracles, proving the inference and update arithmetic
end-to-end. Convergence itself is gated in tests/test_ml.py
(distributed-vs-single parity, SURVEY.md §5.2.6).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_keras_spark.operators.evaluators import AccuracyEvaluator
from dist_keras_spark.operators.models import MLP
from dist_keras_spark.operators.predictors import ModelPredictor
from dist_keras_spark.operators.trainers import (
    AveragingTrainer,
    SingleTrainer,
    SyncDistributedTrainer,
)
from dist_keras_spark.plans.registry import ORACLE, query
from dist_keras_spark.sources.tables import load_table as _lt

_DIMS = (64, 32, 10)  # embeddings: dim 64 → 10 classes


def _train_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lt(spark, sf_dir, "embeddings").select(
        F.col("embedding").alias("features"), F.col("label").alias("label")
    )


@query("ml_train_single")
def ml_train_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I1: sequential baseline trainer; returns per-epoch loss history."""
    t = SingleTrainer(*_DIMS, num_epoch=3, batch_size=32, learning_rate=0.1)
    t.train(_train_df(spark, sf_dir))
    return spark.createDataFrame(
        [(h["epoch"], float(round(h["loss"], 6))) for h in t.history],
        "epoch int, loss double",
    )


@query("ml_train_averaging")
def ml_train_averaging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3: per-shard training + n-weighted weight averaging; returns
    per-shard loss rows plus the averaged-model accuracy."""
    t = AveragingTrainer(*_DIMS, num_models=4, num_epoch=2)
    ws = t.train(_train_df(spark, sf_dir))
    pred = ModelPredictor(MLP.serialize(ws), *_DIMS).predict(_train_df(spark, sf_dir))
    acc = AccuracyEvaluator(argmax=True).evaluate(pred)
    rows = [(int(h["part_id"]), float(round(h["loss"], 6)), float(round(acc, 4))) for h in t.history]
    return spark.createDataFrame(rows, "part_id int, shard_loss double, avg_model_acc double")


@query("ml_train_distributed_adag")
def ml_train_distributed_adag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I4-I8 capability: synchronous data-parallel rounds with the
    ADAG-mode (Adam-style) center optimizer; returns loss per round —
    the driver checks it runs and yields monotone-ish history rows."""
    t = SyncDistributedTrainer(
        *_DIMS, mode="adag", num_workers=8, rounds=8, learning_rate=0.05
    )
    t.train(_train_df(spark, sf_dir))
    return spark.createDataFrame(
        [(h["round"], float(round(h["loss"], 6))) for h in t.history],
        "round int, loss double",
    )


@query("ml_train_elastic_easgd")
def ml_train_elastic_easgd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I5/I6 capability: elastic averaging (easgd mode) with the
    default multi-step local-SGD window — per-partition local models
    drift for communication_window steps, then the center absorbs
    rho-weighted movement. Returns center loss per round plus the
    averaged history (I12 `get_averaged_history` parity helper)."""
    t = SyncDistributedTrainer(
        *_DIMS, mode="easgd", num_workers=8, rounds=8, learning_rate=0.1
    )
    t.train(_train_df(spark, sf_dir))
    avg = float(round(t.get_averaged_history("loss"), 6))
    return spark.createDataFrame(
        [(h["round"], float(round(h["loss"], 6)), avg) for h in t.history],
        "round int, loss double, avg_loss double",
    )


@query("ml_predict_eval")
def ml_predict_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I9+D1: train briefly, batch-predict with the Arrow predictor,
    evaluate accuracy — the full reference pipeline (train → predict →
    LabelIndex → accuracy) as two jobs instead of four RDD passes."""
    df = _train_df(spark, sf_dir)
    tr = SingleTrainer(*_DIMS, num_epoch=5, batch_size=32, learning_rate=0.3)
    ws = tr.train(df)
    pred = ModelPredictor(MLP.serialize(ws), *_DIMS).predict(df)
    acc = AccuracyEvaluator(argmax=True).evaluate(pred)
    n = df.count()
    return spark.createDataFrame(
        [(float(round(acc, 4)), int(n))], "accuracy double, n bigint"
    )


# ---------------------------------------------------------------------------
# Oracle-checked inference arithmetic: fixed-weight logistic scorer.
# ---------------------------------------------------------------------------

_W = np.random.RandomState(7).randn(64).tolist()
_B = -0.05


@query(
    "ml_linear_scorer",
    oracle=f"""
SELECT vec_id,
       round(1.0 / (1.0 + exp(-(list_sum(list_transform(range(1, 65),
             i -> CAST(embedding[i] AS DOUBLE) * ([{", ".join(repr(w) for w in _W)}])[i]))
             + ({_B!r})))), 6) AS score,
       CAST(round(1.0 / (1.0 + exp(-(list_sum(list_transform(range(1, 65),
             i -> CAST(embedding[i] AS DOUBLE) * ([{", ".join(repr(w) for w in _W)}])[i]))
             + ({_B!r})))), 6) > 0.5 AS INT) AS pred
FROM embeddings
""",
)
def ml_linear_scorer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I9 arithmetic parity: a fixed-weight logistic model scored as a
    pure column expression (the JVM fast path for linear/shallow
    models — no Python at all). The identical literal weights live in
    the DuckDB oracle, so the driver verifies the dot-product,
    sigmoid, and thresholding bit-for-bit (at 6dp)."""
    e = _lt(spark, sf_dir, "embeddings")
    w = F.array(*[F.lit(float(x)) for x in _W])
    z = (
        F.aggregate(
            F.zip_with("embedding", w, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        + F.lit(_B)
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return e.select(
        "vec_id", score.alias("score"), (score > 0.5).cast("int").alias("pred")
    )


@query(
    "linreg_gd_two_steps",
    oracle="""
WITH d AS (
    SELECT l_returnflag,
           CAST(l_quantity AS BIGINT) AS x,
           CAST(floor(l_extendedprice) AS BIGINT) * 10000 AS y_fp
    FROM lineitem
), s0 AS (  -- step 1 gradients at (w,b) = (0,0): residual = -y_fp
    SELECT l_returnflag, count(*) AS n,
           CAST(sum(2 * x * (-y_fp)) AS BIGINT) AS gw,
           CAST(sum(2 * (-y_fp)) AS BIGINT) AS gb
    FROM d GROUP BY l_returnflag
), w1 AS (  -- lr = 1e-4 applied as floor(double)/n arithmetic
    SELECT l_returnflag, n,
           CAST(0 - floor(CAST(gw AS DOUBLE) / 10000.0 / n) AS BIGINT) AS w_fp,
           CAST(0 - floor(CAST(gb AS DOUBLE) / 10000.0 / n) AS BIGINT) AS b_fp
    FROM s0
), s1 AS (
    SELECT d.l_returnflag, w1.n, w1.w_fp, w1.b_fp,
           CAST(sum(2 * d.x * (w1.w_fp * d.x + w1.b_fp - d.y_fp))
                AS BIGINT) AS gw,
           CAST(sum(2 * (w1.w_fp * d.x + w1.b_fp - d.y_fp))
                AS BIGINT) AS gb
    FROM d JOIN w1 USING (l_returnflag)
    GROUP BY d.l_returnflag, w1.n, w1.w_fp, w1.b_fp
)
SELECT l_returnflag, n,
       CAST(w_fp - floor(CAST(gw AS DOUBLE) / 10000.0 / n) AS BIGINT)
           AS w_fp,
       CAST(b_fp - floor(CAST(gb AS DOUBLE) / 10000.0 / n) AS BIGINT)
           AS b_fp
FROM s1
""",
)
def linreg_gd_two_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO exact full-batch gradient-descent steps of linear
    regression (price ~ quantity, per return flag) — the distributed
    TRAINING LOOP itself made driver-checkable. The reference's
    trainers are inherently hash-blind (float SGD); this query pins
    the loop's structure with fixed-point weights (1e4): per step the
    gradient is an exact int64 sum over the fact, the learning-rate
    update is one floor of a double quotient (identical in both
    engines even when |Σ| exceeds 2^53 — both convert the same int64
    with the same rounding), and the next step re-scans with the new
    integer weights. This is exactly the synchronous-rounds skeleton
    SyncDistributedTrainer runs (broadcast weights → partial gradient
    aggregate → driver update), with arithmetic the oracle can replay.

    Scale shape per step: ONE partial-aggregated scan (two int sums
    per group) + a model-sized join back — no collect, no windows.
    int64 bound: |Σ 2x·res| ≈ rows·2·50·1e9 stays in-range to SF ≈ 10;
    past that, promote the gradient sums to DECIMAL(38,0) (same
    plan)."""
    l = _lt(spark, sf_dir, "lineitem")
    d = l.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        (F.floor("l_extendedprice").cast("long") * 10000).alias("y_fp"),
    )

    def step(weights: DataFrame) -> DataFrame:
        j = d.join(weights, "l_returnflag")
        res = F.col("w_fp") * F.col("x") + F.col("b_fp") - F.col("y_fp")
        g = j.groupBy("l_returnflag", "n", "w_fp", "b_fp").agg(
            F.sum(2 * F.col("x") * res).alias("gw"),
            F.sum(2 * res).alias("gb"),
        )
        upd = lambda wcol, gcol: (  # noqa: E731
            F.col(wcol)
            - F.floor(F.col(gcol).cast("double") / 10000.0 / F.col("n"))
        ).cast("long")
        return g.select(
            "l_returnflag",
            "n",
            upd("w_fp", "gw").alias("w_fp"),
            upd("b_fp", "gb").alias("b_fp"),
        )

    w0 = d.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).select(
        "l_returnflag",
        "n",
        F.lit(0).cast("long").alias("w_fp"),
        F.lit(0).cast("long").alias("b_fp"),
    )
    w2 = step(step(w0))
    return w2.select("l_returnflag", "n", "w_fp", "b_fp")


# Ten-step mini-batch SGD replay: 5 md5-bucket mini-batches rotated
# round-robin, base lr 1e-4 halved every 4 steps (the repr()'d-float
# multiplier convention of linreg_dynsgd_two_steps).
_SGD_STEPS = 10
_SGD_BATCHES = 5
_SGD_LR_K = {t: 0.5 ** ((t - 1) // 4) for t in range(1, _SGD_STEPS + 1)}
# engine-identical mini-batch id: first 4 hex chars of
# md5(orderkey:linenumber) mod 5 (the hash_split convention on the
# composite lineitem key)
_SGD_BATCH_SQL = (
    "('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||"
    f" CAST(l_linenumber AS VARCHAR)), 1, 4))::BIGINT % {_SGD_BATCHES}"
)


def _sgd_ten_step_oracle_sql() -> str:
    """Ten chained gradient-step CTE pairs (the kmeans two-Lloyd-iters
    finite-unroll technique at depth 10), one per step, each scanning
    ONLY its rotation batch; the final SELECT unions the ten weight
    states into the training history."""
    parts = [
        f"""
WITH d AS (
    SELECT l_returnflag,
           CAST(l_quantity AS BIGINT) AS x,
           CAST(floor(l_extendedprice) AS BIGINT) * 10000 AS y_fp,
           {_SGD_BATCH_SQL} AS batch
    FROM lineitem
), s1 AS (
    SELECT l_returnflag, count(*) AS nb,
           CAST(sum(2 * x * (-y_fp)) AS BIGINT) AS gw,
           CAST(sum(2 * (-y_fp)) AS BIGINT) AS gb
    FROM d WHERE batch = 0 GROUP BY l_returnflag
), w1 AS (
    SELECT l_returnflag, nb,
           CAST(0 - floor(CAST(gw AS DOUBLE) / 10000.0 / nb
                          * {_SGD_LR_K[1]!r}) AS BIGINT) AS w_fp,
           CAST(0 - floor(CAST(gb AS DOUBLE) / 10000.0 / nb
                          * {_SGD_LR_K[1]!r}) AS BIGINT) AS b_fp
    FROM s1
)"""
    ]
    for t in range(2, _SGD_STEPS + 1):
        b = (t - 1) % _SGD_BATCHES
        k = _SGD_LR_K[t]
        parts.append(
            f""", s{t} AS (
    SELECT d.l_returnflag, count(*) AS nb, w{t - 1}.w_fp, w{t - 1}.b_fp,
           CAST(sum(2 * d.x * (w{t - 1}.w_fp * d.x + w{t - 1}.b_fp - d.y_fp))
                AS BIGINT) AS gw,
           CAST(sum(2 * (w{t - 1}.w_fp * d.x + w{t - 1}.b_fp - d.y_fp))
                AS BIGINT) AS gb
    FROM d JOIN w{t - 1} USING (l_returnflag)
    WHERE d.batch = {b}
    GROUP BY d.l_returnflag, w{t - 1}.w_fp, w{t - 1}.b_fp
), w{t} AS (
    SELECT l_returnflag, nb,
           CAST(w_fp - floor(CAST(gw AS DOUBLE) / 10000.0 / nb
                             * {k!r}) AS BIGINT) AS w_fp,
           CAST(b_fp - floor(CAST(gb AS DOUBLE) / 10000.0 / nb
                             * {k!r}) AS BIGINT) AS b_fp
    FROM s{t}
)"""
        )
    hist = "\nUNION ALL ".join(
        f"SELECT l_returnflag, CAST({t} AS BIGINT) AS step, "
        f"CAST(nb AS BIGINT) AS n_batch, w_fp, b_fp FROM w{t}"
        for t in range(1, _SGD_STEPS + 1)
    )
    return "".join(parts) + "\n" + hist


@query("linreg_minibatch_sgd_ten_steps", oracle=_sgd_ten_step_oracle_sql())
def linreg_minibatch_sgd_ten_steps(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TEN mini-batch SGD steps with the full TRAINING HISTORY under
    the hash gate (r13) — the deepest composed replay of the loop the
    reference's trainers run, closing in on the one remaining
    driver-blind surface ('many float steps composed', accepted risk
    since r5): where the two-step replays pin one update's
    arithmetic, this pins a 10-step trajectory with the three moving
    parts real training has — (a) MINI-BATCHES: 5 deterministic
    md5-bucket batches over the composite (orderkey, linenumber) key,
    rotated round-robin, each step's gradient an exact int64 sum over
    ONLY its batch; (b) an LR SCHEDULE: base 1e-4 halved every 4
    steps, applied as the repr()'d-float multiplier both engines
    evaluate identically (the DynSGD convention); (c) HISTORY as
    data: the output is the per-step (step, n_batch, w_fp, b_fp)
    trajectory — I12's training-history surface, driver-checked
    instead of test-only. Fixed-point weights (1e4), floor-of-double
    updates — every state transition exactly replayable (the
    linreg_gd_two_steps arithmetic contract at 5× the depth with
    per-step re-batching).

    Scale shape per step: ONE partial-aggregated scan of the step's
    mini-batch (the batch predicate prunes at the scan when the
    bucket is a materialized/partition column; here it filters
    scan-side) + a model-sized join back; 10 steps chain lazily with
    no collect and no window. int64 bound: per-batch |Σ 2x·res| ≈
    (rows/5)·2·50·1e9 — in-range to SF ≈ 50; past that promote the
    gradient sums to DECIMAL(38,0) (same plan).

    Trajectory sanity is pytest-gated (per-step n_batch equals each
    md5 bucket's true size, one rotation cycle partitions the group
    exactly, weights keep moving across steps); the driver hash pins
    every digit of all 30 history rows.
    MEASURED (r13): 10× exp 0.29, sf1→sf2 0.92 — ten chained scans
    stay scan-dominated and linear."""
    from dist_keras_spark.operators.quality import md5_shard

    l = _lt(spark, sf_dir, "lineitem")
    d = l.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        (F.floor("l_extendedprice").cast("long") * 10000).alias("y_fp"),
        md5_shard(["l_orderkey", "l_linenumber"], _SGD_BATCHES).alias(
            "batch"
        ),
    )

    def step(weights: DataFrame, t: int) -> DataFrame:
        b = (t - 1) % _SGD_BATCHES
        k = _SGD_LR_K[t]
        j = d.filter(F.col("batch") == b).join(weights, "l_returnflag")
        res = F.col("w_fp") * F.col("x") + F.col("b_fp") - F.col("y_fp")
        g = j.groupBy("l_returnflag", "w_fp", "b_fp").agg(
            F.count(F.lit(1)).alias("nb"),
            F.sum(2 * F.col("x") * res).alias("gw"),
            F.sum(2 * res).alias("gb"),
        )
        upd = lambda wcol, gcol: (  # noqa: E731
            F.col(wcol)
            - F.floor(
                F.col(gcol).cast("double") / 10000.0 / F.col("nb") * F.lit(k)
            )
        ).cast("long")
        return g.select(
            "l_returnflag",
            "nb",
            upd("w_fp", "gw").alias("w_fp"),
            upd("b_fp", "gb").alias("b_fp"),
        )

    w = d.select("l_returnflag").distinct().select(
        "l_returnflag",
        F.lit(0).cast("long").alias("w_fp"),
        F.lit(0).cast("long").alias("b_fp"),
    )
    history = None
    for t in range(1, _SGD_STEPS + 1):
        w = step(w.select("l_returnflag", "w_fp", "b_fp"), t)
        h = w.select(
            "l_returnflag",
            F.lit(t).cast("long").alias("step"),
            F.col("nb").cast("long").alias("n_batch"),
            "w_fp",
            "b_fp",
        )
        history = h if history is None else history.unionByName(h)
    return history


@query(
    "sgd_ten_step_final_loss",
    oracle=f"""
WITH hist AS ({ORACLE["linreg_minibatch_sgd_ten_steps"]}),
final AS (SELECT l_returnflag, w_fp, b_fp FROM hist WHERE step = 10),
d AS (
    SELECT l_returnflag,
           CAST(l_quantity AS BIGINT) AS x,
           CAST(floor(l_extendedprice) AS BIGINT) * 10000 AS y_fp
    FROM lineitem
)
SELECT d.l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       any_value(f.w_fp) AS w_fp,
       any_value(f.b_fp) AS b_fp,
       CAST(sum(abs(f.w_fp * d.x + f.b_fp - d.y_fp)) AS BIGINT)
           AS l1_loss_fp,
       CAST(sum(abs(f.w_fp * d.x + f.b_fp - d.y_fp)) // count(*)
            AS BIGINT) AS mean_abs_err_fp
FROM d JOIN final f USING (l_returnflag)
GROUP BY d.l_returnflag
""",
)
def sgd_ten_step_final_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training EVAL composed on the training LOOP, both under the
    hash gate: score the ten-step trajectory's FINAL weights against
    the FULL fact (L1 loss + mean absolute error, exact int64 — the
    residual never leaves fixed point). The oracle wraps the
    registered ten-step history as a CTE (the derived-query
    discipline: the weights under evaluation are pinned to the exact
    SQL the driver already hash-checks, so loop and eval can never
    drift apart). This is the epoch-end validation pass every trainer
    runs — ONE partial-aggregated scan of the fact joined to a
    3-row broadcast weight table; int64 bound: Σ|resid| ≈
    rows·1e9 < 2⁶³ to SF ≈ 1000. MEASURED (r13): 10× exp 0.25,
    sf1→sf2 0.60."""
    l = _lt(spark, sf_dir, "lineitem")
    final = linreg_minibatch_sgd_ten_steps(spark, sf_dir).filter(
        F.col("step") == _SGD_STEPS
    ).select("l_returnflag", "w_fp", "b_fp")
    d = l.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        (F.floor("l_extendedprice").cast("long") * 10000).alias("y_fp"),
    )
    res = F.abs(F.col("w_fp") * F.col("x") + F.col("b_fp") - F.col("y_fp"))
    return (
        d.join(F.broadcast(final), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("w_fp").alias("w_fp"),
            F.first("b_fp").alias("b_fp"),
            F.sum(res).alias("l1_loss_fp"),
            F.expr("sum(abs(w_fp * x + b_fp - y_fp)) div count(*)")
            .cast("long")
            .alias("mean_abs_err_fp"),
        )
    )


_PAR_WORKERS = 4


def _parallel_sgd_oracle_sql() -> str:
    """W=4 independent two-step GD chains, one per md5-shard, then the
    integer weight average — the AveragingTrainer / DOWNPOUR round
    structure finitely unrolled (each worker chain is the
    linreg_gd_two_steps arithmetic restricted to its shard)."""
    chains = []
    for w in range(_PAR_WORKERS):
        chains.append(f"""s{w}_1 AS (
    SELECT l_returnflag, count(*) AS n,
           CAST(sum(2 * x * (-y_fp)) AS BIGINT) AS gw,
           CAST(sum(2 * (-y_fp)) AS BIGINT) AS gb
    FROM d WHERE shard = {w} GROUP BY l_returnflag
), w{w}_1 AS (
    SELECT l_returnflag, n,
           CAST(0 - floor(CAST(gw AS DOUBLE) / 10000.0 / n) AS BIGINT) AS w_fp,
           CAST(0 - floor(CAST(gb AS DOUBLE) / 10000.0 / n) AS BIGINT) AS b_fp
    FROM s{w}_1
), s{w}_2 AS (
    SELECT d.l_returnflag, c.n, c.w_fp, c.b_fp,
           CAST(sum(2 * d.x * (c.w_fp * d.x + c.b_fp - d.y_fp)) AS BIGINT) AS gw,
           CAST(sum(2 * (c.w_fp * d.x + c.b_fp - d.y_fp)) AS BIGINT) AS gb
    FROM d JOIN w{w}_1 c USING (l_returnflag)
    WHERE d.shard = {w}
    GROUP BY d.l_returnflag, c.n, c.w_fp, c.b_fp
), w{w}_2 AS (
    SELECT l_returnflag, n,
           CAST(w_fp - floor(CAST(gw AS DOUBLE) / 10000.0 / n) AS BIGINT) AS w_fp,
           CAST(b_fp - floor(CAST(gb AS DOUBLE) / 10000.0 / n) AS BIGINT) AS b_fp
    FROM s{w}_2
)""")

    workers_union = "\nUNION ALL ".join(
        f"SELECT l_returnflag, CAST({w} AS BIGINT) AS worker, "
        f"CAST(n AS BIGINT) AS n_shard, w_fp, b_fp FROM w{w}_2"
        for w in range(_PAR_WORKERS)
    )
    return f"""
WITH d AS (
    SELECT l_returnflag,
           CAST(l_quantity AS BIGINT) AS x,
           CAST(floor(l_extendedprice) AS BIGINT) * 10000 AS y_fp,
           ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
                CAST(l_linenumber AS VARCHAR)), 1, 4))::BIGINT
               % {_PAR_WORKERS} AS shard
    FROM lineitem
), {", ".join(chains)},
locals AS ({workers_union})
SELECT l_returnflag, worker, n_shard, w_fp, b_fp FROM locals
UNION ALL
SELECT l_returnflag, CAST(-1 AS BIGINT) AS worker,
       CAST(sum(n_shard) AS BIGINT) AS n_shard,
       CAST(sum(w_fp) // {_PAR_WORKERS} AS BIGINT) AS w_fp,
       CAST(sum(b_fp) // {_PAR_WORKERS} AS BIGINT) AS b_fp
FROM locals GROUP BY l_returnflag
"""


@query("linreg_parallel_sgd_average", oracle=_parallel_sgd_oracle_sql())
def linreg_parallel_sgd_average(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """THE reference's core training round under the hash gate (r13):
    data-parallel workers training independently on disjoint shards,
    then merged by weight averaging — the AveragingTrainer /
    one-DOWNPOUR-commit structure (reference workflow: workers =
    partitions, each running local SGD, parameter server averaging;
    SURVEY §2.I I3/I4). Four workers, each a two-step fixed-point GD
    chain (the linreg_gd_two_steps arithmetic verbatim) over its
    deterministic md5-shard of lineitem; the merge is the exact
    integer mean (sum div 4 — BIGINT // truncates identically in both
    engines). Output: the four local trajectories' endpoints
    (worker 0..3 rows, per return flag) AND the averaged model
    (worker = -1), so the driver hash pins every worker's local
    result and the merge arithmetic in one check — the distributed
    structure the float trainers can't prove, proven on their exact
    skeleton.

    Scale shape: the four chains share ONE scan lineage (shard is a
    scan-side md5 column; each step is a partial-aggregated scan of
    its shard + model-sized join back); the average is a 3-group agg
    over 12 rows. No collect, no window; the int64 bound of
    linreg_gd_two_steps divided by W. MEASURED (r13): 10× exp 0.27,
    sf1→sf2 1.29 (re-measured on a quiet window: 5.1s → 12.4s,
    reproducible) — total step work is Θ(N) (each of 4 workers scans
    the fact twice with a scan-side shard filter; the md5 batch
    predicate can't push to parquet), so the elevated-but-in-band
    second step is the 8-scan constant fading against a fact that
    still fits cache at sf1; the sibling ten-step form (10 scans,
    same arithmetic) reads 0.92 on the same step."""
    from dist_keras_spark.operators.quality import md5_shard

    l = _lt(spark, sf_dir, "lineitem")
    d = l.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        (F.floor("l_extendedprice").cast("long") * 10000).alias("y_fp"),
        md5_shard(["l_orderkey", "l_linenumber"], _PAR_WORKERS).alias(
            "shard"
        ),
    )

    def two_steps(w: int) -> DataFrame:
        dw = d.filter(F.col("shard") == w)

        def step(weights: DataFrame) -> DataFrame:
            j = dw.join(weights, "l_returnflag")
            res = F.col("w_fp") * F.col("x") + F.col("b_fp") - F.col("y_fp")
            g = j.groupBy("l_returnflag", "n", "w_fp", "b_fp").agg(
                F.sum(2 * F.col("x") * res).alias("gw"),
                F.sum(2 * res).alias("gb"),
            )
            upd = lambda wc, gc: (  # noqa: E731
                F.col(wc)
                - F.floor(F.col(gc).cast("double") / 10000.0 / F.col("n"))
            ).cast("long")
            return g.select(
                "l_returnflag",
                "n",
                upd("w_fp", "gw").alias("w_fp"),
                upd("b_fp", "gb").alias("b_fp"),
            )

        w0 = dw.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n")
        ).select(
            "l_returnflag",
            "n",
            F.lit(0).cast("long").alias("w_fp"),
            F.lit(0).cast("long").alias("b_fp"),
        )
        return step(step(w0)).select(
            "l_returnflag",
            F.lit(w).cast("long").alias("worker"),
            F.col("n").cast("long").alias("n_shard"),
            "w_fp",
            "b_fp",
        )

    locals_ = None
    for w in range(_PAR_WORKERS):
        part = two_steps(w)
        locals_ = part if locals_ is None else locals_.unionByName(part)
    avg = locals_.groupBy("l_returnflag").agg(
        F.lit(-1).cast("long").alias("worker"),
        F.sum("n_shard").cast("long").alias("n_shard"),
        F.expr(f"sum(w_fp) div {_PAR_WORKERS}").cast("long").alias("w_fp"),
        F.expr(f"sum(b_fp) div {_PAR_WORKERS}").cast("long").alias("b_fp"),
    )
    return locals_.unionByName(
        avg.select("l_returnflag", "worker", "n_shard", "w_fp", "b_fp")
    )


_DYN_K = {1: 1 / (1 + 0.05 * 1), 2: 1 / (1 + 0.05 * 2)}

_DYNSGD_ORACLE = f"""
WITH d AS (
    SELECT l_returnflag,
           CAST(l_quantity AS BIGINT) AS x,
           CAST(floor(l_extendedprice) AS BIGINT) * 10000 AS y_fp
    FROM lineitem
), s0 AS (
    SELECT l_returnflag, count(*) AS n,
           CAST(sum(2 * x * (-y_fp)) AS BIGINT) AS gw,
           CAST(sum(2 * (-y_fp)) AS BIGINT) AS gb
    FROM d GROUP BY l_returnflag
), w1 AS (  -- t=1: base-lr step scaled by the decayed factor 1/1.05
    SELECT l_returnflag, n,
           CAST(0 - floor(CAST(gw AS DOUBLE) / 10000.0 / n * {_DYN_K[1]!r})
                AS BIGINT) AS w_fp,
           CAST(0 - floor(CAST(gb AS DOUBLE) / 10000.0 / n * {_DYN_K[1]!r})
                AS BIGINT) AS b_fp
    FROM s0
), s1 AS (
    SELECT d.l_returnflag, w1.n, w1.w_fp, w1.b_fp,
           CAST(sum(2 * d.x * (w1.w_fp * d.x + w1.b_fp - d.y_fp))
                AS BIGINT) AS gw,
           CAST(sum(2 * (w1.w_fp * d.x + w1.b_fp - d.y_fp))
                AS BIGINT) AS gb
    FROM d JOIN w1 USING (l_returnflag)
    GROUP BY d.l_returnflag, w1.n, w1.w_fp, w1.b_fp
)
SELECT l_returnflag, n,
       CAST(w_fp - floor(CAST(gw AS DOUBLE) / 10000.0 / n * {_DYN_K[2]!r})
            AS BIGINT) AS w_fp,
       CAST(b_fp - floor(CAST(gb AS DOUBLE) / 10000.0 / n * {_DYN_K[2]!r})
            AS BIGINT) AS b_fp
FROM s1
"""


@query("linreg_dynsgd_two_steps", oracle=_DYNSGD_ORACLE)
def linreg_dynsgd_two_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO exact DynSGD steps — the DECAYED-LEARNING-RATE mode's
    arithmetic driver-checked, completing a second optimizer branch
    after linreg_adam_two_steps. Identical loop skeleton to
    linreg_gd_two_steps; the only delta is the per-step multiplier
    dynsgd_lr(lr, t) = lr/(1 + 0.05·t) (operators/trainers.py, the
    'dynsgd' mode), inlined as the same Python-computed IEEE double on
    both engine sides and pinned to the trainer's function by
    tests/test_ml.py. Same scale shape and int64 valve as the GD
    query."""
    l = _lt(spark, sf_dir, "lineitem")
    d = l.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        (F.floor("l_extendedprice").cast("long") * 10000).alias("y_fp"),
    )

    def step(weights: DataFrame, t: int) -> DataFrame:
        j = d.join(weights, "l_returnflag")
        res = F.col("w_fp") * F.col("x") + F.col("b_fp") - F.col("y_fp")
        g = j.groupBy("l_returnflag", "n", "w_fp", "b_fp").agg(
            F.sum(2 * F.col("x") * res).alias("gw"),
            F.sum(2 * res).alias("gb"),
        )
        upd = lambda wcol, gcol: (  # noqa: E731
            F.col(wcol)
            - F.floor(
                F.col(gcol).cast("double") / 10000.0 / F.col("n")
                * F.lit(_DYN_K[t])
            )
        ).cast("long")
        return g.select(
            "l_returnflag",
            "n",
            upd("w_fp", "gw").alias("w_fp"),
            upd("b_fp", "gb").alias("b_fp"),
        )

    w0 = d.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).select(
        "l_returnflag",
        "n",
        F.lit(0).cast("long").alias("w_fp"),
        F.lit(0).cast("long").alias("b_fp"),
    )
    return step(step(w0, 1), 2).select("l_returnflag", "n", "w_fp", "b_fp")


_EAM_LR, _EAM_RHO, _EAM_MOM = 1e-11, 0.9, 0.9
_EAM_DAMP = 1 - _EAM_MOM  # 0.09999999999999998 as an IEEE double

_EAMSGD_ORACLE = f"""
WITH d AS (
    SELECT l_returnflag,
           CAST(l_quantity AS BIGINT) AS x,
           CAST(floor(l_extendedprice) AS BIGINT) * 10000 AS y_fp
    FROM lineitem
), s0 AS (
    SELECT l_returnflag, count(*) AS n,
           CAST(sum(2 * x * (-y_fp)) AS BIGINT) AS gw,
           CAST(sum(2 * (-y_fp)) AS BIGINT) AS gb
    FROM d GROUP BY l_returnflag
), a1 AS (  -- t=1: zero velocity, so m1 = damp·step1
    SELECT l_returnflag, n,
           {_EAM_DAMP!r} * ({_EAM_LR!r} * ({_EAM_RHO!r}
               * (CAST(gw AS DOUBLE) / n))) AS m_w,
           {_EAM_DAMP!r} * ({_EAM_LR!r} * ({_EAM_RHO!r}
               * (CAST(gb AS DOUBLE) / n))) AS m_b,
           {_EAM_LR!r} * ({_EAM_RHO!r} * (CAST(gw AS DOUBLE) / n))
               AS st_w,
           {_EAM_LR!r} * ({_EAM_RHO!r} * (CAST(gb AS DOUBLE) / n))
               AS st_b
    FROM s0
), w1 AS (  -- center -= mom·m + damp·step, quantized to 1e-4
    SELECT l_returnflag, n, m_w, m_b,
           0 - CAST(floor(({_EAM_MOM!r} * m_w + {_EAM_DAMP!r} * st_w)
                 * 10000.0) AS BIGINT) AS w_fp,
           0 - CAST(floor(({_EAM_MOM!r} * m_b + {_EAM_DAMP!r} * st_b)
                 * 10000.0) AS BIGINT) AS b_fp
    FROM a1
), s1 AS (
    SELECT d.l_returnflag, w1.n, w1.m_w, w1.m_b, w1.w_fp, w1.b_fp,
           CAST(sum(2 * d.x * (w1.w_fp * d.x + w1.b_fp - d.y_fp))
                AS BIGINT) AS gw,
           CAST(sum(2 * (w1.w_fp * d.x + w1.b_fp - d.y_fp))
                AS BIGINT) AS gb
    FROM d JOIN w1 USING (l_returnflag)
    GROUP BY d.l_returnflag, w1.n, w1.m_w, w1.m_b, w1.w_fp, w1.b_fp
), a2 AS (
    SELECT l_returnflag, n, w_fp, b_fp,
           {_EAM_MOM!r} * m_w + {_EAM_DAMP!r} * ({_EAM_LR!r}
               * ({_EAM_RHO!r} * (CAST(gw AS DOUBLE) / n))) AS m_w2,
           {_EAM_MOM!r} * m_b + {_EAM_DAMP!r} * ({_EAM_LR!r}
               * ({_EAM_RHO!r} * (CAST(gb AS DOUBLE) / n))) AS m_b2,
           {_EAM_LR!r} * ({_EAM_RHO!r} * (CAST(gw AS DOUBLE) / n))
               AS st_w2,
           {_EAM_LR!r} * ({_EAM_RHO!r} * (CAST(gb AS DOUBLE) / n))
               AS st_b2
    FROM s1
)
SELECT l_returnflag, n,
       w_fp - CAST(floor(({_EAM_MOM!r} * m_w2 + {_EAM_DAMP!r} * st_w2)
              * 10000.0) AS BIGINT) AS w_fp,
       b_fp - CAST(floor(({_EAM_MOM!r} * m_b2 + {_EAM_DAMP!r} * st_b2)
              * 10000.0) AS BIGINT) AS b_fp
FROM a2
"""


@query("linreg_eamsgd_two_steps", oracle=_EAMSGD_ORACLE)
def linreg_eamsgd_two_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO exact EAMSGD center updates — the ELASTIC + damped-Nesterov
    mode's arithmetic driver-checked, the third optimizer branch after
    Adam and DynSGD. The update (operators/trainers.py::
    eamsgd_center_step): step = lr·(rho·grad), velocity m = mom·m +
    (1−mom)·step, center −= mom·m + (1−mom)·step — velocity carried as
    a DOUBLE column between rounds, deterministic because grads are
    exact int64 sums and every constant is the same inlined IEEE
    double on all three sides; the applied weight quantizes to 1e-4
    fixed point per step. tests/test_ml.py replays the trainer's own
    eamsgd_center_step. Same scale shape and int64 valve as the other
    replay queries."""
    l = _lt(spark, sf_dir, "lineitem")
    d = l.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        (F.floor("l_extendedprice").cast("long") * 10000).alias("y_fp"),
    )
    s0 = d.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(2 * F.col("x") * (-F.col("y_fp"))).alias("gw"),
        F.sum(2 * (-F.col("y_fp"))).alias("gb"),
    )

    def _step_col(gcol: str):
        return F.lit(_EAM_LR) * (
            F.lit(_EAM_RHO) * (F.col(gcol).cast("double") / F.col("n"))
        )

    def _delta(mcol, stcol):
        return F.floor(
            (F.lit(_EAM_MOM) * mcol + F.lit(_EAM_DAMP) * stcol)
            * F.lit(10000.0)
        ).cast("long")

    a1 = s0.select(
        "l_returnflag",
        "n",
        (F.lit(_EAM_DAMP) * _step_col("gw")).alias("m_w"),
        (F.lit(_EAM_DAMP) * _step_col("gb")).alias("m_b"),
        _step_col("gw").alias("st_w"),
        _step_col("gb").alias("st_b"),
    )
    w1 = a1.select(
        "l_returnflag",
        "n",
        "m_w",
        "m_b",
        (F.lit(0).cast("long") - _delta(F.col("m_w"), F.col("st_w"))).alias("w_fp"),
        (F.lit(0).cast("long") - _delta(F.col("m_b"), F.col("st_b"))).alias("b_fp"),
    )
    res = F.col("w_fp") * F.col("x") + F.col("b_fp") - F.col("y_fp")
    s1 = (
        d.join(w1, "l_returnflag")
        .groupBy("l_returnflag", "n", "m_w", "m_b", "w_fp", "b_fp")
        .agg(
            F.sum(2 * F.col("x") * res).alias("gw"),
            F.sum(2 * res).alias("gb"),
        )
    )
    a2 = s1.select(
        "l_returnflag",
        "n",
        "w_fp",
        "b_fp",
        (F.lit(_EAM_MOM) * F.col("m_w") + F.lit(_EAM_DAMP) * _step_col("gw")).alias(
            "m_w2"
        ),
        (F.lit(_EAM_MOM) * F.col("m_b") + F.lit(_EAM_DAMP) * _step_col("gb")).alias(
            "m_b2"
        ),
        _step_col("gw").alias("st_w2"),
        _step_col("gb").alias("st_b2"),
    )
    return a2.select(
        "l_returnflag",
        "n",
        (F.col("w_fp") - _delta(F.col("m_w2"), F.col("st_w2"))).alias("w_fp"),
        (F.col("b_fp") - _delta(F.col("m_b2"), F.col("st_b2"))).alias("b_fp"),
    )


# Adam ('adag' mode) constants, precomputed in Python and inlined as
# repr() DOUBLE literals on BOTH engine sides — writing `1 - 0.9` in
# DuckDB SQL would run in DECIMAL arithmetic (exact 0.1) while Spark
# and numpy compute the IEEE double 0.09999999999999998; inlining the
# Python-computed double makes the three arithmetics (query, oracle,
# operators/trainers.py::adam_step) bit-identical by construction.
_ADAM_B1, _ADAM_B2, _ADAM_EPS, _ADAM_LR = 0.9, 0.999, 1e-8, 0.05
_ADAM_C1 = 1 - _ADAM_B1  # (1-b1) m-coefficient
_ADAM_C2 = 1 - _ADAM_B2  # (1-b2) v-coefficient
_ADAM_BIAS1 = {1: 1 - _ADAM_B1**1, 2: 1 - _ADAM_B1**2}
_ADAM_BIAS2 = {1: 1 - _ADAM_B2**1, 2: 1 - _ADAM_B2**2}

_ADAM_ORACLE = f"""
WITH d AS (
    SELECT l_returnflag,
           CAST(l_quantity AS BIGINT) AS x,
           CAST(floor(l_extendedprice) AS BIGINT) * 10000 AS y_fp
    FROM lineitem
), s0 AS (  -- step 1 exact int64 gradient sums at (w,b) = (0,0)
    SELECT l_returnflag, count(*) AS n,
           CAST(sum(2 * x * (-y_fp)) AS BIGINT) AS gw,
           CAST(sum(2 * (-y_fp)) AS BIGINT) AS gb
    FROM d GROUP BY l_returnflag
), a1 AS (  -- Adam t=1: zero state, so m1=(1-b1)·g, v1=((1-b2)·g)·g
    SELECT l_returnflag, n,
           {_ADAM_C1!r} * (CAST(gw AS DOUBLE) / n) AS m_w,
           {_ADAM_C2!r} * (CAST(gw AS DOUBLE) / n)
               * (CAST(gw AS DOUBLE) / n) AS v_w,
           {_ADAM_C1!r} * (CAST(gb AS DOUBLE) / n) AS m_b,
           {_ADAM_C2!r} * (CAST(gb AS DOUBLE) / n)
               * (CAST(gb AS DOUBLE) / n) AS v_b
    FROM s0
), w1 AS (  -- quantized center update: w -= floor(step·1e4)
    SELECT l_returnflag, n, m_w, v_w, m_b, v_b,
           0 - CAST(floor({_ADAM_LR!r} * (m_w / {_ADAM_BIAS1[1]!r})
                 / (sqrt(v_w / {_ADAM_BIAS2[1]!r}) + {_ADAM_EPS!r})
                 * 10000.0) AS BIGINT) AS w_fp,
           0 - CAST(floor({_ADAM_LR!r} * (m_b / {_ADAM_BIAS1[1]!r})
                 / (sqrt(v_b / {_ADAM_BIAS2[1]!r}) + {_ADAM_EPS!r})
                 * 10000.0) AS BIGINT) AS b_fp
    FROM a1
), s1 AS (  -- step 2 gradients at the quantized (w1, b1)
    SELECT d.l_returnflag, w1.n, w1.m_w, w1.v_w, w1.m_b, w1.v_b,
           w1.w_fp, w1.b_fp,
           CAST(sum(2 * d.x * (w1.w_fp * d.x + w1.b_fp - d.y_fp))
                AS BIGINT) AS gw,
           CAST(sum(2 * (w1.w_fp * d.x + w1.b_fp - d.y_fp))
                AS BIGINT) AS gb
    FROM d JOIN w1 USING (l_returnflag)
    GROUP BY d.l_returnflag, w1.n, w1.m_w, w1.v_w, w1.m_b, w1.v_b,
             w1.w_fp, w1.b_fp
), a2 AS (  -- Adam t=2: m2=b1·m1+(1-b1)·g2, v2=b2·v1+((1-b2)·g2)·g2
    SELECT l_returnflag, n, w_fp, b_fp,
           {_ADAM_B1!r} * m_w + {_ADAM_C1!r} * (CAST(gw AS DOUBLE) / n)
               AS m_w2,
           {_ADAM_B2!r} * v_w + {_ADAM_C2!r} * (CAST(gw AS DOUBLE) / n)
               * (CAST(gw AS DOUBLE) / n) AS v_w2,
           {_ADAM_B1!r} * m_b + {_ADAM_C1!r} * (CAST(gb AS DOUBLE) / n)
               AS m_b2,
           {_ADAM_B2!r} * v_b + {_ADAM_C2!r} * (CAST(gb AS DOUBLE) / n)
               * (CAST(gb AS DOUBLE) / n) AS v_b2
    FROM s1
)
SELECT l_returnflag, n,
       w_fp - CAST(floor({_ADAM_LR!r} * (m_w2 / {_ADAM_BIAS1[2]!r})
              / (sqrt(v_w2 / {_ADAM_BIAS2[2]!r}) + {_ADAM_EPS!r})
              * 10000.0) AS BIGINT) AS w_fp,
       b_fp - CAST(floor({_ADAM_LR!r} * (m_b2 / {_ADAM_BIAS1[2]!r})
              / (sqrt(v_b2 / {_ADAM_BIAS2[2]!r}) + {_ADAM_EPS!r})
              * 10000.0) AS BIGINT) AS b_fp
FROM a2
"""


@query("linreg_adam_two_steps", oracle=_ADAM_ORACLE)
def linreg_adam_two_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO exact ADAG (Adam) optimizer steps of the same linear model
    as `linreg_gd_two_steps` — the ADAPTIVE update rule itself made
    driver-checkable (VERDICT r6 #3). Where the GD query proved the
    synchronous-rounds loop (broadcast → partial int64 gradient sums →
    center update), this one replays the full Adam state machine
    (operators/trainers.py::adam_step, the 'adag' mode): first/second
    moment EMAs, bias correction, eps-guarded rsqrt scaling — in
    DOUBLE, deterministically, because every input is an exact int64
    gradient sum and every constant is the same inlined IEEE double on
    all three sides (Spark, DuckDB, numpy). The weight applied to the
    next scan is quantized to integer 1e-4 fixed point per step
    (w -= floor(step·1e4)), which is what keeps step-2's gradient sums
    exactly summable; tests/test_ml.py pins this query's output to a
    numpy replay that calls the trainer's own adam_step on the same
    sums.

    Scale shape: identical to linreg_gd_two_steps — per step ONE
    partial-aggregated scan plus a model-sized join back; Adam state
    (m, v per group) rides in the model frame, never the fact. Same
    int64 valve: gradient sums stay in-range to SF ≈ 10, then promote
    to DECIMAL(38,0).

    r14 staging A/B (negative result, kept lazy): the (flag, x, y_fp)
    base frame feeds both step aggregates (final-plan audit:
    lineitem×2, zero ReusedExchange), but localCheckpoint-staging it
    measured WORSE on a genuinely quiet window (steal 0.0%, busy ~5%):
    staged min 1.187s vs lazy 1.001s over 6 interleaved rounds (lazy
    won 4/6). The duplicated work is a narrow 3-column codegen scan +
    cast projection — cheaper to recompute than to round-trip ~15 MB
    through checkpoint blocks. Same class as bootstrap_ci_mean's two
    narrow orders scans (kept lazy for the same reason)."""
    l = _lt(spark, sf_dir, "lineitem")
    d = l.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        (F.floor("l_extendedprice").cast("long") * 10000).alias("y_fp"),
    )
    s0 = d.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(2 * F.col("x") * (-F.col("y_fp"))).alias("gw"),
        F.sum(2 * (-F.col("y_fp"))).alias("gb"),
    )

    def _grad(gcol: str):
        return F.col(gcol).cast("double") / F.col("n")

    def _delta(mcol, vcol, t: int):
        mh = mcol / F.lit(_ADAM_BIAS1[t])
        vh = vcol / F.lit(_ADAM_BIAS2[t])
        return F.floor(
            F.lit(_ADAM_LR) * mh / (F.sqrt(vh) + F.lit(_ADAM_EPS))
            * F.lit(10000.0)
        ).cast("long")

    a1 = s0.select(
        "l_returnflag",
        "n",
        (F.lit(_ADAM_C1) * _grad("gw")).alias("m_w"),
        (F.lit(_ADAM_C2) * _grad("gw") * _grad("gw")).alias("v_w"),
        (F.lit(_ADAM_C1) * _grad("gb")).alias("m_b"),
        (F.lit(_ADAM_C2) * _grad("gb") * _grad("gb")).alias("v_b"),
    )
    w1 = a1.select(
        "l_returnflag",
        "n",
        "m_w",
        "v_w",
        "m_b",
        "v_b",
        (F.lit(0).cast("long") - _delta(F.col("m_w"), F.col("v_w"), 1)).alias("w_fp"),
        (F.lit(0).cast("long") - _delta(F.col("m_b"), F.col("v_b"), 1)).alias("b_fp"),
    )
    res = F.col("w_fp") * F.col("x") + F.col("b_fp") - F.col("y_fp")
    s1 = (
        d.join(w1, "l_returnflag")
        .groupBy("l_returnflag", "n", "m_w", "v_w", "m_b", "v_b", "w_fp", "b_fp")
        .agg(
            F.sum(2 * F.col("x") * res).alias("gw"),
            F.sum(2 * res).alias("gb"),
        )
    )
    a2 = s1.select(
        "l_returnflag",
        "n",
        "w_fp",
        "b_fp",
        (F.lit(_ADAM_B1) * F.col("m_w") + F.lit(_ADAM_C1) * _grad("gw")).alias("m_w2"),
        (
            F.lit(_ADAM_B2) * F.col("v_w")
            + F.lit(_ADAM_C2) * _grad("gw") * _grad("gw")
        ).alias("v_w2"),
        (F.lit(_ADAM_B1) * F.col("m_b") + F.lit(_ADAM_C1) * _grad("gb")).alias("m_b2"),
        (
            F.lit(_ADAM_B2) * F.col("v_b")
            + F.lit(_ADAM_C2) * _grad("gb") * _grad("gb")
        ).alias("v_b2"),
    )
    return a2.select(
        "l_returnflag",
        "n",
        (F.col("w_fp") - _delta(F.col("m_w2"), F.col("v_w2"), 2)).alias("w_fp"),
        (F.col("b_fp") - _delta(F.col("m_b2"), F.col("v_b2"), 2)).alias("b_fp"),
    )
