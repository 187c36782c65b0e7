"""ML parity + correctness gates (SURVEY.md §5.2.6): the distributed
trainer must reach the single-node trainer's quality; the Arrow
predictor must agree with driver-side numpy inference bit-for-bit."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from dist_keras_spark.operators.evaluators import AccuracyEvaluator
from dist_keras_spark.operators.models import MLP
from dist_keras_spark.operators.predictors import ModelPredictor
from dist_keras_spark.operators.trainers import (
    ADAG,
    AveragingTrainer,
    EnsembleTrainer,
    SingleTrainer,
    SyncDistributedTrainer,
)

DIMS = (64, 16, 10)


@pytest.fixture(scope="module")
def train_df(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(F.col("embedding").alias("features"), "label", "vec_id")
    )
    df.cache().count()
    return df


def test_single_trainer_loss_decreases(train_df):
    t = SingleTrainer(*DIMS, num_epoch=5, learning_rate=0.3)
    t.train(train_df)
    losses = [h["loss"] for h in t.history]
    assert losses[-1] < losses[0]


def test_distributed_parity_with_single(train_df):
    """Sync-rounds trainer converges like the sequential baseline."""
    single = SingleTrainer(*DIMS, num_epoch=8, learning_rate=0.3)
    ws_s = single.train(train_df)
    dist = SyncDistributedTrainer(
        *DIMS, mode="downpour", num_workers=4, rounds=25, learning_rate=0.5
    )
    ws_d = dist.train(train_df)

    def acc(ws):
        pred = ModelPredictor(MLP.serialize(ws), *DIMS).predict(train_df)
        return AccuracyEvaluator(argmax=True).evaluate(pred)

    a_s, a_d = acc(ws_s), acc(ws_d)
    dist_losses = [h["loss"] for h in dist.history]
    assert dist_losses[-1] < dist_losses[0], "distributed loss must decrease"
    assert a_d >= a_s - 0.1, f"distributed {a_d} too far below single {a_s}"


def test_adag_mode_converges_faster_than_plain_sgd(train_df):
    plain = SyncDistributedTrainer(*DIMS, mode="downpour", num_workers=4, rounds=10, learning_rate=0.05)
    plain.train(train_df)
    adag = ADAG(*DIMS, num_workers=4, rounds=10, learning_rate=0.05)
    adag.train(train_df)
    assert adag.history[-1]["loss"] <= plain.history[-1]["loss"] + 1e-6


def test_ensemble_returns_n_models(train_df):
    t = EnsembleTrainer(*DIMS, num_models=3, num_epoch=1)
    models = t.train(train_df)
    assert len(models) == 3
    assert all(len(ws) == 4 for ws in models)


def test_averaging_weights_shape_and_effect(train_df):
    t = AveragingTrainer(*DIMS, num_models=3, num_epoch=2, learning_rate=0.3)
    ws = t.train(train_df)
    init = MLP(*DIMS).get_weights()
    assert all(w.shape == i.shape for w, i in zip(ws, init))
    assert any(not np.allclose(w, i) for w, i in zip(ws, init)), "training moved weights"


def test_predictor_matches_driver_numpy(train_df):
    """Arrow predictor == local forward pass, elementwise."""
    model = MLP(*DIMS)
    pred = ModelPredictor(MLP.serialize(model.get_weights()), *DIMS).predict(train_df)
    rows = pred.select("vec_id", "features", "prediction").orderBy("vec_id").limit(16).collect()
    x = np.stack([np.asarray(r["features"], dtype=np.float64) for r in rows])
    expected = model.forward(x)
    got = np.stack([np.asarray(r["prediction"]) for r in rows])
    np.testing.assert_allclose(got, expected, rtol=1e-12)
    # probabilities sum to 1
    np.testing.assert_allclose(got.sum(axis=1), 1.0, rtol=1e-9)


def test_evaluator_known_values(spark):
    df = spark.createDataFrame(
        [(1.0, 1), (0.0, 1), (2.0, 2), (2.0, 2)], "prediction double, label int"
    )
    assert AccuracyEvaluator().evaluate(df) == 0.75


def test_evaluator_argmax_mode(spark):
    df = spark.createDataFrame(
        [([0.1, 0.9], 1), ([0.8, 0.2], 1)], "prediction array<double>, label int"
    )
    assert AccuracyEvaluator(argmax=True).evaluate(df) == 0.5


def test_predict_batch_udf_matches_pandas_predictor(train_df):
    """The predict_batch_udf path must agree with ModelPredictor."""
    from dist_keras_spark.operators.predictors import predict_with_batch_udf

    model = MLP(*DIMS)
    ws = MLP.serialize(model.get_weights())
    a = (
        ModelPredictor(ws, *DIMS).predict(train_df)
        .select("vec_id", "prediction").orderBy("vec_id").limit(8).collect()
    )
    b = (
        predict_with_batch_udf(train_df, ws, *DIMS)
        .select("vec_id", "prediction").orderBy("vec_id").limit(8).collect()
    )
    for ra, rb in zip(a, b):
        np.testing.assert_allclose(ra["prediction"], rb["prediction"], rtol=1e-12)


def test_convnet_gradcheck():
    """ConvNet1D.loss_grad against central finite differences — the
    gradient math is hand-derived, so verify it numerically."""
    from dist_keras_spark.operators.models import ConvNet1D

    rng = np.random.RandomState(0)
    m = ConvNet1D(12, n_filters=3, n_out=4, kernel=5, seed=1)
    x = rng.randn(6, 12)
    y = rng.randint(0, 4, size=6)
    _, grads = m.loss_grad(x, y)
    eps = 1e-6
    for w, g in zip(m.get_weights(), grads):
        it = np.nditer(w, flags=["multi_index"])
        for _ in range(min(w.size, 5)):  # spot-check 5 coords per tensor
            i = it.multi_index
            orig = w[i]
            w[i] = orig + eps
            lp, _ = m.loss_grad(x, y)
            w[i] = orig - eps
            lm, _ = m.loss_grad(x, y)
            w[i] = orig
            np.testing.assert_allclose(g[i], (lp - lm) / (2 * eps), rtol=1e-4, atol=1e-7)
            it.iternext()


def test_pluggable_model_trains_distributed(train_df):
    """The model contract is pluggable: a ConvNet1D trains through the
    SAME SyncDistributedTrainer and scores through the SAME
    ModelPredictor as the MLP (mirrors the reference's mnist.ipynb
    convnet-through-the-common-trainer path)."""
    from dist_keras_spark.operators.models import ConvNet1D

    factory = lambda: ConvNet1D(64, n_filters=4, n_out=10, kernel=9, seed=42)  # noqa: E731
    dist = SyncDistributedTrainer(
        *DIMS, mode="adag", num_workers=4, rounds=12, learning_rate=0.05,
        model_factory=factory,
    )
    ws = dist.train(train_df)
    losses = [h["loss"] for h in dist.history]
    assert losses[-1] < losses[0], "convnet loss must decrease through the shared trainer"
    # shapes round-trip through the generic flatten/unflatten exchange
    like = factory().get_weights()
    assert [w.shape for w in ws] == [w.shape for w in like]
    # and the shared Arrow predictor scores it
    pred = ModelPredictor(
        ConvNet1D.serialize(ws), *DIMS, model_factory=factory
    ).predict(train_df)
    rows = pred.select("prediction").limit(4).collect()
    got = np.stack([np.asarray(r["prediction"]) for r in rows])
    np.testing.assert_allclose(got.sum(axis=1), 1.0, rtol=1e-9)


def test_get_averaged_history(train_df):
    t = SingleTrainer(*DIMS, num_epoch=3, learning_rate=0.3)
    t.train(train_df)
    losses = [h["loss"] for h in t.history]
    assert t.get_averaged_history("loss") == pytest.approx(sum(losses) / len(losses))
    t.add_history(round=1)  # marker entry without the metric: ignored
    assert t.get_averaged_history("loss") == pytest.approx(sum(losses) / len(losses))
    with pytest.raises(ValueError, match="no history"):
        t.get_averaged_history("nope")


def test_mnist_style_reshape_convnet_pipeline(train_df):
    """Replay of the reference's examples/mnist.ipynb shape:
    ReshapeTransformer declares the 2-D view of the flat features, a
    convnet consumes them through the SAME distributed trainer, and
    the shared predictor + evaluator close the loop. (The reshape is
    metadata in a columnar engine — ConvNet1D reads the flat vector,
    exactly as the Arrow boundary would hand a real conv the buffer.)"""
    from dist_keras_spark.operators.models import ConvNet1D
    from dist_keras_spark.operators.transformers import ReshapeTransformer

    shaped = ReshapeTransformer("features", "image", (8, 8)).transform(train_df)
    row = shaped.select("image_shape").first()
    assert list(row["image_shape"]) == [8, 8]

    factory = lambda: ConvNet1D(64, n_filters=4, n_out=10, kernel=9, seed=42)  # noqa: E731
    t = SyncDistributedTrainer(
        *DIMS, mode="adag", num_workers=4, rounds=10, learning_rate=0.05,
        features_col="image", model_factory=factory,
    )
    ws = t.train(shaped)
    losses = [h["loss"] for h in t.history]
    assert losses[-1] < losses[0]

    pred = ModelPredictor(
        ConvNet1D.serialize(ws), *DIMS, features_col="image", model_factory=factory
    ).predict(shaped.withColumn("label", F.col("label")))
    acc = AccuracyEvaluator(argmax=True).evaluate(pred)
    assert acc >= 0.1  # trained-better-than-nothing on 10 classes


def test_adam_replay_query_matches_trainer_adam_step(spark, sf_dir):
    """linreg_adam_two_steps must equal a numpy replay that drives the
    TRAINER'S OWN adam_step (operators/trainers.py) on the same exact
    int64 gradient sums with the same per-step 1e-4 quantization —
    pinning the query's arithmetic to the 'adag' optimizer branch,
    not a re-derivation of it (VERDICT r6 #3)."""
    import pandas as pd

    from dist_keras_spark.operators.trainers import adam_step
    from dist_keras_spark.plans.ml import (
        _ADAM_LR,
        linreg_adam_two_steps,
    )

    got = {
        r.l_returnflag: (r.n, r.w_fp, r.b_fp)
        for r in linreg_adam_two_steps(spark, sf_dir).collect()
    }

    pdf = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    x = pdf["l_quantity"].astype("int64").to_numpy()
    y_fp = np.floor(pdf["l_extendedprice"].to_numpy()).astype("int64") * 10000
    for flag, grp in pdf.groupby("l_returnflag"):
        idx = grp.index.to_numpy()
        xs, ys = x[idx], y_fp[idx]
        n = len(xs)
        center = np.zeros(2)  # continuous Adam center (w, b)
        m, v = np.zeros(2), np.zeros(2)
        w_fp = np.zeros(2, dtype=np.int64)  # quantized applied weights
        for t in (1, 2):
            res = w_fp[0] * xs + w_fp[1] - ys  # int64, exact
            grad = np.array(
                [
                    float(np.sum(2 * xs * res, dtype=np.int64)) / n,
                    float(np.sum(2 * res, dtype=np.int64)) / n,
                ]
            )
            new_center, m, v = adam_step(center, m, v, t, grad, _ADAM_LR)
            step = center - new_center  # what Adam subtracted
            w_fp = w_fp - np.floor(step * 10000.0).astype(np.int64)
            center = np.zeros(2)  # center is only a step carrier here
        assert got[flag] == (n, int(w_fp[0]), int(w_fp[1])), flag


def test_dynsgd_replay_query_matches_trainer_lr_decay(spark, sf_dir):
    """linreg_dynsgd_two_steps must equal a numpy replay using the
    trainer's own dynsgd_lr decay expression on the same exact int64
    gradient sums (base step = g/1e4/n, matching linreg_gd_two_steps'
    lr convention)."""
    import math

    import pandas as pd

    from dist_keras_spark.operators.trainers import dynsgd_lr
    from dist_keras_spark.plans.ml import linreg_dynsgd_two_steps

    got = {
        r.l_returnflag: (r.n, r.w_fp, r.b_fp)
        for r in linreg_dynsgd_two_steps(spark, sf_dir).collect()
    }
    pdf = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    x = pdf["l_quantity"].astype("int64").to_numpy()
    y_fp = np.floor(pdf["l_extendedprice"].to_numpy()).astype("int64") * 10000
    for flag, grp in pdf.groupby("l_returnflag"):
        idx = grp.index.to_numpy()
        xs, ys = x[idx], y_fp[idx]
        n = len(xs)
        w_fp, b_fp = 0, 0
        for t in (1, 2):
            res = w_fp * xs + b_fp - ys
            gw = int(np.sum(2 * xs * res, dtype=np.int64))
            gb = int(np.sum(2 * res, dtype=np.int64))
            k = dynsgd_lr(1.0, t)
            w_fp -= math.floor(float(gw) / 10000.0 / n * k)
            b_fp -= math.floor(float(gb) / 10000.0 / n * k)
        assert got[flag] == (n, w_fp, b_fp), flag


def test_eamsgd_replay_query_matches_trainer_center_step(spark, sf_dir):
    """linreg_eamsgd_two_steps must equal a numpy replay driving the
    trainer's own eamsgd_center_step on the same exact int64 gradient
    sums, with the query's per-step 1e-4 delta quantization."""
    import pandas as pd

    from dist_keras_spark.operators.trainers import eamsgd_center_step
    from dist_keras_spark.plans.ml import (
        _EAM_LR,
        _EAM_MOM,
        _EAM_RHO,
        linreg_eamsgd_two_steps,
    )

    got = {
        r.l_returnflag: (r.n, r.w_fp, r.b_fp)
        for r in linreg_eamsgd_two_steps(spark, sf_dir).collect()
    }
    pdf = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    x = pdf["l_quantity"].astype("int64").to_numpy()
    y_fp = np.floor(pdf["l_extendedprice"].to_numpy()).astype("int64") * 10000
    for flag, grp in pdf.groupby("l_returnflag"):
        idx = grp.index.to_numpy()
        xs, ys = x[idx], y_fp[idx]
        n = len(xs)
        m = np.zeros(2)
        w_fp = np.zeros(2, dtype=np.int64)
        for t in (1, 2):
            res = w_fp[0] * xs + w_fp[1] - ys
            grad = np.array(
                [
                    float(np.sum(2 * xs * res, dtype=np.int64)) / n,
                    float(np.sum(2 * res, dtype=np.int64)) / n,
                ]
            )
            new_center, m = eamsgd_center_step(
                np.zeros(2), m, grad, _EAM_LR, _EAM_RHO, _EAM_MOM
            )
            delta = -new_center  # center started at 0: the applied step
            w_fp = w_fp - np.floor(delta * 10000.0).astype(np.int64)
        assert got[flag] == (n, int(w_fp[0]), int(w_fp[1])), flag


def test_weighted_mean_merge_pinned_to_weight_average_exact(spark, sf_dir):
    """The weight_average_exact query (plans/analytics5.py) replays
    AveragingTrainer's OWN merge function: weighted_mean_merge on the
    query's integer-quantized shard payloads must equal the query's
    `merged` column BITWISE (integer-valued float64 sums are exact in
    any order, so the single final division is the only rounding on
    either side)."""
    from dist_keras_spark.operators.trainers import weighted_mean_merge
    from dist_keras_spark.plans.analytics5 import weight_average_exact

    got = {
        r["component"]: r["merged"]
        for r in weight_average_exact(spark, sf_dir).collect()
    }
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    shards = (
        l.groupBy(F.pmod(F.col("l_suppkey"), F.lit(8)).alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.pmod(F.sum(F.col("l_quantity").cast("long")), F.lit(997)).alias("w1"),
            F.pmod(
                F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")),
                F.lit(997),
            ).alias("w2"),
            F.pmod(F.sum(F.col("l_partkey").cast("long")), F.lit(997)).alias("w3"),
            F.pmod(F.sum(F.col("l_orderkey").cast("long")), F.lit(997)).alias("w4"),
        )
        .collect()
    )
    payloads = [
        np.array([r["w1"], r["w2"], r["w3"], r["w4"]], dtype=np.float64)
        for r in shards
    ]
    ns = [r["n"] for r in shards]
    merged = weighted_mean_merge(payloads, ns)
    for j, comp in enumerate(["w1", "w2", "w3", "w4"]):
        assert merged[j] == got[comp], (comp, merged[j], got[comp])


# ---------------------------------------------------------------------------
# Golden loss trajectories (VERDICT r8 #7): the multi-epoch float
# iteration of every trainer mode is the one surface no fixed-point
# oracle can express — pin it to recorded fixed-seed values instead so
# a silent optimizer regression fails loudly. The dataset is synthetic
# and built in-test (fixture-regeneration-proof); trajectories were
# recorded from two independent sessions (bit-identical) on numpy
# float64 + the deterministic repartition/collect order of local mode.
# Tolerance 1e-9 relative: loose enough for a BLAS swap's last-ulp
# jitter, tight enough that any arithmetic change trips it.

_GOLDEN_LOSSES = {
    "single": [0.447136205952, 0.101407550684, 0.060039701994, 0.042634686546],
    "adag": [1.283818901057, 0.224007524292, 0.081891383645, 0.055435949043],
    "dynsgd": [1.283818901057, 0.685308569935, 0.441336063062, 0.332696842273],
    "eamsgd": [1.283818901057, 0.986330330926, 0.662895634054, 0.400833557974],
    "downpour": [1.283818901057, 0.664054021005, 0.414720701412, 0.306443634815],
}


@pytest.fixture(scope="module")
def golden_df(spark):
    rng = np.random.RandomState(0)
    n, dim, k = 256, 16, 4
    centers = rng.randn(k, dim) * 2.0
    labels = np.arange(n) % k
    feats = centers[labels] + rng.randn(n, dim)
    rows = [
        (int(i), [float(v) for v in feats[i]], int(labels[i]))
        for i in range(n)
    ]
    df = (
        spark.createDataFrame(
            rows, "vec_id: long, features: array<double>, label: long"
        )
        .repartition(4, "vec_id")
        .sortWithinPartitions("vec_id")
        .cache()
    )
    df.count()
    return df


def test_single_trainer_matches_golden_trajectory(golden_df):
    t = SingleTrainer(16, 8, 4, num_epoch=4, learning_rate=0.3, seed=42)
    t.train(golden_df.orderBy("vec_id"))
    losses = [h["loss"] for h in t.history]
    assert losses == pytest.approx(_GOLDEN_LOSSES["single"], rel=1e-9)


@pytest.mark.parametrize("mode", ["adag", "dynsgd", "eamsgd", "downpour"])
def test_sync_trainer_matches_golden_trajectory(golden_df, mode):
    tr = SyncDistributedTrainer(
        16, 8, 4, mode=mode, num_workers=4, rounds=4,
        learning_rate=0.3, seed=42,
    )
    tr.train(golden_df)
    losses = [h["loss"] for h in tr.history]
    assert losses == pytest.approx(_GOLDEN_LOSSES[mode], rel=1e-9)


def test_sgd_ten_step_trajectory_sane(spark):
    """linreg_minibatch_sgd_ten_steps: 10 history rows per return
    flag with contiguous steps; every step's batch is one of the 5
    md5 buckets, which partition the fact exactly (sum of batch
    sizes over one rotation cycle == group size); and weights move —
    the trajectory is not a fixed point after step 1 (mini-batch
    rotation re-excites the gradient even if one batch converges)."""
    from dist_keras_spark.plans.ml import (
        _SGD_BATCHES,
        linreg_minibatch_sgd_ten_steps,
    )
    from dist_keras_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    rows = [
        r.asDict()
        for r in linreg_minibatch_sgd_ten_steps(spark, sf).collect()
    ]
    by_flag = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append(r)
    assert len(by_flag) == 3
    from dist_keras_spark.operators.quality import md5_shard

    l = load_table(spark, sf, "lineitem")
    batch = md5_shard(["l_orderkey", "l_linenumber"], _SGD_BATCHES)
    sizes = {
        (r["l_returnflag"], r["b"]): r["n"]
        for r in l.groupBy("l_returnflag", batch.alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    group_totals = {
        r["l_returnflag"]: r["n"]
        for r in l.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for flag, hist in by_flag.items():
        hist.sort(key=lambda r: r["step"])
        assert [h["step"] for h in hist] == list(range(1, 11))
        # each step's n_batch equals the md5 bucket's true size
        for h in hist:
            b = (h["step"] - 1) % _SGD_BATCHES
            assert h["n_batch"] == sizes[(flag, b)]
        # one full rotation covers the whole group exactly — compared
        # against an INDEPENDENT count of the group (code-review r13:
        # the old form summed the same dict on both sides)
        assert (
            sum(sizes[(flag, b)] for b in range(_SGD_BATCHES))
            == group_totals[flag]
        )
        # the trajectory moves: at least one later step changes w
        ws = [h["w_fp"] for h in hist]
        assert len(set(ws)) > 1


def test_parallel_sgd_average_structure(spark):
    """linreg_parallel_sgd_average: the 4 md5 shards partition each
    return-flag group exactly (Σ n_shard == group size), and the
    worker=-1 row is the exact integer mean (sum div 4) of the four
    local endpoints — the AveragingTrainer merge arithmetic on the
    replay's own rows."""
    from dist_keras_spark.plans.ml import (
        _PAR_WORKERS,
        linreg_parallel_sgd_average,
    )
    from dist_keras_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    rows = [
        r.asDict() for r in linreg_parallel_sgd_average(spark, sf).collect()
    ]
    by_flag = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], {})[r["worker"]] = r
    totals = {
        r["l_returnflag"]: r["n"]
        for r in load_table(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(by_flag) == 3
    for flag, by_worker in by_flag.items():
        assert set(by_worker) == {-1, 0, 1, 2, 3}
        locals_ = [by_worker[w] for w in range(_PAR_WORKERS)]
        avg = by_worker[-1]
        assert sum(r["n_shard"] for r in locals_) == totals[flag]
        assert avg["n_shard"] == totals[flag]
        # python int // matches both engines' BIGINT truncating div on
        # the (positive) sums here; exactness of the merge arithmetic
        assert avg["w_fp"] == sum(r["w_fp"] for r in locals_) // _PAR_WORKERS
        assert avg["b_fp"] == sum(r["b_fp"] for r in locals_) // _PAR_WORKERS
        # workers saw different data → different local models
        assert len({(r["w_fp"], r["b_fp"]) for r in locals_}) > 1
