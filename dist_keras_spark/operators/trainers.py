"""Distributed training (SURVEY.md §2.I I1-I8) — the reference's core,
re-architected for Spark's execution model.

Reference architecture (and why it doesn't survive scale):
  distkeras/trainers.py (~L350-760) ships a pickled Keras model in an
  RDD closure, runs `mapPartitionsWithIndex(worker.train)`, and every
  worker talks to a socket parameter server THREAD on the driver
  (distkeras/parameter_servers.py §SocketParameterServer.run ~L60-120,
  networking.py §send_data ~L40-100). Async variants (DOWNPOUR, AEASGD,
  EAMSGD, DynSGD, ADAG) differ only in the commit rule. The PS socket
  is a driver bandwidth SPOF, breaks under task retry (a replayed task
  double-commits its deltas), and bypasses Spark's scheduler entirely.

Our replacement: **synchronous rounds** driven by the driver —
    loop: broadcast weights → mapInPandas computes per-partition
    gradient sums over Arrow batches → driver reduces → optimizer step.
Every boundary is Spark-managed (broadcast, Arrow, collect of
model-sized vectors only — never data). Deterministic, retry-safe
(gradients are pure functions of the partition), and elastic. The
async commit rules survive as *optimizer modes*:
  - 'downpour'  → plain SGD on the summed gradient (I4)
  - 'adag'      → Adam-style normalized accumulation (I8's intent)
  - 'easgd'     → elastic coupling between per-partition local models
                  and the center (I5/I6), one elastic step per round
  - 'dynsgd'    → staleness vanishes under synchrony; kept as an LR
                  schedule knob for API parity (I7)
What is preserved is the *capability* — data-parallel training that
converges — not the race conditions (SURVEY.md §7 risk 1).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dist_keras_spark.operators.models import MLP

# Output schema for gradient/weight exchange: flattened doubles + count.
_EXCHANGE_SCHEMA = "part_id long, n long, loss double, payload array<double>"


def _flatten(ws: list[np.ndarray]) -> np.ndarray:
    return np.concatenate([w.ravel() for w in ws])


def _unflatten(flat: np.ndarray, like: list[np.ndarray]) -> list[np.ndarray]:
    # .copy() is load-bearing: a reshape of a slice is a VIEW into
    # `flat`, and set_weights/np.asarray won't copy a same-dtype array
    # — so a model built from views would silently mutate `flat` (e.g.
    # a broadcast center) on every in-place SGD step, making the
    # reported center→local movement identically zero.
    out, off = [], 0
    for w in like:
        out.append(np.asarray(flat[off : off + w.size]).reshape(w.shape).copy())
        off += w.size
    return out


def weighted_mean_merge(payloads: list[np.ndarray], ns: list[int]) -> np.ndarray:
    """I3/D10 merge rule: n-weighted mean of flattened weight vectors.

    Factored out of AveragingTrainer.train so the arithmetic itself is
    driver-checkable (the optimizer-replay pattern, plans/ml.py): the
    single-rounding formulation Σ(payload·n) / Σn — integer-exact up
    to 2^53 when payloads are integer-valued — is replayed hash-exact
    by the `weight_average_exact` query (plans/analytics5.py), which
    pins this function via tests/test_ml.py. Mathematically identical
    to the per-shard Σ(payload·(n/total)) form and numerically tighter
    (one rounding instead of one per shard)."""
    total = float(sum(ns))
    acc = np.zeros_like(payloads[0])
    for p, n in zip(payloads, ns):
        acc += p * float(n)
    return acc / total


def _xy(pdf_iter: Iterator[pd.DataFrame], features_col: str, label_col: str):
    for pdf in pdf_iter:
        if len(pdf):
            yield np.stack(pdf[features_col].to_numpy()).astype(np.float64), pdf[
                label_col
            ].to_numpy().astype(np.int64)


def adam_step(
    center: np.ndarray,
    m: np.ndarray,
    v: np.ndarray,
    t: int,
    grad: np.ndarray,
    lr: float,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """ONE ADAG ('adag' mode = Adam) center update — the exact
    arithmetic SyncDistributedTrainer applies per round, factored out
    so the hash-exact replay query (plans/ml.py::linreg_adam_two_steps)
    and its pytest can pin THIS code rather than a re-derivation.
    Returns (new_center, new_m, new_v); t is 1-based."""
    b1, b2, eps = 0.9, 0.999, 1e-8
    m = b1 * m + (1 - b1) * grad
    v = b2 * v + (1 - b2) * grad * grad
    mh = m / (1 - b1**t)
    vh = v / (1 - b2**t)
    center = center - lr * mh / (np.sqrt(vh) + eps)
    return center, m, v


def eamsgd_center_step(
    center: np.ndarray,
    m: np.ndarray,
    grad: np.ndarray,
    lr: float,
    rho: float,
    momentum: float,
) -> tuple[np.ndarray, np.ndarray]:
    """ONE EAMSGD center update (elastic step + damped Nesterov
    momentum) — factored out of the 'eamsgd' mode for the fixed-point
    replay query (plans/ml.py::linreg_eamsgd_two_steps) and its
    pytest. Returns (new_center, new_m)."""
    step = lr * (rho * grad)
    m = momentum * m + (1 - momentum) * step
    center = center - (momentum * m + (1 - momentum) * step)
    return center, m


def dynsgd_lr(lr: float, t: int) -> float:
    """The DynSGD decayed learning rate — factored out of the 'dynsgd'
    mode for the same reason as adam_step: the fixed-point replay
    query (plans/ml.py::linreg_dynsgd_two_steps) and its pytest pin
    THIS expression, not a re-derivation. t is 1-based."""
    return lr / (1 + 0.05 * t)


class Trainer:
    """Base trainer: dims + SGD hyperparameters + wall-clock history
    (parity with distkeras/trainers.py §Trainer.add_history ~L60-120).

    `model_factory` makes the model pluggable (the reference ships any
    Keras architecture; here any zero-arg callable returning an object
    with forward/loss_grad/get_weights/set_weights works — e.g.
    `lambda: ConvNet1D(64, n_filters=8, n_out=10)`). Default: the MLP
    built from `dims`. The factory is shipped to executors inside the
    mapInPandas closure, so it must be picklable (cloudpickle handles
    lambdas and local functions)."""

    def __init__(
        self,
        n_in: int,
        n_hidden: int,
        n_out: int,
        features_col: str = "features",
        label_col: str = "label",
        num_epoch: int = 1,
        batch_size: int = 32,
        learning_rate: float = 0.1,
        seed: int = 42,
        model_factory=None,
    ) -> None:
        self.dims = (n_in, n_hidden, n_out)
        self.features_col = features_col
        self.label_col = label_col
        self.num_epoch = num_epoch
        self.batch_size = batch_size
        self.learning_rate = learning_rate
        self.seed = seed
        self.model_factory = model_factory
        self.history: list[dict] = []

    def _new_model(self):
        if self.model_factory is not None:
            return self.model_factory()
        return MLP(*self.dims, seed=self.seed)

    def add_history(self, **kw) -> None:
        self.history.append({"t": time.time(), **kw})

    def get_averaged_history(self, metric: str = "loss") -> float:
        """Mean of `metric` across all recorded history entries that
        carry it (parity with distkeras/trainers.py
        §Trainer.get_averaged_history ~L100, which averages worker
        training histories). Entries without the metric (e.g. round
        markers) are ignored; raises if none carry it."""
        vals = [h[metric] for h in self.history if metric in h]
        if not vals:
            raise ValueError(f"no history entries carry metric {metric!r}")
        return float(sum(vals)) / len(vals)


class SingleTrainer(Trainer):
    """I1 (REF §SingleTrainer ~L130-180): one sequential training loop.

    The reference does `coalesce(1)` + a 1-task RDD job; for data that
    fits one task, pulling the (projected, Arrow-encoded) columns to
    the driver is strictly cheaper — no scheduling, no pickle closure.
    Above that size you want a real distributed trainer anyway.
    """

    def train(self, df: DataFrame) -> list[np.ndarray]:
        pdf = df.select(self.features_col, self.label_col).toPandas()
        x = np.stack(pdf[self.features_col].to_numpy()).astype(np.float64)
        y = pdf[self.label_col].to_numpy().astype(np.int64)
        model = self._new_model()
        rng = np.random.RandomState(self.seed)
        for ep in range(self.num_epoch):
            loss = model.sgd_epoch(x, y, self.learning_rate, self.batch_size, rng)
            self.add_history(epoch=ep, loss=loss)
        return model.get_weights()


class EnsembleTrainer(Trainer):
    """I2 (REF §EnsembleTrainer ~L230-280): N independent models on N
    shards — one mapInPandas pass, each partition trains its own model
    and emits one flattened weight row."""

    def __init__(self, *args, num_models: int = 2, **kw) -> None:
        super().__init__(*args, **kw)
        self.num_models = num_models

    def _train_partitions(self, df: DataFrame) -> DataFrame:
        fc, lc = self.features_col, self.label_col
        epochs, bs, lr, seed = self.num_epoch, self.batch_size, self.learning_rate, self.seed
        factory = self.model_factory or (
            lambda dims=self.dims: MLP(*dims, seed=seed)
        )

        def run(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            xs, ys = [], []
            for x, y in _xy(pdf_iter, fc, lc):
                xs.append(x)
                ys.append(y)
            if not xs:
                return
            x, y = np.concatenate(xs), np.concatenate(ys)
            model = factory()
            rng = np.random.RandomState(seed + pid)
            loss = 0.0
            for _ in range(epochs):
                loss = model.sgd_epoch(x, y, lr, bs, rng)
            yield pd.DataFrame(
                {
                    "part_id": [pid],
                    "n": [len(x)],
                    "loss": [loss],
                    "payload": [_flatten(model.get_weights())],
                }
            )

        return df.repartition(self.num_models).mapInPandas(run, _EXCHANGE_SCHEMA)

    def train(self, df: DataFrame) -> list[list[np.ndarray]]:
        like = self._new_model().get_weights()
        rows = self._train_partitions(df).collect()
        for r in rows:
            self.add_history(part_id=r["part_id"], n=r["n"], loss=r["loss"])
        return [_unflatten(np.asarray(r["payload"]), like) for r in rows]


class AveragingTrainer(EnsembleTrainer):
    """I3/D10 (REF §AveragingTrainer ~L180-230): per-shard training,
    then a weight average — here an n-weighted mean so unequal
    partitions don't bias the result."""

    def train(self, df: DataFrame) -> list[np.ndarray]:
        like = self._new_model().get_weights()
        rows = self._train_partitions(df).collect()
        if not rows:
            return like
        for r in rows:
            self.add_history(part_id=r["part_id"], n=r["n"], loss=r["loss"])
        merged = weighted_mean_merge(
            [np.asarray(r["payload"]) for r in rows], [r["n"] for r in rows]
        )
        return _unflatten(merged, like)


class SyncDistributedTrainer(Trainer):
    """I4-I8 replacement: synchronous data-parallel rounds.

    Per round: broadcast center weights → every partition computes the
    gradient of the full cross-entropy over its rows (sum-reduced
    map-side) → driver reduces the ≤num_partitions model-sized vectors
    → optimizer step per `mode` ('downpour' SGD / 'adag' Adam-style /
    'easgd' elastic / 'dynsgd' decayed LR). `communication_window`
    becomes local SGD steps per round (workers advance locally, then
    the center absorbs their movement — the synchronous analogue of
    the reference's commit window).

    The elastic modes ('easgd'/'eamsgd') only perform elastic
    averaging when workers actually drift from the center, i.e. when
    communication_window > 1; at window=1 the per-partition "local
    model" is a single gradient step and the update degenerates to
    rho-scaled (momentum) SGD. communication_window therefore defaults
    to 5 for the elastic modes and 1 otherwise (pass it explicitly to
    override).

    Scale: only weights move (broadcast down, one gradient row per
    partition up). For models where num_partitions × |w| exceeds
    driver memory, swap the collect for a treeAggregate-style two-level
    DataFrame agg — noted, not needed at fixture scale.
    """

    def __init__(
        self,
        *args,
        mode: str = "adag",
        num_workers: int = 8,
        rounds: int = 20,
        communication_window: int | None = None,
        rho: float = 0.9,
        momentum: float = 0.9,
        **kw,
    ) -> None:
        super().__init__(*args, **kw)
        if mode not in ("downpour", "adag", "easgd", "eamsgd", "dynsgd"):
            raise ValueError(f"unknown mode {mode!r}")
        self.momentum = momentum
        self.mode = mode
        self.num_workers = num_workers
        self.rounds = rounds
        if communication_window is None:
            # elastic modes need local drift to average elastically;
            # window=1 would degenerate them to rho-scaled SGD.
            communication_window = 5 if mode in ("easgd", "eamsgd") else 1
        self.communication_window = communication_window
        self.rho = rho

    def train(self, df: DataFrame) -> list[np.ndarray]:
        spark = df.sparkSession
        model = self._new_model()
        like = model.get_weights()
        fc, lc = self.features_col, self.label_col
        factory = self.model_factory or (
            lambda dims=self.dims, seed=self.seed: MLP(*dims, seed=seed)
        )
        lr, bs, window, seed = (
            self.learning_rate,
            self.batch_size,
            self.communication_window,
            self.seed,
        )

        data = df.select(fc, lc).repartition(self.num_workers)
        data.cache()
        n_total = data.count()  # materialize once (REF utils.precache ~L100)

        # optimizer state (driver-side)
        m = np.zeros_like(_flatten(like))
        v = np.zeros_like(m)
        t = 0

        for rnd in range(self.rounds):
            center = _flatten(model.get_weights())
            bweights = spark.sparkContext.broadcast(center)

            def run(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                from pyspark import TaskContext

                pid = TaskContext.get().partitionId()
                xs, ys = [], []
                for x, y in _xy(pdf_iter, fc, lc):
                    xs.append(x)
                    ys.append(y)
                if not xs:
                    return
                x, y = np.concatenate(xs), np.concatenate(ys)
                local = factory()
                local.set_weights(_unflatten(np.asarray(bweights.value), like))
                if window <= 1:
                    loss, grads = local.loss_grad(x, y)
                    payload = _flatten(grads) * len(x)  # de-normalize: sum grad
                else:
                    # local-SGD window: take `window` minibatch steps,
                    # report the (negative) movement as the delta
                    # report the full-partition loss at the CENTER
                    # weights — the model the trainer actually returns.
                    # (A local post-step loss plateaus: each worker's
                    # shard-specific gains cancel in the averaging, so
                    # it tracks neither the center nor convergence; a
                    # last-minibatch loss is noise on top.) This matches
                    # what the window=1 branch reports.
                    p = local.forward(x)
                    loss = float(
                        -np.log(np.clip(p[np.arange(len(y)), y], 1e-12, None)).mean()
                    )
                    rng = np.random.RandomState(seed + pid + 7919 * rnd)
                    for _ in range(window):
                        idx = rng.choice(len(x), size=min(bs, len(x)), replace=False)
                        _, grads = local.loss_grad(x[idx], y[idx])
                        for w, g in zip(local.get_weights(), grads):
                            w -= lr * g
                    payload = (
                        (np.asarray(bweights.value) - _flatten(local.get_weights()))
                        / lr
                        * len(x)
                    )
                yield pd.DataFrame(
                    {
                        "part_id": [pid],
                        "n": [len(x)],
                        "loss": [loss],
                        "payload": [payload],
                    }
                )

            rows = data.mapInPandas(run, _EXCHANGE_SCHEMA).collect()
            if not rows:
                break
            grad = np.add.reduce([np.asarray(r["payload"]) for r in rows]) / max(
                sum(r["n"] for r in rows), 1
            )
            mean_loss = float(np.mean([r["loss"] for r in rows]))

            # optimizer step
            t += 1
            if self.mode == "downpour":
                center -= lr * grad
            elif self.mode == "dynsgd":
                center -= dynsgd_lr(lr, t) * grad
            elif self.mode == "adag":
                center, m, v = adam_step(center, m, v, t, grad, lr)
            elif self.mode == "easgd":
                # elastic: center moves toward the gradient-implied
                # worker consensus with coupling rho
                center -= lr * (self.rho * grad)
            elif self.mode == "eamsgd":
                # elastic + Nesterov momentum on the center (I6):
                # velocity look-ahead before the elastic step. The
                # (1-momentum) damping keeps the steady-state step equal
                # to the easgd step — undamped, the geometric momentum
                # sum multiplies the elastic step by 1/(1-momentum)
                # (≈10× at momentum .9), overshooting past the worker
                # consensus every round and oscillating instead of
                # converging.
                center, m = eamsgd_center_step(
                    center, m, grad, lr, self.rho, self.momentum
                )

            model.set_weights(_unflatten(center, like))
            self.add_history(round=rnd, loss=mean_loss, n=n_total)
            bweights.destroy()

        data.unpersist()
        return model.get_weights()


# API-parity aliases mirroring the reference trainer names (I4-I8).
def DOWNPOUR(*args, **kw) -> SyncDistributedTrainer:
    """REF trainers.py §DOWNPOUR (~L500-550) — see module docstring."""
    return SyncDistributedTrainer(*args, mode="downpour", **kw)


def ADAG(*args, **kw) -> SyncDistributedTrainer:
    """REF trainers.py §ADAG (~L700-760), README-recommended default."""
    return SyncDistributedTrainer(*args, mode="adag", **kw)


def AEASGD(*args, **kw) -> SyncDistributedTrainer:
    """REF trainers.py §AEASGD (~L550-600)."""
    return SyncDistributedTrainer(*args, mode="easgd", **kw)


def EAMSGD(*args, **kw) -> SyncDistributedTrainer:
    """REF trainers.py §EAMSGD (~L600-650): elastic averaging with
    Nesterov momentum applied by the center optimizer."""
    return SyncDistributedTrainer(*args, mode="eamsgd", **kw)


def DynSGD(*args, **kw) -> SyncDistributedTrainer:
    """REF trainers.py §DynSGD (~L650-700)."""
    return SyncDistributedTrainer(*args, mode="dynsgd", **kw)
