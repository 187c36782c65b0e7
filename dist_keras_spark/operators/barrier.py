"""Barrier-mode execution (SURVEY.md §2.L last row).

The sync-rounds trainer (operators/trainers.py) is the deliberate
production design; this module demonstrates the barrier alternative —
all tasks scheduled simultaneously with in-task coordination via
BarrierTaskContext.allGather — for the case SURVEY §7 reserves it
for: when per-round driver round-trips dominate and you want
train-loop iterations to synchronize WITHOUT returning to the driver.

`barrier_allreduce_mean` is the building block: every partition
contributes a vector, every task receives the global mean — the
allreduce primitive a barrier-mode trainer loops on.
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame


def barrier_allreduce_mean(df: DataFrame, vec_col: str) -> list[float]:
    """All-reduce (mean) of a vector column via barrier tasks.

    Each barrier task computes its partition's (sum, count), allGathers
    everyone's, and derives the identical global mean locally; the
    driver just takes the first task's copy. Runs one barrier stage —
    requires cluster slots >= partitions (the barrier contract).
    """
    rdd = df.select(vec_col).rdd

    def work(it):
        from pyspark import BarrierTaskContext

        ctx = BarrierTaskContext.get()
        acc, n = None, 0
        for row in it:
            v = np.asarray(row[0], dtype=np.float64)
            acc = v if acc is None else acc + v
            n += 1
        payload = json.dumps(
            {"sum": (acc.tolist() if acc is not None else None), "n": n}
        )
        gathered = ctx.allGather(payload)
        total, count = None, 0
        for g in gathered:
            d = json.loads(g)
            if d["sum"] is not None:
                s = np.asarray(d["sum"])
                total = s if total is None else total + s
                count += d["n"]
        mean = (total / count) if count else None
        yield (ctx.partitionId(), mean.tolist() if mean is not None else None)

    results = rdd.barrier().mapPartitions(work).collect()
    for _, mean in results:
        if mean is not None:
            return mean
    return []
