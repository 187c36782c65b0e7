"""Bench-only sf1-shaped dataset generator (VERDICT r9 #4).

The scaling claims in every "scan-side / one-shuffle / bucketed"
docstring predict near-linear wall time in data size. The driver
fixtures stop at sf0.1, so this tool generates a 10x dataset with the
SAME SHAPE as /root/testdata (schemas, dtypes, cardinality ratios,
value distributions, duplicate/near-dup structure in `documents`,
unit-norm weakly-clustered `embeddings`, parquet written arrow-side
with the fixtures' 600k-rows-per-row-group convention) so
tools/bench_scaling.py can measure per-op scaling exponents sf0.1 vs
sf1. NOT an oracle fixture: values are seed-42 deterministic but not
byte-identical to the driver generator — correctness stays on
/root/testdata; this data exists only to time plans at 10x.

All tables scale 10x from sf0.1 — including `documents` (5k -> 50k)
and `embeddings` (2k -> 20k), otherwise the dedup/ANN exponents the
dataset exists to measure would be trivially flat.

Usage: python tools/gen_benchdata.py [out_dir] [mult]
  out_dir default: benchdata/sf1
  mult: row-count multiplier RELATIVE TO SF1 (mult=2 writes an
  sf2-shaped 20x-of-sf0.1 dataset — the second scale point that turns
  one-step exponents into two-decade curvature evidence). Dim tables
  (region/nation) and value domains stay fixed; every fact-table
  cardinality that scales with data (customers, orders, docs,
  embeddings, event users) multiplies.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
ROW_GROUP = 600_000  # fixture convention: sf0.1 lineitem = one 600k group

# sf0.1 base counts (TESTDATA.md + observed), scaled 10x
N_CUSTOMER = 150_000
N_SUPPLIER = 10_000
N_PART = 200_000
N_ORDERS = 1_500_000
N_EVENTS = 1_000_000
N_DOCS = 50_000
N_EMB = 20_000

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
P_ADJ = ["large", "hot", "blue", "red", "green", "dark", "light", "cold"]
P_NOUN = ["ring", "bolt", "case", "drum", "plate", "wheel", "cap", "tube"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(
        table, os.path.join(out_dir, f"{name}.parquet"), row_group_size=ROW_GROUP
    )
    print(f"  {name}: {table.num_rows} rows")


def _ts_us(days_ns: np.ndarray, epoch: str) -> pa.Array:
    base = np.datetime64(epoch, "us")
    return pa.array(base + days_ns.astype("timedelta64[us]"))


def main(out_dir: str, mult: float = 1.0) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)

    # scale every data-sized cardinality; dims and domains stay fixed
    n_customer = int(N_CUSTOMER * mult)
    n_supplier = int(N_SUPPLIER * mult)
    n_part = int(N_PART * mult)
    n_orders = int(N_ORDERS * mult)
    n_events = int(N_EVENTS * mult)
    n_docs = int(N_DOCS * mult)
    n_emb = int(N_EMB * mult)
    n_users = int(15_000 * mult)

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION{i:02d}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(range(n_customer), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_customer)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_customer), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_customer), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_customer)]),
    }))
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supplier), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supplier)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supplier), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supplier), 2),
    }))
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [
            f"{P_ADJ[a]} {P_NOUN[b]}"
            for a, b in zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))
        ],
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(11, 56, n_part)]),
        "p_type": pa.array(np.array(P_TYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 2100, n_part), 2),
    }))

    # orders: dates 1995-01-01 .. 2001-08-01 (2404 days), midnight us
    odays = rng.integers(0, 2405, n_orders).astype("int64") * 86_400_000_000
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(range(n_orders), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_customer, n_orders), pa.int64()),
        "o_orderstatus": pa.array(np.array(["F", "O", "P"])[rng.integers(0, 3, n_orders)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_orders), 2),
        "o_orderdate": _ts_us(odays, "1995-01-01T00:00:00"),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_orders)]),
    }))

    # lineitem: 1..7 lines per order, mean 4 -> ~6M rows
    per_order = rng.integers(1, 8, n_orders)
    okeys = np.repeat(np.arange(n_orders, dtype="int64"), per_order)
    n_li = len(okeys)
    lnum = np.concatenate([np.arange(1, c + 1) for c in per_order]).astype("int32")
    sdays = rng.integers(0, 2405, n_li).astype("int64") * 86_400_000_000
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(okeys),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supplier, n_li), pa.int64()),
        "l_linenumber": pa.array(lnum),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_us(sdays, "1995-01-01T00:00:00"),
    }))

    # events: 30 days of Jan 2024, us precision, 15k distinct users
    # (10x the 1.5k at sf0.1 — user_id cardinality scales with data)
    eus = rng.integers(0, 30 * 86_400_000_000, n_events).astype("int64")
    eus.sort()
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(range(n_events), pa.int64()),
        "ts": _ts_us(eus, "2024-01-01T00:00:00"),
        "user_id": pa.array(rng.integers(0, n_users, n_events), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_events)]),
        "value": np.round(np.minimum(rng.exponential(50, n_events), 560.0), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_events)],
    }))

    # documents: random 9..105-word texts over the 31-word vocab, with
    # the fixtures' duplicate structure: ~4% of docs are near-dup
    # mutations (10-20% words replaced) of an earlier doc and ~0.2%
    # exact copies — at 5k docs this yields a few hundred Jaccard>=0.5
    # pairs and a handful of exact dups, matching sf0.1's observed 8
    # exact dups / 256 near pairs.
    vocab = np.array(VOCAB)
    texts: list[str] = []
    for i in range(n_docs):
        r = rng.random()
        if i > 10 and r < 0.002:
            texts.append(texts[int(rng.integers(0, i))])
            continue
        if i > 10 and r < 0.042:
            words = texts[int(rng.integers(0, i))].split(" ")
            w = np.array(words)
            k = max(1, int(len(w) * rng.uniform(0.1, 0.2)))
            idx = rng.choice(len(w), size=k, replace=False)
            w[idx] = vocab[rng.integers(0, len(vocab), k)]
            texts.append(" ".join(w))
            continue
        n = int(rng.integers(9, 106))
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), n)]))
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": texts,
        "lang": pa.array(rng.choice(LANGS, n_docs, p=LANG_P)),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n_docs)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: 64-dim unit-norm, weak label clustering (fixture
    # measures ~0.11 cosine to own centroid): x = 0.12*centroid + noise
    labels = rng.integers(0, 10, n_emb)
    cents = rng.standard_normal((10, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    vecs = rng.standard_normal((n_emb, 64)) + 1.0 * cents[labels]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(
            [v for v in vecs.astype("float32")], pa.list_(pa.float32())
        ),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    main(
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchdata",
            "sf1",
        ),
        float(sys.argv[2]) if len(sys.argv) > 2 else 1.0,
    )
