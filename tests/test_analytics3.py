"""Unit tests for the round-6 second-wave analytics operators
(plans/analytics3.py): semantics pinned on tiny hand-built inputs
where the fixture could mask a bug, plus fixture-level invariants.
"""

from __future__ import annotations

import datetime as dt
import itertools

from pyspark.sql import functions as F

from dist_keras_spark.plans import QUERIES
from dist_keras_spark.sources.tables import load_table


def test_market_basket_lift_matches_bruteforce(spark, sf_dir):
    """Lift arithmetic vs an itertools brute force over the same
    baskets."""
    rows = QUERIES["market_basket_lift"](spark, sf_dir).collect()
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "part"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_orderkey", "p_brand")
        .distinct()
        .collect()
    )
    by_order: dict[int, set[str]] = {}
    for r in baskets:
        by_order.setdefault(r.l_orderkey, set()).add(r.p_brand)
    n_orders = len(by_order)
    brand_n: dict[str, int] = {}
    pair_n: dict[tuple[str, str], int] = {}
    for brands in by_order.values():
        for b in brands:
            brand_n[b] = brand_n.get(b, 0) + 1
        for a, b in itertools.combinations(sorted(brands), 2):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    assert len(rows) == len(pair_n)
    for r in rows:
        key = (r.brand_a, r.brand_b)
        assert r.n_ab == pair_n[key]
        assert r.n_a == brand_n[r.brand_a]
        assert r.n_b == brand_n[r.brand_b]
        import math

        assert r.lift_milli == math.floor(
            1000.0 * n_orders * r.n_ab / (r.n_a * r.n_b)
        )


def test_cdc_diff_covers_all_orders(spark, sf_dir):
    """Per-change-type key counts add up to the distinct customers
    with orders, and cents checksums reconcile with the raw fact."""
    rows = {r.change_type: r for r in QUERIES["cdc_snapshot_diff"](spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders")
    total_keys = o.select("o_custkey").distinct().count()
    assert sum(r.n_keys for r in rows.values()) == total_keys
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    split = F.lit("1998-01-01").cast("timestamp")
    old_cents = o.filter(F.col("o_orderdate") < split).agg(F.sum(cents)).first()[0]
    new_cents = o.filter(F.col("o_orderdate") >= split).agg(F.sum(cents)).first()[0]
    assert sum(r.old_cents for r in rows.values()) == old_cents
    assert sum(r.new_cents for r in rows.values()) == new_cents


def test_scd2_history_is_contiguous_and_state_changes(spark, sf_dir):
    """Per user: versions are 0..k dense, valid_to == next valid_from
    (half-open chain, NULL only on the last), and consecutive states
    ALWAYS differ (that is what makes it SCD2, not a row log)."""
    rows = QUERIES["scd2_from_events"](spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    e = load_table(spark, sf_dir, "events")
    n_events = e.count()
    assert sum(r.n_events for r in rows) == n_events
    for uid, hist in by_user.items():
        hist.sort(key=lambda r: r.version)
        # first row is always a "change" vs the NULL predecessor, so
        # versions are 1..k dense
        assert [h.version for h in hist] == list(range(1, len(hist) + 1))
        for a, b in zip(hist, hist[1:]):
            assert a.valid_to == b.valid_from, uid
            assert a.state != b.state, uid
        assert hist[-1].valid_to is None


def test_concurrent_peak_on_handbuilt_intervals(spark):
    """Sweep-line semantics on a hand-built case including the
    half-open boundary: an interval ending exactly when another starts
    does NOT overlap it."""
    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # supplier 1: [0,10) [5,15) [10,20) -> peak 2 (never 3: the
        # first closes exactly as the third opens)
        (1, t(0), t(10)),
        (1, t(5), t(15)),
        (1, t(10), t(20)),
        # supplier 2: three fully-nested intervals -> peak 3 at t=2
        (2, t(0), t(30)),
        (2, t(1), t(29)),
        (2, t(2), t(28)),
    ]
    df = spark.createDataFrame(rows, "k long, start timestamp, end timestamp")
    sweep = df.select("k", F.col("start").alias("t"), F.lit(1).alias("d")).unionByName(
        df.select("k", F.col("end").alias("t"), F.lit(-1).alias("d"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("k").orderBy("t", "d").rowsBetween(W.unboundedPreceding, 0)
    running = sweep.withColumn("r", F.sum("d").over(w))
    peaks = {
        r.k: r.peak
        for r in running.groupBy("k").agg(F.max("r").alias("peak")).collect()
    }
    assert peaks == {1: 2, 2: 3}


def test_concurrent_peak_fixture_bounds(spark, sf_dir):
    """Peak per supplier is positive and never exceeds that supplier's
    lineitem count; peak_first_at falls inside the data's time span."""
    rows = QUERIES["concurrent_intervals_peak"](spark, sf_dir).collect()
    counts = {
        r.l_suppkey: r.n
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(rows) == len(counts)
    for r in rows:
        assert 1 <= r.peak <= counts[r.l_suppkey]


def test_sequence_patterns_vs_python_re(spark, sf_dir):
    """Spark rlike counts == Python re on the same per-user path
    strings (engine-parity for the exact regexes the query ships)."""
    import re

    got = QUERIES["sequence_pattern_match"](spark, sf_dir).first()
    e = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    code = {"signup": "s", "click": "c", "purchase": "p", "error": "e", "view": "v"}
    paths: dict[int, list] = {}
    for r in e:
        paths.setdefault(r.user_id, []).append((r.ts, r.event_id, code[r.event_type]))
    strs = ["".join(c for _, _, c in sorted(v)) for v in paths.values()]
    assert got.n_users == len(strs)
    assert got.n_clean_conversion == sum(bool(re.search("s[^e]*p", s)) for s in strs)
    assert got.n_error_recovery == sum(bool(re.search("e[cv]*p", s)) for s in strs)
    assert got.n_view_first == sum(bool(re.search("^v", s)) for s in strs)


def test_mom_growth_arithmetic(spark, sf_dir):
    """growth_bp recomputed from the returned cents columns; first
    month per nation has NULL prev/growth; months strictly increase."""
    import math

    rows = QUERIES["revenue_mom_growth"](spark, sf_dir).collect()
    by_nation: dict[str, list] = {}
    for r in rows:
        by_nation.setdefault(r.n_name, []).append(r)
    for hist in by_nation.values():
        hist.sort(key=lambda r: r.month)
        assert hist[0].prev_cents is None and hist[0].growth_bp is None
        for a, b in zip(hist, hist[1:]):
            assert a.month < b.month
            assert b.prev_cents == a.rev_cents
            assert b.growth_bp == math.floor(
                10000.0 * (b.rev_cents - b.prev_cents) / b.prev_cents
            )


def test_rfm_bands_partition_customers(spark, sf_dir):
    """Bands are 1..4, segment counts sum to the customer population,
    and each band's population is a quartile-ish share (exact
    percentile boundaries => no band can be empty overall)."""
    rows = QUERIES["rfm_segment_quantile"](spark, sf_dir).collect()
    n_cust = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    for r in rows:
        assert 1 <= r.r_band <= 4 and 1 <= r.f_band <= 4 and 1 <= r.m_band <= 4


def test_weighted_median_matches_numpy(spark, sf_dir):
    """Lower weighted median recomputed per supplier with numpy."""
    import numpy as np

    got = {
        r.l_suppkey: (r.wmedian_cents, r.total_qty)
        for r in QUERIES["weighted_median_by_supplier"](spark, sf_dir).collect()
    }
    pdf = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_suppkey",
            F.floor(F.col("l_extendedprice") * 100).cast("long").alias("pc"),
            F.col("l_quantity").cast("long").alias("wt"),
        )
        .toPandas()
    )
    for sk, g in pdf.groupby("l_suppkey"):
        g = g.sort_values("pc")
        cum = np.cumsum(g["wt"].values)
        total = int(cum[-1])
        idx = int(np.searchsorted(2 * cum, total, side="left"))
        assert got[sk] == (int(g["pc"].values[idx]), total), sk


def test_pareto_frontier_matches_bruteforce(spark, sf_dir):
    """Window-sweep skyline == O(n^2) dominance check in Python."""
    got = {
        (r.p_brand, r.p_partkey)
        for r in QUERIES["pareto_frontier_brand"](spark, sf_dir).collect()
    }
    parts = (
        load_table(spark, sf_dir, "part")
        .select(
            "p_brand",
            "p_partkey",
            F.floor(F.col("p_retailprice") * 100).cast("long").alias("pc"),
            "p_size",
        )
        .collect()
    )
    by_brand: dict[str, list] = {}
    for r in parts:
        by_brand.setdefault(r.p_brand, []).append(r)
    expect = set()
    for brand, ps in by_brand.items():
        for p in ps:
            dominated = any(
                q.pc <= p.pc
                and q.p_size >= p.p_size
                and (q.pc < p.pc or q.p_size > p.p_size)
                for q in ps
            )
            if not dominated:
                expect.add((brand, p.p_partkey))
    assert got == expect


def test_corr_sufficient_stats_recompute(spark, sf_dir):
    """corr_micro recomputed from the raw fact with the exact same
    double expression — must match bit-for-bit; also |corr| <= 1."""
    import math

    got = {r.l_returnflag: r for r in QUERIES["corr_sufficient_stats"](spark, sf_dir).collect()}
    pdf = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            F.col("l_quantity").cast("long").alias("x"),
            F.floor("l_extendedprice").cast("long").alias("y"),
        )
        .toPandas()
    )
    for flag, g in pdf.groupby("l_returnflag"):
        n = len(g)
        sx, sy = int(g.x.sum()), int(g.y.sum())
        sxy = int((g.x * g.y).sum())
        sxx, syy = int((g.x * g.x).sum()), int((g.y * g.y).sum())
        num = float(n) * float(sxy) - float(sx) * float(sy)
        den = math.sqrt(
            (float(n) * float(sxx) - float(sx) * float(sx))
            * (float(n) * float(syy) - float(sy) * float(sy))
        )
        r = got[flag]
        assert (r.n, r.sx, r.sy) == (n, sx, sy)
        assert r.corr_micro == math.floor(1000000.0 * num / den)
        assert abs(r.corr_micro) <= 1_000_000


def test_watermark_late_drop_semantics(spark, sf_dir):
    """The live result equals the batch expectation: stragglers
    (id%10==0, older than max-2h) excluded, only windows closed below
    max-31min emitted — and nothing beyond the cut ever appears."""
    import datetime as dt

    rows = QUERIES["streaming_watermark_late_drop_live"](spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "events")
    mx = e.agg(F.max("ts")).first()[0]
    cut = mx - dt.timedelta(minutes=31)
    kept = e.filter(
        ~((F.col("event_id") % 10 == 0) & (F.col("ts") < F.lit(mx - dt.timedelta(hours=2))))
    ).filter(
        F.date_trunc("hour", "ts") + F.expr("INTERVAL 1 HOUR") <= F.lit(cut)
    )
    assert sum(r.n for r in rows) == kept.count()
    for r in rows:
        assert r.window_start + dt.timedelta(hours=1) <= cut


def test_dpp_plan_has_runtime_partition_filter(spark, sf_dir):
    """The query itself asserts dynamicpruning is in its plan; here we
    additionally check the pruned result matches a direct filter."""
    rows = QUERIES["dpp_partitioned_join"](spark, sf_dir).collect()
    got = {r.event_type: r.n for r in rows}
    e = load_table(spark, sf_dir, "events")
    expect = {
        r.event_type: r.n
        for r in e.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expect


def test_manifest_skipping_reads_subset_of_files(spark, sf_dir):
    """The skipped read touches fewer files than the layout holds and
    returns exactly the predicate's rows."""
    df = QUERIES["manifest_skipping_scan"](spark, sf_dir)
    n = df.count()
    expect = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .count()
    )
    assert n == expect
    # the scan's file list is the pruned one
    n_scanned = df.select(F.col("_metadata.file_path")).distinct().count()
    assert n_scanned < 8


def test_path_top10_vs_python(spark, sf_dir):
    """Triple counts recomputed in Python over sorted per-user
    sequences; top-10 selection with the same tie-break."""
    got = [(r.path, r.n) for r in QUERIES["events_path_top10"](spark, sf_dir).collect()]
    e = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    seqs: dict[int, list] = {}
    for r in e:
        seqs.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    counts: dict[str, int] = {}
    for v in seqs.values():
        types = [t for _, _, t in sorted(v)]
        for i in range(len(types) - 2):
            p = ">".join(types[i : i + 3])
            counts[p] = counts.get(p, 0) + 1
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == expect


def test_jsonl_sink_commit_protocol(spark, tmp_path):
    """Uncommitted files are invisible: a stray file dropped into the
    sink directory after commit is NOT in the manifest and never read."""
    import json
    import os

    from dist_keras_spark.sources.pysource import (
        read_manifest_files,
        register_sink,
    )

    register_sink(spark)
    path = str(tmp_path / "sink")
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, s string")
    df.repartition(2).write.format("jsonl_manifest").option("path", path).mode(
        "append"
    ).save()
    files = read_manifest_files(path)
    assert len(files) >= 1
    # torn write: a file that never reached commit
    stray = os.path.join(path, "part-99999-deadbeef.jsonl")
    with open(stray, "w") as f:
        f.write(json.dumps({"id": 999, "s": "TORN"}) + "\n")
    back = spark.read.schema("id long, s string").json(read_manifest_files(path))
    assert sorted((r.id, r.s) for r in back.collect()) == [(1, "a"), (2, "b"), (3, "c")]


def test_udtf_table_arg_partition_isolation(spark):
    """Each PARTITION BY group reaches exactly one UDTF instance in
    ORDER BY order — pinned on hand-built rows where arrival order in
    the underlying data is shuffled."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="k bigint, n bigint, first_v string, last_v string", useArrow=True)
    class Summ:
        def __init__(self):
            self.k = None
            self.n = 0
            self.first = None
            self.last = None

        def eval(self, row):
            self.k = row["k"]
            self.n += 1
            if self.first is None:
                self.first = row["v"]
            self.last = row["v"]

        def terminate(self):
            if self.n:
                yield self.k, self.n, self.first, self.last

    spark.udtf.register("summ_udtf", Summ)
    rows = [(2, 30, "z"), (1, 2, "b"), (2, 10, "x"), (1, 1, "a"), (2, 20, "y")]
    spark.createDataFrame(rows, "k long, o long, v string").createOrReplaceTempView(
        "summ_in"
    )
    got = {
        r.k: (r.n, r.first_v, r.last_v)
        for r in spark.sql(
            "SELECT * FROM summ_udtf(TABLE(summ_in) PARTITION BY k ORDER BY o)"
        ).collect()
    }
    assert got == {1: (2, "a", "b"), 2: (3, "x", "z")}


def test_kmeans_matches_pure_python(spark, sf_dir):
    """Two Lloyd iterations re-run in pure Python over the same
    quantized integers — cluster sizes and coord sums must match
    exactly (the whole point of the rational-centroid formulation)."""
    got = {
        r.cluster_id: (r.n_members, r.coord_sum)
        for r in QUERIES["kmeans_lloyd_two_iters"](spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {
        r.vec_id: [round(float(x) * 1000) for x in r.embedding] for r in rows
    }
    k = 8
    cents = {
        vid: (vecs[vid], 1) for vid in sorted(vecs)[:k]
    }  # cid -> (sum_vector, count)

    def assign(cents):
        out = {}
        for vid, v in vecs.items():
            best = None
            for cid in sorted(cents):
                s, n = cents[cid]
                d = sum((x * n - sx) ** 2 for x, sx in zip(v, s)) / float(n * n)
                if best is None or (d, cid) < best[:2]:
                    best = (d, cid)
            out[vid] = best[1]
        return out

    a1 = assign(cents)
    c1 = {}
    for vid, cid in a1.items():
        s, n = c1.get(cid, ([0] * 64, 0))
        c1[cid] = ([a + b for a, b in zip(s, vecs[vid])], n + 1)
    a2 = assign(c1)
    expect = {}
    for vid, cid in a2.items():
        n, s = expect.get(cid, (0, 0))
        expect[cid] = (n + 1, s + sum(vecs[vid]))
    assert got == expect


def test_left_outer_join_null_rows_are_truly_unmatched(spark, sf_dir):
    """Every null-extended left has NO qualifying match in the full
    batch data, and every matched pair appears identically in a batch
    join."""
    import datetime as dt

    res = QUERIES["streaming_left_outer_join_live"](spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts").collect()
    by_user: dict[int, list] = {}
    for r in e:
        by_user.setdefault(r.user_id, []).append((r.event_id, r.ts))
    def has_match(uid, eid, ts):
        return any(
            eid < e2 and ts <= t2 <= ts + dt.timedelta(minutes=5)
            for e2, t2 in by_user[uid]
        )
    ts_of = {r.event_id: r.ts for r in e}
    nulls = [r for r in res if r.eid_b is None]
    assert nulls, "expected null-extended rows"
    for r in nulls:
        assert not has_match(r.ua, r.eid_a, ts_of[r.eid_a]), r
    matched = [(r.ua, r.eid_a, r.eid_b) for r in res if r.eid_b is not None]
    expect_pairs = [
        (uid, e1, e2)
        for uid, lst in by_user.items()
        for e1, t1 in lst
        for e2, t2 in lst
        if e1 < e2 and t1 <= t2 <= t1 + dt.timedelta(minutes=5)
    ]
    assert sorted(matched) == sorted(expect_pairs)


def test_funnel_24h_bounded_by_unbounded(spark, sf_dir):
    """Each time-bounded step count is <= the unbounded funnel's and
    step counts are monotone non-increasing."""
    b = QUERIES["events_funnel_within_24h"](spark, sf_dir).first()
    u = QUERIES["events_funnel_steps"](spark, sf_dir).first()
    assert b.step_signup == u.step_signup
    assert b.step_click_24h <= u.step_click
    assert b.step_signup >= b.step_click_24h >= b.step_purchase_24h


def test_triangle_count_matches_bruteforce(spark, sf_dir):
    """Triangles recomputed with itertools over the same thresholded
    edge set."""
    import itertools

    got = QUERIES["triangle_count_brands"](spark, sf_dir).first()
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "part"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_orderkey", "p_brand")
        .distinct()
        .collect()
    )
    by_order: dict[int, set] = {}
    for r in baskets:
        by_order.setdefault(r.l_orderkey, set()).add(r.p_brand)
    pair_n: dict[tuple, int] = {}
    for brands in by_order.values():
        for a, b in itertools.combinations(sorted(brands), 2):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    mean = sum(pair_n.values()) / len(pair_n)
    edges = {p for p, n in pair_n.items() if n >= mean}
    nodes = sorted({x for e in edges for x in e})
    tri = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in edges and (b, c) in edges and (a, c) in edges
    )
    assert (got.n_edges, got.n_triangles) == (len(edges), tri)


def test_pagerank_matches_pure_python(spark, sf_dir):
    """Two fixed-point iterations recomputed in Python integers."""
    import itertools

    got = {
        r.brand: (r.rank_fp, r.degree)
        for r in QUERIES["pagerank_two_iters"](spark, sf_dir).collect()
    }
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "part"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_orderkey", "p_brand")
        .distinct()
        .collect()
    )
    by_order: dict[int, set] = {}
    for r in baskets:
        by_order.setdefault(r.l_orderkey, set()).add(r.p_brand)
    pair_n: dict[tuple, int] = {}
    for brands in by_order.values():
        for a, b in itertools.combinations(sorted(brands), 2):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    mean = sum(pair_n.values()) / len(pair_n)
    und = [p for p, n in pair_n.items() if n >= mean]
    edges = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    deg: dict[str, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    n = len(deg)
    S = 1000000000000
    r0 = {v: S // n for v in deg}

    def step(rk):
        out: dict[str, int] = {}
        for s, d in edges:
            out[d] = out.get(d, 0) + rk[s] // deg[s]
        return {v: S * 15 // 100 // n + 85 * c // 100 for v, c in out.items()}

    r2 = step(step(r0))
    assert got == {v: (r2[v], deg[v]) for v in r2}


def test_logistic_newton_step_matches_numpy(spark, sf_dir):
    """The Newton step recomputed with numpy's linear solve: the
    closed-form 2x2 inverse must agree to the micro unit, and the
    step direction must point toward the class imbalance."""
    import numpy as np

    rows = {
        r.o_orderstatus: r
        for r in QUERIES["logistic_newton_step"](spark, sf_dir).collect()
    }
    pdf = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderstatus",
            F.floor(F.col("o_totalprice") / 1000).cast("long").alias("x"),
            (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("y"),
        )
        .toPandas()
    )
    for status, g in pdf.groupby("o_orderstatus"):
        X = np.column_stack([np.ones(len(g)), g.x.values.astype(float)])
        H = 0.25 * (X.T @ X)
        grad = X.T @ (g.y.values - 0.5)
        beta = np.linalg.solve(H, grad)
        r = rows[status]
        assert abs(r.beta0_micro - np.floor(1e6 * beta[0])) <= 1
        assert abs(r.beta1_micro - np.floor(1e6 * beta[1])) <= 1
        assert r.n == len(g) and r.n_pos == int(g.y.sum())


def test_dynamic_gap_bridges_past_short_gap_event(spark):
    """The case where running-max-end semantics differ from the naive
    lag rule: a long-gap event bridges past a nearer short-gap event.
      t=0 purchase (gap 60m, reach 60m)
      t=25m view   (gap 30m, reach 55m)
      t=58m view   — within the PURCHASE's reach (60m) but past the
                     previous view's reach (55m): still SAME session.
    """
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, "purchase", 1.0),
        (1, 2, t0 + dt.timedelta(minutes=25), "view", 1.0),
        (1, 3, t0 + dt.timedelta(minutes=58), "view", 1.0),
        # and one clearly past every reach -> new session
        (1, 4, t0 + dt.timedelta(minutes=200), "view", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string, value double"
    )
    gap = F.when(F.col("event_type") == "purchase", F.lit("60 minutes")).otherwise(
        F.lit("30 minutes")
    )
    got = (
        df.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("n")
        .collect()
    )
    assert sorted(r.n for r in got) == [1, 3]


def test_map_in_arrow_matches_python(spark, sf_dir):
    """mapInArrow stats == plain Python recompute over the same docs."""
    got = {
        r.doc_id: (r.n_bytes, r.first_byte, r.n_words)
        for r in QUERIES["arrow_blob_stats"](spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    for r in docs:
        raw = r.text.encode("utf-8")
        assert got[r.doc_id] == (len(raw), raw[0], r.text.count(" ") + 1)


def test_point_in_time_no_leakage(spark, sf_dir):
    """Recompute per label in Python: prior stats use strictly earlier
    purchases only; the click feature never comes from after the
    label instant (leakage check)."""
    got = {
        r.label_id: (r.prior_n, r.prior_spend_cents, r.last_click_cents)
        for r in QUERIES["point_in_time_features"](spark, sf_dir).collect()
    }
    e = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "event_type", "value")
        .collect()
    )
    import math

    purchases: dict[int, list] = {}
    clicks: dict[int, list] = {}
    for r in e:
        c = math.floor(r.value * 100)
        if r.event_type == "purchase":
            purchases.setdefault(r.user_id, []).append((r.ts, r.event_id, c))
        elif r.event_type == "click":
            clicks.setdefault(r.user_id, []).append((r.ts, r.event_id, c))
    for uid, ps in purchases.items():
        ps.sort()
        for i, (ts, eid, _) in enumerate(ps):
            prior = ps[:i]
            expect_n = len(prior)
            expect_spend = sum(c for _, _, c in prior)
            cands = [(t, e2, c) for t, e2, c in clicks.get(uid, []) if t <= ts]
            expect_click = max(cands)[2] if cands else None
            assert got[eid] == (expect_n, expect_spend, expect_click), eid


def test_linreg_gd_two_steps_matches_python_and_descends(spark, sf_dir):
    """Fixed-point GD recomputed in pure Python integers; also assert
    the training loss strictly decreased over the two steps."""
    import math

    got = {
        r.l_returnflag: (r.n, r.w_fp, r.b_fp)
        for r in QUERIES["linreg_gd_two_steps"](spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            F.col("l_quantity").cast("long").alias("x"),
            (F.floor("l_extendedprice").cast("long") * 10000).alias("y"),
        )
        .collect()
    )
    data: dict[str, list] = {}
    for r in rows:
        data.setdefault(r.l_returnflag, []).append((r.x, r.y))
    for flag, pts in data.items():
        n = len(pts)
        w = b = 0

        def loss(w, b):
            return sum((w * x + b - y) ** 2 for x, y in pts)

        losses = [loss(w, b)]
        for _ in range(2):
            gw = sum(2 * x * (w * x + b - y) for x, y in pts)
            gb = sum(2 * (w * x + b - y) for x, y in pts)
            w -= math.floor(float(gw) / 10000.0 / n)
            b -= math.floor(float(gb) / 10000.0 / n)
            losses.append(loss(w, b))
        assert got[flag] == (n, w, b), flag
        assert losses[2] < losses[1] < losses[0], flag
