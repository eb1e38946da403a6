"""Bucketed-table co-located joins (the state table's 100 TB story) and
IVF centroid training."""

from __future__ import annotations

from pyspark.sql import functions as F

from py_etl_spark.operators import similarity
from py_etl_spark.plans import shuffle_count
from py_etl_spark.schemas import load_table
from tests.conftest import SF_SMALL


def test_bucketed_join_has_no_shuffle(spark):
    orders = load_table(spark, SF_SMALL, "orders")
    customer = load_table(spark, SF_SMALL, "customer")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")
    (orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_bkt"))
    (customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("customer_bkt"))
    ob, cb = spark.table("orders_bkt"), spark.table("customer_bkt")

    # plain parquet join on the same keys needs 2 exchanges...
    plain = orders.hint("merge").join(
        customer, orders.o_custkey == customer.c_custkey
    )
    assert shuffle_count(plain) >= 2
    # ...the bucketed join needs none: buckets are co-located on disk
    j = ob.hint("merge").join(cb, ob.o_custkey == cb.c_custkey)
    assert shuffle_count(j) == 0
    # bucketed aggregation on the bucket key also skips the exchange
    agg = ob.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    assert shuffle_count(agg) == 0
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")


def test_ivf_train_and_assign(spark):
    import random

    rng = random.Random(7)
    rows = []
    for i in range(60):
        base = [5.0, 5.0] if i % 2 == 0 else [-5.0, -5.0]
        rows.append((i, [base[0] + rng.gauss(0, 0.3), base[1] + rng.gauss(0, 0.3)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centroids = similarity.ivf_train(df, k=2, iters=4)
    assert len(centroids) == 2
    # the two learned centroids sit near the two true clusters
    signs = sorted(tuple(1 if x > 0 else -1 for x in c) for c in centroids)
    assert signs == [(-1, -1), (1, 1)]
    assigned = similarity.ivf_assign(df, centroids)
    # assignment is pure: same-cluster points share a cell
    cells = {r.vec_id: r.ivf_cell for r in assigned.collect()}
    even_cells = {cells[i] for i in range(0, 60, 2)}
    odd_cells = {cells[i] for i in range(1, 60, 2)}
    assert len(even_cells) == 1 and len(odd_cells) == 1
    assert even_cells != odd_cells


def test_ivf_assign_scales_to_production_k(spark):
    """k = 64 centroids (production is k ~ sqrt(n), routinely 100+).
    The original folded when-chain argmax embedded the running best
    twice per step — an O(2^k) expression tree that OOM'd Catalyst
    around k ~ 20 — so this test is the regression pin for the O(k·dim)
    array argmax. Also checks the argmax semantics against numpy:
    first-max tie-break, -1 sentinel for a zero-norm vector."""
    import numpy as np

    rng = np.random.RandomState(3)
    d, k, n = 16, 64, 40
    cents = [[float(x) for x in rng.randn(d)] for _ in range(k)]
    vecs = [[float(x) for x in rng.randn(d)] for _ in range(n)]
    rows = [(i, v) for i, v in enumerate(vecs)] + [(999, [0.0] * d)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: r.ivf_cell
        for r in similarity.ivf_assign(df, cents).collect()
    }
    C = np.array(cents)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    for i, v in enumerate(vecs):
        vv = np.array(v)
        sims = Cn @ (vv / np.linalg.norm(vv))
        assert got[i] == int(np.argmax(sims)), i
    assert got[999] == -1  # zero-norm vector -> sentinel cell


def test_ivf_assign_join_path_matches_literal_path(spark):
    """The two physical assignment plans share one contract: identical
    cells for every vector, including the adversarial cases — a
    zero-norm vector (sentinel -1 on both paths), a zero-norm CENTROID
    (its null score must lose to every real score), and exact ties
    (first-index wins). Also proves the auto-routing threshold: above
    the literal budget ivf_assign must produce the join-path result."""
    import numpy as np

    rng = np.random.RandomState(13)
    d = 8
    cents = [[float(x) for x in rng.randn(d)] for _ in range(30)]
    cents.append([0.0] * d)          # zero-norm centroid: never wins
    cents.append(list(cents[0]))     # duplicate: exact tie, index 0 wins
    rows = [(i, [float(x) for x in rng.randn(d)]) for i in range(300)]
    rows.append((7001, [0.0] * d))   # zero-norm vector: sentinel
    rows.append((7002, [x * 2.0 for x in cents[0]]))  # exact-tie probe
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    lit = {r.vec_id: r.ivf_cell for r in similarity.ivf_assign(df, cents).collect()}
    jn = {
        r.vec_id: r.ivf_cell
        for r in similarity._ivf_assign_join(
            df, cents, "vec_id", "embedding"
        ).collect()
    }
    assert lit == jn
    assert lit[7001] == -1
    assert lit[7002] == 0  # tie between centroid 0 and its duplicate

    # auto-routing: shrink the budget so ivf_assign itself takes the
    # join path, and the public surface still returns the same cells
    from py_etl_spark.operators import similarity as S

    old = S._IVF_LITERAL_BUDGET
    try:
        S._IVF_LITERAL_BUDGET = 1
        routed = {r.vec_id: r.ivf_cell for r in S.ivf_assign(df, cents).collect()}
    finally:
        S._IVF_LITERAL_BUDGET = old
    assert routed == lit

    # DOCUMENTED divergence on the id-uniqueness contract: a duplicate
    # id keeps one row per input row on the literal path but collapses
    # to ONE row under the join path's groupBy — this is why id_col
    # must be row-unique (see _ivf_assign_join docstring). Pin the
    # behavior so a silent change to either path is caught.
    dup = spark.createDataFrame(
        [(1, [1.0] * d), (1, [-1.0] * d), (2, [1.0] * d)],
        "vec_id long, embedding array<double>",
    )
    assert similarity.ivf_assign(dup, cents).count() == 3
    assert similarity._ivf_assign_join(
        dup, cents, "vec_id", "embedding"
    ).count() == 2
