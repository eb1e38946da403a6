#!/usr/bin/env python
"""Interleaved same-session A/B: r09 grouped-adjacency pagerank (OLD)
vs r10 hub-degree-cap split (NEW) on the sf1/sf10 replica edges.

One JVM, alternating arms, min-of-2 per arm (the only protocol that
survives this box's variance — SCALING.md §8). Full materialization via
the no-op sink. Values cross-checked exceptAll both directions once.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from py_etl_spark.operators.graph import MICRO, pagerank_fixed_point
from py_etl_spark.session import get_spark


def old_pagerank(edges, damping=0.85, iterations=3):
    """The r09 shape: single-groupBy grouped adjacency, no degree join."""
    d_micro = int(round(damping * MICRO))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    adjg = edges.groupBy(F.col("src").alias("node")).agg(
        F.collect_list(F.col("dst")).alias("__dsts"),
        F.count(F.lit(1)).alias("deg"),
    )
    ranks = nodes.withColumn("rank_micro", F.lit(MICRO).cast("long"))
    for _ in range(iterations):
        contrib = (
            ranks.join(adjg, "node")
            .select(
                F.floor(F.col("rank_micro") / F.col("deg"))
                .cast("long")
                .alias("__share"),
                F.explode("__dsts").alias("node"),
            )
            .groupBy("node")
            .agg(F.sum("__share").alias("in_micro"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(MICRO - d_micro)
                + F.floor(
                    F.lit(d_micro)
                    * F.coalesce(F.col("in_micro"), F.lit(0))
                    / F.lit(MICRO)
                ).cast("long")
            ).alias("rank_micro"),
        )
    return ranks


def build_edges(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = li.select(
        (F.col("l_partkey") * 2).cast("long").alias("src"),
        (F.col("l_suppkey") * 2 + 1).cast("long").alias("dst"),
    ).distinct()
    return pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def run(df):
    t = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark()
    edges = build_edges(spark, sf_dir)

    # values identical, once
    a = old_pagerank(edges)
    b = pagerank_fixed_point(edges, iterations=3)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    print("values: exceptAll-empty both directions", flush=True)

    olds, news = [], []
    for i in range(reps):
        olds.append(run(old_pagerank(edges)))
        print(f"  old[{i}] {olds[-1]:.2f}s", flush=True)
        news.append(run(pagerank_fixed_point(edges, iterations=3)))
        print(f"  new[{i}] {news[-1]:.2f}s", flush=True)
    print(
        f"RESULT sf_dir={sf_dir} old_min={min(olds):.2f} "
        f"new_min={min(news):.2f} old={olds} new={news}",
        flush=True,
    )


if __name__ == "__main__":
    main()
