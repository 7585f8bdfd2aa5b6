"""IVF ANN recall vs brute force + Observation metrics."""

from __future__ import annotations

from pyspark.sql import functions as F

from commoncrawl_crawler_spark.operators import metrics, similarity
from commoncrawl_crawler_spark.sources import load_table


def _probes(emb):
    return emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )


def test_ivf_recall_against_brute_force(spark, sf_smoke):
    emb = load_table(spark, "embeddings", sf_smoke)
    exact = similarity.brute_force_topk(emb, _probes(emb), k=5).collect()
    approx = similarity.ivf_topk(
        emb, _probes(emb), k=5, n_probe=2, n_cells=8
    ).collect()

    truth = {(r["probe_id"], r["vec_id"]) for r in exact}
    got = {(r["probe_id"], r["vec_id"]) for r in approx}
    recall = len(truth & got) / len(truth)
    # measured ~0.88 with kmeans cells; random cell assignment would
    # give ~n_probe/n_cells = 0.25 -- assert well above that baseline
    assert recall >= 0.7, f"IVF recall too low: {recall}"


def test_ivf_touches_only_probed_cells(spark, sf_smoke):
    emb = load_table(spark, "embeddings", sf_smoke)
    cells = similarity.kmeans_cells(emb, k=8)
    approx = similarity.ivf_topk(emb, _probes(emb), k=5, n_probe=2, cells=cells)
    # every returned neighbor must come from <= n_probe cells per probe
    per_probe = (
        approx.join(cells, "vec_id")
        .groupBy("probe_id")
        .agg(F.countDistinct("cell").alias("cells"))
        .collect()
    )
    assert all(r["cells"] <= 2 for r in per_probe)


def test_kmeans_cells_partition_everything(spark, sf_smoke):
    emb = load_table(spark, "embeddings", sf_smoke)
    cells = similarity.kmeans_cells(emb, k=8)
    assert cells.count() == emb.count()  # every vector assigned
    assert cells.select("vec_id").distinct().count() == emb.count()  # once
    assert cells.select("cell").distinct().count() <= 8


def test_observed_metrics_single_action(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None)], "id long, v string"
    )
    out, obs = metrics.observed(
        df,
        "checks",
        rows=F.count(F.lit(1)),
        null_v=F.sum(F.col("v").isNull().cast("int")),
    )
    assert out.count() == 3
    assert obs.get == {"rows": 3, "null_v": 2}
