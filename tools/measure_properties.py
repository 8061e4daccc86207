"""Round-4 scratch: measure property-oracle margins for the rows-only
queries (q90/q91/q93/q94/q109/q117) at every gate SF so the thresholds
baked into the property gates have verified headroom. Not part of the
package — a one-off measurement harness.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

import __spark_entry__ as E
from big_data_project_datapipeline_spark.functions import similarity as SIM
from big_data_project_datapipeline_spark.session import get_spark
from big_data_project_datapipeline_spark.tables import load_table

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def recall_per_query(ann, exact, queries, k):
    hits = (
        ann.select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    out = (
        queries.select(F.col("vec_id").alias("query_id"))
        .join(hits, "query_id", "left")
        .select("query_id", (F.coalesce(F.col("n_hits"), F.lit(0)) / k).alias("recall"))
        .orderBy("query_id")
    )
    return [(r["query_id"], r["recall"]) for r in out.collect()]


def main():
    spark = get_spark()
    for sf in SFS:
        emb = load_table(spark, sf, "embeddings")
        ev = load_table(spark, sf, "events")
        n_emb = emb.count()
        dim = len(emb.select("embedding").first()["embedding"])
        print(f"\n=== {sf}  embeddings={n_emb} dim={dim} ===")

        qs10 = emb.filter(F.col("vec_id") < 10)
        qs20 = emb.filter(F.col("vec_id") < 20)
        exact10 = SIM.cosine_topk(emb, qs10, k=5)
        exact20 = SIM.cosine_topk(emb, qs20, k=5)

        # q90 LSH
        ann = SIM.ann_topk_lsh(emb, qs10, k=5)
        rc = recall_per_query(ann, exact10, qs10, 5)
        print("q90 lsh recalls:", rc, "min:", min(r for _, r in rc))

        # q93 IVF
        ivf = SIM.ivf_topk(emb, qs10, k=5, n_lists=16, n_probe=4)
        rc = recall_per_query(ivf, exact10, qs10, 5)
        print("q93 ivf recalls:", rc, "min:", min(r for _, r in rc))

        # q117 IVFPQ
        t0 = time.time()
        pq = SIM.ivfpq_topk(emb, qs20, k=5, n_lists=16, n_probe=4, m=8, k_sub=16, refine=4)
        rc = recall_per_query(pq, exact20, qs20, 5)
        print("q117 ivfpq recalls:", rc, "min:", min(r for _, r in rc),
              f"({time.time()-t0:.1f}s)")

        # q91 PCA: Bessel error + variance-captured ratio on FULL corpus
        t0 = time.time()
        mean, comps, evar = SIM.pca_fit(emb, k=8)
        proj = SIM.pca_project(emb, k=8)
        print(f"  (pca fit+plan {time.time()-t0:.1f}s)")
        t0 = time.time()
        sq = F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.lit([float(x) for x in mean]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        psq = None
        for i in range(8):
            t = F.col(f"pc{i}") * F.col(f"pc{i}")
            psq = t if psq is None else psq + t
        m = proj.select(
            sq.alias("sq"), psq.alias("psq"), (sq - psq).alias("err")
        ).agg(
            F.min("err").alias("min_err"),
            F.max("err").alias("max_err"),
            F.sum("psq").alias("sum_psq"),
            F.sum("sq").alias("sum_sq"),
        ).first()
        print("q91 pca: min_bessel_err", m["min_err"], "var_ratio",
              m["sum_psq"] / m["sum_sq"], f"({time.time()-t0:.1f}s)")

        # q94: approx vs exact deltas per event_type
        ap = ev.groupBy("event_type").agg(
            F.approx_count_distinct("user_id").alias("au"),
            F.percentile_approx("value", [0.5, 0.95], 10000).alias("pp"),
        )
        ex = ev.groupBy("event_type").agg(
            F.count_distinct("user_id").alias("eu"),
            F.percentile("value", F.lit(0.5)).alias("p50"),
            F.percentile("value", F.lit(0.95)).alias("p95"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        j = ap.join(ex, "event_type").select(
            "event_type",
            (F.abs(F.col("au") - F.col("eu")) / F.col("eu")).alias("rel_users"),
            F.abs(F.col("pp")[0] - F.col("p50")).alias("d50"),
            F.abs(F.col("pp")[1] - F.col("p95")).alias("d95"),
            (F.col("vmax") - F.col("vmin")).alias("range"),
        )
        for r in j.orderBy("event_type").collect():
            print("q94", r["event_type"], "rel_users", round(r["rel_users"], 4),
                  "d50", round(r["d50"], 4), "d95", round(r["d95"], 4),
                  "range", round(r["range"], 2))

        # q109: per-label mean_recon_mse vs per-label mean-sq-dev from global mean
        books = SIM.pq_train(emb, m=4, k=16)
        audit = SIM.pq_audit(emb, books, group_col="label")
        gm = emb.agg(
            *[F.avg(F.col("embedding")[i].cast("double")).alias(f"m{i}") for i in range(dim)]
        ).first()
        gmean = [gm[f"m{i}"] for i in range(dim)]
        msd = emb.select(
            "label",
            (F.aggregate(
                F.zip_with(
                    F.col("embedding").cast("array<double>"),
                    F.lit([float(x) for x in gmean]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ) / F.lit(float(dim))).alias("sd"),
        ).groupBy("label").agg(F.avg("sd").alias("msd"))
        for r in audit.join(msd, "label").orderBy("label").collect():
            print("q109", r["label"], "n", r["n_vecs"], "mse", r["mean_recon_mse"],
                  "max", r["max_recon_mse"], "util", r["codebook_utilization"],
                  "msd_baseline", round(r["msd"], 4),
                  "ratio", round(r["mean_recon_mse"] / r["msd"], 3))


if __name__ == "__main__":
    main()
