#!/usr/bin/env python
"""Clustered-corpus ANN re-sweep (r9 VERDICT #6).

The committed sf0.1 sweep (bench_data/ann_recall_sweep_sf0.1.tsv) runs
on the driver's near-uniform synthetic embeddings, where PQ recall is
structurally low (disclosed in BENCH.md Appendix A reading (7)) — real
corpora CLUSTER, and the IVF fence + residual encoding are designed for
exactly that geometry. This sweep generates a seeded
mixture-of-Gaussians corpus shaped like the sf0.1 table (N=2000, dim
64, sqrt(N)~45 components, sigma=0.15 around unit-norm-ish centers) and
re-measures the same tiers with ncentroids scaled to sqrt(N):

- exact L2 top-5 baseline (the ADC metric's honest baseline)
- IVF fence alone (nprobe sweep): what coarse quantization buys when
  the data actually has cells
- PQ raw-trained vs RESIDUAL-trained (q171's operator): the residual
  lift the uniform corpus could not show
- SQ8: the 4x-compression accuracy tier, for the same bracket

Coarse centroids are the GENERATING component means (the fixed point a
converged k-means approximates on this mixture — disclosed, and the
deterministic choice keeps the TSV reproducible byte-for-byte).

Usage: python scripts/sweep_ann_clustered.py [out_tsv]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from geomesa_cassandra_tools_spark.operators import similarity  # noqa: E402
from geomesa_cassandra_tools_spark.operators.relational import (  # noqa: E402
    top_k_per_group,
)
from geomesa_cassandra_tools_spark.session import get_spark  # noqa: E402

N = 2000
DIM = 64
N_QUERIES = 32
K = 5
SIGMA = 0.15
SEED = 42


def main() -> None:
    out_tsv = (
        sys.argv[1] if len(sys.argv) > 1
        else "bench_data/ann_recall_clustered.tsv"
    )
    ncentroids = int(math.isqrt(N))  # sqrt(N) = 44 -> the fence scale rule
    rng = np.random.default_rng(SEED)
    centers = rng.normal(0.0, 1.0, size=(ncentroids, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, ncentroids, size=N)
    pts = centers[assign] + rng.normal(0.0, SIGMA, size=(N, DIM))

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="ann-clustered-sweep", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in pts[i]]) for i in range(N)],
        "vec_id bigint, embedding array<double>",
    ).repartition(8).persist()
    emb.count()
    qv = emb.where(F.col("vec_id") < N_QUERIES)
    centroids = spark.createDataFrame(
        [(int(c), [float(x) for x in centers[c]]) for c in range(ncentroids)],
        "cid bigint, centroid array<double>",
    )

    # exact COSINE baseline (ivf_topk's ranking metric) — timed, so
    # every approximate tier's serve wall has its honest comparator
    t0 = time.perf_counter()
    exact_cos = (
        similarity.cosine_topk(qv, emb, k=K)
        .select("query_id", "cand_id")
        .persist()
    )
    n_exact_cos = exact_cos.count()
    exact_cos_wall = time.perf_counter() - t0

    def recall_cos(approx_df) -> float:
        hits = exact_cos.join(
            approx_df.select("query_id", "cand_id"),
            ["query_id", "cand_id"], "left_semi",
        ).count()
        return hits / n_exact_cos

    # exact L2 baseline (the metric every ADC tier ranks by)
    qp = F.broadcast(
        similarity._prep(qv, "vec_id", "embedding", "query_id", "qv")
    )
    cp = similarity._prep(emb, "vec_id", "embedding", "cand_id", "cv")
    l2 = qp.join(cp, F.col("query_id") != F.col("cand_id")).select(
        "query_id", "cand_id",
        F.aggregate(
            F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x,
        ).alias("d2"),
    )
    exact = top_k_per_group(
        l2, ["query_id"], [F.col("d2").asc(), F.col("cand_id")], K
    ).select("query_id", "cand_id").persist()
    n_exact = exact.count()

    def recall(approx_df) -> float:
        hits = exact.join(
            approx_df.select("query_id", "cand_id"),
            ["query_id", "cand_id"], "left_semi",
        ).count()
        return hits / n_exact

    rows = [("exact-cosine", "brute-force top-5 (the serve-wall baseline)",
             1.0, exact_cos_wall)]

    # IVF fence alone: coarse cells + exact cosine inside probed cells
    # (recall vs the exact-cosine baseline — ivf_topk's own metric)
    for nprobe in (1, 2, 4, 8):
        t0 = time.perf_counter()
        approx = similarity.ivf_topk(
            qv, emb, k=K, centroids=centroids, nprobe=nprobe
        )
        rows.append((
            "ivf",
            f"ncentroids={ncentroids} nprobe={nprobe} "
            "(exact-in-cell; recall vs exact-cosine)",
            recall_cos(approx), time.perf_counter() - t0,
        ))

    # PQ raw-trained vs residual-trained: the lift residual encoding
    # exists to provide on clustered data
    for m, kc in ((8, 16), (16, 16)):
        t0 = time.perf_counter()
        cb = similarity.pq_train(emb, DIM, m, kc, rounds=2)
        codes = similarity.pq_encode_blas(emb, cb)
        approx = similarity.pq_adc_topk(codes, qv, cb, K, max_queries=N_QUERIES)
        rows.append((
            "pq", f"m={m} k={kc} raw-trained r2 (wall incl. train+encode)",
            recall(approx), time.perf_counter() - t0,
        ))

    res = similarity.ivf_residuals(emb, centroids)
    res.persist().count()
    for m, kc in ((8, 16), (16, 16), (8, 256)):
        t_b0 = time.perf_counter()
        cb_r = similarity.pq_train(res, DIM, m, kc, rounds=2, vec_col="residual")
        codes_r = similarity.pq_encode_blas(res, cb_r, vec_col="residual").join(
            res.select("vec_id", "cid"), "vec_id"
        )
        codes_r.persist().count()
        build = time.perf_counter() - t_b0
        for nprobe in (1, 4, 8):
            t0 = time.perf_counter()
            approx = similarity.ivf_pq_residual_topk(
                qv, centroids, cb_r, codes_r, k=K, nprobe=nprobe,
                max_queries=N_QUERIES,
            )
            rows.append((
                "ivfpq-residual",
                f"ncentroids={ncentroids} nprobe={nprobe} m={m} k={kc} "
                f"residual-trained r2 (serve wall; build {build:.1f}s)",
                recall(approx), time.perf_counter() - t0,
            ))
        # the refine stage (FAISS IndexIVFPQ + exact rerank): recall vs
        # the EXACT-COSINE baseline, since the rerank re-scores in
        # cosine — the production recipe whenever ADC alone is short
        for nprobe, overfetch in ((4, 4), (8, 4)):
            t0 = time.perf_counter()
            approx = similarity.ivf_pq_residual_rerank_topk(
                qv, centroids, cb_r, codes_r, emb, k=K, nprobe=nprobe,
                overfetch=overfetch, max_queries=N_QUERIES,
            )
            rows.append((
                "ivfpq-residual-rerank",
                f"ncentroids={ncentroids} nprobe={nprobe} m={m} k={kc} "
                f"overfetch={overfetch} exact-cosine refine "
                f"(serve wall; build {build:.1f}s; recall vs exact-cosine)",
                recall_cos(approx), time.perf_counter() - t0,
            ))
        codes_r.unpersist()
    res.unpersist()

    # SQ8 bracket
    t0 = time.perf_counter()
    los, his = similarity.sq8_calibrate(emb, DIM)
    sq_codes = similarity.sq8_encode(emb, los, his)
    approx = similarity.sq8_adc_topk(
        sq_codes, qv, los, his, k=K, max_queries=N_QUERIES
    )
    rows.append((
        "sq8", "per-dim int8 (wall incl. calibrate+encode)",
        recall(approx), time.perf_counter() - t0,
    ))

    exact.unpersist()
    exact_cos.unpersist()
    emb.unpersist()

    header = (
        f"# clustered mixture-of-Gaussians corpus: N={N} dim={DIM} "
        f"components={ncentroids} sigma={SIGMA} seed={SEED}\n"
        "path\tparams\trecall_at_5\twall_s"
    )
    lines = [header] + [
        f"{p}\t{params}\t{r:.4f}\t{w:.2f}" for p, params, r, w in rows
    ]
    print("\n".join(lines))
    os.makedirs(os.path.dirname(out_tsv), exist_ok=True)
    with open(out_tsv, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"# written: {out_tsv}", file=sys.stderr)


if __name__ == "__main__":
    main()
