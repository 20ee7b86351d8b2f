#!/usr/bin/env python
"""ANN recall/cost knob sweep (r6 VERDICT item 8): measure what the LSH
bucket width (nbits), multiprobe count, and IVF probe count actually buy
on THIS corpus, so q146's defaults are justified by a curve instead of a
single calibration point.

For 32 query vectors against the full embeddings corpus:
- exact cosine top-5 (`cosine_topk`) is the recall baseline, computed once;
- LSH (`lsh_cosine_topk`) sweeps nbits x multiprobe — wider signatures
  shrink buckets (cheaper, lower recall); multiprobe widens the probe set
  (recall back up at ~(m+1)x candidate cost);
- IVF (`ivf_topk`) sweeps nprobe over 8 coarse centroids.

Per variant: mean recall@5 (sum hits / sum exact) and wall seconds for
the full pipeline INCLUDING its index/signature build — the one-shot cost
a production run would amortize, disclosed rather than hidden. Output is
one TSV row per variant (stdout + bench_data/ann_recall_sweep_<sf>.tsv);
BENCH.md carries the committed table.

Usage: python scripts/sweep_ann_recall.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from geomesa_cassandra_tools_spark.operators import similarity  # noqa: E402
from geomesa_cassandra_tools_spark.session import get_spark  # noqa: E402
from geomesa_cassandra_tools_spark.sources.tables import load_tables  # noqa: E402

N_QUERIES = 32
K = 5
DIM = 64


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="ann-recall-sweep", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_tables(spark, sf_dir)["embeddings"]
    qv = emb.where(F.col("vec_id") < N_QUERIES)

    exact = (
        similarity.cosine_topk(qv, emb, k=K)
        .select("query_id", "cand_id")
        .persist()
    )
    n_exact = exact.count()  # materialize the baseline once

    def recall_of(approx_df) -> float:
        hits = exact.join(
            approx_df.select("query_id", "cand_id"),
            ["query_id", "cand_id"],
            "left_semi",
        ).count()
        return hits / n_exact

    rows = []

    for nbits in (8, 16, 32):
        for multiprobe in (0, 1, 2):
            t0 = time.perf_counter()
            sigs = similarity.corpus_hyperplane_signatures(
                emb, dim=DIM, nbits=nbits
            )
            approx = similarity.lsh_cosine_topk(
                qv, emb, k=K, dim=DIM, nbits=nbits,
                multiprobe=multiprobe, corpus_sigs=sigs,
            )
            r = recall_of(approx)
            wall = time.perf_counter() - t0
            rows.append(
                ("lsh", f"nbits={nbits} multiprobe={multiprobe} ntables=1",
                 r, wall)
            )

    # the multi-table lever: L independent tables, union of candidates
    for nbits in (8, 16):
        for ntables in (4, 8, 16):
            t0 = time.perf_counter()
            sigs = similarity.corpus_hyperplane_signatures(
                emb, dim=DIM, nbits=nbits, ntables=ntables
            )
            approx = similarity.lsh_cosine_topk(
                qv, emb, k=K, dim=DIM, nbits=nbits,
                corpus_sigs=sigs, ntables=ntables,
            )
            r = recall_of(approx)
            wall = time.perf_counter() - t0
            rows.append(
                ("lsh", f"nbits={nbits} multiprobe=0 ntables={ntables}",
                 r, wall)
            )

    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("centroid")
    )
    for nprobe in (1, 2, 4):
        t0 = time.perf_counter()
        approx = similarity.ivf_topk(
            qv, emb, k=K, centroids=centroids, nprobe=nprobe
        )
        r = recall_of(approx)
        wall = time.perf_counter() - t0
        rows.append(("ivf", f"ncentroids=8 nprobe={nprobe}", r, wall))

    exact.unpersist()

    # PQ ranks by ASYMMETRIC L2, so its honest baseline is exact L2 top-k
    # (cosine and L2 rankings differ on unnormalized vectors) — computed
    # once, same protocol as the cosine baseline above.
    from geomesa_cassandra_tools_spark.operators.relational import (
        top_k_per_group,
    )

    qp = F.broadcast(
        similarity._prep(qv, "vec_id", "embedding", "query_id", "qv")
    )
    cp = similarity._prep(emb, "vec_id", "embedding", "cand_id", "cv")
    l2 = (
        qp.join(cp, F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.aggregate(
                F.zip_with(
                    F.col("qv"), F.col("cv"), lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d2"),
        )
    )
    exact_l2 = top_k_per_group(
        l2, ["query_id"], [F.col("d2").asc(), F.col("cand_id")], K
    ).select("query_id", "cand_id").persist()
    n_exact_l2 = exact_l2.count()

    def recall_l2(approx_df) -> float:
        hits = exact_l2.join(
            approx_df.select("query_id", "cand_id"),
            ["query_id", "cand_id"],
            "left_semi",
        ).count()
        return hits / n_exact_l2

    for m, kc in ((8, 16), (8, 64), (16, 16)):
        for trained in (False, True):
            t0 = time.perf_counter()
            if trained:
                cb = similarity.pq_train(emb, DIM, m, kc, rounds=2)
            else:
                cb = similarity.pq_codebooks(DIM, m, kc)
            codes = similarity.pq_encode_blas(emb, cb)
            approx = similarity.pq_adc_topk(
                codes, qv, cb, K, max_queries=N_QUERIES
            )
            r = recall_l2(approx)
            wall = time.perf_counter() - t0
            rows.append(
                (
                    "pq",
                    f"m={m} k={kc} {'trained' if trained else 'random'}"
                    " (recall vs exact-L2; wall incl. train+encode)",
                    r,
                    wall,
                )
            )

    # the two-stage recipe (q160): ADC candidates + exact cosine rerank.
    # Recall here is measured against the EXACT-L2 baseline on the
    # candidate-generation axis (what stage 1 can lose); overfetch is the
    # recall-recovery knob — stage 2 cannot miss a true neighbor that
    # stage 1 retrieved.
    cb_t = similarity.pq_train(emb, DIM, 16, 16, rounds=2)
    codes_t = similarity.pq_encode_blas(emb, cb_t)
    for overfetch in (2, 4, 8):
        t0 = time.perf_counter()
        approx = similarity.pq_adc_topk(
            codes_t, qv, cb_t, K * overfetch, max_queries=N_QUERIES
        )
        r = recall_l2(approx)  # candidate-set recall: did stage 1 keep it?
        wall = time.perf_counter() - t0
        rows.append(
            (
                "pq+rerank",
                f"m=16 k=16 trained overfetch={overfetch} "
                "(candidate-set recall vs exact-L2)",
                r,
                wall,
            )
        )

    # IVF-PQ (q168's operator): the coarse fence multiplies the PQ
    # compression — nprobe recovers what the fence loses. Recall vs
    # exact-L2 (the ADC metric), wall incl. encode + assigns.
    centroids4 = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("centroid")
    )
    for m, kc in ((8, 16), (16, 16)):
        for nprobe in (1, 2, 4):
            t0 = time.perf_counter()
            cb = similarity.pq_codebooks(DIM, m, kc)
            approx = similarity.ivf_pq_topk(
                qv, emb, centroids4, cb, k=K, nprobe=nprobe,
                max_queries=N_QUERIES,
            )
            r = recall_l2(approx)
            wall = time.perf_counter() - t0
            rows.append(
                (
                    "ivfpq",
                    f"ncentroids=8 nprobe={nprobe} m={m} k={kc} random "
                    "(recall vs exact-L2; wall incl. encode+assign)",
                    r,
                    wall,
                )
            )

    # RESIDUAL IVF-PQ (q171's operator, the FAISS-proper form): codes
    # quantize (x - cell centroid) against codebooks TRAINED on the
    # residuals — the recall lift over the raw-vector/random-book rows
    # above is the whole point of residual encoding (the codebook budget
    # resolves the small residual ball, not the full embedding span).
    # Wall includes residual computation, training, and encode — the
    # one-shot index-build cost ingestion amortizes (q171 serves from
    # the persisted index and pays none of it).
    res = similarity.ivf_residuals(emb, centroids4)
    res.persist().count()
    for m, kc in ((8, 16), (16, 16)):
        t_train0 = time.perf_counter()
        cb_r = similarity.pq_train(
            res, DIM, m, kc, rounds=2, vec_col="residual"
        )
        codes_r = similarity.pq_encode_blas(
            res, cb_r, vec_col="residual"
        ).join(res.select("vec_id", "cid"), "vec_id")
        codes_r.persist().count()
        build_wall = time.perf_counter() - t_train0
        for nprobe in (1, 2, 4):
            t0 = time.perf_counter()
            approx = similarity.ivf_pq_residual_topk(
                qv, centroids4, cb_r, codes_r, k=K, nprobe=nprobe,
                max_queries=N_QUERIES,
            )
            r = recall_l2(approx)
            wall = time.perf_counter() - t0
            rows.append(
                (
                    "ivfpq-residual",
                    f"ncentroids=8 nprobe={nprobe} m={m} k={kc} "
                    f"residual-trained r2 (recall vs exact-L2; serve wall; "
                    f"build {build_wall:.1f}s amortized)",
                    r,
                    wall,
                )
            )
        codes_r.unpersist()
    res.unpersist()

    # SQ8 (q169's operator): codebook-free per-dim bytes — the recall a
    # 4x compression keeps on this corpus, vs PQ's 32x.
    t0 = time.perf_counter()
    los, his = similarity.sq8_calibrate(emb, DIM)
    sq_codes = similarity.sq8_encode(emb, los, his)
    approx = similarity.sq8_adc_topk(
        sq_codes, qv, los, his, k=K, max_queries=N_QUERIES
    )
    r = recall_l2(approx)
    wall = time.perf_counter() - t0
    rows.append(
        ("sq8", "per-dim int8 (recall vs exact-L2; wall incl. calibrate+encode)",
         r, wall)
    )

    exact_l2.unpersist()

    sf = os.path.basename(sf_dir.rstrip("/"))
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_data", f"ann_recall_sweep_{sf}.tsv",
    )
    header = "path\tparams\trecall_at_5\twall_s"
    lines = [header] + [
        f"{p}\t{params}\t{r:.4f}\t{w:.2f}" for p, params, r, w in rows
    ]
    print("\n".join(lines))
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"# written: {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
