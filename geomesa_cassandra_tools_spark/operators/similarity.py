"""Similarity search over embedding columns (`array<float>`).

- ``cosine_topk``: exact brute-force top-k for a (small) query set —
  broadcast the queries, score JVM-side with zip_with/aggregate, window
  top-k. The baseline every approximate method is measured against.
- ``lsh_cosine_topk``: random-hyperplane LSH bucketing — candidates share a
  signed-projection signature, scored only within buckets. The scale path:
  candidate count ∝ bucket sizes, not n².
- ``ivf_topk``: IVF-style coarse quantization with deterministic seed
  centroids — probe the nearest ``nprobe`` partitions only.

Everything is Column-expression math (functions/vectors.py); no UDFs, so
scoring stays inside whole-stage codegen and scales with executors.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geomesa_cassandra_tools_spark.functions.vectors import (
    as_double,
    cosine,
    dot,
    norm,
)
from geomesa_cassandra_tools_spark.operators.relational import (
    ensure_parallelism,
    sized_parallelism,
    top_k_per_group,
)


def _prep(df: DataFrame, id_col: str, vec_col: str, id_out: str, vec_out: str) -> DataFrame:
    return df.select(F.col(id_col).alias(id_out), as_double(F.col(vec_col)).alias(vec_out))


#: operator-internal persisted intermediates (e.g. cosine_pairs_above's
#: block assignment) — registered here and drained by the registry's
#: release_query_caches hook, the same lifecycle as per-query caches.
#: persist + explicit release instead of localCheckpoint: checkpoint
#: blocks are unrecoverable after executor loss (truncated lineage
#: cannot recompute — r13 ADVICE item 3), a persisted frame just
#: recomputes.
_SCRATCH_CACHES: list[DataFrame] = []


def _scratch_cache(df: DataFrame) -> DataFrame:
    df = df.persist()
    _SCRATCH_CACHES.append(df)
    return df


def release_scratch_caches() -> None:
    while _SCRATCH_CACHES:
        try:
            _SCRATCH_CACHES.pop().unpersist()
        except Exception:  # noqa: BLE001 — stopped session
            pass


def _paired_cosine(nq: str = "__nq", nc: str = "__nc") -> Column:
    """`cosine(qv, cv)` with the two norms read from COLUMNS computed
    once per input row BEFORE the join (r14, guide §2.3): the inline
    form re-derives both norm folds per candidate PAIR — on a
    quadratic scoring stage that is 4 of its 5 interpreted folds.
    Projections on opposite sides of a join are never collapsed into
    the pair-level select, so each side's norm is evaluated once per
    row; the denominator product and the guarded division see the
    identical doubles, so every cos is bit-identical to the inline
    form."""
    denom = F.col(nq) * F.col(nc)
    return F.when(denom != 0, dot(F.col("qv"), F.col("cv")) / denom)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query side is broadcast (it is the small side by construction), so
    the 'cross join' is a broadcast nested loop with no shuffle of the
    corpus — each corpus partition scores independently, then one window
    top-k shuffle on query_id. Self-matches are excluded. Norms are
    hoisted to per-side projections (`_paired_cosine`), so the O(|q|·|c|)
    stage pays one dot fold per pair, not five folds."""
    q = F.broadcast(
        _prep(queries, id_col, vec_col, "query_id", "qv").withColumn(
            "__nq", norm(F.col("qv"))
        )
    )
    c = _prep(corpus, id_col, vec_col, "cand_id", "cv").withColumn(
        "__nc", norm(F.col("cv"))
    )
    scored = (
        q.join(c, F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", _paired_cosine().alias("cos"))
    )
    return top_k_per_group(
        scored, ["query_id"], [F.col("cos").desc(), F.col("cand_id")], k, keep_rank=True
    ).withColumnRenamed("rn", "rank")


def hyperplane_signature(vec, hyperplanes: list[list[float]]):
    """Sign-bit signature of a vector against fixed hyperplanes, packed into
    a bigint: bit_i = 1 iff dot(vec, H_i) >= 0."""
    sig = F.lit(0).cast("bigint")
    for i, h in enumerate(hyperplanes):
        arr = F.array(*[F.lit(float(x)) for x in h])
        sig = sig + F.when(dot(vec, arr) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sig


def blas_hyperplane_signatures(
    df: DataFrame,
    planes: list[list[float]],
    id_col: str,
    vec_col: str,
    ntables: int = 1,
) -> DataFrame:
    """`hyperplane_signature` computed by BLAS matmul (`mapInPandas`)
    instead of per-row interpreted folds — the corpus side of LSH is the
    hot path (every row × every plane), and a matmul is ~100× the
    expression evaluator.

    Bit-identical to the JVM fold by the candidates→verify argument
    (see `blas_cosine_topk`): a signature bit only differs if the two
    summation orders disagree on the SIGN of the dot product, which
    requires |dot| below float-sum noise — any |dot| < 1e-6 is therefore
    recomputed with the exact left-to-right sequential sum the JVM fold
    uses, so borderline rows get the identical sign.

    ``ntables > 1`` interprets ``planes`` as ntables CONSECUTIVE plane
    sets of nbits each (multi-table LSH) and emits the long format
    ``(id, vec, table, sig)`` — one matmul computes every table's bits,
    so L tables cost one corpus pass, not L."""
    import numpy as np
    import pandas as pd

    pl = np.array(planes, dtype=np.float64)  # (ntables*nbits) × dim
    nbits = pl.shape[0] // ntables
    weights = (1 << np.arange(nbits, dtype=np.int64))

    def compute(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            dots = mat @ pl.T  # n × (ntables*nbits)
            for r, b in zip(*np.where(np.abs(dots) < 1e-6)):
                acc = 0.0
                for x, h in zip(mat[r], pl[b]):
                    acc = acc + float(x) * float(h)
                dots[r, b] = acc
            bits = dots >= 0
            if ntables == 1:
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].to_numpy(),
                        vec_col: pdf[vec_col],
                        "sig": (bits @ weights).astype(np.int64),
                    }
                )
                continue
            n = len(pdf)
            sigs = np.empty((n, ntables), dtype=np.int64)
            for t in range(ntables):
                sigs[:, t] = bits[:, t * nbits:(t + 1) * nbits] @ weights
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), ntables),
                    vec_col: pdf[vec_col].to_numpy().repeat(ntables),
                    "table": np.tile(
                        np.arange(ntables, dtype=np.int32), n
                    ),
                    "sig": sigs.reshape(-1),
                }
            )

    if ntables == 1:
        schema = f"{id_col} bigint, {vec_col} array<double>, sig bigint"
    else:
        schema = (
            f"{id_col} bigint, {vec_col} array<double>, table int, sig bigint"
        )
    return df.mapInPandas(compute, schema)


def random_hyperplanes(dim: int, nbits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (fixed LCG; no RNG state)."""
    planes, state = [], seed
    for _ in range(nbits):
        row = []
        for _ in range(dim):
            state = (state * 1_103_515_245 + 12_345) % 2_147_483_647
            row.append((state / 2_147_483_647.0) * 2.0 - 1.0)
        planes.append(row)
    return planes


def corpus_hyperplane_signatures(
    corpus: DataFrame,
    dim: int,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    ntables: int = 1,
) -> DataFrame:
    """The corpus side of hyperplane LSH as a standalone frame
    ``(cand_id, cv, sig)`` — mirroring ``minhash_signatures``' shape so
    callers compute the (expensive, full-scan) BLAS signature pass ONCE,
    persist it, and share it across every probe variant (plain, multiprobe,
    different k). This is the production shape: signatures are a
    materialized index table, not a per-query derivation.

    ``ntables > 1`` emits the multi-table long format
    ``(cand_id, cv, table, sig)`` — L independent hash tables from one
    corpus pass (the classic LSH recall lever: a true neighbor is missed
    only if it hashes apart in EVERY table, so miss probability decays
    exponentially in L while candidate volume grows only linearly).
    Table 0's planes are exactly the ntables=1 planes (one LCG stream),
    so single-table indexes stay byte-identical."""
    planes = random_hyperplanes(dim, nbits * ntables, seed)
    return blas_hyperplane_signatures(
        ensure_parallelism(_prep(corpus, id_col, vec_col, "cand_id", "cv")),
        planes,
        "cand_id",
        "cv",
        ntables=ntables,
    )


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = 0,
    corpus_sigs: DataFrame | None = None,
    seed: int = 42,
    ntables: int = 1,
) -> DataFrame:
    """Approximate top-k: score only candidates whose hyperplane signature
    equals the query's. Equi-join on the signature → hash join, ~n/2^nbits
    candidates per query instead of n. Recall < 1 by construction;
    ``multiprobe=m`` additionally probes the m buckets at Hamming distance 1
    on the lowest bits (query side explodes to m+1 probe signatures — the
    join stays equi, candidates grow ~(m+1)×, recall rises accordingly).
    This is the 100 TB path where brute force is off the table.

    ``ntables=L`` probes L INDEPENDENT hash tables and unions candidates —
    the standard LSH recall lever and, per the committed sweep
    (bench_data/ann_recall_sweep_sf0.1.tsv), the one that matters: a
    single table's recall collapses once 2^nbits passes the corpus/bucket
    sweet spot, while a neighbor escapes L tables only with exponentially
    small probability. Candidates grow ~L×; the join stays equi on
    (table, sig). Composes with multiprobe (applied per table).

    ``corpus_sigs`` (from ``corpus_hyperplane_signatures`` with the same
    dim/nbits/seed/ntables, usually persisted) skips the corpus BLAS pass
    entirely — pass it whenever more than one probe variant runs over the
    same corpus. ``seed`` MUST match the one the corpus signatures were
    built with: the query side hashes with these planes, and a mismatched
    seed silently degrades recall to chance (~n/2^nbits random buckets) —
    there is no way to detect it from the data, so the parameter is
    explicit here instead of hardcoded.
    """
    all_planes = random_hyperplanes(dim, nbits * ntables, seed=seed)
    q = _prep(queries, id_col, vec_col, "query_id", "qv")
    if ntables == 1:
        q = q.withColumn(
            "sig", hyperplane_signature(F.col("qv"), all_planes)
        )
    else:
        # L tables × nbits planes as per-table JVM literal chains is
        # ~L·nbits·dim plan nodes — plan build/codegen dwarfs the data
        # work (measured ~2 s at L=4). One Arrow batch through the same
        # BLAS kernel the corpus side uses emits the identical long
        # format (sign parity guaranteed by its borderline re-check).
        q = blas_hyperplane_signatures(
            q, all_planes, "query_id", "qv", ntables=ntables
        )
    if multiprobe > 0:
        probes = F.array(
            F.col("sig"),
            *[F.col("sig").bitwiseXOR(F.lit(1 << i)) for i in range(multiprobe)],
        )
        q = q.withColumn("sig", F.explode(probes))
    c = (
        corpus_sigs
        if corpus_sigs is not None
        else corpus_hyperplane_signatures(
            corpus, dim, nbits, id_col, vec_col, seed=seed, ntables=ntables
        )
    )
    if ntables > 1 and "table" not in c.columns:
        raise ValueError(
            "ntables > 1 needs multi-table corpus signatures — rebuild "
            "corpus_sigs with the same ntables"
        )
    if ntables == 1 and "table" in c.columns:
        # the reverse mismatch would silently join the query's table-0
        # sig against EVERY table's rows (different hash functions) —
        # the same silent-degradation class as a wrong seed
        raise ValueError(
            "corpus_sigs is a multi-table index but ntables=1 — pass the "
            "matching ntables (or rebuild single-table signatures)"
        )
    join_cond = (F.col("q.sig") == F.col("c.sig")) & (
        F.col("query_id") != F.col("cand_id")
    )
    if ntables > 1:
        join_cond = join_cond & (F.col("q.table") == F.col("c.table"))
    pairs = (
        F.broadcast(q.withColumn("__nq", norm(F.col("qv"))))
        .alias("q")
        .join(c.withColumn("__nc", norm(F.col("cv"))).alias("c"), join_cond)
        .select("query_id", "cand_id", "qv", "cv", "__nq", "__nc")
    )
    if multiprobe > 0 or ntables > 1:
        # a candidate can land in several probed buckets/tables — dedup
        # before scoring
        pairs = pairs.dropDuplicates(["query_id", "cand_id"])
    # norms hoisted to per-side projections (one fold per input row, not
    # five per candidate pair — guide §2.3); cos values bit-identical
    scored = pairs.select(
        "query_id", "cand_id", _paired_cosine().alias("cos")
    )
    return top_k_per_group(
        scored, ["query_id"], [F.col("cos").desc(), F.col("cand_id")], k, keep_rank=True
    ).withColumnRenamed("rn", "rank")


def blas_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    overfetch: int = 4,
) -> DataFrame:
    """Exact top-k cosine via BLAS candidate generation + exact rerank.

    Stage 1 (approximate, fast): the query matrix is a numpy broadcast;
    each corpus partition multiplies its Arrow batch against it
    (`mapInPandas`) and emits its local top-(k·overfetch) candidates per
    query WITH their approximate sims; a per-query window then caps the
    union of all batches to the global approximate top-(k·overfetch), so
    the exact-join input is bounded by |Q|·k·overfetch no matter how many
    Arrow batches the corpus splits into (a matmul is ~100× per-row
    expression evaluation). Zero-norm rows on either side are scored
    -inf, never NaN, so they cannot displace real candidates.

    Stage 2 (exact, small): candidates are re-scored with the sequential
    JVM fold (`cosine`) and window-ranked — so results are bit-identical
    to the brute-force `cosine_topk` / a scalar-fold SQL engine, while the
    full corpus is only ever touched by BLAS. Any true top-k item ranks
    ≤ k within its own batch, so every batch's top-(k·overfetch) is a
    superset of its contribution to the global top-k: the rerank is exact
    by construction, overfetch only buffers against float-sum noise.

    This candidates→verify shape is how the 100 TB path should look:
    stage 1 scans, stage 2 touches O(parts·k) rows per query.
    """
    import numpy as np
    import pandas as pd

    q_prep = _prep(queries, id_col, vec_col, "query_id", "qv")
    # PRECONDITION: the query side must be driver-sized (a kNN probe set,
    # never the corpus). Enforced, not assumed — a caller passing the
    # corpus as queries gets an immediate error instead of a driver OOM.
    max_queries = 65536
    q_rows = q_prep.limit(max_queries + 1).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"blas_cosine_topk: query side exceeds {max_queries} rows; "
            "it must be a bounded probe set — swap sides or use "
            "cosine_pairs_above/lsh_cosine_topk for corpus-vs-corpus work"
        )
    if not q_rows:
        # an empty probe set has an empty answer — numpy's axis math on a
        # zero-row matrix would raise instead
        return corpus.sparkSession.createDataFrame(
            [], "query_id bigint, cand_id bigint, cos double, rank int"
        )
    q_ids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r["qv"] for r in q_rows], dtype=np.float64)
    q_nrm = np.sqrt((q_mat * q_mat).sum(axis=1))
    bc = corpus.sparkSession.sparkContext.broadcast((q_ids, q_mat, q_nrm))
    kk = k * overfetch

    def candidates(batches):
        ids, qm, qn = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            cids = pdf["cand_id"].to_numpy(dtype=np.int64)
            block = np.array(list(pdf["cv"]), dtype=np.float64)
            bn = np.sqrt((block * block).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = (qm @ block.T) / np.outer(qn, bn)
            # zero-norm vectors (either side) have no defined cosine —
            # -inf keeps them out of every top-k instead of NaN-poisoning
            # the argpartition
            sims[~np.isfinite(sims)] = -np.inf
            sims[:, :] = np.where(cids[None, :] == ids[:, None], -np.inf, sims)
            take = min(kk, sims.shape[1])
            top = np.argpartition(-sims, take - 1, axis=1)[:, :take]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids, take),
                    "cand_id": cids[top].ravel(),
                    "sim": np.take_along_axis(sims, top, axis=1).ravel(),
                }
            )

    c_prep = _prep(corpus, id_col, vec_col, "cand_id", "cv")
    cands = c_prep.mapInPandas(
        candidates, "query_id bigint, cand_id bigint, sim double"
    )
    # global per-query cap: the union over batches is top-(k·overfetch)
    # PER BATCH — unbounded in batch count — so reduce it to the global
    # approximate top-(k·overfetch) before the exact join. Tie-break on
    # cand_id matches the exact rerank's, so boundary ties keep the same
    # candidates the final ranking would pick. No broadcast hint: the
    # capped frame is |Q|·k·overfetch rows and AQE broadcasts it at
    # runtime when it fits — forcing it would collect an unbounded
    # pre-cap frame to the driver.
    cands = top_k_per_group(
        cands, ["query_id"], [F.col("sim").desc(), F.col("cand_id")], kk
    ).drop("sim")
    scored = (
        cands
        .join(c_prep, "cand_id")
        .join(F.broadcast(q_prep), "query_id")
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    return top_k_per_group(
        scored, ["query_id"], [F.col("cos").desc(), F.col("cand_id")], k, keep_rank=True
    ).withColumnRenamed("rn", "rank")


def cosine_pairs_above(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 16,
) -> DataFrame:
    """All (a, b) pairs with cosine >= threshold — embedding-based near-dup
    detection, the vector twin of text MinHash dedup. EXACT (recall 1.0)
    and fully distributed: the corpus is never collected to the driver.

    Shape: a metric block join with triangle-inequality pruning.

    1. **Assign** every vector to its nearest of ``n_blocks`` deterministic
       seed centroids (the first ``n_blocks`` corpus vectors, unit-
       normalized) — one BLAS `mapInPandas` pass over the scan.
    2. **Prune block pairs**: for unit vectors x in block i, y in block j,
       cos(x, y) = x̂·ŷ ≤ ĉi·ĉj + ri + rj + ri·rj where r is the block's
       max distance to its centroid — so block pairs whose bound falls
       below the threshold provably contain no qualifying pair and are
       dropped before any row is crossed. Only O(n_blocks) aggregated
       values (the radii) ever reach the driver.
    3. **Verify** surviving block pairs with BLAS (`applyInPandas` over
       side-tagged rows grouped by block pair): each (i, j) group
       multiplies block i against block j and emits only above-threshold
       pairs.

    Why not hyperplane LSH for stage 2: banded LSH recall is < 1 by
    construction, and a threshold join's qualifying pairs concentrate AT
    the threshold — the exact contract would silently break. The bound
    above is exact; on clusterable corpora (the near-dup use case) most of
    the O(B²) block grid prunes away, and in the worst case the operator
    degrades to a distributed block nested-loop, which is the exact
    lower bound anyway. At 100 TB raise ``n_blocks`` ~ √(corpus/5e5) so
    blocks stay executor-sized, and persist the assignment instead of
    recomputing it per consumer.

    Float note: BLAS summation order differs from a sequential fold by ~1
    ulp; any entry within 1e-9 of the threshold is recomputed with the
    exact left-to-right sequential fold, so boundary decisions match a
    scalar-fold engine bit-for-bit.
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    # Zero-norm vectors have no defined cosine: left in, they'd turn the
    # unit-dot assignment into NaNs that poison cid/rad and silently fail
    # every threshold comparison downstream. Excluded up front (a zero
    # embedding can never be part of a cosine>=t pair anyway).
    prep = corpus.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    ).where(dot(F.col("v"), F.col("v")) > 0)

    # Seed centroids: first n_blocks vectors by id — a bounded top-m probe
    # (n_blocks rows), NOT a corpus collect.
    seed_rows = prep.orderBy("id").limit(n_blocks).collect()
    if not seed_rows:
        # empty (or all-zero) corpus — nothing can pair
        return spark.createDataFrame([], "vec_a bigint, vec_b bigint, cos double")
    cmat = np.array([r["v"] for r in seed_rows], dtype=np.float64)
    cmat = cmat / np.sqrt((cmat * cmat).sum(axis=1, keepdims=True))
    bc_cent = spark.sparkContext.broadcast(cmat)

    def assign(batches):
        cent = bc_cent.value
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf["v"]), dtype=np.float64)
            nrm = np.sqrt((mat * mat).sum(axis=1))
            unit_dots = (mat / nrm[:, None]) @ cent.T
            best = unit_dots.max(axis=1)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "v": pdf["v"],
                    "nrm": nrm,
                    "cid": unit_dots.argmax(axis=1).astype(np.int32),
                    "rad": np.sqrt(np.maximum(0.0, 2.0 - 2.0 * best)),
                }
            )

    # Assign ONCE and persist: the assignment feeds three consumers
    # (radii, left side, right side). The r13 rewrite replaced the
    # fresh-plan-per-consumer shape (the corpus BLAS pass ran 3× because
    # cogrouped applyInPandas rejects two sides sharing attribute ids)
    # with one materialized pass + a side-TAGGED single applyInPandas
    # below — this is also the "persist the assignment" the 100 TB note
    # always prescribed. r14: persist (released by the registry hook)
    # instead of localCheckpoint(eager) — an A/B at sf0.1 read 1.53 vs
    # 1.57 vs 1.60 s (checkpoint/persist/none, min of 3) so the choice
    # is noise-level here, and persist survives executor loss where a
    # checkpointed lineage cannot recompute (r13 ADVICE item 3).
    assigned = _scratch_cache(
        sized_parallelism(prep).mapInPandas(
            assign, "id bigint, v array<double>, nrm double, cid int, rad double"
        )
    )

    # Block radii: n_blocks aggregated doubles — the only other driver data.
    radii = {
        r["cid"]: r["r"]
        for r in assigned.groupBy("cid").agg(F.max("rad").alias("r")).collect()
    }
    cdots = cmat @ cmat.T
    eps = 1e-9
    pair_rows = [
        (int(i), int(j))
        for i in radii
        for j in radii
        if i <= j
        and cdots[i, j] + radii[i] + radii[j] + radii[i] * radii[j] + eps >= threshold
    ]
    pairs = spark.createDataFrame(pair_rows, "ci int, cj int")
    # one frame, both roles: a row of block b joins every surviving pair
    # whose ci (role L) or cj (role R) is b — the union replaces the old
    # two-sided cogroup (2 exchanges + 2 python scans of the assignment)
    # with ONE exchange keyed (ci, cj) and ONE python stage
    sides = assigned.join(
        F.broadcast(pairs), assigned["cid"] == pairs["ci"]
    ).select("ci", "cj", F.lit(0).alias("side"), "id", "v", "nrm").unionAll(
        assigned.join(
            F.broadcast(pairs), assigned["cid"] == pairs["cj"]
        ).select("ci", "cj", F.lit(1).alias("side"), "id", "v", "nrm")
    )

    def seq_cos(a, b):
        # EVERY term sequential — dot AND both norms. The BLAS norms from
        # the assign pass use pairwise summation, which can differ from a
        # scalar engine's left fold by an ulp; dividing an exact dot by
        # pairwise norms would re-introduce the boundary-flip this
        # recompute exists to eliminate.
        acc = na = nb = 0.0
        for x, y in zip(a, b):
            x, y = float(x), float(y)
            acc += x * y
            na += x * x
            nb += y * y
        return acc / (math.sqrt(na) * math.sqrt(nb))

    def verify(key, pdf):
        lpdf = pdf[pdf["side"] == 0]
        rpdf = pdf[pdf["side"] == 1]
        if not len(lpdf) or not len(rpdf):
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cos": "float64"}
            )
        lids = lpdf["id"].to_numpy(dtype=np.int64)
        rids = rpdf["id"].to_numpy(dtype=np.int64)
        lmat = np.array(list(lpdf["v"]), dtype=np.float64)
        rmat = np.array(list(rpdf["v"]), dtype=np.float64)
        sims = (lmat @ rmat.T) / np.outer(
            lpdf["nrm"].to_numpy(), rpdf["nrm"].to_numpy()
        )
        for a, b in zip(*np.where(np.abs(sims - threshold) < 1e-9)):
            sims[a, b] = seq_cos(lmat[a], rmat[b])
        if key[0] == key[1]:
            mask = (sims >= threshold) & (lids[:, None] < rids[None, :])
        else:
            mask = sims >= threshold
        ai, bi = np.nonzero(mask)
        va, vb = lids[ai], rids[bi]
        return pd.DataFrame(
            {
                "vec_a": np.minimum(va, vb),
                "vec_b": np.maximum(va, vb),
                "cos": sims[ai, bi],
            }
        )

    return sides.groupBy("ci", "cj").applyInPandas(
        verify, "vec_a bigint, vec_b bigint, cos double"
    )


def nearest_cell(
    vec_col: str, cent_rows: list[tuple[int, list[float]]]
) -> Column:
    """Map-only nearest-centroid pick against LITERAL centroids —
    value-identical to the window form
    ``top_k_per_group(corpus × centroids, [id], [csim DESC, cid ASC], 1)``
    but with NO join, NO exchange and NO sort: one struct-argmin
    projection per row (the `_assign_struct` k-means pattern applied to
    the cosine quantizer; r14, guide §2.4).

    Equivalence to the window ordering, field by field of the argmin
    struct: ``nul`` (csim IS NULL — false sorts first, so non-null
    csims win, the window's NULLS LAST), ``neg`` (−csim with NULL→0.0 —
    ascending −csim is exactly descending csim for the finite doubles
    embeddings carry; all-NULL rows tie at 0.0 and fall through),
    ``cid`` (ascending — the window's tie-break).

    csim arithmetic is bit-identical to `cosine(vec, centroid)`:
    dot/(‖v‖·‖c‖) with NULL on a zero denominator, the same left-fold
    dot, the same ‖v‖ value (computed once per row and BOUND as a
    lambda variable — interpreted HOF expressions get no CSE, so naming
    subexpressions through lambdas is the only way to evaluate them
    once; the first cut of this function re-evaluated each csim 3× per
    struct field and LOST to the join form it replaced), and centroid
    norms precomputed in Python — the identical doubles: the JVM fold
    is a left-to-right sum of IEEE products and Math.sqrt/math.sqrt are
    both correctly rounded, so sqrt(Σ x·x) is the same bits either way.

    Returns the struct; read ``.cid`` (and ``.csim`` when the caller
    needs the similarity)."""
    rows = sorted(cent_rows)
    if not rows:
        raise ValueError("nearest_cell: empty centroid set")
    cid_lit = F.array(*[F.lit(int(cid)) for cid, _ in rows])
    cnorms = []
    for _cid, cv in rows:
        acc = 0.0
        for x in cv:
            acc += float(x) * float(x)
        cnorms.append(math.sqrt(acc))

    def _pick(na):
        csims = []
        for (_cid, cv), nb in zip(rows, cnorms):
            lit = F.array(*[F.lit(float(x)) for x in cv])
            denom = na * F.lit(nb)
            csims.append(
                F.when(denom != 0, dot(F.col(vec_col), lit) / denom)
            )
        return F.array_min(
            F.transform(
                F.array(*csims),
                lambda c, i: F.struct(
                    c.isNull().alias("nul"),
                    F.coalesce(-c, F.lit(0.0)).alias("neg"),
                    F.element_at(cid_lit, i + F.lit(1)).alias("cid"),
                    c.alias("csim"),
                ),
            )
        )

    # bind ‖v‖ once per row (1 fold), then one dot fold per centroid —
    # 1+K folds/row versus the join form's 5K
    return F.element_at(
        F.transform(F.array(norm(F.col(vec_col))), _pick), 1
    )


def collect_centroids(
    centroids: DataFrame, id_col: str = "cid", vec_col: str = "centroid"
) -> list[tuple[int, list[float]]]:
    """Driver-collect a (cid, centroid) frame into `nearest_cell` rows —
    bounded by construction (a coarse quantizer is n_cells × dim; the
    residual path already collects the same thing)."""
    prepped = centroids.select(id_col, as_double(F.col(vec_col)).alias("__cv"))
    return sorted(
        (int(r[id_col]), [float(x) for x in r["__cv"]])
        for r in prepped.collect()
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    centroids: DataFrame,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_assign: DataFrame | None = None,
) -> DataFrame:
    """IVF: assign corpus vectors to their nearest centroid partition once;
    each query probes only its ``nprobe`` nearest partitions. ``centroids``
    is ``(cid, centroid array<double>)`` — at scale produced by a sampled
    k-means; any deterministic coarse quantizer works.

    ``corpus_assign`` (optional, the `lsh_cosine_topk corpus_sigs`
    pattern): a precomputed ``(cand_id, cid)`` frame — usually persisted
    once per corpus — skips the corpus-side assignment scan entirely;
    it MUST have been produced by this same assignment contract
    (csim DESC, cid ASC tie-break) over the same centroids."""
    cent = F.broadcast(centroids.select("cid", as_double(F.col("centroid")).alias("cv0")))

    def assign(df: DataFrame, idc: str, vecc: str, n: int) -> DataFrame:
        scored = df.join(cent).select(
            idc, vecc, "cid", cosine(F.col(vecc), F.col("cv0")).alias("csim")
        )
        return top_k_per_group(scored, [idc], [F.col("csim").desc(), F.col("cid")], n).drop(
            "csim"
        )

    c_prep = _prep(corpus, id_col, vec_col, "cand_id", "cv")
    if corpus_assign is not None:
        c = c_prep.join(
            corpus_assign.select("cand_id", "cid"), "cand_id"
        ).select("cand_id", "cv", "cid")
    else:
        # corpus-side assignment is top-1: the map-only literal-centroid
        # argmin (no corpus×centroids join, no window exchange — r14,
        # guide §2.4); the query side keeps the window form (nprobe > 1
        # over a bounded query set — the join is trivial there)
        pick = nearest_cell("cv", collect_centroids(centroids))
        c = c_prep.select("cand_id", "cv", pick["cid"].alias("cid"))
    q = assign(_prep(queries, id_col, vec_col, "query_id", "qv"), "query_id", "qv", nprobe)
    # per-side norm columns: the probed-cell scoring stage pays one dot
    # fold per (query, candidate) pair instead of five (guide §2.3)
    scored = (
        F.broadcast(q.withColumn("__nq", norm(F.col("qv"))))
        .join(c.withColumn("__nc", norm(F.col("cv"))), ["cid"])
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", _paired_cosine().alias("cos"))
    )
    return top_k_per_group(
        scored, ["query_id"], [F.col("cos").desc(), F.col("cand_id")], k, keep_rank=True
    ).withColumnRenamed("rn", "rank")


def kmeans_assign(
    df: DataFrame,
    seeds: dict[int, list[float]],
    id_col: str = "vec_id",
    vec_col: str = "e",
) -> DataFrame:
    """One Lloyd's-iteration ASSIGN step against broadcast centroid
    literals: (id, cluster, d2) per input vector, where cluster is the
    seed with the smallest squared-L2 distance and ties break to the
    smaller centroid id (the `array_min` struct order — the contract
    q140's oracle mirrors with ORDER BY d2, cluster).

    ``seeds`` ships into the plan as literals (the "broadcast the
    centroids" step every distributed k-means performs); the argmin is a
    per-row array_min over a K-struct array — no shuffle, no self-join.
    Distances use the exact left-to-right fold (`aggregate`/`zip_with`),
    so an index-order `list_sum` oracle reproduces them bit-for-bit.
    ``vec_col`` must already be array<double> (see `_prep`/`as_double`)."""
    return df.select(
        F.col(id_col), _assign_struct(vec_col, seeds).alias("__a")
    ).select(
        id_col,
        F.col("__a.cluster").alias("cluster"),
        F.col("__a.d2").alias("d2"),
    )


def _assign_struct(vec_col: str, seeds: dict[int, list[float]]) -> Column:
    """The argmin struct (d2, cluster) against literal centroids — shared
    by `kmeans_assign` and `kmeans_iterate`'s inline update path.
    NOTE (measured, round 6): an explicit 64-term left-associated sum
    chain per centroid (the "codegen-able" phrasing) is 3× SLOWER than
    this aggregate(zip_with) fold at k=8, dim=64 — the k×dim expression
    forest defeats whole-stage codegen and loses to the specialized HOF
    interpreter. Keep the fold; it is also the exact index-order contract
    the SQL oracles mirror."""
    if not seeds:
        raise ValueError(
            "kmeans_assign: empty seed set — a zero-element array literal "
            "would fail downstream with an opaque analysis error"
        )
    return F.array_min(
        F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            F.col(vec_col),
                            F.array(*[F.lit(float(x)) for x in seeds[k]]),
                            lambda x, y: (x - y) * (x - y),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("d2"),
                    F.lit(int(k)).alias("cluster"),
                )
                for k in sorted(seeds)
            ]
        )
    )


def kmeans_iterate(
    df: DataFrame,
    k: int,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Full Lloyd's k-means over an embedding column: ``n_iter`` rounds of
    assign (`kmeans_assign`) + centroid recompute, returning the final
    (id, cluster, d2) assignment. BIT-deterministic end-to-end: seeds are
    the first k vectors by id, ties break to the smaller centroid id,
    iteration count is fixed, and the centroid update accumulates the
    coordinates QUANTIZED to 1e-6 (``sum(floor(x*1e6))`` as exact int64 —
    integer addition is order-independent, so the resulting centroids are
    identical no matter how partitions fold, where a plain `F.avg` over
    doubles drifts in the low bits with partial-aggregation order). The
    ≤1e-6 per-coordinate perturbation is orders of magnitude below
    embedding noise; what it buys is a trainer whose every round an
    independent engine (q145's unrolled SQL oracle) reproduces exactly.

    Scale shape per round: the assign step is map-only (centroids ride
    along as literals — the broadcast step of every distributed k-means);
    the update step is ONE partial-agg shuffle keyed on (cluster, dim)
    after a posexplode, so shuffled rows ≈ corpus_rows × dim collapsing
    to k × dim aggregates, and only those k·dim means (bounded) return to
    the driver to become the next round's literals. Nothing else is ever
    collected. This is the same index-build loop IVF coarse quantizers
    train with (`ivf_topk` uses a single fixed-seed assignment; pass its
    corpus through here first to tighten the partitions)."""
    prep = _prep(df, id_col, vec_col, "id", "v")
    seed_rows = prep.orderBy("id").limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(
            f"kmeans_iterate: corpus has {len(seed_rows)} vectors, need k={k}"
        )
    cents: dict[int, list[float]] = {
        i: list(r["v"]) for i, r in enumerate(seed_rows)
    }
    assigned = None
    rounds = max(1, n_iter)
    for it in range(rounds):
        assigned = kmeans_assign(
            prep.select("id", F.col("v")), cents, id_col="id", vec_col="v"
        )
        if it == rounds - 1:
            # the returned assignment is against the CURRENT centroids —
            # a final update would be computed and thrown away (its
            # centroids feed no further assign), so skip the whole
            # shuffle+collect on the last round
            break
        # centroid update: the assignment rides INLINE with the vector
        # (same map-only argmin, no join back to prep — a per-round
        # shuffle join removed, measured ~25% of trainer wall), then one
        # (cluster, dim) partial-agg shuffle; k×dim (sum, count) pairs
        # come back to the driver (bounded) for the next round. The sum
        # is over floor(x*1e6) as int64 — exact, so the mean below is the
        # same doubles regardless of partitioning.
        means = (
            prep.select(_assign_struct("v", cents).alias("__a"), "v")
            .select(
                F.col("__a.cluster").alias("cluster"),
                F.posexplode("v").alias("dim", "x"),
            )
            .groupBy("cluster", "dim")
            .agg(
                F.sum(F.floor(F.col("x") * F.lit(1e6))).alias("s6"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        new_cents: dict[int, list[float]] = {}
        for r in means:
            new_cents.setdefault(r["cluster"], [0.0] * len(cents[0]))[
                r["dim"]
            ] = (r["s6"] / 1e6) / r["n"]
        # a cluster that lost every member keeps its previous centroid
        # (the standard empty-cluster rule; dropping it would renumber)
        for i, prev in cents.items():
            new_cents.setdefault(i, prev)
        cents = new_cents
    return assigned.select(
        F.col("id").alias(id_col), "cluster", "d2"
    )


def _seq_cos(a, b) -> float:
    """Cosine with EVERY term accumulated left-to-right — dot and both
    norms — matching a scalar-fold engine bit-for-bit. The boundary
    recompute for BLAS kernels: pairwise summation can differ from a
    sequential fold by ~1 ulp, which flips >= threshold decisions."""
    acc = na = nb = 0.0
    for x, y in zip(a, b):
        x, y = float(x), float(y)
        acc += x * y
        na += x * x
        nb += y * y
    return acc / (math.sqrt(na) * math.sqrt(nb))


def semdedup_prune(
    corpus: DataFrame,
    seeds: dict[int, list[float]],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, arXiv
    2303.09540): cluster the embedding corpus with a fixed coarse
    quantizer, then prune — within each cluster only — every vector that
    has a near-duplicate neighbor (cosine >= ``threshold``) earlier in id
    order. Returns one row per PRUNED vector: (id, cluster,
    n_suppressors, keeper_id), where keeper_id is the smallest-id
    suppressor — the representative a dataset builder keeps. Survivors
    are the anti-join of the corpus against this frame.

    The point of the cluster fence is the scale contract: candidate pairs
    are O(Σ cluster_size²), never corpus², and each cluster's pairwise
    pass is one executor-local BLAS matmul (`applyInPandas` per cluster).
    At 100 TB, k grows so clusters stay executor-sized (SemDeDup's own
    regime: k in the tens of thousands), and oversized clusters shard
    into sub-blocks — the deliberate trade that cross-cluster near-dups
    go unseen, which is the published algorithm's semantics, not a
    shortcut.

    Determinism contract (what lets q153's SQL oracle reproduce this
    bit-for-bit): assignment uses the exact JVM-side squared-L2 fold of
    `kmeans_assign` (ties to the smaller centroid id); the in-cluster
    cosine compare recomputes any BLAS entry within 1e-9 of the
    threshold with the fully sequential `_seq_cos`; suppressor order is
    id order; zero-norm vectors are excluded up front (no defined
    cosine). 'Earlier id suppresses' deliberately counts suppressors
    that were themselves pruned — the screen is a per-vector predicate,
    not a transitive closure (that variant is `neardup_clusters`'s
    connected-components job)."""
    import numpy as np
    import pandas as pd

    prep = _prep(corpus, id_col, vec_col, "id", "v").where(
        dot(F.col("v"), F.col("v")) > 0
    )
    assigned = prep.select(
        "id", "v", _assign_struct("v", seeds).alias("__a")
    ).select("id", "v", F.col("__a.cluster").alias("cluster"))

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"vec_id": [], "cluster": [], "n_suppressors": [], "keeper_id": []}
        ).astype(
            {"vec_id": "int64", "cluster": "int32",
             "n_suppressors": "int64", "keeper_id": "int64"}
        )
        if len(pdf) < 2:
            return empty
        pdf = pdf.sort_values("id")
        ids = pdf["id"].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf["v"]), dtype=np.float64)
        nrm = np.sqrt((mat * mat).sum(axis=1))
        sims = (mat @ mat.T) / np.outer(nrm, nrm)
        for i, j in zip(*np.where(np.abs(sims - threshold) < 1e-9)):
            if i != j:
                sims[i, j] = _seq_cos(mat[i], mat[j])
        sup = np.tril(sims >= threshold, k=-1)  # row j, col i<j (id-sorted)
        nsup = sup.sum(axis=1)
        hit = nsup > 0
        if not hit.any():
            return empty
        return pd.DataFrame(
            {
                "vec_id": ids[hit],
                "cluster": np.full(hit.sum(), pdf["cluster"].iloc[0], np.int32),
                "n_suppressors": nsup[hit].astype(np.int64),
                # first True column = smallest suppressor id (ids sorted)
                "keeper_id": ids[np.argmax(sup[hit], axis=1)],
            }
        )

    return assigned.groupBy("cluster").applyInPandas(
        prune,
        "vec_id bigint, cluster int, n_suppressors bigint, keeper_id bigint",
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — memory-compressed ANN
# ---------------------------------------------------------------------------

def pq_codebooks(
    dim: int, m: int, k: int, seed: int = 13
) -> list[list[list[float]]]:
    """``m`` sub-codebooks of ``k`` codewords over ``dim/m``-dimensional
    subspaces, from the module's fixed LCG (no RNG state — reproducible
    anywhere, interpolatable into a SQL oracle). Random codebooks are the
    certification fixture; `pq_train` refines them on data."""
    if dim % m:
        raise ValueError(f"pq: m={m} must divide dim={dim}")
    sub = dim // m
    books, state = [], seed
    for _ in range(m):
        words = []
        for _ in range(k):
            row = []
            for _ in range(sub):
                state = (state * 1_103_515_245 + 12_345) % 2_147_483_647
                row.append((state / 2_147_483_647.0) * 2.0 - 1.0)
            words.append(row)
        books.append(words)
    return books


def _pq_code_struct(vec_col: str, words: list[list[float]], off: int) -> "F.Column":
    """Argmin (d2, code) of one subspace slice against its codewords —
    the same exact left-to-right fold + struct-min tie rule as
    `_assign_struct` (ties to the smaller code), so index-order SQL
    reproduces every code bit-for-bit."""
    sub = len(words[0])
    return F.array_min(
        F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            F.slice(F.col(vec_col), off + 1, sub),
                            F.array(*[F.lit(float(x)) for x in w]),
                            lambda x, y: (x - y) * (x - y),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("d2"),
                    F.lit(int(ci)).alias("code"),
                )
                for ci, w in enumerate(words)
            ]
        )
    )["code"]


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector to ``m`` small integer codes — one argmin per
    subspace against broadcast codeword literals. Map-only: no shuffle,
    no UDF; each row costs m×k fold evaluations and shrinks from
    dim×4 bytes (float) to m bytes at k<=256 — the 32× compression
    (dim=64, m=8) that lets a 100 TB embedding corpus's search structure
    live in memory. Output: (id, codes array<int>)."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    return _prep(df, id_col, vec_col, id_col, "__v").select(
        id_col,
        F.array(
            *[_pq_code_struct("__v", codebooks[s], s * sub) for s in range(m)]
        ).alias("codes"),
    )


def pq_adc_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 4096,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: for each query the
    per-subspace distance table d[s][c] = ||q_s - codeword_c||² is
    computed ONCE driver-side (m×k doubles per query — the classic ADC
    trick) and shipped into the plan as literals; each corpus row's
    approximate distance is then m table lookups + an m-term fold —
    never a dim-length dot product, and never a decode of the original
    vector. One map-side pass over the codes + one window top-k shuffle
    on query_id; the original embedding column is NOT read at all, which
    is the whole point: at 100 TB the scan is m bytes/vector, 32× less
    I/O and memory than the raw corpus. Exact re-ranking of the returned
    candidates (via `cosine_topk` on the id list) is the standard
    second stage when recall matters.

    Distance-table doubles use the sequential left-to-right Python fold,
    the in-plan fold is `aggregate` over subspace order, and ties break
    (d2, cand_id) — all index-order contracts a SQL oracle reproduces
    bit-for-bit. Query side is driver-collected under ``max_queries``
    (same bounded-return rule as the LSH query side)."""
    m, kw = len(codebooks), len(codebooks[0])
    sub = len(codebooks[0][0])
    qrows = (
        _prep(queries, id_col, vec_col, "query_id", "__q")
        .limit(max_queries + 1)
        .collect()
    )
    if len(qrows) > max_queries:
        raise ValueError(
            f"pq_adc_topk: query side exceeds max_queries={max_queries}; "
            "ADC ships one m*k literal table per query into the plan — "
            "batch large query sets"
        )
    structs = []
    for r in qrows:
        qv = [float(x) for x in r["__q"]]
        table = []
        for s in range(m):
            row = []
            for w in codebooks[s]:
                d = 0.0
                for i in range(sub):
                    diff = qv[s * sub + i] - w[i]
                    d += diff * diff
                row.append(d)
            table.append(row)
        dt = F.array(
            *[F.array(*[F.lit(d) for d in row]) for row in table]
        )
        dist = F.aggregate(
            F.sequence(F.lit(1), F.lit(m)),
            F.lit(0.0),
            lambda acc, s: acc
            + F.element_at(
                F.element_at(dt, s),
                F.element_at(F.col("codes"), s) + F.lit(1),
            ),
        )
        structs.append(
            F.struct(
                F.lit(int(r["query_id"])).alias("query_id"), dist.alias("d2")
            )
        )
    scored = (
        corpus_codes.withColumnRenamed(id_col, "cand_id")
        .select("cand_id", F.explode(F.array(*structs)).alias("__s"))
        .select("cand_id", "__s.query_id", "__s.d2")
        .where(F.col("cand_id") != F.col("query_id"))
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("d2").asc(), F.col("cand_id")],
        k,
        keep_rank=True,
    ).withColumnRenamed("rn", "rank").select("query_id", "cand_id", "rank", "d2")


def pq_train(
    df: DataFrame,
    dim: int,
    m: int,
    k: int,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
) -> list[list[list[float]]]:
    """Train the codebooks on data: an independent Lloyd's loop PER
    SUBSPACE over the sliced sub-vectors, seeded from the deterministic
    `pq_codebooks` LCG so training is bit-reproducible (same
    1e-6-quantized int64 centroid update as `kmeans_iterate` —
    order-independent across partitions). m small k-means problems over
    dim/m-dimensional points: each round per subspace is one map-only
    assign + one (cluster,dim) partial-agg shuffle, and only m×k×(dim/m)
    = k×dim doubles ever reach the driver. Returns codebooks in
    `pq_encode`'s shape; empty codewords keep their previous value (the
    standard empty-cluster rule)."""
    if dim % m:
        raise ValueError(f"pq: m={m} must divide dim={dim}")
    sub = dim // m
    init = pq_codebooks(dim, m, k, seed=seed)
    prepped = _prep(df, id_col, vec_col, id_col, "__v")
    books = []
    for s in range(m):
        sliced = prepped.select(
            F.slice(F.col("__v"), s * sub + 1, sub).alias("__v")
        )
        cents: dict[int, list[float]] = {c: list(init[s][c]) for c in range(k)}
        for _ in range(max(1, rounds)):
            means = (
                sliced.select(_assign_struct("__v", cents).alias("__a"), "__v")
                .select(
                    F.col("__a.cluster").alias("cluster"),
                    F.posexplode("__v").alias("dim", "x"),
                )
                .groupBy("cluster", "dim")
                .agg(
                    F.sum(F.floor(F.col("x") * F.lit(1e6))).alias("s6"),
                    F.count("*").alias("n"),
                )
                .collect()
            )
            new_cents: dict[int, list[float]] = {}
            for r in means:
                new_cents.setdefault(r["cluster"], [0.0] * sub)[r["dim"]] = (
                    r["s6"] / 1e6
                ) / r["n"]
            for c, prev in cents.items():
                new_cents.setdefault(c, prev)
            cents = new_cents
        books.append([cents[c] for c in range(k)])
    return books


def pq_encode_blas(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """`pq_encode` computed by vectorized numpy (`mapInPandas`) instead of
    m×k interpreted folds per row — encoding is the corpus-side hot path
    (every vector against every codeword) and the batched kernel is ~10×
    the expression evaluator at dim 64.

    CODE-identical to the JVM fold by the same boundary argument as
    `blas_hyperplane_signatures`: a code only differs if two summation
    orders disagree on which codeword is NEAREST, which requires the
    top-2 distances within float-sum noise — any subspace whose top-2
    gap is < 1e-9 is recomputed with the exact sequential fold and
    re-argmin'd under the (d2, code) tie rule. Units pin blas ≡ jvm on
    adversarial tie data; q157 runs this path against the fold-order SQL
    oracle."""
    import numpy as np
    import pandas as pd

    m = len(codebooks)
    sub = len(codebooks[0][0])
    books = [np.array(w, dtype=np.float64) for w in codebooks]  # m × k × sub

    def compute(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            n = len(pdf)
            codes = np.empty((n, m), dtype=np.int32)
            for s in range(m):
                x = mat[:, s * sub:(s + 1) * sub]  # n × sub
                W = books[s]  # k × sub
                d2 = ((x[:, None, :] - W[None, :, :]) ** 2).sum(-1)  # n × k
                part = np.partition(d2, 1, axis=1)
                codes[:, s] = np.argmin(d2, axis=1)
                for r in np.where(part[:, 1] - part[:, 0] < 1e-9)[0]:
                    best = None
                    for ci in range(len(W)):
                        acc = 0.0
                        for i in range(sub):
                            diff = float(x[r, i]) - float(W[ci, i])
                            acc += diff * diff
                        if best is None or acc < best[0]:
                            best = (acc, ci)
                    codes[r, s] = best[1]
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    prepped = _prep(df, id_col, vec_col, id_col, vec_col)
    return prepped.mapInPandas(compute, f"{id_col} bigint, codes array<int>")


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    codebooks: list[list[list[float]]],
    k: int,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 4096,
    corpus_codes: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ — the production ANN composition (the FAISS IVFPQ shape):
    the IVF coarse quantizer fences the search to each query's ``nprobe``
    nearest cells (cosine assignment, `ivf_topk`'s contract), and WITHIN
    the probed cells candidates rank by PQ asymmetric distance over the
    m-byte codes (`pq_adc_topk`'s contract) — the raw embedding column is
    never read on the scoring path. At 100 TB this is the whole economics
    of ANN serving: the cell fence cuts the scanned fraction to
    ~nprobe/n_cells, and the PQ codes cut the bytes per scanned row 32×;
    both levers compose multiplicatively.

    Plan shape: one broadcast centroid assign per side (map-only), the
    bounded (query, cell) probe list broadcast against the coded corpus
    (candidates filtered BEFORE any distance math), then the ADC fold
    evaluated only on survivors via a per-query distance-table map
    literal; one window top-k on query_id finishes. All folds are the
    sequential index-order contracts the SQL oracle reproduces
    bit-for-bit; ties break (d2, cand_id).

    ``corpus_codes`` (a (id, codes) frame, e.g. the q164 persisted
    manifest index) skips the internal encode — the production path: at
    100 TB the raw corpus is scanned once for the centroid assign and
    the codes come from the index, instead of paying a second full
    encode scan per query batch."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    cent = F.broadcast(
        centroids.select("cid", as_double(F.col("centroid")).alias("cv0"))
    )

    def assign(df: DataFrame, idc: str, vecc: str, n: int) -> DataFrame:
        scored = df.join(cent).select(
            idc, vecc, "cid", cosine(F.col(vecc), F.col("cv0")).alias("csim")
        )
        return top_k_per_group(
            scored, [idc], [F.col("csim").desc(), F.col("cid")], n
        ).drop("csim")

    # corpus-side top-1 assignment: map-only literal-centroid argmin —
    # the window/join form (corpus × centroids BNLJ + top-1 exchange)
    # cost one full-corpus shuffle per run for a result every row can
    # compute locally (r14, guide §2.4); csim arithmetic is unchanged
    pick = nearest_cell("cv", collect_centroids(centroids))
    cells = _prep(corpus, id_col, vec_col, "cand_id", "cv").select(
        "cand_id", pick["cid"].alias("cid")
    )
    if corpus_codes is None:
        corpus_codes = pq_encode_blas(
            corpus, codebooks, id_col=id_col, vec_col=vec_col
        )
    codes = corpus_codes.withColumnRenamed(id_col, "cand_id")
    indexed = codes.join(cells, "cand_id")

    qp = _prep(queries, id_col, vec_col, "query_id", "__q")
    qrows = qp.limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"ivf_pq_topk: query side exceeds max_queries={max_queries}; "
            "ADC ships one m*k literal table per query into the plan — "
            "batch large query sets"
        )
    probe_rows = [
        (int(r["query_id"]), int(r["cid"]))
        for r in assign(qp, "query_id", "__q", nprobe)
        .select("query_id", "cid").collect()
    ]
    spark = queries.sparkSession

    # per-query ADC distance tables (the same sequential-fold build as
    # pq_adc_topk), shipped as a COLUMN of the broadcast probe frame —
    # data, not plan literals (the ivf_pq_residual_topk discipline: a
    # literal map of m×k doubles per query bloats the expression tree
    # and every per-row fold step re-resolved the map by query_id;
    # values are the identical doubles either way)
    tables: dict[int, list[list[float]]] = {}
    for r in qrows:
        qv = [float(x) for x in r["__q"]]
        table = []
        for s in range(m):
            row = []
            for w in codebooks[s]:
                d = 0.0
                for i in range(sub):
                    diff = qv[s * sub + i] - w[i]
                    d += diff * diff
                row.append(d)
            table.append(row)
        tables[int(r["query_id"])] = table
    probe_df = spark.createDataFrame(
        [(qid, cid, tables[qid]) for qid, cid in probe_rows],
        "query_id bigint, cid bigint, __qt array<array<double>>",
    )

    cand = indexed.join(F.broadcast(probe_df), "cid").where(
        F.col("cand_id") != F.col("query_id")
    )
    dist = F.aggregate(
        F.sequence(F.lit(1), F.lit(m)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(F.col("__qt"), s),
            F.element_at(F.col("codes"), s) + F.lit(1),
        ),
    )
    scored = cand.select("query_id", "cand_id", dist.alias("d2"))
    return top_k_per_group(
        scored, ["query_id"], [F.col("d2").asc(), F.col("cand_id")], k,
        keep_rank=True,
    ).withColumnRenamed("rn", "rank").select("query_id", "cand_id", "rank", "d2")


def ivf_residuals(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cid, residual) for each vector: assign to the nearest centroid
    by cosine (ties to the smaller cid — `ivf_topk`'s contract) and
    subtract that centroid element-wise. The residual is what FAISS-style
    IVF-PQ quantizes: residual norms are much smaller than raw-vector
    norms, so a fixed codebook budget spends its resolution near zero
    error instead of spanning the whole embedding space — the difference
    between the ~5% recall of raw-vector random-codebook IVFPQ and a
    production index. Map-only after the broadcast centroid join; the
    subtraction is a JVM zip_with, bit-identical to an e[i] - ce[i] SQL
    replay."""
    cent = F.broadcast(
        centroids.select(
            "cid", as_double(F.col("centroid")).alias("__cv")
        )
    )
    prepped = _prep(df, id_col, vec_col, id_col, "__v")
    scored = prepped.join(cent).select(
        id_col, "__v", "cid", "__cv",
        cosine(F.col("__v"), F.col("__cv")).alias("__csim"),
    )
    nearest = top_k_per_group(
        scored, [id_col], [F.col("__csim").desc(), F.col("cid")], 1
    )
    return nearest.select(
        id_col,
        "cid",
        F.zip_with(F.col("__v"), F.col("__cv"), lambda x, y: x - y).alias(
            "residual"
        ),
    )


def ivf_pq_residual_topk(
    queries: DataFrame,
    centroids: DataFrame,
    codebooks: list[list[list[float]]],
    corpus_codes: DataFrame,
    k: int,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 4096,
) -> DataFrame:
    """RESIDUAL IVF-PQ serving — the FAISS-proper form `ivf_pq_topk`'s
    raw-vector composition approximates: corpus vectors are stored as
    PQ codes of their RESIDUAL (x − centroid of their cell), encoded
    against codebooks trained on residuals (`pq_train` over
    `ivf_residuals`), and queries score candidates with per-CELL
    asymmetric distance tables built from the query's own residual
    against that cell's centroid: d2 ≈ ||(q − c) − decode(codes)||².

    ``corpus_codes`` is REQUIRED and is the persisted index — an
    (id, cid, codes) frame, e.g. a manifest codes table maintained by
    ingestion. The serving path reads ONLY the index: the raw corpus is
    never scanned (the cell fence comes from the index's cid column),
    which is the production shape — at 100 TB the query-time I/O is
    m bytes/candidate in nprobe/n_cells of the corpus, nothing else.

    Plan shape: one bounded query collect (≤ ``max_queries``), one
    driver-side centroid collect (n_cells × dim — the coarse quantizer
    is small by construction), per-(query, cell) ADC tables shipped as
    a COLUMN of the broadcast probe frame (data, not plan literals —
    a k=256 codebook at nprobe=8 would otherwise put ~0.5M literal
    doubles into the expression tree, and plan preparation cost scales
    with tree size; the broadcast is |probes|·m·k doubles of DATA,
    identical values, tiny plan), so candidates fence BEFORE distance
    math, then one window top-k on query_id. Distance folds are the
    sequential index-order contracts the SQL oracle replays bit-for-bit;
    ties break (d2, cand_id)."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    cent = F.broadcast(
        centroids.select("cid", as_double(F.col("centroid")).alias("__cv"))
    )
    cent_rows = {
        int(r["cid"]): [float(x) for x in r["__cv"]]
        for r in cent.collect()
    }

    qp = _prep(queries, id_col, vec_col, "query_id", "__q")
    qrows = qp.limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"ivf_pq_residual_topk: query side exceeds max_queries="
            f"{max_queries}; ADC ships one m*k literal table per "
            "(query, probed cell) into the plan — batch large query sets"
        )
    qvecs = {int(r["query_id"]): [float(x) for x in r["__q"]] for r in qrows}

    scored_cells = qp.join(cent).select(
        "query_id", "cid", cosine(F.col("__q"), F.col("__cv")).alias("__csim")
    )
    probe_rows = [
        (int(r["query_id"]), int(r["cid"]))
        for r in top_k_per_group(
            scored_cells, ["query_id"], [F.col("__csim").desc(), F.col("cid")],
            nprobe,
        ).select("query_id", "cid").collect()
    ]

    # per-(query, cell) ADC tables: the query residual against THAT
    # cell's centroid, folded against the residual-trained codewords —
    # sequential left-to-right sums, the exact order the oracle's
    # list_sum(list_transform(...)) replays. The tables ride the probe
    # frame as DATA (see docstring), never as plan literals.
    probe_tbl_rows = []
    for qid, cid in probe_rows:
        qv, cv = qvecs[qid], cent_rows[cid]
        qres = [qv[i] - cv[i] for i in range(len(qv))]
        table = []
        for s in range(m):
            row = []
            for w in codebooks[s]:
                d = 0.0
                for i in range(sub):
                    diff = qres[s * sub + i] - w[i]
                    d += diff * diff
                row.append(d)
            table.append(row)
        probe_tbl_rows.append((qid, cid, table))

    spark = queries.sparkSession
    probe_df = spark.createDataFrame(
        probe_tbl_rows,
        "query_id bigint, cid bigint, __tbl array<array<double>>",
    )
    cand = (
        corpus_codes.withColumnRenamed(id_col, "cand_id")
        .join(F.broadcast(probe_df), "cid")
        .where(F.col("cand_id") != F.col("query_id"))
    )
    dist = F.aggregate(
        F.sequence(F.lit(1), F.lit(m)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(F.col("__tbl"), s),
            F.element_at(F.col("codes"), s) + F.lit(1),
        ),
    )
    scored = cand.select("query_id", "cand_id", dist.alias("d2"))
    return top_k_per_group(
        scored, ["query_id"], [F.col("d2").asc(), F.col("cand_id")], k,
        keep_rank=True,
    ).withColumnRenamed("rn", "rank").select(
        "query_id", "cand_id", "rank", "d2"
    )


def ivf_pq_residual_rerank_topk(
    queries: DataFrame,
    centroids: DataFrame,
    codebooks: list[list[list[float]]],
    corpus_codes: DataFrame,
    corpus: DataFrame,
    k: int,
    nprobe: int = 2,
    overfetch: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 4096,
) -> DataFrame:
    """The production residual-IVF-PQ recipe (FAISS IndexIVFPQ +
    refine): compressed-domain candidate generation through the
    persisted residual index (`ivf_pq_residual_topk`, k·overfetch
    candidates per query — the raw corpus is never scanned in stage 1),
    then EXACT cosine re-ranking of only the |Q|·k·overfetch candidate
    rows (the q19 sequential-fold contract, bit-reproducible by a SQL
    engine). This is the recall-recovery stage the clustered-corpus
    sweep shows compressed-domain ADC needs: quantization error caps
    ADC recall, but a small exact rerank over an overfetched candidate
    set restores it while still paying raw-embedding I/O for only the
    candidates — at 100 TB the asymmetry between m bytes/vector for the
    fence+ADC pass and dim doubles/vector for |candidates| rows is the
    whole economics.

    Plan shape: stage 1's bounded top-(k·overfetch) is broadcast back
    against the corpus (ONE corpus scan fenced to candidate ids, no
    corpus shuffle), joined to the broadcast query side, one window
    top-k on query_id. Ties break (cos desc, cand_id)."""
    cand = ivf_pq_residual_topk(
        queries, centroids, codebooks, corpus_codes, k * overfetch,
        nprobe=nprobe, id_col=id_col, vec_col=vec_col,
        max_queries=max_queries,
    ).select("query_id", "cand_id")
    c = _prep(corpus, id_col, vec_col, "cand_id", "cv")
    q = F.broadcast(_prep(queries, id_col, vec_col, "query_id", "qv"))
    scored = (
        c.join(F.broadcast(cand), "cand_id")
        .join(q, "query_id")
        .select(
            "query_id", "cand_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos"),
        )
    )
    return top_k_per_group(
        scored, ["query_id"], [F.col("cos").desc(), F.col("cand_id")], k,
        keep_rank=True,
    ).withColumnRenamed("rn", "rank").select(
        "query_id", "cand_id", "rank", "cos"
    )


def sq8_calibrate(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[float], list[float]]:
    """Per-dimension [lo, hi] over the corpus — the SQ8 training step
    (FAISS ScalarQuantizer's rangestat): ONE aggregate pass producing
    2·dim scalars (driver-bounded), no shuffle beyond the agg."""
    prepped = _prep(df, id_col, vec_col, id_col, "__v")
    aggs = []
    for i in range(dim):
        aggs += [F.min(F.col("__v")[i]), F.max(F.col("__v")[i])]
    row = prepped.agg(*aggs).collect()[0]
    los = [float(row[2 * i]) for i in range(dim)]
    his = [float(row[2 * i + 1]) for i in range(dim)]
    return los, his


def sq8_encode(
    df: DataFrame,
    los: list[float],
    his: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Int8-per-dimension scalar quantization (FAISS SQ8): code_i =
    clamp(floor((x_i − lo_i) / (hi_i − lo_i) · 255 + 0.5), 0, 255) — 4×
    compression at dim-independent recall cost, the simpler sibling of
    PQ (no codebook; per-dim linear grid). floor(x + 0.5) instead of
    round() so both engines snap identically (no round-half tie rules).
    Map-only, no UDF; output (id, codes array<int>)."""
    dim = len(los)
    lo_lit = F.array(*[F.lit(x) for x in los])
    # guard zero spans JVM-side (ANSI mode aborts on div-by-zero); a
    # zero-span dim encodes 0 and reconstructs lo exactly
    span_lit = F.array(
        *[F.lit((his[i] - los[i]) if his[i] > los[i] else 1.0)
          for i in range(dim)]
    )
    prepped = _prep(df, id_col, vec_col, id_col, "__v")
    codes = F.transform(
        F.col("__v"),
        lambda x, i: F.least(
            F.lit(255),
            F.greatest(
                F.lit(0),
                F.floor(
                    (x - F.element_at(lo_lit, i + 1))
                    / F.element_at(span_lit, i + 1)
                    * 255
                    + F.lit(0.5)
                ),
            ),
        ).cast("int"),
    )
    return prepped.select(id_col, codes.alias("codes"))


def sq8_adc_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    los: list[float],
    his: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 4096,
) -> DataFrame:
    """Asymmetric top-k over SQ8 codes: each candidate reconstructs as
    lo_i + code_i · span_i/255 and scores against the RAW query vector —
    the compressed column is the only corpus data read (4× less I/O than
    float32). The reconstruction arithmetic is mirrored term-for-term by
    the SQL oracle (q_i − (lo_i + code_i · s255_i), index-order folds),
    so distances are bit-identical. Ties break (d2, cand_id); query side
    driver-collected under ``max_queries`` like every ADC path."""
    dim = len(los)
    lo_lit = F.array(*[F.lit(x) for x in los])
    s255 = [(his[i] - los[i]) / 255 for i in range(dim)]
    s255_lit = F.array(*[F.lit(x) for x in s255])
    qrows = (
        _prep(queries, id_col, vec_col, "query_id", "__q")
        .limit(max_queries + 1)
        .collect()
    )
    if len(qrows) > max_queries:
        raise ValueError(
            f"sq8_adc_topk: query side exceeds max_queries={max_queries}; "
            "batch large query sets"
        )
    # the reconstruction lo_i + code_i·s255_i is QUERY-INDEPENDENT: bind
    # it ONCE per candidate row as a lambda variable (the bbox_filter
    # bind-once trick — Catalyst substitution cannot re-inline through a
    # lambda), so each of the |queries| per-query folds reads the shared
    # recon array instead of re-deriving it term by term — per-term work
    # in the hot fold roughly halves, values bit-identical (the fold
    # still computes pow(q_i − (lo_i + code_i·s255_i), 2) with the same
    # operand tree and left-to-right accumulation). r14, guide §2.3
    # (don't recompute what you can share) applied inside one row.
    recon = F.transform(
        F.col("codes"),
        lambda c, i: F.element_at(lo_lit, i + 1)
        + c * F.element_at(s255_lit, i + 1),
    )

    def _dist_structs(r_var):
        structs = []
        for r in qrows:
            q_lit = F.array(*[F.lit(float(x)) for x in r["__q"]])
            dist = F.aggregate(
                F.sequence(F.lit(1), F.lit(dim)),
                F.lit(0.0),
                lambda acc, i: acc
                + F.pow(
                    F.element_at(q_lit, i) - F.element_at(r_var, i),
                    F.lit(2),
                ),
            )
            structs.append(
                F.struct(
                    F.lit(int(r["query_id"])).alias("query_id"),
                    dist.alias("d2"),
                )
            )
        return F.array(*structs)

    per_query = F.element_at(
        F.transform(F.array(recon), _dist_structs), 1
    )
    scored = (
        corpus_codes.withColumnRenamed(id_col, "cand_id")
        .select("cand_id", F.explode(per_query).alias("__s"))
        .select("cand_id", "__s.query_id", "__s.d2")
        .where(F.col("cand_id") != F.col("query_id"))
    )
    return top_k_per_group(
        scored, ["query_id"], [F.col("d2").asc(), F.col("cand_id")], k,
        keep_rank=True,
    ).withColumnRenamed("rn", "rank").select("query_id", "cand_id", "rank", "d2")


def pq_encode_delta(
    delta: DataFrame,
    index_codes: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_blas: bool = True,
) -> DataFrame:
    """Encode ONLY the batch rows absent from a stored codes index — the
    incremental maintenance path for a PERSISTED PQ index (the q132
    incremental-dedup analog for ANN): at 100 TB the codes ARE the index
    and live in a manifest table; each ingested batch anti-joins the
    index on id and pays the encode kernel for genuinely new vectors
    only. Returns just the FRESH codes (same shape as `pq_encode`), ready
    to `append_batch` into the index table — re-encoding nothing, so an
    idempotent-writer append keeps the index exactly-once under replays.
    The anti-join broadcasts nothing by itself: both sides shuffle on id
    (or co-locate if the index table is bucketed by id), and the encode
    is map-only after the join — no step is corpus-quadratic."""
    fresh = delta.join(
        index_codes.select(id_col), on=id_col, how="left_anti"
    )
    enc = pq_encode_blas if use_blas else pq_encode
    return enc(fresh, codebooks, id_col=id_col, vec_col=vec_col)


def pq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int,
    overfetch: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 4096,
) -> DataFrame:
    """The production PQ recipe: ADC candidate generation + EXACT cosine
    rerank (the recall-recovery stage BENCH.md's sweep recommends
    whenever compressed-domain recall alone isn't enough). Stage 1 ranks
    the whole corpus in the compressed domain (`pq_adc_topk`,
    k·overfetch candidates per query — m byte-lookups per vector, raw
    embeddings never scanned); stage 2 re-scores ONLY the |Q|·k·overfetch
    candidate rows with the sequential JVM cosine fold (the q19
    contract), so the final ranking is exact over the candidate set and
    bit-reproducible by a scalar-fold SQL engine.

    Plan shape: the candidate list is bounded and BROADCAST back against
    the corpus (one corpus scan, no corpus shuffle), then against the
    broadcast query side; one window top-k on query_id finishes. At
    100 TB the raw-embedding scan cost is paid only for the candidate
    rows — the 32× I/O asymmetry between stage 1 and a brute-force pass
    is the whole point."""
    codes = pq_encode_blas(corpus, codebooks, id_col=id_col, vec_col=vec_col)
    cand = pq_adc_topk(
        codes, queries, codebooks, k * overfetch,
        id_col=id_col, vec_col=vec_col, max_queries=max_queries,
    ).select("query_id", "cand_id")
    c = _prep(corpus, id_col, vec_col, "cand_id", "cv")
    q = F.broadcast(_prep(queries, id_col, vec_col, "query_id", "qv"))
    scored = (
        c.join(F.broadcast(cand), "cand_id")
        .join(q, "query_id")
        .select(
            "query_id", "cand_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos"),
        )
    )
    return top_k_per_group(
        scored, ["query_id"], [F.col("cos").desc(), F.col("cand_id")], k,
        keep_rank=True,
    ).withColumnRenamed("rn", "rank").select(
        "query_id", "cand_id", "rank", "cos"
    )
