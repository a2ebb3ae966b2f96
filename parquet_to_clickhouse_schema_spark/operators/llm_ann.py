"""ANN / similarity-search operators: brute-force cosine top-k (the
labeled O(n^2) baseline), LSH random-hyperplane banding, IVF coarse
quantization, PQ/IVF-PQ asymmetric-distance search — each with an
md5-derived deterministic "verified" twin whose DuckDB oracle rebuilds the
whole mechanism — plus the recall evaluation harness.

Split out of operators/llm.py in r18 (VERDICT r17 task #5) — a mechanical
move, no behavior change. Signatures/buckets/probed lists shuffle as
equi-join keys; codebook training is bounded k x dim driver state
(Lloyd's pattern), the one legitimate collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark._registry import new_registry
from parquet_to_clickhouse_schema_spark.functions.compat import qround, sql_qround
from parquet_to_clickhouse_schema_spark.sources.io import load_table

QUERIES, ORACLES, _q = new_registry()

from parquet_to_clickhouse_schema_spark.operators.llm_dedup import (
    _block_sides,
    _embeddings_rowcount,
    _empty_pairs,
    _partial_topk,
    _unit_rows,
)


def _as_double_vec(df: DataFrame, col: str = "embedding") -> DataFrame:
    """float32 → double + precomputed L2 norm (shared by both ANN paths).

    The repartition is a materialization barrier (see minhash_signatures):
    without it the norm's aggregate expression collapses into the projection
    above the pair join and is recomputed for every PAIR instead of every
    row — at n² pairs that triples the per-pair work."""
    vec = F.transform(F.col(col), lambda x: x.cast("double"))
    return df.select(
        "vec_id",
        vec.alias("vec"),
        F.sqrt(F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)).alias("norm"),
    ).repartition("vec_id")


_COSINE_ORACLE = """
    WITH ex AS (
      SELECT vec_id,
             unnest(range(1, len(embedding) + 1)) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    norms AS (
      SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM ex GROUP BY vec_id
    ),
    dots AS (
      SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id, sum(a.v * b.v) AS dot
      FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id <> b.vec_id
      GROUP BY a.vec_id, b.vec_id
    )
    SELECT vec_id, nbr_id, floor((cos_sim) * 10000.0 + 0.5) / 10000.0 AS cosine
    FROM (
      SELECT d.vec_id, d.nbr_id, d.dot / (na.nrm * nb.nrm) AS cos_sim,
             row_number() OVER (PARTITION BY d.vec_id
                                ORDER BY d.dot / (na.nrm * nb.nrm) DESC, d.nbr_id) AS rn
      FROM dots d
      JOIN norms na ON d.vec_id = na.vec_id
      JOIN norms nb ON d.nbr_id = nb.vec_id
    ) WHERE rn <= 3
"""


@_q("q_cosine_topk", _COSINE_ORACLE)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-3 neighbors per vector — the LABELED O(n²)
    brute-force BASELINE (contract-mandated; do NOT ship this at corpus
    scale — the sublinear paths are q_ann_lsh_topk / q_ivf_topk /
    q_pq_topk / q_ivfpq_topk, recall-measured by q_ann_recall_eval).
    Gated path; see cosine_topk_blocked for the tiled all-pairs plan."""
    return cosine_topk_blocked(spark, sf_dir, k=3)


def cosine_topk_blocked(
    spark: SparkSession, sf_dir: str, k: int = 3, index_block_rows: int = 1024
) -> DataFrame:
    """Exact cosine top-k as ONE distributed job: 2-D block-cogroup
    all-pairs.

    Both sides are hash-partitioned into a ceil(n / index_block_rows)² tile
    grid (see _block_sides); each (qblk, iblk) tile meets in
    groupBy(qblk, iblk).cogroup(...).applyInPandas, where one BLAS matmul
    (A @ B.T) + lexsort computes the per-tile partial top-k — the classic
    map-side combine for top-k. A final window re-ranks the partials into
    the global exact top-k, shuffling only O(n * blocks * k) small rows.

    vs the r2 formulation (collect one block to the driver → broadcast →
    mapInPandas, serially per block): no embedding transits the driver, one
    Spark job replaces n_blocks sequential ones, parallelism is the full
    tile grid instead of one task per index block, and each side is scanned
    once — the fan-out replicates rows in the shuffle write, not the scan.
    At 100 TB the executor working set stays bounded by
    2 x index_block_rows x dim doubles per tile task regardless of corpus
    size; replication is n * n_blocks rows per side, the inherent cost of
    EXACT all-pairs — raise index_block_rows as n grows, or switch to the
    approximate paths (ann_lsh_topk / ivf_topk) which prune candidates
    instead of blocking them. Tie handling matches the oracle:
    (-cos, nbr_id), rounded only after the global re-rank — per-tile
    partials carry RAW cosine so cross-tile ties resolve exactly as the
    oracle's single sort does."""
    import numpy as np
    import pandas as pd

    n = _embeddings_rowcount(spark, sf_dir)  # footer metadata, no Spark job
    n_blocks = max(1, -(-n // index_block_rows))
    fanout, indexed = _block_sides(spark, sf_dir, n_blocks, n_blocks)

    def topk_cogroup(qpdf: pd.DataFrame, ipdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0 or len(ipdf) == 0:
            return _empty_pairs("cos_raw")
        a_ids = qpdf["vec_id"].to_numpy()
        a_mat = np.stack(qpdf["embedding"].to_numpy()).astype("float64")
        a_norms = np.sqrt((a_mat * a_mat).sum(axis=1))
        b_ids = ipdf["vec_id"].to_numpy()
        b_mat = np.stack(ipdf["embedding"].to_numpy()).astype("float64")
        b_norms = np.sqrt((b_mat * b_mat).sum(axis=1))
        cos = (a_mat @ b_mat.T) / (a_norms[:, None] * b_norms[None, :])
        out_vec, out_nbr, out_cos = _partial_topk(a_ids, b_ids, cos, k)
        if not out_vec:
            return _empty_pairs("cos_raw")
        return pd.DataFrame({"vec_id": out_vec, "nbr_id": out_nbr, "cos_raw": out_cos})

    partials = (
        fanout.groupBy("qblk", "iblk")
        .cogroup(indexed.groupBy("qblk", "iblk"))
        .applyInPandas(topk_cogroup, schema="vec_id long, nbr_id long, cos_raw double")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_raw").desc(), "nbr_id")
    return (
        partials.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("vec_id", "nbr_id", qround(F.col("cos_raw"), 4).alias("cosine"))
    )


def cosine_topk_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-JVM formulation of cosine top-k (zip_with + aggregate dot
    products over a broadcast nested-loop self-join) — the semantics
    baseline the vectorized q_cosine_topk is tested against."""
    e = _as_double_vec(load_table(spark, sf_dir, "embeddings"))
    a = e.select(
        F.col("vec_id").alias("vec_id"), F.col("vec").alias("va"), F.col("norm").alias("na")
    )
    b = e.select(
        F.col("vec_id").alias("nbr_id"), F.col("vec").alias("vb"), F.col("norm").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    sims = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("vec_id") != F.col("nbr_id"))
        .select("vec_id", "nbr_id", (dot / (F.col("na") * F.col("nb"))).alias("cos_sim"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), "nbr_id")
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("vec_id", "nbr_id", qround(F.col("cos_sim"), 4).alias("cosine"))
    )


def ann_lsh_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    n_planes: int | None = None,
    n_tables: int = 16,
) -> DataFrame:
    """Scale path for similarity search: random-hyperplane (SimHash) LSH.

    Each vector gets n_tables bucket signatures (sign pattern against
    n_planes fixed-seed Gaussian hyperplanes, regenerated identically on
    every executor — no driver-side state, fully reproducible). One
    mapInPandas pass computes all signatures as BLAS matmuls + sign-bit
    packs; candidates then meet in groupBy(tbl, bucket).cogroup(...)
    .applyInPandas where one matmul ranks each bucket — the same
    join-not-crossjoin cogroup shape as ivf_topk / cosine tiles.
    At 100 TB this replaces the O(n²) cross join with a skew-resistant
    hash join whose cost follows bucket occupancy (~n/2^planes rows per
    bucket). n_planes therefore AUTO-SIZES with the corpus (footer
    rowcount, no data scan): ceil(log2(n / 256)) keeps expected occupancy
    ~256 rows — a fixed plane count silently goes quadratic as n grows
    (measured: 4 planes is fine at 6k vectors and a 225M-pair blowup at
    60k). The recall-vs-cost trade moves to n_tables, which multiplies
    independent chances to collide. Measured recall vs brute force on the
    hard case of near-orthogonal random vectors: 0.91 at the auto-chosen
    4 planes x 16 tables on the 500-vector smoke corpus. Not oracle-gated
    (approximate); tests assert recall against q_cosine_topk.
    """
    import math

    import numpy as np
    import pandas as pd

    if n_planes is None:
        n = _embeddings_rowcount(spark, sf_dir)
        n_planes = min(12, max(4, math.ceil(math.log2(max(n, 2) / 256))))
    npl, ntb = n_planes, n_tables

    # Hyperplanes are a fixed-seed Gaussian matrix REGENERATED on each
    # executor (dim read off the first batch) — nothing random at plan
    # level, nothing broadcast, identical on every worker and every run.
    # Signature computation is one BLAS matmul + sign-bit pack per batch;
    # the prior formulation (n_tables x n_planes interpreted zip_with
    # aggregates per ROW) was ~50x slower at sf0.1 for identical output
    # shape, a whole-column HOF pitfall (see docs/PLANS.md notes).
    def sig_batches(batches):
        planes = None
        weights = (1 << np.arange(npl)).astype("int64")
        for b in batches:
            if len(b) == 0:
                continue
            mat = np.stack(b["embedding"].to_numpy()).astype("float64")
            if planes is None:
                rng = np.random.RandomState(0x5EED)
                planes = rng.standard_normal((ntb, npl, mat.shape[1]))
            unit = mat / np.sqrt((mat * mat).sum(axis=1))[:, None]
            for t in range(ntb):
                bits = unit @ planes[t].T >= 0  # (rows, n_planes)
                yield pd.DataFrame(
                    {
                        "vec_id": b["vec_id"],
                        "embedding": b["embedding"],
                        "tbl": np.full(len(b), t, dtype="int32"),
                        "bucket": bits @ weights,
                    }
                )

    sig_schema = "vec_id long, embedding array<float>, tbl int, bucket long"
    # two independent loads: a self-cogroup of one DataFrame trips the
    # analyzer's self-join dedup and prunes the right side (see _block_sides)
    qside = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .mapInPandas(sig_batches, schema=sig_schema)
    )
    iside = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .mapInPandas(sig_batches, schema=sig_schema)
    )

    def rank_cogroup(qpdf: pd.DataFrame, ipdf: pd.DataFrame) -> pd.DataFrame:
        # per-(table, bucket) all-pairs: one BLAS matmul, partial top-k
        if len(qpdf) == 0 or len(ipdf) == 0:
            return _empty_pairs("cos_raw")
        a_ids, a_unit = _unit_rows(qpdf)
        b_ids, b_unit = _unit_rows(ipdf)
        out_vec, out_nbr, out_cos = _partial_topk(a_ids, b_ids, a_unit @ b_unit.T, k)
        if not out_vec:
            return _empty_pairs("cos_raw")
        return pd.DataFrame({"vec_id": out_vec, "nbr_id": out_nbr, "cos_raw": out_cos})

    cand = (
        qside.groupBy("tbl", "bucket")
        .cogroup(iside.groupBy("tbl", "bucket"))
        .applyInPandas(rank_cogroup, schema="vec_id long, nbr_id long, cos_raw double")
        # the same pair surfaces once per colliding table with an identical
        # cosine; dedup before the global re-rank
        .dropDuplicates(["vec_id", "nbr_id"])
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_raw").desc(), "nbr_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("vec_id", "nbr_id", qround(F.col("cos_raw"), 4).alias("cosine"))
    )


def _train_coarse_centroids(e: DataFrame, n_centroids: int, iters: int = 4):
    """Distributed coarse-quantizer training for the IVF family (VERDICT r5
    #3): Lloyd's over the FULL corpus via kmeans_fit instead of a
    driver-side sample — at 100 TB a bounded sample stops representing the
    corpus, and this form keeps every heavy step in executors (the only
    driver traffic is the k x dim per-iteration centroid sums). Vectors are
    unit-normalized first so kmeans_fit's Euclidean argmin coincides with
    the cosine argmax the probe/assign kernels use; the returned centroids
    are re-projected onto the unit sphere (spherical k-means). Deterministic
    end-to-end (farthest-point init over a hash-ordered sample)."""
    import numpy as np

    vecd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(vecd, F.lit(0.0), lambda a, x: a + x * x))
    ev = e.select("vec_id", F.transform(vecd, lambda x: x / norm).alias("unit"))
    cent, _ = kmeans_fit(
        ev, vec_col="unit", k=n_centroids, iters=iters, with_assignments=False
    )
    n = np.sqrt((cent * cent).sum(axis=1))[:, None]
    return cent / np.maximum(n, 1e-12)


def ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
    train_iters: int = 4,
) -> DataFrame:
    """IVF-Flat approximate nearest neighbors: the inverted-list scale path.

    Index build: the coarse quantizer is trained DISTRIBUTED end-to-end
    (_train_coarse_centroids → kmeans_fit: Lloyd's over the full corpus,
    deterministic farthest-point init); every vector is assigned to its
    nearest centroid (one small matmul). Query: each vector probes its
    n_probe nearest centroid lists and ranks only those candidates — cost
    drops from O(n²) to O(n² * n_probe / n_centroids) with recall
    controlled by n_probe (measured on the hard case of random
    near-orthogonal vectors at 16 centroids: recall 0.44/0.63/0.86 at
    n_probe 2/4/8 with Lloyd-trained centroids, up from 0.31/0.49/0.75
    under plain sampled centroids; clustered real-world embeddings do
    far better still).

    At 100 TB: centroid assignment is a broadcast matmul (centroids are
    tiny); candidate ranking is a COGROUP on centroid id — the same
    join-not-crossjoin shape as MinHash banding and hyperplane LSH, so it
    partitions and scales identically. The only driver-side collect is the
    n_centroids sample rows (TakeOrdered, bounded) — the index itself stays
    distributed: assignment and probing each run as one mapInPandas pass,
    and each (query-probe, inverted-list) pair meets in
    groupBy(cid).cogroup(...).applyInPandas where one BLAS matmul ranks the
    list. Probing shuffles n_probe copies of the query vectors — the
    standard distributed-IVF trade (bucket by cid to pre-partition it away).
    Approximate → not oracle-gated; tests assert recall vs q_cosine_topk.
    """
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    # coarse quantizer: distributed Lloyd's over the whole corpus — the
    # driver only ever sees k x dim centroid matrices, never the data
    cmat = _train_coarse_centroids(e, n_centroids, iters=train_iters)
    bc_cent = spark.sparkContext.broadcast(cmat)

    def assign_batches(batches):
        # inverted lists: each vector tagged with its nearest centroid id
        cm = bc_cent.value
        for batch in batches:
            mat = np.stack(batch["embedding"].to_numpy()).astype("float64")
            unit = mat / np.sqrt((mat * mat).sum(axis=1))[:, None]
            yield pd.DataFrame(
                {
                    "vec_id": batch["vec_id"],
                    "embedding": batch["embedding"],
                    "cid": np.argmax(unit @ cm.T, axis=1).astype("int32"),
                }
            )

    def probe_batches(batches):
        # each query fans out to its n_probe nearest centroid lists
        cm = bc_cent.value
        for batch in batches:
            mat = np.stack(batch["embedding"].to_numpy()).astype("float64")
            unit = mat / np.sqrt((mat * mat).sum(axis=1))[:, None]
            probes = np.argsort(-(unit @ cm.T), axis=1, kind="stable")[:, :n_probe]
            n_rows = len(batch)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(batch["vec_id"].to_numpy(), n_probe),
                    "embedding": batch["embedding"].iloc[
                        np.repeat(np.arange(n_rows), n_probe)
                    ].to_numpy(),
                    "cid": probes.reshape(-1).astype("int32"),
                }
            )

    vec_schema = "vec_id long, embedding array<float>, cid int"
    assigned = e.mapInPandas(assign_batches, schema=vec_schema)
    probed = e.mapInPandas(probe_batches, schema=vec_schema)

    def rank_cogroup(qpdf: pd.DataFrame, ipdf: pd.DataFrame) -> pd.DataFrame:
        # queries probing this centroid x index vectors assigned to it:
        # one matmul per centroid list, partial top-k per query
        if len(qpdf) == 0 or len(ipdf) == 0:
            return _empty_pairs("cos_raw")
        a_ids, a_unit = _unit_rows(qpdf)
        b_ids, b_unit = _unit_rows(ipdf)
        out_vec, out_nbr, out_cos = _partial_topk(a_ids, b_ids, a_unit @ b_unit.T, k)
        if not out_vec:
            return _empty_pairs("cos_raw")
        return pd.DataFrame({"vec_id": out_vec, "nbr_id": out_nbr, "cos_raw": out_cos})

    cand = (
        probed.groupBy("cid")
        .cogroup(assigned.groupBy("cid"))
        .applyInPandas(rank_cogroup, schema="vec_id long, nbr_id long, cos_raw double")
    )
    # global re-rank of the per-list partials (a vector assigned to exactly
    # one list and probing distinct lists never yields duplicate pairs)
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_raw").desc(), "nbr_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("vec_id", "nbr_id", qround(F.col("cos_raw"), 4).alias("cosine"))
    )


def pq_train_codebooks_distributed(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    ksub: int = 16,
    iters: int = 10,
):
    """Per-subspace Lloyd k-means codebooks trained DISTRIBUTED over the
    full corpus (VERDICT r8 #5 — finishes what the IVF coarse quantizer
    started; replaces the r5-era bounded-sample training path in
    pq_topk/ivfpq_topk).

    All m subspaces train in ONE set of Spark jobs, not m separate
    k-means runs: per iteration a single mapInPandas pass slices each
    Arrow batch into its m subvectors, assigns every (row, subspace) to
    its nearest codeword against the broadcast codebooks, and emits the
    per-batch PARTIAL SUMS — at most m*ksub*dsub rows per batch — so the
    shuffle and the driver collect carry codebook-sized aggregates
    (m*ksub*dsub = dim*ksub scalars, 1024 doubles at dim=64/ksub=16),
    never vectors. This is the same reduction shape as kmeans_fit's
    update step but with the assign and the partial sum fused into the
    scan, so there is no per-row label join and no posexplode of the
    corpus.

    Driver-side work is exactly the bounded seed (the first ksub
    hash-ordered unit vectors) plus the k-sized per-iteration collect.
    Deterministic up to float-sum reduction order (same contract as
    kmeans_fit; the PQ keys are rows-only, recall-asserted).
    Empty clusters keep their previous codeword."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    seed = (
        df.withColumn("_h", F.xxhash64(id_col))
        .orderBy("_h", id_col)
        .limit(ksub)
        .select(vec_col)
        .toPandas()
    )
    smat = np.stack(seed[vec_col].to_numpy()).astype("float64")
    smat = smat / np.sqrt((smat * smat).sum(axis=1))[:, None]
    dim = smat.shape[1]
    if dim % m != 0:
        raise ValueError(
            f"pq_train_codebooks_distributed: dim {dim} not divisible by "
            f"m={m}"
        )
    dsub = dim // m
    books = np.empty((m, ksub, dsub))
    for s in range(m):
        sub = smat[:, s * dsub : (s + 1) * dsub]
        cent = sub[: min(ksub, len(sub))].copy()
        if len(cent) < ksub:  # degenerate tiny input: pad by repeating
            cent = np.resize(cent, (ksub, dsub))
        books[s] = cent

    base = df.select(F.col(vec_col).alias("_v"))
    bcs = []
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(books)
        bcs.append(bc)

        def partial_sums(batches, _bc=bc):
            cb = _bc.value  # (m, ksub, dsub)
            m_, ksub_, dsub_ = cb.shape
            for b in batches:
                if len(b) == 0:
                    continue
                mat = np.stack(b["_v"].to_numpy()).astype("float64")
                unit = mat / np.sqrt((mat * mat).sum(axis=1))[:, None]
                ss, ll, ii, vv, nn = [], [], [], [], []
                for s in range(m_):
                    sub = unit[:, s * dsub_ : (s + 1) * dsub_]
                    c = cb[s]
                    d2 = (
                        (sub * sub).sum(1)[:, None]
                        - 2.0 * (sub @ c.T)
                        + (c * c).sum(1)[None, :]
                    )
                    lab = d2.argmin(axis=1)
                    for lbl in np.unique(lab):
                        pts = sub[lab == lbl]
                        ss.extend([s] * dsub_)
                        ll.extend([int(lbl)] * dsub_)
                        ii.extend(range(dsub_))
                        vv.extend(pts.sum(axis=0).tolist())
                        nn.extend([len(pts)] * dsub_)
                yield pd.DataFrame(
                    {"s": ss, "label": ll, "i": ii, "psum": vv, "pn": nn}
                )

        agg = (
            base.mapInPandas(
                partial_sums, schema="s int, label int, i int, psum double, pn long"
            )
            .groupBy("s", "label", "i")
            .agg(F.sum("psum").alias("sv"), F.sum("pn").alias("nv"))
            .collect()
        )
        new = books.copy()
        acc = np.zeros((m, ksub, dsub))
        cnt = np.zeros((m, ksub), dtype="int64")
        for r in agg:
            acc[r["s"], r["label"], r["i"]] = r["sv"]
            cnt[r["s"], r["label"]] = r["nv"]
        for s in range(m):
            for c_i in range(ksub):
                if cnt[s, c_i]:
                    new[s, c_i] = acc[s, c_i] / cnt[s, c_i]
        books = new
    for bc in bcs:
        bc.unpersist()
    return books


def pq_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    m: int = 8,
    ksub: int = 16,
    train_iters: int = 10,
    refine: int = 64,
    index_block_rows: int = 1024,
) -> DataFrame:
    """Product-quantization ANN (PQ-ADC + exact re-rank): the
    memory-compression scale path for similarity search.

    Index build: unit vectors are split into m subvectors; per-subspace
    k-means codebooks (trained DISTRIBUTED over the full corpus — one
    fused assign+partial-sum pass per iteration covering all m subspaces,
    `pq_train_codebooks_distributed`) quantize each
    subvector to a code — the stored index is m small ints per vector
    (m bytes at ksub<=256) instead of dim floats: 32x less index shuffled,
    cached, and scanned at dim=64/m=8. Query: asymmetric distance
    computation — one lookup table per (query, subspace) against the
    broadcast codebooks, then the approximate inner product of every
    candidate is m table lookups, no float math per pair. The coarse scan
    keeps the top `refine` candidates per query; an exact-cosine re-rank
    over raw vectors (refine * n rows, not n²) restores precision — the
    standard IVFADC shape minus the coarse quantizer (compose with
    ivf_topk's centroid partitioning for both). Measured on the hard case
    of 500 near-orthogonal random vectors (m=8, ksub=16): recall vs brute
    force 0.68 / 0.84 / 0.96 at refine 32 / 64 / 128 — `refine` is the
    recall-vs-shuffle knob, and stays O(n * refine), never O(n²).

    Distribution: same 2-D block cogroup as cosine_topk_blocked, but the
    index side ships CODES ONLY — at 100 TB the all-pairs tile traffic
    drops by the compression ratio, which is the whole point of PQ.
    Approximate → rows-only; tests assert recall vs q_cosine_topk."""
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    # --- train: distributed per-subspace k-means over the FULL corpus ---
    # (VERDICT r8 #5 — no driver-side sample beyond the ksub-row seed;
    # per-iteration traffic is the m*ksub*dsub partial-sum table)
    try:
        books = pq_train_codebooks_distributed(e, m=m, ksub=ksub, iters=train_iters)
    except ValueError as exc:
        raise ValueError(
            f"pq_topk: embedding dim is not divisible by m={m} "
            "subspaces; pick m dividing dim (otherwise the trailing "
            "dimensions would be silently dropped)"
        ) from exc
    dsub = books.shape[2]
    bc_books = spark.sparkContext.broadcast(books)

    # --- encode: one mapInPandas pass tags every vector with its m codes ---
    def encode_batches(batches):
        cb = bc_books.value
        for b in batches:
            mat = np.stack(b["embedding"].to_numpy()).astype("float64")
            unit = mat / np.sqrt((mat * mat).sum(axis=1))[:, None]
            codes = np.empty((len(b), m), dtype="int32")
            for s in range(m):
                sub = unit[:, s * dsub : (s + 1) * dsub]
                d2 = ((sub[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame({"vec_id": b["vec_id"], "codes": list(codes)})

    codes_df = e.mapInPandas(encode_batches, schema="vec_id long, codes array<int>")

    # --- coarse ADC scan: 2-D block cogroup, queries x codes ---
    n = _embeddings_rowcount(spark, sf_dir)
    n_blocks = max(1, -(-n // index_block_rows))
    queries = e.withColumn(
        "qblk", F.pmod(F.xxhash64("vec_id"), F.lit(n_blocks)).cast("int")
    ).withColumn(
        "iblk", F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1)).cast("array<int>"))
    )
    indexed = codes_df.withColumn(
        "iblk", F.pmod(F.xxhash64("vec_id"), F.lit(n_blocks)).cast("int")
    ).withColumn(
        "qblk", F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1)).cast("array<int>"))
    )

    def adc_cogroup(qpdf: pd.DataFrame, ipdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0 or len(ipdf) == 0:
            return _empty_pairs("approx_dot")
        cb = bc_books.value  # (m, ksub, dsub)
        a_ids, a_unit = _unit_rows(qpdf)
        b_ids = ipdf["vec_id"].to_numpy()
        codes = np.stack(ipdf["codes"].to_numpy())  # (ni, m)
        # lookup tables: lut[q, s, c] = <q_sub[s], codebook[s][c]>
        qsub = a_unit.reshape(len(a_ids), m, dsub)
        lut = np.einsum("qsd,skd->qsk", qsub, cb)
        # ADC as one dgemm: lut (nq, m*ksub) x one-hot codes (ni, m*ksub)ᵀ.
        # The textbook per-subspace gather (acc += lut[:, s, codes[:, s]])
        # is memory-gather-bound and measured ~4x slower than BLAS here;
        # the one-hot matmul costs m*ksub-dim inner products but stays in
        # dgemm. (The storage/shuffle win — codes, not floats — is
        # unchanged; ADC compute only beats dgemm at much higher dim.)
        oh = np.zeros((len(b_ids), m * ksub))
        oh[np.arange(len(b_ids))[:, None], np.arange(m)[None, :] * ksub + codes] = 1.0
        acc = lut.reshape(len(a_ids), m * ksub) @ oh.T
        out_vec, out_nbr, out_dot = _partial_topk(a_ids, b_ids, acc, refine)
        if not out_vec:
            return _empty_pairs("approx_dot")
        return pd.DataFrame(
            {"vec_id": out_vec, "nbr_id": out_nbr, "approx_dot": out_dot}
        )

    partials = (
        queries.groupBy("qblk", "iblk")
        .cogroup(indexed.groupBy("qblk", "iblk"))
        .applyInPandas(adc_cogroup, schema="vec_id long, nbr_id long, approx_dot double")
    )
    w_coarse = Window.partitionBy("vec_id").orderBy(F.col("approx_dot").desc(), "nbr_id")
    cand = (
        partials.withColumn("rn", F.row_number().over(w_coarse))
        .filter(F.col("rn") <= refine)
        .select("vec_id", "nbr_id")
    )

    # --- exact re-rank: refine * n rows, JVM-side zip_with dot product ---
    va = _as_double_vec(load_table(spark, sf_dir, "embeddings")).select(
        F.col("vec_id"), F.col("vec").alias("va"), F.col("norm").alias("na")
    )
    vb = _as_double_vec(load_table(spark, sf_dir, "embeddings")).select(
        F.col("vec_id").alias("nbr_id"), F.col("vec").alias("vb"), F.col("norm").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    exact = cand.join(va, "vec_id").join(vb, "nbr_id").select(
        "vec_id", "nbr_id", (dot / (F.col("na") * F.col("nb"))).alias("cos_sim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), "nbr_id")
    return (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("vec_id", "nbr_id", qround(F.col("cos_sim"), 4).alias("cosine"))
    )


def ivfpq_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 8,
    m: int = 8,
    ksub: int = 16,
    train_iters: int = 10,
    refine: int = 64,
) -> DataFrame:
    """IVF-PQ: the full FAISS-style IVFADC composition — and the shape that
    actually survives 100 TB on BOTH axes:

    - COMPUTE is sub-quadratic: queries probe only n_probe of n_centroids
      inverted lists (ivf_topk's cogroup-on-centroid), so the candidate
      count is ~n * n_probe / n_centroids per query side, never all pairs.
    - MEMORY/SHUFFLE is compressed: inside a list, candidates are ranked
      by PQ-ADC against m byte-codes per vector (pq_topk's one-hot dgemm),
      so the inverted lists shuffle/cache codes, not raw vectors — the
      index fits ~32x more vectors per executor at dim=64/m=8.

    The coarse quantizer trains DISTRIBUTED over the full corpus
    (_train_coarse_centroids → kmeans_fit), and so do the PQ codebooks
    (`pq_train_codebooks_distributed` — residual codebooks are skipped so
    the encode pass stays identical to pq_topk). Encode+assign is one
    mapInPandas pass emitting (cid, codes);
    probing fans each query to its n_probe nearest centroids; the
    per-list ADC cogroup keeps top `refine` per (query, list); a global
    window merges lists and an exact-cosine re-rank over refine*n rows
    restores precision. Approximate → rows-only; tests assert recall vs
    q_cosine_topk."""
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    # --- BOTH quantizers train DISTRIBUTED over the full corpus: the
    # coarse centroids via kmeans_fit (VERDICT r5 #3) and the per-subspace
    # PQ codebooks via the fused assign+partial-sum pass (VERDICT r8 #5).
    # Driver-side transit is the two bounded seeds plus k-sized
    # per-iteration aggregates — no corpus sample ever lands on the driver.
    cmat = _train_coarse_centroids(e, n_centroids, iters=4)
    bc_cent = spark.sparkContext.broadcast(cmat)
    try:
        books = pq_train_codebooks_distributed(e, m=m, ksub=ksub, iters=train_iters)
    except ValueError as exc:
        raise ValueError(
            f"ivfpq_topk: embedding dim is not divisible by m={m} "
            "subspaces; pick m dividing dim (otherwise the trailing "
            "dimensions would be silently dropped)"
        ) from exc
    dsub = books.shape[2]
    bc_books = spark.sparkContext.broadcast(books)

    # --- index: one pass emits (cid, codes) per vector — codes only ---
    def encode_assign(batches):
        cm = bc_cent.value
        cb = bc_books.value
        for b in batches:
            if len(b) == 0:
                continue
            mat = np.stack(b["embedding"].to_numpy()).astype("float64")
            unit = mat / np.sqrt((mat * mat).sum(axis=1))[:, None]
            codes = np.empty((len(b), m), dtype="int32")
            for s in range(m):
                sub = unit[:, s * dsub : (s + 1) * dsub]
                d2 = ((sub[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": b["vec_id"],
                    "cid": np.argmax(unit @ cm.T, axis=1).astype("int32"),
                    "codes": list(codes),
                }
            )

    indexed = e.mapInPandas(
        encode_assign, schema="vec_id long, cid int, codes array<int>"
    )

    # --- queries fan out to their n_probe nearest lists (raw vector) ---
    def probe(batches):
        cm = bc_cent.value
        for b in batches:
            if len(b) == 0:
                continue
            mat = np.stack(b["embedding"].to_numpy()).astype("float64")
            unit = mat / np.sqrt((mat * mat).sum(axis=1))[:, None]
            probes = np.argsort(-(unit @ cm.T), axis=1, kind="stable")[:, :n_probe]
            n_rows = len(b)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(b["vec_id"].to_numpy(), n_probe),
                    "embedding": b["embedding"].iloc[
                        np.repeat(np.arange(n_rows), n_probe)
                    ].to_numpy(),
                    "cid": probes.reshape(-1).astype("int32"),
                }
            )

    probed = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .mapInPandas(probe, schema="vec_id long, embedding array<float>, cid int")
    )

    # --- per-list ADC ranking: cogroup on centroid id, codes side only ---
    def adc_rank(qpdf: pd.DataFrame, ipdf: pd.DataFrame) -> pd.DataFrame:
        # same one-hot-dgemm ADC as pq_topk's kernel (see the comment
        # there for why this beats the per-subspace gather)
        if len(qpdf) == 0 or len(ipdf) == 0:
            return _empty_pairs("approx_dot")
        cb = bc_books.value
        a_ids, a_unit = _unit_rows(qpdf)
        b_ids = ipdf["vec_id"].to_numpy()
        codes = np.stack(ipdf["codes"].to_numpy())
        lut = np.einsum("qsd,skd->qsk", a_unit.reshape(len(a_ids), m, dsub), cb)
        oh = np.zeros((len(b_ids), m * ksub))
        oh[np.arange(len(b_ids))[:, None], np.arange(m)[None, :] * ksub + codes] = 1.0
        acc = lut.reshape(len(a_ids), m * ksub) @ oh.T
        out_vec, out_nbr, out_dot = _partial_topk(a_ids, b_ids, acc, refine)
        if not out_vec:
            return _empty_pairs("approx_dot")
        return pd.DataFrame(
            {"vec_id": out_vec, "nbr_id": out_nbr, "approx_dot": out_dot}
        )

    partials = (
        probed.groupBy("cid")
        .cogroup(indexed.groupBy("cid"))
        .applyInPandas(adc_rank, schema="vec_id long, nbr_id long, approx_dot double")
    )
    w_coarse = Window.partitionBy("vec_id").orderBy(F.col("approx_dot").desc(), "nbr_id")
    cand = (
        partials.withColumn("rn", F.row_number().over(w_coarse))
        .filter(F.col("rn") <= refine)
        .select("vec_id", "nbr_id")
    )

    # --- exact re-rank over refine*n candidate rows ---
    va = _as_double_vec(load_table(spark, sf_dir, "embeddings")).select(
        F.col("vec_id"), F.col("vec").alias("va"), F.col("norm").alias("na")
    )
    vb = _as_double_vec(load_table(spark, sf_dir, "embeddings")).select(
        F.col("vec_id").alias("nbr_id"), F.col("vec").alias("vb"), F.col("norm").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    exact = cand.join(va, "vec_id").join(vb, "nbr_id").select(
        "vec_id", "nbr_id", (dot / (F.col("na") * F.col("nb"))).alias("cos_sim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), "nbr_id")
    return (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("vec_id", "nbr_id", qround(F.col("cos_sim"), 4).alias("cosine"))
    )


@_q("q_ivfpq_topk")  # rows-only: approximate — recall vs q_cosine_topk is test-asserted
def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible entry for the IVF-PQ composition (16 lists x 8
    probes, 8x16 codebooks, refine=64). See ivfpq_topk."""
    return ivfpq_topk(spark, sf_dir)


@_q("q_pq_topk")  # rows-only: approximate — recall vs q_cosine_topk is test-asserted
def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible entry for the product-quantization ANN path (defaults:
    k=3, 8 subspaces x 16 codes, refine=64). See pq_topk for the 100-TB
    compression story."""
    return pq_topk(spark, sf_dir)


@_q("q_ann_lsh_topk")  # rows-only: approximate — recall vs q_cosine_topk is test-asserted
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible entry for the hyperplane-LSH ANN scale path (k=3,
    auto-sized planes x 16 tables, recall ~0.90 vs brute force on random
    near-orthogonal vectors at smoke scale). See ann_lsh_topk for the
    100-TB design notes."""
    return ann_lsh_topk(spark, sf_dir)


@_q("q_ivf_topk")  # rows-only: approximate — recall vs q_cosine_topk is test-asserted
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible entry for the IVF-Flat ANN scale path (defaults: k=3,
    16 centroids, 4 probes). See ivf_topk for the 100-TB design notes."""
    return ivf_topk(spark, sf_dir)


# ---------------------------------------------------- verified ANN (r10) ---
# The ANN family (q_ann_lsh_topk / q_ivf_topk / q_pq_topk / q_ivfpq_topk) is
# rows-only because its hyperplanes/codebooks come from numpy RNG + trained
# k-means — not expressible in SQL. This variant closes that gap: the
# hyperplanes are DERIVED FROM md5, a function both engines share, so the
# ENTIRE pipeline (signature -> band buckets -> candidate equi-join -> exact
# re-rank) has a bit-faithful DuckDB twin and the LSH path itself gets a
# hash-checked driver row — not just its brute-force baseline.

ANN_V_DIM = 64  # embeddings.embedding width at every SF (TESTDATA.md)
ANN_V_PLANES = 32
ANN_V_BAND_BITS = 8  # 4 bands x 8 bits
ANN_V_K = 3

_ANN_VERIFIED_ORACLE = f"""
    WITH planes AS (
      SELECT p, d,
             CASE WHEN substr(md5('h:' || p || ':' || d), 1, 1) <= '7'
                  THEN 1.0 ELSE -1.0 END AS s
      FROM (SELECT unnest(range(0, {ANN_V_PLANES})) AS p),
           (SELECT unnest(range(0, {ANN_V_DIM})) AS d)
    ),
    ex AS (
      SELECT vec_id, unnest(range(0, len(embedding))) AS d,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    proj AS (
      SELECT vec_id, p, sum(v * s) AS proj
      FROM ex JOIN planes USING (d) GROUP BY vec_id, p
    ),
    sig AS (
      SELECT vec_id, CAST(p // {ANN_V_BAND_BITS} AS INT) AS band,
             string_agg(CASE WHEN proj >= 0 THEN '1' ELSE '0' END,
                        '' ORDER BY p) AS bucket
      FROM proj GROUP BY 1, 2
    ),
    pairs AS (
      SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
      FROM sig a JOIN sig b
        ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    cand AS (
      SELECT va AS vec_id, vb AS nbr_id FROM pairs
      UNION ALL
      SELECT vb AS vec_id, va AS nbr_id FROM pairs
    ),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM ex GROUP BY vec_id),
    dots AS (
      SELECT c.vec_id, c.nbr_id, sum(a.v * b.v) AS dot
      FROM cand c
      JOIN ex a ON a.vec_id = c.vec_id
      JOIN ex b ON b.vec_id = c.nbr_id AND a.d = b.d
      GROUP BY c.vec_id, c.nbr_id
    )
    SELECT vec_id, nbr_id,
           floor(cos_sim * 10000.0 + 0.5) / 10000.0 AS cosine
    FROM (
      SELECT d.vec_id, d.nbr_id, d.dot / (na.nrm * nb.nrm) AS cos_sim,
             row_number() OVER (PARTITION BY d.vec_id
                                ORDER BY d.dot / (na.nrm * nb.nrm) DESC,
                                         d.nbr_id) AS rn
      FROM dots d
      JOIN norms na ON d.vec_id = na.vec_id
      JOIN norms nb ON d.nbr_id = nb.vec_id
    ) WHERE rn <= {ANN_V_K}
"""


def _ann_plane_grid(spark: SparkSession) -> DataFrame:
    """(p, d, s) — the md5-derived ±1 hyperplane matrix both engines
    rebuild (s = +1 iff the first hex nibble of md5('h:p:d') <= '7')."""
    return (
        spark.range(ANN_V_PLANES)
        .select(F.col("id").alias("p"))
        .crossJoin(spark.range(ANN_V_DIM).select(F.col("id").alias("d")))
        .select(
            "p",
            "d",
            F.when(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.lit("h"),
                            F.col("p").cast("string"),
                            F.col("d").cast("string"),
                        ).cast("binary")
                    ),
                    1,
                    1,
                )
                <= "7",
                F.lit(1.0),
            )
            .otherwise(F.lit(-1.0))
            .alias("s"),
        )
    )


def _ann_plane_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, bits: array<string>) — each vector's full
    {ANN_V_PLANES}-bit hyperplane signature, computed ROW-LOCALLY: the
    plane matrix is aggregated into ONE broadcast array-of-arrays row
    (p-major, d-ascending — the exact summation order of the
    posexplode+groupBy form, so projections are bit-identical) and each
    vector folds all P projections in a single scan stage.

    The fold lambdas are INTERPRETED per element (not codegen'd), so this
    form only wins when one fold pass feeds several consumers/layouts —
    q_lsh_param_sweep (3 bandings, measured 3.87 -> 3.32 s interleaved
    A/B). Single-layout consumers keep the codegen'd explode form
    (_ann_v_signatures — measured the other way, see its docstring)."""
    planes = _ann_plane_grid(spark)
    planes_row = (
        planes.groupBy("p")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "s"))),
                lambda x: x["s"],
            ).alias("sarr")
        )
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "sarr"))),
                lambda x: x["sarr"],
            ).alias("planes")
        )
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    return emb.crossJoin(F.broadcast(planes_row)).select(
        "vec_id",
        F.transform(
            "planes",
            lambda pl: F.when(
                F.aggregate(
                    F.zip_with(F.col("v"), pl, lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                >= 0,
                F.lit("1"),
            ).otherwise(F.lit("0")),
        ).alias("bits"),
    )


def _band_buckets(bits_df: DataFrame, bits_per_band: int) -> DataFrame:
    """(vec_id, band, bucket) from a _ann_plane_bits frame: slice the
    P-bit array into P/bits_per_band band buckets, row-locally."""
    n_bands = ANN_V_PLANES // bits_per_band
    return bits_df.select(
        "vec_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.struct(
                    b.cast("int").alias("band"),
                    F.array_join(
                        F.slice("bits", b * bits_per_band + 1, bits_per_band),
                        "",
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(
        "vec_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def _ann_v_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, band, bucket) LSH signatures from the md5-derived ±1
    hyperplanes shared by q_ann_verified_topk and q_ann_recall_eval — both
    engines rebuild the identical planes, so the banded buckets hash-match.

    Deliberately the CODEGEN'D posexplode+groupBy form, NOT the row-local
    _ann_plane_bits fold (r16 measured-and-rejected for the single-layout
    consumers: higher-order-function lambdas are interpreted per element,
    and the 64-plane x 64-dim fold costs more CPU than the whole-stage-
    codegen explode + map-side-combined shuffle it avoids — interleaved
    A/B at sf0.1: explode 2.15 s vs fold 2.94 s on q_ann_verified_topk,
    2.06 vs 2.48 on q_ann_recall_eval. The fold form wins only when its
    cost is amortized over several layouts: q_lsh_param_sweep keeps it)."""
    planes = _ann_plane_grid(spark)
    ex = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("d", "v"))
        .withColumn("v", F.col("v").cast("double"))
    )
    proj = (
        ex.join(F.broadcast(planes), "d")
        .groupBy("vec_id", "p")
        .agg(F.sum(F.col("v") * F.col("s")).alias("proj"))
    )
    bits = proj.select(
        "vec_id",
        (F.col("p") / ANN_V_BAND_BITS).cast("int").alias("band"),
        "p",
        F.when(F.col("proj") >= 0, F.lit("1")).otherwise(F.lit("0")).alias("bit"),
    )
    return bits.groupBy("vec_id", "band").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "bit"))),
                lambda x: x["bit"],
            ),
            "",
        ).alias("bucket")
    )


@_q("q_ann_verified_topk", _ANN_VERIFIED_ORACLE)
def q_ann_verified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN with a FULL oracle gate (r10): signatures come
    from md5-derived ±1 hyperplanes (s(p,d) = +1 iff the first hex nibble
    of md5('h:p:d') <= '7') instead of numpy RNG, so DuckDB rebuilds the
    identical planes, signatures, band buckets and candidate pairs, then
    re-ranks them with the same exact cosine — the driver's hash check
    covers the LSH path end-to-end, not merely a brute-force proxy.

    Shape: {ANN_V_PLANES} planes in {ANN_V_PLANES // ANN_V_BAND_BITS}
    bands of {ANN_V_BAND_BITS} bits; a random pair collides ~(1/2^8) per
    band (~1.6% overall) while near-duplicates collide with high
    probability — the standard recall/candidate-count dial.

    Scale shape: the plane table ({ANN_V_PLANES}x{ANN_V_DIM} rows) is a
    broadcast; projections are one map-side-combined groupBy(vec_id, p)
    over the posexploded stream (n x dim rows in, n x planes out);
    signatures group per (vec_id, band); candidates are a banded
    EQUI-join (each bucket joins only its own members — never all-pairs);
    the exact re-rank touches only candidate rows. At 100 TB the only
    skew risk is a hot bucket (near-constant vectors); the ceiling fix is
    the same document-frequency cap q_substring_dup applies to anchors.
    Float caveat: cross-engine doubles differ by summation order only
    (~1e-15 relative); the proj >= 0 bit threshold and the 1e-4 cosine
    quantization sit ~10 orders of magnitude above that."""
    sig = _ann_v_signatures(spark, sf_dir)
    a, b = sig.alias("a"), sig.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb"))
        .distinct()
    )
    cand = pairs.select(F.col("va").alias("vec_id"), F.col("vb").alias("nbr_id")).unionAll(
        pairs.select(F.col("vb").alias("vec_id"), F.col("va").alias("nbr_id"))
    )
    va = _as_double_vec(load_table(spark, sf_dir, "embeddings")).select(
        F.col("vec_id"), F.col("vec").alias("va"), F.col("norm").alias("na")
    )
    vb = _as_double_vec(load_table(spark, sf_dir, "embeddings")).select(
        F.col("vec_id").alias("nbr_id"),
        F.col("vec").alias("vb"),
        F.col("norm").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    exact = cand.join(va, "vec_id").join(vb, "nbr_id").select(
        "vec_id", "nbr_id", (dot / (F.col("na") * F.col("nb"))).alias("cos_sim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), "nbr_id")
    return (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= ANN_V_K)
        .select("vec_id", "nbr_id", qround(F.col("cos_sim"), 4).alias("cosine"))
    )


RQ_N = 32  # evaluation query sample size (fixed — NOT a corpus fraction)
RQ_K = 10  # recall@k cutoff

_ANN_RECALL_ORACLE = f"""
    WITH planes AS (
      SELECT p, d,
             CASE WHEN substr(md5('h:' || p || ':' || d), 1, 1) <= '7'
                  THEN 1.0 ELSE -1.0 END AS s
      FROM (SELECT unnest(range(0, {ANN_V_PLANES})) AS p),
           (SELECT unnest(range(0, {ANN_V_DIM})) AS d)
    ),
    ex AS (
      SELECT vec_id, unnest(range(0, len(embedding))) AS d,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    proj AS (
      SELECT vec_id, p, sum(v * s) AS proj
      FROM ex JOIN planes USING (d) GROUP BY vec_id, p
    ),
    sig AS (
      SELECT vec_id, CAST(p // {ANN_V_BAND_BITS} AS INT) AS band,
             string_agg(CASE WHEN proj >= 0 THEN '1' ELSE '0' END,
                        '' ORDER BY p) AS bucket
      FROM proj GROUP BY 1, 2
    ),
    q AS (
      SELECT vec_id FROM embeddings
      ORDER BY md5('rq:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT {RQ_N}
    ),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM ex GROUP BY vec_id),
    exd AS (
      SELECT qq.vec_id AS qid, b.vec_id AS nbr_id, sum(a.v * b.v) AS dot
      FROM q qq
      JOIN ex a ON a.vec_id = qq.vec_id
      JOIN ex b ON b.d = a.d AND b.vec_id <> qq.vec_id
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT qid, nbr_id FROM (
        SELECT d.qid, d.nbr_id,
               row_number() OVER (PARTITION BY d.qid
                                  ORDER BY d.dot / (na.nrm * nb.nrm) DESC,
                                           d.nbr_id) AS rn
        FROM exd d
        JOIN norms na ON d.qid = na.vec_id
        JOIN norms nb ON d.nbr_id = nb.vec_id
      ) WHERE rn <= {RQ_K}
    ),
    cand AS (
      SELECT DISTINCT qq.vec_id AS qid, s2.vec_id AS nbr_id
      FROM q qq
      JOIN sig s1 ON s1.vec_id = qq.vec_id
      JOIN sig s2 ON s2.band = s1.band AND s2.bucket = s1.bucket
                 AND s2.vec_id <> qq.vec_id
    ),
    anndot AS (
      SELECT c.qid, c.nbr_id, sum(a.v * b.v) AS dot
      FROM cand c
      JOIN ex a ON a.vec_id = c.qid
      JOIN ex b ON b.vec_id = c.nbr_id AND b.d = a.d
      GROUP BY 1, 2
    ),
    ann AS (
      SELECT qid, nbr_id FROM (
        SELECT d.qid, d.nbr_id,
               row_number() OVER (PARTITION BY d.qid
                                  ORDER BY d.dot / (na.nrm * nb.nrm) DESC,
                                           d.nbr_id) AS rn
        FROM anndot d
        JOIN norms na ON d.qid = na.vec_id
        JOIN norms nb ON d.nbr_id = nb.vec_id
      ) WHERE rn <= {RQ_K}
    ),
    hits AS (
      SELECT e.qid, count(*) AS h
      FROM exact e JOIN ann a ON a.qid = e.qid AND a.nbr_id = e.nbr_id
      GROUP BY e.qid
    ),
    nc AS (SELECT qid, count(*) AS ncand FROM cand GROUP BY qid)
    SELECT qq.vec_id,
           CAST(COALESCE(nc.ncand, 0) AS BIGINT) AS n_candidates,
           CAST(COALESCE(hits.h, 0) AS BIGINT) AS hits,
           floor(COALESCE(hits.h, 0) * 1000000.0 / {RQ_K} + 0.5) / 1000000.0
               AS recall_at_k
    FROM q qq
    LEFT JOIN nc ON nc.qid = qq.vec_id
    LEFT JOIN hits ON hits.qid = qq.vec_id
"""


@_q("q_ann_recall_eval", _ANN_RECALL_ORACLE)
def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation IN the engine (r10): recall@{RQ_K} of the
    md5-plane LSH shortlist against the exact brute-force top-{RQ_K}, per
    query, over a FIXED {RQ_N}-query md5-ordered sample — the measurement
    loop every ANN deployment needs (tune bands/bits by re-running the eval,
    not by faith). Emits (query, candidate-set size, hits, recall@k); both
    rankings and the sample itself are md5-deterministic, so the whole
    evaluation is oracle-gated — the in-repo recall tests become a
    driver-visible row.

    Scale shape: the query sample is CONSTANT-size ({RQ_N}), so the exact
    side is O({RQ_N}·n) via a broadcast of the 32 query vectors — never the
    O(n²) all-pairs the brute-force baseline pays; the ANN side reuses
    q_ann_verified_topk's banded equi-join signatures (shared helper). At
    100 TB the eval cost is one corpus scan plus the signature build, and
    sample size scales the precision of the estimate, not the data touched.
    Ranking ties: raw-double order with nbr_id tiebreak, the proven
    q_ann_verified_topk discipline (~1e-15 cross-engine relative error vs
    ~1e-7 typical cosine gaps); hits compare only ids, never floats.

    Plan-reuse note (r12): qs/sig/cand each feed 2-3 branches, so the
    q_graph_triangles localCheckpoint treatment was TRIED here — and
    measured SLOWER at both sf0.1 (1.9 s → 3.0 s) and the 10× probe
    (3.8 s → 4.4 s): the recomputed subtrees pipeline across all cores,
    while eager checkpoints serialize the job graph and pay
    materialization for corpus×bands rows. Rejected; evidence in
    docs/SCALE.md (r12)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qs = (
        emb.select("vec_id")
        .orderBy(
            F.md5(
                F.concat(F.lit("rq:"), F.col("vec_id").cast("string")).cast(
                    "binary"
                )
            ),
            "vec_id",
        )
        .limit(RQ_N)
    )
    v = _as_double_vec(emb)
    qv = (
        qs.join(v, "vec_id")
        .select(
            F.col("vec_id").alias("qid"),
            F.col("vec").alias("qvec"),
            F.col("norm").alias("qn"),
        )
    )
    allv = v.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("vec").alias("nvec"),
        F.col("norm").alias("nn"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("qvec"), F.col("nvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = (dot / (F.col("qn") * F.col("nn"))).alias("cos")
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), "nbr_id")
    exact = (
        allv.crossJoin(F.broadcast(qv))
        .filter(F.col("nbr_id") != F.col("qid"))
        .select("qid", "nbr_id", cos)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= RQ_K)
        .select("qid", "nbr_id")
    )
    sig = _ann_v_signatures(spark, sf_dir)
    sq = sig.join(
        F.broadcast(qs.withColumnRenamed("vec_id", "qid")),
        F.col("vec_id") == F.col("qid"),
    ).select("qid", "band", "bucket")
    cand = (
        sq.join(sig, ["band", "bucket"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("nbr_id"))
        .distinct()
    )
    ann = (
        cand.join(F.broadcast(qv), "qid")
        .join(allv, "nbr_id")
        .select("qid", "nbr_id", cos)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= RQ_K)
        .select("qid", "nbr_id")
    )
    hits = exact.join(ann, ["qid", "nbr_id"]).groupBy("qid").agg(
        F.count("*").alias("h")
    )
    nc = cand.groupBy("qid").agg(F.count("*").alias("ncand"))
    return (
        qs.select(F.col("vec_id"))
        .join(nc.withColumnRenamed("qid", "vec_id"), "vec_id", "left")
        .join(hits.withColumnRenamed("qid", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("ncand"), F.lit(0)).cast("bigint").alias(
                "n_candidates"
            ),
            F.coalesce(F.col("h"), F.lit(0)).cast("bigint").alias("hits"),
            (
                F.floor(
                    F.coalesce(F.col("h"), F.lit(0)) * 1000000.0 / RQ_K
                    + F.lit(0.5)
                )
                / 1000000.0
            ).alias("recall_at_k"),
        )
    )


def _md5_unit_grid(spark: SparkSession, tag: str, n: int, dim: int) -> DataFrame:
    """Deterministic pseudo-random grid (c, d) -> val in [-1, 1]: the value
    is the first FOUR hex nibbles of md5(tag:c:d) scaled to [-1, 1] — md5 is
    the one hash both engines share byte-for-byte, so a DuckDB oracle can
    rebuild the identical matrix (same trick as q_ann_verified_topk's ±1
    planes, extended from signs to continuous values). n x dim rows, built
    from two driver-local ranges — always broadcast at the consumer join."""

    def nib(j: int):
        return F.expr(f"instr('0123456789abcdef', substring(h, {j}, 1)) - 1")

    return (
        spark.range(n)
        .select(F.col("id").alias("c"))
        .crossJoin(spark.range(dim).select(F.col("id").alias("d")))
        .withColumn(
            "h",
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(tag),
                    F.col("c").cast("string"),
                    F.col("d").cast("string"),
                ).cast("binary")
            ),
        )
        .select(
            "c",
            "d",
            (
                (
                    (nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4))
                    / F.lit(65535.0)
                )
                * 2.0
                - 1.0
            ).alias("val"),
        )
    )


IVF_V_C = 16  # coarse centroids
IVF_V_PROBE = 4  # lists each query probes
IVF_V_K = 3

_IVF_GRID_SQL = """
      SELECT c, d,
             (((instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
             + (instr('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
             + (instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
             + (instr('0123456789abcdef', substr(h, 4, 1)) - 1))
              / 65535.0) * 2.0 - 1.0 AS val
      FROM (
        SELECT c, d, md5('{tag}:' || c || ':' || d) AS h
        FROM (SELECT unnest(range(0, {n})) AS c),
             (SELECT unnest(range(0, {dim})) AS d)
      )
"""

_IVF_VERIFIED_ORACLE = f"""
    WITH cent AS ({_IVF_GRID_SQL.format(tag="ivf", n=IVF_V_C, dim=ANN_V_DIM)}),
    cnorm AS (SELECT c, sqrt(sum(val * val)) AS cn FROM cent GROUP BY c),
    ex AS (
      SELECT vec_id, unnest(range(0, len(embedding))) AS d,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    dots AS (
      SELECT vec_id, c, sum(v * val) AS dot
      FROM ex JOIN cent USING (d) GROUP BY vec_id, c
    ),
    ranked AS (
      SELECT vec_id, dots.c AS c,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dot / cn DESC, dots.c) AS rn
      FROM dots JOIN cnorm ON dots.c = cnorm.c
    ),
    assigned AS (SELECT vec_id, c AS cid FROM ranked WHERE rn = 1),
    probes AS (SELECT vec_id, c AS pc FROM ranked WHERE rn <= {IVF_V_PROBE}),
    cand AS (
      SELECT p.vec_id, a.vec_id AS nbr_id
      FROM probes p JOIN assigned a ON p.pc = a.cid AND p.vec_id <> a.vec_id
    ),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM ex GROUP BY vec_id),
    cd AS (
      SELECT c.vec_id, c.nbr_id, sum(a.v * b.v) AS dot
      FROM cand c
      JOIN ex a ON a.vec_id = c.vec_id
      JOIN ex b ON b.vec_id = c.nbr_id AND a.d = b.d
      GROUP BY c.vec_id, c.nbr_id
    )
    SELECT vec_id, nbr_id,
           floor(cos_sim * 10000.0 + 0.5) / 10000.0 AS cosine
    FROM (
      SELECT cd.vec_id, cd.nbr_id, cd.dot / (na.nrm * nb.nrm) AS cos_sim,
             row_number() OVER (PARTITION BY cd.vec_id
                                ORDER BY cd.dot / (na.nrm * nb.nrm) DESC,
                                         cd.nbr_id) AS rn
      FROM cd
      JOIN norms na ON cd.vec_id = na.vec_id
      JOIN norms nb ON cd.nbr_id = nb.vec_id
    ) WHERE rn <= {IVF_V_K}
"""


@_q("q_ivf_verified_topk", _IVF_VERIFIED_ORACLE)
def q_ivf_verified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN with a FULL oracle gate (r10): the coarse quantizer is
    an md5-derived centroid grid instead of trained k-means, so DuckDB
    rebuilds the identical centroids, inverted-list assignment (argmax
    cosine-to-centroid), {IVF_V_PROBE}-probe candidate generation AND the
    exact re-rank — the driver's hash check covers the IVF mechanics
    (assign → probe → list-join → re-rank) end-to-end, which the trained
    production variant q_ivf_topk structurally cannot offer (numpy RNG +
    Lloyd's are not SQL). q_ivf_topk remains the production path; its
    recall is pinned in tests, its plumbing is certified through this twin.

    Scale shape identical to production IVF: the centroid grid
    ({IVF_V_C}x{ANN_V_DIM}) is a broadcast; scoring is one
    map-side-combined groupBy(vec_id, c) over the posexploded stream;
    assignment/probing is a per-vector window over {IVF_V_C} rows;
    candidates come from the probe↔list EQUI-join on centroid id (each
    query meets only its {IVF_V_PROBE} lists — never all-pairs); the exact
    cosine touches candidates only. Hot-list skew at 100 TB is bounded by
    the centroid count dial (more lists → smaller lists), same as
    production. Float caveat: cross-engine sums differ ~1e-15 relative;
    assignment/probe ranks compare scores of DISTINCT random centroids
    (gaps ~1e-1), and the output cosine is quantized at 1e-4 — both ~11
    orders of magnitude above the noise."""
    def ranked_frame() -> DataFrame:
        # built FRESH per cogroup side: the two sides of a cogroup must not
        # share a subplan (the analyzer's self-join dedup leaves one side
        # with ambiguous expression ids — the _block_sides lesson); the
        # duplicated scoring pass is one cheap map-side-combined aggregate
        cent = _md5_unit_grid(spark, "ivf", IVF_V_C, ANN_V_DIM)
        cnorm = cent.groupBy("c").agg(
            F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("cn")
        )
        ex = (
            load_table(spark, sf_dir, "embeddings")
            .select("vec_id", F.posexplode("embedding").alias("d", "v"))
            .withColumn("v", F.col("v").cast("double"))
        )
        dots = (
            ex.join(F.broadcast(cent), "d")
            .groupBy("vec_id", "c")
            .agg(F.sum(F.col("v") * F.col("val")).alias("dot"))
        )
        wc = Window.partitionBy("vec_id").orderBy(
            (F.col("dot") / F.col("cn")).desc(), "c"
        )
        return dots.join(F.broadcast(cnorm), "c").withColumn(
            "rn", F.row_number().over(wc)
        )

    assigned = ranked_frame().filter(F.col("rn") == 1).select(
        "vec_id", F.col("c").alias("cid")
    )
    probes = ranked_frame().filter(F.col("rn") <= IVF_V_PROBE).select(
        "vec_id", F.col("c").alias("pc")
    )
    # re-rank as ONE cogroup-on-centroid job: each (probe-queries, list)
    # pair meets in a single BLAS matmul — the same cogroup shape as the
    # production ivf_topk (a zip_with-fold re-rank of the candidate join
    # measured ~5x slower at the gate SF). Two independent reads (see
    # _block_sides: a self-cogroup trips the analyzer's self-join dedup).
    import numpy as np
    import pandas as pd

    qside = probes.join(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
        "vec_id",
    )
    iside = assigned.join(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
        "vec_id",
    )

    def rerank_cogroup(qpdf: pd.DataFrame, ipdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0 or len(ipdf) == 0:
            return _empty_pairs("cos_raw")
        a_ids = qpdf["vec_id"].to_numpy()
        a_mat = np.stack(qpdf["embedding"].to_numpy()).astype("float64")
        a_norms = np.sqrt((a_mat * a_mat).sum(axis=1))
        b_ids = ipdf["vec_id"].to_numpy()
        b_mat = np.stack(ipdf["embedding"].to_numpy()).astype("float64")
        b_norms = np.sqrt((b_mat * b_mat).sum(axis=1))
        cos = (a_mat @ b_mat.T) / (a_norms[:, None] * b_norms[None, :])
        out_vec, out_nbr, out_sc = _partial_topk(a_ids, b_ids, cos, IVF_V_K)
        if not out_vec:
            return _empty_pairs("cos_raw")
        return pd.DataFrame({"vec_id": out_vec, "nbr_id": out_nbr, "cos_raw": out_sc})

    partials = (
        qside.groupBy("pc")
        .cogroup(iside.groupBy("cid"))
        .applyInPandas(rerank_cogroup, schema="vec_id long, nbr_id long, cos_raw double")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_raw").desc(), "nbr_id")
    return (
        partials.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= IVF_V_K)
        .select("vec_id", "nbr_id", qround(F.col("cos_raw"), 4).alias("cosine"))
    )


PQ_V_S = 8  # subspaces (64-dim embedding -> 8 dims per subspace)
PQ_V_W = 8  # dims per subspace
PQ_V_CODES = 16  # codewords per subspace
PQ_V_REFINE = 16  # ADC shortlist re-ranked exactly
PQ_V_K = 3

_PQ_VERIFIED_ORACLE = f"""
    WITH grid AS (
      {_IVF_GRID_SQL.format(tag="pq", n=PQ_V_S * PQ_V_CODES, dim=PQ_V_W)}
    ),
    cb AS (
      SELECT c % {PQ_V_CODES} AS code, c // {PQ_V_CODES} AS s,
             (c // {PQ_V_CODES}) * {PQ_V_W} + d AS dim, val
      FROM grid
    ),
    ex AS (
      SELECT vec_id, unnest(range(0, len(embedding))) AS d,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    enc AS (
      SELECT e.vec_id, cb.s, cb.code,
             sum((e.v - cb.val) * (e.v - cb.val)) AS d2
      FROM ex e JOIN cb ON e.d = cb.dim
      GROUP BY e.vec_id, cb.s, cb.code
    ),
    codes AS (
      SELECT vec_id, s, code FROM (
        SELECT vec_id, s, code,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY d2, code) AS rn
        FROM enc
      ) WHERE rn = 1
    ),
    adc AS (
      SELECT q.vec_id, x.vec_id AS nbr_id,
             floor(sum(q.d2) * 1000000.0 + 0.5) / 1000000.0 AS adc
      FROM codes x
      JOIN enc q ON q.s = x.s AND q.code = x.code AND q.vec_id <> x.vec_id
      GROUP BY q.vec_id, x.vec_id
    ),
    cand AS (
      SELECT vec_id, nbr_id FROM (
        SELECT vec_id, nbr_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY adc, nbr_id) AS rn
        FROM adc
      ) WHERE rn <= {PQ_V_REFINE}
    ),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM ex GROUP BY vec_id),
    cd AS (
      SELECT c.vec_id, c.nbr_id, sum(a.v * b.v) AS dot
      FROM cand c
      JOIN ex a ON a.vec_id = c.vec_id
      JOIN ex b ON b.vec_id = c.nbr_id AND a.d = b.d
      GROUP BY c.vec_id, c.nbr_id
    )
    SELECT vec_id, nbr_id, cosine
    FROM (
      SELECT cd.vec_id, cd.nbr_id,
             floor(cd.dot / (na.nrm * nb.nrm) * 10000.0 + 0.5) / 10000.0
               AS cosine,
             row_number() OVER (
               PARTITION BY cd.vec_id
               ORDER BY floor(cd.dot / (na.nrm * nb.nrm) * 10000.0 + 0.5)
                          / 10000.0 DESC,
                        cd.nbr_id) AS rn
      FROM cd
      JOIN norms na ON cd.vec_id = na.vec_id
      JOIN norms nb ON cd.nbr_id = nb.vec_id
    ) WHERE rn <= {PQ_V_K}
"""


@_q("q_pq_verified_topk", _PQ_VERIFIED_ORACLE)
def q_pq_verified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with a FULL oracle gate (r10): the
    {PQ_V_S}x{PQ_V_CODES} codebooks are md5-derived instead of k-means-
    trained, so DuckDB rebuilds encoding (per-subspace argmin), the
    asymmetric-distance (ADC) shortlist AND the exact re-rank — with
    q_ann_verified_topk (LSH) and q_ivf_verified_topk this completes the
    hash-gated trio covering every ANN mechanism the production family
    uses. q_pq_topk stays the production path (trained codebooks, Arrow
    matmuls); its recall is pinned in tests, its mechanics certified here.

    The ADC trick is shared-intermediate: for self-ANN the query lookup
    table IS the encoding distance table (enc holds dist²(vec_sub, code)
    for all {PQ_V_CODES} codes), so ADC(q, x) = Σ_s enc[q, s, code_x(s)]
    — one equi-join on (subspace, code), no recomputation.

    Scale shape: the codebook ({PQ_V_S * PQ_V_CODES}x{PQ_V_W}) is a
    broadcast; encoding is one map-side-combined groupBy(vec_id, s, code);
    the ADC join is the PQ-brute-force scan — O(n²/{PQ_V_CODES}) pairs per
    subspace bucket, the memory-not-candidates compression PQ promises
    (1 byte/subspace vs 32 bytes of floats). At 100 TB the candidate
    reduction comes from composing with IVF lists (q_ivfpq_topk), exactly
    as production does. Float caveat: argmin/rank compare distances of
    DISTINCT random codewords (gaps ~1e-1) against ~1e-15 cross-engine
    noise; output cosine quantized at 1e-4."""
    grid = _md5_unit_grid(spark, "pq", PQ_V_S * PQ_V_CODES, PQ_V_W)
    cb = grid.select(
        F.pmod("c", F.lit(PQ_V_CODES)).alias("code"),
        F.floor(F.col("c") / PQ_V_CODES).alias("s"),
        (F.floor(F.col("c") / PQ_V_CODES) * PQ_V_W + F.col("d")).alias("dim"),
        "val",
    )
    ex = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("d", "v"))
        .withColumn("v", F.col("v").cast("double"))
    )
    enc = (
        ex.join(F.broadcast(cb), ex.d == cb.dim)
        .groupBy("vec_id", "s", "code")
        .agg(
            F.sum((F.col("v") - F.col("val")) * (F.col("v") - F.col("val"))).alias(
                "d2"
            )
        )
    )
    wc = Window.partitionBy("vec_id", "s").orderBy("d2", "code")
    codes = (
        enc.withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") == 1)
        .select(F.col("vec_id").alias("nbr_id"), "s", "code")
    )
    # the corpus is clustered: many vectors share identical codes, so raw
    # ADC ties are COMMON and 1e-16 summation-order noise would break them
    # differently per engine right at the shortlist boundary — rank on the
    # 1e-6-quantized ADC (values ~10, noise ~1e-15: nine orders of margin)
    # with nbr_id as the total tiebreak, which is bit-identical cross-engine
    adc = (
        enc.join(codes, ["s", "code"])
        .filter(F.col("vec_id") != F.col("nbr_id"))
        .groupBy("vec_id", "nbr_id")
        .agg(qround(F.sum("d2"), 6).alias("adc"))
    )
    wa = Window.partitionBy("vec_id").orderBy("adc", "nbr_id")
    cand = (
        adc.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") <= PQ_V_REFINE)
        .select("vec_id", "nbr_id")
    )
    va = _as_double_vec(load_table(spark, sf_dir, "embeddings")).select(
        F.col("vec_id"), F.col("vec").alias("va"), F.col("norm").alias("na")
    )
    vb = _as_double_vec(load_table(spark, sf_dir, "embeddings")).select(
        F.col("vec_id").alias("nbr_id"),
        F.col("vec").alias("vb"),
        F.col("norm").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # same tie discipline for the final rank: duplicate embeddings make
    # exact cosine ties common, so order by the already-quantized cosine
    exact = cand.join(va, "vec_id").join(vb, "nbr_id").select(
        "vec_id",
        "nbr_id",
        qround(dot / (F.col("na") * F.col("nb")), 4).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), "nbr_id")
    return (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PQ_V_K)
        .select("vec_id", "nbr_id", "cosine")
    )


IVFPQ_V_REFINE = 16  # ADC shortlist re-ranked exactly
IVFPQ_V_K = 3

_PQ_CODEBOOK_CACHE: dict = {}


def _pq_codebook_np():
    """The "pq" md5 grid as a (S, CODES, W) numpy array — byte-identical to
    _md5_unit_grid(spark, "pq", S*CODES, W) reshaped by the q_pq_verified
    cb mapping (code = c % CODES, s = c // CODES): hashlib.md5 and Spark's
    F.md5 agree on every byte, and the scale arithmetic is the same IEEE
    double expression, so the driver-built constant equals the SQL-built
    grid exactly. Cached per process (executors build it once)."""
    if "cb" not in _PQ_CODEBOOK_CACHE:
        import hashlib

        import numpy as np

        cb = np.empty((PQ_V_S, PQ_V_CODES, PQ_V_W), dtype="float64")
        for c in range(PQ_V_S * PQ_V_CODES):
            for d in range(PQ_V_W):
                h = hashlib.md5(f"pq:{c}:{d}".encode()).hexdigest()
                cb[c // PQ_V_CODES, c % PQ_V_CODES, d] = (
                    int(h[:4], 16) / 65535.0
                ) * 2.0 - 1.0
        _PQ_CODEBOOK_CACHE["cb"] = cb
    return _PQ_CODEBOOK_CACHE["cb"]

_IVFPQ_VERIFIED_ORACLE = f"""
    WITH cent AS ({_IVF_GRID_SQL.format(tag="ivf", n=IVF_V_C, dim=ANN_V_DIM)}),
    cnorm AS (SELECT c, sqrt(sum(val * val)) AS cn FROM cent GROUP BY c),
    ex AS (
      SELECT vec_id, unnest(range(0, len(embedding))) AS d,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    dots AS (
      SELECT vec_id, c, sum(v * val) AS dot
      FROM ex JOIN cent USING (d) GROUP BY vec_id, c
    ),
    ranked AS (
      SELECT vec_id, dots.c AS c,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dot / cn DESC, dots.c) AS rn
      FROM dots JOIN cnorm ON dots.c = cnorm.c
    ),
    assigned AS (SELECT vec_id, c AS cid FROM ranked WHERE rn = 1),
    probes AS (SELECT vec_id, c AS pc FROM ranked WHERE rn <= {IVF_V_PROBE}),
    ivfcand AS (
      SELECT p.vec_id, a.vec_id AS nbr_id
      FROM probes p JOIN assigned a ON p.pc = a.cid AND p.vec_id <> a.vec_id
    ),
    grid AS (
      {_IVF_GRID_SQL.format(tag="pq", n=PQ_V_S * PQ_V_CODES, dim=PQ_V_W)}
    ),
    cb AS (
      SELECT c % {PQ_V_CODES} AS code, c // {PQ_V_CODES} AS s,
             (c // {PQ_V_CODES}) * {PQ_V_W} + d AS dim, val
      FROM grid
    ),
    enc AS (
      SELECT e.vec_id, cb.s, cb.code,
             sum((e.v - cb.val) * (e.v - cb.val)) AS d2
      FROM ex e JOIN cb ON e.d = cb.dim
      GROUP BY e.vec_id, cb.s, cb.code
    ),
    codes AS (
      SELECT vec_id, s, code FROM (
        SELECT vec_id, s, code,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY d2, code) AS rn
        FROM enc
      ) WHERE rn = 1
    ),
    adc AS (
      SELECT c.vec_id, c.nbr_id,
             floor(sum(q.d2) * 1000000.0 + 0.5) / 1000000.0 AS adc
      FROM ivfcand c
      JOIN codes x ON x.vec_id = c.nbr_id
      JOIN enc q ON q.vec_id = c.vec_id AND q.s = x.s AND q.code = x.code
      GROUP BY c.vec_id, c.nbr_id
    ),
    shortlist AS (
      SELECT vec_id, nbr_id FROM (
        SELECT vec_id, nbr_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY adc, nbr_id) AS rn
        FROM adc
      ) WHERE rn <= {IVFPQ_V_REFINE}
    ),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM ex GROUP BY vec_id),
    cd AS (
      SELECT c.vec_id, c.nbr_id, sum(a.v * b.v) AS dot
      FROM shortlist c
      JOIN ex a ON a.vec_id = c.vec_id
      JOIN ex b ON b.vec_id = c.nbr_id AND a.d = b.d
      GROUP BY c.vec_id, c.nbr_id
    )
    SELECT vec_id, nbr_id, cosine
    FROM (
      SELECT cd.vec_id, cd.nbr_id,
             floor(cd.dot / (na.nrm * nb.nrm) * 10000.0 + 0.5) / 10000.0
               AS cosine,
             row_number() OVER (
               PARTITION BY cd.vec_id
               ORDER BY floor(cd.dot / (na.nrm * nb.nrm) * 10000.0 + 0.5)
                          / 10000.0 DESC,
                        cd.nbr_id) AS rn
      FROM cd
      JOIN norms na ON cd.vec_id = na.vec_id
      JOIN norms nb ON cd.nbr_id = nb.vec_id
    ) WHERE rn <= {IVFPQ_V_K}
"""


@_q("q_ivfpq_verified_topk", _IVFPQ_VERIFIED_ORACLE)
def q_ivfpq_verified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN with a FULL oracle gate (r11): the composition of the
    md5-grid coarse quantizer (q_ivf_verified_topk's "ivf" centroids —
    assignment + {IVF_V_PROBE}-probe candidate generation) with the
    md5-codebook ADC scorer (q_pq_verified_topk's "pq" codebooks), so
    DuckDB rebuilds the identical two-level index end-to-end: coarse
    assign → probe → list-restricted ADC shortlist → exact re-rank. This
    closes the last ANN mechanism without a hash-gated twin — the
    production q_ivfpq_topk (trained k-means + Arrow matmul ADC,
    rows-only since r3) keeps its recall pinned in tests while its
    composition mechanics are certified here.

    The composition IS the 100 TB story: PQ alone compresses memory but
    still scans all n codes per query (q_pq_verified's honest O(n²/codes)
    shape); IVF alone re-ranks raw floats. IVF-PQ probes
    {IVF_V_PROBE}/{IVF_V_C} of the lists and scores only those candidates
    with the 8-entry code gather. The ADC runs as ONE cogroup-on-centroid
    job (the q_ivf_verified rerank shape): each (probe-queries, list)
    pair meets in a numpy LUT gather — lut[q, s, code_x(s)] summed over
    subspaces, the shared-intermediate trick where for self-ANN the
    query's encoding-distance table IS its ADC lookup table — and only
    per-list partial top-{IVFPQ_V_REFINE} rows leave the kernel, so the
    shuffle after scoring is queries × probes × {IVFPQ_V_REFINE}, linear
    in the corpus (the join formulation this replaced materialized
    candidate × {PQ_V_S} shuffle rows and measured 63.9× at the 10×
    probe; this form rides the BLAS-absorption lane of q_semdedup).
    Partial-then-global top-k is lossless because both ranks share the
    one total order (quantized adc, nbr_id). Tie discipline as
    q_pq_verified: ranks compare 1e-6-quantized ADC and 1e-4-quantized
    cosine with nbr_id total tiebreaks, both bit-identical
    cross-engine."""
    import numpy as np
    import pandas as pd

    def ranked_frame() -> DataFrame:
        cent = _md5_unit_grid(spark, "ivf", IVF_V_C, ANN_V_DIM)
        cnorm = cent.groupBy("c").agg(
            F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("cn")
        )
        ex = (
            load_table(spark, sf_dir, "embeddings")
            .select("vec_id", F.posexplode("embedding").alias("d", "v"))
            .withColumn("v", F.col("v").cast("double"))
        )
        dots = (
            ex.join(F.broadcast(cent), "d")
            .groupBy("vec_id", "c")
            .agg(F.sum(F.col("v") * F.col("val")).alias("dot"))
        )
        wc = Window.partitionBy("vec_id").orderBy(
            (F.col("dot") / F.col("cn")).desc(), "c"
        )
        return dots.join(F.broadcast(cnorm), "c").withColumn(
            "rn", F.row_number().over(wc)
        )

    # r18: the coarse-assignment pipeline used to be built FRESH for each
    # cogroup side (the _block_sides ambiguous-expression-id lesson), so
    # the posexplode → centroid-dot → window ranking executed TWICE. A
    # localCheckpoint of the tiny ranked table (vec × IVF_V_PROBE rows of
    # three ints) runs it once, and the checkpoint's fresh LogicalRDD
    # leaves nothing for the analyzer's self-join dedup to confuse —
    # probes and assigned now derive from the same materialized frame.
    ranked = (
        ranked_frame()
        .filter(F.col("rn") <= IVF_V_PROBE)
        .select("vec_id", "c", "rn")
        .localCheckpoint()
    )
    probes = ranked.select("vec_id", F.col("c").alias("pc"))
    assigned = ranked.filter(F.col("rn") == 1).select(
        F.col("vec_id").alias("nbr_id"), F.col("c").alias("cid")
    )
    qside = probes.join(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
        "vec_id",
    )
    iside = assigned.join(
        load_table(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("nbr_id"), "embedding"
        ),
        "nbr_id",
    )

    def adc_cogroup(qpdf: pd.DataFrame, ipdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0 or len(ipdf) == 0:
            return _empty_pairs("adc")
        cb = _pq_codebook_np()  # (S, CODES, W)
        q_ids = qpdf["vec_id"].to_numpy()
        q_sub = (
            np.stack(qpdf["embedding"].to_numpy())
            .astype("float64")
            .reshape(len(qpdf), PQ_V_S, PQ_V_W)
        )
        i_ids = ipdf["nbr_id"].to_numpy()
        i_sub = (
            np.stack(ipdf["embedding"].to_numpy())
            .astype("float64")
            .reshape(len(ipdf), PQ_V_S, PQ_V_W)
        )
        dq = q_sub[:, :, None, :] - cb[None, :, :, :]
        lut = (dq * dq).sum(-1)  # (nq, S, CODES)
        di = i_sub[:, :, None, :] - cb[None, :, :, :]
        codes = (di * di).sum(-1).argmin(-1)  # (ni, S): first/lowest code wins
        adc = np.zeros((len(q_ids), len(i_ids)))
        for s in range(PQ_V_S):
            adc += lut[:, s, codes[:, s]]
        adcq = np.floor(adc * 1e6 + 0.5) / 1e6
        out_vec, out_nbr, out_sc = _partial_topk(
            q_ids, i_ids, -adcq, IVFPQ_V_REFINE
        )
        if not out_vec:
            return _empty_pairs("adc")
        return pd.DataFrame(
            {"vec_id": out_vec, "nbr_id": out_nbr, "adc": [-s for s in out_sc]}
        )

    partials = (
        qside.groupBy("pc")
        .cogroup(iside.groupBy("cid"))
        .applyInPandas(adc_cogroup, schema="vec_id long, nbr_id long, adc double")
    )
    wa = Window.partitionBy("vec_id").orderBy("adc", "nbr_id")
    shortlist = (
        partials.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") <= IVFPQ_V_REFINE)
        .select("vec_id", "nbr_id")
    )
    va = _as_double_vec(load_table(spark, sf_dir, "embeddings")).select(
        F.col("vec_id"), F.col("vec").alias("va"), F.col("norm").alias("na")
    )
    vb = _as_double_vec(load_table(spark, sf_dir, "embeddings")).select(
        F.col("vec_id").alias("nbr_id"),
        F.col("vec").alias("vb"),
        F.col("norm").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    exact = shortlist.join(va, "vec_id").join(vb, "nbr_id").select(
        "vec_id",
        "nbr_id",
        qround(dot / (F.col("na") * F.col("nb")), 4).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), "nbr_id")
    return (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= IVFPQ_V_K)
        .select("vec_id", "nbr_id", "cosine")
    )



def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 10,
    id_col: str = "vec_id",
    with_assignments: bool = True,
):
    """Distributed Lloyd's k-means over a vector column — the at-scale
    replacement for the driver-side sample training ivf_topk/pq_topk use
    (fine for codebooks, wrong when the corpus no longer fits a sample).

    Per iteration ONE job and NO vector ever crosses a shuffle: a
    vectorized mapInPandas fuses the argmin-distance assignment (BLAS
    tile per Arrow batch) with the per-batch partial centroid sums, so
    each batch emits at most k × dim (label, dim, sum, count) rows and
    the shuffle + driver collect carry only the k × dim aggregate (r9 —
    previously assign and update were separate jobs bridged by a per-row
    label join + posexplode of the corpus).

    Deterministic: init is farthest-point traversal over a bounded
    xxhash64-ordered sample (greedy k-center — separates well-spread
    clusters where naive first-k seeding collapses two seeds into one
    blob and Lloyd's sticks in that local optimum); empty clusters keep
    their previous centroid. Returns (centroids ndarray [k × dim],
    assignments DataFrame[id_col, label]) where the assignments are
    computed against the FINAL centroids (ADVICE r5: the in-loop
    assignment lags the update by one step), or (centroids, None) with
    with_assignments=False — callers that only want the codebook (the IVF
    coarse quantizer) then leave no lingering broadcast behind."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    n_seed = max(64 * k, 256)
    seed = (
        df.withColumn("_h", F.xxhash64(id_col))
        .orderBy("_h", id_col)
        .limit(n_seed)
        .select(vec_col)
        .toPandas()
    )
    smat = np.stack(seed[vec_col].to_numpy()).astype("float64")
    chosen = [0]
    d2min = ((smat - smat[0]) ** 2).sum(1)
    while len(chosen) < min(k, len(smat)):
        nxt = int(d2min.argmax())
        chosen.append(nxt)
        d2min = np.minimum(d2min, ((smat - smat[nxt]) ** 2).sum(1))
    cent = smat[chosen].copy()
    if len(cent) < k:  # degenerate tiny input: pad by repeating
        cent = np.resize(cent, (k, smat.shape[1]))
    dim = cent.shape[1]

    base = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    bcs = []  # per-iteration centroid broadcasts, unpersisted before return

    def make_assign(cmat):
        bc = spark.sparkContext.broadcast(cmat)
        bcs.append(bc)

        def assign(batches):
            c = bc.value
            for b in batches:
                mat = np.stack(b["_v"].to_numpy()).astype("float64")
                d2 = (mat * mat).sum(1)[:, None] - 2.0 * (mat @ c.T) + (c * c).sum(1)[None, :]
                yield pd.DataFrame(
                    {"_id": b["_id"], "label": d2.argmin(1).astype("int32")}
                )

        return assign

    for _ in range(iters):
        # fused assign + per-batch partial sums (r9, same shape as
        # pq_train_codebooks_distributed): no per-row label join, no
        # posexplode of the corpus — each Arrow batch emits at most
        # k x dim (label, i, psum, pn) rows and the shuffle + driver
        # collect carry only the k x dim aggregate
        bc = spark.sparkContext.broadcast(cent)
        bcs.append(bc)

        def partial_sums(batches, _bc=bc):
            c = _bc.value
            for b in batches:
                if len(b) == 0:
                    continue
                mat = np.stack(b["_v"].to_numpy()).astype("float64")
                d2 = (
                    (mat * mat).sum(1)[:, None]
                    - 2.0 * (mat @ c.T)
                    + (c * c).sum(1)[None, :]
                )
                lab = d2.argmin(1)
                ll, ii, vv, nn = [], [], [], []
                for lbl in np.unique(lab):
                    pts = mat[lab == lbl]
                    ll.extend([int(lbl)] * dim)
                    ii.extend(range(dim))
                    vv.extend(pts.sum(axis=0).tolist())
                    nn.extend([len(pts)] * dim)
                yield pd.DataFrame({"label": ll, "i": ii, "psum": vv, "pn": nn})

        sums = (
            base.mapInPandas(
                partial_sums, schema="label int, i int, psum double, pn long"
            )
            .groupBy("label", "i")
            .agg(F.sum("psum").alias("s"), F.sum("pn").alias("n"))
            .collect()
        )
        new = cent.copy()
        acc = {}
        for r in sums:
            acc.setdefault(r["label"], [np.zeros(dim), 0])
            acc[r["label"]][0][r["i"]] = r["s"]
            acc[r["label"]][1] = r["n"]
        for lbl, (vec, n) in acc.items():
            if n:
                new[lbl] = vec / n
        cent = new
    if not with_assignments:
        for bc in bcs:
            bc.unpersist()
        return cent, None
    # assignments against the FINAL centroids — the in-loop assignment was
    # computed before the last update and would be internally inconsistent
    # with the returned centroid matrix
    final = base.mapInPandas(make_assign(cent), schema="_id long, label int")
    for bc in bcs[:-1]:
        bc.unpersist()
    return cent, final.select(F.col("_id").alias(id_col), "label")


