"""Similarity search over embedding columns (training-data tier).

Approximate-nearest-neighbor surface for an `array<float>` embedding
column: brute-force cosine top-k as the exact baseline, and a
random-hyperplane LSH bucketed variant as the scale path (Charikar
2002 rounding scheme -- same family the reference's SimHash uses for
text, applied to vectors).

Scale shape: brute force is a broadcast probe-set x full scan (one
pass, no shuffle of the big side, top-k heap per probe via window);
LSH replaces the full scan with a bucket equi-join, trading recall
for a ~2^bits fan-in reduction. Dot products run as JVM higher-order
functions (zip_with/aggregate); the LSH projection is a numpy matmul
in an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf


from ..checkpointing import ckpt_eager, ckpt_lazy, stable_checkpoint
def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine_expr(x, y):
    return _dot(x, y) / (F.sqrt(_dot(x, x)) * F.sqrt(_dot(y, y)))


def brute_force_topk(
    embeddings: DataFrame, probes: DataFrame, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe vector.

    probes: (probe_id, embedding). Broadcast the probe side, scan the
    corpus once, window top-k per probe. Excludes self-matches by id.
    """
    e = embeddings.select(
        F.col("vec_id"),
        F.col("embedding").cast("array<double>").alias("corpus_emb"),
    )
    p = probes.select(
        F.col("probe_id"),
        F.col("embedding").cast("array<double>").alias("probe_emb"),
    )
    scored = (
        e.crossJoin(F.broadcast(p))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(cosine_expr(F.col("probe_emb"), F.col("corpus_emb")), 4).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("probe_id", "rnk")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim).astype(np.float64)


def lsh_buckets_udf(dim: int, bits: int = 8, n_tables: int = 8, seed: int = 7):
    """Multi-table random-hyperplane signatures: for each of L tables,
    a sign-bit pack of H_l @ v, tagged with the table id so buckets
    from different tables never collide. One numpy matmul per Arrow
    batch. Returns array<long> of length n_tables.

    Multiple tables are the standard recall lever (Indyk-Motwani
    LSH): candidate recall = 1 - (1 - p^bits)^n_tables, with
    p = 1 - theta/pi per hyperplane.
    """
    planes = _hyperplanes(dim, bits * n_tables, seed)  # [L*b, dim]

    @pandas_udf("array<long>")
    def _udf(embs: pd.Series) -> pd.Series:
        if len(embs) == 0:  # empty Arrow batch: np.stack would raise
            return pd.Series([], dtype="object")
        mat = np.stack(embs.to_numpy())  # [batch, dim]
        signs = (mat @ planes.T) > 0  # [batch, L*b]
        signs = signs.reshape(len(mat), n_tables, bits)
        weights = 1 << np.arange(bits, dtype=np.int64)
        codes = signs @ weights  # [batch, L]
        # tag with table index in high bits so tables don't collide
        tagged = codes + (np.arange(n_tables, dtype=np.int64) << 32)
        return pd.Series(list(tagged))

    return _udf


def lsh_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 5,
    bits: int = 8,
    n_tables: int = 8,
    seed: int = 7,
) -> DataFrame:
    """ANN top-k: candidates share >= 1 of the probe's L LSH buckets,
    then exact cosine re-rank. Recall < 1 by design; measured against
    brute_force_topk in tests (raise n_tables / lower bits for
    recall, the reverse for throughput)."""
    bucket = lsh_buckets_udf(dim, bits, n_tables, seed)
    e = embeddings.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("corpus_emb"),
        F.explode(bucket(F.col("embedding"))).alias("bucket"),
    )
    p = probes.select(
        "probe_id",
        F.col("embedding").cast("array<double>").alias("probe_emb"),
        F.explode(bucket(F.col("embedding"))).alias("bucket"),
    )
    scored = (
        e.join(F.broadcast(p), "bucket")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(cosine_expr(F.col("probe_emb"), F.col("corpus_emb")), 4).alias(
                "cosine"
            ),
        )
        .dropDuplicates(["probe_id", "vec_id"])
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("probe_id", "rnk")
    )


def md5_hyperplane_signs(
    dim: int, bits: int, n_tables: int
) -> dict[tuple[int, int], list[int]]:
    """Deterministic +-1 hyperplane components from md5: component
    (t, b, d) is the low-bit parity of md5("hp_t_b_d")'s leading 15
    hex chars. md5 is the one hash every engine evaluates identically,
    so an oracle can re-derive the exact planes from SQL -- the same
    trick the md5 simhash/minhash dedupe twins use."""
    import hashlib

    return {
        (t, b): [
            1
            if int(
                hashlib.md5(f"hp_{t}_{b}_{d}".encode()).hexdigest()[:15], 16
            )
            % 2
            == 1
            else -1
            for d in range(dim)
        ]
        for t in range(n_tables)
        for b in range(bits)
    }


_QUANT = 1_000_000.0  # fixed-point scale: sign decisions become exact


def _quantize(emb):
    # floor(v*1e6 + 0.5) as bigint: the per-bit dot product is then
    # integer arithmetic, so its SIGN is independent of summation order
    # and engine float quirks (the float dot's last ulp is not). floor
    # instead of round() because engines disagree on .5 ties (HALF_UP
    # vs half-even vs away-from-zero); floor(x+0.5) is one definition
    # every engine evaluates identically
    return F.transform(
        emb.cast("array<double>"),
        lambda v: F.floor(v * F.lit(_QUANT) + F.lit(0.5)).cast("bigint"),
    )


def md5_lsh_buckets_udf(dim: int, bits: int, n_tables: int):
    """array<long> of n_tables md5-plane bucket keys per vector --
    the fast path. One int64 numpy matmul per Arrow batch: quantize
    floor(v*1e6+0.5) to int64, dot against the +-1 sign matrix in
    integer arithmetic (exact, order-independent), sign-bit pack, tag
    with the table id. Bit-identical to md5_lsh_buckets_from_quantized
    (asserted in tests) and therefore to the SQL oracle, without the
    48-aggregate Catalyst expression tree whose analysis time dwarfs
    the data at any row count."""
    signs = md5_hyperplane_signs(dim, bits, n_tables)
    S = np.array(
        [signs[(t, b)] for t in range(n_tables) for b in range(bits)],
        dtype=np.int64,
    )  # [n_tables*bits, dim]

    @pandas_udf("array<long>")
    def _udf(embs: pd.Series) -> pd.Series:
        if len(embs) == 0:
            return pd.Series([], dtype="object")
        X = np.asarray(embs.tolist(), dtype=np.float64)
        Q = np.floor(X * _QUANT + 0.5).astype(np.int64)
        dots = Q @ S.T  # exact int64, [batch, n_tables*bits]
        pos = (dots > 0).reshape(len(Q), n_tables, bits)
        weights = 1 << np.arange(bits, dtype=np.int64)
        codes = pos @ weights + (np.arange(n_tables, dtype=np.int64) << 32)
        return pd.Series(list(codes))

    return _udf


def md5_lsh_buckets_from_quantized(
    qcol, dim: int, bits: int, n_tables: int
):
    """Reference implementation of the md5-plane bucket keys as pure
    Column expressions (zip_with/aggregate) -- semantically the
    oracle's SQL, kept as the parity anchor for md5_lsh_buckets_udf.
    Bucket = sign-bit pack of the per-hyperplane integer dots, tagged
    with the table id in the high bits."""
    signs = md5_hyperplane_signs(dim, bits, n_tables)
    buckets = []
    for t in range(n_tables):
        terms = []
        for b in range(bits):
            sarr = F.array(*[F.lit(s) for s in signs[(t, b)]])
            dot = F.aggregate(
                F.zip_with(qcol, sarr, lambda x, s: x * s),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            )
            terms.append(
                F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0))
            )
        bucket = sum(terms[1:], terms[0]) + F.lit(t * (1 << 32))
        buckets.append(bucket.cast("bigint"))
    return F.array(*buckets)


def md5_lsh_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    dim: int = 64,
    k: int = 5,
    bits: int = 6,
    n_tables: int = 8,
) -> DataFrame:
    """Hash-checkable ANN: multi-table random-hyperplane LSH candidate
    generation + exact cosine re-rank, with md5-derived planes and
    integer-quantized sign decisions so a SQL oracle replays the exact
    candidate set (lsh_topk with numpy planes stays the perf path,
    recall-gated in pytest).

    Scale shape: bucket computation is a per-row projection (no
    shuffle), the probe side broadcasts, and the only join is a bucket
    equi-join -- the corpus is never shuffled or cross-joined.
    Reference parity: SimHash-style Charikar rounding applied to
    vectors (the reference's SimHash.java computes the same sign-bit
    pack over token hashes)."""
    bucket = md5_lsh_buckets_udf(dim, bits, n_tables)
    e = embeddings.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("corpus_emb"),
        F.explode(bucket(F.col("embedding"))).alias("bucket"),
    )
    p = probes.select(
        "probe_id",
        F.col("embedding").cast("array<double>").alias("probe_emb"),
        F.explode(bucket(F.col("embedding"))).alias("bucket"),
    )
    scored = (
        e.join(F.broadcast(p), "bucket")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(
                cosine_expr(F.col("probe_emb"), F.col("corpus_emb")), 4
            ).alias("cosine"),
        )
        .dropDuplicates(["probe_id", "vec_id"])
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("probe_id", "rnk")
    )


def _argmax_cell(cents: list[list[float]]):
    """Map-only max-cosine cell assignment against driver-resident
    centroids (1-indexed; ties break toward the lower cell via
    argmax-first-occurrence). Arrow-batched numpy matmul: one
    (batch x dim) @ (dim x k) product per batch -- the embedding-tier
    kernel shape, vs. a k*dim-literal Catalyst expression tree whose
    codegen time dwarfs the data at any batch size."""
    C = np.asarray(cents, dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)

    @pandas_udf("int")
    def assign(embs: pd.Series) -> pd.Series:
        X = np.asarray(embs.tolist(), dtype=np.float64)
        if X.size == 0:
            return pd.Series([], dtype="int32")
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
        return pd.Series((np.argmax(Xn @ Cn.T, axis=1) + 1).astype("int32"))

    return assign


KMEANS_QUANT_OFFSET = 1 << 20  # shifts micro-unit coords nonnegative


def kmeans_exact(
    embeddings: DataFrame,
    k: int = 8,
    max_iterations: int = 15,
    eps: int = 10_000,
) -> DataFrame:
    """Fully DISTRIBUTED Lloyd's k-means in exact integer arithmetic,
    run to convergence: (vec_id, cluster, iterations).

    Unlike kmeans_cells (driver-side training on a bounded sample --
    the IVF-quantizer posture), every step here is a Catalyst plan
    over the full corpus: assignment is an exploded (vec_id, dim, q)
    long table joined against the broadcast k x dim centroid table
    (O(n*k*d) rows, the irreducible Lloyd cost), and the centroid
    update is one groupBy(cluster, dim). Termination reuses the
    Observation discipline of pagerank_converged/_star_contraction:
    each iteration's own checkpoint job observes
    max|centroid_t - centroid_{t-1}|, and the loop stops at the exact
    integer fixpoint (delta 0) -- zero extra actions per iteration.

    Exactness disciplines: coordinates quantize to micro-units
    (floor(x*1e6 + 0.5)) shifted by KMEANS_QUANT_OFFSET so every
    value is nonnegative (truncating vs flooring integer division can
    never diverge across engines) -- valid for coordinates >=
    -KMEANS_QUANT_OFFSET/1e6 (~-1.048); anything below RAISES via an
    in-projection assert_true rather than silently voiding the
    invariant; distances are exact bigint
    sums of squared differences (offset-invariant); ties in the
    argmin break to the LOWEST cluster id via struct-min ordering;
    centroid means are truncating integer division; an empty cluster
    keeps its previous centroid. The whole trajectory is therefore
    bit-identical under any partitioning or engine -- the oracle
    unrolls the same iterations in SQL and hash-matches.
    """
    from pyspark.sql import Observation

    if k < 1:
        raise ValueError("k must be >= 1")
    lim = float(KMEANS_QUANT_OFFSET) / 1e6
    pts = (
        embeddings.select(
            "vec_id", F.posexplode("embedding").alias("dim", "val")
        )
        .select(
            "vec_id",
            "dim",
            (
                F.floor(
                    # assert_true rides inside the projection: a
                    # coordinate below -offset/1e6 would make q
                    # negative and silently void the trunc==floor
                    # division invariant -- fail loudly instead
                    F.when(
                        F.assert_true(
                            F.col("val").cast("double") >= F.lit(-lim),
                            F.concat(
                                F.lit(
                                    "kmeans_exact: coordinate below "
                                    f"-{lim} breaks the nonnegative "
                                    "quantization invariant: "
                                ),
                                F.col("val").cast("string"),
                            ),
                        ).isNull(),
                        F.col("val").cast("double") * 1e6 + F.lit(0.5),
                    )
                )
                .cast("long")
                + F.lit(KMEANS_QUANT_OFFSET)
            ).alias("q"),
        )
        .transform(ckpt_lazy)  # loop-invariant (r10: an eager+scoped
        # variant was tried and reverted -- see pq_topk's note)
    )
    # deterministic seeds: the k lowest vec_ids ARE the initial
    # centroids (cluster id = seed rank)
    seeds = (
        embeddings.select("vec_id")
        .orderBy("vec_id")
        .limit(k)
        .withColumn(
            "cid",
            F.row_number().over(Window.orderBy("vec_id")).cast("int") - 1,
        )
    )
    cents = (
        pts.join(F.broadcast(seeds), "vec_id")
        .select("cid", "dim", F.col("q").alias("c"))
        .transform(ckpt_eager)
    )

    assign = None
    iterations = 0
    for _ in range(max_iterations):
        dists = (
            pts.join(F.broadcast(cents), "dim")
            .groupBy("vec_id", "cid")
            .agg(
                F.sum(
                    (F.col("q") - F.col("c")) * (F.col("q") - F.col("c"))
                ).alias("dist")
            )
        )
        assign = (
            dists.groupBy("vec_id")
            .agg(F.min(F.struct("dist", "cid")).alias("m"))
            .select("vec_id", F.col("m.cid").alias("cluster"))
        )
        new = (
            assign.join(pts, "vec_id")
            .groupBy(F.col("cluster").alias("cid"), F.col("dim"))
            .agg(F.expr("sum(q) DIV count(1)").alias("cn"))
        )
        obs = Observation()
        cents = (
            cents.join(new, ["cid", "dim"], "left")
            .select(
                "cid",
                "dim",
                F.col("c").alias("_prev"),
                # empty cluster keeps its previous centroid
                F.coalesce("cn", "c").alias("c"),
            )
            .observe(
                obs, F.max(F.abs(F.col("c") - F.col("_prev"))).alias("delta")
            )
            .select("cid", "dim", "c")
            .transform(ckpt_eager)
        )
        iterations += 1
        delta = obs.get["delta"]
        # eps in micro-units: truncating integer means can oscillate
        # by a unit or two around the fixpoint, so a small eps stops
        # at "centroids moved by <= eps * 1e-6 in every coordinate"
        if delta is None or delta <= eps:
            break
    return (
        assign.select(
            "vec_id",
            "cluster",
            F.lit(iterations).cast("int").alias("iterations"),
        )
        .orderBy("vec_id")
    )


def kmeans_cells(
    embeddings: DataFrame,
    k: int = 16,
    iterations: int = 3,
    train_sample: int = 8192,
) -> DataFrame:
    """Deterministic k-means-lite coarse quantizer: (vec_id, cell).

    IVF practice at scale (Jegou et al. 2011; FAISS trains the coarse
    quantizer the same way): Lloyd's iterations run driver-side on a
    bounded deterministic sample -- the k x dim centroid matrix is tiny
    at any corpus size -- and the full corpus is then assigned in ONE
    distributed map (Arrow-batched matmul), with no per-iteration
    cluster jobs at all. Seeds are the k lowest vec_ids and the sample
    is the train_sample lowest vec_ids: reproducible without RNG
    state. Assignment: max cosine; centroid: element-wise mean of raw
    member vectors; empty cells keep their previous centroid.
    """
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    sample = e.orderBy("vec_id").limit(train_sample).collect()
    if not sample:
        raise ValueError(
            "kmeans_cells: embeddings table is empty; cannot train cells"
        )
    X = np.asarray([r.emb for r in sample], dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
    C = X[:k].copy()
    for _ in range(iterations):
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
        a = np.argmax(Xn @ Cn.T, axis=1)
        for i in range(k):
            members = X[a == i]
            if len(members):
                C[i] = members.mean(axis=0)
    return e.withColumn(
        "cell", _argmax_cell([list(c) for c in C])(F.col("emb"))
    ).select("vec_id", "cell")


def ivf_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    cells: DataFrame | None = None,
    n_cells: int = 16,
) -> DataFrame:
    """IVF-style ANN: coarse cells -> probe nearest n_probe cells ->
    exact re-rank inside them.

    The inverted-file layout (Jegou et al. 2011, "Product
    quantization for nearest neighbor search" -- the IVF part, no PQ):
    corpus vectors are bucketed by a coarse cell id (kmeans_cells by
    default, or any caller-provided (vec_id, cell) assignment), a
    tiny centroid table is broadcast, each probe picks its n_probe
    closest centroids, and the exact cosine scan touches only those
    cells: ~n_probe/n_cells of the corpus instead of all of it.
    Recall < 1 by design; measured against brute_force_topk in tests.
    """
    if cells is None:
        cells = kmeans_cells(embeddings, k=n_cells)
    # checkpoint: e feeds both the centroid table and the candidate
    # scan -- without it the cell-assignment UDF lineage runs twice
    e = (
        embeddings.join(cells, "vec_id")
        .select(
            "vec_id",
            "cell",
            F.col("embedding").cast("array<double>").alias("corpus_emb"),
        )
        .transform(ckpt_lazy)
    )
    # centroid table: tiny by construction (one row per cell); means
    # come from exact decimal sums so the table -- and therefore probe
    # routing -- is deterministic under any partitioning (same
    # discipline as pairwise_label_centroids)
    exploded = e.select("cell", F.posexplode("corpus_emb").alias("pos", "val"))
    centroids = (
        exploded.groupBy("cell", "pos")
        .agg(
            F.round(
                F.sum(F.col("val").cast("decimal(18,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_val")
        )
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mean_val"))).alias("cs"))
        .select("cell", F.transform("cs", lambda s: s["mean_val"]).alias("centroid"))
    )
    p = probes.select(
        "probe_id", F.col("embedding").cast("array<double>").alias("probe_emb")
    )
    # probe -> its n_probe nearest cells (broadcast the centroid table)
    cell_rank = Window.partitionBy("probe_id").orderBy(
        F.col("cell_cos").desc(), F.col("cell")
    )
    probe_cells = (
        p.crossJoin(F.broadcast(centroids))
        .withColumn(
            "cell_cos",
            F.round(cosine_expr(F.col("probe_emb"), F.col("centroid")), 6),
        )
        .withColumn("crk", F.row_number().over(cell_rank))
        .filter(F.col("crk") <= n_probe)
        .select("probe_id", "probe_emb", "cell")
    )
    scored = (
        e.join(F.broadcast(probe_cells), "cell")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(cosine_expr(F.col("probe_emb"), F.col("corpus_emb")), 4).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("probe_id", "rnk")
    )


def pairwise_label_centroids(embeddings: DataFrame) -> DataFrame:
    """Per-label centroid summary (squared norm of the element-wise
    mean, plus dimension count) -- the aggregate shape used to audit
    IVF coarse quantizers. Pure JVM: element-wise array aggregation
    via posexplode + groupBy position."""
    exploded = embeddings.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "val")
    )
    # mean from an exact decimal sum (order-independent; see
    # functions/numeric.py); float32 -> decimal(18,9) is a per-value
    # deterministic rounding, never an exact tie (5e-10 is not dyadic)
    per_pos = exploded.groupBy("label", "pos").agg(
        F.round(
            F.sum(F.col("val").cast("decimal(18,9)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_val")
    )
    # rounded-6 means are exact as decimal(12,6): the squared-norm sum
    # is exact too, so round(.,4) can't flip on accumulation order
    mv = F.col("mean_val").cast("decimal(12,6)")
    return (
        per_pos.groupBy("label")
        .agg(
            F.round(F.sum(mv * mv), 4).cast("double").alias("centroid_sq_norm"),
            F.count(F.lit(1)).alias("dims"),
        )
        .orderBy("label")
    )


def _pq_quantized_points(embeddings: DataFrame, m_subspaces: int) -> DataFrame:
    """(vec_id, dim, sub, q): micro-unit nonnegative-shifted integer
    coordinates with the subspace key -- the shared encode input for
    pq_topk and ivfpq_topk. Asserts the kmeans quantization bound."""
    lim = float(KMEANS_QUANT_OFFSET) / 1e6
    d = embeddings.select(F.size("embedding")).first()[0]  # bounded peek
    if d % m_subspaces != 0:
        raise ValueError("embedding dim must divide into m_subspaces")
    sub_dim = d // m_subspaces
    return embeddings.select(
        "vec_id", F.posexplode("embedding").alias("dim", "val")
    ).select(
        "vec_id",
        "dim",
        (F.col("dim") / sub_dim).cast("int").alias("sub"),
        (
            F.floor(
                F.when(
                    F.assert_true(
                        F.col("val").cast("double") >= F.lit(-lim),
                        F.concat(
                            F.lit(
                                "pq quantize: coordinate below "
                                f"-{lim} breaks the nonnegative "
                                "quantization invariant: "
                            ),
                            F.col("val").cast("string"),
                        ),
                    ).isNull(),
                    F.col("val").cast("double") * 1e6 + F.lit(0.5),
                )
            ).cast("long")
            + F.lit(KMEANS_QUANT_OFFSET)
        ).alias("q"),
    )


def pq_topk(
    embeddings: DataFrame,
    m_subspaces: int = 4,
    n_codes: int = 16,
    n_probes: int = 10,
    top_k: int = 5,
    train_iterations: int = 0,
    eps: int = 10_000,
) -> DataFrame:
    """Product-quantization ANN (Jegou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split each vector into
    m contiguous subspaces, encode every subspace to one of n_codes
    codewords, and answer queries by Asymmetric Distance Computation
    -- a per-probe (subspace, code) lookup table summed over the m
    codes. This is THE memory-side ANN scale path: a 64-dim float
    corpus becomes m small codes per vector (here 4 bytes vs 256),
    and the scan never touches raw vectors.

    Codebooks start as deterministic ANCHORS -- the n_codes lowest
    vec_ids' sub-vectors, the same seeding rule as kmeans_exact --
    and `train_iterations > 0` refines them with exact-integer
    Lloyd's run over ALL m subspaces in ONE composed plan per
    iteration (subspace is just an extra grouping key: assignment is
    an argmin per (vec_id, sub), the update one
    groupBy(sub, code, dim), and the global max centroid delta rides
    each iteration's own checkpoint job via Observation -- the
    kmeans_exact discipline, m quantizers for the price of one loop).
    Both variants are closed-form-deterministic and hash-gateable:
    the oracle unrolls the same refinement in SQL.

    Exactness: kmeans_exact's quantization discipline (micro-units
    shifted nonnegative by KMEANS_QUANT_OFFSET, assert on the bound),
    exact-bigint squared distances, argmin ties to the lowest code,
    ranking ties to the lowest vec_id -- bit-identical on any engine
    or partitioning.

    Scale shape: the codebook (m*n_codes*d rows) and the probe
    distance tables (n_probes*m*n_codes rows) broadcast; the corpus
    is touched twice -- once to encode (the irreducible O(n*k*d)
    join, same cost class as one Lloyd assignment pass), once as the
    encoded (vec_id, sub, code) table joined against the broadcast
    tables; the ADC rollup groups m rows per (probe, vector). No
    raw-vector shuffle anywhere past the encode stage.

    Output: (probe_id, vec_id, adc_dist, rnk).
    """
    pts = _pq_quantized_points(embeddings, m_subspaces)
    seeds = (
        embeddings.select("vec_id")
        .orderBy("vec_id")
        .limit(n_codes)
        .withColumn(
            "code",
            F.row_number().over(Window.orderBy("vec_id")).cast("int") - 1,
        )
    )
    book = pts.join(F.broadcast(seeds), "vec_id").select(
        "sub", "code", "dim", F.col("q").alias("cq")
    )
    if train_iterations > 0:
        from pyspark.sql import Observation

        # loop-invariant: don't replay the explode+quantize lineage
        # once per Lloyd iteration. (r10 tried three restructures here
        # and REVERTED all: eager pts + a row-sized small_state_scope
        # was a wash that cost one extra materialization job, and
        # batching 2 Lloyd steps per checkpoint job -- the round-9
        # verdict's item-4 hypothesis -- measured WORSE, 7.3/8.5 s vs
        # 6.0/6.9 min/med, because the doubled per-job plan's analysis
        # and codegen cost more than the saved job overhead; books
        # bit-identical in all arms. OPTIMIZATION_r10.md has the A/Bs.)
        pts = pts.transform(ckpt_lazy)
        book = book.transform(ckpt_eager)
        for _ in range(train_iterations):
            dists = (
                pts.join(F.broadcast(book), ["sub", "dim"])
                .groupBy("vec_id", "sub", "code")
                .agg(
                    F.sum(
                        (F.col("q") - F.col("cq"))
                        * (F.col("q") - F.col("cq"))
                    ).alias("dist")
                )
            )
            assign = (
                dists.groupBy("vec_id", "sub")
                .agg(F.min(F.struct("dist", "code")).alias("m"))
                .select("vec_id", "sub", F.col("m.code").alias("code"))
            )
            new = (
                assign.join(pts, ["vec_id", "sub"])
                .groupBy("sub", "code", "dim")
                .agg(F.expr("sum(q) DIV count(1)").alias("cn"))
            )
            obs = Observation()
            book = (
                book.join(new, ["sub", "code", "dim"], "left")
                .select(
                    "sub",
                    "code",
                    "dim",
                    F.col("cq").alias("_prev"),
                    # empty codeword keeps its previous centroid
                    F.coalesce("cn", "cq").alias("cq"),
                )
                .observe(
                    obs,
                    F.max(F.abs(F.col("cq") - F.col("_prev"))).alias(
                        "delta"
                    ),
                )
                .select("sub", "code", "dim", "cq")
                .transform(ckpt_eager)
            )
            delta = obs.get["delta"]
            if delta is None or delta <= eps:
                break

    def _nearest(points: DataFrame, id_col: str) -> DataFrame:
        """(id, sub, code, dist) for the argmin codeword per (id, sub),
        and the full distance rows -- exact bigint sums."""
        return (
            points.join(F.broadcast(book), ["sub", "dim"])
            .groupBy(id_col, "sub", "code")
            .agg(
                F.sum(
                    (F.col("q") - F.col("cq")) * (F.col("q") - F.col("cq"))
                ).alias("dist")
            )
        )

    codes = (
        _nearest(pts, "vec_id")
        .groupBy("vec_id", "sub")
        .agg(F.min(F.struct("dist", "code")).alias("m"))
        .select("vec_id", "sub", F.col("m.code").alias("code"))
    )
    tabs = _nearest(
        pts.filter(F.col("vec_id") < n_probes).withColumnRenamed(
            "vec_id", "probe_id"
        ),
        "probe_id",
    ).withColumnRenamed("dist", "pdist")
    adc = (
        codes.join(F.broadcast(tabs), ["sub", "code"])
        .filter(F.col("vec_id") != F.col("probe_id"))
        .groupBy("probe_id", "vec_id")
        .agg(F.sum("pdist").alias("adc_dist"))
    )
    w = Window.partitionBy("probe_id").orderBy("adc_dist", "vec_id")
    return (
        adc.select(
            "probe_id",
            "vec_id",
            "adc_dist",
            F.row_number().over(w).cast("int").alias("rnk"),
        )
        .filter(F.col("rnk") <= top_k)
        .orderBy("probe_id", "rnk")
    )


def sq_topk(
    embeddings: DataFrame,
    n_probes: int = 10,
    top_k: int = 5,
    levels: int = 256,
) -> DataFrame:
    """Scalar-quantization ANN (the FAISS SQ8 scan): compress each
    dimension to one of `levels` codes against per-dimension corpus
    min/max, answer queries by exact distances to the RECONSTRUCTED
    (dequantized) vectors while probes stay full-precision -- the
    asymmetric trick that keeps SQ recall high. Completes the
    quantization family next to PQ (pq_topk): SQ is the simpler
    memory-side path (d bytes/vector, no codebook training) that
    production systems reach for before PQ's stronger compression.

    Exactness: coordinates quantize to micro-units shifted
    nonnegative (the kmeans_exact discipline), per-dim min/max are
    exact bigints, the code is ((q - mn) * (levels-1)) DIV
    max(mx - mn, 1) and reconstruction mn + (code * (mx - mn)) DIV
    (levels-1) -- every step truncating nonnegative integer
    arithmetic, so distances (and therefore ranks, ties to the
    lowest vec_id) are bit-identical across engines and layouts.

    Scale shape: one groupBy(dim) builds the d-row stats table
    (broadcast); encode is a map-side join against it; the scan joins
    the encoded corpus with the broadcast probe rows on dim and
    groups per (probe, vector) -- the same linear-scan cost class as
    brute force but over codes, which is exactly SQ's deal (compress
    memory, keep the scan). Output: (probe_id, vec_id, sq_dist, rnk).
    """
    lim = float(KMEANS_QUANT_OFFSET) / 1e6
    lv = levels - 1
    pts = embeddings.select(
        "vec_id", F.posexplode("embedding").alias("dim", "val")
    ).select(
        "vec_id",
        "dim",
        (
            F.floor(
                F.when(
                    F.assert_true(
                        F.col("val").cast("double") >= F.lit(-lim),
                        F.concat(
                            F.lit(
                                "sq_topk: coordinate below "
                                f"-{lim} breaks the nonnegative "
                                "quantization invariant: "
                            ),
                            F.col("val").cast("string"),
                        ),
                    ).isNull(),
                    F.col("val").cast("double") * 1e6 + F.lit(0.5),
                )
            ).cast("long")
            + F.lit(KMEANS_QUANT_OFFSET)
        ).alias("q"),
    )
    stats = pts.groupBy("dim").agg(
        F.min("q").alias("mn"), F.max("q").alias("mx")
    )
    recon = pts.join(F.broadcast(stats), "dim").select(
        "vec_id",
        "dim",
        (
            F.col("mn")
            + F.expr(
                f"((q - mn) * {lv} DIV greatest(mx - mn, 1)) * (mx - mn)"
                f" DIV {lv}"
            )
        ).alias("r"),
    )
    probes = pts.filter(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("probe_id"), "dim", F.col("q").alias("pq")
    )
    dists = (
        recon.join(F.broadcast(probes), "dim")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .groupBy("probe_id", "vec_id")
        .agg(
            F.sum(
                (F.col("pq") - F.col("r")) * (F.col("pq") - F.col("r"))
            ).alias("sq_dist")
        )
    )
    w = Window.partitionBy("probe_id").orderBy("sq_dist", "vec_id")
    return (
        dists.select(
            "probe_id",
            "vec_id",
            "sq_dist",
            F.row_number().over(w).cast("int").alias("rnk"),
        )
        .filter(F.col("rnk") <= top_k)
        .orderBy("probe_id", "rnk")
    )


def ivfpq_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    cells: DataFrame | None = None,
    m_subspaces: int = 4,
    n_codes: int = 16,
    n_probe: int = 2,
    top_k: int = 5,
) -> DataFrame:
    """IVF-PQ: the full Jegou et al. 2011 system and the standard
    billion-scale ANN shape (Faiss IVFPQ) -- a coarse inverted file
    prunes the corpus to `n_probe` cells per probe, and product-
    quantization ADC ranks WITHIN the probed cells, so the scan
    touches ~n_probe/n_cells of the corpus and never a raw vector.

    `cells` is any (vec_id, cell) coarse assignment (kmeans_cells in
    production; the gate passes the label column, the same contract
    ivf_topk documents). Probe routing reuses ivf_topk's discipline:
    exact-decimal cell centroids, cosine to centroid rounded at 1e-6,
    top n_probe cells. Fine ranking reuses pq_topk's: anchor
    codebooks, exact-bigint ADC, ties to the lowest code/vec_id --
    the whole pipeline is deterministic and hash-gateable.

    Scale shape: centroid + codebook + probe-ADC tables all
    broadcast; the corpus is touched once to encode (the O(n*k*d)
    join PQ always pays) and once as the coded (vec_id, sub, code)
    table, pre-filtered by the inverted-list join BEFORE the ADC
    rollup -- the candidate set, not the corpus, pays the m-row
    lookup. This is the composition the separate sim_ivf_topk /
    sim_pq_topk gates each cover half of.

    Output: (probe_id, vec_id, adc_dist, rnk).
    """
    if cells is None:
        cells = kmeans_cells(embeddings, k=16)
    pts = _pq_quantized_points(embeddings, m_subspaces).transform(ckpt_lazy)
    seeds = (
        embeddings.select("vec_id")
        .orderBy("vec_id")
        .limit(n_codes)
        .withColumn(
            "code",
            F.row_number().over(Window.orderBy("vec_id")).cast("int") - 1,
        )
    )
    book = pts.join(F.broadcast(seeds), "vec_id").select(
        "sub", "code", "dim", F.col("q").alias("cq")
    )

    def _nearest(points: DataFrame, id_col: str) -> DataFrame:
        return (
            points.join(F.broadcast(book), ["sub", "dim"])
            .groupBy(id_col, "sub", "code")
            .agg(
                F.sum(
                    (F.col("q") - F.col("cq")) * (F.col("q") - F.col("cq"))
                ).alias("dist")
            )
        )

    codes = (
        _nearest(pts, "vec_id")
        .groupBy("vec_id", "sub")
        .agg(F.min(F.struct("dist", "code")).alias("m"))
        .select("vec_id", "sub", F.col("m.code").alias("code"))
    )
    # coarse routing: exact-decimal centroids of the provided cells,
    # cosine at 1e-6 -- identical to ivf_topk
    e = embeddings.join(cells, "vec_id").select(
        "vec_id",
        "cell",
        F.col("embedding").cast("array<double>").alias("corpus_emb"),
    )
    exploded = e.select("cell", F.posexplode("corpus_emb").alias("pos", "val"))
    centroids = (
        exploded.groupBy("cell", "pos")
        .agg(
            F.round(
                F.sum(F.col("val").cast("decimal(18,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_val")
        )
        .groupBy("cell")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "mean_val"))).alias(
                "cs"
            )
        )
        .select(
            "cell", F.transform("cs", lambda s: s["mean_val"]).alias("centroid")
        )
    )
    p = probes.select(
        "probe_id", F.col("embedding").cast("array<double>").alias("probe_emb")
    )
    cell_rank = Window.partitionBy("probe_id").orderBy(
        F.col("cell_cos").desc(), F.col("cell")
    )
    routed = (
        p.crossJoin(F.broadcast(centroids))
        .withColumn(
            "cell_cos",
            F.round(cosine_expr(F.col("probe_emb"), F.col("centroid")), 6),
        )
        .withColumn("crk", F.row_number().over(cell_rank))
        .filter(F.col("crk") <= n_probe)
        .select("probe_id", "cell")
    )
    # probe ADC tables from the probes' own quantized coordinates
    ppts = _pq_quantized_points(
        probes.select(F.col("probe_id").alias("vec_id"), "embedding"),
        m_subspaces,
    ).withColumnRenamed("vec_id", "probe_id")
    tabs = (
        ppts.join(F.broadcast(book), ["sub", "dim"])
        .groupBy("probe_id", "sub", "code")
        .agg(
            F.sum(
                (F.col("q") - F.col("cq")) * (F.col("q") - F.col("cq"))
            ).alias("pdist")
        )
    )
    cand = (
        codes.join(e.select("vec_id", "cell"), "vec_id")
        .join(F.broadcast(routed), "cell")
        .filter(F.col("vec_id") != F.col("probe_id"))
    )
    adc = (
        cand.join(F.broadcast(tabs), ["probe_id", "sub", "code"])
        .groupBy("probe_id", "vec_id")
        .agg(F.sum("pdist").alias("adc_dist"))
    )
    w = Window.partitionBy("probe_id").orderBy("adc_dist", "vec_id")
    return (
        adc.select(
            "probe_id",
            "vec_id",
            "adc_dist",
            F.row_number().over(w).cast("int").alias("rnk"),
        )
        .filter(F.col("rnk") <= top_k)
        .orderBy("probe_id", "rnk")
    )


def hard_negative_mining(
    embeddings: DataFrame, anchors: DataFrame, k: int = 5
) -> DataFrame:
    """Contrastive-training hard negatives: for each anchor, the top-k
    most-cosine-similar corpus vectors with a DIFFERENT label -- the
    standard mining step for embedding/reranker training (the
    negatives that are hard BECAUSE they are close). Same plan shape
    as brute_force_topk (broadcast the anchor side, one corpus scan,
    window top-k), plus the label-inequality predicate pushed into
    the scan filter so same-class pairs never reach the scorer.

    anchors: (probe_id, embedding, label). Output: (probe_id,
    anchor_label, vec_id, neg_label, cosine, rnk).

    Scale: the corpus side streams (never collected); at billion-row
    corpora swap the broadcast cross join for the IVF routing in
    ivf_topk with the same label filter -- mining quality degrades
    only by IVF recall.
    """
    e = embeddings.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("corpus_emb"),
        F.col("label").alias("neg_label"),
    )
    p = anchors.select(
        "probe_id",
        F.col("embedding").cast("array<double>").alias("probe_emb"),
        F.col("label").alias("anchor_label"),
    )
    scored = (
        e.crossJoin(F.broadcast(p))
        .filter(
            (F.col("vec_id") != F.col("probe_id"))
            & (F.col("neg_label") != F.col("anchor_label"))
        )
        .select(
            "probe_id",
            "anchor_label",
            "vec_id",
            "neg_label",
            F.round(
                cosine_expr(F.col("probe_emb"), F.col("corpus_emb")), 4
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("probe_id", "rnk")
    )
