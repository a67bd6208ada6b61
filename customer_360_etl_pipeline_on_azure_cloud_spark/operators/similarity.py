"""Similarity search over embedding columns (array<float>).

Two paths, per the standard ANN playbook:

* brute-force cosine top-k — exact baseline. Shape: broadcast the query
  set, map over the corpus (no corpus shuffle), then a per-query top-k.
  Linear in |corpus| x |queries|; right whenever queries are few or as
  the verification oracle.
* LSH-bucketed (random hyperplane / SRP) — the scale path: sign-bit
  signatures bucket the corpus; candidates come from same-bucket
  equi-joins (plus optional multiprobe), then exact re-ranking on the
  small candidate set. Sub-linear candidate generation, tunable recall.

The dot product is a sequential fold over array<double> (zip_with +
aggregate) — built-in expressions, JVM-side, and the same reduction order
as DuckDB's list_dot_product so oracle comparisons are exact.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _as_double(c: Column) -> Column:
    return c.cast("array<double>")


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    from .util import spread

    v = _as_double(F.col(vec_col))
    return spread(df).withColumn("__vec", v).withColumn("__norm", F.sqrt(dot(v, v)))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Physical plan: queries are BROADCAST (never shuffle the corpus for a
    small query set); cosine is computed in one narrow map over the
    corpus; the per-query top-k is a window over (query_id) — at scale
    swap the window for the min_heap aggregate if k is small and query
    count is huge. Deterministic order: (cos desc, neighbor_id asc).
    Output: (query_id, rk, neighbor_id) — rank is BIGINT, no floats in
    the output so cross-engine comparisons stay exact.
    """
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("__vec").alias("qvec"),
        F.col("__norm").alias("qnorm"),
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__vec").alias("nvec"),
        F.col("__norm").alias("nnorm"),
    )
    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.filter(F.col("neighbor_id") != F.col("query_id"))
    cos = dot(F.col("qvec"), F.col("nvec")) / (F.col("qnorm") * F.col("nnorm"))
    scored = pairs.select("query_id", "neighbor_id", cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("query_id", "rk", "neighbor_id")
    )


def srp_signature(
    vec_col: Column, hyperplanes: list[list[float]]
) -> Column:
    """Signed-random-projection bucket id: sign bit of the dot product
    with each fixed hyperplane, packed into a long. Hyperplanes are
    passed as literal arrays — deterministic, broadcast with the plan.
    Expression form — fine for a handful of bits; for multi-table
    signatures use :func:`srp_buckets_vectorized` (one Arrow matmul)."""
    bits = []
    for i, hp in enumerate(hyperplanes):
        hp_col = F.array(*[F.lit(float(x)) for x in hp])
        bits.append(
            F.when(dot(vec_col, hp_col) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def srp_buckets_vectorized(
    df: DataFrame,
    tables_hps: list[list[list[float]]],
    id_col: str,
    vec_col: str = "__vec",
    out_col: str = "__buckets",
) -> DataFrame:
    """All L table bucket-ids in ONE Arrow-vectorized pass: stack every
    table's hyperplanes into a single (L*b, dim) matrix, one numpy matmul
    per batch, pack sign bits per table. L x b interpreted expression
    dots measured noisy and ~5x slower at 5k vectors; a batch matmul is
    one BLAS call."""
    import pandas as pd
    from pyspark.sql import types as T

    H = np.vstack([np.asarray(t, dtype=np.float64) for t in tables_hps])
    nbits = len(tables_hps[0])
    L = len(tables_hps)
    weights = (1 << np.arange(nbits, dtype=np.int64))

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.ArrayType(T.LongType()))]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                pdf[out_col] = []
                yield pdf
                continue
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            signs = (V @ H.T) >= 0  # (n, L*b)
            signs = signs.reshape(len(V), L, nbits)
            buckets = (signs * weights).sum(axis=2).astype(np.int64)  # (n, L)
            pdf = pdf.copy()
            pdf[out_col] = list(buckets)
            yield pdf

    return df.mapInPandas(run, schema)


def make_hyperplanes(dim: int, nbits: int = 12, seed: int = 7) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(nbits, dim).tolist()


def srp_buckets_multiprobe(
    df: DataFrame,
    tables_hps: list[list[list[float]]],
    probes: int,
    vec_col: str = "__vec",
    out_col: str = "__buckets",
) -> DataFrame:
    """QUERY-side multi-probe SRP buckets [Lv et al. 2007]: per table,
    the base bucket PLUS ``probes`` perturbed buckets, each flipping
    the single sign bit whose hyperplane margin ``|q . h|`` is
    smallest — the bits most likely to disagree with a true
    neighbor's.  Multi-probe buys the recall of extra hash TABLES
    without their index cost: the corpus side keeps ONE bucket per
    table (standing state unchanged — the property that matters at
    100 TB, where corpus rows outnumber queries ~10^9:1), and only
    the bounded query fan-out grows, L -> L*(1+probes) join keys.

    Same one-BLAS-matmul shape as :func:`srp_buckets_vectorized`;
    additionally argsorts the |margin| matrix per (row, table) —
    O(b log b) on b<=16 bits, noise next to the matmul.  Bit-flip
    order ties break toward the LOWER bit index (argsort is stable on
    the fixed-order margin array), so the probe sequence — and with
    it every downstream candidate set — is a pure function of the
    vector: split-invariant, replayable.

    Output rows carry ``out_col`` = array of L arrays of (1+probes)
    bucket ids (base first).
    """
    from pyspark.sql import types as T

    H = np.vstack([np.asarray(t, dtype=np.float64) for t in tables_hps])
    nbits = len(tables_hps[0])
    L = len(tables_hps)
    probes = min(probes, nbits)  # one flip per bit is all there is
    weights = 1 << np.arange(nbits, dtype=np.int64)

    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.ArrayType(T.LongType())))]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                pdf[out_col] = []
                yield pdf
                continue
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            proj = (V @ H.T).reshape(len(V), L, nbits)
            base = ((proj >= 0) * weights).sum(axis=2).astype(np.int64)  # (n, L)
            # flip order: |margin| ascending, stable -> lowest bit wins ties
            order = np.argsort(np.abs(proj), axis=2, kind="stable")
            flips = weights[order[:, :, :probes]]  # (n, L, probes) XOR masks
            all_buckets = np.concatenate(
                [base[:, :, None], base[:, :, None] ^ flips], axis=2
            )  # (n, L, 1+probes)
            pdf = pdf.copy()
            pdf[out_col] = [list(map(list, row)) for row in all_buckets]
            yield pdf

    return df.mapInPandas(run, schema)


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    nbits: int = 4,
    tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    probes: int = 2,
) -> DataFrame:
    """Approximate top-k: MULTI-TABLE SRP-bucketed candidates with
    MULTI-PROBE query fan-out [Lv et al. 2007], exact re-rank.

    One sign-random-projection table prunes hard but has poor recall for
    moderate-cosine neighbors (collision prob per bit is 1 - theta/pi);
    the standard construction is L independent tables of b bits each —
    a candidate is anyone sharing the query's bucket in ANY table.
    Expected candidate fraction is ~L/2^b of the corpus; recall for a
    neighbor at angle theta is 1-(1-p^b)^L with p = 1 - theta/pi. Tune
    (b, L) to the corpus: bigger corpora afford bigger b (more pruning)
    at the same recall.

    ``probes`` (r7 verdict item 4) additionally probes, per table, the
    buckets reached by flipping each of the ``probes`` lowest-margin
    sign bits — the recall of extra tables WITHOUT growing the corpus-
    side standing state (only the bounded query fan-out grows).  The
    default probes=2 lifts structure-free-noise recall@5 from
    0.64/0.78 (single-probe) to 0.96/0.98 at the 2k/20k measured
    corpora, for <= 1.07x the single-probe latency, and pulls the
    worst returned exact rank from 10 to 6 (ANN_RECALL_r8.json has the
    full probes-vs-recall-vs-latency curve); probes=0 is the classic
    single-probe construction.

    Physical shape stays equi-join: corpus explodes to L (table, bucket)
    rows — linear, no all-pairs — and the query side is broadcast.
    """
    tbls = [make_hyperplanes(dim, nbits, seed=7 + 1000 * t) for t in range(tables)]

    def bucketed(df: DataFrame, id_alias: str, vec_alias: str, norm_alias: str):
        e = with_norm(df, vec_col).select(
            F.col(id_col).alias(id_alias),
            F.col("__vec").alias(vec_alias),
            F.col("__norm").alias(norm_alias),
        )
        if id_alias == "query_id" and probes > 0:
            # query side fans out to the multi-probe bucket lists
            bk = srp_buckets_multiprobe(
                e, tbls, probes=probes, vec_col=vec_alias
            )
            return bk.select(
                id_alias,
                vec_alias,
                norm_alias,
                F.posexplode("__buckets").alias("tbl", "bucket_list"),
            ).select(
                id_alias,
                vec_alias,
                norm_alias,
                "tbl",
                F.explode("bucket_list").alias("bucket"),
            )
        # corpus side: ONE bucket per table, always
        bk = srp_buckets_vectorized(e, tbls, id_col=id_alias, vec_col=vec_alias)
        return bk.select(
            id_alias,
            vec_alias,
            norm_alias,
            F.posexplode("__buckets").alias("tbl", "bucket"),
        )

    c = bucketed(corpus, "neighbor_id", "nvec", "nnorm")
    q = bucketed(queries, "query_id", "qvec", "qnorm")
    cand = c.join(F.broadcast(q), on=["tbl", "bucket"]).dropDuplicates(
        ["query_id", "neighbor_id"]
    )
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    cos = dot(F.col("qvec"), F.col("nvec")) / (F.col("qnorm") * F.col("nnorm"))
    scored = cand.select("query_id", "neighbor_id", cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("query_id", "rk", "neighbor_id")
    )


def _kmeans_lite(sample: np.ndarray, k: int, iters: int = 10, seed: int = 11) -> np.ndarray:
    """Deterministic Lloyd's k-means on a driver-side sample — the coarse
    quantizer for IVF. A sample of a few thousand vectors is enough to
    place centroids; the full corpus never leaves the cluster.

    Distances use the n x k matmul form, never the n x k x d broadcast
    cube (at the max sample/cap sizes the cube transiently allocated
    ~1 GB on the driver)."""
    k = min(k, len(sample))  # degenerate corpora: never ask for more
    rng = np.random.RandomState(seed)  # centroids than sample rows
    centroids = sample[rng.choice(len(sample), size=k, replace=False)]
    s_sq = (sample**2).sum(axis=1)
    for _ in range(iters):
        d = (
            s_sq[:, None]
            - 2.0 * (sample @ centroids.T)
            + (centroids**2).sum(axis=1)[None, :]
        )
        assign = d.argmin(axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def _assign_centroids(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str,
    nprobe: int,
    out_col: str = "__cells",
) -> DataFrame:
    """Attach each row's ``nprobe`` nearest centroid ids (one Arrow
    matmul pass, same shape as srp_buckets_vectorized)."""
    import pandas as pd
    from pyspark.sql import types as T

    C = centroids.astype(np.float64)
    c_sq = (C**2).sum(axis=1)
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.ArrayType(T.IntegerType()))]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                pdf[out_col] = []
                yield pdf
                continue
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            # squared L2 to each centroid: |v|^2 - 2 v.c + |c|^2 (|v|^2 constant per row)
            d = -2.0 * (V @ C.T) + c_sq[None, :]
            cells = np.argsort(d, axis=1)[:, :nprobe].astype(np.int32)
            pdf = pdf.copy()
            pdf[out_col] = list(cells)
            yield pdf

    return df.mapInPandas(run, schema)


# --- distributed k-means (lifts the driver-sample centroid cap) -------------


def _quantized(vec_col: str, scale: int) -> Column:
    """Exact fixed-point coordinates, computed JVM-SIDE (Spark round =
    HALF_UP; numpy rounds half-to-even — never quantize in Arrow when
    the integers must be engine-exact)."""
    return F.transform(
        _as_double(F.col(vec_col)),
        lambda x: F.round(x * F.lit(float(scale))).cast("long"),
    )


def _hash_uniform(id_col: str, salt: str) -> Column:
    """Deterministic per-row uniform in [0, 1): the first 8 md5 hex
    digits of (id, salt) as an integer / 2^32 — the hash-based
    randomness that replaces Math.random in distributed sampling."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.col(id_col), F.lit(salt))), 1, 8),
        16,
        10,
    ).cast("double")
    return h / F.lit(float(1 << 32))


def _exact_int_sq_dists(Q: np.ndarray, Cq: np.ndarray) -> np.ndarray:
    """Pairwise squared distances between int64 fixed-point coordinate
    matrices, EXACT and partitioning-independent.

    When every intermediate fits in 2^53 (|coord| bound checked per
    batch), the float64 BLAS matmul is exact on these integers — every
    product and partial sum is an exactly-representable integer, so
    summation order cannot change the result; otherwise fall back to
    the (slower, equally exact) int64 matmul.  Either way argmin/min
    over the result is deterministic under any batch split.
    """
    m = float(
        max(
            np.abs(Q).max(initial=0),
            np.abs(Cq).max(initial=0),
        )
    )
    d_ = Q.shape[1]
    if 3.0 * d_ * m * m < 2.0**53:
        Qf, Cf = Q.astype(np.float64), Cq.astype(np.float64)
        return (
            (Qf**2).sum(axis=1)[:, None]
            - 2.0 * (Qf @ Cf.T)
            + (Cf**2).sum(axis=1)[None, :]
        )
    return (
        (Q**2).sum(axis=1)[:, None] - 2 * (Q @ Cq.T) + (Cq**2).sum(axis=1)[None, :]
    )


def _lloyd_stats(
    e: DataFrame, centroids: np.ndarray, qvec_col: str, scale: int
) -> list:
    """One distributed Lloyd round's sufficient statistics: per-cell
    (count, per-dimension fixed-point coordinate sum).

    Shape: ONE Arrow pass assigns each batch to cells AND reduces the
    batch to at most k partial rows (cell, n, int64 coordinate sums) —
    the map-side combine; the cross-batch merge is a tiny decimal(38,0)
    aggregate (exact, order-independent — integer sums make the round
    deterministic under any partitioning, the property float sums
    can't give). Assignment also runs on the QUANTIZED coordinates
    (exact distances via _exact_int_sq_dists), so cell membership
    itself is split-invariant. Driver traffic: k*d numbers per round.
    """
    import pandas as pd
    from pyspark.sql import types as T

    Cq = np.rint(centroids.astype(np.float64) * float(scale)).astype(np.int64)
    out_schema = T.StructType(
        [
            T.StructField("cell", T.IntegerType()),
            T.StructField("n", T.LongType()),
            T.StructField("qsum", T.ArrayType(T.LongType())),
        ]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.array([np.asarray(v, dtype=np.int64) for v in pdf[qvec_col]])
            cells = _exact_int_sq_dists(Q, Cq).argmin(axis=1)
            present = np.unique(cells)
            acc = np.zeros((len(Cq), Q.shape[1]), dtype=np.int64)
            np.add.at(acc, cells, Q)
            cnt = np.bincount(cells, minlength=len(Cq))
            yield pd.DataFrame(
                {
                    "cell": present.astype(np.int32),
                    "n": cnt[present].astype(np.int64),
                    "qsum": [acc[c] for c in present],
                }
            )

    partial = e.mapInPandas(run, out_schema)
    merged = (
        partial.select(
            "cell", "n", F.posexplode("qsum").alias("pos", "qs")
        )
        .groupBy("cell", "pos")
        .agg(
            F.sum(F.col("qs").cast("decimal(38,0)")).alias("qsum"),
            F.sum(
                F.when(F.col("pos") == 0, F.col("n")).otherwise(F.lit(0))
            ).alias("n0"),
        )
    )
    return merged.collect()


def _weighted_kmeans_lite(
    cand: np.ndarray, w: np.ndarray, k: int, iters: int = 10, seed: int = 11
) -> np.ndarray:
    """Weighted Lloyd on the (small) k-means|| candidate set — the
    driver-side reduction step of Bahmani et al. 2012. Deterministic:
    seeded greedy D^2 init over weighted candidates, then weighted
    means."""
    k = min(k, len(cand))
    # greedy weighted k-means++ init: start from the heaviest candidate
    # (ties: lowest index), then repeatedly take the candidate with max
    # weighted squared distance to the chosen set — deterministic, no rng
    order = np.lexsort((np.arange(len(cand)), -w))
    chosen = [order[0]]
    d2 = ((cand - cand[chosen[0]]) ** 2).sum(axis=1)
    while len(chosen) < k:
        score = w * d2
        nxt = int(score.argmax())
        chosen.append(nxt)
        d2 = np.minimum(d2, ((cand - cand[nxt]) ** 2).sum(axis=1))
    centroids = cand[chosen].copy()
    c_sq_cand = (cand**2).sum(axis=1)
    for _ in range(iters):
        # matmul distance form: an n x k matrix, never the n x k x d
        # broadcast cube (k-means|| candidate sets reach tens of
        # thousands of rows at large k — the cube would be tens of GB)
        d = (
            c_sq_cand[:, None]
            - 2.0 * (cand @ centroids.T)
            + (centroids**2).sum(axis=1)[None, :]
        )
        assign = d.argmin(axis=1)
        for c in range(k):
            m = assign == c
            if w[m].sum() > 0:
                centroids[c] = (cand[m] * w[m, None]).sum(axis=0) / w[m].sum()
    return centroids


def kmeans_distributed(
    df: DataFrame,
    k: int,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_rounds: int = 3,
    oversample: int | None = None,
    scale: int = 1 << 20,
    init: np.ndarray | None = None,
    seed: int = 11,
    prepared: DataFrame | None = None,
) -> np.ndarray:
    """Distributed k-means: k-means||-style seeding [Bahmani et al.
    2012, VLDB] + integer-exact distributed Lloyd rounds. Lifts the
    driver-sample cap of :func:`_kmeans_lite` (k <= sample_size/2,
    VERDICT r5 item 2): k is bounded only by what the driver can hold
    as the broadcast centroid matrix (k*d doubles — millions of cells
    before that matters), and the FIT sees the whole corpus, not a
    2000-row sample.

    Determinism contract (the registry requirement): every source of
    randomness is hash-derived per row (md5 of id+salt), and every
    cross-partition reduction is exact — costs sum as decimal(38,0)
    over fixed-point integers, Lloyd means sum int64 coordinates — so
    the result is identical under any partitioning/AQE split, which
    float accumulation cannot promise.

    Per round: one Arrow assign+partial-reduce pass over the corpus, a
    k*d-row decimal aggregate, k*d numbers to the driver. Seeding: one
    cost pass + one sample pass per seed round (expected `oversample`
    candidates each), one weighting pass, then a driver-side weighted
    reduction of the ~seed_rounds*oversample candidates.

    `init` overrides seeding with explicit centroids (the equality pin
    vs `_kmeans_lite` in tests/test_extensions.py uses this).

    ``prepared`` hands in an already-persisted ``(id, vec, qvec)``
    frame built EXACTLY the way this function would build it
    (``id_col -> id``, ``_as_double(vec_col) -> vec``,
    ``_quantized(vec_col, scale) -> qvec``) so a caller that needs the
    same frame for its own passes (e.g. the IVFPQ seed sample) pays
    the corpus scan once — the caller owns persist and unpersist; the
    Lloyd rounds read only ``qvec`` from it either way.

    Driver-side bound (documented, not hidden): the seeding reduction
    holds ~seed_rounds*oversample candidate vectors and runs a greedy
    weighted k-means++ over them — O(k * candidates * d) driver flops.
    At the defaults (oversample = 2k) that is O(k^2 d): practical to
    k ~ tens of thousands of cells (k=2500 measured at 62 s cold /
    23 s warm in KMEANS_BIGK_r6.json), far past the old sample cap.
    For k beyond that, pass a smaller `oversample` or use
    :func:`kmeans_hierarchical` (coarse fit -> per-cell executor-side
    refit, no driver-side reduction at all); the Lloyd rounds here
    themselves scale as one corpus pass + a k*d aggregate per round
    at ANY k the driver can hold as the broadcast centroid matrix.
    """
    if k < 1:
        raise ValueError("kmeans_distributed: k must be >= 1")
    if oversample is None:
        oversample = max(2 * k, 16)

    if prepared is not None:
        e = prepared
    else:
        e = (
            df.select(
                F.col(id_col).alias("id"),
                _as_double(F.col(vec_col)).alias("vec"),
                _quantized(vec_col, scale).alias("qvec"),
            )
            .persist()
        )
    try:
        if init is not None:
            centroids = np.asarray(init, dtype=np.float64)
        else:
            centroids = _seed_kmeanspp(
                e, k, seed_rounds, oversample, scale, seed
            )
        # Lloyd reads only the quantized coordinates — select them
        # explicitly so the Arrow boundary ships one column, not the
        # whole (id, vec, qvec) row (guide §4.1: opaque functions
        # defeat column pruning unless the caller projects first)
        eq = e.select("qvec")
        for _ in range(iters):
            rows = _lloyd_stats(eq, centroids, "qvec", scale)
            new = centroids.copy()
            counts: dict[int, int] = {}
            for r in rows:
                if r["pos"] == 0:
                    counts[r["cell"]] = int(r["n0"])
            for r in rows:
                c = r["cell"]
                n = counts.get(c, 0)
                if n > 0:
                    new[c, r["pos"]] = float(int(r["qsum"])) / (scale * n)
            centroids = new
        return centroids
    finally:
        if prepared is None:
            e.unpersist()


def _seed_kmeanspp(
    e: DataFrame, k: int, rounds: int, oversample: int, scale: int, seed: int
) -> np.ndarray:
    """k-means||-style distributed seeding over ``e(id, vec, qvec)``:
    start from the min-id vector, then `rounds` passes each sampling
    every point with probability min(1, oversample * cost / total_cost)
    (cost = squared distance to the current seed set, computed on the
    FIXED-POINT coordinates so total_cost is an exact decimal sum),
    then weight the candidates by their Voronoi counts and reduce
    driver-side with weighted k-means++/Lloyd."""
    first = e.orderBy("id").limit(1).collect()
    if not first:
        raise ValueError("kmeans_distributed: empty corpus")
    cand = [np.asarray(first[0]["vec"], dtype=np.float64)]
    fscale = float(scale)

    for r in range(rounds):
        C = np.asarray(cand, dtype=np.float64)
        # integer-exact cost: min_j sum_d (qv_d - round(c_d*scale))^2,
        # computed in the quantized space so the total is order-free
        Cq = np.rint(C * fscale).astype(np.int64)
        costed = _min_sq_dist_fixed(e, Cq)
        total = costed.agg(
            F.sum(F.col("__cost").cast("decimal(38,0)")).alias("t")
        ).collect()[0]["t"]
        total = int(total)
        if total == 0:
            break  # every point coincides with a seed
        u = _hash_uniform("id", f"kmpp|{seed}|{r}")
        # u < oversample * cost / total, cross-multiplied in exact ints
        picked = costed.filter(
            u * F.lit(float(total))
            < F.col("__cost").cast("double") * F.lit(float(oversample))
        )
        for row in picked.select("vec").collect():
            cand.append(np.asarray(row["vec"], dtype=np.float64))

    C = np.asarray(cand, dtype=np.float64)
    if len(C) <= k:
        return C
    # weight candidates by Voronoi population, then reduce to k
    Cq = np.rint(C * fscale).astype(np.int64)
    assigned = _nearest_fixed(e, Cq)
    wrows = assigned.groupBy("__seed").count().collect()
    w = np.zeros(len(C), dtype=np.float64)
    for row in wrows:
        w[row["__seed"]] = float(row["count"])
    return _weighted_kmeans_lite(C, w, k)


def _min_sq_dist_fixed(e: DataFrame, Cq: np.ndarray) -> DataFrame:
    """Attach ``__cost`` = min squared distance (fixed-point integer) to
    the seed set — one Arrow pass, int64-exact per row."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        list(e.schema.fields) + [T.StructField("__cost", T.LongType())]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                pdf["__cost"] = []
                yield pdf
                continue
            Q = np.array([np.asarray(v, dtype=np.int64) for v in pdf["qvec"]])
            D = _exact_int_sq_dists(Q, Cq)
            pdf = pdf.copy()
            pdf["__cost"] = D.min(axis=1).astype(np.int64)
            yield pdf

    return e.mapInPandas(run, schema)


def _nearest_fixed(e: DataFrame, Cq: np.ndarray) -> DataFrame:
    """Attach ``__seed`` = index of the nearest seed (fixed-point exact
    distances, ties to the lowest index) — one Arrow pass."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        list(e.schema.fields) + [T.StructField("__seed", T.IntegerType())]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                pdf["__seed"] = []
                yield pdf
                continue
            Q = np.array([np.asarray(v, dtype=np.int64) for v in pdf["qvec"]])
            D = _exact_int_sq_dists(Q, Cq)
            pdf = pdf.copy()
            pdf["__seed"] = D.argmin(axis=1).astype(np.int32)
            yield pdf

    return e.mapInPandas(run, schema)


def kmeans_hierarchical(
    df: DataFrame,
    k: int,
    k_coarse: int | None = None,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1 << 20,
    coarse_opts: dict | None = None,
) -> np.ndarray:
    """Two-level distributed centroid fit — the documented escape from
    :func:`kmeans_distributed`'s driver-side seeding reduction (whose
    weighted k-means++ holds ~seed_rounds*oversample candidate vectors
    and runs O(k * candidates * d) driver flops, practical to k ~ tens
    of thousands of cells).  Here NO per-point work happens on the
    driver at large k:

      1. a COARSE kmeans_distributed fit places k_coarse cells
         (default ceil(sqrt(k)) — its own seeding reduction is
         O(k_coarse^2 * d) = O(k * d), trivial at any k),
      2. ONE exact fixed-point assignment pass splits the corpus into
         coarse cells (shuffle keyed on cell),
      3. every cell refits its own ceil(k / k_coarse) sub-centroids
         locally inside ``applyInPandas`` — fully parallel across
         cells, executor-side.

    The driver touches only the final <= k x d centroid matrix.  Total
    centroids = sum over non-empty cells of min(k_fine, |cell|) — k is
    an upper bound, the usual IVF quantizer contract.  Memory: each
    refit holds ONE cell (~N/k_coarse vectors); for corpora where that
    exceeds executor memory, raise ``k_coarse`` (more, smaller cells)
    — the knob trades coarse-fit cost against per-cell footprint.

    Determinism contract (the registry requirement): the coarse
    centroids are kmeans_distributed's (every cross-partition reduction
    exact); cell membership runs on the QUANTIZED coordinates through
    _exact_int_sq_dists (exact, ties to the lowest cell id), so it is
    split-invariant; each refit receives its ENTIRE group in one pandas
    frame (the applyInPandas contract), sorts it by id, and runs the
    pure-numpy seeded _kmeans_lite — a pure function of the cell's
    member set.  The result is bit-identical under any partitioning /
    AQE split (pinned in tests/test_extensions.py).
    """
    import pandas as pd
    from pyspark.sql import types as T

    if k < 1:
        raise ValueError("kmeans_hierarchical: k must be >= 1")
    if k_coarse is None:
        k_coarse = max(1, int(np.ceil(np.sqrt(float(k)))))
    k_coarse = min(k_coarse, k)
    k_fine = -(-k // k_coarse)  # ceil div: per-cell sub-centroid budget

    coarse = kmeans_distributed(
        df,
        k=k_coarse,
        id_col=id_col,
        vec_col=vec_col,
        scale=scale,
        **(coarse_opts or {}),
    )
    Cq = np.rint(coarse.astype(np.float64) * float(scale)).astype(np.int64)

    e = df.select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("vec"),
        _quantized(vec_col, scale).alias("qvec"),
    )
    assigned = _nearest_fixed(e, Cq)

    out_schema = T.StructType(
        [
            T.StructField("cell", T.IntegerType()),
            T.StructField("sub", T.IntegerType()),
            T.StructField("centroid", T.ArrayType(T.DoubleType())),
        ]
    )

    def refit(pdf):
        pdf = pdf.sort_values("id")  # pure function of the member SET
        M = np.array([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
        cent = _kmeans_lite(M, k=k_fine, iters=iters)
        return pd.DataFrame(
            {
                "cell": np.full(len(cent), int(pdf["__seed"].iloc[0]), dtype=np.int32),
                "sub": np.arange(len(cent), dtype=np.int32),
                "centroid": [row for row in cent],
            }
        )

    rows = (
        assigned.groupBy("__seed")
        .applyInPandas(refit, out_schema)
        .collect()
    )
    rows.sort(key=lambda r: (r["cell"], r["sub"]))
    return np.array(
        [np.asarray(r["centroid"], dtype=np.float64) for r in rows]
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 10,
    sample_size: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    centroid_fit: str = "sample",
) -> DataFrame:
    """Approximate top-k via IVF: a k-means coarse quantizer partitions
    the corpus into cells; each query probes its ``nprobe`` nearest
    cells and re-ranks exactly within them.

    This is the FAISS-style inverted-file construction, DataFrame-shaped:
    corpus rows are assigned to ONE cell (equi-join key), queries fan out
    to ``nprobe`` cells, candidates come from the cell equi-join —
    expected candidate fraction ~ nprobe/n_centroids, and unlike
    sign-LSH it adapts to the data distribution (centroids follow
    density).  The nprobe=10 default is the measured >= 0.85-recall
    point on structure-free noise, the ANN worst case (r7 verdict item
    4; ANN_RECALL_r8.json: recall@5 0.90/0.90 at the 2k/20k corpora vs
    0.64/0.70 at nprobe=4, for ~1.0-1.09x the latency — the assign
    pass dominates, so probing more cells is nearly free until the
    candidate re-rank saturates; real corpora with neighbor structure
    need fewer probes).  ``centroid_fit="sample"`` (default) fits once on a
    driver-side sample (deterministic seed) — at 100 TB that sample is
    still a few thousand rows, but it caps n_centroids at
    sample_size/2; ``centroid_fit="distributed"`` fits with
    :func:`kmeans_distributed` (whole-corpus fit, no cap);
    ``centroid_fit="hierarchical"`` fits with
    :func:`kmeans_hierarchical` (whole-corpus two-level fit, no
    driver-side seeding reduction — the large-k path).
    """
    if centroid_fit == "distributed":
        centroids = kmeans_distributed(
            corpus, k=n_centroids, id_col=id_col, vec_col=vec_col
        )
    elif centroid_fit == "hierarchical":
        centroids = kmeans_hierarchical(
            corpus, k=n_centroids, id_col=id_col, vec_col=vec_col
        )
    elif centroid_fit == "sample":
        # Deterministic sample: LIMIT without ordering is whatever
        # partition Spark reads first — not stable across
        # partitionings/AQE. Ordering by id pins the sample
        # (TakeOrderedAndProject: no full sort, each partition keeps
        # its top-N and the driver merges).
        sample_rows = (
            corpus.select(id_col, vec_col)
            .orderBy(id_col)
            .limit(sample_size)
            .collect()
        )
        if not sample_rows:
            raise ValueError("cosine_topk_ivf: empty corpus")
        sample = np.array(
            [np.asarray(r[1], dtype=np.float64) for r in sample_rows]
        )
        centroids = _kmeans_lite(sample, k=n_centroids)
    else:
        raise ValueError(
            f"cosine_topk_ivf: unknown centroid_fit {centroid_fit!r}"
        )

    c = _ivf_assign(corpus, centroids, id_col, vec_col)
    return _ivf_probe(
        c, centroids, queries, k, nprobe, id_col, vec_col, exclude_self
    )


def _ivf_assign(
    corpus: DataFrame, centroids, id_col: str, vec_col: str
) -> DataFrame:
    """Corpus side of the inverted file: ``(cell, neighbor_id, nvec,
    nnorm)`` — every vector assigned to its ONE nearest cell."""
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__vec").alias("nvec"),
        F.col("__norm").alias("nnorm"),
    )
    return _assign_centroids(c, centroids, "nvec", nprobe=1).select(
        F.element_at(F.col("__cells"), 1).alias("cell"),
        "neighbor_id",
        "nvec",
        "nnorm",
    )


def _ivf_probe(
    assigned: DataFrame,
    centroids,
    queries: DataFrame,
    k: int,
    nprobe: int,
    id_col: str,
    vec_col: str,
    exclude_self: bool,
) -> DataFrame:
    """Query side: fan each query out to its nprobe nearest cells, join
    the inverted file on cell, re-rank exactly within candidates."""
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("__vec").alias("qvec"),
        F.col("__norm").alias("qnorm"),
    )
    q = _assign_centroids(q, centroids, "qvec", nprobe=nprobe).select(
        "query_id", "qvec", "qnorm", F.explode(F.col("__cells")).alias("cell")
    )
    cand = assigned.join(F.broadcast(q), on="cell")
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    cos = dot(F.col("qvec"), F.col("nvec")) / (F.col("qnorm") * F.col("nnorm"))
    scored = cand.select("query_id", "neighbor_id", cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("query_id", "rk", "neighbor_id")
    )


class IvfIndex(NamedTuple):
    """Handle to a persisted on-disk IVF index (see
    :func:`write_ivf_index`): the cell-bucketed inverted file, the
    centroid list, and the construction parameters a probe must match."""

    assignments: DataFrame
    centroids: list[list[float]]
    n_centroids: int


def write_ivf_index(
    corpus: DataFrame,
    name: str,
    n_centroids: int = 16,
    sample_size: int = 2000,
    num_buckets: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
    centroid_fit: str = "sample",
) -> None:
    """Persist the IVF inverted file as managed tables — the production
    form of :func:`cosine_topk_ivf` for a standing vector corpus (the
    vector-side sibling of ``dedup.write_minhash_index``):

    * ``{name}_cells``     (cell, neighbor_id, nvec, nnorm), bucketed
      by cell — the probe joins on cell, and because a probe touches
      only ``nprobe x |queries|`` distinct cells (bounded by
      n_centroids), the cell filter enables bucket pruning: scan tasks
      open only the probed cells' buckets;
    * ``{name}_centroids`` (cell, centroid) — n_centroids rows, read
      whole to the driver at open (the quantizer IS driver-sized);
    * ``{name}_meta``      construction parameters, so probes can't
      silently mix quantizers.

    Norms and double-cast vectors are stored, so probes never recompute
    them — the daily cost of vector search against a standing corpus
    becomes one broadcast of the query set and a pruned scan of the
    probed cells.  Centroid fitting (``centroid_fit="sample"``) uses
    the same deterministic ordered sample as the in-memory form —
    parquet roundtrips doubles exactly, so indexed results are
    bit-identical to the in-memory form (test-pinned);
    ``centroid_fit="distributed"`` fits with :func:`kmeans_distributed`
    (no sample cap on n_centroids).

    Building always fits FRESH data-dependent centroids, so only
    ``mode="overwrite"`` is valid here — an "append" build would stack
    a second quantizer's cell rows onto the first's, silently mixing
    incompatible cell ids.  Daily arrivals instead go through
    :func:`append_ivf_index`, which reuses the STORED centroids;
    :func:`compact_ivf_index` handles the resulting small files.
    """
    from .skew import write_bucketed

    spark = corpus.sparkSession
    if mode != "overwrite":
        raise ValueError(
            "write_ivf_index: only mode='overwrite' is valid — a fresh "
            "build fits fresh centroids, and appending rows assigned "
            "under a different quantizer would corrupt the index; "
            "append daily arrivals with append_ivf_index instead"
        )
    if mode == "overwrite":
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        for t in (f"{name}_cells", f"{name}_centroids", f"{name}_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            path = spark._jvm.org.apache.hadoop.fs.Path(
                f"{warehouse}/{t.lower()}"
            )
            fs = path.getFileSystem(hconf)
            if fs.exists(path):
                fs.delete(path, True)
    if centroid_fit == "distributed":
        centroids = kmeans_distributed(
            corpus, k=n_centroids, id_col=id_col, vec_col=vec_col
        )
    elif centroid_fit == "hierarchical":
        centroids = kmeans_hierarchical(
            corpus, k=n_centroids, id_col=id_col, vec_col=vec_col
        )
    elif centroid_fit == "sample":
        sample_rows = (
            corpus.select(id_col, vec_col)
            .orderBy(id_col)
            .limit(sample_size)
            .collect()
        )
        if not sample_rows:
            raise ValueError("write_ivf_index: empty corpus")
        sample = np.array(
            [np.asarray(r[1], dtype=np.float64) for r in sample_rows]
        )
        centroids = _kmeans_lite(sample, k=n_centroids)
    else:
        raise ValueError(
            f"write_ivf_index: unknown centroid_fit {centroid_fit!r}"
        )
    assigned = _ivf_assign(corpus, centroids, id_col, vec_col)
    write_bucketed(
        assigned, f"{name}_cells",
        bucket_by="cell", num_buckets=num_buckets, sort_by="cell", mode=mode,
    )
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    ).write.mode(mode).saveAsTable(f"{name}_centroids")
    spark.createDataFrame(
        [(len(centroids), sample_size)], "n_centroids int, sample_size int"
    ).write.mode(mode).saveAsTable(f"{name}_meta")


def read_ivf_index(spark, name: str) -> IvfIndex:
    """Open a persisted IVF index written by :func:`write_ivf_index`."""
    metas = spark.table(f"{name}_meta").collect()
    if len(metas) != 1:
        raise ValueError(
            f"read_ivf_index: {name}_meta has {len(metas)} rows — the "
            "index metadata was corrupted (a valid index has exactly "
            "one; append_ivf_index never adds meta rows)"
        )
    meta = metas[0]
    cents = spark.table(f"{name}_centroids").collect()
    centroids = [
        list(r.centroid) for r in sorted(cents, key=lambda r: r.cell)
    ]
    return IvfIndex(
        assignments=spark.table(f"{name}_cells"),
        centroids=centroids,
        n_centroids=meta.n_centroids,
    )


def append_ivf_index(
    new_vectors: DataFrame,
    name: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append daily arrivals to a persisted IVF index — the lifecycle
    half :func:`write_ivf_index` deliberately refuses (VERDICT r5 item
    3; the vector sibling of ``write_minhash_index(mode="append")``).

    The STORED centroids are reused: new vectors are assigned to their
    nearest existing cell (one Arrow pass over the batch only) and the
    resulting cell rows land in ``{name}_cells`` as a per-bucket file
    append — the corpus rows already in the index are never re-read,
    re-assigned, or re-shuffled, and ``{name}_centroids`` /
    ``{name}_meta`` are untouched, so every probe before and after sees
    the SAME quantizer.  Run :func:`compact_ivf_index` when the
    per-append files accumulate, and :func:`ivf_cell_cohesion` to
    audit centroid drift as the appended distribution diverges from
    the one the quantizer was fit on.
    """
    from .skew import write_bucketed

    spark = new_vectors.sparkSession
    idx = read_ivf_index(spark, name)
    centroids = np.asarray(idx.centroids, dtype=np.float64)
    describe = spark.sql(f"DESCRIBE FORMATTED {name}_cells").collect()
    info = {
        r.col_name.strip(): (r.data_type or "").strip() for r in describe
    }
    num_buckets = int(info["Num Buckets"])
    assigned = _ivf_assign(new_vectors, centroids, id_col, vec_col)
    write_bucketed(
        assigned, f"{name}_cells",
        bucket_by="cell", num_buckets=num_buckets, sort_by="cell",
        mode="append",
    )


def compact_ivf_index(spark, name: str) -> dict[str, int]:
    """Compact ``{name}_cells`` after daily appends — same contract and
    same rename-out/rename-in swap as ``dedup.compact_minhash_index``:
    one file per cell bucket, zero shuffle (forced bucketed scan), probe
    results bit-identical before and after (test-pinned), recoverable
    at every step (data lives under the public name, ``__old``, or
    ``__compact``; nothing deleted before its replacement is live).
    Centroids and meta are single-write tables and never need
    compaction.  Returns ``{table: files_after}``."""
    return _compact_cell_table(spark, f"{name}_cells")


def compact_ivfpq_index(spark, name: str) -> dict[str, int]:
    """Compact ``{name}_codes`` after :func:`append_ivfpq_index`
    batches — the identical one-file-per-bucket, zero-shuffle,
    recoverable-swap recipe as :func:`compact_ivf_index` (probe
    bit-identity across compaction is test-pinned).  Quantizer tables
    are single-write and never need compaction."""
    return _compact_cell_table(spark, f"{name}_codes")


def _compact_cell_table(spark, table: str) -> dict[str, int]:
    """One-file-per-bucket rewrite of a cell-bucketed table with the
    rename-out/rename-in/drop-last swap (crash at any step leaves the
    data live under the public name, ``__old``, or ``__compact``).
    Single-writer batch op: the two-rename swap is not atomic, so
    schedule compaction when no probes run or retry probes on
    TABLE_OR_VIEW_NOT_FOUND — same operating contract as
    ``compact_minhash_index`` (see its docstring for the view-based
    alternative and why it is deliberately not used)."""
    out: dict[str, int] = {}
    cols = ["cell"]
    auto_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev_auto = spark.conf.get(auto_key, "true")
    spark.conf.set(auto_key, "false")
    try:
        describe = spark.sql(f"DESCRIBE FORMATTED {table}").collect()
        info = {
            r.col_name.strip(): (r.data_type or "").strip()
            for r in describe
        }
        num_buckets = int(info["Num Buckets"])
        tmp, old = f"{table}__compact", f"{table}__old"
        spark.sql(f"DROP TABLE IF EXISTS {tmp}")
        spark.sql(f"DROP TABLE IF EXISTS {old}")
        (
            spark.table(table)
            .sortWithinPartitions(*cols)
            .write.mode("overwrite")
            .bucketBy(num_buckets, *cols)
            .sortBy(*cols)
            .saveAsTable(tmp)
        )
        spark.sql(f"ALTER TABLE {table} RENAME TO {old}")
        spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
        spark.sql(f"DROP TABLE {old}")
        out[table] = len(spark.table(table).inputFiles())
    finally:
        spark.conf.set(auto_key, prev_auto)
    return out


def ivf_cell_cohesion(spark, name: str) -> DataFrame:
    """Centroid-drift audit for a persisted IVF index: per cell,
    member count and mean cosine between members and their centroid
    (plus the global mean) — run before and after
    :func:`append_ivf_index` batches; a falling mean cosine means the
    appended distribution has drifted from the one the quantizer was
    fit on and the index deserves a fresh ``write_ivf_index`` build.

    One scan of the cells table (stored vectors and norms reused; the
    centroid matrix joins in as a broadcast literal) — never touches
    the raw corpus."""
    idx = read_ivf_index(spark, name)
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(idx.centroids)],
        "cell int, __centroid array<double>",
    )
    cnorm = F.sqrt(dot(F.col("__centroid"), F.col("__centroid")))
    member_cos = dot(F.col("nvec"), F.col("__centroid")) / (
        F.col("nnorm") * cnorm
    )
    per_cell = (
        spark.table(f"{name}_cells")
        .join(F.broadcast(cents), "cell")
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.avg(member_cos).alias("mean_cos"),
        )
    )
    return per_cell


def cosine_topk_ivf_indexed(
    index: IvfIndex,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Probe a persisted IVF index: same semantics (and bit-identical
    results, test-pinned) as :func:`cosine_topk_ivf` over the corpus
    the index was built from — without touching the corpus table.

    Scale shape: the query set broadcasts; the inverted file is read
    through its cell buckets with the probed-cell filter eligible for
    bucket pruning; candidates re-rank exactly.  The corpus embeddings
    are never re-normalized, re-assigned, or re-shuffled.
    """
    return _ivf_probe(
        index.assignments,
        np.asarray(index.centroids, dtype=np.float64),
        queries,
        k,
        nprobe,
        id_col,
        vec_col,
        exclude_self,
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    nbits: int = 10,
    tables: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via MULTI-TABLE SRP buckets
    + exact verification — the vector analogue of MinHash-LSH dedup.

    A single b-bit SRP table misses a near-dup at angle theta with
    probability 1 - p^b (p = 1 - theta/pi); L independent tables drive
    that to (1 - p^b)^L — for cos >= 0.95 (theta <= 18deg), b=10, L=6
    the miss probability is ~2e-6 per pair. Precision is exact: every
    candidate is verified with the true cosine.

    Physical shape: bucket rows carry only (id, table, bucket) through
    the candidate self-join — vectors are re-attached to the (small)
    candidate set afterward, so the corpus embeddings are never
    replicated L times through a shuffle. Intermediates are persisted for
    the duration of the call and released by finalize().
    """
    from .util import finalize

    tbls = [make_hyperplanes(dim, nbits, seed=7 + 1000 * t) for t in range(tables)]
    e = (
        with_norm(df, vec_col)
        .select(
            F.col(id_col).alias("id"),
            F.col("__vec").alias("vec"),
            F.col("__norm").alias("norm"),
        )
        .persist()
    )
    bk = (
        srp_buckets_vectorized(e, tbls, id_col="id", vec_col="vec")
        .select("id", F.posexplode("__buckets").alias("tbl", "bucket"))
        .persist()
    )
    a, b = bk.alias("a"), bk.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ea = e.select(
        F.col("id").alias("id_a"), F.col("vec").alias("va"), F.col("norm").alias("na")
    )
    eb = e.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vb"), F.col("norm").alias("nb")
    )
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    out = (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
    return finalize(out, e, bk)


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_centroids: int | str = "auto",
    target_cell_size: int = 256,
    sample_size: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    algorithm: str = "hash_min",
    nprobe: int = 1,
    centroid_fit: str = "sample",
    centroid_fit_opts: dict | None = None,
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication [Abbas et al. 2023,
    arXiv:2303.09540]: k-means-cluster the embeddings (the same coarse
    quantizer as :func:`cosine_topk_ivf`), generate candidate pairs
    ONLY within a cell, verify with the exact cosine, close over
    connected components, and keep the min-id survivor per semantic
    cluster. The third dedup modality next to lexical (MinHash/SimHash)
    and bucket-LSH vector dedup (:func:`embedding_near_dup_pairs`):
    cluster-scoped pruning of semantically redundant documents.

    Scale accounting: the candidate stage is ONE shuffle keyed on cell
    plus per-cell self-joins — cost ~ sum |cell|^2. A FIXED centroid
    count is therefore quadratic in corpus size (measured: 68x
    wall-clock at 10x data with k=8, SCALE_r5.json) — the default
    ``n_centroids="auto"`` sizes k = N / target_cell_size so expected
    cell size stays CONSTANT and total pair work is linear
    (~ N * target_cell_size). A skewed cell is split by AQE's
    skew-join handling. Never corpus all-pairs. The documented miss
    class is cross-cell pairs (cluster-boundary near-dups) — exactly
    IVF's nprobe=1 trade, bounded tighter as thresholds rise (a 0.95+
    pair straddles a centroid boundary only when both points are nearly
    equidistant to two centroids); more cells means more boundary, the
    recall side of the same knob.

    Centroid fitting (``centroid_fit``): ``"sample"`` (default) fits
    driver-side from a bounded sample — k capped at sample_size // 2,
    which at the default (2000, 256) serves corpora up to ~256k
    vectors. ``"distributed"`` fits with :func:`kmeans_distributed`
    (k-means|| seeding + integer-exact distributed Lloyd): no sample
    cap — ``n_centroids="auto"`` then scales k with the corpus
    indefinitely, keeping cell size (and with it per-cell pair work)
    constant at any corpus size. ``"hierarchical"`` fits with
    :func:`kmeans_hierarchical` (two-level whole-corpus fit): also
    uncapped, and additionally free of kmeans_distributed's
    O(k * candidates * d) driver-side seeding reduction — the path for
    k beyond tens of thousands of cells. All three fits are
    deterministic.

    Output: (id, component, is_survivor) — the dedup_survivors shape.
    """
    from .graph import dedup_survivors
    from .util import finalize

    if n_centroids == "auto":
        n_total = df.count()
        n_centroids = max(16, -(-n_total // target_cell_size))  # ceil div
        if centroid_fit == "sample":
            cap = max(16, sample_size // 2)
            if n_centroids > cap:
                import warnings

                warnings.warn(
                    f"semantic_dedup: auto n_centroids {n_centroids} hit "
                    f"the driver-sample cap {cap} (sample_size // 2) — "
                    "cells will exceed target_cell_size and per-cell "
                    "pair work grows quadratically; raise sample_size "
                    "or use centroid_fit='distributed' (no cap)",
                    stacklevel=2,
                )
            n_centroids = min(n_centroids, cap)
    if centroid_fit == "distributed":
        centroids = kmeans_distributed(
            df,
            k=int(n_centroids),
            id_col=id_col,
            vec_col=vec_col,
            **(centroid_fit_opts or {}),
        )
    elif centroid_fit == "hierarchical":
        centroids = kmeans_hierarchical(
            df,
            k=int(n_centroids),
            id_col=id_col,
            vec_col=vec_col,
            **(centroid_fit_opts or {}),
        )
    elif centroid_fit == "sample":
        sample_rows = (
            df.select(id_col, vec_col)
            .orderBy(id_col)
            .limit(sample_size)
            .collect()
        )
        if not sample_rows:
            raise ValueError("semantic_dedup: empty corpus")
        sample = np.array(
            [np.asarray(r[1], dtype=np.float64) for r in sample_rows]
        )
        centroids = _kmeans_lite(sample, k=int(n_centroids))
    else:
        raise ValueError(
            f"semantic_dedup: unknown centroid_fit {centroid_fit!r}"
        )

    e = with_norm(df, vec_col).select(
        F.col(id_col).alias("id"),
        F.col("__vec").alias("vec"),
        F.col("__norm").alias("norm"),
    )
    # nprobe is the boundary-recall knob: each vector joins its nprobe
    # nearest cells for CANDIDATE generation (default 1 = faithful
    # SemDeDup; 2 recovers centroid-boundary pairs at ~nprobe^2 the
    # pair work).  Extra candidates can only ADD true >=threshold
    # pairs — verification is the exact cosine either way — so raising
    # nprobe strictly improves recall, never precision.
    e = (
        _assign_centroids(e, centroids, "vec", nprobe=nprobe)
        .select(
            "id",
            "vec",
            "norm",
            F.explode(F.slice(F.col("__cells"), 1, nprobe)).alias("cell"),
        )
        .persist()
    )
    a, b = e.alias("a"), e.alias("b")
    cos = dot(F.col("a.vec"), F.col("b.vec")) / (
        F.col("a.norm") * F.col("b.norm")
    )
    pairs = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    if nprobe > 1:
        # a pair sharing several probed cells appears once per shared
        # cell; components tolerate duplicate edges, but dedup keeps
        # the verified edge set minimal
        pairs = pairs.distinct()
    out = dedup_survivors(
        pairs, df.select(id_col), algorithm=algorithm
    )
    return finalize(out, e)


# --- int8 scalar quantization -----------------------------------------------


def embedding_quant_stats(
    df: DataFrame, vec_col: str = "embedding", levels: int = 256
) -> DataFrame:
    """Per-dimension int8 scalar quantization audit: min/max calibration
    per dimension, then the quantized-code statistics a vector-store
    build reports before committing to 4× memory compression (dims
    whose codes collapse to a few levels carry little information and
    flag a bad calibration or a dead dimension).

    Two linear passes, both scale-shaped: pass 1 explodes to
    (dim, val) and hash-aggregates min/max per dim — map-side partial
    aggregation means the shuffle carries ``dims × partitions`` rows,
    not the corpus.  Pass 2 re-explodes, joins the dims-sized
    calibration table (broadcast — it is `dim` rows), quantizes with
    ``round((v - min) * (levels-1) / (max - min))``, and aggregates
    code stats per dim.  At 100 TB the same two scans are the cost
    floor for exact calibration; sampled calibration just gates pass 1
    behind ``sampling.deterministic_sample``.

    Cross-engine exactness: the quantization arithmetic is the
    identical IEEE double expression tree on both engines, and every
    output column is BIGINT.  The half-up rounding is spelled
    ``floor(x + 0.5)`` (non-negative domain) rather than ``round(x)``
    deliberately: ``floor`` is IEEE-unambiguous in every engine and
    engine VERSION, while ``round`` tie/implementation semantics for
    DOUBLE have historically differed between engines (Java BigDecimal
    HALF_UP on the shortest decimal rendering vs C ``std::round`` on
    the binary value vs banker's rounding) — r10 driver-gate pinning.

    Output: ``(dim, n_levels, q_min, q_max, q_sum)``.
    """
    from .util import spread

    df = spread(df)
    v = df.select(F.posexplode(F.col(vec_col)).alias("dim", "val"))
    stats = v.groupBy("dim").agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
    scale = F.lit(float(levels - 1))
    q = v.join(F.broadcast(stats), "dim").select(
        "dim",
        F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("long"))
        .otherwise(
            F.floor(
                (F.col("val").cast("double") - F.col("mn").cast("double"))
                * scale
                / (F.col("mx").cast("double") - F.col("mn").cast("double"))
                + F.lit(0.5)
            ).cast("long")
        )
        .alias("qv"),
    )
    return q.groupBy("dim").agg(
        F.count_distinct("qv").alias("n_levels"),
        F.min("qv").alias("q_min"),
        F.max("qv").alias("q_max"),
        F.sum("qv").alias("q_sum"),
    ).select(
        F.col("dim").cast("long").alias("dim"),
        "n_levels", "q_min", "q_max", "q_sum",
    )


def embedding_gram_fixed(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 10**6,
    method: str = "arrow",
) -> DataFrame:
    """One-pass fixed-point Gram matrix ``G = sum_r v_r v_r^T`` (upper
    triangle, ``j >= i``) — the input to PCA / covariance whitening /
    low-rank projection over an embedding column.  Output:
    ``(i, j, gram_fp)``, all BIGINT, in units of ``1/scale^2``.

    The scalable PCA recipe: the d x d Gram matrix aggregates in ONE
    scan of the corpus; eigendecomposition of the d x d result (d=64
    here) is a trivial driver-side step — the classic way to compute
    exact PCA over a corpus that never fits anywhere.

    Fixed-point (``round(x*scale)`` per coordinate, integer products
    and sums) makes the aggregate associative and engine-exact — float
    dot-product sums depend on partition order and can't be oracled
    bit-exactly.  Pick ``scale`` for the corpus: products are
    ~``(scale*|x|)^2`` and the sum must stay under 2^63, so 10^6 is
    good to ~10^5 rows of unit-scale coords; drop to 10^4 for 10^9
    rows (precision trades against overflow headroom).

    Scale notes: ``method="arrow"`` (default) computes one numpy int64
    ``M^T M`` per Arrow batch and yields a single d^2/2-row partial per
    PARTITION — one BLAS-shaped matmul per batch instead of exploding
    d^2/2 rows per vector, then a tiny ``d^2 x partitions`` merge
    aggregate.  ``method="sql"`` is the pure-column-expression twin
    (in-row upper-triangle expansion -> explode -> one hash aggregate
    with map-side combine): same exact integers (test-pinned), JVM-only
    environments, and the form the DuckDB oracle mirrors.  Either way
    nothing reaches the driver but the d x d result.
    """
    fp = F.expr(
        f"transform({vec_col}, x -> CAST(round(CAST(x AS DOUBLE) * {scale}, 0)"
        " AS BIGINT))"
    )
    if method == "arrow":
        # Quantization stays a JVM column expression (Spark round =
        # HALF_UP; numpy rounds half-to-even), so both methods share
        # bit-identical fixed-point coordinates; Arrow only does the
        # exact integer matmul.
        return _gram_arrow(df.select(fp.alias("__fp")), "__fp")
    if method != "sql":
        raise ValueError(f"unknown method {method!r}")
    tri = F.expr(
        "flatten(transform(__fp, (x, i) -> "
        "transform(slice(__fp, i + 1, size(__fp) - i), (y, k) -> "
        "struct(i AS i, i + k AS j, x * y AS p))))"
    )
    return (
        df.select(fp.alias("__fp"))
        .select(F.explode(tri).alias("t"))
        .groupBy(F.col("t.i").alias("i"), F.col("t.j").alias("j"))
        .agg(F.sum("t.p").alias("gram_fp"))
    )


def _gram_arrow(df: DataFrame, fp_col: str) -> DataFrame:
    """Arrow path for :func:`embedding_gram_fixed`: per-batch integer
    matmul over pre-quantized int64 coordinates, one upper-triangle
    partial per partition, merged by a d^2-keyed aggregate.  int64
    throughout — bit-identical to the SQL path (test-pinned) because
    integer matmul is exact and summation associative."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("j", T.IntegerType()),
            T.StructField("p", T.LongType()),
        ]
    )

    def run(batches):
        acc = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.array(
                [np.asarray(v, dtype=np.int64) for v in pdf[fp_col]]
            )
            g = M.T @ M
            acc = g if acc is None else acc + g
        if acc is not None:
            iu, ju = np.triu_indices(acc.shape[0])
            yield pd.DataFrame(
                {
                    "i": iu.astype(np.int32),
                    "j": ju.astype(np.int32),
                    "p": acc[iu, ju],
                }
            )

    partials = df.mapInPandas(run, schema)
    return partials.groupBy("i", "j").agg(F.sum("p").alias("gram_fp"))


# --- product quantization (PQ / ADC with exact refinement) ------------------


def pq_codebooks(
    sample: np.ndarray, m: int, ksub: int, iters: int = 10
) -> np.ndarray:
    """Per-subspace k-means codebooks for product quantization [Jégou
    et al. 2011, TPAMI]: split d dims into ``m`` contiguous subvectors
    and fit ``ksub`` centroids in each — returns ``(m, ksub, d/m)``.
    Deterministic (seeded :func:`_kmeans_lite` per subspace over the
    same sample order)."""
    n, d = sample.shape
    if d % m != 0:
        raise ValueError(f"pq_codebooks: dim {d} not divisible by m={m}")
    dsub = d // m
    return np.stack(
        [
            _kmeans_lite(
                np.ascontiguousarray(sample[:, j * dsub : (j + 1) * dsub]),
                k=ksub,
                iters=iters,
            )
            for j in range(m)
        ]
    )


def pq_codebooks_distributed(
    corpus: DataFrame,
    m: int,
    ksub: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 4,
    scale: int = 1 << 20,
    coarse_cents: np.ndarray | None = None,
    init: np.ndarray | None = None,
    seed: int = 11,
    prepared_resid: DataFrame | None = None,
) -> np.ndarray:
    """Distributed per-subspace PQ codebook fit: the WHOLE corpus
    trains every subspace codebook — removes the last trainer that
    depended on a driver-side ``limit(sample_size)`` sample (r6
    verdict item 3; :func:`pq_codebooks` over a sample remains the
    FAISS-standard fast path and the equality baseline).

    FUSED across subspaces: each Lloyd round is ONE Arrow pass that
    L2-normalizes a batch, optionally subtracts the nearest coarse
    centroid (``coarse_cents`` given -> RESIDUAL codebooks, the IVFPQ
    trainer), quantizes to fixed point, assigns every row in all m
    subspaces, and reduces the batch to at most ``m * ksub`` partial
    rows (cell count + int64 coordinate sums).  Corpus passes per fit
    = 1 (init sample) + ``iters``, independent of m — vs
    ``m * (seed_rounds + iters)`` for m separate
    :func:`kmeans_distributed` calls.

    Determinism (the registry requirement): normalization/residual/
    quantization are row-local (split-invariant); assignments argmin
    over :func:`_exact_int_sq_dists` on the quantized coordinates;
    the cross-batch merge sums int64 coordinates as decimal(38,0) —
    exact and order-free — so the codebooks are identical under any
    partitioning/AQE split.  Init is a hash-ordered corpus sample
    (md5 of id + seed, ties by id: a total order, so the same
    ``m * ksub`` subvectors are chosen under any partitioning);
    ``init`` overrides it with explicit ``(m, ksub, d/m)`` codebooks
    (the pytest equality pin vs the sample fit uses this).

    Driver-side state: the ``(m, ksub, d/m)`` codebook matrix =
    ``ksub * d`` doubles, plus ``ksub * d`` aggregate rows per round —
    independent of corpus size.  Returns ``(m, ksub, d/m)``.

    ``prepared_resid``: an :func:`_ivfpq_assign_resid` frame whose
    ``resid`` column is EXACTLY what this function's own prep pass
    would compute (L2-normalized, coarse-residual float64) — the fit
    rounds then read it DIRECTLY, quantizing each batch with the same
    ``np.rint`` the prep pass applies (bit-identical ``qvec`` values;
    pinned in tests/test_ivfpq_shared_assign.py), instead of
    materializing a second corpus-sized fixed-point copy: one
    persisted corpus-scale frame per index build, not two (r10 ADVICE
    — the double DISK_ONLY persist doubled build scratch footprint).
    Requires ``coarse_cents`` (the residuals are only meaningful
    relative to the quantizer that produced them; ``ValueError``
    otherwise); the caller owns the frame's persistence and guarantees
    it matches ``coarse_cents`` — the residual dimensionality is
    checked against it.  ``corpus`` and ``vec_col`` are ignored when
    it is given.  The caller also guarantees the frame is non-empty
    (the corpus-scan path probes emptiness itself).
    """
    import pandas as pd
    from pyspark.sql import types as T

    if m < 1 or ksub < 1:
        raise ValueError("pq_codebooks_distributed: m and ksub must be >= 1")
    cents = (
        None
        if coarse_cents is None
        else np.asarray(coarse_cents, dtype=np.float64)
    )
    c_sq = None if cents is None else (cents**2).sum(axis=1)
    fscale = float(scale)

    prep_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("qvec", T.ArrayType(T.LongType())),
        ]
    )

    def prep(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            nrm = np.linalg.norm(V, axis=1)
            V = V / np.where(nrm == 0, 1.0, nrm)[:, None]
            if cents is not None:
                cell = (-2.0 * (V @ cents.T) + c_sq[None, :]).argmin(axis=1)
                V = V - cents[cell]
            Qv = np.rint(V * fscale).astype(np.int64)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "qvec": list(Qv),
                }
            )

    resid_mode = prepared_resid is not None
    if resid_mode:
        if cents is None:
            raise ValueError(
                "pq_codebooks_distributed: prepared_resid requires "
                "coarse_cents — the stored residuals are only "
                "meaningful relative to the coarse quantizer that "
                "produced them"
            )
        # read the caller-persisted (id, resid) frame directly; the
        # residual dim equals the coarse quantizer's dim, so no probe
        # job is needed for d
        prepared = prepared_resid.select("id", "resid")
        d = int(cents.shape[1])
    else:
        prepared = (
            corpus.select(id_col, vec_col)
            .mapInPandas(prep, prep_schema)
            .persist(StorageLevel.DISK_ONLY)
        )
    try:
        if not resid_mode:
            head = prepared.select(F.size("qvec").alias("d")).limit(1).collect()
            if not head:
                raise ValueError("pq_codebooks_distributed: empty corpus")
            d = int(head[0]["d"])
        if d % m != 0:
            raise ValueError(
                f"pq_codebooks_distributed: dim {d} not divisible by m={m}"
            )
        dsub = d // m

        if init is not None:
            books = np.asarray(init, dtype=np.float64).copy()
            if books.shape != (m, ksub, dsub):
                raise ValueError(
                    "pq_codebooks_distributed: init shape "
                    f"{books.shape} != {(m, ksub, dsub)}"
                )
        else:
            # hash-ordered init sample: 4*ksub rows gives each subspace
            # slack to pick ksub DISTINCT subvectors (duplicate init
            # centroids are tolerated on degenerate corpora — Lloyd
            # leaves an empty cell's centroid in place)
            hkey = F.md5(F.concat_ws("|", F.col("id"), F.lit(f"pqinit|{seed}")))
            rows = (
                prepared.withColumn("__h", hkey)
                .orderBy("__h", "id")
                .limit(4 * ksub)
                .collect()
            )
            if resid_mode:
                if not rows:
                    raise ValueError("pq_codebooks_distributed: empty corpus")
                if len(rows[0]["resid"]) != d:
                    raise ValueError(
                        "pq_codebooks_distributed: prepared_resid dim "
                        f"{len(rows[0]['resid'])} != coarse_cents dim {d}"
                    )
                S = np.rint(
                    np.array(
                        [np.asarray(r["resid"], dtype=np.float64) for r in rows]
                    )
                    * fscale
                ).astype(np.int64)
            else:
                S = np.array(
                    [np.asarray(r["qvec"], dtype=np.int64) for r in rows]
                )
            books = np.empty((m, ksub, dsub), dtype=np.float64)
            for j in range(m):
                sub = S[:, j * dsub : (j + 1) * dsub]
                _, first_idx = np.unique(sub, axis=0, return_index=True)
                keep = np.sort(first_idx)[:ksub]
                chosen = sub[keep]
                if len(chosen) < ksub:  # degenerate: recycle in order
                    reps = -(-ksub // len(chosen))
                    chosen = np.tile(chosen, (reps, 1))[:ksub]
                books[j] = chosen.astype(np.float64) / fscale

        stats_schema = T.StructType(
            [
                T.StructField("j", T.IntegerType()),
                T.StructField("cell", T.IntegerType()),
                T.StructField("n", T.LongType()),
                T.StructField("qsum", T.ArrayType(T.LongType())),
            ]
        )

        # each round ships exactly one column through Arrow (guide
        # §4.1); resid batches are quantized in-batch with the same
        # np.rint the prep pass applies — bit-identical qvec values
        data = prepared.select("resid" if resid_mode else "qvec")
        for _ in range(iters):
            Cq = np.rint(books * fscale).astype(np.int64)  # (m, ksub, dsub)

            def stats(batches, Cq=Cq):
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    if resid_mode:
                        Q = np.rint(
                            np.array(
                                [
                                    np.asarray(v, dtype=np.float64)
                                    for v in pdf["resid"]
                                ]
                            )
                            * fscale
                        ).astype(np.int64)
                    else:
                        Q = np.array(
                            [np.asarray(v, dtype=np.int64) for v in pdf["qvec"]]
                        )
                    out_j, out_c, out_n, out_s = [], [], [], []
                    for j in range(m):
                        Qj = np.ascontiguousarray(
                            Q[:, j * dsub : (j + 1) * dsub]
                        )
                        cells = _exact_int_sq_dists(Qj, Cq[j]).argmin(axis=1)
                        present = np.unique(cells)
                        acc = np.zeros((ksub, dsub), dtype=np.int64)
                        np.add.at(acc, cells, Qj)
                        cnt = np.bincount(cells, minlength=ksub)
                        out_j.append(np.full(len(present), j, dtype=np.int32))
                        out_c.append(present.astype(np.int32))
                        out_n.append(cnt[present].astype(np.int64))
                        out_s.extend(acc[c] for c in present)
                    yield pd.DataFrame(
                        {
                            "j": np.concatenate(out_j),
                            "cell": np.concatenate(out_c),
                            "n": np.concatenate(out_n),
                            "qsum": out_s,
                        }
                    )

            merged = (
                data.mapInPandas(stats, stats_schema)
                .select("j", "cell", "n", F.posexplode("qsum").alias("pos", "qs"))
                .groupBy("j", "cell", "pos")
                .agg(
                    F.sum(F.col("qs").cast("decimal(38,0)")).alias("qsum"),
                    F.sum(
                        F.when(F.col("pos") == 0, F.col("n")).otherwise(F.lit(0))
                    ).alias("n0"),
                )
                .collect()
            )
            counts: dict[tuple[int, int], int] = {}
            for r in merged:
                if r["pos"] == 0:
                    counts[(r["j"], r["cell"])] = int(r["n0"])
            new = books.copy()
            for r in merged:
                n = counts.get((r["j"], r["cell"]), 0)
                if n > 0:
                    new[r["j"], r["cell"], r["pos"]] = float(int(r["qsum"])) / (
                        fscale * n
                    )
            books = new
        return books
    finally:
        if not resid_mode:
            prepared.unpersist()


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    shortlist: int | str = "auto",
    sample_size: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    codebook_fit: str = "sample",
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """Approximate top-k via PRODUCT QUANTIZATION with exact
    refinement — the FAISS-style compressed-domain scan, DataFrame-
    shaped, completing the ANN family (brute force / SRP-LSH / IVF /
    PQ):

      1. codebooks: pass ``codebooks`` (shape ``(m, ksub, d/m)``) to
         reuse a PRECOMPUTED fit — the 100 TB deployment shape, where
         codebooks are trained once at index build
         (:func:`write_ivfpq_index` / :func:`pq_codebooks_distributed`)
         and every query amortizes them; otherwise
         ``codebook_fit="sample"`` (default) is the FAISS-standard
         fast path — a deterministic ``orderBy(id).limit(sample_size)``
         sample fit driver-side — and ``codebook_fit="distributed"``
         trains each of the m subspace codebooks on the WHOLE corpus
         with :func:`pq_codebooks_distributed` (fused rounds: one
         Arrow pass per Lloyd iteration regardless of m, integer-exact
         reductions — no driver-sample trainer cap, but 1+iters full
         corpus passes PER CALL, which is an index-build cost, not an
         ad-hoc-query cost).  Either way: m subspaces x ksub centroids
         over L2-normalized vectors, so L2 ranks like cosine:
         ||a-b||^2 = 2 - 2cos on the unit sphere,
      2. ENCODE: one Arrow pass maps each corpus vector to m small
         codes — m bytes of quantized state per vector instead of
         d*8, the ~64x memory compression that lets a 100 TB vector
         corpus live scan-resident where raw vectors cannot.
         Resolution knob (r8, measured): subspace COUNT m beats
         centroid count ksub per byte of code — on 20k-row
         structure-free noise, m=16/ksub=16 reaches recall@5 0.92
         where m=8/ksub=16 floors at 0.54 and m=8/ksub=256 needs 2x
         the latency for 0.90 (ANN_RECALL_r8.json); pick the largest
         m dividing d that your code-byte budget allows,
      3. ADC scan: per query a tiny (m x ksub) lookup table of
         partial squared distances is built driver-side (queries are
         a bounded set — the scalar-broadcast pattern); scoring the
         corpus is pure table-gather adds over the codes, and each
         Arrow batch emits only its local top-``shortlist`` per query
         (map-side top-k: rows out are O(batches * queries *
         shortlist), never corpus-sized),
      4. REFINE: the per-query shortlist joins back to the raw
         vectors (shortlist-sized, not corpus-sized) and exact
         cosine re-ranks to the final top-k.

    Determinism: codebooks and codes are pure functions of the data
    (seeded fits, argmin ties to the lowest code); ADC scores are a
    fixed-order 8-term float64 sum per row; every selection —
    local batch top-R, global top-R, final top-k — orders by
    (score, neighbor_id), a total order, so the result is identical
    under any batch/partition split (the distributed top-k
    invariant: a global top-R over per-batch top-Rs equals the top-R
    over all rows).

    Output: ``(query_id, rk, neighbor_id)`` — same shape as
    :func:`cosine_topk_bruteforce`.
    """
    import pandas as pd
    from pyspark.sql import types as T

    if shortlist == "auto":
        # corpus-size-INDEPENDENT refine bound (r6 verdict item 4 —
        # the old 5%-of-corpus policy made the exact-rerank stage
        # linear in the corpus and cost an extra count() job): the ADC
        # rank displacement is bounded by how many candidates can sit
        # within the quantization-error band around the k-th true
        # distance, which shrinks with m (more subspaces = finer
        # scores); 64*k (= 4*k*ksub at the ksub=16 default) covers the
        # worst displacement observed on structure-free noise at every
        # tested scale (sf0.01/0.1/1: exact-top-20 members never
        # ranked past ~200 by ADC; real corpora with neighbor
        # structure displace far less).  The recall pins in
        # tests/test_extensions.py and the registered summary oracles
        # gate this bound at every SF.
        shortlist = max(100, 64 * k)
    if codebooks is not None:
        books = np.asarray(codebooks, dtype=np.float64)
        if books.ndim != 3 or books.shape[0] != m or books.shape[1] != ksub:
            raise ValueError(
                f"pq_topk: precomputed codebooks shape {books.shape} does "
                f"not match (m={m}, ksub={ksub}, d/m)"
            )
        dsub = books.shape[2]
        d = m * dsub
    elif codebook_fit == "distributed":
        books = pq_codebooks_distributed(
            corpus, m, ksub, id_col=id_col, vec_col=vec_col
        )  # (m, ksub, dsub)
        dsub = books.shape[2]
        d = m * dsub
    elif codebook_fit == "sample":
        sample_rows = (
            corpus.select(id_col, vec_col)
            .orderBy(id_col)
            .limit(sample_size)
            .collect()
        )
        if not sample_rows:
            raise ValueError("pq_topk: empty corpus")
        S = np.array([np.asarray(r[1], dtype=np.float64) for r in sample_rows])
        norms = np.linalg.norm(S, axis=1)
        S = S / np.where(norms == 0, 1.0, norms)[:, None]
        d = S.shape[1]
        dsub = d // m
        books = pq_codebooks(S, m, ksub)  # (m, ksub, dsub)
    else:
        raise ValueError(f"pq_topk: unknown codebook_fit {codebook_fit!r}")

    code_schema = T.StructType(
        [
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )
    b_sq = (books**2).sum(axis=2)  # (m, ksub)

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            nrm = np.linalg.norm(V, axis=1)
            V = V / np.where(nrm == 0, 1.0, nrm)[:, None]
            codes = np.empty((len(V), m), dtype=np.int32)
            for j in range(m):
                sub = V[:, j * dsub : (j + 1) * dsub]
                dist = (
                    -2.0 * (sub @ books[j].T) + b_sq[j][None, :]
                )  # + ||sub||^2 is rank-constant per row
                codes[:, j] = dist.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf[id_col].astype("int64"),
                    "codes": list(codes),
                }
            )

    coded = corpus.mapInPandas(encode, code_schema)

    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        raise ValueError("pq_topk: empty queries")
    q_ids = np.array([int(r[0]) for r in q_rows], dtype=np.int64)
    Q = np.array([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    qn = np.linalg.norm(Q, axis=1)
    Q = Q / np.where(qn == 0, 1.0, qn)[:, None]
    # per-query ADC tables: T[q, j, c] = ||q_j - book[j][c]||^2
    tables = np.stack(
        [
            np.stack(
                [
                    ((Q[:, j * dsub : (j + 1) * dsub][qi] - books[j]) ** 2).sum(
                        axis=1
                    )
                    for j in range(m)
                ]
            )
            for qi in range(len(Q))
        ]
    )  # (nq, m, ksub)

    adc_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("adc", T.DoubleType()),
        ]
    )
    R = shortlist
    excl = exclude_self

    def adc_scan(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.array(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            ids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            cols = np.arange(m)
            out_q, out_i, out_s = [], [], []
            for qi in range(len(q_ids)):
                s = tables[qi][cols[None, :], C].sum(axis=1)  # (n,)
                mask = ids != q_ids[qi] if excl else np.ones(len(ids), bool)
                sm, im = s[mask], ids[mask]
                # local top-R by (score, id): lexsort is stable+total
                order = np.lexsort((im, sm))[:R]
                out_q.append(np.full(len(order), q_ids[qi], dtype=np.int64))
                out_i.append(im[order])
                out_s.append(sm[order])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_i),
                    "adc": np.concatenate(out_s),
                }
            )

    cand = coded.mapInPandas(adc_scan, adc_schema)
    w_r = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc()
    )
    short = (
        cand.withColumn("__r", F.row_number().over(w_r))
        .filter(F.col("__r") <= R)
        .select("query_id", "neighbor_id")
    )

    nvec = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__vec").alias("nvec"),
        F.col("__norm").alias("nnorm"),
    )
    qvec = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("__vec").alias("qvec"),
        F.col("__norm").alias("qnorm"),
    )
    refined = (
        short.join(nvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .withColumn(
            "cos",
            dot(F.col("qvec"), F.col("nvec")) / (F.col("qnorm") * F.col("nnorm")),
        )
    )
    w_k = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        refined.withColumn("rk", F.row_number().over(w_k).cast("long"))
        .filter(F.col("rk") <= k)
        .select("query_id", "rk", "neighbor_id")
    )


def _ivfpq_fit(
    corpus: DataFrame,
    n_centroids: int,
    m: int,
    ksub: int,
    sample_size: int,
    id_col: str,
    vec_col: str,
    codebook_fit: str = "distributed",
    return_assigned: bool = False,
) -> tuple:
    """Fit the IVFPQ quantizer pair: coarse centroids over
    L2-normalized vectors + RESIDUAL product-quantization codebooks
    (residuals v - centroid are smaller and better centered than raw
    vectors — the reason IVFPQ encodes them).

    ``codebook_fit="distributed"`` (default) fits BOTH quantizers on
    the whole corpus — coarse centroids with :func:`kmeans_distributed`
    over the JVM-normalized vectors, residual codebooks with
    :func:`pq_codebooks_distributed` (``coarse_cents`` mode) — no
    driver-sample trainer cap anywhere.  The coarse fit seeds from a
    hash-ordered whole-corpus sample (md5 of id, ties by id — one
    TakeOrdered job, deterministic under any partitioning) instead of
    the full k-means|| reduction, then runs 3 distributed Lloyd
    rounds: for an IVF coarse quantizer the cells only PARTITION
    candidates (recall is governed by nprobe, and the ADC scores are
    exact within probed cells), so seeding quality matters far less
    than job count — k-means|| seeding spent ~5 extra Spark jobs per
    fit for no measurable recall gain here (the recall pins and
    summary oracles gate this at every SF).  ``codebook_fit="sample"``
    is the FAISS-standard fast path over the deterministic ordered
    sample.  Returns ``(centroids (k, d), books (m, ksub, d/m))``.

    ``return_assigned=True`` additionally returns the persisted
    :func:`_ivfpq_assign_resid` frame the distributed fit computed
    (``None`` for the sample fit) so the encode step can reuse it
    instead of re-scanning the corpus — caller owns the unpersist."""
    if codebook_fit == "distributed":
        unit = with_norm(corpus, vec_col).select(
            F.col(id_col).alias(id_col),
            # element-wise divide; __norm is lambda-captured so it may
            # re-inline per element (O(d) each) — at vector dims that
            # is d^2 flops/row, dwarfed by the Arrow fit passes
            F.transform(
                F.col("__vec"),
                lambda x: x
                / F.when(F.col("__norm") == 0, F.lit(1.0)).otherwise(
                    F.col("__norm")
                ),
            ).alias(vec_col),
        )
        # ONE materialization of the normalized corpus serves both the
        # seed sample and the Lloyd rounds (guide §2.4): previously the
        # seed TakeOrdered scanned the raw corpus through the O(d^2)
        # normalize transform and kmeans_distributed then re-scanned it
        # to build its persisted (id, vec, qvec) frame — the frame is
        # now built first (the exact expression kmeans_distributed
        # would build) and the seed is taken FROM it, saving a full
        # corpus pass per build.
        e = unit.select(
            F.col(id_col).alias("id"),
            _as_double(F.col(vec_col)).alias("vec"),
            _quantized(vec_col, 1 << 20).alias("qvec"),
        ).persist()
        try:
            hkey = F.md5(F.concat_ws("|", F.col("id"), F.lit("ivfpqseed")))
            seed_rows = (
                e.withColumn("__h", hkey)
                .orderBy("__h", "id")
                .limit(n_centroids)
                .select("vec")
                .collect()
            )
            if not seed_rows:
                raise ValueError("ivfpq: empty corpus")
            init = np.array(
                [np.asarray(r["vec"], dtype=np.float64) for r in seed_rows]
            )
            cents = kmeans_distributed(
                unit, k=len(init), id_col=id_col, vec_col=vec_col,
                iters=3, init=init, prepared=e,
            )
        finally:
            e.unpersist()
        # ONE shared normalize+assign+residual pass feeds both the
        # codebook fit's quantization and (via return_assigned) the
        # encode step — previously each re-scanned the raw corpus to
        # recompute it (guide §8: move the heavy read once)
        assigned = _ivfpq_assign_resid(corpus, cents, id_col, vec_col).persist(
            StorageLevel.DISK_ONLY
        )
        try:
            books = pq_codebooks_distributed(
                corpus, m, ksub, id_col=id_col, vec_col=vec_col,
                coarse_cents=cents, iters=3, prepared_resid=assigned,
            )
        except Exception:
            assigned.unpersist()
            raise
        if return_assigned:
            return cents, books, assigned
        assigned.unpersist()
        return cents, books
    if codebook_fit != "sample":
        raise ValueError(f"ivfpq: unknown codebook_fit {codebook_fit!r}")
    sample_rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(sample_size).collect()
    )
    if not sample_rows:
        raise ValueError("ivfpq: empty corpus")
    S = np.array([np.asarray(r[1], dtype=np.float64) for r in sample_rows])
    nrm = np.linalg.norm(S, axis=1)
    S = S / np.where(nrm == 0, 1.0, nrm)[:, None]
    d = S.shape[1]
    if d % m != 0:
        raise ValueError(f"ivfpq: dim {d} not divisible by m={m}")
    cents = _kmeans_lite(S, k=n_centroids)
    c_sq = (cents**2).sum(axis=1)
    assign_s = (-2.0 * (S @ cents.T) + c_sq[None, :]).argmin(axis=1)
    books = pq_codebooks(S - cents[assign_s], m, ksub)
    if return_assigned:
        return cents, books, None
    return cents, books


def _ivfpq_assign_resid(
    corpus: DataFrame,
    cents: np.ndarray,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """One Arrow pass shared by the IVFPQ codebook fit and the encode
    step: ``(id, cell, resid)`` — the L2-normalized vector's nearest
    coarse cell (row-local argmin, split-invariant) and its FLOAT64
    residual ``v/||v|| - centroid[cell]``.

    Exists because the distributed fit and the encode otherwise each
    re-scan the raw corpus to recompute EXACTLY this (normalize →
    assign → subtract): at index-build scale that is a redundant full
    pass over the corpus (guide §8: materialize a scan's output once
    and reuse it).  The residual is kept in float64 — not fixed point
    — so the codebook fit's ``np.rint(resid * scale)`` quantization
    and the encode's code argmins both see bit-identical inputs to
    what their own passes computed (pinned in
    tests/test_ivfpq_shared_assign.py).  The caller persists
    (DISK_ONLY — the frame is corpus-sized, d doubles/row) and owns
    the unpersist."""
    import pandas as pd
    from pyspark.sql import types as T

    cents = np.asarray(cents, dtype=np.float64)
    c_sq = (cents**2).sum(axis=1)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("cell", T.IntegerType()),
            T.StructField("resid", T.ArrayType(T.DoubleType())),
        ]
    )

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            n_ = np.linalg.norm(V, axis=1)
            V = V / np.where(n_ == 0, 1.0, n_)[:, None]
            cell = (-2.0 * (V @ cents.T) + c_sq[None, :]).argmin(axis=1)
            R_ = V - cents[cell]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "cell": cell.astype(np.int32),
                    "resid": list(R_),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(assign, schema)


def _ivfpq_encode(
    corpus: DataFrame,
    cents: np.ndarray,
    books: np.ndarray,
    id_col: str,
    vec_col: str,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """One Arrow pass: ``(cell, neighbor_id, codes)`` — each vector
    assigned to its nearest coarse cell, its residual quantized to m
    codes (row-local argmins: split-invariant).

    ``assigned`` (an :func:`_ivfpq_assign_resid` frame) skips the
    normalize+assign recompute and codes the stored residuals instead
    of re-scanning the raw corpus — bit-identical output (same float64
    residuals, same argmins; pinned), one fewer corpus pass."""
    import pandas as pd
    from pyspark.sql import types as T

    m, _, dsub = books.shape
    c_sq = (cents**2).sum(axis=1)
    b_sq = (books**2).sum(axis=2)
    code_schema = T.StructType(
        [
            T.StructField("cell", T.IntegerType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def _codes(R_: np.ndarray) -> np.ndarray:
        codes = np.empty((len(R_), m), dtype=np.int32)
        for j in range(m):
            sub = R_[:, j * dsub : (j + 1) * dsub]
            codes[:, j] = (
                -2.0 * (sub @ books[j].T) + b_sq[j][None, :]
            ).argmin(axis=1)
        return codes

    if assigned is not None:

        def encode_assigned(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                R_ = np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf["resid"]]
                )
                yield pd.DataFrame(
                    {
                        "cell": pdf["cell"].astype("int32"),
                        "neighbor_id": pdf["id"].astype("int64"),
                        "codes": list(_codes(R_)),
                    }
                )

        return assigned.mapInPandas(encode_assigned, code_schema)

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            n_ = np.linalg.norm(V, axis=1)
            V = V / np.where(n_ == 0, 1.0, n_)[:, None]
            cell = (-2.0 * (V @ cents.T) + c_sq[None, :]).argmin(axis=1)
            R_ = V - cents[cell]
            yield pd.DataFrame(
                {
                    "cell": cell.astype(np.int32),
                    "neighbor_id": pdf[id_col].astype("int64"),
                    "codes": list(_codes(R_)),
                }
            )

    return corpus.mapInPandas(encode, code_schema)


def _ivfpq_probe(
    coded: DataFrame,
    cents: np.ndarray,
    books: np.ndarray,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    nprobe: int,
    shortlist: int,
    id_col: str,
    vec_col: str,
    exclude_self: bool,
    cell_filter: bool = False,
) -> DataFrame:
    """ADC-scan the probed cells' code rows (map-side per-batch top-R)
    and refine the per-query shortlist with the exact cosine against
    ``corpus`` (the raw-vector store — PQ indexes deliberately do not
    hold raw vectors).  ``cell_filter=True`` pushes a ``cell IN
    (probed)`` predicate into the coded scan — on a cell-bucketed
    index table that enables bucket pruning."""
    import pandas as pd
    from pyspark.sql import types as T

    m, _, dsub = books.shape
    c_sq = (cents**2).sum(axis=1)
    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        raise ValueError("ivfpq: empty queries")
    q_ids = np.array([int(r[0]) for r in q_rows], dtype=np.int64)
    Q = np.array([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    qn = np.linalg.norm(Q, axis=1)
    Q = Q / np.where(qn == 0, 1.0, qn)[:, None]
    qcells = np.argsort(-2.0 * (Q @ cents.T) + c_sq[None, :], axis=1)[:, :nprobe]
    tabmap = {}
    probes: dict[int, list[int]] = {}
    for qi in range(len(Q)):
        for cell in qcells[qi]:
            res = Q[qi] - cents[cell]
            tabmap[(qi, int(cell))] = np.stack(
                [
                    ((res[j * dsub : (j + 1) * dsub] - books[j]) ** 2).sum(axis=1)
                    for j in range(m)
                ]
            )
            probes.setdefault(int(cell), []).append(qi)

    if cell_filter:
        coded = coded.filter(
            F.col("cell").isin([int(c) for c in probes])
        )

    adc_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("adc", T.DoubleType()),
        ]
    )
    R_cap = int(shortlist)
    excl = exclude_self

    def adc_scan(batches):
        cols = np.arange(m)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_q, out_i, out_s = [], [], []
            for cell, grp in pdf.groupby("cell"):
                qis = probes.get(int(cell))
                if not qis:
                    continue
                C = np.array(list(grp["codes"]), dtype=np.int64)
                ids = grp["neighbor_id"].to_numpy(dtype=np.int64)
                for qi in qis:
                    s = tabmap[(qi, int(cell))][cols[None, :], C].sum(axis=1)
                    mask = ids != q_ids[qi] if excl else np.ones(len(ids), bool)
                    sm, im = s[mask], ids[mask]
                    order = np.lexsort((im, sm))[:R_cap]
                    out_q.append(np.full(len(order), q_ids[qi], dtype=np.int64))
                    out_i.append(im[order])
                    out_s.append(sm[order])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_i),
                    "adc": np.concatenate(out_s),
                }
            )

    cand = coded.mapInPandas(adc_scan, adc_schema)
    w_r = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc()
    )
    short = (
        cand.withColumn("__r", F.row_number().over(w_r))
        .filter(F.col("__r") <= R_cap)
        .select("query_id", "neighbor_id")
    )
    nvec = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__vec").alias("nvec"),
        F.col("__norm").alias("nnorm"),
    )
    qvec = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("__vec").alias("qvec"),
        F.col("__norm").alias("qnorm"),
    )
    refined = (
        short.join(nvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .withColumn(
            "cos",
            dot(F.col("qvec"), F.col("nvec")) / (F.col("qnorm") * F.col("nnorm")),
        )
    )
    w_k = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        refined.withColumn("rk", F.row_number().over(w_k).cast("long"))
        .filter(F.col("rk") <= k)
        .select("query_id", "rk", "neighbor_id")
    )


def cosine_topk_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 16,
    shortlist: int | str = "auto",
    sample_size: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    codebook_fit: str = "sample",
    quantizers: tuple[np.ndarray, np.ndarray] | None = None,
) -> DataFrame:
    """The full FAISS IVFPQ construction [Jégou et al. 2011],
    DataFrame-shaped: a coarse quantizer partitions the corpus into
    cells, each vector's RESIDUAL (v - centroid) is product-quantized
    to m codes, and a query ADC-scans only its ``nprobe`` nearest
    cells — composing :func:`cosine_topk_ivf`'s candidate pruning
    with :func:`pq_topk`'s compressed-domain scoring:

      * cell pruning cuts candidates to ~nprobe/n_centroids of the
        corpus BEFORE any scoring,
      * residual PQ (codebooks fit on residuals, which are smaller
        and better centered than raw vectors — the reason IVFPQ
        encodes residuals; FAISS-standard sample fit by default,
        ``codebook_fit="distributed"`` for a whole-corpus fit, or
        pass ``quantizers=(centroids, books)`` to reuse a
        precomputed pair — see :func:`_ivfpq_fit`) scores those
        candidates from m-byte codes via per-(query, cell) lookup
        tables,
      * the per-query shortlist re-ranks by exact cosine.

    ADC tables are (nq * nprobe) x m x ksub doubles built driver-side
    from the bounded query set (scalar-broadcast pattern); the scan is
    one Arrow pass over the CELL-PRUNED code rows with map-side
    per-batch top-R, so shuffle rows are O(batches * queries * R).
    Determinism: all assignments are row-local argmins with
    fixed-order inputs, scores are fixed-order m-term float64 sums,
    and every selection orders by (score, neighbor_id) — output is
    bit-identical under any partitioning (pytest-pinned).

    For a standing corpus, persist the codes once with
    :func:`write_ivfpq_index` and probe with
    :func:`cosine_topk_ivfpq_indexed` (bit-identical, test-pinned).

    Output: ``(query_id, rk, neighbor_id)``.
    """
    if shortlist == "auto":
        # corpus-size-independent refine bound (see pq_topk: ADC rank
        # displacement is quantization-error-bounded, and here the
        # probed-cell pruning already caps candidates at
        # ~nprobe/n_centroids of the corpus); no count() job
        shortlist = max(100, 64 * k)
    if quantizers is not None:
        cents = np.asarray(quantizers[0], dtype=np.float64)
        books = np.asarray(quantizers[1], dtype=np.float64)
        if (
            books.ndim != 3
            or books.shape[0] != m
            or books.shape[1] != ksub
            or cents.ndim != 2
            or cents.shape[1] != m * books.shape[2]
        ):
            raise ValueError(
                "cosine_topk_ivfpq: precomputed quantizers shapes "
                f"{cents.shape}/{books.shape} do not match "
                f"(m={m}, ksub={ksub})"
            )
    else:
        # mirror write_ivfpq_index (ADVICE r10): the distributed fit
        # already persisted the corpus-sized (id, cell, resid) pass —
        # reuse it for the encode instead of re-scanning the raw
        # corpus (bit-identical codes, tests/test_ivfpq_shared_assign)
        cents, books, assigned = _ivfpq_fit(
            corpus, n_centroids, m, ksub, sample_size, id_col, vec_col,
            codebook_fit=codebook_fit, return_assigned=True,
        )
        if assigned is not None:
            try:
                # the probe result is lazy, so the assigned frame can't
                # stay persisted until the caller's action: materialize
                # the (m bytes/vector) codes eagerly — one read of the
                # already-persisted residual blocks, one small write —
                # and release the float64 residuals now
                coded = _ivfpq_encode(
                    corpus, cents, books, id_col, vec_col,
                    assigned=assigned,
                ).localCheckpoint(eager=True)
            finally:
                assigned.unpersist()
            return _ivfpq_probe(
                coded, cents, books, corpus, queries, k, nprobe,
                int(shortlist), id_col, vec_col, exclude_self,
            )
    coded = _ivfpq_encode(corpus, cents, books, id_col, vec_col)
    return _ivfpq_probe(
        coded, cents, books, corpus, queries, k, nprobe, int(shortlist),
        id_col, vec_col, exclude_self,
    )


def write_ivfpq_index(
    corpus: DataFrame,
    name: str,
    n_centroids: int = 16,
    m: int = 8,
    ksub: int = 16,
    num_buckets: int = 8,
    sample_size: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
    codebook_fit: str = "distributed",
) -> None:
    """Persist an IVFPQ index as managed tables — the compressed
    sibling of :func:`write_ivf_index`:

    * ``{name}_codes``     (cell, neighbor_id, codes), bucketed by
      cell — m ints per vector instead of raw doubles+norms, the
      ~64x smaller standing state that makes a billion-vector index
      scan-resident; the probed-cell filter enables bucket pruning;
    * ``{name}_centroids`` (cell, centroid) — the coarse quantizer;
    * ``{name}_books``     (subspace, code, centroid) — the m*ksub
      residual codebook rows;
    * ``{name}_meta``      construction parameters, so probes can't
      silently mix quantizers.

    Raw vectors are deliberately NOT stored (the point of PQ);
    :func:`cosine_topk_ivfpq_indexed` takes the raw-vector table for
    its exact refinement step.  As with the IVF index, a fresh build
    fits fresh data-dependent quantizers, so only ``mode="overwrite"``
    is valid; daily arrivals go through :func:`append_ivfpq_index`
    (stored quantizers reused), and ``compact_ivf_index``'s swap
    recipe applies to ``{name}_codes`` unchanged.

    Scratch-disk note for billion-vector builds: the distributed fit
    persists ONE corpus-sized frame (the shared ``(id, cell, resid)``
    float64 assignment pass, DISK_ONLY) for the whole build — the PQ
    Lloyd rounds and the encode read it directly and quantize
    in-batch, so peak temporary footprint is ~d doubles per vector
    (plus the normalized-corpus Lloyd frame during the coarse fit
    only), not a second fixed-point copy on top.
    """
    from .skew import write_bucketed

    spark = corpus.sparkSession
    if mode != "overwrite":
        raise ValueError(
            "write_ivfpq_index: only mode='overwrite' is valid — a "
            "fresh build fits fresh quantizers; append daily arrivals "
            "with append_ivfpq_index instead"
        )
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for t in (
        f"{name}_codes", f"{name}_centroids", f"{name}_books", f"{name}_meta"
    ):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        path = spark._jvm.org.apache.hadoop.fs.Path(f"{warehouse}/{t.lower()}")
        fs = path.getFileSystem(hconf)
        if fs.exists(path):
            fs.delete(path, True)
    cents, books, assigned = _ivfpq_fit(
        corpus, n_centroids, m, ksub, sample_size, id_col, vec_col,
        codebook_fit=codebook_fit, return_assigned=True,
    )
    try:
        # the distributed fit hands back its (id, cell, resid) pass so
        # the encode codes the stored residuals instead of re-scanning
        # the corpus (bit-identical codes; sample fit returns None and
        # keeps the direct corpus pass)
        coded = _ivfpq_encode(
            corpus, cents, books, id_col, vec_col, assigned=assigned
        )
        write_bucketed(
            coded, f"{name}_codes",
            bucket_by="cell", num_buckets=num_buckets, sort_by="cell",
            mode=mode,
        )
    finally:
        if assigned is not None:
            assigned.unpersist()
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cell int, centroid array<double>",
    ).write.mode(mode).saveAsTable(f"{name}_centroids")
    spark.createDataFrame(
        [
            (j, c, [float(x) for x in books[j, c]])
            for j in range(books.shape[0])
            for c in range(books.shape[1])
        ],
        "subspace int, code int, centroid array<double>",
    ).write.mode(mode).saveAsTable(f"{name}_books")
    spark.createDataFrame(
        [(len(cents), int(books.shape[0]), int(books.shape[1]), sample_size)],
        "n_centroids int, m int, ksub int, sample_size int",
    ).write.mode(mode).saveAsTable(f"{name}_meta")


def read_ivfpq_index(spark, name: str):
    """Open a persisted IVFPQ index: returns ``(codes DataFrame,
    centroids ndarray, books ndarray, meta Row)``.  Both quantizers
    are driver-sized by construction (n_centroids x d + m x ksub x
    d/m doubles)."""
    metas = spark.table(f"{name}_meta").collect()
    if len(metas) != 1:
        raise ValueError(
            f"read_ivfpq_index: {name}_meta has {len(metas)} rows — "
            "corrupted (a valid index has exactly one; "
            "append_ivfpq_index never adds meta rows)"
        )
    meta = metas[0]
    cents = np.array(
        [
            list(r.centroid)
            for r in sorted(
                spark.table(f"{name}_centroids").collect(),
                key=lambda r: r.cell,
            )
        ]
    )
    brows = sorted(
        spark.table(f"{name}_books").collect(),
        key=lambda r: (r.subspace, r.code),
    )
    dsub = len(brows[0].centroid)
    books = np.array([list(r.centroid) for r in brows]).reshape(
        meta.m, meta.ksub, dsub
    )
    return spark.table(f"{name}_codes"), cents, books, meta


def append_ivfpq_index(
    new_vectors: DataFrame,
    name: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append daily arrivals to a persisted IVFPQ index: the STORED
    coarse centroids and residual codebooks are reused — arrivals are
    encoded in one Arrow pass over the batch only and land in
    ``{name}_codes`` as a per-bucket file append.  Standing code rows
    are never re-read or re-encoded, and the quantizer tables are
    untouched, so every probe before and after sees the SAME
    quantizers (the append_ivf_index contract, compressed form)."""
    from .skew import write_bucketed

    spark = new_vectors.sparkSession
    _, cents, books, _meta = read_ivfpq_index(spark, name)
    describe = spark.sql(f"DESCRIBE FORMATTED {name}_codes").collect()
    info = {r.col_name.strip(): (r.data_type or "").strip() for r in describe}
    num_buckets = int(info["Num Buckets"])
    coded = _ivfpq_encode(new_vectors, cents, books, id_col, vec_col)
    write_bucketed(
        coded, f"{name}_codes",
        bucket_by="cell", num_buckets=num_buckets, sort_by="cell",
        mode="append",
    )


def cosine_topk_ivfpq_indexed(
    name: str,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    shortlist: int | str = "auto",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Probe a persisted IVFPQ index: same semantics (and bit-identical
    results when the index was built from ``corpus`` — test-pinned) as
    :func:`cosine_topk_ivfpq`, without re-fitting or re-encoding
    anything.  ``corpus`` here is the RAW-VECTOR store consulted only
    by the exact refinement join (shortlist-sized row set); the scan
    side touches only the cell-bucketed code rows, with the
    probed-cell predicate pushed into the scan for bucket pruning."""
    spark = corpus.sparkSession
    coded, cents, books, _meta = read_ivfpq_index(spark, name)
    if shortlist == "auto":
        # same corpus-size-independent bound as cosine_topk_ivfpq —
        # keeps the indexed probe's plan free of a count() job
        shortlist = max(100, 64 * k)
    return _ivfpq_probe(
        coded, cents, books, corpus, queries, k, nprobe, int(shortlist),
        id_col, vec_col, exclude_self, cell_filter=True,
    )


def pca_power_project(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
    iters: int = 6,
    gn_scale: int = 1 << 20,
    v_scale: int = 4096,
) -> DataFrame:
    """Top-principal-component projection via EXACT integer power
    iteration — the step after :func:`embedding_gram_fixed` that turns
    the one-scan Gram aggregate into an actual dimensionality
    reduction, with every arithmetic step replayable cross-engine.

    Recipe: (1) the d x d fixed-point Gram aggregates in ONE corpus
    scan (Arrow integer matmul path); (2) the bounded d^2 result — the
    only thing that reaches the driver, same contract as the quantile
    cutoffs — is normalized entrywise to ``gn_scale`` fixed point
    (floor-div by max |G|, making iteration bounds CORPUS-SIZE-
    INDEPENDENT: |u| <= d * gn_scale * v_scale ~ 2^38) and powered
    ``iters`` times in pure-Python integer arithmetic (u = G v;
    v = floor(u * v_scale / max|u|)), the classic dominant-eigenvector
    iteration in fixed point; (3) the integer direction (sign-
    canonicalized: first nonzero component positive) broadcasts as an
    array literal and every vector's projection is an in-row integer
    zip_with/fold — one more scan, zero shuffle, BIGINT-exact output.

    Float eigensolvers are not engine-portable (LAPACK vs whatever the
    oracle runs); this integer pipeline is bit-identical in any
    engine that can floor-divide, so a DuckDB oracle replays ALL of it
    — Gram, normalization, every iteration, the projection.
    Convergence to the true eigenvector needs a spectral gap (pytest
    pins cosine > 0.99 against numpy on gapped data), but correctness
    of the OUTPUT is exact regardless: it is a pure function of the
    corpus, not of float luck.

    Output: ``(id_col, pc1_fp BIGINT)`` — the projection in units of
    ``1/(scale * v_scale)`` times the corpus norm convention.
    """
    gram = embedding_gram_fixed(df, vec_col=vec_col, scale=scale)
    rows = gram.collect()
    d = max(r.j for r in rows) + 1
    gmax = max(abs(r.gram_fp) for r in rows)
    G = [[0] * d for _ in range(d)]
    if gmax:
        for r in rows:
            gn = (r.gram_fp * gn_scale) // gmax
            G[r.i][r.j] = gn
            G[r.j][r.i] = gn
    v = [v_scale] * d
    for _ in range(iters):
        u = [sum(G[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in u)
        if m == 0:
            break
        v = [(x * v_scale) // m for x in u]
    s = next((1 if x > 0 else -1 for x in v if x), 1)
    v = [x * s for x in v]
    fp = F.expr(
        f"transform({vec_col}, x -> CAST(round(CAST(x AS DOUBLE) * {scale}, 0)"
        " AS BIGINT))"
    )
    vlit = F.array(*[F.lit(x) for x in v])
    proj = F.aggregate(
        F.zip_with(fp, vlit, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(F.col(id_col), proj.alias("pc1_fp"))


def mmr_rerank(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    lam_pct: int = 70,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance diversity rerank [Carbonell & Goldstein
    1998]: from the exact-cosine top-``shortlist`` candidates for ONE
    query vector, greedily select ``k`` so each pick maximizes

        mmr(c) = lam * rel(c) - (1 - lam) * max_{s in selected} sim(c, s)

    with ``lam = lam_pct / 100`` and ties broken by lower id — the
    standard redundancy-penalized selection for RAG context assembly
    and diverse training-batch curation (relevance alone returns near-
    duplicate clusters; MMR spends the budget on coverage).

    Physical split, and why it holds at 100 TB: the CORPUS-sized work
    — cosine against every vector and the top-``shortlist`` cut — is
    one broadcast-query scan + TakeOrderedAndProject, identical to
    :func:`cosine_topk_bruteforce` (swap in an ANN probe upstream for
    a pre-cut corpus when even one scan is too much).  The greedy
    itself is inherently sequential in ``k`` and sees ONLY the
    shortlist (bounded by construction, default 50 rows), so it runs
    driver-side over the collected shortlist — the same query-sized
    scalar bridge as the PQ codebook / quantile-broadcast patterns
    (SURVEY §2 X2), NOT a corpus collect.  Cost O(k * shortlist) dots.

    Cross-engine exactness: relevance comes from the engine's
    sequential-fold :func:`dot` (bitwise DuckDB ``list_dot_product``
    parity); the driver-side pairwise sims replay the identical fold
    (Python float ops are the same IEEE-754 doubles), so a DuckDB
    oracle that unrolls the greedy reproduces every comparison
    bit-for-bit.  Output carries only BIGINTs: (mmr_rank, id,
    rel_e9 = floor(rel * 1e9)).
    """
    if not 0 <= lam_pct <= 100:
        raise ValueError("mmr_rerank: lam_pct must be in [0, 100]")
    q = with_norm(query, vec_col).select(
        F.col("__vec").alias("qvec"), F.col("__norm").alias("qnorm")
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("cand_id"),
        F.col("__vec").alias("nvec"),
        F.col("__norm").alias("nnorm"),
    )
    rel = dot(F.col("qvec"), F.col("nvec")) / (F.col("qnorm") * F.col("nnorm"))
    rows = (
        c.crossJoin(F.broadcast(q))
        .select("cand_id", "nvec", "nnorm", rel.alias("rel"))
        .orderBy(F.col("rel").desc(), "cand_id")
        .limit(shortlist)
        .collect()
    )
    lam = lam_pct / 100.0
    remaining = {
        r["cand_id"]: (list(r["nvec"]), r["nnorm"], r["rel"]) for r in rows
    }

    def _fold_dot(a: list[float], b: list[float]) -> float:
        # identical reduction order to dot()/list_dot_product: products
        # left-folded into the accumulator one element at a time
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    picks: list[tuple[int, int, int]] = []
    maxsim: dict[int, float] = {}
    import math

    while remaining and len(picks) < k:
        if not picks:
            scored = [(v[2], cid) for cid, v in remaining.items()]
        else:
            scored = [
                (lam * v[2] - (1.0 - lam) * maxsim[cid], cid)
                for cid, v in remaining.items()
            ]
        best_score, best_id = max(scored, key=lambda t: (t[0], -t[1]))
        bvec, bnorm, brel = remaining.pop(best_id)
        picks.append(
            (len(picks) + 1, best_id, int(math.floor(brel * 1e9)))
        )
        for cid, (cvec, cnorm, _crel) in remaining.items():
            s = _fold_dot(cvec, bvec) / (cnorm * bnorm)
            if cid not in maxsim or s > maxsim[cid]:
                maxsim[cid] = s
    spark = corpus.sparkSession
    return spark.createDataFrame(
        picks, schema="mmr_rank bigint, vec_id bigint, rel_e9 bigint"
    )


def kcenter_select(
    corpus: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center coreset selection [Gonzalez 1985, 2-approx for
    the k-center objective]: pick the point FARTHEST from everything
    picked so far, ``k`` times — the standard diversity/coverage
    selection for eval-set construction, labeling budgets, and
    codebook seeding.  Farthest-in-cosine = lowest max-cosine to any
    selected center; the first pick is the lowest id (a deterministic
    seed the oracle can replay; k-means++-style random seeding would
    not be).  Ties break to the lower id.

    Where :func:`mmr_rerank`'s greedy sees only a bounded shortlist,
    k-center's greedy state is CORPUS-sized by definition, so the
    operator keeps it distributed: one running ``best_cos`` column
    (max cosine to any selected center) maintained incrementally —
    per round ONE narrow map (``greatest(best_cos, cos(row, new
    center))``, the center rides in as a broadcast literal array, no
    join) + one TakeOrderedAndProject argmin; ``localCheckpoint`` per
    round keeps the plan O(1) in rounds.  Per round the cluster moves
    O(|corpus|) compute and O(1) rows to the driver — never vectors,
    except the k selected ones.  Recomputing max-cos against all
    centers each round (the stateless form) would be k× the work for
    identical results.

    Cross-engine exactness: the cosine is the sequential-fold
    :func:`dot`; the incremental ``greatest`` fold is replayed
    verbatim by the oracle (same doubles → same comparisons).  Output
    BIGINTs only: ``(pick_round, id, maxcos_e9)`` where ``maxcos_e9 =
    floor(best_cos * 1e9)`` AT SELECTION TIME (round 1 carries the
    ``-2.0`` init sentinel = -2000000000: nothing was selected yet).
    """
    import math

    if k < 1:
        raise ValueError("kcenter_select: k must be >= 1")
    state = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("id"),
        F.col("__vec").alias("vec"),
        F.col("__norm").alias("nrm"),
        F.lit(-2.0).alias("best_cos"),
    ).localCheckpoint(eager=True)
    picks: list[tuple[int, int, int]] = []
    chosen: list[int] = []
    for rnd in range(1, k + 1):
        cand = (
            state.filter(~F.col("id").isin(chosen)) if chosen else state
        )
        row = (
            cand.orderBy(F.col("best_cos").asc(), F.col("id").asc())
            .limit(1)
            .collect()
        )
        if not row:
            break  # corpus exhausted before k
        r = row[0]
        picks.append((rnd, r["id"], int(math.floor(r["best_cos"] * 1e9))))
        chosen.append(r["id"])
        cvec = F.array(*[F.lit(float(x)) for x in r["vec"]])
        cnorm = float(r["nrm"])
        new_cos = dot(F.col("vec"), cvec) / (F.col("nrm") * F.lit(cnorm))
        prev = state
        state = state.select(
            "id",
            "vec",
            "nrm",
            F.greatest(F.col("best_cos"), new_cos).alias("best_cos"),
        ).localCheckpoint(eager=True)
        prev.unpersist()
    state.unpersist()
    spark = corpus.sparkSession
    return spark.createDataFrame(
        picks, schema="pick_round bigint, vec_id bigint, maxcos_e9 bigint"
    )
