"""Similarity search over embedding columns (array<float>).

Two paths, same contract:
- :func:`cosine_topk` — brute-force exact top-k: broadcast the (small)
  query set against the corpus, dot products via zip_with/aggregate
  (JVM-side, no UDF), TakeOrdered per query. The verifier and the
  right plan when the query set is small.
- :func:`lsh_ann_topk` — random-hyperplane LSH: corpus and queries get
  a P-bit signature; candidates share a bucket; exact re-rank within
  candidates. At 100 TB the bucket join replaces the full cross
  product — the cross-product side never materializes.

Hyperplanes are pseudo-random +/-1 vectors derived from md5(plane:dim),
so signatures are deterministic and reproducible in the DuckDB oracle
(no RNG state, no JVM-only hashing).

Measured dead end (do not retry): unrolling the dot products into
explicit GetArrayItem multiply-add chains (dim=64 terms) to escape the
HOF CodegenFallback made things 5-10x SLOWER (lsh_ann 3.4s -> 22s,
ivf 2.1s -> 29s at sf0.1) — the giant expression trees blow past
codegen method limits and interpret per-node, while the HOF loop
interprets one compact loop. The aggregate/zip_with forms below are
the fastest JVM-side shape at embedding dims.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve here
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; a zero-norm side yields 0.0 ("no similarity"),
    not an error. Under ANSI mode (the Spark 4 default) a plain
    division throws DIVIDE_BY_ZERO the moment a padding/failed-encode
    zero vector reaches it — a corpus-scale job killer
    (tests/test_degenerate_inputs.py sweeps this). try_divide keeps
    the norms evaluated once each and returns NULL on a 0 divisor,
    coalesced to 0.0."""
    return F.coalesce(
        F.try_divide(dot(a, b), norm(a) * norm(b)), F.lit(0.0)
    )


def _nonnull(df: DataFrame, vec_col: str) -> DataFrame:
    """NULL embeddings (failed encodes, unbackfilled rows) are DROPPED
    at every frame-operator boundary: a null vector has no geometry to
    compare, and letting it flow produces either an arbitrary
    assignment (expr paths coalesce its cosine to 0.0) or a numpy
    object-array crash (Arrow paths). One uniform rule, swept by
    tests/test_degenerate_inputs.py."""
    return df.filter(F.col(vec_col).isNotNull())


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (excluding self-matches
    on equal ids). Output: (query_id, rank, neighbor_id, cos)."""
    q = _nonnull(queries, vec_col).select(
        F.col(query_id_col), F.col(vec_col).alias("qv")
    )
    c = _nonnull(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .select(
            query_id_col,
            "neighbor_id",
            F.round(cosine(F.col("cv"), F.col("qv")), 4).alias("cos"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cos")
    )


def _plane_signs(p: int, dim: int) -> list[float]:
    """The +/-1 hyperplane h_p: element d = +1 if the top bit of the
    first hex digit of md5(p||':'||d) is set else -1. Computed
    driver-side with hashlib — md5 over the same ASCII bytes is
    bit-identical to both Spark's and DuckDB's md5, so the signatures
    stay deterministic and oracle-reproducible while the per-row plan
    never hashes anything (the hyperplanes are planes x dims literals,
    broadcast with the plan)."""
    import hashlib

    return [
        1.0 if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0], 16) >= 8
        else -1.0
        for d in range(dim)
    ]


def hyperplane_signature(vec: Column, dim: int, planes: int = 8,
                         offset: int = 0) -> Column:
    """P-bit signature: bit p = sign of <v, h_p> (hyperplanes from
    :func:`_plane_signs`). ``offset`` shifts the plane indices so
    independent tables (see :func:`lsh_ann_topk` ``tables``) draw
    disjoint hyperplanes. The dot product folds left-to-right exactly
    like the oracle's list_reduce, so float sums agree bitwise."""
    bits = []
    for p in range(offset, offset + planes):
        h = F.array(*[F.lit(s) for s in _plane_signs(p, dim)])
        proj = F.aggregate(
            F.zip_with(vec, h, lambda v, s: v.cast("double") * s),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_signatures(vec: Column, dim: int, planes: int = 8,
                   tables: int = 1) -> Column:
    """Array of ``tables`` independent P-bit signatures (disjoint
    hyperplane sets)."""
    return F.array(
        *[hyperplane_signature(vec, dim, planes, offset=t * planes)
          for t in range(tables)]
    )


def lsh_signatures_pandas(dim: int, planes: int = 8, tables: int = 1):
    """PRODUCTION twin of :func:`lsh_signatures`: one Arrow-batched
    pandas UDF computing all ``tables*planes`` projections as a single
    numpy matmul (batch × dim) @ (dim × planes*tables), then packing
    sign bits to the same array-of-bitstring layout.

    Same hyperplane family (md5-derived ±1 literals) — but float
    SUMMATION ORDER differs from the left-fold HOF, so a projection
    sitting within rounding error of 0 can flip a bit vs the oracle
    variant; that is why this path is rows-only checked, like the
    xxhash64 MinHash twin. Measured: replaces ``tables*planes``
    interpreted HOF folds per row with one BLAS call per Arrow batch.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    H = np.asarray(
        [_plane_signs(p, dim) for p in range(planes * tables)], dtype=np.float64
    ).T  # (dim, planes*tables)

    @pandas_udf("array<string>")
    def sigs(vecs: pd.Series) -> pd.Series:
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(X) == 0:
            return pd.Series([], dtype=object)
        bits = (X @ H) >= 0  # (batch, planes*tables)
        out = []
        for row in bits:
            out.append([
                "".join("1" if b else "0"
                        for b in row[t * planes:(t + 1) * planes])
                for t in range(tables)
            ])
        return pd.Series(out)

    return sigs


def _require_centroids(rows, twin: str) -> None:
    """Shared empty-centroid contract of both assignment twins: RAISE.
    A zero-row centroid frame reaching assignment is an operational
    error (a never-written centroid table reads as an empty typed
    frame with no warning; kmeans_centroids over an all-degenerate
    corpus returns empty by contract) — and every quiet alternative is
    worse: a zero-row assignment silently drops 100% of the corpus
    through semdedup's keep-filter, and a NULL pseudo-cluster silently
    caps the whole corpus as ONE cluster in quota consumers. Loud
    beats silent data loss (r07 third review). Keep/drop consumers
    that have a sound no-clusters semantics implement it themselves
    (dedup.semdedup: no clusters -> nothing is a duplicate)."""
    if not rows:
        raise ValueError(
            f"{twin}: empty centroid frame — train centroids first "
            "(kmeans_centroids returns empty only for a corpus with "
            "no usable vectors) or check the centroid table was "
            "actually written; assigning against zero centroids "
            "would silently lose data downstream"
        )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    with_score: bool = False,
) -> DataFrame:
    """IVF index build: assign every corpus vector to its nearest
    centroid by cosine (ties -> lowest centroid id).

    The centroid set is nlist rows (a k-means result or seed sample),
    so it is collected driver-side and inlined as plan literals: the
    whole assignment is then ONE narrow projection — argmax over an
    array of (cos, centroid) structs — with no join and **no shuffle**
    of the corpus. At 100 TB that matters: the alternative
    (cross-join + groupBy(id).max_by) shuffles every corpus row once
    for no reason. Output: (id, vec, centroid_id); ``with_score`` adds
    ``centroid_cos`` (the winning 4dp cosine — SemDeDup's keep rule
    ranks cluster members by it)."""
    corpus = _nonnull(corpus, vec_col)
    cent_rows = centroids.select(
        F.col(centroid_id_col), F.col(vec_col)
    ).collect()  # nlist rows — dim-scale, like the star-join dims
    _require_centroids(cent_rows, "ivf_assign")
    scored = F.array(*[
        F.struct(
            F.round(
                cosine(
                    F.col(vec_col),
                    F.array(*[F.lit(float(x)) for x in r[vec_col]]),
                ), 4,
            ).alias("ccos"),
            # struct max takes the larger ncid on cos ties = smaller id
            F.lit(-int(r[centroid_id_col])).cast("long").alias("ncid"),
        )
        for r in cent_rows
    ])
    best = F.array_max(scored)
    out = [
        F.col(id_col), F.col(vec_col),
        (-best["ncid"]).alias(centroid_id_col),
    ]
    if with_score:
        out.append(best["ccos"].alias("centroid_cos"))
    return corpus.select(*out)


def ivf_assign_pandas(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    with_score: bool = False,
) -> DataFrame:
    """PRODUCTION twin of :func:`ivf_assign`: the argmax over centroids
    as one numpy matmul per Arrow batch instead of nlist inlined-literal
    cosine expressions — the shape that stays flat as nlist grows to
    production sizes (256-65k lists), where a literal expression tree
    would explode (measured r04: at nlist=256 on 80k vecs the inlined
    assignment dominates semdedup's runtime). Same contract: cosine
    rounded to 4dp, ties to the lowest centroid id; still no join and
    no corpus shuffle. ``with_score`` adds ``centroid_cos`` like
    :func:`ivf_assign`."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    corpus = _nonnull(corpus, vec_col)
    rows = sorted(
        centroids.select(centroid_id_col, vec_col).collect(),
        key=lambda r: r[centroid_id_col],
    )
    _require_centroids(rows, "ivf_assign_pandas")
    ids = np.asarray([int(r[centroid_id_col]) for r in rows])
    C = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    dim = Cn.shape[1]  # rows is non-empty past _require_centroids

    @pandas_udf("struct<centroid_id: long, centroid_cos: double>")
    def assign(vecs: pd.Series) -> pd.DataFrame:
        n = len(vecs)
        if n == 0:
            return pd.DataFrame(
                {"centroid_id": pd.Series([], dtype="int64"),
                 "centroid_cos": pd.Series([], dtype="float64")}
            )
        arrs = [np.asarray(v, dtype=np.float64) for v in vecs]
        lens = np.asarray([a.shape[0] for a in arrs])
        # Length-mismatched vectors (empty arrays from failed encodes,
        # ragged dims) can't join the BLAS stack — and on the expr twin
        # their zip_with dot is NULL-contaminated, coalesced to cosine
        # 0.0, so the argmax tie falls to the LOWEST centroid id. Same
        # contract here: preassign ids[0]/0.0, overwrite the dim-true
        # rows with the matmul result. Without this split, np.asarray
        # over a ragged batch builds an object array and norm/matmul
        # crash the whole corpus job (degenerate-input sweep pins it).
        out_id = np.full(n, ids[0], dtype="int64")
        out_cos = np.zeros(n, dtype="float64")
        ok = np.flatnonzero(lens == dim)
        if len(ok):
            X = np.stack([arrs[i] for i in ok])
            Xn = X / np.maximum(
                np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            # HALF_UP rounding to match Spark's F.round (np.round is
            # half-to-even: a score landing exactly on a .00005 midpoint
            # would round differently and could flip the argmax
            # tie-break vs the expr path). HALF_UP = ties away from
            # zero, hence the sign split — cosines can be negative.
            raw = Xn @ Cn.T
            cos = np.sign(raw) * np.floor(np.abs(raw) * 1e4 + 0.5) / 1e4
            # ids ascending + argmax-first-occurrence = lowest-id tie
            best = np.argmax(cos, axis=1)
            out_id[ok] = ids[best]
            # `+ 0.0` normalizes signed zero: the sign-split HALF_UP
            # above emits -0.0 for raw in (-5e-5, 0), where F.round
            # (BigDecimal, no signed zero) emits +0.0 — the house
            # negative-zero contract (SURVEY §5) binds the SPARK side
            # too (r08 review finding).
            out_cos[ok] = cos[np.arange(len(best)), best] + 0.0
        return pd.DataFrame({
            "centroid_id": out_id,
            "centroid_cos": out_cos,
        })

    out = corpus.select(
        F.col(id_col), F.col(vec_col), assign(F.col(vec_col)).alias("_a")
    )
    cols = [
        F.col(id_col), F.col(vec_col),
        F.col("_a.centroid_id").alias(centroid_id_col),
    ]
    if with_score:
        cols.append(F.col("_a.centroid_cos").alias("centroid_cos"))
    return out.select(*cols)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    assignment_impl: str = "expr",
) -> DataFrame:
    """IVF search: each query probes its ``nprobe`` nearest centroids'
    inverted lists and exact-reranks only those candidates.

    The scale path for large corpora with many queries: candidates come
    from an equi-join on ``centroid_id`` (shuffle on nlist keys; skewed
    lists are AQE-splittable), never a cross product. Each corpus vector
    belongs to exactly one list, so (query, neighbor) pairs are already
    distinct — no dedup step. Output: (query_id, rank, neighbor_id, cos).

    Centroid choice is the caller's: pass k-means centroids on a real
    cluster, or any deterministic seed set (the oracle-checked query
    uses the first-nlist vectors) — the probe plan is identical.
    ``assignment_impl``: ``expr`` (inlined literals, oracle-portable) or
    ``pandas`` (:func:`ivf_assign_pandas`, the large-nlist path)."""
    assign_fn = ivf_assign_pandas if assignment_impl == "pandas" else ivf_assign
    assigned = assign_fn(corpus, centroids, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        "centroid_id",
    )
    cent = centroids.select("centroid_id", F.col(vec_col).alias("centv"))
    qscore = (
        _nonnull(queries, vec_col)
        .select(F.col(query_id_col), F.col(vec_col).alias("qv"))
        .crossJoin(F.broadcast(cent))
        .select(
            query_id_col, "qv", "centroid_id",
            F.round(cosine(F.col("qv"), F.col("centv")), 4).alias("qcos"),
        )
    )
    wprobe = Window.partitionBy(query_id_col).orderBy(
        F.desc("qcos"), F.asc("centroid_id")
    )
    probes = (
        qscore.withColumn("rn", F.row_number().over(wprobe))
        .filter(F.col("rn") <= nprobe)
        .select(query_id_col, "qv", "centroid_id")
    )
    scored = (
        assigned.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .select(
            query_id_col,
            "neighbor_id",
            F.round(cosine(F.col("cv"), F.col("qv")), 4).alias("cos"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cos")
    )


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 8,
    tables: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    signature_impl: str = "hof",
) -> DataFrame:
    """Approximate top-k: exact re-rank restricted to candidates sharing
    a bucket in at least one of ``tables`` hash tables (OR
    amplification). Recall tunes with both knobs: fewer ``planes`` ->
    bigger buckets; more ``tables`` -> more chances to collide. At scale
    the (table, bucket) equi-join is a shuffle on a key that fans each
    vector out ``tables`` times — still linear, never the cross product.

    ``signature_impl``: ``hof`` = oracle-portable left-fold expressions;
    ``pandas`` = the production Arrow/numpy batch path
    (:func:`lsh_signatures_pandas` — same hyperplanes, rows-only
    checked)."""
    # one tiny driver action to learn the embedding dim (dims are fixed
    # per table; the hyperplane literals need it at plan build)
    dim = corpus.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    if signature_impl == "pandas":
        udf = lsh_signatures_pandas(dim, planes, tables)
        def sig(col): return udf(col)  # noqa: E306
    elif signature_impl == "hof":
        def sig(col): return lsh_signatures(col, dim, planes, tables)  # noqa: E306
    else:
        raise ValueError(f"unknown signature_impl: {signature_impl}")
    c = _nonnull(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.posexplode(sig(F.col(vec_col))).alias("t", "bucket"),
    )
    q = _nonnull(queries, vec_col).select(
        F.col(query_id_col),
        F.col(vec_col).alias("qv"),
        F.posexplode(sig(F.col(vec_col))).alias("t", "bucket"),
    )
    scored = (
        c.join(F.broadcast(q), ["t", "bucket"])
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .dropDuplicates([query_id_col, "neighbor_id"])
        .select(
            query_id_col,
            "neighbor_id",
            F.round(cosine(F.col("cv"), F.col("qv")), 4).alias("cos"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cos")
    )


def quantize_int8(vec: Column) -> Column:
    """Symmetric int8 quantization for embedding storage: scale =
    127 / max|x|, q_i = round(x_i * scale). Returns a struct
    (scale double, q array<int>) — 4x smaller at rest than float32,
    the standard storage step before ANN indexing at corpus scale.
    Pure narrow projection (JVM expressions), no shuffle; zero vectors
    quantize to all-zeros with scale 0."""
    absmax = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    scale = F.when(absmax == 0, F.lit(0.0)).otherwise(F.lit(127.0) / absmax)
    q = F.transform(vec, lambda x: F.round(x.cast("double") * scale).cast("int"))
    return F.struct(scale.alias("scale"), q.alias("q"))


def kmeans_centroids(
    corpus: DataFrame,
    nlist: int = 8,
    iters: int = 5,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train IVF centroids: spherical k-means (Lloyd's on normalized
    vectors) over a deterministic sample, run driver-side in numpy.

    Centroid TRAINING is sample-scale — a few thousand vectors bound
    the centroid quality regardless of corpus size — so the right tool
    is vectorized numpy on the driver, not a distributed iteration
    (same judgment as the inlined-literal assignment in
    :func:`ivf_assign`; at 100 TB only the ASSIGN step must scale).
    Deterministic end to end: the sample is the ``sample`` lowest ids,
    init is farthest-point from the lowest-id vector, ties and empty
    clusters re-seed deterministically. Output: (centroid_id, vec)
    rows ready for :func:`ivf_topk`."""
    import numpy as np

    rows = (
        _nonnull(corpus, vec_col)
        # empty vectors have no geometry to train on — and one ragged
        # row turns the np.asarray below into an object array that
        # crashes norm/matmul (degenerate-input sweep pins this)
        .filter(F.size(F.col(vec_col)) > 0)
        .select(id_col, vec_col)
        .orderBy(id_col).limit(sample).collect()
    )
    # guard residual raggedness deterministically: train on the modal
    # length (ties -> smallest), drop the rest
    from collections import Counter

    counts = Counter(len(r[vec_col]) for r in rows)
    if counts:
        modal = min(counts, key=lambda d: (-counts[d], d))
        rows = [r for r in rows if len(r[vec_col]) == modal]
    if not rows:
        # a corpus whose every vector is NULL/empty has no geometry at
        # all: return an EMPTY centroid frame (same schema) so
        # downstream assignment joins go empty instead of the shape-
        # (0,) matrix crashing norm/matmul (review r07 finding)
        return corpus.sparkSession.createDataFrame(
            [], f"centroid_id long, {vec_col} array<float>"
        )
    X = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)

    # farthest-point init (deterministic; ties -> lowest index)
    chosen = [0]
    sims = Xn @ Xn[0]
    while len(chosen) < min(nlist, len(Xn)):
        nxt = int(np.argmin(sims))
        chosen.append(nxt)
        sims = np.maximum(sims, Xn @ Xn[nxt])
    C = Xn[chosen].copy()

    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for j in range(len(C)):
            members = Xn[assign == j]
            if len(members):
                c = members.mean(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)
            else:
                # re-seed an empty cluster with the worst-covered point
                worst = int(np.argmin((Xn @ C.T).max(axis=1)))
                C[j] = Xn[worst]

    return corpus.sparkSession.createDataFrame(
        [(j, [float(x) for x in C[j]]) for j in range(len(C))],
        f"centroid_id long, {vec_col} array<float>",
    )


def embedding_dim_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-DIMENSION corpus statistics (n, mean, std, min, max) — the
    normalization/whitening precursor every embedding pipeline runs
    before cosine work (mean-centering, per-dim scaling, dead-dim
    detection: a dimension with ~zero variance carries no signal and
    wastes index bytes). NULL embeddings are dropped at the boundary
    like every vector operator here (:func:`_nonnull`).

    Scale shape: posexplode is rows x dims, but every aggregate
    combines map-side, so the exchange carries O(dims x partials) —
    at dim=64 that is 64 rows per task regardless of corpus size; the
    result is dim-scale and broadcasts back into whatever projection
    applies the normalization. Stats rounded to 4 dp (double) so the
    DuckDB oracle hash-matches despite summation-order differences in
    the last ulps.

    Output: (dim long [0-based], n long, mean, std, vmin, vmax —
    double, 4 dp; std is NULL for a single-vector corpus, the
    stddev_samp convention on both engines).
    """
    e = _nonnull(df, vec_col).select(
        F.posexplode(F.col(vec_col)).alias("dim", "_v")
    )
    v = F.col("_v").cast("double")
    return (
        e.groupBy(F.col("dim").cast("long").alias("dim"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg(v), 4).alias("mean"),
            F.round(F.stddev_samp(v), 4).alias("std"),
            F.round(F.min(v), 4).alias("vmin"),
            F.round(F.max(v), 4).alias("vmax"),
        )
    )


def embedding_covariance(df: DataFrame,
                         vec_col: str = "embedding") -> DataFrame:
    """Upper-triangle POPULATION covariance matrix of the embedding
    distribution — the PCA/whitening precursor (:func:`
    embedding_dim_stats` gives the per-dim diagonal view; this gives
    the cross terms a whitening transform or dead-direction analysis
    needs). cov(i,j) = E[v_i*v_j] - E[v_i]E[v_j], computed from
    map-side-combinable sums so the exchange carries O(dim^2) partials
    per task regardless of corpus size; the result is dim^2/2 rows.

    This is the ORACLE lane: the per-row pair expansion runs inside
    nested array lambdas (interpreted, not codegen — the minhash
    docstring's 90x note applies), which is fine for a
    correctness twin but wrong for a 100 TB pass. Production uses
    :func:`embedding_covariance_pandas` — one numpy Gram matrix per
    Arrow batch, identical output contract (same sums, same rounding),
    equality-tested in tests/test_extensions.py.

    Output: (i long, j long [i<=j], n long, cov double 4 dp).

    Empty vectors (size 0) are skipped like NULLs — without the guard,
    ``F.sequence(0, dim - 1)`` with dim=0 DESCENDS to [0, -1] and
    element_at faults on the empty array (the sequence(start>stop)
    hazard class the degenerate-input sweep pins); the pandas twin's
    ``dim == 0: continue`` skip is the same contract.
    """
    e = (
        _nonnull(df, vec_col)
        .filter(F.size(F.col(vec_col)) > 0)
        .select(F.col(vec_col).alias("_v"))
    )
    dim = F.size("_v")
    pairs = e.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), dim - 1),
                    lambda i: F.transform(
                        F.sequence(i, dim - 1),
                        lambda j: F.struct(
                            i.cast("long").alias("i"),
                            j.cast("long").alias("j"),
                            (
                                F.element_at("_v", (i + 1).cast("int"))
                                .cast("double")
                                * F.element_at("_v", (j + 1).cast("int"))
                                .cast("double")
                            ).alias("p"),
                            F.element_at("_v", (i + 1).cast("int"))
                            .cast("double").alias("vi"),
                            F.element_at("_v", (j + 1).cast("int"))
                            .cast("double").alias("vj"),
                        ),
                    ),
                )
            )
        ).alias("s")
    ).select("s.i", "s.j", "s.p", "s.vi", "s.vj")
    return (
        pairs.groupBy("i", "j")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(
                F.sum("p") / F.count("*")
                - (F.sum("vi") / F.count("*"))
                * (F.sum("vj") / F.count("*")),
                4,
            ).alias("cov"),
        )
    )


def embedding_covariance_pandas(df: DataFrame,
                                vec_col: str = "embedding") -> DataFrame:
    """PRODUCTION twin of :func:`embedding_covariance`: per Arrow
    batch, ONE float64 Gram matrix (X.T @ X) plus a column-sum vector,
    emitted as upper-triangle partial rows — BLAS does the dim^2 work
    batch-at-a-time instead of interpreted per-element lambdas, and
    the partials merge in the same O(dim^2)-group hash agg. The only
    float difference vs the oracle lane is summation ORDER (~1e-13
    relative), far below the 4 dp rounding both lanes share. Rounding
    absorbs MAGNITUDE ulps only — it does not normalize signed zero:
    DuckDB's round() keeps -0.0 for cells in (-0.00005, 0) while
    Spark's BigDecimal round emits +0.0, so the shared oracle appends
    `+ 0` (IEEE: -0.0 + 0 = +0.0). Root cause of the r07 hash fails
    on both covariance lanes (64 negative-zero cells at sf0.01).

    Dirty-input parity with the interpreted twin (code-review fix —
    np.stack used to crash where the lambda lane returned rows):
    vectors are grouped by LENGTH before stacking (a ragged corpus
    contributes each row's own i<=j pairs, like the per-row
    transform), and NULL elements become NaN zeroed out of the sums
    while still counting in n — exactly Spark's null-skipping
    sum / null-counting count(*) aggregate semantics."""
    return covariance_finalize(embedding_covariance_state(df, vec_col))


def embedding_covariance_state(df: DataFrame,
                               vec_col: str = "embedding") -> DataFrame:
    """This run's PERSISTABLE second-moment state from raw embeddings:
    (i, j, sp, si, sj, n) — write it to parquet and a later run merges
    its own via :func:`covariance_partial_state` over the union, then
    :func:`covariance_finalize` for the corpus covariance. The Gram
    work is one numpy matmul per Arrow batch; the output is dim²/2
    rows regardless of corpus size."""
    import numpy as np

    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    partial_schema = StructType([
        StructField("i", LongType()),
        StructField("j", LongType()),
        StructField("sp", DoubleType()),
        StructField("si", DoubleType()),
        StructField("sj", DoubleType()),
        StructField("n", LongType()),
    ])

    def gram(batches):
        for pdf in batches:
            vecs = pdf[vec_col].to_numpy()
            if len(vecs) == 0:
                continue
            by_len: dict = {}
            for v in vecs:
                by_len.setdefault(len(v), []).append(v)
            for dim, group in by_len.items():
                if dim == 0:
                    continue
                # None -> NaN; NaN products/values zero out of the
                # sums (Spark's sum skips nulls) but rows still count
                x = np.array(
                    [np.asarray(v, dtype="float64") for v in group],
                    dtype="float64",
                )
                xz = np.nan_to_num(x, nan=0.0)
                g = xz.T @ xz
                s = xz.sum(axis=0)
                iu, ju = np.triu_indices(dim)
                yield pd.DataFrame({
                    "i": iu.astype("int64"), "j": ju.astype("int64"),
                    "sp": g[iu, ju], "si": s[iu], "sj": s[ju],
                    "n": np.full(len(iu), len(group), dtype="int64"),
                })

    partials = _nonnull(df, vec_col).select(vec_col).mapInPandas(
        gram, schema=partial_schema
    )
    return covariance_partial_state(partials)


def covariance_partial_state(partials: DataFrame) -> DataFrame:
    """Aggregate raw Gram partials into the PERSISTABLE second-moment
    state: one (i, j, sp, si, sj, n) row per pair — the covariance
    member of the cross-run state family (HLL = cardinality,
    histograms = quantiles, Bloom = membership, CMS = frequency,
    THIS = second moments). Merging runs is exact sum-per-pair over
    the union of their state tables (re-apply this function), so a
    later run updates the corpus covariance — and everything derived
    from it, PCA included — at O(its own batch) cost plus an
    O(dim²)-row merge, never re-reading prior embeddings."""
    return partials.groupBy("i", "j").agg(
        F.sum("sp").alias("sp"), F.sum("si").alias("si"),
        F.sum("sj").alias("sj"), F.sum("n").cast("long").alias("n"),
    )


def covariance_finalize(state: DataFrame) -> DataFrame:
    """(i, j, n, cov) from second-moment state:
    cov = sp/n - (si/n)(sj/n), rounded to the 4 dp contract both
    covariance twins share."""
    return state.select(
        "i", "j", F.col("n").cast("long").alias("n"),
        F.round(
            F.col("sp") / F.col("n")
            - (F.col("si") / F.col("n")) * (F.col("sj") / F.col("n")),
            4,
        ).alias("cov"),
    )


def _cov_matrix(cov_rows, dim: int):
    """Dense symmetric matrix from (i, j, cov) upper-triangle rows —
    the single place the mirroring rule lives (pca_components and
    pca_eigenvalues both read it)."""
    import numpy as np

    c = np.zeros((dim, dim))
    for r in cov_rows:
        c[r["i"], r["j"]] = r["cov"]
        c[r["j"], r["i"]] = r["cov"]
    return c


def _pca_start(ki: int, dim: int):
    """Dense deterministic start vector for power-iteration round ki:
    md5-derived values in (-1, 1). DENSE on purpose (review fix): a
    basis-vector start that happens to be an exact eigenvector of a
    weak direction never rotates toward the dominant one — easy to hit
    once the 4 dp covariance rounding zeroes small cross terms. An
    md5-mixed start has generic overlap with every eigendirection."""
    import hashlib

    import numpy as np

    return np.array([
        int(hashlib.md5(f"pca{ki}:{d}".encode()).hexdigest()[:8], 16)
        / float(1 << 31) - 1.0
        for d in range(dim)
    ])


def pca_components(cov_rows, dim: int, k: int = 8,
                   iters: int = 50) -> list:
    """Top-k principal components from a COLLECTED covariance matrix
    (the (i, j, cov) upper-triangle rows of
    :func:`embedding_covariance`): orthogonal (power) iteration with
    deflation on the driver, results sorted by Rayleigh quotient so
    the eigenvalue order holds regardless of which start converged
    where. dim x dim is MODEL-scale math (64x64 = 4 KB) — the same
    driver-side boundary as kmeans_centroids' argmax and BPE's merge
    loop: the corpus-scale pass is the covariance build; everything
    after it is constant-size.

    Deterministic by construction: the start vectors are fixed
    md5-derived dense vectors and the iteration count is pinned, so
    two runs produce identical components up to float ulps. Sign
    convention: each component's largest-|coord| entry is made
    positive. ``k`` is clamped to dim — there are only dim orthogonal
    directions (review fix: the old code appended near-zero garbage
    vectors past dim).

    Returns a list of min(k, dim) lists (each dim floats),
    eigenvalue-ordered.
    """
    import numpy as np

    c = _cov_matrix(cov_rows, dim)
    k = min(k, dim)
    comps = []
    for ki in range(k):
        v = _pca_start(ki, dim)
        v /= np.linalg.norm(v)
        for _ in range(iters):
            # deflate: project out already-found components
            for u in comps:
                v -= np.dot(v, u) * u
            w = c @ v
            n = np.linalg.norm(w)
            if n < 1e-12:
                break
            v = w / n
        for u in comps:
            v -= np.dot(v, u) * u
        n = np.linalg.norm(v)
        v = v / n if n > 1e-12 else v
        top = int(np.argmax(np.abs(v)))
        if v[top] < 0:
            v = -v
        comps.append(v)
    comps.sort(key=lambda u: -float(u @ c @ u))
    return [[float(x) for x in v] for v in comps]


def project_embeddings(df: DataFrame, components: list,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Distributed projection onto PCA components: (id, proj array of
    k doubles) — the dimensionality-reduction / whitening application
    of :func:`pca_components`. Each component is a broadcast-inlined
    literal array; the dot products run through the same
    aggregate-HOF shape as :func:`dot` (keep the HOF — unrolled
    GetArrayItem chains measured 5-10x slower, see module docstring
    history). Pure per-row projection, no shuffle.

    Dirty-input contract (review fix): a ragged or NULL-element
    vector yields proj = NULL for the WHOLE row — one null coordinate
    must not survive into the array, where a later array_join would
    silently skip it and emit a misaligned shorter record.
    """
    vecs = [F.array(*[F.lit(float(x)) for x in comp])
            for comp in components]
    raw = F.array(*[
        F.round(dot(F.col(vec_col), cvec), 4) for cvec in vecs
    ])
    return _nonnull(df, vec_col).select(
        F.col(id_col),
        F.when(
            F.exists(raw, lambda x: x.isNull()),
            F.lit(None).cast("array<double>"),
        ).otherwise(raw).alias("proj"),
    )


def pca_eigenvalues(cov_rows, components) -> list:
    """Rayleigh quotients v^T C v of each component against the
    collected covariance — the variance captured along each principal
    direction. Driver-side dim² math like :func:`pca_components`."""
    import numpy as np

    c = _cov_matrix(cov_rows, len(components[0]))
    return [float(np.asarray(v) @ c @ np.asarray(v)) for v in components]


def whiten_components(components, eigenvalues, eps: float = 1e-9) -> list:
    """Scale principal components to whitening vectors: projecting
    onto component_k / sqrt(eigenvalue_k) gives unit variance along
    every kept direction (PCA whitening). Near-zero eigenvalues are
    floored by ``eps`` — a dead direction stays ~dead instead of
    amplifying float noise to unit scale. Feed the result straight to
    :func:`project_embeddings`."""
    import math

    return [
        [x / math.sqrt(max(ev, eps)) for x in comp]
        for comp, ev in zip(components, eigenvalues)
    ]
