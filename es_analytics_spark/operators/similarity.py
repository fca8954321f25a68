"""Embedding similarity search (SURVEY.md §2.B north-star extensions).

Brute-force cosine is the exact baseline: broadcast the (small) query
set against the corpus and evaluate the dot product with built-in
higher-order array functions — stays in the JVM, no Python boundary.
The scale path buckets the corpus (LSH by sign of random projections)
so each query probes only its bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def with_norm(df: DataFrame, vec_col: str, out_col: str = "norm") -> DataFrame:
    return df.withColumn(out_col, _norm(F.col(vec_col)))


def cosine_pairs_above(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    qid_col: str | None = None,
) -> DataFrame:
    """All (query, corpus) pairs with cosine >= threshold, excluding
    self-pairs. Queries are broadcast (small side by contract)."""
    qid = qid_col or id_col
    q = queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    sim = _dot(F.col("__qv"), F.col("__cv")) / (_norm(F.col("__qv")) * _norm(F.col("__cv")))
    return (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", sim)
        .filter(F.col("cosine") >= threshold)
        .select("query_id", "neighbor_id", "cosine")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    qid_col: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (ties broken by neighbor
    id for determinism)."""
    from pyspark.sql import Window as W

    pairs = cosine_pairs_above(corpus, queries, id_col, vec_col, threshold=-2.0, qid_col=qid_col)
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_attach_buckets(
    df: DataFrame,
    out_id: str,
    out_vec: str,
    num_planes: int = 6,
    num_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Explode each vector row into ``num_tables`` (table, bucket) rows
    under sign-of-random-projection hashing; a `__bucket` struct column
    carries (t, b) so equi-joins on it co-locate collision candidates.

    Bucket signs are computed in one Arrow-batched numpy matmul against
    the stacked (tables×planes, dim) plane matrix — the expression-tree
    form (48 interpreted array-lambda dot products per row) measured
    ~6× slower end-to-end at sf0.01.
    """
    import numpy as np
    import pandas as pd

    plane_mat = np.array(
        [
            plane
            for t in range(num_tables)
            for plane in _fixed_planes(num_planes, dim, seed=88172645463325252 + 7919 * t)
        ],
        dtype=np.float64,
    )  # (num_tables*num_planes, dim)
    weights = np.tile(1 << np.arange(num_planes, dtype=np.int64), num_tables).reshape(
        num_tables, num_planes
    )
    elem = df.schema[1].dataType.elementType.simpleString()

    def compute(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(list(pdf[out_vec]), dtype=np.float64)  # (n, dim)
            signs = (v @ plane_mat.T >= 0).reshape(len(v), num_tables, num_planes)
            b = (signs * weights[None, :, :]).sum(axis=2)  # (n, tables)
            rows = np.repeat(np.arange(len(v)), num_tables)
            yield pd.DataFrame(
                {
                    out_id: pdf[out_id].to_numpy()[rows],
                    out_vec: pdf[out_vec].to_numpy()[rows],
                    "t": np.tile(np.arange(num_tables), len(v)),
                    "b": b.ravel(),
                }
            )

    with_b = df.mapInPandas(
        compute, f"{out_id} long, {out_vec} array<{elem}>, t int, b long"
    )
    return with_b.withColumn("__bucket", F.struct(F.col("t"), F.col("b"))).drop("t", "b")


def lsh_near_dup_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    num_planes: int = 4,
    num_tables: int = 12,
    dim: int = 64,
    round_to: int | None = 6,
) -> DataFrame:
    """Candidate-generation → exact-verify near-duplicate pairs over a
    single corpus — the 100 TB-safe spelling of all-pairs cosine dedup.

    Shape: every vector hashes into ``num_tables`` (table, bucket) keys
    (one Arrow matmul, map-only); one shuffle on the bucket struct
    co-locates each bucket's members (no broadcast of the corpus, no
    driver collect, no n² product); an exact verify runs locally inside
    each bucket group and only id-pairs with cosine ≥ ``threshold``
    leave it. Work scales with bucket collision counts, not |corpus|².

    Recall is the standard multi-table LSH bound 1-(1-p^planes)^tables
    with p = 1 - θ/π; the defaults (4 planes × 12 tables) give ≈0.89 at
    cosine 0.40 and →1 as similarity →1. The exact all-pairs referee
    (:func:`cosine_pairs_above_np` corpus-vs-corpus) lives in tests
    only, where the corpus is fixture-sized by construction.

    Verification runs as a LOCAL numpy matmul inside each (table,
    bucket) group (chunked above 4096 rows to bound the s×s block), and
    only id-pairs above threshold leave the group — the alternative
    (self equi-join carrying both 64-dim vectors through a
    dropDuplicates shuffle, per-pair JVM dot) measured 11.6 s vs ~1 s
    at sf0.1, because a low threshold on near-uniform vectors makes
    ~half of all pairs a candidate in some table and the shuffle was
    moving gigabytes of duplicated vectors. Cross-table duplicates
    collapse in one id-pair aggregate.

    Returns (query_id, neighbor_id, cosine) with query_id < neighbor_id.
    """
    import numpy as np
    import pandas as pd

    b = lsh_attach_buckets(
        corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")),
        "__id",
        "__v",
        num_planes=num_planes,
        num_tables=num_tables,
        dim=dim,
    )

    def verify(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame(
            {"query_id": pd.Series(dtype="int64"),
             "neighbor_id": pd.Series(dtype="int64"),
             "cosine": pd.Series(dtype="float64")}
        )
        if n < 2:
            return empty
        ids = pdf["__id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        v = np.array(list(pdf["__v"].iloc[order]), dtype=np.float64)
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        out = []
        chunk = 4096
        for c0 in range(0, n, chunk):
            c1 = min(c0 + chunk, n)
            sim = v[c0:c1] @ v.T  # (c1-c0, n)
            if round_to is not None:
                sim = np.round(sim, round_to)
            ia, ib = np.nonzero(sim >= threshold)
            gi = ia + c0
            keep = gi < ib  # upper triangle: query_id < neighbor_id
            out.append(
                pd.DataFrame(
                    {
                        "query_id": ids[gi[keep]].astype("int64"),
                        "neighbor_id": ids[ib[keep]].astype("int64"),
                        "cosine": sim[ia[keep], ib[keep]].astype("float64"),
                    }
                )
            )
        return pd.concat(out) if out else empty

    pairs = b.groupBy("__bucket").applyInPandas(
        verify, "query_id long, neighbor_id long, cosine double"
    )
    # the same pair surfaces in every table whose bucket captured it,
    # with an identical cosine — collapse in one id-pair aggregate
    return pairs.groupBy("query_id", "neighbor_id").agg(F.max("cosine").alias("cosine"))


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    num_planes: int = 6,
    num_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: multi-table sign-of-random-projection LSH.

    Each of ``num_tables`` independent tables hashes a vector to a
    bucket from the signs of ``num_planes`` fixed pseudo-random
    hyperplanes; a candidate pair is any (query, corpus) row sharing a
    bucket in ≥1 table (union → distinct). Recall ≈ 1-(1-r)^T per the
    standard LSH analysis; the exact variant is :func:`cosine_topk`.

    At cluster scale this is the path that avoids broadcasting the
    corpus: both sides shuffle once on (table, bucket), candidates are
    deduped, and only candidates pay the full dot product.

    Bucket signs are computed in one Arrow-batched numpy matmul against
    the stacked (tables×planes, dim) plane matrix — the expression-tree
    form (48 interpreted array-lambda dot products per row) measured
    ~6× slower end-to-end at sf0.01.
    """
    from pyspark.sql import Window as W

    c = lsh_attach_buckets(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        "neighbor_id",
        "__cv",
        num_planes=num_planes,
        num_tables=num_tables,
        dim=dim,
    )
    q = lsh_attach_buckets(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
        "query_id",
        "__qv",
        num_planes=num_planes,
        num_tables=num_tables,
        dim=dim,
    )
    cand = (
        c.join(q, "__bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__qv", "__cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = _dot(F.col("__qv"), F.col("__cv")) / (_norm(F.col("__qv")) * _norm(F.col("__cv")))
    pairs = cand.withColumn("cosine", sim)
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_pairs_above_np(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    qid_col: str | None = None,
    round_to: int | None = 6,
    max_query_rows: int = 4096,
) -> DataFrame:
    """NumPy-vectorized :func:`cosine_pairs_above` — the brute-force
    scale path.

    The query side (small by contract) is collected and shipped to
    every task; each Arrow batch of corpus rows computes a blocked
    float64 matmul against it. ~100× the throughput of the per-pair
    array-expression form (which allocates a zipped array per pair and
    runs interpreted, outside whole-stage codegen). Distribution shape
    is identical: corpus stays partitioned, no shuffle, work is
    O(batch × queries) flops in BLAS.

    ``max_query_rows`` enforces the "small by contract" side: the
    collect goes through a LIMIT (so the driver never receives more
    than the bound even from a huge input) and raises instead of
    silently degrading into an all-pairs full-corpus broadcast — the
    self-dedup shape belongs to :func:`lsh_near_dup_pairs`.

    With ``round_to`` the cosine is rounded (as the JVM variant's
    callers do) so results compare stably across engines.
    """
    import numpy as np
    import pandas as pd

    qid = qid_col or id_col
    q_rows = (
        queries.select(F.col(qid).alias("qid"), F.col(vec_col).alias("qv"))
        .limit(max_query_rows + 1)
        .collect()
    )
    if len(q_rows) > max_query_rows:
        raise ValueError(
            f"cosine_pairs_above_np: query side exceeds max_query_rows={max_query_rows}; "
            "it is collected to the driver and must be small by contract — "
            "use lsh_near_dup_pairs / ivf_topk for corpus-scale inputs"
        )
    q_ids = np.array([r.qid for r in q_rows], dtype=np.int64)
    q_mat = np.array([r.qv for r in q_rows], dtype=np.float64)
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))

    def compute(batches):
        for pdf in batches:
            c_ids = pdf["nid"].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf["cv"]), dtype=np.float64)
            if len(c_mat) == 0:
                continue
            c_norm = np.sqrt((c_mat * c_mat).sum(axis=1))
            sims = (c_mat @ q_mat.T) / np.outer(c_norm, q_norm)
            if round_to is not None:
                sims = np.round(sims, round_to)
            ci, qi = np.nonzero((sims >= threshold) & (c_ids[:, None] != q_ids[None, :]))
            yield pd.DataFrame(
                {
                    "query_id": q_ids[qi],
                    "neighbor_id": c_ids[ci],
                    "cosine": sims[ci, qi],
                }
            )

    src = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("cv"))
    return src.mapInPandas(compute, "query_id long, neighbor_id long, cosine double")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    centroid_stride: int = 50,
    nprobe: int = 2,
    max_centroids: int = 256,
    quantizer: str = "stride",
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index.

    Coarse quantizer (``quantizer``): ``"stride"`` takes every
    ``centroid_stride``-th corpus vector (by id), capped at
    ``max_centroids`` — deterministic, no training pass; ``"kmeans"``
    trains ``max_centroids`` spherical k-means centroids distributively
    (see :func:`kmeans_centroids`) for better-balanced cells on
    clustered data. Every corpus vector is assigned to its max-cosine
    centroid (its *cell*); a query probes its ``nprobe`` nearest cells
    and pays the exact dot product only against those cells' members.

    Scale shape: the centroid pull is an orderBy+limit (TakeOrdered), so
    the driver receives at most ``max_centroids`` rows NO MATTER the
    corpus size; the tiny centroid matrix then ships to tasks like a
    broadcast var (numpy needs it local for the blocked matmul). The
    candidate join shuffles corpus and queries once on ``cell``, so the
    full n×m pair matrix is never materialized — cost drops from O(n·m)
    to O(n·m·nprobe/#cells) dot products.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window as W

    # Element type of the embedding column drives the UDF schema — a
    # double corpus must not be silently downcast to float in the rerank.
    elem_type = corpus.schema[vec_col].dataType.elementType.simpleString()

    if quantizer == "kmeans":
        cent_mat = kmeans_centroids(corpus, id_col, vec_col, k=max_centroids)
        cent_ids = np.arange(len(cent_mat), dtype=np.int64)
    else:
        cent_rows = (
            corpus.filter((F.col(id_col) % centroid_stride) == 0)
            .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("__cent"))
            .orderBy("cent_id")
            .limit(max_centroids)
            .collect()
        )
        if not cent_rows:
            raise ValueError(
                f"ivf_topk: no centroids — no corpus row has {id_col} % {centroid_stride} == 0; "
                "lower centroid_stride or use integer ids"
            )
        cent_ids = np.array([r["cent_id"] for r in cent_rows], dtype=np.int64)
        cent_mat = np.array([r["__cent"] for r in cent_rows], dtype=np.float64)
    cent_norm = np.sqrt((cent_mat * cent_mat).sum(axis=1))

    def nearest_cells(df: DataFrame, out_id: str, out_vec: str, n: int) -> DataFrame:
        """Attach the n max-cosine centroid ids as exploded `cell` rows.

        Vectorized: the (tiny) centroid matrix ships with the task and
        each Arrow batch does one blocked matmul — the per-pair JVM
        array-lambda form evaluates interpreted and dominated the
        operator's runtime. Ties break on centroid id (stable sort over
        (-sim, cent_id))."""

        def assign(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                v = np.array(list(pdf[out_vec]), dtype=np.float64)
                vn = np.sqrt((v * v).sum(axis=1))
                sims = (v @ cent_mat.T) / np.outer(vn, cent_norm)
                order = np.lexsort((cent_ids[None, :].repeat(len(v), 0), -sims), axis=1)
                top = order[:, :n]
                rows = np.repeat(np.arange(len(v)), n)
                yield pd.DataFrame(
                    {
                        out_id: pdf[out_id].to_numpy()[rows],
                        out_vec: pdf[out_vec].to_numpy()[rows],
                        "cell": cent_ids[top.ravel()],
                    }
                )

        return df.mapInPandas(
            assign, f"{out_id} long, {out_vec} array<{elem_type}>, cell long"
        )

    c = nearest_cells(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        "neighbor_id",
        "__cv",
        1,
    )
    q = nearest_cells(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
        "query_id",
        "__qv",
        nprobe,
    )
    sim = _dot(F.col("__qv"), F.col("__cv")) / (_norm(F.col("__qv")) * _norm(F.col("__cv")))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        c.join(q, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(sim, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _fixed_planes(num_planes: int, dim: int, seed: int = 88172645463325252) -> list[list[float]]:
    """Deterministic pseudo-random unit-ish hyperplanes (xorshift64)."""
    state = seed & 0xFFFFFFFFFFFFFFFF or 1
    planes = []
    for _ in range(num_planes):
        v = []
        for _ in range(dim):
            # xorshift64
            state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
            state ^= state >> 7
            state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
            v.append(((state % 2001) - 1000) / 1000.0)
        planes.append(v)
    return planes


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int = 5,
):
    """Train spherical k-means centroids distributively; returns a
    (k, dim) numpy matrix ready to drive IVF assignment.

    - Init: the k corpus vectors with the smallest xxhash64(id) — a
      deterministic uniform sample pulled with orderBy+limit, so the
      driver receives exactly k rows regardless of corpus size.
    - Each iteration: one Arrow-batched pass assigns every vector to
      its max-cosine centroid AND pre-reduces to per-partition
      (cell, count, sum) partials (map-only, no shuffle); the driver
      merges at most k rows per partition. Empty cells keep their
      previous centroid. Driver state is the (k, dim) matrix plus the
      bounded partials.
    - Determinism: init is a deterministic hash sample and iterations
      are fixed, so results are reproducible for a given data layout;
      the float partial merge is NOT under the decimal contract (the
      quantizer is approximate by nature), so centroids may differ in
      the last ulp under a different partitioning — which is why every
      consumer is a rows-only catalog entry with recall tests, never a
      hash-gated one.
    """
    import numpy as np
    import pandas as pd

    first = corpus.select(vec_col).first()
    if first is None:
        raise ValueError("kmeans_centroids: empty corpus")
    dim = len(first[0])
    init = (
        corpus.select(
            F.col(vec_col).cast("array<double>").alias("__v"),
            F.xxhash64(F.col(id_col)).alias("__h"),
        )
        .orderBy("__h")
        .limit(k)
        .collect()
    )
    cent = np.array([r["__v"] for r in init], dtype=np.float64)
    cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)

    src = corpus.select(F.col(vec_col).cast("array<double>").alias("__v"))
    for _ in range(iters):
        cmat = cent  # rebind for closure capture per iteration

        def partials(batches, cmat=cmat, k=k, dim=dim):
            # assign AND pre-reduce inside the same Arrow pass: each
            # partition emits at most k (cell, count, sum-vector) rows,
            # so the driver merge is bounded by k x partitions vectors
            # (same boundedness argument as the centroid matrix) — and
            # each iteration is ONE map-only job instead of a shuffle
            # into a 64-expression aggregate plan recompiled per
            # iteration (that spelling measured ~2x slower end-to-end)
            counts = np.zeros(k, dtype=np.int64)
            sums = np.zeros((k, dim), dtype=np.float64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                v = np.array(list(pdf["__v"]), dtype=np.float64)
                vn = np.maximum(np.linalg.norm(v, axis=1), 1e-12)
                cell = np.argmax((v @ cmat.T) / vn[:, None], axis=1)
                np.add.at(counts, cell, 1)
                np.add.at(sums, cell, v)
            live = np.nonzero(counts)[0]
            if len(live):
                yield pd.DataFrame(
                    {
                        "cell": live.astype(np.int32),
                        "cnt": counts[live],
                        "s": list(sums[live]),
                    }
                )

        rows = src.mapInPandas(partials, "cell int, cnt bigint, s array<double>").collect()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.float64)
        for r in rows:
            counts[r["cell"]] += r["cnt"]
            sums[r["cell"]] += np.asarray(r["s"], dtype=np.float64)
        new = cent.copy()
        live = counts > 0  # empty cells keep their previous centroid
        new[live] = sums[live] / counts[live, None]
        norms = np.maximum(np.linalg.norm(new, axis=1, keepdims=True), 1e-12)
        cent = new / norms
    return cent


def pq_train_codebooks(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    ksub: int = 16,
    iters: int = 4,
):
    """Train product-quantization codebooks: the vector is split into
    ``m`` contiguous sub-vectors and each subspace gets its own
    ``ksub``-centroid L2 k-means codebook. Returns a (m, ksub, dim/m)
    numpy array.

    All m subspaces train in ONE distributed loop: every vector
    explodes into m (subspace, subvec) rows JVM-side, and a single
    Arrow-batched pass both assigns each row to its nearest centroid
    within its own subspace AND pre-reduces to per-partition
    (sub, cell, count, sum) partials — at most m*ksub rows per
    partition reach the driver per iteration, never the data (the
    kmeans_centroids fusion; one map-only job per iteration).

    Init is deterministic: the ``ksub`` corpus vectors with the
    smallest xxhash64(id) seed every subspace's codebook (TakeOrdered —
    driver receives ksub rows regardless of corpus size).
    """
    import numpy as np
    import pandas as pd

    first = corpus.select(vec_col).first()
    if first is None:
        raise ValueError("pq_train_codebooks: empty corpus")
    dim = len(first[0])
    if dim % m != 0:
        raise ValueError(f"pq: dim {dim} not divisible by m={m}")
    dsub = dim // m

    init = (
        corpus.select(
            F.col(vec_col).cast("array<double>").alias("__v"),
            F.xxhash64(F.col(id_col)).alias("__h"),
        )
        .orderBy("__h")
        .limit(ksub)
        .collect()
    )
    seed = np.array([r["__v"] for r in init], dtype=np.float64)  # (ksub, dim)
    books = np.stack([seed[:, j * dsub : (j + 1) * dsub] for j in range(m)])

    sub_rows = corpus.select(
        F.explode(
            F.expr(
                f"transform(sequence(0, {m - 1}), j -> "
                f"struct(j AS sub, slice(CAST({vec_col} AS array<double>), "
                f"j * {dsub} + 1, {dsub}) AS sv))"
            )
        ).alias("e")
    ).select(F.col("e.sub").alias("sub"), F.col("e.sv").alias("sv"))

    for _ in range(iters):
        bk = books  # rebind for closure capture

        def partials(batches, bk=bk, m=m, ksub=ksub, dsub=dsub):
            # assign and pre-reduce in one Arrow pass (the kmeans
            # fusion): each partition emits at most m*ksub
            # (sub, cell, count, sum) rows, so the driver merge is
            # bounded by m*ksub*partitions sub-vectors — one map-only
            # job per iteration, no shuffle into a dsub-expression
            # aggregate plan recompiled per iteration
            counts = np.zeros((m, ksub), dtype=np.int64)
            sums = np.zeros((m, ksub, dsub), dtype=np.float64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                sub = pdf["sub"].to_numpy()
                sv = np.array(list(pdf["sv"]), dtype=np.float64)  # (n, dsub)
                for j in np.unique(sub):
                    mask = sub == j
                    d = ((sv[mask, None, :] - bk[j][None, :, :]) ** 2).sum(axis=2)
                    cell = np.argmin(d, axis=1)
                    np.add.at(counts[j], cell, 1)
                    np.add.at(sums[j], cell, sv[mask])
            js, cs = np.nonzero(counts)
            if len(js):
                yield pd.DataFrame(
                    {
                        "sub": js.astype(np.int32),
                        "cell": cs.astype(np.int32),
                        "cnt": counts[js, cs],
                        "s": list(sums[js, cs]),
                    }
                )

        rows = sub_rows.mapInPandas(
            partials, "sub int, cell int, cnt bigint, s array<double>"
        ).collect()
        counts = np.zeros((m, ksub), dtype=np.int64)
        sums = np.zeros((m, ksub, dsub), dtype=np.float64)
        for r in rows:
            counts[r["sub"], r["cell"]] += r["cnt"]
            sums[r["sub"], r["cell"]] += np.asarray(r["s"], dtype=np.float64)
        new = books.copy()
        live = counts > 0  # empty cells keep their previous centroid
        new[live] = sums[live] / counts[live, None]
        books = new
    return books


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    m: int = 8,
    ksub: int = 16,
    iters: int = 4,
    oversample: int = 8,
    max_query_rows: int = 4096,
) -> DataFrame:
    """Approximate top-k by cosine via product quantization with exact
    rerank (IVF-PQ's compression half, the standard ANN pairing with
    sim_ivf_topk's cell-probing half).

    Corpus vectors compress to ``m`` codebook indices (here m bytes —
    a 64-dim float vector becomes 8 codes, a 32x memory cut at 100 TB);
    each query builds an (m, ksub) look-up table of sub-vector dot
    products, approximate inner product is m table lookups per corpus
    row (asymmetric distance computation), the per-query top
    ``k * oversample`` candidates by approximate score are exact-
    reranked by true cosine.

    Scale shape: encoding and ADC scoring are map-only Arrow passes —
    the shuffle-bearing steps are the k-means training aggregates
    (m*ksub rows each) and the final per-query top-k windows over
    candidate sets (bounded by queries * k * oversample). The LUT ships
    with the task closure (queries are small by contract — same
    contract as cosine_topk's broadcast side).
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window as W

    books = pq_train_codebooks(corpus, id_col, vec_col, m=m, ksub=ksub, iters=iters)
    dsub = books.shape[2]

    # queries are small BY CONTRACT (the LUT ships with every task): the
    # collect goes through a LIMIT so the driver never receives more than
    # the bound, and overflow raises instead of silently degrading into a
    # full-corpus driver pull — same guard as cosine_pairs_above_np
    q_rows = (
        queries.select(
            F.col(id_col).alias("qid"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        .limit(max_query_rows + 1)
        .collect()
    )
    if len(q_rows) > max_query_rows:
        raise ValueError(
            f"pq_topk: query side exceeds max_query_rows={max_query_rows}; "
            "it is collected to the driver (the ADC look-up table ships to "
            "every task) and must be small by contract — use ivf_topk / "
            "lsh_near_dup_pairs for corpus-scale query sets"
        )
    if not q_rows:
        raise ValueError("pq_topk: empty query set")
    qids = np.array([r["qid"] for r in q_rows], dtype=np.int64)
    qmat = np.array([r["qv"] for r in q_rows], dtype=np.float64)  # (nq, dim)
    # (nq, m, ksub) LUT of sub-dot-products: approx IP = sum_j LUT[q,j,code_j]
    lut = np.einsum(
        "qjd,jkd->qjk",
        qmat.reshape(len(qmat), m, dsub),
        books,
    )

    def adc_score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(list(pdf["__v"]), dtype=np.float64)  # (n, dim)
            # encode: nearest codebook entry per subspace
            codes = np.empty((len(v), m), dtype=np.int64)
            sv = v.reshape(len(v), m, dsub)
            for j in range(m):
                d = ((sv[:, j, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = np.argmin(d, axis=1)
            # ADC: gather per-query approximations for all rows at once
            approx = lut[:, np.arange(m)[None, :], codes].sum(axis=2)  # (nq, n)
            n = len(v)
            yield pd.DataFrame(
                {
                    "qid": np.repeat(qids, n),
                    "cand_id": np.tile(pdf["__id"].to_numpy(), len(qids)),
                    "approx_ip": approx.reshape(-1),
                }
            )

    src = corpus.select(
        F.col(id_col).alias("__id"), F.col(vec_col).cast("array<double>").alias("__v")
    )
    scored = src.mapInPandas(adc_score, "qid long, cand_id long, approx_ip double")
    w = W.partitionBy("qid").orderBy(F.desc("approx_ip"), F.asc("cand_id"))
    cands = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k * oversample)
        .drop("__rn")
    )

    # exact rerank: join candidates back to true vectors, one broadcast
    # of the (small) query matrix inside the scoring lambda
    qdf = cands.sparkSession.createDataFrame(
        [(int(i), [float(x) for x in qmat[j]]) for j, i in enumerate(qids)],
        f"qid long, qv array<double>",
    )
    joined = (
        cands.join(src, cands["cand_id"] == src["__id"])
        .join(F.broadcast(qdf), "qid")
        .select("qid", "cand_id", "qv", F.col("__v").alias("cv"))
    )
    ip = F.expr("aggregate(zip_with(qv, cv, (a, b) -> a * b), 0D, (acc, x) -> acc + x)")
    qn = F.expr("sqrt(aggregate(qv, 0D, (acc, x) -> acc + x * x))")
    cn = F.expr("sqrt(aggregate(cv, 0D, (acc, x) -> acc + x * x))")
    exact = joined.select(
        "qid",
        "cand_id",
        F.round(ip / (qn * cn), 6).alias("cosine"),
    )
    w2 = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("cand_id").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    )


def semantic_dedup_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    k: int = 16,
    iters: int = 3,
    sub_bucket_over: int = 4096,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: cluster the
    embedding space with distributed spherical k-means, then compare
    pairs ONLY within a cluster (exact cosine) — the published recipe
    for semantic dedup at web scale (Abbas et al. 2023, "SemDeDup"),
    where k is chosen so expected cluster size n/k keeps the
    within-cluster quadratic term tiny.

    Guards for the quadratic term: clusters larger than
    ``sub_bucket_over`` rows are split into hash sub-buckets before the
    pairwise pass (bounded memory per group at a documented recall
    cost on pathological skew — the same trade SemDeDup makes by
    capping cluster size). Every emitted pair carries an exact cosine,
    so precision is 1.0 by construction; recall vs the all-pairs
    referee is pinned in tests.

    Scale: centroid training collects only the (k, dim) matrix;
    assignment is one Arrow-batched matmul map pass; the pairwise pass
    shuffles once on (cell, sub) and works in numpy per group.
    """
    import math

    import numpy as np
    import pandas as pd

    cent = kmeans_centroids(corpus, id_col, vec_col, k=k, iters=iters)

    src = corpus.select(
        F.col(id_col).alias("__id"), F.col(vec_col).cast("array<double>").alias("__v")
    )

    def assign(batches, cmat=cent):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(list(pdf["__v"]), dtype=np.float64)
            vn = np.maximum(np.linalg.norm(v, axis=1), 1e-12)
            cell = np.argmax((v @ cmat.T) / vn[:, None], axis=1)
            yield pd.DataFrame(
                {"cell": cell.astype(np.int32), "__id": pdf["__id"], "__v": pdf["__v"]}
            )

    assigned = src.mapInPandas(assign, "cell int, __id bigint, __v array<double>")
    # skew guard: oversized cells split into ceil(cell_size /
    # sub_bucket_over) deterministic hash sub-buckets; cell sizes come
    # from one tiny aggregate (k rows, broadcast back).
    sizes = assigned.groupBy("cell").agg(F.count("*").alias("n_cell"))
    assigned = assigned.join(F.broadcast(sizes), "cell").withColumn(
        "sub",
        F.pmod(
            F.xxhash64("__id"),
            F.greatest(F.lit(1), F.ceil(F.col("n_cell") / F.lit(sub_bucket_over))),
        ).cast("int"),
    )

    def pairwise(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        ids = pdf["__id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        v = np.array(list(pdf["__v"].iloc[order]), dtype=np.float64)
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        sim = v @ v.T
        ia, ib = np.triu_indices(n, k=1)
        keep = sim[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[ia[keep]].astype("int64"),
                "id_b": ids[ib[keep]].astype("int64"),
                "cosine": sim[ia[keep], ib[keep]].astype("float64"),
            }
        )

    return (
        assigned.groupBy("cell", "sub")
        .applyInPandas(pairwise, "id_a bigint, id_b bigint, cosine double")
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    pool: int = 32,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal-Marginal-Relevance diversified top-k: fetch an exact
    cosine candidate pool per query (bounded: ``pool`` rows), then
    greedily pick k items maximizing
    ``lam * sim(query, d) - (1 - lam) * max_{s in picked} sim(d, s)``
    (Carbonell & Goldstein 1998) — the standard answer-diversification
    step of retrieval pipelines.

    The greedy loop is inherently sequential per query, so it runs as
    an Arrow-batched ``applyInPandas`` over groups bounded at ``pool``
    rows by construction — never data-sized. Determinism: candidate
    pool uses cosine_topk's total order; inside the loop, score ties
    break by neighbor id (scores rounded to 9dp first so float noise
    cannot flip an order the contract considers tied).

    Scale: the candidate fetch is the existing exact/ANN path (swap
    cosine_topk for lsh_bucketed_topk at corpus scale); the rerank adds
    one shuffle on query_id over pool-sized groups.
    """
    import numpy as np
    import pandas as pd

    cand = cosine_topk(corpus, queries, id_col, vec_col, k=pool)
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__nv"),
    )
    pool_df = cand.join(vecs, "neighbor_id").select(
        "query_id", "neighbor_id", "cosine", "__nv"
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["cosine", "neighbor_id"], ascending=[False, True])
        ids = pdf["neighbor_id"].to_numpy()
        rel = pdf["cosine"].to_numpy(dtype=np.float64)
        v = np.array(list(pdf["__nv"]), dtype=np.float64)
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        n = len(ids)
        picked: list[int] = []
        picked_mask = np.zeros(n, dtype=bool)
        max_sim = np.full(n, -2.0)
        out_rows = []
        for rank in range(1, min(k, n) + 1):
            score = lam * rel - (1 - lam) * np.where(picked_mask, -np.inf, np.maximum(max_sim, 0))
            score = np.where(picked_mask, -np.inf, score)
            rounded = np.round(score, 9)
            best = np.lexsort((ids, -rounded))[0]
            picked.append(best)
            picked_mask[best] = True
            out_rows.append(
                {
                    "query_id": int(pdf["query_id"].iloc[0]),
                    "neighbor_id": int(ids[best]),
                    "mmr_rank": rank,
                    "mmr_score": float(rounded[best]),
                }
            )
            max_sim = np.maximum(max_sim, v @ v[best])
        return pd.DataFrame(out_rows)

    return (
        pool_df.groupBy("query_id")
        .applyInPandas(
            greedy, "query_id bigint, neighbor_id bigint, mmr_rank int, mmr_score double"
        )
        .select("query_id", "neighbor_id", "mmr_rank", F.round("mmr_score", 6).alias("mmr_score"))
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    oversample: int = 4,
) -> DataFrame:
    """Scalar-quantized (int8) ANN: compress every vector to one byte
    per dimension using per-dimension [min, max] ranges, score
    candidates on the *dequantized* codes (decode is two JVM zip_with
    passes; a raw integer dot over asymmetric-offset codes biases the
    ranking by each candidate's alignment with the offset vector, which
    measured recall@5 at 0.1 on the fixture), keep ``oversample * k``
    per query, then exact-rerank the survivors against the original
    floats — the SQ8 recipe every vector store ships as its cheap
    memory/bandwidth tier (4x smaller than float32).

    The only driver-side state is the per-dimension min/max pair — two
    dim-length arrays from one aggregate (bounded by construction, like
    IVF's centroid matrix). Quantized scoring and the rerank are
    ordinary DataFrame expressions; recall vs brute force is pinned in
    tests.
    """
    first = corpus.select(vec_col).first()
    if first is None:
        raise ValueError("sq8_topk: empty corpus")
    dim = len(first[0])
    stats = corpus.agg(
        *[F.min(F.col(vec_col)[i]).alias(f"lo{i}") for i in range(dim)],
        *[F.max(F.col(vec_col)[i]).alias(f"hi{i}") for i in range(dim)],
    ).first()
    lo = [float(stats[f"lo{i}"]) for i in range(dim)]
    span = [max(float(stats[f"hi{i}"]) - float(stats[f"lo{i}"]), 1e-12) for i in range(dim)]
    lo_arr = F.array(*[F.lit(x) for x in lo])
    span_arr = F.array(*[F.lit(x) for x in span])

    def quant(col: Column) -> Column:
        scaled = F.zip_with(col, lo_arr, lambda x, l: x.cast("double") - l)
        # clamp to the byte range: corpus codes always land inside it
        # (the ranges came from the corpus), but a query vector outside
        # the corpus envelope must saturate, as stored int8 codes would
        return F.zip_with(
            scaled,
            span_arr,
            lambda x, s: F.greatest(
                F.lit(0), F.least(F.lit(255), F.round(x / s * 255).cast("int"))
            ),
        )

    def dequant(col: Column) -> Column:
        spanned = F.zip_with(col, span_arr, lambda c, s: c * s / 255.0)
        return F.zip_with(spanned, lo_arr, lambda x, l: x + l)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        dequant(quant(F.col(vec_col))).alias("__cq"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        dequant(quant(F.col(vec_col))).alias("__qq"),
    )
    qdot = F.aggregate(
        F.zip_with(F.col("__qq"), F.col("__cq"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    from pyspark.sql import Window as W

    cand = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("__qs", qdot)
    )
    wq = W.partitionBy("query_id").orderBy(F.col("__qs").desc(), F.col("neighbor_id").asc())
    pool = cand.withColumn("__r", F.row_number().over(wq)).filter(
        F.col("__r") <= oversample * k
    )
    sim = _dot(F.col("__qv"), F.col("__cv")) / (_norm(F.col("__qv")) * _norm(F.col("__cv")))
    wf = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        pool.withColumn("cosine", sim)
        .withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
