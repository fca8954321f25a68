"""Deduplication operators for training-data pipelines.

Exact dedup, document fingerprinting, MinHash+LSH near-dup, SimHash,
and n-gram Jaccard — all expressed with Spark built-ins (xxhash64,
higher-order array functions, explode + groupBy) so the hot path stays
in whole-stage codegen; no Python UDFs.

Scale notes (the 100 TB story):
- MinHash signatures: one pass, per-row array math; LSH banding
  explodes to n*bands rows and groups on (band, band_hash) — the
  standard shuffle-bounded candidate generation; pair verification
  touches only co-bucketed pairs, never the n² cross join.
- SimHash: explode tokens (n*tokens rows), single groupBy computing 64
  bit-votes map-side-combined.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from es_analytics_spark.functions.lineage import cut_lineage, cut_lineage_lazy


# deterministic multipliers/offsets for the minhash permutation family
# h_i(x) = (a_i * x + b_i) mod p (Carter-Wegman; seeds fixed for
# reproducibility). Sizes are chosen to stay inside signed-64 ANSI
# arithmetic: x < p < 2^33, a < 2^30 → a*x + b < 2^63, no overflow.
_PRIME = 4294967311  # smallest prime > 2^32


def _hash_params(num_hashes: int) -> list[tuple[int, int]]:
    # fixed LCG-derived constants — deterministic across runs/engines
    params = []
    state = 0x9E3779B97F4A7C15
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = (state % ((1 << 30) - 1)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = state % _PRIME
        params.append((a, b))
    return params


def dedup_exact(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Exact dedup. With ``keys``, keeps one deterministic representative
    per key group (the row minimal under the remaining columns) —
    unlike ``dropDuplicates`` whose survivor is partition-order
    dependent and thus not reproducible run-to-run."""
    if not keys:
        return df.distinct()
    others = [c for c in df.columns if c not in keys]
    if not others:
        return df.distinct()
    agg = [F.min(F.struct(*[F.col(c) for c in others])).alias("__rep")]
    out = df.groupBy(*keys).agg(*agg)
    return out.select(*keys, *[F.col(f"__rep.{c}").alias(c) for c in others])


def normalize_text(col: Column) -> Column:
    """Lowercase, strip non-alphanumerics, collapse whitespace — the
    canonical form used for fingerprinting."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def document_fingerprint(df: DataFrame, text_col: str, out_col: str = "fingerprint") -> DataFrame:
    """md5 over normalized text — exact near-dup key robust to
    punctuation/case/whitespace differences."""
    return df.withColumn(out_col, F.md5(normalize_text(F.col(text_col))))


def _shingle_expr(words_col: str, k: int) -> Column:
    """Word k-shingle array from a *materialized* words column."""
    w = F.col(words_col)
    n = F.size(w)
    idx = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(w, (i + j).cast("int")) for j in range(k)]),
    )
    return F.array_distinct(F.when(n >= k, sh).otherwise(F.array(F.concat_ws(" ", w))))


def with_shingles(
    df: DataFrame, text_col: str, k: int, keep: list[str], out_col: str = "shingles"
) -> DataFrame:
    """(keep…, shingles) with the words array materialized through a
    projection boundary first.

    The boundary matters: inlining split(normalize(text)) into the
    shingle transform makes Catalyst re-evaluate the normalize+split
    (two regexes) once per shingle window — observed ~15× slower on
    500-word documents. Referencing the words column several times
    keeps CollapseProject from re-inlining it.
    """
    words = df.select(*[F.col(c) for c in keep], F.split(normalize_text(F.col(text_col)), " ").alias("__w"))
    return words.select(*[F.col(c) for c in keep], _shingle_expr("__w", k).alias(out_col))


def exploded_shingles(
    df: DataFrame, text_col: str, k: int, keep: list[str], out_col: str = "sh"
) -> DataFrame:
    """One row per (keep…, shingle).

    The explode is applied to the shingle *expression* inside the words
    projection, NOT to a pre-aliased shingle column: exploding an
    aliased column lets InferFiltersFromGenerate synthesize a
    ``size(shingles) > 0`` filter that pushdown then re-inlines as a
    from-scratch re-evaluation of the whole pipeline per row (observed
    40× slowdown). Keep this shape — check `.explain()` shows
    Generate directly over the words Project, with no Filter between
    scan and Generate re-deriving the array.
    """
    words = df.select(*[F.col(c) for c in keep], F.split(normalize_text(F.col(text_col)), " ").alias("__w"))
    return words.select(*[F.col(c) for c in keep], F.explode(_shingle_expr("__w", k)).alias(out_col))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, sig[num_hashes]) — sig[i] = min over shingles of the i-th
    Carter-Wegman permutation of xxhash64(shingle).

    Shape: explode shingles → hash each once → groupBy(id) with
    num_hashes MIN aggregates. The mins partial-combine map-side, so
    the shuffle carries one num_hashes-wide row per document regardless
    of document length — the layout that scales. (The first-cut
    implementation, 64 nested array transforms in one projection,
    spent ~25s in codegen/eval for 500 docs.)
    """
    votes = _minhash_sig_cols(df, id_col, text_col, num_hashes, shingle_k)
    return votes.select(id_col, F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def _minhash_sig_cols(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int, shingle_k: int
) -> DataFrame:
    """(id, h0..h{n-1}) — the signature as flat columns; banding reads
    these directly (building the array only to slice it back apart
    costs an extra per-band slice+transform in every expression)."""
    exploded = exploded_shingles(df, text_col, shingle_k, keep=[id_col]).select(
        F.col(id_col), F.pmod(F.xxhash64("sh"), F.lit(_PRIME)).alias("h")
    )
    sig_cols = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % _PRIME).alias(f"h{i}")
        for i, (a, b) in enumerate(_hash_params(num_hashes))
    ]
    return exploded.groupBy(id_col).agg(*sig_cols)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH banding.

    Candidate pairs co-bucket in ≥1 band; each candidate is verified
    with the exact Jaccard of shingle sets. Returns
    (id_a, id_b, jaccard) with id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    sigs = _minhash_sig_cols(df, id_col, text_col, num_hashes, shingle_k)
    banded = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.col(f"h{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")

    # candidate pairs from co-bucketed id lists — one aggregation over
    # the banded rows rather than a self-join, which would evaluate the
    # whole signature pipeline once per join side (2× the dominant
    # cost). Per-bucket pair explosion is the same quadratic-in-bucket
    # work the join does, minus the recompute.
    buckets = (
        banded.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    ids = F.col("ids")
    pair_arr = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.size(ids)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    grams = with_shingles(df, text_col, shingle_k, keep=[id_col], out_col="sh")
    cand = (
        cand.join(grams.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(grams.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """MOSS-style winnowing: one row per (id, fingerprint).

    Rolling char ``k``-gram hashes over normalized text, then the
    minimum hash of every ``window`` consecutive grams — the classic
    guarantee that any shared substring of length ≥ k+window-1 yields
    at least one shared fingerprint. Hashes are md5 hex strings (every
    engine agrees on md5; the min is lexicographic), selected with
    array_min over a sliding slice.

    Scale shape: the rolling min runs as a window function over
    posexploded gram rows (one shuffle on the doc id) rather than an
    array-of-slices expression — the slice form makes CollapseProject
    re-inline the whole md5 gram array once per window position
    (observed ~300× recompute; same trap documented on
    exploded_shingles). Downstream matching is an inverted-index
    equi-join on the fingerprint — the same candidate-bounded pattern
    as LSH banding, never n² text comparisons.
    """
    from pyspark.sql import Window as W

    # The repartition is a materialization barrier as much as a
    # partitioner: without it CollapseProject re-inlines the normalize
    # regexes into the gram lambda (≈4× slower), and the window below
    # needs hashpartitioning(id) anyway, so the exchange is not an
    # extra shuffle. The partition count is pinned (not AQE-advisory):
    # the pre-explode side is tiny in bytes, and letting AQE coalesce
    # it would serialize the ~300×-wider explode+hash stage above it.
    nparts = df.sparkSession.sparkContext.defaultParallelism
    t = df.select(F.col(id_col), normalize_text(F.col(text_col)).alias("__t")).repartition(
        nparts, F.col(id_col)
    )
    n = F.length("__t")
    grams = t.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1))),
                lambda i: F.md5(F.substr(F.col("__t"), i, F.lit(k)).cast("binary")),
            )
        ).alias("pos", "h"),
    )
    w = W.partitionBy(id_col).orderBy("pos").rowsBetween(W.currentRow, window - 1)
    n_grams = W.partitionBy(id_col)
    wins = (
        grams.withColumn("win_min", F.min("h").over(w))
        .withColumn("__n", F.max("pos").over(n_grams))
        # window start positions only: trailing frames shorter than
        # `window` are not winnowing windows (unless the doc is shorter
        # than one window, where pos 0 min-of-all applies)
        .filter(F.col("pos") <= F.greatest(F.col("__n") - window + 1, F.lit(0)))
        .select(id_col, F.col("win_min").alias("fingerprint"))
        .distinct()
    )
    return wins


def simhash(df: DataFrame, id_col: str, text_col: str, out_col: str = "simhash") -> DataFrame:
    """64-bit SimHash over word tokens: per-bit majority vote of
    xxhash64(token), reassembled into one signed 64-bit long."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    fp = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return votes.select(id_col, fp.alias(out_col))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 3,
    block_col: str | None = None,
    max_id_gap: int | None = None,
    threshold: float | None = None,
    prefix_filter: bool = False,
) -> DataFrame:
    """Exact character-free *word* n-gram Jaccard for candidate pairs.

    Blocking: only pairs sharing ``block_col`` (and optionally with
    ``|id_a - id_b| <= max_id_gap``) are compared, keeping the join
    shuffle-bounded instead of n².

    ``threshold``: lossless pruning for callers that only keep pairs
    with jaccard >= t (they MUST still apply that filter; pairs below
    t may or may not appear). Enables the size bound t·|B| ≤ |A|
    (J ≥ t ⟹ min/max ≥ t), applied on the pair set before the jaccard
    is emitted.

    Default verify path (no ``prefix_filter``): the intersection size
    is computed by a token equi-join — explode distinct grams, join on
    (block, gram), count matches per (id_a, id_b) — instead of an
    in-block all-pairs ``array_intersect``. Pairs sharing zero grams
    (jaccard = 0) are therefore absent from the output, which is
    immaterial for any positive-threshold caller. Per-doc gram-set
    sizes are a separate tiny aggregate over the SAME exploded tokens
    (count per id), joined back after the pair aggregation — carrying
    the size through the explode instead makes CollapseProject rebuild
    the whole shingle array per exploded row just to size() it
    (observed 13× slower; same family as exploded_shingles' shape
    note). Cost model: the join shuffles one row per (doc, gram) on
    the gram key and only *matching* grams reach the pair aggregation,
    so work scales with actual overlap, not with |block|² — measured
    ~7× faster than the blocked all-pairs intersect at sf0.1
    (20 blocks × 250 docs: 2.0 s vs 15.5 s hot). The skew
    caveat: a gram shared by k docs in one block contributes
    k·(k-1)/2 join rows, so corpora with heavy boilerplate should use
    ``prefix_filter`` (rarest-first prefixes are immune to common-gram
    blowup) or strip boilerplate first.

    ``prefix_filter`` (requires ``threshold``): PPJoin-style prefix
    filtering (Xiao et al., "Efficient Similarity Joins for Near
    Duplicate Detection", WWW'08): tokens are globally ordered
    rarest-first, each doc exposes only its first ``floor((1-t)*|g|)+1``
    tokens, and a candidate pair must share a prefix token — J(A,B) >= t
    implies the prefixes intersect, so no qualifying pair is lost.
    Candidates then pay the exact intersect verify. This replaces the
    in-block all-pairs compare with explode + equi-join on rare tokens.
    Trade-off, pinned by test_prefix_filter_lossless: the prefix length
    is (1-t)·|g|, so it prunes hard at high thresholds (t ≳ 0.7,
    near-identical dup mining) but approaches all-tokens at low ones —
    at t = 0.35 the blocked all-pairs verify is measurably faster.

    Verify-side costs on either path: per-doc gram-set sizes are
    precomputed and |A∪B| = |A|+|B|-|A∩B| (grams are distinct), so no
    union array is materialized per pair.
    """
    if prefix_filter and threshold is None:
        raise ValueError("prefix_filter requires a threshold")
    keep = [id_col] + ([block_col] if block_col else [])
    on = [block_col] if block_col else []

    if not prefix_filter:
        # Token-join verify: one row per (doc, distinct gram), equi-join
        # on (block, gram), count = |A∩B|. tok deliberately carries NO
        # size column (see docstring: sizing through the explode is the
        # per-row-rebuild trap); sizes come from their own aggregate.
        tok = exploded_shingles(df, text_col, ngram, keep=keep, out_col="tok").select(
            *on, F.col(id_col).alias("id"), "tok"
        )
        sizes = tok.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
        a = tok.select(*on, F.col("id").alias("id_a"), "tok")
        b = tok.select(*on, F.col("id").alias("id_b"), "tok")
        j = a.join(b, on + ["tok"]).filter(F.col("id_a") < F.col("id_b"))
        if max_id_gap is not None:
            j = j.filter(F.col("id_b") - F.col("id_a") <= max_id_gap)
        pairs = j.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("inter"))
        pairs = pairs.join(
            sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na")), "id_a"
        ).join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        if threshold is not None:
            # lossless size bound for J >= t
            pairs = pairs.filter(
                (F.col("na") >= threshold * F.col("nb"))
                & (F.col("nb") >= threshold * F.col("na"))
            )
        return pairs.select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )

    # PPJoin prefix-filter path: candidates via rarest-first prefixes,
    # verified with an exact array intersect.
    from pyspark.sql import Window as W

    base = with_shingles(df, text_col, ngram, keep=keep, out_col="grams").withColumn(
        "n_grams", F.size("grams")
    )
    t = threshold
    tok = base.select(id_col, *on, F.explode("grams").alias("tok"))
    # global rarest-first total order (count, token) — ties on the
    # token string keep the order deterministic across engines
    freq = tok.groupBy("tok").agg(F.count("*").alias("tf"))
    ranked = tok.join(freq, "tok").withColumn(
        "r", F.row_number().over(W.partitionBy(id_col).orderBy("tf", "tok"))
    )
    n_tok = ranked.withColumn("n", F.count("*").over(W.partitionBy(id_col)))
    prefix = n_tok.filter(F.col("r") <= F.floor((1 - t) * F.col("n")) + 1).select(
        id_col, *on, "tok"
    )
    pa = prefix.select(*on, F.col(id_col).alias("id_a"), "tok")
    pb = prefix.select(*on, F.col(id_col).alias("id_b"), "tok")
    cand = (
        pa.join(pb, on + ["tok"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ga = base.select(
        F.col(id_col).alias("id_a"), F.col("grams").alias("g_a"),
        F.col("n_grams").alias("na"),
    )
    gb = base.select(
        F.col(id_col).alias("id_b"), F.col("grams").alias("g_b"),
        F.col("n_grams").alias("nb"),
    )
    cand = cand.join(ga, "id_a").join(gb, "id_b")
    if max_id_gap is not None:
        cand = cand.filter(F.col("id_b") - F.col("id_a") <= max_id_gap)
    if threshold is not None:
        # lossless size bound for J >= t: evaluated before the intersect
        cand = cand.filter(
            (F.col("na") >= threshold * F.col("nb"))
            & (F.col("nb") >= threshold * F.col("na"))
        )
    inter = F.size(F.array_intersect("g_a", "g_b"))
    union = F.col("na") + F.col("nb") - inter
    return cand.select("id_a", "id_b", (inter / union).alias("jaccard"))


def connected_components(
    edges: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over an undirected edge list: the step that
    turns near-dup candidate PAIRS into duplicate CLUSTERS (single-link
    closure), so a keep-one-per-cluster policy can pick the canonical
    survivor. Returns ``(id, component)`` with component = the minimum
    id reachable from ``id``.

    Algorithm: min-label propagation. Each round every node takes the
    min of its own label and its neighbors' labels — one shuffle join
    edges⋈labels plus one groupBy-min per round, converging in
    O(graph diameter) rounds. Near-dup graphs are shallow (dup clusters
    are cliques-ish, diameter 1-3), so 3-5 rounds is typical; a chain
    graph is the worst case and bounded by ``max_iter``.

    Scale shape: state per round is one (id, label) row per node and
    the edge list is reused as-is — both shuffle on the node id, no
    per-round growth. ``localCheckpoint`` truncates lineage each round
    so the plan doesn't deepen; the convergence check is a count of
    changed labels (one action per round, the driver holds only the
    scalar). This is the plain-DataFrame version of the map-reduce CC
    algorithms (large-star/small-star); for diameter-heavy graphs swap
    in that doubling variant — same dataflow primitives.
    """
    # Materialize the (possibly expensive) edge pipeline ONCE before
    # mirroring: a union of two selects over the raw `edges` would
    # evaluate the whole upstream candidate-generation subtree twice.
    base_edges = edges.select(
        F.col(a_col).cast("long").alias("src"), F.col(b_col).cast("long").alias("dst")
    ).transform(cut_lineage)
    sym = base_edges.union(
        base_edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = (
        sym.select(F.col("src").alias("id")).distinct().withColumn("comp", F.col("id"))
    ).transform(cut_lineage)

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("comp").alias("n_comp"))
        )
        # ONE job per round: the updated frame (still carrying the old
        # label) is lazily checkpointed, so the convergence count both
        # materializes the round's cache AND probes it — the former
        # count-then-eager-checkpoint pair executed the join+aggregate
        # twice per round (lazy-cut safety: min-label aggregates are
        # deterministic, the cut_lineage_lazy contract)
        updated = labels.join(neighbor_min, "id", "left").select(
            "id",
            F.col("comp").alias("old"),
            F.least(F.col("comp"), F.coalesce(F.col("n_comp"), F.col("comp"))).alias("comp"),
        ).transform(cut_lineage_lazy)
        changed = updated.filter(F.col("comp") < F.col("old")).count()
        labels = updated.select("id", "comp")
        if changed == 0:
            break
    return labels.select(F.col("id"), F.col("comp").alias("component"))
