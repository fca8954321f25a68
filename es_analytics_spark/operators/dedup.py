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


def _shingles(col: Column, k: int) -> Column:
    """Word k-shingles of normalized text as a distinct array."""
    words = F.split(normalize_text(col), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)))
    return F.array_distinct(F.when(n >= k, sh).otherwise(F.array(F.concat_ws(" ", words))))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, shingles, sig[num_hashes]) — sig[i] = min over shingles of
    the i-th Carter-Wegman permutation of xxhash64(shingle).

    All array math is built-in higher-order functions → JVM codegen.
    """
    base = df.select(
        F.col(id_col), _shingles(F.col(text_col), shingle_k).alias("shingles")
    ).withColumn("hashes", F.transform("shingles", lambda s: F.pmod(F.xxhash64(s), F.lit(_PRIME))))
    sig_cols = [
        F.array_min(
            F.transform("hashes", lambda h: (h * F.lit(a) + F.lit(b)) % _PRIME)
        ).alias(f"h{i}")
        for i, (a, b) in enumerate(_hash_params(num_hashes))
    ]
    return base.select(id_col, "shingles", F.array(*sig_cols).alias("sig"))


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
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k)
    banded = sigs.select(
        id_col,
        "shingles",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                F.transform(
                                    F.slice("sig", b * rows_per_band + 1, rows_per_band),
                                    lambda x: x.cast("string"),
                                ),
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "shingles", "bb.band", "bb.bucket")

    a = banded.select(
        F.col("band"), F.col("bucket"), F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a")
    )
    b = banded.select(
        F.col("band"), F.col("bucket"), F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b")
    )
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


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
) -> DataFrame:
    """Exact character-free *word* n-gram Jaccard for candidate pairs.

    Blocking: only pairs sharing ``block_col`` (and optionally with
    ``|id_a - id_b| <= max_id_gap``) are compared, keeping the join
    shuffle-bounded instead of n².
    """
    base = df.select(
        F.col(id_col),
        *([F.col(block_col)] if block_col else []),
        _shingles(F.col(text_col), ngram).alias("grams"),
    )
    on = [block_col] if block_col else []
    a = base.select(
        *on, F.col(id_col).alias("id_a"), F.col("grams").alias("g_a")
    )
    b = base.select(
        *on, F.col(id_col).alias("id_b"), F.col("grams").alias("g_b")
    )
    j = a.join(b, on) if on else a.crossJoin(b)
    j = j.filter(F.col("id_a") < F.col("id_b"))
    if max_id_gap is not None:
        j = j.filter(F.col("id_b") - F.col("id_a") <= max_id_gap)
    inter = F.size(F.array_intersect("g_a", "g_b"))
    union = F.size(F.array_union("g_a", "g_b"))
    return j.select("id_a", "id_b", (inter / union).alias("jaccard"))
