"""Text-analysis operators for training-data pipelines (SURVEY.md
§2.B): token counting, quality scoring, n-gram-free language ID
heuristic, all with built-in string/array functions (JVM codegen).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny per-language stopword seed lists for the heuristic language ID —
# chosen to be disjoint where possible
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "los", "las", "es", "un", "una", "en", "por", "para", "con"],
    "zh": ["de", "shi", "bu", "le", "wo", "you", "he", "zai", "ren", "ta"],
}


def _tokens(col: Column) -> Column:
    return F.split(F.trim(F.lower(col)), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(F.size(_tokens(col)))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: words + digits + punctuation marks each
    count (a cheap, deterministic BPE stand-in usable for budget
    accounting at scale)."""
    return F.size(
        F.regexp_extract_all(F.lower(col), F.lit(r"[a-z]+|[0-9]|[^a-z0-9\s]"), F.lit(0))
    )


def text_features(df: DataFrame, text_col: str) -> DataFrame:
    """Standard quality-signal columns: n_tokens, avg token length,
    punctuation ratio, digit ratio, uppercase ratio, en-stopword ratio,
    and a composite quality score in [0, 1]."""
    c = F.col(text_col)
    n_chars = F.length(c)
    toks = _tokens(c)
    n_tokens = token_count(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(c, r"[0-9]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    avg_tok_len = F.when(n_tokens > 0, (F.length(F.regexp_replace(c, r"\s+", "")) / n_tokens)).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, n_digit / n_chars).otherwise(F.lit(0.0))
    upper_ratio = F.when(n_chars > 0, n_upper / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    quality = (
        F.least(n_tokens / F.lit(64.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.3
    )
    return df.withColumns(
        {
            "n_tokens": n_tokens,
            "avg_token_len": avg_tok_len,
            "punct_ratio": punct_ratio,
            "digit_ratio": digit_ratio,
            "upper_ratio": upper_ratio,
            "stopword_ratio": stop_ratio,
            "quality_score": quality,
        }
    )


def language_id(df: DataFrame, text_col: str, out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: argmax over per-language stopword hit
    counts (ties → lexicographically first language, deterministic)."""
    toks = _tokens(F.col(text_col))
    scores = []
    for lang in sorted(STOPWORDS):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).alias("hits"),
                F.lit({"en": 4, "de": 3, "fr": 2, "es": 1, "zh": 0}[lang]).alias("prio"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return df.withColumn(out_col, F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")))


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    max_tokens: int,
    num_buckets: int = 64,
) -> DataFrame:
    """Pack documents into fixed-token-budget training sequences
    (first-fit-decreasing) so short documents share a context window
    instead of wasting pad tokens.

    Dataflow: docs hash into ``num_buckets`` groups (one shuffle), each
    bucket packs independently in one Arrow-batched applyInPandas call
    — packing is a sequential bin-packing decision, so the parallelism
    unit is the bucket, not the row. Pack ids are globally unique
    (bucket * 2^32 + local index). Deterministic: bucket assignment is
    a hash of the id, in-bucket order is (tokens desc, id).

    A document longer than ``max_tokens`` gets its own pack flagged
    ``oversize`` (truncation policy belongs to the tokenizer step).

    Scale: state per task is one open-bin list bounded by bucket size;
    buckets are ~n/num_buckets docs — size num_buckets to keep each in
    task memory (at 100 TB, thousands of buckets; FFD quality is
    per-bucket but pad waste stays within ~11/9 OPT + 1 of the global
    optimum per the classic FFD bound).
    """
    import pandas as pd

    bucketed = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        F.pmod(F.xxhash64(F.col(id_col).cast("long")), F.lit(num_buckets)).alias("__b"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_tokens", "doc_id"], ascending=[False, True])
        bucket = int(pdf["__b"].iloc[0])
        bins: list[int] = []  # remaining capacity per local pack id
        out_pack = []
        for tok in pdf["n_tokens"]:
            t = int(tok)
            placed = None
            if t <= max_tokens:
                for i, rem in enumerate(bins):
                    if rem >= t:
                        placed = i
                        bins[i] = rem - t
                        break
            if placed is None:
                placed = len(bins)
                bins.append(max(max_tokens - t, 0))
            out_pack.append(placed)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_tokens": pdf["n_tokens"].to_numpy(),
                "pack_id": [bucket * (1 << 32) + p for p in out_pack],
                "oversize": (pdf["n_tokens"] > max_tokens).to_numpy(),
            }
        )

    return bucketed.groupBy("__b").applyInPandas(
        pack, "doc_id long, n_tokens long, pack_id long, oversize boolean"
    )


def with_compression_ratio(df, text_col: str, keep: list[str]):
    """zlib-compression ratio per document — the model-free
    repetition/boilerplate signal (highly compressible text is
    repetitive; near-random text barely compresses). Used alongside
    the explicit repetition features in quality filtering pipelines.

    Arrow-batched mapInPandas: one Python pass per batch, zlib level 6
    (stdlib), compressed_len / raw_len as double. Rows with empty text
    get ratio 1.0. Map-only — no shuffle; at 100 TB this is a pure
    scan-side enrichment.
    """
    import pandas as pd
    import zlib

    from pyspark.sql import types as T

    fields = [df.schema[c] for c in keep]
    schema = T.StructType(fields + [T.StructField("compression_ratio", T.DoubleType())])

    def batches(it):
        for pdf in it:
            texts = pdf[text_col].fillna("")
            ratios = [
                (len(zlib.compress(t.encode("utf-8"), 6)) / max(len(t.encode("utf-8")), 1))
                if t
                else 1.0
                for t in texts
            ]
            out = pdf[keep].copy()
            out["compression_ratio"] = [round(r, 6) for r in ratios]
            yield out

    return df.select(*keep, text_col).mapInPandas(batches, schema)
