"""Round-5 batch-25 surface: curriculum staging for training data,
rich-club coefficients, and a referential-integrity audit across the
star schema.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.functions.ranks import cumulative_offsets
from es_analytics_spark.queries import _t, query


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# Curriculum staging of the document corpus
# ---------------------------------------------------------------------------

_CURR_STAGES = 4

_CURR_SQL = f"""
    WITH feats AS MATERIALIZED (
        SELECT doc_id,
               LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(text), '[^a-z]+'),
                               x -> LENGTH(x) >= 2)) AS n_words,
               LEN(LIST_DISTINCT(
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(text), '[^a-z]+'),
                               x -> LENGTH(x) >= 2))) AS n_distinct
        FROM documents
    ), scored AS MATERIALIZED (
        SELECT doc_id, n_words,
               FLOOR(LN(CAST(n_words AS DOUBLE))
                     * (CAST(n_distinct AS DOUBLE) / n_words)
                     * 1e6 + 0.5) / 1e6 AS quality
        FROM feats WHERE n_words > 0
    ), ranked AS (
        SELECT doc_id, n_words, quality,
               ROW_NUMBER() OVER (ORDER BY quality ASC, doc_id ASC) AS i,
               COUNT(*) OVER () AS n
        FROM scored
    )
    SELECT CAST(FLOOR((i - 1) * {_CURR_STAGES} / n) AS BIGINT) AS stage,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(quality) AS min_quality, MAX(quality) AS max_quality,
           CAST(SUM(n_words) AS BIGINT) AS total_words
    FROM ranked
    GROUP BY 1
"""


@query("ml_curriculum_stages", oracle=_CURR_SQL)
def ml_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum staging of the corpus: score every document with a
    deterministic quality proxy (log-length x lexical diversity), rank
    the corpus, and cut it into {_CURR_STAGES} equal stages —
    the curriculum-learning schedule (easy/low-quality first or last,
    the trainer chooses) with per-stage document and token budgets.
    ml_quality_bucket_sample samples WITHIN fixed score bands; this
    produces the ordered EQUAL-MASS stages a curriculum needs.

    Exactness: word counts are exact integers; the quality score is
    one LN-on-exact-rational tree quantized at 1e-6 BEFORE ranking;
    the global rank is computed DISTRIBUTIVELY (range-partition +
    offsets — no single-partition window) over the total
    (quality, doc_id) order; stage assignment is exact integer
    arithmetic on (rank, n).

    Scale: one corpus scan for features, one range shuffle for the
    rank, a {_CURR_STAGES}-row reduction."""
    d = _t(spark, sf_dir, "documents")["documents"]
    arr = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: F.length(x) >= 2
    )
    feats = d.select(
        "doc_id",
        F.size(arr).alias("n_words"),
        F.size(F.array_distinct(arr)).alias("n_distinct"),
    )
    scored = (
        feats.filter(F.col("n_words") > 0)
        .select(
            "doc_id",
            "n_words",
            _q6(
                F.log(F.col("n_words").cast("double"))
                * (F.col("n_distinct").cast("double") / F.col("n_words"))
            ).alias("quality"),
        )
        .transform(cut_lineage)
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        scored.repartitionByRange(n_parts, F.asc("quality"), F.asc("doc_id"))
        .withColumn("pid", F.spark_partition_id())
        .transform(cut_lineage)
    )
    local = ranged.withColumn(
        "lr",
        F.row_number().over(
            W.partitionBy("pid").orderBy(F.asc("quality"), F.asc("doc_id"))
        ),
    )
    offsets = cumulative_offsets(
        ranged.groupBy("pid").agg(F.count("*").alias("cnt"))
    )
    tot = ranged.agg(F.count(F.lit(1)).alias("n"))
    ranked = (
        local.join(F.broadcast(offsets), "pid")
        .withColumn("i", F.col("lr") + F.col("off"))
        .crossJoin(F.broadcast(tot))
    )
    return (
        ranked.groupBy(
            F.floor((F.col("i") - 1) * _CURR_STAGES / F.col("n"))
            .cast("bigint")
            .alias("stage")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("quality").alias("min_quality"),
            F.max("quality").alias("max_quality"),
            F.sum("n_words").cast("bigint").alias("total_words"),
        )
    )


# ---------------------------------------------------------------------------
# Rich-club coefficients of the thinned co-supply graph
# ---------------------------------------------------------------------------

_RC_LEVELS = (0.5, 0.75, 0.9)


def _rich_club_sql() -> str:
    from es_analytics_spark.queries_sql4 import _EDGES_CTE

    ks_union = "\n        UNION ALL ".join(
        f"SELECT {p} AS p, ROUND(QUANTILE_CONT(d, {p}), 4) AS k FROM degs"
        for p in _RC_LEVELS
    )
    return f"""
    WITH {_EDGES_CTE},
    degs AS MATERIALIZED (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
        ) GROUP BY node
    ), ks AS MATERIALIZED (
        {ks_union}
    ),
    rich_nodes AS MATERIALIZED (
        SELECT k.p, k.k, CAST(COUNT(*) AS BIGINT) AS n_rich
        FROM ks k JOIN degs d ON d.d > k.k GROUP BY k.p, k.k
    ), rich_edges AS MATERIALIZED (
        SELECT k.p, CAST(COUNT(*) AS BIGINT) AS e_rich
        FROM ks k
        JOIN edges t ON TRUE
        JOIN degs du ON du.node = t.u AND du.d > k.k
        JOIN degs dv ON dv.node = t.v AND dv.d > k.k
        GROUP BY k.p
    )
    SELECT n.p AS deg_percentile, n.k AS deg_threshold,
           n.n_rich, COALESCE(e.e_rich, 0) AS e_rich,
           CASE WHEN n.n_rich < 2 THEN 0.0
                ELSE FLOOR(2.0 * COALESCE(e.e_rich, 0)
                           / (CAST(n.n_rich AS DOUBLE) * (n.n_rich - 1))
                           * 1e6 + 0.5) / 1e6 END AS rich_club_phi
    FROM rich_nodes n LEFT JOIN rich_edges e ON e.p = n.p
"""


@query("graph_rich_club", oracle=_rich_club_sql())
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficients of the co-supply graph: for each degree
    threshold (the p50/p75/p90 degree percentiles — data-adaptive so
    the clubs are non-trivial at every SF), the edge density among
    nodes whose degree exceeds it — phi near 1 means the hubs form a
    tight club (supply-chain oligopoly; in social graphs, elite
    interconnection), the hub-structure readout degree distributions
    and assortativity (graph_assortativity) summarize only indirectly.

    Exactness: degrees, club sizes, and club edge counts are exact
    integers; thresholds use the shared interpolated-quantile contract
    (1e-4 rounding); phi is one quantized division per level (0 when
    the club has fewer than 2 members).

    Scale: one degree aggregate; club membership tests are broadcast
    filters over the edge list per level — |levels| map-side passes,
    no pairwise work."""
    from es_analytics_spark.queries_sql4 import _co_supply_edges

    edges = _co_supply_edges(spark, sf_dir)
    degs = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        .transform(cut_lineage)
    )
    # one percentile aggregate per literal level (the percentage
    # argument must be foldable), unioned into the |levels|-row frame
    ks = None
    for p in _RC_LEVELS:
        row = degs.agg(
            F.lit(p).alias("p"),
            F.round(F.percentile("d", F.lit(p)), 4).alias("k"),
        )
        ks = row if ks is None else ks.unionAll(row)
    rich_nodes = (
        F.broadcast(ks)
        .join(degs, F.col("d") > F.col("k"))
        .groupBy("p", "k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rich"))
    )
    du = degs.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = degs.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    edge_deg = edges.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    rich_edges = (
        edge_deg.crossJoin(F.broadcast(ks))
        .filter((F.col("du") > F.col("k")) & (F.col("dv") > F.col("k")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_rich"))
    )
    phi = F.when(F.col("n_rich") < 2, F.lit(0.0)).otherwise(
        _q6(
            F.lit(2.0)
            * F.coalesce(F.col("e_rich"), F.lit(0))
            / (F.col("n_rich").cast("double") * (F.col("n_rich") - 1))
        )
    )
    return (
        rich_nodes.join(rich_edges, "p", "left")
        .select(
            F.col("p").alias("deg_percentile"),
            F.col("k").alias("deg_threshold"),
            "n_rich",
            F.coalesce(F.col("e_rich"), F.lit(0)).cast("bigint").alias("e_rich"),
            phi.alias("rich_club_phi"),
        )
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit across the star schema
# ---------------------------------------------------------------------------

_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def _ref_audit_sql() -> str:
    selects = []
    for child, fk, parent, pk in _FK_EDGES:
        selects.append(
            f"""
    SELECT '{child}.{fk} -> {parent}.{pk}' AS fk_edge,
           CAST(COUNT(*) AS BIGINT) AS n_child_rows,
           CAST(COUNT(*) FILTER (WHERE {fk} IS NULL) AS BIGINT) AS n_null_fk,
           CAST(COUNT(*) FILTER (
               WHERE {fk} IS NOT NULL AND p.{pk} IS NULL) AS BIGINT)
               AS n_orphans,
           FLOOR(CAST(COUNT(*) FILTER (
                     WHERE {fk} IS NOT NULL AND p.{pk} IS NULL) AS DOUBLE)
                 / COUNT(*) * 1e6 + 0.5) / 1e6 AS orphan_rate
    FROM {child} c LEFT JOIN {parent} p ON p.{pk} = c.{fk}"""
        )
    return "\nUNION ALL\n".join(selects)


@query("lake_referential_audit", oracle=_ref_audit_sql())
def lake_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit of the whole star schema: for every
    foreign-key edge, the child row count, NULL-FK count, orphan count
    (non-NULL FK with no parent), and orphan rate — the first data-
    quality gate a warehouse load runs (lake_constraint_audit checks
    per-column value constraints; this checks the JOIN GRAPH, which is
    what silently breaks revenue rollups when an upstream load drops a
    dimension partition).

    Exactness: all counts are exact integers from left-join existence
    checks; rates are single quantized divisions.

    Scale: one broadcast-or-shuffle left join per FK edge, each
    independently parallel; dimension sides broadcast at star-schema
    proportions. At 100 TB this is the same plan a DQ framework emits,
    with AQE picking join strategies per edge."""
    tables = sorted({c for c, _, _, _ in _FK_EDGES} | {p for _, _, p, _ in _FK_EDGES})
    t = _t(spark, sf_dir, *tables)
    out = None
    for child, fk, parent, pk in _FK_EDGES:
        p = t[parent].select(F.col(pk).alias("__pk")).distinct()
        j = t[child].select(F.col(fk).alias("__fk")).join(
            p, F.col("__pk") == F.col("__fk"), "left"
        )
        row = j.agg(
            F.lit(f"{child}.{fk} -> {parent}.{pk}").alias("fk_edge"),
            F.count(F.lit(1)).cast("bigint").alias("n_child_rows"),
            F.count_if(F.col("__fk").isNull()).cast("bigint").alias("n_null_fk"),
            F.count_if(F.col("__fk").isNotNull() & F.col("__pk").isNull())
            .cast("bigint")
            .alias("n_orphans"),
            _q6(
                F.count_if(
                    F.col("__fk").isNotNull() & F.col("__pk").isNull()
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("orphan_rate"),
        )
        out = row if out is None else out.unionAll(row)
    return out
