"""BM25 sparse retrieval — the lexical other half of the retrieval pair
beside the dense ANN tier (`similarity` / `pq`). Training-data pipelines
use it for corpus curation: retrieving near-matches of eval prompts,
boilerplate hunting, topic-targeted subset extraction (public recipe:
Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework:
BM25 and Beyond"; same Okapi scoring as Lucene/Elasticsearch).

Scoring (k1 = 1.2, b = 0.75, Lucene-style positive idf):

    idf(t)    = ln((N − df(t) + 0.5) / (df(t) + 0.5) + 1)
    tfnorm    = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    score(q,d)= Σ_{t ∈ distinct(q)} idf(t) · tfnorm(t, d)

Scale shape:
- One doc-keyed map-side-combined aggregate builds the (doc, term, tf)
  relation; corpus-wide stats (N, Σdl) are a 1-row crossJoin.
- Query terms BROADCAST against the tf relation — the corpus is filtered
  to matching postings, never shuffled by term; df for query terms only
  is a second broadcast. Per-(query, doc) fold is doc-keyed.
- Cross-engine float discipline (same as `lm`): each (query, term, doc)
  contribution is floor-quantized to an integer, so the per-(query, doc)
  sum is order-independent and oracle-exact; rank ties break on doc id.

The rank window partitions by query_id — fine for query batches; a
million-query batch would rank per query anyway (keys are independent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from manifold_spark.operators.dedup import _persist_tracked, normalized_tokens
from manifold_spark.plans.parallelism import ensure_parallelism

K1 = 1.2
B = 0.75
#: Contribution quantization scale (see module doc / operators/lm.py).
SCORE_SCALE = 1_000_000

#: Gate query set — fixed keyword queries over the corpus vocabulary
#: (the oracle embeds the same literals).
GATE_QUERIES: list[tuple[int, str]] = [
    (0, "spark join window"),
    (1, "fast table scan filter"),
    (2, "hash merge stream"),
    (3, "vector batch column order"),
]


def _contrib_q(tf: Column, df: Column, dl: Column, n_docs: Column, sum_dl: Column) -> Column:
    """floor(idf · tfnorm · SCALE) as bigint — the exact expression the
    oracle mirrors term-for-term (operation order matters: idf*tfnorm,
    then *SCALE, then floor)."""
    idf = F.log(
        ((n_docs - df).cast("double") + F.lit(0.5)) / (df.cast("double") + F.lit(0.5))
        + F.lit(1.0)
    )
    avgdl = sum_dl.cast("double") / n_docs.cast("double")
    tfnorm = (tf.cast("double") * F.lit(K1 + 1.0)) / (
        tf.cast("double")
        + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * (dl.cast("double") / avgdl))
    )
    return F.floor(idf * tfnorm * F.lit(float(SCORE_SCALE))).cast("long")


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query",
    mode: str = "or",
) -> DataFrame:
    """Top-k BM25 matches per query. Returns (query_id, doc_id, rank,
    score); duplicate query terms count once (distinct-term BM25); ties
    break on ascending doc id. Queries with no term hits return no rows.

    ``mode="or"`` (default) is bag-of-terms disjunctive scoring;
    ``mode="and"`` keeps only docs containing EVERY query term
    (conjunctive retrieval — Lucene's BooleanQuery MUST semantics) before
    ranking. Same plan either way: the matched-term count rides the
    per-(query, doc) score fold, and the per-query term count is one
    more broadcast — no extra pass over the postings."""
    if mode not in ("or", "and"):
        raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
    toks = _persist_tracked(
        ensure_parallelism(docs).select(
            F.col(id_col), normalized_tokens(F.col(text_col)).alias("toks")
        )
    )  # consumed twice: corpus stats + tf relation
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum(F.size("toks")).alias("sum_dl")
    )
    tf = (
        toks.select(
            id_col, F.size("toks").alias("dl"), F.explode("toks").alias("term")
        )
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(normalized_tokens(F.col(query_text_col))).alias("term"),
        )
        .distinct()
    )
    postings = tf.join(broadcast(qterms.select("term").distinct()), "term")
    dfq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    contrib = (
        postings.join(broadcast(qterms), "term")
        .join(broadcast(dfq), "term")
        .crossJoin(broadcast(stats))
        .select(
            "query_id",
            id_col,
            _contrib_q(
                F.col("tf"), F.col("df"), F.col("dl"),
                F.col("n_docs"), F.col("sum_dl"),
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("query_id", id_col).agg(
        F.sum("c").alias("score_q"),
        # tf relation is unique per (doc, term) and qterms per (query,
        # term), so each contrib row is one distinct matched term
        F.count(F.lit(1)).alias("n_matched"),
    )
    if mode == "and":
        n_terms = qterms.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("n_terms")
        )
        scored = scored.join(broadcast(n_terms), "query_id").filter(
            F.col("n_matched") == F.col("n_terms")
        )
    w = Window.partitionBy("query_id").orderBy(F.col("score_q").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            id_col,
            "rank",
            (F.col("score_q").cast("double") / F.lit(float(SCORE_SCALE))).alias(
                "score"
            ),
        )
    )


def gate_queries_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(GATE_QUERIES, "query_id int, query string")
