"""End-to-end LLM training-data curation — the gated operators composed
in their canonical order (the C4/CCNet/Gopher-style pipeline every
"beyond the reference" operator in this repo exists to serve):

    1. heuristic clean   (operators/c4.c4_filters)
    2. exact dedup       (operators/dedup.exact_dedup)
    3. fuzzy dedup       (minhash LSH pairs → connected components →
                          one survivor per cluster)
    4. quality gates     (textstats ratios + Gopher repetition pass +
                          CCNet LM perplexity tertile)
    5. mixture control   (per-language temperature resampling)
    6. sequence packing  (token budget bins)

Each stage is the already-driver-gated operator applied verbatim — this
module adds only the composition and a per-stage accounting report, so a
user can run the whole curation pass as one call and audit exactly where
documents were dropped.

Scale: the composition inherits each stage's shape — scan-side
projections (1, 4), one-shuffle aggregates (2), banded LSH with skew
caps (3), hash gates (5), and one sharded window (6). Stage boundaries
persist (shared operator-cache registry) so each stage's audit count and
the next stage both read the materialized frame instead of re-executing
the upstream DAG. At 100 TB you would persist stage boundaries as
parquet instead; the `report` counts then come free from write metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    min_words_per_line: int = 1,
    min_kept_lines: int = 1,
    require_terminal_punct: bool = False,
    line_drop_terms: tuple[str, ...] | None = None,
    blocklist: tuple[str, ...] | None = None,
    lsh_threshold: float = 0.5,
    keep_ppl_buckets: tuple[str, ...] = ("head", "middle"),
    temperature: float = 0.7,
    mixture_target_fraction: float = 0.8,
    pack_budget: int = 512,
    require_repetition_pass: bool = True,
) -> tuple[DataFrame, dict[str, int]]:
    """Run the full curation pass. Returns (packed, report):

    - packed: (id_col, lang, n_tokens, shard, bin_id) — the surviving
      documents with their training-batch bin assignment.
    - report: ordered per-stage row counts, e.g.
      {"input": N, "c4_clean": ..., "exact_dedup": ...,
       "fuzzy_dedup": ..., "quality": ..., "mixture": ..., "packed": ...}

    The count() per stage is for the audit report; drop it (or read the
    counts from stage writes) when auditing isn't needed.

    Stage boundaries persist through the shared operator-cache registry
    (release with `operator_cache_scope()` / `release_shingle_caches()`):
    without it every stage count re-executes the whole upstream DAG —
    measured 70.0 → 61.6 s at sf0.1 (the bulk of the cost is the stages
    themselves, LSH + components + LM training; the persists buy the
    recompute cascade, not the stage work). This is the local stand-in
    for the 100 TB stage-boundary parquet writes.
    """
    from manifold_spark.operators.c4 import (
        DEFAULT_BLOCKLIST,
        DEFAULT_LINE_DROP_TERMS,
        c4_filters,
    )
    from manifold_spark.operators import dedup
    from manifold_spark.operators.dedup import _persist_tracked
    from manifold_spark.operators.lm import ppl_buckets, score_docs
    from manifold_spark.operators.repetition import repetition_signals
    from manifold_spark.operators.sampling import pack_documents, temperature_sample
    from manifold_spark.operators.textstats import token_count_ws

    report: dict[str, int] = {"input": docs.count()}

    # 1. heuristic clean: C4 line+document rules; keep passers, carry the
    #    cleaned text forward.
    cleaned = (
        c4_filters(
            docs,
            text_col=text_col,
            id_col=id_col,
            min_words_per_line=min_words_per_line,
            min_kept_lines=min_kept_lines,
            line_drop_terms=(
                DEFAULT_LINE_DROP_TERMS if line_drop_terms is None
                else line_drop_terms
            ),
            blocklist=DEFAULT_BLOCKLIST if blocklist is None else blocklist,
            require_terminal_punct=require_terminal_punct,
        )
        .filter(F.col("keep") == 1)
        .select(id_col, F.col("text_clean").alias(text_col))
        .join(docs.select(id_col, lang_col), id_col)
    )
    cleaned = _persist_tracked(cleaned)
    report["c4_clean"] = cleaned.count()

    # 2. exact dedup on cleaned content (min-id survivor carries lang).
    exact = dedup.exact_dedup(
        cleaned, text_col, id_col, payload_cols=(lang_col,)
    ).select(id_col, lang_col)
    exact = _persist_tracked(exact.join(cleaned.select(id_col, text_col), id_col))
    report["exact_dedup"] = exact.count()

    # 3. fuzzy dedup: LSH pairs → components → keep each cluster's min-id
    #    (singletons keep themselves — cluster_id == own id).
    pairs = dedup.minhash_lsh_pairs(
        exact, text_col, id_col, threshold=lsh_threshold
    ).select("id_a", "id_b")
    clusters = dedup.dedup_components(exact.select(id_col), pairs, id_col=id_col)
    dropped = clusters.filter(F.col(id_col) != F.col("cluster_id")).select(id_col)
    fuzzy = _persist_tracked(exact.join(dropped, id_col, "left_anti"))
    report["fuzzy_dedup"] = fuzzy.count()

    # 4. quality: Gopher repetition pass flag + CCNet perplexity tertile
    #    (trained on the surviving corpus itself — the self-scoring setup).
    survivors = fuzzy
    if require_repetition_pass:
        rep = repetition_signals(survivors, text_col=text_col, id_col=id_col)
        survivors = survivors.join(
            rep.filter(F.col("repetition_pass")).select(id_col), id_col
        )
    scored = score_docs(survivors, text_col=text_col, id_col=id_col).join(
        survivors.select(id_col, lang_col, text_col), id_col
    )
    # Degenerate docs (< 3 normalized chars) score NULL — exclude them
    # BEFORE bucketing so they can't occupy tertile slots (and a NULL
    # score must never survive a quality filter).
    scored = scored.filter(F.col("n_trigrams") > 0)
    bucketed = ppl_buckets(scored, group_col=lang_col, id_col=id_col)
    quality = bucketed.filter(
        F.col("ppl_bucket_label").isin(*keep_ppl_buckets)
    ).select(id_col, lang_col, text_col)
    quality = _persist_tracked(quality)
    report["quality"] = quality.count()

    # 5. mixture: per-language p^alpha temperature resampling flattens the
    #    language skew deterministically (hash gates — layout-independent).
    mixed = temperature_sample(
        quality, lang_col, id_col,
        alpha=temperature, target_fraction=mixture_target_fraction,
    ).select(id_col, lang_col, text_col)
    mixed = _persist_tracked(mixed)
    report["mixture"] = mixed.count()

    # 6. packing: whitespace token budget bins (swap in BPE counts via
    #    operators/bpe.bpe_encode when a trained tokenizer is in play).
    with_tokens = mixed.select(
        id_col, lang_col, token_count_ws(F.col(text_col)).alias("n_tokens")
    )
    packed = pack_documents(
        with_tokens, id_col, "n_tokens", budget=pack_budget
    ).join(with_tokens.select(id_col, lang_col), id_col)
    report["packed"] = packed.count()
    return packed, report
