"""C4-style heuristic document cleaning (Raffel et al. 2020, the T5
paper's §2.2 "Colossal Clean Crawled Corpus" rules) — the classic
pre-training cleanup pass that runs BEFORE dedup/quality-model stages:

Line level (applied to every newline-separated line, trimmed):
- keep only lines ending in a terminal punctuation mark;
- keep only lines with at least ``min_words_per_line`` words;
- drop lines containing any of ``line_drop_terms`` (C4 drops lines with
  the word "javascript" — cookie/JS boilerplate).

Document level:
- flag documents containing any ``blocklist`` phrase (C4: "lorem ipsum"
  and a bad-words list — the list here is a parameter, not a bundled
  vocabulary);
- flag documents containing ``{`` (C4's code heuristic);
- keep a document only if it is unflagged and retains at least
  ``min_kept_lines`` lines (C4 drops pages with fewer than 3 sentences).

Scale: one projection over the corpus — split, per-line HOF predicates,
re-join. No shuffle, no UDF; every rule is a JVM-side column expression
that whole-stage-codegens, so this runs at parquet-scan speed on any
corpus size. The C4 paper's remaining rule (three-sentence-span dedup)
is a separate operator family here: `dedup.span_dedup` / `line_dedup`.

The reference engine has no text-cleaning surface beyond the HTML strip
(SURVEY §2.2 P4); this module is part of the LLM-pipeline tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: C4 keeps lines ending in a terminal punctuation mark. The quote is in
#: the set because C4 operates on sentence-final quotation.
TERMINAL_PUNCT = (".", "!", "?", '"')

#: C4's line-level boilerplate tell.
DEFAULT_LINE_DROP_TERMS = ("javascript",)

#: C4's document-level template tell. Callers append their bad-words list.
DEFAULT_BLOCKLIST = ("lorem ipsum",)


def _word_count(line: Column) -> Column:
    """Whitespace word count of a trimmed line (empty string counts 0)."""
    return F.size(F.filter(F.split(line, r"\s+"), lambda t: t != ""))


def c4_filters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
    line_drop_terms: tuple[str, ...] = DEFAULT_LINE_DROP_TERMS,
    blocklist: tuple[str, ...] = DEFAULT_BLOCKLIST,
    require_terminal_punct: bool = True,
    passthrough_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Apply the C4 line and document heuristics. Returns one row per
    input document (NULL text reads as degenerate-empty):

    (id_col, *passthrough_cols, n_lines, n_kept_lines, text_clean,
     has_brace int, has_blocklisted int, keep int)

    ``text_clean`` is the surviving lines re-joined with newlines —
    flagged documents still carry their cleaned text so callers can
    audit what WOULD have been kept; ``keep`` is the C4 decision.
    ``passthrough_cols`` ride the projection unchanged — the curation
    pipelines carry `lang` through here instead of joining it back on
    (one shuffle saved per batch; this stays a single scan-side pass).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )

    def line_keep(l: Column) -> Column:
        # `require_terminal_punct=False` for corpora that aren't
        # sentence-punctuated prose (transcripts, code-stripped text) —
        # the C4 default assumes web text.
        ends_terminal = (
            F.substring(l, -1, 1).isin(*TERMINAL_PUNCT)
            if require_terminal_punct
            else F.lit(True)
        )
        enough_words = _word_count(l) >= F.lit(min_words_per_line)
        cond = ends_terminal & enough_words
        low = F.lower(l)
        for term in line_drop_terms:
            cond = cond & ~low.contains(term.lower())
        return cond

    low_text = F.lower(text)
    blocked = F.lit(False)
    for phrase in blocklist:
        blocked = blocked | low_text.contains(phrase.lower())
    has_brace = text.contains("{")

    # r14: the line array and the kept-line array are staged as their own
    # projections — inlined, `lines` (split+trim+filter) re-evaluated per
    # consumer (5× per row: n_lines, kept ×3, keep) and `kept` re-ran the
    # per-line keep predicate 3×. Same values, one evaluation each.
    staged = docs.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough_cols],
        lines.alias("__lines"),
        has_brace.cast("int").alias("has_brace"),
        blocked.cast("int").alias("has_blocklisted"),
    ).select(
        F.col(id_col),
        *[F.col(c) for c in passthrough_cols],
        F.col("__lines"),
        F.filter(F.col("__lines"), line_keep).alias("__kept"),
        "has_brace",
        "has_blocklisted",
    )
    n_kept = F.size(F.col("__kept"))
    keep = (
        (n_kept >= F.lit(min_kept_lines))
        & (F.col("has_brace") == 0)
        & (F.col("has_blocklisted") == 0)
    )
    return staged.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough_cols],
        F.size(F.col("__lines")).cast("int").alias("n_lines"),
        n_kept.cast("int").alias("n_kept_lines"),
        F.array_join(F.col("__kept"), "\n").alias("text_clean"),
        "has_brace",
        "has_blocklisted",
        keep.cast("int").alias("keep"),
    )
