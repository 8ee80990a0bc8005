"""Driver-contract query registry.

One entry per operator family from SURVEY.md §2, each expressed twice:
as an idiomatic PySpark program (the engine) and as ANSI SQL for the
DuckDB oracle (the correctness gate). Column names and types are aligned
pairwise — the gate hash-compares values after sorting columns by name.

Determinism rules used throughout (see `functions/numeric.py`):
- double SUM goes through `floor(x·10^s + 0.5)` scaled-integer rounding —
  order-independent AND engine-exact (Spark's double→decimal cast rounds
  the shortest string repr and diverges from engines that round the
  binary value);
- no raw timestamps in outputs (cast to DATE or string); session timezone
  pinned to UTC in `_t` because the driver owns the session;
- int-typed outputs are cast explicitly on both sides (DuckDB year() etc.
  return BIGINT, Spark returns INT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from manifold_spark import clean
from manifold_spark.functions import fingerprint
from manifold_spark.functions.numeric import decimal_sum
from manifold_spark.dims import date_dimension
from manifold_spark.scd2 import scd2_merge, initial_load
from manifold_spark.stage import with_fingerprint
from manifold_spark.plans.parallelism import ensure_parallelism

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (spark_fn, oracle_sql | None). Populated below and, as an import
#: side effect, by the `@register` decorators in `manifold_spark/operators/
#: __init__.py` (triggered via `_ensure_extensions`).
REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver supplies its own session; timestamp FORMATTING follows the
    # session timezone, and the DuckDB oracle renders naive timestamps.
    # Pin UTC so hour buckets / date keys agree regardless of host tz.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return read_events(spark, sf_dir)
    return _normalize_ntz(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to plain TIMESTAMP. Testdata generators
    have flip-flopped on parquet `isAdjustedToUTC`; with the session tz
    pinned UTC the cast is value-identical to how DuckDB reads the same
    naive values, and downstream code (unix_micros, RANGE frames,
    window specs) only accepts TIMESTAMP."""
    ntz = [name for name, dtype in df.dtypes if dtype == "timestamp_ntz"]
    for name in ntz:
        df = df.withColumn(name, F.col(name).cast("timestamp"))
    return df


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize the events table's `ts` to a plain TIMESTAMP (LTZ) whatever
    the parquet physical type is. Generators have produced two layouts:

    - TIMESTAMP(NANOS): the Spark reader rejects it outright; read nanos as
      raw long (legacy conf) and convert with integer division — float
      division would lose precision on 1.7e18-scale nanosecond values.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers TIMESTAMP_NTZ,
      which `unix_micros` / RANGE window frames reject; cast to TIMESTAMP.
      The session timezone is pinned UTC (see `_t`), so the naive wall-clock
      values are interpreted exactly as DuckDB renders them.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return _normalize_ntz(df)


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


# ---------------------------------------------------------------------------
# P1-P6 — projection / null-default / HTML-strip / truncate / rename
# (reference `el_to_parquet.py:53-95`). r7: the standalone `clean_project`
# key retired to make 50-key-cap room for the PQ gates; the full clean
# chain (null-default → strip → truncate, source null-fill) is driver-
# gated inside `text_stats` (operators/__init__.py) and the anchor-keeping
# lookahead stays pinned by tests/test_clean.py goldens.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Combined scalar-surface gate: P6/P7 (rename + snake_case), F2/F3/F10
# (date→int keys), P9 (sha256 row fingerprint), and surrogate-key
# assignment (identity replacement, SURVEY §7 risk 2) in ONE row-level
# query over `orders`. Replaces the single-concept keys
# `snake_case_rename` / `date_scalar_keys` / `fingerprint_rows` /
# `surrogate_keys` so every registry key fits the driver's 50-key cap
# (each concept still exercises its real engine function below).
# ---------------------------------------------------------------------------
@register(
    "scalar_key_surface",
    """
    WITH prio AS (
        SELECT CAST(row_number() OVER (ORDER BY order_priority) AS BIGINT) AS priority_sk,
               order_priority
        FROM (SELECT DISTINCT o_orderpriority AS order_priority FROM orders)
    )
    SELECT o.o_orderkey AS order_key,
           CAST(strftime(o.o_orderdate, '%Y%m%d') AS INT) AS date_id,
           strftime(o.o_orderdate, '%Y-%m-%d') AS full_date,
           CAST(year(o.o_orderdate) AS INT) AS year_number,
           CAST(quarter(o.o_orderdate) AS INT) AS quarter_number,
           CAST(dayofweek(o.o_orderdate) + 1 AS INT) AS weekday_number,
           sha256(concat_ws('||', o.o_orderstatus, o.o_orderpriority)) AS row_hash,
           p.priority_sk
    FROM orders o JOIN prio p ON o.o_orderpriority = p.order_priority
    """,
)
def q_scalar_key_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    from manifold_spark.scd2 import assign_surrogate_keys

    orders = _t(spark, sf_dir, "orders")
    # P6/P7: CamelCase contract → the engine's one-projection normalizer.
    camel = orders.select(
        F.col("o_orderkey").alias("OrderKey"),
        F.col("o_orderdate").alias("OrderDate"),
        F.col("o_orderstatus").alias("OrderStatus"),
        F.col("o_orderpriority").alias("OrderPriority"),
    )
    snaked = clean.snake_case_columns(camel)
    # Surrogate keys over the distinct priority dimension (broadcast-sized).
    prio = assign_surrogate_keys(
        snaked.select("order_priority").distinct(), "priority_sk", ["order_priority"]
    )
    d = F.col("order_date")
    return (
        snaked.join(broadcast(prio), "order_priority")
        .select(
            F.col("order_key"),
            F.date_format(d, "yyyyMMdd").cast("int").alias("date_id"),
            F.date_format(d, "yyyy-MM-dd").alias("full_date"),
            F.year(d).cast("int").alias("year_number"),
            F.quarter(d).cast("int").alias("quarter_number"),
            F.dayofweek(d).cast("int").alias("weekday_number"),
            fingerprint([F.col("order_status"), F.col("order_priority")]).alias("row_hash"),
            F.col("priority_sk"),
        )
    )


# ---------------------------------------------------------------------------
# A1 + P9 — staging dimension derivation: distinct projection + hash
# (reference `el_to_parquet.py:177-193`). r7: the standalone
# `stage_dimension` key retired under the 50-key cap — both concepts stay
# driver-gated elsewhere (distinct dimension + surrogate keys + concat_ws/
# sha2 hash inside `scalar_key_surface`; arg_min survivor distinct inside
# `dedup_exact`) and the engine function keeps its pytest coverage
# (tests/test_pipeline.py staging assertions, tests/test_operators.py).
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Combined audit-counts gate: A2 (row-count asserts), A3 (duplicate-key
# group-by + having), set operations (INTERSECT / EXCEPT cohorts), and
# pivot (long→wide conditional aggregation, stacked back via unpivot) in
# ONE (cohort, n) union. Replaces the single-concept keys `count_rows` /
# `dup_key_check` / `set_ops_customers` / `pivot_lang_counts` under the
# driver's 50-key cap; each concept keeps its real engine primitive
# (count agg, having-filter, intersect/exceptAll, pivot+unpivot).
# ---------------------------------------------------------------------------
_PIVOT_LANGS = ["de", "en", "es", "fr", "zh"]

_AUDIT_COUNTS_ORACLE = (
    """
    WITH wide AS (
        SELECT source,
    """
    + ", ".join(
        f"count(*) FILTER (WHERE lang = '{lang}') AS n_{lang}" for lang in _PIVOT_LANGS
    )
    + """
        FROM documents GROUP BY source
    )
    """
    + "\n    UNION ALL ".join(
        f"SELECT 'docs_' || coalesce(source, 'null') || '_{lang}' AS cohort, n_{lang} AS n FROM wide"
        for lang in _PIVOT_LANGS
    )
    + """
    UNION ALL SELECT 'rows_customer', count(*) FROM customer
    UNION ALL SELECT 'rows_documents', count(*) FROM documents
    UNION ALL SELECT 'rows_lineitem', count(*) FROM lineitem
    UNION ALL SELECT 'rows_orders', count(*) FROM orders
    UNION ALL SELECT 'rows_part', count(*) FROM part
    UNION ALL SELECT 'rows_supplier', count(*) FROM supplier
    UNION ALL SELECT 'suppliers_in_europe', (
        SELECT count(*) FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE')
    UNION ALL SELECT 'dup_key_groups', (
        SELECT count(*) FROM (
            SELECT user_id, event_type FROM events
            GROUP BY user_id, event_type HAVING count(*) > 1))
    UNION ALL SELECT 'cust_both_halves', (
        SELECT count(*) FROM (
            SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) < 1995
            INTERSECT
            SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) >= 1995))
    UNION ALL SELECT 'cust_never_ordered', (
        SELECT count(*) FROM (
            SELECT c_custkey FROM customer
            EXCEPT
            SELECT o_custkey FROM orders))
    UNION ALL SELECT 'with_urgent_order', (
        SELECT count(*) FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT'))
    UNION ALL SELECT 'without_any_order', (
        SELECT count(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey))
    UNION ALL
    SELECT 'profile_orders_' || metric, n FROM (
        WITH p AS (
            SELECT count(*) AS n_rows,
                   count(o_orderkey) AS nn_orderkey,
                   count(DISTINCT o_orderkey) AS nd_orderkey,
                   count(o_custkey) AS nn_custkey,
                   count(DISTINCT o_custkey) AS nd_custkey,
                   count(o_orderstatus) AS nn_status,
                   count(DISTINCT o_orderstatus) AS nd_status,
                   CAST(floor(min(o_totalprice) * 10000.0 + 0.5) AS BIGINT) AS min_price_q,
                   CAST(floor(max(o_totalprice) * 10000.0 + 0.5) AS BIGINT) AS max_price_q,
                   CAST(strftime(min(o_orderdate), '%Y%m%d') AS BIGINT) AS min_date,
                   CAST(strftime(max(o_orderdate), '%Y%m%d') AS BIGINT) AS max_date
            FROM orders
        )
        SELECT 'n_rows' AS metric, n_rows AS n FROM p
        UNION ALL SELECT 'nn_orderkey', nn_orderkey FROM p
        UNION ALL SELECT 'nd_orderkey', nd_orderkey FROM p
        UNION ALL SELECT 'nn_custkey', nn_custkey FROM p
        UNION ALL SELECT 'nd_custkey', nd_custkey FROM p
        UNION ALL SELECT 'nn_status', nn_status FROM p
        UNION ALL SELECT 'nd_status', nd_status FROM p
        UNION ALL SELECT 'min_price_q', min_price_q FROM p
        UNION ALL SELECT 'max_price_q', max_price_q FROM p
        UNION ALL SELECT 'min_date', min_date FROM p
        UNION ALL SELECT 'max_date', max_date FROM p
    )
    """
)


@register("audit_counts", _AUDIT_COUNTS_ORACLE)
def q_audit_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14 (guide §1.2 plan diamonds): the union's branches scan `orders`
    # seven times (row count, both-halves ×2, never-ordered, urgent semi,
    # any-order anti, profile agg) and `customer` four times — one
    # tracked cache each replaces the rescans (released by
    # `operator_cache_scope`). The caches hold PROJECTIONS of exactly the
    # columns the union touches, so the cache does not defeat column
    # pruning (guide §6) — every branch computes the same values over
    # the same columns either way.
    from manifold_spark.operators.dedup import _persist_tracked

    docs = _t(spark, sf_dir, "documents")
    o = _persist_tracked(
        _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
            "o_totalprice", "o_orderdate",
        )
    )
    c = _persist_tracked(_t(spark, sf_dir, "customer").select("c_custkey"))
    events = _t(spark, sf_dir, "events")

    # Pivot (explicit value list → conditional aggregation, data-independent
    # schema) then unpivot back to the (cohort, n) shape of the union.
    wide = docs.groupBy("source").pivot("lang", _PIVOT_LANGS).agg(F.count(F.lit(1)))
    pivot_rows = (
        wide.unpivot("source", _PIVOT_LANGS, "lang", "n_raw")
        .select(
            # coalesce BEFORE concat: concat_ws silently skips NULLs (would
            # label 'docs_<lang>') while the oracle's || yields NULL — a NULL
            # source must produce the same 'docs_null_<lang>' on both engines.
            F.concat_ws(
                "_", F.lit("docs"), F.coalesce(F.col("source"), F.lit("null")), F.col("lang")
            ).alias("cohort"),
            F.coalesce(F.col("n_raw"), F.lit(0)).cast("long").alias("n"),
        )
    )

    counts = None
    for name, df in (("rows_customer", c), ("rows_documents", docs),
                     ("rows_lineitem", _t(spark, sf_dir, "lineitem")), ("rows_orders", o),
                     ("rows_part", _t(spark, sf_dir, "part")),
                     ("rows_supplier", _t(spark, sf_dir, "supplier"))):
        one = df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(name).alias("cohort"), "n")
        counts = one if counts is None else counts.unionByName(one)

    s = _t(spark, sf_dir, "supplier")
    n_dim = _t(spark, sf_dir, "nation")
    r_dim = _t(spark, sf_dir, "region")
    europe = (
        s.join(broadcast(n_dim), s.s_nationkey == n_dim.n_nationkey)
        .join(broadcast(r_dim.filter(F.col("r_name") == "EUROPE")),
              n_dim.n_regionkey == r_dim.r_regionkey)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("suppliers_in_europe").alias("cohort"), "n")
    )
    counts = counts.unionByName(europe)

    dup_groups = (
        events.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("dup_key_groups").alias("cohort"), "n")
    )
    early = o.filter(F.year("o_orderdate") < 1995).select("o_custkey").distinct()
    late = o.filter(F.year("o_orderdate") >= 1995).select("o_custkey").distinct()
    both_halves = (
        early.intersect(late)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("cust_both_halves").alias("cohort"), "n")
    )
    never = (
        c.select(F.col("c_custkey").alias("o_custkey"))
        .exceptAll(o.select("o_custkey"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("cust_never_ordered").alias("cohort"), "n")
    )
    # r8 fold of the former `semi_anti_customers` key: the EXISTS /
    # NOT-EXISTS cohorts keep their first-class LeftSemi / LeftAnti plans
    # (no row multiplication, right side only probed) as two more
    # (cohort, n) rows in this union.
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    with_urgent = (
        c.join(urgent, "c_custkey", "left_semi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("with_urgent_order").alias("cohort"), "n")
    )
    without_any = (
        c.join(o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("without_any_order").alias("cohort"), "n")
    )
    # r9 fold of the former `profile_orders` key (freed slot →
    # `curation_pipeline`): the ANALYZE/SUMMARIZE-style one-pass table
    # profile — per-column null counts, exact distinct counts (one Expand
    # + a single shuffle), numeric/temporal ranges — melted into the
    # (cohort, n) shape; the double/date scalars ride as floor-quantized
    # ×10000 prices and yyyyMMdd ints, the house cross-engine discipline.
    profile_metrics = [
        "n_rows", "nn_orderkey", "nd_orderkey", "nn_custkey", "nd_custkey",
        "nn_status", "nd_status", "min_price_q", "max_price_q",
        "min_date", "max_date",
    ]
    profile = (
        o.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count("o_orderkey").cast("long").alias("nn_orderkey"),
            F.countDistinct("o_orderkey").cast("long").alias("nd_orderkey"),
            F.count("o_custkey").cast("long").alias("nn_custkey"),
            F.countDistinct("o_custkey").cast("long").alias("nd_custkey"),
            F.count("o_orderstatus").cast("long").alias("nn_status"),
            F.countDistinct("o_orderstatus").cast("long").alias("nd_status"),
            F.floor(F.min("o_totalprice") * 10000.0 + 0.5)
            .cast("long")
            .alias("min_price_q"),
            F.floor(F.max("o_totalprice") * 10000.0 + 0.5)
            .cast("long")
            .alias("max_price_q"),
            F.date_format(F.min("o_orderdate"), "yyyyMMdd")
            .cast("long")
            .alias("min_date"),
            F.date_format(F.max("o_orderdate"), "yyyyMMdd")
            .cast("long")
            .alias("max_date"),
        )
        .unpivot([], profile_metrics, "metric", "n")
        .select(
            F.concat(F.lit("profile_orders_"), F.col("metric")).alias("cohort"),
            "n",
        )
    )
    return (
        pivot_rows.unionByName(counts)
        .unionByName(dup_groups)
        .unionByName(both_halves)
        .unionByName(never)
        .unionByName(with_urgent)
        .unionByName(without_any)
        .unionByName(profile)
    )


# ---------------------------------------------------------------------------
# J1 + J2 + D9 + F10 — the flagship: star-schema fact resolution + rollup.
# Fact stream joins broadcast dimensions (reference fact load,
# `sql_queries_presentation.py:105-140`), then aggregates. At scale: the
# lineitem scan never shuffles — every dim is broadcast; the single shuffle
# is the final group-by, with map-side partial aggregation.
# ---------------------------------------------------------------------------
@register(
    "star_join_fact",
    """
    SELECT r.r_name AS region_name,
           CAST(year(o.o_orderdate) AS INT) AS order_year,
           l.l_returnflag AS return_flag,
           count(*) AS n_items,
           CAST(SUM(CAST(floor((l.l_extendedprice * (1 - l.l_discount)) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2, 3
    """,
)
def q_star_join_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = ensure_parallelism(_t(spark, sf_dir, "lineitem"))
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy(
        F.col("r_name").alias("region_name"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.col("l_returnflag").alias("return_flag"),
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# J3/J4 — SCD2 delta detection: new-or-changed rows vs a target snapshot
# (reference dimension_operator.py:13-64). Snapshots are derived
# deterministically from `orders` so the oracle can rebuild them.
# ---------------------------------------------------------------------------
_SCD2_DELTA_ORACLE = """
    WITH base AS (
        SELECT o_orderkey,
               sha256(concat_ws('||', o_orderstatus, o_orderpriority)) AS hash
        FROM orders
    ),
    target AS (
        SELECT o_orderkey,
               sha256(concat_ws('||', o_orderstatus,
                      CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderpriority END)) AS hash
        FROM orders WHERE o_orderkey % 10 <> 0
    )
    SELECT b.o_orderkey,
           CASE WHEN t.o_orderkey IS NULL THEN 'new' ELSE 'changed' END AS change_type
    FROM base b LEFT JOIN target t ON b.o_orderkey = t.o_orderkey
    WHERE t.o_orderkey IS NULL OR t.hash <> b.hash
"""


@register("scd2_delta_detect", _SCD2_DELTA_ORACLE)
def q_scd2_delta_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        fingerprint([F.col("o_orderstatus"), F.col("o_orderpriority")]).alias("hash"),
    )
    target = orders.filter(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey",
        fingerprint(
            [
                F.col("o_orderstatus"),
                F.when(F.col("o_orderkey") % 7 == 0, F.lit("X")).otherwise(F.col("o_orderpriority")),
            ]
        ).alias("hash"),
    )
    b, t = base.alias("b"), target.alias("t")
    return (
        b.join(t, F.col("b.o_orderkey") == F.col("t.o_orderkey"), "left")
        .filter(F.col("t.o_orderkey").isNull() | (F.col("t.hash") != F.col("b.hash")))
        .select(
            F.col("b.o_orderkey").alias("o_orderkey"),
            F.when(F.col("t.o_orderkey").isNull(), F.lit("new")).otherwise(F.lit("changed")).alias("change_type"),
        )
    )


# ---------------------------------------------------------------------------
# D5/D6/D10 — the FULL SCD2 merge, oracled end-to-end: build a week-1 dim
# snapshot (some stale segments, some keys missing), merge the current
# `customer` table as week 2, and return the rebuilt dimension.
# ---------------------------------------------------------------------------
_SCD2_MERGE_ORACLE = """
    WITH w1 AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 5 = 0 THEN 'OLD' ELSE c_mktsegment END AS segment
        FROM customer WHERE c_custkey % 11 <> 0
    ),
    w1h AS (
        SELECT c_custkey, segment,
               sha256(concat_ws('||', CAST(c_custkey AS VARCHAR), segment)) AS hash
        FROM w1
    ),
    target AS (
        SELECT CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT) AS customer_sk,
               c_custkey, segment, hash,
               DATE '2024-01-01' AS record_start_date,
               DATE '9999-12-31' AS record_end_date
        FROM w1h
    ),
    w2h AS (
        SELECT c_custkey, c_mktsegment AS segment,
               sha256(concat_ws('||', CAST(c_custkey AS VARCHAR), c_mktsegment)) AS hash
        FROM customer
    ),
    changed AS (
        SELECT t.c_custkey FROM target t JOIN w2h b USING (c_custkey)
        WHERE t.hash <> b.hash
    ),
    expired AS (
        SELECT customer_sk, c_custkey, segment, hash, record_start_date,
               DATE '2024-01-07' AS record_end_date
        FROM target WHERE c_custkey IN (SELECT c_custkey FROM changed)
    ),
    untouched AS (
        SELECT * FROM target WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)
    ),
    inserts_src AS (
        SELECT b.c_custkey, b.segment, b.hash
        FROM w2h b LEFT JOIN target t USING (c_custkey)
        WHERE t.c_custkey IS NULL OR t.hash <> b.hash
    ),
    inserts AS (
        SELECT (SELECT max(customer_sk) FROM target)
                 + CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT) AS customer_sk,
               c_custkey, segment, hash,
               DATE '2024-01-08' AS record_start_date,
               DATE '9999-12-31' AS record_end_date
        FROM inserts_src
    )
    SELECT * FROM untouched
    UNION ALL SELECT * FROM expired
    UNION ALL SELECT * FROM inserts
"""


@register("scd2_merge_full", _SCD2_MERGE_ORACLE)
def q_scd2_merge_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    w1 = customer.filter(F.col("c_custkey") % 11 != 0).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 5 == 0, F.lit("OLD")).otherwise(F.col("c_mktsegment")).alias("segment"),
    )
    w1h = with_fingerprint(
        w1.withColumn("c_custkey_str", F.col("c_custkey").cast("string")), ["c_custkey_str", "segment"]
    ).drop("c_custkey_str")
    # r14: persist the derived week-1 target — `scd2_merge` references its
    # target relation five times (active ×3, inactive, max-sk scalar), and
    # in this gate the target is a scan+hash+global-window subtree that
    # re-executed per reference (3× in the r14 before-plan). In production
    # the target is a parquet table (cheap rescans); here one tracked
    # cache build replaces the recomputation. Result rows unchanged.
    from manifold_spark.operators.dedup import _persist_tracked

    target = _persist_tracked(
        initial_load(w1h, "customer_sk", ["c_custkey"], "2024-01-01")
    )

    w2 = customer.select("c_custkey", F.col("c_mktsegment").alias("segment"))
    w2h = with_fingerprint(
        w2.withColumn("c_custkey_str", F.col("c_custkey").cast("string")), ["c_custkey_str", "segment"]
    ).drop("c_custkey_str")

    return scd2_merge(target, w2h, "customer_sk", ["c_custkey"], "2024-01-08")


# ---------------------------------------------------------------------------
# D4 + F1-F9 — the generated 30-year date dimension
# ---------------------------------------------------------------------------
_DATE_DIM_ORACLE = """
    SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS date_id,
           strftime(d, '%Y-%m-%d') AS full_date,
           CAST(year(d) AS INT) AS year_number,
           CAST(weekofyear(d) AS INT) AS week_iso_number,
           CAST(dayofyear(d) AS INT) AS day_number,
           CAST(quarter(d) AS INT) AS quarter_number,
           CAST(month(d) AS INT) AS month_number,
           monthname(d) AS month_name,
           CAST(dayofweek(d) + 1 AS INT) AS weekday_number,
           dayname(d) AS day_name,
           CASE WHEN dayofweek(d) IN (0, 6) THEN 0 ELSE 1 END AS is_weekday,
           CASE WHEN last_day(d) = d THEN 1 ELSE 0 END AS is_last_of_month
    FROM (SELECT CAST(DATE '2018-01-01' + INTERVAL (i) DAY AS DATE) AS d
          FROM generate_series(0, 10950) t(i))
"""


@register("date_dimension", _DATE_DIM_ORACLE)
def q_date_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    return date_dimension(spark)


#: The driver's correctness gate evaluates registry keys in insertion
#: order and caps the per-round key set at 50 (r02 recorded exactly the
#: first 50 of 56). Round 5 consolidated the registry to ≤50 keys — the
#: 8 single-concept tail keys merged into `scalar_key_surface` +
#: `audit_counts`, the 4 text-stat scans into `text_stats`, the 2
#: per-event-type aggregates into `events_type_stats` — so EVERY key now
#: gets a fresh driver row each round. The head still front-loads keys
#: never (or least recently) driver-checked, in case the cap ever drops.
_DRIVER_ORDER_HEAD = [
    # new in round 12 — never driver-checked (the two state stores
    # inside the hard gate, VERDICT r11 #1; slots freed by the
    # sampling_surface and multimodal decode folds)
    "curation_store_pipeline",
    "ann_store_cdc",
    # reshaped in round 12 (sample_mix_sources + pack_context_windows
    # fold; multimodal_decode folded into multimodal_meta) — re-check
    "sampling_surface",
    "multimodal_meta",
    # new in round 10 — driver-checked since (end-to-end curation
    # pipeline; slot freed by the profile_orders → audit_counts fold)
    "curation_pipeline",
    # reshaped in round 10 (DSIR section riding the NB gate, BPE doc
    # encoding riding the training gate, profile fold) — re-check first
    "text_classifier_nb",
    "text_bpe",
    "audit_counts",
    "text_lm_score",
    # new in round 9
    "sim_semdedup",
    "text_c4_filters",
    "dedup_bloom",
    # reshaped in round 9 (hourly-rollup grain union, chunk-manifest
    # section union, retention folded into the funnel) — re-check first
    "events_type_stats",
    "events_funnel",
    # new in round 8 (late tranche)
    "text_line_dedup",
    # reshaped in round 8 late tranche (BM25 and-mode union, kmeans
    # full+sampled union, semi/anti fold) — re-check first
    "text_bm25",
    "sim_ann_ivf_kmeans",
    # earlier round-8 additions/reshapes
    "text_repetition",
    "text_stats",
    "events_rolling_1h",
    # round-7 additions — keep early in case the cap ever drops
    "sim_ann_pq",
    "sim_ann_ivf_pq",
    "text_span_dedup",
]


def _driver_order(names: list[str]) -> list[str]:
    head = [n for n in _DRIVER_ORDER_HEAD if n in names]
    mid = [n for n in names if n not in set(head)]
    return head + mid


def all_queries() -> dict[str, QueryFn]:
    _ensure_extensions()
    order = _driver_order(list(REGISTRY))
    return {name: REGISTRY[name][0] for name in order}


def all_oracles() -> dict[str, str]:
    _ensure_extensions()
    order = _driver_order(list(REGISTRY))
    return {name: REGISTRY[name][1] for name in order if REGISTRY[name][1] is not None}


def _ensure_extensions() -> None:
    """Import side-effect registration from the operators package."""
    from manifold_spark import operators  # noqa: F401


# ---------------------------------------------------------------------------
# TPC-H-Q1-style pricing summary: the canonical scan-heavy aggregate —
# filter pushed to the parquet scan, map-side partial aggregation, decimal-
# exact sums (all quantities that matter for a 100 TB scan benchmark).
# ---------------------------------------------------------------------------
@register(
    "pricing_summary",
    """
    SELECT l_returnflag AS return_flag,
           l_linestatus AS line_status,
           CAST(SUM(CAST(floor((l_quantity) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0 AS sum_qty,
           CAST(SUM(CAST(floor((l_extendedprice) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0 AS sum_base_price,
           CAST(SUM(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
           CAST(SUM(CAST(floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0 AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = ensure_parallelism(_t(spark, sf_dir, "lineitem"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(
            F.col("l_returnflag").alias("return_flag"),
            F.col("l_linestatus").alias("line_status"),
        )
        .agg(
            decimal_sum(F.col("l_quantity")).alias("sum_qty"),
            decimal_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            decimal_sum(disc).alias("sum_disc_price"),
            decimal_sum(disc * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# JSON path extraction (the ingest surface S1 as a scalar op) over the
# events props column, rolled up per extracted key bucket.
# ---------------------------------------------------------------------------
@register(
    "events_json_extract",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
           count(*) AS n,
           CAST(SUM(CAST(floor((value) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0 AS total_value
    FROM events
    GROUP BY 1
    """,
)
def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("k_bucket", F.get_json_object("props", "$.k").cast("int") % 10)
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            decimal_sum(F.col("value")).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Top-N per group (window rank) — beyond the reference's surface (§2.5
# "window functions: none") but table stakes for an analytics engine.
# ---------------------------------------------------------------------------
@register(
    "topn_per_group",
    """
    SELECT c_mktsegment AS segment, c_custkey, c_acctbal, CAST(rnk AS INT) AS rnk
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS rnk
        FROM customer
    )
    WHERE rnk <= 10
    """,
)
def q_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select(F.col("c_mktsegment").alias("segment"), "c_custkey", "c_acctbal", "rnk")
    )


# (r6: the former `dedup_survivors` key — the "apply the decision" half
# of exact dedup — folded INTO `dedup_exact` in operators/__init__.py under
# the driver's 50-key cap: the combined key emits survivor rows WITH
# their lang/source payload, exercising both the hash group-by and the
# survivor join in one gate.)


# (r9: the former `quality_filter` key folded INTO `text_stats` as the
# `quality_pass` flag — same scan, same predicate, zero extra passes.)
# ---------------------------------------------------------------------------
# Multi-dimensional aggregation: CUBE over (region, year). Beyond the
# reference's surface (§2.4: no grouping sets) — table stakes for a
# warehouse engine. Spark plans one pass with an Expand node.
# ---------------------------------------------------------------------------
@register(
    "sales_cube",
    """
    SELECT r.r_name AS region_name,
           CAST(year(o.o_orderdate) AS INT) AS order_year,
           CAST(grouping(r.r_name, year(o.o_orderdate)) AS INT) AS gid,
           count(*) AS n_orders,
           CAST(SUM(CAST(floor(o.o_totalprice * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0 AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY CUBE (r.r_name, year(o.o_orderdate))
    """,
)
def q_sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional aggregation + grouping bitmask in one gate
    (r7 fold of the former `sales_rollup_sets` key): CUBE's cell set is
    a strict superset of ROLLUP's over the same columns — (r, y), (r),
    (y), () vs (r, y), (r), () — and the grouping_id disambiguation now
    lives here, so the one-pass Expand + single map-side-combined
    shuffle plan stays gated while the key count makes cap room for
    `text_span_dedup`."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = (
        o.join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.cube(
        F.col("r_name").alias("region_name"),
        F.year("o_orderdate").cast("int").alias("order_year"),
    ).agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        decimal_sum(F.col("o_totalprice")).alias("total_price"),
    )


# ---------------------------------------------------------------------------
# (r8: the former `events_running_total` key — per-user cumulative value
# over an unbounded-preceding ROWS frame — folded INTO `events_rolling_1h`
# below as its `running_value` column under the driver's 50-key cap: both
# windows share the user_id partitioning (one shuffle serves the pair) and
# the cumulative frame stays driver-gated. The freed slot went to
# `text_lm_score`.)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS): the reference's J4 null-check is
# the anti-join pattern. (r8: the standalone `semi_anti_customers` key
# folded INTO `audit_counts` under the driver's 50-key cap — the two
# cohorts kept their first-class LeftSemi/LeftAnti plans verbatim as
# (cohort, n) rows of that union; the freed slot went to
# `text_line_dedup`.)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Multi-level rollup (GROUPING SETS): the hypertable-rollup flavor — one
# pass produces per-(region, year) cells, per-region subtotals, and the
# grand total, disambiguated by the grouping bitmask. Spark computes
# ROLLUP with a single expand + one shuffle (map-side combined).
# ---------------------------------------------------------------------------
# (r7: the former `sales_rollup_sets` key — ROLLUP + grouping_id over the
# same star join — folded INTO `sales_cube` above under the driver's
# 50-key cap: CUBE's cell set strictly contains ROLLUP's, and the gid
# bitmask column moved into the cube gate, so every grouping-sets concept
# (Expand node, subtotal cells, bitmask disambiguation) stays driver-
# gated. The freed slot went to `text_span_dedup`.)


# ---------------------------------------------------------------------------
# Event-time range-frame window: per-user rolling 1-hour spend at every
# event. RANGE frames bound by event time (not row counts) are the
# canonical sliding-aggregate over irregular event streams; microsecond
# epoch ordering keeps both engines' frames identical (second-granular
# epochs would bucket sub-second neighbors differently).
# ---------------------------------------------------------------------------
@register(
    "events_rolling_1h",
    """
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           CAST(SUM(CAST(floor(value * 10000.0 + 0.5) AS HUGEINT)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 10000.0 AS rolling_1h,
           CAST(SUM(CAST(floor(value * 10000.0 + 0.5) AS HUGEINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 10000.0 AS running_value
    FROM events
    """,
)
def q_events_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame (rolling 1h spend) + cumulative ROWS frame
    (running total; r8 fold of the former `events_running_total` key) over
    the SAME user_id partitioning — one exchange feeds both Window nodes;
    the cumulative sort keys (ts, event_id) deterministically order ties
    the RANGE frame is insensitive to."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_599_999_999, 0)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scaled = F.floor(F.col("value") * F.lit(10000.0) + F.lit(0.5)).cast("decimal(38,0)")
    return e.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        (F.sum(scaled).over(w).cast("double") / F.lit(10000.0)).alias("rolling_1h"),
        (F.sum(scaled).over(w_run).cast("double") / F.lit(10000.0)).alias("running_value"),
    )


# ---------------------------------------------------------------------------
# Ordered funnel: per user, first 'view', first 'click' at-or-after it,
# first 'purchase' at-or-after that. Staged conditional aggregation — each
# stage is an equi-join + min-aggregate on user_id, so all three stages
# co-partition on the same key (one logical shuffle reused; no window
# over the whole event stream, no cross join).
# ---------------------------------------------------------------------------
@register(
    "events_funnel",
    """
    WITH v AS (
        SELECT user_id, min(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts >= v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
        GROUP BY e.user_id
    ),
    s AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    a AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events
    )
    SELECT 'funnel' AS analysis,
           v.user_id,
           CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                     WHEN c.user_id IS NOT NULL THEN 2
                     ELSE 1 END AS INT) AS stage,
           strftime(v.t_view, '%Y-%m-%d %H:%M:%S') AS t_view,
           strftime(c.t_click, '%Y-%m-%d %H:%M:%S') AS t_click,
           strftime(p.t_purchase, '%Y-%m-%d %H:%M:%S') AS t_purchase,
           '' AS cohort_week,
           CAST(-1 AS INT) AS week_offset,
           CAST(-1 AS BIGINT) AS n_active
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    UNION ALL
    SELECT 'retention' AS analysis,
           CAST(-1 AS BIGINT) AS user_id,
           CAST(-1 AS INT) AS stage,
           CAST(NULL AS VARCHAR) AS t_view,
           CAST(NULL AS VARCHAR) AS t_click,
           CAST(NULL AS VARCHAR) AS t_purchase,
           strftime(s.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(datediff('day', s.cohort_week, a.act_week) / 7 AS INT) AS week_offset,
           count(*) AS n_active
    FROM a JOIN s ON a.user_id = s.user_id
    WHERE a.act_week >= s.cohort_week
    GROUP BY 7, 8
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel AND weekly-cohort retention in one gate, union-
    tagged by `analysis` (r9 fold of the former `events_retention` key —
    both are cohort analytics over the same events scan; each branch's
    plan is unchanged)."""
    e = _t(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.join(v, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") >= F.col("t_view")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.join(c, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") >= F.col("t_click")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    out = v.join(c, "user_id", "left").join(p, "user_id", "left")
    stage = (
        F.when(F.col("t_purchase").isNotNull(), F.lit(3))
        .when(F.col("t_click").isNotNull(), F.lit(2))
        .otherwise(F.lit(1))
        .cast("int")
    )
    null_s = F.lit(None).cast("string")
    funnel = out.select(
        F.lit("funnel").alias("analysis"),
        "user_id",
        stage.alias("stage"),
        F.date_format("t_view", "yyyy-MM-dd HH:mm:ss").alias("t_view"),
        F.date_format("t_click", "yyyy-MM-dd HH:mm:ss").alias("t_click"),
        F.date_format("t_purchase", "yyyy-MM-dd HH:mm:ss").alias("t_purchase"),
        F.lit("").alias("cohort_week"),
        F.lit(-1).cast("int").alias("week_offset"),
        F.lit(-1).cast("bigint").alias("n_active"),
    )
    # Cohort retention: users bucketed by signup week (ISO Monday
    # truncation, identical in both engines), activity weeks as offsets
    # from the cohort — distinct (user, week) activity → one join to the
    # cohort table → count per (cohort, offset).
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    a = e.select("user_id", F.date_trunc("week", F.col("ts")).alias("act_week")).distinct()
    retention = (
        a.join(s, "user_id")
        .filter(F.col("act_week") >= F.col("cohort_week"))
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("act_week"), F.col("cohort_week")) / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
        .select(
            F.lit("retention").alias("analysis"),
            F.lit(-1).cast("bigint").alias("user_id"),
            F.lit(-1).cast("int").alias("stage"),
            null_s.alias("t_view"),
            null_s.alias("t_click"),
            null_s.alias("t_purchase"),
            "cohort_week",
            "week_offset",
            "n_active",
        )
    )
    return funnel.unionByName(retention)


# ---------------------------------------------------------------------------
# TPC-H Q3-style shipping priority: revenue of unshipped BUILDING-segment
# orders — selective filters pushed to both scans, customer broadcast,
# distributed top-10 (TakeOrdered, no global sort materialization).
# ---------------------------------------------------------------------------
@register(
    "shipping_priority",
    """
    SELECT l.l_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(SUM(CAST(floor((l.l_extendedprice * (1 - l.l_discount)) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > DATE '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = ensure_parallelism(_t(spark, sf_dir, "lineitem"))
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    joined = (
        l.filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("date"))
        .join(
            broadcast(o.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))),
            l.l_orderkey == o.o_orderkey,
        )
        .join(
            broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")),
            o.o_custkey == c.c_custkey,
        )
    )
    return (
        joined.groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .agg(decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Table profiling (ANALYZE/SUMMARIZE-style). r9: the standalone
# `profile_orders` KEY retired under the driver's 50-key cap — the whole
# profile (per-column null counts, exact distinct counts via one Expand +
# a single shuffle, numeric/temporal ranges) stays driver-gated as the
# `profile_orders_*` rows of `audit_counts`; the freed slot went to
# `curation_pipeline`. The interactive-scale swap remains
# approx_count_distinct per column (operators/approx.py pattern).
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Declarative data-quality suite: every expectation evaluates in ONE
# aggregate pass (conditional counts, map-side combined) — never a scan
# per check. Generalizes reference A2/A3 into the expectations style.
# ---------------------------------------------------------------------------
@register(
    "dq_lineitem",
    """
    WITH agg AS (
        SELECT count(CASE WHEN NOT COALESCE(l_orderkey IS NOT NULL, FALSE) THEN 1 END) AS nn_orderkey,
               count(CASE WHEN NOT COALESCE(l_quantity > 0, FALSE) THEN 1 END) AS positive_qty,
               count(CASE WHEN NOT COALESCE(l_returnflag IN ('A', 'N', 'R'), FALSE) THEN 1 END) AS returnflag_domain,
               count(CASE WHEN NOT COALESCE(l_discount BETWEEN 0.0 AND 1.0, FALSE) THEN 1 END) AS discount_range,
               count(CASE WHEN NOT COALESCE(l_shipdate IS NOT NULL, FALSE) THEN 1 END) AS nn_shipdate
        FROM lineitem
    )
    SELECT check_name, n_violations,
           CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS INT) AS passed
    FROM (
        SELECT 'discount_range' AS check_name, discount_range AS n_violations FROM agg
        UNION ALL SELECT 'nn_orderkey', nn_orderkey FROM agg
        UNION ALL SELECT 'nn_shipdate', nn_shipdate FROM agg
        UNION ALL SELECT 'positive_qty', positive_qty FROM agg
        UNION ALL SELECT 'returnflag_domain', returnflag_domain FROM agg
    )
    """,
)
def q_dq_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from manifold_spark.quality import run_checks

    l = _t(spark, sf_dir, "lineitem")
    return run_checks(
        l,
        {
            "nn_orderkey": F.col("l_orderkey").isNotNull(),
            "positive_qty": F.col("l_quantity") > 0,
            "returnflag_domain": F.col("l_returnflag").isin("A", "N", "R"),
            "discount_range": F.col("l_discount").between(0.0, 1.0),
            "nn_shipdate": F.col("l_shipdate").isNotNull(),
        },
    )
