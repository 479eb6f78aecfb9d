"""Functional / collection surface: higher-order functions, maps, regexp,
explode, deterministic sampling, and sequence generation (SURVEY §2.6 scalar
functions, widened).

The reference's Athena surface includes Presto's lambda/collection functions
(array/map/regexp); this module supplies the Spark-native equivalents as
declarative expressions — every query is whole-stage-codegen-able, no Python
touches row data.  Deterministic sampling (hash-mod splits, stratified top-k
per group) is the training-data-pipeline counterpart: reproducible splits
that shuffle once (or not at all) regardless of corpus size.

Determinism rules as in ``relational.py``: rounded floats, unique tie-break
keys, BIGINT casts in the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..session import tune

QUERIES = {}
ORACLE_SQL = {}


def _q(name):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return fn(spark, sf_dir)
        wrapped.__name__ = name
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn  # lets tools fingerprint the real body
        QUERIES[name] = wrapped
        return wrapped
    return deco


# ---------------------------------------------------------------------------
# Higher-order functions: transform / filter / exists / forall / aggregate
# ---------------------------------------------------------------------------

@_q("q_higher_order_funcs")
def q_higher_order_funcs(spark, sf_dir):
    """Array lambdas over the token list of each document: element-wise
    transform, predicate filter, existential/universal tests, and a fold —
    all evaluated inside codegen (no UDF)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    lens = F.transform(toks, lambda t: F.length(t))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).alias("n_long_tokens"),
        F.aggregate(lens, F.lit(0), lambda acc, x: acc + x).alias("sum_token_len"),
        F.exists(toks, lambda t: F.length(t) > 8).alias("has_long"),
        F.forall(toks, lambda t: F.length(t) < 20).alias("all_short"),
    )


ORACLE_SQL["q_higher_order_funcs"] = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_filter(string_split(text, ' '), t -> len(t) > 5)) AS n_long_tokens,
       CAST(list_sum(list_transform(string_split(text, ' '), t -> len(t))) AS INT)
           AS sum_token_len,
       len(list_filter(string_split(text, ' '), t -> len(t) > 8)) > 0 AS has_long,
       len(list_filter(string_split(text, ' '), t -> len(t) >= 20)) = 0 AS all_short
FROM documents
"""


# ---------------------------------------------------------------------------
# Map construction / lookup / keys
# ---------------------------------------------------------------------------

@_q("q_map_functions")
def q_map_functions(spark, sf_dir):
    """Build a typed map per document, then size / key-list / point-lookup.
    Map values never leave the row (the output is scalars + a sorted,
    comma-joined key string), so the comparison stays engine-neutral and
    every output column is a sortable scalar."""
    d = load(spark, sf_dir, "documents")
    m = F.map_from_arrays(
        F.array(F.lit("chars"), F.lit("tokens"), F.lit("id")),
        F.array(F.col("n_chars"),
                F.size(F.split("text", " ")).cast("long"),
                F.col("doc_id")))
    return d.select(
        "doc_id",
        F.size(m).alias("m_size"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("m_keys"),
        F.element_at(m, F.lit("chars")).alias("chars_val"),
        F.element_at(m, F.lit("tokens")).alias("tokens_val"),
    )


ORACLE_SQL["q_map_functions"] = """
WITH m AS (
  SELECT doc_id,
         MAP(['chars','tokens','id'],
             [n_chars, CAST(len(string_split(text,' ')) AS BIGINT), doc_id]) AS mp
  FROM documents
)
SELECT doc_id,
       CAST(cardinality(mp) AS INT) AS m_size,
       array_to_string(list_sort(map_keys(mp)), ',') AS m_keys,
       list_extract(element_at(mp, 'chars'), 1) AS chars_val,
       list_extract(element_at(mp, 'tokens'), 1) AS tokens_val
FROM m
"""


# ---------------------------------------------------------------------------
# Regexp surface: extract / replace / rlike over the events props JSON
# ---------------------------------------------------------------------------

@_q("q_regexp_functions")
def q_regexp_functions(spark, sf_dir):
    """regexp_extract (typed pull from a JSON-ish string), regexp_replace
    (digit redaction — the PII-scrub shape), and rlike filtering, aggregated
    per event_type."""
    e = load(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k": ([0-9]+)', 1).cast("long")
    return (
        e.filter(F.col("props").rlike(r'"k": [0-9]+'))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_with_k"),
             F.sum(k).alias("sum_k"),
             F.min(F.regexp_replace("props", "[0-9]+", "<NUM>")).alias("redacted_min"))
    )


ORACLE_SQL["q_regexp_functions"] = """
SELECT event_type,
       count(*) AS n_with_k,
       CAST(sum(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT)
           AS sum_k,
       min(regexp_replace(props, '[0-9]+', '<NUM>', 'g')) AS redacted_min
FROM events
WHERE regexp_matches(props, '"k": [0-9]+')
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Explode / lateral: corpus token frequencies
# ---------------------------------------------------------------------------

@_q("q_explode_token_freq")
def q_explode_token_freq(spark, sf_dir):
    """Lateral explode of the token array → global top-30 token frequencies.
    explode → groupBy is one shuffle with map-side partial aggregation; the
    top-k plans as TakeOrderedAndProject (no global sort)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(30)
    )


ORACLE_SQL["q_explode_token_freq"] = """
SELECT tok, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
GROUP BY tok
ORDER BY n DESC, tok ASC
LIMIT 30
"""


# ---------------------------------------------------------------------------
# Deterministic train/test split (training-data pipeline)
# ---------------------------------------------------------------------------

@_q("q_train_test_split")
def q_train_test_split(spark, sf_dir):
    """Reproducible 80/20 split by key modulus — the split is a pure
    projection (no shuffle, no sampling state), so it is stable across runs,
    partitionings, and cluster sizes; at 100 TB the split column can be
    computed at scan time and predicate-pushed."""
    d = load(spark, sf_dir, "documents")
    split = F.when(F.pmod("doc_id", F.lit(10)) < 8, "train").otherwise("test")
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_chars").alias("total_chars"),
             F.round(F.avg("n_chars"), 2).alias("avg_chars"))
    )


ORACLE_SQL["q_train_test_split"] = """
SELECT CASE WHEN doc_id % 10 < 8 THEN 'train' ELSE 'test' END AS split,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(avg(n_chars), 2) AS avg_chars
FROM documents
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Stratified deterministic sample: k docs per (lang, source) stratum
# ---------------------------------------------------------------------------

@_q("q_stratified_sample")
def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling: the first 5 docs per (lang, source)
    stratum by key order.  One shuffle (the window partition); at scale this
    is the reproducible alternative to ``sampleBy`` when exact per-stratum
    counts and run-to-run stability matter (eval sets, human-review draws)."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy("doc_id")
    return (
        d.select("doc_id", "lang", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "lang", "source", "rn")
    )


ORACLE_SQL["q_stratified_sample"] = """
SELECT doc_id, lang, source, rn
FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
  FROM documents
)
WHERE rn <= 5
"""


# ---------------------------------------------------------------------------
# Sequence generation + explode (date scaffolding)
# ---------------------------------------------------------------------------

@_q("q_sequence_dates")
def q_sequence_dates(spark, sf_dir):
    """Per-order 7-day date scaffold via sequence() + explode — the
    generate-rows-from-an-expression shape (calendar spines, gap filling).
    Bounded to one order week so the row expansion is explicit and small."""
    o = load(spark, sf_dir, "orders")
    wk = o.filter((F.col("o_orderdate") >= "1995-01-01")
                  & (F.col("o_orderdate") < "1995-01-08"))
    return (
        wk.select(F.explode(
            F.sequence(F.col("o_orderdate").cast("date"),
                       F.date_add("o_orderdate", 6))).alias("d"))
        .groupBy("d")
        .agg(F.count("*").alias("n_orders_covering"))
    )


ORACLE_SQL["q_sequence_dates"] = """
SELECT CAST(date_add(o_orderdate, i * INTERVAL 1 DAY) AS DATE) AS d,
       count(*) AS n_orders_covering
FROM orders, (SELECT unnest(generate_series(0, 6)) AS i)
WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-01-08'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# unionByName with missing columns (schema-drift union)
# ---------------------------------------------------------------------------

@_q("q_union_by_name")
def q_union_by_name(spark, sf_dir):
    """Union of two differently-shaped projections aligned BY NAME with
    missing columns null-filled — the schema-drift append the reference
    handles with config epochs (SURVEY §2, P1/S2); here it is one operator."""
    c = load(spark, sf_dir, "customer")
    a = c.select("c_custkey", "c_mktsegment", "c_acctbal")
    b = (c.filter(F.col("c_acctbal") < 0)
         .select("c_custkey", "c_mktsegment"))  # no acctbal column
    u = a.unionByName(b, allowMissingColumns=True)
    return (
        u.groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_rows"),
             F.count("c_acctbal").alias("n_with_bal"),
             F.round(F.sum("c_acctbal"), 2).alias("sum_bal"))
    )


ORACLE_SQL["q_union_by_name"] = """
WITH u AS (
  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
  UNION ALL BY NAME
  SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal < 0
)
SELECT c_mktsegment,
       count(*) AS n_rows,
       count(c_acctbal) AS n_with_bal,
       round(sum(c_acctbal), 2) AS sum_bal
FROM u
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# lead / lag / first_value / nth_value window navigation
# ---------------------------------------------------------------------------

@_q("q_window_lead_lag")
def q_window_lead_lag(spark, sf_dir):
    """Navigation functions over each customer's order history: previous /
    next order value, first order date, and 2nd-order date via nth_value
    over an unbounded frame."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.round(F.lag("o_totalprice", 1).over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice", 1).over(w), 2).alias("next_price"),
        F.first("o_orderdate").over(wf).alias("first_order"),
        F.nth_value("o_orderdate", 2).over(wf).alias("second_order"),
    )


ORACLE_SQL["q_window_lead_lag"] = """
SELECT o_custkey, o_orderkey, o_orderdate,
       round(lag(o_totalprice, 1)  OVER w, 2) AS prev_price,
       round(lead(o_totalprice, 1) OVER w, 2) AS next_price,
       first_value(o_orderdate) OVER wf AS first_order,
       nth_value(o_orderdate, 2) OVER wf AS second_order
FROM orders
WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# ---------------------------------------------------------------------------
# Time-series gap filling over a generated calendar spine
# ---------------------------------------------------------------------------

@_q("q_events_gap_fill")
def q_events_gap_fill(spark, sf_dir):
    """Zero-filled hourly event series: a generated hour spine (sequence over
    the observed range) left-joined to per-hour counts — the gap-filling
    shape (dashboards, feature windows) the raw event stream can't answer
    because absent hours produce no rows.  The spine is one generated-rows
    expression, the counts one partial-agg shuffle, the join broadcastable
    (spine is tiny relative to events at any scale)."""
    e = load(spark, sf_dir, "events")
    per_hour = (e.groupBy(F.date_trunc("hour", "ts").alias("h"))
                .agg(F.count("*").alias("n")))
    bounds = e.agg(F.date_trunc("hour", F.min("ts")).alias("lo"),
                   F.date_trunc("hour", F.max("ts")).alias("hi"))
    spine = bounds.select(F.explode(F.sequence(
        "lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h"))
    return (spine.join(per_hour, "h", "left")
            .select("h", F.coalesce("n", F.lit(0)).alias("n_events")))


ORACLE_SQL["q_events_gap_fill"] = """
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events
), spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
), per_hour AS (
  SELECT date_trunc('hour', ts) AS h, count(*) AS n FROM events GROUP BY 1
)
SELECT spine.h, COALESCE(per_hour.n, 0) AS n_events
FROM spine LEFT JOIN per_hour ON spine.h = per_hour.h
"""


# ---------------------------------------------------------------------------
# Schema-ful JSON parsing (from_json → typed struct)
# ---------------------------------------------------------------------------

@_q("q_from_json_struct")
def q_from_json_struct(spark, sf_dir):
    """``from_json`` with an explicit schema — the typed counterpart of
    ``get_json_object`` path extraction (q_json_extract): malformed rows
    become NULL struct fields instead of silently propagating strings."""
    e = load(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return (
        e.select("event_id", parsed.getField("k").alias("k"))
        .groupBy()
        .agg(F.count("*").alias("n_rows"),
             F.count("k").alias("n_parsed"),
             F.sum("k").alias("sum_k"),
             F.min("k").alias("min_k"),
             F.max("k").alias("max_k"))
    )


ORACLE_SQL["q_from_json_struct"] = """
SELECT count(*) AS n_rows,
       count(CAST(json_extract_string(props, '$.k') AS INT)) AS n_parsed,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
FROM events
"""


# ---------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM)
# ---------------------------------------------------------------------------

@_q("q_null_safe_join")
def q_null_safe_join(spark, sf_dir):
    """Join on ``eqNullSafe`` (<=>): NULL keys match each other — the
    semantic corner where plain equality silently drops rows.  Keys are
    nation keys with a planted NULL class (key % 5 == 0 → NULL) on both
    sides, so the null-bucket join product is part of the answer."""
    n = load(spark, sf_dir, "nation")
    a = n.select(F.when(F.col("n_nationkey") % 5 == 0, None)
                  .otherwise(F.col("n_nationkey")).alias("k"),
                 F.col("n_name").alias("name_a"))
    b = n.select(F.when(F.col("n_nationkey") % 5 == 0, None)
                  .otherwise(F.col("n_nationkey")).alias("k"),
                 F.col("n_regionkey").alias("region_b"))
    j = a.join(b, a["k"].eqNullSafe(b["k"]))
    return (j.groupBy(a["k"].alias("k"))
            .agg(F.count("*").alias("n_matches"),
                 F.sum("region_b").alias("sum_region"))
    )


ORACLE_SQL["q_null_safe_join"] = """
WITH a AS (
  SELECT CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey END AS k,
         n_name AS name_a
  FROM nation
), b AS (
  SELECT CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey END AS k,
         n_regionkey AS region_b
  FROM nation
)
SELECT a.k AS k, count(*) AS n_matches,
       CAST(sum(b.region_b) AS BIGINT) AS sum_region
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
GROUP BY a.k
"""


# ---------------------------------------------------------------------------
# Math scalar surface
# ---------------------------------------------------------------------------

@_q("q_math_functions")
def q_math_functions(spark, sf_dir):
    """Math scalar coverage (log/exp/sqrt/pow/abs/sign/ceil/floor/mod) over
    order totals — rounded identically on both sides so FP differences stay
    below the hash granularity."""
    o = load(spark, sf_dir, "orders")
    x = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(F.log(x), 6).alias("ln_x"),
        F.round(F.log10(x), 6).alias("log10_x"),
        F.round(F.sqrt(x), 6).alias("sqrt_x"),
        F.round(F.pow(x / 100000.0, 2), 6).alias("pow_x"),
        F.abs(-x).alias("abs_x"),
        F.signum(x - 150000).cast("int").alias("sign_x"),
        F.ceil(x).cast("long").alias("ceil_x"),
        F.floor(x).cast("long").alias("floor_x"),
        F.round(F.pmod(x, F.lit(97.0)), 6).alias("mod_x"),
    )


ORACLE_SQL["q_math_functions"] = """
SELECT o_orderkey,
       round(ln(o_totalprice), 6) AS ln_x,
       round(log10(o_totalprice), 6) AS log10_x,
       round(sqrt(o_totalprice), 6) AS sqrt_x,
       round(pow(o_totalprice / 100000.0, 2), 6) AS pow_x,
       abs(-o_totalprice) AS abs_x,
       CAST(sign(o_totalprice - 150000) AS INT) AS sign_x,
       CAST(ceil(o_totalprice) AS BIGINT) AS ceil_x,
       CAST(floor(o_totalprice) AS BIGINT) AS floor_x,
       round(fmod(fmod(o_totalprice, 97.0) + 97.0, 97.0), 6) AS mod_x
FROM orders
"""


@_q("q_series_interpolate")
def q_series_interpolate(spark, sf_dir):
    """Time-series gap REPAIR, one step past ``q_events_gap_fill``'s
    zero-fill: per event_type daily means on a full day spine, with gaps
    LINEARLY interpolated between the surrounding known points, LOCF after
    the last known point, backfill before the first — the standard sensor/
    finance resample-and-interpolate operator.

    Cross-engine determinism: known points quantize through the shared
    IEEE path ``floor(x * 1e4 + 0.5) / 1e4`` (``round(avg, 4)`` diverged
    at an exact decimal half at sf0.1 — Spark BigDecimal HALF_UP vs
    DuckDB binary rounding, the same failure the r6 cross-SF sweep first
    caught in EWMA); the interpolation is row-local IEEE arithmetic on
    staged prev/next scalars (no reassociation possible), quantized the
    same way at 1e6.  Scale shape: one partial-agg shuffle for the daily means,
    a generated spine broadcast against the series keys, and two
    IGNORE-NULLS window passes (forward + backward) partitioned per series
    — each series' window is its own partition, no global sort."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase")  # sparse series -> real gaps
    daily = (e.groupBy((F.col("user_id") % 20).alias("k"),
                       F.to_date("ts").alias("d"))
             .agg((F.floor(F.avg("value") * 1e4 + 0.5) / 1e4)
                  .alias("v")))
    bounds = e.agg(F.to_date(F.min("ts")).alias("lo"),
                   F.to_date(F.max("ts")).alias("hi"))  # purchase range
    spine = (daily.select("k").distinct()
             .crossJoin(F.broadcast(bounds))
             .select("k", F.explode(F.sequence(
                 "lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d")))
    g = spine.join(daily, ["k", "d"], "left")
    wf = (Window.partitionBy("k").orderBy("d")
          .rowsBetween(Window.unboundedPreceding, 0))
    wb = (Window.partitionBy("k").orderBy("d")
          .rowsBetween(0, Window.unboundedFollowing))
    prev_v = F.last("v", ignorenulls=True).over(wf)
    next_v = F.first("v", ignorenulls=True).over(wb)
    prev_d = F.last(F.when(F.col("v").isNotNull(), F.col("d")),
                    ignorenulls=True).over(wf)
    next_d = F.first(F.when(F.col("v").isNotNull(), F.col("d")),
                     ignorenulls=True).over(wb)
    span = F.datediff(next_d, prev_d)
    frac = F.datediff(F.col("d"), prev_d) / span
    filled = (F.when(F.col("v").isNotNull(), F.col("v"))
              .when(prev_v.isNotNull() & next_v.isNotNull(),
                    F.floor((prev_v + (next_v - prev_v) * frac)
                            * 1e6 + 0.5) / 1e6)
              .when(prev_v.isNotNull(), prev_v)
              .otherwise(next_v))
    kind = (F.when(F.col("v").isNotNull(), F.lit("known"))
            .when(prev_v.isNotNull() & next_v.isNotNull(), F.lit("interp"))
            .when(prev_v.isNotNull(), F.lit("locf"))
            .otherwise(F.lit("backfill")))
    return (g.select("k", "d", filled.alias("v_filled"),
                     kind.alias("fill_kind"))
            .orderBy("k", "d"))


ORACLE_SQL["q_series_interpolate"] = """
WITH p AS (
  SELECT * FROM events WHERE event_type = 'purchase'
), daily AS (
  SELECT user_id % 20 AS k, CAST(ts AS DATE) AS d,
         floor(avg(value) * 1e4 + 0.5) / 1e4 AS v
  FROM p GROUP BY 1, 2
), bounds AS (
  SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi FROM p
), spine AS (
  SELECT k, CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                        CAST(hi AS TIMESTAMP),
                                        INTERVAL 1 DAY)) AS DATE) AS d
  FROM (SELECT DISTINCT k FROM daily), bounds
), g AS (
  SELECT spine.k, spine.d, daily.v FROM spine
  LEFT JOIN daily ON daily.k = spine.k AND daily.d = spine.d
), staged AS (
  SELECT k, d, v,
         last_value(v IGNORE NULLS) OVER fwd AS prev_v,
         first_value(v IGNORE NULLS) OVER bwd AS next_v,
         last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
           OVER fwd AS prev_d,
         first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
           OVER bwd AS next_d
  FROM g
  WINDOW fwd AS (PARTITION BY k ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         bwd AS (PARTITION BY k ORDER BY d
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT k, d,
       CASE WHEN v IS NOT NULL THEN v
            WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
              floor((prev_v + (next_v - prev_v)
                     * (datediff('day', prev_d, d)
                        / datediff('day', prev_d, next_d)))
                    * 1e6 + 0.5) / 1e6
            WHEN prev_v IS NOT NULL THEN prev_v
            ELSE next_v END AS v_filled,
       CASE WHEN v IS NOT NULL THEN 'known'
            WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN 'interp'
            WHEN prev_v IS NOT NULL THEN 'locf'
            ELSE 'backfill' END AS fill_kind
FROM staged
ORDER BY k, d
"""


@_q("q_ewma_smoothing")
def q_ewma_smoothing(spark, sf_dir):
    """Exponentially-weighted moving average (alpha=0.3) over each event
    type's daily mean — the monitoring/finance smoother whose recurrence
    ``ewma_t = a*x_t + (1-a)*ewma_{t-1}`` no associative aggregate
    expresses.  Spark evaluates it as an IN-ROW sequential fold
    (``F.aggregate`` over the sorted prefix slice — multiplications and
    additions only, in a defined order, so results are bit-identical to
    the oracle's recursive-CTE replay of the same recurrence; no pow(),
    whose last-ulp behavior differs across libm implementations).

    Scale shape: one partial-agg shuffle for daily means, one per-key
    collect (series length = days, bounded), then O(len^2) in-row
    arithmetic per series — at 100 TB the per-key series stays small
    (windowed retention) while keys distribute.

    Rounding discipline (sf0.001 regression): ``round(avg, 4)`` diverged
    at an exact decimal half (38.37875 -> Spark HALF_UP 38.3788, DuckDB
    binary-round 38.3787).  Quantization is therefore
    ``floor(x * 1e4 + 0.5) / 1e4`` — one shared IEEE multiply+floor path,
    no engine-specific decimal rendering — and the output is emitted as
    LONG fixed-point for the same reason."""
    e = load(spark, sf_dir, "events")
    # all-NULL days are dropped on BOTH sides ("skip missing" EWMA
    # semantics): left in, the NULL seed and a NULL data point would be
    # indistinguishable to the fold and the engines would diverge
    daily = (e.groupBy(F.col("event_type").alias("k"),
                       F.to_date("ts").alias("d"))
             .agg((F.floor(F.avg("value") * 1e4 + 0.5) / 1e4).alias("v"))
             .filter(F.col("v").isNotNull()))
    # arr selected ALONGSIDE the generator — a posexplode-then-self-join
    # would recompute the aggregation and add a join for nothing
    ex = (daily.groupBy("k")
          .agg(F.array_sort(F.collect_list(F.struct("d", "v")))
               .alias("arr"))
          .select("k", "arr", F.posexplode("arr").alias("t", "el")))
    prefix = F.slice("arr", 1, F.col("t") + 1)
    fold = F.aggregate(
        prefix, F.lit(None).cast("double"),
        lambda acc, s: F.when(acc.isNull(), s["v"])
                        .otherwise(0.3 * s["v"] + 0.7 * acc))
    return (ex.select("k", F.col("el.d").alias("d"),
                      F.col("el.v").alias("v"),
                      F.floor(fold * 1e6 + 0.5).cast("long")
                      .alias("ewma_fp"))
            .orderBy("k", "d"))


ORACLE_SQL["q_ewma_smoothing"] = """
WITH RECURSIVE daily AS (
  SELECT k, d, v, row_number() OVER (PARTITION BY k ORDER BY d) AS rn
  FROM (
    SELECT event_type AS k, CAST(ts AS DATE) AS d,
           floor(avg(value) * 1e4 + 0.5) / 1e4 AS v
    FROM events GROUP BY 1, 2
  ) WHERE v IS NOT NULL  -- rn AFTER the filter: gaps would break rn+1
), ew AS (
  SELECT k, d, v, rn, v AS ewma FROM daily WHERE rn = 1
  UNION ALL
  SELECT dd.k, dd.d, dd.v, dd.rn, 0.3 * dd.v + 0.7 * ew.ewma
  FROM ew JOIN daily dd ON dd.k = ew.k AND dd.rn = ew.rn + 1
)
SELECT k, d, v, CAST(floor(ewma * 1e6 + 0.5) AS BIGINT) AS ewma_fp
FROM ew ORDER BY k, d
"""
