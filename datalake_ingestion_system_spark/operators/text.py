"""Text analysis operators: language ID, quality scoring, token stats.

Deterministic heuristics built from regexp/length expressions only, so the
documents scan stays in whole-stage codegen and the same column definitions
can be mirrored exactly in ANSI SQL for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textfns import token_count, tokens

#: Tiny per-language stopword marker sets (heuristic language ID).
STOPWORDS = {
    "en": ("the", "and", "a"),
    "es": ("el", "la", "los"),
    "fr": ("le", "la", "les"),
    "de": ("der", "die", "das"),
}


def _count_words(text: Column, words: tuple[str, ...]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 0))


def lang_id(text: Column | str) -> Column:
    """Stopword-vote language guess; 'und' (undetermined) when no marker hits.

    Ties break by fixed language order — mirrored exactly in the SQL oracle.
    """
    text = F.col(text) if isinstance(text, str) else text
    counts = {lang: _count_words(text, ws) for lang, ws in STOPWORDS.items()}
    best = F.greatest(*counts.values())
    expr = F.lit("und")
    # reversed: earlier languages win ties via later WHEN overwrite order
    for lang in reversed(list(STOPWORDS)):
        expr = F.when((counts[lang] > 0) & (counts[lang] == best), lang).otherwise(expr)
    return expr


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality features: char/word counts, punctuation/digit/
    space ratios, mean word length — the usual pre-training filters."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_words = token_count(t).cast("long")
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[.,;:!?]"), 0))
    n_digit = F.size(F.regexp_extract_all(t, F.lit(r"[0-9]"), 0))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        F.round(n_digit / F.greatest(n_chars, F.lit(1)), 4).alias("digit_ratio"),
        F.round((n_chars - F.length(F.regexp_replace(t, r"\s", ""))) /
                F.greatest(n_chars, F.lit(1)), 4).alias("space_ratio"),
        F.round(F.length(F.regexp_replace(t, r"\s", "")) /
                F.greatest(n_words, F.lit(1)), 4).alias("mean_word_len"),
    )


def repetition_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Repetition-based quality signals (the Gopher-rules shape): fraction
    of tokens covered by the single most frequent word and by the most
    frequent word bigram.  Boilerplate/spam scores high; clean prose low.

    All in-row array math over one scan — tokens → (bi)gram counts via a
    sort + linear run-length pass (``array_sort`` + ``aggregate``), no
    explode/shuffle, so the 100 TB corpus keeps one stage."""
    def _max_run(arr) -> "F.Column":
        # longest run of equal adjacent elements in a SORTED array ==
        # highest frequency of any element; single linear fold
        return F.aggregate(
            arr,
            F.struct(F.lit(None).cast("string").alias("prev"),
                     F.lit(0).alias("run"), F.lit(0).alias("best")),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
                F.greatest(acc.best,
                           F.when(x == acc.prev, acc.run + 1)
                            .otherwise(F.lit(1))).alias("best")),
            lambda acc: acc.best)

    # stage tokenization into its own projection: referencing the tokens
    # EXPRESSION inside the bigram lambda would re-run the regex per element
    # (see shingles_of docstring)
    ws = F.col("_ws0")
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_ws0")) \
             .select(
        F.col(id_col),
        F.array_sort(ws).alias("_w"),
        F.array_sort(
            F.when(F.size(ws) >= 2,
                   F.transform(F.sequence(F.lit(1), F.size(ws) - 1),
                               lambda i: F.concat_ws(
                                   " ", F.element_at(ws, i),
                                   F.element_at(ws, i + F.lit(1)))))
            .otherwise(F.array().cast("array<string>"))).alias("_b"))
    return base.select(
        F.col(id_col),
        F.round(_max_run("_w") / F.greatest(F.size("_w"), F.lit(1)), 4)
         .alias("top_word_ratio"),
        F.round(_max_run("_b") / F.greatest(F.size("_b"), F.lit(1)), 4)
         .alias("top_bigram_ratio"),
    )


def profile_table(df, columns=None):
    """Column profile in long format: per column, the row count, null count,
    exact distinct count, and min/max (rendered as strings so heterogeneous
    column types stack in one result).

    One pass for counts/nulls/min/max (single partial-agg) plus one
    count_distinct aggregate — Spark rewrites multi-column distinct
    aggregates into an expand + two-stage agg, still a constant number of
    shuffles regardless of table size.  The lake-operations counterpart of
    Glue crawler statistics (reference RUN_CRAWLER_JOB.PY delegates stats
    to the crawler; here it is a query).
    """
    from pyspark.sql import functions as F

    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_null_{c}"),
            F.countDistinct(c).alias(f"_nd_{c}"),
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs)
    parts = []
    for c in cols:
        parts.append(F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            F.col(f"_null_{c}").alias("n_nulls"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            F.col(f"_min_{c}").alias("min_val"),
            F.col(f"_max_{c}").alias("max_val")))
    return (row.select(F.explode(F.array(*parts)).alias("p"))
            .select("p.column", "p.n_rows", "p.n_nulls", "p.n_distinct",
                    "p.min_val", "p.max_val"))


def chunk_text(df: DataFrame, id_col: str, text_col: str,
               chunk_chars: int = 200, overlap: int = 50) -> DataFrame:
    """Split documents into fixed-size overlapping chunks — the context-window
    prep step (RAG indexing, long-doc training examples).

    Stride = ``chunk_chars - overlap``; chunk i covers
    ``[i*stride, i*stride + chunk_chars)`` and the last chunk starts at the
    last stride position that still adds new content.  Pure projection +
    in-row explode: no shuffle, chunk boundaries are deterministic character
    offsets (not token-aware — tokenize per chunk downstream), and at 100 TB
    the expansion factor is bounded by ~len/stride per doc.
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be < chunk_chars")
    stride = chunk_chars - overlap
    t = F.col(text_col)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.length(t) - F.lit(overlap)) / F.lit(stride)).cast("int"))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: t.substr(i * stride + 1, F.lit(chunk_chars)))
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk"))
        .select(id_col, "chunk_id", "chunk",
                F.length("chunk").alias("chunk_len"))
    )


def pack_bins(df: DataFrame, id_col: str, weight_col: Column | str,
              target_weight: int, part_col: str | None = None,
              allow_global: bool = False) -> DataFrame:
    """Boundary bin packing: assign items (docs) to consecutive bins of
    ~``target_weight`` total weight (token-budget batching for training
    shards / context packing).

    Items are laid out in ``id_col`` order (within ``part_col`` if given) and
    ``bin = floor(exclusive_cumulative_weight / target)`` — fixed-boundary
    packing: a bin may overflow by at most one item, never underfills by
    skipping, and the assignment is a single window cumsum (one shuffle),
    deterministic under any partitioning.  A greedy first-fit would pack
    marginally tighter but needs sequential state; at corpus scale the
    window form wins.

    ``part_col`` is required at scale: without it the cumsum runs over an
    unpartitioned window — every row through ONE task, a non-starter beyond
    small data.  Pass ``allow_global=True`` to opt into the single-task
    global form deliberately (small inputs only).
    """
    from pyspark.sql import Window
    if part_col is None and not allow_global:
        raise ValueError(
            "pack_bins without part_col runs a global single-task window; "
            "pass part_col (preferred) or allow_global=True for small data")
    w = (Window.partitionBy(*( [part_col] if part_col else [] ))
         .orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    wc = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    cum_excl = F.coalesce(F.sum(wc).over(w), F.lit(0))
    cols = ([F.col(part_col)] if part_col else []) + [
        F.col(id_col), wc.alias("weight"),
        F.floor(cum_excl / target_weight).cast("int").alias("bin")]
    return df.select(*cols)


def pack_bins_prefix(df: DataFrame, id_col: str, weight_col: Column | str,
                     target_weight: int, part_col: str | None = None,
                     num_buckets: int | None = None,
                     max_offset_rows: int = 200_000) -> DataFrame:
    """``pack_bins`` semantics via a DISTRIBUTED two-level prefix sum —
    identical output (``bin = floor(exclusive_cumsum / target)`` in
    ``id_col`` order, within ``part_col`` if given), but no
    single-task-per-group window, so it scales to few-huge-sources
    corpora AND to fully global packing (no ``part_col`` needed).

    Classic parallel scan, expressed in DataFrame ops:

    1. range-partition rows by ``(part_col, id_col)`` into ``num_buckets``
       ordered buckets (``repartitionByRange``; bucket id =
       ``spark_partition_id()`` — range order makes bucket ids monotone
       in the pack order);
    2. one partial-agg pass computes per-(part, bucket) weight totals —
       at most ``num_buckets × distinct(part_col)`` rows — collected to
       the driver where the exclusive per-part running offset across
       buckets is a trivial scan.  NOTE (ADVICE r7): that bound is
       DATA-dependent through ``part_col``'s cardinality, not
       config-scale — this operator assumes a LOW-cardinality pack
       grouping (source, language, shard family).  ``max_offset_rows``
       (default 200k ≈ tens of MB of driver rows) guards the
       assumption: a high-cardinality ``part_col`` (e.g. per-document)
       raises with guidance instead of silently OOMing the driver —
       use the window form ``pack_bins`` there, where each tiny group
       is its own window partition anyway;
    3. offsets broadcast-join back; a window cumsum PARTITIONED BY
       (part, bucket) — every window partition is ~1/num_buckets of the
       data, all buckets in parallel — plus the bucket offset gives the
       exact global exclusive cumsum.

    Exactness does not depend on where the range boundaries fall, so the
    sampled boundaries need only be CONSISTENT between the totals pass
    and the final pass: the bucketed projection is pinned once with
    ``localCheckpoint`` (it is the skinny ``(part, id, weight)`` triple —
    a fraction of a percent of the corpus bytes) because
    ``repartitionByRange``'s boundary sampling is seeded per RDD id and
    would otherwise re-sample differently on recompute.  localCheckpoint
    (not ``persist``) so the blocks are GC-reclaimed with the returned
    DataFrame instead of living in the CacheManager forever.

    NULL handling matches ``pack_bins``: a NULL ``part_col`` value is its
    own pack group (the offset join is null-safe) and NULL weights
    contribute nothing to the cumsum; NULL ``id_col`` values sort first,
    as in the window form.
    """
    from pyspark.sql import Window
    from pyspark.sql import types as T

    spark = df.sparkSession
    wc = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    pcols = [part_col] if part_col else []
    n = int(num_buckets
            or spark.conf.get("spark.sql.shuffle.partitions", "200"))
    staged = df.select(*[F.col(c) for c in pcols],
                       F.col(id_col), wc.alias("weight"))
    ranged = (staged
              .repartitionByRange(n, *[F.col(c) for c in pcols + [id_col]])
              .withColumn("_bkt", F.spark_partition_id())
              .localCheckpoint(eager=True))
    keys = pcols + ["_bkt"]
    # limit(bound + 1) bounds the DRIVER transfer itself: if the
    # aggregation exceeds the cap we see exactly one extra row and raise
    # before materializing an unbounded result driver-side
    totals = (ranged.groupBy(*[F.col(k) for k in keys])
              .agg(F.sum("weight").alias("_w"))
              .limit(max_offset_rows + 1)
              .collect())
    if len(totals) > max_offset_rows:
        raise ValueError(
            f"pack_bins_prefix: over {max_offset_rows} (part, bucket) "
            "offset rows — part_col cardinality is data-scale, not "
            "config-scale, and the driver-side prefix would not be "
            "safe.  Use pack_bins (window form) for high-cardinality "
            "pack groups, pick a coarser part_col, or raise "
            "max_offset_rows deliberately.")
    # Driver-side exclusive prefix across range-ordered buckets, per part.
    # Bucket ids are globally monotone in (part, id) order, so ascending
    # _bkt within each part IS the pack order.
    acc: dict = {}
    off_rows = []
    for r in sorted(totals, key=lambda r: r["_bkt"]):
        pkey = r[part_col] if part_col else None
        off_rows.append(tuple(([r[part_col]] if part_col else [])
                              + [r["_bkt"], acc.get(pkey, 0)]))
        # an all-NULL-weight bucket sums to NULL — contributes nothing
        acc[pkey] = acc.get(pkey, 0) + int(r["_w"] or 0)
    off_fields = ([staged.schema[part_col]] if part_col else []) + [
        T.StructField("_bkt", T.IntegerType(), False),
        T.StructField("_off", T.LongType(), False)]
    from ..localrel import local_df
    off = local_df(spark, off_rows, T.StructType(off_fields))
    # qualified refs: the explicit join condition keeps BOTH sides' key
    # columns in scope, so bare names would be ambiguous here
    w = (Window.partitionBy(*[ranged[k] for k in keys])
         .orderBy(ranged[id_col])
         .rowsBetween(Window.unboundedPreceding, -1))
    local_excl = F.coalesce(F.sum(ranged["weight"]).over(w), F.lit(0))
    out = ([ranged[c] for c in pcols]
           + [ranged[id_col], ranged["weight"],
              F.floor((F.col("_off") + local_excl) / target_weight)
              .cast("int").alias("bin")])
    # null-safe on the part key: a NULL part value is a legitimate pack
    # group in the window form, so it must find its offset row too
    cond = ranged["_bkt"] == off["_bkt"]
    if part_col:
        cond = ranged[part_col].eqNullSafe(off[part_col]) & cond
    return ranged.join(F.broadcast(off), cond).select(*out)


def chunk_tokens(df: DataFrame, id_col: str, text_col: str,
                 chunk_tokens_n: int = 40, overlap: int = 10) -> DataFrame:
    """Token-boundary chunking: like ``chunk_text`` but chunks are slices of
    the whitespace-token array re-joined with single spaces, so no chunk
    ever cuts a word (the shape tokenizer-bound training prep wants).
    Stride = ``chunk_tokens_n - overlap``; same in-row explode scaling."""
    if overlap >= chunk_tokens_n:
        raise ValueError("overlap must be < chunk_tokens_n")
    stride = chunk_tokens_n - overlap
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size(toks) - F.lit(overlap)) / F.lit(stride)).cast("int"))
    staged = df.select(F.col(id_col), toks.alias("_tk"),
                       n_chunks.alias("_nc"))
    chunks = F.transform(
        F.sequence(F.lit(0), F.col("_nc") - 1),
        lambda i: F.concat_ws(" ", F.slice("_tk", i * stride + 1,
                                           chunk_tokens_n)))
    return (
        staged.select(F.col(id_col),
                      F.posexplode(chunks).alias("chunk_id", "chunk"))
        .select(id_col, "chunk_id", "chunk",
                F.size(F.split("chunk", " ")).alias("chunk_tokens"))
    )


#: PII patterns chosen from the RE2-compatible subset of Java regex so the
#: same pattern strings run verbatim in the DuckDB oracle.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"


def redact_pii(df: DataFrame, text_col: str) -> DataFrame:
    """PII scrub for training corpora: count and replace emails, phone
    numbers, and SSN-shaped ids with typed placeholders.

    All regexp work (three counts + three replaces on one column) runs in
    a single whole-stage-codegen projection over one scan — rule count
    scales the expression, not the pass count.  Adds ``n_emails``,
    ``n_phones``, ``n_ssns`` and ``<text_col>_redacted``."""
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "[EMAIL]"),
            PHONE_RE, "[PHONE]"),
        SSN_RE, "[SSN]")
    return df.withColumns({
        "n_emails": F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)),
        "n_phones": F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), 0)),
        "n_ssns": F.size(F.regexp_extract_all(t, F.lit(SSN_RE), 0)),
        f"{text_col}_redacted": redacted,
    })
