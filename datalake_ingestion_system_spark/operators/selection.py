"""Data selection for LLM training corpora: DSIR importance weights.

DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023, "Data Selection for Language Models via Importance Resampling")
— selects raw-corpus documents that look like a small TARGET domain by
importance weight under two hashed n-gram bag models:

    log w(doc) = sum over feature occurrences f in doc of
                 log p_target(bucket(f)) - log p_raw(bucket(f))

with unigram+bigram features hashed into ``n_buckets`` and
Laplace-smoothed bucket distributions.  The published method then
samples without replacement with Gumbel noise; the deterministic
top-k-by-weight variant implemented here is the paper's "top-k"
baseline, reproducible cross-engine (no RNG in the data path).

Spark-first shape (the reason this scales to 100 TB):

- features are built as ARRAY columns (cheap per-element concat in a
  ``transform`` lambda), then ``posexplode``d so the EXPENSIVE
  per-feature work — md5/xxhash64 bucketing — runs as a row projection
  under whole-stage codegen, never inside an interpreted lambda
  (measured 139s vs 4s on this repo's token pipelines);
- both bucket distributions are ONE partial-aggregated groupBy each
  over the exploded rows — word-count shape, map-side combined;
- the log-ratio table is ``n_buckets`` rows (256 by default): a
  BROADCAST join onto per-(doc, bucket) counts, so no shuffle is ever
  keyed by anything wider than (doc_id, bucket);
- the only full-corpus shuffle is the (doc_id, bucket) partial
  aggregate; top-k lands as TakeOrderedAndProject.

``verifiable=True`` switches the bucket hash to the portable md5 form
(``conv(substring(md5(g),1,15),16,10) % B``) that DuckDB reproduces
bit-for-bit — the repo's established cross-engine hash trick — so the
oracle gate can check bucketing, smoothing, weighting, and ranking
end-to-end.  Production default is xxhash64 (~1.7x cheaper per token,
same plan shape).  Weights are emitted as round-half-up MICRO units
(``floor(w * 1e6 + 0.5)`` as BIGINT — the shared-IEEE-path rounding
this repo uses everywhere floats cross engines), and the top-k order
ties break on doc_id, so the selection is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_col(g, n_buckets: int, verifiable: bool):
    if verifiable:
        h = F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
    else:
        h = F.xxhash64(g)
    return F.pmod(h, F.lit(n_buckets))


def dsir_weights(docs: DataFrame, id_col: str, text_col: str,
                 is_target, n_buckets: int = 256,
                 verifiable: bool = False) -> DataFrame:
    """Per-candidate DSIR log importance weight in micro units.

    ``is_target`` is a boolean Column: True rows define the target
    distribution, False rows are the candidate pool being scored (the
    paper's raw corpus; scoring the target against itself would be
    circular, so target rows get no weight row).  Returns
    ``(id_col, w_micro)`` — BIGINT micro-log-weight, higher = more
    target-like.  Smoothing is Laplace (+1 per bucket), so buckets
    unseen in either corpus contribute a finite, symmetric prior.
    """
    base = docs.select(
        F.col(id_col), is_target.alias("_is_target"),
        F.regexp_extract_all(F.lower(F.col(text_col)),
                             F.lit(r"\w+"), 0).alias("ws"))
    # unigrams ++ bigrams as one array; the lambda does only cheap
    # concat — hashing happens post-explode under codegen
    feats = base.select(
        id_col, "_is_target",
        F.concat(
            F.col("ws"),
            # sequence(1, n) DESCENDS when n < 1 (sequence(1,0) is
            # [1, 0]), so a sub-2-token doc must short-circuit to an
            # empty bigram list or element_at walks off the array
            F.expr("CASE WHEN size(ws) >= 2 THEN"
                   " transform(sequence(1, size(ws) - 1),"
                   " i -> concat(element_at(ws, i), ' ',"
                   " element_at(ws, i + 1)))"
                   " ELSE array() END")
        ).alias("fs")).filter(F.size("fs") > 0)
    rows = feats.select(
        id_col, "_is_target",
        F.posexplode("fs").alias("_pos", "g"))
    rows = rows.select(
        id_col, "_is_target",
        _bucket_col(F.col("g"), n_buckets, verifiable).alias("b"))

    spine = (docs.sparkSession.range(n_buckets)
             .select(F.col("id").alias("b")))
    t_counts = (rows.filter("_is_target").groupBy("b")
                .agg(F.count("*").alias("ct")))
    r_counts = (rows.filter("NOT _is_target").groupBy("b")
                .agg(F.count("*").alias("cr")))
    # totals are 1-row aggregates; the ratio table is n_buckets rows —
    # broadcast-sized by construction
    ratio = (spine
             .join(t_counts, "b", "left")
             .join(r_counts, "b", "left")
             .crossJoin(F.broadcast(
                 rows.agg(
                     F.sum(F.col("_is_target").cast("long"))
                     .alias("tt"),
                     F.sum((~F.col("_is_target")).cast("long"))
                     .alias("tr"))))
             .select(
                 "b",
                 (F.log((F.coalesce("ct", F.lit(0)) + 1.0)
                        / (F.col("tt") + float(n_buckets)))
                  - F.log((F.coalesce("cr", F.lit(0)) + 1.0)
                          / (F.col("tr") + float(n_buckets))))
                 .alias("r")))
    doc_buckets = (rows.filter("NOT _is_target")
                   .groupBy(id_col, "b")
                   .agg(F.count("*").alias("c")))
    return (doc_buckets.join(F.broadcast(ratio), "b")
            .groupBy(id_col)
            .agg(F.floor(F.sum(F.col("c") * F.col("r")) * 1e6 + 0.5)
                 .cast("long").alias("w_micro")))


def _hashed_features(docs: DataFrame, id_col: str, text_col: str,
                     n_buckets: int, verifiable: bool,
                     extra_cols: tuple = ()) -> DataFrame:
    """Per-(doc, bucket) occurrence counts of the hashed
    unigram+bigram featurization — the same feature definition
    ``dsir_weights`` builds inline, factored for the classifier tier so
    trained weights and scoring agree on what a feature is.  Cheap
    concat inside the ``transform`` lambda; the md5/xxhash64 bucketing
    runs post-explode as a codegen row projection (the 139s-vs-4s
    lesson)."""
    base = docs.select(
        F.col(id_col), *[F.col(c) for c in extra_cols],
        F.regexp_extract_all(F.lower(F.col(text_col)),
                             F.lit(r"\w+"), 0).alias("ws"))
    feats = base.select(
        id_col, *extra_cols,
        F.concat(
            F.col("ws"),
            # sequence(1, n) DESCENDS when n < 1 (sequence(1,0) is
            # [1, 0]), so a sub-2-token doc must short-circuit to an
            # empty bigram list or element_at walks off the array
            F.expr("CASE WHEN size(ws) >= 2 THEN"
                   " transform(sequence(1, size(ws) - 1),"
                   " i -> concat(element_at(ws, i), ' ',"
                   " element_at(ws, i + 1)))"
                   " ELSE array() END")
        ).alias("fs")).filter(F.size("fs") > 0)
    rows = feats.select(
        id_col, *extra_cols, F.posexplode("fs").alias("_pos", "g"))
    rows = rows.select(
        id_col, *extra_cols,
        _bucket_col(F.col("g"), n_buckets, verifiable).alias("b"))
    return (rows.groupBy(id_col, *extra_cols, "b")
            .agg(F.count(F.lit(1)).alias("c")))


def classifier_score(docs: DataFrame, id_col: str, text_col: str,
                     weights: DataFrame, bias_micro: int = 0,
                     n_buckets: int = 1024,
                     verifiable: bool = False) -> DataFrame:
    """Quality-classifier INFERENCE at scan speed (round 11 — the
    curation stage fasttext/logistic quality filters fill in published
    pipelines, e.g. the GPT-3/LLaMA CommonCrawl quality classifiers):
    a hashed-feature LINEAR model scored entirely in fixed-point
    integer arithmetic, so the verdict is bit-reproducible cross-engine
    (the same verifiable-mode discipline as DSIR — md5 buckets, micro
    units, no float accumulation order dependence).

        logit_micro(doc) = bias_micro
                         + sum_buckets count(doc, b) * w_micro(b)

    ``weights`` is the model: a ``(b, w_micro)`` DataFrame (BIGINT
    micro units, one row per non-zero bucket) — n_buckets rows at most,
    broadcast by construction; train it anywhere (a DSIR ratio table,
    an externally fit logistic regression quantized to micro units, a
    seed-word heuristic).  Returns ``(id_col, logit_micro)`` with one
    row per input doc — docs with NO features (empty text) score
    exactly ``bias_micro``, never drop.

    Scale shape: featurization is the DSIR explode (codegen row
    projection), the per-(doc,bucket) count is one partial-aggregated
    word-count-shaped shuffle, the model join is a BROADCAST hash join,
    and the final per-doc sum re-uses the (doc) key — nothing in the
    plan is keyed wider than (doc_id, bucket).  A 100 TB corpus scores
    in one pass with map-side combine absorbing hot buckets."""
    counts = _hashed_features(docs, id_col, text_col, n_buckets,
                              verifiable)
    scored = (counts.join(F.broadcast(weights), "b")
              .groupBy(id_col)
              .agg(F.sum(F.col("c") * F.col("w_micro"))
                   .alias("_dot")))
    return (docs.select(id_col).distinct()
            .join(scored, id_col, "left")
            .select(F.col(id_col),
                    (F.coalesce(F.col("_dot"), F.lit(0))
                     + F.lit(int(bias_micro)).cast("long"))
                    .cast("long").alias("logit_micro")))


def seed_word_weights(spark, good_words, bad_words,
                      w_micro: int = 1_000_000, n_buckets: int = 1024,
                      verifiable: bool = False) -> DataFrame:
    """A deterministic seed-wordlist model for ``classifier_score``:
    +w for buckets of ``good_words``, -w for ``bad_words`` (collisions
    resolve by summing, exactly how the score would see them).  The
    zero-training baseline quality classifiers bootstrap from — and a
    fixture the oracle gate can rebuild verbatim in SQL."""
    rows = ([(w, int(w_micro)) for w in good_words]
            + [(w, -int(w_micro)) for w in bad_words])
    from ..localrel import local_df
    vocab = local_df(spark, rows, "g string, w long")
    return (vocab.select(
        _bucket_col(F.col("g"), n_buckets, verifiable).alias("b"),
        F.col("w"))
        .groupBy("b").agg(F.sum("w").alias("w_micro")))


def mixture_quotas(counts: dict, total: int,
                   temperature: float = 0.5) -> dict:
    """Per-source document quotas for a TEMPERATURE-WEIGHTED mixture
    (the GPT-3/LLaMA source-mixing rule: sample source s proportional
    to ``n_s^T`` — T < 1 up-weights small high-quality sources against
    bulk web crawl), computed entirely in INTEGER arithmetic so any
    engine reproduces them bit-for-bit:

    - weights: ``w_s = floor(n_s^T * 1e6 + 0.5)`` micro units (T = 1
      and T = 0.5 use exact/correctly-rounded paths — identity and
      IEEE sqrt — so Python and SQL agree; other exponents go through
      pow, fine for production, not for an oracle);
    - quotas: integer largest-remainder apportionment of ``total``
      (base = total*w // W, +1 by remainder desc then source asc);
    - a source whose quota exceeds its size is CLAMPED and the freed
      slots re-apportion among sources with headroom (deterministic
      loop, terminates — each pass fixes at least one source).
    """
    import math
    if total < 0:
        raise ValueError("total must be >= 0")
    if temperature == 1.0:
        w = {s: int(n) * 1_000_000 for s, n in counts.items()}
    elif temperature == 0.5:
        w = {s: int(math.floor(math.sqrt(n) * 1e6 + 0.5))
             for s, n in counts.items()}
    else:
        w = {s: int(math.floor(n ** float(temperature) * 1e6 + 0.5))
             for s, n in counts.items()}
    w = {s: v for s, v in w.items() if v > 0}
    quota = {s: 0 for s in counts}
    need, open_s = total, sorted(w)
    while need > 0 and open_s:
        ww = sum(w[s] for s in open_s)
        base = {s: need * w[s] // ww for s in open_s}
        rem = {s: need * w[s] % ww for s in open_s}
        extra = need - sum(base.values())
        for s in sorted(open_s, key=lambda x: (-rem[x], x))[:extra]:
            base[s] += 1
        clamped = False
        for s in open_s:
            give = min(base[s], counts[s] - quota[s])
            quota[s] += give
            if give < base[s]:
                clamped = True
        need = total - sum(quota.values())
        open_s = [s for s in open_s if quota[s] < counts[s]]
        if not clamped and need > 0:  # pragma: no cover - safety
            break
    return quota


def mixture_sample(docs: DataFrame, id_col: str, source_col: str,
                   total: int, temperature: float = 0.5,
                   n_split: int = 1024,
                   verifiable: bool = False) -> DataFrame:
    """Deterministic temperature-weighted MIXTURE SAMPLING across
    sources — the data-mixing stage between curation and packing (the
    published pipelines' per-source sampling weights, made exact and
    reproducible): each source contributes its ``mixture_quotas`` share,
    and WITHIN a source the selected rows are the quota-smallest by a
    uniform hash of the id (``verifiable=True`` = the portable md5
    form an oracle replays; production xxhash64) — no RNG, same
    selection on every run and every engine.

    SKEW-SAFE EXACT SELECTION (the scale shape): the naive top-quota
    per source is a ``row_number`` window over ``partitionBy(source)``
    — a bulk-crawl source holding half the corpus lands on ONE task
    (the same hot-key hazard the substring-dedup keeper had).  Instead
    each row gets a hash-derived SPLIT BUCKET (``pmod(h, n_split)``,
    part of the selection order (bucket, h, id)); per-(source, bucket)
    counts collect at source-cardinality x n_split driver rows, the
    driver finds each source's boundary bucket, rows in buckets BELOW
    it are selected by a plain filter (no window), and only the ONE
    boundary bucket per source — about ``n_s / n_split`` rows — pays a
    window.  Exact at any skew.

    Returns ``(id_col, source_col)`` of the selected docs."""
    if verifiable:
        hx = F.conv(F.substring(F.md5(F.col(id_col).cast("string")),
                                1, 15), 16, 10).cast("long")
    else:
        hx = F.xxhash64(F.col(id_col).cast("string"))
    base = docs.select(F.col(id_col), F.col(source_col),
                       hx.alias("_h"),
                       F.pmod(hx, F.lit(n_split)).alias("_b"))
    counts = {r[0]: r[1] for r in
              docs.groupBy(source_col)
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    quota = mixture_quotas(counts, total, temperature)
    # per-(source, bucket) histogram: source-cardinality x n_split
    # driver rows — mixture sources are dozens, never data-scale
    hist = {(r[0], r[1]): r[2] for r in
            base.groupBy(source_col, "_b")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    below: dict = {}      # source -> boundary bucket
    need_at: dict = {}    # source -> rows still needed IN the boundary
    for s, q in quota.items():
        run = 0
        boundary = n_split  # quota == n_s: every bucket selects whole
        for b in range(n_split):
            n_b = hist.get((s, b), 0)
            if run + n_b >= q:
                boundary = b
                need_at[s] = q - run
                break
            run += n_b
        below[s] = boundary
    spark = docs.sparkSession
    from pyspark.sql.types import (IntegerType, LongType, StructField,
                                   StructType)
    from ..localrel import local_df
    bounds = local_df(
        spark,
        [(s, below[s], need_at.get(s, 0)) for s in quota],
        StructType([docs.schema[source_col],
                    StructField("_bb", IntegerType()),
                    StructField("_need", LongType())]))
    tagged = base.join(F.broadcast(bounds), source_col)
    whole = tagged.filter(F.col("_b") < F.col("_bb"))
    from pyspark.sql import Window
    boundary_rows = (
        tagged.filter((F.col("_b") == F.col("_bb"))
                      & (F.col("_need") > 0))
        .withColumn("_rn", F.row_number().over(
            Window.partitionBy(source_col).orderBy("_h", id_col)))
        .filter(F.col("_rn") <= F.col("_need")))
    return (whole.select(id_col, source_col)
            .unionByName(boundary_rows.select(id_col, source_col)))


def dsir_topk(docs: DataFrame, id_col: str, text_col: str,
              is_target, k: int = 200, n_buckets: int = 256,
              verifiable: bool = False) -> DataFrame:
    """The deterministic top-k DSIR selection: the ``k`` most
    target-like candidates by micro-weight, doc-id tie-broken —
    plans as TakeOrderedAndProject (no global sort materialization)."""
    w = dsir_weights(docs, id_col, text_col, is_target,
                     n_buckets=n_buckets, verifiable=verifiable)
    return (w.orderBy(F.desc("w_micro"), F.col(id_col)).limit(k))
