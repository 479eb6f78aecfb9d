"""Training-data pipeline queries: dedup, similarity, text analysis,
multimodal plumbing (SURVEY §2.10 / §7.6 — beyond-reference surface).

Oracle-checked wherever the semantics are SQL-expressible; hash-dependent
operators (Murmur3 MinHash/SimHash, hyperplane LSH) are rows-only by nature
and carry dedicated pytest coverage instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, spread
from ..functions.textfns import char_ngrams, token_count, tokens
from ..operators import dedup, multimodal, similarity, text
from ..session import tune
from .scratch import scratch_dir

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


#: Shared normalization used on both sides of every fingerprint oracle.
_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

@_q("q_dedup_exact")
def q_dedup_exact(spark, sf_dir):
    """Exact dedup: one hash-aggregate shuffle on the content fingerprint."""
    d = load(spark, sf_dir, "documents")
    return dedup.exact_dedup(d, "doc_id", "text")


ORACLE_SQL["q_dedup_exact"] = f"""
SELECT md5({_NORM_SQL}) AS fp,
       min(doc_id) AS keep_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
"""


@_q("q_doc_fingerprint")
def q_doc_fingerprint(spark, sf_dir):
    """Per-document canonical content fingerprint (md5 of normalized text)."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", dedup.fingerprint("text").alias("fp"))


ORACLE_SQL["q_doc_fingerprint"] = f"""
SELECT doc_id, md5({_NORM_SQL}) AS fp FROM documents
"""


@_q("q_minhash_lsh_pairs")
def q_minhash_lsh_pairs(spark, sf_dir):
    """MinHash-LSH near-dup candidate pipeline (signatures → bands → bucket
    join → exact Jaccard ≥ 0.5) in *verifiable* mode: md5 token hash +
    polynomial band hash, so the DuckDB oracle reproduces the ENTIRE
    pipeline — candidate generation included — bit-for-bit (candidate sets,
    not just verified pairs, must agree for the hashes to match).  Planted
    near-dup recovery asserted in tests/test_dedup.py."""
    d = load(spark, sf_dir, "documents")
    return dedup.minhash_near_dup_pairs(
        d, "doc_id", "text", num_hashes=32, bands=8, threshold=0.5,
        verifiable=True)


# Constant-for-constant mirror of the verifiable pipeline:
# token md5(60 bit) % p → rolling 3-shingle poly → 32-slot affine min-fold
# (a_i = 2i+1, b_i = i*98765431) → 8 bands × 4 slots, rolling poly bucket →
# bucket cap 500 → in-bucket pairs → exact word-3-shingle Jaccard ≥ 0.5.
ORACLE_SQL["q_minhash_lsh_pairs"] = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ws
  FROM documents
), th AS (
  SELECT doc_id, ws,
         [('0x' || substring(md5(t), 1, 15))::BIGINT % 2147483647
          for t in ws] AS th
  FROM toks
), sh AS (
  SELECT doc_id, ws,
         list_distinct([(th[CAST(i AS INTEGER)] * 1000003
                        + th[CAST(i AS INTEGER) + 1] * 8191
                        + th[CAST(i AS INTEGER) + 2] * 524287) % 2147483647
                        for i in range(1, len(th) - 1)]) AS hs
  FROM th WHERE len(th) >= 3
), sig AS (
  SELECT doc_id,
         [list_min([(h * (2 * i + 1) + i * 98765431) % 2147483647
                    for h in hs])
          for i in range(0, 32)] AS sig
  FROM sh WHERE len(hs) > 0
), banded AS (
  SELECT doc_id, b,
         ((((sig[CAST(b AS INTEGER) * 4 + 1] * 1000003
             + sig[CAST(b AS INTEGER) * 4 + 2]) % 2147483647) * 1000003
             + sig[CAST(b AS INTEGER) * 4 + 3]) % 2147483647 * 1000003
             + sig[CAST(b AS INTEGER) * 4 + 4]) % 2147483647 AS bh
  FROM sig CROSS JOIN (SELECT unnest(range(0, 8)) AS b)
  QUALIFY count(*) OVER (PARTITION BY b, bh) <= 500
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
  FROM banded a JOIN banded c ON a.b = c.b AND a.bh = c.bh
                             AND a.doc_id < c.doc_id
), ssets AS (
  SELECT doc_id,
         list_distinct([ws[CAST(i AS INTEGER)] || ' '
                        || ws[CAST(i AS INTEGER) + 1] || ' '
                        || ws[CAST(i AS INTEGER) + 2]
                        for i in range(1, len(ws) - 1)]) AS sh
  FROM toks
), scored AS (
  SELECT id_a, id_b,
         len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS n_inter,
         len(a.sh) + len(b.sh)
           - len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS n_union
  FROM cand JOIN ssets a ON cand.id_a = a.doc_id
            JOIN ssets b ON cand.id_b = b.doc_id
)
SELECT id_a, id_b,
       round(CAST(n_inter AS DOUBLE) / n_union, 4) AS jaccard
FROM scored
WHERE n_union > 0 AND round(CAST(n_inter AS DOUBLE) / n_union, 4) >= 0.5
"""


@_q("q_minhash_incremental")
def q_minhash_incremental(spark, sf_dir):
    """Incremental near-dup detection against a persistent SIGNATURE store
    (``operators.dedup.incremental_minhash_dedup``): even doc_ids are
    yesterday's accepted corpus (their signatures seeded into a
    TxnLogFormat store — the text is gone), odd doc_ids are today's
    batch.  Emitted pairs all touch the new batch; verification is the
    slot-agreement estimate (``n_agree``/32 ≥ 16/32), integer-exact.
    Verifiable mode (md5 + polynomial band hash) so the oracle replays
    signatures, bucket membership, the 500-cap, the no-old-old-pairs
    rule, and the estimate bit-for-bit.

    Scale shape: the store is banded then LEFT-SEMI pruned to buckets the
    batch touches before any aggregation — cost follows the batch, not
    the corpus; the store append is id-novel-only (crash-replay
    convergent)."""

    d = load(spark, sf_dir, "documents")
    path = scratch_dir(prefix="mh_inc_") + "/sigs"
    old = d.filter(F.col("doc_id") % 2 == 0)
    new = d.filter(F.col("doc_id") % 2 == 1)
    # batch 1 seeds the store (its old-old pairs are yesterday's output)
    dedup.incremental_minhash_dedup(old, path, verifiable=True)
    pairs, _stats = dedup.incremental_minhash_dedup(new, path,
                                                    verifiable=True)
    return pairs.select("id_a", "id_b", "n_agree", "est_jaccard")


# Mirror of the incremental run's SECOND batch: signatures over ALL docs
# (constants identical to q_minhash_lsh_pairs), full-union banding with
# the 500 cap (for any bucket holding an odd doc the populations agree),
# pairs sharing a bucket EXCEPT old-old (both even), slot-agreement >= 16.
ORACLE_SQL["q_minhash_incremental"] = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ws
  FROM documents
), th AS (
  SELECT doc_id,
         [('0x' || substring(md5(t), 1, 15))::BIGINT % 2147483647
          for t in ws] AS th
  FROM toks
), sh AS (
  SELECT doc_id,
         list_distinct([(th[CAST(i AS INTEGER)] * 1000003
                        + th[CAST(i AS INTEGER) + 1] * 8191
                        + th[CAST(i AS INTEGER) + 2] * 524287) % 2147483647
                        for i in range(1, len(th) - 1)]) AS hs
  FROM th WHERE len(th) >= 3
), sig AS (
  SELECT doc_id,
         [list_min([(h * (2 * i + 1) + i * 98765431) % 2147483647
                    for h in hs])
          for i in range(0, 32)] AS sig
  FROM sh WHERE len(hs) > 0
), banded AS (
  SELECT doc_id, b,
         ((((sig[CAST(b AS INTEGER) * 4 + 1] * 1000003
             + sig[CAST(b AS INTEGER) * 4 + 2]) % 2147483647) * 1000003
             + sig[CAST(b AS INTEGER) * 4 + 3]) % 2147483647 * 1000003
             + sig[CAST(b AS INTEGER) * 4 + 4]) % 2147483647 AS bh
  FROM sig CROSS JOIN (SELECT unnest(range(0, 8)) AS b)
  QUALIFY count(*) OVER (PARTITION BY b, bh) <= 500
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
  FROM banded a JOIN banded c ON a.b = c.b AND a.bh = c.bh
                             AND a.doc_id < c.doc_id
  WHERE NOT (a.doc_id % 2 = 0 AND c.doc_id % 2 = 0)
)
SELECT id_a, id_b,
       CAST(len(list_filter(range(1, 33),
                i -> sa.sig[CAST(i AS INTEGER)]
                     = sb.sig[CAST(i AS INTEGER)])) AS BIGINT) AS n_agree,
       len(list_filter(range(1, 33),
                i -> sa.sig[CAST(i AS INTEGER)]
                     = sb.sig[CAST(i AS INTEGER)])) / 32.0 AS est_jaccard
FROM cand JOIN sig sa ON cand.id_a = sa.doc_id
          JOIN sig sb ON cand.id_b = sb.doc_id
WHERE len(list_filter(range(1, 33),
          i -> sa.sig[CAST(i AS INTEGER)]
               = sb.sig[CAST(i AS INTEGER)])) >= 16
"""


@_q("q_simhash")
def q_simhash(spark, sf_dir):
    """32-bit SimHash signatures (sign-vote over token hashes), md5 token
    hash ⇒ every vote — and therefore every signature bit — reproduces in
    the DuckDB oracle."""
    d = load(spark, sf_dir, "documents")
    return dedup.simhash(d, "doc_id", "text", token_hash="md5")


ORACLE_SQL["q_simhash"] = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS t
  FROM documents
), h AS (
  SELECT doc_id, ('0x' || substring(md5(t), 1, 8))::BIGINT AS th FROM tok
), votes AS (
  SELECT doc_id, b,
         sum(CASE WHEN (th >> CAST(b AS INTEGER)) & 1 = 1
                  THEN 1 ELSE -1 END) AS v
  FROM h CROSS JOIN (SELECT unnest(range(0, 32)) AS b)
  GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(sum(CASE WHEN v > 0 THEN 1::BIGINT << CAST(b AS INTEGER)
                     ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
"""


@_q("q_word_jaccard_pairs")
def q_word_jaccard_pairs(spark, sf_dir):
    """Exact word-set Jaccard over a bounded candidate set (verify-stage
    shape; the n-gram variant runs inside the MinHash pipeline)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    sets = d.select("doc_id", F.array_distinct(tokens("text")).alias("ws"))
    a, b = sets.alias("a"), sets.alias("b")
    inter = F.size(F.array_intersect(F.col("a.ws"), F.col("b.ws"))).cast("long")
    union = F.size(F.array_union(F.col("a.ws"), F.col("b.ws"))).cast("long")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
                inter.alias("n_common"),
                F.round(inter / union, 4).alias("jaccard"))
    )


ORACLE_SQL["q_word_jaccard_pairs"] = """
WITH sets AS (
  SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '\\w+')) AS ws
  FROM documents WHERE doc_id < 30
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(list_filter(a.ws, x -> list_contains(b.ws, x))) AS BIGINT) AS n_common,
         CAST(len(a.ws) + len(b.ws) AS BIGINT) AS n_total
  FROM sets a JOIN sets b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, n_common,
       round(CAST(n_common AS DOUBLE) / (n_total - n_common), 4) AS jaccard
FROM pairs
"""


@_q("q_dedup_clusters")
def q_dedup_clusters(spark, sf_dir):
    """Duplicate-cluster resolution: connected components over the near-dup
    pair graph (word-Jaccard ≥ 0.8 on the bounded candidate set), each doc
    labeled with its cluster representative (smallest reachable doc_id) and
    whether it is the kept copy.  Iterative min-label propagation in Spark;
    the DuckDB oracle mirrors it with a recursive CTE."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    sets = d.select("doc_id", F.array_distinct(tokens("text")).alias("ws"))
    a, b = sets.alias("a"), sets.alias("b")
    inter = F.size(F.array_intersect(F.col("a.ws"), F.col("b.ws"))).cast("long")
    union = F.size(F.array_union(F.col("a.ws"), F.col("b.ws"))).cast("long")
    edges = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
                F.round(inter / union, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.8)
    )
    comp = dedup.connected_components(edges, d.select("doc_id"),
                                      id_col="doc_id")
    return comp.select(
        "doc_id", "component",
        (F.col("doc_id") == F.col("component")).alias("is_kept"))


ORACLE_SQL["q_dedup_clusters"] = """
WITH RECURSIVE sets AS (
  SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '\\w+')) AS ws
  FROM documents WHERE doc_id < 30
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(list_filter(a.ws, x -> list_contains(b.ws, x))) AS BIGINT) AS n_common,
         CAST(len(a.ws) + len(b.ws) AS BIGINT) AS n_total
  FROM sets a JOIN sets b ON a.doc_id < b.doc_id
), edges AS (
  SELECT id_a, id_b FROM pairs
  WHERE round(CAST(n_common AS DOUBLE) / (n_total - n_common), 4) >= 0.8
), bi AS (
  SELECT id_a AS s, id_b AS d FROM edges
  UNION ALL SELECT id_b, id_a FROM edges
), reach(id, r) AS (
  SELECT doc_id, doc_id FROM sets
  UNION
  SELECT bi.d, reach.r FROM reach JOIN bi ON bi.s = reach.id
)
SELECT id AS doc_id, min(r) AS component,
       (id = min(r)) AS is_kept
FROM reach GROUP BY id
"""


@_q("q_ngram_jaccard_pairs")
def q_ngram_jaccard_pairs(spark, sf_dir):
    """Exact character-3-gram Jaccard over a bounded candidate set — the
    fine-grained near-dup verifier (catches shared substrings that word-level
    shingles miss).  At 100 TB this runs only on LSH candidate pairs, never
    all-pairs; the bounded id filter here stands in for that candidate set."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    sets = d.select("doc_id", F.array_distinct(char_ngrams("text", 3)).alias("gs"))
    a, b = sets.alias("a"), sets.alias("b")
    inter = F.size(F.array_intersect(F.col("a.gs"), F.col("b.gs"))).cast("long")
    union = F.size(F.array_union(F.col("a.gs"), F.col("b.gs"))).cast("long")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
                inter.alias("n_common"),
                F.round(inter / union, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.1)
    )


ORACLE_SQL["q_ngram_jaccard_pairs"] = f"""
WITH sets AS (
  SELECT doc_id,
         list_distinct([substr(t, CAST(i AS INTEGER), 3)
                        for i in range(1, length(t) - 1)]) AS gs
  FROM (SELECT doc_id, {_NORM_SQL} AS t FROM documents WHERE doc_id < 30)
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(list_filter(a.gs, x -> list_contains(b.gs, x))) AS BIGINT) AS n_common,
         CAST(len(a.gs) + len(b.gs) AS BIGINT) AS n_total
  FROM sets a JOIN sets b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, n_common,
       round(CAST(n_common AS DOUBLE) / (n_total - n_common), 4) AS jaccard
FROM pairs
WHERE round(CAST(n_common AS DOUBLE) / (n_total - n_common), 4) >= 0.1
"""


@_q("q_dedup_embedding_cosine")
def q_dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs, blocked by label AND a coarse
    hyperplane (ANN) bucket.

    Label alone leaves one popular label as a quadratic block at 100 TB
    (VERDICT r1); the secondary bucket key splits every block 4 ways.  Basis
    planes keep the bucket bit-identical to the SQL oracle (``dot(v, e_i)``
    is exactly ``v[i]``); a production run would use seeded random planes
    via the same ``hyperplane_bucket``.
    """
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v"))
    planes = similarity.basis_planes(64, (0, 1))
    return similarity.cosine_near_dup_pairs(
        e, "vec_id", "v", ["label"], planes, threshold=0.3)


ORACLE_SQL["q_dedup_embedding_cosine"] = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
         (CASE WHEN CAST(embedding[1] AS DOUBLE) >= 0 THEN 1 ELSE 0 END)
       + (CASE WHEN CAST(embedding[2] AS DOUBLE) >= 0 THEN 2 ELSE 0 END) AS bkt
  FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS label,
       round(list_cosine_similarity(a.v, b.v), 6) AS cosine_sim
FROM e a JOIN e b ON a.label = b.label AND a.bkt = b.bkt
                 AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.3
"""


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

@_q("q_token_stats")
def q_token_stats(spark, sf_dir):
    """Token counting aggregated by language."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(F.sum(token_count("text")).cast("long").alias("total_tokens"),
             F.round(F.avg(token_count("text")), 4).alias("avg_tokens"),
             F.count("*").alias("n_docs"))
        .orderBy("lang")
    )


ORACLE_SQL["q_token_stats"] = """
SELECT lang,
       CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS total_tokens,
       round(avg(len(regexp_extract_all(text, '\\S+'))), 4) AS avg_tokens,
       count(*) AS n_docs
FROM documents
GROUP BY lang
ORDER BY lang
"""


@_q("q_text_quality")
def q_text_quality(spark, sf_dir):
    """Per-document quality features (pre-training filter inputs)."""
    d = load(spark, sf_dir, "documents")
    return text.quality_features(d, "doc_id", "text")


ORACLE_SQL["q_text_quality"] = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_words,
       round(len(regexp_extract_all(text, '[.,;:!?]'))
             / greatest(length(text), 1), 4) AS punct_ratio,
       round(len(regexp_extract_all(text, '[0-9]'))
             / greatest(length(text), 1), 4) AS digit_ratio,
       round((length(text) - length(regexp_replace(text, '\\s', '', 'g')))
             / greatest(length(text), 1), 4) AS space_ratio,
       round(length(regexp_replace(text, '\\s', '', 'g'))
             / greatest(len(regexp_extract_all(text, '\\S+')), 1), 4) AS mean_word_len
FROM documents
"""


@_q("q_repetition_quality")
def q_repetition_quality(spark, sf_dir):
    """Repetition-ratio quality signals (Gopher-rules shape): fraction of
    tokens covered by the most frequent word / word-bigram — in-row sorted
    run-length math, one scan, no explode shuffle."""
    d = load(spark, sf_dir, "documents")
    return text.repetition_features(d, "doc_id", "text")


ORACLE_SQL["q_repetition_quality"] = """
WITH ws AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS w
  FROM documents
), uni AS (
  SELECT doc_id, max(n) AS mx, CAST(sum(n) AS BIGINT) AS tot FROM (
    SELECT doc_id, x, count(*) AS n
    FROM (SELECT doc_id, unnest(w) AS x FROM ws)
    GROUP BY doc_id, x
  ) GROUP BY doc_id
), bi AS (
  SELECT doc_id, max(n) AS mx, CAST(sum(n) AS BIGINT) AS tot FROM (
    SELECT doc_id, x, count(*) AS n
    FROM (SELECT doc_id,
                 unnest([w[CAST(i AS INTEGER)] || ' ' || w[CAST(i AS INTEGER) + 1]
                         for i in range(1, len(w))]) AS x
          FROM ws)
    GROUP BY doc_id, x
  ) GROUP BY doc_id
)
SELECT ws.doc_id,
       round(coalesce(uni.mx, 0) / greatest(coalesce(uni.tot, 0), 1), 4)
         AS top_word_ratio,
       round(coalesce(bi.mx, 0) / greatest(coalesce(bi.tot, 0), 1), 4)
         AS top_bigram_ratio
FROM ws
LEFT JOIN uni USING (doc_id)
LEFT JOIN bi USING (doc_id)
"""


@_q("q_lang_id")
def q_lang_id(spark, sf_dir):
    """Heuristic stopword-vote language ID vs the labeled lang column."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", text.lang_id("text").alias("pred_lang"))


def _langid_oracle() -> str:
    counts = {
        lang: f"len(regexp_extract_all(lower(text), '\\b({'|'.join(ws)})\\b'))"
        for lang, ws in text.STOPWORDS.items()
    }
    best = "greatest(" + ", ".join(counts.values()) + ")"
    whens = "\n".join(
        f"WHEN {c} > 0 AND {c} = {best} THEN '{lang}'"
        for lang, c in counts.items())
    return f"SELECT doc_id, lang, CASE {whens} ELSE 'und' END AS pred_lang FROM documents"


ORACLE_SQL["q_lang_id"] = _langid_oracle()


@_q("q_corpus_clean_pipeline")
def q_corpus_clean_pipeline(spark, sf_dir):
    """End-to-end corpus cleaning — the flagship training-data shape:
    quality-filter → heuristic language ID → exact dedup (keep lowest id per
    fingerprint) → per-language summary of the surviving corpus.

    Every stage is codegen'd expressions over ONE scan + two hash-agg
    shuffles (fingerprint groupBy, final summary groupBy); the doc survives
    as a row all the way — no driver round-trips.  At 100 TB the same plan
    holds: filters push to the scan, both shuffles are on well-distributed
    keys (md5 fingerprint, language)."""
    d = load(spark, sf_dir, "documents")
    q = text.quality_features(d, "doc_id", "text")
    good = (
        d.join(q, "doc_id")
        .filter((F.col("n_words") >= 20)
                & (F.col("digit_ratio") <= 0.2)
                & (F.col("mean_word_len").between(3, 12)))
    )
    keep = (dedup.exact_dedup(good, "doc_id", "text")
            .select(F.col("keep_id").alias("doc_id")))
    cleaned = good.join(keep, "doc_id", "left_semi")
    return (
        cleaned.select(text.lang_id("text").alias("pred_lang"),
                       token_count("text").alias("_tok"))
        .groupBy("pred_lang")
        .agg(F.count("*").alias("n_docs"),
             F.sum("_tok").cast("long").alias("total_tokens"),
             F.round(F.avg("_tok"), 4).alias("avg_tokens"))
        .orderBy("pred_lang")
    )


def _corpus_clean_oracle() -> str:
    counts = {
        lang: f"len(regexp_extract_all(lower(text), '\\b({'|'.join(ws)})\\b'))"
        for lang, ws in text.STOPWORDS.items()
    }
    best = "greatest(" + ", ".join(counts.values()) + ")"
    whens = "\n".join(
        f"WHEN {c} > 0 AND {c} = {best} THEN '{lang}'"
        for lang, c in counts.items())
    return f"""
WITH q AS (
  SELECT doc_id, text,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_words,
         round(len(regexp_extract_all(text, '[0-9]'))
               / greatest(length(text), 1), 4) AS digit_ratio,
         round(length(regexp_replace(text, '\\s', '', 'g'))
               / greatest(len(regexp_extract_all(text, '\\S+')), 1), 4) AS mean_word_len
  FROM documents
), good AS (
  SELECT doc_id, text FROM q
  WHERE n_words >= 20 AND digit_ratio <= 0.2
    AND mean_word_len BETWEEN 3 AND 12
), keep AS (
  SELECT min(doc_id) AS doc_id
  FROM (SELECT doc_id, md5({_NORM_SQL}) AS fp FROM good)
  GROUP BY fp
), cleaned AS (
  SELECT g.doc_id, g.text FROM good g JOIN keep USING (doc_id)
)
SELECT CASE {whens} ELSE 'und' END AS pred_lang,
       count(*) AS n_docs,
       CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS total_tokens,
       round(avg(len(regexp_extract_all(text, '\\S+'))), 4) AS avg_tokens
FROM cleaned
GROUP BY 1 ORDER BY 1
"""


ORACLE_SQL["q_corpus_clean_pipeline"] = _corpus_clean_oracle()


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

@_q("q_array_functions")
def q_array_functions(spark, sf_dir):
    """Array-column surface: size, element access, L2 norm (SURVEY §2.6)."""
    e = load(spark, sf_dir, "embeddings")
    from ..functions.vectors import l2_norm
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(l2_norm("embedding"), 4).alias("l2"),
    )


ORACLE_SQL["q_array_functions"] = """
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
       round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 4) AS l2
FROM embeddings
"""


@_q("q_embedding_norm_stats")
def q_embedding_norm_stats(spark, sf_dir):
    """Per-label embedding statistics (norm distribution by cluster)."""
    from ..functions.vectors import l2_norm
    e = load(spark, sf_dir, "embeddings")
    return (
        e.groupBy("label")
        .agg(F.count("*").alias("n"),
             F.round(F.avg(l2_norm("embedding")), 4).alias("avg_l2"),
             F.round(F.min(l2_norm("embedding")), 4).alias("min_l2"),
             F.round(F.max(l2_norm("embedding")), 4).alias("max_l2"))
        .orderBy("label")
    )


ORACLE_SQL["q_embedding_norm_stats"] = """
WITH n AS (
  SELECT label,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS l2
  FROM embeddings
)
SELECT label, count(*) AS n,
       round(avg(l2), 4) AS avg_l2,
       round(min(l2), 4) AS min_l2,
       round(max(l2), 4) AS max_l2
FROM n GROUP BY label ORDER BY label
"""


@_q("q_cosine_topk")
def q_cosine_topk(spark, sf_dir):
    """Exact brute-force cosine top-5 neighbors for the first 10 vectors —
    the ANN correctness baseline (broadcast queries, one corpus scan)."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return similarity.brute_force_topk(e, q, k=5).select(
        "query_id", "neighbor_id", "cosine_sim", "rnk")


ORACLE_SQL["q_cosine_topk"] = """
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[])), 6) AS cosine_sim
  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < 10
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 5
"""


@_q("q_ann_lsh_topk")
def q_ann_lsh_topk(spark, sf_dir):
    """Approximate top-k via hyperplane-LSH bucketing — the 100 TB scale path
    (bucket equi-join instead of cross join).  Approximate vs brute force,
    but DETERMINISTIC given the seeded planes — the generated DuckDB oracle
    (``_lsh_ann_oracle_sql``) reproduces buckets, OR-construction, and
    ranking exactly; recall floor additionally asserted in
    tests/test_similarity.py."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return similarity.lsh_ann_topk(e, q, k=5, n_planes=4).select(
        "query_id", "neighbor_id", "cosine_sim", "rnk")
# (ORACLE_SQL registered below: _lsh_ann_oracle_sql generates the mirror
#  with the same seeded hyperplane literals)


#: IVF coarse quantizers are an OFFLINE-built index (train once, serve
#: many) — cache per (corpus, params) so repeated queries in one session
#: pay the k-means cost once, mirroring real index reuse.
_IVF_CENTROIDS: dict = {}


@_q("q_ann_ivf_topk")
def q_ann_ivf_topk(spark, sf_dir):
    """Approximate top-k via an IVF (inverted-file cell) index in
    *verifiable* mode: deterministic data-point centroids
    (``seed_centroids`` — the k-means init step, zero Lloyd iterations) so
    the DuckDB oracle reconstructs the SAME cells from the parquet and
    mirrors assignment, probing, and ranking exactly.  Production runs
    ``train_ivf_centroids`` (k-means-fitted cells; recall floor asserted in
    tests/test_similarity.py) — same split as MinHash verifiable/xxhash64
    modes.  Each query probes n_probe/n_cells of the corpus via a cell-id
    equi-join; the corpus never shuffles (broadcast probe side)."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    key = (sf_dir, 8)
    if key not in _IVF_CENTROIDS:
        _IVF_CENTROIDS[key] = similarity.seed_centroids(e, n_cells=8)
    return similarity.ivf_topk(e, q, _IVF_CENTROIDS[key], k=5, n_probe=3).select(
        "query_id", "neighbor_id", "cosine_sim", "rnk")


# Mirror of the verifiable IVF pipeline: centroids = the 8 smallest-id
# embeddings; affinity = dot(x, c) - |c|^2/2 (argmax == nearest cell, ties
# to the HIGHER cell id, matching ivf_topk's lexsort tie-break); corpus row
# -> 1 cell, query -> top-3 cells; cosine ranked per query.  A cell
# assignment can only disagree across engines if two affinities land within
# ~1e-13 (summation-order noise) — probability ~0 on continuous data.
ORACLE_SQL["q_ann_ivf_topk"] = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cent AS (
  SELECT vec_id AS cell, v AS cv, list_dot_product(v, v) / 2.0 AS half
  FROM v ORDER BY vec_id LIMIT 8
), assign AS (
  SELECT x.vec_id, x.v, cent.cell,
         row_number() OVER (
           PARTITION BY x.vec_id
           ORDER BY (list_dot_product(x.v, cent.cv) - cent.half) DESC,
                    cent.cell DESC) AS rc
  FROM v x CROSS JOIN cent
), cand AS (
  SELECT vec_id, v, cell FROM assign WHERE rc = 1
), probes AS (
  SELECT vec_id, v, cell FROM assign WHERE vec_id < 10 AND rc <= 3
), pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.v, c.v), 6) AS cosine_sim
  FROM probes q JOIN cand c USING (cell)
  WHERE q.vec_id <> c.vec_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC) AS rnk
  FROM pairs
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 5
"""


# ---------------------------------------------------------------------------
# Multimodal binary columns
# ---------------------------------------------------------------------------

@_q("q_binary_bytes_by_source")
def q_binary_bytes_by_source(spark, sf_dir):
    """Opaque-binary payload accounting per source (byte-length semantics
    over a binary column)."""
    d = load(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return (
        d.groupBy("source")
        .agg(F.sum(F.length(payload)).cast("long").alias("total_bytes"),
             F.max(F.length(payload)).cast("long").alias("max_bytes"),
             F.count("*").alias("n_docs"))
        .orderBy("source")
    )


ORACLE_SQL["q_binary_bytes_by_source"] = """
SELECT source,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes,
       count(*) AS n_docs
FROM documents
GROUP BY source
ORDER BY source
"""


@_q("q_multimodal_decode")
def q_multimodal_decode(spark, sf_dir):
    """Binary decode plumbing: mapInPandas over Arrow batches of blobs with
    the deterministic stand-in codec (real codecs absent in-container).
    Schema/partitioning/batch shape are the real contract."""
    d = load(spark, sf_dir, "documents")
    media = multimodal.attach_media_column(d, "doc_id", "text")
    return multimodal.decode_media(media, multimodal.fake_decoder)


# Mirrors fake_decoder exactly: checksum = Σ code points of first 64 chars,
# width/height from it, byte_len = utf8 octet length — the mapInPandas
# plumbing (Arrow batching, schema, pass-through columns) is what's checked.
ORACLE_SQL["q_multimodal_decode"] = """
WITH cs AS (
  SELECT doc_id, text,
         coalesce(list_sum([ord(substring(text, CAST(i AS INTEGER), 1))
                            for i in range(1, least(length(text), 64) + 1)]),
                  0) AS checksum
  FROM documents
)
SELECT doc_id AS media_id,
       'image' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       CAST(16 + checksum % 256 AS BIGINT) AS width,
       CAST(16 + (checksum * 7) % 256 AS BIGINT) AS height,
       CAST(0 AS BIGINT) AS duration_ms
FROM cs
"""


@_q("q_multimodal_feature_ann")
def q_multimodal_feature_ann(spark, sf_dir):
    """Composed multimodal pipeline: binary column → Arrow-batched feature
    extraction (byte-histogram stand-in for CLIP/wav2vec) → exact cosine
    top-3 over the feature vectors — the decode→embed→search shape end to
    end.  mapInPandas feature stage ⇒ rows-only; stage contracts asserted
    in tests/test_multimodal.py."""
    d = load(spark, sf_dir, "documents")
    media = multimodal.attach_media_column(d, "doc_id", "text")
    feats = multimodal.byte_histogram_features(media, n_bins=16)
    q = feats.filter(F.col("media_id") < 5)
    return similarity.brute_force_topk(
        feats, q, id_col="media_id", vec_col="features", k=3).select(
        "query_id", "neighbor_id", "cosine_sim", "rnk")


# Exact mirror of the Arrow feature stage: per-byte bins via
# hex(substring(blob)) — engine-agnostic byte access — then the same
# float32 L1 normalization and rounded-cosine ranking as the Spark side.
ORACLE_SQL["q_multimodal_feature_ann"] = """
WITH hx AS (
  SELECT doc_id, hex(encode(text)) AS h FROM documents
), b AS (
  SELECT doc_id,
         [('0x' || substring(h, CAST(2 * i - 1 AS INTEGER), 2))::INT // 16
          for i in range(1, length(h) // 2 + 1)] AS bins
  FROM hx
), f AS (
  SELECT doc_id,
         CASE WHEN len(bins) = 0
              THEN [CAST(0.0 AS FLOAT) for z in range(0, 16)]
              ELSE [CAST(CAST(len(list_filter(bins, x -> x = CAST(bb AS INTEGER)))
                              AS DOUBLE) / len(bins) AS FLOAT)
                    for bb in range(0, 16)]
         END AS features
  FROM b
), scored AS (
  SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
         round(list_cosine_similarity(CAST(q.features AS DOUBLE[]),
                                      CAST(c.features AS DOUBLE[])), 6) AS cosine_sim
  FROM f q JOIN f c ON q.doc_id <> c.doc_id
  WHERE q.doc_id < 5
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 3
"""


@_q("q_bpe_token_stats")
def q_bpe_token_stats(spark, sf_dir):
    """BPE-pre-tokenizer token counting per source (``textfns.BPE_SPLIT_RE``)
    vs plain whitespace counts — the LLM-cost estimate a corpus budget uses.
    One scan + one partial-agg shuffle; regex work is all codegen."""
    from ..functions.textfns import bpe_ish_tokens
    d = load(spark, sf_dir, "documents")
    bpe = F.size(bpe_ish_tokens("text"))
    ws = token_count("text")
    return (
        d.select("source", bpe.alias("_b"), ws.alias("_w"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.sum("_b").alias("total_bpe_tokens"),
             F.sum("_w").alias("total_ws_tokens"),
             F.round(F.avg(F.col("_b") / F.col("_w")), 4).alias("avg_bpe_per_ws"))
    )


ORACLE_SQL["q_bpe_token_stats"] = r"""
WITH t AS (
  SELECT source,
         len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+'))
             AS b,
         len(regexp_extract_all(text, '\S+')) AS w
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(b) AS BIGINT) AS total_bpe_tokens,
       CAST(sum(w) AS BIGINT) AS total_ws_tokens,
       round(avg(CAST(b AS DOUBLE) / w), 4) AS avg_bpe_per_ws
FROM t
GROUP BY source
"""


@_q("q_rolling_fingerprint")
def q_rolling_fingerprint(spark, sf_dir):
    """Rabin-Karp rolling-hash document fingerprint (winnowing family): the
    min rolling 8-gram hash plus the distinct-hash count per document.
    Hash arithmetic is plain modular math shared verbatim with the SQL
    oracle, so unlike Murmur3-based fingerprints this one IS hash-checkable
    cross-engine."""
    from ..functions.textfns import char_codes, rolling_hashes_of
    d = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    return (
        d.select("doc_id", char_codes("text").alias("_cc"))
        .select("doc_id", rolling_hashes_of("_cc", 8).alias("_rh"))
        .select("doc_id",
                F.array_min("_rh").alias("fp_min"),
                F.size(F.array_distinct("_rh")).alias("n_distinct_grams"))
    )


def _rolling_oracle(n: int = 8, base: int = 257, mod: int = 2147483647) -> str:
    pows = [pow(base, k, mod) for k in range(n)]
    terms = " + ".join(
        f"ord(substr(t, CAST(i + {k} AS INTEGER), 1)) * {p}::BIGINT"
        for k, p in enumerate(pows))
    return f"""
WITH norm AS (
  SELECT doc_id, {_NORM_SQL} AS t FROM documents
), h AS (
  SELECT doc_id,
         CASE WHEN length(t) >= {n} THEN
           [({terms}) % {mod}
            for i in generate_series(1, length(t) - {n - 1})]
         ELSE [] END AS rh
  FROM norm
)
SELECT doc_id,
       list_min(rh) AS fp_min,
       CAST(len(list_distinct(rh)) AS INT) AS n_distinct_grams
FROM h
"""


ORACLE_SQL["q_rolling_fingerprint"] = _rolling_oracle()


@_q("q_substring_dedup")
def q_substring_dedup(spark, sf_dir):
    """EXACT SUBSTRING dedup over the documents table (Lee et al., ACL
    2022 ExactSubstr, round 10): every verbatim 40-char span occurring
    more than once in the corpus is cut from all but its globally first
    occurrence and the text rebuilt
    (``operators.dedup.dedup_substrings``).  The per-source aggregate
    hashes BOTH halves of the operator: span accounting (merged-interval
    counts) and reconstruction (``chars_removed`` is the length the
    REBUILT string actually lost, so a rebuild bug cannot hide behind
    correct interval math).  The DuckDB oracle replays the whole
    pipeline — same two Rabin-Karp bases, same keep-first rule, same
    gaps-and-islands merge — computing the removed length from the
    interval union.

    Scale shape: three keyed shuffles (hash-pair rank, per-doc island
    merge, per-source rollup) over per-position hashes built in ONE
    codegen pass — the distributed re-expression of the paper's
    suffix array, linear in corpus chars, never all-pairs."""
    from ..operators.dedup import dedup_substrings

    d = spread(load(spark, sf_dir, "documents")
               .select("doc_id", "source", "text"))
    out = dedup_substrings(d, "doc_id", "text", min_len=40)
    return (out.join(d.select("doc_id", "source"), "doc_id")
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum((F.col("n_dup_spans") > 0).cast("long"))
                  .alias("docs_touched"),
                 F.sum("n_dup_spans").alias("spans_removed"),
                 F.sum("chars_removed").alias("chars_removed"),
                 F.sum(F.length("clean_text")).alias("clean_chars")))


def _substring_dedup_oracle(n: int = 40, mod: int = 2147483647) -> str:
    def terms(base: int) -> str:
        pows = [pow(base, k, mod) for k in range(n)]
        return " + ".join(
            f"ord(substr(t, CAST(i + {k} AS INTEGER), 1)) * {p}::BIGINT"
            for k, p in enumerate(pows))

    return f"""
WITH norm AS (
  SELECT doc_id, source, {_NORM_SQL} AS t FROM documents
), g AS (
  SELECT doc_id, u.i AS s,
         ({terms(257)}) % {mod} AS h1,
         ({terms(263)}) % {mod} AS h2
  FROM norm, unnest(range(1, length(t) - {n - 2})) AS u(i)
  WHERE length(t) >= {n}
), ranked AS (
  SELECT doc_id, s,
         row_number() OVER (PARTITION BY h1, h2 ORDER BY doc_id, s)
           AS rn,
         count(*) OVER (PARTITION BY h1, h2) AS c
  FROM g
), cut AS (
  SELECT doc_id, s, s + {n} AS e FROM ranked WHERE c >= 2 AND rn >= 2
), isl AS (
  SELECT doc_id, s, e,
         CASE WHEN s <= coalesce(max(e) OVER (
                PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 0 ELSE 1 END AS nw
  FROM cut
), gid AS (
  SELECT doc_id, s, e,
         sum(nw) OVER (PARTITION BY doc_id ORDER BY s) AS grp
  FROM isl
), merged AS (
  SELECT doc_id, min(s) AS s, max(e) AS e
  FROM gid GROUP BY doc_id, grp
), per_doc AS (
  SELECT doc_id, count(*) AS n_spans, sum(e - s) AS removed
  FROM merged GROUP BY doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN coalesce(n_spans, 0) > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS docs_touched,
       CAST(sum(coalesce(n_spans, 0)) AS BIGINT) AS spans_removed,
       CAST(sum(coalesce(removed, 0)) AS BIGINT) AS chars_removed,
       CAST(sum(length(t) - coalesce(removed, 0)) AS BIGINT)
         AS clean_chars
FROM norm LEFT JOIN per_doc USING (doc_id)
GROUP BY source
"""


ORACLE_SQL["q_substring_dedup"] = _substring_dedup_oracle()


@_q("q_profile_documents")
def q_profile_documents(spark, sf_dir):
    """Column-level data profile of the documents table (rows / nulls /
    exact distinct / min / max per column, long format) — crawler-statistics
    as a query (``operators.text.profile_table``)."""
    d = load(spark, sf_dir, "documents")
    return text.profile_table(d, ["doc_id", "lang", "source", "n_chars"])


def _profile_oracle() -> str:
    cols = ["doc_id", "lang", "source", "n_chars"]
    selects = []
    for c in cols:
        selects.append(f"""
SELECT '{c}' AS column,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_val,
       CAST(max({c}) AS VARCHAR) AS max_val
FROM documents""")
    return "\nUNION ALL\n".join(selects)


ORACLE_SQL["q_profile_documents"] = _profile_oracle()


@_q("q_grouped_pandas_agg")
def q_grouped_pandas_agg(spark, sf_dir):
    """Custom aggregate via GROUPED_AGG pandas UDF (Arrow-batched): the
    geometric mean of document length per language — the U2 capability
    instance (SURVEY §2.8).  Note the scale caveat in ``pandas_fns``:
    GROUPED_AGG has no partial aggregation, so prefer builtin
    ``exp(avg(ln(x)))`` (the oracle's form) when the agg decomposes —
    this query exists to pin the escape hatch's correctness."""
    from ..functions.pandas_fns import geo_mean
    d = load(spark, sf_dir, "documents")
    # a GROUPED_AGG pandas UDF cannot share an agg with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — split and join on the group key
    g = (d.groupBy("lang")
         .agg(F.round(geo_mean(F.col("n_chars").cast("double")), 4)
               .alias("geo_mean_chars")))
    n = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    return n.join(g, "lang").select("lang", "n_docs", "geo_mean_chars")


ORACLE_SQL["q_grouped_pandas_agg"] = """
SELECT lang,
       count(*) AS n_docs,
       round(exp(avg(ln(n_chars))), 4) AS geo_mean_chars
FROM documents
GROUP BY lang
"""


@_q("q_winnow_fingerprints")
def q_winnow_fingerprints(spark, sf_dir):
    """Winnowed document fingerprints: distinct per-window minima of the
    Rabin-Karp rolling hashes (guaranteed-coverage plagiarism/overlap
    fingerprints, ~|text|/window selected per doc).  Emits the selected-set
    size and its cheap set-level digest (min/max) per doc; the full set is
    array-typed and sorted, so the digest is deterministic."""
    from ..functions.textfns import char_codes, rolling_hashes_of, winnow
    d = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    return (
        d.select("doc_id", char_codes("text").alias("_cc"))
        .select("doc_id", rolling_hashes_of("_cc", 8).alias("_rh"))
        .select("doc_id", winnow("_rh", 4).alias("_fp"))
        .select("doc_id",
                F.size("_fp").alias("n_fingerprints"),
                F.element_at("_fp", 1).alias("fp_first"),
                F.element_at("_fp", -1).alias("fp_last"))
    )


def _winnow_oracle(n: int = 8, w: int = 4,
                   base: int = 257, mod: int = 2147483647) -> str:
    pows = [pow(base, k, mod) for k in range(n)]
    terms = " + ".join(
        f"ord(substr(t, CAST(i + {k} AS INTEGER), 1)) * {p}::BIGINT"
        for k, p in enumerate(pows))
    return f"""
WITH norm AS (
  SELECT doc_id, {_NORM_SQL} AS t FROM documents
), h AS (
  SELECT doc_id,
         CASE WHEN length(t) >= {n} THEN
           [({terms}) % {mod}
            for i in generate_series(1, length(t) - {n - 1})]
         ELSE [] END AS rh
  FROM norm
), fp AS (
  SELECT doc_id,
         CASE WHEN len(rh) >= {w} THEN
           list_sort(list_distinct(
             [list_min(rh[CAST(i AS INTEGER):CAST(i + {w} - 1 AS INTEGER)])
              for i in generate_series(1, len(rh) - {w - 1})]))
         WHEN len(rh) > 0 THEN [list_min(rh)]
         ELSE [] END AS f
  FROM h
)
SELECT doc_id,
       CAST(len(f) AS INT) AS n_fingerprints,
       f[1] AS fp_first,
       f[-1] AS fp_last
FROM fp
"""


ORACLE_SQL["q_winnow_fingerprints"] = _winnow_oracle()


@_q("q_chunk_documents")
def q_chunk_documents(spark, sf_dir):
    """Context-window chunking: 200-char chunks with 50-char overlap
    (``operators.text.chunk_text``) — per-source chunk counts and length
    stats keep the result compact while pinning every chunk boundary."""
    d = load(spark, sf_dir, "documents")
    ch = text.chunk_text(d, "doc_id", "text", chunk_chars=200, overlap=50)
    return (
        ch.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count("*").alias("n_chunks"),
             F.sum("chunk_len").alias("total_chunk_chars"),
             F.max("chunk_id").alias("max_chunk_id"),
             F.min("chunk_len").alias("min_chunk_len"))
    )


ORACLE_SQL["q_chunk_documents"] = """
WITH n AS (
  SELECT doc_id, source, text,
         GREATEST(1, CAST(ceil((length(text) - 50) / 150.0) AS INT)) AS nc
  FROM documents
), ch AS (
  SELECT doc_id, source,
         i AS chunk_id,
         length(substr(text, CAST(i * 150 + 1 AS INTEGER), 200)) AS chunk_len
  FROM n, LATERAL (SELECT unnest(generate_series(0, nc - 1)) AS i)
)
SELECT source,
       count(*) AS n_chunks,
       CAST(sum(chunk_len) AS BIGINT) AS total_chunk_chars,
       CAST(max(chunk_id) AS INT) AS max_chunk_id,
       CAST(min(chunk_len) AS INT) AS min_chunk_len
FROM ch
GROUP BY source
"""


@_q("q_pack_token_bins")
def q_pack_token_bins(spark, sf_dir):
    """Token-budget bin packing: documents laid into ~2000-token bins per
    source via the DISTRIBUTED two-level prefix sum
    (``operators.text.pack_bins_prefix`` — round 7; bit-identical to the
    window-cumsum form but never single-task per source, the shape that
    survives a few-huge-sources corpus).  Emits per-bin document counts
    and weights; the oracle is the identical exclusive-cumsum floor
    division."""
    d = load(spark, sf_dir, "documents")
    weighted = d.select("doc_id", "source", token_count("text").alias("_tok"))
    packed = text.pack_bins_prefix(weighted, "doc_id", "_tok", 2000,
                                   part_col="source")
    return (
        packed.groupBy("source", "bin")
        .agg(F.count("*").alias("n_docs"),
             F.sum("weight").alias("bin_tokens"))
    )


ORACLE_SQL["q_pack_token_bins"] = r"""
WITH t AS (
  SELECT doc_id, source,
         len(regexp_extract_all(text, '\S+')) AS tok
  FROM documents
), c AS (
  SELECT doc_id, source, tok,
         COALESCE(sum(tok) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS cum_excl
  FROM t
)
SELECT source,
       CAST(floor(cum_excl / 2000) AS INT) AS bin,
       count(*) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS bin_tokens
FROM c
GROUP BY 1, 2
"""


@_q("q_pack_bins_global")
def q_pack_bins_global(spark, sf_dir):
    """GLOBAL token-budget bin packing — one corpus-wide bin sequence in
    doc_id order, with NO partition column.  The naive form is a
    single-task global window (banned at scale); this uses
    ``operators.text.pack_bins_prefix``: a distributed two-level prefix
    sum (range-bucket → bucket-local cumsum → broadcast bucket offsets)
    whose plan contains no SinglePartition exchange (pinned in
    tests/test_pack_bins.py) yet whose result is bit-identical to the
    exclusive-cumsum floor division the oracle replays."""
    d = load(spark, sf_dir, "documents")
    weighted = d.select("doc_id", token_count("text").alias("_tok"))
    packed = text.pack_bins_prefix(weighted, "doc_id", "_tok", 2000)
    return (
        packed.groupBy("bin")
        .agg(F.count("*").alias("n_docs"),
             F.sum("weight").alias("bin_tokens"))
    )


ORACLE_SQL["q_pack_bins_global"] = r"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\S+')) AS tok
  FROM documents
), c AS (
  SELECT doc_id, tok,
         COALESCE(sum(tok) OVER (ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS cum_excl
  FROM t
)
SELECT CAST(floor(cum_excl / 2000) AS INT) AS bin,
       count(*) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS bin_tokens
FROM c
GROUP BY 1
"""


@_q("q_data_expectations")
def q_data_expectations(spark, sf_dir):
    """Declarative data-quality contract over lineitem
    (``operators.expectations``): all row-level rules share ONE scan +
    partial-agg; the uniqueness rule adds one groupBy.  The lake-level
    counterpart of the reference's file-arity quarantine."""
    from ..operators import expectations as ex
    li = load(spark, sf_dir, "lineitem")
    return ex.check(li, [
        ex.not_null("l_orderkey"),
        ex.in_range("l_quantity", 1, 50),
        ex.in_range("l_discount", 0.0, 0.1),
        ex.in_set("l_returnflag", ["A", "N", "R"]),
        ex.matches("l_linestatus", r"^[OF]$"),
        ex.unique("l_orderkey", "l_linenumber"),
    ])


ORACLE_SQL["q_data_expectations"] = """
SELECT 'not_null(l_orderkey)' AS rule, count(*) AS n_rows,
       CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violations,
       CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) = 0
           AS pass
FROM lineitem
UNION ALL
SELECT 'in_range(l_quantity,1,50)', count(*),
       CAST(sum(CASE WHEN l_quantity NOT BETWEEN 1 AND 50
                       OR l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN l_quantity NOT BETWEEN 1 AND 50
                       OR l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) = 0
FROM lineitem
UNION ALL
SELECT 'in_range(l_discount,0.0,0.1)', count(*),
       CAST(sum(CASE WHEN l_discount NOT BETWEEN 0.0 AND 0.1
                       OR l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN l_discount NOT BETWEEN 0.0 AND 0.1
                       OR l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) = 0
FROM lineitem
UNION ALL
SELECT 'in_set(l_returnflag)', count(*),
       CAST(sum(CASE WHEN l_returnflag NOT IN ('A','N','R')
                       OR l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN l_returnflag NOT IN ('A','N','R')
                       OR l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) = 0
FROM lineitem
UNION ALL
SELECT 'matches(l_linestatus)', count(*),
       CAST(sum(CASE WHEN NOT regexp_matches(l_linestatus, '^[OF]$')
                       OR l_linestatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN NOT regexp_matches(l_linestatus, '^[OF]$')
                       OR l_linestatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) = 0
FROM lineitem
UNION ALL
SELECT 'unique(l_orderkey,l_linenumber)',
       CAST(sum(c) AS BIGINT), CAST(sum(c - 1) AS BIGINT),
       CAST(sum(c - 1) AS BIGINT) = 0
FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber)
"""


@_q("q_hll_sketch_rollup")
def q_hll_sketch_rollup(spark, sf_dir):
    """Mergeable-sketch rollup (DataSketches HLL): per-source user sketches
    built in one pass, then UNIONED to a global estimate WITHOUT rescanning
    — the incremental-analytics contract (persist per-partition sketches,
    merge on demand; re-aggregating raw data at 100 TB costs a full scan,
    merging sketches costs KBs).  Estimates are approximate ⇒ rows-only;
    the 5%-of-exact bound is asserted in tests/test_approx.py."""
    e = load(spark, sf_dir, "events")
    per_source = (e.groupBy("event_type")
                  .agg(F.hll_sketch_agg("user_id").alias("sk"),
                       F.count("*").alias("n_events")))
    merged = (per_source
              .agg(F.hll_union_agg("sk").alias("sk_all"),
                   F.sum("n_events").alias("n_events")))
    per = per_source.select(
        "event_type",
        F.hll_sketch_estimate("sk").cast("long").alias("est_users"),
        "n_events")
    tot = merged.select(
        F.lit("__ALL__").alias("event_type"),
        F.hll_sketch_estimate("sk_all").cast("long").alias("est_users"),
        "n_events")
    return per.unionByName(tot)
# (no ORACLE_SQL: sketch binary/estimate is engine-specific; bounded vs
#  exact in tests/test_approx.py)


@_q("q_chunk_tokens")
def q_chunk_tokens(spark, sf_dir):
    """Token-boundary chunking (40-token chunks, 10-token overlap,
    ``operators.text.chunk_tokens``) aggregated per source — word-safe
    context-window prep; every chunk boundary pinned via token-count sums."""
    d = load(spark, sf_dir, "documents")
    ch = text.chunk_tokens(d, "doc_id", "text", chunk_tokens_n=40, overlap=10)
    return (
        ch.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count("*").alias("n_chunks"),
             F.sum("chunk_tokens").alias("total_tokens"),
             F.max("chunk_id").alias("max_chunk_id"))
    )


ORACLE_SQL["q_chunk_tokens"] = """
WITH t AS (
  SELECT doc_id, source, string_split(text, ' ') AS tk,
         GREATEST(1, CAST(ceil((len(string_split(text, ' ')) - 10) / 30.0)
                          AS INT)) AS nc
  FROM documents
), ch AS (
  SELECT doc_id, source, i AS chunk_id,
         len(tk[CAST(i * 30 + 1 AS INTEGER)
                :CAST(LEAST(i * 30 + 40, len(tk)) AS INTEGER)]) AS chunk_tokens
  FROM t, LATERAL (SELECT unnest(generate_series(0, nc - 1)) AS i)
)
SELECT source,
       count(*) AS n_chunks,
       CAST(sum(chunk_tokens) AS BIGINT) AS total_tokens,
       CAST(max(chunk_id) AS INT) AS max_chunk_id
FROM ch
GROUP BY source
"""


# ---------------------------------------------------------------------------
# Relevance ranking: TF-IDF / BM25 (operators/ranking.py)
# ---------------------------------------------------------------------------

@_q("q_tfidf_top_terms")
def q_tfidf_top_terms(spark, sf_dir):
    """Top-3 terms per document by smoothed TF-IDF for the first 50 docs
    (explode → two partial aggs → broadcast idf join)."""
    from ..operators.ranking import tfidf_top_terms
    d = load(spark, sf_dir, "documents")
    out = tfidf_top_terms(d, "doc_id", "text", k=3)
    return out.filter(F.col("doc_id") < 50).select(
        "doc_id", "term", "tfidf", "rnk")


ORACLE_SQL["q_tfidf_top_terms"] = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
), idf AS (
  SELECT term,
         ln(((SELECT count(DISTINCT doc_id) FROM documents) + 1.0)
            / (count(*) + 1.0)) + 1.0 AS idf
  FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id, tf.term, round(tf.tf * idf.idf, 6) AS tfidf
  FROM tf JOIN idf USING (term)
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term ASC) AS rnk
  FROM scored
)
SELECT doc_id, term, tfidf, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 3 AND doc_id < 50
"""


@_q("q_bm25_search")
def q_bm25_search(spark, sf_dir):
    """Okapi BM25 top-10 documents for a 3-term query — explode filtered to
    the query terms before any shuffle; top-N as TakeOrderedAndProject."""
    from ..operators.ranking import bm25_scores
    d = load(spark, sf_dir, "documents")
    return bm25_scores(d, "doc_id", "text",
                       query_terms=["spark", "shuffle", "partition"],
                       top_n=10)


ORACLE_SQL["q_bm25_search"] = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS term
  FROM documents
), lens AS (
  SELECT doc_id, len(regexp_extract_all(lower(text), '\\w+')) AS dl
  FROM documents
), stats AS (
  SELECT (SELECT count(DISTINCT doc_id) FROM documents) AS n_docs,
         (SELECT avg(dl) FROM lens) AS avg_len
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ('spark', 'shuffle', 'partition')
  GROUP BY 1, 2
), idf AS (
  SELECT term, ln(1.0 + (stats.n_docs - count(DISTINCT doc_id) + 0.5)
                  / (count(DISTINCT doc_id) + 0.5)) AS idf
  FROM tf, stats GROUP BY term, stats.n_docs
), contrib AS (
  SELECT tf.doc_id,
         idf.idf * tf.tf * (1.2 + 1.0)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * lens.dl / stats.avg_len)) AS c
  FROM tf JOIN idf USING (term) JOIN lens USING (doc_id), stats
), scored AS (
  SELECT doc_id, round(sum(c), 6) AS bm25,
         count(*) AS n_matched_terms
  FROM contrib GROUP BY doc_id
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rnk
  FROM scored
)
SELECT doc_id, bm25, n_matched_terms, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 10
"""


# ---------------------------------------------------------------------------
# PII redaction (operators/text.py redact_pii)
# ---------------------------------------------------------------------------

@_q("q_pii_redaction")
def q_pii_redaction(spark, sf_dir):
    """PII scrub over the corpus with deterministic synthetic PII injected
    into a slice of docs (the test corpus carries none) — counts + redacted
    length per doc prove both detection and replacement.  One codegen
    projection; no extra scan per rule."""
    d = load(spark, sf_dir, "documents")
    staged = d.withColumn(
        "text2",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat("text", F.lit(
                   " contact alice@example.com or 555-123-4567")))
         .when(F.col("doc_id") % 11 == 0,
               F.concat("text", F.lit(
                   " ssn 123-45-6789 mail bob.smith@corp.io")))
         .otherwise(F.col("text")))
    out = text.redact_pii(staged, "text2")
    return out.select(
        "doc_id", "n_emails", "n_phones", "n_ssns",
        F.length("text2_redacted").alias("red_len"))


ORACLE_SQL["q_pii_redaction"] = """
WITH staged AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' contact alice@example.com or 555-123-4567'
              WHEN doc_id % 11 = 0
              THEN text || ' ssn 123-45-6789 mail bob.smith@corp.io'
              ELSE text END AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(t, '\\b\\d{3}-\\d{3}-\\d{4}\\b')) AS INTEGER) AS n_phones,
       CAST(len(regexp_extract_all(t, '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS INTEGER) AS n_ssns,
       CAST(length(regexp_replace(regexp_replace(regexp_replace(t,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
            '\\b\\d{3}-\\d{3}-\\d{4}\\b', '[PHONE]', 'g'),
            '\\b\\d{3}-\\d{2}-\\d{4}\\b', '[SSN]', 'g')) AS INTEGER) AS red_len
FROM staged
"""


# ---------------------------------------------------------------------------
# Python UDTF (functions/udtf_fns.py — lateral correlated generator)
# ---------------------------------------------------------------------------

@_q("q_udtf_term_stats")
def q_udtf_term_stats(spark, sf_dir):
    """Spark 4 Python UDTF via lateral correlated join: per-document
    distinct-term stats (term, first position, count) for the first 20
    docs.  Registered + invoked through SQL — the full UDTF contract."""
    from ..functions.udtf_fns import register_udtfs
    register_udtfs(spark)
    load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20) \
        .createOrReplaceTempView("_udtf_docs")
    return spark.sql("""
        SELECT d.doc_id, t.term, t.first_pos, t.n_occurrences
        FROM _udtf_docs d, LATERAL TermStats(d.text) t
    """)


ORACLE_SQL["q_udtf_term_stats"] = """
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '\\w+')) AS term,
         unnest(range(0, len(regexp_extract_all(lower(text), '\\w+')))) AS pos
  FROM documents WHERE doc_id < 20
)
SELECT doc_id, term,
       CAST(min(pos) AS INTEGER) AS first_pos,
       CAST(count(*) AS INTEGER) AS n_occurrences
FROM tok GROUP BY doc_id, term
"""


# ---------------------------------------------------------------------------
# Vocabulary / quantization utilities
# ---------------------------------------------------------------------------

@_q("q_bigram_merge_stats")
def q_bigram_merge_stats(spark, sf_dir):
    """Top-20 adjacent token pairs corpus-wide — the candidate-scoring step
    of a BPE merge round.  Pairs are built in-row (zip of the token array
    with its own tail: no self-join), exploded, and counted in one
    partial-agg shuffle; global top-N plans as TakeOrderedAndProject."""
    d = load(spark, sf_dir, "documents")
    staged = d.select(tokens("text").alias("ws"))
    pairs = staged.select(
        F.explode(
            F.when(F.size("ws") >= 2,
                   F.zip_with(F.slice("ws", 1, F.size("ws") - 1),
                              F.slice("ws", 2, F.size("ws")),
                              lambda a, b: F.concat_ws(" ", a, b)))
            .otherwise(F.array().cast("array<string>"))).alias("pair"))
    counts = pairs.groupBy("pair").agg(F.count("*").alias("n"))
    top = counts.orderBy(F.desc("n"), F.asc("pair")).limit(20)
    w = Window.orderBy(F.desc("n"), F.asc("pair"))
    return top.withColumn("rnk", F.row_number().over(w))


ORACLE_SQL["q_bigram_merge_stats"] = """
WITH toks AS (
  SELECT regexp_extract_all(lower(text), '\\w+') AS ws FROM documents
), pairs AS (
  SELECT unnest([ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i AS INTEGER) + 1]
                 for i in range(1, len(ws))]) AS pair
  FROM toks
), counts AS (
  SELECT pair, count(*) AS n FROM pairs GROUP BY pair
), ranked AS (
  SELECT pair, n, row_number() OVER (ORDER BY n DESC, pair ASC) AS rnk
  FROM counts
)
SELECT pair, n, CAST(rnk AS INTEGER) AS rnk FROM ranked WHERE rnk <= 20
"""


@_q("q_embedding_quantize")
def q_embedding_quantize(spark, sf_dir):
    """Symmetric int8 quantization of the embedding column (the storage
    path for ANN indexes at 100 TB: 4× smaller, scale factor per vector).
    round-half-up via floor(x + 0.5) so both engines agree bit-for-bit.
    All float outputs are integer fixed-point: per-ELEMENT doubles are
    bit-identical cross-engine (same IEEE abs/sub/div/mul), so we floor
    each element to an integer BEFORE summing — integer addition is
    associative, making the result immune to reduction-order differences
    (F.aggregate's sequential fold vs DuckDB list_sum), the cause of the
    round-4 hash mismatch."""
    e = load(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    amax = F.array_max(F.transform(vec, F.abs))
    scale = 127.0 / amax
    q = F.transform(vec, lambda v: F.floor(v * scale + 0.5).cast("long"))
    # fixed-point per-element error in 1e-9 units; floor(double) -> LONG
    err_fp = F.aggregate(
        F.zip_with(vec, q,
                   lambda v, qq: F.floor(F.abs(v - qq / scale) * 1e9)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    return e.select(
        "vec_id",
        F.floor(scale * 1e6).cast("long").alias("scale_fp"),
        F.aggregate(q, F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("q_sum"),
        F.array_min(q).alias("q_min"),
        F.array_max(q).alias("q_max"),
        err_fp.alias("recon_err_fp"))


ORACLE_SQL["q_embedding_quantize"] = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
         127.0 / list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                         x -> abs(x))) AS scale
  FROM embeddings
), q AS (
  SELECT vec_id, vec, scale,
         list_transform(vec, x -> CAST(floor(x * scale + 0.5) AS BIGINT)) AS qv
  FROM v
)
SELECT vec_id,
       CAST(floor(scale * 1e6) AS BIGINT) AS scale_fp,
       CAST(list_sum(qv) AS BIGINT) AS q_sum,
       list_min(qv) AS q_min,
       list_max(qv) AS q_max,
       CAST(list_sum(list_transform(range(1, len(vec) + 1),
                     i -> CAST(floor(abs(vec[CAST(i AS INTEGER)]
                                         - qv[CAST(i AS INTEGER)] / scale)
                                     * 1e9) AS BIGINT)))
            AS BIGINT) AS recon_err_fp
FROM q
"""


@_q("q_anomaly_zscore")
def q_anomaly_zscore(spark, sf_dir):
    """Volume-anomaly monitor: per (event_type, day) counts z-scored
    against the type's own daily distribution; |z| ≥ 2 flags the days a
    pipeline alert would fire on (feed died / spam burst).  Two partial-agg
    shuffles (daily counts, then per-type moments broadcast back via a
    tiny join); sample standard deviation, matching ``stddev_samp`` in
    any SQL engine."""
    e = load(spark, sf_dir, "events")
    daily = (e.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count("*").alias("n")))
    stats = (daily.groupBy("event_type")
             .agg(F.avg("n").alias("mu"), F.stddev_samp("n").alias("sd")))
    z = F.round(
        F.when(F.col("sd") > 0, (F.col("n") - F.col("mu")) / F.col("sd"))
        .otherwise(F.lit(0.0)), 6)
    # the flag derives from the ROUNDED z so both engines compare the
    # same 6-digit value (an unrounded boundary compare could flip on
    # reassociation noise — the q_embedding_quantize lesson)
    return (daily.join(F.broadcast(stats), "event_type")
            .select("event_type", "day", "n",
                    z.alias("zscore"),
                    (F.abs(z) >= 2).alias("is_anomaly")))


ORACLE_SQL["q_anomaly_zscore"] = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sd
  FROM daily GROUP BY event_type
)
SELECT daily.event_type, day, n,
       round(CASE WHEN sd > 0 THEN (n - mu) / sd ELSE 0.0 END, 6) AS zscore,
       abs(round(CASE WHEN sd > 0 THEN (n - mu) / sd ELSE 0.0 END, 6)) >= 2
         AS is_anomaly
FROM daily JOIN stats USING (event_type)
"""


@_q("q_event_cooccurrence")
def q_event_cooccurrence(spark, sf_dir):
    """Market-basket co-occurrence: for every unordered pair of event
    types, how many users did both.  The per-user type set is collected
    once (bounded domain) and pairs explode IN-ROW from the sorted set —
    the scale-safe formulation that replaces the (user,type)⋈(user,type)
    self-join whose shuffle is quadratic in per-user activity.  The
    DuckDB oracle states the same result relationally (a self-join is
    fine at oracle scale)."""
    e = load(spark, sf_dir, "events")
    sets = (e.groupBy("user_id")
            .agg(F.array_sort(F.collect_set("event_type")).alias("ts_")))
    arr = F.col("ts_")
    m = F.size(arr)
    pair_arr = F.flatten(F.transform(
        F.sequence(F.lit(1), m - 1),
        lambda i: F.transform(
            F.slice(arr, i + 1, m),
            lambda b: F.struct(F.element_at(arr, i).alias("type_a"),
                               b.alias("type_b")))))
    return (sets.filter(m >= 2)
            .select(F.explode(pair_arr).alias("p"))
            .select("p.type_a", "p.type_b")
            .groupBy("type_a", "type_b")
            .agg(F.count("*").alias("n_users")))


ORACLE_SQL["q_event_cooccurrence"] = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*) AS n_users
FROM ut a JOIN ut b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
"""


@_q("q_cdc_apply_latest")
def q_cdc_apply_latest(spark, sf_dir):
    """CDC apply: collapse a change log to final table state — keep each
    key's LATEST record, then drop keys whose latest operation is a
    delete (here: event_type 'error' plays the delete marker).  The
    Debezium/Delta-CDF consumption pattern as one key-partitioned window;
    the same shape `merge_upsert` writes incrementally, expressed as a
    pure query over the full log."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id"))
    latest = (e.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") == 1))
    return (latest.filter(F.col("event_type") != "error")
            .select("user_id",
                    F.col("event_type").alias("last_op"),
                    F.col("ts").alias("last_ts"),
                    F.round("value", 2).alias("last_value")))


ORACLE_SQL["q_cdc_apply_latest"] = """
WITH ranked AS (
  SELECT user_id, event_type, ts, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id,
       event_type AS last_op,
       ts AS last_ts,
       round(value, 2) AS last_value
FROM ranked WHERE rn = 1 AND event_type <> 'error'
"""


@_q("q_weekly_active_users")
def q_weekly_active_users(spark, sf_dir):
    """Rolling 7-day active users per day (WAU curve): each (user, active
    day) pair contributes to the 7 calendar days it keeps the user
    "active", via an in-row 7-day explode → distinct-count — the
    scale-safe formulation (a bounded 7× row expansion and ONE distinct
    aggregate; never a per-day self-join or a global range window).  Days
    beyond the observed maximum are clipped so the curve ends at the data."""
    e = load(spark, sf_dir, "events")
    active = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    max_day = active.agg(F.max("day")).head()[0]  # scalar
    if max_day is None:
        return spark.createDataFrame([], "day date, wau bigint")
    contrib = active.select(
        "user_id",
        F.explode(F.sequence(
            F.col("day"),
            F.least(F.date_add(F.col("day"), 6), F.lit(max_day))))
        .alias("day"))
    return (contrib.groupBy("day")
            .agg(F.countDistinct("user_id").alias("wau")))


ORACLE_SQL["q_weekly_active_users"] = """
WITH active AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), m AS (
  SELECT max(day) AS max_day FROM active
), contrib AS (
  SELECT user_id, unnest(generate_series(day, least(day + 6, max_day),
                                         INTERVAL 1 DAY)) AS day
  FROM active, m
)
SELECT CAST(day AS DATE) AS day, count(DISTINCT user_id) AS wau
FROM contrib GROUP BY 1
"""


@_q("q_peak_concurrency")
def q_peak_concurrency(spark, sf_dir):
    """Peak concurrent sessions per day via the SWEEP-LINE pattern: each
    session contributes (+1 at start, -1 at end) deltas, a running sum
    over the day's ordered deltas is the concurrency curve, and its max is
    the answer — the scale-safe alternative to the O(n²) interval
    self-join ('count intervals overlapping each interval').  Sessions are
    30-minute-gap per-user spans, clipped to their start day so the sweep
    partitions cleanly by day (one window shuffle keyed by day, never a
    global ordering).  Tie rule: ends sort before starts at equal
    timestamps, so back-to-back sessions do not double-count."""
    from ..catalog import epoch_seconds as ep
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.when(
        (ep(F.col("ts")) - F.lag(ep(F.col("ts")), 1).over(w)) > 1800,
        1).otherwise(0)
    cum = (Window.partitionBy("user_id").orderBy("ts", "event_id")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    sess = (e.withColumn("new_s", gap)
            .withColumn("seq", F.sum("new_s").over(cum))
            .groupBy("user_id", "seq")
            .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end")))
    deltas = (sess.select(F.to_date("s_start").alias("day"),
                          ep(F.col("s_start")).alias("t"),
                          F.lit(1).alias("delta"))
              .unionByName(
                  sess.select(F.to_date("s_start").alias("day"),
                              ep(F.col("s_end")).alias("t"),
                              F.lit(-1).alias("delta"))))
    sweep = (Window.partitionBy("day").orderBy("t", "delta")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    curve = deltas.withColumn("conc", F.sum("delta").over(sweep))
    return (curve.groupBy("day")
            .agg(F.max("conc").cast("int").alias("peak_concurrency")))


ORACLE_SQL["q_peak_concurrency"] = """
WITH g AS (
  -- floor(epoch(.)): Spark's epoch_seconds is integer-second wall-clock
  -- arithmetic; DuckDB epoch() is fractional — truncate identically or
  -- sub-second data orders the sweep differently across engines
  SELECT user_id, ts, event_id,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                   - lag(CAST(floor(epoch(ts)) AS BIGINT), 1)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events
), s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS seq
  FROM g
), sess AS (
  SELECT user_id, min(ts) AS s_start, max(ts) AS s_end
  FROM s GROUP BY user_id, seq
), deltas AS (
  SELECT CAST(s_start AS DATE) AS day,
         CAST(floor(epoch(s_start)) AS BIGINT) AS t, 1 AS delta
  FROM sess
  UNION ALL
  SELECT CAST(s_start AS DATE) AS day,
         CAST(floor(epoch(s_end)) AS BIGINT) AS t, -1 AS delta
  FROM sess
), curve AS (
  SELECT day,
         sum(delta) OVER (PARTITION BY day ORDER BY t, delta
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS conc
  FROM deltas
)
SELECT day, CAST(max(conc) AS INTEGER) AS peak_concurrency
FROM curve GROUP BY day
"""


@_q("q_length_histogram")
def q_length_histogram(spark, sf_dir):
    """Per-source document-length histogram (200-char buckets, top-capped
    at bucket 10) — the size-distribution profile a curation run reports
    per provider.  Pure floor-division bucketing (identical arithmetic in
    any engine; ``width_bucket`` is not portable), one partial-agg
    shuffle."""
    d = load(spark, sf_dir, "documents")
    bucket = F.least(F.floor(F.length("text") / 200) + 1, F.lit(10)) \
        .cast("int")
    return (d.groupBy("source", bucket.alias("len_bucket"))
            .agg(F.count("*").alias("n_docs")))


ORACLE_SQL["q_length_histogram"] = """
SELECT source,
       CAST(least(floor(length(text) / 200) + 1, 10) AS INTEGER)
         AS len_bucket,
       count(*) AS n_docs
FROM documents GROUP BY 1, 2
"""


@_q("q_first_touch_attribution")
def q_first_touch_attribution(spark, sf_dir):
    """First-touch attribution: each purchase is 'viewed' when the user's
    FIRST view precedes it, else 'organic' — the standard marketing
    attribution split, as one per-user min aggregate joined back to the
    purchase stream (no window over the full event log)."""
    e = load(spark, sf_dir, "events")
    views = (e.filter(F.col("event_type") == "view")
             .groupBy("user_id").agg(F.min("ts").alias("first_view")))
    pur = e.filter(F.col("event_type") == "purchase")
    attributed = F.when(F.col("first_view") <= F.col("ts"),
                        "viewed").otherwise("organic")
    return (pur.join(views, "user_id", "left")
            .groupBy(attributed.alias("attribution"))
            .agg(F.count("*").alias("n_purchases"),
                 F.round(F.sum("value"), 2).alias("revenue")))


ORACLE_SQL["q_first_touch_attribution"] = """
WITH v AS (
  SELECT user_id, min(ts) AS first_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), p AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT CASE WHEN first_view <= ts THEN 'viewed' ELSE 'organic' END
         AS attribution,
       count(*) AS n_purchases,
       round(sum(value), 2) AS revenue
FROM p LEFT JOIN v USING (user_id)
GROUP BY 1
"""


@_q("q_dedup_rate_per_source")
def q_dedup_rate_per_source(spark, sf_dir):
    """Per-source duplication health: how many docs are exact-dup copies
    (same normalized-content fingerprint as an earlier doc corpus-wide) —
    the acceptance metric a data-sourcing team tracks per provider.  One
    fingerprint projection + a window min over the fingerprint key; a doc
    is a 'copy' when it is not its fingerprint's keeper (min doc_id)."""
    d = load(spark, sf_dir, "documents")
    fp = d.select("source", "doc_id", dedup.fingerprint("text").alias("fp"))
    keeper = Window.partitionBy("fp")
    flagged = fp.withColumn(
        "is_copy", (F.col("doc_id") != F.min("doc_id").over(keeper))
        .cast("int"))
    return (flagged.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("is_copy").alias("n_copies"),
                 F.round(F.sum("is_copy") / F.count("*"), 6)
                 .alias("dup_rate")))


ORACLE_SQL["q_dedup_rate_per_source"] = f"""
WITH fp AS (
  SELECT source, doc_id, md5({_NORM_SQL}) AS fp FROM documents
), flagged AS (
  SELECT source,
         CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY fp)
              THEN 1 ELSE 0 END AS is_copy
  FROM fp
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(is_copy) AS BIGINT) AS n_copies,
       round(CAST(sum(is_copy) AS DOUBLE) / count(*), 6) AS dup_rate
FROM flagged GROUP BY source
"""


@_q("q_source_kl_divergence")
def q_source_kl_divergence(spark, sf_dir):
    """Per-source token-distribution drift: KL(P_source ‖ P_corpus) over a
    deterministic support (the corpus's 50 most frequent tokens) — the
    mixture-QA statistic a training pipeline watches to catch a source
    whose language suddenly shifts (scraper broke, spam influx).

    Scale shape: the support is a top-50 ``orderBy+limit``
    (TakeOrderedAndProject) that then BROADCASTS; the token stream joins
    against it (map-side filter), so the only full shuffles are the two
    hash aggregations.  Support restriction also makes KL well-defined
    (every support token has corpus mass; a source missing one contributes
    its 0·ln0 = 0 limit by construction of the inner join)."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(tokens("text")).alias("t"))
    corpus = tok.groupBy("t").agg(F.count("*").alias("nc"))
    top = corpus.orderBy(F.desc("nc"), F.asc("t")).limit(50)
    tot = top.agg(F.sum("nc")).head()[0]  # scalar, support-sized
    if tot is None:  # empty/all-null corpus: no support, no divergence
        return spark.createDataFrame(
            [], "source string, n_support_tokens bigint, "
                "kl_divergence double")
    st = (tok.join(F.broadcast(top.select("t")), "t")
          .groupBy("source", "t").agg(F.count("*").alias("ns")))
    stot = st.groupBy("source").agg(F.sum("ns").alias("s_tot"))
    terms = (st.join(stot, "source").join(F.broadcast(top), "t")
             .select("source",
                     ((F.col("ns") / F.col("s_tot"))
                      * F.log((F.col("ns") / F.col("s_tot"))
                              / (F.col("nc") / F.lit(float(tot)))))
                     .alias("kl_term")))
    return (terms.groupBy("source")
            .agg(F.count("*").alias("n_support_tokens"),
                 F.round(F.sum("kl_term"), 6).alias("kl_divergence")))


ORACLE_SQL["q_source_kl_divergence"] = """
WITH tok AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '\\w+')) AS t
  FROM documents
), corpus AS (
  SELECT t, count(*) AS nc FROM tok GROUP BY t
), top AS (
  SELECT t, nc FROM corpus ORDER BY nc DESC, t ASC LIMIT 50
), ct AS (
  SELECT CAST(sum(nc) AS DOUBLE) AS tot FROM top
), st AS (
  SELECT source, tok.t, count(*) AS ns
  FROM tok JOIN top ON tok.t = top.t GROUP BY 1, 2
), stot AS (
  SELECT source, CAST(sum(ns) AS DOUBLE) AS s_tot FROM st GROUP BY source
), terms AS (
  SELECT st.source,
         (CAST(ns AS DOUBLE) / s_tot)
           * ln((CAST(ns AS DOUBLE) / s_tot) / (CAST(nc AS DOUBLE) / tot))
           AS kl_term
  FROM st JOIN stot USING (source) JOIN top ON st.t = top.t, ct
)
SELECT source,
       count(*) AS n_support_tokens,
       round(sum(kl_term), 6) AS kl_divergence
FROM terms GROUP BY source
"""


@_q("q_ngram_contamination")
def q_ngram_contamination(spark, sf_dir):
    """Benchmark decontamination: flag training documents sharing 5-gram
    word shingles with an evaluation set (docs with doc_id < 20 stand in
    for the benchmark).  The standard n-gram-overlap contamination check
    every LLM data pipeline runs before training (GPT-3 appendix C /
    PaLM-style 'dirty' document detection — public-paper methodology).

    Scale shape: the eval side collapses to DISTINCT shingles (benchmark
    sets are tiny vs the corpus) and BROADCASTS; the train side explodes
    shingles ONCE — carrying the per-doc shingle total through the explode
    so no second shingling pass computes it — and hash-joins against the
    broadcast; the corpus never shuffles, and the per-doc overlap count
    aggregates map-side.  A repartition guard spreads a single-split
    source across cores (shingling is CPU-bound per doc; measured 8.4s ->
    ~1s at sf0.1, one task vs 32 — a no-op at real scale where the input
    already has >= parallelism splits).  Output is one row per
    contaminated doc: overlap count, shingle total, contamination rate."""
    from ..functions.textfns import shingles_of
    d = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = d.select("doc_id", tokens("text").alias("_ws"))
    # explode_OUTER everywhere, deliberately: a plain explode makes Catalyst
    # infer `size(_sh) > 0` (InferFiltersFromGenerate) and push it below the
    # repartition exchange with the WHOLE shingle expression inlined —
    # recomputing the 3s shingle pass on the unspread 1-task map side.
    # explode_outer infers nothing; the empty-doc null-g rows die in the
    # inner equi-join (NULL never equals), so the result is identical.
    sh = toks.select(
        "doc_id",
        F.array_distinct(F.coalesce(shingles_of(F.col("_ws"), 5),
                                    F.array().cast("array<string>")))
        .alias("_sh"))
    eval_sh = (sh.filter(F.col("doc_id") < 20)
               .select(F.explode_outer("_sh").alias("g"))
               .filter(F.col("g").isNotNull()).distinct())
    train_ex = (sh.filter(F.col("doc_id") >= 20)
                .select("doc_id", F.size("_sh").alias("n_grams"),
                        F.explode_outer("_sh").alias("g")))
    return (train_ex.join(F.broadcast(eval_sh), "g")
            .groupBy("doc_id", "n_grams")
            .agg(F.count("*").alias("n_overlap"))
            .select("doc_id", "n_overlap", "n_grams",
                    F.round(F.col("n_overlap") / F.col("n_grams"), 6)
                    .alias("contam_rate")))


ORACLE_SQL["q_ngram_contamination"] = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ws
  FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct([ws[CAST(i AS INTEGER)] || ' '
                        || ws[CAST(i AS INTEGER) + 1] || ' '
                        || ws[CAST(i AS INTEGER) + 2] || ' '
                        || ws[CAST(i AS INTEGER) + 3] || ' '
                        || ws[CAST(i AS INTEGER) + 4]
                        for i in range(1, len(ws) - 3)]) AS sh
  FROM toks WHERE len(ws) >= 5
), eval_sh AS (
  SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id < 20
), train AS (
  SELECT doc_id, sh FROM sh WHERE doc_id >= 20
), hits AS (
  SELECT t.doc_id, count(*) AS n_overlap
  FROM (SELECT doc_id, unnest(sh) AS g FROM train) t
  JOIN eval_sh USING (g)
  GROUP BY t.doc_id
)
SELECT train.doc_id,
       n_overlap,
       len(train.sh) AS n_grams,
       round(CAST(n_overlap AS DOUBLE) / len(train.sh), 6) AS contam_rate
FROM hits JOIN train USING (doc_id)
"""


@_q("q_scd2_user_state")
def q_scd2_user_state(spark, sf_dir):
    """SCD2 (type-2 slowly-changing dimension) build from the event log:
    per user, the validity interval of each event_type "state" — valid_from
    = the event, valid_to = the next event's time (NULL while current).
    One window shuffle on the natural key; the same shape maintains any
    dimension table from a mutation stream (the reference's config table
    IS such a validity-interval table, CSV-maintained by hand)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (e.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts", 1).over(w).alias("valid_to"),
        F.col("event_id"))
        .withColumn("is_current",
                    F.when(F.col("valid_to").isNull(), 1).otherwise(0)))


ORACLE_SQL["q_scd2_user_state"] = """
SELECT user_id,
       event_type AS state,
       ts AS valid_from,
       lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       event_id,
       CASE WHEN lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL THEN 1 ELSE 0 END AS is_current
FROM events
"""


@_q("q_hybrid_rrf")
def q_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval: BM25 lexical arm + embedding-cosine semantic arm
    (query-by-example: vector 0), fused by reciprocal rank (k=60) — the
    standard lexical+vector fusion a retrieval-backed corpus slicer runs.
    Both arms rank on rounded scores with id tie-breaks, so fusion is
    deterministic cross-engine."""
    from ..operators.ranking import bm25_scores, rrf_fuse
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    lex = bm25_scores(d, "doc_id", "text",
                      query_terms=["spark", "shuffle", "partition"],
                      top_n=50).select("doc_id", F.col("rnk").alias("r_lex"))
    sem = (similarity.brute_force_topk(e, e.filter(F.col("vec_id") == 0),
                                       k=50)
           .select(F.col("neighbor_id").alias("doc_id"),
                   F.col("rnk").alias("r_sem")))
    return rrf_fuse(lex, sem, "doc_id", rank_a="r_lex", rank_b="r_sem",
                    k=60, top_n=10)


ORACLE_SQL["q_hybrid_rrf"] = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS term
  FROM documents
), lens AS (
  SELECT doc_id, len(regexp_extract_all(lower(text), '\\w+')) AS dl
  FROM documents
), stats AS (
  SELECT (SELECT count(DISTINCT doc_id) FROM documents) AS n_docs,
         (SELECT avg(dl) FROM lens) AS avg_len
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ('spark', 'shuffle', 'partition') GROUP BY 1, 2
), idf AS (
  SELECT term, ln(1.0 + (stats.n_docs - count(DISTINCT doc_id) + 0.5)
                  / (count(DISTINCT doc_id) + 0.5)) AS idf
  FROM tf, stats GROUP BY term, stats.n_docs
), contrib AS (
  SELECT tf.doc_id,
         idf.idf * tf.tf * (1.2 + 1.0)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * lens.dl / stats.avg_len)) AS c
  FROM tf JOIN idf USING (term) JOIN lens USING (doc_id), stats
), lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS r_lex
  FROM (SELECT doc_id, round(sum(c), 6) AS bm25 FROM contrib GROUP BY doc_id)
  QUALIFY r_lex <= 50
), sem AS (
  SELECT neighbor_id AS doc_id,
         row_number() OVER (ORDER BY cosine_sim DESC, neighbor_id ASC) AS r_sem
  FROM (
    SELECT c.vec_id AS neighbor_id,
           round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                        CAST(c.embedding AS DOUBLE[])), 6)
             AS cosine_sim
    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
    WHERE q.vec_id = 0
  )
  QUALIFY r_sem <= 50
), fused AS (
  SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
         round(coalesce(1.0 / (60 + r_lex), 0.0)
               + coalesce(1.0 / (60 + r_sem), 0.0), 9) AS rrf,
         r_lex, r_sem
  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS rnk
  FROM fused
)
SELECT doc_id, rrf, r_lex, r_sem, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 10
"""


def _lsh_ann_oracle_sql(n_queries: int = 10, k: int = 5,
                        n_planes: int = 4, n_tables: int = 8,
                        dim: int = 64, seed: int = 42) -> str:
    """Generate the DuckDB mirror of ``lsh_ann_topk``: the SAME seeded
    hyperplane constants (``repr`` round-trips each double exactly), the
    same sign-bit buckets, OR-construction across tables, and the same
    rounded-cosine ranking.  A sign can only disagree across engines if a
    dot product lands within ~1e-13 of zero (summation-order noise) —
    probability ~0 on continuous data, so candidate sets agree."""
    from ..operators.similarity import _hyperplanes
    tables = [_hyperplanes(dim, n_planes, seed + 1013 * t)
              for t in range(n_tables)]

    def bucket_expr(alias: str, planes) -> str:
        bits = " + ".join(
            "(CASE WHEN list_dot_product({a}.v, [{lit}]) >= 0 "
            "THEN {w} ELSE 0 END)".format(
                a=alias, w=1 << i,
                lit=", ".join(repr(x) for x in p))
            for i, p in enumerate(planes))
        return f"({bits})"

    q_buckets = [bucket_expr("q", t) for t in tables]
    c_buckets = [bucket_expr("c", t) for t in tables]
    any_match = " OR ".join(f"{qb} = {cb}"
                            for qb, cb in zip(q_buckets, c_buckets))
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.v, c.v), 6) AS cosine_sim
  FROM v q JOIN v c ON q.vec_id < {n_queries} AND q.vec_id <> c.vec_id
   AND ({any_match})
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC) AS rnk
  FROM pairs
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= {k}
"""


ORACLE_SQL["q_ann_lsh_topk"] = _lsh_ann_oracle_sql()


@_q("q_fuzzy_match_keys")
def q_fuzzy_match_keys(spark, sf_dir):
    """Fuzzy key matching via edit distance over a bounded candidate block
    (the record-linkage shape: block first, then exact Levenshtein on the
    survivors — never all-pairs at corpus scale).  Prefixes keep the work
    bounded and deterministic."""
    d = (load(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
         .select("doc_id", F.substring("text", 1, 20).alias("key")))
    a, b = d.alias("a"), d.alias("b")
    return (a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("id_a"),
                    F.col("b.doc_id").alias("id_b"),
                    F.levenshtein("a.key", "b.key").alias("edit_dist"))
            .filter(F.col("edit_dist") <= 12))


ORACLE_SQL["q_fuzzy_match_keys"] = """
WITH k AS (
  SELECT doc_id, substring(text, 1, 20) AS key
  FROM documents WHERE doc_id < 30
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.key, b.key) AS INTEGER) AS edit_dist
FROM k a JOIN k b ON a.doc_id < b.doc_id
WHERE levenshtein(a.key, b.key) <= 12
"""


@_q("q_json_path_extract")
def q_json_path_extract(spark, sf_dir):
    """JSON path extraction from the event props column
    (``get_json_object`` — the schemaless probe, vs ``from_json``'s typed
    parse covered by q_from_json_struct) with per-type stats."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (e.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("k").alias("k_sum"),
                 F.min("k").alias("k_min"),
                 F.max("k").alias("k_max")))


ORACLE_SQL["q_json_path_extract"] = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
FROM events GROUP BY event_type
"""


@_q("q_dedup_keep_best")
def q_dedup_keep_best(spark, sf_dir):
    """The dedup DECISION step: within each duplicate cluster (connected
    components over the near-dup graph), keep the highest-quality copy
    (lexical diversity = distinct-token count; doc_id tie-break) instead
    of the arbitrary smallest-id — what a real corpus clean actually ships.
    Components + one window over cluster-sized groups."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    sets = d.select("doc_id", F.array_distinct(tokens("text")).alias("ws"))
    a, b = sets.alias("a"), sets.alias("b")
    inter = F.size(F.array_intersect(F.col("a.ws"), F.col("b.ws"))).cast("long")
    union = F.size(F.array_union(F.col("a.ws"), F.col("b.ws"))).cast("long")
    edges = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"))
        .where(F.round(inter / union, 4) >= 0.8)
    )
    comp = dedup.connected_components(edges, d.select("doc_id"),
                                      id_col="doc_id")
    quality = sets.select("doc_id", F.size("ws").alias("quality"))
    w = Window.partitionBy("component").orderBy(F.desc("quality"),
                                                F.asc("doc_id"))
    return (comp.join(quality, "doc_id")
            .withColumn("pick", F.row_number().over(w))
            .select("doc_id", "component", "quality",
                    (F.col("pick") == 1).alias("is_kept")))


ORACLE_SQL["q_dedup_keep_best"] = """
WITH RECURSIVE sets AS (
  SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '\\w+')) AS ws
  FROM documents WHERE doc_id < 30
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(list_filter(a.ws, x -> list_contains(b.ws, x))) AS BIGINT) AS n_common,
         CAST(len(a.ws) + len(b.ws) AS BIGINT) AS n_total
  FROM sets a JOIN sets b ON a.doc_id < b.doc_id
), edges AS (
  SELECT id_a, id_b FROM pairs
  WHERE round(CAST(n_common AS DOUBLE) / (n_total - n_common), 4) >= 0.8
), bi AS (
  SELECT id_a AS s, id_b AS d FROM edges
  UNION ALL SELECT id_b, id_a FROM edges
), reach(id, r) AS (
  SELECT doc_id, doc_id FROM sets
  UNION
  SELECT bi.d, reach.r FROM reach JOIN bi ON bi.s = reach.id
), comp AS (
  SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id
), q AS (
  SELECT doc_id, CAST(len(ws) AS INTEGER) AS quality FROM sets
)
SELECT comp.doc_id, component, quality,
       row_number() OVER (PARTITION BY component
                          ORDER BY quality DESC, comp.doc_id ASC) = 1 AS is_kept
FROM comp JOIN q ON comp.doc_id = q.doc_id
"""


@_q("q_weighted_sample")
def q_weighted_sample(spark, sf_dir):
    """Deterministic quality-weighted sampling: keep each doc with
    probability proportional to its lexical diversity, decided by a
    portable md5 hash of the doc id — reproducible across engines, runs,
    and partitionings (the property corpus-mixture work needs; a seeded
    ``sample()`` is partitioning-dependent).  Pure projection: no shuffle."""
    d = load(spark, sf_dir, "documents")
    quality = F.size(F.array_distinct(tokens("text")))
    # uniform u in [0,1) from the first 8 md5 hex chars of the id
    u = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16, 10).cast("double") / F.lit(float(1 << 32)))
    keep = u < (quality / 200.0)
    return (d.select("doc_id", "source", quality.alias("quality"),
                     F.round(u, 9).alias("u"), keep.alias("kept"))
            .filter("kept"))


ORACLE_SQL["q_weighted_sample"] = """
WITH q AS (
  SELECT doc_id, source,
         CAST(len(list_distinct(regexp_extract_all(lower(text), '\\w+')))
              AS INTEGER) AS quality,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM documents
)
SELECT doc_id, source, quality, round(u, 9) AS u, u < quality / 200.0 AS kept
FROM q WHERE u < quality / 200.0
"""


@_q("q_mixture_resample")
def q_mixture_resample(spark, sf_dir):
    """Corpus mixture balancing: compute each source's share, derive the
    per-source keep-rate that flattens the mixture to the smallest
    source's size, and apply it with the same deterministic md5 coin —
    the domain-rebalancing step of training-data curation.  One tiny agg
    (|sources| rows, broadcast back); the data pass is a projection."""
    d = load(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(F.count("*").alias("n_src"))
    min_n = per_src.agg(F.min("n_src")).head()[0]  # scalar, config-scale
    if min_n is None:  # empty corpus: nothing to rebalance
        return spark.createDataFrame(
            [], "source string, n_kept bigint, keep_rate double")
    rates = per_src.withColumn("keep_rate",
                               F.lit(float(min_n)) / F.col("n_src"))
    u = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16, 10).cast("double") / F.lit(float(1 << 32)))
    kept = (d.join(F.broadcast(rates), "source")
            .filter(u < F.col("keep_rate")))
    return (kept.groupBy("source")
            .agg(F.count("*").alias("n_kept"),
                 F.round(F.first("keep_rate"), 9).alias("keep_rate")))


ORACLE_SQL["q_mixture_resample"] = """
WITH per_src AS (
  SELECT source, count(*) AS n_src FROM documents GROUP BY source
), rates AS (
  SELECT source, (SELECT min(n_src) FROM per_src) * 1.0 / n_src AS keep_rate
  FROM per_src
), kept AS (
  SELECT d.source, r.keep_rate FROM documents d JOIN rates r USING (source)
  WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
          / 4294967296.0 < r.keep_rate
)
SELECT source, count(*) AS n_kept, round(keep_rate, 9) AS keep_rate
FROM kept GROUP BY source, keep_rate
"""


@_q("q_quality_quantile_norm")
def q_quality_quantile_norm(spark, sf_dir):
    """Per-source quantile normalization of the quality signal
    (percent_rank within source): makes thresholds comparable across
    sources with different score distributions — the cross-domain filter
    calibration step.  One window shuffle keyed by source."""
    d = load(spark, sf_dir, "documents")
    quality = F.size(F.array_distinct(tokens("text")))
    w = Window.partitionBy("source").orderBy(F.col("quality").asc(),
                                             F.col("doc_id").asc())
    return (d.select("doc_id", "source", quality.alias("quality"))
            .withColumn("q_pct", F.round(F.percent_rank().over(w), 9))
            .filter(F.col("q_pct") >= 0.9))


ORACLE_SQL["q_quality_quantile_norm"] = """
WITH q AS (
  SELECT doc_id, source,
         CAST(len(list_distinct(regexp_extract_all(lower(text), '\\w+')))
              AS INTEGER) AS quality
  FROM documents
), r AS (
  SELECT doc_id, source, quality,
         round(percent_rank() OVER (PARTITION BY source
                                    ORDER BY quality ASC, doc_id ASC),
               9) AS q_pct
  FROM q
)
SELECT doc_id, source, quality, q_pct FROM r WHERE q_pct >= 0.9
"""


@_q("q_minhash_chargram_pairs")
def q_minhash_chargram_pairs(spark, sf_dir):
    """Char-3-gram MinHash-LSH near-dup pairs — the unit for short or
    unsegmented (CJK-like) text.  Verifiable md5 family throughout, so the
    oracle reproduces the whole pipeline; simpler plan than the word
    variant (gram = shingle ⇒ the 32 mins aggregate straight over rows,
    map-side partial, no array reassembly)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return dedup.chargram_minhash_pairs(d, "doc_id", "text",
                                        num_hashes=32, bands=8, n=3,
                                        threshold=0.5)


ORACLE_SQL["q_minhash_chargram_pairs"] = f"""
WITH nt AS (
  SELECT doc_id, {_NORM_SQL} AS t FROM documents WHERE doc_id < 100
), grams AS (
  SELECT doc_id,
         list_distinct([('0x' || substring(md5(substr(t, CAST(i AS INTEGER), 3)),
                                           1, 15))::BIGINT % 2147483647
                        for i in range(1, length(t) - 1)]) AS hs
  FROM nt
), sig AS (
  SELECT doc_id,
         [list_min([(h * (2 * i + 1) + i * 98765431) % 2147483647
                    for h in hs])
          for i in range(0, 32)] AS sig
  FROM grams WHERE len(hs) > 0
), banded AS (
  SELECT doc_id, b,
         ((((sig[CAST(b AS INTEGER) * 4 + 1] * 1000003
             + sig[CAST(b AS INTEGER) * 4 + 2]) % 2147483647) * 1000003
             + sig[CAST(b AS INTEGER) * 4 + 3]) % 2147483647 * 1000003
             + sig[CAST(b AS INTEGER) * 4 + 4]) % 2147483647 AS bh
  FROM sig CROSS JOIN (SELECT unnest(range(0, 8)) AS b)
  QUALIFY count(*) OVER (PARTITION BY b, bh) <= 500
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
  FROM banded a JOIN banded c ON a.b = c.b AND a.bh = c.bh
                             AND a.doc_id < c.doc_id
), gsets AS (
  SELECT doc_id,
         list_distinct([substr(t, CAST(i AS INTEGER), 3)
                        for i in range(1, length(t) - 1)]) AS gs
  FROM nt
), scored AS (
  SELECT id_a, id_b,
         len(list_filter(a.gs, x -> list_contains(b.gs, x))) AS n_inter,
         len(a.gs) + len(b.gs)
           - len(list_filter(a.gs, x -> list_contains(b.gs, x))) AS n_union
  FROM cand JOIN gsets a ON cand.id_a = a.doc_id
            JOIN gsets b ON cand.id_b = b.doc_id
)
SELECT id_a, id_b,
       round(CAST(n_inter AS DOUBLE) / n_union, 4) AS jaccard
FROM scored
WHERE n_union > 0 AND round(CAST(n_inter AS DOUBLE) / n_union, 4) >= 0.5
"""


def _rp_matrix(d_in: int = 64, d_out: int = 8, seed: int = 7):
    """Seeded Gaussian random-projection matrix, rounded like the LSH
    planes so both engines parse identical double literals."""
    import numpy as np
    rng = np.random.RandomState(seed)
    return rng.standard_normal((d_out, d_in)).round(6).tolist()


@_q("q_random_projection")
def q_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss dimensionality reduction: project the 64-dim
    embeddings to 8 dims through a seeded Gaussian matrix (literals in the
    plan — no model object, no UDF), output rounded components as scalar
    columns.  The storage/compute shrink step before ANN at 100 TB; same
    verifiability trick as the LSH planes."""
    from ..functions.vectors import dot
    e = load(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    rows = _rp_matrix()
    cols = [F.round(dot(vec, F.array(*[F.lit(x) for x in r])), 6)
             .alias(f"p{j}") for j, r in enumerate(rows)]
    return e.select("vec_id", *cols)


def _rp_oracle_sql() -> str:
    rows = _rp_matrix()
    comps = ",\n       ".join(
        "round(list_dot_product(CAST(embedding AS DOUBLE[]), [{lit}]), 6) AS p{j}"
        .format(lit=", ".join(repr(x) for x in r), j=j)
        for j, r in enumerate(rows))
    return f"SELECT vec_id,\n       {comps}\nFROM embeddings"


ORACLE_SQL["q_random_projection"] = _rp_oracle_sql()


@_q("q_time_weighted_avg")
def q_time_weighted_avg(spark, sf_dir):
    """Time-weighted average of the event value per user (irregularly
    sampled series: each value holds until the next event, weighted by its
    holding interval) — the correct aggregate for sampled gauges, where a
    plain avg over-weights bursts.  One window shuffle on the series key."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact epochs: Spark's cast-to-long truncates to whole
    # seconds while DuckDB's epoch() keeps fractions — unix_micros vs
    # epoch_us agree exactly (NTZ -> LTZ first; offsets cancel in diffs)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    nxt = F.lead(us, 1).over(w)
    holds = (e.select("user_id", "ts", "event_id", "value",
                      (nxt - us).alias("dur"))
             .filter(F.col("dur").isNotNull()))
    return (holds.groupBy("user_id")
            .agg(F.round(F.sum(F.col("value") * F.col("dur"))
                         / F.sum("dur"), 6).alias("twa"),
                 F.sum("dur").cast("long").alias("span_us"),
                 F.count("*").alias("n_intervals")))


ORACLE_SQL["q_time_weighted_avg"] = """
WITH holds AS (
  SELECT user_id, value,
         lead(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - epoch_us(ts) AS dur
  FROM events
)
SELECT user_id,
       round(sum(value * dur) / sum(dur), 6) AS twa,
       CAST(sum(dur) AS BIGINT) AS span_us,
       count(*) AS n_intervals
FROM holds WHERE dur IS NOT NULL
GROUP BY user_id
"""


@_q("q_token_entropy")
def q_token_entropy(spark, sf_dir):
    """Unigram entropy per document (-Σ p·ln p over the token frequency
    distribution) — the information-density quality signal: boilerplate
    and keyboard-mash both score low.  explode → (doc, term) counts →
    per-doc entropy in one more partial agg; all log math in doubles with
    the usual round-before-compare contract."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    tot = tf.groupBy("doc_id").agg(F.sum("c").alias("n"))
    return (tf.join(tot, "doc_id")
            .groupBy("doc_id")
            .agg(F.round(-F.sum((F.col("c") / F.col("n"))
                                * F.log(F.col("c") / F.col("n"))), 6)
                 .alias("entropy"),
                 F.first("n").cast("long").alias("n_tokens"),
                 F.count("*").alias("n_distinct")))


ORACLE_SQL["q_token_entropy"] = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS c FROM tok GROUP BY 1, 2
), tot AS (
  SELECT doc_id, sum(c) AS n FROM tf GROUP BY doc_id
)
SELECT tf.doc_id,
       round(-sum((c * 1.0 / n) * ln(c * 1.0 / n)), 6) AS entropy,
       CAST(min(n) AS BIGINT) AS n_tokens,
       count(*) AS n_distinct
FROM tf JOIN tot ON tf.doc_id = tot.doc_id
GROUP BY tf.doc_id
"""


@_q("q_zipf_slope")
def q_zipf_slope(spark, sf_dir):
    """Zipf slope per source: OLS slope of ln(freq) on ln(rank) over the
    top-50 terms (natural corpora ≈ -1; synthetic/templated text
    deviates) — a corpus-level QA fingerprint.  Rank via per-source
    window over the small per-source vocabularies, then ``regr_slope``."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(tokens("text")).alias("term"))
    freq = tok.groupBy("source", "term").agg(F.count("*").alias("c"))
    w = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("term"))
    ranked = (freq.withColumn("rnk", F.row_number().over(w))
              .filter(F.col("rnk") <= 50))
    return (ranked.groupBy("source")
            .agg(F.round(F.regr_slope(F.log("c"), F.log("rnk")), 6)
                 .alias("zipf_slope"),
                 F.count("*").alias("n_terms")))


ORACLE_SQL["q_zipf_slope"] = """
WITH tok AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '\\w+')) AS term
  FROM documents
), freq AS (
  SELECT source, term, count(*) AS c FROM tok GROUP BY 1, 2
), ranked AS (
  SELECT source, c,
         row_number() OVER (PARTITION BY source
                            ORDER BY c DESC, term ASC) AS rnk
  FROM freq QUALIFY rnk <= 50
)
SELECT source,
       round(regr_slope(ln(c), ln(rnk)), 6) AS zipf_slope,
       count(*) AS n_terms
FROM ranked GROUP BY source
"""


@_q("q_event_transitions")
def q_event_transitions(spark, sf_dir):
    """First-order Markov transition counts over per-user event sequences
    (lag window on the series key, then count per (prev, next) pair with
    row-probability) — the behavioral-sequence summary recommendation /
    anomaly work starts from.  One window shuffle + one partial agg."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (e.select("user_id", "event_type",
                    F.lag("event_type", 1).over(w).alias("prev_type"))
           .filter(F.col("prev_type").isNotNull()))
    counts = (seq.groupBy("prev_type", "event_type")
              .agg(F.count("*").alias("n")))
    tot = counts.groupBy("prev_type").agg(F.sum("n").alias("n_from"))
    return (counts.join(tot, "prev_type")
            .select("prev_type", F.col("event_type").alias("next_type"), "n",
                    F.round(F.col("n") / F.col("n_from"), 6).alias("p")))


ORACLE_SQL["q_event_transitions"] = """
WITH seq AS (
  SELECT event_type,
         lag(event_type, 1) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS prev_type
  FROM events
), counts AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
), tot AS (
  SELECT prev_type, CAST(sum(n) AS BIGINT) AS n_from FROM counts GROUP BY 1
)
SELECT c.prev_type, next_type, n, round(n * 1.0 / n_from, 6) AS p
FROM counts c JOIN tot USING (prev_type)
"""


@_q("q_label_centroid_quality")
def q_label_centroid_quality(spark, sf_dir):
    """Label-quality cartography over the embedding corpus: per label, the
    element-wise mean centroid, the cohesion (mean cosine of members to
    their own centroid) and the assignment purity (fraction of members
    whose NEAREST centroid is their own label) — the standard
    mislabeled-data / cluster-health screen run before training on a
    labeled corpus.

    Scale shape: the centroid is a dimension-exploded aggregate
    (posexplode -> groupBy(label, pos) -> avg -> re-assemble), so the mean
    is a partial-agg shuffle of (label, dim) cells — never a
    collect_list of vectors; the 10-row centroid table broadcasts back and
    both the cohesion dot products and the 10-way nearest-centroid scan
    are in-row HOF arithmetic.  At 100 TB only label-cardinality x dim
    data ever leaves the executors."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v"))
    dims = e.select("label", F.posexplode("v").alias("pos", "x"))
    cent = (dims.groupBy("label", "pos").agg(F.avg("x").alias("m"))
            .groupBy(F.col("label").alias("clabel"))
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"]).alias("c")))

    def cos(a, b):
        d = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                        F.lit(0.0), lambda acc, x: acc + x)
        na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                                F.lit(0.0), lambda acc, x: acc + x))
        nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x),
                                F.lit(0.0), lambda acc, x: acc + x))
        return d / (na * nb)

    scored = (e.join(F.broadcast(cent))
              .select("vec_id", "label", "clabel",
                      cos(F.col("v"), F.col("c")).alias("cs")))
    w = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("clabel"))
    nearest = (scored.withColumn("rk", F.row_number().over(w))
               .filter(F.col("rk") == 1)
               .select("vec_id", F.col("clabel").alias("nearest_label")))
    own = scored.filter(F.col("label") == F.col("clabel"))
    return (own.join(nearest, "vec_id")
            .groupBy("label")
            .agg(F.count("*").alias("n_vecs"),
                 F.round(F.avg("cs"), 4).alias("cohesion"),
                 F.round(F.avg((F.col("nearest_label") == F.col("label"))
                               .cast("double")), 6).alias("purity"))
            .orderBy("label"))


# Mirror: unnest WITH ORDINALITY rebuilds the dimension-exploded centroid;
# cosine and the 10-way nearest scan replay with list_dot_product.  Cosine
# ties across two centroids would need affinities within float noise
# (~1e-13) — probability ~0 on continuous data (same argument as the IVF
# oracle); cohesion is rounded to 4 places to absorb summation-order noise
# in the double mean.
ORACLE_SQL["q_label_centroid_quality"] = """
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), dims AS (
  SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM v
), cent AS (
  SELECT label AS clabel, array_agg(m ORDER BY pos) AS c
  FROM (SELECT label, pos, avg(x) AS m FROM dims GROUP BY 1, 2)
  GROUP BY 1
), scored AS (
  SELECT vec_id, label, clabel,
         list_dot_product(v, c)
           / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(c, c)))
           AS cs
  FROM v CROSS JOIN cent
), nearest AS (
  SELECT vec_id, clabel AS nearest_label
  FROM (SELECT vec_id, clabel,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cs DESC, clabel ASC) AS rk
        FROM scored)
  WHERE rk = 1
)
SELECT s.label, count(*) AS n_vecs,
       round(avg(cs), 4) AS cohesion,
       round(avg(CASE WHEN nearest_label = s.label THEN 1.0 ELSE 0.0 END), 6)
         AS purity
FROM scored s JOIN nearest USING (vec_id)
WHERE s.label = s.clabel
GROUP BY s.label
ORDER BY s.label
"""


@_q("q_soft_dedup_downsample")
def q_soft_dedup_downsample(spark, sf_dir):
    """Inverse-frequency duplicate downsampling ("soft dedup"): instead of
    keeping exactly one copy per duplicate cluster, keep each member with
    probability 1/cluster_size — the expected surviving mass per cluster is
    one document, but WHICH copies survive stays unbiased across sources
    (hard dedup systematically favors whichever copy sorts first).  The
    cluster key is the bag-of-distinct-words fingerprint (md5 of the sorted
    vocabulary), which groups template/boilerplate docs that differ only in
    word order or repetition — the duplicate class where soft dedup beats
    hard dedup.  The coin is the portable md5-of-doc_id uniform used by the
    sampling tier, so the draw is reproducible across engines, runs, and
    partitionings.

    Scale: one fingerprint groupBy for cluster sizes (count-only payload),
    sizes joined back on the fingerprint — the same single keyed shuffle as
    exact dedup; the coin and filter are in-row projections."""
    d = load(spark, sf_dir, "documents")
    fp = F.md5(F.array_join(
        F.array_sort(F.array_distinct(tokens("text"))), " ")).alias("fp")
    sized = d.select("doc_id", "source", fp)
    csize = sized.groupBy("fp").agg(F.count("*").alias("cluster_size"))
    u = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16, 10).cast("double") / F.lit(float(1 << 32)))
    # filter on the UNROUNDED coin, exactly like the oracle's WHERE — a u
    # within 5e-10 below the threshold would round up to it and flip the
    # keep decision between engines if the rounded alias were filtered
    return (sized.join(csize, "fp")
            .withColumn("_u", u)
            .filter(F.col("_u") < 1.0 / F.col("cluster_size"))
            .select("doc_id", "source", "cluster_size",
                    F.round(F.col("_u"), 9).alias("u")))


ORACLE_SQL["q_soft_dedup_downsample"] = f"""
WITH f AS (
  SELECT doc_id, source,
         md5(array_to_string(
             list_sort(list_distinct(regexp_extract_all(lower(text),
                                                        '\\w+'))), ' '))
           AS fp,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM documents
), c AS (
  SELECT fp, count(*) AS cluster_size FROM f GROUP BY 1
)
SELECT doc_id, source, cluster_size, round(u, 9) AS u
FROM f JOIN c USING (fp)
WHERE u < 1.0 / cluster_size
"""


@_q("q_embedding_outliers")
def q_embedding_outliers(spark, sf_dir):
    """Per-label outlier screen — the actionable half of
    ``q_label_centroid_quality``: for every label, the 3 members with the
    LOWEST cosine to their own label centroid (mislabel / noise
    candidates, the rows a data-cleaning pass reviews first).  Per-group
    bottom-k via a rank window partitioned by label — the window sees only
    one label's members per partition, never a global sort.

    Same dimension-exploded centroid build as the quality query (only
    label x dim cells shuffle); cosine is rounded to 6 places BEFORE
    ranking so the rank comparison is on engine-identical values."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v"))
    cent = (e.select("label", F.posexplode("v").alias("pos", "x"))
            .groupBy("label", "pos").agg(F.avg("x").alias("m"))
            .groupBy(F.col("label").alias("clabel"))
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"]).alias("c")))
    dot = F.aggregate(F.zip_with("v", "c", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    nv = F.sqrt(F.aggregate(F.transform("v", lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nc = F.sqrt(F.aggregate(F.transform("c", lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    scored = (e.join(F.broadcast(cent), e.label == F.col("clabel"))
              .select("vec_id", "label",
                      F.round(dot / (nv * nc), 6).alias("cs")))
    w = Window.partitionBy("label").orderBy(F.asc("cs"), F.asc("vec_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 3)
            .select("label", "vec_id", F.col("cs").alias("cosine_to_centroid"),
                    "rnk"))


ORACLE_SQL["q_embedding_outliers"] = """
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), dims AS (
  SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM v
), cent AS (
  SELECT label AS clabel, array_agg(m ORDER BY pos) AS c
  FROM (SELECT label, pos, avg(x) AS m FROM dims GROUP BY 1, 2)
  GROUP BY 1
), scored AS (
  SELECT vec_id, label,
         round(list_dot_product(v, c)
               / (sqrt(list_dot_product(v, v))
                  * sqrt(list_dot_product(c, c))), 6) AS cs
  FROM v JOIN cent ON label = clabel
)
SELECT label, vec_id, cs AS cosine_to_centroid, rnk
FROM (SELECT label, vec_id, cs,
             row_number() OVER (PARTITION BY label
                                ORDER BY cs ASC, vec_id ASC) AS rnk
      FROM scored)
WHERE rnk <= 3
"""


@_q("q_range_join_clicks_after_purchase")
def q_range_join_clicks_after_purchase(spark, sf_dir):
    """Post-purchase engagement window via the BUCKETIZED range join
    (``operators/range_join.py``): each user's clicks inside
    [first_purchase, first_purchase + 48h).  Unlike the broadcast interval
    join (q_join_interval_config, config-scale intervals), this plan works
    when BOTH sides are data-scale: intervals explode into covered hour
    cells, points map to their cell, and the match is a plain (user, cell)
    hash shuffle plus a residual range filter — no broadcast, no
    BroadcastNestedLoopJoin, no cartesian anywhere."""
    from ..operators.range_join import point_in_interval_join
    e = load(spark, sf_dir, "events")
    windows = (e.filter(F.col("event_type") == "purchase")
               .groupBy("user_id")
               .agg(F.min("ts").alias("w_start"))
               .withColumn("w_end",
                           F.col("w_start") + F.expr("INTERVAL 48 HOURS")))
    clicks = (e.filter(F.col("event_type") == "click")
              .select("user_id", "ts", F.col("event_id").alias("click_id")))
    j = point_in_interval_join(clicks, windows, "ts", "w_start", "w_end",
                               keys=["user_id"], bucket=3600)
    return (j.groupBy("user_id")
            .agg(F.count("*").alias("n_clicks"),
                 F.sum("click_id").alias("sum_click_ids")))


ORACLE_SQL["q_range_join_clicks_after_purchase"] = """
WITH fb AS (
  SELECT user_id, min(ts) AS w_start, min(ts) + INTERVAL 48 HOUR AS w_end
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT c.user_id,
       count(*) AS n_clicks,
       CAST(sum(c.event_id) AS BIGINT) AS sum_click_ids
FROM events c JOIN fb ON c.user_id = fb.user_id
 AND c.ts >= fb.w_start AND c.ts < fb.w_end
WHERE c.event_type = 'click'
GROUP BY 1
"""


@_q("q_count_min_heavy_hitters")
def q_count_min_heavy_hitters(spark, sf_dir):
    """Count-Min sketch in *verifiable* mode: a d=4 x w=256 counter matrix
    over the event stream's user_id frequencies (portable md5 hash family
    — the same cross-engine trick as the verifiable MinHash), then the
    top-20 users' true counts vs their CMS estimates.  The sketch
    guarantee ``estimate >= true`` is emitted as the ``overestimate``
    column, so the oracle confirms the one-sided error bound row by row.

    Scale shape: the sketch build is a 4x row explode + ONE (row, bucket)
    groupBy — the counter matrix is d*w cells regardless of stream size,
    and merging sketches across partitions/days is cell-wise addition
    (that is the point of CMS at 100 TB).  The estimate pass joins the
    candidate keys against the 1024-cell broadcast matrix."""
    d_rows, w = 4, 256
    e = load(spark, sf_dir, "events")

    def bucket(i, key_col):
        return F.pmod(
            F.conv(F.substring(
                F.md5(F.concat(F.lit(f"{i}:"), key_col.cast("string"))),
                1, 15), 16, 10).cast("long"),
            F.lit(w))

    hashed = e.select(F.explode(F.array(*[
        F.struct(F.lit(i).alias("r"),
                 bucket(i, F.col("user_id")).alias("b"))
        for i in range(d_rows)])).alias("rb"))
    counters = (hashed.groupBy(F.col("rb.r").alias("r"),
                               F.col("rb.b").alias("b"))
                .agg(F.count("*").alias("c")))
    truth = (e.groupBy("user_id").agg(F.count("*").alias("true_count")))
    probes = truth.select(
        "user_id", "true_count",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("r"),
                     bucket(i, F.col("user_id")).alias("b"))
            for i in range(d_rows)])).alias("rb"))
    est = (probes.join(F.broadcast(counters),
                       (probes.rb.r == counters.r)
                       & (probes.rb.b == counters.b))
           .groupBy("user_id", "true_count")
           .agg(F.min("c").alias("cms_estimate")))
    return (est.select("user_id", "true_count", "cms_estimate",
                       (F.col("cms_estimate") - F.col("true_count"))
                       .alias("overestimate"))
            .orderBy(F.desc("true_count"), "user_id")
            .limit(20))


ORACLE_SQL["q_count_min_heavy_hitters"] = """
WITH hashes AS (
  SELECT user_id, r,
         ('0x' || substring(md5(r || ':' || CAST(user_id AS VARCHAR)),
                            1, 15))::BIGINT % 256 AS b
  FROM events, (SELECT unnest([0, 1, 2, 3]) AS r)
), counters AS (
  SELECT r, b, count(*) AS c FROM hashes GROUP BY 1, 2
), truth AS (
  SELECT user_id, count(*) AS true_count FROM events GROUP BY 1
), probe AS (
  SELECT DISTINCT t.user_id, t.true_count, h.r, h.b
  FROM truth t JOIN hashes h USING (user_id)
), est AS (
  SELECT p.user_id, p.true_count,
         CAST(min(c.c) AS BIGINT) AS cms_estimate
  FROM probe p JOIN counters c ON p.r = c.r AND p.b = c.b
  GROUP BY 1, 2
)
SELECT user_id, true_count, cms_estimate,
       cms_estimate - true_count AS overestimate
FROM est
ORDER BY true_count DESC, user_id
LIMIT 20
"""


@_q("q_bloom_prefilter_membership")
def q_bloom_prefilter_membership(spark, sf_dir):
    """Bloom-filter join pre-filtering in *verifiable* mode: a 4096-bit /
    3-hash Bloom filter over the purchaser key set (portable md5 hash
    family), stored as 128 OR-folded 32-bit words, then every user probed
    against the broadcast bitset.  Per user-cohort (user_id % 10): keys
    tested, true members, Bloom passes, and false positives — the
    no-false-negative guarantee (pass >= member) and the bounded FP rate
    are pinned row-by-row by the oracle.

    Scale shape: this is Spark's runtime bloom-filter join pruning made
    explicit — the build side is one explode + distinct + 128-row bit_or
    aggregate; the probe side never shuffles (128-word bitset broadcasts);
    rows failing the Bloom never reach the expensive join they guard."""
    # 32-bit words: shift amounts stay < 32, so the OR-fold can never hit
    # the signed-64 overflow DuckDB rejects at bit 63 (1::BIGINT << 63)
    m_bits, k_hashes, bits_per_word = 4096, 3, 32
    e = load(spark, sf_dir, "events")

    def pos(i, key_col):
        return F.pmod(
            F.conv(F.substring(
                F.md5(F.concat(F.lit(f"b{i}:"), key_col.cast("string"))),
                1, 15), 16, 10).cast("long"),
            F.lit(m_bits))

    members = (e.filter(F.col("event_type") == "purchase")
               .select("user_id").distinct())
    bits = members.select(F.explode(F.array(*[
        pos(i, F.col("user_id")) for i in range(k_hashes)])).alias("p")) \
        .select(F.floor(F.col("p") / bits_per_word).alias("word"),
                (F.col("p") % bits_per_word).alias("bit")).distinct()
    words = (bits.groupBy("word")
             .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), "
                         "CAST(bit AS INT)))").alias("mask")))
    users = e.select("user_id").distinct()
    probes = users.select("user_id", F.explode(F.array(*[
        pos(i, F.col("user_id")) for i in range(k_hashes)])).alias("p")) \
        .select("user_id",
                F.floor(F.col("p") / bits_per_word).alias("word"),
                (F.col("p") % bits_per_word).alias("bit"))
    hit = (F.col("mask").isNotNull()
           & (F.col("mask").bitwiseAND(
               F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"))
              != 0))
    per_user = (probes.join(F.broadcast(words), "word", "left")
                .groupBy("user_id")
                .agg((F.sum(hit.cast("int")) == k_hashes).alias("bloom_pass")))
    flagged = per_user.join(
        members.withColumn("is_member", F.lit(True)), "user_id", "left") \
        .withColumn("is_member", F.coalesce("is_member", F.lit(False)))
    return (flagged.groupBy((F.col("user_id") % 10).alias("cohort"))
            .agg(F.count("*").alias("n_tested"),
                 F.sum(F.col("is_member").cast("int")).alias("n_members"),
                 F.sum(F.col("bloom_pass").cast("int")).alias("n_pass"),
                 F.sum((F.col("bloom_pass")
                        & ~F.col("is_member")).cast("int"))
                 .alias("n_false_pos"))
            .orderBy("cohort"))


ORACLE_SQL["q_bloom_prefilter_membership"] = """
WITH members AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
), mbits AS (
  SELECT DISTINCT
         ('0x' || substring(md5('b' || r || ':'
                                || CAST(user_id AS VARCHAR)),
                            1, 15))::BIGINT % 4096 AS p
  FROM members, (SELECT unnest([0, 1, 2]) AS r)
), words AS (
  SELECT p // 32 AS word, bit_or(1::BIGINT << CAST(p % 32 AS INTEGER)) AS mask
  FROM mbits GROUP BY 1
), users AS (
  SELECT DISTINCT user_id FROM events
), probes AS (
  SELECT user_id, r,
         ('0x' || substring(md5('b' || r || ':'
                                || CAST(user_id AS VARCHAR)),
                            1, 15))::BIGINT % 4096 AS p
  FROM users, (SELECT unnest([0, 1, 2]) AS r)
), per_user AS (
  SELECT pr.user_id,
         (sum(CASE WHEN w.mask IS NOT NULL
                    AND (w.mask & (1::BIGINT << CAST(pr.p % 32 AS INTEGER)))
                        <> 0
               THEN 1 ELSE 0 END) = 3) AS bloom_pass
  FROM probes pr LEFT JOIN words w ON pr.p // 32 = w.word
  GROUP BY 1
), flagged AS (
  SELECT u.user_id, u.bloom_pass, m.user_id IS NOT NULL AS is_member
  FROM per_user u LEFT JOIN members m USING (user_id)
)
SELECT user_id % 10 AS cohort,
       count(*) AS n_tested,
       CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
         AS n_members,
       CAST(sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pass,
       CAST(sum(CASE WHEN bloom_pass AND NOT is_member THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos
FROM flagged
GROUP BY 1 ORDER BY 1
"""


def _pq_sub_errors(e, cb, D: int = 8):
    """Per-(vec, subspace, codebook-entry) fixed-point squared L2 — THE
    shared arithmetic of the PQ tier, as a dimension-EXPLODED aggregation:
    posexplode the vector, broadcast-join the (pos, k, cv) codebook cells,
    and partial-agg the floor(d^2*1e9) terms per (vec_id, m, k).  Small
    codegen expressions over more rows beats one 2048-term in-row
    expression: the unrolled form blew past codegen limits (1.9 MB task
    binaries, seconds of driver compile per plan) and is infeasible at
    production K=256 anyway.  Integer fixed-point keeps the sums
    order-independent across engines."""
    spark = e.sparkSession
    cells = [(pos, k, float(cb[k][pos]))
             for k in range(len(cb)) for pos in range(len(cb[0]))]
    from ..localrel import local_df
    cbdf = local_df(spark, cells, "pos int, k int, cv double")
    dims = e.select("vec_id", F.posexplode("v").alias("pos", "x"))
    d = F.col("x") - F.col("cv")
    return (dims.join(F.broadcast(cbdf), "pos")
            .groupBy("vec_id",
                     F.floor(F.col("pos") / D).cast("int").alias("m"),
                     "k")
            .agg(F.sum(F.floor(d * d * F.lit(1e9)).cast("long"))
                 .alias("e")))


def _pq_err_sql(vec_ref: str, cb_ref: str, m_ref: str) -> str:
    """DuckDB twin of ``_pq_fp_err`` as a SQL fragment (1-indexed lists)."""
    return " + ".join(
        f"CAST(floor(({vec_ref}[CAST({m_ref} * 8 + {j} AS INTEGER)]"
        f" - {cb_ref}[CAST({m_ref} * 8 + {j} AS INTEGER)])"
        f" * ({vec_ref}[CAST({m_ref} * 8 + {j} AS INTEGER)]"
        f" - {cb_ref}[CAST({m_ref} * 8 + {j} AS INTEGER)]) * 1e9) AS BIGINT)"
        for j in range(1, 9))


@_q("q_pq_encode")
def q_pq_encode(spark, sf_dir):
    """Product-quantization (PQ) encoding in *verifiable* mode — the ANN
    compression tier beyond IVF: each 64-dim vector splits into M=8
    subvectors; each subvector is assigned the nearest of K=4 codebook
    entries; the vector compresses to an 8-symbol code (16 bits here,
    64x smaller than float32x64).  Codebooks are deterministic data-point
    entries (the 4 smallest-id vectors' subvectors — the same
    seed-centroid trick as the IVF verifiable mode), so the DuckDB oracle
    rebuilds them from the parquet and replays assignment exactly;
    per-dimension squared errors are integer fixed-point (floor(d^2*1e9))
    so sums are order-independent across engines.

    Scale shape: dimension-exploded assignment (posexplode -> broadcast
    codebook-cell join -> partial aggs), the form that stays codegen-sized
    and works at production K=256 where an unrolled in-row expression
    cannot (see ``_pq_sub_errors``); only the K-row codebook collect is
    driver-side (production codebooks come from k-means per subspace,
    same swap as train_ivf_centroids)."""
    K, D = 4, 8  # codebook size x dims-per-subspace
    e = spread(load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")))
    cb = [list(r.v) for r in e.orderBy("vec_id").limit(K).collect()]
    sub = _pq_sub_errors(e, cb, D)
    best = (sub.groupBy("vec_id", "m")
            .agg(F.min(F.struct("e", "k")).alias("b")))
    return (best.groupBy("vec_id")
            .agg(F.concat_ws("", F.transform(
                    F.array_sort(F.collect_list(F.struct("m", "b"))),
                    lambda s: s["b"]["k"].cast("string"))).alias("pq_code"),
                 F.sum("b.e").alias("recon_err_fp")))


ORACLE_SQL["q_pq_encode"] = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cb AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, v AS cv
  FROM v ORDER BY vec_id LIMIT 4
), sub AS (
  SELECT x.vec_id, m.m, cb.k,
         {ERR} AS e
  FROM v x, (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS m) m
  CROSS JOIN cb
), best AS (
  SELECT vec_id, m, k, e,
         row_number() OVER (PARTITION BY vec_id, m
                            ORDER BY e ASC, k ASC) AS rn
  FROM sub
)
SELECT vec_id,
       string_agg(CAST(k AS VARCHAR), '' ORDER BY m) AS pq_code,
       CAST(sum(e) AS BIGINT) AS recon_err_fp
FROM best WHERE rn = 1
GROUP BY vec_id
""".replace("{ERR}", _pq_err_sql("x.v", "cb.cv", "m.m"))


@_q("q_pq_adc_topk")
def q_pq_adc_topk(spark, sf_dir):
    """PQ asymmetric-distance (ADC) top-k — the search half of
    ``q_pq_encode``: each query's FULL vector scores every candidate from
    its 8-symbol CODE alone (distance = sum over subspaces of the exact
    query-to-centroid error for the candidate's symbol), so the candidate
    corpus is scanned at 2 bytes/vector instead of 256.  Codebooks and
    the fixed-point arithmetic are the verifiable-mode choices of
    ``q_pq_encode``; the DuckDB oracle replays encode + ADC end to end.

    Scale shape: candidates carry only their codes; each query's ADC
    LOOKUP TABLE (M x K fixed-point distances) is aggregated once from the
    exploded form and broadcast, so per-pair scoring is 8 array indexes —
    the FAISS IVF-ADC inner loop as a DataFrame plan."""
    M, K, D = 8, 4, 8
    e = spread(load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")))
    cb = [list(r.v) for r in e.orderBy("vec_id").limit(K).collect()]
    sub = _pq_sub_errors(e, cb, D)
    cand = (sub.groupBy("vec_id", "m")
            .agg(F.min(F.struct("e", "k")).alias("b"))
            .groupBy(F.col("vec_id").alias("neighbor_id"))
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("m", "b"))),
                lambda s: s["b"]["k"]).alias("code")))
    # per-query LUT: M*K fixed-point distances, ordered by (m, k)
    q = (sub.join(e.filter(F.col("vec_id") < 5).select("vec_id"), "vec_id")
         .groupBy(F.col("vec_id").alias("query_id"))
         .agg(F.transform(
             F.array_sort(F.collect_list(F.struct("m", "k", "e"))),
             lambda s: s["e"]).alias("lut")))
    total = None
    for m in range(M):
        term = F.element_at(
            "lut", (F.lit(m * K) + F.element_at("code", m + 1) + 1)
            .cast("int"))
        total = term if total is None else (total + term)
    scored = (cand.join(F.broadcast(q))
              .select("query_id", "neighbor_id",
                      total.alias("adc_dist_fp")))
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist_fp"), F.asc("neighbor_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 5))


ORACLE_SQL["q_pq_adc_topk"] = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cb AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, v AS cv
  FROM v ORDER BY vec_id LIMIT 4
), sub AS (
  SELECT x.vec_id, m.m, cb.k,
         {ERR} AS e
  FROM v x, (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS m) m
  CROSS JOIN cb
), best AS (
  SELECT vec_id, m, k,
         row_number() OVER (PARTITION BY vec_id, m
                            ORDER BY e ASC, k ASC) AS rn
  FROM sub
), codes AS (
  SELECT vec_id AS neighbor_id, m, k FROM best WHERE rn = 1
), queries AS (
  SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, c.neighbor_id,
         CAST(sum({QERR}) AS BIGINT) AS adc_dist_fp
  FROM codes c
  CROSS JOIN queries q
  JOIN cb ON cb.k = c.k
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, adc_dist_fp, rnk
FROM (SELECT query_id, neighbor_id, adc_dist_fp,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_dist_fp ASC, neighbor_id ASC)
               AS rnk
      FROM scored)
WHERE rnk <= 5
""".replace("{ERR}", _pq_err_sql("x.v", "cb.cv", "m.m")).replace(
    "{QERR}", _pq_err_sql("q.qv", "cb.cv", "c.m"))


@_q("q_curation_funnel")
def q_curation_funnel(spark, sf_dir):
    """Corpus-curation funnel with per-stage attrition — the observability
    view every filtering pipeline publishes (the C4/FineWeb-style report):
    stage 0 all docs -> 1 language gate (en) -> 2 length gate (>= 15
    words) -> 3 diversity gate (distinct-token ratio >= 0.5) -> 4 exact
    dedup (keep min doc_id per fingerprint).  One scan: every gate is a
    boolean projection; the cumulative-survival counts come from a single
    aggregate over the flags (no per-stage re-scan), plus one fingerprint
    window for the dedup flag.

    Stages are evaluated CUMULATIVELY (a doc must pass all earlier gates
    to be counted at a later one), matching how attrition reports read."""
    d = load(spark, sf_dir, "documents")
    ws = tokens("text")
    n_words = F.size(ws)
    distinct_ratio = F.size(F.array_distinct(ws)) / n_words
    keep_w = Window.partitionBy(dedup.fingerprint("text"))
    flagged = d.select(
        "doc_id",
        (F.col("lang") == "en").alias("g1"),
        (n_words >= 15).alias("g2"),
        (distinct_ratio >= 0.5).alias("g3"),
        (F.col("doc_id") == F.min("doc_id").over(keep_w)).alias("g4"))
    s1 = F.col("g1")
    s2 = s1 & F.col("g2")
    s3 = s2 & F.col("g3")
    s4 = s3 & F.col("g4")
    agg = flagged.agg(
        F.count("*").alias("n0"),
        F.sum(s1.cast("int")).alias("n1"),
        F.sum(s2.cast("int")).alias("n2"),
        F.sum(s3.cast("int")).alias("n3"),
        F.sum(s4.cast("int")).alias("n4"))
    stages = F.array(*[
        F.struct(F.lit(i).alias("stage"), F.lit(name).alias("gate"),
                 F.col(f"n{i}").cast("long").alias("n_surviving"))
        for i, name in enumerate(
            ["all", "lang_en", "min_words", "diversity", "dedup"])])
    return (agg.select(F.explode(stages).alias("s"))
            .select("s.stage", "s.gate", "s.n_surviving")
            .orderBy("stage"))


ORACLE_SQL["q_curation_funnel"] = f"""
WITH f AS (
  SELECT doc_id,
         lang = 'en' AS g1,
         len(regexp_extract_all(lower(text), '\\w+')) >= 15 AS g2,
         len(list_distinct(regexp_extract_all(lower(text), '\\w+'))) * 1.0
           / len(regexp_extract_all(lower(text), '\\w+')) >= 0.5 AS g3,
         doc_id = min(doc_id) OVER (PARTITION BY md5({_NORM_SQL})) AS g4
  FROM documents
), agg AS (
  SELECT count(*) AS n0,
         CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END) AS BIGINT)
           AS n3,
         CAST(sum(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 ELSE 0 END)
              AS BIGINT) AS n4
  FROM f
)
SELECT 0 AS stage, 'all' AS gate, n0 AS n_surviving FROM agg
UNION ALL SELECT 1, 'lang_en', n1 FROM agg
UNION ALL SELECT 2, 'min_words', n2 FROM agg
UNION ALL SELECT 3, 'diversity', n3 FROM agg
UNION ALL SELECT 4, 'dedup', n4 FROM agg
ORDER BY stage
"""


def _kmeans_assign(x, cent):
    """One Lloyd ASSIGN step, dimension-exploded and bit-exact: join the
    per-dim rows with the (broadcast) K x D centroid rows, partial-agg the
    integer squared distance per (vec_id, cid), then argmin via a single
    packed BIGINT key ``dist * 1000 + cid`` — min() of the packed key is an
    ordinary partial aggregate (no window), and the +cid term makes ties
    break on the smaller centroid id identically in both engines."""
    dist = (x.join(F.broadcast(cent), "d")
            .groupBy("vec_id", "cid")
            .agg(F.sum((F.col("val") - F.col("cval"))
                       * (F.col("val") - F.col("cval"))).alias("dist")))
    key = F.min(F.col("dist") * 1000 + F.col("cid")).alias("key")
    return (dist.groupBy("vec_id").agg(key)
            .select("vec_id",
                    (F.col("key") % 1000).alias("cid"),
                    F.expr("key DIV 1000").alias("dist")))


def _kmeans_update(x, assign):
    """One Lloyd UPDATE step: per-(cluster, dim) integer mean via explicit
    FLOOR division — ``(s - pmod(s, n)) DIV n``.  Both engines' integer
    division truncates toward zero (Spark ``DIV`` and DuckDB ``//`` alike,
    measured: -7 // 2 = -3 in both), so bare division would already agree —
    but it would round negative means TOWARD zero and positive means away
    from it, biasing centroids by sign.  Subtracting the positive modulus
    first makes the numerator an exact multiple, giving true mathematical
    floor on both engines regardless of sign."""
    return (assign.join(x, "vec_id")
            .groupBy("cid", "d")
            .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
            .select("cid", "d",
                    F.expr("(s - ((s % n) + n) % n) DIV n").alias("cval"))
            .localCheckpoint(eager=True))


def _kmeans_seed_exploded(e, K: int):
    """(x, cent) for the verifiable k-means tier: the posexploded
    fixed-point corpus (vec_id, d, val) — materialized once, it anchors
    every assign/update — and the K seed centroids (smallest vec_ids,
    cid by rank).  Shared by ``q_kmeans_verifiable`` and
    ``q_semantic_dedup`` so the seeding recipe cannot drift between the
    trainer and its downstream consumer."""
    x = (e.select("vec_id", F.posexplode("qv").alias("d", "val"))
         .localCheckpoint(eager=True))
    seeds = (e.select("vec_id").orderBy("vec_id").limit(K)
             .select("vec_id",
                     (F.row_number().over(Window.orderBy("vec_id")) - 1)
                     .cast("long").alias("cid")))
    cent = (seeds.join(x, "vec_id").select("cid", "d", "val")
            .withColumnRenamed("val", "cval"))
    return x, cent


@_q("q_kmeans_verifiable")
def q_kmeans_verifiable(spark, sf_dir):
    """k-means (Lloyd) TRAINING in *verifiable* mode — closes the loop the
    IVF tier left open: ``seed_centroids`` gave an oracle-checkable init
    with ZERO Lloyd iterations and ``train_ivf_centroids`` (pyspark.ml)
    gives production training that no external engine can replay.  Here two
    full Lloyd iterations (assign -> update -> assign -> update -> final
    assign) run in LONG fixed-point — coordinates quantized to
    ``floor(x * 1e6)``, distances exact integer sums, centroid means via
    explicit floor division — so the DuckDB oracle replays TRAINING itself
    bit-for-bit, not just the assignment scan.

    Scale shape: the corpus appears only as posexploded (vec_id, d, val)
    rows; every iteration is one broadcast join against the K x D centroid
    relation (512 rows) plus two partial-agg shuffles — the same cost
    profile as pyspark.ml's own Lloyd step, with centroids
    ``localCheckpoint``-ed per iteration to keep the plan linear (the
    PageRank lesson).  A cluster that loses all members simply drops out
    of the output — identically in both engines, since the arithmetic is
    identical.  K=8, dim=64, 2 updates; the production path stays
    ``train_ivf_centroids``."""
    K = 8
    e = spread(load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding").cast("array<double>"),
                    lambda v: F.floor(v * 1e6).cast("long")).alias("qv")))
    x, cent = _kmeans_seed_exploded(e, K)
    cent = cent.localCheckpoint(eager=True)
    for _ in range(2):
        assign = _kmeans_assign(x, cent)
        cent = _kmeans_update(x, assign)
    final = _kmeans_assign(x, cent)
    stats = (cent.groupBy("cid")
             .agg(F.sum("cval").alias("c_sum"),
                  F.min("cval").alias("c_min"),
                  F.max("cval").alias("c_max")))
    return (final.groupBy("cid")
            .agg(F.count("*").alias("n_members"),
                 F.sum("dist").alias("inertia_fp"))
            .join(stats, "cid")
            .orderBy("cid"))


def _kmeans_oracle() -> str:
    assign = """a{t} AS (
  SELECT vec_id,
         CAST(min(key) % 1000 AS BIGINT) AS cid,
         min(key) // 1000 AS dist
  FROM (
    SELECT x.vec_id, c.cid,
           CAST(sum((x.val - c.cval) * (x.val - c.cval)) AS BIGINT)
             * 1000 + c.cid AS key
    FROM x JOIN c{u} c ON c.d = x.d
    GROUP BY x.vec_id, c.cid)
  GROUP BY vec_id
)"""
    update = """c{t} AS (
  SELECT cid, d, (s - ((s % n) + n) % n) // n AS cval
  FROM (
    SELECT a.cid, x.d, CAST(sum(x.val) AS BIGINT) AS s, count(*) AS n
    FROM a{t} a JOIN x ON x.vec_id = a.vec_id
    GROUP BY a.cid, x.d)
)"""
    steps = []
    for t in range(1, 3):
        steps.append(assign.format(t=t, u=t - 1))
        steps.append(update.format(t=t))
    steps.append(assign.format(t=3, u=2))
    return """
WITH v AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        e -> CAST(floor(e * 1e6) AS BIGINT)) AS qv
  FROM embeddings
), x AS (
  SELECT vec_id, g.i AS d, qv[g.i + 1] AS val
  FROM v CROSS JOIN (SELECT unnest(range(0, 64)) AS i) g
), seeds AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
  FROM v ORDER BY vec_id LIMIT 8
), c0 AS (
  SELECT s.cid, x.d, x.val AS cval
  FROM seeds s JOIN x ON x.vec_id = s.vec_id
),
""" + ",\n".join(steps) + """,
stats AS (
  SELECT cid, CAST(sum(cval) AS BIGINT) AS c_sum,
         min(cval) AS c_min, max(cval) AS c_max
  FROM c2 GROUP BY cid
)
SELECT f.cid, count(*) AS n_members,
       CAST(sum(f.dist) AS BIGINT) AS inertia_fp,
       any_value(s.c_sum) AS c_sum,
       any_value(s.c_min) AS c_min,
       any_value(s.c_max) AS c_max
FROM a3 f JOIN stats s ON s.cid = f.cid
GROUP BY f.cid ORDER BY f.cid
"""


ORACLE_SQL["q_kmeans_verifiable"] = _kmeans_oracle()


@_q("q_semantic_dedup")
def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    cluster the corpus embeddings with k-means, then prune near-duplicate
    pairs WITHIN each cluster only — the clustering is the blocking scheme
    that keeps pairwise cosine from going quadratic over the corpus.
    Keeps the lowest vec_id of each near-dup pair; reports per-cluster
    attrition.

    Verifiable mode: cluster assignment is the bit-exact fixed-point
    argmin of ``q_kmeans_verifiable`` (seed centroids, packed-key
    tie-break), and the cosine is rounded to 6 digits on both engines
    (the proven ``q_dedup_embedding_cosine`` recipe) — so the oracle
    replays blocking AND pruning.

    Scale shape: assignment is one broadcast join + two partial aggs;
    within-cluster pairing is the algorithm's stated cost, bounded by
    cluster size (at 100 TB, K scales with N to hold E[|cluster|] at a
    few thousand; the hyperplane sub-bucket of
    ``q_dedup_embedding_cosine`` composes if a hot cluster persists)."""
    from ..functions.vectors import dot, l2_norm

    K = 8
    e = spread(load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        F.transform(F.col("embedding").cast("array<double>"),
                    lambda u: F.floor(u * 1e6).cast("long")).alias("qv")))
    x, cent = _kmeans_seed_exploded(e, K)
    assign = _kmeans_assign(x, cent).select("vec_id", "cid")
    # l2_norm folds acc + x*x — the same addition sequence as the inline
    # zip_with form it replaced, so the rounded-6 hash is unchanged
    ev = (e.select("vec_id", "v", l2_norm("v").alias("n"))
          .join(assign, "vec_id"))
    a, b = ev.alias("a"), ev.alias("b")
    denom = F.col("a.n") * F.col("b.n")
    cos = F.round(F.when(denom != 0, dot("a.v", "b.v") / denom), 6)
    pairs = (a.join(b, (F.col("a.cid") == F.col("b.cid"))
                    & (F.col("a.vec_id") < F.col("b.vec_id")))
             .select(F.col("a.cid").alias("cid"),
                     F.col("a.vec_id").alias("id_keep"),
                     F.col("b.vec_id").alias("id_drop"),
                     cos.alias("cs"))
             .filter(F.col("cs") >= 0.3))
    dropped = (pairs.groupBy("cid")
               .agg(F.count("*").alias("n_pairs"),
                    F.countDistinct("id_drop").alias("n_dropped")))
    return (assign.groupBy("cid").agg(F.count("*").alias("n_members"))
            .join(dropped, "cid", "left")
            .select("cid", "n_members",
                    F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
                    F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
                    (F.col("n_members")
                     - F.coalesce("n_dropped", F.lit(0))).alias("n_kept"))
            .orderBy("cid"))


ORACLE_SQL["q_semantic_dedup"] = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         list_transform(CAST(embedding AS DOUBLE[]),
                        e -> CAST(floor(e * 1e6) AS BIGINT)) AS qv
  FROM embeddings
), x AS (
  SELECT vec_id, g.i AS d, qv[g.i + 1] AS val
  FROM v CROSS JOIN (SELECT unnest(range(0, 64)) AS i) g
), seeds AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
  FROM v ORDER BY vec_id LIMIT 8
), c0 AS (
  SELECT s.cid, x.d, x.val AS cval
  FROM seeds s JOIN x ON x.vec_id = s.vec_id
), assign AS (
  SELECT vec_id, CAST(min(key) % 1000 AS BIGINT) AS cid
  FROM (
    SELECT x.vec_id, c.cid,
           CAST(sum((x.val - c.cval) * (x.val - c.cval)) AS BIGINT)
             * 1000 + c.cid AS key
    FROM x JOIN c0 c ON c.d = x.d
    GROUP BY x.vec_id, c.cid)
  GROUP BY vec_id
), ev AS (
  SELECT a.vec_id, a.v, s.cid FROM v a JOIN assign s USING (vec_id)
), pairs AS (
  SELECT a.cid, b.vec_id AS id_drop
  FROM ev a JOIN ev b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.3
), dropped AS (
  SELECT cid, count(*) AS n_pairs,
         count(DISTINCT id_drop) AS n_dropped
  FROM pairs GROUP BY cid
)
SELECT m.cid, m.n_members,
       coalesce(d.n_pairs, 0) AS n_pairs,
       coalesce(d.n_dropped, 0) AS n_dropped,
       m.n_members - coalesce(d.n_dropped, 0) AS n_kept
FROM (SELECT cid, count(*) AS n_members FROM assign GROUP BY cid) m
LEFT JOIN dropped d USING (cid)
ORDER BY m.cid
"""


@_q("q_kmv_distinct_sketch")
def q_kmv_distinct_sketch(spark, sf_dir):
    """KMV (k-minimum-values / bottom-k theta) distinct-count sketch in
    *verifiable* mode — the oracle-checkable counterpart to the rows-only
    ``q_hll_sketch_rollup``: per event type, the k=64 smallest portable
    md5 hashes of the distinct user set yield the classic
    ``(k-1) * M / h_k`` cardinality estimate, and because the hash is the
    same cross-engine trick as the verifiable MinHash, DuckDB reproduces
    every sketch slot AND every estimate bit-for-bit.

    Set algebra falls out of the sketch (the theta-sketch pitch): the
    union sketch is the k smallest of the merged per-set sketches, and
    the intersection estimate is ``rho * est(union) / k`` where ``rho``
    counts union-sketch slots present in BOTH inputs — emitted as two
    extra rows for the click/purchase pair.  Sets smaller than k are
    exact by construction (the sketch IS the set), which also pins the
    tiny-SF behavior.

    All arithmetic is integer: hashes live in [1, 2^52) (13 hex chars,
    so ``(k-1) * 2^52`` stays far inside BIGINT) and estimates use
    integer ``DIV``.  Scale shape: one distinct shuffle, then per-type
    rank over h — k rows survive per type regardless of input size, and
    sketch MERGE is "k smallest of a union" (cell-wise, like the CMS
    matrix), which is why KMV composes across partitions/days at 100 TB.
    The per-type rank is a 5-partition window here; at extreme per-type
    cardinality swap in a salted local-top-k pre-pass — the estimate is
    unchanged, by the merge property."""
    k, m_num = 64, 63 * (1 << 52)          # (k-1) * M
    e = load(spark, sf_dir, "events")
    d = e.select("event_type", dedup.kmv_hash(F.col("user_id")).alias("h"))
    sk = dedup.kmv_bottom_k(d, "event_type", k)
    # The per-type, union, and intersection branches all consume the
    # sketch; without a barrier each union branch re-runs the expensive
    # distinct+rank over the full input (3 scans in the static plan).
    # The sketch is <= k rows per set — pin it once, derive everything
    # from the tiny materialized frame.
    sk = sk.localCheckpoint(eager=True)
    per_type = (sk.groupBy("event_type")
                .agg(F.count("*").alias("n_sketch"),
                     F.max("h").alias("kth_hash"))
                .select(F.col("event_type").alias("set_label"),
                        "n_sketch", "kth_hash",
                        F.when(F.col("n_sketch") < k, F.col("n_sketch"))
                         .otherwise(F.expr(f"{m_num} DIV kth_hash"))
                         .alias("est_distinct")))
    pair = sk.filter(F.col("event_type").isin("click", "purchase"))
    merged = (pair.groupBy("h")
              .agg(F.countDistinct("event_type").alias("n_types"))
              .withColumn("rn", F.row_number().over(Window.orderBy("h")))
              .filter(F.col("rn") <= k))           # <= 2k input rows
    u = (merged.agg(F.count("*").alias("n_sketch"),
                    F.max("h").alias("kth_hash"),
                    F.sum(F.when(F.col("n_types") == 2, 1).otherwise(0))
                     .cast("long").alias("rho"))
         .withColumn("est_u",
                     F.when(F.col("n_sketch") < k, F.col("n_sketch"))
                      .otherwise(F.expr(f"{m_num} DIV kth_hash"))))
    union_row = u.select(
        F.lit("click|purchase:union").alias("set_label"),
        "n_sketch", "kth_hash", F.col("est_u").alias("est_distinct"))
    inter_row = u.select(
        F.lit("click|purchase:intersect").alias("set_label"),
        F.col("rho").alias("n_sketch"),
        F.lit(None).cast("long").alias("kth_hash"),
        F.expr("(rho * est_u) DIV nullif(n_sketch, 0)")
         .alias("est_distinct"))
    return per_type.unionByName(union_row).unionByName(inter_row)


ORACLE_SQL["q_kmv_distinct_sketch"] = """
WITH d AS (
  SELECT DISTINCT event_type, user_id FROM events
), hx AS (
  SELECT event_type,
         GREATEST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                                     1, 13))::BIGINT, 1) AS h
  FROM d
), ranked AS (
  -- the sketch is a SET of hash values: colliding inputs occupy one slot
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM (SELECT DISTINCT event_type, h FROM hx) dh
), sk AS (
  SELECT event_type, h FROM ranked WHERE rn <= 64
), per_type AS (
  SELECT event_type AS set_label,
         CAST(count(*) AS BIGINT) AS n_sketch,
         max(h) AS kth_hash,
         CASE WHEN count(*) < 64 THEN CAST(count(*) AS BIGINT)
              ELSE CAST(283726776524341248 // max(h) AS BIGINT)
         END AS est_distinct
  FROM sk GROUP BY event_type
), pair AS (
  SELECT event_type, h FROM sk WHERE event_type IN ('click', 'purchase')
), m AS (
  SELECT h, count(DISTINCT event_type) AS n_types FROM pair GROUP BY h
), mr AS (
  SELECT h, n_types, row_number() OVER (ORDER BY h) AS rn FROM m
), u AS (
  SELECT CAST(count(*) AS BIGINT) AS n_sketch,
         max(h) AS kth_hash,
         CAST(sum(CASE WHEN n_types = 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS rho
  FROM mr WHERE rn <= 64
), uu AS (
  SELECT n_sketch, kth_hash, rho,
         CASE WHEN n_sketch < 64 THEN n_sketch
              ELSE CAST(283726776524341248 // kth_hash AS BIGINT)
         END AS est_u
  FROM u
)
SELECT set_label, n_sketch, kth_hash, est_distinct FROM per_type
UNION ALL
SELECT 'click|purchase:union', n_sketch, kth_hash, est_u FROM uu
UNION ALL
SELECT 'click|purchase:intersect', rho, CAST(NULL AS BIGINT),
       (rho * est_u) // NULLIF(n_sketch, 0)
FROM uu
"""


@_q("q_segment_dedup")
def q_segment_dedup(spark, sf_dir):
    """CCNet/C4-style boilerplate removal: cross-document dedup at SEGMENT
    granularity (``operators/dedup.py segment_dedup``) — a segment whose
    exact hash occurs in >= 2 distinct documents is boilerplate; per doc
    the query reports segments, removals, surviving characters, and the
    spread of its most-shared segment.  Catches what doc-level
    MinHash/SimHash cannot: globally-dissimilar documents sharing an
    injected template paragraph.  The oracle replays the identical
    chunker (char offsets, overlap 0) and hash in SQL, so segmentation,
    frequency counting, and the removal rule are all checked
    cross-engine.  Linear shapes only: in-row explode, one hash groupBy,
    one keyed join back, one per-doc rollup."""
    d = load(spark, sf_dir, "documents")
    return dedup.segment_dedup(d, "doc_id", "text",
                               chunk_chars=80, min_docs=2)


ORACLE_SQL["q_segment_dedup"] = """
WITH docs AS (
  SELECT doc_id, text,
         greatest(1, CAST(ceil(length(text) / 80.0) AS INT)) AS n
  FROM documents
), segs AS (
  SELECT doc_id, text, unnest(range(n)) AS i FROM docs
), c AS (
  SELECT doc_id,
         substring(text, CAST(i * 80 + 1 AS INT), 80) AS chunk
  FROM segs
), f AS (
  SELECT md5(chunk) AS h, count(DISTINCT doc_id) AS n_docs
  FROM c GROUP BY 1
)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(sum(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boiler,
       CAST(sum(CASE WHEN f.n_docs >= 2 THEN 0 ELSE length(c.chunk) END)
            AS BIGINT) AS chars_kept,
       CAST(max(f.n_docs) AS BIGINT) AS max_seg_docs
FROM c JOIN f ON md5(c.chunk) = f.h
GROUP BY c.doc_id
"""


@_q("q_training_shards_e2e")
def q_training_shards_e2e(spark, sf_dir):
    """The END-TO-END training-data build, composed from the tier's own
    operators and oracle-checked as ONE query: curation gates (language,
    min length, exact dedup keep-first) -> deterministic chunking
    (``chunk_text``, 200 chars, no overlap) -> per-chunk token counts ->
    token-budget bin packing into shards per source (``pack_bins``,
    256-token target) -> the shard MANIFEST (chunks + tokens per bin)
    a training loader would consume.  This is the "switch your pipeline
    to this
    repo" proof: every stage is the registered operator, composed, and
    the DuckDB oracle replays the entire pipeline declaratively.

    Scale shape: gates are one scan + one fingerprint window; chunking
    is an in-row explode; packing is the DISTRIBUTED two-level prefix
    sum (``pack_bins_prefix`` — range-bucketed local cumsums + broadcast
    bucket offsets, exact and never single-task even with few huge
    sources); the manifest is one partial-agg rollup."""
    from ..operators.text import chunk_text

    d = load(spark, sf_dir, "documents")
    keep_w = Window.partitionBy(dedup.fingerprint("text"))
    survivors = (d.withColumn(
        "_keep",
        (F.col("lang") == "en")
        & (F.size(tokens("text")) >= 15)
        & (F.col("doc_id") == F.min("doc_id").over(keep_w)))
        .filter(F.col("_keep")).drop("_keep"))
    chunks = chunk_text(survivors.select("doc_id", "source", "text"),
                        "doc_id", "text", chunk_chars=200, overlap=0)
    # chunk_text keys rows by (doc_id, chunk_id); re-attach source and
    # build the composite pack order doc-major, chunk-minor
    # 2^20 chunks/doc (~200 MB of text at 200 chars/chunk) bounds the
    # composite key; a collision would make the pack-order ties
    # engine-dependent, so beyond that split the file upstream
    chunks = (chunks.join(survivors.select("doc_id", "source"), "doc_id")
              .select("source",
                      (F.col("doc_id") * (1 << 20) + F.col("chunk_id"))
                      .alias("seq"),
                      F.size(tokens(F.col("chunk"))).alias("n_tokens")))
    from ..operators.text import pack_bins_prefix
    packed = pack_bins_prefix(chunks, "seq", "n_tokens",
                              target_weight=256, part_col="source")
    return (packed.groupBy("source", "bin")
            .agg(F.count("*").alias("n_chunks"),
                 F.sum("weight").alias("n_tokens"))
            .select("source", F.col("bin").cast("long").alias("bin"),
                    "n_chunks", F.col("n_tokens").cast("long")
                    .alias("n_tokens")))


ORACLE_SQL["q_training_shards_e2e"] = f"""
WITH survivors AS (
  SELECT doc_id, source, text
  FROM (
    SELECT doc_id, source, text,
           lang = 'en'
             AND len(regexp_extract_all(lower(text), '\\w+')) >= 15
             AND doc_id = min(doc_id)
                   OVER (PARTITION BY md5({_NORM_SQL})) AS keep
    FROM documents
  ) WHERE keep
), base AS (
  SELECT doc_id, source, text,
         greatest(1, CAST(ceil(length(text) / 200.0) AS INT)) AS n
  FROM survivors
), segs AS (
  SELECT doc_id, source, text, unnest(range(n)) AS i FROM base
), chunks AS (
  SELECT source,
         doc_id * 1048576 + i AS seq,
         len(regexp_extract_all(
             lower(substring(text, CAST(i * 200 + 1 AS INT), 200)),
             '\\w+')) AS n_tokens
  FROM segs
), packed AS (
  SELECT source, seq, n_tokens,
         CAST(floor(coalesce(sum(n_tokens) OVER (
                 PARTITION BY source ORDER BY seq
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / 256.0) AS BIGINT) AS bin
  FROM chunks
)
SELECT source, bin,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM packed GROUP BY source, bin
"""


@_q("q_charngram_lm_score")
def q_charngram_lm_score(spark, sf_dir):
    """Character-trigram language-model typicality score — the CCNet/
    FineWeb perplexity-filter shape with the external KenLM swapped for
    an in-engine model trained on the corpus itself: every trigram
    occurrence is scored by how probable the model says it is given its
    2-char context, and a document's mean score separates typical text
    from line noise / wrong-language / binary-ish outliers.

    Determinism choice: the score is LINEAR probability mass in integer
    ppm — ``(1e6 * C3(g)) DIV C2(ctx)`` summed and integer-averaged —
    not log-probability, because ``ln``/``log2`` last-ulp behavior
    differs between the JVM and DuckDB's libm (the same reason the EWMA
    fold avoids ``pow``); ranking power is equivalent for filtering.
    All-integer arithmetic end to end, so the oracle reproduces every
    score bit-for-bit.

    Scale shape: one in-row explode (len-2 trigrams per doc), two
    vocab-scale groupBys for the model (trigram and context counts), a
    broadcast model join back onto the occurrence stream, one per-doc
    partial-agg rollup — linear, never all-pairs; the model table is
    alphabet^3-bounded and merges across shards by count addition."""
    # spread: a single-split documents file would run the whole trigram
    # explosion (the CPU-heavy stage) on one core — measured 28s → 3s at
    # sf0.1 on local[32]
    d = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    occ = d.select("doc_id",
                   F.explode(char_ngrams("text", 3)).alias("g"))
    c3 = occ.groupBy("g").agg(F.count("*").alias("c3"))
    # context counts derive from the VOCAB-scale c3 (every trigram
    # occurrence contributes to exactly one prefix bigram), so the c2
    # branch never re-scans the corpus — bit-identical to counting
    # occurrences directly, integer sums both ways
    c2 = (c3.groupBy(F.col("g").substr(1, 2).alias("ctx"))
          .agg(F.sum("c3").alias("c2")))
    model = (c3.withColumn("ctx", F.col("g").substr(1, 2))
             .join(c2, "ctx")
             .select("g", F.expr("(1000000 * c3) DIV c2").alias("s")))
    return (occ.join(F.broadcast(model), "g")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_grams"),
                 F.expr("sum(s) DIV count(*)").alias("lm_ppm")))


ORACLE_SQL["q_charngram_lm_score"] = f"""
WITH nt AS (
  SELECT doc_id, {_NORM_SQL} AS t FROM documents
), occ AS (
  SELECT doc_id,
         unnest([substr(t, CAST(i AS INTEGER), 3)
                 for i in range(1, length(t) - 1)]) AS g
  FROM nt WHERE length(t) >= 3
), c3 AS (
  SELECT g, count(*) AS c3 FROM occ GROUP BY g
), c2 AS (
  SELECT substr(g, 1, 2) AS ctx, CAST(sum(c3) AS BIGINT) AS c2
  FROM c3 GROUP BY 1
), model AS (
  SELECT g, (1000000 * c3.c3) // c2.c2 AS s
  FROM c3 JOIN c2 ON substr(c3.g, 1, 2) = c2.ctx
)
SELECT occ.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(model.s) // count(*) AS BIGINT) AS lm_ppm
FROM occ JOIN model ON occ.g = model.g
GROUP BY occ.doc_id
"""


@_q("q_bpe_merge_step")
def q_bpe_merge_step(spark, sf_dir):
    """One VERIFIABLE BPE tokenizer-training step: from the corpus word
    frequencies, the top-10 adjacent-symbol merge candidates ranked by
    the compression they would actually buy.  ``adj_weighted`` is the
    classic BPE pair count (adjacent occurrences x word frequency);
    ``tokens_saved`` is the non-overlapping merge gain (one symbol saved
    per applied merge — "aaa" holds two "aa" pairs but only one merge),
    computed as the length delta of a literal single-char-marker
    replace, which is leftmost-non-overlapping in both engines.  Ties
    break on the pair string, so the ranking is fully deterministic and
    the oracle reproduces the whole training step.

    Scale shape: word-frequency rollup first (pair work runs on the
    VOCABULARY, not the corpus — the standard BPE trick), one in-row
    pair explode over distinct words, two partial-agg shuffles, top-10
    via TakeOrderedAndProject.  Iterating the step re-runs this query
    on the re-segmented vocabulary."""
    d = load(spark, sf_dir, "documents")
    w = (d.select(F.explode(tokens("text")).alias("w"))
         .groupBy("w").agg(F.count("*").alias("freq")))
    pair_arr = F.when(
        F.length("w") >= 2,
        F.transform(F.sequence(F.lit(1), F.length("w") - 1),
                    lambda i: F.col("w").substr(i, F.lit(2)))
    ).otherwise(F.array().cast("array<string>"))
    wp = (w.select("w", "freq", F.explode(pair_arr).alias("p"))
          .groupBy("w", "p")
          .agg(F.min("freq").alias("freq"), F.count("*").alias("n_adj")))
    saved = (F.length("w")
             - F.length(F.replace(F.col("w"), F.col("p"), F.lit("\x01"))))
    return (wp.groupBy("p")
            .agg(F.sum(F.col("freq") * F.col("n_adj"))
                  .alias("adj_weighted"),
                 F.sum(F.col("freq") * saved).alias("tokens_saved"))
            .select(F.col("p").alias("pair"), "adj_weighted",
                    "tokens_saved")
            .orderBy(F.desc("tokens_saved"), "pair").limit(10))


ORACLE_SQL["q_bpe_merge_step"] = r"""
WITH w AS (
  SELECT w, count(*) AS freq
  FROM (SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS w
        FROM documents)
  GROUP BY w
), wp AS (
  SELECT w, freq,
         unnest([substr(w, CAST(i AS INTEGER), 2)
                 for i in range(1, length(w))]) AS p
  FROM w WHERE length(w) >= 2
), per_wp AS (
  SELECT w, p, min(freq) AS freq, count(*) AS n_adj
  FROM wp GROUP BY w, p
)
SELECT p AS pair,
       CAST(sum(freq * n_adj) AS BIGINT) AS adj_weighted,
       CAST(sum(freq * (length(w) - length(replace(w, p, chr(1)))))
            AS BIGINT) AS tokens_saved
FROM per_wp GROUP BY p
ORDER BY tokens_saved DESC, pair LIMIT 10
"""


@_q("q_dsir_selection")
def q_dsir_selection(spark, sf_dir):
    """DSIR data selection (Xie et al., NeurIPS 2023 — importance
    resampling over hashed-n-gram bag models; `operators/selection.py`):
    documents from source `src0` define the TARGET domain; every other
    document is scored by summed log-ratio of Laplace-smoothed
    target-vs-raw bucket probabilities over its unigram+bigram
    occurrences (256 md5 buckets, the verifiable hash family), and the
    deterministic top-k most target-like candidates are selected.  The
    DuckDB oracle rebuilds the full pipeline — tokenization, hashed
    bucketing, both smoothed distributions, per-doc weighting,
    micro-unit rounding, tie-broken top-k — so the selection is checked
    end-to-end cross-engine.

    Scale shape: two word-count-shaped partial-aggregated groupBys for
    the distributions, one (doc_id, bucket) partial aggregate, a
    256-row broadcast ratio join, TakeOrderedAndProject for the top-k —
    no shuffle wider than (doc_id, bucket), no driver-side data, no
    all-pairs anything.  This is the selection tier a 100 TB pretraining
    pipeline runs between dedup and packing."""
    from ..operators.selection import dsir_topk

    d = load(spark, sf_dir, "documents")
    return dsir_topk(d, "doc_id", "text",
                     F.col("source") == "src0",
                     k=100, n_buckets=256, verifiable=True)


ORACLE_SQL["q_dsir_selection"] = """
WITH toks AS (
  SELECT doc_id, source,
         regexp_extract_all(lower(text), '\\w+') AS ws
  FROM documents
), feats AS (
  SELECT doc_id, source,
         unnest(list_concat(
           ws,
           [ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i AS INTEGER) + 1]
            for i in range(1, len(ws))])) AS g
  FROM toks WHERE len(ws) > 0
), hashed AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(g), 1, 15))::BIGINT % 256 AS b
  FROM feats
), tc AS (
  SELECT b, count(*) AS ct FROM hashed WHERE source = 'src0' GROUP BY b
), rc AS (
  SELECT b, count(*) AS cr FROM hashed WHERE source <> 'src0' GROUP BY b
), tot AS (
  SELECT (SELECT count(*) FROM hashed WHERE source = 'src0') AS tt,
         (SELECT count(*) FROM hashed WHERE source <> 'src0') AS tr
), ratio AS (
  SELECT s.range AS b,
         ln((coalesce(tc.ct, 0) + 1.0) / (tt + 256.0))
         - ln((coalesce(rc.cr, 0) + 1.0) / (tr + 256.0)) AS r
  FROM range(0, 256) s
  LEFT JOIN tc ON s.range = tc.b
  LEFT JOIN rc ON s.range = rc.b
  CROSS JOIN tot
), docb AS (
  SELECT doc_id, b, count(*) AS c
  FROM hashed WHERE source <> 'src0' GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(floor(sum(c * r) * 1000000 + 0.5) AS BIGINT) AS w_micro
FROM docb JOIN ratio USING (b)
GROUP BY doc_id
ORDER BY w_micro DESC, doc_id LIMIT 100
"""


@_q("q_quality_classifier")
def q_quality_classifier(spark, sf_dir):
    """Verifiable quality-classifier INFERENCE (round 11 — the curation
    stage published pipelines fill with a fasttext/logistic quality
    filter over CommonCrawl, e.g. GPT-3's and LLaMA's quality
    classifiers; `operators/selection.py:classifier_score`): a
    hashed-feature LINEAR model — here the deterministic seed-wordlist
    baseline such classifiers bootstrap from — scores every document in
    fixed-point integer micro-logits over md5-bucketed unigram+bigram
    features, and the 100 highest-quality docs are selected with
    doc-id tie-breaks.  The DuckDB oracle rebuilds the whole pipeline —
    tokenization, bucketing, the bucket-summed weight table (hash
    collisions and all), the integer dot product, the bias — so
    featurization, model assembly, and scoring are checked end-to-end
    cross-engine; no float ever crosses engines.

    Scale shape: the featurization is a codegen row projection
    (posexplode, never an interpreted lambda), the per-(doc, bucket)
    count is one partial-aggregated word-count-shaped shuffle, the
    model is a broadcast join (<= n_buckets rows by construction), and
    the top-k is TakeOrderedAndProject — a 100 TB corpus scores in one
    pass, hot buckets absorbed map-side."""
    from ..operators.selection import classifier_score, seed_word_weights

    good = ["spark", "query", "merge", "window", "vector"]
    bad = ["slow", "small", "batch"]
    w = seed_word_weights(spark, good, bad, w_micro=1_000_000,
                          n_buckets=1024, verifiable=True)
    d = load(spark, sf_dir, "documents")
    scored = classifier_score(d, "doc_id", "text", w,
                              bias_micro=250_000, n_buckets=1024,
                              verifiable=True)
    return scored.orderBy(F.desc("logit_micro"), "doc_id").limit(100)


ORACLE_SQL["q_quality_classifier"] = """
WITH vocab(g, w) AS (
  VALUES ('spark', 1000000), ('query', 1000000), ('merge', 1000000),
         ('window', 1000000), ('vector', 1000000),
         ('slow', -1000000), ('small', -1000000), ('batch', -1000000)
), model AS (
  SELECT ('0x' || substr(md5(g), 1, 15))::BIGINT % 1024 AS b,
         CAST(sum(w) AS BIGINT) AS w_micro
  FROM vocab GROUP BY b
), toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ws
  FROM documents
), feats AS (
  SELECT doc_id,
         unnest(list_concat(
           ws,
           [ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i AS INTEGER) + 1]
            for i in range(1, len(ws))])) AS g
  FROM toks WHERE len(ws) > 0
), hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5(g), 1, 15))::BIGINT % 1024 AS b
  FROM feats
), counts AS (
  SELECT doc_id, b, count(*) AS c FROM hashed GROUP BY doc_id, b
), dot AS (
  SELECT doc_id, CAST(sum(c * w_micro) AS BIGINT) AS d
  FROM counts JOIN model USING (b) GROUP BY doc_id
)
SELECT doc_id,
       CAST(coalesce(dot.d, 0) + 250000 AS BIGINT) AS logit_micro
FROM (SELECT DISTINCT doc_id FROM documents)
LEFT JOIN dot USING (doc_id)
ORDER BY logit_micro DESC, doc_id LIMIT 100
"""


@_q("q_mixture_sample")
def q_mixture_sample(spark, sf_dir):
    """Temperature-weighted MIXTURE SAMPLING (round 11 — the
    source-mixing stage between curation and packing; the GPT-3/LLaMA
    per-source sampling-weights rule ``n_s^T`` with T = 0.5 boosting
    small sources against the bulk one; `operators/selection.py:
    mixture_sample`): 60 documents are apportioned across the LANGUAGE
    groups (en dominates the corpus, so T < 1 visibly reweights) by
    integer largest-remainder quotas over micro-unit ``sqrt(n)``
    weights — arithmetic DuckDB reproduces bit-for-bit — and each
    group's selection is its quota-smallest documents by the portable
    md5 hash of the id.  No RNG anywhere: the same 60 documents on
    every run and every engine, which is what makes a training-data
    mixture auditable.

    Scale shape: quotas are a source-cardinality collect; selection is
    a plain filter below each source's boundary SPLIT BUCKET plus a
    window over only that one bucket (~n_s/1024 rows) — never a window
    over a whole source, so the half-the-corpus bulk source cannot
    concentrate on one task (the substring-dedup lesson applied at
    design time)."""
    from ..operators.selection import mixture_sample

    d = load(spark, sf_dir, "documents")
    sel = mixture_sample(d, "doc_id", "lang", total=60,
                         temperature=0.5, verifiable=True)
    return (sel.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_sel"),
                 F.sum("doc_id").alias("sum_ids"),
                 F.min("doc_id").alias("min_id")))


ORACLE_SQL["q_mixture_sample"] = """
WITH counts AS (
  SELECT lang, count(*) AS n FROM documents GROUP BY lang
), w AS (
  SELECT lang, n,
         CAST(floor(sqrt(n) * 1000000 + 0.5) AS BIGINT) AS wi
  FROM counts
), tot AS (
  SELECT CAST(sum(wi) AS BIGINT) AS ww FROM w
), shares AS (
  SELECT lang, (60 * wi) // ww AS base, (60 * wi) % ww AS rem
  FROM w CROSS JOIN tot
), give AS (
  SELECT lang, base,
         row_number() OVER (ORDER BY rem DESC, lang) AS rk
  FROM shares
), quota AS (
  SELECT lang,
         base + CASE WHEN rk <= 60 - (SELECT sum(base) FROM shares)
                     THEN 1 ELSE 0 END AS q
  FROM give
), hashed AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           AS h
  FROM documents
), ranked AS (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang ORDER BY h % 1024, h, doc_id) AS rk
  FROM hashed
), sel AS (
  SELECT r.lang, r.doc_id
  FROM ranked r JOIN quota USING (lang)
  WHERE r.rk <= q
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_sel,
       CAST(sum(doc_id) AS BIGINT) AS sum_ids,
       CAST(min(doc_id) AS BIGINT) AS min_id
FROM sel GROUP BY lang
"""
