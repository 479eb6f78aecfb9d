"""Relevance ranking over the document corpus: TF-IDF and BM25.

The standard retrieval stack a training-data pipeline needs for
query-driven corpus slicing ("pull the top-k docs about X") and for
per-source vocabulary profiling.  Both operators are pure DataFrame
compositions — explode → two partial-aggregated shuffles → broadcast
join of the (tiny) term-statistics side — so they scale like any
word-count: no window over the whole corpus, and the term-stats
broadcast is |vocabulary|-sized, not |corpus|-sized.  The only
driver-side values are single scalars (corpus size, average length) —
config-scale, not data-scale.

Scores are rounded before ranking (row_number on the rounded value with
a deterministic tie-break) so orderings are stable under floating-point
reassociation across engines and partitionings — the same contract as
``similarity.brute_force_topk``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textfns import tokens


def tfidf_top_terms(df: DataFrame, id_col: str, text_col: str,
                    k: int = 3, round_digits: int = 6) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF.

    tf = in-document term count; idf = ln((N + 1)/(df + 1)) + 1 (smoothed
    so corpus-universal terms keep a positive weight).  Plan: one explode,
    a (doc, term) count agg, a term→doc-frequency agg over the already
    distinct (doc, term) rows — both map-side partial — then a broadcast
    join of the vocabulary-sized idf table back onto the doc-term counts.
    """
    n_docs = df.select(id_col).distinct().count()  # scalar, config-scale
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    idf = (tf.groupBy("term")
           .agg(F.count("*").alias("df"))
           .withColumn("idf", F.log((F.lit(n_docs) + 1.0)
                                    / (F.col("df") + 1.0)) + 1.0))
    scored = (tf.join(F.broadcast(idf), "term")
              .select(F.col(id_col), "term",
                      F.round(F.col("tf") * F.col("idf"),
                              round_digits).alias("tfidf")))
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


def bm25_scores(df: DataFrame, id_col: str, text_col: str,
                query_terms: list[str], top_n: int = 10,
                k1: float = 1.2, b: float = 0.75,
                round_digits: int = 6) -> DataFrame:
    """Okapi BM25 document scores for a bag-of-words query; top ``top_n``.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)); the per-term contribution
    uses the usual saturation/length normalization.  The explode is
    filtered to the query terms BEFORE any shuffle (predicate on the
    generated column), so the aggregated rows are |matching docs| ×
    |query terms| — at 100 TB the post-filter volume is what shuffles,
    not the corpus."""
    n_docs = df.select(id_col).distinct().count()  # scalar, config-scale
    lens = df.select(F.col(id_col), F.size(tokens(text_col)).alias("dl"))
    avg_dl = lens.agg(F.avg("dl")).head()[0]  # scalar; None on empty input
    if avg_dl is None:
        # empty corpus (or all-null text): no document can score — return
        # an empty frame with the output schema instead of a TypeError
        return df.sparkSession.createDataFrame(
            [], f"`{id_col}` {dict(df.dtypes)[id_col]}, bm25 double, "
                "n_matched_terms bigint, rnk int")
    avg_len = float(avg_dl)
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = (tok.filter(F.col("term").isin(query_terms))
          .groupBy(id_col, "term").agg(F.count("*").alias("tf")))
    idf = (tf.groupBy("term")
           .agg(F.countDistinct(id_col).alias("df"))
           .withColumn("idf", F.log(
               1.0 + (F.lit(n_docs) - F.col("df") + 0.5)
               / (F.col("df") + 0.5))))
    contrib = (tf.join(F.broadcast(idf), "term")
               .join(lens, id_col)
               .select(
                   F.col(id_col),
                   (F.col("idf") * F.col("tf") * (k1 + 1.0)
                    / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl")
                                           / F.lit(avg_len)))).alias("c")))
    scored = (contrib.groupBy(id_col)
              .agg(F.round(F.sum("c"), round_digits).alias("bm25"),
                   F.count("*").alias("n_matched_terms")))
    # top-N via orderBy+limit (plans as TakeOrderedAndProject: per-partition
    # heads merged on one reducer — never a global single-task window over
    # all matching docs); the row_number then runs over only top_n rows.
    top = scored.orderBy(F.desc("bm25"), F.asc(id_col)).limit(top_n)
    w = Window.orderBy(F.desc("bm25"), F.asc(id_col))
    return top.withColumn("rnk", F.row_number().over(w))


def rrf_fuse(ranked_a: DataFrame, ranked_b: DataFrame, id_col: str,
             rank_a: str = "r_a", rank_b: str = "r_b",
             k: int = 60, top_n: int = 10,
             round_digits: int = 9) -> DataFrame:
    """Reciprocal-rank fusion of two ranked retrieval arms:
    score(d) = Σ 1/(k + rank_arm(d)), missing arm contributes 0 — the
    standard score-free way to combine lexical (BM25) and semantic
    (embedding) retrieval.  Inputs are the (id, rank) frames of each arm;
    both are candidate-list sized, so the full-outer join is tiny
    regardless of corpus size.  Top-N via orderBy+limit
    (TakeOrderedAndProject)."""
    fused = (ranked_a.join(ranked_b, id_col, "full_outer")
             .select(
                 F.col(id_col),
                 F.round(
                     F.coalesce(1.0 / (F.lit(k) + F.col(rank_a)), F.lit(0.0))
                     + F.coalesce(1.0 / (F.lit(k) + F.col(rank_b)),
                                  F.lit(0.0)),
                     round_digits).alias("rrf"),
                 rank_a, rank_b))
    top = fused.orderBy(F.desc("rrf"), F.asc(id_col)).limit(top_n)
    w = Window.orderBy(F.desc("rrf"), F.asc(id_col))
    return top.withColumn("rnk", F.row_number().over(w))
