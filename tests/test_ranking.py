"""Unit tests for ranking (TF-IDF / BM25), PII redaction, and the
TermStats UDTF — hand-computed expectations on tiny corpora."""

import pytest

import math

import pyspark.sql.functions as F

from datalake_ingestion_system_spark.operators import text as text_ops
from datalake_ingestion_system_spark.operators.ranking import (bm25_scores,
                                                               tfidf_top_terms)


def _docs(spark):
    return spark.createDataFrame(
        [(0, "spark spark shuffle"),
         (1, "spark partition"),
         (2, "window sort merge")],
        "doc_id long, text string")


def test_tfidf_hand_computed(spark):
    out = {(r.doc_id, r.term): r.tfidf
           for r in tfidf_top_terms(_docs(spark), "doc_id", "text", k=3).collect()}
    # 'spark' appears in 2 of 3 docs: idf = ln(4/3) + 1; doc 0 tf = 2
    assert out[(0, "spark")] == round(2 * (math.log(4 / 3) + 1), 6)
    # 'shuffle' appears in 1 doc: idf = ln(4/2) + 1
    assert out[(0, "shuffle")] == round(1 * (math.log(2) + 1), 6)
    # rank within doc 0: spark (2.575) above shuffle (1.693)
    ranks = {r.term: r.rnk for r in
             tfidf_top_terms(_docs(spark), "doc_id", "text", k=3)
             .filter(F.col("doc_id") == 0).collect()}
    assert ranks["spark"] == 1 and ranks["shuffle"] == 2


def test_bm25_orders_by_relevance(spark):
    out = bm25_scores(_docs(spark), "doc_id", "text",
                      query_terms=["spark", "shuffle"], top_n=10).collect()
    by_rank = [r.doc_id for r in sorted(out, key=lambda r: r.rnk)]
    # doc 0 matches both terms (one twice), doc 1 one term, doc 2 none
    assert by_rank == [0, 1]
    assert {r.doc_id: r.n_matched_terms for r in out} == {0: 2, 1: 1}
    assert all(r.bm25 > 0 for r in out)


def test_redact_pii_counts_and_replaces(spark):
    df = spark.createDataFrame(
        [(0, "mail a.b@x.io and c@y.org call 555-123-4567"),
         (1, "ssn 123-45-6789 plain text"),
         (2, "nothing here")],
        "id long, t string")
    rows = {r.id: r for r in text_ops.redact_pii(df, "t").collect()}
    assert (rows[0].n_emails, rows[0].n_phones, rows[0].n_ssns) == (2, 1, 0)
    assert (rows[1].n_emails, rows[1].n_phones, rows[1].n_ssns) == (0, 0, 1)
    assert rows[0].t_redacted == "mail [EMAIL] and [EMAIL] call [PHONE]"
    assert rows[1].t_redacted == "ssn [SSN] plain text"
    assert rows[2].t_redacted == "nothing here"


def test_udtf_term_stats_lateral(spark):
    from datalake_ingestion_system_spark.functions.udtf_fns import \
        register_udtfs
    register_udtfs(spark)
    spark.createDataFrame([(0, "A b a: b b?")], "doc_id long, text string") \
        .createOrReplaceTempView("_udtf_t")
    rows = {r.term: r for r in spark.sql(
        "SELECT d.doc_id, t.* FROM _udtf_t d, LATERAL TermStats(d.text) t"
    ).collect()}
    assert rows["a"].first_pos == 0 and rows["a"].n_occurrences == 2
    assert rows["b"].first_pos == 1 and rows["b"].n_occurrences == 3
    assert set(rows) == {"a", "b"}


def test_quantization_error_bound(spark):
    """Symmetric int8 quantization: per-element |v - q/scale| ≤ 0.5/scale,
    so the summed fixed-point error obeys recon_err_fp ≤ dim · 0.5/scale ·
    1e9 for every vector (the dequantization bound; outputs are integer
    fixed-point — scale_fp = floor(scale·1e6), recon_err_fp =
    Σ floor(err_i·1e9) — for cross-engine hash determinism)."""
    import __spark_entry__ as e
    dim = 64  # embeddings.embedding width in the generated testdata
    out = e.queries()["q_embedding_quantize"](
        spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    for r in out:
        assert -127 <= r.q_min <= r.q_max <= 127
        scale = r.scale_fp / 1e6
        assert r.recon_err_fp / 1e9 <= dim * 0.5 / scale + 1e-6


def test_redact_idempotent(spark):
    """Redacting already-redacted text is a no-op (placeholders don't match
    any PII pattern) — safe to re-run the scrub over a partially-clean lake."""
    df = spark.createDataFrame(
        [(0, "mail a.b@x.io call 555-123-4567 ssn 123-45-6789")],
        "id long, t string")
    once = text_ops.redact_pii(df, "t").select(
        "id", F.col("t_redacted").alias("t"))
    twice = text_ops.redact_pii(once, "t").collect()[0]
    assert twice.t_redacted == twice.t
    assert (twice.n_emails, twice.n_phones, twice.n_ssns) == (0, 0, 0)


def test_weighted_sample_deterministic_and_biased(spark):
    """The md5-coin weighted sample is identical across partitionings
    (unlike seeded sample()) and keeps high-quality docs at a higher rate."""
    import __spark_entry__ as e
    q = e.queries()["q_weighted_sample"]
    a = sorted(r.doc_id for r in q(spark, "/root/testdata/sf0.001").collect())
    b = sorted(r.doc_id for r in q(spark, "/root/testdata/sf0.001").collect())
    assert a == b and len(a) > 0
    rows = q(spark, "/root/testdata/sf0.001").collect()
    assert all(r.u < r.quality / 200.0 for r in rows)


@pytest.mark.slow
def test_dsir_weights_invariants(spark):
    """DSIR selection invariants: weights are partitioning-invariant,
    target rows are never scored, a candidate sharing the target's
    vocabulary outranks a disjoint one, and both hash families agree
    on the RANKING (bucket values differ)."""
    from datalake_ingestion_system_spark.operators.selection import (
        dsir_topk, dsir_weights)
    from pyspark.sql import functions as F

    rows = [
        (0, "alpha beta gamma alpha beta", "target"),
        (1, "alpha beta gamma beta alpha gamma", "target"),
        (2, "alpha beta gamma alpha", "pool"),       # target-like
        (3, "delta epsilon zeta delta epsilon", "pool"),  # disjoint
        (4, "alpha delta beta epsilon", "pool"),     # mixed
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, src string")
    for verifiable in (True, False):
        w = dsir_weights(d, "doc_id", "text", F.col("src") == "target",
                         n_buckets=64, verifiable=verifiable)
        got = {r.doc_id: r.w_micro for r in w.collect()}
        assert set(got) == {2, 3, 4}           # target rows unscored
        assert got[2] > got[4] > got[3]        # vocabulary ordering
        # partitioning invariance: exact same micro-weights
        got_rep = {r.doc_id: r.w_micro for r in dsir_weights(
            d.repartition(7), "doc_id", "text",
            F.col("src") == "target", n_buckets=64,
            verifiable=verifiable).collect()}
        assert got_rep == got
        top = dsir_topk(d, "doc_id", "text", F.col("src") == "target",
                        k=2, n_buckets=64, verifiable=verifiable)
        assert [r.doc_id for r in top.collect()] == [2, 4]
    # top-k plans as TakeOrderedAndProject, ratio side broadcast
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_classifier_score_invariants(spark):
    """Quality-classifier inference invariants (round 11): fixed-point
    integer scoring is partitioning-invariant, empty/featureless docs
    score exactly the bias (and never drop), the seed-word model
    orders documents by vocabulary, the model join is a broadcast, and
    both hash families produce the same ordering."""
    from pyspark.sql import functions as F

    from datalake_ingestion_system_spark.operators.selection import (
        classifier_score, seed_word_weights)

    rows = [
        (0, "spark spark query merge good stuff"),   # strongly good
        (1, "spark slow"),                           # mixed
        (2, "slow slow batch batch"),                # strongly bad
        (3, ""),                                     # featureless
        (4, "neutral words only here"),              # no model hits
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    for verifiable in (True, False):
        w = seed_word_weights(spark, ["spark", "query", "merge"],
                              ["slow", "batch"], n_buckets=512,
                              verifiable=verifiable)
        got = {r.doc_id: r.logit_micro for r in classifier_score(
            d, "doc_id", "text", w, bias_micro=100,
            n_buckets=512, verifiable=verifiable).collect()}
        assert set(got) == {0, 1, 2, 3, 4}      # every doc scored
        assert got[3] == 100                    # empty text = bias
        assert got[0] > got[1] > got[2]
        assert got[2] < 0 < got[0]
        # partitioning invariance: EXACT integer equality
        got_rep = {r.doc_id: r.logit_micro for r in classifier_score(
            d.repartition(7), "doc_id", "text", w, bias_micro=100,
            n_buckets=512, verifiable=verifiable).collect()}
        assert got_rep == got
    scored = classifier_score(d, "doc_id", "text", w,
                              n_buckets=512)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # bigrams participate: a doc repeating a good bigram outranks the
    # same unigram bag shuffled (feature = unigrams ++ bigrams)
    d2 = spark.createDataFrame(
        [(10, "spark query spark query"), (11, "query spark query spark")],
        "doc_id long, text string")
    w2 = seed_word_weights(spark, ["spark query"], [], n_buckets=512,
                           verifiable=True)
    got2 = {r.doc_id: r.logit_micro for r in classifier_score(
        d2, "doc_id", "text", w2, n_buckets=512,
        verifiable=True).collect()}
    assert got2[10] > got2[11] > 0


def test_mixture_quotas_arithmetic(spark):
    """Integer largest-remainder temperature quotas: exact totals,
    T < 1 boosts small sources, T = 1 is proportional, clamping
    re-apportions deterministically."""
    from datalake_ingestion_system_spark.operators.selection import (
        mixture_quotas)

    counts = {"web": 9000, "books": 900, "code": 100}
    q1 = mixture_quotas(counts, 100, temperature=1.0)
    assert sum(q1.values()) == 100
    assert q1 == {"web": 90, "books": 9, "code": 1}
    q5 = mixture_quotas(counts, 100, temperature=0.5)
    assert sum(q5.values()) == 100
    # sqrt weights: 94.87 : 30 : 10 → small sources up-weighted
    assert q5["code"] > q1["code"] and q5["books"] > q1["books"]
    assert q5["web"] < q1["web"]
    # clamping: a source smaller than its share caps at its size and
    # the freed slots flow to sources with headroom
    qc = mixture_quotas({"big": 1000, "tiny": 3}, 500, temperature=0.5)
    assert qc["tiny"] == 3 and qc["big"] == 497
    # degenerate totals
    assert sum(mixture_quotas(counts, 0).values()) == 0
    qall = mixture_quotas({"a": 2, "b": 1}, 3)
    assert qall == {"a": 2, "b": 1}


def test_mixture_sample_exact_deterministic_and_skew_safe(spark):
    """Selection sizes equal the quotas, the same ids come back under
    any partitioning, and the boundary-bucket window sees ~n/n_split
    rows — never a whole source."""
    from pyspark.sql import functions as F

    from datalake_ingestion_system_spark.operators.selection import (
        mixture_quotas, mixture_sample)

    docs = (spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 3600, "bulk").otherwise("rare")
        .alias("src")))
    counts = {"bulk": 3600, "rare": 400}
    quota = mixture_quotas(counts, 100, temperature=0.5)
    sel = mixture_sample(docs, "doc_id", "src", total=100,
                         temperature=0.5, verifiable=True)
    got = {r[0]: r[1] for r in
           sel.groupBy("src").agg(F.count(F.lit(1))).collect()}
    assert got == quota and sum(got.values()) == 100
    sel2 = mixture_sample(docs.repartition(17), "doc_id", "src",
                          total=100, temperature=0.5, verifiable=True)
    assert sorted(r[0] for r in sel.collect()) \
        == sorted(r[0] for r in sel2.collect())
    # hash families agree on SIZES (ids differ — different hash)
    got_x = {r[0]: r[1] for r in
             mixture_sample(docs, "doc_id", "src", total=100,
                            temperature=0.5, verifiable=False)
             .groupBy("src").agg(F.count(F.lit(1))).collect()}
    assert got_x == quota
    # skew-safety: the window input is one bucket per source —
    # orders of magnitude below the source size
    hx = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                            1, 15), 16, 10).cast("long")
    per_bucket = (docs.select("src", F.pmod(hx, F.lit(1024)).alias("b"))
                  .groupBy("src", "b").count()
                  .agg(F.max("count")).head()[0])
    assert per_bucket <= 16, "bucket split must bound window input"
