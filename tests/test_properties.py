"""Property-based + edge-case tests (hypothesis) for the operator layer.

Each property pins an invariant a refactor could silently break:
- MinHash signatures are a pure function of text — invariant under
  partitioning/row order;
- salted_join is result-equivalent to the plain join for any data;
- exact_dedup keeps exactly one representative (the min id) per
  normalized-text class;
- operators accept empty input without erroring (the reference's P10
  empty-file class, generalized).

Spark-session-per-example would be minutes per case, so examples are
drawn small, deadline disabled, and the session reused.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from datalake_ingestion_system_spark.operators import dedup
from datalake_ingestion_system_spark.operators.skew import salted_join

_words = st.sampled_from(
    ["spark", "lake", "row", "agg", "join", "the", "fast", "slow"])
_texts = st.lists(_words, min_size=0, max_size=12).map(" ".join)
_SET = settings(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(texts=st.lists(_texts, min_size=1, max_size=8))
@_SET
@pytest.mark.slow
def test_minhash_invariant_under_partitioning(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = dedup.minhash_signatures(df, "doc_id", "text", num_hashes=8)
    b = dedup.minhash_signatures(
        df.repartition(7, "text").sortWithinPartitions(F.desc("doc_id")),
        "doc_id", "text", num_hashes=8)
    assert {(r.doc_id, tuple(r.minhash or [])) for r in a.collect()} == \
           {(r.doc_id, tuple(r.minhash or [])) for r in b.collect()}


@given(keys=st.lists(st.integers(0, 5), min_size=0, max_size=30),
       salts=st.integers(1, 5))
@_SET
@pytest.mark.slow
def test_salted_join_equivalent_to_plain(spark, keys, salts):
    fact = spark.createDataFrame(
        [(k, i) for i, k in enumerate(keys)] or [(None, None)],
        "k long, v long").filter(F.col("k").isNotNull())
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(4)], "k long, name string")
    plain = sorted((r.k, r.v, r.name) for r in fact.join(dim, "k").collect())
    salted = sorted((r.k, r.v, r.name) for r in
                    salted_join(fact, dim, "k", salts=salts).collect())
    assert plain == salted


@given(texts=st.lists(_texts, min_size=1, max_size=10))
@_SET
def test_exact_dedup_keeps_min_id_per_class(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = dedup.exact_dedup(df, "doc_id", "text").collect()
    import re
    classes = {}
    for i, t in rows:
        classes.setdefault(re.sub(r"\s+", " ", t.lower()).strip(), []).append(i)
    assert {(r.keep_id, r.n_copies) for r in got} == \
           {(min(v), len(v)) for v in classes.values()}


def test_operators_accept_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert dedup.minhash_signatures(empty, "doc_id", "text").count() == 0
    assert dedup.exact_dedup(empty, "doc_id", "text").count() == 0
    assert dedup.simhash(empty, "doc_id", "text").count() == 0
    from datalake_ingestion_system_spark.operators.text import profile_table
    prof = profile_table(empty).collect()
    assert {r.column for r in prof} == {"doc_id", "text"}
    assert all(r.n_rows == 0 for r in prof)


@pytest.mark.slow
def test_empty_corpus_scalar_guards(spark, tmp_path):
    """The driver-scalar class ADVICE r4 flagged on bm25 (float(None) on an
    empty corpus), swept across every other `.head()[0]` site: full
    pipelines and registered queries must return typed empty frames, not
    TypeErrors, when their input tables are empty."""
    import __spark_entry__ as e
    sf = str(tmp_path)
    for name, schema in [
            ("documents", "doc_id long, source string, text string"),
            ("events", "event_id long, user_id long, event_type string, "
                       "ts timestamp, value double"),
            ("embeddings", "vec_id long, label string, "
                           "embedding array<float>")]:
        spark.createDataFrame([], schema).write.parquet(f"{sf}/{name}.parquet")
    qs = e.queries()
    for q in ("q_source_kl_divergence", "q_mixture_resample",
              "q_rfm_segmentation", "q_bm25_search"):
        assert qs[q](spark, sf).count() == 0, q
    # full minhash pipeline over an empty corpus (lsh_candidate_pairs guard)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert dedup.minhash_near_dup_pairs(
        empty, "doc_id", "text", verifiable=True).count() == 0


@given(n_frames=st.integers(1, 200_000),
       rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
       channels=st.integers(1, 2),
       sampwidth=st.sampled_from([1, 2, 4]))
@settings(max_examples=40, deadline=None)
def test_wav_duration_parser_matches_stdlib_writer(n_frames, rate, channels,
                                                   sampwidth):
    """_parse_wav_duration_ms must agree with the stdlib wave module's own
    frame accounting for any PCM layout it can write: duration_ms ==
    round(frames / rate * 1000)."""
    import io
    import wave

    from datalake_ingestion_system_spark.operators.multimodal import (
        _parse_wav_duration_ms)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        w.writeframes(b"\x00" * (n_frames * channels * sampwidth))
    got = _parse_wav_duration_ms(buf.getvalue())
    assert got == round(n_frames * 1000 / rate)


def test_wav_parser_rejects_non_wav_payloads():
    from datalake_ingestion_system_spark.operators.multimodal import (
        _parse_wav_duration_ms)
    assert _parse_wav_duration_ms(b"") is None
    assert _parse_wav_duration_ms(b"RIFFxxxxWAVE") is None        # too short
    assert _parse_wav_duration_ms(b"\x89PNG" + bytes(60)) is None  # not RIFF
    # RIFF/WAVE magic but no fmt/data chunks
    assert _parse_wav_duration_ms(b"RIFF" + bytes(4) + b"WAVE"
                                  + b"JUNK" + (8).to_bytes(4, "little")
                                  + bytes(8) + bytes(16)) is None


@given(s=st.integers(-10**15, 10**15), n=st.integers(1, 10**6))
@settings(max_examples=200, deadline=None)
def test_pmod_floor_division_cross_engine(s, n):
    """The fixed-point tier's floor-division identity — ``(s - pmod(s, n))
    / n`` == mathematical floor(s / n) — holds for DuckDB's operators over
    any sign of ``s`` (Spark's DIV shares C-style truncation + sign-of-
    dividend %, so DuckDB parity implies Spark parity; the Spark side is
    pinned on real data by test_similarity and the k-means oracle gate)."""
    import duckdb

    got = duckdb.sql(
        f"SELECT (CAST({s} AS BIGINT) - ((({s} % {n}) + {n}) % {n})) // {n}"
    ).fetchone()[0]
    assert int(got) == s // n  # Python // is true floor
