"""JSONL source: schema-pinned parsing, corrupt-line quarantine, streaming
twin — the source-tier extension mirroring the CSV ingest's quarantine
contract (K3) for newline-delimited JSON feeds."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField, StructType)

from datalake_ingestion_system_spark.sources import jsonl

SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("name", StringType()),
])


def _write_lines(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_good_and_corrupt_split_one_scan(spark, tmp_path):
    p = str(tmp_path / "feed.jsonl")
    _write_lines(p, [
        json.dumps({"id": 1, "name": "a"}),
        "{not json at all",
        json.dumps({"id": 2, "name": "b"}),
        '{"id": "NaNopeNotALong", "name": "c"}',  # type mismatch -> corrupt
    ])
    good, quar, release = jsonl.read_jsonl(spark, p, SCHEMA)
    assert sorted((r.id, r.name) for r in good.collect()) == [
        (1, "a"), (2, "b")]
    q = quar.collect()
    assert len(q) == 2
    assert all(r.src_file.endswith("feed.jsonl") for r in q)
    assert any("not json" in r.raw_line for r in q)
    # the cached parsed batch must be droppable by the caller — the review
    # found the original API returned no handle, pinning one parsed copy
    # per call in executor storage for the session lifetime
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert before >= 1
    release()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() < before


def test_missing_fields_are_forward_compatible_nulls(spark, tmp_path):
    p = str(tmp_path / "drift.jsonl")
    _write_lines(p, [
        json.dumps({"id": 5}),                          # name absent -> NULL
        json.dumps({"id": 6, "name": "x", "extra": 1}),  # extra ignored
    ])
    good, quar, release = jsonl.read_jsonl(spark, p, SCHEMA)
    assert quar.count() == 0
    rows = {r.id: r.name for r in good.collect()}
    assert rows == {5: None, 6: "x"}
    release()


def test_strict_mode_fails_fast_on_corruption(spark, tmp_path):
    p = str(tmp_path / "bad.jsonl")
    _write_lines(p, [json.dumps({"id": 1, "name": "a"}), "oops"])
    with pytest.raises(Exception):
        jsonl.read_jsonl_strict(spark, p, SCHEMA).collect()


def test_schema_must_not_predeclare_corrupt_column(spark):
    # build the bad schema fresh: StructType.add mutates its receiver, and
    # SCHEMA is shared across tests
    bad = StructType(list(SCHEMA.fields)
                     + [StructField("_corrupt_record", StringType())])
    with pytest.raises(ValueError):
        jsonl.read_jsonl(spark, "/nonexistent", bad)


def test_streaming_twin_routes_corrupt_in_batch(spark, tmp_path):
    src = tmp_path / "stream_in"
    os.makedirs(src)
    _write_lines(str(src / "f1.jsonl"), [
        json.dumps({"id": 1, "name": "a"}),
        "corrupt-line",
    ])
    stream = jsonl.stream_jsonl(spark, f"{src}/*.jsonl", SCHEMA)
    assert stream.isStreaming
    out = (stream.writeStream.format("memory").queryName("jsonl_t")
           .trigger(availableNow=True).start())
    out.awaitTermination()
    rows = spark.sql("SELECT * FROM jsonl_t").collect()
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert [(r.id, r.name) for r in good] == [(1, "a")]
    assert len(bad) == 1 and "corrupt-line" in bad[0]._corrupt_record
