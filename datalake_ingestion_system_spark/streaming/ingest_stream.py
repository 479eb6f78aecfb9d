"""Streaming ingestion: the daily batch job as a Structured Streaming flow.

``Trigger.AvailableNow`` over a text file stream reproduces the reference's
"daily job over whatever is new" exactly (SURVEY §2.7): the checkpoint's file
tracking replaces ``processed_list.json`` (D:116/263-271/402-405) with a
transactional log — the reference's thread-unsafe shared-list bug (§0.3.6)
becomes structurally impossible.

Routing semantics match plans.ingest: every file in a micro-batch lands in
exactly one of {PROCESSED, UNMATCH, OUTOFCONFIG, IRREGULAR} (files with zero
rows never surface in a text stream, so EMPTY is tracked by the checkpoint
alone).  Parsing happens from the already-streamed lines (no second read).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.landing import FILENAME_RE
from ..sources.registry import validate_registry


def _route_batch(batch: DataFrame, conf: DataFrame,
                 delimiter: str = ",") -> DataFrame:
    """Per-file routing for one micro-batch of (filename, value) lines."""
    # F.split takes a Java regex — escape so '|' or '.' delimiters split
    # literally, matching the batch path (landing.file_stats)
    stats = (
        batch.groupBy("filename")
        .agg(F.count("*").alias("n_rows"),
             F.max(F.size(F.split("value", re.escape(delimiter), -1)))
              .cast("int").alias("n_cols"))
    )
    table = F.regexp_extract("filename", FILENAME_RE, 1)
    datestr = F.regexp_extract("filename", FILENAME_RE, 2)
    files = stats.select(
        "filename", "n_rows", "n_cols",
        F.when(table != "", table).alias("table"),
        F.try_to_date(F.when(datestr != "", datestr), "yyyyMMdd")
         .alias("snapshot_date"),
    )
    c = conf.withColumnRenamed("TABLE", "conf_table")
    joined = files.join(
        F.broadcast(c),
        (files.table == c.conf_table)
        & (files.snapshot_date >= c.start_date)
        & (files.snapshot_date < c.end_date),
        "left",
    )
    return joined.select(
        "filename", "n_rows", "n_cols", "table", "snapshot_date",
        "head_list", "feq",
        F.when(F.col("table").isNull() | F.col("snapshot_date").isNull(),
               "IRREGULAR")
         .when(F.col("conf_table").isNull(), "OUTOFCONFIG")
         .when(F.col("n_cols") != F.size("head_list"), "UNMATCH")
         .otherwise("OK").alias("route"),
    )


def start_ingest_stream(spark: SparkSession,
                        landing_dir: str,
                        storing_dir: str,
                        conf: DataFrame,
                        checkpoint_dir: str,
                        quarantine_dir: str,
                        delimiter: str = ",",
                        encoding: str = "UTF-8",
                        available_now: bool = True):
    """Start the streaming ingestion; returns the StreamingQuery.

    With ``available_now`` the stream drains current files and stops — call
    per schedule for daily-batch parity, or pass False for continuous tail.
    ``encoding`` is the landing charset (K7), matching the batch path.
    """
    validate_registry(conf)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    lines = (
        spark.readStream.option("encoding", encoding).text(f"{landing_dir}/*")
        .select(F.element_at(F.split(F.input_file_name(), "/"), -1)
                 .alias("filename"), "value")
    )

    def process_batch(batch: DataFrame, epoch_id: int) -> None:
        batch = batch.persist()
        routed = _route_batch(batch, conf, delimiter).persist()
        groups = (
            routed.filter(F.col("route") == "OK")
            .groupBy("table", "feq", "head_list")
            .agg(F.collect_list("filename").alias("filenames"))
            .collect()
        )
        for g in groups:
            fields = F.split("value", re.escape(delimiter), -1)
            df = (
                batch.filter(F.col("filename").isin(g.filenames))
                .withColumn(
                    "TRANSFERRED_DATE",
                    F.to_date(F.regexp_extract("filename", FILENAME_RE, 2),
                              "yyyyMMdd"))
                .select(
                    *[fields[i].alias(c) for i, c in enumerate(g.head_list)],
                    "TRANSFERRED_DATE")
            )
            (df.repartition("TRANSFERRED_DATE")
               .write.mode("overwrite")
               .partitionBy("TRANSFERRED_DATE")
               .parquet(f"{storing_dir}/{g.feq}/{g.table}"))
        quarantined = (
            routed.filter(F.col("route") != "OK")
            .select(
                F.col("filename").alias("FILENAME"),
                F.lit("").alias("HEADER_LIST"),
                F.coalesce(F.col("n_cols").cast("string"), F.lit(""))
                 .alias("HEADER_CNT"),
                F.coalesce(F.concat_ws("|", "head_list"), F.lit(""))
                 .alias("META_HEADER_LIST"),
                F.coalesce(F.size("head_list").cast("string"), F.lit(""))
                 .alias("META_HEADER_CNT"),
                F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss")
                 .alias("START_EXEC_TIME"),
                F.col("route").alias("TYPE"))
        )
        if quarantined.head(1):
            quarantined.write.mode("append").parquet(quarantine_dir)
        routed.unpersist()
        batch.unpersist()

    writer = (lines.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
