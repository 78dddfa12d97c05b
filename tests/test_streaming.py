"""Structured Streaming surface: file-source micro-batches drive the
incremental ER loop via foreachBatch + AvailableNow (W1/W3/W4), and the
watermarked window agg compiles and produces rows."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from energy_aware_entity_resolution_spark.config import PipelineConfig
from energy_aware_entity_resolution_spark.plans import run_pipeline
from energy_aware_entity_resolution_spark.streaming.structured import (
    file_reader,
    stream_incremental_er,
    windowed_turn_counts,
)


def _stage_parquet_chunks(spark, transcripts, path, n_chunks=3):
    chunked = transcripts.withColumn(
        "_c", F.pmod(F.xxhash64("conv_id"), F.lit(n_chunks))
    )
    for c in range(n_chunks):
        (
            chunked.where(F.col("_c") == c)
            .drop("_c")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(path, f"chunk={c}"))
        )
    # flatten: move part files into one dir so maxFilesPerTrigger
    # sees one file per chunk
    import glob
    import shutil

    os.makedirs(os.path.join(path, "flat"), exist_ok=True)
    for c in range(n_chunks):
        for i, f in enumerate(
            sorted(glob.glob(os.path.join(path, f"chunk={c}", "part-*.parquet")))
        ):
            shutil.copy(f, os.path.join(path, "flat", f"chunk{c}_{i}.parquet"))
    return os.path.join(path, "flat")


def test_stream_incremental_er_matches_batch(spark, transcripts, tmp_path):
    src = _stage_parquet_chunks(spark, transcripts, str(tmp_path / "src"), 3)
    state = str(tmp_path / "state")
    q = stream_incremental_er(
        file_reader(spark, src, max_files_per_trigger=1),
        PipelineConfig(),
        state_dir=state,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    from energy_aware_entity_resolution_spark.streaming.incremental import (
        last_complete_batch,
        resolve_clusters,
    )

    assert last_complete_batch(state) == 2  # three micro-batches committed
    final = resolve_clusters(spark, state)

    batch_res = run_pipeline(transcripts, PipelineConfig())

    def parts(df):
        groups = {}
        for r in df.collect():
            groups.setdefault(r["component_id"], set()).add(r["conv_id"])
        return {frozenset(v) for v in groups.values()}

    assert parts(final) == parts(batch_res.clusters)


def test_parse_kafka_value_roundtrip(spark, transcripts):
    """The Kafka value-decode expression (shared verbatim by
    kafka_reader) reconstructs transcript rows from JSON payloads and
    tolerates malformed records (NULL fields, no batch failure)."""
    from energy_aware_entity_resolution_spark.streaming.structured import (
        parse_kafka_value,
    )

    sample = transcripts.limit(50)
    payloads = sample.select(
        F.to_json(
            F.struct("conv_id", "turn_idx", "role", "text", "tool", "ts")
        ).cast("binary").alias("value")
    )
    bad = spark.createDataFrame(
        [(bytearray(b"{not json"),)], "value binary"
    )
    parsed = parse_kafka_value(payloads.unionByName(bad))
    good = parsed.where(F.col("conv_id").isNotNull())
    assert good.count() == 50
    back = good.select(*sample.columns)
    assert back.exceptAll(sample).isEmpty()
    assert sample.exceptAll(back).isEmpty()
    assert parsed.where(F.col("conv_id").isNull()).count() == 1


def test_windowed_turn_counts_streaming(spark, transcripts, tmp_path):
    src_dir = str(tmp_path / "wsrc")
    transcripts.write.mode("overwrite").parquet(src_dir)
    stream = (
        spark.readStream.schema(transcripts.schema).parquet(src_dir)
    )
    agg = windowed_turn_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows; completeness is
    # not the contract here — the streaming plan executing is
    rows = spark.sql("SELECT * FROM win_counts").collect()
    assert q.lastProgress is not None
