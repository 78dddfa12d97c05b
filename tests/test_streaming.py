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


def test_stream_assemble_stateful(spark, transcripts, tmp_path):
    """applyInPandasWithState assembly: a conversation whose turns are
    SPLIT ACROSS micro-batches converges to the full batch assembly
    (state carries earlier turns forward); update-mode emissions grow
    monotonically per conversation."""
    from energy_aware_entity_resolution_spark.operators.assemble import (
        assemble_conversations,
    )
    from energy_aware_entity_resolution_spark.streaming.structured import (
        stream_assemble_conversations,
    )

    sample = transcripts.where(
        F.col("conv_id").isin("conv_00000000", "conv_00000003")
    ).cache()
    # chunk by TURN index so each conversation spans both micro-batches
    src = str(tmp_path / "asrc")
    for c in range(2):
        (
            sample.where(F.pmod("turn_idx", F.lit(2)) == c)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(src, f"part{c}"))
        )
    import glob
    import shutil

    flat = os.path.join(src, "flat")
    os.makedirs(flat, exist_ok=True)
    for c in range(2):
        for i, f in enumerate(
            sorted(glob.glob(os.path.join(src, f"part{c}", "part-*.parquet")))
        ):
            shutil.copy(f, os.path.join(flat, f"c{c}_{i}.parquet"))

    stream = (
        spark.readStream.schema(sample.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    q = (
        stream_assemble_conversations(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("assembled_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT * FROM assembled_stream"
    ).collect()
    # final (most complete) emission per conversation == batch assembly;
    # keyed by max n_turns so the check is emission-order-independent
    last = {}
    for r in rows:
        if r["conv_id"] not in last or r["n_turns"] > last[r["conv_id"]]["n_turns"]:
            last[r["conv_id"]] = r
    expect = {
        r["conv_id"]: r
        for r in assemble_conversations(sample).select(
            "conv_id", "n_turns", "doc"
        ).collect()
    }
    assert set(last) == set(expect)
    for cid in expect:
        assert last[cid]["n_turns"] == expect[cid]["n_turns"]
        assert last[cid]["doc"] == expect[cid]["doc"]
    # at least one conversation emitted a partial then the full doc
    assert len(rows) > len(expect)


def test_stream_assemble_idle_timeout_evicts_state(spark, transcripts, tmp_path):
    """With idle_timeout_ms, conversations idle across a later trigger
    are finalized (state evicted, NO re-emission) while new data still
    processes — bounded state at scale (W3 idle finalization)."""
    from energy_aware_entity_resolution_spark.streaming.structured import (
        stream_assemble_conversations,
    )

    old = transcripts.where(F.col("conv_id") == "conv_00000000")
    new = transcripts.where(F.col("conv_id") == "conv_00000003")
    src = str(tmp_path / "tsrc")
    os.makedirs(src, exist_ok=True)
    ckpt = str(tmp_path / "tckpt")
    outdir = str(tmp_path / "tout")

    def run_once():
        # foreachBatch parquet sink: checkpoint-recoverable (memory
        # sink queries cannot resume), so the second availableNow run
        # continues the SAME query and processing-time timeouts fire
        stream = (
            spark.readStream.schema(transcripts.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream_assemble_conversations(stream, idle_timeout_ms=1)
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda df, eid: df.write.mode("append").parquet(outdir)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    import glob
    import shutil

    def stage(df, name):
        tmp = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
            shutil.copy(f, os.path.join(src, f"{name}_{i}.parquet"))

    # without data-driven batches only, Spark spins no-data
    # micro-batches to fire pending timeouts — dozens of empty batches
    # here; the run-2 DATA batch is enough to fire run-1's timeout
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        stage(old, "a")
        run_once()
        import time

        time.sleep(1.5)  # exceed the 1 ms idle timeout
        stage(new, "b")
        run_once()
    finally:
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    rows = spark.read.parquet(outdir).collect()
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    # old conversation: exactly its run-1 emission, nothing re-emitted
    # on timeout; new conversation processed normally in run 2
    assert len(by_conv["conv_00000000"]) == 1
    assert len(by_conv["conv_00000003"]) == 1
    assert by_conv["conv_00000003"][0]["n_turns"] == new.count()


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


def test_stream_incremental_er_global_mode_matches_batch(
    spark, transcripts, tmp_path
):
    """The foreachBatch path shares process_one_batch with the chunked
    loop, so GLOBAL decision configs (mutual/ratio) must also converge
    to the single-shot batch result through the streaming surface."""
    from energy_aware_entity_resolution_spark.config import (
        BlockingConfig,
        ScoringConfig,
    )
    from energy_aware_entity_resolution_spark.plans import run_pipeline
    from energy_aware_entity_resolution_spark.streaming.incremental import (
        accumulated_matches,
        resolve_clusters,
    )

    cfg = PipelineConfig(
        blocking=BlockingConfig(use_sorted_neighborhood=False),
        scoring=ScoringConfig(mutual_only=True, ratio_threshold=1.05),
    )
    src = _stage_parquet_chunks(spark, transcripts, str(tmp_path / "gsrc"), 3)
    state = str(tmp_path / "gstate")
    q = stream_incremental_er(
        file_reader(spark, src, max_files_per_trigger=1),
        cfg,
        state_dir=state,
        checkpoint_dir=str(tmp_path / "gckpt"),
    )
    q.awaitTermination(300)

    batch = run_pipeline(transcripts, cfg)
    got = {
        (r["conv_id_a"], r["conv_id_b"])
        for r in accumulated_matches(spark, state).collect()
    }
    want = {(r["conv_id_a"], r["conv_id_b"]) for r in batch.matches.collect()}
    assert got == want

    def sets(df):
        groups = {}
        for r in df.collect():
            groups.setdefault(r["component_id"], set()).add(r["conv_id"])
        return {frozenset(v) for v in groups.values()}

    assert sets(resolve_clusters(spark, state)) == sets(batch.clusters)


def test_foreachbatch_epoch_replay_is_idempotent(spark, transcripts, tmp_path):
    """foreachBatch is at-least-once: re-delivering an epoch after its
    done marker was written (crash before the checkpoint WAL commit)
    must be a no-op — without the guard the replay re-ingests the same
    records under a new batch id, and in global mode the duplicated
    scored pairs (s2 == s1) would revoke genuine ratio-test matches."""
    from energy_aware_entity_resolution_spark.config import (
        BlockingConfig,
        ScoringConfig,
    )
    from energy_aware_entity_resolution_spark.streaming.incremental import (
        accumulated_matches,
        last_complete_batch,
    )
    from energy_aware_entity_resolution_spark.streaming.structured import (
        make_process_batch,
    )

    cfg = PipelineConfig(
        blocking=BlockingConfig(use_sorted_neighborhood=False),
        scoring=ScoringConfig(ratio_threshold=1.05),
    )
    state = str(tmp_path / "replay_state")
    pb = make_process_batch(cfg, state)
    pb(transcripts, epoch_id=0)
    assert last_complete_batch(state) == 0
    before = {
        (r["conv_id_a"], r["conv_id_b"])
        for r in accumulated_matches(spark, state).collect()
    }
    assert before  # the fixture plants real matches
    pb(transcripts, epoch_id=0)  # REPLAY of the same epoch
    assert last_complete_batch(state) == 0  # no new batch ingested
    after = {
        (r["conv_id_a"], r["conv_id_b"])
        for r in accumulated_matches(spark, state).collect()
    }
    assert after == before  # nothing revoked, nothing duplicated
    pb(transcripts, epoch_id=1)  # a NEW epoch still processes
    assert last_complete_batch(state) == 1


def test_replay_guard_scoped_to_checkpointed_query(spark, transcripts, tmp_path):
    """Epoch ids restart at 0 per checkpoint location: a NEW query
    (fresh checkpoint_dir) over the same state_dir must NOT skip its
    epoch 0 just because an old query committed an epoch 0 — the
    replay guard is keyed on (checkpoint scope, epoch). A replay
    within ONE scope is still skipped."""
    from energy_aware_entity_resolution_spark.streaming.incremental import (
        last_complete_batch,
    )
    from energy_aware_entity_resolution_spark.streaming.structured import (
        make_process_batch,
    )

    cfg = PipelineConfig()
    state = str(tmp_path / "scoped_state")
    q1 = make_process_batch(cfg, state, run_scope=str(tmp_path / "ckpt1"))
    q1(transcripts, epoch_id=0)
    assert last_complete_batch(state) == 0
    q1(transcripts, epoch_id=0)  # same-scope replay: skipped
    assert last_complete_batch(state) == 0
    # a fresh query (new checkpoint) restarts epochs at 0 — must RUN
    q2 = make_process_batch(cfg, state, run_scope=str(tmp_path / "ckpt2"))
    q2(transcripts, epoch_id=0)
    assert last_complete_batch(state) == 1


def test_stream_threshold_mode_snapshot_opt_out(spark, transcripts, tmp_path):
    """scored_snapshots=False: the lean threshold-mode stream skips the
    widest-intermediate write entirely and still converges."""
    import os

    from energy_aware_entity_resolution_spark.streaming.incremental import (
        resolve_clusters,
    )

    src = _stage_parquet_chunks(spark, transcripts, str(tmp_path / "lsrc"), 2)
    state = str(tmp_path / "lstate")
    q = stream_incremental_er(
        file_reader(spark, src, max_files_per_trigger=1),
        PipelineConfig(),
        state_dir=state,
        checkpoint_dir=str(tmp_path / "lckpt"),
        scored_snapshots=False,
    )
    q.awaitTermination(300)
    assert not os.path.isdir(os.path.join(state, "scored_rounds"))
    assert resolve_clusters(spark, state).count() > 0


def test_replay_guard_accepts_legacy_bare_markers(spark, transcripts, tmp_path):
    """Markers committed before the scoped-marker format existed are
    bare str(epoch_id). A resumed pre-upgrade stream (now passing
    run_scope) must still recognize those epochs as processed — else
    it re-ingests them under fresh batch ids, the silent global-mode
    revocation the guard documents."""
    import os

    from energy_aware_entity_resolution_spark.config import (
        BlockingConfig,
        ScoringConfig,
    )
    from energy_aware_entity_resolution_spark.streaming.incremental import (
        last_complete_batch,
    )
    from energy_aware_entity_resolution_spark.streaming.structured import (
        make_process_batch,
    )

    cfg = PipelineConfig(
        blocking=BlockingConfig(use_sorted_neighborhood=False),
        scoring=ScoringConfig(ratio_threshold=1.05),
    )
    state = str(tmp_path / "legacy_marker_state")
    # legacy epoch 0: committed under the pre-upgrade bare marker
    legacy = make_process_batch(cfg, state, run_scope=None)
    legacy(transcripts, epoch_id=0)
    assert last_complete_batch(state) == 0
    with open(f"{state}/done/_DONE_0000") as f:
        assert f.read() == "0"  # bare format, by construction
    # post-upgrade resume of the SAME query, now scoped: epoch 0
    # replay must be skipped via the legacy marker
    upgraded = make_process_batch(
        cfg, state, run_scope=str(tmp_path / "ckpt_legacy")
    )
    upgraded(transcripts, epoch_id=0)
    assert last_complete_batch(state) == 0  # not re-ingested
    upgraded(transcripts, epoch_id=1)  # new epochs still process
    assert last_complete_batch(state) == 1


def test_legacy_markers_adopted_by_first_scoped_query_only(
    spark, transcripts, tmp_path
):
    """ADVICE r05: the bare-marker fallback must not be permanent. The
    FIRST scoped query over a pre-upgrade state adopts the bare
    markers (its replayed epochs skip); a LATER query with a different
    scope attached to the same state processes its epoch 0 normally
    instead of silently inheriting the old markers."""
    from energy_aware_entity_resolution_spark.config import (
        BlockingConfig,
        ScoringConfig,
    )
    from energy_aware_entity_resolution_spark.streaming.incremental import (
        last_complete_batch,
    )
    from energy_aware_entity_resolution_spark.streaming.structured import (
        make_process_batch,
    )

    cfg = PipelineConfig(
        blocking=BlockingConfig(use_sorted_neighborhood=False),
        scoring=ScoringConfig(ratio_threshold=1.05),
    )
    state = str(tmp_path / "adopt_state")
    legacy = make_process_batch(cfg, state, run_scope=None)
    legacy(transcripts, epoch_id=0)
    assert last_complete_batch(state) == 0
    # first scoped query adopts: its epoch 0 replay is skipped
    first = make_process_batch(cfg, state, run_scope=str(tmp_path / "ck1"))
    first(transcripts, epoch_id=0)
    assert last_complete_batch(state) == 0
    # a DIFFERENT query's epoch 0 is NOT covered by the adopted
    # markers — it processes normally (the pre-fix fallback skipped it)
    second = make_process_batch(cfg, state, run_scope=str(tmp_path / "ck2"))
    second(transcripts, epoch_id=0)
    assert last_complete_batch(state) == 1


def test_stream_global_mode_with_state_folds(
    spark, transcripts, tmp_path, monkeypatch
):
    """State folds × the streaming twin: with the compaction cadence
    forced low, the foreachBatch stream's epochs fire the features /
    scored / matches / clusters folds mid-stream, and the final state
    still equals the single-shot batch run. Closes the last fold ×
    execution-mode combination (the chunked loop is covered in
    test_incremental)."""
    import os

    import energy_aware_entity_resolution_spark.streaming.incremental as inc
    from energy_aware_entity_resolution_spark.config import (
        BlockingConfig,
        ScoringConfig,
    )
    from energy_aware_entity_resolution_spark.plans import run_pipeline
    from energy_aware_entity_resolution_spark.streaming.incremental import (
        accumulated_matches,
        resolve_clusters,
    )

    monkeypatch.setattr(inc, "_CLUSTER_COMPACT_EVERY", 2)
    cfg = PipelineConfig(
        blocking=BlockingConfig(use_sorted_neighborhood=False),
        scoring=ScoringConfig(mutual_only=True, ratio_threshold=1.05),
    )
    src = _stage_parquet_chunks(spark, transcripts, str(tmp_path / "fsrc"), 4)
    state = str(tmp_path / "fstate")
    q = stream_incremental_er(
        file_reader(spark, src, max_files_per_trigger=1),
        cfg,
        state_dir=state,
        checkpoint_dir=str(tmp_path / "fckpt"),
    )
    q.awaitTermination(300)

    assert os.path.exists(f"{state}/features_compact/batch=2/_SUCCESS")
    assert os.path.exists(f"{state}/scored_compact/round=2/_SUCCESS")
    batch = run_pipeline(transcripts, cfg)
    got = {
        (r["conv_id_a"], r["conv_id_b"])
        for r in accumulated_matches(spark, state).collect()
    }
    want = {(r["conv_id_a"], r["conv_id_b"]) for r in batch.matches.collect()}
    assert got == want

    def sets(df):
        groups = {}
        for r in df.collect():
            groups.setdefault(r["component_id"], set()).add(r["conv_id"])
        return {frozenset(v) for v in groups.values()}

    assert sets(resolve_clusters(spark, state)) == sets(batch.clusters)
    batch.release()
