"""Incremental micro-batch mode (W1/W4/C4): converges to the batch
result and resumes from a kill (north_rule checkpoint/resume)."""

from __future__ import annotations

from pyspark.sql import functions as F

from energy_aware_entity_resolution_spark.config import PipelineConfig
from energy_aware_entity_resolution_spark.plans import run_pipeline
from energy_aware_entity_resolution_spark.streaming.incremental import (
    last_complete_batch,
    round_evaluation_timeseries,
    run_incremental,
)


def _cluster_sets(df):
    """Cluster partition as a set of frozensets (component ids differ
    between incremental and batch runs; the partition must not)."""
    groups = {}
    for r in df.collect():
        groups.setdefault(r["component_id"], set()).add(r["conv_id"])
    return {frozenset(v) for v in groups.values()}


def test_incremental_matches_batch_partition(spark, transcripts, tmp_path):
    batch = run_pipeline(transcripts, PipelineConfig())
    inc = run_incremental(
        transcripts, PipelineConfig(), str(tmp_path / "state"), n_batches=3
    )
    assert _cluster_sets(inc) == _cluster_sets(batch.clusters)


def test_incremental_resume_after_kill(spark, transcripts, tmp_path):
    state = str(tmp_path / "state2")
    cfg = PipelineConfig()
    # run only the first 2 of 4 batches ("crash" after batch 1)
    first = transcripts.withColumn(
        "_b", F.pmod(F.xxhash64("conv_id"), F.lit(4))
    )
    run_incremental(
        first.where(F.col("_b") <= 1).drop("_b"), cfg,
        state, n_batches=2,
    )
    # pretend those two completed batches belong to a 4-batch run:
    # resume must process batches 2..3 only and converge
    assert last_complete_batch(state) == 1
    final = run_incremental(transcripts, cfg, state, n_batches=4, resume=True)
    full = run_incremental(
        transcripts, cfg, str(tmp_path / "state3"), n_batches=4
    )
    assert _cluster_sets(final) == _cluster_sets(full)


def test_incremental_round_snapshots_written(spark, transcripts, tmp_path):
    state = str(tmp_path / "state4")
    run_incremental(transcripts, PipelineConfig(), state, n_batches=2)
    rounds = spark.read.parquet(f"{state}/scored_rounds")
    assert {r["round"] for r in rounds.select("round").distinct().collect()} == {0, 1}


def test_incremental_writes_proportional_to_batch(spark, transcripts, tmp_path):
    """The O(T²) regression gate: per-batch FEATURE rows written equal
    that batch's conversation count (append-only deltas), never the
    accumulated state; match deltas are disjoint across batches; the
    component state is remap records only (bounded by merges)."""
    state = str(tmp_path / "state5")
    n_batches = 3
    run_incremental(transcripts, PipelineConfig(), state, n_batches=n_batches)

    batched = transcripts.select("conv_id").distinct().withColumn(
        "_b", F.pmod(F.xxhash64("conv_id"), F.lit(n_batches))
    )
    expected = {
        r["_b"]: r["n"]
        for r in batched.groupBy("_b").agg(F.count("*").alias("n")).collect()
    }
    feats = spark.read.parquet(f"{state}/features")
    written = {
        r["batch"]: r["n"]
        for r in feats.groupBy("batch").agg(F.count("*").alias("n")).collect()
    }
    assert written == expected  # each conv written exactly once, in its batch
    # sum of per-batch writes == total state (no wholesale rewrites)
    assert sum(written.values()) == transcripts.select("conv_id").distinct().count()

    matches = spark.read.parquet(f"{state}/matches")
    per_pair = (
        matches.groupBy("conv_id_a", "conv_id_b").count().where(F.col("count") > 1)
    )
    assert per_pair.count() == 0  # deltas: a pair decided in exactly one batch

    remaps = spark.read.parquet(f"{state}/remaps")
    n_matches = matches.count()
    assert remaps.count() <= 2 * n_matches  # component state bounded by merges


def test_incremental_matches_batch_global_configs(spark, transcripts, tmp_path):
    """W4 with GLOBAL decision semantics: ratio test + mutual_only read
    full neighborhoods, so the incremental mode re-decides over
    accumulated scored state each round. Final matches AND the cluster
    partition must equal the single-shot batch run (sorted-neighborhood
    off in both so candidate sets coincide exactly)."""
    from energy_aware_entity_resolution_spark.config import (
        BlockingConfig,
        ScoringConfig,
    )
    from energy_aware_entity_resolution_spark.streaming.incremental import (
        accumulated_matches,
    )

    cfg = PipelineConfig(
        blocking=BlockingConfig(use_sorted_neighborhood=False),
        scoring=ScoringConfig(mutual_only=True, ratio_threshold=1.05),
    )
    batch = run_pipeline(transcripts, cfg)
    state = str(tmp_path / "state_glob")
    inc = run_incremental(transcripts, cfg, state, n_batches=3)
    assert _cluster_sets(inc) == _cluster_sets(batch.clusters)
    got = {
        (r["conv_id_a"], r["conv_id_b"])
        for r in accumulated_matches(spark, state).collect()
    }
    want = {
        (r["conv_id_a"], r["conv_id_b"]) for r in batch.matches.collect()
    }
    assert got == want


def test_batch_audit_records(spark, transcripts, tmp_path):
    """Per-batch audit: every incremental round writes a wall-
    attribution record (reference analog of the Kafka consumer's
    per-window logging) with mode and decision-path provenance."""
    from energy_aware_entity_resolution_spark.config import (
        BlockingConfig,
        ScoringConfig,
    )
    from energy_aware_entity_resolution_spark.streaming.incremental import (
        read_batch_audit,
    )

    state = str(tmp_path / "audit_thr")
    run_incremental(transcripts, PipelineConfig(), state, n_batches=2)
    rows = read_batch_audit(spark, state).collect()
    assert [r["batch"] for r in rows] == [0, 1]
    assert all(r["mode"] == "threshold" for r in rows)
    assert all(r["decide_path"] == "delta" for r in rows)
    assert all(r["total_s"] > 0 for r in rows)

    gcfg = PipelineConfig(
        blocking=BlockingConfig(use_sorted_neighborhood=False),
        scoring=ScoringConfig(mutual_only=True, ratio_threshold=1.05),
    )
    gstate = str(tmp_path / "audit_glob")
    run_incremental(transcripts, gcfg, gstate, n_batches=2)
    grows = {r["batch"]: r for r in read_batch_audit(spark, gstate).collect()}
    assert grows[0]["decide_path"] == "initial"
    assert grows[1]["decide_path"] in ("full", "neighborhood")
    assert all(r["mode"] == "global" for r in grows.values())


def test_global_neighborhood_equals_full_on_dense_graphs(
    spark, tmp_path, monkeypatch
):
    """The closure argument under adversarial density: conversations
    built from a SMALL shared vocab pool, so blocks overlap heavily
    and one batch's new pairs can flip ratio/mutual decisions deep in
    the existing graph. The forced-neighborhood path must produce
    bit-identical match state and cluster partitions to the forced
    full re-decision, across seeds."""
    import random
    from datetime import datetime

    import energy_aware_entity_resolution_spark.streaming.incremental as inc
    from energy_aware_entity_resolution_spark.config import (
        BlockingConfig,
        ScoringConfig,
    )
    from energy_aware_entity_resolution_spark.streaming.incremental import (
        accumulated_matches,
    )

    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    vocab = [f"tok{i}" for i in range(12)]  # tiny pool -> dense overlap
    cfg = PipelineConfig(
        blocking=BlockingConfig(use_sorted_neighborhood=False),
        scoring=ScoringConfig(mutual_only=True, ratio_threshold=1.05),
    )

    def mk_transcripts(seed):
        rnd = random.Random(seed)
        rows = []
        for i in range(36):
            words = rnd.sample(vocab, k=rnd.randint(4, 7))
            for t in range(2):
                rows.append(
                    (f"c{i:02d}", t, "user", " ".join(words),
                     None, datetime(2026, 1, 1, 0, 0, t))
                )
        return spark.createDataFrame(rows, schema)

    def state_of(state_dir):
        matches = {
            (r["conv_id_a"], r["conv_id_b"])
            for r in accumulated_matches(spark, state_dir).collect()
        }
        return matches

    for seed in (1, 7, 23):
        t = mk_transcripts(seed)
        monkeypatch.setattr(inc, "_FULL_REDECIDE_MAX_RATIO", 0.0)
        nb = run_incremental(
            t, cfg, str(tmp_path / f"nb{seed}"), n_batches=3
        )
        nb_state = state_of(str(tmp_path / f"nb{seed}"))
        monkeypatch.setattr(inc, "_FULL_REDECIDE_MAX_RATIO", float("inf"))
        fl = run_incremental(
            t, cfg, str(tmp_path / f"fl{seed}"), n_batches=3
        )
        fl_state = state_of(str(tmp_path / f"fl{seed}"))
        assert nb_state == fl_state, f"seed {seed}: match sets differ"
        assert _cluster_sets(nb) == _cluster_sets(fl), f"seed {seed}"
        monkeypatch.undo()


def test_global_cluster_ledger_compaction(spark, transcripts, tmp_path, monkeypatch):
    """Ledger compaction: every K-th global batch folds the full
    current assignment into its partition and drops a marker, after
    which reads prune to [compaction, now]. Proof of pruning: deleting
    every pre-compaction batch partition must not change the resolved
    clusters."""
    import shutil

    import energy_aware_entity_resolution_spark.streaming.incremental as inc
    from energy_aware_entity_resolution_spark.config import (
        BlockingConfig,
        ScoringConfig,
    )
    from energy_aware_entity_resolution_spark.streaming.incremental import (
        resolve_clusters,
    )

    monkeypatch.setattr(inc, "_CLUSTER_COMPACT_EVERY", 2)
    cfg = PipelineConfig(
        blocking=BlockingConfig(use_sorted_neighborhood=False),
        scoring=ScoringConfig(mutual_only=True, ratio_threshold=1.05),
    )
    state = str(tmp_path / "gstate_compact")
    inc_clusters = run_incremental(transcripts, cfg, state, n_batches=4)
    want = _cluster_sets(inc_clusters)
    # markers for batches 2 (and nothing else <= 1)
    import os

    assert os.path.exists(f"{state}/clusters_compact/2")
    batch = run_pipeline(transcripts, cfg)
    assert want == _cluster_sets(batch.clusters)
    # reads must not touch pre-compaction partitions: delete them
    for b in (0, 1):
        shutil.rmtree(f"{state}/clusters/batch={b}")
    assert _cluster_sets(resolve_clusters(spark, state)) == want
    # match-set snapshot at the same cadence, same pruning proof:
    # accumulated_matches must survive deleting pre-snapshot deltas
    from energy_aware_entity_resolution_spark.streaming.incremental import (
        accumulated_matches,
    )

    assert os.path.exists(f"{state}/matches_compact/batch=2/_SUCCESS")
    want_m = {
        (r["conv_id_a"], r["conv_id_b"])
        for r in batch.matches.collect()
    }
    for b in (0, 1):
        shutil.rmtree(f"{state}/matches/batch={b}")
        shutil.rmtree(f"{state}/revoked/batch={b}")
    got_m = {
        (r["conv_id_a"], r["conv_id_b"])
        for r in accumulated_matches(spark, state).collect()
    }
    assert got_m == want_m
    batch.release()


def test_incremental_resume_after_kill_global_mode(spark, transcripts, tmp_path):
    """Kill/resume under GLOBAL decision configs: the add+revoke delta
    state AND the per-batch cluster ledger must survive a restart —
    resuming batches 2..3 over a 2-batch prefix converges to the same
    partition and match set as an uninterrupted 4-batch run."""
    from energy_aware_entity_resolution_spark.config import (
        BlockingConfig,
        ScoringConfig,
    )
    from energy_aware_entity_resolution_spark.streaming.incremental import (
        accumulated_matches,
    )

    cfg = PipelineConfig(
        blocking=BlockingConfig(use_sorted_neighborhood=False),
        scoring=ScoringConfig(mutual_only=True, ratio_threshold=1.05),
    )
    state = str(tmp_path / "gstate_resume")
    first = transcripts.withColumn(
        "_b", F.pmod(F.xxhash64("conv_id"), F.lit(4))
    )
    run_incremental(
        first.where(F.col("_b") <= 1).drop("_b"), cfg, state, n_batches=2
    )
    assert last_complete_batch(state) == 1
    final = run_incremental(transcripts, cfg, state, n_batches=4, resume=True)
    full_state = str(tmp_path / "gstate_full")
    full = run_incremental(transcripts, cfg, full_state, n_batches=4)
    assert _cluster_sets(final) == _cluster_sets(full)
    got = {
        (r["conv_id_a"], r["conv_id_b"])
        for r in accumulated_matches(spark, state).collect()
    }
    want = {
        (r["conv_id_a"], r["conv_id_b"])
        for r in accumulated_matches(spark, full_state).collect()
    }
    assert got == want


def test_global_mode_rereads_bounded_by_neighborhood(spark, tmp_path, monkeypatch):
    """The O(T²) gate for W4 GLOBAL configs: each batch's re-decision
    must run over pairs incident to the batch's affected neighborhood
    only — never the whole accumulated scored tree — and the cluster
    delta ledger must write only the touched region. Fixture: two
    vocab-disjoint communities; batch 2 introduces community B, so its
    re-decision must not read a single community-A pair, while the
    final state still equals the single-shot batch run."""
    from datetime import datetime

    import energy_aware_entity_resolution_spark.streaming.incremental as inc
    from energy_aware_entity_resolution_spark.config import (
        BlockingConfig,
        ScoringConfig,
    )
    from energy_aware_entity_resolution_spark.streaming.incremental import (
        accumulated_matches,
        process_one_batch,
        resolve_clusters,
    )

    def mk_rows(prefix, vocab, ids):
        rows = []
        for i in ids:
            for t in range(3):
                rows.append(
                    (f"{prefix}{i}", t, "user", f"{vocab} turn text",
                     None, datetime(2026, 1, 1, 0, 0, t))
                )
        return rows

    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    voc_a = "alpha beta gamma delta epsilon zeta"
    voc_b = "omega sigma upsilon kappa lambda xi"
    batches = [
        mk_rows("a", voc_a, range(4)),          # batch 0: A0..A3
        mk_rows("a", voc_a, range(4, 6)),       # batch 1: A4..A5
        mk_rows("b", voc_b, range(6)),          # batch 2: all of B
    ]
    cfg = PipelineConfig(
        blocking=BlockingConfig(use_sorted_neighborhood=False),
        scoring=ScoringConfig(mutual_only=True, ratio_threshold=1.05),
    )
    state = str(tmp_path / "state_bounded")

    captured = []
    real_decide = inc.decide_matches

    def spy(scored, c):
        captured.append(
            {(r["conv_id_a"], r["conv_id_b"]) for r in scored.collect()}
        )
        return real_decide(scored, c)

    monkeypatch.setattr(inc, "decide_matches", spy)
    # force the neighborhood path: the adaptive gate would route this
    # tiny fixture to the (cheaper-at-small-state) full re-decision
    monkeypatch.setattr(inc, "_FULL_REDECIDE_MAX_RATIO", 0.0)
    for b, rows in enumerate(batches):
        process_one_batch(
            spark, spark.createDataFrame(rows, schema), cfg, state, b
        )
    monkeypatch.undo()

    assert len(captured) == 3
    # batch 2's re-decision region: only community-B pairs
    b2_ids = {cid for pair in captured[2] for cid in pair}
    assert b2_ids and all(cid.startswith("b") for cid in b2_ids)
    # ... and strictly fewer pairs than the accumulated scored tree
    acc_total = spark.read.parquet(f"{state}/scored_rounds").count()
    assert len(captured[2]) < acc_total
    # cluster delta ledger: batch 2 writes only the touched (B) region
    cl2 = spark.read.parquet(f"{state}/clusters/batch=2")
    cl2_ids = {r["conv_id"] for r in cl2.select("conv_id").collect()}
    assert cl2_ids and all(cid.startswith("b") for cid in cl2_ids)

    # equivalence with the single-shot batch run on the full input
    all_rows = [r for rows in batches for r in rows]
    full = run_pipeline(spark.createDataFrame(all_rows, schema), cfg)
    got = {
        (r["conv_id_a"], r["conv_id_b"])
        for r in accumulated_matches(spark, state).collect()
    }
    want = {(r["conv_id_a"], r["conv_id_b"]) for r in full.matches.collect()}
    assert got == want
    assert _cluster_sets(resolve_clusters(spark, state)) == _cluster_sets(
        full.clusters
    )
    full.release()


def test_remap_distributed_resolution_no_driver_collect(spark, tmp_path, monkeypatch):
    """>10⁵ merge records resolved WITHOUT a driver collect: the
    distributed pointer-jumping path must produce exactly the driver
    path-compression result, and must never enter _collapse_remaps
    (the driver dict) when the row guard trips — the 100 TB OOM gate
    for C4 (reference propagation kafkaconsumer.py:549-620)."""
    import energy_aware_entity_resolution_spark.streaming.incremental as inc

    state = str(tmp_path / "remap_state")
    # forest with chain depth 3: 120k a→b, 1k b→c, 100 c→d0 (every
    # node's final root is d_0); one remap dir per batch, like _merge_step
    a = spark.range(120_000).selectExpr(
        "concat('a_', id) as old_root", "concat('b_', id % 1000) as new_root"
    )
    b = spark.range(1_000).selectExpr(
        "concat('b_', id) as old_root", "concat('c_', id % 100) as new_root"
    )
    c = spark.range(100).selectExpr(
        "concat('c_', id) as old_root", "'d_0' as new_root"
    )
    for i, df in enumerate((a, b, c)):
        df.write.mode("overwrite").parquet(f"{state}/remaps/batch={i}")

    driver, small = inc._read_remap_df(spark, state, 10)
    assert small  # 121.1k rows < default guard: driver path

    def _boom(rows):
        raise AssertionError("driver path-compression entered under guard")

    monkeypatch.setattr(inc, "_REMAP_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(inc, "_collapse_remaps", _boom)
    dist, small = inc._read_remap_df(spark, state, 10)
    assert not small
    assert dist.count() == 121_100
    assert dist.exceptAll(driver).count() == 0
    assert driver.exceptAll(dist).count() == 0
    assert (
        dist.select("new_root").distinct().collect()[0]["new_root"] == "d_0"
    )


def test_incremental_distributed_remap_end_to_end(
    spark, transcripts, tmp_path, monkeypatch
):
    """Forcing every remap read down the distributed path still
    converges to the batch partition (merge_step + resolve_clusters on
    the shuffle-join branch)."""
    import energy_aware_entity_resolution_spark.streaming.incremental as inc

    monkeypatch.setattr(inc, "_REMAP_DRIVER_MAX_ROWS", 0)
    batch = run_pipeline(transcripts, PipelineConfig())
    got = run_incremental(
        transcripts, PipelineConfig(), str(tmp_path / "state_dist"), n_batches=3
    )
    assert _cluster_sets(got) == _cluster_sets(batch.clusters)


def test_round_evaluation_timeseries(spark, transcripts, labeled_pairs, tmp_path):
    """The streaming-evaluation analog (reference
    evaluation_timeseires.py): per-round P/R/F1 over accumulated match
    deltas — tp monotone in rounds, final round perfect on the planted
    fixture (matching the batch F1 gate)."""
    state = str(tmp_path / "state_ts")
    n_batches = 3
    run_incremental(transcripts, PipelineConfig(), state, n_batches=n_batches)
    truth = labeled_pairs.where(F.col("label") == 1)
    ts = round_evaluation_timeseries(spark, state, truth).collect()
    assert [r["round"] for r in ts] == list(range(n_batches))
    tps = [r["tp"] for r in ts]
    assert tps == sorted(tps)  # deltas only accrue
    final = ts[-1]
    assert final["recall"] == 1.0 and final["precision"] == 1.0


def test_remap_resolution_random_forests(spark, tmp_path, monkeypatch):
    """Distributed pointer-jumping == driver path-compression on
    seeded random merge forests of varying depth/shape (each batch
    merges random current roots, like real incremental CC rounds)."""
    import random

    import energy_aware_entity_resolution_spark.streaming.incremental as inc

    for seed in (1, 2, 3):
        rnd = random.Random(seed)
        state = str(tmp_path / f"rf{seed}")
        roots = [f"n{i:03d}" for i in range(60)]
        for b in range(rnd.randint(2, 5)):
            rows = []
            # merge a random subset of current roots pairwise
            merged = rnd.sample(roots, k=rnd.randint(2, max(2, len(roots) // 3)))
            for i in range(0, len(merged) - 1, 2):
                a, c = merged[i], merged[i + 1]
                lo, hi = min(a, c), max(a, c)
                rows.append((hi, lo))  # hi demoted into lo
                roots.remove(hi)
            if not rows:
                rows = [("zzz_dummy", "n000")]
            spark.createDataFrame(
                rows, "old_root string, new_root string"
            ).write.mode("overwrite").parquet(f"{state}/remaps/batch={b}")
        driver, small = inc._read_remap_df(spark, state, 10**9)
        assert small
        monkeypatch.setattr(inc, "_REMAP_DRIVER_MAX_ROWS", 0)
        dist, small2 = inc._read_remap_df(spark, state, 10**9)
        monkeypatch.undo()
        assert not small2
        got = {(r["old_root"], r["new_root"]) for r in dist.collect()}
        want = {(r["old_root"], r["new_root"]) for r in driver.collect()}
        assert got == want


def test_round_timeseries_respects_revokes(spark, tmp_path):
    """Global-mode state: a pair added in round 0 and revoked in round
    1 must count in round 0's metrics and DISAPPEAR from round 1's —
    and uncommitted batches (no done marker) must be invisible."""
    import os

    state = str(tmp_path / "ts_rev")
    os.makedirs(f"{state}/done", exist_ok=True)
    spark.createDataFrame(
        [("a", "b", 0.9, "ratio")],
        "conv_id_a string, conv_id_b string, score double, decision string",
    ).write.parquet(f"{state}/matches/batch=0")
    spark.createDataFrame(
        [], "conv_id_a string, conv_id_b string"
    ).write.parquet(f"{state}/revoked/batch=0")
    spark.createDataFrame(
        [], "conv_id_a string, conv_id_b string, score double, decision string"
    ).write.parquet(f"{state}/matches/batch=1")
    spark.createDataFrame(
        [("a", "b")], "conv_id_a string, conv_id_b string"
    ).write.parquet(f"{state}/revoked/batch=1")
    # an UNCOMMITTED batch 2 re-adding the pair must not be read
    spark.createDataFrame(
        [("a", "b", 0.9, "ratio")],
        "conv_id_a string, conv_id_b string, score double, decision string",
    ).write.parquet(f"{state}/matches/batch=2")
    for b in (0, 1):
        open(f"{state}/done/_DONE_{b:04d}", "w").write("ok")

    from energy_aware_entity_resolution_spark.streaming.incremental import (
        accumulated_matches,
        round_evaluation_timeseries,
    )

    truth = spark.createDataFrame(
        [("a", "b")], "conv_id_a string, conv_id_b string"
    )
    ts = {r["round"]: r for r in round_evaluation_timeseries(spark, state, truth).collect()}
    assert ts[0]["tp"] == 1 and ts[1]["tp"] == 0
    assert accumulated_matches(spark, state).count() == 0  # committed view


def test_compaction_resume_after_crash_between_snapshot_and_marker(
    spark, transcripts, tmp_path, monkeypatch
):
    """Crash window: the matches_compact/batch=b snapshot committed
    (_SUCCESS written) but the done marker didn't land. The resumed
    batch b rebuilds the snapshot and must seed it from the PREVIOUS
    compaction — reading the batch=b snapshot it is about to overwrite
    raises 'Cannot overwrite a path that is also being read from' on
    every resume attempt (permanently wedged state)."""
    import os

    import energy_aware_entity_resolution_spark.streaming.incremental as inc
    from energy_aware_entity_resolution_spark.config import (
        BlockingConfig,
        ScoringConfig,
    )
    from energy_aware_entity_resolution_spark.streaming.incremental import (
        accumulated_matches,
    )

    monkeypatch.setattr(inc, "_CLUSTER_COMPACT_EVERY", 2)
    cfg = PipelineConfig(
        blocking=BlockingConfig(use_sorted_neighborhood=False),
        scoring=ScoringConfig(mutual_only=True, ratio_threshold=1.05),
    )
    state = str(tmp_path / "crash_state")
    # batches 0..2 of a 4-batch run complete (same pmod batching as
    # run_incremental so the resumed batch 2 holds the same convs);
    # batch 2 is a compaction batch
    batched = transcripts.withColumn(
        "_b", F.pmod(F.xxhash64("conv_id"), F.lit(4))
    )
    for b in range(3):
        inc.process_one_batch(
            spark, batched.where(F.col("_b") == b).drop("_b"), cfg, state, b
        )
    assert os.path.exists(f"{state}/matches_compact/batch=2/_SUCCESS")
    # simulate the crash: snapshot committed, done marker lost
    os.remove(f"{state}/done/_DONE_0002")
    assert last_complete_batch(state) == 1
    # resume replays batch 2 (rebuilding the snapshot in place) + 3
    final = run_incremental(transcripts, cfg, state, n_batches=4, resume=True)
    full_state = str(tmp_path / "crash_full")
    full = run_incremental(transcripts, cfg, full_state, n_batches=4)
    assert _cluster_sets(final) == _cluster_sets(full)
    got = {
        (r["conv_id_a"], r["conv_id_b"])
        for r in accumulated_matches(spark, state).collect()
    }
    want = {
        (r["conv_id_a"], r["conv_id_b"])
        for r in accumulated_matches(spark, full_state).collect()
    }
    assert got == want


def test_legacy_global_state_bootstraps_cluster_ledger(
    spark, transcripts, tmp_path
):
    """A pre-ledger (legacy) global-mode state dir has no ``clusters``
    tree. Resuming it must bootstrap the ledger with one full-CC
    compaction batch — not crash on the missing path, and not treat
    historically-clustered ids as singletons."""
    import os
    import shutil

    from energy_aware_entity_resolution_spark.config import (
        BlockingConfig,
        ScoringConfig,
    )

    cfg = PipelineConfig(
        blocking=BlockingConfig(use_sorted_neighborhood=False),
        scoring=ScoringConfig(mutual_only=True, ratio_threshold=1.05),
    )
    state = str(tmp_path / "legacy_state")
    first = transcripts.withColumn(
        "_b", F.pmod(F.xxhash64("conv_id"), F.lit(4))
    )
    run_incremental(
        first.where(F.col("_b") <= 1).drop("_b"), cfg, state, n_batches=2
    )
    # strip the ledger: what a pre-round-4 state dir looks like
    shutil.rmtree(f"{state}/clusters")
    if os.path.isdir(f"{state}/clusters_compact"):
        shutil.rmtree(f"{state}/clusters_compact")
    final = run_incremental(transcripts, cfg, state, n_batches=4, resume=True)
    full = run_incremental(
        transcripts, cfg, str(tmp_path / "legacy_full"), n_batches=4
    )
    assert _cluster_sets(final) == _cluster_sets(full)
    # the bootstrap left a committed compaction marker
    assert os.path.exists(f"{state}/clusters_compact/1")


def test_feature_and_scored_state_folds(
    spark, transcripts, tmp_path, monkeypatch
):
    """Round-5 state folds: every K-th batch folds the features tree
    (both modes) and, in global mode, the accumulated scored tree into
    a committed snapshot; accumulated reads then touch the snapshot +
    later deltas only. Proofs: (a) inputFiles of the pruned readers
    contain no pre-fold delta dir; (b) deleting the pre-fold delta
    dirs changes nothing; (c) the folded run's final state equals the
    single-shot batch run."""
    import os
    import shutil

    import energy_aware_entity_resolution_spark.streaming.incremental as inc
    from energy_aware_entity_resolution_spark.config import (
        BlockingConfig,
        ScoringConfig,
    )
    from energy_aware_entity_resolution_spark.streaming.incremental import (
        _accumulated_scored,
        accumulated_features,
        resolve_clusters,
    )

    monkeypatch.setattr(inc, "_CLUSTER_COMPACT_EVERY", 2)
    cfg = PipelineConfig(
        blocking=BlockingConfig(use_sorted_neighborhood=False),
        scoring=ScoringConfig(mutual_only=True, ratio_threshold=1.05),
    )
    state = str(tmp_path / "fold_state")
    inc_clusters = run_incremental(transcripts, cfg, state, n_batches=4)
    want = _cluster_sets(inc_clusters)
    batch = run_pipeline(transcripts, cfg)
    assert want == _cluster_sets(batch.clusters)
    batch.release()

    assert os.path.exists(f"{state}/features_compact/batch=2/_SUCCESS")
    assert os.path.exists(f"{state}/scored_compact/round=2/_SUCCESS")
    # (a) row parity: fold ∪ later deltas == the raw tree, exactly —
    # any pruning bug (filter lost, fold overlapping a delta) shows as
    # a count mismatch. (inputFiles() can't prove file pruning: it
    # lists the relation before partition-filter pushdown.)
    n_feats_raw = (
        spark.read.parquet(f"{state}/features")
        .where(F.col("batch") <= 3)
        .count()
    )
    assert accumulated_features(spark, state, 3).count() == n_feats_raw
    n_scored_raw = (
        spark.read.parquet(f"{state}/scored_rounds")
        .where(F.col("round") <= 3)
        .count()
    )
    assert _accumulated_scored(spark, state, 3).count() == n_scored_raw
    # (b) delete the pre-fold deltas: the pruned readers still resolve
    # the FULL state (same counts, same clusters) — proof they never
    # needed the deleted dirs and the folds carry their rows
    for b in (0, 1):
        shutil.rmtree(f"{state}/features/batch={b}")
        shutil.rmtree(f"{state}/scored_rounds/round={b}")
    assert accumulated_features(spark, state, 3).count() == n_feats_raw
    assert _accumulated_scored(spark, state, 3).count() == n_scored_raw
    assert _cluster_sets(resolve_clusters(spark, state)) == want


def test_feature_fold_resume_and_legacy_ledger(
    spark, transcripts, tmp_path, monkeypatch
):
    """Fold crash window + legacy states. (1) A crash after the
    features/scored folds committed (_SUCCESS) but before the done
    marker: the resumed fold batch rebuilds both snapshots seeded from
    the PREVIOUS fold (max_snapshot=b-1) — never the path it
    overwrites. (2) A legacy state without feat_counts ledger entries
    folds with no coalesce sizing instead of crashing."""
    import os

    import energy_aware_entity_resolution_spark.streaming.incremental as inc
    from energy_aware_entity_resolution_spark.config import (
        BlockingConfig,
        ScoringConfig,
    )

    monkeypatch.setattr(inc, "_CLUSTER_COMPACT_EVERY", 2)
    cfg = PipelineConfig(
        blocking=BlockingConfig(use_sorted_neighborhood=False),
        scoring=ScoringConfig(mutual_only=True, ratio_threshold=1.05),
    )
    state = str(tmp_path / "fold_crash")
    batched = transcripts.withColumn(
        "_b", F.pmod(F.xxhash64("conv_id"), F.lit(4))
    )
    for b in range(3):
        inc.process_one_batch(
            spark, batched.where(F.col("_b") == b).drop("_b"), cfg, state, b
        )
    assert os.path.exists(f"{state}/features_compact/batch=2/_SUCCESS")
    # legacy shape: pre-fold states carried no feat-count ledger
    os.remove(f"{state}/feat_counts/0000")
    # crash: folds committed, done marker lost
    os.remove(f"{state}/done/_DONE_0002")
    final = run_incremental(transcripts, cfg, state, n_batches=4, resume=True)
    full = run_incremental(
        transcripts, cfg, str(tmp_path / "fold_full"), n_batches=4
    )
    assert _cluster_sets(final) == _cluster_sets(full)


def test_batch_shuffle_partitions_scoped_and_equal(
    spark, transcripts, tmp_path
):
    """cfg.batch_shuffle_partitions lowers the session's
    shuffle-partition count for each micro-batch and restores it
    after; the final state is identical to the default-partition
    run (the knob changes physical parallelism only)."""
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    cfg = PipelineConfig(batch_shuffle_partitions=4)
    tuned = run_incremental(
        transcripts, cfg, str(tmp_path / "sp_state"), n_batches=3
    )
    assert spark.conf.get(key) == before  # restored after every batch
    # batch_shuffle_partitions=0 disables scoping entirely; None (the
    # default) DERIVES from the feature-count ledger — both must
    # produce identical state (physical parallelism only)
    plain = run_incremental(
        transcripts,
        PipelineConfig(batch_shuffle_partitions=0),
        str(tmp_path / "sp_plain"),
        n_batches=3,
    )
    derived = run_incremental(
        transcripts, PipelineConfig(), str(tmp_path / "sp_derived"), n_batches=3
    )
    assert spark.conf.get(key) == before
    assert _cluster_sets(tuned) == _cluster_sets(plain)
    assert _cluster_sets(derived) == _cluster_sets(plain)


def test_derived_batch_partitions_formula():
    """The default derivation: ~4096 rows/partition, floor 8, capped
    at (and None at or above) the session default."""
    from energy_aware_entity_resolution_spark.streaming.incremental import (
        _derived_batch_partitions,
    )

    assert _derived_batch_partitions(2000, 32) == 8  # floor
    assert _derived_batch_partitions(40_960, 32) == 10
    assert _derived_batch_partitions(10_000_000, 32) is None  # >= default
    assert _derived_batch_partitions(100, 8) is None  # floor == default


def test_replay_marker_lookup_is_content_named(spark, transcripts, tmp_path):
    """Every commit writes a content-named twin, so the replay guard's
    positive lookup is one exists() and a fully-twinned state answers
    negatives without opening marker files; legacy (twin-less) states
    are migrated in one scan."""
    import os

    from energy_aware_entity_resolution_spark.streaming.incremental import (
        _content_done,
        epoch_already_processed,
        process_one_batch,
    )

    state = str(tmp_path / "marker_state")
    cfg = PipelineConfig()
    process_one_batch(spark, transcripts, cfg, state, 0, marker_text="m:0")
    assert os.path.exists(_content_done(state, "m:0"))
    assert epoch_already_processed(state, "m:0")
    assert not epoch_already_processed(state, "m:1")
    # simulate a legacy state: drop the twin — the content scan still
    # finds the epoch AND rewrites the twin (one-time migration)
    os.remove(_content_done(state, "m:0"))
    assert epoch_already_processed(state, "m:0")
    assert os.path.exists(_content_done(state, "m:0"))


def test_round_count_ledger_backfills_from_footers(
    spark, transcripts, tmp_path
):
    """A state resumed from a pre-ledger run (missing early count
    records) backfills them once from the delta dirs' parquet footers
    instead of returning None forever (ADVICE r05)."""
    import os

    from energy_aware_entity_resolution_spark.streaming.incremental import (
        _parquet_rows,
        _sum_round_counts,
    )

    state = str(tmp_path / "ledger_state")
    run_incremental(transcripts, PipelineConfig(), state, n_batches=3)
    full = _sum_round_counts(state, 2, subdir="feat_counts")
    assert full is not None and full > 0
    # wipe one ledger record — the sum must still come back (backfilled
    # from features/batch=1 footers) and the record must be rewritten
    os.remove(os.path.join(state, "feat_counts", "0001"))
    assert _sum_round_counts(state, 2, subdir="feat_counts") == full
    assert os.path.exists(os.path.join(state, "feat_counts", "0001"))
    # footer count agrees with the ledger record
    n1 = _parquet_rows(os.path.join(state, "features", "batch=1"))
    with open(os.path.join(state, "feat_counts", "0001")) as f:
        assert int(f.read()) == n1
