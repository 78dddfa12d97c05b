"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship document-dedup clustering on sf0.001.
- ``queries()``: one entry per implemented operator family from
  SURVEY.md §2 (+ the training-data ops), each over the driver's
  parquet tables so the DuckDB oracle can recompute it.
- ``oracle_sql()``: ANSI-SQL twins. Operators that are not
  SQL-expressible (iterative connected components, the transcript ER
  pipeline itself) have queries() entries without oracles — the driver
  records rows-only checks for those.

Cross-engine determinism notes: hashes use the md5-60bit portable
family (functions/portable_hash.py), floats are rounded to 6 dp before
comparison, and every ordering carries an integer tie-break.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from energy_aware_entity_resolution_spark.config import PipelineConfig
from energy_aware_entity_resolution_spark.functions.cleaning import (
    clean_text_col,
    signature_col,
    tokens_col,
)
from energy_aware_entity_resolution_spark.functions.keys import bitmask_col
from energy_aware_entity_resolution_spark.functions.portable_hash import (
    md5_hash60_col,
    md5_hash60_sql,
)
from energy_aware_entity_resolution_spark.functions.textstats import (
    bpe_ish_token_count_col,
    distinct_token_ratio_col,
    fingerprint_col,
    lang_guess_col,
    quality_score_col,
    token_count_col,
)
from energy_aware_entity_resolution_spark.operators.dedup import (
    exact_dedup_groups,
    lsh_band_keys_portable,
    minhash_signatures_portable,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_col,
)
from energy_aware_entity_resolution_spark.operators.similarity_search import (
    brute_force_topk,
    sign_lsh_buckets,
)


def _spread(df: DataFrame) -> DataFrame:
    """Single-file, single-row-group parquet scans as ONE task, so
    every per-row expression before the first exchange runs serially
    (guide §2.5 "input skew: one huge unsplittable file ... repartition
    immediately after the read"). Round-robin to the cluster's
    parallelism; inputs that already scan with enough splits (any
    real-scale table) pass through untouched — no extra exchange.
    Opt-IN per query: measured A/B, it pays only where pre-exchange
    per-row compute dominates (regex cleaning, token folds, md5
    shingles, vector dots) and costs where the query is
    shuffle-structured anyway (OPTIMIZATION_r06.md)."""
    want = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df


def _read(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return _spread(df) if spread else df


# --------------------------------------------------------------- entry
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: near-duplicate document clustering on sf0.001 —
    exact-hash edges ∪ MinHash-LSH candidate edges → connected
    components → (doc_id, component_id)."""
    from energy_aware_entity_resolution_spark.operators.clustering import (
        connected_components,
    )

    sf_dir = "/root/testdata/sf0.001"
    docs = _read(spark, sf_dir, "documents")
    exact = exact_dedup_groups(docs)
    exact_edges = (
        docs.select("doc_id", md5_hash60_col(F.col("text")).alias("text_hash"))
        .join(exact.where(F.col("n_dups") > 1), "text_hash")
        .where(F.col("doc_id") != F.col("keep_id"))
        .select(
            F.col("keep_id").cast("string").alias("src"),
            F.col("doc_id").cast("string").alias("dst"),
        )
    )
    near = minhash_dedup_pairs(docs, k=16, bands=4, rows=4).select(
        F.col("doc_id_a").cast("string").alias("src"),
        F.col("doc_id_b").cast("string").alias("dst"),
    )
    comp = connected_components(exact_edges.union(near))
    all_ids = docs.select(F.col("doc_id").cast("string").alias("conv_id"))
    return (
        all_ids.join(comp, "conv_id", "left")
        .select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.coalesce("component_id", F.col("conv_id")).cast("string").alias(
                "component_id"
            ),
        )
    )


# ------------------------------------------------------------- queries
def _q_assemble_events(spark, sf_dir):
    """P9 conversation assembly analog: window-ordered concatenation."""
    ev = _read(spark, sf_dir, "events")
    turn = F.struct("ts", "event_id", "event_type")
    return (
        ev.groupBy("user_id")
        .agg(F.array_sort(F.collect_list(turn)).alias("seq"))
        .select(
            "user_id",
            F.size("seq").alias("n_events"),
            F.array_join(
                F.transform("seq", lambda t: t["event_type"]), " "
            ).alias("event_seq"),
        )
    )


def _q_clean_tokens(spark, sf_dir):
    """P1-P5: cleaning + tokenization + canonical signature."""
    docs = _read(spark, sf_dir, "documents", spread=True)
    cleaned = clean_text_col(F.col("text"))
    toks = tokens_col(cleaned)
    return docs.select(
        "doc_id",
        cleaned.alias("cleaned"),
        F.size(toks).alias("n_tokens"),
        signature_col(toks).alias("sig"),
    )


def _q_bitmask_blocks(spark, sf_dir):
    """P6/J1/A1: 36-bit char bitmask blocking key histogram."""
    docs = _read(spark, sf_dir, "documents", spread=True)
    return (
        docs.select(bitmask_col(clean_text_col(F.col("text"))).alias("bitmask"))
        .groupBy("bitmask")
        .agg(F.count("*").alias("n_docs"))
    )


def _q_exact_dup_groups(spark, sf_dir):
    """J2/J6: exact dedup groups by portable text hash."""
    return exact_dedup_groups(_read(spark, sf_dir, "documents"))


def _q_token_idf(spark, sf_dir):
    """A3/A4: document frequency + IDF per token."""
    docs = _read(spark, sf_dir, "documents")
    n = docs.count()
    toks = F.explode(
        F.array_distinct(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit(""))
        )
    ).alias("token")
    return (
        docs.select(toks)
        .groupBy("token")
        .agg(F.count("*").alias("df"))
        .select(
            "token",
            "df",
            F.round(F.log((F.lit(n) + 1.0) / (F.col("df") + 1.0)), 6).alias("idf"),
        )
    )


def _q_topk_per_group(spark, sf_dir):
    """D6/T1/T2: window top-k per group."""
    li = _read(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_linenumber")
    )
    return (
        li.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "rank")
    )


def _q_ratio_test_orders(spark, sf_dir):
    """D1: best/second-best ratio + delta test via lead()."""
    li = _read(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_linenumber")
    )
    ranked = li.withColumn("rn", F.row_number().over(w)).withColumn(
        "s2", F.lead("l_extendedprice").over(w)
    )
    best = ranked.where(F.col("rn") == 1).select(
        "l_orderkey",
        F.col("l_extendedprice").alias("s1"),
        F.coalesce("s2", F.lit(-1.0)).alias("s2"),
    )
    return best.where(
        (F.col("s2") < 0) | (F.round(F.col("s1") / F.col("s2"), 6) >= 1.2)
    ).select("l_orderkey", F.round("s1", 6).alias("s1"), F.round("s2", 6).alias("s2"))


def _q_ratio_delta_orders(spark, sf_dir):
    """D1 variant through the ENGINE's ratio_test operator
    (decision.py ratio_test; reference
    dynamic_entity_resolution.py:311-324 applies ratio AND delta):
    best-vs-runner-up must clear BOTH s1/s2 >= 1.2 and
    s1 - s2 >= 20000."""
    from energy_aware_entity_resolution_spark.operators.decision import (
        ratio_test,
    )

    li = _read(spark, sf_dir, "lineitem")
    w = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"))
    directed = li.select(
        F.col("l_orderkey").alias("src"),
        F.col("l_linenumber").alias("dst"),
        F.col("l_extendedprice").alias("score"),
    )
    ranked = directed.withColumn("rank", F.row_number().over(w))
    kept = ratio_test(ranked, ratio=1.2, delta=20000.0)
    return kept.select(
        F.col("src").alias("l_orderkey"),
        F.round("score", 6).alias("s1"),
        F.round(F.coalesce("s2", F.lit(-1.0)), 6).alias("s2"),
    )


def _q_mutual_top1(spark, sf_dir):
    """D3: reciprocal nearest neighbor as one equi-join (customers ↔
    suppliers within a nation by closest account balance)."""
    c = _read(spark, sf_dir, "customer")
    s = _read(spark, sf_dir, "supplier")
    pairs = c.join(s, c["c_nationkey"] == s["s_nationkey"]).select(
        "c_custkey",
        "s_suppkey",
        F.round(F.abs(F.col("c_acctbal") - F.col("s_acctbal")), 4).alias("diff"),
    )
    wc = Window.partitionBy("c_custkey").orderBy(F.asc("diff"), F.asc("s_suppkey"))
    ws = Window.partitionBy("s_suppkey").orderBy(F.asc("diff"), F.asc("c_custkey"))
    best_c = pairs.withColumn("r", F.row_number().over(wc)).where(F.col("r") == 1).drop("r")
    best_s = pairs.withColumn("r", F.row_number().over(ws)).where(F.col("r") == 1).drop("r")
    return best_c.join(best_s, ["c_custkey", "s_suppkey", "diff"], "inner").select(
        "c_custkey", "s_suppkey", "diff"
    )


def _q_minhash_signatures(spark, sf_dir):
    """J8 (index analog): portable k=16 MinHash signatures, exploded."""
    return minhash_signatures_portable(_read(spark, sf_dir, "documents"), k=16)


def _q_lsh_band_keys(spark, sf_dir):
    """J8: LSH banding keys (4 bands × 4 rows)."""
    sigs = minhash_signatures_portable(_read(spark, sf_dir, "documents"), k=16)
    return lsh_band_keys_portable(sigs, bands=4, rows=4)


def _q_minhash_dedup_pairs(spark, sf_dir):
    """J8+J11+E1: near-dup candidate pairs via capped LSH band join."""
    return minhash_dedup_pairs(_read(spark, sf_dir, "documents"), k=16, bands=4, rows=4)


def _q_near_dup_verified(spark, sf_dir):
    """Two-stage near-dup: LSH candidates + exact Jaccard verification
    (auto-blocked — safe on an unblocked corpus)."""
    from energy_aware_entity_resolution_spark.operators.dedup import (
        near_dup_pairs_verified,
    )

    return near_dup_pairs_verified(
        _read(spark, sf_dir, "documents"), threshold=0.7
    )


def _q_ngram_jaccard_pairs(spark, sf_dir):
    """M3 corpus-wide: token-set Jaccard pairs within (lang, source)."""
    return ngram_jaccard_pairs(
        _read(spark, sf_dir, "documents"), ["lang", "source"], threshold=0.5
    )


def _q_simhash(spark, sf_dir):
    """SimHash-32 fingerprints (near-dup family)."""
    docs = _read(spark, sf_dir, "documents", spread=True)
    return docs.select("doc_id", simhash_col(F.col("text"), bits=32).alias("simhash"))


def _q_simhash_dedup_pairs(spark, sf_dir):
    """SimHash near-dup pairs via pigeonhole chunk banding
    (Hamming <= 3 over 32 bits, capped hot chunks)."""
    from energy_aware_entity_resolution_spark.operators.dedup import (
        simhash_dedup_pairs,
    )

    return simhash_dedup_pairs(
        _read(spark, sf_dir, "documents"), bits=32, max_hamming=3
    )


def _q_embedding_topk(spark, sf_dir):
    """J7/M1: exact brute-force cosine top-5 for sampled queries."""
    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 25 == 0)
    return brute_force_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )


def _q_embedding_lsh_buckets(spark, sf_dir):
    """J8 (vector flavor): sign-LSH bucket assignment."""
    emb = _read(spark, sf_dir, "embeddings")
    return sign_lsh_buckets(emb, n_bits=4).select("vec_id", "bucket")


# rotated-hyperplane LSH gate constants: the oracle regenerates the
# SAME seeded planes and the dot products are identical IEEE double
# chains in both engines (float32 -> double casts exact, literal plane
# coefficients roundtrip via repr, left-assoc sums)
ROT_SEED, ROT_BITS, EMB_DIM = 5, 4, 64


def _q_embedding_lsh_buckets_rotated(spark, sf_dir):
    """J8 rotated variant: seeded general-hyperplane sign-LSH
    (similarity_search.sign_lsh_buckets rotation_seed) — the
    correlated-dimension-robust bucketing, JVM column folds only."""
    emb = _read(spark, sf_dir, "embeddings")
    return sign_lsh_buckets(
        emb, n_bits=ROT_BITS, rotation_seed=ROT_SEED
    ).select("vec_id", "bucket")


def _rotated_bucket_sql() -> str:
    import numpy as np

    planes = np.random.RandomState(ROT_SEED).standard_normal((ROT_BITS, EMB_DIM))
    bits = []
    for j in range(ROT_BITS):
        # float() before repr: numpy 2.x reprs np.float64 as
        # 'np.float64(x)', which is not SQL
        dot = " + ".join(
            f"(embedding[{i + 1}]::DOUBLE * {float(planes[j, i])!r})"
            for i in range(EMB_DIM)
        )
        bits.append(f"(CASE WHEN (0.0 + {dot}) > 0 THEN {1 << j} ELSE 0 END)")
    return (
        "SELECT vec_id, (" + " + ".join(bits) + ") AS bucket FROM embeddings"
    )


# multi-pass rotated near-dup gate constants (seeds share the rotated
# bucket oracle's plane-regeneration contract above)
MP_SEEDS, MP_BITS, MP_THR = (5, 6), 4, 0.3


def _q_embedding_near_dup_multipass(spark, sf_dir):
    """Multi-pass rotated-LSH near-dup over the embeddings table:
    union of exact-cosine-verified pairs across two rotation seeds
    (dedup.embedding_near_dup_pairs_multipass) — the recall lever for
    correlated-dimension embeddings; single-seed coverage on this data
    is 113 pairs, the two-seed union 230."""
    from energy_aware_entity_resolution_spark.operators.dedup import (
        embedding_near_dup_pairs_multipass,
    )

    emb = _read(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs_multipass(
        emb, list(MP_SEEDS), threshold=MP_THR, n_bits=MP_BITS
    ).select("vec_id_a", "vec_id_b", "cosine")


def _near_dup_multipass_sql() -> str:
    """DuckDB twin: regenerate both seeds' planes (literal
    coefficients, same repr roundtrip as _rotated_bucket_sql), bucket
    per pass, verify cosine within buckets, UNION the passes and keep
    each pair once."""
    import numpy as np

    passes = []
    for seed in MP_SEEDS:
        planes = np.random.RandomState(seed).standard_normal((MP_BITS, EMB_DIM))
        bits = []
        for j in range(MP_BITS):
            dot = " + ".join(
                f"(embedding[{i + 1}]::DOUBLE * {float(planes[j, i])!r})"
                for i in range(EMB_DIM)
            )
            bits.append(f"(CASE WHEN (0.0 + {dot}) > 0 THEN {1 << j} ELSE 0 END)")
        bk = (
            "(SELECT vec_id, embedding, (" + " + ".join(bits)
            + ") AS bucket FROM embeddings)"
        )
        passes.append(
            f"""SELECT vec_id_a, vec_id_b, cosine FROM (
  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
         {_cos_sql('a.embedding', 'b.embedding')} AS cosine
  FROM {bk} a JOIN {bk} b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
WHERE cosine >= {MP_THR}"""
        )
    return (
        "SELECT DISTINCT vec_id_a, vec_id_b, cosine FROM ("
        + " UNION ALL ".join(passes)
        + ")"
    )


def _q_ivf_cells(spark, sf_dir):
    """IVF coarse quantization: vector -> nearest centroid. Centroids
    are the deterministic hash-ordered sample (ivf_centroids iters=0)."""
    from energy_aware_entity_resolution_spark.operators.similarity_search import (
        ivf_assign,
    )

    emb = _read(spark, sf_dir, "embeddings")
    return ivf_assign(emb, n_cells=8).select("vec_id", "cell_id")


def _q_ivf_topk(spark, sf_dir):
    """IVF-bucketed approximate top-3 (nprobe=1)."""
    from energy_aware_entity_resolution_spark.operators.similarity_search import (
        ivf_topk,
    )

    emb = _read(spark, sf_dir, "embeddings")
    return ivf_topk(emb, k=3, n_cells=8).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )


def _q_ivf_topk_nprobe2(spark, sf_dir):
    """IVF multi-cell probe: each query searches its 2 nearest cells
    (the recall knob the scale path turns instead of widening cells)."""
    from energy_aware_entity_resolution_spark.operators.similarity_search import (
        ivf_topk,
    )

    emb = _read(spark, sf_dir, "embeddings")
    return ivf_topk(emb, k=3, n_cells=8, nprobe=2).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )


def _q_lsh_multiprobe_topk(spark, sf_dir):
    """Sign-LSH top-2 with Hamming-1 multi-probe (each query also
    searches the n_bits adjacent buckets)."""
    from energy_aware_entity_resolution_spark.operators.similarity_search import (
        bucketed_topk,
    )

    emb = _read(spark, sf_dir, "embeddings")
    return bucketed_topk(emb, k=2, n_bits=4, probe_hamming=1).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )


def _q_lang_quality(spark, sf_dir):
    """Text analysis: language-ID heuristic + quality scoring + token
    counting (training-data pipeline ops)."""
    docs = _read(spark, sf_dir, "documents", spread=True)
    return docs.select(
        "doc_id",
        lang_guess_col(F.col("text")).alias("lang_guess"),
        quality_score_col(F.col("text")).alias("quality"),
        token_count_col(F.col("text")).alias("n_tokens_ws"),
        bpe_ish_token_count_col(F.col("text")).alias("n_tokens_bpe"),
        F.round(distinct_token_ratio_col(F.col("text")), 6).alias("distinct_ratio"),
    )


def _q_doc_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprint (min 8-shingle md5-60bit)."""
    docs = _read(spark, sf_dir, "documents", spread=True)
    return docs.select("doc_id", fingerprint_col(F.col("text"), w=8).alias("fingerprint"))


def _q_sessionize_events(spark, sf_dir):
    """W2 analog: sessionization by 30-min gaps (lag + cumsum)."""
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # events.ts is TIMESTAMP_NTZ; compute epoch arithmetically from its
    # components so the result is identical under ANY driver session
    # timezone (a cast to TIMESTAMP would shift across DST boundaries)
    epoch = (
        F.unix_date(F.to_date("ts")) * F.lit(86400).cast("long")
        + F.hour("ts") * 3600
        + F.minute("ts") * 60
        + F.second("ts")
    )
    gap = F.when(epoch - F.lag(epoch).over(w) > 1800, 1).otherwise(0)
    sess = (
        ev.withColumn("new_sess", F.coalesce(gap, F.lit(0)))
        .withColumn(
            "session_idx",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return sess.groupBy("user_id").agg(
        (F.max("session_idx") + 1).cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def _q_window_hourly(spark, sf_dir):
    """W2: tumbling 1h event-time window aggregation."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )


def _q_sn_blocks(spark, sf_dir):
    """Sorted-neighborhood ranks within signature-prefix buckets."""
    docs = _read(spark, sf_dir, "documents", spread=True)
    sig = signature_col(tokens_col(clean_text_col(F.col("text"))))
    base = docs.select("doc_id", sig.alias("sig"))
    w = Window.partitionBy(F.substring("sig", 1, 2)).orderBy("sig", "doc_id")
    return base.select(
        "doc_id",
        F.substring("sig", 1, 2).alias("bucket"),
        F.row_number().over(w).alias("rank"),
    )


def _q_token_bigrams(spark, sf_dir):
    """P10: sliding token n-grams (n=2) histogram over documents."""
    docs = _read(spark, sf_dir, "documents", spread=True)
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit("")
    )
    from energy_aware_entity_resolution_spark.functions.keys import token_ngrams_col

    return (
        docs.select(F.explode(token_ngrams_col(toks, 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
    )


def _q_multiset_jaccard_pairs(spark, sf_dir):
    """M4: multiset (Counter) Jaccard pairs within (lang, source)."""
    from energy_aware_entity_resolution_spark.functions.similarity import (
        multiset_jaccard_col,
    )

    docs = _read(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit("")
    )
    sel = docs.select("doc_id", "lang", "source", toks.alias("toks"))
    a = sel.alias("a")
    b = sel.alias("b")
    return (
        a.join(b, ["lang", "source"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.round(
                multiset_jaccard_col(F.col("a.toks"), F.col("b.toks")), 6
            ).alias("mjaccard"),
        )
        .where(F.col("mjaccard") >= 0.4)
    )


def _q_dedup_keep_list(spark, sf_dir):
    """J6: dedup-before-index — the surviving representative rows."""
    from energy_aware_entity_resolution_spark.operators.dedup import exact_dedup

    return exact_dedup(_read(spark, sf_dir, "documents")).select("doc_id", "n_chars")


def _q_hub_cap(spark, sf_dir):
    """D4/J11: degree count + hub filter over the orders graph
    (customers with more than 12 orders are 'hubs')."""
    o = _read(spark, sf_dir, "orders")
    deg = o.groupBy("o_custkey").agg(F.count("*").alias("degree"))
    return deg.where(F.col("degree") <= 12)


# ---- flagship transcript ER pipeline gate queries.
#
# The gate runs the REAL run_pipeline code path (assemble -> featurize
# -> exact/LSH/SN candidates -> blended scoring -> ratio/threshold
# decision -> connected components) over a transcripts table derived
# deterministically from the shared documents parquet
# (sources.transcripts_from_documents), under the portable hash family
# (PipelineConfig(blocking.portable=True)). That makes every stage —
# decisions and transitive clusters included — recomputable by the
# DuckDB oracle (er_matches / er_clusters / er_eval_grid all have full
# SQL twins; CC is a recursive CTE). The numpy-generated synthetic
# transcripts remain the F1/scale fixture for pytest, entry() and
# bench.py; they are not oracle-expressible (the oracle cannot run the
# generator), which is why the gate input is the documents bridge.
#
# All three gate queries share ONE memoized pipeline run.
_PIPELINE_CACHE: dict[tuple, object] = {}


def _transcripts(spark, n=400):
    from energy_aware_entity_resolution_spark.sources import generate_transcripts

    return generate_transcripts(spark, n, seed=42)


def _shared_docs_pipeline(spark, sf_dir):
    from energy_aware_entity_resolution_spark.config import BlockingConfig
    from energy_aware_entity_resolution_spark.plans import run_pipeline
    from energy_aware_entity_resolution_spark.sources import (
        transcripts_from_documents,
    )

    key = (spark.sparkContext.applicationId, "docs", sf_dir)
    if key not in _PIPELINE_CACHE:
        cfg = PipelineConfig(
            blocking=BlockingConfig(portable=True), audit_enabled=False
        )
        transcripts = transcripts_from_documents(_read(spark, sf_dir, "documents"))
        _PIPELINE_CACHE[key] = run_pipeline(transcripts, cfg)
    return _PIPELINE_CACHE[key]


def _q_er_clusters(spark, sf_dir):
    """Flagship ER end-to-end: transitive entity clusters (C1/C3)."""
    return _shared_docs_pipeline(spark, sf_dir).clusters


def _q_er_matches(spark, sf_dir):
    """Flagship ER decisions (D1-D5): accepted match pairs + provenance."""
    res = _shared_docs_pipeline(spark, sf_dir)
    return res.matches.select(
        "conv_id_a", "conv_id_b", F.round("score", 6).alias("score"), "decision"
    )


def _er_truth_pairs(spark, sf_dir):
    """Ground truth for the gate grid: exact-text duplicate pairs of
    the documents table (same md5-60bit text hash), canonical order."""
    docs = _read(spark, sf_dir, "documents")
    sel = docs.select(
        F.format_string("d%08d", F.col("doc_id")).alias("cid"),
        md5_hash60_col(F.col("text")).alias("th"),
    )
    a = sel.alias("a")
    b = sel.alias("b")
    return (
        a.join(b, "th")
        .where(F.col("a.cid") < F.col("b.cid"))
        .select(
            F.col("a.cid").alias("conv_id_a"), F.col("b.cid").alias("conv_id_b")
        )
    )


# the FULL reference protocol (evaluation.py:235-236): 19 thresholds
# 0.95..0.05 step 0.05, k = 1..10 — 190 grid cells, every one
# hash-checked against the DuckDB twin
GRID_THRESHOLDS = [round(0.95 - 0.05 * i, 2) for i in range(19)]
GRID_KS = list(range(1, 11))


def _q_er_eval_grid(spark, sf_dir):
    """Reference grid search (seuil × k) over the gate pipeline's
    scored pairs vs exact-duplicate ground truth — full 190-cell
    protocol (reference evaluation.py:235-236)."""
    from energy_aware_entity_resolution_spark.operators.evaluation import (
        evaluation_grid,
    )

    res = _shared_docs_pipeline(spark, sf_dir)
    grid = evaluation_grid(
        res.scored.select("conv_id_a", "conv_id_b", "score"),
        _er_truth_pairs(spark, sf_dir),
        thresholds=GRID_THRESHOLDS,
        ks=GRID_KS,
    )
    return grid.select(
        "seuil", "k", "tp", "fp", "fn", F.round("f1", 6).alias("f1")
    )


def _q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs over the gate pipeline's
    document vectors (dedup family, embedding-space member): sign-LSH
    bucket join + exact cosine >= 0.95 (dedup.embedding_near_dup_pairs;
    reference analog: cosine decisions dynamic_entity_resolution.py:191
    applied as corpus dedup)."""
    from energy_aware_entity_resolution_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    res = _shared_docs_pipeline(spark, sf_dir)
    vecs = res.features.select(
        F.col("conv_id").alias("vec_id"), F.col("vec").alias("embedding")
    )
    return embedding_near_dup_pairs(vecs, threshold=0.95, n_bits=4).select(
        F.col("vec_id_a").alias("conv_id_a"),
        F.col("vec_id_b").alias("conv_id_b"),
        "cosine",
    )


def _q_er_score_hist(spark, sf_dir):
    """Score-distribution histogram by ground-truth label — the data
    behind the reference's similarity scatter plot
    (similarity_anlysis.py)."""
    from energy_aware_entity_resolution_spark.operators.evaluation import (
        score_label_histogram,
    )

    res = _shared_docs_pipeline(spark, sf_dir)
    return score_label_histogram(
        res.scored.select("conv_id_a", "conv_id_b", "score"),
        _er_truth_pairs(spark, sf_dir),
        bins=20,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "assemble_events": _q_assemble_events,
        "clean_tokens": _q_clean_tokens,
        "bitmask_blocks": _q_bitmask_blocks,
        "exact_dup_groups": _q_exact_dup_groups,
        "token_idf": _q_token_idf,
        "topk_per_group": _q_topk_per_group,
        "ratio_test_orders": _q_ratio_test_orders,
        "ratio_delta_orders": _q_ratio_delta_orders,
        "mutual_top1": _q_mutual_top1,
        "minhash_signatures": _q_minhash_signatures,
        "lsh_band_keys": _q_lsh_band_keys,
        "minhash_dedup_pairs": _q_minhash_dedup_pairs,
        "near_dup_verified": _q_near_dup_verified,
        "ngram_jaccard_pairs": _q_ngram_jaccard_pairs,
        "simhash": _q_simhash,
        "simhash_dedup_pairs": _q_simhash_dedup_pairs,
        "embedding_topk": _q_embedding_topk,
        "embedding_lsh_buckets": _q_embedding_lsh_buckets,
        "embedding_lsh_buckets_rotated": _q_embedding_lsh_buckets_rotated,
        "ivf_cells": _q_ivf_cells,
        "ivf_topk": _q_ivf_topk,
        "ivf_topk_nprobe2": _q_ivf_topk_nprobe2,
        "lsh_multiprobe_topk": _q_lsh_multiprobe_topk,
        "lang_quality": _q_lang_quality,
        "doc_fingerprint": _q_doc_fingerprint,
        "sessionize_events": _q_sessionize_events,
        "window_hourly": _q_window_hourly,
        "sn_blocks": _q_sn_blocks,
        "hub_cap": _q_hub_cap,
        "token_bigrams": _q_token_bigrams,
        "multiset_jaccard_pairs": _q_multiset_jaccard_pairs,
        "dedup_keep_list": _q_dedup_keep_list,
        "er_clusters": _q_er_clusters,
        "er_matches": _q_er_matches,
        "er_eval_grid": _q_er_eval_grid,
        "embedding_near_dup_pairs": _q_embedding_near_dup,
        "embedding_near_dup_multipass": _q_embedding_near_dup_multipass,
        "er_score_hist": _q_er_score_hist,
    }


# ------------------------------------------------------------- oracles
_H = md5_hash60_sql  # portable md5-60bit hash fragment builder

# mirrors clean_text_col exactly: date canonicalization (ISO yyyy-mm-dd
# and US mm/dd/yyyy -> yyyymmdd, cleaning.py:31-33) BEFORE lowercasing +
# non-alnum squashing — without it any date-bearing document would
# clean differently in the two engines
def _clean_sql(expr: str) -> str:
    canon = (
        f"regexp_replace(regexp_replace({expr},"
        " '(\\d{4})-(\\d{2})-(\\d{2})', '\\1\\2\\3', 'g'),"
        " '(\\d{2})/(\\d{2})/(\\d{4})', '\\3\\1\\2', 'g')"
    )
    return (
        f"regexp_replace(regexp_replace(lower({canon}), '[^a-z0-9]+', '_', 'g'),"
        " '^_+|_+$', '', 'g')"
    )


_CLEAN = _clean_sql("text")
_WS_TOKENS = (
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"
)
# raw-case twin: Spark's ws_tokens_col does NOT lowercase, so quality /
# diversity stats must be computed case-sensitively ('The' vs 'the' are
# distinct tokens); only language-marker matching lowercases
_WS_TOKENS_RAW = (
    "list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')"
)
_WS_DISTINCT = f"list_distinct({_WS_TOKENS})"

_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789"
_BITMASK_SQL = " + ".join(
    f"(CASE WHEN contains(cleaned, '{ch}') THEN {1 << i}::BIGINT ELSE 0 END)"
    for i, ch in enumerate(_ALPHABET)
)

# shared minhash fragment: one row per (doc_id, i, minhash)
_MINHASH_CTE = f"""
WITH toks AS (
    SELECT doc_id, unnest({_WS_DISTINCT}) AS token FROM documents
), hashed AS (
    SELECT doc_id, ({_H('token')} % 2147483648) AS x31 FROM toks
), perms AS (
    SELECT doc_id, x31, i
    FROM hashed, (SELECT unnest(range(0, 16)) AS i)
), vals AS (
    SELECT doc_id, i,
      (((((1103515245::BIGINT * (i + 1) + 12345) % 2147483648) | 1))
        * x31
        + ((69069::BIGINT * (i + 1) + 1) % 2147483648)) % 2147483647 AS hv
    FROM perms
)
SELECT doc_id, i, min(hv) AS minhash FROM vals GROUP BY doc_id, i
"""

def _cos_sql(a: str, b: str) -> str:
    """DuckDB cosine of two FLOAT[] lists, double-accumulated, 6 dp."""
    dot = (
        f"list_sum(list_transform(range(1, len({a}) + 1),"
        f" j -> {a}[j]::DOUBLE * {b}[j]::DOUBLE))"
    )
    na = f"sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x)))"
    nb = f"sqrt(list_sum(list_transform({b}, x -> x::DOUBLE * x)))"
    return f"round({dot} / greatest({na} * {nb}, 1e-12), 6)"


# centroids = deterministic hash-ordered sample (ivf_centroids iters=0):
# the 8 rows with the smallest md5-60bit(vec_id) — a uniform
# pseudo-random sample both engines derive identically
_IVF_ASSIGN_CTE = f"""
WITH cents AS (
  SELECT vec_id AS cell_id, embedding AS cv FROM embeddings
  ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT, vec_id
  LIMIT 8
), scored AS (
  SELECT e.vec_id, e.embedding, c.cell_id,
         {_cos_sql('e.embedding', 'c.cv')} AS csim
  FROM embeddings e, cents c
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
    ORDER BY csim DESC, cell_id ASC) AS rn FROM scored
), assigned AS (
  SELECT vec_id, embedding, cell_id FROM ranked WHERE rn = 1
), probed2 AS (
  SELECT vec_id, embedding, cell_id FROM ranked WHERE rn <= 2
)
"""

_LANG_MARKERS_SQL = {
    "en": "['the','and','of','to','is','a']",
    "fr": "['le','la','et','les','des','un']",
    "de": "['der','die','und','das','ist','ein']",
    "es": "['el','los','que','una','por','para']",
}


def _lang_quality_sql() -> str:
    hits = {
        c: f"len(list_filter(toks_low, t -> list_contains({m}, t)))"
        for c, m in _LANG_MARKERS_SQL.items()
    }
    # mirror lang_guess_col's fold: iterate langs in sorted order,
    # strictly-greater wins
    guess = "'und'"
    best = "0"
    for code in sorted(hits):
        h = hits[code]
        guess = f"(CASE WHEN {h} > {best} THEN '{code}' ELSE {guess} END)"
        best = f"greatest({h}, {best})"
    return f"""
WITH base AS (
  SELECT doc_id, text, {_WS_TOKENS_RAW} AS toks,
         {_WS_TOKENS} AS toks_low
  FROM documents
), stats AS (
  SELECT doc_id, text, toks, toks_low,
    len(toks) AS n_ws,
    CASE WHEN len(toks) > 0
         THEN len(list_distinct(toks))::DOUBLE / len(toks) ELSE 0.0 END AS div,
    CASE WHEN len(toks) > 0
         THEN list_sum(list_transform(toks, t -> length(t)))::DOUBLE / len(toks)
         ELSE 0.0 END AS mwl
  FROM base
)
SELECT doc_id,
  {guess} AS lang_guess,
  round(
    0.4 * (CASE WHEN n_ws >= 10 AND n_ws <= 1000 THEN 1.0
                WHEN n_ws > 0 THEN 0.5 ELSE 0.0 END)
    + 0.4 * div
    + 0.2 * (CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.3 END),
  6) AS quality,
  n_ws AS n_tokens_ws,
  len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')) AS n_tokens_bpe,
  round(div, 6) AS distinct_ratio
FROM stats
"""


# ---- flagship-pipeline oracle: DuckDB recomputes run_pipeline
# (portable hash family) end-to-end over the documents-derived
# transcripts. Constants are read from the live PipelineConfig defaults
# so the SQL cannot drift from the engine's config.
def _er_pipeline_sql() -> str:
    from energy_aware_entity_resolution_spark.config import (
        BlockingConfig,
        ScoringConfig,
    )

    bk = BlockingConfig()
    sc = ScoringConfig()
    k, rows, bands = bk.minhash_k, bk.minhash_rows, bk.minhash_bands
    dim, cap, snw = sc.embedding_dim, bk.max_block_size, bk.sorted_neighborhood_window
    perm = (
        "((((1103515245 * (i + 1) + 12345) % 2147483648) | 1) * x"
        " + ((69069 * (i + 1) + 1) % 2147483648)) % 2147483647"
    )
    perm_empty = "((69069 * (i + 1) + 1) % 2147483648) % 2147483647"
    # blend weights: same literals the Spark plan uses
    wj, wl, wc = sc.w_jaccard, sc.w_levenshtein, sc.w_cosine
    return f"""
docsrc AS (
  SELECT printf('d%08d', doc_id) AS conv_id,
         array_to_string({_WS_TOKENS_RAW}, ' ') AS doc
  FROM documents
),
cleanedT AS (
  SELECT conv_id, {_clean_sql('doc')} AS cleaned FROM docsrc
),
tokT AS (
  SELECT conv_id,
         list_distinct(list_filter(string_split(cleaned, '_'),
                       x -> x <> '' AND x <> 'nan')) AS toks
  FROM cleanedT
),
nT AS (SELECT count(*) AS n FROM tokT),
dfT AS (
  SELECT token, count(*) AS df
  FROM (SELECT unnest(toks) AS token FROM tokT) GROUP BY token
),
stopT AS (
  SELECT coalesce(list(token), []::VARCHAR[]) AS sw
  FROM dfT, nT WHERE df > {bk.df_stopword_ratio}::DOUBLE * n
),
featT AS (
  SELECT conv_id, toks,
         array_to_string(list_sort(toks), ' ') AS sig,
         CASE WHEN len(rare0) > 0 THEN rare0 ELSE toks END AS rare
  FROM (SELECT t.conv_id, t.toks,
          list_filter(t.toks, x -> NOT list_contains(s.sw, x)) AS rare0
        FROM tokT t, stopT s)
),
feat2T AS (
  SELECT conv_id, toks, sig, rare,
    array_to_string(list_sort(rare), ' ') AS rare_sig,
    substr(array_to_string(list_sort(
      list_filter(rare, t -> regexp_matches(t, '^[a-z]'))), ' '), 1, 12) AS sn_key,
    list_transform(rare, t -> {_H('t')}) AS rh,
    list_transform(rare, t -> ({_H('t')} % 2147483648)) AS x31s
  FROM featT
),
mhT AS (
  SELECT conv_id,
    list_transform(range(0, {k}), i ->
      coalesce(list_min(list_transform(x31s, x -> {perm})), {perm_empty})) AS mh
  FROM feat2T
),
vecT AS (
  SELECT conv_id,
    list_transform(range(0, {dim}), i ->
      coalesce(list_sum(list_transform(rh, h ->
        CASE WHEN h % {dim} = i
             THEN (CASE WHEN (h >> 59) & 1 = 1
                        THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END)
             ELSE 0.0::DOUBLE END)), 0.0::DOUBLE)) AS vec
  FROM feat2T
),
bandT AS (
  SELECT f.conv_id, b.band_id,
    array_to_string(list_transform(range(0, {rows}),
      r -> mh[b.band_id * {rows} + r + 1]::VARCHAR), '-') AS band_key
  FROM mhT f, (SELECT unnest(range(0, {bands})) AS band_id) b
),
cappedT AS (
  SELECT * FROM bandT
  QUALIFY count(*) OVER (PARTITION BY band_id, band_key) <= {cap}
),
exactP AS (
  SELECT a.conv_id AS ca, b.conv_id AS cb
  FROM feat2T a JOIN feat2T b ON a.sig = b.sig AND a.conv_id < b.conv_id
),
lshP AS (
  SELECT DISTINCT a.conv_id AS ca, b.conv_id AS cb
  FROM cappedT a JOIN cappedT b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
   AND a.conv_id < b.conv_id
),
snrT AS (
  SELECT conv_id, sn_key, substr(sn_key, 1, 2) AS bucket,
         row_number() OVER (PARTITION BY substr(sn_key, 1, 2)
                            ORDER BY sn_key, conv_id) AS rnk
  FROM feat2T
),
snP AS (
  SELECT least(a.conv_id, b.conv_id) AS ca, greatest(a.conv_id, b.conv_id) AS cb
  FROM snrT a JOIN snrT b
    ON a.bucket = b.bucket AND b.rnk > a.rnk AND b.rnk <= a.rnk + {snw}
),
candT AS (
  SELECT DISTINCT ca, cb FROM (
    SELECT * FROM exactP UNION ALL SELECT * FROM lshP UNION ALL SELECT * FROM snP)
),
scoredT AS (
  SELECT c.ca AS conv_id_a, c.cb AS conv_id_b,
    CASE WHEN fa.sig = fb.sig THEN 1.0::DOUBLE ELSE
      {wj}::DOUBLE * (CASE WHEN len(list_distinct(fa.rare || fb.rare)) > 0
        THEN len(list_intersect(fa.rare, fb.rare))::DOUBLE
             / len(list_distinct(fa.rare || fb.rare))
        ELSE 1.0::DOUBLE END)
      + {wl}::DOUBLE * (1.0::DOUBLE
          - levenshtein(substr(fa.rare_sig, 1, 512), substr(fb.rare_sig, 1, 512))
            / greatest(length(substr(fa.rare_sig, 1, 512)),
                       length(substr(fb.rare_sig, 1, 512)), 1))
      + {wc}::DOUBLE * greatest(
          list_sum(list_transform(range(1, {dim} + 1), j -> va.vec[j] * vb.vec[j]))
          / greatest(sqrt(list_sum(list_transform(va.vec, x -> x * x)))
                   * sqrt(list_sum(list_transform(vb.vec, x -> x * x))), 1e-12),
          0.0::DOUBLE)
    END AS score
  FROM candT c
  JOIN feat2T fa ON fa.conv_id = c.ca
  JOIN feat2T fb ON fb.conv_id = c.cb
  JOIN vecT va ON va.conv_id = c.ca
  JOIN vecT vb ON vb.conv_id = c.cb
),
directedT AS (
  SELECT conv_id_a AS src, conv_id_b AS dst, score FROM scoredT
  UNION ALL SELECT conv_id_b, conv_id_a, score FROM scoredT
),
rankedT AS (
  SELECT src, dst, score, row_number() OVER w AS rnk, lead(score) OVER w AS s2
  FROM directedT WINDOW w AS (PARTITION BY src ORDER BY score DESC, dst ASC)
),
bestT AS (
  SELECT * FROM rankedT
  WHERE rnk = 1 AND (s2 IS NULL
    OR score / greatest(s2, 1e-9) >= {sc.ratio_threshold}::DOUBLE)
),
testedT AS (
  SELECT DISTINCT least(src, dst) AS conv_id_a, greatest(src, dst) AS conv_id_b,
         score, 'ratio' AS decision
  FROM bestT WHERE score >= {sc.match_threshold}::DOUBLE
),
directT AS (
  SELECT conv_id_a, conv_id_b, score, 'direct' AS decision
  FROM scoredT WHERE score >= {sc.direct_threshold}::DOUBLE
),
matchesT AS (
  SELECT conv_id_a, conv_id_b, max(score) AS score, min(decision) AS decision
  FROM (SELECT * FROM directT UNION ALL SELECT * FROM testedT)
  GROUP BY conv_id_a, conv_id_b
)"""


def _er_matches_sql() -> str:
    return (
        "WITH " + _er_pipeline_sql()
        + """
SELECT conv_id_a, conv_id_b, round(score, 6) AS score, decision FROM matchesT"""
    )


def _er_clusters_sql() -> str:
    # transitive closure of the match graph as a recursive CTE;
    # component_id = lexicographic min member (clustering.py semantics)
    return (
        "WITH RECURSIVE " + _er_pipeline_sql()
        + """,
edgesT AS (
  SELECT conv_id_a AS u, conv_id_b AS v FROM matchesT
  UNION SELECT conv_id_b, conv_id_a FROM matchesT
),
reachT(u, v) AS (
  SELECT u, v FROM edgesT
  UNION
  SELECT r.u, e.v FROM reachT r JOIN edgesT e ON r.v = e.u WHERE r.u <> e.v
),
compT AS (
  SELECT u AS conv_id, least(u, min(v)) AS component_id FROM reachT GROUP BY u
)
SELECT d.conv_id, coalesce(c.component_id, d.conv_id) AS component_id
FROM docsrc d LEFT JOIN compT c USING (conv_id)"""
    )


def _er_eval_grid_sql() -> str:
    return (
        "WITH " + _er_pipeline_sql()
        + f""",
truthT AS (
  SELECT a.conv_id AS conv_id_a, b.conv_id AS conv_id_b
  FROM (SELECT printf('d%08d', doc_id) AS conv_id, {_H('text')} AS th
        FROM documents) a
  JOIN (SELECT printf('d%08d', doc_id) AS conv_id, {_H('text')} AS th
        FROM documents) b
    ON a.th = b.th AND a.conv_id < b.conv_id
),
rankedG AS (
  SELECT src, dst, score,
         dense_rank() OVER (PARTITION BY src ORDER BY round(score, 6) DESC)
           AS krank
  FROM directedT
),
pairRankG AS (
  SELECT least(src, dst) AS conv_id_a, greatest(src, dst) AS conv_id_b,
         max(score) AS score, min(krank) AS krank
  FROM rankedG GROUP BY 1, 2
),
prG AS (
  SELECT coalesce(p.score, -1.0::DOUBLE) AS score,
         coalesce(p.krank, 1000000000) AS krank,
         CASE WHEN t.conv_id_a IS NOT NULL THEN 1 ELSE 0 END AS is_true
  FROM pairRankG p FULL JOIN truthT t USING (conv_id_a, conv_id_b)
),
gridG AS (
  SELECT seuil, k
  FROM (SELECT unnest([{", ".join(f"{t!r}::DOUBLE" for t in GRID_THRESHOLDS)}])
          AS seuil),
       (SELECT unnest([{", ".join(str(k) for k in GRID_KS)}]) AS k)
),
aggG AS (
  SELECT seuil, k,
    sum(predicted * is_true)::BIGINT AS tp,
    sum(predicted * (1 - is_true))::BIGINT AS fp,
    sum((1 - predicted) * is_true)::BIGINT AS fn
  FROM (SELECT seuil, k, is_true,
          CASE WHEN score >= seuil AND krank <= k THEN 1 ELSE 0 END AS predicted
        FROM prG, gridG)
  GROUP BY seuil, k
)
SELECT seuil, k, tp, fp, fn,
  round(CASE WHEN p + r > 0 THEN 2 * p * r / (p + r) ELSE 0.0::DOUBLE END, 6)
    AS f1
FROM (SELECT *, tp / greatest(tp + fp, 1) AS p, tp / greatest(tp + fn, 1) AS r
      FROM aggG)"""
    )


def _embedding_near_dup_sql() -> str:
    """DuckDB twin of _q_embedding_near_dup: recomputes the portable
    document vectors (vecT), axis-sign buckets them, and verifies
    cosine >= 0.95 within buckets — the identical double chains the
    er_matches blend already validates cross-engine."""
    from energy_aware_entity_resolution_spark.config import ScoringConfig

    dim = ScoringConfig().embedding_dim
    bucket = " + ".join(
        f"(CASE WHEN vec[{j + 1}] > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(4)
    )
    dot = (
        f"list_sum(list_transform(range(1, {dim} + 1),"
        " j -> a.vec[j] * b.vec[j]))"
    )
    na = "sqrt(list_sum(list_transform(a.vec, x -> x * x)))"
    nb = "sqrt(list_sum(list_transform(b.vec, x -> x * x)))"
    return (
        "WITH " + _er_pipeline_sql()
        + f""",
bkT AS (SELECT conv_id, vec, ({bucket}) AS bucket FROM vecT)
SELECT conv_id_a, conv_id_b, cosine FROM (
  SELECT a.conv_id AS conv_id_a, b.conv_id AS conv_id_b,
         round({dot} / greatest({na} * {nb}, 1e-12), 6) AS cosine
  FROM bkT a JOIN bkT b ON a.bucket = b.bucket AND a.conv_id < b.conv_id)
WHERE cosine >= 0.95"""
    )


def _er_score_hist_sql() -> str:
    return (
        "WITH " + _er_pipeline_sql()
        + f""",
truthH AS (
  SELECT a.conv_id AS conv_id_a, b.conv_id AS conv_id_b
  FROM (SELECT printf('d%08d', doc_id) AS conv_id, {_H('text')} AS th
        FROM documents) a
  JOIN (SELECT printf('d%08d', doc_id) AS conv_id, {_H('text')} AS th
        FROM documents) b
    ON a.th = b.th AND a.conv_id < b.conv_id
)
SELECT least(floor(s.score * 20)::BIGINT, 19) AS bin,
       CASE WHEN t.conv_id_a IS NOT NULL THEN 1 ELSE 0 END AS is_match,
       count(*) AS n
FROM scoredT s LEFT JOIN truthH t USING (conv_id_a, conv_id_b)
GROUP BY 1, 2"""
    )


def oracle_sql() -> dict[str, str]:
    return {
        "assemble_events": """
            SELECT user_id, count(*) AS n_events,
                   string_agg(event_type, ' ' ORDER BY ts, event_id) AS event_seq
            FROM events GROUP BY user_id
        """,
        "clean_tokens": f"""
            WITH c AS (SELECT doc_id, {_CLEAN} AS cleaned FROM documents),
            t AS (SELECT doc_id, cleaned,
                    list_distinct(list_filter(string_split(cleaned, '_'),
                                  x -> x <> '' AND x <> 'nan')) AS toks
                  FROM c)
            SELECT doc_id, cleaned, len(toks) AS n_tokens,
                   array_to_string(list_sort(toks), ' ') AS sig
            FROM t
        """,
        "bitmask_blocks": f"""
            WITH c AS (SELECT {_CLEAN} AS cleaned FROM documents)
            SELECT ({_BITMASK_SQL}) AS bitmask, count(*) AS n_docs
            FROM c GROUP BY 1
        """,
        "exact_dup_groups": f"""
            SELECT {_H('text')} AS text_hash, min(doc_id) AS keep_id,
                   count(*) AS n_dups
            FROM documents GROUP BY 1
        """,
        "token_idf": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_WS_DISTINCT}) AS token FROM documents
            ), n AS (SELECT count(*) AS n FROM documents)
            SELECT token, count(*) AS df,
                   round(ln((n.n + 1.0) / (count(*) + 1.0)), 6) AS idf
            FROM toks, n GROUP BY token, n.n
        """,
        "topk_per_group": """
            SELECT l_orderkey, l_linenumber, l_extendedprice, rank FROM (
              SELECT l_orderkey, l_linenumber, l_extendedprice,
                     row_number() OVER (PARTITION BY l_orderkey
                       ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rank
              FROM lineitem) WHERE rank <= 3
        """,
        "ratio_test_orders": """
            WITH ranked AS (
              SELECT l_orderkey, l_extendedprice,
                     row_number() OVER w AS rn,
                     lead(l_extendedprice) OVER w AS s2
              FROM lineitem
              WINDOW w AS (PARTITION BY l_orderkey
                           ORDER BY l_extendedprice DESC, l_linenumber ASC)
            )
            SELECT l_orderkey, round(l_extendedprice, 6) AS s1,
                   round(coalesce(s2, -1.0), 6) AS s2
            FROM ranked
            WHERE rn = 1 AND (s2 IS NULL OR round(l_extendedprice / s2, 6) >= 1.2)
        """,
        "ratio_delta_orders": """
            WITH ranked AS (
              SELECT l_orderkey, l_extendedprice,
                     row_number() OVER w AS rn,
                     lead(l_extendedprice) OVER w AS s2
              FROM lineitem
              WINDOW w AS (PARTITION BY l_orderkey
                           ORDER BY l_extendedprice DESC, l_linenumber ASC)
            )
            SELECT l_orderkey, round(l_extendedprice, 6) AS s1,
                   round(coalesce(s2, -1.0), 6) AS s2
            FROM ranked
            WHERE rn = 1 AND (s2 IS NULL OR
                  (l_extendedprice / greatest(s2, 0.000000001) >= 1.2
                   AND l_extendedprice - s2 >= 20000.0))
        """,
        "mutual_top1": """
            WITH pairs AS (
              SELECT c_custkey, s_suppkey,
                     round(abs(c_acctbal - s_acctbal), 4) AS diff
              FROM customer JOIN supplier ON c_nationkey = s_nationkey
            ), best_c AS (
              SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY c_custkey
                ORDER BY diff ASC, s_suppkey ASC) AS r FROM pairs) WHERE r = 1
            ), best_s AS (
              SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY s_suppkey
                ORDER BY diff ASC, c_custkey ASC) AS r FROM pairs) WHERE r = 1
            )
            SELECT bc.c_custkey, bc.s_suppkey, bc.diff
            FROM best_c bc JOIN best_s bs
              ON bc.c_custkey = bs.c_custkey AND bc.s_suppkey = bs.s_suppkey
             AND bc.diff = bs.diff
        """,
        "minhash_signatures": _MINHASH_CTE,
        "lsh_band_keys": f"""
            WITH sigs AS ({_MINHASH_CTE})
            SELECT doc_id, (i // 4)::INT AS band_id,
                   string_agg(minhash::VARCHAR, '-' ORDER BY i) AS band_key
            FROM sigs GROUP BY doc_id, (i // 4)
        """,
        "minhash_dedup_pairs": f"""
            WITH sigs AS ({_MINHASH_CTE}),
            keys AS (
              SELECT doc_id, (i // 4)::INT AS band_id,
                     string_agg(minhash::VARCHAR, '-' ORDER BY i) AS band_key
              FROM sigs GROUP BY doc_id, (i // 4)
            ), capped AS (
              SELECT * FROM keys QUALIFY
                count(*) OVER (PARTITION BY band_id, band_key) <= 200
            )
            SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
            FROM capped a JOIN capped b
              ON a.band_id = b.band_id AND a.band_key = b.band_key
            WHERE a.doc_id < b.doc_id
        """,
        "near_dup_verified": f"""
            WITH sigs AS ({_MINHASH_CTE}),
            keys AS (
              SELECT doc_id, (i // 4)::INT AS band_id,
                     string_agg(minhash::VARCHAR, '-' ORDER BY i) AS band_key
              FROM sigs GROUP BY doc_id, (i // 4)
            ), capped AS (
              SELECT * FROM keys QUALIFY
                count(*) OVER (PARTITION BY band_id, band_key) <= 200
            ), cand AS (
              SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
              FROM capped a JOIN capped b
                ON a.band_id = b.band_id AND a.band_key = b.band_key
              WHERE a.doc_id < b.doc_id
            ), t AS (
              SELECT doc_id, list_sort({_WS_DISTINCT}) AS toks FROM documents
            )
            SELECT * FROM (
              SELECT doc_id_a, doc_id_b,
                     round(len(list_intersect(ta.toks, tb.toks))::DOUBLE
                       / greatest(len(list_distinct(ta.toks || tb.toks)), 1), 6)
                       AS jaccard
              FROM cand JOIN t ta ON ta.doc_id = cand.doc_id_a
                        JOIN t tb ON tb.doc_id = cand.doc_id_b
            ) WHERE jaccard >= 0.7
        """,
        "ngram_jaccard_pairs": f"""
            WITH t AS (
              SELECT doc_id, lang, source,
                     list_sort({_WS_DISTINCT}) AS toks
              FROM documents
            )
            SELECT * FROM (
              SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                     round(len(list_intersect(a.toks, b.toks))::DOUBLE
                       / greatest(len(list_distinct(a.toks || b.toks)), 1), 6)
                       AS jaccard
              FROM t a JOIN t b ON a.lang = b.lang AND a.source = b.source
              WHERE a.doc_id < b.doc_id
            ) WHERE jaccard >= 0.5
        """,
        "simhash": f"""
            WITH t AS (
              SELECT doc_id,
                     list_transform({_WS_DISTINCT}, tok -> {_H('tok')}) AS hs
              FROM documents
            )
            SELECT doc_id,
              list_sum(list_transform(range(0, 32), j ->
                CASE WHEN list_sum(list_transform(hs, h ->
                   CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                THEN (1::BIGINT << j) ELSE 0 END))::BIGINT AS simhash
            FROM t
        """,
        "simhash_dedup_pairs": f"""
            WITH t AS (
              SELECT doc_id,
                     list_transform({_WS_DISTINCT}, tok -> {_H('tok')}) AS hs
              FROM documents
            ), sh AS (
              SELECT doc_id,
                list_sum(list_transform(range(0, 32), j ->
                  CASE WHEN list_sum(list_transform(hs, h ->
                     CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                  THEN (1::BIGINT << j) ELSE 0 END))::BIGINT AS sh
              FROM t
            ), banded AS (
              SELECT doc_id, sh, i::INT AS chunk_idx,
                     (sh >> (i * 8)::INT) & 255 AS chunk
              FROM sh, (SELECT unnest(range(0, 4)) AS i)
            ), capped AS (
              SELECT * FROM banded
              QUALIFY count(*) OVER (PARTITION BY chunk_idx, chunk) <= 200
            )
            SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                   bit_count(xor(a.sh, b.sh))::INT AS hamming
            FROM capped a JOIN capped b
              ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk
            WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sh, b.sh)) <= 3
        """,
        "embedding_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                       FROM embeddings WHERE vec_id % 25 = 0),
            scored AS (
              SELECT q.query_id, v.vec_id AS neighbor_id,
                round(
                  list_sum(list_transform(range(1, len(q.qv) + 1),
                    j -> q.qv[j]::DOUBLE * v.embedding[j]::DOUBLE))
                  / greatest(
                      sqrt(list_sum(list_transform(q.qv, x -> x::DOUBLE * x)))
                    * sqrt(list_sum(list_transform(v.embedding, x -> x::DOUBLE * x))),
                    1e-12),
                6) AS cosine
              FROM embeddings v, q WHERE v.vec_id <> q.query_id
            )
            SELECT query_id, neighbor_id, cosine, rank FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id ASC) AS rank
              FROM scored) WHERE rank <= 5
        """,
        "embedding_lsh_buckets": """
            SELECT vec_id,
              ((CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
             + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
             + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
             + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)) AS bucket
            FROM embeddings
        """,
        "embedding_lsh_buckets_rotated": _rotated_bucket_sql(),
        "ivf_cells": _IVF_ASSIGN_CTE + "SELECT vec_id, cell_id FROM assigned",
        "ivf_topk": _IVF_ASSIGN_CTE + f"""
            , pairs AS (
              SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                     {_cos_sql('a.embedding', 'b.embedding')} AS cosine
              FROM assigned a JOIN assigned b ON a.cell_id = b.cell_id
              WHERE a.vec_id <> b.vec_id
            )
            SELECT query_id, neighbor_id, cosine, rank FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id ASC) AS rank
              FROM pairs) WHERE rank <= 3
        """,
        "ivf_topk_nprobe2": _IVF_ASSIGN_CTE + f"""
            , pairs AS (
              SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                     {_cos_sql('a.embedding', 'b.embedding')} AS cosine
              FROM probed2 a JOIN assigned b ON a.cell_id = b.cell_id
              WHERE a.vec_id <> b.vec_id
            )
            SELECT query_id, neighbor_id, cosine, rank FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id ASC) AS rank
              FROM pairs) WHERE rank <= 3
        """,
        "lsh_multiprobe_topk": f"""
            WITH b AS (
              SELECT vec_id, embedding,
                ((CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
               + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
               + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
               + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)) AS bucket
              FROM embeddings
            ), probes AS (
              SELECT vec_id AS query_id, embedding AS qv,
                     xor(bucket, m) AS pbucket
              FROM b, (SELECT unnest([0, 1, 2, 4, 8]) AS m)
            ), pairs AS (
              SELECT p.query_id, t.vec_id AS neighbor_id,
                     {_cos_sql('p.qv', 't.embedding')} AS cosine
              FROM probes p JOIN b t ON t.bucket = p.pbucket
              WHERE t.vec_id <> p.query_id
            )
            SELECT query_id, neighbor_id, cosine, rank FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id ASC) AS rank
              FROM pairs) WHERE rank <= 2
        """,
        "lang_quality": _lang_quality_sql(),
        "doc_fingerprint": f"""
            SELECT doc_id,
              list_min(list_transform(
                range(1, greatest(length(text) - 7, 1) + 1),
                i -> {_H('substr(text, i, 8)')})) AS fingerprint
            FROM documents
        """,
        "sessionize_events": """
            WITH g AS (
              SELECT user_id, ts, event_id,
                CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > 1800
                     THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT user_id,
                sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS session_idx
              FROM g
            )
            SELECT user_id, (max(session_idx) + 1)::BIGINT AS n_sessions,
                   count(*) AS n_events
            FROM s GROUP BY user_id
        """,
        "window_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n, round(sum(value), 4) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "sn_blocks": f"""
            WITH c AS (SELECT doc_id, {_CLEAN} AS cleaned FROM documents),
            t AS (SELECT doc_id,
                    array_to_string(list_sort(list_distinct(
                      list_filter(string_split(cleaned, '_'),
                                  x -> x <> '' AND x <> 'nan'))), ' ') AS sig
                  FROM c)
            SELECT doc_id, substr(sig, 1, 2) AS bucket,
                   row_number() OVER (PARTITION BY substr(sig, 1, 2)
                                      ORDER BY sig, doc_id) AS rank
            FROM t
        """,
        "hub_cap": """
            SELECT o_custkey, count(*) AS degree FROM orders
            GROUP BY o_custkey HAVING count(*) <= 12
        """,
        "token_bigrams": f"""
            WITH t AS (SELECT {_WS_TOKENS} AS toks FROM documents),
            g AS (
              SELECT unnest(
                CASE WHEN len(toks) >= 2
                     THEN list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i + 1])
                     ELSE [] END) AS bigram
              FROM t
            )
            SELECT bigram, count(*) AS n FROM g GROUP BY bigram
        """,
        "multiset_jaccard_pairs": f"""
            WITH t AS (
              SELECT doc_id, lang, source, {_WS_TOKENS} AS toks FROM documents
            ), pairs AS (
              SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                round(
                  list_sum(list_transform(list_distinct(a.toks || b.toks),
                    tok -> least(len(list_filter(a.toks, x -> x = tok)),
                                 len(list_filter(b.toks, x -> x = tok)))))::DOUBLE
                  / greatest(len(a.toks) + len(b.toks)
                    - list_sum(list_transform(list_distinct(a.toks || b.toks),
                        tok -> least(len(list_filter(a.toks, x -> x = tok)),
                                     len(list_filter(b.toks, x -> x = tok))))), 1),
                6) AS mjaccard
              FROM t a JOIN t b ON a.lang = b.lang AND a.source = b.source
              WHERE a.doc_id < b.doc_id
            )
            SELECT * FROM pairs WHERE mjaccard >= 0.4
        """,
        "dedup_keep_list": f"""
            SELECT doc_id, n_chars FROM documents
            WHERE doc_id IN (
              SELECT min(doc_id) FROM documents GROUP BY {_H('text')}
            )
        """,
        "er_matches": _er_matches_sql(),
        "er_clusters": _er_clusters_sql(),
        "er_eval_grid": _er_eval_grid_sql(),
        "embedding_near_dup_pairs": _embedding_near_dup_sql(),
        "embedding_near_dup_multipass": _near_dup_multipass_sql(),
        "er_score_hist": _er_score_hist_sql(),
    }
