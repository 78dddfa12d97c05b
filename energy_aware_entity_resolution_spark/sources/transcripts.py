"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Produces the engine's primary input table
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` plus a ``labeled_pairs`` ground-truth table — the analog
of the reference's Data_example/fodors_zagats-{tableA,tableB}.csv +
matches.txt golden fixture (reference dataprocessing/evaluation.py:15-29
parses that ground truth).

Determinism: every conversation is a pure function of (seed, conv
index); generation is distributed via ``mapInPandas`` over
``spark.range(n_convs)`` so the same table materializes identically at
any parallelism — a requirement for the two-parallelism scaling bench.

Planted structure per 10-conversation group g (slot s = i % 10):
- s=0  entity A(g) canonical conversation
- s=1  EXACT duplicate of s=0 (identical per-turn text → same token
       signature → same exact-match block; reference semantics
       comparison_approaches/exact_matching.py:30-55)
- s=2  NEAR duplicate of s=0 (date reformat, numeric jitter, adjacent
       word swap, stopword drop — token Jaccard stays high; hits
       MinHash-LSH + fuzzy scoring, not the exact path)
- s=3  entity B(g) canonical
- s=4  NEAR duplicate of s=3
- s=5..9 unique background conversations
Every conversation opens with the same boilerplate system+greeting
turns → hot LSH blocks (exercises block capping / salting / AQE skew).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)
LABELED_SCHEMA = "conv_id_a string, conv_id_b string, label int, block_key string"

_NOUNS = [
    "table", "flight", "hotel", "invoice", "ticket", "report", "order",
    "meeting", "package", "refund", "account", "reservation", "contract",
    "shipment", "payment", "database", "cluster", "pipeline", "dataset",
    "model",
]
_PLACES = [
    "chicago", "paris", "tokyo", "berlin", "madrid", "sydney", "toronto",
    "lisbon", "oslo", "dublin", "prague", "vienna", "zurich", "geneva",
    "boston", "austin", "denver", "seattle", "atlanta", "phoenix",
]
_VERBS = [
    "book", "cancel", "update", "review", "schedule", "confirm", "trace",
    "audit", "migrate", "deploy", "resize", "restore", "archive", "merge",
    "split", "rename", "export", "import", "validate", "rollback",
]
_TOOLS = ["search_web", "calendar", "crm_lookup", "sql_query", "file_read", None, None]

# expand the base pools combinatorially so unrelated entities rarely
# share content words (real transcript vocabularies are large; with
# tiny pools every pair of entities collides on most content tokens)
_SUFFIX = ["alpha", "beta", "gamma", "delta", "omega", "prime", "nova", "zen", "max", "lite"]
_NOUNS = [f"{n}{s}" for n in _NOUNS for s in _SUFFIX]
_PLACES = [f"{p}{s}" for p in _PLACES for s in _SUFFIX]
_VERBS = [f"{v}{s}" for v in _VERBS for s in _SUFFIX]
_BOILER = [
    ("system", "You are a helpful assistant. Follow company policy at all times."),
    ("user", "Hello! I need some help with a request today, thanks."),
]
_SYNONYM = {"help": "assist", "need": "require", "small": "little", "big": "large"}

_BASE_TS = np.datetime64("2026-01-30T12:00:00")


def _entity_words(rng: np.random.Generator, g: int, variant: int) -> list[str]:
    """Deterministic content words for entity (g, variant)."""
    verbs = rng.choice(_VERBS, size=3, replace=False)
    nouns = rng.choice(_NOUNS, size=3, replace=False)
    places = rng.choice(_PLACES, size=2, replace=False)
    return [str(w) for w in (*verbs, *nouns, *places)]


def _canonical_turns(rng: np.random.Generator, words: list[str]) -> list[tuple[str, str, str | None]]:
    """Render an entity's canonical conversation body (role, text, tool)."""
    v1, v2, v3, n1, n2, n3, p1, p2 = words
    day = int(rng.integers(1, 28))
    month = int(rng.integers(1, 12))
    amount = int(rng.integers(10, 9000))
    code = int(rng.integers(100000, 999999))
    turns: list[tuple[str, str, str | None]] = [
        ("user", f"Please {v1} the {n1} in {p1} for 2025-{month:02d}-{day:02d}.", None),
        ("assistant", f"Sure, I will {v1} the {n1}. The reference code is {code}.", None),
        ("tool", f"{n1} {p1} status ok total {amount} dollars", str(rng.choice([t for t in _TOOLS if t]))),
        ("user", f"Also {v2} the {n2} and {v3} the {n3} near {p2}.", None),
        ("assistant", f"Done. The {n2} and {n3} are handled, total {amount} dollars.", None),
    ]
    return turns


def _near_dup_edit(rng: np.random.Generator, turns: list[tuple[str, str, str | None]]) -> list[tuple[str, str, str | None]]:
    """Perturb a canonical conversation into a near-duplicate.

    Edits mirror the FIXTURES.md recipe: date reformat (clean_date
    canonicalization should re-unify it), numeric float-ification
    (convert_token_value parity: utils/utils.py:137-147 rounds floats),
    adjacent-word swap, synonym substitution.
    """
    out = []
    for role, text, tool in turns:
        t = text
        # 2025-MM-DD -> MM/DD/2025 (reference clean_date handles both)
        if "2025-" in t and rng.random() < 0.9:
            iso = t[t.index("2025-") : t.index("2025-") + 10]
            _, mm, dd = iso.split("-")
            t = t.replace(iso, f"{mm}/{dd}/2025")
        if rng.random() < 0.5:
            for a, b in _SYNONYM.items():
                t = t.replace(f" {a} ", f" {b} ")
        words = t.split(" ")
        if len(words) > 4 and rng.random() < 0.6:
            j = int(rng.integers(1, len(words) - 2))
            words[j], words[j + 1] = words[j + 1], words[j]
            t = " ".join(words)
        out.append((role, t, tool))
    return out


def _unique_turns(rng: np.random.Generator, g: int, s: int) -> list[tuple[str, str, str | None]]:
    words = _entity_words(rng, g, 100 + s)
    turns = _canonical_turns(rng, words)
    # extra distinguishing turn so background convs are clearly unique
    extra = str(rng.choice(_NOUNS)) + "_" + str(g * 10 + s)
    turns.append(("user", f"One more thing about the {extra} case id {int(rng.integers(1, 10**6))}.", None))
    return turns


def conversation_rows(seed: int, i: int) -> list[tuple[str, int, str, str, str | None]]:
    """Pure function (seed, conv index) -> list of turn rows (sans ts)."""
    g, s = divmod(i, 10)
    conv_id = f"conv_{i:08d}"
    # seed sequences (seed, stream, index) are collision-free across
    # streams by construction (np seeds on the whole tuple)
    if s in (0, 1, 2):
        rng = np.random.default_rng([seed, 1, g])
        body = _canonical_turns(rng, _entity_words(rng, g, 0))
        if s == 2:
            body = _near_dup_edit(np.random.default_rng([seed, 3, i]), body)
    elif s in (3, 4):
        rng = np.random.default_rng([seed, 2, g])
        body = _canonical_turns(rng, _entity_words(rng, g, 1))
        if s == 4:
            body = _near_dup_edit(np.random.default_rng([seed, 3, i]), body)
    else:
        rng = np.random.default_rng([seed, 4, i])
        body = _unique_turns(rng, g, s)
    turns = list(_BOILER) + [(r, t) for r, t, _ in body]
    tools = [None] * len(_BOILER) + [tl for _, _, tl in body]
    return [
        (conv_id, j, role, text, tools[j])
        for j, (role, text) in enumerate(turns)
    ]


def generate_transcripts(
    spark: SparkSession, n_convs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic transcripts table (input_hint schema)."""
    parts = partitions or max(8, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                for conv_id, j, role, text, tool in conversation_rows(seed, int(i)):
                    ts = _BASE_TS + np.timedelta64(int(i) * 3600 + j * 7, "s")
                    rows.append((conv_id, j, role, text, tool, ts))
            yield pd.DataFrame(
                rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )

    return (
        spark.range(0, n_convs, numPartitions=parts)
        .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    )


def transcripts_from_documents(
    docs: DataFrame, tokens_per_turn: int = 5
) -> DataFrame:
    """Derive an input_hint-shaped transcripts table from a documents
    table (doc_id, text, ...) with ONLY oracle-portable operations:
    whitespace-tokenize each document and chunk consecutive runs of
    ``tokens_per_turn`` tokens into alternating user/assistant turns.

    This is the correctness-gate bridge: the DuckDB oracle cannot
    regenerate the numpy synthetic transcripts, but it CAN reproduce
    this derivation from the shared documents parquet — which makes the
    WHOLE flagship pipeline (assemble -> featurize -> candidates ->
    scoring -> decision -> connected components) oracle-checkable
    end-to-end. The assembled doc equals the space-joined token list,
    so the oracle skips straight to it while Spark exercises the real
    turn assembly.
    """
    from pyspark.sql import functions as F  # local: keep module top clean

    toks = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != F.lit("")
    )
    base = docs.select(
        F.format_string("d%08d", F.col("doc_id")).alias("conv_id"),
        toks.alias("toks"),
    )
    n_turns = F.greatest(
        F.ceil(F.size("toks") / F.lit(tokens_per_turn)).cast("int"), F.lit(1)
    )
    turns = base.select(
        "conv_id",
        "toks",
        F.explode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx"),
    )
    return turns.select(
        "conv_id",
        "turn_idx",
        F.when(F.col("turn_idx") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        F.array_join(
            F.slice(
                "toks", F.col("turn_idx") * tokens_per_turn + 1, tokens_per_turn
            ),
            " ",
        ).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.timestamp_seconds(F.lit(1769774400) + F.col("turn_idx")).alias("ts"),
    )


def generate_labeled_pairs(spark: SparkSession, n_convs: int, seed: int = 42) -> DataFrame:
    """Ground-truth pairs (FIXTURES.md §2): positives within planted
    duplicate sets, hard negatives across entities of the same group
    (they share the boilerplate blocking key).
    """
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for gid in pdf["id"].tolist():
                g = int(gid)
                base = g * 10
                if base + 9 >= n_convs:
                    continue
                c = [f"conv_{base + s:08d}" for s in range(10)]
                rows += [
                    (c[0], c[1], 1, "exact"),
                    (c[0], c[2], 1, "near"),
                    (c[1], c[2], 1, "near"),
                    (c[3], c[4], 1, "near"),
                    (c[0], c[3], 0, "boiler"),
                    (c[2], c[4], 0, "boiler"),
                    (c[5], c[6], 0, "boiler"),
                    (c[7], c[8], 0, "boiler"),
                ]
            yield pd.DataFrame(
                rows, columns=["conv_id_a", "conv_id_b", "label", "block_key"]
            )

    n_groups = n_convs // 10
    return spark.range(0, max(n_groups, 1)).mapInPandas(gen, schema=LABELED_SCHEMA)
