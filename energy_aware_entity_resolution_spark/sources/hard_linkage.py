"""Hard synthetic linkage fixture — the dblp-scholar-difficulty analog.

The reference's hardest published benchmark is dblp-scholar (citation
records with abbreviated venues, dropped tokens, typos, and many
near-miss distractors; its pipeline 1 reports F1 = 0.58 there,
README.md:58). The golden fodors/pi_test fixtures in Data_example/ are
much cleaner (F1 ≈ 0.9). This generator plants dblp-scholar-STYLE
corruption deterministically so the engine's robustness is measured on
something harder than the clean fixtures, without shipping external
data:

Per entity i (citation-shaped record: authors + title + venue + year):
- source A carries the canonical record;
- source B carries a CORRUPTED twin: 1-2 token drops, 1-2 character
  typos, author abbreviation (``jane`` -> ``j.``), venue abbreviated to
  its acronym, year reformatting — applied by a per-entity seeded RNG;
- source B also carries a DISTRACTOR sharing the venue/year and half
  the title vocabulary but belonging to no entity (the precision
  killer dblp-scholar is known for).

Distributed + deterministic: mapInPandas over spark.range, each row a
pure function of (seed, index) — identical at any parallelism, same
contract as sources.transcripts.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

ENTITY_SCHEMA = "conv_id string, source string, text string"
TRUTH_SCHEMA = "conv_id_a string, conv_id_b string"

_FIRST = [
    "jane", "wei", "amir", "lucia", "petra", "diego", "yuki", "tarun",
    "olga", "samir", "ines", "karl", "mona", "ravi", "elif", "bjorn",
]
_LAST = [
    "okafor", "tanaka", "muller", "rossi", "novak", "haddad", "silva",
    "larsen", "kaur", "moreau", "petrov", "diaz", "yamada", "fischer",
    "costa", "weber",
]
# ~400-term title vocabulary (syllable product): real citation corpora
# have thousands of distinct terms, so most title tokens are RARE
# corpus-wide — a tiny vocab would make every title token a de-facto
# stopword and IDF meaningless (fixture realism, not metric gaming)
_TITLE = [
    a + b + c
    for a in ("sca", "en", "stre", "ada", "blo", "lear", "par", "que")
    for b in ("la", "ti", "mi", "pti", "cki", "ni", "alle", "ry")
    for c in ("ble", "ty", "ng", "ve", "on", "zed")
]
_VENUES = [
    ("very", "large", "data", "bases"),
    ("management", "of", "data", "conference"),
    ("knowledge", "discovery", "data", "mining"),
    ("data", "engineering", "international", "conference"),
    ("information", "knowledge", "management", "conference"),
]


def _typo(tok: str, rng: np.random.Generator) -> str:
    if len(tok) < 4:
        return tok
    i = int(rng.integers(1, len(tok) - 2))
    return tok[:i] + tok[i + 1] + tok[i] + tok[i + 2:]


def _record(i: int, seed: int) -> tuple[str, str, str]:
    """(canonical_text, corrupted_text, distractor_text) for entity i —
    pure function of (seed, i)."""
    rng = np.random.default_rng((seed, i))
    authors = [
        (_FIRST[int(rng.integers(len(_FIRST)))],
         _LAST[int(rng.integers(len(_LAST)))])
        for _ in range(int(rng.integers(1, 4)))
    ]
    title = list(
        rng.choice(_TITLE, size=int(rng.integers(5, 9)), replace=False)
    )
    venue = _VENUES[int(rng.integers(len(_VENUES)))]
    year = 1995 + int(rng.integers(0, 30))
    canon = (
        [t for fn, ln in authors for t in (fn, ln)]
        + title + list(venue) + [str(year)]
    )

    # corruption: abbreviate first names, acronymize the venue,
    # drop 1-2 title tokens, typo 1-2 surviving tokens, reformat year
    corr_authors = [t for fn, ln in authors for t in (fn[0] + ".", ln)]
    corr_title = list(title)
    for _ in range(int(rng.integers(1, 3))):
        if len(corr_title) > 3:
            corr_title.pop(int(rng.integers(len(corr_title))))
    for _ in range(int(rng.integers(1, 3))):
        j = int(rng.integers(len(corr_title)))
        corr_title[j] = _typo(corr_title[j], rng)
    corr_venue = ["".join(w[0] for w in venue)]  # acronym
    corr_year = [f"'{year % 100:02d}"] if rng.random() < 0.5 else [str(year)]
    corrupted = corr_authors + corr_title + corr_venue + corr_year

    # distractor: same venue + year, half the title vocab, other authors
    d_rng = np.random.default_rng((seed, i, 7))
    d_authors = [
        (_FIRST[int(d_rng.integers(len(_FIRST)))],
         _LAST[int(d_rng.integers(len(_LAST)))])
        for _ in range(2)
    ]
    keep = title[: max(len(title) // 2, 2)]
    extra = list(d_rng.choice(_TITLE, size=3, replace=False))
    distractor = (
        [t for fn, ln in d_authors for t in (fn, ln)]
        + keep + extra + list(venue) + [str(year)]
    )
    return " ".join(canon), " ".join(corrupted), " ".join(distractor)


def generate_hard_linkage(
    spark: SparkSession, n_entities: int, seed: int = 17
) -> tuple[DataFrame, DataFrame]:
    """(entities, truth): entities(conv_id, source, text) with one A
    record, one corrupted B twin and one B distractor per entity;
    truth(conv_id_a, conv_id_b) canonical labeled pairs (a < b by the
    id scheme: A ids are ``a%08d``, B ids ``b%08d``/``x%08d``)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                canon, corrupted, distractor = _record(i, seed)
                rows.append((f"a{i:08d}", "A", canon))
                rows.append((f"b{i:08d}", "B", corrupted))
                rows.append((f"x{i:08d}", "B", distractor))
            yield pd.DataFrame(rows, columns=["conv_id", "source", "text"])

    ents = spark.range(n_entities).mapInPandas(gen, schema=ENTITY_SCHEMA)
    truth = spark.range(n_entities).selectExpr(
        "printf('a%08d', id) as conv_id_a", "printf('b%08d', id) as conv_id_b"
    )
    return ents, truth
