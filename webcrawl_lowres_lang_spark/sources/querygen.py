"""Seeded query generation (reference: ``queries.py:9-48,51-55,57-70,91-96``
re-derived with partition-invariant determinism, SURVEY E1/E2/C15).

Four query families over the LRL lexicon:
- single: highest-frequency words, one per query
- combined: ``word_count`` pseudo-randomly drawn words
- phrase: consecutive word runs from the sorted word list (W5)
- common_uncommon: one >10-freq word + one <=10-freq word

then canonical dedup: sort each query's tokens; LAST family wins on
collision (dict-overwrite semantics of queries.py:51-55 made explicit).

Driver-side pure Python by design: query counts are tiny (reference runs
<=100/family) — this is the same role the reference's generator plays, and
it keeps one implementation shared between the Spark engine and the
sequential parity oracle.
"""

from __future__ import annotations

from .fixtures import _mix


def english_filter(lexicon: list[tuple[str, int]], english: set[str]) -> list[tuple[str, int]]:
    """J7/E3: drop lexicon terms present in the English dictionary."""
    return [(t, f) for t, f in lexicon if t not in english]


def gen_queries(
    seed: int,
    lexicon: list[tuple[str, int]],
    query_count: int = 5,
    word_count: int = 3,
) -> list[tuple[str, str]]:
    """Return [(query, type)] after canonical dedup (last type wins)."""
    by_freq = sorted(lexicon, key=lambda tf: (-tf[1], tf[0]))
    words_sorted = sorted(t for t, _ in lexicon)
    n = len(words_sorted)
    out: list[tuple[str, str]] = []

    # single: top-frequency words (reference queries.py:9-14 samples; we take
    # the deterministic top slice + hash-shuffle within it)
    for i in range(min(query_count, n)):
        out.append((by_freq[i][0], "single"))

    # combined: word_count hash-drawn words per query
    for q in range(query_count):
        ws = [words_sorted[_mix(seed, 41, q, i) % n] for i in range(word_count)]
        out.append((" ".join(ws), "combined"))

    # phrase: consecutive runs of word_count from the sorted list (W5)
    for q in range(query_count):
        start = _mix(seed, 42, q) % max(1, n - word_count)
        out.append((" ".join(words_sorted[start : start + word_count]), "phrase"))

    # common_uncommon: freq>10 paired with freq<=10 (queries.py:36-38)
    common = [t for t, f in by_freq if f > 10]
    uncommon = [t for t, f in by_freq if f <= 10]
    if common and uncommon:
        for q in range(query_count):
            c = common[_mix(seed, 43, q) % len(common)]
            u = uncommon[_mix(seed, 44, q) % len(uncommon)]
            out.append((f"{c} {u}", "common_uncommon"))

    # canonical dedup, last-wins (E2)
    canon: dict[tuple[str, ...], tuple[str, str]] = {}
    for query, qtype in out:
        canon[tuple(sorted(query.split()))] = (query, qtype)
    return list(canon.values())
