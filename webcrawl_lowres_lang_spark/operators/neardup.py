"""phash near-duplicate suppression (north rule: "phash-based near-duplicate
suppression"; SURVEY J6 upgraded from exact file-hash identity to Hamming
proximity).

Algorithm — banded Hamming LSH, exact by pigeonhole:
split the 64-bit phash into 8 bands of 8 bits. Two hashes within Hamming
distance <= 4 differ in <= 4 bands, so they AGREE on >= 4 bands — any one
shared (band_idx, band_value) bucket surfaces the pair. Candidate pairs
from the band self-join are verified with ``bit_count(a ^ b) <= d``
(JVM-side), then each row is suppressed in favor of its earliest
(fetch-order) neighbor.

Scale shape: the self-join shuffles on (band_idx, band_value) — 8x data
expansion but tiny rows (2 longs), and bucket sizes stay bounded because
identical-phash exact dups are collapsed first. No pairwise O(n²) anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BANDS = 8
BAND_BITS = 8
DEFAULT_MAX_HAMMING = 4


def _bands(col, n_bands: int = N_BANDS, band_bits: int = BAND_BITS):
    """Array of (band_idx, band_val) structs for a 64-bit column.
    shiftrightunsigned keeps the sign bit from smearing."""
    mask = (1 << band_bits) - 1
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("band_idx"),
                F.shiftrightunsigned(col, i * band_bits).bitwiseAND(F.lit(mask)).alias("band_val"),
            )
            for i in range(n_bands)
        ]
    )


def suppress_near_dups(
    df: DataFrame,
    phash_col: str = "phash",
    order_col: str = "fetch_seq",
    max_hamming: int = DEFAULT_MAX_HAMMING,
) -> DataFrame:
    """Add ``dup_of`` (earliest neighbor's order key; NULL for keepers).

    Earliest-wins: a row is suppressed iff some row with a strictly smaller
    ``order_col`` is within ``max_hamming``. Deterministic given a total
    order — the crawl ledger's (round, fetch_seq) provides one.
    """
    keyed = df.filter(F.col(phash_col).isNotNull()).select(
        F.col(order_col).alias("__ord"), F.col(phash_col).alias("__ph")
    )
    # collapse exact-equal phashes first: one representative per value
    # (bounds band-bucket sizes; exact dups inherit the earliest exemplar).
    # groupBy-min, not a window: partial (map-side) aggregation, no sort.
    reps = keyed.groupBy("__ph").agg(F.min("__ord").alias("__ord"))

    banded = reps.select(
        "__ord", "__ph", F.explode(_bands(F.col("__ph"))).alias("b")
    ).select("__ord", "__ph", "b.band_idx", "b.band_val")

    # Bucket pairing WITHOUT a self-join (same rewrite the minhash LSH
    # family carries): the a/b join sides each re-derived reps + banding
    # (alias-divergent branches defeat ReusedExchange) and cost two band
    # shuffles + a join stage. One groupBy collects each bucket's members
    # sorted by __ord (unique — order keys are a total sequence), and the
    # i<j pair expansion happens inside the array, so ord_a < ord_b by
    # construction. Work per bucket is C(n,2) either way; exact-dup
    # collapse above keeps buckets bounded exactly as before.
    grouped = banded.groupBy("band_idx", "band_val").agg(
        F.array_sort(F.collect_list(F.struct("__ord", "__ph"))).alias("ms")
    )
    pairs = (
        grouped.filter(F.size("ms") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ms, (x, i) -> "
                    "transform(slice(ms, i + 2, size(ms) - i - 1), "
                    "y -> struct(x.__ord AS ord_a, x.__ph AS ph_a, "
                    "y.__ord AS ord_b, y.__ph AS ph_b))))"
                )
            ).alias("p")
        )
        .select("p.ord_a", "p.ph_a", "p.ord_b", "p.ph_b")
        .distinct()
        .filter(F.expr(f"bit_count(ph_a ^ ph_b) <= {max_hamming}"))
    )
    # earliest suppressor per suppressed representative
    earliest = pairs.groupBy("ord_b").agg(F.min("ord_a").alias("__near_dup_of"))

    # map back: every row inherits its representative's verdict. dup_of is
    # the TRUE earliest neighbor (matches a quadratic min exactly):
    # - representative: its earliest near rep (the global earliest neighbor
    #   of any phash value is always a representative — if the earliest
    #   were a non-rep, its exemplar would be even earlier and equally near)
    # - exact dup (non-rep): least(exemplar's order, exemplar's verdict) —
    #   an earlier NEAR neighbor of the exemplar beats the exemplar itself
    rep_verdict = reps.join(earliest, reps["__ord"] == earliest["ord_b"], "left").select(
        F.col("__ph").alias("__v_ph"), F.col("__near_dup_of").alias("__rep_dup_of"),
        F.col("__ord").alias("__rep_ord"),
    )
    out = (
        df.join(rep_verdict, F.col(phash_col) == F.col("__v_ph"), "left")
        .withColumn(
            "dup_of",
            F.when(F.col(phash_col).isNull(), F.lit(None).cast("long"))
            .when(
                F.col(order_col) > F.col("__rep_ord"),
                F.least(
                    F.col("__rep_ord"),
                    F.coalesce(F.col("__rep_dup_of"), F.col("__rep_ord")),
                ),
            )
            .otherwise(F.col("__rep_dup_of")),  # representative: near-dup verdict
        )
        .drop("__v_ph", "__rep_dup_of", "__rep_ord")
    )
    return out
