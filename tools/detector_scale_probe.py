"""Counter-probe for the detector-ensemble pair build (SCALING r9):
attribute the super-linear x4→x8 step of the memoized ``tier_pairs``
union (4.0 → 14.6 s in the clean r9 ladder) to the family that causes
it, with WORK counters rather than wall guesses — the same treatment
`tools/semantic_scale_probe.py` gave SemDeDup and
`tools/winnow_scale_probe.py` gave winnowing.

Hypothesis under test: the SimHash band join's candidate mass grows
~n²/2^w by the BIRTHDAY EFFECT on its fixed 15-bit band keys — random
collisions, not true near-dups (the scale fixture's vocabulary rename
guarantees near-dup structure replicates linearly). A 15-bit key space
saturates around n ≈ 2^15 docs: at 1x (5k docs) buckets are sparse; at
8x (40k docs) E[|bucket|] > 1 and Σ|bucket|² goes quadratic. The other
three families band on CONTENT-derived keys whose vocabulary grows with
the corpus (shingle hashes, winnow fingerprints), so their bucket sizes
stay bounded under the rename.

Counters per rung, per family:
- cand = Σ_buckets |bucket|·(|bucket|−1)/2 summed over band keys (the
  equi-join's true candidate mass, computed by aggregation — no join);
- out  = verified pair count (the family's real output);
- wall = the verified pair join end-to-end.

Verdict criteria: if simhash cand steps ~4x per 2x data while out stays
~linear, the step is the birthday effect on the fixed key width — the
production knob is key width scaling with corpus size (Manku et al.
2007: pick block width w with 2^w >> n, using more permutation tables
to keep the Hamming-distance guarantee), not a plan defect; wall should
track cand (the engine is linear in true work).

MEASURED VERDICT (r9, committed run): the birthday hypothesis LOST.
simhash cand = 2.59M / 10.2M / 21.6M at 1x/4x/8x — exactly linear
(x8.3 at 8x data; uniform-random keys would have read ~98M): the
fixture's per-copy vocabulary rename concentrates each copy's band keys
on its own values, so buckets grow by copy count, not corpus-squared.
Output linear (170k/524k/1.04M), per-family walls flat. The ladder's
14.6s tier_pairs rung therefore isn't work growth; a fresh-session
re-measure of the build (parents warmed) reads 4.78/4.88/6.96s —
sub-linear — pinning the residual on late-ladder session state
(accumulated checkpointed memos in one 24g heap), the same single-JVM
GC mechanism the r7 winnow adjudication measured. See README
"r9: the SCALING_r08 rung regressions, adjudicated".

Usage: python tools/detector_scale_probe.py   (rungs 1,4,8 by default;
SPARK_GRAFT_SCALE_RUNGS overrides). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_exercise_spark.operators import dedup
from tools.scale_experiment import build_scaled

RUNGS = tuple(
    int(x)
    for x in os.environ.get("SPARK_GRAFT_SCALE_RUNGS", "1,4,8").split(",")
)


def simhash_band_candidates(spark, d: str) -> int:
    """Candidate mass of the simhash band join at dir d, by aggregation."""
    sig = dedup.dedup_simhash(spark, d).select("doc_id", "simhash")
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * 15)
                        .bitwiseAND(F.lit((1 << 15) - 1))
                        .alias("key"),
                    )
                    for b in range(dedup.SIMHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    row = (
        bands.groupBy("band", "key")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) div 2")).alias("cand"))
        .collect()[0]
    )
    return int(row["cand"] or 0)


def lsh_band_candidates(spark, d: str) -> int:
    """Candidate mass of the MinHash LSH band join — computed with the
    ENGINE'S OWN banding (dedup._signatures_from → _band_keys), so the
    counter measures exactly the join the pair plan runs."""
    bands = dedup._band_keys(
        dedup._signatures_from(dedup._hashed_shingles_frame(spark, d))
    )
    row = (
        bands.groupBy("band", "key")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) div 2")).alias("cand"))
        .collect()[0]
    )
    return int(row["cand"] or 0)


def main() -> None:
    from tools.host_canary import gate_or_warn  # noqa: PLC0415

    canary = gate_or_warn("detector_scale_probe")
    from kafka_exercise_spark.session import get_spark

    spark = get_spark("detector_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    results: dict[str, dict] = {}
    for k in RUNGS:
        d = build_scaled(spark, k)
        r: dict[str, float | int] = {}
        # warm the family frames the joins read (fingerprints, shingles)
        dedup.dedup_simhash(spark, d).write.format("noop").mode(
            "overwrite"
        ).save()
        dedup._hashed_shingles_frame(spark, d)
        r["simhash_cand"] = simhash_band_candidates(spark, d)
        t0 = time.perf_counter()
        r["simhash_out"] = dedup.dedup_simhash_pairs(spark, d).count()
        r["simhash_wall"] = round(time.perf_counter() - t0, 3)
        r["lsh_cand"] = lsh_band_candidates(spark, d)
        t0 = time.perf_counter()
        r["ngram_out"] = dedup.dedup_ngram_jaccard(spark, d).count()
        r["ngram_wall"] = round(time.perf_counter() - t0, 3)
        results[f"x{k}"] = r
    results["host_canary"] = canary
    print(json.dumps(results))


if __name__ == "__main__":
    main()
