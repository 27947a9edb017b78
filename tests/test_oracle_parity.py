"""Property-based parity of the oracle's foundation (hypothesis).

Every DuckDB oracle in ``__spark_entry__`` leans on three cross-engine
identities: tokenization (``functions.text.tokens`` ≡ the ``_TOKS``
fragment), the 60-bit md5 hash (``md5_hash64`` ≡ ``('0x' ||
substr(md5(s),1,15))::BIGINT``), and bigram shingling (``shingles`` ≡
``_SHINGLES``). The fixture sweeps exercise them over one corpus; these
properties pin them over adversarial text — mixed unicode, repeated
whitespace, empty/degenerate docs — so a Spark-vs-DuckDB divergence
surfaces here as a unit failure instead of as a mysterious hash mismatch
in a downstream oracle.

Alphabet note: intentionally excludes locale-sensitive case-mapping
codepoints (Turkish İ, etc.) — the engines' ``lower`` implementations are
only contractually identical on standard mappings, and corpus text that
needs locale-aware folding should be normalized upstream.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from __spark_entry__ import _SHINGLES, _TOKS
from kafka_exercise_spark.functions.text import md5_hash64, shingles, tokens

ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " \t\n.,;:!?-_()[]{}'\"/\\@#$%^&*+=~`"
    "éñüçßàøå中文日本語한국어"
)

TEXTS = st.lists(
    st.text(alphabet=ALPHABET, max_size=60), min_size=1, max_size=6
)


def _spark_side(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    tok = tokens(F.col("text"))
    return (
        df.select(
            "doc_id",
            tok.alias("tok"),
            shingles(tok, 2).alias("sh"),
            md5_hash64(F.col("text")).alias("h"),
        )
        .orderBy("doc_id")
        .collect()
    )


def _duck_side(texts):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": list(texts)}),
    )
    return con.sql(
        f"""
        WITH t AS (SELECT doc_id, text, {_TOKS} AS tok FROM documents),
        s AS (SELECT doc_id, tok, {_SHINGLES} AS sh,
                     ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
              FROM t)
        SELECT doc_id, tok, sh, h FROM s ORDER BY doc_id
        """
    ).fetchall()


@given(TEXTS)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_tokens_shingles_hash_parity(spark, texts):
    got = _spark_side(spark, texts)
    exp = _duck_side(texts)
    for g, e in zip(got, exp):
        assert g.doc_id == e[0]
        assert list(g.tok) == list(e[1]), texts
        # shingles: Spark's array_distinct and DuckDB's list_distinct may
        # order differently — compare as sets AND as multiplicity-free
        assert sorted(g.sh) == sorted(e[2]), texts
        assert g.h == e[3], texts


def test_r11_window_composition():
    """The driver records only the first 50 queries() entries; the r11
    window must be: flagships, the 3 new r11 entries, the COMPLETE
    remaining 35-entry r06-last-green cohort (VERDICT r10 ask #1 —
    burning a slot elsewhere would strand an r06 row for another full
    cycle), then the 10-entry weighted head of the r07 cohort (3
    streaming replays, 2 cross-family capstones, 5 alphabetical)."""
    import __spark_entry__ as entrymod

    first50 = list(entrymod.queries())[:50]
    r11_new = {
        "preference_export_manifest",
        "export_version_delta",
        "bucket_version_delta",
    }
    # the full remaining r06-last-green cohort (mechanical ledger over
    # CORRECTNESS_r01..r10: entries whose newest green row is r06)
    r06_cohort = {
        "ann_ivf_topk",
        "ann_lsh_bucketed",
        "ann_lsh_multiprobe",
        "bpe_apply_trained",
        "bpe_segment_words",
        "bpe_train_merges",
        "curation_pipeline",
        "curriculum_plan",
        "dedup_components",
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "dedup_simhash_pairs",
        "knn_label_vote",
        "knn_label_vote_ivf",
        "log_compaction",
        "minhash_s_curve",
        "pack_efficiency_report",
        "pii_scrub_report",
        "q11_important_stock",
        "q14_promo_effect",
        "q15_top_supplier",
        "q16_supplier_cnt",
        "q17_small_qty_revenue",
        "q19_disjunctive_join",
        "q20_potential_promotion",
        "q21_waiting_supplier",
        "q2_min_cost_supplier",
        "quality_quantile_filter",
        "split_leakage_report",
        "split_train_valid_test",
        "text_novelty_score",
        "winnow_components",
        "winnow_incremental",
        "winnow_threshold_sweep",
        "winnowing_overlap_pairs",
    }
    # the weighted-policy head of the r07 cohort
    r07_head = {
        "streaming_dq_gate",
        "streaming_model_gate_replay",
        "streaming_model_update_replay",
        "model_rule_disagreement_report",
        "curation_manifest_model_gate",
        "agg_stats_events",
        "approx_aggs_events",
        "asof_join_events",
        "avro_wire_roundtrip",
        "bpe_pair_counts",
    }
    assert first50[:2] == ["jovens", "idadecont"]  # flagships stay first
    assert set(first50[2:5]) == r11_new
    assert set(first50) == {"jovens", "idadecont"} | r11_new | r06_cohort | r07_head
    assert len(r06_cohort) == 35 and len(r07_head) == 10
