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


def test_r10_window_leads_with_unverified_entries():
    """The driver records only the first 50 queries() entries; r10 must
    lead with the 4 late-r9 entries that have never had a driver
    CORRECTNESS row (VERDICT r9 finding #2, the positional queue) plus
    every r10 addition, then the full r05-last-green refresh cohort —
    an accidental reorder would silently burn the round's only driver
    evidence."""
    import __spark_entry__ as entrymod

    first50 = list(entrymod.queries())[:50]
    never_verified = {
        "simhash_threshold_sweep",
        "preference_margin_histogram",
        "streaming_soft_draw_replay",
        "bucket_batch_manifest",
    }
    r10_new = {
        "bucket_export_manifest",
        "bucket_export_delta",
        "preference_filtered_export",
        "packing_vs_bucketing_selected_report",
    }
    # the full 28-entry r05-last-green cohort must be refreshed
    r05_cohort = {
        "heavy_hitters_topk",
        "hourly_anomaly_scores",
        "ivf_cells_report",
        "join_customer_orders",
        "k_anonymity_report",
        "lm_bigram_score",
        "lm_unigram_score",
        "merge_scd2_apply",
        "merge_upsert_profiles",
        "mixture_plan",
        "q10_returned_items",
        "q18_large_orders",
        "q3_shipping_priority",
        "q5_local_supplier",
        "q7_volume_shipping",
        "q8_market_share",
        "q9_product_profit",
        "resample_ffill_events",
        "rfm_segments",
        "skew_key_census",
        "span_corruption_masks",
        "streaming_curation_gate",
        "streaming_merge_replay",
        "streaming_scd2_replay",
        "tfidf_top_terms",
        "tokenizer_fertility_report",
        "twa_value_per_user",
        "weighted_sample_topn",
    }
    # the weighted-policy head of the r06 cohort (streaming replays,
    # then composition capstones — ask #8's documented ordering)
    r06_head = {
        "streaming_compaction_replay",
        "streaming_winnow_replay",
        "curation_run_manifest",
        "dedup_detector_matrix",
    }
    assert never_verified | r10_new | r05_cohort | r06_head <= set(first50)
    assert first50[:2] == ["jovens", "idadecont"]  # flagships stay first
