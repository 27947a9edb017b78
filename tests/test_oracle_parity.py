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


def test_r09_window_leads_with_unverified_entries():
    """The driver records only the first 50 queries() entries; r09 must
    lead with the 11 late-r8 entries that have never had a driver
    CORRECTNESS row (VERDICT r8 finding #3, the positional queue) plus
    every r09 addition, then the full r04-last-green refresh cohort —
    an accidental reorder would silently burn the round's only driver
    evidence."""
    import __spark_entry__ as entrymod

    first50 = list(entrymod.queries())[:50]
    never_verified = {
        "model_gate_impact_matrix",
        "model_replace_impact_matrix",
        "split_repair_plan",
        "length_bucket_plan",
        "output_shard_manifest",
        "preference_pairs",
        "hard_negatives_topk",
        "fim_split_plan",
        "packing_vs_bucketing_report",
        "preference_pair_dedup_audit",
        "export_shard_manifest",
    }
    r09_new = {"curation_export_delta", "preference_pair_repair_plan"}
    # the full 16-entry r04-last-green cohort must be refreshed
    r04_cohort = {
        "domain_mix_resample",
        "embed_feature_hashing",
        "embedding_outliers",
        "hybrid_search_topk",
        "jsonl_roundtrip",
        "ksql_join_within",
        "minhash_signatures",
        "multimodal_features",
        "multimodal_frame_sample",
        "pq_encode",
        "retention_cohorts",
        "scd2_user_versions",
        "sliding_window_events",
        "sparse_ann_topk",
        "text_token_entropy",
        "window_distribution_orders",
    }
    assert never_verified | r09_new | r04_cohort <= set(first50)
    assert first50[:2] == ["jovens", "idadecont"]  # flagships stay first
