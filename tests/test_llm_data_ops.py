"""North-star LLM-data operators: text analysis, dedup, similarity, multimodal."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kafka_exercise_spark.operators import dedup, multimodal, similarity, textops


def test_token_stats_bounds(spark, sf_dir):
    for r in textops.text_token_stats(spark, sf_dir).collect():
        assert 0 < r["n_unique_tokens"] <= r["n_ws_tokens"]
        assert r["n_bpe_tokens"] >= r["n_ws_tokens"]  # punct splits add tokens
        assert r["len_text"] > 0


def test_quality_score_range(spark, sf_dir):
    for r in textops.text_quality_score(spark, sf_dir).collect():
        assert 0.0 <= r["quality_score"] <= 1.0
        assert 0.0 <= r["stopword_ratio"] <= 1.0
        assert 0.0 < r["unique_ratio"] <= 1.0


def test_langid_deterministic_labels(spark, sf_dir):
    rows = textops.text_langid(spark, sf_dir).collect()
    allowed = {"en", "de", "es", "fr", "unknown"}
    assert {r["detected_lang"] for r in rows} <= allowed


def test_fingerprint_unique_per_distinct_text(spark, sf_dir):
    df = textops.doc_fingerprint(spark, sf_dir)
    n_docs = df.count()
    assert df.select("fingerprint_md5").distinct().count() == n_docs


def test_dedup_exact_finds_planted_duplicates(spark, sf_dir):
    """Plant real duplicates (fixtures have none) and check grouping."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    doubled = docs.unionAll(
        docs.limit(10).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    doubled.createOrReplaceTempView("documents_doubled")
    from kafka_exercise_spark.functions.text import md5_hash64, normalized_text

    grouped = (
        doubled.select("doc_id", md5_hash64(normalized_text(F.col("text"))).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("survivor"))
    )
    assert grouped.filter("n_copies = 2").count() == 10
    assert grouped.count() == n  # 10 dup groups fold back into originals
    # survivors of dup groups are the original ids, not the planted ones
    assert grouped.filter("n_copies = 2").filter("survivor >= 1000000").count() == 0


def test_minhash_similar_docs_share_bands(spark, sf_dir):
    """A doc is always a near-dup of itself under LSH banding."""
    sig = dedup.minhash_signatures(spark, sf_dir)
    assert sig.count() == spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # signatures are stable: same input -> same signature
    a = sig.orderBy("doc_id").limit(5).collect()
    b = dedup.minhash_signatures(spark, sf_dir).orderBy("doc_id").limit(5).collect()
    assert a == b


def test_lsh_pairs_subset_of_exact(spark, sf_dir):
    """Every LSH-verified pair must truly exceed the Jaccard threshold."""
    for r in dedup.dedup_minhash_lsh(spark, sf_dir).collect():
        assert r["jaccard"] >= dedup.JACCARD_THRESHOLD
        assert r["id_a"] < r["id_b"]


def test_simhash_close_for_similar_token_sets(spark, sf_dir):
    rows = dedup.dedup_simhash(spark, sf_dir).limit(20).collect()
    assert all(0 <= r["simhash"] < (1 << 60) for r in rows)


def test_ann_topk_shape_and_order(spark, sf_dir):
    df = similarity.ann_cosine_topk(spark, sf_dir)
    rows = df.collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(similarity.N_QUERIES))
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        cs = [r["cos"] for r in rs]
        assert cs == sorted(cs, reverse=True)
        assert all(r["neighbor_id"] != q for r in rs)


def test_ann_lsh_recall_vs_brute_force(spark, sf_dir):
    """Bucketed ANN returns a subset of vectors; its hits must be genuine
    brute-force neighbors when they appear (same cosine values)."""
    brute = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in similarity.ann_cosine_topk(spark, sf_dir).collect()
    }
    lsh = similarity.ann_lsh_bucketed(spark, sf_dir).collect()
    assert lsh, "LSH should return candidates (query bucket contains itself)"
    hits = [r for r in lsh if (r["query_id"], r["neighbor_id"]) in brute]
    for r in hits:
        assert abs(brute[(r["query_id"], r["neighbor_id"])] - r["cos"]) < 1e-9


def test_ann_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    """Hamming-1 multi-probe must (a) return genuine cosine values, (b)
    recall at least every brute-force top-k hit single-probe finds, and
    (c) scan only bucket-pruned candidates (still never all-pairs)."""
    brute = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in similarity.ann_cosine_topk(spark, sf_dir).collect()
    }
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_lsh_bucketed(spark, sf_dir).collect()
    }
    multi_rows = similarity.ann_lsh_multiprobe(spark, sf_dir).collect()
    multi = {(r["query_id"], r["neighbor_id"]) for r in multi_rows}
    single_hits = single & set(brute)
    multi_hits = multi & set(brute)
    assert single_hits <= multi_hits  # multi-probe never loses a hit
    assert len(multi_hits) >= len(single_hits)
    for r in multi_rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in brute:
            assert abs(brute[key] - r["cos"]) < 1e-9


def test_multimodal_features_match_python(spark, sf_dir):
    """The Arrow/mapInPandas path reproduces plain-Python byte math."""
    feats = {
        r["doc_id"]: r
        for r in multimodal.multimodal_features(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5).collect()
    for d in docs:
        raw = d["text"].encode("utf-8")
        f = feats[d["doc_id"]]
        assert f["n_bytes"] == len(raw)
        assert f["sha256_hex"] == hashlib.sha256(raw).hexdigest()
        assert f["byte_sum_mod"] == sum(raw) % 997


def test_multimodal_decode_is_stubbed():
    import pytest

    with pytest.raises(NotImplementedError):
        multimodal.decode_stub(b"\x89PNG")


def test_ann_ivf_recall_vs_brute_force(spark, sf_dir):
    """Probing 4/16 IVF cells must recover most exact neighbors."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_cosine_topk(spark, sf_dir).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_ivf_topk(spark, sf_dir).collect()
    }
    assert len(ivf & exact) / len(exact) >= 0.5
    # every query answered with a full top-k
    from collections import Counter

    per_q = Counter(q for q, _ in ivf)
    assert all(n == similarity.TOP_K for n in per_q.values())


def test_simhash_pairs_verified_by_popcount(spark, sf_dir):
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in dedup.dedup_simhash(spark, sf_dir).collect()
    }
    rows = dedup.dedup_simhash_pairs(spark, sf_dir).collect()
    assert rows
    for r in rows:
        want = bin(sigs[r["id_a"]] ^ sigs[r["id_b"]]).count("1")
        assert r["hamming"] == want <= dedup.HAMMING_MAX


def test_quality_repetition_hand_example(spark, sf_dir):
    """dup_frac on a constructed repeated text matches hand arithmetic."""
    rows = textops.quality_repetition(spark, sf_dir).collect()
    for r in rows:
        assert 0.0 <= r["dup_frac_2"] < 1.0
        assert 0.0 <= r["dup_frac_3"] < 1.0
        assert r["flagged"] == (r["dup_frac_2"] > textops.REPETITION_FLAG_FRAC_2)
    # constructed case: "a b a b a b" → 2-grams [ab, ba, ab, ba, ab]:
    # 5 total, 2 distinct → dup_frac_2 = 0.6
    df = spark.createDataFrame([(1, "a b a b a b")], "doc_id long, text string")
    df.write.mode("overwrite").parquet("/tmp/qr_docs/documents.parquet")
    r = textops.quality_repetition(spark, "/tmp/qr_docs").collect()[0]
    assert r["n_2grams"] == 5 and abs(r["dup_frac_2"] - 0.6) < 1e-9


def test_pii_redact_literal_rows(spark, sf_dir):
    # fixtures are PII-free: counts 0, text passes through unchanged
    joined = (
        textops.pii_redact(spark, sf_dir)
        .join(spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id")
    )
    assert joined.filter(
        (F.col("n_emails") != 0) | (F.col("n_phones") != 0)
        | (F.col("redacted_text") != F.col("text"))
    ).count() == 0
    # planted PII is found and scrubbed
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.com and call +1 (555) 123-4567 now")],
        "doc_id long, text string",
    )
    df.write.mode("overwrite").parquet("/tmp/pii_docs/documents.parquet")
    r = textops.pii_redact(spark, "/tmp/pii_docs").collect()[0]
    assert r["n_emails"] == 1 and r["n_phones"] == 1
    assert "<EMAIL>" in r["redacted_text"] and "<PHONE>" in r["redacted_text"]
    assert "example.com" not in r["redacted_text"]
    assert "555" not in r["redacted_text"]


def test_dedup_components_invariants(spark, sf_dir):
    """Component labels are consistent with the pair graph they came from."""
    pairs = dedup.dedup_minhash_lsh(spark, sf_dir).select("id_a", "id_b").collect()
    comp = {r["doc_id"]: r for r in dedup.dedup_components(spark, sf_dir).collect()}
    # every paired doc is labeled; pair endpoints share a component
    for p in pairs:
        assert comp[p["id_a"]]["comp"] == comp[p["id_b"]]["comp"]
    # component id is the min member; exactly one survivor per component
    by_comp: dict[int, list] = {}
    for r in comp.values():
        by_comp.setdefault(r["comp"], []).append(r)
    for cid, members in by_comp.items():
        assert cid == min(m["doc_id"] for m in members)
        assert sum(m["is_survivor"] for m in members) == 1
        assert all(m["comp_size"] == len(members) for m in members)


def test_corpus_ngram_counts_topk(spark, sf_dir):
    rows = textops.corpus_ngram_counts(spark, sf_dir).collect()
    assert 0 < len(rows) <= textops.TOP_NGRAMS
    counts = [r["n_occurrences"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    # total occurrences can't exceed the corpus 2-gram count
    from kafka_exercise_spark.catalog import load_table
    from kafka_exercise_spark.functions.text import shingles_all, tokens
    total = (
        load_table(spark, sf_dir, "documents")
        .select(F.size(shingles_all(tokens(F.col("text")), 2)).alias("n"))
        .agg(F.sum("n"))
        .first()[0]
    )
    assert sum(counts) <= total


def test_tfidf_top_terms_shape(spark, sf_dir):
    rows = textops.tfidf_top_terms(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    n_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    )
    assert len(by_doc) == n_docs
    for members in by_doc.values():
        assert 1 <= len(members) <= textops.TFIDF_TOP_K
        scores = [m["tfidf"] for m in members]
        assert scores == sorted(scores, reverse=True)
        for m in members:
            assert m["tf"] >= 1 and 1 <= m["doc_freq"] <= n_docs


def test_doc_length_histogram_partitions_corpus(spark, sf_dir):
    rows = textops.doc_length_histogram(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == docs
    w = textops.LENGTH_BUCKET_CHARS
    for r in rows:
        assert r["bucket_lo"] == r["bucket"] * w
        assert r["bucket_lo"] <= r["min_chars"] <= r["max_chars"] < r["bucket_lo"] + w


def test_embedding_outliers_fixture_and_planted(spark, sf_dir):
    rows = similarity.embedding_outliers(spark, sf_dir).collect()
    # fixture embeddings are unit-normalized; z is centered
    assert all(abs(r["l2_norm"] - 1.0) < 1e-6 for r in rows)
    assert all(r["is_outlier"] == (abs(r["z"]) > similarity.OUTLIER_Z) for r in rows)
    assert abs(sum(r["z"] for r in rows) / len(rows)) < 0.01
    # planted far-away vector gets flagged
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(49, 4)).astype("float32")
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs = [[float(x) for x in v] for v in base] + [[100.0, 0.0, 0.0, 0.0]]
    df = spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )
    df.write.mode("overwrite").parquet("/tmp/emb_out/embeddings.parquet")
    out = {r["vec_id"]: r for r in
           similarity.embedding_outliers(spark, "/tmp/emb_out").collect()}
    assert out[49]["is_outlier"] and not out[0]["is_outlier"]


def test_dedup_incremental_matches_full_lsh_cross_source(spark, sf_dir):
    """The batch-vs-corpus probe finds exactly the full self-join's
    cross-source pairs — no extras, none missed."""
    inc = dedup.dedup_incremental(spark, sf_dir).collect()
    src = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source").collect()
    }
    for r in inc:
        assert src[r["new_doc_id"]] == dedup.INCREMENTAL_NEW_SOURCE
        assert src[r["old_doc_id"]] != dedup.INCREMENTAL_NEW_SOURCE
        assert r["jaccard"] >= dedup.JACCARD_THRESHOLD
    full = dedup.dedup_minhash_lsh(spark, sf_dir).collect()
    want = {
        frozenset((r["id_a"], r["id_b"]))
        for r in full
        if (src[r["id_a"]] == dedup.INCREMENTAL_NEW_SOURCE)
        != (src[r["id_b"]] == dedup.INCREMENTAL_NEW_SOURCE)
    }
    got = {frozenset((r["new_doc_id"], r["old_doc_id"])) for r in inc}
    assert got == want


def test_pack_sequences_layout_invariants(spark, sf_dir):
    from kafka_exercise_spark.operators import sampling

    rows = sampling.pack_sequences(spark, sf_dir).collect()
    budget = sampling.PACK_BUDGET_TOKENS
    by_shard: dict[int, list] = {}
    for r in rows:
        assert r["shard"] == r["doc_id"] % sampling.PACK_SHARDS
        assert 0 <= r["offset_in_bin"] < budget
        by_shard.setdefault(r["shard"], []).append(r)
    for members in by_shard.values():
        members.sort(key=lambda r: r["doc_id"])
        cum = 0
        prev_bin = 0
        for r in members:
            assert r["seq_bin"] == cum // budget
            assert r["offset_in_bin"] == cum - r["seq_bin"] * budget
            cum += r["n_tok"]
            assert r["cum_tok"] == cum
            assert r["seq_bin"] >= prev_bin
            prev_bin = r["seq_bin"]


def test_embedding_quantize_bounds_and_map_only(spark, sf_dir):
    from kafka_exercise_spark.plans import (
        python_eval_count,
        shuffle_exchange_count,
    )

    df = similarity.embedding_quantize(spark, sf_dir)
    # quantize/dequantize/audit is ONE map-only projection: no shuffle,
    # nothing drops to Python
    assert shuffle_exchange_count(df) == 0
    assert python_eval_count(df) == 0
    rows = df.collect()
    assert rows
    for r in rows:
        # round() error is at most half a quantization step
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-9
        assert r["cos_recon"] > 0.999


def test_token_entropy_bounds_and_extremes(spark, sf_dir):
    """0 <= entropy <= log2(n_unique); entropy_norm in [0, 1]; a repeated
    single token scores 0 (the boilerplate signal the filter exists for)."""
    import math

    from kafka_exercise_spark.operators import textops

    rows = textops.text_token_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["entropy"] <= math.log2(max(r["n_unique"], 2)) + 1e-6
        assert 0.0 <= r["entropy_norm"] <= 1.0 + 1e-9
    # synthetic extremes through the same expression pipeline
    df = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "a b c d")], "doc_id long, text string"
    )
    import kafka_exercise_spark.operators.textops as t
    from unittest import mock

    with mock.patch.object(
        t, "load_table", lambda spark, sf_dir, name: df
    ):
        got = {r["doc_id"]: r for r in t.text_token_entropy(spark, sf_dir).collect()}
    assert got[1]["entropy"] == 0.0 and got[1]["entropy_norm"] == 0.0
    assert abs(got[2]["entropy"] - 2.0) < 1e-6  # 4 equiprobable tokens
    assert abs(got[2]["entropy_norm"] - 1.0) < 1e-6


def test_curation_pipeline_decisions(spark, sf_dir):
    """keep <=> no reject reasons; every reason is from the known set and
    implied by its threshold; plan is map-only (no shuffle, no Python)."""
    from kafka_exercise_spark.operators import textops
    from kafka_exercise_spark.plans import python_eval_count, shuffle_exchange_count

    df = textops.curation_pipeline(spark, sf_dir)
    assert python_eval_count(df) == 0
    # the only exchange is scale_partitions' round-robin small-file spread
    # (a no-op decision at real scale) — no aggregation/join shuffle exists
    assert shuffle_exchange_count(df) <= 1
    rows = df.collect()
    assert rows
    known = {"too_short", "low_quality", "high_punct"}
    for r in rows:
        reasons = set(r["reject_reasons"].split(",")) - {""}
        assert r["keep"] == (not reasons)
        assert reasons <= known
        assert ("too_short" in reasons) == (
            r["n_tokens"] < textops.CURATION_MIN_TOKENS
        )
        assert ("low_quality" in reasons) == (
            r["quality_score"] < textops.CURATION_MIN_QUALITY
        )
        assert ("high_punct" in reasons) == (
            r["punct_ratio"] > textops.CURATION_MAX_PUNCT
        )
    # the fixture should exercise both branches
    kept = sum(1 for r in rows if r["keep"])
    assert 0 < kept < len(rows)


def test_decontaminate_bloom_equals_exact(spark, sf_dir):
    """The Bloom prefilter is a cost optimization, never a semantic one:
    its output must equal the exact (no-bloom) broadcast-join computation
    row for row — false positives die in the verify join, and true hits
    cannot be dropped (the probe positions are derived identically on both
    sides of the bit set)."""
    from kafka_exercise_spark.operators.dedup import (
        BENCHMARK_MAX_DOC_ID,
        DECONTAM_MIN_SHARED,
        _with_hashed_shingles,
        decontaminate_bloom,
    )
    from kafka_exercise_spark.catalog import load_table

    got = {
        r["doc_id"]: r
        for r in decontaminate_bloom(spark, sf_dir).collect()
    }

    docs = _with_hashed_shingles(load_table(spark, sf_dir, "documents"))
    ev = (
        docs.filter(F.col("doc_id") < BENCHMARK_MAX_DOC_ID)
        .select(F.explode("hb").alias("sg"))
        .distinct()
    )
    exact = {
        r["doc_id"]: r
        for r in (
            docs.filter(F.col("doc_id") >= BENCHMARK_MAX_DOC_ID)
            .select(
                "doc_id",
                F.size("hb").cast("bigint").alias("n_shingles"),
                F.explode("hb").alias("sg"),
            )
            .join(ev, "sg")
            .groupBy("doc_id", "n_shingles")
            .agg(F.count("*").alias("n_eval_hits"))
            .collect()
        )
    }
    assert got.keys() == exact.keys() and len(got) > 0
    for k, r in got.items():
        assert r["n_eval_hits"] == exact[k]["n_eval_hits"]
        assert r["n_shingles"] == exact[k]["n_shingles"]
        assert r["contaminated"] == (
            r["n_eval_hits"] >= DECONTAM_MIN_SHARED
        )


def test_multimodal_frame_sample_byte_boundaries(spark, sf_dir):
    """Every sampled frame's offset/length/sha256 must match a Python
    re-slice of the original payload — pins the substr byte arithmetic
    (1-based pos, binary not char offsets) and the stride index set."""
    import hashlib
    import math

    from kafka_exercise_spark.catalog import load_table
    from kafka_exercise_spark.operators.multimodal import (
        FRAME_BYTES,
        SAMPLE_FRAMES,
        multimodal_frame_sample,
    )

    texts = {
        r["doc_id"]: r["text"].encode("utf-8")
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    rows = multimodal_frame_sample(spark, sf_dir).collect()
    assert len(rows) > 0
    seen: dict = {}
    for r in rows:
        payload = texts[r["doc_id"]]
        n_frames = math.ceil(len(payload) / FRAME_BYTES)
        assert r["n_frames"] == n_frames
        sl = payload[r["frame_offset"] : r["frame_offset"] + FRAME_BYTES]
        assert r["frame_bytes"] == len(sl) > 0
        assert r["frame_sha256"] == hashlib.sha256(sl).hexdigest()
        seen.setdefault(r["doc_id"], set()).add(r["frame_idx"])
    for doc_id, idxs in seen.items():
        n = math.ceil(len(texts[doc_id]) / FRAME_BYTES)
        want = {j * n // SAMPLE_FRAMES for j in range(SAMPLE_FRAMES)}
        assert idxs == want and len(idxs) <= SAMPLE_FRAMES


def test_dedup_passages_invariants(spark, sf_dir):
    """Span-cut arithmetic + a hand-check of one covered doc."""
    rows = {r.doc_id: r for r in dedup.dedup_passages(spark, sf_dir).collect()}
    from kafka_exercise_spark.catalog import load_table

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    assert set(rows) == set(docs)
    n = dedup.PASSAGE_N
    any_cut = False
    for doc_id, r in rows.items():
        words = [w for w in docs[doc_id].lower().split() if w]
        assert r.n_words == len(words)
        # cut accounting is exact
        assert r.n_kept_words == r.n_words - r.n_dup_positions
        if r.n_dup_positions:
            any_cut = True
            # a covered span is at least one full passage long
            assert r.n_dup_positions >= n
            assert r.first_dup_pos is not None
            assert 0 <= r.first_dup_pos <= r.n_words - n
        else:
            assert r.first_dup_pos is None
    # the fixture's planted near-dups guarantee cross-doc passages exist
    assert any_cut


def test_dedup_passages_cuts_match_python_recompute(spark, sf_dir):
    """Recompute the duplicated-passage cover in plain Python and compare
    per-doc covered-position counts — the engine-independent ground truth."""
    from collections import Counter, defaultdict

    from kafka_exercise_spark.catalog import load_table

    n = dedup.PASSAGE_N
    docs = {
        r.doc_id: [w for w in r.text.lower().split() if w]
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    counts: Counter[tuple] = Counter()
    for words in docs.values():
        for i in range(len(words) - n + 1):
            counts[tuple(words[i : i + n])] += 1
    covered: defaultdict[int, set] = defaultdict(set)
    for doc_id, words in docs.items():
        for i in range(len(words) - n + 1):
            if counts[tuple(words[i : i + n])] > 1:
                covered[doc_id].update(range(i, i + n))
    for r in dedup.dedup_passages(spark, sf_dir).collect():
        exp = covered.get(r.doc_id, set())
        assert r.n_dup_positions == len(exp), r.doc_id
        assert r.first_dup_pos == (min(exp) if exp else None), r.doc_id


def test_dedup_semantic_pairs_are_true_dups(spark, sf_dir):
    """Every emitted pair is above-threshold by independent numpy recompute,
    pairs are same-cell by construction, and within-cell coverage is exact
    (no above-threshold same-cell pair is missed)."""
    import numpy as np

    pairs = similarity.dedup_semantic(spark, sf_dir).collect()
    assert pairs
    emb = {
        r.vec_id: np.array(r.emb, dtype=np.float64)
        for r in similarity._embeddings_double(spark, sf_dir).collect()
    }
    assigned, _ = similarity._ivf_assign(spark, sf_dir)
    cell_of = {r.vec_id: r.cell for r in assigned.collect()}

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na > 0 and nb > 0 else 0.0

    got = set()
    for r in pairs:
        assert r.id_a < r.id_b
        assert r.drop_id == r.id_b  # keep-lowest survivor rule
        assert cell_of[r.id_a] == cell_of[r.id_b] == r.cell
        # float-boundary tolerance: Spark folds in array order, numpy pairs
        assert cos(emb[r.id_a], emb[r.id_b]) >= similarity.SEMANTIC_DUP_THRESHOLD - 1e-4
        got.add((r.id_a, r.id_b))
    # exhaustive same-cell recompute: nothing above threshold is missed
    from collections import defaultdict

    cells = defaultdict(list)
    for vid, c in cell_of.items():
        cells[c].append(vid)
    for c, vids in cells.items():
        vids.sort()
        for i, va in enumerate(vids):
            for vb in vids[i + 1:]:
                if cos(emb[va], emb[vb]) >= similarity.SEMANTIC_DUP_THRESHOLD + 1e-4:
                    assert (va, vb) in got, (c, va, vb)


def test_dedup_semantic_components_invariants(spark, sf_dir):
    """Groups cover exactly the paired vectors; one survivor per group =
    the component min; pairs never straddle components."""
    rows = dedup.dedup_semantic_components(spark, sf_dir).collect()
    assert rows
    comp_of = {r.vec_id: r.comp for r in rows}
    by_comp: dict = {}
    for r in rows:
        by_comp.setdefault(r.comp, []).append(r)
    for comp, members in by_comp.items():
        ids = [m.vec_id for m in members]
        assert comp == min(ids)
        assert all(m.comp_size == len(ids) for m in members)
        assert sum(m.is_survivor for m in members) == 1
        assert next(m for m in members if m.is_survivor).vec_id == comp
    paired = set()
    for p in similarity.dedup_semantic(spark, sf_dir).collect():
        paired.update((p.id_a, p.id_b))
        assert comp_of[p.id_a] == comp_of[p.id_b]  # an edge never straddles
    assert paired == set(comp_of)


def test_chunk_documents_covers_every_token(spark, sf_dir):
    from kafka_exercise_spark.catalog import load_table
    from kafka_exercise_spark.functions.text import tokens
    from kafka_exercise_spark.plans import python_eval_count, shuffle_exchange_count

    chunks = textops.chunk_documents(spark, sf_dir)
    # map-only fan-out: no Python; the only exchange is scale_partitions'
    # round-robin spread of the single-file fixture (no data shuffle by key)
    assert python_eval_count(chunks) == 0
    assert shuffle_exchange_count(chunks) <= 1
    rows = chunks.collect()
    n_tok_by_doc = {
        r.doc_id: r.n
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(tokens(F.col("text"))).alias("n"))
        .collect()
    }
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    C, S = textops.CHUNK_TOKENS, textops.CHUNK_STRIDE
    for doc_id, cs in per_doc.items():
        n_tok = n_tok_by_doc[doc_id]
        cs.sort(key=lambda r: r.chunk_id)
        # chunk ids contiguous from 0; starts at stride multiples < n_tok
        assert [r.chunk_id for r in cs] == list(range(len(cs)))
        for r in cs:
            assert r.start_tok == r.chunk_id * S < n_tok
            assert r.chunk_tok == min(C, n_tok - r.start_tok)
        # full coverage: last chunk reaches the document end
        last = cs[-1]
        assert last.start_tok + last.chunk_tok == n_tok
    # every doc with tokens is chunked
    assert set(per_doc) == {d for d, n in n_tok_by_doc.items() if n > 0}


def test_corpus_profile_consistency(spark, sf_dir):
    from kafka_exercise_spark.catalog import load_table
    from kafka_exercise_spark.plans import python_eval_count

    profile = textops.corpus_profile(spark, sf_dir)
    assert python_eval_count(profile) == 0
    rows = profile.collect()
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        assert 1 <= r.n_unique <= r.n_docs
        assert 0 <= r.dup_rate_ppm < 1_000_000
        assert r.avg_tokens_c100 == r.total_tokens * 100 // r.n_docs
        assert r.min_chars <= r.max_chars
        assert r.n_langs >= 1


def test_hybrid_search_fuses_both_signals(spark, sf_dir):
    from kafka_exercise_spark.plans import broadcast_join_count, python_eval_count

    hybrid = similarity.hybrid_search_topk(spark, sf_dir)
    assert python_eval_count(hybrid) == 0
    assert broadcast_join_count(hybrid) >= 1
    rows = hybrid.collect()
    assert len(rows) == similarity.N_QUERIES * similarity.TOP_K
    a = similarity.HYBRID_ALPHA
    for r in rows:
        assert -1.0 <= r.cos <= 1.0 and 0.0 <= r.jac <= 1.0
        assert abs(r.score - (a * r.cos + (1 - a) * r.jac)) < 1e-5
    # the lexical signal changes the ranking: hybrid top-k differs from
    # pure-cosine top-k for at least one query
    cosine_hits = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ann_cosine_topk(spark, sf_dir).collect()
    }
    hybrid_hits = {(r.query_id, r.hit_id) for r in rows}
    assert hybrid_hits != cosine_hits


def test_lm_unigram_score_model_properties(spark, sf_dir):
    import math

    from kafka_exercise_spark.catalog import load_table
    from kafka_exercise_spark.functions.text import tokens as _tokens
    from kafka_exercise_spark.plans import broadcast_join_count, python_eval_count

    scored = textops.lm_unigram_score(spark, sf_dir)
    assert python_eval_count(scored) == 0
    assert broadcast_join_count(scored) >= 1  # vocab cost table broadcasts
    rows = scored.collect()
    docs = load_table(spark, sf_dir, "documents")
    n_docs_with_tokens = docs.filter(F.size(_tokens(F.col("text"))) > 0).count()
    assert len(rows) == n_docs_with_tokens
    ces = {}
    for r in rows:
        # smoothed model: every cost positive, bounded by ln(N+V)
        assert 0.0 < r.cross_entropy_nats < 20.0
        assert abs(r.perplexity - round(math.exp(r.cross_entropy_nats), 1)) < max(
            0.2, r.perplexity * 1e-3
        )
        ces[r.doc_id] = r.cross_entropy_nats
    # the model discriminates: corpus docs don't all score the same
    assert max(ces.values()) - min(ces.values()) > 0.1


def test_embed_feature_hashing_sparse_vectors(spark, sf_dir):
    from kafka_exercise_spark.catalog import load_table
    from kafka_exercise_spark.functions.text import tokens as _tokens
    from kafka_exercise_spark.plans import python_eval_count

    emb = textops.embed_feature_hashing(spark, sf_dir)
    assert python_eval_count(emb) == 0
    rows = emb.collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        assert 0 <= r.bucket < textops.FEATURE_HASH_DIM
        assert r.cnt >= 1
        per_doc.setdefault(r.doc_id, []).append(r)
    docs = load_table(spark, sf_dir, "documents")
    tok_counts = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(_tokens(F.col("text"))).alias("n")
        ).collect()
    }
    for doc_id, vec in per_doc.items():
        # sparse vector accounts for every token exactly once
        assert sum(r.cnt for r in vec) == tok_counts[doc_id]
        # one consistent squared norm per doc, equal to sum cnt^2
        ss = {r.ss for r in vec}
        assert ss == {sum(r.cnt * r.cnt for r in vec)}
        # genuinely sparse: fewer buckets than tokens for real docs
        assert len(vec) <= min(textops.FEATURE_HASH_DIM, tok_counts[doc_id])
    # deterministic across reruns
    again = textops.embed_feature_hashing(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_sparse_ann_topk_posting_list_retrieval(spark, sf_dir):
    from kafka_exercise_spark.plans import broadcast_join_count, python_eval_count

    res = similarity.sparse_ann_topk(spark, sf_dir)
    assert python_eval_count(res) == 0
    assert broadcast_join_count(res) >= 1  # query posting lists broadcast
    rows = res.collect()
    assert len(rows) == similarity.N_QUERIES * similarity.TOP_K
    by_q: dict[int, list] = {}
    for r in rows:
        assert r.dot >= 1  # candidates share at least one bucket
        assert 0.0 < r.cos2 <= 1.0 + 1e-12
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.cos2 for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(r.hit_id != q for r in rs)


# ---- r04 additions: rules / tokenizer / classifier / sketch / retrieval ----


def test_gopher_filter_signals_are_exact_and_consistent(spark, sf_dir):
    from kafka_exercise_spark.plans import python_eval_count, shuffle_exchange_count

    df = textops.gopher_quality_filter(spark, sf_dir)
    assert python_eval_count(df) == 0
    # map-only rule battery — the single exchange is scale_partitions'
    # deliberate small-input repartition, not a data shuffle
    assert shuffle_exchange_count(df) <= 1
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        if r.keep:
            assert r.reject_reasons == ""
            assert textops.GOPHER_MIN_WORDS <= r.n_words <= textops.GOPHER_MAX_WORDS
            assert (
                textops.GOPHER_MIN_MEAN_WORD_C100
                <= r.mean_word_c100
                <= textops.GOPHER_MAX_MEAN_WORD_C100
            )
            assert r.alpha_ppm >= textops.GOPHER_MIN_ALPHA_PPM
            assert r.symbol_ppm <= textops.GOPHER_MAX_SYMBOL_PPM
            assert r.n_stop_distinct >= textops.GOPHER_MIN_STOPWORDS
        else:
            assert r.reject_reasons != ""


def test_bpe_pair_counts_match_python_recount(spark, sf_dir):
    from collections import Counter

    from kafka_exercise_spark.catalog import load_table

    got = {r.pair: r.cnt for r in textops.bpe_pair_counts(spark, sf_dir).collect()}
    want: Counter = Counter()
    for (text,) in load_table(spark, sf_dir, "documents").select("text").collect():
        for w in text.lower().split():
            if len(w) >= 2:
                for i in range(len(w) - 1):
                    want[w[i : i + 2]] += 1
    assert got == dict(want)
    # merge_rank is a total order: rank 1 is the global argmax pair
    top = textops.bpe_pair_counts(spark, sf_dir).filter("merge_rank = 1").collect()[0]
    assert top.cnt == max(want.values())


def test_classifier_logit_is_exact_integer_dot(spark, sf_dir):
    import hashlib

    from kafka_exercise_spark.catalog import load_table
    from kafka_exercise_spark.plans import python_eval_count

    df = textops.classifier_quality_score(spark, sf_dir)
    assert python_eval_count(df) == 0
    got = {r.doc_id: (r.n_tokens, r.logit, r.keep) for r in df.collect()}
    weights = textops.classifier_weights()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    for doc_id, text in docs[:25]:
        toks = [t for t in text.lower().split() if t]
        if not toks:
            assert doc_id not in got  # no buckets → no row
            continue
        logit = 0
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            logit += weights[h % textops.FEATURE_HASH_DIM]
        assert got[doc_id] == (len(toks), logit, logit > 0)


def test_heavy_hitters_exact_regardless_of_sketch(spark, sf_dir):
    from collections import Counter

    from kafka_exercise_spark.catalog import load_table

    got = {r.token: r.cnt for r in textops.heavy_hitters_topk(spark, sf_dir).collect()}
    exact: Counter = Counter()
    for (text,) in load_table(spark, sf_dir, "documents").select("text").collect():
        exact.update(t for t in text.lower().split() if t)
    n = sum(exact.values())
    want = {t: c for t, c in exact.items() if c * (textops.HH_K + 1) > n}
    # the MG candidate set provably contains every true heavy hitter and
    # the exact recount kills false positives — output == exact threshold set
    assert got == want
    assert len(got) > 0


def test_decontaminate_semantic_pairs_are_true_hits(spark, sf_dir):
    import numpy as np

    from kafka_exercise_spark.catalog import load_table

    pairs = similarity.decontaminate_semantic(spark, sf_dir).collect()
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    thr = similarity.SEMANTIC_DECONTAM_COS_E6 / 1e6
    for r in pairs:
        assert r.eval_id < similarity.SEMANTIC_DECONTAM_MAX_EVAL_ID
        assert r.vec_id >= similarity.SEMANTIC_DECONTAM_MAX_EVAL_ID
        a, b = emb[r.vec_id], emb[r.eval_id]
        true_cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        # quantization at 2^-20 distorts cosine well below 1e-4
        assert abs(true_cos - r.cos) < 1e-4
        assert r.cos >= thr


def test_bm25_ranks_shared_term_docs(spark, sf_dir):
    from kafka_exercise_spark.plans import python_eval_count

    df = similarity.bm25_topk(spark, sf_dir)
    assert python_eval_count(df) == 0
    rows = df.collect()
    assert rows
    by_q: dict = {}
    for r in rows:
        assert r.hit_id != r.query_id
        assert r.score_micro > 0
        by_q.setdefault(r.query_id, []).append(r)
    for q, hits in by_q.items():
        ranks = sorted(h.rank for h in hits)
        assert ranks == list(range(1, len(hits) + 1))
        scores = [h.score_micro for h in sorted(hits, key=lambda h: h.rank)]
        assert scores == sorted(scores, reverse=True)


def test_pq_encode_codes_and_error_match_codebooks(spark, sf_dir):
    import numpy as np

    from kafka_exercise_spark.catalog import load_table

    out = {r.vec_id: r for r in similarity.pq_encode(spark, sf_dir).collect()}
    books = similarity._PQ_CODEBOOKS[
        (spark.sparkContext.applicationId, sf_dir)
    ]
    emb = load_table(spark, sf_dir, "embeddings").limit(30).collect()
    for row in emb:
        ei = [
            int(np.floor(abs(x) * similarity.PROJ_SCALE + 0.5)) * (1 if x >= 0 else -1)
            for x in np.array(row.embedding, dtype=np.float64)
        ]
        r = out[row.vec_id]
        err_total = 0
        for m, book in enumerate(books):
            sl = ei[m * similarity.PQ_SUBDIM : (m + 1) * similarity.PQ_SUBDIM]
            d2s = [
                sum((a - b) * (a - b) for a, b in zip(sl, c)) for c in book
            ]
            best = min(range(len(d2s)), key=lambda i: (d2s[i], i))
            assert getattr(r, f"code{m}") == best
            err_total += d2s[best]
        assert r.err_q == err_total
        assert all(0 <= getattr(r, f"code{m}") < similarity.PQ_K for m in range(4))


def test_ivf_cells_report_partitions_corpus(spark, sf_dir):
    from kafka_exercise_spark.catalog import load_table

    rows = similarity.ivf_cells_report(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == total
    assert len(rows) <= similarity.N_IVF_CELLS
    for r in rows:
        assert 0 <= r.cell < similarity.N_IVF_CELLS
        assert r.share_ppm == r.n_vectors * 1_000_000 // total
        assert r.min_vec_id <= r.max_vec_id


def test_ann_ivf_pq_adc_matches_codebook_math(spark, sf_dir):
    import numpy as np

    rows = similarity.ann_ivf_pq_topk(spark, sf_dir).collect()
    assert rows
    books = similarity._PQ_CODEBOOKS[
        (spark.sparkContext.applicationId, sf_dir)
    ]
    codes = {
        r.vec_id: (r.code0, r.code1, r.code2, r.code3)
        for r in similarity.pq_encode(spark, sf_dir).collect()
    }
    assigned, _ = similarity._ivf_assign(spark, sf_dir)
    q_ei = {
        r.vec_id: list(r.ei)
        for r in assigned.filter("vec_id < 5").select("vec_id", "ei").collect()
    }
    by_q: dict = {}
    for r in rows:
        assert r.neighbor_id != r.query_id
        by_q.setdefault(r.query_id, []).append(r)
        # ADC = sum over subspaces of d²(query slice, coded sub-centroid)
        want = 0
        for m in range(similarity.PQ_M):
            sl = q_ei[r.query_id][
                m * similarity.PQ_SUBDIM : (m + 1) * similarity.PQ_SUBDIM
            ]
            c = books[m][codes[r.neighbor_id][m]]
            want += sum((a - b) * (a - b) for a, b in zip(sl, c))
        assert r.adc == want
    for q, hits in by_q.items():
        hits.sort(key=lambda h: h.rank)
        assert [h.rank for h in hits] == list(range(1, len(hits) + 1))
        adcs = [h.adc for h in hits]
        assert adcs == sorted(adcs)  # ascending distance


def test_contamination_report_counts_are_consistent(spark, sf_dir):
    from kafka_exercise_spark.catalog import load_table

    rows = dedup.contamination_report(spark, sf_dir).collect()
    corpus_n = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") >= dedup.BENCHMARK_MAX_DOC_ID)
        .count()
    )
    assert sum(r.n_docs for r in rows) == corpus_n
    for r in rows:
        assert max(r.n_ngram_flagged, r.n_sem_flagged) <= r.n_any_flagged
        assert r.n_any_flagged <= r.n_ngram_flagged + r.n_sem_flagged
        assert r.n_any_flagged <= r.n_docs
        assert r.ngram_ppm == r.n_ngram_flagged * 1_000_000 // r.n_docs
        assert r.any_ppm == r.n_any_flagged * 1_000_000 // r.n_docs


def test_curation_funnel_partitions_and_orders_stages(spark, sf_dir):
    """First-reason-wins: stage counts must sum exactly to n_in per
    source, and each stage total must agree with the standalone operator
    it composes (curation keep, LSH drop list, decontam flags)."""
    rows = textops.curation_funnel_report(spark, sf_dir).collect()
    for r in rows:
        assert (
            r.n_drop_curation + r.n_drop_near_dup + r.n_drop_decontam + r.n_kept
            == r.n_in
        )
        assert r.kept_ppm == r.n_kept * 1_000_000 // r.n_in
        assert (r.kept_tokens > 0) == (r.n_kept > 0) or r.kept_tokens == 0
    # cross-check the curation stage against the standalone decision
    from kafka_exercise_spark.catalog import load_table

    corpus_ids = {
        row.doc_id
        for row in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") >= dedup.BENCHMARK_MAX_DOC_ID)
        .select("doc_id")
        .collect()
    }
    dropped_cur = {
        row.doc_id
        for row in textops.curation_pipeline(spark, sf_dir)
        .filter(~F.col("keep"))
        .collect()
        if row.doc_id in corpus_ids
    }
    assert sum(r.n_drop_curation for r in rows) == len(dropped_cur)


def test_power_iteration_matches_numpy_top_eigenvector(spark, sf_dir):
    """The integer power iteration must (a) be bit-deterministic, (b)
    track the SAME-iteration-count float reference to |cos| > 0.9999 —
    the quantization adds no visible drift — and (c) reach >90% of the
    true top eigenvalue in Rayleigh quotient. (Full eigenvector
    convergence is not claimable on this fixture: its spectrum is nearly
    flat, so ANY power method converges slowly — the float reference
    after the same rounds is the honest yardstick.)"""
    import numpy as np

    from kafka_exercise_spark.catalog import load_table
    from kafka_exercise_spark.operators.similarity import (
        PI_ITERS,
        embedding_top_component,
    )

    r1 = embedding_top_component(spark, sf_dir).collect()
    r2 = embedding_top_component(spark, sf_dir).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))
    v = np.array([r.v_q for r in sorted(r1, key=lambda r: r.j)], dtype=float)

    A = np.array(
        [
            row.embedding
            for row in load_table(spark, sf_dir, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=float,
    )
    gram = A.T @ A
    vf = np.ones(64)
    for _ in range(PI_ITERS):
        vf = gram @ vf
        vf = vf / np.abs(vf).max()
    cos = abs(v @ vf) / (np.linalg.norm(v) * np.linalg.norm(vf))
    assert cos > 0.9999, cos
    lam1 = np.linalg.eigvalsh(gram)[-1]
    rq = (v @ gram @ v) / (v @ v)
    assert rq > 0.9 * lam1, (rq, lam1)


def test_anisotropy_report_bounds_and_signal(spark, sf_dir):
    """cos² shares live in [0, 1e6] ppm, every label is represented, and
    the corpus-average share along the FITTED dominant direction beats
    the isotropic baseline 1/64 — otherwise the component fit found
    nothing."""
    from kafka_exercise_spark.operators.similarity import (
        EMBED_DIM,
        embedding_anisotropy,
    )

    rows = embedding_anisotropy(spark, sf_dir).collect()
    assert len(rows) >= 2
    for r in rows:
        assert 0 <= r.avg_cos2_ppm <= r.max_cos2_ppm <= 1_000_000
    total = sum(r.n_vecs for r in rows)
    weighted = sum(r.avg_cos2_ppm * r.n_vecs for r in rows) / total
    assert weighted > 1_000_000 / EMBED_DIM, weighted


def test_bpe_segmentation_exact_on_hand_corpus(spark):
    """'aaaa bbbb': merges rank (aa, bb). The documented single-pass
    semantics merge the leftmost pair then resume AFTER it (consumed
    boundary blocks the adjacent match): ' a a a a ' → ' aa a a ', so 8
    base symbols → 6, not full-BPE's 4 — the approximation the docstring
    declares, pinned here so a semantics change is visible."""
    from kafka_exercise_spark.operators import textops as t

    df = spark.createDataFrame([(0, "aaaa bbbb")], "doc_id long, text string")
    orig = t.load_table
    try:
        t.load_table = lambda s, d, n: df
        # unique placeholder dir per hand frame: the merge-table memo is
        # keyed on (app, sf_dir) — see catalog.memo_frame's contract
        (r,) = t.bpe_segment_words(spark, "hand-bpe-1").collect()
    finally:
        t.load_table = orig
    assert (r.n_words, r.base_symbols, r.merged_symbols) == (2, 8, 6)
    assert r.compression_ppm == 750_000
    # a non-adjacent repeat merges at every site: 'abcab' has top merge
    # 'ab' (2 occurrences, non-overlapping boundaries) -> 3 symbols
    df2 = spark.createDataFrame([(0, "abcab")], "doc_id long, text string")
    try:
        t.load_table = lambda s, d, n: df2
        (r2,) = t.bpe_segment_words(spark, "hand-bpe-2").collect()
    finally:
        t.load_table = orig
    assert (r2.base_symbols, r2.merged_symbols) == (5, 3)


def test_threshold_sweep_monotone_and_consistent(spark, sf_dir):
    """Tighter thresholds can only shrink both statistics, counts are
    consistent (n_docs <= 2*n_pairs), and exactly the rungs with ≥1
    qualifying pair report (at sf0.001: all but the 450k rung — the
    fixture's within-label pairs top out below it; pinned exactly so an
    off-by-one in the threshold filter can't silently drop rungs)."""
    from kafka_exercise_spark.operators.dedup import (
        SWEEP_THRESHOLDS_E6,
        dedup_threshold_sweep,
    )

    rows = {r.threshold_e6: r for r in
            dedup_threshold_sweep(spark, sf_dir).collect()}
    assert set(rows) == set(SWEEP_THRESHOLDS_E6) - {450_000}
    last_pairs, last_docs = 0, 0
    for t in sorted(rows, reverse=True):  # tight -> loose
        r = rows[t]
        assert r.n_pairs >= last_pairs and r.n_docs >= last_docs
        assert 2 <= r.n_docs <= 2 * r.n_pairs
        last_pairs, last_docs = r.n_pairs, r.n_docs
    # the loosest rung's exact counts, pinned (deterministic fixture)
    assert rows[200_000].n_pairs == 657 and rows[200_000].n_docs == 459


def test_ann_recall_report_matches_direct_overlap(spark, sf_dir):
    """The recall report must equal the overlap computed independently in
    Python from the variants' own outputs, cover the full (method ×
    query) grid, and respect the pinned dominance: multiprobe recall ≥
    single-probe recall per query."""
    exact: dict = {}
    for r in similarity.ann_cosine_topk(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    variants = {
        "ivf": similarity.ann_ivf_topk,
        "ivf_pq": similarity.ann_ivf_pq_topk,
        "lsh_bucketed": similarity.ann_lsh_bucketed,
        "lsh_multiprobe": similarity.ann_lsh_multiprobe,
    }
    want: dict = {}
    for name, fn in variants.items():
        got: dict = {}
        for r in fn(spark, sf_dir).collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        for q, ex in exact.items():
            want[(name, q)] = len(got.get(q, set()) & ex)

    rows = similarity.ann_recall_report(spark, sf_dir).collect()
    assert len(rows) == len(variants) * len(exact)  # full grid, no drops
    for r in rows:
        assert r.n_matched == want[(r.method, r.query_id)]
        assert r.recall_ppm == r.n_matched * 1_000_000 // similarity.TOP_K
        assert 0 <= r.recall_ppm <= 1_000_000
    by = {(r.method, r.query_id): r.recall_ppm for r in rows}
    for q in exact:
        assert by[("lsh_multiprobe", q)] >= by[("lsh_bucketed", q)]


def test_ann_index_refresh_conserves_counts_and_shares(spark, sf_dir):
    """The refresh audit must partition the corpus exactly (Σ n_after =
    corpus size, n_before + n_added per cell), agree with the served
    assignment frame, and emit shares that sum to ~10⁶ (within the
    cells × 1 ppm truncation bound)."""
    from kafka_exercise_spark.catalog import load_table

    rows = similarity.ann_index_refresh(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_after for r in rows) == total
    for r in rows:
        assert r.n_after == r.n_before + r.n_added
        assert r.drift_ppm == r.share_after_ppm - r.share_before_ppm
    for field in ("share_before_ppm", "share_after_ppm"):
        tot = sum(getattr(r, field) for r in rows)
        assert 1_000_000 - len(rows) <= tot <= 1_000_000
    # cross-check the incoming split against the assignment frame itself
    assigned, _ = similarity._ivf_assign(spark, sf_dir)
    import hashlib

    def is_new(vid: int) -> bool:
        h = int(hashlib.md5(f"refresh:{vid}".encode()).hexdigest()[:15], 16)
        return h % similarity.REFRESH_BUCKETS == 0
    want: dict = {}
    for r in assigned.select("vec_id", "cell").collect():
        b, a = want.setdefault(r.cell, [0, 0])
        if is_new(r.vec_id):
            want[r.cell][1] = a + 1
        else:
            want[r.cell][0] = b + 1
    got = {r.cell: (r.n_before, r.n_added) for r in rows}
    assert got == {c: tuple(v) for c, v in want.items()}


def test_cluster_canonicals_pick_largest_clean_copy(spark, sf_dir):
    """Exactly one canonical per cluster; the canonical dominates every
    other member under (clean desc, n_words desc, doc_id asc); membership
    and sizes agree with dedup_components."""
    from kafka_exercise_spark.operators import dedup

    rows = dedup.dedup_cluster_canonicals(spark, sf_dir).collect()
    comps = {r.doc_id: r for r in dedup.dedup_components(spark, sf_dir).collect()}
    assert {r.doc_id for r in rows} == set(comps)
    by_comp: dict = {}
    for r in rows:
        assert r.comp == comps[r.doc_id].comp
        assert r.comp_size == comps[r.doc_id].comp_size
        assert (r.action == "keep") == r.is_canonical
        by_comp.setdefault(r.comp, []).append(r)
    for members in by_comp.values():
        canon = [r for r in members if r.is_canonical]
        assert len(canon) == 1
        key = lambda r: (not r.clean, -r.n_words, r.doc_id)  # noqa: E731
        assert min(members, key=key).doc_id == canon[0].doc_id


def test_span_corruption_plan_is_deterministic_and_consistent(spark, sf_dir):
    """The masking plan must be a pure function of (doc_id, position):
    two runs agree exactly; counts are internally consistent (sentinels ≤
    spans, masked ≥ spans when spans > 0, masked ≤ min(n_tokens,
    spans·SPAN_MAX)); and a Python replay of one doc's hash rule matches."""
    import hashlib

    from kafka_exercise_spark.operators import textops

    rows = {r.doc_id: r for r in
            textops.span_corruption_masks(spark, sf_dir).collect()}
    again = {r.doc_id: r for r in
             textops.span_corruption_masks(spark, sf_dir).collect()}
    assert rows.keys() == again.keys()
    for d, r in rows.items():
        assert tuple(r) == tuple(again[d])
        assert 0 <= r.n_sentinels <= r.n_spans
        if r.n_spans > 0:
            assert r.n_masked >= 1
        assert r.n_masked <= min(r.n_tokens, r.n_spans * textops.SPAN_MAX)
        if r.n_tokens:
            assert r.masked_ppm == r.n_masked * 1_000_000 // r.n_tokens

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    some = max(rows, key=lambda d: rows[d].n_spans)
    n = rows[some].n_tokens
    starts = [i for i in range(1, n + 1)
              if h(f"span:{some}:{i}") % textops.SPAN_EVERY == 0]
    masked = set()
    for i in starts:
        for k in range(h(f"len:{some}:{i}") % textops.SPAN_MAX + 1):
            if i + k <= n:
                masked.add(i + k)
    runs = sum(1 for i in sorted(masked) if i - 1 not in masked)
    assert rows[some].n_spans == len(starts)
    assert rows[some].n_masked == len(masked)
    assert rows[some].n_sentinels == runs


def test_fertility_report_aggregates_then_divides(spark, sf_dir):
    """Fertility must be the corpus-level ratio (Σ subwords over Σ words
    per language), every doc counted exactly once across languages."""
    from kafka_exercise_spark.operators import textops

    rows = textops.tokenizer_fertility_report(spark, sf_dir).collect()
    stats = {r.doc_id: r for r in
             textops.text_token_stats(spark, sf_dir).collect()}
    langs = {r.doc_id: r.detected_lang for r in
             textops.text_langid(spark, sf_dir).collect()}
    assert sum(r.n_docs for r in rows) == len(stats)
    for r in rows:
        docs = [d for d, lg in langs.items() if lg == r.detected_lang]
        words = sum(stats[d].n_ws_tokens for d in docs)
        sub = sum(stats[d].n_bpe_tokens for d in docs)
        assert r.total_words == words and r.total_subwords == sub
        if words:
            assert r.fertility_c100 == sub * 100 // words


def test_calibration_report_counts_and_bands(spark, sf_dir):
    """Bands must partition the corpus (Σ n_docs = |docs|), counts must
    replay from the two source ops, and the floor banding must place
    every doc's logit inside [band·W, (band+1)·W)."""
    from kafka_exercise_spark.operators import textops

    rows = textops.classifier_calibration_report(spark, sf_dir).collect()
    cls = {r.doc_id: r for r in
           textops.classifier_quality_score(spark, sf_dir).collect()}
    gop = {r.doc_id: r.keep for r in
           textops.gopher_quality_filter(spark, sf_dir).collect()}
    assert sum(r.n_docs for r in rows) == len(cls)
    W = textops.CLS_CALIB_BAND
    want: dict = {}
    for d, c in cls.items():
        band = c.logit // W  # python floor div == the pmod fold
        n, ck, gk, ag = want.setdefault(band, [0, 0, 0, 0])
        want[band] = [n + 1, ck + bool(c.keep), gk + bool(gop[d]),
                      ag + (bool(c.keep) == bool(gop[d]))]
    got = {r.band: [r.n_docs, r.n_cls_keep, r.n_gopher_keep, r.n_agree]
           for r in rows}
    assert got == want
    for r in rows:
        assert r.gopher_keep_ppm == r.n_gopher_keep * 1_000_000 // r.n_docs
        assert r.agree_ppm == r.n_agree * 1_000_000 // r.n_docs


def test_source_matrix_replays_from_pairs(spark, sf_dir):
    """The matrix must replay exactly from the pair frame + the doc→source
    map: unordered source canonicalization, pair counts, distinct docs."""
    from kafka_exercise_spark.catalog import load_table
    from kafka_exercise_spark.operators import dedup

    src = {r.doc_id: r.source for r in
           load_table(spark, sf_dir, "documents").select("doc_id", "source").collect()}
    want: dict = {}
    for r in dedup.dedup_minhash_lsh(spark, sf_dir).collect():
        a, b = sorted((src[r.id_a], src[r.id_b]))
        cell = want.setdefault((a, b), [0, set()])
        cell[0] += 1
        cell[1] |= {r.id_a, r.id_b}
    rows = dedup.dedup_source_matrix(spark, sf_dir).collect()
    got = {(r.source_a, r.source_b): (r.n_pairs, r.n_docs) for r in rows}
    assert got == {k: (n, len(d)) for k, (n, d) in want.items()}
    for r in rows:
        assert r.source_a <= r.source_b  # canonical unordered cells


def test_pack_efficiency_balance_and_fill(spark, sf_dir):
    """Per-shard totals must replay from pack_sequences; fill ≤ 1e6 only
    when the last bin underfills; skew is ppm of the mean shard."""
    from kafka_exercise_spark.operators import sampling

    packed = sampling.pack_sequences(spark, sf_dir).collect()
    want: dict = {}
    for r in packed:
        st = want.setdefault(r.shard, [0, 0, 0])
        st[0] += 1
        st[1] = max(st[1], r.cum_tok)
        st[2] = max(st[2], r.seq_bin + 1)
    rows = sampling.pack_efficiency_report(spark, sf_dir).collect()
    corpus = sum(v[1] for v in want.values())
    assert {r.shard: [r.n_docs, r.total_tokens, r.n_bins] for r in rows} == want
    for r in rows:
        cap = r.n_bins * sampling.PACK_BUDGET_TOKENS
        assert r.fill_ppm == r.total_tokens * 1_000_000 // cap
        assert r.skew_ppm == r.total_tokens * len(want) * 1_000_000 // corpus


def test_s_curve_theory_shape_and_measured_counts(spark, sf_dir):
    """The analytic curve must be monotone increasing 0→1e6 over the
    grid with the half-point near s = (1/b)^(1/r); measured band counts
    must sum to the verified pair count."""
    from kafka_exercise_spark.operators import dedup

    rows = sorted(dedup.minhash_s_curve(spark, sf_dir).collect(),
                  key=lambda r: r.s_centi)
    assert [r.s_centi for r in rows] == list(range(5, 100, 5))
    ps = [r.p_collision_ppm for r in rows]
    assert ps == sorted(ps) and 0 <= ps[0] and ps[-1] <= 1_000_000
    n_pairs = dedup.dedup_minhash_lsh(spark, sf_dir).count()
    assert sum(r.n_pairs_in_band for r in rows) == n_pairs


def test_winnowing_guarantee_and_overlap_bounds(spark, sf_dir):
    """Winnowing contract checks: (a) a pair of docs known to be exact
    duplicates (from the exact-dedup groups) must surface with full
    containment — the published guarantee says any shared substring of
    length >= k + w - 1 yields a common selected fingerprint, and an
    exact copy shares everything; (b) every emitted row respects the
    emit floors and ppm is the exact integer division."""
    from kafka_exercise_spark.operators import dedup

    rows = dedup.winnowing_overlap_pairs(spark, sf_dir).collect()
    assert rows, "fixture plants near-dups; winnowing must surface some"
    for r in rows:
        assert r.id_a < r.id_b
        assert r.n_shared >= dedup.WINNOW_MIN_SHARED
        assert dedup.WINNOW_MIN_PPM <= r.overlap_ppm <= 1_000_000
    # exact-duplicate pairs (same canonical fingerprint, both docs long
    # enough to carry >= MIN_SHARED selected fingerprints) must be found
    # with 100% containment of the smaller selected set
    from kafka_exercise_spark.catalog import load_table
    from kafka_exercise_spark.functions.text import normalized_text
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", normalized_text(F.col("text")).alias("canon")
    )
    dup_pair = (
        docs.alias("x")
        .join(
            docs.alias("y"),
            (F.col("x.canon") == F.col("y.canon"))
            & (F.col("x.doc_id") < F.col("y.doc_id"))
            & (F.length("x.canon") >= 200),
        )
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .first()
    )
    if dup_pair is not None:
        found = {(r.id_a, r.id_b): r for r in rows}
        r = found.get((dup_pair.a, dup_pair.b))
        assert r is not None and r.overlap_ppm == 1_000_000


def test_knn_label_vote_known_clusters(spark):
    """Hand-built geometry: each query sits in its own far-apart cluster
    of 7 same-label + 5 decoy-label pool vectors, so top-10 = 7 + 3 and
    the majority answer is forced. Checks neighbor cut, vote count, and
    correctness flag against construction."""
    from kafka_exercise_spark.operators import similarity as sim

    rows = []
    vid = sim.N_QUERIES
    for q in range(sim.N_QUERIES):
        base = float(q * 30)  # clusters far apart, inside the 2^48 fixed-point bound
        rows.append((q, [base, 0.0], q))  # the query itself (held out)
        for i in range(7):  # same-label cluster members, nearest
            rows.append((vid, [base + 0.001 * (i + 1), 0.0], q)); vid += 1
        for i in range(5):  # decoy labels, slightly farther
            rows.append((vid, [base + 0.01 * (i + 1), 0.0], q + 5)); vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    orig = sim.load_table
    sim.load_table = lambda s, d, n: df
    try:
        out = {r.query_id: r for r in sim.knn_label_vote(spark, "knn-hand").collect()}
    finally:
        sim.load_table = orig
    assert set(out) == set(range(sim.N_QUERIES))
    for q, r in out.items():
        assert r.predicted_label == q
        assert r.n_votes == 7
        assert r.true_label == q and bool(r.correct)


def test_knn_label_vote_tie_breaks_to_smaller_label(spark):
    """5-5 vote tie must resolve to the smaller label (the documented
    (votes desc, label asc) total order)."""
    from kafka_exercise_spark.operators import similarity as sim

    rows = [(q, [float(q * 30), 0.0], 0) for q in range(sim.N_QUERIES)]
    vid = sim.N_QUERIES
    for q in range(sim.N_QUERIES):
        base = float(q * 30)
        for i in range(5):
            rows.append((vid, [base + 0.001 * (i + 1), 0.0], 9)); vid += 1
        for i in range(5):
            rows.append((vid, [base + 0.002 * (i + 1), 1.0], 2)); vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    orig = sim.load_table
    sim.load_table = lambda s, d, n: df
    try:
        out = sim.knn_label_vote(spark, "knn-tie").collect()
    finally:
        sim.load_table = orig
    for r in out:
        assert r.n_votes == 5 and r.predicted_label == 2


def test_split_leakage_report_against_python_recount(spark, sf_dir):
    """Independent recount: split assignment re-derived in pure Python
    (hashlib md5, not the Spark expression), near-dup leak recomputed from
    the verified pair table, totals = the 80/10/10 census."""
    import hashlib

    from kafka_exercise_spark.operators import dedup

    def split_of(doc_id: int) -> str:
        b = int(hashlib.md5(f"split:{doc_id}".encode()).hexdigest()[:15], 16) % 100
        return "train" if b < 80 else ("valid" if b < 90 else "test")

    report = {r.split: r for r in dedup.split_leakage_report(spark, sf_dir).collect()}
    assert set(report) == {"valid", "test"}

    from kafka_exercise_spark.catalog import load_table

    ids = [r.doc_id for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()]
    totals = {"valid": 0, "test": 0}
    for i in ids:
        s = split_of(i)
        if s != "train":
            totals[s] += 1
    leak = {"valid": set(), "test": set()}
    for p in dedup.dedup_minhash_lsh(spark, sf_dir).collect():
        sa, sb = split_of(p.id_a), split_of(p.id_b)
        if sa == "train" and sb != "train":
            leak[sb].add(p.id_b)
        if sb == "train" and sa != "train":
            leak[sa].add(p.id_a)
    for s in ("valid", "test"):
        r = report[s]
        assert r.n_docs == totals[s]
        assert r.n_neardup_leak == len(leak[s])
        assert r.n_exact_leak == 0  # fixture texts are all unique
        assert r.neardup_ppm == (r.n_neardup_leak * 1_000_000) // r.n_docs
        assert r.winnow_ppm == (r.n_winnow_leak * 1_000_000) // r.n_docs
        assert 0 <= r.n_winnow_leak <= r.n_docs
    # the fixture plants near-dups, and ~20% of split pairs cross
    # train↔eval in expectation — require the detector to surface some
    assert sum(r.n_neardup_leak for r in report.values()) > 0
    assert sum(r.n_winnow_leak for r in report.values()) > 0




def _python_bpe_fit(freqs, rounds):
    """Reference BPE fit shared by both BPE tests: returns (merge_table,
    final_segs). str.replace shares the engines' left-to-right
    non-overlapping single-pass semantics."""
    segs = {w: " ".join(w) for w in freqs}
    table = []
    for rnd in range(1, rounds + 1):
        cnt: dict = {}
        for w, f in freqs.items():
            sy = segs[w].split(" ")
            for i in range(len(sy) - 1):
                pp = sy[i] + " " + sy[i + 1]
                cnt[pp] = cnt.get(pp, 0) + f
        if not cnt:
            break
        pair = min(cnt, key=lambda p: (-cnt[p], p))
        merged = pair.replace(" ", "")
        table.append((rnd, pair, merged, cnt[pair]))
        for w in segs:
            segs[w] = (
                (" " + segs[w] + " ").replace(f" {pair} ", f" {merged} ").strip()
            )
    return table, segs


def test_bpe_train_merges_matches_pure_python_replay(spark, sf_dir):
    """Independent fit replay: collect the word-frequency table once, then
    run the identical algorithm in pure Python (str.replace shares the
    engines' left-to-right non-overlapping single-pass semantics) and
    compare the full merge table. Also pins the property the one-pass
    ranking cannot produce: a later round merges a pair CONTAINING an
    earlier round's output symbol."""
    from pyspark.sql import functions as F

    from kafka_exercise_spark.catalog import load_table
    from kafka_exercise_spark.functions.text import tokens
    from kafka_exercise_spark.operators import textops

    freqs = {
        r.word: r.freq
        for r in load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .collect()
    }
    expected, _ = _python_bpe_fit(freqs, textops.BPE_TRAIN_ROUNDS)
    got = [
        (r.round, r.pair, r.merged, r.freq)
        for r in textops.bpe_train_merges(spark, sf_dir)
        .orderBy("round")
        .collect()
    ]
    assert got == expected
    # merge table sanity: rounds 1..R, all-distinct pairs, positive counts
    assert [r for r, *_ in got] == list(range(1, textops.BPE_TRAIN_ROUNDS + 1))
    assert len({p for _, p, _, _ in got}) == len(got)
    assert all(f > 0 for *_, f in got)


def test_detector_matrix_is_exact_union_histogram(spark, sf_dir):
    """The matrix must be exactly the histogram of per-pair membership
    bitmasks recomputed from the four pair frames in Python."""
    from collections import Counter

    from kafka_exercise_spark.operators import dedup

    sets = {
        1: {(r.id_a, r.id_b) for r in dedup.dedup_minhash_lsh(spark, sf_dir).collect()},
        2: {(r.id_a, r.id_b) for r in dedup.dedup_simhash_pairs(spark, sf_dir).collect()},
        4: {(r.id_a, r.id_b) for r in dedup.dedup_ngram_jaccard(spark, sf_dir).collect()},
        8: {(r.id_a, r.id_b) for r in dedup.winnowing_overlap_pairs(spark, sf_dir).collect()},
    }
    masks: Counter = Counter()
    for pair in set().union(*sets.values()):
        masks[sum(bit for bit, ps in sets.items() if pair in ps)] += 1
    got = {
        r.mask: r for r in dedup.dedup_detector_matrix(spark, sf_dir).collect()
    }
    assert {m: r.n_pairs for m, r in got.items()} == dict(masks)
    for m, r in got.items():
        assert r.in_minhash == bool(m & 1)
        assert r.in_simhash == bool(m & 2)
        assert r.in_ngram == bool(m & 4)
        assert r.in_winnow == bool(m & 8)
        assert r.n_detectors == bin(m).count("1")


def test_novelty_score_hand_frame(spark):
    """Two verbatim-duplicate docs share every shingle (n_unique=0,
    mean df >= 2); a doc with content nowhere else in the corpus is
    fully unique (unique_ppm = 1e6)."""
    from kafka_exercise_spark.operators import dedup

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta alpha beta"),
            (2, "alpha beta gamma delta alpha beta"),
            (3, "zeta eta theta iota kappa"),
        ],
        "doc_id long, text string",
    )
    orig = dedup.load_table
    dedup.load_table = lambda s, d, n: df
    try:
        out = {
            r.doc_id: r
            for r in dedup.text_novelty_score(spark, "novelty-hand").collect()
        }
    finally:
        dedup.load_table = orig
    for i in (1, 2):
        assert out[i].n_unique == 0 and out[i].unique_ppm == 0
        assert out[i].mean_df_c100 >= 200  # every shingle in both copies
    r3 = out[3]
    assert r3.n_unique == r3.n_shingles and r3.unique_ppm == 1_000_000
    assert r3.mean_df_c100 == 100
    for r in out.values():
        assert r.unique_ppm == (r.n_unique * 1_000_000) // r.n_shingles
        assert r.mean_df_c100 == (r.sum_df * 100) // r.n_shingles


def test_curriculum_plan_is_consistent_with_lm_scores(spark, sf_dir):
    """Recount the banding from the scorer's own output: band histogram,
    running token sums, and the final cumulative share of exactly 1e6."""
    from kafka_exercise_spark.operators import textops

    scored = textops.lm_unigram_score(spark, sf_dir).collect()
    bands: dict = {}
    for r in scored:
        b = round(r.cross_entropy_nats * textops.LM_COST_SCALE) // (
            textops.CURRICULUM_BAND_UNAT
        )
        n, t = bands.get(b, (0, 0))
        bands[b] = (n + 1, t + r.n_tokens)
    rows = sorted(
        textops.curriculum_plan(spark, sf_dir).collect(), key=lambda r: r.band
    )
    assert {r.band: (r.n_docs, r.tokens) for r in rows} == bands
    cum = 0
    total = sum(t for _, t in bands.values())
    for r in rows:
        cum += r.tokens
        assert r.cum_tokens == cum
        assert r.cum_share_ppm == (cum * 1_000_000) // total
        assert r.ce_lo_unat == r.band * textops.CURRICULUM_BAND_UNAT
    assert rows[-1].cum_share_ppm == 1_000_000


def test_knn_vote_ivf_matches_vote_over_probe_list(spark, sf_dir):
    """The IVF vote must be exactly the majority vote recomputed in
    Python over ann_ivf_topk's neighbor list (same tie rule)."""
    from collections import Counter

    from kafka_exercise_spark.catalog import load_table
    from kafka_exercise_spark.operators import similarity as sim

    labels = {
        r.vec_id: r.label
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    probe: dict = {}
    for r in sim.ann_ivf_topk(spark, sf_dir).collect():
        if r.neighbor_id >= sim.N_QUERIES:  # held-out convention
            probe.setdefault(r.query_id, []).append(r.neighbor_id)
    got = {
        r.query_id: r for r in sim.knn_label_vote_ivf(spark, sf_dir).collect()
    }
    assert set(got) == set(probe)
    for q, nbrs in probe.items():
        cnt = Counter(labels[n] for n in nbrs)
        pred = min(cnt, key=lambda l: (-cnt[l], l))
        r = got[q]
        assert r.predicted_label == pred and r.n_votes == cnt[pred]
        assert r.true_label == labels[q]
        assert r.correct == (pred == labels[q])


def test_quality_ablation_tags_match_battery(spark, sf_dir):
    """GOPHER_RULES must cover every tag the battery emits, and the
    report's counts must equal a python recount over the battery output
    (n_sole <= n_flagged, Σ n_sole <= n_rejected by definition)."""
    from kafka_exercise_spark.operators import textops

    reasons = [
        r.reject_reasons
        for r in textops.gopher_quality_filter(spark, sf_dir)
        .select("reject_reasons")
        .collect()
    ]
    emitted_tags = {t for s in reasons for t in s.split(",") if t}
    assert emitted_tags <= set(textops.GOPHER_RULES)
    got = {
        r.rule: r
        for r in textops.quality_ablation_report(spark, sf_dir).collect()
    }
    assert set(got) == set(textops.GOPHER_RULES)
    n_rejected = sum(1 for s in reasons if s)
    for rule in textops.GOPHER_RULES:
        flagged = sum(1 for s in reasons if rule in s.split(","))
        sole = sum(1 for s in reasons if s == rule)
        r = got[rule]
        assert (r.n_flagged, r.n_sole) == (flagged, sole)
        assert r.n_docs == len(reasons) and r.n_rejected == n_rejected
        assert r.n_sole <= r.n_flagged
    assert sum(r.n_sole for r in got.values()) <= n_rejected


def test_ann_filtered_topk_contract(spark, sf_dir):
    """Filtered search invariants plus a FULL python recount: every
    neighbor shares the query's label; filtered ranks are 1..k dense per
    query; global_rank >= rank; and both rank columns equal a from-
    scratch recount of the (round9(cos) desc, vec_id) ordering over the
    collected embeddings."""
    from kafka_exercise_spark.catalog import load_table
    from kafka_exercise_spark.operators import similarity as sim

    labels = {
        r.vec_id: r.label
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    rows = sim.ann_filtered_topk(spark, sf_dir).collect()
    per_q: dict = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    assert set(per_q) == set(range(sim.N_QUERIES))
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= sim.TOP_K
        for r in rs:
            assert labels[r.neighbor_id] == labels[q]
            assert r.global_rank >= r.rank
        # global ranks strictly increase with filtered rank
        grs = [r.global_rank for r in rs]
        assert grs == sorted(grs) and len(set(grs)) == len(grs)
    # full recount of both orderings from the raw embeddings
    import math

    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na * nb > 0 else 0.0

    for q in range(sim.N_QUERIES):
        order = sorted(
            (v for v in vecs if v >= sim.N_QUERIES),
            key=lambda v: (-round(cos(vecs[q], vecs[v]), 9), v),
        )
        grank = {v: i + 1 for i, v in enumerate(order)}
        matches = [v for v in order if labels[v] == labels[q]]
        expected = matches[: sim.TOP_K]
        rs = sorted(per_q[q], key=lambda r: r.rank)
        assert [r.neighbor_id for r in rs] == expected
        for r in rs:
            assert r.global_rank == grank[r.neighbor_id]


def test_bpe_apply_trained_matches_python_fit_application(spark, sf_dir):
    """Apply must equal the python fit's final segmentation joined to the
    corpus: per-source word counts, char baseline, trained symbol sums."""
    from pyspark.sql import functions as F

    from kafka_exercise_spark.catalog import load_table
    from kafka_exercise_spark.functions.text import tokens
    from kafka_exercise_spark.operators import textops

    word_rows = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(tokens(F.col("text"))).alias("word"))
        .collect()
    )
    freqs: dict = {}
    for r in word_rows:
        freqs[r.word] = freqs.get(r.word, 0) + 1
    _, segs = _python_bpe_fit(freqs, textops.BPE_TRAIN_ROUNDS)
    expected: dict = {}
    for r in word_rows:
        n, b, t = expected.get(r.source, (0, 0, 0))
        expected[r.source] = (
            n + 1,
            b + len(r.word),
            t + len(segs[r.word].split(" ")),
        )
    got = {
        r.source: r
        for r in textops.bpe_apply_trained(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for src, (n, b, t) in expected.items():
        r = got[src]
        assert (r.n_words, r.base_symbols, r.trained_symbols) == (n, b, t)
        assert r.compression_ppm == (t * 1_000_000) // b
        assert r.trained_symbols <= r.base_symbols  # merges only shrink


def test_winnowing_published_guarantee_on_planted_substrings(spark):
    """Schleimer et al.'s theorem, checked empirically on constructed
    pairs: two documents sharing ANY substring of length >= k + w - 1
    must share at least one selected (window-minimum) fingerprint. Build
    20 pairs of random-noise docs with a planted shared substring of
    exactly k + w - 1 canonical characters; every pair must share a
    selected fp BEFORE df-bounding (df <= 40 < WINNOW_DF_MAX here, so
    the memoized rare frame sees them all)."""
    import random

    from kafka_exercise_spark.operators import dedup

    rng = random.Random(7)
    alpha = "abcdefghij"
    need = dedup.WINNOW_K + dedup.WINNOW_W - 1

    def noise(n):
        return "".join(rng.choice(alpha) for _ in range(n))

    rows = []
    for p in range(20):
        shared = noise(need)
        rows.append((2 * p, noise(40) + shared + noise(40)))
        rows.append((2 * p + 1, noise(40) + shared + noise(40)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    orig = dedup.load_table
    dedup.load_table = lambda s, d, n: df
    try:
        fps = dedup._winnow_rare_frame(spark, "winnow-guarantee").collect()
    finally:
        dedup.load_table = orig
    by_doc: dict = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    for p in range(20):
        a, b = by_doc.get(2 * p, set()), by_doc.get(2 * p + 1, set())
        assert a & b, f"pair {p} shares a {need}-char substring but no fp"


def test_dedup_savings_report_recount(spark, sf_dir):
    """Recount every tier from the component frames + token counts in
    Python; the fixture's exact tier must be the zero row (all texts
    unique)."""
    from pyspark.sql import functions as F

    from kafka_exercise_spark.catalog import load_table
    from kafka_exercise_spark.functions.text import tokens
    from kafka_exercise_spark.operators import dedup

    tok = {
        r.doc_id: r.n
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(tokens(F.col("text"))).alias("n"))
        .collect()
    }
    total = sum(tok.values())
    got = {r.tier: r for r in dedup.dedup_savings_report(spark, sf_dir).collect()}
    assert set(got) == {"exact", "minhash", "winnow"}
    ex = got["exact"]
    assert (ex.n_groups, ex.n_removable, ex.tokens_removable) == (0, 0, 0)
    for tier, fn in (
        ("minhash", dedup.dedup_components),
        ("winnow", dedup.winnow_components),
    ):
        rows = fn(spark, sf_dir).collect()
        comps = {r.comp for r in rows}
        removable = [r.doc_id for r in rows if not r.is_survivor]
        r = got[tier]
        assert r.n_groups == len(comps)
        assert r.n_docs_in_groups == len(rows)
        assert r.n_removable == len(removable)
        assert r.tokens_removable == sum(tok[d] for d in removable)
        assert r.removable_token_ppm == (r.tokens_removable * 1_000_000) // total


def test_winnow_sweep_monotone_and_anchored(spark, sf_dir):
    """Tightening the cutoff can only shrink counts, and the production
    floor's rung must equal the production pair count exactly."""
    from kafka_exercise_spark.operators import dedup

    rows = sorted(
        dedup.winnow_threshold_sweep(spark, sf_dir).collect(),
        key=lambda r: r.threshold_ppm,
    )
    assert [r.threshold_ppm for r in rows] == sorted(dedup.WINNOW_SWEEP_PPM)
    for a, b in zip(rows, rows[1:]):
        assert a.n_pairs >= b.n_pairs and a.n_docs >= b.n_docs
    anchored = {r.threshold_ppm: r.n_pairs for r in rows}
    assert (
        anchored[dedup.WINNOW_MIN_PPM]
        == dedup.winnowing_overlap_pairs(spark, sf_dir).count()
    )


def test_curation_manifest_partitions_corpus_with_consistent_reasons(
    spark, sf_dir
):
    """The manifest must cover every document exactly once, name the FIRST
    failing stage, and keep each reason consistent with its disposition —
    the properties that make it trustworthy as an audit artifact."""
    from kafka_exercise_spark.catalog import load_table
    from kafka_exercise_spark.operators import textops

    m = textops.curation_run_manifest(spark, sf_dir).cache()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert m.count() == n_docs
    assert m.select("doc_id").distinct().count() == n_docs
    rows = m.collect()
    for r in rows:
        if r.disposition == "reject_quality":
            assert not r.quality_keep and r.reason == r.reject_reasons
        elif r.disposition == "reject_duplicate":
            assert r.quality_keep and not r.is_canonical
            assert r.reason == f"dup_of:{r.canonical_id}"
            assert r.canonical_id != r.doc_id
        elif r.disposition == "held_out":
            assert r.quality_keep and r.is_canonical
            assert r.split in ("valid", "test")
            assert r.reason == f"split:{r.split}"
        else:
            assert r.disposition == "train" and r.split == "train"
            assert r.reason == f"rate_bps:{r.rate_bps}"
        # docs outside any dedup cluster are their own canonical
        if r.is_canonical:
            assert r.canonical_id == r.doc_id
    # all four dispositions actually occur on the fixture
    assert {r.disposition for r in rows} == {
        "reject_quality", "reject_duplicate", "held_out", "train"
    }
    m.unpersist()


def test_pair_audit_sample_caps_and_agreement(spark, sf_dir):
    """Each tier contributes at most AUDIT_SAMPLE_N pairs with dense
    deterministic ranks, and the cross-tier agreement count is consistent
    with the pair's actual tier membership."""
    from kafka_exercise_spark.operators import dedup

    rows = dedup.dedup_pair_audit_sample(spark, sf_dir).collect()
    by_tier = {}
    for r in rows:
        by_tier.setdefault(r.tier, []).append(r)
    assert set(by_tier) <= {"minhash", "simhash", "ngram", "winnow"}
    for tier, trs in by_tier.items():
        ranks = sorted(r.sample_rank for r in trs)
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(trs) <= dedup.AUDIT_SAMPLE_N
    # a pair sampled in two tiers must report the same n_detectors, >= 2
    seen = {}
    for r in rows:
        key = (r.id_a, r.id_b)
        if key in seen:
            assert seen[key] == r.n_detectors and r.n_detectors >= 2
        seen[key] = r.n_detectors


def test_winnow_selection_guarantee_on_planted_substrings(spark):
    """Schleimer et al.'s published winnowing guarantee: any shared
    substring of length >= WINNOW_K + WINNOW_W - 1 contributes at least
    one COMMON selected fingerprint. Planted deterministically: 25 doc
    pairs share a random-ish substring exactly that long, embedded in
    otherwise-disjoint text; every pair must intersect. (Normalization
    lowercases and collapses whitespace, so payloads avoid both.)"""
    import hashlib as _h

    from kafka_exercise_spark.operators.dedup import (
        WINNOW_K,
        WINNOW_W,
        winnow_selected,
    )

    min_len = WINNOW_K + WINNOW_W - 1

    def blob(tag: str, n: int) -> str:
        out = []
        i = 0
        while sum(len(s) for s in out) < n:
            out.append(_h.md5(f"{tag}:{i}".encode()).hexdigest())
            i += 1
        return "".join(out)[:n]

    rows = []
    for p in range(25):
        shared = blob(f"shared{p}", min_len)
        rows.append((2 * p, blob(f"a{p}", 40) + shared + blob(f"b{p}", 40)))
        rows.append(
            (2 * p + 1, blob(f"c{p}", 55) + shared + blob(f"d{p}", 25))
        )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_selected(docs).collect()
    by_doc: dict[int, set[int]] = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    for p in range(25):
        common = by_doc[2 * p] & by_doc[2 * p + 1]
        assert common, f"pair {p}: guarantee violated"


def test_perceptron_fit_matches_pure_python_replay(spark, sf_dir):
    """The distributed mini-batch fit must equal a sequential pure-Python
    replay from the same feature table — the BPE-trainer pinning pattern:
    if partitioning, join order, or collect merging ever perturbed an
    update, the weight trajectory (and this test) would diverge."""
    import hashlib as _h

    from kafka_exercise_spark.operators.textops import (
        PERC_BATCHES,
        PERC_DIM,
        PERC_EPOCHS,
        _perceptron_features,
        _perceptron_fit,
    )

    feats = [
        (r.doc_id, r.bucket, r.cnt, r.y)
        for r in _perceptron_features(spark, sf_dir)
        .filter(F.col("split") == "train")
        .collect()
    ]
    stats_rows, history = _perceptron_fit(spark, sf_dir)

    def batch_of(doc_id: int, epoch: int) -> int:
        h = int(_h.md5(f"perc:{epoch}:{doc_id}".encode()).hexdigest()[:15], 16)
        return h % PERC_BATCHES

    by_doc: dict[int, list] = {}
    for d, b, c, y in feats:
        by_doc.setdefault(d, []).append((b, c, y))
    w = [0] * PERC_DIM
    replay = []
    for epoch in range(1, PERC_EPOCHS + 1):
        for t in range(PERC_BATCHES):
            docs = [d for d in by_doc if batch_of(d, epoch) == t]
            miscl = [
                d
                for d in docs
                if by_doc[d][0][2]
                * sum(c * w[b] for b, c, _y in by_doc[d])
                <= 0
            ]
            for d in miscl:
                y = by_doc[d][0][2]
                for b, c, _y in by_doc[d]:
                    w[b] += y * c
            replay.append(list(w))
    assert replay == history
    # and the trace's bookkeeping matches the replayed weights
    assert [r[5] for r in stats_rows] == [
        sum(abs(x) for x in step) for step in replay
    ]


def test_model_rule_disagreement_cells_partition(spark, sf_dir):
    """Per (split, source): the four confusion cells partition n_docs,
    agree_ppm re-derives from the cells, and every example id really
    belongs to its cell (or is the −1 empty sentinel)."""
    from kafka_exercise_spark.operators.textops import (
        model_rule_disagreement_report,
        perceptron_apply_scores,
    )

    rows = model_rule_disagreement_report(spark, sf_dir).collect()
    assert rows
    scores = {
        r.doc_id: r.keep
        for r in perceptron_apply_scores(spark, sf_dir).collect()
    }
    for r in rows:
        assert (
            r.n_both_keep + r.n_model_only + r.n_rule_only + r.n_both_reject
            == r.n_docs
        )
        assert r.agree_ppm == (
            (r.n_both_keep + r.n_both_reject) * 1_000_000
        ) // r.n_docs
        # example ids: model_only → model keeps; rule_only → model rejects
        if r.n_model_only == 0:
            assert r.model_only_example == -1
        else:
            assert scores[r.model_only_example] is True
        if r.n_rule_only == 0:
            assert r.rule_only_example == -1
        else:
            assert scores[r.rule_only_example] is False


def test_model_gate_threshold_sweep_shape(spark, sf_dir):
    """The sweep spans the observed margin range with a monotone
    keep-rate: theta ladder ascends min→max, n_keep is non-increasing in
    theta, the top step keeps nothing (margin > max is empty), and every
    ppm re-derives from its counts."""
    from kafka_exercise_spark.operators.textops import (
        MODEL_SWEEP_STEPS,
        model_gate_threshold_sweep,
        perceptron_apply_scores,
    )

    rows = sorted(
        model_gate_threshold_sweep(spark, sf_dir).collect(),
        key=lambda r: r.step,
    )
    assert len(rows) == MODEL_SWEEP_STEPS
    margins = [
        r.margin for r in perceptron_apply_scores(spark, sf_dir).collect()
    ]
    assert rows[0].theta == min(margins)
    assert rows[-1].theta == max(margins)
    assert rows[-1].n_keep == 0
    for a, b in zip(rows, rows[1:]):
        assert a.theta <= b.theta
        assert a.n_keep >= b.n_keep
    for r in rows:
        assert r.n_docs == len(margins)
        assert r.n_keep == sum(m > r.theta for m in margins)
        assert r.keep_ppm == (r.n_keep * 1_000_000) // r.n_docs
        assert r.agree_ppm == (r.n_agree * 1_000_000) // r.n_docs


def test_curation_manifest_model_gate_stage_order(spark, sf_dir):
    """The model-gated manifest must only ever (a) keep the base
    manifest's disposition verbatim, or (b) replace it with reject_model
    WHEN the base stage was not reject_quality AND the model rejects —
    the 5th stage slots strictly after the quality gate and before
    everything else. Reasons for model rejections carry the margin."""
    from kafka_exercise_spark.operators.textops import (
        curation_manifest_model_gate,
        curation_run_manifest,
    )

    base = {
        r.doc_id: r for r in curation_run_manifest(spark, sf_dir).collect()
    }
    gated = curation_manifest_model_gate(spark, sf_dir).collect()
    assert len(gated) == len(base)
    n_model_rejects = 0
    for g in gated:
        b = base[g.doc_id]
        if g.disposition == "reject_model":
            n_model_rejects += 1
            assert b.disposition != "reject_quality"
            assert g.model_keep is False
            assert g.reason == f"model_margin:{g.model_margin}"
        else:
            assert g.disposition == b.disposition
            assert g.reason == b.reason
            # unchanged disposition ⇒ either quality already rejected it
            # or the model kept it
            assert b.disposition == "reject_quality" or g.model_keep
    # the model column itself is not degenerate on the fixture (whether a
    # reject_model disposition appears depends on overlap with the
    # quality gate — at sf0.001 every model reject is also a quality
    # reject, so assert the score column, not the disposition count)
    assert any(not g.model_keep for g in gated)
    assert any(g.model_keep for g in gated)


def test_perceptron_incremental_update_replays_in_python(spark, sf_dir):
    """The online round's weight ledger must equal a pure-Python replay
    of one lr=1 perceptron step on the served weights over the src0
    batch — the fit-pinning pattern applied to the maintenance path —
    and the ledger must be internally consistent (w_after = w_before +
    dw, w_before = the served model, full PERC_DIM grid)."""
    from kafka_exercise_spark.operators.dedup import INCREMENTAL_NEW_SOURCE
    from kafka_exercise_spark.operators.textops import (
        PERC_DIM,
        _perceptron_features,
        perceptron_incremental_update,
        perceptron_model_weights,
    )

    rows = sorted(
        perceptron_incremental_update(spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    assert [r.bucket for r in rows] == list(range(PERC_DIM))
    w = perceptron_model_weights(spark, sf_dir)
    assert [r.w_before for r in rows] == w
    for r in rows:
        assert r.w_after == r.w_before + r.dw
    # pure-Python replay of the single round over the batch features
    from kafka_exercise_spark.catalog import load_table

    batch_ids = {
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("source") == INCREMENTAL_NEW_SOURCE)
        .select("doc_id")
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in _perceptron_features(spark, sf_dir).collect():
        if r.doc_id in batch_ids:
            by_doc.setdefault(r.doc_id, []).append((r.bucket, r.cnt, r.y))
    dw = [0] * PERC_DIM
    for feats in by_doc.values():
        y = feats[0][2]
        margin = sum(c * w[b] for b, c, _y in feats)
        if y * margin <= 0:
            for b, c, _y in feats:
                dw[b] += y * c
    assert [r.dw for r in rows] == dw


def test_model_weight_report_census(spark, sf_dir):
    """Per-slot sheet: full PERC_DIM grid, weights equal the served
    model, the bias/length slots carry no token census, and every
    hashed bucket's example token really hashes to that bucket."""
    import hashlib as _h

    from kafka_exercise_spark.operators.textops import (
        FEATURE_HASH_DIM,
        PERC_BIAS_SLOT,
        PERC_DIM,
        PERC_LEN_SLOT,
        model_weight_report,
        perceptron_model_weights,
    )

    rows = sorted(
        model_weight_report(spark, sf_dir).collect(), key=lambda r: r.bucket
    )
    assert [r.bucket for r in rows] == list(range(PERC_DIM))
    assert [r.weight for r in rows] == perceptron_model_weights(spark, sf_dir)
    for r in rows:
        if r.bucket in (PERC_BIAS_SLOT, PERC_LEN_SLOT):
            assert r.n_distinct_tokens == 0 and r.example_token == ""
        elif r.example_token:
            h = int(
                _h.md5(r.example_token.encode()).hexdigest()[:15], 16
            )
            assert h % FEATURE_HASH_DIM == r.bucket
            assert r.n_distinct_tokens >= 1 and r.n_docs >= 1


def test_streaming_model_update_equals_batch_round(spark, sf_dir):
    """The live per-micro-batch delta pushes must fold to EXACTLY the
    batch update round's ledger — additive because each micro-batch's
    misclassification test reads only the fixed pre-round weights (the
    synchronized-round contract the shared oracle rests on)."""
    from kafka_exercise_spark.operators.textops import (
        perceptron_incremental_update,
    )
    from kafka_exercise_spark.streaming.pipeline import (
        streaming_model_update_replay,
    )

    batch = {
        r.bucket: (r.w_before, r.dw, r.w_after)
        for r in perceptron_incremental_update(spark, sf_dir).collect()
    }
    live = {
        r.bucket: (r.w_before, r.dw, r.w_after)
        for r in streaming_model_update_replay(spark, sf_dir).collect()
    }
    assert live == batch


def test_dedup_soft_weights_match_clusters(spark, sf_dir):
    """Every near-dup cluster member carries weight 1e6 // |cluster|,
    singletons carry exactly 1e6 with comp = their own id, and summing a
    cluster's weights recovers ~1e6 (one expected copy per cluster)."""
    from kafka_exercise_spark.operators.dedup import (
        dedup_components,
        dedup_soft_weights,
    )

    rows = dedup_soft_weights(spark, sf_dir).collect()
    comps = {r.doc_id: r for r in dedup_components(spark, sf_dir).collect()}
    n_docs_in_clusters = 0
    by_comp: dict[int, list] = {}
    for r in rows:
        assert r.weight_ppm == 1_000_000 // r.cluster_size
        if r.doc_id in comps:
            c = comps[r.doc_id]
            assert (r.comp, r.cluster_size) == (c.comp, c.comp_size)
            n_docs_in_clusters += 1
            by_comp.setdefault(r.comp, []).append(r)
        else:
            assert (r.comp, r.cluster_size, r.weight_ppm) == (
                r.doc_id,
                1,
                1_000_000,
            )
    assert n_docs_in_clusters == len(comps)
    for members in by_comp.values():
        assert len(members) == members[0].cluster_size
        total = sum(m.weight_ppm for m in members)
        # integer div floors each member, so the cluster total is within
        # cluster_size of exactly 1e6
        assert 1_000_000 - members[0].cluster_size < total <= 1_000_000


def test_mixture_temperature_plan_flattens(spark, sf_dir):
    """Temperature semantics: at α=1 the rounded share equals the exact
    proportional share (±1 ppm, round vs floor); lowering α moves every
    below-average source UP and every above-average source DOWN (the
    flattening that is the whole point); each α's shares sum to ~1e6."""
    from kafka_exercise_spark.operators.sampling import (
        MIX_TEMPERATURES_MILLI,
        mixture_temperature_plan,
    )

    rows = mixture_temperature_plan(spark, sf_dir).collect()
    by_alpha: dict[int, dict[str, tuple]] = {}
    for r in rows:
        by_alpha.setdefault(r.alpha_milli, {})[r.source] = r
    assert sorted(by_alpha) == sorted(MIX_TEMPERATURES_MILLI)
    sources = set(by_alpha[1000])
    n = len(sources)
    for a, per_src in by_alpha.items():
        assert set(per_src) == sources
        total = sum(r.share_ppm for r in per_src.values())
        assert abs(total - 1_000_000) <= n  # one 0-dp round per source
    uniform = 1_000_000 // n
    for s in sources:
        r1000, r500, r250 = (by_alpha[a][s] for a in (1000, 500, 250))
        assert abs(r1000.share_ppm - r1000.prop_share_ppm) <= 1
        shares = [r1000.share_ppm, r500.share_ppm, r250.share_ppm]
        if r1000.share_ppm < uniform - n:  # clearly below-average source
            assert shares == sorted(shares)  # monotone boost as α drops
        elif r1000.share_ppm > uniform + n:  # clearly above-average
            assert shares == sorted(shares, reverse=True)


def test_model_promotion_report_matches_ledgers(spark, sf_dir):
    """The promotion sheet can't drift from its parents: the BEFORE
    side reproduces the deployed apply scores exactly, the AFTER side
    scores the incremental ledger's w_after vector, and the flip/rate
    arithmetic is internally consistent in exact integers."""
    from kafka_exercise_spark.catalog import load_table
    from kafka_exercise_spark.operators.textops import (
        model_promotion_report,
        perceptron_apply_scores,
        perceptron_incremental_update,
        perceptron_model_weights,
        perceptron_updated_weights,
    )

    rows = model_promotion_report(spark, sf_dir).collect()
    # w_after accessor == the published ledger column
    ledger = {
        r.bucket: r.w_after
        for r in perceptron_incremental_update(spark, sf_dir).collect()
    }
    w_after = perceptron_updated_weights(spark, sf_dir)
    assert w_after == [ledger[b] for b in range(len(w_after))]
    # the update round really changed the model at this sf (the sheet
    # is non-trivial) ...
    assert w_after != perceptron_model_weights(spark, sf_dir)
    # ... and the BEFORE side == the deployed apply entry, per
    # (split, source)
    src = {
        r.doc_id: r.source
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .collect()
    }
    before: dict[tuple, int] = {}
    n_all: dict[tuple, int] = {}
    for r in perceptron_apply_scores(spark, sf_dir).collect():
        key = (r.split, src[r.doc_id])
        n_all[key] = n_all.get(key, 0) + 1
        if r.keep:
            before[key] = before.get(key, 0) + 1
    assert {(r.split, r.source): r.n_keep_before for r in rows} == {
        k: before.get(k, 0) for k in n_all
    }
    for r in rows:
        assert r.n_docs == n_all[(r.split, r.source)]
        assert r.n_keep_after == r.n_keep_before + r.n_gained - r.n_lost
        assert r.keep_before_ppm == r.n_keep_before * 1_000_000 // r.n_docs
        assert r.keep_after_ppm == r.n_keep_after * 1_000_000 // r.n_docs
        assert r.keep_delta_ppm == r.keep_after_ppm - r.keep_before_ppm
        assert (
            r.agree_ppm
            == (r.n_docs - r.n_gained - r.n_lost) * 1_000_000 // r.n_docs
        )


def test_model_batch_drift_report_restricts_disagreement(spark, sf_dir):
    """The drift monitor IS the disagreement sheet restricted to the
    src0 batch: its confusion cells equal the disagreement report's
    src0 rows, batch+rest partition each split's corpus, and the ppm
    columns follow the exact-integer definitions (−1 sentinels when a
    side is empty, drift pinned 0)."""
    from kafka_exercise_spark.operators.dedup import INCREMENTAL_NEW_SOURCE
    from kafka_exercise_spark.operators.textops import (
        model_batch_drift_report,
        model_rule_disagreement_report,
    )

    drift = {r.split: r for r in model_batch_drift_report(spark, sf_dir).collect()}
    dis = model_rule_disagreement_report(spark, sf_dir).collect()
    batch_rows = {
        r.split: r for r in dis if r.source == INCREMENTAL_NEW_SOURCE
    }
    assert batch_rows, "fixture must have src0 docs"
    totals: dict[str, int] = {}
    agrees: dict[str, int] = {}
    for r in dis:
        totals[r.split] = totals.get(r.split, 0) + r.n_docs
        agrees[r.split] = (
            agrees.get(r.split, 0) + r.n_both_keep + r.n_both_reject
        )
    for split, d in drift.items():
        b = batch_rows.get(split)
        if b is None:
            assert (d.n_batch, d.batch_agree_ppm, d.drift_ppm) == (0, -1, 0)
            continue
        assert (
            d.n_batch,
            d.n_both_keep,
            d.n_model_only,
            d.n_rule_only,
            d.n_both_reject,
        ) == (
            b.n_docs,
            b.n_both_keep,
            b.n_model_only,
            b.n_rule_only,
            b.n_both_reject,
        )
        assert d.n_batch + d.n_rest == totals[split]
        batch_agree = b.n_both_keep + b.n_both_reject
        rest_agree = agrees[split] - batch_agree
        assert d.batch_agree_ppm == batch_agree * 1_000_000 // d.n_batch
        assert d.rest_agree_ppm == rest_agree * 1_000_000 // d.n_rest
        assert d.drift_ppm == d.batch_agree_ppm - d.rest_agree_ppm


def test_model_gate_impact_matrix_reconciles(spark, sf_dir):
    """The transition matrix is exactly the two manifests joined: cell
    masses re-aggregate the per-doc transitions, the only movement
    targets reject_model (the gate can't resurrect or re-route docs),
    rows partition the corpus, and the changed flag marks precisely the
    off-diagonal."""
    from kafka_exercise_spark.operators.textops import (
        curation_manifest_model_gate,
        curation_run_manifest,
        model_gate_impact_matrix,
    )

    rows = model_gate_impact_matrix(spark, sf_dir).collect()
    base = {
        r.doc_id: (r.disposition, r.n_tokens)
        for r in curation_run_manifest(spark, sf_dir).collect()
    }
    gated = {
        r.doc_id: r.disposition
        for r in curation_manifest_model_gate(spark, sf_dir).collect()
    }
    expected: dict[tuple, list] = {}
    for doc_id, (before, n_tok) in base.items():
        expected.setdefault((before, gated[doc_id]), []).append(
            (doc_id, n_tok)
        )
    assert {(r.disposition_before, r.disposition_after) for r in rows} == set(
        expected
    )
    assert sum(r.n_docs for r in rows) == len(base)
    for r in rows:
        cell = expected[(r.disposition_before, r.disposition_after)]
        assert r.n_docs == len(cell)
        assert r.n_tokens == sum(t for _, t in cell)
        assert r.example_doc_id == min(d for d, _ in cell)
        assert r.changed == (r.disposition_before != r.disposition_after)
        if r.changed:
            assert r.disposition_after == "reject_model"
            assert r.disposition_before != "reject_quality"
    # No moved-cell assertion: on ALL fixture scales the matrix is
    # measured all-diagonal — every doc the model would reject is
    # already reject_quality under the broader curation battery (the
    # 5 gopher-vs-model rule_only docs at sf0.01 all carry
    # reject_quality), so stacking the gate moves nothing. That is the
    # sheet's real finding, not a triviality: it says ship the model
    # INSTEAD of the expensive battery, not on top of it.


def test_model_replace_impact_matrix_reconciles(spark, sf_dir):
    """The replacement matrix re-derives per doc: disposition_after is
    the manifest's when-chain with model_keep in the quality slot; cell
    masses/examples re-aggregate the per-doc transitions; rows
    partition the corpus; and (unlike the stacking matrix) the only
    cells that can move INTO train are battery rejections — the
    model's permissive side."""
    from kafka_exercise_spark.operators.textops import (
        curation_manifest_model_gate,
        curation_run_manifest,
        model_replace_impact_matrix,
    )

    rows = model_replace_impact_matrix(spark, sf_dir).collect()
    base = {
        r.doc_id: (r.disposition, r.n_tokens)
        for r in curation_run_manifest(spark, sf_dir).collect()
    }
    expected: dict[tuple, list] = {}
    for g in curation_manifest_model_gate(spark, sf_dir).collect():
        if not g.model_keep:
            after = "reject_model"
        elif not g.is_canonical:
            after = "reject_duplicate"
        elif g.split != "train":
            after = "held_out"
        else:
            after = "train"
        before, n_tok = base[g.doc_id]
        expected.setdefault((before, after), []).append((g.doc_id, n_tok))
    assert {(r.disposition_before, r.disposition_after) for r in rows} == set(
        expected
    )
    assert sum(r.n_docs for r in rows) == len(base)
    for r in rows:
        cell = expected[(r.disposition_before, r.disposition_after)]
        assert r.n_docs == len(cell)
        assert r.n_tokens == sum(t for _, t in cell)
        assert r.example_doc_id == min(d for d, _ in cell)
        assert r.changed == (r.disposition_before != r.disposition_after)
        if r.disposition_after == "train" and r.changed:
            assert r.disposition_before == "reject_quality"


def test_split_repair_plan_reconciles_with_census(spark, sf_dir):
    """The repair plan's per-doc flags aggregate EXACTLY to the leakage
    census: per split, the exact/neardup/winnow flag counts equal the
    report's three tiers; actions follow the deterministic policy
    (doc-level match => drop_from_eval, dose-only => flag_review); no
    train docs appear; every emitted row is flagged by some tier."""
    from kafka_exercise_spark.operators.dedup import (
        SPLIT_LEAK_WINNOW_PPM,
        split_leakage_report,
        split_repair_plan,
    )

    plan = split_repair_plan(spark, sf_dir).collect()
    census = {r.split: r for r in split_leakage_report(spark, sf_dir).collect()}
    agg = {s: [0, 0, 0] for s in census}
    for r in plan:
        assert r.split in ("valid", "test")
        dose = r.winnow_ppm >= SPLIT_LEAK_WINNOW_PPM
        assert r.exact_leak or r.neardup_leak or dose
        assert r.action == (
            "drop_from_eval" if r.exact_leak or r.neardup_leak
            else "flag_review"
        )
        agg[r.split][0] += int(r.exact_leak)
        agg[r.split][1] += int(r.neardup_leak)
        agg[r.split][2] += int(dose)
    for s, c in census.items():
        assert agg[s] == [c.n_exact_leak, c.n_neardup_leak, c.n_winnow_leak]


def test_preference_pairs_mirror_matching(spark, sf_dir):
    pairs = textops.preference_pairs(spark, sf_dir).collect()
    scores = {
        r.doc_id: r.logit
        for r in textops.classifier_quality_score(spark, sf_dir)
        .select("doc_id", "logit")
        .collect()
    }
    assert pairs
    seen = set()
    for p in pairs:
        # strict preference, and logits are the classifier's own
        assert p.margin >= textops.PREF_MARGIN_MIN
        assert p.chosen_logit == scores[p.chosen_doc_id]
        assert p.rejected_logit == scores[p.rejected_doc_id]
        assert p.chosen_logit - p.rejected_logit == p.margin
        # a document appears in AT MOST one pair, on one side
        for d in (p.chosen_doc_id, p.rejected_doc_id):
            assert d not in seen
            seen.add(d)
    # mirror pairing: per lang, pair count ≤ n div 2 (margin-0 pairs and
    # the odd middle are dropped)
    from kafka_exercise_spark.catalog import load_table

    n_by_lang = {
        r.lang: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    by_lang = {}
    for p in pairs:
        by_lang[p.lang] = by_lang.get(p.lang, 0) + 1
    for lang, cnt in by_lang.items():
        assert cnt <= n_by_lang[lang] // 2


def test_preference_pairs_is_deterministic(spark, sf_dir):
    a = sorted(map(tuple, textops.preference_pairs(spark, sf_dir).collect()))
    b = sorted(map(tuple, textops.preference_pairs(spark, sf_dir).collect()))
    assert a == b


def test_hard_negatives_split_roles_correctly(spark, sf_dir):
    recs = similarity.hard_negatives_topk(spark, sf_dir).collect()
    assert recs
    dup = {
        (r.id_a, r.id_b)
        for r in similarity.dedup_semantic(spark, sf_dir)
        .select("id_a", "id_b")
        .collect()
    }
    cand = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ann_cosine_topk(spark, sf_dir).collect()
    }
    per_role = {}
    for r in recs:
        # every record comes from the ANN candidate pool
        assert (r.query_id, r.neighbor_id) in cand
        is_dup = (
            min(r.query_id, r.neighbor_id),
            max(r.query_id, r.neighbor_id),
        ) in dup
        assert (r.role == "positive") == is_dup
        assert 1 <= r.role_rank <= similarity.NEG_K
        key = (r.query_id, r.role)
        per_role.setdefault(key, []).append(r)
    # ranks are contiguous and ordered by (cos desc, neighbor_id asc)
    for rows in per_role.values():
        rows.sort(key=lambda r: r.role_rank)
        assert [r.role_rank for r in rows] == list(range(1, len(rows) + 1))
        ordered = sorted(rows, key=lambda r: (-r.cos, r.neighbor_id))
        assert [r.neighbor_id for r in ordered] == [
            r.neighbor_id for r in rows
        ]


def test_fim_split_plan_partitions_every_doc(spark, sf_dir):
    rows = textops.fim_split_plan(spark, sf_dir).collect()
    assert rows
    n_applied = 0
    for r in rows:
        assert r.fim_mode in ("none", "psm", "spm")
        assert (r.fim_mode != "none") == r.fim_applied
        # the three spans partition the token sequence exactly
        assert r.prefix_len + r.middle_len + r.suffix_len == r.n_tokens
        assert r.prefix_len >= 0 and r.middle_len >= 0 and r.suffix_len >= 0
        if not r.fim_applied:
            assert (r.prefix_len, r.middle_len, r.suffix_len) == (
                r.n_tokens,
                0,
                0,
            )
        else:
            n_applied += 1
    # hash rate realization: the 50% gate lands in a sane band
    assert 0.35 < n_applied / len(rows) < 0.65


def test_fim_split_plan_is_deterministic(spark, sf_dir):
    a = sorted(map(tuple, textops.fim_split_plan(spark, sf_dir).collect()))
    b = sorted(map(tuple, textops.fim_split_plan(spark, sf_dir).collect()))
    assert a == b


def test_fim_split_plan_matches_pure_python_md5_replay(spark, sf_dir):
    """The FIM plan is a pure function of (salt, doc_id, n_tokens) — so an
    independent Python implementation of the md5 arithmetic must reproduce
    every row. Catches any drift in the hash/pmod/least-greatest chain
    (the same class of bug the int_cos_e6 bit-parity test guards)."""
    import hashlib

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    for r in textops.fim_split_plan(spark, sf_dir).collect():
        applied = h64(f"fim:{r.doc_id}") % 100 < textops.FIM_RATE_PCT
        assert r.fim_applied == applied
        if not applied:
            assert r.fim_mode == "none"
            assert (r.prefix_len, r.middle_len, r.suffix_len) == (
                r.n_tokens,
                0,
                0,
            )
            continue
        u_raw = h64(f"fimu:{r.doc_id}") % (r.n_tokens + 1)
        v_raw = h64(f"fimv:{r.doc_id}") % (r.n_tokens + 1)
        u, v = min(u_raw, v_raw), max(u_raw, v_raw)
        psm = h64(f"fimmode:{r.doc_id}") % 2 == 0
        assert r.fim_mode == ("psm" if psm else "spm")
        assert (r.prefix_len, r.middle_len, r.suffix_len) == (
            u,
            v - u,
            r.n_tokens - v,
        )


def test_preference_pairs_matches_pure_python_matching(spark, sf_dir):
    """Full expected-set replay: rebuild the per-language mirror matching
    in plain Python from the classifier's own scores and assert the Spark
    pair set is EXACTLY it — not just invariant-consistent."""
    from kafka_exercise_spark.catalog import load_table

    scores = {
        r.doc_id: r.logit
        for r in textops.classifier_quality_score(spark, sf_dir)
        .select("doc_id", "logit")
        .collect()
    }
    langs = {
        r.doc_id: r.lang
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .collect()
    }
    by_lang: dict[str, list[int]] = {}
    for d, lang in langs.items():
        if d in scores:
            by_lang.setdefault(lang, []).append(d)
    expected = set()
    for lang, docs in by_lang.items():
        ranked = sorted(docs, key=lambda d: (-scores[d], d))
        n = len(ranked)
        for i in range(n // 2):
            chosen, rejected = ranked[i], ranked[n - 1 - i]
            margin = scores[chosen] - scores[rejected]
            if margin >= textops.PREF_MARGIN_MIN:
                expected.add(
                    (
                        lang,
                        i + 1,
                        chosen,
                        scores[chosen],
                        rejected,
                        scores[rejected],
                        margin,
                    )
                )
    got = {
        tuple(r)
        for r in textops.preference_pairs(spark, sf_dir).collect()
    }
    assert got == expected


def test_preference_pair_dedup_audit_reconciles(spark, sf_dir):
    audit = {
        r.lang: r
        for r in textops.preference_pair_dedup_audit(spark, sf_dir).collect()
    }
    pairs = textops.preference_pairs(spark, sf_dir).collect()
    comp = {
        r.doc_id: r.comp
        for r in dedup.dedup_components(spark, sf_dir)
        .select("doc_id", "comp")
        .collect()
    }
    by_lang: dict[str, list] = {}
    for p in pairs:
        by_lang.setdefault(p.lang, []).append(p)
    assert set(audit) == set(by_lang)
    for lang, rows in by_lang.items():
        a = audit[lang]
        assert a.n_pairs == len(rows)
        poisoned = [
            p
            for p in rows
            if p.chosen_doc_id in comp
            and comp.get(p.chosen_doc_id) == comp.get(p.rejected_doc_id)
        ]
        assert a.n_poisoned == len(poisoned)
        assert a.poisoned_ppm == a.n_poisoned * 1_000_000 // a.n_pairs
        if poisoned:
            assert a.example_pair_idx == min(p.pair_idx for p in poisoned)
        else:
            assert a.example_pair_idx == -1


def test_preference_repair_plan_keeps_clean_fixture(spark, sf_dir):
    """The fixture corpus's mirror pairing is poison-free (audited ~0 by
    design), so the repair plan must be exactly the pairing with
    provenance 'kept' — nothing dropped, nothing invented."""
    plan = textops.preference_pair_repair_plan(spark, sf_dir).collect()
    assert all(r.provenance == "kept" for r in plan)
    pairs = {
        (p.lang, p.pair_idx): p
        for p in textops.preference_pairs(spark, sf_dir).collect()
    }
    assert {(r.lang, r.pair_idx) for r in plan} == set(pairs)
    for r in plan:
        p = pairs[(r.lang, r.pair_idx)]
        assert (r.chosen_doc_id, r.rejected_doc_id, r.margin) == (
            p.chosen_doc_id,
            p.rejected_doc_id,
            p.margin,
        )


def _pref_pair_row(
    lang, pair_idx, c_doc, c_logit, r_doc, r_logit, comp_c, comp_r
):
    return (
        lang,
        pair_idx,
        c_doc,
        c_logit,
        r_doc,
        r_logit,
        c_logit - r_logit,
        comp_c,
        comp_r,
    )


def test_preference_repair_synthetic_poisoned(spark):
    """Exercise the re-pair branch the fixture never reaches: mirror
    re-pairing of poisoned sides by (chosen_logit DESC), middle
    self-pair killed by the comp check, same-comp candidates dropped,
    negative-margin candidates dropped, null-comp pairs kept."""
    schema = (
        "lang string, pair_idx long, chosen_doc_id long,"
        " chosen_logit long, rejected_doc_id long, rejected_logit long,"
        " margin long, comp_chosen long, comp_rejected long"
    )
    rows = [
        # clean pair (no comps) -> kept
        _pref_pair_row("xx", 1, 101, 100, 201, 10, None, None),
        # one-sided comp -> NOT poisoned (3VL guard) -> kept
        _pref_pair_row("xx", 6, 106, 15, 206, 5, 5000, None),
        # four poisoned pairs, ranked r=1..4 by chosen_logit DESC
        _pref_pair_row("xx", 2, 102, 90, 202, 80, 1000, 1000),
        _pref_pair_row("xx", 3, 103, 70, 203, 60, 2000, 2000),
        _pref_pair_row("xx", 4, 104, 50, 204, 40, 2000, 2000),
        _pref_pair_row("xx", 5, 105, 30, 205, 20, 4000, 4000),
        # odd-m lang: the single poisoned pair can only re-pair with
        # itself (r = m+1-r) and must die on the comp check
        _pref_pair_row("yy", 1, 301, 50, 401, 40, 7000, 7000),
    ]
    joined = spark.createDataFrame(rows, schema)
    out = textops._repair_preference_pairs(joined).collect()
    kept = {(r.lang, r.pair_idx) for r in out if r.provenance == "kept"}
    assert kept == {("xx", 1), ("xx", 6)}
    repaired = {
        (r.lang, r.pair_idx): r for r in out if r.provenance == "repaired"
    }
    # mirror over the poisoned ranking: new_idx 1 = chosen of r1 (102)
    # with rejected of r4 (205) -> margin 70, comps 1000 != 4000: LIVES.
    # new_idx 2 = 103 + 204: comps 2000 == 2000 -> dropped.
    # new_idx 3 = 104 + 203: margin 50-60 < 0 -> dropped.
    # new_idx 4 = 105 + 202: margin 30-80 < 0 -> dropped.
    # yy's middle self-pair -> dropped (same comp).
    assert set(repaired) == {("xx", 1)}
    r = repaired[("xx", 1)]
    assert (r.chosen_doc_id, r.rejected_doc_id, r.margin) == (102, 205, 70)
    assert r.chosen_logit == 90 and r.rejected_logit == 20


def test_curation_export_delta_reconciles(spark, sf_dir):
    """The delta must be exactly the per-shard fold of its two parent
    manifests, with non-negative removals (selected is doc-for-doc a
    subset of raw under the same shard rule and tokenizer)."""
    from kafka_exercise_spark.operators import sampling

    def fold(df):
        agg = {}
        for r in df.collect():
            d, t, b = agg.get(r.shard, (0, 0, 0))
            agg[r.shard] = (d + r.n_docs, t + r.bin_tokens, b + 1)
        return agg

    raw = fold(sampling.output_shard_manifest(spark, sf_dir))
    sel = fold(sampling.export_shard_manifest(spark, sf_dir))
    delta = sampling.curation_export_delta(spark, sf_dir).collect()
    assert {r.shard for r in delta} == set(raw)
    for r in delta:
        rd, rt, rb = raw[r.shard]
        sd, st, sb = sel.get(r.shard, (0, 0, 0))
        assert (r.raw_docs, r.raw_tokens, r.raw_bins) == (rd, rt, rb)
        assert (r.sel_docs, r.sel_tokens, r.sel_bins) == (sd, st, sb)
        assert r.removed_docs == rd - sd >= 0
        assert r.removed_tokens == rt - st >= 0
        assert r.bins_saved == rb - sb >= 0
        assert r.removed_ppm == (rt - st) * 1_000_000 // rt


def test_simhash_threshold_sweep_reconciles(spark, sf_dir):
    """The sweep's row at the deployed cutoff must equal the detector's
    own output (shared plan), counts must be monotone in the cutoff,
    and affected docs can never exceed 2 pairs' worth of endpoints."""
    sweep = {
        r.threshold: r
        for r in dedup.simhash_threshold_sweep(spark, sf_dir).collect()
    }
    pairs = dedup.dedup_simhash_pairs(spark, sf_dir).collect()
    assert sweep[dedup.HAMMING_MAX].n_pairs == len(pairs)
    docs_at_max = {d for p in pairs for d in (p.id_a, p.id_b)}
    assert sweep[dedup.HAMMING_MAX].n_docs == len(docs_at_max)
    ts = sorted(sweep)
    assert ts == list(range(min(ts), min(ts) + len(ts)))
    for lo, hi in zip(ts, ts[1:]):
        assert sweep[lo].n_pairs <= sweep[hi].n_pairs
        assert sweep[lo].n_docs <= sweep[hi].n_docs
    for r in sweep.values():
        assert 0 < r.n_docs <= 2 * r.n_pairs


def test_preference_margin_histogram_reconciles(spark, sf_dir):
    """Histogram rows must partition the pairing exactly: per-lang pair
    counts sum back, every pair's margin falls inside its band's pow-2
    interval, and shares are the integer-div of the recounted sizes."""
    pairs = textops.preference_pairs(spark, sf_dir).collect()
    hist = textops.preference_margin_histogram(spark, sf_dir).collect()
    per_lang: dict[str, int] = {}
    for p in pairs:
        per_lang[p.lang] = per_lang.get(p.lang, 0) + 1
    assert sum(r.n_pairs for r in hist) == len(pairs)
    for r in hist:
        assert r.band_lo == 1 << r.margin_band
        assert r.band_lo <= r.min_margin <= r.max_margin < 2 * r.band_lo
        assert r.share_ppm == r.n_pairs * 1_000_000 // per_lang[r.lang]
    # recount one lang's bands purely in python
    lang = hist[0].lang
    expected: dict[int, int] = {}
    for p in pairs:
        if p.lang == lang:
            band = p.margin.bit_length() - 1
            expected[band] = expected.get(band, 0) + 1
    got = {r.margin_band: r.n_pairs for r in hist if r.lang == lang}
    assert got == expected


def test_preference_filtered_export_reconciles(spark, sf_dir):
    """The DPO export sheet must be exactly the band-cut fold of the
    repaired set: recompute per-lang log2 bands in Python, apply the
    documented edge rule (single-band lang counts as dropped_low),
    and match every count and the kept-margin extrema."""
    rep = textops.preference_pair_repair_plan(spark, sf_dir).collect()
    top = textops.PREF_MARGIN_MAX_POW + 1

    def band(m: int) -> int:
        return min(m.bit_length() - 1, top)  # margin >= 1 always

    by_lang: dict[str, list[int]] = {}
    for r in rep:
        by_lang.setdefault(r.lang, []).append(r.margin)
    rows = textops.preference_filtered_export(spark, sf_dir).collect()
    assert {r.lang for r in rows} == set(by_lang)
    for r in rows:
        margins = by_lang[r.lang]
        bands = [band(m) for m in margins]
        lo, hi = min(bands), max(bands)
        assert (r.low_band, r.high_band) == (lo, hi)
        disp = [
            "dropped_low" if b == lo
            else "dropped_high" if b == hi
            else "kept"
            for b in bands
        ]
        assert r.n_pairs_in == len(margins)
        assert r.n_kept == disp.count("kept")
        assert r.n_dropped_low == disp.count("dropped_low")
        assert r.n_dropped_high == disp.count("dropped_high")
        assert r.n_kept + r.n_dropped_low + r.n_dropped_high == len(margins)
        assert r.kept_ppm == r.n_kept * 1_000_000 // r.n_pairs_in
        kept_m = [m for m, d in zip(margins, disp) if d == "kept"]
        assert r.min_kept_margin == (min(kept_m) if kept_m else -1)
        assert r.max_kept_margin == (max(kept_m) if kept_m else -1)
    # the filter keeps something somewhere (the fixture set spans >2
    # bands in at least one language) — guards against a degenerate
    # all-dropped sheet silently passing
    assert sum(r.n_kept for r in rows) > 0


def test_margin_filter_edge_rules_synthetic(spark):
    """The per-lang band-cut edge rules on synthetic input — the
    fixture corpus only exercises the multi-band path:

    - 'one': a single occupied band (margins 16..31 are all band 4) →
      everything dropped_low, nothing dropped_high, kept extrema −1;
    - 'two': exactly two bands → both cut, nothing kept;
    - 'tri': three bands → only the interior band survives, extrema
      are the interior band's exact min/max.
    """
    rows = (
        [("one", m) for m in (16, 20, 31)]
        + [("two", 3), ("two", 2), ("two", 5)]
        + [("tri", 1), ("tri", 2), ("tri", 3), ("tri", 4), ("tri", 9)]
    )
    rep = spark.createDataFrame(rows, "lang string, margin long")
    out = {
        r.lang: r
        for r in textops._margin_filtered_export(rep).collect()
    }
    one = out["one"]
    assert (one.low_band, one.high_band) == (4, 4)
    assert (one.n_kept, one.n_dropped_low, one.n_dropped_high) == (0, 3, 0)
    assert (one.min_kept_margin, one.max_kept_margin) == (-1, -1)
    assert one.kept_ppm == 0
    two = out["two"]
    # margins 2,3 are band 1; margin 5 is band 2 — two occupied bands
    assert (two.low_band, two.high_band) == (1, 2)
    assert (two.n_kept, two.n_dropped_low, two.n_dropped_high) == (0, 2, 1)
    assert (two.min_kept_margin, two.max_kept_margin) == (-1, -1)
    tri = out["tri"]
    # bands: 1->0, 2,3->1, 4,9->2,3 ... margins 1(b0) 2,3(b1) 4(b2) 9(b3)
    assert (tri.low_band, tri.high_band) == (0, 3)
    assert (tri.n_kept, tri.n_dropped_low, tri.n_dropped_high) == (3, 1, 1)
    assert (tri.min_kept_margin, tri.max_kept_margin) == (2, 4)
    assert tri.kept_ppm == 3 * 1_000_000 // 5


def test_preference_export_manifest_reconciles(spark, sf_dir):
    """The writer manifest must file EXACTLY the pairs the decision
    sheet keeps: per lang, sum(n_pairs) over shards == the sheet's
    n_kept, shards stay in [0, PREF_EXPORT_SHARDS), per-unit margin
    ranges sit inside the sheet's kept range, repaired counts
    reconcile with the repair plan's kept-side provenance, and a
    pure-Python re-shard of the kept pairs matches every cell."""
    sheet = {
        r.lang: r
        for r in textops.preference_filtered_export(spark, sf_dir).collect()
    }
    man = textops.preference_export_manifest(spark, sf_dir).collect()
    per_lang_pairs: dict[str, int] = {}
    per_lang_rep: dict[str, int] = {}
    for r in man:
        assert 0 <= r.shard < textops.PREF_EXPORT_SHARDS
        assert r.n_pairs >= 1
        assert 0 <= r.n_repaired <= r.n_pairs
        s = sheet[r.lang]
        assert s.min_kept_margin <= r.min_margin <= r.max_margin
        assert r.max_margin <= s.max_kept_margin
        assert r.first_chosen_doc_id <= r.last_chosen_doc_id
        per_lang_pairs[r.lang] = per_lang_pairs.get(r.lang, 0) + r.n_pairs
        per_lang_rep[r.lang] = per_lang_rep.get(r.lang, 0) + r.n_repaired
    for lang, s in sheet.items():
        assert per_lang_pairs.get(lang, 0) == s.n_kept
    # python re-shard of the kept pairs (band rule + md5 mod S)
    rep = textops.preference_pair_repair_plan(spark, sf_dir).collect()
    top = textops.PREF_MARGIN_MAX_POW + 1

    def band(m: int) -> int:
        return min(m.bit_length() - 1, top)

    cuts: dict[str, tuple[int, int]] = {}
    for lang in {r.lang for r in rep}:
        bands = [band(r.margin) for r in rep if r.lang == lang]
        cuts[lang] = (min(bands), max(bands))
    cells: dict[tuple[str, int], list] = {}
    n_rep: dict[tuple[str, int], int] = {}
    for r in rep:
        lo, hi = cuts[r.lang]
        if band(r.margin) in (lo, hi):
            continue
        h = int(
            hashlib.md5(
                f"prefexport:{r.chosen_doc_id}".encode()
            ).hexdigest()[:15],
            16,
        )
        key = (r.lang, h % textops.PREF_EXPORT_SHARDS)
        cells.setdefault(key, []).append(r)
        if r.provenance == "repaired":
            n_rep[key] = n_rep.get(key, 0) + 1
    assert {(r.lang, r.shard) for r in man} == set(cells)
    for r in man:
        got = cells[(r.lang, r.shard)]
        assert r.n_pairs == len(got)
        assert r.n_repaired == n_rep.get((r.lang, r.shard), 0)
        assert r.min_margin == min(p.margin for p in got)
        assert r.max_margin == max(p.margin for p in got)
        assert r.first_chosen_doc_id == min(p.chosen_doc_id for p in got)
        assert r.last_chosen_doc_id == max(p.chosen_doc_id for p in got)


def test_export_version_delta_reconciles(spark, sf_dir):
    """The cross-version delta's books must balance: per shard the
    manifest deltas equal the membership churn (v1 − v ≡ added −
    removed, docs AND tokens), the v+1 side is exactly the published
    export manifest's per-shard fold, and the v side re-selects ONLY
    from non-batch docs (no src0 doc can appear in removed — src0
    never existed in v... it CAN appear in added)."""
    from kafka_exercise_spark.operators import sampling

    rows = sampling.export_version_delta(spark, sf_dir).collect()
    assert 1 <= len(rows) <= sampling.PACK_SHARDS
    for r in rows:
        assert r.v1_docs - r.v_docs == r.added_docs - r.removed_docs
        assert r.v1_tokens - r.v_tokens == r.added_tokens - r.removed_tokens
        base = (
            (r.added_tokens + r.removed_tokens) * 1_000_000 // r.v_tokens
            if r.v_tokens > 0
            else 0
        )
        assert r.churn_ppm == base
    # v+1 side == the published export manifest folded per shard
    pub = {}
    for m in sampling.export_shard_manifest(spark, sf_dir).collect():
        d, t, b = pub.get(m.shard, (0, 0, 0))
        pub[m.shard] = (d + m.n_docs, t + m.bin_tokens, b + 1)
    assert {r.shard: (r.v1_docs, r.v1_tokens, r.v1_bins) for r in rows} == pub
    # the arriving batch really moves mass: some src0 doc is selected
    # in v+1 (added), and v was computed without src0 entirely
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src0 = {
        r.doc_id
        for r in docs.filter(F.col("source") == "src0")
        .select("doc_id")
        .collect()
    }
    sel_v = {
        r.doc_id
        for r in sampling._version_selected_frame(spark, sf_dir).collect()
    }
    assert not (sel_v & src0)
    assert sum(r.added_docs for r in rows) >= 1


def test_weighted_sel_sql_builder_matches_published_oracle(sf_dir):
    """The parameterized selection SQL builder at docs_where=TRUE must
    be value-equal to the published composed token_budget_weighted
    oracle — the pin that lets the cross-version delta share one
    selection definition without rebuilding the green oracle's text."""
    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    built = entrymod._weighted_sel_sql(
        "TRUE",
        entrymod._comps_reach_sql(
            "SELECT id_a, id_b FROM verified WHERE jaccard >= 0.08"
        ),
    )
    published = entrymod.oracle_sql()["token_budget_weighted"]
    a = con.sql(
        f"SELECT * FROM ({built}) ORDER BY source, doc_id"
    ).fetchall()
    b = con.sql(
        f"SELECT * FROM ({published}) ORDER BY source, doc_id"
    ).fetchall()
    assert a == b
    assert len(a) > 0


def test_bucket_version_delta_reconciles(spark, sf_dir):
    """The bucket-grain version delta's books must balance per bucket
    (v1 − v ≡ added − removed in docs AND capped tokens), the v+1 side
    must equal the published bucket export manifest's per-bucket fold,
    and every bucket must be a ladder rung."""
    from kafka_exercise_spark.operators import sampling

    rows = sampling.bucket_version_delta(spark, sf_dir).collect()
    assert 1 <= len(rows) <= len(sampling.LENGTH_BUCKETS)
    for r in rows:
        assert r.bucket in sampling.LENGTH_BUCKETS
        assert r.v1_docs - r.v_docs == r.added_docs - r.removed_docs
        assert r.v1_tokens - r.v_tokens == r.added_tokens - r.removed_tokens
        expect = (
            (r.added_tokens + r.removed_tokens) * 1_000_000 // r.v_tokens
            if r.v_tokens > 0
            else 0
        )
        assert r.churn_ppm == expect
    pub = {}
    for m in sampling.bucket_export_manifest(spark, sf_dir).collect():
        d, t, b = pub.get(m.bucket, (0, 0, 0))
        pub[m.bucket] = (d + m.n_seqs, t + m.real_tokens, b + 1)
    assert {
        r.bucket: (r.v1_docs, r.v1_tokens, r.v1_batches) for r in rows
    } == pub


def test_pref_repaired_sql_builder_matches_published_oracle(sf_dir):
    """The parameterized repaired-preference SQL builder at
    docs_where=TRUE with the published component oracle must be
    value-equal to the published composed repair-plan oracle — the pin
    that lets the cross-version preference delta share one repair
    definition without rebuilding the green oracle's text."""
    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    oracles = entrymod.oracle_sql()
    built = entrymod._pref_repaired_sql(
        "TRUE",
        oracles["classifier_quality_score"],
        entrymod._comps_reach_sql(
            "SELECT id_a, id_b FROM verified WHERE jaccard >= 0.08"
        ),
    )
    published = oracles["preference_pair_repair_plan"]
    order = "ORDER BY lang, provenance, pair_idx"
    a = con.sql(f"SELECT * FROM ({built}) {order}").fetchall()
    b = con.sql(f"SELECT * FROM ({published}) {order}").fetchall()
    assert a == b
    assert len(a) > 0


def test_preference_version_delta_reconciles(spark, sf_dir):
    """The preference version delta's books must balance per lang
    (v1 − v ≡ added − removed in kept pairs AND margin mass), the v+1
    side must agree with the published filtered-export sheet (counts
    and band cuts), and churn_ppm / cut_moved must follow their pinned
    arithmetic."""
    from kafka_exercise_spark.operators import textops

    rows = textops.preference_version_delta(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.v1_kept - r.v_kept == r.added_pairs - r.removed_pairs
        assert (
            r.v1_margin_sum - r.v_margin_sum
            == r.added_margin_sum - r.removed_margin_sum
        )
        expect_churn = (
            (r.added_pairs + r.removed_pairs) * 1_000_000 // r.v_kept
            if r.v_kept > 0
            else 0
        )
        assert r.churn_ppm == expect_churn
        expect_moved = int(
            r.v_low_band != r.v1_low_band
            or r.v_high_band != r.v1_high_band
        )
        assert r.cut_moved == expect_moved
    sheet = {
        s.lang: (s.n_kept, s.low_band, s.high_band)
        for s in textops.preference_filtered_export(spark, sf_dir).collect()
    }
    mine = {
        r.lang: (r.v1_kept, r.v1_low_band, r.v1_high_band)
        for r in rows
        if r.v1_low_band != -1  # langs absent at v+1 have no sheet row
    }
    assert mine == sheet
