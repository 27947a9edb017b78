"""Deterministic sampling / splitting / mixing + decontamination.

These are correctness properties of the hash-bucket design (reproducibility,
disjointness, rate realization) plus the plan-shape facts that make them
100 TB-safe (map-side only, no Python, benchmark side broadcast).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_exercise_spark.operators import dedup, sampling
from kafka_exercise_spark.plans import (
    broadcast_join_count,
    python_eval_count,
    shuffle_exchange_count,
)


def test_sample_is_deterministic_and_rate_bounded(spark, sf_dir):
    a = sampling.sample_hash_stratified(spark, sf_dir).collect()
    b = sampling.sample_hash_stratified(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    for row in a:
        assert 0 <= row.n_sampled <= row.n_docs
        assert row.rate_pct in (5, 10, 15, 20)


def test_split_partitions_corpus_disjointly(spark, sf_dir):
    rows = {r.split: r for r in sampling.split_train_valid_test(spark, sf_dir).collect()}
    from kafka_exercise_spark.catalog import load_table

    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows.values()) == total
    assert rows["train"].n_docs > rows["valid"].n_docs
    assert rows["train"].n_docs > rows["test"].n_docs


def test_resample_multiplies_by_weight(spark, sf_dir):
    for r in sampling.domain_mix_resample(spark, sf_dir).collect():
        assert r.n_rows_out == r.n_docs_in * r.weight
        assert r.weight in (1, 2, 3)


def test_sampling_ops_are_map_side_single_agg(spark, sf_dir):
    """One scan, only the audit-agg shuffles, zero Python — per op.

    Ops with a distinct aggregate (n_sources / n_docs_in) plan the standard
    two-phase distinct: partial-distinct exchange on (group, distinct key)
    then the final group exchange — both over the tiny audit rows, never a
    re-shuffle of the corpus. Hence the bound is 2, not 1.
    """
    for fn in (
        sampling.sample_hash_stratified,
        sampling.split_train_valid_test,
        sampling.domain_mix_resample,
    ):
        df = fn(spark, sf_dir)
        assert python_eval_count(df) == 0, fn.__name__
        assert shuffle_exchange_count(df) <= 2, fn.__name__


def test_decontaminate_broadcasts_benchmark_index(spark, sf_dir):
    """The eval-set inverted index broadcasts; the corpus is never
    self-joined or shuffled by shingle."""
    df = dedup.decontaminate_ngram(spark, sf_dir)
    assert python_eval_count(df) == 0
    assert broadcast_join_count(df) >= 1
    rows = df.collect()
    for r in rows:
        assert r.n_shared >= dedup.DECONTAM_MIN_SHARED
        assert r.bench_id < dedup.BENCHMARK_MAX_DOC_ID <= r.doc_id


def test_domain_cap_bounds_and_determinism(spark, sf_dir):
    a = sampling.domain_cap(spark, sf_dir).collect()
    b = sampling.domain_cap(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_source: dict[str, list[int]] = {}
    for r in a:
        per_source.setdefault(r.source, []).append(r.keep_rank)
    for source, ranks in per_source.items():
        assert len(ranks) <= sampling.DOMAIN_CAP, source
        # ranks are contiguous from 1 — row_number, not rank-with-gaps
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), source


def test_global_shuffle_is_a_permutation(spark, sf_dir):
    from kafka_exercise_spark.catalog import load_table

    rows = sampling.global_shuffle(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "documents").count()
    # every doc appears exactly once
    assert len(rows) == total
    assert len({r.doc_id for r in rows}) == total
    # per-shard positions are contiguous from 1 (shards concatenate into
    # one total order with no gaps)
    shards: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r.shard < sampling.SHUFFLE_SHARDS
        shards.setdefault(r.shard, []).append(r.position)
    for shard, pos in shards.items():
        assert sorted(pos) == list(range(1, len(pos) + 1)), shard
    # deterministic across reruns
    again = sampling.global_shuffle(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # ... and genuinely shuffled: doc_id order != position order in shard 0
    s0 = sorted((r.position, r.doc_id) for r in rows if r.shard == 0)
    assert [d for _, d in s0] != sorted(d for _, d in s0)


def test_cap_and_shuffle_plans_stay_jvm_side(spark, sf_dir):
    for fn in (sampling.domain_cap, sampling.global_shuffle):
        df = fn(spark, sf_dir)
        assert python_eval_count(df) == 0, fn.__name__
        # one hash-partition exchange for the window — never a global sort
        assert shuffle_exchange_count(df) == 1, fn.__name__


def test_token_budget_select_fills_greedily(spark, sf_dir):
    from kafka_exercise_spark.catalog import load_table
    from kafka_exercise_spark.functions.text import tokens

    rows = sampling.token_budget_select(spark, sf_dir).collect()
    budget = sampling.LANG_TOKEN_BUDGET
    per_lang: dict[str, list] = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r)
    docs = load_table(spark, sf_dir, "documents")
    lang_totals = {
        r.lang: r.total
        for r in docs.groupBy("lang")
        .agg(F.sum(F.size(tokens(F.col("text")))).alias("total"))
        .collect()
    }
    for lang, kept in per_lang.items():
        # every kept doc STARTS within budget; at most one overshoots
        for r in kept:
            assert r.cum_tok - r.n_tok < budget, lang
        over = [r for r in kept if r.cum_tok >= budget]
        assert len(over) <= 1, lang
        # greedy fill: if the language has more tokens than the budget,
        # the fill reaches the budget (proper, non-trivial selection)
        if lang_totals[lang] > budget:
            assert max(r.cum_tok for r in kept) >= budget, lang
            assert len(kept) < sum(
                1 for _ in docs.filter(F.col("lang") == lang).collect()
            ), lang
    # deterministic across reruns
    again = sampling.token_budget_select(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_quality_quantile_filter_keeps_iqr_band(spark, sf_dir):
    from kafka_exercise_spark.catalog import load_table

    rows = sampling.quality_quantile_filter(spark, sf_dir).collect()
    totals = {
        r.lang: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    per_lang: dict[str, list] = {}
    for r in rows:
        assert r.q1_cpt <= r.milli_cpt <= r.q3_cpt
        per_lang.setdefault(r.lang, []).append(r)
    for lang, kept in per_lang.items():
        # an interquartile band keeps roughly half, never all or none
        frac = len(kept) / totals[lang]
        assert 0.25 <= frac <= 0.75, (lang, frac)


def test_mixture_ops_plans_stay_jvm_side(spark, sf_dir):
    budget = sampling.token_budget_select(spark, sf_dir)
    assert python_eval_count(budget) == 0
    # one hash-partition exchange for the per-lang window
    assert shuffle_exchange_count(budget) == 1
    band = sampling.quality_quantile_filter(spark, sf_dir)
    assert python_eval_count(band) == 0
    # quartiles aggregate (tiny) + broadcast back: the corpus side is
    # never re-shuffled
    assert broadcast_join_count(band) >= 1


def test_mixture_plan_allocates_budget(spark, sf_dir):
    rows = sampling.mixture_plan(spark, sf_dir).collect()
    budget = sampling.MIX_PLAN_BUDGET
    sum_w = sum(r.weight for r in rows)
    for r in rows:
        assert r.target_tokens == budget * r.weight // sum_w
        assert r.planned_tokens == min(r.avail_tokens, r.target_tokens)
        assert r.shortfall_tokens == r.target_tokens - r.planned_tokens
        assert 0 <= r.rate_bps <= 10_000
        assert r.rate_bps == r.planned_tokens * 10_000 // r.avail_tokens
    # floor allocation never exceeds the budget
    assert sum(r.target_tokens for r in rows) <= budget
    # the plan discriminates: at least one satisfied and, with the fixture
    # inventories, weights differ across sources
    assert len({r.weight for r in rows}) > 1


def test_weighted_sample_topn_shape_and_determinism(spark, sf_dir):
    from kafka_exercise_spark.operators.sampling import (
        ES_SAMPLE_N,
        weighted_sample_topn,
    )

    r1 = weighted_sample_topn(spark, sf_dir).collect()
    r2 = weighted_sample_topn(spark, sf_dir).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))
    per_src = {}
    for r in r1:
        per_src.setdefault(r.source, []).append(r)
        assert 1 <= r.rnk <= ES_SAMPLE_N and r.weight >= 1 and r.key_micro >= 0
    for rows in per_src.values():
        rows.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
        # ranks follow the A-ES key order
        keys = [r.key_micro for r in rows]
        assert keys == sorted(keys)


def test_weighted_sample_prefers_heavy_docs(spark, sf_dir):
    """The sampled docs' mean weight must exceed the corpus mean weight —
    the defining property of weighted (vs uniform) sampling."""
    from pyspark.sql import functions as F

    from kafka_exercise_spark.catalog import load_table
    from kafka_exercise_spark.functions.text import tokens
    from kafka_exercise_spark.operators.sampling import weighted_sample_topn

    sample_mean = (
        weighted_sample_topn(spark, sf_dir).agg(F.avg("weight")).first()[0]
    )
    corpus_mean = (
        load_table(spark, sf_dir, "documents")
        .select(F.size(tokens(F.col("text"))).alias("w"))
        .agg(F.avg("w"))
        .first()[0]
    )
    assert sample_mean > corpus_mean


def test_token_budget_weighted_composes_parents(spark, sf_dir):
    """The capstone's three contracts hold exactly: (1) membership =
    hash-Bernoulli at the doc's soft weight (recomputed bit-for-bit in
    pure Python), (2) each source's budget is the α=½ temperature share
    of the plan budget, (3) within a source the kept set is the greedy
    hash-order fill over the weighted survivors — and the whole thing is
    deterministic across reruns."""
    import hashlib

    from kafka_exercise_spark.catalog import load_table
    from kafka_exercise_spark.functions.text import tokens
    from kafka_exercise_spark.operators.dedup import dedup_soft_weights

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = sampling.token_budget_weighted(spark, sf_dir).collect()
    assert rows, "selection must be non-trivial at this sf"
    weights = {
        r.doc_id: r.weight_ppm
        for r in dedup_soft_weights(spark, sf_dir).collect()
    }
    budgets = {
        r.source: (r.share_ppm * sampling.MIX_PLAN_BUDGET) // 1_000_000
        for r in sampling.mixture_temperature_plan(spark, sf_dir)
        .filter(F.col("alpha_milli") == sampling.BUDGET_ALPHA_MILLI)
        .collect()
    }
    for r in rows:
        assert r.weight_ppm == weights[r.doc_id]
        assert h60(f"softdraw:{r.doc_id}") % 1_000_000 < r.weight_ppm
        assert r.budget_tokens == budgets[r.source]
        assert r.cum_tok - r.n_tok < r.budget_tokens
    # full greedy replay: survivors in hash order, kept while the
    # running total BEFORE the doc is under the source's budget
    docs = {
        r.doc_id: (r.source, r.n_tok)
        for r in load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
        )
        .collect()
    }
    survivors: dict[str, list] = {}
    for doc_id, (source, n_tok) in docs.items():
        if h60(f"softdraw:{doc_id}") % 1_000_000 < weights[doc_id]:
            survivors.setdefault(source, []).append(
                (h60(f"wbudget:{doc_id}"), doc_id, n_tok)
            )
    expected = set()
    for source, docs_s in survivors.items():
        cum = 0
        for _hk, doc_id, n_tok in sorted(docs_s):
            if cum < budgets[source]:
                expected.add(doc_id)
            cum += n_tok
    assert {r.doc_id for r in rows} == expected
    again = sampling.token_budget_weighted(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_token_budget_fill_report_reconciles(spark, sf_dir):
    """The utilization sheet reconciles exactly with its parents: kept
    counts/tokens re-aggregate the selection, the survivor pool is the
    draw recomputed, fill/unfilled/overshoot follow the integer
    definitions, and every source with kept rows appears."""
    kept = sampling.token_budget_weighted(spark, sf_dir).collect()
    rows = {r.source: r for r in sampling.token_budget_fill_report(spark, sf_dir).collect()}
    by_src: dict[str, list] = {}
    for r in kept:
        by_src.setdefault(r.source, []).append(r)
    assert set(rows) == set(by_src)
    for source, ks in by_src.items():
        r = rows[source]
        assert r.n_kept == len(ks)
        assert r.kept_tokens == sum(k.n_tok for k in ks)
        assert r.budget_tokens == ks[0].budget_tokens
        assert r.n_survivors >= r.n_kept
        assert r.survivor_tokens >= r.kept_tokens
        assert r.fill_ppm == r.kept_tokens * 1_000_000 // r.budget_tokens
        assert r.unfilled_tokens == max(r.budget_tokens - r.kept_tokens, 0)
        assert r.overshoot_tokens == max(r.kept_tokens - r.budget_tokens, 0)
        # exactly one of the two failure directions can be nonzero
        assert r.unfilled_tokens == 0 or r.overshoot_tokens == 0
        # greedy fill invariant: unfilled > 0 only when the pool ran dry
        if r.unfilled_tokens > 0:
            assert r.n_kept == r.n_survivors


def test_length_bucket_plan_prices_padding_exactly(spark, sf_dir):
    from kafka_exercise_spark.catalog import load_table

    rows = sampling.length_bucket_plan(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        assert r.bucket in sampling.LENGTH_BUCKETS
        # padded mass is the per-slot ceiling; waste is its exact ppm gap
        assert r.padded_mass == r.n_docs * r.bucket
        assert 0 <= r.token_mass <= r.padded_mass
        assert r.pad_waste_ppm == (
            (r.padded_mass - r.token_mass) * 1_000_000 // r.padded_mass
        )
        # batch shape: ceiling division, last batch possibly short
        assert r.seqs_per_batch == sampling.BUCKET_BATCH_TOKENS // r.bucket
        assert (r.n_batches - 1) * r.seqs_per_batch < r.n_docs
        assert r.n_docs <= r.n_batches * r.seqs_per_batch
        # truncation only exists in the top bucket
        if r.bucket != sampling.LENGTH_BUCKETS[-1]:
            assert r.n_truncated == 0


def test_output_shard_manifest_reconciles_with_packing(spark, sf_dir):
    packed = sampling.pack_sequences(spark, sf_dir)
    man = sampling.output_shard_manifest(spark, sf_dir)
    rows = man.collect()
    assert sum(r.n_docs for r in rows) == packed.count()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
        assert r.first_doc_id <= r.last_doc_id
        assert r.bin_tokens >= 0
        assert r.fill_ppm == (
            r.bin_tokens * 1_000_000 // sampling.PACK_BUDGET_TOKENS
        )
    # a doc spanning >= 2 budgets legitimately skips a bin (start-bin
    # attribution); only assert contiguity when the fixture has none
    max_tok = max(r.n_tok for r in packed.select("n_tok").collect())
    for shard, bins in by_shard.items():
        idx = sorted(b.seq_bin for b in bins)
        assert idx[0] == 0 and len(set(idx)) == len(idx)
        if max_tok < 2 * sampling.PACK_BUDGET_TOKENS:
            # bins are contiguous 0..max per shard (cumsum intervals)
            assert idx == list(range(len(idx)))
        # every bin except the shard's last starts a doc past the budget
        # boundary (fill >= 1e6 possible only via the overflow rule)
        for b in sorted(bins, key=lambda x: x.seq_bin)[:-1]:
            assert b.bin_tokens > 0


def test_layout_sheets_stay_jvm_side(spark, sf_dir):
    for df in (
        sampling.length_bucket_plan(spark, sf_dir),
        sampling.output_shard_manifest(spark, sf_dir),
    ):
        assert python_eval_count(df) == 0
    # one scan + one partial-agg shuffle (plus the family-standard
    # scale_partitions repartition): the bucket plan never joins.
    # Upper bound, not exact — AQE coalescing or a scale_partitions
    # tweak may legitimately drop an exchange without breaking the
    # one-scan + one-partial-agg contract.
    assert shuffle_exchange_count(
        sampling.length_bucket_plan(spark, sf_dir)
    ) <= 2


def test_packing_vs_bucketing_report_reconciles(spark, sf_dir):
    rows = {
        r.strategy: r
        for r in sampling.packing_vs_bucketing_report(
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {"packing", "bucketing"}
    packed = sampling.pack_sequences(spark, sf_dir)
    buckets = sampling.length_bucket_plan(spark, sf_dir).collect()
    pk, bu = rows["packing"], rows["bucketing"]
    # both strategies lay out the same corpus
    assert pk.n_docs == bu.n_docs == packed.count()
    assert pk.real_tokens == sum(
        r.n_tok for r in packed.select("n_tok").collect()
    )
    assert bu.real_tokens == sum(r.token_mass for r in buckets)
    assert bu.n_units == sum(r.n_batches for r in buckets)
    for r in (pk, bu):
        assert r.capacity_tokens >= r.real_tokens
        assert r.overhead_ppm == (
            (r.capacity_tokens - r.real_tokens)
            * 1_000_000
            // r.capacity_tokens
        )
    # NOT asserted: pk.overhead_ppm <= bu.overhead_ppm. It holds on the
    # fixtures (and usually in practice), but it is not a theorem — a
    # corpus of exact power-of-two doc lengths in full batches gives
    # bucketing zero overhead while packing still pays last-sequence
    # underfill. The sheet reports; it doesn't promise an ordering.


def test_export_shard_manifest_packs_exactly_the_selection(spark, sf_dir):
    sel = sampling.token_budget_weighted(spark, sf_dir).collect()
    man = sampling.export_shard_manifest(spark, sf_dir).collect()
    # the export covers exactly the selection's docs and token mass
    assert sum(r.n_docs for r in man) == len(sel)
    assert sum(r.bin_tokens for r in man) == sum(r.n_tok for r in sel)
    # strictly smaller than the raw-corpus manifest (curation removed mass)
    raw = sampling.output_shard_manifest(spark, sf_dir).collect()
    assert sum(r.bin_tokens for r in man) < sum(r.bin_tokens for r in raw)
    # per-shard bins start at 0 and are unique; contiguity only when no
    # selected doc spans >= 2 budgets (start-bin attribution skips bins)
    max_tok = max(r.n_tok for r in sel)
    by_shard: dict[int, list[int]] = {}
    for r in man:
        by_shard.setdefault(r.shard, []).append(r.seq_bin)
        assert r.fill_ppm == (
            r.bin_tokens * 1_000_000 // sampling.PACK_BUDGET_TOKENS
        )
    for bins in by_shard.values():
        idx = sorted(bins)
        assert idx[0] == 0 and len(set(idx)) == len(idx)
        if max_tok < 2 * sampling.PACK_BUDGET_TOKENS:
            assert idx == list(range(len(idx)))


def test_bucket_batch_manifest_reconciles_with_plan(spark, sf_dir):
    """The manifest must partition the economics sheet exactly: per
    bucket, Σ n_seqs = n_docs and max(batch_idx)+1 = n_batches; every
    non-final batch is full; padded mass and pad ppm are exact."""
    plan = {
        r.bucket: r
        for r in sampling.length_bucket_plan(spark, sf_dir).collect()
    }
    rows = sampling.bucket_batch_manifest(spark, sf_dir).collect()
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert set(by_bucket) == set(plan)
    for bucket, batches in by_bucket.items():
        p = plan[bucket]
        assert sum(b.n_seqs for b in batches) == p.n_docs
        assert max(b.batch_idx for b in batches) + 1 == p.n_batches
        assert sum(b.real_tokens for b in batches) == p.token_mass
        spb = sampling.BUCKET_BATCH_TOKENS // bucket
        for b in sorted(batches, key=lambda x: x.batch_idx)[:-1]:
            assert b.n_seqs == spb  # only the last batch may be short
        for b in batches:
            assert b.padded_tokens == b.n_seqs * bucket
            assert b.pad_ppm == (
                (b.padded_tokens - b.real_tokens)
                * 1_000_000
                // b.padded_tokens
            )
            assert b.first_doc_id <= b.last_doc_id


def test_bucket_export_manifest_reconciles_with_selection(spark, sf_dir):
    """The bucketed export manifest must partition the weighted
    selection exactly (same rule as the raw manifest, over survivors
    only): Σ n_seqs = |selection|, Σ real_tokens = Σ capped n_tok,
    strictly less mass than the raw bucket manifest, non-final batches
    full, pad arithmetic exact."""
    sel = sampling.token_budget_weighted(spark, sf_dir).collect()
    cap = sampling.LENGTH_BUCKETS[-1]
    rows = sampling.bucket_export_manifest(spark, sf_dir).collect()
    assert sum(r.n_seqs for r in rows) == len(sel)
    assert sum(r.real_tokens for r in rows) == sum(
        min(r.n_tok, cap) for r in sel
    )
    raw = sampling.bucket_batch_manifest(spark, sf_dir).collect()
    assert sum(r.real_tokens for r in rows) < sum(
        r.real_tokens for r in raw
    )
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    for bucket, batches in by_bucket.items():
        spb = sampling.BUCKET_BATCH_TOKENS // bucket
        idx = sorted(b.batch_idx for b in batches)
        assert idx == list(range(len(idx)))  # dense renumbering
        for b in sorted(batches, key=lambda x: x.batch_idx)[:-1]:
            assert b.n_seqs == spb
        for b in batches:
            assert b.padded_tokens == b.n_seqs * bucket
            assert b.pad_ppm == (
                (b.padded_tokens - b.real_tokens)
                * 1_000_000
                // b.padded_tokens
            )


def test_bucket_export_delta_reconciles(spark, sf_dir):
    """The bucket delta must be exactly the per-bucket fold of its two
    parent manifests, with non-negative removals (the bucket of a doc
    is identical in both corpora: same tokenizer, same rungs)."""

    def fold(df):
        agg = {}
        for r in df.collect():
            d, t, b = agg.get(r.bucket, (0, 0, 0))
            agg[r.bucket] = (d + r.n_seqs, t + r.real_tokens, b + 1)
        return agg

    raw = fold(sampling.bucket_batch_manifest(spark, sf_dir))
    sel = fold(sampling.bucket_export_manifest(spark, sf_dir))
    delta = sampling.bucket_export_delta(spark, sf_dir).collect()
    assert {r.bucket for r in delta} == set(raw)
    for r in delta:
        rd, rt, rb = raw[r.bucket]
        sd, st, sb = sel.get(r.bucket, (0, 0, 0))
        assert (r.raw_docs, r.raw_tokens, r.raw_batches) == (rd, rt, rb)
        assert (r.sel_docs, r.sel_tokens, r.sel_batches) == (sd, st, sb)
        assert r.removed_docs == rd - sd >= 0
        assert r.removed_tokens == rt - st >= 0
        assert r.removed_ppm == (rt - st) * 1_000_000 // rt


def test_packing_vs_bucketing_selected_reconciles(spark, sf_dir):
    """The selected-corpus decision sheet must be exactly the fold of
    its parents: packing row from the selection's packed layout
    (per-shard ceiling units), bucketing row from the selected bucket
    manifest (batches reserved full); capacity >= real mass on both
    rows and the ppm arithmetic exact; doc counts equal across the two
    strategies (same survivor set)."""
    budget = sampling.PACK_BUDGET_TOKENS
    sel = sampling.token_budget_weighted(spark, sf_dir).collect()
    by_shard: dict[int, int] = {}
    for r in sel:
        by_shard[r.doc_id % sampling.PACK_SHARDS] = (
            by_shard.get(r.doc_id % sampling.PACK_SHARDS, 0) + r.n_tok
        )
    exp_units = sum((t + budget - 1) // budget for t in by_shard.values())
    man = sampling.bucket_export_manifest(spark, sf_dir).collect()
    rows = {
        r.strategy: r
        for r in sampling.packing_vs_bucketing_selected_report(
            spark, sf_dir
        ).collect()
    }
    pk, bk = rows["packing"], rows["bucketing"]
    assert pk.n_docs == bk.n_docs == len(sel)
    assert pk.n_units == exp_units
    assert pk.capacity_tokens == exp_units * budget
    assert pk.real_tokens == sum(t for t in by_shard.values())
    assert bk.n_units == len(man)
    assert bk.real_tokens == sum(r.real_tokens for r in man)
    assert bk.capacity_tokens == sum(
        (sampling.BUCKET_BATCH_TOKENS // r.bucket) * r.bucket for r in man
    )
    for r in (pk, bk):
        assert r.capacity_tokens >= r.real_tokens
        assert r.overhead_ppm == (
            (r.capacity_tokens - r.real_tokens)
            * 1_000_000
            // r.capacity_tokens
        )
