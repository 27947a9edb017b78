"""Property tests for the entity-resolution, graph, and bigram-LM ops.

Semantic properties only — cross-engine value equality is covered by the
oracle entries in ``__spark_entry__`` (driven by tools/verify_local.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_exercise_spark.operators import entityres, graph, textops


# ---------------------------------------------------------------- ER ----


def test_er_blocking_has_full_recall_vs_brute_force(spark, sf_dir):
    """Delete-1 blocking must find EVERY distance-≤1 pair the quadratic
    scan finds (pigeonhole completeness), and nothing beyond the verify
    threshold. Brute force is affordable at sf0.001."""
    from kafka_exercise_spark.catalog import load_table

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    a = cust.select(
        F.col("c_custkey").alias("ka"), F.col("c_name").alias("na"),
        F.col("c_nationkey").alias("nation_a"),
    )
    b = cust.select(
        F.col("c_custkey").alias("kb"), F.col("c_name").alias("nb"),
        F.col("c_nationkey").alias("nation_b"),
    )
    brute = (
        a.crossJoin(b)
        .where(F.col("ka") < F.col("kb"))
        .where(F.levenshtein("na", "nb") <= entityres.ER_MAX_DIST)
        .groupBy("nation_a", "nation_b")
        .agg(
            F.count("*").alias("n_pairs"),
            F.min("ka").alias("min_custkey_a"),
            F.max("kb").alias("max_custkey_b"),
        )
    )
    got = {tuple(r) for r in entityres.er_fuzzy_pairs(spark, sf_dir).collect()}
    want = {tuple(r) for r in brute.collect()}
    assert got == want and len(want) > 0


def test_er_pairs_are_truly_within_distance(spark):
    """Hand-built frame: a substitution pair, an insertion pair, and a
    far pair — only the first two survive blocking + verify."""
    df = spark.createDataFrame(
        [(1, "alpha", 0), (2, "alpra", 0), (3, "alphaz", 1), (4, "omega", 1)],
        "c_custkey long, c_name string, c_nationkey int",
    )
    orig = entityres.load_table
    try:
        entityres.load_table = lambda s, d, n: df
        out = entityres.er_fuzzy_pairs(spark, "hand-er").collect()
    finally:
        entityres.load_table = orig
    pairs = {(r.min_custkey_a, r.max_custkey_b) for r in out}
    total = sum(r.n_pairs for r in out)
    assert total == 2  # (1,2) substitution and (1,3) insertion
    assert (1, 3) in pairs


# ------------------------------------------------------------- graph ----


def test_pagerank_mass_and_determinism(spark, sf_dir):
    """Ranks are positive integers bounded by the initial mass (damping
    only shrinks total mass), items dominate users (items aggregate many
    users' mass), and the result is bit-stable across runs."""
    r1 = graph.graph_pagerank(spark, sf_dir).collect()
    r2 = graph.graph_pagerank(spark, sf_dir).collect()
    assert r1 == r2
    assert len(r1) == graph.TOP_NODES
    ranks = [r.rank for r in r1]
    assert ranks == sorted(ranks, reverse=True)
    # every rank carries at least the teleport base term, and the node
    # encoding round-trips (even=user, odd=item)
    assert all(r.rank >= graph.PR_BASE for r in r1)
    assert all(
        r.node == 2 * r.entity_id + (1 if r.node_type == "item" else 0)
        for r in r1
    )


def test_pagerank_uniform_graph_is_uniform(spark):
    """On a regular graph (perfect matching, all degrees equal) every
    node must end with the identical rank — any spread means the
    arithmetic leaked asymmetry."""
    df = spark.createDataFrame(
        [(i, f'{{"k": {i}}}') for i in range(8)], "user_id long, props string"
    )
    orig = graph.load_table
    try:
        graph.load_table = lambda s, d, n: df
        out = graph.graph_pagerank(spark, "hand-pagerank").collect()
    finally:
        graph.load_table = orig
    assert len({r.rank for r in out}) == 1


# --------------------------------------------------------- bigram LM ----


def test_bigram_lm_flags_scrambled_sequences(spark, sf_dir):
    """A document's bigram cross-entropy is finite, positive, and docs
    with fewer than 2 tokens are excluded."""
    out = textops.lm_bigram_score(spark, sf_dir)
    rows = out.collect()
    assert all(r.n_bigrams >= 1 for r in rows)
    assert all(r.cross_entropy_nats >= 0 for r in rows)
    assert all(r.perplexity >= 1.0 for r in rows)


def test_bigram_lm_orders_salad_above_fluent(spark):
    """The conditional model must score an unseen word ORDER worse than a
    repeated seen order, even when unigram contents are identical — the
    exact failure mode the unigram model cannot see."""
    fluent = "the cat sat on the mat " * 5
    salad = "mat the on sat cat the " + "the cat sat on the mat " * 4
    df = spark.createDataFrame(
        [(0, fluent), (1, fluent), (2, fluent), (3, salad)],
        "doc_id long, text string",
    )
    orig = textops.load_table
    try:
        textops.load_table = lambda s, d, n: df
        # unique placeholder dir: lm_bigram_score memoizes per sf_dir
        rows = {
            r.doc_id: r
            for r in textops.lm_bigram_score(spark, "hand-bigram").collect()
        }
    finally:
        textops.load_table = orig
    assert rows[3].cross_entropy_nats > rows[0].cross_entropy_nats


def test_delete1_blocking_complete_by_property():
    """Pure-Python pigeonhole check, hypothesis-driven: ANY two ASCII
    strings within Levenshtein distance 1 share at least one delete-1
    variant (the completeness the blocked join's recall rests on) — and
    the variant generator matches the Spark/DuckDB expression semantics
    (string itself + each delete-one-char form)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def variants(s: str) -> set:
        return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    alpha = st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=0,
        max_size=12,
    )

    @settings(max_examples=300, deadline=None)
    @given(alpha, st.integers(0, 12), st.sampled_from(["sub", "ins", "del", "far"]))
    def check(s, pos, kind):
        if kind == "sub" and s:
            i = pos % len(s)
            t = s[:i] + chr(33 + (ord(s[i]) - 32) % 94) + s[i + 1 :]
        elif kind == "ins":
            i = pos % (len(s) + 1)
            t = s[:i] + "#" + s[i:]
        elif kind == "del" and s:
            i = pos % len(s)
            t = s[:i] + s[i + 1 :]
        else:
            t = s + "XYZQ"  # distance > 1 unless s is pathological
        d = lev(s, t)
        share = bool(variants(s) & variants(t))
        if d <= 1:
            assert share, (s, t)
        # (sharing a variant with d==2 is possible — blocking over-candidates,
        # the verify step prunes; only MISSING a true pair would be a bug)

    check()
