"""Property tests for the cross-engine exactness primitives.

Everything the integer-oracle strategy rests on is checked here directly:
the fixed-point micro-cosine must be BIT-identical between Spark and
DuckDB on adversarial random vectors (not just on the fixture's), and the
all-integer Lloyd fit must match an independent arbitrary-precision
reimplementation (guarding against silent int64 overflow in the numpy
path — Python ints cannot wrap).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from kafka_exercise_spark.operators import similarity


def _random_int_vectors(n: int, dim: int, seed: int, scale: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(-scale, scale + 1, size=(n, dim), dtype=np.int64)


def test_int_cos_e6_bit_identical_spark_vs_duckdb(spark):
    """300 adversarial random quantized pairs (full ±2^20 range, far worse
    conditioned than unit embeddings): Spark's int_cos_e6 and the DuckDB
    twin must agree EXACTLY on every pair — the invariant that makes the
    semantic dedup/decontam oracles hash-stable at any corpus size."""
    import __spark_entry__ as entrymod

    n, dim = 300, similarity.EMBED_DIM
    a = _random_int_vectors(n, dim, 1, similarity.PROJ_SCALE)
    b = _random_int_vectors(n, dim, 2, similarity.PROJ_SCALE)
    # one zero vector exercises the ss=0 guard on both sides
    a[0][:] = 0
    rows = [(i, a[i].tolist(), b[i].tolist()) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, ea array<long>, eb array<long>")
    got_spark = {
        r.id: r.c
        for r in df.select(
            "id",
            similarity.int_cos_e6(
                df.ea.cast("array<long>"), df.eb.cast("array<long>")
            ).alias("c"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {a[i].tolist()}::BIGINT[], {b[i].tolist()}::BIGINT[])"
            for i in range(n)
        )
        + ") v(id, ea, eb)"
    )
    expr = entrymod._int_cos_e6_sql("ea", "eb")
    got_duck = dict(con.execute(f"SELECT id, {expr} FROM t").fetchall())
    assert got_spark == got_duck
    assert got_spark[0] == 0  # zero-norm guard


def test_integer_lloyd_matches_arbitrary_precision_reimpl():
    """The numpy int64 fit must equal a from-scratch pure-Python-int
    reimplementation (which CANNOT overflow) — pins both the tie-break
    (lowest cell) and the floor-division update semantics, and proves the
    int64 path has headroom at the full quantization range."""
    x = _random_int_vectors(400, 16, 7, similarity.PROJ_SCALE)
    k, iters = 8, 4
    got = similarity._integer_lloyd(x.copy(), k, iters)

    pts = [[int(v) for v in row] for row in x]
    centers = [list(p) for p in pts[:k]]
    for _ in range(iters):
        groups: dict[int, list[list[int]]] = {}
        for p in pts:
            best = min(
                range(len(centers)),
                key=lambda c: (
                    sum((a - b) * (a - b) for a, b in zip(p, centers[c])),
                    c,
                ),
            )
            groups.setdefault(best, []).append(p)
        for c, members in groups.items():
            centers[c] = [
                sum(col) // len(members) for col in zip(*members)
            ]
    assert got == centers


def test_quantized_vec_matches_python_half_up(spark):
    """Spark's round(x·2^20) quantization must match HALF-UP (away from
    zero) — the convention every oracle interpolates via DuckDB round()."""
    vals = [0.5 / similarity.PROJ_SCALE, -0.5 / similarity.PROJ_SCALE,
            1.5 / similarity.PROJ_SCALE, -1.5 / similarity.PROJ_SCALE,
            0.123456789, -0.987654321, 1.0, -1.0]
    df = spark.createDataFrame([(vals,)], "v array<double>")
    (got,) = df.select(similarity.quantized_vec(df.v).alias("q")).collect()
    con = duckdb.connect()
    (want,) = con.execute(
        f"SELECT list_transform({vals}::DOUBLE[], "
        f"x -> round(x * {similarity.PROJ_SCALE})::BIGINT)"
    ).fetchone()
    assert list(got.q) == list(want)
    # the .5 boundaries round away from zero on both engines
    assert got.q[0] == 1 and got.q[1] == -1
    assert got.q[2] == 2 and got.q[3] == -2


def test_tokenizer_parity_on_adversarial_whitespace(spark):
    """The tokenizer is the foundation of every text oracle: Spark's split
    and the DuckDB _TOKS fragment must agree on adversarial inputs —
    including vertical tab \\x0B, where Java's \\s and RE2's \\s DISAGREE
    (the bug the explicit WS_CLASS character class fixed), plus unicode
    spaces, zero-width chars, CRLF, and case-folding corners."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from kafka_exercise_spark.functions.text import tokens

    cases = [
        "plain ascii words",
        "tab\tseparated\ttokens",
        "vertical\x0btab\x0cfeed",  # the Java-vs-RE2 \\s divergence
        "nbsp\xa0separated",  # U+00A0 is NOT \\s in either engine
        "ideographic　space",
        "line sep para",
        "zero​width",
        "crlf\r\nmix",
        "  leading and trailing  ",
        "Ünïcödé CASE Ünïcödé",
        "emoji 🎉 tokens",
        "\u0130stanbul TURKISH \u0130",  # Java FULL lowercase i\u0307 vs simple i
        "\u03a3\u039f\u03a6\u039f\u03a3 \u0395\u039b\u039b\u0391\u03a3",  # contextual final sigma vs simple
        "\u03ae\u03b4\u03b7 \u03c2 lowercase \u03c3 mix",  # pre-existing final sigma folds
        "",
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "id long, text string"
    )
    got_spark = {
        r.id: list(r.t)
        for r in df.select("id", tokens(F.col("text")).alias("t")).collect()
    }
    con = duckdb.connect()
    for i, c in enumerate(cases):
        (got_duck,) = con.execute(
            "SELECT " + entrymod._TOKS.replace("text", "?"), [c]
        ).fetchone()
        assert got_spark[i] == list(got_duck), (repr(c), got_spark[i], got_duck)

    # the canonical fingerprint form must agree on the same corners
    from kafka_exercise_spark.functions.text import normalized_text

    got_canon = {
        r.id: r.c
        for r in df.select(
            "id", normalized_text(F.col("text")).alias("c")
        ).collect()
    }
    for i, c in enumerate(cases):
        (want,) = con.execute(
            "SELECT " + entrymod._CANON.replace("text", "?"), [c]
        ).fetchone()
        assert got_canon[i] == want, (repr(c), got_canon[i], want)


def test_levenshtein_parity_on_ascii(spark):
    """Spark counts codepoints, DuckDB counts UTF-8 bytes — they agree
    exactly on ASCII (the ER blocking's input domain; entityres.py),
    and the known multi-byte divergence is pinned so a future engine
    upgrade that changes either side is caught."""
    import duckdb
    from pyspark.sql import functions as F

    cases = [
        ("kitten", "sitting"),
        ("Customer#000000001", "Customer#000000011"),
        ("Customer#000000123", "Customer#000001123"),
        ("abc", ""),
        ("", ""),
        ("flaw", "lawn"),
        ("aaaa", "aabaa"),
    ]
    df = spark.createDataFrame(cases, "a string, b string").select(
        F.levenshtein("a", "b").alias("d")
    )
    got = [r.d for r in df.collect()]
    con = duckdb.connect()
    want = [
        con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        for a, b in cases
    ]
    assert got == want
    # documented divergence on multi-byte input: 4 codepoints vs 8 bytes
    (spark_d,) = (
        spark.createDataFrame([("ünïcödé", "unicode")], "a string, b string")
        .select(F.levenshtein("a", "b").alias("d"))
        .first()
    )
    duck_d = con.execute(
        "SELECT levenshtein('ünïcödé', 'unicode')"
    ).fetchone()[0]
    assert spark_d == 4 and duck_d == 8


def test_pagerank_matches_pure_python_integer_replay(spark):
    """Three-way exactness: the Spark PageRank must equal a pure-Python
    big-int replay bit-for-bit (the DuckDB oracle is the third copy).
    Any hidden float, overflow, or ordering dependence breaks this."""
    from kafka_exercise_spark.operators import graph

    sf = "/root/testdata/sf0.001"
    got = {
        r.node: r.rank for r in graph.graph_pagerank(spark, sf).collect()
    }

    import duckdb

    con = duckdb.connect()
    edges = con.execute(
        f"""SELECT DISTINCT user_id * 2 AS s,
                   TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                       * 2 + 1 AS d
            FROM '{sf}/events.parquet'
            WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                  IS NOT NULL"""
    ).fetchall()
    und = edges + [(d, s) for s, d in edges]
    deg: dict = {}
    for s, _ in und:
        deg[s] = deg.get(s, 0) + 1
    rank = {n: graph.RANK_SCALE for n in deg}
    for _ in range(graph.PR_ITERS):
        recv: dict = {}
        for s, d in und:
            recv[d] = recv.get(d, 0) + rank[s] // deg[s]
        rank = {
            n: graph.PR_BASE + (graph.DAMP_NUM * v) // graph.DAMP_DEN
            for n, v in recv.items()
        }
    top = sorted(rank.items(), key=lambda kv: (-kv[1], kv[0]))[
        : graph.TOP_NODES
    ]
    assert got == dict(top)


def test_power_fit_matches_pure_python_integer_replay(spark):
    """Same three-way pin for the PCA power iteration: the fitted
    component must equal the arbitrary-precision Python replay of the
    documented integer recurrence exactly."""
    import duckdb

    from kafka_exercise_spark.operators import similarity as sim

    sf = "/root/testdata/sf0.001"
    got = {
        r.j: r.v_q
        for r in sim.embedding_top_component(spark, sf).collect()
    }

    con = duckdb.connect()
    vecs = con.execute(
        f"""SELECT list_transform(embedding,
                x -> round(x * {sim.PROJ_SCALE})::BIGINT)
            FROM '{sf}/embeddings.parquet' ORDER BY vec_id"""
    ).fetchall()
    Q = [list(map(int, row[0])) for row in vecs]

    def sdiv(x: int, d: int) -> int:
        return (abs(x) // d) * (1 if x >= 0 else -1)

    v = [sim.PI_V_SCALE] * sim.EMBED_DIM
    for _ in range(sim.PI_ITERS):
        s = [sdiv(sum(a * b for a, b in zip(row, v)), sim.PROJ_SCALE)
             for row in Q]
        w_raw = [
            sum(Q[i][j] * s[i] for i in range(len(Q)))
            for j in range(sim.EMBED_DIM)
        ]
        w = [sdiv(x, sim.PROJ_SCALE) for x in w_raw]
        m = max(max(abs(x) for x in w), 1)
        v = [(abs(x) * sim.PI_V_SCALE // m) * (1 if x >= 0 else -1)
             for x in w]
    assert got == {j + 1: v[j] for j in range(sim.EMBED_DIM)}
