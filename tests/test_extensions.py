"""UDF / UDAF / UDTF extension surface (SURVEY §2.5 custom-function gap)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_exercise_spark.catalog import load_table
from kafka_exercise_spark.functions.extensions import (
    register_scalar_sql,
    register_udaf_pandas,
    register_udtf,
)
from kafka_exercise_spark.plans import python_eval_count


def test_scalar_sql_function_is_catalyst_inlined(spark, sf_dir):
    register_scalar_sql(
        spark, "clamp01", "x DOUBLE", "DOUBLE", "least(greatest(x, 0.0), 1.0)"
    )
    events = load_table(spark, sf_dir, "events")
    events.createOrReplaceTempView("ext_events")
    df = spark.sql("SELECT event_id, clamp01(value / 100.0) AS v FROM ext_events")
    # inlined by Catalyst: the plan has ZERO python nodes
    assert python_eval_count(df) == 0
    for r in df.collect():
        assert 0.0 <= r.v <= 1.0


def test_udaf_pandas_grouped_agg(spark, sf_dir):
    import numpy as np

    def trimmed_mean(s) -> float:
        a = np.sort(s.to_numpy())
        k = max(1, len(a) // 10)
        return float(a[k:-k].mean()) if len(a) > 2 * k else float(a.mean())

    register_udaf_pandas(spark, "trimmed_mean", trimmed_mean, "double")
    events = load_table(spark, sf_dir, "events")
    events.createOrReplaceTempView("ext_events")
    got = {
        r.event_type: r.tm
        for r in spark.sql(
            "SELECT event_type, trimmed_mean(value) AS tm "
            "FROM ext_events GROUP BY event_type"
        ).collect()
    }
    # recompute per group in plain numpy
    import collections

    groups = collections.defaultdict(list)
    for r in events.select("event_type", "value").collect():
        groups[r.event_type].append(r.value)
    for et, vals in groups.items():
        a = np.sort(np.array(vals))
        k = max(1, len(a) // 10)
        exp = float(a[k:-k].mean()) if len(a) > 2 * k else float(a.mean())
        assert abs(got[et] - exp) < 1e-9, et


def test_udtf_registration_and_lateral_join(spark, sf_dir):
    class NGrams:
        def eval(self, text: str, n: int):
            words = (text or "").split()
            for i in range(max(0, len(words) - n + 1)):
                yield (" ".join(words[i : i + n]), i)

    register_udtf(spark, "ngrams_udtf", NGrams, "gram: string, pos: int")
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("ext_docs")
    out = spark.sql(
        "SELECT d.doc_id, g.gram, g.pos "
        "FROM ext_docs d, LATERAL ngrams_udtf(d.text, 2) g "
        "WHERE d.doc_id < 3"
    ).collect()
    # cross-check one doc against plain python
    texts = {r.doc_id: r.text for r in docs.filter(F.col("doc_id") < 3).collect()}
    for doc_id, text in texts.items():
        words = text.split()
        exp = {(" ".join(words[i : i + 2]), i) for i in range(len(words) - 1)}
        got = {(r.gram, r.pos) for r in out if r.doc_id == doc_id}
        assert got == exp, doc_id
