"""Reference-parity query operators (SURVEY.md §2.2 / §2.3), Spark-first.

The reference declares four persistent/transient queries over the customer
stream (reference README.md:180-347). The driver's fixtures have no
``customers`` table, so each operator is expressed over the equivalent fixture
column (FIXTURES.md §2): ``events.ts`` plays ``dt_update`` (event-time),
``orders.o_orderdate`` plays ``nascimento`` (the birthdate the jovens filter
cuts on), ``event_type`` plays the categorical key.

Every function takes (spark, sf_dir) and returns a lazy DataFrame — these are
the ``queries()`` entries wired in ``__spark_entry__.py`` with DuckDB oracles.

Scale posture: all operators are narrow projections/filters (no shuffle) except
the grouped counts, which shuffle once on the group key with map-side partial
aggregation — the minimum possible. Filters and projections reach the parquet
scan (PushedFilters / ReadSchema pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_exercise_spark.catalog import load_table
from kafka_exercise_spark.functions import datetostring, timestamptostring

#: The jovens cutoff (reference README.md:238 uses '2000-01-01' on birthdates);
#: orders span 1995-2001 so this cutoff selects a proper subset either way.
JOVENS_CUTOFF = "1998-06-01"


# ---- transformations (DataFrame -> DataFrame) ----
# Factored out so the streaming layer (streaming/pipeline.py) applies the
# *same* logic to readStream frames — the reference's CSAS/CTAS are
# stream-resident versions of these exact projections (README.md:233, 258,
# 271); stream/batch parity is by construction, tested by bounded replay.


def custstream_pretty_transform(events: DataFrame) -> DataFrame:
    return events.select(
        F.col("event_id"),
        F.col("user_id"),
        F.col("event_type"),
        datetostring("ts").alias("dt_event"),
        timestamptostring("ts").alias("ts_conv"),
    )


def idadeclass_transform(events: DataFrame, cutoff_value: float = 100.0) -> DataFrame:
    """Stream-shaped CASE classifier on events (value >= cutoff ⇒ 'JOVEM')."""
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("value") >= cutoff_value, "JOVEM")
        .otherwise("ADULTO")
        .alias("idadecat"),
    )


def idadecont_transform(
    classified: DataFrame, watermark_delay: str | None = None
) -> DataFrame:
    """Tumbling 30 s count by idadecat (reference README.md:271-276).

    ``watermark_delay`` set ⇒ streaming form (state eviction enabled);
    None ⇒ batch form. Same plan otherwise — the parity the reference's
    stream/table duality promises.
    """
    src = classified
    if watermark_delay is not None:
        src = src.withWatermark("ts", watermark_delay)
    win = src.groupBy(
        F.window("ts", "30 seconds").alias("w"), F.col("idadecat")
    ).agg(F.count("*").alias("contagem"))
    return win.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "idadecat",
        "contagem",
    )


def custstream_pretty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + alias + both datetime formatters.

    Parity: the transient push query at reference README.md:210-213 —
    ``SELECT nome, telefone, email, DATETOSTRING(nascimento,'yyyy-MM-dd') AS
    dt_nascimento, TIMESTAMPTOSTRING(dt_update,'yyyy-MM-dd HH:mm:ss.SSS','UTC')
    AS dt_updt_conv FROM custstream EMIT CHANGES;`` (§2.2 P1, P3, P4, P5).
    """
    events = load_table(spark, sf_dir, "events")
    return custstream_pretty_transform(events)


def select_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full projection — ``SELECT * FROM custstream EMIT CHANGES;``
    (reference README.md:204, §2.2 P2)."""
    return load_table(spark, sf_dir, "nation").select("*")


def jovens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter on a formatted-date string comparison (the CSAS 'jovens').

    Parity: reference README.md:233-239 — project, format dates to strings,
    keep rows whose formatted date >= literal (§2.2 P1, P4-P6, P8). The
    reference compares ISO-formatted *strings* lexicographically, which equals
    the date comparison; we express the filter on the raw column so Catalyst
    pushes a timestamp-range predicate into the parquet scan instead of
    evaluating a format function per row.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        F.col("o_orderdate") >= F.lit(JOVENS_CUTOFF).cast("timestamp")
    ).select(
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.col("o_orderstatus"),
        F.col("o_totalprice"),
        datetostring("o_orderdate").alias("dt_order"),
        timestamptostring("o_orderdate").alias("dt_updt"),
    )


def idadeclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN classification (the CSAS 'idadeclass').

    Parity: reference README.md:258-265 — ``CASE WHEN
    DATETOSTRING(nascimento,'yyyy-MM-dd') >= '2000-01-01' THEN 'JOVEM' ELSE
    'ADULTO' END AS idadecat`` (§2.2 P7). Same string-comparison shape; the
    predicate folds to a timestamp comparison for scan pushdown.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.when(
            F.col("o_orderdate") >= F.lit(JOVENS_CUTOFF).cast("timestamp"), "JOVEM"
        )
        .otherwise("ADULTO")
        .alias("idadecat"),
        datetostring("o_orderdate").alias("dt_order"),
    )


def groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Un-windowed grouped count — §2.3 A1-A2 in isolation.

    One shuffle on the group key; partial (map-side) aggregation halves the
    shuffled bytes. At 100 TB this is the textbook low-cardinality agg: ~5
    groups → AQE coalesces post-shuffle partitions to a handful.
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(F.count("event_type").alias("contagem"))


def idadecont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window (30 s) grouped count — the CTAS 'idadecont'.

    Parity: reference README.md:271-276 — ``CREATE TABLE idadecont AS SELECT
    idadecat, count(idadecat) AS contagem FROM idadeclass WINDOW TUMBLING
    (SIZE 30 SECONDS) GROUP BY idadecat EMIT CHANGES;`` (§2.3 A1-A5). Batch
    form: the final state of the continuously-updated table. The streaming
    form (update-mode emission, watermark) lives in streaming/pipeline.py; the
    "streaming final state == this batch result" equivalence is tested in
    tests/test_streaming.py.

    The window struct is flattened to ``window_start``/``window_end`` strings
    so the result is hash-comparable with the DuckDB oracle (FIXTURES.md §4).
    Spark's windows are epoch-aligned, so window_start = floor(epoch/30)*30.
    """
    events = load_table(spark, sf_dir, "events")
    win = events.groupBy(
        F.window("ts", "30 seconds").alias("w"), F.col("event_type").alias("idadecat")
    ).agg(F.count("*").alias("contagem"))
    return win.select(
        timestamptostring(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        timestamptostring(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "idadecat",
        "contagem",
    )


def jovens_epoch_wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The jovens projection over the *Avro wire representation* of dates.

    The reference's stream sees ``nascimento`` as int days-since-epoch and
    ``dt_update`` as bigint epoch-millis (reference README.md:207, 212); this
    entry exercises the epoch-int decode path of the formatters (§2.2 P4-P5)
    by first encoding the fixture timestamp to the wire ints, then formatting
    back — a round-trip proof of the decode helpers — and applies the jovens
    string-``>=`` predicate on the formatted value (reference README.md:238),
    so the whole wire path decode→format→filter is oracle-checked end-to-end.
    """
    events = load_table(spark, sf_dir, "events")
    wire = events.select(
        "event_id",
        F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).alias("d_days"),
        F.unix_millis(F.col("ts")).alias("ts_ms"),
    )
    formatted = wire.select(
        "event_id",
        datetostring("d_days", epoch_days=True).alias("dt_event"),
        timestamptostring("ts_ms", epoch_millis=True).alias("ts_conv"),
    )
    # ISO strings compare lexicographically == chronologically, the exact
    # semantics the reference's jovens CSAS relies on (README.md:233-239).
    return formatted.filter(F.col("dt_event") >= "2024-01-10")


#: The reference's per-record value schema shape (Schema Registry JSON):
#: epoch-int logical types on the wire, nullable string for the free-form
#: field (reference README.md:205-212 — nascimento int days, dt_update
#: epoch-millis).
AVRO_EVENTS_SCHEMA = """
{
  "type": "record", "name": "event", "fields": [
    {"name": "event_id", "type": "long"},
    {"name": "d_days", "type": {"type": "int", "logicalType": "date"}},
    {"name": "ts_ms", "type": {"type": "long", "logicalType": "timestamp-millis"}},
    {"name": "event_type", "type": ["null", "string"]},
    {"name": "value", "type": "double"}
  ]
}
"""


def avro_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → Avro binary → decode → format: the reference's actual topic
    path (§2.1 S4 + §2.2 P4/P5), end-to-end through real wire bytes.

    The reference's consumers never see typed columns — they see Avro binary
    records whose DATE/TIMESTAMP fields are epoch ints (reference
    README.md:186, 207, 212). This entry produces those bytes with the
    spec-conformant codec (functions/avro_wire.py), decodes them back, and
    formats with the epoch-wire formatters — so the oracle checks the full
    encode→decode→format pipeline, not just the formatters. Encode inputs
    are computed JVM-side (``datediff``/``unix_millis``); Python handles
    byte packing only, Arrow-batched.
    """
    from kafka_exercise_spark.functions.avro_wire import avro_decode, avro_encode

    events = load_table(spark, sf_dir, "events")
    wire_in = events.select(
        F.col("event_id").cast("long"),
        F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01")))
        .cast("int")
        .alias("d_days"),
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        "event_type",
        F.col("value").cast("double"),
    )
    decoded = avro_decode(avro_encode(wire_in, AVRO_EVENTS_SCHEMA), AVRO_EVENTS_SCHEMA)
    return decoded.select(
        "event_id",
        datetostring("d_days", epoch_days=True).alias("dt_event"),
        timestamptostring("ts_ms", epoch_millis=True).alias("ts_conv"),
        "event_type",
        "value",
    )


#: Avro wire schema for the embeddings table — array<float> transport.
AVRO_EMBEDDINGS_SCHEMA = """
{
  "type": "record", "name": "embedding", "fields": [
    {"name": "vec_id", "type": "long"},
    {"name": "label", "type": "long"},
    {"name": "embedding", "type": {"type": "array", "items": "float"}}
  ]
}
"""


def avro_embeddings_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings through real Avro wire bytes (array<float> block
    encoding) and back — the transport path for shipping vector columns
    between services; float32 items are exact through the 4-byte encoding.

    Output is a scalar fingerprint of each round-tripped vector (dim,
    first/last element, ordered sum of squares) so the oracle compares
    plain numeric columns; the exact whole-array equality is pinned in
    tests/test_avro_wire.py.
    """
    from kafka_exercise_spark.functions.avro_wire import avro_decode, avro_encode

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long"),
        F.col("label").cast("long"),
        F.col("embedding").cast("array<float>"),
    )
    decoded = avro_decode(
        avro_encode(emb, AVRO_EMBEDDINGS_SCHEMA), AVRO_EMBEDDINGS_SCHEMA
    )
    d = F.col("embedding").cast("array<double>")
    return decoded.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at(d, 1), 6).alias("e_first"),
        F.round(F.element_at(d, -1), 6).alias("e_last"),
        F.round(
            F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x * x), 6
        ).alias("sumsq"),
    )


GEN_ROWS = 500  # generator tick size for the ksql-dialect oracle entries


def _ksql_session(spark: SparkSession):
    """A ksql CLI session over one deterministic generator tick — the exact
    reference topology (S1 generator → topic → ksql statements)."""
    from kafka_exercise_spark.ksql import KsqlEngine
    from kafka_exercise_spark.sources.generator import customers_batch

    eng = KsqlEngine(spark)
    eng.register_topic(
        "psg-customers",
        customers_batch(spark, GEN_ROWS, tick=0),
        rowtime_col="dt_update",
        date_wire_cols=("nascimento",),
        ts_wire_cols=("dt_update",),
    )
    eng.execute(
        "create stream custstream WITH (kafka_topic='psg-customers', "
        "value_format='AVRO');"
    )
    return eng


def ksql_jovens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's jovens CSAS, executed VERBATIM through the ksql
    dialect layer (reference README.md:233-239, text unchanged). The oracle
    replicates the deterministic generator in SQL, so the hash check covers
    generator → wire-int presentation → dialect functions → filter.
    ``sf_dir`` is unused: the input is the S1 generator, as in the
    reference."""
    eng = _ksql_session(spark)
    eng.execute(
        "create stream jovens WITH (kafka_topic='jovens', value_format='AVRO') AS "
        "select nome, sexo, telefone, email, profissao, "
        "DATETOSTRING(nascimento, 'yyyy-MM-dd') as dt_nascimento, "
        "TIMESTAMPTOSTRING(dt_update, 'yyyy-MM-dd HH:mm:ss.SSS', 'UTC') as dt_updt "
        "from custstream "
        "WHERE DATETOSTRING(nascimento, 'yyyy-MM-dd') >= '2000-01-01' "
        "emit changes;"
    )
    return spark.table("jovens")


def ksql_idadecont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's idadeclass CSAS + idadecont windowed CTAS, executed
    verbatim (reference README.md:258-276); returns the windowed table with
    ksql's implicit WINDOWSTART/WINDOWEND epoch-ms keys."""
    eng = _ksql_session(spark)
    eng.execute(
        "create stream idadeclass WITH (kafka_topic='idadeclass', "
        "value_format='AVRO') AS "
        "select nome, telefone, email, profissao, "
        "CASE "
        "WHEN DATETOSTRING(nascimento, 'yyyy-MM-dd') >= '2000-01-01' THEN 'JOVEM' "
        "ELSE 'ADULTO' END AS idadecat, "
        "rowtime "
        "from custstream "
        "emit changes;"
    )
    eng.execute(
        "create table idadecont WITH (kafka_topic='idadecont', "
        "value_format='AVRO') AS "
        "select idadecat, count(idadecat) as contagem "
        "from idadeclass "
        "window tumbling (size 30 seconds) "
        "group by idadecat "
        "emit changes;"
    )
    return spark.table("idadecont")


def ksql_join_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream ``JOIN … WITHIN`` through the ksql dialect layer.

    ksqlDB's interval join (absent from the reference session — SURVEY §2.5
    — but core ksqlDB vocabulary): purchases attributed to clicks by the
    same user within (0s, 10min). The dialect rewrite lands on a plain
    equi-join with a rowtime interval predicate, which Catalyst plans as a
    hash join on user_id with the interval as a post-join filter — the
    batch twin of Structured Streaming's watermarked interval join
    (streaming/stateful.py streaming_join_replay). Scale: shuffles on
    user_id only; no range-only cross product.
    """
    from kafka_exercise_spark.ksql import KsqlEngine

    eng = KsqlEngine(spark)
    events = load_table(spark, sf_dir, "events")
    eng.register_topic("events", events, rowtime_col="ts", ts_wire_cols=("ts",))
    eng.execute(
        "create stream evstream WITH (kafka_topic='events', "
        "value_format='AVRO');"
    )
    eng.execute(
        "create stream kclicks AS select user_id, event_id, rowtime "
        "from evstream where event_type = 'click' emit changes;"
    )
    eng.execute(
        "create stream kpurchases AS select user_id, event_id, value, rowtime "
        "from evstream where event_type = 'purchase' emit changes;"
    )
    return eng.execute(
        "select c.user_id as user_id, c.event_id as click_id, "
        "p.event_id as purchase_id, p.value as purchase_value "
        "from kclicks c join kpurchases p within (0 seconds, 10 minutes) "
        "on c.user_id = p.user_id emit changes;"
    )
