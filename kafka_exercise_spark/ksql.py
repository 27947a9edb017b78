"""ksqlDB dialect façade: run the reference's statements verbatim.

The reference's user-facing surface is a ksqlDB CLI session (reference
README.md:155-347): ``show topics/streams/connectors``, ``print <topic>``,
``CREATE STREAM … WITH (…)``, CSAS/CTAS with ``DATETOSTRING`` /
``TIMESTAMPTOSTRING`` / ``CASE WHEN`` / ``WINDOW TUMBLING`` and ``EMIT
CHANGES``. This module lets those statements execute unchanged against the
Spark engine, so a reference user can paste their session into
``KsqlEngine.execute`` and get the same results.

Design — translate, don't interpret:

- **Dialect scalar functions are real Spark SQL functions.** ``CREATE
  TEMPORARY FUNCTION DATETOSTRING(d INT, fmt STRING) RETURNS STRING RETURN
  date_format(…)`` — Catalyst inlines the body into the caller's plan
  (constant-folds literal calls, joins whole-stage codegen). Zero Python in
  the hot path; the functions take the *wire* types ksqlDB presents (Avro
  date = int days, timestamp = bigint epoch-millis — reference README.md:
  "todas as colunas de data estão nos formatos INT ou BIGINT").
- **Statements are rewritten to Spark SQL text** and executed with
  ``spark.sql`` over temp views — batch frames and streaming frames alike
  (Spark SQL composes over streaming temp views, so the same CSAS text is
  the streaming pipeline when the topic is bound to ``readStream``).
- ``WINDOW TUMBLING (SIZE n unit)`` becomes a ``window(timestamp_millis
  (rowtime), 'n unit')`` GROUP BY key, and the result exposes ksqlDB's
  implicit ``WINDOWSTART``/``WINDOWEND`` epoch-ms columns.
- ``ROWTIME``: ksqlDB's record-timestamp pseudocolumn; ``register_topic``
  materializes it from a designated event-time column.

Scope = the reference's dialect subset. Anything outside it raises with a
clear message rather than mis-executing (the full relational surface is
available as plain Spark SQL through the same session).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Dialect scalar functions, registered once per session as SQL UDFs —
#: Catalyst inlines the RETURN expression at every call site.
_DIALECT_FUNCTIONS = (
    # Avro date wire form: int days since epoch (reference README.md:207)
    """CREATE OR REPLACE TEMPORARY FUNCTION DATETOSTRING(d INT, fmt STRING)
       RETURNS STRING
       RETURN date_format(date_add(DATE'1970-01-01', d), fmt)""",
    # Avro timestamp wire form: bigint epoch millis, explicit zone
    # (reference README.md:212 TIMESTAMPTOSTRING(dt_update, fmt, 'UTC'))
    """CREATE OR REPLACE TEMPORARY FUNCTION
           TIMESTAMPTOSTRING(t BIGINT, fmt STRING, tz STRING)
       RETURNS STRING
       RETURN date_format(from_utc_timestamp(timestamp_millis(t), tz), fmt)""",
    # Inverses of the two formatters (ksqlDB's STRINGTOTIMESTAMP /
    # STRINGTODATE return the same wire ints the decode path presents)
    """CREATE OR REPLACE TEMPORARY FUNCTION
           STRINGTOTIMESTAMP(s STRING, fmt STRING, tz STRING)
       RETURNS BIGINT
       RETURN unix_millis(to_utc_timestamp(to_timestamp(s, fmt), tz))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION STRINGTODATE(s STRING, fmt STRING)
       RETURNS INT
       RETURN datediff(to_date(s, fmt), DATE'1970-01-01')""",
    # ksqlDB MASK needs no shim: Spark's built-in mask() has identical
    # defaults (uppercase -> 'X', lowercase -> 'x', digit -> 'n').
)


def register_dialect_functions(spark: SparkSession) -> None:
    for ddl in _DIALECT_FUNCTIONS:
        spark.sql(ddl)


@dataclass
class _Relation:
    name: str  # registered (lowercase) stream/table name
    kafka_topic: str
    value_format: str
    windowed: bool = False
    kind: str = "stream"  # 'stream' | 'table'
    derived: bool = False  # True for CSAS/CTAS (own plan); False = source
    # relation whose rows ARE the topic (must track topic appends)
    terminated: bool = False  # TERMINATE ran: query stopped, relation kept


@dataclass
class KsqlEngine:
    """One CLI session: a topic namespace + stream/table registry.

    ``connectors`` may be a ``ConnectorRegistry`` (connectors.py) so
    ``show connectors;`` reports the engine's registered source/sink
    connectors exactly like the reference session does.
    """

    spark: SparkSession
    connectors: object | None = None
    _topics: dict[str, DataFrame] = field(default_factory=dict)
    _relations: dict[str, _Relation] = field(default_factory=dict)

    def __post_init__(self) -> None:
        register_dialect_functions(self.spark)

    # ---- registration (the engine-side analog of topic creation) ----

    def register_topic(
        self,
        name: str,
        df: DataFrame,
        rowtime_col: str | None = None,
        date_wire_cols: tuple[str, ...] = (),
        ts_wire_cols: tuple[str, ...] = (),
    ) -> None:
        """Bind a topic name to a frame (batch or streaming).

        ``rowtime_col`` supplies ksqlDB's ROWTIME pseudocolumn (record
        timestamp, epoch ms). ``date_wire_cols``/``ts_wire_cols`` are typed
        date/timestamp columns to present in Avro wire form (int days /
        bigint millis) — how ksqlDB's schema-registry decode shows them.
        """
        out = df
        # rowtime first — it must read the column's ORIGINAL type (a long
        # column is already epoch-ms; cast(bigint AS timestamp) would
        # misread millis as seconds after the wire conversion below)
        if rowtime_col is not None:
            src = df.schema[rowtime_col].dataType.typeName()
            rowtime = (
                F.col(rowtime_col)
                if src in ("long", "bigint")
                else F.unix_millis(F.col(rowtime_col).cast("timestamp"))
            )
            out = out.withColumn("rowtime", rowtime)
        for c in date_wire_cols:
            out = out.withColumn(
                c,
                F.datediff(F.to_date(F.col(c)), F.to_date(F.lit("1970-01-01"))).cast(
                    "int"
                ),
            )
        for c in ts_wire_cols:
            out = out.withColumn(c, F.unix_millis(F.col(c).cast("timestamp")))
        self._topics[name] = out

    # ---- the CLI ----

    def execute(self, statement: str):
        """Execute one ksql statement; returns a DataFrame for queries/
        ``print``, a list of dict rows for ``show``/``describe``, and the
        created relation name for DDL."""
        stmt = statement.strip().rstrip(";").strip()
        low = re.sub(r"\s+", " ", stmt.lower())
        if low.startswith("show "):
            return self._show(low.removeprefix("show ").strip())
        if low.startswith("list "):  # ksqlDB synonym of SHOW
            return self._show(low.removeprefix("list ").strip())
        if low.startswith("insert into "):
            return self._insert(stmt)
        if low == "print" or low.startswith("print "):
            return self._print_topic(self._operand(stmt, "PRINT").strip("'\""))
        if low == "describe" or low.startswith("describe "):
            return self._describe(self._operand(stmt, "DESCRIBE"))
        if low == "terminate" or low.startswith("terminate "):
            return self._terminate(self._operand(stmt, "TERMINATE").lower())
        if low.startswith(("create source connector", "create sink connector")):
            return self._create_connector(stmt)
        if low.startswith("drop connector"):
            if self.connectors is None:
                raise ValueError("no ConnectorRegistry attached to this session")
            toks = stmt.split()
            if_exists = [t.lower() for t in toks[2:4]] == ["if", "exists"]
            idx = 4 if if_exists else 2
            if len(toks) <= idx:
                raise NotImplementedError(
                    "DROP CONNECTOR needs a connector name"
                )
            name = toks[idx].lower()
            try:
                self.connectors.delete(name)
            except KeyError:
                if not if_exists:
                    raise
            return name
        if low.startswith(("create stream", "create table")):
            return self._create(stmt)
        if low.startswith(("drop stream", "drop table")):
            toks = stmt.split()
            if_exists = [t.lower() for t in toks[2:4]] == ["if", "exists"]
            if len(toks) <= (4 if if_exists else 2):
                raise NotImplementedError(
                    "DROP STREAM/TABLE needs a relation name"
                )
            name = (toks[4] if if_exists else toks[2]).lower()
            if name not in self._relations and not if_exists:
                raise KeyError(f"no stream/table named {name!r}")
            rel = self._relations.pop(name, None)
            self.spark.catalog.dropTempView(name)
            return rel.name if rel else name
        if low.startswith("select"):
            return self._query(stmt)
        if low.startswith("explain "):
            from kafka_exercise_spark.plans import explain_str

            target = stmt.split(None, 1)[1]
            if target.lower().lstrip().startswith("select"):
                df, _ = self._rewrite_select(target)
            else:  # EXPLAIN <stream/table name>
                df = self.spark.table(target.strip().lower())
            return explain_str(df, "formatted")
        raise NotImplementedError(
            f"outside the reference's ksql dialect subset: {stmt[:60]!r} "
            "(use spark.sql for the full relational surface)"
        )

    # ---- SHOW / PRINT / DESCRIBE ----

    @staticmethod
    def _operand(stmt: str, verb: str) -> str:
        """The statement's single operand; a clear dialect error (not an
        IndexError) when it is missing — 'TERMINATE;' and friends."""
        parts = stmt.split(None, 1)
        if len(parts) < 2 or not parts[1].strip():
            raise NotImplementedError(f"{verb} needs an operand: {stmt!r}")
        return parts[1].strip()

    def _show(self, what: str):
        if what == "topics":
            return [
                {"Kafka Topic": t, "Partitions": 1, "Partition Replicas": 1}
                for t in sorted(self._topics)
            ]
        if what in ("streams", "tables"):
            kind = what[:-1]
            return [
                {
                    f"{kind.capitalize()} Name": r.name.upper(),
                    "Kafka Topic": r.kafka_topic,
                    "Key Format": "KAFKA",
                    "Value Format": r.value_format,
                    "Windowed": r.windowed,
                }
                for r in self._relations.values()
                if r.kind == kind
            ]
        if what == "connectors":
            if self.connectors is None:
                return []
            rows = []
            for name in self.connectors.list():
                st = self.connectors.status(name)
                rows.append(
                    {
                        "Connector Name": name,
                        # reference CLI prints SOURCE/SINK uppercase
                        "Type": st.get("type", "").upper(),
                        "Status": st.get("state", ""),
                    }
                )
            return rows
        if what == "queries":
            # ksqlDB lists persistent (CSAS/CTAS) queries only — a plain
            # source stream has no backing query; terminated queries drop
            # off the listing while their relation remains queryable
            return [
                {
                    "Query ID": f"C{'TAS' if r.kind == 'table' else 'SAS'}_"
                    f"{r.name.upper()}",
                    "Sink": r.name.upper(),
                }
                for r in self._relations.values()
                if r.derived and not r.terminated
            ]
        raise NotImplementedError(f"show {what}")

    def _print_topic(self, topic: str) -> DataFrame:
        return self._topics[topic]

    def _describe(self, name: str):
        df = self.spark.table(name.lower())
        return [{"Field": f.name, "Type": f.dataType.simpleString()} for f in df.schema]

    # ---- DDL ----

    _CREATE_RE = re.compile(
        r"create\s+(stream|table)\s+(\w+)\s*"
        r"(?:with\s*\((?P<props>[^)]*)\))?\s*"
        r"(?:as\s+(?P<select>select\b.*))?$",
        re.IGNORECASE | re.DOTALL,
    )

    def _terminate(self, target: str) -> list[str]:
        """``TERMINATE <query id>|ALL;`` — stop a persistent query.

        ksqlDB semantics: the QUERY stops (its live StreamExecution, when
        one is attached by name, is stopped too); the stream/table it fed
        REMAINS registered and queryable — terminate-then-drop is the
        two-step teardown the CLI requires. Accepts the ``CSAS_X``/
        ``CTAS_X`` ids ``show queries`` prints, or the bare relation name.
        """
        targets = []
        if target == "all":
            targets = [r for r in self._relations.values() if r.derived]
        else:
            name = re.sub(r"^c[st]as_", "", target)
            rel = self._relations.get(name)
            if rel is None or not rel.derived:
                raise KeyError(f"no persistent query for {target!r}")
            targets = [rel]
        stopped = []
        for rel in targets:
            for q in self.spark.streams.active:
                if q.name == rel.name:
                    q.stop()
            rel.terminated = True
            stopped.append(
                f"C{'TAS' if rel.kind == 'table' else 'SAS'}_{rel.name.upper()}"
            )
        return stopped

    #: ``CREATE SOURCE|SINK CONNECTOR [IF NOT EXISTS] <name> WITH (…)`` —
    #: ksqlDB's statement form of the Connect REST POST the reference
    #: drives with curl (reference README.md:132-133; configs
    #: connect_postgres.config / connect_s3_sink_*.config verbatim).
    _CONNECTOR_RE = re.compile(
        r"create\s+(source|sink)\s+connector\s+(?P<ine>if\s+not\s+exists\s+)?"
        r"(?P<name>\S+)\s+with\s*\((?P<props>.*)\)\s*$",
        re.IGNORECASE | re.DOTALL,
    )

    #: WITH pair: key quoted (ksqlDB convention) or bare; value quoted or a
    #: bare literal (ksqlDB accepts ``flush.size=100`` unquoted).
    _CONN_PROP_RE = re.compile(
        r"(?:'(?P<qk>[^']+)'|(?P<bk>[\w.]+))\s*=\s*"
        r"(?:'(?P<qv>[^']*)'|(?P<bv>[\w./:+-]+))"
    )

    def _create_connector(self, stmt: str) -> str:
        """Connector DDL → ``ConnectorRegistry.register`` (S10).

        ksqlDB semantics throughout: a same-name connector makes the
        statement FAIL (no-op with IF NOT EXISTS) — never a silent
        replace; the declared SOURCE/SINK kind is validated against the
        ``connector.class`` BEFORE any registry mutation, so a failed
        statement cannot disturb an existing connector.
        """
        from kafka_exercise_spark.connectors import (
            JDBC_SOURCE_CLASS,
            S3_SINK_CLASS,
        )

        if self.connectors is None:
            raise ValueError("no ConnectorRegistry attached to this session")
        m = self._CONNECTOR_RE.match(stmt.strip())
        if not m:
            raise NotImplementedError(f"unparsed CREATE CONNECTOR: {stmt[:80]!r}")
        declared, name = m.group(1).lower(), m.group("name").lower()
        props: dict[str, str] = {}
        for pm in self._CONN_PROP_RE.finditer(m.group("props")):
            key = pm.group("qk") or pm.group("bk")
            val = pm.group("qv") if pm.group("qv") is not None else pm.group("bv")
            props[key] = val
        if name in self.connectors.list():
            if m.group("ine"):
                return name  # IF NOT EXISTS: no-op, existing config kept
            raise ValueError(f"connector {name!r} already exists")
        builds = {JDBC_SOURCE_CLASS: "source", S3_SINK_CLASS: "sink"}.get(
            props.get("connector.class")
        )
        if builds != declared:
            raise ValueError(
                f"declared {declared.upper()} connector but "
                f"{props.get('connector.class')!r} builds a {builds}"
            )
        self.connectors.register({"name": name, "config": props})
        return name

    def _create(self, stmt: str):
        m = self._CREATE_RE.match(stmt)
        if not m:
            raise NotImplementedError(f"unparsed CREATE: {stmt[:80]!r}")
        kind, name = m.group(1).lower(), m.group(2).lower()
        props = dict(
            re.findall(r"(\w+)\s*=\s*'([^']*)'", m.group("props") or "")
        )
        topic = props.get("kafka_topic", name)
        fmt = props.get("value_format", "AVRO").upper()
        select = m.group("select")
        if select is None:
            # source stream over an existing topic (reference README.md:186)
            df = self._topics[topic]
        else:
            df, windowed = self._rewrite_select(select)
            self._topics.setdefault(topic, df)  # CSAS auto-creates the topic
            rel = _Relation(
                name, topic, fmt, windowed=windowed, kind=kind, derived=True
            )
            self._relations[name] = rel
            df.createOrReplaceTempView(name)
            return name
        self._relations[name] = _Relation(name, topic, fmt, kind=kind)
        df.createOrReplaceTempView(name)
        return name

    _INSERT_RE = re.compile(
        r"insert\s+into\s+(\w+)\s*(?:\(([^)]*)\))?\s*"
        r"(values\s*\(.*\)|select\b.*)$",
        re.IGNORECASE | re.DOTALL,
    )

    def _insert(self, stmt: str):
        """``INSERT INTO <stream> [(cols)] VALUES (...)`` and
        ``INSERT INTO <stream> [(cols)] SELECT ...`` — ksqlDB's appenders.

        Batch-binding semantics: the target relation (and its backing
        topic) becomes the union of its current rows and the inserted
        rows, aligned to the target schema (missing columns → NULL, values
        cast to the declared types) — exactly what a topic append followed
        by a re-read shows. The literal tuple is parsed by Spark SQL's own
        VALUES clause, so every ksql literal form (strings, numerics,
        NULL, arrays) comes for free.
        """
        m = self._INSERT_RE.match(stmt)
        if not m:
            raise NotImplementedError(f"unparsed INSERT: {stmt[:80]!r}")
        name = m.group(1).lower()
        if name not in self._relations:
            raise KeyError(f"no stream/table named {name!r}")
        rel = self._relations[name]
        if rel.kind != "stream":
            # ksqlDB rejects INSERT INTO tables (their rows are derived by
            # the aggregate, not appended); mis-executing would fabricate
            # an aggregate row
            raise NotImplementedError(
                f"INSERT INTO a {rel.kind} is not valid ksql; {name!r} is "
                "not a stream"
            )
        target = self.spark.table(name)
        cols = [c.strip().lower() for c in (m.group(2) or "").split(",") if c.strip()]
        tail = m.group(3)
        if tail.lower().startswith("values"):
            vals = tail[len("values"):].strip()
            rows = self.spark.sql(f"SELECT * FROM (VALUES {vals})")
            src_cols = cols or [f.name for f in target.schema.fields][
                : len(rows.columns)
            ]
            rows = rows.toDF(*src_cols)
        else:
            rows, _ = self._rewrite_select(tail)
            if cols:
                rows = rows.toDF(*cols)
        have = {c.lower() for c in rows.columns}

        def _fill(f):
            if f.name.lower() in have:
                return F.col(f.name).cast(f.dataType).alias(f.name)
            if f.name.lower() == "rowtime":
                # ksqlDB stamps ROWTIME on every inserted record (epoch ms
                # at insert time); a NULL rowtime would silently drop the
                # row from windowed aggregates and WITHIN joins
                import time as _time  # noqa: PLC0415

                return (
                    F.lit(int(_time.time() * 1000))
                    .cast(f.dataType)
                    .alias(f.name)
                )
            return F.lit(None).cast(f.dataType).alias(f.name)

        aligned = rows.select(*[_fill(f) for f in target.schema.fields])
        out = target.unionByName(aligned)
        self._topics[rel.kafka_topic] = out
        # EVERY source relation over this topic sees the append (ksqlDB
        # semantics: relations are views over the topic, not snapshots) —
        # derived (CSAS) relations keep their own query plan
        for sibling in self._relations.values():
            if sibling.kafka_topic == rel.kafka_topic and not sibling.derived:
                out.createOrReplaceTempView(sibling.name)
        if rel.derived:  # inserting into a CSAS relation updates it alone
            out.createOrReplaceTempView(name)
        return name

    # ---- SELECT rewrite ----

    _WINDOW_RE = re.compile(
        r"\bwindow\s+tumbling\s*\(\s*size\s+(\d+)\s+(\w+?)s?\s*\)", re.IGNORECASE
    )
    _HOPPING_RE = re.compile(
        r"\bwindow\s+hopping\s*\(\s*size\s+(\d+)\s+(\w+?)s?\s*,"
        r"\s*advance\s+by\s+(\d+)\s+(\w+?)s?\s*\)",
        re.IGNORECASE,
    )
    _SESSION_RE = re.compile(
        r"\bwindow\s+session\s*\(\s*(\d+)\s+(\w+?)s?\s*\)", re.IGNORECASE
    )
    _EMIT_RE = re.compile(r"\bemit\s+changes\s*$", re.IGNORECASE)
    #: ``GRACE PERIOD n unit`` inside a WINDOW clause: ksqlDB's late-data
    #: retention bound. The batch rewrite sees all data, so the clause is
    #: accepted and stripped; the streaming twin of the same bound is the
    #: withWatermark delay (streaming/stateful.py), set per-pipeline.
    _GRACE_RE = re.compile(
        r",?\s*grace\s+period\s+\d+\s+\w+", re.IGNORECASE
    )
    #: ``PARTITION BY <col>``: ksqlDB re-keys the output records. Row
    #: values are unchanged — the rewrite applies a repartition on the
    #: column so downstream sinks/joins see the same co-location, which is
    #: the semantic content of re-keying in the Spark model.
    _PARTITION_RE = re.compile(
        r"\bpartition\s+by\s+(\w+)\s*", re.IGNORECASE
    )

    def _window_expr(self, sql: str) -> tuple[str, str | None, str]:
        """Strip any ksql WINDOW clause.

        Returns (sql, Spark window expression, implicit struct column name —
        ``window`` for tumbling/hopping, ``session_window`` for session).
        """
        if m := self._HOPPING_RE.search(sql):
            size, su = m.group(1), m.group(2).lower()
            adv, au = m.group(3), m.group(4).lower()
            return (
                self._HOPPING_RE.sub("", sql),
                f"window(timestamp_millis(rowtime), '{size} {su}s', '{adv} {au}s')",
                "window",
            )
        if m := self._SESSION_RE.search(sql):
            gap, gu = m.group(1), m.group(2).lower()
            return (
                self._SESSION_RE.sub("", sql),
                f"session_window(timestamp_millis(rowtime), '{gap} {gu}s')",
                "session_window",
            )
        if m := self._WINDOW_RE.search(sql):
            size, su = m.group(1), m.group(2).lower()
            return (
                self._WINDOW_RE.sub("", sql),
                f"window(timestamp_millis(rowtime), '{size} {su}s')",
                "window",
            )
        return sql, None, ""

    # ---- ksql aggregate-function spellings → Spark SQL equivalents ----
    # Offset order ≙ arrival order; with one partition (reference
    # README.md:99) that is rowtime order, so *_BY_OFFSET keys on rowtime.
    _AGG_REWRITES = (
        (
            re.compile(r"\blatest_by_offset\s*\(\s*([^()]+?)\s*\)", re.IGNORECASE),
            r"max_by(\1, rowtime)",
        ),
        (
            re.compile(r"\bearliest_by_offset\s*\(\s*([^()]+?)\s*\)", re.IGNORECASE),
            r"min_by(\1, rowtime)",
        ),
        (
            re.compile(
                r"\btopk\s*\(\s*([^(),]+?)\s*,\s*(\d+)\s*\)", re.IGNORECASE
            ),
            r"slice(reverse(array_sort(collect_list(\1))), 1, \2)",
        ),
        (
            re.compile(r"\bcount_distinct\s*\(\s*([^()]+?)\s*\)", re.IGNORECASE),
            r"count(DISTINCT \1)",
        ),
        # value -> occurrence-count map; the duplicated collect_list is one
        # physical aggregation (Catalyst dedupes identical agg expressions)
        (
            re.compile(r"\bhistogram\s*\(\s*([^()]+?)\s*\)", re.IGNORECASE),
            r"map_from_entries(transform(array_distinct(collect_list(\1)),"
            r" v -> struct(v, size(filter(collect_list(\1), y -> y = v)))))",
        ),
    )

    _TIME_UNIT_MS = {
        "millisecond": 1,
        "second": 1000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
    }

    #: ``[LEFT [OUTER]] JOIN <rel> [<alias>] WITHIN <n> <unit> |
    #:  WITHIN (<n> <unit>, <m> <unit>) ON`` — ksql stream-stream joins.
    _WITHIN_RE = re.compile(
        r"\bjoin\s+(?P<rel>\w+)(?:\s+(?!on\b|within\b)(?P<alias>\w+))?"
        r"\s+within\s+(?:\(\s*(?P<before>\d+)\s+(?P<bu>\w+?)s?\s*,"
        r"\s*(?P<after>\d+)\s+(?P<au>\w+?)s?\s*\)|(?P<n>\d+)\s+(?P<u>\w+?)s?)"
        r"\s+on\s",
        re.IGNORECASE,
    )
    _FROM_RE = re.compile(
        r"\bfrom\s+(?P<rel>\w+)"
        r"(?:\s+(?!left\b|right\b|full\b|inner\b|outer\b|join\b|where\b"
        r"|group\b|window\b|emit\b|partition\b)(?P<alias>\w+))?",
        re.IGNORECASE,
    )

    def _rewrite_within_join(self, sql: str) -> str:
        """Stream-stream ``JOIN … WITHIN`` → plain join + rowtime interval.

        ksqlDB's WITHIN bounds how far apart the two records' timestamps may
        be (`WITHIN (b, a)`: left.ts - b <= right.ts <= left.ts + a; the
        single-duration form is symmetric). The Spark translation ANDs that
        interval onto the join condition — in streaming form this is exactly
        the watermarked interval join Structured Streaming plans natively
        (streaming/stateful.py streaming_join_replay)."""
        m = self._WITHIN_RE.search(sql)
        if not m:
            return sql
        fm = self._FROM_RE.search(sql)
        if not fm:
            raise NotImplementedError("WITHIN join without a FROM relation")
        left = fm.group("alias") or fm.group("rel")
        right = m.group("alias") or m.group("rel")

        def _ms(n: str, unit: str) -> int:
            u = unit.lower().rstrip("s")
            if u not in self._TIME_UNIT_MS:
                raise NotImplementedError(f"WITHIN unit {unit!r}")
            return int(n) * self._TIME_UNIT_MS[u]

        if m.group("n"):
            before = after = _ms(m.group("n"), m.group("u"))
        else:
            before = _ms(m.group("before"), m.group("bu"))
            after = _ms(m.group("after"), m.group("au"))
        rhs = m.group("rel") + (f" {m.group('alias')}" if m.group("alias") else "")
        cond = (
            f"{right}.rowtime BETWEEN {left}.rowtime - {before} "
            f"AND {left}.rowtime + {after} AND "
        )
        return sql[: m.start()] + f"join {rhs} on {cond}" + sql[m.end() :]

    def _rewrite_select(self, select: str) -> tuple[DataFrame, bool]:
        """ksql SELECT → Spark SQL text → DataFrame; returns (df, windowed)."""
        sql = self._EMIT_RE.sub("", select.strip()).strip()
        sql = self._GRACE_RE.sub("", sql)
        part_col = None
        if pm := self._PARTITION_RE.search(sql):
            part_col, sql = pm.group(1), self._PARTITION_RE.sub("", sql)
        sql = self._rewrite_within_join(sql)
        for pat, repl in self._AGG_REWRITES:
            sql = pat.sub(repl, sql)
        sql, win_expr, win_col = self._window_expr(sql)
        windowed = win_expr is not None
        if windowed:
            # ksql's windowed table keys on (group keys, window); expose the
            # implicit WINDOWSTART/WINDOWEND epoch-ms columns it carries.
            gm = re.search(r"\bgroup\s+by\s+(.*)$", sql, re.IGNORECASE | re.DOTALL)
            if not gm:
                raise NotImplementedError("ksql WINDOW clause without GROUP BY")
            sql = sql[: gm.start()] + f"group by {win_expr}, " + gm.group(1)
            sql = re.sub(
                r"^select\s",
                f"select unix_millis({win_col}.start) AS windowstart, "
                f"unix_millis({win_col}.end) AS windowend, ",
                sql,
                count=1,
                flags=re.IGNORECASE,
            )
        df = self.spark.sql(sql)
        if part_col is not None:
            df = df.repartition(F.col(part_col))
        return df, windowed

    def _query(self, stmt: str) -> DataFrame:
        df, _ = self._rewrite_select(stmt)
        return df
