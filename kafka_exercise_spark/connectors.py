"""Connector registry — SURVEY.md §2.1 S10, the Connect REST analog.

The reference manages its pipeline by POSTing JSON connector configs to
Kafka Connect (reference README.md:132-133, 308-309, 340-341) and
inspecting them with ``show connectors`` (README.md:167-175, RUNNING
state). This module is the engine-side equivalent: a registry that accepts
the SAME config vocabulary — the field names of connect_postgres.config and
connect_s3_sink_*.config — and materializes engine runtimes:

- ``JdbcSourceConnector`` configs (``mode: timestamp``,
  ``timestamp.column.name``, ``table.whitelist``, ``topic.prefix``,
  ``poll.interval.ms``) → a ``TimestampModeSource`` with a persisted
  high-water mark.
- ``S3SinkConnector`` configs (``format.class`` Parquet/Json,
  ``flush.size``, ``topics``, ``topics.dir``, ``store.kafka.keys``) → a
  batch writer with ``maxRecordsPerFile`` = flush.size parity.

Engine-specific extensions (no S3/Postgres in scope): ``connection.url``
accepts ``parquet://<dir>`` backends, ``local.root`` replaces the bucket,
``offsets.path`` locates the high-water-mark state file (≙ the Connect
offsets topic, reference docker-compose.yml:70-76).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_exercise_spark.sources.incremental import (
    TimestampModeSource,
    jdbc_reader,
    parquet_dir_reader,
)

JDBC_SOURCE_CLASS = "io.confluent.connect.jdbc.JdbcSourceConnector"
S3_SINK_CLASS = "io.confluent.connect.s3.S3SinkConnector"
PARQUET_FORMAT = "io.confluent.connect.s3.format.parquet.ParquetFormat"
JSON_FORMAT = "io.confluent.connect.s3.format.json.JsonFormat"


@dataclass
class Connector:
    name: str
    kind: str  # "source" | "sink"
    config: dict[str, Any]
    runtime: Any
    state: str = "RUNNING"

    def status(self) -> dict[str, str]:
        """``show connectors``-shaped row (reference README.md:170-175)."""
        return {"name": self.name, "type": self.kind, "state": self.state}


class ConnectorRegistry:
    """Register/list/pause/delete connectors from JSON configs."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._connectors: dict[str, Connector] = {}

    # -- REST-verb surface ------------------------------------------------

    def register(self, payload: dict[str, Any]) -> Connector:
        """POST /connectors analog: ``{"name": ..., "config": {...}}``."""
        name, config = payload["name"], payload["config"]
        cls = config["connector.class"]
        if cls == JDBC_SOURCE_CLASS:
            conn = Connector(name, "source", config, self._build_source(config))
        elif cls == S3_SINK_CLASS:
            conn = Connector(name, "sink", config, self._build_sink(config))
        else:
            raise ValueError(f"unsupported connector.class: {cls}")
        self._connectors[name] = conn
        return conn

    def list(self) -> list[str]:
        return sorted(self._connectors)

    def status(self, name: str) -> dict[str, str]:
        return self._connectors[name].status()

    def pause(self, name: str) -> None:
        self._connectors[name].state = "PAUSED"

    def resume(self, name: str) -> None:
        self._connectors[name].state = "RUNNING"

    def delete(self, name: str) -> None:
        del self._connectors[name]

    # -- config → runtime -------------------------------------------------

    def _build_source(self, config: dict[str, Any]) -> TimestampModeSource:
        if config.get("mode") != "timestamp":
            raise ValueError(
                "only mode=timestamp is supported "
                "(reference connect_postgres.config:9)"
            )
        url = config["connection.url"]
        table = config["table.whitelist"]
        if url.startswith("parquet://"):
            reader = parquet_dir_reader(url[len("parquet://"):])
        else:
            reader = jdbc_reader(
                url,
                table,
                {
                    k.split(".", 1)[1]: v
                    for k, v in config.items()
                    if k.startswith("connection.") and k != "connection.url"
                },
            )
        return TimestampModeSource(
            spark=self.spark,
            reader=reader,
            cursor_col=config["timestamp.column.name"],
            state_path=config["offsets.path"],
        )

    def _build_sink(self, config: dict[str, Any]) -> Callable[[DataFrame, int], None]:
        root = config.get("local.root", config.get("s3.bucket.name", "/tmp"))
        topic = config["topics"]
        topics_dir = config.get("topics.dir", "topics")
        flush_size = int(config.get("flush.size", 10))
        fmt = config.get("format.class", PARQUET_FORMAT)
        path = f"{root}/{topics_dir}/{topic}"

        def write(df: DataFrame, batch_id: int) -> None:
            writer = df.write.mode("append").option(
                "maxRecordsPerFile", flush_size
            )
            if fmt == JSON_FORMAT:
                writer.json(f"{path}/batch={batch_id}")
            else:
                writer.parquet(path)

        write.path = path  # type: ignore[attr-defined] — inspectable target
        return write

    # -- wiring -----------------------------------------------------------

    def run_source_to_sink(
        self, source_name: str, sink_name: str, polls: int,
        poll_interval_s: float = 0.0,
    ) -> int:
        """Drive a registered source's poll loop into a registered sink —
        the engine's analog of the broker hop between the two connectors.
        Returns rows moved."""
        src = self._connectors[source_name]
        dst = self._connectors[sink_name]
        if src.state != "RUNNING" or dst.state != "RUNNING":
            return 0
        return src.runtime.run(
            dst.runtime, polls=polls, poll_interval_s=poll_interval_s
        )
