"""Kafka topic naming + source wiring for the streaming front.

Reference: ``bulkerapp/app/topic_manager.go:726-806`` — one topic per
(destination, mode, table): ``{prefix}in.id.{dst}.m.{mode}.t.{table}``,
with a ``b64`` table segment when the name has characters Kafka forbids,
optional ``.p.{partition}`` suffix, 249-char limit; ``retry``/``dead``
modes collapse the table to ``_all_``.

The Spark side subscribes with one pattern per destination
(``readStream.format("kafka").option("subscribePattern", ...)``) and
routes per-table inside ``foreachBatch`` via :func:`ParseTopicId` on the
``topic`` column — so adding a table never means a new query.
"""

from __future__ import annotations

import base64
import re

RETRY_MODE = "retry"
DEAD_MODE = "dead"
ALL_TABLES = "_all_"
TOPIC_LENGTH_LIMIT = 249

_VALID = re.compile(r"^[A-Za-z0-9._-]+$")


def is_valid_topic_name(name: str) -> bool:
    return bool(_VALID.match(name))


def make_topic_id(
    destination_id: str,
    mode: str,
    table_name: str,
    prefix: str = "",
    partition: int = 0,
    check_length: bool = True,
) -> str:
    if mode in (RETRY_MODE, DEAD_MODE):
        table_name, encoding = ALL_TABLES, "t"
    elif is_valid_topic_name(table_name):
        encoding = "t"
    else:
        table_name = base64.urlsafe_b64encode(table_name.encode()).decode().rstrip("=")
        encoding = "b64"
    topic = f"{prefix}in.id.{destination_id}.m.{mode}.{encoding}.{table_name}"
    if partition > 0:
        topic += f".p.{partition}"
    if check_length and len(topic) > TOPIC_LENGTH_LIMIT:
        raise ValueError(
            f"topic name {topic} length {len(topic)} exceeds limit "
            f"({TOPIC_LENGTH_LIMIT}); choose a shorter table name"
        )
    return topic


def parse_topic_id(topic: str) -> tuple[str, str, str]:
    """→ (destination_id, mode, table_name); raises on malformed names."""
    parts = topic.split("in.id.")
    if len(parts) != 2:
        raise ValueError(f"topic name {topic!r} doesn't match the pattern")
    groups = parts[1].split(".", 4)
    if len(groups) != 5 or groups[1] != "m" or groups[3] not in ("t", "b64"):
        raise ValueError(f"topic name {topic!r} doesn't match the pattern")
    destination_id, mode, encoding = groups[0], groups[2], groups[3]
    table = groups[4].split(".p.")[0]
    if encoding == "b64":
        pad = "=" * (-len(table) % 4)
        table = base64.urlsafe_b64decode(table + pad).decode()
    return destination_id, mode, table


def destination_subscribe_pattern(destination_id: str, prefix: str = "") -> str:
    """Regex subscribing to every topic of one destination."""
    return re.escape(f"{prefix}in.id.{destination_id}.m.") + ".*"


def kafka_json_stream(
    spark,
    bootstrap_servers: str,
    destination_id: str,
    prefix: str = "",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
):
    """Streaming DataFrame of (value, topic) for one destination's topics —
    ``maxOffsetsPerTrigger`` is the batchSize bound (app_config.go:57).
    Requires the spark-sql-kafka package on the cluster; raises a clear
    error if the Kafka source is unavailable (it isn't in this container).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option(
            "subscribePattern", destination_subscribe_pattern(destination_id, prefix)
        )
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    from pyspark.sql import functions as F

    return reader.load().select(
        F.col("value").cast("string").alias("value"), "topic"
    )
