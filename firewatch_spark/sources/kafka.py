"""Kafka source/sink builders — S6-S9, S11 from SURVEY.md §2.1.

Option-complete translations of the reference's producer/consumer
tuning into Spark's ``kafka.*`` pass-through options:

* producer (S6/S8/S9): acks=1, gzip, batch.size 16384, linger 10 ms,
  5 in-flight (reference producer/video_producer.py:57-67,
  streams/stream.py:85-95; rationale docs/PERFORMANCE.md:40-49);
* consumer (S7): earliest offsets, fetch.min.bytes 32768,
  fetch.max.wait 500 ms, 10 MB/partition
  (streams/stream.py:58-83; docs/PERFORMANCE.md:51-58);
* completions consumer (S11): its own group, small polls
  (consumer/s3_video_consumer.py:113-122).

The reference's offset-commit cadence (W6, stream.py:462-497) and
idle-poll loop (W7) have NO translated code: Structured Streaming
checkpointing subsumes both (`checkpointLocation` + trigger).

These builders return lazy readers/writers; no broker is contacted
until a query starts, so they are unit-testable option-wise (the
container has no Kafka).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamReader, DataStreamWriter

# topic layout: config.py:14-16 + scripts/setup_kafka_topics.sh
FRAMES_TOPIC = "video-frames"         # 6 partitions
DETECTIONS_TOPIC = "fire-detections"  # 6 partitions
COMPLETIONS_TOPIC = "video-completions"  # 3 partitions

PRODUCER_OPTIONS = {
    # producer/video_producer.py:57-67 — throughput knobs
    "kafka.acks": "1",
    "kafka.compression.type": "gzip",
    "kafka.batch.size": "16384",
    "kafka.linger.ms": "10",
    "kafka.max.in.flight.requests.per.connection": "5",
}

CONSUMER_OPTIONS = {
    # streams/stream.py:79-82 — fetch tuning
    "kafka.fetch.min.bytes": "32768",
    "kafka.fetch.max.wait.ms": "500",
    "kafka.max.partition.fetch.bytes": str(10 * 1024 * 1024),
    "startingOffsets": "earliest",
    # max_poll_records=300 analog: bound each micro-batch
    "maxOffsetsPerTrigger": "1800",  # 300 × 6 partitions
}


def frames_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = FRAMES_TOPIC,
    extra_options: dict[str, str] | None = None,
) -> DataStreamReader:
    """S7 — the frames Kafka source, fetch-tuned like the reference."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
    )
    for k, v in {**CONSUMER_OPTIONS, **(extra_options or {})}.items():
        reader = reader.option(k, v)
    return reader


def completions_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = COMPLETIONS_TOPIC,
) -> DataStreamReader:
    """S11 — completions consumer (small batches, own group id)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("maxOffsetsPerTrigger", "30")  # max_poll_records=10 × 3
        .option("kafka.group.id", "s3-video-uploader-group")
    )


def kafka_key_value(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """The exact record shape every keyed sink sends: utf-8 key (the
    video_id — per-video ordering within a partition, reference
    producer/video_producer.py:126-133) + string value.  Split out so
    broker-less e2e tests drive the identical projection into a memory
    sink (the sandbox has no Kafka broker)."""
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("string").alias("value"),
    )


def keyed_kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    key_col: str,
    value_col: str,
    checkpoint_location: str,
    extra_options: dict[str, str] | None = None,
) -> DataStreamWriter:
    """S6/S8/S9 — keyed Kafka sink with the reference's producer knobs.

    Keying by video_id preserves per-video ordering within a partition
    (reference producer/video_producer.py:126-133).  Spark's sink is
    batched/async by construction — the reference's hand-rolled async
    sends + fire-only callbacks (stream.py:528-545) need no analog.
    Checkpointing replaces the offset-commit cadence (W6).
    """
    out = kafka_key_value(df, key_col, value_col)
    writer = (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_location)
    )
    for k, v in {**PRODUCER_OPTIONS, **(extra_options or {})}.items():
        writer = writer.option(k, v)
    return writer


def batch_topic_inspector(
    spark: SparkSession, bootstrap_servers: str, topic: str, limit: int | None = None
) -> DataFrame:
    """S14 — ad-hoc topic scan (scripts/kafka_inspect.py:28-120) as a
    batch Kafka read; offsets/counts come free from the DataFrame."""
    df = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
        .select(
            "partition",
            "offset",
            F.col("key").cast("string").alias("key"),
            F.col("value").cast("string").alias("value"),
            "timestamp",
        )
    )
    return df.limit(limit) if limit else df
