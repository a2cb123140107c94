"""Kinesis-like replay source as a Spark 4 Python Data Source (A1 parity).

The reference consumes a sharded record stream with per-record partition
keys and a configurable start position (FirehoseStreamingSinkJob.java:32-38,
position LATEST at line 36). This module re-expresses that contract as a
native PySpark data source — no external service: "shards" are JSON-lines
files (`shard-*.jsonl`) in a directory, one record per line, carrying
`partition_key` and `data` exactly like a Kinesis record.

Batch: one InputPartition per shard file → executors read shards in
parallel (Kinesis consumer-per-shard model); the driver never touches
record payloads.

Streaming: offsets are `{shard_name: lines_consumed}` dicts; each
micro-batch drains up to `batch_size` new lines per shard.
`starting_position=trim_horizon` replays from the beginning,
`latest` starts from the current end of every shard (the reference's
`STREAM_INITIAL_POSITION: LATEST`). `readBetweenOffsets` makes recovery
deterministic after a restart.

Usage:
    spark.dataSource.register(KinesisReplaySource)
    df = spark.read.format("kinesis_replay").option("path", shard_dir).load()
    sdf = (spark.readStream.format("kinesis_replay")
                .option("path", shard_dir)
                .option("starting_position", "trim_horizon").load())
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

RECORD_SCHEMA = StructType(
    [
        StructField("shard", StringType()),
        StructField("partition_key", StringType()),
        StructField("data", StringType()),
        StructField("sequence_number", LongType()),
    ]
)


def _shard_files(path: str) -> list[str]:
    return sorted(
        f for f in os.listdir(path) if f.startswith("shard-") and f.endswith(".jsonl")
    )


def _read_lines(path: str, shard: str, start: int, end: int | None) -> Iterator[tuple]:
    """Yield (shard, partition_key, data, seq) for lines start..end of one shard."""
    with open(os.path.join(path, shard)) as f:
        for seq, line in enumerate(f):
            if seq < start:
                continue
            if end is not None and seq >= end:
                break
            if not line.strip():
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError as ex:
                raise ValueError(
                    f"kinesis_replay: malformed record at {shard}:{seq}: {ex}"
                ) from ex
            yield (shard, rec.get("partition_key"), rec.get("data"), seq)


def _require_path(options) -> str:
    path = options.get("path")
    if not path:
        raise ValueError(
            "kinesis_replay requires .option('path', <shard directory>)"
        )
    return path


class _ShardPartition(InputPartition):
    def __init__(self, shard: str | None):
        self.shard = shard


class _ReplayBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = _require_path(options)

    def partitions(self):
        # one partition per shard file — shard-parallel scan, like one
        # Kinesis consumer per shard. An empty stream still needs one
        # (empty) partition: Spark hands read() a None partition if the
        # list is empty.
        shards = _shard_files(self.path)
        if not shards:
            return [_ShardPartition(None)]
        return [_ShardPartition(s) for s in shards]

    def read(self, partition: _ShardPartition):
        if partition is None or partition.shard is None:
            return
        yield from _read_lines(self.path, partition.shard, 0, None)


class _ReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.path = _require_path(options)
        self.batch_size = int(options.get("batch_size", "1000"))
        self.start_pos = options.get("starting_position", "trim_horizon").lower()

    def _current_ends(self) -> dict[str, int]:
        ends = {}
        for shard in _shard_files(self.path):
            with open(os.path.join(self.path, shard)) as f:
                ends[shard] = sum(1 for _ in f)
        return ends

    def initialOffset(self) -> dict:
        if self.start_pos == "latest":
            return self._current_ends()
        return {s: 0 for s in _shard_files(self.path)}

    def read(self, start: dict):
        ends = self._current_ends()
        out = []
        new_offset = dict(start)
        for shard, end in ends.items():
            lo = start.get(shard, 0)
            hi = min(end, lo + self.batch_size)
            out.extend(_read_lines(self.path, shard, lo, hi))
            new_offset[shard] = hi
        return iter(out), new_offset

    def readBetweenOffsets(self, start: dict, end: dict):
        out = []
        for shard, hi in end.items():
            out.extend(_read_lines(self.path, shard, start.get(shard, 0), hi))
        return iter(out)

    def commit(self, end: dict) -> None:
        pass  # files are immutable; nothing to acknowledge


class KinesisReplaySource(DataSource):
    """`kinesis_replay` — sharded JSON-lines replay with Kinesis semantics."""

    @classmethod
    def name(cls) -> str:
        return "kinesis_replay"

    def schema(self):
        return RECORD_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _ReplayBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _ReplayStreamReader(self.options)


def write_shards(path: str, records: list[tuple[str, str]], n_shards: int = 2) -> None:
    """Test/demo helper: distribute (partition_key, data) records across
    shard files by hash of the partition key — Kinesis' shard routing."""
    os.makedirs(path, exist_ok=True)
    buckets: dict[int, list] = {i: [] for i in range(n_shards)}
    for pk, data in records:
        buckets[hash(pk) % n_shards].append({"partition_key": pk, "data": data})
    for i, rows in buckets.items():
        with open(os.path.join(path, f"shard-{i:05d}.jsonl"), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
