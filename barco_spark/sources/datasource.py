"""`format("barco")`: the event log as a native Spark data source.

Spark 4's Python Data Source API lets the broker's consumer surface be
expressed the idiomatic way — `spark.read.format("barco")` /
`spark.readStream.format("barco")` — instead of only through the
`EventLog` facade:

- one InputPartition per (topic, bucket)  -> the reference's reader-per-
  (token, rangeIndex) fan-out (internal/data/segment_reader.go:54-195)
- offset discovery from parquet FOOTER statistics only (no data pages)
  -> producer.offset high watermark + sparse index seek (R5/R11,
  internal/data/offset_file_writer.go:16-47,
  internal/data/index_file_writer.go:77-90)
- streaming offsets {bucket: next} checkpointed by Spark
  -> committed consumer offsets (R8,
  internal/consuming/offset_state.go:456-490)
- `startingOffsets=earliest|latest`
  -> reset policies (R9, internal/types/models_offset.go:94-101)

Options: `path` (log root, required), `topic` (default: all topics for
batch, required for streaming), `buckets` (default 12),
`startingOffsets` (earliest|latest, default earliest),
`maxRecordsPerBucket` (per micro-batch rate limit — the analogue of the
2 MiB ConsumerReadThreshold R2, internal/conf/config.go:260-262).

Scale notes: offset discovery is footer-stats-only per bucket
directory; each micro-batch reads exactly the [start, end) slice per
bucket via a row-group–prunable `offset` predicate, so a 1000-executor
cluster fans out one task per bucket with no coordination. Reader code
runs in Python workers (driver side for offsets, executor side for
reads) — it uses pyarrow directly and never touches a SparkSession.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = (
    "topic string, partition_key string, timestamp timestamp, "
    "payload string, bucket int, offset bigint"
)

_PART_RE = re.compile(r"topic=([^/]+)/bucket=(\d+)/")


def _arrow_target_schema():
    import pyarrow as pa

    return pa.schema(
        [
            pa.field("topic", pa.string()),
            pa.field("partition_key", pa.string()),
            pa.field("timestamp", pa.timestamp("us")),
            pa.field("payload", pa.string()),
            pa.field("bucket", pa.int32()),
            pa.field("offset", pa.int64()),
        ]
    )


def _list_files(data_path: str, topic: str | None) -> dict[tuple[str, int], list[str]]:
    """Parquet files per (topic, bucket) under the hive-partitioned log."""
    out: dict[tuple[str, int], list[str]] = {}
    if not os.path.isdir(data_path):
        return out
    for dirpath, _dirs, files in os.walk(data_path):
        m = _PART_RE.search(dirpath + "/")
        if not m:
            continue
        tp, b = m.group(1), int(m.group(2))
        if topic is not None and tp != topic:
            continue
        for fn in files:
            if fn.endswith(".parquet"):
                out.setdefault((tp, b), []).append(os.path.join(dirpath, fn))
    return out


# Per-file row-group [min, max] offset stats, keyed by path. Log files
# are IMMUTABLE (each produce/compaction writes fresh part-<uuid> names,
# never rewriting in place), so a path's footer never changes and the
# memo needs no invalidation — a live poll loop then opens footers only
# for files that appeared since its last poll instead of re-reading the
# whole log's metadata per poll (measured: this plus the offsets-read
# cache is what keeps facade poll latency flat as the log grows).
_FOOTER_OFFSETS_CACHE: dict[str, list[tuple[int | None, int | None]]] = {}


def _footer_offsets(f: str) -> list[tuple[int | None, int | None]]:
    """[(min, max)] offset statistics per row group of one log file."""
    import pyarrow.parquet as pq

    cached = _FOOTER_OFFSETS_CACHE.get(f)
    if cached is not None:
        return cached
    md = pq.ParquetFile(f).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    rgs: list[tuple[int | None, int | None]] = []
    if "offset" in idx:
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx["offset"]).statistics
            if st is not None:
                rgs.append((st.min, st.max))
            else:
                rgs.append((None, None))
    if len(_FOOTER_OFFSETS_CACHE) > 131072:  # runaway-session backstop
        _FOOTER_OFFSETS_CACHE.clear()
    _FOOTER_OFFSETS_CACHE[f] = rgs
    return rgs


def _high_watermarks(data_path: str, topic: str) -> dict[int, int]:
    """Next offset per bucket from row-group max stats (footers only)."""
    wm: dict[int, int] = {}
    for (_tp, b), files in _list_files(data_path, topic).items():
        mx = -1
        for f in files:
            for _mn, rg_mx in _footer_offsets(f):
                if rg_mx is not None:
                    mx = max(mx, rg_mx)
        if mx >= 0:
            wm[b] = mx + 1
    return wm


def _read_slice(files: list[str], topic: str, bucket: int, start: int, end: int):
    """Yield arrow batches of rows with start <= offset < end.

    Row groups whose [min, max] offset stats fall outside the slice are
    skipped without reading data pages (the sparse-index seek R5).
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    target = _arrow_target_schema()
    for f in files:
        # memoized footer stats: files whose row groups all fall outside
        # the slice are skipped WITHOUT even a footer read once warm
        groups = [
            rg
            for rg, (mn, mx) in enumerate(_footer_offsets(f))
            if mn is not None and mx >= start and mn < end
        ]
        if not groups:
            continue
        pf = pq.ParquetFile(f)
        tbl = pf.read_row_groups(
            groups, columns=["partition_key", "timestamp", "payload", "offset"]
        )
        mask = pc.and_(
            pc.greater_equal(tbl["offset"], start), pc.less(tbl["offset"], end)
        )
        tbl = tbl.filter(mask)
        if tbl.num_rows == 0:
            continue
        n = tbl.num_rows
        tbl = tbl.append_column("topic", pa.array([topic] * n, pa.string()))
        tbl = tbl.append_column("bucket", pa.array([bucket] * n, pa.int32()))
        tbl = tbl.select([f.name for f in target]).cast(target)
        yield from tbl.to_batches()


@dataclass
class BucketSlice(InputPartition):
    files: list[str]
    topic: str
    bucket: int
    start: int
    end: int


class BarcoBatchReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.data_path = options["path"].rstrip("/") + "/data"
        self.topic = options.get("topic")

    def partitions(self):
        files = _list_files(self.data_path, self.topic)
        return [
            BucketSlice(fs, tp, b, 0, 2**63 - 1) for (tp, b), fs in sorted(files.items())
        ]

    def read(self, partition: BucketSlice):
        yield from _read_slice(
            partition.files,
            partition.topic,
            partition.bucket,
            partition.start,
            partition.end,
        )


class BarcoStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        if "topic" not in options:
            raise ValueError("streaming read requires option 'topic'")
        self.data_path = options["path"].rstrip("/") + "/data"
        self.topic = options["topic"]
        self.buckets = int(options.get("buckets", "12"))
        self.starting = options.get("startingoffsets", "earliest").lower()
        self.max_records = int(options.get("maxrecordsperbucket", "0"))
        # last known consumer position, fed by initialOffset()/commit();
        # None right after a checkpoint restart (Spark restores the
        # start from its offset log without telling the source)
        self._pos: dict[int, int] | None = None

    def initialOffset(self) -> dict:
        if self.starting == "latest":
            wm = _high_watermarks(self.data_path, self.topic)
        else:
            wm = {}
        off = {str(b): wm.get(b, 0) for b in range(self.buckets)}
        self._pos = {b: wm.get(b, 0) for b in range(self.buckets)}
        return off

    def latestOffset(self) -> dict:
        """Next batch end: high watermark, rate-capped per bucket (R2).

        The cap MUST be applied here, not in partitions(): Spark
        checkpoints this return value as the batch end, so trimming
        later would silently skip records. When the position is unknown
        the batch is uncapped — safe (no loss), just unthrottled once.
        The position is unknown exactly on the FIRST batch of every run:
        Spark calls latestOffset() before initialOffset() (fresh stream)
        and restores a restart's start from its own offset log without
        telling the source; capping blind could regress the end below
        that start and redeliver records. From the second batch on,
        commit() feedback makes the cap exact.
        """
        wm = _high_watermarks(self.data_path, self.topic)
        end = {b: wm.get(b, 0) for b in range(self.buckets)}
        if self.max_records > 0 and self._pos is not None:
            for b in range(self.buckets):
                floor = self._pos.get(b, 0)
                end[b] = max(floor, min(end[b], floor + self.max_records))
        self._pos = dict(end)
        return {str(b): v for b, v in end.items()}

    def partitions(self, start: dict, end: dict):
        files = _list_files(self.data_path, self.topic)
        parts = []
        for b in range(self.buckets):
            s, e = int(start.get(str(b), 0)), int(end.get(str(b), 0))
            if e > s:
                parts.append(BucketSlice(files.get((self.topic, b), []), self.topic, b, s, e))
        return parts

    def read(self, partition: BucketSlice):
        yield from _read_slice(
            partition.files,
            partition.topic,
            partition.bucket,
            partition.start,
            partition.end,
        )

    def commit(self, end: dict) -> None:
        # Spark's checkpoint IS the durable commit log (R8); just track
        # the position so the next latestOffset() can rate-cap from it.
        self._pos = {int(b): int(v) for b, v in end.items()}


class BarcoDataSource(DataSource):
    """`spark.dataSource.register(BarcoDataSource)` then format("barco")."""

    @classmethod
    def name(cls) -> str:
        return "barco"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return BarcoBatchReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return BarcoStreamReader(self.options)


def offsets_json(offsets: dict[int, int]) -> str:
    """Render {bucket: next} as the checkpoint JSON Spark stores."""
    return json.dumps({str(b): n for b, n in sorted(offsets.items())})
