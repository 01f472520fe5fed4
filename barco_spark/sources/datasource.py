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
import time
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


# (data_path, topic) -> (stamp, files). The stamp is every partition
# directory's (path, mtime_ns): adding/removing a file bumps its
# directory's mtime, so an unchanged stamp proves the walk would return
# the same listing. A poll loop then pays ~a dozen stat() calls per
# poll instead of re-walking the whole log (which grows with file
# count — the same flat-latency discipline as the footer-stats memo).
_LIST_FILES_CACHE: dict[
    tuple[str, str | None], tuple[tuple, dict[tuple[str, int], list[str]]]
] = {}

# Racy-stamp window (the make/git trick): kernel file timestamps come
# from the COARSE clock (~1-4 ms ticks on typical CONFIG_HZ), so two
# writes landing in the same tick leave a directory's mtime_ns
# unchanged. A stamp captured inside that tick could therefore go
# stale without detection — the next _high_watermarks() would miss the
# newest file and produce_arrow would re-assign already-used offsets.
# Guard: never CACHE a stamp whose newest mtime is within this window
# of "now"; such calls still return a correct fresh listing, they just
# don't memoize it. 50 ms comfortably covers jiffy granularity while
# keeping the memo effective for any poll loop slower than ~20 Hz per
# entry (entries older than the window cache normally).
_MTIME_RACE_NS = 50_000_000


def invalidate_list_cache(data_path: str, topic: str | None = None) -> None:
    """Drop memoized listings for ``data_path`` (one topic or all).

    In-process writers (``produce_arrow``, compaction) call this after
    appending a file so a same-tick mtime can never serve them a stale
    listing; cross-process writers are covered by the racy-stamp guard
    in ``_list_files``.
    """
    if topic is None:
        for k in [k for k in _LIST_FILES_CACHE if k[0] == data_path]:
            _LIST_FILES_CACHE.pop(k, None)
    else:
        _LIST_FILES_CACHE.pop((data_path, topic), None)
        _LIST_FILES_CACHE.pop((data_path, None), None)


def _list_files(data_path: str, topic: str | None) -> dict[tuple[str, int], list[str]]:
    """Parquet files per (topic, bucket) under the hive-partitioned log."""
    out: dict[tuple[str, int], list[str]] = {}
    if not os.path.isdir(data_path):
        return out
    # stamp pass: partition dirs + their mtimes (stat-only, no listing)
    part_dirs: list[tuple[str, str, int]] = []
    stamp_parts: list[tuple[str, int]] = []
    try:
        for tdir in sorted(os.listdir(data_path)):
            if not tdir.startswith("topic="):
                continue
            tp = tdir[len("topic="):]
            if topic is not None and tp != topic:
                continue
            tpath = os.path.join(data_path, tdir)
            for bdir in sorted(os.listdir(tpath)):
                if not bdir.startswith("bucket="):
                    continue
                try:
                    b = int(bdir[len("bucket="):])
                except ValueError:
                    continue  # not a partition dir (matches _PART_RE \d+)
                bpath = os.path.join(tpath, bdir)
                try:
                    st = os.stat(bpath)
                except FileNotFoundError:
                    continue  # concurrent retention delete
                part_dirs.append((tp, bpath, b))
                stamp_parts.append((bpath, st.st_mtime_ns))
    except FileNotFoundError:
        return out  # root vanished mid-scan
    key = (data_path, topic)
    stamp = tuple(stamp_parts)
    cached = _LIST_FILES_CACHE.get(key)
    if cached is not None and cached[0] == stamp:
        return cached[1]
    for tp, bpath, b in part_dirs:
        try:
            names = os.listdir(bpath)
        except FileNotFoundError:
            continue
        for fn in sorted(names):
            if fn.endswith(".parquet"):
                out.setdefault((tp, b), []).append(os.path.join(bpath, fn))
    if len(_LIST_FILES_CACHE) > 4096:  # runaway-session backstop
        _LIST_FILES_CACHE.clear()
    # racy-stamp guard: see _MTIME_RACE_NS. A stamp this fresh could be
    # invalidated by another write in the same coarse-clock tick, so
    # return the (correct) listing without memoizing it.
    now_ns = time.time_ns()
    if all(now_ns - m >= _MTIME_RACE_NS for _, m in stamp_parts):
        _LIST_FILES_CACHE[key] = (stamp, out)
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


def _read_slice(
    files: list[str],
    topic: str,
    bucket: int,
    start: int,
    end: int,
    columns: list[str] | None = None,
):
    """Yield arrow batches of rows with start <= offset < end.

    Row groups whose [min, max] offset stats fall outside the slice are
    skipped without reading data pages (the sparse-index seek R5).
    ``columns`` restricts the data columns decoded (must include
    "offset"); a live poll only needs (offset, payload), which halves
    the per-slice decode cost. Slice reads are small by construction,
    so the arrow thread pool is overhead, not parallelism —
    single-threaded decode measured ~30% faster at poll sizes.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    data_cols = columns or ["partition_key", "timestamp", "payload", "offset"]
    target = _arrow_target_schema()
    target = pa.schema(
        [f for f in target if f.name in data_cols or f.name in ("topic", "bucket")]
    )
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
        tbl = pf.read_row_groups(groups, columns=data_cols, use_threads=False)
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
