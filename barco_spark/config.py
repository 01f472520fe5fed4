"""Engine configuration, mirroring the reference broker's defaults.

Reference: /root/reference/internal/conf/config.go (defaults) and
/root/reference/internal/conf/constants.go.  Sizes and intervals that
governed the broker's I/O path map onto Spark trigger/file-size knobs;
ring arithmetic maps onto a fixed bucket count.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    # Ring / partitioning (reference: docs/features/partitioning/README.md:8-14,
    # internal/conf/config.go:248-250 — consumerRanges default 4; 3-broker base
    # cluster => 12 buckets).  In Spark the bucket count is decoupled from
    # cluster size on purpose (SURVEY.md §7d): scaling executors never forces
    # an offset re-projection.
    brokers: int = 3
    consumer_ranges: int = 4

    # Topics (internal/conf/constants.go:54)
    max_topic_length: int = 255

    # Write path (internal/conf/config.go:252-258, 286-289, 320-330)
    max_message_size_bytes: int = 1024 * 1024          # per-request body cap
    # Binary produce frames are bounded by the reference's shared buffer
    # pool, NOT by MaxMessageSize (bufferPool.Get(BodyLength) can never
    # serve more than the whole pool; config.go:69
    # defaultProducerBufferPoolSize = 32 * MiB) — a multi-message frame
    # over 1 MiB total is legal on the wire and must stay legal here.
    producer_buffer_pool_bytes: int = 32 * 1024 * 1024
    max_group_size_bytes: int = 2 * 1024 * 1024        # coalescer group
    segment_buffer_bytes: int = 8 * 1024 * 1024        # aligned write buffer
    max_segment_bytes: int = 1024 * 1024 * 1024        # segment roll size
    flush_interval_ms: int = 2000                      # segment flush timer

    # Read path (internal/conf/config.go:260-266, 273-276)
    consumer_read_threshold_bytes: int = 2 * 1024 * 1024
    auto_commit_interval_ms: int = 5000
    consumer_inactivity_timeout_s: int = 120

    # Retention (internal/conf/config.go:291-302)
    retention_hours: int = 168

    # Chunk/segment compression level. Default 3 = the reference's
    # zstd.SpeedDefault (internal/producing/coalescer.go:49 parity).
    # The tuned profile (throughput.py --tuned) drops to 1: the r8
    # study measured ~17% more produce throughput at zstd-1 on this
    # payload mix, rejected for the PARITY benchmark only.
    zstd_level: int = 3

    # Consumer-offsets store: the reference upserts into SQLite
    # (internal/localdb/migrations.go:37-48) so its store is always
    # compact; our append-only parquet log compacts itself once it
    # accumulates this many files (checked on goodbye()).
    offsets_compact_threshold: int = 64

    # Spark-side tuning
    shuffle_partitions: int = field(
        default_factory=lambda: int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )

    @property
    def buckets(self) -> int:
        """Total log buckets = brokers x consumerRanges (default 12).

        Reference: docs/features/partitioning/README.md:8-11.
        """
        return self.brokers * self.consumer_ranges


DEFAULT = EngineConfig()
