"""In-executor synthetic events source (Spark 4 Python DataSource API).

The scale-testing source: generates the ``events`` schema directly inside
executors — no files, no driver materialization — so a 10-billion-row
load test is ``spark.read.format("eventgen").option("rows", 1e10)`` with
IO cost zero. The reference's test-data path writes CSVs and reads them
back (run-all.sh stage 1); this is the Spark-native equivalent of its
generator, expressed as a first-class source.

Determinism: every field derives from splitmix64 mixing of
``(seed, global_row_index)`` — a counter-based scheme with no RNG state,
so any partitioning of the row range yields identical data (the property
that makes the source safe under speculative execution and retries).
Rows are emitted as Arrow RecordBatches built with vectorized numpy —
the fast path of the Python source API (no per-row Python objects).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_M = (1 << 64) - 1
EVENT_TYPES = ["click", "view", "purchase", "scroll"]
SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _mix(x):
    """splitmix64 finalizer over a numpy uint64 array (vectorized)."""
    import numpy as np

    z = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(_M)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9) & np.uint64(_M)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB) & np.uint64(_M)
    return z ^ (z >> np.uint64(31))


@dataclass
class _Range(InputPartition):
    start: int
    end: int
    seed: int
    n_users: int
    start_us: int
    span_us: int


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(float(options.get("rows", 10_000)))
        self.parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))
        self.n_users = int(options.get("users", max(1, self.rows // 20)))
        # one simulated week ending 2001-01-08 (µs precision)
        self.start_us = 978_307_200 * 1_000_000
        self.span_us = 7 * 24 * 3600 * 1_000_000

    def partitions(self):
        per = -(-self.rows // self.parts)
        return [
            _Range(i * per, min((i + 1) * per, self.rows), self.seed,
                   self.n_users, self.start_us, self.span_us)
            for i in range(self.parts)
            if i * per < self.rows
        ]

    def read(self, part: _Range):
        import numpy as np
        import pyarrow as pa

        idx = np.arange(part.start, part.end, dtype=np.uint64)
        salt = np.uint64(part.seed) << np.uint64(32)
        # one independent splitmix stream per column: deriving two columns
        # from one hash (e.g. event_type and user_id both from h2) collapses
        # their joint distribution — |user×event_type| would be n_users
        # instead of 4·n_users — which defeats a load-test generator
        h1 = _mix(idx + salt)
        h2 = _mix(idx + salt + np.uint64(1 << 20))
        h3 = _mix(idx + salt + np.uint64(2 << 20))
        h4 = _mix(idx + salt + np.uint64(3 << 20))
        h5 = _mix(idx + salt + np.uint64(4 << 20))
        ts_us = part.start_us + (h1 % np.uint64(part.span_us)).astype(np.int64)
        etype = np.array(EVENT_TYPES)[(h2 % np.uint64(4)).astype(np.int64)]
        k = (h5 % np.uint64(100)).astype(np.int64)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(idx.astype(np.int64)),
                pa.array(ts_us, type=pa.timestamp("us")),
                pa.array((h4 % np.uint64(part.n_users)).astype(np.int64)),
                pa.array(etype),
                pa.array((h3 % np.uint64(100_000)).astype(np.int64) / 100.0),
                pa.array([f'{{"k": {v}}}' for v in k]),
            ],
            names=["event_id", "ts", "user_id", "event_type", "value", "props"],
        )


class EventGenDataSource(DataSource):
    """``spark.read.format("eventgen")`` after
    ``spark.dataSource.register(EventGenDataSource)``. Options: rows,
    partitions, seed, users."""

    @classmethod
    def name(cls):
        return "eventgen"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return _Reader(self.options)

    def streamReader(self, schema):
        return _StreamReader(self.options)


class _StreamReader(DataSourceStreamReader):
    """Micro-batch reader over the same counter-based row space: the
    offset is simply "rows generated so far", each latestOffset() call
    advances it by ``rows_per_batch``, and batch [start, end) reuses the
    exact batch-read generator — so the stream replays deterministically
    from any checkpointed offset (the replayability contract a file/
    Kafka source provides, here from arithmetic alone)."""

    def __init__(self, options):
        self._r = _Reader(options)
        self.rows_per_batch = int(options.get("rowsPerBatch", 1_000))
        self.max_rows = int(float(options.get("rows", 10_000)))
        self._emitted = 0

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        self._emitted = min(self._emitted + self.rows_per_batch, self.max_rows)
        return {"row": self._emitted}

    def partitions(self, start: dict, end: dict):
        r = self._r
        lo, hi = start["row"], end["row"]
        # A restarted query re-instantiates this reader with _emitted = 0
        # while the checkpoint replays from a committed offset — clamp the
        # counter forward so latestOffset() never regresses below the
        # committed position (the replayability contract in the docstring).
        self._emitted = max(self._emitted, lo)
        per = -(-max(hi - lo, 0) // r.parts) or 1
        return [
            _Range(lo + i * per, min(lo + (i + 1) * per, hi), r.seed,
                   r.n_users, r.start_us, r.span_us)
            for i in range(r.parts)
            if lo + i * per < hi
        ]

    def read(self, partition: _Range):
        return self._r.read(partition)

    def commit(self, end: dict) -> None:
        pass  # nothing external to clean up — offsets ARE the state
