"""Audit sink (Spark 4 Python DataSource writer API).

The write-side counterpart of sources/eventgen: demonstrates the
two-phase executor→driver commit protocol (write → WriterCommitMessage
→ commit/abort) by materializing the reference's write-verification
idiom (run-all.sh's post-job count checks; io.py S11) as a SINK — every
task reports its row count and a content checksum, and only the driver's
commit() publishes the audit file. A failed/retried task's message is
simply dropped by Spark, so the audit reflects exactly-once task output
even under speculation.

Usage::

    spark.dataSource.register(AuditSinkDataSource)
    df.write.format("auditsink").option("path", p).mode("append").save()

The audit JSON records {rows, checksum, partitions} — a downstream stage
asserts its input matches the producer's audit before trusting it.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage


@dataclass
class _TaskAudit(WriterCommitMessage):
    rows: int
    checksum: int


class _Writer(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("auditsink requires option 'path'")

    def write(self, iterator) -> _TaskAudit:
        import hashlib

        rows = 0
        checksum = 0
        for row in iterator:
            rows += 1
            # order-insensitive content checksum (sum of per-row md5
            # prefixes mod 2^61): stable across partitionings, shuffles,
            # AND processes — Python's builtin hash() is salted per
            # interpreter for strings, so it must not be used here
            digest = hashlib.md5(repr(tuple(row)).encode()).digest()
            checksum = (checksum + int.from_bytes(digest[:8], "big")) % (1 << 61)
        return _TaskAudit(rows=rows, checksum=checksum)

    def commit(self, messages) -> None:
        audit = {
            "rows": sum(m.rows for m in messages),
            "checksum": sum(m.checksum for m in messages) % (1 << 61),
            "partitions": len(messages),
        }
        # publish atomically (tmp + rename): a reader never observes a
        # torn audit, and abort() can clean the tmp without ever touching
        # a PREVIOUS successful run's audit — the old spelling deleted
        # self.path on abort, destroying the prior artifact when a later
        # write failed (r12 review; contradicts the two-phase contract
        # this sink exists to demonstrate)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(audit, f)
        os.replace(tmp, self.path)

    def abort(self, messages) -> None:
        tmp = self.path + ".tmp"
        if os.path.exists(tmp):
            os.remove(tmp)


class AuditSinkDataSource(DataSource):
    @classmethod
    def name(cls):
        return "auditsink"

    def writer(self, schema, overwrite):
        return _Writer(self.options)
