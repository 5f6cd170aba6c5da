"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic-events generator.

The reference's only custom I/O is JDBC through stock Spark
(hll/PostgresInteropTest.scala:21-35); this engine additionally shows
the modern extension seam — a first-class ``spark.read.format(...)``
source implemented in Python, planned and parallelized by Spark like
any other scan.

Scale design: the generator is *partitioned* — ``partitions()`` returns
``numPartitions`` independent slices, each producing its rows from a
closed-form row formula (no shared RNG state), so a 1000-executor
cluster generates 1000 slices concurrently with zero coordination.  The
same closed form makes the source oracle-checkable: DuckDB reproduces
it exactly with ``generate_series``.

Row formula (i = global row index, Knuth multiplicative hashing):
    event_id   = i
    user_id    = (i * 2654435761) % n_users
    event_type = TYPES[(i * 40503) % 5]
    value      = ((i * 37) % 1000) / 10.0
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

TYPES = ["click", "view", "purchase", "signup", "error"]


class SynthEventsDataSource(DataSource):
    """``spark.read.format("synth_events").option("n", ...).load()``"""

    @classmethod
    def name(cls) -> str:
        return "synth_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double"

    def reader(self, schema) -> "SynthEventsReader":
        return SynthEventsReader(
            n=int(self.options.get("n", 1000)),
            n_users=int(self.options.get("n_users", 100)),
            num_partitions=int(self.options.get("numpartitions", 8)),
        )

    def simpleStreamReader(self, schema) -> "SynthEventsSimpleStreamReader":
        return SynthEventsSimpleStreamReader(
            n=int(self.options.get("n", 1000)),
            n_users=int(self.options.get("n_users", 100)),
            batch=int(self.options.get("batchsize", 500)),
        )


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SynthEventsReader(DataSourceReader):
    def __init__(self, n: int, n_users: int, num_partitions: int):
        self.n, self.n_users, self.num_partitions = n, n_users, num_partitions

    def partitions(self):
        per = -(-self.n // self.num_partitions)  # ceil
        return [
            _Slice(lo, min(lo + per, self.n))
            for lo in range(0, self.n, per)
        ]

    def read(self, partition: _Slice):
        n_users = self.n_users
        for i in range(partition.start, partition.end):
            yield (
                i,
                (i * 2654435761) % n_users,
                TYPES[(i * 40503) % 5],
                ((i * 37) % 1000) / 10.0,
            )


def register(spark) -> None:
    spark.dataSource.register(SynthEventsDataSource)


def oracle_sql(n: int, n_users: int) -> str:
    """DuckDB SQL producing the identical relation via the closed-form
    row formula."""
    types = ", ".join(f"'{t}'" for t in TYPES)
    return f"""
    SELECT i AS event_id,
           (i * 2654435761) % {n_users} AS user_id,
           [{types}][1 + (i * 40503) % 5] AS event_type,
           ((i * 37) % 1000) / 10.0 AS value
    FROM generate_series(0, {n - 1}) t(i)
    """


# ---------------------------------------------------------------------------
# Streaming flavor: the same closed-form generator as a Structured
# Streaming source (Spark 4 SimpleDataSourceStreamReader).
# ---------------------------------------------------------------------------


class SynthEventsSimpleStreamReader(SimpleDataSourceStreamReader):
    """Micro-batches of ``batchsize`` rows from the same row formula as
    the batch reader; offsets are just the next global row index, so
    replay (``readBetweenOffsets``) regenerates any batch exactly —
    the deterministic-replay contract Structured Streaming recovery
    assumes, with zero state beyond the offset."""

    def __init__(self, n: int, n_users: int, batch: int):
        self.n, self.n_users, self.batch = n, n_users, batch

    def initialOffset(self):
        return {"i": 0}

    def _rows(self, lo: int, hi: int):
        for i in range(lo, hi):
            yield (
                i,
                (i * 2654435761) % self.n_users,
                TYPES[(i * 40503) % 5],
                ((i * 37) % 1000) / 10.0,
            )

    def read(self, start):
        lo = int(start["i"])
        hi = min(lo + self.batch, self.n)
        # iterator over a MATERIALIZED list — both halves matter.
        # Materialized: the wrapper's prefetch cache copy.copy()s the
        # iterator per replay, which needs a list_iterator, not a live
        # generator.  Iterator: when the stream drains (end == start)
        # the wrapper probes emptiness with next(it); handed a bare
        # list that raises TypeError and kills the query at the tail
        # of an availableNow drain instead of finishing cleanly.
        return iter(list(self._rows(lo, hi))), {"i": hi}

    def readBetweenOffsets(self, start, end):
        # MUST be an iterator, not a list: the recovery-replay runner
        # validates with isinstance(..., Iterator) and rejects lists
        # (DATA_SOURCE_INVALID_RETURN_TYPE) — unlike the prefetch path
        # behind read(), which accepts any iterable.  iter() over a
        # materialized list keeps the rows picklable AND satisfies the
        # check.
        return iter(list(self._rows(int(start["i"]), int(end["i"]))))


# ---------------------------------------------------------------------------
# Python data source WRITER: a JSONL sink with the two-phase task-temp /
# driver-commit protocol (Spark 4 DataSourceWriter API).
# ---------------------------------------------------------------------------

from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _JsonlCommit(WriterCommitMessage):
    tmp_path: str
    n_rows: int


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonl_sink").option("path", dir).save()`` —
    newline-delimited JSON with ATOMIC publication: every task writes a
    temp file and returns it as a commit message; the driver-side
    ``commit`` renames all temps into place and drops a ``_SUCCESS``
    marker, ``abort`` removes them — the same two-phase contract
    FileOutputCommitter gives JVM sinks, here at the Python extension
    seam.  Local/shared filesystem only (rename-based publication),
    like sources/io.py::compact_table."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> "JsonlWriter":
        return JsonlWriter(self.options["path"], overwrite)


class JsonlWriter(DataSourceWriter):
    def __init__(self, path: str, overwrite: bool):
        import uuid

        self.path, self.overwrite = path, overwrite
        # unique per save: append-mode commits must never collide with
        # (and os.replace over) part files published by an earlier save
        self.commit_id = uuid.uuid4().hex[:12]

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp_{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonlCommit(tmp_path=tmp, n_rows=n)

    def commit(self, messages):
        import os

        if self.overwrite:
            for name in os.listdir(self.path):
                if name.startswith("part-") or name == "_SUCCESS":
                    os.remove(os.path.join(self.path, name))
        for i, m in enumerate(messages):
            os.replace(
                m.tmp_path,
                os.path.join(self.path, f"part-{self.commit_id}-{i:05d}.jsonl"),
            )
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write("")

    def abort(self, messages):
        import os

        for m in messages:
            try:
                os.remove(m.tmp_path)
            except OSError:
                pass


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
