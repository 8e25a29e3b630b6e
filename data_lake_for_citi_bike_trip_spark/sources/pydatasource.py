"""Custom Python data source (Spark 4 DataSource API).

Demonstrates the source-extension surface the engine would use for a
feed Spark has no built-in connector for (an internal queue, a
proprietary scan service): a ``DataSource`` subclass registered by
format name, planning ``InputPartition``s on the driver and reading
each partition EXECUTOR-side. The reader yields **pyarrow
RecordBatches** (the vectorized path — rows cross the Python/JVM
boundary as Arrow buffers, not per-row tuples), and generation is
numpy-vectorized, so the per-row-Python anti-pattern never appears.

The synthetic feed is deterministic pure arithmetic so the DuckDB
oracle can reproduce it from ``generate_series`` — making the
source-extension plumbing itself oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class SynthEventsDataSource(DataSource):
    """``spark.read.format("synth_events")`` — options:

    - ``rows``  total row count (default 10000)
    - ``parts`` planned input partitions (default 8)

    Row ``i`` (0 <= i < rows): (event_id=i, user_id=i % 97,
    amount_cents=(i * 37) % 10000) — pure integer arithmetic.
    """

    @classmethod
    def name(cls) -> str:
        return "synth_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, amount_cents bigint"

    def reader(self, schema) -> "SynthEventsReader":
        return SynthEventsReader(self.options)


class SynthEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", "10000"))
        self.parts = int(options.get("parts", "8"))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        import numpy as np
        import pyarrow as pa

        # contiguous id range per partition: partition p owns
        # [p*chunk, min((p+1)*chunk, rows))
        chunk = -(-self.rows // self.parts)
        lo = partition.value * chunk
        hi = min(lo + chunk, self.rows)
        if lo >= hi:
            return
        ids = np.arange(lo, hi, dtype=np.int64)
        yield pa.record_batch(
            [
                pa.array(ids),
                pa.array(ids % 97),
                pa.array((ids * 37) % 10000),
            ],
            names=["event_id", "user_id", "amount_cents"],
        )


def register(spark) -> None:
    """Idempotent format registration.

    Also pins ``spark`` as the active session: format lookup resolves
    Python sources via the ACTIVE session's DataSourceManager (see
    session.ensure_active), so registering on a non-active session
    would be silently useless.
    """
    from ..session import ensure_active

    spark.dataSource.register(SynthEventsDataSource)
    ensure_active(spark)


# ---------------------------------------------------------------------------
# Streaming side of the same source: SimpleDataSourceStreamReader (Spark 4).
# The micro-batch contract is offset-based — initialOffset/latestOffset
# bound each batch, read(start) returns (rows, next_offset) — so replay
# after failure re-reads the same offset range: exactly the semantics a
# queue/CDC connector needs. Deterministic arithmetic keeps it
# oracle-checkable end to end.
# ---------------------------------------------------------------------------


class SynthEventsStreamSource(DataSource):
    """``spark.readStream.format("synth_events_stream")`` — options:

    - ``rows``      total rows the feed will ever serve (default 10000)
    - ``batch_rows`` rows advanced per micro-batch (default 4000)

    Same row arithmetic as the batch source, emitted in offset order.
    """

    @classmethod
    def name(cls) -> str:
        return "synth_events_stream"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, amount_cents bigint"

    def simpleStreamReader(self, schema):
        from pyspark.sql.datasource import SimpleDataSourceStreamReader

        rows = int(self.options.get("rows", "10000"))
        batch_rows = int(self.options.get("batch_rows", "4000"))

        class Reader(SimpleDataSourceStreamReader):
            def initialOffset(self):
                return {"pos": 0}

            def read(self, start):
                lo = start["pos"]
                hi = min(lo + batch_rows, rows)
                data = [
                    (i, i % 97, (i * 37) % 10000) for i in range(lo, hi)
                ]
                return iter(data), {"pos": hi}

            def readBetweenOffsets(self, start, end):
                return iter(
                    (i, i % 97, (i * 37) % 10000)
                    for i in range(start["pos"], end["pos"])
                )

        return Reader()


def register_stream(spark) -> None:
    """Idempotent streaming-format registration (see register())."""
    from ..session import ensure_active

    spark.dataSource.register(SynthEventsStreamSource)
    ensure_active(spark)


# ---------------------------------------------------------------------------
# Writer side of the Python DataSource API (Spark 4): executor-side
# partition writes + a driver-side two-phase commit. This is the
# connector shape for a sink Spark has no built-in writer for (an
# internal service, a queue): each task stages its partition to a
# uniquely-named temp file and reports it in a WriterCommitMessage;
# only the driver's commit() publishes staged files into data/ — so a
# failed/speculated task can never leave a half-visible partition, and
# abort() removes the staging leftovers. Content is line-delimited JSON
# with sorted keys, making the round-trip oracle-checkable.
# ---------------------------------------------------------------------------


class JsonDirCommit(WriterCommitMessage):
    """Per-task commit message: the staged file name + its row count.
    Module-level so the executor->driver pickle round-trip is plain."""

    def __init__(self, fname: str, rows: int):
        self.fname = fname
        self.rows = rows


class JsonDirDataSource(DataSource):
    """``df.write.format("jsondir").option("path", dir).save()``."""

    @classmethod
    def name(cls) -> str:
        return "jsondir"

    def writer(self, schema, overwrite: bool):
        return JsonDirWriter(
            self.options, [f.name for f in schema.fields], overwrite
        )


class JsonDirWriter(DataSourceWriter):
    def __init__(self, options, field_names, overwrite=False):
        self.path = options["path"]
        self.fields = field_names
        self.overwrite = overwrite

    def write(self, iterator):
        """Executor-side: stage this partition to _staging/<uuid>."""
        import json as _json
        import os
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        fname = f"{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(staging, fname), "w") as fh:
            for row in iterator:
                fh.write(
                    _json.dumps(
                        dict(zip(self.fields, tuple(row))), sort_keys=True
                    )
                )
                fh.write("\n")
                n += 1
        return JsonDirCommit(fname, n)

    def commit(self, messages):
        """Driver-side publish: move every staged file into data/.

        Overwrite semantics live HERE, not in write(): clearing the old
        data/ only at commit time keeps the two-phase property — a
        failed job aborts with the previous save still fully visible,
        never a half-cleared directory."""
        import os
        import shutil

        data = os.path.join(self.path, "data")
        if self.overwrite and os.path.isdir(data):
            shutil.rmtree(data)
        os.makedirs(data, exist_ok=True)
        for i, m in enumerate(messages):
            shutil.move(
                os.path.join(self.path, "_staging", m.fname),
                os.path.join(data, f"part-{i:05d}.jsonl"),
            )
        shutil.rmtree(
            os.path.join(self.path, "_staging"), ignore_errors=True
        )

    def abort(self, messages):
        import os
        import shutil

        shutil.rmtree(
            os.path.join(self.path, "_staging"), ignore_errors=True
        )
        os.makedirs(os.path.join(self.path, "_staging"), exist_ok=True)


def register_sink(spark) -> None:
    """Idempotent format registration (see register())."""
    from ..session import ensure_active

    spark.dataSource.register(JsonDirDataSource)
    ensure_active(spark)
