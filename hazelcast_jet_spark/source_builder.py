"""SourceBuilder — Jet's custom-source escape hatch, on Spark 4's Python
Data Source API.

Reference: hazelcast-jet-core/.../pipeline/SourceBuilder.java
(``SourceBuilder.batch`` :197, ``SourceBuilder.stream`` :264,
``timestampedStream`` :331; the buffer contract is
SourceBuilder.SourceBuffer).  Jet's contract is ``createFn(ctx) → state``
plus ``fillBufferFn(state, buffer)`` called repeatedly until the fn calls
``buffer.close()``.

Spark mapping: each input partition runs its own create/fill loop (Jet:
one per processor instance; use ``.distributed(n)`` for n partitions) and
rows flow into the plan like any scan — filters/pruning still apply above
it.  The streaming variant maps onto the offset-based replayable-source
contract (``SimpleDataSourceStreamReader``): the user's ``poll_fn(state,
start_offset)`` returns (rows, next_offset) and ``replay_fn(state, start,
end)`` re-produces a committed range — strictly stronger than Jet's
snapshot-replay (exactly-once across restarts comes from the offset log,
ProcessingGuarantee.EXACTLY_ONCE ≡ checkpointed offsets here).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession


class SourceBuffer:
    """SourceBuilder.SourceBuffer — ``add`` items, ``close`` to end the
    source (this partition's fill loop stops being called)."""

    def __init__(self) -> None:
        self.items: list = []
        self.closed = False

    def add(self, item: Any) -> None:
        self.items.append(item)

    def close(self) -> None:
        self.closed = True


class SourceBuilder:
    """Entry points mirroring SourceBuilder.batch/stream (Java :197/:264)."""

    @staticmethod
    def batch(name: str) -> "BatchSourceBuilder":
        return BatchSourceBuilder(name)

    @staticmethod
    def stream(name: str) -> "StreamSourceBuilder":
        return StreamSourceBuilder(name)


class BatchSourceBuilder:
    def __init__(self, name: str):
        self._name = name
        self._schema: str | None = None
        self._create: Callable[[int], Any] | None = None
        self._fill: Callable[[Any, SourceBuffer], None] | None = None
        self._parallelism = 1

    def schema(self, ddl: str) -> "BatchSourceBuilder":
        self._schema = ddl
        return self

    def create(self, create_fn: Callable[[int], Any]) -> "BatchSourceBuilder":
        """``createFn(partition_index) -> state`` (ctx ≡ partition index)."""
        self._create = create_fn
        return self

    def fill(self, fill_fn: Callable[[Any, SourceBuffer], None]) -> "BatchSourceBuilder":
        """``fillBufferFn(state, buffer)`` — called until buffer.close()."""
        self._fill = fill_fn
        return self

    def distributed(self, parallelism: int) -> "BatchSourceBuilder":
        """SourceBuilder.distributed(preferredLocalParallelism): one
        create/fill loop per partition."""
        self._parallelism = parallelism
        return self

    def build(self, spark: SparkSession) -> DataFrame:
        """Register the data source and return the DataFrame."""
        from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

        if not (self._schema and self._fill):
            raise ValueError("SourceBuilder.batch needs .schema() and .fill()")
        src_name, schema_ddl = self._name, self._schema
        create_fn = self._create or (lambda idx: None)
        fill_fn, nparts = self._fill, self._parallelism

        class _Reader(DataSourceReader):
            def partitions(self):
                return [InputPartition(i) for i in range(nparts)]

            def read(self, partition):
                state = create_fn(partition.value)
                buf = SourceBuffer()
                while not buf.closed:
                    buf.items = []
                    fill_fn(state, buf)
                    yield from buf.items

        class _Source(DataSource):
            @classmethod
            def name(cls):
                return src_name

            def schema(self):
                return schema_ddl

            def reader(self, schema):
                return _Reader()

        spark.dataSource.register(_Source)
        return spark.read.format(src_name).load()


class StreamSourceBuilder:
    def __init__(self, name: str):
        self._name = name
        self._schema: str | None = None
        self._create: Callable[[], Any] | None = None
        self._poll: Callable | None = None
        self._replay: Callable | None = None
        self._initial_offset: dict = {"offset": 0}

    def schema(self, ddl: str) -> "StreamSourceBuilder":
        self._schema = ddl
        return self

    def create(self, create_fn: Callable[[], Any]) -> "StreamSourceBuilder":
        self._create = create_fn
        return self

    def initial_offset(self, offset: dict) -> "StreamSourceBuilder":
        self._initial_offset = offset
        return self

    def poll(self, poll_fn: Callable[[Any, dict], tuple[list, dict]]) -> "StreamSourceBuilder":
        """``poll_fn(state, start_offset) -> (rows, next_offset)`` — the
        fillBufferFn analog; offsets make the emission replayable."""
        self._poll = poll_fn
        return self

    def replay(self, replay_fn: Callable[[Any, dict, dict], list]) -> "StreamSourceBuilder":
        """``replay_fn(state, start, end) -> rows`` — re-produce a
        committed range after restart (exactly-once recovery path)."""
        self._replay = replay_fn
        return self

    def build(self, spark: SparkSession) -> DataFrame:
        from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

        if not (self._schema and self._poll):
            raise ValueError("SourceBuilder.stream needs .schema() and .poll()")
        src_name, schema_ddl = self._name, self._schema
        create_fn = self._create or (lambda: None)
        poll_fn, replay_fn = self._poll, self._replay
        init_off = dict(self._initial_offset)

        class _StreamReader(SimpleDataSourceStreamReader):
            def __init__(self):
                self._state = create_fn()

            def initialOffset(self):
                return dict(init_off)

            def read(self, start):
                rows, nxt = poll_fn(self._state, start)
                return iter(rows), nxt

            def readBetweenOffsets(self, start, end):
                if replay_fn is None:
                    # re-polling would return whatever is available NOW,
                    # not the committed [start, end) range — silently
                    # breaking recovery; fail fast instead
                    raise RuntimeError(
                        "SourceBuilder.stream: restart recovery needs "
                        ".replay(fn) to re-produce the committed offset "
                        "range (a poll fn cannot be assumed deterministic)"
                    )
                return iter(replay_fn(self._state, start, end))

        class _Source(DataSource):
            @classmethod
            def name(cls):
                return src_name

            def schema(self):
                return schema_ddl

            def simpleStreamReader(self, schema):
                return _StreamReader()

        spark.dataSource.register(_Source)
        return spark.readStream.format(src_name).load()
