"""SQL surface — Jet SQL on top of spark.sql.

Reference: hazelcast-jet-sql/src/main/java/com/hazelcast/jet/sql/impl/
(JetSqlBackend.java:117-240, parse/SqlCreateMapping.java,
parse/SqlCreateJob.java, connector/generator/*.java,
connector/file/FileTableFunction.java).

Spark's Catalyst replaces the whole Calcite parse/validate/optimize
stack; this module contributes only the Jet-specific DDL dialect:

* ``CREATE MAPPING name [EXTERNAL NAME path] TYPE File|IMap
  OPTIONS('format' 'path' ...)`` → register a temp view over
  ``spark.read`` (SqlCreateMapping.java),
* ``DROP MAPPING`` / ``SHOW MAPPINGS`` (SqlShowStatement.java),
* ``CREATE JOB name AS <streaming insert>`` / ``ALTER JOB`` /
  ``DROP JOB`` / ``SHOW JOBS`` → named StreamingQuery lifecycle
  (SqlCreateJob.java, JetSqlBackend.java:202-240),
* ``CREATE SNAPSHOT snap FOR JOB job`` / ``DROP SNAPSHOT`` /
  ``SHOW SNAPSHOTS`` → named checkpoint exports
  (parse/SqlCreateSnapshot.java:38, SqlDropSnapshot.java:37); a new job
  starts from one via ``CREATE JOB ...
  OPTIONS('initialSnapshotName'='snap') AS ...`` (JobConfig
  .setInitialSnapshotName analog),
* table functions ``TABLE(generate_series(a,b))`` /
  ``TABLE(generate_stream(n))`` and ``{CSV,JSON,PARQUET,AVRO}_FILE``
  (JetSqlOperatorTable.java:82-88) → rewritten onto Spark's native
  ``range(...)`` TVF / rate source / ad-hoc file views.

Everything else (SELECT/joins/aggregates/ORDER BY/LIMIT/set ops/grouping
sets) passes through unchanged — Spark's SQL is a strict superset of the
reference's whitelist (UnsupportedOperationVisitor.java:89-181; RIGHT/FULL
joins, EXISTS, LIMIT are *rejected* by Jet but work here — documented
extensions, SURVEY §2.6/§2.9).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Mapping:
    name: str
    external_name: str
    fmt: str
    options: dict[str, str] = field(default_factory=dict)


_CREATE_MAPPING = re.compile(
    r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?MAPPING\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>\w+)"
    r"(?:\s+EXTERNAL\s+NAME\s+'(?P<ext>[^']+)')?"
    # greedy up to the last ')' before TYPE so parenthesized column types
    # (DECIMAL(10,2)) don't truncate the group
    r"(?:\s*\((?P<cols>.*)\))?"
    r"\s+TYPE\s+(?P<type>\w+)"
    r"(?:\s+OPTIONS\s*\((?P<opts>.*)\))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_MAPPING = re.compile(
    r"^\s*DROP\s+MAPPING\s+(?:IF\s+EXISTS\s+)?(?P<name>\w+)\s*$", re.IGNORECASE
)
_SHOW = re.compile(r"^\s*SHOW\s+(MAPPINGS|JOBS|SNAPSHOTS)\s*$", re.IGNORECASE)
_CREATE_SNAPSHOT = re.compile(
    r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?SNAPSHOT\s+(?P<snap>\w+)"
    r"\s+FOR\s+JOB\s+(?P<job>\w+)\s*$",
    re.IGNORECASE,
)
_DROP_SNAPSHOT = re.compile(
    r"^\s*DROP\s+SNAPSHOT\s+(?:IF\s+EXISTS\s+)?(?P<snap>\w+)\s*$", re.IGNORECASE
)
_CREATE_JOB = re.compile(
    r"^\s*CREATE\s+JOB\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>\w+)"
    r"(?:\s+OPTIONS\s*\((?P<opts>[^)]*)\))?"
    r"\s+AS\s+(?P<stmt>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_JOB = re.compile(
    r"^\s*ALTER\s+JOB\s+(?P<name>\w+)\s+(?P<verb>SUSPEND|RESUME|RESTART)\s*$", re.IGNORECASE
)
_DROP_JOB = re.compile(r"^\s*DROP\s+JOB\s+(?:IF\s+EXISTS\s+)?(?P<name>\w+)\s*$", re.IGNORECASE)
_INSERT_INTO = re.compile(
    r"^\s*(?:SINK\s+INTO|INSERT\s+INTO)\s+(?P<name>\w+)\s+(?P<stmt>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_GEN_SERIES = re.compile(
    r"TABLE\s*\(\s*generate_series\s*\(\s*(-?\d+)\s*,\s*(-?\d+)\s*\)\s*\)", re.IGNORECASE
)
_GEN_STREAM = re.compile(r"TABLE\s*\(\s*generate_stream\s*\(\s*(\d+)\s*\)\s*\)", re.IGNORECASE)
_FILE_FN = re.compile(
    r"TABLE\s*\(\s*(CSV|JSON|PARQUET|AVRO)_FILE\s*\(\s*'([^']+)'\s*\)\s*\)", re.IGNORECASE
)
_OPTIONS_PAIR = re.compile(r"'([^']+)'\s*(?:=|\s)\s*'([^']*)'")

_FORMAT_ALIASES = {
    "imap": "parquet",            # IMap ≈ managed columnar table
    "file": "parquet",
    "csv": "csv",
    "json": "json",
    "json-flat": "json",
    "jsonl": "json",
    "avro": "jet-avro",  # pure-Python avro data source (avro_io.py)
    "parquet": "parquet",
    "text": "text",
    "lines": "text",
}


class JetSqlEngine:
    """``SqlService.execute`` analog (JetSqlBackend.java:117)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        from hazelcast_jet_spark import avro_io
        avro_io.register(spark)  # AVRO_FILE / avro mappings use jet-avro
        self.mappings: dict[str, Mapping] = {}
        self.jobs: dict[str, Any] = {}       # name -> StreamingQuery
        self._job_specs: dict[str, str] = {}  # name -> statement (for RESTART)
        self._job_ckpts: dict[str, str] = {}  # name -> checkpoint dir
        self.snapshots: dict[str, str] = {}   # name -> exported state dir
        self._snapshot_jobs: dict[str, str] = {}  # snapshot -> source job
        self._job_seeds: dict[str, str] = {}  # job -> initialSnapshotName
        self._file_view_counter = 0

    # --- entry point ------------------------------------------------------

    def sql(self, statement: str) -> DataFrame | None:
        """Execute one statement.  DDL returns None (or a DataFrame for
        SHOW); queries return the result DataFrame."""
        s = statement.strip().rstrip(";")
        m = _CREATE_MAPPING.match(s)
        if m:
            return self._create_mapping(m)
        m = _DROP_MAPPING.match(s)
        if m:
            return self._drop_mapping(m.group("name"))
        m = _SHOW.match(s)
        if m:
            return self._show(m.group(1).upper())
        m = _CREATE_JOB.match(s)
        if m:
            return self._create_job(m.group("name"), m.group("stmt"), m.group("opts"))
        m = _ALTER_JOB.match(s)
        if m:
            return self._alter_job(m.group("name"), m.group("verb").upper())
        m = _DROP_JOB.match(s)
        if m:
            return self._drop_job(m.group("name"))
        m = _CREATE_SNAPSHOT.match(s)
        if m:
            return self._create_snapshot(m.group("snap"), m.group("job"))
        m = _DROP_SNAPSHOT.match(s)
        if m:
            return self._drop_snapshot(m.group("snap"))
        m = _INSERT_INTO.match(s)
        if m and m.group("name") in self.mappings:
            return self._insert_into(m.group("name"), m.group("stmt"))
        return self.spark.sql(self._rewrite(s))

    def _insert_into(self, target: str, select: str) -> None:
        """Batch INSERT/SINK INTO a mapping (SqlExtendedInsert.java):
        append to the mapping's backing storage and refresh the view."""
        mp = self.mappings[target]
        df = self.spark.sql(self._rewrite(select))
        current = self.spark.table(target)
        if [f.name.lower() for f in df.schema.fields] != [f.name.lower() for f in current.schema.fields]:
            raise ValueError(
                f"INSERT INTO {target}: column mismatch — mapping has "
                f"{current.columns}, query produces {df.columns}"
            )
        df.write.mode("append").format(mp.fmt).save(mp.external_name)
        reader = self.spark.read.format(mp.fmt)
        for k, v in mp.options.items():
            reader = reader.option(k, v)
        reader.load(mp.external_name).createOrReplaceTempView(target)
        return None

    # --- table-function rewrites -------------------------------------------

    def _rewrite(self, s: str) -> str:
        # TABLE(generate_series(a,b)) → Spark's native range TVF (inclusive
        # bounds like SeriesSqlConnector); column name v
        s = _GEN_SERIES.sub(
            lambda m: f"(SELECT id AS v FROM range({m.group(1)}, {int(m.group(2)) + 1}))", s
        )
        for m in list(_FILE_FN.finditer(s)):
            fmt, path = _FORMAT_ALIASES.get(m.group(1).lower(), m.group(1).lower()), m.group(2)
            view = f"__file_fn_{self._file_view_counter}"
            self._file_view_counter += 1
            reader = self.spark.read.format(fmt)
            if fmt == "csv":
                reader = reader.option("header", "true").option("inferSchema", "true")
            reader.load(path).createOrReplaceTempView(view)
            s = s.replace(m.group(0), view)
        while True:  # every occurrence gets its own rate-source view
            m = _GEN_STREAM.search(s)
            if not m:
                break
            view = f"__stream_fn_{self._file_view_counter}"
            self._file_view_counter += 1
            (
                self.spark.readStream.format("rate")
                .option("rowsPerSecond", int(m.group(1)))
                .load()
                .selectExpr("value AS v")
                .createOrReplaceTempView(view)
            )
            s = s.replace(m.group(0), view, 1)
        return s

    # --- mappings -----------------------------------------------------------

    def _create_mapping(self, m: re.Match) -> None:
        name = m.group("name")
        ext = m.group("ext") or name
        opts = dict(_OPTIONS_PAIR.findall(m.group("opts") or ""))
        declared_fmt = (opts.pop("format", None) or m.group("type")).lower()
        fmt = _FORMAT_ALIASES.get(declared_fmt, declared_fmt)
        path = opts.pop("path", ext)
        reader = self.spark.read.format(fmt)
        if fmt == "csv" and "header" not in opts:
            reader = reader.option("header", "true").option("inferSchema", "true")
        cols = (m.group("cols") or "").strip()
        if cols:
            reader = reader.schema(cols)
        for k, v in opts.items():
            reader = reader.option(k, v)
        reader.load(path).createOrReplaceTempView(name)
        self.mappings[name] = Mapping(name, path, fmt, opts)

    def _drop_mapping(self, name: str) -> None:
        self.spark.catalog.dropTempView(name)
        self.mappings.pop(name, None)

    def _show(self, what: str) -> DataFrame:
        if what == "MAPPINGS":
            rows = [(mp.name,) for mp in self.mappings.values()] or []
            return self.spark.createDataFrame(rows or [], "name string")
        if what == "SNAPSHOTS":
            rows = [(n, self._snapshot_jobs.get(n)) for n in self.snapshots]
            return self.spark.createDataFrame(
                rows or [], "name string, source_job string")
        rows = [(n, "RUNNING" if q is not None and q.isActive else "SUSPENDED",
                 self._job_seeds.get(n))
                for n, q in self.jobs.items()]
        return self.spark.createDataFrame(
            rows or [], "name string, status string, seeded_from string")

    # --- jobs (streaming queries) --------------------------------------------

    def _create_job(self, name: str, stmt: str, opts: str | None):
        """CREATE JOB wraps a streaming INSERT (SqlCreateJob.java).  The
        inner statement must be `INSERT INTO <mapping> <select>` where the
        select reads a streaming view; we start a named StreamingQuery.
        OPTIONS('initialSnapshotName'='snap') seeds the job's checkpoint
        from a named snapshot (JobConfig.setInitialSnapshotName)."""
        import shutil

        m = re.match(r"\s*(?:SINK\s+INTO|INSERT\s+INTO)\s+(\w+)\s+(.*)$", stmt,
                     re.IGNORECASE | re.DOTALL)
        if not m:
            raise ValueError(f"CREATE JOB body must be INSERT/SINK INTO: {stmt!r}")
        target, select = m.group(1), m.group(2)
        mp = self.mappings.get(target)
        if mp is None:
            raise ValueError(f"unknown sink mapping {target}")
        df = self.spark.sql(self._rewrite(select))
        if not df.isStreaming:
            df.write.mode("append").format(mp.fmt).save(mp.external_name)
            self.jobs[name] = None
            return None
        ckpt = mp.external_name.rstrip("/") + f"__{name}_ckpt"
        job_opts = dict(_OPTIONS_PAIR.findall(opts or ""))
        snap = job_opts.get("initialSnapshotName")
        if snap is not None:
            src = self.snapshots.get(snap)
            if src is None:
                raise ValueError(f"unknown snapshot {snap}")
            import os
            if not os.path.isdir(ckpt):  # never clobber an existing checkpoint
                shutil.copytree(src, ckpt)
            self._job_seeds[name] = snap  # lineage for SHOW JOBS
        q = (
            df.writeStream.format(mp.fmt)
            .option("path", mp.external_name)
            .option("checkpointLocation", ckpt)
            .queryName(name)
            .start()
        )
        self.jobs[name] = q
        self._job_specs[name] = f"INSERT INTO {target} {select}"
        self._job_ckpts[name] = ckpt
        return None

    def _alter_job(self, name: str, verb: str):
        q = self.jobs.get(name)
        if verb in ("SUSPEND",) and q is not None:
            q.stop()
            self.jobs[name] = None
        elif verb in ("RESUME", "RESTART"):
            spec = self._job_specs.get(name)
            if spec is None:
                raise ValueError(f"unknown job {name}")
            if q is not None:
                q.stop()
            self._create_job(name, spec, None)
        return None

    def _drop_job(self, name: str):
        q = self.jobs.pop(name, None)
        if q is not None:
            q.stop()
        self._job_specs.pop(name, None)
        self._job_ckpts.pop(name, None)
        return None

    # --- snapshots (named checkpoint exports) --------------------------------

    def _create_snapshot(self, snap: str, job: str):
        """CREATE [OR REPLACE] SNAPSHOT snap FOR JOB job
        (parse/SqlCreateSnapshot.java:38): export the job's state under a
        name that outlives the job.  A consistent cut of a Spark
        checkpoint needs the query quiesced, so a RUNNING job is briefly
        suspended around the copy and resumed after — same observable
        behavior as Jet's in-flight export (the job keeps running; the
        snapshot is a committed prefix)."""
        import shutil

        if job not in self.jobs:
            raise ValueError(f"unknown job {job}")
        ckpt = self._job_ckpts.get(job)
        if ckpt is None:
            raise ValueError(f"job {job} is not a streaming job (no state)")
        was_running = self.jobs[job] is not None and self.jobs[job].isActive
        if was_running:
            self._alter_job(job, "SUSPEND")
        try:
            target = ckpt.rstrip("/") + f"__snapshot__{snap}"
            shutil.rmtree(target, ignore_errors=True)
            ignore = shutil.ignore_patterns(".*.tmp", "*.tmp")
            try:
                shutil.copytree(ckpt, target, ignore=ignore)
            except shutil.Error:  # racing executor cleanup of spill files
                shutil.rmtree(target, ignore_errors=True)
                shutil.copytree(ckpt, target, ignore=ignore)
            self.snapshots[snap] = target
            self._snapshot_jobs[snap] = job  # lineage for SHOW SNAPSHOTS
        finally:
            if was_running:
                self._alter_job(job, "RESUME")
        return None

    def _drop_snapshot(self, snap: str):
        """DROP SNAPSHOT (parse/SqlDropSnapshot.java:37)."""
        import shutil

        path = self.snapshots.pop(snap, None)
        self._snapshot_jobs.pop(snap, None)
        if path is not None:
            shutil.rmtree(path, ignore_errors=True)
        return None
