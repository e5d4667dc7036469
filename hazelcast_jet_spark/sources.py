"""Sources — Jet connectors mapped onto spark.read / spark.readStream.

Reference: hazelcast-jet-core/src/main/java/com/hazelcast/jet/pipeline/
Sources.java (172-1350), pipeline/file/FileSources.java:66, and
pipeline/test/TestSources.java:55-211.

Each factory returns ``fn(spark) -> DataFrame`` so `Pipeline.read_from`
can defer reading until the pipeline owns a session.  Predicate/projection
pushdown that Jet implements per-connector (ReadMapOrCacheP server-side
predicates) is native to Spark's scan planning.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession


class Sources:
    """Batch + streaming source factories (Sources.java)."""

    # --- batch (Sources.java:172-1350) ----------------------------------

    @staticmethod
    def map(table_path_or_name: str):
        """Sources.map(name) — Sources.java:172: scan an IMap.  IMap ≈ a
        managed columnar table; accepts a parquet path or a catalog name."""
        def read(spark: SparkSession) -> DataFrame:
            if table_path_or_name.endswith(".parquet") or "/" in table_path_or_name:
                return spark.read.parquet(table_path_or_name)
            return spark.table(table_path_or_name)
        return read

    cache = map          # Sources.cache — Sources.java:691
    remote_map = map     # Sources.remoteMap — Sources.java:525 (other catalog/path)

    @staticmethod
    def files(directory: str):
        """Sources.files(dir) — Sources.java:978: line-by-line text."""
        return lambda spark: spark.read.text(directory)

    @staticmethod
    def json(directory: str, schema=None):
        """Sources.json(dir) — Sources.java:1030: JSON-lines files."""
        def read(spark):
            r = spark.read
            if schema is not None:
                r = r.schema(schema)
            return r.json(directory)
        return read

    @staticmethod
    def jdbc(url: str, table: str, **options):
        """Sources.jdbc — Sources.java:1321 (parallel scan via predicates)."""
        def read(spark):
            return spark.read.format("jdbc").option("url", url).option("dbtable", table).options(**options).load()
        return read

    @staticmethod
    def list(items: list, schema=None):
        """Sources.list(name) — Sources.java:886 (single-partition list)."""
        return lambda spark: spark.createDataFrame(items, schema=schema)

    # --- streaming (Sources.java:381-1265, SURVEY §2.2) -------------------

    @staticmethod
    def map_journal(path: str, fmt: str = "parquet", schema=None):
        """Sources.mapJournal — Sources.java:381: change journal of a table.
        File-stream source over the table directory (new files = journal
        events, replayable from checkpoint = START_FROM_OLDEST)."""
        def read(spark):
            r = spark.readStream.format(fmt)
            if schema is not None:
                r = r.schema(schema)
            return r.load(path)
        return read

    @staticmethod
    def kafka_options(bootstrap_servers: str, *topics: str, **options) -> dict:
        """Build the option map for Spark's kafka source — the part of the
        connector that is unit-testable without a broker (KafkaSources.java:51
        builds the consumer Properties the same way).

        ``topics`` become ``subscribe`` unless the caller passes one of
        Spark's mutually-exclusive alternatives (``assign`` /
        ``subscribePattern``) explicitly; passing both is rejected here
        rather than at stream start.  Consumer properties pass through
        with their ``kafka.`` prefix (e.g. ``**{"kafka.group.id": "g"}``).
        """
        alternatives = [k for k in ("assign", "subscribePattern") if k in options]
        if alternatives and topics:
            raise ValueError(
                f"pass either topic names or {alternatives[0]}=, not both "
                "(Spark's kafka source accepts exactly one subscription mode)")
        if not alternatives and not topics:
            raise ValueError("at least one topic (or assign=/subscribePattern=) required")
        opts = {"kafka.bootstrap.servers": bootstrap_servers}
        if topics:
            opts["subscribe"] = ",".join(topics)
        opts.update(options)
        return opts

    @staticmethod
    def kafka(bootstrap_servers: str, *topics: str, **options):
        """KafkaSources.kafka — extensions/kafka/.../KafkaSources.java:51.
        Offsets checkpointed for exactly-once, same as Jet's snapshots."""
        opts = Sources.kafka_options(bootstrap_servers, *topics, **options)

        def read(spark):
            return spark.readStream.format("kafka").options(**opts).load()
        return read

    @staticmethod
    def socket(host: str, port: int):
        """Sources.socket — Sources.java:950."""
        return lambda spark: (
            spark.readStream.format("socket").option("host", host).option("port", port).load()
        )

    @staticmethod
    def file_watcher(directory: str, fmt: str = "text", schema=None):
        """Sources.fileWatcher / jsonWatcher — Sources.java:1073-1115."""
        def read(spark):
            r = spark.readStream.format(fmt)
            if schema is not None:
                r = r.schema(schema)
            return r.load(directory)
        return read


class FileSources:
    """Unified file connector — pipeline/file/FileSources.java:66 +
    FileFormat.java: avro/csv/json/lines/parquet/binary/whole-text;
    plus the Spark-native formats the reference lacks (orc, xml —
    Spark 4 ships both readers built in)."""

    _FORMATS = {"avro", "csv", "json", "text", "parquet", "binaryFile",
                "orc", "xml"}

    @staticmethod
    def files(path: str, fmt: str = "parquet", schema=None, **options):
        if fmt not in FileSources._FORMATS:
            raise ValueError(f"unsupported format {fmt!r} (have {sorted(FileSources._FORMATS)})")
        def read(spark: SparkSession) -> DataFrame:
            if fmt == "avro":
                # spark-avro isn't bundled; jet-avro is the pure-Python
                # container-file data source (avro_io.py)
                from hazelcast_jet_spark import avro_io
                avro_io.register(spark)
                r = spark.read.format("jet-avro").options(**options)
            else:
                r = spark.read.format(fmt).options(**options)
            if schema is not None:
                r = r.schema(schema)
            return r.load(path)
        return read


class S3Sources:
    """S3 object scan — extensions/s3/.../S3Sources.java:66-223, expressed
    as the s3a:// path + Hadoop-conf halves Spark needs.  The path/conf
    building is the broker-free contract (tested without S3); the IO
    itself goes through Spark's normal readers and needs the hadoop-aws
    jars + credentials on a real cluster."""

    @staticmethod
    def s3_paths(buckets: list[str] | str, prefix: str = "") -> list[str]:
        """s3a:// URIs for each bucket/prefix — Jet's (bucketNames, prefix)
        pair.  Rejects empty bucket names and schemes smuggled into the
        bucket field (a bucket is a name, not a URI)."""
        if isinstance(buckets, str):
            buckets = [buckets]
        if not buckets:
            raise ValueError("at least one bucket required")
        out = []
        for b in buckets:
            if not b or "://" in b or "/" in b:
                raise ValueError(f"invalid bucket name {b!r}")
            key = prefix.lstrip("/")
            out.append(f"s3a://{b}/{key}" if key else f"s3a://{b}/")
        return out

    @staticmethod
    def configure(spark: SparkSession, access_key: str | None = None,
                  secret_key: str | None = None, endpoint: str | None = None,
                  path_style_access: bool | None = None) -> dict:
        """Set the standard fs.s3a.* Hadoop options on the session (the
        AwsConfig analog of S3Sources.java:120); returns the applied map
        so callers/tests can assert it.  None = leave the cluster default
        (instance profile / env chain) in place."""
        conf = {}
        if access_key is not None:
            conf["fs.s3a.access.key"] = access_key
        if secret_key is not None:
            conf["fs.s3a.secret.key"] = secret_key
        if endpoint is not None:
            conf["fs.s3a.endpoint"] = endpoint
        if path_style_access is not None:
            conf["fs.s3a.path.style.access"] = str(path_style_access).lower()
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        for k, v in conf.items():
            hconf.set(k, v)
        return conf

    @staticmethod
    def s3(buckets: list[str] | str, prefix: str = "", fmt: str = "text",
           schema=None, **options):
        """S3Sources.s3 — one DataFrame over every object under
        ``prefix`` in each bucket (line-per-row for fmt='text', matching
        the reference's default readAsString)."""
        paths = S3Sources.s3_paths(buckets, prefix)

        def read(spark: SparkSession) -> DataFrame:
            r = spark.read.format(fmt).options(**options)
            if schema is not None:
                r = r.schema(schema)
            return r.load(paths)
        return read


class HadoopSources:
    """Hadoop InputFormat scan — extensions/hadoop/.../HadoopSources.java:60
    (``HadoopSources.inputFormat(configuration, projectionFn)``).

    Jet reads arbitrary (K, V) pairs from any InputFormat; Spark's native
    readers cover the common formats columnar-fast, so we map well-known
    InputFormat class names onto ``spark.read.<fmt>`` and fall back to the
    RDD SequenceFile reader (the one Hadoop format with no DataFrame
    reader; Spark bundles the Hadoop client, so this works with zero extra
    jars).  Unknown InputFormat classes are rejected up front rather than
    failing mid-job on the cluster.
    """

    #: InputFormat class (mapred + mapreduce lineages) → Spark reader
    FORMAT_BY_CLASS = {
        "org.apache.hadoop.mapred.TextInputFormat": "text",
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat": "text",
        "org.apache.parquet.hadoop.ParquetInputFormat": "parquet",
        "org.apache.parquet.avro.AvroParquetInputFormat": "parquet",
        "org.apache.hadoop.mapred.SequenceFileInputFormat": "sequence",
        "org.apache.hadoop.mapreduce.lib.input.SequenceFileInputFormat": "sequence",
    }

    @staticmethod
    def input_format(input_format_class: str, path: str,
                     key_col: str = "key", value_col: str = "value",
                     **options):
        """One DataFrame over ``path`` read via the named InputFormat.

        SequenceFiles yield ``(key_col, value_col)`` rows (Writables
        deserialized by Spark's sequenceFile reader — per-partition
        imperative IO is the documented RDD exception); TextInputFormat
        yields ``value_col`` lines (Jet's byte-offset key is an artifact
        of the split reader — every reference example drops it in
        projectFn, so the DataFrame form omits it); Parquet formats yield
        the file's own schema.
        """
        fmt = HadoopSources.FORMAT_BY_CLASS.get(input_format_class)
        if fmt is None:
            raise ValueError(
                f"unsupported InputFormat {input_format_class!r} "
                f"(have {sorted(HadoopSources.FORMAT_BY_CLASS)})")

        def read(spark: SparkSession) -> DataFrame:
            if fmt == "sequence":
                rdd = spark.sparkContext.sequenceFile(path)
                return spark.createDataFrame(rdd, [key_col, value_col])
            if fmt == "text":
                return (spark.read.options(**options).text(path)
                        .withColumnRenamed("value", value_col))
            return spark.read.options(**options).parquet(path)
        return read


class TestSources:
    """pipeline/test/TestSources.java:55-211."""

    @staticmethod
    def items(items: list, schema=None):
        """TestSources.items — TestSources.java:55."""
        return lambda spark: spark.createDataFrame(items, schema=schema)

    @staticmethod
    def item_stream(rate: int, **options):
        """TestSources.itemStream(rate) — TestSources.java:136: synthetic
        timestamped stream ≡ the rate source (columns timestamp, value)."""
        return lambda spark: (
            spark.readStream.format("rate").option("rowsPerSecond", rate).options(**options).load()
        )


def generate_series(spark: SparkSession, start: int, stop: int) -> DataFrame:
    """SQL TABLE(generate_series(a,b)) — hazelcast-jet-sql/.../connector/
    generator/SeriesSqlConnector.java; inclusive bounds like Jet."""
    return spark.range(start, stop + 1).withColumnRenamed("id", "v")


def generate_stream(spark: SparkSession, rate: int) -> DataFrame:
    """SQL TABLE(generate_stream(n)) — connector/generator/
    StreamSqlConnector.java: n BIGINTs per second."""
    return spark.readStream.format("rate").option("rowsPerSecond", rate).load().select("value")
