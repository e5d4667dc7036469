"""hazelcast_jet_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of Hazelcast Jet (reference:
/root/reference, Hazelcast Jet 4.x).

This is NOT a port of Jet's execution machinery (tasklets, IMaps,
cooperative threads).  It is an idiomatic Spark design:

* the **Pipeline façade** (`Pipeline`, `BatchStage`, `StreamStage`,
  `StageWithKey`) mirrors Jet's pipeline API shape
  (reference: hazelcast-jet-core/src/main/java/com/hazelcast/jet/pipeline/
  Pipeline.java, BatchStage.java, StreamStage.java) but every operator is
  recorded as a declarative DataFrame transformation so Catalyst owns
  optimization and physical planning;
* the **AggregateOperations** library reproduces Jet's aggregate algebra
  (reference: aggregate/AggregateOperations.java) as pyspark Column
  expressions — partial/merge/final aggregation is automatic;
* **Sources/Sinks** map Jet connectors onto `spark.read`/`df.write`
  (reference: pipeline/Sources.java, pipeline/Sinks.java);
* **streaming** maps Jet windows/watermarks/stateful transforms onto
  Structured Streaming (reference: pipeline/WindowDefinition.java,
  StreamStageWithKey.java);
* **operators** adds large-scale training-data pipeline ops (dedup,
  similarity search, text analysis, multimodal plumbing) beyond the
  reference.
"""

from hazelcast_jet_spark.session import get_spark, load_table, load_tables
from hazelcast_jet_spark.pipeline import HashJoinBuilder, Pipeline, WindowDefinition
from hazelcast_jet_spark import aggregates as AggregateOperations
from hazelcast_jet_spark.sources import Sources, FileSources, S3Sources, TestSources
from hazelcast_jet_spark.sinks import Sinks, AssertionSinks

__all__ = [
    "HashJoinBuilder",
    "Pipeline",
    "WindowDefinition",
    "AggregateOperations",
    "Sources",
    "FileSources",
    "S3Sources",
    "TestSources",
    "Sinks",
    "AssertionSinks",
    "get_spark",
    "load_table",
    "load_tables",
]

__version__ = "0.1.0"
