"""artigraph_spark — a PySpark-native declarative data-production engine.

Re-expresses the capabilities of artigraph/artigraph (reference at
/root/reference, Apache-2.0) on Apache Spark: typed Artifacts, versioned
Producers, incremental partition-aware Graph builds — plus a first-class
relational operator surface (DataFrame-backed) designed for 100 TB scale.

Layers:
  - ``types``        arti-style Type tree + TypeSystem registry (spark/python bridges)
  - ``fingerprint``  int64 content/identity fingerprints, XOR-combinable
  - ``partitions``   PartitionKey / PartitionField (date/int/null) + path components
  - ``storage``      path templating, Hive-style partition discovery
  - ``artifacts``    Artifact = Type + Format + Storage
  - ``producers``    Producer / @producer (build, map, validate_outputs)
  - ``graphs``       Graph, GraphSnapshot, ArtifactBox
  - ``backends``     metadata catalog (memory / JSON-file)
  - ``executors``    topo-ordered incremental build with partition memoization
  - ``io``           (format × storage × view) reader/writer registry
  - ``operators``    relational + LLM-pipeline operator surface (joins, dedup, similarity, text)
  - ``functions``    deterministic aggregation helpers (decimal-sum trick)
  - ``streaming``    Structured Streaming extension (windows, watermarks)
"""

__version__ = "0.1.0"
