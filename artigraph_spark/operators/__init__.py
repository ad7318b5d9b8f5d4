"""Spark-native operator library.

Operators the reference's users write as opaque Python inside Producer
bodies, promoted to first-class, scale-aware DataFrame transformations:

  - :mod:`joins`      as-of join, range join (no row explosion)
  - :mod:`dedup`      exact / fingerprint / MinHash-LSH / n-gram near-dup
  - :mod:`similarity` cosine top-k (brute force + LSH-bucketed)
  - :mod:`text`       tokenization, quality stats, language heuristics
  - :mod:`windows`    sessionization, top-k per group
  - :mod:`multimodal` binary-column plumbing (decode stubs, real Spark shape)
"""

from artigraph_spark.operators.joins import asof_join, range_join  # noqa: F401
from artigraph_spark.operators.windows import sessionize, top_k_per_group  # noqa: F401
