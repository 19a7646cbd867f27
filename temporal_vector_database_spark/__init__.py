"""temporal_vector_database_spark — a PySpark-native temporal vector engine.

A brand-new, idiomatic-Spark engine with the query and data-processing
capabilities of ``harshitster/Temporal-Vector-Database`` (studied read-only
at ``/root/reference``; see SURVEY.md). The reference's single-process
HDF5 + in-memory-FAISS design is replaced by one columnar, partitioned
``versions`` DataFrame and pure ``DataFrame -> DataFrame`` operators:

- ingest (sequence assignment, sparse delta encoding, base-promotion policy)
- point / as-of / range / latest time-travel reconstruction with cost and
  quality scoring
- exact batch cosine top-k similarity search over base snapshots
- timeline integrity validation, statistics and base-placement advisor
- beyond-reference LLM-data-pipeline operators: dedup (exact / MinHash-LSH),
  ANN similarity search over embeddings, text analysis, multimodal plumbing

Everything is expressed with Spark DataFrame/SQL primitives (windows,
higher-order array functions, joins, aggregations) so Catalyst plans the
physical execution; Arrow-vectorized ``applyInPandas`` is used only where
the semantics are genuinely sequential per content (delta encoding against
the reconstructed predecessor — reference write path
``storage/temporal_database.py:86-178``).
"""

from temporal_vector_database_spark.api import TemporalVectorDatabase
from temporal_vector_database_spark.config import DEFAULT_CONFIG, TVDBConfig
from temporal_vector_database_spark.session import get_spark

__all__ = ["DEFAULT_CONFIG", "TVDBConfig", "TemporalVectorDatabase", "get_spark"]
__version__ = "0.1.0"
