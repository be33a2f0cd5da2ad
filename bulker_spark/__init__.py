"""bulker_spark — a PySpark-native ingestion/ELT engine with the
capabilities of jitsucom/bulker, re-expressed Spark-first.

Core pipeline: JSON events → flatten → infer/unify schema (7-type lattice)
→ dedup (last-wins / discriminator) → load (stream / batch / replace_table /
replace_partition) into versioned parquet tables with atomic commit —
plus large-scale training-data operators (dedup families, similarity
search, text analysis, multimodal plumbing) under ``functions/``.
"""

from .api import Engine, StreamOptions, BulkerStream, StreamResult  # noqa: F401
from .sinks.warehouse import ConcurrentWriteError, Warehouse  # noqa: F401
from .sources.topic_source import register_topic_source  # noqa: F401
from .types_lattice import DataType, common_ancestor  # noqa: F401

__version__ = "0.1.0"
