"""LLM-data-pipeline operator families (text, dedup, similarity, sessions).

Importing this package registers the pipeline queries with
piper_spark.registry.
"""

from piper_spark.functions import (  # noqa: F401
    text,
    dedup,
    similarity,
    lsh,
    sessions,
    udfs,
    graphs,
    entity,
)
