"""Relational operator library — one module per SURVEY.md §2B family.

Importing this package registers every operator query with
piper_spark.registry.
"""

from piper_spark.operators import (  # noqa: F401
    scans,
    filters,
    joins,
    asof,
    aggregates,
    windows,
    sorts,
    scalars,
    sampling,
    tpch,
)
