"""Multimodal (binary-column) sources and plumbing.

Importing this package registers the multimodal queries with
piper_spark.registry.
"""

from piper_spark.sources import multimodal  # noqa: F401
