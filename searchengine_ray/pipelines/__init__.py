"""Pipelines: the query/oracle registry and the flagship entry pipeline."""

from .queries import registry

__all__ = ["registry"]
