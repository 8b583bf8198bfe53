"""Driver query registry — importing the family modules registers them."""

from . import dedup, extraction, relational, similarity, textops  # noqa: F401
from .registry import ORACLES, QUERIES

__all__ = ["ORACLES", "QUERIES"]
