"""DataFrame-level operators beyond the Column function library:
temporal joins, sessionization, deduplication, similarity search.

Each operator is a composition of built-in DataFrame transformations
chosen for 100 TB behavior (single shuffle on the natural key, no
driver-side collection, broadcast where one side is small).
"""

from .temporal import as_of_join, range_pair_join, sessionize

__all__ = ["as_of_join", "range_pair_join", "sessionize"]
