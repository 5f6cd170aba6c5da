"""Source/sink helpers.

The engine reads/writes through Spark's DataSource V2 connectors
(parquet/json/csv/orc/jdbc), exactly as the reference delegates IO to
stock Spark (SURVEY.md §2.2).  This module adds the star-schema loader
used by tests/bench and scale-aware write helpers.
"""

from .tpch import TABLES, load_table, load_tables
from .upsert import compact as compact_upserts
from .upsert import merge_on_read
from .zorder import write_zordered, zorder_key

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "merge_on_read",
    "compact_upserts",
    "zorder_key",
    "write_zordered",
]
