"""Typed-null schema alignment + name-safe unions (SURVEY.md §2.7 U1-U2).

The reference unions three 21-column projections *positionally* with
``lit(null).cast(...)`` padding (generate-asset.scala:222-276). Positional
alignment is fragile (SURVEY §7 risk 4); this utility preserves the exact
semantics — UNION ALL, typed null padding — while matching by name:
each branch is projected onto the target schema (missing columns become
typed nulls, present columns are cast to the target type), then combined
with ``unionByName``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def align_to_schema(df: DataFrame, schema: StructType) -> DataFrame:
    """Project ``df`` onto ``schema``: present columns cast to the target
    type, absent columns as typed NULLs (P8, generate-asset.scala:226-268)."""
    have = {f.name for f in df.schema.fields}
    cols = [
        (F.col(f.name).cast(f.dataType) if f.name in have
         else F.lit(None).cast(f.dataType)).alias(f.name)
        for f in schema.fields
    ]
    return df.select(*cols)


def union_all_by_name(branches: list[DataFrame], schema: StructType) -> DataFrame:
    """UNION ALL (no dedup — the reference never distincts, U1) of branches
    aligned to one schema."""
    aligned = [align_to_schema(b, schema) for b in branches]
    return reduce(lambda a, b: a.unionByName(b), aligned)
