"""Cheap construction of large array literals.

PySpark's ``F.lit`` on a Python list pays per-element py4j traffic (and
per-sublist for nested lists): measured on this repo's codebook shapes,
16 flat 64-float literals cost ~0.9 s and 16 nested 16x16 tables ~2.1 s
of pure DRIVER time — often more than executing the query. Routing the
payload through ``from_json`` over a single STRING literal costs one
py4j call, and Catalyst's ConstantFolding evaluates the parse once at
optimization time into a plain array ``Literal`` — the optimized plan
is bit-identical to the hand-built literal's (verified: no ``from_json``
remains in the optimized plan), so codegen, pushdown, and the DuckDB
oracles are unaffected.
"""

from __future__ import annotations

import json

from pyspark.sql import Column
from pyspark.sql import functions as F


def nested_lit(data, schema: str) -> Column:
    """``F.lit(data)`` for list payloads, built via one JSON string
    literal + ``from_json`` so driver-side construction is O(1) py4j
    calls instead of O(elements). ``schema`` is the array type, e.g.
    ``"array<array<double>>"``. Constant-folded by Catalyst into the
    same Literal node ``F.lit`` would produce."""
    return F.from_json(F.lit(json.dumps(data)), schema)
