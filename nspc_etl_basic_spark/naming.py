"""File-path -> SQL table identifier (reference ``generate_table_name``,
loader.py:855-866).

Semantics reproduced exactly (pinned by reference test
``test/test_date_formats.py:160`` expecting ``dates_iso_format_csv``):
  1. take the file *name including extension*,
  2. strip a trailing split-suffix ``_\\d{3,}`` (e.g. ``data_001`` -> ``data``)
     — note this only fires on extension-less names since the extension
     follows the digits otherwise,
  3. every non-word char (incl. the ``.`` before the extension) -> ``_``,
  4. a *leading digit is replaced* by ``t_`` (the reference uses
     ``re.sub(r'^[0-9]', 't_', ...)`` which substitutes, not prefixes).
Pure driver-side string function — no Spark involvement.
"""

from __future__ import annotations

import os
import re


def generate_table_name(file_path: str) -> str:
    name = os.path.basename(file_path)
    name = re.sub(r"_\d{3,}$", "", name)
    name = re.sub(r"[^\w]", "_", name)
    name = re.sub(r"^[0-9]", "t_", name)
    return name


def table_name_col(path):
    """B7 as a column expression, for deriving table identities from a
    path column at scale (millions of file paths in a manifest table —
    driver-side Python would serialize the job). Same rule chain as
    ``generate_table_name`` with one documented narrowing: the word class
    is explicit ASCII ``[a-zA-Z0-9_]`` so Spark (Java regex) and the
    DuckDB oracle (RE2) agree; the driver-side function's Python ``\\w``
    is Unicode-aware, which only diverges for non-ASCII filenames."""
    from pyspark.sql import functions as F

    name = F.regexp_extract(path, r"[^/]+$", 0)
    name = F.regexp_replace(name, r"_[0-9]{3,}$", "")
    name = F.regexp_replace(name, r"[^a-zA-Z0-9_]", "_")
    return F.regexp_replace(name, r"^[0-9]", "t_")
