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
