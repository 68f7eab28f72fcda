"""File-type detection (reference ``detect_file_type``, loader.py:104-142).

Semantics: inspect the first 10 lines. JSON when the first line opens with
``[``/``{`` AND the whole file parses as JSON; PSV when every non-blank
sampled line has the same positive pipe count; CSV likewise for commas;
otherwise fall back to the extension; otherwise error.

This is a driver-side utility that touches only a file head — the actual
(distributed) read is dispatched to ``spark.read.<format>`` by the reader.
"""

from __future__ import annotations

import json
import os

#: above this size the whole-file JSON parse is skipped (driver-OOM guard
#: for multi-GB inputs) and the extension decides; the distributed reader
#: still validates per-record
MAX_JSON_SNIFF_BYTES = 64 * 1024 * 1024


def detect_file_type(
    file_path: str, max_json_sniff_bytes: int = MAX_JSON_SNIFF_BYTES
) -> str:
    # binary columnar formats first — magic bytes, no text decode needed
    # (extension surface beyond the reference's csv/psv/json: a training-
    # data lake's landing zone mixes delimited drops with columnar files)
    try:
        with open(file_path, "rb") as fh:
            magic = fh.read(4)
    except OSError as exc:
        raise ValueError(f"Could not determine file type for {file_path}: {exc}")
    if magic == b"PAR1":
        return "parquet"
    if magic[:3] == b"ORC":
        return "orc"

    try:
        with open(file_path, encoding="utf-8") as fh:
            head = [fh.readline() for _ in range(10)]
    except OSError as exc:
        raise ValueError(f"Could not determine file type for {file_path}: {exc}")
    except UnicodeDecodeError:
        raise ValueError(
            f"Could not determine file type for {file_path}: "
            "binary content without a known magic"
        )

    first = head[0].strip() if head else ""
    if first.startswith(("[", "{")):
        try:
            if os.path.getsize(file_path) > max_json_sniff_bytes:
                # too big to json.load on the driver: trust the shape of
                # the first line (+ extension fallback below if it later
                # fails the distributed read)
                return "json"
            with open(file_path, encoding="utf-8") as fh:
                json.load(fh)
            return "json"
        except (json.JSONDecodeError, OSError):
            pass
        # line-delimited JSON: the whole file is not one document, but
        # every sampled line parses on its own
        sampled = [ln for ln in head if ln.strip()]
        if len(sampled) > 1:
            try:
                for ln in sampled:
                    json.loads(ln)
                return "jsonl"
            except json.JSONDecodeError:
                pass

    non_blank = [ln for ln in head if ln.strip()]
    pipe_counts = [ln.count("|") for ln in non_blank]
    comma_counts = [ln.count(",") for ln in non_blank]
    tab_counts = [ln.count("\t") for ln in non_blank]
    if pipe_counts and pipe_counts[0] > 0 and len(set(pipe_counts)) == 1:
        return "psv"
    if tab_counts and tab_counts[0] > 0 and len(set(tab_counts)) == 1:
        return "tsv"
    if comma_counts and comma_counts[0] > 0 and len(set(comma_counts)) == 1:
        return "csv"

    lower = file_path.lower()
    for ext, kind in (
        (".csv", "csv"), (".psv", "psv"), (".tsv", "tsv"),
        (".jsonl", "jsonl"), (".ndjson", "jsonl"), (".json", "json"),
        (".parquet", "parquet"), (".orc", "orc"),
    ):
        if lower.endswith(ext):
            return kind
    raise ValueError(f"Could not determine file type for {file_path}")
