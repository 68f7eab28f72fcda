"""Ledger-driven driver-window ordering for __spark_entry__.queries().

The driver oracles the FIRST 50 entries of queries() each round, so
dict order decides which queries get fresh correctness rows. Round 5
proved hand-ordering a 166-key dict doesn't scale: events_zorder_layout
sat at index 50 — one past the window — and was never checked.

This script replaces hand-ordering with a ranking computed from the
correctness ledgers (CORRECTNESS_r*.json) plus a code-identity
snapshot (scripts/query_code_hashes.json — the hash of each query's
defining source AT THE TIME OF ITS LAST DRIVER ROW):

  cat0  never checked by the driver           (alphabetical)
  cat1  latest driver row red                 (alphabetical)
  cat2  code changed since the last row       (oldest row first, name)
  cat3  green and unchanged — freshness only  (oldest row first, name)

A query's code identity covers: the query function's source, its
oracle SQL STRING (generated oracles hash their output, so a generator
change counts), every nspc module its source references (local or
top-level imports — an operator fix flags every query on that
operator), and one level of entry-module helper functions it calls.

Round lifecycle (the driver rows the window AFTER the session ends,
against final HEAD, so "code at row time" == the hashes dumped at the
END of the round that produced the row):

  1. end of round N: ``--dump-hashes > scripts/hashes_rN.json`` and
     commit — the code identity the r{N} ledger rows were checked at.
  2. start of round N+1 (new ledger arrived): ``--sync-snapshot``
     rebuilds query_code_hashes.json as
     ``snap[key] = hashes_r{last_row_round(key)}[key]``.
  3. ``--emit`` writes window_order.json (the ranking); queries()
     reorders itself from that file.
  4. ``--check`` (pinned by tests/test_window_order.py) recomputes the
     ranking and fails if queries()' first 50 disagree — e.g. a query
     was edited after the last --emit.
"""

from __future__ import annotations

import glob
import hashlib
import importlib
import inspect
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER_GLOB = os.path.join(REPO, "CORRECTNESS_r*.json")
SNAPSHOT = os.path.join(REPO, "scripts", "query_code_hashes.json")
WINDOW = os.path.join(REPO, "scripts", "window_order.json")
WINDOW_SIZE = 50

_FROM_IMPORT_RE = re.compile(
    r"from\s+(nspc_etl_basic_spark(?:\.\w+)+)\s+import\s+"
    r"\(?\s*([\w,\s]+?)\s*\)?\s*(?:\n|$)",
    re.S,
)


def _toplevel_name_map(entry_src: str) -> dict[str, str]:
    """name -> module for the entry file's top-level nspc imports."""
    out: dict[str, str] = {}
    for m in _FROM_IMPORT_RE.finditer(entry_src):
        mod = m.group(1)
        for piece in m.group(2).split(","):
            name = piece.strip().split(" as ")[-1].strip()
            if name:
                out[name] = mod
    return out


def _canon(v) -> str:
    """Deterministic serialization — repr() of sets (and dict views) is
    hash-ordered, which varies across processes under hash
    randomization and would make the code-identity hash unstable."""
    if isinstance(v, dict):
        items = sorted(v.items(), key=lambda kv: repr(kv[0]))
        return "{" + ",".join(f"{_canon(k)}:{_canon(x)}" for k, x in items) + "}"
    if isinstance(v, (set, frozenset)):
        return "{" + ",".join(sorted(_canon(x) for x in v)) + "}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return repr(v)


def _attr_source(obj) -> str | None:
    if inspect.isfunction(obj) or inspect.isclass(obj):
        try:
            return inspect.getsource(obj)
        except (OSError, TypeError):
            return None
    if isinstance(obj, (str, int, float, bool, list, tuple, dict, set)):
        return _canon(obj)
    return None


_WORD_RE = re.compile(r"\w+")
_MODULE_INDEX: dict[str, tuple[dict, dict]] = {}


def _module_index(module) -> tuple[dict[str, str], dict[str, frozenset]]:
    """{attr: source} and {attr: word-token set of that source} for a
    module's own functions/classes and literal constants — computed
    once per module (the per-attr regex alternative is quadratic)."""
    if module.__name__ not in _MODULE_INDEX:
        attrs = {
            name: s
            for name, obj in vars(module).items()
            if not name.startswith("__")
            and (s := _attr_source(obj)) is not None
            and (
                not (inspect.isfunction(obj) or inspect.isclass(obj))
                or getattr(obj, "__module__", None) == module.__name__
            )
        }
        tokens = {
            name: frozenset(_WORD_RE.findall(src))
            for name, src in attrs.items()
        }
        _MODULE_INDEX[module.__name__] = (attrs, tokens)
    return _MODULE_INDEX[module.__name__]


def _closure_sources(module, seed_names: list[str]) -> list[str]:
    """Sources of the named module attributes plus — transitively —
    every other attribute of the SAME module their sources mention.
    Function-level, not module-level: an unrelated function added to a
    shared operator module must not flag every query importing from it."""
    attrs, tokens = _module_index(module)
    seen: set[str] = set()
    work = [n for n in seed_names if n in attrs]
    out: list[str] = []
    while work:
        name = work.pop()
        if name in seen:
            continue
        seen.add(name)
        out.append(attrs[name])
        for other in attrs:
            if other not in seen and other in tokens[name]:
                work.append(other)
    out.sort()
    return out


def current_hashes(entry) -> dict[str, str]:
    entry_src = inspect.getsource(entry)
    name_map = _toplevel_name_map(entry_src)
    oracles = entry.oracle_sql()

    def module_of(mod_name: str):
        try:
            return importlib.import_module(mod_name)
        except Exception:
            return None

    out: dict[str, str] = {}
    for key, fn in entry.queries().items():
        src = inspect.getsource(fn)
        src_tokens = frozenset(_WORD_RE.findall(src))
        parts = [src, oracles.get(key, "")]
        # names imported inside the query fn, per module
        wanted: dict[str, set[str]] = {}
        for m in _FROM_IMPORT_RE.finditer(src):
            names = {
                p.strip().split(" as ")[-1].strip()
                for p in m.group(2).split(",")
                if p.strip()
            }
            wanted.setdefault(m.group(1), set()).update(names)
        # entry-top-level imported names the fn source mentions
        for name, mod in name_map.items():
            if name in src_tokens:
                wanted.setdefault(mod, set()).add(name)
        for mod_name in sorted(wanted):
            mod = module_of(mod_name)
            if mod is None:
                parts.append(mod_name)
            else:
                parts.extend(
                    _closure_sources(mod, sorted(wanted[mod_name]))
                )
        # entry-local helpers the fn calls (replay/slicing/SQL builders)
        helper_names = [
            name
            for name, obj in vars(entry).items()
            if inspect.isfunction(obj)
            and obj.__module__ == entry.__name__
            and obj is not fn
            and name in src_tokens
        ]
        parts.extend(_closure_sources(entry, helper_names))
        out[key] = hashlib.md5("\x00".join(parts).encode()).hexdigest()
    return out


def ledger_state() -> dict[str, tuple[int, bool]]:
    """key -> (last round checked, latest row green)."""
    state: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(LEDGER_GLOB)):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            rows = json.load(fh)
        for key, row in rows.items():
            green = bool(
                row.get("rows_match")
                and row.get("schema_match", True)
                and (row.get("hash_match") is not False)
                and not row.get("err")
            )
            prev = state.get(key)
            if prev is None or rnd >= prev[0]:
                state[key] = (rnd, green)
    return state


def compute_ranking(entry) -> tuple[list[str], dict[str, str]]:
    """Full ranked key list + {key: category} for reporting."""
    cur = current_hashes(entry)
    state = ledger_state()
    snapshot: dict[str, str] = {}
    if os.path.exists(SNAPSHOT):
        with open(SNAPSHOT) as fh:
            snapshot = json.load(fh)

    cats: dict[str, tuple] = {}
    for key in cur:
        if key not in state:
            cats[key] = (0, key)
        elif not state[key][1]:
            cats[key] = (1, key)
        elif snapshot.get(key) != cur[key]:
            cats[key] = (2, state[key][0], key)
        else:
            cats[key] = (3, state[key][0], key)
    ranked = sorted(cur, key=lambda k: cats[k])
    return ranked, {k: f"cat{cats[k][0]}" for k in cur}


def emit(entry) -> None:
    ranked, cat = compute_ranking(entry)
    with open(WINDOW, "w") as fh:
        json.dump({"order": ranked, "window_size": WINDOW_SIZE}, fh, indent=1)
    for i, key in enumerate(ranked[:WINDOW_SIZE]):
        print(f"{i:3d} {cat[key]} {key}")
    print(f"... {len(ranked) - WINDOW_SIZE} more past the window")


def sync_snapshot() -> None:
    """snap[key] = hash at the round of the key's latest driver row,
    read from the committed per-round dumps (scripts/hashes_rN.json)."""
    hist: dict[int, dict[str, str]] = {}
    for path in glob.glob(os.path.join(REPO, "scripts", "hashes_r*.json")):
        m = re.search(r"hashes_r(\d+)\.json$", path)
        if m:
            with open(path) as fh:
                hist[int(m.group(1))] = json.load(fh)
    snap: dict[str, str] = {}
    dropped = []
    for key, (rnd, _green) in ledger_state().items():
        h = hist.get(rnd, {}).get(key)
        if h is None:
            dropped.append((key, rnd))  # no dump for that round: cat2
        else:
            snap[key] = h
    with open(SNAPSHOT, "w") as fh:
        json.dump(dict(sorted(snap.items())), fh, indent=1)
    print(f"snapshot: {len(snap)} keys", f"(no row-time hash: {dropped})"
          if dropped else "")


def check(entry) -> int:
    ranked, cat = compute_ranking(entry)
    actual = list(entry.queries())
    want = ranked[:WINDOW_SIZE]
    got = actual[:WINDOW_SIZE]
    if got != want:
        missing = [k for k in want if k not in got]
        print("window order disagrees with the ledger ranking")
        print("ranked-but-absent:", missing)
        for i, (a, b) in enumerate(zip(got, want)):
            if a != b:
                print(f"first divergence at {i}: have {a}, want {b} "
                      f"({cat.get(b)})")
                break
        return 1
    return 0


if __name__ == "__main__":
    if "--dump-hashes" in sys.argv:
        # run from any checkout (e.g. a round-N worktree): hash ITS
        # entry + package, not the repo this script lives in
        sys.path.insert(0, os.getcwd())
        import __spark_entry__ as entry

        print(json.dumps(current_hashes(entry), indent=1))
    elif "--sync-snapshot" in sys.argv:
        sync_snapshot()
    elif "--emit" in sys.argv:
        sys.path.insert(0, REPO)
        import __spark_entry__ as entry

        emit(entry)
    else:
        sys.path.insert(0, REPO)
        import __spark_entry__ as entry

        sys.exit(check(entry))
