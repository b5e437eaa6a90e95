"""Per-gate change fingerprints: the driver verifies only the first 50
registry entries per round, so the ordering must notice when a gate's
implementation changes — including changes in helper modules the plan
builder merely imports (the round-3 miss: ``norm_text`` changed in
functions/text.py and the hand-maintained FORCE_RECHECK map never learned
that ``txt_fingerprint`` depended on it).

A gate's fingerprint is md5 over

  * its oracle SQL text (already fully interpolated at registration time,
    so shared CTE constants are captured), and
  * the SOURCE of every brontes_spark module transitively reachable from
    the plan builder's module via module-level imports.

The fingerprint of every gate, plus the round at which it last changed,
is persisted in ``GATE_FINGERPRINTS.json`` beside the CORRECTNESS_r*.json
history. Ordering treats a gate whose fingerprint changed after its last
green driver row as never-verified, so it re-enters the driver window
automatically — FORCE_RECHECK in registry.py remains only as a manual
override for changes the closure can't see (e.g. testdata regeneration).

``python -m brontes_spark.plans.fingerprints --update`` refreshes the
persisted file; tests/test_fingerprints.py fails when it is stale so the
file cannot silently drift from the code.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

_PKG = "brontes_spark"
#: registry.py holds the ordering policy itself (not gate semantics; its one
#: semantic export, EV_CTE, is interpolated into oracle strings and therefore
#: hashed via the oracle text); this module is pure bookkeeping. Including
#: either would flip EVERY fingerprint on any ordering-policy edit.
_EXCLUDE = {f"{_PKG}.plans.registry", f"{_PKG}.plans.fingerprints"}

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
STORE_PATH = os.path.join(_REPO_ROOT, "GATE_FINGERPRINTS.json")

_closure_cache: dict[str, tuple[str, ...]] = {}
_source_cache: dict[str, str] = {}


def _module_path(name: str) -> str | None:
    """Source path for a package module WITHOUT importing it (lazy
    in-function imports mean a dependency may not be in sys.modules when
    fingerprints are computed)."""
    mod = sys.modules.get(name)
    path = getattr(mod, "__file__", None)
    if path:
        return path
    import importlib.util

    try:
        spec = importlib.util.find_spec(name)
    except (ImportError, ValueError):
        return None
    return spec.origin if spec and spec.origin else None


def _module_source(name: str) -> str:
    if name not in _source_cache:
        try:
            with open(_module_path(name), encoding="utf-8") as f:
                _source_cache[name] = f.read()
        except (OSError, TypeError):
            _source_cache[name] = ""
    return _source_cache[name]


def _module_deps(name: str) -> set[str]:
    """In-package modules ``name`` imports ANYWHERE in its source — found by
    walking the AST, so imports inside function bodies count (the blind spot
    a globals-only scan has: a builder doing `from ..operators.x import f`
    lazily would otherwise hide x's source from the fingerprint).

    Deliberately AST-ONLY: an earlier version complemented the walk with a
    ``vars(mod)`` globals scan, but for package ``__init__`` modules ``vars``
    contains whichever submodules happen to be imported in THAT interpreter,
    so the closure — and the md5 — depended on import order (round-4 defect:
    importing cli/streaming.*/sources.tokens flipped 11 gates' fingerprints
    between the driver process and the full pytest run). Source text is the
    only input now, so two processes always agree.
    """
    import ast

    deps: set[str] = set()
    src = _module_source(name)
    if src:
        try:
            tree = ast.parse(src)
        except SyntaxError:
            tree = None
        if tree is not None:
            parts = name.split(".")
            is_pkg = (_module_path(name) or "").endswith("__init__.py")
            base = parts if is_pkg else parts[:-1]
            for node in ast.walk(tree):
                if isinstance(node, ast.Import):
                    deps.update(a.name for a in node.names)
                elif isinstance(node, ast.ImportFrom):
                    if node.level == 0:
                        target = node.module or ""
                    else:
                        anchor = base[: len(base) - (node.level - 1)]
                        target = ".".join(anchor + (node.module.split(".") if node.module else []))
                    deps.add(target)
                    # `from X import Y` where Y is itself a submodule
                    deps.update(f"{target}.{a.name}" for a in node.names)
    return {d for d in deps if d.startswith(_PKG)}


def _is_module(name: str) -> bool:
    return name in sys.modules or _module_path(name) is not None


def _module_closure(root: str) -> tuple[str, ...]:
    """Transitive in-package import closure of ``root``: AST-discovered
    imports (module-level AND function-body), source-text-only so the
    closure is identical in every interpreter regardless of import state."""
    if root in _closure_cache:
        return _closure_cache[root]
    seen: set[str] = set()
    stack = [root]
    while stack:
        name = stack.pop()
        if name in seen or not name.startswith(_PKG) or name in _EXCLUDE:
            continue
        if not _is_module(name):
            continue  # `from X import fn` alias candidate, not a module
        seen.add(name)
        stack.extend(_module_deps(name))
    out = tuple(sorted(seen))
    _closure_cache[root] = out
    return out


def compute_all() -> dict[str, str]:
    """Current fingerprint for every registered gate."""
    from .registry import REGISTRY

    fps: dict[str, str] = {}
    for name, spec in REGISTRY.items():
        h = hashlib.md5((spec.oracle or "").encode())
        for mod in _module_closure(spec.build.__module__):
            h.update(b"\x00")
            h.update(mod.encode())
            h.update(b"\x00")
            h.update(_module_source(mod).encode())
        fps[name] = h.hexdigest()
    return fps


def load_stored(path: str = STORE_PATH) -> dict[str, dict]:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def current_round() -> int:
    """The in-flight round number: one past the newest CORRECTNESS file."""
    import glob
    import re

    rounds = [0]
    for p in glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds) + 1


def refresh(path: str = STORE_PATH, write: bool = True, migrate: bool = False) -> dict[str, dict]:
    """Recompute fingerprints, carrying forward the stored change-round for
    unchanged gates and stamping changed gates with the current round. A
    gate first seen with no stored entry gets round -1 ("no known change"):
    a truly new gate has no driver history anyway, so it already sorts
    risk-first, while the initial seeding of a pre-existing gate must not
    invalidate its earlier green rows.

    ``migrate=True`` re-seeds after a change to the CLOSURE DEFINITION itself
    (every fp shifts even though no gate's semantics did): the stored round is
    carried forward for all gates instead of stamping them changed-now, so a
    definition migration does not flush the whole registry into the driver
    window. Use only for fingerprint-algorithm edits, never for code edits.
    """
    stored = load_stored(path)
    rnd = current_round()
    out: dict[str, dict] = {}
    for name, fp in sorted(compute_all().items()):
        prev = stored.get(name)
        if prev and (migrate or prev.get("fp") == fp):
            out[name] = {"fp": fp, "round": prev.get("round", -1)}
        elif prev:
            out[name] = {"fp": fp, "round": rnd}
        else:
            out[name] = {"fp": fp, "round": -1}
    if write:
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
            f.write("\n")
    return out


def change_rounds(path: str = STORE_PATH) -> dict[str, int]:
    """Gate -> round its implementation last changed, per the persisted
    store reconciled against LIVE fingerprints: if the code changed and the
    store was not refreshed, the gate is treated as changed in the current
    round (risk-first) rather than riding a stale entry. Returns {} on any
    computation failure so ordering degrades to history + FORCE_RECHECK
    instead of crashing the driver entrypoint.
    """
    try:
        stored = load_stored(path)
        if not stored:
            return {}
        live = compute_all()
        rnd = current_round()
        out: dict[str, int] = {}
        for name, fp in live.items():
            prev = stored.get(name)
            if prev is None or prev.get("fp") != fp:
                out[name] = rnd
            else:
                out[name] = int(prev.get("round", -1))
        return out
    except Exception:
        return {}


if __name__ == "__main__":
    import brontes_spark.plans  # noqa: F401  (populate REGISTRY)

    if "--update" in sys.argv or "--reseed" in sys.argv:
        data = refresh(write=True, migrate="--reseed" in sys.argv)
        changed = [n for n, v in data.items() if v["round"] == current_round()]
        print(f"wrote {STORE_PATH}: {len(data)} gates, changed this round: {changed}")
    else:
        stored = load_stored()
        live = compute_all()
        stale = [n for n in live if stored.get(n, {}).get("fp") != live[n]]
        print(f"stale: {stale}" if stale else "fingerprints current")
