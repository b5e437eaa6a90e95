"""Per-gate change fingerprints: the driver verifies only the first 50
registry entries per round, so the ordering must notice when a gate's
implementation changes — including changes in helper modules the plan
builder merely imports (the round-3 miss: ``norm_text`` changed in
functions/text.py and the hand-maintained FORCE_RECHECK map never learned
that ``txt_fingerprint`` depended on it).

A gate's fingerprint is md5 over

  * its oracle SQL text (already fully interpolated at registration time,
    so shared CTE constants are captured), and
  * the AST of every SYMBOL (function / class / module-level assignment)
    transitively reachable from the plan builder function, resolved
    source-text-only through the package's import graph.

SYMBOL granularity (round 8; previously whole-module sources) exists
because a 100-gate registry rotates through a 50-slot driver window: with
module-level hashing, one new operator added to a shared module
(operators/windows.py, functions/text.py, ...) flipped EVERY gate that
imported the module — 49 of 50 r6 attestations were invalidated by r7
edits none of them executed. Now an edit to ``ohlc_downsample`` flips only
the gates whose builders actually reach ``ohlc_downsample``.

Two deliberate conservatisms keep the closure sound:

  * a module whose import-time behavior is not captured by per-symbol ASTs
    — top-level registration loops, in-module registering decorators
    (``classify.py``'s ``action_impl``), bare top-level statements
    (``sources/abi_decode.py``) — is COARSE: it contributes its whole AST
    dump, and its references are chased from the whole module. The plain /
    coarse decision is automatic from the module's top-level statement
    shapes, not a hand-list.
  * any reference that cannot be resolved to a specific symbol (dynamic
    attribute, unresolvable re-export) degrades to the whole target
    module, never to silence.

Hashes are over ``ast.dump`` (not raw source), so comment and formatting
edits do not invalidate attestations; docstring edits do (they are AST).

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


# --------------------------------------------------------------------------
# symbol-level closure
# --------------------------------------------------------------------------

class _ModInfo:
    """Source-text-only structural view of one package module."""

    __slots__ = ("name", "tree", "symbols", "imports", "star", "coarse")

    def __init__(self, name: str, tree, symbols, imports, star, coarse):
        self.name = name
        self.tree = tree
        self.symbols = symbols  # local name -> [top-level AST nodes]
        self.imports = imports  # local name -> ("mod", m) | ("sym", m, s)
        self.star = star        # modules star-imported
        self.coarse = coarse


_info_cache: dict[str, "_ModInfo | None"] = {}
_content_cache: dict[tuple[str, str], str] = {}
_refs_cache: dict[tuple[str, str], "frozenset"] = {}
_gate_closure_cache: dict[tuple[str, str], tuple] = {}


def _clear_caches() -> None:
    for c in (_closure_cache, _source_cache, _info_cache, _content_cache,
              _refs_cache, _gate_closure_cache):
        c.clear()


def _is_main_guard(node) -> bool:
    import ast

    t = node.test
    return (
        isinstance(t, ast.Compare)
        and isinstance(t.left, ast.Name)
        and t.left.id == "__name__"
    )


def _mod_info(name: str) -> "_ModInfo | None":
    """Parse ``name`` into symbols + import bindings; None if unreadable
    (caller falls back to whole-module hashing)."""
    import ast

    if name in _info_cache:
        return _info_cache[name]
    src = _module_source(name)
    info = None
    if src:
        try:
            tree = ast.parse(src)
        except SyntaxError:
            tree = None
        if tree is not None:
            parts = name.split(".")
            is_pkg = (_module_path(name) or "").endswith("__init__.py")
            base = parts if is_pkg else parts[:-1]
            symbols: dict[str, list] = {}
            imports: dict[str, tuple] = {}
            star: list[str] = []

            def bind_imports(node):
                if isinstance(node, ast.Import):
                    for a in node.names:
                        if a.asname:
                            imports[a.asname] = ("mod", a.name)
                        else:
                            # `import a.b.c` binds root `a`; the chain walk
                            # resolves the rest via attribute descent
                            imports[a.name.split(".")[0]] = ("mod", a.name.split(".")[0])
                elif isinstance(node, ast.ImportFrom):
                    if node.level == 0:
                        target = node.module or ""
                    else:
                        anchor = base[: len(base) - (node.level - 1)]
                        target = ".".join(
                            anchor + (node.module.split(".") if node.module else [])
                        )
                    for a in node.names:
                        if a.name == "*":
                            star.append(target)
                        else:
                            imports[a.asname or a.name] = ("sym", target, a.name)

            # imports ANYWHERE count (function-body lazy imports included),
            # same blind-spot rule as the module-level closure
            for node in ast.walk(tree):
                bind_imports(node)

            coarse = False
            for i, st in enumerate(tree.body):
                if isinstance(st, (ast.Import, ast.ImportFrom)):
                    continue
                if isinstance(st, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                    symbols.setdefault(st.name, []).append(st)
                    for dec in st.decorator_list:
                        c = dec.func if isinstance(dec, ast.Call) else dec
                        while isinstance(c, ast.Attribute):
                            c = c.value
                        if not isinstance(c, ast.Name):
                            coarse = True  # dynamic decorator: can't reason
                        elif c.id in symbols or (
                            c.id in imports
                            and imports[c.id][1].startswith(_PKG)
                            and imports[c.id][1] not in _EXCLUDE
                        ):
                            # in-package decorator outside the excluded
                            # ordering machinery: assume it REGISTERS the
                            # function into module state at import time
                            coarse = True
                elif isinstance(st, (ast.Assign, ast.AnnAssign)):
                    targets = st.targets if isinstance(st, ast.Assign) else [st.target]
                    for t in targets:
                        for n in ast.walk(t):
                            if isinstance(n, ast.Name):
                                symbols.setdefault(n.id, []).append(st)
                elif (
                    i == 0
                    and isinstance(st, ast.Expr)
                    and isinstance(st.value, ast.Constant)
                    and isinstance(st.value.value, str)
                ):
                    continue  # module docstring
                elif isinstance(st, ast.If) and _is_main_guard(st):
                    continue  # __main__ guard: not executed on import
                else:
                    coarse = True  # top-level Try/For/Expr/...: import-time state
            info = _ModInfo(name, tree, symbols, imports, star, coarse)
    _info_cache[name] = info
    return info


def _chains(nodes) -> set[tuple]:
    """Name-rooted reference chains inside ``nodes``: plain names as
    ``(name,)``, attribute accesses as ``(name, attr, ...)``. The chain walk
    never emits a PREFIX of a longer chain for the same site (``spans.f()``
    must not also count as a bare ``spans`` reference, which would coarsen
    the whole module)."""
    import ast

    out: set[tuple] = set()

    class V(ast.NodeVisitor):
        def visit_Attribute(self, n):
            chain = []
            cur = n
            while isinstance(cur, ast.Attribute):
                chain.append(cur.attr)
                cur = cur.value
            if isinstance(cur, ast.Name):
                out.add((cur.id, *reversed(chain)))
            else:
                self.visit(cur)  # f(x).attr — keep walking the call

        def visit_Name(self, n):
            out.add((n.id,))

    for node in nodes:
        V().visit(node)
    return out


def _resolve_chain(info: "_ModInfo", chain: tuple, out: set, self_sym: str | None) -> None:
    """Resolve one reference chain to (module, symbol|None) targets; None
    symbol = include the whole module (coarse degrade, never silence)."""
    name, *attrs = chain
    if name in info.symbols and name != self_sym:
        out.add((info.name, name))
        return
    imp = info.imports.get(name)
    if imp is None:
        for sm in info.star:
            if sm.startswith(_PKG):
                sub = _mod_info(sm)
                if sub is not None and name in sub.symbols:
                    out.add((sm, name))
                    return
                out.add((sm, None))  # can't prove absence: take the module
        return
    if imp[0] == "sym":
        _, m, s = imp
        if not m.startswith(_PKG):
            return
        _resolve_in_module(m, (s, *attrs), out)
    else:
        _, m = imp
        if not m.startswith(_PKG):
            return
        _descend(m, tuple(attrs), out)


def _resolve_in_module(m: str, chain: tuple, out: set) -> None:
    """Resolve ``chain`` whose first element is a name IN module ``m``."""
    if m in _EXCLUDE or not m.startswith(_PKG):
        return
    name, *attrs = chain
    if _is_module(f"{m}.{name}"):
        _descend(f"{m}.{name}", tuple(attrs), out)
        return
    sub = _mod_info(m)
    if sub is None:
        out.add((m, None))
        return
    if name in sub.symbols:
        out.add((m, name))
        return
    imp = sub.imports.get(name)
    if imp is not None:  # re-export: chase it
        if imp[0] == "sym":
            if imp[1].startswith(_PKG):
                _resolve_in_module(imp[1], (imp[2], *attrs), out)
        elif imp[1].startswith(_PKG):
            _descend(imp[1], tuple(attrs), out)
        return
    out.add((m, None))  # unresolvable: whole module


def _descend(m: str, attrs: tuple, out: set) -> None:
    """Attribute-walk ``attrs`` starting from module ``m``."""
    if m in _EXCLUDE or not m.startswith(_PKG):
        return
    if not attrs:
        # bare module reference (passed around as an object): coarse
        out.add((m, None))
        return
    _resolve_in_module(m, attrs, out)


def _symbol_entry(mod: str, sym: str | None) -> tuple[str, frozenset]:
    """(content-hash, references) for one closure node. ``sym is None`` or a
    coarse/unparseable module hashes the whole module and chases every
    reference in it."""
    import ast

    key = (mod, sym or "*")
    info = _mod_info(mod)
    if info is None:
        content = _content_cache.get(key)
        if content is None:
            content = _module_source(mod)
            _content_cache[key] = content
        # unparseable: degrade to the old whole-module-closure behavior
        refs = _refs_cache.get(key)
        if refs is None:
            refs = frozenset((d, None) for d in _module_deps(mod))
            _refs_cache[key] = refs
        return content, refs
    if sym is not None and not info.coarse and sym in info.symbols:
        nodes = info.symbols[sym]
        self_sym = sym
    else:
        nodes = [info.tree]
        self_sym = None
        key = (mod, "*")
    content = _content_cache.get(key)
    if content is None:
        content = "\n".join(ast.dump(n) for n in nodes)
        _content_cache[key] = content
    refs = _refs_cache.get(key)
    if refs is None:
        targets: set = set()
        for chain in sorted(_chains(nodes)):
            _resolve_chain(info, chain, targets, self_sym)
        refs = frozenset(targets)
        _refs_cache[key] = refs
    return content, refs


def _gate_closure(build_fn) -> tuple[tuple[str, str], ...]:
    """Sorted ((key, content-hash-input), ...) for every symbol reachable
    from the builder function."""
    root_mod = build_fn.__module__
    root_sym = build_fn.__name__
    ck = (root_mod, root_sym)
    if ck in _gate_closure_cache:
        return _gate_closure_cache[ck]
    seen: dict[tuple[str, str], str] = {}
    stack: list[tuple[str, "str | None"]] = [(root_mod, root_sym)]
    visited: set = set()
    while stack:
        mod, sym = stack.pop()
        if not mod.startswith(_PKG) or mod in _EXCLUDE:
            continue
        info = _mod_info(mod)
        if info is not None and (info.coarse or sym is None or sym not in info.symbols):
            sym = None  # normalize: this node is the whole module
        node = (mod, sym)
        if node in visited:
            continue
        visited.add(node)
        content, refs = _symbol_entry(mod, sym)
        seen[(mod, sym or "*")] = content
        stack.extend(refs)
    out = tuple(sorted((f"{m}:{s}", c) for (m, s), c in seen.items()))
    _gate_closure_cache[ck] = out
    return out


def compute_all() -> dict[str, str]:
    """Current fingerprint for every registered gate."""
    from .registry import REGISTRY

    fps: dict[str, str] = {}
    for name, spec in REGISTRY.items():
        h = hashlib.md5((spec.oracle or "").encode())
        for key, content in _gate_closure(spec.build):
            h.update(b"\x00")
            h.update(key.encode())
            h.update(b"\x00")
            h.update(content.encode())
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
        prev_rounds = _stored_rounds(prev) if prev else []
        if prev and (migrate or prev.get("fp") == fp):
            rounds = prev_rounds
        elif prev:
            rounds = prev_rounds + ([rnd] if rnd not in prev_rounds else [])
        else:
            rounds = []
        out[name] = {
            "fp": fp,
            "round": rounds[-1] if rounds else -1,
            "rounds": rounds,
        }
    if write:
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
            f.write("\n")
    return out


def _stored_rounds(entry: dict) -> list[int]:
    """Full change-round history of one store entry; legacy entries that
    predate the history list degrade to their single last-change round."""
    rounds = entry.get("rounds")
    if rounds is None:
        last = int(entry.get("round", -1))
        rounds = [] if last == -1 else [last]
    return [int(r) for r in rounds]


def change_history(path: str = STORE_PATH) -> dict[str, list[int]]:
    """Gate -> every round its implementation changed in (ascending), per
    the persisted store reconciled against LIVE fingerprints: if the code
    changed and the store was not refreshed, the current round is appended
    (risk-first) rather than riding a stale entry. The HISTORY (round 12,
    replacing the single last-change round) exists because frozen-history
    window replays must see the change round a PAST driver saw: with only
    the last stamp, re-editing a gate in round N+1 erased its round-M
    stamp and silently re-ranked the replayed round-N window
    (tests/test_plans.py::test_r11_window_seating caught exactly this when
    dedup_minhash_lsh was re-edited in r12 over its r7 stamp). Returns {}
    on any computation failure so ordering degrades to history +
    FORCE_RECHECK instead of crashing the driver entrypoint.
    """
    try:
        stored = load_stored(path)
        if not stored:
            return {}
        live = compute_all()
        rnd = current_round()
        out: dict[str, list[int]] = {}
        for name, fp in live.items():
            prev = stored.get(name)
            if prev is None:
                out[name] = [rnd]
            else:
                rounds = _stored_rounds(prev)
                if prev.get("fp") != fp and rnd not in rounds:
                    rounds = rounds + [rnd]
                out[name] = rounds
        return out
    except Exception:
        return {}


def change_rounds(path: str = STORE_PATH) -> dict[str, int]:
    """Gate -> round its implementation LAST changed (-1 = no known
    change); see change_history for the reconciliation rules."""
    return {n: (rs[-1] if rs else -1) for n, rs in change_history(path).items()}


def change_rounds_asof(this_round: int, path: str = STORE_PATH) -> dict[str, int]:
    """Gate -> newest change round <= ``this_round``; gates with no change
    that early are ABSENT (treated as never-changed by the caller). This is
    the replay-safe view: a stamp from a later round cannot retroactively
    alter round N's window, and the round-M stamp it superseded still
    counts."""
    out: dict[str, int] = {}
    for n, rs in change_history(path).items():
        eligible = [r for r in rs if r <= this_round]
        if eligible:
            out[n] = eligible[-1]
    return out


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
