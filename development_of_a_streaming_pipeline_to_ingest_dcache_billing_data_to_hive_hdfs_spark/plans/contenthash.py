"""Per-query content hashes for the plan-edit-aware driver rotation.

The correctness driver verifies only the first 50 ``queries()`` entries
per round, and ``catalog._computed_driver_priority`` ranks the catalog
by round-of-last-green-verdict. That ranking alone is blind to EDITS:
a query whose physical expression changes (directly, or through a
helper it calls in another module — e.g. the round-10 run-length-fold
rewrite in ``operators/textops.py`` that changed two catalog queries'
plans without touching their builders) keeps its old green round and
can wait up to the full rotation cycle for a hard driver verdict on the
new plan. These hashes close that hole: each registered query gets a
content hash over everything that determines its plan, the hashes are
persisted per round in ``QUERY_HASHES.json`` (scripts/
gen_query_hashes.py), and the priority ranking treats a query whose
live hash differs from the recorded one — or whose recorded hash is
newer than its last green verdict — as never-verified, so it leads the
next window.

What the hash covers, and at what granularity:

- the builder function's own source (``inspect.getsource``), plus the
  sources of every same-module function it references (transitively
  within the module) — so an edit to a shared catalog helper like
  ``rev_dec`` re-queues its users without an edit to ``catalog.py``
  re-queuing all 163 queries;
- the oracle SQL string (the other half of the driver contract);
- the md5 of the FILE of every package-internal module the builder
  references — via module-level imports resolved through
  ``fn.__globals__`` or via local ``from ..x import y`` statements in
  the builder body — expanded to the transitive closure over the
  module-level import graph (parsed with ``ast``, never executed).
  File granularity is deliberately coarse: any edit inside
  ``textops.py`` re-queues every query that reaches into it, which is
  exactly the conservative behavior the rotation promise needs. The
  builder's own module is excluded from the file-hash set (it is
  covered at function granularity above).

This is a change DETECTOR, not a soundness proof: a missed dependency
only means an edited query waits for the standing K-round staleness
bound (tests/test_driver_rotation.py) instead of leading the next
window; a false positive only means one wasted re-verification slot.
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import textwrap
import types
from functools import lru_cache
from pathlib import Path

_PKG_DIR = Path(__file__).resolve().parents[1]
_PKG_NAME = _PKG_DIR.name

__all__ = ["query_content_hash"]


def _module_file(mod: str) -> Path | None:
    """Absolute package-internal module name -> source file, resolved
    from the filesystem WITHOUT importing (builders' local imports may
    reference modules not yet loaded at registration time)."""
    if mod != _PKG_NAME and not mod.startswith(_PKG_NAME + "."):
        return None
    base = _PKG_DIR.joinpath(*mod.split(".")[1:])
    if base.is_dir():
        base = base / "__init__.py"
    else:
        base = base.with_suffix(".py")
    return base if base.is_file() else None


@lru_cache(maxsize=None)
def _module_file_hash(mod: str) -> str:
    p = _module_file(mod)
    return hashlib.md5(p.read_bytes()).hexdigest() if p else "?"


def _is_package(mod: str) -> bool:
    p = _module_file(mod)
    return bool(p) and p.name == "__init__.py"


def _resolve_import_from(
    importer: str, importer_is_pkg: bool, node: ast.ImportFrom
) -> set[str]:
    """Package-internal modules referenced by one ``from X import Y``
    (PEP 328 for relative imports). Each imported name may itself be a
    submodule (``from . import textops``) — counted as a module iff a
    file for it exists; otherwise the base module carries the edge."""
    if node.level == 0:
        base = node.module or ""
    else:
        parts = importer.split(".")
        if not importer_is_pkg:
            parts = parts[:-1]
        if node.level - 1 > 0:
            if node.level - 1 >= len(parts):
                return set()
            parts = parts[: len(parts) - (node.level - 1)]
        if node.module:
            parts = parts + node.module.split(".")
        base = ".".join(parts)
    if not base or (base != _PKG_NAME and not base.startswith(_PKG_NAME + ".")):
        return set()
    out: set[str] = set()
    for alias in node.names:
        sub = f"{base}.{alias.name}"
        if _module_file(sub):
            out.add(sub)
        else:
            out.add(base)
    return out


@lru_cache(maxsize=None)
def _module_internal_imports(mod: str) -> frozenset[str]:
    """Direct package-internal import edges of a module file (parsed,
    never executed)."""
    p = _module_file(mod)
    if p is None:
        return frozenset()
    try:
        tree = ast.parse(p.read_text())
    except (OSError, SyntaxError):
        return frozenset()
    deps: set[str] = set()
    is_pkg = _is_package(mod)
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            deps.update(
                a.name
                for a in node.names
                if a.name == _PKG_NAME or a.name.startswith(_PKG_NAME + ".")
            )
        elif isinstance(node, ast.ImportFrom):
            deps.update(_resolve_import_from(mod, is_pkg, node))
    deps.discard(mod)
    return frozenset(deps)


@lru_cache(maxsize=None)
def _module_closure(mod: str) -> frozenset[str]:
    """Transitive closure over the module import graph, iterative (the
    graph has cycles through package ``__init__`` re-exports)."""
    seen: set[str] = set()
    stack = [mod]
    while stack:
        m = stack.pop()
        if m in seen:
            continue
        seen.add(m)
        stack.extend(_module_internal_imports(m))
    return frozenset(seen)


def _code_names(code: types.CodeType) -> set[str]:
    """Global names referenced by a code object, including nested code
    objects (inner helpers, comprehensions, lambdas)."""
    names = set(code.co_names)
    for const in code.co_consts:
        if isinstance(const, types.CodeType):
            names |= _code_names(const)
    return names


def _fn_source(fn) -> str:
    try:
        return inspect.getsource(fn)
    except (OSError, TypeError):
        # stable fallback — repr() embeds a memory address and would
        # make the hash differ between processes
        return f"<no-source {getattr(fn, '__module__', '?')}." \
               f"{getattr(fn, '__qualname__', '?')}>"


def _local_import_deps(fn, src: str) -> set[str]:
    """Modules referenced by import statements INSIDE the builder body
    (builders conventionally do ``from ..operators.x import y`` locally;
    those names are invisible to ``fn.__globals__``)."""
    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError:
        return set()
    mod = getattr(fn, "__module__", "") or ""
    deps: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            deps.update(
                a.name
                for a in node.names
                if a.name == _PKG_NAME or a.name.startswith(_PKG_NAME + ".")
            )
        elif isinstance(node, ast.ImportFrom):
            deps.update(_resolve_import_from(mod, False, node))
    return deps


def query_content_hash(fn, oracle: str | None) -> str:
    """Stable md5 over everything that determines a registered query's
    plan: builder + same-module helpers at function granularity, the
    oracle SQL, and cross-module deps at file granularity."""
    own_module = getattr(fn, "__module__", "") or ""
    sources: list[str] = []
    dep_mods: set[str] = set()
    seen_fns: set[str] = set()
    stack = [fn]
    while stack:
        f = stack.pop()
        key = f"{getattr(f, '__module__', '?')}.{getattr(f, '__qualname__', '?')}"
        if key in seen_fns:
            continue
        seen_fns.add(key)
        src = _fn_source(f)
        sources.append(f"# {key}\n{src}")
        dep_mods |= _local_import_deps(f, src)
        code = getattr(f, "__code__", None)
        g = getattr(f, "__globals__", None)
        if code is None or g is None:
            continue
        for name in sorted(_code_names(code)):
            obj = g.get(name)
            if obj is None:
                continue
            if isinstance(obj, types.ModuleType):
                mod = getattr(obj, "__name__", "")
                if mod == _PKG_NAME or mod.startswith(_PKG_NAME + "."):
                    dep_mods.add(mod)
                continue
            mod = getattr(obj, "__module__", "") or ""
            if mod != _PKG_NAME and not mod.startswith(_PKG_NAME + "."):
                continue
            if mod == own_module and isinstance(obj, types.FunctionType):
                stack.append(obj)  # same-module helper: function granularity
            else:
                dep_mods.add(mod)
    closure: set[str] = set()
    for m in dep_mods:
        closure |= _module_closure(m)
    closure.discard(own_module)
    parts = sources
    parts.append("\x00oracle\x00" + (oracle or ""))
    parts.extend(f"{m}={_module_file_hash(m)}" for m in sorted(closure))
    return hashlib.md5("\n".join(parts).encode("utf-8", "replace")).hexdigest()
