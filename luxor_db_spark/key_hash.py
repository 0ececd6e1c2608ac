"""Per-key source hashing (pure AST, no Spark).

Each operator key's "source identity" is the full ``@query(...)``-decorated
function segment — decorators first (so the oracle SQL participates),
through the function's last line — hashed with sha1. Two registration
patterns are supported:

1. ``@query("key", oracle=...)`` decorator on a ``def``.
2. Module-level ``query("key", oracle=ORACLE_CONST)(fn)`` — the hash then
   covers the registration statement, the referenced oracle constant's
   assignment, and ``fn``'s own def.

Used by ``driver_coverage`` (compare current hashes against
``docs/driver_key_evidence.json`` to re-queue keys whose code changed
since their last driver-green row) and by ``tools/key_evidence.py``
(rebuild that ledger from git history). The same function handles a file
on disk and a historical ``git show`` blob, so current and at-green
hashes are always computed identically.
"""

from __future__ import annotations

import ast
import hashlib
from pathlib import Path


def source_hash(text: str) -> str:
    return hashlib.sha1(text.encode("utf-8")).hexdigest()[:12]


def key_sources(source: str) -> dict[str, str]:
    """Map operator key -> full decorated-function source segment."""
    try:
        tree = ast.parse(source)
    except SyntaxError:
        return {}
    lines = source.splitlines(keepends=True)

    def _seg(start_lineno: int, end_lineno: int) -> str:
        return "".join(lines[start_lineno - 1 : end_lineno])

    def _is_query_call(call: ast.expr) -> str | None:
        if (
            isinstance(call, ast.Call)
            and isinstance(call.func, ast.Name)
            and call.func.id == "query"
            and call.args
            and isinstance(call.args[0], ast.Constant)
            and isinstance(call.args[0].value, str)
        ):
            return call.args[0].value
        return None

    funcs: dict[str, ast.FunctionDef] = {}
    assigns: dict[str, tuple[int, int]] = {}
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            funcs[node.name] = node
        elif isinstance(node, ast.Assign) and len(node.targets) == 1:
            t = node.targets[0]
            if isinstance(t, ast.Name):
                assigns[t.id] = (node.lineno, node.end_lineno)

    out: dict[str, str] = {}
    for node in ast.walk(tree):
        # Pattern 1: @query("key", ...) decorator.
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for dec in node.decorator_list:
                key = _is_query_call(dec)
                if key is not None:
                    start = min(d.lineno for d in node.decorator_list)
                    out[key] = _seg(start, node.end_lineno)
        # Pattern 2: module-level query("key", oracle=ORACLE_CONST)(fn).
        elif isinstance(node, ast.Expr) and isinstance(node.value, ast.Call):
            outer = node.value
            key = _is_query_call(outer.func)
            if key is None:
                continue
            parts = [_seg(node.lineno, node.end_lineno)]
            inner = outer.func
            oracle_args = list(inner.args[1:]) + [
                kw.value for kw in inner.keywords
            ]
            for a in oracle_args:
                if isinstance(a, ast.Name) and a.id in assigns:
                    parts.append(_seg(*assigns[a.id]))
            for a in outer.args:
                if isinstance(a, ast.Name) and a.id in funcs:
                    fn = funcs[a.id]
                    start = min(
                        [d.lineno for d in fn.decorator_list] + [fn.lineno]
                    )
                    parts.append(_seg(start, fn.end_lineno))
            out[key] = "".join(parts)
    return out


def hashes_from_tree(repo_root: Path, pkg: str = "luxor_db_spark") -> dict[str, str]:
    """key -> source hash for every operator file in the working tree."""
    out: dict[str, str] = {}
    for path in sorted((repo_root / pkg).rglob("*.py")):
        try:
            text = path.read_text()
        except OSError:
            continue
        for key, src in key_sources(text).items():
            out[key] = source_hash(src)
    return out
