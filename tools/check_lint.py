#!/usr/bin/env python
"""Minimal in-repo lint: the ruff rules CI enforces that matter most and
can be checked without the ruff binary (not installed in the dev image).

Covers: F401 (unused imports, module scope), F811 (duplicate top-level
defs), W291/W293 (trailing whitespace), and tabs in indentation. E501/E731
are ignored per pyproject. Exit code 1 on findings.
"""

from __future__ import annotations

import ast
import pathlib
import re
import sys

SKIP_PARTS = (".git", "__pycache__", ".jax_cache", ".bench_cache")


def iter_files(root: pathlib.Path):
    for path in sorted(root.rglob("*.py")):
        if any(part in SKIP_PARTS for part in path.parts):
            continue
        yield path


def unused_imports(path: pathlib.Path, tree: ast.AST, src: str):
    lines = src.splitlines()
    imports = {}  # name -> (lineno, end_lineno) of its whole statement
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                imports[(a.asname or a.name).split(".")[0]] = (
                    node.lineno, node.end_lineno)
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.name == "*":
                    continue
                name = a.asname or a.name
                if name != "annotations":
                    imports[name] = (node.lineno, node.end_lineno)
    out = []
    for name, (lineno, end_lineno) in imports.items():
        stmt = range(lineno - 1, (end_lineno or lineno))
        if any("noqa" in lines[i] for i in stmt):
            continue
        # exclude EVERY line of the (possibly parenthesized multi-line)
        # import statement from the usage scan
        body = "\n".join(ln for i, ln in enumerate(lines) if i not in stmt)
        if not re.search(rf"\b{re.escape(name)}\b", body):
            out.append(f"{path}:{lineno}: F401 unused import '{name}'")
    return out


def duplicate_defs(path: pathlib.Path, tree: ast.Module):
    seen = {}
    out = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            if node.name in seen:
                out.append(f"{path}:{node.lineno}: F811 redefinition of "
                           f"'{node.name}' (first at {seen[node.name]})")
            seen[node.name] = node.lineno
    return out


def whitespace(path: pathlib.Path, src: str):
    out = []
    for i, line in enumerate(src.splitlines(), 1):
        if line != line.rstrip():
            out.append(f"{path}:{i}: W291/W293 trailing whitespace")
        if line[:len(line) - len(line.lstrip())].count("\t"):
            out.append(f"{path}:{i}: W191 tab in indentation")
    return out


def run(roots) -> int:
    findings = []
    for root in roots:
        root = pathlib.Path(root)
        files = iter_files(root) if root.is_dir() else [root]
        for path in files:
            src = path.read_text()
            try:
                tree = ast.parse(src)
            except SyntaxError as exc:
                findings.append(f"{path}: E999 {exc}")
                continue
            findings += unused_imports(path, tree, src)
            findings += duplicate_defs(path, tree)
            findings += whitespace(path, src)
    for f in findings:
        print(f)
    print(f"{len(findings)} findings")
    return 1 if findings else 0


if __name__ == "__main__":
    roots = sys.argv[1:] or ["multivae_tpu", "tests", "bench.py",
                             "__graft_entry__.py", "tools"]
    raise SystemExit(run(roots))
