"""Self-contained lint gate (the image has no pylama/flake8/pycodestyle, so
this mirrors the reference's lint CI — reference setup.cfg:17-20, Makefile:11
— with a stdlib-AST checker).

Checks:
  unused-import      imported name never referenced in the module
  bare-except        ``except:`` with no exception class
  mutable-default    list/dict/set literal as a parameter default
  line-length        source line longer than 100 characters
  tab-indent         tab characters in indentation
  syntax             file does not parse

Usage: python tools/lint.py [paths...]   # default: package + tools + root scripts
Exit 0 = clean.
"""

from __future__ import annotations

import ast
import io
import os
import sys
import tokenize

MAX_LINE = 100

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_PATHS = [
    os.path.join(REPO, "dask_lightgbm_spark"),
    os.path.join(REPO, "tools"),
    os.path.join(REPO, "tests"),
    os.path.join(REPO, "bench.py"),
    os.path.join(REPO, "__spark_entry__.py"),
]


def _py_files(paths):
    for p in paths:
        if os.path.isfile(p) and p.endswith(".py"):
            yield p
        elif os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                for f in sorted(files):
                    if f.endswith(".py"):
                        yield os.path.join(root, f)


class _ImportTracker(ast.NodeVisitor):
    def __init__(self):
        self.imports: dict[str, tuple[int, str]] = {}  # name -> (lineno, shown)
        self.used: set[str] = set()

    def visit_Import(self, node):
        for a in node.names:
            name = a.asname or a.name.split(".")[0]
            self.imports[name] = (node.lineno, a.name)

    def visit_ImportFrom(self, node):
        for a in node.names:
            if a.name == "*":
                continue
            name = a.asname or a.name
            self.imports[name] = (node.lineno, a.name)

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)


def lint_file(path: str) -> list[str]:
    problems = []
    rel = os.path.relpath(path, REPO)
    with open(path, encoding="utf-8") as f:
        src = f.read()
    try:
        tree = ast.parse(src, filename=path)
    except SyntaxError as e:
        return [f"{rel}:{e.lineno}: syntax: {e.msg}"]

    # lines inside multi-line string literals (embedded SQL oracles, doc
    # text) are data, not code — exempt from the length limit
    str_lines: set[int] = set()
    try:
        for tok in tokenize.generate_tokens(io.StringIO(src).readline):
            if tok.type == tokenize.STRING and tok.end[0] > tok.start[0]:
                str_lines.update(range(tok.start[0], tok.end[0] + 1))
    except tokenize.TokenError:
        pass

    for i, line in enumerate(src.splitlines(), 1):
        if len(line) > MAX_LINE and i not in str_lines:
            problems.append(f"{rel}:{i}: line-length: {len(line)} > {MAX_LINE}")
        stripped_len = len(line) - len(line.lstrip("\t "))
        if "\t" in line[:stripped_len]:
            problems.append(f"{rel}:{i}: tab-indent")

    tracker = _ImportTracker()
    tracker.visit(tree)
    # a module-level docstring or __all__ can re-export; also honor
    # ``# noqa`` on the import line
    lines = src.splitlines()
    for name, (lineno, shown) in tracker.imports.items():
        if name in tracker.used or name == "annotations":
            continue
        if "# noqa" in lines[lineno - 1]:
            continue
        if f'"{name}"' in src or f"'{name}'" in src:  # __all__ / string ref
            continue
        problems.append(f"{rel}:{lineno}: unused-import: {shown}")

    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            problems.append(f"{rel}:{node.lineno}: bare-except")
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in node.args.defaults + node.args.kw_defaults:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    problems.append(
                        f"{rel}:{d.lineno}: mutable-default in {node.name}()"
                    )
    return problems


def main():
    paths = sys.argv[1:] or DEFAULT_PATHS
    all_problems = []
    n_files = 0
    for f in _py_files(paths):
        n_files += 1
        all_problems.extend(lint_file(f))
    for p in all_problems:
        print(p)
    print(f"# {n_files} files, {len(all_problems)} problems", file=sys.stderr)
    sys.exit(1 if all_problems else 0)


if __name__ == "__main__":
    main()
