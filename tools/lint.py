#!/usr/bin/env python
"""Zero-dependency linter (C49: the reference's pre-commit black/isort/
flake8 role, runnable in environments without lint packages).

Checks (a practical pyflakes/pycodestyle subset):
  F401  unused import
  F811  redefinition of an imported name by another import
  E501  line longer than 88 columns
  W291  trailing whitespace
  W191  tab indentation
  E722  bare except
  B006  mutable default argument
  F541  f-string without placeholders
  SYN   syntax error

CI runs the real `ruff check` (network available there); `make lint` runs
this so local hygiene never depends on uninstallable tooling.
"""
from __future__ import annotations

import ast
import sys
from pathlib import Path

MAX_LINE = 88


def check_file(path: Path) -> list[str]:
    src = path.read_text()
    problems: list[str] = []

    for i, line in enumerate(src.splitlines(), 1):
        stripped = line.rstrip("\n")
        if len(stripped) > MAX_LINE and "noqa" not in stripped:
            problems.append(f"{path}:{i}: E501 line too long "
                            f"({len(stripped)} > {MAX_LINE})")
        if stripped != stripped.rstrip():
            problems.append(f"{path}:{i}: W291 trailing whitespace")
        if stripped.startswith("\t"):
            problems.append(f"{path}:{i}: W191 tab indentation")

    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        problems.append(f"{path}:{e.lineno}: SYN {e.msg}")
        return problems

    imported: dict[str, tuple[int, str]] = {}
    used: set[str] = set()

    class Visitor(ast.NodeVisitor):
        def visit_Import(self, node):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                # F811 only for module-level re-imports; function-scoped
                # imports legitimately shadow module ones
                if name in imported and node.col_offset == 0:
                    problems.append(
                        f"{path}:{node.lineno}: F811 redefinition of "
                        f"'{name}' (first import at line "
                        f"{imported[name][0]})")
                imported[name] = (node.lineno, a.name)

        def visit_ImportFrom(self, node):
            if node.module == "__future__":
                return
            for a in node.names:
                if a.name == "*":
                    continue
                name = a.asname or a.name
                imported[name] = (node.lineno, a.name)

        def visit_Name(self, node):
            used.add(node.id)

        def visit_Attribute(self, node):
            self.generic_visit(node)

        def visit_ExceptHandler(self, node):
            if node.type is None:
                problems.append(f"{path}:{node.lineno}: E722 bare except")
            self.generic_visit(node)

        def visit_FunctionDef(self, node):
            self._defaults(node)
            self.generic_visit(node)

        def visit_AsyncFunctionDef(self, node):
            self._defaults(node)
            self.generic_visit(node)

        def _defaults(self, node):
            for d in node.args.defaults + node.args.kw_defaults:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    problems.append(
                        f"{path}:{d.lineno}: B006 mutable default argument")

        def visit_JoinedStr(self, node):
            if not any(isinstance(v, ast.FormattedValue)
                       for v in node.values):
                problems.append(
                    f"{path}:{node.lineno}: F541 f-string without "
                    f"placeholders")
            # visit placeholder EXPRESSIONS but not format specs (a spec
            # like ':.2f' parses as a nested placeholder-free JoinedStr)
            for v in node.values:
                if isinstance(v, ast.FormattedValue):
                    self.visit(v.value)

    Visitor().visit(tree)

    # names used inside string annotations / __all__ count as used
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            for name in imported:
                if name in node.value:
                    used.add(name)

    # __init__.py imports are re-exports (the package API) — pyflakes'
    # --init-allow behaviour
    if path.name != "__init__.py":
        for name, (lineno, _) in imported.items():
            if name not in used and not name.startswith("_"):
                problems.append(f"{path}:{lineno}: F401 '{name}' imported "
                                f"but unused")
    return problems


def main(argv: list[str]) -> int:
    roots = [Path(a) for a in argv] or [Path("pctpu"), Path("tests"),
                                        Path("tools")]
    files: list[Path] = []
    for r in roots:
        files += [r] if r.is_file() else sorted(r.rglob("*.py"))
    problems: list[str] = []
    for f in files:
        problems += check_file(f)
    for p in problems:
        print(p)
    print(f"lint: {len(files)} files, {len(problems)} problem(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
