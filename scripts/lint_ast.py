"""Minimal stdlib-only lint: unused imports, redefinitions, obvious bugs.

Fallback for environments without pyflakes (this image bundles no lint
tooling); CI installs pyflakes and uses it first, but this checker keeps
``make lint-check`` able to FAIL everywhere. Checks, per file:

* F401: imported name never used (module top level only, honoring
  ``__all__`` and re-export shims via ``# noqa`` or ``as``-self imports),
* F811: function/class redefined in the same scope,
* F821-lite: names referenced in ``__all__`` that don't exist,
* syntax errors (compile()).

Exit 1 on any finding. Usage: python scripts/lint_ast.py PATH [PATH ...]
"""

import ast
import pathlib
import sys


def iter_py_files(paths):
    for raw in paths:
        path = pathlib.Path(raw)
        if path.is_dir():
            yield from sorted(path.rglob("*.py"))
        elif path.suffix == ".py":
            yield path


def _noqa_lines(source):
    return {
        lineno
        for lineno, line in enumerate(source.splitlines(), start=1)
        if "# noqa" in line
    }


class _NameCollector(ast.NodeVisitor):
    """All identifiers loaded anywhere in the module (incl. attributes' roots)."""

    def __init__(self):
        self.used = set()

    def visit_Name(self, node):
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)
        self.generic_visit(node)

    def visit_Attribute(self, node):
        self.generic_visit(node)


def check_file(path):
    findings = []
    source = path.read_text(encoding="utf8")
    try:
        tree = ast.parse(source, filename=str(path))
    except SyntaxError as error:
        return [f"{path}:{error.lineno}: E999 syntax error: {error.msg}"]
    noqa = _noqa_lines(source)

    collector = _NameCollector()
    collector.visit(tree)
    used = collector.used
    # Names exported via __all__ count as used.
    exported = set()
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for target in node.targets:
                if isinstance(target, ast.Name) and target.id == "__all__":
                    if isinstance(node.value, (ast.List, ast.Tuple)):
                        for element in node.value.elts:
                            if isinstance(element, ast.Constant):
                                exported.add(element.value)

    # F401: top-level imports never referenced.
    is_package_init = path.name == "__init__.py"
    for node in tree.body:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            if node.lineno in noqa:
                continue
            if is_package_init:
                continue  # package inits re-export by convention
            if isinstance(node, ast.ImportFrom) and node.module == "__future__":
                continue
            for alias in node.names:
                if alias.name == "*":
                    continue
                binding = (alias.asname or alias.name).split(".")[0]
                if alias.asname == alias.name:
                    continue  # explicit re-export idiom `import x as x`
                if binding not in used and binding not in exported:
                    findings.append(
                        f"{path}:{node.lineno}: F401 '{alias.name}' imported but unused"
                    )

    # F811: same-scope def/class redefinitions.
    def walk_scope(body):
        decorated = {}
        for node in body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                has_decorators = bool(node.decorator_list)
                if node.name in decorated and not has_decorators and not decorated[node.name]:
                    findings.append(
                        f"{path}:{node.lineno}: F811 redefinition of '{node.name}'"
                    )
                decorated[node.name] = has_decorators
                walk_scope(node.body)

    walk_scope(tree.body)

    # __all__ names must exist at module top level.
    defined = set()
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            defined.add(node.name)
        elif isinstance(node, ast.Assign):
            for target in node.targets:
                if isinstance(target, ast.Name):
                    defined.add(target.id)
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            for alias in node.names:
                defined.add((alias.asname or alias.name).split(".")[0])
    for name in exported:
        if name not in defined:
            findings.append(f"{path}:1: F822 undefined name '{name}' in __all__")

    return findings


def main():
    paths = sys.argv[1:] or ["keras_ocr_tpu"]
    all_findings = []
    for path in iter_py_files(paths):
        all_findings.extend(check_file(path))
    for finding in all_findings:
        print(finding)
    if all_findings:
        print(f"{len(all_findings)} finding(s)")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
