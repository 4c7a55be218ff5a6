"""One-shot codemod: make every Spark ASC ordering explicitly NULLS LAST.

Spark's default ASC ordering is NULLS FIRST; DuckDB's (and the oracle
suite's) is NULLS LAST. Every orderBy over a nullable expression therefore
silently diverges cross-engine. This rewrites, in-place:

- ``.asc()``          -> ``.asc_nulls_last()``
- bare orderBy args   -> ``F.asc_nulls_last(<arg>)`` (AST-guided, so only
  real ``orderBy(...)`` argument expressions are touched; ``*starred``,
  ``.desc()``/``F.desc`` args (both engines default NULLS LAST there) and
  already-explicit args are left alone)

Run once per file set; idempotent afterwards.
"""

from __future__ import annotations

import ast
import sys


def rewrite(path: str) -> int:
    src = open(path).read()
    tree = ast.parse(src)
    lines = src.split("\n")
    edits = []  # (lineno, col, end_lineno, end_col, new_text)

    class V(ast.NodeVisitor):
        def visit_Call(self, node: ast.Call):
            fn = node.func
            if isinstance(fn, ast.Attribute) and fn.attr == "orderBy":
                for arg in node.args:
                    if isinstance(arg, ast.Starred):
                        continue
                    # skip args already direction-explicit
                    if isinstance(arg, ast.Call):
                        f = arg.func
                        name = (
                            f.attr
                            if isinstance(f, ast.Attribute)
                            else getattr(f, "id", "")
                        )
                        if name in (
                            "asc",
                            "desc",
                            "asc_nulls_last",
                            "asc_nulls_first",
                            "desc_nulls_last",
                            "desc_nulls_first",
                        ):
                            continue
                    seg = ast.get_source_segment(src, arg)
                    if seg is None:
                        continue
                    edits.append(
                        (
                            arg.lineno,
                            arg.col_offset,
                            arg.end_lineno,
                            arg.end_col_offset,
                            f"F.asc_nulls_last({seg})",
                        )
                    )
            self.generic_visit(node)

    V().visit(tree)
    # apply bottom-up so offsets stay valid
    for ln, col, eln, ecol, new in sorted(edits, reverse=True):
        if ln == eln:
            line = lines[ln - 1]
            lines[ln - 1] = line[:col] + new + line[ecol:]
        else:
            first, last = lines[ln - 1], lines[eln - 1]
            lines[ln - 1 : eln] = [first[:col] + new + last[ecol:]]
    out = "\n".join(lines)
    out = out.replace(".asc()", ".asc_nulls_last()")
    open(path, "w").write(out)
    ast.parse(out)  # syntax check
    return len(edits)


if __name__ == "__main__":
    for p in sys.argv[1:]:
        print(p, rewrite(p))
