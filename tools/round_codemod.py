"""One-shot codemod: scaled rounding made engine-portable.

Spark's ``F.round(x, n)`` rounds the SHORTEST-DECIMAL-REPR of the double
half-up (BigDecimal semantics): ``F.round(-1.0000005, 6) = -1.000001``.
DuckDB's ``ROUND(x, 6)`` scales the BINARY value: ``round(x*1e6)/1e6 =
-1.0`` (verified bit-equal to the scaled formula over 200k fuzz samples).
Scale-0 rounding agrees between the engines (pinned by the driver-green
``semantics_probe``), so rewriting every ``F.round(expr, n)`` as
``F.round(expr * 1e{n}) / 1e{n}`` makes scaled rounding identical by
construction.

AST-guided, idempotent afterwards (the rewritten form has one arg).
"""

from __future__ import annotations

import ast
import sys


def rewrite(path: str) -> int:
    src = open(path).read()
    tree = ast.parse(src)
    edits = []

    class V(ast.NodeVisitor):
        def visit_Call(self, node: ast.Call):
            f = node.func
            if (
                isinstance(f, ast.Attribute)
                and f.attr == "round"
                and isinstance(f.value, ast.Name)
                and f.value.id == "F"
                and len(node.args) == 2
                and isinstance(node.args[1], ast.Constant)
                and isinstance(node.args[1].value, int)
                and node.args[1].value > 0
            ):
                n = node.args[1].value
                seg = ast.get_source_segment(src, node.args[0])
                if seg is not None:
                    edits.append(
                        (
                            node.lineno,
                            node.col_offset,
                            node.end_lineno,
                            node.end_col_offset,
                            f"(F.round(({seg}) * F.lit(1e{n})) / F.lit(1e{n}))",
                        )
                    )
            self.generic_visit(node)

    V().visit(tree)
    lines = src.split("\n")
    for ln, col, eln, ecol, new in sorted(edits, reverse=True):
        if ln == eln:
            line = lines[ln - 1]
            lines[ln - 1] = line[:col] + new + line[ecol:]
        else:
            first, last = lines[ln - 1], lines[eln - 1]
            lines[ln - 1 : eln] = [first[:col] + new + last[ecol:]]
    out = "\n".join(lines)
    ast.parse(out)
    open(path, "w").write(out)
    return len(edits)


if __name__ == "__main__":
    for p in sys.argv[1:]:
        print(p, rewrite(p))
