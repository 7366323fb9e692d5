"""Bind-time rewrites that specialize expressions to a concrete table's metadata.

The TPU engine keeps string bytes on the host (vector/string_table.py); device
VARCHAR columns are dictionary codes.  Before a pipeline is traced, expressions are
rewritten against the scan's string tables:

* VARCHAR literals inside comparisons / IN-lists are interned to int codes
  (a literal absent from the table becomes code -1, which matches no row);
* this is the moral analog of the reference pushing string predicates into
  dictionary-encoded column readers (velox/dwio/common/SelectiveColumnReader.h:121).
"""

from __future__ import annotations

from typing import Dict, Optional

from ..dtypes import TypeKind
from ..vector.string_table import StringTable
from .ir import Call, Constant, Expr, FieldAccess, Special


def bind_string_literals(expr: Expr, tables: Dict[str, StringTable]) -> Expr:
    """Rewrite VARCHAR str-valued Constants to dictionary-code Constants."""
    return _rewrite(expr, tables, None)


def _find_table(expr: Expr, tables: Dict[str, StringTable]) -> Optional[StringTable]:
    if isinstance(expr, FieldAccess) and expr.dtype.is_string:
        return tables.get(expr.name)
    for c in expr.children:
        t = _find_table(c, tables)
        if t is not None:
            return t
    return None


def _rewrite(expr: Expr, tables, context_table: Optional[StringTable]) -> Expr:
    if isinstance(expr, Constant):
        if expr.dtype.is_string and isinstance(expr.value, str):
            if context_table is None:
                raise ValueError(
                    f"string literal {expr.value!r} has no sibling string column to "
                    "bind against"
                )
            code = context_table.lookup(expr.value)
            return Constant(expr.dtype, -1 if code is None else code)
        return expr
    if isinstance(expr, (Call, Special)):
        # The comparison context: any string-typed field among the children.
        local = _find_table(expr, tables) or context_table
        new_args = tuple(_rewrite(a, tables, local) for a in expr.children)
        if isinstance(expr, Call):
            return Call(expr.dtype, expr.name, new_args)
        return Special(expr.dtype, expr.form, new_args)
    return expr
