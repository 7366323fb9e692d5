"""Fluent plan builder.

Reference: velox/exec/tests/utils/PlanBuilder.h:77 — the same ergonomics: SQL
strings for expressions, method chaining for operators, automatic projection of
aggregate arguments, automatic string-literal binding against scan dictionaries.
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Union

from ..dtypes import RowType
from ..expr.binding import bind_string_literals
from ..expr.ir import Call, Expr, FieldAccess
from ..expr.parser import parse_expr
from ..io.table import Table
from .nodes import (
    AggregationNode,
    AggregationStep,
    FilterNode,
    HashJoinNode,
    JoinType,
    LimitNode,
    OrderByNode,
    PlanNode,
    ProjectNode,
    SortKey,
    TableScanNode,
    TopNNode,
    ValuesNode,
)

_AS_RE = re.compile(r"^(?P<expr>.*?)\s+as\s+(?P<name>[A-Za-z_][A-Za-z_0-9]*)\s*$", re.IGNORECASE | re.DOTALL)
_AGG_RE = re.compile(r"^\s*(?P<fn>[A-Za-z_][A-Za-z_0-9]*)\s*\((?P<arg>.*)\)\s*$", re.DOTALL)


class PlanBuilder:
    def __init__(self, node: Optional[PlanNode] = None):
        self.node = node

    # ---- helpers -------------------------------------------------------
    @property
    def schema(self) -> RowType:
        return self.node.output_schema

    def _parse(self, sql: str, schema: Optional[RowType] = None) -> Expr:
        schema = schema or self.schema
        expr = parse_expr(sql, schema)
        tables = self._string_tables()
        if tables:
            expr = bind_string_literals(expr, tables)
        return expr

    def _string_tables(self) -> dict:
        """String tables visible to expressions at this point of the plan.

        Current-schema VARCHAR columns resolve through their provenance (so
        renamed / substr-derived columns bind correctly); scan-leaf tables are
        added by original name for columns referenced through pending joins.
        """
        out = {}
        if self.node is None:
            return out
        from ..exec.runner import resolve_column_strings

        schema = self.node.output_schema
        for name, t in zip(schema.names, schema.types):
            if t.is_string:
                tab = resolve_column_strings(self.node, name)
                if tab is not None:
                    out[name] = tab

        def walk(node: PlanNode):
            for s in node.sources:
                walk(s)
            if isinstance(node, (TableScanNode, ValuesNode)):
                for k, v in node.table.string_tables.items():
                    out.setdefault(k, v)

        walk(self.node)
        return out

    # ---- sources -------------------------------------------------------
    def table_scan(
        self,
        table: Table,
        columns: Optional[Sequence[str]] = None,
        filter: Optional[str] = None,
    ) -> "PlanBuilder":
        assert self.node is None, "table_scan must be the leaf"
        columns = tuple(columns) if columns else tuple(table.schema.names)
        node = TableScanNode(table, columns)
        self.node = node
        if filter:
            node.subfield_filter = self._parse(filter, node.output_schema)
        return self

    def values(self, table: Table) -> "PlanBuilder":
        assert self.node is None
        self.node = ValuesNode(table)
        return self

    # ---- operators -----------------------------------------------------
    def filter(self, sql: str) -> "PlanBuilder":
        self.node = FilterNode(self.node, self._parse(sql))
        return self

    def project(self, exprs: Sequence[str]) -> "PlanBuilder":
        names, parsed = [], []
        for i, item in enumerate(exprs):
            m = _AS_RE.match(item)
            if m:
                text, name = m.group("expr"), m.group("name")
            else:
                text = item
                name = item if re.fullmatch(r"[A-Za-z_][A-Za-z_0-9]*", item.strip()) else f"p{i}"
                name = name.strip()
            names.append(name)
            parsed.append(self._parse(text))
        self.node = ProjectNode(self.node, tuple(names), tuple(parsed))
        return self

    def aggregation(
        self,
        grouping_keys: Sequence[str],
        aggregates: Sequence[str],
        step: Union[str, AggregationStep] = AggregationStep.SINGLE,
    ) -> "PlanBuilder":
        """aggregates: 'sum(expr) as name' strings.  Non-field arguments are
        auto-projected first (the reference PlanBuilder does the same)."""
        step = AggregationStep(step)
        agg_names: List[str] = []
        fns: List[str] = []
        arg_exprs: List[Optional[Expr]] = []
        for i, item in enumerate(aggregates):
            m = _AS_RE.match(item)
            if m:
                body, name = m.group("expr"), m.group("name")
            else:
                body, name = item, f"a{i}"
            call_m = _AGG_RE.match(body)
            if not call_m:
                raise ValueError(f"cannot parse aggregate {item!r}")
            fn = call_m.group("fn").lower()
            arg = call_m.group("arg").strip()
            if fn == "count" and arg in ("*", ""):
                arg_exprs.append(None)
            else:
                arg_exprs.append(self._parse(arg))
            fns.append(fn)
            agg_names.append(name)

        # Auto-project: keys + each non-trivial argument.
        need_project = any(
            e is not None and not isinstance(e, FieldAccess) for e in arg_exprs
        )
        key_fields = [FieldAccess(self.schema.type_of(k), k) for k in grouping_keys]
        if need_project:
            names = list(grouping_keys)
            exprs: List[Expr] = list(key_fields)
            arg_names: List[Optional[str]] = []
            for i, e in enumerate(arg_exprs):
                if e is None:
                    arg_names.append(None)
                elif isinstance(e, FieldAccess):
                    if e.name not in names:
                        names.append(e.name)
                        exprs.append(e)
                    arg_names.append(e.name)
                else:
                    name = f"_a{i}"
                    names.append(name)
                    exprs.append(e)
                    arg_names.append(name)
            self.node = ProjectNode(self.node, tuple(names), tuple(exprs))
            arg_exprs = [
                None if n is None else FieldAccess(self.schema.type_of(n), n)
                for n in arg_names
            ]

        calls = []
        for fn, arg in zip(fns, arg_exprs):
            from ..exec.aggregates import bind_aggregate

            arg_t = arg.dtype if arg is not None else None
            bound = bind_aggregate(fn, arg_t, None)
            calls.append(Call(bound.result_type, fn, (arg,) if arg is not None else ()))
        self.node = AggregationNode(
            self.node, step, tuple(grouping_keys), tuple(agg_names), tuple(calls)
        )
        return self

    def _sort_keys(self, keys: Sequence[str]):
        out = []
        for k in keys:
            parts = k.split()
            name = parts[0]
            ascending = True
            nulls_first = False
            rest = [p.lower() for p in parts[1:]]
            if "desc" in rest:
                ascending = False
            if rest[-2:] == ["nulls", "first"]:
                nulls_first = True
            if name not in self.schema:
                raise KeyError(f"sort key {name!r} not in {self.schema}")
            out.append(SortKey(name, ascending, nulls_first))
        return tuple(out)

    def window(
        self,
        partition_keys: Sequence[str],
        order_keys: Sequence[str],
        calls: Sequence[str],
    ) -> "PlanBuilder":
        """calls: 'rank() as r' / 'sum(x) as s' / 'lag(x, 2) as prev'."""
        from ..exec.window import WindowCall, WindowNode, parse_window_call

        parsed, names = [], []
        for i, item in enumerate(calls):
            m = _AS_RE.match(item)
            if m:
                body, name = m.group("expr"), m.group("name")
            else:
                body, name = item, f"w{i}"
            parsed.append(parse_window_call(body))
            names.append(name)
        self.node = WindowNode(
            self.node,
            tuple(partition_keys),
            self._sort_keys(order_keys),
            tuple(parsed),
            tuple(names),
        )
        return self

    def row_number(
        self,
        partition_keys: Sequence[str],
        name: str = "row_number",
        limit: Optional[int] = None,
    ) -> "PlanBuilder":
        """Reference: core::RowNumberNode — row numbers per partition in
        arbitrary order, with an optional per-partition limit."""
        self.window(partition_keys, [], [f"row_number() as {name}"])
        if limit is not None:
            self.filter(f"{name} <= {limit}")
        return self

    def topn_row_number(
        self,
        partition_keys: Sequence[str],
        order_keys: Sequence[str],
        count: int,
        name: str = "row_number",
    ) -> "PlanBuilder":
        """Reference: core::TopNRowNumberNode — keep the top ``count`` rows of
        each partition by the given order."""
        self.window(partition_keys, order_keys, [f"row_number() as {name}"])
        return self.filter(f"{name} <= {count}")

    def mark_distinct(
        self, marker: str, keys: Sequence[str]
    ) -> "PlanBuilder":
        """Reference: core::MarkDistinctNode — boolean column that is True for
        the first occurrence of each distinct key combination."""
        tmp = f"_{marker}_rn"
        self.window(list(keys), [], [f"row_number() as {tmp}"])
        cols = [n for n in self.schema.names if n != tmp]
        return self.project(cols + [f"{tmp} = 1 as {marker}"])

    def enforce_single_row(self) -> "PlanBuilder":
        """Reference: core::EnforceSingleRowNode."""
        from .nodes import EnforceSingleRowNode

        self.node = EnforceSingleRowNode(self.node)
        return self

    def orderby(self, keys: Sequence[str]) -> "PlanBuilder":
        self.node = OrderByNode(self.node, self._sort_keys(keys))
        return self

    def topn(self, keys: Sequence[str], count: int) -> "PlanBuilder":
        self.node = TopNNode(self.node, self._sort_keys(keys), count)
        return self

    def limit(self, count: int, offset: int = 0) -> "PlanBuilder":
        self.node = LimitNode(self.node, offset, count)
        return self

    def hash_join(
        self,
        right: Union["PlanBuilder", PlanNode],
        left_keys: Sequence[str],
        right_keys: Sequence[str],
        output: Sequence[str],
        join_type: Union[str, JoinType] = JoinType.INNER,
        filter: Optional[str] = None,
    ) -> "PlanBuilder":
        right_node = right.node if isinstance(right, PlanBuilder) else right
        node = HashJoinNode(
            self.node,
            right_node,
            JoinType(join_type),
            tuple(left_keys),
            tuple(right_keys),
            tuple(output),
        )
        if filter:
            combined = RowType(
                list(self.schema.names) + list(right_node.output_schema.names),
                list(self.schema.types) + list(right_node.output_schema.types),
            )
            node.filter = parse_expr(filter, combined)
        self.node = node
        return self

    def build(self) -> PlanNode:
        return self.node
