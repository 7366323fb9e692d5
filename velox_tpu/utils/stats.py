"""Plan/operator statistics and plan printing.

Reference: velox/exec/TaskStats.h:30 (TaskStats/PipelineStats/OperatorStats),
velox/exec/PlanNodeStats.h:38,145 (toPlanStats + printPlanWithStats) and the
runtime counters surfaced per operator (velox/exec/Operator.h:83).

In a fused XLA program individual operators cannot be timed without breaking
fusion, so the contract shifts: per-*pipeline* wall/device times and per-run
row counters are always collected (exec.runner.RunStats); an optional
instrumented mode (stats_level="operator") re-runs each step as its own jit to
attribute rows and time per operator — the analog of the reference's
per-operator timers, at the reference's cost (no fusion).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

from ..plan.nodes import PlanNode


@dataclasses.dataclass
class OperatorStats:
    """Reference: exec::OperatorStats (subset that is meaningful under XLA)."""

    plan_node_id: str
    operator_type: str
    input_rows: int = 0
    output_rows: int = 0
    wall_seconds: float = 0.0


@dataclasses.dataclass
class PlanStats:
    operators: List[OperatorStats] = dataclasses.field(default_factory=list)

    def by_node(self) -> Dict[str, OperatorStats]:
        return {o.plan_node_id: o for o in self.operators}


def print_plan(node: PlanNode, stats: Optional[PlanStats] = None, indent: int = 0) -> str:
    """Reference: printPlanWithStats (velox/exec/PlanNodeStats.h:145)."""
    pad = "  " * indent
    line = f"{pad}- {node.name}[{node.id}] -> {node.output_schema}"
    if stats is not None:
        s = stats.by_node().get(node.id)
        if s is not None:
            line += (
                f"   [in: {s.input_rows:,} rows, out: {s.output_rows:,} rows, "
                f"{s.wall_seconds*1e3:.1f} ms]"
            )
    lines = [line]
    for src in node.sources:
        lines.append(print_plan(src, stats, indent + 1))
    return "\n".join(lines)


def collect_operator_stats(root: PlanNode, tile_rows: int = 1 << 20) -> PlanStats:
    """Instrumented execution: run each pipeline prefix separately to attribute
    rows per operator (breaks fusion; debugging only)."""
    import numpy as np

    from ..exec.runner import LocalExecutor, _linearize

    lin = _linearize(root)
    stats = PlanStats()

    # row counts per step by executing growing prefixes
    from ..plan.nodes import FilterNode, ProjectNode, TableScanNode

    chain: List[PlanNode] = []
    node = root
    while True:
        chain.append(node)
        if not node.sources:
            break
        node = node.sources[0]
    chain.reverse()

    prev_rows = 0
    for n in chain:
        t0 = time.perf_counter()
        try:
            out = LocalExecutor(n, tile_rows).run()
            rows = out.num_rows
        except NotImplementedError:
            rows = -1
        wall = time.perf_counter() - t0
        stats.operators.append(
            OperatorStats(n.id, n.name, prev_rows, rows, wall)
        )
        prev_rows = rows
    return stats
