"""Dev tool: count lax.sort ops (and their operand widths) in the compiled
programs of a TPC-H query — the sort budget that dominates Q3-class plans."""
import os
import re
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["VELOX_TPU_XLA_CACHE"] = "off"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")

from velox_tpu.connectors.tpch import plans as tp  # noqa: E402
from velox_tpu.exec.runner import LocalExecutor  # noqa: E402


def count_sorts(label, jitted, *args, **kw):
    txt = jitted.lower(*args, **kw).as_text()
    # stablehlo custom sorts appear as "sort"(...) with N operands
    ops = []
    for m in re.finditer(r'"stablehlo\.sort"\(([^)]*)\)', txt):
        ops.append(m.group(1).count(",") + 1)
    if not ops:
        for m in re.finditer(r"stablehlo\.sort\(([^)]*)\)", txt):
            ops.append(m.group(1).count(",") + 1)
    if not ops:
        # mhlo / hlo text fallback
        ops = [m.count(",") + 1 for m in re.findall(r" sort\(([^)]*)\)", txt)]
    print(f"{label}: {len(ops)} sorts, operand counts {ops}")
    return ops


def main(num=3, sf=0.1):
    t0 = time.perf_counter()
    tables = tp.load_query_tables(num, sf)
    plan = tp.build_query(num, tables)
    ex = LocalExecutor(plan, tile_rows=1 << 20)
    print(f"build {time.perf_counter()-t0:.1f}s kind={ex.kind}")
    tile = ex.source_table.tile(0, ex.capacity)
    if ex.kind == "sort_agg_device":
        if hasattr(ex, "_sort_tile_partial_jit"):
            f = ex._sort_tile_partial_jit
            if callable(f) and not hasattr(f, "lower"):
                # join path: two inner jits
                import velox_tpu.exec.runner as R  # noqa: F401

                steps_jit = jax.jit(
                    lambda b: __import__("velox_tpu.exec.runner", fromlist=["x"])
                    ._apply_steps(b, steps=tuple(ex.lin.steps))
                )
                from velox_tpu.exec.runner import apply_streaming

                steps_jit = jax.jit(lambda b: apply_streaming(b, ex.lin.steps))
                ops1 = count_sorts("steps(joins)", steps_jit, tile)
                b2, err = steps_jit(tile)
                part_jit = jax.jit(lambda b: ex.agg_exec.tile_partial(b))
                ops2 = count_sorts("tile_partial(grouping)", part_jit, b2)
                part = part_jit(b2)
                carry = ex.agg_exec.init_sorted_carry()
                merge_jit = jax.jit(ex.agg_exec.merge_partial_into_carry)
                count_sorts("merge_carry", merge_jit, carry, part)
            else:
                count_sorts("sort_tile_partial", f, tile)
        if ex._device_topn_jit is not None:
            pass
    elif ex.kind == "collect":
        count_sorts("tile_out", ex._tile_out, tile)


if __name__ == "__main__":
    num = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1
    main(num, sf)
