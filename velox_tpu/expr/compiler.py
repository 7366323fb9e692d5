"""Expression evaluation: IR -> jnp computation over a Batch.

Reference: velox/expression/Expr.cpp (Expr::eval at :780, ExprSet at Expr.h:632,
compileExpressions at ExprCompiler.h:28).

The reference interprets an Expr tree per batch with hand-built fast paths
(flat-no-nulls, dictionary peeling/memoization, shared-subexpr caching).  Here the
tree is walked **once at trace time**; XLA gets one fused program per pipeline, so
the runtime fast paths become compile-time properties:

* flat-no-nulls  -> validity stays ``None`` and no mask ops are emitted at all;
* CSE            -> trace-time cache keyed on Expr.key() (Expr.cpp:854 analog);
* encoding peel  -> dictionary columns decode via gather which XLA fuses; an
                    explicit eval-on-base optimization for expensive fns is in
                    velox_tpu.ops (later);
* TRY / errors   -> an explicit bool error lane per expression
                    (EvalCtx error-vector analog, velox/expression/EvalCtx.h:37).

Null discipline is Presto's: default-null for plain calls, Kleene logic for
AND/OR, lazy-branch semantics for IF/SWITCH via masking.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..dtypes import DataType, TypeKind
from ..vector.column import Batch, Column
from .ir import Call, Constant, DictLookup, Expr, FieldAccess, Special, SpecialForm
from .registry import DEFAULT_REGISTRY, FunctionRegistry


@dataclasses.dataclass
class EvalResult:
    """values[capacity], optional validity (True=non-null), optional error lane.

    ``strings``: dictionary of a VARCHAR result whose table was created at
    trace time (e.g. element_at over split()'s parts pool) — the static
    provenance walk (_strings_of) cannot see those."""

    values: jax.Array
    validity: Optional[jax.Array] = None
    errors: Optional[jax.Array] = None
    strings: Optional[object] = None

    def validity_or_true(self, capacity: int) -> jax.Array:
        if self.validity is None:
            return jnp.ones((capacity,), dtype=jnp.bool_)
        return self.validity


def _and_masks(a: Optional[jax.Array], b: Optional[jax.Array]) -> Optional[jax.Array]:
    if a is None:
        return b
    if b is None:
        return a
    return a & b


def _or_masks(a: Optional[jax.Array], b: Optional[jax.Array]) -> Optional[jax.Array]:
    if a is None:
        return b
    if b is None:
        return a
    return a | b


class EvalContext:
    """Per-batch trace context: input columns, capacity, CSE cache."""

    def __init__(self, batch: Batch, registry: FunctionRegistry = None):
        self.batch = batch
        self.capacity = batch.capacity
        self.registry = registry or DEFAULT_REGISTRY
        self._cse: Dict[str, EvalResult] = {}

    def evaluate(self, expr: Expr) -> EvalResult:
        key = expr.key()
        hit = self._cse.get(key)
        if hit is not None:
            return hit
        result = self._evaluate(expr)
        self._cse[key] = result
        return result

    # ------------------------------------------------------------------
    def _evaluate(self, expr: Expr) -> EvalResult:
        if isinstance(expr, FieldAccess):
            col = self.batch.column(expr.name)
            if expr.dtype.kind == TypeKind.ROW:
                from .seg import StructValue

                return EvalResult(StructValue.from_column(col), col.validity)
            if expr.dtype.is_complex:
                from .seg import SegValue

                return EvalResult(SegValue.from_column(col), col.validity)
            values, validity = col.decode(self.capacity)
            return EvalResult(values, validity)
        if isinstance(expr, Constant):
            return self._constant(expr)
        if isinstance(expr, Call):
            return self._call(expr)
        if isinstance(expr, Special):
            return self._special(expr)
        if isinstance(expr, DictLookup):
            child = self.evaluate(expr.child)
            lookup = jnp.asarray(expr.values.array)
            idx = child.values.astype(jnp.int32)
            validity, errors = child.validity, child.errors
            if expr.child2 is not None:
                c2 = self.evaluate(expr.child2)
                idx = idx * expr.width + c2.values.astype(jnp.int32)
                validity = _and_masks(validity, c2.validity)
                errors = _or_masks(errors, c2.errors)
            out = jnp.take(lookup, idx, mode="clip")
            return EvalResult(out, validity, errors)
        raise TypeError(f"cannot evaluate {type(expr).__name__}")

    def _constant(self, expr: Constant) -> EvalResult:
        dtype = expr.dtype
        if expr.value is None:
            values = jnp.zeros((self.capacity,), dtype=dtype.device_dtype)
            return EvalResult(values, jnp.zeros((self.capacity,), dtype=jnp.bool_))
        value = expr.value
        # DECIMAL constants carry their *unscaled* int64 value.
        scalar = jnp.asarray(value, dtype=dtype.device_dtype)
        values = jnp.broadcast_to(scalar, (self.capacity,))
        return EvalResult(values, None)

    def _call(self, expr: Call) -> EvalResult:
        from ..functions.presto.complex import COMPLEX_FNS, is_complex_call

        if is_complex_call(expr.name, expr.args):
            result = COMPLEX_FNS[expr.name](self, expr)
            return self._surface_pool_overflow(expr, result)
        arg_results = [self.evaluate(a) for a in expr.args]
        arg_types = [a.dtype for a in expr.args]
        sig, _, _ = self.registry.resolve(expr.name, arg_types)
        errors: Optional[jax.Array] = None
        for r in arg_results:
            errors = _or_masks(errors, r.errors)
        if sig.null_aware:
            packed = [(r.values, r.validity) for r in arg_results]
            out = sig.impl(self, expr.dtype, arg_types, *packed)
            values, validity = out[0], out[1]
            fn_errors = out[2] if len(out) > 2 else None
        else:
            out = sig.impl(self, expr.dtype, arg_types, *[r.values for r in arg_results])
            if isinstance(out, tuple):
                values, fn_errors = out
            else:
                values, fn_errors = out, None
            validity = None
            for r in arg_results:
                validity = _and_masks(validity, r.validity)
        # A row that is NULL cannot raise (reference: default-null rows are
        # skipped before the function body runs).
        if fn_errors is not None and validity is not None:
            fn_errors = fn_errors & validity
        errors = _or_masks(errors, fn_errors)
        return EvalResult(values, validity, errors)

    def _surface_pool_overflow(self, expr: Call, result: EvalResult) -> EvalResult:
        """If a complex function normalized an argument whose duplicated spans
        exceeded its static element pool, the result is truncated — surface it
        as a row error (ops/segpool.normalize sets the flag).  The CSE cache
        holds the argument results, including their memoized normalization."""
        from .seg import SegValue

        errors = result.errors
        for a in expr.args:
            r = self._cse.get(a.key())
            if (
                r is not None
                and isinstance(r.values, SegValue)
                and r.values._norm_cache is not None
                and r.values._norm_cache.overflow is not None
            ):
                o = jnp.broadcast_to(
                    r.values._norm_cache.overflow, (self.capacity,)
                )
                errors = _or_masks(errors, o)
        result.errors = errors
        return result

    # ---- special forms ------------------------------------------------
    def _special(self, expr: Special) -> EvalResult:
        form = expr.form
        if form == SpecialForm.AND:
            return self._conjunct(expr.args, is_and=True)
        if form == SpecialForm.OR:
            return self._conjunct(expr.args, is_and=False)
        if form == SpecialForm.IF:
            return self._if(expr)
        if form == SpecialForm.SWITCH:
            return self._switch(expr)
        if form == SpecialForm.COALESCE:
            return self._coalesce(expr)
        if form == SpecialForm.TRY:
            r = self.evaluate(expr.args[0])
            if r.errors is None:
                return r
            validity = r.validity_or_true(self.capacity) & ~r.errors
            return EvalResult(r.values, validity, None)
        if form in (SpecialForm.CAST, SpecialForm.TRY_CAST):
            return self._cast(expr)
        if form == SpecialForm.IN:
            return self._in(expr)
        raise ValueError(f"unknown special form {form}")

    def _conjunct(self, args: Sequence[Expr], is_and: bool) -> EvalResult:
        """Kleene AND/OR (reference: velox/expression/ConjunctExpr.h).

        AND: FALSE dominates; NULL if no FALSE but some NULL.
        OR:  TRUE dominates; NULL if no TRUE but some NULL.
        Errors on rows already decided by another conjunct are suppressed, which
        matches the reference's relaxed evaluation-order semantics.
        """
        results = [self.evaluate(a) for a in args]
        cap = self.capacity
        value = None
        known = None  # rows where the result is already decided
        validity = None
        errors = None
        for r in results:
            v = r.values.astype(jnp.bool_)
            val = r.validity_or_true(cap)
            if r.errors is not None:
                val = val & ~r.errors
            dominated = (v if not is_and else ~v) & val  # decides the row
            value = dominated if value is None else (value | dominated)
            known = dominated if known is None else (known | dominated)
            validity = val if validity is None else (validity & val)
            errors = _or_masks(errors, r.errors)
        # value currently holds "some conjunct decided the row".
        decided_value = jnp.logical_not(value) if is_and else value
        final_validity = known | validity  # decided rows are non-null
        if errors is not None:
            errors = errors & ~known  # a decided row swallows errors
        # Undecided, all-valid rows: AND->TRUE, OR->FALSE.
        out = jnp.where(known, decided_value, jnp.bool_(is_and))
        return EvalResult(out, final_validity, errors)

    def _if(self, expr: Special) -> EvalResult:
        cond, then_e, else_e = expr.args
        c = self.evaluate(cond)
        t = self.evaluate(then_e)
        f = self.evaluate(else_e)
        cap = self.capacity
        take_then = c.values.astype(jnp.bool_) & c.validity_or_true(cap)
        values = jnp.where(take_then, t.values, f.values)
        validity = jnp.where(
            take_then, t.validity_or_true(cap), f.validity_or_true(cap)
        )
        errors = _or_masks(
            None if c.errors is None else c.errors,
            _or_masks(
                None if t.errors is None else (t.errors & take_then),
                None if f.errors is None else (f.errors & ~take_then),
            ),
        )
        return EvalResult(values, validity, errors)

    def _switch(self, expr: Special) -> EvalResult:
        """args = [cond1, val1, cond2, val2, ..., else?]."""
        args = list(expr.args)
        has_else = len(args) % 2 == 1
        else_e = args.pop() if has_else else None
        pairs = list(zip(args[0::2], args[1::2]))
        cap = self.capacity
        if else_e is not None:
            acc = self.evaluate(else_e)
            acc_validity = acc.validity_or_true(cap)
        else:
            acc = EvalResult(
                jnp.zeros((cap,), dtype=expr.dtype.device_dtype),
                jnp.zeros((cap,), dtype=jnp.bool_),
            )
            acc_validity = acc.validity_or_true(cap)
        values, validity, errors = acc.values, acc_validity, acc.errors
        taken = jnp.zeros((cap,), dtype=jnp.bool_)
        for cond_e, val_e in pairs:
            c = self.evaluate(cond_e)
            v = self.evaluate(val_e)
            take = (
                c.values.astype(jnp.bool_) & c.validity_or_true(cap) & ~taken
            )
            values = jnp.where(take, v.values, values)
            validity = jnp.where(take, v.validity_or_true(cap), validity)
            if v.errors is not None:
                errors = _or_masks(errors, v.errors & take)
            if c.errors is not None:
                errors = _or_masks(errors, c.errors & ~taken)
            taken = taken | take
        return EvalResult(values, validity, errors)

    def _coalesce(self, expr: Special) -> EvalResult:
        cap = self.capacity
        results = [self.evaluate(a) for a in expr.args]
        values = results[-1].values
        validity = results[-1].validity_or_true(cap)
        errors = results[-1].errors
        for r in reversed(results[:-1]):
            valid = r.validity_or_true(cap)
            values = jnp.where(valid, r.values, values)
            validity = valid | validity
            errors = _or_masks(errors, r.errors)
        return EvalResult(values, validity, errors)

    def _in(self, expr: Special) -> EvalResult:
        value = self.evaluate(expr.args[0])
        hit = jnp.zeros((self.capacity,), dtype=jnp.bool_)
        for opt in expr.args[1:]:
            r = self.evaluate(opt)
            hit = hit | (value.values == r.values)
        return EvalResult(hit, value.validity, value.errors)

    def _cast(self, expr: Special) -> EvalResult:
        child = self.evaluate(expr.args[0])
        from_t = expr.args[0].dtype
        to_t = expr.dtype
        values, errors = cast_values(child.values, from_t, to_t)
        validity = child.validity
        errors = _or_masks(child.errors, errors)
        if errors is not None and validity is not None:
            errors = errors & validity
        if expr.form == SpecialForm.TRY_CAST and errors is not None:
            validity = child.validity_or_true(self.capacity) & ~errors
            errors = None
        return EvalResult(values, validity, errors)


# ---- CAST matrix ---------------------------------------------------------


def _scale_factor(n: int) -> int:
    return 10 ** n


def cast_values(
    values: jax.Array, from_t: DataType, to_t: DataType
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Device cast matrix (reference: velox/expression/CastExpr.cpp,
    velox/type/Conversions.h).  Returns (values, error_mask|None)."""
    if from_t.kind == to_t.kind and from_t == to_t:
        return values, None
    fk, tk = from_t.kind, to_t.kind
    out_dtype = to_t.device_dtype

    if fk == TypeKind.DECIMAL and tk == TypeKind.DECIMAL:
        ds = to_t.scale - from_t.scale
        if ds == 0:
            return values.astype(out_dtype), None
        if ds > 0:
            return values * _scale_factor(ds), None
        return _decimal_rescale_down(values, -ds), None

    if fk == TypeKind.DECIMAL:
        if to_t.is_floating:
            return values.astype(out_dtype) / _scale_factor(from_t.scale), None
        if to_t.is_integer:
            return _decimal_rescale_down(values, from_t.scale).astype(out_dtype), None
        if tk == TypeKind.BOOLEAN:
            return (values != 0), None

    if tk == TypeKind.DECIMAL:
        factor = _scale_factor(to_t.scale)
        if from_t.is_integer or fk == TypeKind.BOOLEAN:
            return values.astype(jnp.int64) * factor, None
        if from_t.is_floating:
            scaled = jnp.rint(values.astype(jnp.float64) * factor)
            return scaled.astype(jnp.int64), None

    if from_t.is_floating and to_t.is_integer:
        # Presto rounds to nearest on float->integer cast.
        rounded = jnp.rint(values)
        info = jnp.iinfo(out_dtype)
        errors = (
            jnp.isnan(values)
            | (rounded < float(info.min))
            | (rounded > float(info.max))
        )
        return jnp.nan_to_num(rounded).astype(out_dtype), errors

    if (from_t.is_numeric or fk == TypeKind.BOOLEAN) and (
        to_t.is_numeric or tk == TypeKind.BOOLEAN
    ):
        return values.astype(out_dtype), None

    if fk == TypeKind.DATE and tk == TypeKind.TIMESTAMP:
        return values.astype(jnp.int64) * 86_400_000_000, None
    if fk == TypeKind.TIMESTAMP and tk == TypeKind.DATE:
        return jnp.floor_divide(values, 86_400_000_000).astype(jnp.int32), None

    raise TypeError(f"unsupported cast {from_t} -> {to_t}")


def _decimal_rescale_down(values: jax.Array, digits: int) -> jax.Array:
    """Divide by 10**digits rounding half away from zero (Presto decimal rule)."""
    factor = _scale_factor(digits)
    half = factor // 2
    sign = jnp.sign(values)
    return sign * ((jnp.abs(values) + half) // factor)


# ---- ExprSet -------------------------------------------------------------


class ExprSet:
    """A set of expressions evaluated together over one input schema.

    Reference: velox/expression/Expr.h:632 (ExprSet) — shared-subexpression state
    here is the per-batch CSE cache in EvalContext.
    """

    def __init__(self, exprs: Sequence[Expr], registry: FunctionRegistry = None):
        self.exprs = list(exprs)
        self.registry = registry or DEFAULT_REGISTRY

    def eval(self, batch: Batch) -> List[EvalResult]:
        ctx = EvalContext(batch, self.registry)
        return [ctx.evaluate(e) for e in self.exprs]

    def eval_to_columns(self, batch: Batch) -> Tuple[List[Column], Optional[jax.Array]]:
        """Evaluate and wrap as Columns; returns (columns, combined error mask)."""
        results = self.eval(batch)
        errors = None
        cols = []
        for e, r in zip(self.exprs, results):
            errors = _or_masks(errors, r.errors)
            if e.dtype.is_complex:
                cols.append(r.values.to_column(r.validity))
                continue
            strings = r.strings or _strings_of(e, batch)
            cols.append(Column.flat(r.values, e.dtype, r.validity, strings))
        return cols, errors


def _strings_of(expr: Expr, batch: Batch):
    """Propagate the StringTable for expressions that return input strings as-is."""
    if not expr.dtype.is_string:
        return None
    if isinstance(expr, DictLookup):
        return expr.strings
    if isinstance(expr, FieldAccess):
        return batch.column(expr.name).strings
    for child in expr.children:
        t = _child_string_table(child, batch)
        if t is not None:
            return t
    return None


def _child_string_table(expr: Expr, batch: Batch):
    if expr.dtype.is_string:
        return _strings_of(expr, batch)
    if expr.dtype.is_complex and isinstance(expr, FieldAccess):
        # element_at / subscript on ARRAY(VARCHAR) / MAP(.., VARCHAR): the
        # string dictionary lives on the complex column's child pool
        col = batch.column(expr.name)
        for ch in reversed(col.children):  # MAP: prefer the value child
            if ch.strings is not None:
                return ch.strings
    return None
