"""Spark-semantic scalar functions.

Reference: velox/functions/sparksql/ (Register.cpp — 62 registrations;
Hash.cpp murmur3/xxhash64, Arithmetic.h pmod, DateTimeFunctions.h, legacy
size()).  Device-native where the math is lane-wise (hash, pmod, shifts,
date arithmetic); dictionary-rewrite binders for the string family, like the
Presto package.

Spark vs Presto semantic differences carried faithfully:
* ``pmod`` returns a non-negative remainder and NULL on zero divisor;
* ``size(NULL)`` is -1 (legacy spark.sql.legacy.sizeOfNull=true, the default
  the reference implements);
* ``hash``/``xxhash64`` are Spark's exact Murmur3_x86_32 / XXH64 with seed 42
  so shuffles can interoperate with Spark partitioning (Gluten's use case);
* ``date_add(date, n)`` / ``datediff(end, start)`` use Spark's argument
  shapes (the Presto package's date_add('unit', n, date) coexists — the
  registry disambiguates by signature).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ...dtypes import (
    BIGINT,
    BOOLEAN,
    DATE,
    DOUBLE,
    INTEGER,
    DataType,
    TypeKind,
)
from ...expr.registry import (
    ANY,
    DEFAULT_REGISTRY,
    INTEGER as INT_M,
    NUMERIC,
    STRINGY,
)

_reg = DEFAULT_REGISTRY
_DATE = DATE
_VARCHAR = DataType(TypeKind.VARCHAR)


# ---------------------------------------------------------------------------
# Spark Murmur3_x86_32 (reference: velox/functions/sparksql/Hash.cpp)

_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)


def _rotl32(x, r):
    return (x << r) | (x >> (32 - r))


def _mix_k1(k1):
    k1 = k1 * _C1
    k1 = _rotl32(k1, 15)
    return k1 * _C2


def _mix_h1(h1, k1):
    h1 = h1 ^ k1
    h1 = _rotl32(h1, 13)
    return h1 * jnp.uint32(5) + jnp.uint32(0xE6546B64)


def _fmix(h1, length):
    h1 = h1 ^ jnp.uint32(length)
    h1 = h1 ^ (h1 >> 16)
    h1 = h1 * jnp.uint32(0x85EBCA6B)
    h1 = h1 ^ (h1 >> 13)
    h1 = h1 * jnp.uint32(0xC2B2AE35)
    return h1 ^ (h1 >> 16)


def _murmur3_int(v32, seed):
    return _fmix(_mix_h1(seed, _mix_k1(v32)), 4)


def _murmur3_long(v64, seed):
    u = v64.astype(jnp.uint64)
    low = (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    high = (u >> 32).astype(jnp.uint32)
    h1 = _mix_h1(seed, _mix_k1(low))
    h1 = _mix_h1(h1, _mix_k1(high))
    return _fmix(h1, 8)


def _spark_hash_one(values, dtype: DataType, seed):
    kind = dtype.kind
    if kind in (TypeKind.INTEGER, TypeKind.DATE, TypeKind.SMALLINT, TypeKind.TINYINT):
        return _murmur3_int(values.astype(jnp.int32).view(jnp.uint32), seed)
    if kind == TypeKind.BOOLEAN:
        return _murmur3_int(values.astype(jnp.uint32), seed)
    if kind == TypeKind.REAL:
        return _murmur3_int(values.astype(jnp.float32).view(jnp.uint32), seed)
    if kind == TypeKind.DOUBLE:
        return _murmur3_long(values.astype(jnp.float64).view(jnp.int64), seed)
    # BIGINT / TIMESTAMP / short DECIMAL hash as long
    return _murmur3_long(values.astype(jnp.int64), seed)


def _spark_hash(ctx, result_dtype, arg_types, *packed):
    seed = jnp.uint32(42)
    h = jnp.full((ctx.capacity,), seed, jnp.uint32)
    for (values, validity), t in zip(packed, arg_types):
        nh = _spark_hash_one(values, t, h)
        h = nh if validity is None else jnp.where(validity, nh, h)
    return h.view(jnp.int32).astype(jnp.int32), None


# ---------------------------------------------------------------------------
# Spark XXH64 with seed 42 (reference: velox/functions/sparksql/Hash.cpp)

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_XXH_SEED = np.uint64(42)


def _rotl64(x, r):
    return (x << r) | (x >> (64 - r))


def _xxh64_long(v64, seed_u64):
    h = seed_u64 + _P5 + jnp.uint64(8)
    k1 = v64.astype(jnp.uint64) * _P2
    k1 = _rotl64(k1, 31)
    k1 = k1 * _P1
    h = h ^ k1
    h = _rotl64(h, 27) * _P1 + _P4
    h = h ^ (h >> 33)
    h = h * _P2
    h = h ^ (h >> 29)
    h = h * _P3
    return h ^ (h >> 32)


def _xxh64_int(v32, seed_u64):
    h = seed_u64 + _P5 + jnp.uint64(4)
    k = v32.astype(jnp.uint32).astype(jnp.uint64) * _P1
    h = h ^ _rotl64(k, 23) * _P2
    h = _rotl64(h, 23) * _P2 + _P3
    h = h ^ (h >> 33)
    h = h * _P2
    h = h ^ (h >> 29)
    h = h * _P3
    return h ^ (h >> 32)


def _spark_xxhash64(ctx, result_dtype, arg_types, *packed):
    h = jnp.full((ctx.capacity,), _XXH_SEED, jnp.uint64)
    for (values, validity), t in zip(packed, arg_types):
        kind = t.kind
        if kind in (
            TypeKind.INTEGER, TypeKind.DATE, TypeKind.SMALLINT, TypeKind.TINYINT
        ):
            nh = _xxh64_int(values.astype(jnp.int32).view(jnp.uint32), h)
        elif kind == TypeKind.BOOLEAN:
            nh = _xxh64_int(values.astype(jnp.uint32), h)
        elif kind == TypeKind.REAL:
            nh = _xxh64_int(values.astype(jnp.float32).view(jnp.uint32), h)
        elif kind == TypeKind.DOUBLE:
            nh = _xxh64_long(
                values.astype(jnp.float64).view(jnp.int64).astype(jnp.uint64), h
            )
        else:
            nh = _xxh64_long(values.astype(jnp.int64).astype(jnp.uint64), h)
        h = nh if validity is None else jnp.where(validity, nh, h)
    return h.view(jnp.int64), None


# ---------------------------------------------------------------------------
# arithmetic / conditional


def _pmod(ctx, result_dtype, arg_types, a, b):
    # ((a % b) + b) % b; NULL on zero divisor (Spark returns NULL, not error)
    av, avalid = a
    bv, bvalid = b
    zero = bv == 0
    safe = jnp.where(zero, jnp.ones_like(bv), bv)
    if jnp.issubdtype(av.dtype, jnp.integer):
        r = ((av % safe) + safe) % safe
    else:
        r = jnp.mod(jnp.mod(av, safe) + safe, safe)
    validity = ~zero
    if avalid is not None:
        validity = validity & avalid
    if bvalid is not None:
        validity = validity & bvalid
    return r, validity


def _nanvl(ctx, result_dtype, arg_types, a, b):
    av, avalid = a
    bv, bvalid = b
    take_b = jnp.isnan(av.astype(jnp.float64))
    values = jnp.where(take_b, bv, av)
    validity = None
    if avalid is not None or bvalid is not None:
        va = avalid if avalid is not None else jnp.ones_like(take_b)
        vb = bvalid if bvalid is not None else jnp.ones_like(take_b)
        validity = jnp.where(take_b, vb, va)
    return values, validity


def _nvl(ctx, result_dtype, arg_types, a, b):
    av, avalid = a
    bv, bvalid = b
    if avalid is None:
        return av, None
    values = jnp.where(avalid, av, bv)
    validity = avalid if bvalid is None else (avalid | bvalid)
    return values, validity


# ---------------------------------------------------------------------------
# date/time (Spark argument shapes)


def _date_add(ctx, result_dtype, arg_types, d, n):
    return (d.astype(jnp.int32) + n.astype(jnp.int32)).astype(jnp.int32)


def _date_sub(ctx, result_dtype, arg_types, d, n):
    return (d.astype(jnp.int32) - n.astype(jnp.int32)).astype(jnp.int32)


def _datediff(ctx, result_dtype, arg_types, end, start):
    return (end.astype(jnp.int64) - start.astype(jnp.int64)).astype(jnp.int32)


def _civil(days):
    """days-since-epoch -> (year, month, day) via the Howard Hinnant civil
    algorithm, branch-free (same derivation as the Presto date family)."""
    z = days.astype(jnp.int64) + 719468
    era = jnp.floor_divide(jnp.where(z >= 0, z, z - 146096), 146097)
    doe = z - era * 146097
    yoe = jnp.floor_divide(
        doe - jnp.floor_divide(doe, 1460) + jnp.floor_divide(doe, 36524)
        - jnp.floor_divide(doe, 146096),
        365,
    )
    y = yoe + era * 400
    doy = doe - (365 * yoe + jnp.floor_divide(yoe, 4) - jnp.floor_divide(yoe, 100))
    mp = jnp.floor_divide(5 * doy + 2, 153)
    d = doy - jnp.floor_divide(153 * mp + 2, 5) + 1
    m = jnp.where(mp < 10, mp + 3, mp - 9)
    y = jnp.where(m <= 2, y + 1, y)
    return y, m, d


def _days_from_civil(y, m, d):
    y = jnp.where(m <= 2, y - 1, y)
    era = jnp.floor_divide(jnp.where(y >= 0, y, y - 399), 400)
    yoe = y - era * 400
    mp = jnp.where(m > 2, m - 3, m + 9)
    doy = jnp.floor_divide(153 * mp + 2, 5) + d - 1
    doe = yoe * 365 + jnp.floor_divide(yoe, 4) - jnp.floor_divide(yoe, 100) + doy
    return era * 146097 + doe - 719468


def _days_in_month(y, m):
    leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
    lengths = jnp.asarray([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])
    base = jnp.take(lengths, (m - 1).astype(jnp.int32), mode="clip")
    return jnp.where((m == 2) & leap, 29, base)


def _add_months(ctx, result_dtype, arg_types, d, n):
    y, m, day = _civil(d)
    months = (y * 12 + (m - 1)) + n.astype(jnp.int64)
    ny = jnp.floor_divide(months, 12)
    nm = months - ny * 12 + 1
    nd = jnp.minimum(day, _days_in_month(ny, nm))
    return _days_from_civil(ny, nm, nd).astype(jnp.int32)


def _months_between(ctx, result_dtype, arg_types, a, b):
    ya, ma, da = _civil(a)
    yb, mb, db = _civil(b)
    whole = (ya * 12 + ma) - (yb * 12 + mb)
    last_a = da == _days_in_month(ya, ma)
    last_b = db == _days_in_month(yb, mb)
    both_last = last_a & last_b
    frac = (da - db).astype(jnp.float64) / 31.0
    out = whole.astype(jnp.float64) + jnp.where(both_last, 0.0, frac)
    return jnp.round(out, 8)


def _unix_timestamp(ctx, result_dtype, arg_types, ts):
    return jnp.floor_divide(ts.astype(jnp.int64), 1_000_000)


def _from_unixtime_ts(ctx, result_dtype, arg_types, secs):
    return secs.astype(jnp.int64) * 1_000_000


def _unix_date(ctx, result_dtype, arg_types, d):
    return d.astype(jnp.int32)


# ---------------------------------------------------------------------------
# math


def _f64(v, t: DataType):
    """Decimal-aware float64 view (unscaled int -> real value)."""
    out = v.astype(jnp.float64)
    if t.kind == TypeKind.DECIMAL and t.scale:
        out = out / (10.0 ** t.scale)
    return out


def _hypot(ctx, result_dtype, arg_types, a, b):
    return jnp.hypot(_f64(a, arg_types[0]), _f64(b, arg_types[1]))


def _log1p(ctx, result_dtype, arg_types, a):
    return jnp.log1p(_f64(a, arg_types[0]))


def _expm1(ctx, result_dtype, arg_types, a):
    return jnp.expm1(_f64(a, arg_types[0]))


def _rint(ctx, result_dtype, arg_types, a):
    return jnp.rint(_f64(a, arg_types[0]))


def _shift(dir_):
    def impl(ctx, result_dtype, arg_types, a, n):
        av = a.astype(jnp.int64) if arg_types[0].kind == TypeKind.BIGINT else a.astype(jnp.int32)
        bits = 64 if arg_types[0].kind == TypeKind.BIGINT else 32
        nn = n.astype(av.dtype) & (bits - 1)  # Spark masks the shift amount
        return (av << nn) if dir_ == "left" else (av >> nn)

    return impl


def register_all() -> None:
    """Idempotent registration into the default registry."""
    if getattr(register_all, "_done", False):
        return
    register_all._done = True

    def same(ts):
        return ts[0]

    _reg.register("pmod", [NUMERIC, NUMERIC], same, _pmod,
                  null_aware=True, coerce_common_numeric=True)
    _reg.register("nanvl", [NUMERIC, NUMERIC], same, _nanvl,
                  null_aware=True, coerce_common_numeric=True)
    for nm in ("nvl", "ifnull"):
        _reg.register(nm, [ANY, ANY], same, _nvl,
                      null_aware=True, coerce_common_numeric=True)
    _reg.register("hash", [ANY], INTEGER, _spark_hash,
                  null_aware=True, variadic=True)
    _reg.register("xxhash64", [ANY], BIGINT, _spark_xxhash64,
                  null_aware=True, variadic=True)
    _reg.register("shiftleft", [INT_M, INT_M], same, _shift("left"))
    _reg.register("shiftright", [INT_M, INT_M], same, _shift("right"))
    _reg.register("hypot", [NUMERIC, NUMERIC], DOUBLE, _hypot)
    _reg.register("log1p", [NUMERIC], DOUBLE, _log1p)
    _reg.register("expm1", [NUMERIC], DOUBLE, _expm1)
    _reg.register("rint", [NUMERIC], DOUBLE, _rint)

    _reg.register("date_add", [TypeKind.DATE, INT_M], _DATE, _date_add)
    _reg.register("date_sub", [TypeKind.DATE, INT_M], _DATE, _date_sub)
    _reg.register(
        "datediff", [TypeKind.DATE, TypeKind.DATE], INTEGER, (_datediff)
    )
    _reg.register("add_months", [TypeKind.DATE, INT_M], _DATE, (_add_months))
    _reg.register(
        "months_between",
        [TypeKind.DATE, TypeKind.DATE],
        DOUBLE,
        (_months_between),
    )
    _reg.register(
        "unix_timestamp", [TypeKind.TIMESTAMP], BIGINT, (_unix_timestamp)
    )
    _reg.register(
        "from_unixtime", [INT_M], DataType(TypeKind.TIMESTAMP),
        (_from_unixtime_ts),
    )
    _reg.register("unix_date", [TypeKind.DATE], INTEGER, (_unix_date))

    # string family: Spark-specific dictionary rewrites (binding.py)
    from ...expr import binding as _b

    _b._STRING_FN_BINDERS.update(
        {
            "ascii": _b._literal_args_fn(
                BIGINT, np.int64, lambda v, _ci: ord(v[0]) if v else -1
            ),
            "instr": _b._literal_args_fn(
                BIGINT, np.int64, lambda v, _ci, sub: v.find(sub) + 1
            ),
            "translate": _b._literal_args_fn(
                None,
                None,
                lambda v, _ci, src, dst: v.translate(
                    str.maketrans(src[: len(dst)], dst[: len(src)])
                ),
                makes_strings=True,
            ),
            "levenshtein": _b._literal_args_fn(
                BIGINT, np.int64, _levenshtein
            ),
            "soundex": _b._literal_args_fn(
                None, None, _soundex, makes_strings=True
            ),
            "crc32": _b._literal_args_fn(
                BIGINT,
                np.int64,
                lambda v, _ci: __import__("zlib").crc32(v.encode("utf-8")),
            ),
            "hash": _bind_string_hash("murmur3"),
            "xxhash64": _bind_string_hash("xxh64"),
        }
    )
    for nm, matchers, rt in (
        ("ascii", [STRINGY], BIGINT),
        ("instr", [STRINGY, STRINGY], BIGINT),
        ("translate", [STRINGY, STRINGY, STRINGY], _VARCHAR),
        ("levenshtein", [STRINGY, STRINGY], BIGINT),
        ("soundex", [STRINGY], _VARCHAR),
        ("crc32", [STRINGY], BIGINT),
    ):
        _reg.register(nm, matchers, rt, _unbound(nm))
    _reg.register("hash", [STRINGY], INTEGER, _unbound("hash"))
    _reg.register("xxhash64", [STRINGY], BIGINT, _unbound("xxhash64"))


def _unbound(name):
    def impl(*_a, **_k):  # pragma: no cover
        raise RuntimeError(
            f"{name}() on strings is rewritten at bind time; "
            "run it through a plan so dictionaries are available"
        )

    return impl


def _levenshtein(a, _ci, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


_SOUNDEX = {
    **dict.fromkeys("BFPV", "1"),
    **dict.fromkeys("CGJKQSXZ", "2"),
    **dict.fromkeys("DT", "3"),
    "L": "4",
    **dict.fromkeys("MN", "5"),
    "R": "6",
}


def _soundex(v, _ci):
    if not v or not v[0].isalpha():
        return v
    up = v.upper()
    out = [up[0]]
    prev = _SOUNDEX.get(up[0], "")
    for ch in up[1:]:
        code = _SOUNDEX.get(ch, "")
        if code and code != prev:
            out.append(code)
        if ch not in "HW":
            prev = code
    return ("".join(out) + "000")[:4]


def _murmur3_bytes_py(data: bytes, seed: int) -> int:
    """Spark Murmur3_x86_32 over bytes (python, host per-dictionary-entry)."""

    def mixk1(k1):
        k1 = (k1 * 0xCC9E2D51) & 0xFFFFFFFF
        k1 = ((k1 << 15) | (k1 >> 17)) & 0xFFFFFFFF
        return (k1 * 0x1B873593) & 0xFFFFFFFF

    def mixh1(h1, k1):
        h1 ^= k1
        h1 = ((h1 << 13) | (h1 >> 19)) & 0xFFFFFFFF
        return (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF

    h1 = seed & 0xFFFFFFFF
    # Spark hashes bytes one at a time as SIGNED ints (hashUnsafeBytes2 uses
    # 4-byte blocks; UTF8 strings go through hashUnsafeBytes which is
    # block-wise).  Use the 4-byte-block + tail-byte scheme.
    n = len(data)
    for i in range(0, n - n % 4, 4):
        k1 = int.from_bytes(data[i : i + 4], "little")
        h1 = mixh1(h1, mixk1(k1))
    for i in range(n - n % 4, n):
        b = data[i]
        if b >= 128:
            b -= 256
        h1 = mixh1(h1, mixk1(b & 0xFFFFFFFF))
    h1 ^= n
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    if h1 >= 1 << 31:
        h1 -= 1 << 32
    return h1


def _xxh64_bytes_py(data: bytes, seed: int) -> int:
    """XXH64 over bytes (python, host per-dictionary-entry)."""
    P1 = 0x9E3779B185EBCA87
    P2 = 0xC2B2AE3D27D4EB4F
    P3 = 0x165667B19E3779F9
    P4 = 0x85EBCA77C2B2AE63
    P5 = 0x27D4EB2F165667C5
    M = 0xFFFFFFFFFFFFFFFF

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & M

    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i + 32 <= n:
            for vi in range(4):
                lane = int.from_bytes(data[i : i + 8], "little")
                if vi == 0:
                    v1 = (rotl((v1 + lane * P2) & M, 31) * P1) & M
                elif vi == 1:
                    v2 = (rotl((v2 + lane * P2) & M, 31) * P1) & M
                elif vi == 2:
                    v3 = (rotl((v3 + lane * P2) & M, 31) * P1) & M
                else:
                    v4 = (rotl((v4 + lane * P2) & M, 31) * P1) & M
                i += 8
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h = ((h ^ ((rotl((v * P2) & M, 31) * P1) & M)) * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        lane = int.from_bytes(data[i : i + 8], "little")
        h = ((rotl(h ^ ((rotl((lane * P2) & M, 31) * P1) & M), 27) * P1) + P4) & M
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i : i + 4], "little")
        h = ((rotl(h ^ ((lane * P1) & M), 23) * P2) + P3) & M
        i += 4
    while i < n:
        h = (rotl(h ^ (data[i] * P5) & M, 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    if h >= 1 << 63:
        h -= 1 << 64
    return h


def _bind_string_hash(which):
    from ...expr import binding as _b

    if which == "murmur3":
        return _b._literal_args_fn(
            INTEGER,
            np.int32,
            lambda v, _ci: _murmur3_bytes_py(v.encode("utf-8"), 42),
        )
    return _b._literal_args_fn(
        BIGINT,
        np.int64,
        lambda v, _ci: _xxh64_bytes_py(v.encode("utf-8"), 42),
    )
