"""The monoid algebra: identity element + associative binary combine.

Mirror of the reference's ``MonoidOp`` trait (``src/monoid.rs:23-32``) and
the 4-ops x primitive-types macro block (``src/monoid.rs:52-221``), expressed
three ways so every execution form agrees:

* ``combine(a, b) -> Column``   — for ``F.aggregate`` / ``F.zip_with``
  expression folds (pure Catalyst, whole-stage codegen).
* ``agg(col) -> Column``        — a built-in partial-aggregation-capable
  aggregate for the posexplode two-phase form (SURVEY.md §2.1a).
* ``np_combine(a, b) -> ndarray`` — for the pandas-UDAF oracle form.

Semantics decisions (documented deviations, see SURVEY.md §2.1 / §7):

* **Saturating integer arithmetic** (reference ``src/monoid.rs:85-138``):
  Spark ints wrap (ANSI off), so integer sum/product are computed in a
  wider type and clamped to the element type's range.  **Integer SUM is
  exact-then-clamp in ALL THREE forms** (the expression form folds in
  DECIMAL(38,0) via ``wide_combine`` and clamps once in ``finish``; the
  NumPy form folds exact Python ints and clamps once in ``np_finish``;
  the posexplode form sums in DECIMAL(38,0)) — deterministic and
  consistent, unlike the reference's per-pair saturation which is
  order-dependent for mixed-sign overflow.  **Integer PRODUCT** uses
  per-pair saturation in the expression/NumPy forms (the accumulator must
  stay bounded; an exact wide fold can exceed DECIMAL(38,0) after just
  three int64 factors) and sign/zero/log-magnitude decomposition in the
  posexplode form — EXACT at all magnitudes: 8..32-bit carriers are
  double-mantissa-exact in range, and 64-bit carriers route the
  (2^52.5, 2^(bits+0.5)] band through a bounded DECIMAL(38,0) second
  pass (array_reduce.py:_exact_product_per_pos).  Known cross-form divergence, by construction: once a
  product overflows, a later factor of magnitude <= 1 distinguishes the
  schemes (per-pair: ``sat(2^62 * 2) * -1 = -(2^63-1)``; exact-then-
  clamp: ``clamp(-2^63) = -2^63``).  All forms agree whenever no
  intermediate product leaves the element range — which covers every
  asserted reference output.
* **Unsigned types**: Spark has none.  ``uint8/16/32`` map to the next
  wider signed type; ``uint64`` maps to ``DECIMAL(20,0)`` clamped to
  ``[0, 2^64-1]``.
* **Float identities** follow the reference exactly: max -> -inf,
  min -> +inf (``src/monoid.rs:173-180, 205-212``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Element types.  Spark-representable mirror of the reference's 10 primitive
# types (src/monoid.rs:34-37).  Unsigned types map to wider signed types
# (documented deviation, SURVEY.md §7).
# ---------------------------------------------------------------------------

INT_BOUNDS: dict[str, tuple[int, int]] = {
    "tinyint": (-(2**7), 2**7 - 1),
    "smallint": (-(2**15), 2**15 - 1),
    "int": (-(2**31), 2**31 - 1),
    "bigint": (-(2**63), 2**63 - 1),
    # unsigned range emulation on the wider signed carrier
    "uint8": (0, 2**8 - 1),
    "uint16": (0, 2**16 - 1),
    "uint32": (0, 2**32 - 1),
    "uint64": (0, 2**64 - 1),
}

#: type-name -> (Spark carrier type, is_float)
ELEMENT_TYPES: dict[str, T.DataType] = {
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    # unsigned carriers (deviation: Spark has no unsigned ints)
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.DecimalType(20, 0),
}

_FLOAT_TYPES = {"float", "double"}

# wide type used for exact integer arithmetic before clamping
_WIDE_DECIMAL = "decimal(38,0)"


def _is_float(elem: str) -> bool:
    return elem in _FLOAT_TYPES


def _clamp(col: Column, lo: int, hi: int) -> Column:
    # bounds as string literals: F.lit() rejects ints beyond int64 (u64 max)
    return F.least(F.greatest(col, F.lit(str(lo)).cast(_WIDE_DECIMAL)),
                   F.lit(str(hi)).cast(_WIDE_DECIMAL))


def _sat_int_binop(op: Callable[[Column, Column], Column], elem: str
                   ) -> Callable[[Column, Column], Column]:
    """Saturating integer binop: compute in DECIMAL(38,0), clamp, cast back.

    DECIMAL(38,0) holds any sum / product of two int64 values exactly
    (|a*b| <= 2^126 does NOT fit -- but inputs are always in the element
    type's range after the previous clamp, so |a*b| <= (2^63)^2 ~ 8.5e37
    < 1e38, which fits).
    """
    lo, hi = INT_BOUNDS[elem]
    carrier = ELEMENT_TYPES[elem].simpleString()

    def combine(a: Column, b: Column) -> Column:
        wide = op(a.cast(_WIDE_DECIMAL), b.cast(_WIDE_DECIMAL))
        return _clamp(wide, lo, hi).cast(carrier)

    return combine


# ---------------------------------------------------------------------------
# Monoid
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Monoid:
    """identity + associative combine, in all three execution dialects.

    Mirror of ``MonoidOp`` (reference ``src/monoid.rs:23-32``).
    """

    op: str                       # "sum" | "product" | "max" | "min"
    elem: str                     # key into ELEMENT_TYPES
    identity: float | int        # python literal identity element
    combine: Callable[[Column, Column], Column] = field(repr=False)
    #: built-in aggregate over an exploded element column, already
    #: saturation-corrected; None => no single built-in exists (never the
    #: case for our four ops).
    agg: Callable[[Column], Column] = field(repr=False)
    np_combine: Callable[[np.ndarray, np.ndarray], np.ndarray] = field(repr=False)
    #: expression-form wide fold (exact-then-clamp): when ``acc_cast`` is
    #: set, the ``F.aggregate`` fold accumulates in that type using
    #: ``wide_combine`` (no per-pair clamp) and ``finish`` maps each final
    #: accumulator element back to the carrier type (clamp + cast).
    acc_cast: str | None = None
    wide_combine: Callable[[Column, Column], Column] | None = field(
        default=None, repr=False)
    finish: Callable[[Column], Column] | None = field(default=None, repr=False)
    #: NumPy-form one-shot finalizer (clamp once after an exact fold)
    np_finish: Callable[[np.ndarray], np.ndarray] | None = field(
        default=None, repr=False)

    @property
    def name(self) -> str:
        return f"array_reduce_{self.op}"

    @property
    def spark_type(self) -> T.DataType:
        return ELEMENT_TYPES[self.elem]

    def identity_lit(self) -> Column:
        v = self.identity
        if isinstance(v, int) and not (-(2**63) <= v < 2**63):
            return F.lit(str(v)).cast(self.spark_type)  # u64 identities
        return F.lit(v).cast(self.spark_type)


def _make_finish(lo: int, hi: int, carrier: str) -> Callable[[Column], Column]:
    """One-arg clamp+cast closure safe for use as an HOF lambda."""
    def finish(c: Column) -> Column:
        return _clamp(c, lo, hi).cast(carrier)
    return finish


def _np_clamp(arr: np.ndarray, elem: str) -> np.ndarray:
    lo, hi = INT_BOUNDS[elem]
    return np.clip(arr, lo, hi)


def _build(op: str, elem: str) -> Monoid:
    is_f = _is_float(elem)
    carrier = ELEMENT_TYPES[elem].simpleString()
    lo_hi = INT_BOUNDS.get(elem)
    acc_cast = None
    wide_combine = None
    finish = None
    np_finish = None

    if op == "sum":
        identity: float | int = 0.0 if is_f else 0
        if is_f:
            combine = lambda a, b: a + b
            # F.sum over FLOAT accumulates and returns DOUBLE; cast back so
            # every form returns the element type.  Residual (documented)
            # deviation: f64 accumulation then one rounding to f32, vs the
            # expression/NumPy forms' per-step f32/f64 accumulation.
            agg = lambda c: F.sum(c).cast(carrier)
            np_combine = lambda a, b: a + b
        else:
            lo, hi = lo_hi
            # exact-then-clamp in every form (deterministic; see module doc);
            # `combine` stays per-pair-saturating for standalone zip_with use
            combine = _sat_int_binop(lambda a, b: a + b, elem)
            acc_cast = _WIDE_DECIMAL
            wide_combine = lambda a, b: a + b
            # NOTE: used as an F.transform lambda — exactly ONE formal
            # param, no defaults (HOF arity sniffing binds extras)
            finish = _make_finish(lo, hi, carrier)
            agg = lambda c: _clamp(F.sum(c.cast(_WIDE_DECIMAL)), lo, hi).cast(carrier)
            np_combine = lambda a, b: a.astype(object) + b.astype(object)
            np_finish = lambda a: _np_clamp(a, elem)
    elif op == "product":
        identity = 1.0 if is_f else 1
        if is_f:
            combine = lambda a, b: a * b
            agg = lambda c: F.product(c).cast(carrier)
            np_combine = lambda a, b: a * b
        else:
            combine = _sat_int_binop(lambda a, b: a * b, elem)
            lo, hi = lo_hi
            # No exact built-in integer product aggregate exists; see
            # array_reduce.py:_int_product_agg for the distributed form.
            agg = None  # type: ignore[assignment]
            np_combine = lambda a, b: _np_clamp(
                a.astype(object) * b.astype(object), elem)
    elif op == "max":
        # identity = type MIN / -inf (reference src/monoid.rs:157-188)
        identity = float("-inf") if is_f else lo_hi[0]
        combine = lambda a, b: F.greatest(a, b)
        agg = lambda c: F.max(c)
        np_combine = np.maximum
    elif op == "min":
        # identity = type MAX / +inf (reference src/monoid.rs:190-221)
        identity = float("inf") if is_f else lo_hi[1]
        combine = lambda a, b: F.least(a, b)
        agg = lambda c: F.min(c)
        np_combine = np.minimum
    else:  # pragma: no cover
        raise ValueError(f"unknown op {op!r}")

    return Monoid(op=op, elem=elem, identity=identity, combine=combine,
                  agg=agg, np_combine=np_combine, acc_cast=acc_cast,
                  wide_combine=wide_combine, finish=finish, np_finish=np_finish)


OPS = ("sum", "product", "max", "min")

#: (op, elem) -> Monoid, the 4 x 10 matrix (src/monoid.rs:52-221)
MONOIDS: dict[tuple[str, str], Monoid] = {
    (op, elem): _build(op, elem)
    for op in OPS
    for elem in ELEMENT_TYPES
    if not (op in ("sum", "product") and elem == "uint64")  # decimal carrier: sum/product handled via clamp too
}

# uint64 sum/product on the DECIMAL(20,0) carrier
for _op in ("sum", "product"):
    _lo, _hi = INT_BOUNDS["uint64"]

    def _u64_combine(a: Column, b: Column, __op=_op) -> Column:
        wide = (a.cast(_WIDE_DECIMAL) + b.cast(_WIDE_DECIMAL)) if __op == "sum" \
            else (a.cast(_WIDE_DECIMAL) * b.cast(_WIDE_DECIMAL))
        return _clamp(wide, _lo, _hi).cast("decimal(20,0)")

    def _u64_agg(c: Column, __op=_op) -> Column:
        if __op == "sum":
            return _clamp(F.sum(c.cast(_WIDE_DECIMAL)), _lo, _hi).cast("decimal(20,0)")
        return None  # product: custom path

    MONOIDS[(_op, "uint64")] = Monoid(
        op=_op, elem="uint64", identity=0 if _op == "sum" else 1,
        combine=_u64_combine,
        agg=_u64_agg if _op == "sum" else None,  # type: ignore[arg-type]
        np_combine=(lambda a, b: a.astype(object) + b.astype(object))
        if _op == "sum"
        else (lambda a, b: np.clip(a.astype(object) * b.astype(object), _lo, _hi)),
        acc_cast=_WIDE_DECIMAL if _op == "sum" else None,
        wide_combine=(lambda a, b: a + b) if _op == "sum" else None,
        finish=(lambda c: _clamp(c, _lo, _hi).cast("decimal(20,0)"))
        if _op == "sum" else None,
        np_finish=(lambda a: _np_clamp(a, "uint64")) if _op == "sum" else None,
    )


def get_monoid(op: str, elem: str = "int") -> Monoid:
    """Factory, mirror of ``array_reduce_*_generic`` (src/monoid.rs:491-526)."""
    try:
        return MONOIDS[(op, elem)]
    except KeyError:
        raise ValueError(
            f"no monoid for op={op!r} elem={elem!r}; "
            f"ops={OPS}, elems={sorted(ELEMENT_TYPES)}") from None
