"""Unit-conversion algebra for grade/tonnage normalization.

Clean-room port of the conversion semantics at
`/root/reference/minmodkg/grade_tonnage_model.py:462-543`:

- tonnage is normalized to **million tonnes** (``Q202``),
- grade is normalized to **percent** (``Q201``),
- units known to be incompatible raise ``UnconvertibleUnitError`` (the
  inventory is silently skipped by the model), anything unknown is a hard
  ``NotImplementedError`` (data bug — surfaced, not swallowed).

Both a scalar form (used inside Arrow batches by the grade-tonnage
``applyInPandas``) and a Spark Column form (``when``/``otherwise`` chain,
JVM-side, used when a whole-column normalization is enough).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MR = "https://minmod.isi.edu/resource/"

UNIT_TONNES = MR + "Q200"
UNIT_MT = MR + "Q202"  # million tonnes (canonical tonnage unit)
UNIT_M_SHORT_TONS = MR + "Q213"
UNIT_SHORT_TONS = MR + "Q214"
UNIT_M_LBS = MR + "Q215"
UNIT_PERCENT = MR + "Q201"  # canonical grade unit
UNIT_GRAMS_PER_TONNE = MR + "Q203"
UNIT_PPM = MR + "Q220"
UNIT_KG_PER_TONNE = MR + "Q217"


class UnconvertibleUnitError(Exception):
    """The unit is a real unit but not convertible to the target axis."""


# units that can never be converted to a weight (grade-like units etc.)
# ref: grade_tonnage_model.py:462-483
WEIGHT_INCOMPATIBLE = {
    MR + q
    for q in (
        "Q201 Q203 Q204 Q205 Q207 Q208 Q209 Q210 Q212 Q216 Q217 Q220 "
        "Q206 Q211 Q221 Q218 Q219"
    ).split()
}
# units that can never be converted to percent
# ref: grade_tonnage_model.py:484-506
PERCENT_INCOMPATIBLE = {
    MR + q
    for q in (
        "Q200 Q202 Q204 Q205 Q206 Q207 Q208 Q209 Q210 Q211 Q212 Q213 "
        "Q214 Q215 Q216 Q218 Q219 Q221"
    ).split()
}

# factor tables (value_in_target = value * factor)
TO_MT_FACTOR = {
    UNIT_MT: 1.0,
    UNIT_TONNES: 1.0 / 1_000_000,
    UNIT_M_SHORT_TONS: 1.0 / 1.10231,
    UNIT_SHORT_TONS: 1.0 / 1_000_000 / 1.10231,
    UNIT_M_LBS: 0.000454,
}
TO_PERCENT_FACTOR = {
    UNIT_PERCENT: 1.0,
    UNIT_GRAMS_PER_TONNE: 1.0 / 10_000,
    UNIT_PPM: 1.0 / 10_000,
    UNIT_KG_PER_TONNE: 1.0 / 10,
}


def unit_conversion(value: float, unit: str, to_unit: str) -> float:
    """Scalar conversion, exact reference semantics
    (grade_tonnage_model.py:509-543)."""
    if unit == to_unit:
        return value
    if to_unit == UNIT_MT:
        if unit in TO_MT_FACTOR:
            return value * TO_MT_FACTOR[unit]
        if unit in WEIGHT_INCOMPATIBLE:
            raise UnconvertibleUnitError((value, unit, to_unit))
        raise NotImplementedError((value, unit, to_unit))
    if to_unit == UNIT_PERCENT:
        if unit in TO_PERCENT_FACTOR:
            return value * TO_PERCENT_FACTOR[unit]
        if unit in PERCENT_INCOMPATIBLE:
            raise UnconvertibleUnitError((value, unit, to_unit))
        raise NotImplementedError((value, unit, to_unit))
    raise NotImplementedError((value, unit, to_unit))


def _factor_col(unit: Column, table: dict[str, float]) -> Column:
    expr = F.lit(None).cast("double")
    for u, f in table.items():
        expr = F.when(unit == F.lit(u), F.lit(f)).otherwise(expr)
    return expr


def tonnage_mt_col(value: Column, unit: Column) -> Column:
    """value×factor → Mt; NULL when the unit is not tonnage-convertible.

    JVM-side (whole-stage codegen) — use this for bulk normalization where
    the skip-on-unconvertible semantics of the model is expressed as a
    NULL filter instead of an exception.
    """
    return value * _factor_col(unit, TO_MT_FACTOR)


def grade_pct_col(value: Column, unit: Column) -> Column:
    """value×factor → percent; NULL when not grade-convertible."""
    return value * _factor_col(unit, TO_PERCENT_FACTOR)
