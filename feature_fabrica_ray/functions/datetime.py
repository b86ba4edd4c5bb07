"""Datetime transforms (reference: feature_fabrica/transform/datetime.py)
as vectorized Arrow timestamp kernels.

The reference's DateTimeExtract loops per element (datetime.py:143-156);
here extraction is pc.year/month/... — faithful to the semantics, not the
loop. Day-of-week matches the reference's Monday=0 epoch-offset formula
(datetime.py:186)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import Transformation, TransformationError, as_arrow

__all__ = ["DateTimeDifference", "DateTimeAdd", "DateTimeSubtract",
           "DateTimeExtract", "DateTimeTrunc", "ExtractDayofWeek",
           "DAYS_OF_WEEK"]

DAYS_OF_WEEK = ["monday", "tuesday", "wednesday", "thursday", "friday",
                "saturday", "sunday"]

_UNIT_SECONDS = {"s": 1, "m": 60, "h": 3600, "D": 86400, "W": 7 * 86400}

# diff units relative to the engine's us-resolution timestamps
# (reference accepts the full numpy range as..Y, datetime.py:46-47)
_UNIT_DIV_US = {"us": 1, "ms": 1_000, "s": 1_000_000, "m": 60_000_000,
                "h": 3_600_000_000, "D": 86_400_000_000,
                "W": 7 * 86_400_000_000}
_UNIT_MUL_US = {"ns": 1_000, "ps": 1_000_000, "fs": 10 ** 9, "as": 10 ** 12}


def _to_ts(data) -> pa.Array:
    arr = as_arrow(data)
    if pa.types.is_timestamp(arr.type):
        return arr
    if pa.types.is_string(arr.type):
        return arr.cast(pa.timestamp("us"))
    raise TransformationError(f"expected timestamp/ISO-string column, got {arr.type}")


def _scalar_ts(v) -> pa.Scalar:
    return pa.scalar(np.datetime64(v, "us"))


class DateTimeDifference(Transformation):
    """data - initial (or end - data), reported in integer units
    (reference: transform/datetime.py:11-76; unit range as..W; months/years
    use calendar component arithmetic like numpy's M8 units)."""

    _name_ = "datetime_diff"
    _ref_params_ = ("initial_date", "end_date")

    def __init__(self, initial_date=None, end_date=None, compute_unit: str = "D"):
        if (initial_date is None) == (end_date is None):
            raise TransformationError(
                "datetime_diff: exactly one of initial_date/end_date required")
        self.initial_date = initial_date
        self.end_date = end_date
        self.compute_unit = compute_unit

    def execute(self, data):
        ts = _to_ts(data)
        if self.initial_date is not None:
            other = self._val(self.initial_date)
            left, right = ts, other
        else:
            other = self._val(self.end_date)
            left, right = other, ts
        if not isinstance(right, (pa.Array, pa.ChunkedArray)):
            right = _scalar_ts(right)
        elif not pa.types.is_timestamp(right.type):
            right = _to_ts(right)
        if not isinstance(left, (pa.Array, pa.ChunkedArray)):
            left = _scalar_ts(left)
        elif not pa.types.is_timestamp(left.type):
            left = _to_ts(left)
        unit = self.compute_unit
        if unit in ("M", "Y"):
            ly, ry = pc.year(left), pc.year(right)
            if unit == "Y":
                return pc.subtract(ly, ry)
            lm, rm = pc.month(left), pc.month(right)
            return pc.add(pc.multiply(pc.subtract(ly, ry), 12), pc.subtract(lm, rm))
        diff_us = pc.cast(pc.subtract(left, right), pa.int64())
        if unit in _UNIT_MUL_US:   # sub-microsecond: scale up (numpy parity;
            # as/fs overflow int64 exactly where numpy's timedelta64 does)
            return pc.multiply(diff_us, pa.scalar(_UNIT_MUL_US[unit], pa.int64()))
        if unit not in _UNIT_DIV_US:
            raise TransformationError(f"unsupported compute_unit {unit!r}")
        return pc.divide(diff_us, pa.scalar(_UNIT_DIV_US[unit], pa.int64()))


class _DateTimeShift(Transformation):
    _ref_params_ = ("feature",)
    _sign = 1

    def __init__(self, n: int | None = None, compute_unit: str = "D", feature=None):
        self.n = n
        self.compute_unit = compute_unit
        self.feature = feature

    def execute(self, data):
        ts = _to_ts(data)
        if self.feature is not None:
            # bound-column variant: shift by a per-row duration/int column
            # (reference: datetime.py:92-101)
            other = as_arrow(self._val(self.feature))
            if not pa.types.is_duration(other.type):
                mult = _UNIT_SECONDS.get(self.compute_unit, 86400) * 1_000_000
                other = pc.multiply(pc.cast(other, pa.int64()), mult).cast(pa.duration("us"))
            if self._sign < 0:
                return pc.subtract(ts, other)
            return pc.add(ts, other)
        if self.compute_unit not in _UNIT_SECONDS:
            raise TransformationError(f"unsupported compute_unit {self.compute_unit!r}")
        delta = pa.scalar(self._sign * int(self.n) * _UNIT_SECONDS[self.compute_unit] * 1_000_000,
                          pa.duration("us"))
        return pc.add(ts, delta)


class DateTimeAdd(_DateTimeShift):
    """data + n units (reference: transform/datetime.py:78-107)."""

    _name_ = "datetime_add"
    _sign = 1


class DateTimeSubtract(_DateTimeShift):
    """data - n units (reference: transform/datetime.py:109-116)."""

    _name_ = "datetime_sub"
    _sign = -1


class DateTimeExtract(Transformation):
    """extract a component as int32 (reference: transform/datetime.py:118-156)."""

    _name_ = "datetime_extract"
    _KERNELS = {"Y": pc.year, "year": pc.year, "M": pc.month, "month": pc.month,
                "D": pc.day, "day": pc.day, "h": pc.hour, "hour": pc.hour,
                "m": pc.minute, "minute": pc.minute, "s": pc.second, "second": pc.second}

    def __init__(self, component: str = "Y"):
        if component not in self._KERNELS:
            raise TransformationError(f"unknown component {component!r}")
        self.component = component

    def execute(self, data):
        return pc.cast(self._KERNELS[self.component](_to_ts(data)), pa.int32())


class DateTimeTrunc(Transformation):
    """Truncate timestamps to a calendar boundary (SQL ``date_trunc``
    parity: week starts Monday, quarter/year on calendar boundaries) —
    one ``floor_temporal`` Arrow kernel. Beyond the reference's datetime
    family; completes it for windowing/bucketing specs."""

    _name_ = "datetime_trunc"
    _UNITS = ("microsecond", "millisecond", "second", "minute", "hour",
              "day", "week", "month", "quarter", "year")

    def __init__(self, unit: str = "day"):
        if unit not in self._UNITS:
            raise TransformationError(
                f"datetime_trunc: unit must be one of {self._UNITS}, "
                f"got {unit!r}")
        self.unit = unit

    def execute(self, data):
        return pc.floor_temporal(_to_ts(data), unit=self.unit)


class ExtractDayofWeek(Transformation):
    """Monday=0 day-of-week, optionally mapped to lowercase names
    (reference: transform/datetime.py:158-201, formula at :186)."""

    _name_ = "datetime_day_of_week"

    def __init__(self, as_name: bool = False):
        self.as_name = as_name

    def execute(self, data):
        dow = pc.day_of_week(_to_ts(data))  # pyarrow: Monday=0 by default
        if not self.as_name:
            return pc.cast(dow, pa.int32())
        names = pa.array(DAYS_OF_WEEK, pa.string())
        return names.take(pc.cast(dow, pa.int32()))
