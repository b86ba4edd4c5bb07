"""Row-level constraint checks: vectorized violation masks over Arrow
batches.

Each check produces a boolean mask (True = violation) from one zero-copy
batch — no Python loops in the hot path. Regex state is compiled once per
worker via pyarrow's kernel (pattern shipped in the closure). These are the
``map_batches`` stage of the validation suite; keyed checks (uniqueness,
referential) live in their own modules because they need a shuffle or a
broadcast.

Check spec model mirrors the engine's feature-spec ergonomics: plain dicts
from YAML, validated eagerly at compile time.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["RowCheck", "NotNullCheck", "MinLengthCheck", "RegexCheck",
           "AcceptedValuesCheck", "RangeCheck", "CompareCheck",
           "MembershipCheck", "build_row_check", "CheckSpecError"]


class CheckSpecError(ValueError):
    pass


_ROW_CHECKS: dict[str, type] = {}

# ops accepted in a check's `where:` scope predicate
_WHERE_OPS = ("==", "!=", "<", "<=", ">", ">=", "in", "not_in",
              "is_null", "not_null")


def _compile_where(where: dict):
    """Compile a ``where`` spec into a vectorized scope-mask function
    (True = row is in scope). Spec: ``{column, op, value}`` with op one
    of ==/!=/</<=/>/>=/in/not_in/is_null/not_null (dbt's ``where`` /
    Great Expectations' ``row_condition`` shape). A null scope-column
    value puts the row OUT of scope (except for ``is_null``)."""
    w = dict(where)
    col = w.pop("column", None)
    op = w.pop("op", "==")
    val = w.pop("value", None)
    if col is None:
        raise CheckSpecError("where: needs a column")
    if op not in _WHERE_OPS:
        raise CheckSpecError(f"where: unknown op {op!r} (one of {_WHERE_OPS})")
    if op in ("is_null", "not_null"):
        if val is not None:
            raise CheckSpecError(f"where: op {op!r} takes no value")
    elif val is None:
        raise CheckSpecError(f"where: op {op!r} needs a value")
    if w:
        raise CheckSpecError(f"where: unknown keys {sorted(w)}")

    def scope(batch: pa.Table) -> pa.BooleanArray:
        if col not in batch.column_names:
            raise CheckSpecError(f"where: column {col!r} missing from batch "
                                 f"{batch.column_names}")
        c = batch.column(col)
        if op == "is_null":
            return pc.is_null(c)
        if op == "not_null":
            return pc.is_valid(c)
        if op == "in":
            m = pc.is_in(c, value_set=pa.array(list(val)))
        elif op == "not_in":
            m = pc.invert(pc.is_in(c, value_set=pa.array(list(val))))
        else:
            m = {"==": pc.equal, "!=": pc.not_equal, "<": pc.less,
                 "<=": pc.less_equal, ">": pc.greater,
                 ">=": pc.greater_equal}[op](c, val)
        return pc.fill_null(m, False)

    return scope


class RowCheck:
    """A named, vectorized violation-mask producer.

    User extension (mirrors the reference's custom-transform hook,
    transform/base.py:31-33): subclass with a ``_type_`` attribute and a
    ``mask(batch) -> BooleanArray`` and the check is immediately usable
    from YAML as ``{type: <_type_>, column: ..., <kwargs>}``."""

    kind = "row"
    _type_: str | None = None

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        if getattr(cls, "_type_", None):
            _ROW_CHECKS[cls._type_] = cls

    def __init__(self, name: str, column: str, max_violation_rate: float = 0.0,
                 where: dict | None = None, severity: str = "error"):
        self.name = name
        self.column = column
        # a partition FAILS when its violation rate exceeds this threshold
        self.max_violation_rate = float(max_violation_rate)
        # "error" (default) fails the suite; "warn" is reported (verdict
        # row passed=False, violations collected) but never fails the
        # suite-level ValidationResult.passed() (dbt severity semantics)
        if severity not in ("error", "warn"):
            raise CheckSpecError(f"check {name}: severity must be "
                                 f"error|warn, got {severity!r}")
        self.severity = severity
        # optional row-scope predicate: the check only applies (and its
        # violation-rate denominator only counts) rows where this holds
        self.where = dict(where) if where else None
        self._scope = _compile_where(where) if where else None

    def scope_mask(self, batch: pa.Table) -> pa.BooleanArray:
        """In-scope mask (no nulls); only call when ``self.where`` is set."""
        return self._scope(batch)

    def mask(self, batch: pa.Table) -> pa.BooleanArray:  # pragma: no cover
        raise NotImplementedError

    def detail(self) -> str:
        return self.name

    def _col(self, batch: pa.Table):
        if self.column not in batch.column_names:
            raise CheckSpecError(f"check {self.name}: column {self.column!r} "
                                 f"missing from batch {batch.column_names}")
        return batch.column(self.column)


class NotNullCheck(RowCheck):
    def mask(self, batch):
        return pc.is_null(self._col(batch))


class MinLengthCheck(RowCheck):
    """Violation when utf8 length < min_length (min_length=1 == non-empty)."""

    def __init__(self, name, column, min_length: int = 1, **kw):
        super().__init__(name, column, **kw)
        self.min_length = int(min_length)

    def mask(self, batch):
        col = self._col(batch)
        short = pc.less(pc.utf8_length(col), self.min_length)
        return pc.fill_null(short, True)  # null counts as too-short


class RegexCheck(RowCheck):
    """Violation when the value does NOT fully match the pattern."""

    def __init__(self, name, column, pattern: str, **kw):
        super().__init__(name, column, **kw)
        self.pattern = pattern

    def mask(self, batch):
        col = self._col(batch)
        ok = pc.match_substring_regex(col, f"^(?:{self.pattern})$")
        return pc.fill_null(pc.invert(ok), True)


def _is_in_dict_aware(col, value_set: pa.Array):
    """``pc.is_in`` with a dictionary fast path: membership is decided
    once on the (tiny) dictionary and gathered by index — identical
    per-row booleans (nulls -> False, matching flat is_in), without
    decoding the string payload."""
    if isinstance(col, pa.ChunkedArray) and pa.types.is_dictionary(col.type):
        col = col.combine_chunks()
    if isinstance(col, pa.Array) and pa.types.is_dictionary(col.type):
        okd = pc.is_in(col.dictionary, value_set=value_set)
        return pc.fill_null(okd.take(col.indices), False)
    return pc.is_in(col, value_set=value_set)


class AcceptedValuesCheck(RowCheck):
    """Violation when the value is outside the accepted set (nulls pass —
    pair with not_null to forbid them)."""

    def __init__(self, name, column, values, **kw):
        super().__init__(name, column, **kw)
        self.values = list(values)

    def mask(self, batch):
        col = self._col(batch)
        ok = _is_in_dict_aware(col, pa.array(self.values))
        return pc.and_(pc.invert(ok), pc.is_valid(col))


class RangeCheck(RowCheck):
    """Violation when value < min or > max (nulls pass)."""

    def __init__(self, name, column, min=None, max=None, **kw):
        super().__init__(name, column, **kw)
        if min is None and max is None:
            raise CheckSpecError(f"range check {name}: need min and/or max")
        self.min = min
        self.max = max

    def mask(self, batch):
        col = self._col(batch)
        bad = pa.array([False] * len(col))
        if self.min is not None:
            bad = pc.or_(bad, pc.fill_null(pc.less(col, self.min), False))
        if self.max is not None:
            bad = pc.or_(bad, pc.fill_null(pc.greater(col, self.max), False))
        return bad


class CompareCheck(RowCheck):
    """Cross-COLUMN comparison: violation when NOT (column <op> other)
    row-wise (dbt's expression test shape). Rows where either side is
    null pass — pair with not_null to forbid nulls."""

    _type_ = "compare"

    def __init__(self, name, column, other: str, op: str = "<=", **kw):
        super().__init__(name, column, **kw)
        if op not in ("==", "!=", "<", "<=", ">", ">="):
            raise CheckSpecError(f"compare check {name}: bad op {op!r}")
        self.other = other
        self.op = op

    def mask(self, batch):
        col = self._col(batch)
        if self.other not in batch.column_names:
            raise CheckSpecError(f"check {self.name}: column {self.other!r} "
                                 f"missing from batch {batch.column_names}")
        oth = batch.column(self.other)
        ok = {"==": pc.equal, "!=": pc.not_equal, "<": pc.less,
              "<=": pc.less_equal, ">": pc.greater,
              ">=": pc.greater_equal}[self.op](col, oth)
        return pc.fill_null(pc.invert(ok), False)  # null side passes


class MembershipCheck(RowCheck):
    """Violation when the value is NOT in a broadcast key set — the row
    form of the referential-integrity check: the parent key set is
    collected once on the driver, shipped via the closure/object store,
    and tested per batch with a vectorized is_in (SURVEY.md §2.4: broadcast
    semi/anti join)."""

    def __init__(self, name, column, key_set, **kw):
        super().__init__(name, column, **kw)
        # null parent keys count as absent (and would crash sorted())
        self._keys = pa.array(sorted(k for k in key_set if k is not None))

    def mask(self, batch):
        col = self._col(batch)
        ok = _is_in_dict_aware(col, self._keys)
        return pc.and_(pc.invert(ok), pc.is_valid(col))


class BloomMembershipCheck(RowCheck):
    """Referential membership against a broadcast BLOOM FILTER — the
    scale form of MembershipCheck for parent key sets too large to ship
    as a plain set (SURVEY.md §2.4). False positives (rate p, chosen at
    build) let an orphan slip through; never flags a valid row."""

    def __init__(self, name, column, bloom_bytes: bytes, **kw):
        from ..state import BloomFilter

        super().__init__(name, column, **kw)
        self._bloom = BloomFilter.from_bytes(bloom_bytes)

    def mask(self, batch):
        import numpy as np

        col = self._col(batch)
        present = self._bloom.contains(col)
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        return pa.array(np.asarray(~present) & np.asarray(valid))


_ROW_CHECKS.update({
    "not_null": NotNullCheck,
    "min_length": MinLengthCheck,
    "regex": RegexCheck,
    "accepted_values": AcceptedValuesCheck,
    "range": RangeCheck,
})


def build_row_check(spec: dict) -> RowCheck:
    spec = dict(spec)
    kind = spec.pop("type")
    cls = _ROW_CHECKS.get(kind)
    if cls is None:
        raise CheckSpecError(f"unknown row check type {kind!r}")
    column = spec.pop("column")
    name = spec.pop("name", f"{kind}:{column}")
    try:
        return cls(name, column, **spec)
    except TypeError as e:
        raise CheckSpecError(f"bad params for {kind} check: {e}") from e
