"""Feature spec models + DAG leveling.

Pydantic-validated spec semantics mirror the reference
(feature_fabrica/models/features.py:13-30): description min length 5,
``data_type`` must be a known numpy dtype name (mapped here to an Arrow
type), optional group tag, explicit dependency list, transformation as an
expression string / single op / ordered chain. Leveling mirrors
core.py:186-260 (level = max(dep levels) + 1) with cycle detection
(utils.py:56-63 semantics)."""

from __future__ import annotations

from typing import Any

import pyarrow as pa
from pydantic import BaseModel, Field, field_validator

from ..functions import registry
from ..functions.base import Transformation, arrow_type_from_name
from .expressions import Call, Node, SelfData, is_expression, parse_expression

__all__ = ["FeatureSpec", "CompiledFeature", "build_features", "level_features",
           "CyclicDependencyError", "SpecError"]


class SpecError(ValueError):
    pass


class CyclicDependencyError(SpecError):
    pass


class FeatureSpec(BaseModel):
    """One YAML entry (reference: models/features.py:13-30)."""

    description: str = Field(min_length=5)
    data_type: str
    group: str | None = None
    dependencies: list[str] = Field(default_factory=list)
    transformation: Any = None
    # raw input column feeding `()` — defaults to the feature's own name
    # (reference semantics: core.py:324,335); an extension for pipelines
    # whose feature names differ from source column names.
    input: str | None = None

    @field_validator("data_type")
    @classmethod
    def _valid_dtype(cls, v: str) -> str:
        arrow_type_from_name(v)  # raises on unknown names
        return v

    @property
    def arrow_type(self) -> pa.DataType:
        return arrow_type_from_name(self.data_type)


class CompiledFeature:
    """A feature with its compiled expression tree — the unit of the DAG
    (reference Feature, core.py:26-39)."""

    def __init__(self, name: str, spec: FeatureSpec, tree: Node | None):
        self.name = name
        self.spec = spec
        self.tree = tree
        self.level: int = -1
        # deps = declared + inferred from expression refs
        inferred = set()
        if tree is not None:
            inferred = {r.split(":")[0] for r in tree.refs()}
        self.dependencies: set[str] = set(spec.dependencies) | inferred

    @property
    def uses_self_input(self) -> bool:
        return self.tree is None or any(isinstance(n, SelfData) for n in self.tree.walk())

    def calls(self) -> list[Call]:
        if self.tree is None:
            return []
        return [n for n in self.tree.walk() if isinstance(n, Call)]

    def __repr__(self):
        return f"CompiledFeature({self.name}, level={self.level})"


def _compile_transformation(name: str, spec: FeatureSpec) -> Node | None:
    t = spec.transformation
    if t is None:
        return None
    if isinstance(t, str):
        return parse_expression(t)
    if isinstance(t, dict):
        if "_target_" in t:
            return _compile_single(dict(t))
        # ordered chain {stage_name: {_target_: ...}, ...} — each step feeds
        # the next (reference: _internal/compute.py:14-45)
        node: Node = SelfData()
        first = True
        for stage_name, step in t.items():
            sub = _compile_single(dict(step), recv=None if first and _is_nullary(step) else node)
            if isinstance(sub, Call):
                sub.publish_as = None
                sub.stage_key = stage_name  # type: ignore[attr-defined]
            node = sub
            first = False
        return node
    raise SpecError(f"feature {name}: unsupported transformation spec {type(t)}")


def _is_nullary(step: dict) -> bool:
    target = step.get("_target_", "")
    if isinstance(target, str) and not is_expression(target):
        try:
            cls = registry.get(target)
        except KeyError:
            return False
        return cls.__name__ in ("FeatureImporter",) or "iterable" in step
    return False


def _compile_single(cfg: dict, recv: Node | None = None) -> Node:
    target = cfg.pop("_target_")
    if isinstance(target, str) and is_expression(target):
        return parse_expression(target)
    if recv is None and not _target_is_importer(target) and "iterable" not in cfg:
        recv = SelfData()
    return Call(target, cfg, recv)


def _target_is_importer(target: str) -> bool:
    try:
        return registry.get(target).__name__ == "FeatureImporter"
    except KeyError:
        return False


def build_features(spec_dict: dict) -> dict[str, CompiledFeature]:
    """YAML dict -> compiled features with resolved refs
    (reference: core.py:153-184 + transformation compile at base.py:35-109)."""
    features: dict[str, CompiledFeature] = {}
    for name, raw in spec_dict.items():
        if name.startswith("_"):
            continue
        spec = FeatureSpec(**raw)
        tree = _compile_transformation(name, spec)
        features[name] = CompiledFeature(name, spec, tree)
    names = set(features)
    for f in features.values():
        unknown = f.dependencies - names
        if unknown:
            raise SpecError(f"feature {f.name} depends on unknown features {sorted(unknown)}")
        for call in f.calls():
            call.transform.compile(names)
    return features


def level_features(features: dict[str, CompiledFeature]) -> dict[int, list[CompiledFeature]]:
    """Topological leveling; leftover features => cycle
    (reference: core.py:186-260, utils.py:56-63)."""
    levels: dict[int, list[CompiledFeature]] = {}
    assigned: dict[str, int] = {}
    pending = dict(features)
    while pending:
        progressed = False
        for name in list(pending):
            f = pending[name]
            if all(d in assigned for d in f.dependencies):
                lvl = 1 + max((assigned[d] for d in f.dependencies), default=-1)
                f.level = lvl
                assigned[name] = lvl
                levels.setdefault(lvl, []).append(f)
                del pending[name]
                progressed = True
        if not progressed:
            raise CyclicDependencyError(
                f"cyclic dependency among features {sorted(pending)}")
    return dict(sorted(levels.items()))
