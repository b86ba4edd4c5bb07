"""YAML spec loading with simple composition.

The reference loads specs through Hydra compose (feature_fabrica/
yaml_parser.py:13-27) including ``defaults:`` composition
(examples/import_features.yaml:1-3). We support the same surface without
Hydra: a ``defaults: [other_spec, ...]`` list merges sibling YAML files
(later keys win)."""

from __future__ import annotations

import os

import yaml

__all__ = ["load_spec"]


def load_spec(source: str | dict) -> dict:
    """Accepts a dict (already parsed), a path to a YAML file, or a YAML
    string; returns the merged spec dict."""
    if isinstance(source, dict):
        return dict(source)
    if os.path.exists(source):
        base_dir = os.path.dirname(os.path.abspath(source))
        with open(source) as f:
            doc = yaml.safe_load(f)
    else:
        base_dir = "."
        doc = yaml.safe_load(source)
    if not isinstance(doc, dict):
        raise ValueError("spec must be a mapping of feature name -> spec")
    defaults = doc.pop("defaults", None)
    merged: dict = {}
    if defaults:
        for name in defaults:
            if name == "_self_":
                continue
            path = os.path.join(base_dir, f"{name}.yaml")
            merged.update(load_spec(path))
    merged.update(doc)
    return merged
