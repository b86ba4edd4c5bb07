"""Actor-pool drift stage — baseline histograms/frequencies held in
ACTOR STATE (north star: "distribution-drift checks ... against baseline
histograms held in actor-pool state").

``run_suite`` computes drift inside its fused single pass with baselines
shipped in the closure — cheapest when drift rides along with other
checks. This module is the standalone/actor form for when baselines are
large (thousands of columns x fine-grained histograms) or loaded from a
baseline store: each actor loads/deserializes the baseline set ONCE in
``__init__`` and every batch only accumulates sketch partials against it.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa

from ..checks.suite import DriftCheck
from ..state import (CategoricalFreq, NumericHistogram, ks_from_counts,
                     psi_categorical, psi_from_counts)

__all__ = ["DriftSketchActor", "drift_report"]


class DriftSketchActor:
    """map_batches actor: per-batch sketch partials vs baselines loaded
    once per actor. Emits one serialized partial per (check, batch)."""

    def __init__(self, checks: list[DriftCheck]):
        # once-per-actor setup: deserialize baselines, pre-build edge arrays
        self.checks = checks
        self.edges = {c.name: np.asarray(c.baseline["edges"], np.float64)
                      for c in checks if not c.categorical}

    def __call__(self, batch: pa.Table) -> pa.Table:
        names, kinds, payloads = [], [], []
        for dc in self.checks:
            col = batch.column(dc.column)
            if dc.categorical:
                vc = pd.Series(col.to_pandas()).value_counts(dropna=False)
                freq = {("\0null" if pd.isna(k) else str(k)): int(v)
                        for k, v in vc.items()}
                kinds.append("catfreq")
                payloads.append(json.dumps(freq).encode())
            else:
                h = NumericHistogram(self.edges[dc.name]).add(
                    col.drop_null().to_numpy(zero_copy_only=False).astype(np.float64))
                kinds.append("hist")
                payloads.append(json.dumps(h.to_dict()).encode())
            names.append(dc.name)
        return pa.table({"check": pa.array(names, pa.string()),
                         "kind": pa.array(kinds, pa.string()),
                         "payload": pa.array(payloads, pa.binary())})


def drift_report(ds, checks: list[DriftCheck], *, concurrency: int = 4,
                 batch_size: int | None = None) -> pd.DataFrame:
    """Run the actor-pool drift stage and merge partials into per-check
    metrics. Returns (check, method, metric, passed)."""
    for dc in checks:
        if dc.baseline is None:
            raise ValueError(f"drift check {dc.name}: no baseline bound")
    out = ds.map_batches(DriftSketchActor, fn_constructor_args=(checks,),
                         concurrency=concurrency, batch_size=batch_size,
                         batch_format="pyarrow").to_pandas()
    rows = []
    for dc in checks:
        sel = out[out["check"] == dc.name]
        if dc.categorical:
            f = CategoricalFreq()
            for b in sel["payload"]:
                f = f.merge(CategoricalFreq.from_dict(json.loads(bytes(b))))
            metric = psi_categorical(dc.baseline["freq"], dict(f.counts))
        else:
            h = None
            for b in sel["payload"]:
                hh = NumericHistogram.from_dict(json.loads(bytes(b)))
                h = hh if h is None else h.merge(hh)
            base = np.asarray(dc.baseline["full_counts"], np.float64)
            cur = h.full_counts() if h is not None else np.zeros_like(base)
            metric = (psi_from_counts(base, cur) if dc.method == "psi"
                      else ks_from_counts(base, cur))
        rows.append((dc.name, dc.method, float(metric), metric <= dc.threshold))
    return pd.DataFrame(rows, columns=["check", "method", "metric", "passed"])
