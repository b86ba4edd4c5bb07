"""feature_fabrica_ray — a Ray-Data-native schema + constraint validation engine.

A from-scratch reimplementation of the *capabilities* of
cowana-ai/feature-fabrica (reference at /root/reference, v1.3.1) re-expressed
Ray-Data-first:

- declarative YAML feature/check specs compile to a DAG of ``map_batches``
  stages over zero-copy Arrow batches (reference: feature_fabrica/core.py);
- self-fitting operators (z-score, min-max, kbins, encoders without
  categories) become true global two-phase aggregates
  (partial-per-block -> merge -> broadcast), fixing the reference's silent
  per-batch divergence (reference: feature_fabrica/transform/math.py:144-227);
- the validation engine adds per-column stats (Welford / HyperLogLog /
  t-digest), uniqueness, referential-integrity and distribution-drift checks
  over the source-code table ``(repo, path, commit, lang, content)`` with
  per-partition verdicts, violation rows, lineage and checkpoint resume.

Nothing in this package calls ``ray.init()`` — sessions are owned by the
caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
