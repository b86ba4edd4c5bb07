"""Event-stream operators: tumbling-window aggregates, gap-based
sessionization, JSON property extraction.

Scale shapes:
- ``tumbling_window_agg``: the combiner pattern — per-block partial
  (key, window) aggregates, then a final merge over the (small) partial
  table. The exchange carries one row per (key, window) per block, never
  raw events.
- ``sessionize``: inherently per-key sequential (each session depends on
  the previous event's timestamp), so it hash-partitions by key and runs
  one vectorized pass per user group — the canonical
  ``groupby(key).map_groups`` stage. Zipf-hot users bound a single
  group's size; for million-event users, split sessions per (user, day)
  first.
- ``extract_json_int``: a stateless regex kernel (``pc.extract_regex``)
  — no Python JSON parsing per row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..tuning import shuffle_partitions
from .textstats import fill_utf8

__all__ = ["tumbling_window_agg", "sliding_window_agg", "sessionize",
           "bucketed_by_key",
           "extract_json_int", "cumulative_agg", "rolling_agg", "lag_lead",
           "fill_time_gaps", "funnel_steps", "interval_overlap_pairs",
           "cohort_retention", "event_transitions", "markov_kstep", "ewma_per_key",
           "interarrival_stats", "rate_anomalies", "windowed_distinct",
           "runs_islands", "time_weighted_avg", "forward_fill",
           "interpolate_missing", "autocorr_per_key",
           "cumulative_distinct", "cusum_per_key", "rolling_quantile",
           "scd2_intervals", "interval_coverage", "sax_words",
           "watermark_late_events"]


def tumbling_window_agg(ds, ts_col: str, key_col: str, value_col: str,
                        width_s: int = 3600) -> pd.DataFrame:
    """Per (key, tumbling window) event count + value sum. Window start =
    epoch-aligned floor(ts / width). Returns (key, window_start, n, sum_v)."""

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native partial: no pandas detour, no schema metadata.
        # Events without a timestamp belong to no window (SQL
        # time_bucket(NULL) groups to NULL; we drop instead of emitting
        # a null window — a null ts would otherwise become float NaN).
        batch = batch.filter(pc.is_valid(batch.column(ts_col)))
        ts = batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        win = (ts // (width_s * 1_000_000)) * (width_s * 1_000_000)
        t = pa.table({key_col: batch.column(key_col),
                      "window_us": pa.array(win, pa.int64()),
                      "v": batch.column(value_col)})
        g = t.group_by([key_col, "window_us"]).aggregate(
            [("v", "count", pc.CountOptions(mode="all")), ("v", "sum")])
        return pa.table({key_col: g.column(key_col),
                         "window_us": g.column("window_us"),
                         "n": g.column("v_count").cast(pa.int64()),
                         "sum_v": g.column("v_sum")})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    gb = parts.groupby([key_col, "window_us"], as_index=False,
                       dropna=False)          # SQL: NULL key is a group
    out = gb["n"].sum()
    # SUM of an all-NULL group is NULL; min_count keeps the Cython path
    # (a lambda agg would pay one Python call per group)
    out["sum_v"] = gb["sum_v"].sum(min_count=1)["sum_v"]
    out["window_start"] = pd.to_datetime(out.pop("window_us"), unit="us")
    out["n"] = out["n"].astype("int64")
    return out[[key_col, "window_start", "n", "sum_v"]]


def sliding_window_agg(ds, ts_col: str, key_col: str, value_col: str,
                       width_s: int = 3600, hop_s: int = 900) -> pd.DataFrame:
    """Per (key, SLIDING window) event count + value sum: windows of
    ``width_s`` starting every ``hop_s`` (width must be a multiple of
    hop). Each event lands in width/hop windows — the partial emits that
    many (key, window) combinations per block (still one row per
    DISTINCT combination, never raw events), then the same combiner
    merge as tumbling. Returns (key, window_us, n, sum_v) with the
    window start in integer epoch microseconds."""
    if width_s % hop_s:
        raise ValueError("width_s must be a multiple of hop_s")
    m = width_s // hop_s
    hop_us = hop_s * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        # null-ts events belong to no window (see tumbling_window_agg)
        batch = batch.filter(pc.is_valid(batch.column(ts_col)))
        ts = batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n = len(ts)
        base = ts // hop_us
        js = np.repeat(np.arange(m, dtype=np.int64), n)
        wins = (np.tile(base, m) - js) * hop_us
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), m))
        t = pa.table({key_col: pc.take(batch.column(key_col), idx),
                      "window_us": pa.array(wins, pa.int64()),
                      "v": pc.take(batch.column(value_col), idx)})
        g = t.group_by([key_col, "window_us"]).aggregate(
            [("v", "count", pc.CountOptions(mode="all")), ("v", "sum")])
        return pa.table({key_col: g.column(key_col),
                         "window_us": g.column("window_us"),
                         "n": g.column("v_count").cast(pa.int64()),
                         "sum_v": g.column("v_sum")})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    gb = parts.groupby([key_col, "window_us"], as_index=False,
                       dropna=False)          # SQL: NULL key is a group
    out = gb["n"].sum()
    # SUM of an all-NULL group is NULL; min_count keeps the Cython path
    out["sum_v"] = gb["sum_v"].sum(min_count=1)["sum_v"]
    out["n"] = out["n"].astype("int64")
    return out[[key_col, "window_us", "n", "sum_v"]]


def sessionize(ds, ts_col: str, key_col: str, value_col: str,
               order_col: str, gap_s: int = 1800) -> pd.DataFrame:
    """Gap-based sessions per key: a new session starts when the gap to
    the previous event exceeds ``gap_s``. Returns per-session rows
    (key, session_id, n_events, sum_v, duration_s); session ids are
    0-based in (ts, order_col) order within each key. Runs on
    ``bucketed_by_key``: one keyed-bucket shuffle, then ONE vectorized
    session-boundary + Cython groupby-agg pass over all of a bucket's
    keys (no per-key Python)."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, order_col], kind="mergesort")
        # normalize to integer microseconds regardless of the datetime64
        # unit pandas chose (ns pre-2.0, us from arrow round-trips)
        ts = df[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        n = len(df)
        keych = np.ones(n, dtype=bool)
        if n > 1:
            kv = df[key_col].to_numpy()
            keych[1:] = kv[1:] != kv[:-1]
        gap = np.zeros(n, dtype=bool)
        if n > 1:
            gap[1:] = np.diff(ts) > gap_s * 1_000_000
        sid_glob = np.cumsum(keych | gap)     # global run id, all keys
        df = df.assign(__sid=sid_glob, __ts_us=ts)
        g = df.groupby([key_col, "__sid"], as_index=False, sort=False) \
            .agg(n_events=(order_col, "size"), sum_v=(value_col, "sum"),
                 t0=("__ts_us", "min"), t1=("__ts_us", "max"))
        # 0-based session id within each key (runs are key-contiguous)
        g["session_id"] = g["__sid"] - g.groupby(
            key_col, sort=False)["__sid"].transform("min")
        g["duration_us"] = (g["t1"] - g["t0"]).astype("int64")
        return g[[key_col, "session_id", "n_events", "sum_v",
                  "duration_us"]]

    cols = [key_col, ts_col, value_col, order_col]
    proj = ds.map_batches(lambda b, c=tuple(cols): b.select(list(c)),
                          batch_format="pyarrow", batch_size=None)
    out = bucketed_by_key(proj, key_col, per_bucket).to_pandas()
    out["session_id"] = out["session_id"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out.reset_index(drop=True)


def extract_json_int(ds, col: str, key: str, out_col: str):
    """Append ``out_col``: integer value of ``key`` in a flat JSON-object
    string column, via one vectorized regex kernel (null when absent)."""
    pattern = rf'"{key}"\s*:\s*(?P<v>-?\d+)'

    def fn(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(fill_utf8(batch.column(col)), pattern=pattern)
        vals = pc.struct_field(m, "v").cast(pa.int64())
        return batch.append_column(out_col, vals)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def extract_json_str(ds, col: str, key: str, out_col: str):
    """Append ``out_col``: string value of ``key`` in a flat JSON-object
    string column (simple values without escaped quotes), via one
    vectorized regex kernel — null when the key is absent. DuckDB
    ``json_extract_string`` parity for flat objects."""
    pattern = rf'"{key}"\s*:\s*"(?P<v>[^"\\]*)"'

    def fn(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(fill_utf8(batch.column(col)),
                             pattern=pattern)
        return batch.append_column(out_col, pc.struct_field(m, "v"))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def percent_rank_window(ds, key_col: str, value_col: str):
    """``PERCENT_RANK()`` and ``CUME_DIST()`` over ``value`` ASC per key
    (SQL tie semantics: percent_rank = (rank-1)/(n-1) with min-rank
    ties, cume_dist = peers-inclusive count / n). Same physical shape
    as ``rank_ntile``: one keyed-bucket shuffle, Cython groupby rank
    kernels across all of a bucket's keys at once (``bucketed_by_key``
    — no per-key Python). Returns a Dataset with ``prnk`` and ``cd``
    (float64) appended."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key_col, sort=False, dropna=False)[value_col]
        rmin = g.rank(method="min").to_numpy(np.float64)
        rmax = g.rank(method="max").to_numpy(np.float64)
        n = g.transform("size").to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            prnk = np.where(n > 1, (rmin - 1) / (n - 1), 0.0)
        return df.assign(prnk=prnk, cd=rmax / n)

    return bucketed_by_key(ds, key_col, per_bucket)


def stamp_bucket(batch: pa.Table, key_col: str, n: int) -> pa.Table:
    """Append the uniform key-hash bucket column ``__bkt`` =
    ``hash64(key) % n`` (int32) — the ONE definition of the engine's
    bucket assignment, shared by ``bucketed_by_key`` and every ad-hoc
    bucketed co-group (e.g. dedup's shingle join) so hashing/dtype/null
    behavior can never diverge between sites."""
    from ..state import hash64

    h = hash64(batch.column(key_col))
    return batch.append_column("__bkt", pa.array(
        (h % np.uint64(n)).astype(np.int32), pa.int32()))


def bucketed_by_key(ds, key_col: str, per_bucket,
                    n_buckets: int | None = None):
    """Run ``per_bucket(df)`` once per uniform key-hash BUCKET with every
    row of each key co-located — the scale shape for per-key sequence
    ops (window functions, interval chaining, LOCF). A per-KEY
    ``groupby(key).map_groups`` costs one Python call per key — at 10⁸
    keys that is 10⁸ interpreter round-trips; here the exchange is the
    same one keyed shuffle, but each bucket resolves ALL its keys in one
    call, so ``per_bucket`` can use pandas' Cython groupby kernels
    (shift / cumsum / ffill / rank are vectorized ACROSS groups).
    Buckets are uniform in key-hash, so Zipf skew costs one hot key per
    bucket (the same bound the per-key form has). Null keys form one
    group (SQL PARTITION BY semantics) — pass ``dropna=False`` to any
    pandas groupby inside ``per_bucket``."""
    n = n_buckets or shuffle_partitions()

    def bucketize(batch: pa.Table) -> pa.Table:
        return stamp_bucket(batch, key_col, n)

    def run(df: pd.DataFrame):
        out = per_bucket(df.drop(columns="__bkt"))
        # hand back a metadata-free Arrow table: pandas conversion embeds
        # a dict in the schema metadata, which makes every bucket's schema
        # distinct/unhashable to Ray's dedup ("Failed to hash the
        # schemas" reduce-worker warnings) and non-canonical downstream.
        # per_bucket may return an Arrow table directly when it needs
        # EXPLICIT types (an all-None object column would otherwise be
        # inferred as type null, giving buckets divergent schemas)
        if isinstance(out, pa.Table):
            return out.replace_schema_metadata(None)
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    return ds.map_batches(bucketize, batch_format="pyarrow",
                          batch_size=None) \
        .groupby("__bkt", num_partitions=n) \
        .map_groups(run, batch_format="pandas")


def cumulative_agg(ds, ts_col: str, key_col: str, value_col: str,
                   order_col: str):
    """SQL-window-function style running aggregates per key: for every
    event, the running ``sum(value)`` and 1-based row number over
    (ts, order_col) order within its key — ``SUM(...) OVER (PARTITION BY
    key ORDER BY ts, order)`` semantics.

    Inherently per-key sequential (each row depends on its
    predecessors): one keyed-bucket shuffle, then Cython groupby
    cumsum/cumcount across all of a bucket's keys at once
    (``bucketed_by_key`` — no per-key Python). Returns a Dataset with
    ``cum_v`` and ``rn`` appended."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, order_col], kind="mergesort")
        g = df.groupby(key_col, sort=False, dropna=False)
        return df.assign(cum_v=g[value_col].cumsum(),
                         rn=(g.cumcount() + 1).astype(np.int64))

    return bucketed_by_key(ds, key_col, per_bucket)


def rolling_agg(ds, ts_col: str, key_col: str, value_col: str,
                order_col: str, window: int = 4):
    """Row-based rolling aggregates per key: for every event, the sum and
    mean of ``value`` over the last ``window`` rows (including itself) in
    (ts, order_col) order within its key — ``SUM(...) OVER (PARTITION BY
    key ORDER BY ts, order ROWS BETWEEN window-1 PRECEDING AND CURRENT
    ROW)`` semantics.

    Same physical shape (and same Zipf-hot-key bound) as
    ``cumulative_agg``: one keyed-bucket shuffle, then ONE vectorized
    pass over all of a bucket's keys — a global ``sliding_window_view``
    over the key-contiguous sorted array for every full-window row
    (valid because a full window never crosses a key boundary when the
    row's within-key position >= window-1), Cython groupby
    cumsum/cummin/cummax for each key's expanding head. Each full
    window is summed FRESH from its ``window`` values, not via cumsum
    differencing, so floating-point error stays O(window * eps) per
    row instead of accumulating over the group. Returns a Dataset with
    ``roll_sum``, ``roll_avg``, ``roll_min`` and ``roll_max`` appended
    (min/max over the same frame — MIN/MAX OVER w)."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, order_col], kind="mergesort")
        v = df[value_col].to_numpy(dtype=np.float64)
        n = v.size
        g = df.groupby(key_col, sort=False, dropna=False)
        pos = g.cumcount().to_numpy(np.int64)
        head = np.minimum(pos + 1, window).astype(np.float64)
        full = pos >= window - 1                 # window fits in the key
        sums = g[value_col].cumsum().to_numpy(np.float64)
        mins = g[value_col].cummin().to_numpy(np.float64)
        maxs = g[value_col].cummax().to_numpy(np.float64)
        if n >= window and full.any():
            sw = np.lib.stride_tricks.sliding_window_view(v, window)
            rows = np.flatnonzero(full)          # >= window-1 by def
            sums[rows] = sw[rows - (window - 1)].sum(axis=1)
            mins[rows] = sw[rows - (window - 1)].min(axis=1)
            maxs[rows] = sw[rows - (window - 1)].max(axis=1)
        return df.assign(roll_sum=sums, roll_avg=sums / head,
                         roll_min=mins, roll_max=maxs)

    return bucketed_by_key(ds, key_col, per_bucket)


def time_rolling_agg(ds, ts_col: str, key_col: str, value_col: str,
                     span_s: int = 300):
    """Time-RANGE rolling aggregates per key: for every event, the sum
    and row count of ``value`` over the trailing ``span_s`` seconds —
    ``SUM(...) OVER (PARTITION BY key ORDER BY ts RANGE BETWEEN
    INTERVAL span_s SECOND PRECEDING AND CURRENT ROW)`` semantics,
    including RANGE's peer rule (rows tied on ``ts`` all see the full
    peer group, both boundaries inclusive).

    Same physical shape (and same Zipf-hot-key bound) as
    ``cumulative_agg``: one uniform key-hash BUCKET shuffle
    (``bucketed_by_key``, NOT one Python call per key), then inside each
    bucket a per-key-SEGMENT loop — one global cumsum plus two
    ``searchsorted`` calls per key find each row's window
    [first ts >= t - span, last peer of t] and a prefix-sum difference
    evaluates it — O(n log n) per bucket, no per-row Python, no per-key
    Ray round-trip (the ``pit_window_join`` segment pattern,
    asof.py). Returns a Dataset with ``tsum`` (float64) and ``tcnt``
    (int64) appended."""
    if span_s < 0:
        raise ValueError(f"span_s must be >= 0, got {span_s}")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # factorize gives null keys one code (SQL PARTITION BY: nulls
        # form a single peer partition, matching the old per-key form)
        codes, _ = pd.factorize(df[key_col], use_na_sentinel=False)
        t_all = df[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        order = np.lexsort((t_all, codes))
        df = df.iloc[order]
        codes = codes[order]
        t = t_all[order]
        v = df[value_col].to_numpy(dtype=np.float64)
        n = len(df)
        span = np.int64(span_s) * 1_000_000
        tsum = np.empty(n, np.float64)
        tcnt = np.empty(n, np.int64)
        if n:
            change = np.empty(n, bool)
            change[0] = True
            change[1:] = codes[1:] != codes[:-1]
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], n)
            cv = np.concatenate(([0.0], np.cumsum(v)))
            for s, e in zip(starts, ends):
                tt = t[s:e]
                lo = s + np.searchsorted(tt, tt - span, side="left")
                hi = s + np.searchsorted(tt, tt, side="right")
                tsum[s:e] = cv[hi] - cv[lo]
                tcnt[s:e] = hi - lo
        return df.assign(tsum=tsum, tcnt=tcnt)

    return bucketed_by_key(ds, key_col, per_bucket)


def rank_ntile(ds, key_col: str, value_col: str, order_col: str,
               tiles: int = 4):
    """Ranking window functions per key: ``RANK()`` and ``DENSE_RANK()``
    over ``value DESC`` (SQL tie semantics — equal values share a rank,
    RANK leaves gaps, DENSE_RANK doesn't) plus ``NTILE(tiles)`` over the
    deterministic total order (value DESC, order_col ASC) — SQL NTILE
    bucket sizing: the first ``n_rows % tiles`` buckets get one extra row.

    Same physical shape (and same Zipf-hot-key bound) as
    ``cumulative_agg``: one keyed-bucket shuffle, then Cython groupby
    rank kernels + a vectorized NTILE formula over all of a bucket's
    keys at once (``bucketed_by_key`` — no per-key Python). Returns a
    Dataset with ``rnk``, ``drnk``, ``ntl`` appended (all int64)."""
    if tiles < 1:
        raise ValueError(f"tiles must be >= 1, got {tiles}")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)     # unique labels for the remap
        g = df.groupby(key_col, sort=False, dropna=False)
        rnk = g[value_col].rank(method="min", ascending=False) \
            .to_numpy(np.int64)
        drnk = g[value_col].rank(method="dense", ascending=False) \
            .to_numpy(np.int64)
        # NTILE over (value DESC, order ASC): 0-based row number within
        # key from Cython cumcount on the sorted frame, mapped back
        srt = df.sort_values([key_col, value_col, order_col],
                             ascending=[True, False, True],
                             kind="mergesort")
        pos = srt.groupby(key_col, sort=False, dropna=False).cumcount() \
            .to_numpy(np.int64)
        n = srt.groupby(key_col, sort=False,
                        dropna=False)[value_col].transform("size") \
            .to_numpy(np.int64)
        q, r = n // tiles, n % tiles
        cutoff = r * (q + 1)
        ntl = np.where(pos < cutoff,
                       pos // np.maximum(q + 1, 1),
                       r + (pos - cutoff) // np.maximum(q, 1)) + 1
        ntl_ser = pd.Series(ntl, index=srt.index).reindex(df.index)
        return df.assign(rnk=rnk, drnk=drnk,
                         ntl=ntl_ser.to_numpy(np.int64))

    return bucketed_by_key(ds, key_col, per_bucket)


def first_last_value(ds, ts_col: str, key_col: str, value_col: str,
                     order_col: str):
    """``FIRST_VALUE(value)`` / ``LAST_VALUE(value)`` over the whole
    partition per key in (ts, order_col) order — LAST_VALUE with the
    ``ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING`` frame
    (the one people actually want, not SQL's current-row default).

    Same physical shape as ``cumulative_agg``: one keyed-bucket
    shuffle, then one vectorized segment pass over all of a bucket's
    keys (sorted key-contiguous, so each key's first/last row is a
    segment boundary — positional, NOT null-skipping like pandas
    transform('first')). Returns a Dataset with ``fv`` and ``lv``
    appended."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, order_col], kind="mergesort")
        n = len(df)
        if n == 0:
            return df.assign(fv=df[value_col], lv=df[value_col])
        kv = df[key_col].to_numpy()
        change = np.empty(n, bool)
        change[0] = True
        change[1:] = kv[1:] != kv[:-1]
        seg_id = np.cumsum(change) - 1
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n) - 1
        v = df[value_col].to_numpy()
        return df.assign(fv=v[starts[seg_id]], lv=v[ends[seg_id]])

    return bucketed_by_key(ds, key_col, per_bucket)


def lag_lead(ds, ts_col: str, key_col: str, value_col: str,
             order_col: str, offset: int = 1):
    """``LAG(value, offset)`` / ``LEAD(value, offset)`` per key over
    (ts, order_col) order — null at the partition edges, SQL window
    semantics. Same physical shape as ``cumulative_agg``: one keyed-
    bucket shuffle, Cython groupby shift across all of a bucket's keys
    at once (``bucketed_by_key`` — no per-key Python). Also emits
    ``delta_prev`` (value - lag, null on the first ``offset`` rows),
    the common change-over-previous-event feature. Returns a Dataset
    with ``lag_v``, ``lead_v``, ``delta_prev`` appended."""
    if offset < 1:
        raise ValueError(f"offset must be >= 1, got {offset}")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, order_col], kind="mergesort")
        g = df.groupby(key_col, sort=False, dropna=False)[value_col]
        lag = g.shift(offset).astype(np.float64)
        lead = g.shift(-offset).astype(np.float64)
        return df.assign(lag_v=lag, lead_v=lead,
                         delta_prev=df[value_col] - lag)

    return bucketed_by_key(ds, key_col, per_bucket)


def fill_time_gaps(win: pd.DataFrame, key_col: str,
                   window_col: str = "window_start", width_s: int = 3600,
                   fill: dict | None = None) -> pd.DataFrame:
    """Densify a tumbling-window table: for every key, emit one row per
    ``width_s`` bucket from its first to its last observed window,
    inserting the missing buckets (SQL ``generate_series`` + LEFT JOIN)
    with ``fill``-dict values (e.g. ``{"n": 0, "sum_v": 0.0}``) —
    time-series models and monitors need the empty hours to exist, not
    be silently absent.

    Operates on the DRIVER-side window table (already a combiner
    output, |keys x buckets| rows — small by construction): the expand
    is one vectorized repeat/arange, no per-key Python loop. Rows with
    a NULL key are passed through untouched (SQL generate_series over a
    NULL span yields nothing). For key x bucket domains too big for the
    driver, run the same logic inside ``groupby(key).map_groups``."""
    step = width_s * 1_000_000
    us = pd.to_datetime(win[window_col]).astype("datetime64[us]") \
        .astype("int64")
    work = win.assign(__us=us)
    nullk = work[work[key_col].isna()]
    work = work[work[key_col].notna()]
    if not len(work):
        return win
    g = work.groupby(key_col)["__us"].agg(["min", "max"])
    counts = ((g["max"] - g["min"]) // step + 1).to_numpy(np.int64)
    total = int(counts.sum())
    idx = np.arange(total, dtype=np.int64)
    start_pos = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = idx - np.repeat(start_pos, counts)
    dense = pd.DataFrame({
        key_col: np.repeat(g.index.to_numpy(), counts),
        "__us": np.repeat(g["min"].to_numpy(np.int64), counts)
        + within * step})
    out = dense.merge(work.drop(columns=[window_col]),
                      on=[key_col, "__us"], how="left")
    out[window_col] = pd.to_datetime(out.pop("__us"), unit="us")
    for c, v in (fill or {}).items():
        out[c] = out[c].fillna(v)
    if len(nullk):
        out = pd.concat([out, nullk.drop(columns="__us")],
                        ignore_index=True)
    cols = [key_col, window_col] + [c for c in win.columns
                                    if c not in (key_col, window_col)]
    return out[cols].sort_values([key_col, window_col]) \
        .reset_index(drop=True)


def funnel_steps(ds, ts_col: str, key_col: str, type_col: str,
                 order_col: str, steps: list[str]) -> pd.DataFrame:
    """Ordered-funnel (sequential-pattern) completion per key: the
    greedy earliest completion of ``steps`` — step 1 matches the key's
    earliest event of type steps[0]; step k matches the earliest event
    of type steps[k-1] STRICTLY after step k-1's match. Emits one row
    per key holding ``steps`` completed (0..len(steps)) and each
    completed step's timestamp as epoch microseconds (None beyond the
    last completed step).

    Scale shape: prune first — only events whose type is IN ``steps``
    ever leave the read (for a 3-step funnel over a 50-type event
    stream that is a ~94% row cut before the shuffle) — then one
    keyed-bucket shuffle and, per bucket, len(steps) VECTORIZED rounds:
    each round is one filtered Cython groupby-min ("earliest event of
    this type strictly after the key's previous step match") over all
    of the bucket's keys at once — no per-key Python (same
    partitioning contract as ``sessionize``: one key's step events fit
    one bucket). Keys with step-type events but an incomplete prefix
    still emit (steps=0..k)."""
    want = set(steps)

    def prune(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b.column(type_col),
                        value_set=pa.array(sorted(want), pa.string()))
        return b.select([key_col, ts_col, type_col, order_col]).filter(keep)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ts = df[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        work = pd.DataFrame({key_col: df[key_col].to_numpy(),
                             "__ts": ts,
                             "__ty": df[type_col].to_numpy()})
        out = work[[key_col]].drop_duplicates().reset_index(drop=True)
        prev = None                    # Series: key -> ts of prior step
        done = np.zeros(len(out), dtype=np.int64)
        for i, s in enumerate(steps):
            sub = work[work["__ty"] == s]
            if prev is not None:
                p = sub[key_col].map(prev)
                sub = sub[p.notna() & (sub["__ts"] > p)]
            cur = sub.groupby(key_col, sort=False)["__ts"].min()
            hit = out[key_col].map(cur)
            out[f"ts{i + 1}_us"] = hit.astype("Int64")
            done += hit.notna().to_numpy() & (done == i)
            prev = cur
        out.insert(1, "steps", done)
        return out

    out = bucketed_by_key(
        ds.map_batches(prune, batch_format="pyarrow", batch_size=None),
        key_col, per_bucket).to_pandas()
    if out.empty:     # Ray drops columns on empty map_groups output
        out = pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                            "steps": pd.Series([], dtype="int64")} |
                           {f"ts{i + 1}_us": pd.Series([], dtype="Int64")
                            for i in range(len(steps))})
        return out
    out["steps"] = out["steps"].astype("int64")
    for i in range(len(steps)):
        out[f"ts{i + 1}_us"] = out[f"ts{i + 1}_us"].astype("Int64")
    return out.sort_values(key_col).reset_index(drop=True)


def interval_overlap_pairs(ds, key_col: str, id_col: str,
                           start_col: str, end_col: str) -> pd.DataFrame:
    """Interval overlap self-join within each key: all pairs of rows
    (a, b) with ``a.id < b.id`` whose half-open intervals
    [start, end) strictly overlap (``a.start < b.end AND b.start <
    a.end``), plus the overlap length. Start/end are int64 (e.g. epoch
    microseconds). The SQL equivalent is the quadratic inequality
    self-join; here each key group is sorted by start once and swept —
    emitted work is proportional to the ACTUAL number of overlapping
    pairs, not |group|².

    Scale shape: a narrow (key, id, start, end) projection hash-
    partitions by key; per group one sort + one vectorized
    searchsorted sweep. Output size is data-dependent (dense overlap
    within a hot key is inherently quadratic in overlap degree — salt
    such keys by time bucket first)."""

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([start_col, id_col], kind="mergesort")
        s = df[start_col].to_numpy(np.int64)
        e = df[end_col].to_numpy(np.int64)
        ids = df[id_col].to_numpy(np.int64)
        n = len(df)
        # sorted by start: b>a (position) overlaps a iff s[b] < e[a]
        hi = np.searchsorted(s, e, side="left")
        counts = np.maximum(hi - np.arange(n) - 1, 0)
        total = int(counts.sum())
        empty = pd.DataFrame({key_col: pd.Series([], dtype=df[key_col].dtype),
                              "id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64"),
                              "overlap_us": pd.Series([], dtype="int64")})
        if total == 0:
            return empty
        a = np.repeat(np.arange(n), counts)
        off = np.cumsum(counts) - counts
        b = np.arange(total) - np.repeat(off, counts) + a + 1
        ia, ib = ids[a], ids[b]
        lo, hib = np.minimum(ia, ib), np.maximum(ia, ib)
        return pd.DataFrame({
            key_col: df[key_col].iloc[0],
            "id_a": lo.astype("int64"), "id_b": hib.astype("int64"),
            "overlap_us": (np.minimum(e[a], e[b]) - s[b]).astype("int64"),
        })

    out = (ds.map_batches(
        lambda t, c=(key_col, id_col, start_col, end_col): t.select(list(c)),
        batch_format="pyarrow", batch_size=None)
        .groupby(key_col, num_partitions=shuffle_partitions())
        .map_groups(per_key, batch_format="pandas")
        .to_pandas())
    if out.empty:
        out = pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                            "id_a": pd.Series([], dtype="int64"),
                            "id_b": pd.Series([], dtype="int64"),
                            "overlap_us": pd.Series([], dtype="int64")})
    return out.sort_values([key_col, "id_a", "id_b"]).reset_index(drop=True)


def cohort_retention(ds, ts_col: str, key_col: str) -> pd.DataFrame:
    """Cohort retention matrix: keys are cohorted by the ISO week of
    their first event; for each (cohort week, week offset) the number
    of distinct keys active in that week. The classic product-analytics
    rollup, and a template for any first-touch cohort metric.

    Scale shape: ONE keyed-bucket shuffle of a narrow (key, ts)
    projection — each BUCKET dedupes (key, week) pairs with one
    vectorized drop_duplicates and resolves every key's cohort with
    one Cython groupby-min (no per-key Python; the emitted rows per
    key = its distinct active weeks), then one tiny keyed count over
    (cohort, offset) rows. No join, no count-distinct shuffle:
    distinctness per key is resolved inside the bucket. Cohort weeks
    surface as epoch microseconds of the week start (Monday), matching
    SQL date_trunc('week')."""
    _US_PER_DAY = 86_400_000_000

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ts = df[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        day = ts // _US_PER_DAY
        week_start = day - (day + 3) % 7      # 1970-01-01 was a Thursday
        w = pd.DataFrame({key_col: df[key_col].to_numpy(),
                          "wk": week_start}).drop_duplicates()
        cohort = w.groupby(key_col, sort=False,
                           dropna=False)["wk"].transform("min") \
            .to_numpy(np.int64)
        return pd.DataFrame({
            "cohort_us": cohort * _US_PER_DAY,
            "offset_w": (w["wk"].to_numpy(np.int64) - cohort) // 7,
        })

    proj = ds.map_batches(
        lambda t, c=(key_col, ts_col): t.select(list(c)),
        batch_format="pyarrow", batch_size=None)
    pairs = bucketed_by_key(proj, key_col, per_bucket)
    out = pairs.groupby(["cohort_us", "offset_w"],
                        num_partitions=shuffle_partitions()).count() \
        .to_pandas().rename(columns={"count()": "n_keys"})
    if out.empty:
        out = pd.DataFrame({c: pd.Series([], dtype="int64")
                            for c in ("cohort_us", "offset_w", "n_keys")})
    for c in ("cohort_us", "offset_w", "n_keys"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["cohort_us", "offset_w"]).reset_index(drop=True)


def event_transitions(ds, ts_col: str, key_col: str, type_col: str,
                      order_col: str) -> pd.DataFrame:
    """First-order Markov transition counts: for each key's events in
    (ts, order) sequence, count every consecutive (from_type, to_type)
    pair across the whole stream — the sequence-analysis staple behind
    next-event prediction and funnel discovery.

    Scale shape: one keyed-bucket shuffle of the narrow (key, ts, type,
    order) projection; each BUCKET sorts key-contiguously and counts
    its consecutive pairs (masking key boundaries) with one Cython
    groupby — at most |types|² rows out per bucket — then one tiny
    keyed sum over type pairs. Returns (from_type, to_type, n)
    sorted."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, order_col], kind="mergesort")
        ty = df[type_col].to_numpy()
        kv = df[key_col].to_numpy()
        if len(ty) < 2:
            return pd.DataFrame({"from_type": pd.Series([], dtype=object),
                                 "to_type": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        same = kv[1:] == kv[:-1]                # pair stays within a key
        pairs = pd.DataFrame({"from_type": ty[:-1][same],
                              "to_type": ty[1:][same]})
        g = pairs.groupby(["from_type", "to_type"], as_index=False,
                          dropna=False).size().rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return g

    proj = ds.map_batches(
        lambda t, c=(key_col, ts_col, type_col, order_col): t.select(list(c)),
        batch_format="pyarrow", batch_size=None)
    parts = bucketed_by_key(proj, key_col, per_bucket)
    out = parts.groupby(["from_type", "to_type"],
                        num_partitions=shuffle_partitions()).sum("n") \
        .to_pandas().rename(columns={"sum(n)": "n"})
    if out.empty:
        out = pd.DataFrame({"from_type": pd.Series([], dtype=object),
                            "to_type": pd.Series([], dtype=object),
                            "n": pd.Series([], dtype="int64")})
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["from_type", "to_type"]).reset_index(drop=True)


def markov_kstep(trans: pd.DataFrame, steps: int = 15, *,
                 from_col: str = "from_type", to_col: str = "to_type",
                 n_col: str = "n") -> pd.DataFrame:
    """k-step occupancy distribution of the first-order Markov chain
    defined by a (from, to, count) transition table — "where is a user
    k events after a uniform start", the long-run behavior-mix
    summary on top of ``event_transitions``. Rows are normalized to
    probabilities; DANGLING states (observed only as targets, no
    outgoing transitions) redistribute their mass uniformly over all
    states each step (the pagerank convention), so the distribution
    stays a distribution.

    Deliberately a DRIVER function: the distributed work is the
    transitions combiner that produced ``trans`` (at most |types|²
    rows, independent of stream length); the chain math is a
    |types|-sized matrix-vector loop. Returns (state, prob) sorted by
    state."""
    if trans.empty:
        return pd.DataFrame({"state": pd.Series([], dtype=object),
                             "prob": pd.Series([], dtype="float64")})
    states = np.unique(np.concatenate([
        trans[from_col].to_numpy(), trans[to_col].to_numpy()]))
    m = len(states)
    fi = np.searchsorted(states, trans[from_col].to_numpy())
    ti = np.searchsorted(states, trans[to_col].to_numpy())
    w = trans[n_col].to_numpy(np.float64)
    P = np.zeros((m, m))
    np.add.at(P, (fi, ti), w)
    outdeg = P.sum(axis=1)
    dangling = outdeg == 0
    Pn = P / np.where(dangling, 1.0, outdeg)[:, None]
    pi = np.full(m, 1.0 / m)
    for _ in range(steps):
        # dangling rows of Pn are all-zero, so `pi @ Pn` drops their
        # mass; the uniform d_mass/m term restores it
        d_mass = float(pi[dangling].sum())
        pi = pi @ Pn + d_mass / m
    return pd.DataFrame({"state": states, "prob": pi}) \
        .sort_values("state").reset_index(drop=True)


def ewma_per_key(ds, ts_col: str, key_col: str, value_col: str,
                 order_col: str, alpha: float = 0.3) -> pd.DataFrame:
    """Exponentially weighted moving average of ``value_col`` per key
    in (ts, order) sequence — the recursive smoother
    ``y_t = α·x_t + (1-α)·y_{t-1}`` behind rate/latency trend features.
    Inherently sequential per key (like sessionize), and NOT
    SQL-expressible (the recursion has no window-function form), so
    correctness is pinned by exact pandas ``ewm`` goldens instead of a
    DuckDB oracle.

    Scale shape: one keyed-bucket shuffle of the narrow projection,
    then ONE grouped-Cython ``ewm`` pass over all of a bucket's keys at
    once (pandas ``GroupBy.ewm`` — the recursion runs in C per group,
    no per-key Python). Returns (order_col, key, value, ewma) with
    ewma rounded to 6."""
    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, order_col],
                            kind="mergesort").reset_index(drop=True)
        e = df.groupby(key_col, sort=False,
                       dropna=False)[value_col] \
            .ewm(alpha=alpha, adjust=False).mean() \
            .reset_index(drop=True)
        out = df[[order_col, key_col, value_col]].copy()
        out["ewma"] = np.round(e.to_numpy(np.float64), 6)
        return out

    cols = [key_col, ts_col, value_col, order_col]
    proj = ds.map_batches(lambda b, c=tuple(cols): b.select(list(c)),
                          batch_format="pyarrow", batch_size=None)
    out = bucketed_by_key(proj, key_col, per_bucket).to_pandas()
    if out.empty:
        out = pd.DataFrame({order_col: pd.Series([], dtype="int64"),
                            key_col: pd.Series([], dtype="int64"),
                            value_col: pd.Series([], dtype="float64"),
                            "ewma": pd.Series([], dtype="float64")})
    return out.sort_values(order_col).reset_index(drop=True)


def interarrival_stats(ds, ts_col: str, key_col: str,
                       order_col: str) -> pd.DataFrame:
    """Per-key inter-arrival gap statistics — count, mean, median and
    max of the gaps between consecutive events — the diagnostic that
    picks a sessionization ``gap_s`` and flags burst/idle keys. Keys
    with fewer than two events emit no row (no gap is defined).

    Scale shape: one keyed-bucket shuffle of the (key, ts, order)
    projection, then one pass over all of a bucket's keys — Cython
    groupby diff for the gaps, Cython groupby agg
    (size/mean/median/max) for the stats; no per-key Python."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, order_col], kind="mergesort")
        ts = df[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        gaps = pd.Series(ts).groupby(
            df[key_col].to_numpy(), sort=False).diff()
        work = pd.DataFrame({key_col: df[key_col].to_numpy(),
                             "g": gaps.to_numpy(np.float64)}) \
            .dropna(subset=["g"])          # first row of each key
        if work.empty:
            return pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                                 "n_gaps": pd.Series([], dtype="int64"),
                                 "mean_gap_s": pd.Series([], dtype="float64"),
                                 "p50_gap_s": pd.Series([], dtype="float64"),
                                 "max_gap_us": pd.Series([], dtype="int64")})
        g = work.groupby(key_col, as_index=False, sort=False,
                         dropna=False).agg(
            n_gaps=("g", "size"), mean_g=("g", "mean"),
            p50_g=("g", "median"), max_g=("g", "max"))
        r6 = lambda x: np.floor(x * 1e6 + 0.5) / 1e6   # half-away (g >= 0)
        return pd.DataFrame({
            key_col: g[key_col],
            "n_gaps": g["n_gaps"].astype("int64"),
            "mean_gap_s": r6(g["mean_g"].to_numpy() / 1e6),
            "p50_gap_s": r6(g["p50_g"].to_numpy() / 1e6),
            "max_gap_us": g["max_g"].astype("int64"),
        })

    cols = [key_col, ts_col, order_col]
    proj = ds.map_batches(lambda b, c=tuple(cols): b.select(list(c)),
                          batch_format="pyarrow", batch_size=None)
    out = bucketed_by_key(proj, key_col, per_bucket).to_pandas()
    if out.empty:
        out = pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                            "n_gaps": pd.Series([], dtype="int64"),
                            "mean_gap_s": pd.Series([], dtype="float64"),
                            "p50_gap_s": pd.Series([], dtype="float64"),
                            "max_gap_us": pd.Series([], dtype="int64")})
    return out.sort_values(key_col).reset_index(drop=True)


def rate_anomalies(ds, ts_col: str, key_col: str, width_s: int = 3600,
                   alpha: float = 0.3, factor: float = 3.0,
                   min_count: int = 5) -> pd.DataFrame:
    """Per-key event-rate spike detection: bucket events into tumbling
    windows, smooth each key's PRIOR window counts with an EWMA, and
    flag windows whose count exceeds ``factor`` x the trailing baseline
    (and ``min_count``, so cold keys don't alert on noise) — the
    streaming-monitoring composite behind abuse/burst detection.

    Scale shape: the window counts come from the tumbling combiner
    (one row per (key, window) per block — raw events never shuffle),
    then ONE keyed pass over that dimension-sized table computes the
    recursive baseline per key. Returns every flagged window
    (key, window_us, n, baseline) with baseline rounded to 6; a key's
    first window is never flagged (no baseline exists yet)."""
    width_us = width_s * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = (ts // width_us) * width_us
        t = pa.table({key_col: batch.column(key_col),
                      "window_us": pa.array(win, pa.int64())})
        g = t.group_by([key_col, "window_us"]).aggregate([([], "count_all")])
        return pa.table({key_col: g.column(key_col),
                         "window_us": g.column("window_us"),
                         "n": g.column("count_all").cast(pa.int64())})

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("window_us", as_index=False)["n"].sum() \
            .sort_values("window_us")
        n = g["n"].to_numpy(np.float64)
        base = pd.Series(n).ewm(alpha=alpha, adjust=False).mean() \
            .shift(1).to_numpy(np.float64)     # trailing: prior windows only
        flag = (~np.isnan(base)) & (n > factor * base) & (n >= min_count)
        if not flag.any():
            return pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                                 "window_us": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64"),
                                 "baseline": pd.Series([], dtype="float64")})
        sel = np.flatnonzero(flag)
        return pd.DataFrame({
            key_col: df[key_col].iloc[0],
            "window_us": g["window_us"].to_numpy(np.int64)[sel],
            "n": n[sel].astype(np.int64),
            "baseline": np.round(base[sel], 6),
        })

    out = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
           .groupby(key_col, num_partitions=shuffle_partitions())
           .map_groups(per_key, batch_format="pandas")
           .to_pandas())
    if out.empty:
        out = pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                            "window_us": pd.Series([], dtype="int64"),
                            "n": pd.Series([], dtype="int64"),
                            "baseline": pd.Series([], dtype="float64")})
    return out.sort_values([key_col, "window_us"]).reset_index(drop=True)


def windowed_distinct(ds, ts_col: str, key_col: str, val_col: str,
                      hours: int = 1):
    """Tumbling-window distinct counting: per (window, key) the number
    of DISTINCT ``val_col`` values plus the raw event count — the
    "unique users per hour per event type" shape that plain windowed
    aggregation (``tumbling_window_agg``) cannot produce, because
    distinctness does not combine without a dedup exchange.

    Scale shape: each block first collapses to its distinct (window,
    key, val) triples with a local event count — the dedup combiner —
    then ONE keyed shuffle over those triples (Ray's native vectorized
    sort-based aggregate, no per-group Python) makes them globally
    unique while summing the counts, and a per-block partial rollup to
    (window, key) leaves only tiny partials for the driver merge.
    Rows with a NULL timestamp or key are excluded; a NULL val counts
    as one distinct value (SQL ``count(DISTINCT)`` EXcludes nulls, so
    nulls are dropped from the distinct count but kept in n_events).
    Returns a DataFrame (window, key, n_distinct, n_events)."""
    from ray.data.aggregate import Sum

    from ..tuning import shuffle_partitions

    span = np.int64(hours) * 3_600_000_000

    def dedup_partial(batch: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(batch.column(ts_col)),
                     pc.is_valid(batch.column(key_col)))
        t = batch.select([ts_col, key_col, val_col]).filter(ok)
        us = t.column(ts_col).cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = (us // span) * span
        t = pa.table({"window": pa.array(win).cast(pa.timestamp("us")),
                      key_col: t.column(key_col),
                      val_col: t.column(val_col)})
        g = t.group_by(["window", key_col, val_col]).aggregate(
            [([], "count_all")])
        return pa.table({"window": g.column("window"),
                         key_col: g.column(key_col),
                         val_col: g.column(val_col),
                         "cnt": g.column("count_all").cast(pa.int64())})

    triples = ds.map_batches(dedup_partial, batch_format="pyarrow",
                             batch_size=None) \
        .groupby(["window", key_col, val_col],
                 num_partitions=shuffle_partitions()) \
        .aggregate(Sum("cnt", alias_name="cnt"))

    def rollup(b: pa.Table) -> pa.Table:
        valid_val = pc.is_valid(b.column(val_col))
        d = pc.cast(valid_val, pa.int64())
        t = pa.table({"window": b.column("window"),
                      key_col: b.column(key_col),
                      "d": d, "cnt": b.column("cnt")})
        g = t.group_by(["window", key_col]).aggregate(
            [("d", "sum"), ("cnt", "sum")])
        return pa.table({"window": g.column("window"),
                         key_col: g.column(key_col),
                         "n_distinct": g.column("d_sum").cast(pa.int64()),
                         "n_events": g.column("cnt_sum").cast(pa.int64())})

    parts = triples.map_batches(rollup, batch_format="pyarrow",
                                batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({
            "window": pd.Series([], dtype="datetime64[us]"),
            key_col: pd.Series([], dtype=object),
            "n_distinct": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64")})
    out = parts.groupby(["window", key_col], as_index=False).agg(
        n_distinct=("n_distinct", "sum"), n_events=("n_events", "sum"))
    for c in ("n_distinct", "n_events"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["window", key_col]).reset_index(drop=True)


def runs_islands(ds, ts_col: str, key_col: str, type_col: str,
                 order_col: str) -> pd.DataFrame:
    """Gaps-and-islands run collapse: within each key's event stream in
    (ts, order) sequence, consecutive events with the SAME type form an
    island; summarize per (key, type) as number of islands and longest
    run — the state-run profile behind dwell analysis, bot detection
    (implausibly long same-action runs), and RLE-style compression
    diagnostics. NULL types compare equal to NULL (IS DISTINCT FROM
    semantics), forming their own islands.

    Scale shape: one keyed-bucket shuffle of the narrow (key, ts,
    type, order) projection; each BUCKET finds run breaks (key-change
    OR type-change) with one vectorized compare over all its keys and
    reduces runs with one Cython groupby — at most |types| rows per
    key out, no per-key Python. Returns
    (key, type, n_islands, max_run) sorted."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, order_col], kind="mergesort")
        ty = df[type_col].astype(object).where(df[type_col].notna(),
                                               "\0null").to_numpy()
        n = len(ty)
        if n == 0:
            return pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                                 type_col: pd.Series([], dtype=object),
                                 "n_islands": pd.Series([], dtype="int64"),
                                 "max_run": pd.Series([], dtype="int64")})
        kv = df[key_col].to_numpy()
        brk = np.empty(n, bool)
        brk[0] = True
        brk[1:] = (ty[1:] != ty[:-1]) | (kv[1:] != kv[:-1])
        starts = np.flatnonzero(brk)
        lens = np.diff(np.append(starts, n))
        runs = pd.DataFrame({key_col: kv[starts], type_col: ty[starts],
                             "len": lens})
        g = runs.groupby([key_col, type_col], as_index=False,
                         sort=False, dropna=False).agg(
            n_islands=("len", "size"), max_run=("len", "max"))
        g[type_col] = g[type_col].where(g[type_col] != "\0null", None)
        g["n_islands"] = g["n_islands"].astype("int64")
        g["max_run"] = g["max_run"].astype("int64")
        return g

    proj = ds.map_batches(
        lambda t, c=(key_col, ts_col, type_col, order_col): t.select(list(c)),
        batch_format="pyarrow", batch_size=None)
    out = bucketed_by_key(proj, key_col, per_bucket).to_pandas()
    if out.empty:
        out = pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                            type_col: pd.Series([], dtype=object),
                            "n_islands": pd.Series([], dtype="int64"),
                            "max_run": pd.Series([], dtype="int64")})
    return out.sort_values([key_col, type_col],
                           kind="mergesort").reset_index(drop=True)


def time_weighted_avg(ds, ts_col: str, key_col: str, value_col: str,
                      order_col: str) -> pd.DataFrame:
    """Time-weighted average per key (TWAP): each event's value holds
    until the next event, so the average weights every value by its
    holding duration — ``Σ vᵢ·(tᵢ₊₁−tᵢ) / Σ (tᵢ₊₁−tᵢ)`` over the
    (ts, order)-sorted stream — the metric behind fair price averaging
    and duration-weighted state summaries, where the plain mean
    over-counts burst periods. A NULL value drops its term from the
    numerator but its interval still elapses (SQL ``sum(v·dt)/sum(dt)``
    semantics); the last event has no interval. NULL result when the
    key has no interval with a non-NULL value or zero total duration.

    Scale shape: one keyed-bucket shuffle of the narrow (key, ts,
    value, order) projection; each BUCKET computes holding intervals
    with one masked diff and folds every key with one Cython groupby
    agg — |keys| rows out, no per-key Python. Returns
    (key, twap, duration_s, n_events) sorted."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, order_col], kind="mergesort")
        t = df[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        v = df[value_col].to_numpy(np.float64)
        n = len(df)
        if n == 0:
            return pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                                 "twap": pd.Series([], dtype="float64"),
                                 "duration_s": pd.Series([], dtype="float64"),
                                 "n_events": pd.Series([], dtype="int64")})
        kv = df[key_col].to_numpy()
        same = np.zeros(n, bool)                 # row i..i+1 within a key
        same[:-1] = kv[1:] == kv[:-1]
        dt = np.zeros(n, np.float64)
        dt[:-1] = (t[1:] - t[:-1]).astype(np.float64)
        dt[~same] = 0.0                          # last row of a key: no dt
        prod = np.where(np.isnan(v), 0.0, v) * dt
        okn = (~np.isnan(v) & same).astype(np.int64)  # holding, non-null
        work = pd.DataFrame({key_col: kv, "dt": dt, "prod": prod,
                             "okn": okn})
        g = work.groupby(key_col, as_index=False, sort=False,
                         dropna=False).agg(
            den=("dt", "sum"), num=("prod", "sum"), okn=("okn", "sum"),
            n_events=("dt", "size"))
        den = g["den"].to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            twap = np.where((den > 0) & (g["okn"].to_numpy() > 0),
                            g["num"].to_numpy() / den, np.nan)
        return pd.DataFrame({key_col: g[key_col], "twap": twap,
                             "duration_s": den / 1e6,
                             "n_events": g["n_events"].astype("int64")})

    proj = ds.map_batches(
        lambda t, c=(key_col, ts_col, value_col, order_col):
            t.select(list(c)),
        batch_format="pyarrow", batch_size=None)
    out = bucketed_by_key(proj, key_col, per_bucket).to_pandas()
    if out.empty:
        out = pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                            "twap": pd.Series([], dtype="float64"),
                            "duration_s": pd.Series([], dtype="float64"),
                            "n_events": pd.Series([], dtype="int64")})
    return out.sort_values(key_col, kind="mergesort").reset_index(drop=True)


def forward_fill(ds, ts_col: str, key_col: str, value_col: str,
                 order_col: str, out_col: str = "filled"):
    """Last-observation-carried-forward (LOCF) imputation per key: each
    NULL value takes the most recent non-NULL value earlier in the
    key's (ts, order)-sorted stream — the standard time-series gap fill
    (sensor dropouts, sparse snapshots); values before the first
    observation stay NULL. SQL ``last_value(v IGNORE NULLS) OVER
    (PARTITION BY key ORDER BY ts, order ROWS UNBOUNDED PRECEDING)``
    semantics.

    Scale shape: one keyed-bucket shuffle of the narrow projection,
    then one Cython groupby-ffill pass over all of a bucket's keys at
    once (``bucketed_by_key`` — no per-key Python); row count is
    preserved. Returns a Dataset of (key, order, ts, value, out_col)."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, order_col], kind="mergesort")
        out = df[[key_col, order_col, ts_col, value_col]].copy()
        out[out_col] = df.groupby(key_col, sort=False,
                                  dropna=False)[value_col].ffill()
        return out

    proj = ds.map_batches(
        lambda t, c=(key_col, order_col, ts_col, value_col):
            t.select(list(c)),
        batch_format="pyarrow", batch_size=None)
    return bucketed_by_key(proj, key_col, per_bucket)


def interpolate_missing(ds, ts_col: str, key_col: str, value_col: str,
                        order_col: str, out_col: str = "filled"):
    """Linear time interpolation of missing values per key: each NULL
    between two observations takes the time-weighted blend
    ``v₀ + (v₁−v₀)·(t−t₀)/(t₁−t₀)``; leading/trailing NULLs (no
    observation on one side) stay NULL — the gap fill that respects
    irregular sampling where LOCF (``forward_fill``) would hold stale
    values across long gaps.

    Scale shape: like ``forward_fill`` — one keyed-bucket shuffle of
    the narrow projection, then one searchsorted+blend per KEY SEGMENT
    inside each bucket (numpy slices in a light loop — microseconds per
    key vs one map_groups Python round-trip per key), row count
    preserved. Returns a Dataset of (key, order, ts, value, out_col)."""

    def _fill_segment(t: np.ndarray, v: np.ndarray) -> np.ndarray:
        out = v.copy()
        valid = np.flatnonzero(~np.isnan(v))
        if len(valid) >= 2:
            holes = np.flatnonzero(np.isnan(v))
            interior = holes[(holes > valid[0]) & (holes < valid[-1])]
            if len(interior):
                j = np.searchsorted(valid, interior)
                nxt, prv = valid[j], valid[j - 1]
                with np.errstate(invalid="ignore", divide="ignore"):
                    frac = (t[interior] - t[prv]) / (t[nxt] - t[prv])
                    out[interior] = v[prv] + (v[nxt] - v[prv]) * frac
        return out

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, order_col], kind="mergesort")
        t = df[ts_col].to_numpy("datetime64[us]").astype(np.int64) \
            .astype(np.float64)
        v = df[value_col].to_numpy(np.float64)
        out = v.copy()
        n = len(df)
        if n:
            kv = df[key_col].to_numpy()
            starts = np.flatnonzero(np.concatenate(
                [[True], kv[1:] != kv[:-1]]))
            ends = np.append(starts[1:], n)
            for s, e in zip(starts, ends):
                out[s:e] = _fill_segment(t[s:e], v[s:e])
        res = df[[key_col, order_col, ts_col, value_col]].copy()
        res[out_col] = out
        return res

    proj = ds.map_batches(
        lambda t, c=(key_col, order_col, ts_col, value_col):
            t.select(list(c)),
        batch_format="pyarrow", batch_size=None)
    return bucketed_by_key(proj, key_col, per_bucket)


def autocorr_per_key(ds, ts_col: str, key_col: str, value_col: str,
                     order_col: str) -> pd.DataFrame:
    """Lag-1 autocorrelation per key: Pearson correlation between each
    key's (ts, order)-sorted series and its one-step-lagged self — the
    serial-dependence diagnostic (near +1: trending/sticky metric,
    near 0: independent draws, negative: oscillation) behind
    bot-cadence and sensor-stuck detection. Pairs with a NULL on either
    side are excluded (SQL ``corr(v, lag(v))`` parity).

    Scale shape: one keyed-bucket shuffle of the narrow projection;
    each BUCKET forms the (v, lag v) pairs with one Cython groupby
    shift (masking key boundaries) and folds every key's six moments
    with one Cython groupby agg — |keys| rows out, no per-key Python.
    Returns (key, acf1, n_pairs) sorted; acf1 is NULL for fewer than
    two valid pairs or zero variance on either side."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, order_col], kind="mergesort")
        v = df[value_col].to_numpy(np.float64)
        lag = df.groupby(key_col, sort=False,
                         dropna=False)[value_col].shift(1) \
            .to_numpy(np.float64)
        ok = ~(np.isnan(v) | np.isnan(lag))
        x = np.where(ok, lag, 0.0)       # x = earlier value, y = later
        y = np.where(ok, v, 0.0)
        work = pd.DataFrame({key_col: df[key_col].to_numpy(),
                             "n": ok.astype(np.int64),
                             "sx": x, "sy": y, "sxx": x * x,
                             "syy": y * y, "sxy": x * y})
        # keep every key present (keys with zero pairs emit n=0 rows)
        g = work.groupby(key_col, as_index=False, sort=False,
                         dropna=False).sum()
        n = g["n"].to_numpy(np.float64)
        num = n * g["sxy"].to_numpy() - g["sx"].to_numpy() \
            * g["sy"].to_numpy()
        den2 = ((n * g["sxx"].to_numpy() - g["sx"].to_numpy() ** 2)
                * (n * g["syy"].to_numpy() - g["sy"].to_numpy() ** 2))
        with np.errstate(invalid="ignore", divide="ignore"):
            acf = np.where((n >= 2) & (den2 > 0),
                           num / np.sqrt(np.maximum(den2, 0)), np.nan)
        return pd.DataFrame({key_col: g[key_col], "acf1": acf,
                             "n_pairs": g["n"].astype("int64")})

    proj = ds.map_batches(
        lambda t, c=(key_col, ts_col, value_col, order_col):
            t.select(list(c)),
        batch_format="pyarrow", batch_size=None)
    out = bucketed_by_key(proj, key_col, per_bucket).to_pandas()
    if out.empty:
        out = pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                            "acf1": pd.Series([], dtype="float64"),
                            "n_pairs": pd.Series([], dtype="int64")})
    return out.sort_values(key_col, kind="mergesort").reset_index(drop=True)


def cumulative_distinct(ds, ts_col: str, key_col: str, type_col: str,
                        order_col: str, out_col: str = "cum_types"):
    """Running distinct count per key: for each event, how many
    DISTINCT types the key has produced up to and including it in
    (ts, order) sequence — the exploration/coverage curve behind
    feature-adoption and crawler-frontier analyses. SQL
    ``count(DISTINCT t) OVER (... ROWS UNBOUNDED PRECEDING)`` parity;
    NULL types do not count (SQL COUNT semantics).

    Scale shape: one keyed-bucket shuffle of the narrow projection,
    then one pass over all of a bucket's keys: (key, type)
    first-occurrence flags via vectorized duplicated(), running count
    via Cython groupby-cumsum — row count preserved, no per-key
    Python. Returns a Dataset of (key, order, out_col)."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, order_col], kind="mergesort")
        first = (~df.duplicated([key_col, type_col])) \
            & df[type_col].notna()
        out = df[[key_col, order_col]].copy()
        out[out_col] = first.astype(np.int64).groupby(
            df[key_col], sort=False, dropna=False).cumsum().to_numpy()
        return out

    proj = ds.map_batches(
        lambda t, c=(key_col, ts_col, type_col, order_col):
            t.select(list(c)),
        batch_format="pyarrow", batch_size=None)
    return bucketed_by_key(proj, key_col, per_bucket)


def cusum_per_key(ds, ts_col: str, key_col: str, value_col: str,
                  order_col: str) -> pd.DataFrame:
    """CUSUM change-point statistic per key: with the key's values in
    (ts, order) sequence and S_j = sum_{i<=j}(v_i - mean_key), report
    the excursion range max(S) - min(S) — near zero for a stable
    series, large when the level shifts mid-stream (classic
    Page-style drift screen over event values). NULL values are
    excluded before the fold (SQL avg/sum semantics).

    Scale shape: one keyed-bucket shuffle of the narrow projection,
    then Cython groupby cumsum/cumcount/agg over all of a bucket's
    keys at once — the sequential running sum per key is preserved
    bit-for-bit (groupby-cumsum accumulates left-to-right like the SQL
    window-sum construction of the same S_j series). Returns one row
    (key, cusum_range, n) per key."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[value_col].notna()]
        if df.empty:
            return pd.DataFrame({
                key_col: pd.Series([], dtype="int64"),
                "cusum_range": pd.Series([], dtype="float64"),
                "n": pd.Series([], dtype="int64")})
        df = df.sort_values([key_col, ts_col, order_col], kind="mergesort")
        g = df.groupby(key_col, sort=False, dropna=False)
        cs = g[value_col].cumsum().to_numpy(np.float64)
        j = (g.cumcount() + 1).to_numpy(np.float64)
        n = g[value_col].transform("size").to_numpy(np.float64)
        # key totals: last running sum of the key, broadcast back
        kv = df[key_col].to_numpy()
        last = np.empty(len(df), bool)
        last[-1] = True
        last[:-1] = kv[1:] != kv[:-1]
        change = np.empty(len(df), bool)
        change[0] = True
        change[1:] = kv[1:] != kv[:-1]
        seg_id = np.cumsum(change) - 1
        total = cs[np.flatnonzero(last)][seg_id]
        work = pd.DataFrame({key_col: kv, "s": cs - j * (total / n)})
        g2 = work.groupby(key_col, as_index=False, sort=False,
                          dropna=False).agg(
            mx=("s", "max"), mn=("s", "min"), n=("s", "size"))
        return pd.DataFrame({
            key_col: g2[key_col],
            "cusum_range": (g2["mx"] - g2["mn"]).to_numpy(np.float64),
            "n": g2["n"].astype("int64")})

    proj = ds.map_batches(
        lambda t, c=(key_col, ts_col, value_col, order_col):
            t.select(list(c)),
        batch_format="pyarrow", batch_size=None)
    out = bucketed_by_key(proj, key_col, per_bucket).to_pandas()
    if out.empty:
        return pd.DataFrame({key_col: pd.Series([], dtype="object"),
                             "cusum_range": pd.Series([], dtype="float64"),
                             "n": pd.Series([], dtype="int64")})
    return out.sort_values(key_col, kind="mergesort").reset_index(drop=True)


def rolling_quantile(ds, ts_col: str, key_col: str, value_col: str,
                     order_col: str, window: int = 5,
                     qs: tuple = (0.5,), out_cols: tuple = ("roll_med",)):
    """HOLISTIC rolling window per key: exact quantiles of ``value``
    over the last ``window`` rows (including the current one) in
    (ts, order) sequence — ``quantile_cont(q) OVER (... ROWS window-1
    PRECEDING)`` semantics with linear interpolation; NULLs inside a
    frame are skipped, an all-NULL frame yields NULL. The robust
    (outlier-immune) counterpart of ``rolling_agg``'s algebraic
    sum/mean/min/max.

    Scale shape: one keyed-bucket shuffle; each bucket runs pandas'
    grouped C sliding-quantile kernel over ALL its keys at once
    (``GroupBy.rolling`` — per-group cost O(n·log window), no per-key
    Python). Returns a Dataset of (key, order, *out_cols)."""
    if len(qs) != len(out_cols):
        raise ValueError("qs and out_cols must have equal length")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, order_col],
                            kind="mergesort").reset_index(drop=True)
        out = df[[key_col, order_col]].copy()
        roll = df.groupby(key_col, sort=False,
                          dropna=False)[value_col] \
            .rolling(window, min_periods=1)
        for q, c in zip(qs, out_cols):
            # grouped-rolling output is (key, row)-indexed in group
            # order == row order on the key-sorted frame
            out[c] = roll.quantile(q, interpolation="linear") \
                .reset_index(drop=True).to_numpy()
        return out

    proj = ds.map_batches(
        lambda t, c=(key_col, ts_col, value_col, order_col):
            t.select(list(c)),
        batch_format="pyarrow", batch_size=None)
    return bucketed_by_key(proj, key_col, per_bucket)


def ohlc_bars(ds, ts_col: str, key_col: str, value_col: str,
              id_col: str, width_s: int = 3600) -> pd.DataFrame:
    """Per (key, tumbling window) OHLC candlesticks: open = value at
    the earliest (ts, id), close = at the latest, high/low = max/min,
    n = event count — the classic time-series downsample (price bars,
    metric rollups) as a pure ALGEBRAIC combiner.

    open/close are selections, not sums, but they still combine: each
    block keeps its boundary rows (value + its (ts, id) rank tuple)
    per (key, window), and the merge picks the globally earliest/
    latest tuple — so the exchange carries one row per (key, window)
    per block and raw events never move. ``id_col`` makes the
    selection deterministic when timestamps tie. Returns
    (key, window_us, open, high, low, close, n) sorted."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pa.table({
            "k": batch.column(key_col),
            "ts": batch.column(ts_col).cast(pa.timestamp("us"))
                  .cast(pa.int64()),
            "i": batch.column(id_col).cast(pa.int64()),
            "v": batch.column(value_col).cast(pa.float64()),
        }).to_pandas()
        df["win"] = (df["ts"] // (width_s * 1_000_000)) \
            * (width_s * 1_000_000)
        df = df.sort_values(["ts", "i"], kind="mergesort")
        g = df.groupby(["k", "win"], as_index=False).agg(
            o_ts=("ts", "first"), o_i=("i", "first"), o_v=("v", "first"),
            c_ts=("ts", "last"), c_i=("i", "last"), c_v=("v", "last"),
            hi=("v", "max"), lo=("v", "min"), n=("v", "size"))
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                             "window_us": pd.Series([], dtype="int64"),
                             "open": [], "high": [], "low": [],
                             "close": [], "n": pd.Series([], dtype="int64")})
    first = parts.sort_values(["o_ts", "o_i"], kind="mergesort") \
        .groupby(["k", "win"], as_index=False) \
        .agg(open=("o_v", "first"))
    last = parts.sort_values(["c_ts", "c_i"], kind="mergesort") \
        .groupby(["k", "win"], as_index=False).agg(close=("c_v", "last"))
    rest = parts.groupby(["k", "win"], as_index=False).agg(
        high=("hi", "max"), low=("lo", "min"), n=("n", "sum"))
    out = rest.merge(first, on=["k", "win"]).merge(last, on=["k", "win"])
    out = out.rename(columns={"k": key_col, "win": "window_us"})
    out["n"] = out["n"].astype("int64")
    out["window_us"] = out["window_us"].astype("int64")
    out = out.sort_values([key_col, "window_us"]).reset_index(drop=True)
    return out[[key_col, "window_us", "open", "high", "low", "close", "n"]]


def holt_per_key(ds, ts_col: str, key_col: str, value_col: str,
                 order_col: str, alpha: float = 0.3,
                 beta: float = 0.1, horizon: int = 1) -> pd.DataFrame:
    """Holt's linear-trend (double exponential) smoothing per key in
    (ts, order) sequence — EWMA's big sibling: a level AND a trend
    recursion, so a steadily-growing series forecasts growth instead
    of lagging it.

        level_t = α·x_t + (1-α)·(level_{t-1} + trend_{t-1})
        trend_t = β·(level_t - level_{t-1}) + (1-β)·trend_{t-1}
        forecast_t = level_t + horizon·trend_t

    Initialization: level_0 = x_0, trend_0 = x_1 - x_0 (0 for
    single-row keys) — the standard Holt convention. Inherently
    sequential per key and not SQL-expressible (like ewma_per_key), so
    correctness is pinned by an exact reference-loop golden.

    Scale shape: one keyed shuffle of the narrow projection, then a
    tight per-key fold (the recursion is O(rows); the loop is pure
    numpy scalars per step — for million-row keys split by (key, day)
    upstream like sessionize documents). Returns
    (order_col, key, value, level, trend, forecast) rounded to 6."""
    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")
    if not 0 <= beta <= 1:
        raise ValueError("beta must be in [0, 1]")

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([ts_col, order_col], kind="mergesort")
        x = df[value_col].to_numpy(np.float64)
        n = x.size
        level = np.empty(n); trend = np.empty(n)
        lv = x[0]
        tr = (x[1] - x[0]) if n > 1 else 0.0
        level[0], trend[0] = lv, tr
        for i in range(1, n):
            prev = lv
            lv = alpha * x[i] + (1 - alpha) * (lv + tr)
            tr = beta * (lv - prev) + (1 - beta) * tr
            level[i], trend[i] = lv, tr
        out = df[[order_col, key_col, value_col]].copy()
        out["level"] = np.round(level, 6)
        out["trend"] = np.round(trend, 6)
        out["forecast"] = np.round(level + horizon * trend, 6)
        return out

    cols = [key_col, ts_col, value_col, order_col]
    out = (ds.map_batches(lambda b, c=tuple(cols): b.select(list(c)),
                          batch_format="pyarrow", batch_size=None)
           .groupby(key_col, num_partitions=shuffle_partitions())
           .map_groups(per_key, batch_format="pandas")
           .to_pandas())
    if out.empty:
        out = pd.DataFrame({order_col: pd.Series([], dtype="int64"),
                            key_col: pd.Series([], dtype="int64"),
                            value_col: pd.Series([], dtype="float64"),
                            "level": pd.Series([], dtype="float64"),
                            "trend": pd.Series([], dtype="float64"),
                            "forecast": pd.Series([], dtype="float64")})
    return out.sort_values(order_col).reset_index(drop=True)


def activity_streaks(ds, ts_col: str, key_col: str) -> pd.DataFrame:
    """Longest consecutive-DAY activity streak per key plus total
    distinct active days — the engagement/retention staple ("7-day
    streak"), the canonical gaps-and-islands application on dates.

    Scale shape: per-block distinct-(key, day) combiner (so the one
    keyed shuffle carries at most one row per key per day per block,
    never raw events), then a vectorized sorted-diff run-length pass
    per key group. Returns (key, n_days, max_streak) sorted by key."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            key_col: batch.column(key_col),
            "day": pc.cast(pc.floor_temporal(
                batch.column(ts_col).cast(pa.timestamp("us")),
                unit="day"), pa.timestamp("us")).cast(pa.int64()),
        })
        return t.group_by([key_col, "day"]).aggregate([])

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        days = np.unique(df["day"].to_numpy(np.int64)) // 86_400_000_000
        if days.size == 0:
            return pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                                 "n_days": pd.Series([], dtype="int64"),
                                 "max_streak": pd.Series([], dtype="int64")})
        breaks = np.flatnonzero(np.diff(days) != 1)
        starts = np.concatenate([[0], breaks + 1])
        ends = np.concatenate([breaks, [days.size - 1]])
        longest = int((ends - starts + 1).max())
        return pd.DataFrame({key_col: [df[key_col].iloc[0]],
                             "n_days": np.array([days.size], np.int64),
                             "max_streak": np.array([longest], np.int64)})

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby(key_col, num_partitions=shuffle_partitions())
           .map_groups(per_key, batch_format="pandas")
           .to_pandas())
    if out.empty:
        return pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                             "n_days": pd.Series([], dtype="int64"),
                             "max_streak": pd.Series([], dtype="int64")})
    out[key_col] = out[key_col].astype("int64")
    return out.sort_values(key_col).reset_index(drop=True)


def km_survival(ds, ts_col: str, key_col: str,
                bucket_s: int = 1) -> pd.DataFrame:
    """Kaplan-Meier product-limit survival curve of INTER-EVENT gaps —
    "what fraction of users are still inactive after t seconds":
    each consecutive gap is an observed (uncensored) duration, and
    every key's tail gap to the GLOBAL max timestamp is right-censored
    (the user may yet return) — dropping those tails would bias the
    curve down, which is the whole point of KM over a naive CDF.

    Scale shape: one keyed shuffle to sequence each key (the
    sessionize contract), per-key vectorized diffs, then duration
    counts fold through a (bucket, censored)-keyed combiner — the
    exchange carries distinct (duration-bucket, flag) rows, never raw
    gaps; the product-limit fold runs on that dimension-sized table.
    Returns (dur_s, n_at_risk, d, s) at every bucket with >= 1
    uncensored duration, s rounded to 6."""
    from ray.data.aggregate import Max

    max_us = ds.aggregate(Max(ts_col))[f"max({ts_col})"]
    max_us = pa.scalar(max_us).cast(pa.timestamp("us")).cast(pa.int64()) \
        .as_py()
    div = bucket_s * 1_000_000

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(df[ts_col].astype("datetime64[us]")
                     .astype(np.int64).to_numpy())
        durs = np.diff(ts)
        tail = max_us - ts[-1]
        d = np.concatenate([durs, [tail]]) // div
        e = np.concatenate([np.ones(durs.size, np.int64), [0]])
        g = pd.DataFrame({"dur_s": d, "e": e}).groupby(
            ["dur_s", "e"], as_index=False).size()
        return pd.DataFrame({"dur_s": g["dur_s"].astype("int64"),
                             "e": g["e"].astype("int64"),
                             "c": g["size"].astype("int64")})

    parts = (ds.map_batches(lambda b, c=(key_col, ts_col):
                            b.select(list(c)),
                            batch_format="pyarrow", batch_size=None)
             .groupby(key_col, num_partitions=shuffle_partitions())
             .map_groups(per_key, batch_format="pandas")
             .to_pandas())
    if parts.empty:
        return pd.DataFrame({"dur_s": pd.Series([], dtype="int64"),
                             "n_at_risk": pd.Series([], dtype="int64"),
                             "d": pd.Series([], dtype="int64"),
                             "s": pd.Series([], dtype="float64")})
    g = parts.groupby(["dur_s", "e"], as_index=False)["c"].sum()
    tot = int(g["c"].sum())
    by_t = g.pivot_table(index="dur_s", values="c", columns="e",
                         aggfunc="sum", fill_value=0) \
        .rename(columns={0: "cens", 1: "d"})
    for col in ("cens", "d"):
        if col not in by_t.columns:
            by_t[col] = 0
    by_t = by_t.sort_index()
    c_all = (by_t["cens"] + by_t["d"]).to_numpy()
    n_at_risk = tot - (np.cumsum(c_all) - c_all)
    d = by_t["d"].to_numpy()
    keep = d > 0
    frac = np.maximum(1.0 - d[keep] / n_at_risk[keep], 0.0)
    s = np.cumprod(frac)
    return pd.DataFrame({"dur_s": by_t.index.to_numpy()[keep]
                         .astype("int64"),
                         "n_at_risk": n_at_risk[keep].astype("int64"),
                         "d": d[keep].astype("int64"),
                         "s": np.round(s, 6)}).reset_index(drop=True)


def rfm_features(ds, ts_col: str, key_col: str, value_col: str,
                 as_of=None, k: int = 5) -> pd.DataFrame:
    """RFM customer features: Recency (seconds since the key's last
    event, relative to ``as_of`` — default the global max ts),
    Frequency (event count) and Monetary (value sum), each scored into
    ``k`` quantile bands — the classic segmentation feature block.

    One algebraic (max ts, count, sum) combiner per key (per-block
    Arrow group_by partials, one keyed merge), then the band edges come
    from the per-metric empirical CDF of the KEY-level table
    (dimension-sized). Scores use cume_dist semantics:
    score = ceil(cume_dist * k), recency INVERTED (most recent = k) —
    ties share a band exactly as SQL ntile-by-cume_dist would.
    Returns (key, recency_s, frequency, monetary, r_score, f_score,
    m_score)."""
    from ray.data.aggregate import Max

    if as_of is None:
        as_of = ds.aggregate(Max(ts_col))[f"max({ts_col})"]
    as_of_us = pa.scalar(as_of).cast(pa.timestamp("us")).cast(pa.int64()) \
        .as_py()

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            key_col: batch.column(key_col),
            "ts": batch.column(ts_col).cast(pa.timestamp("us"))
                  .cast(pa.int64()),
            "v": batch.column(value_col).cast(pa.float64()),
        })
        g = t.group_by(key_col).aggregate(
            [("ts", "max"), ("v", "count", pc.CountOptions(mode="all")),
             ("v", "sum")])
        return pa.table({key_col: g.column(key_col),
                         "last_ts": g.column("ts_max"),
                         "freq": g.column("v_count").cast(pa.int64()),
                         "mon": g.column("v_sum").cast(pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({key_col: pd.Series([], dtype="int64")})
    g = parts.groupby(key_col, as_index=False).agg(
        last_ts=("last_ts", "max"), freq=("freq", "sum"),
        mon=("mon", "sum"))
    g["recency_s"] = ((as_of_us - g["last_ts"]) // 1_000_000) \
        .astype("int64")
    g["frequency"] = g["freq"].astype("int64")
    g["monetary"] = g["mon"]

    def cume_score(vals: np.ndarray, invert: bool) -> np.ndarray:
        order = np.argsort(vals, kind="mergesort")
        ranks = np.empty(vals.size, np.int64)
        # cume_dist with ties: rank of the LAST tied element
        sv = vals[order]
        last_of_run = np.searchsorted(sv, sv, side="right")
        ranks[order] = last_of_run
        cd = ranks / vals.size
        sc = np.ceil(cd * k).astype(np.int64)
        return (k + 1 - sc) if invert else sc

    out = pd.DataFrame({
        key_col: g[key_col].astype("int64"),
        "recency_s": g["recency_s"],
        "frequency": g["frequency"],
        "monetary": np.round(g["monetary"], 6),
        "r_score": cume_score(g["recency_s"].to_numpy(np.float64), True),
        "f_score": cume_score(g["frequency"].to_numpy(np.float64), False),
        "m_score": cume_score(g["monetary"].to_numpy(np.float64), False)})
    return out.sort_values(key_col).reset_index(drop=True)


def seasonal_residual(ds, ts_col: str, val_col: str):
    """Seasonal-profile decomposition (weekly periodicity): fit the
    mean value per (day-of-week, hour) cell — the dominant seasonal
    pattern in operational metrics — then stamp every row with its
    cell mean and the residual ``value - seasonal``; anomaly detection
    and drift checks belong on the residual, not the raw series.

    Two-phase fit in the z_score shape: ONE pass folds per-block
    (cell, n, Σv) partials (<= 168 rows per block), the dimension-sized
    profile broadcasts into a stateless vectorized stamp — raw rows
    never shuffle. Adds int32 ``dow`` (Monday=0) / ``hour`` and float64
    ``seasonal`` / ``residual`` columns (rounded to 6)."""
    import ray

    def cell_of(batch: pa.Table):
        ts = batch.column(ts_col).cast(pa.timestamp("us"))
        dow = pc.subtract(pc.day_of_week(ts, count_from_zero=False,
                                         week_start=1),
                          pa.scalar(1)).cast(pa.int64())
        hour = pc.hour(ts).cast(pa.int64())
        return dow, hour

    def partial(batch: pa.Table) -> pa.Table:
        dow, hour = cell_of(batch)
        t = pa.table({"cell": pc.add(pc.multiply(dow, pa.scalar(
            24, pa.int64())), hour),
            "v": batch.column(val_col).cast(pa.float64())}) \
            .filter(pc.is_valid(batch.column(val_col)))
        g = t.group_by("cell").aggregate([("v", "count"), ("v", "sum")])
        return pa.table({"cell": g.column("cell"),
                         "n": g.column("v_count").cast(pa.int64()),
                         "s": g.column("v_sum").cast(pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    prof = np.full(168, np.nan)
    if not parts.empty:
        g = parts.groupby("cell").sum()
        prof[g.index.to_numpy()] = (g["s"] / g["n"]).to_numpy()
    ref = ray.put(prof)

    def stamp(batch: pa.Table) -> pa.Table:
        profile = ray.get(ref)
        dow, hour = cell_of(batch)
        cell = pc.add(pc.multiply(dow, pa.scalar(24, pa.int64())),
                      hour).to_numpy(zero_copy_only=False)
        seas = profile[cell]
        v = batch.column(val_col).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        out = batch.append_column("dow", dow.cast(pa.int32()))
        out = out.append_column("hour", hour.cast(pa.int32()))
        out = out.append_column("seasonal",
                                pa.array(np.round(seas, 6), pa.float64()))
        return out.append_column(
            "residual", pa.array(np.round(v - seas, 6), pa.float64()))

    return ds.map_batches(stamp, batch_format="pyarrow", batch_size=None)


def dau_mau(ds, ts_col: str, key_col: str) -> pd.DataFrame:
    """Engagement stickiness per calendar month: MAU (distinct active
    keys), average DAU over the month's ACTIVE days, and stickiness =
    avg_dau / mau — the product-health ratio (1.0 = everyone active
    every active day).

    One distinct-(day, key) combiner (so the keyed exchange carries at
    most one row per key per day per block); month rollups derive from
    that dimension-sized table. Returns (month_us, mau, avg_dau,
    stickiness) sorted, stickiness rounded to 6."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "day": pc.cast(pc.floor_temporal(
                batch.column(ts_col).cast(pa.timestamp("us")),
                unit="day"), pa.timestamp("us")).cast(pa.int64()),
            "month": pc.cast(pc.floor_temporal(
                batch.column(ts_col).cast(pa.timestamp("us")),
                unit="month"), pa.timestamp("us")).cast(pa.int64()),
            key_col: batch.column(key_col),
        })
        return t.group_by(["month", "day", key_col]).aggregate([])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas() \
        .drop_duplicates(["month", "day", key_col])
    if parts.empty:
        return pd.DataFrame({"month_us": pd.Series([], dtype="int64"),
                             "mau": pd.Series([], dtype="int64"),
                             "avg_dau": [], "stickiness": []})
    dau = parts.groupby(["month", "day"])[key_col].nunique()
    mau = parts.groupby("month")[key_col].nunique()
    avg_dau = dau.groupby("month").mean()
    out = pd.DataFrame({"month_us": mau.index.astype("int64"),
                        "mau": mau.to_numpy(np.int64),
                        "avg_dau": np.round(avg_dau.to_numpy(), 6),
                        "stickiness": np.round(
                            (avg_dau / mau).to_numpy(), 6)})
    return out.sort_values("month_us").reset_index(drop=True)


def burstiness_per_key(ds, ts_col: str, key_col: str,
                       order_col: str) -> pd.DataFrame:
    """Goh-Barabási burstiness coefficient of inter-event gaps per key:

        B = (σ − μ) / (σ + μ)   over the key's consecutive gaps

    — B → −1 for clockwork (periodic) activity, ~0 for Poisson, → +1
    for extreme bursts; the one-number diagnostic separating bot-like
    regular traffic from human bursty behavior.

    One keyed-bucket shuffle of the narrow projection; each BUCKET
    computes gaps with one Cython groupby diff (NaN at key boundaries)
    and folds every key's count/mean/std with one Cython groupby agg —
    no per-key Python. Keys with < 3 events emit NULL B (σ of one gap
    is 0/undefined). Returns (key, n_gaps, mean_gap_s, std_gap_s,
    burstiness) rounded to 6, sorted by key."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, order_col], kind="mergesort")
        ts = df[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        gaps = pd.Series(ts).groupby(
            df[key_col].to_numpy(), sort=False).diff().to_numpy() / 1e6
        work = pd.DataFrame({key_col: df[key_col].to_numpy(), "g": gaps})
        g = work.groupby(key_col, as_index=False, sort=False,
                         dropna=False).agg(
            n_gaps=("g", "count"), sd=("g", "std"))
        n = g["n_gaps"].to_numpy(np.int64)
        # mean from plain sequential per-segment sums (np.add.reduceat
        # over the key-contiguous array) — bit-parity with the SQL
        # scan-order avg(); pandas' Kahan group-mean differs by 1 ulp
        # on round-boundary values
        kv = df[key_col].to_numpy()
        seg = np.flatnonzero(np.concatenate(
            [[True], kv[1:] != kv[:-1]]))
        sums = np.add.reduceat(np.where(np.isnan(gaps), 0.0, gaps), seg)
        with np.errstate(invalid="ignore", divide="ignore"):
            mu = np.where(n > 0, sums / n, np.nan)
        sd = g["sd"].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            b = np.where((n >= 2) & (sd + mu > 0),
                         (sd - mu) / (sd + mu), np.nan)
        r6 = lambda a: np.array([round(float(x), 6) if x == x else np.nan
                                 for x in a])   # exact Python-round parity
        return pd.DataFrame({key_col: g[key_col],
                             "n_gaps": n,
                             "mean_gap_s": r6(mu),
                             "std_gap_s": r6(sd),
                             "burstiness": r6(b)})

    cols = [key_col, ts_col, order_col]
    proj = ds.map_batches(lambda t, c=tuple(cols): t.select(list(c)),
                          batch_format="pyarrow", batch_size=None)
    out = bucketed_by_key(proj, key_col, per_bucket).to_pandas()
    if out.empty:
        return pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                             "n_gaps": pd.Series([], dtype="int64"),
                             "mean_gap_s": [], "std_gap_s": [],
                             "burstiness": []})
    out[key_col] = out[key_col].astype("int64")
    return out.sort_values(key_col).reset_index(drop=True)


def conversion_latency(ds, ts_col: str, key_col: str, type_col: str,
                       from_type: str, to_type: str,
                       qs=(0.5, 0.9)) -> pd.DataFrame:
    """Conversion-latency distribution: per key, the seconds from its
    FIRST ``from_type`` event to its FIRST ``to_type`` event at or
    after it (keys that never convert are excluded — the funnel
    completion-time companion to funnel_steps' completion flags).

    Scale shape: one per-block (key, type, min ts) combiner restricted
    to the two event types (pre-shuffle filter), one keyed merge,
    per-key delta, then exact quantiles of the deltas on the
    dimension-sized key table. Returns one row: (n_from, n_converted,
    conv_rate, plus q<NN>_s per requested quantile, linear
    interpolation)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(type_col).cast(pa.string())
        mask = pc.is_in(col, value_set=pa.array([from_type, to_type]))
        t = batch.filter(mask)
        if t.num_rows == 0:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "typ": pa.array([], pa.string()),
                             "ts": pa.array([], pa.int64())})
        g = pa.table({key_col: t.column(key_col).cast(pa.int64()),
                      "typ": t.column(type_col).cast(pa.string()),
                      "ts": t.column(ts_col).cast(pa.timestamp("us"))
                      .cast(pa.int64())}) \
            .group_by([key_col, "typ"]).aggregate([("ts", "min")])
        return pa.table({key_col: g.column(key_col),
                         "typ": g.column("typ"),
                         "ts": g.column("ts_min").cast(pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if parts.empty:
        row = {"n_from": np.int64(0), "n_converted": np.int64(0),
               "conv_rate": np.nan}
        for q in qs:
            row[f"q{int(q * 100)}_s"] = np.nan
        return pd.DataFrame([row])
    g = parts.groupby([key_col, "typ"])["ts"].min().unstack()
    f = g.get(from_type)
    t = g.get(to_type)
    has_from = f.notna() if f is not None else pd.Series(dtype=bool)
    n_from = int(has_from.sum())
    if f is None or t is None:
        deltas = np.array([])
    else:
        ok = f.notna() & t.notna() & (t >= f)
        deltas = ((t[ok] - f[ok]) / 1e6).to_numpy()
    row = {"n_from": np.int64(n_from),
           "n_converted": np.int64(deltas.size),
           "conv_rate": round(deltas.size / n_from, 6) if n_from
           else np.nan}
    for q in qs:
        row[f"q{int(q * 100)}_s"] = \
            round(float(np.quantile(deltas, q)), 6) if deltas.size \
            else np.nan
    return pd.DataFrame([row])


def max_drawdown(ds, ts_col: str, key_col: str, val_col: str,
                 order_col: str) -> pd.DataFrame:
    """Maximum drawdown of each key's cumulative value stream — the
    largest peak-to-trough drop of Σvalue in (ts, order) sequence: the
    canonical risk/health metric for any signed running total (balance
    streams, score deltas, net engagement).

    One keyed-bucket shuffle of the narrow projection, then Cython
    groupby cumsum/cummax over all of a bucket's keys at once (no
    per-key Python). Returns (key, total, peak, max_drawdown) rounded
    to 6, sorted by key."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, order_col], kind="mergesort")
        g = df.groupby(key_col, sort=False, dropna=False)
        cum = g[val_col].cumsum().astype(float)
        peak = cum.groupby(df[key_col], sort=False, dropna=False).cummax()
        work = pd.DataFrame({key_col: df[key_col].to_numpy(),
                             "cum": cum.to_numpy(),
                             "peak": peak.to_numpy(),
                             "dd": (peak - cum).to_numpy()})
        g2 = work.groupby(key_col, as_index=False, sort=False,
                          dropna=False).agg(
            total=("cum", "last"), peak=("peak", "max"), dd=("dd", "max"))
        return pd.DataFrame({
            key_col: g2[key_col],
            "total": np.round(g2["total"].to_numpy(np.float64), 6),
            "peak": np.round(g2["peak"].to_numpy(np.float64), 6),
            "max_drawdown": np.round(g2["dd"].to_numpy(np.float64), 6)})

    cols = [key_col, ts_col, val_col, order_col]
    proj = ds.map_batches(lambda t, c=tuple(cols): t.select(list(c)),
                          batch_format="pyarrow", batch_size=None)
    out = bucketed_by_key(proj, key_col, per_bucket).to_pandas()
    if out.empty:
        return pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                             "total": [], "peak": [],
                             "max_drawdown": []})
    out[key_col] = out[key_col].astype("int64")
    return out.sort_values(key_col).reset_index(drop=True)


def seasonal_strength(ds, ts_col: str, val_col: str) -> pd.DataFrame:
    """Strength of weekly seasonality: 1 − var(residual)/var(value)
    over the ``seasonal_residual`` decomposition — the scalar answer
    to "does the (dow, hour) profile explain this metric at all"
    (near 0: don't bother deseasonalizing; near 1: all signal is
    schedule).

    Reuses the profile fit + residual stamp, then ONE two-moment
    combiner pass over (value, residual). Returns one row
    (var_value, var_residual, strength) rounded to 6."""
    import pandas as pd

    stamped = seasonal_residual(ds, ts_col, val_col)

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(val_col).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        r = t.column("residual").cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        ok = np.isfinite(v) & np.isfinite(r)
        v, r = v[ok], r[ok]
        return pa.table({"n": pa.array([v.size], pa.int64()),
                         "sv": pa.array([v.sum()]),
                         "svv": pa.array([(v * v).sum()]),
                         "sr": pa.array([r.sum()]),
                         "srr": pa.array([(r * r).sum()])})

    p = stamped.map_batches(partial, batch_format="pyarrow",
                            batch_size=None).to_pandas().sum()
    n = float(p["n"])
    if n < 2:
        return pd.DataFrame({"var_value": [np.nan],
                             "var_residual": [np.nan],
                             "strength": [np.nan]})
    vv = p["svv"] / n - (p["sv"] / n) ** 2
    vr = p["srr"] / n - (p["sr"] / n) ** 2
    strength = 1.0 - vr / vv if vv > 0 else np.nan
    return pd.DataFrame({"var_value": [round(vv, 6)],
                         "var_residual": [round(vr, 6)],
                         "strength": [round(strength, 6)
                                      if strength == strength
                                      else np.nan]})


def scd2_intervals(ds, key_col: str, ts_col: str, order_col: str,
                   n_buckets: int | None = None):
    """Change log -> SCD2 (slowly-changing-dimension type-2) validity
    intervals: per key in (ts, order_col) order, each change row gets
    ``valid_from`` = its own timestamp, ``valid_to`` = the NEXT change's
    timestamp (null on the latest row), and ``is_current`` — the
    standard dimension-history build from a CDC stream (SQL:
    ``lead(ts) OVER (PARTITION BY key ORDER BY ts, order)``).

    Scale shape: rows hash-bucket on the key (uniform buckets — a
    Zipf-hot key still lands whole in one bucket, which SCD2 requires:
    interval chaining is per-key sequential) and each bucket resolves
    ALL its keys with ONE vectorized pass — lexsort by (key, ts, order),
    shift(-1), mask at key boundaries — never a per-key Python call.
    Returns a Dataset with valid_from/valid_to/is_current appended."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, order_col], kind="mergesort")
        nxt = df[ts_col].shift(-1)
        last = df[key_col] != df[key_col].shift(-1)
        return df.assign(valid_from=df[ts_col],
                         valid_to=nxt.mask(last),
                         is_current=last.to_numpy())

    return bucketed_by_key(ds, key_col, per_bucket, n_buckets=n_buckets)


def interval_coverage(ds, key_col: str, start_col: str, end_col: str):
    """Interval-union coverage per key: total length of the UNION of
    the key's half-open ``[start, end)`` intervals, the interval count,
    and the number of merged islands — the dwell/uptime/coverage
    measure where summing raw durations over-counts overlaps (the
    gaps-and-islands pattern over real intervals, not same-type runs
    like ``runs_islands``).

    Semantics (SQL-parity, see the islands window construction): rows
    sort by (key, start, end); an interval starts a new island when it
    does not overlap the running max end of its predecessors
    (``start >= prev_max`` — touching intervals count as separate
    islands but contiguous coverage, which sums identically). Rows
    with a NULL start/end or ``end <= start`` are dropped.

    Scale shape: one keyed-bucket shuffle of the narrow (key, start,
    end) projection, then Cython groupby cummax/shift/cumsum + two
    tiny groupby aggs per bucket — no per-key Python. Returns
    (key, n_intervals, n_islands, covered_us) sorted by key."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[start_col].notna() & df[end_col].notna()]
        df = df[df[end_col] > df[start_col]]
        if df.empty:
            return pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                                 "n_intervals": pd.Series([], dtype="int64"),
                                 "n_islands": pd.Series([], dtype="int64"),
                                 "covered_us": pd.Series([], dtype="int64")})
        df = df.sort_values([key_col, start_col, end_col],
                            kind="mergesort")
        g = df.groupby(key_col, sort=False, dropna=False)
        prev_max = g[end_col].cummax().groupby(
            df[key_col], sort=False, dropna=False).shift(1)
        new_i = (prev_max.isna()
                 | (df[start_col] >= prev_max)).astype(np.int64)
        island = new_i.groupby(df[key_col], sort=False,
                               dropna=False).cumsum()
        work = pd.DataFrame({key_col: df[key_col].to_numpy(),
                             "__isl": island.to_numpy(),
                             "s": df[start_col].to_numpy(np.int64),
                             "e": df[end_col].to_numpy(np.int64)})
        il = work.groupby([key_col, "__isl"], as_index=False,
                          sort=False, dropna=False).agg(
            s0=("s", "min"), e1=("e", "max"), n=("s", "size"))
        il["len"] = il["e1"] - il["s0"]
        out = il.groupby(key_col, as_index=False, sort=False,
                         dropna=False).agg(
            n_intervals=("n", "sum"), n_islands=("n", "size"),
            covered_us=("len", "sum"))
        for c in ("n_intervals", "n_islands", "covered_us"):
            out[c] = out[c].astype("int64")
        return out

    proj = ds.map_batches(
        lambda t, c=(key_col, start_col, end_col): t.select(list(c)),
        batch_format="pyarrow", batch_size=None)
    out = bucketed_by_key(proj, key_col, per_bucket).to_pandas()
    if out.empty:
        out = pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                            "n_intervals": pd.Series([], dtype="int64"),
                            "n_islands": pd.Series([], dtype="int64"),
                            "covered_us": pd.Series([], dtype="int64")})
    return out.sort_values(key_col, kind="mergesort").reset_index(drop=True)


def sax_words(ds, key_col: str, ts_col: str, value_col: str,
              order_col: str, *, w: int = 4,
              alphabet: str = "abcd") -> "pd.DataFrame":
    """SAX — Symbolic Aggregate approXimation (Lin et al. 2003) per
    key: each key's non-null value sequence in (ts, order) order is
    z-normalized (population std; constant series map to z = 0), PAA-
    compressed into ``w`` row-position segments, and each segment mean
    quantized at the standard-normal breakpoints into one letter —
    the per-entity "shape word" behind time-series motif mining,
    anomaly grouping and sequence dedup. Alphabet size 4 uses
    breakpoints (-0.6745, 0, 0.6745); keys with fewer than ``w`` rows
    emit correspondingly shorter words.

    Scale shape: ONE keyed-bucket shuffle of the 4-column projection
    (``bucketed_by_key`` — per-bucket Python, Cython groupby kernels
    for the mean/std/cumcount/segment passes across ALL of a bucket's
    keys at once; only the letter join is a per-key C string op).
    Returns (key, sax, n) sorted by key."""
    import pandas as pd
    import pyarrow.compute as pc

    if len(alphabet) != 4:
        raise ValueError("sax_words: only the 4-letter alphabet "
                         "(breakpoints -0.6745/0/0.6745) is implemented")

    def project(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col, ts_col, value_col, order_col])
        return t.filter(pc.is_valid(batch.column(value_col)))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([ts_col, order_col], kind="mergesort")
        g = df.groupby(key_col, sort=False, dropna=False)
        v = df[value_col].to_numpy(np.float64)
        n = g[value_col].transform("size").to_numpy(np.int64)
        mu = g[value_col].transform("mean").to_numpy(np.float64)
        # population std via E[x^2] - mean^2 (transform("std") is ddof=1)
        m2 = pd.Series(v * v).groupby(df[key_col].to_numpy(),
                                      sort=False).transform("mean")             .to_numpy(np.float64)
        sd = np.sqrt(np.maximum(m2 - mu * mu, 0.0))
        with np.errstate(invalid="ignore", divide="ignore"):
            z = np.where(sd > 0, (v - mu) / sd, 0.0)
        seg = (g.cumcount().to_numpy(np.int64) * w) // n
        segm = pd.DataFrame({key_col: df[key_col], "sg": seg, "z": z,
                             "n": n})             .groupby([key_col, "sg"], dropna=False, sort=False,
                     as_index=False).agg(m=("z", "mean"), n=("n", "first"))
        letters = np.asarray(list(alphabet))
        # side="right" == SQL's strict-< CASE chain: a mean exactly AT
        # a breakpoint takes the HIGHER letter (z=0 -> 'c')
        code = np.searchsorted([-0.6745, 0.0, 0.6745],
                               segm["m"].to_numpy(np.float64),
                               side="right")
        segm["c"] = letters[code]
        segm = segm.sort_values("sg", kind="mergesort")
        out = segm.groupby(key_col, dropna=False, sort=False,
                           as_index=False)             .agg(sax=("c", "".join), n=("n", "first"))
        out["n"] = out["n"].astype(np.int64)
        return out

    proj = ds.map_batches(project, batch_format="pyarrow",
                          batch_size=None)
    out = bucketed_by_key(proj, key_col, per_bucket).to_pandas()
    return out.sort_values(key_col, kind="mergesort")         .reset_index(drop=True)


def watermark_late_events(ds, ts_col: str, key_col: str,
                          value_col: str, arrival_col: str, *,
                          window_s: int = 3600,
                          allowed_lateness_s: int = 3600,
                          n_buckets: int = 64) -> "pd.DataFrame":
    """Streaming-window semantics REPLAYED deterministically over a
    batch table: the watermark before arrival ``i`` is
    ``max(event time of arrivals < i) − allowed_lateness``; an event
    whose timestamp falls behind it is LATE (a stream processor would
    have closed its window). Emits per (key, tumbling window):
    total arrivals, late arrivals, and the on-time value sum — the
    audit that tells you what a watermark policy WOULD have dropped
    before you deploy it.

    Scale shape — the sequential prefix-max parallelized the classic
    way: (1) one global (min, max) arrival fold; (2) arrivals split
    into ``n_buckets`` ORDERED ranges, a per-block per-bucket max-ts
    combiner folds to the driver, and the exclusive prefix-max over
    the B-row bucket table (driver arithmetic on KB state) gives each
    bucket its carry-in watermark; (3) ONE keyed shuffle co-locates
    each bucket, a vectorized arrival-sort + shifted cummax seeded
    with the carry-in flags late rows for ALL the bucket's arrivals
    at once; (4) the (key, window) rollup is a second keyed-bucket
    combiner and the result STAYS a Dataset (keys x windows sized).
    The first arrival has no watermark and is never late. Returns a
    Dataset (key, win_start, n_total, n_late, sum_on_time)."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..tuning import shuffle_partitions

    def bounds_partial(t: pa.Table) -> pa.Table:
        a = t.column(arrival_col).cast(pa.int64())
        if len(a) == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({"lo": pa.array([pc.min(a).as_py()], pa.int64()),
                         "hi": pa.array([pc.max(a).as_py()], pa.int64())})

    b = ds.map_batches(bounds_partial, batch_format="pyarrow",
                       batch_size=None).to_pandas()
    if b.empty:
        import ray.data as _rd
        return _rd.from_pandas(pd.DataFrame(
            {key_col: pd.Series([], dtype="int64"),
             "win_start": pd.Series([], dtype="datetime64[us]"),
             "n_total": pd.Series([], dtype="int64"),
             "n_late": pd.Series([], dtype="int64"),
             "sum_on_time": pd.Series([], dtype="float64")}))
    lo, hi = int(b["lo"].min()), int(b["hi"].max())
    span = max(hi - lo + 1, 1)

    def bucket_of(arr: np.ndarray) -> np.ndarray:
        return np.minimum((arr - lo) * n_buckets // span,
                          n_buckets - 1).astype(np.int64)

    def bucket_max_partial(t: pa.Table) -> pa.Table:
        a = t.column(arrival_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = t.column(ts_col).cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        bk = bucket_of(a)
        df = pd.DataFrame({"bk": bk, "ts": ts}).groupby("bk",
                                                        as_index=False).max()
        return pa.table({"bk": pa.array(df["bk"].to_numpy(np.int64)),
                         "mx": pa.array(df["ts"].to_numpy(np.int64))})

    bm = ds.map_batches(bucket_max_partial, batch_format="pyarrow",
                        batch_size=None).to_pandas()         .groupby("bk", as_index=False)["mx"].max()
    # exclusive prefix max over ORDERED buckets -> carry-in watermark
    carry = np.full(n_buckets, np.iinfo(np.int64).min, np.int64)
    run = np.iinfo(np.int64).min
    mx = dict(zip(bm["bk"], bm["mx"]))
    for i in range(n_buckets):
        carry[i] = run
        if i in mx:
            run = max(run, int(mx[i]))
    import ray

    ref = ray.put(carry)
    late_us = int(allowed_lateness_s * 1_000_000)
    win_us = int(window_s * 1_000_000)

    def stamp_bucket(t: pa.Table) -> pa.Table:
        a = t.column(arrival_col).cast(pa.int64())
        return t.append_column("__wbkt", pa.array(
            bucket_of(a.to_numpy(zero_copy_only=False)), pa.int64()))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        cr = ray.get(ref)
        df = df.sort_values(arrival_col, kind="mergesort")
        ts = df[ts_col].to_numpy().astype("datetime64[us]")             .astype(np.int64)
        seed = int(cr[int(df["__wbkt"].iloc[0])])
        prior = np.concatenate([[seed], np.maximum.accumulate(ts)[:-1]])
        prior = np.maximum(prior, seed)
        late = (prior != np.iinfo(np.int64).min)             & (ts < prior - late_us)
        win = (ts // win_us) * win_us
        v = df[value_col].to_numpy(np.float64)
        on_v = np.where(late | np.isnan(v), 0.0, v)
        out = pd.DataFrame({key_col: df[key_col].to_numpy(),
                            "win_start": win,
                            "n_total": 1,
                            "n_late": late.astype(np.int64),
                            "sum_on_time": on_v})             .groupby([key_col, "win_start"], as_index=False).sum()
        return out

    parts = (ds.map_batches(stamp_bucket, batch_format="pyarrow",
                            batch_size=None)
             .groupby("__wbkt", num_partitions=min(shuffle_partitions(),
                                                   n_buckets))
             .map_groups(per_bucket, batch_format="pandas"))

    # a (key, window) pair can span arrival buckets, so the final
    # merge is a SECOND keyed-bucket stage and the result STAYS a
    # Dataset (output is keys x windows sized; collecting it is the
    # caller's choice, not baked in)
    def add_gkey(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.fill_null(pc.cast(t.column(key_col), pa.string()),
                         "\0null"),
            pc.cast(t.column("win_start"), pa.string()), "\x1f")
        return t.append_column("__gk2", k)

    def final_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop(columns="__gk2") \
            .groupby([key_col, "win_start"], as_index=False).sum()
        out["win_start"] = out["win_start"].to_numpy(np.int64) \
            .astype("datetime64[us]")
        out["n_total"] = out["n_total"].astype(np.int64)
        out["n_late"] = out["n_late"].astype(np.int64)
        out["sum_on_time"] = np.floor(
            np.abs(out["sum_on_time"]) * 1e6 + 0.5) / 1e6 \
            * np.sign(out["sum_on_time"])
        return out

    return bucketed_by_key(
        parts.map_batches(add_gkey, batch_format="pyarrow",
                          batch_size=None), "__gk2", final_bucket)


def last_touch_attribution(ds, user_col: str, ts_col: str,
                           type_col: str, id_col: str,
                           conv_type: str, window_s: int = 86_400):
    """Last-touch conversion attribution: for every ``conv_type`` event,
    the most recent PRECEDING non-conversion event of the same user
    within ``window_s`` seconds — the channel that "gets credit" in
    marketing/funnel analytics (SQL: ``last_value(... IGNORE NULLS)
    OVER (PARTITION BY user ORDER BY ts, id ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)`` + the window cutoff). Conversions with
    no qualifying touch attribute to NULL with NULL lag.

    Scale shape: one uniform user-hash BUCKET shuffle
    (``bucketed_by_key``), then per bucket ONE vectorized pass over
    all users at once — sort by (user, ts, id), a running ``maximum
    .accumulate`` over non-conversion row indices (user-segment safety
    by the global-index monotonicity argument: an accumulated index
    from an earlier user is always below the current segment's start,
    so it is detected and nulled), and a gather for the channel/lag.
    Rows with a null user or null timestamp are EXCLUDED (they can
    neither convert nor give credit — matching the SQL form's WHERE);
    a null event_type is neither a conversion nor a touch (the SQL
    CASE maps it to NULL, which IGNORE NULLS skips). Returns a Dataset
    (id_col, channel, lag_s) with one row per conversion event; lag_s
    is float64 seconds (null when unattributed), ties on ts break by
    id (deterministic)."""
    if window_s < 0:
        raise ValueError(f"window_s must be >= 0, got {window_s}")

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        df = df[df[ts_col].notna() & df[user_col].notna()]
        codes, _ = pd.factorize(df[user_col], use_na_sentinel=False)
        t = df[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        ids = df[id_col].to_numpy()
        order = np.lexsort((ids, t, codes))
        df = df.iloc[order]
        codes, t, ids = codes[order], t[order], ids[order]
        types = df[type_col].to_numpy()
        n = len(df)
        id_type = pa.Array.from_pandas(df[id_col].iloc[:1]).type
        empty = pa.table({id_col: pa.array([], id_type),
                          "channel": pa.array([], pa.string()),
                          "lag_s": pa.array([], pa.float64())})
        if n == 0:
            return empty
        change = np.empty(n, bool)
        change[0] = True
        change[1:] = codes[1:] != codes[:-1]
        seg_id = np.cumsum(change) - 1
        starts = np.flatnonzero(change)
        is_conv = types == conv_type
        # a null type is neither a conversion nor a touch
        is_touch = pd.notna(types) & ~is_conv
        idx = np.arange(n, dtype=np.int64)
        carry = np.where(is_touch, idx, np.int64(-1))
        # prefix of the accumulate EXCLUDING the current row
        acc = np.maximum.accumulate(carry)
        prev_acc = np.concatenate([[np.int64(-1)], acc[:-1]])
        # an index accumulated from an EARLIER user segment is always
        # below this row's segment start — null it
        valid = prev_acc >= starts[seg_id]
        conv_rows = np.flatnonzero(is_conv)
        if conv_rows.size == 0:
            return empty
        src = prev_acc[conv_rows]
        ok = valid[conv_rows]
        lag_us = np.where(ok, t[conv_rows] - t[np.maximum(src, 0)], -1)
        ok &= lag_us <= np.int64(window_s) * 1_000_000
        channel = np.where(ok, types[np.maximum(src, 0)], None)
        lag = np.where(ok, lag_us // 1_000_000, -1).astype(np.float64)
        lag[~ok] = np.nan
        # explicit Arrow types: an all-unattributed bucket's channel
        # must still be string, never inferred null
        return pa.table({
            id_col: pa.array(ids[conv_rows], id_type),
            "channel": pa.array(channel.tolist(), pa.string()),
            "lag_s": pa.array(lag, pa.float64())})

    return bucketed_by_key(ds, user_col, per_bucket)
