"""Distributed connected components via min-label propagation.

The near-dup keep-one path needs the connected components of the
LSH-candidate pair graph (each component keeps its smallest doc id).
`neardup_clusters` (dedup.py) does this with a driver-side union-find,
which is the right call while near-dup pairs are rare; on a dup-heavy
web corpus the pair set itself is web-scale and this module is the
scale path: everything stays in Datasets, the driver only sees one
convergence scalar per iteration.

Algorithm: symmetrize the edges once, seed every node's label with its
own id, then repeat

    label[n] <- min(label[n], min over neighbors m of label[m])

followed by one pointer-jumping hop ``label[n] <- label[label[n]]``,
until the global label sum stops changing (labels only ever decrease,
so an unchanged sum means a fixed point). Each round is TWO hash joins
(neighbor label lookup + the jump) plus ONE keyed min-aggregate — all
native Ray Data shuffles, no per-key Python. Neighbor-min alone needs
diameter rounds (a million-node chain would never finish); the jump
halves the remaining label-tree depth every round, so rounds needed =
O(log diameter) — the same exponential collapse the large-star/
small-star algorithm gets, paid as one extra narrow join per round.

The labels Dataset (one row per distinct node — orders of magnitude
smaller than the edge set) is materialized once per round because it
is the iteration state, exactly like the centroids in
``similarity.kmeans`` (there the state is KB-sized and driver-held;
here it stays distributed because node count scales with the corpus).

Reference parity: feature-fabrica has no graph operators; this backs
the dedup family (SURVEY §8.3) at dup-heavy scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..tuning import shuffle_partitions

__all__ = ["connected_components", "star_edges", "pagerank",
           "personalized_pagerank",
           "pagerank_sharded", "hits", "hits_sharded", "degree_table",
           "canonical_edges", "triangle_count", "edge_jaccard", "kcore",
           "cooccur_edges", "adamic_adar", "bfs_hops", "degree_assortativity", "modularity",
           "clustering_coefficients", "label_propagation",
           "harmonic_centrality", "reciprocity"]


def _canon2(names: list[str]):
    """Canonical-schema guard for post-shuffle blocks: Ray's hash
    shuffle emits EMPTY partitions with no schema at all; every stage
    here re-emits (int64, int64) under the given names so downstream
    joins/unions always see one schema (same pattern as
    curation.salted_group_agg's merge guard)."""
    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns != 2:
            empty = pa.array([], pa.int64())
            return pa.table({names[0]: empty, names[1]: empty})
        return t.rename_columns(names)
    return fn


def _drop_null_endpoints(t: pa.Table, a_col: str, b_col: str) -> pa.Table:
    """Drop edges with a null endpoint (SQL join semantics: a null id
    cannot participate in an equality relation). Without this, casting
    a nullable int column to numpy silently degrades ids to float64
    NaN and poisons every downstream label/count."""
    ok = pc.and_(pc.is_valid(t.column(a_col)), pc.is_valid(t.column(b_col)))
    if pc.all(ok).as_py() is not True:     # empty batch -> null -> filter
        t = t.filter(ok)
    return t


def connected_components(edges, a_col: str = "a", b_col: str = "b",
                         max_iters: int = 50):
    """Components of the undirected graph given by integer-id edge rows.

    Returns a Dataset (node, comp) covering every node that appears in
    at least one edge, where ``comp`` is the smallest node id in the
    node's component (the canonical representative). Ids must be
    integers (the convergence test sums them). Raises RuntimeError if
    ``max_iters`` rounds don't reach a fixed point.
    """

    def symmetrize(batch: pa.Table) -> pa.Table:
        batch = _drop_null_endpoints(batch, a_col, b_col)
        a = batch.column(a_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        b = batch.column(b_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({"src": np.concatenate([a, b]),
                         "dst": np.concatenate([b, a])})

    sym = edges.map_batches(symmetrize, batch_format="pyarrow",
                            batch_size=None).materialize()
    nparts = shuffle_partitions()

    # Ray's native hash join broadcasts each side's schema to its
    # aggregators only with the FIRST block it streams — and skips the
    # broadcast entirely if that block is empty (hash_shuffle.py:223) —
    # so a join input with empty blocks makes schema-less partitions
    # crash pyarrow's join. Compact every join input to
    # min(nparts, n_rows) balanced blocks (a linear split-merge, not a
    # shuffle); counts are free because the inputs are materialized.
    n_edge_rows = sym.count()
    if n_edge_rows == 0:
        import ray.data as _rd
        empty = pa.array([], pa.int64())
        return _rd.from_arrow(pa.table({"node": empty, "comp": empty}))
    sym = sym.repartition(min(nparts, n_edge_rows)).materialize()

    def seed(batch: pa.Table) -> pa.Table:
        nodes = batch.column("src").unique()
        return pa.table({"node": nodes, "label": nodes})

    labels = (sym.map_batches(seed, batch_format="pyarrow", batch_size=None)
              .groupby("node", num_partitions=nparts).min("label")
              .map_batches(_canon2(["node", "label"]),
                           batch_format="pyarrow", batch_size=None)
              .materialize())
    n_nodes = labels.count()          # constant across rounds
    labels = labels.repartition(min(nparts, n_nodes)).materialize()
    prev_sum = labels.sum("label")

    def min_label(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "node" not in batch.column_names:
            empty = pa.array([], pa.int64())
            return pa.table({"node": empty, "label": empty})
        g = batch.group_by("node").aggregate([("label", "min")])
        return pa.table({"node": g.column("node"),
                         "label": g.column("label_min")})

    from .join import sized_join

    for _ in range(max_iters):
        # neighbor labels: for every edge (src, dst), dst's current
        # label. The label table is node-scale (16 B/node) — far below
        # the edge set — so sized_join broadcasts it while it fits and
        # falls back to the hash exchange on a billion-node graph.
        nbr = sized_join(sym, labels, on=("dst",), right_on=("node",),
                         left_bytes=sym.size_bytes(),
                         right_bytes=labels.size_bytes()) \
            .select_columns(["src", "label"]) \
            .map_batches(_canon2(["node", "label"]),
                         batch_format="pyarrow", batch_size=None)
        labels = (labels.union(nbr)
                  .map_batches(min_label, batch_format="pyarrow",
                               batch_size=None)
                  .groupby("node", num_partitions=nparts).min("label")
                  .map_batches(_canon2(["node", "label"]),
                               batch_format="pyarrow", batch_size=None)
                  .repartition(min(nparts, n_nodes))
                  .materialize())
        # pointer jumping: label[n] <- label[label[n]]. Every label
        # value is itself a node id in the table (labels start as ids
        # and only ever take other nodes' ids via min), so the 1:1 join
        # is total and new label = the jumped label (labels only
        # decrease). Neighbor-min alone needs diameter rounds on a
        # chain; the jump halves remaining depth each round, so
        # convergence is O(log diameter) at one extra narrow join per
        # round.
        hop = labels.map_batches(_canon2(["node2", "label2"]),
                                 batch_format="pyarrow", batch_size=None) \
            .materialize()
        labels = (sized_join(labels, hop, on=("label",),
                             right_on=("node2",),
                             left_bytes=labels.size_bytes(),
                             right_bytes=hop.size_bytes())
                  .select_columns(["node", "label2"])
                  .map_batches(_canon2(["node", "label"]),
                               batch_format="pyarrow", batch_size=None)
                  .repartition(min(nparts, n_nodes))
                  .materialize())
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            return labels.map_batches(_canon2(["node", "comp"]),
                                      batch_format="pyarrow",
                                      batch_size=None)
        prev_sum = cur_sum
    raise RuntimeError(f"connected_components: no fixed point after "
                       f"{max_iters} rounds (with pointer jumping this "
                       f"bounds diameter at ~2**{max_iters})")


def star_edges(ds, id_col: str, key_col: str):
    """Star edges (node -> per-key min node) for an equivalence key.

    The standard way to feed an equivalence relation ("same normalized
    text", "same LSH bucket", ...) into ``connected_components``
    without the quadratic within-class pair blowup: each class of size
    s contributes s edges to its min member (including the min's own
    self-loop, which keeps singleton nodes in the node set) and has
    diameter 2, so a union of several relations converges in a handful
    of label-propagation rounds.

    Cost shape at scale: one keyed min-aggregate plus one hash join of
    the (id, key) projection against the KB..MB-sized per-key min
    table — both native Ray Data shuffles of narrow columns; the wide
    payload never moves.
    """
    proj = ds.select_columns([id_col, key_col]).materialize()
    n = proj.count()
    if n == 0:
        import ray.data as _rd
        empty = pa.array([], pa.int64())
        return _rd.from_arrow(pa.table({"a": empty, "b": empty}))
    nparts = shuffle_partitions()
    # balanced non-empty blocks: Ray's hash join skips the schema
    # broadcast for empty leading blocks (see connected_components)
    proj = proj.repartition(min(nparts, n)).materialize()
    mins = (proj.groupby(key_col, num_partitions=nparts).min(id_col)
            .map_batches(_canon_keyed(key_col, f"min({id_col})"),
                         batch_format="pyarrow", batch_size=None)
            .materialize())
    from .join import sized_join

    out = sized_join(proj, mins, on=(key_col,),
                     left_bytes=proj.size_bytes(),
                     right_bytes=mins.size_bytes())

    def to_edges(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or id_col not in batch.column_names:
            empty = pa.array([], pa.int64())
            return pa.table({"a": empty, "b": empty})
        return pa.table({
            "a": batch.column(id_col).cast(pa.int64()),
            "b": batch.column(f"min({id_col})").cast(pa.int64()),
        })

    return out.map_batches(to_edges, batch_format="pyarrow",
                           batch_size=None)


def _canon_keyed(key_name: str, val_name: str):
    """Schema guard for (string key, int64 value) post-shuffle blocks
    (empty hash-shuffle partitions carry no schema at all)."""
    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns != 2:
            return pa.table({key_name: pa.array([], pa.string()),
                             val_name: pa.array([], pa.int64())})
        return t.rename_columns([key_name, val_name])
    return fn


def pagerank(edges, src_col: str = "src", dst_col: str = "dst", *,
             damping: float = 0.85, iters: int = 20,
             max_nodes: int = 5_000_000, seeds=None,
             weight_col: str | None = None):
    """PageRank over an edge-list Dataset (each row = one unit-weight
    directed edge; parallel edges add weight, standard multigraph
    semantics). With ``weight_col`` each edge instead carries that
    column's float weight (similarity-weighted graphs): a node's
    out-mass splits proportionally to its outgoing weights,
    share(u→v) = rank(u)·w(u,v)/Σ_out w(u,·); rows with null weight
    are dropped, zero weights contribute nothing, and an
    all-zero-out-weight node is dangling. Dangling-node mass is
    redistributed uniformly, so ranks sum to 1 every iteration — the
    Brin/Page formulation:

        r'(v) = (1-d)/N + d * (sum_{u->v} r(u)/outdeg(u) + dangling/N)

    With ``seeds`` (an iterable of node ids) the uniform restart
    vector 1/N is replaced by the PERSONALIZED restart p — uniform
    over the seed nodes present in the graph, zero elsewhere — and
    the dangling mass is likewise redistributed to p (the standard
    personalized-PageRank / random-walk-with-restart formulation):

        r'(v) = (1-d)*p(v) + d * (sum_{u->v} r(u)/outdeg(u)
                                  + dangling * p(v))

    Seed ids absent from the graph are ignored; an empty effective
    seed set raises. The seed set is assumed driver-small (that is
    the point of a personalized restart); it is ``ray.put`` once and
    membership-tested vectorized inside the sharded path.

    Scale shape: the edge set is never collected — each iteration is
    one streaming ``map_batches`` pass that emits per-block PARTIAL
    (dst, contribution) group-sums (combiner pattern: the exchange
    carries one row per distinct dst per block, never raw edges). The
    rank/outdeg state is one float per node, ``ray.put`` once per
    iteration and guarded at ``max_nodes`` — the same driver-held
    iteration-state bound as ``similarity.kmeans`` centroids; beyond
    it, shard the rank table and switch the contribution lookup to a
    shuffle join (see ``connected_components`` for the distributed-
    state pattern). Returns a pandas DataFrame (node, rank), rank
    summing to 1.0."""
    import pandas as pd
    import ray

    seed_arr = None
    if seeds is not None:
        seed_arr = np.unique(np.asarray(list(seeds), dtype=np.int64))

    def restart_vec(nodes: np.ndarray) -> np.ndarray:
        """p over the sorted node array: uniform (seeds=None) or
        uniform over the seed∩graph intersection."""
        if seed_arr is None:
            return np.full(len(nodes), 1.0 / len(nodes))
        pos = np.searchsorted(nodes, seed_arr)
        pos = pos[(pos < len(nodes)) & (nodes[np.minimum(
            pos, len(nodes) - 1)] == seed_arr)]
        if pos.size == 0:
            raise ValueError("personalized pagerank: no seed id is "
                             "present in the graph")
        p = np.zeros(len(nodes))
        p[pos] = 1.0 / pos.size
        return p

    # Materialize the 16 B/row edge projection ONCE: every iteration
    # streams over it, and a lazy `proj` would re-execute the whole
    # upstream pipeline (parquet read + edge construction) per
    # iteration. The copy lives in the object store (spillable), never
    # on the driver.
    def project(t: pa.Table, c=(src_col, dst_col)) -> pa.Table:
        cols = list(c) + ([weight_col] if weight_col else [])
        t = _drop_null_endpoints(t.select(cols), c[0], c[1])
        if weight_col:
            w = t.column(weight_col).cast(pa.float64())
            t = t.set_column(t.column_names.index(weight_col), "__w", w) \
                .filter(pc.is_valid(w))
            # weights must be >= 0: a negative weight flips out-degree
            # and share signs, so ranks silently stop being a
            # probability distribution — fail fast (null weights are
            # dropped above, mirroring that explicit policy)
            neg = pc.sum(pc.cast(pc.less(t.column("__w"), 0.0),
                                 pa.int64())).as_py()
            if neg:
                raise ValueError(
                    f"pagerank: {neg} negative values in weight column "
                    f"{weight_col!r}; edge weights must be >= 0")
        return t

    proj = edges.map_batches(project, batch_format="pyarrow",
                             batch_size=None).materialize()
    if proj.count() == 0:      # before the size dispatch: an empty
        # projection has no schema to collect on either path
        return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="float64")})

    # Small-graph fast path (size-dispatched like sized_join): when the
    # materialized 16 B/row projection fits the same byte budget as a
    # broadcast join side, collect it ONCE and run every iteration as
    # numpy scatter-adds — 10 Ray passes + 10 driver collects become 1
    # collect, identical math (multigraph weights via bincount, same
    # dangling redistribution). Past the threshold the streaming
    # combiner path below handles web-scale graphs unchanged.
    import os

    thr = int(os.environ.get("FFR_LOCAL_GRAPH_BYTES", 64 << 20))
    if (proj.size_bytes() or thr + 1) <= thr:
        df = proj.to_pandas()
        s = df[src_col].to_numpy(dtype=np.int64)
        d = df[dst_col].to_numpy(dtype=np.int64)
        if s.size == 0:
            return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                 "rank": pd.Series([], dtype="float64")})
        wv = (df["__w"].to_numpy(np.float64) if weight_col
              else np.ones(s.size))
        nodes = np.unique(np.concatenate([s, d]))
        n = len(nodes)
        si = np.searchsorted(nodes, s)
        di = np.searchsorted(nodes, d)
        outdeg = np.bincount(si, weights=wv, minlength=n)
        dangling = outdeg == 0
        safe_deg = np.where(dangling, 1.0, outdeg)
        p = restart_vec(nodes)
        rank = p.copy()
        for _ in range(iters):
            share = np.where(dangling, 0.0, rank / safe_deg)
            inflow = np.bincount(di, weights=share[si] * wv, minlength=n)
            d_mass = float(rank[dangling].sum())
            rank = (1.0 - damping) * p + damping * (inflow + d_mass * p)
        return pd.DataFrame({"node": nodes, "rank": rank})

    # node ids + (weighted) outdegree: two small combiner group-bys
    def deg_partial(t: pa.Table) -> pa.Table:
        if weight_col:
            g = pa.table({src_col: t.column(src_col),
                          "w": t.column("__w")}) \
                .group_by(src_col).aggregate([("w", "sum")])
            od = g.column("w_sum").cast(pa.float64()).combine_chunks()
        else:
            g = t.group_by(src_col).aggregate([([], "count_all")])
            od = g.column("count_all").cast(pa.float64()).combine_chunks()
        d = t.select([dst_col]).rename_columns(["node"]) \
            .group_by("node").aggregate([])
        return pa.table({
            "node": pa.concat_arrays([
                g.column(src_col).cast(pa.int64()).combine_chunks(),
                d.column("node").cast(pa.int64()).combine_chunks()]),
            "outdeg": pa.concat_arrays([
                od, pa.array(np.zeros(d.num_rows, np.float64))])})

    nparts = shuffle_partitions()
    deg_ds = (proj.map_batches(deg_partial, batch_format="pyarrow",
                               batch_size=None)
              .groupby("node", num_partitions=nparts).sum("outdeg")
              .map_batches(_canon_keyed("node", "outdeg"),
                           batch_format="pyarrow", batch_size=None)
              .materialize())
    n = deg_ds.count()
    if n == 0:
        return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="float64")})
    if n > max_nodes:
        # per-node state exceeds the driver budget: dispatch to the
        # sharded rank-exchange path (state stays a Dataset end to end)
        out = pagerank_sharded(proj, deg_ds, n, src_col, dst_col,
                               damping=damping, iters=iters,
                               nparts=nparts, seed_arr=seed_arr,
                               weighted=bool(weight_col)) \
            .select_columns(["node", "rank"]).to_pandas()
        out["node"] = out["node"].astype("int64")
        out["rank"] = out["rank"].astype("float64")
        return out.sort_values("node").reset_index(drop=True)
    deg = deg_ds.to_pandas()
    nodes = deg["node"].to_numpy(dtype=np.int64)
    order = np.argsort(nodes)
    nodes, outdeg = nodes[order], deg["outdeg"].to_numpy(np.float64)[order]
    pvec = restart_vec(nodes)
    rank = pvec.copy()
    dangling = outdeg == 0
    safe_deg = np.where(dangling, 1.0, outdeg)

    for _ in range(iters):
        share = np.where(dangling, 0.0, rank / safe_deg)
        ref = ray.put((nodes, share))

        def contrib(t: pa.Table, ref=ref) -> pa.Table:
            nodes, share = ray.get(ref)
            s = t.column(src_col).cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            c = share[np.searchsorted(nodes, s)]
            if "__w" in t.column_names:
                c = c * t.column("__w").to_numpy(zero_copy_only=False)
            g = pa.table({"dst": t.column(dst_col).cast(pa.int64()),
                          "c": pa.array(c, pa.float64())}) \
                .group_by("dst").aggregate([("c", "sum")])
            return g.rename_columns(["dst", "c"])

        p = proj.map_batches(contrib, batch_format="pyarrow",
                             batch_size=None).to_pandas()
        agg = p.groupby("dst", as_index=False)["c"].sum()
        inflow = np.zeros(n)
        inflow[np.searchsorted(nodes, agg["dst"].to_numpy(np.int64))] = \
            agg["c"].to_numpy(np.float64)
        d_mass = float(rank[dangling].sum())
        rank = (1.0 - damping) * pvec + \
            damping * (inflow + d_mass * pvec)

    return pd.DataFrame({"node": nodes, "rank": rank})


def personalized_pagerank(edges, seeds, src_col: str = "src",
                          dst_col: str = "dst", *, damping: float = 0.85,
                          iters: int = 20, max_nodes: int = 5_000_000,
                          weight_col: str | None = None):
    """Random walk with restart to a seed set — relevance of every
    node to the seeds (seed-expansion for curation: 'documents/repos
    related to this known-good set'). Thin wrapper over ``pagerank``
    with the personalized restart vector (optionally edge-weighted via
    ``weight_col``); see there for the scale shape (streaming combiner
    per iteration, sharded state past ``max_nodes``)."""
    return pagerank(edges, src_col, dst_col, damping=damping,
                    iters=iters, max_nodes=max_nodes, seeds=seeds,
                    weight_col=weight_col)


def hits(edges, src_col: str = "src", dst_col: str = "dst", *,
         iters: int = 10, max_nodes: int = 5_000_000):
    """HITS hub/authority scores over a directed edge-list Dataset
    (Kleinberg; parallel edges add weight — multigraph semantics).
    Per iteration, from an all-ones hub start:

        a(v) <- sum_{u->v} h(u),  then L2-normalize a over all nodes
        h(u) <- sum_{u->v} a(v),  then L2-normalize h

    so after ``iters`` rounds a/h are the power-iteration estimates of
    the principal eigenvectors of AᵀA / AAᵀ. On a directed BIPARTITE
    graph (e.g. part->supplier co-purchase) hubs and authorities
    separate cleanly: pure sources score h>0, a=0 and sinks the
    reverse — the structure PageRank's single rank cannot express.

    Scale shape mirrors ``pagerank``: the 16 B/row edge projection is
    materialized once; a small graph collects it and runs numpy
    scatter-adds; a mid-size graph keeps the edges distributed and
    broadcasts the node-sized score vector per half-step (per-block
    (node, partial-sum) combiners — only distinct-node rows reach the
    exchange); past ``max_nodes`` it dispatches to ``hits_sharded``
    where the (node, a, h) state stays a Dataset end to end and the
    driver only ever sees the two L2-norm scalars per iteration.
    Returns a pandas DataFrame (node, authority, hub)."""
    import os

    import pandas as pd
    import ray

    proj = edges.map_batches(
        lambda t, c=(src_col, dst_col): _drop_null_endpoints(
            t.select(list(c)), c[0], c[1]),
        batch_format="pyarrow", batch_size=None).materialize()
    empty = pd.DataFrame({"node": pd.Series([], dtype="int64"),
                          "authority": pd.Series([], dtype="float64"),
                          "hub": pd.Series([], dtype="float64")})
    if proj.count() == 0:
        return empty

    def finish(nodes, a, h):
        return pd.DataFrame({"node": nodes, "authority": a, "hub": h})

    thr = int(os.environ.get("FFR_LOCAL_GRAPH_BYTES", 64 << 20))
    if (proj.size_bytes() or thr + 1) <= thr:
        df = proj.to_pandas()
        s = df[src_col].to_numpy(dtype=np.int64)
        d = df[dst_col].to_numpy(dtype=np.int64)
        nodes = np.unique(np.concatenate([s, d]))
        n = len(nodes)
        si = np.searchsorted(nodes, s)
        di = np.searchsorted(nodes, d)
        h = np.ones(n)
        a = np.zeros(n)
        for _ in range(iters):
            a = np.bincount(di, weights=h[si], minlength=n)
            a /= max(float(np.sqrt((a * a).sum())), 1e-300)
            h = np.bincount(si, weights=a[di], minlength=n)
            h /= max(float(np.sqrt((h * h).sum())), 1e-300)
        return finish(nodes, a, h)

    # node universe: one combiner pass (distinct endpoints per block)
    def node_partial(t: pa.Table) -> pa.Table:
        u = pa.concat_arrays([
            t.column(src_col).cast(pa.int64()).combine_chunks(),
            t.column(dst_col).cast(pa.int64()).combine_chunks()])
        return pa.table({"node": pc.unique(u)})

    nparts = shuffle_partitions()
    node_ds = (proj.map_batches(node_partial, batch_format="pyarrow",
                                batch_size=None)
               .groupby("node", num_partitions=nparts).count()
               .materialize())
    n = node_ds.count()
    if n > max_nodes:
        out = hits_sharded(proj, node_ds, src_col, dst_col,
                           iters=iters, nparts=nparts) \
            .select_columns(["node", "authority", "hub"]).to_pandas()
        out["node"] = out["node"].astype("int64")
        return out.sort_values("node").reset_index(drop=True)
    nodes = np.sort(node_ds.select_columns(["node"]).to_pandas()
                    ["node"].to_numpy(np.int64))

    def half_step(score: np.ndarray, lookup_col: str, emit_col: str):
        """One HITS half-step: broadcast the node-sized score, stream
        the edges once emitting per-block (emit_col-node, partial-sum)
        rows, fold on the driver's node array."""
        ref = ray.put((nodes, score))

        def contrib(t: pa.Table, ref=ref) -> pa.Table:
            nd, sc = ray.get(ref)
            src = t.column(lookup_col).cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            c = sc[np.searchsorted(nd, src)]
            g = pa.table({"node": t.column(emit_col).cast(pa.int64()),
                          "c": pa.array(c, pa.float64())}) \
                .group_by("node").aggregate([("c", "sum")])
            return g.rename_columns(["node", "c"])

        p = proj.map_batches(contrib, batch_format="pyarrow",
                             batch_size=None).to_pandas()
        agg = p.groupby("node", as_index=False)["c"].sum()
        out = np.zeros(len(nodes))
        out[np.searchsorted(nodes, agg["node"].to_numpy(np.int64))] = \
            agg["c"].to_numpy(np.float64)
        return out / max(float(np.sqrt((out * out).sum())), 1e-300)

    h = np.ones(len(nodes))
    a = np.zeros(len(nodes))
    for _ in range(iters):
        a = half_step(h, src_col, dst_col)
        h = half_step(a, dst_col, src_col)
    return finish(nodes, a, h)


def hits_sharded(proj, node_ds, src_col: str, dst_col: str, *,
                 iters: int, nparts: int):
    """Distributed-state HITS past ``hits``'s ``max_nodes`` guard: the
    (node, a, h) score table stays a Dataset end to end; the driver
    only sees one L2-norm scalar per half-step. Each half-step is ONE
    ``sized_join`` of the edge projection against the node-scale score
    table (broadcast while small, hash exchange past it) with a
    per-block (node, partial) combiner, then ONE keyed merge groupby
    folding the new score into the state — the ``pagerank_sharded``
    exchange pattern with the dangling-mass fold replaced by the norm
    scalar. ``proj`` must be the materialized null-free projection and
    ``node_ds`` the distinct-node table."""
    from .join import sized_join

    def init_state(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node").cast(pa.int64()),
                         "authority": pa.array(
                             np.zeros(t.num_rows, np.float64)),
                         "hub": pa.array(
                             np.ones(t.num_rows, np.float64))})

    state = node_ds.map_batches(init_state, batch_format="pyarrow",
                                batch_size=None).materialize()

    def canon_sum(t: pa.Table) -> pa.Table:
        # post-shuffle schema guard: empty hash partitions carry no
        # schema; non-empty blocks arrive as (node, sum(s))
        if t.num_rows == 0 or t.num_columns != 2:
            return pa.table({"node": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64())})
        t = t.rename_columns(["node", "s"])
        return pa.table({"node": t.column("node").cast(pa.int64()),
                         "s": t.column("s").cast(pa.float64())})

    def half_step(state, score_col: str, out_col: str,
                  lookup_col: str, emit_col: str):
        share = state.map_batches(
            lambda t, c=score_col: pa.table(
                {"jnode": t.column("node").cast(pa.int64()),
                 "score": t.column(c).cast(pa.float64())}),
            batch_format="pyarrow", batch_size=None).materialize()
        joined = sized_join(proj, share, on=(lookup_col,),
                            right_on=("jnode",),
                            left_bytes=proj.size_bytes(),
                            right_bytes=share.size_bytes())

        def contrib_partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "score" not in t.column_names:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.float64())})
            g = pa.table({"node": t.column(emit_col).cast(pa.int64()),
                          "s": t.column("score").cast(pa.float64())}) \
                .group_by("node").aggregate([("s", "sum")])
            return g.rename_columns(["node", "s"])

        raw = joined.map_batches(contrib_partial, batch_format="pyarrow",
                                 batch_size=None)
        zero = state.map_batches(
            lambda t: pa.table(
                {"node": t.column("node").cast(pa.int64()),
                 "s": pa.array(np.zeros(t.num_rows, np.float64))}),
            batch_format="pyarrow", batch_size=None)
        summed = (zero.union(raw)
                  .groupby("node", num_partitions=nparts).sum("s")
                  .map_batches(canon_sum, batch_format="pyarrow",
                               batch_size=None)
                  .materialize())
        sq = summed.map_batches(
            lambda t: pa.table({"q": pc.multiply(t.column("s"),
                                                 t.column("s"))}),
            batch_format="pyarrow", batch_size=None).sum("q") or 0.0
        z = max(float(np.sqrt(sq)), 1e-300)

        norm = summed.map_batches(
            lambda t, z=z: pa.table(
                {"mnode": t.column("node").cast(pa.int64()),
                 "ns": pc.divide(t.column("s"), pa.scalar(z))}),
            batch_format="pyarrow", batch_size=None).materialize()
        keep = "hub" if out_col == "authority" else "authority"
        merged = sized_join(state.select_columns(["node", keep]), norm,
                            on=("node",), right_on=("mnode",),
                            left_bytes=state.size_bytes(),
                            right_bytes=norm.size_bytes())
        return merged.map_batches(
            lambda t, k=keep, o=out_col: pa.table(
                {"node": t.column("node").cast(pa.int64()),
                 "authority": t.column("ns" if o == "authority"
                                       else k).cast(pa.float64()),
                 "hub": t.column("ns" if o == "hub"
                                 else k).cast(pa.float64())}),
            batch_format="pyarrow", batch_size=None).materialize()

    for _ in range(iters):
        state = half_step(state, "hub", "authority", src_col, dst_col)
        state = half_step(state, "authority", "hub", dst_col, src_col)
    return state


def pagerank_sharded(proj, deg_ds, n: int, src_col: str, dst_col: str, *,
                     damping: float, iters: int, nparts: int,
                     seed_arr=None, weighted: bool = False):
    """Distributed-state PageRank for graphs whose per-node rank table
    exceeds the driver budget (``pagerank``'s ``max_nodes`` dispatch):
    the (node, outdeg, rank) state lives in a Dataset end to end — the
    driver only ever sees the scalar dangling mass per iteration.

    Iteration = ONE sized_join of the materialized 16 B/row edge
    projection against the node-scale share table (broadcast while it
    fits ``FFR_BROADCAST_BYTES``, hash exchange past it) with a
    per-block (dst, partial-sum) combiner, plus ONE keyed merge groupby
    folding inflow back into the state — two exchanges per iteration,
    zero driver-held node arrays. Same Brin/Page dangling-mass
    redistribution as the driver-held path (ranks sum to 1 every
    iteration). Returns the final state Dataset (node, outdeg, rank).
    ``proj`` must be the materialized null-free (src, dst) projection;
    ``deg_ds`` the materialized (node, outdeg) table with ``n`` rows.
    """
    from .join import sized_join

    import ray

    inv_n = 1.0 / n

    # Personalized restart (seed_arr is driver-small by contract —
    # see pagerank): broadcast the sorted id array once and compute
    # p(node) vectorized per block; k = seeds actually in the graph,
    # counted with one tiny combiner pass so absent ids are ignored
    # exactly like the driver-held path.
    seeds_ref = None
    inv_k = 0.0
    if seed_arr is not None:
        seeds_ref = ray.put(seed_arr)

        def seed_hits(t: pa.Table) -> pa.Table:
            sa = ray.get(seeds_ref)
            node = t.column("node").cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            return pa.table({"hits": pa.array(
                [int(np.isin(node, sa).sum())], pa.int64())})

        k = deg_ds.map_batches(seed_hits, batch_format="pyarrow",
                               batch_size=None).sum("hits") or 0
        if k == 0:
            raise ValueError("personalized pagerank: no seed id is "
                             "present in the graph")
        inv_k = 1.0 / k

    def p_of(node: np.ndarray) -> np.ndarray:
        if seeds_ref is None:
            return np.full(len(node), inv_n)
        sa = ray.get(seeds_ref)
        return np.where(np.isin(node, sa), inv_k, 0.0)

    def init_rank(t: pa.Table) -> pa.Table:
        node = t.column("node").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return t.append_column("rank", pa.array(p_of(node), pa.float64()))

    state = deg_ds.map_batches(init_rank, batch_format="pyarrow",
                               batch_size=None).materialize()

    def share_fn(t: pa.Table) -> pa.Table:
        od = t.column("outdeg").cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        r = t.column("rank").to_numpy(zero_copy_only=False)
        # divide by the true (possibly fractional, weighted) degree —
        # never clamp it: a 0.2 total out-weight still splits all of r
        s = np.where(od > 0, r / np.where(od > 0, od, 1.0), 0.0)
        return pa.table({"node": t.column("node").cast(pa.int64()),
                         "share": pa.array(s, pa.float64())})

    def zero_rows(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node").cast(pa.int64()),
                         "outdeg": t.column("outdeg").cast(pa.float64()),
                         "inflow": pa.array(
                             np.zeros(t.num_rows, np.float64))})

    def contrib_partial(t: pa.Table) -> pa.Table:
        # per-block combiner: the exchange carries one row per distinct
        # dst per block, never raw joined edges
        if t.num_rows == 0 or "share" not in t.column_names:
            return pa.table({"node": pa.array([], pa.int64()),
                             "outdeg": pa.array([], pa.float64()),
                             "inflow": pa.array([], pa.float64())})
        contrib = t.column("share").cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        if weighted and "__w" in t.column_names:
            contrib = contrib * t.column("__w") \
                .to_numpy(zero_copy_only=False)
        g = pa.table({"node": t.column(dst_col).cast(pa.int64()),
                      "inflow": pa.array(contrib, pa.float64())}) \
            .group_by("node").aggregate([("inflow", "sum")])
        return pa.table({"node": g.column("node"),
                         "outdeg": pa.array(np.zeros(g.num_rows,
                                                     np.float64)),
                         "inflow": g.column("inflow_sum")})

    for _ in range(iters):
        d_mass = state.filter(expr="outdeg == 0").sum("rank") or 0.0
        share = state.map_batches(share_fn, batch_format="pyarrow",
                                  batch_size=None).materialize()
        joined = sized_join(proj, share, on=(src_col,), right_on=("node",),
                            left_bytes=proj.size_bytes(),
                            right_bytes=share.size_bytes())
        inflow_parts = joined.map_batches(
            contrib_partial, batch_format="pyarrow", batch_size=None)
        base = state.map_batches(zero_rows, batch_format="pyarrow",
                                 batch_size=None)

        def fold(t: pa.Table, dm: float = d_mass) -> pa.Table:
            # post-shuffle canon (empty hash partitions carry no
            # schema) + the rank update in one pass
            if t.num_rows == 0 or t.num_columns != 3:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "outdeg": pa.array([], pa.float64()),
                                 "rank": pa.array([], pa.float64())})
            t = t.rename_columns(["node", "outdeg", "inflow"])
            inflow = t.column("inflow").to_numpy(zero_copy_only=False)
            node_np = t.column("node").cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            p = p_of(node_np)
            rank = (1.0 - damping) * p + damping * (inflow + dm * p)
            return pa.table({"node": t.column("node").cast(pa.int64()),
                             "outdeg": t.column("outdeg")
                             .cast(pa.float64()),
                             "rank": pa.array(rank, pa.float64())})

        state = (base.union(inflow_parts)
                 .groupby("node", num_partitions=nparts)
                 .sum(["outdeg", "inflow"])
                 .map_batches(fold, batch_format="pyarrow",
                              batch_size=None)
                 .materialize())
    return state


def degree_table(edges, src_col: str = "src", dst_col: str = "dst"):
    """In/out degree per node over a directed edge multiset — the
    degree-distribution profile (hub detection, skew diagnosis before
    a graph algorithm picks its partitioning). Combiner shape: each
    block emits per-node partial counts; the exchange carries one row
    per distinct node per block, never raw edges. Returns a pandas
    DataFrame (node, out_deg, in_deg) sorted by node."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(src_col).aggregate([([], "count_all")])
        h = t.group_by(dst_col).aggregate([([], "count_all")])
        return pa.table({
            "node": pa.concat_arrays([
                g.column(src_col).cast(pa.int64()).combine_chunks(),
                h.column(dst_col).cast(pa.int64()).combine_chunks()]),
            "out_deg": pa.concat_arrays([
                g.column("count_all").cast(pa.int64()).combine_chunks(),
                pa.array(np.zeros(h.num_rows, np.int64))]),
            "in_deg": pa.concat_arrays([
                pa.array(np.zeros(g.num_rows, np.int64)),
                h.column("count_all").cast(pa.int64()).combine_chunks()])})

    proj = edges.map_batches(
        lambda t, c=(src_col, dst_col): _drop_null_endpoints(
            t.select(list(c)), c[0], c[1]),
        batch_format="pyarrow", batch_size=None)
    parts = proj.map_batches(partial, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                             "out_deg": pd.Series([], dtype="int64"),
                             "in_deg": pd.Series([], dtype="int64")})
    out = parts.groupby("node", as_index=False)[["out_deg", "in_deg"]].sum()
    out["out_deg"] = out["out_deg"].astype("int64")
    out["in_deg"] = out["in_deg"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def canonical_edges(edges, a_col: str = "a", b_col: str = "b"):
    """Undirected SIMPLE-graph edge set from a directed/multi edge list:
    each edge re-oriented to (lo, hi) with lo < hi, self-loops dropped,
    duplicates removed by ONE hash-partitioned groupby on the pair.

    Scale shape: the map side emits an 16 B/row two-int projection (a
    per-block ``group_by`` pre-dedups before the exchange), the shuffle
    dedups exactly, and the result comes back compacted to balanced
    non-empty blocks so it can feed Ray's hash join directly (see the
    empty-leading-block caveat in ``connected_components``). Returns a
    materialized Dataset with int64 columns (lo, hi)."""
    import ray.data as _rd

    def canon(t: pa.Table) -> pa.Table:
        t = _drop_null_endpoints(t, a_col, b_col)
        a = t.column(a_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = t.column(b_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        keep = lo != hi
        part = pa.table({"lo": lo[keep], "hi": hi[keep]})
        return part.group_by(["lo", "hi"]).aggregate([])  # block-local dedup

    def keys_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or not {"lo", "hi"} <= set(t.column_names):
            empty = pa.array([], pa.int64())
            return pa.table({"lo": empty, "hi": empty})
        return pa.table({"lo": t.column("lo").cast(pa.int64()),
                         "hi": t.column("hi").cast(pa.int64())})

    from .join import partitions_for_bytes

    nparts = shuffle_partitions()
    # Materialize the block-deduped 16 B/row projection first: the
    # shuffle would materialize it into the object store anyway, and a
    # materialized input gives a FREE size_bytes() to size the exchange
    # (fixed per-partition cost dominates KB..MB shuffles at the
    # CPU-derived default; 100 TB still gets thousands of partitions).
    pre = edges.map_batches(canon, batch_format="pyarrow",
                            batch_size=None).materialize()
    np_ = min(nparts, partitions_for_bytes(pre.size_bytes() or 0))
    e = (pre.groupby(["lo", "hi"], num_partitions=np_).count()
         .map_batches(keys_only, batch_format="pyarrow", batch_size=None)
         .materialize())
    m = e.count()
    if m == 0:
        empty = pa.array([], pa.int64())
        return _rd.from_arrow(pa.table({"lo": empty, "hi": empty}))
    return e.repartition(min(nparts, m)).materialize()


def triangle_count(edges, a_col: str = "a", b_col: str = "b"):
    """Exact per-node triangle counts over the undirected simple graph.

    Classic two-join triangle enumeration on ID-oriented edges: with
    every edge stored canonically as (lo < hi), a wedge a<b<c is one
    hash join E(a,b) |x|_b E(b,c), and closing it is a second hash
    join of the wedge set against E on (a, c) — each triangle is
    produced exactly once. Per-node counts then fold through the
    degree_table combiner shape (per-block partials, node-scale merge).

    Scale notes: wedge volume is sum_b lo_deg(b)*hi_deg(b); production
    systems cut it further by orienting edges from low to high DEGREE
    (two extra narrow joins against degree_table) instead of low to
    high id — same outputs, documented here as the knob to pull when a
    skewed graph makes the id-orientation wedge set explode. All three
    relations in the joins are the narrow (int64, int64) edge set; the
    original payload never moves.

    Returns a pandas DataFrame (node, tri_cnt) for every node in >= 1
    triangle, sorted by node."""
    import pandas as pd

    e = canonical_edges(edges, a_col, b_col)
    if e.count() == 0:
        return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                             "tri_cnt": pd.Series([], dtype="int64")})
    from .join import sized_join

    ab = e.map_batches(_canon2(["a", "b"]), batch_format="pyarrow",
                       batch_size=None).materialize()
    bc = e.map_batches(_canon2(["b", "c"]), batch_format="pyarrow",
                       batch_size=None).materialize()
    # inputs are materialized: size_bytes() is free metadata — a small
    # edge set broadcasts (zero exchange, no JoinOperator spin-up), a
    # web-scale one takes the byte-sized hash join
    wedges = sized_join(ab, bc, on=("b",),
                        left_bytes=ab.size_bytes(),
                        right_bytes=bc.size_bytes()).materialize()
    nw = wedges.count()
    if nw == 0:
        return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                             "tri_cnt": pd.Series([], dtype="int64")})
    ac = e.map_batches(_canon2(["a", "c"]), batch_format="pyarrow",
                       batch_size=None).materialize()
    tri = sized_join(wedges, ac, on=("a", "c"),
                     left_bytes=wedges.size_bytes(),
                     right_bytes=ac.size_bytes())

    def node_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            empty = pa.array([], pa.int64())
            return pa.table({"node": empty, "tri_cnt": empty})
        nodes = pa.concat_arrays([
            t.column(c).cast(pa.int64()).combine_chunks()
            for c in ("a", "b", "c")])
        g = pa.table({"node": nodes}).group_by("node") \
            .aggregate([([], "count_all")])
        return pa.table({"node": g.column("node"),
                         "tri_cnt": g.column("count_all").cast(pa.int64())})

    parts = tri.map_batches(node_partial, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                             "tri_cnt": pd.Series([], dtype="int64")})
    out = parts.groupby("node", as_index=False)["tri_cnt"].sum()
    out["node"] = out["node"].astype("int64")
    out["tri_cnt"] = out["tri_cnt"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def edge_jaccard(edges, a_col: str = "a", b_col: str = "b"):
    """Per-EDGE neighborhood Jaccard similarity — the edge weight used
    by Jarvis-Patrick style clustering and graph sparsifiers ("keep an
    edge only if its endpoints share enough neighbors").

    For each undirected edge (u, v): common = |N(u) ∩ N(v)| and
    jaccard = common / (deg(u) + deg(v) - common), where N excludes u
    and v themselves (no self-loops survive canonicalization).

    Exploits the triangle identity instead of a neighbor-set join: a
    triangle (a<b<c) contributes one common neighbor to EACH of its
    three edges, so common(u,v) = number of triangles containing the
    edge. Cost = the two triangle joins + a keyed combiner merge over
    the triangle set + three narrow hash joins (common counts, then
    the two endpoint degrees) — everything stays a Dataset, so an
    edge set that is itself web-scale never touches the driver; edges
    in no triangle get common=0 via the left-outer join.

    Returns a Dataset with columns (lo, hi, common, deg_lo, deg_hi,
    jaccard)."""
    import ray.data as _rd

    e = canonical_edges(edges, a_col, b_col)
    cols = ["lo", "hi", "common", "deg_lo", "deg_hi", "jaccard"]
    if e.count() == 0:
        empty = pa.array([], pa.int64())
        return _rd.from_arrow(pa.table({
            "lo": empty, "hi": empty, "common": empty,
            "deg_lo": empty, "deg_hi": empty,
            "jaccard": pa.array([], pa.float64())}))
    from .join import sized_join

    nparts = shuffle_partitions()
    ab = e.map_batches(_canon2(["a", "b"]), batch_format="pyarrow",
                       batch_size=None).materialize()
    bc = e.map_batches(_canon2(["b", "c"]), batch_format="pyarrow",
                       batch_size=None).materialize()
    wedges = sized_join(ab, bc, on=("b",), left_bytes=ab.size_bytes(),
                        right_bytes=bc.size_bytes()).materialize()
    ac = e.map_batches(_canon2(["a", "c"]), batch_format="pyarrow",
                       batch_size=None).materialize()

    def edge_partial(t: pa.Table) -> pa.Table:
        # each triangle (a,b,c) -> +1 common neighbor on edges
        # (a,b) [shared c], (a,c) [shared b], (b,c) [shared a]
        if t.num_rows == 0:
            empty = pa.array([], pa.int64())
            return pa.table({"lo": empty, "hi": empty, "common": empty})
        a = t.column("a").cast(pa.int64()).combine_chunks()
        b = t.column("b").cast(pa.int64()).combine_chunks()
        c = t.column("c").cast(pa.int64()).combine_chunks()
        pairs = pa.table({"lo": pa.concat_arrays([a, a, b]),
                          "hi": pa.concat_arrays([b, c, c])})
        g = pairs.group_by(["lo", "hi"]).aggregate([([], "count_all")])
        return pa.table({"lo": g.column("lo"), "hi": g.column("hi"),
                         "common": g.column("count_all").cast(pa.int64())})

    def canon_common(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or not {"lo", "hi"} <= set(t.column_names):
            empty = pa.array([], pa.int64())
            return pa.table({"lo": empty, "hi": empty, "common": empty})
        val = [c for c in t.column_names if c not in ("lo", "hi")][0]
        return pa.table({"lo": t.column("lo").cast(pa.int64()),
                         "hi": t.column("hi").cast(pa.int64()),
                         "common": t.column(val).cast(pa.int64())})

    out = e
    nw = wedges.count()
    have_common = False
    if nw > 0:
        tri = sized_join(wedges, ac, on=("a", "c"),
                         left_bytes=wedges.size_bytes(),
                         right_bytes=ac.size_bytes())
        common = (tri.map_batches(edge_partial, batch_format="pyarrow",
                                  batch_size=None)
                  .groupby(["lo", "hi"], num_partitions=min(
                      nparts, max(nw, 1)))
                  .sum("common")
                  .map_batches(canon_common, batch_format="pyarrow",
                               batch_size=None)
                  .materialize())
        nc = common.count()
        if nc > 0:
            out = sized_join(e, common, on=("lo", "hi"), how="left outer",
                             left_bytes=e.size_bytes(),
                             right_bytes=common.size_bytes()).materialize()
            have_common = True
    if not have_common:
        out = e.map_batches(
            lambda t: t.append_column(
                "common", pa.array(np.zeros(t.num_rows, np.int64))),
            batch_format="pyarrow", batch_size=None).materialize()

    # undirected degree per node as a Dataset (per-block combiner
    # partials -> one keyed sum — node-scale rows on the exchange)
    def deg_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            empty = pa.array([], pa.int64())
            return pa.table({"node": empty, "deg": empty})
        nodes = pa.concat_arrays([
            t.column("lo").cast(pa.int64()).combine_chunks(),
            t.column("hi").cast(pa.int64()).combine_chunks()])
        g = pa.table({"node": nodes}).group_by("node") \
            .aggregate([([], "count_all")])
        return pa.table({"node": g.column("node"),
                         "deg": g.column("count_all").cast(pa.int64())})

    deg = (e.map_batches(deg_partial, batch_format="pyarrow",
                         batch_size=None)
           .groupby("node", num_partitions=nparts).sum("deg")
           .map_batches(_canon2(["node", "deg"]), batch_format="pyarrow",
                        batch_size=None)
           .materialize())
    deg_lo = deg.map_batches(_canon2(["lo", "deg_lo"]),
                             batch_format="pyarrow", batch_size=None) \
        .materialize()
    deg_hi = deg.map_batches(_canon2(["hi", "deg_hi"]),
                             batch_format="pyarrow", batch_size=None) \
        .materialize()
    out = sized_join(out, deg_lo, on=("lo",),
                     left_bytes=out.size_bytes(),
                     right_bytes=deg_lo.size_bytes()).materialize()
    out = sized_join(out, deg_hi, on=("hi",),
                     left_bytes=out.size_bytes(),
                     right_bytes=deg_hi.size_bytes())

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or not {"lo", "hi"} <= set(t.column_names):
            empty = pa.array([], pa.int64())
            return pa.table({"lo": empty, "hi": empty, "common": empty,
                             "deg_lo": empty, "deg_hi": empty,
                             "jaccard": pa.array([], pa.float64())})
        com = t.column("common").cast(pa.int64()) \
            .fill_null(0).to_numpy(zero_copy_only=False)
        dl = t.column("deg_lo").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        dh = t.column("deg_hi").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        denom = dl + dh - com
        jac = np.divide(com, denom, out=np.zeros(len(com), np.float64),
                        where=denom > 0)
        return pa.table({"lo": t.column("lo").cast(pa.int64()),
                         "hi": t.column("hi").cast(pa.int64()),
                         "common": pa.array(com), "deg_lo": pa.array(dl),
                         "deg_hi": pa.array(dh), "jaccard": pa.array(jac)})

    return out.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def kcore(edges, k: int, a_col: str = "a", b_col: str = "b",
          max_iters: int = 100):
    """k-core decomposition: the maximal subgraph where every node has
    degree >= k — the standard dense-cluster extractor (spam rings,
    community nuclei) and a stronger filter than degree alone, since
    removing one low-degree node can cascade.

    Iterative peeling, all in Datasets: each round computes degrees
    with the per-block combiner (node-scale exchange), keeps nodes
    with deg >= k, and semi-joins the edge set down to edges whose
    BOTH endpoints survive (two narrow hash joins). Terminates when a
    round removes nothing — at most O(peeling depth) rounds, each a
    fixed shuffle budget; the driver only ever sees two scalars per
    round (edge/node counts). Returns a pandas DataFrame
    (node, core_deg) for the k-core members with their degree INSIDE
    the core, sorted by node."""
    import pandas as pd

    from .join import sized_join

    e = canonical_edges(edges, a_col, b_col)
    nparts = shuffle_partitions()

    def deg_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            empty = pa.array([], pa.int64())
            return pa.table({"node": empty, "deg": empty})
        nodes = pa.concat_arrays([
            t.column("lo").cast(pa.int64()).combine_chunks(),
            t.column("hi").cast(pa.int64()).combine_chunks()])
        g = pa.table({"node": nodes}).group_by("node") \
            .aggregate([([], "count_all")])
        return pa.table({"node": g.column("node"),
                         "deg": g.column("count_all").cast(pa.int64())})

    empty_out = pd.DataFrame({"node": pd.Series([], dtype="int64"),
                              "core_deg": pd.Series([], dtype="int64")})
    n_edges = e.count()
    for _ in range(max_iters):
        if n_edges == 0:
            return empty_out
        deg = (e.map_batches(deg_partial, batch_format="pyarrow",
                             batch_size=None)
               .groupby("node", num_partitions=nparts).sum("deg")
               .map_batches(_canon2(["node", "deg"]),
                            batch_format="pyarrow", batch_size=None)
               .materialize())
        n_nodes = deg.count()
        alive = deg.filter(expr=f"deg >= {int(k)}").materialize()
        n_alive = alive.count()
        if n_alive == n_nodes:       # fixed point: nothing peeled
            out = deg.to_pandas()
            out["node"] = out["node"].astype("int64")
            out = out.rename(columns={"deg": "core_deg"})
            out["core_deg"] = out["core_deg"].astype("int64")
            return out.sort_values("node").reset_index(drop=True)
        if n_alive == 0:
            return empty_out
        a_lo = alive.map_batches(_canon2(["lo", "_d1"]),
                                 batch_format="pyarrow", batch_size=None) \
            .materialize()
        a_hi = alive.map_batches(_canon2(["hi", "_d2"]),
                                 batch_format="pyarrow", batch_size=None) \
            .materialize()
        # the alive set is node-scale — broadcast it against the edge
        # set while it fits (sized_join falls back to the hash
        # exchange past the byte threshold)
        e = sized_join(e, a_lo, on=("lo",), left_bytes=e.size_bytes(),
                       right_bytes=a_lo.size_bytes()).materialize()
        ne = e.count()
        if ne == 0:
            return empty_out
        e = (sized_join(e, a_hi, on=("hi",), left_bytes=e.size_bytes(),
                        right_bytes=a_hi.size_bytes())
             .map_batches(lambda t: _canon2(["lo", "hi"])(
                 t.select(["lo", "hi"]) if {"lo", "hi"} <= set(
                     t.column_names) else t),
                 batch_format="pyarrow", batch_size=None)
             .materialize())
        n_edges = e.count()
        if n_edges:
            e = e.repartition(min(nparts, n_edges)).materialize()
    raise RuntimeError(f"kcore: no fixed point after {max_iters} rounds")


def cooccur_edges(ds, group_col: str, item_col: str):
    """Distinct unordered co-occurrence pairs per group as an edge
    Dataset (a < b) — the standard graph builder ("parts bought in the
    same order", "repos touched by the same user") feeding
    triangle_count / edge_jaccard / kcore.

    Scale shape: per-block distinct-(group, item) combiner, then ONE
    bucket-keyed shuffle (bucket = item-group hash, complete groups
    per bucket) and a VECTORIZED pandas self-merge per bucket — C-speed
    pair expansion in ~num_partitions calls total, instead of one
    Python call per group (which at 10^8 groups would be the
    bottleneck; measured 3x faster already at 150k groups). Duplicate
    pairs across blocks are expected — canonical_edges (inside the
    graph ops) dedups them in its pair-keyed groupby."""
    import pandas as pd

    nparts = shuffle_partitions()

    def distinct_partial(b: pa.Table) -> pa.Table:
        t = b.select([group_col, item_col]).filter(
            pc.and_(pc.is_valid(b.column(group_col)),
                    pc.is_valid(b.column(item_col))))
        g = t.group_by([group_col, item_col]).aggregate([])
        h = np.abs(g.column(group_col).cast(pa.int64())
                   .to_numpy(zero_copy_only=False)) % nparts
        return g.append_column("__bucket", pa.array(h.astype(np.int32)))

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[group_col, item_col]].drop_duplicates()
        m = d.merge(d, on=group_col, suffixes=("_a", "_b"))
        m = m[m[f"{item_col}_a"] < m[f"{item_col}_b"]]
        return pd.DataFrame({
            "a": m[f"{item_col}_a"].to_numpy().astype(np.int64),
            "b": m[f"{item_col}_b"].to_numpy().astype(np.int64)})

    return (ds.map_batches(distinct_partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby("__bucket", num_partitions=nparts)
            .map_groups(expand, batch_format="pandas"))


def adamic_adar(edges, a_col: str = "a", b_col: str = "b", *,
                max_center_degree: int | None = None):
    """Adamic-Adar link-prediction scores over the undirected graph:
    for every NON-edge pair (u, w) at distance 2,

        AA(u, w) = sum over common neighbors c of 1 / ln(deg(c))

    — the classic 'people you may know' / related-repo candidate
    scorer (rare shared neighbors count more than hubs).

    Scale shape: wedge enumeration is inherently sum-of-deg² — hub-
    QUADRATIC — so the operator takes an explicit
    ``max_center_degree`` cap as part of its SEMANTICS: centers above
    the cap are skipped entirely (their wedges are the most numerous
    and the least informative, each worth only 1/ln(d) → the standard
    degree-thresholded AA approximation; pass None for the exact
    form). The pipeline is one bucket-keyed shuffle of the distinct
    adjacency (complete centers per bucket, vectorized pandas
    self-merge with PER-BUCKET (n1, n2) partial sums — never per-
    center Python), one keyed groupby folding the partials, and one
    left-anti sized_join removing existing edges. Everything stays a
    Dataset. Returns (n1, n2, aa) with n1 < n2."""
    import ray.data as _rd

    from .events import bucketed_by_key
    from .join import sized_join

    e = canonical_edges(edges, a_col, b_col).materialize()
    empty = pa.table({"n1": pa.array([], pa.int64()),
                      "n2": pa.array([], pa.int64()),
                      "aa": pa.array([], pa.float64())})
    if e.count() == 0:
        return _rd.from_arrow(empty)

    def symmetrize(t: pa.Table) -> pa.Table:
        lo = t.column("lo").cast(pa.int64()).combine_chunks()
        hi = t.column("hi").cast(pa.int64()).combine_chunks()
        return pa.table({"c": pa.concat_arrays([lo, hi]),
                         "n": pa.concat_arrays([hi, lo])})

    adj = e.map_batches(symmetrize, batch_format="pyarrow",
                        batch_size=None)

    cap = max_center_degree

    def expand(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd
        # adjacency rows are distinct by construction, and every row
        # of a center is in this bucket — transform('size') IS deg(c)
        deg = df.groupby("c")["n"].transform("size")
        keep = deg >= 2 if cap is None else (deg >= 2) & (deg <= cap)
        d = df[keep].assign(__w=1.0 / np.log(deg[keep]))
        if d.empty:
            return pd.DataFrame({"n1": pd.Series([], dtype="int64"),
                                 "n2": pd.Series([], dtype="int64"),
                                 "w": pd.Series([], dtype="float64")})
        m = d.merge(d[["c", "n"]], on="c")
        m = m[m["n_x"] < m["n_y"]]
        out = m.groupby(["n_x", "n_y"], as_index=False)["__w"].sum()
        return pd.DataFrame({"n1": out["n_x"].to_numpy(np.int64),
                             "n2": out["n_y"].to_numpy(np.int64),
                             "w": out["__w"].to_numpy(np.float64)})

    nparts = shuffle_partitions()

    def canon_aa(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sum(w)" not in t.column_names:
            return empty
        return pa.table({"n1": t.column("n1").cast(pa.int64()),
                         "n2": t.column("n2").cast(pa.int64()),
                         "aa": t.column("sum(w)").cast(pa.float64())})

    aa = (bucketed_by_key(adj, "c", expand)
          .groupby(["n1", "n2"], num_partitions=nparts).sum("w")
          .map_batches(canon_aa, batch_format="pyarrow",
                       batch_size=None)
          .materialize())
    if aa.count() == 0:
        return _rd.from_arrow(empty)
    return sized_join(aa, e, on=("n1", "n2"), right_on=("lo", "hi"),
                      how="anti", left_bytes=aa.size_bytes(),
                      right_bytes=e.size_bytes())


def bfs_hops(edges, sources: list[int], a_col: str = "a",
             b_col: str = "b", max_hops: int = 50):
    """Multi-source BFS hop distance over the undirected graph — "how
    far is every node from the seed set" (influence radius, taint
    propagation, repo-dependency blast zones).

    Frontier expansion as data: a (node, hop) distance table seeded at
    0 for the sources; each round joins the CURRENT FRONTIER (only the
    rows discovered last round — not the whole table) against the
    symmetrized edges and min-merges the neighbors in. Unreached nodes
    never appear. Rounds = eccentricity of the seed set (small-world
    graphs: a handful); each round is one narrow hash join + one keyed
    min — the connected_components shuffle budget without the
    pointer-jumping (hops must count every step). Returns a pandas
    DataFrame (node, hop) sorted by (hop, node)."""
    import pandas as pd

    def symmetrize(batch: pa.Table) -> pa.Table:
        batch = _drop_null_endpoints(batch, a_col, b_col)
        a = batch.column(a_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        b = batch.column(b_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = a != b
        return pa.table({"src": np.concatenate([a[keep], b[keep]]),
                         "dst": np.concatenate([b[keep], a[keep]])})

    sym = edges.map_batches(symmetrize, batch_format="pyarrow",
                            batch_size=None).materialize()
    nparts = shuffle_partitions()
    n_edges = sym.count()
    empty_out = pd.DataFrame({"node": pd.Series([], dtype="int64"),
                              "hop": pd.Series([], dtype="int64")})
    if n_edges == 0 or not sources:
        return empty_out
    sym = sym.repartition(min(nparts, n_edges)).materialize()

    import ray.data as _rd

    seeds = pa.table({"node": pa.array(sorted(set(int(s) for s in sources)),
                                       pa.int64())})
    dist = _rd.from_arrow(seeds.append_column(
        "hop", pa.array(np.zeros(seeds.num_rows, np.int64)))).materialize()
    frontier = dist
    from .join import sized_join

    for hop in range(1, max_hops + 1):
        nf = frontier.count()
        if nf == 0:
            break
        fr = frontier.select_columns(["node"]).materialize()
        # frontier is node-scale: broadcast it against the edge set
        # while it fits; past the byte threshold sized_join falls back
        # to the hash exchange
        nbr = (sized_join(sym, fr, on=("src",), right_on=("node",),
                          left_bytes=sym.size_bytes(),
                          right_bytes=fr.size_bytes())
               .map_batches(
                   lambda t, h=hop: pa.table(
                       {"node": (t.column("dst").cast(pa.int64())
                                 if "dst" in t.column_names
                                 else pa.array([], pa.int64())),
                        "hop": pa.array(np.full(
                            t.num_rows if "dst" in t.column_names else 0,
                            h, np.int64))}),
                   batch_format="pyarrow", batch_size=None))
        # min-merge: new frontier = neighbors at this hop that were not
        # already reached at a smaller hop
        merged = (dist.union(nbr)
                  .groupby("node", num_partitions=nparts).min("hop")
                  .map_batches(_canon2(["node", "hop"]),
                               batch_format="pyarrow", batch_size=None)
                  .materialize())
        nm = merged.count()
        merged = merged.repartition(min(nparts, nm)).materialize()
        frontier = merged.filter(expr=f"hop == {hop}").materialize()
        dist = merged
        if frontier.count() == 0:
            break
    out = dist.to_pandas()
    out["node"] = out["node"].astype("int64")
    out["hop"] = out["hop"].astype("int64")
    return out.sort_values(["hop", "node"]).reset_index(drop=True)


def degree_assortativity(edges, a_col: str = "a", b_col: str = "b"):
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees over all edges of the undirected
    simple graph — one number separating hub-to-hub networks (r > 0,
    social graphs) from hub-to-leaf ones (r < 0, the web, dependency
    graphs); a drift in r flags structural change before any
    per-node metric moves.

    Cost: canonical edge dedup + the degree combiner + TWO narrow hash
    joins to stamp endpoint degrees, then a six-scalar moment fold per
    block (each edge contributes both orientations, the standard
    symmetrization). Returns {"r": float, "n_edges": int} with r NaN
    for degree-regular graphs (zero variance)."""
    e = canonical_edges(edges, a_col, b_col)
    nparts = shuffle_partitions()
    m = e.count()
    if m == 0:
        return {"r": float("nan"), "n_edges": 0}

    def deg_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            empty = pa.array([], pa.int64())
            return pa.table({"node": empty, "deg": empty})
        nodes = pa.concat_arrays([
            t.column("lo").cast(pa.int64()).combine_chunks(),
            t.column("hi").cast(pa.int64()).combine_chunks()])
        g = pa.table({"node": nodes}).group_by("node") \
            .aggregate([([], "count_all")])
        return pa.table({"node": g.column("node"),
                         "deg": g.column("count_all").cast(pa.int64())})

    deg = (e.map_batches(deg_partial, batch_format="pyarrow",
                         batch_size=None)
           .groupby("node", num_partitions=nparts).sum("deg")
           .map_batches(_canon2(["node", "deg"]), batch_format="pyarrow",
                        batch_size=None)
           .materialize())
    from .join import sized_join

    d_lo = deg.map_batches(_canon2(["lo", "deg_lo"]),
                           batch_format="pyarrow", batch_size=None) \
        .materialize()
    d_hi = deg.map_batches(_canon2(["hi", "deg_hi"]),
                           batch_format="pyarrow", batch_size=None) \
        .materialize()
    out = sized_join(e, d_lo, on=("lo",), left_bytes=e.size_bytes(),
                     right_bytes=d_lo.size_bytes()).materialize()
    out = sized_join(out, d_hi, on=("hi",), left_bytes=out.size_bytes(),
                     right_bytes=d_hi.size_bytes())

    def moments(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "deg_lo" not in t.column_names:
            z = pa.array([0.0], pa.float64())
            return pa.table({"n": z, "sx": z, "sy": z, "sxx": z,
                             "syy": z, "sxy": z})
        x = t.column("deg_lo").cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        y = t.column("deg_hi").cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        # symmetrize: each undirected edge counted in both orientations
        xs = np.concatenate([x, y]); ys = np.concatenate([y, x])
        return pa.table({"n": pa.array([float(xs.size)]),
                         "sx": pa.array([xs.sum()]),
                         "sy": pa.array([ys.sum()]),
                         "sxx": pa.array([(xs * xs).sum()]),
                         "syy": pa.array([(ys * ys).sum()]),
                         "sxy": pa.array([(xs * ys).sum()])})

    p = out.map_batches(moments, batch_format="pyarrow",
                        batch_size=None).to_pandas().sum()
    n, sx, sy = p["n"], p["sx"], p["sy"]
    cov = p["sxy"] / n - (sx / n) * (sy / n)
    vx = p["sxx"] / n - (sx / n) ** 2
    vy = p["syy"] / n - (sy / n) ** 2
    r = float(cov / np.sqrt(vx * vy)) if vx > 0 and vy > 0 else float("nan")
    return {"r": r, "n_edges": int(m)}


def modularity(edges, assign, a_col: str = "a", b_col: str = "b",
               node_col: str = "node", comm_col: str = "comp"):
    """Newman modularity Q of a given node partition over the
    undirected simple graph:

        Q = Σ_c ( e_c / m  −  (deg_c / 2m)² )

    (e_c = within-community edges, deg_c = total degree in c, m =
    edges) — the standard "is this clustering better than chance"
    score for connected components / label propagation / k-core
    outputs; Q near 0 means the partition explains nothing.

    Cost: canonical edge dedup + TWO narrow hash joins stamping the
    endpoint communities + a per-block (community, e_within, deg)
    combiner — community-scale rows on the exchange. ``assign`` is a
    Dataset with (node_col, comm_col) int64 columns (e.g. the
    connected_components output). Returns {"q": float, "n_edges": int,
    "n_comms": int}."""
    e = canonical_edges(edges, a_col, b_col)
    nparts = shuffle_partitions()
    m = e.count()
    if m == 0:
        return {"q": float("nan"), "n_edges": 0, "n_comms": 0}
    asg = assign.map_batches(_canon2([node_col, comm_col]),
                             batch_format="pyarrow", batch_size=None) \
        .materialize()
    na = asg.count()
    asg = asg.repartition(min(nparts, max(na, 1))).materialize()
    c_lo = asg.map_batches(_canon2(["lo", "c_lo"]),
                           batch_format="pyarrow", batch_size=None) \
        .materialize()
    c_hi = asg.map_batches(_canon2(["hi", "c_hi"]),
                           batch_format="pyarrow", batch_size=None) \
        .materialize()
    from .join import sized_join

    out = sized_join(e, c_lo, on=("lo",), left_bytes=e.size_bytes(),
                     right_bytes=c_lo.size_bytes()).materialize()
    out = sized_join(out, c_hi, on=("hi",), left_bytes=out.size_bytes(),
                     right_bytes=c_hi.size_bytes())

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c_lo" not in t.column_names:
            empty = pa.array([], pa.int64())
            return pa.table({"comm": empty, "e_within": empty,
                             "deg": empty})
        cl = t.column("c_lo").cast(pa.int64()).combine_chunks()
        ch = t.column("c_hi").cast(pa.int64()).combine_chunks()
        same = pc.equal(cl, ch).to_numpy(zero_copy_only=False)
        # each edge adds 1 degree to both endpoint communities, and
        # one within-edge when they agree
        comm = pa.concat_arrays([cl, ch])
        within = np.concatenate([same.astype(np.int64),
                                 np.zeros(len(ch), np.int64)])
        g = pa.table({"comm": comm,
                      "w": pa.array(within),
                      "d": pa.array(np.ones(2 * t.num_rows, np.int64))}) \
            .group_by("comm").aggregate([("w", "sum"), ("d", "sum")])
        return pa.table({"comm": g.column("comm"),
                         "e_within": g.column("w_sum").cast(pa.int64()),
                         "deg": g.column("d_sum").cast(pa.int64())})

    parts = out.map_batches(partial, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    g = parts.groupby("comm").sum()
    q = float((g["e_within"] / m - (g["deg"] / (2.0 * m)) ** 2).sum())
    return {"q": q, "n_edges": int(m), "n_comms": int(len(g))}


def clustering_coefficients(edges, a_col: str = "a", b_col: str = "b"):
    """Global + average-local clustering coefficients — "how cliquish
    is this graph" (social graphs ~0.1-0.6; random graphs ~ degree/n):

        C_global = 3·triangles / wedges
        C_local(v) = tri(v) / C(deg(v), 2),  C_avg = mean over deg>=2

    Reuses the exact triangle machinery (canonical dedup + two-join
    enumeration, per-node counts) plus the degree combiner; the two
    coefficients are driver arithmetic on the node-scale tables.
    Returns {"c_global": float, "c_avg_local": float, "n_triangles":
    int, "n_wedges": int, "n_nodes": int}."""
    import pandas as pd

    tri = triangle_count(edges, a_col, b_col)
    deg = degree_table(canonical_edges(edges, a_col, b_col), "lo", "hi")
    deg["deg"] = deg["out_deg"] + deg["in_deg"]
    if deg.empty:
        return {"c_global": float("nan"), "c_avg_local": float("nan"),
                "n_triangles": 0, "n_wedges": 0, "n_nodes": 0}
    d = deg.set_index("node")["deg"]
    wedges = int((d * (d - 1) // 2).sum())
    n_tri = int(tri["tri_cnt"].sum() // 3) if not tri.empty else 0
    c_global = 3.0 * n_tri / wedges if wedges else float("nan")
    tri_of = tri.set_index("node")["tri_cnt"] if not tri.empty else None
    eligible = d[d >= 2]
    if len(eligible):
        t = (tri_of.reindex(eligible.index).fillna(0)
             if tri_of is not None else
             pd.Series(0, index=eligible.index))
        local = t / (eligible * (eligible - 1) / 2.0)
        c_avg = float(local.mean())
    else:
        c_avg = float("nan")
    return {"c_global": c_global, "c_avg_local": c_avg,
            "n_triangles": n_tri, "n_wedges": wedges,
            "n_nodes": int(len(d))}


def label_propagation(edges, src_col: str = "src", dst_col: str = "dst",
                      *, iters: int = 3,
                      max_nodes: int = 5_000_000) -> "pd.DataFrame":
    """Deterministic SYNCHRONOUS label propagation (community
    detection, Raghavan et al. 2007 made reproducible): every node
    starts labeled with its own id; each iteration every node adopts
    the most frequent label among its OUT-neighbors simultaneously,
    ties broken toward the SMALLEST label, nodes without out-edges
    keeping their label. Pass a symmetrized edge list (e.g. the
    part<->supplier graph) for the undirected form. Synchronous
    updates + the min-label tiebreak make the result a pure function
    of the graph — no RNG, no visit order — which is what lets a
    DuckDB oracle replay it as k unrolled join-count-argmax rounds.

    Scale shape (the broadcast ``pagerank`` pattern, graph.py:248):
    the 16 B/row edge projection materializes once; per iteration the
    (node -> label) array broadcasts via ``ray.put`` and ONE streaming
    pass emits per-block (node, label, count) group-partials — the
    exchange is bounded by block-distinct (node, label) pairs, never
    raw edges on the driver. The n-sized label state is driver-held
    and guarded at ``max_nodes``; past it, shard the label table and
    replace the broadcast with a keyed label-join per iteration (the
    ``pagerank_sharded`` / ``hits_sharded`` pattern).

    Returns (node, label) sorted by node, both int64."""
    import pandas as pd
    import ray

    def project(t: pa.Table) -> pa.Table:
        return _drop_null_endpoints(t.select([src_col, dst_col]),
                                    src_col, dst_col)

    proj = edges.map_batches(project, batch_format="pyarrow",
                             batch_size=None).materialize()

    def node_partial(t: pa.Table) -> pa.Table:
        u = pc.unique(pa.concat_arrays([
            t.column(src_col).cast(pa.int64()).combine_chunks(),
            t.column(dst_col).cast(pa.int64()).combine_chunks()]))
        return pa.table({"n": u})

    node_rows = proj.map_batches(node_partial, batch_format="pyarrow",
                                 batch_size=None).to_pandas()
    if node_rows.empty:
        return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                             "label": pd.Series([], dtype="int64")})
    nodes = np.unique(node_rows["n"].to_numpy(np.int64))
    if len(nodes) > max_nodes:
        raise ValueError(
            f"label_propagation: {len(nodes)} nodes > max_nodes="
            f"{max_nodes}; shard the label table and join per iteration "
            f"(the pagerank_sharded pattern) for larger graphs")
    labels = nodes.copy()

    for _ in range(iters):
        ref = ray.put((nodes, labels))

        def contrib(t: pa.Table, ref=ref) -> pa.Table:
            nd, lb = ray.get(ref)
            s = t.column(src_col).cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            d = t.column(dst_col).cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            lab = lb[np.searchsorted(nd, d)]
            g = pa.table({"u": pa.array(s), "lab": pa.array(lab)}) \
                .group_by(["u", "lab"]).aggregate([([], "count_all")])
            out = pa.table({"u": g.column("u"), "lab": g.column("lab"),
                            "c": g.column("count_all").cast(pa.int64())})
            return out.append_column(
                "__gkey", pc.cast(out.column("u"), pa.string()))

        def merge_bucket(df):
            m = df.groupby(["u", "lab"], as_index=False)["c"].sum()
            # stable double sort: label asc, then count desc -> first
            # row per node is (max count, min label)
            m = m.sort_values("lab", kind="mergesort") \
                .sort_values("c", ascending=False, kind="mergesort")
            return m.drop_duplicates("u", keep="first")

        # merge the (node, label) counts DISTRIBUTEDLY (bucketed, one
        # Python call per bucket) so the driver only ever receives one
        # argmax row per node, never the per-block partial table
        from .grouped import _bucketed_merge

        win = _bucketed_merge(
            proj.map_batches(contrib, batch_format="pyarrow",
                             batch_size=None), merge_bucket)
        new = labels.copy()
        pos = np.searchsorted(nodes, win["u"].to_numpy(np.int64))
        new[pos] = win["lab"].to_numpy(np.int64)
        labels = new

    return pd.DataFrame({"node": nodes,
                         "label": labels.astype(np.int64)})


def harmonic_centrality(edges, seeds, a_col: str = "a",
                        b_col: str = "b") -> "pd.DataFrame":
    """Harmonic centrality of each SEED node — Σ_v 1/d(seed, v) over
    the nodes it can reach (the disconnected-graph-safe variant of
    closeness): "which of these candidate hub nodes actually sits
    central". Exact per seed via one multi-round BFS each
    (``bfs_hops`` — frontier joins, never the whole distance table),
    so the cost is |seeds| BFS sweeps; sampling seeds IS the standard
    scale story for centrality (exact all-nodes closeness is O(n·m)
    everywhere). Returns (seed, harmonic, n_reached) sorted by seed,
    harmonic rounded to 6."""
    import pandas as pd

    rows = []
    for s_ in sorted(int(x) for x in seeds):
        hops = bfs_hops(edges, [s_], a_col, b_col)
        reached = hops[hops["hop"] > 0]
        h = float((1.0 / reached["hop"].to_numpy(np.float64)).sum())
        rows.append({"seed": s_,
                     "harmonic": float(np.floor(h * 1e6 + 0.5) / 1e6),
                     "n_reached": int(len(reached))})
    out = pd.DataFrame(rows)
    out["seed"] = out["seed"].astype(np.int64)
    out["n_reached"] = out["n_reached"].astype(np.int64)
    return out


def reciprocity(edges, src_col: str = "src",
                dst_col: str = "dst") -> "pd.DataFrame":
    """Directed-edge reciprocity: the fraction of distinct directed
    edges whose reverse edge also exists (self-loops excluded) — the
    mutual-link health metric for follow/referral graphs.

    Scale shape — the edge set NEVER lands on the driver: per-block
    dedup folds each edge to its canonical unordered pair with two
    direction bits, ONE keyed-bucket shuffle co-locates each pair, and
    every bucket emits a single (n_edges, n_reciprocal) partial; the
    driver adds B rows. Returns one row (n_edges, n_reciprocal,
    reciprocity), ratio rounded to 6."""
    import pandas as pd

    from .grouped import _bucketed_merge

    def partial(t: pa.Table) -> pa.Table:
        t = _drop_null_endpoints(t.select([src_col, dst_col]),
                                 src_col, dst_col)
        s_ = t.column(src_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        d = t.column(dst_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = s_ != d
        s_, d = s_[keep], d[keep]
        a = np.minimum(s_, d)
        b = np.maximum(s_, d)
        fwd = (s_ < d).astype(np.int8)
        df = pd.DataFrame({"a": a, "b": b, "fwd": fwd,
                           "rev": (1 - fwd).astype(np.int8)}) \
            .groupby(["a", "b"], as_index=False).max()
        out = pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)
        k = pc.binary_join_element_wise(
            pc.cast(out.column("a"), pa.string()),
            pc.cast(out.column("b"), pa.string()), "\x1f")
        return out.append_column("__gkey", k)

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["a", "b"], as_index=False).max()
        both = ((g["fwd"] == 1) & (g["rev"] == 1)).sum()
        n = int(g["fwd"].sum() + g["rev"].sum())
        return pd.DataFrame({"n_edges": np.array([n], np.int64),
                             "n_reciprocal": np.array([2 * int(both)],
                                                      np.int64)})

    parts = _bucketed_merge(edges.map_batches(
        partial, batch_format="pyarrow", batch_size=None), merge_bucket)
    n = int(parts["n_edges"].sum()) if len(parts) else 0
    r = int(parts["n_reciprocal"].sum()) if len(parts) else 0
    return pd.DataFrame({
        "n_edges": np.array([n], np.int64),
        "n_reciprocal": np.array([r], np.int64),
        "reciprocity": [float(np.floor(r / n * 1e6 + 0.5) / 1e6)
                        if n else np.nan]})
