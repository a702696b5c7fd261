"""Distributed exact triangle counting (degree-oriented wedge closing).

The classic scale shape: orient every undirected edge from its low
``(degree, id)`` endpoint to the high one — out-degrees are then bounded
by O(sqrt(2m)) regardless of skew — emit each node's out-neighbor pairs
(wedges) inside one source-bucket shuffle, and close wedges against the
oriented edge set with one more bucketed semi-join.  Every triangle is
counted exactly once: its three nodes have a unique (degree, id) order
a < b < c, the wedge (b, c) is emitted only at a, and the closing edge is
oriented b -> c by construction.

No broadcast of node-sized state: degrees attach to edges via the
partitioned ``hash_join`` (two shuffles), so the plan holds when the
degree table itself is too large to ship.

Companion to ``dedup.connected_components_distributed`` (the BSP component
labeller); this one is single-pass — no fixpoint loop."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cdm_data_loader_utils_ray.functions.aggregates import grouped_partial_sums
from cdm_data_loader_utils_ray.stages.keyed import (
    _BUCKET,
    _add_bucket,
    anti_join_keys,
    hash_join,
)


def within_group_pairs(values: np.ndarray, groups: np.ndarray):
    """All ordered index pairs (i, j), i < j, within runs of equal
    ``groups`` (must be pre-sorted by group): the copurchase emission
    kernel, factored — returns (a_idx, b_idx) into ``values``."""
    n = len(values)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    last = np.concatenate([groups[1:] != groups[:-1], [True]])
    ends = np.flatnonzero(last) + 1
    sizes = np.diff(np.concatenate([[0], ends]))
    group_end = np.repeat(ends, sizes)
    rem = group_end - np.arange(n) - 1
    total = int(rem.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    a_idx = np.repeat(np.arange(n), rem)
    cum = np.concatenate([[0], np.cumsum(rem)])
    b_idx = a_idx + (np.arange(total) - np.repeat(cum[:-1], rem)) + 1
    return a_idx, b_idx


def _degree_oriented(edges_ds, u: str, v: str, num_buckets: int):
    """Shared prep of the triangle family: canonical distinct edges ``e``,
    per-node degrees ``deg`` and the degree-oriented edge set ``o``
    (low-degree endpoint -> high, ties by id), both materialized (multiple
    consumers).  Returns ``(e, deg, o)``."""

    def canon(batch: pa.Table) -> pa.Table:
        a, b = batch[u], batch[v]
        return pa.table(
            {"eu": pc.min_element_wise(a, b), "ev": pc.max_element_wise(a, b)}
        )

    # THREE consumers read the canonical edge set (degree count, the
    # degree join probe, the final edge count) and two read the oriented
    # set — materialize both once or the whole upstream lineage re-executes
    # per consumer (the repo-wide fan-out rule; see pipelines/curation.py)
    e = edges_ds.map_batches(canon, batch_format="pyarrow").materialize()

    def ends(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": np.concatenate(
                    [
                        batch["eu"].to_numpy(zero_copy_only=False),
                        batch["ev"].to_numpy(zero_copy_only=False),
                    ]
                ).astype(np.int64)
            }
        )

    # materialize: deg is consumed by BOTH endpoint joins (plus a third
    # consumer in local_clustering) and its lineage contains a shuffle —
    # without the pin each consumer re-executes the whole degree count
    deg = grouped_partial_sums(
        e.map_batches(ends, batch_format="pyarrow"), ["node"], {}, count_alias="deg"
    ).materialize()

    def rename(cols):
        def _r(batch: pa.Table) -> pa.Table:
            return batch.select(["node", "deg"]).rename_columns(cols)

        return _r

    j = hash_join(
        e,
        deg.map_batches(rename(["eu", "deg_u"]), batch_format="pyarrow"),
        on=["eu"],
        num_buckets=num_buckets,
    )
    j = hash_join(
        j,
        deg.map_batches(rename(["ev", "deg_v"]), batch_format="pyarrow"),
        on=["ev"],
        num_buckets=num_buckets,
    )

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        eu = df["eu"].to_numpy(np.int64)
        ev = df["ev"].to_numpy(np.int64)
        du = df["deg_u"].to_numpy(np.int64)
        dv = df["deg_v"].to_numpy(np.int64)
        fwd = (du < dv) | ((du == dv) & (eu < ev))
        return pd.DataFrame(
            {
                "s": np.where(fwd, eu, ev),
                "t": np.where(fwd, ev, eu),
                # target's (deg, id) orders the out-neighbor pair emission so
                # wedge endpoints land in closing-edge orientation
                "dt": np.where(fwd, dv, du),
            }
        )

    o = j.map_batches(orient, batch_format="pandas").materialize()
    return e, deg, o


def _packed_oriented_edges(o, limit: int):
    """Broadcastable sorted int64 array of the oriented edges (s<<32 | t),
    or None when the set exceeds ``limit`` or ids don't fit 31 bits."""

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        s = df["s"].to_numpy(np.int64)
        t = df["t"].to_numpy(np.int64)
        if len(s) and (s.max() >= 2**31 or t.max() >= 2**31 or s.min() < 0
                       or t.min() < 0):
            return pd.DataFrame({"p": pd.Series([-1], dtype="int64")})
        return pd.DataFrame({"p": (s << np.int64(32)) | t})

    packed = o.map_batches(pack, batch_format="pandas").to_pandas()["p"]
    if (packed < 0).any():
        return None
    return np.sort(packed.to_numpy(np.int64))


def triangle_count(edges_ds, u: str = "u", v: str = "v", num_buckets: int = 64,
                   broadcast_edges_limit: int = 2_000_000):
    """Exact triangle count of the simple undirected graph whose DISTINCT
    edges (one row per unordered pair, u != v, any endpoint order) are in
    ``edges_ds``.  Duplicate edge rows would double-count degrees — dedup
    upstream (one ``grouped_partial_sums`` fold).  Returns
    ``(n_edges, n_triangles)`` as Python ints.

    Same broadcast-closing-edge fast path as :func:`local_clustering`
    (closure checked locally per source bucket against the packed edge
    array when the edge set fits the gate; the wedge table never ships)."""
    e, _deg, o = _degree_oriented(edges_ds, u, v, num_buckets)
    n_edges = e.count()

    def tag_s(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, ["s"], num_buckets)

    if n_edges and n_edges <= broadcast_edges_limit:
        pe = _packed_oriented_edges(o, broadcast_edges_limit)
        if pe is not None:
            import ray

            edge_ref = ray.put(pe)

            def count_local(df: pd.DataFrame) -> pd.DataFrame:
                if len(df) == 0 or "s" not in df.columns:
                    return pd.DataFrame({"n": pd.Series([0], dtype="int64")})
                d = df.sort_values(["s", "dt", "t"], kind="mergesort")
                t = d["t"].to_numpy(np.int64)
                a_idx, b_idx = within_group_pairs(t, d["s"].to_numpy(np.int64))
                if len(a_idx) == 0:
                    return pd.DataFrame({"n": pd.Series([0], dtype="int64")})
                pe = ray.get(edge_ref)
                w = (t[a_idx] << np.int64(32)) | t[b_idx]
                pos = np.searchsorted(pe, w)
                pos[pos >= len(pe)] = len(pe) - 1
                return pd.DataFrame(
                    {"n": pd.Series([int((pe[pos] == w).sum())], dtype="int64")}
                )

            parts = (
                o.map_batches(tag_s, batch_format="pyarrow")
                .groupby(_BUCKET)
                .map_groups(count_local, batch_format="pandas")
                .to_pandas()
            )
            return int(n_edges), int(parts["n"].sum())

    _empty_w = pd.DataFrame(
        {
            "w1": pd.Series(dtype="int64"),
            "w2": pd.Series(dtype="int64"),
            "c": pd.Series(dtype="int64"),
        }
    )

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "s" not in df.columns:
            return _empty_w.copy()
        d = df.sort_values(["s", "dt", "t"], kind="mergesort")
        t = d["t"].to_numpy(np.int64)
        a_idx, b_idx = within_group_pairs(t, d["s"].to_numpy(np.int64))
        if len(a_idx) == 0:
            return _empty_w.copy()
        w = pd.DataFrame({"w1": t[a_idx], "w2": t[b_idx]})
        g = w.groupby(["w1", "w2"], sort=False).size()
        return g.rename("c").reset_index()

    wed = o.map_batches(tag_s, batch_format="pyarrow").groupby(_BUCKET).map_groups(
        wedges, batch_format="pandas"
    )

    def tag_side(side: str, cols: list[str]):
        def _t(batch: pa.Table) -> pa.Table:
            b = batch.select(cols).rename_columns(["w1", "w2"] + cols[2:])
            # keep column ORDER identical on both union sides
            if "c" not in b.column_names:
                b = b.append_column("c", pa.array(np.ones(len(b), np.int64)))
            b = b.append_column("__side__", pa.array([side] * len(b)))
            return _add_bucket(b, ["w1", "w2"], num_buckets)

        return _t

    both = wed.map_batches(
        tag_side("w", ["w1", "w2", "c"]), batch_format="pyarrow"
    ).union(o.map_batches(tag_side("e", ["s", "t"]), batch_format="pyarrow"))

    def close_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "__side__" not in df.columns:
            return pd.DataFrame({"n": pd.Series([0], dtype="int64")})
        w = df[df["__side__"] == "w"]
        ed = df[df["__side__"] == "e"]
        if len(w) == 0 or len(ed) == 0:
            return pd.DataFrame({"n": pd.Series([0], dtype="int64")})
        hit = w.merge(
            ed[["w1", "w2"]].drop_duplicates(), on=["w1", "w2"], how="inner"
        )
        return pd.DataFrame({"n": pd.Series([int(hit["c"].sum())], dtype="int64")})

    parts = (
        both.groupby(_BUCKET).map_groups(close_bucket, batch_format="pandas").to_pandas()
    )
    return int(n_edges), int(parts["n"].sum())


def local_clustering(edges_ds, u: str = "u", v: str = "v", num_buckets: int = 64,
                     broadcast_edges_limit: int = 2_000_000):
    """Per-node triangle counts and local clustering coefficient
    ``2*tri / (deg*(deg-1))`` over the simple undirected graph of DISTINCT
    edges (same input contract as :func:`triangle_count`).

    Same degree-oriented wedge closing, but wedge rows KEEP their center
    (they cannot pre-aggregate to (w1, w2) counts — per-node credit needs
    the center identity), and a closed wedge credits all three corners.
    Each triangle closes exactly one oriented wedge, so every node's count
    is exact.  Returns a Dataset ``(node, deg, tri)`` — nodes with
    ``deg >= 1``; the coefficient is the caller's single division (kept
    out of the engine so SQL twins can pin the expression).

    FAST PATH: every closing pair is itself an ORIENTED EDGE, so when the
    edge set fits a broadcast (``<= broadcast_edges_limit`` and ids below
    2^31, packable into one int64), closure is checked LOCALLY inside each
    source bucket against the broadcast packed-edge array — the wedge
    table (often 50x the edges) never ships through a shuffle at all.
    Above the limit the exact (w1, w2)-bucket shuffle path runs (the
    100-TB shape; same gate pattern as ``stages.keyed.broadcast_hash_join``).
    """
    e, deg, o = _degree_oriented(edges_ds, u, v, num_buckets)

    n_edges = e.count()
    if n_edges and n_edges <= broadcast_edges_limit:
        import ray

        pe_arr = _packed_oriented_edges(o, broadcast_edges_limit)
        if pe_arr is not None:
            edge_ref = ray.put(pe_arr)

            def tag_s(batch: pa.Table) -> pa.Table:
                return _add_bucket(batch, ["s"], num_buckets)

            def close_local(df: pd.DataFrame) -> pd.DataFrame:
                empty = pd.DataFrame({"node": pd.Series(dtype="int64"),
                                      "tri": pd.Series(dtype="int64")})
                if len(df) == 0 or "s" not in df.columns:
                    return empty
                d = df.sort_values(["s", "dt", "t"], kind="mergesort")
                t = d["t"].to_numpy(np.int64)
                a_idx, b_idx = within_group_pairs(t, d["s"].to_numpy(np.int64))
                if len(a_idx) == 0:
                    return empty
                pe = ray.get(edge_ref)
                w = (t[a_idx] << np.int64(32)) | t[b_idx]
                pos = np.searchsorted(pe, w)
                pos[pos >= len(pe)] = len(pe) - 1
                hit = pe[pos] == w
                if not hit.any():
                    return empty
                nodes = np.concatenate(
                    [d["s"].to_numpy(np.int64)[a_idx][hit], t[a_idx][hit],
                     t[b_idx][hit]]
                )
                g = pd.Series(nodes).value_counts()
                return pd.DataFrame(
                    {"node": g.index.to_numpy(np.int64),
                     "tri": g.to_numpy(np.int64)}
                )

            credits = (
                o.map_batches(tag_s, batch_format="pyarrow")
                .groupby(_BUCKET)
                .map_groups(close_local, batch_format="pandas")
            )
            return _lc_finish(credits, deg, num_buckets)

    def tag_s(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, ["s"], num_buckets)

    _empty_w = pd.DataFrame(
        {
            "w1": pd.Series(dtype="int64"),
            "w2": pd.Series(dtype="int64"),
            "ctr": pd.Series(dtype="int64"),
        }
    )

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "s" not in df.columns:
            return _empty_w.copy()
        d = df.sort_values(["s", "dt", "t"], kind="mergesort")
        t = d["t"].to_numpy(np.int64)
        a_idx, b_idx = within_group_pairs(t, d["s"].to_numpy(np.int64))
        if len(a_idx) == 0:
            return _empty_w.copy()
        return pd.DataFrame(
            {"w1": t[a_idx], "w2": t[b_idx], "ctr": d["s"].to_numpy(np.int64)[a_idx]}
        )

    wed = o.map_batches(tag_s, batch_format="pyarrow").groupby(_BUCKET).map_groups(
        wedges, batch_format="pandas"
    )

    def tag_side(side: str, cols: list[str]):
        def _t(batch: pa.Table) -> pa.Table:
            b = batch.select(cols).rename_columns(["w1", "w2"] + cols[2:])
            if "ctr" not in b.column_names:
                b = b.append_column(
                    "ctr", pa.array(np.full(len(b), -1, dtype=np.int64))
                )
            b = b.append_column("__side__", pa.array([side] * len(b)))
            return _add_bucket(b, ["w1", "w2"], num_buckets)

        return _t

    both = wed.map_batches(
        tag_side("w", ["w1", "w2", "ctr"]), batch_format="pyarrow"
    ).union(o.map_batches(tag_side("e", ["s", "t"]), batch_format="pyarrow"))

    def close_credit(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"node": pd.Series(dtype="int64"),
                              "tri": pd.Series(dtype="int64")})
        if len(df) == 0 or "__side__" not in df.columns:
            return empty
        w = df[df["__side__"] == "w"]
        ed = df[df["__side__"] == "e"]
        if len(w) == 0 or len(ed) == 0:
            return empty
        hit = w.merge(ed[["w1", "w2"]].drop_duplicates(), on=["w1", "w2"])
        if len(hit) == 0:
            return empty
        nodes = np.concatenate(
            [hit["ctr"].to_numpy(np.int64), hit["w1"].to_numpy(np.int64),
             hit["w2"].to_numpy(np.int64)]
        )
        g = pd.Series(nodes).value_counts()
        return pd.DataFrame(
            {"node": g.index.to_numpy(np.int64), "tri": g.to_numpy(np.int64)}
        )

    credits = both.groupby(_BUCKET).map_groups(close_credit, batch_format="pandas")
    return _lc_finish(credits, deg, num_buckets)


def _lc_finish(credits, deg, num_buckets: int):
    """Fold per-bucket (node, tri) credit partials and left-join degrees."""
    tri = grouped_partial_sums(credits, ["node"], {"tri": "tri"}, count_alias="__n")

    def drop_n(batch: pa.Table) -> pa.Table:
        return batch.select(["node", "tri"])

    tri = tri.map_batches(drop_n, batch_format="pyarrow")
    deg = deg.map_batches(lambda t: t, batch_format="pyarrow")
    out = hash_join(deg, tri, on=["node"], how="left", num_buckets=num_buckets)

    def fix(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": df["node"].astype("int64"),
                "deg": df["deg"].astype("int64"),
                "tri": df["tri"].fillna(0).astype("int64"),
            }
        )

    return out.map_batches(fix, batch_format="pandas")


def bfs_hops(
    edges_ds,
    seeds_ds,
    max_hops: int,
    node_col: str = "node",
    u: str = "u",
    v: str = "v",
    num_buckets: int = 64,
):
    """Bounded-hop BFS: min-hop distance (0..max_hops) from a seed set over
    the undirected graph in ``edges_ds``.  Returns a Dataset of
    ``(node, dist)`` — every reached node once, seeds at 0 (seeds absent
    from the graph still emit, like the recursive-CTE base case).

    Each round is Dataset-native: frontier x adjacency via the partitioned
    ``hash_join``, a distinct fold, and ``anti_join_keys`` against the
    visited set, with a ``materialize()`` checkpoint per round.  BOUNDED
    rounds only: per-round Dataset re-planning is superlinear in round
    count (the connected-components lesson — 2.5s -> 81s/round measured),
    so an unbounded fixpoint belongs to the task-loop BSP in
    ``dedup.connected_components_distributed``; a hop-limited
    neighborhood (the common case: "within k hops of the recall set")
    stays clearer and fast in this form."""

    def both(batch: pa.Table) -> pa.Table:
        a = batch[u].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[v].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"src": np.concatenate([a, b]), "dst": np.concatenate([b, a])}
        )

    adj = edges_ds.map_batches(both, batch_format="pyarrow").materialize()

    def seed0(batch: pa.Table) -> pa.Table:
        t = batch.select(["node"])  # the dedup fold already renamed node_col
        return t.append_column("dist", pa.array(np.zeros(len(t), np.int64)))

    # distinct seeds (duplicate seed rows would double-emit at dist 0)
    seeds = grouped_partial_sums(
        seeds_ds.map_batches(
            lambda t: t.select([node_col]).rename_columns(["node"]),
            batch_format="pyarrow",
        ),
        ["node"], {}, count_alias="__s",
    )
    visited = seeds.map_batches(seed0, batch_format="pyarrow").materialize()
    frontier = visited

    def to_src(batch: pa.Table) -> pa.Table:
        return batch.select(["node"]).rename_columns(["src"])

    def to_node(batch: pa.Table) -> pa.Table:
        return batch.select(["dst"]).rename_columns(["node"])

    for d in range(1, max_hops + 1):
        step = hash_join(
            frontier.map_batches(to_src, batch_format="pyarrow"),
            adj,
            on=["src"],
            num_buckets=num_buckets,
        )
        cand = grouped_partial_sums(
            step.map_batches(to_node, batch_format="pyarrow"),
            ["node"], {}, count_alias="__c",
        )
        new = anti_join_keys(cand, visited, ["node"]).materialize()
        if new.count() == 0:
            break

        def stamp(batch: pa.Table, _d=d) -> pa.Table:
            t = batch.select(["node"])
            return t.append_column("dist", pa.array(np.full(len(t), _d, np.int64)))

        nd = new.map_batches(stamp, batch_format="pyarrow")
        visited = visited.union(nd).materialize()
        frontier = new
    return visited


def pagerank_integer(
    edges_ds,
    iterations: int = 3,
    u: str = "u",
    v: str = "v",
    damping_pct: int = 85,
    scale: int = 10**12,
    num_buckets: int = 64,
):
    """Bounded-iteration PageRank over the undirected graph — in INTEGER
    arithmetic, so the result is exactly reproducible by a SQL twin.

    Float PageRank cannot be oracle-checked: the per-node neighbor sum
    accumulates in engine-dependent order.  Here every step is integer:
    ``contribution(u) = score(u) // deg(u)`` (floor division), ``score'(v)
    = base + (damping_pct * sum(contributions)) // 100`` with
    ``base = ((100 - damping_pct) * scale) // 100`` — both engines get
    bit-identical int64 scores at every iteration.  (The floor divisions
    make this a deterministic VARIANT of PageRank; ranking quality is the
    same, absolute values differ from the float algorithm at ~1/scale.)

    Scale shape: the EDGE table streams (one map + one grouped fold per
    iteration); the per-node score/degree table is driver-resident and
    broadcast per iteration — right for dimension-sized node sets (parts,
    users).  For node sets that exceed driver memory, replace the
    broadcast lut with a partitioned ``hash_join`` per round (same shape
    as :func:`bfs_hops`); bounded iterations only, per the Dataset
    re-planning lesson."""
    import ray

    def both(batch: pa.Table) -> pa.Table:
        a = batch[u].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[v].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"src": np.concatenate([a, b]), "dst": np.concatenate([b, a])}
        )

    adj = edges_ds.map_batches(both, batch_format="pyarrow").materialize()
    deg = grouped_partial_sums(adj, ["src"], {}, count_alias="d").to_pandas()
    deg = deg.sort_values("src").reset_index(drop=True)
    nodes = deg["src"].to_numpy(np.int64)
    d_arr = deg["d"].to_numpy(np.int64)
    # int64 headroom guard (repo convention — grouped_exact_sums,
    # corr_qty_price): one hub can receive nearly the graph's whole score
    # mass (~N*scale), and both the contribution fold and the
    # damping_pct*t multiply run in int64.  Derived from the ACTUAL node
    # count; the fix is a smaller scale (determinism is scale-free).
    if len(nodes) * scale * max(damping_pct, 1) > (1 << 62):
        raise ValueError(
            "pagerank_integer: nodes * scale exceeds int64 headroom — "
            f"lower scale to <= {(1 << 62) // (len(nodes) * max(damping_pct, 1))}"
        )
    base = ((100 - damping_pct) * scale) // 100
    scores = np.full(len(nodes), scale, dtype=np.int64)

    for _ in range(iterations):
        contrib = scores // d_arr
        lut_ref = ray.put((nodes, contrib))

        def emit(batch: pa.Table) -> pa.Table:
            ns, cs = ray.get(lut_ref)
            src = batch["src"].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(ns, src)
            return pa.table(
                {"dst": batch["dst"], "c": pa.array(cs[idx], type=pa.int64())}
            )

        inc = grouped_partial_sums(
            adj.map_batches(emit, batch_format="pyarrow"),
            ["dst"], {"t": "c"}, count_alias="__n",
        ).to_pandas().sort_values("dst")
        t = np.zeros(len(nodes), dtype=np.int64)
        pos = np.searchsorted(nodes, inc["dst"].to_numpy(np.int64))
        t[pos] = inc["t"].to_numpy(np.int64)
        scores = base + (damping_pct * t) // 100

    return pd.DataFrame({"node": nodes, "score": scores})


# -- distributed integer PageRank (scale path) -------------------------------
#
# Same BSP-task shape as dedup.connected_components_distributed: one
# Dataset pass buckets the edges, the bounded iteration loop runs as raw
# Ray tasks over plasma-resident shards.  The driver never holds node-
# sized state — peak driver memory is O(num_buckets) refs (verdict r4
# item 4: pagerank_integer's per-round node-sized lut broadcast was the
# scale-killer at >=1e8 nodes).


def _pr_prep_shard(block, num_buckets: int):
    """Split one materialized edge block into per-src-bucket pieces,
    plasma-put worker-side (dict of refs through the driver, never data).
    Bucket identity comes from the BUCKET COLUMN — Ray coalesces/splits
    map_groups outputs across blocks."""
    import ray

    t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
    if t.num_rows == 0 or "__pr_bucket" not in t.column_names:
        return {}
    out = {}
    for bid in pc.unique(t["__pr_bucket"].combine_chunks()).to_pylist():
        sel = t.filter(pc.equal(t["__pr_bucket"], bid)).select(["src", "dst"])
        out[int(bid)] = ray.put(sel)
    return out


def _pr_assemble(*parts):
    return pa.concat_tables(parts)


def _pr_init(edges: pa.Table, scale: int):
    """One shard's node/degree/initial-score arrays.  All edges with
    src s live in bucket(s), so s's total degree is shard-local."""
    src = edges["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes, deg = np.unique(src, return_counts=True)
    return nodes, deg.astype(np.int64), np.full(len(nodes), scale, np.int64), len(nodes)


def _pr_propagate(edges: pa.Table, nodes, deg, scores, num_buckets: int):
    """contrib(s) = score(s) // deg(s) for this shard's srcs (all local),
    pre-summed per dst and routed to dst-buckets — the edge-sized work
    stays in the task; only (dst, partial_sum) aggregates move."""
    contrib = scores // deg
    src = edges["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = edges["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    c = contrib[np.searchsorted(nodes, src)]
    order = np.argsort(dst, kind="stable")
    ds_, cs = dst[order], c[order]
    uniq, starts = np.unique(ds_, return_index=True)
    sums = np.add.reduceat(cs, starts)
    db = uniq % num_buckets
    return [
        (uniq[db == b], sums[db == b]) for b in range(num_buckets)
    ]


def _pr_update(nodes, base: int, damping_pct: int, *partials):
    """Fold incoming (dst, partial) aggregates into this node-shard and
    apply the integer damping step — bit-identical to the driver
    variant's ``base + (damping_pct * t) // 100``.

    With ``num_buckets=1`` Ray's ``num_returns=1`` hands the whole
    1-element propagate LIST through as one object instead of unpacking
    it — normalize both shapes (review r5)."""
    t = np.zeros(len(nodes), dtype=np.int64)
    flat = []
    for p in partials:
        if isinstance(p, list):
            flat.extend(p)
        else:
            flat.append(p)
    for pn, pt in flat:
        if len(pn):
            np.add.at(t, np.searchsorted(nodes, pn), pt)
    return base + (damping_pct * t) // 100


def _pr_emit(nodes, scores) -> pa.Table:
    return pa.table(
        {"node": pa.array(nodes, pa.int64()), "score": pa.array(scores, pa.int64())}
    )


def pagerank_integer_distributed(
    edges_ds,
    iterations: int = 3,
    u: str = "u",
    v: str = "v",
    damping_pct: int = 85,
    scale: int = 10**12,
    num_buckets: int = 64,
):
    """Scale path of :func:`pagerank_integer` — bit-identical scores, but
    node state lives SHARDED in the object store (bucket = node %
    num_buckets) and each bounded round is a fan-out of raw Ray tasks
    (propagate per src-shard -> update per dst-shard).  Per the measured
    Dataset-re-planning lesson (see connected_components_distributed),
    the iteration never re-enters Ray Data; Dataset in, Dataset out."""
    import ray
    import ray.data as rd

    nb = num_buckets

    def both(batch: pa.Table) -> pa.Table:
        a = batch[u].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[v].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, b])
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
                "__pr_bucket": pa.array(src % nb, pa.int64()),
            }
        )

    shards_ds = (
        edges_ds.map_batches(both, batch_format="pyarrow")
        .groupby("__pr_bucket")
        .map_groups(lambda df: df, batch_format="pandas")
        .materialize()
    )
    block_refs = shards_ds.to_arrow_refs()
    if not block_refs:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "score": pa.array([], pa.int64())})
        )

    prep_r = ray.remote(_pr_prep_shard)
    asm_r = ray.remote(_pr_assemble)
    init_r = ray.remote(num_returns=4)(_pr_init)
    prop_r = ray.remote(_pr_propagate)
    upd_r = ray.remote(_pr_update)
    emit_r = ray.remote(_pr_emit)

    pieces: dict[int, list] = {}
    for d in ray.get([prep_r.remote(r, nb) for r in block_refs]):
        for bid, ref in d.items():
            pieces.setdefault(bid, []).append(ref)
    edges_of = {
        bid: (prs[0] if len(prs) == 1 else asm_r.remote(*prs))
        for bid, prs in pieces.items()
    }
    buckets = sorted(edges_of)
    if not buckets:  # edge blocks existed but all were empty
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "score": pa.array([], pa.int64())})
        )
    nodes_of, deg_of, scores_of, count_of = {}, {}, {}, {}
    for b in buckets:
        nodes_of[b], deg_of[b], scores_of[b], count_of[b] = init_r.remote(
            edges_of[b], scale
        )
    n_nodes = sum(ray.get([count_of[b] for b in buckets]))
    # same int64 headroom guard as the driver variant (a hub can receive
    # nearly the whole graph's score mass, ~N*scale, before the
    # damping_pct multiply)
    if n_nodes * scale * max(damping_pct, 1) > (1 << 62):
        raise ValueError(
            "pagerank_integer_distributed: nodes * scale exceeds int64 "
            f"headroom — lower scale to <= {(1 << 62) // (n_nodes * max(damping_pct, 1))}"
        )
    base = ((100 - damping_pct) * scale) // 100

    for _ in range(iterations):
        prop = {}
        for b in buckets:
            r = prop_r.options(num_returns=nb).remote(
                edges_of[b], nodes_of[b], deg_of[b], scores_of[b], nb
            )
            # num_returns=1 yields ONE ref (to the 1-element list), not a
            # ref list — wrap so prop[b][c] below stays uniform; _pr_update
            # unwraps the list-valued object (review r5)
            prop[b] = [r] if nb == 1 else r
        scores_of = {
            c: upd_r.remote(
                nodes_of[c], base, damping_pct, *[prop[b][c] for b in buckets]
            )
            for c in buckets
        }

    return rd.from_arrow_refs(
        [emit_r.remote(nodes_of[b], scores_of[b]) for b in buckets]
    )


# ---------------------------------------------------------------------------
# k-core decomposition (fixed k): BSP peeling over sharded node state
# ---------------------------------------------------------------------------

def _kc_init(edges: pa.Table):
    """Per-shard node state from the shard's (src-sharded) adjacency:
    (nodes sorted, degree, alive mask).  Degrees count BOTH directions'
    rows for local src nodes — the symmetric edge table was sharded by
    src, so each undirected edge contributes exactly once per endpoint."""
    src = edges["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes, deg = np.unique(src, return_counts=True)
    return nodes, deg.astype(np.int64), np.ones(len(nodes), dtype=bool)


def _kc_round(edges: pa.Table, nodes, deg, alive, k: int, nb: int):
    """One peel round for one shard: kill alive nodes with deg < k, emit
    per-target-shard decrement partials for the killed nodes' neighbors.
    Returns (n_dead, new_alive_ref, {bucket: (dst_nodes, counts)})."""
    import ray

    dead_mask = alive & (deg < k)
    n_dead = int(dead_mask.sum())
    if n_dead == 0:
        return 0, None, {}
    new_alive = alive & ~dead_mask
    src = edges["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = edges["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    dead_nodes = nodes[dead_mask]
    hit = np.isin(src, dead_nodes)
    targets = dst[hit]
    out = {}
    tb = targets % nb
    for b in np.unique(tb):
        t = targets[tb == b]
        tn, tc = np.unique(t, return_counts=True)
        out[int(b)] = ray.put((tn, tc.astype(np.int64)))
    return n_dead, ray.put(new_alive), out


def _kc_apply(nodes, deg, *dec_refs):
    """Fold decrement partials into this shard's degree array."""
    deg = deg.copy()
    for tn, tc in dec_refs:
        idx = np.searchsorted(nodes, tn)
        ok = (idx < len(nodes)) & (nodes[np.minimum(idx, len(nodes) - 1)] == tn)
        np.subtract.at(deg, idx[ok], tc[ok])
    return deg


def _kc_emit(nodes, alive) -> pa.Table:
    return pa.table({"node": pa.array(nodes[alive], pa.int64())})


def kcore_members(edges_ds, k: int, u: str = "u", v: str = "v",
                  num_buckets: int = 64):
    """EXACT k-core of the simple undirected graph (DISTINCT edges, same
    input contract as :func:`triangle_count`): the maximal subgraph where
    every node keeps degree >= k.  Returns a Dataset of ``(node,)`` rows.

    Peeling is an UNBOUNDED fixpoint (a path graph peels one node per
    round), so per the measured Dataset-re-planning lesson the loop runs
    as raw-task BSP over src-sharded adjacency in plasma (the
    connected-components / PageRank machinery): each round kills
    under-degree nodes shard-locally and ships only (neighbor, count)
    decrement partials — bytes per round ∝ edges incident to the dying
    frontier, never the graph."""
    import ray
    import ray.data as rd

    nb = num_buckets

    def both(batch: pa.Table) -> pa.Table:
        a = batch[u].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[v].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, b])
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
                "__pr_bucket": pa.array(src % nb, pa.int64()),
            }
        )

    shards_ds = (
        edges_ds.map_batches(both, batch_format="pyarrow")
        .groupby("__pr_bucket")
        .map_groups(lambda df: df, batch_format="pandas")
        .materialize()
    )
    empty = pa.table({"node": pa.array([], pa.int64())})
    block_refs = shards_ds.to_arrow_refs()
    if not block_refs:
        return rd.from_arrow(empty)
    prep_r = ray.remote(_pr_prep_shard)
    asm_r = ray.remote(_pr_assemble)
    init_r = ray.remote(num_returns=3)(_kc_init)
    round_r = ray.remote(num_returns=3)(_kc_round)
    apply_r = ray.remote(_kc_apply)
    emit_r = ray.remote(_kc_emit)

    pieces: dict[int, list] = {}
    for d in ray.get([prep_r.remote(r, nb) for r in block_refs]):
        for bid, ref in d.items():
            pieces.setdefault(bid, []).append(ref)
    edges_of = {
        bid: (prs[0] if len(prs) == 1 else asm_r.remote(*prs))
        for bid, prs in pieces.items()
    }
    buckets = sorted(edges_of)
    if not buckets:
        return rd.from_arrow(empty)
    nodes_of, deg_of, alive_of = {}, {}, {}
    for b in buckets:
        nodes_of[b], deg_of[b], alive_of[b] = init_r.remote(edges_of[b])
    while True:
        outs = {
            b: round_r.remote(edges_of[b], nodes_of[b], deg_of[b],
                              alive_of[b], k, nb)
            for b in buckets
        }
        n_dead = sum(ray.get([outs[b][0] for b in buckets]))
        if n_dead == 0:
            break
        decs: dict[int, list] = {b: [] for b in buckets}
        for b in buckets:
            # _kc_round put the new alive mask worker-side; its return is
            # the (inner) ref itself — adopt it, never re-put a ref
            new_alive_ref, dec = ray.get([outs[b][1], outs[b][2]])
            if new_alive_ref is not None:
                alive_of[b] = new_alive_ref
            for tgt, ref in dec.items():
                if tgt in decs:
                    decs[tgt].append(ref)
        for b in buckets:
            if decs[b]:
                deg_of[b] = apply_r.remote(nodes_of[b], deg_of[b], *decs[b])
    tables = ray.get([emit_r.remote(nodes_of[b], alive_of[b]) for b in buckets])
    tables = [t for t in tables if t.num_rows] or [empty]
    return rd.from_arrow(tables)
