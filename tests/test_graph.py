"""triangle_count (functions/graph.py) vs brute-force enumeration on a
random graph dense enough to exercise degree ties and the wedge combiner."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa

from cdm_data_loader_utils_ray.functions.graph import triangle_count


def _brute_triangles(edges: set) -> int:
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = 0
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            n += 1
    return n


def test_triangle_count_matches_bruteforce(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    nodes = 40
    edges = set()
    for _ in range(300):
        a, b = rng.integers(0, nodes, 2)
        if a != b:
            edges.add((min(int(a), int(b)), max(int(a), int(b))))
    df = pd.DataFrame(sorted(edges), columns=["u", "v"])
    # feed endpoints in scrambled order — canon must fix it
    flip = rng.random(len(df)) < 0.5
    u = np.where(flip, df["v"], df["u"])
    v = np.where(flip, df["u"], df["v"])
    ds = rd.from_arrow(
        pa.table({"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64())})
    )
    n_edges, n_tri = triangle_count(ds, num_buckets=4)
    assert n_edges == len(edges)
    assert n_tri == _brute_triangles(edges)


def test_triangle_free_graph(ray_session):
    import ray.data as rd

    # bipartite graph has no triangles
    df = pd.DataFrame(
        [(a, b) for a in range(5) for b in range(10, 18)], columns=["u", "v"]
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    n_edges, n_tri = triangle_count(ds, num_buckets=3)
    assert (n_edges, n_tri) == (40, 0)


def test_bfs_hops_matches_bruteforce(ray_session):
    import collections

    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.graph import bfs_hops

    rng = np.random.default_rng(13)
    nodes, edges = 60, set()
    for _ in range(90):
        a, b = rng.integers(0, nodes, 2)
        if a != b:
            edges.add((min(int(a), int(b)), max(int(a), int(b))))
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    seeds = [0, 7, 7]  # duplicate seed must not double-emit
    want, frontier = {0: 0, 7: 0}, {0, 7}
    for d in range(1, 4):
        nxt = {n for f in frontier for n in adj[f]} - set(want)
        for n in nxt:
            want[n] = d
        frontier = nxt
    e_ds = rd.from_arrow(
        pa.table(
            {
                "u": pa.array([a for a, _ in sorted(edges)], pa.int64()),
                "v": pa.array([b for _, b in sorted(edges)], pa.int64()),
            }
        )
    )
    s_ds = rd.from_arrow(pa.table({"node": pa.array(seeds, pa.int64())}))
    got = bfs_hops(e_ds, s_ds, max_hops=3, num_buckets=4).to_pandas()
    assert dict(zip(got["node"], got["dist"])) == want
    assert len(got) == len(want)


def test_pagerank_integer_matches_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.graph import pagerank_integer

    rng = np.random.default_rng(3)
    m = 400
    e = pd.DataFrame({"u": rng.integers(0, 60, m), "v": rng.integers(0, 60, m)})
    e = e[e.u != e.v].drop_duplicates().reset_index(drop=True)

    got = pagerank_integer(rd.from_pandas(e), iterations=4).set_index("node")["score"]

    # brute force: dense integer iteration with the same floor divisions
    adj = pd.concat(
        [e, e.rename(columns={"u": "v", "v": "u"})], ignore_index=True
    )
    nodes = np.unique(adj["u"])
    idx = {n: i for i, n in enumerate(nodes)}
    deg = adj.groupby("u").size().reindex(nodes).to_numpy()
    score = np.full(len(nodes), 10**12, dtype=np.int64)
    base = (15 * 10**12) // 100
    for _ in range(4):
        contrib = score // deg
        t = np.zeros(len(nodes), dtype=np.int64)
        for uu, vv in adj.itertuples(index=False):
            t[idx[vv]] += contrib[idx[uu]]
        score = base + (85 * t) // 100
    exp = pd.Series(score, index=nodes)
    assert sorted(got.index) == sorted(exp.index)
    assert (got.reindex(exp.index).to_numpy() == exp.to_numpy()).all()
    # sanity: a hub node outranks a leaf
    assert got.max() > got.min()


def test_pagerank_distributed_bit_exact_vs_driver(ray_session):
    """The BSP-sharded scale path must produce BIT-IDENTICAL int64 scores
    to the driver-lut variant (same floor divisions, different layout)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.graph import (
        pagerank_integer,
        pagerank_integer_distributed,
    )

    rng = np.random.default_rng(9)
    m = 1500
    e = pd.DataFrame({"u": rng.integers(0, 200, m), "v": rng.integers(0, 200, m)})
    e = e[e.u != e.v].drop_duplicates().reset_index(drop=True)

    drv = pagerank_integer(rd.from_pandas(e), iterations=4, scale=10**9)
    dist = (
        pagerank_integer_distributed(
            rd.from_pandas(e), iterations=4, scale=10**9, num_buckets=8
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    drv = drv.sort_values("node").reset_index(drop=True)
    assert (drv["node"].to_numpy() == dist["node"].to_numpy()).all()
    assert (drv["score"].to_numpy() == dist["score"].to_numpy()).all()


def test_pagerank_distributed_million_nodes_off_driver(ray_session):
    """>1M-node ring graph: the distributed variant completes with driver
    state that is O(num_buckets) refs — node-sized arrays never transit
    the driver loop (verdict r4 item 4).  Ring structure makes expected
    scores uniform, so correctness is checkable without a dense brute
    force."""
    import numpy as np
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.graph import (
        pagerank_integer_distributed,
    )

    n = 1_100_000
    nodes = np.arange(n, dtype=np.int64)
    e = pa.table({"u": pa.array(nodes), "v": pa.array((nodes + 1) % n)})
    out = pagerank_integer_distributed(
        rd.from_arrow(e), iterations=2, scale=10**6, num_buckets=32
    )
    # every ring node has degree 2 and identical neighborhood: the integer
    # iteration must assign the SAME score everywhere
    scores = out.to_pandas()
    assert len(scores) == n
    assert scores["score"].nunique() == 1
    s, base = 10**6, (15 * 10**6) // 100
    for _ in range(2):
        s = base + (85 * (2 * (s // 2))) // 100
    assert int(scores["score"].iloc[0]) == s


def test_pagerank_distributed_single_bucket(ray_session):
    """Review r5: num_buckets=1 makes Ray's num_returns=1 hand back a
    bare ref to the 1-element list — must still work and stay bit-exact."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.graph import (
        pagerank_integer,
        pagerank_integer_distributed,
    )

    rng = np.random.default_rng(4)
    e = pd.DataFrame({"u": rng.integers(0, 30, 200), "v": rng.integers(0, 30, 200)})
    e = e[e.u != e.v].drop_duplicates().reset_index(drop=True)
    drv = pagerank_integer(rd.from_pandas(e), iterations=3, scale=10**9)
    one = (
        pagerank_integer_distributed(
            rd.from_pandas(e), iterations=3, scale=10**9, num_buckets=1
        )
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    drv = drv.sort_values("node").reset_index(drop=True)
    assert (drv["score"].to_numpy() == one["score"].to_numpy()).all()


def test_local_clustering_matches_brute_force(ray_session):
    import itertools

    import pandas as pd
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.graph import local_clustering

    rng = np.random.default_rng(5)
    n, m = 60, 400
    edges = set()
    while len(edges) < m:
        a, b = rng.integers(0, n, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    E = pd.DataFrame(sorted(edges), columns=["u", "v"])
    got = (
        local_clustering(rd.from_pandas(E), num_buckets=8)
        .to_pandas().set_index("node").sort_index()
    )
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    deg = {i: len(adj[i]) for i in range(n) if adj[i]}
    tri = {
        i: sum(
            1
            for x, y in itertools.combinations(sorted(adj[i]), 2)
            if y in adj[x]
        )
        for i in deg
    }
    exp = (
        pd.DataFrame(
            {"node": list(deg), "deg": [deg[i] for i in deg],
             "tri": [tri[i] for i in deg]}
        )
        .set_index("node").sort_index()
    )
    assert len(got) == len(exp)
    assert got[["deg", "tri"]].equals(exp[["deg", "tri"]].astype("int64"))


def test_local_clustering_shuffle_path_and_bigid_fallback(ray_session):
    """Force the (w1,w2)-shuffle path (broadcast gate = 0) and the
    unpackable-id fallback (ids >= 2^31): both must equal the fast path."""
    import pandas as pd
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.graph import local_clustering

    rng = np.random.default_rng(9)
    e = pd.DataFrame({"u": rng.integers(0, 40, 300), "v": rng.integers(0, 40, 300)})
    e = e[e.u != e.v].drop_duplicates().reset_index(drop=True)
    fast = (
        local_clustering(rd.from_pandas(e), num_buckets=8)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    shuf = (
        local_clustering(rd.from_pandas(e), num_buckets=8, broadcast_edges_limit=0)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert fast.equals(shuf)
    big = e + 2**31  # ids no longer pack into one int64 -> fallback
    got = (
        local_clustering(rd.from_pandas(big), num_buckets=8)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert (got["tri"].to_numpy() == fast["tri"].to_numpy()).all()
    assert (got["node"].to_numpy() == (fast["node"].to_numpy() + 2**31)).all()
    # triangle_count: broadcast fast path == shuffle path == 3-corner sum
    from cdm_data_loader_utils_ray.functions.graph import triangle_count

    ne_f, nt_f = triangle_count(rd.from_pandas(e), num_buckets=8)
    ne_s, nt_s = triangle_count(rd.from_pandas(e), num_buckets=8,
                                broadcast_edges_limit=0)
    assert (ne_f, nt_f) == (ne_s, nt_s)
    assert nt_f * 3 == int(fast["tri"].sum())


def test_kcore_members_matches_brute_force(ray_session):
    import pandas as pd
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.graph import kcore_members

    def brute(edges, k):
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        changed = True
        while changed:
            changed = False
            for n in list(adj):
                if len(adj[n]) < k:
                    for m in adj.pop(n):
                        adj[m].discard(n)
                    changed = True
        return set(adj)

    rng = np.random.default_rng(11)
    for trial, (n, m) in enumerate([(40, 120), (60, 90), (30, 300)]):
        edges = set()
        while len(edges) < m:
            a, b = rng.integers(0, n, 2)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        E = pd.DataFrame(sorted(edges), columns=["u", "v"])
        for k in (1, 2, 3, 4, 7):
            t = kcore_members(rd.from_pandas(E), k, num_buckets=8).to_pandas()
            # empty-Dataset to_pandas drops columns (known Ray wart)
            got = set(t["node"]) if len(t) else set()
            assert got == brute(edges, k), (trial, k)
    # k beyond every degree: empty core (and an empty-input graph)
    E = pd.DataFrame({"u": [1, 2], "v": [2, 3]})
    assert kcore_members(rd.from_pandas(E), 5, num_buckets=4).count() == 0
    # path graph: k=2 peels one endpoint per round (the unbounded-round
    # case the BSP loop exists for) — core is empty
    P = pd.DataFrame({"u": list(range(20)), "v": list(range(1, 21))})
    assert kcore_members(rd.from_pandas(P), 2, num_buckets=4).count() == 0
    # cycle: every node survives k=2
    C = pd.DataFrame({"u": list(range(12)),
                      "v": [(i + 1) % 12 for i in range(12)]})
    assert kcore_members(rd.from_pandas(C), 2, num_buckets=4).count() == 12


def test_kcore_large_ring_off_driver(ray_session):
    """500k-node ring + a 12-node pendant path: the BSP loop peels the
    path one node per round (the unbounded case) while driver state stays
    O(num_buckets) refs; the ring itself survives k=2 untouched."""
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.graph import kcore_members

    n = 500_000
    nodes = np.arange(n, dtype=np.int64)
    ring_u, ring_v = nodes, (nodes + 1) % n
    tail_u = np.arange(n, n + 12, dtype=np.int64)
    tail_v = tail_u - 1  # n..n+11 chained off ring node n-1... via n-1+1=n
    tail_v[0] = 0  # attach the path to ring node 0
    e = pa.table(
        {
            "u": pa.array(np.concatenate([ring_u, tail_u])),
            "v": pa.array(np.concatenate([ring_v, tail_v])),
        }
    )
    out = kcore_members(rd.from_arrow(e), 2, num_buckets=16)
    assert out.count() == n  # the pendant path peels away entirely
