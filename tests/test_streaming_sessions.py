"""Streaming session windows: exactness under disorder with
lateness=None, watermark closing, late-fragment dropping, cross-batch
session bridging — pinned against a brute-force per-key scan."""

import os
import tempfile

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cdm_data_loader_utils_ray.state.windows_stream import (
    StreamingSessionAggregator,
    _merge_session_fragments,
)

GAP = 100  # us


def _brute_sessions(df, gap=GAP):
    out = []
    for k, g in df.dropna(subset=["ts"]).groupby("user", dropna=False):
        g = g.sort_values("ts", kind="mergesort")
        ts = g["ts"].to_numpy()
        brk = np.ones(len(g), dtype=bool)
        brk[1:] = (ts[1:] - ts[:-1]) > gap
        sid = np.cumsum(brk)
        for s in np.unique(sid):
            m = sid == s
            vals = g["v"].to_numpy()[m]
            out.append(
                (
                    str(k),
                    int(ts[m].min()),
                    int(ts[m].max()),
                    int(np.sum(~np.isnan(vals))),
                    float(np.nansum(vals)),
                )
            )
    return sorted(out)


def _collect(agg):
    t = agg.close().to_pandas()
    return sorted(
        (r["key"], int(r["session_start_us"]), int(r["session_end_us"]),
         int(r["n"]), float(r["s"]))
        for _, r in t.iterrows()
    )


def test_exact_under_disorder():
    rng = np.random.default_rng(5)
    n = 4000
    df = pd.DataFrame(
        {
            "user": rng.integers(0, 30, n),
            "ts": rng.integers(0, 20000, n).astype("int64"),
            "v": rng.normal(size=n),
        }
    )
    df.loc[rng.random(n) < 0.05, "v"] = np.nan  # null values still count rows? no: n counts non-null
    agg = StreamingSessionAggregator(
        "user", "v", ts_column="ts", gap_us=GAP,
        allowed_lateness_us=None, num_shards=3,
    )
    try:
        # shuffled feed in small batches: arrival order != event order
        agg.feed(rd.from_pandas(df.sample(frac=1.0, random_state=1)), batch_size=257)
        got = _collect(agg)
    finally:
        agg.shutdown()
    exp = _brute_sessions(df)
    assert [g[:4] for g in got] == [e[:4] for e in exp]
    for g, e in zip(got, exp):
        assert g[4] == pytest.approx(e[4], abs=1e-9)


def test_cross_batch_bridging():
    # one session split across three pushes, middle batch arrives last
    df = pd.DataFrame(
        {"user": [1] * 6, "ts": [0, 50, 120, 170, 240, 290], "v": [1.0] * 6}
    )
    agg = StreamingSessionAggregator(
        "user", "v", ts_column="ts", gap_us=GAP,
        allowed_lateness_us=None, num_shards=2,
    )
    try:
        for part in (df.iloc[[0, 1]], df.iloc[[4, 5]], df.iloc[[2, 3]]):
            agg.feed(rd.from_pandas(part))
        got = _collect(agg)
    finally:
        agg.shutdown()
    assert got == [("1", 0, 290, 6, 6.0)]


def test_watermark_closes_and_drops_late():
    agg = StreamingSessionAggregator(
        "user", "v", ts_column="ts", gap_us=GAP,
        allowed_lateness_us=50, num_shards=2,
    )
    try:
        agg.feed(rd.from_pandas(pd.DataFrame(
            {"user": [1, 1], "ts": [0, 60], "v": [1.0, 1.0]})))
        # watermark jumps far ahead: session [0,60] closes (end < wm - gap)
        agg.feed(rd.from_pandas(pd.DataFrame(
            {"user": [2], "ts": [10_000], "v": [1.0]})))
        assert len(agg.emitted) >= 1
        emitted = sorted(
            tuple(r) for t in agg.emitted
            for r in t.to_pandas()[["key", "session_start_us", "session_end_us"]]
            .itertuples(index=False)
        )
        assert ("1", 0, 60) in emitted
        # a fragment wholly inside closed territory drops as late
        agg.feed(rd.from_pandas(pd.DataFrame(
            {"user": [1], "ts": [30], "v": [1.0]})))
        stats = agg.stats()
        assert sum(s["late_dropped"] for s in stats) == 1
        got = _collect(agg)
    finally:
        agg.shutdown()
    # closed session emitted once; late event NOT re-applied
    assert ("1", 0, 60, 2, 2.0) in got
    assert ("2", 10_000, 10_000, 1, 1.0) in got
    assert len(got) == 2


def test_merge_fragments_null_keys_group_together():
    df = pd.DataFrame(
        {
            "key": [None, None, "a"],
            "start_us": [0, 50, 0],
            "end_us": [0, 50, 0],
            "n": [1, 1, 1],
            "s": [1.0, 1.0, 1.0],
        }
    )
    out = _merge_session_fragments(df, GAP)
    assert len(out) == 2  # both null-key fragments merged into one session
    nul = out[out["key"].isna()]
    assert len(nul) == 1 and int(nul["n"].iloc[0]) == 2


def test_nullable_int_key_routes_dtype_stable(ray_session):
    """r4 advice: routing hashed the raw per-batch pandas dtype; a
    nullable-int key column converts to int64 for null-free batches but
    float64 for batches containing nulls, so the SAME key hashed to
    different shards, its fragments never merged, and close() emitted
    overlapping duplicate sessions.  Conversion now pins integer columns
    to nullable Int64 on every batch."""
    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame(
        {
            "user": rng.integers(0, 20, n).astype("float64"),
            "ts": rng.integers(0, 15000, n).astype("int64"),
            "v": rng.normal(size=n),
        }
    )
    # nulls clustered so that SOME batches are null-free and others not
    df.loc[: n // 10, "user"] = np.nan
    df["user"] = df["user"].astype("Int64")  # arrow int64 with nulls

    agg = StreamingSessionAggregator(
        "user", "v", ts_column="ts", gap_us=GAP, allowed_lateness_us=None,
        num_shards=4,
    )
    # The source must be PARQUET: in-memory pandas/arrow blocks keep
    # nullable Int64 through Ray's batch conversion and mask the bug, but
    # parquet-read batches use plain arrow->pandas, which yields float64
    # keys for batches containing nulls and int64 for null-free batches —
    # the dtype flip that (pre-fix) split one key across shards.
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    cut = n // 8
    assert df["user"][:cut].isna().any() and not df["user"][cut:].isna().any()
    d = tempfile.mkdtemp(prefix="sess_nullkey_")

    def _plain_table(part: pd.DataFrame) -> _pa.Table:
        # NO pandas schema metadata (Table.from_pandas embeds it, and
        # to_pandas then restores Int64, masking the bug): files written
        # by other engines carry a plain int64 column
        return _pa.table(
            {
                "user": _pa.array(part["user"], type=_pa.int64()),
                "ts": _pa.array(part["ts"], type=_pa.int64()),
                "v": _pa.array(part["v"], type=_pa.float64()),
            }
        )

    _pq.write_table(_plain_table(df.iloc[:cut]), os.path.join(d, "a.parquet"))
    _pq.write_table(_plain_table(df.iloc[cut:]), os.path.join(d, "b.parquet"))
    src = rd.read_parquet(d)
    seen = {
        str(b["user"].dtype)
        for b in src.iter_batches(batch_format="pandas", batch_size=128)
    }
    assert {"int64", "float64"} <= seen, f"repro precondition lost: {seen}"
    agg.feed(src, batch_size=128)
    got = agg.close().to_pandas()

    # no overlapping duplicate sessions: for each key, sessions separated
    # by > gap, and fragment merge must equal the brute-force scan
    brute = _brute_sessions(
        df.rename(columns={}).assign(user=df["user"].astype("float64"))
    )
    # brute stringifies float keys ('3.0'); engine emits Int64 ('3') —
    # compare on the numeric value
    def norm(rows):
        return sorted(
            (("null" if k in ("nan", "None", "<NA>") else str(int(float(k)))),
             a, b, c, round(s, 9))
            for (k, a, b, c, s) in rows
        )

    got_rows = [
        ("<NA>" if pd.isna(r["key"]) else str(r["key"]),
         int(r["session_start_us"]), int(r["session_end_us"]),
         int(r["n"]), float(r["s"]))
        for _, r in got.iterrows()
    ]
    brute_keyed = [("nan" if k == "nan" else k, a, b, c, s)
                   for (k, a, b, c, s) in brute]
    assert norm(got_rows) == norm(brute_keyed)


def test_stable_pandas_covers_uint64():
    """Review r5: uint64 was missing from the nullable mapper — the
    dtype-flip routing bug applied to uint64 keys unchanged (plus values
    past 2^53 corrupt through float64)."""
    import pyarrow as pa

    from cdm_data_loader_utils_ray.state.windows_stream import _stable_pandas

    big = 2**63 + 11  # not representable in int64 or exactly in float64
    with_nulls = pa.table({"k": pa.array([big, None], type=pa.uint64())})
    null_free = pa.table({"k": pa.array([big, 7], type=pa.uint64())})
    a = _stable_pandas(with_nulls)["k"]
    b = _stable_pandas(null_free)["k"]
    assert str(a.dtype) == str(b.dtype) == "UInt64"
    assert int(a.iloc[0]) == big and int(b.iloc[0]) == big
