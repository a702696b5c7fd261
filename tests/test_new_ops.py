"""Unit tests for the round-3 operator additions: grouped quantiles,
pivoted counts, top-N ranking window, deterministic hash sampling/split,
TF-IDF, and token-window chunking."""

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _ds(df: pd.DataFrame, blocks: int = 4):
    return rd.from_pandas(df).repartition(blocks)


# ---------------------------------------------------------------------------
# grouped_quantiles
# ---------------------------------------------------------------------------
def test_grouped_quantiles_matches_numpy_linear():
    from cdm_data_loader_utils_ray.functions.aggregates import grouped_quantiles

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {"g": rng.integers(0, 5, 1000).astype(str), "v": rng.normal(size=1000)}
    )
    out = (
        grouped_quantiles(_ds(df), ["g"], "v", {"p50": 0.5, "p95": 0.95})
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    for _, row in out.iterrows():
        vals = df.loc[df["g"] == row["g"], "v"].to_numpy()
        assert row["p50"] == pytest.approx(np.quantile(vals, 0.5), abs=0, rel=0)
        assert row["p95"] == pytest.approx(np.quantile(vals, 0.95), abs=0, rel=0)


# ---------------------------------------------------------------------------
# pivot_counts
# ---------------------------------------------------------------------------
def test_pivot_counts_categories_and_other():
    from cdm_data_loader_utils_ray.functions.aggregates import pivot_counts

    df = pd.DataFrame(
        {
            "k": ["a", "a", "b", "b", "b"],
            "c": ["x", "y", "x", "zzz", None],
        }
    )
    out = (
        pivot_counts(_ds(df, blocks=2), ["k"], "c", ["x", "y"])
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    assert out.loc["a", "n_x"] == 1 and out.loc["a", "n_y"] == 1
    assert out.loc["a", "n_other"] == 0
    assert out.loc["b", "n_x"] == 1 and out.loc["b", "n_y"] == 0
    assert out.loc["b", "n_other"] == 2  # 'zzz' and the null


# ---------------------------------------------------------------------------
# top_n_per_group: the per-batch combiner must not lose global winners
# ---------------------------------------------------------------------------
def test_top_n_per_group_across_batches():
    from cdm_data_loader_utils_ray.functions.aggregates import top_n_per_group

    # winners deliberately scattered so every batch's local top-2 differs
    # from the global top-2
    df = pd.DataFrame(
        {
            "g": ["g1"] * 50 + ["g2"] * 50,
            "v": list(range(50)) + list(range(100, 150)),
            "id": range(100),
        }
    )
    df = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    out = (
        top_n_per_group(
            _ds(df, blocks=8), ["g"], "v", 2, tiebreak=["id"], rank_column="rnk",
            batch_size=16,
        )
        .to_pandas()
        .sort_values(["g", "rnk"])
        .reset_index(drop=True)
    )
    assert out["v"].tolist() == [49, 48, 149, 148]
    assert out["rnk"].tolist() == [1, 2, 1, 2]


def test_top_n_per_group_ties_break_by_tiebreak():
    from cdm_data_loader_utils_ray.functions.aggregates import top_n_per_group

    df = pd.DataFrame({"g": ["a"] * 4, "v": [5, 5, 5, 5], "id": [3, 1, 2, 0]})
    out = (
        top_n_per_group(_ds(df, blocks=2), ["g"], "v", 3, tiebreak=["id"])
        .to_pandas()
        .sort_values("rnk")
    )
    assert out["id"].tolist() == [0, 1, 2]


# ---------------------------------------------------------------------------
# hash sampling / split
# ---------------------------------------------------------------------------
def test_hash_sample_matches_reference_digest_rule():
    from cdm_data_loader_utils_ray.functions.sampling import hash_sample

    df = pd.DataFrame({"id": range(500), "s": ["en" if i % 3 == 0 else "de" for i in range(500)]})
    out = hash_sample(
        _ds(df), "id", stratum_column="s", rates={"en": 0.5}, default_rate=0.25
    ).to_pandas()

    def keep(i, s):
        thr = "8" + "0" * 31 if s == "en" else "4" + "0" * 31
        return hashlib.md5(str(i).encode()).hexdigest() < thr

    expected = {i for i, s in zip(df["id"], df["s"]) if keep(i, s)}
    assert set(out["id"]) == expected


def test_hash_split_fractions_and_stability():
    from cdm_data_loader_utils_ray.functions.sampling import hash_split

    df = pd.DataFrame({"id": range(2000)})
    out = hash_split(_ds(df), "id", {"train": 0.8, "val": 0.1, "test": 0.1}).to_pandas()
    counts = out["split"].value_counts()
    assert counts["train"] == pytest.approx(1600, abs=80)
    assert counts["val"] == pytest.approx(200, abs=50)
    # deterministic: same assignment on rerun and independent of other rows
    again = hash_split(_ds(df.iloc[:100]), "id", {"train": 0.8, "val": 0.1, "test": 0.1}).to_pandas()
    merged = again.merge(out, on="id", suffixes=("_a", "_b"))
    assert (merged["split_a"] == merged["split_b"]).all()


def test_hash_sample_rate_edges():
    from cdm_data_loader_utils_ray.functions.sampling import hash_sample

    df = pd.DataFrame({"id": range(64)})
    assert len(hash_sample(_ds(df), "id", rate=1.0).to_pandas()) == 64
    assert len(hash_sample(_ds(df), "id", rate=0.0).to_pandas()) == 0


def test_hash_split_rejects_bad_fractions():
    from cdm_data_loader_utils_ray.functions.sampling import hash_split

    with pytest.raises(ValueError):
        hash_split(_ds(pd.DataFrame({"id": [1]})), "id", {"a": 0.5, "b": 0.6})


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------
def test_chunk_documents_windows():
    from cdm_data_loader_utils_ray.functions.chunking import chunk_documents

    texts = {
        1: " ".join(f"t{i}" for i in range(10)),   # 10 tokens -> 2 chunks @ size 6 stride 4
        2: "one",                                   # 1 token  -> 1 chunk
        3: "",                                      # '' splits to [''] -> 1 chunk
        4: " ".join(f"w{i}" for i in range(8)),    # exactly 2*stride
    }
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    out = (
        chunk_documents(_ds(df, blocks=2), size=6, stride=4)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    by = {(r.doc_id, r.chunk_id): r for r in out.itertuples()}
    # doc 1: starts 0,4,8 (8 < 10) -> 3 chunks of 6,6,2 tokens
    assert [by[(1, i)].n_tokens for i in range(3)] == [6, 6, 2]
    assert by[(1, 1)].chunk_text == "t4 t5 t6 t7 t8 t9"
    assert by[(1, 2)].chunk_text == "t8 t9"
    assert by[(2, 0)].n_tokens == 1 and by[(2, 0)].chunk_text == "one"
    assert by[(3, 0)].n_tokens == 1 and by[(3, 0)].chunk_text == ""
    # doc 4: 8 tokens, starts 0,4 -> 2 chunks (start 8 is not < 8)
    assert len([k for k in by if k[0] == 4]) == 2


# ---------------------------------------------------------------------------
# tf-idf
# ---------------------------------------------------------------------------
def test_tfidf_top_terms_small_corpus():
    from cdm_data_loader_utils_ray.functions.tfidf import tfidf_top_terms

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "apple apple banana",
                "banana cherry",
                "cherry cherry cherry common",
                "common common",
            ],
        }
    )
    out = tfidf_top_terms(_ds(df, blocks=2), top_k=2).to_pandas()
    # doc 1: apple tf=2 df=1 -> score 8; banana tf=1 df=2 -> 2
    d1 = out[out["doc_id"] == 1].sort_values("rnk")
    assert d1["term"].tolist() == ["apple", "banana"]
    assert d1["score"].tolist() == [8.0, 2.0]
    # doc 3: cherry tf=3 df=2 -> 6; common tf=1 df=2 -> 2
    d3 = out[out["doc_id"] == 3].sort_values("rnk")
    assert d3["term"].tolist() == ["cherry", "common"]
    assert d3["score"].tolist() == [6.0, 2.0]
    # ranks dense per doc, max 2 rows per doc
    assert (out.groupby("doc_id")["rnk"].max() <= 2).all()


def test_tfidf_spill_path_matches_materialize_path(tmp_path):
    """The Parquet-spill scale path (terms written once, each consumer
    streaming from disk) must produce identical rows to the small-corpus
    materialize path."""
    from cdm_data_loader_utils_ray.functions.tfidf import tfidf_top_terms

    df = pd.DataFrame(
        {
            "doc_id": list(range(1, 9)),
            "text": [
                "apple apple banana",
                "banana cherry",
                "cherry cherry cherry common",
                "common common",
                "delta echo foxtrot",
                "echo echo delta",
                "foxtrot apple",
                "",
            ],
        }
    )
    cols = ["doc_id", "term", "tf", "df", "score", "rnk"]
    base = (
        tfidf_top_terms(_ds(df, blocks=3), top_k=2)
        .to_pandas()[cols]
        .sort_values(["doc_id", "rnk"])
        .reset_index(drop=True)
    )
    spilled = (
        tfidf_top_terms(_ds(df, blocks=3), top_k=2, spill_dir=str(tmp_path / "sp"))
        .to_pandas()[cols]
        .sort_values(["doc_id", "rnk"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, spilled, check_dtype=False)
    # the spill actually happened (parquet files on disk, in a per-call subdir)
    import os

    found = [
        f for _root, _dirs, files in os.walk(tmp_path / "sp") for f in files
        if f.endswith(".parquet")
    ]
    assert found
    # REUSING the same spill_dir must not mix in stale term files from the
    # previous call (r3 ADVICE: each call spills into a fresh subdirectory)
    again = (
        tfidf_top_terms(_ds(df, blocks=3), top_k=2, spill_dir=str(tmp_path / "sp"))
        .to_pandas()[cols]
        .sort_values(["doc_id", "rnk"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, again, check_dtype=False)


def test_tfidf_tokenization_matches_textstats_ascii_rule():
    from cdm_data_loader_utils_ray.functions.tfidf import doc_term_counts

    df = pd.DataFrame({"doc_id": [1], "text": ["Héllo wörld foo_bar FOO_bar 42x"]})
    out = doc_term_counts(_ds(df, blocks=1)).to_pandas()
    terms = dict(zip(out["term"], out["tf"]))
    # ASCII word class splits on the accented chars; lowercase folds FOO_bar
    assert terms == {"h": 1, "llo": 1, "w": 1, "rld": 1, "foo_bar": 2, "42x": 1}


# ---------------------------------------------------------------------------
# temperature_sample / cap_per_group (round-4 data-mixing ops)
# ---------------------------------------------------------------------------
def _portable_u(ids: np.ndarray) -> np.ndarray:
    return ((ids % 1_000_003) * 2_654_435_761) % (1 << 32)


def test_portable_uniform_matches_arithmetic_and_drops_nulls():
    import pyarrow as pa

    from cdm_data_loader_utils_ray.functions.sampling import portable_uniform

    ids = pa.array([0, 7, 1_000_003, 999_999_999, None], type=pa.int64())
    u, valid, rng = portable_uniform(ids)
    ref = _portable_u(np.array([0, 7, 1_000_003, 999_999_999, 0], dtype=np.int64))
    assert (u == ref).all() and rng == 1 << 32
    assert valid.tolist() == [True, True, True, True, False]
    with pytest.raises(ValueError, match="non-negative"):
        portable_uniform(pa.array([-1], type=pa.int64()))


def test_portable_uniform_string_ids_match_duckdb_hexcast():
    import duckdb
    import pyarrow as pa

    from cdm_data_loader_utils_ray.functions.sampling import portable_uniform

    vals = ["abc", "", "doc-42", None]
    u, valid, rng = portable_uniform(pa.array(vals, type=pa.string()))
    assert rng == 1 << 52
    assert valid.tolist() == [True, True, True, False]
    con = duckdb.connect()
    for s, got in zip(vals[:3], u[:3]):
        want = con.sql(
            "SELECT CAST(('0x' || substr(md5(?), 1, 13)) AS BIGINT)", params=[s]
        ).fetchone()[0]
        assert got == want, s


def test_cap_per_group_string_ids():
    from cdm_data_loader_utils_ray.functions.sampling import cap_per_group

    df = pd.DataFrame(
        {
            "id": [f"doc-{i}" for i in range(60)],
            "host": [f"h{i % 2}" for i in range(60)],
        }
    )
    out = cap_per_group(_ds(df), "host", "id", k=5).to_pandas()
    assert (out.groupby("host").size() == 5).all()
    again = cap_per_group(_ds(df, blocks=7), "host", "id", k=5).to_pandas()
    assert set(zip(out["id"], out["rn"])) == set(zip(again["id"], again["rn"]))


def test_temperature_sample_keeps_min_group_and_downsamples_large():
    from cdm_data_loader_utils_ray.functions.sampling import temperature_sample

    # small group: 50 rows, large group: 800 rows -> rate sqrt(50/800)=0.25
    df = pd.DataFrame(
        {
            "id": np.arange(850, dtype=np.int64),
            "g": ["small"] * 50 + ["big"] * 800,
        }
    )
    out = temperature_sample(_ds(df), "g", "id", temperature=0.5).to_pandas()
    small = out[out["g"] == "small"]
    big = out[out["g"] == "big"]
    # rate for the min group is exactly 1.0 -> every row kept
    assert len(small) == 50
    # expected ~200 of 800; the draw is deterministic, assert the exact
    # reference computation
    ids = df[df["g"] == "big"]["id"].to_numpy()
    frac = _portable_u(ids).astype(np.float64) / float(1 << 32)
    want = int((frac < np.sqrt(np.float64(50) / np.float64(800))).sum())
    assert len(big) == want
    assert 100 < want < 300  # sanity: the hash really is uniform-ish


def test_temperature_sample_tau_one_is_identity():
    from cdm_data_loader_utils_ray.functions.sampling import temperature_sample

    df = pd.DataFrame(
        {"id": np.arange(120, dtype=np.int64), "g": ["a"] * 20 + ["b"] * 100}
    )
    out = temperature_sample(_ds(df), "g", "id", temperature=1.0).to_pandas()
    assert len(out) == 120


def test_cap_per_group_caps_and_is_rerun_stable():
    from cdm_data_loader_utils_ray.functions.sampling import cap_per_group

    df = pd.DataFrame(
        {
            "id": np.arange(300, dtype=np.int64),
            "host": [f"h{i % 3}" for i in range(300)],
        }
    )
    out = cap_per_group(_ds(df), "host", "id", k=7).to_pandas()
    assert (out.groupby("host").size() == 7).all()
    assert set(out["rn"]) == set(range(1, 8))
    # ranks follow portable-uniform order with id tiebreak (row_number)
    for _, grp in out.groupby("host"):
        u = _portable_u(grp["id"].to_numpy())
        order = np.lexsort((grp["id"].to_numpy(), u))
        assert (grp["rn"].to_numpy()[order] == np.arange(1, 8)).all()
    again = cap_per_group(_ds(df, blocks=9), "host", "id", k=7).to_pandas()
    a = out.sort_values(["host", "rn"]).reset_index(drop=True)
    b = again.sort_values(["host", "rn"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["id", "host", "rn"]], b[["id", "host", "rn"]])


def test_cap_per_group_small_groups_pass_through():
    from cdm_data_loader_utils_ray.functions.sampling import cap_per_group

    df = pd.DataFrame({"id": np.arange(5, dtype=np.int64), "host": list("aabbc")})
    out = cap_per_group(_ds(df, blocks=2), "host", "id", k=10).to_pandas()
    assert len(out) == 5


def test_ntile_formula_matches_duckdb_for_uneven_n():
    # the sf tables have N % 10 == 0, so the remainder branch of the NTILE
    # bucket arithmetic is never oracle-exercised — pin it against DuckDB
    # ntile() directly for uneven sizes and several k
    import duckdb

    con = duckdb.connect()
    for n in (1, 7, 10, 37, 101, 1003):
        for k in (1, 3, 10):
            rn = np.arange(1, n + 1, dtype=np.int64)
            q, rem = divmod(n, k)
            head = rem * (q + 1)
            got = (
                np.where(rn <= head, (rn - 1) // (q + 1),
                         rem + (rn - head - 1) // max(q, 1)) + 1
            )
            want = con.sql(
                f"SELECT ntile({k}) OVER (ORDER BY i) AS b"
                f" FROM range(1, {n + 1}) t(i) ORDER BY i"
            ).df()["b"].to_numpy()
            assert (got == want).all(), (n, k)


def test_grouped_exact_sums_beats_float_accumulation():
    # a corpus engineered so float64 accumulation of y^2 provably drifts
    # (each term > 2^53, so even the FIRST add rounds): the distributed
    # int-moment pipeline must equal the arbitrary-precision reference
    # while the float64 pipeline does not
    from cdm_data_loader_utils_ray.functions.aggregates import grouped_exact_sums

    rng = np.random.default_rng(7)
    # 4001 ODD values: each y^2 is odd, so the exact total (sum of an odd
    # count of odd ints) is odd — but every float64 integer above 2^53 is
    # even, so NO float pipeline can land on it
    y = (rng.integers(95_000_000, 150_000_001, size=4001) | 1).astype(np.int64)
    exact_syy = sum(int(v) * int(v) for v in y)  # Python ints, exact
    float_syy = float(np.sum(y.astype(np.float64) ** 2))
    assert exact_syy % 2 == 1 and exact_syy > 2**53
    assert int(float_syy) != exact_syy  # drift is structural on this corpus

    df = pd.DataFrame({"k": ["g"] * len(y), "yy": y * y})  # yy fits int64/row

    def prepare(d):
        return pd.DataFrame({"k": d["k"], "yy": d["yy"].to_numpy()})

    out = grouped_exact_sums(_ds(df, blocks=5), "k", prepare, ["yy"],
                             batch_size=100)
    assert out["g"] == (len(y), exact_syy)


def test_grouped_exact_sums_null_keys_fold_to_one_group():
    # float-typed NaN keys cross fold batches as distinct NaN objects —
    # the driver fold must still land them in ONE null group
    from cdm_data_loader_utils_ray.functions.aggregates import grouped_exact_sums

    df = pd.DataFrame(
        {"k": [np.nan, 1.0, np.nan, 1.0] * 50, "v": np.ones(200, dtype=np.int64)}
    )

    def prepare(d):
        return pd.DataFrame({"k": d["k"], "v": d["v"].to_numpy()})

    out = grouped_exact_sums(_ds(df, blocks=8), "k", prepare, ["v"],
                             batch_size=7)
    assert out[None] == (100, 100)
    assert out[1.0] == (100, 100)
    assert len(out) == 2


def test_grouped_exact_sums_is_arbitrary_precision():
    # totals engineered to exceed both int64 and float53 — the three-level
    # fold must still be exact, and the distributed fold stage (object-dtype
    # Python-int sums over string-emitting batches) must bound driver rows
    from cdm_data_loader_utils_ray.functions.aggregates import grouped_exact_sums

    big = (1 << 61) + 12345  # one partial already near int64 ceiling
    df = pd.DataFrame(
        {
            "k": ["a", "b"] * 300,
            "v": np.full(600, 10**15, dtype=np.int64),
        }
    )

    def prepare(d):
        return pd.DataFrame({"k": d["k"], "v": d["v"].to_numpy()})

    out = grouped_exact_sums(_ds(df, blocks=6), "k", prepare, ["v"],
                             batch_size=50)
    assert out["a"] == (300, 300 * 10**15)
    assert out["b"] == (300, 300 * 10**15)
    assert isinstance(out["a"][1], int)
    # a second call whose exact total exceeds 2^63 (int64) round-trips
    df2 = pd.DataFrame({"k": ["z"] * 40, "v": np.full(40, big, dtype=np.int64)})
    out2 = grouped_exact_sums(_ds(df2, blocks=4), "k", prepare, ["v"],
                              batch_size=2)
    assert out2["z"] == (40, 40 * big)  # 9.2e19 > int64 max


def test_debounce_events_null_user_ids_group_together(tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from cdm_data_loader_utils_ray.queries import DEBOUNCE_EVENTS_SQL, debounce_events

    base = pd.Timestamp("2024-01-01")
    t = [base + pd.Timedelta(minutes=m) for m in (0, 10, 90, 95, 200)]
    df = pd.DataFrame(
        {
            "event_id": np.arange(5, dtype=np.int64),
            # SQL PARTITION BY groups the NULLs together: of the five
            # null-user 'click's only rows 0, 2(?), 4 survive the 1h gap
            "user_id": pd.array([None] * 5, dtype="Int64"),
            "event_type": ["click"] * 5,
            "ts": t,
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = debounce_events(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    want = con.sql(DEBOUNCE_EVENTS_SQL).df()
    assert sorted(got["event_id"]) == sorted(want["event_id"])
    assert got["user_id"].isna().all() and len(got) == len(want)


def test_string_agg_events_null_users_group_together(tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from cdm_data_loader_utils_ray.queries import (
        STRING_AGG_EVENTS_SQL,
        string_agg_events,
    )

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "event_id": np.arange(6, dtype=np.int64),
            "user_id": pd.array([None, 7, None, 7, None, None], dtype="Int64"),
            "event_type": ["a", "b", "c", None, "d", "e"],
            "ts": [base + pd.Timedelta(minutes=m) for m in range(6)],
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = string_agg_events(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    want = con.sql(STRING_AGG_EVENTS_SQL).df()
    g = got.sort_values("user_id", na_position="last").reset_index(drop=True)
    w = want.sort_values("user_id", na_position="last").reset_index(drop=True)
    assert g["type_seq"].tolist() == w["type_seq"].tolist()  # null user: a|c|d|e
    assert g["n_events"].tolist() == w["n_events"].tolist()


def test_centroid_assign_sparse_centroid_ids(tmp_path):
    # labels must be the ACTUAL vec_ids (which need not be dense 0..7),
    # matching the SQL twin's cid labels and (dist2, cid) tie order
    import duckdb
    import pyarrow.parquet as pq

    from cdm_data_loader_utils_ray.queries import CENTROID_ASSIGN_SQL, centroid_assign

    rng = np.random.default_rng(2)
    vec_ids = [0, 2, 5, 7] + list(range(10, 30))  # sparse centroid set
    emb = [rng.normal(size=8).astype(np.float32).tolist() for _ in vec_ids]
    tbl = pa.table(
        {
            "vec_id": pa.array(vec_ids, pa.int64()),
            "embedding": pa.array(emb, pa.list_(pa.float32())),
            "label": pa.array([0] * len(vec_ids), pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    got = centroid_assign(str(tmp_path)).to_pandas().sort_values("vec_id")
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{tmp_path}/embeddings.parquet')"
    )
    want = con.sql(CENTROID_ASSIGN_SQL).df().sort_values("vec_id")
    assert got["cluster"].tolist() == want["cluster"].tolist()
    assert got["dist2"].tolist() == want["dist2"].tolist()
    assert set(got["cluster"]) <= {0, 2, 5, 7}


def test_temperature_sample_null_groups_drop_but_shape_nmin():
    # SQL twin: the JOIN drops null-group rows, but GROUP BY counts the
    # null group so min(n) can come FROM it
    from cdm_data_loader_utils_ray.functions.sampling import temperature_sample

    df = pd.DataFrame(
        {
            "id": np.arange(400, dtype=np.int64),
            "g": pd.array(
                [None] * 10 + ["big"] * 350 + ["small"] * 40, dtype="string"
            ),
        }
    )
    out = temperature_sample(_ds(df, blocks=5), "g", "id",
                             temperature=0.5).to_pandas()
    assert not out["g"].isna().any()  # null-group rows never emit
    # nmin = 10 (the null group): 'small' keeps ~sqrt(10/40)=50%, not 100%
    n_small = (out["g"] == "small").sum()
    assert 0 < n_small < 40


def test_temperature_sample_all_null_group_batch():
    # a block whose group column is ENTIRELY null must filter to empty,
    # not IndexError on the empty factorize uniques
    from cdm_data_loader_utils_ray.functions.sampling import temperature_sample

    df = pd.DataFrame(
        {
            "id": np.arange(40, dtype=np.int64),
            "g": pd.array([None] * 20 + ["a"] * 20, dtype="string"),
        }
    )
    # blocks=2: one block is likely all-null; force it via sort
    ds = rd.from_pandas(df.sort_values("g", na_position="first")).repartition(2)
    out = temperature_sample(ds, "g", "id", temperature=1.0).to_pandas()
    assert not out["g"].isna().any()
    assert set(out["g"]) <= {"a"}
