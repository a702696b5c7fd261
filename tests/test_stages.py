"""Unit tests for stateless stages (no Ray needed beyond the session)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from cdm_data_loader_utils_ray.core.schemas import (
    ERRORS_COLUMN,
    EVENT_SCHEMA,
    SHA_COLUMN,
    STATE_SCHEMA,
)
from cdm_data_loader_utils_ray.stages.hashing import (
    add_content_sha256,
    normalize_multiline_text,
    set_hash,
    sha256_hex,
    table_fingerprint,
)
from cdm_data_loader_utils_ray.stages.partition import (
    add_partition_column,
    add_salted_partition_column,
    detect_hot_keys,
    stable_key_hash,
)
from cdm_data_loader_utils_ray.stages.schema_align import (
    align_to_schema,
    evolve_schema,
    rename_columns,
    union_by_name,
)
from cdm_data_loader_utils_ray.stages.validate import EventValidator, split_valid
from cdm_data_loader_utils_ray.state.upsert import (
    events_to_state,
    merge_states,
    oracle_materialize,
    prereduce_batch,
)
from cdm_data_loader_utils_ray.synth import make_events


def _events(**kw):
    return make_events(num_keys=50, num_events=300, seed=11, **kw)


# -- hashing ----------------------------------------------------------------
def test_sha256_matches_hashlib():
    t = pa.table({"content": ["abc", None, "x" * 1000]})
    out = add_content_sha256(t)
    assert out[SHA_COLUMN][0].as_py() == hashlib.sha256(b"abc").hexdigest()
    assert out[SHA_COLUMN][1].as_py() is None


def test_normalize_multiline():
    assert normalize_multiline_text("a  \nb\t\nc") == "a\nb\nc"


def test_set_hash_order_independent():
    a, b = sha256_hex("a"), sha256_hex("b")
    assert set_hash([a, b]) == set_hash([b, a])
    t1 = pa.table({SHA_COLUMN: [a, b]})
    t2 = pa.table({SHA_COLUMN: [b, a]})
    assert table_fingerprint(t1) == table_fingerprint(t2)


# -- partitioning -----------------------------------------------------------
def test_stable_key_hash_frozen_golden():
    """The lake's partition layout depends on stable_key_hash staying
    byte-stable FOREVER (CLAUDE.md invariant).  Golden values captured from
    the r2 per-row-zlib implementation; the r3 vectorized CRC must match
    bit for bit, including empty strings, unicode, long keys, the \\x1f
    separator and nulls."""
    from cdm_data_loader_utils_ray.stages.partition import stable_key_hash

    keys = ["", "a", "ab", "repo-1", "src/main.py", "ünïcode/路径.py",
            "x" * 300, "\x1f", "a\x1fb"]
    h = stable_key_hash(pa.table({"k": keys}), ["k"])
    assert [hex(int(v)) for v in h] == [
        "0x0", "0x457845596e390f7f", "0x103c20d42b7bbcf1",
        "0xb5a9b4e24fc0bf00", "0x229f6cb6f7a48b5a", "0xff00ef381431a506",
        "0x1ee75b47ae35e68f", "0x7647e899546b3d8", "0x2a5ffb885375859b",
    ]
    t2 = pa.table({"r": ["repo-1", "repo-2", "ab", ""],
                   "p": ["src/a.py", "b", "c", "d"]})
    assert [hex(int(v)) for v in stable_key_hash(t2, ["r", "p"])] == [
        "0xa9425495a94bdeb3", "0xc48c0ef2f8a413dc",
        "0x6c4aa27bd41febe8", "0x263b9bdede86afa0",
    ]
    t3 = pa.table({"k": pa.array(["a", None, "b"])})
    assert [hex(int(v)) for v in stable_key_hash(t3, ["k"])] == [
        "0x457845596e390f7f", "0x0", "0x60cd153094404b6d",
    ]


def test_stable_key_hash_matches_zlib_per_row():
    """Property check: the vectorized CRC path == per-row zlib.crc32 on a
    random corpus spanning the long-key fallback boundary, sliced arrays,
    and large_string."""
    from zlib import crc32

    rng = np.random.default_rng(7)
    keys = [
        "".join(chr(rng.integers(32, 0x3000)) for _ in range(int(n)))
        for n in rng.integers(0, 700, size=200)
    ]
    for typ in (pa.string(), pa.large_string()):
        arr = pa.array(keys, type=typ)
        # non-zero offset slice exercises the offsets[off0:] path
        t = pa.table({"k": arr.slice(3, 150)})
        h = stable_key_hash(t, ["k"])
        expect = np.array(
            [crc32(k.encode()) for k in keys[3:153]], dtype=np.uint64
        )
        expect ^= expect << np.uint64(21)
        expect *= np.uint64(0x9E3779B97F4A7C15)
        assert (h == expect).all()


def test_partition_stable_and_in_range():
    ev = _events()
    h1 = stable_key_hash(ev, ["repo", "path"])
    h2 = stable_key_hash(ev, ["repo", "path"])
    assert (h1 == h2).all()
    out = add_partition_column(ev, 16)
    pids = out["_pid"].to_numpy(zero_copy_only=False)
    assert pids.min() >= 0 and pids.max() < 16
    # same key -> same pid
    import pandas as pd

    df = out.to_pandas()
    assert (df.groupby(["repo", "path"])["_pid"].nunique() == 1).all()


def test_salted_partitioning_spreads_hot_key_and_preserves_cold():
    ev = _events()
    hot = detect_hot_keys(ev, hot_fraction=0.05)
    assert hot, "zipf fixture should have at least one hot repo"
    out = add_salted_partition_column(ev, 16, hot)
    df = out.to_pandas()
    hot_repo = next(iter(hot))
    assert df[df["repo"] == hot_repo]["_pid"].nunique() > 1
    cold = df[~df["repo"].isin(hot)]
    assert (cold.groupby(["repo", "path"])["_pid"].nunique() == 1).all()


# -- schema evolution -------------------------------------------------------
def test_align_adds_nulls_and_casts():
    target = pa.schema([pa.field("a", pa.int64()), pa.field("b", pa.string())])
    t = pa.table({"b": ["x"], "junk": [1]})
    out = align_to_schema(t, target)
    assert out.schema == target
    assert out["a"][0].as_py() is None


def test_evolve_and_union_by_name():
    s1 = pa.schema([pa.field("a", pa.int64())])
    s2 = pa.schema([pa.field("b", pa.string()), pa.field("a", pa.int64())])
    assert evolve_schema(s1, s2).names == ["a", "b"]
    u = union_by_name([pa.table({"a": [1]}), pa.table({"b": ["x"]})])
    assert u.num_rows == 2 and set(u.column_names) == {"a", "b"}


def test_rename_columns():
    t = pa.table({"language": ["py"], "x": [1]})
    out = rename_columns(t, {"language": "lang"})
    assert out.column_names == ["lang", "x"]


# -- validation -------------------------------------------------------------
def test_validator_taxonomy():
    t = pa.Table.from_pylist(
        [
            {"seq": 1, "op": "insert", "repo": "r", "path": "p", "commit": "c", "lang": "py", "content": "x"},
            {"seq": 2, "op": "insert", "repo": None, "path": "p", "commit": "c", "lang": "py", "content": "x"},
            {"seq": 3, "op": "upsert", "repo": "r", "path": "p", "commit": "c", "lang": "py", "content": "x"},
            {"seq": 4, "op": "update", "repo": "r", "path": "p", "commit": "c", "lang": "py", "content": None},
        ],
        schema=EVENT_SCHEMA,
    )
    out = EventValidator(EVENT_SCHEMA)(t)
    errs = out[ERRORS_COLUMN].to_pylist()
    assert errs[0] == []
    assert errs[1] == ["missing_required: repo"]
    assert errs[2] == ["parse_error"]
    assert errs[3] == ["parse_error"]
    valid, rejects = split_valid(out)
    assert len(valid) == 1 and len(rejects) == 3
    assert ERRORS_COLUMN not in valid.column_names


# -- upsert semantics -------------------------------------------------------
def test_prereduce_keeps_max_seq_per_key():
    ev = _events()
    red = prereduce_batch(ev)
    df = red.to_pandas()
    assert df.groupby(["repo", "path"]).size().max() == 1
    full = ev.to_pandas().groupby(["repo", "path"])["seq"].max()
    got = df.set_index(["repo", "path"])["seq"]
    assert (got.sort_index() == full.sort_index()).all()


def test_merge_idempotent_and_commutative():
    ev = add_content_sha256(_events())
    st = events_to_state(ev, STATE_SCHEMA)
    half = len(st) // 2
    a, b = st.slice(0, half), st.slice(half)
    m1 = merge_states(merge_states(None, a, STATE_SCHEMA), b, STATE_SCHEMA)
    m2 = merge_states(merge_states(None, b, STATE_SCHEMA), a, STATE_SCHEMA)
    assert m1.equals(m2)
    # idempotent: re-applying b changes nothing
    m3 = merge_states(m1, b, STATE_SCHEMA)
    assert m3.equals(m1)


def test_upsert_over_delete_resurrects():
    rows = [
        {"seq": 1, "op": "insert", "repo": "r", "path": "p", "commit": "c1", "lang": "py", "content": "v1"},
        {"seq": 2, "op": "delete", "repo": "r", "path": "p", "commit": "c2", "lang": "py", "content": None},
        {"seq": 3, "op": "update", "repo": "r", "path": "p", "commit": "c3", "lang": "py", "content": "v3"},
    ]
    ev = add_content_sha256(pa.Table.from_pylist(rows, schema=EVENT_SCHEMA))
    st = events_to_state(ev, STATE_SCHEMA)
    # apply delete AFTER the update (out of order): final must still be v3
    out_of_order = merge_states(
        merge_states(None, st.slice(2, 1), STATE_SCHEMA), st.slice(0, 2), STATE_SCHEMA
    )
    live = out_of_order.filter(pa.compute.equal(out_of_order["is_deleted"], False))
    assert live["content"].to_pylist() == ["v3"]


def test_oracle_materialize_drops_final_deletes():
    rows = [
        {"seq": 1, "op": "insert", "repo": "r", "path": "p", "commit": "c1", "lang": "py", "content": "v1"},
        {"seq": 2, "op": "delete", "repo": "r", "path": "p", "commit": "c2", "lang": "py", "content": None},
    ]
    ev = pa.Table.from_pylist(rows, schema=EVENT_SCHEMA)
    assert len(oracle_materialize(ev)) == 0
