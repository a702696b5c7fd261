"""Exact set-similarity join (prefix filtering): brute-force pinning on a
LARGE-vocabulary corpus (where the prefix filter actually prunes — the sf
test corpus's 31-token vocabulary degenerates to all-pairs) plus planted
near-duplicates."""

import numpy as np
import pandas as pd
import ray.data as rd

from cdm_data_loader_utils_ray.functions.ssjoin import ssjoin_jaccard


def _brute(df, t100):
    toks = {
        r.doc_id: set(str(r.text).lower().split())
        for r in df.itertuples(index=False)
    }
    out = []
    ids = sorted(toks)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(toks[a] & toks[b])
            uni = len(toks[a] | toks[b])
            if uni and 100 * inter >= t100 * uni:
                out.append((a, b, inter, uni))
    return sorted(out)


def _mk_corpus(seed=11, n_docs=120, vocab=3000):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]
    docs = []
    for i in range(n_docs):
        k = rng.integers(15, 40)
        docs.append(" ".join(rng.choice(words, size=k, replace=False)))
    # planted near-dups: copy with one token changed / dropped
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(docs)]
    for j in range(8):
        base = docs[j].split()
        base[0] = "w_changed"
        rows.append({"doc_id": 1000 + j, "text": " ".join(base)})
        rows.append({"doc_id": 2000 + j, "text": " ".join(docs[j].split()[1:])})
    return pd.DataFrame(rows)


def test_matches_brute_force_with_planted_dups():
    df = _mk_corpus()
    for t100 in (90, 70):
        got = ssjoin_jaccard(
            rd.from_pandas(df), "doc_id", "text",
            threshold_pct=t100, num_buckets=8,
        )
        got_pairs = sorted(
            (int(a), int(b), int(i), int(u))
            for a, b, i, u in got[["id_a", "id_b", "inter", "uni"]].itertuples(
                index=False
            )
        )
        exp = _brute(df, t100)
        assert got_pairs == exp
        assert len(exp) >= 16  # the planted near-dups are all found


def test_empty_and_tiny_docs():
    df = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": ["", None, "only one", "only one"]}
    )
    got = ssjoin_jaccard(rd.from_pandas(df), "doc_id", "text", threshold_pct=90)
    assert [tuple(r) for r in got[["id_a", "id_b"]].itertuples(index=False)] == [
        (3, 4)
    ]
    assert got["jaccard"].iloc[0] == 1.0
