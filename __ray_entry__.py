"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
# Ray workers do not inherit the driver's sys.path — make the package
# importable in worker processes too (no-op if already set).
os.environ.setdefault("PYTHONPATH", _REPO)


def _register_package_by_value() -> None:
    """The driver calls ``ray.init`` BEFORE importing this module, so its
    worker processes were configured without our PYTHONPATH and cannot
    import the package when deserializing tasks.  Register every package
    module with cloudpickle's serialize-by-value so task payloads carry the
    code itself — no worker-side import needed."""
    try:
        import importlib
        import pkgutil

        from ray import cloudpickle as cp

        import cdm_data_loader_utils_ray as pkg

        for info in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
            try:
                importlib.import_module(info.name)
            except ImportError:
                pass
        for name, module in list(sys.modules.items()):
            if name.startswith("cdm_data_loader_utils_ray") and module is not None:
                try:
                    cp.register_pickle_by_value(module)
                except Exception:
                    pass
    except Exception:
        pass  # outside Ray (plain imports) nothing to do


_register_package_by_value()

SF0001 = "/root/testdata/sf0.001"


def _derive_cdc_events(sf_dir: str, out_path: str) -> str:
    """Map the testdata ``events`` stream onto the CDC event schema
    (key=(repo,path) from user_id, seq=event_id, 'error' => delete)."""
    import hashlib

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cdm_data_loader_utils_ray.core.schemas import EVENT_SCHEMA

    df = pq.read_table(os.path.join(sf_dir, "events.parquet")).to_pandas()
    out = pd.DataFrame(
        {
            "seq": df["event_id"].astype("int64") + 1,
            "op": df["event_type"].map(lambda t: "delete" if t == "error" else "update"),
            "repo": "org0/stream",
            "path": "users/user-" + df["user_id"].astype(str) + ".json",
            "commit": [
                hashlib.sha1(f"{e}|{u}".encode()).hexdigest()
                for e, u in zip(df["event_id"], df["user_id"])
            ],
            "lang": "json",
            "content": df["props"].where(df["event_type"] != "error", None),
        }
    )
    pq.write_table(pa.Table.from_pandas(out, schema=EVENT_SCHEMA, preserve_index=False), out_path)
    return out_path


def entry() -> Any:
    """Flagship: full CDC replay through the lake engine (validate ->
    sha256 -> hash-partition -> LWW upsert -> manifest commit) on events
    derived from sf0.001, returning the committed final state."""
    from cdm_data_loader_utils_ray.pipelines.cdc import read_final_state_arrow, run_replay
    from cdm_data_loader_utils_ray.sinks.lake import LakeTable

    work = tempfile.mkdtemp(prefix="cdm_ray_entry_")
    ev = _derive_cdc_events(SF0001, os.path.join(work, "events.parquet"))
    run_replay(ev, os.path.join(work, "lake"), num_partitions=8)
    state = read_final_state_arrow(LakeTable(os.path.join(work, "lake")))
    return state.to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    from cdm_data_loader_utils_ray.queries import registry

    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sql() -> dict[str, str]:
    from cdm_data_loader_utils_ray.queries import registry

    return {name: sql for name, (_fn, sql) in registry().items() if sql is not None}
