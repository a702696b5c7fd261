"""cdm_data_loader_utils_ray — a from-scratch, Ray-Data-native CDC / incremental
ingest engine with the query and data-processing capabilities of
kbase/cdm-data-loader-utils.

Design (see SURVEY.md §7):

    event log (Parquet)  →  map_batches (pyarrow): validate + annotate errors,
    sha256(content), schema-align  →  salted hash-partition on (repo, path)  →
    per-partition last-writer-wins upsert/merge  →  two-phase-commit Parquet
    lake sink (per-partition delta files + atomic manifest log + per-partition
    high-water marks + lineage/metrics).

Nothing here calls ``ray.init()`` / ``ray.shutdown()`` — sessions are owned by
the caller (driver, bench.py, test fixture).
"""

__version__ = "0.1.0"

# Keep Arrow's jemalloc from returning freed pages to the OS.  On
# lazily-backed VMs (overcommitted / snapshot-restored hosts) re-faulting
# returned pages is dramatically slower than reusing resident ones; with
# decay enabled, every data-heavy task pays first-touch page faults for the
# bytes the previous task just freed (measured 3-12x CPU inflation in Ray
# workers).  This runs in every process that imports the package — driver
# AND Ray workers (they import it when deserializing tasks).
try:  # pragma: no cover
    import pyarrow as _pa

    _pa.jemalloc_set_decay_ms(-1)
except Exception:
    pass
