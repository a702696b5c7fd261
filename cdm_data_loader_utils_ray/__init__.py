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

# Make Ray's read-path import probe THREAD-SAFE.  ray.data's filesystem
# resolution does `from fsspec.implementations.http import HTTPFileSystem`
# per Dataset construction, catching ModuleNotFoundError (aiohttp is
# absent here).  A FAILED module import is never cached — every probe
# re-executes the module — so two driver threads constructing Datasets can
# race the import, and the loser sees a bare ImportError from the
# partially-initialized module, crashing the read (measured — see
# queries.referential_integrity's r4 history; a one-shot warm-up import
# does NOT fix this, precisely because the failure isn't cached).  When
# the real import fails, install a stub module whose HTTPFileSystem is a
# class nothing instantiates: every probe then succeeds deterministically,
# Ray's isinstance check is False (correct — no HTTP fs exists here), and
# any attempt to actually USE it raises the original error.
try:  # pragma: no cover
    from fsspec.implementations.http import HTTPFileSystem as _HTTPFS  # noqa: F401
except ImportError:  # pragma: no cover
    try:
        import sys as _sys
        import types as _types

        import fsspec.implementations as _fsimpl

        class _UnavailableHTTPFileSystem:
            """Stand-in for fsspec's HTTPFileSystem when aiohttp is absent."""

            def __init__(self, *a, **k):
                raise ImportError("HTTPFileSystem unavailable: aiohttp is not installed")

        _m = _types.ModuleType("fsspec.implementations.http")
        _m.HTTPFileSystem = _UnavailableHTTPFileSystem
        _sys.modules["fsspec.implementations.http"] = _m
        _fsimpl.http = _m
    except Exception:
        pass
