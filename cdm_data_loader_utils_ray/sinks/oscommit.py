"""Object-store manifest commit — conditional-put instead of rename.

The POSIX commit path (``sinks/lake.py``) makes ``LATEST`` visible with an
atomic ``os.replace``; object stores (S3/GCS/MinIO) have no rename, so the
100-TB deployment story needs a commit protocol built from the primitives
they DO have (reference parity: the reference ships MinIO helpers,
``utils/minio.py:14-211``; this module is the from-scratch Ray-side
equivalent of its atomic-visibility concern):

* ``put_if_absent(key, data)`` — S3 ``PutObject`` with
  ``If-None-Match: *`` (native since 2024), GCS ``x-goog-if-generation-
  match: 0``, MinIO likewise.  Exactly one concurrent writer wins.
* plain ``put`` — last-writer-wins, used only for the ADVISORY latest
  hint.
* ``list_keys(prefix)`` — one paginated LIST call.

Protocol (Delta-on-S3 analogue, but with the conditional put the commit
point rather than an external DynamoDB lock table):

1. **Stage**: write the manifest JSON to ``staged-{epoch}-{run}.json``
   (plain put — staging keys are write-once per run and invisible to
   readers, which only list ``manifest-*``).
2. **Publish = commit point**: ``put_if_absent`` of
   ``manifest-{epoch:08d}.json``.  Success ⇒ this run owns the epoch.
   Failure ⇒ somebody else committed it first: re-read the winner; the
   same ``run_id`` is an idempotent replay (fine), a different one is a
   concurrent-writer conflict (raise).
3. **Hint** (advisory): plain put of ``LATEST_HINT`` = the epoch.  A crash
   between 2 and 3 loses nothing — readers compute the latest epoch as
   ``max(listed manifest epochs)``; the hint only lets a scale reader
   start its LIST at ``start_after=manifest-{hint}`` instead of paging the
   whole history.

Readers therefore never trust the hint upward or downward: the LISTING of
final manifest objects is the source of truth, and a final object exists
iff its epoch committed.

``DirObjectStore`` maps the protocol onto a local directory
(``O_CREAT|O_EXCL`` = If-None-Match) so the whole path is testable without
network; a real S3 store implements the same three methods with its SDK
and drops in unchanged.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from typing import Protocol

LATEST_HINT = "LATEST_HINT"
_FINAL_RE = re.compile(r"manifest-(\d{8,})\.json")  # {:08d} grows past 1e8 epochs


class ObjectStore(Protocol):
    """The three object-store primitives the commit protocol needs."""

    def put_if_absent(self, key: str, data: bytes) -> bool:
        """Create ``key`` iff it does not exist.  True = created (this
        caller won), False = key already existed.  MUST be atomic — the
        commit point of the whole protocol rides on it."""
        ...

    def put(self, key: str, data: bytes) -> None:
        """Unconditional write (last-writer-wins) — advisory data only."""
        ...

    def get(self, key: str) -> bytes | None:
        """Read a key, or None when absent."""
        ...

    def list_keys(self, prefix: str = "") -> list[str]:
        """All keys starting with ``prefix`` (one LIST call per page on a
        real store; the hint keeps the page count at 1 for readers)."""
        ...

    def delete(self, key: str) -> None:
        """Remove a key (missing key is a no-op)."""
        ...


class DirObjectStore:
    """Local-directory :class:`ObjectStore` — the conditional put is
    ``open(O_CREAT | O_EXCL)``, the POSIX twin of ``If-None-Match: *``.
    Used for tests AND as the bridge implementation when an object-store
    layout is exercised on a shared filesystem."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, key: str) -> str:
        return os.path.join(self.root, key)

    def put_if_absent(self, key: str, data: bytes) -> bool:
        # Write the payload to a temp object first, then link it into the
        # final name with an EXCLUSIVE create — losers see EEXIST.  (A
        # direct O_EXCL open + write would expose a partially-written
        # winner to concurrent readers; real object stores never expose
        # partial objects, so the fake must not either.)
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix=".put-")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(data)
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, self._path(key))  # atomic create-if-absent
            except FileExistsError:
                return False
            dfd = os.open(self.root, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
            return True
        finally:
            os.unlink(tmp)

    def put(self, key: str, data: bytes) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix=".put-")
        with os.fdopen(fd, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._path(key))
        # dir fsync: staged manifests are phase-1 of the txn protocol —
        # the journal may already be the commit point when this entry must
        # survive power loss (review r5: put_if_absent fsynced, put didn't)
        dfd = os.open(self.root, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    def get(self, key: str) -> bytes | None:
        try:
            with open(self._path(key), "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None

    def list_keys(self, prefix: str = "") -> list[str]:
        return sorted(
            k
            for k in os.listdir(self.root)
            if k.startswith(prefix) and not k.startswith(".put-")
        )

    def delete(self, key: str) -> None:
        try:
            os.unlink(self._path(key))
        except FileNotFoundError:
            pass


def final_key(epoch: int) -> str:
    return f"manifest-{epoch:08d}.json"


def staged_key(epoch: int, run_id: str) -> str:
    # run_id sanitized: staging keys are per (epoch, run) write-once
    safe = re.sub(r"[^0-9A-Za-z._-]", "_", run_id)[:80]
    return f"staged-{epoch:08d}-{safe}.json"


class ObjectStoreManifestLog:
    """Manifest log over an :class:`ObjectStore` — same stage/publish/
    latest surface as the POSIX path in ``LakeTable``, different
    commit-point mechanics (see module docstring)."""

    def __init__(self, store: ObjectStore):
        self.store = store

    # -- write side ---------------------------------------------------------
    def stage(self, epoch: int, payload: str, run_id: str) -> None:
        """Phase 1: durable but invisible (readers list ``manifest-*``
        only).  Re-staging the same (epoch, run) overwrites — idempotent."""
        self.store.put(staged_key(epoch, run_id), payload.encode())

    def publish(self, epoch: int, run_id: str) -> bool:
        """Phase 2 = COMMIT POINT: conditional put of the final manifest
        object.  Returns True when this call created it, False when the
        epoch was already committed by the SAME run (idempotent replay /
        txn roll-forward).  Raises on a different run's epoch (concurrent
        writer lost the race) or when nothing was staged."""
        staged = self.store.get(staged_key(epoch, run_id))
        if staged is None:
            existing = self.store.get(final_key(epoch))
            if existing is not None and json.loads(existing).get("run_id") == run_id:
                return False  # committed earlier; staging key already GC'd
            raise ValueError(
                f"publish: epoch {epoch} was never staged by run {run_id!r}"
            )
        if self.store.put_if_absent(final_key(epoch), staged):
            self._bump_hint(epoch)
            self.store.delete(staged_key(epoch, run_id))
            return True
        winner = self.store.get(final_key(epoch))
        if winner is not None and json.loads(winner).get("run_id") == run_id:
            self._bump_hint(epoch)
            self.store.delete(staged_key(epoch, run_id))
            return False  # our own earlier publish (crash-retry) won
        raise ValueError(
            f"commit epoch {epoch} already committed by a different run"
        )

    def _bump_hint(self, epoch: int) -> None:
        # advisory only — last-writer-wins; a concurrent lower-epoch
        # writer regressing the hint is harmless because readers take
        # max(hint floor, listing)
        cur = self.latest_hint()
        if cur is None or epoch > cur:
            self.store.put(LATEST_HINT, str(epoch).encode())

    # -- read side ----------------------------------------------------------
    def latest_hint(self) -> int | None:
        raw = self.store.get(LATEST_HINT)
        try:
            return None if raw is None else int(raw.decode().strip())
        except ValueError:
            return None  # torn/garbage hint: advisory, fall back to listing

    def latest_epoch(self) -> int | None:
        """Highest COMMITTED epoch = max listed final manifest.  The hint
        is only a floor (at scale: ``list(start_after=hint)`` keeps this
        one page); a final object's existence IS the commit."""
        epochs = [
            int(m.group(1))
            for k in self.store.list_keys("manifest-")
            if (m := _FINAL_RE.fullmatch(k))
        ]
        if not epochs:
            return None
        top = max(epochs)
        hint = self.latest_hint()
        # a hint above every listed manifest would mean a lost commit —
        # impossible by protocol order (final put precedes hint put); a
        # listing that lags the hint (eventual consistency) is repaired by
        # trusting the hint as a floor and reading that manifest directly
        if hint is not None and hint > top and self.store.get(final_key(hint)):
            return hint
        return top

    def read(self, epoch: int) -> str:
        raw = self.store.get(final_key(epoch))
        if raw is None:
            raise FileNotFoundError(final_key(epoch))
        return raw.decode()

    def gc_staged(self) -> list[str]:
        """Drop staging keys whose epoch already committed (crash litter —
        a staged key normally deletes at publish)."""
        removed = []
        for k in self.store.list_keys("staged-"):
            m = re.match(r"staged-(\d{8,})-", k)
            if m and self.store.get(final_key(int(m.group(1)))) is not None:
                self.store.delete(k)
                removed.append(k)
        return removed
