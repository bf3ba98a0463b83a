"""ManifestStore — the OffsetWriter-style storage protocol.

The reference abstracts offset persistence behind the ``OffsetWriter``
interface (CAS/OffsetWriter.java:11-41) with a file-backed default
(FileOffsetWriter). This engine's analog is the manifest control plane:
tiny JSON documents (versions + a CURRENT pointer) that must publish
atomically. Lake DATA files are plain parquet wherever Ray can read them;
only this small control plane needs the protocol, so it can live on an
object store on a real cluster.

Implementations:
- LocalFsStore (default): write-temp + fsync + atomic rename.
- MemoryStore: dict-backed — single-process unit-test stand-in.
- ObjectStoreStore: the S3-style backend — immutable version docs via
  if-none-match conditional puts, CURRENT pointer via etag compare-and-
  swap; a racing second writer is REJECTED (ConcurrentCommitError), and
  a landed-but-response-lost put is absorbed by content read-back.
  Tested against FakeObjectStore's fault injection
  (tests/test_objectstore.py).
"""

from __future__ import annotations

import os
import tempfile
from typing import Dict, Optional


class ManifestStore:
    """Minimal key→text document store with atomic publish semantics."""

    def read(self, name: str) -> Optional[str]:
        raise NotImplementedError

    def write_atomic(self, name: str, content: str) -> None:
        raise NotImplementedError

    def exists(self, name: str) -> bool:
        return self.read(name) is not None

    def list(self) -> "list[str]":
        """Document names in the store (object-store: LIST on the manifest
        prefix — small, bounded by retained versions)."""
        raise NotImplementedError

    def delete(self, name: str) -> None:
        raise NotImplementedError


class LocalFsStore(ManifestStore):
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def read(self, name: str) -> Optional[str]:
        path = os.path.join(self.root, name)
        try:
            with open(path) as f:
                return f.read()
        except FileNotFoundError:
            return None

    def write_atomic(self, name: str, content: str) -> None:
        path = os.path.join(self.root, name)
        d = os.path.dirname(path)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(content)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                try:
                    os.remove(tmp)
                except OSError:
                    pass

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self.root, name))

    def list(self) -> "list[str]":
        return [n for n in os.listdir(self.root) if not n.endswith(".tmp")]

    def delete(self, name: str) -> None:
        try:
            os.remove(os.path.join(self.root, name))
        except FileNotFoundError:
            pass


class MemoryStore(ManifestStore):
    """Dict-backed store (tests / object-store stand-in). Writes are
    whole-value swaps — the same atomicity contract an object store's
    put gives."""

    def __init__(self):
        self.docs: Dict[str, str] = {}

    def read(self, name: str) -> Optional[str]:
        return self.docs.get(name)

    def write_atomic(self, name: str, content: str) -> None:
        self.docs[name] = content

    def list(self) -> "list[str]":
        return list(self.docs)

    def delete(self, name: str) -> None:
        self.docs.pop(name, None)


# ---------------------------------------------------------------------------
# Object-store backend (S3-style conditional puts) + fault-injecting fake


class ConcurrentCommitError(RuntimeError):
    """A second writer published first — the caller's manifest is stale.

    The reference takes an exclusive file lock so a second OffsetWriter
    cannot even open the store (CAS/FileOffsetWriter.java:60-76, tested by
    FileOffsetWriterTest's double-writer law). Object stores have no
    locks; the equivalent guarantee is REJECTING the losing writer at the
    conditional put instead of silently last-write-wins. The loser must
    reload CURRENT and replay its epoch on top."""


class PreconditionFailed(Exception):
    """Object-store conditional-put failure (HTTP 412 analog)."""


class FakeObjectStore:
    """In-memory stand-in for an S3-style object store: every object
    carries an etag; writes are whole-object swaps with optional
    preconditions (if-none-match / if-match — S3 conditional writes,
    GCS generation preconditions). Fault injection for chaos tests:

    - ``fail_response_after_puts = n``: the n-th put (1-based, counting
      from now) LANDS but the response is lost (TimeoutError) — the
      client cannot tell success from failure and must retry
      idempotently.
    - ``fail_before_puts = n``: the n-th put raises BEFORE landing
      (clean network failure)."""

    def __init__(self):
        import threading

        self.objects: Dict[str, "tuple[str, str]"] = {}  # name -> (etag, content)
        self._etag_counter = 0
        self.fail_response_after_puts = 0
        self.fail_before_puts = 0
        self.put_count = 0
        # a real object store's conditional put is atomic; the fake must
        # be too (check-then-set under concurrent writers)
        self._lock = threading.Lock()

    def _next_etag(self) -> str:
        self._etag_counter += 1
        return f"e{self._etag_counter}"

    def get(self, name: str):
        """(etag, content) or None."""
        with self._lock:
            return self.objects.get(name)

    def put(self, name: str, content: str,
            if_none_match: bool = False,
            if_match: Optional[str] = None) -> str:
        """Whole-object write; returns the new etag.

        ``if_none_match=True``: fail unless the object does NOT exist.
        ``if_match=etag``: fail unless the current etag matches."""
        with self._lock:
            self.put_count += 1
            if self.fail_before_puts:
                self.fail_before_puts -= 1
                if self.fail_before_puts == 0:
                    raise TimeoutError(
                        f"injected network failure before put({name})"
                    )
            cur = self.objects.get(name)
            if if_none_match and cur is not None:
                raise PreconditionFailed(name)
            if if_match is not None and (cur is None or cur[0] != if_match):
                raise PreconditionFailed(name)
            etag = self._next_etag()
            self.objects[name] = (etag, content)
            if self.fail_response_after_puts:
                self.fail_response_after_puts -= 1
                if self.fail_response_after_puts == 0:
                    raise TimeoutError(
                        f"injected lost response after put({name})"
                    )
            return etag

    def list_prefix(self, prefix: str = "") -> "list[str]":
        with self._lock:
            return [n for n in self.objects if n.startswith(prefix)]

    def delete(self, name: str) -> None:
        with self._lock:
            self.objects.pop(name, None)


class ObjectStoreStore(ManifestStore):
    """ManifestStore over an S3-style object store — the multi-node
    control-plane backend the LocalFs/Memory docstrings promise.

    Protocol (conditional-put-then-pointer-swap):

    - version documents ``v{n}.json`` are IMMUTABLE: written with
      if-none-match. A racing writer trying to publish the same version
      number hits the precondition and gets ConcurrentCommitError — the
      lost update is rejected, never silently overwritten. A RETRY of
      our own write (response lost) finds identical content and treats
      the put as already-landed.
    - the ``CURRENT`` pointer swaps by compare-and-swap against the etag
      this store instance observed at its last read — a stale writer
      (someone else swapped since we loaded) is rejected. On CAS failure
      after a lost response, a read-back that shows exactly our target
      value means our own write landed — success, not conflict.

    All other documents (non-versioned names) write unconditionally —
    they are single-writer by construction (per-lake scratch state).
    """

    #: names treated as immutable version documents
    @staticmethod
    def _is_version_doc(name: str) -> bool:
        return name.startswith("v") and name.endswith(".json")

    def __init__(self, client: FakeObjectStore, prefix: str = ""):
        self.client = client
        self.prefix = prefix
        self._current_etag: Optional[str] = None  # etag seen at last read

    def _key(self, name: str) -> str:
        return f"{self.prefix}{name}"

    def read(self, name: str) -> Optional[str]:
        got = self.client.get(self._key(name))
        if got is None:
            if name == "CURRENT":
                self._current_etag = None
            return None
        etag, content = got
        if name == "CURRENT":
            self._current_etag = etag
        return content

    def write_atomic(self, name: str, content: str) -> None:
        key = self._key(name)
        if self._is_version_doc(name):
            try:
                self.client.put(key, content, if_none_match=True)
            except PreconditionFailed:
                cur = self.client.get(key)
                if cur is not None and cur[1] == content:
                    return  # our own earlier write landed — idempotent retry
                raise ConcurrentCommitError(
                    f"{name} already published by another writer; reload "
                    "CURRENT and replay the epoch"
                )
            except TimeoutError:
                # response lost — verify whether the write landed
                cur = self.client.get(key)
                if cur is not None and cur[1] == content:
                    return
                raise
            return
        if name == "CURRENT":
            expected = self._current_etag
            try:
                if expected is None:
                    etag = self.client.put(key, content, if_none_match=True)
                else:
                    etag = self.client.put(key, content, if_match=expected)
                self._current_etag = etag
            except PreconditionFailed:
                cur = self.client.get(key)
                if cur is not None and cur[1] == content:
                    # pointer already exactly where we want it: either our
                    # lost-response write landed, or another writer published
                    # the same version — impossible, because the version doc
                    # put above would have rejected them first
                    self._current_etag = cur[0]
                    return
                raise ConcurrentCommitError(
                    f"CURRENT moved under us (stale etag {expected}); "
                    "reload and replay"
                )
            except TimeoutError:
                cur = self.client.get(key)
                if cur is not None and cur[1] == content:
                    self._current_etag = cur[0]
                    return
                raise
            return
        # scratch documents: unconditional swap (single-writer names)
        try:
            self.client.put(key, content)
        except TimeoutError:
            cur = self.client.get(key)
            if cur is None or cur[1] != content:
                raise

    def list(self) -> "list[str]":
        n = len(self.prefix)
        return [k[n:] for k in self.client.list_prefix(self.prefix)]

    def delete(self, name: str) -> None:
        self.client.delete(self._key(name))
