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
- MemoryStore: dict-backed — unit-test stand-in that also documents the
  object-store mapping (an S3-style backend implements ``write_atomic``
  with a conditional put / put-then-pointer-swap; CURRENT is the single
  small object readers race on, same as the reference's offset file).
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
