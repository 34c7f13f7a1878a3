"""Put-if-absent locking primitives behind the commit protocol.

The optimistic-concurrency machinery in ``catalog.py`` (per-seq writer
reservations in ``<table>/_commits/``, the sibling maintenance marker,
crash-reap by owner liveness) needs exactly four storage operations,
all of which exist on every real object store — this seam is where a
cloud backend slots in without touching the protocol:

===================  =======================  ==========================
operation            local fs (default)       object-store mapping
===================  =======================  ==========================
put_if_absent        ``os.open(O_CREAT |      S3: conditional PUT with
                     O_EXCL)``                ``If-None-Match: *``
                                              (strongly consistent since
                                              2024); GCS: ``
                                              x-goog-if-generation-match:
                                              0``; Azure:
                                              ``If-None-Match: *``;
                                              or a DynamoDB
                                              ``attribute_not_exists``
                                              conditional put (the
                                              pre-conditional-PUT S3
                                              commit service pattern,
                                              e.g. Delta's S3 LogStore)
delete               ``os.unlink``            DELETE object
read                 ``open().read()``        GET object
stat_mtime           ``os.stat().st_mtime``   HEAD → Last-Modified
===================  =======================  ==========================

The protocol additionally lists a directory's entries (``os.listdir``
on ``_commits/``), which maps to LIST with the dir prefix — exposed
here as ``list_names`` for completeness.

Liveness note: the default owner-liveness check (``os.kill(pid, 0)``)
is same-host by nature.  An object-store deployment replaces it with a
heartbeat — the owner re-PUTs (or touches metadata on) its marker
periodically and ``stat_mtime`` staleness alone reaps — by overriding
``owner_alive`` to return ``None`` (unknown), which makes the caller
fall back to pure mtime staleness.
"""

from __future__ import annotations

import os
from typing import List, Optional


class LocalFSLocking:
    """Default backend: POSIX atomic-create on a shared filesystem.

    O_CREAT|O_EXCL is atomic on local filesystems and NFSv3+ — the
    put-if-absent primitive the whole commit protocol reduces to.
    """

    def put_if_absent(self, path: str, data: bytes = b"") -> bool:
        """Atomically create ``path`` with ``data``; False if it already
        exists.  Other OSErrors (e.g. the parent directory vanishing
        mid-dir-swap) propagate — callers handle them as protocol
        events, not as contention."""
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        try:
            if data:
                os.write(fd, data)
        finally:
            os.close(fd)
        return True

    def delete(self, path: str) -> bool:
        """Remove ``path``; False if it was already gone."""
        try:
            os.unlink(path)
            return True
        except OSError:
            return False

    def read(self, path: str) -> Optional[bytes]:
        try:
            with open(path, "rb") as fh:
                return fh.read()
        except OSError:
            return None

    def stat_mtime(self, path: str) -> Optional[float]:
        try:
            return os.stat(path).st_mtime
        except OSError:
            return None

    def list_names(self, directory: str) -> List[str]:
        try:
            return os.listdir(directory)
        except OSError:
            return []

    def owner_alive(self, pid: int) -> Optional[bool]:
        """True/False when liveness is decidable on this host; None
        means unknown (object-store backends return None and rely on
        heartbeat mtimes instead)."""
        try:
            os.kill(pid, 0)
            return True
        except ProcessLookupError:
            return False
        except PermissionError:
            return True  # exists, owned by someone else
        except OSError:
            return None
