"""Connector surface (reference parity: ``connectors.py``).

The reference's ``BaseConnector`` ABC (list_files / download_file /
get_file_info, ``/root/reference/agentic_doc/connectors.py:114-164``) maps
onto a two-phase Ray ingest:

  1. ``list_files`` runs on the DRIVER — it returns file IDS (small
     metadata, never payloads);
  2. downloads fan out inside ``map_batches`` tasks and stream straight
     into the corpus schema — no temp-file staging, per-file failure drops
     the row with a log (ref parse.py:166-190 semantics).

``LocalConnector`` is fully functional (filesystem). ``DriveConnector``
mirrors the GoogleDrive surface (folder_id scoping, name pattern,
``connectors.py:221-352``) behind an injectable client seam — this sandbox
has no network/OAuth, so the real client raises and tests inject a fake;
the listing/fan-out/failure plumbing is real and tested either way.
"""

from __future__ import annotations

import fnmatch
import os
from dataclasses import dataclass, field

import pyarrow as pa

import ray.data

from agentic_doc_ray.sources.files import _to_corpus_rows

# Extension filter parity (ref connectors.py:72-111: pdf + image exts).
SUPPORTED_EXTENSIONS = (
    ".pdf",
    ".png",
    ".jpg",
    ".jpeg",
    ".gif",
    ".bmp",
    ".tiff",
    ".webp",
    ".txt",
    ".html",
)


class LocalConnector:
    """Directory listing + read (ref connectors.py:167-218)."""

    def __init__(self, recursive: bool = True):
        self.recursive = recursive

    def list_files(self, path: str, pattern: str | None = None) -> list[str]:
        out = []
        if self.recursive:
            for root, _, files in os.walk(path):
                out.extend(os.path.join(root, f) for f in files)
        else:
            out = [
                os.path.join(path, f)
                for f in os.listdir(path)
                if os.path.isfile(os.path.join(path, f))
            ]
        out = [
            p for p in out if os.path.splitext(p)[1].lower() in SUPPORTED_EXTENSIONS
        ]
        if pattern:
            out = [p for p in out if fnmatch.fnmatch(os.path.basename(p), pattern)]
        return sorted(out)

    def fetch(self, file_id: str) -> bytes:
        with open(file_id, "rb") as fh:
            return fh.read()


@dataclass
class DriveConnector:
    """GoogleDrive surface (ref connectors.py:221-352) behind a client
    seam: ``client.list(folder_id, pattern) -> list[str]`` and
    ``client.fetch(file_id) -> bytes``. The real OAuth client cannot exist
    in this sandbox; pass a fake in tests, or any object with the same two
    methods in a networked deployment."""

    folder_id: str | None = None
    client: object = field(default=None)

    def _client(self):
        if self.client is None:
            raise RuntimeError(
                "DriveConnector needs a client (no network/OAuth in this "
                "environment); provide an object with list(folder_id, "
                "pattern) and fetch(file_id)."
            )
        return self.client

    def list_files(self, path: str | None = None, pattern: str | None = None) -> list[str]:
        return list(self._client().list(self.folder_id or path, pattern))

    def fetch(self, file_id: str) -> bytes:
        return self._client().fetch(file_id)


def create_connector(kind: str, **kwargs):
    """Connector factory (ref connectors.py:520-533)."""
    if kind == "local":
        return LocalConnector(**kwargs)
    if kind == "google_drive":
        return DriveConnector(**kwargs)
    raise ValueError(f"Unknown connector type: {kind}")


def read_connector_corpus(
    connector,
    path: str | None = None,
    pattern: str | None = None,
) -> "ray.data.Dataset":
    """List on the driver, download + sniff + corpus-convert in tasks.

    Failed downloads are dropped with a log (ref parse.py:166-190); an
    empty listing yields an empty corpus, not an error."""
    import logging

    from agentic_doc_ray.schema import CORPUS_SCHEMA

    file_ids = connector.list_files(path, pattern)
    if not file_ids:
        return ray.data.from_arrow(CORPUS_SCHEMA.empty_table())
    log = logging.getLogger(__name__)
    ds = ray.data.from_items([{"file_id": f} for f in file_ids])

    def fetch(batch: pa.Table) -> pa.Table:
        paths: list[str] = []
        blobs: list[bytes] = []
        for fid in batch.column("file_id").to_pylist():
            try:
                blobs.append(connector.fetch(fid))
                paths.append(fid)
            except Exception as exc:
                log.error("Failed to download file %s: %s", fid, exc)
        return _to_corpus_rows(
            pa.Table.from_pydict(
                {"path": paths, "bytes": blobs},
                schema=pa.schema([("path", pa.string()), ("bytes", pa.binary())]),
            )
        )

    return ds.map_batches(fetch, batch_format="pyarrow")
