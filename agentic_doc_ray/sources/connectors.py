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
mirrors the GoogleDrive surface (folder_id scoping, name pattern, OAuth
token-cache/refresh/flow, chunked media download —
``connectors.py:221-352``) behind injectable seams: this sandbox has no
network/OAuth libraries, so the *transport* objects are injected (a fake
in tests, the real google-api client in a networked deployment) while the
listing / auth-state / chunk-loop / failure logic here is real and tested.
``S3Connector`` mirrors the boto3 surface (``connectors.py:355-451``:
list_objects_v2 + extension filter + fnmatch, head_object info) — with
continuation-token pagination, which the reference omits (it silently
truncates at S3's 1000-key page). At 100 TB prefer the Arrow-FS scheme-URI
path (``files.read_binary_corpus("s3://…")``): listing then happens inside
Ray's read tasks, not on the driver.
"""

from __future__ import annotations

import fnmatch
import io
import os
import tempfile
from dataclasses import dataclass, field

import pyarrow as pa

import ray.data

from agentic_doc_ray.sources.files import _to_corpus_rows

# Extension filter parity (ref connectors.py:72-111: the PIL-decodable
# image set + pdf) plus the text/html kinds this engine's sniffer accepts.
SUPPORTED_EXTENSIONS = (
    ".pdf",
    ".png",
    ".jpg",
    ".jpeg",
    ".jpe",
    ".gif",
    ".bmp",
    ".dib",
    ".tif",
    ".tiff",
    ".webp",
    ".ico",
    ".icns",
    ".pbm",
    ".pgm",
    ".ppm",
    ".pnm",
    ".tga",
    ".targa",
    ".jp2",
    ".j2k",
    ".heif",
    ".heic",
    ".txt",
    ".html",
)


# Config objects (ref connectors.py:29-66). The reference's aws_*/
# client_secret credential fields configure the transport libraries
# (boto3 / google-auth), which are the injected seams here — so the
# configs carry only the fields this engine's connectors consume.
@dataclass
class LocalConnectorConfig:
    connector_type: str = "local"
    recursive: bool = True


@dataclass
class GoogleDriveConnectorConfig:
    connector_type: str = "google_drive"
    client_secret_file: str | None = None
    folder_id: str | None = None


@dataclass
class S3ConnectorConfig:
    connector_type: str = "s3"
    bucket_name: str = ""
    region_name: str = "us-east-1"


@dataclass
class URLConnectorConfig:
    connector_type: str = "url"
    headers: dict | None = None
    timeout: int = 30


class LocalConnector:
    """Directory listing + read (ref connectors.py:167-218).

    Reference semantics: a path that IS a file lists as itself; with a
    ``pattern`` the glob replaces the extension filter; non-recursive mode
    stays in the top directory (ref default is non-recursive — this engine
    keeps recursive=True as its historical default, configurable)."""

    def __init__(self, recursive: bool = True):
        self.recursive = recursive

    def list_files(self, path: str, pattern: str | None = None) -> list[str]:
        if not os.path.exists(path):
            raise FileNotFoundError(f"Path does not exist: {path}")
        if os.path.isfile(path):
            return [path]
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
        if pattern:
            # pattern REPLACES the extension filter (ref connectors.py:186-189
            # passes the pattern straight to glob/rglob)
            out = [p for p in out if fnmatch.fnmatch(os.path.basename(p), pattern)]
        else:
            out = [
                p
                for p in out
                if os.path.splitext(p)[1].lower() in SUPPORTED_EXTENSIONS
            ]
        return sorted(out)

    def fetch(self, file_id: str) -> bytes:
        with open(file_id, "rb") as fh:
            return fh.read()

    def download_file(self, file_id: str, local_path: str | None = None) -> str:
        """For local files, return the path if it exists (ref :198-204)."""
        if not os.path.exists(file_id):
            raise FileNotFoundError(f"File not found: {file_id}")
        return file_id

    def get_file_info(self, file_id: str) -> dict:
        """Local file metadata (ref connectors.py:205-218)."""
        if not os.path.exists(file_id):
            raise FileNotFoundError(f"File not found: {file_id}")
        st = os.stat(file_id)
        return {
            "name": os.path.basename(file_id),
            "path": file_id,
            "size": st.st_size,
            "modified": st.st_mtime,
            "suffix": os.path.splitext(file_id)[1],
        }


# ---------------------------------------------------------------------------
# Google Drive
# ---------------------------------------------------------------------------
@dataclass
class SimpleCredentials:
    """Minimal stand-in for google.oauth2 Credentials: the three fields the
    reference's auth flow branches on (connectors.py:239-247) plus an
    opaque token payload."""

    token: str = ""
    valid: bool = True
    expired: bool = False
    refresh_token: str | None = None

    def to_json(self) -> str:
        import json

        return json.dumps(
            {
                "token": self.token,
                "valid": self.valid,
                "expired": self.expired,
                "refresh_token": self.refresh_token,
            }
        )

    @classmethod
    def from_json(cls, text: str) -> "SimpleCredentials":
        import json

        return cls(**json.loads(text))


class FileTokenStore:
    """The reference's ``token.json`` cache (connectors.py:235-256): load
    stored credentials if present, persist refreshed/new ones."""

    def __init__(self, path: str = "token.json"):
        self.path = path

    def load(self) -> SimpleCredentials | None:
        if not os.path.exists(self.path):
            return None
        with open(self.path) as fh:
            return SimpleCredentials.from_json(fh.read())

    def save(self, creds) -> None:
        with open(self.path, "w") as fh:
            fh.write(creds.to_json())


class ChunkedDownload:
    """The reference's MediaIoBaseDownload loop (connectors.py:315-321):
    pull fixed-size chunks from a media request into a file handle until
    done. The request object only needs a file-like ``read(n)``."""

    def __init__(self, fh, request, chunk_size: int = 1024 * 1024):
        self._fh = fh
        self._request = request
        self._chunk_size = chunk_size
        self._done = False
        self.bytes_downloaded = 0

    def next_chunk(self) -> tuple[int, bool]:
        buf = self._request.read(self._chunk_size)
        if buf:
            self._fh.write(buf)
            self.bytes_downloaded += len(buf)
        if not buf or len(buf) < self._chunk_size:
            self._done = True
        return self.bytes_downloaded, self._done


def _drive_query(folder_id: str | None, path: str | None) -> str:
    """Build the Drive files().list query exactly as the reference does
    (connectors.py:266-279): optional parent scope + pdf/image mime gate."""
    parts = []
    if folder_id:
        parts.append(f"'{folder_id}' in parents")
    elif path:
        parts.append(f"'{path}' in parents")
    parts.append("(mimeType='application/pdf' or mimeType contains 'image/')")
    return " and ".join(parts)


@dataclass
class DriveConnector:
    """GoogleDrive surface (ref connectors.py:221-352) behind two seams.

    Lightweight seam (tests / any custom transport): ``client`` with
    ``list(folder_id, pattern) -> list[str]`` and ``fetch(file_id) ->
    bytes``.

    Full parity seam: ``service`` (a google-api ``Resource`` or a fake with
    the same ``files().list/get/get_media`` shape) — or an OAuth bootstrap
    via ``token_store`` / ``flow`` / ``refresher`` / ``service_builder``,
    mirroring the reference's cached-token -> refresh -> installed-app-flow
    ladder (connectors.py:229-257). The real google libraries cannot exist
    in this sandbox; deployments inject them through these four callables.
    """

    folder_id: str | None = None
    client: object = field(default=None)
    service: object = field(default=None)
    client_secret_file: str | None = None
    token_store: object = field(default=None)  # .load()/.save(creds)
    flow: object = field(default=None)  # callable(client_secret_file) -> creds
    refresher: object = field(default=None)  # callable(creds) -> creds
    service_builder: object = field(default=None)  # callable(creds) -> service

    def _client(self):
        if self.client is None:
            raise RuntimeError(
                "DriveConnector needs a client (no network/OAuth in this "
                "environment); provide an object with list(folder_id, "
                "pattern) and fetch(file_id) — or a `service` seam."
            )
        return self.client

    def _get_service(self):
        """Reference auth ladder (connectors.py:229-257): stored token ->
        valid? use : (expired + refresh_token)? refresh : run flow; persist
        the resulting credentials; build the service once."""
        if self.service is not None:
            return self.service
        if self.service_builder is None:
            raise RuntimeError(
                "DriveConnector needs a client (no network/OAuth in this "
                "environment); provide an object with list(folder_id, "
                "pattern) and fetch(file_id), a `service`, or the OAuth "
                "seams (token_store/flow/refresher + service_builder)."
            )
        store = self.token_store or FileTokenStore()
        creds = store.load()
        if not creds or not creds.valid:
            if creds and creds.expired and creds.refresh_token:
                if self.refresher is None:
                    raise RuntimeError(
                        "expired Drive token needs a refresher seam "
                        "(google.auth Request in a networked deployment)"
                    )
                creds = self.refresher(creds)
            else:
                if not self.client_secret_file:
                    raise ValueError("client_secret_file must be provided")
                if self.flow is None:
                    raise RuntimeError(
                        "Drive OAuth needs a flow seam (InstalledAppFlow in "
                        "a networked deployment)"
                    )
                creds = self.flow(self.client_secret_file)
            store.save(creds)
        if self.service_builder is None:
            raise RuntimeError(
                "Drive access needs a service_builder seam "
                "(googleapiclient.discovery.build in a networked deployment)"
            )
        self.service = self.service_builder(creds)
        return self.service

    def list_files(
        self, path: str | None = None, pattern: str | None = None
    ) -> list[str]:
        if self.client is not None:
            return list(self.client.list(self.folder_id or path, pattern))
        service = self._get_service()
        query = _drive_query(self.folder_id, path)
        results = (
            service.files()
            .list(q=query, fields="files(id, name, mimeType, size)")
            .execute()
        )
        files = results.get("files", [])
        if pattern:
            files = [f for f in files if fnmatch.fnmatch(f["name"], pattern)]
        return [f["id"] for f in files]

    def fetch(self, file_id: str) -> bytes:
        if self.client is not None:
            return self.client.fetch(file_id)
        service = self._get_service()
        request = service.files().get_media(fileId=file_id)
        buf = io.BytesIO()
        downloader = ChunkedDownload(buf, request)
        done = False
        while not done:
            _, done = downloader.next_chunk()
        return buf.getvalue()

    def download_file(self, file_id: str, local_path: str | None = None) -> str:
        """Chunked download to disk (ref connectors.py:297-327): metadata
        fetch for the name, temp dir when no path given, MediaIoBaseDownload
        chunk loop."""
        service = self._get_service()
        meta = service.files().get(fileId=file_id).execute()
        if local_path is None:
            local_path = os.path.join(tempfile.mkdtemp(), meta["name"])
        else:
            os.makedirs(os.path.dirname(local_path) or ".", exist_ok=True)
        request = service.files().get_media(fileId=file_id)
        with open(local_path, "wb") as fh:
            downloader = ChunkedDownload(fh, request)
            done = False
            while not done:
                _, done = downloader.next_chunk()
        return local_path

    def get_file_info(self, file_id: str) -> dict:
        """Drive file metadata (ref connectors.py:329-352)."""
        service = self._get_service()
        meta = (
            service.files()
            .get(
                fileId=file_id,
                fields="id, name, mimeType, size, createdTime, modifiedTime",
            )
            .execute()
        )
        return {
            "id": meta["id"],
            "name": meta["name"],
            "mimeType": meta["mimeType"],
            "size": int(meta.get("size", 0)),
            "created": meta.get("createdTime"),
            "modified": meta.get("modifiedTime"),
        }


# Reference-named alias (connectors.py:221).
GoogleDriveConnector = DriveConnector


# ---------------------------------------------------------------------------
# S3
# ---------------------------------------------------------------------------
@dataclass
class S3Connector:
    """boto3-shaped S3 surface (ref connectors.py:355-451) behind a client
    seam: any object speaking the ``list_objects_v2`` / ``get_object`` /
    ``head_object`` / ``download_file`` subset (a real boto3 client in
    production, a fake in tests — no network in this sandbox).

    Listing paginates with ContinuationToken — the reference reads only the
    first ``list_objects_v2`` page and silently misses keys past 1000; at
    crawl scale that is a correctness bug, so this engine drains the
    listing. For payload reads at 100 TB prefer the Arrow-FS path
    (``read_binary_corpus("s3://bucket/…")``) where listing and reads both
    happen inside Ray tasks; this connector's driver-side listing is for
    reference-parity workflows (the ids are small; payloads still fan out
    through ``read_connector_corpus``'s map_batches)."""

    bucket_name: str = ""
    client: object = field(default=None)
    region_name: str = "us-east-1"

    def _client(self):
        if self.client is None:
            raise RuntimeError(
                "S3Connector needs a client (no boto3/network in this "
                "environment); provide an object with list_objects_v2, "
                "get_object and head_object — or use "
                "read_binary_corpus('s3://…') for the Arrow-FS path."
            )
        return self.client

    def list_files(
        self, path: str | None = None, pattern: str | None = None
    ) -> list[str]:
        """Prefix listing + extension filter + fnmatch on the full key
        (ref connectors.py:380-409), drained across continuation pages."""
        client = self._client()
        files: list[str] = []
        kwargs: dict = {"Bucket": self.bucket_name}
        if path:
            kwargs["Prefix"] = path
        while True:
            resp = client.list_objects_v2(**kwargs)
            for obj in resp.get("Contents", []):
                key = obj["Key"]
                if not key.lower().endswith(SUPPORTED_EXTENSIONS):
                    continue
                if pattern and not fnmatch.fnmatch(key, pattern):
                    continue
                files.append(key)
            token = resp.get("NextContinuationToken")
            if not resp.get("IsTruncated") or not token:
                return files
            kwargs["ContinuationToken"] = token

    def fetch(self, file_id: str) -> bytes:
        resp = self._client().get_object(Bucket=self.bucket_name, Key=file_id)
        return resp["Body"].read()

    def download_file(self, file_id: str, local_path: str | None = None) -> str:
        """Download to disk (ref connectors.py:411-433)."""
        client = self._client()
        if local_path is None:
            local_path = os.path.join(
                tempfile.mkdtemp(), os.path.basename(file_id)
            )
        else:
            os.makedirs(os.path.dirname(local_path) or ".", exist_ok=True)
        if hasattr(client, "download_file"):
            client.download_file(self.bucket_name, file_id, local_path)
        else:
            with open(local_path, "wb") as fh:
                fh.write(self.fetch(file_id))
        return local_path

    def get_file_info(self, file_id: str) -> dict:
        """head_object metadata (ref connectors.py:435-451)."""
        resp = self._client().head_object(Bucket=self.bucket_name, Key=file_id)
        return {
            "key": file_id,
            "size": resp["ContentLength"],
            "last_modified": resp["LastModified"],
            "etag": resp["ETag"],
            "content_type": resp.get("ContentType"),
        }


# ---------------------------------------------------------------------------
# URL
# ---------------------------------------------------------------------------
@dataclass
class URLConnector:
    """HTTP(S) surface (ref connectors.py:454-517): list_files returns the
    given URL as the single id; fetch goes through the injectable fetcher
    seam (``files.default_fetcher`` in a networked deployment)."""

    fetcher: object = field(default=None)
    headers: dict | None = None
    timeout: int = 30

    def list_files(
        self, path: str | None = None, pattern: str | None = None
    ) -> list[str]:
        return [path] if path else []

    def fetch(self, file_id: str) -> bytes:
        from agentic_doc_ray.sources.files import default_fetcher, is_valid_httpurl

        if not is_valid_httpurl(file_id):
            raise ValueError(f"Invalid URL: {file_id}")
        return (self.fetcher or default_fetcher)(file_id)

    def download_file(self, file_id: str, local_path: str | None = None) -> str:
        if local_path is None:
            name = os.path.basename(file_id.rstrip("/")) or "downloaded_file"
            local_path = os.path.join(tempfile.mkdtemp(), name)
        else:
            os.makedirs(os.path.dirname(local_path) or ".", exist_ok=True)
        with open(local_path, "wb") as fh:
            fh.write(self.fetch(file_id))
        return local_path

    def get_file_info(self, file_id: str) -> dict:
        return {"url": file_id}


def create_connector(kind, **kwargs):
    """Connector factory (ref connectors.py:520-533). Accepts the kind
    string (this engine's historical API) or a config object carrying a
    ``connector_type`` attribute (the reference's shape)."""
    if not isinstance(kind, str):
        cfg = kind
        kind = getattr(cfg, "connector_type")
        kwargs = {
            k: v
            for k, v in vars(cfg).items()
            if k != "connector_type" and v is not None
        } | kwargs
    if kind == "local":
        return LocalConnector(**kwargs)
    if kind == "google_drive":
        return DriveConnector(**kwargs)
    if kind == "s3":
        return S3Connector(**kwargs)
    if kind == "url":
        return URLConnector(**kwargs)
    raise ValueError(f"Unknown connector type: {kind}")


def read_connector_corpus(
    connector,
    path: str | None = None,
    pattern: str | None = None,
    config=None,
) -> "ray.data.Dataset":
    """List on the driver, download + sniff + corpus-convert in tasks.

    A fetch that raises ``RetryableError`` gets the reference's retry
    ladder (exponential-jitter wait, ``max_retries`` attempts, per-attempt
    ``retry_logging_style`` logging — parse.py:743-750); exhausted or
    non-retryable failures are dropped with a log (ref parse.py:166-190).
    An empty listing yields an empty corpus, not an error."""
    import logging

    from agentic_doc_ray.config import DEFAULT_CONFIG
    from agentic_doc_ray.retry import call_with_retries
    from agentic_doc_ray.schema import CORPUS_SCHEMA

    cfg = config or DEFAULT_CONFIG
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
                blobs.append(
                    call_with_retries(
                        connector.fetch,
                        fid,
                        max_retries=cfg.max_retries,
                        max_retry_wait_time=cfg.max_retry_wait_time,
                        retry_logging_style=cfg.retry_logging_style,
                    )
                )
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
