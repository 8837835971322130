"""Connector surface: Local (real fs) + Drive (client seam) + factory."""

import io

import pytest
import ray.data

from agentic_doc_ray.sources.connectors import (
    DriveConnector,
    LocalConnector,
    create_connector,
    read_connector_corpus,
)


def test_local_connector_list_and_read(tmp_path):
    (tmp_path / "a.txt").write_text("first block of text content here\n\nsecond one")
    (tmp_path / "b.pdf").write_bytes(b"%PDF-1.4 x")
    (tmp_path / "skip.xyz").write_bytes(b"ignored extension")
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "c.png").write_bytes(b"\x89PNG\r\n\x1a\n\xff\xfe")

    conn = LocalConnector()
    files = conn.list_files(str(tmp_path))
    names = [f.rsplit("/", 1)[-1] for f in files]
    assert names == ["a.txt", "b.pdf", "c.png"]  # ext-filtered, recursive, sorted
    assert conn.list_files(str(tmp_path), pattern="*.pdf") == [str(tmp_path / "b.pdf")]

    rows = {r["doc_id"]: r for r in read_connector_corpus(conn, str(tmp_path)).take_all()}
    assert rows[str(tmp_path / "a.txt")]["spans"][0]["kind"] == "text"
    assert rows[str(tmp_path / "b.pdf")]["spans"][0]["kind"] == "pdf_page"
    assert rows[str(sub / "c.png")]["spans"][0]["kind"] == "image"


def test_drive_connector_with_fake_client():
    store = {
        "id1": b"drive text document body long enough to keep around",
        "id2": b"%PDF-1.7 drive payload",
    }

    class FakeDrive:
        def list(self, folder_id, pattern):
            assert folder_id == "folder-x"
            return sorted(store) + ["id-missing"]

        def fetch(self, file_id):
            if file_id not in store:
                raise IOError("404")
            return store[file_id]

    conn = DriveConnector(folder_id="folder-x", client=FakeDrive())
    rows = {r["doc_id"]: r for r in read_connector_corpus(conn).take_all()}
    # failed download dropped (ref parse.py:166-190), others ingested
    assert set(rows) == {"id1", "id2"}
    assert rows["id1"]["spans"][0]["kind"] == "text"
    assert rows["id2"]["spans"][0]["kind"] == "pdf_page"


def test_drive_connector_requires_client():
    with pytest.raises(RuntimeError, match="client"):
        DriveConnector().list_files()


def test_factory():
    assert isinstance(create_connector("local"), LocalConnector)
    assert isinstance(create_connector("google_drive"), DriveConnector)
    with pytest.raises(ValueError):
        create_connector("ftp")


def test_empty_listing_yields_empty_corpus(tmp_path):
    ds = read_connector_corpus(LocalConnector(), str(tmp_path))
    assert ds.count() == 0


def test_read_binary_corpus_explicit_filesystem(tmp_path):
    """The S3 connector surface (ref connectors.py:355-451) against an
    object-store stand-in: a SubTreeFileSystem scopes all reads to a
    "bucket" root exactly the way S3FileSystem scopes them to a bucket —
    same explicit-filesystem seam, no network required. The filesystem
    object ships inside each Ray read task, proving the distributed path
    (not just a driver-local read)."""
    from pyarrow import fs as pafs

    from agentic_doc_ray.sources.files import read_binary_corpus

    bucket = tmp_path / "bucket"
    (bucket / "docs").mkdir(parents=True)
    (bucket / "docs" / "a.txt").write_text("object store text payload")
    (bucket / "docs" / "b.pdf").write_bytes(b"%PDF-1.5 payload")

    subfs = pafs.SubTreeFileSystem(str(bucket), pafs.LocalFileSystem())
    ds = read_binary_corpus(["docs/a.txt", "docs/b.pdf"], filesystem=subfs)
    rows = {r["doc_id"].rsplit("/", 1)[-1]: r for r in ds.take_all()}
    assert set(rows) == {"a.txt", "b.pdf"}
    assert rows["a.txt"]["spans"][0]["kind"] == "text"
    assert rows["a.txt"]["spans"][0]["text"] == "object store text payload"
    assert rows["b.pdf"]["spans"][0]["kind"] == "pdf_page"


# ---------------------------------------------------------------------------
# Full-parity seams: Drive OAuth + chunked download, S3 listing/pagination
# ---------------------------------------------------------------------------
class _FakeMediaRequest:
    """File-like media request (what get_media returns, read(n) protocol)."""

    def __init__(self, payload: bytes):
        self._buf = io.BytesIO(payload)
        self.reads = 0

    def read(self, n: int) -> bytes:
        self.reads += 1
        return self._buf.read(n)


class _FakeDriveFiles:
    def __init__(self, files, payloads):
        self._files = files
        self._payloads = payloads
        self.queries = []

    def list(self, q, fields):
        self.queries.append((q, fields))
        files = self._files

        class _Exec:
            def execute(self_inner):
                return {"files": files}

        return _Exec()

    def get(self, fileId, fields=None):
        meta = next(f for f in self._files if f["id"] == fileId)

        class _Exec:
            def execute(self_inner):
                return dict(meta, createdTime="c", modifiedTime="m")

        return _Exec()

    def get_media(self, fileId):
        return _FakeMediaRequest(self._payloads[fileId])


class _FakeDriveService:
    def __init__(self, files, payloads):
        self._files = _FakeDriveFiles(files, payloads)

    def files(self):
        return self._files


def _drive_fixture():
    files = [
        {"id": "idA", "name": "report.pdf", "mimeType": "application/pdf", "size": "9"},
        {"id": "idB", "name": "scan.png", "mimeType": "image/png", "size": "7"},
    ]
    payloads = {"idA": b"%PDF-1.7 " + b"x" * (3 * 1024 * 1024), "idB": b"\x89PNG1234"}
    return files, payloads


def test_drive_oauth_ladder(tmp_path):
    """Cached-valid / expired-refresh / no-token-flow branches
    (ref connectors.py:229-257), with the token persisted each time."""
    from agentic_doc_ray.sources.connectors import (
        FileTokenStore,
        SimpleCredentials,
    )

    files, payloads = _drive_fixture()
    built_with = []

    def builder(creds):
        built_with.append(creds)
        return _FakeDriveService(files, payloads)

    # 1. no stored token -> flow runs, token saved
    store = FileTokenStore(str(tmp_path / "token.json"))
    flow_calls = []

    def flow(secret):
        flow_calls.append(secret)
        return SimpleCredentials(token="fresh", valid=True)

    conn = DriveConnector(
        folder_id="fX",
        client_secret_file="secret.json",
        token_store=store,
        flow=flow,
        service_builder=builder,
    )
    assert conn.list_files() == ["idA", "idB"]
    assert flow_calls == ["secret.json"]
    assert store.load().token == "fresh"
    # query built exactly like the reference (connectors.py:266-279)
    q = conn.service.files().queries[0][0]
    assert q == (
        "'fX' in parents and "
        "(mimeType='application/pdf' or mimeType contains 'image/')"
    )

    # 2. cached valid token -> no flow, no refresh
    conn2 = DriveConnector(
        folder_id="fX", token_store=store, service_builder=builder
    )
    assert conn2.list_files(pattern="*.png") == ["idB"]

    # 3. expired token with refresh_token -> refresher runs, token saved
    store.save(SimpleCredentials(token="old", valid=False, expired=True,
                                 refresh_token="rt"))
    refreshed = []

    def refresher(creds):
        refreshed.append(creds.token)
        return SimpleCredentials(token="renewed", valid=True)

    conn3 = DriveConnector(
        folder_id="fX", token_store=store, refresher=refresher,
        service_builder=builder,
    )
    assert conn3.list_files() == ["idA", "idB"]
    assert refreshed == ["old"] and store.load().token == "renewed"

    # 4. no token, no client_secret_file -> the reference's ValueError
    (tmp_path / "token.json").unlink()
    with pytest.raises(ValueError, match="client_secret_file"):
        DriveConnector(token_store=store, service_builder=builder).list_files()


def test_drive_chunked_download(tmp_path):
    """Multi-chunk media download (ref MediaIoBaseDownload loop,
    connectors.py:315-321): a >1 MiB payload takes several next_chunk
    pulls and round-trips byte-identical; download_file names the file
    from Drive metadata."""
    from agentic_doc_ray.sources.connectors import FileTokenStore, SimpleCredentials

    files, payloads = _drive_fixture()
    store = FileTokenStore(str(tmp_path / "token.json"))
    store.save(SimpleCredentials(token="t", valid=True))
    conn = DriveConnector(
        folder_id="fX",
        token_store=store,
        service_builder=lambda creds: _FakeDriveService(files, payloads),
    )
    assert conn.fetch("idA") == payloads["idA"]  # 3 MiB -> chunked
    req = conn.service.files().get_media("idA")
    n_reads = 0
    while req.read(1024 * 1024):
        n_reads += 1
    assert n_reads >= 3

    out = conn.download_file("idB")
    assert out.endswith("scan.png")
    with open(out, "rb") as fh:
        assert fh.read() == payloads["idB"]

    info = conn.get_file_info("idA")
    assert info == {
        "id": "idA", "name": "report.pdf", "mimeType": "application/pdf",
        "size": 9, "created": "c", "modified": "m",
    }


def test_s3_connector_listing_and_corpus():
    """Prefix + extension filter + fnmatch on the KEY (ref
    connectors.py:380-409) drained across continuation pages, then the
    standard fan-out ingest."""
    from agentic_doc_ray.sources.connectors import S3Connector

    class _FakeS3Client:
        """boto3 subset with 2-key pages (forces ContinuationToken drain)."""

        def __init__(self, objects: dict[str, bytes], page_size: int = 2):
            self.objects = objects
            self.page_size = page_size
            self.pages_served = 0

        def list_objects_v2(self, Bucket, Prefix="", ContinuationToken=None):
            assert Bucket == "test-bucket"
            keys = sorted(k for k in self.objects if k.startswith(Prefix))
            start = int(ContinuationToken or 0)
            page = keys[start : start + self.page_size]
            self.pages_served += 1
            trunc = start + self.page_size < len(keys)
            out = {"Contents": [{"Key": k} for k in page], "IsTruncated": trunc}
            if trunc:
                out["NextContinuationToken"] = str(start + self.page_size)
            return out

        def get_object(self, Bucket, Key):
            return {"Body": io.BytesIO(self.objects[Key])}

        def head_object(self, Bucket, Key):
            return {
                "ContentLength": len(self.objects[Key]),
                "LastModified": "2026-01-01",
                "ETag": '"abc"',
                "ContentType": "application/octet-stream",
            }

    objects = {
        "docs/a.txt": b"s3 text payload body",
        "docs/b.pdf": b"%PDF-1.4 payload",
        "docs/c.png": b"\x89PNG1234",
        "docs/skip.xyz": b"wrong extension",
        "docs/deep/d.txt": b"deeper text",
        "other/e.txt": b"outside prefix",
    }
    client = _FakeS3Client(objects, page_size=2)
    conn = S3Connector(bucket_name="test-bucket", client=client)
    keys = conn.list_files("docs/")
    assert keys == ["docs/a.txt", "docs/b.pdf", "docs/c.png", "docs/deep/d.txt"]
    assert client.pages_served >= 3  # pagination actually drained
    assert conn.list_files("docs/", pattern="*[ad].txt") == [
        "docs/a.txt", "docs/deep/d.txt",
    ]

    rows = {r["doc_id"]: r for r in read_connector_corpus(conn, "docs/").take_all()}
    assert set(rows) == {"docs/a.txt", "docs/b.pdf", "docs/c.png", "docs/deep/d.txt"}
    assert rows["docs/a.txt"]["spans"][0]["kind"] == "text"
    assert rows["docs/b.pdf"]["spans"][0]["kind"] == "pdf_page"

    info = conn.get_file_info("docs/b.pdf")
    assert info["size"] == len(objects["docs/b.pdf"]) and info["key"] == "docs/b.pdf"

    out = conn.download_file("docs/c.png")
    with open(out, "rb") as fh:
        assert fh.read() == objects["docs/c.png"]


def test_s3_connector_requires_client():
    from agentic_doc_ray.sources.connectors import S3Connector

    with pytest.raises(RuntimeError, match="client"):
        S3Connector(bucket_name="b").list_files()


def test_url_connector_and_factory_configs(tmp_path):
    """URLConnector through the fetcher seam + the reference's config-object
    factory shape (connectors.py:520-533)."""
    from agentic_doc_ray.sources.connectors import (
        GoogleDriveConnectorConfig,
        LocalConnectorConfig,
        S3Connector,
        S3ConnectorConfig,
        URLConnector,
        URLConnectorConfig,
    )

    conn = URLConnector(fetcher=lambda u: b"payload for " + u.encode())
    assert conn.list_files("https://x.test/a.txt") == ["https://x.test/a.txt"]
    assert conn.fetch("https://x.test/a.txt") == b"payload for https://x.test/a.txt"
    with pytest.raises(ValueError, match="Invalid URL"):
        conn.fetch("ftp://nope")
    out = conn.download_file("https://x.test/a.txt")
    assert out.endswith("a.txt")

    lc = create_connector(LocalConnectorConfig(recursive=False))
    assert isinstance(lc, LocalConnector) and lc.recursive is False
    dc = create_connector(GoogleDriveConnectorConfig(folder_id="f1"))
    assert isinstance(dc, DriveConnector) and dc.folder_id == "f1"
    sc = create_connector(S3ConnectorConfig(bucket_name="bkt"))
    assert isinstance(sc, S3Connector) and sc.bucket_name == "bkt"
    uc = create_connector(URLConnectorConfig(timeout=5))
    assert isinstance(uc, URLConnector) and uc.timeout == 5


def test_local_connector_file_path_and_info(tmp_path):
    """Reference semantics: a path that IS a file lists as itself
    (connectors.py:183-184); get_file_info returns the stat dict."""
    f = tmp_path / "one.pdf"
    f.write_bytes(b"%PDF-1.4 single")
    conn = LocalConnector()
    assert conn.list_files(str(f)) == [str(f)]
    with pytest.raises(FileNotFoundError):
        conn.list_files(str(tmp_path / "nope"))
    info = conn.get_file_info(str(f))
    assert info["name"] == "one.pdf" and info["size"] == 15
    assert info["suffix"] == ".pdf"
    assert conn.download_file(str(f)) == str(f)
    with pytest.raises(FileNotFoundError):
        conn.get_file_info(str(tmp_path / "nope"))
