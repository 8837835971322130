"""Connector surface: Local (real fs) + Drive (client seam) + factory."""

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
