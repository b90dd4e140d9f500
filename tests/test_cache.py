"""cached_file download path (fannypack cached_drive_file capability —
reference crossmodal/tasks/_door.py:124-127): file:// fetch, checksum,
atomic rename, Drive-URL rewrite, offline gate."""

import hashlib
import os

import pytest

from multimodalfilter_tpu.data import cache


@pytest.fixture()
def cache_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(cache, "_cache_path", None)
    cache.set_cache_path(str(tmp_path / "cache"))
    return tmp_path


def _make_source(tmp_path, payload=b"hdf5-payload-bytes" * 100):
    src = tmp_path / "source.hdf5"
    src.write_bytes(payload)
    return f"file://{src}", payload


def test_cached_file_downloads_on_miss(cache_dir):
    url, payload = _make_source(cache_dir)
    path = cache.cached_file("door_pull_10.hdf5", url)
    assert open(path, "rb").read() == payload
    # Second call hits the cache (delete the source to prove it).
    os.remove(url[len("file://"):])
    assert cache.cached_file("door_pull_10.hdf5", url) == path


def test_cached_file_checksum_ok_and_mismatch(cache_dir):
    url, payload = _make_source(cache_dir)
    good = hashlib.sha256(payload).hexdigest()
    path = cache.cached_file("a.hdf5", url, sha256=good)
    assert os.path.exists(path)

    with pytest.raises(FileNotFoundError, match="Checksum mismatch"):
        cache.cached_file("b.hdf5", url, sha256="0" * 64)
    # Atomicity: neither the destination nor a temp file survives a failure.
    dest = os.path.join(cache.get_cache_path(), "b.hdf5")
    assert not os.path.exists(dest)
    assert not [f for f in os.listdir(cache.get_cache_path()) if ".tmp." in f]


def test_offline_gate_skips_download(cache_dir, monkeypatch):
    url, _ = _make_source(cache_dir)
    monkeypatch.setenv("MMF_TPU_OFFLINE", "1")
    with pytest.raises(FileNotFoundError, match="not found in cache"):
        cache.cached_file("c.hdf5", url)


def test_synthesize_takes_precedence(cache_dir, monkeypatch):
    """Air-gapped envs with MMF_TPU_SYNTHESIZE_DATA=1 must never touch the
    network (a dead DNS lookup can hang for a minute)."""
    monkeypatch.setenv("MMF_TPU_SYNTHESIZE_DATA", "1")

    def boom(*a, **k):  # pragma: no cover - must not be called
        raise AssertionError("download attempted despite synthesize mode")

    monkeypatch.setattr(cache, "download_file", boom)
    path = cache.cached_file(
        "panda_door_pull_10.hdf5", "https://drive.google.com/file/d/xyz"
    )
    assert os.path.exists(path)


def test_drive_url_rewrite():
    direct = cache.drive_direct_url(
        "https://drive.google.com/file/d/1abc-DEF_123/view?usp=sharing"
    )
    assert direct == (
        "https://drive.google.com/uc?export=download&id=1abc-DEF_123"
    )
    assert cache.drive_direct_url(
        "https://drive.google.com/open?id=XYZ_9"
    ).endswith("id=XYZ_9")
    assert cache.drive_direct_url("https://example.com/a.h5") == (
        "https://example.com/a.h5"
    )
