"""Dataset file cache with download support.

Capability parity with ``fannypack.data.{set_cache_path, cached_drive_file}``
(reference usage: crossmodal/tasks/_door.py:124-127, scripts/door_task/
train_door.py:32): a missing cache entry is fetched from its URL — plain
http(s)/file:// or a Google Drive share link (the reference's datasets are
Drive-hosted) — streamed to a temp file, optionally checksummed, and moved
into place atomically. When the fetch fails (e.g. this air-gapped
environment) we optionally synthesize the dataset locally instead (see
data/synthetic.py, MMF_TPU_SYNTHESIZE_DATA=1) or raise with instructions.
"""

from __future__ import annotations

import os
import re
import urllib.request
from typing import Optional

_cache_path: Optional[str] = None

_DRIVE_FILE_RE = re.compile(r"drive\.google\.com/file/d/([\w-]+)")
_DRIVE_OPEN_RE = re.compile(r"drive\.google\.com/.*[?&]id=([\w-]+)")
_CHUNK = 1 << 20


def set_cache_path(path: str) -> None:
    global _cache_path
    _cache_path = path
    os.makedirs(path, exist_ok=True)


def get_cache_path() -> str:
    global _cache_path
    if _cache_path is None:
        set_cache_path(os.path.join(os.getcwd(), ".cache"))
    return _cache_path


def drive_direct_url(url: str) -> str:
    """Rewrite a Google Drive share link to its direct-download form
    (fannypack's cached_drive_file accepts share links the same way)."""
    m = _DRIVE_FILE_RE.search(url) or _DRIVE_OPEN_RE.search(url)
    if m:
        return f"https://drive.google.com/uc?export=download&id={m.group(1)}"
    return url


def _open_with_drive_confirm(url: str):
    """Open a URL, following Google Drive's large-file confirm-token
    interstitial (the HTML page with a confirm link) when served one."""
    import http.cookiejar
    import urllib.parse

    jar = http.cookiejar.CookieJar()
    opener = urllib.request.build_opener(
        urllib.request.HTTPCookieProcessor(jar)
    )
    resp = opener.open(url, timeout=60)
    content_type = resp.headers.get("Content-Type", "")
    if "text/html" not in content_type:
        return resp
    # Drive interstitial: find the confirm token in cookies or the page.
    token = None
    for cookie in jar:
        if cookie.name.startswith("download_warning"):
            token = cookie.value
            break
    if token is None:
        page = resp.read(1 << 20).decode("utf-8", errors="replace")
        m = re.search(r"confirm=([\w-]+)", page)
        if not m:
            raise OSError(
                f"Google Drive returned an HTML page without a confirm "
                f"token for {url!r} (quota exceeded or permission denied?)"
            )
        token = m.group(1)
    sep = "&" if "?" in url else "?"
    return opener.open(f"{url}{sep}confirm={urllib.parse.quote(token)}", timeout=60)


def download_file(url: str, dest_path: str, sha256: Optional[str] = None) -> str:
    """Stream `url` to `dest_path`: temp file + checksum + atomic rename, so
    a crashed/interrupted download never leaves a corrupt cache entry."""
    import hashlib

    url = drive_direct_url(url)
    os.makedirs(os.path.dirname(dest_path) or ".", exist_ok=True)
    tmp_path = f"{dest_path}.tmp.{os.getpid()}"
    hasher = hashlib.sha256() if sha256 else None
    try:
        if "drive.google.com" in url:
            resp = _open_with_drive_confirm(url)
        else:
            resp = urllib.request.urlopen(url, timeout=60)
        with resp, open(tmp_path, "wb") as f:
            while True:
                chunk = resp.read(_CHUNK)
                if not chunk:
                    break
                f.write(chunk)
                if hasher is not None:
                    hasher.update(chunk)
        if hasher is not None and hasher.hexdigest() != sha256:
            raise OSError(
                f"Checksum mismatch for {url!r}: got {hasher.hexdigest()}, "
                f"expected {sha256}"
            )
        os.replace(tmp_path, dest_path)  # atomic on POSIX
        return dest_path
    finally:
        if os.path.exists(tmp_path):
            os.remove(tmp_path)


def cached_file(name: str, url: str = "", sha256: Optional[str] = None) -> str:
    """Return the local path of a cached dataset file, downloading it from
    `url` on a cache miss (fannypack cached_drive_file capability —
    reference _door.py:124-127).

    Resolution order on a miss:
      1. synthesize a stand-in with the same key schema when
         MMF_TPU_SYNTHESIZE_DATA=1 (tests/benchmarks in air-gapped envs —
         checked first so those never stall on a dead network);
      2. download from `url` (unless empty or MMF_TPU_OFFLINE=1);
      3. raise with instructions.
    """
    path = os.path.join(get_cache_path(), name)
    if os.path.exists(path):
        return path

    if os.environ.get("MMF_TPU_SYNTHESIZE_DATA", "0") == "1":
        from . import synthetic

        synthetic.synthesize_named_dataset(name, path)
        return path

    download_error: Optional[Exception] = None
    if url and os.environ.get("MMF_TPU_OFFLINE", "0") != "1":
        try:
            return download_file(url, path, sha256=sha256)
        except Exception as exc:  # fall through to raise with context
            download_error = exc

    raise FileNotFoundError(
        f"Dataset file {name!r} not found in cache ({path}); download from "
        f"{url!r} failed ({download_error!r}). Place the file there manually, "
        "or set MMF_TPU_SYNTHESIZE_DATA=1 to generate a synthetic stand-in."
    )


# Alias for reference-API familiarity.
cached_drive_file = cached_file
