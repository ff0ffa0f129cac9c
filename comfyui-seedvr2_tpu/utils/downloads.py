"""Weight downloads with resume, SHA256 validation and a validation cache.

Equivalent of the reference's src/utils/downloads.py:26-240 — HTTP download
with Range-request resume (`download_with_resume`, ref :138-162), checksum
verification with an mtime/size validation cache so repeated runs skip
re-hashing multi-GB files (`validate_file` / `is_file_validated_cached`,
ref :62-131), and corrupted-file re-download with cache invalidation
(`download_weight`, ref :165-240). The transfer path is plain urllib so it
works without huggingface_hub and is testable against a local HTTP fixture
(tests/test_downloads.py).
"""

import hashlib
import json
import os
import urllib.error
import urllib.request
from typing import Optional

from .model_registry import get_model_info

MAX_RETRIES = 3
DOWNLOAD_CHUNK_SIZE = 1 << 20
HUGGINGFACE_BASE_URL = "https://huggingface.co/{repo}/resolve/main/{filename}"
_CACHE_NAME = ".sha256_validation_cache.json"


def _cache_path(model_dir: str) -> str:
    return os.path.join(model_dir, _CACHE_NAME)


def _load_cache(model_dir: str) -> dict:
    try:
        with open(_cache_path(model_dir)) as f:
            return json.load(f)
    except Exception:
        return {}


def _save_cache(model_dir: str, cache: dict):
    try:
        with open(_cache_path(model_dir), "w") as f:
            json.dump(cache, f)
    except OSError:
        pass


def _drop_cache_entry(model_dir: str, filename: str):
    cache = _load_cache(model_dir)
    if filename in cache:
        del cache[filename]
        _save_cache(model_dir, cache)


def sha256_file(path: str, chunk: int = 1 << 22) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            data = f.read(chunk)
            if not data:
                break
            h.update(data)
    return h.hexdigest()


def is_file_validated_cached(path: str, expected_sha: Optional[str],
                             model_dir: str) -> bool:
    """Fast path: trust a prior hash if size+mtime are unchanged
    (reference is_file_validated_cached, downloads.py:62-84)."""
    if not os.path.isfile(path):
        return False
    st = os.stat(path)
    entry = _load_cache(model_dir).get(os.path.basename(path))
    return bool(entry
                and entry.get("size") == st.st_size
                and abs(entry.get("mtime", 0) - st.st_mtime) < 2
                and (expected_sha is None
                     or entry.get("sha256") == expected_sha))


def validate_file(path: str, expected_sha: Optional[str],
                  model_dir: str) -> bool:
    if expected_sha is None:
        return os.path.isfile(path)
    if is_file_validated_cached(path, expected_sha, model_dir):
        return True
    if not os.path.isfile(path):
        return False
    # stat BEFORE hashing: if the file is modified while sha256_file runs,
    # the cached size/mtime then mismatch the on-disk file and the entry is
    # ignored, instead of permanently pairing new stats with the old hash.
    st = os.stat(path)
    actual = sha256_file(path)
    cache = _load_cache(model_dir)
    cache[os.path.basename(path)] = {
        "size": st.st_size, "mtime": st.st_mtime, "sha256": actual}
    _save_cache(model_dir, cache)
    return actual == expected_sha


def download_with_resume(url: str, filepath: str, debug=None,
                         chunk: int = DOWNLOAD_CHUNK_SIZE,
                         timeout: float = 30.0,
                         allow_resume: bool = True) -> bool:
    """Stream `url` to `filepath` via a `.download` temp file, resuming a
    previous partial transfer with a Range request (reference
    download_with_resume, downloads.py:138-162). If the server ignores the
    Range header (HTTP 200 instead of 206), the partial is discarded and
    the transfer restarts from byte 0 — appending a full body to a partial
    file is the corruption mode the status check exists to prevent.

    `allow_resume=False` discards any existing partial and transfers from
    byte 0 — required when no checksum will verify the result, since a
    stale partial spliced with a new tail (upstream file changed between
    attempts) would otherwise be accepted silently."""
    temp_file = f"{filepath}.download"
    if not allow_resume and os.path.exists(temp_file):
        os.remove(temp_file)
    existing = os.path.getsize(temp_file) if os.path.exists(temp_file) else 0
    headers = {"Range": f"bytes={existing}-"} if existing > 0 else {}
    try:
        req = urllib.request.Request(url, headers=headers)
        with urllib.request.urlopen(req, timeout=timeout) as response:
            resumed = existing > 0 and response.status == 206
            expected = int(response.headers.get("Content-Length", 0) or 0)
            got = 0
            mode = "ab" if resumed else "wb"
            with open(temp_file, mode) as f:
                while True:
                    data = response.read(chunk)
                    if not data:
                        break
                    f.write(data)
                    got += len(data)
        if expected and got < expected:
            # Connection closed early: keep the partial so the next
            # attempt resumes with a Range request instead of accepting
            # a silently-truncated file.
            if debug:
                debug.log(f"short read ({got}/{expected} bytes), will "
                          "resume", level="WARNING", category="download",
                          force=True)
            return False
        os.replace(temp_file, filepath)
        return True
    except urllib.error.HTTPError as e:
        # 416: the partial already covers the full file (e.g. a retry after
        # a failed rename) — finalize it and let the caller's checksum pass
        # decide whether it is actually good.
        if e.code == 416 and existing > 0:
            os.replace(temp_file, filepath)
            return True
        if debug:
            debug.log(f"download error: {e}", level="ERROR",
                      category="download", force=True)
        return False
    except Exception as e:  # noqa: BLE001 — partial stays for the next resume
        if debug:
            debug.log(f"download error: {e}", level="ERROR",
                      category="download", force=True)
        return False


def download_weight(model_name: str, model_dir: str, debug=None,
                    url: Optional[str] = None) -> str:
    """Return a validated local path for the named weight, downloading when
    missing or corrupt (reference download_weight, downloads.py:165-240).

    Order: validation-cache fast path -> full hash of an existing file
    (corrupt files are deleted and their cache entry dropped) -> up to
    MAX_RETRIES resumable HTTP downloads. Offline installs just need the
    file present in model_dir. `url` overrides the registry-derived HF
    URL (tests, mirrors)."""
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, model_name)
    info = get_model_info(model_name)
    if validate_file(path, info.sha256, model_dir):
        return path
    if os.path.isfile(path):
        if info.sha256 is None:
            return path
        if debug:
            debug.log(f"file corrupted: {model_name}, re-downloading",
                      level="WARNING", category="download", force=True)
        os.remove(path)
        _drop_cache_entry(model_dir, model_name)

    src = url or HUGGINGFACE_BASE_URL.format(repo=info.repo,
                                             filename=model_name)
    last_err = None
    for attempt in range(MAX_RETRIES):
        try:
            ok = download_with_resume(src, path, debug,
                                      allow_resume=info.sha256 is not None)
            got = path if ok else None
            if got and validate_file(got, info.sha256, model_dir):
                return got
            if got:
                os.remove(got)
                _drop_cache_entry(model_dir, os.path.basename(got))
                raise IOError(f"checksum mismatch for {model_name}")
            raise IOError(f"transfer failed for {model_name}")
        except Exception as e:  # noqa: BLE001 — retry with resume
            last_err = e
            if debug:
                debug.log(f"download attempt {attempt + 1} failed: {e}",
                          level="WARNING", category="download", force=True)
    if os.path.isfile(path):
        if debug:
            debug.log(f"using unvalidated local file {path}",
                      level="WARNING", category="download", force=True)
        return path
    raise IOError(f"cannot obtain {model_name}: {last_err}")
