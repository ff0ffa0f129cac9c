"""Weight downloads with SHA256 validation + validation cache.

Equivalent of src/utils/downloads.py: HF hub download with resume, checksum
verification, and an mtime/size validation cache so repeated runs skip
re-hashing multi-GB files."""

import hashlib
import json
import os
from typing import Optional

from .model_registry import get_model_info

MAX_RETRIES = 3
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


def sha256_file(path: str, chunk: int = 1 << 22) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            data = f.read(chunk)
            if not data:
                break
            h.update(data)
    return h.hexdigest()


def validate_file(path: str, expected_sha: Optional[str],
                  model_dir: str) -> bool:
    if expected_sha is None:
        return os.path.isfile(path)
    if not os.path.isfile(path):
        return False
    st = os.stat(path)
    cache = _load_cache(model_dir)
    entry = cache.get(os.path.basename(path))
    if entry and entry.get("size") == st.st_size \
            and entry.get("mtime") == st.st_mtime:
        return entry.get("sha256") == expected_sha
    actual = sha256_file(path)
    cache[os.path.basename(path)] = {
        "size": st.st_size, "mtime": st.st_mtime, "sha256": actual}
    _save_cache(model_dir, cache)
    return actual == expected_sha


def download_weight(model_name: str, model_dir: str, debug=None) -> str:
    """Return a validated local path for the named weight, downloading from
    the registry repo when missing (requires network; offline installs just
    need the file present in model_dir)."""
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, model_name)
    info = get_model_info(model_name)
    if validate_file(path, info.sha256, model_dir):
        return path
    if os.path.isfile(path) and info.sha256 is None:
        return path

    last_err = None
    for attempt in range(MAX_RETRIES):
        try:
            from huggingface_hub import hf_hub_download

            got = hf_hub_download(repo_id=info.repo, filename=model_name,
                                  local_dir=model_dir)
            if validate_file(got, info.sha256, model_dir):
                return got
            raise IOError(f"checksum mismatch for {model_name}")
        except Exception as e:  # noqa: BLE001
            last_err = e
            if debug:
                debug.log(f"download attempt {attempt + 1} failed: {e}",
                          level="WARNING", category="download", force=True)
    if os.path.isfile(path):
        if debug:
            debug.log(f"using unvalidated local file {path}", level="WARNING",
                      category="download", force=True)
        return path
    raise IOError(f"cannot obtain {model_name}: {last_err}")
