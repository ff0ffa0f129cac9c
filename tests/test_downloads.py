"""Download subsystem tests against a localhost HTTP fixture (no egress).

Covers the reference's src/utils/downloads.py behaviors: Range-request
resume after truncation (:138-162), SHA256 mismatch rejection and
corrupted-file re-download with cache invalidation (:165-240), and the
mtime/size validation cache's skip-rehash fast path (:62-84).
"""

import hashlib
import http.server
import os
import threading

import pytest

from seedvr2_tpu.utils import downloads as dl
from seedvr2_tpu.utils.model_registry import ModelInfo

PAYLOAD = bytes(range(256)) * 2048  # 512 KiB, position-dependent bytes
SHA = hashlib.sha256(PAYLOAD).hexdigest()


class _RangeHandler(http.server.BaseHTTPRequestHandler):
    """Serves PAYLOAD at any path, honoring single-range requests.

    Class knobs: `ignore_range` simulates a server that answers 200 to a
    Range request; `truncate_at` closes the connection after that many
    body bytes (mid-transfer failure); `served_ranges` records requests.
    """

    ignore_range = False
    truncate_at = None
    served_ranges = []

    def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler API
        start = 0
        rng = self.headers.get("Range")
        if rng and not self.ignore_range:
            start = int(rng.split("=")[1].rstrip("-"))
            if start >= len(PAYLOAD):
                self.send_response(416)
                self.send_header("Content-Range", f"bytes */{len(PAYLOAD)}")
                self.end_headers()
                return
            self.send_response(206)
            self.send_header(
                "Content-Range",
                f"bytes {start}-{len(PAYLOAD) - 1}/{len(PAYLOAD)}")
        else:
            self.send_response(200)
        body = PAYLOAD[start:]
        if self.truncate_at is not None:
            body = body[:self.truncate_at]
        self.send_header("Content-Length", str(len(PAYLOAD) - start))
        self.end_headers()
        type(self).served_ranges.append((rng, start))
        try:
            self.wfile.write(body)
        except BrokenPipeError:
            pass

    def log_message(self, *a):  # silence per-request stderr noise
        pass


@pytest.fixture
def server():
    _RangeHandler.ignore_range = False
    _RangeHandler.truncate_at = None
    _RangeHandler.served_ranges = []
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _RangeHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


@pytest.fixture
def registry(monkeypatch):
    def fake_info(name):
        return ModelInfo(sha256=None if "nosha" in name else SHA)

    monkeypatch.setattr(dl, "get_model_info", fake_info)


def test_fresh_download_validates_and_caches(server, registry, tmp_path):
    path = dl.download_weight("w.safetensors", str(tmp_path),
                              url=f"{server}/w.safetensors")
    with open(path, "rb") as f:
        assert f.read() == PAYLOAD
    cache = dl._load_cache(str(tmp_path))
    assert cache["w.safetensors"]["sha256"] == SHA


def test_resume_after_truncation(server, registry, tmp_path):
    # A previous transfer died at 100 KiB: the partial lives in the
    # .download temp file. The next attempt must request bytes=102400-
    # and the server must only serve the tail.
    cut = 100 * 1024
    temp = tmp_path / "w.safetensors.download"
    temp.write_bytes(PAYLOAD[:cut])
    path = dl.download_weight("w.safetensors", str(tmp_path),
                              url=f"{server}/w.safetensors")
    with open(path, "rb") as f:
        assert f.read() == PAYLOAD
    assert (f"bytes={cut}-", cut) in _RangeHandler.served_ranges
    assert not temp.exists()


def test_resume_restarts_when_server_ignores_range(server, registry,
                                                   tmp_path):
    _RangeHandler.ignore_range = True
    temp = tmp_path / "w.safetensors.download"
    temp.write_bytes(b"\xff" * 4096)  # garbage partial
    path = dl.download_weight("w.safetensors", str(tmp_path),
                              url=f"{server}/w.safetensors")
    with open(path, "rb") as f:
        assert f.read() == PAYLOAD  # not garbage + payload


def test_mid_transfer_failure_then_resume(server, registry, tmp_path):
    # First attempt dies mid-body (connection closed after 64 KiB);
    # download_weight's retry loop resumes from the partial and finishes.
    _RangeHandler.truncate_at = 64 * 1024

    real = dl.download_with_resume
    calls = []

    def flaky(url, filepath, debug=None, **kw):
        calls.append(1)
        if len(calls) == 2:
            _RangeHandler.truncate_at = None  # server recovers
        return real(url, filepath, debug, **kw)

    dl_orig = dl.download_with_resume
    dl.download_with_resume = flaky
    try:
        path = dl.download_weight("w.safetensors", str(tmp_path),
                                  url=f"{server}/w.safetensors")
    finally:
        dl.download_with_resume = dl_orig
    with open(path, "rb") as f:
        assert f.read() == PAYLOAD
    # second request resumed, not restarted
    assert any(r and r.startswith("bytes=") and s > 0
               for r, s in _RangeHandler.served_ranges)


def test_sha_mismatch_rejected(server, tmp_path, monkeypatch):
    monkeypatch.setattr(dl, "get_model_info",
                        lambda name: ModelInfo(sha256="0" * 64))
    with pytest.raises(IOError, match="cannot obtain"):
        dl.download_weight("w.safetensors", str(tmp_path),
                           url=f"{server}/w.safetensors")
    # rejected file must not be left behind as valid
    assert not (tmp_path / "w.safetensors").exists()
    assert "w.safetensors" not in dl._load_cache(str(tmp_path))


def test_corrupt_local_file_redownloaded(server, registry, tmp_path):
    target = tmp_path / "w.safetensors"
    target.write_bytes(b"corrupt")
    path = dl.download_weight("w.safetensors", str(tmp_path),
                              url=f"{server}/w.safetensors")
    with open(path, "rb") as f:
        assert f.read() == PAYLOAD


def test_validation_cache_skips_rehash(registry, tmp_path, monkeypatch):
    target = tmp_path / "w.safetensors"
    target.write_bytes(PAYLOAD)
    assert dl.validate_file(str(target), SHA, str(tmp_path))

    hashes = []
    real = dl.sha256_file
    monkeypatch.setattr(dl, "sha256_file",
                        lambda p, **kw: (hashes.append(p), real(p))[1])
    # unchanged size+mtime: cache hit, no rehash
    assert dl.validate_file(str(target), SHA, str(tmp_path))
    assert hashes == []
    # touch the file (mtime moves >2s): must rehash
    st = target.stat()
    os.utime(target, (st.st_atime, st.st_mtime + 10))
    assert dl.validate_file(str(target), SHA, str(tmp_path))
    assert hashes == [str(target)]


def test_no_sha_accepts_existing_file(registry, tmp_path):
    target = tmp_path / "custom_nosha.safetensors"
    target.write_bytes(b"whatever")
    path = dl.download_weight("custom_nosha.safetensors", str(tmp_path))
    assert path == str(target)


def test_no_sha_never_resumes_stale_partial(server, registry, tmp_path):
    """With no registry checksum, a resumed splice (stale partial + new
    tail) could never be caught — so the transfer must discard the
    partial and start from byte 0."""
    temp = tmp_path / "w_nosha.safetensors.download"
    temp.write_bytes(b"stale bytes from an older upstream version")
    path = dl.download_weight("w_nosha.safetensors", str(tmp_path),
                              url=f"{server}/w_nosha.safetensors")
    with open(path, "rb") as f:
        assert f.read() == PAYLOAD  # no stale prefix spliced in
    # and no Range request was ever issued (plain GETs log range=None)
    assert all(rng is None for rng, _ in _RangeHandler.served_ranges)
