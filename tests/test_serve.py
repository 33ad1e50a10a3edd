"""Tests for the dlimg-serve HTTP daemon (native/tools/serve.cpp).

One hermetic server per module (random weights, 64px SAM, slim BiRefNet,
CPU jax in the embedded interpreter, suite XLA cache), driven over real
sockets with urllib. Covers the session model end-to-end — including a
bit-exact parity check of a served mask against the Python API with the
same deterministic random-weight config — plus error paths, concurrency,
LRU eviction, and the stats endpoint.
"""

import io
import json
import os
import signal
import subprocess
import threading
import time
import urllib.error
import urllib.request
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
BIN = REPO / "native" / "build" / "dlimg-serve"
CACHE = Path(__file__).resolve().parent / ".xla_cache"

SAM_SIZE = "64"
BIREFNET_RES = "128"


def _png_bytes(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _decode_png(data):
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(data)))


def _test_image():
    rgb = np.zeros((48, 64, 3), np.uint8)
    rgb[10:38, 16:50] = [200, 40, 40]
    return rgb


def _read_port(proc):
    """Read the bound port from the startup line, then keep DRAINING stdout
    in a daemon thread. The drain is load-bearing: the embedded runtime logs
    compile messages to stdout, and with nobody reading the pipe the server
    thread blocks mid-write while holding the GIL — deadlocking every
    Python-bound request (found the hard way; the kernel stack was all
    futex waits with two idle workers)."""
    port = None
    deadline = time.time() + 120
    while time.time() < deadline:
        line = proc.stdout.readline()
        if "listening on" in line:
            port = int(line.split(":")[-1].split()[0])
            break
        if proc.poll() is not None:
            raise RuntimeError(f"dlimg-serve exited: {line}")
    assert port, "server never printed its port"
    threading.Thread(target=proc.stdout.read, daemon=True).start()
    return port


def _stop(proc):
    proc.send_signal(signal.SIGTERM)
    try:
        proc.wait(timeout=30)
    except subprocess.TimeoutExpired:
        proc.kill()


@pytest.fixture(scope="module")
def server():
    from _native_build import ensure_native_build

    ensure_native_build(BIN)
    env = dict(os.environ)
    env.update({
        "DLIMG_ALLOW_RANDOM_WEIGHTS": "1",
        "DLIMG_SAM_IMAGE_SIZE": SAM_SIZE,
        "DLIMG_COMPUTE_DTYPE": "float32",
        "DLIMG_COMPILATION_CACHE": str(CACHE),
        "DLIMG_BIREFNET_RESOLUTION": BIREFNET_RES,
        "DLIMG_BIREFNET_TEST_SLIM": "1",
        "DLIMG_AMG_GRID": "4",   # tiny grid: fast CPU auto-masks
        "JAX_PLATFORMS": "cpu",  # embedded interpreter: no axon plugin
        "PYTHONPATH": str(REPO),
    })
    proc = subprocess.Popen(
        [str(BIN), "--port", "0", "--backend", "cpu", "--threads", "3",
         "--max-sessions", "2"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    port = _read_port(proc)
    yield f"http://127.0.0.1:{port}"
    _stop(proc)


def _req(base, method, path, data=None, timeout=600):
    r = urllib.request.Request(base + path, data=data, method=method)
    try:
        with urllib.request.urlopen(r, timeout=timeout) as resp:
            return resp.status, resp.read(), resp.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type")


def test_health_and_info(server):
    st, body, _ = _req(server, "GET", "/healthz")
    assert (st, body) == (200, b"ok")
    st, body, ct = _req(server, "GET", "/v1/info")
    assert st == 200 and ct == "application/json"
    info = json.loads(body)
    assert info["backend"] == "cpu"
    assert info["mode"] == "embedded-python"
    assert info["max_sessions"] == 2


def test_session_lifecycle_and_parity(server):
    rgb = _test_image()
    st, body, _ = _req(server, "POST", "/v1/sessions", _png_bytes(rgb))
    assert st == 200, body
    meta = json.loads(body)
    sid = meta["id"]
    assert (meta["width"], meta["height"]) == (64, 48)

    st, body, ct = _req(server, "POST", f"/v1/sessions/{sid}/mask?point=32,24")
    assert st == 200 and ct == "image/png"
    mask = _decode_png(body)
    assert mask.shape == (48, 64)
    assert set(np.unique(mask)) <= {0, 255}

    # Bit-exact parity with the in-process Python API (same deterministic
    # random-weight config the server runs).
    import dlimgedit_tpu as dl

    env = dl.Environment(dl.Options(
        backend=dl.Backend.cpu, allow_random_weights=True,
        sam_image_size=int(SAM_SIZE), compute_dtype="float32",
        compilation_cache_dir=str(CACHE)))
    view = dl.ImageView(rgb, dl.Extent(64, 48), dl.Channels.rgb)
    seg = dl.Segmentation.process(view, env)
    ref = seg.compute_mask(dl.Point(32, 24)).pixels.reshape(48, 64)
    np.testing.assert_array_equal(mask, ref)

    # Box prompt.
    st, body, ct = _req(server, "POST",
                        f"/v1/sessions/{sid}/mask?box=16,10,50,38")
    assert st == 200 and ct == "image/png"
    ref_box = seg.compute_mask(dl.Region(dl.Point(16, 10),
                                         dl.Point(50, 38)))
    np.testing.assert_array_equal(_decode_png(body),
                                  ref_box.pixels.reshape(48, 64))

    # all=1: three candidates with accuracies, JSON + base64 PNGs.
    st, body, _ = _req(server, "POST",
                       f"/v1/sessions/{sid}/mask?point=32,24&all=1")
    assert st == 200
    masks = json.loads(body)["masks"]
    assert len(masks) == 3
    import base64

    for m in masks:
        img = _decode_png(base64.b64decode(m["png_base64"]))
        assert img.shape == (48, 64)
        assert isinstance(m["accuracy"], float)

    # Delete -> gone.
    st, _, _ = _req(server, "DELETE", f"/v1/sessions/{sid}")
    assert st == 204
    st, _, _ = _req(server, "POST", f"/v1/sessions/{sid}/mask?point=1,1")
    assert st == 404


def test_one_shot_segment(server):
    png = _png_bytes(_test_image())
    st, body, ct = _req(server, "POST", "/v1/segment?point=32,24", png)
    assert st == 200 and ct == "image/png"
    assert _decode_png(body).shape == (48, 64)


def test_remove_bg_and_cutout(server):
    png = _png_bytes(_test_image())
    st, body, ct = _req(server, "POST", "/v1/remove-bg", png)
    assert st == 200 and ct == "image/png", body
    mask = _decode_png(body)
    assert mask.shape == (48, 64)
    st, body, _ = _req(server, "POST", "/v1/remove-bg?cutout=1", png)
    assert st == 200
    cut = _decode_png(body)
    assert cut.shape == (48, 64, 4)
    np.testing.assert_array_equal(cut[:, :, 3], mask)


def test_error_paths(server):
    sid_png = _png_bytes(_test_image())
    # Missing prompt.
    st, body, _ = _req(server, "POST", "/v1/segment", sid_png)
    assert st == 400 and b"point=" in body
    # Undecodable image -> 400 (client fault), with a JSON error.
    st, body, _ = _req(server, "POST", "/v1/segment?point=1,1",
                       b"not an image at all")
    assert st == 400
    assert "error" in json.loads(body)
    # Empty body.
    st, _, _ = _req(server, "POST", "/v1/sessions", b"")
    assert st == 400
    # Unknown endpoint / bad method.
    st, _, _ = _req(server, "GET", "/v1/nonsense")
    assert st == 404
    st, _, _ = _req(server, "GET", "/v1/sessions")
    assert st == 405
    # Unknown session.
    st, _, _ = _req(server, "POST", "/v1/sessions/deadbeef/mask?point=1,1")
    assert st == 404


def test_lru_eviction(server):
    """--max-sessions 2: the least-recently-used session is evicted."""
    ids = []
    for shade in (60, 120, 180):
        rgb = _test_image()
        rgb[:4, :4] = shade  # distinct images
        st, body, _ = _req(server, "POST", "/v1/sessions", _png_bytes(rgb))
        assert st == 200
        ids.append(json.loads(body)["id"])
    st, _, _ = _req(server, "POST", f"/v1/sessions/{ids[0]}/mask?point=5,5")
    assert st == 404  # evicted
    for sid in ids[1:]:
        st, _, _ = _req(server, "POST", f"/v1/sessions/{sid}/mask?point=5,5")
        assert st == 200
        _req(server, "DELETE", f"/v1/sessions/{sid}")


def test_concurrent_mask_queries(server):
    """Parallel queries against one session return identical, correct masks
    (the C ABI's thread-safety surfaced through the HTTP layer)."""
    st, body, _ = _req(server, "POST", "/v1/sessions",
                       _png_bytes(_test_image()))
    assert st == 200
    sid = json.loads(body)["id"]
    results = [None] * 6
    errors = []

    def query(i):
        try:
            st, data, _ = _req(server, "POST",
                               f"/v1/sessions/{sid}/mask?point=32,24")
            assert st == 200
            results[i] = data
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=query, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert all(r == results[0] for r in results)
    _req(server, "DELETE", f"/v1/sessions/{sid}")


@pytest.fixture(scope="module")
def batch_server():
    """dlimg-serve with per-session prompt micro-batching enabled
    (--batch-window-ms): concurrent single-prompt queries for one session
    ride a single batched decode program."""
    from _native_build import ensure_native_build

    ensure_native_build(BIN)
    env = dict(os.environ)
    env.update({
        "DLIMG_ALLOW_RANDOM_WEIGHTS": "1",
        "DLIMG_SAM_IMAGE_SIZE": SAM_SIZE,
        "DLIMG_COMPUTE_DTYPE": "float32",
        "DLIMG_COMPILATION_CACHE": str(CACHE),
        "DLIMG_BIREFNET_RESOLUTION": BIREFNET_RES,
        "DLIMG_BIREFNET_TEST_SLIM": "1",
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": str(REPO),
    })
    proc = subprocess.Popen(
        [str(BIN), "--port", "0", "--backend", "cpu", "--threads", "4",
         "--batch-window-ms", "300"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    port = _read_port(proc)
    yield f"http://127.0.0.1:{port}"
    _stop(proc)


def test_batched_mask_queries(batch_server):
    """Concurrent queries are grouped into one batched decode (stats prove
    it) and every client still gets the correct mask for ITS prompt."""
    server = batch_server
    st, body, _ = _req(server, "POST", "/v1/sessions",
                       _png_bytes(_test_image()))
    assert st == 200, body
    sid = json.loads(body)["id"]

    # Warm the decode path once (compile outside the timed window).
    st, warm, _ = _req(server, "POST",
                       f"/v1/sessions/{sid}/mask?point=32,24")
    assert st == 200

    points = [(32, 24), (20, 20), (48, 30), (32, 24)]
    results = [None] * len(points)
    errors = []

    def query(i):
        try:
            x, y = points[i]
            st, data, _ = _req(server, "POST",
                               f"/v1/sessions/{sid}/mask?point={x},{y}")
            assert st == 200, data
            results[i] = data
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=query, args=(i,))
               for i in range(len(points))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    # Identical prompts agree; the repeated point matches the warm query
    # (batched decode parity with the single path is pinned at the Python
    # layer, test_segmentation.py).
    assert results[0] == results[3] == warm

    st, body, _ = _req(server, "GET", "/v1/stats")
    stats = json.loads(body)
    assert stats["batched_calls"] >= 1
    assert stats["batched_prompts"] >= len(points) + 1
    # At least one multi-prompt group formed under the 300 ms window.
    assert stats["largest_batch"] >= 2

    # Box prompts ride the batcher too.
    st, body, ct = _req(server, "POST",
                        f"/v1/sessions/{sid}/mask?box=5,5,60,40")
    assert st == 200 and ct == "image/png"
    _req(server, "DELETE", f"/v1/sessions/{sid}")


@pytest.fixture(scope="module")
def bundle_server(tmp_path_factory):
    """dlimg-serve in the Python-free PJRT serving mode: a CPU bundle from
    tools/aot_export.py, loaded through the repo's own CPU PJRT plugin —
    the production deployment shape, with no Python in the server process.
    """
    import sys

    from _native_build import BUILD_DIR, ensure_native_build

    ensure_native_build(BIN)
    if not (BUILD_DIR / "libdlimg_pjrt_cpu.so").exists():
        pytest.skip("libdlimg_pjrt_cpu.so not built "
                    "(tensorflow C++ libraries unavailable)")
    bundle = tmp_path_factory.mktemp("serve_bundle")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PYTHONPATH", None)
    env.pop("XLA_FLAGS", None)  # no 8-virtual-device leak into the export
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "aot_export.py"),
         "--out", str(bundle), "--program", "serving", "--backend", "cpu",
         "--variant", "mobile_sam", "--sam-image-size", SAM_SIZE,
         "--buckets", "128", "--batch-sizes", "2"],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    env["DLIMG_PJRT_BUNDLE"] = str(bundle)
    proc = subprocess.Popen(
        [str(BIN), "--port", "0", "--backend", "auto", "--threads", "3",
         "--batch-window-ms", "300"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    port = _read_port(proc)
    yield f"http://127.0.0.1:{port}"
    _stop(proc)


def test_bundle_mode_serving(bundle_server):
    st, body, _ = _req(bundle_server, "GET", "/v1/info")
    assert st == 200
    assert json.loads(body)["mode"] == "pjrt-bundle"

    rgb = _test_image()
    st, body, _ = _req(bundle_server, "POST", "/v1/sessions",
                       _png_bytes(rgb))
    assert st == 200, body
    sid = json.loads(body)["id"]
    st, body, ct = _req(bundle_server, "POST",
                        f"/v1/sessions/{sid}/mask?point=32,24")
    assert st == 200 and ct == "image/png", body
    mask = _decode_png(body)
    assert mask.shape == (48, 64)
    assert set(np.unique(mask)) <= {0, 255}
    # 3-candidate decode through the bundle's batched program.
    st, body, _ = _req(bundle_server, "POST",
                       f"/v1/sessions/{sid}/mask?point=32,24&all=1")
    assert st == 200
    assert len(json.loads(body)["masks"]) == 3


def test_bundle_mode_batched_queries(bundle_server):
    """Micro-batching in the Python-free PJRT mode: concurrent queries ride
    the bundle's serve_decode_batch2 program (pjrt_compute_mask_batch —
    padding + the >nb chunking loop included, 3 prompts over nb=2)."""
    st, body, _ = _req(bundle_server, "POST", "/v1/sessions",
                       _png_bytes(_test_image()))
    assert st == 200, body
    sid = json.loads(body)["id"]
    st, warm, _ = _req(bundle_server, "POST",
                       f"/v1/sessions/{sid}/mask?point=32,24")
    assert st == 200

    points = [(32, 24), (20, 20), (32, 24)]
    results = [None] * len(points)
    errors = []

    def query(i):
        try:
            x, y = points[i]
            st, data, _ = _req(bundle_server, "POST",
                               f"/v1/sessions/{sid}/mask?point={x},{y}")
            assert st == 200, data
            results[i] = data
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=query, args=(i,))
               for i in range(len(points))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert results[0] == results[2] == warm

    st, body, _ = _req(bundle_server, "GET", "/v1/stats")
    stats = json.loads(body)
    assert stats["batched_calls"] >= 1
    assert stats["largest_batch"] >= 2
    _req(bundle_server, "DELETE", f"/v1/sessions/{sid}")


def test_auto_masks(server):
    """Automatic mask generation over HTTP: every object mask of the
    session image, best-first, with accuracies (wraps
    Segmentation::generate_masks)."""
    st, body, _ = _req(server, "POST", "/v1/sessions",
                       _png_bytes(_test_image()))
    assert st == 200, body
    sid = json.loads(body)["id"]
    st, body, ct = _req(
        server, "POST",
        f"/v1/sessions/{sid}/auto-masks?iou=0.0&stability=0.0&max=4")
    assert st == 200 and ct == "application/json", body
    masks = json.loads(body)["masks"]
    assert 1 <= len(masks) <= 4
    accs = [m["accuracy"] for m in masks]
    assert accs == sorted(accs, reverse=True)
    import base64

    png = base64.b64decode(masks[0]["png_base64"])
    arr = _decode_png(png)
    assert arr.shape == (48, 64)
    assert set(np.unique(arr)) <= {0, 255}
    # Bad params surface as 400, not 500.
    st, _, _ = _req(server, "POST",
                    f"/v1/sessions/{sid}/auto-masks?max=0")
    assert st == 400
    _req(server, "DELETE", f"/v1/sessions/{sid}")


def test_stats(server):
    # Self-sufficient: issue one mask query so the stats key exists even
    # when this test runs without the earlier module tests (-k filters).
    st, body, _ = _req(server, "POST", "/v1/sessions",
                       _png_bytes(_test_image()))
    assert st == 200, body
    sid = json.loads(body)["id"]
    st, _, _ = _req(server, "POST", f"/v1/sessions/{sid}/mask?point=32,24")
    assert st == 200
    _req(server, "DELETE", f"/v1/sessions/{sid}")

    st, body, _ = _req(server, "GET", "/v1/stats")
    assert st == 200
    stats = json.loads(body)
    assert stats["uptime_s"] > 0
    eps = stats["endpoints"]
    # Session ids are collapsed into one key.
    assert "POST /v1/sessions/<id>/mask" in eps
    entry = eps["POST /v1/sessions/<id>/mask"]
    assert entry["count"] >= 1
    assert entry["p95_ms"] >= entry["p50_ms"] >= 0
    assert not any("deadbeef" in k for k in eps)


def test_keep_alive_and_pipelining(server):
    """HTTP/1.1 keep-alive: multiple requests on ONE connection, including
    two pipelined back-to-back (the carry buffer must not drop the second
    request's bytes), and Connection: close is honoured."""
    import socket

    host, port = server.split("//")[1].split(":")

    def recv_response(sock, buf=b""):
        while b"\r\n\r\n" not in buf:
            buf += sock.recv(65536)
        head, rest = buf.split(b"\r\n\r\n", 1)
        length = 0
        for line in head.split(b"\r\n"):
            if line.lower().startswith(b"content-length:"):
                length = int(line.split(b":")[1])
        while len(rest) < length:
            rest += sock.recv(65536)
        return head, rest[:length], rest[length:]

    with socket.create_connection((host, int(port)), timeout=120) as sock:
        # Two sequential requests on the same connection.
        sock.sendall(b"GET /healthz HTTP/1.1\r\nHost: x\r\n\r\n")
        head, body, extra = recv_response(sock)
        assert b"200" in head.split(b"\r\n")[0] and body == b"ok"
        assert b"connection: keep-alive" in head.lower()
        sock.sendall(b"GET /v1/info HTTP/1.1\r\nHost: x\r\n\r\n")
        head, body, extra = recv_response(sock, extra)
        assert json.loads(body)["mode"] == "embedded-python"

        # Two PIPELINED requests sent before reading either response.
        sock.sendall(b"GET /healthz HTTP/1.1\r\nHost: x\r\n\r\n"
                     b"GET /v1/stats HTTP/1.1\r\nHost: x\r\n\r\n")
        head, body, extra = recv_response(sock, extra)
        assert body == b"ok"
        head, body, extra = recv_response(sock, extra)
        assert "uptime_s" in json.loads(body)

        # Connection: close ends the session after the response.
        sock.sendall(b"GET /healthz HTTP/1.1\r\nHost: x\r\n"
                     b"Connection: close\r\n\r\n")
        head, body, extra = recv_response(sock, extra)
        assert body == b"ok" and b"connection: close" in head.lower()
        assert sock.recv(1) == b""  # server closed

    # HTTP/1.0 defaults to close (and the server must say so).
    with socket.create_connection((host, int(port)), timeout=120) as sock:
        sock.sendall(b"GET /healthz HTTP/1.0\r\nHost: x\r\n\r\n")
        head, body, extra = recv_response(sock)
        assert body == b"ok" and b"connection: close" in head.lower()
        assert sock.recv(1) == b""

    # 'close' in an UNRELATED header must not end a keep-alive connection.
    with socket.create_connection((host, int(port)), timeout=120) as sock:
        sock.sendall(b"GET /healthz HTTP/1.1\r\nHost: x\r\n"
                     b"User-Agent: closeio-client/1.0\r\n\r\n")
        head, body, extra = recv_response(sock)
        assert body == b"ok" and b"connection: keep-alive" in head.lower()
        sock.sendall(b"GET /healthz HTTP/1.1\r\nHost: x\r\n\r\n")
        head, body, extra = recv_response(sock, extra)
        assert body == b"ok"  # connection survived

    # Per-connection request cap: the 1000th response must advertise
    # close (a silent close after a keep-alive response would surface as
    # RemoteDisconnected mid-stream); http.client then reconnects
    # transparently.
    import http.client

    conn = http.client.HTTPConnection(f"{host}:{port}", timeout=120)
    saw_close = 0
    for i in range(1001):
        conn.request("GET", "/healthz")
        resp = conn.getresponse()
        assert resp.status == 200
        resp.read()
        if (resp.getheader("Connection") or "").lower() == "close":
            saw_close += 1
            assert i == 999  # exactly at the cap
    assert saw_close == 1
    conn.close()
