"""Load-test client for dlimg-serve (native/tools/serve.cpp).

Measures interactive-mask serving under concurrency — the serving shape the
reference library targets with its session model (embed once, query masks) —
against a RUNNING dlimg-serve instance:

    python tools/serve_loadtest.py --base http://127.0.0.1:8080 \
        --image images/truck.jpg --sessions 4 --concurrency 1,4,16 \
        --requests 64

For each concurrency level C it fires `--requests` mask queries from C
client threads (round-robin over `--sessions` pre-created sessions, random
in-bounds points) and reports wall QPS + latency percentiles, then dumps the
server's own /v1/stats (which includes the micro-batching counters when the
server runs with --batch-window-ms). Pure stdlib + numpy/PIL client; the
server process is the system under test.
"""

from __future__ import annotations

import argparse
import io
import json
import random
import threading
import time
import urllib.error
import urllib.request


def _req(base, method, path, data=None, timeout=600):
    r = urllib.request.Request(base + path, data=data, method=method)
    with urllib.request.urlopen(r, timeout=timeout) as resp:
        return resp.status, resp.read()


def _image_bytes(path: str | None):
    if path:
        with open(path, "rb") as f:
            return f.read()
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (768, 1024, 3), dtype=np.uint8)
    rgb[200:600, 300:800] = [210, 60, 60]  # an "object"
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="PNG")
    return buf.getvalue()


def _pct(sorted_ms, p):
    if not sorted_ms:
        return 0.0
    return sorted_ms[min(len(sorted_ms) - 1, int(p * (len(sorted_ms) - 1)))]


def run_level(base, session_ids, wh, concurrency, requests,
              keep_alive=True):
    import http.client

    host_port = base.split("//")[1]
    lat_ms = []
    errors = []
    lock = threading.Lock()
    idx = {"v": 0}

    def worker(seed):
        rng = random.Random(seed)
        conn = (http.client.HTTPConnection(host_port, timeout=600)
                if keep_alive else None)
        while True:
            with lock:
                if idx["v"] >= requests:
                    if conn:
                        conn.close()
                    return
                i = idx["v"]
                idx["v"] += 1
            sid = session_ids[i % len(session_ids)]
            w, h = wh
            x, y = rng.randrange(w), rng.randrange(h)
            path = f"/v1/sessions/{sid}/mask?point={x},{y}"
            t0 = time.perf_counter()
            try:
                if conn:  # one persistent connection per client thread
                    conn.request("POST", path)
                    resp = conn.getresponse()
                    resp.read()
                    assert resp.status == 200
                else:
                    st, _ = _req(base, "POST", path)
                    assert st == 200
            except Exception as e:  # noqa: BLE001
                with lock:
                    errors.append(str(e))
                if conn:  # reconnect after an error
                    conn.close()
                    conn = http.client.HTTPConnection(host_port, timeout=600)
                continue
            dt = (time.perf_counter() - t0) * 1e3
            with lock:
                lat_ms.append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker, args=(s,))
               for s in range(concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat_ms.sort()
    return {
        "concurrency": concurrency,
        "requests": len(lat_ms),
        "errors": len(errors),
        "wall_s": round(wall, 3),
        "qps": round(len(lat_ms) / wall, 2) if wall else 0.0,
        "p50_ms": round(_pct(lat_ms, 0.50), 2),
        "p95_ms": round(_pct(lat_ms, 0.95), 2),
        "p99_ms": round(_pct(lat_ms, 0.99), 2),
        "mean_ms": round(sum(lat_ms) / len(lat_ms), 2) if lat_ms else 0.0,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--base", default="http://127.0.0.1:8080")
    ap.add_argument("--image", default=None,
                    help="image file to embed (default: synthetic 1024x768)")
    ap.add_argument("--sessions", type=int, default=4)
    ap.add_argument("--concurrency", default="1,4,16",
                    help="comma list of client counts per level")
    ap.add_argument("--requests", type=int, default=64,
                    help="mask queries per level")
    ap.add_argument("--no-keepalive", action="store_true",
                    help="one connection per request (legacy behaviour)")
    args = ap.parse_args(argv)

    img = _image_bytes(args.image)
    st, body = _req(args.base, "GET", "/v1/info")
    info = json.loads(body)
    print(f"server: {args.base} backend={info['backend']} "
          f"mode={info['mode']}", flush=True)

    session_ids = []
    wh = None
    for _ in range(args.sessions):
        st, body = _req(args.base, "POST", "/v1/sessions", img)
        assert st == 200, body
        j = json.loads(body)
        session_ids.append(j["id"])
        wh = (j["width"], j["height"])
    print(f"{args.sessions} sessions created ({wh[0]}x{wh[1]})", flush=True)

    # Warm every session's decode path once (compile / first-fetch cost
    # stays out of the timed levels, mirroring steady-state serving).
    for sid in session_ids:
        _req(args.base, "POST", f"/v1/sessions/{sid}/mask?point=10,10")

    results = []
    for c in [int(v) for v in args.concurrency.split(",") if v]:
        r = run_level(args.base, session_ids, wh, c, args.requests,
                      keep_alive=not args.no_keepalive)
        results.append(r)
        print(json.dumps(r), flush=True)

    st, body = _req(args.base, "GET", "/v1/stats")
    print("server stats:", body.decode(), flush=True)
    for sid in session_ids:
        _req(args.base, "DELETE", f"/v1/sessions/{sid}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
