"""HTTP layer of the browser live preview (webviewer.py) — exercised with a
stub frame source, no renderer/JAX involved."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from radish_pt_tpu import webviewer as wv


@pytest.fixture()
def server():
    shared = wv._Shared()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), wv._make_handler(shared))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield shared, f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_page_and_stats(server):
    shared, base = server
    shared.publish(b"xx", "iter 3 | 12.0 ms/frame")
    page = urllib.request.urlopen(f"{base}/", timeout=5).read()
    assert b"/stream" in page and b"keydown" in page
    stats = urllib.request.urlopen(f"{base}/stats", timeout=5).read()
    assert b"12.0 ms/frame" in stats


def test_stream_delivers_published_frame(server):
    shared, base = server
    img = np.zeros((8, 8, 3), np.uint8)
    img[:, :, 0] = 200
    jpeg = wv.encode_jpeg(img)
    shared.publish(jpeg, "{}")
    # generous timeout: the 1-core CI host can stall the stream
    # thread for seconds under concurrent compile load
    resp = urllib.request.urlopen(f"{base}/stream", timeout=30)
    head = resp.read(len(jpeg) + 200)
    assert b"image/jpeg" in head
    assert jpeg[:16] in head  # the published frame's bytes stream out


def test_key_and_drag_enqueue(server):
    shared, base = server
    for path, body in (("/key", {"key": "w"}),
                       ("/drag", {"dx": 3, "dy": -2})):
        req = urllib.request.Request(
            f"{base}{path}", data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        assert urllib.request.urlopen(req, timeout=5).status == 204
    kinds = [shared.events.get_nowait(), shared.events.get_nowait()]
    assert kinds[0] == ("key", "w")
    assert kinds[1][0] == "drag" and kinds[1][1]["dx"] == 3
