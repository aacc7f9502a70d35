"""Live MJPEG streaming viewer (aprilgrid_tpu/live.py — the rerun-demo
equivalent, reference examples/demo.rs:101-120)."""

import json
import urllib.request

import numpy as np

from aprilgrid_tpu.live import LiveStream


def _get(port, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=10
    ) as r:
        return r.status, r.headers, r.read()


def test_live_stream_endpoints():
    stream = LiveStream(port=0).start()
    try:
        port = stream.port
        status, headers, body = _get(port, "/")
        assert status == 200 and b"stream.mjpg" in body

        # no frame yet
        try:
            _get(port, "/latest.jpg")
            assert False, "expected 404 before first publish"
        except urllib.error.HTTPError as e:
            assert e.code == 404

        img = np.full((64, 96, 3), 128, np.uint8)
        tags = {3: [(10.0, 10.0), (30.0, 10.0), (30.0, 30.0), (10.0, 30.0)]}
        stream.publish(img, tags=tags)

        status, headers, body = _get(port, "/latest.jpg")
        assert status == 200 and body[:2] == b"\xff\xd8"  # JPEG magic

        status, _, body = _get(port, "/state.json")
        state = json.loads(body)
        assert state["frame"] == 1 and state["tags"] == [3]
        assert state["n_tags"] == 1

        # one multipart chunk from the stream
        req = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stream.mjpg", timeout=10
        )
        assert "multipart/x-mixed-replace" in req.headers["Content-Type"]
        head = req.read(8)
        assert head == b"--frame\r"
        req.close()
    finally:
        stream.stop()
