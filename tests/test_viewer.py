"""LiveViewer: the headless render('human') equivalent (MJPEG server).

Reference parity target: simulator.py::render(mode='human') opens a live
window repainted every step (SURVEY.md §3.5); on a headless TPU host the
rebuild streams the frame to a browser instead. These tests exercise the
HTTP surface end-to-end with a real client.
"""
import io
import urllib.request

import numpy as np
import pytest


@pytest.fixture()
def viewer():
    from dtown.utils.viewer import LiveViewer

    v = LiveViewer(port=0)
    yield v
    v.close()


def _get(port, path, timeout=5):
    return urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=timeout)


def test_snapshot_roundtrip(viewer):
    from PIL import Image

    frame = np.zeros((32, 48, 3), np.uint8)
    frame[:, :, 0] = 200  # red-ish
    viewer.update(frame, caption="hello")

    with _get(viewer.port, "/frame.jpg") as r:
        assert r.headers["Content-Type"] == "image/jpeg"
        img = np.asarray(Image.open(io.BytesIO(r.read())))
    assert img.shape == (32, 48, 3)
    # JPEG is lossy; the dominant channel must survive
    assert img[..., 0].mean() > 150 and img[..., 1].mean() < 60

    with _get(viewer.port, "/caption") as r:
        assert r.read().decode() == "hello"


def test_index_page_and_404(viewer):
    viewer.update(np.zeros((8, 8), np.uint8))  # grayscale accepted
    with _get(viewer.port, "/") as r:
        body = r.read().decode()
    assert "/stream" in body
    try:
        _get(viewer.port, "/nope")
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_mjpeg_stream_delivers_updates(viewer):
    import threading

    frame = np.full((16, 16, 3), 10, np.uint8)
    viewer.update(frame)
    r = _get(viewer.port, "/stream")
    assert "multipart/x-mixed-replace" in r.headers["Content-Type"]

    # push a second frame shortly after so the stream has two parts
    t = threading.Timer(
        0.2, viewer.update, args=(np.full((16, 16, 3), 240, np.uint8),))
    t.start()
    data = b""
    while data.count(b"--frame") < 2:
        chunk = r.read1(65536)
        assert chunk, "stream ended early"
        data += chunk
    t.join()
    assert data.count(b"Content-Type: image/jpeg") >= 2
