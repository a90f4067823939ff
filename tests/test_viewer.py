"""Viewer server tests: page HTML + JPEG frame rendering via live HTTP.

The reference's equivalent component is the ImGui display window
(app/display.{h,cpp}); here it's a stateless HTTP render server, so it can
be tested headlessly end-to-end.
"""

import io
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from luisacomputegaussiansplatting_tpu.apps.viewer import (
    ViewerServer,
    make_handler,
)
from luisacomputegaussiansplatting_tpu.config import RenderConfig
from luisacomputegaussiansplatting_tpu.io.synthetic import create_cube_scene


@pytest.fixture(scope="module")
def viewer():
    scene = create_cube_scene(nx=4)
    srv = ViewerServer(
        scene,
        width=96,
        height=64,
        cfg=RenderConfig(max_pairs=50_000),
        name="cube",
        init_pos=(3.0, -2.5, 2.0),
        init_target=(0.0, 0.0, 0.0),
        world_up=(0.0, 0.0, 1.0),
        fov=70.0,
    )
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def test_page_served(viewer):
    with urllib.request.urlopen(viewer + "/") as r:
        body = r.read().decode()
    assert r.status == 200
    assert "lcgs-tpu viewer" in body
    assert "/frame?" in body  # the JS render loop


def test_frame_renders(viewer):
    from PIL import Image

    url = (
        viewer
        + "/frame?pos=3,-2.5,2&front=-0.66,0.55,-0.44&up=0,0,1"
        + "&fov=70&bg=%23000000"
    )
    with urllib.request.urlopen(url) as r:
        data = r.read()
    assert r.headers["Content-Type"] == "image/jpeg"
    img = np.asarray(Image.open(io.BytesIO(data)))
    assert img.shape == (64, 96, 3)
    assert img.mean() > 1.0  # the cube is visible, not a black frame


def test_bg_color_applied(viewer):
    from PIL import Image

    # camera looking away from the scene: frame == background colour
    url = (
        viewer
        + "/frame?pos=50,50,50&front=0.577,0.577,0.577&up=0,0,1"
        + "&fov=70&bg=%23ff0000"
    )
    with urllib.request.urlopen(url) as r:
        img = np.asarray(Image.open(io.BytesIO(r.read())))
    assert img[..., 0].mean() > 200  # red
    assert img[..., 1].mean() < 30  # no green


def test_bad_query_is_400_not_crash(viewer):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(viewer + "/frame?pos=1,2")
    assert ei.value.code == 400
    # server still alive afterwards
    with urllib.request.urlopen(viewer + "/") as r:
        assert r.status == 200
