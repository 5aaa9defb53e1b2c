"""HTTP serving front-end: routes, content types, pixel-space outputs."""

import copy
import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from fmc_uia_tpu.config import Config
from fmc_uia_tpu.models import build_model
from fmc_uia_tpu.models.multitask import init_variables
from fmc_uia_tpu.serve import ServingApp, _decode_image_bytes, make_server
from fmc_uia_tpu.tasks import TaskRegistry
from tests.helpers import TINY_CONFIG

S = 64
OH, OW = 96, 80  # original image size: different from model size on purpose


def _encode_png(img: np.ndarray) -> bytes:
    try:
        import cv2

        ok, buf = cv2.imencode(".png",
                               cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        assert ok
        return bytes(buf.tobytes())
    except ImportError:  # pragma: no cover
        import io

        from PIL import Image

        out = io.BytesIO()
        Image.fromarray(img).save(out, format="PNG")
        return out.getvalue()


@pytest.fixture(scope="module")
def server_url():
    cfg = Config(config_dict=copy.deepcopy(TINY_CONFIG))
    reg = TaskRegistry.from_config(cfg)
    model = build_model(cfg, reg)
    variables = init_variables(model, jax.random.PRNGKey(0), S, 2)
    app = ServingApp(model, variables["params"], reg,
                     mean=[0.33] * 3, std=[0.18] * 3, image_size=S,
                     max_batch=4, max_delay_ms=5.0)
    server = make_server(app, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    app.close()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def _post(url, body):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=240) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_health_and_tasks(server_url):
    status, ctype, body = _get(server_url + "/healthz")
    assert status == 200 and ctype == "application/json"
    health = json.loads(body)
    assert health["ok"] and health["tasks"] == 6

    status, _, body = _get(server_url + "/v1/tasks")
    rows = json.loads(body)
    assert {r["task_id"] for r in rows} == {
        "T2A_organ_a", "T2B_organ_b", "T1_planes", "T3_lesion",
        "T4_box", "T5_points"}


def test_predict_each_type_and_stats(server_url):
    rng = np.random.RandomState(0)
    img = _encode_png(rng.randint(0, 255, (OH, OW, 3), dtype=np.uint8))

    # segmentation: PNG mask at the ORIGINAL (OH, OW) resolution
    status, ctype, body = _post(
        server_url + "/v1/predict/T2A_organ_a", img)
    assert status == 200 and ctype == "image/png"
    mask = _decode_image_bytes(body)
    assert mask is not None and mask.shape[:2] == (OH, OW)

    status, ctype, body = _post(server_url + "/v1/predict/T1_planes", img)
    assert status == 200 and ctype == "application/json"
    assert 0 <= json.loads(body)["class"] < 3

    status, _, body = _post(server_url + "/v1/predict/T4_box", img)
    box = json.loads(body)
    assert set(box) == {"x_min", "y_min", "x_max", "y_max"}
    # pixel space of the original image
    assert -OW <= box["x_min"] <= 2 * OW

    status, _, body = _post(server_url + "/v1/predict/T5_points", img)
    pts = json.loads(body)["points"]
    assert len(pts) == 2 and len(pts[0]) == 2

    _, _, body = _get(server_url + "/v1/stats")
    stats = json.loads(body)
    assert stats["dispatches"] >= 4
    assert stats["requests"]["ok_segmentation"] >= 1


def test_concurrent_requests_batch(server_url):
    rng = np.random.RandomState(1)
    img = _encode_png(rng.randint(0, 255, (S, S, 3), dtype=np.uint8))
    results = [None] * 8

    def call(i):
        results[i] = _post(server_url + "/v1/predict/T1_planes", img)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=240)
    assert all(r is not None and r[0] == 200 for r in results)


def test_errors(server_url):
    img = _encode_png(np.zeros((S, S, 3), np.uint8))
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server_url + "/v1/predict/nope", img)
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server_url + "/v1/predict/T1_planes", b"not an image")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server_url + "/nope")
    assert e.value.code == 404
