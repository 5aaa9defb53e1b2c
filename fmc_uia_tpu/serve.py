"""HTTP model server: REST front-end over the StreamingPredictor batcher.

The reference README's table of contents promises an "Inference & Docker"
section that its body never delivers (reference README.md:16; SURVEY.md §0).
``predict.py`` covers the offline half (dataset -> challenge-format files);
this module is the online half: a dependency-free (stdlib ``http.server``)
REST endpoint over the micro-batching :class:`~fmc_uia_tpu.serving.
StreamingPredictor`, suitable for the challenge's containerized submission
flow (Dockerfile) and for production serving behind any HTTP load balancer.

    python -m fmc_uia_tpu.serve --checkpoint outputs/exp_... --port 8000

API:
  GET  /healthz               liveness + device backend + task count
  GET  /v1/tasks              task registry: id, type, num_classes
  GET  /v1/stats              request counters + micro-batch dispatch stats
  POST /v1/predict/<task_id>  body = encoded image bytes (PNG/JPEG/BMP)
        segmentation   -> image/png class-id mask at the ORIGINAL resolution
        classification -> {"class": k}
        detection      -> {"x_min","y_min","x_max","y_max"} pixel coords
        Regression     -> {"points": [[x, y], ...]} pixel coords

Each client request runs on its own server thread (ThreadingHTTPServer):
decode + resize happen host-side per thread, then the request joins the
per-task queue where the dispatcher coalesces concurrent requests into
fixed-shape padded micro-batches for the device (serving.py) — the TPU
never sees a ragged shape, so serving is recompile-free after warmup.
"""

from __future__ import annotations

import json
import threading
import time
from collections import Counter
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Tuple

import numpy as np

from fmc_uia_tpu.data.dataset import _resize_image
from fmc_uia_tpu.serving import StreamingPredictor
from fmc_uia_tpu.tasks import (
    CLASSIFICATION,
    DETECTION,
    REGRESSION,
    SEGMENTATION,
    TaskRegistry,
)

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    import io

    from PIL import Image

    _HAS_CV2 = False


def _decode_image_bytes(data: bytes) -> Optional[np.ndarray]:
    """Encoded image bytes -> RGB uint8 HWC, None on failure."""
    try:
        if _HAS_CV2:
            img = cv2.imdecode(np.frombuffer(data, np.uint8),
                               cv2.IMREAD_COLOR)
            if img is None:
                return None
            return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        with Image.open(io.BytesIO(data)) as im:  # pragma: no cover
            return np.asarray(im.convert("RGB"))
    except Exception:
        return None


def _encode_mask_png(mask: np.ndarray) -> bytes:
    if _HAS_CV2:
        ok, buf = cv2.imencode(".png", mask.astype(np.uint8))
        if not ok:  # pragma: no cover - imencode on uint8 2D can't fail
            raise RuntimeError("PNG encode failed")
        return bytes(buf.tobytes())
    out = io.BytesIO()  # pragma: no cover
    Image.fromarray(mask.astype(np.uint8)).save(out, format="PNG")
    return out.getvalue()  # pragma: no cover


def _resize_mask(mask: np.ndarray, h: int, w: int) -> np.ndarray:
    if mask.shape[:2] == (h, w):
        return mask
    if _HAS_CV2:
        return cv2.resize(mask.astype(np.uint8), (w, h),
                          interpolation=cv2.INTER_NEAREST)
    return np.asarray(Image.fromarray(  # pragma: no cover
        mask.astype(np.uint8)).resize((w, h), Image.NEAREST))


class ServingApp:
    """Model + batcher + counters; shared by all handler threads."""

    def __init__(self, model, params, registry: TaskRegistry, mean, std,
                 image_size: int, max_batch: int = 16,
                 max_delay_ms: float = 5.0, autoscale: bool = True,
                 request_timeout_s: float = 120.0):
        self.registry = registry
        self.image_size = int(image_size)
        self.request_timeout_s = float(request_timeout_s)
        self.service = StreamingPredictor(
            model, params, registry, mean, std, image_size,
            max_batch=max_batch, max_delay_ms=max_delay_ms,
            autoscale=autoscale)
        self.started = time.time()
        self.counters: Counter = Counter()
        self._lock = threading.Lock()

    def count(self, key: str) -> None:
        with self._lock:
            self.counters[key] += 1

    def close(self) -> None:
        self.service.close()

    # -- request handling ---------------------------------------------------
    def predict(self, task_id: str, body: bytes
                ) -> Tuple[int, str, bytes]:
        """-> (http_status, content_type, payload)."""
        if task_id not in self.registry:
            self.count("bad_task")
            return (404, "application/json", json.dumps(
                {"error": f"unknown task_id {task_id!r}"}).encode())
        img = _decode_image_bytes(body)
        if img is None:
            self.count("bad_image")
            return (400, "application/json",
                    b'{"error": "could not decode image body"}')
        oh, ow = img.shape[:2]
        resized = _resize_image(img, self.image_size)
        fut = self.service.submit(resized, task_id)
        pred = fut.result(timeout=self.request_timeout_s)
        spec = self.registry[task_id]
        self.count(f"ok_{spec.task_name}")
        if spec.task_name == SEGMENTATION:
            png = _encode_mask_png(_resize_mask(np.asarray(pred), oh, ow))
            return (200, "image/png", png)
        if spec.task_name == CLASSIFICATION:
            return (200, "application/json",
                    json.dumps({"class": int(pred)}).encode())
        if spec.task_name == DETECTION:
            box = np.asarray(pred, np.float64)
            return (200, "application/json", json.dumps({
                "x_min": float(box[0] * ow), "y_min": float(box[1] * oh),
                "x_max": float(box[2] * ow), "y_max": float(box[3] * oh),
            }).encode())
        pts = np.asarray(pred, np.float64)[: spec.num_classes * 2]
        coords = [[float(pts[2 * k] * ow), float(pts[2 * k + 1] * oh)]
                  for k in range(spec.num_classes)]
        return (200, "application/json",
                json.dumps({"points": coords}).encode())

    def tasks_payload(self) -> bytes:
        rows = [{"task_id": t, "task_type": self.registry[t].task_name,
                 "num_classes": int(self.registry[t].num_classes)}
                for t in self.registry.task_ids]
        return json.dumps(rows).encode()

    def stats_payload(self) -> bytes:
        svc = self.service.stats
        return json.dumps({
            "uptime_s": round(time.time() - self.started, 3),
            "requests": dict(self.counters),
            "dispatches": svc["dispatches"],
            "pad_images": svc["pad_images"],
            "by_batch_size": {str(k): v
                              for k, v in sorted(svc["by_size"].items())},
        }).encode()

    def health_payload(self) -> bytes:
        import jax

        return json.dumps({"ok": True,
                           "backend": jax.default_backend(),
                           "image_size": self.image_size,
                           "tasks": len(self.registry)}).encode()


def _make_handler(app: ServingApp):
    class Handler(BaseHTTPRequestHandler):
        # one TCP connection can carry many requests
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, status: int, ctype: str, payload: bytes) -> None:
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):  # noqa: N802 (stdlib API name)
            if self.path == "/healthz":
                self._send(200, "application/json", app.health_payload())
            elif self.path == "/v1/tasks":
                self._send(200, "application/json", app.tasks_payload())
            elif self.path == "/v1/stats":
                self._send(200, "application/json", app.stats_payload())
            else:
                self._send(404, "application/json",
                           b'{"error": "not found"}')

        def do_POST(self):  # noqa: N802
            prefix = "/v1/predict/"
            if not self.path.startswith(prefix):
                self._send(404, "application/json",
                           b'{"error": "not found"}')
                return
            task_id = self.path[len(prefix):]
            length = int(self.headers.get("Content-Length") or 0)
            if length <= 0:
                self._send(411, "application/json",
                           b'{"error": "Content-Length required"}')
                return
            body = self.rfile.read(length)
            try:
                status, ctype, payload = app.predict(task_id, body)
            except Exception as e:  # device/timeout failure
                app.count("server_error")
                status, ctype = 500, "application/json"
                payload = json.dumps({"error": str(e)}).encode()
            self._send(status, ctype, payload)

    return Handler


def make_server(app: ServingApp, host: str = "0.0.0.0",
                port: int = 8000) -> ThreadingHTTPServer:
    """Bind (but don't start) the HTTP server; port 0 picks a free port."""
    server = ThreadingHTTPServer((host, port), _make_handler(app))
    server.daemon_threads = True
    return server


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(
        description="Serve the multi-task model over HTTP")
    parser.add_argument("--config", type=str, default=None,
                        help="config path; defaults to the experiment "
                             "dir's config.yaml snapshot")
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="experiment dir containing best_model/")
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--max-batch", type=int, default=16)
    parser.add_argument("--max-delay-ms", type=float, default=5.0)
    parser.add_argument("--no-autoscale", action="store_true",
                        help="always pad micro-batches to --max-batch")
    parser.add_argument("--no-warmup", action="store_true",
                        help="skip precompiling the predict programs")
    args = parser.parse_args(argv)

    import os

    import jax

    from fmc_uia_tpu import checkpoint as ckpt_lib
    from fmc_uia_tpu.config import load_config
    from fmc_uia_tpu.models import build_model
    from fmc_uia_tpu.models.multitask import init_variables
    from fmc_uia_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    config_path = args.config
    if config_path is None:
        config_path = os.path.join(args.checkpoint, "config.yaml")
        if not os.path.exists(config_path):
            raise FileNotFoundError(
                f"No --config given and {config_path} not found")
    config = load_config(config_path)
    registry = TaskRegistry.from_config(config)
    model = build_model(config, registry)
    variables = init_variables(model, jax.random.PRNGKey(0),
                               config.image_size, 1)
    params = ckpt_lib.load_best_params(args.checkpoint, variables["params"])

    app = ServingApp(
        model, params, registry,
        config.get("data.augmentation.normalize.mean"),
        config.get("data.augmentation.normalize.std"),
        config.image_size, max_batch=args.max_batch,
        max_delay_ms=args.max_delay_ms, autoscale=not args.no_autoscale)
    if not args.no_warmup:
        print("warmup: precompiling predict programs ...", flush=True)
        app.service.warmup()
    server = make_server(app, args.host, args.port)
    print(f"serving {len(registry)} tasks on "
          f"http://{args.host}:{server.server_address[1]}", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:  # pragma: no cover
        pass
    finally:
        server.shutdown()
        app.close()


if __name__ == "__main__":
    main()
