"""HTTP inference server (the reference's cog `predict.py` deployment
surface as a self-contained stdlib server).

The reference serves through cog's HTTP wrapper around
`Detic/predict.py:30-97` (setup() builds the model once, predict() runs
per request). Here a `ThreadingHTTPServer` wraps `EmbodiedPredictor`:

  GET  /healthz            -> {"status": "ok"}
  POST /predict            body {"image": [[...rgb u8...]],
                                 "proj_indices": optional [H,W] ints,
                                 "reset_memory": optional bool}
                           -> {"boxes": [[x1,y1,x2,y2]...], "scores": [...],
                               "classes": [...]}
  POST /set_vocabulary     body {"zs_weight": [[...]], "names": [...]}

Memory persists across /predict calls (the streaming-robot contract,
demo/predictor.py) until reset_memory.

Run: python -m embodied_object_detection_tpu.serve.server --port 8080
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

__all__ = ["make_server", "PredictHandler"]


def make_server(predictor, host: str = "127.0.0.1", port: int = 8080
                ) -> ThreadingHTTPServer:
    """Build (not start) the server; call .serve_forever() or use
    threading for tests. The predictor is EmbodiedPredictor-compatible:
    callable(image, proj_indices=None) -> Detections, plus
    reset_memory() and set_vocabulary(zs_weight, names)."""
    lock = threading.Lock()  # one device stream; serialize inference

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _reply(self, code: int, payload: dict):
            blob = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok"})
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            replied = False

            def reply(code, payload):
                nonlocal replied
                self._reply(code, payload)
                replied = True

            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/predict":
                    image = np.asarray(body["image"], np.float32)
                    proj = body.get("proj_indices")
                    proj = None if proj is None else np.asarray(proj,
                                                                np.int32)
                    with lock:
                        if body.get("reset_memory"):
                            predictor.reset_memory()
                        dets = predictor(image, proj_indices=proj)
                    valid = np.asarray(dets.valid)
                    reply(200, {
                        "boxes": np.asarray(dets.boxes)[valid].tolist(),
                        "scores": np.asarray(dets.scores)[valid].tolist(),
                        "classes": np.asarray(dets.classes)[valid].tolist(),
                    })
                elif self.path == "/set_vocabulary":
                    zs = np.asarray(body["zs_weight"], np.float32)
                    with lock:
                        predictor.set_vocabulary(zs, body.get("names"))
                    reply(200, {"num_classes": int(zs.shape[1] - 1)})
                else:
                    reply(404, {"error": "not found"})
            except (KeyError, ValueError, TypeError) as e:
                # malformed request
                if not replied:
                    self._reply(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:
                # server-side failure; never write a second status line
                if not replied:
                    self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)


def main(argv: Optional[list] = None) -> int:  # pragma: no cover
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--weights", default=None)
    p.add_argument("--opts", nargs="*", default=[])
    args = p.parse_args(argv)

    from embodied_object_detection_tpu.config import (DetectorConfig,
                                                      apply_opts)
    from embodied_object_detection_tpu.demo.predictor import (
        EmbodiedPredictor)
    cfg = apply_opts(DetectorConfig(), args.opts)
    params = None
    zs_weight = None
    if args.weights:
        import jax
        import jax.numpy as jnp
        from embodied_object_detection_tpu.convert.torch_weights import (
            load_torch_checkpoint, verify_against_model)
        from embodied_object_detection_tpu.models.detector import (
            build_detector)
        _, init_params = build_detector(cfg)
        # the checkpoint's own zs_weight buffer IS the classifier it was
        # trained against (D x C+1, normalized) — dropping it would serve
        # sigmoid(0)=0.5 garbage for every class until /set_vocabulary
        converted, zs_weight = load_torch_checkpoint(args.weights)
        missing, extra, mismatch = verify_against_model(converted,
                                                        init_params)
        if missing or mismatch:
            raise SystemExit(
                f"checkpoint {args.weights} does not match the model: "
                f"{len(missing)} missing / {len(mismatch)} mismatched")
        params = jax.tree_util.tree_map(jnp.asarray,
                                        {"params": converted["params"]})
    if zs_weight is None:
        print("WARNING: no classifier loaded (checkpoint had no zs_weight "
              "buffer or no --weights given); /predict returns garbage "
              "until a client POSTs /set_vocabulary")
    predictor = EmbodiedPredictor(cfg, params=params, zs_weight=zs_weight)
    server = make_server(predictor, args.host, args.port)
    print(f"serving on http://{args.host}:{args.port}")
    server.serve_forever()
    return 0


if __name__ == "__main__":  # pragma: no cover
    import sys
    sys.exit(main())
