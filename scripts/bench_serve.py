"""Serving-path benchmark: latency + throughput of the HTTP sampling server.

The reference's only inference surface is a one-shot PNG script
(ref:src/v2/generation.py:26-60) — it has no serving story to compare
against, so this measures OUR server against its own design goals:

- interactive latency: seeded single-batch POST /sample, p50/p95/p99 over
  the full HTTP + device + PNG/npy encode path;
- coalescing: K concurrent small unseeded requests must share device calls
  (16 x n=4 should cost ~1 generator call, not 16);
- priority: interactive p95 while a long batch-priority request is in
  flight must stay near the unloaded p95 (the PriorityGate admits
  interactive between the batch request's device calls);
- sustained throughput: images/sec over back-to-back batch requests.

Latencies here are honest by construction: every device call inside the
service ends in ``np.asarray`` (serve.py:_generate), i.e. a full host
readback — the axon block_until_ready gotcha cannot inflate these numbers.

Usage: SCRATCH=... python scripts/bench_serve.py [family] [batch] [out.json]
"""

import concurrent.futures as cf
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vitgan_tpu.ops.policy import enable_persistent_compilation_cache  # noqa: E402

enable_persistent_compilation_cache()

import jax  # noqa: E402

if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
    # This image's site customization force-registers the TPU platform even
    # when JAX_PLATFORMS=cpu is set; honor the explicit request (cli.py:380).
    jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402


def _build_server(family: str, batch: int):
    """A SamplerService over a FRESH (untrained) state — weights don't change
    the cost of the sampling path, and this keeps the bench self-contained."""
    from http.server import ThreadingHTTPServer

    from vitgan_tpu import config as C
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.ops.policy import apply_from_runtime
    from vitgan_tpu.serve import SamplerService, _make_handler
    from vitgan_tpu.train import create_train_state

    cfg = C.ExperimentConfig(family=family, data=C.DataConfig(dataset="synthetic"))
    apply_from_runtime(cfg.runtime)
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    svc = SamplerService(cfg, gan, state.g_vars_ema or state.g_vars, batch=batch)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(svc))
    httpd.services = {"default": svc}
    return httpd, svc


def _post(port: int, body: dict) -> tuple[float, bytes]:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/sample", method="POST",
        data=json.dumps(body).encode(), headers={"Content-Type": "application/json"})
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=600) as r:
        data = r.read()
    return time.perf_counter() - t0, data


def _pcts(xs) -> dict:
    a = np.asarray(xs) * 1e3
    return {"p50_ms": round(float(np.percentile(a, 50)), 1),
            "p95_ms": round(float(np.percentile(a, 95)), 1),
            "p99_ms": round(float(np.percentile(a, 99)), 1),
            "mean_ms": round(float(a.mean()), 1)}


def main():
    family = sys.argv[1] if len(sys.argv) > 1 else "v2"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    httpd, svc = _build_server(family, batch)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    result = {"family": family, "batch": batch,
              "device": str(jax.devices()[0].device_kind)}
    try:
        # Untimed warmers: first readback (axon sync), PNG + npy encode paths.
        _post(port, {"n": batch, "seed": 0})
        _post(port, {"n": 4, "format": "npy"})

        # 1) Interactive latency: seeded one-batch PNG requests, sequential.
        lats = [_post(port, {"n": batch, "seed": i})[0] for i in range(30)]
        result["interactive_seeded_png"] = _pcts(lats)

        # 2) Small-request latency (n=4, npy — minimal encode cost).
        lats4 = [_post(port, {"n": 4, "seed": i, "format": "npy"})[0]
                 for i in range(30)]
        result["interactive_n4_npy"] = _pcts(lats4)

        # 3) Coalescing: 16 concurrent unseeded n=4 -> device calls consumed.
        svc._pool = np.zeros((0,), np.uint8)  # drop leftovers for a clean count
        calls0 = svc._device_calls
        with cf.ThreadPoolExecutor(16) as ex:
            lat_c = list(ex.map(
                lambda i: _post(port, {"n": 4, "format": "npy"})[0], range(16)))
        used = svc._device_calls - calls0
        ideal = int(np.ceil(16 * 4 / batch))
        result["coalescing"] = {
            "concurrent_requests": 16, "images_each": 4,
            "device_calls_used": used, "device_calls_ideal": ideal,
            "latency": _pcts(lat_c)}

        # 4) Priority under load: one long batch-priority request (16 batches)
        #    with interactive seeded requests arriving during it.  Each
        #    interactive sample records its (start, end) wall times; only
        #    samples fully inside the batch request's [post, done] window
        #    count — edge samples that ran partly unloaded would bias the
        #    loaded percentiles optimistically.
        recs, stop = [], threading.Event()

        def _interactive_loop():
            i = 0
            while not stop.is_set():
                t_s = time.perf_counter()
                lat = _post(port, {"n": 4, "seed": 1000 + i, "format": "npy"})[0]
                recs.append((t_s, t_s + lat, lat))
                i += 1

        t = threading.Thread(target=_interactive_loop, daemon=True)
        t.start()
        t0 = time.perf_counter()
        _post(port, {"n": 16 * batch, "seed": 7, "priority": "batch",
                     "format": "npy"})
        t1 = time.perf_counter()
        stop.set()
        t.join(timeout=600)
        inter_lat = [lat for t_s, t_e, lat in recs if t_s >= t0 and t_e <= t1]
        result["priority_under_load"] = {
            "batch_request_images": 16 * batch,
            "batch_request_seconds": round(t1 - t0, 2),
            "interactive_requests_completed_during": len(inter_lat),
            "interactive_latency_during": _pcts(inter_lat) if inter_lat else None}

        # 5) Sustained throughput: back-to-back seeded full-batch npy requests
        #    from ONE sequential client (device idles during host encode) ...
        n_reqs, t0 = 20, time.perf_counter()
        for i in range(n_reqs):
            _post(port, {"n": batch, "seed": i, "format": "npy"})
        dt = time.perf_counter() - t0
        result["sustained"] = {
            "images_per_sec": round(n_reqs * batch / dt, 1),
            "requests_per_sec": round(n_reqs / dt, 2)}

        # ... and from 4 concurrent clients: host-side encode of one request
        #    overlaps the device call of the next (the PriorityGate serializes
        #    only the device entry point), so this is the pipelined capacity.
        n_reqs, t0 = 20, time.perf_counter()
        with cf.ThreadPoolExecutor(4) as ex:
            list(ex.map(lambda i: _post(port, {"n": batch, "seed": i,
                                               "format": "npy"}), range(n_reqs)))
        dt = time.perf_counter() - t0
        result["sustained_concurrent4"] = {
            "images_per_sec": round(n_reqs * batch / dt, 1),
            "requests_per_sec": round(n_reqs / dt, 2)}
    finally:
        httpd.shutdown()

    print(json.dumps(result, indent=2))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
