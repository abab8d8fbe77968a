"""Batched sampling server: serve a trained generator over HTTP.

The reference's only inference surface is a script that writes one PNG grid
(ref:src/v2/generation.py:26-60).  This is the production-shaped equivalent:
a long-lived process that keeps the generator jitted and the params resident
on the TPU, amortizing compilation across requests and batching every request
to one fixed device shape (no retraces, no shape churn).

Endpoints (stdlib http.server — zero new dependencies):

- ``GET  /healthz``            -> JSON model/run info + service counters
- ``GET  /metrics``            -> OpenMetrics text (requests/images/device
  calls/sample seconds) for scrape-based monitoring
- ``POST /sample``             -> body {"n": int, "seed": int?, "model": str?,
  "format": "png"|"npy", "priority": "interactive"|"batch"|int}
  returns an image grid (image/png) or raw [-1,1] float32 samples
  (application/octet-stream, .npy bytes; 8-bit quantized — the device ships
  uint8 over the tunnel and the host dequantizes).  ``n`` is served by slicing one or
  more fixed-batch generator calls, so arbitrary n never recompiles; seeded
  requests are reproducible, unseeded requests coalesce into shared batches
  (see SamplerService).

Scheduling: device access goes through a priority gate, not a FIFO lock —
"interactive" (default, 0) beats "batch" (10), lower value wins, FIFO within
a class.  Multi-call requests re-enter the gate between device calls, so a
queued interactive request preempts a long batch request at fixed-batch
granularity instead of waiting for all of it.

Start:  python -m vitgan_tpu.cli serve --run-dir <run> --port 8000
"""

from __future__ import annotations

import heapq
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Union

import jax
import numpy as np

PRIORITY_CLASSES = {"interactive": 0, "batch": 10}


def parse_priority(value: Union[str, int, None]) -> int:
    """'interactive' | 'batch' | int -> numeric priority (lower wins)."""
    if value is None:
        return PRIORITY_CLASSES["interactive"]
    if isinstance(value, str):
        if value in PRIORITY_CLASSES:
            return PRIORITY_CLASSES[value]
        raise ValueError(f"unknown priority {value!r} "
                         f"(have: {sorted(PRIORITY_CLASSES)} or an int)")
    return int(value)


class PriorityGate:
    """A lock whose waiters acquire in (priority, arrival) order.

    ``threading.Lock`` wakes an arbitrary waiter; this gate keeps a heap of
    waiting tickets and admits the smallest — so an interactive request queued
    behind ten batch requests runs next, not eleventh."""

    def __init__(self):
        self._cond = threading.Condition()
        self._held = False
        self._waiting: list = []
        self._seq = 0

    def acquire(self, priority: int = 0) -> float:
        """Block until first in line; returns seconds spent waiting."""
        t0 = time.perf_counter()
        with self._cond:
            ticket = (priority, self._seq)
            self._seq += 1
            heapq.heappush(self._waiting, ticket)
            while self._held or self._waiting[0] != ticket:
                self._cond.wait()
            heapq.heappop(self._waiting)
            self._held = True
        return time.perf_counter() - t0

    def release(self) -> None:
        with self._cond:
            self._held = False
            self._cond.notify_all()

    class _Section:
        def __init__(self, gate, priority):
            self.gate, self.priority = gate, priority

        def __enter__(self):
            self.gate.acquire(self.priority)
            return self

        def __exit__(self, *exc):
            self.gate.release()

    def held(self, priority: int = 0) -> "PriorityGate._Section":
        return PriorityGate._Section(self, priority)


def _dequant(u8: np.ndarray) -> np.ndarray:
    """uint8 wire format -> [-1,1] float32 (inverse of the on-device
    quantization in make_serve_sample_fn)."""
    return u8.astype(np.float32) / 127.5 - 1.0


class SamplerService:
    """Thread-safe batched sampler around a restored train state.

    Seeded requests are reproducible: ``sample(n, seed)`` always derives its
    latents from PRNGKey(seed) alone, one fixed-shape generator call per
    ``batch`` images.  Unseeded requests COALESCE: they draw slices from a
    shared pool that is refilled one fixed batch at a time, so many small
    concurrent requests share device calls (e.g. 16 concurrent n=4 requests
    cost one generator call, not 16)."""

    def __init__(self, cfg, gan, g_vars, batch: int = 64,
                 quantize: Optional[str] = None):
        from vitgan_tpu.train import make_serve_sample_fn
        from vitgan_tpu.utils.quantize import maybe_quantize, quantized_bytes

        self.cfg = cfg
        self.gan = gan
        # Weight-only int8 (utils/quantize.py): 4x less upload + 4x less HBM
        # weight traffic per call; dequantization is fused inside the jitted
        # sampler.  quantize=None keeps the native float weights.
        self.g_vars = maybe_quantize(g_vars, quantize)
        self.quantize = quantize or "none"
        self.weight_bytes = quantized_bytes(self.g_vars)[0]
        self.batch = batch
        # ONE device dispatch per batch: PRNG, latents, generator forward and
        # the [-1,1]->uint8 quantization all run inside a single jitted call
        # (make_serve_sample_fn) — on the tunneled platform every extra
        # host<->device round trip costs ~5 ms, and uint8 output moves 4x
        # fewer bytes than float32 over the ~22 MB/s link.
        self._sample = make_serve_sample_fn(gan, cfg, batch)
        # One device user at a time, admitted in (priority, arrival) order.
        self._gate = PriorityGate()
        self._stats_lock = threading.Lock()
        self._counter = 0
        self._device_calls = 0
        self._images_served = 0
        self._sample_seconds = 0.0
        self._by_class = {name: {"requests": 0, "wait_seconds": 0.0}
                          for name in PRIORITY_CLASSES}
        self._pool = np.zeros((0,), np.uint8)  # leftover unseeded samples (u8)
        # Unseeded refills draw from fold_in(PRNGKey(-0x5E11), counter).  The
        # seed is NEGATIVE: client seeds are validated to [0, 2^31), so the
        # pool stream can never collide with any seeded request's stream.
        self._pool_seed = -0x5E11
        self._pool_calls = 0
        # Warm the compile AND force a full host readback so the first
        # request is fast (np.asarray also covers the axon sync gotcha).
        np.asarray(self._sample(g_vars, 0, 0))

    def info(self) -> dict:
        m = self.cfg.model
        return {
            "family": self.cfg.family,
            "image_size": m.image_size,
            "channels": m.channels,
            "batch": self.batch,
            "quantize": self.quantize,
            "weight_bytes": self.weight_bytes,
            "device": str(jax.devices()[0]),
            "requests_served": self._counter,
            "images_served": self._images_served,
            "device_calls": self._device_calls,
        }

    def metrics_text(self, label: str = "") -> str:
        """OpenMetrics/Prometheus exposition of the service counters."""
        tag = f'{{model="{label}"}}' if label else ""
        lines = [
            "# TYPE vitgan_requests_served counter",
            f"vitgan_requests_served{tag} {self._counter}",
            "# TYPE vitgan_images_served counter",
            f"vitgan_images_served{tag} {self._images_served}",
            "# TYPE vitgan_device_calls counter",
            f"vitgan_device_calls{tag} {self._device_calls}",
            "# TYPE vitgan_sample_seconds counter",
            f"vitgan_sample_seconds{tag} {self._sample_seconds:.6f}",
        ]
        for cls, st in self._by_class.items():
            ptag = (tag[:-1] + f',priority="{cls}"}}') if tag else f'{{priority="{cls}"}}'
            lines += [
                "# TYPE vitgan_priority_requests counter",
                f"vitgan_priority_requests{ptag} {st['requests']}",
                "# TYPE vitgan_priority_wait_seconds counter",
                f"vitgan_priority_wait_seconds{ptag} {st['wait_seconds']:.6f}",
            ]
        return "\n".join(lines) + "\n"

    def _note_request(self, priority: int, waited: float, images: int) -> None:
        cls = "interactive" if priority <= PRIORITY_CLASSES["interactive"] else "batch"
        with self._stats_lock:
            self._counter += 1
            self._images_served += images
            self._by_class[cls]["requests"] += 1
            self._by_class[cls]["wait_seconds"] += waited

    def _generate(self, seed: int, call: int) -> np.ndarray:
        """One fixed-shape generator call (the only device entry point):
        a single dispatch, uint8 over the wire.  Returns the RAW uint8 batch —
        dequantization is host CPU math and happens outside the device gate
        (see :func:`_dequant`), so under concurrency it overlaps the next
        request's device call instead of serializing behind the gate."""
        t0 = time.perf_counter()
        u8 = np.asarray(self._sample(self.g_vars, seed, call))
        self._sample_seconds += time.perf_counter() - t0
        self._device_calls += 1
        return u8

    def sample(self, n: int, seed: Optional[int] = None,
               priority: Union[str, int, None] = None) -> np.ndarray:
        """n images in [-1,1] float32 (8-bit-quantized values — the wire
        format is uint8); seeded => reproducible, unseeded => coalesced."""
        return _dequant(self.sample_quantized(n, seed, priority))

    def sample_quantized(self, n: int, seed: Optional[int] = None,
                         priority: Union[str, int, None] = None) -> np.ndarray:
        """n images as RAW uint8 (the on-device quantization of [-1,1]) —
        the PNG path consumes these directly, skipping a dequantize/requantize
        round trip (u8 -> grid is bit-identical to u8 -> float -> grid).

        The priority gate is re-entered between device calls, so a multi-batch
        request yields to any higher-priority request at fixed-batch
        granularity (seeded results stay reproducible regardless of the
        interleaving: batch ``call`` of seed s is always
        fold_in(PRNGKey(s), call))."""
        if n < 1:
            raise ValueError("n must be >= 1")
        if seed is not None:
            seed = int(seed)
            if not 0 <= seed < 2 ** 31:
                raise ValueError("seed must be in [0, 2**31) — out-of-range "
                                 "seeds would silently alias another stream")
        prio = parse_priority(priority)
        waited = 0.0
        if seed is not None:
            out, done, call = [], 0, 0
            while done < n:
                waited += self._gate.acquire(prio)
                try:
                    u8 = self._generate(seed, call)
                finally:
                    self._gate.release()
                take = min(self.batch, n - done)
                out.append(u8[:take])
                done += take
                call += 1
            self._note_request(prio, waited, n)
            return np.concatenate(out, 0)
        # Unseeded: slice from the shared pool, refilling batch-at-a-time.
        # The pool is gate-protected state, so each refill+slice runs inside
        # one held section (uint8 slices out; dequantization after release).
        out = []
        need = n
        while need > 0:
            waited += self._gate.acquire(prio)
            try:
                if self._pool.shape[0] == 0:
                    self._pool = self._generate(self._pool_seed, self._pool_calls)
                    self._pool_calls += 1
                take = min(need, self._pool.shape[0])
                out.append(self._pool[:take])
                self._pool = self._pool[take:]
                need -= take
            finally:
                self._gate.release()
        self._note_request(prio, waited, n)
        return np.concatenate(out, 0)


def load_service(run_dir: str, batch: int = 64, best: bool = False,
                 quantize: Optional[str] = None) -> SamplerService:
    """Restore a run's config + checkpoint into a SamplerService (EMA params
    when tracked — the same weights FID/best tracking use)."""
    from vitgan_tpu.utils.run_dirs import restore_run

    cfg, gan, state, _meta = restore_run(run_dir, best=best)
    return SamplerService(cfg, gan, state.g_vars_ema, batch=batch,
                          quantize=quantize)


def _make_handler(services):
    """``services``: a single SamplerService or an ordered {name: service}
    registry — POST /sample selects with {"model": name} (default: first)."""
    if isinstance(services, SamplerService):
        services = {"default": services}
    default_name = next(iter(services))

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through one line, not stderr spam
            pass

        def _reply(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj) -> None:
            self._reply(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path == "/healthz":
                if len(services) == 1:
                    self._json(200, services[default_name].info())
                else:
                    self._json(200, {name: s.info() for name, s in services.items()})
            elif self.path == "/metrics":
                label = len(services) > 1
                text = "".join(s.metrics_text(name if label else "")
                               for name, s in services.items())
                self._reply(200, text.encode(), "text/plain; version=0.0.4")
            else:
                self._json(404, {"error": "unknown path (try /healthz, /metrics, "
                                          "POST /sample)"})

        def do_POST(self):
            if self.path != "/sample":
                self._json(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                n = int(req.get("n", 16))
                if not 1 <= n <= 4096:
                    raise ValueError("n must be in [1, 4096]")
                name = req.get("model", default_name)
                if name not in services:
                    raise ValueError(f"unknown model {name!r} "
                                     f"(have: {sorted(services)})")
                fmt = req.get("format", "png")
                if fmt == "npy":
                    imgs = services[name].sample(n, req.get("seed"),
                                                 req.get("priority"))
                    buf = io.BytesIO()
                    np.save(buf, imgs)
                    self._reply(200, buf.getvalue(), "application/octet-stream")
                elif fmt == "png":
                    from vitgan_tpu.utils.images import make_grid, to_png_bytes

                    # uint8 straight into the grid: bit-identical to the
                    # dequantize->denormalize path, without two full-array
                    # conversions on the latency path.
                    u8 = services[name].sample_quantized(n, req.get("seed"),
                                                         req.get("priority"))
                    self._reply(200, to_png_bytes(make_grid(u8)), "image/png")
                else:
                    raise ValueError(f"unknown format {fmt!r}")
            except Exception as e:  # noqa: BLE001 — report, don't kill the server
                self._json(400, {"error": str(e)})

    return Handler


def serve(run_dirs, host: str = "127.0.0.1", port: int = 8000,
          batch: int = 64, best: bool = False,
          quantize: Optional[str] = None) -> ThreadingHTTPServer:
    """Build the service(s) and return a ready (unstarted) HTTP server; call
    ``serve_forever()`` on it (the CLI does) or drive it from tests.

    ``run_dirs``: one run directory or a list — multiple dirs become a
    multi-model registry keyed by run-dir basename (POST {"model": name})."""
    import os

    if isinstance(run_dirs, str):
        run_dirs = [run_dirs]
    names = [os.path.basename(os.path.normpath(d)) for d in run_dirs]
    if len(set(names)) != len(names):
        # Silent last-wins would load then orphan a model and serve the
        # wrong generator for the shared name.
        dups = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(f"duplicate model names in --run-dir: {dups} "
                         "(registry keys are run-dir basenames — rename or "
                         "symlink one of the dirs)")
    services = {name: load_service(d, batch=batch, best=best, quantize=quantize)
                for name, d in zip(names, run_dirs)}
    httpd = ThreadingHTTPServer((host, port), _make_handler(services))
    # Drain on shutdown: ThreadingHTTPServer defaults to daemon request
    # threads, which die with the process mid-response.  Non-daemon threads +
    # block_on_close make server_close() join in-flight handlers, so SIGTERM/
    # Ctrl-C lets the current batch finish (the CLI calls server_close()).
    httpd.daemon_threads = False
    httpd.block_on_close = True
    httpd.services = services  # exposed for tests/introspection
    httpd.service = next(iter(services.values()))  # back-compat single-model handle
    return httpd
