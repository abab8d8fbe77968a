"""Sampling server: health, batched /sample (png + npy), error handling."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from vitgan_tpu import config as C


@pytest.fixture(scope="module")
def server():
    """A tiny trained run served over a real HTTP socket."""
    import jax

    from vitgan_tpu.serve import SamplerService, _make_handler
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.train import create_train_state
    from http.server import ThreadingHTTPServer

    cfg = C.smoke_config("mlp")
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    service = SamplerService(cfg, gan, state.g_vars_ema, batch=8)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(service))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(url + "/sample", data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.headers.get("Content-Type"), r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz") as r:
        info = json.loads(r.read())
    assert info["family"] == "mlp" and info["batch"] == 8


def test_sample_npy_crosses_batch_boundary(server):
    status, ctype, body = _post(server, {"n": 20, "seed": 1, "format": "npy"})
    assert status == 200 and ctype == "application/octet-stream"
    arr = np.load(io.BytesIO(body))
    assert arr.shape[0] == 20 and arr.dtype == np.float32
    assert np.isfinite(arr).all() and arr.min() >= -1.001 and arr.max() <= 1.001


def test_sample_png(server):
    status, ctype, body = _post(server, {"n": 4, "format": "png"})
    assert status == 200 and ctype == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"


def test_same_seed_same_samples(server):
    _, _, a = _post(server, {"n": 4, "seed": 7, "format": "npy"})
    _, _, b = _post(server, {"n": 4, "seed": 7, "format": "npy"})
    np.testing.assert_array_equal(np.load(io.BytesIO(a)), np.load(io.BytesIO(b)))


def test_serve_sampler_quantization_parity():
    """The single-dispatch uint8 serving sampler must match the float sampler
    to within one 8-bit quantization step (its only intended difference)."""
    import jax

    from vitgan_tpu.models import build_gan
    from vitgan_tpu.train import create_train_state, make_sample_fn, make_serve_sample_fn

    cfg = C.smoke_config("mlp")
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    batch, seed, call = 8, 7, 3

    u8 = np.asarray(make_serve_sample_fn(gan, cfg, batch)(state.g_vars_ema, seed, call))
    assert u8.dtype == np.uint8
    served = u8.astype(np.float32) / 127.5 - 1.0

    rng = jax.random.fold_in(jax.random.PRNGKey(seed), call)
    z = gan.sample_latent(rng, batch)
    ref = np.clip(np.asarray(make_sample_fn(gan, cfg)(state.g_vars_ema, z)), -1.0, 1.0)

    assert np.abs(served - ref).max() <= (1.0 / 255.0) + 1e-6


def test_unseeded_requests_coalesce_device_calls():
    """Small unseeded requests must share generator calls via the pool:
    8 requests of n=2 against batch=8 need 2 device calls, not 8."""
    import jax

    from vitgan_tpu.models import build_gan
    from vitgan_tpu.serve import SamplerService
    from vitgan_tpu.train import create_train_state

    cfg = C.smoke_config("mlp")
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    service = SamplerService(cfg, gan, state.g_vars_ema, batch=8)
    outs = [service.sample(2) for _ in range(8)]
    assert all(o.shape[0] == 2 for o in outs)
    assert service._device_calls == 2
    # ...and the coalesced slices are distinct draws, not repeats.
    flat = np.stack([o[0].ravel() for o in outs])
    assert len({a.tobytes() for a in flat}) == len(outs)
    # Seeded requests bypass the pool and stay reproducible.
    a = service.sample(3, seed=5)
    b = service.sample(3, seed=5)
    np.testing.assert_array_equal(a, b)


def test_multi_model_registry():
    """Two services behind one server: /sample selects by model name,
    /healthz and /metrics carry both, unknown names 400."""
    import jax

    from http.server import ThreadingHTTPServer

    from vitgan_tpu.models import build_gan
    from vitgan_tpu.serve import SamplerService, _make_handler
    from vitgan_tpu.train import create_train_state

    services = {}
    for name, fam in (("a", "mlp"), ("b", "mlp")):
        cfg = C.smoke_config(fam)
        gan = build_gan(cfg)
        state = create_train_state(jax.random.PRNGKey(hash(name) % 1000), gan, cfg)
        services[name] = SamplerService(cfg, gan, state.g_vars_ema, batch=8)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(services))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        with urllib.request.urlopen(url + "/healthz") as r:
            info = json.loads(r.read())
        assert set(info) == {"a", "b"}
        status, _, body = _post(url, {"n": 2, "model": "b", "format": "npy"})
        assert status == 200 and np.load(io.BytesIO(body)).shape[0] == 2
        assert services["b"]._counter == 1 and services["a"]._counter == 0
        status, _, _ = _post(url, {"n": 2, "model": "zzz"})
        assert status == 400
        with urllib.request.urlopen(url + "/metrics") as r:
            text = r.read().decode()
        assert 'model="a"' in text and 'model="b"' in text
    finally:
        httpd.shutdown()


def test_metrics_endpoint(server):
    with urllib.request.urlopen(server + "/metrics") as r:
        assert r.status == 200
        text = r.read().decode()
    assert "vitgan_requests_served" in text and "vitgan_device_calls" in text


def test_bad_requests(server):
    status, _, body = _post(server, {"n": 0})
    assert status == 400 and b"error" in body
    status, _, _ = _post(server, {"n": 5, "format": "bmp"})
    assert status == 400
    # Out-of-range seeds are rejected, not silently aliased onto another
    # stream (negative seed space is reserved for the unseeded pool).
    for bad_seed in (-1, 2 ** 31):
        status, _, body = _post(server, {"n": 4, "seed": bad_seed,
                                         "format": "npy"})
        assert status == 400 and b"seed" in body
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(server + "/nope")
    assert exc.value.code == 404


def test_serve_rejects_duplicate_model_names(tmp_path):
    """Two --run-dir flags with the same basename must error, not silently
    serve the wrong generator under the shared key."""
    from vitgan_tpu.serve import serve

    a = tmp_path / "expA" / "run_001"
    b = tmp_path / "expB" / "run_001"
    a.mkdir(parents=True)
    b.mkdir(parents=True)
    with pytest.raises(ValueError, match="duplicate model names"):
        serve([str(a), str(b)])


def test_pool_stream_distinct_from_seeded_streams():
    """The unseeded pool draws from a negative seed no client can reach: a
    seeded request with the pool seed's magnitude must NOT reproduce pool
    samples (round-1 of this code used a positive pool seed — collidable)."""
    import jax

    from vitgan_tpu.serve import SamplerService
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.train import create_train_state

    cfg = C.smoke_config("mlp")
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    svc = SamplerService(cfg, gan, state.g_vars_ema, batch=8)
    assert svc._pool_seed < 0
    pool_imgs = svc.sample(8)  # first refill: pool call 0
    seeded = svc.sample(8, seed=-svc._pool_seed)  # same magnitude, positive
    assert not np.array_equal(pool_imgs, seeded)


def test_parse_priority():
    from vitgan_tpu.serve import parse_priority

    assert parse_priority(None) == 0
    assert parse_priority("interactive") == 0
    assert parse_priority("batch") == 10
    assert parse_priority(3) == 3
    with pytest.raises(ValueError):
        parse_priority("urgent")


def test_priority_gate_orders_waiters():
    """With the gate held, a later-arriving interactive waiter must be admitted
    before an earlier batch waiter (a plain Lock wakes arbitrarily)."""
    import time

    from vitgan_tpu.serve import PriorityGate

    gate = PriorityGate()
    gate.acquire(0)
    order = []

    def waiter(prio, name, delay):
        time.sleep(delay)  # enforce arrival order: batch first
        gate.acquire(prio)
        order.append(name)
        gate.release()

    threads = [threading.Thread(target=waiter, args=(10, "batch", 0.0)),
               threading.Thread(target=waiter, args=(0, "interactive", 0.15))]
    for t in threads:
        t.start()
    time.sleep(0.4)  # both enqueued behind the held gate
    gate.release()
    for t in threads:
        t.join(timeout=5)
    assert order == ["interactive", "batch"]


def test_interactive_preempts_long_batch_between_device_calls():
    """A 4-batch 'batch'-priority request must yield the device to a queued
    interactive request at fixed-batch granularity."""
    import time

    import jax

    from vitgan_tpu.models import build_gan
    from vitgan_tpu.serve import SamplerService
    from vitgan_tpu.train import create_train_state

    cfg = C.smoke_config("mlp")
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    service = SamplerService(cfg, gan, state.g_vars_ema, batch=8)

    calls = []
    real_generate = service._generate
    batch_in_flight = threading.Event()

    def instrumented_generate(seed, call):
        name = threading.current_thread().name
        calls.append(name)
        out = real_generate(seed, call)
        if name == "batch":
            batch_in_flight.set()
            if calls.count("batch") == 1:
                # Deterministic interleaving: hold batch call 1 of 4 until the
                # interactive request is queued at the gate (priority 0 waiter).
                deadline = time.time() + 10
                while time.time() < deadline:
                    with service._gate._cond:
                        if any(p == 0 for p, _ in service._gate._waiting):
                            break
                    time.sleep(0.005)
        return out

    service._generate = instrumented_generate
    done = {}

    def batch_req():
        done["batch"] = service.sample(32, seed=1, priority="batch")

    def interactive_req():
        batch_in_flight.wait(timeout=10)  # arrive while batch call 1 is in flight
        done["inter"] = service.sample(4, seed=2, priority="interactive")

    tb = threading.Thread(target=batch_req, name="batch")
    ti = threading.Thread(target=interactive_req, name="inter")
    tb.start(); ti.start()
    tb.join(timeout=30); ti.join(timeout=30)

    assert done["batch"].shape[0] == 32 and done["inter"].shape[0] == 4
    # The interactive call ran BETWEEN batch device calls, not after all four.
    first_inter = calls.index("inter")
    assert 0 < first_inter < 4, f"no preemption: call order {calls}"
    # Seeded batch results stay reproducible despite the interleaving.
    again = service.sample(32, seed=1, priority="batch")
    np.testing.assert_array_equal(done["batch"], again)
    # Priority metrics recorded both classes.
    text = service.metrics_text()
    assert 'vitgan_priority_requests{priority="interactive"}' in text
    assert 'vitgan_priority_requests{priority="batch"}' in text


def test_sample_priority_over_http(server):
    status, _, body = _post(server, {"n": 2, "format": "npy", "priority": "batch"})
    assert status == 200
    status, _, body = _post(server, {"n": 2, "priority": "nope"})
    assert status == 400 and b"unknown priority" in body
