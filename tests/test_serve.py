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
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(server + "/nope")
    assert exc.value.code == 404
