"""The serving harness (cli/serve.py): batched dispatch, wrap-padded tail,
health/stats endpoints, checkpoint round-trip. Runs the real HTTP server on
an ephemeral port with a tiny ft_vit."""
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from mem_tpu.cli.run_class_finetuning import _build_ft_vit
    from mem_tpu.cli.serve import build_server, get_args
    from mem_tpu.utils.checkpoint import save_checkpoint

    out = tmp_path_factory.mktemp("serve_ckpt")
    flags = [
        "--checkpoint", str(out), "--nb_classes", "3",
        "--dataset", "ncaltech101", "--model", "ft_vit",
        "--transformer_emb", "32", "--transformer_depth", "1",
        "--transformer_heads", "2", "--num_layers", "4",
        "--input_H", "32", "--input_W", "32", "--slice_max_evs", "500",
        "--hotpixfilter", "0", "--rand_aug", "0", "--dtype", "float32",
        "--batch_size", "4", "--max_wait_ms", "40", "--topk", "3",
        "--port", "0",
    ]
    args = get_args(flags)
    model = _build_ft_vit(args, 3, 2 ** args.num_layers, jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((2, 32, 32, 3)))
    save_checkpoint(str(out), 0, {"params": variables, "epoch": 0})

    httpd, state, disp = build_server(args)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", state
    with state.cv:
        state.stop = True
        state.cv.notify_all()
    httpd.shutdown()
    httpd.server_close()


def _post_npy(url, arr):
    import io

    b = io.BytesIO()
    np.save(b, arr)
    req = urllib.request.Request(url + "/predict", data=b.getvalue(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read()), r.status


def _get(url, path):
    with urllib.request.urlopen(url + path, timeout=10) as r:
        return json.loads(r.read()), r.status


def _events(rng, n=300):
    ev = np.zeros((n, 4), np.float64)
    ev[:, 0] = rng.integers(0, 200, n)
    ev[:, 1] = rng.integers(0, 150, n)
    ev[:, 2] = np.sort(rng.integers(0, 10**6, n))
    ev[:, 3] = rng.choice([-1.0, 1.0], n)
    return ev


def test_healthz_warm(server):
    url, state = server
    body, code = _get(url, "/healthz")
    assert code == 200 and body == {"ok": True, "warm": True}


def test_predict_single_wrap_padded(server, rng):
    """One request in a B=4 bucket: served after max_wait via wrap-pad,
    topk well-formed (k entries, descending probs, valid class ids)."""
    url, state = server
    body, code = _post_npy(url, _events(rng))
    assert code == 200
    tk = body["topk"]
    assert len(tk) == 3
    probs = [p for _, p in tk]
    assert probs == sorted(probs, reverse=True)
    assert 0.99 <= sum(probs) <= 1.001          # k == nb_classes: full mass
    assert all(0 <= c < 3 for c, _ in tk)
    assert body["queue_ms"] >= 0


def test_predict_structured_and_deterministic(server, rng):
    """x/y/t/p structured arrays are accepted and map to the same rows as
    the equivalent (N, 4) float payload -> identical probabilities."""
    ev = _events(rng, 200)
    arr = np.zeros(200, dtype=[("x", "<u2"), ("y", "<u2"),
                               ("t", "<u4"), ("p", "u1")])
    arr["x"] = ev[:, 0]
    arr["y"] = ev[:, 1]
    arr["t"] = ev[:, 2]
    arr["p"] = (ev[:, 3] > 0).astype(np.uint8)
    url, _ = server
    a, _ = _post_npy(url, ev)
    b, _ = _post_npy(url, arr)
    assert a["topk"] == b["topk"]


def test_concurrent_requests_batch_together(server, rng):
    url, state = server
    before = state.stats()
    results = []

    def go(seed):
        results.append(_post_npy(url, _events(np.random.default_rng(seed))))

    ts = [threading.Thread(target=go, args=(s,)) for s in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert all(code == 200 for _, code in results)
    after = state.stats()
    assert after["served"] - before["served"] == 4
    # 4 concurrent requests into a B=4 bucket: fewer dispatches than
    # requests proves batching happened (exact count is timing-dependent)
    assert after["batches"] - before["batches"] <= 3


def test_stats_shape(server):
    url, _ = server
    body, code = _get(url, "/stats")
    assert code == 200
    for k in ("queue_depth", "batch_ms_ema", "added_latency_ms", "served",
              "batches", "avg_fill", "batch_size", "warm"):
        assert k in body, k
    assert body["batch_size"] == 4 and body["warm"] is True
    assert body["avg_fill"] >= 1


def test_bad_payload_is_a_400(server):
    url, _ = server
    req = urllib.request.Request(url + "/predict", data=b"not an npy",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 400


def test_seg_surface_png_roundtrip(tmp_path, rng):
    """--surface seg: a DSEC-format event window in, a 440x640 PNG label
    map out, class ids bounded by num_classes."""
    import functools
    import io

    from PIL import Image

    from mem_tpu.cli.serve import build_server, get_args
    from mem_tpu.models.segmentation import EncoderDecoder
    from mem_tpu.utils.checkpoint import save_checkpoint

    flags = [
        "--checkpoint", str(tmp_path), "--surface", "seg",
        "--num_classes", "4", "--transformer_emb", "32",
        "--transformer_depth", "2", "--transformer_heads", "2",
        "--seg_input_size", "64", "--slice_max_evs", "2000",
        "--batch_size", "2", "--max_wait_ms", "20", "--dtype", "float32",
        "--port", "0",
    ]
    args = get_args(flags)
    model = EncoderDecoder(
        num_classes=4,
        backbone_cfg=dict(img_size=64, embed_dim=32, depth=2, num_heads=2,
                          out_indices=(0, 0, 0, 1)),
        dtype=jnp.float32)
    x = jnp.zeros((1, 440, 640, 3))
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.key(0), x)
    save_checkpoint(str(tmp_path), 0, {"params": variables["params"],
                                       "batch_stats": variables["batch_stats"]})

    httpd, state, disp = build_server(args)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        n = 800
        ev = np.zeros((n, 4), np.float64)
        ev[:, 0] = rng.integers(0, 640, n)
        ev[:, 1] = rng.integers(0, 470, n)   # some rows crop at y >= 440
        ev[:, 2] = np.sort(rng.integers(0, 10**6, n))
        ev[:, 3] = rng.integers(0, 2, n)     # on-disk p in {0, 1}
        b = io.BytesIO()
        np.save(b, ev)
        req = urllib.request.Request(url + "/predict", data=b.getvalue(),
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            assert r.headers["Content-Type"] == "image/png"
            assert float(r.headers["X-Queue-Ms"]) >= 0
            png = r.read()
        img = np.asarray(Image.open(io.BytesIO(png)))
        assert img.shape == (440, 640)
        assert img.max() < 4
        assert state.stats()["served"] == 1

        # structured x/y/t/p payload: _decode_events maps p to ±1 ONCE; the
        # seg assemble must not remap again (a double 2p-1 yields p in
        # {-3, 1} and silently different voxel counts) -> identical PNG
        arr = np.zeros(n, dtype=[("x", "<u2"), ("y", "<u2"),
                                 ("t", "<u4"), ("p", "u1")])
        arr["x"] = ev[:, 0]
        arr["y"] = ev[:, 1]
        arr["t"] = ev[:, 2]
        arr["p"] = ev[:, 3]
        b = io.BytesIO()
        np.save(b, arr)
        req = urllib.request.Request(url + "/predict", data=b.getvalue(),
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            assert r.read() == png
    finally:
        with state.cv:
            state.stop = True
            state.cv.notify_all()
        httpd.shutdown()
        httpd.server_close()
