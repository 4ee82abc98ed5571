"""Batched classification inference server — docs/SERVING.md made runnable.

The reference ships no serving path (its inference surface is
``run_class_finetuning --eval`` over a folder); this is the
beyond-reference deployment harness implementing the batching policy the
serving doc derives from measured operating points:

- requests are bucketed into ONE static batch shape (``--batch_size``) so
  the jitted forward never recompiles; the tail of a batch is wrap-padded
  with duplicates (the eval loop's padding semantics,
  run_mem_pretraining.py:313-316) and the pad rows' outputs are dropped;
- a dispatcher collects requests until the bucket is full or
  ``--max_wait_ms`` expires (latency/throughput knob: 8 for SLO-bound,
  64 at the throughput knee — SERVING.md table);
- ``/stats`` exports the autoscaling signal the doc prescribes:
  ``queue_depth x batch_ms / batch_size`` IS the instantaneous added
  latency (device time per batch is constant under static shapes).

Protocol (stdlib HTTP, one round-trip per sample):
  POST /predict   body = the bytes of an ``.npy`` event file ((N, 4)
                  [x, y, t, p] rows, or an x/y/t/p structured array) ->
                  {"topk": [[class_idx, prob], ...], "queue_ms": float}
  GET  /healthz   200 {"ok": true} once the forward is compiled and warm
  GET  /stats     queue depth, served/batches counters, avg batch fill,
                  EMA batch latency, added-latency estimate

Model/flags mirror ``run_class_finetuning`` (same geometry + preprocessing
flag names, same checkpoint layout); ``--use_ema`` serves the EMA weights.
Preprocessing runs inside the jitted forward on device — the host does
only npy decode + slice + batch assembly (SERVING.md "preprocessing
placement").

``--surface seg`` serves the second documented surface instead: DSEC
semantic segmentation (EvBEiT + UPerNet from a ``train_seg`` checkpoint).
POST /predict then takes the bytes of a DSEC event-window ``.npy``
((N, 4) [x, y, t, p∈{0,1}] rows, the on-disk format) and returns the
predicted 440x640 label map as a PNG (class index per pixel), queue time
in the ``X-Queue-Ms`` header.
"""
from __future__ import annotations

import io
import json
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

import jax
import jax.numpy as jnp

from mem_tpu.cli.common import add_preprocessing_args, build_preproc, detect_dataset
from mem_tpu.data.device_pipeline import preprocess_batch
from mem_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint
from mem_tpu.utils.config import ConfigArgumentParser


def get_args(argv=None):
    p = ConfigArgumentParser("MEM classification serving")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="orbax checkpoint dir (checkpoint-N) or an output "
                        "dir (serves its latest checkpoint)")
    p.add_argument("--use_ema", type=int, default=0,
                   help="serve the EMA weights when the checkpoint has them")
    p.add_argument("--nb_classes", "--num_classes", type=int, required=True)
    p.add_argument("--surface", type=str, default="cls",
                   choices=("cls", "seg"),
                   help="cls = event classification (ft_vit / --MAE); "
                        "seg = DSEC segmentation (train_seg checkpoint)")
    p.add_argument("--dataset", dest="data_path", type=str,
                   default="ncaltech101",
                   help="cls dataset quirk profile (canvas/scale/extents): "
                        "ncaltech101 | ncars | nimagenet")
    p.add_argument("--seg_input_size", type=int, default=512)
    p.add_argument("--presort_y", type=int, default=1)
    # model geometry — the finetune CLI's flag surface
    p.add_argument("--model", type=str, default="ft_vit")
    p.add_argument("--MAE", type=int, default=0)
    p.add_argument("--rel_pos_bias", type=int, default=1)
    p.add_argument("--abs_pos_emb", type=int, default=0)
    p.add_argument("--layer_scale_init_value", type=float, default=0.1)
    p.add_argument("--init_scale", type=float, default=0.001)
    p.add_argument("--use_mean_pooling", type=int, default=1)
    p.add_argument("--linear_probe_batch_norm", type=int, default=0)
    p.add_argument("--voxel", type=int, default=0)
    p.add_argument("--num_layers", type=int, default=4)
    p.add_argument("--transformer_emb", type=int, default=768)
    p.add_argument("--transformer_depth", type=int, default=12)
    p.add_argument("--transformer_heads", type=int, default=12)
    p.add_argument("--transformer_mlp_ratio", type=float, default=4.0)
    p.add_argument("--drop", type=float, default=0.0)
    p.add_argument("--drop_path", type=float, default=0.0)
    p.add_argument("--attn_drop_rate", type=float, default=0.0)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--int8", type=int, default=0)
    add_preprocessing_args(p)
    p.set_defaults(normalize_events=1)
    # serving knobs
    p.add_argument("--port", type=int, default=8787,
                   help="0 = ephemeral (printed + returned on build)")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--batch_size", type=int, default=8,
                   help="the static batch bucket (SERVING.md: 8 for "
                        "latency SLOs, 64 at the throughput knee)")
    p.add_argument("--max_wait_ms", type=float, default=5.0,
                   help="batching deadline once a request is pending")
    p.add_argument("--topk", type=int, default=5)
    return p.parse_args(argv)


class _Request:
    __slots__ = ("events", "done", "result", "error", "t_enq")

    def __init__(self, events):
        self.events = events
        self.done = threading.Event()
        self.result = None
        self.error = None
        self.t_enq = time.monotonic()


class ServeState:
    """Queue + dispatcher + stats shared between HTTP threads and the one
    device thread (one jitted dispatch at a time — replicas scale by
    process, SERVING.md "replicas, not shards")."""

    def __init__(self, args, infer, assemble, unpack):
        self.args = args
        self.infer = infer
        self.assemble = assemble
        self.unpack = unpack
        self.queue: deque = deque()
        self.cv = threading.Condition()
        self.stop = False
        self.warm = False
        self.served = 0
        self.batches = 0
        self.fill_sum = 0
        self.batch_ms_ema = 0.0
        # dispatch/fetch pipeline: jax dispatch is async, so the fetcher
        # thread blocks on batch N's device->host copy while the device
        # already runs batch N+1 (the copy is pure latency on a remote
        # chip; depth 2 = classic double buffering)
        self.inflight: deque = deque()
        self.fetch_cv = threading.Condition()
        self.max_inflight = 2

    # -- dispatcher ---------------------------------------------------------
    def run(self):
        B = self.args.batch_size
        wait_s = self.args.max_wait_ms / 1e3
        while True:
            with self.cv:
                while not self.queue and not self.stop:
                    self.cv.wait(0.05)
                if self.stop:
                    for r in self.queue:
                        r.error = "server shutting down"
                        r.done.set()
                    self.queue.clear()
                    break
                reqs = [self.queue.popleft()]
                deadline = time.monotonic() + wait_s
                while len(reqs) < B:
                    if self.queue:
                        reqs.append(self.queue.popleft())
                        continue
                    rem = deadline - time.monotonic()
                    if rem <= 0 or self.stop:
                        break
                    self.cv.wait(min(rem, 0.005))
            self._dispatch_batch(reqs)
        with self.fetch_cv:
            self.fetch_cv.notify_all()

    def _dispatch_batch(self, reqs):
        B = self.args.batch_size
        with self.fetch_cv:
            while len(self.inflight) >= self.max_inflight:
                self.fetch_cv.wait(0.05)
        try:
            batch = self.assemble([r.events for r in reqs], B)
            t0 = time.perf_counter()
            outputs = self.infer(batch)     # async dispatch, no block
        except Exception as e:  # bad payload shapes surface per-request
            for r in reqs:
                r.error = f"inference failed: {e!r}"
                r.done.set()
            return
        with self.fetch_cv:
            self.inflight.append((reqs, outputs, t0))
            self.fetch_cv.notify_all()

    # -- fetcher -------------------------------------------------------------
    def run_fetch(self):
        while True:
            with self.fetch_cv:
                while not self.inflight and not self.stop:
                    self.fetch_cv.wait(0.05)
                if not self.inflight and self.stop:
                    return
                reqs, outputs, t0 = self.inflight.popleft()
                self.fetch_cv.notify_all()
            try:
                outputs = jax.tree.map(np.asarray, outputs)
            except Exception as e:
                for r in reqs:
                    r.error = f"inference failed: {e!r}"
                    r.done.set()
                continue
            ms = (time.perf_counter() - t0) * 1e3
            with self.cv:
                self.batches += 1
                self.fill_sum += len(reqs)
                self.batch_ms_ema = (ms if self.batches == 1
                                     else 0.9 * self.batch_ms_ema + 0.1 * ms)
                self.served += len(reqs)
            for j, r in enumerate(reqs):
                qms = round((time.monotonic() - r.t_enq) * 1e3, 3)
                r.result = self.unpack(j, outputs, qms)   # (ctype, bytes)
                r.done.set()

    # -- stats --------------------------------------------------------------
    def stats(self):
        with self.cv:
            depth = len(self.queue)
            bm = self.batch_ms_ema
            return {
                "queue_depth": depth,
                "batch_ms_ema": round(bm, 3),
                # the SERVING.md autoscaling signal: queued work expressed
                # as the latency it will add at the measured batch rate
                "added_latency_ms": round(
                    depth * bm / max(self.args.batch_size, 1), 3),
                "served": self.served,
                "batches": self.batches,
                "avg_fill": round(self.fill_sum / self.batches, 3)
                            if self.batches else 0.0,
                "batch_size": self.args.batch_size,
                "warm": self.warm,
            }


def _decode_events(body: bytes):
    """-> (events (N, 4) float64, p_signed). Structured x/y/t/p payloads are
    polarity-normalized to ±1 here (imgnet_npy_loader semantics) and tagged
    p_signed=True so the seg surface does NOT apply its own {0,1} -> ±1
    remap again (double-remapping yielded p in {-3, 1} and silently wrong
    voxel counts). Plain (N, 4) arrays pass through with their on-disk
    polarity convention (±1 for N-Caltech101, {0,1} for N-Cars/DSEC)."""
    arr = np.load(io.BytesIO(body), allow_pickle=False)
    if arr.dtype.fields is not None and "x" in arr.dtype.fields:
        ev = np.empty((arr.shape[0], 4), np.float64)
        ev[:, 0] = arr["x"]
        ev[:, 1] = arr["y"]
        ev[:, 2] = arr["t"]
        ev[:, 3] = arr["p"].astype(np.int8) * 2 - 1
        return ev, True
    ev = np.asarray(arr, np.float64)
    if ev.ndim != 2 or ev.shape[1] != 4:
        ev = ev.reshape(-1, 4)
    return ev, False


def _load_payload(args):
    # bind the scan result once: a concurrent checkpoint save between two
    # latest_checkpoint calls could resolve DIFFERENT checkpoints (the race
    # auto_resume's callable template fixed), and it double-scans the dir
    path = args.checkpoint
    latest = latest_checkpoint(path)
    if latest:
        path = latest
    return path, load_checkpoint(path)


def _build_cls(args, dtype):
    """Classification surface: ft_vit / --MAE classifier + the same
    device-side eval preprocessing the finetune CLI's eval loop runs."""
    from mem_tpu.cli.run_class_finetuning import _build_ft_vit
    from mem_tpu.models import create_model

    ds = detect_dataset(args.data_path)
    if ds == "dsec":
        raise SystemExit("serve: --surface cls does not cover DSEC "
                         "(use --surface seg)")
    pp = build_preproc(args, is_train=False)
    # eval-split host semantics from build_pipeline (cli/common.py): the
    # f32 wire ships host-scaled coordinates; extents are fixed for
    # N-ImageNet, data-derived otherwise
    scale_xy = ((args.input_W / 640.0, args.input_H / 480.0)
                if ds == "nimagenet" else None)
    fixed_hw = (args.input_H, args.input_W) if ds == "nimagenet" else None
    cap = args.slice_max_evs

    patch = 2 ** args.num_layers
    if args.MAE:
        model = create_model(
            "vit_base_patch16", num_classes=args.nb_classes,
            global_pool=True, img_size=(args.input_H, args.input_W),
            in_chans=3 if args.voxel == 0 else args.voxel, patch_size=patch,
            embed_dim=args.transformer_emb, depth=args.transformer_depth,
            num_heads=args.transformer_heads,
            mlp_ratio=args.transformer_mlp_ratio, dtype=dtype)
    else:
        model = _build_ft_vit(args, args.nb_classes, patch, dtype)

    path, payload = _load_payload(args)
    key = "ema" if (args.use_ema and "ema" in payload) else "params"
    if args.use_ema and "ema" not in payload:
        print("note: checkpoint has no EMA state; serving raw params")
    # pin the weights on device ONCE — numpy params would be re-shipped
    # host->device on EVERY dispatch (measured: ViT-B f32 = 343 MB over
    # the tunnel = ~7 s/batch instead of ~30 ms)
    params = jax.device_put(payload[key])
    print(f"serving {key} from {path}")

    k = args.topk

    @jax.jit
    def _fwd(params, batch):
        images = preprocess_batch(batch, pp, is_train=False)
        logits = model.apply(params, images).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        return jax.lax.top_k(probs, k)

    def assemble(events_list, B):
        n = len(events_list)
        ev = np.zeros((B, cap, 4), np.float32)
        nv = np.zeros((B,), np.int32)
        sh = np.zeros((B,), np.int32)
        sw = np.zeros((B,), np.int32)
        rng = np.random.default_rng(0)  # eval slice: any window is valid
        for j in range(B):
            e, _ = events_list[j % n]   # wrap-pad the tail
            if scale_xy is not None:
                e = e.copy()
                e[:, 0] *= scale_xy[0]
                e[:, 1] *= scale_xy[1]
            m = e.shape[0]
            if m > cap:
                start = int(rng.integers(0, m - cap + 1))
                e = e[start:start + cap]
                m = cap
            ev[j, :m] = e
            nv[j] = m
            if fixed_hw is not None:
                sh[j], sw[j] = fixed_hw
            elif m > 0:
                sw[j] = min(int(e[:, 0].max()) + 1, pp.canvas_w)
                sh[j] = min(int(e[:, 1].max()) + 1, pp.canvas_h)
            else:
                sh[j], sw[j] = pp.canvas_h, pp.canvas_w
        return {
            "events": ev, "n_valid": nv,
            "label": np.zeros((B,), np.int64),
            "sample_h": sh, "sample_w": sw,
            "time_flip": np.zeros(B, bool), "x_flip": np.zeros(B, bool),
            "shift_xy": np.zeros((B, 2), np.int32),
            "aug_seed": np.zeros(B, np.uint32),
        }

    def infer(batch):
        return _fwd(params, batch)

    def unpack(j, outputs, queue_ms):
        probs, idxs = outputs
        body = json.dumps({
            "topk": [[int(c), float(p)] for c, p in zip(idxs[j], probs[j])],
            "queue_ms": queue_ms,
        }).encode()
        return "application/json", body

    return assemble, infer, unpack


def _build_seg(args, dtype):
    """Segmentation surface: EvBEiT + UPerNet from a train_seg checkpoint;
    single-scale whole-image inference (the SERVING.md seg row — TTA is an
    offline-eval feature). Responses are 440x640 PNG label maps."""
    from mem_tpu.data.seg_pipeline import SEG_H, SEG_W, seg_preprocess_batch
    from mem_tpu.models.segmentation import EncoderDecoder

    depth = args.transformer_depth
    model = EncoderDecoder(
        num_classes=args.nb_classes,
        backbone_cfg=dict(
            img_size=args.seg_input_size, embed_dim=args.transformer_emb,
            depth=depth, num_heads=args.transformer_heads,
            out_indices=tuple(max(0, depth - 4 + k) for k in range(4)),
        ),
        dtype=dtype,
    )
    path, payload = _load_payload(args)
    # device-pinned once (see _build_cls: numpy weights re-ship per dispatch)
    variables = jax.device_put({"params": payload["params"],
                                "batch_stats": payload["batch_stats"]})
    print(f"serving seg params from {path}")
    cap = args.slice_max_evs
    presort = bool(args.presort_y)

    @jax.jit
    def _fwd(batch):
        images, _ = seg_preprocess_batch(batch, False, y_sorted=presort)
        logits, _ = model.apply(variables, images, train=False)
        return jnp.argmax(logits.astype(jnp.float32), axis=-1)

    def assemble(events_list, B):
        n = len(events_list)
        ev = np.zeros((B, cap, 4), np.float32)
        nv = np.zeros((B,), np.int32)
        rng = np.random.default_rng(0)
        for j in range(B):
            e, p_signed = events_list[j % n]
            # dsec_npy_loader semantics (dataset_folder.py:275-283 + the
            # seg pipeline's f32-rounded crop): p{0,1} -> ±1, y in [0, 440).
            # Structured payloads arrive already ±1 from _decode_events —
            # remapping those again would yield p in {-3, 1}
            y32 = e[:, 1].astype(np.float32)
            e = e[(y32 >= 0) & (y32 < SEG_H)].astype(np.float32)
            if not p_signed:
                e[:, 3] = 2 * e[:, 3] - 1
            m = e.shape[0]
            if m > cap:
                start = int(rng.integers(0, m - cap + 1))
                e = e[start:start + cap]
                m = cap
            if presort and m:
                e = e[np.argsort(e[:, 1], kind="stable")]
            ev[j, :m] = e
            nv[j] = m
        # no "label" key: serving consumes only images, and a (B, 440, 640)
        # int32 zero label map is ~9 MB of host->device traffic per dispatch
        # (~100-200 ms over the remote tunnel at its measured ~50 MB/s —
        # dwarfing the ~30 ms device time the --max_wait_ms knob targets)
        return {
            "events": ev, "n_valid": nv,
            "flip": np.zeros(B, bool),
            "aug_seed": np.zeros(B, np.uint32),
        }

    def unpack(j, outputs, queue_ms):
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(outputs[j].astype(np.uint8)).save(buf, format="PNG")
        return "image/png", buf.getvalue()

    return assemble, _fwd, unpack


def build_server(args):
    """Construct (httpd, state, threads); main() runs it, tests drive it
    programmatically. The jitted forward is compiled and warmed before
    this returns, so /healthz is green from the first request."""
    if args.int8:
        from mem_tpu.models import vit as _vit

        _vit.INT8_GEMM = True
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    build = _build_seg if args.surface == "seg" else _build_cls
    assemble, infer, unpack = build(args, dtype)

    state = ServeState(args, infer, assemble, unpack)
    # compile + warm before accepting traffic (SERVING.md scale-up lead
    # time: a replica is healthy only once the forward is cached)
    warm = np.zeros((8, 4), np.float64)
    warm[:, :2] = 1.0
    jax.block_until_ready(infer(assemble([(warm, False)], args.batch_size)))
    state.warm = True

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet access log
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, "warm": state.warm})
            elif self.path == "/stats":
                self._json(200, state.stats())
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = _Request(_decode_events(self.rfile.read(n)))
            except Exception as e:
                self._json(400, {"error": f"bad event payload: {e!r}"})
                return
            with state.cv:
                state.queue.append(req)
                state.cv.notify_all()
            req.done.wait()
            if req.error:
                self._json(500, {"error": req.error})
                return
            ctype, body = req.result
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("X-Queue-Ms", str(
                round((time.monotonic() - req.t_enq) * 1e3, 3)))
            self.end_headers()
            self.wfile.write(body)

    httpd = ThreadingHTTPServer((args.host, args.port), Handler)
    threads = (
        threading.Thread(target=state.run, name="dispatcher", daemon=True),
        threading.Thread(target=state.run_fetch, name="fetcher", daemon=True),
    )
    for t in threads:
        t.start()
    return httpd, state, threads


def main(argv=None):
    args = get_args(argv)
    httpd, state, threads = build_server(args)
    print(f"serving on http://{args.host}:{httpd.server_address[1]} "
          f"(B={args.batch_size}, max_wait={args.max_wait_ms}ms, "
          f"topk={args.topk})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        with state.cv:
            state.stop = True
            state.cv.notify_all()
        for t in threads:
            t.join(timeout=5)
        httpd.server_close()


if __name__ == "__main__":
    main()
