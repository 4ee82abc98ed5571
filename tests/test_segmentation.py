"""Segmentation model + pipeline tests, incl. a tiny end-to-end train run."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_adaptive_pool_matrix_matches_torch():
    torch = pytest.importorskip("torch")
    from mem_tpu.models.segmentation import adaptive_pool_matrix

    rng = np.random.default_rng(0)
    x = rng.random((1, 3, 32, 32)).astype(np.float32)
    for s in (1, 2, 3, 6):
        want = torch.nn.functional.adaptive_avg_pool2d(torch.from_numpy(x), s).numpy()
        py = adaptive_pool_matrix(s, 32)
        got = np.einsum("oh,bchw->bcow", py, x)
        got = np.einsum("pw,bcow->bcop", py, got)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_seg_loss_ignore_index(rng):
    from mem_tpu.models.segmentation import seg_loss

    logits = jnp.asarray(rng.standard_normal((1, 4, 4, 3)), jnp.float32)
    aux = jnp.zeros_like(logits)
    labels = jnp.full((1, 4, 4), 255)
    labels = labels.at[0, 0, 0].set(1)
    loss = seg_loss(logits, aux, labels, 3)
    lp = jax.nn.log_softmax(logits[0, 0, 0])[1]
    lpa = jax.nn.log_softmax(aux[0, 0, 0])[1]
    np.testing.assert_allclose(float(loss), -float(lp) - 0.4 * float(lpa), rtol=1e-5)


def test_confusion_and_metrics(rng):
    from mem_tpu.models.segmentation import confusion_matrix, seg_metrics

    labels = jnp.asarray([[0, 1, 2, 255]])
    pred = jnp.asarray([[0, 2, 2, 0]])
    cm = np.asarray(confusion_matrix(pred, labels, 3))
    assert cm[0, 0] == 1 and cm[1, 2] == 1 and cm[2, 2] == 1
    assert cm.sum() == 3  # ignore dropped
    m = seg_metrics(cm)
    np.testing.assert_allclose(m["aAcc"], 2 / 3)
    # predictions at ignored pixels are excluded entirely (mmseg semantics):
    # class 0 has tp=1, fp=0 (the pred-0 at the ignored pixel doesn't count)
    np.testing.assert_allclose(m["IoU"][0], 1.0)
    np.testing.assert_allclose(m["IoU"][1], 0.0)   # the one gt-1 pixel missed
    np.testing.assert_allclose(m["IoU"][2], 1 / 2)  # tp=1, fp=1


def test_encoder_decoder_shapes(rng):
    from mem_tpu.models.segmentation import EncoderDecoder

    model = EncoderDecoder(
        num_classes=5,
        backbone_cfg=dict(img_size=64, patch_size=16, embed_dim=32, depth=2,
                          num_heads=2, out_indices=(0, 1, 0, 1)),
    )
    x = jnp.asarray(rng.random((2, 56, 72, 3)), jnp.float32) * 255
    variables = jax.jit(model.init)(jax.random.key(0), x)
    (logits, aux), new_state = model.apply(
        variables, x, train=True, rngs={"dropout": jax.random.key(1)},
        mutable=["batch_stats"],
    )
    assert logits.shape == (2, 56, 72, 5)
    assert aux.shape == (2, 56, 72, 5)
    assert "batch_stats" in new_state


def test_seg_preprocess_batch_ops_mode(rng):
    """batch_ops RandAugment (shared op choice per round) is shape/range
    compatible with the per-sample mode and respects the flip flags."""
    from mem_tpu.data.seg_pipeline import seg_preprocess_batch

    B, N, H, W = 2, 500, 440, 640
    ev = np.zeros((B, N, 4), np.float32)
    ev[..., 0] = rng.integers(0, W, (B, N))
    ev[..., 1] = rng.integers(0, H, (B, N))
    ev[..., 3] = rng.choice([-1.0, 1.0], (B, N))
    batch = {
        "events": jnp.asarray(ev),
        "n_valid": jnp.full((B,), N, jnp.int32),
        "label": jnp.asarray(rng.integers(0, 11, (B, H, W)), jnp.int32),
        "flip": jnp.asarray([False, True]),
        "aug_seed": jnp.arange(B, dtype=jnp.uint32),
    }
    for batch_ops in (False, True):
        imgs, labels = jax.jit(
            lambda b: seg_preprocess_batch(b, True, True, batch_ops)
        )(batch)
        assert imgs.shape == (B, H, W, 3) and labels.shape == (B, H, W)
        assert float(imgs.min()) >= 0.0 and float(imgs.max()) <= 255.0
        # sample 1 label is mirrored, sample 0 untouched
        np.testing.assert_array_equal(np.asarray(labels[0]), np.asarray(batch["label"][0]))
        np.testing.assert_array_equal(
            np.asarray(labels[1]), np.asarray(batch["label"][1])[:, ::-1])


@pytest.fixture(scope="module")
def synth_seg_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("dsec")
    rng = np.random.default_rng(5)
    from PIL import Image

    for split, n in (("train", 6), ("val", 2)):
        (root / "imgs" / split / "seq0").mkdir(parents=True)
        (root / "anns" / split / "seq0").mkdir(parents=True)
        for i in range(n):
            ne = int(rng.integers(2000, 5000))
            ev = np.zeros((ne, 4), np.float32)
            ev[:, 0] = rng.integers(0, 640, ne)
            ev[:, 1] = rng.integers(0, 480, ne)  # includes y>=440 to be cropped
            ev[:, 3] = rng.integers(0, 2, ne)
            np.save(root / "imgs" / split / "seq0" / f"{i:06d}.npy", ev)
            lab = rng.integers(0, 3, (440, 640)).astype(np.uint8)
            lab[:10] = 255  # ignore band
            Image.fromarray(lab).save(root / "anns" / split / "seq0" / f"{i:06d}.png")
    return str(root)


def test_seg_train_smoke(synth_seg_dataset, tmp_path):
    from mem_tpu.cli.train_seg import main

    out = str(tmp_path / "seg")
    main([
        "--data_root", synth_seg_dataset, "--output_dir", out,
        "--num_classes", "3",
        "--seg_input_size", "64", "--embed_dim", "32", "--depth", "2",
        "--num_heads", "2",
        "--max_iters", "3", "--batch_size", "8", "--lr", "1e-3",
        "--warmup_iters", "1", "--eval_interval", "1000",
        "--save_interval", "1000", "--rand_aug", "1",
        "--slice_max_evs", "5000",
        "--auto_resume", "0", "--dtype", "float32",
        "--dump_samples_dir", str(tmp_path / "segdump"),
        "--dump_samples_n", "4",
    ])
    assert os.path.isdir(os.path.join(out, "checkpoint-final"))
    # SaveToDisk-role debug dump: image | colorized-ann panels
    assert len(os.listdir(tmp_path / "segdump")) == 4

    # eval CLI on the trained checkpoint (tools/test.py surface)
    from mem_tpu.cli.test_seg import main as test_main

    test_main([
        "--data_root", synth_seg_dataset,
        "--checkpoint", os.path.join(out, "checkpoint-final"),
        "--num_classes", "3",
        "--seg_input_size", "64", "--embed_dim", "32", "--depth", "2",
        "--num_heads", "2", "--batch_size", "8",
        "--slice_max_evs", "5000", "--dtype", "float32",
        "--save_dir", str(tmp_path / "preds"),
    ])
    assert len(os.listdir(tmp_path / "preds")) == 2  # two val frames dumped


def test_seg_tta_eval(synth_seg_dataset, tmp_path):
    """Multi-scale/flip TTA surface (MyMultiScaleFlipAug role,
    EventDataset.py:1050-1141): 2 scales x {plain, hflip} passes through
    test_seg --aug_test. Uses a directly-saved random checkpoint (training
    is covered by the smoke; a train-mode preprocess run costs ~75 s on
    this 1-core CPU)."""
    import jax
    import jax.numpy as jnp

    from mem_tpu.cli.test_seg import main as test_main
    from mem_tpu.models.segmentation import EncoderDecoder
    from mem_tpu.utils.checkpoint import save_checkpoint

    model = EncoderDecoder(
        num_classes=3,
        backbone_cfg=dict(img_size=64, embed_dim=32, depth=2, num_heads=2,
                          # test_seg's formula: max(0, depth-4+k) for k<4
                          out_indices=(0, 0, 0, 1)),
        dtype=jnp.float32,
    )
    import functools
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.key(0), jnp.zeros((1, 440, 640, 3), jnp.float32))
    ck = str(tmp_path / "ck")
    save_checkpoint(ck, "final", {
        "params": jax.tree.map(np.asarray, variables["params"]),
        "batch_stats": jax.tree.map(np.asarray, variables["batch_stats"]),
    })
    test_main([
        "--data_root", synth_seg_dataset,
        "--checkpoint", os.path.join(ck, "checkpoint-final"),
        "--num_classes", "3",
        "--seg_input_size", "64", "--embed_dim", "32", "--depth", "2",
        "--num_heads", "2", "--batch_size", "8",
        "--slice_max_evs", "5000", "--dtype", "float32",
        "--aug_test", "1", "--aug_scales", "1.0,0.5", "--aug_flip", "1",
    ])


def test_run_ss_orchestration(synth_seg_dataset, tmp_path):
    """run-ss.sh: .conf -> trained seg ckpt -> per-class mIoU table
    (the reference run-ss.sh stage-chaining role)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = tmp_path / "seg.conf"
    conf.write_text(
        "expweek = test\n"
        "expname = ss\n"
        f"data_root = {synth_seg_dataset}\n"
        "num_classes = 3\n"
        "seg_input_size = 64\n"
        "embed_dim = 32\n"
        "depth = 2\n"
        "num_heads = 2\n"
        "max_iters = 1\n"
        "batch_size = 8\n"
        "lr = 1e-3\n"
        "warmup_iters = 1\n"
        "eval_interval = 1000\n"
        "save_interval = 1000\n"
        "rand_aug = 0\n"
        "slice_max_evs = 5000\n"
        "auto_resume = 0\n"
        "dtype = float32\n"
        "aug_test = 0\n"
    )
    expdir = tmp_path / "exp"
    env = dict(os.environ)
    env.update({
        "PYTHONPATH": repo, "JAX_PLATFORMS": "cpu",
        # 2 virtual devices, not 8: this test's subject is run-ss.sh stage
        # chaining (8-way DP is covered in-process by test_seg_train_smoke);
        # on a loaded 1-core box an 8-thread XLA:CPU collective rendezvous
        # can starve past its hardcoded 40 s abort (exit 134 flake seen in
        # full-suite runs)
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_test_cache",
        "PYTHON": sys.executable,
    })
    r = subprocess.run(
        ["bash", os.path.join(repo, "run-ss.sh"), str(conf), str(expdir)],
        env=env, cwd=repo, capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert os.path.isdir(expdir / "seg" / "checkpoint-final")
    assert "mIoU" in r.stdout  # per-class table printed by test_seg


def test_resize_jitter_matches_resize_then_crop_oracle(rng):
    """The fused window resample (apply_resize_jitter) equals the mmseg
    semantics it replaces — full resize to (round(H r), round(W r)) with
    center-aligned bilinear (nearest for labels), then crop at (oy, ox)
    (dsec.py:13 Resize ratio_range + RandomCrop) — computed here by a plain
    numpy oracle over the full scaled canvas."""
    from mem_tpu.data.seg_pipeline import apply_resize_jitter

    H, W = 44, 64

    def oracle(img, label, r_h, r_w, oy, ox):
        oy, ox = int(oy), int(ox)
        hs, ws = int(round(H * r_h)), int(round(W * r_w))
        # f32 coordinate math, matching the device kernel (nearest-neighbor
        # ties at exactly-.5 coordinates are precision-sensitive)
        yy = np.clip((np.arange(hs, dtype=np.float32) + np.float32(0.5))
                     / np.float32(r_h) - np.float32(0.5), 0, H - 1)
        xx = np.clip((np.arange(ws, dtype=np.float32) + np.float32(0.5))
                     / np.float32(r_w) - np.float32(0.5), 0, W - 1)
        y0 = np.floor(yy).astype(int); wy = yy - y0
        y1 = np.minimum(y0 + 1, H - 1)
        x0 = np.floor(xx).astype(int); wx = xx - x0
        x1 = np.minimum(x0 + 1, W - 1)
        a = img[y0] * (1 - wy)[:, None, None] + img[y1] * wy[:, None, None]
        big = (a[:, x0] * (1 - wx)[None, :, None]
               + a[:, x1] * wx[None, :, None])
        ly = np.clip(np.round(yy), 0, H - 1).astype(int)
        lx = np.clip(np.round(xx), 0, W - 1).astype(int)
        lab_big = label[ly][:, lx]
        return big[oy:oy + H, ox:ox + W], lab_big[oy:oy + H, ox:ox + W]

    B = 3
    img = rng.random((B, H, W, 3)).astype(np.float32) * 255
    label = rng.integers(0, 11, (B, H, W)).astype(np.int32)
    rj = np.zeros((B, 4), np.float32)
    # sample 0: identity (r=1, o=0) must pass through exactly
    rj[0] = [1.0, 1.0, 0, 0]
    for b in range(1, B):
        r = rng.uniform(1.0, 1.25)  # wider than prod (1.01) to stress it
        hs, ws = int(H * r + 0.5), int(W * r + 0.5)
        rj[b] = [hs / H, ws / W,
                 rng.integers(0, hs - H + 1), rng.integers(0, ws - W + 1)]

    got_img, got_lab = jax.jit(apply_resize_jitter)(
        jnp.asarray(img), jnp.asarray(label), jnp.asarray(rj))
    np.testing.assert_allclose(np.asarray(got_img[0]), img[0], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got_lab[0]), label[0])
    for b in range(1, B):
        want_img, want_lab = oracle(img[b], label[b], *rj[b])
        np.testing.assert_allclose(np.asarray(got_img[b]), want_img,
                                   atol=1e-3)
        np.testing.assert_array_equal(np.asarray(got_lab[b]), want_lab)


def test_seg_iterator_emits_resize_jitter_only_for_train(tmp_path):
    from mem_tpu.data.seg_pipeline import (SegBatchIterator,
                                           SegPipelineConfig, SEG_H, SEG_W)
    from PIL import Image

    rng = np.random.default_rng(0)
    (tmp_path / "imgs/train/s").mkdir(parents=True)
    (tmp_path / "anns/train/s").mkdir(parents=True)
    for i in range(2):
        ev = np.zeros((100, 4), np.float32)
        ev[:, 0] = rng.integers(0, SEG_W, 100)
        ev[:, 1] = rng.integers(0, SEG_H, 100)
        ev[:, 3] = rng.integers(0, 2, 100)
        np.save(tmp_path / f"imgs/train/s/{i}.npy", ev)
        Image.fromarray(rng.integers(0, 11, (SEG_H, SEG_W), dtype=np.uint8)
                        ).save(tmp_path / f"anns/train/s/{i}.png")

    from mem_tpu.data.seg_pipeline import scan_seg_pairs

    pairs = scan_seg_pairs(str(tmp_path), "imgs/train", "anns/train")
    train = SegBatchIterator(pairs, SegPipelineConfig(batch_size=2))
    b = next(iter(train.batches()))
    rj = b["resize_jitter"]
    assert rj.shape == (2, 4)
    assert (rj[:, :2] >= 1.0).all() and (rj[:, :2] <= 1.02).all()
    hs = np.round(rj[:, 0] * SEG_H)
    assert (rj[:, 2] <= hs - SEG_H).all() and (rj[:, 2] >= 0).all()

    ev_it = SegBatchIterator(pairs, SegPipelineConfig(batch_size=2,
                                                      is_train=False))
    assert "resize_jitter" not in next(iter(ev_it.eval_batches()))


def test_tta_probs_matches_oracle(rng):
    """tta_probs (mmseg aug_test semantics) vs a hand-computed oracle on a
    stub segmentor: scales [0.75, 1.0, 1.25] x {plain, flip} — and the
    single-scale/no-flip configuration must reduce EXACTLY to plain
    softmax(logits) (the shipped DSEC config, dsec.py:32-34)."""
    import jax
    import jax.numpy as jnp

    from mem_tpu.models.segmentation import tta_probs

    B, H, W, C = 2, 16, 24, 5
    k = jnp.asarray(rng.standard_normal((3, C)), jnp.float32)

    def apply_fn(x):  # any resolution -> per-pixel logits, flip-sensitive
        base = jnp.einsum("bhwc,cd->bhwd", x, k)
        ramp = jnp.linspace(0.0, 1.0, x.shape[2])[None, None, :, None]
        return base + ramp  # horizontal ramp breaks flip symmetry

    images = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)

    # single scale, no flip == plain inference
    single = tta_probs(apply_fn, images, C, [1.0], [False])
    np.testing.assert_allclose(
        np.asarray(single),
        np.asarray(jax.nn.softmax(apply_fn(images), axis=-1)), atol=1e-6)

    # full TTA vs oracle
    scales, flips = [0.75, 1.0, 1.25], [False, True]
    got = np.asarray(tta_probs(apply_fn, images, C, scales, flips))
    want = np.zeros_like(got)
    for s in scales:
        sh, sw = int(round(H * s)), int(round(W * s))
        xs = images if (sh, sw) == (H, W) else jax.image.resize(
            images, (B, sh, sw, 3), method="bilinear")
        for fl in flips:
            x = xs[:, :, ::-1] if fl else xs
            p = jax.nn.softmax(apply_fn(x).astype(jnp.float32), -1)
            if fl:
                p = p[:, :, ::-1]
            if (sh, sw) != (H, W):
                p = jax.image.resize(p, (B, H, W, C), method="bilinear")
            want += np.asarray(p)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # each pass contributes a probability simplex -> sum over classes = #passes
    np.testing.assert_allclose(got.sum(-1), len(scales) * len(flips),
                               rtol=1e-5)
    # TTA must actually differ from single-scale for this flip-sensitive net
    assert np.abs(got / 6.0 - np.asarray(single)).max() > 1e-3


# ---------------------------------------------------------------------------
# Reference-checkpoint ingest for the seg backbone
# (mmcv_custom/train_api.py:345-402, 502-523 + mmcv_custom/checkpoint.py:330-480)

def _pretrain_style_sd(rng, D=32, heads=2, depth=2, window=4, in_chans=3):
    """A reference MEM-pretrain-shaped state_dict: SHARED rel-pos table,
    mask_token + lm_head (to be dropped), decomposed q/v bias."""
    sd = {
        "patch_embed.proj.weight": rng.standard_normal((D, in_chans, 16, 16)).astype(np.float32),
        "patch_embed.proj.bias": rng.standard_normal(D).astype(np.float32),
        "cls_token": rng.standard_normal((1, 1, D)).astype(np.float32),
        "mask_token": rng.standard_normal((1, 1, D)).astype(np.float32),
        "rel_pos_bias.relative_position_bias_table":
            rng.standard_normal(((2 * window - 1) ** 2 + 3, heads)).astype(np.float32),
        "lm_head.weight": rng.standard_normal((8, D)).astype(np.float32),
        "lm_head.bias": rng.standard_normal(8).astype(np.float32),
        "norm.weight": np.ones(D, np.float32),
        "norm.bias": np.zeros(D, np.float32),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        sd[f"{b}.norm1.weight"] = np.ones(D, np.float32)
        sd[f"{b}.norm1.bias"] = np.zeros(D, np.float32)
        sd[f"{b}.norm2.weight"] = np.ones(D, np.float32)
        sd[f"{b}.norm2.bias"] = np.zeros(D, np.float32)
        sd[f"{b}.attn.qkv.weight"] = rng.standard_normal((3 * D, D)).astype(np.float32)
        sd[f"{b}.attn.q_bias"] = rng.standard_normal(D).astype(np.float32)
        sd[f"{b}.attn.v_bias"] = rng.standard_normal(D).astype(np.float32)
        sd[f"{b}.attn.proj.weight"] = rng.standard_normal((D, D)).astype(np.float32)
        sd[f"{b}.attn.proj.bias"] = rng.standard_normal(D).astype(np.float32)
        sd[f"{b}.mlp.fc1.weight"] = rng.standard_normal((4 * D, D)).astype(np.float32)
        sd[f"{b}.mlp.fc1.bias"] = rng.standard_normal(4 * D).astype(np.float32)
        sd[f"{b}.mlp.fc2.weight"] = rng.standard_normal((D, 4 * D)).astype(np.float32)
        sd[f"{b}.mlp.fc2.bias"] = rng.standard_normal(D).astype(np.float32)
        sd[f"{b}.gamma_1"] = rng.standard_normal(D).astype(np.float32)
        sd[f"{b}.gamma_2"] = rng.standard_normal(D).astype(np.float32)
    return sd


SEG_TINY = [
    "--num_classes", "3",
    "--seg_input_size", "64", "--embed_dim", "32", "--depth", "2",
    "--num_heads", "2",
    "--max_iters", "1", "--batch_size", "8",  # divisible over the 8-dev mesh
    # lr 0 + wd 0: the single "training" step is a no-op, so checkpoint-final
    # holds exactly the ingested backbone weights for leaf-level assertions
    "--lr", "0", "--weight_decay", "0",
    "--warmup_iters", "0", "--eval_interval", "1000",
    "--save_interval", "1000", "--rand_aug", "0",
    "--slice_max_evs", "5000",
    "--auto_resume", "0", "--dtype", "float32",
]


def test_seg_pretrained_pth_ingest(synth_seg_dataset, tmp_path, capsys):
    """train_seg --pretrained <MEM .pth>: model_key probe, shared->per-block
    rel-pos expansion, mask_token/lm_head drop — the reference handshake at
    train_api.py:502-523 (which backbone.-prefixes MEM keys to match the
    mmseg model; here the importer targets the backbone subtree directly)."""
    import torch

    from mem_tpu.cli.train_seg import main
    from mem_tpu.utils.checkpoint import load_checkpoint

    rng = np.random.default_rng(17)
    sd = _pretrain_style_sd(rng)
    pth = str(tmp_path / "mem_pt.pth")
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}}, pth)

    out = str(tmp_path / "seg_pth")
    main(["--data_root", synth_seg_dataset, "--output_dir", out,
          "--pretrained", pth, *SEG_TINY])
    assert "backbone initialized from" in capsys.readouterr().out

    payload = load_checkpoint(os.path.join(out, "checkpoint-final"))
    bb = payload["params"]["backbone"]
    np.testing.assert_allclose(
        np.asarray(bb["encoder"]["blocks_1"]["attn"]["qkv_kernel"]),
        sd["blocks.1.attn.qkv.weight"].T, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(bb["patch_embed"]["proj"]["kernel"]),
        np.transpose(sd["patch_embed.proj.weight"], (2, 3, 1, 0)), atol=1e-6)
    # shared table expanded into BOTH per-block tables (same 4x4 window ->
    # copied verbatim, checkpoint.py:360-366)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(bb["encoder"][f"blocks_{i}"]["attn"]["rel_pos"]
                       ["relative_position_bias_table"]),
            sd["rel_pos_bias.relative_position_bias_table"], atol=1e-6)


def test_seg_pretrained_backbone_prefixed_pth(tmp_path):
    """A reference SEG checkpoint (keys already backbone.-prefixed, plus DDP
    module. wrap) reduces to plain backbone naming
    (mmcv_custom/checkpoint.py:344-351)."""
    from mem_tpu.utils.torch_import import normalize_backbone_state_dict

    rng = np.random.default_rng(3)
    sd = _pretrain_style_sd(rng, depth=1)
    wrapped = {f"module.backbone.{k}": v for k, v in sd.items()}
    wrapped["module.decode_head.conv_seg.weight"] = np.zeros((3, 8, 1, 1), np.float32)
    got = normalize_backbone_state_dict(wrapped)
    assert set(got) == set(sd)  # head keys dropped, prefixes stripped
    # MEM pretraining checkpoints (no backbone. keys) pass through unchanged
    assert normalize_backbone_state_dict(sd) is sd or \
        set(normalize_backbone_state_dict(sd)) == set(sd)


def test_seg_pretrained_npz_ingest(synth_seg_dataset, tmp_path, capsys):
    """train_seg --pretrained <timm .npz> (load_checkpoint_npz,
    train_api.py:345-373): jax-ViT naming fuses q/k/v into the qkv kernel;
    only name-matching backbone keys transfer (pos_embed/norm/head skipped,
    copy_tmpModelTimm_to_semsegBackbone:105-142)."""
    from mem_tpu.cli.train_seg import main
    from mem_tpu.utils.checkpoint import load_checkpoint

    rng = np.random.default_rng(23)
    D, H_, hd, depth = 32, 2, 16, 2
    z = {
        "embedding/kernel": rng.standard_normal((16, 16, 3, D)).astype(np.float32),
        "embedding/bias": rng.standard_normal(D).astype(np.float32),
        "cls": rng.standard_normal((1, 1, D)).astype(np.float32),
        "Transformer/posembed_input/pos_embedding":
            rng.standard_normal((1, 17, D)).astype(np.float32),
        "Transformer/encoder_norm/scale": np.ones(D, np.float32),
        "Transformer/encoder_norm/bias": np.zeros(D, np.float32),
        "head/kernel": rng.standard_normal((D, 10)).astype(np.float32),
        "head/bias": rng.standard_normal(10).astype(np.float32),
    }
    for i in range(depth):
        b = f"Transformer/encoderblock_{i}"
        a = f"{b}/MultiHeadDotProductAttention_1"
        z[f"{b}/LayerNorm_0/scale"] = np.ones(D, np.float32)
        z[f"{b}/LayerNorm_0/bias"] = np.zeros(D, np.float32)
        z[f"{b}/LayerNorm_2/scale"] = np.ones(D, np.float32)
        z[f"{b}/LayerNorm_2/bias"] = np.zeros(D, np.float32)
        for n in ("query", "key", "value"):
            z[f"{a}/{n}/kernel"] = rng.standard_normal((D, H_, hd)).astype(np.float32)
            z[f"{a}/{n}/bias"] = rng.standard_normal((H_, hd)).astype(np.float32)
        z[f"{a}/out/kernel"] = rng.standard_normal((H_, hd, D)).astype(np.float32)
        z[f"{a}/out/bias"] = rng.standard_normal(D).astype(np.float32)
        z[f"{b}/MlpBlock_3/Dense_0/kernel"] = rng.standard_normal((D, 4 * D)).astype(np.float32)
        z[f"{b}/MlpBlock_3/Dense_0/bias"] = rng.standard_normal(4 * D).astype(np.float32)
        z[f"{b}/MlpBlock_3/Dense_1/kernel"] = rng.standard_normal((4 * D, D)).astype(np.float32)
        z[f"{b}/MlpBlock_3/Dense_1/bias"] = rng.standard_normal(D).astype(np.float32)
    npz = str(tmp_path / "B_16-i1k.npz")
    np.savez(npz, **z)

    out = str(tmp_path / "seg_npz")
    main(["--data_root", synth_seg_dataset, "--output_dir", out,
          "--pretrained", npz, *SEG_TINY])
    assert "loading timm npz checkpoint" in capsys.readouterr().out

    payload = load_checkpoint(os.path.join(out, "checkpoint-final"))
    bb = payload["params"]["backbone"]
    # fused qkv kernel: columns ordered q;k;v, each (D,H,hd) flattened
    want = np.concatenate(
        [z[f"Transformer/encoderblock_0/MultiHeadDotProductAttention_1/{n}/kernel"]
         .reshape(D, -1) for n in ("query", "key", "value")], axis=1)
    np.testing.assert_allclose(
        np.asarray(bb["encoder"]["blocks_0"]["attn"]["qkv_kernel"]),
        want, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(bb["encoder"]["blocks_0"]["attn"]["proj"]["kernel"]),
        z["Transformer/encoderblock_0/MultiHeadDotProductAttention_1/out/kernel"]
        .reshape(-1, D), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(bb["patch_embed"]["proj"]["kernel"]),
        z["embedding/kernel"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(bb["cls_token"]), z["cls"], atol=1e-6)


def test_seg_schedule_320k():
    """The reference's second seg schedule (configs/_base_/schedules/
    schedule_320k.py: poly power 0.9, max_iters 320000, by_epoch=False) is
    just --max_iters 320000 on this CLI — assert the flag parses and the
    poly decay actually spans the 320k horizon."""
    from mem_tpu.cli.train_seg import get_args, poly_lr_schedule

    args = get_args(["--data_root", "/nonexistent",
                     "--max_iters", "320000", "--lr", "1e-2"])
    assert args.max_iters == 320000
    # exactly main()'s wiring (train_seg.py:256): poly power 1.0 like the
    # MEM seg config (mem_224_160k.py lr_config), horizon from --max_iters
    fn = poly_lr_schedule(args.lr, args.max_iters,
                          warmup_iters=args.warmup_iters)
    lr0 = float(fn(args.warmup_iters))      # decay start
    lr_mid = float(fn(160_000))
    lr_end = float(fn(320_000))
    assert lr0 == pytest.approx(args.lr, rel=2e-2)
    # linear-poly midpoint of the 320k horizon, not a 160k schedule's end
    assert lr_mid == pytest.approx(args.lr * 0.5, rel=1e-2)
    assert lr_end == pytest.approx(0.0, abs=1e-9)


def test_seg_pretrained_pt21k_refused():
    """PT21k needs the timm hub (train_api.py:377-402) — zero egress here,
    so the CLI must explain instead of hanging on a download."""
    from mem_tpu.cli.train_seg import main

    with pytest.raises(SystemExit, match="PT21k"):
        main(["--data_root", "/nonexistent", "--pretrained", "PT21k",
              *SEG_TINY])


def test_seg_native_loader_matches_python(synth_seg_dataset):
    """memev_load_batch_dsec == the python seg loader as a row MULTISET per
    sample (both sort by y; order among equal y is unspecified on both
    paths — np.argsort introsort vs C counting sort): same crop, slice
    window, polarity remap, int16 wire, label decode, n_valid."""
    from mem_tpu import native
    from mem_tpu.data.seg_pipeline import (SegBatchIterator,
                                           SegPipelineConfig, scan_seg_pairs)

    if not native.available():
        pytest.skip("toolchain unavailable")
    pairs = scan_seg_pairs(synth_seg_dataset, "imgs/train", "anns/train")

    def batch_for(use_native, cap):
        cfg = SegPipelineConfig(batch_size=4, num_workers=0, seed=7,
                                max_evs=cap, use_native=use_native)
        it = SegBatchIterator(pairs, cfg)
        assert it._native_eligible() == use_native
        return next(it.batches(start_iter=0))

    for cap in (100000, 1500):   # under-cap and slicing regimes
        a, b = batch_for(False, cap), batch_for(True, cap)
        assert set(a) == set(b)
        np.testing.assert_array_equal(a["n_valid"], b["n_valid"])
        np.testing.assert_array_equal(a["label"], b["label"])
        for i in range(4):
            m = int(a["n_valid"][i])
            ra = a["events_xyp"][i][:m]
            rb = b["events_xyp"][i][:m]
            if cap >= 100000:  # no slicing: windows identical -> multiset
                key = lambda e: np.lexsort((e[:, 2], e[:, 0], e[:, 1]))
                np.testing.assert_array_equal(ra[key(ra)], rb[key(rb)])
            # y-sorted on both paths either way
            assert (np.diff(ra[:, 1].astype(np.int32)) >= 0).all()
            assert (np.diff(rb[:, 1].astype(np.int32)) >= 0).all()
            np.testing.assert_array_equal(a["events_xyp"][i][m:],
                                          b["events_xyp"][i][m:])


def test_seg_loader_corrupt_y_rows(tmp_path):
    """Out-of-spec DSEC rows (negative y, NaN y, f64 y just under 440 that
    ROUNDS UP to 440 in f32) must be dropped identically by the python and
    native loaders — never crash, never emit a wire row with y outside
    [0, 440). Regression for the counting-sort OOB write on
    size_t(int64_t(-1)) and the f32-rounding crop mismatch."""
    from PIL import Image

    from mem_tpu import native
    from mem_tpu.data.seg_pipeline import (SEG_H, SegBatchIterator,
                                           SegPipelineConfig)

    (tmp_path / "imgs" / "train" / "s").mkdir(parents=True)
    (tmp_path / "anns" / "train" / "s").mkdir(parents=True)
    ev = np.zeros((8, 4), np.float64)
    ev[:, 0] = [0, 1, 2, 3, 4, 5, 6, 7]
    # kept: 0, 10, 439, 439.4 (truncates to 439)
    # dropped: -1, NaN, 440, 439.99999999999 (f32-rounds to 440.0)
    ev[:, 1] = [0.0, -1.0, 10.0, np.nan, 440.0, 439.0,
                np.nextafter(440.0, 0.0), 439.4]
    ev[:, 3] = [0, 1, 0, 1, 0, 1, 0, 1]
    np.save(tmp_path / "imgs" / "train" / "s" / "000000.npy", ev)
    lab = np.zeros((440, 640), np.uint8)
    Image.fromarray(lab).save(tmp_path / "anns" / "train" / "s" / "000000.png")
    pairs = [(str(tmp_path / "imgs" / "train" / "s" / "000000.npy"),
              str(tmp_path / "anns" / "train" / "s" / "000000.png"))]

    batches = {}
    for use_native in (False, True):
        if use_native and not native.available():
            pytest.skip("toolchain unavailable")
        cfg = SegPipelineConfig(batch_size=1, num_workers=0, seed=3,
                                max_evs=100, use_native=use_native)
        b = next(SegBatchIterator(pairs, cfg).batches(start_iter=0))
        assert int(b["n_valid"][0]) == 4
        rows = b["events_xyp"][0][:4]
        assert set(rows[:, 0].tolist()) == {0, 2, 5, 7}
        assert (rows[:, 1] >= 0).all() and (rows[:, 1] < SEG_H).all()
        batches[use_native] = rows
    key = lambda e: np.lexsort((e[:, 2], e[:, 0], e[:, 1]))
    np.testing.assert_array_equal(batches[False][key(batches[False])],
                                  batches[True][key(batches[True])])
