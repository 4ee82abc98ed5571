"""Aux utils: visualization, timm warm-start, metrics, profiling."""
import numpy as np
import pytest


def test_grid_and_event_rgb(rng):
    from mem_tpu.utils.visualize import event_image_to_rgb, grid

    imgs = [event_image_to_rgb(rng.random((16, 16, 3))) for _ in range(5)]
    g = grid(imgs, cols=3)
    assert g.dtype == np.uint8
    assert g.shape == (2 * 16 + 2, 3 * 16 + 2 * 2, 3)


def test_mask_overlay_dims_masked_patches(rng):
    from mem_tpu.utils.visualize import mask_overlay

    img = np.ones((32, 32, 3), np.float32)
    mask = np.zeros(4, bool)
    mask[0] = True  # top-left 16x16 patch masked
    out = mask_overlay(img, mask, patch=16)
    assert out[0, 0, 0] < out[0, 31, 0]


def test_colorize_labels_ignore(rng):
    from mem_tpu.utils.visualize import colorize_labels

    lab = np.array([[0, 1], [255, 2]])
    rgb = colorize_labels(lab)
    assert (rgb[1, 0] == 0).all()          # ignore -> black
    assert (rgb[0, 0] != rgb[0, 1]).any()  # distinct classes differ


def test_timm_warm_start_copies_subset(rng):
    import jax
    import jax.numpy as jnp

    from mem_tpu.models import create_model
    from mem_tpu.utils.timm_init import warm_start_from_timm

    model = create_model("pt_vit", vocab_size=16, img_size=(16, 16),
                         patch_size=(8, 8), embed_dim=8, depth=1, num_heads=2)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 4), bool)
    )
    sd = {
        "patch_embed.proj.weight": rng.standard_normal((8, 3, 8, 8)).astype(np.float32),
        "patch_embed.proj.bias": rng.standard_normal(8).astype(np.float32),
        "blocks.0.attn.qkv.weight": rng.standard_normal((24, 8)).astype(np.float32),
        "blocks.0.norm1.weight": np.ones(8, np.float32) * 2,
        "blocks.0.norm1.bias": np.zeros(8, np.float32),
        "norm.weight": np.ones(8, np.float32) * 3,
        "norm.bias": np.zeros(8, np.float32),
        "pos_embed": rng.standard_normal((1, 5, 8)).astype(np.float32),  # not copied
    }
    out = warm_start_from_timm(params, sd)
    np.testing.assert_array_equal(
        np.asarray(out["params"]["patch_embed"]["proj"]["kernel"]),
        sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(
        np.asarray(out["params"]["encoder"]["blocks_0"]["attn"]["qkv_kernel"]),
        sd["blocks.0.attn.qkv.weight"].T,
    )
    np.testing.assert_array_equal(np.asarray(out["params"]["norm"]["scale"]), sd["norm.weight"])
    # untouched leaves stay identical
    np.testing.assert_array_equal(
        np.asarray(out["params"]["mask_token"]), np.asarray(params["params"]["mask_token"])
    )


def test_metric_logger_and_smoothed_value():
    from mem_tpu.utils.metrics import MetricLogger, SmoothedValue

    v = SmoothedValue(window_size=3)
    for x in (1, 2, 3, 4):
        v.update(x)
    assert v.median == 3 and v.avg == 3
    assert v.global_avg == 2.5
    assert v.max == 4 and v.value == 4

    log = MetricLogger()
    log.update(loss=1.0)
    log.update(loss=3.0)
    assert log.meters["loss"].global_avg == 2.0
    assert "loss" in str(log)


def test_step_timer_excludes_warmup():
    import time

    from mem_tpu.utils.profiling import StepTimer

    t = StepTimer(batch_size=10, warmup=2)
    assert t.step() is None
    assert t.step() is None  # warmup boundary: timer starts
    time.sleep(0.05)
    rate = t.step()
    assert rate is not None and 0 < rate < 10 / 0.04


def test_async_checkpoint_donation_safe(tmp_path):
    """block=False must copy the data before returning (the train loops
    DONATE the state into the next step right after queueing the save) and
    the committed checkpoint must round-trip; meta.json sidecar included."""
    import jax.numpy as jnp

    from mem_tpu.utils.checkpoint import (latest_checkpoint, load_checkpoint,
                                          save_checkpoint, wait_for_saves)

    d = str(tmp_path / "ck")
    x = jnp.arange(8192.0).reshape(64, 128)
    want = np.asarray(x).copy()
    save_checkpoint(d, 3, {"params": {"w": x}, "epoch": 3,
                           "hparams": {"loss": "mse"}}, block=False)
    x.delete()  # simulate donation of the source buffer
    wait_for_saves()
    path = latest_checkpoint(d)
    assert path.endswith("checkpoint-3")
    out = load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]), want)
    assert int(np.asarray(out["epoch"])) == 3
    assert out["hparams"]["loss"] == "mse"
