"""Optimizer parity vs torch AdamW + layer-decay assignment tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mem_tpu.train.optim import (
    build_lr_scale_tree,
    build_wd_mask_tree,
    create_optimizer,
    get_num_layer_for_vit,
    layer_decay_values,
)
from mem_tpu.train.schedules import cosine_scheduler, as_schedule_fn

torch = pytest.importorskip("torch")


def test_layer_id_assignment():
    L = 12
    n = L + 2
    assert get_num_layer_for_vit(("params", "cls_token"), n) == 0
    assert get_num_layer_for_vit(("params", "patch_embed", "proj", "kernel"), n) == 0
    assert get_num_layer_for_vit(("params", "encoder", "blocks_0", "attn", "qkv_kernel"), n) == 1
    assert get_num_layer_for_vit(("params", "encoder", "blocks_11", "mlp", "fc2", "kernel"), n) == 12
    assert get_num_layer_for_vit(("params", "encoder", "rel_pos_bias", "relative_position_bias_table"), n) == n - 1
    assert get_num_layer_for_vit(("params", "head", "kernel"), n) == n - 1


def test_layer_decay_values():
    vals = layer_decay_values(0.9, 12)
    assert len(vals) == 14
    np.testing.assert_allclose(vals[-1], 1.0)
    np.testing.assert_allclose(vals[0], 0.9**13)


def test_wd_mask():
    params = {
        "params": {
            "cls_token": jnp.zeros((1, 1, 8)),
            "blocks_0": {"fc1": {"kernel": jnp.zeros((8, 8)), "bias": jnp.zeros(8)}},
            "norm": {"scale": jnp.zeros(8)},
        }
    }
    mask = build_wd_mask_tree(params)
    assert mask["params"]["cls_token"] == 0.0  # skip list
    assert mask["params"]["blocks_0"]["fc1"]["kernel"] == 1.0
    assert mask["params"]["blocks_0"]["fc1"]["bias"] == 0.0
    assert mask["params"]["norm"]["scale"] == 0.0  # 1-D


def test_adamw_matches_torch(rng):
    """Our scheduled_adamw must track torch.optim.AdamW step-for-step,
    including clipping, cosine-scheduled lr/wd, and the wd mask."""
    w = rng.standard_normal((4, 3)).astype(np.float32)
    b = rng.standard_normal((3,)).astype(np.float32)

    lr_arr = cosine_scheduler(1e-2, 1e-4, epochs=2, niter_per_ep=5, warmup_epochs=1)
    wd_arr = cosine_scheduler(0.05, 0.01, epochs=2, niter_per_ep=5)

    params = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    tx = create_optimizer(
        params,
        as_schedule_fn(lr_arr),
        wd_schedule=as_schedule_fn(wd_arr),
        clip_grad=0.75,
    )
    state = tx.init(params)

    tw = torch.nn.Parameter(torch.from_numpy(w.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b.copy()))
    topt = torch.optim.AdamW(
        [
            {"params": [tw], "weight_decay": 0.05},
            {"params": [tb], "weight_decay": 0.0},
        ],
        lr=1e-2, betas=(0.9, 0.95), eps=1e-8,
    )

    for step in range(10):
        gw = rng.standard_normal((4, 3)).astype(np.float32)
        gb = rng.standard_normal((3,)).astype(np.float32)
        grads = {"w": jnp.asarray(gw), "b": jnp.asarray(gb)}
        updates, state = tx.update(grads, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

        for g in topt.param_groups:
            g["lr"] = float(lr_arr[step])
            if g["weight_decay"] > 0:
                g["weight_decay"] = float(wd_arr[step])
        topt.zero_grad()
        tw.grad = torch.from_numpy(gw.copy())
        tb.grad = torch.from_numpy(gb.copy())
        torch.nn.utils.clip_grad_norm_([tw, tb], 0.75)
        topt.step()

    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(params["b"]), tb.detach().numpy(), atol=2e-6)


def test_layer_decay_scales_updates(rng):
    params = {
        "params": {
            "patch_embed": {"proj": {"kernel": jnp.ones((2, 2))}},
            "encoder": {"blocks_0": {"mlp": {"fc1": {"kernel": jnp.ones((2, 2))}}}},
            "head": {"kernel": jnp.ones((2, 2))},
        }
    }
    scales = build_lr_scale_tree(params, layer_decay=0.9, num_layers=2)
    assert scales["params"]["head"]["kernel"] == pytest.approx(1.0)
    assert scales["params"]["patch_embed"]["proj"]["kernel"] == pytest.approx(0.9**3)
    assert scales["params"]["encoder"]["blocks_0"]["mlp"]["fc1"]["kernel"] == pytest.approx(0.9**2)


def test_cosine_scheduler_matches_reference_shape():
    sched = cosine_scheduler(5e-4, 1e-5, epochs=10, niter_per_ep=7, warmup_steps=13)
    assert len(sched) == 70
    np.testing.assert_allclose(sched[0], 0.0)
    np.testing.assert_allclose(sched[12], 5e-4, rtol=1e-6)
    assert sched[13] <= 5e-4
    # cosine tail approaches final value
    assert abs(sched[-1] - 1e-5) < 5e-5


def test_sgd_matches_torch(rng):
    from mem_tpu.train.optim import create_optimizer

    w = rng.standard_normal((4, 3)).astype(np.float32)
    params = {"w": jnp.asarray(w)}
    tx = create_optimizer(params, lambda s: 0.01, weight_decay=0.001, opt="nesterov")
    state = tx.init(params)

    tw = torch.nn.Parameter(torch.from_numpy(w.copy()))
    topt = torch.optim.SGD([tw], lr=0.01, momentum=0.9, nesterov=True,
                           weight_decay=0.001)
    for _ in range(5):
        gw = rng.standard_normal((4, 3)).astype(np.float32)
        up, state = tx.update({"w": jnp.asarray(gw)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, up)
        topt.zero_grad()
        tw.grad = torch.from_numpy(gw.copy())
        topt.step()
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), atol=1e-6)


def test_adam_l2_matches_torch(rng):
    from mem_tpu.train.optim import create_optimizer

    w = rng.standard_normal((4, 3)).astype(np.float32)
    params = {"w": jnp.asarray(w)}
    tx = create_optimizer(params, lambda s: 0.01, weight_decay=0.01, opt="adam",
                          opt_betas=(0.9, 0.999))
    state = tx.init(params)
    tw = torch.nn.Parameter(torch.from_numpy(w.copy()))
    topt = torch.optim.Adam([tw], lr=0.01, betas=(0.9, 0.999), eps=1e-8,
                            weight_decay=0.01)
    for _ in range(5):
        gw = rng.standard_normal((4, 3)).astype(np.float32)
        up, state = tx.update({"w": jnp.asarray(gw)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, up)
        topt.zero_grad()
        tw.grad = torch.from_numpy(gw.copy())
        topt.step()
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), atol=2e-6)


def test_hotpix_topk_mode(rng):
    import jax.numpy as jnp2

    from mem_tpu.ops.image_ops import remove_hot_pixels

    img = np.zeros((8, 8, 3), np.float32)
    img[..., 0] = rng.random((8, 8)) * 0.1
    img[0, 0, 0] = 5.0
    img[1, 1, 2] = 7.0
    out = np.asarray(remove_hot_pixels(jnp2.asarray(img), num_hot_pixels=2))
    assert out[0, 0, 0] == 0 and out[1, 1, 2] == 0
    assert out[0, 0, 2] == 0 and out[1, 1, 0] == 0  # both planes zeroed
    assert (out[..., 0] >= 0).sum() > 0
