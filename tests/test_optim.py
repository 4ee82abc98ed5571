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


# ---------------------------------------------------------------------------
# optimizer zoo (optim_factory.py:98-181 20-way switch)
# ---------------------------------------------------------------------------

def _run_pair(rng, opt_name, topt_factory, steps=6, wd=0.01, lr=0.01,
              opt_betas=(0.9, 0.999), atol=2e-6, momentum=0.9):
    """Step our create_optimizer(opt_name) and a torch optimizer in lockstep
    on identical gradients; return (ours, theirs) final weights."""
    w = rng.standard_normal((4, 3)).astype(np.float32)
    params = {"w": jnp.asarray(w)}
    tx = create_optimizer(params, lambda s: lr, weight_decay=wd, opt=opt_name,
                          opt_betas=opt_betas, momentum=momentum)
    state = tx.init(params)
    tw = torch.nn.Parameter(torch.from_numpy(w.copy()))
    topt = topt_factory([tw])
    for _ in range(steps):
        gw = rng.standard_normal((4, 3)).astype(np.float32)
        up, state = tx.update({"w": jnp.asarray(gw)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, up)
        topt.zero_grad()
        tw.grad = torch.from_numpy(gw.copy())
        topt.step()
    np.testing.assert_allclose(
        np.asarray(params["w"]), tw.detach().numpy(), atol=atol)


def test_nadam_matches_torch(rng):
    _run_pair(rng, "nadam", lambda ps: torch.optim.NAdam(
        ps, lr=0.01, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.01))


def test_radam_matches_torch(rng):
    # atol 2e-5: optax places eps as sqrt(v/c2)+eps, torch as
    # (sqrt(v)+eps)/sqrt(c2) — an O(eps) per-step perturbation, ~1e-5
    # accumulated over 12 steps; the rectification schedule itself matches.
    _run_pair(rng, "radam", lambda ps: torch.optim.RAdam(
        ps, lr=0.01, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.01),
        steps=12, atol=2e-5)  # crosses the rho_t > 5 threshold at step 5


def test_adadelta_matches_torch(rng):
    _run_pair(rng, "adadelta", lambda ps: torch.optim.Adadelta(
        ps, lr=0.01, rho=0.9, eps=1e-6, weight_decay=0.01))


def test_rmsprop_matches_torch(rng):
    _run_pair(rng, "rmsprop", lambda ps: torch.optim.RMSprop(
        ps, lr=0.01, alpha=0.9, eps=1e-8, momentum=0.9, weight_decay=0.01))


def test_adamp_unprojected_matches_adamw(rng):
    """Where the projection never fires (cos(p, g) large), AdamP(nesterov
    =False) is exactly torch AdamW: multiplicative decoupled decay + Adam
    step."""
    w = np.abs(rng.standard_normal((4, 3))).astype(np.float32) + 1.0
    params = {"w": jnp.asarray(w)}
    from mem_tpu.train.optim import scheduled_adamp

    tx = scheduled_adamp(
        lambda s: 0.01, lambda s: 0.05,
        {"w": 1.0}, {"w": 1.0}, b1=0.9, b2=0.999, eps=1e-8, nesterov=False,
    )
    state = tx.init(params)
    tw = torch.nn.Parameter(torch.from_numpy(w.copy()))
    topt = torch.optim.AdamW([tw], lr=0.01, betas=(0.9, 0.999), eps=1e-8,
                             weight_decay=0.05)
    for _ in range(5):
        # gradients parallel-ish to p -> cosine similarity far above delta
        gw = (w * 0.5 + 0.01 * rng.standard_normal((4, 3))).astype(np.float32)
        up, state = tx.update({"w": jnp.asarray(gw)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, up)
        topt.zero_grad()
        tw.grad = torch.from_numpy(gw.copy())
        topt.step()
    np.testing.assert_allclose(
        np.asarray(params["w"]), tw.detach().numpy(), atol=3e-6)


def test_adamp_projection_removes_radial_component(rng):
    """For a scale-invariant-looking param (g orthogonal to p per channel)
    the projected update must have no radial component: dot(p_col,
    update_col) ~ 0 while the unprojected Adam step would not. The channel
    group is the OUTPUT channel = the LAST axis in flax (in, out) layout
    (clovaai groups by torch dim 0 = out channels)."""
    from mem_tpu.train.optim import _adamp_project

    p = rng.standard_normal((16, 4)).astype(np.float32)  # (in, out) dense
    # per-output-channel (column) orthogonal gradient
    g = rng.standard_normal((16, 4)).astype(np.float32)
    g -= (np.sum(g * p, 0, keepdims=True) / np.sum(p * p, 0, keepdims=True)) * p
    perturb = rng.standard_normal((16, 4)).astype(np.float32)
    out, fired = _adamp_project(jnp.asarray(p), jnp.asarray(g), jnp.asarray(perturb))
    assert float(fired) == 1.0
    radial = np.sum(np.asarray(out) * p, axis=0) / np.linalg.norm(p, axis=0)
    np.testing.assert_allclose(radial, 0.0, atol=1e-4)
    # and a non-orthogonal gradient must NOT fire
    _, fired2 = _adamp_project(jnp.asarray(p), jnp.asarray(p + 0.01 * g),
                               jnp.asarray(perturb))
    assert float(fired2) == 0.0


def test_sgdp_runs_and_decays(rng):
    w = rng.standard_normal((4, 3)).astype(np.float32)
    params = {"w": jnp.asarray(w)}
    tx = create_optimizer(params, lambda s: 0.01, weight_decay=0.01, opt="sgdp")
    state = tx.init(params)
    for _ in range(3):
        gw = rng.standard_normal((4, 3)).astype(np.float32)
        up, state = tx.update({"w": jnp.asarray(gw)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, up)
    assert np.all(np.isfinite(np.asarray(params["w"])))


def test_lookahead_sync_semantics():
    """lookahead_sgd with momentum 0: after k=6 unit-gradient steps at
    lr=0.1 the slow weights pull the fast ones halfway back."""
    params = {"w": jnp.asarray(np.array([1.0], np.float32))}
    tx = create_optimizer(params, lambda s: 0.1, opt="lookahead_momentum",
                          momentum=0.0)
    state = tx.init(params)
    g = {"w": jnp.asarray(np.array([1.0], np.float32))}
    vals = []
    for _ in range(6):
        up, state = tx.update(g, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, up)
        vals.append(float(params["w"][0]))
    # steps 1-5: plain sgd; step 6: fast=0.4, slow sync: 1.0 + 0.5*(0.4-1.0)
    np.testing.assert_allclose(vals[:5], [0.9, 0.8, 0.7, 0.6, 0.5], atol=1e-6)
    np.testing.assert_allclose(vals[5], 0.7, atol=1e-6)


def test_fused_aliases_and_adahessian_error():
    params = {"w": jnp.zeros((2, 2))}
    for name in ("fusedadamw", "fusedadam", "fusedsgd", "fusedmomentum",
                 "fusedlamb", "fusednovograd", "rmsproptf", "adafactor",
                 "novograd", "lamb"):
        tx = create_optimizer(params, lambda s: 0.01, weight_decay=0.01,
                              opt=name)
        state = tx.init(params)
        up, _ = tx.update({"w": jnp.ones((2, 2))}, state, params)
        assert np.all(np.isfinite(np.asarray(up["w"])))
    with pytest.raises(ValueError, match="adahessian"):
        create_optimizer(params, lambda s: 0.01, opt="adahessian")


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


def test_lamb_honors_wd_schedule(rng):
    """--weight_decay_end cosine schedules must reach lamb's decay stage
    (it rides between the Adam stats and the trust-ratio scaling): a
    zero-schedule run must differ from a constant-wd run, and the
    constant schedule must equal the constant weight_decay path."""
    from mem_tpu.train.optim import create_optimizer

    w = rng.standard_normal((8, 4)).astype(np.float32)
    g = rng.standard_normal((8, 4)).astype(np.float32)

    def run(**kw):
        params = {"w": jnp.asarray(w)}
        tx = create_optimizer(params, lambda s: 0.01, opt="lamb", **kw)
        state = tx.init(params)
        for _ in range(3):
            up, state = tx.update({"w": jnp.asarray(g)}, state, params)
            params = jax.tree.map(lambda p, u: p + u, params, up)
        return np.asarray(params["w"])

    const = run(weight_decay=0.1)
    sched_const = run(wd_schedule=lambda s: 0.1, weight_decay=0.1)
    sched_zero = run(wd_schedule=lambda s: 0.0)
    np.testing.assert_allclose(const, sched_const, atol=1e-7)
    assert np.abs(const - sched_zero).max() > 1e-4


def test_bf16_moments_tracks_f32(rng):
    """moment_dtype=bf16 (the B>=256 HBM counter-move, docs/PERF.md round 4)
    must stay a small bounded perturbation of the exact-f32 trajectory:
    arithmetic is f32 (cast up, blend, cast back), so only the storage
    rounds — and the state really is stored in bf16."""
    w = rng.standard_normal((16, 8)).astype(np.float32)
    grads = [rng.standard_normal((16, 8)).astype(np.float32) * 0.1
             for _ in range(50)]

    def run(moment_dtype):
        params = {"w": jnp.asarray(w)}
        tx = create_optimizer(params, lambda s: 1e-3, weight_decay=0.05,
                              clip_grad=1.0, moment_dtype=moment_dtype)
        state = tx.init(params)
        for g in grads:
            up, state = tx.update({"w": jnp.asarray(g)}, state, params)
            params = jax.tree.map(lambda p, u: p + u, params, up)
        return np.asarray(params["w"]), state

    exact, _ = run(None)
    approx, state = run(jnp.bfloat16)
    assert state.mu["w"].dtype == jnp.bfloat16
    assert state.nu["w"].dtype == jnp.bfloat16
    # param drift after 50 steps stays ~bf16-epsilon-scaled relative to the
    # total parameter movement (NOT machine-epsilon: storage rounds)
    moved = np.abs(exact - w).max()
    drift = np.abs(approx - exact).max()
    assert drift < 0.05 * moved, (drift, moved)
