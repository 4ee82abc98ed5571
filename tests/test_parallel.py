"""Multi-device sharding tests over the 8-device CPU mesh — the TPU-native
substitute for multi-node collective testing (SURVEY §4)."""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mem_tpu.parallel import get_mesh, replicate, shard_batch


def test_mesh_spans_all_devices():
    mesh = get_mesh()
    assert mesh.devices.size == jax.device_count() == 8


def test_shard_batch_splits_leading_axis():
    mesh = get_mesh()
    batch = {"x": np.arange(32, dtype=np.float32).reshape(16, 2), "y": np.arange(16)}
    sharded = shard_batch(batch, mesh)
    shard_sizes = {s.data.shape[0] for s in sharded["x"].addressable_shards}
    assert shard_sizes == {2}  # 16 / 8 devices


def test_shard_batch_axis1():
    mesh = get_mesh()
    batch = {"x": np.zeros((2, 16, 3), np.float32)}
    sharded = shard_batch(batch, mesh, axis_pos=1)
    assert {s.data.shape for s in sharded["x"].addressable_shards} == {(2, 2, 3)}


def test_dp_gradient_matches_single_device():
    """The canonical DP invariant: jit over sharded batch must produce the
    same gradients as unsharded execution (XLA's psum replaces DDP)."""
    mesh = get_mesh()
    w = jnp.asarray(np.random.default_rng(0).standard_normal((4, 4)), jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((16, 4)), jnp.float32)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_ref = jax.grad(loss)(w, x)

    w_r = replicate(w, mesh)
    x_s = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    g_dp = jax.jit(jax.grad(loss))(w_r, x_s)
    np.testing.assert_allclose(np.asarray(g_dp), np.asarray(g_ref), rtol=2e-6)


def test_train_step_runs_sharded(rng):
    """A full pretrain-style step (preprocess+model+optim) executes over the
    8-device mesh with a sharded event batch."""
    import optax

    from mem_tpu.data.device_pipeline import PreprocConfig
    from mem_tpu.models import create_model
    from mem_tpu.models.discrete_vae import DiscreteVAE
    from mem_tpu.train.optim import create_optimizer
    from mem_tpu.train.steps import make_pretrain_train_step

    mesh = get_mesh()
    B, N, HW = 8, 512, 32
    model = create_model(
        "pt_vit", vocab_size=16, img_size=(HW, HW), patch_size=(8, 8),
        embed_dim=16, depth=1, num_heads=2,
    )
    vae = DiscreteVAE(input_hw=(HW, HW), num_tokens=16, codebook_dim=4,
                      num_layers=3, num_resnet_blocks=0, hidden_dim=8)
    preproc = PreprocConfig(
        input_h=HW, input_w=HW, canvas_h=64, canvas_w=64,
        hotpixfilter=False, rand_aug=False, normalize_events=True,
    )

    batch = {
        "events": rng.random((B, N, 4)).astype(np.float32) * 30,
        "n_valid": np.full((B,), N, np.int32),
        "label": np.zeros((B,), np.int64),
        "sample_h": np.full((B,), 31, np.int32),
        "sample_w": np.full((B,), 31, np.int32),
        "time_flip": np.zeros((B,), bool),
        "x_flip": np.ones((B,), bool),
        "shift_xy": np.zeros((B, 2), np.int32),
        "aug_seed": np.arange(B, dtype=np.uint32),
        "mask": np.tile(np.arange(16) < 8, (B, 1)),
    }

    from mem_tpu.data.device_pipeline import preprocess_batch

    imgs = jax.jit(lambda b: preprocess_batch(b, preproc, True))(
        jax.tree.map(jnp.asarray, batch)
    )
    params = jax.jit(model.init)(jax.random.key(0), imgs, jnp.asarray(batch["mask"]))
    vae_params = jax.jit(vae.init)(
        {"params": jax.random.key(1), "gumbel": jax.random.key(2)}, imgs, 1.0
    )
    tx = create_optimizer(params, lambda s: 1e-3)
    opt_state = tx.init(params)

    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    vae_params = replicate(vae_params, mesh)
    b = shard_batch(batch, mesh)

    step = make_pretrain_train_step(model, vae, tx, preproc)
    params2, opt_state2, metrics = step(params, opt_state, vae_params, b, jax.random.key(3))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["mlm_acc"]))
    assert float(metrics["grad_norm"]) > 0


def test_event_axis_sharding_psums_histograms(rng):
    """SCALING.md claim: if event streams exceed one chip, shard the EVENT
    axis across the mesh — the histogram contraction reduces over events, so
    XLA inserts the psum and the result matches replicated execution."""
    import jax.numpy as jnp

    from mem_tpu.ops.voxelize import voxelize_jax

    mesh = get_mesh()
    N, H, W = 4096, 32, 32
    ev = np.zeros((N, 4), np.float32)
    ev[:, 0] = rng.integers(0, W, N)
    ev[:, 1] = rng.integers(0, H, N)
    ev[:, 3] = rng.choice([-1.0, 1.0], N)

    want = np.asarray(voxelize_jax(jnp.asarray(ev), H, W))

    ev_sharded = jax.device_put(
        jnp.asarray(ev), NamedSharding(mesh, P("data", None))
    )
    got = jax.jit(lambda e: voxelize_jax(e, H, W))(ev_sharded)
    # output lives across the mesh; gather and compare
    np.testing.assert_array_equal(np.asarray(got), want)


def test_zero1_opt_sharding_matches_replicated(rng):
    """ZeRO-1 optimizer-state sharding over the data axis is numerically
    identical to replicated state, and the moments really are sharded."""
    from mem_tpu.parallel.mesh import shard_opt_state_zero1, zero1_opt_specs
    from mem_tpu.train.optim import create_optimizer

    mesh = get_mesh()
    w = {"w": jnp.asarray(rng.standard_normal((16, 8)), jnp.float32),
         "b": jnp.asarray(rng.standard_normal((8,)), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((16, 16)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    tx = create_optimizer(w, lambda s: 1e-2, weight_decay=0.01, clip_grad=1.0)

    def loss(p, x, y):
        return jnp.mean((x @ p["w"] + p["b"] - y) ** 2)

    @jax.jit
    def step(p, o, x, y):
        g = jax.grad(loss)(p, x, y)
        up, o = tx.update(g, o, p)
        import optax
        return optax.apply_updates(p, up), o

    x_s = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    runs = []
    for zero1 in (False, True):
        p = replicate(w, mesh)
        o = tx.init(p)
        o = shard_opt_state_zero1(o, mesh) if zero1 else replicate(o, mesh)
        if zero1:
            # the (16, 8) moment leaves are sharded 2 rows/device
            mu_w = o.mu["w"]
            assert {s.data.shape[0] for s in mu_w.addressable_shards} == {2}
            # odd leading dims stay replicated
            specs = zero1_opt_specs(tx.init(w), mesh)
            assert specs.mu["w"] == P("data", None)
            assert specs.count == P()
        for i in range(3):
            p, o = step(p, o, x_s, y + i)
        runs.append(jax.tree.map(np.asarray, p))
    for a, b in zip(jax.tree.leaves(runs[0]), jax.tree.leaves(runs[1])):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_fsdp_matches_replicated(rng):
    """FSDP (ZeRO-3: params AND moments sharded over 'data') is numerically
    identical to replicated DP on a 2-layer MLP, the placement really
    shards, and the sharding SURVIVES the donated update step (a step that
    silently re-replicated params would defeat the memory saving)."""
    from mem_tpu.parallel.mesh import fsdp_specs, place_train_state
    from mem_tpu.train.optim import create_optimizer

    mesh = get_mesh()
    w = {"fc1": {"kernel": jnp.asarray(rng.standard_normal((8, 32)), jnp.float32),
                 "bias": jnp.zeros((32,), jnp.float32)},
         "fc2": {"kernel": jnp.asarray(rng.standard_normal((32, 8)), jnp.float32),
                 "bias": jnp.zeros((8,), jnp.float32)},
         "scale": jnp.ones((3,), jnp.float32)}  # 3 % 8 != 0 -> replicated
    x = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    tx = create_optimizer(w, lambda s: 1e-2, weight_decay=0.01, clip_grad=1.0)

    specs = fsdp_specs(w, mesh)
    assert specs["fc1"]["kernel"] == P(None, "data")  # largest dim (32)
    assert specs["fc1"]["bias"] == P("data")
    assert specs["fc2"]["kernel"] == P("data", None)
    assert specs["scale"] == P()

    def loss(p, x, y):
        h = jnp.tanh(x @ p["fc1"]["kernel"] + p["fc1"]["bias"])
        out = h @ p["fc2"]["kernel"] + p["fc2"]["bias"]
        return jnp.mean((out - y) ** 2)

    @jax.jit
    def step(p, o, x, y):
        import optax

        g = jax.grad(loss)(p, x, y)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o

    x_s = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    runs = []
    for fsdp in (False, True):
        p, o = place_train_state(w, tx.init(w), mesh, fsdp=fsdp)
        if fsdp:
            k = p["fc1"]["kernel"]
            assert {s.data.shape for s in k.addressable_shards} == {(8, 4)}
            mu1 = o.mu["fc1"]["kernel"]
            assert {s.data.shape for s in mu1.addressable_shards} == {(8, 4)}
        for i in range(3):
            p, o = step(p, o, x_s, y + i)
        if fsdp:
            assert p["fc1"]["kernel"].sharding.spec == P(None, "data"), \
                "FSDP sharding lost across the update step"
        runs.append(jax.tree.map(np.asarray, p))
    for a, b in zip(jax.tree.leaves(runs[0]), jax.tree.leaves(runs[1])):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_place_train_state_rejects_mode_combinations():
    import pytest

    from mem_tpu.parallel.mesh import place_train_state

    mesh = get_mesh()
    w = {"w": jnp.zeros((8, 8), jnp.float32)}
    with pytest.raises(ValueError, match="placement mode"):
        place_train_state(w, w, mesh, tp=2, fsdp=True)
    with pytest.raises(ValueError, match="placement mode"):
        place_train_state(w, w, mesh, zero1=True, fsdp=True)
