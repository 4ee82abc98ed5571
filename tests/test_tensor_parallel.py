"""Tensor parallelism over the 'model' mesh axis: a dp x tp sharded step must
produce the SAME loss/grads as the replicated DP-only execution (GSPMD
correctness), and the fan-out/fan-in specs must actually shard the weights."""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mem_tpu.models import create_model
from mem_tpu.models.pretrain import masked_cross_entropy
from mem_tpu.parallel import get_mesh, replicate, shard_batch
from mem_tpu.parallel.mesh import shard_params, tp_param_specs


def _setup(rng):
    model = create_model(
        "pt_vit", vocab_size=32, img_size=(32, 32), patch_size=(8, 8),
        embed_dim=32, depth=2, num_heads=2,
    )
    x = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)
    mask = jnp.zeros((8, 16), bool).at[:, :8].set(True)
    labels = jnp.asarray(rng.integers(0, 32, (8, 16)))
    params = jax.jit(model.init)(jax.random.key(0), x, mask)

    def loss(p, xx, mm):
        lg = model.apply(p, xx, mm)
        return masked_cross_entropy(lg, labels, mm)[0]

    return model, params, x, mask, loss


def test_tp_specs_shard_the_right_leaves(rng):
    _, params, *_ = _setup(rng)
    specs = tp_param_specs(params)
    blk = specs["params"]["encoder"]["blocks_0"]
    assert blk["attn"]["qkv_kernel"] == P(None, "model")
    assert blk["attn"]["proj"]["kernel"] == P("model", None)
    assert blk["mlp"]["fc1"]["kernel"] == P(None, "model")
    assert blk["mlp"]["fc2"]["kernel"] == P("model", None)
    assert specs["params"]["cls_token"] == P()
    assert specs["params"]["lm_head"]["kernel"] == P()


def test_tp_matches_dp_loss_and_grads(rng):
    model, params, x, mask, loss = _setup(rng)

    # DP-only reference
    mesh_dp = get_mesh()
    p_dp = replicate(params, mesh_dp)
    b_dp = shard_batch({"x": x, "m": mask}, mesh_dp)
    l_ref, g_ref = jax.jit(jax.value_and_grad(loss))(p_dp, b_dp["x"], b_dp["m"])

    # dp=4 x tp=2
    mesh = get_mesh(tp=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    p_tp = shard_params(params, mesh)
    # weights are actually distributed
    qkv = p_tp["params"]["encoder"]["blocks_0"]["attn"]["qkv_kernel"]
    assert qkv.sharding.spec == P(None, "model")
    assert {s.data.shape for s in qkv.addressable_shards} == {(32, 48)}

    b = {"x": x, "m": mask}
    b = {k: jax.device_put(v, NamedSharding(mesh, P("data", *([None] * (v.ndim - 1)))))
         for k, v in b.items()}
    l_tp, g_tp = jax.jit(jax.value_and_grad(loss))(p_tp, b["x"], b["m"])

    np.testing.assert_allclose(float(l_tp), float(l_ref), rtol=1e-5)
    for a, bb in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_tp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-4)
