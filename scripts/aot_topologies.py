"""AOT-compile the flagship train steps against REAL TPU pod topologies
(round-4 verdict #2): upgrade the multi-chip story from virtual-CPU-mesh
numerics to TPU-compiler evidence, no hardware needed.

``jax.experimental.topologies.get_topology_desc`` builds an abstract device
set for a named v5e slice; ``step.lower(...).compile()`` then runs the real
XLA:TPU pipeline (SPMD partitioner, collective selection, memory planner)
for that topology. We assert the compiled HLO contains the collectives the
sharding design predicts and record the compiler's own per-step cost and
memory estimates.

Cases (selected by argv):
  pretrain_dp    ViT-B/224 MEM step, batch-sharded over all chips
  pretrain_fsdp  same step with params+moments sharded (ZeRO-3)
  seg_dp         EvBEiT-B/512 + UPerNet step over the dp mesh
Topologies: v5e:2x4 (one host), v5e:16x16 (256 chips, 64 hosts — ICI),
v5e:2x4 x2 slices (DCN between slices).

Usage:
  python scripts/aot_topologies.py            # full table (slow compiles)
  python scripts/aot_topologies.py tiny       # tiny geometry (the dryrun
                                              # gate's fast path, ~1 min)
Emits one markdown row per case (for docs/SCALING.md) and a JSON summary.
"""
from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")


def _sds(tree, mesh, spec_tree=None):
    """ShapeDtypeStruct tree carrying NamedShardings (what .lower consumes)."""
    if spec_tree is None:
        spec_tree = jax.tree.map(lambda _: P(), tree)
    return jax.tree.map(
        lambda l, s: jax.ShapeDtypeStruct(l.shape, l.dtype,
                                          sharding=NamedSharding(mesh, s)),
        tree, spec_tree,
    )


def _key_sds(mesh):
    k = jax.eval_shape(lambda: jax.random.key(0))
    return jax.ShapeDtypeStruct(k.shape, k.dtype,
                                sharding=NamedSharding(mesh, P()))


def _collective_counts(hlo_text: str):
    out = {}
    for c in COLLECTIVES:
        # start ops only ('all-reduce-start' counts once; '-done' ignored)
        n = len(re.findall(rf"(?m)^\s*%?\S*\s*=\s*\S+ {c}(?:-start)?\(",
                           hlo_text))
        if n == 0:
            n = hlo_text.count(f" {c}(") + hlo_text.count(f" {c}-start(")
        out[c] = n
    return out


def _mem(compiled):
    m = compiled.memory_analysis()
    if m is None:
        return {}
    return {k: getattr(m, k) for k in (
        "argument_size_in_bytes", "output_size_in_bytes",
        "temp_size_in_bytes", "generated_code_size_in_bytes") if hasattr(m, k)}


def get_mesh_for(topology_name: str, num_slices: int = 1) -> Mesh:
    kw = {"num_slices": num_slices} if num_slices > 1 else {}
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=topology_name, **kw)
    return Mesh(np.array(topo.devices), ("data",))


def build_pretrain_case(mesh, fsdp=False, tiny=False, B_per_chip=128):
    """Abstract (no arrays) version of scripts/trace_pretrain.build."""
    from mem_tpu.data.device_pipeline import PreprocConfig
    from mem_tpu.models import create_model
    from mem_tpu.models.discrete_vae import DiscreteVAE
    from mem_tpu.parallel.mesh import fsdp_specs
    from mem_tpu.train.optim import create_optimizer
    from mem_tpu.train.schedules import as_schedule_fn, cosine_scheduler
    from mem_tpu.train.steps import make_pretrain_train_step

    n_dev = mesh.size
    if tiny:
        HW, patch, emb, depth, heads, vocab = 32, 8, 64, 2, 2, 64
        B, N = 2 * n_dev, 256
        canvas = 64
        vae = DiscreteVAE(input_hw=(HW, HW), num_tokens=vocab, codebook_dim=8,
                          num_layers=3, num_resnet_blocks=1, hidden_dim=16,
                          dtype=jnp.bfloat16)
    else:
        HW, patch, emb, depth, heads, vocab = 224, 16, 768, 12, 12, 8192
        B, N = B_per_chip * n_dev, 30000
        canvas = 256
        vae = DiscreteVAE(dtype=jnp.bfloat16)
    grid = HW // patch
    n_mask = grid * grid // 2
    model = create_model(
        "pt_vit", vocab_size=vocab, img_size=(HW, HW),
        patch_size=(patch, patch), embed_dim=emb, depth=depth,
        num_heads=heads, dtype=jnp.bfloat16, init_values=0.1,
        use_shared_rel_pos_bias=True, drop_path_rate=0.1,
        num_masked_tokens=n_mask)
    pp = PreprocConfig(input_h=HW, input_w=HW, canvas_h=canvas,
                       canvas_w=canvas, rand_aug=True,
                       rand_aug_batch_ops=True, color_jitter=0.2)

    batch = {
        "events": jax.ShapeDtypeStruct((B, N, 4), jnp.float32),
        "n_valid": jax.ShapeDtypeStruct((B,), jnp.int32),
        "label": jax.ShapeDtypeStruct((B,), jnp.int64),
        "sample_h": jax.ShapeDtypeStruct((B,), jnp.int32),
        "sample_w": jax.ShapeDtypeStruct((B,), jnp.int32),
        "time_flip": jax.ShapeDtypeStruct((B,), jnp.bool_),
        "x_flip": jax.ShapeDtypeStruct((B,), jnp.bool_),
        "shift_xy": jax.ShapeDtypeStruct((B, 2), jnp.int32),
        "aug_seed": jax.ShapeDtypeStruct((B,), jnp.uint32),
        "mask": jax.ShapeDtypeStruct((B, grid * grid), jnp.bool_),
    }
    img_s = jax.ShapeDtypeStruct((B, HW, HW, 3), jnp.float32)
    p_shapes = jax.eval_shape(model.init, jax.random.key(0), img_s,
                              batch["mask"])
    vp_shapes = jax.eval_shape(
        vae.init, {"params": jax.random.key(1), "gumbel": jax.random.key(2)},
        img_s, 1.0)
    lr = cosine_scheduler(5e-4, 1e-5, 10, 100, warmup_steps=10)
    tx = create_optimizer(p_shapes, as_schedule_fn(lr), weight_decay=0.05,
                          clip_grad=30.0)
    o_shapes = jax.eval_shape(tx.init, p_shapes)

    if fsdp:
        p_spec = fsdp_specs(p_shapes, mesh)
        o_spec = fsdp_specs(o_shapes, mesh)
    else:
        p_spec = o_spec = None

    step = make_pretrain_train_step(model, vae, tx, pp)
    args = (
        _sds(p_shapes, mesh, p_spec),
        _sds(o_shapes, mesh, o_spec),
        _sds(vp_shapes, mesh),
        _sds(batch, mesh, {k: P("data") if v.shape and v.shape[0] == B
                           else P() for k, v in batch.items()}),
        _key_sds(mesh),
    )
    return step, args, B


def build_seg_case(mesh, tiny=False, B_per_chip=2):
    from mem_tpu.cli.train_seg import make_seg_steps, poly_lr_schedule
    from mem_tpu.data.seg_pipeline import seg_preprocess_batch
    from mem_tpu.models.segmentation import EncoderDecoder
    from mem_tpu.train.optim import (build_lr_scale_tree, build_wd_mask_tree,
                                     scheduled_adamw)

    n_dev = mesh.size
    ncls = 11
    if tiny:
        depth, emb, heads, img, Nev = 4, 32, 2, 32, 512
        head_ch, aux_ch = 32, 16
    else:
        depth, emb, heads, img, Nev = 12, 768, 12, 512, 180000
        head_ch, aux_ch = 768, 256
    B = B_per_chip * n_dev
    model = EncoderDecoder(
        num_classes=ncls,
        backbone_cfg=dict(img_size=img, embed_dim=emb, depth=depth,
                          num_heads=heads,
                          out_indices=tuple(max(0, depth - 4 + k)
                                            for k in range(4))),
        head_channels=head_ch, aux_channels=aux_ch, dtype=jnp.bfloat16)
    batch = {
        "events_xyp": jax.ShapeDtypeStruct((B, Nev, 3), jnp.int16),
        "n_valid": jax.ShapeDtypeStruct((B,), jnp.int32),
        "label": jax.ShapeDtypeStruct((B, 440, 640), jnp.int32),
        "flip": jax.ShapeDtypeStruct((B,), jnp.bool_),
        "aug_seed": jax.ShapeDtypeStruct((B,), jnp.uint32),
        "resize_jitter": jax.ShapeDtypeStruct((B, 4), jnp.float32),
    }

    def _init(key):
        imgs, _ = seg_preprocess_batch(
            {k: jnp.zeros(v.shape, v.dtype) for k, v in batch.items()}, False)
        return model.init(key, imgs)

    var_shapes = jax.eval_shape(_init, jax.random.key(5))
    wrapped = {"params": var_shapes["params"]}
    tx = scheduled_adamw(
        poly_lr_schedule(1e-3, 160000, warmup_iters=1500), (lambda s: 0.05),
        build_lr_scale_tree(wrapped, 0.65, depth)["params"],
        build_wd_mask_tree(wrapped)["params"])
    o_shapes = jax.eval_shape(tx.init, var_shapes["params"])
    seg_train, _ = make_seg_steps(model, tx, ncls, rand_aug=True)
    args = (
        _sds(var_shapes["params"], mesh),
        _sds(var_shapes["batch_stats"], mesh),
        _sds(o_shapes, mesh),
        _sds(batch, mesh, {k: P("data") for k in batch}),
        _key_sds(mesh),
    )
    return seg_train, args, B


def run_case(label, step, args, B, expect):
    import time

    t0 = time.perf_counter()
    lowered = step.lower(*args)
    compiled = lowered.compile()
    dt = time.perf_counter() - t0
    txt = compiled.as_text()
    colls = _collective_counts(txt)
    for c in expect:
        assert colls.get(c, 0) > 0, (
            f"{label}: expected a {c} in the compiled HLO; got {colls}")
    cost = compiled.cost_analysis() or {}
    mem = _mem(compiled)
    flops = cost.get("flops", 0.0)
    row = {
        "case": label, "global_batch": B,
        "compile_s": round(dt, 1),
        "collectives": {k: v for k, v in colls.items() if v},
        "flops_per_step": flops,
        "bytes_accessed": cost.get("bytes accessed", 0.0),
        "optimal_seconds": cost.get("optimal_seconds", 0.0),
        **{k: int(v) for k, v in mem.items()},
    }
    print(json.dumps(row))
    return row


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    tiny = "tiny" in argv
    rows = []

    mesh8 = get_mesh_for("v5e:2x4")
    step, args, B = build_pretrain_case(mesh8, tiny=tiny)
    rows.append(run_case("pretrain dp v5e:2x4", step, args, B,
                         expect=("all-reduce",)))
    step, args, B = build_pretrain_case(mesh8, fsdp=True, tiny=tiny)
    rows.append(run_case("pretrain fsdp v5e:2x4", step, args, B,
                         expect=("all-reduce", "all-gather")))
    step, args, B = build_seg_case(mesh8, tiny=tiny)
    rows.append(run_case("seg dp v5e:2x4", step, args, B,
                         expect=("all-reduce",)))

    if not tiny or "multihost" in argv:
        # multi-host single slice: 256 chips over ICI, 64 host processes
        mesh256 = get_mesh_for("v5e:16x16")
        step, args, B = build_pretrain_case(mesh256, tiny=tiny)
        rows.append(run_case("pretrain dp v5e:16x16 (64 hosts)", step, args,
                             B, expect=("all-reduce",)))
        # 2 slices of 2x4: the gradient all-reduce must bridge DCN
        mesh2s = get_mesh_for("v5e:2x4", num_slices=2)
        step, args, B = build_pretrain_case(mesh2s, tiny=tiny)
        rows.append(run_case("pretrain dp v5e:2x4 x2 slices (DCN)", step,
                             args, B, expect=("all-reduce",)))

    print("\n| case | chips | global B | compile s | collectives | "
          "GFLOP/step | HBM temp MB |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        chips = r["case"].split("v5e:")[1]
        colls = ", ".join(f"{k}x{v}" for k, v in r["collectives"].items())
        print(f"| {r['case']} | {chips} | {r['global_batch']} | "
              f"{r['compile_s']} | {colls} | "
              f"{r['flops_per_step']/1e9:.1f} | "
              f"{r.get('temp_size_in_bytes', 0)/1e6:.0f} |")
    return rows


if __name__ == "__main__":
    main()
