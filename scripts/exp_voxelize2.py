"""Voxelizer round 2: y-sorted events + row-tiled accumulator with per-chunk
tile skip (the algorithmic FLOP cut), int8 MXU variant, and the cost of the
on-chip packed-key sort. Run on TPU: python scripts/exp_voxelize2.py
"""
import functools
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

from scripts.trace_pretrain import analyze  # noqa: E402

B, N, H, W = 8, 180224, 440, 640
BG = 8


def _kernel_tiled(col_ref, ys_ref, out_ref, *, TH, W, chunk, bgroup,
                  dtype=jnp.bfloat16, acc=jnp.float32):
    """Row-tiled accumulator; per-(sample, chunk) tile-overlap skip. Events
    must be sorted by y per sample (padding = large sentinel) so each chunk
    overlaps ~1 of the H/TH tiles and the matmul is skipped elsewhere."""
    t, c = pl.program_id(1), pl.program_id(2)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    rows_t = jax.lax.broadcasted_iota(jnp.int32, (TH, chunk), 0) + t * TH
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (chunk, 2 * W), 1)
    for r in range(bgroup):
        ys = ys_ref[r, :]
        lo = jnp.min(ys)
        hi = jnp.max(ys)

        @pl.when((hi >= t * TH) & (lo < (t + 1) * TH))
        def _():
            oh_yt = (rows_t == ys[None, :]).astype(dtype)
            w2 = (cols2 == col_ref[r, :][:, None]).astype(dtype)
            out_ref[r, :, :] += jnp.dot(oh_yt, w2, preferred_element_type=acc)


def _kernel_fused_i8(col_ref, ys_ref, out_ref, *, H, W, chunk, bgroup):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    rows_t = jax.lax.broadcasted_iota(jnp.int32, (H, chunk), 0)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (chunk, 2 * W), 1)
    for r in range(bgroup):
        oh_yt = (rows_t == ys_ref[r, :][None, :]).astype(jnp.int8)
        w2 = (cols2 == col_ref[r, :][:, None]).astype(jnp.int8)
        out_ref[r, :, :] += jnp.dot(oh_yt, w2,
                                    preferred_element_type=jnp.int32)


def make_inputs(sort=False):
    rng = np.random.default_rng(0)
    xs = rng.integers(0, W, (B, N)).astype(np.int32)
    ys = rng.integers(0, H, (B, N)).astype(np.int32)
    pol = rng.choice([0, 1], (B, N)).astype(np.int32)
    col = (xs + W * (1 - pol)).astype(np.int32)
    if sort:
        order = np.argsort(ys, axis=1, kind="stable")
        ys = np.take_along_axis(ys, order, axis=1)
        col = np.take_along_axis(col, order, axis=1)
    want = np.zeros((H, 2 * W), np.float32)
    np.add.at(want, (ys[0], col[0]), 1.0)
    return jnp.asarray(col), jnp.asarray(ys), want


def bench(name, fn, args, want, out_crop, reps=3):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:180]}")
        return
    got = np.asarray(out_crop(out)[0], np.float32)
    try:
        np.testing.assert_allclose(got, want)
    except Exception as e:
        print(f"{name}: WRONG {str(e)[:150]}")
        return
    tdir = f"/tmp/exp2_{name}"
    with jax.profiler.trace(tdir):
        for i in range(reps):
            a0 = args[0] + (out_crop(out).astype(jnp.int32)[0, 0, 0] % 2) * 0
            out = fn(a0, *args[1:])
        jax.block_until_ready(out)
    ms = analyze(tdir, reps)
    print(f"== {name}: {ms:.2f} ms -> {B * N / (ms / 1e3) / 1e9:.3f} Gev/s")


def main():
    # 1. on-chip packed-key sort cost (key = y * 4096 + col fits int32)
    col, ys, want = make_inputs(sort=False)
    key = ys * 4096 + col

    @jax.jit
    def do_sort(k):
        s = jnp.sort(k, axis=1)
        return s // 4096, s % 4096

    out = do_sort(key)
    jax.block_until_ready(out)
    with jax.profiler.trace("/tmp/exp2_sort"):
        o = out
        for i in range(3):
            k2 = key + (o[0][0, 0] % 2) * 0
            o = do_sort(k2)
        jax.block_until_ready(o)
    ms = analyze("/tmp/exp2_sort", 3)
    print(f"== onchip_sort(8x180k): {ms:.2f} ms")

    # 2. int8 dense variant (unsorted)
    pad_n = (-N) % 2048
    colp = jnp.pad(col, ((0, 0), (0, pad_n)), constant_values=2 * W)
    ysp = jnp.pad(ys, ((0, 0), (0, pad_n)), constant_values=H)
    ev_spec = pl.BlockSpec((BG, 2048), lambda b, c: (b, c),
                           memory_space=pltpu.VMEM)
    call_i8 = pl.pallas_call(
        functools.partial(_kernel_fused_i8, H=H, W=W, chunk=2048, bgroup=BG),
        grid=(B // BG, (N + pad_n) // 2048),
        in_specs=[ev_spec] * 2,
        out_specs=pl.BlockSpec((BG, H, 2 * W), lambda b, c: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, 2 * W), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )
    bench("int8_dense",
          jax.jit(lambda *a: jnp.mod(call_i8(*a).astype(jnp.float32), 2**20)),
          (colp, ysp), want, lambda o: o)

    # 3. sorted + tiled, several (TH, chunk)
    cols, yss, wants = make_inputs(sort=True)
    for TH, chunk in ((128, 2048), (128, 4096), (64, 2048), (128, 8192)):
        n_tiles = -(-H // TH)
        pad_n = (-N) % chunk
        cp = jnp.pad(cols, ((0, 0), (0, pad_n)), constant_values=2 * W)
        yp = jnp.pad(yss, ((0, 0), (0, pad_n)),
                     constant_values=n_tiles * TH + 1)
        ev = pl.BlockSpec((BG, chunk), lambda b, t, c: (b, c),
                          memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            functools.partial(_kernel_tiled, TH=TH, W=W, chunk=chunk,
                              bgroup=BG),
            grid=(B // BG, n_tiles, (N + pad_n) // chunk),
            in_specs=[ev] * 2,
            out_specs=pl.BlockSpec((BG, TH, 2 * W),
                                   lambda b, t, c: (b, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, n_tiles * TH, 2 * W),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        )
        bench(f"sorted_tiled_t{TH}_c{chunk}",
              jax.jit(lambda *a, _c=call: jnp.mod(
                  _c(*a).astype(jnp.float32), 2**20)),
              (cp, yp), wants, lambda o: o[:, :H])

    # 4. sorted + tiled fed by the ON-CHIP sort (end-to-end from unsorted)
    TH, chunk = 128, 4096
    n_tiles = -(-H // TH)
    pad_n = (-N) % chunk
    ev = pl.BlockSpec((BG, chunk), lambda b, t, c: (b, c),
                      memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_kernel_tiled, TH=TH, W=W, chunk=chunk, bgroup=BG),
        grid=(B // BG, n_tiles, (N + pad_n) // chunk),
        in_specs=[ev] * 2,
        out_specs=pl.BlockSpec((BG, TH, 2 * W), lambda b, t, c: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TH, 2 * W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
    )

    @jax.jit
    def e2e(c, y):
        k = jnp.sort(y * 4096 + c, axis=1)
        yp = jnp.pad(k // 4096, ((0, 0), (0, pad_n)),
                     constant_values=n_tiles * TH + 1)
        cp = jnp.pad(k % 4096, ((0, 0), (0, pad_n)), constant_values=2 * W)
        return jnp.mod(call(cp, yp).astype(jnp.float32), 2**20)

    bench("e2e_sort_tiled", e2e, (col, ys), want, lambda o: o[:, :H])


if __name__ == "__main__":
    main()


def _kernel_tiled_i8(col_ref, ys_ref, out_ref, *, TH, W, chunk, bgroup):
    _kernel_tiled(col_ref, ys_ref, out_ref, TH=TH, W=W, chunk=chunk,
                  bgroup=bgroup, dtype=jnp.int8, acc=jnp.int32)


def main2():
    cols, yss, wants = make_inputs(sort=True)
    col, ys, want = make_inputs(sort=False)
    for kern, acc_dtype, TH, chunk in (
        (_kernel_tiled, jnp.float32, 32, 2048),
        (_kernel_tiled, jnp.float32, 64, 1024),
        (_kernel_tiled_i8, jnp.int32, 64, 2048),
        (_kernel_tiled_i8, jnp.int32, 32, 2048),
        (_kernel_tiled_i8, jnp.int32, 64, 1024),
    ):
        n_tiles = -(-H // TH)
        pad_n = (-N) % chunk
        cp = jnp.pad(cols, ((0, 0), (0, pad_n)), constant_values=2 * W)
        yp = jnp.pad(yss, ((0, 0), (0, pad_n)),
                     constant_values=n_tiles * TH + 1)
        ev = pl.BlockSpec((BG, chunk), lambda b, t, c: (b, c),
                          memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            functools.partial(kern, TH=TH, W=W, chunk=chunk, bgroup=BG),
            grid=(B // BG, n_tiles, (N + pad_n) // chunk),
            in_specs=[ev] * 2,
            out_specs=pl.BlockSpec((BG, TH, 2 * W),
                                   lambda b, t, c: (b, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, n_tiles * TH, 2 * W),
                                           acc_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        )
        tag = "i8" if kern is _kernel_tiled_i8 else "bf16"
        bench(f"sorted_tiled_{tag}_t{TH}_c{chunk}",
              jax.jit(lambda *a, _c=call: jnp.mod(
                  _c(*a).astype(jnp.float32), 2**20)),
              (cp, yp), wants, lambda o: o[:, :H])

    # best-config end to end with on-chip sort
    TH, chunk = 64, 2048
    n_tiles = -(-H // TH)
    pad_n = (-N) % chunk
    ev = pl.BlockSpec((BG, chunk), lambda b, t, c: (b, c),
                      memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_kernel_tiled_i8, TH=TH, W=W, chunk=chunk,
                          bgroup=BG),
        grid=(B // BG, n_tiles, (N + pad_n) // chunk),
        in_specs=[ev] * 2,
        out_specs=pl.BlockSpec((BG, TH, 2 * W), lambda b, t, c: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TH, 2 * W), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
    )

    @jax.jit
    def e2e(c, y):
        k = jnp.sort(y * 4096 + c, axis=1)
        yp = jnp.pad(k // 4096, ((0, 0), (0, pad_n)),
                     constant_values=n_tiles * TH + 1)
        cp = jnp.pad(k % 4096, ((0, 0), (0, pad_n)), constant_values=2 * W)
        return jnp.mod(call(cp, yp).astype(jnp.float32), 2**20)

    bench("e2e_sort_tiled_i8_t64_c2048", e2e, (col, ys), want,
          lambda o: o[:, :H])


def main3():
    """Classification shapes: int8 single-compare dense vs current prod."""
    global B, N, H, W
    B, N, H, W = 64, 30720, 256, 256
    col, ys, want = make_inputs(sort=False)
    for chunk in (2048, 4096):
        pad_n = (-N) % chunk
        colp = jnp.pad(col, ((0, 0), (0, pad_n)), constant_values=2 * W)
        ysp = jnp.pad(ys, ((0, 0), (0, pad_n)), constant_values=H)
        ev_spec = pl.BlockSpec((BG, chunk), lambda b, c: (b, c),
                               memory_space=pltpu.VMEM)
        call_i8 = pl.pallas_call(
            functools.partial(_kernel_fused_i8, H=H, W=W, chunk=chunk,
                              bgroup=BG),
            grid=(B // BG, (N + pad_n) // chunk),
            in_specs=[ev_spec] * 2,
            out_specs=pl.BlockSpec((BG, H, 2 * W), lambda b, c: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, 2 * W), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )
        bench(f"cls_int8_dense_c{chunk}",
              jax.jit(lambda *a, _c=call_i8: jnp.mod(
                  _c(*a).astype(jnp.float32), 2**20)),
              (colp, ysp), want, lambda o: o)
    # current production kernel for comparison
    from mem_tpu.ops.voxelize_pallas import voxelize_pallas_planes
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(0, W, (B, N)), jnp.int32)
    ys2 = jnp.asarray(rng.integers(0, H, (B, N)), jnp.int32)
    wp = jnp.asarray(rng.random((B, N)) < 0.5, jnp.float32)
    f = jax.jit(lambda a, b, c, d: jnp.mod(
        voxelize_pallas_planes(a, b, c, d, H, W).astype(jnp.float32), 2**20))
    out = f(xs, ys2, wp, 1.0 - wp)
    jax.block_until_ready(out)
    with jax.profiler.trace("/tmp/exp2_clsprod"):
        for i in range(3):
            xs2 = xs + (out.astype(jnp.int32)[0, 0, 0] % 2) * 0
            out = f(xs2, ys2, wp, 1.0 - wp)
        jax.block_until_ready(out)
    ms = analyze("/tmp/exp2_clsprod", 3)
    print(f"== cls_prod_current: {ms:.2f} ms -> {B*N/(ms/1e3)/1e9:.3f} Gev/s")
