"""Voxelizer kernel experiments at SEG shapes (round-3 verdict item #4).

Traces variants of the Pallas histogram kernel at (B=8, N=180k, 440x640)
and classification shapes (B=64, N=30k, 256x256), printing device time per
variant. Run on the TPU:  python scripts/exp_voxelize.py [seg|cls|all]
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


# --- variant kernels --------------------------------------------------------

def _kernel_base(xs_ref, ys_ref, wpos_ref, wneg_ref, out_ref, *, H, W, chunk,
                 bgroup):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, H), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, W), 1)
    for r in range(bgroup):
        xs = xs_ref[r, :]
        ys = ys_ref[r, :]
        oh_y = (rows == ys[:, None]).astype(jnp.bfloat16)
        oh_x = (cols == xs[:, None]).astype(jnp.bfloat16)
        w2 = jnp.concatenate(
            [oh_x * wpos_ref[r, :][:, None].astype(jnp.bfloat16),
             oh_x * wneg_ref[r, :][:, None].astype(jnp.bfloat16)], axis=1)
        out_ref[r, :, :] += jnp.dot(oh_y.T, w2,
                                    preferred_element_type=jnp.float32)


def _kernel_fused_onehot(col_ref, ys_ref, out_ref, *, H, W, chunk, bgroup):
    """Validity/polarity pre-folded into a single column index (invalid ->
    out-of-range): w2 is ONE compare, oh_y built pre-transposed (no .T
    relayout feeding the MXU)."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    rows_t = jax.lax.broadcasted_iota(jnp.int32, (H, chunk), 0)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (chunk, 2 * W), 1)
    for r in range(bgroup):
        oh_yt = (rows_t == ys_ref[r, :][None, :]).astype(jnp.bfloat16)
        w2 = (cols2 == col_ref[r, :][:, None]).astype(jnp.bfloat16)
        out_ref[r, :, :] += jnp.dot(oh_yt, w2,
                                    preferred_element_type=jnp.float32)


def _kernel_fused_loop(col_ref, ys_ref, out_ref, *, H, W, chunk, bgroup,
                       inner):
    """Like fused_onehot but each (chunk)-block is processed as `inner`-sized
    sub-chunks in a fori_loop to shrink the live one-hot tiles."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    rows_t = jax.lax.broadcasted_iota(jnp.int32, (H, inner), 0)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (inner, 2 * W), 1)
    for r in range(bgroup):
        def body(i, _):
            ys = ys_ref[r, pl.ds(i * inner, inner)]
            cl = col_ref[r, pl.ds(i * inner, inner)]
            oh_yt = (rows_t == ys[None, :]).astype(jnp.bfloat16)
            w2 = (cols2 == cl[:, None]).astype(jnp.bfloat16)
            out_ref[r, :, :] += jnp.dot(oh_yt, w2,
                                        preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, chunk // inner, body, 0)


def run_variant(name, kernel, n_in, B, N, H, W, chunk, bgroup, reps=3,
                out_dtype=jnp.float32):
    rng = np.random.default_rng(0)
    xs = rng.integers(0, W, (B, N)).astype(np.int32)
    ys = rng.integers(0, H, (B, N)).astype(np.int32)
    pol = rng.choice([0, 1], (B, N)).astype(np.int32)

    B_pad = (-B) % bgroup
    pad_n = (-N) % chunk
    if B_pad or pad_n:
        xs = np.pad(xs, ((0, B_pad), (0, pad_n)))
        ys = np.pad(ys, ((0, B_pad), (0, pad_n)), constant_values=H)
        pol = np.pad(pol, ((0, B_pad), (0, pad_n)))
    Bp, Np = xs.shape

    ev_spec = pl.BlockSpec((bgroup, chunk), lambda b, c: (b, c),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bgroup, H, 2 * W), lambda b, c: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    if n_in == 4:
        wpos = (pol == 1).astype(np.float32)
        wneg = (pol == 0).astype(np.float32)
        args = (jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(wpos),
                jnp.asarray(wneg))
        specs = [ev_spec] * 4
    else:
        col = np.where(ys < H, xs + W * (1 - pol), 2 * W).astype(np.int32)
        args = (jnp.asarray(col), jnp.asarray(ys))
        specs = [ev_spec] * 2

    call = pl.pallas_call(
        kernel,
        grid=(Bp // bgroup, Np // chunk),
        in_specs=specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, H, 2 * W), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )

    @jax.jit
    def run(*a):
        # a consumer op after the kernel: mirrors production (mod/cast ride
        # after the pallas_call) and stops XLA from scoped-vmem-allocating
        # the kernel output as the program result (OOMs at wide canvases)
        return jnp.mod(call(*a).astype(jnp.float32), 1048576.0)

    try:
        out = run(*args)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:200]}")
        return None
    # correctness vs numpy (sample 0)
    want = np.zeros((H, 2 * W), np.float32)
    v = ys[0] < H
    np.add.at(want, (ys[0][v], xs[0][v] + W * (1 - pol[0][v])), 1.0)
    try:
        np.testing.assert_allclose(np.asarray(out[0], np.float32), want)
    except Exception as e:
        print(f"{name}: WRONG RESULT {str(e)[:150]}")
        return None

    tdir = f"/tmp/exp_vox_{name}"
    with jax.profiler.trace(tdir):
        o = args[0]
        for i in range(reps):
            # non-foldable chain: nudge an input by a data-dependent zero
            a0 = args[0] + (out.astype(jnp.int32)[0, 0, 0] % 2) * 0
            out = run(a0, *args[1:])
        jax.block_until_ready(out)
    ms = analyze(tdir, reps)
    rate = B * N / (ms / 1e3) / 1e9
    print(f"== {name}: {ms:.2f} ms -> {rate:.3f} Gev/s")
    return ms


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "seg"
    shapes = []
    if which in ("seg", "all"):
        shapes.append(("seg", 8, 180224, 440, 640))
    if which in ("cls", "all"):
        shapes.append(("cls", 64, 30720, 256, 256))
    for tag, B, N, H, W in shapes:
        print(f"---- {tag}: B={B} N={N} {H}x{W} ----")
        for chunk, bg in ((2048, 8),):
            run_variant(f"{tag}_base_c{chunk}_g{bg}",
                        functools.partial(_kernel_base, H=H, W=W, chunk=chunk,
                                          bgroup=bg), 4, B, N, H, W, chunk, bg)
        for chunk, bg in ((2048, 8), (1024, 8), (4096, 8)):
            run_variant(f"{tag}_fused_c{chunk}_g{bg}",
                        functools.partial(_kernel_fused_onehot, H=H, W=W,
                                          chunk=chunk, bgroup=bg),
                        2, B, N, H, W, chunk, bg)
        for chunk, bg, inner in ((8192, 8, 2048),):
            run_variant(f"{tag}_loop_c{chunk}_g{bg}_i{inner}",
                        functools.partial(_kernel_fused_loop, H=H, W=W,
                                          chunk=chunk, bgroup=bg, inner=inner),
                        2, B, N, H, W, chunk, bg)


if __name__ == "__main__":
    main()
