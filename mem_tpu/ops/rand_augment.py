"""Jittable RandAugment (the reference's EventRandAugment,
mem/transforms.py:351-484, itself a torchvision RandAugment clone with
magnitude 20, num_ops 2, bilinear interpolation, uint8 images).

All 14 ops run on device as pure jnp ops on (H, W, 3) uint8 images:
geometric ops are inverse-warp bilinear gathers (zero fill, matching
torchvision's ``fill=None``), photometric ops follow torchvision's
``_blend``/LUT semantics including uint8 truncation. Op and magnitude
selection mirrors the reference: per application, ``op ~ U[0,14)``,
``magnitude_bin ~ U[0, magnitude]`` of 31 linspace bins, sign ~ U{±1}
(transforms.py:455-473).

Exact per-pixel parity with PIL/torchvision affine sampling is not a goal
(SURVEY §7 "hard parts" — parity is statistical); semantics and magnitude
spaces match.

``timm_levels=True`` switches magnitude/apply selection to timm
``rand_augment_transform`` semantics (the reference's IMNET image path:
build_transform_e2v -> create_transform(auto_augment='rand-m9-mstd0.5-inc1'),
datasets.py:359-363): each chosen op fires with probability 0.5 and uses a
FIXED level ``m`` of 10 (gaussian-jittered by ``mstd``, clipped to [0, 10])
mapped onto the 31-bin table as ``round(m/10 * 30)`` — NOT the event path's
``U[0, m]`` bin draw. The torchvision table's severity directions already
match timm's ``inc1`` increasing-severity variants (Posterize bits fall,
Solarize threshold falls as m rises); timm's Invert/SolarizeAdd ops and its
steeper Posterize ramp are the remaining (documented) statistical deltas.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NUM_BINS = 31
_LUMA = jnp.array([0.299, 0.587, 0.114])

OP_NAMES = [
    "Identity", "ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate",
    "Brightness", "Color", "Contrast", "Sharpness", "Posterize", "Solarize",
    "AutoContrast", "Equalize",
]


def _magnitude_table(h: int, w: int):
    """(14, NUM_BINS) magnitude bins (transforms.py:419-434); unsigned ops get
    zeros. Rows align with OP_NAMES."""
    lin = jnp.linspace
    rows = [
        jnp.zeros(NUM_BINS),                                  # Identity
        lin(0.0, 0.3, NUM_BINS),                              # ShearX
        lin(0.0, 0.3, NUM_BINS),                              # ShearY
        lin(0.0, 150.0 / 331.0 * w, NUM_BINS),                # TranslateX
        lin(0.0, 150.0 / 331.0 * h, NUM_BINS),                # TranslateY
        lin(0.0, 30.0, NUM_BINS),                             # Rotate
        lin(0.0, 0.9, NUM_BINS),                              # Brightness
        lin(0.0, 0.9, NUM_BINS),                              # Color
        lin(0.0, 0.9, NUM_BINS),                              # Contrast
        lin(0.0, 0.9, NUM_BINS),                              # Sharpness
        8 - jnp.round(jnp.arange(NUM_BINS) / ((NUM_BINS - 1) / 4)),  # Posterize
        lin(255.0, 0.0, NUM_BINS),                            # Solarize
        jnp.zeros(NUM_BINS),                                  # AutoContrast
        jnp.zeros(NUM_BINS),                                  # Equalize
    ]
    return jnp.stack(rows)


_SIGNED = jnp.array(
    [False, True, True, True, True, True, True, True, True, True, False, False, False, False]
)


# ---------------------------------------------------------------------------
# geometric ops as 1-D shear passes (TPU-native)
#
# Elementwise gathers are the slowest thing a TPU does; a 2-D bilinear warp
# via 4-tap gather was measured at ~25 ms/op/batch. Instead every geometric
# op here decomposes into per-row 1-D resamples with a *constant fractional
# shift per row*: a batched contiguous dynamic_slice (fast vector loads) +
# one lerp. Rotation uses the exact Paeth 3-shear decomposition
#   R(th) = ShearX(tan(th/2)) . ShearY(-sin th) . ShearX(tan(th/2))
# which reproduces the inverse-rotation sampling matrix exactly (and is the
# classic high-quality rotation scheme). Zero fill outside the frame matches
# torchvision's fill=None.
# ---------------------------------------------------------------------------

_PAD = 112  # static bound: max |offset| (translate <= 150/331*224 ~ 102)


def _shift_rows(img_f, offsets):
    """out[i, j] = img[i, j + offsets[i]] with 1-D bilinear interp and zero
    fill; offsets: (H,) float, |offsets| < _PAD.

    The per-row integer shift is applied by binary decomposition: 8 static
    rolls (1, 2, ... 128) each taken per-row where the corresponding bit of
    the shift is set. Rolls and selects are pure VPU elementwise traffic —
    no gathers, no dynamic slices — which is the fastest way to express a
    data-dependent permutation this structured on a TPU. The chain runs in
    bf16: pixel values 0..255 are exact in bf16 (8 mantissa bits); only the
    final fractional lerp rounds, inside RandAugment's statistical-parity
    domain.
    """
    H, W, C = img_f.shape
    padded = jnp.pad(img_f.astype(jnp.bfloat16), ((0, 0), (_PAD, _PAD), (0, 0)))
    n = jnp.floor(offsets).astype(jnp.int32)
    f = (offsets - n)[:, None, None]
    m = jnp.clip(n + _PAD, 0, 2 * _PAD)       # left-shift amount in [0, 224]

    cur = padded
    for b in range(8):                         # 2^8 - 1 >= 224
        amt = 1 << b
        rolled = jnp.roll(cur, -amt, axis=1)
        bit = ((m >> b) & 1).astype(bool)[:, None, None]
        cur = jnp.where(bit, rolled, cur)
    # rows shifted so that cur[i, j] = padded[i, j + m_i]; wraparound cannot
    # contaminate [0, W): j + m_i <= W - 1 + 2*_PAD < W + 2*_PAD.
    a = cur[:, :W].astype(jnp.float32)
    b2 = jnp.roll(cur, -1, axis=1)[:, :W].astype(jnp.float32)
    return a * (1 - f) + b2 * f


def _shift_cols(img_f, offsets):
    return _shift_rows(img_f.transpose(1, 0, 2), offsets).transpose(1, 0, 2)


def _centered(n):
    return jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0


def _shear_x(img_f, mag):
    # net effect x_src = x + mag * y_centered (torchvision ShearX semantics)
    H = img_f.shape[0]
    return _shift_rows(img_f, mag * _centered(H))


def _shear_y(img_f, mag):
    W = img_f.shape[1]
    return _shift_cols(img_f, mag * _centered(W))


def _translate_x(img_f, mag):
    H = img_f.shape[0]
    return _shift_rows(img_f, jnp.broadcast_to(-jnp.trunc(mag), (H,)))


def _translate_y(img_f, mag):
    W = img_f.shape[1]
    return _shift_cols(img_f, jnp.broadcast_to(-jnp.trunc(mag), (W,)))


def _rotate(img_f, deg):
    th = jnp.deg2rad(deg)
    t = jnp.tan(th / 2.0)
    s = -jnp.sin(th)
    H, W, _ = img_f.shape
    out = _shift_rows(img_f, t * _centered(H))
    out = _shift_cols(out, s * _centered(W))
    out = _shift_rows(out, t * _centered(H))
    return out


# ---------------------------------------------------------------------------
# photometric (torchvision functional_tensor semantics on uint8-as-float)
# ---------------------------------------------------------------------------

def _blend(a, b, ratio):
    return jnp.clip(ratio * a + (1.0 - ratio) * b, 0.0, 255.0)


def _gray(img_f):
    g = jnp.sum(img_f * _LUMA, axis=-1, keepdims=True)
    return jnp.round(g)  # rgb_to_grayscale rounds for int dtypes


def _brightness(img_f, mag):
    return _blend(img_f, jnp.zeros_like(img_f), 1.0 + mag)


def _color(img_f, mag):
    return _blend(img_f, _gray(img_f), 1.0 + mag)


def _contrast(img_f, mag):
    mean = jnp.mean(_gray(img_f))
    return _blend(img_f, jnp.full_like(img_f, mean), 1.0 + mag)


def _sharpness(img_f, mag):
    # torchvision: blur with [[1,1,1],[1,5,1],[1,1,1]]/13, keep border pixels
    k = jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    blurred = jax.lax.conv_general_dilated(
        img_f.transpose(2, 0, 1)[:, None],          # (C, 1, H, W)
        k[None, None],
        (1, 1),
        "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0].transpose(1, 2, 0)
    blurred = jnp.clip(jnp.round(blurred), 0, 255)
    H, W, _ = img_f.shape
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    interior = ((ys > 0) & (ys < H - 1) & (xs > 0) & (xs < W - 1))[..., None]
    blurred = jnp.where(interior, blurred, img_f)
    return _blend(img_f, blurred, 1.0 + mag)


def _posterize(img_f, mag):
    bits = jnp.clip(mag.astype(jnp.int32), 0, 8)
    keep_mask = (0xFF & ~((1 << (8 - bits)) - 1)).astype(jnp.uint8)
    return (img_f.astype(jnp.uint8) & keep_mask).astype(jnp.float32)


def _solarize(img_f, mag):
    return jnp.where(img_f >= mag, 255.0 - img_f, img_f)


def _autocontrast(img_f, _):
    lo = jnp.min(img_f, axis=(0, 1), keepdims=True)
    hi = jnp.max(img_f, axis=(0, 1), keepdims=True)
    eq = hi == lo
    scale = 255.0 / jnp.where(eq, 1.0, hi - lo)
    out = jnp.clip((img_f - lo) * scale, 0, 255)
    return jnp.where(eq, img_f, out)


def _equalize(img_f, _):
    """Per-channel histogram equalization (torchvision LUT semantics).

    TPU-native via RADIX-16 one-hots: each uint8 value splits into 4-bit
    hi/lo nibbles, whose 16-wide one-hots are 16x smaller than a 256-wide
    one-hot. The histogram is the MXU outer product hist[h,l] = HI^T @ LO
    and the LUT apply is the bilinear form out[p] = (HI @ lutm) . LO —
    so the (HW, 256, C) one-hot (which XLA materialized in HBM because
    both hist and apply consumed it: 100 MB/image, 38.2 ms/batch at
    B=128) never exists. Measured 4.9 ms/batch, bit-exact (counts and
    LUT values <= 2^24 are exact in the bf16-operand/f32-accum einsums).
    A vmapped ``bincount``+gather was measured 30x slower still (TPU
    small-table gathers serialize: 425 ms/batch).
    """
    u8 = img_f.astype(jnp.int32)                         # (H, W, C)
    H, W, C = u8.shape
    pix = u8.reshape(H * W, C)
    hi = pix >> 4                                         # (HW, C) in [0,16)
    lo = pix & 15
    r16 = jnp.arange(16, dtype=jnp.int32)
    HI = (hi[:, None, :] == r16[None, :, None]).astype(jnp.bfloat16)
    LO = (lo[:, None, :] == r16[None, :, None]).astype(jnp.bfloat16)
    # hist[h, l, c] = #pixels of channel c with value 16h + l
    hist = jnp.einsum("phc,plc->hlc", HI, LO,
                      preferred_element_type=jnp.float32)
    hist = jnp.round(hist).astype(jnp.int32).reshape(256, C)

    nz = hist > 0
    last_idx = 255 - jnp.argmax(nz[::-1], axis=0)         # (C,)
    last_val = jnp.take_along_axis(hist, last_idx[None], axis=0)[0]
    step = (jnp.sum(hist, axis=0) - last_val) // 255      # (C,)
    lut = (jnp.cumsum(hist, axis=0) + step // 2) // jnp.maximum(step, 1)
    lut = jnp.clip(
        jnp.concatenate([jnp.zeros((1, C), lut.dtype), lut])[:-1], 0, 255
    )                                                     # (256, C)
    lutm = lut.reshape(16, 16, C).astype(jnp.bfloat16)    # values <= 255 exact
    # out[p, c] = sum_{h,l} HI[p,h,c] lutm[h,l,c] LO[p,l,c]
    out = jnp.einsum("phc,hlc->plc", HI, lutm,
                     preferred_element_type=jnp.float32)
    out = jnp.sum(out * LO.astype(jnp.float32), axis=1).reshape(H, W, C)
    return jnp.where(step[None, None] == 0, img_f, out)


_OPS = [
    lambda img, mag: img,  # Identity
    _shear_x,
    _shear_y,
    _translate_x,
    _translate_y,
    _rotate,
    _brightness,
    _color,
    _contrast,
    _sharpness,
    _posterize,
    _solarize,
    _autocontrast,
    _equalize,
]


def _apply_op(img_f, op_idx, mag):
    return jax.lax.switch(op_idx, _OPS, img_f, mag)


# photometric-only subset for the segmentation pipeline
# (EventRandAugmentEvs(no_geometric_trafos=True), dsec.py pipeline)
_PHOTOMETRIC_IDS = jnp.array([0, 6, 7, 8, 9, 10, 11, 12, 13])

# op indices (must match OP_NAMES/_OPS ordering)
_ID, _SHX, _SHY, _TRX, _TRY, _ROT = 0, 1, 2, 3, 4, 5

_PHOTO_OPS = _OPS[6:]  # Brightness..Equalize


def _geometric_round(img, op_idx, mag, H, W):
    """Apply whichever geometric op ``op_idx`` selects (identity for
    photometric indices) as a SHARED x-pass -> y-pass -> x-pass pipeline.

    Under vmap, a lax.switch runs every branch on the whole batch; five
    separate warp branches cost 5x. But ShearX/Y, TranslateX/Y and the Paeth
    3-shear Rotate are all compositions of at most three 1-D shift passes —
    so one pipeline with op-dependent offset vectors covers them all at the
    cost of a single rotate.
    """
    th = jnp.deg2rad(mag)
    t_rot = jnp.tan(th / 2.0)
    s_rot = -jnp.sin(th)
    ic = _centered(H)
    jc = _centered(W)

    is_rot = op_idx == _ROT
    x1 = jnp.where(op_idx == _SHX, mag, 0.0) * ic \
        + jnp.where(is_rot, t_rot, 0.0) * ic \
        + jnp.where(op_idx == _TRX, -jnp.trunc(mag), 0.0)
    y1 = jnp.where(op_idx == _SHY, mag, 0.0) * jc \
        + jnp.where(is_rot, s_rot, 0.0) * jc \
        + jnp.where(op_idx == _TRY, -jnp.trunc(mag), 0.0)
    x2 = jnp.where(is_rot, t_rot, 0.0) * ic

    img = _shift_rows(img, x1)
    img = _shift_cols(img, y1)
    img = _shift_rows(img, x2)
    return img


def _draw_bin(k_mag, magnitude, timm_levels: bool, mstd: float):
    """U[0, m] bin draw (torchvision/EventRandAugment, transforms.py:456)
    or timm's fixed jittered level mapped to the 31-bin table."""
    if not timm_levels:
        return jax.random.randint(k_mag, (), 0, magnitude + 1)
    lvl = jnp.float32(magnitude)
    if mstd > 0:
        lvl = lvl + mstd * jax.random.normal(k_mag)
    lvl = jnp.clip(lvl, 0.0, 10.0)
    return jnp.round(lvl / 10.0 * (NUM_BINS - 1)).astype(jnp.int32)


def rand_augment(
    img_u8: jnp.ndarray,
    key: jax.Array,
    num_ops: int = 2,
    magnitude: int = 20,
    geometric: bool = True,
    timm_levels: bool = False,
    mstd: float = 0.0,
    prob: float = 1.0,
) -> jnp.ndarray:
    """Apply RandAugment to one (H, W, 3) uint8 image. Returns uint8."""
    H, W, _ = img_u8.shape
    table = _magnitude_table(H, W)
    img = img_u8.astype(jnp.float32)
    for _ in range(num_ops):
        key, k_op, k_mag, k_sign, k_ap = jax.random.split(key, 5)
        if geometric:
            op_idx = jax.random.randint(k_op, (), 0, len(_OPS))
        else:
            op_idx = _PHOTOMETRIC_IDS[
                jax.random.randint(k_op, (), 0, _PHOTOMETRIC_IDS.shape[0])
            ]
        bin_idx = _draw_bin(k_mag, magnitude, timm_levels, mstd)
        sign = jax.random.randint(k_sign, (), 0, 2)
        mag = table[op_idx, bin_idx]
        mag = jnp.where(_SIGNED[op_idx] & (sign == 1), -mag, mag)
        if geometric:
            new = _geometric_round(img, op_idx, mag, H, W)
            # photometric switch: geometric/identity indices map to identity
            photo_idx = jnp.where(op_idx >= 6, op_idx - 6, len(_PHOTO_OPS))
            new = jax.lax.switch(
                photo_idx, list(_PHOTO_OPS) + [lambda im, m: im], new, mag
            )
        else:
            new = _apply_op(img, op_idx, mag)
        if prob < 1.0:
            img = jnp.where(jax.random.uniform(k_ap) < prob, new, img)
        else:
            img = new
    # back to uint8 with truncation (torchvision .to(uint8))
    return jnp.clip(img, 0, 255).astype(jnp.uint8)


def rand_augment_batch(
    imgs_u8, keys, num_ops: int = 2, magnitude: int = 20, batch_ops: bool = False,
    geometric: bool = True, timm_levels: bool = False, mstd: float = 0.0,
    prob: float = 1.0,
):
    """Batched RandAugment.

    ``batch_ops=False`` (default): per-sample op choice, exactly the
    reference semantics — but under vmap every lax.switch branch executes on
    the full batch, costing ~14x the selected work.

    ``batch_ops=True``: ONE op choice per round shared by the whole batch
    (magnitudes/signs/apply-gates still per sample). A documented deviation
    for speed: over thousands of steps the marginal distribution of applied
    ops is identical; only within-batch correlation changes.
    """
    if not batch_ops:
        return jax.vmap(
            partial(rand_augment, num_ops=num_ops, magnitude=magnitude,
                    geometric=geometric, timm_levels=timm_levels, mstd=mstd,
                    prob=prob)
        )(imgs_u8, keys)

    B, H, W, _ = imgs_u8.shape
    table = _magnitude_table(H, W)
    imgs = imgs_u8.astype(jnp.float32)
    batch_key = jax.random.fold_in(keys[0], 0x5EED)
    for r in range(num_ops):
        batch_key, k_op = jax.random.split(batch_key)
        if geometric:
            op_idx = jax.random.randint(k_op, (), 0, len(_OPS))
        else:
            op_idx = _PHOTOMETRIC_IDS[
                jax.random.randint(k_op, (), 0, _PHOTOMETRIC_IDS.shape[0])
            ]

        def per_sample(img, key):
            k_mag, k_sign, k_ap = jax.random.split(jax.random.fold_in(key, r), 3)
            bin_idx = _draw_bin(k_mag, magnitude, timm_levels, mstd)
            sign = jax.random.randint(k_sign, (), 0, 2)
            mag = table[op_idx, bin_idx]
            mag = jnp.where(_SIGNED[op_idx] & (sign == 1), -mag, mag)
            new = _apply_op(img, op_idx, mag)
            if prob < 1.0:
                return jnp.where(jax.random.uniform(k_ap) < prob, new, img)
            return new

        imgs = jax.vmap(per_sample)(imgs, keys)
    return jnp.clip(imgs, 0, 255).astype(jnp.uint8)
