"""Discrete VAE event tokenizer (DALL-E style, Gumbel-softmax over a codebook).

Reimplements the semantics of eventvae/vae/vae_model.py:45-213 as a flax
module in NHWC layout: conv encoder (``num_layers`` stride-2 4x4 convs +
ResBlocks + 1x1 -> ``num_tokens`` logits), Gumbel-softmax sampling against an
(num_tokens, codebook_dim) codebook, mirrored deconv decoder, and
reconstruction + KL-to-uniform loss.

Parity notes:
  - ``TorchConvTranspose`` reproduces torch's ConvTranspose2d(k=4, s=2, p=1)
    exactly (input dilation + flipped kernel) so reference VAE checkpoints
    import bit-compatibly (mem_tpu.utils.torch_import).
  - The KL term replicates torch's
    ``F.kl_div(log_uniform, log_qy, reduction='batchmean', log_target=True)``
    — including the quirk that "batchmean" divides by the *input* tensor's
    first dimension, which is the broadcast 1-element log-uniform, i.e. the
    sum is NOT divided by batch size (vae_model.py:204-208). Weight defaults
    to 1e-10 so this is mainly a parity detail.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mem_tpu.ops.softmax import log_softmax_lastdim, softmax_lastdim


# ConvTranspose implementation: False (default) = input-dilated conv; True =
# sub-pixel decomposition (4 dense 2x2 convs per output parity + interleave).
# MEASURED: XLA:TPU already skips the dilation zeros — the dilated conv runs
# at ~185 TF/s (peak), and the sub-pixel form pays ~60 ms/step of interleave
# copies on the (B,224,224,384) tensors (VAE step 379 -> 434 ms, docs/
# PERF.md). Kept as a validated alternative; identical math either way.
SUBPIXEL_DECONV = False

# Custom VJP for the dilated deconv: XLA's autodiff of the lhs-dilated conv
# materializes a full spatial REVERSE of the (B, 2H, 2W, C) cotangent
# (~19 ms/step of the VAE trace, docs/PERF.md). Hand-derived backward:
#   d_x = conv(dy, K^T, stride 2, pad (1, 2))      (exact; no reverse)
#   d_K = linear_transpose of the sub-pixel form   (4 parity weight-grads
#                                                   over strided slices)
CUSTOM_DECONV_VJP = True


def _subpixel_conv(x, kernel, features: int):
    """Sub-pixel realization of ConvTranspose2d(4, 2, 1), bias-free.
    x (B, H, W, C), kernel (4, 4, C, O) -> (B, 2H, 2W, O)."""
    B, H, W, C = x.shape
    sel = ((3, 1), (2, 0))        # taps per parity: even -> K[3],K[1]
    pads = ((1, 0), (0, 1))       # even: left pad 1; odd: right pad 1
    outs = []
    for py in (0, 1):
        row = []
        for px in (0, 1):
            w = kernel[jnp.array(sel[py])][:, jnp.array(sel[px])]  # (2,2,C,O)
            row.append(jax.lax.conv_general_dilated(
                x, w, window_strides=(1, 1),
                padding=[pads[py], pads[px]],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ))
        outs.append(row)
    # interleave: out[:, 2i+py, 2j+px] = outs[py][px][:, i, j]
    y = jnp.stack([jnp.stack(r, axis=3) for r in outs], axis=2)
    return y.reshape(B, 2 * H, 2 * W, features)


@jax.custom_vjp
def _deconv421(x, kernel):
    """ConvTranspose2d(k=4, s=2, p=1) core (bias-free), dilated-conv forward
    with the reverse-free hand-derived backward (see CUSTOM_DECONV_VJP)."""
    return jax.lax.conv_general_dilated(
        x, jnp.flip(kernel, (0, 1)), (1, 1), [(2, 2), (2, 2)],
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _deconv421_fwd(x, kernel):
    return _deconv421(x, kernel), (x, kernel)


def _deconv421_bwd(res, dy):
    x, kernel = res
    d_x = jax.lax.conv_general_dilated(
        dy, jnp.swapaxes(kernel, 2, 3), (2, 2), [(1, 2), (1, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    feats = kernel.shape[-1]
    d_k = jax.linear_transpose(
        lambda kk: _subpixel_conv(x, kk, feats), kernel)(dy)[0]
    return d_x, d_k


_deconv421.defvjp(_deconv421_fwd, _deconv421_bwd)


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d with torch's exact semantics (kernel 4, stride 2,
    padding 1 doubles the spatial size).

    Two mathematically identical realizations (see SUBPIXEL_DECONV): the
    sub-pixel form derives from the dilated-conv definition
    ``out = conv(dilate(in, 2), flip(K), pad=2)``: dilated positions are
    nonzero only at even indices, so per output parity the sum collapses to
    two taps per dim —
        out[2m]   = in[m-1] K[3] + in[m]   K[1]
        out[2m+1] = in[m]   K[2] + in[m+1] K[0]
    i.e. four 2x2 convs with per-parity padding, interleaved 2x2."""

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        in_ch = x.shape[-1]
        # torch layout (in, out, kh, kw) stored transposed; we keep HWIO
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform", in_axis=-1, out_axis=-2),
            (k, k, in_ch, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        xd = x.astype(self.dtype)
        kd = kernel.astype(self.dtype)
        if SUBPIXEL_DECONV and (k, s, p) == (4, 2, 1):
            y = _subpixel_conv(xd, kd, self.features)
        elif CUSTOM_DECONV_VJP and (k, s, p) == (4, 2, 1):
            y = _deconv421(xd, kd)
        else:
            pad = k - 1 - p
            y = jax.lax.conv_general_dilated(
                xd, jnp.flip(kd, (0, 1)),
                window_strides=(1, 1),
                padding=[(pad, pad), (pad, pad)],
                lhs_dilation=(s, s),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return y + bias.astype(self.dtype)


class ResBlock(nn.Module):
    """conv3x3-ReLU-conv3x3-ReLU-conv1x1 + skip (vae_model.py:28-40)."""

    chan: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.chan, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.chan, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.chan, (1, 1), dtype=self.dtype, name="conv3")(h)
        return h + x


class DiscreteVAE(nn.Module):
    input_hw: Tuple[int, int] = (224, 224)
    num_tokens: int = 8192
    codebook_dim: int = 32
    num_layers: int = 4
    num_resnet_blocks: int = 3
    hidden_dim: int = 384
    channels: int = 3
    loss_type: str = "mse"            # mse | smooth_l1 | cosine
    straight_through: bool = False
    kl_div_loss_weight: float = 1e-10
    normalization: Optional[Tuple[Sequence[float], Sequence[float]]] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.input_hw[0] % (2**self.num_layers) == 0
        assert self.input_hw[1] % (2**self.num_layers) == 0
        self.codebook = nn.Embed(self.num_tokens, self.codebook_dim, name="codebook")

        enc = []
        in_next = self.hidden_dim
        for i in range(self.num_layers):
            enc.append(
                nn.Conv(
                    self.hidden_dim, (4, 4), strides=2, padding=1,
                    dtype=self.dtype, name=f"enc_conv_{i}",
                )
            )
        self.enc_convs = enc
        self.enc_res = [
            ResBlock(self.hidden_dim, self.dtype, name=f"enc_res_{i}")
            for i in range(self.num_resnet_blocks)
        ]
        self.enc_head = nn.Conv(self.num_tokens, (1, 1), dtype=self.dtype, name="enc_head")

        has_res = self.num_resnet_blocks > 0
        if has_res:
            self.dec_in = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype, name="dec_in")
        self.dec_res = [
            ResBlock(self.hidden_dim, self.dtype, name=f"dec_res_{i}")
            for i in range(self.num_resnet_blocks)
        ]
        self.dec_deconvs = [
            TorchConvTranspose(self.hidden_dim, dtype=self.dtype, name=f"dec_deconv_{i}")
            for i in range(self.num_layers)
        ]
        self.dec_head = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="dec_head")

    # -- pieces ------------------------------------------------------------

    def _norm(self, images):
        if self.normalization is None:
            return images
        means = jnp.asarray(self.normalization[0], images.dtype)
        stds = jnp.asarray(self.normalization[1], images.dtype)
        return (images - means) / stds

    def encode_logits(self, img):
        """(B, H, W, C) -> (B, h, w, num_tokens)."""
        x = self._norm(img).astype(self.dtype)
        for conv in self.enc_convs:
            x = nn.relu(conv(x))
        for res in self.enc_res:
            x = res(x)
        return self.enc_head(x)

    def decode_from_soft(self, soft_one_hot):
        """(B, h, w, num_tokens) soft codes -> (B, H, W, C) reconstruction."""
        x = jnp.einsum(
            "bhwn,nd->bhwd", soft_one_hot, self.codebook.embedding.astype(soft_one_hot.dtype)
        )
        if self.num_resnet_blocks > 0:
            x = self.dec_in(x)
        for res in self.dec_res:
            x = res(x)
        for deconv in self.dec_deconvs:
            x = nn.relu(deconv(x))
        return self.dec_head(x)

    def get_codebook_indices(self, img):
        """(B, H, W, C) -> (B, h*w) int32 argmax token ids
        (vae_model.py:153-158)."""
        logits = self.encode_logits(img)
        b = logits.shape[0]
        return jnp.argmax(logits, axis=-1).reshape(b, -1)

    def decode_indices(self, ids):
        """(B, n) token ids -> (B, H, W, C) (vae_model.py:160-171)."""
        h = self.input_hw[0] // 2**self.num_layers
        w = self.input_hw[1] // 2**self.num_layers
        emb = self.codebook(ids).reshape(ids.shape[0], h, w, self.codebook_dim)
        x = emb
        if self.num_resnet_blocks > 0:
            x = self.dec_in(x)
        for res in self.dec_res:
            x = res(x)
        for deconv in self.dec_deconvs:
            x = nn.relu(deconv(x))
        return self.dec_head(x)

    # -- losses ------------------------------------------------------------

    def _recon_loss(self, target, rec):
        target = target.astype(jnp.float32)
        rec = rec.astype(jnp.float32)
        if self.loss_type == "mse":
            return jnp.mean((target - rec) ** 2)
        if self.loss_type == "smooth_l1":
            d = jnp.abs(target - rec)
            return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))
        if self.loss_type == "cosine":
            tn = target / (jnp.linalg.norm(target, axis=-1, keepdims=True) + 1e-9)
            rn = rec / (jnp.linalg.norm(rec, axis=-1, keepdims=True) + 1e-9)
            return jnp.mean(1.0 - jnp.sum(tn * rn, axis=-1))
        raise ValueError(self.loss_type)

    def __call__(self, img, temperature: float = 0.9, rng=None, return_recons: bool = False,
                 gumbel_noise=None):
        """Training forward: returns loss (and optionally the reconstruction).

        ``rng`` is the Gumbel-noise key; defaults to the module's 'gumbel'
        RNG collection. ``gumbel_noise`` optionally injects the pre-drawn
        (B, h, w, num_tokens) noise array instead (used by the
        trajectory-parity harness to feed IDENTICAL noise to this model and
        its torch twin, scripts/parity_trajectory.py).
        """
        logits = self.encode_logits(img)
        if gumbel_noise is not None:
            g = gumbel_noise.astype(jnp.float32)
        else:
            if rng is None:
                rng = self.make_rng("gumbel")
            g = jax.random.gumbel(rng, logits.shape, dtype=jnp.float32)
        # barriered softmax: over the 8192-way vocab, XLA's fused
        # reduce-broadcast re-reads every row 64x (ops/softmax.py — 21x win)
        soft = softmax_lastdim((logits.astype(jnp.float32) + g) / temperature)
        if self.straight_through:
            hard = jax.nn.one_hot(jnp.argmax(soft, -1), self.num_tokens, dtype=soft.dtype)
            soft = hard + soft - jax.lax.stop_gradient(soft)
        out = self.decode_from_soft(soft.astype(self.dtype))

        recon = self._recon_loss(self._norm(img), out)

        # KL(q || uniform), summed (see class docstring for the batchmean quirk)
        log_qy = log_softmax_lastdim(logits.astype(jnp.float32))
        log_uniform = jnp.log(1.0 / self.num_tokens)
        kl = jnp.sum(jnp.exp(log_qy) * (log_qy - log_uniform))

        loss = recon + self.kl_div_loss_weight * kl
        if return_recons:
            return loss, out
        return loss


class LegacyDiscreteVAE(nn.Module):
    """lucidrains-style square-image DiscreteVAE
    (mem/modeling_discrete_vae.py:75-196).

    DEAD CODE in the reference: the module is never imported anywhere, and
    its trailing module-level ``from dall_e import load_model``
    (modeling_discrete_vae.py:198) would raise ImportError the moment anyone
    tried (SURVEY.md section 2.11(7)). It is implemented here anyway so the
    ``--discrete_vae_type`` API slot is backed by a working tokenizer for
    users who wire it up, per the reference's evident intent.

    Architectural differences from the event :class:`DiscreteVAE` above
    (vae_model.py): ResBlocks are INTERLEAVED with the stride-2 convs (one
    per resolution level, not a flat tail), the decoder's first deconv maps
    ``codebook_dim`` directly (no 1x1 entry conv), there is no input
    normalization, the loss menu is {mse, smooth_l1} only (no cosine), and
    ``get_codebook_indices`` returns the UNFLATTENED (B, h, w) grid
    (modeling_discrete_vae.py:131-136 — the event model flattens).

    Reference quirks preserved:
      - ``get_image_tokens_size`` hardcodes ``image_size // 8`` regardless of
        ``num_layers`` (modeling_discrete_vae.py:127-128; only correct for
        the default num_layers=3).
      - The KL term keeps the same ``batchmean``-over-a-broadcast-1-element-
        input quirk as the event model (the sum is NOT divided by batch
        size; modeling_discrete_vae.py:185-189 is the identical line).
      - ``decode`` infers a square grid via ``int(sqrt(n))``
        (modeling_discrete_vae.py:148-153).
    """

    image_size: int = 256
    num_tokens: int = 512
    codebook_dim: int = 512
    num_layers: int = 3
    hidden_dim: int = 64
    channels: int = 3
    smooth_l1_loss: bool = False
    temperature: float = 0.9
    straight_through: bool = False
    kl_div_loss_weight: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.num_layers >= 1, "number of layers must be >= 1"
        self.codebook = nn.Embed(self.num_tokens, self.codebook_dim, name="codebook")
        self.enc_convs = [
            nn.Conv(self.hidden_dim, (4, 4), strides=2, padding=1,
                    dtype=self.dtype, name=f"enc_conv_{i}")
            for i in range(self.num_layers)
        ]
        self.enc_res = [
            ResBlock(self.hidden_dim, self.dtype, name=f"enc_res_{i}")
            for i in range(self.num_layers)
        ]
        self.enc_head = nn.Conv(self.num_tokens, (1, 1), dtype=self.dtype,
                                name="enc_head")
        self.dec_deconvs = [
            TorchConvTranspose(self.hidden_dim, dtype=self.dtype,
                               name=f"dec_deconv_{i}")
            for i in range(self.num_layers)
        ]
        self.dec_res = [
            ResBlock(self.hidden_dim, self.dtype, name=f"dec_res_{i}")
            for i in range(self.num_layers)
        ]
        self.dec_head = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                                name="dec_head")

    def get_image_size(self):
        return self.image_size

    def get_image_tokens_size(self):
        # reference quirk: //8 regardless of num_layers
        return self.image_size // 8

    def encode_logits(self, img):
        """(B, H, W, C) -> (B, h, w, num_tokens): [conv4s2+ReLU, ResBlock]
        per layer, then the 1x1 head (modeling_discrete_vae.py:107-115)."""
        x = img.astype(self.dtype)
        for conv, res in zip(self.enc_convs, self.enc_res):
            x = res(nn.relu(conv(x)))
        return self.enc_head(x)

    def _decode_from_grid(self, x):
        """(B, h, w, codebook_dim) -> (B, H, W, C): [deconv4s2+ReLU, ResBlock]
        per layer, then the 1x1 head (modeling_discrete_vae.py:111-117)."""
        for deconv, res in zip(self.dec_deconvs, self.dec_res):
            x = res(nn.relu(deconv(x)))
        return self.dec_head(x)

    def get_codebook_indices(self, img):
        """(B, H, W, C) -> (B, h, w) int argmax ids — unflattened, unlike the
        event model (modeling_discrete_vae.py:131-136)."""
        return jnp.argmax(self.encode_logits(img), axis=-1)

    def get_codebook_probs(self, img):
        """(B, H, W, C) -> (B, h, w, num_tokens) softmax probabilities
        (modeling_discrete_vae.py:138-142)."""
        return softmax_lastdim(self.encode_logits(img).astype(jnp.float32))

    def decode_indices(self, ids):
        """(B, n) flat token ids, square grid inferred as int(sqrt(n))
        (modeling_discrete_vae.py:144-153)."""
        b, n = ids.shape
        h = w = int(n ** 0.5)
        emb = self.codebook(ids).reshape(b, h, w, self.codebook_dim)
        return self._decode_from_grid(emb.astype(self.dtype))

    def _recon_loss(self, target, rec):
        target = target.astype(jnp.float32)
        rec = rec.astype(jnp.float32)
        if self.smooth_l1_loss:
            d = jnp.abs(target - rec)
            return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))
        return jnp.mean((target - rec) ** 2)

    def __call__(self, img, temp: Optional[float] = None, rng=None,
                 return_recons: bool = False, gumbel_noise=None):
        """Training forward -> loss (modeling_discrete_vae.py:156-196).
        Same ``gumbel_noise`` injection hook as the event model for
        twin-parity testing."""
        assert img.shape[1] == self.image_size and img.shape[2] == self.image_size, \
            f"input must have the correct image size {self.image_size}"
        logits = self.encode_logits(img)
        if gumbel_noise is not None:
            g = gumbel_noise.astype(jnp.float32)
        else:
            if rng is None:
                rng = self.make_rng("gumbel")
            g = jax.random.gumbel(rng, logits.shape, dtype=jnp.float32)
        t = self.temperature if temp is None else temp
        soft = softmax_lastdim((logits.astype(jnp.float32) + g) / t)
        if self.straight_through:
            hard = jax.nn.one_hot(jnp.argmax(soft, -1), self.num_tokens,
                                  dtype=soft.dtype)
            soft = hard + soft - jax.lax.stop_gradient(soft)
        z = jnp.einsum("bhwn,nd->bhwd", soft,
                       self.codebook.embedding.astype(soft.dtype))
        out = self._decode_from_grid(z.astype(self.dtype))

        recon = self._recon_loss(img, out)
        log_qy = log_softmax_lastdim(logits.astype(jnp.float32))
        log_uniform = jnp.log(1.0 / self.num_tokens)
        kl = jnp.sum(jnp.exp(log_qy) * (log_qy - log_uniform))
        loss = recon + self.kl_div_loss_weight * kl
        if return_recons:
            return loss, out
        return loss
