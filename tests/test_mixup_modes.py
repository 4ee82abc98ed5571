"""Tests for timm-parity mixup modes (train/mixup.py): elem, pair,
cutmix_minmax (reference run_class_finetuning.py:504-511 wires timm Mixup
with --mixup_mode/--cutmix_minmax)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mem_tpu.train.mixup import make_mixup


def _setup(B=8, H=16, W=16, C=3, K=5, seed=0):
    rng = np.random.default_rng(seed)
    imgs = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, K, B))
    return imgs, labels


def _label_lam(soft, t1, t2):
    """Recover per-sample lambda from mixed soft labels (rows of t1/t2).

    Returns (lam, valid): rows where t1 == t2 (sample mixed with one of its
    own class) carry no lambda information and are flagged invalid."""
    diff = t1 - t2
    num = ((soft - t2) * diff).sum(axis=-1)
    den = (diff * diff).sum(axis=-1)
    valid = np.asarray(den) > 1e-12
    lam = np.where(valid, np.asarray(num) / np.maximum(np.asarray(den), 1e-12), 1.0)
    return lam, valid


@pytest.mark.parametrize("mode", ["batch", "elem", "pair"])
def test_pixel_label_lambda_consistency(mode):
    """The pixel mix fraction must equal the label mix fraction per sample."""
    imgs, labels = _setup()
    fn = make_mixup(5, mixup_alpha=0.8, cutmix_alpha=1.0, prob=1.0,
                    switch_prob=0.5, label_smoothing=0.0, mode=mode)
    from mem_tpu.train.mixup import _one_hot_smoothed

    t1 = np.asarray(_one_hot_smoothed(labels, 5, 0.0))
    for seed in range(6):
        mixed, soft = jax.jit(fn)(jax.random.key(seed), imgs, labels)
        lam, valid = _label_lam(np.asarray(soft), t1, t1[::-1])
        # reconstruct pixel lam: solve mixed = a*img + (1-a)*flip per sample
        x = np.asarray(imgs).reshape(8, -1)
        xf = x[::-1]
        m = np.asarray(mixed).reshape(8, -1)
        d = x - xf
        num = ((m - xf) * d).sum(axis=1)
        den = (d * d).sum(axis=1)
        pix_lam = num / den
        # cutmix pastes whole pixels, so the least-squares "lam" equals the
        # box-area-weighted fraction only approximately. Rows whose mirror
        # partner shares the class carry no label-lambda information.
        np.testing.assert_allclose(pix_lam[valid], lam[valid], atol=0.35)
        # labels in [0,1] and rows sum to 1
        s = np.asarray(soft)
        assert np.all(s >= -1e-6) and np.allclose(s.sum(axis=1), 1.0, atol=1e-5)


def test_elem_mode_has_per_sample_lambdas():
    imgs, labels = _setup(B=16)
    fn = make_mixup(5, mixup_alpha=0.8, cutmix_alpha=0.0, prob=1.0,
                    switch_prob=0.0, label_smoothing=0.0, mode="elem")
    from mem_tpu.train.mixup import _one_hot_smoothed

    t1 = np.asarray(_one_hot_smoothed(labels, 5, 0.0))
    _, soft = jax.jit(fn)(jax.random.key(1), imgs, labels)
    lam, valid = _label_lam(np.asarray(soft), t1, t1[::-1])
    mixed_rows = lam[valid & (lam > 1e-3) & (lam < 1 - 1e-3)]
    # per-element mode: lambdas differ across samples (batch mode: all equal)
    assert len(np.unique(np.round(mixed_rows, 6))) > 3


def test_batch_mode_single_lambda():
    imgs, labels = _setup(B=16)
    fn = make_mixup(5, mixup_alpha=0.8, cutmix_alpha=0.0, prob=1.0,
                    switch_prob=0.0, label_smoothing=0.0, mode="batch")
    mixed, _ = jax.jit(fn)(jax.random.key(2), imgs, labels)
    x = np.asarray(imgs).reshape(16, -1)
    m = np.asarray(mixed).reshape(16, -1)
    xf = x[::-1]
    d = x - xf
    lam = (((m - xf) * d).sum(axis=1) / (d * d).sum(axis=1))
    assert np.allclose(lam, lam[0], atol=1e-5)


def test_pair_mode_symmetric():
    """Pairs (i, B-1-i) share lambda; odd-middle element untouched."""
    imgs, labels = _setup(B=9)
    fn = make_mixup(5, mixup_alpha=0.8, cutmix_alpha=0.0, prob=1.0,
                    switch_prob=0.0, label_smoothing=0.0, mode="pair")
    from mem_tpu.train.mixup import _one_hot_smoothed

    t1 = np.asarray(_one_hot_smoothed(labels, 5, 0.0))
    mixed, soft = jax.jit(fn)(jax.random.key(3), imgs, labels)
    lam, valid = _label_lam(np.asarray(soft), t1, t1[::-1])
    for i in range(4):
        j = 8 - i
        if valid[i] and abs(lam[i] - 1) > 1e-3:  # mixed pair
            assert abs(lam[i] - lam[j]) < 1e-4
    # middle element of odd batch is exactly unmixed
    np.testing.assert_allclose(np.asarray(mixed)[4], np.asarray(imgs)[4],
                               atol=1e-7)


def test_cutmix_minmax_box_bounds():
    """rand_bbox_minmax: box side ratios within minmax, box fully inside,
    label lambda equals the exact non-box area fraction."""
    imgs, labels = _setup(B=8, H=32, W=32)
    fn = make_mixup(5, mixup_alpha=0.0, cutmix_alpha=0.0, prob=1.0,
                    switch_prob=0.0, label_smoothing=0.0, mode="batch",
                    cutmix_minmax=(0.3, 0.6))
    assert fn is not None  # minmax enables cutmix despite cutmix_alpha=0
    from mem_tpu.train.mixup import _one_hot_smoothed

    t1 = np.asarray(_one_hot_smoothed(labels, 5, 0.0))
    for seed in range(8):
        mixed, soft = jax.jit(fn)(jax.random.key(seed), imgs, labels)
        m, x, xf = (np.asarray(a) for a in (mixed, imgs, imgs[::-1]))
        # every pixel comes whole from x or xf (no lerp in cutmix)
        from_x = np.isclose(m, x, atol=1e-7).all(axis=-1)
        from_xf = np.isclose(m, xf, atol=1e-7).all(axis=-1)
        assert np.all(from_x | from_xf)
        # pasted fraction within [0.3^2, 0.6^2] plus int-truncation slack
        frac = 1.0 - from_x.mean(axis=(1, 2))
        assert np.all(frac <= 0.36 + 0.04) and np.all(frac >= 0.09 - 0.04)
        lam, valid = _label_lam(np.asarray(soft), t1, t1[::-1])
        np.testing.assert_allclose(lam[valid], (1.0 - frac)[valid], atol=0.02)


def test_bad_mode_and_minmax():
    with pytest.raises(ValueError):
        make_mixup(5, mode="element")
    with pytest.raises(ValueError):
        make_mixup(5, cutmix_minmax=(0.2,))


def test_disabled_returns_none():
    assert make_mixup(5, 0.8, 1.0, prob=0.0) is None
    assert make_mixup(5, 0.0, 0.0, prob=1.0) is None
