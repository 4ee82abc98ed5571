"""Visual diagnostics (reference SURVEY §5.5: wandb reconstruction/mask
dumps, engine_for_pretraining.py:28-105; sample dumps,
engine_for_finetuning.py:60-74; seg annotation plots, tools/plot_anns.py).

All functions return HWC uint8 numpy images — loggable to wandb/tensorboard
or saved as PNGs — and take framework-native arrays (NHWC float [0,1] event
images, (B, N) masks, (H, W) label maps).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _to_u8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img, dtype=np.float32)
    lo, hi = img.min(), img.max()
    if hi > lo:
        img = (img - lo) / (hi - lo)
    return (img * 255).astype(np.uint8)


def event_image_to_rgb(img: np.ndarray) -> np.ndarray:
    """(H, W, 3) event histogram -> display RGB: positive counts red,
    negative counts blue, timesurface green (the natural reading of the
    channel convention)."""
    img = np.asarray(img, dtype=np.float32)
    rgb = np.stack([img[..., 0], img[..., 1], img[..., 2]], axis=-1)
    return _to_u8(rgb)


def grid(images: Sequence[np.ndarray], cols: int = 4, pad: int = 2) -> np.ndarray:
    """Tile HWC uint8 images into a grid."""
    images = [np.asarray(im) for im in images]
    h, w, c = images[0].shape
    rows = -(-len(images) // cols)
    out = np.zeros((rows * (h + pad) - pad, cols * (w + pad) - pad, c), np.uint8)
    for i, im in enumerate(images):
        r, cc = divmod(i, cols)
        out[r * (h + pad) : r * (h + pad) + h, cc * (w + pad) : cc * (w + pad) + w] = im
    return out


def mask_overlay(img: np.ndarray, bool_mask: np.ndarray, patch: int = 16) -> np.ndarray:
    """Dim the masked patches of an event image (the BEiT mask visualization,
    engine_for_pretraining.py:192-201 style). ``bool_mask`` is (N,) over the
    (H/patch, W/patch) grid."""
    rgb = event_image_to_rgb(img).astype(np.float32)
    H, W, _ = rgb.shape
    gh, gw = H // patch, W // patch
    m = np.asarray(bool_mask, bool).reshape(gh, gw)
    up = np.kron(m, np.ones((patch, patch), bool))
    rgb[up] *= 0.25
    return rgb.astype(np.uint8)


def reconstruction_panel(
    originals: np.ndarray, reconstructions: np.ndarray, cols: int = 4
) -> np.ndarray:
    """Side-by-side original/reconstruction rows (VAE eval dumps)."""
    imgs = []
    for o, r in zip(originals, reconstructions):
        imgs.append(event_image_to_rgb(o))
        imgs.append(event_image_to_rgb(r))
    return grid(imgs, cols=cols)


# distinct color palette for label maps (Cityscapes-like hues)
_PALETTE = np.array(
    [
        [128, 64, 128], [244, 35, 232], [70, 70, 70], [102, 102, 156],
        [190, 153, 153], [153, 153, 153], [250, 170, 30], [220, 220, 0],
        [107, 142, 35], [152, 251, 152], [70, 130, 180], [220, 20, 60],
        [255, 0, 0], [0, 0, 142], [0, 0, 70], [0, 60, 100], [0, 80, 100],
        [0, 0, 230], [119, 11, 32],
    ],
    dtype=np.uint8,
)


def colorize_labels(labels: np.ndarray, ignore_index: int = 255) -> np.ndarray:
    """(H, W) int label map -> RGB (plot_anns.py role); ignore -> black."""
    labels = np.asarray(labels)
    out = np.zeros((*labels.shape, 3), np.uint8)
    valid = labels != ignore_index
    out[valid] = _PALETTE[labels[valid] % len(_PALETTE)]
    return out


def seg_panel(img: np.ndarray, pred: np.ndarray, label: Optional[np.ndarray] = None):
    """Event image | prediction | (ground truth) side by side."""
    tiles = [event_image_to_rgb(img), colorize_labels(pred)]
    if label is not None:
        tiles.append(colorize_labels(label))
    return grid(tiles, cols=len(tiles))


def save_png(path: str, img: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(img).save(path)


def dump_sample_panels(out_dir: str, images: np.ndarray,
                       labels: Optional[np.ndarray] = None,
                       start: int = 0) -> int:
    """Human-in-the-loop preprocessed-sample dumps — the role of the
    reference's DUMB_DATA_HUMAN_CLASSIFIER epoch-0 loop
    (engine_for_finetuning.py:19,60-74: channel 0 | channel 2 side by side
    per sample) and the seg pipeline's SaveToDisk op
    (EventDataset.py:682-708: img + gt_semantic_seg PNGs). ``images`` is
    (B, H, W, 3) float; classification dumps count-channel panels, seg
    (``labels`` given, (B, H, W) int) dumps image | colorized annotation.
    Returns the next sample index."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    images = np.asarray(images)
    for i in range(images.shape[0]):
        im = images[i]
        if labels is not None:
            panel = grid([event_image_to_rgb(im),
                          colorize_labels(np.asarray(labels)[i])], cols=2)
        else:
            h, w, _ = im.shape
            ch = [np.repeat(_to_u8(im[..., c])[..., None], 3, -1)
                  for c in (0, 2)]
            panel = grid(ch, cols=2)
        save_png(os.path.join(out_dir, f"{start + i:05d}.png"), panel)
    return start + images.shape[0]
