"""Full-stack export/import round trip (round-2 verdict item #8): a TRAINED
JAX checkpoint -> cli/export_torch .pth -> re-import -> surgery finetune
path, asserting end-to-end equality at every hop — the cross-ecosystem
handshake a real-hardware parity run needs (reference: utils.py:613-732)."""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

IMG, PATCH, DIM, DEPTH, HEADS, VOCAB, NCLS = 32, 8, 48, 2, 4, 32, 3
GRID = IMG // PATCH


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory, rng_module=None):
    """A genuinely TRAINED (3 steps) pt_vit checkpoint on disk."""
    from mem_tpu.data.device_pipeline import PreprocConfig
    from mem_tpu.models import create_model
    from mem_tpu.models.discrete_vae import DiscreteVAE
    from mem_tpu.train.optim import create_optimizer
    from mem_tpu.train.steps import make_pretrain_train_step
    from mem_tpu.utils.checkpoint import save_checkpoint

    rng = np.random.default_rng(0)
    model = create_model(
        "pt_vit", vocab_size=VOCAB, img_size=(IMG, IMG),
        patch_size=(PATCH, PATCH), embed_dim=DIM, depth=DEPTH,
        num_heads=HEADS, init_values=0.1, use_shared_rel_pos_bias=True,
    )
    vae = DiscreteVAE(input_hw=(IMG, IMG), num_tokens=VOCAB, codebook_dim=8,
                      num_layers=3, num_resnet_blocks=1, hidden_dim=16)
    preproc = PreprocConfig(input_h=IMG, input_w=IMG, canvas_h=48,
                            canvas_w=48, rand_aug=False, color_jitter=0.0)
    B, N = 4, 128
    batch = {
        "events": (rng.random((B, N, 4)) * 40).astype(np.float32),
        "n_valid": np.full((B,), N, np.int32),
        "label": np.zeros((B,), np.int64),
        "sample_h": np.full((B,), 48, np.int32),
        "sample_w": np.full((B,), 48, np.int32),
        "time_flip": np.zeros((B,), bool),
        "x_flip": np.zeros((B,), bool),
        "shift_xy": np.zeros((B, 2), np.int32),
        "aug_seed": np.arange(B, dtype=np.uint32),
        "mask": np.tile(np.arange(GRID * GRID) < GRID * GRID // 2, (B, 1)),
    }
    jb = jax.tree.map(jnp.asarray, batch)
    dummy = jnp.zeros((1, IMG, IMG, 3))
    params = jax.jit(model.init)(
        jax.random.key(0), dummy, jnp.zeros((1, GRID * GRID), bool))
    vae_params = jax.jit(vae.init)(
        {"params": jax.random.key(1), "gumbel": jax.random.key(2)}, dummy, 1.0)
    tx = create_optimizer(params, lambda s: 1e-3, weight_decay=0.05)
    opt_state = tx.init(params)
    step = make_pretrain_train_step(model, vae, tx, preproc)
    for i in range(3):
        params, opt_state, m = step(params, opt_state, vae_params, jb,
                                    jax.random.key(10 + i))
    assert np.isfinite(float(m["loss"]))

    out = tmp_path_factory.mktemp("ckpt")
    save_checkpoint(str(out), "final", {
        "params": jax.tree.map(np.asarray, params), "epoch": 2})
    return str(out / "checkpoint-final"), jax.tree.map(np.asarray, params)


def test_export_import_roundtrip_exact(trained_ckpt, tmp_path):
    """.pth from cli/export_torch re-imports to the identical param tree."""
    from mem_tpu.cli.export_torch import main as export_main
    from mem_tpu.utils.torch_import import (import_vit_state_dict,
                                            load_torch_checkpoint)

    ckpt, params = trained_ckpt
    pth = str(tmp_path / "mem_pretrain.pth")
    export_main(["--checkpoint", ckpt, "--output", pth])

    ck = load_torch_checkpoint(pth)
    assert "model" in ck and ck["epoch"] == 2
    back = import_vit_state_dict(ck["model"], is_pretrain=True)

    want = {jax.tree_util.keystr(p): v for p, v in
            jax.tree_util.tree_flatten_with_path(params)[0]}
    got = {jax.tree_util.keystr(p): v for p, v in
           jax.tree_util.tree_flatten_with_path(back)[0]}
    assert want.keys() == got.keys()
    for k in want:
        np.testing.assert_array_equal(np.asarray(want[k]),
                                      np.asarray(got[k]), err_msg=k)


def test_pth_loads_into_torch_twin(trained_ckpt, tmp_path):
    """The exported .pth is reference-schema loadable: the torch twin (built
    from the reference architecture spec) consumes it via load_state_dict
    and produces the same logits as the JAX model."""
    from torch_twin import TwinPtViT, to_torch_sd

    from mem_tpu.cli.export_torch import main as export_main
    from mem_tpu.models import create_model

    ckpt, params = trained_ckpt
    pth = str(tmp_path / "m.pth")
    export_main(["--checkpoint", ckpt, "--output", pth])
    sd = torch.load(pth, weights_only=False)["model"]

    twin = TwinPtViT(img_size=IMG, patch=PATCH, vocab=VOCAB, dim=DIM,
                     depth=DEPTH, heads=HEADS)
    missing, unexpected = twin.load_state_dict(sd, strict=False)
    assert not [k for k in missing
                if not k.endswith("relative_position_index")]
    assert not unexpected

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    mask = np.tile(np.arange(GRID * GRID) < GRID * GRID // 2, (2, 1))

    model = create_model(
        "pt_vit", vocab_size=VOCAB, img_size=(IMG, IMG),
        patch_size=(PATCH, PATCH), embed_dim=DIM, depth=DEPTH,
        num_heads=HEADS, init_values=0.1, use_shared_rel_pos_bias=True,
    )
    got = np.asarray(model.apply(jax.tree.map(jnp.asarray, params),
                                 jnp.asarray(x), jnp.asarray(mask)))
    twin.eval()
    with torch.no_grad():
        want = twin(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()),
                    torch.from_numpy(mask)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_finetune_cli_accepts_pth(trained_ckpt, tmp_path):
    """--finetune some.pth goes through the torch importer + the SAME
    surgery as the orbax path: resulting trees must be identical."""
    from mem_tpu.cli.export_torch import main as export_main
    from mem_tpu.models import create_model
    from mem_tpu.utils.surgery import surgery_for_finetune
    from mem_tpu.utils.torch_import import (import_vit_state_dict,
                                            load_torch_checkpoint)

    ckpt, params = trained_ckpt
    pth = str(tmp_path / "m.pth")
    export_main(["--checkpoint", ckpt, "--output", pth])

    ft = create_model(
        "ft_vit", num_classes=NCLS, img_size=(IMG, IMG),
        patch_size=(PATCH, PATCH), embed_dim=DIM, depth=DEPTH,
        num_heads=HEADS, init_values=0.1, use_rel_pos_bias=True,
    )
    ft_init = jax.jit(ft.init)(jax.random.key(3),
                               jnp.zeros((1, IMG, IMG, 3)))

    direct = surgery_for_finetune(
        {"params": params["params"]}, ft_init, dst_window=(GRID, GRID))
    ck = load_torch_checkpoint(pth)
    via_pth = surgery_for_finetune(
        import_vit_state_dict(ck["model"], is_pretrain=True), ft_init,
        dst_window=(GRID, GRID))

    a = {jax.tree_util.keystr(p): v for p, v in
         jax.tree_util.tree_flatten_with_path(direct)[0]}
    b = {jax.tree_util.keystr(p): v for p, v in
         jax.tree_util.tree_flatten_with_path(via_pth)[0]}
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


def test_export_torch_mae_autodetect(tmp_path):
    """cli/export_torch --model_type auto sniffs MAE and MAE-classifier
    trees; the classifier .pth re-imports through import_mae_state_dict +
    surgery_for_mae_finetune to the identical encoder (the --MAE 1
    cross-ecosystem handshake both ways)."""
    from mem_tpu.cli.export_torch import main as export_main
    from mem_tpu.models.mae import MaskedAutoencoderViT
    from mem_tpu.models.mae_classifier import MAEVisionTransformer
    from mem_tpu.utils.checkpoint import save_checkpoint
    from mem_tpu.utils.surgery import surgery_for_mae_finetune
    from mem_tpu.utils.torch_import import (import_mae_state_dict,
                                            load_torch_checkpoint)

    clf = MAEVisionTransformer(img_size=(IMG, IMG), patch_size=PATCH,
                               num_classes=NCLS, embed_dim=DIM, depth=DEPTH,
                               num_heads=HEADS)
    cp = jax.jit(clf.init)(jax.random.key(7), jnp.zeros((1, IMG, IMG, 3)))
    ck = save_checkpoint(str(tmp_path / "c1"), "final",
                         {"params": cp, "epoch": 0})
    pth = str(tmp_path / "mae_ft.pth")
    export_main(["--checkpoint", ck, "--output", pth])

    back = import_mae_state_dict(load_torch_checkpoint(pth)["model"])
    # load the re-imported .pth into a fresh classifier: every encoder +
    # readout leaf must round-trip exactly (head/fc_norm are present in the
    # state_dict, so nothing stays at the fresh init except nothing)
    fresh = jax.jit(clf.init)(jax.random.key(8), jnp.zeros((1, IMG, IMG, 3)))
    merged = surgery_for_mae_finetune(back, fresh, strict=False)
    want = {jax.tree_util.keystr(p): v for p, v in
            jax.tree_util.tree_flatten_with_path(cp)[0]}
    got = {jax.tree_util.keystr(p): v for p, v in
           jax.tree_util.tree_flatten_with_path(merged)[0]}
    assert want.keys() == got.keys()
    for k in want:
        np.testing.assert_array_equal(np.asarray(want[k]),
                                      np.asarray(got[k]), err_msg=k)

    # MAE pretraining tree: auto-detected as "mae"
    mae = MaskedAutoencoderViT(img_size=IMG, patch_size=PATCH, embed_dim=DIM,
                               depth=DEPTH, num_heads=HEADS,
                               decoder_embed_dim=32, decoder_depth=1,
                               decoder_num_heads=2)
    mp = mae.init({"params": jax.random.key(0), "mask": jax.random.key(1)},
                  jnp.zeros((1, IMG, IMG, 3)))
    ck2 = save_checkpoint(str(tmp_path / "c2"), "final",
                          {"params": mp, "epoch": 0})
    pth2 = str(tmp_path / "mae.pth")
    export_main(["--checkpoint", ck2, "--output", pth2])
    sd2 = load_torch_checkpoint(pth2)["model"]
    assert "mask_token" in sd2 and "decoder_blocks.0.qkv.weight" in sd2
