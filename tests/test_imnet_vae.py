"""VAE-on-ImageNet path (reference eventvae/train_vae.py:137 ->
build_dataset --data_set IMNET -> build_transform_e2v): the discrete VAE
trains on real JPEGs through the same timm transform stack as the finetune
stage, end-to-end through the train_vae CLI."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def jpeg_dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("jpegs_vae")
    rng = np.random.default_rng(11)
    for split, n_per in (("train", 8), ("val", 4)):
        for ci, cls in enumerate(["a", "b"]):
            d = root / split / cls
            d.mkdir(parents=True)
            base = 60 if ci == 0 else 190
            for i in range(n_per):
                w, h = int(rng.integers(40, 80)), int(rng.integers(40, 80))
                arr = np.clip(base + rng.normal(0, 30, (h, w, 3)), 0, 255
                              ).astype(np.uint8)
                Image.fromarray(arr).save(d / f"s{i}.jpg", quality=90)
    return str(root)


def test_vae_imnet_cli_end_to_end(jpeg_dataset, tmp_path):
    """One epoch of --data_set IMNET through the real VAE CLI: loss finite,
    eval + codebook usage reported, checkpoint written with coherent
    hparams (input_H/W = input_size for the pretrain stage's create_d_vae
    role)."""
    from mem_tpu.cli.train_vae import main

    out = tmp_path / "vae_imnet"
    main([
        "--data_path", jpeg_dataset, "--data_set", "IMNET",
        "--output_dir", str(out), "--epochs", "1",
        "--batch_size", "8", "--input_size", "32",
        "--input_H", "32", "--input_W", "32",
        "--num_tokens", "16", "--emb_dim", "8", "--num_layers", "2",
        "--hidden_dim", "8", "--num_resnet_blocks", "1",
        "--max_random_shift_evs", "2",
        "--eval_freq", "1", "--num_workers", "0", "--seed", "0",
        "--dtype", "float32", "--aa", "rand-m5", "--reprob", "0.25",
        "--num_images_save", "0",
    ])
    assert (out / "checkpoint-final").exists()


def test_vae_rejects_cifar():
    """The reference's build_dataset else-branch raises for CIFAR
    (datasets.py:453); the VAE CLI mirrors it instead of crashing in the
    event loader with a misleading no-.npy-samples error."""
    from mem_tpu.cli.train_vae import main

    with pytest.raises(NotImplementedError):
        main(["--data_path", "/nonexistent", "--data_set", "CIFAR",
              "--output_dir", "/tmp/never", "--epochs", "1"])
