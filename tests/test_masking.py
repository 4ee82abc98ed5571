"""Mask-generator statistics tests (SURVEY §4 test plan)."""
import numpy as np

from mem_tpu.ops.masking import (
    BlockMaskingGenerator,
    RandomMaskingGenerator,
    make_mask_generator,
)


def test_block_masking_count_and_shape(rng):
    gen = BlockMaskingGenerator((14, 14), num_masking_patches=98)
    for _ in range(20):
        mask = gen(rng)
        assert mask.shape == (14, 14)
        assert set(np.unique(mask)) <= {0, 1}
        # the BEiT loop targets >= 98 but can overshoot within the final
        # block or stall early; typical range is tight around 98
        assert 75 <= mask.sum() <= 98 + 16


def test_block_masking_blocks_are_contiguous(rng):
    """Each round adds a rectangle, so masked patches should form few
    connected components relative to random masking."""
    gen = BlockMaskingGenerator((14, 14), num_masking_patches=98)
    mask = gen(rng)

    def n_components(m):
        m = m.copy()
        comps = 0
        for i in range(m.shape[0]):
            for j in range(m.shape[1]):
                if m[i, j]:
                    comps += 1
                    stack = [(i, j)]
                    m[i, j] = 0
                    while stack:
                        a, b = stack.pop()
                        for da, db in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                            na, nb = a + da, b + db
                            if 0 <= na < m.shape[0] and 0 <= nb < m.shape[1] and m[na, nb]:
                                m[na, nb] = 0
                                stack.append((na, nb))
        return comps

    assert n_components(mask) <= 12


def test_random_masking_exact_count_and_quirk(rng):
    gen = RandomMaskingGenerator((14, 14), num_masking_patches=98)
    seen_last = False
    for _ in range(50):
        mask = gen(rng)
        assert mask.sum() == 98
        seen_last |= bool(mask.reshape(-1)[-1])
    # reference quirk: last patch index is never masked
    assert not seen_last


def test_factory():
    assert isinstance(make_mask_generator("block", 14, 98), BlockMaskingGenerator)
    assert isinstance(make_mask_generator("random", 14, 98), RandomMaskingGenerator)


def test_mask_pool_sampling(tmp_path, rng):
    import numpy as np

    from mem_tpu.data.folder import NpyFolder
    from mem_tpu.data.pipeline import EventBatchIterator, PipelineConfig

    d = tmp_path / "caltech" / "train" / "a"
    d.mkdir(parents=True)
    for i in range(4):
        ev = np.zeros((100, 4))
        ev[:, 0] = rng.integers(0, 32, 100)
        ev[:, 1] = rng.integers(0, 32, 100)
        ev[:, 3] = 1.0
        np.save(d / f"s{i}.npy", ev)

    ds = NpyFolder(str(tmp_path / "caltech" / "train"))
    it = EventBatchIterator(ds, PipelineConfig(
        batch_size=4, slice_max_evs=200, masking="block",
        window_size=(4, 4), num_mask_patches=8,
        min_mask_patches_per_block=2, mask_pool_size=16, num_workers=0,
    ))
    assert it._mask_pool.shape == (16, 16)
    batch = next(iter(it.epoch(0)))
    assert batch["mask"].shape == (4, 16)
    # every sampled mask comes from the pool
    pool = {m.tobytes() for m in it._mask_pool}
    for m in batch["mask"]:
        assert m.tobytes() in pool
