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
