"""Zero-op architecture utilities (slow: full-space enumeration)."""

import pytest

from nbasr_tpu.search_space import get_archs_with_zero, get_model_hash
from nbasr_tpu.utils import flatten


@pytest.mark.slow
def test_archs_with_zero_count_and_uniqueness():
    """8,242 total unique hashes - 8,000 zero-free = 242 classes that
    require a zero op somewhere."""
    archs = get_archs_with_zero()
    assert len(archs) == 242
    hashes = {get_model_hash(a) for a in archs}
    assert len(hashes) == len(archs)
    assert all(5 in flatten(a) for a in archs)
