"""Procgen failure surfacing through the vectorised JAX path.

Reference: requesting more EASY pieces than exist throws
generate_map_failure (src/map.cpp:736-740, src/tests/test_environment.cpp:
68-80).  The JAX engine records the outcome in state flags and the host
entry points raise — `GenerateMapFailure` for the reference's retry
exhaustion, `MapCapacityError` when this engine's fixed procgen buffers
(core/mapgen.py MAX_PLACED/OCC) were the binding constraint.
"""
import numpy as np
import pytest

import eldorado_tpu as et
from eldorado_tpu import vec


def test_vec_reset_raises_generate_map_failure():
    # only 3 EASY travel pieces exist; n_pieces=4 EASY cannot generate
    with pytest.raises(et.GenerateMapFailure):
        vec.vec_reset(1, 4, 2, 4, 0, 100)


def test_vec_reset_raises_capacity_error():
    # 16 HARD pieces exist, but start+16+end exceeds MAX_PLACED=16
    with pytest.raises(et.MapCapacityError):
        vec.vec_reset(1, 4, 4, 16, 2, 100)


def test_vec_reset_check_can_be_disabled():
    states = vec.vec_reset(1, 4, 2, 4, 0, 100, check_maps=False)
    assert not np.asarray(states.map_ok).all()
    with pytest.raises(et.GenerateMapFailure):
        vec.check_map_generation(states)


def test_happy_path_flags_clean():
    states = vec.vec_reset(5, 4, 2, 2, 0, 100)
    assert np.asarray(states.map_ok).all()
    assert not np.asarray(states.map_overflow).any()
