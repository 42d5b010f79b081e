"""Procgen failure surfacing through the vectorised JAX path.

Reference: requesting more EASY pieces than exist throws
generate_map_failure (src/map.cpp:736-740, src/tests/test_environment.cpp:
68-80).  The JAX engine records the outcome in state flags and the host
entry points raise — `GenerateMapFailure` for the reference's retry
exhaustion, `MapCapacityError` when this engine's fixed procgen slot
budget (core/mapgen.py MAX_PLACED) was the binding constraint.
"""
import numpy as np
import pytest

import eldorado_tpu as et
from eldorado_tpu import vec


def test_vec_reset_raises_generate_map_failure():
    # only 3 EASY travel pieces exist; n_pieces=4 EASY cannot generate
    with pytest.raises(et.GenerateMapFailure):
        vec.vec_reset(1, 4, 2, 4, 0, 100)


def test_full_library_map_generates():
    # start + all 16 travel pieces + end fits the MAX_PLACED=48 slot
    # budget with retry-stacking headroom (round 2 capped this at 16 and
    # raised MapCapacityError here; tests/test_map_capacity.py sweeps
    # the full grid)
    states = vec.vec_reset(1, 4, 4, 16, 2, 100)
    assert np.asarray(states.map_ok).all()


def test_capacity_error_surfacing():
    # the MapCapacityError path stays wired even though no reachable
    # config binds MAX_PLACED=48: the host check raises on the flag
    states = vec.vec_reset(5, 4, 2, 2, 0, 100)
    import jax.numpy as jnp
    bad = states._replace(
        map_overflow=jnp.ones_like(states.map_overflow))
    with pytest.raises(et.MapCapacityError):
        vec.check_map_generation(bad)


def test_vec_reset_check_can_be_disabled():
    states = vec.vec_reset(1, 4, 2, 4, 0, 100, check_maps=False)
    assert not np.asarray(states.map_ok).all()
    with pytest.raises(et.GenerateMapFailure):
        vec.check_map_generation(states)


def test_happy_path_flags_clean():
    states = vec.vec_reset(5, 4, 2, 2, 0, 100)
    assert np.asarray(states.map_ok).all()
    assert not np.asarray(states.map_overflow).any()
