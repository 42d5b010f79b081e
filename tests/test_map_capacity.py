"""Capacity sweep: MAX_PLACED must never bind where generation should
succeed (VERDICT r2 weakness 7 — the old empirical occupancy-grid margins
are gone entirely; the slot budget is the single remaining cap).

Sweeps (n_pieces, difficulty) over the whole meaningful grid x a seed
batch and asserts the engine either reproduces a successful generation or
raises the reference's GenerateMapFailure — never MapCapacityError. The
eligible-piece counts per difficulty are EASY=3, MEDIUM=12, HARD=16
(core/tables.py piece library), so n_pieces beyond the count must fail
exactly like the reference throw (src/map.cpp:697-742).
"""
import numpy as np
import pytest

from eldorado_tpu import vec
from eldorado_tpu.core import mapgen as MG
from eldorado_tpu.core import tables as T

_COUNTS = [int((T.PIECE_DIFFICULTY[T.TRAVEL_PIECE_0:
                T.TRAVEL_PIECE_0 + T.N_TRAVEL_PIECES] <= d).sum())
           for d in range(3)]


def test_eligible_piece_counts():
    assert _COUNTS == [3, 12, 16]


@pytest.mark.parametrize("difficulty", [0, 1, 2])
def test_overflow_never_fires_on_valid_grid(difficulty):
    """Every n_pieces the reference could be asked for, x 16 seeds: the
    only acceptable outcomes are success or GenerateMapFailure."""
    count = _COUNTS[difficulty]
    steps = {0: [1, 2, 3], 1: [1, 4, 8, 12], 2: [1, 8, 12, 16]}[difficulty]
    for n_pieces in steps:
        states = vec.vec_reset(1000 + 97 * n_pieces, 16, 4, n_pieces,
                               difficulty, 100, check_maps=False)
        over = np.asarray(states.map_overflow)
        assert not over.any(), (
            f"MAX_PLACED={MG.MAX_PLACED} bound on a valid config: "
            f"difficulty={difficulty} n_pieces={n_pieces}")
        if n_pieces <= count:
            # most seeds should generate fine (placement failures are
            # rare at these sizes); at least one success proves the
            # config is actually valid
            assert np.asarray(states.map_ok).any(), (difficulty, n_pieces)


@pytest.mark.parametrize("difficulty,n_pieces", [(0, 4), (1, 13), (2, 17)])
def test_too_many_pieces_raises_generate_map_failure(difficulty, n_pieces):
    """n_pieces beyond the eligible count exhausts valid_indices and must
    raise the reference's generate_map_failure analogue, not a capacity
    error."""
    from eldorado_tpu.errors import GenerateMapFailure
    with pytest.raises(GenerateMapFailure):
        vec.vec_reset(5, 4, 4, n_pieces, difficulty, 100)


@pytest.mark.slow
@pytest.mark.parametrize("difficulty", [1, 2])
def test_capacity_margin_sweep_slow(difficulty):
    """Wider seed sweep over the largest configs, recording the worst
    observed slot usage: it must stay under MAX_PLACED with margin even
    through retry stacking."""
    import jax
    import jax.numpy as jnp
    from eldorado_tpu.core import engine as E
    from eldorado_tpu.ops import rng as R

    count = _COUNTS[difficulty]
    worst = 0
    gen = jax.jit(jax.vmap(
        lambda r: MG.generate_map(r, count, difficulty)))
    for seed0 in (1, 10_000, 1 << 20):
        rngs = jax.vmap(R.seed)(
            jnp.arange(64, dtype=jnp.uint32) + seed0)
        out = gen(rngs)
        assert not np.asarray(out.overflow).any()
        ok = np.asarray(out.ok)
        n_entries = np.asarray(out.n_entries)[ok]
        if len(n_entries):
            worst = max(worst, int(n_entries.max()))
    assert worst <= MG.MAX_PLACED - 4, (
        f"worst successful generation used {worst} of "
        f"{MG.MAX_PLACED} slots — margin too thin")
