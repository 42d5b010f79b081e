"""Failure types surfaced by map generation.

The reference throws ``generate_map_failure`` when procgen exhausts its
retry budget (src/map.cpp:697-742, include/map.h:13-15; tested in
src/tests/test_environment.cpp:68-80).  The JAX engine cannot throw from
inside a jitted program, so ``reset_env`` records the outcome in two state
flags — ``map_ok`` (False when the reference would have thrown) and
``map_overflow`` (True when one of this engine's fixed procgen capacities,
``core/mapgen.py`` MAX_PLACED, was hit) — and the host-side entry
points (`vec.vec_reset`, `vec.reset_done*`, `compat.cog_env.reset`) check
them and raise."""


class GenerateMapFailure(RuntimeError):
    """Map generation failed MAX_FAILURES times (reference parity:
    generate_map_failure, src/map.cpp:736-740)."""


class MapCapacityError(RuntimeError):
    """Map generation overflowed a fixed buffer capacity (MAX_PLACED or the
    OCC occupancy grid) — an engine limit, not a game-rule failure.  The
    requested (n_pieces, difficulty) needs larger compile-time capacities in
    core/mapgen.py."""
