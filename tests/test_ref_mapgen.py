"""Bit-exact map-generation parity: numpy reference engine vs oracle goldens.

Golden corpus produced by tools/parity_probe/env_probe.cpp (mapgen mode) from
the UB-patched reference oracle. Each golden stores, per seed: the placed
piece list (library ids + transformed float coordinates) and the rasterised
48x48x7 observation.
"""
import numpy as np
import pytest

from eldorado_tpu.core.ref_engine import GenerateMapFailure, RefEnv

GOLDEN = "tests/golden"

# (file, n_players, n_pieces, difficulty)
CASES = [
    ("mapgen_easy", 4, 3, 0),
    ("mapgen_medium", 4, 3, 1),
    ("mapgen_hard", 4, 3, 2),
    ("mapgen_1p", 4, 1, 0),
    ("mapgen_2p", 2, 3, 0),
    ("mapgen_8p_medium", 4, 8, 1),
    ("mapgen_10p_hard", 4, 10, 2),
    ("mapgen_throw_easy4", 4, 4, 0),
]


@pytest.mark.parametrize("name,n_players,n_pieces,diff", CASES)
def test_mapgen_matches_oracle(name, n_players, n_pieces, diff):
    d = np.load(f"{GOLDEN}/{name}.npz")
    for i, seed in enumerate(d["seeds"]):
        env = RefEnv(seed=int(seed), n_players=n_players, n_pieces=n_pieces,
                     difficulty=diff)
        try:
            env.reset()
            ok = 1
        except GenerateMapFailure:
            ok = 0
        assert ok == d["ok"][i], f"seed {seed}: ok flag"
        if not ok:
            continue
        m = env.map
        assert len(m.entries) == d["n_placed"][i], f"seed {seed}: piece count"
        for k in range(len(m.entries)):
            assert m.entries[k] == d["piece_ids"][i, k], f"seed {seed} piece {k}"
            got = m.entry_xy(k).astype(np.float32) / 2.0
            want = d["piece_xy"][i, k, : int(d["piece_nhex"][i, k])]
            assert np.array_equal(got, want), f"seed {seed} piece {k} coords"
        assert np.array_equal(m.obs, d["obs"][i]), f"seed {seed}: observation"
