"""Bit-exact trajectory parity: numpy reference engine vs oracle goldens.

Replays the exact probe loop (tools/parity_probe/env_probe.cpp traj mode):
masked-random self-play with the built-in sampler and vec-style auto-reset
(reference: include/vec_environment.h:53-61), comparing every dumped field
each step — actions, done/agent/phase, rewards, resources, shop stock, all
20 card piles, both action-mask surfaces, and the Info block.

``mask_src=0`` samples from the selected-action-mask buffer (the pytest/vec
API surface); ``mask_src=1`` samples from the current agent's per-player
observation mask (the C++ doctest surface) which exercises movement, specials,
the shop, removes, wins, and the uint8-wraparound quirk zoo.
"""
import numpy as np
import pytest

from eldorado_tpu.core.ref_engine import RefEnv, RefSampler

GOLDEN = "tests/golden"

# (file, mask_src, max_steps, step_limit or None=full, slow)
# The scalar numpy replays dominate suite wall time (~30-60 s each); the
# default run keeps one fast representative per surface (truncation,
# hard-difficulty, 4p-medium, storage-mask truncation) and `-m slow`
# replays the full corpus. The JAX engine replays ALL corpora every run
# (tests/test_jax_parity.py) — this file validates the numpy spec twin.
CASES = [
    ("traj_2p_easy", 0, 100000, None, True),
    ("traj_4p_easy", 0, 100000, None, True),
    ("traj_4p_medium", 0, 100000, None, False),
    ("traj_3p_hard", 0, 100000, None, False),
    ("traj_win_2p", 0, 100000, None, True),
    ("traj_win_4p", 0, 100000, None, True),
    ("traj_trunc", 0, 100, None, False),
    ("traj_2p_easy_storage", 1, 100000, None, True),
    ("traj_4p_easy_storage", 1, 100000, None, True),
    ("traj_trunc_storage", 1, 100, None, False),
    # full 20k-step run takes ~8 min in the scalar engine; the first 2500
    # steps already cover moves/specials/shop/removes. The full run is
    # exercised by `pytest -m slow`.
    ("traj_win_storage", 1, 100000, 2500, True),
]
CASES = [pytest.param(*c[:4], marks=[pytest.mark.slow] if c[4] else [],
                      id=f"{c[0]}-{c[1]}-{c[2]}-{c[3]}")
         for c in CASES]

FIELDS = [
    ("done", "done"), ("agent", "agent"), ("phase", "phase"),
    ("rewards", "rewards"), ("resources", "resources"), ("shop", "shop"),
    ("piles", "piles"), ("sel_mask", "sel_mask"),
    ("storage_masks", "storage_masks"),
    ("info_total", "info_total"), ("info_steps", "info_steps"),
    ("info_returns", "info_returns"), ("info_travelled", "info_travelled"),
    ("info_added", "info_added"), ("info_removed", "info_removed"),
    ("info_mpc", "info_mpc"), ("info_card_uses", "info_card_uses"),
]


def replay(name, mask_src, max_steps, limit):
    d = np.load(f"{GOLDEN}/{name}.npz")
    es, ss, n_players, n_pieces, diff, T = (int(v) for v in d["header"])
    if limit is not None:
        T = min(T, limit)
    env = RefEnv(seed=es, n_players=n_players, n_pieces=n_pieces,
                 difficulty=diff, max_steps=max_steps)
    sampler = RefSampler(ss)
    env.reset()
    assert np.array_equal(env.map.obs, d["map0"])
    assert env.agent == d["agent0"][0]
    assert np.array_equal(env.sel_mask.astype(np.uint8), d["sel0"])
    assert np.array_equal(env.storage_masks.astype(np.uint8), d["storage0"])
    assert np.array_equal(env.piles, d["piles0"])
    for t in range(T):
        src = env.storage_masks[env.agent] if mask_src else env.sel_mask
        act = sampler.sample(src)
        env.step(act)
        done = env.done
        if done:
            env.reset()
        assert np.array_equal(act, d["actions"][t]), f"step {t}: actions"
        state = {
            "done": np.uint8(done), "agent": np.uint8(env.agent),
            "phase": env.phase, "rewards": env.rewards,
            "resources": env.resources, "shop": env.shop_stock,
            "piles": env.piles,
            "sel_mask": env.sel_mask.astype(np.uint8),
            "storage_masks": env.storage_masks.astype(np.uint8),
            "info_total": np.uint32(env.info_total),
            "info_steps": env.info_steps, "info_returns": env.info_returns,
            "info_travelled": env.info_travelled, "info_added": env.info_added,
            "info_removed": env.info_removed, "info_mpc": env.info_mpc,
            "info_card_uses": env.info_card_uses,
        }
        for attr, key in FIELDS:
            assert np.array_equal(np.asarray(state[attr]), np.asarray(d[key][t])), \
                f"step {t}: {attr}"
        if done:
            k = np.nonzero(d["reset_steps"] == t)[0]
            if len(k):
                assert np.array_equal(env.map.obs, d["reset_maps"][k[0]]), \
                    f"step {t}: post-reset map"


@pytest.mark.parametrize("name,mask_src,max_steps,limit", CASES)
def test_trajectory_matches_oracle(name, mask_src, max_steps, limit):
    replay(name, mask_src, max_steps, limit)


@pytest.mark.slow
def test_trajectory_win_storage_full():
    replay("traj_win_storage", 1, 100000, None)
