"""Bit-exact parity of the jitted JAX engine against the oracle goldens.

Map generation is compared directly over every golden seed set. Trajectories
replay the probe loop as one `lax.scan` (sample -> step -> auto-reset),
collecting every compared field per step; a single jit+scan covers thousands
of steps, exercising the in-jit reset path whenever an episode ends.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eldorado_tpu.core import engine as E
from eldorado_tpu.core.mapgen import generate_map
from eldorado_tpu.ops.rng import seed as rseed

GOLDEN = "tests/golden"

MAPGEN_CASES = [
    ("mapgen_easy", 3, 0), ("mapgen_medium", 3, 1), ("mapgen_hard", 3, 2),
    ("mapgen_1p", 1, 0), ("mapgen_2p", 3, 0), ("mapgen_8p_medium", 8, 1),
    ("mapgen_10p_hard", 10, 2), ("mapgen_throw_easy4", 4, 0),
]


@pytest.mark.parametrize("name,n_pieces,diff", MAPGEN_CASES)
def test_jax_mapgen_matches_oracle(name, n_pieces, diff):
    d = np.load(f"{GOLDEN}/{name}.npz")
    gen = jax.jit(jax.vmap(lambda s: generate_map(s, n_pieces, diff)))
    out = gen(jax.vmap(rseed)(d["seeds"].astype(np.uint32)))
    ok = np.asarray(out.ok)
    assert np.array_equal(ok.astype(np.uint8), d["ok"]), "ok flags"
    good = d["ok"] > 0
    obs = np.asarray(jax.vmap(E.expand_obs)(out.ids))
    assert np.array_equal(obs[good], d["obs"][good])


def _select(pred, a, b):
    def pick(x, y):
        p = pred if x.ndim == 0 else jnp.reshape(pred, (1,) * x.ndim)
        return jnp.where(p, x, y)
    return jax.tree_util.tree_map(pick, a, b)


def parity_rollout(seed, samp_seed, n_players, n_pieces, diff, max_steps, T,
                   mask_src, with_map):
    """Single-env probe loop as one scan; returns per-step field dict."""

    def body(carry, _):
        s, rng = carry
        src = E.unpack_mask(s.storage_masks[s.agent] if mask_src
                            else s.sel_mask)
        act, rng, tainted = E.sample_action(rng, src)
        s = E.step_env(s, act)
        s = s._replace(rng_tainted=s.rng_tainted | tainted)
        done = s.done
        s = jax.lax.cond(done, E.reset_env, lambda x: x, s)
        rec = {
            "actions": act.astype(jnp.uint8), "done": done,
            "agent": s.agent, "phase": s.phase, "rewards": s.rewards,
            "resources": s.resources, "shop": s.shop_stock, "piles": s.piles,
            "sel_mask": E.unpack_mask(s.sel_mask),
            "storage_masks": E.unpack_mask(s.storage_masks),
            "info_total": s.info_total, "info_steps": s.info_steps,
            "info_returns": s.info_returns,
            "info_travelled": s.info_travelled,
            "info_added": s.info_added, "info_removed": s.info_removed,
            "info_card_uses": s.info_card_uses,
            "rng_tainted": s.rng_tainted,
        }
        if with_map:
            rec["map"] = E.expand_obs(s.map_ids)
        return (s, rng), rec

    s0 = E.reset_env(E.make_state(seed, n_players, n_pieces, diff, max_steps))
    (s, rng), traj = jax.lax.scan(body, (s0, rseed(samp_seed)), None, length=T)
    return s0, traj


TRAJ_CASES = [
    # (file, mask_src, max_steps, limit, with_map)
    ("traj_2p_easy", 0, 100000, 1500, False),
    ("traj_trunc", 0, 100, None, True),          # 3 auto-resets in-jit
    ("traj_win_4p", 0, 100000, 1500, False),
    ("traj_2p_easy_storage", 1, 100000, 1500, False),
    ("traj_trunc_storage", 1, 100, None, True),  # 4 auto-resets in-jit
    ("traj_win_storage", 1, 100000, 2500, True), # includes a won episode
]


@pytest.mark.parametrize("name,mask_src,max_steps,limit,with_map", TRAJ_CASES)
def test_jax_trajectory_matches_oracle(name, mask_src, max_steps, limit,
                                       with_map):
    d = np.load(f"{GOLDEN}/{name}.npz")
    es, ss, n_players, n_pieces, diff, T = (int(v) for v in d["header"])
    if limit is not None:
        T = min(T, limit)
    s0, traj = jax.jit(
        lambda: parity_rollout(es, ss, n_players, n_pieces, diff, max_steps,
                               T, mask_src, with_map))()
    assert np.array_equal(np.asarray(E.expand_obs(s0.map_ids)), d["map0"])
    assert np.array_equal(np.asarray(E.unpack_mask(s0.sel_mask)).astype(np.uint8), d["sel0"])
    assert np.array_equal(
        np.asarray(E.unpack_mask(s0.storage_masks)).astype(np.uint8),
        d["storage0"])
    assert np.array_equal(np.asarray(s0.piles), d["piles0"])

    for key in ("actions", "done", "agent", "phase", "rewards", "resources",
                "shop", "piles", "sel_mask", "storage_masks", "info_total",
                "info_steps", "info_returns", "info_travelled", "info_added",
                "info_removed", "info_card_uses"):
        got = np.asarray(traj[key])[:T]
        want = d[key][:T]
        if got.dtype == bool:
            got = got.astype(np.uint8)
        if not np.array_equal(got, want.astype(got.dtype)):
            w = np.nonzero(~np.all(
                got.reshape(T, -1) == want.reshape(T, -1).astype(got.dtype),
                axis=1))[0]
            raise AssertionError(f"{name}: field {key} first diverges at "
                                 f"step {w[0]}")
    assert not np.asarray(traj["rng_tainted"]).any(), \
        "fast RNG path deviated from the exact stream"
    if with_map:
        # post-auto-reset maps regenerate in-jit; compare at done steps
        for k, t in enumerate(d["reset_steps"]):
            if t < T:
                assert np.array_equal(np.asarray(traj["map"])[t],
                                      d["reset_maps"][k]), \
                    f"{name}: reset map at step {t}"
