"""`city_of_gold.vec` mirror: vectorised env / sampler / runner factories.

Reference surface: src/pybind/vectorized.cpp:8-21 exposes
get_vec_env(N) / get_vec_sampler(N) / get_runner(N) with N drawn from a
compile-time instantiation list capped at 256. Here N is any positive int;
the returned objects wrap the device-resident lockstep batch
(eldorado_tpu.vec) and materialise numpy structured views on access.
"""
from __future__ import annotations

import numpy as np

from ..constants import Difficulty, MAX_N_PLAYERS
from ..core import engine as E


def _flat_masks_to_struct(flat):
    from . import action_mask_dtype
    n = flat.shape[0]
    out = np.zeros(n, action_mask_dtype)
    out["play"] = flat[:, 0:22]
    out["play_special"] = flat[:, 22:44]
    out["remove"] = flat[:, 44:66]
    out["move"] = flat[:, 66:73]
    out["get_from_shop"] = flat[:, 73:92]
    return out


class VecEnvCompat:
    """vec_cog_env<N> equivalent (include/vec_environment.h:10-81) with
    per-step auto-reset semantics."""

    def __init__(self, n_envs: int):
        from ..vec import VecEnv
        self.n_envs = n_envs
        self._v = VecEnv(n_envs, mask_src="sel")
        self._last_done = np.zeros(n_envs, bool)

    def reset(self, seed=0, n_players=MAX_N_PLAYERS, n_pieces=3,
              difficulty=Difficulty.EASY, max_steps=100000, render=False):
        self._v.reset(seed=int(seed), n_players=int(n_players),
                      n_pieces=int(n_pieces), difficulty=int(difficulty),
                      max_steps=int(max_steps))

    def step(self, actions):
        from . import action_dtype
        a = np.asarray(actions)
        if a.dtype == action_dtype:
            a = np.stack([a[k].astype(np.int32) for k in
                          ("play", "play_special", "remove", "move",
                           "get_from_shop")], axis=-1)
        self._last_done = np.asarray(self._v.step(a.astype(np.int32)))
        return self._last_done

    def get_num_envs(self):
        return self.n_envs

    def get_num_players(self):
        return int(np.asarray(self._v.states.n_players)[0])

    def get_agent_selections(self):
        return np.asarray(self._v.states.agent).astype(np.uint8)

    def get_dones(self):
        return self._last_done

    def get_rewards(self):
        return np.asarray(self._v.states.rewards)

    def get_selected_action_masks(self):
        from ..core import engine as _E
        return _flat_masks_to_struct(
            np.asarray(_E.unpack_mask(self._v.states.sel_mask)))

    def get_observations(self):
        from . import obs_dtype
        s = self._v.states
        n = self.n_envs
        from .. import native
        from ..core import cells as _cells
        map_u8 = _cells.expand_obs_np(np.asarray(s.map_ids))
        if native.available():
            # one-pass native packing into the reference ObsData layout
            packed = native.pack_obs(
                map_u8, np.asarray(s.phase),
                np.asarray(s.resources), np.asarray(s.shop_stock),
                np.asarray(s.piles),
                np.asarray(E.unpack_mask(s.storage_masks)).astype(np.uint8))
            return packed.reshape(-1).view(obs_dtype)
        out = np.zeros(n, obs_dtype)
        out["shared"]["map"] = map_u8
        out["shared"]["phase"] = np.asarray(s.phase).astype(np.uint8)
        out["shared"]["current_resources"] = np.asarray(s.resources)
        out["shared"]["shop"] = np.asarray(s.shop_stock)
        piles = np.asarray(s.piles)
        storage = np.asarray(E.unpack_mask(s.storage_masks))
        for p in range(MAX_N_PLAYERS):
            pd = out["player_data"][:, p]
            for i, name in enumerate(("draw", "hand", "active", "played",
                                      "discard")):
                pd["obs"][name] = piles[:, p, i]
            pd["action_mask"]["play"] = storage[:, p, 0:22]
            pd["action_mask"]["play_special"] = storage[:, p, 22:44]
            pd["action_mask"]["remove"] = storage[:, p, 44:66]
            pd["action_mask"]["move"] = storage[:, p, 66:73]
            pd["action_mask"]["get_from_shop"] = storage[:, p, 73:92]
        return out

    def get_infos(self):
        from . import info_dtype
        s = self._v.states
        out = np.zeros(self.n_envs, info_dtype)
        out["total_length"] = np.asarray(s.info_total).astype(np.uint32)
        ai = out["agent_infos"]
        ai["steps_taken"] = np.asarray(s.info_steps)
        ai["returns"] = np.asarray(s.info_returns)
        ai["travelled_hexes"] = np.asarray(s.info_travelled).astype(np.uint32)
        ai["cards_added"] = np.asarray(s.info_added)
        ai["cards_removed"] = np.asarray(s.info_removed)
        ai["n_card_uses"] = np.asarray(s.info_card_uses).astype(np.uint32)
        return out

    def get_info(self, i):
        return self.get_infos()[i]

    # device-native accessors (the fast path a learner should use)
    @property
    def states(self):
        return self._v.states


class VecSamplerCompat:
    """vec_action_sampler<N> equivalent (include/vec_sampler.h:7-28)."""

    def __init__(self, n_envs: int):
        from ..vec import sampler_init
        self.n_envs = n_envs
        self._init = sampler_init
        self._rngs = sampler_init(42, n_envs)
        self._actions = np.zeros((n_envs, 5), np.uint8)

    def seed(self, seed):
        self._rngs = self._init(int(seed), self.n_envs)

    def sample(self, masks):
        from . import action_mask_dtype, action_dtype
        from ..vec import vec_sample
        import jax.numpy as jnp
        m = np.asarray(masks)
        if m.dtype == action_mask_dtype:
            m = np.concatenate([
                m["play"], m["play_special"], m["remove"], m["move"],
                m["get_from_shop"]], axis=-1)
        actions, self._rngs, _ = vec_sample(self._rngs, jnp.asarray(m, bool))
        self._actions = np.asarray(actions).astype(np.uint8)
        out = np.zeros(self.n_envs, action_dtype)
        for i, name in enumerate(("play", "play_special", "remove", "move",
                                  "get_from_shop")):
            out[name] = self._actions[:, i]
        return out

    def get_actions(self):
        return self._actions


class RunnerCompat:
    """ThreadedRunner<N> equivalent (include/runner.h:93-100): step/sample
    dispatch asynchronously (XLA async execution replaces the SPSC queues);
    sync() blocks on completion."""

    def __init__(self, n_envs: int, n_threads: int = 0):
        # n_threads accepted for signature parity; partitioning is XLA's.
        from ..vec import VecEnv
        self.n_envs = n_envs
        self._v = VecEnv(n_envs, mask_src="sel")
        self._actions = None

    def reset(self, seed=0, n_players=MAX_N_PLAYERS, n_pieces=3,
              difficulty=Difficulty.EASY, max_steps=100000, render=False):
        self._v.reset(seed=int(seed), n_players=int(n_players),
                      n_pieces=int(n_pieces), difficulty=int(difficulty),
                      max_steps=int(max_steps))

    def sample(self):
        self._actions = self._v.sample()

    def step(self):
        if self._actions is None:
            self.sample()
        self._v.step(self._actions)

    def step_sync(self):
        self.step()
        self.sync()

    def sync(self):
        import jax
        jax.block_until_ready(self._v.states.rng)

    @property
    def env(self):
        return self._v


def get_vec_env(n: int) -> VecEnvCompat:
    return VecEnvCompat(n)


def get_vec_sampler(n: int) -> VecSamplerCompat:
    return VecSamplerCompat(n)


def get_runner(n: int, n_threads: int = 0) -> RunnerCompat:
    return RunnerCompat(n, n_threads)
