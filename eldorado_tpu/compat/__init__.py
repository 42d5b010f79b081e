"""`city_of_gold`-compatible API surface.

Mirrors the reference pybind11 module layout (reference:
src/pybind/common.cpp, src/pybind/single_env.cpp, src/pybind/vectorized.cpp)
so a user of the C++ wheel can switch imports and keep their script shape:

    from eldorado_tpu import compat as city_of_gold
    env = city_of_gold.cog_env(seed, n_players, n_pieces,
                               city_of_gold.Difficulty.EASY, max_steps, False)
    sampler = city_of_gold.action_sampler(42)
    venv = city_of_gold.vec.get_vec_env(1024)   # no 256-env cap here

Observations are numpy *structured arrays* with the reference's field
layout (include/api.h:67-161) — materialised copies of the device state
rather than zero-copy views (device memory replaces the shared-memory ABI;
training code should consume the batched device arrays in eldorado_tpu.vec
directly and keep everything on-chip).
"""
from __future__ import annotations

import numpy as np

from ..constants import Difficulty, MAX_N_PLAYERS, N_CARDTYPES
from ..core.ref_engine import MinstdRng, RefEnv, RefSampler, GenerateMapFailure

__all__ = [
    "Difficulty", "cog_env", "action_sampler", "max_envs",
    "deck_dtype", "action_mask_dtype", "player_dtype", "shared_dtype",
    "obs_dtype", "action_dtype", "agent_info_dtype", "info_dtype",
    "GenerateMapFailure", "vec",
]

# unlimited in practice; the reference caps at 256 (src/pybind/common.cpp:23)
max_envs = 1 << 20

# -- structured dtypes (include/api.h:67-161) ------------------------------
deck_dtype = np.dtype([
    ("draw", np.uint8, (N_CARDTYPES,)), ("hand", np.uint8, (N_CARDTYPES,)),
    ("active", np.uint8, (N_CARDTYPES,)), ("played", np.uint8, (N_CARDTYPES,)),
    ("discard", np.uint8, (N_CARDTYPES,)),
])
action_mask_dtype = np.dtype([
    ("play", np.bool_, (22,)), ("play_special", np.bool_, (22,)),
    ("remove", np.bool_, (22,)), ("move", np.bool_, (7,)),
    ("get_from_shop", np.bool_, (19,)),
])
player_dtype = np.dtype([
    ("obs", deck_dtype), ("action_mask", action_mask_dtype),
])
shared_dtype = np.dtype([
    ("map", np.uint8, (48, 48, 7)), ("phase", np.uint8),
    ("current_resources", np.float32, (3,)), ("shop", np.uint8, (18,)),
])
obs_dtype = np.dtype([
    ("shared", shared_dtype), ("player_data", player_dtype, (MAX_N_PLAYERS,)),
])
action_dtype = np.dtype([
    ("play", np.uint8), ("play_special", np.uint8), ("remove", np.uint8),
    ("move", np.uint8), ("get_from_shop", np.uint8),
])
agent_info_dtype = np.dtype([
    ("steps_taken", np.uint8), ("returns", np.float32),
    ("travelled_hexes", np.uint32), ("cards_added", np.uint8),
    ("cards_removed", np.uint8), ("n_machete_uses", np.uint32),
    ("n_paddle_uses", np.uint32), ("n_coin_uses", np.uint32),
    ("n_card_uses", np.uint32),
])
info_dtype = np.dtype([
    ("total_length", np.uint32),
    ("agent_infos", agent_info_dtype, (MAX_N_PLAYERS,)),
])


def _mask_to_struct(flat92):
    out = np.zeros((), action_mask_dtype)
    out["play"] = flat92[0:22]
    out["play_special"] = flat92[22:44]
    out["remove"] = flat92[44:66]
    out["move"] = flat92[66:73]
    out["get_from_shop"] = flat92[73:92]
    return out


def _action_to_vec(action):
    if isinstance(action, np.void) or (
            hasattr(action, "dtype") and action.dtype == action_dtype):
        return np.array([action["play"], action["play_special"],
                         action["remove"], action["move"],
                         action["get_from_shop"]], np.uint8)
    return np.asarray(action, np.uint8).reshape(5)


class _DeviceMapView:
    """Board view for the device backend (render/get_map surface:
    .obs / .player_xy / .min_xy, matching ref_engine.RefMap's fields)."""

    def __init__(self, snap):
        self.obs = snap["map_obs"]
        self.player_xy = snap["player_xy"]
        self.min_xy = snap["min_xy"]


class _DeviceEnv:
    """RefEnv-shaped adapter over the jitted single-env JAX engine — the
    device analogue of the reference's native-backed cog_env
    (reference: src/pybind/single_env.cpp:12-86 binds the C++ engine
    directly; here the engine is core.engine's jitted reset/step on the
    accelerator, bit-exact against RefEnv). One host snapshot is pulled
    per reset/step; attribute reads are free after that."""

    def __init__(self, seed=0, n_players=4, n_pieces=3, difficulty=0,
                 max_steps=100000):
        import jax

        from ..core import engine as E
        self._E = E
        self._jstep = jax.jit(E.step_env)
        self._jreset = jax.jit(E.reset_env)
        self._jreset_full = jax.jit(E.reset_env_full,
                                    static_argnums=(2, 3, 4, 5))
        self.seed_ = int(seed)
        self._state = E.make_state(int(seed), int(n_players), int(n_pieces),
                                   int(difficulty), int(max_steps))
        self._pull()

    def _pull(self):
        import jax
        E = self._E
        s = jax.device_get(self._state)
        from ..core import cells as _cells
        self._snap = {
            # cold boundary: expand the id plane to the reference-ABI
            # (48,48,7) u8 layout on the host (core/cells.py)
            "map_obs": _cells.expand_obs_np(s.map_ids)[0],
            "player_xy": np.asarray(s.player_xy),
            "min_xy": np.asarray(s.min_xy),
        }
        self.map = _DeviceMapView(self._snap)
        self.agent = int(s.agent)
        self.done = bool(s.done)
        self.phase = np.uint8(s.phase)
        self.resources = np.asarray(s.resources, np.float32)
        self.shop_stock = np.asarray(s.shop_stock, np.uint8)
        self.piles = np.asarray(s.piles, np.uint8)
        self.sel_mask = np.asarray(E.unpack_mask(s.sel_mask))
        self.storage_masks = np.asarray(E.unpack_mask(s.storage_masks))
        self.rewards = np.asarray(s.rewards, np.float32)
        self.info_total = np.uint32(s.info_total)
        self.info_steps = np.asarray(s.info_steps, np.uint8)
        self.info_returns = np.asarray(s.info_returns, np.float32)
        self.info_travelled = np.asarray(s.info_travelled, np.uint32)
        self.info_added = np.asarray(s.info_added, np.uint8)
        self.info_removed = np.asarray(s.info_removed, np.uint8)
        self.info_mpc = np.zeros((MAX_N_PLAYERS, 3), np.uint32)  # dead stats
        self.info_card_uses = np.asarray(s.info_card_uses, np.uint32)
        self.n_players = int(s.n_players)
        self.n_pieces = int(s.n_pieces)
        self.difficulty = int(s.difficulty)
        self.max_steps = int(s.max_steps)

    def _check_map(self):
        if bool(np.asarray(self._state.map_overflow)):
            from ..errors import MapCapacityError
            raise MapCapacityError("map generation overflowed MAX_PLACED")
        if not bool(np.asarray(self._state.map_ok)):
            raise GenerateMapFailure(
                "map generation failed more than MAX_FAILURES times")

    def reset(self, seed=None, n_players=None, n_pieces=None,
              difficulty=None, max_steps=None):
        if seed is None:
            # param-less reset: same params, engine stream continues
            # (reference: src/environment.cpp:42-64)
            self._state = self._jreset(self._state)
        else:
            self.seed_ = int(seed)
            self._state = self._jreset_full(
                self._state, int(seed), int(n_players), int(n_pieces),
                int(difficulty), int(max_steps))
        self._check_map()
        self._pull()

    def step(self, action):
        import jax.numpy as jnp
        self._state = self._jstep(self._state,
                                  jnp.asarray(action, jnp.int32))
        self._pull()


class cog_env:
    """Single environment (reference: src/pybind/single_env.cpp:12-86).
    Buffers are owned internally; the reference's init(obs, info, rewards,
    mask) wiring is implicit.

    ``backend="device"`` (default) runs the real jitted engine on the
    accelerator — the analogue of the reference binding the native C++
    engine; ``backend="ref"`` keeps the host-numpy oracle (RefEnv)."""

    def __init__(self, seed=None, n_players=MAX_N_PLAYERS, n_pieces=3,
                 difficulty=Difficulty.EASY, max_steps=100000, render=False,
                 backend="device"):
        if seed is None:
            seed = np.random.SeedSequence().entropy % (2 ** 32)
        cls = _DeviceEnv if backend == "device" else RefEnv
        self._env = cls(seed=int(seed), n_players=int(n_players),
                        n_pieces=int(n_pieces), difficulty=int(difficulty),
                        max_steps=int(max_steps))
        self._render = bool(render)
        self._bufs = None

    def init(self, observations, info, rewards, selected_action_masks):
        """Wire caller-owned numpy buffers (reference:
        src/pybind/single_env.cpp:19-21, environment.cpp:25-40). The
        reference env writes through pointers; here the buffers are synced
        after every reset/step."""
        observations = np.asarray(observations).reshape(())
        info = np.asarray(info).reshape(())
        rewards = np.asarray(rewards, np.float32).reshape(MAX_N_PLAYERS)
        selected_action_masks = np.asarray(
            selected_action_masks).reshape(())
        if (observations.dtype != obs_dtype or info.dtype != info_dtype
                or selected_action_masks.dtype != action_mask_dtype):
            raise TypeError("init() expects obs_dtype / info_dtype / "
                            "float32[4] / action_mask_dtype buffers")
        self._bufs = (observations, info, rewards, selected_action_masks)
        self._sync()

    def _sync(self):
        if self._bufs is None:
            return
        obs, info, rewards, mask = self._bufs
        obs[()] = self.observations
        info[()] = self.infos
        rewards[:] = self._env.rewards
        mask[()] = self.selected_action_mask

    def reset(self, seed=None, n_players=None, n_pieces=None,
              difficulty=None, max_steps=None, render=None):
        if render is not None:
            self._render = bool(render)
        if seed is None:
            self._env.reset()
        else:
            self._env.reset(int(seed), int(n_players), int(n_pieces),
                            int(difficulty), int(max_steps))
        self._sync()

    def step(self, action):
        self._env.step(_action_to_vec(action))
        self._sync()

    def get_map(self):
        """Reference parity: cog_env::get_map (include/environment.h:61)
        returns the board object (the C++ binding declares it but never
        registers Map with pybind; here the host-side map twin is returned
        and actually usable)."""
        return self._env.map

    @property
    def agent_selection(self):
        """src/pybind/single_env.cpp:18."""
        return int(self._env.agent)

    def render(self):
        if not self._render:
            print("You are calling render method without specifying any "
                  "render mode.")
            return
        from ..render import render_env
        print(render_env(self._env))

    # -- accessors (reference getter surface) -----------------------------
    def get_done(self):
        return bool(self._env.done)

    def get_agent_selection(self):
        return int(self._env.agent)

    def get_seed(self):
        return int(self._env.seed_)

    def get_n_players(self):
        return int(self._env.n_players)

    def get_n_pieces(self):
        return int(self._env.n_pieces)

    def get_difficulty(self):
        return Difficulty(self._env.difficulty)

    def get_max_steps(self):
        return int(self._env.max_steps)

    def get_render(self):
        return self._render

    @property
    def observations(self):
        e = self._env
        out = np.zeros((), obs_dtype)
        out["shared"]["map"] = e.map.obs
        out["shared"]["phase"] = e.phase
        out["shared"]["current_resources"] = e.resources
        out["shared"]["shop"] = e.shop_stock
        for p in range(MAX_N_PLAYERS):
            pd = out["player_data"][p]
            for i, name in enumerate(("draw", "hand", "active", "played",
                                      "discard")):
                pd["obs"][name] = e.piles[p, i]
            out["player_data"][p]["action_mask"] = _mask_to_struct(
                e.storage_masks[p])
        return out

    @property
    def selected_action_mask(self):
        return _mask_to_struct(self._env.sel_mask)

    @property
    def rewards(self):
        return self._env.rewards.copy()

    @property
    def infos(self):
        e = self._env
        out = np.zeros((), info_dtype)
        out["total_length"] = e.info_total
        ai = out["agent_infos"]
        ai["steps_taken"] = e.info_steps
        ai["returns"] = e.info_returns
        ai["travelled_hexes"] = e.info_travelled
        ai["cards_added"] = e.info_added
        ai["cards_removed"] = e.info_removed
        ai["n_machete_uses"] = e.info_mpc[:, 0]
        ai["n_paddle_uses"] = e.info_mpc[:, 1]
        ai["n_coin_uses"] = e.info_mpc[:, 2]
        ai["n_card_uses"] = e.info_card_uses
        return out


class action_sampler:
    """Masked uniform sampler (include/sampler.h:7-80)."""

    def __init__(self, seed=42):
        self._s = RefSampler(int(seed))

    def set_seed(self, seed):
        self._s.rng.seed(int(seed))

    def sample(self, mask):
        if isinstance(mask, np.void) or (
                hasattr(mask, "dtype") and mask.dtype == action_mask_dtype):
            flat = np.concatenate([
                mask["play"], mask["play_special"], mask["remove"],
                mask["move"], mask["get_from_shop"]]).astype(bool)
        else:
            flat = np.asarray(mask, bool).reshape(92)
        a = self._s.sample(flat)
        out = np.zeros((), action_dtype)
        for i, name in enumerate(("play", "play_special", "remove", "move",
                                  "get_from_shop")):
            out[name] = a[i]
        return out


from . import vec  # noqa: E402  (submodule mirror of city_of_gold.vec)
