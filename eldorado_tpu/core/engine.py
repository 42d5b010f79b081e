"""Jittable single-env engine: pure-functional reset / step / observation.

The TPU-native core. One environment's entire state is the `EnvState` pytree
(struct-of-arrays over the batch once vmapped); `reset_env` and `step_env` are
pure functions traced once and compiled by XLA. Dispatch is a chain of masked
state selections (every branch is computed, exactly one is kept) — the
lockstep form of the reference's data-dependent turn logic (reference:
src/environment.cpp:91-224). Bit-exact against
eldorado_tpu.core.ref_engine.RefEnv, which is itself bit-exact against the
UB-patched reference oracle (see tests/golden).

Semantics notes (same quirk set as ref_engine — see its module docstring):
uint8 wraparound everywhere the reference uses u_char; dual mask surfaces
(selected vs per-player storage); by-value RNG into map generation; rewards /
info buffers persisting across resets; `played` pile surviving reset.

RNG bounds per step: at most 5 engine draws from a move (discard/remove
picks, reference src/player.cpp:85-131), or 4 from an end-of-turn redraw, or
3 from a card special — each implemented as a fixed-trip masked `fori_loop`
consuming the stream only on live iterations.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constants import (
    GRIDSIZE,
    HAND_SIZE,
    MAX_N_PLAYERS,
    MKT_BOARD_SLOTS,
    N_BUYABLETYPES,
    N_CARDTYPES,
    CardType,
    TurnPhase,
)
from ..ops import rng as R
from . import tables as T
from .mapgen import generate_map

_i32 = jnp.int32
_u8 = jnp.uint8
_f32 = jnp.float32

# mask head offsets in the flat 92-bool mask (probe dump order)
PLAY0, SPECIAL0, REMOVE0, MOVE0, SHOP0 = 0, 22, 44, 66, 73
MASK_LEN = 92
PILE_DRAW, PILE_HAND, PILE_ACTIVE, PILE_PLAYED, PILE_DISCARD = range(5)

# static tables
_CARD_RES = jnp.asarray(T.CARD_RES, _f32)          # (21,3)
_CARD_COST = jnp.asarray(T.CARD_COST, _f32)        # (21,)
_CARD_SINGLE = jnp.asarray(T.CARD_SINGLE_USE)      # (21,)
_CARD_IS_SPECIAL = jnp.asarray(T.CARD_IS_SPECIAL)  # (21,)
_CARD_SPECIAL = jnp.asarray(T.CARD_SPECIAL, _i32)  # (21,)
_SHOP_TYPE = jnp.asarray(T.SHOP_CARD_TYPE, _i32)   # (18,)
_SHOP_COST = jnp.asarray(T.SHOP_COST, _f32)        # (18,)
_SHOP_MKT0 = jnp.asarray(T.SHOP_STARTS_IN_MARKET)  # (18,)
_DIR_DBL = jnp.asarray(
    [(0, 0), (2, 0), (0, 2), (-2, 2), (-2, 0), (0, -2), (2, -2)], _i32)


class EnvState(NamedTuple):
    rng: jnp.ndarray            # u32 engine state
    # reset params (fixed across auto-resets)
    n_players: jnp.ndarray      # i32
    n_pieces: jnp.ndarray       # i32
    difficulty: jnp.ndarray     # i32
    max_steps: jnp.ndarray      # i32
    # map
    map_obs: jnp.ndarray        # (48,48,7) u8
    min_xy: jnp.ndarray         # (2,) i32 doubled
    player_xy: jnp.ndarray      # (4,2) i32 doubled
    map_ok: jnp.ndarray         # bool
    # decks
    piles: jnp.ndarray          # (4,5,21) u8
    n_in_hand: jnp.ndarray      # (4,) u8
    n_active: jnp.ndarray       # (4,) u8
    n_in_draw: jnp.ndarray      # (4,) u8
    idx_last: jnp.ndarray       # (4,) u8
    # player flags / stats
    has_won: jnp.ndarray        # (4,) bool
    mip: jnp.ndarray            # (4,) bool (movement_in_progress)
    next_card_free: jnp.ndarray # (4,) bool
    next_move_free: jnp.ndarray # (4,) bool
    n_removes: jnp.ndarray      # (4,) u8
    steps_taken: jnp.ndarray    # (4,) u8
    n_movements: jnp.ndarray    # (4,) i32
    n_added: jnp.ndarray        # (4,) u8
    # shop
    shop_stock: jnp.ndarray     # (18,) u8
    in_market: jnp.ndarray      # (18,) bool
    n_in_market: jnp.ndarray    # u8
    # turn
    phase: jnp.ndarray          # i32
    agent: jnp.ndarray          # i32
    resources: jnp.ndarray      # (3,) f32
    turn_counter: jnp.ndarray   # i32
    done: jnp.ndarray           # bool
    # masks
    sel_mask: jnp.ndarray       # (92,) bool
    storage_masks: jnp.ndarray  # (4,92) bool
    # outputs (persist across resets)
    rewards: jnp.ndarray        # (4,) f32
    info_total: jnp.ndarray     # i32
    info_steps: jnp.ndarray     # (4,) u8
    info_returns: jnp.ndarray   # (4,) f32
    info_travelled: jnp.ndarray # (4,) i32
    info_added: jnp.ndarray     # (4,) u8
    info_removed: jnp.ndarray   # (4,) u8
    info_card_uses: jnp.ndarray # (4,) i32


def _select(pred, a, b):
    def pick(x, y):
        p = pred if x.ndim == 0 else jnp.reshape(pred, (1,) * x.ndim)
        return jnp.where(p, x, y)
    return jax.tree_util.tree_map(pick, a, b)


def _mask_reset(m):
    """ActionMask::reset (include/api.h:104-118): play/special/remove heads
    cleared; move/shop heads keep indices 1.. apart from index 0."""
    head = jnp.zeros(22, bool).at[0].set(True)
    m = jax.lax.dynamic_update_slice(m, head, (PLAY0,))
    m = jax.lax.dynamic_update_slice(m, head, (SPECIAL0,))
    m = jax.lax.dynamic_update_slice(m, head, (REMOVE0,))
    return m.at[MOVE0].set(True).at[SHOP0].set(True)


def init_mask():
    return _mask_reset(jnp.zeros(MASK_LEN, bool))


def make_state(seed=0, n_players=4, n_pieces=3, difficulty=0,
               max_steps=100000) -> EnvState:
    """Freshly-constructed env + zeroed external buffers (probe layout:
    everything zero except ActionMask constructors)."""
    z4u8 = jnp.zeros(4, _u8)
    return EnvState(
        rng=R.seed(seed),
        n_players=jnp.asarray(n_players, _i32),
        n_pieces=jnp.asarray(n_pieces, _i32),
        difficulty=jnp.asarray(difficulty, _i32),
        max_steps=jnp.asarray(max_steps, _i32),
        map_obs=jnp.zeros((GRIDSIZE, GRIDSIZE, 7), _u8),
        min_xy=jnp.zeros(2, _i32),
        player_xy=jnp.zeros((4, 2), _i32),
        map_ok=jnp.bool_(True),
        piles=jnp.zeros((4, 5, N_CARDTYPES), _u8),
        n_in_hand=z4u8, n_active=z4u8, n_in_draw=z4u8, idx_last=z4u8,
        has_won=jnp.zeros(4, bool), mip=jnp.zeros(4, bool),
        next_card_free=jnp.zeros(4, bool), next_move_free=jnp.zeros(4, bool),
        n_removes=z4u8, steps_taken=z4u8,
        n_movements=jnp.zeros(4, _i32), n_added=z4u8,
        shop_stock=jnp.full(18, 3, _u8),
        in_market=_SHOP_MKT0,
        n_in_market=jnp.asarray(MKT_BOARD_SLOTS, _u8),
        phase=jnp.asarray(0, _i32), agent=jnp.asarray(0, _i32),
        resources=jnp.zeros(3, _f32),
        turn_counter=jnp.asarray(0, _i32), done=jnp.bool_(False),
        sel_mask=init_mask(),
        storage_masks=jnp.tile(init_mask()[None], (4, 1)),
        rewards=jnp.zeros(4, _f32),
        info_total=jnp.asarray(0, _i32), info_steps=z4u8,
        info_returns=jnp.zeros(4, _f32), info_travelled=jnp.zeros(4, _i32),
        info_added=z4u8, info_removed=z4u8,
        info_card_uses=jnp.zeros(4, _i32))


# ---------------------------------------------------------------------- deck
def _deck_draw(s: EnvState, p, n):
    """Deck::draw (src/cards.cpp:183-211): recycle at most once, clamp, then
    up to four uniform picks scanning the draw-pile counts."""
    piles = s.piles[p]                                 # (5,21)
    need = s.n_in_draw[p].astype(_i32) < n
    rec_draw = piles[PILE_DRAW] + piles[PILE_DISCARD]  # u8 wrap
    rec_nid = s.n_in_draw[p] + jnp.sum(
        piles[PILE_DISCARD].astype(_i32)).astype(_u8)  # sequential u8 adds
    draw = jnp.where(need, rec_draw, piles[PILE_DRAW])
    discard = jnp.where(need, jnp.zeros_like(rec_draw), piles[PILE_DISCARD])
    nid = jnp.where(need, rec_nid, s.n_in_draw[p])
    hand = piles[PILE_HAND]
    n_eff = jnp.minimum(n, nid.astype(_i32))
    sel = s.sel_mask

    def body(k, carry):
        draw, hand, nid, sel, rng = carry
        live = k < n_eff
        t, rng = R.uniform_int_maybe(rng, nid.astype(_i32), live)
        cum = jnp.cumsum(draw.astype(_i32))
        ct = jnp.sum(cum <= t.astype(_i32), dtype=_i32)
        ct = jnp.minimum(ct, N_CARDTYPES - 1)
        one = jnp.asarray(1, _u8)
        draw = jnp.where(live, draw.at[ct].add(-one), draw)
        hand = jnp.where(live, hand.at[ct].add(one), hand)
        nid = jnp.where(live, nid - one, nid)
        sel = jnp.where(live, sel.at[PLAY0 + 1 + ct].set(True), sel)
        sel = jnp.where(live,
                        sel.at[SPECIAL0 + 1 + ct].set(_CARD_IS_SPECIAL[ct]),
                        sel)
        return draw, hand, nid, sel, rng

    draw, hand, nid, sel, rng = jax.lax.fori_loop(
        0, HAND_SIZE, body, (draw, hand, nid, sel, s.rng))
    piles = (piles.at[PILE_DRAW].set(draw).at[PILE_HAND].set(hand)
             .at[PILE_DISCARD].set(discard))
    return s._replace(
        piles=s.piles.at[p].set(piles),
        n_in_draw=s.n_in_draw.at[p].set(nid),
        n_in_hand=s.n_in_hand.at[p].add(n_eff.astype(_u8)),
        sel_mask=sel, rng=rng)


def _activate(s: EnvState, p, idx):
    """Deck::activate (src/cards.cpp:242-253)."""
    prev = s.piles[p, PILE_HAND, idx]
    one = jnp.asarray(1, _u8)
    return s._replace(
        piles=(s.piles.at[p, PILE_HAND, idx].add(-one)
               .at[p, PILE_ACTIVE, idx].add(one)),
        n_in_hand=s.n_in_hand.at[p].add(-one),
        n_active=s.n_active.at[p].add(one),
        idx_last=s.idx_last.at[p].set(idx.astype(_u8)),
        sel_mask=(s.sel_mask.at[PLAY0 + 1 + idx].set(prev > 1)
                  .at[SPECIAL0 + 1 + idx].set(
                      (prev > 1) & _CARD_IS_SPECIAL[idx])))


def _play_last_activated(s: EnvState, p):
    """src/cards.cpp:255-261."""
    idx = s.idx_last[p].astype(_i32)
    one = jnp.asarray(1, _u8)
    piles = s.piles.at[p, PILE_ACTIVE, idx].add(-one)
    piles = jnp.where(_CARD_SINGLE[idx], piles,
                      piles.at[p, PILE_PLAYED, idx].add(one))
    return s._replace(piles=piles, n_active=s.n_active.at[p].add(-one))


def _play_immediate(s: EnvState, p, idx):
    """src/cards.cpp:263-273."""
    prev = s.piles[p, PILE_HAND, idx]
    one = jnp.asarray(1, _u8)
    return s._replace(
        piles=(s.piles.at[p, PILE_HAND, idx].add(-one)
               .at[p, PILE_PLAYED, idx].add(one)),
        n_in_hand=s.n_in_hand.at[p].add(-one),
        sel_mask=(s.sel_mask.at[PLAY0 + 1 + idx].set(prev > 1)
                  .at[SPECIAL0 + 1 + idx].set(
                      (prev > 1) & _CARD_IS_SPECIAL[idx])))


def _remove_immediate(s: EnvState, p, idx):
    """src/cards.cpp:281-290."""
    prev = s.piles[p, PILE_HAND, idx]
    one = jnp.asarray(1, _u8)
    sel = s.sel_mask
    play_bit = sel[PLAY0 + 1 + idx] & (prev > 1)
    sel = (sel.at[REMOVE0 + 1 + idx].set(sel[REMOVE0 + 1 + idx] & (prev > 1))
           .at[PLAY0 + 1 + idx].set(play_bit)
           .at[SPECIAL0 + 1 + idx].set(play_bit & _CARD_IS_SPECIAL[idx]))
    return s._replace(
        piles=s.piles.at[p, PILE_HAND, idx].add(-one),
        n_in_hand=s.n_in_hand.at[p].add(-one),
        sel_mask=sel)


def _pick_actives(s: EnvState, p, n, to_discard):
    """Player::discard_cards / remove_cards (src/player.cpp:85-131): n uniform
    picks over the active counts; remove clamps n to n_active, discard does
    not (unreachable overflow per the mod-256 invariant)."""
    n_avail = s.n_active[p].astype(_i32)
    n = jnp.where(to_discard, n, jnp.minimum(n, n_avail))
    active = s.piles[p, PILE_ACTIVE]
    discard = s.piles[p, PILE_DISCARD]
    n_act = s.n_active[p]

    def body(k, carry):
        active, discard, n_act, rng = carry
        live = k < n
        t, rng = R.uniform_int_maybe(rng, n_avail - k, live)
        cum = jnp.cumsum(active.astype(_i32))
        ct = jnp.sum(cum <= t.astype(_i32), dtype=_i32)
        ct = jnp.minimum(ct, N_CARDTYPES - 1)
        one = jnp.asarray(1, _u8)
        active = jnp.where(live, active.at[ct].add(-one), active)
        discard = jnp.where(live & to_discard, discard.at[ct].add(one), discard)
        n_act = jnp.where(live, n_act - one, n_act)
        return active, discard, n_act, rng

    active, discard, n_act, rng = jax.lax.fori_loop(
        0, 5, body, (active, discard, n_act, s.rng))
    return s._replace(
        piles=(s.piles.at[p, PILE_ACTIVE].set(active)
               .at[p, PILE_DISCARD].set(discard)),
        n_active=s.n_active.at[p].set(n_act), rng=rng)


# --------------------------------------------------------------------- masks
def _disable_playing(s: EnvState):
    """src/player.cpp:191-196 (selected mask)."""
    head = jnp.zeros(22, bool).at[0].set(True)
    sel = jax.lax.dynamic_update_slice(s.sel_mask, head, (PLAY0,))
    sel = jax.lax.dynamic_update_slice(sel, head, (SPECIAL0,))
    return s._replace(sel_mask=sel)


def _enable_playing(s: EnvState, p):
    """src/player.cpp:198-206 (selected mask)."""
    hand = s.piles[p, PILE_HAND]
    play = hand > 0                                   # (21,)
    sel = s.sel_mask
    sel = jax.lax.dynamic_update_slice(
        sel, jnp.zeros(22, bool).at[0].set(True), (REMOVE0,))
    sel = jax.lax.dynamic_update_slice(sel, play, (PLAY0 + 1,))
    sel = jax.lax.dynamic_update_slice(
        sel, play & _CARD_IS_SPECIAL, (SPECIAL0 + 1,))
    return s._replace(sel_mask=sel)


def _shop_available(s: EnvState, coins):
    """Shop::set_available_mask -> 18 bools (src/cards.cpp:109-121)."""
    open_slots = s.n_in_market.astype(_i32) < MKT_BOARD_SLOTS
    afford = coins > _SHOP_COST
    return jnp.where(open_slots, (s.shop_stock > 0) & afford,
                     s.in_market & afford)


def _cells(s: EnvState, xy):
    """Hex features at doubled coords xy (..., 2): (req, n_req, is_end).
    Reproduces the reference's size_t truncation of half-integer offsets
    (src/map.cpp:273-275): d>=0 -> d//2+1; d==-1 -> 1; d<=-2 -> 0."""
    d = xy - s.min_xy
    idx = jnp.where(d >= 0, (d >> 1) + 1, jnp.where(d == -1, 1, 0))
    ix, iy = idx[..., 0], idx[..., 1]
    in_grid = (ix >= 0) & (ix < GRIDSIZE) & (iy >= 0) & (iy < GRIDSIZE)
    cell = s.map_obs[jnp.clip(ix, 0, GRIDSIZE - 1),
                     jnp.clip(iy, 0, GRIDSIZE - 1)].astype(_i32)
    cell = jnp.where(in_grid[..., None], cell, 0)
    reqch = cell[..., 1:6]                             # (...,5)
    present = reqch > 0
    req = jnp.argmax(present, axis=-1)
    has = jnp.any(present, axis=-1)
    req = jnp.where(has, req, 5)
    n_req = jnp.take_along_axis(reqch, jnp.minimum(req, 4)[..., None],
                                axis=-1)[..., 0]
    n_req = jnp.where(has, n_req, 0)
    return req, n_req, cell[..., 6]


def _movement_mask(s: EnvState, p, resources, n_active):
    """Map::set_movement_mask -> 6 bools for directions 1..6
    (src/map.cpp:369-387)."""
    req, n_req, _ = _cells(s, s.player_xy[p][None] + _DIR_DBL[1:])
    res = resources[jnp.minimum(req, 2)]
    filled = jnp.where(req >= 3, n_active > n_req,
                       res >= n_req.astype(_f32))
    return (req != 5) & filled


def _update_observation(s: EnvState, agent):
    """cog_env::update_observation — storage mask move/shop heads
    (src/environment.cpp:252-279)."""
    m = s.storage_masks[agent]
    m = jax.lax.dynamic_update_slice(
        m, jnp.zeros(7, bool).at[0].set(True), (MOVE0,))
    m = jax.lax.dynamic_update_slice(
        m, jnp.zeros(19, bool).at[0].set(True), (SHOP0,))
    mv = _movement_mask(s, agent, s.resources,
                        s.n_active[agent].astype(_i32))
    m = jnp.where(s.phase == TurnPhase.MOVEMENT,
                  jax.lax.dynamic_update_slice(m, mv, (MOVE0 + 1,)), m)
    m = jnp.where(s.phase == TurnPhase.BUYING,
                  jax.lax.dynamic_update_slice(
                      m, _shop_available(s, s.resources[2]), (SHOP0 + 1,)), m)
    return s._replace(storage_masks=s.storage_masks.at[agent].set(m))


# --------------------------------------------------------------------- reset
def _player_reset(s: EnvState, p):
    """Player::reset (src/player.cpp:29-43); `played` pile survives."""
    z21 = jnp.zeros(N_CARDTYPES, _u8)
    start_discard = (z21.at[CardType.EXPLORER].set(3)
                     .at[CardType.TRAVELER].set(4)
                     .at[CardType.SAILOR].set(1))
    piles = (s.piles.at[p, PILE_DRAW].set(z21)
             .at[p, PILE_HAND].set(z21)
             .at[p, PILE_ACTIVE].set(z21)
             .at[p, PILE_DISCARD].set(start_discard))
    z = jnp.asarray(0, _u8)
    s = s._replace(
        has_won=s.has_won.at[p].set(False),
        mip=s.mip.at[p].set(False),
        next_card_free=s.next_card_free.at[p].set(False),
        next_move_free=s.next_move_free.at[p].set(False),
        n_removes=s.n_removes.at[p].set(z),
        steps_taken=s.steps_taken.at[p].set(z),
        n_movements=s.n_movements.at[p].set(0),
        n_added=s.n_added.at[p].set(z),
        piles=piles,
        n_in_draw=s.n_in_draw.at[p].set(z),
        n_in_hand=s.n_in_hand.at[p].set(z),
        n_active=s.n_active.at[p].set(z),
        sel_mask=_mask_reset(s.sel_mask))
    s = _deck_draw(s, p, jnp.asarray(HAND_SIZE, _i32))
    return s._replace(storage_masks=s.storage_masks.at[p].set(s.sel_mask))


def reset_env(s: EnvState) -> EnvState:
    """cog_env::reset (src/environment.cpp:42-64). Map generation consumes a
    copy of the engine; deck draws continue from the caller's stream."""
    gen = generate_map(s.rng, s.n_pieces, s.difficulty)
    s = s._replace(
        agent=jnp.asarray(0, _i32),
        phase=jnp.asarray(int(TurnPhase.INACTIVE), _i32),
        map_obs=gen.obs, min_xy=gen.min_xy,
        map_ok=gen.ok)

    def pbody(p, s):
        return _select(p < s.n_players, _player_reset(s, p), s)
    s = jax.lax.fori_loop(0, MAX_N_PLAYERS, pbody, s)

    # add_players (src/map.cpp:343-354, oracle-patched bounds)
    i4 = jnp.arange(MAX_N_PLAYERS)
    gate = ((gen.player_start_no > 0)
            & (gen.player_start_no < s.n_players + 1)
            & (i4 < s.n_players))
    s = s._replace(player_xy=jnp.where(gate[:, None], gen.player_start_xy, 0))

    # Shop::reset (src/cards.cpp:94-100): n_in_market untouched
    s = s._replace(shop_stock=jnp.full(18, 3, _u8), in_market=_SHOP_MKT0,
                   done=jnp.bool_(False), turn_counter=jnp.asarray(0, _i32))

    def obody(p, s):
        return _select(p < s.n_players, _update_observation(s, p), s)
    s = jax.lax.fori_loop(0, MAX_N_PLAYERS, obody, s)
    return s._replace(sel_mask=s.storage_masks[s.agent])


def reset_env_full(s: EnvState, seed, n_players, n_pieces, difficulty,
                   max_steps) -> EnvState:
    """cog_env::reset(seed, ...) (src/environment.cpp:66-77)."""
    s = s._replace(rng=R.seed(seed),
                   n_players=jnp.asarray(n_players, _i32),
                   n_pieces=jnp.asarray(n_pieces, _i32),
                   difficulty=jnp.asarray(difficulty, _i32),
                   max_steps=jnp.asarray(max_steps, _i32))
    return reset_env(s)


# ---------------------------------------------------------------------- step
def _end_turn(s: EnvState, p):
    """Player::end_turn (src/player.cpp:170-180)."""
    piles = s.piles[p]
    discard = piles[PILE_DISCARD] + piles[PILE_ACTIVE] + piles[PILE_PLAYED]
    z21 = jnp.zeros(N_CARDTYPES, _u8)
    s = s._replace(
        piles=(s.piles.at[p, PILE_DISCARD].set(discard)
               .at[p, PILE_ACTIVE].set(z21)
               .at[p, PILE_PLAYED].set(z21)),
        n_active=s.n_active.at[p].set(jnp.asarray(0, _u8)))
    n_draw = HAND_SIZE - s.n_in_hand[p].astype(_i32)
    s = _select(n_draw > 0, _deck_draw(s, p, jnp.maximum(n_draw, 0)), s)
    return s._replace(
        resources=jnp.zeros(3, _f32),
        storage_masks=s.storage_masks.at[p].set(s.sel_mask))


def _next_agent(s: EnvState) -> EnvState:
    """cog_env::next_agent (src/environment.cpp:79-89)."""
    s = _end_turn(s, s.agent)
    nxt = s.agent + 1
    nxt = jnp.where(nxt >= s.n_players, 0, nxt)
    return s._replace(
        agent=nxt,
        sel_mask=s.storage_masks[nxt],
        resources=jnp.zeros(3, _f32),
        turn_counter=s.turn_counter + 1)


def _run_special(s: EnvState, special, p) -> EnvState:
    """Card special actions (src/cards.cpp:8-36) + the shop-disable
    continuation (src/environment.cpp:156-159). Writes the storage mask of
    the current agent; disable_playing acts on the selected mask."""
    def storage(s):
        return s.storage_masks[p]

    def set_storage(s, m):
        return s._replace(storage_masks=s.storage_masks.at[p].set(m))

    def f_transmit(s):
        m = jax.lax.dynamic_update_slice(
            storage(s), jnp.zeros(7, bool).at[0].set(True), (MOVE0,))
        m = jax.lax.dynamic_update_slice(m, s.shop_stock > 0, (SHOP0 + 1,))
        s = set_storage(s, m)
        s = _disable_playing(s)
        return s._replace(next_card_free=s.next_card_free.at[p].set(True))

    def f_draw(s, n):
        return _deck_draw(s, p, jnp.asarray(n, _i32))

    def f_draw_remove(s, n):
        s = _deck_draw(s, p, jnp.asarray(n, _i32))
        m = storage(s)
        play_head = jax.lax.dynamic_slice(m, (PLAY0,), (22,))
        m = jax.lax.dynamic_update_slice(m, play_head, (REMOVE0,))
        m = jax.lax.dynamic_update_slice(
            m, _shop_available(s, jnp.asarray(0.0, _f32)), (SHOP0 + 1,))
        s = set_storage(s, m)
        s = _disable_playing(s)
        return s._replace(n_removes=s.n_removes.at[p].set(
            jnp.asarray(n, _u8)))

    def f_native(s):
        mv = _movement_mask(s, p, jnp.full(3, 100.0, _f32), jnp.asarray(100, _i32))
        m = jax.lax.dynamic_update_slice(storage(s), mv, (MOVE0 + 1,))
        m = jax.lax.dynamic_update_slice(
            m, _shop_available(s, jnp.asarray(0.0, _f32)), (SHOP0 + 1,))
        s = set_storage(s, m)
        s = _disable_playing(s)
        return s._replace(next_move_free=s.next_move_free.at[p].set(True))

    def f_shop_disable(s):
        m = jax.lax.dynamic_update_slice(
            storage(s), _shop_available(s, jnp.asarray(0.0, _f32)),
            (SHOP0 + 1,))
        return set_storage(s, m)

    out = _select(special == T.SPECIAL_TRANSMIT, f_transmit(s), s)
    out = _select(special == T.SPECIAL_DRAW2, f_draw(s, 2), out)
    out = _select(special == T.SPECIAL_DRAW3, f_draw(s, 3), out)
    out = _select(special == T.SPECIAL_DRAW1_REMOVE1, f_draw_remove(s, 1), out)
    out = _select(special == T.SPECIAL_DRAW2_REMOVE2, f_draw_remove(s, 2), out)
    out = _select(special == T.SPECIAL_NATIVE, f_native(s), out)
    out = _select(special == T.SPECIAL_SHOP_DISABLE, f_shop_disable(s), out)
    return out


def step_env(s: EnvState, action) -> EnvState:
    """cog_env::step (src/environment.cpp:91-224). ``action``: i32[5]
    (play, play_special, remove, move, get_from_shop); dead steps (done
    envs) are no-ops."""
    s0 = s
    action = jnp.asarray(action, _i32)
    a_play, a_sp, a_rm, a_mv, a_shop = (action[i] for i in range(5))
    p = s.agent

    s = s._replace(
        info_steps=s.info_steps.at[p].add(jnp.asarray(1, _u8)),
        phase=jnp.where(s.phase == TurnPhase.INACTIVE,
                        jnp.asarray(int(TurnPhase.MOVEMENT), _i32), s.phase),
        steps_taken=s.steps_taken.at[p].add(jnp.asarray(1, _u8)))

    b_play = a_play > 0
    b_special = ~b_play & (a_sp > 0)
    b_move = ~b_play & ~b_special & (a_mv > 0)
    b_else = ~b_play & ~b_special & ~b_move

    # ---- play branch (src/environment.cpp:104-108, src/player.cpp:47-69)
    def f_play(s):
        idx = jnp.clip(a_play - 1, 0, N_CARDTYPES - 1)
        res_mov = _CARD_RES[idx]
        coin = _CARD_RES[idx, 2]
        res_buy = s.resources.at[2].add(
            jnp.where(coin > 0, coin, jnp.asarray(0.5, _f32)))
        res = jnp.where(s.phase == TurnPhase.MOVEMENT, res_mov,
                        jnp.where(s.phase == TurnPhase.BUYING, res_buy,
                                  s.resources))
        return _activate(s._replace(resources=res), p, idx)

    # ---- play_special branch (src/environment.cpp:110-112)
    def f_special(s):
        idx = jnp.clip(a_sp - 1, 0, N_CARDTYPES - 1)
        return _select(_CARD_SINGLE[idx], _remove_immediate(s, p, idx),
                       _play_immediate(s, p, idx))

    # ---- move branch (src/environment.cpp:115-125)
    def f_move(s):
        new_xy = s.player_xy[p] + _DIR_DBL[a_mv]
        s = s._replace(player_xy=s.player_xy.at[p].set(new_xy))
        req, n_req, is_end = _cells(s, new_xy)
        free = s.next_move_free[p]

        def handle_req(s):
            # resource requirement (src/player.cpp:141-150)
            ridx = jnp.minimum(req, 2)
            left = s.resources[ridx] - n_req.astype(_f32)
            res = jnp.zeros(3, _f32).at[ridx].set(left)
            first = ~s.mip[p]
            with_play = _play_last_activated(s, p)._replace(
                mip=s.mip.at[p].set(True))
            res_state = _select(first, with_play, s)._replace(resources=res)
            # REMOVE / DISCARD hexes (src/player.cpp:151-158)
            pick_state = _pick_actives(s, p, n_req.astype(_i32), req == 3)
            pick_state = pick_state._replace(
                resources=jnp.zeros(3, _f32), mip=s.mip.at[p].set(False))
            out = _select(req < 3, res_state, s)
            return _select((req == 3) | (req == 4), pick_state, out)

        def free_move(s):
            s = s._replace(next_move_free=s.next_move_free.at[p].set(False))
            return _enable_playing(s, p)

        s = _select(free, free_move(s), handle_req(s))
        return s._replace(
            n_movements=s.n_movements.at[p].add(1),
            has_won=s.has_won.at[p].set(is_end > 0))

    # ---- else branch (src/environment.cpp:128-174)
    def f_else(s):
        s = s._replace(next_move_free=s.next_move_free.at[p].set(False))
        b_shop = a_shop > 0
        b_remove = ~b_shop & (a_rm > 0)

        def f_shop(s):
            i = jnp.clip(a_shop - 1, 0, N_BUYABLETYPES - 1)
            free = s.next_card_free[p]
            # buy: reopen slot before get (src/cards.cpp:102-106)
            n_mkt = s.n_in_market + jnp.where(
                free, 0, 1 - s.in_market[i].astype(_i32)).astype(_u8)
            in_mkt = jnp.where(free, s.in_market, s.in_market.at[i].set(True))
            # get (src/cards.cpp:136-142)
            stock = s.shop_stock.at[i].add(-jnp.asarray(1, _u8))
            close = (stock[i] == 0) & in_mkt[i]
            in_mkt = jnp.where(close, in_mkt.at[i].set(False), in_mkt)
            n_mkt = jnp.where(close, n_mkt - jnp.asarray(1, _u8), n_mkt)
            card = _SHOP_TYPE[i]
            res = jnp.where(free, s.resources,
                            s.resources.at[2].add(-_CARD_COST[card]))
            phase = jnp.where(free, s.phase, (s.phase + 1) % 3)
            return s._replace(
                shop_stock=stock, in_market=in_mkt, n_in_market=n_mkt,
                resources=res, phase=phase,
                piles=s.piles.at[p, PILE_DISCARD, card].add(
                    jnp.asarray(1, _u8)),
                n_added=s.n_added.at[p].add(jnp.asarray(1, _u8)))

        def f_remove(s):
            idx = jnp.clip(a_rm - 1, 0, N_CARDTYPES - 1)
            s = _remove_immediate(s, p, idx)
            s = s._replace(
                n_removes=s.n_removes.at[p].add(-jnp.asarray(1, _u8)))
            return _select(s.n_removes[p] == 0, _enable_playing(s, p), s)

        def f_null(s):
            s = s._replace(phase=(s.phase + 1) % 3)
            pending = s.n_removes[p].astype(_i32) > 0
            cleared = _enable_playing(s._replace(
                n_removes=s.n_removes.at[p].set(jnp.asarray(0, _u8))), p)
            return _select(pending, cleared, s)

        s = _select(b_shop, f_shop(s),
                    _select(b_remove, f_remove(s), f_null(s)))
        # next_card_free tail (src/environment.cpp:170-173)
        nc = s.next_card_free[p]
        freed = _enable_playing(
            s._replace(next_card_free=s.next_card_free.at[p].set(False)), p)
        return _select(nc, freed, s)

    s = _select(b_play, f_play(s),
                _select(b_special, f_special(s),
                        _select(b_move, f_move(s), f_else(s))))

    # pending special id (executed after update_observation)
    special = jnp.where(
        b_special, _CARD_SPECIAL[jnp.clip(a_sp - 1, 0, N_CARDTYPES - 1)], 0)
    special = jnp.where(
        b_else & (a_shop == 0) & (a_rm > 0) & (s.n_removes[p] != 0),
        T.SPECIAL_SHOP_DISABLE, special)

    # movement_in_progress teardown (src/environment.cpp:176-179) — gated on
    # the *raw* action.move field, not the dispatched branch: a step that
    # plays a card while also carrying a nonzero move sub-action skips it.
    tear = s.mip[p] & (a_mv == 0)
    s = _select(tear, s._replace(mip=s.mip.at[p].set(False),
                                 resources=jnp.zeros(3, _f32)), s)

    # maybe_end_turn (src/environment.cpp:244-250)
    s = _select(s.has_won[p] | (s.phase == TurnPhase.INACTIVE),
                _next_agent(s), s)
    s = _update_observation(s, s.agent)

    # special function, else done check (src/environment.cpp:183-207)
    s = _select(special > 0, _run_special(s, special, s.agent), s)
    _, _, on_end = _cells(s, s.player_xy[s.agent])
    end_now = (special == 0) & ((on_end > 0)
                               | (s.turn_counter >= s.max_steps))
    n_winners = jnp.sum(s.has_won.astype(_f32))
    live = jnp.arange(MAX_N_PLAYERS) < s.n_players
    returns = (s.n_players.astype(_f32) * s.has_won.astype(_f32)
               - n_winners)
    finished = s._replace(
        done=jnp.bool_(True),
        info_total=s.turn_counter,
        info_steps=jnp.where(live, s.steps_taken, s.info_steps),
        info_returns=jnp.where(live, returns, s.info_returns),
        rewards=jnp.where(live, returns, s.rewards),
        info_travelled=jnp.where(live, s.n_movements, s.info_travelled),
        info_added=jnp.where(live, s.n_added, s.info_added),
        info_removed=jnp.where(live, s.n_added, s.info_removed),
        info_card_uses=jnp.where(live, s.n_added.astype(_i32),
                                 s.info_card_uses))
    s = _select(end_now, finished, s)
    return _select(s0.done, s0, s)


# ------------------------------------------------------------------- sampler
def sample_action(rng, mask):
    """action_sampler::sample (include/sampler.h:14-79): per head, a uniform
    pick over the valid indices (all five heads always contain index 0, so
    exactly five engine draws are consumed)."""
    outs = []
    for off, width in ((PLAY0, 22), (SPECIAL0, 22), (REMOVE0, 22),
                       (MOVE0, 7), (SHOP0, 19)):
        bits = jax.lax.dynamic_slice(mask, (off,), (width,))
        n = jnp.sum(bits, dtype=_i32)
        pos, rng = R.uniform_int(rng, jnp.maximum(n, 1))
        csum = jnp.cumsum(bits) - bits
        val = jnp.argmax(bits & (csum == pos.astype(_i32))).astype(_i32)
        outs.append(jnp.where(n > 0, val, 0))
    return jnp.stack(outs), rng
