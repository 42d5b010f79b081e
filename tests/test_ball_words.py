"""The packed 4-word map read (engine.ball_words) and its per-cell table
(pack_ball_word_table) must agree exactly: the table is what the kernel
rollout gathers per step, ball_words is what the XLA path (and the golden
replays) compute — any divergence silently corrupts kernel trajectories.
Also round-trips the 5-bit cell-type codec against every terrain triple.
"""
import jax
import jax.numpy as jnp
import numpy as np

from eldorado_tpu import vec
from eldorado_tpu.core import engine as E


def test_cell_type_codec_roundtrip():
    req, nr, end = (np.array(t) for t in zip(*E._CELL_TRIPLES))
    ids = np.asarray(E.cell_type_ids(req, nr, end))
    assert sorted(ids) == list(range(E.N_CELL_TYPES))
    r2, n2, e2 = (np.asarray(x) for x in E._decode_cells(ids))
    assert (r2 == req).all() and (n2 == nr).all() and (e2 == end).all()
    # sentinel: the empty cell decodes to (5, 0, 0) at id 0
    assert E._CELL_TRIPLES[0] == (5, 0, 0)


def test_mask_word_packing_roundtrip():
    """pack_mask/unpack_mask round-trip on adversarial patterns, and the
    sign-safe row select: bits 31/63 of a packed row land in i32 sign
    positions, where a masked-max row select silently corrupts."""
    rng = np.random.default_rng(0)
    for _ in range(20):
        bits = rng.random(E.MASK_LEN) < rng.random()
        back = np.asarray(E.unpack_mask(E.pack_mask(jnp.asarray(bits))))
        assert (back == bits).all()
    # all-ones row exercises both sign bits
    ones = np.ones(E.MASK_LEN, bool)
    rows = jnp.tile(E.pack_mask(jnp.asarray(ones))[None], (4, 1))
    for p in range(4):
        got = np.asarray(E.unpack_mask(E._wrow(rows, jnp.int32(p))))
        assert got.all(), p


def test_ball_word_table_matches_ball_words():
    """Gathering the table at the agents' cells == ball_words, for every
    player role, across seeds/piece-counts (the stencil-equivalence
    argument in pack_ball_word_table's docstring, verified)."""
    for seed, pieces, diff in [(9, 3, 1), (21, 5, 2)]:
        s = vec.vec_reset(seed, 8, 4, pieces, diff, 100000)
        tabs = [np.asarray(t) for t in
                jax.vmap(E.pack_ball_word_table)(s.map_obs)]
        words = [np.asarray(w) for w in jax.vmap(E.ball_words)(s)]
        agent = np.asarray(s.agent)
        npl = np.asarray(s.n_players)
        q = np.where(agent + 1 >= npl, 0, agent + 1)
        xy = np.asarray(s.player_xy)
        mn = np.asarray(s.min_xy)
        for e in range(8):
            for w_i, who in [(0, agent[e]), (1, agent[e]),
                             (2, agent[e]), (3, q[e])]:
                d = xy[e, who] - mn[e]
                cell = ((d[0] >> 1) + 1) * E.GRIDSIZE + ((d[1] >> 1) + 1)
                assert tabs[w_i][e, cell] == words[w_i][e], \
                    (seed, e, w_i, int(who))


def test_ball_words_decode_matches_ball_cells():
    """Unpacking the packed words reproduces _ball_cells' rows for the
    agent (all 19 cells) and the next agent (the 6 one-hop cells + own
    end flag) — the full read set of the step."""
    s = vec.vec_reset(5, 4, 4, 3, 1, 100000)
    req, nr, end = (np.asarray(x) for x in jax.vmap(E._ball_cells)(s))
    w = jax.vmap(E.ball_words)(s)
    agent = np.asarray(s.agent)
    q = np.where(agent + 1 >= np.asarray(s.n_players), 0, agent + 1)
    pids = jax.vmap(E._ball_p_ids)(w[0], w[1], w[2])
    pr, pn, pe = (np.asarray(x) for x in E._decode_cells(pids))
    qr, qn, qe = (np.asarray(x) for x in jax.vmap(E._ball_q_row)(w[3]))
    for e in range(4):
        a = agent[e]
        assert (pr[e] == req[e, a]).all()
        assert (pn[e] == nr[e, a]).all()
        assert (pe[e] == end[e, a]).all()
        assert (qr[e, 1:7] == req[e, q[e], 1:7]).all()
        assert (qn[e, 1:7] == nr[e, q[e], 1:7]).all()
        assert (qe[e, 1:7] == end[e, q[e], 1:7]).all()
        assert qe[e, 0] == end[e, q[e], 0]
