#!/usr/bin/env python3
"""Convert env_probe binary dumps into compressed .npz goldens for tests/.

Usage:
  convert_goldens.py mapgen <in.bin> <out.npz>
  convert_goldens.py traj <in.bin> <out.npz>
"""
import sys

import numpy as np

MAP_BYTES = 48 * 48 * 7


class Reader:
    def __init__(self, path):
        self.buf = np.fromfile(path, np.uint8)
        self.off = 0

    def take(self, n, dtype=np.uint8):
        nb = n * np.dtype(dtype).itemsize
        out = self.buf[self.off : self.off + nb].view(dtype)
        self.off += nb
        return out

    def scalar(self, dtype):
        return self.take(1, dtype)[0]

    @property
    def eof(self):
        return self.off >= len(self.buf)


def convert_mapgen(src, dst):
    r = Reader(src)
    recs = []
    while not r.eof:
        seed = r.scalar(np.uint32)
        ok = r.scalar(np.uint8)
        if not ok:
            recs.append((seed, 0, [], None))
            continue
        np_pieces = int(r.scalar(np.int32))
        pieces = []
        for _ in range(np_pieces):
            pid = int(r.scalar(np.int32))
            nh = int(r.scalar(np.int32))
            xy = r.take(nh * 2, np.float32).reshape(nh, 2).copy()
            pieces.append((pid, xy))
        obs = r.take(MAP_BYTES).reshape(48, 48, 7).copy()
        recs.append((seed, 1, pieces, obs))
    S = len(recs)
    PMAX = max((len(p) for _, _, p, _ in recs), default=1)
    out = {
        "seeds": np.array([x[0] for x in recs], np.uint32),
        "ok": np.array([x[1] for x in recs], np.uint8),
        "n_placed": np.array([len(x[2]) for x in recs], np.int32),
        "piece_ids": np.full((S, PMAX), -1, np.int32),
        "piece_nhex": np.zeros((S, PMAX), np.int32),
        "piece_xy": np.zeros((S, PMAX, 37, 2), np.float32),
        "obs": np.zeros((S, 48, 48, 7), np.uint8),
    }
    for i, (_, ok, pieces, obs) in enumerate(recs):
        for k, (pid, xy) in enumerate(pieces):
            out["piece_ids"][i, k] = pid
            out["piece_nhex"][i, k] = len(xy)
            out["piece_xy"][i, k, : len(xy)] = xy
        if ok:
            out["obs"][i] = obs
    np.savez_compressed(dst, **out)
    print(f"{dst}: {S} seeds, max pieces {PMAX}")


def convert_traj(src, dst):
    r = Reader(src)
    env_seed, sampler_seed, n_players, n_pieces, diff, T = r.take(6, np.uint32)
    out = {
        "header": np.array([env_seed, sampler_seed, n_players, n_pieces, diff, T],
                           np.uint32),
        "map0": r.take(MAP_BYTES).reshape(48, 48, 7).copy(),
        "agent0": np.array([r.scalar(np.uint8)]),
        "sel0": r.take(92).copy(),
        "storage0": r.take(4 * 92).reshape(4, 92).copy(),
        "piles0": r.take(420).reshape(4, 5, 21).copy(),
    }
    T = int(T)
    a = {
        "actions": np.zeros((T, 5), np.uint8),
        "done": np.zeros(T, np.uint8),
        "agent": np.zeros(T, np.uint8),
        "phase": np.zeros(T, np.uint8),
        "rewards": np.zeros((T, 4), np.float32),
        "resources": np.zeros((T, 3), np.float32),
        "shop": np.zeros((T, 18), np.uint8),
        "piles": np.zeros((T, 4, 5, 21), np.uint8),
        "sel_mask": np.zeros((T, 92), np.uint8),
        "storage_masks": np.zeros((T, 4, 92), np.uint8),
        "info_total": np.zeros(T, np.uint32),
        "info_steps": np.zeros((T, 4), np.uint8),
        "info_returns": np.zeros((T, 4), np.float32),
        "info_travelled": np.zeros((T, 4), np.uint32),
        "info_added": np.zeros((T, 4), np.uint8),
        "info_removed": np.zeros((T, 4), np.uint8),
        "info_mpc": np.zeros((T, 4, 3), np.uint32),
        "info_card_uses": np.zeros((T, 4), np.uint32),
    }
    reset_steps, reset_maps = [], []
    for t in range(T):
        a["actions"][t] = r.take(5)
        a["done"][t] = r.scalar(np.uint8)
        a["agent"][t] = r.scalar(np.uint8)
        a["phase"][t] = r.scalar(np.uint8)
        a["rewards"][t] = r.take(4, np.float32)
        a["resources"][t] = r.take(3, np.float32)
        a["shop"][t] = r.take(18)
        a["piles"][t] = r.take(420).reshape(4, 5, 21)
        a["sel_mask"][t] = r.take(92)
        a["storage_masks"][t] = r.take(4 * 92).reshape(4, 92)
        a["info_total"][t] = r.scalar(np.uint32)
        for p in range(4):
            a["info_steps"][t, p] = r.scalar(np.uint8)
            a["info_returns"][t, p] = r.scalar(np.float32)
            a["info_travelled"][t, p] = r.scalar(np.uint32)
            a["info_added"][t, p] = r.scalar(np.uint8)
            a["info_removed"][t, p] = r.scalar(np.uint8)
            a["info_mpc"][t, p] = r.take(3, np.uint32)
            a["info_card_uses"][t, p] = r.scalar(np.uint32)
        if a["done"][t]:
            reset_steps.append(t)
            reset_maps.append(r.take(MAP_BYTES).reshape(48, 48, 7).copy())
    assert r.eof
    out.update(a)
    out["reset_steps"] = np.array(reset_steps, np.int32)
    out["reset_maps"] = (
        np.stack(reset_maps) if reset_maps else np.zeros((0, 48, 48, 7), np.uint8)
    )
    np.savez_compressed(dst, **out)
    print(f"{dst}: T={T}, episodes={len(reset_steps)}")


if __name__ == "__main__":
    mode, src, dst = sys.argv[1:4]
    {"mapgen": convert_mapgen, "traj": convert_traj}[mode](src, dst)
