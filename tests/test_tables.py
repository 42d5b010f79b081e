"""Verify static tables against the reference dump (tools/parity_probe/tables_probe.cpp)."""
import pathlib
import re

import numpy as np

from eldorado_tpu.core import tables as T

GOLDEN = pathlib.Path(__file__).parent / "golden" / "tables.txt"


def _parse_golden():
    cards, shopslots, pieces, conns = [], [], [], {}
    cur = None
    cur_conn = None
    for line in GOLDEN.read_text().splitlines():
        if line.startswith("card "):
            m = re.match(
                r"card (\d+) type=(\d+) cost=(\d+) mkt=(\d+) su=(\d+) "
                r"res=(\d+),(\d+),(\d+) special=(\d+)", line)
            cards.append([int(g) for g in m.groups()])
        elif line.startswith("shopslot "):
            m = re.match(r"shopslot (\d+) type=(\d+)", line)
            shopslots.append(int(m.group(2)))
        elif line.startswith("piece "):
            m = re.match(r"piece (\w+) (\d+) diff=(\d+) type=(\d+) size=(\d+) n=(\d+)", line)
            cur = {
                "kind": m.group(1), "idx": int(m.group(2)),
                "diff": int(m.group(3)), "type": int(m.group(4)),
                "size": int(m.group(5)), "n": int(m.group(6)), "hexes": [],
            }
            pieces.append(cur)
        elif line.startswith("hex "):
            m = re.match(
                r"hex (\d+) req=(\d+) n=(\d+) end=(\d+) start=(\d+) "
                r"x=(-?[\d.]+) y=(-?[\d.]+)", line)
            cur["hexes"].append(
                (int(m.group(2)), int(m.group(3)), int(m.group(4)),
                 int(m.group(5)), float(m.group(6)), float(m.group(7))))
        elif line.startswith("conn "):
            m = re.match(r"conn (\S+) n=(\d+)", line)
            cur_conn = []
            conns[m.group(1)] = cur_conn
        elif line.startswith("c "):
            m = re.match(r"c (\d+) x=(-?[\d.]+) y=(-?[\d.]+) rots=(\S*)", line)
            rots = [int(r) for r in m.group(4).split(",") if r]
            cur_conn.append((float(m.group(2)), float(m.group(3)), rots))
    return cards, shopslots, pieces, conns


CARDS, SHOPSLOTS, PIECES, CONNS = _parse_golden()


def test_card_table():
    for i, c in enumerate(CARDS):
        assert c[0] == i and c[1] == i
        assert T.CARD_COST[i] == c[2]
        assert T.CARD_IN_MARKET[i] == bool(c[3])
        assert T.CARD_SINGLE_USE[i] == bool(c[4])
        np.testing.assert_array_equal(T.CARD_RES[i], c[5:8])
        assert T.CARD_IS_SPECIAL[i] == bool(c[8])


def test_shop_slots():
    np.testing.assert_array_equal(T.SHOP_CARD_TYPE, SHOPSLOTS)


def test_piece_library():
    assert len(PIECES) == T.N_PIECES_TOTAL
    for gi, p in enumerate(PIECES):
        assert T.PIECE_DIFFICULTY[gi] == p["diff"], f"piece {gi}"
        assert T.PIECE_TYPE[gi] == p["type"]
        assert T.PIECE_SIZE[gi] == p["size"]
        assert T.PIECE_N_HEX[gi] == p["n"]
        for hi, (req, n, end, start, x, y) in enumerate(p["hexes"]):
            got = T.PIECE_HEX[gi, hi]
            assert tuple(got) == (req, n, end, start), f"piece {gi} hex {hi}"
            # doubled-int coords must equal the float coords exactly
            assert T.PIECE_XY[gi, hi, 0] == 2 * x, f"piece {gi} hex {hi} x"
            assert T.PIECE_XY[gi, hi, 1] == 2 * y, f"piece {gi} hex {hi} y"


def test_connection_tables():
    # tag -> (placed_size, placed_type, new_size)
    key = {
        "START.LARGE->TRAVEL.LARGE": (0, 0, 0),
        "START.LARGE->TRAVEL.SMALL": (0, 0, 1),
        "START.LARGE->END.TRIPLE": (0, 0, 2),
        "TRAVEL.LARGE->TRAVEL.LARGE": (0, 1, 0),
        "TRAVEL.LARGE->TRAVEL.SMALL": (0, 1, 1),
        "TRAVEL.LARGE->END.TRIPLE": (0, 1, 2),
        "TRAVEL.SMALL->TRAVEL.LARGE": (1, 1, 0),
        "TRAVEL.SMALL->TRAVEL.SMALL": (1, 1, 1),
        "TRAVEL.SMALL->END.TRIPLE": (1, 1, 2),
        "END.TRIPLE->TRAVEL.LARGE": (2, 2, 0),
    }
    for tag, entries in CONNS.items():
        ps, pt, ns = key[tag]
        assert T.CONN_N[ps, pt, ns] == len(entries), tag
        for k, (x, y, rots) in enumerate(entries):
            assert T.CONN_COORD[ps, pt, ns, k, 0] == 2 * x, f"{tag} entry {k}"
            assert T.CONN_COORD[ps, pt, ns, k, 1] == 2 * y, f"{tag} entry {k}"
            assert T.CONN_NROT[ps, pt, ns, k] == len(rots), f"{tag} entry {k}"
            np.testing.assert_array_equal(
                T.CONN_ROT[ps, pt, ns, k, : len(rots)], rots, err_msg=f"{tag} {k}")
