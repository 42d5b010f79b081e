"""Bit-exact parity of eldorado_tpu.ops.rng vs libstdc++ golden streams.

Goldens produced by tools/parity_probe/rng_probe.cpp (g++ 12 / libstdc++,
the toolchain the reference targets).
"""
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eldorado_tpu.ops import rng

GOLDEN = pathlib.Path(__file__).parent / "golden" / "rng_streams.bin"


@pytest.fixture(scope="module")
def streams():
    raw = np.fromfile(GOLDEN, dtype=np.uint32)
    n_seeds, n_raw, n_ranges, n_draws = raw[:4]
    off = 4
    seeds, raws = [], []
    for _ in range(n_seeds):
        seeds.append(raw[off])
        raws.append(raw[off + 1 : off + 1 + n_raw])
        off += 1 + n_raw
    ranges = np.array(
        [1, 2, 3, 4, 5, 6, 7, 8, 16, 21, 22, 23, 37, 100, 504, 65536, 2147483645],
        dtype=np.uint32,
    )
    assert len(ranges) == n_ranges
    uniforms = {}
    for s in seeds:
        for r in ranges:
            uniforms[(int(s), int(r))] = raw[off : off + n_draws]
            off += n_draws
    assert off == len(raw)
    return seeds, raws, ranges, uniforms


def test_raw_engine_stream(streams):
    seeds, raws, _, _ = streams

    @jax.jit
    def gen(s):
        x = rng.seed(s)

        def body(x, _):
            x = rng.next_u31(x)
            return x, x

        _, out = jax.lax.scan(body, x, None, length=64)
        return out

    for s, golden in zip(seeds, raws):
        got = np.asarray(gen(jnp.uint32(s)))
        np.testing.assert_array_equal(got, golden, err_msg=f"seed={s}")


def test_uniform_int_streams(streams):
    seeds, _, ranges, uniforms = streams

    @jax.jit
    def gen(s, r):
        x = rng.seed(s)

        def body(x, _):
            v, x = rng.uniform_int(x, r)
            return x, v

        _, out = jax.lax.scan(body, x, None, length=16)
        return out

    for s in seeds:
        for r in ranges:
            got = np.asarray(gen(jnp.uint32(s), jnp.uint32(r)))
            np.testing.assert_array_equal(
                got, uniforms[(int(s), int(r))], err_msg=f"seed={s} range={r}"
            )


def test_uniform_int_vmapped(streams):
    """vmap over (seed, range) lanes must reproduce per-lane scalar streams."""
    seeds, _, ranges, uniforms = streams
    ss = np.array([int(s) for s in seeds for _ in ranges], dtype=np.uint32)
    rr = np.array([int(r) for _ in seeds for r in ranges], dtype=np.uint32)

    @jax.jit
    def gen(s, r):
        x = rng.seed(s)

        def body(x, _):
            v, x = rng.uniform_int(x, r)
            return x, v

        _, out = jax.lax.scan(body, x, None, length=16)
        return out

    got = np.asarray(jax.vmap(gen)(jnp.asarray(ss), jnp.asarray(rr)))
    want = np.stack([uniforms[(int(s), int(r))] for s, r in zip(ss, rr)])
    np.testing.assert_array_equal(got, want)
