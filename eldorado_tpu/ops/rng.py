"""Bit-exact libstdc++ RNG kernels in pure uint32 JAX ops.

The reference engine consumes ``std::default_random_engine`` (libstdc++ =
``minstd_rand0``: x' = 16807*x mod 2^31-1) through
``std::uniform_int_distribution<size_t>`` (libstdc++ "downscaling" rejection
algorithm) for every random decision: map generation, deck draws,
discard/remove picks, and the built-in action sampler (reference:
src/environment.cpp:18-22, src/cards.cpp:190, src/player.cpp:92,115,
include/sampler.h:25). Reproducing those streams exactly is the foundation of
trajectory parity, so the engine state is a single uint32 per stream and every
kernel here is jit/vmap-friendly (no 64-bit ops: JAX x64 stays disabled).

Derivation notes
----------------
* minstd_rand0 state lies in [1, M-1], M = 2^31-1 (prime). The 46-bit product
  16807*x is reduced with 16-bit splitting and the Mersenne-prime fold
  (2^31 === 1 mod M), entirely in uint32.
* libstdc++ uniform_int_distribution<T>(0, n-1) over an engine with range
  [1, 2^31-2] takes the "downscaling" branch whenever n <= 2147483645:
      scaling = 2147483645 / n;  past = n * scaling
      do r = engine() - 1 while r >= past
      return r / scaling
  The rejection loop is a ``lax.while_loop`` (rejection probability is tiny,
  and vmapped while_loops mask converged lanes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

M = 2147483647  # 2^31 - 1, minstd modulus
A = 16807
URNG_RANGE = 2147483645  # engine max-min = (M-1) - 1

_u32 = jnp.uint32


def seed(s):
    """libstdc++ linear_congruential_engine::seed: x = s % M, 0 -> 1."""
    s = jnp.asarray(s, _u32)
    s = jnp.where(s >= M, s - M, s)
    s = jnp.where(s >= M, s - M, s)  # u32 max = 2M+1, two folds suffice
    return jnp.where(s == 0, jnp.asarray(1, _u32), s)


def next_u31(x):
    """One minstd_rand0 step: x' = 16807*x mod (2^31-1), all uint32."""
    x = jnp.asarray(x, _u32)
    lo = A * (x & jnp.asarray(0xFFFF, _u32))       # 16807*65535 < 2^31
    hi = A * (x >> 16)                             # < 2^30
    y = lo + ((hi & jnp.asarray(0x7FFF, _u32)) << 16) + (hi >> 15)  # < 2^32
    y = (y & jnp.asarray(0x7FFFFFFF, _u32)) + (y >> 31)
    return jnp.where(y >= M, y - jnp.asarray(M, _u32), y)


def uniform_int(x, uerange):
    """Exact libstdc++ uniform_int_distribution(0, uerange-1)(engine).

    Args:
      x: engine state (uint32 scalar, in [1, M-1]).
      uerange: number of outcomes (traced uint32/int32 scalar, >= 1).

    Returns:
      (value, new_state): value in [0, uerange-1], uint32.
    """
    uerange = jnp.asarray(uerange, _u32)
    scaling = jnp.asarray(URNG_RANGE, _u32) // uerange
    past = uerange * scaling

    def cond(carry):
        _, r = carry
        return r >= past

    def body(carry):
        xx, _ = carry
        xx = next_u31(xx)
        return xx, xx - jnp.asarray(1, _u32)

    x0 = next_u31(x)
    x, r = jax.lax.while_loop(cond, body, (x0, x0 - jnp.asarray(1, _u32)))
    return r // scaling, x


def uniform_int_maybe(x, uerange, do_draw):
    """uniform_int that leaves the stream untouched when ``do_draw`` is False.

    Used for data-dependent draw counts (deck refills, discard/remove picks)
    where the reference consumes engine values only on executed iterations.
    """
    v, x_new = uniform_int(x, jnp.maximum(uerange, 1))
    x_out = jnp.where(do_draw, x_new, x)
    v_out = jnp.where(do_draw, v, jnp.asarray(0, _u32))
    return v_out, x_out


def uniform_int_fast(x, uerange):
    """Loop-free uniform_int: two unrolled rejection attempts.

    The downscaling rejection fires with probability < uerange / 2^31
    (< 1.1e-8 for every draw this engine makes, uerange <= 256); two
    consecutive rejections (< 1.2e-16) are beyond any realistic run length.
    Returns (value, new_state, tainted): ``tainted`` flags the
    double-rejection case where the value deviates from the exact stream —
    callers accumulate it so parity claims stay honest.
    """
    uerange = jnp.asarray(uerange, _u32)
    scaling = jnp.asarray(URNG_RANGE, _u32) // uerange
    past = uerange * scaling
    x1 = next_u31(x)
    r1 = x1 - jnp.asarray(1, _u32)
    ok1 = r1 < past
    x2 = next_u31(x1)
    r2 = x2 - jnp.asarray(1, _u32)
    v = jnp.where(ok1, r1, r2) // scaling
    x_out = jnp.where(ok1, x1, x2)
    tainted = ~ok1 & (r2 >= past)
    return v, x_out, tainted


def uniform_int_fast_maybe(x, uerange, do_draw):
    """uniform_int_fast that leaves the stream untouched when not drawing."""
    v, x_new, tainted = uniform_int_fast(x, jnp.maximum(uerange, 1))
    return (jnp.where(do_draw, v, jnp.asarray(0, _u32)),
            jnp.where(do_draw, x_new, x),
            do_draw & tainted)
