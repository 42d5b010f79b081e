"""Fused Pallas step kernel == XLA step path, bit for bit.

Runs in interpreter mode on CPU (the TPU compile path is exercised by the
benchmark harness); the two paths share the same traced game logic by
construction, so this guards the kernel plumbing: state flattening, constant
hoisting, ball-cell pregather wiring, and block partitioning.
"""
import functools

import jax
import numpy as np
import pytest

from eldorado_tpu.core import engine as E
from eldorado_tpu.ops.step_kernel import make_fused_step
from eldorado_tpu.vec import _active_mask, sampler_init, vec_reset


@functools.partial(jax.jit, static_argnums=(2,))
def xla_step(s, r, mask_src="storage"):
    # jitted: the eager form dispatched the ~3k-op step per call
    # (measured 7 s/call on CPU, 161 s for the first)
    a, r, t = jax.vmap(E.sample_action)(r, _active_mask(s, mask_src))
    s = jax.vmap(E.step_env)(s, a)
    return s._replace(rng_tainted=s.rng_tainted | t), r, a


# the sel-mask source shares all kernel plumbing with storage; its
# interpret-mode replay costs ~30 s, so it rides the -m slow lane
@pytest.mark.parametrize(
    "mask_src",
    ["storage", pytest.param("sel", marks=pytest.mark.slow)])
def test_kernel_matches_xla(mask_src):
    n = 8
    states = vec_reset(3, n, 4, 1, 0, 100000)
    srngs = sampler_init(7, n)
    fused = jax.jit(make_fused_step(states, mask_src, block=8,
                                    interpret=True))
    s1, r1 = states, srngs
    s2, r2 = states, srngs
    for t in range(10):
        s1, r1, a1 = fused(s1, r1)
        s2, r2, a2 = xla_step(s2, r2, mask_src)
        assert np.array_equal(np.asarray(a1), np.asarray(a2)), f"actions t={t}"
        for name in E.EnvState._fields:
            assert np.array_equal(np.asarray(getattr(s1, name)),
                                  np.asarray(getattr(s2, name))), \
                f"t={t}: {name}"


def test_kernel_block_partitioning():
    """Multiple grid blocks produce the same result as one block."""
    n = 16
    states = vec_reset(11, n, 2, 3, 1, 100000)
    srngs = sampler_init(5, n)
    f_one = jax.jit(make_fused_step(states, "storage", block=16,
                                    interpret=True))
    f_two = jax.jit(make_fused_step(states, "storage", block=8,
                                    interpret=True))
    s1, r1, a1 = f_one(states, srngs)
    s2, r2, a2 = f_two(states, srngs)
    assert np.array_equal(np.asarray(a1), np.asarray(a2))
    assert np.array_equal(np.asarray(r1), np.asarray(r2))
    for name in E.EnvState._fields:
        assert np.array_equal(np.asarray(getattr(s1, name)),
                              np.asarray(getattr(s2, name))), name
