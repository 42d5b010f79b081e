"""Sharded rollout runner: the multi-chip replacement for ThreadedRunner.

The reference's ThreadedRunner<N> statically partitions envs across pinned
threads and fans out STEP/SAMPLE commands over SPSC queues (reference:
include/runner.h:13-134). Here the partition is a sharded batch axis over a
`Mesh`, the command fan-out is SPMD program dispatch, and the spin-wait sync
is replaced by XLA's dataflow: one jitted program runs the whole slice in
lockstep, with `psum` reductions over the mesh axes standing in for the
shared-memory result buffers (the "learner feed").

Every program is built exactly once per (mesh, n_steps, mask_src) — repeat
`step()`/`sample()` calls dispatch the cached executable with no retrace
(`_trace_count` observably stops increasing; asserted in
tests/test_parallel.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core import engine as E
from ..vec import _batch_select
from .mesh import ENV_AXES, env_sharding, replicated, shard_envs

_vstep = jax.vmap(E.step_env)
_vreset = jax.vmap(E.reset_env)

# incremented once per program trace; a cache-hit dispatch leaves it alone
_trace_count = [0]


def _masks(s, mask_src):
    if mask_src == "storage":
        return E.unpack_mask(jnp.take_along_axis(
            s.storage_masks, s.agent[:, None, None], axis=1)[:, 0])
    return s.sel_mask


def _local_rollout_body(s, rngs, mask_src):
    actions, rngs, tainted = jax.vmap(E.sample_action)(
        rngs, _masks(s, mask_src))
    s = _vstep(s, actions)
    s = s._replace(rng_tainted=s.rng_tainted | tainted)
    done = s.done
    s = jax.lax.cond(jnp.any(done),
                     lambda x: _batch_select(done, _vreset(x), x),
                     lambda x: x, s)
    return s, rngs, actions, done


@functools.lru_cache(maxsize=None)
def _build_rollout(mesh: Mesh, n_steps: int, mask_src: str):
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(ENV_AXES), P(ENV_AXES)),
        out_specs=(P(ENV_AXES), P(ENV_AXES), P()),
        check_vma=False)
    def run(states, rngs):
        _trace_count[0] += 1

        def body(carry, _):
            s, r, eps, ret = carry
            s, r, _, done = _local_rollout_body(s, r, mask_src)
            eps = eps + jnp.sum(done, dtype=jnp.int32)
            ret = ret + jnp.sum(jnp.where(done[:, None], s.rewards, 0.0))
            return (s, r, eps, ret), ()

        (states, rngs, eps, ret), _ = jax.lax.scan(
            body, (states, rngs, jnp.int32(0), jnp.float32(0.0)), None,
            length=n_steps)
        # collectives ride the mesh axes (ICI within a host, DCN across)
        eps = jax.lax.psum(eps, ENV_AXES)
        ret = jax.lax.psum(ret, ENV_AXES)
        stats = {"episodes": eps, "return_sum": ret,
                 "steps": jnp.int32(n_steps)}
        return states, rngs, stats

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _build_sample(mesh: Mesh, mask_src: str):
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(ENV_AXES), P(ENV_AXES)),
        out_specs=(P(ENV_AXES), P(ENV_AXES), P(ENV_AXES)),
        check_vma=False)
    def run(states, rngs):
        _trace_count[0] += 1
        actions, rngs, tainted = jax.vmap(E.sample_action)(
            rngs, _masks(states, mask_src))
        return actions, rngs, tainted

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _build_step(mesh: Mesh):
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(ENV_AXES), P(ENV_AXES)),
        out_specs=P(ENV_AXES),
        check_vma=False)
    def run(states, actions):
        _trace_count[0] += 1
        s = _vstep(states, actions)
        done = s.done
        return jax.lax.cond(jnp.any(done),
                            lambda x: _batch_select(done, _vreset(x), x),
                            lambda x: x, s)

    return jax.jit(run)


def sharded_rollout(mesh: Mesh, states, sampler_rngs, n_steps: int,
                    mask_src: str = "storage"):
    """n_steps of lockstep sample+step+auto-reset over the sharded env batch,
    plus a psum-reduced stats feed (episodes finished, summed returns) — the
    pattern a sharded learner consumes instead of the reference's
    shared-memory observation views.

    Returns (states, sampler_rngs, stats) with stats replicated on every
    device: {"episodes": i32, "return_sum": f32, "steps": i32}.
    """
    return _build_rollout(mesh, n_steps, mask_src)(states, sampler_rngs)


class ShardedRunner:
    """Stateful facade mirroring the reference runner's contract
    (reference: include/runner.h:93-100, pybind/vectorized.h:154-160):
    `sample()` fills the persistent actions buffer from the current masks,
    `step()` applies it asynchronously (XLA async dispatch replaces the SPSC
    queues), `sync()` blocks, `step_sync()` = step + sync. `rollout(n)` is
    the high-throughput fused driver with the psum stats feed."""

    def __init__(self, mesh: Mesh, n_envs: int, mask_src: str = "storage"):
        from ..vec import sampler_init, vec_reset
        self.mesh = mesh
        self.n_envs = n_envs
        self.mask_src = mask_src
        self._vec_reset = vec_reset
        self._sampler_init = sampler_init
        self.states = None
        self.sampler_rngs = None
        self.actions = None
        self._pending = None

    def reset(self, seed=0, n_players=4, n_pieces=3, difficulty=0,
              max_steps=100000, sampler_seed=42):
        self.states = shard_envs(
            self._vec_reset(seed, self.n_envs, n_players, n_pieces,
                            difficulty, max_steps), self.mesh)
        rngs = self._sampler_init(sampler_seed, self.n_envs)
        self.sampler_rngs = jax.device_put(rngs, env_sharding(self.mesh))
        # null actions until the first sample() — matches the reference's
        # zero-initialised persistent actions array (vec_sampler.h:7-28)
        self.actions = jax.device_put(
            jnp.zeros((self.n_envs, 5), jnp.uint8),
            env_sharding(self.mesh))

    def sample(self):
        """Fill the persistent actions buffer (reference runner.h:87-94
        SAMPLE broadcast)."""
        self.actions, self.sampler_rngs, tainted = _build_sample(
            self.mesh, self.mask_src)(self.states, self.sampler_rngs)
        self.states = self.states._replace(
            rng_tainted=self.states.rng_tainted | tainted)
        return self.actions

    def step(self):
        """One lockstep env step applying the current actions buffer;
        returns immediately (async dispatch)."""
        self.states = _build_step(self.mesh)(self.states, self.actions)
        self._pending = self.states
        return self.states.done

    def step_sync(self):
        done = self.step()
        self.sync()
        return done

    def rollout(self, n_steps: int):
        """Fused sample+step scan; returns the replicated stats feed."""
        self.states, self.sampler_rngs, stats = sharded_rollout(
            self.mesh, self.states, self.sampler_rngs, n_steps,
            self.mask_src)
        self._pending = self.states
        return stats

    def sync(self):
        if self._pending is not None:
            jax.block_until_ready(self._pending.rng)
            self._pending = None
        return self.states
