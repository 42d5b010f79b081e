"""Sharded rollout runner: the multi-chip replacement for ThreadedRunner.

The reference's ThreadedRunner<N> statically partitions envs across pinned
threads and fans out STEP/SAMPLE commands over SPSC queues (reference:
include/runner.h:13-134). Here the partition is a sharded batch axis over a
`Mesh`, the command fan-out is SPMD program dispatch, and the spin-wait sync
is replaced by XLA's dataflow: one jitted `train_step`/`rollout` runs the
whole slice in lockstep, with `psum` reductions over the mesh axes standing
in for the shared-memory result buffers (the "learner feed").
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core import engine as E
from ..vec import _batch_select
from .mesh import ENV_AXES, env_sharding, replicated

_vstep = jax.vmap(E.step_env)
_vreset = jax.vmap(E.reset_env)


def _local_rollout_body(s, rngs, mask_src):
    if mask_src == "storage":
        masks = jnp.take_along_axis(
            s.storage_masks, s.agent[:, None, None], axis=1)[:, 0]
    else:
        masks = s.sel_mask
    actions, rngs, tainted = jax.vmap(E.sample_action)(rngs, masks)
    s = _vstep(s, actions)
    s = s._replace(rng_tainted=s.rng_tainted | tainted)
    done = s.done
    s = jax.lax.cond(jnp.any(done),
                     lambda x: _batch_select(done, _vreset(x), x),
                     lambda x: x, s)
    return s, rngs, done


def sharded_rollout(mesh: Mesh, states, sampler_rngs, n_steps: int,
                    mask_src: str = "storage"):
    """n_steps of lockstep sample+step+auto-reset over the sharded env batch,
    plus a psum-reduced stats feed (episodes finished, summed returns) — the
    pattern a sharded learner consumes instead of the reference's
    shared-memory observation views.

    Returns (states, sampler_rngs, stats) with stats replicated on every
    device: {"episodes": i32, "return_sum": f32, "steps": i32}.
    """
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(ENV_AXES), P(ENV_AXES)),
        out_specs=(P(ENV_AXES), P(ENV_AXES), P()),
        check_vma=False)
    def run(states, rngs):
        def body(carry, _):
            s, r, eps, ret = carry
            s, r, done = _local_rollout_body(s, r, mask_src)
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

    return run(states, sampler_rngs)


class ShardedRunner:
    """Stateful facade over sharded_rollout mirroring the reference runner's
    step/sample/sync surface (reference: include/runner.h:93-100): `step()`
    dispatches asynchronously (XLA async dispatch replaces the SPSC queues),
    `sync()` blocks on the result."""

    def __init__(self, mesh: Mesh, n_envs: int, mask_src: str = "storage"):
        from ..vec import sampler_init, vec_reset
        self.mesh = mesh
        self.n_envs = n_envs
        self.mask_src = mask_src
        self._vec_reset = vec_reset
        self._sampler_init = sampler_init
        self.states = None
        self.sampler_rngs = None
        self._pending = None

    def reset(self, seed=0, n_players=4, n_pieces=3, difficulty=0,
              max_steps=100000, sampler_seed=42):
        from .mesh import shard_envs
        self.states = shard_envs(
            self._vec_reset(seed, self.n_envs, n_players, n_pieces,
                            difficulty, max_steps), self.mesh)
        rngs = self._sampler_init(sampler_seed, self.n_envs)
        self.sampler_rngs = jax.device_put(rngs, env_sharding(self.mesh))

    def step(self, n_steps: int = 1):
        """Async: dispatches the sharded rollout and returns immediately
        (device work proceeds; results materialise on sync())."""
        self._pending = sharded_rollout(self.mesh, self.states,
                                        self.sampler_rngs, n_steps,
                                        self.mask_src)
        self.states, self.sampler_rngs, stats = self._pending
        return stats

    def sync(self):
        if self._pending is not None:
            jax.block_until_ready(self._pending[0].rng)
        return self.states
