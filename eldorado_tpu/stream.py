"""Per-step learner feed: packed trajectory records off the kernel scan.

The reference's entire product is observation views the algorithm reads
*every step*: zero-copy ``observations`` / ``selected_action_masks``
numpy properties refreshed in place and consumed per iteration
(reference: include/pybind/vectorized.h:60-150, pytest/test_vec_env.py:
97-112). The TPU-native equivalent cannot be a host pointer — the state
lives in HBM — so the high-throughput path emits, from inside the
blocked Pallas step-kernel scan, one packed 5-word record per env per
step carrying everything a policy conditions on / trains off:

    word0  action (5 sub-actions x 5 bits) | done<<25 | agent<<26
           | phase<<28
    word1  rewards (4 players x 4-bit two's complement; zero-sum values
           lie in [-4, 4]) | machete<<16 (3b) | paddle<<19 (3b)
           | round(2*coins)<<22 (10b, clamped — coins never near 511 in
           real play)
    word2..4  the selected-action mask's 3 packed words
           (engine.pack_mask layout; index 92 bits via engine.unpack_mask)

All fields are POST-step state (the mask/resources/phase presented for
the NEXT action), matching the reference driver's read-after-step
ordering; ``action`` and ``rewards`` belong to the step itself. Records
flow device -> host -> native TrajectoryRing (lock-free SPSC,
native/obs_abi.cpp) -> consumer thread; see ``stream_rollout`` and
``RingConsumer``.
"""
from __future__ import annotations

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

RECORD_WORDS = 5


def pack_step_blocked(bact, bdone, brew, bagent, bsel, bres, bphase):
    """Blocked per-step leaves -> (nb, 5, block) i32 packed records.

    Inputs are the kernel scan's blocked layouts: bact (nb,5,block) i32,
    bdone/bagent/bphase (nb,1,block) i32, brew (nb,4,block) f32,
    bsel (nb,3,block) i32, bres (nb,3,block) f32.
    """
    i32 = jnp.int32
    w0 = jnp.zeros_like(bdone)
    for i in range(5):
        w0 = w0 | (bact[:, i:i + 1] << (5 * i))
    w0 = (w0 | (bdone << 25) | (bagent << 26) | (bphase << 28))

    rew = jnp.round(brew).astype(i32)              # integers in [-4, 4]
    w1 = jnp.zeros_like(bdone)
    for i in range(4):
        w1 = w1 | ((rew[:, i:i + 1] & 0xF) << (4 * i))
    mach = jnp.clip(jnp.round(bres[:, 0:1]).astype(i32), 0, 7)
    padd = jnp.clip(jnp.round(bres[:, 1:2]).astype(i32), 0, 7)
    coin2 = jnp.clip(jnp.round(bres[:, 2:3] * 2.0).astype(i32), 0, 1023)
    w1 = w1 | (mach << 16) | (padd << 19) | (coin2 << 22)

    return jnp.concatenate([w0, w1, bsel], axis=1)


def unpack_records(buf):
    """(..., 5) i32 records -> dict of planar fields (numpy).

    Returns actions (...,5) u8, done bool, agent u8, phase u8,
    rewards (...,4) i8, resources (...,3) f32, sel_words (...,3) i32.
    """
    buf = np.asarray(buf)
    w0 = buf[..., 0]
    w1 = buf[..., 1]
    actions = np.stack([(w0 >> (5 * i)) & 31 for i in range(5)],
                       axis=-1).astype(np.uint8)
    done = ((w0 >> 25) & 1).astype(bool)
    agent = ((w0 >> 26) & 3).astype(np.uint8)
    phase = ((w0 >> 28) & 3).astype(np.uint8)
    rew4 = np.stack([(w1 >> (4 * i)) & 0xF for i in range(4)], axis=-1)
    rewards = (rew4.astype(np.int8) << 4 >> 4)     # sign-extend 4 bits
    resources = np.stack(
        [((w1 >> 16) & 7).astype(np.float32),
         ((w1 >> 19) & 7).astype(np.float32),
         ((w1 >> 22) & 0x3FF).astype(np.float32) * 0.5], axis=-1)
    return {"actions": actions, "done": done, "agent": agent,
            "phase": phase, "rewards": rewards, "resources": resources,
            "sel_words": buf[..., 2:5]}


class RingConsumer(threading.Thread):
    """Consumer thread draining a TrajectoryRing of packed records.

    Pops fixed-size blocks of ``steps_per_push`` steps x n_envs x 5
    words, calls ``fn(records)`` on each (records viewed i32,
    shape (steps_per_push, n, 5)); counts records and keeps a rolling
    xor checksum so the demo path can assert data actually moved.
    """

    def __init__(self, ring, steps_per_push: int, n_envs: int, fn=None):
        super().__init__(daemon=True)
        self.ring = ring
        self.spp = steps_per_push
        self.n = n_envs
        self.fn = fn
        self.records = 0
        self.checksum = np.int64(0)
        self._stopping = threading.Event()

    def run(self):
        while True:
            buf = self.ring.pop()
            if buf is None:
                if self._stopping.is_set():
                    return
                time.sleep(0.0005)
                continue
            rec = buf.view(np.int32).reshape(self.spp, self.n,
                                             RECORD_WORDS)
            self.records += self.spp * self.n
            flat = rec.reshape(-1)
            self.checksum ^= np.bitwise_xor.reduce(
                flat.view(np.int64) if flat.size % 2 == 0
                else flat.astype(np.int64))
            if self.fn is not None:
                self.fn(rec)

    def finish(self):
        self._stopping.set()
        self.join()


def device_stats_init():
    """Carry for the demo on-device consumer: (steps, done_steps,
    return_sum, action_histogram[5][22]). done_steps counts per-step
    done flags (a finished env stays done while dead-stepping to its
    reset boundary, so this exceeds the episode count); return_sum is
    zero by construction on full batches (the game is zero-sum)."""
    return (jnp.int32(0), jnp.int32(0), jnp.float32(0.0),
            jnp.zeros((5, 22), jnp.int32))


def device_stats_fn(carry, traj):
    """Demo ON-DEVICE learner-feed consumer: folds one chunk's blocked
    records (T, nb, 5, block) into running statistics — the pattern a
    JAX learner uses to train off the feed without the data ever leaving
    HBM (the TPU-native replacement for the reference's host-side
    observation views). Jitted per chunk by ``stream_rollout``."""
    steps, eps, ret, hist = carry
    w0 = traj[:, :, 0]
    w1 = traj[:, :, 1]
    done = (w0 >> 25) & 1
    steps = steps + jnp.int32(traj.shape[0]) * jnp.int32(
        traj.shape[1] * traj.shape[3])
    eps = eps + jnp.sum(done)
    # sign-extended 4-bit rewards, summed over players where done
    for i in range(4):
        r = ((w1 >> (4 * i)) & 0xF).astype(jnp.int32)
        r = jnp.where(r >= 8, r - 16, r)
        ret = ret + jnp.sum(jnp.where(done != 0, r, 0).astype(jnp.float32))
    for h in range(5):
        a = (w0 >> (5 * h)) & 31
        oh = a[..., None] == jnp.arange(22)
        hist = hist.at[h].add(jnp.sum(oh.astype(jnp.int32),
                                      axis=(0, 1, 2)))
    return (steps, eps, ret, hist)


def stream_rollout(states, sampler_rngs, n_steps: int, chunk: int = 1500,
                   mask_src: str = "storage", block: int = 1024,
                   interpret: bool = False, ring=None,
                   steps_per_push: int = 100, consume=None,
                   deliver: str = "ring", device_fn=None,
                   device_carry=None, exact: bool = False):
    """High-throughput rollout that DELIVERS the per-step feed.

    Same auto-reset semantics as ``rollout_chunked(backend="kernel",
    reset_mode="sync")`` — on-device queued resets at chunk boundaries —
    plus per-chunk delivery of the packed (chunk, n, 5) records:

    * ``deliver="ring"``: the record buffer is fetched to the host and
      pushed into ``ring`` (a native ``TrajectoryRing``; created here
      when None) in blocks of ``steps_per_push`` steps while the device
      runs the NEXT chunk (XLA async dispatch overlaps the fetch with
      compute); a ``RingConsumer`` (wrapping ``consume``) drains it
      concurrently. Returns (states, rngs, episodes, consumer), the
      consumer ``finish()``ed with ``.records``/``.checksum`` filled.
      Delivery rate is bounded by the device->host link (PCIe-class
      hosts sustain the full rate; this environment's network tunnel
      measures ~9-16 MB/s, capping delivered throughput — see
      docs/performance.md).
    * ``deliver="device"``: no host transfer — ``device_fn(carry,
      traj_blocked)`` (default: ``device_stats_fn``) is jitted and
      folded over each chunk's blocked (chunk, nb, 5, block) records ON
      DEVICE, the way a co-located JAX learner consumes the feed.
      Returns (states, rngs, episodes, device_carry).

    ``exact=True`` uses the frozen-finisher mode (engine
    fused_sample_step gate_dead): finished envs consume no sampler
    draws until their reset lands, so per-env record sequences with
    dead steps excluded are bit-exact vs the reference's continuous
    same-step auto-reset streams (a dead step repeats the frozen
    post-episode record with done=1; consumers drop them via the done
    flag). The last tuple element gains the dead-step count.
    """
    from . import vec as V
    from .errors import GenerateMapFailure, MapCapacityError
    n = int(states.rng.shape[0])
    progs = V._kernel_programs(states, mask_src, block, interpret,
                               gate_dead=exact)
    if deliver == "ring":
        assert chunk % steps_per_push == 0, (chunk, steps_per_push)
        if ring is None:
            from .native import TrajectoryRing
            cap = max(4, 4 * chunk // steps_per_push)
            ring = TrajectoryRing(steps_per_push * n * RECORD_WORDS * 4,
                                  cap)
        consumer = RingConsumer(ring, steps_per_push, n, consume)
        consumer.start()
    else:
        assert deliver == "device", deliver
        if device_fn is None:
            device_fn = device_stats_fn
            device_carry = device_stats_init()
        device_fn = jax.jit(device_fn, donate_argnums=(0,))

    bctx, bdyn, brngs = progs.block_in(states, sampler_rngs)
    qstate = progs.qstate_init()
    n_chunks = max(1, n_steps // chunk)
    pending = None            # device (chunk, n, 5) buffer in flight
    for _ in range(n_chunks):
        bdyn, brngs, qstate, any_new, resetq, traj = progs.run_q(
            bctx, bdyn, brngs, qstate, chunk, "packed")
        if bool(any_new):
            bdyn, bctx, states, qstate = progs.apply_q(
                bdyn, bctx, states, qstate, progs.reset_q_dev(resetq))
        if deliver == "device":
            device_carry = device_fn(device_carry, traj)
        else:
            if pending is not None:
                _drain(pending, ring, steps_per_push)
            pending = progs.unblock_packed(traj)  # async device transpose
    if deliver == "ring" and pending is not None:
        _drain(pending, ring, steps_per_push)

    counters = np.asarray(qstate[1])
    episodes = int(counters[0])
    states, sampler_rngs = progs.unblock(states, bdyn, brngs)
    if counters[2]:
        raise MapCapacityError("stream: map generation overflowed")
    if counters[1]:
        raise GenerateMapFailure("stream: map generation failed")
    if np.asarray(states.done).any():
        states, k = V.reset_done_bucketed(states)
        episodes += k
    sink = device_carry if deliver == "device" else None
    if deliver == "ring":
        consumer.finish()
        sink = consumer
    if exact:
        return states, sampler_rngs, episodes, sink, int(counters[3])
    return states, sampler_rngs, episodes, sink


def _drain(dev_buf, ring, steps_per_push):
    """Fetch one chunk's (chunk, n, 5) device buffer and push it into
    the ring in steps_per_push blocks (spinning briefly when full)."""
    host = np.asarray(dev_buf)
    T = host.shape[0]
    for t0 in range(0, T, steps_per_push):
        blockv = host[t0:t0 + steps_per_push]
        while not ring.push(blockv):
            time.sleep(0.0005)            # consumer is draining
