"""Pallas TPU kernel: imagined rollout with VMEM-resident ensemble weights.

The XLA scan path re-streams the K-member ensemble weights from HBM on
EVERY rollout step (~21 MB/step fp32 at half-cheetah scale), which bounds
throughput at reference batch sizes.  This kernel keeps ALL weights —
policy MLP + K dynamics members (bf16) — pinned in VMEM across the whole
T-step loop and writes per-step trajectory slices back to HBM with async
DMA, so the hot loop touches HBM only for outputs.

Design notes:
  - particle batch B = K * BLOCK, BLOCK a multiple of the sublane tile;
  - no concat/scatter in the hot loop: the dynamics first layer is split
    into a state part and an action part, xu_norm @ W1 ==
    x_norm @ W1_state + a_norm @ W1_action (ignored inputs — ignore_x /
    ignore_xy — are zero rows of W1_state);
  - member randomization: per-step uniform roll r_t of the particle axis;
    member m processes rows [m*BLOCK, (m+1)*BLOCK) of the rolled batch, so
    each particle's member each step is uniformly random (marginally
    identical to the reference's step_rand, env_helpers.py:617-620);
  - reward specializes to velocity-index costs
    (-clip(x'[vel] - c * sum(u^2), -r, r)): the swimmer / snake /
    half-cheetah / walker family.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


class RolloutSpec(NamedTuple):
    n_states: int
    n_actions: int
    hidden: int            # dynamics hidden width (2 hidden layers)
    n_models: int
    block: int             # particles per member per step
    T: int
    pol_hidden: int        # policy hidden width (2 hidden layers)
    vel_idx: int
    ctrl_coeff: float
    reward_clip: float     # clip reward to [-c, c]; 0 = no clip

    @property
    def batch(self):
        return self.n_models * self.block

    @property
    def s_pad(self):
        return _round_up(self.n_states, LANE)

    @property
    def a_pad(self):
        return _round_up(self.n_actions, LANE)

    @property
    def ph_pad(self):
        return _round_up(self.pol_hidden, LANE)


def _hash_bits(shape, seed, salt):
    """Counter-based uint32 bits: murmur3-finalizer over a per-element
    counter mixed with (seed, salt).  Deterministic, stateless, identical
    under the TPU compiler and the interpreter (pltpu.prng_random_bits is
    a zero-stub in interpret mode, so we avoid it)."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    # int32 -> uint32 reinterpret (Mosaic has no int->uint convert rule)
    seed_u = pltpu.bitcast(jnp.broadcast_to(seed, (1, 1)), jnp.uint32)[0, 0]
    salt_u = pltpu.bitcast(jnp.broadcast_to(salt, (1, 1)), jnp.uint32)[0, 0]
    h = (r * jnp.uint32(0x9E3779B9) + c * jnp.uint32(0x85EBCA6B)
         + seed_u * jnp.uint32(0xC2B2AE35)
         + salt_u * jnp.uint32(0x27D4EB2F))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _uniform_from_bits(bits):
    """(0, 1] floats without an integer->float convert (unsupported in
    Mosaic): keep 23 random mantissa bits, OR in the exponent of 1.0,
    bitcast to float32 in [1, 2), and map to (0, 1]."""
    mantissa = bits >> 9
    f = pltpu.bitcast(mantissa | jnp.uint32(0x3F800000), jnp.float32)
    return 2.0 - f  # (0, 1]


def _gaussian(shape, seed, salt):
    """Box-Muller on counter-based bits."""
    u1 = _uniform_from_bits(_hash_bits(shape, seed, 2 * salt))
    u2 = _uniform_from_bits(_hash_bits(shape, seed, 2 * salt + 1))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * jnp.pi * u2)


def _rollout_kernel(spec: RolloutSpec,
                    # scalar prefetch
                    seed_ref, shifts_ref,
                    # inputs (VMEM)
                    x0_ref,                     # (B, S_PAD) f32
                    pw1_ref, pw2_ref, pw3_ref,  # policy weights f32
                    pb_ref,                     # (8, PH_PAD) rows 0,1 = b1,b2
                    pb3_ref,                    # (8, A_PAD) rows: 0 b3, 1 logstd
                    w1s_ref, w1a_ref,           # (K, S_PAD, H), (K, A_PAD, H) bf16
                    w2_ref, w3_ref,             # (K, H, H), (K, H, S_PAD) bf16
                    # biases arrive pre-broadcast over the block dim: Mosaic
                    # cannot sublane-broadcast a (K, 1, H) slice inside the
                    # 3-D batched add (Check failed: limits[i] <= dim(i),
                    # BLK/8 vs 1 — seen on hardware, invisible in interpret
                    # mode), so the host packs full (K, BLK, .) arrays and
                    # the kernel adds shape-to-shape
                    db1_ref, db2_ref,           # (K, BLK, H) f32
                    db3_ref,                    # (K, BLK, S_PAD) f32
                    norm_ref,                   # (8, S_PAD) f32 rows:
                    #  0 in_mean_s, 1 in_invstd_s, 2 diff_mean, 3 diff_std
                    anorm_ref,                  # (8, A_PAD) rows: 0 mean, 1 invstd
                    # outputs (HBM)
                    obs_hbm, act_hbm, mean_hbm, rew_hbm,
                    # scratch
                    x_ref, nxt_ref, out_scratch, sem):
    K, BLK, T = spec.n_models, spec.block, spec.T
    B = spec.batch
    S, A = spec.n_states, spec.n_actions

    x_ref[:] = x0_ref[:]
    seed = seed_ref[0]

    def step(t, _):
        x = x_ref[:]                                  # (B, S_PAD) f32

        # ---- policy forward (f32, tiny) ----
        h = jnp.tanh(jnp.dot(x, pw1_ref[:],
                             preferred_element_type=jnp.float32) + pb_ref[0])
        h = jnp.tanh(jnp.dot(h, pw2_ref[:],
                             preferred_element_type=jnp.float32) + pb_ref[1])
        mean = jnp.dot(h, pw3_ref[:],
                       preferred_element_type=jnp.float32) + pb3_ref[0]
        noise = _gaussian(mean.shape, seed, t) * jnp.exp(pb3_ref[1])
        a = jnp.clip(mean + noise, -1.0, 1.0)         # (B, A_PAD)
        lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
        a = jnp.where(lane < A, a, 0.0)
        mean_masked = jnp.where(lane < A, mean, 0.0)

        # ---- member randomization: roll particles by a random shift ----
        shift = shifts_ref[t]
        x_rolled = pltpu.roll(x, shift, 0)
        a_rolled = pltpu.roll(a, shift, 0)

        # ---- normalized inputs (padding lanes have inv_std 0 -> 0) ----
        x_n = ((x_rolled - norm_ref[0]) * norm_ref[1]).astype(jnp.bfloat16)
        a_n = ((a_rolled - anorm_ref[0]) * anorm_ref[1]).astype(jnp.bfloat16)

        # ---- K dynamics members in ONE batched matmul per layer ----
        # The serial per-member chain left the MXU idle between 128-row
        # matmuls (round-1 bench: 6.35M vs the scan's 9.06M steps/s).
        # A K-batch dot_general gives Mosaic K independent tiles per
        # layer to pipeline, so the systolic array stays fed.
        diff_mean = norm_ref[2]
        diff_std = norm_ref[3]
        bdims = (((2,), (1,)), ((0,), (0,)))  # (K,BLK,I) @ (K,I,O)
        xb = x_n.reshape(K, BLK, x_n.shape[1])
        ab = a_n.reshape(K, BLK, a_n.shape[1])
        pre1 = (jax.lax.dot_general(xb, w1s_ref[:], bdims,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(ab, w1a_ref[:], bdims,
                                      preferred_element_type=jnp.float32)
                + db1_ref[:])
        h1 = jnp.maximum(pre1, 0.0).astype(jnp.bfloat16)
        h2 = jnp.maximum(
            jax.lax.dot_general(h1, w2_ref[:], bdims,
                                preferred_element_type=jnp.float32)
            + db2_ref[:], 0.0).astype(jnp.bfloat16)
        out = (jax.lax.dot_general(h2, w3_ref[:], bdims,
                                   preferred_element_type=jnp.float32)
               + db3_ref[:])
        nxt_ref[:] = (diff_mean + diff_std * out.reshape(B, out.shape[2])
                      + x_rolled)

        x_next = pltpu.roll(nxt_ref[:], -shift, 0)    # un-roll particle order
        slane = jax.lax.broadcasted_iota(jnp.int32, x_next.shape, 1)
        x_next = jnp.where(slane < S, x_next, 0.0)

        # ---- reward: -clip? (vel - c * sum(u^2)) ----
        ctrl = spec.ctrl_coeff * jnp.sum(jnp.square(a), axis=1, keepdims=True)
        vel = jnp.sum(jnp.where(slane == spec.vel_idx, x_next, 0.0),
                      axis=1, keepdims=True)
        r = vel - ctrl
        if spec.reward_clip > 0:
            r = jnp.clip(r, -spec.reward_clip, spec.reward_clip)

        # ---- stage outputs and DMA the time-slice to HBM ----
        # double-buffered: slot t%2 is written and its DMA started; the
        # wait happens one iteration later, so the copies overlap the next
        # step's compute instead of serializing against it.
        slot = jax.lax.rem(t, 2)

        def _wait_prev():
            for i, dst in enumerate((obs_hbm, act_hbm, mean_hbm, rew_hbm)):
                pltpu.make_async_copy(
                    out_scratch.at[slot, i, :, : dst.shape[2]],
                    dst.at[t - 2], sem.at[slot, i]).wait()

        @pl.when(t >= 2)
        def _():
            _wait_prev()

        out_scratch[slot, 0, :, :] = x
        out_scratch[slot, 1, :, : spec.a_pad] = a
        out_scratch[slot, 2, :, : spec.a_pad] = mean_masked
        out_scratch[slot, 3, :, :] = jnp.broadcast_to(
            r, (B, out_scratch.shape[3]))

        for i, dst in enumerate((obs_hbm, act_hbm, mean_hbm, rew_hbm)):
            pltpu.make_async_copy(
                out_scratch.at[slot, i, :, : dst.shape[2]], dst.at[t],
                sem.at[slot, i]).start()

        x_ref[:] = x_next
        return 0

    jax.lax.fori_loop(0, T, step, 0)

    # drain the last two slots' DMAs
    for last_t in (T - 2, T - 1):
        if last_t >= 0:
            slot = last_t % 2
            for i, dst in enumerate((obs_hbm, act_hbm, mean_hbm, rew_hbm)):
                pltpu.make_async_copy(
                    out_scratch.at[slot, i, :, : dst.shape[2]], dst.at[last_t],
                    sem.at[slot, i]).wait()


def build_resident_rollout(spec: RolloutSpec, interpret: bool = False):
    """Returns call(*packed_inputs) -> (obs, actions, means, rewards),
    each (T, B, padded)."""
    B = spec.batch
    T = spec.T

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 15,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        scratch_shapes=[
            pltpu.VMEM((B, spec.s_pad), jnp.float32),
            pltpu.VMEM((B, spec.s_pad), jnp.float32),
            pltpu.VMEM((2, 4, B, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )

    out_shapes = [
        jax.ShapeDtypeStruct((T, B, spec.s_pad), jnp.float32),   # obs
        jax.ShapeDtypeStruct((T, B, spec.a_pad), jnp.float32),   # actions
        jax.ShapeDtypeStruct((T, B, spec.a_pad), jnp.float32),   # means
        jax.ShapeDtypeStruct((T, B, LANE), jnp.float32),         # rewards
    ]

    # interpret=True uses the TPU-emulating interpreter so pltpu prims
    # (prng_seed, roll, DMA) work on CPU.
    interp = pltpu.InterpretParams() if interpret else False
    return pl.pallas_call(
        functools.partial(_rollout_kernel, spec),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # resident weights intentionally fill VMEM past the default
            # 16MB scoped limit; v5e has headroom above it
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interp,
    )


def rollout_to_imagined_batch(spec: RolloutSpec, policy_params: dict,
                              outputs) -> "ImaginedBatch":
    """Adapt kernel outputs (obs, actions, means, rewards — (T, B, pad))
    to the framework's ImaginedBatch contract (B, T, .) for the TRPO/VPG
    update programs."""
    from metrpo_tpu.imagine import ImaginedBatch

    obs, acts, means, rews = outputs
    S, A = spec.n_states, spec.n_actions
    tr = lambda x: jnp.swapaxes(x, 0, 1)
    obs = tr(obs[:, :, :S])
    acts = tr(acts[:, :, :A])
    means = tr(means[:, :, :A])
    rewards = tr(rews[:, :, 0])
    B, T = rewards.shape
    logstds = jnp.broadcast_to(policy_params["logstd"], (B, T, A))
    return ImaginedBatch(
        observations=obs, actions=acts, means=means, logstds=logstds,
        rewards=rewards, valids=jnp.ones((B, T)),
    )


# ---------------------------------------------------------------------------
# Parameter packing from framework pytrees
# ---------------------------------------------------------------------------


def pack_inputs(spec: RolloutSpec, policy_params: dict, ens_params: dict,
                input_stats, diff_stats, init_states, seed: int, key):
    """Pack framework pytrees into the kernel's padded layouts."""
    B = spec.batch
    S, A, H, K = spec.n_states, spec.n_actions, spec.hidden, spec.n_models

    def pad2(x, r, c):
        out = np.zeros((r, c), np.float32)
        x = np.asarray(x, np.float32)
        out[: x.shape[0], : x.shape[1]] = x
        return out

    pw = policy_params["w"]
    pbs = policy_params["b"]
    pw1 = pad2(pw[0], spec.s_pad, spec.ph_pad)
    pw2 = pad2(pw[1], spec.ph_pad, spec.ph_pad)
    pw3 = pad2(pw[2], spec.ph_pad, spec.a_pad)
    pb = np.zeros((8, spec.ph_pad), np.float32)
    pb[0, : len(np.asarray(pbs[0]))] = np.asarray(pbs[0])
    pb[1, : len(np.asarray(pbs[1]))] = np.asarray(pbs[1])
    pb3 = np.zeros((8, spec.a_pad), np.float32)
    pb3[0, :A] = np.asarray(pbs[2])
    pb3[1, :] = -30.0  # padded logstd lanes: exp() ~ 0
    pb3[1, :A] = np.asarray(policy_params["logstd"])

    net = ens_params["net"]
    n_in_used = np.asarray(net["w"][0]).shape[1]
    offset = (S + A) - n_in_used  # ignored leading state dims

    w1s = np.zeros((K, spec.s_pad, H), np.float32)
    w1a = np.zeros((K, spec.a_pad, H), np.float32)
    for k in range(K):
        wk = np.asarray(net["w"][0][k], np.float32)   # (n_in, H)
        n_state_rows = S - offset
        w1s[k, offset: S, :] = wk[:n_state_rows]
        w1a[k, :A, :] = wk[n_state_rows:]
    w2 = np.stack([np.asarray(net["w"][1][k], np.float32) for k in range(K)])
    w3 = np.zeros((K, H, spec.s_pad), np.float32)
    for k in range(K):
        w3[k, :, :S] = np.asarray(net["w"][2][k], np.float32)
    # pre-broadcast biases over the block dim (see kernel docstring: Mosaic
    # cannot sublane-broadcast (K, 1, .) inside the 3-D add on hardware)
    db1 = np.zeros((K, spec.block, H), np.float32)
    db2 = np.zeros((K, spec.block, H), np.float32)
    db3 = np.zeros((K, spec.block, spec.s_pad), np.float32)
    for k in range(K):
        db1[k, :] = np.asarray(net["b"][0][k], np.float32)
        db2[k, :] = np.asarray(net["b"][1][k], np.float32)
        db3[k, :, :S] = np.asarray(net["b"][2][k], np.float32)

    norm = np.zeros((8, spec.s_pad), np.float32)
    anorm = np.zeros((8, spec.a_pad), np.float32)
    in_mean = np.asarray(input_stats.mean, np.float32)
    in_std = np.asarray(input_stats.std, np.float32)
    norm[0, :S] = in_mean[:S]
    norm[1, :S] = 1.0 / in_std[:S]
    anorm[0, :A] = in_mean[S: S + A]
    anorm[1, :A] = 1.0 / in_std[S: S + A]
    norm[2, :S] = np.asarray(diff_stats.mean, np.float32)[:S]
    norm[3, :S] = np.asarray(diff_stats.std, np.float32)[:S]

    x0 = np.zeros((B, spec.s_pad), np.float32)
    x0[:, :S] = np.asarray(init_states, np.float32)

    shifts = np.asarray(jax.random.randint(key, (spec.T,), 0, B), np.int32)
    seed_arr = np.asarray([seed], np.int32)

    return (seed_arr, shifts, x0,
            pw1, pw2, pw3, pb, pb3,
            jnp.asarray(w1s, jnp.bfloat16), jnp.asarray(w1a, jnp.bfloat16),
            jnp.asarray(w2, jnp.bfloat16), jnp.asarray(w3, jnp.bfloat16),
            db1, db2, db3, norm, anorm)
