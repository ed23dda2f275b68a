"""Pallas TPU kernels for the variational hot loop.

``sampled_linear`` fuses the mean-field reparameterized dense forward —
``w_s = μ + softplus(ρ)·ε_s``; ``y_s = x_s @ w_sᵀ + b_s`` for all S MC
samples — into one kernel. The (S, Dout, Din) sampled-weight tensor is
built in VMEM per grid step and NEVER materialized in HBM, removing the
dominant memory traffic of the reference formulation (torch materializes
``_cached_weight`` per forward, ``psvi/models/neural_net.py:176-179``; the
XLA path materializes the same tensor between fusions).

The op carries a custom VJP (backward in XLA einsums — their transposes are
plain matmuls). ``jax.custom_vjp`` supports one order of reverse-mode
differentiation, so the fused op serves the FIRST-ORDER paths (MFVI
baselines, evaluation, retrain, the joint/alternating trainers); the
nested trainer's double-backward and the hyper trainer's forward-mode AID
products keep the reference XLA formulation. Select with
``VILinear(backend='pallas')``, the engine kwarg
``PSVI(backend='pallas')`` (plumbed through ``with_dense_backend``), or the
CLI flag ``--backend pallas``.

Kernel layout: grid (S, N//TN); per step the x tile (TN, Din), μ/ρ
(Dout, Din) and ε_s (Dout, Din) live in VMEM; the matmul hits the MXU with
fp32 accumulation.

Measured on TPU v5e (S=10, Din=400, Dout=120, 50 fused calls in one jit):
both the eps-threaded and the in-kernel-PRNG variants run at parity with
XLA's fused formulation (~80–95 μs/call; XLA 4.1–4.8 ms, Pallas 4.2–5.9 ms
per 50 calls at N∈{104, 1024}) — at these model sizes the op is at the
per-iteration latency floor and XLA's automatic fusion is already
near-optimal. The kernels are kept as OPT-IN infrastructure (they become
profitable when layer sizes grow past VMEM-resident eps, and the PRNG
variant halves HBM noise traffic by construction), selected via
``VILinear(backend='pallas')``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas is TPU/Mosaic-only; fall back cleanly elsewhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def _ceil_to(x, m):
    return -(-x // m) * m


def _fwd_kernel(x_ref, muw_ref, rhow_ref, mub_ref, rhob_ref,
                epsw_ref, epsb_ref, out_ref):
    w = muw_ref[:] + jax.nn.softplus(rhow_ref[:]) * epsw_ref[0]
    b = mub_ref[0] + jax.nn.softplus(rhob_ref[0]) * epsb_ref[0, 0]
    y = jax.lax.dot_general(
        x_ref[0], w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = y + b[None, :]


def _sampled_linear_pallas(x, mu_w, rho_w, mu_b, rho_b, eps_w, eps_b,
                           tile_n: int = 512):
    S, N, Din = x.shape
    Dout = mu_w.shape[0]
    TN = min(tile_n, _ceil_to(N, 8))
    Np = _ceil_to(N, TN)
    if Np != N:
        x = jnp.pad(x, ((0, 0), (0, Np - N), (0, 0)))
    grid = (S, Np // TN)

    # bias arrays lifted to ≥2-D so trailing block dims match the arrays
    mu_b2 = mu_b.reshape(1, Dout)
    rho_b2 = rho_b.reshape(1, Dout)
    eps_b3 = eps_b.reshape(S, 1, Dout)

    out = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((S, Np, Dout), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TN, Din), lambda s, i: (s, i, 0)),
            pl.BlockSpec((Dout, Din), lambda s, i: (0, 0)),
            pl.BlockSpec((Dout, Din), lambda s, i: (0, 0)),
            pl.BlockSpec((1, Dout), lambda s, i: (0, 0)),
            pl.BlockSpec((1, Dout), lambda s, i: (0, 0)),
            pl.BlockSpec((1, Dout, Din), lambda s, i: (s, 0, 0)),
            pl.BlockSpec((1, 1, Dout), lambda s, i: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TN, Dout), lambda s, i: (s, i, 0)),
    )(x, mu_w, rho_w, mu_b2, rho_b2, eps_w, eps_b3)
    return out[:, :N, :]


@jax.custom_vjp
def sampled_linear(x, mu_w, rho_w, mu_b, rho_b, eps_w, eps_b):
    """Fused S-sample variational dense forward.

    x: (S, N, Din); μ_w/ρ_w: (Dout, Din); μ_b/ρ_b: (Dout,);
    ε_w: (S, Dout, Din); ε_b: (S, Dout) → (S, N, Dout).

    Off-TPU (CPU tests, virtual meshes) the forward falls back to the
    identical-math XLA formulation, so ``backend='pallas'`` is safe to
    select on any platform; the check is trace-time (static).
    """
    if not pallas_available():
        return sampled_linear_reference(x, mu_w, rho_w, mu_b, rho_b,
                                        eps_w, eps_b)
    return _sampled_linear_pallas(x, mu_w, rho_w, mu_b, rho_b, eps_w, eps_b)


def sampled_linear_reference(x, mu_w, rho_w, mu_b, rho_b, eps_w, eps_b):
    """XLA reference implementation (identical math)."""
    w = mu_w[None] + jax.nn.softplus(rho_w)[None] * eps_w
    b = mu_b[None] + jax.nn.softplus(rho_b)[None] * eps_b
    return jnp.einsum("sni,soi->sno", x, w) + b[:, None, :]


def _fwd(x, mu_w, rho_w, mu_b, rho_b, eps_w, eps_b):
    y = sampled_linear(x, mu_w, rho_w, mu_b, rho_b, eps_w, eps_b)
    return y, (x, mu_w, rho_w, mu_b, rho_b, eps_w, eps_b)


def _bwd(res, g):
    x, mu_w, rho_w, mu_b, rho_b, eps_w, eps_b = res
    sw = jax.nn.softplus(rho_w)
    w = mu_w[None] + sw[None] * eps_w  # (S, Dout, Din)
    dx = jnp.einsum("sno,soi->sni", g, w)
    dw = jnp.einsum("sno,sni->soi", g, x)  # per-sample weight grads
    dmu_w = jnp.sum(dw, axis=0)
    drho_w = jnp.sum(dw * eps_w, axis=0) * jax.nn.sigmoid(rho_w)
    db = jnp.sum(g, axis=1)  # (S, Dout)
    dmu_b = jnp.sum(db, axis=0)
    drho_b = jnp.sum(db * eps_b, axis=0) * jax.nn.sigmoid(rho_b)
    return dx, dmu_w, drho_w, dmu_b, drho_b, None, None


sampled_linear.defvjp(_fwd, _bwd)


# ----------------------------------------------------------------------
# In-kernel PRNG variant: ε generated on-chip, never materialized in HBM.
# ----------------------------------------------------------------------
#
# The eps-threaded op above still streams the (S, Dout, Din) noise tensor
# from HBM every call — at MLP sizes that is the LARGEST input. Here the
# noise is generated inside the kernel from the TPU hardware PRNG
# (`pltpu.prng_seed` / `prng_random_bits` + Box–Muller), keyed ONLY by
# (seed, sample index, parameter block), so forward, backward, and the
# companion NKL computation regenerate bit-identical ε without ever writing
# it to memory. This is the TPU-native answer to the reference's
# cached-sample trick: instead of caching the sample (torch `_cached_weight`)
# or threading ε (our XLA path), we thread a 32-bit seed.


def _box_muller(shape):
    """Standard-normal tensor from the seeded on-chip PRNG."""
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    # int32 -> 23 uniform bits in [0, 2^23) (uint32->f32 casts are
    # unsupported in Mosaic; mask after shift keeps values nonnegative)
    m = jnp.int32(0x7FFFFF)
    u1 = ((b1 >> 9) & m).astype(jnp.float32) * (1.0 / (1 << 23)) + (
        0.5 / (1 << 23)
    )
    u2 = ((b2 >> 9) & m).astype(jnp.float32) * (1.0 / (1 << 23))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * np.pi * u2)


def _prng_fwd_kernel(seed_ref, x_ref, muw_ref, rhow_ref, mub_ref, rhob_ref,
                     out_ref):
    s = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], s)
    eps_w = _box_muller(muw_ref.shape)
    eps_b = _box_muller(mub_ref.shape)
    w = muw_ref[:] + jax.nn.softplus(rhow_ref[:]) * eps_w
    b = mub_ref[0] + jax.nn.softplus(rhob_ref[0]) * eps_b[0]
    y = jax.lax.dot_general(
        x_ref[0], w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = y + b[None, :]


def _prng_dx_kernel(seed_ref, g_ref, muw_ref, rhow_ref, out_ref):
    s = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], s)
    eps_w = _box_muller(muw_ref.shape)
    w = muw_ref[:] + jax.nn.softplus(rhow_ref[:]) * eps_w
    # dx = g @ w : (TN, Dout) x (Dout, Din) -> (TN, Din)
    out_ref[0] = jax.lax.dot_general(
        g_ref[0], w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _prng_dparam_kernel(seed_ref, g_ref, x_ref, rhow_ref, rhob_ref,
                        dmuw_ref, drhow_ref, dmub_ref, drhob_ref):
    # grid (S, N//TN): tiles over N so the g/x blocks stay VMEM-sized at
    # large batch; partial (Dout, Din) products accumulate into the
    # outputs across sequential grid iterations. Reseeding per tile
    # regenerates the same eps for every tile of sample s.
    s = pl.program_id(0)
    i = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0], s)
    eps_w = _box_muller(rhow_ref.shape)
    eps_b = _box_muller(rhob_ref.shape)
    dw = jax.lax.dot_general(  # (Dout, Din) = g[s,tile]^T @ x[s,tile]
        g_ref[0], x_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db = jnp.sum(g_ref[0], axis=0, keepdims=True)  # (1, Dout)

    @pl.when((s == 0) & (i == 0))
    def _():
        dmuw_ref[:] = dw
        drhow_ref[:] = dw * eps_w
        dmub_ref[:] = db
        drhob_ref[:] = db * eps_b

    @pl.when((s > 0) | (i > 0))
    def _():
        dmuw_ref[:] = dmuw_ref[:] + dw
        drhow_ref[:] = drhow_ref[:] + dw * eps_w
        dmub_ref[:] = dmub_ref[:] + db
        drhob_ref[:] = drhob_ref[:] + db * eps_b


def _prng_nkl_kernel(seed_ref, muw_ref, rhow_ref, mub_ref, rhob_ref,
                     prior_ref, out_ref):
    s = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], s)
    eps_w = _box_muller(muw_ref.shape)
    eps_b = _box_muller(mub_ref.shape)
    prior_sd = prior_ref[0, 0]
    half_log_2pi = 0.918938533204672742  # 0.5 * log(2π)

    def term(mu, rho, eps):
        sd = jax.nn.softplus(rho)
        theta = mu + sd * eps
        lp = -0.5 * (theta / prior_sd) ** 2 - jnp.log(prior_sd) - half_log_2pi
        lq = -0.5 * eps**2 - jnp.log(sd) - half_log_2pi
        return jnp.sum(lp - lq)

    total = term(muw_ref[:], rhow_ref[:], eps_w) + term(
        mub_ref[0], rhob_ref[0], eps_b[0]
    )
    # scalar broadcast into an (8, 128) tile (TPU min-tile-aligned output)
    out_ref[0] = jnp.full((8, 128), total, jnp.float32)


def sampled_linear_prng(x, mu_w, rho_w, mu_b, rho_b, seed, tile_n: int = 512):
    """Forward with on-chip noise: y_s = x_s @ (μ+softplus(ρ)·ε(seed,s))ᵀ + b_s.

    seed: int32 scalar array. Use `vi_linear_nkl_prng` with the SAME seed to
    get the matching per-sample log p(θ)−log q(θ).
    """
    return _sampled_linear_prng_vjp(x, mu_w, rho_w, mu_b, rho_b, seed,
                                    tile_n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _sampled_linear_prng_vjp(x, mu_w, rho_w, mu_b, rho_b, seed, tile_n):
    return _prng_forward(x, mu_w, rho_w, mu_b, rho_b, seed, tile_n)


def _prng_forward(x, mu_w, rho_w, mu_b, rho_b, seed, tile_n: int = 512):
    S, N, Din = x.shape
    Dout = mu_w.shape[0]
    TN = min(tile_n, _ceil_to(N, 8))
    Np = _ceil_to(N, TN)
    xp = jnp.pad(x, ((0, 0), (0, Np - N), (0, 0))) if Np != N else x
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    out = pl.pallas_call(
        _prng_fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((S, Np, Dout), jnp.float32),
        grid=(S, Np // TN),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TN, Din), lambda s, i: (s, i, 0)),
            pl.BlockSpec((Dout, Din), lambda s, i: (0, 0)),
            pl.BlockSpec((Dout, Din), lambda s, i: (0, 0)),
            pl.BlockSpec((1, Dout), lambda s, i: (0, 0)),
            pl.BlockSpec((1, Dout), lambda s, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TN, Dout), lambda s, i: (s, i, 0)),
    )(seed_arr, xp, mu_w, rho_w, mu_b.reshape(1, -1), rho_b.reshape(1, -1))
    return out[:, :N, :]


def _prng_fwd_rule(x, mu_w, rho_w, mu_b, rho_b, seed, tile_n):
    y = _prng_forward(x, mu_w, rho_w, mu_b, rho_b, seed, tile_n)
    return y, (x, mu_w, rho_w, mu_b, rho_b, seed)


def _prng_bwd_rule(tile_n, res, g):
    x, mu_w, rho_w, mu_b, rho_b, seed = res
    S, N, Din = x.shape
    Dout = mu_w.shape[0]
    TN = min(tile_n, _ceil_to(N, 8))
    Np = _ceil_to(N, TN)
    gp = jnp.pad(g, ((0, 0), (0, Np - N), (0, 0))) if Np != N else g
    xp = jnp.pad(x, ((0, 0), (0, Np - N), (0, 0))) if Np != N else x
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    dx = pl.pallas_call(
        _prng_dx_kernel,
        out_shape=jax.ShapeDtypeStruct((S, Np, Din), jnp.float32),
        grid=(S, Np // TN),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TN, Dout), lambda s, i: (s, i, 0)),
            pl.BlockSpec((Dout, Din), lambda s, i: (0, 0)),
            pl.BlockSpec((Dout, Din), lambda s, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TN, Din), lambda s, i: (s, i, 0)),
    )(seed_arr, gp, mu_w, rho_w)[:, :N, :]

    dmu_w, drho_w_raw, dmu_b, drho_b_raw = pl.pallas_call(
        _prng_dparam_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((Dout, Din), jnp.float32),
            jax.ShapeDtypeStruct((Dout, Din), jnp.float32),
            jax.ShapeDtypeStruct((1, Dout), jnp.float32),
            jax.ShapeDtypeStruct((1, Dout), jnp.float32),
        ),
        grid=(S, Np // TN),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TN, Dout), lambda s, i: (s, i, 0)),
            pl.BlockSpec((1, TN, Din), lambda s, i: (s, i, 0)),
            pl.BlockSpec((Dout, Din), lambda s, i: (0, 0)),
            pl.BlockSpec((1, Dout), lambda s, i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((Dout, Din), lambda s, i: (0, 0)),
            pl.BlockSpec((Dout, Din), lambda s, i: (0, 0)),
            pl.BlockSpec((1, Dout), lambda s, i: (0, 0)),
            pl.BlockSpec((1, Dout), lambda s, i: (0, 0)),
        ),
    )(seed_arr, gp, xp, rho_w, rho_b.reshape(1, -1))

    drho_w = drho_w_raw * jax.nn.sigmoid(rho_w)
    drho_b = (drho_b_raw * jax.nn.sigmoid(rho_b)[None, :]).reshape(-1)
    return dx, dmu_w, drho_w, dmu_b.reshape(-1), drho_b, None


_sampled_linear_prng_vjp.defvjp(_prng_fwd_rule, _prng_bwd_rule)


def vi_linear_nkl_prng(mu_w, rho_w, mu_b, rho_b, seed, mc_samples,
                       prior_sd: float = 1.0):
    """Per-sample log p(θ_s) − log q(θ_s) with ε regenerated bit-identically
    to `sampled_linear_prng` for the same seed. Returns (S,)."""
    Dout, Din = mu_w.shape
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    prior_arr = jnp.full((1, 1), prior_sd, jnp.float32)
    out = pl.pallas_call(
        _prng_nkl_kernel,
        out_shape=jax.ShapeDtypeStruct((mc_samples, 8, 128), jnp.float32),
        grid=(mc_samples,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((Dout, Din), lambda s: (0, 0)),
            pl.BlockSpec((Dout, Din), lambda s: (0, 0)),
            pl.BlockSpec((1, Dout), lambda s: (0, 0)),
            pl.BlockSpec((1, Dout), lambda s: (0, 0)),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda s: (s, 0, 0)),
    )(seed_arr, mu_w, rho_w, mu_b.reshape(1, -1), rho_b.reshape(1, -1),
      prior_arr)
    return out[:, 0, 0]


def pallas_available() -> bool:
    if not _PALLAS_OK:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
