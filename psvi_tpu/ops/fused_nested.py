"""Fused bilevel nested step for single-dense-layer PSVI (Pallas megakernel).

The flagship *logreg-family* nested step (halfmoon / four_blobs /
synth_lr_*: one variational dense layer, categorical likelihood) is
per-op-latency bound on TPU: XLA schedules ~200 tiny HLO ops per outer
step (10-30 µs matmuls, elementwise chains, Adam updates) and the chip
spends most of the step in per-op launch overhead, not compute
(BENCHMARKS.md "step anatomy"; measured 517 µs/step for halfmoon M=30
S=10 inner_it=10 on v5e-1).

This module collapses the ENTIRE nested step — T differentiable inner
Adam iterations on the inner ELBO, the outer IW-ELBO, and its gradients
w.r.t. the pseudodata (u, v, alpha) THROUGH the unroll (second-order) —
into ONE Pallas kernel. Every tensor involved is tiny (M, B ≤ a few
hundred rows; D, nc ≤ a few hundred), so the whole 20-iteration bilevel
program lives in VMEM and Mosaic compiles it as a single fused loop
nest with zero inter-op overhead.

Reference semantics reproduced (identical math to the XLA engine path):

- inner ELBO  ``Σ_s Σ_m N·f(v)_m · NLL(u_m, z_m; θ_s) + KL(q‖p)``
  (ref ``psvi/inference/psvi_classes.py:488-511``),
- torch-exact differentiable Adam (bias-corrected, zero-safe sqrt —
  ``ops/optim.py``; ref ``robust_higher/optim.py:299-368``),
- outer negative PSVI-ELBO with the self-normalized IW estimator
  (ref ``psvi_classes.py:445-486``),
- gradients w.r.t. u, v, alpha through all T unrolled steps
  (ref ``nested_step`` :541-600).

The derivative work is NOT hand-derived: the kernel body calls
``jax.value_and_grad`` on the same pure-jnp core function used by the
XLA fallback — tracing happens at kernel-build time, so Mosaic receives
the full forward+reverse DAG (including the second-order terms through
the inner gradients) as one kernel.

Use: the PSVI engine dispatches here automatically when
``fused_inner='auto'`` (the default) and the configuration is supported
(see :func:`supports`); force with ``fused_inner=True`` / disable with
``fused_inner=False`` (CLI: ``--fused_inner/--no-fused_inner``).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from psvi_tpu.ops.optim import _sqrt_safe

try:  # pallas is TPU/Mosaic-only; fall back cleanly elsewhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


@dataclasses.dataclass(frozen=True)
class FusedCfg:
    """Static configuration of the fused nested step."""

    T: int  # inner iterations
    S: int  # MC samples
    nc: int  # classes (dense layer out_dim)
    D: int  # features (dense layer in_dim)
    M: int  # coreset size
    B: int  # outer minibatch rows
    N: float  # dataset-size rescaler (engine self.N)
    parameterised: bool  # f(v) = softmax(v) (PSVILearnV family)
    use_alpha: bool  # f(v) *= exp(alpha) (PSVIAV / alpha_fixed)
    use_bias: bool
    prior_sd: float
    b1: float = 0.9  # inner Adam hyperparameters (torch defaults)
    b2: float = 0.999
    adam_eps: float = 1e-8


def _softplus(x):
    return jax.nn.softplus(x)


def _gauss_logpdf(x, mu, sd):
    return -0.5 * jnp.square((x - mu) / sd) - jnp.log(sd) - _HALF_LOG_2PI


def _nested_core(
    mu_w, rho_w, mu_b, rho_b,  # params0: (nc,D), (nc,D), (nc,1), (nc,1)
    u, v, alpha,  # (M,D), (1,M), (1,1)
    ypse, ybat,  # one-hot labels TRANSPOSED: (nc,M), (nc,B)
    eps_wi, eps_bi,  # inner noise, CLASS-MAJOR rows c*S+s: (T*nc*S, D), (T*nc*S, 1)
    eps_wo, eps_bo,  # outer noise: (nc*S, D), (nc*S, 1)
    xb,  # (B, D)
    lr_s,  # scalar current inner lr (StepLR schedule value)
    cfg: FusedCfg,
):
    """The entire nested outer computation as one pure-jnp function.

    Returns ``(loss, (paramsT..., inner_losses tuple), (g_u, g_v, g_alpha))``.
    Runs identically under XLA (fallback / tests) and inside the Pallas
    kernel (where Mosaic fuses the whole DAG).

    Layout note (Mosaic constraints): every tensor is rank-2 and all
    per-class arithmetic uses static contiguous row slices of CLASS-MAJOR
    ``(nc*S, ·)`` arrays (row c*S+s = sample s of class-c parameters).
    Mosaic rejects the natural rank-3 ``(S, nc, P)`` forms ("unsupported
    shape cast" / invalid relayouts), and this formulation needs none.
    """
    T, S, nc, D = cfg.T, cfg.S, cfg.nc, cfg.D
    M, B = cfg.M, cfg.B
    R = nc * S  # sampled-weight rows

    def core_weights(v_, alpha_):
        # N·f(v) (ref psvi_classes.py:111,1358-1360,1486-1488); engine
        # _core_weights equivalent. v_ (1,M) → (1,M).
        if cfg.parameterised:
            mx = jnp.max(v_, axis=1, keepdims=True)
            e = jnp.exp(v_ - mx)
            fv = e / jnp.sum(e, axis=1, keepdims=True)
        else:
            fv = v_
        if cfg.use_alpha:
            fv = jnp.exp(alpha_[0, 0]) * fv
        return cfg.N * fv

    def rep_rows(x):
        # (nc, K) → (nc*S, K): row c*S+s = x[c] (class-major replication)
        if S == 1:
            return x
        return jnp.concatenate(
            [jnp.broadcast_to(x[c : c + 1], (S, x.shape[1])) for c in range(nc)],
            axis=0,
        )

    def fold_rows(x):
        # (nc*S, K) → (S, K): sum the nc class blocks (Σ_c x[c*S+s])
        out = jax.lax.slice_in_dim(x, 0, S, axis=0)
        for c in range(1, nc):
            out = out + jax.lax.slice_in_dim(x, c * S, (c + 1) * S, axis=0)
        return out

    def sampled_theta(p, eps_w, eps_b):
        # eps_w (nc*S, D); eps_b (nc*S, 1)
        mw, rw, mb, rb = p
        W = rep_rows(mw) + rep_rows(_softplus(rw)) * eps_w  # (nc*S, D)
        if cfg.use_bias:
            b = rep_rows(mb) + rep_rows(_softplus(rb)) * eps_b  # (nc*S, 1)
        else:
            b = None
        return W, b

    def forward_nll(W, b, X, Yt, P):
        # W (nc*S, D), b (nc*S, 1) | X (P, D), Yt (nc, P) → nll (S, P)
        Z = jax.lax.dot_general(
            W, X, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (nc*S, P)
        if b is not None:
            Z = Z + b
        Zc = [
            jax.lax.slice_in_dim(Z, c * S, (c + 1) * S, axis=0)
            for c in range(nc)
        ]  # nc × (S, P)
        mx = Zc[0]
        for c in range(1, nc):
            mx = jnp.maximum(mx, Zc[c])
        sumexp = jnp.exp(Zc[0] - mx)
        for c in range(1, nc):
            sumexp = sumexp + jnp.exp(Zc[c] - mx)
        lse = mx + jnp.log(sumexp)  # (S, P)
        picked = Zc[0] * jax.lax.slice_in_dim(Yt, 0, 1, axis=0)
        for c in range(1, nc):
            picked = picked + Zc[c] * jax.lax.slice_in_dim(
                Yt, c, c + 1, axis=0
            )
        return lse - picked  # (S, P)

    def kl_term(p):
        # analytic KL(q‖p) of the dense layer (ref neural_net.py:101-108)
        mw, rw, mb, rb = p
        sp = cfg.prior_sd

        def kl_leaf(mu, rho):
            sd = _softplus(rho)
            return jnp.sum(
                jnp.log(sp / sd)
                + (jnp.square(sd) + jnp.square(mu)) / (2.0 * sp * sp)
                - 0.5
            )

        out = kl_leaf(mw, rw)
        if cfg.use_bias:
            out = out + kl_leaf(mb, rb)
        return out

    def sampled_nkl(p, W, b):
        # per-sample log p(θ_s) − log q(θ_s) (ref neural_net.py:110-115)
        mw, rw, mb, rb = p
        sp = cfg.prior_sd
        lw = _gauss_logpdf(W, 0.0, sp) - _gauss_logpdf(
            W, rep_rows(mw), rep_rows(_softplus(rw))
        )  # (nc*S, D)
        out = fold_rows(jnp.sum(lw, axis=1, keepdims=True))  # (S, 1)
        if cfg.use_bias:
            lb = _gauss_logpdf(b, 0.0, sp) - _gauss_logpdf(
                b, rep_rows(mb), rep_rows(_softplus(rb))
            )  # (nc*S, 1)
            out = out + fold_rows(lb)
        return out  # (S, 1)

    def nested(u_, v_, alpha_):
        cw = core_weights(v_, alpha_)  # (1,M)

        def inner_elbo_u(p, eps_w, eps_b):
            # ref psvi_classes.py:488-511 (Σ over S, not mean)
            W, b = sampled_theta(p, eps_w, eps_b)
            nllu = forward_nll(W, b, u_, ypse, M)  # (S,M)
            pseudo = jax.lax.dot_general(
                nllu, cw, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (S,1)
            return jnp.sum(pseudo) + kl_term(p)

        p = (mu_w, rho_w, mu_b, rho_b)
        m_t = tuple(jnp.zeros_like(x) for x in p)
        n_t = tuple(jnp.zeros_like(x) for x in p)
        inner_losses = []
        for t in range(1, T + 1):
            ew = jax.lax.slice_in_dim(eps_wi, (t - 1) * R, t * R, axis=0)
            eb = jax.lax.slice_in_dim(eps_bi, (t - 1) * R, t * R, axis=0)
            loss_t, g = jax.value_and_grad(inner_elbo_u)(p, ew, eb)
            inner_losses.append(loss_t)
            # torch-exact Adam with static bias corrections (fresh state per
            # outer step — higher.innerloop_ctx semantics, ref :549-555)
            bc1 = 1.0 - cfg.b1**t
            bc2s = math.sqrt(1.0 - cfg.b2**t)
            m_t = tuple(
                cfg.b1 * m + (1.0 - cfg.b1) * gg for m, gg in zip(m_t, g)
            )
            n_t = tuple(
                cfg.b2 * n + (1.0 - cfg.b2) * jnp.square(gg)
                for n, gg in zip(n_t, g)
            )
            p = tuple(
                pp - lr_s * (mm / bc1) / (_sqrt_safe(nn) / bc2s + cfg.adam_eps)
                for pp, mm, nn in zip(p, m_t, n_t)
            )

        # outer negative PSVI-ELBO on (u_, xb) with fresh noise (ref :445-486)
        Wo, bo = sampled_theta(p, eps_wo, eps_bo)
        nllu = forward_nll(Wo, bo, u_, ypse, M)  # (S,M)
        nllb = forward_nll(Wo, bo, xb, ybat, B)  # (S,B)
        pseudo = jax.lax.dot_general(
            nllu, cw, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S,1)
        data = (cfg.N / B) * jnp.sum(nllb, axis=1, keepdims=True)  # (S,1)
        nkl = sampled_nkl(p, Wo, bo)  # (S,1)
        log_w = -pseudo + nkl  # (S,1)
        mxw = jnp.max(log_w, axis=0, keepdims=True)
        expw = jnp.exp(log_w - mxw)
        wts = expw / jnp.sum(expw, axis=0, keepdims=True)
        loss = jnp.sum(wts * (data - pseudo)) - jnp.mean(log_w)
        return loss, (p, tuple(inner_losses))

    (loss, aux), grads = jax.value_and_grad(nested, argnums=(0, 1, 2), has_aux=True)(
        u, v, alpha
    )
    return loss, aux, grads


def _kernel(
    mu_w_ref, rho_w_ref, mu_b_ref, rho_b_ref,
    u_ref, v_ref, alpha_ref,
    ypse_ref, ybat_ref,
    eps_wi_ref, eps_bi_ref, eps_wo_ref, eps_bo_ref,
    xb_ref, lr_ref,
    # outputs
    loss_ref, losses_ref,
    mu_wT_ref, rho_wT_ref, mu_bT_ref, rho_bT_ref,
    gu_ref, gv_ref, galpha_ref,
    *, cfg: FusedCfg,
):
    loss, (pT, inner_losses), (g_u, g_v, g_alpha) = _nested_core(
        mu_w_ref[:], rho_w_ref[:], mu_b_ref[:], rho_b_ref[:],
        u_ref[:], v_ref[:], alpha_ref[:],
        ypse_ref[:], ybat_ref[:],
        eps_wi_ref[:], eps_bi_ref[:], eps_wo_ref[:], eps_bo_ref[:],
        xb_ref[:], lr_ref[0, 0],
        cfg,
    )
    loss_ref[0, 0] = loss
    for t in range(cfg.T):
        losses_ref[0, t] = inner_losses[t]
    mu_wT_ref[:], rho_wT_ref[:], mu_bT_ref[:], rho_bT_ref[:] = pT
    gu_ref[:] = g_u
    gv_ref[:] = g_v
    galpha_ref[0, 0] = g_alpha[0, 0]


@functools.partial(jax.jit, static_argnames=("cfg", "backend", "interpret"))
def fused_nested_outer(
    mu_w, rho_w, mu_b, rho_b,
    u, v, alpha,
    ypse, ybat,
    eps_wi, eps_bi, eps_wo, eps_bo,
    xb, lr,
    cfg: FusedCfg,
    backend: str = "pallas",
    interpret: bool = False,
):
    """Run the fused nested outer step.

    backend='pallas': one Mosaic kernel (TPU). backend='xla': the same
    math as a regular traced function (CPU fallback / numerics oracle).
    Returns ``(loss, inner_losses (T,), paramsT 4-tuple, g_u, g_v, g_alpha)``.
    """
    args = (
        mu_w, rho_w, mu_b, rho_b, u, v, alpha, ypse, ybat,
        eps_wi, eps_bi, eps_wo, eps_bo, xb, lr,
    )
    if backend == "xla" or not _PALLAS_OK:
        loss, (pT, inner_losses), (g_u, g_v, g_alpha) = _nested_core(
            *args[:-1], args[-1][0, 0], cfg
        )
        return (
            loss, jnp.stack(inner_losses), pT, g_u, g_v, g_alpha,
        )

    T, nc, D, M, B = cfg.T, cfg.nc, cfg.D, cfg.M, cfg.B
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),  # loss
            jax.ShapeDtypeStruct((1, T), jnp.float32),  # inner losses
            jax.ShapeDtypeStruct((nc, D), jnp.float32),  # mu_wT
            jax.ShapeDtypeStruct((nc, D), jnp.float32),  # rho_wT
            jax.ShapeDtypeStruct((nc, 1), jnp.float32),  # mu_bT
            jax.ShapeDtypeStruct((nc, 1), jnp.float32),  # rho_bT
            jax.ShapeDtypeStruct((M, D), jnp.float32),  # g_u
            jax.ShapeDtypeStruct((1, M), jnp.float32),  # g_v
            jax.ShapeDtypeStruct((1, 1), jnp.float32),  # g_alpha
        ),
        in_specs=[vmem() for _ in range(14)] + [smem()],
        out_specs=(
            smem(), smem(), vmem(), vmem(), vmem(), vmem(),
            vmem(), vmem(), smem(),
        ),
        interpret=interpret,
    )(*args)
    loss, inner_losses, mu_wT, rho_wT, mu_bT, rho_bT, g_u, g_v, g_alpha = out
    return (
        loss[0, 0], inner_losses[0], (mu_wT, rho_wT, mu_bT, rho_bT),
        g_u, g_v, g_alpha,
    )


def supports(engine) -> bool:
    """True when the engine's nested step can run as the fused kernel:
    single mean-field VILinear net (logreg family), categorical likelihood
    with fixed hard labels, plain (non-truncated) nested trainer, inner
    Adam, f32 compute, no mesh sharding of eps/batch."""
    from psvi_tpu.models.layers import Sequential, VILinear

    net = engine.net
    return (
        isinstance(net, Sequential)
        and len(net.layers) == 1
        and type(net.layers[0]) is VILinear
        and net.layers[0].use_bias
        and net.layers[0].compute_dtype == "float32"
        and engine.trainer == "nested"
        and not engine.truncated
        and engine.inner_optimizer == "adam"
        and engine.likelihood == "categorical"
        and not engine.spec.learn_z
        and not engine.spec.ablated
        and not engine.spec.evaluate_only
        and engine.mc_samples >= 2
        and engine.inner_it >= 1
        and not engine.shard_mc
        and engine.batch_shardings is None
        and engine.num_pseudo > 0
    )
