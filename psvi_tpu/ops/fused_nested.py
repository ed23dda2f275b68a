"""Fused bilevel nested step for the mean-field dense family (Pallas megakernel).

The logreg/MLP-family nested step (halfmoon / four_blobs / synth_lr_* on
``logistic_regression`` or ``fn`` nets) is per-op-latency bound on TPU:
XLA schedules ~200+ tiny HLO ops per outer step (10-30 µs matmuls,
elementwise chains, Adam updates) and the chip spends most of the step in
per-op launch overhead, not compute (BENCHMARKS.md "step anatomy";
measured 517 µs/step for halfmoon logreg M=30 S=10 inner_it=10 on v5e-1).

This module collapses the ENTIRE nested step — T differentiable inner
Adam iterations on the inner ELBO, the outer IW-ELBO, and its gradients
w.r.t. the pseudodata (u, v, alpha) THROUGH the unroll (second-order) —
into ONE Pallas kernel. Every tensor involved is tiny (M, B ≤ a few
hundred rows; layer widths ≤ a few hundred), so the whole bilevel
program lives in VMEM and Mosaic compiles it as a single fused loop nest
with zero inter-op overhead.

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

Mosaic layout strategy (it rejects the natural rank-3 ``(S, nc, P)``
forms with "unsupported shape cast" / invalid-relayout errors): every
tensor is rank-2.

- Hidden-layer sampled weights are SAMPLE-MAJOR ``(S·out, in)`` (row
  s·out+o); the S per-sample matmuls run as one block-diagonal matmul
  ``(S·out, S·in) @ (S·in, P)`` with an iota-built 0/1 mask.
- The final layer is CLASS-MAJOR ``(nc·S, h)`` (row c·S+s), so the
  per-class softmax/NLL arithmetic uses static contiguous row slices.
- Segment reductions (per-sample NKL sums) are 0/1 selection matmuls.

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

_EXACT = jax.lax.Precision.HIGHEST
_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


@dataclasses.dataclass(frozen=True)
class FusedCfg:
    """Static configuration of the fused nested step."""

    T: int  # inner iterations
    S: int  # MC samples
    widths: Tuple[int, ...]  # dense stack (D, h, ..., nc); ReLU between
    M: int  # coreset size
    B: int  # outer minibatch rows
    N: float  # dataset-size rescaler (engine self.N)
    parameterised: bool  # f(v) = softmax(v) (PSVILearnV family)
    use_alpha: bool  # f(v) *= exp(alpha) (PSVIAV / alpha_fixed)
    prior_sd: float
    likelihood: str = "categorical"  # 'categorical' | 'gaussian' (regressor)
    tau: float = 0.1  # Gaussian precision (ref psvi_classes.py:1986)
    learn_z: bool = False  # Gaussian pseudo-targets optimized (regressors)
    # re-materialize each inner iteration in the outer reverse sweep
    # instead of storing its forward intermediates: Mosaic kernels have a
    # ~16 MB scoped-VMEM budget and the T-deep unroll's residuals exceed
    # it for MLP widths (measured: fn h=40 S=10 T=10 wants 22.6 MB).
    # Engine auto-sets from residual_bytes().
    remat: bool = False
    b1: float = 0.9  # inner Adam hyperparameters (torch defaults)
    b2: float = 0.999
    adam_eps: float = 1e-8

    @property
    def L(self):  # number of dense layers
        return len(self.widths) - 1

    @property
    def D(self):
        return self.widths[0]

    @property
    def nc(self):
        return self.widths[-1]

    def residual_bytes(self):
        """Rough upper bound on the reverse-sweep residuals the unrolled
        inner loop keeps live in VMEM (per iteration: a handful of
        (S·width, M)-sized activations/grads plus the block-diagonal
        operators)."""
        wmax = max(self.widths)
        per_iter = 4 * self.S * wmax * (self.M + 8) * 10
        per_iter += 4 * self.S * wmax * self.S * wmax  # blockdiag ops
        return self.T * per_iter


def _softplus(x):
    return jax.nn.softplus(x)


def _gauss_logpdf(x, mu, sd):
    return -0.5 * jnp.square((x - mu) / sd) - jnp.log(sd) - _HALF_LOG_2PI


def _nested_core(params0, u, v, alpha, ypse, ybat, eps_wi, eps_bi,
                 eps_wo, eps_bo, xb, lr_s, cfg: FusedCfg):
    """The entire nested outer computation as one pure-jnp function.

    params0: flat tuple (mu_w0, rho_w0, mu_b0, rho_b0, mu_w1, ...) with
    weights (out, in) and biases (out, 1).
    eps_wi/eps_bi: per-layer lists; leaf l is (T·R_l, in_l) / (T·R_l, 1)
    where R_l = S·out_l, laid out sample-major for hidden layers and
    class-major for the last (see module docstring). eps_wo/eps_bo: same
    per-layer layout for the single outer draw, (R_l, ·).
    ypse/ybat: one-hot labels TRANSPOSED (nc, M) / (nc, B); u (M, D);
    v (1, M); alpha (1, 1); xb (B, D); lr_s scalar.

    Returns ``(loss, (paramsT_flat, inner_losses tuple),
    (g_u, g_v, g_alpha))``. Runs identically under XLA (fallback /
    tests) and inside the Pallas kernel.
    """
    T, S, L = cfg.T, cfg.S, cfg.L
    M, B, nc = cfg.M, cfg.B, cfg.nc
    widths = cfg.widths

    # Every structural op that AD crosses (replication, folds, tiling,
    # per-class extraction) is a constant 0/1 MATMUL: Mosaic lowers the
    # transpose of broadcast_to / concatenate / slice to `pad`, which its
    # vector layout pass rejects inside this kernel ("vector types must
    # have positive constant sizes"); a matmul transposes to a matmul.

    def _mask_mm(mask_bool, x):
        return jax.lax.dot_general(
            mask_bool.astype(jnp.float32), x,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
                precision=_EXACT,
        )

    def rep_sample_major(x):
        # (out, K) → (S·out, K): row s·out+o = x[o] (tile S times)
        out = x.shape[0]
        if S == 1:
            return x
        rows = jax.lax.broadcasted_iota(jnp.int32, (S * out, out), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (S * out, out), 1)
        return _mask_mm(rows % out == cols, x)

    def rep_class_major(x):
        # (nc, K) → (nc·S, K): row c·S+s = x[c]
        if S == 1:
            return x
        rows = jax.lax.broadcasted_iota(jnp.int32, (nc * S, nc), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (nc * S, nc), 1)
        return _mask_mm(rows // S == cols, x)

    def rep_l(lyr, x):
        return rep_class_major(x) if lyr == L - 1 else rep_sample_major(x)

    def fold_sample_major(x, out):
        # (S·out, 1) → (S, 1): sum rows s·out+o over o
        rows = jax.lax.broadcasted_iota(jnp.int32, (S, S * out), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (S, S * out), 1)
        return _mask_mm(cols // out == rows, x)

    def fold_class_major(x):
        # (nc·S, 1) → (S, 1): sum over the nc class blocks (row c·S+s)
        rows = jax.lax.broadcasted_iota(jnp.int32, (S, nc * S), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (S, nc * S), 1)
        return _mask_mm(cols % S == rows, x)

    def fold_l(lyr, x):
        if lyr == L - 1:
            return fold_class_major(x)
        return fold_sample_major(x, widths[lyr + 1])

    def blockdiag(W, lyr):
        # Sampled flat W → (R_out, S·in) block-diagonal operator so the S
        # per-sample matmuls run as ONE matmul against the sample-major
        # (S·in, P) activations. Lane-tiling via a constant 0/1 matmul
        # (transposable), then the block mask.
        out, inn = widths[lyr + 1], widths[lyr]
        if S > 1:
            trows = jax.lax.broadcasted_iota(jnp.int32, (inn, S * inn), 0)
            tcols = jax.lax.broadcasted_iota(jnp.int32, (inn, S * inn), 1)
            tile = (tcols % inn == trows).astype(jnp.float32)
            Wt = jax.lax.dot_general(
                W, tile, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_EXACT,
            )
        else:
            Wt = W
        rows = jax.lax.broadcasted_iota(jnp.int32, (W.shape[0], S * inn), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (W.shape[0], S * inn), 1)
        if lyr == L - 1:  # class-major rows c·S+s
            mask = (cols // inn == rows % S)
        else:  # sample-major rows s·out+o
            mask = (cols // inn == rows // out)
        return Wt * mask.astype(jnp.float32)

    def sampled_theta(p, ew, eb):
        # per layer: W_l = rep(μ) + rep(softplus(ρ))·ε  (flat layout)
        Ws, bs = [], []
        for lyr in range(L):
            mw, rw, mb, rb = p[4 * lyr : 4 * lyr + 4]
            Ws.append(rep_l(lyr, mw) + rep_l(lyr, _softplus(rw)) * ew[lyr])
            bs.append(rep_l(lyr, mb) + rep_l(lyr, _softplus(rb)) * eb[lyr])
        return Ws, bs

    def forward_nll(Ws, bs, X, Yt, P):
        # X (P, D) shared across samples; first layer is a plain matmul,
        # deeper layers are block-diagonal matmuls; ReLU between layers.
        A = jax.lax.dot_general(
            Ws[0], X, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
                precision=_EXACT,
        ) + bs[0]  # (R_0, P)
        for lyr in range(1, L):
            A = jnp.maximum(A, 0.0)
            A = jax.lax.dot_general(
                blockdiag(Ws[lyr], lyr), A,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_EXACT,
            ) + bs[lyr]
        Z = A  # (nc·S, P) class-major
        if cfg.likelihood == "gaussian":
            # nc = 1: Z is (S, P); Yt (1, P) are the raw targets.
            # ref psvi_classes.py:2038: -Normal(out, 1/sqrt(tau)).log_prob(y)
            scale = 1.0 / math.sqrt(cfg.tau)
            return (
                0.5 * jnp.square((Yt - Z) / scale)
                + math.log(scale)
                + _HALF_LOG_2PI
            )  # (S, P)
        rows = jax.lax.broadcasted_iota(jnp.int32, (S, nc * S), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (S, nc * S), 1)
        Zc = [
            _mask_mm(cols == c * S + rows, Z) for c in range(nc)
        ]  # nc × (S, P) — selection matmuls: AD crosses these (see above)
        mx = Zc[0]
        for c in range(1, nc):
            mx = jnp.maximum(mx, Zc[c])
        sumexp = jnp.exp(Zc[0] - mx)
        for c in range(1, nc):
            sumexp = sumexp + jnp.exp(Zc[c] - mx)
        lse = mx + jnp.log(sumexp)  # (S, P)
        picked = Zc[0] * jax.lax.slice_in_dim(Yt, 0, 1, axis=0)
        for c in range(1, nc):
            picked = picked + Zc[c] * jax.lax.slice_in_dim(Yt, c, c + 1, axis=0)
        return lse - picked  # (S, P)

    def kl_term(p):
        # analytic KL(q‖p) over all dense layers (ref neural_net.py:101-108)
        sp = cfg.prior_sd

        def kl_leaf(mu, rho):
            sd = _softplus(rho)
            return jnp.sum(
                jnp.log(sp / sd)
                + (jnp.square(sd) + jnp.square(mu)) / (2.0 * sp * sp)
                - 0.5
            )

        out = kl_leaf(p[0], p[1]) + kl_leaf(p[2], p[3])
        for lyr in range(1, L):
            mw, rw, mb, rb = p[4 * lyr : 4 * lyr + 4]
            out = out + kl_leaf(mw, rw) + kl_leaf(mb, rb)
        return out

    def sampled_nkl(p, Ws, bs):
        # per-sample log p(θ_s) − log q(θ_s) (ref neural_net.py:110-115)
        sp = cfg.prior_sd
        out = jnp.zeros((S, 1), jnp.float32)
        for lyr in range(L):
            mw, rw, mb, rb = p[4 * lyr : 4 * lyr + 4]
            lw = _gauss_logpdf(Ws[lyr], 0.0, sp) - _gauss_logpdf(
                Ws[lyr], rep_l(lyr, mw), rep_l(lyr, _softplus(rw))
            )
            out = out + fold_l(lyr, jnp.sum(lw, axis=1, keepdims=True))
            lb = _gauss_logpdf(bs[lyr], 0.0, sp) - _gauss_logpdf(
                bs[lyr], rep_l(lyr, mb), rep_l(lyr, _softplus(rb))
            )
            out = out + fold_l(lyr, lb)
        return out  # (S, 1)

    def slice_t(e, t, R):
        return jax.lax.slice_in_dim(e, (t - 1) * R, t * R, axis=0)

    def core_weights(v_, alpha_):
        # N·f(v) (ref psvi_classes.py:111,1358-1360,1486-1488)
        if cfg.parameterised:
            mxv = jnp.max(v_, axis=1, keepdims=True)
            e = jnp.exp(v_ - mxv)
            fv = e / jnp.sum(e, axis=1, keepdims=True)
        else:
            fv = v_
        if cfg.use_alpha:
            fv = jnp.exp(alpha_[0, 0]) * fv
        return cfg.N * fv

    def nested(u_, v_, alpha_, ypse_):
        cw = core_weights(v_, alpha_)  # (1, M)

        def inner_elbo_u(p, ew, eb):
            # ref psvi_classes.py:488-511 (Σ over S, not mean)
            Ws, bs = sampled_theta(p, ew, eb)
            nllu = forward_nll(Ws, bs, u_, ypse_, M)  # (S, M)
            pseudo = jax.lax.dot_general(
                nllu, cw, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_EXACT,
            )  # (S, 1)
            return jnp.sum(pseudo) + kl_term(p)

        def one_iter(t, p, m_t, n_t, ew, eb):
            loss_t, g = jax.value_and_grad(inner_elbo_u)(p, ew, eb)
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
            return p, m_t, n_t, loss_t

        if cfg.remat:
            # recompute each iteration's forward in the reverse sweep —
            # keeps the kernel inside Mosaic's scoped-VMEM budget
            one_iter = jax.checkpoint(one_iter, static_argnums=(0,))

        p = tuple(params0)
        m_t = tuple(jnp.zeros_like(x) for x in p)
        n_t = tuple(jnp.zeros_like(x) for x in p)
        inner_losses = []
        for t in range(1, T + 1):
            ew = [
                slice_t(eps_wi[lyr], t, S * widths[lyr + 1]) for lyr in range(L)
            ]
            eb = [
                slice_t(eps_bi[lyr], t, S * widths[lyr + 1]) for lyr in range(L)
            ]
            p, m_t, n_t, loss_t = one_iter(t, p, m_t, n_t, ew, eb)
            inner_losses.append(loss_t)

        # outer negative PSVI-ELBO on (u_, xb) with fresh noise (ref :445-486)
        Wo, bo = sampled_theta(p, eps_wo, eps_bo)
        nllu = forward_nll(Wo, bo, u_, ypse_, M)  # (S, M)
        nllb = forward_nll(Wo, bo, xb, ybat, B)  # (S, B)
        pseudo = jax.lax.dot_general(
            nllu, cw, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
                precision=_EXACT,
        )  # (S, 1)
        data = (cfg.N / B) * jnp.sum(nllb, axis=1, keepdims=True)  # (S, 1)
        nkl = sampled_nkl(p, Wo, bo)  # (S, 1)
        log_w = -pseudo + nkl  # (S, 1)
        mxw = jnp.max(log_w, axis=0, keepdims=True)
        expw = jnp.exp(log_w - mxw)
        wts = expw / jnp.sum(expw, axis=0, keepdims=True)
        loss = jnp.sum(wts * (data - pseudo)) - jnp.mean(log_w)
        return loss, (p, tuple(inner_losses))

    if cfg.learn_z:
        # regressor learn_z: the Gaussian pseudo-targets are hyperparams
        # too (ref PSVI_regressor optimizes z, psvi_classes.py:2176-2178)
        (loss, aux), grads = jax.value_and_grad(
            nested, argnums=(0, 1, 2, 3), has_aux=True
        )(u, v, alpha, ypse)
    else:
        (loss, aux), (g_u, g_v, g_alpha) = jax.value_and_grad(
            nested, argnums=(0, 1, 2), has_aux=True
        )(u, v, alpha, ypse)
        grads = (g_u, g_v, g_alpha, jnp.zeros_like(ypse))
    return loss, aux, grads


def _kernel(*refs, cfg: FusedCfg):
    L, T = cfg.L, cfg.T
    n_in = 4 * L + 5 + 4 * L + 2  # params, u/v/alpha/ypse/ybat, eps, xb/lr
    ins, outs = refs[:n_in], refs[n_in:]
    params0 = tuple(r[:] for r in ins[: 4 * L])
    u, v, alpha, ypse, ybat = (r[:] for r in ins[4 * L : 4 * L + 5])
    k = 4 * L + 5
    eps_wi = [ins[k + lyr][:] for lyr in range(L)]
    eps_bi = [ins[k + L + lyr][:] for lyr in range(L)]
    eps_wo = [ins[k + 2 * L + lyr][:] for lyr in range(L)]
    eps_bo = [ins[k + 3 * L + lyr][:] for lyr in range(L)]
    xb = ins[k + 4 * L][:]
    lr_s = ins[k + 4 * L + 1][0, 0]

    loss, (pT, inner_losses), (g_u, g_v, g_alpha, g_z) = _nested_core(
        params0, u, v, alpha, ypse, ybat,
        eps_wi, eps_bi, eps_wo, eps_bo, xb, lr_s, cfg,
    )
    loss_ref, losses_ref = outs[0], outs[1]
    loss_ref[0, 0] = loss
    for t in range(T):
        losses_ref[0, t] = inner_losses[t]
    for i in range(4 * L):
        outs[2 + i][:] = pT[i]
    outs[2 + 4 * L][:] = g_u
    outs[3 + 4 * L][:] = g_v
    outs[4 + 4 * L][0, 0] = g_alpha[0, 0]
    outs[5 + 4 * L][:] = g_z


@functools.partial(
    jax.jit, static_argnames=("cfg", "backend", "interpret")
)
def fused_nested_outer(
    params0: tuple, u, v, alpha, ypse, ybat,
    eps_wi: tuple, eps_bi: tuple, eps_wo: tuple, eps_bo: tuple,
    xb, lr,
    cfg: FusedCfg,
    backend: str = "pallas",
    interpret: bool = False,
):
    """Run the fused nested outer step.

    backend='pallas': one Mosaic kernel (TPU). backend='xla': the same
    math as a regular traced function (CPU fallback / numerics oracle).
    Returns ``(loss, inner_losses (T,), paramsT flat tuple, g_u, g_v,
    g_alpha)``.
    """
    if backend == "xla" or not _PALLAS_OK:
        loss, (pT, inner_losses), (g_u, g_v, g_alpha, g_z) = _nested_core(
            tuple(params0), u, v, alpha, ypse, ybat,
            list(eps_wi), list(eps_bi), list(eps_wo), list(eps_bo),
            xb, lr[0, 0], cfg,
        )
        return loss, jnp.stack(inner_losses), pT, g_u, g_v, g_alpha, g_z

    L, T, M = cfg.L, cfg.T, cfg.M
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    flat_in = (
        list(params0) + [u, v, alpha, ypse, ybat]
        + list(eps_wi) + list(eps_bi) + list(eps_wo) + list(eps_bo)
        + [xb, lr]
    )
    out_shape = (
        [
            jax.ShapeDtypeStruct((1, 1), jnp.float32),  # loss
            jax.ShapeDtypeStruct((1, T), jnp.float32),  # inner losses
        ]
        + [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in params0]
        + [
            jax.ShapeDtypeStruct((M, cfg.D), jnp.float32),  # g_u
            jax.ShapeDtypeStruct((1, M), jnp.float32),  # g_v
            jax.ShapeDtypeStruct((1, 1), jnp.float32),  # g_alpha
            jax.ShapeDtypeStruct((cfg.nc, M), jnp.float32),  # g_z
        ]
    )
    out = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg),
        out_shape=tuple(out_shape),
        in_specs=[vmem() for _ in range(len(flat_in) - 1)] + [smem()],
        out_specs=tuple(
            [smem(), smem()]
            + [vmem()] * (4 * L)
            + [vmem(), vmem(), smem(), vmem()]
        ),
        interpret=interpret,
    )(*flat_in)
    loss, inner_losses = out[0], out[1]
    pT = tuple(out[2 : 2 + 4 * L])
    g_u, g_v, g_alpha, g_z = out[2 + 4 * L :]
    return loss[0, 0], inner_losses[0], pT, g_u, g_v, g_alpha, g_z


# conservative VMEM guard for the auto path: all per-iteration live
# tensors (activations, block-diag operators, eps slices) must fit VMEM
_MAX_WIDTH_X_S = 2048  # S·width cap (block-diag operator rows/cols)
_MAX_POINTS = 2048  # M + B cap (activation lanes)


def supports(engine) -> bool:
    """True when the engine's nested step can run as the fused kernel:
    all-dense mean-field net (VILinear [+ ReLU]) — the logreg, ``fn``
    and regressor families — categorical (fixed hard labels) or Gaussian
    likelihood, plain (non-truncated) nested trainer, inner Adam, f32
    compute, no mesh sharding of eps/batch."""
    from psvi_tpu.models.layers import ReLU, Sequential, VILinear

    net = engine.net
    if not isinstance(net, Sequential):
        return False
    dense = [l for l in net.layers if type(l) is VILinear]
    if not dense or not all(
        type(l) in (VILinear, ReLU) for l in net.layers
    ):
        return False
    # structure must be VILinear (ReLU VILinear)*
    expect_dense = True
    for l in net.layers:
        if expect_dense != (type(l) is VILinear):
            return False
        expect_dense = not expect_dense
    if type(net.layers[-1]) is not VILinear:
        return False
    if not all(
        l.use_bias and l.compute_dtype == "float32" and l.count_kl
        for l in dense
    ):
        return False
    # FusedCfg carries ONE prior_sd; a custom net with per-layer priors
    # would silently get the wrong KL/NKL (ADVICE r03; all built-in
    # builders are uniform).
    if not all(l.prior_sd == dense[0].prior_sd for l in dense):
        return False
    # Under the trial-parallel runner the step is wrapped in jax.vmap —
    # a vmapped pallas_call (SMEM scalar outputs) is an untested Mosaic
    # path; fall back to the plain XLA step there (ADVICE r03 /
    # parallel/trials.py).
    if getattr(engine, "_in_trial_vmap", False):
        return False
    widths = [dense[0].in_dim] + [l.out_dim for l in dense]
    S = engine.mc_samples
    if max(widths) * S > _MAX_WIDTH_X_S:
        return False
    if engine.num_pseudo + engine.data_minibatch > _MAX_POINTS:
        return False
    return (
        engine.trainer == "nested"
        and not engine.truncated
        and engine.inner_optimizer == "adam"
        and engine.likelihood in ("categorical", "gaussian")
        # learn_z with Gaussian targets is a plain hyper-grad on z
        # (regressors); the categorical KLDiv soft-label path is not fused
        and not (engine.spec.learn_z and engine.likelihood == "categorical")
        and not engine.spec.ablated
        and not engine.spec.evaluate_only
        and engine.mc_samples >= 2
        and engine.inner_it >= 1
        and not engine.shard_mc
        and engine.batch_shardings is None
        and engine.num_pseudo > 0
    )
