"""Microbenchmark: alternative S-batched conv formulations inside the
bilevel unroll (docs/ROADMAP.md perf item 1).

The flagship LeNet nested step spends ~0.4 ms x 2 per inner iteration in
XLA's sliding-window multiply_reduce fusion for conv1's (6,1,5,5) filter
gradient (reverse and reverse-over-reverse). This script times one full
nested step (inner_it differentiable Adam steps + outer grad wrt u,v)
under different conv implementations, on the real chip:

  vmap     — baseline: vmap(lax.conv) over S, NCHW (current production)
  group    — single conv with feature_group_count=S (the reference's
             groups trick, psvi/models/neural_net.py:213-246)
  nhwc     — vmap conv with NHWC activations / HWIO weights
  patch    — im2col: stack k*k shifted slices, contract with an einsum
             (filter-grad transpose becomes a plain matmul)
  patch1   — patch formulation for conv1 only (C_in=1), vmap conv for conv2
  bf16     — vmap conv with bf16 activations+weights, f32 elsewhere

Run:  python scripts/conv_formulations_bench.py [--steps 8] [--variants ...]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

S, M, B, INNER_IT = 10, 100, 256, 20
N_TRAIN = 60000
LR = 1e-3


# ----------------------------------------------------------------------
# conv formulations: x (S, N, C, H, W), w (S, K, C, kh, kw) -> (S, N, K, OH, OW)
# ----------------------------------------------------------------------

def conv_vmap(x, w, stride, padding):
    pad = [(padding, padding)] * 2

    def one(xs, ws):
        return jax.lax.conv_general_dilated(
            xs, ws, (stride, stride), pad,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    return jax.vmap(one)(x, w)


def conv_group(x, w, stride, padding):
    # merge S into channels; feature_group_count=S
    s, n, c, h, wd = x.shape
    k = w.shape[1]
    xg = x.transpose(1, 0, 2, 3, 4).reshape(n, s * c, h, wd)
    wg = w.reshape(s * k, c, w.shape[3], w.shape[4])
    y = jax.lax.conv_general_dilated(
        xg, wg, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=s,
    )
    oh, ow = y.shape[-2:]
    return y.reshape(n, s, k, oh, ow).transpose(1, 0, 2, 3, 4)


def conv_nhwc(x, w, stride, padding):
    # x (S,N,C,H,W) -> NHWC conv per sample
    pad = [(padding, padding)] * 2

    def one(xs, ws):
        return jax.lax.conv_general_dilated(
            xs.transpose(0, 2, 3, 1),
            ws.transpose(2, 3, 1, 0),
            (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).transpose(0, 3, 1, 2)

    return jax.vmap(one)(x, w)


def conv_patch(x, w, stride, padding):
    """im2col: y[s,n,o,h,w] = sum_{c,i,j} xpad[s,n,c,h*st+i,w*st+j] w[s,o,c,i,j].

    The einsum's transpose wrt w is a matmul with contraction over
    (n, h, w) — MXU-friendly — instead of a sliding-window reduce.
    """
    s, n, c, h, wd = x.shape
    k = w.shape[3]
    K = w.shape[1]
    xp = jnp.pad(x, ((0, 0),) * 3 + ((padding, padding), (padding, padding)))
    oh = (h + 2 * padding - k) // stride + 1
    ow = (wd + 2 * padding - k) // stride + 1
    cols = []
    for i in range(k):
        for j in range(k):
            cols.append(
                xp[:, :, :, i : i + stride * oh : stride,
                   j : j + stride * ow : stride]
            )
    xs = jnp.stack(cols, axis=2)  # (S, N, P, C, OH, OW), P=k*k
    wf = w.reshape(s, K, c, k * k).transpose(0, 1, 3, 2)  # (S, K, P, C)
    return jnp.einsum("snpchw,sopc->snohw", xs, wf)


def make_conv_bf16(base):
    def conv(x, w, stride, padding):
        y = base(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                 stride, padding)
        return y.astype(jnp.float32)

    return conv


VARIANTS = {
    "vmap": (conv_vmap, conv_vmap),
    "group": (conv_group, conv_group),
    "nhwc": (conv_nhwc, conv_nhwc),
    "patch": (conv_patch, conv_patch),
    "patch1": (conv_patch, conv_vmap),  # conv1 patch, conv2 vmap
    "bf16": (make_conv_bf16(conv_vmap), make_conv_bf16(conv_vmap)),
    "patch1_bf16": (make_conv_bf16(conv_patch), make_conv_bf16(conv_vmap)),
}


# ----------------------------------------------------------------------
# minimal LeNet bilevel step with pluggable conv
# ----------------------------------------------------------------------

def softplus(x):
    return jax.nn.softplus(x)


def lenet_init(key):
    init_sd = 1e-3
    rho = np.log(np.expm1(init_sd)).astype(np.float32)
    ks = jax.random.split(key, 8)

    def unif(k, shape, fan_in):
        b = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(k, shape, jnp.float32, -b, b)

    return {
        "c1w": unif(ks[0], (6, 1, 5, 5), 25), "c1wr": jnp.full((6, 1, 5, 5), rho),
        "c1b": unif(ks[1], (6,), 25), "c1br": jnp.full((6,), rho),
        "c2w": unif(ks[2], (16, 6, 5, 5), 150), "c2wr": jnp.full((16, 6, 5, 5), rho),
        "c2b": unif(ks[3], (16,), 150), "c2br": jnp.full((16,), rho),
        "f1w": unif(ks[4], (120, 400), 400), "f1wr": jnp.full((120, 400), rho),
        "f1b": unif(ks[5], (120,), 400), "f1br": jnp.full((120,), rho),
        "f2w": unif(ks[6], (84, 120), 120), "f2wr": jnp.full((84, 120), rho),
        "f2b": unif(ks[7], (84,), 120), "f2br": jnp.full((84,), rho),
        "f3w": unif(ks[0], (10, 84), 84), "f3wr": jnp.full((10, 84), rho),
        "f3b": unif(ks[1], (10,), 84), "f3br": jnp.full((10,), rho),
    }


def sample_eps(key, params):
    keys = jax.random.split(key, len(params) // 2)
    eps = {}
    for i, name in enumerate([k for k in params if not k.endswith("r")]):
        eps[name] = jax.random.normal(keys[i], (S,) + params[name].shape)
    return eps


def pool(x):
    *lead, H, W = x.shape
    y = x.reshape(*lead, H // 2, 2, W // 2, 2)
    return jnp.max(y, axis=(-3, -1))


def forward(params, eps, x, conv1, conv2):
    def theta(name):
        return params[name][None] + softplus(params[name + "r"])[None] * eps[name]

    x = jnp.broadcast_to(x[None], (S,) + x.shape)
    w = theta("c1w")
    y = conv1(x, w, 1, 2) + theta("c1b")[:, None, :, None, None]
    y = pool(jax.nn.relu(y))
    y = conv2(y, theta("c2w"), 1, 0) + theta("c2b")[:, None, :, None, None]
    y = pool(jax.nn.relu(y))
    y = y.reshape(*y.shape[:2], -1)
    y = jnp.einsum("sni,soi->sno", y, theta("f1w")) + theta("f1b")[:, None]
    y = jax.nn.relu(y)
    y = jnp.einsum("sni,soi->sno", y, theta("f2w")) + theta("f2b")[:, None]
    y = jax.nn.relu(y)
    y = jnp.einsum("sni,soi->sno", y, theta("f3w")) + theta("f3b")[:, None]
    return y  # (S, N, 10)


def nll(logits, y):
    logp = jax.nn.log_softmax(logits, -1)
    return -jnp.take_along_axis(
        logp, y[None, :, None].astype(jnp.int32), axis=-1
    )[..., 0]  # (S, N)


def kl_dense(params):
    total = 0.0
    for name in ["f1w", "f1b", "f2w", "f2b", "f3w", "f3b"]:
        sd = softplus(params[name + "r"])
        total = total + jnp.sum(
            -jnp.log(sd) + (sd**2 + params[name] ** 2) / 2.0 - 0.5
        )
    return total


def nkl_dense(params, eps):
    out = 0.0
    for name in ["f1w", "f1b", "f2w", "f2b", "f3w", "f3b"]:
        sd = softplus(params[name + "r"])
        th = params[name][None] + sd[None] * eps[name]
        axes = tuple(range(1, th.ndim))
        lp = jnp.sum(-0.5 * th**2, axis=axes)
        lq = jnp.sum(-0.5 * eps[name] ** 2 - jnp.log(sd)[None], axis=axes)
        out = out + (lp - lq)
    return out


def make_step(conv1, conv2):
    fwd = functools.partial(forward, conv1=conv1, conv2=conv2)

    def inner_loss(params, eps, u, z, v):
        logits = fwd(params, eps, u)
        w = N_TRAIN * jax.nn.softmax(v)
        return jnp.mean(jnp.sum(nll(logits, z) * w[None], axis=1)) + kl_dense(params)

    def adam_step(p, g, m, v_, t):
        b1, b2, e = 0.9, 0.999, 1e-8
        m = jax.tree.map(lambda a, b: b1 * a + (1 - b1) * b, m, g)
        v_ = jax.tree.map(lambda a, b: b2 * a + (1 - b2) * b * b, v_, g)
        mh = jax.tree.map(lambda a: a / (1 - b1**t), m)
        vh = jax.tree.map(lambda a: a / (1 - b2**t), v_)
        p = jax.tree.map(lambda a, mm, vv: a - LR * mm / (jnp.sqrt(vv) + e), p, mh, vh)
        return p, m, v_

    def outer_loss(hp, params0, key, xb, yb):
        u, v = hp["u"], hp["v"]
        z = hp["z"]

        def body(carry, k):
            p, m, v2, t = carry
            eps = sample_eps(k, p)
            g = jax.grad(inner_loss)(p, eps, u, z, v)
            p, m, v2 = adam_step(p, g, m, v2, t)
            return (p, m, v2, t + 1.0), 0.0

        m0 = jax.tree.map(jnp.zeros_like, params0)
        v0 = jax.tree.map(jnp.zeros_like, params0)
        keys = jax.random.split(key, INNER_IT)
        (pT, _, _, _), _ = jax.lax.scan(body, (params0, m0, v0, 1.0), keys)

        eps = sample_eps(jax.random.fold_in(key, 7), pT)
        w = N_TRAIN * jax.nn.softmax(v)
        logits_all = fwd(pT, eps, jnp.concatenate([u, xb]))
        lu, lx = logits_all[:, :M], logits_all[:, M:]
        pseudo = jnp.sum(nll(lu, z) * w[None], axis=1)
        data = N_TRAIN / B * jnp.sum(nll(lx, yb), axis=1)
        lw = -pseudo + nkl_dense(pT, eps)
        ws = jax.nn.softmax(lw)
        return jnp.sum(ws * (data - pseudo)) - jnp.mean(lw)

    @jax.jit
    def step(hp, params0, key, xb, yb):
        loss, g = jax.value_and_grad(outer_loss)(hp, params0, key, xb, yb)
        return loss, g

    return step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--variants", nargs="*", default=list(VARIANTS))
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    params0 = lenet_init(key)
    hp = {
        "u": jax.random.normal(jax.random.fold_in(key, 1), (M, 1, 28, 28)),
        "v": jnp.zeros((M,)),
        "z": jnp.asarray(np.arange(M) % 10, jnp.float32),
    }
    xb = jax.random.normal(jax.random.fold_in(key, 2), (B, 1, 28, 28))
    yb = jnp.asarray(np.arange(B) % 10, jnp.float32)

    results = {}
    base_loss = None
    for name in args.variants:
        conv1, conv2 = VARIANTS[name]
        step = make_step(conv1, conv2)
        t0 = time.perf_counter()
        loss, g = step(hp, params0, key, xb, yb)
        jax.block_until_ready(loss)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(args.steps):
            loss, g = step(hp, params0, jax.random.fold_in(key, i), xb, yb)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / args.steps
        gnorm = float(
            jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree.leaves(g)))
        )
        results[name] = dt
        if base_loss is None:
            base_loss = float(loss)
        print(
            f"{name:12s} step={dt*1e3:8.2f} ms  compile={compile_s:6.1f}s "
            f"loss={float(loss):+.4f} |g|={gnorm:.4f}",
            flush=True,
        )
    best = min(results, key=results.get)
    print(f"\nbest: {best} ({results[best]*1e3:.2f} ms vs vmap "
          f"{results.get('vmap', float('nan'))*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
