import sys, jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from psvi_tpu.ops import fused_lenet as FL

MODE = sys.argv[1]  # loss1 | loss2 | grad1 (vjp of loss) | gog (vjp of grad)
S, M = 3, int(__import__("os").environ.get("PROBE_M", 8))
cfg = FL.LeNetCfg(T=1, S=S, M=M, nc=10, N=60000.0, parameterised=True,
                  use_alpha=False, prior_sd=1.0, eps_mode="input")
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 80)
pshapes = cfg.param_shapes()
p = tuple(0.1 * jax.random.normal(ks[i], s) for i, s in enumerate(pshapes))
eshapes = FL._eps_shapes(cfg)
eps = tuple(jax.random.normal(ks[20 + i], s) for i, s in enumerate(eshapes))
patches = tuple(0.3 * jax.random.normal(ks[40 + i], (cfg.q, cfg.lanes)) for i in range(4))
v = jax.random.normal(ks[50], (1, M)); alpha = jnp.zeros((1, 1))
ypse = jax.nn.one_hot(jnp.arange(M) % 10, 10).T
dT = tuple(jax.random.normal(ks[52 + i], s) * 0.1 for i, s in enumerate(pshapes))
all_inputs = list(p) + list(eps) + list(patches) + [v, alpha, ypse] + list(dT)
NIN = len(all_inputs)

def make_compute(backend):
    body = FL._make_body(cfg, backend)
    C0 = FL._base_mask(cfg)
    def compute(p_, eps_, pat_, v_, al_, yp_, dT_):
        if MODE == "loss1":  # plain loss value (no vjp at all)
            val = body.inner_loss(p_, eps_, pat_, yp_, v_, al_, C0)
            return (jnp.full((1, 1), val),)
        if MODE in ("gp1", "gp2"):
            roll = FL._make_roll(backend)
            def partial_loss(p__, pat__):
                th = body.sampled(p__, eps_)
                w1, b1, w2, b2 = th[0], th[1], th[2], th[3]
                A = None
                for P_ab in pat__:
                    ya = jax.lax.dot_general(w1, P_ab,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    A = ya if A is None else jnp.maximum(A, ya)
                pooled1 = jnp.maximum(A + b1, 0.0)
                if MODE == "gp1":
                    return jnp.sum(pooled1 * pooled1)
                A2 = None
                for dy in range(cfg.k):
                    for dx in range(cfg.k):
                        dd = dy * cfg.k + dx
                        Wdd = FL._lane_select(w2, dd * cfg.K1, cfg.K1)
                        bd = FL._blockdiag_sample(Wdd, S, cfg.K2, cfg.K1)
                        shifted = pooled1 if dd == 0 else roll(pooled1, -(dy * cfg.P1 + dx))
                        contrib = jax.lax.dot_general(bd, shifted,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        A2 = contrib if A2 is None else A2 + contrib
                B2 = jnp.maximum(A2, roll(A2, -1))
                B2 = jnp.maximum(B2, roll(A2, -cfg.P1))
                B2 = jnp.maximum(B2, roll(A2, -(cfg.P1 + 1)))
                pooled2 = jnp.maximum(B2 + b2, 0.0)
                return jnp.sum(pooled2 * pooled2)
            g = jax.grad(partial_loss, argnums=(0, 1))(p_, pat_)
            return tuple(g[0]) + tuple(g[1])
        if MODE == "grad1":  # FIRST-order vjp of the loss wrt params+hyper
            g = jax.grad(body.inner_loss, argnums=(0, 2, 4))(
                p_, eps_, pat_, yp_, v_, al_)
            return tuple(g[0]) + tuple(g[1]) + (g[2],)
        if MODE == "gog":  # second order: vjp of the grad
            def gfn(p__, pat__, v__):
                g = jax.grad(body.inner_loss)(p__, eps_, pat__, yp_, v__, al_, C0)
                return g
            _, vjp = jax.vjp(gfn, p_, pat_, v_)
            gdp, gdpat, gdv = vjp(dT_)
            return tuple(gdp) + tuple(gdpat) + (gdv,)
        raise SystemExit("mode?")
    return compute

gx = make_compute("xla")(p, eps, patches, v, alpha, ypse, dT)
NOUT = len(gx)

def kernel(*refs):
    ins, outs = refs[:NIN], refs[NIN:]
    vals = [r[:] for r in ins]
    p_ = tuple(vals[:20]); e_ = tuple(vals[20:30]); pat = tuple(vals[30:34])
    v_, al_, yp_ = vals[34], vals[35], vals[36]
    dT_ = tuple(vals[37:57])
    res = make_compute("pallas")(p_, e_, pat, v_, al_, yp_, dT_)
    for i in range(NOUT): outs[i][:] = res[i]

vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
res = pl.pallas_call(
    kernel, out_shape=tuple(jax.ShapeDtypeStruct(x.shape, jnp.float32) for x in gx),
    in_specs=[vm()]*NIN, out_specs=tuple([vm()]*NOUT),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
)(*all_inputs)
bad = []
for i, (a, b) in enumerate(zip(res, gx)):
    d = float(jnp.max(jnp.abs(a - b)))
    nrm = float(jnp.max(jnp.abs(b))) + 1e-30
    if d > 1e-3 * nrm: bad.append((i, round(d/nrm, 4)))
print(MODE, "BAD:", bad[:14] if bad else "none")
