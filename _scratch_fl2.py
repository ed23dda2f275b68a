import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from psvi_tpu.ops import fused_lenet as FL

S, M = 3, 8
cfg = FL.LeNetCfg(T=1, S=S, M=M, nc=10, N=60000.0, parameterised=True,
                  use_alpha=False, prior_sd=1.0, eps_mode="input")
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 80)
pshapes = cfg.param_shapes()
p = tuple(0.1 * jax.random.normal(ks[i], s) for i, s in enumerate(pshapes))
eshapes = FL._eps_shapes(cfg)
eps = tuple(jax.random.normal(ks[20 + i], s) for i, s in enumerate(eshapes))
patches = tuple(jax.random.normal(ks[40 + i], (cfg.q, cfg.lanes)) for i in range(4))
v = jax.random.normal(ks[50], (1, M)); alpha = jnp.zeros((1, 1))
ypse = jax.nn.one_hot(jnp.arange(M) % 10, 10).T
dT = tuple(jax.random.normal(ks[52 + i], s) * 0.1 for i, s in enumerate(pshapes))
lr = 1e-3; dl = 0.3

all_inputs = list(p) + list(eps) + list(patches) + [v, alpha, ypse] + list(dT)
NIN = len(all_inputs)

def make_compute(backend):
    body = FL._make_body(cfg, backend)
    C0 = FL._base_mask(cfg)
    def compute(p_, eps_, pat_, v_, al_, yp_, dT_):
        m0 = tuple(jnp.zeros_like(x) for x in p_)
        n0 = tuple(jnp.zeros_like(x) for x in p_)
        def step(pc, patches_, v__, alpha_):
            pn, mn, nn, loss = body(0, pc, m0, n0, eps_, patches_, yp_,
                                    v__, alpha_, jnp.float32(lr), C0)
            return pn, loss
        _, vjp = jax.vjp(step, p_, pat_, v_, al_)
        return vjp((dT_, jnp.float32(dl)))
    return compute

gx = make_compute("xla")(p, eps, patches, v, alpha, ypse, dT)

def kernel(*refs):
    ins, outs = refs[:NIN], refs[NIN:]
    vals = [r[:] for r in ins]
    p_ = tuple(vals[:20]); e_ = tuple(vals[20:30]); pat = tuple(vals[30:34])
    v_, al_, yp_ = vals[34], vals[35], vals[36]
    dT_ = tuple(vals[37:57])
    gdp, gdpat, gdv, gdal = make_compute("pallas")(p_, e_, pat, v_, al_, yp_, dT_)
    for i in range(20): outs[i][:] = gdp[i]
    for i in range(4): outs[20 + i][:] = gdpat[i]
    outs[24][:] = gdv; outs[25][:] = gdal

out_shape = ([jax.ShapeDtypeStruct(s, jnp.float32) for s in pshapes]
             + [jax.ShapeDtypeStruct((cfg.q, cfg.lanes), jnp.float32)]*4
             + [jax.ShapeDtypeStruct((1, M), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32)])
vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
res = pl.pallas_call(
    kernel, out_shape=tuple(out_shape),
    in_specs=[vm()]*NIN, out_specs=tuple([vm()]*26),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
)(*all_inputs)

names = (["p%d" % i for i in range(20)] + ["pat%d" % i for i in range(4)] + ["v", "alpha"])
flatx = list(gx[0]) + list(gx[1]) + [gx[2], gx[3]]
bad = []
for nm, a, b in zip(names, res, flatx):
    d = float(jnp.max(jnp.abs(a - b)))
    nrm = float(jnp.max(jnp.abs(b))) + 1e-30
    if d > 1e-3 * nrm: bad.append((nm, round(d, 4), round(nrm, 3)))
print("BAD:", bad[:12] if bad else "none — compiled matches XLA")
