import jax, jax.numpy as jnp, numpy as np
from psvi_tpu.data import read_dataset
from psvi_tpu.inference.psvi import PSVI
from psvi_tpu.ops import fused_lenet as FL

T, S, M = 3, 3, 4
data = read_dataset("synth_mnist")
eng = PSVI(data, method="psvi_learn_v", num_pseudo=M, mc_samples=S,
           architecture="lenet", inner_it=T, num_epochs=1,
           data_minibatch=16, log_every=1000, init_sd=1e-3, seed=0)
cfg = FL.LeNetCfg(T=T, S=S, M=M, nc=eng.nc, N=float(eng.N),
                  parameterised=True, use_alpha=False,
                  prior_sd=1.0, eps_mode="input")
state = eng.state
lidx = [0, 3, 7, 9, 11]
p_flat = FL.pack_params(tuple(state.params[i] for i in lidx), cfg)
patches = FL.lenet_patches(state.u, cfg)
k_inner = jax.random.PRNGKey(7)
keys = jax.random.split(k_inner, T)
eps_ts = [eng.net.sample_eps(k, S) for k in keys]
def kernel_eps(e):
    K1, K2, q, f = cfg.K1, cfg.K2, cfg.q, cfg.fc
    c1, c2, f1, f2, f3 = (e[i] for i in lidx)
    return [
        c1["w"].reshape(S * K1, q), c1["b"].reshape(S * K1, 1),
        jnp.transpose(c2["w"].reshape(S, K2, K1, q), (0, 1, 3, 2)).reshape(S * K2, q * K1),
        c2["b"].reshape(S * K2, 1),
        jnp.transpose(f1["w"].reshape(S, f[1], K2, 25), (0, 1, 3, 2)).reshape(S * f[1], f[0]),
        f1["b"].reshape(S * f[1], 1),
        f2["w"].reshape(S * f[2], f[1]), f2["b"].reshape(S * f[2], 1),
        jnp.transpose(f3["w"], (1, 0, 2)).reshape(cfg.nc * S, f[2]),
        jnp.transpose(f3["b"], (1, 0)).reshape(cfg.nc * S, 1),
    ]
stacks = [kernel_eps(e) for e in eps_ts]
stacks = tuple(jnp.concatenate([s[i] for s in stacks], axis=0) for i in range(10))
v = state.v.reshape(1, M); alpha = state.alpha.reshape(1, 1)
ypse = jax.nn.one_hot(state.z.astype(jnp.int32), cfg.nc).T
lr = jnp.full((1, 1), 1e-3, jnp.float32)
seed = jnp.zeros((1, 2), jnp.float32)

fx = FL.make_fused_unroll(cfg, backend="xla")
fp = FL.make_fused_unroll(cfg, backend="pallas")
pT_x, ls_x = fx(p_flat, patches, v, alpha, ypse, stacks, lr, seed)
pT_p, ls_p = fp(p_flat, patches, v, alpha, ypse, stacks, lr, seed)
np.testing.assert_allclose(np.asarray(ls_p), np.asarray(ls_x), rtol=1e-4)
for i, (a, b) in enumerate(zip(pT_p, pT_x)):
    np.testing.assert_allclose(a, b, atol=6.5e-3, err_msg=f"tensor {i}")
print("kernel A matches XLA fallback")

proj = [jax.random.normal(jax.random.PRNGKey(100 + i), x.shape) for i, x in enumerate(pT_x)]
def f(fn, pats, v_, al_):
    pT, ls = fn(p_flat, pats, v_, al_, ypse, stacks, lr, seed)
    return sum(jnp.sum(a * w) for a, w in zip(pT, proj)) + jnp.sum(ls)
gx = jax.grad(lambda pa, v_, al_: f(fx, pa, v_, al_), argnums=(0,1,2))(patches, v, alpha)
gp = jax.grad(lambda pa, v_, al_: f(fp, pa, v_, al_), argnums=(0,1,2))(patches, v, alpha)
for a, b, nm in zip(gp, gx, ("patches", "v", "alpha")):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    for x1, x2 in zip(la, lb):
        cos = float(jnp.sum(x1*x2) / (jnp.linalg.norm(x1)*jnp.linalg.norm(x2) + 1e-30))
        print(f"grad {nm}: cos={cos:.6f} maxdiff={float(jnp.max(jnp.abs(x1-x2))):.3e}")
