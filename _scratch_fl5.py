import jax, jax.numpy as jnp, numpy as np
from psvi_tpu.data import read_dataset
from psvi_tpu.inference.psvi import PSVI

T, S, M = 3, 3, 8
data = read_dataset("synth_mnist")
def build(cd):
    eng = PSVI(data, method="psvi_learn_v", num_pseudo=M, mc_samples=S,
               architecture="lenet", inner_it=T, num_epochs=1,
               data_minibatch=16, log_every=1000, init_sd=1e-3, seed=0,
               compute_dtype=cd)
    return eng
e32 = build("float32"); eb16 = build("bfloat16")
state = e32.state
k_inner = jax.random.PRNGKey(7)

def hypergrad(eng, u, v, prec=None):
    def f(u, v):
        paramsT, _, il = eng._run_inner(state.params, eng.net.prep_input(u),
                                        state.z, v, state.alpha, k_inner,
                                        jnp.float32(1e-3))
        leaves = jax.tree_util.tree_leaves(paramsT)
        return sum(jnp.sum(jnp.sin(x)) for x in leaves) + jnp.sum(il)
    if prec:
        with jax.default_matmul_precision(prec):
            return jax.jit(jax.grad(f, argnums=(0, 1)))(u, v)
    return jax.grad(f, argnums=(0, 1))(u, v)

g_hi = hypergrad(e32, state.u, state.v, prec="highest")
g_bf = hypergrad(eb16, state.u, state.v)
for a, b, nm in zip(g_bf, g_hi, ("u", "v")):
    cos = float(jnp.sum(a.astype(jnp.float32)*b) /
                (jnp.linalg.norm(a)*jnp.linalg.norm(b) + 1e-30))
    print(f"engine bf16-vs-f32highest hypergrad {nm}: cos={cos:.4f}")
