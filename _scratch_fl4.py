import jax, jax.numpy as jnp, numpy as np
from psvi_tpu.data import read_dataset
from psvi_tpu.inference.psvi import PSVI

T, S, M = 3, 3, 8
data = read_dataset("synth_mnist")
eng = PSVI(data, method="psvi_learn_v", num_pseudo=M, mc_samples=S,
           architecture="lenet", inner_it=T, num_epochs=1,
           data_minibatch=16, log_every=1000, init_sd=1e-3, seed=0)
state = eng.state
k_inner = jax.random.PRNGKey(7)

def hypergrad(u, v):
    def f(u, v):
        paramsT, _, il = eng._run_inner(state.params, eng.net.prep_input(u),
                                        state.z, v, state.alpha, k_inner,
                                        jnp.float32(1e-3))
        leaves = jax.tree_util.tree_leaves(paramsT)
        return sum(jnp.sum(jnp.sin(x)) for x in leaves) + jnp.sum(il)
    return jax.grad(f, argnums=(0, 1))(u, v)

g_tpu = hypergrad(state.u, state.v)
with jax.default_matmul_precision("highest"):
    g_hi = jax.jit(hypergrad)(state.u, state.v)
for a, b, nm in zip(g_tpu, g_hi, ("u", "v")):
    cos = float(jnp.sum(a*b) / (jnp.linalg.norm(a)*jnp.linalg.norm(b) + 1e-30))
    print(f"plain engine TPU default-vs-highest precision: grad {nm} cos={cos:.4f}")
