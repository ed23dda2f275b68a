"""2-process multi-controller dryrun on CPU (VERDICT round-1 item 9).

Spawns TWO OS processes, each with 4 forced host devices, wires them with
``jax.distributed.initialize`` into one 8-device global mesh, and runs:

  1. trial-sharded PSVI outer-ELBO grads (8 trials over mesh 'trial') —
     per-trial math, zero collectives, the trial-DP production sharding;
  2. batch-sharded PSVI ELBO grad (minibatch rows over mesh 'data') — the
     data-NLL row-sum becomes a CROSS-PROCESS psum inserted by XLA.

This is the executable story for the BASELINE.md "1 chip → 2 hosts"
target in an environment with a single physical chip: the same program,
meshes, and collectives, exercised over two real OS processes.

Usage: python scripts/multihost_dryrun.py            (parent: spawns workers)
       python scripts/multihost_dryrun.py --worker N (internal)
"""

import os
import subprocess
import sys

PORT = 12731


def worker(pid: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, "/root/repo")

    from psvi_tpu.parallel.distributed import (
        global_mesh,
        initialize_distributed,
        make_global_array,
    )

    assert initialize_distributed(
        coordinator_address=f"127.0.0.1:{PORT}", num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from psvi_tpu.data import read_dataset
    from psvi_tpu.models import make_fcnet
    from psvi_tpu.ops import elbo as E

    data = read_dataset("halfmoon")  # deterministic → identical on both hosts
    net = make_fcnet(2, 16, 2, n_layers=1, init_sd=1e-3)
    params = net.init(jax.random.PRNGKey(1))
    M, B, S = 8, 64, 4
    u = np.asarray(data.x[:M])
    z = np.asarray(data.y[:M])
    xb_np = np.asarray(data.x[M:M + B])
    yb_np = np.asarray(data.y[M:M + B])

    # 1) trial-DP: 8 independent ELBO grads, one per mesh 'trial' slot
    mesh_t = global_mesh(trial=8)
    eps = net.sample_eps(jax.random.PRNGKey(2), S)
    eps8 = jax.tree_util.tree_map(
        lambda e: np.broadcast_to(np.asarray(e)[None], (8,) + e.shape).copy(),
        eps,
    )
    eps8 = jax.tree_util.tree_map(
        lambda e: make_global_array(
            e, mesh_t, P("trial", *([None] * (np.ndim(e) - 1)))
        ),
        eps8,
    )
    v = jnp.full((M,), data.N / M)

    @jax.jit
    def trial_grads(params, eps8):
        def one(p, eps):
            return jax.grad(
                lambda q: E.psvi_elbo(net, q, eps, u, z, v, xb_np, yb_np,
                                      data.N, nc=2)
            )(p)

        return jax.vmap(one, in_axes=(None, 0))(params, eps8)

    g = trial_grads(params, eps8)
    jax.block_until_ready(g)
    leaf = jax.tree_util.tree_leaves(g)[0]
    assert bool(jnp.all(jnp.isfinite(leaf))), "trial-DP grads not finite"

    # 2) batch-DP: minibatch rows sharded over 'data' → cross-process psum
    mesh_d = global_mesh(trial=1, data=8)
    xb = make_global_array(xb_np, mesh_d, P("data", None))
    yb = make_global_array(yb_np, mesh_d, P("data"))

    @jax.jit
    def dp_grad(params, xb, yb):
        # global arrays must be ARGUMENTS, not closed-over constants
        return jax.grad(
            lambda p: E.psvi_elbo(net, p, eps, u, z, v, xb, yb, data.N, nc=2)
        )(params)

    g2 = dp_grad(params, xb, yb)
    jax.block_until_ready(g2)
    leaf2 = jax.tree_util.tree_leaves(g2)[0]
    assert bool(jnp.all(jnp.isfinite(leaf2))), "batch-DP grad not finite"

    print(f"[worker {pid}] multihost dryrun OK "
          f"(processes={jax.process_count()}, devices={len(jax.devices())})",
          flush=True)


def main():
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
        return
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    ok = True
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        if p.returncode != 0 or "multihost dryrun OK" not in out:
            ok = False
            print(f"--- worker {i} FAILED (rc={p.returncode}) ---\n{out}")
        else:
            print(out.strip().splitlines()[-1])
    if not ok:
        raise SystemExit(1)
    print("multihost_dryrun: 2 processes x 4 devices = 8-device global mesh OK")


if __name__ == "__main__":
    main()
