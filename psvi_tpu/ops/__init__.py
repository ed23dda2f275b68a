from psvi_tpu.ops import elbo, optim  # noqa: F401
