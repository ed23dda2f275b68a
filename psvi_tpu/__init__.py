"""psvi_tpu — TPU-native black-box coreset variational inference.

A from-scratch JAX/XLA/pjit/Pallas framework with the capabilities of the
reference PyTorch implementation of Black-box Coreset Variational Inference
(PSVI; Manousakas, Ritter, Karaletsos, NeurIPS 2022). The compute path is
pure-functional JAX: reparameterized Monte-Carlo ELBOs vmapped over samples,
`lax.scan`-unrolled differentiable inner optimization replacing the
`higher`/`hypertorch` bilevel machinery, and device-mesh sharding (trials,
MC chains, data batches) replacing process-per-GPU parallelism.

Layout (mirrors SURVEY.md §2 component inventory of the reference):
  models/     variational layers + network factories   (ref: psvi/models/)
  ops/        ELBO kernels, differentiable optimizers, hypergradients,
              k-means, Pallas kernels                  (ref: psvi/inference + robust_higher + hypergrad)
  inference/  PSVI engine + variants, baselines,
              selection/scoring, submodular            (ref: psvi/inference/, psvi/submodular/)
  data/       dataset registry, synthetic generators   (ref: psvi/experiments/experiments_utils.py)
  parallel/   mesh + sharding + trial parallelism      (ref: psvi/experiments/flow-psvi-parallel.py)
  utils/      config, PRNG, results, resource logging  (ref: psvi/inference/utils.py misc)
"""

__version__ = "0.1.0"
