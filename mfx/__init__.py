"""mfx — a TPU-native matrix-factorization training framework.

Brand-new JAX/XLA/Pallas implementation providing the capabilities of the
reference project ``vbarbosadev/MatrixFactorizationSGD.java`` (reference
snapshot: a README-only repo, ``/root/reference/README.md:1-2`` — a Java
SGD matrix factorizer for a UFRN concurrent-programming course), re-designed
TPU-first per ``SURVEY.md`` and ``BASELINE.json``:

- COO rating triples → vectorized minibatches (``mfx.data``)
- fused gather → dot-residual → rank-1 scatter-add SGD updates, with bias and
  L2 terms, as Pallas TPU kernels built on block-local one-hot matmuls that
  run on the MXU (``mfx.kernels``)
- the reference's sequential/Hogwild loop becomes conflict-free (DSGD-style
  block-stratified) minibatch partitioning with segment-sum gradient
  reduction, so training is bitwise-deterministic (``mfx.data.partition``)
- factor matrices shard across a TPU mesh: data-parallel SGD with sparse
  delta exchange, and row-sharded factor tables with ring/all-to-all row
  exchange over ICI (``mfx.parallel``)
- ALS and BPR solvers share the same sparse pipeline (``mfx.solvers``)
"""

from mfx.version import __version__

__all__ = ["__version__"]
