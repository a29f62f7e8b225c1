"""Device-side compute ops (JAX / XLA / Pallas).

The reference's native hot paths and their TPU-native replacements:

* ``_triemodule.c:380-495`` (fast-fail nearest-neighbor trie walk)
  -> :mod:`.hamming` all-pairs XOR/one-hot kernels + :mod:`.bucket`
  pigeonhole candidate generation + :mod:`.components` clustering.
* ``distances.h:8-88`` (scalar distance predicates)
  -> :mod:`.hamming` (batched) and :mod:`.edit` (banded DP, batched).
* ``_fastqmodule.c:38-76`` (phred -> error rate reduction)
  -> :mod:`.phred` (LUT gather + masked mean).

All ops are jit-compatible with static shapes; ragged work is padded and
masked by the callers.
"""

# JAX runtime configuration (persistent compilation cache, stable Mosaic
# cache keys) is applied by the entry points — cli.main(),
# pipeline.deduplicate_cluster(), warmup — via runtime.configure_jax(),
# NOT as an import side effect: embedding hosts that import this package
# alongside other JAX code must not have global config silently changed.
