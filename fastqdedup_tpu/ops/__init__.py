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

from ..runtime import configure_jax as _configure_jax

_configure_jax()
