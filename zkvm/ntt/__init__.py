"""NTT layer: radix-2 number-theoretic transforms over f128 and coset LDE.

Replaces winterfell's polynomial evaluation/interpolation machinery
(``DefaultTraceLde``/``StarkDomain``, SURVEY.md W2) with batched
device-resident transforms:

* :mod:`zkvm.ntt.golden` — Python-int reference NTT (tests, tiny sizes);
* :mod:`zkvm.ntt.ntt_jax` — batched iterative radix-2 NTT/iNTT and coset
  low-degree extension as JAX limb arithmetic (vectorized butterflies,
  host-precomputed twiddle tables resident on device).
"""

from . import golden

__all__ = ["golden"]
