"""aesfhe_tpu: TPU-native CKKS homomorphic AES evaluation framework.

A from-scratch JAX/XLA reimplementation of the capabilities of
songhayeong/aes-fhe (see SURVEY.md): an RNS-CKKS engine (the role of the
closed-source desilofhe backend there) plus the zeta-domain AES round
services built on it.

Set AESFHE_PLATFORM=cpu|tpu|axon to pin the JAX platform before first use
(some environments force a platform via sitecustomize; this knob overrides
it the supported way).
"""
import os as _os

_plat = _os.environ.get("AESFHE_PLATFORM")
if _plat:
    import jax as _jax
    _jax.config.update("jax_platforms", _plat)

__version__ = "0.1.0"
