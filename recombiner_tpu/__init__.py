"""RECOMBINER-TPU: a TPU-native (JAX/XLA/Pallas) neural codec framework.

Re-designed from scratch with the capabilities of cambridge-mlg/RECOMBINER
(ICLR 2024): variational Bayesian implicit neural representations compressed
with relative entropy (A*) coding, across image/audio/video/protein
modalities.
"""

__version__ = "0.1.0"

from recombiner_tpu.config import CONFIGS, ModalityConfig, get_config  # noqa: F401
