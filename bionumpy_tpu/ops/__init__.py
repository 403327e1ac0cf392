"""Device (JAX/XLA/Pallas) kernels for the hot compute paths."""
from . import device, kmers, minimizers, pwm, seq

__all__ = ["device", "kmers", "minimizers", "pwm", "seq"]
