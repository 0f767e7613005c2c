"""Mellow-TPU: a TPU-native (JAX/XLA/Pallas) audio-language inference and
training framework with the capabilities of the Mellow reference stack."""

__version__ = "0.1.0"

from mellow_tpu.config import MellowConfig, get_config  # noqa: F401


def __getattr__(name):
    # Lazy import so `import mellow_tpu` stays cheap and torch-free.
    if name == "MellowWrapper":
        from mellow_tpu.wrapper import MellowWrapper

        return MellowWrapper
    raise AttributeError(name)
