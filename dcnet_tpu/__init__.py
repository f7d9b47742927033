"""dcnet_tpu — TPU-native video-text grounding framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
mengcaopku/DCNet ("Correspondence Matters for Video Referring Expression
Comprehension", ACM MM 2022): one-stage anchor-based grounding with
dual (inter-frame + cross-modal) correspondence, on TPU.
"""

from dcnet_tpu.config import DCNetConfig

__all__ = ["DCNetConfig"]
__version__ = "0.1.0"
