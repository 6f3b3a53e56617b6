"""implicit_depth_tpu — TPU-native depth completion of transparent objects.

Capability surface of NVlabs/implicit_depth (LIDF + RefineNet, CVPR 2021),
re-designed for JAX/XLA/Pallas SPMD. See ARCHITECTURE.md and docs/PARITY.md.
"""

__version__ = "0.1.0"
