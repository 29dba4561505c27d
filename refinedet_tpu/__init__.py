"""refinedet_tpu — a TPU-native RefineDet object-detection framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the PyTorch
reference (HaoIrving/RefineDet.PyTorch): RefineDet320/512 (+BN variant),
anchor generation & cascade matching, RefineDet multibox losses, fused
two-step decode + NMS post-processing, SSD augmentation, VOC/COCO/SSDD data
pipelines and evaluators, and data-parallel training over a TPU mesh.
"""

__version__ = "0.1.0"
