"""dipoorlet_tpu: TPU-native post-training quantization framework.

A from-scratch JAX/XLA/Pallas re-design of ModelTC/Dipoorlet's
capabilities: ONNX import, calibration (minmax/hist/OCTAV), weight
transforms (WE/BC/BN-update), reconstruction finetuning
(AdaRound/BRECQ/QDrop/sparse), quantization-error profiling, and
multi-platform deploy parameter emission.
"""
__version__ = "0.1.0"
