"""plvs_tpu — a TPU-native visual(-inertial) SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of PLVS II
(points + lines sparse SLAM, volumetric dense mapping, incremental
segmentation), built data-oriented and batched for TPU hardware rather than
thread-and-pointer-graph C++.
"""

__version__ = "0.1.0"
