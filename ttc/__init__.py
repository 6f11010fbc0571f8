"""ttc — TPU-native tropical tree cover framework.

A from-scratch JAX/XLA/Pallas rebuild of the wri/sentinel-tree-cover
pipeline: analysis-ready datacube creation, temporal ConvGRU U-Net tree
cover segmentation, mosaicking, resegmentation, and change detection.
"""

__version__ = "0.1.0"
