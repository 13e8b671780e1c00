"""yolopoint_tpu — a TPU-native (JAX/Flax/Pallas) rebuild of YOLOPoint.

A from-scratch framework with the capabilities of UniBwTAS/YOLOPoint
(arXiv:2402.03989): a shared CSPDarknet backbone with three heads that jointly
predict YOLOv5-style object boxes, SuperPoint-style keypoint heatmaps and dense
descriptors — plus the full surrounding system (training with homographic
adaptation, HPatches/KITTI/COCO evaluation, pseudo-label export, point
tracking, deployment frontend).

Everything on the compute path is fixed-shape, device-resident XLA/Pallas:
ragged point/box lists of the reference become `(max_k, ...)` arrays with
validity masks.

Layout convention: images and feature maps are NHWC (channels-last), which is
the native TPU layout; the torch reference is NCHW (see converter in
`yolopoint_tpu.models.convert`).
"""

__version__ = "0.3.0"
