"""Joint YOLOPoint losses: keypoint detector, YOLOv5 objects, descriptors.

Fixed-shape, jit-friendly re-designs of
`/root/reference/src/utils/loss_functions.py` — ragged target lists become
padded arrays + masks, the data-dependent `build_targets` expansion becomes a
dense mask formulation, and descriptor sampling uses fixed sample counts with
validity weighting.
"""

from yolopoint_tpu.losses.detector import detector_loss, detector_loss_ce
from yolopoint_tpu.losses.objects import ObjectLossConfig, object_loss
from yolopoint_tpu.losses.descriptor import (
    descriptor_loss_sparse,
    descriptor_loss_dense,
    infonce_loss,
)
