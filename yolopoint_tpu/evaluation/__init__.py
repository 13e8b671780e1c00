"""Evaluation harness: HPatches keypoint metrics + YOLO mAP stack.

Host-side numpy (eval-only path, like the reference `src/evaluations/`);
forward passes and decoding run through the device pipeline, only the
per-image metric math lives here.
"""

from yolopoint_tpu.evaluation.detector_eval import (
    batch_precision_recall,
    compute_repeatability,
    warp_keypoints_np,
)
from yolopoint_tpu.evaluation.descriptor_eval import compute_homography_correctness
from yolopoint_tpu.evaluation.yolo_eval import (
    ap_per_class,
    compute_ap,
    process_batch,
    ConfusionMatrix,
    fitness_yolo,
    combined_fitness,
)
