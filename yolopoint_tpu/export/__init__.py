from yolopoint_tpu.export.homography_adaptation import (
    homography_adaptation_batch,
    export_pseudo_labels,
)
