from yolopoint_tpu.export.homography_adaptation import (
    homography_adaptation_batch,
    export_pseudo_labels,
)
from yolopoint_tpu.export.aot import (
    save_serving_artifact,
    load_serving_artifact,
    ServingModule,
)
