"""Device-resident geometry / decode / NMS op library.

These are the kernels the reference delegates to numpy loops, torchvision,
ATen and OpenCV (see SURVEY.md §2.3/§2.9); here they are fixed-shape JAX ops
(with Pallas kernels for the hot paths) so the whole post-net pipeline stays
on device.
"""

from yolopoint_tpu.ops.geometry import (
    warp_points,
    homography_scaling,
    warp_image,
    compute_valid_mask,
    filter_points_mask,
    scatter_points,
    points_to_label_map,
    warp_label_map,
)
from yolopoint_tpu.ops.heatmap import (
    labels_to_cells,
    cells_to_heatmap,
    cell_valid_mask,
)
from yolopoint_tpu.ops.keypoints import (
    simple_nms,
    extract_keypoints,
)
from yolopoint_tpu.ops.boxes import (
    xywh2xyxy,
    xyxy2xywh,
    xywhn2xyxy,
    xyxy2xywhn,
    clip_boxes,
    scale_boxes,
    box_iou,
    bbox_iou,
)
from yolopoint_tpu.ops.nms import batched_box_nms, fused_detect_nms
from yolopoint_tpu.ops.pallas_nms import nms_tile_reduce, pallas_available
from yolopoint_tpu.ops.sampling import (
    grid_sample,
    sample_descriptors,
)
from yolopoint_tpu.ops.matching import mutual_nearest_neighbor
from yolopoint_tpu.ops.homography import (
    sample_homography_np,
    sample_homography_batch,
    perspective_transform,
)
