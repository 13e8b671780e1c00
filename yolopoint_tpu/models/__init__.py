"""Flax model zoo: YOLOPoint N/S/M/L/X + variants.

Re-designed from `/root/reference/src/models/` (YOLOPoint.py, common.py,
yolo.py) as idiomatic Flax/NHWC modules. Submodule names intentionally mirror
the reference's attribute names so torch checkpoints map 1:1 through
`yolopoint_tpu.models.convert`.
"""

from yolopoint_tpu.models.blocks import (
    ConvBnAct,
    Bottleneck,
    BottleneckV8,
    BottleneckCSP,
    C3,
    C3MP,
    C3TR,
    C3SPP,
    C3Ghost,
    C2f,
    SPP,
    SPPF,
    Focus,
    GhostConv,
    GhostBottleneck,
    DWConv,
    TransformerBlock,
    TransformerLayer,
    contract,
    expand,
    make_divisible,
)
from yolopoint_tpu.models.detect import Detect, ANCHORS_DEFAULT
from yolopoint_tpu.models.yolopoint import (
    YOLOPoint,
    YOLOPointv52,
    YOLOPointDet,
    SuperPointNet,
    YOLOv8Point,
    build_model,
    VERSION_MULTIPLIERS,
)
from yolopoint_tpu.models.yolopoint import REFERENCE_MODULE_ORDER
from yolopoint_tpu.models.convert import (
    fold_batch_norm,
    load_torch_checkpoint,
    merge_partial_variables,
    torch_state_dict_to_variables,
    transplant_yolo_backbone,
)
