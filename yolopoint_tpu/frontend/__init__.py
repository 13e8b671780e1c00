"""Inference frontend: device-resident decode pipeline + point tracker + CLI.

Re-design of the reference `YoloPointFrontend`
(`/root/reference/src/demo.py:15-265`): the per-frame path there round-trips
semi to numpy for softmax + serial NMS; here a single jitted program does
forward + heatmap decode + keypoint NMS + box NMS + descriptor sampling and
returns fixed-shape arrays.
"""

from yolopoint_tpu.frontend.pipeline import InferencePipeline, preprocess_frame
from yolopoint_tpu.frontend.tracker import PointTracker
