"""Message schemas mirroring the reference's ROS IDL, transport-agnostic.

Schemas follow `/root/reference/src/ros_messages/keypoint_msg/msg/
KeypointArray.msg` (uint16 x/y, float32 score, uint8 desc_len, float32
desc_flat) and the `ObjectInstance2D` fields used by the node
(`/root/reference/src/demo_ROS.py:80-114`). Dataclasses with numpy payloads +
dict codecs; the ROS adapter (`ros_node.py`) converts to real rospy messages
when available.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import numpy as np


@dataclasses.dataclass
class KeypointArray:
    """Sparse keypoints + flattened descriptors for one frame."""

    x: np.ndarray            # (N,) uint16
    y: np.ndarray            # (N,) uint16
    score: np.ndarray        # (N,) float32
    desc_len: int            # descriptor dimension (64/128/192/256)
    desc_flat: np.ndarray    # (N * desc_len,) float32
    frame_id: str = ""
    stamp: float = 0.0

    def descriptors(self) -> np.ndarray:
        """(N, D) unflattened descriptors (listener-side reconstruction,
        `/root/reference/src/demo_ROS_listener.py`)."""
        n = len(self.x)
        return self.desc_flat.reshape(n, self.desc_len) if n else np.zeros((0, self.desc_len))

    def to_dict(self) -> dict[str, Any]:
        return {
            "x": self.x.tolist(), "y": self.y.tolist(),
            "score": self.score.tolist(), "desc_len": int(self.desc_len),
            "desc_flat": self.desc_flat.tolist(),
            "frame_id": self.frame_id, "stamp": self.stamp,
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "KeypointArray":
        return cls(
            x=np.asarray(d["x"], np.uint16), y=np.asarray(d["y"], np.uint16),
            score=np.asarray(d["score"], np.float32), desc_len=int(d["desc_len"]),
            desc_flat=np.asarray(d["desc_flat"], np.float32),
            frame_id=d.get("frame_id", ""), stamp=float(d.get("stamp", 0.0)),
        )


@dataclasses.dataclass
class ObjectInstance2D:
    """One 2D detection (subset of the reference Object/ObjectInstance2D
    surface actually populated by the node)."""

    class_name: str
    class_index: int
    class_count: int
    class_probabilities: list[float]
    bounding_box_min_x: int
    bounding_box_min_y: int
    bounding_box_max_x: int
    bounding_box_max_y: int
    is_instance: bool = True
    # optional covariance (packed upper triangle, reference covariance_helper)
    complete_covariance: Optional[np.ndarray] = None

    def to_dict(self) -> dict[str, Any]:
        d = dataclasses.asdict(self)
        if self.complete_covariance is not None:
            d["complete_covariance"] = self.complete_covariance.tolist()
        return d


@dataclasses.dataclass
class ObjectInstance2DArray:
    instances: list[ObjectInstance2D] = dataclasses.field(default_factory=list)
    frame_id: str = ""
    stamp: float = 0.0

    def to_dict(self) -> dict[str, Any]:
        return {
            "instances": [i.to_dict() for i in self.instances],
            "frame_id": self.frame_id, "stamp": self.stamp,
        }


def keypoints_from_pipeline_output(out: dict[str, np.ndarray], frame_id: str = "", stamp: float = 0.0) -> KeypointArray:
    """Build a KeypointArray from `InferencePipeline.process_frame` output
    (the reference `to_ros_msg` keypoint path, `demo_ROS.py:78-86`)."""
    v = out["kp_valid"]
    kp = out["keypoints"][v]
    desc = out["descriptors"][v]
    return KeypointArray(
        x=np.round(kp[:, 0]).astype(np.uint16),
        y=np.round(kp[:, 1]).astype(np.uint16),
        score=out["kp_scores"][v].astype(np.float32),
        desc_len=int(desc.shape[1]) if len(desc) else 0,
        desc_flat=desc.reshape(-1).astype(np.float32),
        frame_id=frame_id, stamp=stamp,
    )


def objects_from_pipeline_output(
    out: dict[str, np.ndarray], names: list[str], frame_id: str = "", stamp: float = 0.0
) -> ObjectInstance2DArray:
    """Build the detection array (reference `to_ros_msg` object path,
    `demo_ROS.py:88-114`)."""
    arr = ObjectInstance2DArray(frame_id=frame_id, stamp=stamp)
    if "boxes" not in out:
        return arr
    for box, score, cls, ok in zip(
        out["boxes"], out["box_scores"], out["box_classes"], out["box_valid"]
    ):
        if not ok:
            continue
        c = int(cls)
        arr.instances.append(
            ObjectInstance2D(
                class_name=names[c] if c < len(names) else str(c),
                class_index=c,
                class_count=len(names),
                class_probabilities=[float(score)],
                bounding_box_min_x=int(box[0]),
                bounding_box_min_y=int(box[1]),
                bounding_box_max_x=int(box[2]),
                bounding_box_max_y=int(box[3]),
            )
        )
    return arr
