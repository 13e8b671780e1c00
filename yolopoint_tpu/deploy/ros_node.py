"""Optional ROS1 node adapter (import-gated; the framework has no ROS dep).

Mirrors `/root/reference/src/demo_ROS.py:18-125` and
`/root/reference/src/yolopoint_ros.py:46-145`: subscribe `sensor_msgs/Image`,
run the jitted inference pipeline, publish `keypoints` (KeypointArray with
flattened descriptors) and `objects` (ObjectInstance2DArray), with optional
per-camera static ego-vehicle template masks that suppress keypoints
(reference `:49-56` template loading with 7x7 erosion).

Run inside a ROS environment:
  rosrun <pkg> python -m yolopoint_tpu.deploy.ros_node --weights ... --source /camera/image
"""

from __future__ import annotations

from typing import Mapping, Optional

import numpy as np


class YoloPointRosNode:
    """rospy wrapper around the InferencePipeline.

    Args:
      pipeline: `InferencePipeline` (built with a converted checkpoint).
      names: class names.
      source_topic: `sensor_msgs/Image` topic to subscribe.
      templates: optional `{frame_id: binary mask path}` of static ego-vehicle
        masks; keypoints inside a mask are suppressed before publishing.
    """

    def __init__(
        self,
        pipeline,
        names: list[str],
        source_topic: str,
        img_size: Optional[int] = None,
        templates: Optional[Mapping[str, str]] = None,
        publish: bool = True,
    ):
        import rospy  # gated: only available inside a ROS environment
        from cv_bridge import CvBridge
        from sensor_msgs.msg import Image

        self.rospy = rospy
        self.pipeline = pipeline
        self.names = names
        self.img_size = img_size
        self.bridge = CvBridge()
        self.templates: dict[str, np.ndarray] = {}
        if templates:
            self._load_templates(templates)

        self.publish = publish
        if publish:
            # topic layout matches /root/reference/src/demo_ROS.py:29-30
            self.keypoints_pub = rospy.Publisher("keypoints", self._kp_msg_type(), queue_size=10)
            self.objects_pub = rospy.Publisher("objects", self._obj_msg_type(), queue_size=10)
        self.image_sub = rospy.Subscriber(source_topic, Image, self.callback)

    @staticmethod
    def _kp_msg_type():
        from keypoint_msg.msg import KeypointArray

        return KeypointArray

    @staticmethod
    def _obj_msg_type():
        from object_msgs.msg import ObjectInstance2DArray

        return ObjectInstance2DArray

    def _load_templates(self, templates: Mapping[str, str]) -> None:
        import cv2

        for frame_id, path in templates.items():
            t = cv2.imread(path, 0)
            if t is None:
                continue
            t = cv2.erode(t, np.ones((7, 7), np.uint8), iterations=1)
            self.templates[frame_id] = t

    def callback(self, data) -> None:
        img = self.bridge.imgmsg_to_cv2(data, "bgr8")
        out = self.pipeline.process_frame(img, self.img_size)

        # suppress keypoints inside the static template for this camera
        tpl = self.templates.get(data.header.frame_id)
        if tpl is not None:
            kp = out["keypoints"].astype(int)
            inside = (
                (kp[:, 1] >= 0) & (kp[:, 1] < tpl.shape[0])
                & (kp[:, 0] >= 0) & (kp[:, 0] < tpl.shape[1])
            )
            hit = np.zeros(len(kp), bool)
            hit[inside] = tpl[kp[inside, 1], kp[inside, 0]] > 0
            out["kp_valid"] = out["kp_valid"] & ~hit

        if self.publish:
            self._publish(out, data.header)

    def _publish(self, out, header) -> None:
        from yolopoint_tpu.deploy.messages import (
            keypoints_from_pipeline_output,
            objects_from_pipeline_output,
        )

        kp = keypoints_from_pipeline_output(out)
        KeypointArray = self._kp_msg_type()
        msg = KeypointArray()
        msg.header = header
        msg.x = kp.x
        msg.y = kp.y
        msg.score = kp.score
        msg.desc_len = np.uint8(kp.desc_len)
        msg.desc_flat = kp.desc_flat.astype(float)
        self.keypoints_pub.publish(msg)

        objs = objects_from_pipeline_output(out, self.names)
        ObjectInstance2DArray = self._obj_msg_type()
        arr = ObjectInstance2DArray()
        arr.header = header
        for inst in objs.instances:
            from object_msgs.msg import ObjectInstance2D

            m = ObjectInstance2D()
            m.class_name = inst.class_name
            m.class_index = inst.class_index
            m.class_count = inst.class_count
            m.class_probabilities = inst.class_probabilities
            m.is_instance = inst.is_instance
            m.bounding_box_min_x = inst.bounding_box_min_x
            m.bounding_box_min_y = inst.bounding_box_min_y
            m.bounding_box_max_x = inst.bounding_box_max_x
            m.bounding_box_max_y = inst.bounding_box_max_y
            arr.instances.append(m)
        self.objects_pub.publish(arr)


def main():
    import argparse

    parser = argparse.ArgumentParser(description="YOLOPoint-TPU ROS node")
    parser.add_argument("--weights", required=True)
    parser.add_argument("--source", required=True, help="image topic")
    parser.add_argument("--img-size", type=int, default=None)
    args = parser.parse_args()

    import rospy

    from yolopoint_tpu.frontend.pipeline import InferencePipeline
    from yolopoint_tpu.models import build_model
    from yolopoint_tpu.models.convert import load_weights

    loaded = load_weights(args.weights)
    meta = loaded["meta"]
    names = meta.get("names", [])
    model = build_model(meta.get("model_name", "YOLOPoint"), meta.get("version", "s"),
                        nc=max(len(names), 1))
    pipeline = InferencePipeline(model, loaded["variables"])

    rospy.init_node("yolopoint_tpu")
    YoloPointRosNode(pipeline, names, args.source, args.img_size)
    rospy.spin()


if __name__ == "__main__":
    main()
