"""Deployment layer: transport-agnostic message schemas + optional ROS node.

Re-design of the reference ROS packages (`/root/reference/src/ros_messages/`,
`demo_ROS.py`, `yolopoint_ros.py`, `demo_ROS_listener.py`): the message
schemas are plain dataclasses with numpy payloads and dict/bytes codecs, so
the serving path works without ROS; a thin rospy adapter (import-gated)
publishes the same topic layout when ROS is present.
"""

from yolopoint_tpu.deploy.messages import (
    KeypointArray,
    ObjectInstance2D,
    ObjectInstance2DArray,
    keypoints_from_pipeline_output,
    objects_from_pipeline_output,
)
