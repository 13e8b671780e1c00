"""Example listener: consume YOLOPoint keypoints + images and track points.

Mirrors `/root/reference/src/demo_ROS_listener.py:14-83`: subscribes the
`keypoints` (KeypointArray) and image topics with an approximate time
synchronizer, un-flattens descriptors, feeds the frame-to-frame
`PointTracker` and displays the tracks. Import-gated; run inside a ROS
environment:

  python -m yolopoint_tpu.deploy.ros_listener --image /camera/image \
      --keypoints keypoints
"""

from __future__ import annotations

import numpy as np

from yolopoint_tpu.deploy.messages import KeypointArray
from yolopoint_tpu.frontend.tracker import PointTracker


class KeypointListener:
    """Time-synchronized (image, KeypointArray) consumer with track drawing."""

    def __init__(
        self,
        image_topic: str,
        keypoint_topic: str = "keypoints",
        max_length: int = 5,
        nn_thresh: float = 0.7,
        show: bool = True,
        slop: float = 0.1,
    ):
        import message_filters
        import rospy
        from cv_bridge import CvBridge
        from keypoint_msg.msg import KeypointArray as RosKeypointArray
        from sensor_msgs.msg import Image

        self.rospy = rospy
        self.bridge = CvBridge()
        self.tracker = PointTracker(max_length=max_length, nn_thresh=nn_thresh)
        self.show = show

        img_sub = message_filters.Subscriber(image_topic, Image)
        kp_sub = message_filters.Subscriber(keypoint_topic, RosKeypointArray)
        sync = message_filters.ApproximateTimeSynchronizer(
            [img_sub, kp_sub], queue_size=10, slop=slop
        )
        sync.registerCallback(self.callback)

    def callback(self, img_msg, kp_msg) -> None:
        img = self.bridge.imgmsg_to_cv2(img_msg, "bgr8")
        kp = KeypointArray(
            x=np.asarray(kp_msg.x, np.uint16),
            y=np.asarray(kp_msg.y, np.uint16),
            score=np.asarray(kp_msg.score, np.float32),
            desc_len=int(kp_msg.desc_len),
            desc_flat=np.asarray(kp_msg.desc_flat, np.float32),
            frame_id=img_msg.header.frame_id,
        )
        pts = np.stack([kp.x.astype(np.float32), kp.y.astype(np.float32), kp.score])
        desc = kp.descriptors().T  # (D, N) like the tracker expects
        self.tracker.update(pts, desc)
        if self.show:
            self._draw(img)

    def _draw(self, img) -> None:
        import cv2

        tracks = self.tracker.get_tracks(min_length=2)
        out = img.copy()
        if len(tracks):
            tracks[:, 1] /= max(self.tracker.nn_thresh, 1e-6)  # normalize score
            self.tracker.draw_tracks(out, tracks)
        cv2.imshow("yolopoint tracks", out)
        cv2.waitKey(1)


def main():
    import argparse

    parser = argparse.ArgumentParser(description="YOLOPoint-TPU ROS listener")
    parser.add_argument("--image", required=True, help="sensor_msgs/Image topic")
    parser.add_argument("--keypoints", default="keypoints")
    parser.add_argument("--max-length", type=int, default=5)
    parser.add_argument("--nn-thresh", type=float, default=0.7)
    args = parser.parse_args()

    import rospy

    rospy.init_node("yolopoint_tpu_listener")
    KeypointListener(args.image, args.keypoints, args.max_length, args.nn_thresh)
    rospy.spin()


if __name__ == "__main__":
    main()
