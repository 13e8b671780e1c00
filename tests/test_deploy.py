"""Deploy-layer tests (VERDICT r2 #8): message codecs, pipeline->message
packing, the ROS node callback driven through a fake rospy stack, template
masking, and the covariance helper surface.

The reference never tests this layer either (`/root/reference/src/demo_ROS.py`
runs only inside a live ROS graph); here the rospy/cv_bridge/msg modules are
faked in sys.modules so the node logic executes hermetically.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

from yolopoint_tpu.deploy.messages import (
    NUM_STATES,
    CovarianceHelper,
    KeypointArray,
    Object3D,
    ObjectInstance2DArray,
    keypoints_from_pipeline_output,
    objects_from_pipeline_output,
)


def _pipeline_output(n=5, d=8, with_boxes=True):
    """Canned `InferencePipeline.process_frame`-style output: 5 keypoints of
    which 3 valid, 3 boxes of which 2 valid."""
    rng = np.random.default_rng(0)
    out = {
        "keypoints": np.array(
            [[10.4, 20.6], [100.0, 50.0], [3.0, 7.0], [640.0, 480.0], [1.0, 1.0]],
            np.float32,
        )[:n],
        "kp_scores": np.linspace(0.9, 0.1, n).astype(np.float32),
        "kp_valid": np.array([True, True, False, True, False])[:n],
        # unit descriptors, like the pipeline's L2-renormalized output
        "descriptors": (lambda v: v / np.linalg.norm(v, axis=1, keepdims=True))(
            rng.normal(size=(n, d))
        ).astype(np.float32),
    }
    if with_boxes:
        out.update(
            boxes=np.array(
                [[0, 0, 50, 60], [10, 10, 90, 120], [5, 5, 6, 6]], np.float32
            ),
            box_scores=np.array([0.9, 0.7, 0.2], np.float32),
            box_classes=np.array([2, 0, 1], np.int32),
            box_valid=np.array([True, True, False]),
        )
    return out


# ---------------------------------------------------------------------------
# message codecs
# ---------------------------------------------------------------------------


def test_keypoint_array_roundtrip():
    out = _pipeline_output()
    kp = keypoints_from_pipeline_output(out, frame_id="cam0", stamp=1.5)
    # only the 3 valid keypoints survive, rounded to uint16
    assert kp.x.tolist() == [10, 100, 640]
    assert kp.y.tolist() == [21, 50, 480]
    assert kp.desc_len == 8
    assert kp.desc_flat.shape == (3 * 8,)
    np.testing.assert_allclose(
        kp.descriptors(), out["descriptors"][out["kp_valid"]], rtol=0, atol=0
    )
    # dict codec round-trip (the wire format the msg IDL mirrors)
    kp2 = KeypointArray.from_dict(kp.to_dict())
    np.testing.assert_array_equal(kp2.x, kp.x)
    np.testing.assert_array_equal(kp2.y, kp.y)
    np.testing.assert_allclose(kp2.score, kp.score)
    np.testing.assert_allclose(kp2.desc_flat, kp.desc_flat)
    assert kp2.frame_id == "cam0" and kp2.stamp == 1.5


def test_keypoint_array_empty():
    out = _pipeline_output()
    out["kp_valid"] = np.zeros(5, bool)
    kp = keypoints_from_pipeline_output(out)
    assert len(kp.x) == 0 and kp.desc_len == 0
    assert kp.descriptors().shape == (0, 0)


def test_objects_from_pipeline_output():
    names = ["car", "truck", "bike"]
    arr = objects_from_pipeline_output(_pipeline_output(), names, frame_id="cam0")
    assert isinstance(arr, ObjectInstance2DArray)
    assert len(arr.instances) == 2  # third box invalid
    a, b = arr.instances
    assert a.class_name == "bike" and a.class_index == 2
    assert (a.bounding_box_min_x, a.bounding_box_min_y,
            a.bounding_box_max_x, a.bounding_box_max_y) == (0, 0, 50, 60)
    assert a.class_probabilities == [pytest.approx(0.9)]
    assert b.class_name == "car" and b.class_count == 3
    # boxes absent -> empty array, no crash
    empty = objects_from_pipeline_output(_pipeline_output(with_boxes=False), names)
    assert empty.instances == []


def test_objects_unknown_class_index():
    out = _pipeline_output()
    out["box_classes"] = np.array([7, 0, 1], np.int32)  # beyond names
    arr = objects_from_pipeline_output(out, ["car"])
    assert arr.instances[0].class_name == "7"


# ---------------------------------------------------------------------------
# covariance helper (python twin of the reference C++ header,
# /root/reference/src/ros_messages/object_msgs/include/object_msgs/covariance_helper.h)
# ---------------------------------------------------------------------------


def test_covariance_msg_roundtrip():
    rng = np.random.default_rng(1)
    n = 4
    a = rng.normal(size=(n, n)).astype(np.float32)
    cov = a @ a.T
    mask = CovarianceHelper.mask_from_indices([0, 2, 5, 7])
    msg = Object3D()
    msg = CovarianceHelper.covariance_to_msg(cov, mask, msg)
    assert msg.complete_covariance.shape == (n * (n + 1) // 2,)
    back = CovarianceHelper.covariance_from_msg(msg)
    np.testing.assert_allclose(back, cov, rtol=1e-6)


def test_covariance_sub_matrix_and_reshape():
    cov = np.arange(16, dtype=np.float32).reshape(4, 4)
    sub = CovarianceHelper.get_sub_matrix(cov, [1, 3])
    np.testing.assert_array_equal(sub, [[5, 7], [13, 15]])
    cov2 = CovarianceHelper.set_sub_matrix(cov.copy(), [0, 2], np.zeros((2, 2)))
    assert cov2[0, 0] == 0 and cov2[0, 2] == 0 and cov2[2, 0] == 0
    assert cov2[1, 1] == 5  # untouched
    # reshape: states {1,3} -> {3, 9, 1}; state 9 is new (zero rows/cols)
    out = CovarianceHelper.reshape_by_random_variables(sub, [1, 3], [3, 9, 1])
    np.testing.assert_array_equal(out, [[15, 0, 13], [0, 0, 0], [7, 0, 5]])
    # mask/index duality
    idx = CovarianceHelper.indices_from_mask(
        CovarianceHelper.mask_from_indices([2, 11, 23]))
    assert idx.tolist() == [2, 11, 23]
    assert CovarianceHelper.mask_from_indices([0]).shape == (NUM_STATES,)


# ---------------------------------------------------------------------------
# fake ROS stack
# ---------------------------------------------------------------------------


class _FakePublisher:
    def __init__(self, topic, msg_type, queue_size=10):
        self.topic, self.msg_type = topic, msg_type
        self.published = []

    def publish(self, msg):
        self.published.append(msg)


class _Bag:
    """Attribute bag standing in for a rospy message instance."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


class _FakeCvBridge:
    def imgmsg_to_cv2(self, msg, encoding):
        return msg.img


@pytest.fixture
def fake_ros(monkeypatch):
    """Install fake rospy / cv_bridge / msg modules and return a handle with
    the captured publishers/subscribers."""
    handle = types.SimpleNamespace(publishers=[], subscribers=[], params={})

    rospy = types.ModuleType("rospy")

    def Publisher(topic, msg_type, queue_size=10):
        p = _FakePublisher(topic, msg_type, queue_size)
        handle.publishers.append(p)
        return p

    def Subscriber(topic, msg_type, cb):
        handle.subscribers.append((topic, msg_type, cb))
        return (topic, cb)

    def get_param(name, default=None):
        return handle.params.get(name, default)

    rospy.Publisher = Publisher
    rospy.Subscriber = Subscriber
    rospy.get_param = get_param
    rospy.init_node = lambda name: None

    cv_bridge = types.ModuleType("cv_bridge")
    cv_bridge.CvBridge = _FakeCvBridge

    sensor_msgs = types.ModuleType("sensor_msgs")
    sensor_msgs_msg = types.ModuleType("sensor_msgs.msg")
    sensor_msgs_msg.Image = object
    sensor_msgs.msg = sensor_msgs_msg

    keypoint_msg = types.ModuleType("keypoint_msg")
    keypoint_msg_msg = types.ModuleType("keypoint_msg.msg")
    keypoint_msg_msg.KeypointArray = _Bag
    keypoint_msg.msg = keypoint_msg_msg

    object_msgs = types.ModuleType("object_msgs")
    object_msgs_msg = types.ModuleType("object_msgs.msg")
    object_msgs_msg.ObjectInstance2DArray = lambda: _Bag(instances=[])
    object_msgs_msg.ObjectInstance2D = _Bag
    object_msgs.msg = object_msgs_msg

    message_filters = types.ModuleType("message_filters")

    class _MFSub:
        def __init__(self, topic, msg_type):
            self.topic = topic

    class _Sync:
        def __init__(self, subs, queue_size=10, slop=0.1):
            self.subs = subs

        def registerCallback(self, cb):
            handle.sync_callback = cb

    message_filters.Subscriber = _MFSub
    message_filters.ApproximateTimeSynchronizer = _Sync

    for name, mod in [
        ("rospy", rospy), ("cv_bridge", cv_bridge),
        ("sensor_msgs", sensor_msgs), ("sensor_msgs.msg", sensor_msgs_msg),
        ("keypoint_msg", keypoint_msg), ("keypoint_msg.msg", keypoint_msg_msg),
        ("object_msgs", object_msgs), ("object_msgs.msg", object_msgs_msg),
        ("message_filters", message_filters),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)
    return handle


class _FakePipeline:
    """process_frame stub returning the canned output (records calls)."""

    def __init__(self, out):
        self.out = out
        self.calls = []

    def process_frame(self, img, img_size=None):
        self.calls.append((img.shape, img_size))
        return {k: v.copy() for k, v in self.out.items()}


def _image_msg(frame_id="cam0", h=480, w=640):
    header = _Bag(frame_id=frame_id, stamp=0.0)
    return _Bag(header=header, img=np.zeros((h, w, 3), np.uint8))


def test_ros_node_callback_publishes(fake_ros):
    from yolopoint_tpu.deploy.ros_node import YoloPointRosNode

    pipe = _FakePipeline(_pipeline_output())
    node = YoloPointRosNode(pipe, ["car", "truck", "bike"], "camera/image",
                            img_size=512)
    # subscription wired to the right topic
    assert fake_ros.subscribers[0][0] == "camera/image"
    (topic, cb) = fake_ros.subscribers[0][0], fake_ros.subscribers[0][2]
    cb(_image_msg())
    assert pipe.calls == [((480, 640, 3), 512)]

    kp_pub = next(p for p in fake_ros.publishers if p.topic == "keypoints")
    obj_pub = next(p for p in fake_ros.publishers if p.topic == "objects")
    assert len(kp_pub.published) == 1 and len(obj_pub.published) == 1
    kp_msg = kp_pub.published[0]
    assert list(kp_msg.x) == [10, 100, 640]
    assert int(kp_msg.desc_len) == 8
    assert len(kp_msg.desc_flat) == 24
    obj_msg = obj_pub.published[0]
    assert [m.class_name for m in obj_msg.instances] == ["bike", "car"]
    assert obj_msg.instances[0].bounding_box_max_y == 60


def test_ros_node_template_masking(fake_ros, tmp_path):
    """Keypoints under the (eroded) static ego template are suppressed —
    reference `/root/reference/src/demo_ROS.py:49-56,178-198`."""
    import cv2

    from yolopoint_tpu.deploy.ros_node import YoloPointRosNode

    # template: a filled 100x100 block at (40..140, 60..160); after 7x7
    # erosion its interior shrinks by 3 px per side
    tpl = np.zeros((480, 640), np.uint8)
    tpl[60:160, 40:140] = 255
    path = tmp_path / "cam0.png"
    cv2.imwrite(str(path), tpl)

    out = _pipeline_output()
    # keypoint 0 at (10.4, 20.6) -> outside; keypoint 1 at (100, 50)... place
    # one valid keypoint well inside the template
    out["keypoints"][1] = (100.0, 100.0)
    pipe = _FakePipeline(out)
    node = YoloPointRosNode(pipe, ["car"], "cam", templates={"cam0": str(path)})
    cb = fake_ros.subscribers[0][2]
    cb(_image_msg(frame_id="cam0"))
    kp_pub = next(p for p in fake_ros.publishers if p.topic == "keypoints")
    msg = kp_pub.published[0]
    # (100,100) suppressed; (10,21) and (640,480) survive ((640,480) is
    # outside the template bounds — bounds check must not crash)
    assert list(msg.x) == [10, 640]
    # unknown frame_id -> no suppression
    cb(_image_msg(frame_id="other"))
    assert list(kp_pub.published[1].x) == [10, 100, 640]


def test_ros_node_no_publish_flag(fake_ros):
    from yolopoint_tpu.deploy.ros_node import YoloPointRosNode

    node = YoloPointRosNode(_FakePipeline(_pipeline_output()), [], "cam",
                            publish=False)
    fake_ros.subscribers[0][2](_image_msg())  # must not raise
    assert fake_ros.publishers == []


def test_listener_feeds_tracker(fake_ros):
    from yolopoint_tpu.deploy.ros_listener import KeypointListener

    listener = KeypointListener("cam/image", show=False)
    assert hasattr(fake_ros, "sync_callback")
    kp = keypoints_from_pipeline_output(_pipeline_output(), frame_id="cam0")
    kp_msg = _Bag(x=kp.x, y=kp.y, score=kp.score, desc_len=kp.desc_len,
                  desc_flat=kp.desc_flat)
    fake_ros.sync_callback(_image_msg(), kp_msg)
    fake_ros.sync_callback(_image_msg(), kp_msg)  # same points -> all matched
    tracks = listener.tracker.get_tracks(min_length=2)
    assert len(tracks) == 3  # the 3 valid keypoints tracked across 2 frames


def test_param_node_config(fake_ros):
    import rospy

    from yolopoint_tpu.deploy.ros_param_node import load_param_config

    fake_ros.params["~yolocfg"] = {"weights": "w", "top_k": 600}
    assert load_param_config(rospy)["top_k"] == 600
    # fallback chain: private param absent -> global
    fake_ros.params.clear()
    fake_ros.params["yolocfg"] = {"weights": "g"}
    assert load_param_config(rospy)["weights"] == "g"
    # non-dict rejected
    fake_ros.params["~yolocfg"] = "nope"
    with pytest.raises(ValueError):
        load_param_config(rospy)
