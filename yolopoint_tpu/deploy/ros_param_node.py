"""ROS1 node flavor driven by the parameter server (roslaunch-style).

Mirrors `/root/reference/src/yolopoint_ros.py:19-145`: instead of argparse,
every setting comes from a private `~yolocfg` namespace populated by a launch
file (`launch/yolopoint.launch`), so multiple per-camera nodes can share one
launch with different namespaces. Import-gated like `ros_node.py` — the
framework itself has no ROS dependency.

Params read under `~yolocfg/`:
  weights        checkpoint path (.pth.tar from the reference or orbax dir)
  image_topic    sensor_msgs/Image source
  img_size       optional resize of the longer side
  detection_threshold / nms / top_k / conf_thresh / iou_thresh / max_det
  template       optional {frame_id: mask path} dict for static ego masks
  compute_dtype  'bf16' (default) or 'f32'
"""

from __future__ import annotations

from typing import Any


def load_param_config(rospy) -> dict[str, Any]:
    """Fetch the `~yolocfg` dict from the parameter server with the same
    fallback chain as the reference (`yolopoint_ros.py:19-42`)."""
    cfg = rospy.get_param("~yolocfg", None)
    if cfg is None:
        cfg = rospy.get_param("yolocfg", {})
    if not isinstance(cfg, dict):
        raise ValueError("yolocfg parameter must be a dict (set via rosparam)")
    return cfg


def build_node():
    """Construct the pipeline + node from the parameter server. Returns the
    running `YoloPointRosNode` (the argparse flavor's class is reused — only
    the configuration source differs, like the reference pair of nodes)."""
    import rospy

    import jax.numpy as jnp

    from yolopoint_tpu.deploy.ros_node import YoloPointRosNode
    from yolopoint_tpu.frontend.pipeline import InferencePipeline
    from yolopoint_tpu.models import build_model
    from yolopoint_tpu.models.convert import fold_batch_norm, load_weights

    rospy.init_node("yolopoint_tpu")
    cfg = load_param_config(rospy)

    loaded = load_weights(str(cfg["weights"]))
    meta = loaded["meta"]
    names = list(meta.get("names", cfg.get("names", [])))
    bf16 = str(cfg.get("compute_dtype", "bf16")).lower() in ("bf16", "bfloat16")

    # deploy path: fold conv+BN and run bf16 on the MXU (reference fuses at
    # load, /root/reference/src/demo.py:49)
    variables = fold_batch_norm(loaded["variables"])
    model = build_model(
        meta.get("model_name", cfg.get("model_name", "YOLOPoint")),
        meta.get("version", cfg.get("version", "s")),
        nc=max(len(names), 1),
        dtype=jnp.bfloat16 if bf16 else jnp.float32,
        fused=True,
    )
    pipeline = InferencePipeline(
        model, variables,
        {k: cfg[k] for k in (
            "detection_threshold", "nms", "top_k", "conf_thresh",
            "iou_thresh", "max_det", "filter_pts_in_boxes",
        ) if k in cfg},
        compute_dtype=jnp.bfloat16 if bf16 else jnp.float32,
    )
    return YoloPointRosNode(
        pipeline, names,
        source_topic=str(cfg.get("image_topic", "image")),
        img_size=cfg.get("img_size"),
        templates=cfg.get("template"),
    )


def main():
    import rospy

    build_node()
    rospy.spin()


if __name__ == "__main__":
    main()
