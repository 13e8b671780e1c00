"""Demo CLI: run YOLOPoint-TPU on an image directory or video.

Re-design of `/root/reference/src/demo.py:476-500` (argparse CLI) +
`:63-93,232-265` (streaming + visualization): frames stream through the
jitted `InferencePipeline`; the PointTracker draws frame-to-frame tracks.

Usage:
  python -m yolopoint_tpu.frontend.demo --weights ckpt.pth.tar \
      --input imgs_dir_or_video.mp4 --img-size 640 [--save-dir out/]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def iter_frames(input_path: str):
    """Yield BGR frames from a directory of images or a video file
    (reference streaming loop, `/root/reference/src/demo.py:63-93`)."""
    import cv2

    p = Path(input_path)
    if p.is_dir():
        for f in sorted(p.iterdir()):
            if f.suffix.lower() in (".png", ".jpg", ".jpeg", ".ppm", ".bmp"):
                img = cv2.imread(str(f))
                if img is not None:
                    yield f.stem, img
    else:
        cap = cv2.VideoCapture(str(p))
        i = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            yield f"{i:06d}", frame
            i += 1
        cap.release()


def draw_output(frame, out, names=None):
    import cv2

    vis = frame.copy()
    kp = out["keypoints"][out["kp_valid"]]
    for x, y in kp.astype(int):
        cv2.circle(vis, (x, y), 2, (0, 255, 0), -1)
    if "boxes" in out:
        for box, score, cls, ok in zip(
            out["boxes"], out["box_scores"], out["box_classes"], out["box_valid"]
        ):
            if not ok:
                continue
            x1, y1, x2, y2 = box.astype(int)
            cv2.rectangle(vis, (x1, y1), (x2, y2), (255, 128, 0), 2)
            label = names[int(cls)] if names else str(int(cls))
            cv2.putText(vis, f"{label} {score:.2f}", (x1, max(y1 - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 128, 0), 1)
    return vis


def main(argv=None):
    parser = argparse.ArgumentParser(description="YOLOPoint-TPU demo")
    parser.add_argument("--weights", help="torch .pth.tar or orbax checkpoint")
    parser.add_argument("--input", required=True, help="image dir or video")
    parser.add_argument("--model", default="YOLOPoint")
    parser.add_argument("--version", default="s")
    parser.add_argument("--img-size", type=int, default=640)
    parser.add_argument("--conf", type=float, default=0.25)
    parser.add_argument("--kpt-conf", type=float, default=0.015)
    parser.add_argument("--save-dir", default=None)
    parser.add_argument("--track", action="store_true", help="draw point tracks")
    parser.add_argument("--f32", action="store_true",
                        help="disable the fused bf16 deploy path")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from yolopoint_tpu.frontend.pipeline import InferencePipeline
    from yolopoint_tpu.frontend.tracker import PointTracker
    from yolopoint_tpu.models import build_model
    from yolopoint_tpu.models.convert import fold_batch_norm, load_weights

    names = None
    model_name, version, nc = args.model, args.version, 80
    if args.weights:
        loaded = load_weights(args.weights)
        variables = loaded["variables"]
        meta = loaded["meta"]
        names = meta.get("names")
        model_name = meta.get("model_name", args.model)
        version = meta.get("version", args.version)
        nc = max(len(names or []), 1)
    else:
        variables = build_model(model_name, version, nc=nc).init(
            jax.random.PRNGKey(0), jnp.zeros((1, args.img_size, args.img_size, 3)),
            train=False,
        )

    # deploy path: fold conv+BN, bf16 conv stack (reference fuses at load,
    # demo.py:49); --f32 keeps the unfused float path for debugging
    if args.f32:
        model = build_model(model_name, version, nc=nc)
        dtype = jnp.float32
    else:
        variables = fold_batch_norm(variables)
        model = build_model(model_name, version, nc=nc, dtype=jnp.bfloat16, fused=True)
        dtype = jnp.bfloat16

    pipe = InferencePipeline(
        model, variables,
        {"detection_threshold": args.kpt_conf, "conf_thresh": args.conf},
        compute_dtype=dtype,
    )
    tracker = PointTracker(max_length=5, nn_thresh=0.7) if args.track else None

    save_dir = Path(args.save_dir) if args.save_dir else None
    if save_dir:
        save_dir.mkdir(parents=True, exist_ok=True)

    for name, frame in iter_frames(args.input):
        out = pipe.process_frame(frame, args.img_size)
        if tracker is not None:
            v = out["kp_valid"]
            tracker.update(
                np.vstack([out["keypoints"][v].T, out["kp_scores"][v]]),
                out["descriptors"][v].T,
            )
        n_kp = int(out["kp_valid"].sum())
        n_box = int(out["box_valid"].sum()) if "box_valid" in out else 0
        print(f"{name}: {n_kp} keypoints, {n_box} boxes")
        if save_dir:
            import cv2

            vis = draw_output(frame, out, names)
            if tracker is not None:
                tracker.draw_tracks(vis, tracker.get_tracks(min_length=2))
            cv2.imwrite(str(save_dir / f"{name}.jpg"), vis)


if __name__ == "__main__":
    main()
