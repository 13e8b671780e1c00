"""Host-side datasets: COCO / KITTI / Campus / HPatches image+label IO.

Re-design of `/root/reference/src/datasets/DataClasses.py` (1012 LoC): the
reference does decoding AND all augmentation per-sample in dataloader worker
processes; here the host side only decodes, resizes (letterbox / fixed crop),
composes mosaics and loads labels into PADDED fixed-shape numpy arrays —
augmentation happens on device (`yolopoint_tpu.data.augmentation`).

Directory layout matches the reference so its datasets drop in:
  datasets/<name>/images[size]/<split>/*.png|jpg
  datasets/<name>/labels[size]/<split>/*.txt      (YOLO boxes: cls cx cy w h)
  <points_dir>/<split>/*.npz                      ({'pts': (N, 2 or 3)})
HPatches: <root>/<i_ or v_scene>/{1..6}.ppm + H_1_<n>.
"""

from __future__ import annotations

import os
from glob import glob
from pathlib import Path
from typing import Any, Mapping, Optional, Sequence

import numpy as np


def _imread(path: str, channels: int = 3) -> np.ndarray:
    """uint8 HWC image (BGR like the reference's cv2.imread for parity)."""
    import cv2

    flag = cv2.IMREAD_COLOR if channels == 3 else cv2.IMREAD_GRAYSCALE
    img = cv2.imread(path, flag)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 2:
        img = img[..., None]
    return img


def letterbox(
    img: np.ndarray,
    new_shape: int | tuple[int, int],
    color: int = 114,
    auto: bool = False,
    stride: int = 32,
    scaleup: bool = True,
) -> tuple[np.ndarray, tuple[float, float], tuple[int, int, int, int]]:
    """Aspect-preserving resize + pad (reference `letterbox`,
    `/root/reference/src/utils/augmentations_yolo.py:26-56`).

    Returns (image, (ratio_w, ratio_h), (top, bottom, left, right) pad).
    """
    import cv2

    shape = img.shape[:2]
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)
    new_unpad = (int(round(shape[1] * r)), int(round(shape[0] * r)))
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if auto:
        dw, dh = dw % stride, dh % stride
    dw /= 2
    dh /= 2
    if shape[::-1] != new_unpad:
        from yolopoint_tpu.data.native import resize_u8

        img = resize_u8(img, new_unpad[1], new_unpad[0], mode="bilinear")
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    img = cv2.copyMakeBorder(
        img, top, bottom, left, right, cv2.BORDER_CONSTANT, value=(color,) * 3
    )
    return img, (r, r), (top, bottom, left, right)


def load_yolo_boxes(path: str | Path) -> np.ndarray:
    """Read a YOLO label txt -> (M, 5) [cls, cx, cy, w, h] normalized."""
    p = Path(path)
    if not p.exists():
        return np.zeros((0, 5), np.float32)
    rows = []
    for line in p.read_text().splitlines():
        vals = line.split()
        if len(vals) >= 5:
            rows.append([float(v) for v in vals[:5]])
    return np.asarray(rows, np.float32) if rows else np.zeros((0, 5), np.float32)


def load_points_npz(path: str | Path) -> np.ndarray:
    """Read a keypoint pseudo-label npz -> (N, 2) or (N, 3) [x, y(, prob)]."""
    if path is None or not Path(path).exists():
        return np.zeros((0, 2), np.float32)
    pts = np.load(path)["pts"].astype(np.float32)
    return pts


class ImagePointBoxDataset:
    """Base dataset: images + optional boxes + optional keypoints.

    Config keys follow the reference YAML (`data.*`): `dataset`, `suffix`,
    `preprocessing.img_size`, `labels.points`, `augmentation.mosaic`,
    `augmentation.homographic.cropHW`.
    """

    letterbox_resize = True
    remove_dontcare = False

    def __init__(
        self,
        config: Mapping[str, Any],
        action: str = "train",
        names: Sequence[str] = (),
        root: str | Path = "datasets",
        debug: bool = False,
    ):
        self.config = dict(config)
        self.action = "train" if "train" in action and not debug else "val"
        self.img_size = int(config["preprocessing"]["img_size"])
        self.names = list(names)
        aug = config.get("augmentation") or {}
        self.mosaic_prob = float(aug.get("mosaic") or 0.0)
        hom = aug.get("homographic") or {}
        crop = hom.get("cropHW")
        self.crop_hw = tuple(crop) if crop else None
        # device_crop: emit the FULL resized frame + a crop corner and let the
        # on-device augmentation apply the crop through the homography_big
        # chain (reference `homographies.py:129-143`); False = crop host-side
        self.device_crop = bool(hom.get("device_crop", True)) and self.crop_hw is not None
        self._big_hw: Optional[tuple[int, int]] = None
        self.inp_ch = int(config.get("input_channels", 3))
        # RAM image cache + parsed-label cache (reference
        # `DataClasses.py:114-125` image cache, `:583-596` label pickle cache)
        self.cache_images = bool(config.get("cache_images", False))
        self._img_cache: dict[int, np.ndarray] = {}
        self._label_cache: dict[int, np.ndarray] = {}
        try:
            self.dc_idx = next(
                i for i, s in enumerate(self.names) if s.lower() == "dontcare"
            )
        except StopIteration:
            self.dc_idx = None

        dataset = config["dataset"].lower()
        suffix = config.get("suffix", ".png")
        suffixes = [suffix] if isinstance(suffix, str) else list(suffix)
        data_dir = Path(root) / dataset
        siz = str(self.img_size) if (data_dir / f"images{self.img_size}").is_dir() else ""
        img_dir = data_dir / f"images{siz}" / self.action
        self.img_paths: list[str] = sorted(
            p for s in suffixes for p in glob(str(img_dir / f"*{s}"))
        )
        if not self.img_paths:
            raise FileNotFoundError(f"no images under {img_dir}")

        lbl_dir = data_dir / f"labels{siz}" / self.action
        if not lbl_dir.is_dir():
            lbl_dir = data_dir / "labels" / self.action
        self.label_dir = lbl_dir if lbl_dir.is_dir() else None

        self.point_paths: list[Optional[str]] = [None] * len(self.img_paths)
        if points_dir := (config.get("labels") or {}).get("points"):
            pd = Path(points_dir) / self.action
            found = sorted(glob(str(pd / "*.npz")))
            if found:
                by_stem = {Path(p).stem: p for p in found}
                self.point_paths = [by_stem.get(Path(ip).stem) for ip in self.img_paths]

        if debug:
            self.img_paths = self.img_paths[:512]
            self.point_paths = self.point_paths[:512]

    def __len__(self) -> int:
        return len(self.img_paths)

    def _load_raw(self, idx: int):
        if self.cache_images and idx in self._img_cache:
            img = self._img_cache[idx]
        else:
            img = _imread(self.img_paths[idx], self.inp_ch)
            if self.cache_images:
                self._img_cache[idx] = img
        if idx in self._label_cache:
            boxes = self._label_cache[idx]
        else:
            boxes = np.zeros((0, 5), np.float32)
            if self.label_dir is not None:
                boxes = load_yolo_boxes(self.label_dir / (Path(self.img_paths[idx]).stem + ".txt"))
            if self.remove_dontcare and self.dc_idx is not None and len(boxes):
                boxes = boxes[boxes[:, 0] != self.dc_idx]
            self._label_cache[idx] = boxes
        points = load_points_npz(self.point_paths[idx])
        return img.copy() if self.cache_images else img, boxes.copy(), \
            points[:, :2] if points.size else np.zeros((0, 2), np.float32)

    def _resize_full(self, img: np.ndarray) -> np.ndarray:
        """Export-mode resize: longer side to img_size, pad bottom/right to a
        static /32 canvas (no crop, no letterbox centering) — the full-frame
        input of homographic adaptation (`loader.py:73-136` export action)."""
        from yolopoint_tpu.data.native import resize_u8

        h0, w0 = img.shape[:2]
        r = self.img_size / max(h0, w0)
        if r != 1.0:
            img = resize_u8(img, int(round(h0 * r)), int(round(w0 * r)))
        h, w = img.shape[:2]
        if self._big_hw is None:
            self._big_hw = (-(-h // 32) * 32, -(-w // 32) * 32)
        Hb, Wb = self._big_hw
        canvas = np.full((Hb, Wb, img.shape[2]), 114, img.dtype)
        canvas[:min(h, Hb), :min(w, Wb)] = img[:min(h, Hb), :min(w, Wb)]
        return canvas

    def iter_export(self):
        """Yield `(name, float image)` pairs for pseudo-label export
        (the reference loader's export action,
        `/root/reference/src/utils/loader.py:73-136`)."""
        for idx in range(len(self)):
            img, _, _ = self._load_raw(idx)
            yield Path(self.img_paths[idx]).stem, \
                self._resize_full(img).astype(np.float32) / 255.0

    def _resize_big(self, img, boxes, points):
        """Device-crop path: resize so the longer side is `img_size`, pad
        bottom/right to a static full-frame shape, and sample the crop corner
        — the warp+crop itself runs on device (`data.augmentation`,
        reference `homography_big` chain)."""
        from yolopoint_tpu.data.native import resize_u8

        h0, w0 = img.shape[:2]
        r = self.img_size / max(h0, w0)
        if r != 1.0:
            img = resize_u8(img, int(round(h0 * r)), int(round(w0 * r)))
        h, w = img.shape[:2]
        if self._big_hw is None:
            # static full-frame canvas: first sample rounded up to /32
            self._big_hw = (-(-h // 32) * 32, -(-w // 32) * 32)
        Hb, Wb = self._big_hw
        canvas = np.full((Hb, Wb, img.shape[2]), 114, img.dtype)
        h, w = min(h, Hb), min(w, Wb)
        canvas[:h, :w] = img[:h, :w]
        ch, cw = self.crop_hw
        ch, cw = min(ch, h), min(cw, w)
        if self.action == "val":
            y, x = (h - ch) // 2, (w - cw) // 2
        else:
            y = np.random.randint(0, h - ch + 1)
            x = np.random.randint(0, w - cw + 1)
        if len(points):
            points = points * r
        if len(boxes):
            # renormalize cxcywh from the original frame to the padded canvas
            b = boxes.copy()
            b[:, 1] = boxes[:, 1] * w0 * r / Wb
            b[:, 2] = boxes[:, 2] * h0 * r / Hb
            b[:, 3] = boxes[:, 3] * w0 * r / Wb
            b[:, 4] = boxes[:, 4] * h0 * r / Hb
            boxes = b
        return canvas, boxes, points, (0, 0, 0, 0), np.array([y, x], np.float32)

    def _resize(self, img, boxes, points):
        """Letterbox (COCO) or fixed crop (KITTI) to a static shape."""
        from yolopoint_tpu.data.native import resize_u8

        h0, w0 = img.shape[:2]
        if self.crop_hw:
            # resize longer side to img_size first (reference KITTI: resize to
            # 960 then crop cropHW), then random/center crop
            r = self.img_size / max(h0, w0)
            if r != 1.0:
                img = resize_u8(img, int(round(h0 * r)), int(round(w0 * r)))
            h, w = img.shape[:2]
            ch, cw = self.crop_hw
            ch, cw = min(ch, h), min(cw, w)
            if self.action == "val":
                y, x = (h - ch) // 2, (w - cw) // 2
            else:
                y = np.random.randint(0, h - ch + 1)
                x = np.random.randint(0, w - cw + 1)
            img = img[y:y + ch, x:x + cw]
            if len(points):
                points = points * r - np.array([x, y], np.float32)
                inside = (
                    (points[:, 0] >= 0) & (points[:, 0] < cw)
                    & (points[:, 1] >= 0) & (points[:, 1] < ch)
                )
                points = points[inside]
            if len(boxes):
                xyxy = boxes[:, 1:].copy()
                xyxy[:, 0::2] = xyxy[:, 0::2] * w0  # denorm on original
                xyxy[:, 1::2] = xyxy[:, 1::2] * h0
                # cxcywh on original -> crop frame
                xyxy[:, 0] = xyxy[:, 0] * r - x
                xyxy[:, 1] = xyxy[:, 1] * r - y
                xyxy[:, 2:] *= r
                keep = (
                    (xyxy[:, 0] > 0) & (xyxy[:, 0] < cw)
                    & (xyxy[:, 1] > 0) & (xyxy[:, 1] < ch)
                )
                boxes = np.concatenate(
                    [boxes[keep, :1],
                     xyxy[keep] / np.array([cw, ch, cw, ch], np.float32)], axis=1
                )
            pad = (0, 0, 0, 0)
        elif self.letterbox_resize:
            img, (rw, rh), (top, bottom, left, right) = letterbox(img, self.img_size)
            h, w = img.shape[:2]
            if len(points):
                points = points * rw + np.array([left, top], np.float32)
            if len(boxes):
                b = boxes.copy()
                b[:, 1] = (boxes[:, 1] * w0 * rw + left) / w
                b[:, 2] = (boxes[:, 2] * h0 * rh + top) / h
                b[:, 3] = boxes[:, 3] * w0 * rw / w
                b[:, 4] = boxes[:, 4] * h0 * rh / h
                boxes = b
            pad = (top, bottom, left, right)
        else:
            pad = (0, 0, 0, 0)
        return img, boxes, points, pad

    def _mosaic(self, idx: int):
        """4-tile mosaic at FULL tile resolution: compose a 2x(H, W) canvas
        from four final-size samples; the homographic warp of the canvas and
        the center (H, W) crop happen ON DEVICE through the homography_big
        chain. Reference `_mosaic_augmentation`
        `/root/reference/src/datasets/DataClasses.py:611-729` (equal-size
        tiles around the canvas center + top=H/2, left=W/2 crop)."""
        idxs = [idx] + list(np.random.randint(0, len(self), 3))
        np.random.shuffle(idxs)
        all_boxes, all_points = [], []
        canvas = None
        th = tw = None
        for i, ti in enumerate(idxs):
            img, boxes, points, _ = self._resize(*self._load_raw(ti))
            if canvas is None:
                th, tw = img.shape[:2]
                canvas = np.full((2 * th, 2 * tw, img.shape[2]), 114, img.dtype)
            oy, ox = (i // 2) * th, (i % 2) * tw
            canvas[oy:oy + th, ox:ox + tw] = img[:th, :tw]
            if len(points):
                all_points.append(points + np.array([ox, oy], np.float32))
            if len(boxes):
                b = boxes.copy()
                b[:, 1] = (boxes[:, 1] * tw + ox) / (2 * tw)
                b[:, 2] = (boxes[:, 2] * th + oy) / (2 * th)
                b[:, 3] = boxes[:, 3] / 2
                b[:, 4] = boxes[:, 4] / 2
                all_boxes.append(b)
        points = np.concatenate(all_points) if all_points else np.zeros((0, 2), np.float32)
        boxes = np.concatenate(all_boxes) if all_boxes else np.zeros((0, 5), np.float32)
        # center crop corner (reference: top=sy//2, left=sx//2)
        crop_yx = np.array([th // 2, tw // 2], np.float32)
        return canvas, boxes, points, (0, 0, 0, 0), crop_yx

    def get(self, idx: int, mosaic: Optional[bool] = None) -> dict[str, Any]:
        """One decoded, statically-shaped sample (device augmentation-free).

        `mosaic` overrides the per-sample Bernoulli (the loader decides
        per BATCH so shapes stay static under jit). Crop-aware samples carry
        a `crop_yx` / `mosaic_crop_yx` corner for the device warp+crop."""
        if mosaic is None:
            mosaic = (self.action == "train" and self.mosaic_prob
                      and np.random.random() < self.mosaic_prob)
        if mosaic:
            img, boxes, points, pad, crop_yx = self._mosaic(idx)
            crop_key = "mosaic_crop_yx"
        elif self.device_crop and self.action != "export":
            img, boxes, points, pad, crop_yx = self._resize_big(*self._load_raw(idx))
            crop_key = "crop_yx"
        else:
            img, boxes, points, pad = self._resize(*self._load_raw(idx))
            crop_yx, crop_key = None, None
        sample = {
            "image": img.astype(np.float32) / 255.0,
            "boxes": boxes,
            "points": points,
            "pad": pad,
            "name": Path(self.img_paths[idx]).stem,
        }
        if crop_yx is not None:
            sample[crop_key] = crop_yx
        return sample


class Coco(ImagePointBoxDataset):
    """Letterboxed COCO (reference `Coco`, `DataClasses.py:732-877`)."""

    letterbox_resize = True


class Kitti(ImagePointBoxDataset):
    """KITTI: fixed crop, DontCare removal (reference `Kitti`,
    `DataClasses.py:599-729`)."""

    letterbox_resize = False
    remove_dontcare = True


class Campus(Kitti):
    """Kitti subclass without dontcare filtering (`DataClasses.py:880-885`)."""

    remove_dontcare = False


def _synthetic_cls():
    from yolopoint_tpu.data.synthetic import SyntheticShapes

    return SyntheticShapes


DATASET_REGISTRY = {"coco": Coco, "kitti": Kitti, "campus": Campus}


def build_dataset(config, action="train", names=(), root="datasets", debug=False):
    name = config["dataset"].lower()
    if name in ("synthetic_shapes", "synthetic"):
        cls = _synthetic_cls()
    else:
        cls = DATASET_REGISTRY.get(name, ImagePointBoxDataset)
    return cls(config, action=action, names=names, root=root, debug=debug)


class HPatches:
    """HPatches sequences: per pair (img1, imgN, H_1_N) with ratio-preserving
    resize to a fixed (H, W) — pure cv2 (replaces the reference's TensorFlow
    resize dependency, `DataClasses.py:888-1012`)."""

    def __init__(self, root: str | Path, size_hw: tuple[int, int] = (480, 640), alteration: str = "all"):
        self.root = Path(root)
        self.size_hw = size_hw
        self.pairs: list[tuple[Path, Path, Path]] = []
        for scene in sorted(self.root.iterdir()):
            if not scene.is_dir():
                continue
            if alteration != "all" and not scene.name.startswith(alteration):
                continue
            base = scene / "1.ppm"
            for n in range(2, 7):
                img2 = scene / f"{n}.ppm"
                hfile = scene / f"H_1_{n}"
                if base.exists() and img2.exists() and hfile.exists():
                    self.pairs.append((base, img2, hfile))

    def __len__(self) -> int:
        return len(self.pairs)

    def _preprocess(self, img: np.ndarray):
        """Ratio-preserving resize (scale to target area ratio then center
        crop/resize like `_adapt_homography_to_preprocessing` expects)."""
        import cv2

        H, W = self.size_hw
        h0, w0 = img.shape[:2]
        scale = max(H / h0, W / w0)
        img = cv2.resize(img, (int(round(w0 * scale)), int(round(h0 * scale))),
                         interpolation=cv2.INTER_AREA if scale < 1 else cv2.INTER_LINEAR)
        # center-crop to target
        h, w = img.shape[:2]
        top, left = (h - H) // 2, (w - W) // 2
        img = img[top:top + H, left:left + W]
        return img, scale, (top, left)

    def __getitem__(self, idx: int) -> dict[str, Any]:
        p1, p2, hf = self.pairs[idx]
        img1 = _imread(str(p1))
        img2 = _imread(str(p2))
        H12 = np.array([[float(v) for v in line.split()] for line in
                        Path(hf).read_text().split("\n") if line.strip()])
        i1, s1, (t1, l1) = self._preprocess(img1)
        i2, s2, (t2, l2) = self._preprocess(img2)
        # adapt H to the preprocessing: x2 = H @ x1 on originals;
        # x2' = S2 @ (H @ S1^-1 @ x1') with S = scale+crop translation
        S1 = np.array([[s1, 0, -l1], [0, s1, -t1], [0, 0, 1.0]])
        S2 = np.array([[s2, 0, -l2], [0, s2, -t2], [0, 0, 1.0]])
        H_adapted = S2 @ H12 @ np.linalg.inv(S1)
        return {
            "image": i1.astype(np.float32) / 255.0,
            "warped_image": i2.astype(np.float32) / 255.0,
            "homography_pix": H_adapted,
            "name": f"{p1.parent.name}_{p2.stem}",
        }
