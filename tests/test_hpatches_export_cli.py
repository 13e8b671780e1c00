"""End-to-end HPatches evaluation + export CLI over synthetic directory
trees (the reference workflows `evaluation_hpatches.py` and
`export_homography.py` driven through our dataset/loader surface)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolopoint_tpu.data.datasets import HPatches
from yolopoint_tpu.evaluation.hpatches_runner import evaluate_hpatches
from yolopoint_tpu.frontend.pipeline import InferencePipeline
from yolopoint_tpu.models import build_model


def _write_ppm(path, img):
    import cv2

    cv2.imwrite(str(path), img)


@pytest.fixture(scope="module")
def hpatches_dir(tmp_path_factory):
    """Two synthetic scenes: img2 = warp(img1, H) with known pixel H."""
    import cv2

    root = tmp_path_factory.mktemp("hpatches")
    rng = np.random.default_rng(0)
    H0, W0 = 240, 320
    for si in range(2):
        scene = root / (f"i_scene{si}" if si == 0 else f"v_scene{si}")
        scene.mkdir()
        img1 = rng.integers(0, 255, (H0, W0, 3), np.uint8)
        img1 = cv2.GaussianBlur(img1, (5, 5), 1.5)
        _write_ppm(scene / "1.ppm", img1)
        for n in range(2, 4):
            H = np.array([[1.0, 0.02 * si, 5.0 + n], [-0.01, 1.0, 3.0], [0, 0, 1.0]])
            img2 = cv2.warpPerspective(img1, H, (W0, H0))
            _write_ppm(scene / f"{n}.ppm", img2)
            (scene / f"H_1_{n}").write_text(
                "\n".join(" ".join(str(v) for v in row) for row in H)
            )
    return root


def test_hpatches_dataset_pairs(hpatches_dir):
    ds = HPatches(hpatches_dir, size_hw=(192, 256))
    assert len(ds) == 4
    s = ds[0]
    assert s["image"].shape == (192, 256, 3)
    assert s["warped_image"].shape == (192, 256, 3)
    assert s["homography_pix"].shape == (3, 3)
    # alteration filter
    assert len(HPatches(hpatches_dir, size_hw=(192, 256), alteration="i")) == 2


def test_evaluate_hpatches_end_to_end(hpatches_dir):
    """Random-weight model through the full protocol: metrics come back
    finite and in range; repeatability is meaningful because both views see
    the same (warped) content."""
    model = build_model("YOLOPointDet", "n")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 192, 256, 3)),
                           train=False)
    pipe = InferencePipeline(model, variables,
                             {"detection_threshold": 1e-4, "top_k": 256})
    ds = HPatches(hpatches_dir, size_hw=(192, 256))
    metrics = evaluate_hpatches(pipe, ds, max_pairs=2)
    assert metrics["num_pairs"] == 2
    for k in ("repeatability", "matching_score", "match_mAP", "correctness@3"):
        assert 0.0 <= metrics[k] <= 1.0, k
    # an identical detector on view1 vs its warp should repeat decently even
    # with random weights (texture-driven responses move with the content)
    assert metrics["repeatability"] > 0.3


def test_export_cli_writes_npz(tmp_path, rng):
    import cv2

    from yolopoint_tpu.export import cli as export_cli

    root = tmp_path / "datasets"
    img_dir = root / "coco" / "images" / "train"
    img_dir.mkdir(parents=True)
    for i in range(2):
        cv2.imwrite(str(img_dir / f"im{i}.jpg"),
                    rng.integers(0, 255, (96, 128, 3), np.uint8))
    cfg = tmp_path / "export.yaml"
    cfg.write_text(
        "model: {name: YOLOPointDet, version: n,\n"
        "        superpoint: {detection_threshold: 0.0001, nms: 4, top_k: 64}}\n"
        "export: {num_homographies: 4, erosion_radius: 2}\n"
        "data: {dataset: coco, suffix: .jpg, preprocessing: {img_size: 128}}\n"
    )
    out = tmp_path / "points"
    export_cli.main(["--config", str(cfg), "--output", str(out),
                     "--data_root", str(root)])
    files = sorted(out.glob("*.npz"))
    assert len(files) == 2
    pts = np.load(files[0])["pts"]
    assert pts.ndim == 2 and pts.shape[1] == 3  # [x, y, prob]


@pytest.mark.slow  # compile-heavy (fast-tier budget, VERDICT r4 #6)
def test_host_adaptation_matches_device(tmp_path):
    """homography_adaptation_host == homography_adaptation_batch given the
    same homographies (host C++ warps are exact twins of the device warp)."""
    import jax
    import jax.numpy as jnp

    from yolopoint_tpu.export.homography_adaptation import (
        homography_adaptation_batch, homography_adaptation_host,
    )
    from yolopoint_tpu.models import build_model
    from yolopoint_tpu.ops.homography import sample_homography_np

    m = build_model("YOLOPointDet", "n", nc=1)
    H = W = 64
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), train=False)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    Hs = np.stack([np.eye(3)] + [
        sample_homography_np(np.array([2.0, 2.0]), shift=-1.0, seed=i)
        for i in range(3)
    ])

    pts_h, sc_h, va_h = homography_adaptation_host(
        m, v, img, rng, conf_thresh=0.01, top_k=64, homographies=Hs,
    )

    # device path with the same injected homographies
    import yolopoint_tpu.export.homography_adaptation as ha

    def device_with_hs(image, Hs):
        from yolopoint_tpu.ops.geometry import compute_valid_mask, warp_image
        from yolopoint_tpu.ops.heatmap import cells_to_heatmap
        from yolopoint_tpu.ops.keypoints import extract_keypoints

        Hs = jnp.asarray(Hs, jnp.float32)
        inv_Hs = jnp.linalg.inv(Hs)
        N = Hs.shape[0]
        imgs = warp_image(jnp.broadcast_to(image, (N, H, W, 3)), Hs)
        masks = compute_valid_mask((H, W), Hs, erosion_radius=3)
        out = m.apply(v, imgs, train=False)
        heat = cells_to_heatmap(out["semi"].astype(jnp.float32)) * masks
        heat_un = warp_image(heat[..., None], inv_Hs)[..., 0]
        mask_un = warp_image(masks[..., None], inv_Hs)[..., 0]
        agg = heat_un.sum(0) / jnp.maximum(mask_un.sum(0), 1e-6)
        p, s, va = extract_keypoints(agg[None], 0.01, 4, 64)
        return p[0], s[0], va[0]

    pts_d, sc_d, va_d = map(np.asarray, device_with_hs(jnp.asarray(img), Hs))
    set_h = {tuple(p) for p, ok in zip(pts_h, va_h) if ok}
    set_d = {tuple(p) for p, ok in zip(pts_d, va_d) if ok}
    common = len(set_h & set_d)
    assert common >= 0.95 * max(len(set_h), len(set_d), 1)
